"""Profile the TPU-offloaded degradation stages piecewise (BENCH_r4 first
measurement: 258 device-ms/img — some op is lowering pathologically).

Pieces at 512px, batch 4 and 16:
  blur    — per-sample 41x41 grouped conv (feature_group_count = 3B)
  down    — dynamic bilinear downscale onto the 640 buffer (gathers)
  noise   — per-sample vmapped normal draw + clip + u8 quantize
  stage_a — the fused jit of the three
  stage_b — dynamic upscale + quantize + gray select

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_devdeg.py
"""

import time

import numpy as np


def flush(x):
    import jax
    import jax.numpy as jnp
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0]
                                    .astype(jnp.float32))))


def timeit(fn, n=10):
    def run(k):
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(i)
        flush(out)
        return time.perf_counter() - t0

    run(2)
    return (run(2 + n) - run(2)) / n


def main():
    import jax
    import jax.numpy as jnp
    from vspbfr_tpu.data.degradations import DegradationConfig
    from vspbfr_tpu.data.device_degrade import (DeviceDegrader, blur_batch,
                                                blur_batch_separable,
                                                factor_kernels,
                                                resize_bilinear_dynamic,
                                                sample_params)
    from vspbfr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    size = 512
    cfg = DegradationConfig()
    for b in (4, 16):
        dd = DeviceDegrader(size=size, cfg=cfg)
        rng = np.random.default_rng(0)
        gt = rng.random((b, size, size, 3)).astype(np.float32)
        p = sample_params(rng, b, size, cfg, gray_prob=0.2)
        seeds = np.arange(b, dtype=np.uint32)
        gt_j = jnp.asarray(gt)
        ker_j = jnp.asarray(p.kernels)
        dh = jnp.asarray(p.dh)
        dw = jnp.asarray(p.dw)

        f_blur = jax.jit(blur_batch)
        t_blur = timeit(lambda i: f_blur(gt_j, ker_j))
        u, v, rank = factor_kernels(np.asarray(p.kernels))
        u_j, v_j = jnp.asarray(u), jnp.asarray(v)
        f_sep = jax.jit(blur_batch_separable)
        t_sep = timeit(lambda i: f_sep(gt_j, u_j, v_j))
        print(f"b={b}: blur grouped {t_blur*1e3:7.2f}  "
              f"separable(r{rank}) {t_sep*1e3:7.2f} ms", flush=True)

        def down(x, dh, dw):
            def one(img, h_, w_):
                return resize_bilinear_dynamic(
                    img, jnp.float32(size), jnp.float32(size),
                    h_.astype(jnp.float32), w_.astype(jnp.float32), dd.buf)
            return jax.vmap(one)(x, dh, dw)

        f_down = jax.jit(down)
        t_down = timeit(lambda i: f_down(gt_j, dh, dw))

        def noise(x, sigma, seeds):
            keys = jax.vmap(jax.random.key)(seeds)
            nz = jax.vmap(lambda k, s: jax.random.normal(
                k, x.shape[1:], jnp.float32))(keys, seeds)
            return jnp.clip(x + nz * (sigma / 255.0)[:, None, None, None],
                            0.0, 1.0)

        small0 = f_down(gt_j, dh, dw)
        f_noise = jax.jit(noise)
        t_noise = timeit(lambda i: f_noise(small0, jnp.asarray(p.sigma),
                                           jnp.asarray(seeds)))

        t_a = timeit(lambda i: dd.stage_a(gt_j, p, seeds))
        small = np.asarray(dd.stage_a(gt_j, p, seeds))
        t_b = timeit(lambda i: dd.stage_b(small, p))

        print(f"b={b}: blur {t_blur*1e3:7.2f}  down {t_down*1e3:7.2f}  "
              f"noise {t_noise*1e3:7.2f}  stage_a {t_a*1e3:7.2f}  "
              f"stage_b {t_b*1e3:7.2f} ms  "
              f"(per-img A+B {(t_a+t_b)/b*1e3:6.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
