"""Ablate the packed SMART layer cost at 512^2x64 (batch 4): branches,
concat reshuffle, fusion, epilogue — to target optimization."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.ops import fused_leaky_relu
from vspbfr_tpu.ops.modulated_conv import modulated_conv2d
from vspbfr_tpu.ops.packed import space_to_depth


def flush(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32))))


def timeit(fn, n=20):
    def run(k):
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(i)
        flush(out)
        return time.perf_counter() - t0

    run(1)
    return (run(2 + n) - run(2)) / n


def bench(name, fn):
    print(f"{name:56s} {1e3 * timeit(fn):8.2f} ms")


def main():
    key = jax.random.key(0)
    b, r, c = 4, 512, 64
    branch = c // 4
    x = jax.random.normal(key, (b, r, r, c))
    xp = space_to_depth(x)
    mod = jax.random.normal(key, (b, c)) * 0.1 + 1.0
    ws = [jax.random.normal(jax.random.fold_in(key, i), (3, 3, c, branch)) * 0.1
          for i in range(4)]
    wf = jax.random.normal(jax.random.fold_in(key, 9), (3, 3, c, c)) * 0.1

    rates = (1, 2, 4, 8)

    def branches(xp, stop):
        outs = []
        for i, rate in enumerate(rates[:stop]):
            outs.append(modulated_conv2d(xp, ws[i], mod, dilation=rate,
                                         packed_in=True, packed_out=True))
        return outs

    for nb in (1, 2, 3, 4):
        f = jax.jit(partial(lambda xp, n: jnp.stack(
            [o.sum() for o in branches(xp, n)]), n=nb))
        bench(f"branches[:{nb}] packed", lambda i, f=f: f(xp))

    def smart_full(xp, reshuffle):
        outs = branches(xp, 4)
        if reshuffle:
            st = [o.reshape(b, r // 2, r // 2, 4, branch) for o in outs]
            cat = jnp.concatenate(st, axis=-1).reshape(b, r // 2, r // 2, 4 * c)
        else:
            cat = jnp.concatenate(outs, axis=-1)  # WRONG layout, timing only
        from vspbfr_tpu.ops.packed import conv2d_packed, pack_vector
        out = conv2d_packed(cat, wf)
        noise = jax.random.normal(jax.random.key(1), (b, r // 2, r // 2, 4))
        out = out + 0.1 * jnp.repeat(noise, c, axis=-1)
        return fused_leaky_relu(out, pack_vector(jnp.zeros((c,))))

    bench("SMART full (reshuffle concat)",
          lambda i: jax.jit(partial(smart_full, reshuffle=True))(xp))
    bench("SMART full (naive concat)",
          lambda i: jax.jit(partial(smart_full, reshuffle=False))(xp))

    # fusion alone
    from vspbfr_tpu.ops.packed import conv2d_packed
    xc = jax.random.normal(key, (b, r // 2, r // 2, 4 * c))
    f_fus = jax.jit(lambda xc: conv2d_packed(xc, wf))
    bench("fusion conv packed 64->64", lambda i: f_fus(xc))

    # merged d1+d2 in one conv (concat kernels along cout after packing)
    from vspbfr_tpu.ops.packed import _assemble2, _map_s1

    def merged_d12(xp):
        k = 3
        outs = []
        wps = []
        for i, dil in enumerate((1,)):
            pass
        m1 = _map_s1(k, 1, 1)
        wp1, (py0, py1), (px0, px1) = _assemble2(0.0625 * ws[0], m1, m1, 2, 2)
        m2 = _map_s1(k, 2, 2)
        wp2, p2a, p2b = _assemble2(0.0625 * ws[1], m2, m2, 2, 2)
        assert wp1.shape[:2] == wp2.shape[:2], (wp1.shape, wp2.shape)
        wboth = jnp.concatenate([wp1, wp2], axis=-1)
        return jax.lax.conv_general_dilated(
            xp, wboth, (1, 1), ((py0, py1), (px0, px1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    f_m = jax.jit(merged_d12)
    bench("merged d1+d2 one conv", lambda i: f_m(xp))

    # unpacked baseline for reference
    def smart_unpacked(x):
        outs = [modulated_conv2d(x, ws[i], mod, dilation=rt)
                for i, rt in enumerate(rates)]
        cat = jnp.concatenate(outs, axis=-1)
        from vspbfr_tpu.ops.modulated_conv import conv2d
        out = conv2d(cat, 0.0417 * wf, padding=1)
        noise = jax.random.normal(jax.random.key(1), (b, r, r, 1))
        return fused_leaky_relu(out + 0.1 * noise, jnp.zeros((c,)))

    bench("SMART full unpacked", lambda i: jax.jit(smart_unpacked)(x))


if __name__ == "__main__":
    main()
