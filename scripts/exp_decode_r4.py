"""Round-4 decode-stage audit (VERDICT r3 #2): per-layer bf16 latencies of
the LIVE decode subgraph (feature ladder through 512-res; ToRGB + 1024-res
layers are DCE'd in the product path, pipeline.py:restore) plus sub-op
splits of the 512-res packed pair — conv vs epilogue vs noise draw — to
locate the 19.7 ms vs 7.7 ms roofline gap."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.models.layers import StyledConv
from vspbfr_tpu.models.stylegan2 import channel_dict

DT = jnp.bfloat16


def flush(x):
    leaves = [l for l in jax.tree.leaves(x) if hasattr(l, "dtype")]
    return float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32))))


def timeit(fn, n=30):
    def run(k):
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(i)
        flush(out)
        return time.perf_counter() - t0

    run(1)
    return (run(2 + n) - run(2)) / n


def cast(tree):
    return jax.tree.map(lambda x: x.astype(DT), tree)


def main(b=4, pmr=512, size=512):
    import math
    key = jax.random.key(0)
    ch = channel_dict(2)
    log = int(math.log2(size))
    total = 0.0
    rows = []
    for i in range(3, log + 1):
        res = 2 ** i
        cin, cout = ch[res // 2], ch[res]
        pk_in = (res // 2) >= pmr
        pk_out = res >= pmr
        hw = res // 4 if pk_in else res // 2
        cc = 4 * cin if pk_in else cin
        x = jax.random.normal(key, (b, hw, hw, cc)).astype(DT)
        s = (jax.random.normal(key, (b, cin)) * 0.1 + 1.0).astype(DT)
        s2 = (jax.random.normal(key, (b, cout)) * 0.1 + 1.0).astype(DT)

        up = StyledConv(cout, 3, upsample=True, packed_in=pk_in,
                        packed_out=pk_out)
        pu = cast(up.init({"params": key, "noise": key}, x, s)["params"])
        fu = jax.jit(lambda p, x, s, k: up.apply(
            {"params": p}, x, s, rngs={"noise": k}))
        t_up = timeit(lambda i: fu(pu, x, s, jax.random.key(i)))

        hw2 = res // 2 if pk_out else res
        cc2 = 4 * cout if pk_out else cout
        y = jax.random.normal(key, (b, hw2, hw2, cc2)).astype(DT)
        cv = StyledConv(cout, 3, packed_in=pk_out, packed_out=pk_out)
        pc = cast(cv.init({"params": key, "noise": key}, y, s2)["params"])
        fc = jax.jit(lambda p, x, s, k: cv.apply(
            {"params": p}, x, s, rngs={"noise": k}))
        t_c = timeit(lambda i: fc(pc, y, s2, jax.random.key(i)))

        total += t_up + t_c
        rows.append((res, t_up, t_c))
        print(f"res {res:5d} (pk {int(pk_in)}{int(pk_out)}): "
              f"up {t_up*1e3:6.2f}  conv {t_c*1e3:6.2f} ms", flush=True)
    print(f"sum of live decode layers: {total*1e3:.1f} ms")

    # --- sub-op split at the dominant resolutions -------------------------
    for res in (256, 512):
        cin, cout = ch[res // 2], ch[res]
        pk = res >= pmr
        hw2 = res // 2 if pk else res
        cc2 = 4 * cout if pk else cout
        y = jax.random.normal(key, (b, hw2, hw2, cc2)).astype(DT)
        s2 = (jax.random.normal(key, (b, cout)) * 0.1 + 1.0).astype(DT)
        cv = StyledConv(cout, 3, packed_in=pk, packed_out=pk)
        pc = cast(cv.init({"params": key, "noise": key}, y, s2)["params"])

        # conv alone (modulated conv incl. demod, no epilogue)
        from vspbfr_tpu.ops.modulated_conv import modulated_conv2d
        w = pc["conv"]["weight"]
        mod_w = pc["conv"]["modulation"]["weight"]
        mod_b = pc["conv"]["modulation"]["bias"]

        def conv_only(y, s2):
            sty = s2 @ (mod_w / np.sqrt(mod_w.shape[0])) + mod_b + 1.0
            return modulated_conv2d(y, w, sty, packed_in=pk, packed_out=pk,
                                    return_demod=True)

        f1 = jax.jit(conv_only)
        t_conv = timeit(lambda i: f1(y, s2))

        # epilogue alone (XLA fused chain at production shapes)
        from vspbfr_tpu.ops.pallas_epilogue import conv_epilogue
        out0, dv0 = f1(y, s2)
        nz = jax.random.normal(key, (b, hw2, hw2, 4 if pk else 1)).astype(DT)
        bias = jnp.zeros((4 * cout if pk else cout,), DT)
        f2 = jax.jit(lambda o, d, n: conv_epilogue(o, d, n, bias, act=True))
        t_epi = timeit(lambda i: f2(out0, dv0, nz))

        # noise draw alone
        f3 = jax.jit(lambda k: jax.random.normal(
            k, (b, hw2, hw2, 4 if pk else 1)).astype(DT))
        t_nz = timeit(lambda i: f3(jax.random.key(i)))

        print(f"res {res}: conv_only {t_conv*1e3:6.2f}  epilogue "
              f"{t_epi*1e3:6.2f}  noise_draw {t_nz*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
