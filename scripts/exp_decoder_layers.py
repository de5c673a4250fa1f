"""Per-layer latency of the frozen 1024px StyleGAN2 decoder config on the
current device: each resolution's up-conv, plain conv and ToRGB, with the
production packed flags (packed_min_res=512). Finds where the 58 ms go."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.models.layers import StyledConv, ToRGB
from vspbfr_tpu.models.stylegan2 import channel_dict


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


def main(b=4, pmr=512, size=1024):
    import math
    key = jax.random.key(0)
    ch = channel_dict(2)
    log = int(math.log2(size))
    total = 0.0
    for i in range(3, log + 1):
        res = 2 ** i
        cin, cout = ch[res // 2], ch[res]
        pk_in = (res // 2) >= pmr
        pk_out = res >= pmr
        hw = res // 4 if pk_in else res // 2
        cc = 4 * cin if pk_in else cin
        x = jax.random.normal(key, (b, hw, hw, cc))
        s = jax.random.normal(key, (b, cin)) * 0.1 + 1.0
        s2 = jax.random.normal(key, (b, cout)) * 0.1 + 1.0

        up = StyledConv(cout, 3, upsample=True, packed_in=pk_in,
                        packed_out=pk_out)
        pu = up.init({"params": key, "noise": key}, x, s)["params"]
        fu = jax.jit(lambda p, x, s, k: up.apply(
            {"params": p}, x, s, rngs={"noise": k}))
        t_up = timeit(lambda i: fu(pu, x, s, jax.random.key(i)))

        hw2 = res // 2 if pk_out else res
        cc2 = 4 * cout if pk_out else cout
        y = jax.random.normal(key, (b, hw2, hw2, cc2))
        cv = StyledConv(cout, 3, packed_in=pk_out, packed_out=pk_out)
        pc = cv.init({"params": key, "noise": key}, y, s2)["params"]
        fc = jax.jit(lambda p, x, s, k: cv.apply(
            {"params": p}, x, s, rngs={"noise": k}))
        t_c = timeit(lambda i: fc(pc, y, s2, jax.random.key(i)))

        sk_hw = res // 4 if pk_in else res // 2
        sk_c = 12 if pk_in else 3
        skip = jax.random.normal(key, (b, sk_hw, sk_hw, sk_c))
        rgb = ToRGB(packed=pk_out, skip_packed=pk_in)
        pr = rgb.init({"params": key}, y, s2, skip)["params"]
        fr = jax.jit(lambda p, y, s, sk: rgb.apply({"params": p}, y, s, sk))
        t_r = timeit(lambda i: fr(pr, y, s2, skip))

        total += t_up + t_c + t_r
        print(f"res {res:5d} (pk {int(pk_in)}{int(pk_out)}): "
              f"up {t_up*1e3:6.2f}  conv {t_c*1e3:6.2f}  torgb {t_r*1e3:6.2f} ms")
    print(f"sum of layers: {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
