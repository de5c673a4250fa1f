"""Per-layer latency of the RestoreNet (512px, batch 4, production
packed_min_res=512) on the current device: encoder SMART + downsample per
resolution, decoder up + SMART + ToRGB per resolution, plus the 4x4 head.
Finds where the ~75 ms restore stage goes (queue-then-flush timing).

VSPBFR_PROF_DTYPE=bf16 profiles the bf16 compute path."""

import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

DTYPE = (jnp.bfloat16 if os.environ.get("VSPBFR_PROF_DTYPE") == "bf16"
         else jnp.float32)


def _cast(tree):
    return jax.tree.map(
        lambda x: x.astype(DTYPE)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)

from vspbfr_tpu.models.layers import (
    LargeConvLayer,
    SMARTLayer,
    StyledConv,
    ToRGB,
)
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


def t_smart(key, b, res, c, packed, style_mult):
    hw = res // 2 if packed else res
    cc = 4 * c if packed else c
    x = jax.random.normal(key, (b, hw, hw, cc), DTYPE)
    s = jax.random.normal(key, (b, style_mult * 512), DTYPE) * 0.1
    m = SMARTLayer(c, packed=packed)
    p = _cast(m.init({"params": key, "noise": key}, x, s)["params"])
    f = jax.jit(lambda p, x, s, k: m.apply({"params": p}, x, s,
                                           rngs={"noise": k}))
    return timeit(lambda i: f(p, x, s, jax.random.key(i)))


def t_styled(key, b, res_in, cin, cout, up, down, pk_in, pk_out, style_mult):
    hw = res_in // 2 if pk_in else res_in
    cc = 4 * cin if pk_in else cin
    x = jax.random.normal(key, (b, hw, hw, cc), DTYPE)
    s = jax.random.normal(key, (b, style_mult * 512), DTYPE) * 0.1
    m = StyledConv(cout, 3, upsample=up, downsample=down,
                   packed_in=pk_in, packed_out=pk_out)
    p = _cast(m.init({"params": key, "noise": key}, x, s)["params"])
    f = jax.jit(lambda p, x, s, k: m.apply({"params": p}, x, s,
                                           rngs={"noise": k}))
    return timeit(lambda i: f(p, x, s, jax.random.key(i)))


def t_torgb(key, b, res, c, pk, sk_pk, style_mult):
    hw = res // 2 if pk else res
    cc = 4 * c if pk else c
    x = jax.random.normal(key, (b, hw, hw, cc), DTYPE)
    s = jax.random.normal(key, (b, style_mult * 512), DTYPE) * 0.1
    sk_hw = res // 4 if sk_pk else res // 2
    sk_c = 12 if sk_pk else 3
    sk = jax.random.normal(key, (b, sk_hw, sk_hw, sk_c), DTYPE)
    m = ToRGB(packed=pk, skip_packed=sk_pk)
    p = _cast(m.init({"params": key}, x, s, sk)["params"])
    f = jax.jit(lambda p, x, s, sk: m.apply({"params": p}, x, s, sk))
    return timeit(lambda i: f(p, x, s, sk))


def main(b=4, size=512, pmr=512):
    key = jax.random.key(0)
    ch = channel_dict(2)
    log = int(math.log2(size))
    total = 0.0

    print("== encoder (styles are 2*512)")
    for i in range(log, 2, -1):
        res = 2 ** i
        c, c_next = ch[res], ch[res // 2]
        pk = res >= pmr
        pk_next = (res // 2) >= pmr
        ts = t_smart(key, b, res, c, pk, 2)
        td = t_styled(key, b, res, c, c_next, False, True, pk, pk_next, 2)
        total += ts + td
        print(f"res {res:4d} c{c:4d} (pk {int(pk)}): "
              f"smart {ts*1e3:6.2f}  down {td*1e3:6.2f} ms")

    print("== decoder (styles are 4*512)")
    ts = t_smart(key, b, 4, ch[4], False, 4)
    total += ts
    print(f"res    4 c 512 head smart {ts*1e3:6.2f} ms")
    for i in range(3, log + 1):
        res = 2 ** i
        cin, cout = ch[res // 2], ch[res]
        pk_in = (res // 2) >= pmr
        pk_out = res >= pmr
        tu = t_styled(key, b, res // 2, cin, cout, True, False,
                      pk_in, pk_out, 4)
        ts = t_smart(key, b, res, cout, pk_out, 4)
        tr = t_torgb(key, b, res, cout, pk_out, pk_in, 4)
        total += tu + ts + tr
        print(f"res {res:4d} c{cout:4d} (pk {int(pk_in)}{int(pk_out)}): "
              f"up {tu*1e3:6.2f}  smart {ts*1e3:6.2f}  "
              f"torgb {tr*1e3:6.2f} ms")

    x4 = jax.random.normal(key, (b, 4, 4, 512), DTYPE)
    m = LargeConvLayer(512, kernel_size=3)
    p = _cast(m.init(key, x4)["params"])
    f = jax.jit(lambda p, x: m.apply({"params": p}, x))
    tf = timeit(lambda i: f(p, x4))
    total += tf
    print(f"final_layer 4x4 {tf*1e3:6.2f} ms")
    print(f"sum of layers: {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
