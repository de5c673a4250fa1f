import time
import jax, jax.numpy as jnp, numpy as np
from vspbfr_tpu.ops.pallas_d2s import interleave_d2s, gather_s2d, _d2s_xla, _s2d_xla

def flush(x): return float(np.asarray(jnp.sum(x.astype(jnp.float32))))
def timeit(fn, n=10):
    def run(k):
        out=None; t0=time.perf_counter()
        for i in range(k): out=fn(i)
        flush(out); return time.perf_counter()-t0
    run(1); return (run(2+n)-run(2))/n

inner = 128
x = jax.random.normal(jax.random.key(0), (4, 256, 256, 4*inner))
f = jax.jit(lambda x: interleave_d2s(x, inner))
y = f(x)
print("d2s ok:", bool(jnp.all(y == _d2s_xla(x, inner))), f"{timeit(lambda i: f(x))*1e3:.2f} ms")
g = jax.jit(lambda y: gather_s2d(y, inner))
xb = g(y)
print("s2d ok:", bool(jnp.all(xb == x)), f"{timeit(lambda i: g(y))*1e3:.2f} ms")
# grad path
h = jax.jit(lambda x: jax.grad(lambda t: jnp.sum(interleave_d2s(t, inner)**2))(x))
dx = h(x)
print("grad finite:", bool(jnp.all(jnp.isfinite(dx))), f"{timeit(lambda i: h(x))*1e3:.2f} ms")
# bf16
yb = jax.jit(lambda x: interleave_d2s(x, inner))(x.astype(jnp.bfloat16))
print("bf16 dtype:", yb.dtype, "ok:", bool(jnp.all(yb == _d2s_xla(x.astype(jnp.bfloat16), inner))))
