"""Standalone bench: conv_epilogue pallas vs XLA composition."""
import time
import jax, jax.numpy as jnp, numpy as np
from vspbfr_tpu.ops.pallas_epilogue import conv_epilogue, epilogue_ref, _pallas

def flush(x): return float(np.asarray(jnp.sum(x.astype(jnp.float32))))
def timeit(fn, n=20):
    def run(k):
        out=None; t0=time.perf_counter()
        for i in range(k): out=fn(i)
        flush(out); return time.perf_counter()-t0
    run(1); return (run(2+n)-run(2))/n

key = jax.random.key(0)
for (b,h,c,nc) in [(4,512,512//4*1,4), (4,256,256,4)]:
    x = jax.random.normal(key,(b,h,h,c))
    osc = jax.random.normal(key,(b,c))*0.1+1
    nz = jax.random.normal(key,(b,h,h,nc))
    bias = jnp.zeros((c,))
    fp = jax.jit(lambda x,o,n,bb: _pallas(x,o,n,bb,True,False))
    fr = jax.jit(lambda x,o,n,bb: epilogue_ref(x,o,n,bb,True))
    err = float(jnp.max(jnp.abs(fp(x,osc,nz,bias)-fr(x,osc,nz,bias))))
    tp = timeit(lambda i: fp(x,osc,nz,bias))
    tr = timeit(lambda i: fr(x,osc,nz,bias))
    gb = 2*x.size*4/1e9
    print(f"({b},{h},{h},{c}) nc{nc}: pallas {tp*1e3:6.2f} ms ({gb/tp:4.0f} GB/s)  xla {tr*1e3:6.2f} ms ({gb/tr:4.0f} GB/s)  err {err:.1e}")
