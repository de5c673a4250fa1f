"""Gate-threshold probe: pallas conv vs XLA at small-spatial/wide-channel
decoder shapes."""
import time
import jax, jax.numpy as jnp, numpy as np
from vspbfr_tpu.ops.pallas_conv import _conv_pallas, _lax_conv

def flush(x): return float(np.asarray(jnp.sum(x.astype(jnp.float32))))
def timeit(fn, n=30):
    def run(k):
        out=None; t0=time.perf_counter()
        for i in range(k): out=fn(i)
        flush(out); return time.perf_counter()-t0
    run(1); return (run(2+n)-run(2))/n

key = jax.random.key(0)
for (xs, ws) in [((4,64,64,512),(3,3,512,512)),
                 ((4,32,32,512),(3,3,512,512)),
                 ((4,16,16,512),(3,3,512,512)),
                 ((4,128,128,512),(3,3,512,256))]:
    x = jax.random.normal(key, xs)
    w = jax.random.normal(key, ws)*0.05
    pads = ((1,1),(1,1))
    fp = jax.jit(lambda x,w: _conv_pallas(x,w,pads))
    fx = jax.jit(lambda x,w: _lax_conv(x,w,pads))
    err = float(jnp.max(jnp.abs(fp(x,w)-fx(x,w))))/float(jnp.std(fx(x,w)))
    tp, tx = timeit(lambda i: fp(x,w)), timeit(lambda i: fx(x,w))
    gf = 2*np.prod(xs[:3])*np.prod(ws)/ws[2]/1e9*ws[2]
    gf = 2*np.prod(xs[:3])*ws[0]*ws[1]*ws[2]*ws[3]/1e9
    print(f"{xs}x{ws}: xla {tx*1e3:5.2f} pallas {tp*1e3:5.2f} ms ({tx/tp:4.2f}x) err {err:.0e}")
