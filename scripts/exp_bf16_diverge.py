"""Diagnose bf16-vs-f32 pipeline divergence at the product config.

bench.py measured -11.5 dB PSNR between the bf16+f32-islands pipeline and
the full-f32 pipeline on the same inputs + RNG keys (512px, real chip),
where the CPU tiny-config test asserts >= 25 dB. Localize: compare the two
pipelines stage by stage (encoded W+, diffused latent, decoder feats,
final image) and print stats (max|.|, rel-diff, PSNR, NaN counts).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.pipeline import RestorationPipeline

SIZE, DEC = 512, 1024


def stats(name, a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = a - b
    mse = float(np.mean(d * d))
    print(f"{name:22s} shape {a.shape}  max|f32| {np.abs(b).max():8.3f}  "
          f"max|bf16| {np.abs(a).max():8.3f}  mse {mse:10.5f}  "
          f"rel {np.sqrt(mse)/(b.std()+1e-9):8.4f}  "
          f"nan16 {np.isnan(a).sum()}  nan32 {np.isnan(b).sum()}")


def main():
    pipe32 = RestorationPipeline(size=SIZE, decoder_size=DEC)
    pipe16 = RestorationPipeline(size=SIZE, decoder_size=DEC,
                                 compute_dtype=jnp.bfloat16)
    params = jax.jit(pipe32.init_params)(jax.random.key(0))
    low = jax.random.uniform(jax.random.key(1), (2, SIZE, SIZE, 3),
                             minval=-1.0, maxval=1.0)

    enc32 = jax.jit(lambda p, x: pipe32.psp.get_w_plus(p["psp"], x))
    enc16 = jax.jit(lambda p, x: pipe16.psp.get_w_plus(p["psp"], x))
    w32 = enc32(params, low)
    w16 = enc16(params, low)
    stats("encode W+", w16, w32)

    d32 = jax.jit(lambda p, w, k: pipe32.diffuse_latent(p, w, k))(
        params, w32, jax.random.key(2))
    d16 = jax.jit(lambda p, w, k: pipe16.diffuse_latent(p, w, k))(
        params, w16, jax.random.key(2))
    stats("diffused latent", d16, d32)

    def dec(pipe, p, w, k):
        if pipe.compute_dtype is None:
            return pipe.psp.decode_with_feats(p["psp"], w, noise_rng=k)
        return pipe.psp.decode_with_feats(
            {**p["psp"], "decoder": pipe._cast(p["psp"]["decoder"])},
            w.astype(pipe.compute_dtype), noise_rng=k)

    img32, f32s = jax.jit(lambda p, w, k: dec(pipe32, p, w, k))(
        params, d32, jax.random.key(3))
    img16, f16s = jax.jit(lambda p, w, k: dec(pipe16, p, w, k))(
        params, d16, jax.random.key(3))
    stats("decoded style img", img16, img32)
    for i in (0, len(f32s) // 2, len(f32s) - 1):
        stats(f"decoder feat[{i}]", f16s[i], f32s[i])

    out32 = jax.jit(lambda p, x, k: pipe32.restore(p, x, k))(
        params, low, jax.random.key(7))
    out16 = jax.jit(lambda p, x, k: pipe16.restore(p, x, k))(
        params, low, jax.random.key(7))
    stats("final restored", out16, out32)
    mse = float(np.mean((np.asarray(out16, np.float32) -
                         np.asarray(out32, np.float32)) ** 2))
    print("PSNR(final) dB:", 10 * np.log10(4.0 / max(mse, 1e-12)))


if __name__ == "__main__":
    main()
