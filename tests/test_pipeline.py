"""Full-pipeline composition tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vspbfr_tpu.pipeline import RestorationPipeline


pytestmark = [pytest.mark.slow]

@pytest.fixture(scope="module")
def pipe_and_params():
    pipe = RestorationPipeline(size=32, decoder_size=64)
    params = pipe.init_params(jax.random.key(0))
    return pipe, params


def test_restore_shapes_and_determinism(pipe_and_params, rng):
    pipe, params = pipe_and_params
    low = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    fn = jax.jit(lambda p, x, k: pipe.restore(p, x, k))
    out1 = fn(params, low, jax.random.key(1))
    out2 = fn(params, low, jax.random.key(1))
    assert out1.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = fn(params, low, jax.random.key(2))
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))


def test_ema_generator_override(pipe_and_params, rng):
    pipe, params = pipe_and_params
    low = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    zeroed = jax.tree.map(jnp.zeros_like, params["generator"])
    out_a = pipe.restore(params, low, jax.random.key(1))
    out_b = pipe.restore(params, low, jax.random.key(1), gen_params=zeroed)
    assert not np.array_equal(np.asarray(out_a), np.asarray(out_b))


def test_mixing_latent_distribution(pipe_and_params):
    """mixing draws either one repeated style (p=1-mix) or a split."""
    pipe, params = pipe_and_params
    n_lat = pipe.generator.n_latent
    n_mixed = 0
    for s in range(20):
        lat = pipe.sample_mixing_latent(params["generator"],
                                        jax.random.key(s), 1)
        assert lat.shape == (1, n_lat, 512)
        first = np.asarray(lat[0, 0])
        last = np.asarray(lat[0, -1])
        if not np.array_equal(first, last):
            n_mixed += 1
    assert 0 < n_mixed < 20  # both branches occur at p=0.5


def test_bf16_compute_dtype_quality(pipe_and_params, rng):
    """bf16 inference must stay close to the f32 pipeline on the SAME
    params (the production compute_dtype=bf16 path; output dtype is the
    input's). Bound: >=25 dB PSNR over the [-1,1] range — bf16 has ~8
    mantissa bits, and the pipeline output here stays O(1)."""
    from vspbfr_tpu.evaluation import psnr

    pipe32, params = pipe_and_params
    pipe16 = RestorationPipeline(size=32, decoder_size=64,
                                 compute_dtype=jnp.bfloat16)
    low = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    out32 = pipe32.restore(params, low, jax.random.key(1))
    out16 = pipe16.restore(params, low, jax.random.key(1))
    assert out16.dtype == jnp.float32  # cast back to the input dtype
    rng_ = float(np.abs(np.asarray(out32)).max()) * 2
    p = float(psnr(out16, jnp.asarray(out32), data_range=max(rng_, 2.0)).mean())
    assert p >= 25.0, f"bf16 pipeline deviates: psnr={p:.2f} dB"
