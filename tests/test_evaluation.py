"""Eval harness tests: PSNR/SSIM sanity + FID machinery."""

import jax.numpy as jnp
import numpy as np
import pytest

from vspbfr_tpu.evaluation import (
    FeatureStats,
    evaluate_pairs,
    frechet_distance,
    psnr,
    ssim,
)


def test_psnr_known_value(rng):
    a = jnp.zeros((1, 16, 16, 3))
    b = jnp.full((1, 16, 16, 3), 0.2)
    # mse = 0.04, range 2 -> 10*log10(4/0.04) = 20dB
    np.testing.assert_allclose(np.asarray(psnr(a, b)), 20.0, rtol=1e-5)
    assert float(psnr(a, a)[0]) > 100


def test_ssim_bounds(rng):
    a = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    s_same = ssim(a, a)
    np.testing.assert_allclose(np.asarray(s_same), 1.0, atol=1e-5)
    b = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    s_diff = ssim(a, b)
    assert float(jnp.max(jnp.abs(s_diff))) < 0.5


def test_ssim_matches_skimage(rng):
    skimage = pytest.importorskip("skimage")
    from skimage.metrics import structural_similarity
    a = rng.uniform(-1, 1, (24, 24)).astype(np.float32)
    b = (a + rng.normal(0, 0.1, a.shape)).astype(np.float32).clip(-1, 1)
    mine = float(ssim(jnp.asarray(a)[None, :, :, None],
                      jnp.asarray(b)[None, :, :, None])[0])
    ref = structural_similarity(a, b, data_range=2.0, gaussian_weights=True,
                                sigma=1.5, use_sample_covariance=False)
    np.testing.assert_allclose(mine, ref, atol=0.02)


def test_frechet_distance():
    mu = np.zeros(4)
    cov = np.eye(4)
    assert frechet_distance(mu, cov, mu, cov) < 1e-8
    mu2 = np.ones(4)
    d = frechet_distance(mu, cov, mu2, cov)
    np.testing.assert_allclose(d, 4.0, rtol=1e-6)  # ||mu1-mu2||^2


def test_feature_stats(rng):
    feats = rng.standard_normal((500, 8)).astype(np.float32)
    st = FeatureStats(8)
    st.update(feats[:200])
    st.update(feats[200:])
    mu, cov = st.finalize()
    np.testing.assert_allclose(mu, feats.mean(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cov, np.cov(feats.T), rtol=1e-4, atol=1e-5)


def test_evaluate_pairs(rng):
    batches = [
        (jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)),) * 2
        for _ in range(3)
    ]
    out = evaluate_pairs(iter(batches))
    assert out["psnr"] > 100 and abs(out["ssim"] - 1.0) < 1e-4


def test_inception_v3_structure():
    """InceptionV3 FID trunk: param structure + output shape (eval_shape,
    no compute) and converter key coverage against a synthetic torch dict."""
    import jax
    from vspbfr_tpu.losses.inception import InceptionV3Features
    from vspbfr_tpu.convert import convert_inception_v3

    net = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3))
    shapes = jax.eval_shape(net.init, jax.random.key(0), x)
    out = jax.eval_shape(net.apply, shapes, x)
    assert out.shape == (1, 2048)

    # synthesize a torch-layout state_dict from the converter's own key map
    from vspbfr_tpu.convert.torch_import import _inception_key
    params = shapes["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    sd = {}
    for path, leaf in flat:
        names = tuple(p.key for p in path)
        tk = _inception_key(names)
        if leaf.ndim == 4:  # HWIO -> OIHW
            sd[tk] = np.random.default_rng(0).standard_normal(
                (leaf.shape[3], leaf.shape[2], leaf.shape[0], leaf.shape[1])
            ).astype(np.float32)
        else:
            sd[tk] = np.ones(leaf.shape, np.float32)
    converted = convert_inception_v3(params, sd)
    # spot check a conv kernel round-trips with the right layout
    k = converted["Mixed_5b"]["branch1x1"]["conv"]["kernel"]
    assert k.shape == params["Mixed_5b"]["branch1x1"]["conv"]["kernel"].shape
