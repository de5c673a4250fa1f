"""Golden tests: the TPU-offloaded degradation chain vs the cv2/numpy
reference ops it re-implements (`data/degradations.py::degrade_image`,
itself matching `dataset.py:327-372`). Per-sample parameters are injected
into both sides; only the device noise STREAM differs by design (tested
distributionally)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vspbfr_tpu.data.degradations import DegradationConfig
from vspbfr_tpu.data.device_degrade import (
    DegradeParams,
    DeviceDegrader,
    blur_batch,
    resize_bilinear_dynamic,
    sample_params,
)

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def make_gt(rng, b=2, size=64):
    # smooth-ish content (real faces compress well; pure noise would
    # stress JPEG in unrepresentative ways)
    base = rng.random((b, size // 4, size // 4, 3)).astype(np.float32)
    return np.stack([cv2.resize(x, (size, size),
                                interpolation=cv2.INTER_CUBIC)
                     for x in base]).clip(0, 1)


def test_blur_matches_cv2_filter2d(rng):
    gt = make_gt(rng, b=3, size=48)
    ks = 13
    kernels = []
    for i in range(3):
        k = rng.random((ks, ks)).astype(np.float32)
        kernels.append(k / k.sum())
    kernels = np.stack(kernels)
    out = np.asarray(blur_batch(jnp.asarray(gt), jnp.asarray(kernels)))
    for i in range(3):
        ref = cv2.filter2D(gt[i], -1, kernels[i],
                           borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(out[i], ref, atol=2e-6)


def test_blur_zero_padded_kernel_equals_small_kernel(rng):
    """A ks kernel zero-padded to kmax must produce the identical blur
    (the padded taps read one extra REFLECT ring times zero)."""
    gt = make_gt(rng, b=1, size=40)
    k9 = rng.random((9, 9)).astype(np.float32)
    k9 /= k9.sum()
    k13 = np.zeros((13, 13), np.float32)
    k13[2:11, 2:11] = k9
    a = np.asarray(blur_batch(jnp.asarray(gt), jnp.asarray(k9[None])))
    b = np.asarray(blur_batch(jnp.asarray(gt), jnp.asarray(k13[None])))
    np.testing.assert_allclose(a, b, atol=2e-6)


@pytest.mark.parametrize("src,dst", [(64, 23), (64, 80), (37, 64), (64, 64)])
def test_resize_matches_cv2_inter_linear(rng, src, dst):
    img = rng.random((src, src, 3)).astype(np.float32)
    buf = max(src, dst)
    pad = np.zeros((buf, buf, 3), np.float32)
    pad[:src, :src] = img
    out = np.asarray(resize_bilinear_dynamic(
        jnp.asarray(pad), jnp.float32(src), jnp.float32(src),
        jnp.float32(dst), jnp.float32(dst), buf))[:dst, :dst]
    ref = cv2.resize(img, (dst, dst), interpolation=cv2.INTER_LINEAR)
    # cv2 quantizes bilinear coefficients to 11-bit fixed point
    np.testing.assert_allclose(out, ref, atol=2.5e-3)


def test_full_chain_matches_cv2_composition(rng):
    """End-to-end (noise sigma = 0 so both sides are deterministic):
    blur -> hazy -> downscale -> JPEG -> upscale -> u8 quantize."""
    size = 64
    gt = make_gt(rng, b=2, size=size)
    cfg = DegradationConfig(blur_kernel_half_range=(6, 6),
                            downsample_range=(0.8, 8.0))
    dd = DeviceDegrader(size=size, cfg=cfg)
    p = sample_params(rng, 2, size, cfg)
    p.sigma[:] = 0.0
    p.alpha[0] = 0.85          # force one hazy sample
    p.dh[:] = [23, 71]         # one down, one up (scale < 1)
    p.dw[:] = [23, 71]
    p.gray[:] = False
    lq = np.asarray(dd.degrade_batch(gt, p))

    for i in range(2):
        ref = cv2.filter2D(gt[i], -1, p.kernels[i],
                           borderType=cv2.BORDER_REFLECT_101)
        ref = ref * p.alpha[i] + (1.0 - p.alpha[i])
        ref = cv2.resize(ref, (int(p.dw[i]), int(p.dh[i])),
                         interpolation=cv2.INTER_LINEAR)
        ref = np.clip(ref, 0, 1)
        ok, enc = cv2.imencode(".jpg", np.clip(np.round(ref * 255), 0, 255)
                               .astype(np.uint8),
                               [int(cv2.IMWRITE_JPEG_QUALITY),
                                int(p.quality[i])])
        assert ok
        ref = np.float32(cv2.imdecode(enc, 1)) / 255.0
        ref = cv2.resize(ref, (size, size), interpolation=cv2.INTER_LINEAR)
        ref = np.clip((ref * 255.0).round(), 0, 255) / 255.0
        diff = np.abs(lq[i] - ref)
        # residual sources: 11-bit resize coefficients (twice) + the u8
        # rounding they perturb; JPEG itself is bit-identical given equal
        # u8 input, so only boundary pixels can flip a level or two
        assert float(diff.mean()) < 2e-3, diff.mean()
        assert float(np.quantile(diff, 0.999)) <= 3 / 255 + 1e-6


def test_noise_distribution_and_clip(rng):
    """Device noise: mean/std of (lq - clean) match sigma/255 iid normal."""
    size = 64
    cfg = DegradationConfig(blur_kernel_half_range=(1, 1), hazy_prob=None,
                            noise_range=(12.0, 12.0), jpeg_range=None)
    dd = DeviceDegrader(size=size, cfg=cfg)
    gt = np.full((1, size, size, 3), 0.5, np.float32)
    p = sample_params(rng, 1, size, cfg)
    # identity "blur", no resize
    p.kernels[:] = 0.0
    c = p.kernels.shape[1] // 2
    p.kernels[:, c, c] = 1.0
    p.dh[:] = size
    p.dw[:] = size
    small = np.asarray(dd.stage_a(gt, p, np.asarray([3], np.uint32)))
    vals = small[0, :size, :size].astype(np.float32) / 255.0 - 0.5
    assert abs(float(vals.mean())) < 1e-3
    np.testing.assert_allclose(float(vals.std()), 12.0 / 255.0, rtol=0.05)


def test_gray_flag_applies_bgr2gray_weights(rng):
    size = 32
    cfg = DegradationConfig(blur_kernel_half_range=(1, 1), hazy_prob=None,
                            noise_range=None, jpeg_range=(95, 95))
    dd = DeviceDegrader(size=size, cfg=cfg)
    gt = make_gt(rng, b=1, size=size)
    p = sample_params(rng, 1, size, cfg)
    p.kernels[:] = 0.0
    c = p.kernels.shape[1] // 2
    p.kernels[:, c, c] = 1.0
    p.dh[:] = size
    p.dw[:] = size
    p.gray[:] = True
    lq = np.asarray(dd.degrade_batch(gt, p))[0]
    assert np.allclose(lq[..., 0], lq[..., 1]) and \
        np.allclose(lq[..., 1], lq[..., 2])


def test_sample_params_ranges(rng):
    cfg = DegradationConfig()
    p = sample_params(rng, 64, 512, cfg, gray_prob=0.5)
    assert p.kernels.shape == (64, 41, 41)
    np.testing.assert_allclose(p.kernels.sum(axis=(1, 2)), 1.0, atol=1e-5)
    assert ((p.dh >= 64) & (p.dh <= 640)).all()
    assert ((p.quality >= 60) & (p.quality <= 100)).all()
    assert ((p.sigma >= 0) & (p.sigma <= 20)).all()
    assert 0 < p.gray.sum() < 64
    # haze is rare (p=0.008): nearly all alphas stay 1
    assert (p.alpha == 1.0).sum() >= 60


def test_device_degrade_loader_pipeline(rng, tmp_path):
    """Pipelined loader: shapes/ranges, gray consistency between lq and gt,
    and determinism across loader instances (resume safety)."""
    from PIL import Image
    from vspbfr_tpu.data.datasets import RestoreTrainDataset
    from vspbfr_tpu.data.device_degrade import DeviceDegradeLoader

    size = 32
    for i in range(6):
        arr = (rng.random((size + 8, size + 8, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.png")
    cfg = DegradationConfig(blur_kernel_half_range=(2, 3),
                            downsample_range=(0.8, 4.0))
    ds = RestoreTrainDataset(str(tmp_path), im_size=(size, size),
                             config=cfg, use_native=False, seed=5)

    def grab(n, jpeg="device"):
        dl = DeviceDegradeLoader(ds, 2, gray_prob=0.5, num_workers=2,
                                 seed=5, lookahead=2, jpeg=jpeg)
        it = dl.forever()
        return [next(it) for _ in range(n)]

    a = grab(3)
    b = grab(3)
    host = grab(3, jpeg="host")
    for (lq_a, gt_a), (lq_h, gt_h) in zip(a, host):
        # host-exact-JPEG path: same params/noise, only the JPEG core
        # differs by libjpeg's fixed point — distributionally equal
        d = np.abs(np.asarray(lq_a) - np.asarray(lq_h))
        # 32px random-noise crops at low JPEG quality are the worst case
        # for the fixed-point-vs-float tie flips; real content sits well
        # below (test_device_jpeg.py bounds the mean at <1.3/255)
        assert float(d.mean()) < 4.0 / 255, d.mean()
        np.testing.assert_allclose(np.asarray(gt_a), np.asarray(gt_h),
                                   atol=1e-6)
    for (lq_a, gt_a), (lq_b, gt_b) in zip(a, b):
        lq_a, lq_b = np.asarray(lq_a), np.asarray(lq_b)
        assert lq_a.shape == (2, size, size, 3)
        assert gt_a.shape == (2, size, size, 3)
        assert lq_a.min() >= -1.0 and lq_a.max() <= 1.0
        assert gt_a.min() >= -1.0 and gt_a.max() <= 1.0
        np.testing.assert_array_equal(lq_a, lq_b)
        np.testing.assert_array_equal(gt_a, gt_b)
    # gray coupling: a gray lq implies a gray gt (same per-sample flag)
    found = False
    for lq, gt in a:
        lq = np.asarray(lq)
        for i in range(2):
            if np.allclose(lq[i, ..., 0], lq[i, ..., 2], atol=1e-6):
                assert np.allclose(gt[i, ..., 0], gt[i, ..., 2], atol=1e-6)
                found = True
    assert found, "gray_prob=0.5 over 6 samples should hit at least once"


def test_separable_blur_matches_full(rng):
    """SVD-separable banded-matmul blur == full-kernel conv == cv2, at the
    WORST-case anisotropy of the default config (sigma 10 vs 0.1, rotated
    45 deg — the highest-rank Gaussian a 41x41 grid can see)."""
    from vspbfr_tpu.data.degradations import bivariate_gaussian_kernel
    from vspbfr_tpu.data.device_degrade import (blur_batch_separable,
                                                factor_kernels)

    gt = make_gt(rng, b=2, size=96)
    k1 = bivariate_gaussian_kernel(41, 10.0, 0.1, np.pi / 4,
                                   isotropic=False)
    k2 = bivariate_gaussian_kernel(41, 0.1, 10.0, -np.pi / 3,
                                   isotropic=False)
    kernels = np.stack([k1, k2])
    u, v, rank = factor_kernels(kernels)
    assert rank == 41, rank  # needle kernels need the exact bucket
    out = np.asarray(blur_batch_separable(jnp.asarray(gt), jnp.asarray(u),
                                          jnp.asarray(v)))
    for i in range(2):
        ref = cv2.filter2D(gt[i], -1, kernels[i],
                           borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(out[i], ref, atol=5e-6)
