"""Data pipeline tests: degradation determinism, dataset shapes, loader."""

import numpy as np
import pytest
from PIL import Image

from vspbfr_tpu.data import (
    DataLoader,
    DegradationConfig,
    RestoreTestDataset,
    RestoreTrainDataset,
    add_gaussian_noise,
    add_jpeg_compression,
    bivariate_gaussian_kernel,
    bivariate_generalized_gaussian_kernel,
    bivariate_plateau_kernel,
    circular_lowpass_kernel,
    degrade_image,
    random_mixed_kernel,
)


@pytest.fixture
def img_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(8):
        arr = rng.integers(0, 255, (80, 70, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
    return str(tmp_path)


def test_kernels_normalized(rng):
    for k in [
        bivariate_gaussian_kernel(21, 2.0),
        bivariate_gaussian_kernel(21, 2.0, 4.0, 0.5, isotropic=False),
        bivariate_generalized_gaussian_kernel(21, 2.0, 3.0, 0.3, 1.5),
        bivariate_plateau_kernel(21, 2.0, 3.0, 0.3, 2.0),
        circular_lowpass_kernel(2.0, 21),
    ]:
        assert k.shape == (21, 21)
        np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-5)


def test_kernel_matches_reference_formula(rng):
    """iso Gaussian vs the reference's pdf2/mesh_grid math
    (`my_basicsr/my_degradations.py:16-99`)."""
    ks, sig = 13, 2.3
    ax = np.arange(-(ks // 2), ks // 2 + 1, dtype=np.float64)
    xx, yy = np.meshgrid(ax, ax)
    ref = np.exp(-(xx ** 2 + yy ** 2) / (2 * sig ** 2))
    ref /= ref.sum()
    k = bivariate_gaussian_kernel(ks, sig)
    np.testing.assert_allclose(k, ref, rtol=1e-5, atol=1e-8)


def test_random_mixed_kernel_deterministic():
    k1 = random_mixed_kernel(np.random.default_rng(7), kernel_size=15)
    k2 = random_mixed_kernel(np.random.default_rng(7), kernel_size=15)
    np.testing.assert_array_equal(k1, k2)


def test_degrade_image_deterministic(rng):
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    a = degrade_image(np.random.default_rng(3), img)
    b = degrade_image(np.random.default_rng(3), img)
    np.testing.assert_array_equal(a, b)
    assert a.shape == img.shape
    assert a.min() >= 0.0 and a.max() <= 1.0
    # must actually degrade
    assert np.abs(a - img).mean() > 1e-3


def test_noise_and_jpeg(rng):
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    noisy = add_gaussian_noise(np.random.default_rng(0), img, (10.0, 10.0))
    assert 0.01 < np.abs(noisy - img).mean() < 0.2
    jp = add_jpeg_compression(np.random.default_rng(0), img, (60, 60))
    assert jp.shape == img.shape


def test_train_dataset_stage3(img_dir):
    ds = RestoreTrainDataset(img_dir, im_size=(64, 64), n_degraded=2)
    lq1, lq2, gt = ds.sample(0)
    assert lq1.shape == lq2.shape == gt.shape == (64, 64, 3)
    assert not np.array_equal(lq1, lq2)  # two independent chains
    assert -1.0 <= gt.min() and gt.max() <= 1.0
    # deterministic given (seed, epoch, idx)
    lq1b, _, _ = ds.sample(0)
    np.testing.assert_array_equal(lq1, lq1b)
    lq1c, _, _ = ds.sample(0, epoch=1)
    assert not np.array_equal(lq1, lq1c)


def test_train_dataset_stage2_quantized_gt(img_dir):
    ds = RestoreTrainDataset(img_dir, im_size=(64, 64), n_degraded=1,
                             quantize_gt=True)
    lq, gt = ds.sample(1)
    # GT on the uint8 grid mapped by /127.5 - 1 (`dataset.py:128-132` + train loop)
    back = (gt + 1.0) * 127.5
    np.testing.assert_allclose(back, np.round(back), atol=1e-4)


def test_test_dataset_and_loader(img_dir):
    ds = RestoreTestDataset(img_dir, img_dir, im_size=(64, 64))
    lq, hq, name = ds.sample(0)
    assert lq.shape == hq.shape == (64, 64, 3)
    assert name == "img_0"

    loader = DataLoader(ds, batch_size=3, shuffle=False, drop_last=False,
                        num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == 3  # 8 imgs / 3
    assert batches[0][0].shape == (3, 64, 64, 3)
    assert batches[-1][0].shape == (2, 64, 64, 3)
    # order is deterministic
    assert batches[0][2][0] == "img_0"


def test_loader_sharding(img_dir):
    ds = RestoreTestDataset(img_dir, None, im_size=(64, 64))
    l0 = DataLoader(ds, 2, shuffle=False, shard_index=0, shard_count=2,
                    num_workers=1)
    l1 = DataLoader(ds, 2, shuffle=False, shard_index=1, shard_count=2,
                    num_workers=1)
    n0 = [n for b in l0.epoch(0) for n in b[1]]
    n1 = [n for b in l1.epoch(0) for n in b[1]]
    assert not (set(n0) & set(n1))
    assert len(n0) + len(n1) == 8


def test_native_degrade_engine(rng):
    native = pytest.importorskip("vspbfr_tpu.data.native")
    if not native.available():
        pytest.skip("native degrade library not built")
    gt = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    seeds = np.asarray([1, 2], np.uint64)
    out = native.degrade_batch(gt, seeds)
    assert out.shape == gt.shape
    assert np.array_equal(out, native.degrade_batch(gt, seeds))
    assert np.abs(out - gt).mean() > 1e-3
    # uint8 quantization grid like the python path
    back = out * 255.0
    np.testing.assert_allclose(back, np.round(back), atol=1e-3)
