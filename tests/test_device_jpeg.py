"""Device JPEG round-trip vs the real cv2 (libjpeg) encode/decode.

The device form computes the identical lossy pipeline in float where
libjpeg uses fixed point, so outputs differ by scattered +-1..2/255
levels, not by artifact structure. Bounds asserted here: mean abs error
well under 1/255 and a tight high quantile."""

import numpy as np
import pytest

import jax.numpy as jnp

from vspbfr_tpu.data.device_jpeg import (
    jpeg_roundtrip,
    jpeg_roundtrip_batch,
    quality_tables,
)

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def smooth_u8(rng, h, w):
    base = rng.integers(0, 255, (h // 8, w // 8, 3), np.uint8)
    return cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)


@pytest.mark.parametrize("quality", [60, 80, 95])
def test_roundtrip_matches_cv2(rng, quality):
    h = w = 64
    img = smooth_u8(rng, h, w)
    ok, enc = cv2.imencode(".jpg", img,
                           [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    assert ok
    ref = cv2.imdecode(enc, 1).astype(np.float32)

    out = np.asarray(jpeg_roundtrip(
        jnp.asarray(img), jnp.int32(h), jnp.int32(w),
        tuple(jnp.asarray(t) for t in quality_tables(quality))))
    diff = np.abs(out.astype(np.float32) - ref)
    assert float(diff.mean()) < 1.3, (quality, diff.mean())
    # tail: fixed-point-vs-float coefficient tie-flips move one whole
    # quantized basis function (several levels in an 8x8 block)
    assert float(np.quantile(diff, 0.99)) <= 8.0, (
        quality, np.quantile(diff, 0.99))
    # the device round-trip must actually be lossy like the real one
    # (not an identity): both should deviate from the original similarly
    d_ref = np.abs(ref - img.astype(np.float32)).mean()
    d_dev = np.abs(out.astype(np.float32) - img.astype(np.float32)).mean()
    assert abs(d_ref - d_dev) < 0.3 * max(d_ref, 1e-3), (d_ref, d_dev)


def test_partial_region_matches_cropped_encode(rng):
    """JPEG of the valid (dh, dw) region of a padded buffer == JPEG of the
    cropped image (block-edge replication matches libjpeg MCU padding)."""
    buf = 80  # multiple of 16
    dh, dw = 52, 38
    img = np.zeros((buf, buf, 3), np.uint8)
    img[:dh, :dw] = smooth_u8(rng, dh + 12, dw + 12)[:dh, :dw]

    ok, enc = cv2.imencode(".jpg", img[:dh, :dw],
                           [int(cv2.IMWRITE_JPEG_QUALITY), 80])
    ref = cv2.imdecode(enc, 1).astype(np.float32)

    out = np.asarray(jpeg_roundtrip(
        jnp.asarray(img), jnp.int32(dh), jnp.int32(dw),
        tuple(jnp.asarray(t) for t in quality_tables(80))))[:dh, :dw]
    diff = np.abs(out.astype(np.float32) - ref)
    # the cropped-encode comparison carries the same fixed-point tie-flip
    # noise as the full-image case plus partial-block boundary coupling;
    # structure (not bit-exactness) is the fidelity claim
    assert float(diff.mean()) < 2.0, diff.mean()
    assert float(np.quantile(diff, 0.99)) <= 10.0, np.quantile(diff, 0.99)


def test_batch_form_matches_single(rng):
    imgs = np.stack([smooth_u8(rng, 32, 32) for _ in range(3)])
    dh = np.asarray([32, 20, 9], np.int32)
    dw = np.asarray([32, 15, 30], np.int32)
    qs = [60, 75, 92]
    tl = np.stack([quality_tables(q)[0] for q in qs])
    tc = np.stack([quality_tables(q)[1] for q in qs])
    out = np.asarray(jpeg_roundtrip_batch(
        jnp.asarray(imgs), jnp.asarray(dh), jnp.asarray(dw),
        jnp.asarray(tl), jnp.asarray(tc)))
    for i in range(3):
        one = np.asarray(jpeg_roundtrip(
            jnp.asarray(imgs[i]), jnp.int32(dh[i]), jnp.int32(dw[i]),
            tuple(jnp.asarray(t) for t in quality_tables(qs[i]))))
        np.testing.assert_array_equal(out[i], one)


def test_quality_tables_match_libjpeg_formula():
    tl50, tc50 = quality_tables(50)
    np.testing.assert_array_equal(tl50, np.asarray(
        [[16, 11, 10, 16, 24, 40, 51, 61],
         [12, 12, 14, 19, 26, 58, 60, 55],
         [14, 13, 16, 24, 40, 57, 69, 56],
         [14, 17, 22, 29, 51, 87, 80, 62],
         [18, 22, 37, 56, 68, 109, 103, 77],
         [24, 35, 55, 64, 81, 104, 113, 92],
         [49, 64, 78, 87, 103, 121, 120, 101],
         [72, 92, 95, 98, 112, 100, 103, 99]], np.float32))
    tl100, _ = quality_tables(100)
    np.testing.assert_array_equal(tl100, np.ones((8, 8), np.float32))
    tl10, _ = quality_tables(10)
    assert tl10.max() == 255.0 or tl10.max() > tl50.max()
