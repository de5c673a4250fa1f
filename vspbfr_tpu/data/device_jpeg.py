"""JPEG round-trip simulation ON DEVICE (the lossy core of libjpeg).

The degradation chain's JPEG step (`my_basicsr/my_degradations.py:681-710`)
is an encode-then-decode — the entropy coding in the middle is LOSSLESS,
so the round-trip equals the deterministic lossy core:

    RGB -> JFIF YCbCr -> 4:2:0 chroma box-downsample -> per-8x8-block
    DCT-II -> quantize by the quality-scaled Annex-K tables (round) ->
    dequantize -> IDCT -> fancy (9-3-3-1 triangle) chroma upsample ->
    RGB -> clamp/round to u8

all of which is dense math the TPU runs in microseconds. This removes the
data pipeline's ONLY host round-trip: over this image's tunneled TPU the
(B, 640, 640, 3) u8 hop measured ~27 MB/s (~43 ms/img both ways —
dwarfing the 1.2 ms/img of device compute), and even on a local host it
saves the PCIe bounce and the per-sample cv2 calls.

Fidelity: libjpeg computes the same pipeline in fixed point (jfdctint /
jpeg_idct_islow, integer color convert), so outputs differ from this
float implementation by the fixed-point rounding — a few +-1/255 levels
scattered per block, NOT a different artifact structure. The golden tests
(tests/test_device_jpeg.py) bound the deviation vs cv2.imencode/imdecode
(mean well under 1/255). The host-exact path remains available
(`DeviceDegradeLoader(jpeg="host")`).

Block grids operate on the static padded buffer; values beyond a
sample's valid (dh, dw) region are border-replicated first (exactly what
libjpeg's MCU edge padding does), so straddling blocks see the same
pixels the host encoder would.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

# ITU-T T.81 Annex K quantization base tables (zigzag-free, row-major)
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float64)
_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], np.float64)


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg jpeg_set_quality / jpeg_add_quant_table scaling."""
    q = int(np.clip(quality, 1, 100))
    scale = 5000 // q if q < 50 else 200 - 2 * q

    def scale_tbl(base):
        t = (base * scale + 50) // 100
        return np.clip(t, 1, 255).astype(np.float32)

    return scale_tbl(_Q_LUMA), scale_tbl(_Q_CHROMA)


@functools.lru_cache(maxsize=1)
def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix D: coefficients = D @ block @ D.T."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    d *= np.sqrt(2.0 / 8.0)
    d[0] *= 1.0 / np.sqrt(2.0)
    return d.astype(np.float32)


def _blockwise(x: jnp.ndarray, fn) -> jnp.ndarray:
    """Apply fn on (.., n, 8, 8) blocks of a (.., H, W) plane (H, W % 8 == 0)."""
    *lead, h, w = x.shape
    b = x.reshape(*lead, h // 8, 8, w // 8, 8)
    b = jnp.moveaxis(b, -3, -2)             # (.., h/8, w/8, 8, 8)
    b = fn(b)
    return jnp.moveaxis(b, -2, -3).reshape(*lead, h, w)


def _dct2(blocks: jnp.ndarray) -> jnp.ndarray:
    d = jnp.asarray(_dct_matrix())
    return jnp.einsum("ij,...jk,lk->...il", d, blocks, d)


def _idct2(blocks: jnp.ndarray) -> jnp.ndarray:
    d = jnp.asarray(_dct_matrix())
    return jnp.einsum("ji,...jk,kl->...il", d, blocks, d)


def _replicate_border(x: jnp.ndarray, dh, dw) -> jnp.ndarray:
    """Replicate row dh-1 / col dw-1 outward on a static (H, W[, C])
    buffer (libjpeg MCU edge padding) — via clamped-iota selection
    matrices, no gathers."""
    h, w = x.shape[0], x.shape[1]
    src_r = jnp.minimum(jnp.arange(h), dh - 1)
    ry = (jnp.arange(h)[None, :] == src_r[:, None]).astype(x.dtype)
    src_c = jnp.minimum(jnp.arange(w), dw - 1)
    rx = (jnp.arange(w)[None, :] == src_c[:, None]).astype(x.dtype)
    if x.ndim == 2:
        return jnp.einsum("iI,IJ,jJ->ij", ry, x, rx)
    return jnp.einsum("iI,IJc,jJ->ijc", ry, x, rx)


def _box_down2(p: jnp.ndarray) -> jnp.ndarray:
    """2x2 box average (libjpeg h2v2_downsample; bias-free float form)."""
    h, w = p.shape
    return p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _fancy_up2(c: jnp.ndarray) -> jnp.ndarray:
    """libjpeg h2v2 'fancy' (triangle 9-3-3-1 / 16) chroma upsample with
    replicated borders; (h, w) -> (2h, 2w)."""
    cp = jnp.pad(c, 1, mode="edge")
    n = cp[1:-1, 1:-1]
    up, dn = cp[:-2, 1:-1], cp[2:, 1:-1]
    lf, rt = cp[1:-1, :-2], cp[1:-1, 2:]
    ul, ur = cp[:-2, :-2], cp[:-2, 2:]
    dl, dr = cp[2:, :-2], cp[2:, 2:]

    def phase(vert, horiz, diag):
        return (9.0 * n + 3.0 * vert + 3.0 * horiz + diag) / 16.0

    p00 = phase(up, lf, ul)
    p01 = phase(up, rt, ur)
    p10 = phase(dn, lf, dl)
    p11 = phase(dn, rt, dr)
    h, w = c.shape
    out = jnp.stack([jnp.stack([p00, p01], axis=2),
                     jnp.stack([p10, p11], axis=2)], axis=1)
    return out.transpose(0, 1, 2, 3).reshape(2 * h, 2 * w)


def jpeg_roundtrip_plane(p: jnp.ndarray, tbl: jnp.ndarray) -> jnp.ndarray:
    """One plane (H, W), values [0, 255]: DCT-quantize-dequantize-IDCT."""
    def f(blocks):
        coef = _dct2(blocks - 128.0)
        q = jnp.round(coef / tbl)
        return _idct2(q * tbl) + 128.0
    return _blockwise(p, f)


def jpeg_roundtrip(img_u8: jnp.ndarray, dh, dw, quality_tbls) -> jnp.ndarray:
    """Device JPEG round-trip of the valid (dh, dw) region of a static
    (H, W, 3) u8 RGB buffer (H, W multiples of 16). quality_tbls:
    (tbl_luma, tbl_chroma) f32 (8, 8) for this sample's quality.
    Returns the full buffer, round-tripped, u8."""
    tl, tc = quality_tbls
    x = _replicate_border(img_u8.astype(jnp.float32), dh, dw)
    # cv2/libjpeg treats channel 0 as BLUE — and the reference chain feeds
    # its RGB arrays into cv2.imencode as-is (`my_degradations.py:681-710`),
    # so the faithful round-trip applies the BGR convention to whatever
    # channel order arrives (the round trip preserves channel order)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b

    y2 = jpeg_roundtrip_plane(y, tl)
    # libjpeg pads each COMPONENT to its block grid by edge replication
    # AFTER downsampling — re-replicate the chroma planes at the true
    # ceil(d/2) component size so straddling chroma blocks match
    ch, cw = (dh + 1) // 2, (dw + 1) // 2

    def chroma(p):
        small = _replicate_border(_box_down2(p), ch, cw)
        return _fancy_up2(jpeg_roundtrip_plane(small, tc))

    cb2 = chroma(cb)
    cr2 = chroma(cr)

    r2 = y2 + 1.402 * (cr2 - 128.0)
    g2 = y2 - 0.344136286 * (cb2 - 128.0) - 0.714136286 * (cr2 - 128.0)
    b2 = y2 + 1.772 * (cb2 - 128.0)
    out = jnp.stack([b2, g2, r2], axis=-1)  # ch0 = blue, as it arrived
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)


def jpeg_roundtrip_batch(imgs_u8: jnp.ndarray, dh: jnp.ndarray,
                         dw: jnp.ndarray, tl: jnp.ndarray,
                         tc: jnp.ndarray) -> jnp.ndarray:
    """vmapped batch form. imgs_u8 (B, H, W, 3); dh/dw (B,) i32;
    tl/tc (B, 8, 8) per-sample quality tables."""
    return jax.vmap(
        lambda im, h_, w_, a, c: jpeg_roundtrip(im, h_, w_, (a, c))
    )(imgs_u8, dh, dw, tl, tc)
