"""TPU-offloaded degradation: the device half of the training data pipeline.

The reference degrades on the host CPU (`dataset.py:327-372`), and SURVEY §7
flags that as the top starvation risk: measured on this image's 1-core host,
ONE 512px chain costs ~36 ms (the 41x41 blur alone is ~20 ms), capping the
feed at ~13 imgs/s against a ~49 imgs/s 8-chip demand. No host-side rewrite
closes that gap on a 1-core box — but almost the whole chain is dense array
math that the TPU does for ~free next to the train step. This module splits
the chain at its one CPU-only op (JPEG):

  host:    load + crop + param sampling + 41x41 kernel build  (~0.04 ms)
  device A: reflect-pad -> per-sample 41x41 blur (grouped conv) -> optional
            hazy blend -> dynamic bilinear downscale x[0.8,8] -> gaussian
            noise + clip -> uint8 quantize            (one jit per batch)
  host:    crop the true (dh, dw) region, JPEG encode/decode   (~0.5 ms at
            the mean downscaled size — the whole point of splitting HERE:
            JPEG runs at the small size, after the expensive ops)
  device B: dynamic bilinear resize back to 512 -> uint8-grid quantize ->
            optional gray                              (one jit per batch)

Semantics match `data/degradations.py::degrade_image` (itself matching
`dataset.py:327-372` + `my_basicsr/my_degradations.py`) to fp/cv2-fixed-
point tolerance; golden tests inject identical per-sample parameters into
both chains (tests/test_device_degrade.py). Random draws ON DEVICE (the
noise field) use the JAX PRNG, so the noise STREAM differs from the host
chain's numpy stream — same distribution, deterministic per (seed, step).

Shapes are static: the downscaled image lives in a (buf, buf) buffer
(buf = size/min_scale = 640 at 512px) with the true (dh, dw) carried as
traced scalars into the dynamic-resize gathers — no data-dependent shapes
anywhere, so each batch size compiles exactly once.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from vspbfr_tpu.data.degradations import (
    DegradationConfig,
    random_mixed_kernel,
)

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# cv2 COLOR_BGR2GRAY taps as applied by the reference's to-gray path
# (`dataset.py:306-315` calls it on RGB data, so R gets the B weight)
_GRAY_W_RGB = (0.114, 0.587, 0.299)


@dataclasses.dataclass
class DegradeParams:
    """Per-batch sampled degradation parameters (host numpy)."""

    kernels: np.ndarray      # (B, K, K) f32, zero-padded to the max K
    alpha: np.ndarray        # (B,) f32 hazy blend alpha; 1.0 = no haze
    dh: np.ndarray           # (B,) i32 downscaled height
    dw: np.ndarray           # (B,) i32 downscaled width
    sigma: np.ndarray        # (B,) f32 gaussian noise sigma (in /255 units)
    quality: np.ndarray      # (B,) i32 JPEG quality
    gray: np.ndarray         # (B,) bool grayscale flag


def sample_params(rng: np.random.Generator, batch: int, size: int,
                  cfg: DegradationConfig, gray_prob: float = 0.0
                  ) -> DegradeParams:
    """Sample one chain's parameters per image — the same distributions and
    per-sample draw order as `degrade_image` (`dataset.py:327-372`)."""
    kmax = 2 * cfg.blur_kernel_half_range[1] + 1
    kernels = np.zeros((batch, kmax, kmax), np.float32)
    alpha = np.ones((batch,), np.float32)
    dh = np.empty((batch,), np.int32)
    dw = np.empty((batch,), np.int32)
    sigma = np.zeros((batch,), np.float32)
    quality = np.full((batch,), 100, np.int32)
    gray = np.zeros((batch,), bool)
    for i in range(batch):
        half = rng.integers(cfg.blur_kernel_half_range[0],
                            cfg.blur_kernel_half_range[1] + 1)
        ks = int(half) * 2 + 1
        k = random_mixed_kernel(rng, cfg.kernel_list, cfg.kernel_prob, ks,
                                sigma_range=cfg.blur_sigma)
        p = (kmax - ks) // 2
        kernels[i, p:p + ks, p:p + ks] = k
        if cfg.hazy_prob is not None and rng.uniform() < cfg.hazy_prob:
            alpha[i] = rng.uniform(*cfg.hazy_alpha)
        scale = rng.uniform(*cfg.downsample_range)
        dh[i] = int(size // scale)
        dw[i] = int(size // scale)
        if cfg.noise_range is not None:
            sigma[i] = rng.uniform(*cfg.noise_range)
        if cfg.jpeg_range is not None:
            quality[i] = int(rng.uniform(*cfg.jpeg_range))
        if gray_prob > 0.0:
            gray[i] = rng.uniform() < gray_prob
    return DegradeParams(kernels, alpha, dh, dw, sigma, quality, gray)


# ---------------------------------------------------------------------------
# device ops
# ---------------------------------------------------------------------------

# static rank buckets: the einsum cost is rank-linear, and one bucket =
# one compile. Isotropic / mildly anisotropic Gaussians sit in the first
# bucket; rotated needle kernels (sigma_min << 1 px) are near-diagonal
# ridges with rank up to K and land in the last (exact) bucket.
_RANK_BUCKETS = (12, 24, 41)


def factor_kernels(kernels: np.ndarray, tol: float = 1e-7):
    """Host-side SVD factorization of (B, K, K) blur kernels into
    separable column/row taps: k_b == sum_i u[b,:,i] v[b,:,i]^T exactly
    at full rank. Returns (u, v, rank) with u, v (B, K, rank) truncated
    to the smallest bucket whose residual singular value is < tol for
    every sample (last bucket = exact)."""
    b, k, _ = kernels.shape
    u = np.zeros((b, k, k), np.float32)
    v = np.zeros((b, k, k), np.float32)
    need = 1
    for i in range(b):
        uu, ss, vt = np.linalg.svd(kernels[i].astype(np.float64))
        u[i] = (uu * ss).astype(np.float32)
        v[i] = vt.T.astype(np.float32)
        need = max(need, int(np.sum(ss >= tol)))
    rank = next((r for r in _RANK_BUCKETS if r >= min(need, k)), k)
    rank = min(rank, k)
    return u[:, :, :rank], v[:, :, :rank], rank


def _banded(taps: jnp.ndarray, n_out: int, n_in: int) -> jnp.ndarray:
    """Toeplitz band matrix M[j, w] = taps[w - j] (0 <= w-j < K) from
    (..., K) taps, via the pad/tile/reshape trick — no gathers, no
    K-term masked sums. Requires n_in + 1 - K >= n_out (holds for 'valid'
    convs: n_in = n_out + K - 1)."""
    k = taps.shape[-1]
    assert n_in + 1 - k >= n_out
    lead = taps.shape[:-1]
    row = jnp.concatenate(
        [taps, jnp.zeros(lead + (n_in + 1 - k,), taps.dtype)], axis=-1)
    t = jnp.tile(row, (1,) * len(lead) + (n_out,))
    return t[..., : n_out * n_in].reshape(lead + (n_out, n_in))


def blur_batch_separable(x: jnp.ndarray, u: jnp.ndarray,
                         v: jnp.ndarray) -> jnp.ndarray:
    """Per-sample 2D FIR via the SVD-separable form, REFLECT_101 border:
    y_b = sum_i Bcol(u_bi) @ x_pad @ Brow(v_bi)^T — banded matmuls that
    ride the MXU. Mathematically identical to `blur_batch` up to the
    host-side SVD truncation (< 1e-7 for the Gaussian families).

    x: (B, H, W, C); u, v: (B, K, R)."""
    b, h, w, c = x.shape
    k = u.shape[1]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    # (B, R, out, in) band operators from the column/row taps
    by = _banded(jnp.swapaxes(u, 1, 2), h, h + 2 * p)
    bx = _banded(jnp.swapaxes(v, 1, 2), w, w + 2 * p)
    # contract H then W, summing ranks: XLA picks the schedule
    return jnp.einsum("brhH,bHWc,brwW->bhwc", by, xp, bx,
                      optimize=True)


def blur_batch(x: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample 2D FIR, REFLECT_101 border (cv2.filter2D semantics:
    cross-correlation with the center anchor — XLA convs are also
    cross-correlation, so no flip).

    x: (B, H, W, 3); kernels: (B, K, K) (odd K). One grouped conv with
    3B channel groups: the batch folds into channels so each sample sees
    its own kernel."""
    b, h, w, c = x.shape
    k = kernels.shape[1]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    xt = jnp.transpose(xp, (1, 2, 0, 3)).reshape(1, h + 2 * p, w + 2 * p,
                                                 b * c)
    kt = jnp.repeat(kernels[:, :, :, None], c, axis=3)        # (B,K,K,3)
    kt = jnp.transpose(kt, (1, 2, 0, 3)).reshape(k, k, 1, b * c)
    y = jax.lax.conv_general_dilated(
        xt, kt.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c)
    return jnp.transpose(y.reshape(h, w, b, c), (2, 0, 1, 3))


def _resize_axis_weights(out_px: int, src_px, dst_px):
    """cv2 INTER_LINEAR coordinates for one axis on a static out_px grid:
    fy = (j + 0.5) * src/dst - 0.5, indices clamped (replicate border).
    src_px / dst_px may be traced scalars. Returns (i0, i1, w) arrays."""
    j = jnp.arange(out_px, dtype=jnp.float32)
    f = (j + 0.5) * (src_px / dst_px) - 0.5
    i0f = jnp.floor(f)
    w = f - i0f
    hi = jnp.asarray(src_px, jnp.float32).astype(jnp.int32) - 1
    i0 = jnp.clip(i0f.astype(jnp.int32), 0, hi)
    i1 = jnp.clip(i0f.astype(jnp.int32) + 1, 0, hi)
    # out-of-range rows clamp both indices to the same pixel, making the
    # weight irrelevant — no extra masking needed
    return i0, i1, w


def _resize_axis_matrix(out_px: int, in_px: int, src_px, dst_px):
    """The bilinear interpolation operator for one axis as a DENSE
    (out_px, in_px) matrix R with R[j, i0(j)] = 1-w(j), R[j, i1(j)] = w(j)
    — built from traced sizes via iota equality, so the resize applies as
    a plain matmul on the MXU instead of dynamic gathers (measured: the
    gather form lowered pathologically on TPU, BENCH r4 258 ms/img)."""
    i0, i1, w = _resize_axis_weights(out_px, src_px, dst_px)
    cols = jax.lax.broadcasted_iota(jnp.int32, (out_px, in_px), 1)
    m0 = (cols == i0[:, None]).astype(jnp.float32) * (1.0 - w)[:, None]
    m1 = (cols == i1[:, None]).astype(jnp.float32) * w[:, None]
    return m0 + m1


def resize_bilinear_dynamic(x: jnp.ndarray, src_h, src_w, dst_h, dst_w,
                            out_px: int) -> jnp.ndarray:
    """Bilinear resize of the valid (src_h, src_w) region of a static
    (H, W, C) buffer onto the valid (dst_h, dst_w) region of a static
    (out_px, out_px, C) buffer: out = R_y @ x @ R_x^T as two matmuls.
    All four sizes may be traced scalars; rows/cols beyond the valid
    output region interpolate clamped border pixels (finite, ignored by
    consumers). Matches cv2.resize INTER_LINEAR up to its 11-bit
    fixed-point coefficients."""
    ry = _resize_axis_matrix(out_px, x.shape[0], src_h, dst_h)
    rx = _resize_axis_matrix(out_px, x.shape[1], src_w, dst_w)
    rows = jnp.einsum("oi,iwc->owc", ry, x)
    return jnp.einsum("pw,owc->opc", rx, rows)


def _quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
    """cv2 convertTo(CV_8U, 255) semantics: round-half-even + saturate."""
    return jnp.clip(jnp.round(x * 255.0), 0.0, 255.0).astype(jnp.uint8)


class DeviceDegrader:
    """Jitted stage-A/stage-B programs around the host JPEG step.

    Usage:
        dd = DeviceDegrader(size=512)
        params = sample_params(rng, B, 512, dd.cfg, gray_prob)
        small_u8 = np.asarray(dd.stage_a(gt, params..., key))   # (B,buf,buf,3) u8
        jpg = dd.host_jpeg(small_u8, params)                    # host, small size
        lq = dd.stage_b(jpg, params...)                         # (B,H,W,3) f32 [0,1]
    """

    def __init__(self, size: int = 512,
                 cfg: DegradationConfig = DegradationConfig()):
        self.size = size
        self.cfg = cfg
        # static downscale buffer: ceil of the largest downscaled size,
        # rounded up to the device-JPEG 16x16 MCU grid
        self.buf = int(np.ceil(size / cfg.downsample_range[0]))
        self.buf += (-self.buf) % 16

        def _stage_a_body(x, alpha, dh, dw, sigma, seeds):
            x = x * alpha[:, None, None, None] \
                + (1.0 - alpha)[:, None, None, None]

            def down(img, h_, w_):
                return resize_bilinear_dynamic(
                    img, jnp.float32(self.size), jnp.float32(self.size),
                    h_.astype(jnp.float32), w_.astype(jnp.float32),
                    self.buf)

            x = jax.vmap(down)(x, dh, dw)
            # per-sample noise keys: deterministic per sample seed,
            # independent of batch composition
            keys = jax.vmap(jax.random.key)(seeds)
            noise = jax.vmap(
                lambda k, s: jax.random.normal(k, x.shape[1:], jnp.float32)
            )(keys, seeds)
            x = jnp.clip(x + noise * (sigma / 255.0)[:, None, None, None],
                         0.0, 1.0)
            return _quantize_u8(x)

        @jax.jit
        def stage_a_sep(gt, u, v, alpha, dh, dw, sigma, seeds):
            # separable banded-matmul blur (MXU path, default)
            return _stage_a_body(blur_batch_separable(gt, u, v), alpha,
                                 dh, dw, sigma, seeds)

        @jax.jit
        def stage_a_full(gt, kernels, alpha, dh, dw, sigma, seeds):
            # full-kernel grouped conv (exotic high-rank kernels, tests)
            return _stage_a_body(blur_batch(gt, kernels), alpha, dh, dw,
                                 sigma, seeds)

        def _stage_b_body(small_u8, dh, dw, gray):
            x = small_u8.astype(jnp.float32) / 255.0

            def up(img, h_, w_):
                return resize_bilinear_dynamic(
                    img, h_.astype(jnp.float32), w_.astype(jnp.float32),
                    jnp.float32(self.size), jnp.float32(self.size),
                    self.size)

            x = jax.vmap(up)(x, dh, dw)
            # uint8-grid quantize (`dataset.py` tail; degrade_image:254)
            x = _quantize_u8(x).astype(jnp.float32) / 255.0
            w = jnp.asarray(_GRAY_W_RGB, jnp.float32)
            g = jnp.sum(x * w, axis=-1, keepdims=True)
            g = jnp.broadcast_to(g, x.shape)
            return jnp.where(gray[:, None, None, None], g, x)

        stage_b = jax.jit(_stage_b_body)

        @functools.partial(jax.jit, static_argnums=(11,))
        def degrade_all(gt_u8, u, v, alpha, dh, dw, sigma, seeds, tl, tc,
                        gray, quantize_gt):
            """The WHOLE chain as one device program — blur, downscale,
            noise, the device JPEG round-trip (device_jpeg.py), resize
            back, quantize, gray — no host hop at all. Input GT arrives
            as u8 (lossless: it came from u8 images; 4x smaller on the
            interconnect); returns (lq, gt) BOTH normalized to [-1, 1]
            and both device-resident, so the train step needs no second
            upload."""
            from vspbfr_tpu.data.device_jpeg import jpeg_roundtrip_batch
            gt = gt_u8.astype(jnp.float32) / 255.0
            small = _stage_a_body(blur_batch_separable(gt, u, v), alpha,
                                  dh, dw, sigma, seeds)
            jp = jpeg_roundtrip_batch(small, dh, dw, tl, tc)
            lq01 = _stage_b_body(jp, dh, dw, gray)
            # gt finishing (`dataset.py:306-315` gray; `:128-132` stage-2
            # uint8 GT round-trip), same order as the host dataset
            w = jnp.asarray(_GRAY_W_RGB, jnp.float32)
            g = jnp.sum(gt * w, axis=-1, keepdims=True)
            gt = jnp.where(gray[:, None, None, None],
                           jnp.broadcast_to(g, gt.shape), gt)
            if quantize_gt:
                gt = jnp.round(gt * 255.0) / 127.5 - 1.0
            else:
                gt = gt * 2.0 - 1.0
            return lq01 * 2.0 - 1.0, gt

        self._stage_a_sep = stage_a_sep
        self._stage_a_full = stage_a_full
        self._stage_b = stage_b
        self._degrade_all = degrade_all

    # -- public stages ------------------------------------------------------

    def stage_a(self, gt: np.ndarray | jnp.ndarray, p: DegradeParams,
                seeds: np.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) f32 [0,1] GT -> (B, buf, buf, 3) u8 downscaled+noised
        (valid region (dh, dw) per sample). seeds: (B,) uint32 per-sample
        noise seeds.

        The blur runs in the SVD-separable banded-matmul form (MXU);
        the host-side SVD picks the smallest exact rank bucket, so the
        factorization is lossless (last bucket = full rank)."""
        rest = (jnp.asarray(p.alpha), jnp.asarray(p.dh), jnp.asarray(p.dw),
                jnp.asarray(p.sigma), jnp.asarray(seeds, jnp.uint32))
        u, v, _ = factor_kernels(np.asarray(p.kernels))
        return self._stage_a_sep(jnp.asarray(gt), jnp.asarray(u),
                                 jnp.asarray(v), *rest)

    def host_jpeg(self, small_u8: np.ndarray, p: DegradeParams) -> np.ndarray:
        """JPEG round-trip per sample at the true downscaled size — the one
        CPU-only op, now at ~(size/3)^2 instead of size^2."""
        if cv2 is None:  # pragma: no cover
            raise ImportError("cv2 required for JPEG degradation")
        out = np.zeros_like(small_u8)
        for i in range(small_u8.shape[0]):
            h, w = int(p.dh[i]), int(p.dw[i])
            crop = small_u8[i, :h, :w]
            ok, enc = cv2.imencode(
                ".jpg", crop, [int(cv2.IMWRITE_JPEG_QUALITY),
                               int(p.quality[i])])
            assert ok
            out[i, :h, :w] = cv2.imdecode(enc, 1)
        return out

    def stage_b(self, small_u8: np.ndarray | jnp.ndarray,
                p: DegradeParams) -> jnp.ndarray:
        """JPEG'd (B, buf, buf, 3) u8 -> (B, size, size, 3) f32 [0,1] LQ."""
        return self._stage_b(jnp.asarray(small_u8), jnp.asarray(p.dh),
                             jnp.asarray(p.dw), jnp.asarray(p.gray))

    def degrade_batch_device(self, gt_u8: np.ndarray | jnp.ndarray,
                             p: DegradeParams, seeds: np.ndarray,
                             quantize_gt: bool = False):
        """The whole chain, ONE device dispatch, device JPEG — zero
        host<->device round-trips (the tunnel/PCIe hop measured ~43
        ms/img on this image's tunneled chip, dwarfing the ~1 ms/img of
        device compute). gt_u8: (B, H, W, 3) uint8. Returns (lq, gt)
        device arrays in [-1, 1]."""
        from vspbfr_tpu.data.device_jpeg import quality_tables
        u, v, _ = factor_kernels(np.asarray(p.kernels))
        tl = np.stack([quality_tables(int(q))[0] for q in p.quality])
        tc = np.stack([quality_tables(int(q))[1] for q in p.quality])
        return self._degrade_all(
            jnp.asarray(gt_u8), jnp.asarray(u), jnp.asarray(v),
            jnp.asarray(p.alpha), jnp.asarray(p.dh), jnp.asarray(p.dw),
            jnp.asarray(p.sigma), jnp.asarray(seeds, jnp.uint32),
            jnp.asarray(tl), jnp.asarray(tc), jnp.asarray(p.gray),
            bool(quantize_gt))

    # -- whole chain (convenience / tests) ----------------------------------

    def degrade_batch(self, gt: np.ndarray, p: DegradeParams,
                      seeds: np.ndarray | None = None) -> jnp.ndarray:
        if seeds is None:
            seeds = np.arange(gt.shape[0], dtype=np.uint32)
        small = np.asarray(self.stage_a(gt, p, seeds))
        return self.stage_b(self.host_jpeg(small, p), p)


class DeviceDegradeLoader:
    """Pipelined (lq, gt) training loader with the degradation chain split
    host/device (module docstring). Wraps the threaded `DataLoader` over a
    GT-only view of `RestoreTrainDataset`; the device stages for batch n+1
    are in flight while batch n's small images take their JPEG round-trip
    on the host.

    Yields (lq, gt), both (B, H, W, 3) f32 in [-1, 1]. With
    jpeg='device' both are DEVICE arrays from one dispatch — feed them
    straight to the train step, nothing else crosses the interconnect.
    gt is grayed consistently with lq via the per-sample flag
    (`dataset.py:306-315`); quantize_gt reproduces the stage-2 uint8 GT
    round-trip (`dataset.py:128-132`)."""

    def __init__(self, dataset, batch_size: int, *,
                 quantize_gt: bool | None = None,
                 gray_prob: float | None = None,
                 num_workers: int = 8, prefetch: int = 4, seed: int = 0,
                 shard_index: int = 0, shard_count: int = 1,
                 lookahead: int = 2, jpeg: str = "device"):
        """jpeg: 'device' (default) simulates the JPEG round-trip's lossy
        core on the chip (data/device_jpeg.py — whole chain is ONE device
        program, no host hop; deviates from libjpeg only by its
        fixed-point rounding, golden-bounded); 'host' routes the small
        images through the exact cv2 encoder.

        quantize_gt / gray_prob default to the wrapped dataset's own
        values so a non-default dataset cannot silently degrade with
        loader defaults; pass explicitly to override."""
        from vspbfr_tpu.data.datasets import DataLoader

        assert jpeg in ("device", "host")
        self.ds = dataset
        self.dd = DeviceDegrader(size=dataset.im_size[0], cfg=dataset.config)
        if gray_prob is None:  # dataset may carry None meaning "off"
            gray_prob = getattr(dataset, "gray_prob", 0.008)
        self.gray_prob = float(gray_prob or 0.0)
        self.quantize_gt = (getattr(dataset, "quantize_gt", False)
                            if quantize_gt is None else quantize_gt)
        self.jpeg = jpeg
        self.lookahead = max(1, lookahead)
        self.inner = DataLoader(
            _GTView(dataset), batch_size, num_workers=num_workers,
            prefetch=prefetch, seed=seed, shard_index=shard_index,
            shard_count=shard_count)

    def batches_per_epoch(self) -> int:
        return self.inner.batches_per_epoch()

    def _params(self, seeds: np.ndarray) -> DegradeParams:
        parts = [sample_params(np.random.default_rng(int(s)), 1,
                               self.ds.im_size[0], self.ds.config,
                               self.gray_prob)
                 for s in seeds]
        return DegradeParams(*[np.concatenate([getattr(p, f.name)
                                               for p in parts])
                               for f in dataclasses.fields(DegradeParams)])

    def _finish_gt(self, gt: np.ndarray, gray: np.ndarray) -> np.ndarray:
        if gray.any():
            w = np.asarray(_GRAY_W_RGB, np.float32)
            g = (gt * w).sum(axis=-1, keepdims=True)
            gt = np.where(gray[:, None, None, None], g, gt)
        if self.quantize_gt:
            gt = np.round(gt * 255.0).astype(np.uint8).astype(np.float32) \
                / 127.5 - 1.0
        else:
            gt = gt * 2.0 - 1.0
        return gt

    def forever(self, start_epoch: int = 0, start_batch: int = 0):
        import collections

        it = self.inner.forever(start_epoch, start_batch)
        inflight: collections.deque = collections.deque()

        if self.jpeg == "device":
            # the whole chain is one async device dispatch per batch
            # (incl. the gt finishing — both outputs device-resident); the
            # deque depth overlaps host image loading with device compute
            def submit_dev():
                gt_u8, seeds = next(it)
                seeds = np.asarray(seeds, np.uint32)
                p = self._params(seeds)
                inflight.append(self.dd.degrade_batch_device(
                    gt_u8, p, seeds, self.quantize_gt))

            for _ in range(self.lookahead):
                submit_dev()
            while True:
                lq, gt = inflight.popleft()
                submit_dev()
                yield lq, gt

        def submit():
            gt_u8, seeds = next(it)
            gt = gt_u8.astype(np.float32) / 255.0
            seeds = np.asarray(seeds, np.uint32)
            p = self._params(seeds)
            small = self.dd.stage_a(gt, p, seeds)
            inflight.append((gt, p, small))

        for _ in range(self.lookahead):
            submit()
        while True:
            gt, p, small_dev = inflight.popleft()
            small = np.asarray(small_dev)   # sync batch n ...
            submit()                        # ... while n+1.. run on device
            jpg = self.dd.host_jpeg(small, p)
            lq01 = self.dd.stage_b(jpg, p)
            lq = lq01 * 2.0 - 1.0           # device elementwise, async
            yield lq, self._finish_gt(gt, p.gray)


@dataclasses.dataclass
class _GTView:
    """GT-only dataset adapter: (gt u8 HWC, per-sample degrade seed)."""

    ds: Any

    def __len__(self):
        return len(self.ds)

    def sample(self, idx: int, epoch: int = 0):
        # delegate to the dataset's own GT prefix so the device loader's
        # GT stream can never desynchronize from the host loader's
        gt, rng = self.ds.sample_gt(idx, epoch)  # u8: lossless + 4x smaller
        seed = rng.integers(0, np.iinfo(np.uint32).max, dtype=np.uint32)
        return gt, np.uint32(seed)
