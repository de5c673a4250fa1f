"""Evaluation metrics + harness: PSNR / SSIM / LPIPS / FID.

The reference computes no metrics in-repo (SURVEY.md §4, §6: `Logger/Scorer.py`
and `my_lpips/__init__.py:54-61` helpers are dead); the paper's tables are
external. This module supplies the missing scorers so BASELINE configs (2)
can be measured: batch PSNR/SSIM in jax, LPIPS via the flax net, and
Frechet distance machinery with a pluggable feature extractor (pass converted
InceptionV3 params for standard FID; defaults to the LPIPS VGG16 trunk, which
is self-contained in this repo — report as "FID-VGG").
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """Per-sample PSNR; inputs (B, H, W, C) in [-1, 1] by default."""
    mse = jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """Per-sample SSIM (gaussian 11x11 sigma 1.5, channel-averaged)."""
    # gaussian window as depthwise conv
    size, sigma = 11, 1.5
    g = np.exp(-0.5 * ((np.arange(size) - size // 2) / sigma) ** 2)
    g = (g / g.sum()).astype(np.float32)
    window = jnp.asarray(np.outer(g, g))

    c = a.shape[-1]
    w = jnp.tile(window[:, :, None, None], (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, precision=jax.lax.Precision.HIGHEST)

    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_a = filt(a * a) - mu_a2
    s_b = filt(b * b) - mu_b2
    s_ab = filt(a * b) - mu_ab
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    m = ((2 * mu_ab + c1) * (2 * s_ab + c2)) / (
        (mu_a2 + mu_b2 + c1) * (s_a + s_b + c2))
    return jnp.mean(m, axis=(1, 2, 3))


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """FID between two Gaussians (numpy, eigendecomposition-based sqrtm)."""
    diff = mu1 - mu2
    # sqrtm(cov1 @ cov2) via eigvals of the product (may be non-symmetric)
    prod = cov1 @ cov2
    eigvals = np.linalg.eigvals(prod)
    tr_sqrt = np.sum(np.sqrt(np.maximum(eigvals.real, 0.0)))
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * tr_sqrt)


class FeatureStats:
    """Streaming mean/cov accumulator for FID."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros(dim, np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray) -> None:
        feats = np.asarray(feats, np.float64)
        self.n += feats.shape[0]
        self.sum += feats.sum(0)
        self.outer += feats.T @ feats

    def finalize(self):
        mu = self.sum / self.n
        cov = self.outer / self.n - np.outer(mu, mu)
        cov *= self.n / max(self.n - 1, 1)
        return mu, cov


def make_vgg_feature_fn(lpips_params) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Default FID feature extractor: LPIPS VGG16 relu5_3 global-avg-pooled.

    Self-contained stand-in for InceptionV3 pool3 (results are comparable
    across runs of this harness, not with published FID numbers; pass real
    inception features for those)."""
    from vspbfr_tpu.losses.lpips import VGG16Features, _SHIFT, _SCALE

    net = VGG16Features()

    @jax.jit
    def feature_fn(img: jnp.ndarray) -> jnp.ndarray:
        taps = net.apply({"params": lpips_params["vgg"]},
                         (img - _SHIFT) / _SCALE)
        return jnp.mean(taps[-1], axis=(1, 2))

    return feature_fn


def evaluate_pairs(restored_iter, metrics=("psnr", "ssim"),
                   lpips_apply=None, feature_fn=None) -> dict[str, float]:
    """Aggregate metrics over an iterator of (restored, gt) NHWC batches."""
    sums: dict[str, float] = {m: 0.0 for m in metrics}
    if lpips_apply is not None:
        sums["lpips"] = 0.0
    n = 0
    stats_r = stats_g = None
    for restored, gt in restored_iter:
        b = restored.shape[0]
        if "psnr" in sums:
            sums["psnr"] += float(jnp.sum(psnr(restored, gt)))
        if "ssim" in sums:
            sums["ssim"] += float(jnp.sum(ssim(restored, gt)))
        if lpips_apply is not None:
            sums["lpips"] += float(jnp.sum(lpips_apply(restored, gt)))
        if feature_fn is not None:
            fr = np.asarray(feature_fn(restored))
            fg = np.asarray(feature_fn(gt))
            if stats_r is None:
                stats_r = FeatureStats(fr.shape[1])
                stats_g = FeatureStats(fg.shape[1])
            stats_r.update(fr)
            stats_g.update(fg)
        n += b
    out = {k: v / n for k, v in sums.items()}
    if stats_r is not None:
        out["fid"] = frechet_distance(*stats_r.finalize(), *stats_g.finalize())
    return out
