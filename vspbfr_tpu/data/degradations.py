"""Host-side degradation synthesis (numpy/cv2), the TPU build's equivalent of
the vendored basicsr subset (`my_basicsr/my_degradations.py`).

Differences from the reference by design:
  * every sampler takes an explicit `np.random.Generator` — deterministic
    given a seed (the reference uses global `random`/`np.random` state and is
    unreproducible; SURVEY.md §5 "no deterministic-mode enforcement").
  * pure functions, no Dataset coupling; the dataset layer composes them.

Kernel families (`my_degradations.py:77-193,358-376`): iso/aniso bivariate
Gaussian, generalized Gaussian (exp(-0.5 (x'S x)^beta)), plateau
(1/(1+(x'S x)^beta)), and the circular sinc low-pass. Noise
(`:386-512,518-678`): Gaussian (color/gray) and Poisson. JPEG via cv2
imencode (`:681-710`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target image
    cv2 = None

try:
    from scipy import special as _special
except ImportError:  # pragma: no cover
    _special = None


# --------------------------------------------------------------------------
# blur kernels
# --------------------------------------------------------------------------

def _mesh_grid(kernel_size: int) -> np.ndarray:
    ax = np.arange(-(kernel_size // 2), kernel_size // 2 + 1, dtype=np.float64)
    xx, yy = np.meshgrid(ax, ax)
    return np.stack([xx, yy], axis=-1)  # (K, K, 2)


def _sigma_matrix(sig_x: float, sig_y: float, theta: float) -> np.ndarray:
    d = np.diag([sig_x ** 2, sig_y ** 2])
    u = np.array([[math.cos(theta), -math.sin(theta)],
                  [math.sin(theta), math.cos(theta)]])
    return u @ d @ u.T


def _quad_form(sigma_matrix: np.ndarray, grid: np.ndarray) -> np.ndarray:
    inv = np.linalg.inv(sigma_matrix)
    return np.einsum("klj,ji,kli->kl", grid, inv, grid)


def bivariate_gaussian_kernel(kernel_size: int, sig_x: float, sig_y: float = None,
                              theta: float = 0.0, isotropic: bool = True) -> np.ndarray:
    sm = (np.diag([sig_x ** 2, sig_x ** 2]) if isotropic
          else _sigma_matrix(sig_x, sig_y, theta))
    k = np.exp(-0.5 * _quad_form(sm, _mesh_grid(kernel_size)))
    return (k / k.sum()).astype(np.float32)


def bivariate_generalized_gaussian_kernel(kernel_size: int, sig_x: float,
                                          sig_y: float, theta: float,
                                          beta: float,
                                          isotropic: bool = True) -> np.ndarray:
    sm = (np.diag([sig_x ** 2, sig_x ** 2]) if isotropic
          else _sigma_matrix(sig_x, sig_y, theta))
    k = np.exp(-0.5 * np.power(_quad_form(sm, _mesh_grid(kernel_size)), beta))
    return (k / k.sum()).astype(np.float32)


def bivariate_plateau_kernel(kernel_size: int, sig_x: float, sig_y: float,
                             theta: float, beta: float,
                             isotropic: bool = True) -> np.ndarray:
    sm = (np.diag([sig_x ** 2, sig_x ** 2]) if isotropic
          else _sigma_matrix(sig_x, sig_y, theta))
    k = 1.0 / (np.power(_quad_form(sm, _mesh_grid(kernel_size)), beta) + 1.0)
    return (k / k.sum()).astype(np.float32)


def circular_lowpass_kernel(cutoff: float, kernel_size: int,
                            pad_to: int = 0) -> np.ndarray:
    """2D sinc filter (`my_degradations.py:358-376`)."""
    assert kernel_size % 2 == 1
    if _special is None:
        raise ImportError("scipy required for sinc kernels")
    c = (kernel_size - 1) / 2
    y, x = np.mgrid[0:kernel_size, 0:kernel_size].astype(np.float64)
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = cutoff * _special.j1(cutoff * r) / (2 * np.pi * r)
    k[int(c), int(c)] = cutoff ** 2 / (4 * np.pi)
    k = k / k.sum()
    if pad_to > kernel_size:
        p = (pad_to - kernel_size) // 2
        k = np.pad(k, p)
    return k.astype(np.float32)


def random_mixed_kernel(
    rng: np.random.Generator,
    kernel_list: Sequence[str] = ("iso", "aniso"),
    kernel_prob: Sequence[float] = (0.5, 0.5),
    kernel_size: int = 21,
    sigma_range: tuple[float, float] = (0.6, 5.0),
    rotation_range: tuple[float, float] = (-math.pi, math.pi),
    betag_range: tuple[float, float] = (0.5, 8.0),
    betap_range: tuple[float, float] = (1.0, 4.0),
) -> np.ndarray:
    """Sample a kernel family then its parameters
    (`my_degradations.py:295-352`)."""
    kind = rng.choice(np.asarray(kernel_list, dtype=object),
                      p=np.asarray(kernel_prob) / np.sum(kernel_prob))
    sig_x = rng.uniform(*sigma_range)
    sig_y = rng.uniform(*sigma_range)
    theta = rng.uniform(*rotation_range)

    def sample_beta(lo, hi):
        # basicsr samples below/above 1 with p=0.5 each
        return rng.uniform(lo, 1.0) if rng.uniform() < 0.5 else rng.uniform(1.0, hi)

    if kind == "iso":
        return bivariate_gaussian_kernel(kernel_size, sig_x, isotropic=True)
    if kind == "aniso":
        return bivariate_gaussian_kernel(kernel_size, sig_x, sig_y, theta,
                                         isotropic=False)
    if kind == "generalized_iso":
        return bivariate_generalized_gaussian_kernel(
            kernel_size, sig_x, sig_y, theta, sample_beta(*betag_range), True)
    if kind == "generalized_aniso":
        return bivariate_generalized_gaussian_kernel(
            kernel_size, sig_x, sig_y, theta, sample_beta(*betag_range), False)
    if kind == "plateau_iso":
        return bivariate_plateau_kernel(
            kernel_size, sig_x, sig_y, theta, sample_beta(*betap_range), True)
    if kind == "plateau_aniso":
        return bivariate_plateau_kernel(
            kernel_size, sig_x, sig_y, theta, sample_beta(*betap_range), False)
    if kind == "sinc":
        cutoff = rng.uniform(np.pi / 3, np.pi)
        return circular_lowpass_kernel(cutoff, kernel_size)
    raise ValueError(f"unknown kernel type {kind!r}")


# --------------------------------------------------------------------------
# noise / compression
# --------------------------------------------------------------------------

def add_gaussian_noise(rng: np.random.Generator, img: np.ndarray,
                       sigma_range: tuple[float, float] = (0.0, 1.0),
                       gray_prob: float = 0.0, clip: bool = True) -> np.ndarray:
    """Gaussian noise with sigma measured in /255 units
    (`my_degradations.py:386-492`)."""
    sigma = rng.uniform(*sigma_range)
    if gray_prob > 0 and rng.uniform() < gray_prob:
        n = rng.standard_normal(img.shape[:2]).astype(np.float32)[..., None]
        n = np.repeat(n, img.shape[2], axis=2) * sigma / 255.0
    else:
        n = rng.standard_normal(img.shape).astype(np.float32) * sigma / 255.0
    out = img + n
    return np.clip(out, 0.0, 1.0) if clip else out


def add_poisson_noise(rng: np.random.Generator, img: np.ndarray,
                      scale_range: tuple[float, float] = (0.0, 1.0),
                      gray_prob: float = 0.0, clip: bool = True) -> np.ndarray:
    """Poisson (shot) noise (`my_degradations.py:518-678`): quantize to the
    image's unique-value count, Poisson-sample, scale the residual."""
    scale = rng.uniform(*scale_range)
    if gray_prob > 0 and rng.uniform() < gray_prob:
        base = cv2.cvtColor((img * 255).astype(np.float32), cv2.COLOR_RGB2GRAY) / 255.0 \
            if cv2 is not None else img.mean(axis=2)
        base = base[..., None]
    else:
        base = img
    base = np.clip(base, 0, 1)
    vals = len(np.unique(base))
    vals = 2 ** np.ceil(np.log2(vals))
    noisy = rng.poisson(base * vals) / float(vals)
    noise = (noisy - base) * scale
    if base.shape[2] == 1:
        noise = np.repeat(noise, img.shape[2], axis=2)
    out = img + noise
    return np.clip(out, 0.0, 1.0) if clip else out


def add_jpeg_compression(rng: np.random.Generator, img: np.ndarray,
                         quality_range: tuple[float, float] = (90, 100)) -> np.ndarray:
    """JPEG round-trip via cv2 (`my_degradations.py:681-710`)."""
    if cv2 is None:
        raise ImportError("cv2 required for JPEG degradation")
    quality = rng.uniform(*quality_range)
    img = np.clip(img, 0, 1)
    ok, enc = cv2.imencode(".jpg", img * 255.0,
                           [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)])
    assert ok
    return np.float32(cv2.imdecode(enc, 1)) / 255.0


# --------------------------------------------------------------------------
# the full VSPBFR degradation chain
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DegradationConfig:
    """Defaults = `dataset.py:222-236` (ImageFolder_restore_free_form)."""

    blur_kernel_half_range: tuple[int, int] = (19, 20)  # k = 2*randint+1 -> 39/41
    kernel_list: Sequence[str] = ("iso", "aniso")
    kernel_prob: Sequence[float] = (0.5, 0.5)
    blur_sigma: tuple[float, float] = (0.1, 10.0)
    downsample_range: tuple[float, float] = (0.8, 8.0)
    noise_range: tuple[float, float] | None = (0.0, 20.0)
    jpeg_range: tuple[float, float] | None = (60, 100)
    hazy_prob: float | None = 0.008
    hazy_alpha: tuple[float, float] = (0.75, 0.95)


def degrade_image(rng: np.random.Generator, img_gt: np.ndarray,
                  cfg: DegradationConfig = DegradationConfig()) -> np.ndarray:
    """GT (H, W, 3) float [0,1] -> degraded LQ, same size.

    Chain (`dataset.py:327-372`): random mixed blur -> optional hazy
    alpha-blend -> random bilinear downscale -> Gaussian noise -> JPEG ->
    resize back -> quantize to uint8 grid.
    """
    if cv2 is None:
        raise ImportError("cv2 required for the degradation pipeline")
    h, w = img_gt.shape[:2]
    half = rng.integers(cfg.blur_kernel_half_range[0],
                        cfg.blur_kernel_half_range[1] + 1)
    ksize = int(half) * 2 + 1
    kernel = random_mixed_kernel(
        rng, cfg.kernel_list, cfg.kernel_prob, ksize,
        sigma_range=cfg.blur_sigma)
    lq = cv2.filter2D(img_gt, -1, kernel)

    if cfg.hazy_prob is not None and rng.uniform() < cfg.hazy_prob:
        alpha = rng.uniform(*cfg.hazy_alpha)
        lq = lq * alpha + (1.0 - alpha)

    scale = rng.uniform(*cfg.downsample_range)
    lq = cv2.resize(lq, (int(w // scale), int(h // scale)),
                    interpolation=cv2.INTER_LINEAR)
    if cfg.noise_range is not None:
        lq = add_gaussian_noise(rng, lq, cfg.noise_range)
    if cfg.jpeg_range is not None:
        lq = add_jpeg_compression(rng, lq, cfg.jpeg_range)
    lq = cv2.resize(lq, (w, h), interpolation=cv2.INTER_LINEAR)
    return np.clip((lq * 255.0).round(), 0, 255).astype(np.float32) / 255.0
