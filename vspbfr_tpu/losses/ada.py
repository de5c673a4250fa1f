"""ADA: adaptive discriminator augmentation, pure-JAX and jit-compatible.

Re-design of `non_leaking.py:481-934`. Same transform distribution:

  geometric (`sample_affine`, `non_leaking.py:660-719`): x-flip, 90-degree
  rotations, integer translate (+-0.125), isotropic/anisotropic lognormal
  scale, pre/post rotation (p_rot = 1-sqrt(1-p)), fractional translate —
  each applied per-sample with probability p; applied through the
  antialiased chain 2x-up (SYM6 separable FIR) -> bilinear warp -> 2x-down
  (`random_apply_affine`, `:857-907`).

  color (`sample_color`, `:721-753`): brightness, contrast, luma flip,
  hue rotation, saturation as homogeneous 3D color matrices.

TPU-first deviations (documented):
  * The reference computes padding per-batch from the sampled matrix with
    host syncs (`get_padding` + `.item()`, `:770-806`) — dynamic shapes,
    hostile to jit. Here padding is STATIC: width/4 + kernel margin, which
    covers the transform distribution's typical support; rare extreme
    samples read zeros at the edge exactly as grid_sample's zero padding
    already does.
  * p is a traced scalar — the augment probability updates on-device without
    recompilation.

The adaptive controller (`AdaptiveAugment.tune`, `:481-517`) is a pure
function over an ADAState; the cross-rank reduce_sum becomes a plain jnp sum
under the sharded batch.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vspbfr_tpu.ops import upfirdn2d

# SYM6 wavelet taps (`non_leaking.py:519-532`) — public constants
SYM6 = jnp.asarray([
    0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
    -0.048311742585633, 0.4910559419267466, 0.787641141030194,
    0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
    0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
], dtype=jnp.float32)


# --------------------------------------------------------------------------
# homogeneous matrices (batched)
# --------------------------------------------------------------------------

def _eye(batch, n):
    return jnp.tile(jnp.eye(n, dtype=jnp.float32)[None], (batch, 1, 1))


def translate_mat(tx, ty):
    m = _eye(tx.shape[0], 3)
    return m.at[:, 0, 2].set(tx).at[:, 1, 2].set(ty)


def rotate_mat(theta):
    m = _eye(theta.shape[0], 3)
    c, s = jnp.cos(theta), jnp.sin(theta)
    return (m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
             .at[:, 1, 0].set(s).at[:, 1, 1].set(c))


def scale_mat(sx, sy):
    m = _eye(sx.shape[0], 3)
    return m.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy)


def translate3d_mat(tx, ty, tz):
    m = _eye(tx.shape[0], 4)
    return (m.at[:, 0, 3].set(tx).at[:, 1, 3].set(ty).at[:, 2, 3].set(tz))


def scale3d_mat(sx, sy, sz):
    m = _eye(sx.shape[0], 4)
    return (m.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy).at[:, 2, 2].set(sz))


def luma_flip_mat(axis, flip):
    """Householder about the luma axis, gated by flip in {0,1}."""
    b = flip.shape[0]
    v = jnp.asarray((*axis, 0.0), jnp.float32)
    h = jnp.eye(4) - 2.0 * jnp.outer(v, v)
    return jnp.where(flip[:, None, None] > 0.5, h[None], _eye(b, 4))


def rotate3d_mat(axis, theta):
    """Rodrigues rotation about `axis` embedded in homogeneous 4x4."""
    u = jnp.asarray(axis, jnp.float32)
    K = jnp.array([[0, -u[2], u[1]], [u[2], 0, -u[0]], [-u[1], u[0], 0]],
                  jnp.float32)
    c = jnp.cos(theta)[:, None, None]
    s = jnp.sin(theta)[:, None, None]
    R = jnp.eye(3)[None] + s * K[None] + (1 - c) * (K @ K)[None]
    m = _eye(theta.shape[0], 4)
    return m.at[:, :3, :3].set(R)


def saturation_mat(axis, s):
    u = jnp.asarray(axis, jnp.float32)
    P = jnp.outer(u, u)
    R = P[None] + (jnp.eye(3) - P)[None] * s[:, None, None]
    m = _eye(s.shape[0], 4)
    return m.at[:, :3, :3].set(R)


def _random_apply(key, p, mat_c, mat):
    gate = jax.random.bernoulli(key, p, (mat.shape[0],))
    return jnp.where(gate[:, None, None], mat_c @ mat, mat)


# --------------------------------------------------------------------------
# parameter sampling
# --------------------------------------------------------------------------

def sample_affine(key, p, batch, height, width):
    """(B, 3, 3) image-space affine, distributionally matching
    `sample_affine` (`non_leaking.py:660-719`)."""
    ks = jax.random.split(key, 16)
    G = _eye(batch, 3)
    # x-flip
    flip = jax.random.randint(ks[0], (batch,), 0, 2).astype(jnp.float32)
    G = _random_apply(ks[1], p, scale_mat(1 - 2 * flip, jnp.ones(batch)), G)
    # 90-degree rotations
    r90 = jax.random.randint(ks[2], (batch,), 0, 4).astype(jnp.float32)
    G = _random_apply(ks[3], p, rotate_mat(-math.pi / 2 * r90), G)
    # integer translate
    t = jax.random.uniform(ks[4], (2, batch), minval=-0.125, maxval=0.125)
    G = _random_apply(ks[5], p, translate_mat(jnp.round(t[1] * width),
                                              jnp.round(t[0] * height)), G)
    # isotropic scale
    s = jnp.exp2(jax.random.normal(ks[6], (batch,)) * 0.2)
    G = _random_apply(ks[7], p, scale_mat(s, s), G)
    p_rot = 1 - jnp.sqrt(jnp.clip(1 - p, 0.0, 1.0))
    # pre-rotate
    th = jax.random.uniform(ks[8], (batch,), minval=-math.pi, maxval=math.pi)
    G = _random_apply(ks[9], p_rot, rotate_mat(-th), G)
    # anisotropic scale
    s = jnp.exp2(jax.random.normal(ks[10], (batch,)) * 0.2)
    G = _random_apply(ks[11], p, scale_mat(s, 1 / s), G)
    # post-rotate
    th = jax.random.uniform(ks[12], (batch,), minval=-math.pi, maxval=math.pi)
    G = _random_apply(ks[13], p_rot, rotate_mat(-th), G)
    # fractional translate
    t = jax.random.normal(ks[14], (2, batch)) * 0.125
    G = _random_apply(ks[15], p, translate_mat(t[1] * width, t[0] * height), G)
    return G


def sample_color(key, p, batch):
    """(B, 4, 4) homogeneous color matrix (`non_leaking.py:721-753`)."""
    ks = jax.random.split(key, 10)
    axis = (1 / math.sqrt(3),) * 3
    C = _eye(batch, 4)
    b = jax.random.normal(ks[0], (batch,)) * 0.2
    C = _random_apply(ks[1], p, translate3d_mat(b, b, b), C)
    c = jnp.exp2(jax.random.normal(ks[2], (batch,)) * 0.5)
    C = _random_apply(ks[3], p, scale3d_mat(c, c, c), C)
    f = jax.random.randint(ks[4], (batch,), 0, 2).astype(jnp.float32)
    C = _random_apply(ks[5], p, luma_flip_mat(axis, f), C)
    h = jax.random.uniform(ks[6], (batch,), minval=-math.pi, maxval=math.pi)
    C = _random_apply(ks[7], p, rotate3d_mat(axis, h), C)
    s = jnp.exp2(jax.random.normal(ks[8], (batch,)) * 1.0)
    C = _random_apply(ks[9], p, saturation_mat(axis, s), C)
    return C


# --------------------------------------------------------------------------
# application
# --------------------------------------------------------------------------

def grid_sample_bilinear(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch grid_sample(bilinear, zeros, align_corners=False) on NHWC.

    grid: (B, Ho, Wo, 2) normalized coords, (x, y) order.
    """
    b, h, w, c = img.shape
    gx = (grid[..., 0] + 1.0) * w / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yi, xi):
        inb = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, yi_c, xi_c)
        return vals * inb[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def _single(m):
    return jnp.asarray(m, jnp.float32)


def _inv3(G):
    """Closed-form batched 3x3 inverse (adjugate / det). `jnp.linalg.inv`
    lowers to an LU while-loop on TPU that costs ~5 ms for the (B,3,3)
    homogeneous transforms; the adjugate is a handful of VPU ops and
    matches to ~4e-6 on the ADA transform family."""
    a, b, c = G[:, 0, 0], G[:, 0, 1], G[:, 0, 2]
    d, e, f = G[:, 1, 0], G[:, 1, 1], G[:, 1, 2]
    g, h, i = G[:, 2, 0], G[:, 2, 1], G[:, 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], -1)], -2)
    return adj / det[:, None, None]


def apply_affine(img: jnp.ndarray, G: jnp.ndarray,
                 kernel: jnp.ndarray = SYM6) -> jnp.ndarray:
    """Antialiased warp: reflect-pad -> separable 2x-up FIR -> bilinear
    warp by G^-1 -> separable 2x-down FIR (`random_apply_affine`,
    `non_leaking.py:857-907`) with static padding."""
    b, h, w, c = img.shape
    len_k = kernel.shape[0]
    pad_k = len_k // 4
    # static pad: covers the sampled transform family's typical support
    px = w // 4 + pad_k * 2
    py = h // 4 + pad_k * 2

    img_pad = jnp.pad(img, ((0, 0), (py, py), (px, px), (0, 0)),
                      mode="reflect")
    G_inv = _inv3(G)

    # separable 2x upsample: x then y (`non_leaking.py:877-879`)
    up_pad = ((len_k + 2 - 1) // 2, (len_k - 2) // 2)
    img_2x = _upfir_x_mm(img_pad, kernel, 2, 1, up_pad)
    img_2x = _upfir_y_mm(img_2x, kernel, 2, 1, up_pad)

    # coordinate bookkeeping (`non_leaking.py:880-892`), symmetric pad so the
    # (pad_x1-pad_x2)/2 recentering term vanishes
    A = _single([[2, 0, 0], [0, 2, 0], [0, 0, 1]])
    Ainv = _single([[0.5, 0, 0], [0, 0.5, 0], [0, 0, 1]])
    T = lambda tx, ty: _single([[1, 0, tx], [0, 1, ty], [0, 0, 1]])
    G_inv = A @ G_inv @ Ainv
    G_inv = T(-0.5, -0.5) @ G_inv @ T(0.5, 0.5)
    out_h = (h + pad_k * 2) * 2
    out_w = (w + pad_k * 2) * 2
    in_h, in_w = img_2x.shape[1], img_2x.shape[2]
    S1 = _single([[2 / in_w, 0, 0], [0, 2 / in_h, 0], [0, 0, 1]])
    S2 = _single([[out_w / 2, 0, 0], [0, out_h / 2, 0], [0, 0, 1]])
    G_inv = S1 @ G_inv @ S2

    # affine grid over the output shape (align_corners=False pixel centers)
    ys = (2 * jnp.arange(out_h) + 1) / out_h - 1
    xs = (2 * jnp.arange(out_w) + 1) / out_w - 1
    gx, gy = jnp.meshgrid(xs, ys)
    base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (Ho, Wo, 3)
    grid = jnp.einsum("bij,hwj->bhwi", G_inv, base)[..., :2]
    img_affine = grid_sample_bilinear(img_2x, grid)

    d_p = -pad_k * 2
    down_pad = (d_p + (len_k - 2 + 1) // 2, d_p + (len_k - 2) // 2)
    kf = jnp.flip(kernel)
    out = _upfir_x_mm(img_affine, kf, 1, 2, down_pad)
    out = _upfir_y_mm(out, kf, 1, 2, down_pad)
    return out


def _fir_matrix_x(win, kernel, up, down, pad):
    """(Win, Wout) matrix of the 1-D x-axis FIR pass, built EXACTLY by
    pushing the identity through `_upfir_x` (so pad/dilate/stride semantics
    match the conv form by construction). Folded to a constant by XLA under
    jit since the kernel taps are literals."""
    eye = jnp.eye(win, dtype=jnp.float32)[:, None, :, None]   # (Win,1,Win,1)
    m = _upfir_x(eye, kernel, up, down, pad)                  # (Win,1,Wout,1)
    return m[:, 0, :, 0]


def _fir_matrix_y(hin, kernel, up, down, pad):
    eye = jnp.eye(hin, dtype=jnp.float32)[:, :, None, None]   # (Hin,Hin,1,1)
    m = _upfir_y(eye, kernel, up, down, pad)                  # (Hin,Hout,1,1)
    return m[:, :, 0, 0]


def _upfir_x_mm(x, kernel, up, down, pad):
    """Matmul form of `_upfir_x`: the depthwise C=3 conv pads channels 3->128
    on the MXU (42x waste; measured 104 ms fwd / 500 ms fwd+bwd for the full
    affine chain at 256px b8), while `[(b,h,c) x w] @ [w x v]` is a clean MXU
    shape and its VJP is another matmul."""
    m = _fir_matrix_x(x.shape[2], kernel, up, down, pad)
    return jnp.einsum("bhwc,wv->bhvc", x, m,
                      precision=jax.lax.Precision.HIGHEST)


def _upfir_y_mm(x, kernel, up, down, pad):
    m = _fir_matrix_y(x.shape[1], kernel, up, down, pad)
    return jnp.einsum("bhwc,hv->bvwc", x, m,
                      precision=jax.lax.Precision.HIGHEST)


def _upfir_x(x, kernel, up, down, pad):
    b, h, w, c = x.shape
    k = kernel.shape[0]
    kf = jnp.flip(kernel)[None, None, :, None]           # HWIO (1,k,1,C)
    kf = jnp.tile(kf.reshape(1, k, 1, 1), (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x, kf, window_strides=(1, down),
        padding=((0, 0), (pad[0], pad[1] + up - 1)),
        lhs_dilation=(1, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return out


def _upfir_y(x, kernel, up, down, pad):
    b, h, w, c = x.shape
    k = kernel.shape[0]
    kf = jnp.flip(kernel).reshape(k, 1, 1, 1)
    kf = jnp.tile(kf, (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x, kf, window_strides=(down, 1),
        padding=((pad[0], pad[1] + up - 1), (0, 0)),
        lhs_dilation=(up, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return out


def apply_color(img: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,3) @ C (`apply_color`, `non_leaking.py:910-919`)."""
    M = C[:, :3, :3]
    add = C[:, :3, 3]
    return jnp.einsum("bhwc,bdc->bhwd", img, M) + add[:, None, None, :]


def augment(key: jax.Array, img: jnp.ndarray, p) -> jnp.ndarray:
    """Full ADA augment (`augment`, `non_leaking.py:930-934`)."""
    k1, k2 = jax.random.split(key)
    b, h, w, _ = img.shape
    G = sample_affine(k1, p, b, h, w)
    img = apply_affine(img, G)
    C = sample_color(k2, p, b)
    return apply_color(img, C)


# --------------------------------------------------------------------------
# adaptive controller
# --------------------------------------------------------------------------

class ADAState(NamedTuple):
    p: jnp.ndarray            # scalar augment probability
    sign_sum: jnp.ndarray
    count: jnp.ndarray
    steps: jnp.ndarray

    @classmethod
    def create(cls):
        # distinct arrays: shared buffers break jit donation (same buffer
        # would be donated multiple times)
        return cls(p=jnp.zeros(()), sign_sum=jnp.zeros(()),
                   count=jnp.zeros(()), steps=jnp.zeros((), jnp.int32))


def ada_update(state: ADAState, real_pred: jnp.ndarray,
               target: float = 0.6, ada_length: int = 500 * 1000,
               update_every: int = 256) -> ADAState:
    """`AdaptiveAugment.tune` (`non_leaking.py:492-517`), pure + jittable."""
    sign_sum = state.sign_sum + jnp.sum(jnp.sign(real_pred))
    count = state.count + real_pred.shape[0] * 1.0
    steps = state.steps + 1

    def adjust(_):
        rt = sign_sum / count
        sign = jnp.where(rt > target, 1.0, -1.0)
        p = jnp.clip(state.p + sign * count / ada_length, 0.0, 1.0)
        return ADAState(p=p, sign_sum=jnp.zeros(()), count=jnp.zeros(()),
                        steps=jnp.zeros((), jnp.int32))

    def keep(_):
        return ADAState(p=state.p, sign_sum=sign_sum, count=count,
                        steps=steps)

    return jax.lax.cond(steps >= update_every, adjust, keep, None)
