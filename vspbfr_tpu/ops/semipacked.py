"""Width-only (semi-packed) space-to-depth layout — candidate C=64 fix.

The full 2x2 packed layout (ops/packed.py) fixes lane starvation at C=32
(1024px) perfectly: 4C = 128 lanes, and the assembled stride-1 kernel's 4x
FLOP-density waste is bought back by MXU utilization. At C=64 (512px, the
RestoreNet SMART resolutions) the trade is worse: 4C = 256 lanes would also
be reachable by packing only ONE spatial axis — 2C = 128 lanes exactly —
at HALF the density waste:

    layout        lanes   assembled 3x3 kernel          relative FLOPs
    unpacked       64     (3,3, 64, 64)  100% dense      1x (starved lanes)
    semi-packed   128     (3,3,128,128)   50% dense      2x
    packed        256     (3,3,256,256)   25% dense      4x

(The 50%: the center x-column is phase-dense, the two edge x-columns are
phase-diagonal; rows stay literal. See ROADMAP.md round-2 notes.)

Layout: (B, H, 2w, C) -> (B, H, w, 2C), phase-major in x:
out[..., i, j, b*C + c] = x[..., i, 2j + b, c].

Even dilations factorize exactly (x-phases never mix): a 2-group conv at
rhs_dilation (d, d/2) — zero waste, same as the packed layout's grouped
form but with groups of the SAME size at 2x the spatial extent (identical
total FLOPs), so the even-dilation branches are a wash by construction; the
win to measure is the dense/odd-dilation (fusion) convs.

VERDICT (round-2, measured on v5e at the model shapes — see
scripts/exp_semipacked2.py and ROADMAP.md): **rejected for model wiring.**
The fusion conv does win as predicted (bf16 1.71 ms vs 2.53 ms packed),
but the full SMART composition loses (semi 11.32 ms vs packed 9.07 ms
per instance): on the 2x2-packed grid both d=1 and d=2 collapse to one
3x3 footprint, so the packed d1+d2 merge runs as a single 128-out-lane
Pallas conv (1.74 ms) where semi pays two lane-starved branches (4.62 ms).
These ops stay as the tested reference for the decision record (same
discipline as the two rejected SMART fusion kernels).

Reference context: these resolutions are the reference's dilated-conv SMART
layers (`/root/reference/models/RestoreNet.py:421-555`); the layout choice
has no torch counterpart.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vspbfr_tpu.ops.packed import _conv

_DN = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# layout converters
# ---------------------------------------------------------------------------

def space_to_width(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, 2w, C) -> (B, H, w, 2C), x-phase-major channels."""
    b, h, ww, c = x.shape
    w = ww // 2
    return x.reshape(b, h, w, 2 * c)


def width_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_width: (B, H, w, 2C) -> (B, H, 2w, C)."""
    b, h, w, c2 = x.shape
    return x.reshape(b, h, 2 * w, c2 // 2)


def packed_to_semipacked(x: jnp.ndarray) -> jnp.ndarray:
    """(B, h, w, 4C) 2x2-packed at res 2h -> (B, 2h, w, 2C) width-packed.

    The 2x2 phase-major block (ay, ax, c) splits into the y phase (restored
    to rows) and the x phase (kept in channels)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2 * c)          # (.., ay, (ax c))
    x = jnp.transpose(x, (0, 1, 3, 2, 4))     # (b, h, ay, w, 2c)
    return x.reshape(b, 2 * h, w, 2 * c)


def semipacked_to_packed(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of packed_to_semipacked."""
    b, hh, w, c2 = x.shape
    h = hh // 2
    x = x.reshape(b, h, 2, w, c2)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))     # (b, h, w, ay, (ax c))
    return x.reshape(b, h, w, 2 * c2)


def pack_vector_w(v: jnp.ndarray) -> jnp.ndarray:
    """Tile a per-channel vector across the 2 x-phase groups:
    (..., C) -> (..., 2C)."""
    return jnp.concatenate([v, v], axis=-1)


# ---------------------------------------------------------------------------
# kernel assembly (x axis packed, y axis literal)
# ---------------------------------------------------------------------------

def _assemble_x(w: jnp.ndarray) -> tuple[jnp.ndarray, tuple]:
    """Assemble the semi-packed kernel for a stride-1 'same' conv, d=1.

    w: (k, k, Ci, Co) unpacked. Returns (wp (k, kx', 2Ci, 2Co), (px0, px1))
    where the x taps follow y[o_x=2m+a] = sum_t D[t] x[2p+e] with
    2p + e = 2m + a + t - pad  =>  u = p - m = (a + t - pad - e) / 2."""
    k, _, ci, co = w.shape
    pad = (k - 1) // 2
    taps: dict[tuple[int, int], list[tuple[int, int]]] = {}
    us = []
    for a in range(2):
        for e in range(2):
            lst = []
            for t in range(k):
                num = a + t - pad - e
                if num % 2 == 0:
                    lst.append((num // 2, t))
            taps[(a, e)] = lst
            us += [u for (u, _) in lst]
    x0, x1 = min(us), max(us)
    wp = jnp.zeros((k, x1 - x0 + 1, 2 * ci, 2 * co), w.dtype)
    for (a, e), lst in taps.items():
        for (u, t) in lst:
            wp = wp.at[:, u - x0, e * ci:(e + 1) * ci,
                       a * co:(a + 1) * co].add(w[:, t])
    return wp, (-x0, x1)


def conv2d_semipacked(x: jnp.ndarray, w: jnp.ndarray, dilation: int = 1,
                      groups_hint: bool = True,
                      in_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stride-1 'same' conv on a width-packed tensor ==
    space_to_width(conv(width_to_space(x))).

    x: (B, H, w, 2Ci) width-packed; w: (k, k, Ci, Co) the UNPACKED kernel.

    dilation=1: ONE dense conv with the assembled (k, kx', 2Ci, 2Co) kernel
    (Pallas fast path when 2Ci/2Co are 128-aligned, i.e. C=64).
    Even dilation d: x-phases never mix — a feature_group_count=2 conv at
    rhs_dilation (d, d/2) when groups_hint, else the equivalent dense
    block-diagonal kernel. Odd dilations > 1 are unused by the models.

    in_scale: (B, 2Ci) per-sample input scale folded into the Pallas
    kernel's input stripe (or applied up front on fallbacks).
    """
    k = w.shape[0]
    if dilation % 2 == 0:
        d2 = dilation // 2
        pady = ((k - 1) * dilation) // 2
        padx = ((k - 1) * d2) // 2
        if groups_hint:
            if in_scale is not None:
                x = x * in_scale[:, None, None, :]
            wg = jnp.concatenate([w, w], axis=-1)  # (k,k,Ci,2Co)
            return jax.lax.conv_general_dilated(
                x, wg.astype(x.dtype), (1, 1),
                ((pady, pady), (padx, padx)), rhs_dilation=(dilation, d2),
                dimension_numbers=_DN, feature_group_count=2)
        ci, co = w.shape[2], w.shape[3]
        wd = jnp.zeros((k, k, 2 * ci, 2 * co), w.dtype)
        for ph in range(2):
            wd = wd.at[:, :, ph * ci:(ph + 1) * ci,
                       ph * co:(ph + 1) * co].set(w)
        if in_scale is not None:
            x = x * in_scale[:, None, None, :]
        return jax.lax.conv_general_dilated(
            x, wd.astype(x.dtype), (1, 1), ((pady, pady), (padx, padx)),
            rhs_dilation=(dilation, d2), dimension_numbers=_DN)

    if dilation != 1:
        raise NotImplementedError("odd dilation > 1 (unused by the models)")
    wp, (px0, px1) = _assemble_x(w)
    pady = (k - 1) // 2
    return _conv(x, wp, (pady, pady), (px0, px1), in_scale=in_scale)


def conv1x1_semipacked(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv on the width-packed layout: x-phases map independently with
    shared weights. x: (B,H,w,2Ci), w: (1,1,Ci,Co) or (Ci,Co)."""
    if w.ndim == 4:
        w = w[0, 0]
    b, h, wd, c2 = x.shape
    ci, co = w.shape
    out = x.reshape(b, h, wd, 2, ci) @ w.astype(x.dtype)
    return out.reshape(b, h, wd, 2 * co)
