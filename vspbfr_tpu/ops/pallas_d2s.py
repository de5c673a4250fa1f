"""Pallas phase-interleave (grouped depth-to-space) kernels.

The subpixel formulation of every StyleGAN2 resampling op (see ops/packed.py)
emits spatial phases as channel groups ordered (gy, gx, inner):

    y[b, 2i+gy, 2j+gx, c] = x[b, i, j, (2*gy+gx)*inner + c]

XLA lowers the stack/transpose interleave as an HBM relayout with a tiny
minor dimension — measured 9.6 ms (112 GB/s) at (4,256,256,512) on v5e,
dominating the up-conv it follows. These kernels do the same permutation at
HBM speed-of-light: 1.67 ms / 643 GB/s measured (scripts/exp_interleave.py).

Trick: view the output as (B, h, 2, 2w, inner) so the row parity is its own
(untiled) dimension — each grid cell writes two contiguous (h_t, 2w, inner)
tiles whose column interleave is a repeat + parity select on the sublane
dim. The final reshape to (B, 2h, 2w, inner) is free (contiguous).

The inverse (grouped space-to-depth) is the VJP and is itself a Pallas
kernel of the mirrored form. Both fall back to the XLA 6D transpose when
the shape is unaligned (inner % 128, tiny sizes) or off-TPU — same math,
so tests run everywhere and `jax.custom_vjp` keeps R1-style double
gradients exact (a permutation is its own linearization).

Replaces the reference's CUDA upfirdn2d up-phase scatter
(`op/upfirdn2d_kernel.cu:107-207`) at the data-movement level.
"""

from __future__ import annotations

import functools

import os

import jax
import jax.numpy as jnp


def _pallas_enabled() -> bool:
    """Trace-time kill switch: VSPBFR_PALLAS=0 routes every op to its
    XLA fallback (identical math) — e.g. to bound compile-host memory
    on very large training graphs."""
    return os.environ.get("VSPBFR_PALLAS", "1") != "0"


def _pick_ht(h: int, row_bytes: int, budget: int = 4 * 1024 * 1024) -> int:
    for h_t in (32, 16, 8, 4, 2, 1):
        if h % h_t == 0 and h_t * row_bytes <= budget:
            return h_t
    return 1


def _use_pallas(b, h, w, inner, dtype) -> bool:
    if not _pallas_enabled() or jax.default_backend() != "tpu":
        return False
    itemsize = jnp.dtype(dtype).itemsize
    sub_min = 32 // itemsize  # sublane tile: f32 8, bf16 16
    return (inner % 128 == 0) and (w % sub_min == 0) and h >= 1


def _d2s_xla(x: jnp.ndarray, inner: int) -> jnp.ndarray:
    b, h, w, _ = x.shape
    o = x.reshape(b, h, w, 2, 2, inner)
    o = jnp.transpose(o, (0, 1, 3, 2, 4, 5))
    return o.reshape(b, 2 * h, 2 * w, inner)


def _s2d_xla(y: jnp.ndarray, inner: int) -> jnp.ndarray:
    b, h2, w2, _ = y.shape
    h, w = h2 // 2, w2 // 2
    o = y.reshape(b, h, 2, w, 2, inner)
    o = jnp.transpose(o, (0, 1, 3, 2, 4, 5))
    return o.reshape(b, h, w, 4 * inner)


def _d2s_pallas(x: jnp.ndarray, inner: int,
                interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, _ = x.shape
    h_t = _pick_ht(h, w * 4 * inner * x.dtype.itemsize)

    def kernel(x_ref, o_ref):
        xb = x_ref[0]  # (h_t, w, 4*inner), channels (gy, gx, inner)
        col = jax.lax.broadcasted_iota(
            jnp.int32, (xb.shape[0], 2 * w, inner), 1)
        for gy in range(2):
            a = xb[:, :, (2 * gy) * inner:(2 * gy + 1) * inner]
            c = xb[:, :, (2 * gy + 1) * inner:(2 * gy + 2) * inner]
            o_ref[0, :, gy] = jnp.where(
                col % 2 == 0,
                jnp.repeat(a, 2, axis=1), jnp.repeat(c, 2, axis=1))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, 2, 2 * w, inner), x.dtype),
        grid=(b, h // h_t),
        in_specs=[pl.BlockSpec((1, h_t, w, 4 * inner),
                               lambda ib, ih: (ib, ih, 0, 0))],
        out_specs=pl.BlockSpec((1, h_t, 2, 2 * w, inner),
                               lambda ib, ih: (ib, ih, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x)
    return out.reshape(b, 2 * h, 2 * w, inner)


def _s2d_pallas(y: jnp.ndarray, inner: int,
                interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h2, w2, _ = y.shape
    h, w = h2 // 2, w2 // 2
    yv = y.reshape(b, h, 2, w2, inner)
    h_t = _pick_ht(h, w * 4 * inner * y.dtype.itemsize)

    def kernel(y_ref, o_ref):
        for gy in range(2):
            rows = y_ref[0, :, gy]                     # (h_t, 2w, inner)
            # merging adjacent column pairs into lanes IS the (gx, inner)
            # channel deinterleave (no strided slice — Mosaic rejects
            # stride-2 vector extracts)
            o_ref[0, :, :, (2 * gy) * inner:(2 * gy + 2) * inner] = (
                rows.reshape(rows.shape[0], w, 2 * inner))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, 4 * inner), y.dtype),
        grid=(b, h // h_t),
        in_specs=[pl.BlockSpec((1, h_t, 2, w2, inner),
                               lambda ib, ih: (ib, ih, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, h_t, w, 4 * inner),
                               lambda ib, ih: (ib, ih, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(yv)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def interleave_d2s(x: jnp.ndarray, inner: int) -> jnp.ndarray:
    """(B, h, w, 4*inner) phase groups (gy, gx, inner) -> (B, 2h, 2w, inner)."""
    b, h, w, c4 = x.shape
    assert c4 == 4 * inner, (c4, inner)
    if _use_pallas(b, h, w, inner, x.dtype):
        return _d2s_pallas(x, inner)
    return _d2s_xla(x, inner)


def _d2s_fwd(x, inner):
    return interleave_d2s(x, inner), None


def _d2s_bwd(inner, _, g):
    return (gather_s2d(g, inner),)


interleave_d2s.defvjp(_d2s_fwd, _d2s_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gather_s2d(y: jnp.ndarray, inner: int) -> jnp.ndarray:
    """Inverse of interleave_d2s: (B, 2h, 2w, inner) -> (B, h, w, 4*inner)."""
    b, h2, w2, c = y.shape
    assert c == inner, (c, inner)
    if _use_pallas(b, h2 // 2, w2 // 2, inner, y.dtype):
        return _s2d_pallas(y, inner)
    return _s2d_xla(y, inner)


def _s2d_fwd(y, inner):
    return gather_s2d(y, inner), None


def _s2d_bwd(inner, _, g):
    return (interleave_d2s(g, inner),)


gather_s2d.defvjp(_s2d_fwd, _s2d_bwd)
