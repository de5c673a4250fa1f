"""Fused styled-conv epilogue: out_scale * x + noise + bias -> leaky-relu.

Every StyledConv / SMART tail performs, elementwise over the conv output:

    y = lrelu(demod[b, c] * x + w_n * expand(noise) + bias[c]) * sqrt(2)

XLA executes this chain at ~315 GB/s on v5e (plus the phase-expansion of
the packed noise was pathological before the matmul form). This kernel
does the whole epilogue in ONE pass at HBM rate: read x + tiny noise,
write y. The noise expansion is an in-register (pix, nc) @ (nc, C) dot
(nc = 4 packed phases or 1 unpacked channel).

All pieces are optional; the XLA reference composition (`epilogue_ref`)
is the fallback (CPU / unaligned shapes) and the custom-vjp backward, so
gradients are exact and R1-compatible.

Fuses what the reference leaves to pointwise CUDA ops around its conv
(`op/fused_act.py:199-213` + `models/RestoreNet.py:557-569`).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_SQRT2 = math.sqrt(2.0)


def _expand_matrix(nc: int, c: int, dtype) -> jnp.ndarray:
    """(nc, C) matrix mapping per-phase noise onto phase-major channels."""
    m = np.kron(np.eye(nc, dtype=np.float32),
                np.ones((1, c // nc), np.float32))
    return jnp.asarray(m, dtype)


def epilogue_ref(x, out_scale, noise, bias, act: bool):
    """XLA composition (bwd + fallback). x (B,H,W,C); out_scale (B,C) or
    None; noise (B,H,W,nc) pre-scaled by the injection weight, or None;
    bias (C,) or None."""
    out = x
    if out_scale is not None:
        out = out * out_scale[:, None, None, :]
    if noise is not None:
        nc = noise.shape[-1]
        if nc == 1:
            out = out + noise
        else:
            out = out + noise @ _expand_matrix(nc, x.shape[-1], x.dtype)
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1)
    if act:
        out = jnp.where(out >= 0, out, 0.2 * out) * _SQRT2
    return out


def _use_pallas(x, noise) -> bool:
    if jax.default_backend() != "tpu":
        return False
    b, h, w, c = x.shape
    if c % 128 or b * h * w < 32768:
        return False
    if noise is not None and noise.shape[-1] not in (1, 4):
        return False
    return True


def _kernel(x_ref, osc_ref, nz_ref, b_ref, m_ref, o_ref, *,
            has_osc, has_nz, has_bias, act, nc):
    import jax.lax as lax
    from jax.experimental import pallas as pl

    bb = pl.program_id(0)
    v = x_ref[0].astype(jnp.float32)
    if has_osc:
        v = v * osc_ref[pl.ds(bb, 1), :].astype(jnp.float32)[None]
    if has_nz:
        nz = nz_ref[0].astype(jnp.float32)
        if nc == 1:
            v = v + jnp.broadcast_to(nz, v.shape)
        else:
            v = v + lax.dot_general(
                nz, m_ref[...].astype(jnp.float32),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    if has_bias:
        v = v + b_ref[pl.ds(0, 1), :].astype(jnp.float32)[None]
    if act:
        v = jnp.where(v >= 0, v, 0.2 * v) * _SQRT2
    o_ref[0] = v.astype(o_ref.dtype)


def _pallas(x, out_scale, noise, bias, act, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    has_osc = out_scale is not None
    has_nz = noise is not None
    has_bias = bias is not None
    nc = noise.shape[-1] if has_nz else 0

    row_bytes = w * c * x.dtype.itemsize
    h_t = 1
    for cand in (32, 16, 8, 4, 2, 1):
        if h % cand == 0 and 2 * cand * row_bytes < 6 * 1024 * 1024:
            h_t = cand
            break

    osc = out_scale if has_osc else jnp.zeros((b, 1), x.dtype)
    nz = noise if has_nz else jnp.zeros((b, 1, 1, 1), x.dtype)
    bb = (bias.reshape(1, -1) if has_bias
          else jnp.zeros((1, 1), x.dtype)).astype(x.dtype)
    m = (_expand_matrix(nc, c, x.dtype) if has_nz and nc > 1
         else jnp.zeros((1, 1), x.dtype))

    nz_spec = (pl.BlockSpec((1, h_t, w, nc), lambda ib, ih: (ib, ih, 0, 0))
               if has_nz else
               pl.BlockSpec((1, 1, 1, 1), lambda ib, ih: (ib, 0, 0, 0)))

    return pl.pallas_call(
        functools.partial(_kernel, has_osc=has_osc, has_nz=has_nz,
                          has_bias=has_bias, act=act, nc=nc),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, h // h_t),
        in_specs=[
            pl.BlockSpec((1, h_t, w, c), lambda ib, ih: (ib, ih, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # out_scale (B, C) whole
            nz_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (1, C) whole
            pl.BlockSpec(memory_space=pltpu.VMEM),   # expansion matrix
        ],
        out_specs=pl.BlockSpec((1, h_t, w, c), lambda ib, ih: (ib, ih, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, osc.astype(x.dtype), nz.astype(x.dtype), bb, m)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused(x, out_scale, noise, bias, act, interpret):
    return _pallas(x, out_scale, noise, bias, act, interpret)


def _fused_fwd(x, out_scale, noise, bias, act, interpret):
    return _fused(x, out_scale, noise, bias, act, interpret), \
        (x, out_scale, noise, bias)


def _fused_bwd(act, interpret, res, g):
    x, out_scale, noise, bias = res
    diff = tuple(a for a in (x, out_scale, noise, bias) if a is not None)

    def ref(*args):
        it = iter(args)
        return epilogue_ref(
            next(it),
            next(it) if out_scale is not None else None,
            next(it) if noise is not None else None,
            next(it) if bias is not None else None,
            act)

    _, vjp = jax.vjp(ref, *diff)
    grads = list(vjp(g))
    out = []
    for a in (x, out_scale, noise, bias):
        out.append(grads.pop(0) if a is not None else None)
    return tuple(out)


_fused.defvjp(_fused_fwd, _fused_bwd)


def conv_epilogue(x: jnp.ndarray,
                  out_scale: jnp.ndarray | None = None,
                  noise: jnp.ndarray | None = None,
                  bias: jnp.ndarray | None = None,
                  act: bool = True,
                  interpret: bool = False) -> jnp.ndarray:
    """Fused demod-scale + noise-injection + bias + fused-lrelu.

    noise must already be scaled by the injection weight. Packed layouts
    pass (B,H,W,4) per-phase noise; unpacked (B,H,W,1).
    """
    # Measured verdict (scripts/exp_epilogue.py, v5e): with the matmul-form
    # noise expansion XLA fuses the whole chain into ONE pass at 639 GB/s;
    # the Pallas kernel runs 326 GB/s (K=4 dot per tile + pipeline
    # overhead). The XLA composition is the production path; the kernel
    # stays as a tested reference (interpret mode only).
    if interpret:
        return _fused(x, out_scale, noise, bias, act, interpret)
    return epilogue_ref(x, out_scale, noise, bias, act)
