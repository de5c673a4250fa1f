"""Pallas dense stride-1 convolution for lane-aligned channel widths.

XLA's TPU conv lowering leaves large factors on the table at the packed
StyleGAN2 shapes — measured on v5e f32 (scripts/exp_pallas_conv.py):

    (4,512,512,128) x (3,3,128,128):  xla 32.5 TF/s   pallas 58.7  (1.81x)
    (4,256,256,256) x (3,3,256,256):  xla 54.4 TF/s   pallas 88.2  (1.62x)
    (4,256,256,256) x (2,2,256,512):  xla 34.2 TF/s   pallas 67.3  (1.97x)

The kernel keeps a (h_t + kh - 1)-row input stripe resident in VMEM (manual
DMA with halo — BlockSpecs cannot overlap) and accumulates kh*kw per-tap
MXU dots (pix, Ci) @ (Ci, Co) in f32. Numerics: exact f32 (tighter than
XLA's default bf16-internal conv precision).

`conv2d_dense` is the gated dispatcher: Pallas when on TPU with
Ci, Co multiples of 128 and enough pixels; otherwise the identical
`lax.conv_general_dilated`. Backward is a jax.custom_vjp whose bwd
re-derives the exact gradients through the XLA conv (same math), so R1
double-differentiation works unchanged.

Replaces (at the performance level) the reference's reliance on cuDNN for
its conv throughput (`op/conv2d_gradfix.py:134-223`).
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


def _lax_conv(x, w, pads):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _use_pallas(x, w) -> bool:
    if not _pallas_enabled() or jax.default_backend() != "tpu":
        return False
    b, h, wd, ci = x.shape
    co = w.shape[3]
    if ci % 128 or co % 128:
        return False
    return b * h * wd >= 32768  # dispatch overhead dominates below


def _pick_ht(oh, kh, wpi, ci, ow, co, itemsize) -> int:
    budget = 9 * 1024 * 1024
    for cand in (32, 16, 8, 4, 2, 1):
        if oh % cand:
            continue
        need = ((cand + kh - 1) * wpi * ci + 2 * cand * ow * co) * itemsize
        if need < budget:
            return cand
    return 1


def _stripe_load(x_hbm, xs_ref, sem, bb, ih, *, h_t, stripe, pads):
    """DMA the tile's input stripe into VMEM scratch.

    pads=None: x is already padded in HBM — straight copy (legacy path).
    pads=(py0, py1, dst_col, wd, n_tiles): x is UNPADDED; zero the halo in
    VMEM (column strips every tile, top/bottom rows on the edge tiles)
    and DMA only the valid window — saves the producer-side jnp.pad's
    full-tensor HBM round trip (measured 0.4-0.9 ms per 512-res call,
    `pad` ops at 609 GiB/s in the XProf trace). dst_col is the scratch
    column where x's column 0 lands: Mosaic requires DMA destination
    offsets divisible by the sublane tiling, so the caller rounds the
    left pad UP to the tile and shifts its reads by the same amount."""
    import jax.lax as lax  # noqa: F401
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if pads is None:
        cp = pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ih * h_t, stripe)], xs_ref, sem)
        cp.start()
        cp.wait()
        return

    py0, py1, dst_col, wd, n_tiles = pads
    wpi = xs_ref.shape[1]
    if dst_col:
        xs_ref[:, :dst_col, :] = jnp.zeros((stripe, dst_col,
                                            xs_ref.shape[2]), xs_ref.dtype)
    if wpi > dst_col + wd:
        xs_ref[:, dst_col + wd:, :] = jnp.zeros(
            (stripe, wpi - dst_col - wd, xs_ref.shape[2]), xs_ref.dtype)

    def copy(src_row, dst_row, rows):
        cp = pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(src_row, rows)],
            xs_ref.at[pl.ds(dst_row, rows), pl.ds(dst_col, wd)], sem)
        cp.start()
        cp.wait()

    if n_tiles == 1:
        if py0:
            xs_ref[:py0, :, :] = jnp.zeros((py0, wpi, xs_ref.shape[2]),
                                           xs_ref.dtype)
        if py1:
            xs_ref[stripe - py1:, :, :] = jnp.zeros(
                (py1, wpi, xs_ref.shape[2]), xs_ref.dtype)
        copy(0, py0, stripe - py0 - py1)
        return

    @pl.when(ih == 0)
    def _first():
        if py0:
            xs_ref[:py0, :, :] = jnp.zeros((py0, wpi, xs_ref.shape[2]),
                                           xs_ref.dtype)
        copy(0, py0, stripe - py0)

    @pl.when(ih == n_tiles - 1)
    def _last():
        if py1:
            xs_ref[stripe - py1:, :, :] = jnp.zeros(
                (py1, wpi, xs_ref.shape[2]), xs_ref.dtype)
        copy((n_tiles - 1) * h_t - py0, 0, stripe - py1)

    @pl.when(jnp.logical_and(ih > 0, ih < n_tiles - 1))
    def _mid():
        copy(ih * h_t - py0, 0, stripe)


def _conv_kernel(x_hbm, w_ref, isc_ref, o_ref, xs_ref, sem, *, h_t, kh, kw,
                 ow, co, has_isc, pads, xoff=0):
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    bb = pl.program_id(0)
    ih = pl.program_id(1)
    _stripe_load(x_hbm, xs_ref, sem, bb, ih, h_t=h_t, stripe=h_t + kh - 1,
                 pads=pads)
    if has_isc:
        # fold the per-(batch, in-channel) style scale into the resident
        # stripe once (saves the producer's full x*style HBM pass). The
        # batch row arrives via BlockSpec (static per grid cell) — a
        # dynamic isc_ref[bb] row load is unprovably aligned for bf16.
        xs_ref[...] = xs_ref[...] * isc_ref[0][None]
    acc = jnp.zeros((h_t, ow, co), jnp.float32)
    for ty in range(kh):
        for tx in range(kw):
            win = xs_ref[ty:ty + h_t, xoff + tx:xoff + tx + ow, :]
            acc = acc + lax.dot_general(
                win, w_ref[ty, tx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _conv_pallas(x, w, pads, in_scale=None, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wd, ci = x.shape
    kh, kw, _, co = w.shape
    (py0, py1), (px0, px1) = pads
    oh = h + py0 + py1 - kh + 1
    ow = wd + px0 + px1 - kw + 1
    itemsize = x.dtype.itemsize
    sub_min = 32 // itemsize            # sublane tile: 8 f32 / 16 bf16
    # in-kernel halo padding when every tile's valid window stays in
    # bounds (h_t >= pad on both edges) and the DMA destination window is
    # sublane-tileable; else pre-pad in HBM (legacy). The valid window
    # lands at dst_col = px0 rounded up to the sublane tile (Mosaic DMA
    # offset constraint); reads shift right by the same xoff.
    xoff = (-px0) % sub_min
    dst_col = px0 + xoff
    if wd % sub_min == 0:
        need = dst_col + wd + px1
        wpi = need + ((-need) % sub_min)
    else:
        wpi = wd + px0 + px1 + ((-(wd + px0 + px1)) % sub_min)
    h_t = _pick_ht(oh, kh, wpi, ci, ow, co, itemsize)
    if py0 <= h_t and py1 <= h_t and wd % sub_min == 0:
        pads_k = (py0, py1, dst_col, wd, oh // h_t)
        xin = x
    else:
        pads_k, xoff = None, 0
        wpi = wd + px0 + px1 + ((-(wd + px0 + px1)) % sub_min)
        xin = jnp.pad(x, ((0, 0), (py0, py1),
                          (px0, wpi - wd - px0, ), (0, 0)))

    has_isc = in_scale is not None
    isc = (in_scale if has_isc else jnp.ones((b, 1))).astype(x.dtype)
    isc = isc[:, None, :]  # (b, 1, c) — blocked per-batch below
    return pl.pallas_call(
        functools.partial(_conv_kernel, h_t=h_t, kh=kh, kw=kw, ow=ow, co=co,
                          has_isc=has_isc, pads=pads_k, xoff=xoff),
        out_shape=jax.ShapeDtypeStruct((b, oh, ow, co), x.dtype),
        grid=(b, oh // h_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, isc.shape[-1]),
                               lambda bb, ih: (bb, 0, 0))],
        out_specs=pl.BlockSpec((1, h_t, ow, co),
                               lambda bb, ih: (bb, ih, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h_t + kh - 1, wpi, ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xin, w.astype(x.dtype), isc)


def _scaled_ref(x, w, in_scale, pads):
    xs = x if in_scale is None else x * in_scale[:, None, None, :]
    return _lax_conv(xs, w, pads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv_vjp(x, w, in_scale, pads, interpret=False):
    return _conv_pallas(x, w, pads, in_scale, interpret)


def _conv_fwd(x, w, in_scale, pads, interpret=False):
    return _conv_vjp(x, w, in_scale, pads, interpret), (x, w, in_scale)


def _conv_bwd(pads, interpret, res, g):
    x, w, in_scale = res
    # dxs is itself a stride-1 dense conv (spatially flipped, in/out-
    # transposed kernel) -> reuse the Pallas fast path; dw/discale via
    # XLA's vjp of the reference composition
    kh, kw = w.shape[0], w.shape[1]
    (py0, py1), (px0, px1) = pads
    wt = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2))
    dxs = conv2d_dense(g, wt, ((kh - 1 - py0, kh - 1 - py1),
                               (kw - 1 - px0, kw - 1 - px1)),
                       interpret=interpret)
    if in_scale is None:
        dx, discale = dxs, None
    else:
        dx = dxs * in_scale[:, None, None, :]
        discale = jnp.sum(dxs * x, axis=(1, 2))
    _, vjp_w = jax.vjp(lambda w_: _scaled_ref(x, w_, in_scale, pads), w)
    (dw,) = vjp_w(g)
    return dx, dw, discale


_conv_vjp.defvjp(_conv_fwd, _conv_bwd)


def conv2d_dense(x: jnp.ndarray, w: jnp.ndarray, pads,
                 in_scale: jnp.ndarray | None = None,
                 interpret: bool = False) -> jnp.ndarray:
    """Stride-1, dilation-1 'valid+explicit pads' conv, NHWC x HWIO.

    pads: ((py0, py1), (px0, px1)). in_scale: optional (B, Ci) per-sample
    input-channel scale (the modulated-conv style multiply) folded into the
    kernel's resident stripe. Dispatches to the Pallas kernel when
    profitable (TPU, 128-aligned channels, enough pixels), else XLA.
    """
    pads = tuple((int(a), int(b)) for a, b in pads)
    if interpret or _use_pallas(x, w):
        return _conv_vjp(x, w, in_scale, pads, interpret)
    return _scaled_ref(x, w, in_scale, pads)
