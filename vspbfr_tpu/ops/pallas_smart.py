"""Fused Pallas kernel for the SMART layer core (packed layout).

The SMART layer (`models/RestoreNet.py:179-268`) is 4 style-modulated convs
at dilations (1,2,4,8) -> concat -> 3x3 fusion conv. Run as separate XLA
convs it moves the input through HBM five times and each conv is too small
to utilize the TPU (measured 22 ms at 512^2x64 batch 4 on v5e for ~0.15
true TFLOP — scripts/exp_smart_ablate.py).

This kernel keeps one input tile resident in VMEM and evaluates everything
as MXU dots:

  * packed layout (B, Hg, Wg, 4C): even dilations d become phase-diagonal
    taps at offsets {-d/2, 0, d/2} on the half grid; dilation 1 uses the
    dense packed 3x3 kernel (ops/packed.py). Both are (4C -> 4Cb) matrices
    per spatial tap -> 4 branches x 9 taps of (pix, 4C) @ (4C, 4Cb) dots.
  * style modulation is one VPU multiply on the tile; demodulation a
    per-branch output scale.
  * the fusion conv consumes the in-register branch buffer (channel order
    branch-major; the permutation is folded into the fusion kernel) ->
    9 dots of (pix, 16Cb) @ (16Cb, 4Cout).

Backward: jax.custom_vjp whose bwd re-runs the XLA reference composition
under jax.vjp — exact gradients, so trainers get the fused forward too.

STATUS: EXPERIMENTAL, not wired into SMARTLayer. Measured on v5e
(scripts/exp_smart_kernel.py, 512^2 C=64 f32 batch 4): pallas 32.0 ms vs
xla 20.3 ms (0.6x). The kernel runs near MXU peak (~78 TF/s effective) but
the dense phase-diagonal tap matrices execute 4x the FLOPs of the XLA
composition's grouped-conv lowering for the three even-dilation branches
(25% block density), a ~5.6x total-FLOP handicap it cannot amortize — the
op is compute-bound, not HBM-bound (5 passes of the activations are only
~1.6 ms). Kept as a tested reference point; revisit only with a
phase-local (C->Cb) MXU mapping, which needs sub-128-lane slicing.

Modes: "pallas" (TPU), "interpret" (pallas interpreter — used by CPU unit
tests to pin the index math), "reference" (the XLA composition; default on
non-TPU backends so CPU model tests stay fast).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.ops.modulated_conv import demod_coeffs
from vspbfr_tpu.ops.packed import _assemble2, _map_s1, pack_vector

RATES = (1, 2, 4, 8)
_HALO = 5  # max packed tap offset (4) + fusion halo (1)


def _branch_tap_weights(ws, scale: float, dtype):
    """Per-branch packed tap weights (4, 3, 3, 4C, 4Cb).

    ws: 4 unpacked branch kernels (3, 3, C, Cb). Dilation 1 uses the packed
    dense kernel (phase-mixing); even dilations are phase-diagonal
    (block-diag matrices). All branches share the 3x3 tap count — only the
    spatial offsets differ (applied inside the kernel).
    """
    c, cb = ws[0].shape[2], ws[0].shape[3]
    m = _map_s1(3, 1, 1)
    wp1, _, _ = _assemble2(scale * ws[0], m, m, 2, 2)   # (3,3,4C,4Cb)
    out = [wp1]
    for w in ws[1:]:
        wt = jnp.zeros((3, 3, 4 * c, 4 * cb), ws[0].dtype)
        for ph in range(4):
            wt = wt.at[:, :, ph * c:(ph + 1) * c,
                       ph * cb:(ph + 1) * cb].set(scale * w)
        out.append(wt)
    return jnp.stack(out).astype(dtype)


def _fusion_perm_kernel(wf, scale_f: float, cb: int, dtype):
    """Packed fusion kernel with input channels permuted from phase-major
    (ph, br, cb) to the kernel's branch-major buffer order (br, ph, cb)."""
    m = _map_s1(3, 1, 1)
    wp, _, _ = _assemble2(scale_f * wf, m, m, 2, 2)     # (3,3,4*4Cb,4Cout)
    cin = wf.shape[2]                                    # 4*cb
    perm = np.empty(4 * cin, np.int32)
    for br in range(4):
        for ph in range(4):
            for cc in range(cb):
                j_buf = br * 4 * cb + ph * cb + cc
                perm[j_buf] = ph * cin + br * cb + cc
    return jnp.take(wp, jnp.asarray(perm), axis=2).astype(dtype)


def _smart_kernel(x_hbm, wt_ref, dv_ref, wf_ref, o_ref,
                  xs_ref, buf_ref, sem, *, h_t: int, wg: int, c4: int,
                  cbp: int):
    """One (batch, row-tile) grid cell. x_hbm: padded, pre-style-scaled
    input in ANY memory; xs_ref/buf_ref: VMEM scratch; dv_ref: (1, 4, 4Cb)
    demod block for this batch; o_ref: (1, h_t, wg, 4Cout) block."""
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    ih = pl.program_id(1)

    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(ih * h_t, h_t + 2 * _HALO)], xs_ref, sem)
    cp.start()
    cp.wait()

    rows_b = h_t + 2
    offs = (1, 1, 2, 4)
    for br in range(4):
        s = offs[br]
        acc = jnp.zeros((rows_b, wg + 2, cbp), jnp.float32)
        for ty in range(3):
            for tx in range(3):
                dy = (ty - 1) * s
                dx = (tx - 1) * s
                win = xs_ref[4 + dy:4 + dy + rows_b,
                             4 + dx:4 + dx + wg + 2, :]
                acc = acc + lax.dot_general(
                    win, wt_ref[br, ty, tx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc = acc * dv_ref[0, br][None, None, :]
        buf_ref[:, :, br * cbp:(br + 1) * cbp] = acc.astype(buf_ref.dtype)

    # the fusion conv zero-pads the branch OUTPUT tensor at the image
    # border (reference semantics) — zero the halo entries that fall
    # outside the image instead of using branch values computed there
    buf_ref[:, 0, :] = jnp.zeros_like(buf_ref[:, 0, :])
    buf_ref[:, wg + 1, :] = jnp.zeros_like(buf_ref[:, wg + 1, :])

    @pl.when(ih == 0)
    def _():
        buf_ref[0, :, :] = jnp.zeros_like(buf_ref[0, :, :])

    @pl.when(ih == pl.num_programs(1) - 1)
    def _():
        buf_ref[h_t + 1, :, :] = jnp.zeros_like(buf_ref[h_t + 1, :, :])

    out = jnp.zeros((h_t, wg, o_ref.shape[-1]), jnp.float32)
    for ty in range(3):
        for tx in range(3):
            win = lax.slice(buf_ref[...], (ty, tx, 0),
                            (ty + h_t, tx + wg, 4 * cbp))
            out = out + lax.dot_general(
                win, wf_ref[ty, tx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _smart_reference(xp, style, ws, wf, demodulate, eps):
    """XLA reference: the packed composition (bwd pass + numerical oracle)."""
    from vspbfr_tpu.ops.modulated_conv import modulated_conv2d
    from vspbfr_tpu.ops.packed import conv2d_packed

    b, hg, wgr, _ = xp.shape
    cb = ws[0].shape[3]
    outs = [modulated_conv2d(xp, ws[i], style, dilation=r,
                             demodulate=demodulate, eps=eps,
                             packed_in=True, packed_out=True)
            for i, r in enumerate(RATES)]
    st = [o.reshape(b, hg, wgr, 4, cb) for o in outs]
    cat = jnp.concatenate(st, axis=-1).reshape(b, hg, wgr, 4 * 4 * cb)
    scale_f = 1.0 / math.sqrt(wf.shape[2] * 9)
    return conv2d_packed(cat, scale_f * wf)


def _pick_tile(hg: int, wg: int, c4: int, cbp: int, cout4: int,
               itemsize: int) -> int:
    """Choose h_t so scratch + double-buffered out blocks fit in VMEM."""
    budget = 10 * 1024 * 1024
    for h_t in (32, 16, 8, 4, 2, 1):
        if hg % h_t:
            continue
        xs = (h_t + 2 * _HALO) * (wg + 2 * _HALO) * c4 * itemsize
        buf = (h_t + 2) * (wg + 2) * 4 * cbp * itemsize
        out = 2 * h_t * wg * cout4 * itemsize
        if xs + buf + out < budget:
            return h_t
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _smart_fused(xp, style, w1, w2, w3, w4, wf, demodulate, eps,
                 interpret=False):
    return _smart_fused_impl(xp, style, (w1, w2, w3, w4), wf, demodulate,
                             eps, interpret=interpret)


def _smart_fused_impl(xp, style, ws, wf, demodulate, eps, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, hg, wg, c4 = xp.shape
    c = c4 // 4
    cb = ws[0].shape[3]
    cbp = 4 * cb
    cout = wf.shape[3]
    scale = 1.0 / math.sqrt(c * 9)
    scale_f = 1.0 / math.sqrt(wf.shape[2] * 9)

    wt = _branch_tap_weights(list(ws), scale, xp.dtype)   # (4,3,3,4C,4Cb)
    wfp = _fusion_perm_kernel(wf, scale_f, cb, xp.dtype)  # (3,3,16Cb,4Cout)

    styp = pack_vector(style).astype(xp.dtype)            # (B, 4C)
    if demodulate:
        dv = jnp.stack([pack_vector(demod_coeffs(w, style, scale, eps))
                        for w in ws], axis=1)             # (B, 4, 4Cb)
    else:
        dv = jnp.ones((b, 4, cbp))
    dv = dv.astype(jnp.float32)

    # style-modulate outside the kernel (fuses with the pad); W pads to a
    # sublane-aligned width for the manual DMA slice
    w_extra = (-(wg + 2 * _HALO)) % 8
    xs = xp * styp[:, None, None, :]
    xpad = jnp.pad(xs, ((0, 0), (_HALO, _HALO),
                        (_HALO, _HALO + w_extra), (0, 0)))
    h_t = _pick_tile(hg, wg, c4, cbp, 4 * cout, xp.dtype.itemsize)

    kernel = functools.partial(_smart_kernel, h_t=h_t, wg=wg, c4=c4, cbp=cbp)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hg, wg, 4 * cout), xp.dtype),
        grid=(b, hg // h_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # xpad (scaled)
            pl.BlockSpec(memory_space=pltpu.VMEM),         # wt
            pl.BlockSpec((1, 4, cbp), lambda bb, ih: (bb, 0, 0),
                         memory_space=pltpu.VMEM),         # dv (per-batch)
            pl.BlockSpec(memory_space=pltpu.VMEM),         # wf
        ],
        out_specs=pl.BlockSpec((1, h_t, wg, 4 * cout),
                               lambda bb, ih: (bb, ih, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h_t + 2 * _HALO, wg + 2 * _HALO + w_extra, c4),
                       xp.dtype),
            pltpu.VMEM((h_t + 2, wg + 2, 4 * cbp), xp.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xpad, wt, dv, wfp)


def _smart_fused_fwd(xp, style, w1, w2, w3, w4, wf, demodulate, eps,
                     interpret=False):
    out = _smart_fused(xp, style, w1, w2, w3, w4, wf, demodulate, eps,
                       interpret)
    return out, (xp, style, w1, w2, w3, w4, wf)


def _smart_fused_bwd(demodulate, eps, interpret, res, g):
    xp, style, w1, w2, w3, w4, wf = res
    _, vjp = jax.vjp(
        lambda *a: _smart_reference(a[0], a[1], [a[2], a[3], a[4], a[5]],
                                    a[6], demodulate, eps),
        xp, style, w1, w2, w3, w4, wf)
    return vjp(g)


_smart_fused.defvjp(_smart_fused_fwd, _smart_fused_bwd)


def smart_core(xp, style, ws, wf, *, demodulate: bool = True,
               eps: float = 1e-8, mode: str | None = None):
    """Fused SMART core: 4 dilated modulated convs + concat + fusion conv.

    xp: (B, Hg, Wg, 4C) packed input; style: (B, C) affine modulation
    output; ws: 4 branch kernels (3,3,C,Cb); wf: fusion (3,3,4Cb,Cout).
    Returns the packed (B, Hg, Wg, 4Cout) fusion-conv output — the caller
    applies the fusion bias+lrelu, noise injection and final activation.
    """
    if mode is None:
        # the fused kernel measures 0.6x the XLA composition (see module
        # docstring) — the reference composition is the production path
        mode = "reference"
    if mode == "reference":
        return _smart_reference(xp, style, list(ws), wf, demodulate, eps)
    return _smart_fused(xp, style, ws[0], ws[1], ws[2], ws[3], wf,
                        demodulate, eps, mode == "interpret")
