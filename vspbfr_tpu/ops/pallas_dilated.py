"""Pallas multi-dilation conv: SMART's parallel branches in one kernel.

The SMART layer runs 4 parallel 3x3 modulated convs at dilations
[1, 2, 4, 8], each emitting only Co = C/4 channels
(`models/RestoreNet.py:196-209`) — so XLA lowers every branch as an
N=16..32-lane matmul at ~6-16% MXU utilisation
(scripts/exp_smart_ablate.py, exp_semipacked2.py): the last lane-starved
ops in the restore path (2.4 ms per branch at the 512-res packed shapes
where the dense 3x3s run 60+ TF/s).

This kernel computes ANY set of same-input 3x3 dilated convs in one pass
over a shared VMEM input stripe with a taps-in-N formulation:

  * for each distinct kernel-row offset r (rows of different dilations
    interleave; the centre row is shared by all), ONE dot
    (h_t, wpi, Ci) @ (Ci, n_r) whose columns are every (branch, tx
    [, group]) tap that reads input row r — no zero-block or
    densification waste in K;
  * the conv's x-reduction becomes shifted lane-slice adds of the partial
    into the accumulator (VPU work, ~px * taps adds — negligible);
  * the branch outputs concatenate along N, so stores are
    (groups * sum(Co))-lane wide — 128 lanes at the model shapes instead
    of each branch's 16-64.

Grouped (packed-layout phase-diagonal) convs fold into the same kernel
entirely at weight-assembly time: group g contributes the block
W[g*Cig:(g+1)*Cig, cols_g] per tap, and since the N columns are real taps
(not padding) the block-diagonal costs nothing extra. Note the packed
layout admits only EVEN unpacked dilations here (odd dilations mix
phases — those go through the assembled dense conv, `ops/packed.py`).

Exactness: identical math to the `lax.conv_general_dilated` calls it
replaces (f32 accumulation); gradients via jax.custom_vjp whose bwd is the
XLA vjp of the reference composition (R1-safe, same scheme as
ops/pallas_conv.py). `VSPBFR_PALLAS=0` or non-TPU backends take the XLA
fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# static plan: row offsets, column layout, shift spec
# ---------------------------------------------------------------------------

def _multi_plan(dils, cos, groups: int):
    """Static schedule for parallel 3x3 convs at dilations `dils` emitting
    `cos` channels each (per group).

    Returns (pad, rows) where rows = [(r, n_cols, entries)] and each entry
    (bi, ty, tx, col, out_base, x_off, width) means: the partial columns
    [col, col+width) of the row-r dot accumulate into output lanes
    [out_base, out_base+width) at x offset x_off.
    """
    assert len(dils) == len(cos) and all(d > 0 for d in dils)
    pad = max(dils)
    out_bases = []
    base = 0
    for co in cos:
        out_bases.append(base)
        base += co * groups
    rows: dict[int, list] = {}
    for bi, d in enumerate(dils):
        for ty in range(3):
            rows.setdefault((pad - d) + ty * d, []).append((bi, ty))
    plan = []
    for r in sorted(rows):
        entries = []
        col = 0
        for bi, ty in rows[r]:
            d, co = dils[bi], cos[bi]
            for tx in range(3):
                entries.append((bi, ty, tx, col, out_bases[bi],
                                (pad - d) + tx * d, co * groups))
                col += co * groups
        plan.append((r, col, entries))
    return pad, plan


def _assemble_row_weights(ws, plan, groups, dtype):
    """One (Ci_total, n_r) matrix per distinct row offset; grouped convs
    become block-diagonal tap columns (shared per-group weights, matching
    `ops/packed.py conv2d_packed`'s phase-major grouped layout)."""
    cig = ws[0].shape[2]
    ci = cig * groups
    mats = []
    for _, n_cols, entries in plan:
        m = jnp.zeros((ci, n_cols), dtype)
        for bi, ty, tx, col, _, _, width in entries:
            w = ws[bi]
            co = width // groups
            for g in range(groups):
                m = m.at[g * cig:(g + 1) * cig,
                         col + g * co:col + (g + 1) * co].set(w[ty, tx])
        mats.append(m)
    return mats


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _pick_ht(oh, kpad2, wpi, ci, ow, co_total, ncols_max, itemsize) -> int:
    budget = 9 * 1024 * 1024
    for cand in (32, 16, 8, 4, 2, 1):
        if oh % cand:
            continue
        need = ((cand + kpad2) * wpi * ci * itemsize   # stripe
                + cand * wpi * ncols_max * 4           # largest partial
                + cand * ow * co_total * (4 + itemsize))  # acc + out block
        if need < budget:
            return cand
    return 1


def _multi_kernel(*refs, h_t, kpad2, ow, co_total, plan, has_isc, has_osc,
                  pads, xoff=0):
    import jax.lax as lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = len(plan)
    x_hbm = refs[0]
    w_refs = refs[1:1 + n_rows]
    isc_ref = refs[1 + n_rows]
    osc_ref = refs[2 + n_rows] if has_osc else None
    o_ref = refs[2 + n_rows + int(has_osc)]
    xs_ref = refs[3 + n_rows + int(has_osc)]
    sem = refs[4 + n_rows + int(has_osc)]

    bb = pl.program_id(0)
    ih = pl.program_id(1)
    from vspbfr_tpu.ops.pallas_conv import _stripe_load
    _stripe_load(x_hbm, xs_ref, sem, bb, ih, h_t=h_t, stripe=h_t + kpad2,
                 pads=pads)
    if has_isc:
        xs_ref[...] = xs_ref[...] * isc_ref[0][None]
    parts = []
    for i, (r, _, _) in enumerate(plan):
        parts.append(lax.dot_general(
            xs_ref[r:r + h_t], w_refs[i][...],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    # every plan entry spans its branch's ENTIRE output segment (width =
    # co*groups by construction in _multi_plan), so the accumulation is a
    # per-branch sum of 9 shifted partial slices stored at the branch's
    # static lane offset — no scatter (unsupported by the Mosaic TC
    # lowering) and no cross-offset lane concat (Mosaic layout limitation).
    segs: dict[int, object] = {}
    widths: dict[int, int] = {}
    for i, (_, _, entries) in enumerate(plan):
        for _, _, _, col, out_base, x_off, width in entries:
            term = parts[i][:, xoff + x_off:xoff + x_off + ow,
                            col:col + width]
            segs[out_base] = term if out_base not in segs \
                else segs[out_base] + term
            widths[out_base] = width
    # NOTE on store width: concatenating the segments into one full-width
    # store fails to lower ("result/input offset mismatch on non-concat
    # dimension" — the segs carry distinct lane offsets from their partial
    # slices), so stores stay per-branch. Measured, this is NOT the
    # bottleneck anyway: the grouped d4|d8 kernel runs ~137 TF/s on issued
    # FLOPs — its real waste is the 4x block-diagonal densification.
    for out_base, seg in segs.items():
        if has_osc:
            # per-(batch, out-channel) demod scale folded into the store
            # (saves the consumer's full out*demod HBM pass)
            seg = seg * osc_ref[
                0, :, out_base:out_base + widths[out_base]].astype(
                jnp.float32)
        o_ref[0, :, :, out_base:out_base + widths[out_base]] = (
            seg.astype(o_ref.dtype))


def _multi_pallas(x, ws, in_scale, out_scale, dils, groups,
                  interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wd, ci = x.shape
    cos = tuple(w.shape[3] for w in ws)
    co_total = sum(cos) * groups
    pad, plan = _multi_plan(dils, cos, groups)
    mats = _assemble_row_weights(ws, plan, groups, x.dtype)

    itemsize = x.dtype.itemsize
    sub_min = 32 // itemsize
    kpad2 = 2 * pad
    # in-kernel halo padding (see pallas_conv._stripe_load) unless the
    # dilation pad exceeds the row tile; DMA dst column rounds up to the
    # sublane tile, reads shift right by xoff
    xoff = (-pad) % sub_min
    dst_col = pad + xoff
    if wd % sub_min == 0:
        need = dst_col + wd + pad
        wpi = need + ((-need) % sub_min)
    else:
        wpi = wd + kpad2 + ((-(wd + kpad2)) % sub_min)
    ncols_max = max(n for _, n, _ in plan)
    h_t = _pick_ht(h, kpad2, wpi, ci, wd, co_total, ncols_max, itemsize)
    if pad <= h_t and wd % sub_min == 0:
        pads_k = (pad, pad, dst_col, wd, h // h_t)
        xin = x
    else:
        pads_k, xoff = None, 0
        wpi = wd + kpad2 + ((-(wd + kpad2)) % sub_min)
        xin = jnp.pad(x, ((0, 0), (pad, pad),
                          (pad, wpi - wd - pad), (0, 0)))

    has_isc = in_scale is not None
    has_osc = out_scale is not None
    isc = (in_scale if has_isc else jnp.ones((b, 1))).astype(x.dtype)
    isc = isc[:, None, :]
    osc_in, osc_specs = [], []
    if has_osc:
        osc_in = [out_scale.astype(x.dtype)[:, None, :]]
        osc_specs = [pl.BlockSpec((1, 1, co_total),
                                  lambda bb, ih: (bb, 0, 0))]
    return pl.pallas_call(
        functools.partial(_multi_kernel, h_t=h_t, kpad2=kpad2, ow=wd,
                          co_total=co_total, plan=plan, has_isc=has_isc,
                          has_osc=has_osc, pads=pads_k, xoff=xoff),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co_total), x.dtype),
        grid=(b, h // h_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(mats)
        + [pl.BlockSpec((1, 1, isc.shape[-1]), lambda bb, ih: (bb, 0, 0))]
        + osc_specs,
        out_specs=pl.BlockSpec((1, h_t, wd, co_total),
                               lambda bb, ih: (bb, ih, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h_t + kpad2, wpi, ci), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xin, *mats, isc, *osc_in)


# ---------------------------------------------------------------------------
# reference composition + vjp + dispatcher
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _multi_ref(x, ws, in_scale, out_scale, dils, groups):
    """The grouped/dense dilated convs this kernel replaces — shared
    per-group weights tiled along Co (`ops/packed.py conv2d_packed`)."""
    xs = x if in_scale is None else x * in_scale[:, None, None, :]

    def one(w, d):
        wg = jnp.concatenate([w] * groups, axis=-1) if groups > 1 else w
        # xs.dtype, not x.dtype: a mixed-precision caller (bf16 x, f32
        # modulation scale) promotes xs to f32, and conv requires equal
        # operand dtypes
        return jax.lax.conv_general_dilated(
            xs, wg.astype(xs.dtype), (1, 1), ((d, d), (d, d)),
            rhs_dilation=(d, d), dimension_numbers=_DN,
            feature_group_count=groups)

    out = jnp.concatenate([one(w, d) for w, d in zip(ws, dils)], axis=-1)
    if out_scale is not None:
        out = out * out_scale[:, None, None, :].astype(out.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _multi_vjp(x, ws, in_scale, out_scale, dils, groups, interpret=False):
    return _multi_pallas(x, ws, in_scale, out_scale, dils, groups,
                         interpret)


def _multi_fwd(x, ws, in_scale, out_scale, dils, groups, interpret=False):
    return (_multi_vjp(x, ws, in_scale, out_scale, dils, groups, interpret),
            (x, ws, in_scale, out_scale))


def _multi_bwd(dils, groups, interpret, res, g):
    x, ws, in_scale, out_scale = res
    diff = [x, ws] + ([in_scale] if in_scale is not None else []) \
        + ([out_scale] if out_scale is not None else [])

    def ref(*args):
        it = iter(args)
        return _multi_ref(next(it), next(it),
                          next(it) if in_scale is not None else None,
                          next(it) if out_scale is not None else None,
                          dils, groups)

    _, vjp = jax.vjp(ref, *diff)
    grads = list(vjp(g))
    dx, dws = grads.pop(0), grads.pop(0)
    disc = grads.pop(0) if in_scale is not None else None
    dosc = grads.pop(0) if out_scale is not None else None
    return dx, dws, disc, dosc


_multi_vjp.defvjp(_multi_fwd, _multi_bwd)


def dilated_multi_conv(x: jnp.ndarray, ws, dils, groups: int = 1,
                       in_scale: jnp.ndarray | None = None,
                       out_scale: jnp.ndarray | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """Parallel 3x3 'same' dilated convs over the SAME input, outputs
    channel-concatenated: concat_i(conv(x, ws[i], dils[i])).

    x: (B, H, W, Ci); ws[i]: (3, 3, Ci//groups, Co_i) per-group kernels
    SHARED across groups (grouped output is phase-major (g, c), matching
    `ops/packed.py` even-dilation lowering). in_scale: optional (B, Ci)
    per-sample input scale (the modulated-conv style multiply).
    out_scale: optional (B, sum(Co_i)*groups) per-sample output scale
    (the demod coefficients) folded into the stores.

    Dispatches to the Pallas multi-dilation kernel when profitable
    (TPU, 128-aligned Ci, enough pixels), else XLA.
    """
    from vspbfr_tpu.ops.pallas_conv import _pallas_enabled, fused_epi_enabled

    ws = tuple(ws)
    dils = tuple(int(d) for d in dils)
    b, h, wd, ci = x.shape
    ok = (interpret
          or (_pallas_enabled() and jax.default_backend() == "tpu"
              and ci % 128 == 0 and b * h * wd >= 32768
              and h % 2 == 0))
    if not ok:
        return _multi_ref(x, ws, in_scale, out_scale, dils, groups)
    if out_scale is not None and not (interpret or fused_epi_enabled()):
        # two-pass default: demod multiply as a separate XLA pass (see
        # pallas_conv.fused_epi_enabled for the measured rejection)
        out = _multi_vjp(x, ws, in_scale, None, dils, groups, interpret)
        return out * out_scale[:, None, None, :].astype(out.dtype)
    return _multi_vjp(x, ws, in_scale, out_scale, dils, groups, interpret)


def dilated_pair_conv(x: jnp.ndarray, wa: jnp.ndarray, wb: jnp.ndarray,
                      dil_a: int, dil_b: int, groups: int = 1,
                      in_scale: jnp.ndarray | None = None,
                      out_scale: jnp.ndarray | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Two-conv convenience wrapper over `dilated_multi_conv`."""
    return dilated_multi_conv(x, (wa, wb), (dil_a, dil_b), groups,
                              in_scale=in_scale, out_scale=out_scale,
                              interpret=interpret)


def _pair_ref(x, wa, wb, in_scale, dil_a, dil_b, groups):
    return _multi_ref(x, (wa, wb), in_scale, None, (dil_a, dil_b), groups)
