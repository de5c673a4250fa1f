"""ADA augmentation tests: warp-chain parity vs the reference torch
implementation (with fixed matrices) and controller behavior."""

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, ".")
from tests.torch_oracle import install_op_stub, add_reference_path  # noqa: E402

from vspbfr_tpu.losses.ada import (  # noqa: E402
    ADAState,
    ada_update,
    apply_affine,
    apply_color,
    augment,
    grid_sample_bilinear,
    sample_affine,
    sample_color,
)


pytestmark = [pytest.mark.parity]

@pytest.fixture(scope="module")
def ref_ada():
    install_op_stub()
    add_reference_path()
    import importlib
    return importlib.import_module("non_leaking")


def test_grid_sample_matches_torch(rng):
    x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    g = (rng.uniform(-1.2, 1.2, (2, 7, 8, 2))).astype(np.float32)
    out = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(g)))
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(g),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_apply_affine_parity_small_transform(ref_ada, rng):
    """Fixed small G: torch random_apply_affine(G=inv(G_fwd)) vs ours."""
    b, h, w = 2, 32, 32
    img = rng.standard_normal((b, 3, h, w)).astype(np.float32) * 0.3
    theta = 0.2
    G_fwd = np.tile(np.array(
        [[math.cos(theta), -math.sin(theta), 1.5],
         [math.sin(theta), math.cos(theta), -2.0],
         [0, 0, 1]], np.float32), (b, 1, 1))

    with torch.no_grad():
        out_t, _ = ref_ada.random_apply_affine(
            torch.from_numpy(img), 0.0,
            torch.from_numpy(np.linalg.inv(G_fwd)))
    out_j = apply_affine(jnp.asarray(img.transpose(0, 2, 3, 1)),
                         jnp.asarray(G_fwd))
    ref = out_t.numpy().transpose(0, 2, 3, 1)
    assert out_j.shape == ref.shape
    # interiors match; static-vs-dynamic padding differs at the border
    c = 6
    np.testing.assert_allclose(np.asarray(out_j)[:, c:-c, c:-c],
                               ref[:, c:-c, c:-c], rtol=2e-3, atol=2e-3)


def test_apply_color_parity(ref_ada, rng):
    img = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    C = np.asarray(sample_color(jax.random.key(0), 1.0, 2))
    with torch.no_grad():
        out_t, _ = ref_ada.random_apply_color(
            torch.from_numpy(img), 0.0, torch.from_numpy(C))
    out_j = apply_color(jnp.asarray(img.transpose(0, 2, 3, 1)),
                        jnp.asarray(C))
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_augment_p0_near_identity(rng):
    """At p=0 the affine/color are identity; the FIR chain should
    reconstruct the image closely (SYM6 is near-perfect-reconstruction)."""
    img = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3)).astype(np.float32) * 0.2)
    out = augment(jax.random.key(0), img, 0.0)
    assert out.shape == img.shape
    err = jnp.mean(jnp.abs(out - img))
    assert float(err) < 0.02


def test_augment_jits_with_traced_p(rng):
    img = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))

    @jax.jit
    def f(key, img, p):
        return augment(key, img, p)

    o1 = f(jax.random.key(0), img, jnp.asarray(0.3))
    o2 = f(jax.random.key(0), img, jnp.asarray(0.8))  # no recompile needed
    assert o1.shape == img.shape and o2.shape == img.shape


def test_ada_controller():
    st = ADAState.create()
    preds = jnp.ones((8,))  # D confident on real -> p should rise
    for _ in range(256):
        st = ada_update(st, preds, update_every=256)
    assert float(st.p) > 0
    # and falls back down with negative preds
    p_hi = float(st.p)
    for _ in range(256):
        st = ada_update(st, -preds, update_every=256)
    assert float(st.p) < p_hi


def test_static_pad_deviation_envelope(ref_ada, rng):
    """Measured bound on the documented static-vs-dynamic-pad deviation.

    The reference pads per-batch from the sampled matrix
    (`non_leaking.py:770-806`); we pad statically (losses/ada.py module
    docstring). Over transforms sampled at the ADA operating point p=0.6,
    the outputs must agree except on a small fraction of border pixels.
    """
    b, h, w = 8, 64, 64
    img = rng.standard_normal((b, 3, h, w)).astype(np.float32) * 0.3
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))

    from vspbfr_tpu.losses.ada import apply_affine as our_apply

    fracs, interior_errs = [], []
    for trial in range(6):
        G = np.asarray(sample_affine(jax.random.key(trial), 0.6, b, h, w))
        out_j = np.asarray(our_apply(img_j, jnp.asarray(G)))
        with torch.no_grad():
            out_t, _ = ref_ada.random_apply_affine(
                torch.from_numpy(img), 0.0,
                torch.from_numpy(np.linalg.inv(G).astype(np.float32)))
        ref = out_t.numpy().transpose(0, 2, 3, 1)
        scale = np.abs(ref).max() + 1e-8
        diff = np.abs(out_j - ref) / scale
        # fraction of meaningfully-deviating pixels (per sample)
        fracs.append(np.mean(diff > 1e-2, axis=(1, 2, 3)))
        c = 8  # interior: away from the static-pad boundary
        interior_errs.append(diff[:, c:-c, c:-c].reshape(b, -1).max(axis=1))

    fracs = np.concatenate(fracs)
    interior_errs = np.concatenate(interior_errs)
    # envelope: on average <2% of pixels deviate; no sample exceeds 15%
    # (extreme scale/translate draws clip at the static border)
    assert fracs.mean() < 0.02, fracs.mean()
    assert fracs.max() < 0.15, fracs.max()
    # interiors match to fp tolerance for >=90% of samples; only rare
    # extreme zoom-outs (content pulled in from beyond the static pad)
    # deviate inside, and even those stay bounded
    assert np.quantile(interior_errs, 0.9) < 1e-3, interior_errs
    assert (interior_errs > 0.02).mean() <= 0.05, interior_errs
    assert interior_errs.max() < 0.5, interior_errs.max()


@pytest.mark.slow
def test_ada_controller_trajectory():
    """End-to-end controller dynamics under a REAL overfitting D
    (`non_leaking.py:481-517` semantics; VERDICT r4 #7): p must rise from
    0 while D separates real from fake by memorization, and once rising
    augmentation destroys that signal the accumulated rt must settle near
    the 0.6 target. Deterministic (fixed seeds); the recorded 800-step
    trajectory lives in ADA_TRAJ_r5.json (p 0 -> ~0.19, late rt 0.598).
    Shorter here to keep the slow lane tractable; margins are generous."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    import exp_ada_traj

    traj = exp_ada_traj.run(steps=800, log=lambda *_: None)
    p = [t[0] for t in traj]
    rt = [t[1] for t in traj]
    assert p[0] == 0.0
    assert max(p) >= 0.1, max(p)                       # p rose from 0
    assert p[-1] > 0.05, p[-1]                         # and stays engaged
    # equilibrium: accumulated rt near the 0.6 target over the last
    # quarter (measured 0.598 default-precision / 0.5975 highest —
    # per-STEP sign means fluctuate hard, so only the windowed mean is a
    # stable property; an early-window assertion was precision-fragile)
    late = float(np.mean(rt[-200:]))
    assert 0.3 < late < 0.85, late


def test_upfir_mm_matches_conv(rng):
    """The banded-matmul FIR form (MXU-shaped) must equal the depthwise conv
    form exactly for both axes and both up/down configs (`non_leaking.py:877-905`
    resampling semantics)."""
    from vspbfr_tpu.losses import ada
    x = jnp.asarray(rng.standard_normal((2, 37, 41, 3)), jnp.float32)
    k = ada.SYM6
    for fn_c, fn_m in ((ada._upfir_x, ada._upfir_x_mm),
                       (ada._upfir_y, ada._upfir_y_mm)):
        for up, down, pad in ((2, 1, (6, 5)), (1, 2, (1, 4)), (1, 1, (3, 3))):
            a = fn_c(x, k, up, down, pad)
            b = fn_m(x, k, up, down, pad)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


def test_inv3_matches_linalg(rng):
    """Closed-form adjugate inverse vs LU for the sampled transform family."""
    from vspbfr_tpu.losses import ada
    key = jax.random.PRNGKey(3)
    G = ada.sample_affine(key, jnp.float32(0.7), 16, 128, 128)
    np.testing.assert_allclose(np.asarray(ada._inv3(G)),
                               np.asarray(jnp.linalg.inv(G)),
                               rtol=1e-4, atol=1e-4)
