"""ADA controller trajectory validation (VERDICT r4 #7).

Drives the REAL controller (`losses/ada.py::ada_update`, the port of
`non_leaking.py:481-517`) through hundreds of steps of an actual
overfitting discriminator — not synthetic real_pred streams — and records
the (p, rt) trajectory:

  * tiny product Discriminator at 32px over 8 fixed real images;
  * fakes = the same images + noise, so at p=0 D separates them only by
    memorizing pixels -> real_pred goes positive -> rt -> 1 -> p rises;
  * rising augmentation destroys the memorization signal -> rt falls back
    toward the 0.6 target and p stabilizes.

ada_length is shortened so the control loop reaches equilibrium within the
run (the reference exposes the same knob as --ada_length;
`restoration_train.py:330-333`). Asserts: p rises from 0, and the late-run
rt mean is near the target.

Usage (CPU is fine):
  PYTHONPATH=/root/repo python scripts/exp_ada_traj.py [--steps 800]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp


def run(steps: int, size: int = 32, batch: int = 8,
        ada_length: int = 4000, update_every: int = 16,
        target: float = 0.6, seed: int = 0, log=print):
    import optax

    from vspbfr_tpu.losses import d_logistic_loss
    from vspbfr_tpu.losses.ada import ADAState, ada_update, augment
    from vspbfr_tpu.models.restorenet import Discriminator

    disc = Discriminator(size=size, channel_div=4)
    rng = np.random.default_rng(seed)
    reals = jnp.asarray(rng.uniform(-1, 1, (8, size, size, 3)),
                        jnp.float32)
    d_params = disc.init(jax.random.key(seed),
                         jnp.zeros((1, size, size, 3)))["params"]
    tx = optax.adam(2e-3, b1=0.0, b2=0.99)
    opt_state = tx.init(d_params)
    ada = ADAState.create()

    @jax.jit
    def step(d_params, opt_state, ada, key):
        k_real, k_fake, k_aug_r, k_aug_f = jax.random.split(key, 4)
        idx = jax.random.randint(k_real, (batch,), 0, reals.shape[0])
        real = reals[idx]
        # fakes: same memorizable images + noise — separable only by
        # pixel memorization, which augmentation destroys
        fake = real + 0.35 * jax.random.normal(k_fake, real.shape)
        real_a = augment(k_aug_r, real, ada.p)
        fake_a = augment(k_aug_f, fake, ada.p)

        def loss_fn(p):
            rp = disc.apply({"params": p}, real_a)
            fp = disc.apply({"params": p}, fake_a)
            return d_logistic_loss(rp, fp), rp

        (loss, real_pred), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(d_params)
        updates, opt_state = tx.update(grads, opt_state)
        d_params = optax.apply_updates(d_params, updates)
        ada = ada_update(ada, real_pred, target=target,
                         ada_length=ada_length, update_every=update_every)
        rt = jnp.mean(jnp.sign(real_pred))
        return d_params, opt_state, ada, loss, rt

    traj = []
    for i in range(steps):
        d_params, opt_state, ada, loss, rt = step(
            d_params, opt_state, ada, jax.random.key(100 + i))
        traj.append((float(ada.p), float(rt), float(loss)))
        if i % 100 == 0:
            log(f"[{i:4d}] p={traj[-1][0]:.3f} rt={traj[-1][1]:+.2f} "
                f"d={traj[-1][2]:.3f}")
    return traj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    traj = run(args.steps)
    p = [t[0] for t in traj]
    rt = [t[1] for t in traj]
    late_rt = float(np.mean(rt[-len(rt) // 4:]))
    early_rt = float(np.mean(rt[: len(rt) // 8]))
    summary = {
        "steps": args.steps,
        "p_final": p[-1], "p_max": max(p),
        "rt_early_mean": round(early_rt, 3),
        "rt_late_mean": round(late_rt, 3),
        "p_curve_every50": [round(v, 4) for v in p[::50]],
        "rt_curve_every50": [round(v, 3) for v in rt[::50]],
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "traj": traj}, f)


if __name__ == "__main__":
    main()
