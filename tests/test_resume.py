"""Full-fidelity checkpoint/resume (VERDICT r1 next-round item 4).

The reference persists params + BOTH optimizer states + ada_p and restores
them on resume (`restoration_train.py:291-305`, `:411-428`); these tests
assert the stronger property: N steps == (k steps -> save -> restore -> N-k
steps), with the data cursor and RNG stream continuing exactly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vspbfr_tpu.cli.train_diffuser import (
    full_ckpt_tree as diffuser_ckpt_tree,
    restore_full_ckpt as diffuser_restore,
)
from vspbfr_tpu.cli.train_restore import (
    full_ckpt_tree as restore_ckpt_tree,
    restore_full_ckpt as restore_restore,
)
from vspbfr_tpu.losses.ada import ADAState
from vspbfr_tpu.pipeline import RestorationPipeline
from vspbfr_tpu.train.diffuser_train import DiffuserTrainConfig, DiffuserTrainer
from vspbfr_tpu.train.restore_train import RestoreTrainConfig, RestoreTrainer
from vspbfr_tpu.utils import save_checkpoint

pytestmark = [pytest.mark.slow]

SIZE = 32
DEC = 64


def tree_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def clone(tree):
    """Fresh buffers — the jitted steps donate their state arguments."""
    return jax.tree.map(lambda x: jnp.asarray(np.array(x)), tree)


def _batches(rng, n, b=2):
    return [
        (jnp.asarray(rng.uniform(-1, 1, (b, SIZE, SIZE, 3)).astype(np.float32)),
         jnp.asarray(rng.uniform(-1, 1, (b, SIZE, SIZE, 3)).astype(np.float32)))
        for _ in range(n)]


def test_diffuser_resume_equivalence(tmp_path, rng):
    trainer = DiffuserTrainer(
        DiffuserTrainConfig(size=SIZE, batch=2, percept_weight=0.0,
                            id_weight=0.0),
        RestorationPipeline(size=SIZE, decoder_size=DEC))
    step = trainer.jit_step()
    batches = _batches(rng, 4)

    def run(state, key, batch_slice):
        for low, real in batch_slice:
            key, sub = jax.random.split(key)
            state, _ = step(state, frozen, low, real, sub)
        return state, key

    state0, frozen = jax.jit(trainer.init_states)(jax.random.key(0))
    key0 = jax.random.key(1)

    # uninterrupted: 4 steps
    state_a, _ = run(clone(state0), key0, batches)

    # interrupted: 2 steps -> save -> restore -> 2 steps
    state_b, key_b = run(clone(state0), key0, batches[:2])
    path = os.path.join(str(tmp_path), "ck")
    save_checkpoint(path, jax.device_get(diffuser_ckpt_tree(state_b, key_b, 2)))

    fresh, _ = jax.jit(trainer.init_states)(jax.random.key(0))
    state_c, key_c, it = diffuser_restore(path, fresh, jax.random.key(99))
    assert it == 2
    # optimizer moments survived the round-trip (the r1 gap: resume used to
    # re-init Adam state)
    tree_equal(jax.device_get(state_b.opt_state),
               jax.device_get(state_c.opt_state))
    state_c, _ = run(state_c, key_c, batches[2:])

    tree_equal(jax.device_get(state_a.params), jax.device_get(state_c.params))
    assert int(state_a.step) == int(state_c.step) == 4


def test_restore_gan_resume_equivalence(tmp_path, rng):
    trainer = RestoreTrainer(
        RestoreTrainConfig(size=SIZE, batch=2, d_reg_every=2,
                           percept_weight=0.0, id_weight=0.0),
        RestorationPipeline(size=SIZE, decoder_size=DEC))
    step = trainer.jit_step()
    batches = _batches(rng, 4)

    def run(g, d, ema, key, batch_slice):
        for low, real in batch_slice:
            key, sub = jax.random.split(key)
            g, d, ema, _ = step(g, d, ema, frozen, low, real, sub)
        return g, d, ema, key

    g0, d0, ema0, frozen = jax.jit(trainer.init_states)(jax.random.key(0))
    ema0 = jax.tree.map(lambda x: jnp.asarray(np.array(x)), ema0)
    key0 = jax.random.key(1)

    g_a, d_a, ema_a, _ = run(clone(g0), clone(d0), clone(ema0), key0, batches)

    g_b, d_b, ema_b, key_b = run(clone(g0), clone(d0), clone(ema0), key0,
                                 batches[:2])
    path = os.path.join(str(tmp_path), "ck")
    save_checkpoint(path, jax.device_get(
        restore_ckpt_tree(g_b, d_b, ema_b, None, key_b, 2)))

    gf, df, emaf, _ = jax.jit(trainer.init_states)(jax.random.key(0))
    emaf = jax.tree.map(lambda x: jnp.asarray(np.array(x)), emaf)
    g_c, d_c, ema_c, _, key_c, it = restore_restore(
        path, gf, df, emaf, None, jax.random.key(99))
    assert it == 2
    tree_equal(jax.device_get(d_b.opt_state), jax.device_get(d_c.opt_state))
    g_c, d_c, ema_c, _ = run(g_c, d_c, ema_c, key_c, batches[2:])

    tree_equal(jax.device_get(g_a.params), jax.device_get(g_c.params))
    tree_equal(jax.device_get(d_a.params), jax.device_get(d_c.params))
    tree_equal(jax.device_get(ema_a), jax.device_get(ema_c))
    # R1 cadence continued from the restored g_step (fires at g_step % 2 == 0)
    assert int(g_a.step) == int(g_c.step) == 4


def test_restore_ckpt_tree_carries_ada_and_legacy_fallback(tmp_path):
    """ada state round-trips; a params-only legacy tree falls back with a
    warning instead of crashing."""
    trainer = RestoreTrainer(
        RestoreTrainConfig(size=SIZE, batch=1, percept_weight=0.0,
                           id_weight=0.0, augment=True),
        RestorationPipeline(size=SIZE, decoder_size=DEC))
    g0, d0, ema0, _ = jax.jit(trainer.init_states)(jax.random.key(0))
    ada = ADAState(p=jnp.asarray(0.25), sign_sum=jnp.asarray(3.0),
                   count=jnp.asarray(8.0), steps=jnp.asarray(7, jnp.int32))
    path = os.path.join(str(tmp_path), "ck")
    save_checkpoint(path, jax.device_get(
        restore_ckpt_tree(g0, d0, ema0, ada, jax.random.key(5), 11)))
    _, _, _, ada2, key2, it = restore_restore(
        path, g0, d0, ema0, ADAState.create(), jax.random.key(0))
    assert it == 11
    assert float(ada2.p) == 0.25 and int(ada2.steps) == 7
    tree_equal(jax.random.key_data(key2),
               jax.random.key_data(jax.random.key(5)))

    # legacy format: params only
    legacy = os.path.join(str(tmp_path), "legacy")
    save_checkpoint(legacy, jax.device_get(
        {"g": g0.params, "d": d0.params, "g_ema": ema0, "iter": 3}))
    with pytest.warns(UserWarning, match="params-only"):
        g2, d2, ema2, _, _, it = restore_restore(
            legacy, g0, d0, ema0, None, jax.random.key(0))
    assert it == 3
    tree_equal(jax.device_get(g2.params), jax.device_get(g0.params))


def test_dataloader_resume_cursor(tmp_path, rng):
    """forever(start_epoch, start_batch) reproduces the tail of the
    uninterrupted stream without loading the skipped batches."""
    from PIL import Image

    from vspbfr_tpu.data import DataLoader, RestoreTestDataset

    img_dir = os.path.join(str(tmp_path), "imgs")
    os.makedirs(img_dir)
    for i in range(10):
        arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i:02d}.png"))

    ds = RestoreTestDataset(img_dir, im_size=(16, 16))
    loader = DataLoader(ds, 3, seed=7, num_workers=2)
    bpe = loader.batches_per_epoch()
    assert bpe == 3  # 10 // 3

    full = []
    it = loader.forever(0)
    for _ in range(7):
        full.append(next(it))

    resumed = []
    it2 = loader.forever(*divmod(4, bpe))  # epoch 1, batch 1
    for _ in range(3):
        resumed.append(next(it2))

    for a, b in zip(full[4:], resumed):
        np.testing.assert_array_equal(a[0], b[0])
        assert list(a[-1]) == list(b[-1])
