"""Checkpoint round-trip + logging utilities."""

import os

import jax.numpy as jnp
import numpy as np

from vspbfr_tpu.utils import (Logger, ScoreTracker, load_checkpoint,
                              save_checkpoint, wait_for_saves)


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                   "b": np.zeros(3, np.float32)},
        "iter": 42,
    }
    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, tree)
    back = load_checkpoint(path)
    np.testing.assert_array_equal(back["params"]["w"], tree["params"]["w"])
    assert int(back["iter"]) == 42
    # overwrite like the reference's fixed-name checkpoints
    tree["iter"] = 43
    save_checkpoint(path, tree)
    assert int(load_checkpoint(path)["iter"]) == 43


def test_async_checkpoint_roundtrip(tmp_path):
    """async_save overlaps disk I/O with training; wait_for_saves commits.
    Back-to-back async saves to the same path must serialize (last wins)."""
    tree = {"w": np.arange(4, dtype=np.float32), "iter": 1}
    path = os.path.join(str(tmp_path), "ckpt")
    save_checkpoint(path, tree, async_save=True)
    tree2 = {"w": np.arange(4, dtype=np.float32) * 2, "iter": 2}
    save_checkpoint(path, tree2, async_save=True)
    wait_for_saves()
    back = load_checkpoint(path)
    np.testing.assert_array_equal(back["w"], tree2["w"])
    assert int(back["iter"]) == 2
    # sync and async saves interoperate on the same directory layout
    save_checkpoint(path, tree)
    assert int(load_checkpoint(path)["iter"]) == 1


def test_logger(tmp_path):
    lg = Logger(str(tmp_path), "t")
    lg.log(1, {"loss": 0.5})
    lg.log(2, {"loss": 0.25, "psnr": 30.0})
    lines = open(lg.file).read().strip().splitlines()
    assert len(lines) == 2
    assert "[1] [loss]:0.5" in lines[0]


def test_score_tracker():
    st = ScoreTracker(higher_better={"psnr": True, "lpips": False})
    r1 = st.update(1, {"psnr": 20.0, "lpips": 0.3})
    assert r1 == {"psnr": True, "lpips": True}
    r2 = st.update(2, {"psnr": 19.0, "lpips": 0.2})
    assert r2 == {"psnr": False, "lpips": True}
    assert st.best["psnr"] == (20.0, 1)
