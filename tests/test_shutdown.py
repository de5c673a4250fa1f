"""Preemption-safe shutdown: SIGTERM mid-training -> final checkpoint ->
exit 0 (utils/runtime.py::GracefulShutdown, wired into both trainer CLIs).

Spawns the real diffuser trainer CLI on a 2-virtual-device CPU mesh, waits
for training to actually progress (log lines appear), sends SIGTERM, and
asserts a clean exit with a committed checkpoint at an iter the periodic
save cadence alone could not have produced."""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def img_dir(tmp_path, rng):
    from PIL import Image
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(8):
        arr = rng.integers(0, 255, (64, 64, 3), dtype="uint8")
        Image.fromarray(arr).save(str(d / f"{i}.png"))
    return str(d)


def test_sigterm_saves_and_exits_cleanly(tmp_path, img_dir):
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never roll the TPU-tunnel die
    env["JAX_PLATFORMS"] = "cpu"
    flags = [t for t in env.get("XLA_FLAGS", "").split()
             if not t.startswith("--xla_force_host_platform_device_count")]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=2"])
    env["PYTHONPATH"] = REPO

    # save_inter larger than any iter this test reaches: the only way a
    # checkpoint appears is the shutdown path
    proc = subprocess.Popen(
        [sys.executable, "-u", "-m", "vspbfr_tpu.cli.train_diffuser",
         "--path", img_dir, "--size", "32", "--decoder_size", "64",
         "--batch", "1", "--iter", "100000", "--save_inter", "100000",
         "--show_inter", "100000", "--percept_loss_weight", "0",
         "--id_loss_weight", "0", "--out", out],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)

    log = os.path.join(out, "train.log")
    deadline = time.time() + 1500  # compile dominates (cold cache on CI)
    try:
        while time.time() < deadline:
            if proc.poll() is not None:
                pytest.fail("trainer exited early:\n"
                            + proc.communicate()[0][-4000:])
            if os.path.exists(log) and os.path.getsize(log) > 0:
                break  # >= 10 steps have run
            time.sleep(2)
        else:
            pytest.fail("trainer never reached step 10 before deadline")

        proc.send_signal(signal.SIGTERM)
        out_text = proc.communicate(timeout=600)[0]
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out_text[-4000:]
    assert "[shutdown]" in out_text

    from vspbfr_tpu.utils import load_checkpoint
    ck = load_checkpoint(os.path.join(out, "checkpoint", "code_diffuser"))
    assert int(ck["iter"]) >= 10  # saved by the shutdown path, not cadence
    # the full resume payload round-trips (params + moments + RNG cursor)
    assert {"diffuser", "opt", "rng", "step"} <= set(ck)
