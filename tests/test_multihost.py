"""Two-PROCESS data-parallel training test (multi-host validation).

The rest of the suite shards over 8 virtual devices inside ONE process;
this spawns two real JAX processes (4 devices each) that rendezvous through
the distributed coordinator and run the jitted stage-2 train step over the
global 8-device mesh — the closest a single machine gets to the reference's
multi-node DDP launch (`/root/reference/restoration_train.py:344-373`,
`code_diffuser_train.py:278-295`). Asserts both processes compute identical,
finite, globally-reduced metrics and identical updated params.
"""

import json
import os
import socket
import subprocess
import sys
import pytest

import numpy as np

pytestmark = [pytest.mark.multihost, pytest.mark.slow]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_train_step(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"out{i}.json" for i in range(2)]
    procs = []
    for i in range(2):
        env = dict(os.environ)
        # fresh CPU-only JAX processes: drop the ambient TPU site, keep the
        # repo importable, force 4 host devices per process.
        # PALLAS_AXON_POOL_IPS gates the deployment image's sitecustomize
        # remote-PJRT registration, which can block interpreter start when
        # the TPU tunnel is unreachable — CPU workers must not roll that die
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
        flags = [t for t in env.get("XLA_FLAGS", "").split()
                 if not t.startswith("--xla_force_host_platform_device_count")]
        env["XLA_FLAGS"] = " ".join(
            flags + ["--xla_force_host_platform_device_count=4"])
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(i)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(outs[i])], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    logs = [p.communicate(timeout=1800)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    res = [json.loads(out.read_text()) for out in outs]
    assert {r["process_index"] for r in res} == {0, 1}
    for stepk in ("step0", "step1"):
        m0, m1 = res[0][stepk], res[1][stepk]
        assert m0.keys() == m1.keys()
        for k in m0:
            assert np.isfinite(m0[k]), (stepk, k, m0[k])
            # globally-reduced metrics must agree bitwise across processes
            assert m0[k] == m1[k], (stepk, k, m0[k], m1[k])
    # replicated params stay in lockstep (DDP invariant)
    assert res[0]["param_l1"] == res[1]["param_l1"]
    # training moved the params
    assert res[0]["step0"]["loss"] != res[0]["step1"]["loss"]
