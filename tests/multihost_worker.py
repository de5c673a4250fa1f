"""Worker process for tests/test_multihost.py: one JAX process of a
2-process x 4-virtual-CPU-device "cluster" (8-device global data mesh).

Validates the multi-HOST story the single-process suite cannot: distributed
init via the env rendezvous (`maybe_initialize_distributed`, the replacement
for the reference's NCCL env:// + SLURM rank math,
`/root/reference/restoration_train.py:344-373`), per-process dataset
sharding (`local_batch_slice` = DistributedSampler), assembling
process-local batch shards into a global array (`DataParallel.shard_batch`),
and the jitted stage-2 train step whose gradient all-reduces now cross a
process boundary (gloo on CPU; ICI/DCN on a real pod).

Run via the parent test only — needs JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID and 4 forced host devices in env.
"""

import json
import os
import sys


def main(out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vspbfr_tpu.parallel import (DataParallel, create_mesh,
                                     local_batch_slice,
                                     maybe_initialize_distributed,
                                     process_barrier)

    maybe_initialize_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    import numpy as np
    from vspbfr_tpu.pipeline import RestorationPipeline
    from vspbfr_tpu.train.diffuser_train import (DiffuserTrainConfig,
                                                 DiffuserTrainer)
    from vspbfr_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    size = 32
    trainer = DiffuserTrainer(
        # percept/id off: keeps the 2-concurrent-compile cost tractable on
        # the single-core CI host; the latent path (encode + 4-step unrolled
        # DDPM + L1 + Adam) is what crosses the process boundary anyway
        DiffuserTrainConfig(size=size, batch=1, percept_weight=0.0,
                            id_weight=0.0),
        RestorationPipeline(size=size, decoder_size=64))

    state, frozen = jax.jit(trainer.init_states)(jax.random.key(0))
    mesh = create_mesh()  # all 8 global devices
    dp = DataParallel(mesh)
    state, frozen = dp.replicate((state, frozen))

    # global batch 8, one sample per device; this process contributes only
    # its local 4-row shard, exactly like a per-host dataset shard
    rng = np.random.default_rng(0)
    g_low = rng.uniform(-1, 1, (8, size, size, 3)).astype(np.float32)
    g_real = rng.uniform(-1, 1, (8, size, size, 3)).astype(np.float32)
    sl = local_batch_slice(8)
    low, real = dp.shard_batch((g_low[sl], g_real[sl]))
    assert low.shape == (8, size, size, 3)  # global shape, local shards

    step = trainer.jit_step(mesh)
    # AOT-compile, then align the processes through the coordinator: the
    # first collective's gloo context handshake has a 30 s deadline, and
    # single-core-host compile skew between the two processes exceeds it
    step = step.lower(state, frozen, low, real, jax.random.key(0)).compile()
    process_barrier("pre_first_collective")
    out = {}
    for i in range(2):
        state, metrics = step(state, frozen, low, real, jax.random.key(i))
        out[f"step{i}"] = {k: float(v) for k, v in metrics.items()}
    out["param_l1"] = float(
        sum(abs(np.asarray(x)).sum() for x in jax.tree.leaves(state.params)))
    out["process_index"] = jax.process_index()

    with open(out_path, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main(sys.argv[1])
