"""Instrument the multichip dry-run: where does compile wall-clock go?

Times each piece (init jit, D-phase compile, G-phase compile, execute)
separately at the dry-run config so the budget work targets the right
subgraph. Uses a FRESH cache dir to measure the driver's cold-cache view.
"""

import os
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  tempfile.mkdtemp(prefix="dryrun_cache_"))

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from vspbfr_tpu.models.e4e import TINY_STAGES  # noqa: E402
from vspbfr_tpu.parallel import DataParallel, create_mesh  # noqa: E402
from vspbfr_tpu.pipeline import RestorationPipeline  # noqa: E402
from vspbfr_tpu.train.restore_train import (RestoreTrainConfig,  # noqa: E402
                                            RestoreTrainer)

T0 = time.perf_counter()


def mark(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", flush=True)


n_devices = 8
size = 16
mesh = create_mesh(n_devices)
pipe = RestorationPipeline(size=size, decoder_size=32,
                           encode_size=64, encoder_stages=TINY_STAGES,
                           channel_div=8)
trainer = RestoreTrainer(
    RestoreTrainConfig(size=size, batch=1, percept_weight=0.0,
                       id_weight=0.0, remat=False), pipe)
mark("imports + setup")

g_state, d_state, g_ema, frozen = jax.jit(trainer.init_states)(
    jax.random.key(0))
g_ema = jax.tree.map(lambda x: jnp.asarray(np.array(x)), g_ema)
jax.block_until_ready(g_state.params)
mark("init_states jit + run")

dp = DataParallel(mesh)
g_state, d_state, g_ema, frozen = dp.replicate(
    (g_state, d_state, g_ema, frozen))
b = n_devices
low = jnp.zeros((b, size, size, 3), jnp.float32)
real = jnp.zeros((b, size, size, 3), jnp.float32)
low, real = dp.shard_batch((low, real))
mark("replicate + shard")

repl = NamedSharding(mesh, P())
data = NamedSharding(mesh, P("data"))
jit_d = jax.jit(
    trainer.d_phase,
    in_shardings=(repl, repl, repl, repl, data, data, repl),
    out_shardings=(repl, data, data, repl, repl))
jit_g = jax.jit(
    trainer.g_phase,
    in_shardings=(repl, repl, repl, repl, data, data, data, data, repl),
    out_shardings=(repl, repl, repl))

k_d, k_g = jax.random.split(jax.random.key(1))
ld = jit_d.lower(d_state, g_state.params, g_state.step, frozen, low, real,
                 k_d)
mark("D phase lowered")
cd = ld.compile()
mark("D phase compiled")
d_state2, clean, feats, d_metrics, _ = cd(
    d_state, g_state.params, g_state.step, frozen, low, real, k_d)
jax.block_until_ready(d_metrics)
mark("D phase executed")

lg = jit_g.lower(g_state, g_ema, d_state2.params, frozen, low, real, clean,
                 feats, k_g)
mark("G phase lowered")
cg = lg.compile()
mark("G phase compiled")
g_state2, g_ema2, g_metrics = cg(
    g_state, g_ema, d_state2.params, frozen, low, real, clean, feats, k_g)
jax.block_until_ready(g_metrics)
mark("G phase executed")
print({k: float(v) for k, v in {**d_metrics, **g_metrics}.items()})
