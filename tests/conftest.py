"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host-platform virtual devices (SURVEY.md §4 test plan).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment's sitecustomize pre-registers a remote TPU backend before
# this file runs, so the env var alone is not enough — force the platform
# through the config API or every test op round-trips the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Correctness tests compare against float64/float32 oracles; keep MXU-style
# low-precision accumulation out of the comparison.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the trainer-step compiles dominate suite
# wall-clock; identical HLO (by hash) hits disk on reruns.
from vspbfr_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache(min_compile_secs=10.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
