"""Test harness config: run everything on a virtual 8-device CPU mesh.

The bench (bench.py) runs on the real TPU; tests are deterministic and
hardware-independent.  Note: this environment pre-configures
``jax_platforms=axon,cpu`` — the config.update below overrides it before
any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

if os.environ.get("TPU_DEBRUIJN_TEST_BACKEND", "cpu") == "tpu":
    # silicon run (scripts/run_tpu_tests.py): leave the preconfigured
    # axon,cpu platform list so the parity subset executes on the chip
    pass
else:
    jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is dominated by CPU XLA compiles of
# shape-specialized programs; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
