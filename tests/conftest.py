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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free live compiled executables after every module.

    With the whole suite in one process, ~300 live XLA:CPU executables
    accumulate; at that age, compiling OR (de)serializing the largest
    programs (the 8-device shard_map pipelines) intermittently segfaults
    inside jaxlib 0.9.0 (repro: 6 full-suite runs crashed in
    backend_compile_and_load / executable.serialize / deserialize, always
    past ~270 tests; any ~180-test subset is stable, and every module
    passes standalone).  Dropping executables between modules keeps the
    live set small; the persistent compilation cache makes the re-JITs
    cheap deserializes."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
