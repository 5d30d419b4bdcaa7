"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's determinism controls (reference:
mask3d/conf/trainer/trainer.yaml:1 `deterministic: true`) — all tests run on
the CPU backend with 8 virtual devices so that multi-chip sharding paths
(`jax.sharding.Mesh` + pjit) are exercised without TPU hardware.

The ambient environment registers a remote-TPU PJRT plugin at interpreter
startup and pins `jax_platforms` to it; tests must override BOTH the env vars
and the already-applied jax config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by XLA:CPU
# compiles of the jitted train/eval graphs; caching makes repeat runs fast.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
