"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on CPU with
``--xla_force_host_platform_device_count=8`` (JAX's standard fake-multi-device
trick); the real TPU chip is only used by `bench.py`, never by unit tests.

Must run before `jax` is imported anywhere, hence the top-level env mutation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compilation cache: recompiles across test processes (and the
# CLI subprocess smoke tests) hit the cache instead of rebuilding XLA
# programs from scratch
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_ransacflow")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

# The hosting environment may pre-set jax_platforms (e.g. "axon,cpu"),
# which wins over the env var — override it explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
