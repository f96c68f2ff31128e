"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes (SURVEY.md §4: multi-chip tests
use xla_force_host_platform_device_count simulation).
"""

import os

# Force CPU: the shell profile exports JAX_PLATFORMS=axon (the TPU tunnel),
# so a setdefault would silently run the whole suite over the tunnel.
# Unit tests target the virtual 8-device CPU mesh; TPU runs happen via
# bench.py and explicit verification drives.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" at
# interpreter start, overriding the env var — undo it here, before any
# backend initializes, so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# XLA:CPU segfaults/aborts inside backend_compile_and_load after a few
# hundred accumulated compiled programs in one process (reproduced 3x at
# the same suite position — the first fresh compile inside the 300-view
# scenario at ~150 tests in — while the identical test passes standalone).
# Dropping the executable caches periodically keeps the LLVM JIT state
# bounded; the handful of shared programs recompile in seconds.
_TESTS_SINCE_CLEAR = 0


def pytest_runtest_teardown(item, nextitem):
    global _TESTS_SINCE_CLEAR
    _TESTS_SINCE_CLEAR += 1
    if _TESTS_SINCE_CLEAR >= 40:
        _TESTS_SINCE_CLEAR = 0
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
