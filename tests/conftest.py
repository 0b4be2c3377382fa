"""Test configuration: force the CPU backend with 8 virtual devices + x64.

This environment pre-imports jax via sitecustomize with the `axon` TPU
platform; env vars are too late.  jax.config.update('jax_platforms', 'cpu')
before first backend use reliably selects CPU, and XLA_FLAGS (read at CPU
client creation, which is lazy) provides the 8-device virtual mesh for
multi-chip sharding tests.  x64 gives reference (double) precision for
numerical fidelity tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The full suite compiles ~300 XLA:CPU programs in one process; left
    to accumulate, the JIT's code cache eventually segfaults inside
    backend_compile_and_load (reproduced deterministically at ~270
    programs; each half of the suite passes alone).  Per-module cache
    clears keep the live-executable count bounded; cross-module cache
    reuse is minimal, so the wall-clock cost is small."""
    yield
    jax.clear_caches()
