"""Test harness config.

Forces all test computation onto the local CPU backend with 8 virtual
devices, so (a) tests don't round-trip through the remote TPU tunnel and
(b) multi-chip sharding tests always have a mesh to run on — the analog of
the reference's `cuda_available()` runtime-skip pattern (reference:
src/ntt.rs:259-268), except the "device" (a virtual CPU mesh) always exists.

Note: this environment registers an out-of-process TPU platform that wins
backend priority even when JAX_PLATFORMS=cpu, so pinning the default device
to the CPU backend (rather than env vars alone) is what actually keeps tests
local.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

CPU_DEVICES = jax.local_devices(backend="cpu")
jax.config.update("jax_default_device", CPU_DEVICES[0])


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between test modules.

    This deployment's XLA:CPU segfaults/aborts while compiling (or cache-
    serializing) a shard_map program once ~20 modules' worth of compiled
    executables have accumulated in the process — reproducible at the same
    test with the prior modules run first, and absent when any module runs
    alone. Clearing jit caches at module boundaries keeps the live-executable
    count low. Costs recompiles for shapes shared across modules (most are
    module-local)."""
    yield
    jax.clear_caches()
