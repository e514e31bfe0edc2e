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


# Crash root cause (found round 4): every XLA:CPU executable JIT-maps many
# small code/data sections; accumulated live executables push the process
# past the kernel's vm.max_map_count limit (65530 here), at which point
# LLVM's section allocator fails ("LLVM ERROR: Unable to allocate section
# memory!" / "compilation error: Cannot allocate memory") and the process
# SIGABRTs. Reproduced deterministically by running test_batch.py +
# test_batch_p2.py with clearing disabled while sampling /proc/self/maps:
# the count climbs ~10-20k maps per heavy module and the abort lands as it
# reaches the limit. jax.clear_caches() releases the executables (and
# their maps) — hence the round-1 workaround worked. The fixture now
# clears ONLY when the map count nears the limit, so light modules keep
# their compiled shapes (fewer recompiles, faster suite).
_MAP_CLEAR_THRESHOLD = 30_000  # limit 65530; heaviest single module ~+20k


def _map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no /proc — fall back to always clearing
        return _MAP_CLEAR_THRESHOLD + 1


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables between modules WHEN the process's memory-
    map count nears vm.max_map_count (see note above). TOYNI_TEST_NO_CACHE_
    CLEAR=1 disables entirely (the root-cause repro knob)."""
    yield
    if os.environ.get("TOYNI_TEST_NO_CACHE_CLEAR") == "1":
        return
    if _map_count() > _MAP_CLEAR_THRESHOLD:
        jax.clear_caches()
