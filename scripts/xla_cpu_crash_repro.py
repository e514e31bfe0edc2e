"""Minimal-repro search for the XLA:CPU accumulated-executables crash.

ROOT CAUSE (found round 4, see tests/conftest.py): vm.max_map_count
exhaustion. Each XLA:CPU executable JIT-maps many code/data sections;
with executables retained by jit caches the process's /proc/self/maps
count climbs ~10-20k per heavy test module until mmap fails at the
kernel limit (65530) — "LLVM ERROR: Unable to allocate section memory!",
SIGABRT. Deterministic repro: run tests/test_batch.py +
tests/test_batch_p2.py with TOYNI_TEST_NO_CACHE_CLEAR=1 while sampling
`grep -c '' /proc/<pid>/maps` — the abort lands as the count reaches the
limit. Fix options: jax.clear_caches() when the count nears the limit
(what conftest now does), or raise vm.max_map_count.

The SYNTHETIC modes below did NOT reproduce (600 small shard_map
compiles stay far below the map limit — program COUNT is not the
trigger; total section count of LARGE programs is):

  python scripts/xla_cpu_crash_repro.py jit        # plain jits
  python scripts/xla_cpu_crash_repro.py shard_map  # shard_map'd programs
  python scripts/xla_cpu_crash_repro.py suite      # suite-like mix:
      shard_map + big unrolled elementwise bodies (SHA-ish op counts)

Run under the CPU backend with the axon plugin disabled:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/xla_cpu_crash_repro.py suite

Progress prints one line per 25 compiles; a crash manifests as SIGSEGV /
SIGABRT before the final ALL-OK line (run it under `timeout` and check the
exit code: 139/134 = reproduced).
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as Pspec  # noqa: E402


def big_body(x, rounds=64):
    """SHA-like op volume: `rounds` of rotate/xor/add over u32 lanes."""
    a = x
    b = x ^ jnp.uint32(0x9E3779B9)
    for r in range(rounds):
        a = ((a << jnp.uint32(5)) | (a >> jnp.uint32(27))) + b
        b = (b ^ a) + jnp.uint32(r)
    return a + b


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "suite"
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("d",))
    print(f"mode={mode} devices={len(jax.devices())} target={count}",
          flush=True)

    for i in range(count):
        n = 128 + 8 * (i + 1)  # distinct shape per iteration -> new compile
        x = jnp.arange(n * 8, dtype=jnp.uint32).reshape(8, n)
        if mode == "jit":
            f = jax.jit(lambda v: big_body(v, rounds=8))
        elif mode == "shard_map":
            f = jax.jit(jax.shard_map(
                lambda v: v + jax.lax.axis_index("d").astype(jnp.uint32),
                mesh=mesh, in_specs=(Pspec("d"),), out_specs=Pspec("d"),
            ))
        else:  # suite-like: shard_map with a heavy unrolled body
            f = jax.jit(jax.shard_map(
                lambda v: big_body(v, rounds=64),
                mesh=mesh, in_specs=(Pspec("d"),), out_specs=Pspec("d"),
            ))
        np.asarray(f(x))
        if (i + 1) % 25 == 0:
            print(f"  {i + 1} compiles OK", flush=True)
    print("ALL-OK", flush=True)


if __name__ == "__main__":
    main()
