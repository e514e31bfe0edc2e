"""A/B: Merkle tree-build throughput, SHA-256 vs Poseidon2, on the real TPU.

Builds salted device trees over 2^21 leaves with both hash backends and
reports leaves/s (steady state, chained dispatches + one host read — see
PERF.md "Rules learned" on tunnel-latency-safe timing).

Run: timeout 1700 python scripts/hash_bench.py [log_n]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    n = 1 << log_n

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from toyni_tpu.field.babybear import P
    from toyni_tpu.merkle import _tree_builder

    tpu = [d for d in jax.devices() if d.platform == "tpu"]
    dev = tpu[0] if tpu else jax.devices()[0]
    jax.config.update("jax_default_device", dev)
    print(f"device: {dev}, leaves: 2^{log_n}")

    rng = np.random.default_rng(0)
    vals = jax.device_put(
        jnp.asarray(rng.integers(0, P, n, dtype=np.uint64).astype(np.uint32)),
        dev,
    )
    salts = jax.device_put(
        jnp.asarray(rng.integers(0, P, (n, 4), dtype=np.uint64).astype(np.uint32)),
        dev,
    )

    from toyni_tpu.field import babybear as bb

    for kind in ("sha256", "poseidon2"):
        fn = _tree_builder(n, True, False, kind)
        t0 = time.perf_counter()
        levels = fn(vals, salts)
        root = np.asarray(levels[-1])  # forces completion
        t_first = time.perf_counter() - t0
        iters = 10
        t0 = time.perf_counter()
        v = vals
        for _ in range(iters):
            # chain ON DEVICE: perturb the next input with the previous root
            # word so the device must execute trees sequentially; no host
            # read inside the loop (a read costs a ~25 ms tunnel round trip)
            v = bb.add(
                jnp.where(v >= jnp.uint32(P), v - jnp.uint32(P), v),
                levels[-1][0, 0] % jnp.uint32(P),
            )
            levels = fn(v, salts)
        sink = int(np.asarray(levels[-1])[0][0])  # completion of the chain
        dt = (time.perf_counter() - t0) / iters
        # a salted tree hashes n leaves + ~n nodes
        print(
            f"{kind}: first {t_first:.2f}s, steady {dt*1e3:.1f} ms/tree, "
            f"{n/dt/1e6:.1f} Mleaves/s (sink {sink & 0xffff})"
        )


if __name__ == "__main__":
    main()
