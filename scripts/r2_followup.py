"""Round-2 follow-up measurements: int8 MXU A/B + fused prover at 2^16.

Usage: timeout 3000 python scripts/r2_followup.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(__file__).rsplit("/", 2)[0])


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from toyni_tpu.field.babybear import P, get_root_of_unity
    from toyni_tpu.ops import ntt_mxu

    dev = [d for d in jax.devices() if d.platform == "tpu"][0]
    jax.config.update("jax_default_device", dev)

    # ── 1. int8 vs bf16 MXU NTT at 2^22 / 2^24 ────────────────────────────
    rng = np.random.default_rng(0)
    for log_n in (22, 24):
        n = 1 << log_n
        om = get_root_of_unity(log_n)
        x0 = jax.device_put(jnp.asarray(
            rng.integers(0, P, n, dtype=np.uint64).astype(np.uint32)), dev)

        def bench(tabs, iters=25):
            f = jax.jit(lambda v, t: ntt_mxu.apply_mxu_ntt(v, t))
            head = np.asarray(f(x0, tabs)[:8], np.uint64)
            t0 = time.perf_counter()
            y = x0
            for _ in range(iters):
                y = f(y, tabs)
            sink = int(np.asarray(y[:8])[0])
            assert 0 <= sink < P
            return (time.perf_counter() - t0) / iters, head

        t_bf, h_bf = bench(ntt_mxu.mxu_ntt_tables(n, om))
        t_i8, h_i8 = bench(ntt_mxu.mxu_ntt_tables_i8(n, om))
        assert np.array_equal(h_bf, h_i8), "i8 head mismatch"
        gb = (n // 2 * log_n) / 1e9
        print(f"2^{log_n}: bf16 {t_bf*1e3:7.2f} ms ({gb/t_bf:5.1f} Gbf/s)  "
              f"i8 {t_i8*1e3:7.2f} ms ({gb/t_i8:5.1f} Gbf/s)  "
              f"{t_bf/t_i8:4.2f}x", flush=True)

    # ── 2. fused prover at trace 2^16 (rolled-SHA trace) ──────────────────
    from toyni_tpu import proof as proof_mod
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.prover_fused import FusedStarkProver
    from toyni_tpu.trace import ExecutionTrace
    from toyni_tpu.verifier import StarkVerifier

    rows = 1 << 16
    fibs, a, b = [], 1, 1
    for _ in range(rows):
        fibs.append(a % P)
        a, b = b, (a + b) % P

    def trace():
        t = ExecutionTrace()
        t.insert_column(fibs)
        return t

    t0 = time.perf_counter()
    pf = FusedStarkProver(trace(), seed=1).generate_proof()
    print(f"fused 2^16 first (compile): {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for i in range(3):
        pf = FusedStarkProver(trace(), seed=10 + i).generate_proof()
    fused_s = (time.perf_counter() - t0) / 3
    print(f"fused 2^16 steady: {fused_s:.3f} s/proof", flush=True)
    pp = StarkProver(trace(), seed=12).generate_proof()
    assert proof_mod.serialize(pf) == proof_mod.serialize(pp), "byte mismatch"
    assert StarkVerifier().verify(pf)
    t0 = time.perf_counter()
    for i in range(3):
        StarkProver(trace(), seed=20 + i).generate_proof()
    print(f"phase 2^16 steady: {(time.perf_counter()-t0)/3:.3f} s/proof",
          flush=True)
    print("byte-identity + verify OK")


if __name__ == "__main__":
    main()
