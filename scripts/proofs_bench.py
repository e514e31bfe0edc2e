"""Proofs/sec on the real TPU: phase-based vs fused single-dispatch prover.

Usage: timeout 1700 python scripts/proofs_bench.py [rows] [iters] [batch]

Measures steady-state s/proof for StarkProver (host transcript, ~15 round
trips/proof) vs FusedStarkProver (one dispatch) vs FusedBatchStarkProver
(one dispatch for `batch` proofs), asserting byte-identity along the way.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from toyni_tpu import proof as proof_mod
    from toyni_tpu.field.babybear import P
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.prover_fused import FusedBatchStarkProver, FusedStarkProver
    from toyni_tpu.trace import ExecutionTrace
    from toyni_tpu.verifier import StarkVerifier

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    bsz = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    def trace():
        fibs, a, b = [], 1, 1
        for _ in range(rows):
            fibs.append(a % P)
            a, b = b, (a + b) % P
        t = ExecutionTrace()
        t.insert_column(fibs)
        return t

    t0 = time.perf_counter()
    pf = FusedStarkProver(trace(), seed=1).generate_proof()
    print(f"fused first (compile): {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        pf = FusedStarkProver(trace(), seed=10 + i).generate_proof()
    fused_s = (time.perf_counter() - t0) / iters
    print(f"fused steady:  {fused_s:.3f} s/proof "
          f"({1/fused_s:.2f} proofs/s)", flush=True)

    t0 = time.perf_counter()
    pp = StarkProver(trace(), seed=1).generate_proof()
    print(f"phase first (compile): {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        pp = StarkProver(trace(), seed=10 + i).generate_proof()
    phase_s = (time.perf_counter() - t0) / iters
    print(f"phase steady:  {phase_s:.3f} s/proof "
          f"({1/phase_s:.2f} proofs/s)", flush=True)

    assert proof_mod.serialize(pf) == proof_mod.serialize(pp)
    assert StarkVerifier().verify(pf)

    bp = FusedBatchStarkProver(
        [trace() for _ in range(bsz)], seeds=list(range(100, 100 + bsz))
    )
    t0 = time.perf_counter()
    proofs = bp.generate_proofs()
    print(f"batch first (compile+run): {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for r in range(max(1, iters // 2)):
        bp = FusedBatchStarkProver(
            [trace() for _ in range(bsz)],
            seeds=list(range(200 + r * bsz, 200 + (r + 1) * bsz)),
        )
        proofs = bp.generate_proofs()
    batch_s = (time.perf_counter() - t0) / max(1, iters // 2) / bsz
    print(f"batch steady:  {batch_s:.3f} s/proof at B={bsz} "
          f"({1/batch_s:.2f} proofs/s)", flush=True)
    assert all(StarkVerifier().verify(p) for p in proofs[:2])
    print(f"SPEEDUP fused {phase_s/fused_s:.2f}x  "
          f"batch {phase_s/batch_s:.2f}x  (rows={rows})")


if __name__ == "__main__":
    main()
