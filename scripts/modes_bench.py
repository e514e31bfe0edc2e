"""Hardware numbers for the non-default protocol modes (round-4 item:
they were correctness-tested everywhere but never timed on the chip).

Usage: timeout 1700 python scripts/modes_bench.py [log_rows] [iters] [prover]
                                                  [modes]
`modes` is a comma list subset of base,ext,pair,sbox (default: all) — lets
a re-run finish the tail modes when a budget expired mid-sweep.

Measures steady-state s/proof on the real TPU for:
  * ext       — StarkConfig(ext_challenges=True): z/betas from F_p^4,
                ext DEEP/FRI codewords + leaves (4x codeword, inv_fast)
  * pair      — PairFibonacciAir (2 columns, 2 alpha-composed constraints,
                row-bundle commitments, 2 shifts)
  * sbox      — SboxChainAir (x^7 nonlinear constraint,
                constraint_degree=7 -> wider FRI budget)
against the reference-shape base mode. `prover` is 'phase' (default) or
'fused'; at 2^16 use 'fused' — the phase prover's unrolled-SHA jaxpr
tracing (~840 s/mode, PERF.md round 3) recurs per process, while the
fused prover's chunked form compiles in ~9 min/mode and then hits the
persistent executable cache. The DELTAS between modes are
prover-independent. Host-verifies one proof per mode.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from toyni_tpu.air import PairFibonacciAir, SboxChainAir
    from toyni_tpu.config import StarkConfig
    from toyni_tpu.field.babybear import P
    from toyni_tpu.trace import ExecutionTrace
    from toyni_tpu.verifier import StarkVerifier

    log_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    which = sys.argv[3] if len(sys.argv) > 3 else "phase"
    if which not in ("phase", "fused"):
        sys.exit(f"unknown prover {which!r} (expected 'phase' or 'fused')")
    if which == "fused":
        from toyni_tpu.prover_fused import FusedStarkProver as StarkProver
    else:
        from toyni_tpu.prover import StarkProver
    rows = 1 << log_rows

    def fib_trace():
        fibs, a, b = [], 1, 1
        for _ in range(rows):
            fibs.append(a % P)
            a, b = b, (a + b) % P
        t = ExecutionTrace()
        t.insert_column(fibs)
        return t

    def pair_trace():
        t = ExecutionTrace()
        for col in PairFibonacciAir.generate_trace(rows):
            t.insert_column(col)
        return t

    def sbox_trace():
        t = ExecutionTrace()
        t.insert_column(SboxChainAir.generate_trace(rows))
        return t

    pair_air, sbox_air = PairFibonacciAir(), SboxChainAir()
    modes = [
        ("base", fib_trace, None, StarkConfig()),
        ("ext", fib_trace, None, StarkConfig(ext_challenges=True)),
        ("pair", pair_trace, pair_air, StarkConfig()),
        ("sbox", sbox_trace, sbox_air, StarkConfig(constraint_degree=7)),
    ]
    if len(sys.argv) > 4:
        want = set(sys.argv[4].split(","))
        unknown = want - {m[0] for m in modes}
        if unknown:
            sys.exit(f"unknown modes {sorted(unknown)!r}")
        modes = [m for m in modes if m[0] in want]
    results = {}
    for name, mk, air, cfg in modes:
        t0 = time.perf_counter()
        p = StarkProver(mk(), air=air, config=cfg, seed=1).generate_proof()
        compile_s = time.perf_counter() - t0
        assert StarkVerifier(air=air, config=cfg).verify(p), name
        t0 = time.perf_counter()
        for i in range(iters):
            StarkProver(mk(), air=air, config=cfg,
                        seed=10 + i).generate_proof()
        spp = (time.perf_counter() - t0) / iters
        results[name] = spp
        print(f"{name:5s} {which} rows=2^{log_rows}  first={compile_s:6.1f}s  "
              f"steady={spp:.3f} s/proof ({1/spp:.2f} proofs/s)", flush=True)
    base = results.get("base")
    for name, spp in results.items():
        if name != "base" and base:
            print(f"  {name} / base = {spp/base:.2f}x", flush=True)


if __name__ == "__main__":
    main()
