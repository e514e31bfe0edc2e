"""Multi-device scaling-efficiency benchmark for the distributed prove step.

Measures ops/s of the full sharded proving pipeline (4-step NTTs with
all-to-alls, constraint/quotient, DEEP, all FRI folds, collective Merkle
roots) at 1, 2, 4, 8 shards and reports parallel efficiency
(T1 / (D * T_D)).

On this deployment only one physical TPU chip is reachable, so the mesh is
the 8-device virtual CPU platform — the *correctness and collective-schedule*
harness. The numbers demonstrate scaling shape, not real ICI bandwidth; run
on a real v5e-8 slice unchanged for hardware numbers.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/scaling_bench.py [--rows 512] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import numpy as np

    if not any(d.platform == "tpu" for d in jax.devices()):
        jax.config.update("jax_default_device", jax.local_devices(backend="cpu")[0])

    from toyni_tpu.parallel.prover_dist import make_sharded_prove_step

    results = {}
    for D in (1, 2, 4, 8):
        try:
            mesh, fn, make_args = make_sharded_prove_step(args.rows, D)
        except AssertionError as e:
            print(f"D={D}: skipped ({e})", file=sys.stderr)
            continue
        a = make_args(seed=0)
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        results[D] = dt
        base = results.get(1)
        eff = (base / (D * dt)) if base else float("nan")
        print(
            json.dumps(
                {
                    "shards": D,
                    "sec_per_step": round(dt, 4),
                    "efficiency_vs_1": round(eff, 3) if base else None,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
