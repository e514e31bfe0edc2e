"""Benchmark: NTT throughput + end-to-end proofs/sec on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "extra": {...}}

Headline metric (BASELINE.md): butterflies/sec/chip for a 2^24-point BabyBear
NTT via the DEFAULT accelerated path (the MXU limb-matmul NTT since round 2)
— the kernel the reference accelerates with CUDA (cuda/ntt_kernel.cu). The
reference publishes no numbers, so `vs_baseline` reports the speedup over
this framework's own CPU execution of the identical computation (the
reference's CPU-vs-accelerator comparison, src/ntt.rs:264-287, in spirit),
against a PINNED CPU rate (`CPU_RATE_PINNED_BF_S`) so the ratio is
comparable across rounds; the live CPU leg is reported in `extra`.

`extra` carries the BASELINE.md end-to-end metrics. Mandatory stages:
Fibonacci proofs/sec at trace 2^8 and 2^16 (full ZK pipeline,
host-verified) with the fused single-dispatch prover — the measured
per-size winner at both (PERF.md round-3 table), and ~10x cheaper to
cold-trace than the phase prover (whose unrolled-SHA tree programs cost a
cold process ~840 s of Python tracing at 2^16 — the round-2 stage
timeout). Optional stages, run best-effort in priority order with the
remaining budget: batched throughput (FusedBatchStarkProver, B=8, the
highest-throughput configuration) and the Poseidon2-commitment mode at
2^8 (the win side of the measured SHA/Poseidon2 crossover, PERF.md
"Poseidon2"). Trace 2^20 is deliberately NOT a driver stage
(round-5 finding): its warm wall is ~14 min of per-process Python
TRACING (jaxprs don't persist; only executables do), which both exceeds
any sane stage budget and starves every stage after it — the large-proof
regime is recorded in PERF.md instead (8.24 s/proof at 2^20, 10.21 s at
2^21, 18.28 s at 2^22, all hardware-measured).

Stages respect a deadline so the driver's 1700 s budget is never
exceeded. Metric contract: MANDATORY keys are always present (null +
`<key>_error` on failure); OPTIONAL keys are present only when their
stage ran to success — a skipped or failed optional stage leaves no key.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

LOG_N = 24
CPU_LOG_N = 20  # CPU comparison size (same op, smaller for time), scaled
DEADLINE_S = 1500  # leave driver-budget headroom for interpreter/teardown
_T0 = time.perf_counter()

# Pinned CPU reference rate for `vs_baseline` (round-5 fix, VERDICT r4 weak
# #4): the LIVE CPU leg on this shared 4-core box swings ~4x run to run
# (3-iter XLA:CPU timing under whatever else the box is doing), which made
# the headline ratio useless for trend detection across rounds (73x -> 291x
# -> 155x -> 91x for a near-constant TPU numerator). The pinned rate is the
# median of 5 reps x 10 chained NTTs at 2^20 on this box (2026-08-21:
# 14.3/14.3/15.5/15.8/19.8 ms -> 676 Mbf/s). The live CPU leg still runs
# and is reported in extra as `cpu_ntt_ms_2e20_live` for drift detection;
# `vs_baseline` = tpu_rate / this constant.
CPU_RATE_PINNED_BF_S = 676e6


def _remaining() -> float:
    return DEADLINE_S - (time.perf_counter() - _T0)


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass


def _bench_backend(device, log_n: int, iters: int) -> float:
    """Seconds per NTT of size 2^log_n on `device` (steady state).

    Methodology: a *chained* sequence y = NTT(y) — each dispatch consumes the
    previous output, so the device must execute every transform sequentially
    and per-dispatch tunnel latency is amortized across the chain — followed
    by a host read of the final output (outside the enqueue loop, inside the
    timer), which forces completion of the whole chain before the clock
    stops. Single-shot block_until_ready timing over this deployment's remote
    device tunnel measures ~25 ms of round-trip latency, not device time.
    """
    import jax
    import jax.numpy as jnp

    from toyni_tpu.field.babybear import P, get_root_of_unity
    from toyni_tpu.ops import ntt as ntt_ops

    # Pin the default device so backend-conditional paths (the MXU NTT is
    # TPU-only) resolve for THIS device at trace time.
    jax.config.update("jax_default_device", device)

    n = 1 << log_n
    omega = get_root_of_unity(log_n)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        jnp.asarray(rng.integers(0, P, n, dtype=np.uint64).astype(np.uint32)),
        device,
    )
    # twiddle tables ride in as ARGUMENTS (PERF.md rule 2): closing the jit
    # over them would bake ~64 MB of constants into the program, which makes
    # the remote compile an order of magnitude slower
    tabs = jax.device_put(ntt_ops.ntt_tables(n, omega), device)
    fn = jax.jit(lambda v, t: ntt_ops.apply_ntt(v, t, n))
    # warm-up (compile + one full execution observed on host)
    np.asarray(fn(x0, tabs)[:8])
    t0 = time.perf_counter()
    y = x0
    for _ in range(iters):
        y = fn(y, tabs)
    sink = int(np.asarray(y[:8])[0])  # completion of the full chain
    dt = (time.perf_counter() - t0) / iters
    assert 0 <= sink < 2013265921
    return dt


def _bench_proofs(device, rows: int, iters: int, prover: str = "fused"):
    """Steady-state seconds/proof at `rows` trace rows (full ZK pipeline);
    the first proof is host-verified. `prover`: 'fused' (single-dispatch —
    the measured winner: 0.42 vs 0.65 s/proof at 2^8 on v5e), 'phase', or
    'fused_p2' (fused prover committing with the Poseidon2 arithmetic hash —
    the fastest measured configuration at small traces, 0.28 s/proof)."""
    import jax

    from toyni_tpu.config import StarkConfig
    from toyni_tpu.field.babybear import P
    from toyni_tpu.trace import ExecutionTrace
    from toyni_tpu.verifier import StarkVerifier

    cfg = StarkConfig()
    batch = 0
    if prover.startswith("batch"):
        from toyni_tpu.prover_fused import FusedBatchStarkProver

        batch = int(prover[len("batch"):] or 8)
    elif prover.startswith("fused"):
        from toyni_tpu.prover_fused import FusedStarkProver as prover_cls

        if prover == "fused_p2":
            cfg = StarkConfig(hash="poseidon2")
    elif prover == "phase_p2":
        from toyni_tpu.prover import StarkProver as prover_cls

        cfg = StarkConfig(hash="poseidon2")
    else:
        from toyni_tpu.prover import StarkProver as prover_cls

    jax.config.update("jax_default_device", device)

    def trace():
        fibs, a, b = [], 1, 1
        for _ in range(rows):
            fibs.append(a % P)
            a, b = b, (a + b) % P
        t = ExecutionTrace()
        t.insert_column(fibs)
        return t

    if batch:
        # one dispatch proves `batch` traces; s/proof is wall / (runs*batch)
        bp = FusedBatchStarkProver(
            [trace() for _ in range(batch)], seeds=list(range(1, 1 + batch))
        )
        proofs = bp.generate_proofs()
        assert StarkVerifier(config=cfg).verify(proofs[0]), (
            "bench proof rejected by verifier"
        )
        runs = max(1, iters)
        t0 = time.perf_counter()
        for r in range(runs):
            FusedBatchStarkProver(
                [trace() for _ in range(batch)],
                seeds=list(range(100 + r * batch, 100 + (r + 1) * batch)),
            ).generate_proofs()
        return (time.perf_counter() - t0) / (runs * batch)

    first = prover_cls(trace(), config=cfg, seed=1).generate_proof()
    assert StarkVerifier(config=cfg).verify(first), (
        "bench proof rejected by verifier"
    )
    t0 = time.perf_counter()
    for i in range(iters):
        prover_cls(trace(), config=cfg, seed=10 + i).generate_proof()
    return (time.perf_counter() - t0) / iters


def _proofs_stage_main(rows: int, iters: int, prover: str = "fused") -> None:
    """Child-process entry: print one float (seconds/proof) on the last
    line. Run as `python bench.py --proofs <rows> <iters> [prover]`."""
    _enable_compile_cache()
    import jax

    tpu = [d for d in jax.devices() if d.platform == "tpu"]
    dev = tpu[0] if tpu else jax.devices()[0]
    print(_bench_proofs(dev, rows, iters, prover))


def _proofs_subprocess(rows: int, iters: int, budget: float,
                       prover: str = "fused"):
    """Run a proofs stage in a child process under a HARD timeout: a hung
    remote compile then costs its budget, not the driver's whole run."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, __file__, "--proofs", str(rows), str(iters),
             prover],
            capture_output=True, text=True, timeout=budget,
        )
        if out.returncode != 0:
            return None, "stage_failed"
        return float(out.stdout.strip().splitlines()[-1]), None
    except subprocess.TimeoutExpired:
        return None, "stage_timeout"
    except Exception as e:  # noqa: BLE001
        return None, type(e).__name__


def main() -> None:
    _enable_compile_cache()
    import jax

    tpu = [d for d in jax.devices() if d.platform == "tpu"]
    cpu = jax.local_devices(backend="cpu")

    # TPU measurement (fall back to default device if no TPU visible)
    dev = tpu[0] if tpu else jax.devices()[0]
    sec = _bench_backend(dev, LOG_N, iters=40)
    n = 1 << LOG_N
    butterflies = n // 2 * LOG_N
    tpu_rate = butterflies / sec

    extra = {"ntt_ms_2e24": round(sec * 1e3, 2)}

    # end-to-end proofs/sec (BASELINE.md metrics): each stage runs in a
    # child process under a hard timeout sized to what the deadline allows.
    # Two mandatory fused stages, then optional stages best-effort in
    # priority order (batched throughput, then the Poseidon2 2^8 stage);
    # the deadline guard protects the headline metric if a stage cannot
    # fit. Round-5 accounting: even fully warm, each stage's wall is
    # dominated by per-process Python TRACING (executables persist across
    # processes; jaxprs cannot): ~320-350 s for batch8/p2_2e8 on top of
    # ~700 s of mandatory+NTT+CPU legs, which is why the stage list stops
    # there — PERF.md round 5 carries the hardware measurements of every
    # configuration including the ones too tracing-heavy for this window
    # (2^20: 8.24 s/proof; p2@2^16: 0.84 s/proof).
    for key, rows, iters, budget, prover, optional in (
        # 10 iters: per-dispatch tunnel-latency variance (+/-50% on a busy
        # box) averages out; each warm iteration costs ~0.35 s
        ("proofs_per_sec_2e8", 1 << 8, 10, 420, "fused", False),
        ("proofs_per_sec_2e16", 1 << 16, 2, 1200, "fused", False),
        # highest-throughput configuration: 8 proofs per dispatch
        # (0.091 s/proof at 2^8 on v5e, PERF.md round-5 table); budget =
        # measured warm wall (tracing-dominated ~350 s) + margin
        ("proofs_per_sec_2e8_batched", 1 << 8, 2, 480, "batch8", True),
        # Poseidon2 commitments, the crossover's win side (0.30 s/proof at
        # 2^8). The lose side (p2 at 2^16: 0.84 vs SHA 0.62) is PERF.md-
        # only: its warm wall measured 820 s of tracing — it can never
        # succeed inside a driver-window optional budget, so listing it
        # would only burn the tail (round-5 stage-wall measurements).
        ("proofs_per_sec_2e8_p2", 1 << 8, 10, 420, "fused_p2", True),
    ):
        budget = min(budget, _remaining() - 90)  # keep teardown headroom
        if budget < 120:
            if not optional:
                extra[key] = None
                extra[key + "_error"] = "budget_exhausted"
            continue
        spp, err = _proofs_subprocess(rows, iters, budget, prover)
        if optional and spp is None:
            continue  # optional stages leave no key unless they succeeded
        extra[key] = round(1.0 / spp, 3) if spp else None
        extra[key + "_prover"] = prover
        if err:
            extra[key + "_error"] = err

    # Live CPU leg (drift detection only — vs_baseline uses the PINNED rate
    # so the headline ratio is comparable across rounds; see constant above)
    try:
        cpu_sec = _bench_backend(cpu[0], CPU_LOG_N, iters=3)
        extra["cpu_ntt_ms_2e20_live"] = round(cpu_sec * 1e3, 1)
    except Exception as e:  # noqa: BLE001
        extra["cpu_ntt_ms_2e20_live"] = None
        extra["cpu_leg_error"] = type(e).__name__

    print(
        json.dumps(
            {
                "metric": "ntt_butterflies_per_sec_2e24",
                "value": round(tpu_rate),
                "unit": "butterflies/s/chip",
                "vs_baseline": round(tpu_rate / CPU_RATE_PINNED_BF_S, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--proofs":
        _proofs_stage_main(
            int(sys.argv[2]), int(sys.argv[3]),
            sys.argv[4] if len(sys.argv) > 4 else "fused",
        )
        sys.exit(0)
    sys.exit(main())
