"""Profiling + metrics hooks.

The reference has no tracing, counters, or timers at all (survey §5); for a
production proving service these are first-class. Two layers:

* `phase(name)` — lightweight wall-clock phase timers accumulated into a
  process-global registry (`report()` to dump). Used by the prover to
  attribute time to interpolate/LDE/commit/DEEP/FRI/query phases.
* `trace(dir)` — a context manager around `jax.profiler` emitting an XLA
  trace viewable in TensorBoard/Perfetto, for per-kernel analysis against
  speed-of-light.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_timings: dict = defaultdict(lambda: [0.0, 0])
_enabled = True


def enable(flag: bool = True) -> None:
    global _enabled
    _enabled = flag


@contextlib.contextmanager
def phase(name: str):
    """Accumulate wall time under `name`."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        rec = _timings[name]
        rec[0] += time.perf_counter() - t0
        rec[1] += 1


def report(reset: bool = False) -> dict:
    """{phase: {"seconds": total, "calls": n}} snapshot."""
    out = {k: {"seconds": v[0], "calls": v[1]} for k, v in _timings.items()}
    if reset:
        _timings.clear()
    return out


# ── structured counters (dispatches, transfer volume, …) ────────────────────

_counters: dict = defaultdict(int)


def incr(name: str, amount: int = 1) -> None:
    """Bump a named counter (e.g. 'dispatches', 'd2h_bytes'). No-op when
    profiling is disabled."""
    if _enabled:
        _counters[name] += amount


def counters(reset: bool = False) -> dict:
    out = dict(_counters)
    if reset:
        _counters.clear()
    return out


def metrics(reset: bool = False) -> dict:
    """Structured snapshot: phase timers + counters, one dict."""
    return {"phases": report(reset), "counters": counters(reset)}


def metrics_line(reset: bool = True) -> str:
    """One JSON line of per-proof metrics — the machine-readable
    counterpart of `format_report` (emitted by `prove --profile`)."""
    import json

    m = metrics(reset)
    flat = {f"s_{k}": round(v["seconds"], 4) for k, v in m["phases"].items()}
    flat.update(m["counters"])
    return json.dumps({"toyni_metrics": flat}, sort_keys=True)


def format_report(reset: bool = False) -> str:
    rows = sorted(report(reset).items(), key=lambda kv: -kv[1]["seconds"])
    width = max((len(k) for k, _ in rows), default=8)
    lines = [f"{'phase'.ljust(width)}  seconds   calls"]
    for k, v in rows:
        lines.append(f"{k.ljust(width)}  {v['seconds']:8.4f}  {v['calls']:5d}")
    return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace (TensorBoard/Perfetto format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# ── roofline counters ───────────────────────────────────────────────────────

# Peak numbers for TPU v5 lite (v5e), the deployment target. Swap for other
# chips; used only to express measured/estimated rates as a fraction of
# speed-of-light.
V5E_PEAKS = dict(
    hbm_gbps=819.0,        # HBM bandwidth
    bf16_tflops=197.0,     # MXU, bf16
    int8_tops=394.0,       # MXU, int8
)


def cost_summary(fn, *args, static_argnums=()) -> dict:
    """XLA cost analysis of `jit(fn)(*args)`: total flops, HBM bytes
    accessed, arithmetic intensity, and the roofline bound implied by the
    v5e peaks. Works on any backend (analysis happens at compile time) —
    the per-kernel counterpart of the phase timers, answering 'is this
    program compute- or bandwidth-bound, and how far from speed-of-light?'.
    """
    import jax

    lowered = jax.jit(fn, static_argnums=static_argnums).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # some jax versions return [dict]
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    intensity = flops / bytes_accessed if bytes_accessed else float("inf")
    # roofline: time lower-bounded by both the bandwidth and compute limits
    t_mem = bytes_accessed / (V5E_PEAKS["hbm_gbps"] * 1e9)
    t_flop = flops / (V5E_PEAKS["bf16_tflops"] * 1e12)
    bound = "memory" if t_mem >= t_flop else "compute"
    return dict(
        flops=flops,
        bytes_accessed=bytes_accessed,
        arithmetic_intensity=intensity,
        min_seconds_memory=t_mem,
        min_seconds_compute=t_flop,
        roofline_bound=bound,
    )


def roofline(fn, *args, measured_seconds: float | None = None,
             static_argnums=()) -> str:
    """Human-readable roofline line for a jitted program; pass a measured
    steady-state time to get the fraction of speed-of-light achieved."""
    c = cost_summary(fn, *args, static_argnums=static_argnums)
    floor = max(c["min_seconds_memory"], c["min_seconds_compute"])
    line = (
        f"flops={c['flops']:.3e} bytes={c['bytes_accessed']:.3e} "
        f"AI={c['arithmetic_intensity']:.2f} bound={c['roofline_bound']} "
        f"floor={floor*1e3:.3f}ms"
    )
    if measured_seconds is not None and floor > 0:
        line += (
            f" measured={measured_seconds*1e3:.3f}ms "
            f"({floor/measured_seconds:.1%} of speed-of-light)"
        )
    return line
