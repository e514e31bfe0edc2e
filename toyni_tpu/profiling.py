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
