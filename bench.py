"""Benchmark: NTT butterfly throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric (BASELINE.md): butterflies/sec/chip for a 2^24-point BabyBear
NTT — the kernel the reference accelerates with CUDA (cuda/ntt_kernel.cu).
The reference publishes no numbers, so `vs_baseline` reports the speedup over
this framework's own CPU execution of the identical computation (the
reference's CPU-vs-accelerator comparison, src/ntt.rs:264-287, in spirit).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

LOG_N = 24
CPU_LOG_N = 20  # CPU comparison size (same op, smaller for time), scaled


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

    # Pin the default device so backend-conditional paths (the Pallas
    # fused-stage kernel is TPU-only) resolve for THIS device at trace time.
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

    # CPU comparison at a feasible size; butterflies/sec is size-normalized
    cpu_sec = _bench_backend(cpu[0], CPU_LOG_N, iters=3)
    cpu_n = 1 << CPU_LOG_N
    cpu_rate = (cpu_n // 2 * CPU_LOG_N) / cpu_sec

    print(
        json.dumps(
            {
                "metric": "ntt_butterflies_per_sec_2e24",
                "value": round(tpu_rate),
                "unit": "butterflies/s/chip",
                "vs_baseline": round(tpu_rate / cpu_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
