"""A/B the NTT formulations on the real TPU at 2^24 (and the fused prover).

Usage:  timeout 1700 python scripts/mxu_bench.py [log_n] [iters]

Measures, with chained dispatches + one host read (PERF.md methodology):
  * XLA VPU four-step (forced via _MXU_NTT=0)
  * MXU v1 (ops/ntt_mxu.apply_mxu_ntt — bf16 recursion, XLA transposes)
  * the env-selected default path (int8 balanced-digit tables on TPU)
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
    import jax.numpy as jnp

    from toyni_tpu.field.babybear import P, get_root_of_unity
    from toyni_tpu.ops import ntt as ntt_ops
    from toyni_tpu.ops import ntt_mxu

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    n = 1 << log_n
    om = get_root_of_unity(log_n)
    tpu = [d for d in jax.devices() if d.platform == "tpu"]
    dev = tpu[0] if tpu else jax.devices()[0]
    jax.config.update("jax_default_device", dev)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        jnp.asarray(rng.integers(0, P, n, dtype=np.uint64).astype(np.uint32)),
        dev,
    )

    def bench(name, fn, tabs):
        f = jax.jit(lambda v, t: fn(v, t))
        ref = np.asarray(f(x0, tabs)[:8], np.uint64)  # warm-up + correctness probe
        t0 = time.perf_counter()
        y = x0
        for _ in range(iters):
            y = f(y, tabs)
        sink = int(np.asarray(y[:8])[0])
        dt = (time.perf_counter() - t0) / iters
        assert 0 <= sink < P
        gbf = (n // 2 * log_n) / dt / 1e9
        print(f"{name:14s} {dt*1e3:8.2f} ms   {gbf:7.1f} Gbf/s   head={ref[:4]}",
              flush=True)
        return dt

    # force the XLA path for the baseline row regardless of the MXU
    # default/env (ntt_tables would otherwise hand back MXU tables and the
    # row would just re-measure v1)
    saved = ntt_ops._MXU_NTT
    ntt_ops._MXU_NTT = 0
    xla_tabs = ntt_ops.ntt_tables(n, om)
    t_xla = bench("xla-four-step", lambda v, t: ntt_ops.apply_ntt(v, t, n), xla_tabs)
    ntt_ops._MXU_NTT = saved
    v1_tabs = ntt_mxu.mxu_ntt_tables(n, om)
    t_v1 = bench("mxu-v1", ntt_mxu.apply_mxu_ntt, v1_tabs)
    # the ACTIVE env-selected accelerated path (TOYNI_MXU_NTT / _FUSE knobs
    # — e.g. =3 benches the int8 balanced-digit tables here)
    if ntt_ops._mxu_ntt_variant() not in (0, 1):
        env_tabs = ntt_ops.ntt_tables(n, om)
        bench("env-path", lambda v, t: ntt_ops.apply_ntt(v, t, n), env_tabs)
    # correctness cross-check on device output heads
    a = np.asarray(jax.jit(lambda v, t: ntt_ops.apply_ntt(v, t, n))(x0, xla_tabs)[:128])
    b = np.asarray(jax.jit(ntt_mxu.apply_mxu_ntt)(x0, v1_tabs)[:128])
    assert np.array_equal(a, b), "formulations disagree"
    print(f"speedup v1 {t_xla/t_v1:.2f}x")


if __name__ == "__main__":
    main()
