"""Sweep MXU-v1 NTT vs the XLA four-step across sizes, then prove e2e on
the real TPU with TOYNI_MXU_NTT=1 and verify with the host oracle.

Usage: timeout 1700 python scripts/mxu_sweep.py [sizes_csv] [iters] [rows]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(__file__).rsplit("/", 2)[0])

# Force (not setdefault) the XLA path for the sweep's baseline leg: a
# pre-exported TOYNI_MXU_NTT=1 would make ntt_tables() return MXU tables for
# the "xla" leg too and the sweep would silently report MXU-vs-MXU ~1.00x.
os.environ["TOYNI_MXU_NTT"] = "0"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from toyni_tpu.field.babybear import P, get_root_of_unity
    from toyni_tpu.ops import ntt as ntt_ops
    from toyni_tpu.ops import ntt_mxu

    sizes = [int(s) for s in (sys.argv[1].split(",") if len(sys.argv) > 1
                              else ["20", "21", "22", "25"])]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 16384

    tpu = [d for d in jax.devices() if d.platform == "tpu"]
    dev = tpu[0] if tpu else jax.devices()[0]
    jax.config.update("jax_default_device", dev)
    rng = np.random.default_rng(0)

    def bench(fn, x0, tabs):
        f = jax.jit(lambda v, t: fn(v, t))
        head = np.asarray(f(x0, tabs)[:8], np.uint64)
        t0 = time.perf_counter()
        y = x0
        for _ in range(iters):
            y = f(y, tabs)
        sink = int(np.asarray(y[:8])[0])
        assert 0 <= sink < P
        return (time.perf_counter() - t0) / iters, head

    for ln in sizes:
        n = 1 << ln
        om = get_root_of_unity(ln)
        x0 = jax.device_put(
            jnp.asarray(rng.integers(0, P, n, dtype=np.uint64)
                        .astype(np.uint32)), dev)
        t_x, hx = bench(lambda v, t: ntt_ops.apply_ntt(v, t, n),
                        x0, ntt_ops.ntt_tables(n, om))
        t_m, hm = bench(ntt_mxu.apply_mxu_ntt, x0,
                        ntt_mxu.mxu_ntt_tables(n, om))
        assert np.array_equal(hx, hm), f"mismatch at 2^{ln}"
        gx = (n // 2 * ln) / t_x / 1e9
        gm = (n // 2 * ln) / t_m / 1e9
        print(f"2^{ln}: xla {t_x*1e3:7.2f} ms ({gx:5.1f} Gbf/s)   "
              f"mxu-v1 {t_m*1e3:7.2f} ms ({gm:5.1f} Gbf/s)   "
              f"{t_x/t_m:4.2f}x", flush=True)

    # e2e proof with the MXU path, host-verified (the bit-exactness oracle)
    ntt_ops._MXU_NTT = 1
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.trace import ExecutionTrace
    from toyni_tpu.verifier import StarkVerifier

    fibs, a, b = [], 1, 1
    for _ in range(rows):
        fibs.append(a % P)
        a, b = b, (a + b) % P
    tr = ExecutionTrace()
    tr.insert_column(fibs)
    t0 = time.perf_counter()
    proof = StarkProver(tr, seed=7).generate_proof()
    print(f"e2e MXU proof rows={rows}: first {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    proof = StarkProver(tr, seed=8).generate_proof()
    print(f"e2e MXU proof steady: {time.perf_counter()-t0:.2f}s", flush=True)
    assert StarkVerifier().verify(proof), "MXU-path proof REJECTED"
    print("e2e MXU proof verified OK", flush=True)


if __name__ == "__main__":
    main()
