"""Diagnose where the MXU NTT's time goes at 2^24.

Measures (chained dispatches): a single DFT level on the full array, the
standalone XLA transpose, the W multiply, the full v1 chain — and sweeps
the TB (column tile) knob. Usage: timeout 1700 python scripts/mxu_diag.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(__file__).rsplit("/", 2)[0])


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from toyni_tpu.field import babybear as bb
    from toyni_tpu.field.babybear import P, get_root_of_unity
    from toyni_tpu.ops import ntt_mxu

    dev = [d for d in jax.devices() if d.platform == "tpu"][0]
    jax.config.update("jax_default_device", dev)

    log_n = 24
    n = 1 << log_n
    om = get_root_of_unity(log_n)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(jnp.asarray(
        rng.integers(0, P, n, dtype=np.uint64).astype(np.uint32)), dev)

    def chain(f, x, iters=25, *args):
        np.asarray(f(x, *args))[:1]
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = f(y, *args)
        np.asarray(y.reshape(-1)[:1])
        return (time.perf_counter() - t0) / iters

    tabs = ntt_mxu.mxu_ntt_tables(n, om)
    ml0, W0 = tabs[0]

    # one level alone on (256, 65536)
    m1 = ml0.shape[1]
    x2d = x0.reshape(m1, n // m1)
    lvl = jax.jit(lambda v: ntt_mxu._dft_level(v, ml0))
    t_lvl = chain(lvl, x2d)
    print(f"single level ({m1}x{n//m1}): {t_lvl*1e3:.2f} ms", flush=True)

    # W multiply alone (XLA elementwise, shapes as in _apply_rec)
    m2 = W0.shape[1]
    B = n // (m1 * m2)
    wmul = jax.jit(
        lambda v: bb.mont_mul(v.reshape(m1, m2, -1), W0[:, :, None])
        .reshape(m1, -1)
    )
    print(f"W multiply: {chain(wmul, x2d)*1e3:.2f} ms", flush=True)

    # transpose alone ((m1, m2, B) -> (m2, m1*B)), as in _apply_rec
    tr = jax.jit(
        lambda v: v.reshape(m1, m2, -1).transpose(1, 0, 2).reshape(m1, -1)
    )
    print(f"transpose: {chain(tr, x2d)*1e3:.2f} ms", flush=True)

    # full chain for reference
    full = jax.jit(lambda v, t: ntt_mxu.apply_mxu_ntt(v, t))
    np.asarray(full(x0, tabs)[:1])
    t0 = time.perf_counter()
    y = x0
    for _ in range(25):
        y = full(y, tabs)
    np.asarray(y[:1])
    print(f"full v1 chain: {(time.perf_counter()-t0)/25*1e3:.2f} ms",
          flush=True)

    # TB sweep (re-jit per TB; the knob is read at trace time)
    for tb in (256, 512, 1024, 2048):
        os.environ["TOYNI_MXU_TB"] = str(tb)
        ntt_mxu._tb_cap.cache_clear()
        ntt_mxu._dft_level.clear_cache()  # TB is read at trace time
        lvl_tb = jax.jit(lambda v: ntt_mxu._dft_level(v, ml0))
        try:
            t = chain(lvl_tb, x2d)
            print(f"level TB={tb}: {t*1e3:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"level TB={tb}: FAILED {type(e).__name__}", flush=True)
    os.environ.pop("TOYNI_MXU_TB", None)
    ntt_mxu._tb_cap.cache_clear()


if __name__ == "__main__":
    main()
