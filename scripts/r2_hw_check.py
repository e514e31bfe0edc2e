"""Round-2 hardware isolation: why did apply_ntt-with-device_put-tables
measure 16.6 ms when direct apply_mxu_ntt measures 5.1 ms at 2^24?

Benches four legs in one process:
  A apply_mxu_ntt, raw tables        (the round-1 harness)
  B apply_mxu_ntt, device_put tables
  C apply_ntt dispatch, raw tables
  D apply_ntt dispatch, device_put tables (the round-2 harness)
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

    log_n = 24
    n = 1 << log_n
    om = get_root_of_unity(log_n)
    tpu = [d for d in jax.devices() if d.platform == "tpu"]
    dev = tpu[0]
    jax.config.update("jax_default_device", dev)
    rng = np.random.default_rng(0)
    x0 = jax.device_put(
        jnp.asarray(rng.integers(0, P, n, dtype=np.uint64).astype(np.uint32)),
        dev,
    )
    raw = ntt_mxu.mxu_ntt_tables(n, om)
    put = jax.device_put(raw, dev)

    def bench(name, fn, tabs, iters=20):
        f = jax.jit(lambda v, t: fn(v, t))
        np.asarray(f(x0, tabs)[:8])
        t0 = time.perf_counter()
        y = x0
        for _ in range(iters):
            y = f(y, tabs)
        sink = int(np.asarray(y[:8])[0])
        dt = (time.perf_counter() - t0) / iters
        assert 0 <= sink < P
        print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)

    bench("A apply_mxu_ntt raw", ntt_mxu.apply_mxu_ntt, raw)
    bench("B apply_mxu_ntt device_put", ntt_mxu.apply_mxu_ntt, put)
    bench("C apply_ntt raw", lambda v, t: ntt_ops.apply_ntt(v, t, n), raw)
    bench("D apply_ntt device_put",
          lambda v, t: ntt_ops.apply_ntt(v, t, n), put)


if __name__ == "__main__":
    main()
