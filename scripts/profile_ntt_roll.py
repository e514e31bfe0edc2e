"""Component timing for the roll+select four-step NTT path on the real TPU.

Measures, at 2^24 (n1 = n2 = 4096), steady-state chained-dispatch time of:
  - the roll kernel alone (col half, fused W multiply)
  - the roll kernel alone (row half, no W)
  - the bitrev takes / transpose gather alone
  - the full four_step_apply (pallas path)
  - the full four_step_apply (XLA per-stage path, for reference)

Run: JAX_COMPILATION_CACHE_DIR=/root/.cache/jax python scripts/profile_ntt_roll.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np

from toyni_tpu.field.babybear import P, get_root_of_unity
from toyni_tpu.ops import ntt as ntt_ops
from toyni_tpu.ops.ntt_pallas import _ntt_axis0_roll_nobitrev

LOG_N = 24
ITERS = 20


def timed(name, fn, x, *tabs):
    f = jax.jit(fn)
    y = f(x, *tabs)
    y.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = f(y, *tabs)
    np.asarray(jax.device_get(y.ravel()[:1]))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt*1e3:8.2f} ms")
    return dt


def main():
    n = 1 << LOG_N
    omega = get_root_of_unity(LOG_N)
    tabs = ntt_ops.ntt_tables(n, omega)
    colt, rowt, W, twc, twr = tabs
    n1, n2 = W.shape
    print(f"n=2^{LOG_N}  n1={n1} n2={n2}  device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))
    x2d = x.reshape(n1, n2)
    br1 = jnp.asarray(ntt_ops._bitrev(n1))
    br2 = jnp.asarray(ntt_ops._bitrev(n2))

    # full paths (chained on the flat vector)
    timed("four_step pallas (full)", lambda v: ntt_ops.four_step_apply(v, tabs), x)
    timed("four_step XLA (full)",
          lambda v: ntt_ops.four_step_apply(v, (colt, rowt, W)), x)

    # kernel halves, chained on (n1, n2)
    timed("roll kernel col (fuse_w)",
          lambda v: _ntt_axis0_roll_nobitrev(v, twc, W, fuse_w=True), x2d)
    timed("roll kernel row (no w)",
          lambda v: _ntt_axis0_roll_nobitrev(v, twr, fuse_w=False), x2d)

    # data movement only
    timed("bitrev take axis0", lambda v: jnp.take(v, br1, axis=0), x2d)
    timed("transpose+take", lambda v: jnp.take(v.T, br2, axis=0)
          if v.shape[0] == n1 else jnp.take(v.T, br1, axis=0), x2d)


if __name__ == "__main__":
    main()
