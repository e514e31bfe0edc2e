"""A/B: in-kernel software pipelining of the int8 MXU NTT level kernel.

Round-5 probe for the last ~20% of the 2^24 NTT (measured 4.47 ms vs a
~3.7 ms serialized component sum — PERF.md round 4 attributes the residual
to MXU/VPU/HBM overlap INSIDE the kernel, not removable XLA passes). The
round-4 attempts fused away XLA passes (both measured losers); this probe
targets the actual residual: within one (m, TB) tile the 16 int8 dots
(MXU) serialize with digit extraction + signed recombination (VPU). The
pipelined variant processes the tile in S column sub-tiles and ISSUES the
sub-tile k+1 dots before recombining sub-tile k, giving Mosaic's scheduler
two independent chains (MXU of k+1, VPU of k) to overlap.

Usage: timeout 1700 python scripts/ntt_pipeline_probe.py [log_n] [iters]
Prints interleaved A/B timings (default vs pipelined, S in {2, 4}) and
bit-exactness checks. Win-or-retire: adopt into ntt_mxu only on a
reproducible win.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from toyni_tpu.field import babybear as bb
    from toyni_tpu.field.babybear import P, get_root_of_unity
    from toyni_tpu.ops import ntt as ntt_ops
    from toyni_tpu.ops import ntt_mxu as mx

    _U32 = jnp.uint32

    def _level_kernel_i8_pipe(m, TB, fuse_w, S):
        """Pipelined int8 level kernel: S column sub-tiles, dots of sub-tile
        k+1 issued before the recombination of sub-tile k."""
        sub = TB // S

        def kernel(x_ref, ml_ref, *rest):
            if fuse_w:
                w_ref, o_ref = rest
            else:
                (o_ref,) = rest

            def dots(lo):
                xd = mx._extract_digits_i8(x_ref[:, lo:lo + sub])
                c = []
                for k in range(7):
                    ck = None
                    for i in range(4):
                        j = k - i
                        if not (0 <= j <= 3):
                            continue
                        s = jax.lax.dot_general(
                            ml_ref[i], xd[j],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                        ck = s if ck is None else ck + s
                    c.append(ck)
                return c

            def recomb(c, lo):
                acc = mx._recombine_signed(c)
                if fuse_w:
                    acc = bb.mont_mul_shift(acc, w_ref[:, lo:lo + sub])
                o_ref[:, lo:lo + sub] = acc

            # software pipeline: dots(k+1) issued before recomb(k)
            pend = dots(0)
            for k in range(1, S):
                nxt = dots(k * sub)
                recomb(pend, (k - 1) * sub)
                pend = nxt
            recomb(pend, (S - 1) * sub)

        return kernel

    @functools.partial(jax.jit, static_argnames=("fuse_w", "S"))
    def _dft_level_pipe(x2d, ml, w=None, *, fuse_w=False, S=2):
        m, B = x2d.shape
        TB = min(B, mx._tb_cap())
        assert B % TB == 0 and TB % S == 0
        in_specs = [
            pl.BlockSpec((m, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(ml.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [x2d, ml]
        if fuse_w:
            in_specs.append(
                pl.BlockSpec((m, TB), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
            )
            args.append(w)
        return pl.pallas_call(
            _level_kernel_i8_pipe(m, TB, fuse_w, S),
            out_shape=jax.ShapeDtypeStruct((m, B), _U32),
            grid=(B // TB,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((m, TB), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(*args)

    def _apply_rec_pipe(x2d, tabs, level, S):
        m, B = x2d.shape
        ml, W = tabs[level][0], tabs[level][1]
        m1 = ml.shape[1]
        if W is None:
            return _dft_level_pipe(x2d, ml, S=S)
        m2 = m // m1
        y = x2d.reshape(m1, m2 * B)
        if B == 1:
            a = _dft_level_pipe(y, ml, W, fuse_w=True, S=S)
            a = a.reshape(m1, m2, B)
        else:
            a = _dft_level_pipe(y, ml, S=S).reshape(m1, m2, B)
            a = bb.mont_mul(a, W[:, :, None])
        at = a.transpose(1, 0, 2).reshape(m2, m1 * B)
        return _apply_rec_pipe(at, tabs, level + 1, S).reshape(m, B)

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
        dev)
    tabs = jax.device_put(mx.mxu_ntt_tables_i8(n, om), dev)

    base_fn = jax.jit(lambda v, t: mx.apply_mxu_ntt(v, t))
    pipe_fns = {
        S: jax.jit(functools.partial(
            lambda v, t, S: _apply_rec_pipe(v.reshape(n, 1), t, 0, S)
            .reshape(n), S=S))
        for S in (2, 4)
    }

    # bit-exactness first
    want = np.asarray(base_fn(x0, tabs)[:4096])
    for S, fn in pipe_fns.items():
        got = np.asarray(fn(x0, tabs)[:4096])
        assert np.array_equal(want, got), f"pipelined S={S} mismatch"
    print("bit-exact: ok", flush=True)

    def timed(fn):
        y = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(y, tabs)
        _ = int(np.asarray(y[:8])[0])
        return (time.perf_counter() - t0) / iters

    # interleaved A/B (2 rounds) to cancel tunnel drift
    for rnd in range(2):
        t_base = timed(base_fn)
        line = [f"round{rnd}: base {t_base*1e3:.2f} ms"]
        for S, fn in pipe_fns.items():
            t_p = timed(fn)
            line.append(f"S={S} {t_p*1e3:.2f} ms ({t_base/t_p:.3f}x)")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
