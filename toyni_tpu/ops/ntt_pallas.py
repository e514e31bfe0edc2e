"""Pallas TPU kernel: fused NTT butterfly stages.

The XLA path in `ops.ntt` materializes the whole array between every
butterfly stage (~2 HBM passes per stage). This kernel keeps a (n1, TB)
column tile resident in VMEM and runs ALL log2(n1) stages plus the four-step
twiddle-correction multiply before writing back — 2 HBM passes total per
matrix instead of ~2*log2(n1), the TPU analog of the reference CUDA kernel's
one-launch-per-stage loop (cuda/ntt_kernel.cu:259-265) collapsed into a
single fused launch.

Layout: the transform runs along axis 0 (sublanes); axis 1 is a wide batch
(lanes), so every butterfly is full-width elementwise VPU work. The
bit-reverse row permutation happens outside (one XLA gather pass).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import babybear as bb
from ..field.babybear import P, MONT_R
from .ntt import _bitrev, _twiddle_tables_np, np_powers

_U32 = jnp.uint32


def _stage_tables_padded(n1: int, omega: int) -> np.ndarray:
    """(log_n1, n1/2) matrix: row s-1 = stage-s twiddles tiled across blocks,
    so in-kernel lookup is a static row slice (Montgomery form).

    Stage s has n1/len blocks x half lanes; entry [b*half + j] = w_s[j].
    """
    log_n = n1.bit_length() - 1
    tabs = _twiddle_tables_np(n1, omega)
    out = np.empty((log_n, n1 // 2), np.uint32)
    for s in range(1, log_n + 1):
        half = 1 << (s - 1)
        out[s - 1] = np.tile(tabs[s - 1], n1 // (2 * half))
    return out


def _butterfly_stage(v, tw_row, s: int, n1: int, TB: int):
    """One stage on a (n1, TB) tile. tw_row: (n1/2,) stage twiddles in the
    blocked layout of `_stage_tables_padded`."""
    length = 1 << s
    half = length >> 1
    v = v.reshape(n1 // length, length, TB)
    u = v[:, :half, :]
    w = tw_row.reshape(n1 // length, half)[:, :, None]
    t = bb.mont_mul(v[:, half:, :], w)
    v = jnp.concatenate([bb.add(u, t), bb.sub(u, t)], axis=1)
    return v.reshape(n1, TB)


def _make_kernel(n1: int, TB: int, fuse_w: bool):
    log_n = n1.bit_length() - 1

    def kernel(x_ref, tw_ref, *rest):
        if fuse_w:
            w_ref, o_ref = rest
        else:
            (o_ref,) = rest
        v = x_ref[:]
        for s in range(1, log_n + 1):
            v = _butterfly_stage(v, tw_ref[s - 1, :], s, n1, TB)
        if fuse_w:
            v = bb.mont_mul(v, w_ref[:])
        o_ref[:] = v

    return kernel


# ── roll+select formulation ─────────────────────────────────────────────────
#
# Mosaic crashes on the (blocks, len, TB) reshape/concat butterfly pattern
# (see PERF.md). This variant expresses a stage with NO reshapes: both
# butterfly operands come from whole-tile sublane rotations (pltpu.roll) and
# the +/- halves are picked by an iota bit mask:
#     bit(i, s-1) == 0:  out[i] = v[i] + w_i * v[i + half]
#     bit(i, s-1) == 1:  out[i] = v[i - half] - w_i * v[i]
# with w_i = w_s[i & (half-1)] from a per-stage full-height table. Twice the
# multiplies of the minimal butterfly, but the tile never leaves VMEM — the
# whole transform is 2 HBM passes instead of ~2 per stage.

def _stage_tables_full(n1: int, omega: int) -> np.ndarray:
    """(log_n1, n1) matrix: row s-1 holds w_s[i & (half-1)] for every row i."""
    log_n = n1.bit_length() - 1
    tabs = _twiddle_tables_np(n1, omega)
    out = np.empty((log_n, n1), np.uint32)
    idx = np.arange(n1)
    for s in range(1, log_n + 1):
        half = 1 << (s - 1)
        out[s - 1] = tabs[s - 1][idx & (half - 1)]
    return out


def _make_kernel_roll(n1: int, TB: int, fuse_w: bool):
    log_n = n1.bit_length() - 1

    def kernel(x_ref, tw_ref, *rest):
        if fuse_w:
            w_ref, o_ref = rest
        else:
            (o_ref,) = rest
        v = x_ref[:]
        row = jax.lax.broadcasted_iota(jnp.uint32, (n1, TB), 0)
        for s in range(1, log_n + 1):
            half = 1 << (s - 1)
            tw = tw_ref[s - 1, :].reshape(n1, 1)
            # ONE multiply per stage: t[i] = w_i * v[i], and since the half
            # bit sits above the twiddle-index mask, tw[i+half] == tw[i], so
            # w_i * v[i+half] is just t rolled down by half.
            t = bb.mont_mul_shift(v, tw)
            t_dn = pltpu.roll(t, n1 - half, axis=0)  # t_dn[i] = t[(i+half)%n1]
            u = pltpu.roll(v, half, axis=0)          # u[i] = v[(i-half)%n1]
            bit = (row >> (s - 1)) & jnp.uint32(1)
            v = jnp.where(bit == 0, bb.add(v, t_dn), bb.sub(u, t))
        if fuse_w:
            v = bb.mont_mul_shift(v, w_ref[:])
        o_ref[:] = v

    return kernel


@functools.partial(jax.jit, static_argnames=("fuse_w", "interpret"))
def _ntt_axis0_roll_nobitrev(x2d, tw_mat, w_mat=None, *, fuse_w=False,
                             interpret=False):
    n1, B = x2d.shape
    TB = min(B, 256)
    assert B % TB == 0
    in_specs = [
        pl.BlockSpec((n1, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(tw_mat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x2d, tw_mat]
    if fuse_w:
        in_specs.append(
            pl.BlockSpec((n1, TB), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(w_mat)
    return pl.pallas_call(
        _make_kernel_roll(n1, TB, fuse_w),
        out_shape=jax.ShapeDtypeStruct((n1, B), jnp.uint32),
        grid=(B // TB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n1, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def ntt_axis0_roll(x2d, omega_n1: int, w_mat=None):
    """Roll+select fused-stage NTT along axis 0 of (n1, B); optional fused
    four-step twiddle multiply."""
    n1 = x2d.shape[0]
    interp = _interpret(x2d)
    x2d = jnp.take(x2d, jnp.asarray(_bitrev(n1)), axis=0)
    tw = jnp.asarray(_stage_tables_full(n1, omega_n1))
    if w_mat is not None:
        return _ntt_axis0_roll_nobitrev(x2d, tw, w_mat, fuse_w=True,
                                        interpret=interp)
    return _ntt_axis0_roll_nobitrev(x2d, tw, fuse_w=False, interpret=interp)


def ntt_roll(values: jnp.ndarray, omega: int) -> jnp.ndarray:
    """Four-step NTT built on the roll+select kernels (same contract as
    ops.ntt.ntt)."""
    n = values.shape[0]
    n1, n2, om_col, om_row, W = _four_step_consts(n, omega)
    x2d = values.reshape(n1, n2)
    a = ntt_axis0_roll(x2d, om_col, jnp.asarray(W))
    c = ntt_axis0_roll(a.T, om_row)
    return c.reshape(n)


def _interpret(x=None) -> bool:
    """Pallas interpreter mode off-TPU (tests on the CPU backend). Decides by
    the argument's actual placement when available — in this deployment the
    *default backend* reports tpu even when computation is pinned to CPU."""
    if x is not None:
        try:
            return next(iter(x.devices())).platform != "tpu"
        except Exception:
            pass
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("fuse_w", "interpret"))
def _ntt_axis0_pallas_nobitrev(x2d, tw_mat, w_mat=None, *, fuse_w=False,
                               interpret=False):
    n1, B = x2d.shape
    TB = min(B, 256)
    assert B % TB == 0
    in_specs = [
        pl.BlockSpec((n1, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(tw_mat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x2d, tw_mat]
    if fuse_w:
        in_specs.append(pl.BlockSpec((n1, TB), lambda i: (0, i), memory_space=pltpu.VMEM))
        args.append(w_mat)
    return pl.pallas_call(
        _make_kernel(n1, TB, fuse_w),
        out_shape=jax.ShapeDtypeStruct((n1, B), jnp.uint32),
        grid=(B // TB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n1, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def ntt_axis0_pallas(x2d, omega_n1: int, w_mat=None):
    """Batched NTT along axis 0 of (n1, B), optionally fused with an
    elementwise Montgomery multiply by w_mat (the four-step twiddle matrix)."""
    n1 = x2d.shape[0]
    interp = _interpret(x2d)
    x2d = jnp.take(x2d, jnp.asarray(_bitrev(n1)), axis=0)
    tw = jnp.asarray(_stage_tables_padded(n1, omega_n1))
    if w_mat is not None:
        return _ntt_axis0_pallas_nobitrev(x2d, tw, w_mat, fuse_w=True,
                                          interpret=interp)
    return _ntt_axis0_pallas_nobitrev(x2d, tw, fuse_w=False, interpret=interp)


@functools.lru_cache(maxsize=16)
def _four_step_consts(n: int, omega: int):
    log_n = n.bit_length() - 1
    log_n1 = (log_n + 1) // 2
    n1 = 1 << log_n1
    n2 = n // n1
    # W[k1, j2] = omega^(k1*j2) in Montgomery form
    r1 = np_powers(omega, n1)
    idx = np.arange(n2, dtype=np.uint64)
    W = np.ones((n1, n2), np.uint64)
    sq = r1.copy()
    for b in range(max(1, (n2 - 1).bit_length())):
        bit = (idx >> np.uint64(b)) & np.uint64(1)
        W = np.where(bit[None, :] == 1, W * sq[:, None] % np.uint64(P), W)
        sq = sq * sq % np.uint64(P)
    W = (W * np.uint64(MONT_R) % np.uint64(P)).astype(np.uint32)
    return n1, n2, pow(omega, n2, P), pow(omega, n1, P), W


def ntt_pallas(values: jnp.ndarray, omega: int) -> jnp.ndarray:
    """Full four-step NTT with fused-stage Pallas passes.

    values: (n,) uint32, natural order in, natural order out (the same
    contract as ops.ntt.ntt)."""
    n = values.shape[0]
    n1, n2, om_col, om_row, W = _four_step_consts(n, omega)
    x2d = values.reshape(n1, n2)
    a = ntt_axis0_pallas(x2d, om_col, jnp.asarray(W))  # column DFTs + twiddle
    c = ntt_axis0_pallas(a.T, om_row)                  # row DFTs
    return c.reshape(n)


def intt_pallas(values: jnp.ndarray, omega: int) -> jnp.ndarray:
    n = values.shape[0]
    inv_omega = pow(omega, n - 1, P)
    v = ntt_pallas(values, inv_omega)
    return bb.mul_const(v, pow(n, P - 2, P))
