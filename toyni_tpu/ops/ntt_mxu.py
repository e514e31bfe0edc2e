"""MXU-path NTT: DFT levels as exact bf16 limb matmuls (Pallas kernels).

The VPU four-step (ops/ntt.py) is HBM-bound: ~12 butterfly passes over the
array at 2^24. This module reformulates the transform so the FLOPs land on
the MXU (systolic array) instead: factor n into levels of size <= 256 and
apply each level as a dense DFT matrix multiply

    out[k, b] = sum_j M[k, j] * x[j, b]   mod p,   M[k, j] = omega_m^{jk}

The modular matmul itself is built from EXACT bf16 matmuls: split both the
matrix and the data into 8-bit limbs (4 each), take the 16 limb-pair
products on the MXU with f32 accumulation — every product <= 255^2 and
every 256-term sum <= 255^2*256 = 16_646_400 < 2^24, so f32 arithmetic is
exact — then recombine sum_k c_k * 2^(8k) mod p with 7 Montgomery
multiplies per output element on the VPU. A whole level is ONE Pallas pass:
read tile, 16 dots in VMEM, recombine, write. (The same decomposition as an
XLA einsum was measured at 4.7 ms/level at 2^24 — the (16, n) int32 limb
products round-trip through HBM; keeping them tile-resident is the point of
the kernel. See PERF.md "MXU NTT prototype".)

Level structure is the four-step recursion (same index algebra as
ops/ntt.py's `four_step_apply`, tested against it): natural order in,
natural order out, twiddle corrections W[k1, j2] between levels. This
replaces butterfly stages entirely — no bit-reversal permutations anywhere.

Reference analog: the CUDA kernel's per-stage butterflies
(cuda/ntt_kernel.cu:119-137) — re-mapped from SIMT butterflies to systolic
matmuls, the TPU's native compute shape.

This is the DEFAULT accelerated path on TPU targets since round 2 — v1 (the
four-step recursion over these kernels) measured 5.14 ms vs 6.37 ms for the
XLA four-step at 2^24 (PERF.md). Override with TOYNI_MXU_NTT=0 (force the
XLA four-step), =1 (force v1), =2 (the fully-fused transposed-output chain;
interpret/2-level-only on hardware). CPU targets always use XLA — these
kernels would run in Pallas interpret mode there.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import babybear as bb
from ..field.babybear import MONT_R, P
from .ntt import np_powers

_U32 = jnp.uint32

# constants for the 96-bit recombination: x * 2^32 mod p = mont_mul(x, R^2)
# (R^2 = 2^64 mod p; mont_mul divides by R = 2^32), x * 2^64 mod p =
# mont_mul(x, 2^96 mod p)
_C32 = (1 << 64) % P
_C64 = (1 << 96) % P


def _dft_matrix_np(m: int, omega_m: int) -> np.ndarray:
    """(m, m) u32 DFT matrix M[k, j] = omega_m^(jk) (standard form)."""
    pw = np_powers(omega_m, m)  # omega^0..omega^(m-1)
    jk = (np.outer(np.arange(m, dtype=np.int64), np.arange(m, dtype=np.int64))
          % m)
    return pw[jk].astype(np.uint32)


def _limbs_bf16_np(mat: np.ndarray) -> np.ndarray:
    """(4, m, m) bf16 8-bit limbs of a u32 matrix (values 0..255, exact)."""
    import ml_dtypes

    limbs = np.stack([(mat >> (8 * i)) & 0xFF for i in range(4)])
    return limbs.astype(ml_dtypes.bfloat16)


def _digits_i8_np(mat: np.ndarray) -> np.ndarray:
    """(4, m, m) int8 BALANCED base-256 digits of a u32 matrix: digits in
    [-128, 127] with value = sum_i d_i * 256^i (exact; representable for all
    values < 2^31 - 2^24, which covers BabyBear). Feeds the int8 MXU path —
    the systolic array runs int8 x int8 -> int32 at 2x the bf16 rate
    (394 vs 197 T(FL)OPS on v5e) and int32 accumulation is exact for the
    256-term digit-product sums (|sum| <= 4 * 128^2 * 256 = 2^24)."""
    v = mat.astype(np.int64)
    digs = []
    carry = np.zeros_like(v)
    for i in range(4):
        l = ((v >> (8 * i)) & 0xFF) + carry
        carry = (l >= 128).astype(np.int64)
        digs.append(l - (carry << 8))
    out = np.stack(digs)
    assert out.min() >= -128 and out.max() <= 127
    return out.astype(np.int8)


def _level_kernel(m: int, TB: int, fuse_w: bool):
    def kernel(x_ref, ml_ref, *rest):
        if fuse_w:
            w_ref, o_ref = rest
        else:
            (o_ref,) = rest
        x = x_ref[:]  # (m, TB) u32
        # Mosaic has no direct u32->bf16 cast; hop via i32->f32 (limb values
        # are 0..255, exact at every step)
        xb = [
            ((x >> _U32(8 * j)) & _U32(0xFF))
            .astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            for j in range(4)
        ]
        # c_k = sum_{i+j=k} M_i @ X_j, exact in f32 (<= 2^24 per dot, < 2^27
        # summed) — accumulate per weight group so only one (m, TB) f32
        # intermediate is live per group
        c = []
        for k in range(7):
            ck = None
            for i in range(4):
                j = k - i
                if not (0 <= j <= 3):
                    continue
                s = jax.lax.dot_general(
                    ml_ref[i], xb[j],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ck = s if ck is None else ck + s
            c.append(ck.astype(jnp.int32).astype(_U32))

        # recombine V = sum_k c_k * 2^(8k)  (V < 2^75) as a 3-word integer
        # (w0, w1, w2) with explicit carries, then V mod p with TWO
        # Montgomery multiplies: V = w0 + w1*2^32 + w2*2^64.
        s01 = c[0] + (c[1] << 8)
        car01 = (s01 < c[0]).astype(_U32)
        hi23 = c[3] << 24
        s23 = (c[2] << 16) + hi23
        car23 = (s23 < hi23).astype(_U32)
        w0 = s01 + s23
        car_w0 = (w0 < s01).astype(_U32) + car01 + car23

        u = c[4] + (c[5] << 8)
        car_u = (u < c[4]).astype(_U32)
        small = (c[1] >> 24) + (c[2] >> 16) + (c[3] >> 8) + car_w0
        hi6 = c[6] << 16
        t = hi6 + small
        car_t = (t < hi6).astype(_U32)
        w1 = u + t
        car_w1 = (w1 < u).astype(_U32)
        w2 = (c[5] >> 24) + (c[6] >> 16) + car_u + car_t + car_w1

        r0 = jnp.where(w0 >= _U32(P), w0 - _U32(P), w0)
        r0 = jnp.where(r0 >= _U32(P), r0 - _U32(P), r0)
        # mont_mul_shift: 4 multiplies per lane instead of 10 — worthwhile
        # only inside fused compute-bound kernels like this one (PERF.md)
        acc = bb.add(
            bb.add(r0, bb.mont_mul_shift(w1, _U32(_C32))),
            bb.mont_mul_shift(w2, _U32(_C64)),
        )
        if fuse_w:
            acc = bb.mont_mul_shift(acc, w_ref[:])
        o_ref[:] = acc

    return kernel


def _extract_digits_i8(x):
    """u32 (m, TB) tile -> 4 int8 (m, TB) balanced base-256 digit planes
    (the in-kernel counterpart of `_digits_i8_np`)."""
    v = x.astype(jnp.int32)
    ds = []
    carry = None
    for i in range(4):
        l = (v >> (8 * i)) & 255
        if carry is not None:
            l = l + carry
        c = (l >= 128).astype(jnp.int32)
        ds.append((l - (c << 8)).astype(jnp.int8))
        carry = c
    return ds


def _recombine_signed(c):
    """V = sum_k c_k 2^(8k) mod p for 7 SIGNED int32 words (|c_k| <= 2^24,
    V in [0, 2^75)): exact 3-word two's-complement accumulation — each
    signed term is sign-extended across the 96-bit window, word sums track
    carries, and V mod p finishes with the same two Montgomery multiplies
    as the unsigned (bf16-path) recombination."""
    bc = lambda t: jax.lax.bitcast_convert_type(t, jnp.uint32)  # noqa: E731
    sign = lambda t: bc(t >> 31)  # noqa: E731 — 0 or 0xFFFFFFFF

    los, mids, highs = [], [], []
    for k, ck in enumerate(c):
        sh = 8 * k
        if sh == 0:
            los.append(bc(ck))
            mids.append(sign(ck))
            highs.append(sign(ck))
        elif sh < 32:
            los.append(bc(ck) << sh)
            mids.append(bc(ck >> (32 - sh)))     # arithmetic shift
            highs.append(sign(ck))
        elif sh == 32:
            mids.append(bc(ck))
            highs.append(sign(ck))
        else:
            s2 = sh - 32
            mids.append(bc(ck) << s2)
            highs.append(bc(ck >> (32 - s2)))

    def acc(words):
        total = words[0]
        carry = None
        for wrd in words[1:]:
            nt = total + wrd
            cb = (nt < total).astype(_U32)
            carry = cb if carry is None else carry + cb
            total = nt
        return total, carry

    w0, c0 = acc(los)
    w1, c1 = acc(mids + [c0])
    w2, _ = acc(highs + [c1])

    r0 = jnp.where(w0 >= _U32(P), w0 - _U32(P), w0)
    r0 = jnp.where(r0 >= _U32(P), r0 - _U32(P), r0)
    return bb.add(
        bb.add(r0, bb.mont_mul_shift(w1, _U32(_C32))),
        bb.mont_mul_shift(w2, _U32(_C64)),
    )


def _level_kernel_i8(m: int, TB: int, fuse_w: bool):
    """int8-MXU level kernel: balanced-digit dot products with int32
    accumulation (2x the bf16 MXU rate), signed 3-word recombination."""

    def kernel(x_ref, ml_ref, *rest):
        if fuse_w:
            w_ref, o_ref = rest
        else:
            (o_ref,) = rest
        xd = _extract_digits_i8(x_ref[:])  # 4 x int8 (m, TB)
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
        acc_val = _recombine_signed(c)
        if fuse_w:
            acc_val = bb.mont_mul_shift(acc_val, w_ref[:])
        o_ref[:] = acc_val

    return kernel


@functools.lru_cache(maxsize=1)
def _tb_cap() -> int:
    """Column-tile width cap (lanes per kernel invocation). Default 512;
    tune with TOYNI_MXU_TB (VMEM-cliff exploration on hardware without code
    edits — the roll kernel sat on such a cliff either side of 256)."""
    import os

    try:
        tb = int(os.environ.get("TOYNI_MXU_TB", "512"))
    except ValueError:
        tb = 512
    if tb < 128 or tb & (tb - 1):
        import warnings

        warnings.warn(
            f"TOYNI_MXU_TB={tb!r} must be a power of two >= 128; using 512"
        )
        tb = 512
    return tb


def _interpret() -> bool:
    try:
        d = jax.config.jax_default_device
        if d is not None:
            return d.platform != "tpu"
    except Exception:
        pass
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("fuse_w", "interpret"))
def _dft_level(x2d, ml, w=None, *, fuse_w=False, interpret=False):
    """One DFT level along axis 0 of (m, B) u32, optional fused Montgomery
    multiply by w (the four-step twiddle correction, same shape)."""
    m, B = x2d.shape
    TB = min(B, _tb_cap())
    assert B % TB == 0
    in_specs = [
        pl.BlockSpec((m, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(ml.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x2d, ml]
    if fuse_w:
        in_specs.append(
            pl.BlockSpec((m, TB), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(w)
    kern = (
        _level_kernel_i8(m, TB, fuse_w) if ml.dtype == jnp.int8
        else _level_kernel(m, TB, fuse_w)
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, B), _U32),
        grid=(B // TB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _level_t_kernel(m: int, TB: int, fuse_w: bool, i8: bool = False):
    """Transposed-output variant: the (m, TB) result tile is written as
    (TB, m) — the level's global transpose happens inside the kernel, so
    the chain needs NO standalone XLA transpose passes between levels."""
    inner = (_level_kernel_i8 if i8 else _level_kernel)(m, TB, fuse_w)

    def kernel(x_ref, ml_ref, *rest):
        o_ref = rest[-1]

        class _T:
            def __setitem__(self, _slc, v):
                o_ref[:] = v.T

        inner(x_ref, ml_ref, *rest[:-1], _T())

    return kernel


@functools.partial(jax.jit, static_argnames=("fuse_w", "interpret"))
def _dft_level_t(x2d, ml, w=None, *, fuse_w=False, interpret=False):
    """One DFT level along axis 0 of (m, C) u32 with TRANSPOSED output
    (C, m): out[c, k] = (M @ x)[k, c] (optionally * w[k, c], Montgomery)."""
    m, C = x2d.shape
    TB = min(C, _tb_cap())
    assert C % TB == 0
    in_specs = [
        pl.BlockSpec((m, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(ml.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x2d, ml]
    if fuse_w:
        in_specs.append(
            pl.BlockSpec((m, TB), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        args.append(w)
    return pl.pallas_call(
        _level_t_kernel(m, TB, fuse_w, i8=ml.dtype == jnp.int8),
        out_shape=jax.ShapeDtypeStruct((C, m), _U32),
        grid=(C // TB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _factor_levels(n: int) -> list:
    """Split n into four-step levels: the fewest levels with every size
    <= 256 (the f32-exactness bound — 255^2 * 256 < 2^24), BALANCED.

    Balanced beats greedy-256s because every level costs one full HBM pass
    regardless of its size, but a tiny trailing level wastes the vector
    unit: greedy 2^25 -> [256, 256, 256, 2] measured 0.74x vs the XLA
    four-step (a (2, TB) tile uses 2 of 8 sublanes); balanced 2^25 ->
    [128, 64, 64, 64] keeps every matmul MXU-shaped at the same level
    count."""
    log = n.bit_length() - 1
    L = max(1, -(-log // 8))
    base, extra = divmod(log, L)
    return [1 << (base + (1 if i < extra else 0)) for i in range(L)]


@functools.lru_cache(maxsize=16)
def _mxu_tables_np(n: int, omega: int):
    """Per-level constants: [(m1, m2, M_limbs bf16, W mont | None), ...]
    walking the recursion outside-in; the last entry is the leaf DFT."""
    levels = _factor_levels(n)
    out = []
    om = omega
    m = n
    for li, m1 in enumerate(levels):
        if li == len(levels) - 1:
            out.append((m1, 1, _limbs_bf16_np(_dft_matrix_np(m1, om)), None))
            break
        m2 = m // m1
        om_col = pow(om, m2, P)  # omega_{m1}
        # W[k1, j2] = om^(k1*j2), Montgomery form
        r1 = np_powers(om, m1)
        idx = np.arange(m2, dtype=np.uint64)
        W = np.ones((m1, m2), np.uint64)
        sq = r1.copy()
        for b in range(max(1, (m2 - 1).bit_length())):
            bit = (idx >> np.uint64(b)) & np.uint64(1)
            W = np.where(bit[None, :] == 1, W * sq[:, None] % np.uint64(P), W)
            sq = sq * sq % np.uint64(P)
        W = (W * np.uint64(MONT_R) % np.uint64(P)).astype(np.uint32)
        out.append((m1, m2, _limbs_bf16_np(_dft_matrix_np(m1, om_col)), W))
        om = pow(om, m1, P)
        m = m2
    return tuple(out)


# Expanded-W tables (W repeated across the accumulated batch so middle
# levels can FUSE the twiddle multiply into the kernel) cost ~n u32 of HBM
# per middle level; cap them to bench-scale sizes so protocol-ceiling
# transforms (2^26+) don't spend a GB of HBM on tables.
_W_EXPAND_MAX = 1 << 25


@functools.lru_cache(maxsize=16)
def mxu_ntt_tables(n: int, omega: int):
    """Device-resident level tables — pass INTO jitted programs as an
    argument (PERF.md rule 2).

    Each entry is (M_limbs bf16, W | None, W_expanded | None): W is the
    (m1, m2) twiddle matrix (batched path + fallbacks), W_expanded repeats
    each twiddle across the level's accumulated batch columns so the v1
    chain can fuse the multiply into the level kernel (round 4: one fewer
    full elementwise HBM pass per middle level)."""
    base = _mxu_tables_np(n, omega)
    out = []
    batch = 1
    with jax.ensure_compile_time_eval():
        for (m1, m2, ml, W) in base:
            if W is None:
                out.append((jnp.asarray(ml), None, None))
                break
            if batch == 1 or not _fuse_mode():
                w_exp = None  # level 0's W is already kernel-shaped
            elif n <= _W_EXPAND_MAX:
                exp = np.broadcast_to(
                    W[:, :, None], (m1, m2, batch)
                ).reshape(m1, m2 * batch)
                w_exp = jnp.asarray(np.ascontiguousarray(exp))
            else:
                w_exp = None
            out.append((jnp.asarray(ml), jnp.asarray(W), w_exp))
            batch *= m1
    return tuple(out)


@functools.lru_cache(maxsize=16)
def mxu_ntt_tables_i8(n: int, omega: int):
    """Level tables with int8 balanced-digit DFT matrices (the int8 MXU
    variant, TOYNI_MXU_NTT=3): same recursion/W tables, matrices re-encoded
    so the dots run on the 394-TOPS int8 systolic path."""
    base = _mxu_tables_np(n, omega)
    levels = _factor_levels(n)
    om = omega
    out = []
    batch = 1
    with jax.ensure_compile_time_eval():
        for li, (m1, m2, _ml, W) in enumerate(base):
            if li == len(levels) - 1:
                mat = _dft_matrix_np(m1, om)
            else:
                mat = _dft_matrix_np(m1, pow(om, m2, P))
            if (W is None or batch == 1 or n > _W_EXPAND_MAX
                    or not _fuse_mode()):
                w_exp = None
            else:
                exp = np.broadcast_to(
                    W[:, :, None], (m1, m2, batch)
                ).reshape(m1, m2 * batch)
                w_exp = jnp.asarray(np.ascontiguousarray(exp))
            out.append((
                jnp.asarray(_digits_i8_np(mat)),
                None if W is None else jnp.asarray(W),
                w_exp,
            ))
            om = pow(om, m1, P)
            batch *= m1
    return tuple(out)


@functools.partial(jax.jit, static_argnames=("sizes", "interpret"))
def _dft_level_final(x2d, ml, *, sizes, interpret=False):
    """Last level with the digit-reversal fused into the OUTPUT block map.

    Input (m_L, C), C = m1*...*m_{L-1}, columns ordered (k1, ..., k_{L-1})
    with k1 most significant. Output is the natural-order cube
    (m_L, m_{L-1}, ..., m_1) flattened to (n,): each grid step computes one
    (m_L, m_{L-1}) tile — a fixed tuple of the higher digits — and writes it
    at block coordinates (0, 0, k_{L-2}, ..., k_1). No transpose anywhere,
    in or out of the kernel; the tile IS the natural (k_L, k_{L-1}) slab."""
    sizes = tuple(sizes)
    L = len(sizes)
    m = sizes[-1]
    assert L >= 2 and x2d.shape[0] == m
    TB = sizes[-2]
    digit_sizes = sizes[:-2]  # (m1, ..., m_{L-2}), k1 most significant
    grid = 1
    for s in digit_sizes:
        grid *= s
    out_shape = tuple(reversed(sizes))
    block = (m, TB) + (1,) * (L - 2)
    # place value of each digit (k1 first)
    places = []
    acc = 1
    for s in reversed(digit_sizes):
        places.append(acc)
        acc *= s
    places = list(reversed(places))

    def imap(i):
        digs = []
        rest = i
        for pv in places:
            digs.append(rest // pv)
            rest = rest % pv
        return (0, 0) + tuple(reversed(digs))

    base = _level_kernel(m, TB, False)

    def kernel(x_ref, ml_ref, o_ref):
        class _W:
            def __setitem__(self, _slc, v):
                o_ref[:] = v.reshape(block)

        base(x_ref, ml_ref, _W())

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, _U32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((m, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(ml.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, imap, memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x2d, ml).reshape(-1)


@functools.lru_cache(maxsize=16)
def mxu_ntt_tables_t(n: int, omega: int):
    """Tables for the fully-fused (transposed-output) chain: per level
    (M_limbs bf16, W expanded to the level's full column width | None).
    Expanded W repeats each twiddle across the accumulated batch columns so
    the in-kernel fused multiply sees a same-shape tile."""
    base = _mxu_tables_np(n, omega)
    out = []
    batch = 1
    m = n
    with jax.ensure_compile_time_eval():
        for (m1, m2, ml, W) in base:
            if W is None:
                out.append((jnp.asarray(ml), None))
                break
            exp = np.broadcast_to(W[:, :, None], (m1, m2, batch))
            out.append(
                (jnp.asarray(ml), jnp.asarray(exp.reshape(m1, m2 * batch)))
            )
            batch *= m1
            m = m2
    return tuple(out)


def apply_mxu_ntt_t(values: jnp.ndarray, tabs) -> jnp.ndarray:
    """Forward NTT via transposed-output MXU levels: every level is ONE
    Pallas pass (DFT matmul + fused twiddle + in-kernel transpose), and the
    final digit reversal is fused into the last level's output block map —
    zero XLA transposes end to end. Same contract as `apply_mxu_ntt`
    (bit-identical; tested).

    REAL-TPU LIMITATION (measured 2026-08): for >=3-level sizes (n > 2^16)
    the fused digit-reversal output block is (m_L, m_{L-1}, 1, ...) and
    Mosaic requires the last two block dims divisible by (8, 128) or equal
    to the array dims — the final `_dft_level_final` does not lower. Any
    other layout either isn't the natural flat order or needs the very XLA
    transpose this path exists to avoid. Use v1 (`apply_mxu_ntt`) on
    hardware — it beats the XLA four-step (5.1 vs 6.4 ms at 2^24); v2 runs
    everywhere in interpret mode and on TPU for 2-level sizes."""
    n = values.shape[0]
    interpret = _interpret()
    sizes = [ml.shape[1] for ml, _ in tabs]
    L = len(sizes)
    v = values.reshape(sizes[0], n // sizes[0])
    if L == 1:
        return _dft_level_t(v, tabs[0][0], interpret=interpret).reshape(n)
    for li in range(L - 1):
        ml, W = tabs[li]
        m = sizes[li]
        v = v.reshape(m, n // m)
        v = _dft_level_t(v, ml, W, fuse_w=True, interpret=interpret)
    ml_last = tabs[-1][0]
    return _dft_level_final(
        v.reshape(sizes[-1], n // sizes[-1]), ml_last,
        sizes=tuple(sizes), interpret=interpret,
    )


def mxu_ntt_t(values: jnp.ndarray, omega: int) -> jnp.ndarray:
    return apply_mxu_ntt_t(
        values, mxu_ntt_tables_t(values.shape[0], omega)
    )


@functools.lru_cache(maxsize=1)
def _fuse_mode() -> int:
    """TOYNI_MXU_FUSE: 0 (default) = the round-3 pass structure, 1 = the
    round-4 fused passes (transposed level-0 output + expanded-W twiddle
    fusion). Measured on v5e at 2^24 (interleaved A/B, 30-iter chains):
    fused is reproducibly ~2% SLOWER (5.30/5.33 vs 5.20/5.21 ms) — the
    XLA transpose/mont_mul passes it removes were overlapping with
    compute, and the in-kernel transposed writes cost more than they
    save. Kept opt-in for re-evaluation on other TPU generations."""
    import os

    try:
        return int(os.environ.get("TOYNI_MXU_FUSE", "0"))
    except ValueError:
        return 0


def _apply_rec(x2d, tabs, level: int, interpret: bool):
    """Transform along axis 0 of (m, B); natural order in and out.

    Round-4 pass structure (each bullet is one HBM round trip):
    * B == 1 (the single-vector chain's first level): transposed-output
      kernel with fused W — the level's global transpose happens in the
      kernel's output block map, so the XLA transpose pass between level 0
      and 1 is GONE (was ~2.1 ms isolated at 2^24).
    * middle levels with an expanded-W table: kernel with fused W — the
      separate XLA mont_mul pass is gone; only the (m1,m2,B)->(m2,m1*B)
      transpose remains.
    * fallback (int8 tables, 2-entry tables, W_EXPAND_MAX exceeded): the
      round-1..3 unfused sequence."""
    m, B = x2d.shape
    entry = tabs[level]
    ml, W = entry[0], entry[1]
    W_exp = entry[2] if len(entry) > 2 else None
    m1 = ml.shape[1]
    if W is None:
        return _dft_level(x2d, ml, interpret=interpret)
    m2 = m // m1
    y = x2d.reshape(m1, m2 * B)
    fuse = _fuse_mode()
    if fuse and B == 1:
        # (m2, m1) transposed output IS the next level's input layout
        at = _dft_level_t(y, ml, W, fuse_w=True, interpret=interpret)
    else:
        if B == 1:
            a = _dft_level(y, ml, W, fuse_w=True, interpret=interpret)
            a = a.reshape(m1, m2, B)
        elif fuse and W_exp is not None and W_exp.shape[1] == m2 * B:
            # (width check: a data batch — apply_mxu_ntt_batched — widens B
            # beyond the accumulated-batch layout W_exp was built for)
            a = _dft_level(y, ml, W_exp, fuse_w=True, interpret=interpret)
            a = a.reshape(m1, m2, B)
        else:
            a = _dft_level(y, ml, interpret=interpret).reshape(m1, m2, B)
            a = bb.mont_mul(a, W[:, :, None])
        at = a.transpose(1, 0, 2).reshape(m2, m1 * B)
    c = _apply_rec(at, tabs, level + 1, interpret)
    # c rows are k2 with column blocks (k1, B); flat order k2*m1 + k1 ✓
    return c.reshape(m, B)


def apply_mxu_ntt(values: jnp.ndarray, tabs) -> jnp.ndarray:
    """Forward NTT of a flat (n,) u32 vector via MXU DFT levels — same
    contract as ops.ntt.apply_ntt (natural in, natural out)."""
    n = values.shape[0]
    interpret = _interpret()
    return _apply_rec(values.reshape(n, 1), tabs, 0, interpret).reshape(n)


def apply_mxu_ntt_batched(values: jnp.ndarray, tabs) -> jnp.ndarray:
    """(B, n) batched forward NTT via the MXU levels. The batch rides as
    extra lanes of every level's matmul (the recursion transforms along
    axis 0 and treats columns as batch), so one kernel pass per level covers
    the whole batch — no vmap over pallas_call."""
    return _apply_rec(values.T, tabs, 0, _interpret()).T


def mxu_ntt(values: jnp.ndarray, omega: int) -> jnp.ndarray:
    return apply_mxu_ntt(values, mxu_ntt_tables(values.shape[0], omega))


def mxu_intt(values: jnp.ndarray, omega: int) -> jnp.ndarray:
    n = values.shape[0]
    inv_omega = pow(omega, n - 1, P)
    v = mxu_ntt(values, inv_omega)
    return bb.mul_const(v, pow(n, P - 2, P))
