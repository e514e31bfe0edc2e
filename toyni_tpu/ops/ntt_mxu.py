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

This is the DEFAULT accelerated path on TPU targets since round 2 (the int8
balanced-digit variant since round 4: 4.47 ms / 45.0 Gbf/s at 2^24 vs 5.2
bf16 and 6.3 XLA). Override with TOYNI_MXU_NTT=0 (force the XLA four-step)
or =1 (force the bf16 limb variant). CPU targets always use XLA — these
kernels would run in Pallas interpret mode there.

Retired experiment residue (round 5, win-or-retire rule — git history keeps
the code, PERF.md keeps the measurements): TOYNI_MXU_NTT=2 (the fully-fused
transposed-output chain — could not lower for >=3-level sizes on hardware
and had no batched path) and TOYNI_MXU_FUSE=1 (transposed level-0 output +
expanded-W twiddle fusion — reproducibly ~2% SLOWER than the unfused
structure in interleaved A/Bs at 2^24; the XLA passes it removed were
overlapping with compute).
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


@functools.lru_cache(maxsize=16)
def mxu_ntt_tables(n: int, omega: int):
    """Device-resident level tables — pass INTO jitted programs as an
    argument (PERF.md rule 2). Each entry is (M_limbs bf16, W | None):
    W is the (m1, m2) four-step twiddle matrix (None on the leaf level)."""
    base = _mxu_tables_np(n, omega)
    out = []
    with jax.ensure_compile_time_eval():
        for (m1, m2, ml, W) in base:
            if W is None:
                out.append((jnp.asarray(ml), None))
                break
            out.append((jnp.asarray(ml), jnp.asarray(W)))
    return tuple(out)


@functools.lru_cache(maxsize=16)
def mxu_ntt_tables_i8(n: int, omega: int):
    """Level tables with int8 balanced-digit DFT matrices (the DEFAULT TPU
    variant since round 4): same recursion/W tables, matrices re-encoded
    so the dots run on the 394-TOPS int8 systolic path."""
    base = _mxu_tables_np(n, omega)
    levels = _factor_levels(n)
    om = omega
    out = []
    with jax.ensure_compile_time_eval():
        for li, (m1, m2, _ml, W) in enumerate(base):
            if li == len(levels) - 1:
                mat = _dft_matrix_np(m1, om)
            else:
                mat = _dft_matrix_np(m1, pow(om, m2, P))
            out.append((
                jnp.asarray(_digits_i8_np(mat)),
                None if W is None else jnp.asarray(W),
            ))
            om = pow(om, m1, P)
    return tuple(out)


def _apply_rec(x2d, tabs, level: int, interpret: bool):
    """Transform along axis 0 of (m, B); natural order in and out.

    Pass structure (each step is one HBM round trip): the single-vector
    chain's first level (B == 1) fuses the W twiddle multiply into the
    level kernel (W is already kernel-shaped there); deeper levels run the
    kernel, then one XLA mont_mul + transpose pass. The round-4 fully-
    fused variants (transposed-output level 0, expanded-W middle levels —
    TOYNI_MXU_FUSE / TOYNI_MXU_NTT=2) measured reproducibly ~2% SLOWER in
    interleaved A/Bs at 2^24 (the XLA passes they removed overlap with
    compute; PERF.md round 4) and were retired in round 5 per the
    win-or-retire rule — git history keeps the code."""
    m, B = x2d.shape
    ml, W = tabs[level][0], tabs[level][1]
    m1 = ml.shape[1]
    if W is None:
        return _dft_level(x2d, ml, interpret=interpret)
    m2 = m // m1
    y = x2d.reshape(m1, m2 * B)
    if B == 1:
        a = _dft_level(y, ml, W, fuse_w=True, interpret=interpret)
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
