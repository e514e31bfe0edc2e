"""Vectorized BabyBear field arithmetic for TPU (JAX / XLA).

The field is F_p with p = 2^31 - 2^27 + 1 = 2013265921, the same prime as the
reference implementation (reference: src/babybear.rs:8). Unlike the reference,
which wraps a single ``u64`` in a scalar struct (src/babybear.rs:10-14), this
module operates on whole ``uint32`` jnp arrays: every op is elementwise over
arbitrarily-shaped tensors so the VPU (8x128 lanes) does the work.

TPU has no native 64-bit integer multiply, so the 31-bit modular multiply is
implemented as Montgomery multiplication with R = 2^32, built from a 32x32 ->
hi32 multiply decomposed into 16-bit limbs. This replaces both the
reference's `u128` widening multiply (src/babybear.rs:169-178) and the CUDA
kernel's Barrett reduction via `__umul64hi` (cuda/ntt_kernel.cu:27-67) with a
scheme that maps onto the TPU's 32-bit integer VPU lanes.

Public arrays always hold values in **standard form** (0 <= v < p). Montgomery
form is an internal detail of the hot kernels (NTT, fold); `to_mont` /
`mont_mul` / `from_mont` are exported for those call sites.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ── constants ────────────────────────────────────────────────────────────────

P = 2013265921  # 2^31 - 2^27 + 1
TWO_ADICITY = 27
# 31^15 mod p, a generator of the 2^27-torsion (reference: src/babybear.rs:122)
PRIMITIVE_ROOT = 440564289

# Montgomery parameters for R = 2^32.
MONT_R = (1 << 32) % P            # 268435454
MONT_R2 = (MONT_R * MONT_R) % P   # 1172168163
MONT_NP = 2013265919              # -p^-1 mod 2^32 (happens to equal p - 2)

_U32 = jnp.uint32
_MASK16 = np.uint32(0xFFFF)


def _c(v: int) -> jnp.ndarray:
    """A uint32 scalar constant."""
    return jnp.uint32(v)


# ── add / sub / neg ──────────────────────────────────────────────────────────

def add(a, b):
    """(a + b) mod p. Inputs must be reduced (< p); the sum stays < 2^32."""
    s = a + b
    return jnp.where(s >= _c(P), s - _c(P), s)


def sub(a, b):
    """(a - b) mod p with the borrow-free formulation."""
    return jnp.where(a >= b, a - b, a + (_c(P) - b))


def neg(a):
    """-a mod p; keeps the 0 -> 0 convention of the reference (babybear.rs:195-208)."""
    return jnp.where(a == 0, a, _c(P) - a)


# ── multiplication ───────────────────────────────────────────────────────────

def _mulhi32(a, b):
    """High 32 bits of the 64-bit product of two uint32 arrays.

    16-bit limb decomposition; every partial product and partial sum provably
    fits in uint32 (limbs < 2^16).
    """
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + (ll >> 16)          # < 2^32
    mid2 = hl + (mid & _MASK16)    # < 2^32
    return hh + (mid >> 16) + (mid2 >> 16)


def mont_mul(a, b):
    """Montgomery product: a * b * R^{-1} mod p  (R = 2^32).

    For a, b < p the result is fully reduced (< p). This is the workhorse of
    every hot kernel; ~10 32-bit multiplies per lane.
    """
    t_lo = a * b                          # low 32 bits of the product
    t_hi = _mulhi32(a, b)
    m = t_lo * _c(MONT_NP)                # low 32 bits
    mp_hi = _mulhi32(m, _c(P))
    # t_lo + lo32(m*p) == 0 mod 2^32 by construction, so the carry out of the
    # low word is exactly (t_lo != 0).
    u = t_hi + mp_hi + (t_lo != 0).astype(_U32)
    return jnp.where(u >= _c(P), u - _c(P), u)


def mont_mul_shift(a, b):
    """`mont_mul` with the reduction's multiplies replaced by shifts.

    Both Montgomery constants have pure power-of-two structure:
    -p^-1 mod 2^32 = 2^31 - 2^27 - 1 and p = 2^31 - 2^27 + 1, so
    m = t_lo * np and hi32(m * p) reduce to shifted adds with explicit
    borrow/carry tracking. The low product half is rebuilt from the same
    16-bit limbs as the high half. 4 multiplies per lane (vs 10 in
    `mont_mul`) at the price of more adds/compares — a win only inside
    fused compute-bound kernels; bit-identical to `mont_mul` everywhere.
    """
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + (ll >> 16)
    mid2 = hl + (mid & _MASK16)
    t_hi = hh + (mid >> 16) + (mid2 >> 16)
    t_lo = ll + ((lh + hl) << 16)
    # m = t_lo * (2^31 - 2^27 - 1) mod 2^32
    m = (t_lo << 31) - (t_lo << 27) - t_lo
    # hi32(m * p), p = 2^31 - 2^27 + 1, with exact borrow/carry propagation
    lo_a = m << 31
    lo_b = m << 27
    lo1 = lo_a - lo_b
    lo2 = lo1 + m
    mp_hi = (
        (m >> 1)
        - (m >> 5)
        - (lo_a < lo_b).astype(_U32)
        + (lo2 < m).astype(_U32)
    )
    u = t_hi + mp_hi + (t_lo != 0).astype(_U32)
    return jnp.where(u >= _c(P), u - _c(P), u)


def to_mont(a):
    """Map standard form -> Montgomery form (a -> a*R mod p)."""
    return mont_mul(a, _c(MONT_R2))


def from_mont(a):
    """Map Montgomery form -> standard form (a*R -> a)."""
    return mont_mul(a, _c(1))


def mul(a, b):
    """Standard-form modular multiply: (a * b) mod p.

    Two Montgomery multiplies; hot loops should instead keep one operand (e.g.
    a twiddle table) in Montgomery form and call `mont_mul` directly.
    """
    return mont_mul(mont_mul(a, b), _c(MONT_R2))


def mul_const(a, c: int):
    """Multiply an array by a compile-time Python int constant (one mont_mul)."""
    return mont_mul(a, _c(c * MONT_R % P))


# ── pow / inverse (static exponent, square-and-multiply) ─────────────────────

def pow_const(a, exp: int):
    """a^exp mod p for a static Python-int exponent, vectorized over `a`.

    Unrolled square-and-multiply: ~2*log2(exp) Montgomery multiplies, all
    elementwise (reference semantics: src/babybear.rs:91-108).
    """
    if exp == 0:
        # Matches the reference: pow(_, 0) = 1 including base 0
        # (src/babybear.rs:92-94).
        return jnp.full(jnp.shape(a), 1, _U32)
    am = to_mont(a)
    result = None
    base = am
    e = exp
    while e > 0:
        if e & 1:
            result = base if result is None else mont_mul(result, base)
        e >>= 1
        if e > 0:
            base = mont_mul(base, base)
    return from_mont(result)


def inv(a):
    """a^{-1} mod p via Fermat (a^(p-2)); maps 0 -> 0.

    The reference asserts on zero (src/babybear.rs:111-114); device code
    cannot branch on data, so we adopt 0 -> 0 and keep the zero check at the
    protocol layer (host).
    """
    return pow_const(a, P - 2)


def powers_traced(base, n: int, *, mont: bool = False):
    """[base^0 .. base^(n-1)] for a *traced* u32 scalar base (jit-safe, unlike
    `powers` whose base is a host int). log n vectorized Montgomery steps."""
    nbits = max(1, (n - 1).bit_length())
    idx = jnp.arange(n, dtype=_U32)
    result = jnp.full((n,), MONT_R % P, _U32)  # 1 in Montgomery form
    sq = to_mont(jnp.asarray(base, _U32))
    for b in range(nbits):
        bit = (idx >> _c(b)) & _c(1)
        result = jnp.where(bit == 1, mont_mul(result, sq), result)
        if b + 1 < nbits:
            sq = mont_mul(sq, sq)
    return result if mont else from_mont(result)


def sum_mod(v, axis: int = -1):
    """Modular sum along an axis via log-depth pairwise folding (a plain
    jnp.sum would overflow uint32)."""
    v = jnp.moveaxis(v, axis, -1)
    n = v.shape[-1]
    while n > 1:
        if n % 2:
            v = jnp.concatenate([v, jnp.zeros((*v.shape[:-1], 1), _U32)], axis=-1)
            n += 1
        v = add(v[..., : n // 2], v[..., n // 2 :])
        n //= 2
    return v[..., 0]


# ── host-side scalar helpers (Python ints, exact) ────────────────────────────

def h_mul(a: int, b: int) -> int:
    return a * b % P


def h_add(a: int, b: int) -> int:
    return (a + b) % P


def h_sub(a: int, b: int) -> int:
    return (a - b) % P


def h_pow(a: int, e: int) -> int:
    return pow(a, e, P)


def h_inv(a: int) -> int:
    return pow(a, P - 2, P)


def get_root_of_unity(log_n: int) -> int:
    """Primitive 2^log_n-th root of unity (host int).

    Matches the reference exactly: 440564289^(2^(27-log_n)) mod p
    (src/babybear.rs:118-126).
    """
    assert log_n <= TWO_ADICITY, "BabyBear only supports NTT up to 2^27"
    return pow(PRIMITIVE_ROOT, 1 << (TWO_ADICITY - log_n), P)


# ── power tables ─────────────────────────────────────────────────────────────

def powers(base: int, n: int, *, mont: bool = False) -> jnp.ndarray:
    """[base^0, base^1, ..., base^(n-1)] as a uint32 array.

    Built with the vectorized binary method: log2(n) Montgomery multiplies over
    the whole vector (the reference generates these with a sequential scalar
    loop, src/math/domain.rs:61-69 — same values).

    If `mont=True` the table is returned in Montgomery form, ready to be used
    as the constant operand of `mont_mul`.
    """
    base %= P
    nbits = max(1, (n - 1).bit_length())
    idx = jnp.arange(n, dtype=_U32)
    # result accumulates in Montgomery form.
    result = jnp.full((n,), MONT_R % P, _U32)  # 1 in Montgomery form
    sq = base
    for b in range(nbits):
        bit = (idx >> b) & _c(1)
        sq_m = sq * MONT_R % P  # Montgomery form of base^(2^b), host-exact
        multiplied = mont_mul(result, _c(sq_m))
        result = jnp.where(bit == 1, multiplied, result)
        sq = sq * sq % P
    return result if mont else from_mont(result)


# ── byte codecs (host) ───────────────────────────────────────────────────────

def to_bytes(v: int) -> bytes:
    """8-byte little-endian encoding (reference: src/babybear.rs:53-62)."""
    return int(v).to_bytes(8, "little")


def from_bytes_mod_order(data: bytes) -> int:
    """First 8 bytes as LE u64, reduced mod p (src/babybear.rs:65-71)."""
    return int.from_bytes(data[:8].ljust(8, b"\0"), "little") % P
