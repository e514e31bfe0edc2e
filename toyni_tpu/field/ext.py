"""Quartic extension field F_p[X]/(X^4 - 11) over BabyBear, vectorized.

Mirrors the reference's `Ext` (reference: src/ext.rs): the ~124-bit challenge
space for soundness-critical randomness. Elements are stored with a trailing
axis of size 4: an array of shape ``(..., 4)`` uint32, coefficient ``c[k]`` of
X^k in standard form — the array-of-structs layout of the reference
(src/ext.rs:19-26) becomes a structs-in-lanes layout so the VPU vectorizes
across elements.

Host scalar helpers (tuples of 4 ints) back the transcript and verifier.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import babybear as bb
from .babybear import P

W = 11  # X^4 = W; X^4 - 11 is irreducible over BabyBear (src/ext.rs:19-20)

_U32 = jnp.uint32


# ── array (device) ops: shape (..., 4) ──────────────────────────────────────

def zero(shape=()):
    return jnp.zeros((*shape, 4), _U32)


def one(shape=()):
    return jnp.concatenate(
        [jnp.ones((*shape, 1), _U32), jnp.zeros((*shape, 3), _U32)], axis=-1
    )


def from_base(a):
    """Embed base-field array a (shape s) as ext array (shape (*s, 4))."""
    a = jnp.asarray(a, _U32)
    return jnp.stack([a, jnp.zeros_like(a), jnp.zeros_like(a), jnp.zeros_like(a)], axis=-1)


def add(a, b):
    return bb.add(a, b)


def sub(a, b):
    return bb.sub(a, b)


def neg(a):
    return bb.neg(a)


def mul_base(a, s):
    """Multiply ext array by base-field array s (broadcast over the coeff axis),
    the cheap scalar path of the reference (src/ext.rs:74-78)."""
    return bb.mul(a, jnp.asarray(s, _U32)[..., None])


def mul(a, b):
    """Schoolbook product mod (X^4 - W) (reference: src/ext.rs:178-192).

    One operand is lifted to Montgomery form so each of the 16 cross products
    is a single `mont_mul`; the three W-foldings are constant multiplies.
    """
    am = bb.to_mont(a)
    a0, a1, a2, a3 = (am[..., k] for k in range(4))
    b0, b1, b2, b3 = (b[..., k] for k in range(4))
    m = bb.mont_mul
    wc = lambda x: bb.mul_const(x, W)
    r0 = bb.add(m(a0, b0), wc(bb.add(bb.add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    r1 = bb.add(bb.add(m(a0, b1), m(a1, b0)), wc(bb.add(m(a2, b3), m(a3, b2))))
    r2 = bb.add(bb.add(m(a0, b2), m(a1, b1)), bb.add(m(a2, b0), wc(m(a3, b3))))
    r3 = bb.add(bb.add(m(a0, b3), m(a1, b2)), bb.add(m(a2, b1), m(a3, b0)))
    return jnp.stack([r0, r1, r2, r3], axis=-1)


def pow_const(a, exp: int):
    """a^exp for a static (possibly >64-bit) Python int exponent."""
    if exp == 0:
        return jnp.broadcast_to(one(jnp.shape(a)[:-1]), jnp.shape(a))
    result = None
    base = a
    e = exp
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e > 0:
            base = mul(base, base)
    return result


def inv(a):
    """Inverse via Fermat: a^(p^4 - 2) with a 124-bit exponent
    (reference: src/ext.rs:107-128). Maps 0 -> 0."""
    return pow_const(a, P**4 - 2)


# ── Frobenius / fast inverse ────────────────────────────────────────────────
#
# p ≡ 1 (mod 4), so X^p = W^((p-1)/4) · X: the Frobenius map a ↦ a^p is a
# coefficient-wise scaling a_k ↦ μ^k a_k with μ = W^((p-1)/4). That makes the
# norm-based inverse cheap on device: the Fermat exponent p^4-2 (the
# reference's route, src/ext.rs:107-128) would cost ~124 ext multiplies per
# element; here it is 3 scalings + 3 ext muls + ONE base-field inversion:
#     t = a^p · a^(p²) · a^(p³);   N(a) = a·t ∈ F_p;   a⁻¹ = t / N(a).

_MU = pow(W, (P - 1) // 4, P)
_FROB = tuple(
    tuple(pow(_MU, k * i, P) for i in range(4)) for k in range(1, 4)
)


def frobenius(a, k: int = 1):
    """a^(p^k) for k in 1..3 — coefficient-wise scaling (see module note)."""
    table = jnp.asarray(_FROB[k - 1], _U32)
    return bb.mul(a, table)


def inv_fast(a):
    """Norm-trick inverse (identical values to `inv`, ~40x fewer device
    passes). Maps 0 -> 0 like the Fermat path."""
    t = mul(frobenius(a, 1), frobenius(a, 2))
    t = mul(t, frobenius(a, 3))
    nrm = mul(a, t)[..., 0]  # N(a) = a^(1+p+p²+p³) lands in the base field
    return mul_base(t, bb.inv(nrm))


def powers_traced(base, n: int, *, mont: bool = False):
    """[base^0 .. base^(n-1)] for a traced (4,) ext scalar — the ext analog of
    `bb.powers_traced` (binary method, log n vectorized ext multiplies)."""
    nbits = max(1, (n - 1).bit_length())
    idx = jnp.arange(n, dtype=_U32)
    result = jnp.broadcast_to(one(), (n, 4))
    sq = jnp.broadcast_to(jnp.asarray(base, _U32), (n, 4))
    for b in range(nbits):
        bit = ((idx >> _U32(b)) & _U32(1))[:, None]
        result = jnp.where(bit == 1, mul(result, sq), result)
        if b + 1 < nbits:
            sq = mul(sq, sq)
    return bb.to_mont(result) if mont else result


def eval_poly_base_coeffs(coeffs, z):
    """Evaluate a BASE-field coefficient vector at a traced ext point z:
    returns (4,) = sum_i coeffs[i] * z^i.

    Two-level split i = j1*K + j2 so the only full-length pass is one
    base-by-ext broadcast multiply: the K inner ext powers and the n/K outer
    powers of z^K come from the binary method at ~sqrt(n) lanes each.
    """
    n = coeffs.shape[-1]
    if n <= 256:
        pows = powers_traced(z, n)
        return bb.sum_mod(bb.mont_mul(bb.to_mont(pows), coeffs[:, None]), axis=0)
    logn = (n - 1).bit_length()
    K = 1 << (logn // 2)
    n1 = (n + K - 1) // K
    pad = n1 * K - n
    c = jnp.pad(coeffs, (0, pad)).reshape(n1, K)
    inner = powers_traced(z, K)                      # (K, 4)
    zK = pow_const(z[None, :], K)[0]
    outer = powers_traced(zK, n1)                    # (n1, 4)
    # rows[j1] = sum_{j2} c[j1, j2] * z^{j2}  — the one full-length pass
    rows = bb.sum_mod(
        bb.mont_mul(bb.to_mont(inner)[None, :, :], c[:, :, None]), axis=1
    )                                                # (n1, 4)
    return bb.sum_mod(mul(rows, outer), axis=0)      # (4,)


# ── host scalar ops: tuples (c0, c1, c2, c3) of Python ints ─────────────────

ExtScalar = tuple  # (int, int, int, int)

H_ZERO: ExtScalar = (0, 0, 0, 0)
H_ONE: ExtScalar = (1, 0, 0, 0)


def h_from_base(a: int) -> ExtScalar:
    return (a % P, 0, 0, 0)


def h_add(a: ExtScalar, b: ExtScalar) -> ExtScalar:
    return tuple((x + y) % P for x, y in zip(a, b))


def h_sub(a: ExtScalar, b: ExtScalar) -> ExtScalar:
    return tuple((x - y) % P for x, y in zip(a, b))


def h_mul(a: ExtScalar, b: ExtScalar) -> ExtScalar:
    r0 = (a[0] * b[0] + W * (a[1] * b[3] + a[2] * b[2] + a[3] * b[1])) % P
    r1 = (a[0] * b[1] + a[1] * b[0] + W * (a[2] * b[3] + a[3] * b[2])) % P
    r2 = (a[0] * b[2] + a[1] * b[1] + a[2] * b[0] + W * a[3] * b[3]) % P
    r3 = (a[0] * b[3] + a[1] * b[2] + a[2] * b[1] + a[3] * b[0]) % P
    return (r0, r1, r2, r3)


def h_mul_base(a: ExtScalar, s: int) -> ExtScalar:
    return tuple(x * s % P for x in a)


def h_pow(a: ExtScalar, e: int) -> ExtScalar:
    result = H_ONE
    base = a
    while e > 0:
        if e & 1:
            result = h_mul(result, base)
        base = h_mul(base, base)
        e >>= 1
    return result


def h_inv(a: ExtScalar) -> ExtScalar:
    assert a != H_ZERO, "Cannot invert zero"
    return h_pow(a, P**4 - 2)


def h_to_bytes(a: ExtScalar) -> bytes:
    """32-byte LE serialization, 4 x 8-byte limbs (src/ext.rs:81-89)."""
    return b"".join(int(x).to_bytes(8, "little") for x in a)


def h_from_bytes(data: bytes) -> ExtScalar:
    return tuple(
        int.from_bytes(data[i * 8 : i * 8 + 8], "little") % P for i in range(4)
    )
