"""Polynomial utilities.

The reference carries a scalar coefficient-vector `Polynomial` with Horner
evaluation, schoolbook multiply, and long division (reference:
src/math/polynomial.rs). In the TPU framework polynomials are plain uint32
coefficient arrays; the prover's hot paths never materialize polynomial
*objects* — evaluation at one point is a power-table dot product (log-depth,
fully parallel) and multiplication/LDE go through the FFT. The host helpers
below mirror the reference ops exactly for tests and the verifier.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .field import babybear as bb
from .field.babybear import P


def evaluate(coeffs: jnp.ndarray, x: int) -> jnp.ndarray:
    """P(x) for a device coefficient vector and host scalar x: dot product
    against the power table [x^0..x^(L-1)] with a log-depth modular
    reduction. Replaces the reference's sequential Horner loop
    (src/math/polynomial.rs:134-144) with O(log L) depth."""
    L = coeffs.shape[-1]
    xpows = bb.powers(x, L, mont=True)
    return bb.sum_mod(bb.mont_mul(coeffs, xpows))


# ── host (Python ints / numpy u64) ──────────────────────────────────────────

def h_evaluate(coeffs, x: int) -> int:
    """Horner evaluation, the host oracle (src/math/polynomial.rs:134-144)."""
    acc = 0
    for c in reversed([int(v) for v in coeffs]):
        acc = (acc * x + c) % P
    return acc


def h_multiply(a, b):
    """Schoolbook product (src/math/polynomial.rs:118-132)."""
    a = [int(v) for v in a]
    b = [int(v) for v in b]
    if not a or not b:
        return []
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] = (out[i + j] + ai * bj) % P
    return out


def h_add(a, b):
    out = [0] * max(len(a), len(b))
    for i, v in enumerate(a):
        out[i] = (out[i] + int(v)) % P
    for i, v in enumerate(b):
        out[i] = (out[i] + int(v)) % P
    return out


def h_sub(a, b):
    """a - b coefficient-wise (src/math/polynomial.rs:103-116)."""
    out = [0] * max(len(a), len(b))
    for i, v in enumerate(a):
        out[i] = (out[i] + int(v)) % P
    for i, v in enumerate(b):
        out[i] = (out[i] - int(v)) % P
    return out


def h_scale(a, s: int):
    """s * a (src/math/polynomial.rs:162-165)."""
    return [int(v) * (s % P) % P for v in a]


def format_poly(coeffs) -> str:
    """Human-readable form, highest-degree term first — API parity with the
    reference's Display impl (src/math/polynomial.rs:194-220)."""
    terms = []
    for i in range(len(coeffs) - 1, -1, -1):
        c = int(coeffs[i]) % P
        if c == 0:
            continue
        if i == 0:
            terms.append(f"{c}")
        elif i == 1:
            terms.append(f"{c}x" if c != 1 else "x")
        else:
            terms.append(f"{c}x^{i}" if c != 1 else f"x^{i}")
    return " + ".join(terms) if terms else "0"


def h_divide_by_linear(coeffs, z: int):
    """Synthetic division by (x - z): returns (quotient_coeffs, remainder),
    with remainder == P(z).

    Note: the reference's version (src/math/polynomial.rs:70-86) has a bug —
    its loop breaks on the first iteration (`if i == 0 { ... break }`), so it
    always returns (0, 0); the function is unused by the reference pipeline.
    This is the correct implementation of the documented intent, validated by
    q*(x-z) + r == P in tests.
    """
    cs = [int(v) for v in coeffs]
    if not cs:
        return [], 0
    q = [0] * (len(cs) - 1)
    acc = 0
    for i, c in enumerate(reversed(cs)):
        if i == len(cs) - 1:
            rem = (c + z * acc) % P
            return q, rem
        acc = (c + z * acc) % P
        q[len(q) - 1 - i] = acc
    return q, 0


def h_divide(dividend, divisor):
    """Long division returning (quotient, remainder)
    (src/math/polynomial.rs:34-68)."""
    num = [int(v) for v in dividend]
    den = [int(v) for v in divisor]
    while den and den[-1] == 0:
        den.pop()
    if not den:
        return None
    while num and num[-1] == 0:
        num.pop()
    if len(num) < len(den):
        return [], num
    lead_inv = pow(den[-1], P - 2, P)
    deg_q = len(num) - len(den)
    q = [0] * (deg_q + 1)
    rem = num[:]
    for i in range(deg_q, -1, -1):
        c = rem[i + len(den) - 1]
        if c == 0:
            continue
        q[i] = c * lead_inv % P
        for j, dj in enumerate(den):
            rem[i + j] = (rem[i + j] - q[i] * dj) % P
    while rem and rem[-1] == 0:
        rem.pop()
    return q, rem


def h_lagrange_interpolate(xs, ys):
    """O(n^2) Lagrange (src/math/polynomial.rs:167-191) — test oracle only;
    the framework interpolates with INTT."""
    n = len(xs)
    result = [0]
    for i in range(n):
        basis = [1]
        denom = 1
        for j in range(n):
            if i == j:
                continue
            basis = h_multiply(basis, [(-xs[j]) % P, 1])
            denom = denom * (xs[i] - xs[j]) % P
        coeff = ys[i] * pow(denom, P - 2, P) % P
        result = h_add(result, [c * coeff % P for c in basis])
    return result
