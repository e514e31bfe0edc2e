"""Host-side NumPy oracle for BabyBear arithmetic.

The differential-testing reference for every device kernel: plain NumPy
``uint64`` arithmetic, where a 31-bit x 31-bit product fits natively and the
reduction is a literal ``%`` — the exact computation the reference performs
with ``u128`` widening (reference: src/babybear.rs:169-178).

Also used by the (deliberately scalar/host) STARK verifier, which is the
bit-exactness oracle for the whole pipeline.
"""

from __future__ import annotations

import numpy as np

from .babybear import P, get_root_of_unity  # noqa: F401  (re-export)

_P = np.uint64(P)


def arr(values) -> np.ndarray:
    """Coerce to a reduced uint64 BabyBear array."""
    a = np.asarray(values, dtype=np.uint64)
    return a % _P


def add(a, b):
    return (np.asarray(a, np.uint64) + np.asarray(b, np.uint64)) % _P


def sub(a, b):
    return (np.asarray(a, np.uint64) + _P - np.asarray(b, np.uint64)) % _P


def neg(a):
    return (_P - np.asarray(a, np.uint64)) % _P


def mul(a, b):
    # operands < p < 2^31 so the u64 product is exact
    return (np.asarray(a, np.uint64) * np.asarray(b, np.uint64)) % _P


def pow_(a, e: int):
    """Elementwise a^e by square-and-multiply (e is a host int)."""
    a = np.asarray(a, np.uint64) % _P
    result = np.ones_like(a)
    base = a
    while e > 0:
        if e & 1:
            result = mul(result, base)
        base = mul(base, base)
        e >>= 1
    return result


def inv(a):
    """Elementwise inverse via Fermat; 0 -> 0 (protocol layer checks zeros)."""
    return pow_(a, P - 2)


def powers(base: int, n: int) -> np.ndarray:
    """[base^0 .. base^(n-1)] mod p — the values the reference enumerates
    sequentially (src/math/domain.rs:61-69), computed with the vectorized
    binary method (log n passes of exact u64 products)."""
    base %= P
    idx = np.arange(n, dtype=np.uint64)
    out = np.ones(n, np.uint64)
    sq = base
    for b in range(max(1, (n - 1).bit_length())):
        bit = (idx >> np.uint64(b)) & np.uint64(1)
        out = np.where(bit == 1, out * np.uint64(sq) % _P, out)
        sq = sq * sq % P
    return out


def ntt(values: np.ndarray, omega: int) -> np.ndarray:
    """In-place-style iterative Cooley-Tukey NTT, the scalar oracle.

    Mirrors the reference CPU NTT exactly (src/ntt.rs:24-53): bit-reverse
    permutation then log n DIT butterfly stages with on-the-fly twiddles.
    """
    v = np.array(values, np.uint64) % _P
    n = len(v)
    assert n & (n - 1) == 0, "NTT size must be power of 2"
    log_n = n.bit_length() - 1
    # bit-reverse permutation
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for _ in range(log_n):
        rev = (rev << 1) | (idx & 1)
        idx >>= 1
    v = v[rev]
    length = 2
    while length <= n:
        step = n // length
        w_len = pow(int(omega), step, P)
        for i in range(0, n, length):
            w = 1
            half = length // 2
            for j in range(half):
                u = int(v[i + j])
                t = int(v[i + j + half]) * w % P
                v[i + j] = (u + t) % P
                v[i + j + half] = (u - t) % P
                w = w * w_len % P
        length *= 2
    return v


def intt(values: np.ndarray, omega: int) -> np.ndarray:
    """Inverse NTT: forward NTT with omega^(n-1), then scale by n^{-1}
    (src/ntt.rs:56-66)."""
    n = len(values)
    inv_omega = pow(int(omega), n - 1, P)
    v = ntt(values, inv_omega)
    n_inv = pow(n, P - 2, P)
    return mul(v, np.uint64(n_inv))
