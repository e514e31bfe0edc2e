"""Batched Poseidon2 hashing on device (JAX/XLA over u32 VPU lanes).

Device twin of the exact host oracle in ``field/poseidon2.py`` (the
bit-exactness contract is tested lane-for-lane). The state rides as 16
BabyBear lanes in **Montgomery form** — every round is elementwise over the
whole leaf batch, which is exactly the shape the VPU wants (the reference's
Merkle loop hashes leaves one at a time, src/merkle.rs:30-47; here one call
hashes every node of a tree level):

- additions (round constants, matrix layers) are Montgomery-form-preserving,
  so the M_E layer is pure mod-adds via the paper's 12-add M4 chain;
- the x^7 S-box is 4 `mont_mul` chains;
- the internal matrix M_I = all-ones + diag(mu_i - 1) is one log-depth
  lane-sum plus one constant `mont_mul` per lane.

Two lowerings of the same arithmetic (the ops/sha256.py pattern):
**unrolled** (state = 16 separate (N,) arrays, all 21 rounds inlined — fuses
into register-resident elementwise work on TPU) and **rolled** (state =
(16, N) array, `lax.fori_loop` over rounds — XLA:CPU takes unbounded compile
time on the unrolled graph, exactly as it does for unrolled SHA-256).
Identical bits either way; `TOYNI_P2_UNROLL=0/1` overrides the
TPU-unrolled/CPU-rolled default.

Entry points mirror ``ops/sha256.py`` name-for-name so the Merkle layer
dispatches between hash backends with a module swap; digests are ``(..., 8)``
uint32 **standard-form** field elements (32-byte LE wire encoding — same
commitment slot width as SHA-256 digests).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field.babybear import MONT_R, P, add, mont_mul, sum_mod, to_mont
from ..field.poseidon2_params import (
    MU_INTERNAL,
    RC_EXTERNAL,
    RC_INTERNAL,
    R_F,
    R_P,
    T,
)

RATE = 8
DIGEST_WORDS = 8

_U32 = jnp.uint32

# constants in Montgomery form (c * R mod p), as Python ints baked at trace
# time — scalar constants broadcast for free on the VPU
_RC_EXT_M = tuple(
    tuple(c * MONT_R % P for c in row) for row in RC_EXTERNAL
)
_RC_INT_M = tuple(c * MONT_R % P for c in RC_INTERNAL)
_DIAG_M = tuple((m - 1) % P * MONT_R % P for m in MU_INTERNAL)


def _c(v: int):
    return jnp.uint32(v)


_UNROLLED = None


def _unrolled() -> bool:
    """Default ROLLED everywhere; `TOYNI_P2_UNROLL=1` opts into the fully
    inlined form. Unlike SHA-256 (whose 64 unrolled rounds are ~1.3k traced
    ops and fuse beautifully on TPU), an unrolled Poseidon2 permutation is
    ~16k ops (788 Montgomery multiplies at ~18 ops each), and a whole tree
    program inlines one copy PER LEVEL SHAPE — measured 9.4 MB of MLIR for
    a trace-2^8 commit program, which this deployment's remote TPU compile
    helper SIGKILLs. XLA:CPU compile time also explodes on it. The rolled
    form (3 `fori_loop`s: external/internal/external rounds) is bit-
    identical and keeps every program small."""
    global _UNROLLED
    if _UNROLLED is None:
        import os

        _UNROLLED = os.environ.get("TOYNI_P2_UNROLL", "") == "1"
    return _UNROLLED


def _dbl(x):
    return add(x, x)


def _m4(x0, x1, x2, x3):
    """M4 block multiply, 12 modular adds (field/poseidon2.py:_m4)."""
    t0 = add(x0, x1)
    t1 = add(x2, x3)
    t2 = add(_dbl(x1), t1)
    t3 = add(_dbl(x3), t0)
    t4 = add(_dbl(_dbl(t1)), t3)
    t5 = add(_dbl(_dbl(t0)), t2)
    t6 = add(t3, t5)
    t7 = add(t2, t4)
    return t6, t5, t7, t4


def _sbox(x):
    x2 = mont_mul(x, x)
    x4 = mont_mul(x2, x2)
    return mont_mul(mont_mul(x4, x2), x)  # x^7, Montgomery-form-preserving


# ── unrolled form: state = list of 16 (N,) lanes ─────────────────────────────

def _matmul_external(s):
    y = []
    for b in range(0, T, 4):
        y.extend(_m4(s[b], s[b + 1], s[b + 2], s[b + 3]))
    sums = [
        add(add(y[j], y[4 + j]), add(y[8 + j], y[12 + j])) for j in range(4)
    ]
    return [add(y[i], sums[i % 4]) for i in range(T)]


def _matmul_internal(s):
    tot = s[0]
    for i in range(1, T):
        tot = add(tot, s[i])
    return [add(tot, mont_mul(s[i], _c(_DIAG_M[i]))) for i in range(T)]


def _perm_unrolled(state):
    s = _matmul_external(list(state))
    half = R_F // 2
    for r in range(half):
        s = [_sbox(add(s[i], _c(_RC_EXT_M[r][i]))) for i in range(T)]
        s = _matmul_external(s)
    for r in range(R_P):
        s[0] = _sbox(add(s[0], _c(_RC_INT_M[r])))
        s = _matmul_internal(s)
    for r in range(half, R_F):
        s = [_sbox(add(s[i], _c(_RC_EXT_M[r][i]))) for i in range(T)]
        s = _matmul_external(s)
    return s


# ── rolled form: state = (16, ...) array, fori_loop over rounds ──────────────

def _matmul_external_arr(s):
    """M_E on a (16, ...) state: the M4 chain vectorized over the 4 blocks."""
    v = s.reshape(4, 4, *s.shape[1:])
    t6, t5, t7, t4 = _m4(v[:, 0], v[:, 1], v[:, 2], v[:, 3])
    y = jnp.stack([t6, t5, t7, t4], axis=1)
    sums = sum_mod(jnp.moveaxis(y, 0, -1), axis=-1)  # (4, ...)
    return add(y, sums[None]).reshape(s.shape)


def _perm_rolled(s):
    import jax

    rc_ext = jnp.asarray(_RC_EXT_M, _U32)  # (R_F, 16)
    rc_int = jnp.asarray(_RC_INT_M, _U32)  # (R_P,)
    diag = jnp.asarray(_DIAG_M, _U32)  # (16,)
    bshape = (slice(None),) + (None,) * (s.ndim - 1)

    def ext_round(r, s):
        s = _sbox(add(s, rc_ext[r][bshape]))
        return _matmul_external_arr(s)

    def int_round(r, s):
        s = s.at[0].set(_sbox(add(s[0], rc_int[r])))
        tot = sum_mod(jnp.moveaxis(s, 0, -1), axis=-1)
        return add(tot[None], mont_mul(s, diag[bshape]))

    half = R_F // 2
    s = _matmul_external_arr(s)
    s = jax.lax.fori_loop(0, half, ext_round, s)
    s = jax.lax.fori_loop(0, R_P, int_round, s)
    s = jax.lax.fori_loop(half, R_F, ext_round, s)
    return s


def perm_lanes(state):
    """Poseidon2 permutation over a list of 16 equal-shape u32
    Montgomery-form lane arrays; returns a list of 16."""
    if _unrolled():
        return _perm_unrolled(state)
    out = _perm_rolled(jnp.stack(state, axis=0))
    return [out[i] for i in range(T)]


def _sponge(elems_mont, batch_shape):
    """Padding-free sponge over Montgomery-form lane arrays; the capacity
    tag (lane 15 = message length) and untouched lanes are zero-cost
    constants. Returns 8 standard-form digest lanes stacked (..., 8)."""
    n = len(elems_mont)
    tag = jnp.broadcast_to(_c(n % P * MONT_R % P), batch_shape)
    zero = jnp.broadcast_to(_c(0), batch_shape)
    state = [zero] * (T - 1) + [tag]
    for off in range(0, max(n, 1), RATE):
        chunk = elems_mont[off : off + RATE]
        state = list(chunk) + state[len(chunk) :]
        state = perm_lanes(state)
    digest = [mont_mul(state[i], _c(1)) for i in range(DIGEST_WORDS)]
    return jnp.stack(digest, axis=-1)


def _salt_lanes(salts):
    """(N, 4) u32 field-element salt words -> 4 Montgomery lanes."""
    return [to_mont(salts[..., i]) for i in range(4)]


def hash_salted_leaves(values, salts):
    """sponge(salt4 || value): the hiding base-field leaf (the Poseidon2
    analog of SHA256(0x00 || salt || value8LE), src/fibonacci.rs:340-353)."""
    return _sponge(_salt_lanes(salts) + [to_mont(values)], values.shape)


def hash_unsalted_leaves(values):
    """sponge(value): the public final-FRI-layer leaf
    (src/fibonacci.rs:357-363)."""
    return _sponge([to_mont(values)], values.shape)


def hash_salted_leaves_ext(values, salts):
    """sponge(salt4 || v0..v3) for (..., 4) ext codeword lanes."""
    lanes = _salt_lanes(salts) + [to_mont(values[..., i]) for i in range(4)]
    return _sponge(lanes, values.shape[:-1])


def hash_unsalted_leaves_ext(values):
    return _sponge(
        [to_mont(values[..., i]) for i in range(4)], values.shape[:-1]
    )


def hash_salted_leaves_multi(values, salts):
    """sponge(salt4 || v_0..v_{k-1}): the row-bundle leaf of multi-column
    trace commitments. values: (k, N) u32 (column-major, the
    ops/sha256.py:hash_salted_leaves_multi convention); salts: (N, 4)."""
    k = values.shape[0]
    lanes = _salt_lanes(salts) + [to_mont(values[i]) for i in range(k)]
    return _sponge(lanes, values.shape[1:])


def hash_nodes(left, right):
    """2-to-1 compression of (..., 8) digest pairs: one full-width
    permutation, truncated (the analog of SHA256(0x01 || L || R),
    src/merkle.rs:117-123)."""
    state = [to_mont(left[..., i]) for i in range(8)] + [
        to_mont(right[..., i]) for i in range(8)
    ]
    out = perm_lanes(state)
    return jnp.stack(
        [mont_mul(out[i], _c(1)) for i in range(DIGEST_WORDS)], axis=-1
    )


# ── codecs (mirror sha256.digest_bytes / words_from_bytes) ───────────────────

def digest_bytes(words) -> bytes:
    """(8,) u32 standard-form digest -> 32-byte LE wire encoding."""
    import numpy as np

    return np.asarray(words, np.uint32).astype("<u4").tobytes()


def words_from_bytes(digest: bytes):
    import numpy as np

    return np.frombuffer(digest, dtype="<u4").astype(np.uint32)
