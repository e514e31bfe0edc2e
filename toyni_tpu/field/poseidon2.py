"""Poseidon2 permutation over BabyBear — exact host oracle.

The arithmetic-hash backend of the Merkle layer (``StarkConfig(hash=
"poseidon2")``). The reference framework is SHA-256-only (reference:
src/merkle.rs:105-123); this hash is the framework's beyond-reference mode:
an algebraic permutation whose rounds are BabyBear field ops — the same
add/mul primitives the rest of the prover runs on the TPU's vector unit —
and whose digests are field elements, the property recursive STARK
verification needs. Production BabyBear STARK stacks ship exactly this
construction for those reasons.

Everything here is exact Python-int arithmetic: this module is the
bit-exactness oracle for the batched device kernels in
``toyni_tpu/ops/poseidon2.py``, and the verifier's hash when proofs commit
with Poseidon2. Parameters (round constants, internal diagonal) are
generated deterministically with an irreducibility proof obligation — see
scripts/gen_poseidon2_params.py.

Construction (Poseidon2, Grassi-Khovratovich-Schofnegger 2023):

    state <- M_E * state                      (pre-rounds linear layer)
    4 external rounds:  +RC, x^7 on all lanes, M_E
    13 internal rounds: +RC on lane 0, x^7 on lane 0, M_I
    4 external rounds:  +RC, x^7 on all lanes, M_E

with t = 16, M_E = circ(2*M4, M4, M4, M4), M_I = all-ones + diag(mu_i - 1).

Hash modes
----------
- ``h_hash_elems(elems)``: padding-free sponge, rate 8 / capacity 8.
  Capacity lane 15 is initialized to ``len(elems)``: leaves of different
  widths (and leaves vs. anything else) live in disjoint sponge domains,
  the arithmetic analog of the reference's 0x00 leaf tag
  (src/merkle.rs:109-114). Absorption overwrites the rate lanes.
- ``h_compress(left, right)``: 2-to-1 node compression, one full-width
  permutation truncated to 8 lanes — the arithmetic analog of the 0x01
  node tag path (src/merkle.rs:117-123). A node input occupies all 16
  lanes, so it can only collide with an 8-element leaf if a child digest
  hits the single vector (0,...,0,8) — a preimage problem.

Digests are 8 BabyBear elements (~248 bits; ~124-bit collision security
from the capacity), serialized as 32 bytes of 4-byte LE words — the same
32-byte commitment slots the SHA-256 mode uses, so wire formats share all
their structure.
"""

from __future__ import annotations

from .babybear import P
from .poseidon2_params import (
    ALPHA,
    MU_INTERNAL,
    RC_EXTERNAL,
    RC_INTERNAL,
    R_F,
    R_P,
    T,
)

RATE = 8
CAPACITY = T - RATE
DIGEST_WORDS = 8

# mu_i - 1: the "diagonal minus the all-ones part" of M_I
_DIAG = tuple((m - 1) % P for m in MU_INTERNAL)


def _m4(x0: int, x1: int, x2: int, x3: int):
    """M4 = [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]] via the add chain of
    the Poseidon2 paper (appendix B): 12 additions, no multiplies."""
    t0 = (x0 + x1) % P
    t1 = (x2 + x3) % P
    t2 = (2 * x1 + t1) % P
    t3 = (2 * x3 + t0) % P
    t4 = (4 * t1 + t3) % P
    t5 = (4 * t0 + t2) % P
    t6 = (t3 + t5) % P
    t7 = (t2 + t4) % P
    return t6, t5, t7, t4


def _matmul_external(s: list) -> list:
    """M_E = circ(2*M4, M4, M4, M4): per-block M4, then add the block sum."""
    y = []
    for b in range(0, T, 4):
        y.extend(_m4(s[b], s[b + 1], s[b + 2], s[b + 3]))
    sums = [
        sum(y[b + j] for b in range(0, T, 4)) % P for j in range(4)
    ]
    return [(y[i] + sums[i % 4]) % P for i in range(T)]


def _matmul_internal(s: list) -> list:
    """M_I row i = all-ones + (mu_i - 1) on the diagonal."""
    tot = sum(s) % P
    return [(tot + _DIAG[i] * s[i]) % P for i in range(T)]


def _sbox(x: int) -> int:
    x2 = x * x % P
    x4 = x2 * x2 % P
    return x4 * x2 % P * x % P  # x^7


def h_perm(state: list) -> list:
    """One Poseidon2 permutation of a 16-element state (exact ints)."""
    assert len(state) == T
    s = _matmul_external(list(state))
    half = R_F // 2
    for r in range(half):
        rc = RC_EXTERNAL[r]
        s = [_sbox((s[i] + rc[i]) % P) for i in range(T)]
        s = _matmul_external(s)
    for r in range(R_P):
        s[0] = _sbox((s[0] + RC_INTERNAL[r]) % P)
        s = _matmul_internal(s)
    for r in range(half, R_F):
        rc = RC_EXTERNAL[r]
        s = [_sbox((s[i] + rc[i]) % P) for i in range(T)]
        s = _matmul_external(s)
    return s


def h_hash_elems(elems) -> tuple:
    """Padding-free sponge over a fixed-length field-element message.

    Capacity lane 15 = message length (elems); rate lanes are overwritten
    per 8-element chunk. Returns an 8-element digest tuple."""
    elems = [int(v) % P for v in elems]
    state = [0] * T
    state[T - 1] = len(elems) % P
    for off in range(0, max(len(elems), 1), RATE):
        chunk = elems[off : off + RATE]
        state[: len(chunk)] = chunk
        state = h_perm(state)
    return tuple(state[:DIGEST_WORDS])


def h_compress(left, right) -> tuple:
    """2-to-1 compression of two 8-element digests (one permutation)."""
    state = [int(v) % P for v in (*left, *right)]
    return tuple(h_perm(state)[:DIGEST_WORDS])


# ── digest/salt codecs ───────────────────────────────────────────────────────

def digest_to_bytes(words) -> bytes:
    """8 field elements -> 32 bytes (4-byte LE words)."""
    return b"".join(int(w).to_bytes(4, "little") for w in words)


def digest_from_bytes(data: bytes) -> tuple:
    assert len(data) == 32
    return tuple(
        int.from_bytes(data[i : i + 4], "little") for i in range(0, 32, 4)
    )


def salt_to_elems(salt: bytes) -> tuple:
    """16-byte salt -> 4 field elements. Big-endian 4-byte words — the
    canonical salt wire form the SHA-256 mode already uses (BE bytes of the
    4 salt words, see StarkProver._salts); p2-mode salts are generated < p."""
    assert len(salt) == 16
    return tuple(
        int.from_bytes(salt[i : i + 4], "big") for i in range(0, 16, 4)
    )


def salt_from_words(words) -> bytes:
    return b"".join(int(w).to_bytes(4, "big") for w in words)


# ── Merkle helpers (host oracle; mirror merkle.py's SHA-256 path) ────────────

def h_leaf_digest(salt_elems, value_elems) -> tuple:
    """Leaf = sponge(salt || value elems). Unsalted leaves pass ()."""
    return h_hash_elems([*salt_elems, *value_elems])


def h_tree_root(leaf_digests: list) -> tuple:
    """Pairwise fold with odd-duplication (same shape as merkle.rs:25-48)."""
    level = list(leaf_digests)
    while len(level) > 1:
        if len(level) % 2 == 1:
            level.append(level[-1])
        level = [
            h_compress(level[i], level[i + 1]) for i in range(0, len(level), 2)
        ]
    return level[0]


def verify_merkle_proof(leaf_digest, path, positions, root: bytes) -> bool:
    """Walk a sibling path of 32-byte digests up to a 32-byte root.
    `positions[i]` True = sibling is on the LEFT (same convention as the
    SHA-256 path, merkle.py MerkleProof)."""
    cur = tuple(leaf_digest)
    for sib_bytes, is_right in zip(path, positions):
        sib = digest_from_bytes(sib_bytes)
        cur = h_compress(sib, cur) if is_right else h_compress(cur, sib)
    return digest_to_bytes(cur) == root
