"""On-device Fiat-Shamir transcript (byte-exact replica of transcript.py).

The host transcript forces a device->host->device round trip at every phase
boundary (root back to host, challenge back to device) — ~15 sequential
round trips per proof, the latency floor of the phase-based prover. This
module re-implements the exact byte protocol (reference: src/transcript.rs)
as traced device scalar ops so the ENTIRE proof runs as one XLA program:

  * state ratchet   h = SHA256(state); state = h      -> scalar SHA-256
    (the unrolled 64-round compression from ops/sha256.py on () lanes)
  * challenge map   LE64(h[0..8]) mod p (babybear.rs:65-71)
    -> lo + 2^32*hi mod p = reduce(lo) + to_mont(reduce(hi))
    (mont_mul(hi, R^2) = hi * 2^64 * 2^-32 = hi * 2^32 mod p, exactly)
  * z rejection sampling (fibonacci.rs:377-399) -> lax.while_loop whose
    membership test is the subgroup power identity (z^N vs {1, h^N}),
    ratcheting once per rejected sample like the host loop
  * distinct-index squeezing with dedup (transcript.rs:58-72)
    -> lax.while_loop over a fixed (count,) slot array

Messages absorbed between squeezes have config-static byte lengths
(seed/roots/8-byte field scalars), so every SHA input is a statically-shaped
word list; construction is byte-wise with python-int constants folding at
trace time (see ops/sha256.py's constant-aware schedule).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..field.babybear import MONT_R2, P
from . import sha256 as sha

_U32 = jnp.uint32

SEED = b"toyni-stark-v1"


def _scalar_form() -> str:
    """Compression form for the transcript's SCALAR (() -lane) hashing.

    These hashes sit on the fused program's critical path — inside the
    z-rejection and index-dedup while_loops a looped compression nests a
    fori_loop per ratchet, pure overhead at scalar shapes (measured round
    4: pinning unrolled took the fused 2^8 proof from 0.354 to 0.327
    s/proof). A scalar 64-round unroll is ~1.3k ops per call site —
    trivial MLIR on TPU, but XLA:CPU's compile time explodes on unrolled
    SHA graphs, so off-TPU the ambient (rolled/chunked) form stays."""
    return "unrolled" if sha._prefer_form() == "unrolled" else sha._form()


def _bswap(w):
    """uint32 byte swap (BE word -> LE interpretation of the same 4 bytes)."""
    return (
        ((w & _U32(0xFF)) << 24)
        | (((w >> 8) & _U32(0xFF)) << 16)
        | (((w >> 16) & _U32(0xFF)) << 8)
        | (w >> 24)
    )


def _reduce2(v):
    """v mod p for v < 2^32 (at most two conditional subtracts)."""
    v = jnp.where(v >= _U32(P), v - _U32(P), v)
    return jnp.where(v >= _U32(P), v - _U32(P), v)


def challenge_from_digest(d):
    """LE u64 of the digest's first 8 bytes, mod p — the squeeze_challenge
    value map (transcript.rs:34-39 + babybear.rs:65-71). d: (8,) u32 BE
    words. (lo + 2^32 hi) mod p; mont_mul(hi, R^2) IS hi*2^32 mod p."""
    lo = _reduce2(_bswap(d[0]))
    hi = _reduce2(_bswap(d[1]))
    return bb.add(lo, bb.mont_mul(hi, _U32(MONT_R2)))


def index_from_digest(d, max_value: int):
    """LE u64 of the first 8 bytes, mod a power-of-two max (the query-index
    map, transcript.rs:63-66). Power-of-two max means the mod is a mask of
    the low bits — which all live in the first (byte-swapped) word."""
    assert max_value & (max_value - 1) == 0 and max_value <= 1 << 31
    return _bswap(d[0]) & _U32(max_value - 1)


# ── message construction ────────────────────────────────────────────────────

def _to_blocks(byte_items, nbytes: int):
    """byte_items: flat list of message bytes — python ints or traced u32
    scalars in [0, 255]. Returns padded 16-word blocks for sha.sha256_words
    (words stay python ints when every contributing byte is constant)."""
    assert len(byte_items) == nbytes
    padded = list(byte_items) + [0x80]
    while (len(padded) + 8) % 64:
        padded.append(0)
    bitlen = nbytes * 8
    padded += [(bitlen >> (8 * k)) & 0xFF for k in range(7, -1, -1)]
    words = []
    for i in range(0, len(padded), 4):
        const = 0
        acc = None
        for t in range(4):
            b = padded[i + t]
            sh = 24 - 8 * t
            if isinstance(b, int):
                const |= b << sh
            else:
                term = b.astype(_U32) << sh
                acc = term if acc is None else acc | term
        if acc is None:
            words.append(const)
        elif const:
            words.append(acc | _U32(const))
        else:
            words.append(acc)
    return [words[i:i + 16] for i in range(0, len(words), 16)]


def _part_bytes(item):
    """One absorb item -> list of byte values (ints / traced u32 scalars).

    bytes            -> raw constant bytes
    ("digest", d)    -> the 32 bytes of a (8,) u32 BE digest/root (SHA-256
                        digest words and SHA-mode Merkle roots)
    ("digest_le", d) -> the 32 bytes of a (8,) u32 LE-word digest — the
                        wire encoding of a Poseidon2 Merkle root
                        (field/poseidon2.py digest_to_bytes); the host
                        transcript absorbs root BYTES, so the byte order
                        follows the commitment hash
    ("le8", v)       -> 8-byte LE of a u32 field scalar (absorb_field's
                        encoding, transcript.rs:24-26; high 4 bytes zero)
    """
    if isinstance(item, (bytes, bytearray)):
        return list(item)
    kind, v = item
    if kind == "digest":
        out = []
        for i in range(8):
            w = v[i]
            out += [(w >> 24) & _U32(0xFF), (w >> 16) & _U32(0xFF),
                    (w >> 8) & _U32(0xFF), w & _U32(0xFF)]
        return out
    if kind == "digest_le":
        out = []
        for i in range(8):
            w = v[i]
            out += [w & _U32(0xFF), (w >> 8) & _U32(0xFF),
                    (w >> 16) & _U32(0xFF), (w >> 24) & _U32(0xFF)]
        return out
    if kind == "le8":
        v = jnp.asarray(v, _U32)
        return [v & _U32(0xFF), (v >> 8) & _U32(0xFF),
                (v >> 16) & _U32(0xFF), (v >> 24) & _U32(0xFF), 0, 0, 0, 0]
    raise ValueError(kind)


def hash_parts(parts):
    """SHA-256 over the concatenated absorb items -> (8,) u32 digest words.
    This is `squeeze`'s hash of a just-absorbed state: state' = SHA256(state)
    where state = the concatenation of `parts`."""
    byte_items = []
    for p in parts:
        byte_items += _part_bytes(p)
    with sha.forced(_scalar_form()):
        return sha.sha256_words(_to_blocks(byte_items, len(byte_items)))


def ratchet(d):
    """SHA256 of a bare 32-byte digest state — the squeeze ratchet when
    nothing was absorbed since the last squeeze (rejection loops). Pinned
    to the unrolled compression on TPU (see _scalar_form — these ratchets
    run INSIDE while_loop bodies, where a nested fori_loop form is pure
    overhead)."""
    win = [d[i] for i in range(8)] + [0x80000000, 0, 0, 0, 0, 0, 0, 256]
    with sha.forced(_scalar_form()):
        return sha.sha256_words([win])


def squeeze4_ratchets(d):
    """Four consecutive ratchet squeezes from a bare 32-byte state — the
    squeeze_ext_challenge pattern (transcript.rs:43-50) when nothing was
    absorbed since the last squeeze. Returns (digest, (4,) u32 coeffs)."""
    cs = []
    for _ in range(4):
        d = ratchet(d)
        cs.append(challenge_from_digest(d))
    return d, jnp.stack(cs)


# ── protocol loops ──────────────────────────────────────────────────────────

def pow2_traced(z, log_e: int):
    """z^(2^log_e) mod p by repeated Montgomery squaring (traced scalar)."""
    zm = bb.to_mont(jnp.asarray(z, _U32))
    for _ in range(log_e):
        zm = bb.mont_mul(zm, zm)
    return bb.from_mont(zm)


def derive_z_loop(digest, lde_size: int, shift: int):
    """Device analog of transcript.derive_z: starting from the state right
    after both roots were absorbed (`digest` = SHA of seed||roots — the first
    squeeze already performed by the caller via hash_parts), rejection-sample
    z with the subgroup power identity, ratcheting per rejected sample
    (fibonacci.rs:389-398). Returns (state_digest, z)."""
    log_n = lde_size.bit_length() - 1
    h_n = pow(shift, lde_size, P)

    def ok(z):
        zn = pow2_traced(z, log_n)
        return (zn != _U32(1)) & (zn != _U32(h_n))

    z0 = challenge_from_digest(digest)

    def cond(c):
        return ~c[2]

    def body(c):
        d, _, _ = c
        d = ratchet(d)
        z = challenge_from_digest(d)
        return d, z, ok(z)

    d, z, _ = jax.lax.while_loop(cond, body, (digest, z0, ok(z0)))
    return d, z


def derive_z_ext_loop(digest, z0, lde_size: int, shift: int):
    """Device analog of transcript.derive_z_ext. `digest`/`z0` are the state
    and (4,) ext sample after the FIRST squeeze_ext (whose leading squeeze
    hashed the absorbed roots — done by the caller); rejected samples ratchet
    4 more squeezes each. An ext sample only collides with the (base-field)
    forbidden sets when its three high coefficients are zero; then the same
    two power checks apply (transcript.py:102-117)."""
    log_n = lde_size.bit_length() - 1
    h_n = pow(shift, lde_size, P)

    def ok(z4):
        zn = pow2_traced(z4[0], log_n)
        high_zero = (z4[1] == 0) & (z4[2] == 0) & (z4[3] == 0)
        return ~(high_zero & ((zn == _U32(1)) | (zn == _U32(h_n))))

    def cond(c):
        return ~c[2]

    def body(c):
        d, _, _ = c
        d, z4 = squeeze4_ratchets(d)
        return d, z4, ok(z4)

    d, z4, _ = jax.lax.while_loop(cond, body, (digest, z0, ok(z0)))
    return d, z4


def squeeze_indices_loop(first_parts, count: int, max_value: int):
    """Device analog of transcript.squeeze_indices(count, max_value) with
    dedup (transcript.rs:58-72). `first_parts` is the absorbed state the
    FIRST ratchet hashes (prior digest || last FRI root); subsequent
    ratchets hash the bare 32-byte state. Returns (state_digest, (count,)
    u32 indices in draw order)."""
    d = hash_parts(first_parts)
    idx0 = index_from_digest(d, max_value)
    slots = jnp.zeros((count,), _U32).at[0].set(idx0)
    lane = jnp.arange(count, dtype=_U32)

    def cond(c):
        return c[2] < count

    def body(c):
        d, arr, cnt = c
        d = ratchet(d)
        idx = index_from_digest(d, max_value)
        dup = jnp.any((arr == idx) & (lane < cnt))
        arr = jnp.where((lane == cnt) & ~dup, idx, arr)
        return d, arr, cnt + jnp.where(dup, 0, 1).astype(jnp.uint32)

    d, slots, _ = jax.lax.while_loop(
        cond, body, (d, slots, jnp.uint32(1))
    )
    return d, slots
