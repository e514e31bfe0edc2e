"""Counter-mode salt generation: threefry2x32, sliceable at any index.

The hiding commitments salt every leaf with 16 random bytes
(reference: src/fibonacci.rs:327-353). Rounds 1-3 drew them as one
`jax.random.bits(key, (N, 4))` array per committed layer and KEPT the array
for the query phase — at the protocol ceiling (LDE 2^27) that is 2 GiB per
salted layer, ~10 GiB per proof, more than a v5e chip's HBM.

This module removes the storage: salts become a FUNCTION of (key, leaf
index). jax's partitionable threefry layout is already counter-mode —
element i of `random.bits(key, shape)` is

    bits[i] = y0 ^ y1,  (y0, y1) = threefry2x32(key, (hi32(i), lo32(i)))

— so any slice is computable from the key alone, bit-identically to the
bulk draw. The cipher below is a self-contained clone of the Threefry-2x32
block function (Salmon et al., 'Parallel random numbers: as easy as
1, 2, 3'; 20 rounds, jax's exact key/rotation schedule): proof bytes
therefore do NOT depend on jax's default PRNG remaining 'threefry2x32
partitionable' — tests pin equality against the jax bulk draw under the
CURRENT default, and the clone itself pins the byte stream for
golden-proof stability.

Provers use `salts_full` for whole committed layers (inside the commit
program: the array is an XLA temporary, freed after leaf hashing) and
`salts_for_indices` at query time (the handful of opened leaves).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field.babybear import P

_M32 = jnp.uint32(0xFFFFFFFF)


def key_words(seed: int) -> np.ndarray:
    """The (2,) uint32 key `jax.random.PRNGKey(seed)` produces in this
    runtime configuration (x64 DISABLED, the default everywhere in this
    framework): the seed is converted to a 32-bit lane before the key
    split, so the key is (0, seed mod 2^32). Rounds 1-3 drew all salts
    through PRNGKey with 63-bit rng seeds — only the low 32 bits ever
    reached the key — and golden-proof compatibility requires reproducing
    exactly that mapping (tests pin equality against PRNGKey at runtime)."""
    return np.array([0, int(seed) & 0xFFFFFFFF], np.uint32)


def _rotl(x, d: int):
    return (x << jnp.uint32(d)) | (x >> jnp.uint32(32 - d))


_ROTS = ((13, 15, 26, 6), (17, 29, 16, 24))


def threefry2x32(k0, k1, x0, x1):
    """The Threefry-2x32 block function over uint32 arrays (20 rounds, the
    jax lowering's exact schedule). k0/k1 scalars or arrays; x0/x1 arrays."""
    ks0, ks1 = jnp.uint32(k0), jnp.uint32(k1)
    ks2 = ks0 ^ ks1 ^ jnp.uint32(0x1BD11BDA)
    ks = (ks0, ks1, ks2)
    x0 = x0 + ks0
    x1 = x1 + ks1
    for g in range(5):
        for r in _ROTS[g % 2]:
            x0 = x0 + x1
            x1 = x0 ^ _rotl(x1, r)
        x0 = x0 + ks[(g + 1) % 3]
        x1 = x1 + ks[(g + 2) % 3] + jnp.uint32(g + 1)
    return x0, x1


def _bits_at_flat(key, flat_idx):
    """bits[flat] of the counter stream for uint32 draws: flat as int64-safe
    index array (values < 2^32 here — leaf counts are bounded by 2-adicity
    2^27, so 4*N < 2^29 and hi32 is always zero, but keep the general
    form)."""
    flat = flat_idx.astype(jnp.uint64)
    hi = (flat >> jnp.uint64(32)).astype(jnp.uint32)
    lo = (flat & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    y0, y1 = threefry2x32(key[0], key[1], hi, lo)
    return y0 ^ y1


def _field_mask(bits):
    """Poseidon2-mode masking: salt words are BabyBear field elements
    (31-bit mask + one conditional subtract — prover._salts' exact steps)."""
    bits = bits & jnp.uint32(0x7FFFFFFF)
    return jnp.where(bits >= jnp.uint32(P), bits - jnp.uint32(P), bits)


def salts_full(key, count: int, field: bool = False) -> jnp.ndarray:
    """(count, 4) u32 salt words — bit-identical to
    `jax.random.bits(PRNGKey(seed), (count, 4))` (+ field masking when
    `field`). Traceable: `key` is a (2,) u32 array argument, so whole-layer
    salts can be generated INSIDE a commit program and freed by XLA after
    leaf hashing instead of living in HBM for the query phase."""
    flat = jnp.arange(count * 4, dtype=jnp.uint32)
    bits = _bits_at_flat(key, flat).reshape(count, 4)
    return _field_mask(bits) if field else bits


def salts_for_indices(key, leaf_idx, field: bool = False) -> jnp.ndarray:
    """(Q, 4) salt words for the given leaf indices — the query-time slice,
    equal to `salts_full(key, N, field)[leaf_idx]` for any N > max(idx)."""
    idx = jnp.asarray(leaf_idx)
    flat = idx[:, None].astype(jnp.uint32) * jnp.uint32(4) + jnp.arange(
        4, dtype=jnp.uint32
    )
    bits = _bits_at_flat(key, flat)
    return _field_mask(bits) if field else bits
