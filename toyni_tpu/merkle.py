"""Salted SHA-256 Merkle commitments, TPU-batched.

Same tree semantics as the reference (reference: src/merkle.rs): leaf level =
SHA256(0x00 || leaf), inner node = SHA256(0x01 || left || right), the last
node of an odd level duplicated as its own sibling, all levels retained for
proof extraction. The structural change: leaf and node hashing happen as
*batched device kernels* (one call per level hashing every node in parallel —
the reference's per-leaf loop at src/merkle.rs:30-47 has no cross-leaf
dependency, which is exactly what the VPU exploits), and the finished levels
are pulled to the host once for path extraction, which is pure indexing.

Salting (hiding commitments, src/fibonacci.rs:327-353): leaf_i =
H(salt_i(16B) || value_i(8B LE)); the final FRI layer commits unsalted
(src/fibonacci.rs:357-363).
"""

from __future__ import annotations

import functools
import hashlib
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from .ops import sha256 as sha


def _hash_backend(kind: str):
    """Device hash module for a tree kind: 'sha256' (the reference's hash,
    src/merkle.rs:105-123) or 'poseidon2' (the arithmetic-hash mode,
    ops/poseidon2.py). Both expose the same entry-point names and (..., 8)
    u32 digest arrays; they differ in leaf/node functions and in the
    digest byte codec (BE words for SHA-256, LE words for Poseidon2)."""
    if kind == "sha256":
        return sha
    if kind == "poseidon2":
        from .ops import poseidon2 as p2

        return p2
    raise ValueError(f"unknown hash kind: {kind!r}")


@dataclass
class MerkleProof:
    """Sibling path bottom-up; position[i] True = sibling is on the LEFT of
    the current hash (i.e. current index was odd) — same convention as the
    reference's `position` flags (src/merkle.rs:60-75)."""

    path: list  # list[bytes], 32-byte digests
    position: list  # list[bool]


class MerkleTree:
    """A fully-built tree: levels[0] = leaf digests ... levels[-1] = [root].

    Levels are stored as host numpy (n_i, 8) uint32 arrays; building happens
    on device via `build_levels`.
    """

    def __init__(self, levels: list):
        self.levels = levels  # list of np.ndarray (n_i, 8) uint32

    @property
    def num_leaves(self) -> int:
        return len(self.levels[0])

    def root(self) -> bytes:
        return sha.digest_bytes(self.levels[-1][0])

    def get_proof(self, index: int) -> MerkleProof:
        if index >= self.num_leaves:
            raise IndexError("leaf index out of bounds")
        path, position = [], []
        cur = index
        for level in self.levels[:-1]:
            sib = cur + 1 if cur % 2 == 0 else cur - 1
            if sib >= len(level):
                # odd level: last node is its own sibling, treated as right
                # (src/merkle.rs:67-71)
                path.append(sha.digest_bytes(level[cur]))
                position.append(True)
            else:
                path.append(sha.digest_bytes(level[sib]))
                position.append(cur % 2 == 1)
            cur //= 2
        return MerkleProof(path, position)


def build_levels(leaf_digests: jnp.ndarray) -> list:
    """Hash pairwise up from (n, 8) u32 leaf digests; returns host levels.

    Each level is one batched `hash_nodes` call over all pairs; odd levels
    duplicate the last node (src/merkle.rs:34-47).
    """
    levels = [leaf_digests]
    cur = leaf_digests
    while cur.shape[0] > 1:
        if cur.shape[0] % 2 == 1:
            cur = jnp.concatenate([cur, cur[-1:]], axis=0)
        nxt = sha.hash_nodes(cur[0::2], cur[1::2])
        levels.append(nxt)
        cur = nxt
    return [np.asarray(l, np.uint32) for l in levels]


def build_salted_tree(values: jnp.ndarray, salts: np.ndarray) -> MerkleTree:
    """Hiding commitment to a (n,) u32 value vector with (n, 16) u8 salts
    (the analog of build_merkle_tree, src/fibonacci.rs:340-353)."""
    digests = sha.hash_salted_leaves(values, jnp.asarray(salts))
    return MerkleTree(build_levels(digests))


def build_unsalted_tree(values: jnp.ndarray) -> MerkleTree:
    """Public commitment (leaf = value bytes), for the final FRI layer
    (src/fibonacci.rs:357-363)."""
    digests = sha.hash_unsalted_leaves(values)
    return MerkleTree(build_levels(digests))


class DeviceTree:
    """A Merkle tree whose levels stay on device; only roots and opened
    paths ever cross to the host (the reference keeps whole trees in host
    memory, src/merkle.rs:10-13 — here a query opening is a handful of
    device gathers instead of a full-tree transfer).

    Levels are row-major (n_i, 8) uint32 digest arrays, bottom-up. (A planar
    (8, n_i) Pallas-kernel layout existed in round 1 and was RETIRED with its
    kernels: the Mosaic SHA-256 measured ~12x slower than the XLA unrolled
    path on v5e — ~2 vs ~24 Mhash/s at 2^21 rolled, 280 unrolled — because
    the 64-round serial dependency chain does not pipeline under Mosaic; see
    PERF.md "SHA-256 / Merkle".)"""

    def __init__(self, levels: list, has_leaf_level: bool = True,
                 kind: str = "sha256", pruned: int | None = None):
        self.levels = levels
        # Huge trees drop the bottom `pruned` digest levels (level 0 alone
        # is 1 GB at 2^25 leaves, 4.3 GB at the 2^27 protocol ceiling);
        # query-time sibling digests are recomputed from values + salts —
        # a 2^pruned-leaf block rehash per opened index.
        self.pruned = (0 if has_leaf_level else 1) if pruned is None else pruned
        self.kind = kind
        self._root = None

    @property
    def has_leaf_level(self) -> bool:
        return self.pruned == 0

    @property
    def num_leaves(self) -> int:
        return self.levels[0].shape[0] << self.pruned

    @property
    def depth(self) -> int:
        """Number of path elements in an opening."""
        return len(self.levels) - 1 + self.pruned

    def root(self) -> bytes:
        if self._root is None:
            self._root = _hash_backend(self.kind).digest_bytes(
                np.asarray(self.levels[-1][0], np.uint32)
            )
        return self._root


# trees at or above this leaf count drop the stored leaf level
LEAFLESS_MIN = 1 << 22
# trees at or above this leaf count drop the bottom PRUNE_DEPTH levels
# (the protocol-ceiling memory regime: a FULL level set at LDE 2^27 is
# ~4.3 GB per tree and a proof carries ~5 big trees — more than a chip's
# HBM; at depth 7 the stored top is 1/128th of that and each opened path
# costs one 128-leaf block rehash in the query gather)
PRUNE_MIN = 1 << 26
PRUNE_DEPTH = 7


def prune_levels(n_leaves: int, salted: bool) -> int:
    """How many bottom digest levels a built tree drops at this size.
    Unsalted trees (the tiny final FRI layer) always keep everything."""
    if not salted or n_leaves < LEAFLESS_MIN:
        return 0
    if n_leaves < PRUNE_MIN:
        return 1
    return PRUNE_DEPTH


# Lanes per chunk of a STREAMED huge-tree build (see _levels_salted_pruned):
# 2^21 keeps the VPU fully fed while bounding the SHA working set to
# ~20 x 8 MB of temps per chunk instead of ~20 x 256 MB+ for a whole
# 2^26+ layer — the HLO-temp OOM that blocked the protocol ceiling.
CHUNK_LANES = 1 << 21


def _levels_salted_pruned(values, salts_arg, pruned: int, kind: str,
                          mode: str = "base"):
    """Stored levels (level `pruned` and up) of a salted tree, with the
    bottom `pruned` levels built CHUNK-STREAMED in a fori_loop: each
    iteration leaf-hashes CHUNK_LANES leaves (salts taken from the key or
    sliced from the array), folds them `pruned` levels down, and writes
    the chunk's level-`pruned` nodes. Neither the leaf-digest level nor
    the full salt layer is ever materialized, the SHA temp working set is
    per-chunk, and the unrolled compression is TRACED ONCE (the fori body)
    instead of once per level — huge-tree builds stop being both the HBM
    and the Python-tracing bottleneck. Identical bytes to the unstreamed
    build (the chunking is pure scheduling)."""
    import jax

    h = _hash_backend(kind)
    field = kind != "sha256"
    n = values.shape[1] if mode == "multi" else values.shape[0]
    chunks = max(1, n // CHUNK_LANES)
    W = n // chunks
    assert W % (1 << pruned) == 0

    def _salt_slice(start):
        if salts_arg.ndim == 1:  # (2,) threefry key (ops/salts.py)
            from .ops import salts as salts_mod

            idx = start + jnp.arange(W, dtype=jnp.uint32)
            return salts_mod.salts_for_indices(salts_arg, idx, field)
        return jax.lax.dynamic_slice_in_dim(salts_arg, start, W, axis=0)

    def _leaf_digests(v, s):
        if mode == "ext":
            return h.hash_salted_leaves_ext(v, s)
        if mode == "multi":
            return h.hash_salted_leaves_multi(v, s)
        return h.hash_salted_leaves(v, s)

    def body(ci, out):
        start = ci * W
        if mode == "multi":
            v = jax.lax.dynamic_slice_in_dim(values, start, W, axis=1)
        else:
            v = jax.lax.dynamic_slice_in_dim(values, start, W, axis=0)
        d = _leaf_digests(v, _salt_slice(start))
        for _ in range(pruned):
            d = h.hash_nodes(d[0::2], d[1::2])
        return jax.lax.dynamic_update_slice_in_dim(
            out, d, ci * (W >> pruned), axis=0
        )

    base = jax.lax.fori_loop(
        0, chunks, body, jnp.zeros((n >> pruned, 8), jnp.uint32)
    )
    return _device_levels(base, kind)


@functools.lru_cache(maxsize=64)
def _tree_builder(n_leaves: int, salted: bool, ext: bool = False,
                  kind: str = "sha256", saltless: bool = False):
    """One jitted program per (leaf count, salted, ext, hash kind): leaf
    hashing + every level, a SINGLE device dispatch per tree build. Dispatch
    count is the scarce resource on a remote-attached device (~25 ms per
    round trip on this deployment's tunnel); compiles are amortized by the
    persistent compilation cache.

    `saltless`: the salts argument is a (2,) threefry key and the whole
    (n, 4) salt layer is generated IN-GRAPH (ops/salts.py) — an XLA
    temporary freed after leaf hashing, never stored in HBM."""
    import jax

    h = _hash_backend(kind)
    pr = prune_levels(n_leaves, salted)
    leaf_salted = h.hash_salted_leaves_ext if ext else h.hash_salted_leaves
    leaf_plain = h.hash_unsalted_leaves_ext if ext else h.hash_unsalted_leaves
    if salted:
        from .ops import salts as salts_mod

        field = kind != "sha256"

        def f(values, salts_dev):
            if pr >= 2:
                # deep pruning = the huge-layer regime: stream the bottom
                # of the tree chunk-wise (bounded temps, single-traced SHA)
                return _levels_salted_pruned(
                    values, salts_dev, pr, kind, "ext" if ext else "base"
                )
            if saltless:
                salts_dev = salts_mod.salts_full(salts_dev, n_leaves, field)
            lv = _device_levels(leaf_salted(values, salts_dev), kind)
            return lv[pr:] if pr else lv
    else:
        def f(values):
            lv = _device_levels(leaf_plain(values), kind)
            return lv[pr:] if pr else lv
    return jax.jit(f)


def build_salted_device_tree(values: jnp.ndarray, salts, ext: bool = False,
                             kind: str = "sha256") -> DeviceTree:
    """`salts` is either the (n, 4) salt-word array or — the huge-layer
    memory mode — a (2,) threefry key from which the layer's salts are
    generated in-graph (ops/salts.py)."""
    salts = jnp.asarray(salts)
    saltless = salts.ndim == 1
    fn = _tree_builder(values.shape[0], True, ext, kind, saltless)
    return DeviceTree(
        fn(values, salts),
        kind=kind,
        pruned=prune_levels(values.shape[0], True),
    )


def build_unsalted_device_tree(values: jnp.ndarray, ext: bool = False,
                               kind: str = "sha256") -> DeviceTree:
    fn = _tree_builder(values.shape[0], False, ext, kind)
    return DeviceTree(fn(values), has_leaf_level=True, kind=kind)


def _device_levels(leaf_digests: jnp.ndarray, kind: str = "sha256") -> list:
    h = _hash_backend(kind)
    levels = [leaf_digests]
    cur = leaf_digests
    while cur.shape[0] > 1:
        if cur.shape[0] % 2 == 1:
            cur = jnp.concatenate([cur, cur[-1:]], axis=0)
        cur = h.hash_nodes(cur[0::2], cur[1::2])
        levels.append(cur)
    return levels


def extract_paths(levels: list, indices: jnp.ndarray) -> jnp.ndarray:
    """Device gather of sibling paths for power-of-two trees.

    indices: (Q,) int32. Returns (Q, depth, 8) uint32 sibling digests,
    bottom-up (position flags are recomputed on host from the indices)."""
    idx = jnp.asarray(indices, jnp.int32)
    out = []
    for level in levels[:-1]:
        out.append(jnp.take(level, idx ^ 1, axis=0))
        idx = idx >> 1
    return jnp.stack(out, axis=1)


def openings_from_paths(indices, paths_np, depth: int,
                        kind: str = "sha256") -> list:
    """Host assembly: (Q, depth, 8) path words -> list[MerkleProof].
    `kind` picks the digest byte codec (BE words for SHA-256, LE for
    Poseidon2)."""
    to_bytes = _hash_backend(kind).digest_bytes
    proofs = []
    for qi, path in zip(indices, paths_np):
        p, pos = [], []
        idx = qi
        for l in range(depth):
            p.append(to_bytes(path[l]))
            pos.append(idx % 2 == 1)
            idx //= 2
        proofs.append(MerkleProof(p, pos))
    return proofs


# ── host-side verification (the verifier's oracle path) ─────────────────────

def hash_leaf_bytes(data: bytes) -> bytes:
    """SHA256(0x00 || data) (src/merkle.rs:109-114)."""
    return hashlib.sha256(b"\x00" + data).digest()


def hash_node_bytes(left: bytes, right: bytes) -> bytes:
    """SHA256(0x01 || left || right) (src/merkle.rs:117-123)."""
    return hashlib.sha256(b"\x01" + left + right).digest()


def verify_merkle_proof(leaf: bytes, proof: MerkleProof, root: bytes) -> bool:
    """Stateless path verification (src/merkle.rs:87-101). Dispatches to the
    native C++ runtime when built (identical bytes — differential-tested);
    the hashlib path is the always-available oracle."""
    from . import native

    if native.available():
        return native.merkle_verify(leaf, proof.path, proof.position, root)
    cur = hash_leaf_bytes(leaf)
    for sibling, is_right in zip(proof.path, proof.position):
        cur = hash_node_bytes(sibling, cur) if is_right else hash_node_bytes(cur, sibling)
    return cur == root


def host_tree_root(leaves: list) -> bytes:
    """Host tree build, the differential oracle for `build_levels` and the
    verifier's unsalted-root recomputation (src/verifier.rs:241-244).
    `leaves` is a list of byte strings; fixed-width leaf sets take the
    native C++ batched path when the runtime is built."""
    from . import native

    if leaves and native.available():
        w = len(leaves[0])
        if all(len(l) == w for l in leaves):
            arr = np.frombuffer(b"".join(leaves), np.uint8).reshape(
                len(leaves), w
            )
            digests = native.merkle_leaf_hashes(arr)
            levels = native.merkle_build_levels(digests)
            top = levels[-1][0] if levels else digests[0]
            return bytes(top)
    level = [hash_leaf_bytes(l) for l in leaves]
    while len(level) > 1:
        if len(level) % 2 == 1:
            level.append(level[-1])
        level = [hash_node_bytes(level[i], level[i + 1]) for i in range(0, len(level), 2)]
    return level[0]
