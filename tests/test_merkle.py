"""SHA-256 + Merkle tests: device kernels vs hashlib, tree semantics vs the
reference (reference tests: src/merkle.rs:125-190)."""

import hashlib

import numpy as np
import jax.numpy as jnp

from toyni_tpu.ops import sha256 as sha
from toyni_tpu import merkle
from toyni_tpu.field.babybear import P

RNG = np.random.default_rng(42)


def ref_salted_leaf_bytes(value: int, salt: bytes) -> bytes:
    return salt + int(value).to_bytes(8, "little")


def ref_unsalted_leaf_bytes(value: int) -> bytes:
    return int(value).to_bytes(8, "little")


# ── batched SHA-256 vs hashlib ──────────────────────────────────────────────

def test_salted_leaf_hash_matches_hashlib():
    n = 257  # odd on purpose
    values = RNG.integers(0, P, n, dtype=np.uint64).astype(np.uint32)
    salts = RNG.integers(0, 256, (n, 16), dtype=np.uint64).astype(np.uint8)
    got = sha.hash_salted_leaves(jnp.asarray(values), jnp.asarray(salts))
    got = np.asarray(got, np.uint32)
    for i in range(0, n, 17):
        expect = hashlib.sha256(
            b"\x00" + bytes(salts[i]) + int(values[i]).to_bytes(8, "little")
        ).digest()
        assert sha.digest_bytes(got[i]) == expect, f"leaf {i}"


def test_unsalted_leaf_hash_matches_hashlib():
    values = np.array([0, 1, P - 1, 123456789], np.uint32)
    got = np.asarray(sha.hash_unsalted_leaves(jnp.asarray(values)), np.uint32)
    for i, v in enumerate(values):
        expect = hashlib.sha256(b"\x00" + int(v).to_bytes(8, "little")).digest()
        assert sha.digest_bytes(got[i]) == expect


def test_node_hash_matches_hashlib():
    n = 64
    left = RNG.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
    right = RNG.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(sha.hash_nodes(jnp.asarray(left), jnp.asarray(right)), np.uint32)
    for i in range(0, n, 7):
        lb = sha.digest_bytes(left[i])
        rb = sha.digest_bytes(right[i])
        expect = hashlib.sha256(b"\x01" + lb + rb).digest()
        assert sha.digest_bytes(got[i]) == expect


# ── tree semantics ──────────────────────────────────────────────────────────

def _build_and_check(n):
    values = RNG.integers(0, P, n, dtype=np.uint64).astype(np.uint32)
    salts = RNG.integers(0, 256, (n, 16), dtype=np.uint64).astype(np.uint8)
    tree = merkle.build_salted_tree(jnp.asarray(values), salts)
    root = tree.root()
    # root matches the host hashlib oracle
    oracle_root = merkle.host_tree_root(
        [ref_salted_leaf_bytes(int(values[i]), bytes(salts[i])) for i in range(n)]
    )
    assert root == oracle_root
    # every proof verifies; wrong leaf rejected
    for i in range(n):
        proof = tree.get_proof(i)
        leaf = ref_salted_leaf_bytes(int(values[i]), bytes(salts[i]))
        assert merkle.verify_merkle_proof(leaf, proof, root), f"leaf {i}"
        bad = ref_salted_leaf_bytes((int(values[i]) + 1) % P, bytes(salts[i]))
        assert not merkle.verify_merkle_proof(bad, proof, root)


def test_tree_pow2():
    _build_and_check(8)


def test_tree_odd():
    # reference: src/merkle.rs:146-155 (odd-duplication path)
    _build_and_check(3)
    _build_and_check(5)
    _build_and_check(13)


def test_tree_single_leaf():
    # reference: src/merkle.rs:158-165
    _build_and_check(1)


def test_unsalted_tree_matches_verifier_recompute():
    # the final-FRI-layer contract: verifier recomputes the root from values
    # (src/verifier.rs:241-244)
    values = RNG.integers(0, P, 8, dtype=np.uint64).astype(np.uint32)
    tree = merkle.build_unsalted_tree(jnp.asarray(values))
    oracle_root = merkle.host_tree_root(
        [ref_unsalted_leaf_bytes(int(v)) for v in values]
    )
    assert tree.root() == oracle_root


def test_leaf_node_domain_separation():
    # reference: src/merkle.rs:179-189 — an inner node hash committed as a
    # leaf yields a different root
    a = hashlib.sha256(b"\x00" + b"a").digest()
    b = hashlib.sha256(b"\x00" + b"b").digest()
    node_root = merkle.hash_node_bytes(a, b)
    masquerade = merkle.host_tree_root([node_root])
    assert masquerade != node_root


def test_two_block_message_boundary():
    # node hashing crosses the 64-byte block boundary (65-byte message);
    # check against hashlib for adversarial byte patterns
    left = np.full((1, 8), 0xFFFFFFFF, np.uint32)
    right = np.zeros((1, 8), np.uint32)
    got = np.asarray(sha.hash_nodes(jnp.asarray(left), jnp.asarray(right)), np.uint32)
    expect = hashlib.sha256(b"\x01" + b"\xff" * 32 + b"\x00" * 32).digest()
    assert sha.digest_bytes(got[0]) == expect


def test_leafless_device_tree_roundtrip(monkeypatch):
    """Huge trees drop the stored leaf level; openings must still verify."""
    import jax.numpy as jnp
    from toyni_tpu import merkle as mk
    from toyni_tpu.ops import sha256 as sha

    monkeypatch.setattr(mk, "LEAFLESS_MIN", 8)
    mk._tree_builder.cache_clear()
    n = 16
    values = RNG.integers(0, P, n, dtype=np.uint64).astype(np.uint32)
    salts = RNG.integers(0, 256, (n, 16), dtype=np.uint64).astype(np.uint8)
    tree = mk.build_salted_device_tree(jnp.asarray(values), salts)
    assert not tree.has_leaf_level
    assert tree.num_leaves == n and tree.depth == 4

    # root matches the leaf-level-keeping build
    full = mk.MerkleTree(
        [np.asarray(l, np.uint32) for l in mk._device_levels(
            sha.hash_salted_leaves(jnp.asarray(values), jnp.asarray(salts)))]
    )
    assert tree.root() == full.root()

    # reconstruct a path: sibling leaf digest + gathered upper levels
    idx = 5
    sib_digest = sha.hash_salted_leaves(
        jnp.asarray(values[idx ^ 1 : (idx ^ 1) + 1]),
        jnp.asarray(salts[idx ^ 1 : (idx ^ 1) + 1]),
    )
    upper = np.asarray(
        mk.extract_paths(tree.levels, jnp.asarray([idx >> 1], np.int32)), np.uint32
    )
    path = [sha.digest_bytes(np.asarray(sib_digest[0], np.uint32))] + [
        sha.digest_bytes(upper[0, l]) for l in range(upper.shape[1])
    ]
    positions, cur = [], idx
    for _ in range(4):
        positions.append(cur % 2 == 1)
        cur //= 2
    leaf = bytes(salts[idx]) + int(values[idx]).to_bytes(8, "little")
    assert mk.verify_merkle_proof(leaf, mk.MerkleProof(path, positions), tree.root())
    mk._tree_builder.cache_clear()


# ── ext-codeword leaves (ext-challenges soundness mode) ─────────────────────

def test_salted_ext_leaf_hash_matches_hashlib():
    from toyni_tpu.field import ext as extf

    n = 129
    values = RNG.integers(0, P, (n, 4), dtype=np.uint64).astype(np.uint32)
    salts = RNG.integers(0, 256, (n, 16), dtype=np.uint64).astype(np.uint8)
    got = np.asarray(
        sha.hash_salted_leaves_ext(jnp.asarray(values), jnp.asarray(salts)),
        np.uint32,
    )
    for i in range(0, n, 13):
        v = tuple(int(x) for x in values[i])
        expect = hashlib.sha256(
            b"\x00" + bytes(salts[i]) + extf.h_to_bytes(v)
        ).digest()
        assert sha.digest_bytes(got[i]) == expect, f"leaf {i}"


def test_unsalted_ext_leaf_hash_matches_hashlib():
    from toyni_tpu.field import ext as extf

    n = 64
    values = RNG.integers(0, P, (n, 4), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(sha.hash_unsalted_leaves_ext(jnp.asarray(values)), np.uint32)
    for i in range(0, n, 7):
        v = tuple(int(x) for x in values[i])
        expect = hashlib.sha256(b"\x00" + extf.h_to_bytes(v)).digest()
        assert sha.digest_bytes(got[i]) == expect, f"leaf {i}"


def test_rolled_and_unrolled_sha_identical():
    """The rolled (fori_loop) and unrolled compression forms must produce
    identical digests — the fused prover traces under `sha256.forced(False)`
    (program-size control) and relies on this equivalence."""
    import numpy as np
    import jax.numpy as jnp

    from toyni_tpu.field.babybear import P
    from toyni_tpu.ops import sha256 as sha

    rng = np.random.default_rng(21)
    vals = jnp.asarray(
        rng.integers(0, P, 64, dtype=np.uint64).astype(np.uint32)
    )
    salts = jnp.asarray(
        rng.integers(0, 2**32, (64, 4), dtype=np.uint64).astype(np.uint32)
    )
    with sha.forced(False):
        rolled = np.asarray(sha.hash_salted_leaves(vals, salts))
        rolled_n = np.asarray(
            sha.hash_nodes(jnp.asarray(rolled[0::2]), jnp.asarray(rolled[1::2]))
        )
    with sha.forced(True):
        unrolled = np.asarray(sha.hash_salted_leaves(vals, salts))
        unrolled_n = np.asarray(
            sha.hash_nodes(jnp.asarray(rolled[0::2]), jnp.asarray(rolled[1::2]))
        )
    np.testing.assert_array_equal(rolled, unrolled)
    np.testing.assert_array_equal(rolled_n, unrolled_n)
    # the context restores the previous selection
    assert sha._unrolled() in (True, False)


def test_sha256_compression_forms_identical():
    """The three compression lowerings (unrolled / chunked / rolled) produce
    identical digests on every leaf/node entry point (see ops/sha256.py
    `_form` for why three exist)."""
    import numpy as np
    import jax.numpy as jnp

    from toyni_tpu.ops import sha256 as sha

    rng = np.random.default_rng(7)
    N = 21
    vals = jnp.asarray(rng.integers(0, P, N).astype(np.uint32))
    salts = jnp.asarray(
        rng.integers(0, 2**32, (N, 4), dtype=np.uint64).astype(np.uint32)
    )
    ev = jnp.asarray(rng.integers(0, P, (N, 4)).astype(np.uint32))
    mv = jnp.asarray(rng.integers(0, P, (5, N)).astype(np.uint32))

    def all_digests():
        leaves = sha.hash_salted_leaves(vals, salts)
        return [
            np.asarray(x) for x in (
                leaves,
                sha.hash_unsalted_leaves(vals),
                sha.hash_salted_leaves_ext(ev, salts),
                sha.hash_unsalted_leaves_ext(ev),
                sha.hash_salted_leaves_multi(mv, salts),
                sha.hash_nodes(leaves[0:20:2], leaves[1:20:2]),
            )
        ]

    outs = {}
    # NOTE: "unrolled" is excluded on CPU — XLA:CPU cannot compile it
    for form in ("rolled", "chunked"):
        with sha.forced(form):
            outs[form] = all_digests()
    for a, b in zip(outs["rolled"], outs["chunked"]):
        np.testing.assert_array_equal(a, b)
