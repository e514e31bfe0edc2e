"""Native C++ host runtime tests: differential vs hashlib / NumPy oracle /
the pure-Python Merkle path. Skips if no toolchain (the reference's pattern
for missing nvcc, src/ntt.rs:259-268)."""

import hashlib

import numpy as np
import pytest

from toyni_tpu import native
from toyni_tpu.field import oracle
from toyni_tpu.field.babybear import P, get_root_of_unity

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)

RNG = np.random.default_rng(31337)


def test_native_ntt_matches_oracle():
    n = 1024
    omega = get_root_of_unity(10)
    x = RNG.integers(0, P, n, dtype=np.uint64)
    np.testing.assert_array_equal(native.ntt(x, omega), oracle.ntt(x, omega))


def test_native_intt_roundtrip():
    n = 4096
    omega = get_root_of_unity(12)
    x = RNG.integers(0, P, n, dtype=np.uint64)
    np.testing.assert_array_equal(native.intt(native.ntt(x, omega), omega), x)


def test_native_sha256_matches_hashlib():
    for msg_len in (9, 25, 64, 65, 100):
        msgs = RNG.integers(0, 256, (33, msg_len), dtype=np.uint64).astype(np.uint8)
        got = native.sha256_batch(msgs)
        for i in range(33):
            assert bytes(got[i]) == hashlib.sha256(bytes(msgs[i])).digest()


def test_native_merkle_matches_python():
    from toyni_tpu import merkle as pymerkle

    leaves = [bytes(RNG.integers(0, 256, 24, dtype=np.uint64).astype(np.uint8))
              for _ in range(13)]  # odd count exercises duplication
    py_root = pymerkle.host_tree_root(leaves)

    digests = native.merkle_leaf_hashes(
        np.frombuffer(b"".join(leaves), np.uint8).reshape(13, 24)
    )
    levels = native.merkle_build_levels(digests)
    assert bytes(levels[-1][0]) == py_root


def test_native_merkle_verify():
    from toyni_tpu import merkle as pymerkle
    from toyni_tpu.ops import sha256 as sha
    import jax.numpy as jnp

    values = RNG.integers(0, P, 8, dtype=np.uint64).astype(np.uint32)
    salts = RNG.integers(0, 256, (8, 16), dtype=np.uint64).astype(np.uint8)
    tree = pymerkle.build_salted_tree(jnp.asarray(values), salts)
    root = tree.root()
    for i in range(8):
        proof = tree.get_proof(i)
        leaf = bytes(salts[i]) + int(values[i]).to_bytes(8, "little")
        assert native.merkle_verify(leaf, proof.path, proof.position, root)
        bad = bytes(salts[i]) + int((values[i] + 1) % P).to_bytes(8, "little")
        assert not native.merkle_verify(bad, proof.path, proof.position, root)
