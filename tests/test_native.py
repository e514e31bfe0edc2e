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


# ── full native STARK verifier (wire format v1) ─────────────────────────────

@pytest.fixture(scope="module")
def _v1_blob():
    from toyni_tpu import proof as proof_mod
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.trace import ExecutionTrace

    fibs, a, b = [], 1, 1
    for _ in range(64):
        fibs.append(a % P)
        a, b = b, (a + b) % P
    t = ExecutionTrace()
    t.insert_column(fibs)
    return proof_mod.serialize(StarkProver(t, seed=7).generate_proof())


def test_native_verifier_accepts_valid_proof(_v1_blob):
    assert native.verify_proof_blob(_v1_blob) is True


def test_native_verifier_rejects_tampers(_v1_blob):
    from toyni_tpu import proof as proof_mod

    for mut in range(4):
        bad = proof_mod.deserialize(_v1_blob)
        if mut == 0:
            bad.t_z = (bad.t_z + 1) % P
        elif mut == 1:
            bad.fri_final_layer[0] = (bad.fri_final_layer[0] + 1) % P
        elif mut == 2:
            c = bytearray(bad.trace_commitment)
            c[0] ^= 1
            bad.trace_commitment = bytes(c)
        else:
            bad.query_proofs[0].quotient_opening.value += 1
        assert native.verify_proof_blob(proof_mod.serialize(bad)) is False


def test_native_verifier_agrees_with_python_oracle_under_fuzz(_v1_blob):
    """Byte-flip + truncation fuzz: the native verdict must equal the Python
    verifier's (treating deserialize errors as non-accepting) on every
    mutated blob — the Python verifier is the bit-exactness oracle."""
    import random

    from toyni_tpu import proof as proof_mod
    from toyni_tpu.verifier import StarkVerifier

    v = StarkVerifier()
    rng = random.Random(0xC0DE)
    for _ in range(120):
        b = bytearray(_v1_blob)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        data = bytes(b)
        try:
            py_acc = v.verify(proof_mod.deserialize(data))
        except Exception:
            py_acc = False
        try:
            nat_acc = native.verify_proof_blob(data)
        except Exception:
            nat_acc = False
        assert py_acc == nat_acc
    for _ in range(20):
        data = _v1_blob[: rng.randrange(1, len(_v1_blob))]
        try:
            py_acc = v.verify(proof_mod.deserialize(data))
        except Exception:
            py_acc = False
        try:
            nat_acc = native.verify_proof_blob(data)
        except Exception:
            nat_acc = False
        assert py_acc == nat_acc


def test_native_verifier_ext_mode_v2():
    """v2 (extension-field challenges): native accept on a valid proof,
    mode-mismatch rejection both ways, and fuzz agreement with the oracle."""
    import random

    from toyni_tpu import proof as proof_mod
    from toyni_tpu.config import StarkConfig
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.trace import ExecutionTrace
    from toyni_tpu.verifier import StarkVerifier

    fibs, a, b = [], 1, 1
    for _ in range(64):
        fibs.append(a % P)
        a, b = b, (a + b) % P
    t = ExecutionTrace()
    t.insert_column(fibs)
    cfg = StarkConfig(ext_challenges=True)
    blob = proof_mod.serialize(
        StarkProver(t, config=cfg, seed=5).generate_proof()
    )
    assert native.verify_proof_blob(blob, cfg) is True
    assert native.verify_proof_blob(blob) is False  # base cfg vs ext proof

    v = StarkVerifier(config=cfg)
    rng = random.Random(0xE2)
    for _ in range(60):
        bb2 = bytearray(blob)
        bb2[rng.randrange(len(bb2))] ^= 1 << rng.randrange(8)
        data = bytes(bb2)
        try:
            py_acc = v.verify(proof_mod.deserialize(data))
        except Exception:
            py_acc = False
        try:
            nat_acc = native.verify_proof_blob(data, cfg)
        except Exception:
            nat_acc = False
        assert py_acc == nat_acc


def test_native_verifier_multi_formats_v3_v4():
    """v3/v4 (multi-column / multi-constraint, base and ext): native accept
    for the bundled Pair and Sbox AIRs, shape-mismatch rejection, and fuzz
    agreement with the Python oracle."""
    import random

    from toyni_tpu import proof as proof_mod
    from toyni_tpu.air import PairFibonacciAir, SboxChainAir
    from toyni_tpu.config import StarkConfig
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.trace import ExecutionTrace
    from toyni_tpu.verifier import StarkVerifier

    pair = PairFibonacciAir()
    ca, cb = PairFibonacciAir.generate_trace(64)
    t2 = ExecutionTrace()
    t2.insert_column(ca)
    t2.insert_column(cb)
    blob3 = proof_mod.serialize(
        StarkProver(t2, air=pair, seed=3).generate_proof()
    )
    assert native.verify_proof_blob(blob3, air=pair) is True
    assert native.verify_proof_blob(blob3) is False  # fib AIR vs v3 blob

    sb = SboxChainAir()
    cfg_sb = StarkConfig(constraint_degree=sb.constraint_degree)
    t3 = ExecutionTrace()
    t3.insert_column(SboxChainAir.generate_trace(64))
    blob_sb = proof_mod.serialize(
        StarkProver(t3, air=sb, config=cfg_sb, seed=3).generate_proof()
    )
    assert native.verify_proof_blob(blob_sb, cfg_sb, air=sb) is True

    cfg4 = StarkConfig(ext_challenges=True)
    blob4 = proof_mod.serialize(
        StarkProver(t2, air=pair, config=cfg4, seed=3).generate_proof()
    )
    assert native.verify_proof_blob(blob4, cfg4, air=pair) is True

    v = StarkVerifier(air=pair, config=cfg4)
    rng = random.Random(0x34)
    for _ in range(60):
        b = bytearray(blob4)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        data = bytes(b)
        try:
            py_acc = v.verify(proof_mod.deserialize(data))
        except Exception:
            py_acc = False
        try:
            nat_acc = native.verify_proof_blob(data, cfg4, air=pair)
        except Exception:
            nat_acc = False
        assert py_acc == nat_acc


def test_native_verifier_overflow_header_rejected():
    """Hostile header with trace_len = 2^59, lde_size = 0: the u64 product
    n * blowup wraps to 0; must be a clean REJECT (matching the Python
    verifier's bigint compare), not a hang or SIGFPE."""
    import struct

    blob = bytearray(
        b"TSTK" + struct.pack("<H", 1)
        + struct.pack("<Q", 1 << 59) + struct.pack("<Q", 0)
        + b"\0" * 64           # commitments
        + b"\0" * 32           # t_z..q_z
        + struct.pack("<I", 0)  # fri commitments
        + struct.pack("<I", 0)  # final layer
        + struct.pack("<I", 0)  # queries
    )
    assert native.verify_proof_blob(bytes(blob)) is False
    # non-power-of-two trace_len: clean reject too (no ValueError divergence)
    blob2 = bytearray(blob)
    struct.pack_into("<Q", blob2, 6, 3)
    struct.pack_into("<Q", blob2, 14, 96)
    assert native.verify_proof_blob(bytes(blob2)) is False


def test_native_verifier_poseidon2_v5():
    """v5 (Poseidon2 commitments): native accept across all four protocol
    shapes, hash-mode mismatch rejection both ways, and byte-flip fuzz
    agreement with the Python oracle on the base shape."""
    import random

    from toyni_tpu import proof as proof_mod
    from toyni_tpu.air import PairFibonacciAir
    from toyni_tpu.config import StarkConfig
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.trace import ExecutionTrace
    from toyni_tpu.verifier import StarkVerifier

    fibs, a, b = [], 1, 1
    for _ in range(64):
        fibs.append(a % P)
        a, b = b, (a + b) % P
    t = ExecutionTrace()
    t.insert_column(fibs)

    cfg = StarkConfig(hash="poseidon2")
    blob = proof_mod.serialize(
        StarkProver(t, config=cfg, seed=3).generate_proof()
    )
    assert native.verify_proof_blob(blob, cfg) is True
    assert native.verify_proof_blob(blob) is False       # sha cfg vs v5 blob
    sha_blob = proof_mod.serialize(StarkProver(t, seed=3).generate_proof())
    assert native.verify_proof_blob(sha_blob, cfg) is False  # p2 cfg vs v1

    cfge = StarkConfig(hash="poseidon2", ext_challenges=True)
    bl = proof_mod.serialize(
        StarkProver(t, config=cfge, seed=4).generate_proof()
    )
    assert native.verify_proof_blob(bl, cfge) is True

    pair = PairFibonacciAir()
    ca, cb = PairFibonacciAir.generate_trace(64)
    t2 = ExecutionTrace()
    t2.insert_column(ca)
    t2.insert_column(cb)
    blm = proof_mod.serialize(
        StarkProver(t2, air=pair, config=cfg, seed=5).generate_proof()
    )
    assert native.verify_proof_blob(blm, cfg, air=pair) is True
    blme = proof_mod.serialize(
        StarkProver(t2, air=pair, config=cfge, seed=6).generate_proof()
    )
    assert native.verify_proof_blob(blme, cfge, air=pair) is True

    v = StarkVerifier(config=cfg)
    rng = random.Random(0x9052)
    for _ in range(60):
        bb2 = bytearray(blob)
        bb2[rng.randrange(len(bb2))] ^= 1 << rng.randrange(8)
        data = bytes(bb2)
        try:
            py_acc = v.verify(proof_mod.deserialize(data))
        except Exception:
            py_acc = False
        try:
            nat_acc = native.verify_proof_blob(data, cfg)
        except Exception:
            nat_acc = False
        assert py_acc == nat_acc
