"""End-to-end prover/verifier tests: happy path, ZK property, invalid-trace
panic, and the tamper-based soundness suite (reference tests:
src/fibonacci.rs:415-456, src/verifier.rs:269-379)."""

import copy

import numpy as np
import pytest

from toyni_tpu.field.babybear import P
from toyni_tpu.prover import StarkProver
from toyni_tpu.verifier import StarkVerifier
from toyni_tpu.trace import ExecutionTrace
from toyni_tpu import proof as proof_mod


def fibonacci_list(n):
    """Fibonacci in F_p. (The reference builds the trace with u64-wrapping
    adds, fibonacci.rs:444-455 — equivalent below ~94 rows, where u64 never
    wraps; above that only the mod-p recurrence satisfies the AIR.)"""
    fibs, a, b = [], 1, 1
    for _ in range(n):
        fibs.append(a % P)
        a, b = b, (a + b) % P
    return fibs


def make_trace(n=64):
    t = ExecutionTrace()
    t.insert_column(fibonacci_list(n))
    return t


@pytest.fixture(scope="module")
def valid_proof():
    return StarkProver(make_trace(), seed=1).generate_proof()


def test_verifier_accepts_valid_proof(valid_proof):
    assert StarkVerifier().verify(valid_proof)


def test_proof_shape(valid_proof):
    # reference config: trace 64 -> LDE 2048, 8 folds, final layer 8
    # (derived from fibonacci.rs:220-221, verifier.rs:59-64)
    p = valid_proof
    assert p.trace_len == 64 and p.lde_size == 2048
    assert len(p.fri_commitments) == 9  # 8 folds + layer 0
    assert len(p.fri_final_layer) == 8
    assert len(set(p.fri_final_layer)) == 1  # constant codeword
    assert len(p.query_proofs) == 44
    for qp in p.query_proofs:
        assert len(qp.fri_openings) == 7  # intermediate layers 1..7


def test_masking_is_zero_knowledge():
    # fresh blinding => different openings, both verify (verifier.rs:304-312)
    p1 = StarkProver(make_trace(), seed=2).generate_proof()
    p2 = StarkProver(make_trace(), seed=3).generate_proof()
    v = StarkVerifier()
    assert v.verify(p1) and v.verify(p2)
    assert p1.t_z != p2.t_z, "masking should randomize the openings"


def test_deterministic_with_same_seed():
    p1 = StarkProver(make_trace(), seed=7).generate_proof()
    p2 = StarkProver(make_trace(), seed=7).generate_proof()
    assert p1.t_z == p2.t_z and p1.trace_commitment == p2.trace_commitment


def test_invalid_trace_fails_at_proving():
    # reference: #[should_panic] on corrupted trace (fibonacci.rs:431-442)
    vals = fibonacci_list(64)
    for i in range(1, 50):
        vals[i] = i * 3143 % P
    t = ExecutionTrace()
    t.insert_column(vals)
    with pytest.raises(ValueError, match="Constraint check at z failed"):
        StarkProver(t, seed=1).generate_proof()


# ── tamper suite (verifier.rs:315-379) ──────────────────────────────────────

def test_rejects_bad_ood_value(valid_proof):
    p = copy.deepcopy(valid_proof)
    p.t_z = (p.t_z + 1) % P
    assert not StarkVerifier().verify(p)


def test_rejects_bad_fri_final(valid_proof):
    p = copy.deepcopy(valid_proof)
    p.fri_final_layer[0] = (p.fri_final_layer[0] + 1) % P
    assert not StarkVerifier().verify(p)


def test_rejects_bad_trace_commitment(valid_proof):
    p = copy.deepcopy(valid_proof)
    p.trace_commitment = bytes([p.trace_commitment[0] ^ 0xFF]) + p.trace_commitment[1:]
    assert not StarkVerifier().verify(p)


def test_rejects_bad_quotient_commitment(valid_proof):
    p = copy.deepcopy(valid_proof)
    p.quotient_commitment = (
        bytes([p.quotient_commitment[0] ^ 0xFF]) + p.quotient_commitment[1:]
    )
    assert not StarkVerifier().verify(p)


def test_rejects_bad_fri_commitment(valid_proof):
    p = copy.deepcopy(valid_proof)
    p.fri_commitments[0] = (
        bytes([p.fri_commitments[0][0] ^ 0xFF]) + p.fri_commitments[0][1:]
    )
    assert not StarkVerifier().verify(p)


def test_rejects_wrong_query_count(valid_proof):
    p = copy.deepcopy(valid_proof)
    p.query_proofs.pop()
    assert not StarkVerifier().verify(p)


def test_rejects_tampered_opening_value(valid_proof):
    p = copy.deepcopy(valid_proof)
    op = p.query_proofs[0].trace_opening
    op.value = (op.value + 1) % P
    assert not StarkVerifier().verify(p)


def test_rejects_wrong_lde_size(valid_proof):
    p = copy.deepcopy(valid_proof)
    p.lde_size = p.lde_size // 2
    assert not StarkVerifier().verify(p)


# ── serialization round trip ────────────────────────────────────────────────

def test_proof_serialization_roundtrip(valid_proof):
    blob = proof_mod.serialize(valid_proof)
    back = proof_mod.deserialize(blob)
    assert StarkVerifier().verify(back)
    assert proof_mod.serialize(back) == blob
    # serialization is canonical: tampered blob -> rejected or unequal
    assert back.t_z == valid_proof.t_z
    assert back.fri_commitments == valid_proof.fri_commitments


def test_e2e_four_step_path():
    """Trace 256 -> LDE 8192 crosses the four-step NTT threshold; the whole
    protocol must still round-trip (and u64-wrap-free traces are valid at
    any length)."""
    p = StarkProver(make_trace(256), seed=11).generate_proof()
    assert p.lde_size == 8192
    assert StarkVerifier().verify(p)


def test_e2e_leafless_trees(monkeypatch):
    """Exercise the leafless-tree query path (used automatically for huge
    LDEs) at a small size by lowering the threshold."""
    from toyni_tpu import merkle as mk
    from toyni_tpu import prover as prover_mod

    monkeypatch.setattr(mk, "LEAFLESS_MIN", 1024)
    mk._tree_builder.cache_clear()
    prover_mod._phase_fns.cache_clear()
    try:
        p = StarkProver(make_trace(64), seed=21).generate_proof()
        assert StarkVerifier().verify(p)
    finally:
        mk._tree_builder.cache_clear()
        prover_mod._phase_fns.cache_clear()


def test_fuzz_verifier_rejects_random_mutations(valid_proof):
    """Randomized soundness sweep: mutate one random field of the proof and
    require rejection (generalizes the reference's fixed tamper cases)."""
    import random

    rng = random.Random(0xFADE)
    v = StarkVerifier()
    rejected = 0
    for trial in range(30):
        p = copy.deepcopy(valid_proof)
        kind = rng.randrange(6)
        if kind == 0:  # scalar OOD values
            field = rng.choice(["t_z", "t_gz", "t_ggz", "q_z"])
            setattr(p, field, (getattr(p, field) + rng.randrange(1, P)) % P)
        elif kind == 1:  # a commitment byte
            which = rng.randrange(len(p.fri_commitments))
            c = bytearray(p.fri_commitments[which])
            c[rng.randrange(32)] ^= 1 << rng.randrange(8)
            p.fri_commitments[which] = bytes(c)
        elif kind == 2:  # an opened value
            qp = rng.choice(p.query_proofs)
            op = rng.choice(
                [qp.deep_opening, qp.deep_opening_pair, qp.trace_opening,
                 qp.trace_opening_g, qp.trace_opening_gg, qp.quotient_opening]
            )
            op.value = (op.value + rng.randrange(1, P)) % P
        elif kind == 3:  # a Merkle path digest byte
            qp = rng.choice(p.query_proofs)
            path = qp.trace_opening.proof.path
            i = rng.randrange(len(path))
            d = bytearray(path[i])
            d[rng.randrange(32)] ^= 1
            path[i] = bytes(d)
        elif kind == 4:  # a salt byte (breaks the leaf hash)
            qp = rng.choice(p.query_proofs)
            s = bytearray(qp.quotient_opening.salt)
            s[rng.randrange(16)] ^= 1
            qp.quotient_opening.salt = bytes(s)
        else:  # final-layer value
            i = rng.randrange(len(p.fri_final_layer))
            p.fri_final_layer[i] = (p.fri_final_layer[i] + 1) % P
        if not v.verify(p):
            rejected += 1
    assert rejected == 30, f"only {rejected}/30 mutations rejected"


def test_opening_position_binding(valid_proof):
    """An opening's Merkle path must prove the DERIVED index, not whatever
    position its flags happen to encode: a donor opening (valid path for a
    different position) relabeled with the expected index must be rejected,
    as must a depth-truncated path. Without this binding a malicious prover
    could answer query i with the committed value at a position of its own
    choosing, voiding FRI's random spot-checking."""
    from toyni_tpu.verifier import _verify_opening

    op = valid_proof.query_proofs[0].quotient_opening
    donor = valid_proof.query_proofs[1].quotient_opening
    root = valid_proof.quotient_commitment
    N = valid_proof.lde_size
    assert op.index != donor.index  # squeeze_indices dedups
    assert _verify_opening(op, root, op.index, N)

    relabeled = copy.deepcopy(donor)
    relabeled.index = op.index
    assert not _verify_opening(relabeled, root, op.index, N)

    short = copy.deepcopy(op)
    short.proof.path = short.proof.path[:-1]
    short.proof.position = short.proof.position[:-1]
    assert not _verify_opening(short, root, op.index, N)


def test_fuzz_wire_format_hostile_blobs(valid_proof):
    """Byte-level fuzz of the SERIALIZED proof: random bit flips, truncations,
    count-field corruption, and garbage prefixes must either raise ValueError
    from `deserialize` (bounds-checked reads — never hang on a hostile count
    field) or decode to a proof the verifier rejects. A decoded proof that
    verifies must be semantically identical to the original (canonical
    re-serialization equality) — e.g. a non-canonical position-flag byte."""
    import random

    blob = proof_mod.serialize(valid_proof)
    canonical = blob
    v = StarkVerifier()
    rng = random.Random(0xB10B)

    def outcome(data) -> str:
        try:
            back = proof_mod.deserialize(data)
        except ValueError:
            return "raised"
        return "verified" if v.verify(back) else "rejected"

    # bit flips anywhere in the blob
    for _ in range(60):
        b = bytearray(blob)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        out = outcome(bytes(b))
        if out == "verified":
            back = proof_mod.deserialize(bytes(b))
            assert proof_mod.serialize(back) == canonical, (
                "mutated blob verified with different semantics"
            )
    # truncations (always invalid: data is lost)
    for _ in range(20):
        cut = rng.randrange(len(blob))
        assert outcome(blob[:cut]) in ("raised", "rejected")
    # corrupt a count field to a huge value (must not hang / overallocate)
    for _ in range(20):
        b = bytearray(blob)
        off = rng.randrange(len(b) - 4)
        b[off:off + 4] = (0xFFFFFFF0).to_bytes(4, "little")
        if outcome(bytes(b)) == "verified":
            back = proof_mod.deserialize(bytes(b))
            assert proof_mod.serialize(back) == canonical
    # pure garbage
    for _ in range(10):
        assert outcome(rng.randbytes(rng.randrange(1, 4096))) in (
            "raised", "rejected"
        )


# ── extension-field soundness mode (ext_challenges=True) ────────────────────
#
# z and the FRI betas come from F_p^4 (~124-bit challenge space); the DEEP
# codeword, all FRI layers, and the OOD scalars are Ext elements while trace
# and quotient commitments stay base-field. The reference documents this
# intent (src/ext.rs:1-12) but never wires it into its pipeline.

from toyni_tpu.config import StarkConfig


@pytest.fixture(scope="module")
def ext_proof():
    cfg = StarkConfig(ext_challenges=True)
    return StarkProver(make_trace(), config=cfg, seed=11).generate_proof(), cfg


def test_ext_mode_accepts_valid_proof(ext_proof):
    proof, cfg = ext_proof
    assert proof.ext
    assert isinstance(proof.t_z, tuple) and len(proof.t_z) == 4
    assert all(isinstance(v, tuple) for v in proof.fri_final_layer)
    assert isinstance(proof.query_proofs[0].deep_opening.value, tuple)
    assert isinstance(proof.query_proofs[0].trace_opening.value, int)
    assert StarkVerifier(config=cfg).verify(proof)


def test_ext_mode_rejects_base_verifier_and_vice_versa(ext_proof):
    proof, cfg = ext_proof
    assert not StarkVerifier().verify(proof)  # base verifier, ext proof


def test_ext_mode_tampered_ood_rejected(ext_proof):
    proof, cfg = ext_proof
    p = copy.deepcopy(proof)
    t = list(p.t_z)
    t[0] = (t[0] + 1) % P
    p.t_z = tuple(t)
    assert not StarkVerifier(config=cfg).verify(p)


def test_ext_mode_tampered_final_layer_rejected(ext_proof):
    proof, cfg = ext_proof
    p = copy.deepcopy(proof)
    v = list(p.fri_final_layer[0])
    v[1] = (v[1] + 1) % P
    p.fri_final_layer[0] = tuple(v)
    assert not StarkVerifier(config=cfg).verify(p)


def test_ext_mode_tampered_deep_value_rejected(ext_proof):
    proof, cfg = ext_proof
    p = copy.deepcopy(proof)
    op = p.query_proofs[3].deep_opening
    v = list(op.value)
    v[2] = (v[2] + 1) % P
    op.value = tuple(v)
    assert not StarkVerifier(config=cfg).verify(p)


def test_ext_mode_tampered_commitment_rejected(ext_proof):
    proof, cfg = ext_proof
    p = copy.deepcopy(proof)
    c = bytearray(p.fri_commitments[0])
    c[0] ^= 1
    p.fri_commitments[0] = bytes(c)
    assert not StarkVerifier(config=cfg).verify(p)


def test_ext_mode_serialization_roundtrip(ext_proof):
    proof, cfg = ext_proof
    data = proof_mod.serialize(proof)
    back = proof_mod.deserialize(data)
    assert back.ext and back.t_z == proof.t_z
    assert back.fri_final_layer == proof.fri_final_layer
    assert StarkVerifier(config=cfg).verify(back)
    assert proof_mod.serialize(back) == data


def test_ext_mode_zk_different_blinding(ext_proof):
    proof, cfg = ext_proof
    p2 = StarkProver(make_trace(), config=cfg, seed=12).generate_proof()
    assert StarkVerifier(config=cfg).verify(p2)
    assert p2.t_z != proof.t_z  # fresh blinding => different openings


def _mutate_scalar(rng, v):
    """Bump one limb of an int or tuple scalar (any wire format)."""
    if isinstance(v, tuple):
        i = rng.randrange(len(v))
        out = list(v)
        out[i] = (out[i] + rng.randrange(1, P)) % P
        return tuple(out)
    return (v + rng.randrange(1, P)) % P


def test_fuzz_ext_proofs(ext_proof):
    """Randomized tamper sweep over the v2 (ext-challenges) wire format."""
    import random

    proof, cfg = ext_proof
    rng = random.Random(0xBEEF)
    v = StarkVerifier(config=cfg)
    rejected = 0
    for trial in range(20):
        p = copy.deepcopy(proof)
        kind = rng.randrange(5)
        if kind == 0:
            p.t_gz = _mutate_scalar(rng, p.t_gz)
        elif kind == 1:
            i = rng.randrange(len(p.fri_final_layer))
            p.fri_final_layer[i] = _mutate_scalar(rng, p.fri_final_layer[i])
        elif kind == 2:
            qp = rng.choice(p.query_proofs)
            op = rng.choice([qp.deep_opening, qp.deep_opening_pair,
                             qp.trace_opening, qp.quotient_opening])
            op.value = _mutate_scalar(rng, op.value)
        elif kind == 3:
            qp = rng.choice(p.query_proofs)
            li = rng.randrange(len(qp.fri_openings))
            op = qp.fri_openings[li][rng.randrange(2)]
            op.value = _mutate_scalar(rng, op.value)
        else:
            which = rng.randrange(len(p.fri_commitments))
            c = bytearray(p.fri_commitments[which])
            c[rng.randrange(32)] ^= 1 << rng.randrange(8)
            p.fri_commitments[which] = bytes(c)
        if not v.verify(p):
            rejected += 1
    assert rejected == 20, f"only {rejected}/20 ext mutations rejected"


def test_fuzz_multi_proofs():
    """Randomized tamper sweep over the v3 (multi-column) wire format."""
    import random

    from toyni_tpu.air import PairFibonacciAir
    from tests.test_multi_air import PAIR_AIR, make_pair_trace

    proof = StarkProver(make_pair_trace(), air=PAIR_AIR, seed=77).generate_proof()
    v = StarkVerifier(air=PAIR_AIR)
    assert v.verify(proof)
    rng = random.Random(0xD00D)
    rejected = 0
    for trial in range(20):
        p = copy.deepcopy(proof)
        kind = rng.randrange(5)
        if kind == 0:
            s = rng.randrange(len(p.ood_trace))
            rows = list(p.ood_trace)
            rows[s] = _mutate_scalar(rng, rows[s])
            p.ood_trace = tuple(rows)
        elif kind == 1:
            p.q_z = _mutate_scalar(rng, p.q_z)
        elif kind == 2:
            qp = rng.choice(p.query_proofs)
            op = rng.choice(qp.trace_openings)
            op.value = _mutate_scalar(rng, op.value)
        elif kind == 3:
            qp = rng.choice(p.query_proofs)
            op = rng.choice([qp.deep_opening, qp.deep_opening_pair,
                             qp.quotient_opening])
            op.value = _mutate_scalar(rng, op.value)
        else:
            i = rng.randrange(len(p.fri_final_layer))
            p.fri_final_layer[i] = _mutate_scalar(rng, p.fri_final_layer[i])
        if not v.verify(p):
            rejected += 1
    assert rejected == 20, f"only {rejected}/20 multi mutations rejected"
