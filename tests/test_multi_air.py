"""Multi-column / multi-constraint AIR tests (beyond the reference, which
hard-codes a single column and a single composed constraint —
src/fibonacci.rs:315-325): row-bundle trace commitments, alpha-composed
constraints, ns-shift query openings, wire format v3."""

import copy
import hashlib

import numpy as np
import jax.numpy as jnp
import pytest

from toyni_tpu.air import PairFibonacciAir
from toyni_tpu.field.babybear import P
from toyni_tpu.ops import sha256 as sha
from toyni_tpu.prover import StarkProver
from toyni_tpu.trace import ExecutionTrace
from toyni_tpu.verifier import StarkVerifier
from toyni_tpu import proof as proof_mod

RNG = np.random.default_rng(7)

# one long-lived AIR instance: the prover's phase cache is keyed on it
PAIR_AIR = PairFibonacciAir()


# ── row-bundle leaf hashing ─────────────────────────────────────────────────

@pytest.mark.parametrize("k", [1, 2, 4, 5])
def test_multi_leaf_hash_matches_hashlib(k):
    n = 65
    values = RNG.integers(0, P, (k, n), dtype=np.uint64).astype(np.uint32)
    salts = RNG.integers(0, 2**32, (n, 4), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(
        sha.hash_salted_leaves_multi(jnp.asarray(values), jnp.asarray(salts)),
        np.uint32,
    )
    for i in range(0, n, 9):
        salt = b"".join(int(w).to_bytes(4, "big") for w in salts[i])
        msg = b"\x00" + salt + b"".join(
            int(values[c, i]).to_bytes(8, "little") for c in range(k)
        )
        assert sha.digest_bytes(got[i]) == hashlib.sha256(msg).digest(), (k, i)


def test_multi_leaf_k1_equals_single():
    n = 33
    values = RNG.integers(0, P, (1, n), dtype=np.uint64).astype(np.uint32)
    salts = RNG.integers(0, 2**32, (n, 4), dtype=np.uint64).astype(np.uint32)
    a = np.asarray(
        sha.hash_salted_leaves_multi(jnp.asarray(values), jnp.asarray(salts)),
        np.uint32,
    )
    b = np.asarray(
        sha.hash_salted_leaves(jnp.asarray(values[0]), jnp.asarray(salts)),
        np.uint32,
    )
    np.testing.assert_array_equal(a, b)


# ── end-to-end pair-Fibonacci (k=2 columns, 2 alpha-composed constraints) ───

def make_pair_trace(n=64):
    col_a, col_b = PairFibonacciAir.generate_trace(n)
    t = ExecutionTrace()
    t.insert_column(col_a)
    t.insert_column(col_b)
    return t


@pytest.fixture(scope="module")
def pair_proof():
    return StarkProver(make_pair_trace(), air=PAIR_AIR, seed=21).generate_proof()


def test_pair_air_proof_accepts(pair_proof):
    p = pair_proof
    assert p.ood_trace is not None and p.num_columns == 2 and p.num_shifts == 2
    assert p.t_z is None
    qp = p.query_proofs[0]
    assert qp.trace_opening is None and len(qp.trace_openings) == 2
    assert isinstance(qp.trace_openings[0].value, tuple)
    assert len(qp.trace_openings[0].value) == 2
    assert StarkVerifier(air=PAIR_AIR).verify(p)


def test_pair_air_rejected_by_wrong_air(pair_proof):
    # the bundled single-column verifier must not accept a v3 proof
    assert not StarkVerifier().verify(pair_proof)


def test_pair_air_tampered_ood_rejected(pair_proof):
    p = copy.deepcopy(pair_proof)
    row = list(p.ood_trace[0])
    row[1] = (row[1] + 1) % P
    p.ood_trace = (tuple(row),) + p.ood_trace[1:]
    assert not StarkVerifier(air=PAIR_AIR).verify(p)


def test_pair_air_tampered_trace_value_rejected(pair_proof):
    p = copy.deepcopy(pair_proof)
    op = p.query_proofs[5].trace_openings[1]
    v = list(op.value)
    v[0] = (v[0] + 1) % P
    op.value = tuple(v)
    assert not StarkVerifier(air=PAIR_AIR).verify(p)


def test_pair_air_tampered_qz_rejected(pair_proof):
    p = copy.deepcopy(pair_proof)
    p.q_z = (p.q_z + 1) % P
    assert not StarkVerifier(air=PAIR_AIR).verify(p)


def test_pair_air_tampered_commitment_rejected(pair_proof):
    p = copy.deepcopy(pair_proof)
    c = bytearray(p.trace_commitment)
    c[0] ^= 1
    p.trace_commitment = bytes(c)
    assert not StarkVerifier(air=PAIR_AIR).verify(p)


def test_pair_air_serialization_roundtrip(pair_proof):
    data = proof_mod.serialize(pair_proof)
    back = proof_mod.deserialize(data)
    assert back.ood_trace == pair_proof.ood_trace
    assert back.num_columns == 2 and back.num_shifts == 2
    assert StarkVerifier(air=PAIR_AIR).verify(back)
    assert proof_mod.serialize(back) == data


def test_pair_air_invalid_trace_raises():
    t = make_pair_trace()
    t.columns[0][10] = (int(t.columns[0][10]) + 1) % P
    with pytest.raises(ValueError, match="Constraint check"):
        StarkProver(t, air=PAIR_AIR, seed=22).generate_proof()


def test_pair_air_zk_fresh_blinding(pair_proof):
    p2 = StarkProver(make_pair_trace(), air=PAIR_AIR, seed=23).generate_proof()
    assert StarkVerifier(air=PAIR_AIR).verify(p2)
    assert p2.ood_trace != pair_proof.ood_trace


# ── ext_challenges x multi-column combination (wire format v4) ──────────────

from toyni_tpu.config import StarkConfig


@pytest.fixture(scope="module")
def pair_ext_proof():
    cfg = StarkConfig(ext_challenges=True)
    return (
        StarkProver(make_pair_trace(), air=PAIR_AIR, config=cfg,
                    seed=31).generate_proof(),
        cfg,
    )


def test_pair_ext_accepts(pair_ext_proof):
    p, cfg = pair_ext_proof
    assert p.ext and p.ood_trace is not None
    assert isinstance(p.q_z, tuple) and len(p.q_z) == 4
    assert isinstance(p.ood_trace[0][0], tuple)          # ext scalar
    assert isinstance(p.query_proofs[0].deep_opening.value, tuple)
    assert len(p.query_proofs[0].deep_opening.value) == 4
    assert isinstance(p.query_proofs[0].trace_openings[0].value, tuple)
    assert len(p.query_proofs[0].trace_openings[0].value) == 2  # k columns
    assert StarkVerifier(air=PAIR_AIR, config=cfg).verify(p)


def test_pair_ext_wrong_mode_rejected(pair_ext_proof):
    p, cfg = pair_ext_proof
    assert not StarkVerifier(air=PAIR_AIR).verify(p)          # base cfg
    assert not StarkVerifier(config=cfg).verify(p)            # wrong AIR


def test_pair_ext_tampers_rejected(pair_ext_proof):
    p0, cfg = pair_ext_proof
    v = StarkVerifier(air=PAIR_AIR, config=cfg)

    p = copy.deepcopy(p0)
    val = list(p.ood_trace[1][0])
    val[3] = (val[3] + 1) % P
    rows = [list(r) for r in p.ood_trace]
    rows[1][0] = tuple(val)
    p.ood_trace = tuple(tuple(r) for r in rows)
    assert not v.verify(p)

    p = copy.deepcopy(p0)
    qz = list(p.q_z)
    qz[0] = (qz[0] + 1) % P
    p.q_z = tuple(qz)
    assert not v.verify(p)

    p = copy.deepcopy(p0)
    op = p.query_proofs[2].deep_opening
    val = list(op.value)
    val[1] = (val[1] + 1) % P
    op.value = tuple(val)
    assert not v.verify(p)


def test_pair_ext_serialization_roundtrip(pair_ext_proof):
    p, cfg = pair_ext_proof
    data = proof_mod.serialize(p)
    back = proof_mod.deserialize(data)
    assert back.ext and back.ood_trace == p.ood_trace and back.q_z == p.q_z
    assert StarkVerifier(air=PAIR_AIR, config=cfg).verify(back)
    assert proof_mod.serialize(back) == data


def test_pair_air_leafless_trees(monkeypatch):
    """Leafless row-bundle trees: with the threshold lowered, the k-column
    trace/quotient commits drop their stored leaf-digest level and the query
    phase recomputes sibling leaf digests from (values, salts). Used
    automatically for >=2^22-leaf LDEs (1 GB/level saved per tree)."""
    from toyni_tpu import merkle as mk
    from toyni_tpu import prover as prover_mod

    monkeypatch.setattr(mk, "LEAFLESS_MIN", 1024)
    mk._tree_builder.cache_clear()
    prover_mod._phase_fns.cache_clear()
    try:
        p = StarkProver(make_pair_trace(), air=PAIR_AIR, seed=21).generate_proof()
        assert StarkVerifier(air=PAIR_AIR).verify(p)
    finally:
        mk._tree_builder.cache_clear()
        prover_mod._phase_fns.cache_clear()


# ── nonlinear (degree-7) constraint support ─────────────────────────────────

def test_fri_degree_bound_default_unchanged():
    """constraint_degree=1 must reproduce the reference FRI schedule
    byte-for-byte (next_pow2(trace_len + 140))."""
    from toyni_tpu.config import StarkConfig

    cfg = StarkConfig()
    for n in (64, 256, 1 << 16):
        assert cfg.fri_degree_bound(n) == 1 << (n + 139).bit_length()
    assert cfg.final_layer_size(64) == 8  # the reference test shape


def test_sbox_chain_air_e2e():
    """x^7 S-box chain: a constraint the reference protocol cannot express
    (degree 7 in T). constraint_degree=7 widens the FRI budget so the
    quotient (deg ~6L) passes the low-degree test; a trace violating the
    chain must fail the prover's own OOD sanity check."""
    from toyni_tpu.air import SboxChainAir
    from toyni_tpu.config import StarkConfig

    air = SboxChainAir()
    cfg = StarkConfig(constraint_degree=7)
    n = 256
    col = SboxChainAir.generate_trace(n)
    t = ExecutionTrace()
    t.insert_column(col)
    p = StarkProver(t, air=air, config=cfg, seed=5).generate_proof()
    assert p.num_shifts == 2
    assert StarkVerifier(air=air, config=cfg).verify(p)
    # default-schedule verifier must reject it (FRI schedule mismatch)
    assert not StarkVerifier(air=air).verify(p)

    bad_col = list(col)
    bad_col[n // 2] = (bad_col[n // 2] + 1) % P
    bad = ExecutionTrace()
    bad.insert_column(bad_col)
    with pytest.raises(ValueError):
        StarkProver(bad, air=air, config=cfg, seed=5).generate_proof()
