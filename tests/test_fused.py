"""Single-dispatch fused prover tests.

The contract: FusedStarkProver runs the whole proof — including the
Fiat-Shamir transcript (ops/transcript_dev) — as one device program and
produces proofs BYTE-IDENTICAL to the phase-based StarkProver for equal
seeds (and therefore byte-exact against the reference transcript,
src/transcript.rs + src/fibonacci.rs:99-310)."""

import hashlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toyni_tpu import proof as proof_mod
from toyni_tpu.config import StarkConfig
from toyni_tpu.field.babybear import P
from toyni_tpu.ops import sha256 as sha
from toyni_tpu.ops import transcript_dev as td
from toyni_tpu.prover import StarkProver
from toyni_tpu.prover_fused import FusedStarkProver
from toyni_tpu.trace import ExecutionTrace
from toyni_tpu.transcript import SEED, Transcript, derive_z
from toyni_tpu.verifier import StarkVerifier


def _fib_trace(n):
    fibs, a, b = [], 1, 1
    for _ in range(n):
        fibs.append(a % P)
        a, b = b, (a + b) % P
    t = ExecutionTrace()
    t.insert_column(fibs)
    return t


def _words(b: bytes):
    return jnp.asarray(np.frombuffer(b, ">u4").astype(np.uint32))


# ── device transcript vs host oracle ────────────────────────────────────────

def test_hash_parts_matches_hashlib():
    rng = np.random.default_rng(0)
    r1, r2 = rng.bytes(32), rng.bytes(32)
    d = td.hash_parts([SEED, ("digest", _words(r1)), ("digest", _words(r2))])
    assert sha.digest_bytes(np.asarray(d)) == hashlib.sha256(
        SEED + r1 + r2
    ).digest()


def test_challenge_map_matches_host():
    rng = np.random.default_rng(1)
    for _ in range(8):
        r1, r2 = rng.bytes(32), rng.bytes(32)
        t = Transcript()
        t.absorb(r1)
        t.absorb(r2)
        d = td.hash_parts(
            [SEED, ("digest", _words(r1)), ("digest", _words(r2))]
        )
        assert int(np.asarray(td.challenge_from_digest(d))) == (
            t.squeeze_challenge()
        )


def test_derive_z_loop_matches_host():
    rng = np.random.default_rng(2)
    for _ in range(6):
        r1, r2 = rng.bytes(32), rng.bytes(32)
        t = Transcript()
        t.absorb(r1)
        t.absorb(r2)
        z_host = derive_z(t, 2048, 7)
        d0 = td.hash_parts(
            [SEED, ("digest", _words(r1)), ("digest", _words(r2))]
        )
        d, z = jax.jit(lambda dd: td.derive_z_loop(dd, 2048, 7))(d0)
        assert int(np.asarray(z)) == z_host
        assert sha.digest_bytes(np.asarray(d)) == bytes(t.state)


def test_squeeze_indices_loop_matches_host_with_dedup():
    rng = np.random.default_rng(3)
    r1, r2, r3 = rng.bytes(32), rng.bytes(32), rng.bytes(32)
    t = Transcript()
    t.absorb(r1)
    t.absorb(r2)
    t.squeeze_challenge()
    t.absorb(r3)
    # max=8 forces duplicate draws, exercising the dedup path
    idx_host = t.squeeze_indices(6, 8)
    d0 = td.hash_parts([SEED, ("digest", _words(r1)), ("digest", _words(r2))])
    d, idx = jax.jit(
        lambda dd: td.squeeze_indices_loop(
            [("digest", dd), ("digest", _words(r3))], 6, 8
        )
    )(d0)
    assert [int(v) for v in np.asarray(idx)] == idx_host
    assert sha.digest_bytes(np.asarray(d)) == bytes(t.state)


# ── fused prover end to end ─────────────────────────────────────────────────

def test_fused_proof_byte_identical_and_verifies():
    trace = _fib_trace(64)
    p_ref = StarkProver(trace, seed=7).generate_proof()
    p_fused = FusedStarkProver(trace, seed=7).generate_proof()
    assert proof_mod.serialize(p_fused) == proof_mod.serialize(p_ref)
    assert StarkVerifier().verify(p_fused)


def test_fused_zero_knowledge_blinding():
    trace = _fib_trace(64)
    p1 = FusedStarkProver(trace, seed=1).generate_proof()
    p2 = FusedStarkProver(trace, seed=2).generate_proof()
    assert StarkVerifier().verify(p1) and StarkVerifier().verify(p2)
    assert p1.t_z != p2.t_z  # fresh blinding randomizes the openings


def test_fused_invalid_trace_raises():
    fibs = [1, 1] + [5] * 62
    trace = ExecutionTrace()
    trace.insert_column(fibs)
    with pytest.raises(ValueError, match="Constraint check"):
        FusedStarkProver(trace, seed=0).generate_proof()


def test_fused_ext_mode_byte_identical():
    trace = _fib_trace(64)
    cfg = StarkConfig(ext_challenges=True)
    p1 = StarkProver(trace, config=cfg, seed=4).generate_proof()
    p2 = FusedStarkProver(trace, config=cfg, seed=4).generate_proof()
    assert proof_mod.serialize(p2) == proof_mod.serialize(p1)
    assert StarkVerifier(config=cfg).verify(p2)


def test_fused_multi_air_byte_identical():
    from toyni_tpu.air import PairFibonacciAir

    air = PairFibonacciAir()
    col_a, col_b = PairFibonacciAir.generate_trace(64)
    trace = ExecutionTrace()
    trace.insert_column(col_a)
    trace.insert_column(col_b)
    p1 = StarkProver(trace, air=air, seed=4).generate_proof()
    p2 = FusedStarkProver(trace, air=air, seed=4).generate_proof()
    assert proof_mod.serialize(p2) == proof_mod.serialize(p1)
    assert StarkVerifier(air=air).verify(p2)


def test_fused_batch_byte_identical():
    from toyni_tpu.prover_fused import FusedBatchStarkProver

    seeds = [11, 12, 13]
    batch = FusedBatchStarkProver(
        [_fib_trace(64) for _ in seeds], seeds=seeds
    ).generate_proofs()
    v = StarkVerifier()
    for i, s in enumerate(seeds):
        ref = StarkProver(_fib_trace(64), seed=s).generate_proof()
        assert v.verify(batch[i])
        assert proof_mod.serialize(batch[i]) == proof_mod.serialize(ref)


def test_fused_multi_ext_combination():
    from toyni_tpu.air import PairFibonacciAir

    air = PairFibonacciAir()
    col_a, col_b = PairFibonacciAir.generate_trace(64)
    trace = ExecutionTrace()
    trace.insert_column(col_a)
    trace.insert_column(col_b)
    cfg = StarkConfig(ext_challenges=True)
    p1 = StarkProver(trace, air=air, config=cfg, seed=4).generate_proof()
    p2 = FusedStarkProver(trace, air=air, config=cfg, seed=4).generate_proof()
    assert proof_mod.serialize(p2) == proof_mod.serialize(p1)
    assert StarkVerifier(air=air, config=cfg).verify(p2)
