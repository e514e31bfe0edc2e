"""Batched proving tests: B traces through one dispatch stream must produce
BYTE-IDENTICAL proofs to B sequential single-trace runs with the same seeds
(the per-proof RNG draw order is part of the contract)."""

import numpy as np

from toyni_tpu.batch import BatchStarkProver, ntt_batched, powers_traced_batched
from toyni_tpu.field.babybear import P, get_root_of_unity
from toyni_tpu.ops.ntt import ntt, ntt_tables
from toyni_tpu.prover import StarkProver
from toyni_tpu.trace import ExecutionTrace
from toyni_tpu.verifier import StarkVerifier
from toyni_tpu import proof as proof_mod

import jax.numpy as jnp

RNG = np.random.default_rng(3)


def test_ntt_batched_matches_single():
    for log_n in (8, 13):  # flat and four-step paths
        n = 1 << log_n
        omega = get_root_of_unity(log_n)
        x = RNG.integers(0, P, (3, n), dtype=np.uint64).astype(np.uint32)
        tabs = ntt_tables(n, omega)
        got = np.asarray(ntt_batched(jnp.asarray(x), tabs, n), np.uint64)
        for b in range(3):
            expect = np.asarray(ntt(jnp.asarray(x[b]), omega), np.uint64)
            np.testing.assert_array_equal(got[b], expect, err_msg=f"n={n} b={b}")


def test_powers_traced_batched():
    from toyni_tpu.field import babybear as bb

    bases = RNG.integers(1, P, 4, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(powers_traced_batched(jnp.asarray(bases), 50), np.uint64)
    for b in range(4):
        expect = np.asarray(bb.powers_traced(jnp.uint32(int(bases[b])), 50), np.uint64)
        np.testing.assert_array_equal(got[b], expect)


def fib_trace(n, start):
    a, b = start, 1
    col = []
    for _ in range(n):
        col.append(a % P)
        a, b = b, (a + b) % P
    t = ExecutionTrace()
    t.insert_column(col)
    return t


def test_batch_equals_sequential_and_verifies():
    n = 64
    # NOTE: all batch members must satisfy the AIR; vary only the seed
    traces = [fib_trace(n, 1) for _ in range(3)]
    seeds = [101, 202, 303]

    batch = BatchStarkProver(traces, seeds=seeds).generate_proofs()
    assert len(batch) == 3

    v = StarkVerifier()
    for i, proof in enumerate(batch):
        assert v.verify(proof), f"batch proof {i} rejected"

    for i, (t, s) in enumerate(zip(traces, seeds)):
        single = StarkProver(fib_trace(n, 1), seed=s).generate_proof()
        assert proof_mod.serialize(batch[i]) == proof_mod.serialize(single), (
            f"batch member {i} differs from sequential proof"
        )

    # different seeds => different blinding => distinct proofs
    assert proof_mod.serialize(batch[0]) != proof_mod.serialize(batch[1])
