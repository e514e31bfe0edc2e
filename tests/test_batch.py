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


def test_batch_multi_air_equals_sequential_and_verifies():
    """Batched generic-AIR path (k=2 columns, 2 alpha-composed constraints,
    2 shifts): byte-identical to sequential StarkProver runs per member."""
    from toyni_tpu.air import PairFibonacciAir

    air = PairFibonacciAir()
    n = 64
    col_a, col_b = PairFibonacciAir.generate_trace(n)
    traces = []
    for _ in range(2):
        t = ExecutionTrace()
        t.insert_column(col_a)
        t.insert_column(col_b)
        traces.append(t)
    seeds = [11, 22]

    batch = BatchStarkProver(traces, air=air, seeds=seeds).generate_proofs()
    assert len(batch) == 2
    v = StarkVerifier(air=air)
    for i, p in enumerate(batch):
        assert p.num_columns == 2 and p.num_shifts == 2
        assert v.verify(p), f"batch member {i} rejected"
        single = StarkProver(traces[i], air=air, seed=seeds[i]).generate_proof()
        assert proof_mod.serialize(p) == proof_mod.serialize(single), (
            f"batch member {i} differs from sequential proof"
        )


def test_batch_ext_equals_sequential_and_verifies():
    """Batched extension-field mode (z and FRI betas from F_p^4):
    byte-identical to sequential ext proofs per member."""
    from toyni_tpu.config import StarkConfig

    cfg = StarkConfig(ext_challenges=True)
    n = 64
    traces = [fib_trace(n, 1) for _ in range(2)]
    seeds = [7, 8]

    batch = BatchStarkProver(traces, config=cfg, seeds=seeds).generate_proofs()
    v = StarkVerifier(config=cfg)
    for i, p in enumerate(batch):
        assert p.ext
        assert v.verify(p), f"batch member {i} rejected"
        single = StarkProver(traces[i], config=cfg, seed=seeds[i]).generate_proof()
        assert proof_mod.serialize(p) == proof_mod.serialize(single), (
            f"batch member {i} differs from sequential ext proof"
        )


def test_batch_ext_multi_air_equals_sequential_and_verifies():
    """Batched ext + multi-column combination (wire format v4)."""
    from toyni_tpu.air import PairFibonacciAir
    from toyni_tpu.config import StarkConfig

    air = PairFibonacciAir()
    cfg = StarkConfig(ext_challenges=True)
    n = 64
    col_a, col_b = PairFibonacciAir.generate_trace(n)
    t = ExecutionTrace()
    t.insert_column(col_a)
    t.insert_column(col_b)
    traces = [t]
    seeds = [31]

    batch = BatchStarkProver(traces, air=air, config=cfg,
                             seeds=seeds).generate_proofs()
    v = StarkVerifier(air=air, config=cfg)
    assert batch[0].ext and batch[0].num_columns == 2
    assert v.verify(batch[0])
    single = StarkProver(traces[0], air=air, config=cfg,
                         seed=seeds[0]).generate_proof()
    assert proof_mod.serialize(batch[0]) == proof_mod.serialize(single)
