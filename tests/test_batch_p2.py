"""Batch prover with Poseidon2 commitments: each proof byte-identical to
the single-device StarkProver for equal seeds (wire format v5), in base,
ext-challenge, and multi-column modes.

Own module (not in test_batch.py) to stay under this deployment's XLA:CPU
executable-accumulation crash threshold (see tests/conftest.py).
"""

from toyni_tpu.config import StarkConfig
from toyni_tpu.field.babybear import P
from toyni_tpu.trace import ExecutionTrace
from toyni_tpu.verifier import StarkVerifier
from toyni_tpu import proof as proof_mod


def _fib_trace(rows):
    fibs, a, b = [], 1, 1
    for _ in range(rows):
        fibs.append(a % P)
        a, b = b, (a + b) % P
    t = ExecutionTrace()
    t.insert_column(fibs)
    return t


def _check(traces_fn, air=None, seeds=(31, 32), **cfg_kw):
    from toyni_tpu.batch import BatchStarkProver
    from toyni_tpu.prover import StarkProver

    cfg = StarkConfig(hash="poseidon2", **cfg_kw)
    batch = BatchStarkProver(
        [traces_fn() for _ in seeds], air=air, config=cfg, seeds=list(seeds)
    ).generate_proofs()
    v = StarkVerifier(air=air, config=cfg)
    for bp, s in zip(batch, seeds):
        sp = StarkProver(traces_fn(), air=air, config=cfg,
                         seed=s).generate_proof()
        assert proof_mod.serialize(bp) == proof_mod.serialize(sp), (
            "batch proof differs from single-device proof"
        )
        assert v.verify(bp)


def test_batch_poseidon2_base():
    _check(lambda: _fib_trace(64))


def test_batch_poseidon2_ext():
    _check(lambda: _fib_trace(64), seeds=(33,), ext_challenges=True)


def test_batch_poseidon2_multi():
    from toyni_tpu.air import PairFibonacciAir

    def mk():
        ca, cb = PairFibonacciAir.generate_trace(64)
        t = ExecutionTrace()
        t.insert_column(ca)
        t.insert_column(cb)
        return t

    _check(mk, air=PairFibonacciAir(), seeds=(34,))
