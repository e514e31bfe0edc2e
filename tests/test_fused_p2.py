"""Fused single-dispatch prover with Poseidon2 commitments: the on-device
SHA transcript absorbs the LE-word root bytes (ops/transcript_dev.py
"digest_le"), trees build with the Poseidon2 backend inside the one fused
program, and proofs are byte-identical to StarkProver's (wire v5).

Own module to stay under the XLA:CPU executable-accumulation crash
threshold (see tests/conftest.py).
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


def _check(trace_fn, air=None, seed=41, **cfg_kw):
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.prover_fused import FusedStarkProver

    cfg = StarkConfig(hash="poseidon2", **cfg_kw)
    fp = FusedStarkProver(trace_fn(), air=air, config=cfg,
                          seed=seed).generate_proof()
    sp = StarkProver(trace_fn(), air=air, config=cfg,
                     seed=seed).generate_proof()
    assert proof_mod.serialize(fp) == proof_mod.serialize(sp), (
        "fused proof differs from phase-prover proof"
    )
    assert StarkVerifier(air=air, config=cfg).verify(fp)


def test_fused_poseidon2_base():
    _check(lambda: _fib_trace(64))


def test_fused_poseidon2_ext():
    _check(lambda: _fib_trace(64), seed=42, ext_challenges=True)


def test_fused_poseidon2_multi():
    from toyni_tpu.air import PairFibonacciAir

    def mk():
        ca, cb = PairFibonacciAir.generate_trace(64)
        t = ExecutionTrace()
        t.insert_column(ca)
        t.insert_column(cb)
        return t

    _check(mk, air=PairFibonacciAir(), seed=43)


def test_fused_batch_poseidon2():
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.prover_fused import FusedBatchStarkProver

    cfg = StarkConfig(hash="poseidon2")
    batch = FusedBatchStarkProver(
        [_fib_trace(64), _fib_trace(64)], config=cfg, seeds=[44, 45]
    ).generate_proofs()
    for bp, s in zip(batch, (44, 45)):
        sp = StarkProver(_fib_trace(64), config=cfg, seed=s).generate_proof()
        assert proof_mod.serialize(bp) == proof_mod.serialize(sp)
