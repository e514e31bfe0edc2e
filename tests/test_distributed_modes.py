"""Interactive distributed prover byte-identity tests (8-device virtual CPU
mesh), one protocol mode per test — split from test_distributed.py so
pytest-xdist's file-level distribution can run the two halves in parallel
(each is several minutes of XLA:CPU compiles)."""

import numpy as np
import jax
import jax.numpy as jnp

from toyni_tpu.field.babybear import P

D = 8


# ── interactive distributed prover (transcript + query phase on mesh) ───────

def test_interactive_distributed_prover_matches_single():
    """The COMPLETE distributed prover (per-phase shard_map dispatches,
    retained sharded tree levels, distributed query gathers) must produce a
    byte-identical proof to the single-device prover for the same seed —
    distribution is invisible in the proof."""
    from toyni_tpu.parallel.prover_interactive import DistributedStarkProver
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.verifier import StarkVerifier
    from toyni_tpu import proof as proof_mod
    from toyni_tpu.trace import ExecutionTrace
    from toyni_tpu.field.babybear import P

    n, D = 64, 8
    fib, a, b = [], 1, 1
    for _ in range(n):
        fib.append(a % P)
        a, b = b, (a + b) % P

    def mk():
        t = ExecutionTrace()
        t.insert_column(fib)
        return t

    dist = DistributedStarkProver(mk(), D, seed=99).generate_proof()
    single = StarkProver(mk(), seed=99).generate_proof()

    assert StarkVerifier().verify(dist), "distributed proof rejected"
    assert proof_mod.serialize(dist) == proof_mod.serialize(single), (
        "distributed proof differs from single-device proof"
    )


def _fib_trace(n):
    from toyni_tpu.trace import ExecutionTrace

    fib, a, b = [], 1, 1
    for _ in range(n):
        fib.append(a % P)
        a, b = b, (a + b) % P
    t = ExecutionTrace()
    t.insert_column(fib)
    return t


def _assert_dist_matches_single(n, air=None, cfg=None, seed=7):
    from toyni_tpu.config import DEFAULT_CONFIG
    from toyni_tpu.parallel.prover_interactive import DistributedStarkProver
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.verifier import StarkVerifier
    from toyni_tpu import proof as proof_mod
    from toyni_tpu.trace import ExecutionTrace

    cfg = cfg or DEFAULT_CONFIG

    def mk():
        if air is not None and getattr(air, "num_columns", 1) > 1:
            cols = air.generate_trace(n)
            t = ExecutionTrace()
            for c in cols:
                t.insert_column(c)
            return t
        return _fib_trace(n)

    dist = DistributedStarkProver(mk(), D, air=air, config=cfg,
                                  seed=seed).generate_proof()
    single = StarkProver(mk(), air=air, config=cfg,
                         seed=seed).generate_proof()
    assert StarkVerifier(air=air, config=cfg).verify(dist), (
        "distributed proof rejected"
    )
    assert proof_mod.serialize(dist) == proof_mod.serialize(single), (
        "distributed proof differs from single-device proof"
    )


def test_interactive_distributed_ext_challenges():
    """Ext-challenge mode (z/betas from F_p^4, ext DEEP/FRI codewords and
    leaves) over the mesh must be byte-identical to single-device."""
    from toyni_tpu.config import StarkConfig

    _assert_dist_matches_single(64, cfg=StarkConfig(ext_challenges=True))


def test_interactive_distributed_multi_column():
    """Generic multi-column / multi-constraint AIR (row-bundle trace
    commitments, alpha composition, ns=2 shifts) over the mesh."""
    from toyni_tpu.air import PairFibonacciAir

    _assert_dist_matches_single(64, air=PairFibonacciAir())


def test_interactive_distributed_multi_ext():
    """Multi-column AND ext challenges combined (wire format v4)."""
    from toyni_tpu.air import PairFibonacciAir
    from toyni_tpu.config import StarkConfig

    _assert_dist_matches_single(
        64, air=PairFibonacciAir(), cfg=StarkConfig(ext_challenges=True)
    )


def test_interactive_distributed_nondividing_blowup():
    """D = 8 does NOT divide blowup = 4: every trace roll crosses shard
    boundaries (mesh.roll_cyclic_local's ppermute path). The proof must stay
    byte-identical to the single-device prover — the round-4 removal of the
    `D | blowup` layout precondition."""
    from toyni_tpu.config import StarkConfig

    cfg = StarkConfig(blowup=4)
    assert cfg.blowup % D != 0
    _assert_dist_matches_single(128, cfg=cfg)


def test_interactive_distributed_replicated_fri_tail():
    """final_layer_size (4) smaller than the mesh (8): the tiny FRI tail
    folds replicated; the proof must stay byte-identical."""
    from toyni_tpu.config import DEFAULT_CONFIG

    assert DEFAULT_CONFIG.final_layer_size(32) % D != 0
    _assert_dist_matches_single(32)
