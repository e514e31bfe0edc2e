"""Distributed prover with Poseidon2 commitments (wire format v5).

Own module (not in test_distributed_modes.py): each protocol mode compiles
a full set of shard_map phase programs, and this deployment's XLA:CPU
crashes once too many executables accumulate in one process (see
tests/conftest.py) — process-per-file xdist keeps each module under the
threshold.
"""

from test_distributed_modes import _assert_dist_matches_single


def test_distributed_poseidon2_base():
    from toyni_tpu.config import StarkConfig

    _assert_dist_matches_single(64, cfg=StarkConfig(hash="poseidon2"))


def test_distributed_poseidon2_ext():
    from toyni_tpu.config import StarkConfig

    _assert_dist_matches_single(
        64, cfg=StarkConfig(hash="poseidon2", ext_challenges=True)
    )


def test_distributed_poseidon2_multi():
    from toyni_tpu.air import PairFibonacciAir
    from toyni_tpu.config import StarkConfig

    _assert_dist_matches_single(
        64, air=PairFibonacciAir(), cfg=StarkConfig(hash="poseidon2")
    )
