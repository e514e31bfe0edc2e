"""Counter-mode salt generation (ops/salts.py) and the pruned/saltless
tree machinery built on it (merkle.prune_levels, prover SALTLESS_MIN).

The load-bearing properties:
1. The in-repo threefry clone is BIT-IDENTICAL to the jax bulk draw the
   provers used through round 3 — proof bytes must not change.
2. Slices equal the bulk draw at any index (query-time regeneration).
3. A proof generated with pruned trees + key-form salts is byte-identical
   to the same-seed proof with full storage: the storage mode is invisible
   in the proof (thresholds lowered in-test, as with the round-2 leafless
   tests — the real thresholds engage at LDE >= 2^26, CPU-infeasible).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from toyni_tpu.field.babybear import P
from toyni_tpu.ops import salts as salts_mod
from toyni_tpu.prover import StarkProver
from toyni_tpu.trace import ExecutionTrace
from toyni_tpu.verifier import StarkVerifier
from toyni_tpu import proof as proof_mod


def test_key_words_matches_prngkey():
    for seed in (0, 1, 12345, 2**62 + 17):
        np.testing.assert_array_equal(
            salts_mod.key_words(seed),
            np.asarray(jax.random.PRNGKey(seed), np.uint32),
        )


def test_salts_full_matches_jax_bulk_draw():
    """The clone reproduces jax.random.bits(key, (n, 4)) exactly — the
    draw every prover used through round 3 (provenance of golden bytes)."""
    for seed, n in ((7, 1), (12345, 257), (2**61 + 3, 1024)):
        key = jax.random.PRNGKey(seed)
        bulk = np.asarray(jax.random.bits(key, (n, 4), dtype=jnp.uint32))
        mine = np.asarray(
            salts_mod.salts_full(jnp.asarray(salts_mod.key_words(seed)), n)
        )
        np.testing.assert_array_equal(mine, bulk)


def test_salts_field_masking_matches_prover_draw():
    """Poseidon2-mode masking must equal the round-3 prover steps:
    31-bit mask then one conditional subtract of p."""
    seed, n = 99, 513
    key = jax.random.PRNGKey(seed)
    bits = np.asarray(jax.random.bits(key, (n, 4), dtype=jnp.uint32))
    bits = bits & np.uint32(0x7FFFFFFF)
    expect = np.where(bits >= np.uint32(P), bits - np.uint32(P), bits)
    mine = np.asarray(
        salts_mod.salts_full(
            jnp.asarray(salts_mod.key_words(seed)), n, field=True
        )
    )
    np.testing.assert_array_equal(mine, expect)
    assert mine.max() < P


def test_salts_for_indices_equals_bulk_slice():
    seed, n = 4242, 2048
    key = jnp.asarray(salts_mod.key_words(seed))
    bulk = np.asarray(salts_mod.salts_full(key, n))
    idx = np.array([0, 1, 2, 1023, 2047, 500, 501], np.int32)
    sl = np.asarray(salts_mod.salts_for_indices(key, jnp.asarray(idx)))
    np.testing.assert_array_equal(sl, bulk[idx])
    # field-masked variant
    bulk_f = np.asarray(salts_mod.salts_full(key, n, field=True))
    sl_f = np.asarray(
        salts_mod.salts_for_indices(key, jnp.asarray(idx), field=True)
    )
    np.testing.assert_array_equal(sl_f, bulk_f[idx])


def test_salts_inside_jit():
    """Both entry points must be traceable with the key as an argument."""
    key = jnp.asarray(salts_mod.key_words(5))
    full = jax.jit(lambda k: salts_mod.salts_full(k, 64))(key)
    np.testing.assert_array_equal(
        np.asarray(full), np.asarray(salts_mod.salts_full(key, 64))
    )
    idx = jnp.asarray(np.array([3, 60], np.int32))
    sl = jax.jit(salts_mod.salts_for_indices)(key, idx)
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(full)[(3, 60), :])


# ── pruned trees + key-form salts: storage is invisible in the proof ───────

def _fib_trace(n):
    fibs, a, b = [], 1, 1
    for _ in range(n):
        fibs.append(a % P)
        a, b = b, (a + b) % P
    t = ExecutionTrace()
    t.insert_column(fibs)
    return t


def _proof_bytes(n=64, air=None, cfg=None, seed=33):
    from toyni_tpu.config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    if air is not None and getattr(air, "num_columns", 1) > 1:
        cols = air.generate_trace(n)
        t = ExecutionTrace()
        for c in cols:
            t.insert_column(c)
    else:
        t = _fib_trace(n)
    p = StarkProver(t, air=air, config=cfg, seed=seed).generate_proof()
    assert StarkVerifier(air=air, config=cfg).verify(p)
    return proof_mod.serialize(p)


def _assert_storage_invisible(monkeypatch, **kw):
    """Prove once with full storage (default thresholds), once with every
    huge-layer regime engaged at CPU-testable sizes — trace 64 -> LDE 2048
    commits prune 3 bottom levels with key-form salts; FRI layers hit the
    prune-1 (leafless) and full-storage regimes on the way down — and
    require byte-identical proofs for the same seed."""
    from toyni_tpu import merkle as mk
    from toyni_tpu import prover as prover_mod

    def clear():
        mk._tree_builder.cache_clear()
        prover_mod._phase_fns.cache_clear()

    clear()
    try:
        ref = _proof_bytes(**kw)  # full storage (default thresholds)
        with monkeypatch.context() as mp:
            mp.setattr(mk, "LEAFLESS_MIN", 512)
            mp.setattr(mk, "PRUNE_MIN", 1024)
            mp.setattr(mk, "PRUNE_DEPTH", 3)
            # deep-pruned layers stream their bottom build in CHUNK_LANES
            # chunks; 256 at LDE 2048 makes it a real 8-iteration fori_loop
            mp.setattr(mk, "CHUNK_LANES", 256)
            mp.setattr(prover_mod, "SALTLESS_MIN", 1024)
            clear()
            got = _proof_bytes(**kw)
        assert got == ref, "pruned/saltless storage changed the proof bytes"
    finally:
        clear()


def test_pruned_saltless_proof_byte_identical(monkeypatch):
    _assert_storage_invisible(monkeypatch)


def test_pruned_saltless_ext_mode(monkeypatch):
    from toyni_tpu.config import StarkConfig

    _assert_storage_invisible(monkeypatch, cfg=StarkConfig(ext_challenges=True))


def test_pruned_saltless_multi_mode(monkeypatch):
    from toyni_tpu.air import PairFibonacciAir

    _assert_storage_invisible(monkeypatch, air=PairFibonacciAir())


def test_pruned_saltless_poseidon2_mode(monkeypatch):
    from toyni_tpu.config import StarkConfig

    _assert_storage_invisible(monkeypatch, cfg=StarkConfig(hash="poseidon2"))
