"""MXU-path NTT (ops/ntt_mxu.py): DFT levels as exact bf16 limb matmuls.

Differential oracle: must match ops.ntt.ntt (itself pinned against the
reference algorithm) bit-for-bit at every size, including multi-level
four-step recursions (balanced factorizations: 2^12 = 64*64,
2^16 = 256*256, 2^17 = 64*64*32)."""

import numpy as np
import jax.numpy as jnp

from toyni_tpu.field.babybear import P, get_root_of_unity
from toyni_tpu.ops.ntt import ntt as ntt_ref
from toyni_tpu.ops.ntt_mxu import (
    _dft_matrix_np,
    _limbs_bf16_np,
    mxu_intt,
    mxu_ntt,
)


def test_limb_matmul_exactness_bound():
    # every f32 dot the kernel takes: products <= 255^2, 256-term sums
    # <= 255^2 * 256 < 2^24 — representable exactly in f32
    assert 255 * 255 * 256 < 1 << 24
    m = _dft_matrix_np(256, get_root_of_unity(8))
    limbs = _limbs_bf16_np(m)
    # limbs recombine exactly
    back = sum(limbs[i].astype(np.uint32) << (8 * i) for i in range(4))
    assert np.array_equal(back, m)


def test_mxu_matches_reference_all_sizes():
    rng = np.random.default_rng(1)
    for log_n in (4, 8, 10, 12, 16):
        n = 1 << log_n
        om = get_root_of_unity(log_n)
        x = rng.integers(0, P, n, dtype=np.uint64).astype(np.uint32)
        want = np.asarray(ntt_ref(jnp.asarray(x), om), np.uint64)
        got = np.asarray(mxu_ntt(jnp.asarray(x), om), np.uint64)
        assert np.array_equal(want, got), f"mismatch at 2^{log_n}"


def test_mxu_extreme_values():
    """Adversarial inputs for the carry chains of the 96-bit recombination:
    all-(p-1) vectors maximize every limb-product sum c_k."""
    for log_n in (8, 12):
        n = 1 << log_n
        om = get_root_of_unity(log_n)
        x = np.full(n, P - 1, np.uint32)
        want = np.asarray(ntt_ref(jnp.asarray(x), om), np.uint64)
        got = np.asarray(mxu_ntt(jnp.asarray(x), om), np.uint64)
        assert np.array_equal(want, got), f"extreme mismatch at 2^{log_n}"


def test_mxu_roundtrip():
    rng = np.random.default_rng(2)
    n = 1 << 12
    om = get_root_of_unity(12)
    x = rng.integers(0, P, n, dtype=np.uint64).astype(np.uint32)
    y = mxu_ntt(jnp.asarray(x), om)
    back = np.asarray(mxu_intt(y, om), np.uint64)
    assert np.array_equal(back, x.astype(np.uint64))


def test_mxu_batched_matches_per_vector():
    """apply_mxu_ntt_batched (batch as extra matmul lanes) must equal the
    per-vector recursion bit-for-bit — this is the path batch.ntt_batched
    dispatches to when the MXU tables are active."""
    from toyni_tpu.ops.ntt_mxu import apply_mxu_ntt_batched, mxu_ntt_tables

    rng = np.random.default_rng(7)
    n, B = 1 << 12, 3
    om = get_root_of_unity(12)
    x = rng.integers(0, P, (B, n), dtype=np.uint64).astype(np.uint32)
    tabs = mxu_ntt_tables(n, om)
    got = np.asarray(apply_mxu_ntt_batched(jnp.asarray(x), tabs), np.uint64)
    for b in range(B):
        want = np.asarray(mxu_ntt(jnp.asarray(x[b]), om), np.uint64)
        assert np.array_equal(got[b], want), f"batched mismatch row {b}"


def test_flag_on_routes_through_domain_fft(monkeypatch):
    """Regression (round-1 advisor finding): with TOYNI_MXU_NTT=1 the
    generic ntt()/intt() entry points — and therefore domain.fft/ifft and
    everything built on them — must dispatch MXU tables correctly instead
    of misparsing them as four-step tables."""
    import toyni_tpu.ops.ntt as ntt_ops
    from toyni_tpu.domain import Domain

    monkeypatch.setattr(ntt_ops, "_MXU_NTT", 1)
    try:
        rng = np.random.default_rng(9)
        n = 1 << 12
        dom = Domain.new(n).get_coset(7)
        coeffs = rng.integers(0, P, n, dtype=np.uint64).astype(np.uint32)
        evals = dom.fft(jnp.asarray(coeffs))
        back = np.asarray(dom.ifft(evals), np.uint64)
        assert np.array_equal(back, coeffs.astype(np.uint64))
        # cross-check vs the flag-off path
        monkeypatch.setattr(ntt_ops, "_MXU_NTT", 0)
        want = np.asarray(dom.fft(jnp.asarray(coeffs)), np.uint64)
        assert np.array_equal(np.asarray(evals, np.uint64), want)
    finally:
        monkeypatch.setattr(ntt_ops, "_MXU_NTT", None)


def test_i8_balanced_digits_exact():
    """Balanced base-256 digits recombine exactly and stay in [-128, 127]
    for every BabyBear value class (incl. the carry-chain extremes)."""
    from toyni_tpu.ops.ntt_mxu import _digits_i8_np

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.integers(0, P, 1 << 12, dtype=np.uint64),
        np.array([0, 1, 127, 128, 255, 256, P - 1, P - 2, 0x7F7F7F7F % P],
                 np.uint64),
    ]).astype(np.uint32).reshape(1, -1)
    d = _digits_i8_np(vals).astype(np.int64)
    back = sum(d[i] << (8 * i) for i in range(4))
    assert np.array_equal(back, vals.astype(np.int64))


def test_i8_mxu_matches_reference():
    """The int8 balanced-digit MXU variant must match ops.ntt.ntt
    bit-for-bit, including the all-(p-1) carry extremes of the signed
    recombination."""
    from toyni_tpu.ops.ntt_mxu import apply_mxu_ntt, mxu_ntt_tables_i8

    rng = np.random.default_rng(12)
    for log_n in (8, 12, 16, 17):
        n = 1 << log_n
        om = get_root_of_unity(log_n)
        tabs = mxu_ntt_tables_i8(n, om)
        for x in (
            rng.integers(0, P, n, dtype=np.uint64).astype(np.uint32),
            np.full(n, P - 1, np.uint32),
        ):
            want = np.asarray(ntt_ref(jnp.asarray(x), om), np.uint64)
            got = np.asarray(apply_mxu_ntt(jnp.asarray(x), tabs), np.uint64)
            assert np.array_equal(want, got), f"i8 mismatch at 2^{log_n}"
