"""NTT + domain tests: device transforms vs the scalar oracle and vs direct
polynomial evaluation (reference tests: src/ntt.rs:317-380,
src/math/domain.rs:177-305)."""

import numpy as np
import jax.numpy as jnp

from toyni_tpu.field import babybear as bb, oracle
from toyni_tpu.field.babybear import P, get_root_of_unity
from toyni_tpu.ops import ntt as ntt_ops
from toyni_tpu.domain import Domain

RNG = np.random.default_rng(1234)


def rand_arr(n):
    return RNG.integers(0, P, size=n, dtype=np.uint64)


def dev(a):
    return jnp.asarray(np.asarray(a, np.uint64).astype(np.uint32))


def check(device_result, oracle_result):
    np.testing.assert_array_equal(
        np.asarray(device_result, np.uint64), np.asarray(oracle_result, np.uint64)
    )


def horner_eval(coeffs, x):
    acc = 0
    for c in reversed([int(v) for v in coeffs]):
        acc = (acc * x + c) % P
    return acc


# ── NTT core ────────────────────────────────────────────────────────────────

def test_ntt_matches_oracle():
    for log_n in (3, 6, 10):
        n = 1 << log_n
        omega = get_root_of_unity(log_n)
        a = rand_arr(n)
        check(ntt_ops.ntt(dev(a), omega), oracle.ntt(a, omega))


def test_ntt_is_evaluation():
    # reference: src/ntt.rs NTT-as-evaluation vs direct Horner
    n = 16
    omega = get_root_of_unity(4)
    a = rand_arr(n)
    got = np.asarray(ntt_ops.ntt(dev(a), omega), np.uint64)
    for k in range(n):
        assert int(got[k]) == horner_eval(a, pow(omega, k, P)), f"k={k}"


def test_ntt_intt_roundtrip():
    for log_n in (4, 8, 12):
        n = 1 << log_n
        omega = get_root_of_unity(log_n)
        a = rand_arr(n)
        back = ntt_ops.intt(ntt_ops.ntt(dev(a), omega), omega)
        check(back, a)


def test_intt_matches_oracle():
    n = 256
    omega = get_root_of_unity(8)
    a = rand_arr(n)
    check(ntt_ops.intt(dev(a), omega), oracle.intt(a, omega))


def test_batched_ntt():
    n = 64
    omega = get_root_of_unity(6)
    a = rand_arr((4, n))
    got = np.asarray(ntt_ops.ntt(dev(a), omega), np.uint64)
    for i in range(4):
        check(got[i], oracle.ntt(a[i], omega))


# ── domains ─────────────────────────────────────────────────────────────────

def test_domain_elements():
    # reference: src/math/domain.rs:182-191
    d = Domain.new(8)
    els = d.elements_np()
    assert els[0] == 1
    assert pow(d.group_gen(), 8, P) == 1
    assert len(set(int(e) for e in els)) == 8


def test_fft_ifft_roundtrip():
    d = Domain.new(8)
    coeffs = np.arange(8, dtype=np.uint64) * 3 + 1
    back = d.ifft(d.fft(dev(coeffs)))
    check(back, coeffs)


def test_coset_fft_ifft_roundtrip():
    d = Domain.new(8).get_coset(7)
    coeffs = np.arange(8, dtype=np.uint64) * 3 + 1
    back = d.ifft(d.fft(dev(coeffs)))
    check(back, coeffs)


def test_coset_evaluations_correct():
    # reference: src/math/domain.rs:221-242
    d = Domain.new(8).get_coset(7)
    coeffs = np.array([1, 2, 3], np.uint64)
    evals = np.asarray(d.fft(dev(coeffs)), np.uint64)
    for i, x in enumerate(d.elements_np()):
        assert int(evals[i]) == horner_eval(coeffs, int(x)), f"i={i}"


def test_fft_zero_pad_is_lde():
    # evaluating deg-7 poly on a 64-point coset == Horner at every point
    small = Domain.new(8)
    big = Domain.new(64).get_coset(7)
    coeffs = rand_arr(8)
    lde = np.asarray(big.fft(dev(coeffs)), np.uint64)
    for i in (0, 1, 17, 63):
        x = int(big.elements_np()[i])
        assert int(lde[i]) == horner_eval(coeffs, x)


def test_vanishing_polynomial():
    # reference: src/math/domain.rs:281-291
    d = Domain.new(8)
    for x in d.elements_np():
        assert horner_eval(d.vanishing_poly_coeffs(), int(x)) == 0
    assert d.eval_vanishing(5) == horner_eval(d.vanishing_poly_coeffs(), 5)


def test_extended_domain_contains_original():
    # reference: src/math/domain.rs:293-304 (index alignment at blowup 8)
    orig = Domain.new(4)
    extd = Domain.new(32)
    o, e = orig.elements_np(), extd.elements_np()
    for i in range(4):
        assert o[i] == e[i * 8]


def test_ext_fft_roundtrip():
    # reference: src/math/domain.rs:245-257
    d = Domain.new(8)
    coeffs = RNG.integers(0, P, size=(8, 4), dtype=np.uint64)
    back = d.ifft_ext(d.fft_ext(dev(coeffs)))
    check(back, coeffs)


def test_ext_fft_evaluates_correctly():
    # reference: src/math/domain.rs:260-278 — Ext FFT vs Horner with base x
    from toyni_tpu.field import ext as extf

    d = Domain.new(8)
    coeffs = RNG.integers(0, P, size=(3, 4), dtype=np.uint64)
    padded = np.zeros((8, 4), np.uint64)
    padded[:3] = coeffs
    evals = np.asarray(d.fft_ext(dev(padded)), np.uint64)
    for i, x in enumerate(d.elements_np()):
        acc = extf.H_ZERO
        for crow in reversed(coeffs):
            acc = extf.h_add(extf.h_mul_base(acc, int(x)), tuple(int(v) for v in crow))
        assert tuple(int(v) for v in evals[i]) == acc, f"i={i}"
