"""FRI + polynomial integration tests — the analog of the reference's only
external test file (reference: tests/fri.rs)."""

import numpy as np
import jax.numpy as jnp

from toyni_tpu.field.babybear import P, get_root_of_unity, MONT_R
from toyni_tpu.field import oracle
from toyni_tpu.domain import Domain
from toyni_tpu.ops import fri as fri_ops
from toyni_tpu.ops.ntt import np_powers
from toyni_tpu import poly

RNG = np.random.default_rng(0xF01D)


def test_domain_nesting():
    # tests/fri.rs:11-25 — the squared domain of size n/2 nests correctly
    d = Domain.new(16)
    els = d.elements_np()
    squared = set(int(x) * int(x) % P for x in els)
    d2 = Domain.new(8)
    assert squared == set(int(x) for x in d2.elements_np())


def test_polynomial_division():
    # tests/fri.rs:28-70 incl. exact division
    a = [1, 2, 3, 4, 5]
    b = [2, 1]
    q, r = poly.h_divide(a, b)
    # check a == q*b + r
    recon = poly.h_add(poly.h_multiply(q, b), r)
    trimmed = [int(v) for v in a]
    assert recon == trimmed

    # division by a factor leaves zero remainder: (x^2 - 1) / (x - 1)
    num = [(P - 1), 0, 1]
    den = [(P - 1), 1]
    q, r = poly.h_divide(num, den)
    assert r == []
    assert q == [1, 1]


def test_polynomial_add_mul():
    # tests/fri.rs:73-98
    a = [1, 2]
    b = [3, 4]
    assert poly.h_add(a, b) == [4, 6]
    assert poly.h_multiply(a, b) == [3, 10, 8]


def test_lagrange_vs_intt():
    # interpolation equivalence: INTT == O(n^2) Lagrange on the same points
    n = 8
    d = Domain.new(n)
    ys = [int(v) for v in RNG.integers(0, P, n, dtype=np.uint64)]
    xs = [int(v) for v in d.elements_np()]
    lagr = poly.h_lagrange_interpolate(xs, ys)
    lagr += [0] * (n - len(lagr))
    intt_coeffs = [int(v) for v in np.asarray(
        d.ifft(jnp.asarray(np.array(ys, np.uint32))), np.uint64)]
    assert lagr == intt_coeffs


def test_fri_fold_consistency():
    # tests/fri.rs:101-133 — fold a real codeword with a random beta; the
    # folded values must interpolate to the algebraic fold
    #   f(x) = e(x^2) + x o(x^2)  =>  folded(y) = e(y) + beta o(y)
    n, deg = 32, 7
    d = Domain.new(n)
    coeffs = RNG.integers(0, P, deg + 1, dtype=np.uint64)
    evals = d.fft(jnp.asarray(coeffs.astype(np.uint32)))
    beta = 987654321 % P

    xs = [int(v) for v in d.elements_np()]
    evals_l = [int(v) for v in np.asarray(evals, np.uint64)]
    folded = fri_ops.h_fri_fold(evals_l, xs, beta)

    # expected: fold coefficients directly
    e = [int(c) for c in coeffs[0::2]]
    o = [int(c) for c in coeffs[1::2]]
    expect_coeffs = [(ec + beta * oc) % P for ec, oc in zip(e, o)]
    d2 = Domain.new(n // 2)
    for i, y in enumerate(d2.elements_np()):
        assert folded[i] == poly.h_evaluate(expect_coeffs, int(y)), f"i={i}"


def test_device_fold_matches_host_oracle():
    n = 64
    d = Domain.new(n).get_coset(7)
    evals = RNG.integers(0, P, n, dtype=np.uint64)
    beta = 424242
    xs = [int(v) for v in d.elements_np()]
    expect = fri_ops.h_fri_fold([int(v) for v in evals], xs, beta)

    # device path with the closed-form inverse table
    h_inv = pow(7, P - 2, P)
    om_inv = pow(d.omega, P - 2, P)
    xs_inv = np_powers(om_inv, n // 2) * np.uint64(h_inv) % np.uint64(P)
    xs_inv_m = (xs_inv * np.uint64(MONT_R) % np.uint64(P)).astype(np.uint32)
    got = fri_ops.fri_fold(
        jnp.asarray(evals.astype(np.uint32)), jnp.asarray(xs_inv_m), beta
    )
    assert [int(v) for v in np.asarray(got, np.uint64)] == expect


def test_repeated_fold_reaches_constant():
    # folding a degree-<2 codeword on an 8-point domain twice gives a
    # constant layer — the degree-bound mechanism of the verifier
    n = 8
    d = Domain.new(n)
    coeffs = np.array([5, 9], np.uint64)  # degree 1
    evals = [int(v) for v in np.asarray(d.fft(jnp.asarray(coeffs.astype(np.uint32))), np.uint64)]
    xs = [int(v) for v in d.elements_np()]
    l1 = fri_ops.h_fri_fold(evals, xs, 77)
    xs2 = [x * x % P for x in xs[:4]]
    l2 = fri_ops.h_fri_fold(l1, xs2, 88)
    assert len(set(l2)) == 1
