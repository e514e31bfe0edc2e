"""Tests for API-parity components not exercised by the bundled pipeline
(the reference's ◇ components): Ext FRI fold, synthetic division, CLI,
profiling."""

import numpy as np
import jax.numpy as jnp

from toyni_tpu.field.babybear import P, get_root_of_unity, MONT_R
from toyni_tpu.field import ext as extf
from toyni_tpu.domain import Domain
from toyni_tpu.ops import fri as fri_ops
from toyni_tpu.ops.ntt import np_powers
from toyni_tpu import poly

RNG = np.random.default_rng(0xE17)


def test_fri_fold_ext_device_matches_host():
    n = 32
    d = Domain.new(n)
    evals = RNG.integers(0, P, (n, 4), dtype=np.uint64)
    beta = tuple(int(v) for v in RNG.integers(0, P, 4, dtype=np.uint64))
    xs = [int(v) for v in d.elements_np()]

    expect = fri_ops.h_fri_fold_ext(
        [tuple(int(c) for c in row) for row in evals], xs, beta
    )

    om_inv = pow(d.omega, P - 2, P)
    xs_inv = np_powers(om_inv, n // 2) * np.uint64(MONT_R) % np.uint64(P)
    got = fri_ops.fri_fold_ext(
        jnp.asarray(evals.astype(np.uint32)),
        jnp.asarray(xs_inv.astype(np.uint32)),
        np.array(beta, np.uint32),
    )
    got = [tuple(int(c) for c in row) for row in np.asarray(got, np.uint64)]
    assert got == expect


def test_fri_fold_ext_consistency():
    # algebraic fold property in the extension field: folding evals of
    # f(x) = e(x^2) + x*o(x^2) gives evals of e(y) + beta*o(y)
    n = 16
    d = Domain.new(n)
    coeffs = RNG.integers(0, P, (6, 4), dtype=np.uint64)
    padded = np.zeros((n, 4), np.uint64)
    padded[:6] = coeffs
    evals = np.asarray(d.fft_ext(jnp.asarray(padded.astype(np.uint32))), np.uint64)
    beta = tuple(int(v) for v in RNG.integers(0, P, 4, dtype=np.uint64))
    xs = [int(v) for v in d.elements_np()]
    folded = fri_ops.h_fri_fold_ext(
        [tuple(int(c) for c in row) for row in evals], xs, beta
    )
    e = [tuple(int(c) for c in coeffs[i]) for i in range(0, 6, 2)]
    o = [tuple(int(c) for c in coeffs[i]) for i in range(1, 6, 2)]
    expect_coeffs = [extf.h_add(ec, extf.h_mul(beta, oc)) for ec, oc in zip(e, o)]
    d2 = Domain.new(n // 2)
    for i, y in enumerate(d2.elements_np()):
        acc = extf.H_ZERO
        for c in reversed(expect_coeffs):
            acc = extf.h_add(extf.h_mul_base(acc, int(y)), c)
        assert folded[i] == acc, f"i={i}"


def test_divide_by_linear():
    coeffs = [int(v) for v in RNG.integers(0, P, 9, dtype=np.uint64)]
    z = 987654
    q, r = poly.h_divide_by_linear(coeffs, z)
    assert r == poly.h_evaluate(coeffs, z)
    # q*(x-z) + r == P
    recon = poly.h_add(poly.h_multiply(q, [(P - z) % P, 1]), [r])
    expect = coeffs[:]
    while expect and expect[-1] == 0:
        expect.pop()
    assert recon == expect


def test_divide_by_linear_exact_root():
    # dividing by a known root leaves zero remainder
    q0 = [3, 1]  # x + 3
    factor = [(P - 5) % P, 1]  # x - 5
    prod = poly.h_multiply(q0, factor)
    q, r = poly.h_divide_by_linear(prod, 5)
    assert r == 0
    assert q == q0


def test_cli_prove_verify_roundtrip(tmp_path):
    from toyni_tpu.__main__ import main

    out = str(tmp_path / "p.bin")
    assert main(["prove", "--rows", "64", "--seed", "3", "--out", out]) == 0
    assert main(["verify", "--in", out]) == 0
    # tamper the file -> verify fails (nonzero exit or parse error)
    blob = bytearray(open(out, "rb").read())
    blob[100] ^= 1
    open(out, "wb").write(bytes(blob))
    try:
        rc = main(["verify", "--in", out])
    except Exception:
        rc = 1
    assert rc == 1


def test_profiling_report():
    from toyni_tpu import profiling

    profiling.report(reset=True)
    with profiling.phase("unit_test_phase"):
        pass
    rep = profiling.report()
    assert rep["unit_test_phase"]["calls"] == 1
    assert "unit_test_phase" in profiling.format_report(reset=True)


def test_deep_fri_core_pipeline():
    """The fused DEEP+FRI core (bench/dryrun path) produces layer roots that
    chain-fold consistently with the standalone fold op."""
    from toyni_tpu.pipeline import make_deep_fri_core, make_commit_core
    from toyni_tpu.ops import sha256 as sha

    n = 64
    fn, make_args = make_deep_fri_core(n)
    args = make_args(seed=3)
    out = fn(*args)
    N = n * 32
    assert out["d_evals"].shape == (N,)
    assert len(out["layers"]) == 9  # layer 0 + 8 folds
    assert len(out["roots"]) == 9
    assert out["layers"][-1].shape == (8,)
    for r in out["roots"]:
        assert np.asarray(r).shape == (8,)


def test_poly_sub_scale_format():
    """add/sub/scale/Display parity (src/math/polynomial.rs:88-116,162-165,
    194-220)."""
    from toyni_tpu.poly import format_poly, h_add, h_scale, h_sub

    a = [1, 2, 3]
    b = [5, 7]
    assert h_sub(a, b) == [(1 - 5) % P, (2 - 7) % P, 3]
    assert h_add(h_sub(a, b), b) == a
    assert h_scale(a, 2) == [2, 4, 6]
    assert h_scale(a, 0) == [0, 0, 0]
    assert format_poly([1, 2, 3]) == "3x^2 + 2x + 1"
    assert format_poly([0, 1]) == "x"
    assert format_poly([5]) == "5"
    assert format_poly([0, 0]) == "0"
    assert format_poly([]) == "0"


def test_profiling_roofline_counters():
    """SURVEY §5: per-kernel roofline counters — XLA cost analysis exposes
    flops/bytes/intensity and a speed-of-light floor for any jitted
    program."""
    import jax.numpy as jnp
    import numpy as np

    from toyni_tpu import profiling
    from toyni_tpu.field import babybear as bb
    from toyni_tpu.field.babybear import P

    x = jnp.asarray(np.arange(1 << 12, dtype=np.uint32) % P)
    c = profiling.cost_summary(lambda v: bb.mont_mul(v, v), x)
    assert c["flops"] > 0 and c["bytes_accessed"] > 0
    assert c["roofline_bound"] in ("memory", "compute")
    line = profiling.roofline(
        lambda v: bb.mont_mul(v, v), x, measured_seconds=1e-3
    )
    assert "speed-of-light" in line and "bound=" in line


def test_profiling_metrics_counters():
    """SURVEY §5 observability: a proof run produces structured metrics —
    phase timers plus dispatch / d2h-transfer counters — and a valid JSON
    metrics line (the `prove --profile` output)."""
    import json

    from toyni_tpu import profiling
    from toyni_tpu.field.babybear import P
    from toyni_tpu.prover import StarkProver
    from toyni_tpu.trace import ExecutionTrace

    profiling.metrics(reset=True)  # clean slate
    fibs, a, b = [], 1, 1
    for _ in range(64):
        fibs.append(a % P)
        a, b = b, (a + b) % P
    t = ExecutionTrace()
    t.insert_column(fibs)
    StarkProver(t, seed=3).generate_proof()

    m = profiling.metrics()
    assert m["counters"].get("dispatches", 0) > 0
    assert m["counters"].get("d2h_bytes", 0) > 0
    assert any(k.startswith("commit") for k in m["phases"])
    line = json.loads(profiling.metrics_line())  # resets
    assert "toyni_metrics" in line
    assert line["toyni_metrics"]["dispatches"] > 0
    assert profiling.metrics()["counters"] == {}
