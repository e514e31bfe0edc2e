"""Field-layer tests: device kernels vs the NumPy oracle + the reference's
golden semantics (reference tests: src/babybear.rs:216-285, src/ext.rs:210-275).
Seeded RNG throughout (the discipline of src/ext.rs:214-217)."""

import numpy as np
import jax.numpy as jnp

from toyni_tpu.field import babybear as bb
from toyni_tpu.field import ext
from toyni_tpu.field import oracle
from toyni_tpu.field.babybear import P

RNG = np.random.default_rng(0xC0FFEE)


def rand_arr(shape):
    return RNG.integers(0, P, size=shape, dtype=np.uint64)


def dev(a):
    return jnp.asarray(np.asarray(a, np.uint64).astype(np.uint32))


def check(device_result, oracle_result):
    np.testing.assert_array_equal(
        np.asarray(device_result, np.uint64), np.asarray(oracle_result, np.uint64)
    )


# ── BabyBear base field ─────────────────────────────────────────────────────

def test_add_sub_neg_vs_oracle():
    a, b = rand_arr(4096), rand_arr(4096)
    check(bb.add(dev(a), dev(b)), oracle.add(a, b))
    check(bb.sub(dev(a), dev(b)), oracle.sub(a, b))
    check(bb.neg(dev(a)), oracle.neg(a))


def test_mul_vs_oracle():
    a, b = rand_arr(4096), rand_arr(4096)
    check(bb.mul(dev(a), dev(b)), oracle.mul(a, b))


def test_mul_edge_cases():
    edge = np.array([0, 1, 2, P - 1, P - 2, (P - 1) // 2], np.uint64)
    a = np.repeat(edge, len(edge))
    b = np.tile(edge, len(edge))
    check(bb.mul(dev(a), dev(b)), oracle.mul(a, b))


def test_mont_roundtrip():
    a = rand_arr(1024)
    check(bb.from_mont(bb.to_mont(dev(a))), a)


def test_mont_mul_shift_bit_identical():
    # shift-trick reduction must equal mont_mul everywhere, incl. edges
    a, b = rand_arr(4096), rand_arr(4096)
    edge = np.array([0, 1, 2, P - 1, P - 2, (P - 1) // 2], np.uint64)
    a = np.concatenate([a, np.repeat(edge, len(edge))])
    b = np.concatenate([b, np.tile(edge, len(edge))])
    got = np.asarray(bb.mont_mul_shift(dev(a), dev(b)), np.uint64)
    ref = np.asarray(bb.mont_mul(dev(a), dev(b)), np.uint64)
    np.testing.assert_array_equal(got, ref)


def test_basic_arithmetic_golden():
    # reference: src/babybear.rs:220-233
    assert int(bb.add(dev([100]), dev([200]))[0]) == 300
    assert int(bb.sub(dev([200]), dev([100]))[0]) == 100
    assert int(bb.mul(dev([100]), dev([200]))[0]) == 20000
    # pow golden: 3^4 = 81 (src/babybear.rs:250-254)
    assert int(bb.pow_const(dev([3]), 4)[0]) == 81


def test_pow_vs_oracle():
    a = rand_arr(512)
    for e in (0, 1, 2, 7, P - 2, 123456789):
        check(bb.pow_const(dev(a), e), oracle.pow_(a, e))


def test_inverse():
    a = rand_arr(1024)
    a[a == 0] = 1
    ai = bb.inv(dev(a))
    check(bb.mul(dev(a), ai), np.ones(1024, np.uint64))
    # 0 -> 0 device convention
    assert int(bb.inv(dev([0]))[0]) == 0


def test_division_semantics():
    # reference: src/babybear.rs:278-284 (a / b) * b == a
    a, b = rand_arr(256), rand_arr(256)
    b[b == 0] = 1
    q = bb.mul(dev(a), bb.inv(dev(b)))
    check(bb.mul(q, dev(b)), a)


def test_roots_of_unity():
    # reference: src/babybear.rs:257-268
    for log_n in range(1, 11):
        omega = bb.get_root_of_unity(log_n)
        assert pow(omega, 1 << log_n, P) == 1
        assert pow(omega, 1 << (log_n - 1), P) != 1


def test_powers_table():
    omega = bb.get_root_of_unity(8)
    got = bb.powers(omega, 256)
    check(got, oracle.powers(omega, 256))
    got_m = bb.powers(omega, 256, mont=True)
    check(bb.from_mont(got_m), oracle.powers(omega, 256))


def test_byte_codecs():
    v = 123456789
    assert bb.to_bytes(v) == v.to_bytes(8, "little")
    assert bb.from_bytes_mod_order(bb.to_bytes(v)) == v
    big = (2**64 - 1).to_bytes(8, "little")
    assert bb.from_bytes_mod_order(big) == (2**64 - 1) % P


# ── quartic extension ───────────────────────────────────────────────────────

def rand_ext(shape):
    return RNG.integers(0, P, size=(*shape, 4), dtype=np.uint64)


def h_ext(a_row):
    return tuple(int(x) for x in a_row)


def test_ext_mul_vs_host():
    a, b = rand_ext((256,)), rand_ext((256,))
    got = np.asarray(ext.mul(dev(a), dev(b)), np.uint64)
    for i in range(256):
        assert h_ext(got[i]) == ext.h_mul(h_ext(a[i]), h_ext(b[i]))


def test_ext_embedding_ring_hom():
    # reference: src/ext.rs:220-228
    a, b = rand_arr(128), rand_arr(128)
    lhs = ext.mul(ext.from_base(dev(a)), ext.from_base(dev(b)))
    rhs = ext.from_base(bb.mul(dev(a), dev(b)))
    check(lhs, rhs)


def test_x4_is_w():
    # reference: src/ext.rs:231-236
    x = np.zeros((1, 4), np.uint64)
    x[0, 1] = 1
    x4 = ext.mul(ext.mul(dev(x), dev(x)), ext.mul(dev(x), dev(x)))
    expect = np.zeros((1, 4), np.uint64)
    expect[0, 0] = ext.W
    check(x4, expect)


def test_ext_inverse_and_distributivity():
    # reference: src/ext.rs:239-255 (irreducibility via inverse existence)
    a = rand_ext((16,))
    ai = ext.inv(dev(a))
    prod = np.asarray(ext.mul(dev(a), ai), np.uint64)
    one = np.zeros((16, 4), np.uint64)
    one[:, 0] = 1
    np.testing.assert_array_equal(prod, one)

    b, c = rand_ext((16,)), rand_ext((16,))
    lhs = ext.mul(dev(a), ext.add(dev(b), dev(c)))
    rhs = ext.add(ext.mul(dev(a), dev(b)), ext.mul(dev(a), dev(c)))
    check(lhs, rhs)


def test_ext_mul_base_matches_full_mul():
    # reference: src/ext.rs:258-265
    a = rand_ext((64,))
    s = rand_arr(64)
    got = ext.mul_base(dev(a), dev(s))
    full = ext.mul(dev(a), ext.from_base(dev(s)))
    check(got, full)


def test_ext_host_byte_roundtrip():
    # reference: src/ext.rs:268-274
    for _ in range(50):
        a = tuple(int(x) for x in rand_arr(4))
        assert ext.h_from_bytes(ext.h_to_bytes(a)) == a


def test_ext_host_inverse():
    for _ in range(20):
        a = tuple(int(x) for x in rand_arr(4))
        assert ext.h_mul(a, ext.h_inv(a)) == ext.H_ONE


def test_powers_traced_matches_powers():
    import jax

    base = 440564289
    got = bb.powers_traced(jnp.uint32(base), 300)
    check(got, oracle.powers(base, 300))
    # under jit with a traced base
    f = jax.jit(lambda b: bb.powers_traced(b, 64, mont=False))
    check(f(jnp.uint32(7)), oracle.powers(7, 64))


# ── ext Frobenius / fast inverse / poly evaluation (ext-challenges mode) ────

def test_ext_frobenius_is_pth_power():
    a = rand_ext((8,))
    for k in (1, 2, 3):
        got = ext.frobenius(dev(a), k)
        expect = ext.pow_const(dev(a), P**k)
        check(got, expect)


def test_ext_inv_fast_matches_fermat():
    a = rand_ext((64,))
    check(ext.inv_fast(dev(a)), ext.inv(dev(a)))
    prod = np.asarray(ext.mul(dev(a), ext.inv_fast(dev(a))), np.uint64)
    one = np.zeros((64, 4), np.uint64)
    one[:, 0] = 1
    np.testing.assert_array_equal(prod, one)


def test_ext_powers_traced():
    z = rand_ext(())  # one ext scalar
    hz = h_ext(z)
    got = np.asarray(ext.powers_traced(dev(z), 40), np.uint64)
    cur = ext.H_ONE
    for i in range(40):
        assert h_ext(got[i]) == cur
        cur = ext.h_mul(cur, hz)


def test_ext_eval_poly_base_coeffs():
    import jax

    for n in (100, 256, 2000):  # exercises both the direct and split paths
        coeffs = rand_arr(n)
        z = rand_ext(())
        hz = h_ext(z)
        f = jax.jit(lambda c, zz: ext.eval_poly_base_coeffs(c, zz))
        got = h_ext(np.asarray(f(dev(coeffs), dev(z)), np.uint64))
        # host Horner in the extension field
        acc = ext.H_ZERO
        for c in reversed([int(x) for x in coeffs]):
            acc = ext.h_add(ext.h_mul(acc, hz), ext.h_from_base(c))
        assert got == acc, f"n={n}"
