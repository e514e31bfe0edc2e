"""Pallas kernel tests (interpreter mode on the CPU backend; the same
kernels compile to Mosaic on real TPU — bench.py exercises that path)."""

import numpy as np
import jax.numpy as jnp

from toyni_tpu.field.babybear import P, get_root_of_unity
from toyni_tpu.field import oracle
from toyni_tpu.ops import ntt as ntt_ops
from toyni_tpu.ops import ntt_pallas as ntp

RNG = np.random.default_rng(0xBA11A5)


def test_pallas_ntt_matches_xla_four_step():
    n = 1 << 14
    om = get_root_of_unity(14)
    x = RNG.integers(0, P, n, dtype=np.uint64)
    ref = np.asarray(ntt_ops.ntt(jnp.asarray(x.astype(np.uint32)), om), np.uint64)
    got = np.asarray(ntp.ntt_pallas(jnp.asarray(x.astype(np.uint32)), om), np.uint64)
    np.testing.assert_array_equal(got, ref)


def test_pallas_ntt_matches_oracle_small():
    n = 1 << 12
    om = get_root_of_unity(12)
    x = RNG.integers(0, P, n, dtype=np.uint64)
    got = np.asarray(ntp.ntt_pallas(jnp.asarray(x.astype(np.uint32)), om), np.uint64)
    ref = oracle.ntt(x, om)
    np.testing.assert_array_equal(got, ref)


def test_pallas_intt_roundtrip():
    n = 1 << 13
    om = get_root_of_unity(13)
    x = RNG.integers(0, P, n, dtype=np.uint64)
    y = ntp.ntt_pallas(jnp.asarray(x.astype(np.uint32)), om)
    back = np.asarray(ntp.intt_pallas(y, om), np.uint64)
    np.testing.assert_array_equal(back, x)


def test_pallas_axis0_vs_xla_axis0():
    n1, B = 256, 256
    om = get_root_of_unity(8)
    x = RNG.integers(0, P, (n1, B), dtype=np.uint64)
    tw = tuple(jnp.asarray(t) for t in ntt_ops._twiddle_tables(n1, om))
    got = np.asarray(
        ntp.ntt_axis0_pallas(jnp.asarray(x.astype(np.uint32)), om), np.uint64
    )
    ref = np.asarray(ntt_ops.ntt_axis0(jnp.asarray(x.astype(np.uint32)), tw), np.uint64)
    np.testing.assert_array_equal(got, ref)


def test_roll_ntt_matches_xla_four_step():
    # roll+select fused-stage formulation (the TOYNI_PALLAS_NTT=1 path)
    n = 1 << 14
    om = get_root_of_unity(14)
    x = RNG.integers(0, P, n, dtype=np.uint64)
    ref = np.asarray(ntt_ops.ntt(jnp.asarray(x.astype(np.uint32)), om), np.uint64)
    got = np.asarray(ntp.ntt_roll(jnp.asarray(x.astype(np.uint32)), om), np.uint64)
    np.testing.assert_array_equal(got, ref)


def test_roll_axis0_vs_xla_axis0():
    n1, B = 256, 256
    om = get_root_of_unity(8)
    x = RNG.integers(0, P, (n1, B), dtype=np.uint64)
    tw = tuple(jnp.asarray(t) for t in ntt_ops._twiddle_tables(n1, om))
    got = np.asarray(
        ntp.ntt_axis0_roll(jnp.asarray(x.astype(np.uint32)), om), np.uint64
    )
    ref = np.asarray(ntt_ops.ntt_axis0(jnp.asarray(x.astype(np.uint32)), tw), np.uint64)
    np.testing.assert_array_equal(got, ref)


# ── SHA-256 kernels (emulated off-TPU; same code path as the Mosaic build) ──

def test_pallas_sha_salted_vs_hashlib():
    import hashlib
    from toyni_tpu.ops import sha256_pallas as shp

    N = 1100  # exercises padding
    vals = RNG.integers(0, P, N, dtype=np.uint64).astype(np.uint32)
    salts = RNG.integers(0, 256, (N, 16), dtype=np.uint64).astype(np.uint8)
    sw = shp.salts_to_words(salts)
    out = np.asarray(
        shp.hash_salted_leaves_planar(jnp.asarray(vals), jnp.asarray(sw)), np.uint32
    )
    for i in (0, 511, N - 1):
        expect = hashlib.sha256(
            b"\x00" + bytes(salts[i]) + int(vals[i]).to_bytes(8, "little")
        ).digest()
        got = b"".join(int(out[w, i]).to_bytes(4, "big") for w in range(8))
        assert got == expect, f"leaf {i}"


def test_pallas_sha_nodes_vs_hashlib():
    import hashlib
    from toyni_tpu.ops import sha256_pallas as shp

    N = 1024
    l = RNG.integers(0, 2**32, (8, N), dtype=np.uint64).astype(np.uint32)
    r = RNG.integers(0, 2**32, (8, N), dtype=np.uint64).astype(np.uint32)
    out = np.asarray(
        shp.hash_nodes_planar(jnp.asarray(l), jnp.asarray(r)), np.uint32
    )
    for i in (0, 777):
        lb = b"".join(int(l[w, i]).to_bytes(4, "big") for w in range(8))
        rb = b"".join(int(r[w, i]).to_bytes(4, "big") for w in range(8))
        expect = hashlib.sha256(b"\x01" + lb + rb).digest()
        got = b"".join(int(out[w, i]).to_bytes(4, "big") for w in range(8))
        assert got == expect


def test_planar_tree_matches_rowmajor_tree():
    """The planar (Pallas-layout) tree build must produce the same root as
    the row-major jnp build."""
    from toyni_tpu import merkle
    from toyni_tpu.ops import sha256_pallas as shp
    from toyni_tpu.ops import sha256 as sha

    N = 1024
    vals = RNG.integers(0, P, N, dtype=np.uint64).astype(np.uint32)
    salts = RNG.integers(0, 256, (N, 16), dtype=np.uint64).astype(np.uint8)

    row_tree = merkle.build_salted_device_tree(jnp.asarray(vals), salts)

    sw = shp.salts_to_words(salts)
    planar = shp.hash_salted_leaves_planar(jnp.asarray(vals), jnp.asarray(sw))
    planar_tree = merkle.DeviceTree(
        merkle._device_levels_planar(planar), planar=True
    )
    assert planar_tree.root() == row_tree.root()

    # path extraction agrees between layouts
    idx = np.array([3, 700, 1023], np.int32)
    p1 = np.asarray(merkle.extract_paths(row_tree.levels, jnp.asarray(idx)), np.uint32)
    p2 = np.asarray(
        merkle.extract_paths(planar_tree.levels, jnp.asarray(idx), planar=True),
        np.uint32,
    )
    np.testing.assert_array_equal(p1, p2)
