"""Multi-device sharding tests on the 8-device virtual CPU mesh: the
distributed four-step NTT and the full sharded prove step must match the
single-device pipeline bit-for-bit."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as Pspec

from toyni_tpu.field.babybear import P, get_root_of_unity
from toyni_tpu.field import oracle
from toyni_tpu.domain import Domain
from toyni_tpu.parallel import mesh as mesh_mod
from toyni_tpu.parallel import ntt_dist
from toyni_tpu.parallel.mesh import AXIS, to_cyclic_np, from_cyclic_np

RNG = np.random.default_rng(77)
D = 8


def cpu_mesh():
    return mesh_mod.make_mesh(D, jax.local_devices(backend="cpu"))


def test_cyclic_layout_roundtrip():
    v = RNG.integers(0, P, 64, dtype=np.uint64)
    c = to_cyclic_np(v, D)
    assert c.shape == (D, 8)
    assert c[3, 2] == v[2 * D + 3]
    np.testing.assert_array_equal(from_cyclic_np(c), v)
    # with trailing dims
    s = RNG.integers(0, 256, (64, 16), dtype=np.uint64)
    cs = to_cyclic_np(s, D)
    np.testing.assert_array_equal(cs[5, 1], s[1 * D + 5])
    np.testing.assert_array_equal(from_cyclic_np(cs), s)


def test_roll_cyclic_local_matches_global_roll():
    """roll_cyclic_local must equal the cyclic re-layout of jnp.roll(v, -r)
    for every shard-offset class of r — including r not divisible by D (the
    cross-shard ppermute path that removed the D | blowup precondition)."""
    N = 64
    mesh = cpu_mesh()
    v = RNG.integers(0, P, N, dtype=np.uint64)
    for r in (0, 8, 24, 1, 5, 13, 60, 4 + D * 3):
        shard = jax.shard_map(
            lambda x: mesh_mod.roll_cyclic_local(x[0], r, D)[None],
            mesh=mesh, in_specs=(Pspec(AXIS, None),),
            out_specs=Pspec(AXIS, None),
        )
        got = np.asarray(
            jax.jit(shard)(jnp.asarray(to_cyclic_np(v, D).astype(np.uint32))),
            np.uint64,
        )
        expect = to_cyclic_np(np.roll(v, -r), D)
        np.testing.assert_array_equal(got, expect, err_msg=f"r={r}")
    # leading-axis variant (multi-column (k, m) local arrays roll on axis 1)
    vk = RNG.integers(0, P, (2, N), dtype=np.uint64)
    cyc_k = np.stack([to_cyclic_np(row, D) for row in vk], axis=1)  # (D,2,m)
    shard = jax.shard_map(
        lambda x: mesh_mod.roll_cyclic_local(x[0], 13, D, axis=1)[None],
        mesh=mesh, in_specs=(Pspec(AXIS, None, None),),
        out_specs=Pspec(AXIS, None, None),
    )
    got = np.asarray(jax.jit(shard)(jnp.asarray(cyc_k.astype(np.uint32))),
                     np.uint64)
    expect = np.stack(
        [to_cyclic_np(np.roll(row, -13), D) for row in vk], axis=1
    )
    np.testing.assert_array_equal(got, expect)


def test_small_plan_ntt_replicated_fallback():
    """N < D^2 (here 32 < 64): plan_tables returns the `small` plan and the
    forward/inverse local transforms run the replicated fallback — results
    must still match the single-device oracle exactly."""
    N = 32
    omega = get_root_of_unity(5)
    mesh = cpu_mesh()
    plan = ntt_dist.plan_tables(N, D, omega)
    assert plan.get("small")

    def fwd(x_blk, W):
        return ntt_dist.ntt_forward_local(x_blk, W, plan)

    shard = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(Pspec(AXIS), Pspec(None, AXIS)),
        out_specs=Pspec(AXIS),
    )
    x = RNG.integers(0, P, N, dtype=np.uint64)
    got_raw = np.asarray(
        jax.jit(shard)(jnp.asarray(x.astype(np.uint32)),
                       jnp.asarray(plan["W"])),
        np.uint64,
    )
    got = from_cyclic_np(got_raw.reshape(D, N // D))
    np.testing.assert_array_equal(got, oracle.ntt(x, omega))

    def roundtrip(x_blk, W, W_inv):
        y = ntt_dist.ntt_forward_local(x_blk, W, plan)
        return ntt_dist.ntt_inverse_local(y, W_inv, plan)

    shard_rt = jax.shard_map(
        roundtrip, mesh=mesh,
        in_specs=(Pspec(AXIS), Pspec(None, AXIS), Pspec(None, AXIS)),
        out_specs=Pspec(AXIS),
    )
    got_rt = np.asarray(
        jax.jit(shard_rt)(
            jnp.asarray(x.astype(np.uint32)),
            jnp.asarray(plan["W"]), jnp.asarray(plan["W_inv"]),
        ),
        np.uint64,
    )
    np.testing.assert_array_equal(got_rt, x)


def test_distributed_ntt_matches_single_device():
    N = 512
    omega = get_root_of_unity(9)
    mesh = cpu_mesh()
    plan = ntt_dist.plan_tables(N, D, omega)

    def fwd(x_blk, W):
        return ntt_dist.ntt_forward_local(x_blk, W, plan)

    # local output is the cyclic subsequence; under a block out_spec the
    # assembled global array is shard-major — reinterpret on host.
    shard = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(Pspec(AXIS), Pspec(None, AXIS)),
        out_specs=Pspec(AXIS),
    )
    x = RNG.integers(0, P, N, dtype=np.uint64)
    got_raw = np.asarray(
        jax.jit(shard)(jnp.asarray(x.astype(np.uint32)), jnp.asarray(plan["W"])),
        np.uint64,
    )
    # output is shard-major: device d's chunk holds X[k2*D+d] — undo
    got = from_cyclic_np(got_raw.reshape(D, N // D))
    expect = oracle.ntt(x, omega)
    np.testing.assert_array_equal(got, expect)


def test_distributed_intt_roundtrip():
    N = 512
    omega = get_root_of_unity(9)
    mesh = cpu_mesh()
    plan = ntt_dist.plan_tables(N, D, omega)

    def roundtrip(x_blk, W, W_inv):
        y = ntt_dist.ntt_forward_local(x_blk, W, plan)
        return ntt_dist.ntt_inverse_local(y, W_inv, plan)

    shard = jax.shard_map(
        roundtrip, mesh=mesh,
        in_specs=(Pspec(AXIS), Pspec(None, AXIS), Pspec(None, AXIS)),
        out_specs=Pspec(AXIS),
    )
    x = RNG.integers(0, P, N, dtype=np.uint64)
    got = np.asarray(
        jax.jit(shard)(
            jnp.asarray(x.astype(np.uint32)),
            jnp.asarray(plan["W"]), jnp.asarray(plan["W_inv"]),
        ),
        np.uint64,
    )
    np.testing.assert_array_equal(got, x)


def test_distributed_coset_fft_matches_domain():
    N = 512
    mesh = cpu_mesh()
    dom = Domain.new(N).get_coset(7)
    plan = ntt_dist.plan_tables(N, D, dom.omega)
    sf, sb = ntt_dist.shift_tables_np(N, 7)

    def f(c_blk, spow, W):
        return ntt_dist.coset_fft_local(c_blk, spow, W, plan)

    shard = jax.shard_map(
        f, mesh=mesh,
        in_specs=(Pspec(AXIS), Pspec(AXIS), Pspec(None, AXIS)),
        out_specs=Pspec(AXIS),
    )
    coeffs = RNG.integers(0, P, N, dtype=np.uint64)
    got_raw = np.asarray(
        jax.jit(shard)(
            jnp.asarray(coeffs.astype(np.uint32)), jnp.asarray(sf), jnp.asarray(plan["W"])
        ),
        np.uint64,
    )
    got = from_cyclic_np(got_raw.reshape(D, N // D))
    expect = np.asarray(dom.fft(jnp.asarray(coeffs.astype(np.uint32))), np.uint64)
    np.testing.assert_array_equal(got, expect)


def test_sharded_prove_step_matches_single_chip():
    from toyni_tpu.parallel.prover_dist import make_sharded_prove_step
    from toyni_tpu.pipeline import make_commit_core

    n = 64
    mesh, fn, make_args = make_sharded_prove_step(n, D)
    args = make_args(seed=5)
    out = fn(*args)

    # cross-check the trace commitment against the single-chip commit core
    # fed the same trace / mask / salts
    core, _ = make_commit_core(n)
    trace_col, r_mask = args[0], args[1]
    trace_salts = jnp.asarray(from_cyclic_np(np.asarray(args[5])))
    quot_salts = jnp.asarray(from_cyclic_np(np.asarray(args[6])))
    single = core(trace_col, r_mask, trace_salts, quot_salts)

    np.testing.assert_array_equal(
        np.asarray(out["trace_root"]), np.asarray(single["trace_root"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["quot_root"]), np.asarray(single["quot_root"])
    )
    # trace LDE values agree (cyclic -> natural order)
    lde_dist = from_cyclic_np(np.asarray(out["trace_lde"], np.uint64))
    np.testing.assert_array_equal(lde_dist, np.asarray(single["trace_lde"], np.uint64))
    # (the quotient stays in eval form everywhere since round 4 — its
    # coefficient-space check retired along with the sharded quotient IFFT;
    # q_evals equality is covered transitively by the quot_root match above)


def test_sharded_prove_step_fri_salted_and_replicated_tail():
    """Round-2 coverage: (a) intermediate FRI layers commit SALTED in the
    fused sharded step (protocol-exact, was unsalted in round 1); (b) a
    final layer smaller than the mesh (D does not divide final_layer_size)
    gathers the tiny tail once and folds replicated. Every FRI root and the
    final layer must match a single-device recomputation bit-for-bit."""
    from toyni_tpu.config import DEFAULT_CONFIG
    from toyni_tpu.field import babybear as bb
    from toyni_tpu.ops import sha256 as sha
    from toyni_tpu.parallel.prover_dist import make_sharded_prove_step
    from toyni_tpu.pipeline import make_commit_core, _fold_traced
    from toyni_tpu.prover import _xs_inv0_dev

    n, cfg = 32, DEFAULT_CONFIG
    N = n * cfg.blowup
    final = cfg.final_layer_size(n)
    assert final % D != 0, "test shape must exercise the replicated tail"
    num_folds = (N // final).bit_length() - 1

    mesh, fn, make_args = make_sharded_prove_step(n, D)
    args = make_args(seed=11)
    out = fn(*args)

    # ── single-device reference pipeline with the same inputs ──────────────
    core, _ = make_commit_core(n)
    trace_col, r_mask = args[0], args[1]
    z, ood, betas = args[2], args[3], args[4]
    t_salts = jnp.asarray(from_cyclic_np(np.asarray(args[5])))
    q_salts = jnp.asarray(from_cyclic_np(np.asarray(args[6])))
    d_salts = jnp.asarray(from_cyclic_np(np.asarray(args[7])))
    fri_salts = [
        jnp.asarray(from_cyclic_np(np.asarray(s)))
        if (N >> (k + 1)) % D == 0 else jnp.asarray(np.asarray(s))
        for k, s in enumerate(args[8])
    ]
    single = core(trace_col, r_mask, t_salts, q_salts)

    B = cfg.blowup
    lde, q_evals = single["trace_lde"], single["q_evals"]
    x = Domain.new(N).get_coset(cfg.coset_shift).elements()
    num = bb.sub(q_evals, ood[3])
    num = bb.add(num, bb.sub(jnp.roll(lde, -2 * B), ood[2]))
    num = bb.add(num, bb.sub(jnp.roll(lde, -B), ood[1]))
    num = bb.add(num, bb.sub(lde, ood[0]))
    d_evals = bb.mul(num, bb.inv(bb.sub(x, z)))

    def root_of(values, salts):
        digests = (
            sha.hash_salted_leaves(values, salts)
            if salts is not None else sha.hash_unsalted_leaves(values)
        )
        cur = digests
        while cur.shape[0] > 1:
            cur = sha.hash_nodes(cur[0::2], cur[1::2])
        return np.asarray(cur[0])

    shifted = Domain.new(N).get_coset(cfg.coset_shift)
    expected_roots = [root_of(d_evals, d_salts)]
    current = d_evals
    xs = _xs_inv0_dev(N, cfg.coset_shift, shifted.omega)
    for k in range(num_folds):
        half = current.shape[0] // 2
        current = _fold_traced(current, xs[:half], betas[k])
        xs = bb.mont_mul(xs[:half], xs[:half])
        salts_k = fri_salts[k] if k + 1 < num_folds else None
        expected_roots.append(root_of(current, salts_k))

    got_roots = np.asarray(out["fri_roots"])
    assert got_roots.shape == (num_folds + 1, 8)
    for i, exp in enumerate(expected_roots):
        np.testing.assert_array_equal(got_roots[i], exp, err_msg=f"root {i}")
    np.testing.assert_array_equal(
        np.asarray(out["final_layer"], np.uint64),
        np.asarray(current, np.uint64),
    )
    assert len(np.asarray(out["final_layer"])) == final
