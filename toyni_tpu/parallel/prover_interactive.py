"""Interactive distributed prover: the COMPLETE proof generation over a
device mesh, transcript and query phase included.

`make_sharded_prove_step` (prover_dist.py) fuses the vector phases into one
program with externally-supplied challenges — the benchmark/dryrun shape.
This module is the production shape: each transcript round trip is one
shard_map dispatch over the mesh, tree levels are RETAINED on device
(block-sharded global arrays), and the query phase gathers openings across
shards with plain jit (XLA routes the cross-shard gathers).

Covers EVERY protocol mode since round 2 (round 1 was Fibonacci/base-field
only): extension-field challenges (`StarkConfig.ext_challenges` — z/betas
from F_p^4, ext DEEP/FRI codewords and leaves), generic multi-column /
multi-constraint AIRs (row-bundle trace commitments, Fiat-Shamir alpha
composition with the two-dispatch commit split, ns shifted openings), and
their combination — mirroring the single-device prover's four paths
(prover.py `_phase_fns` / `_generate_proof_multi`).

Equivalence contract (tested on the virtual CPU mesh, every mode): for the
same trace and seed, `DistributedStarkProver(trace, D, air, cfg, seed=s)`
produces a proof BYTE-IDENTICAL to `StarkProver(trace, air, cfg, seed=s)` —
same salts (threefry is backend-deterministic), same transcript, same tree
structure, same openings. Distribution is an implementation detail of the
prover, invisible in the proof.

Layout invariants (see parallel/mesh.py): codewords live cyclic so FRI
folds are shard-local while D | half, and trace rolls are local when
D | blowup (one boundary `ppermute` otherwise — `mesh.roll_cyclic_local`,
round 4); coefficient vectors live in blocks; tree leaves are hashed cyclic
then all-to-all'd to block layout so sub-trees are shard-local. FRI layers
smaller than the mesh (D does not divide the size) convert once to
replicated natural order — at that point a layer has < 2D elements, so the
tail is noise — removing the round-1 `D | final_layer_size` precondition.
Since round 4 there is NO divisibility precondition beyond D | lde_size:
meshes wider than the blowup and LDEs smaller than D^2 both work with the
DEFAULT protocol config.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as Pspec

from ..air import FibonacciAir
from ..config import DEFAULT_CONFIG, StarkConfig
from ..domain import Domain
from ..field import babybear as bb
from ..field import ext as extf
from ..field.babybear import P
from ..merkle import _hash_backend, openings_from_paths
from ..ops import sha256 as sha
from ..ops.fri import fri_fold_ext
from ..ops.ntt import intt, np_powers
from ..pipeline import _fold_traced
from ..proof import MerkleOpening, QueryProof, StarkProof
from ..trace import ExecutionTrace
from ..transcript import Transcript, derive_z, derive_z_ext
from . import ntt_dist
from .mesh import AXIS, make_mesh, roll_cyclic_local, to_cyclic_np
from .prover_dist import _cyclic_to_block_local, _mont

_U32 = jnp.uint32

_DEFAULT_AIR = FibonacciAir()


def _local_levels(leaves: jnp.ndarray, kind: str = "sha256") -> list:
    """All levels of a (m, 8) digest block, bottom-up, including the input."""
    h = _hash_backend(kind)
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = h.hash_nodes(cur[0::2], cur[1::2])
        levels.append(cur)
    return levels


def _leaf_digests(values_loc, salts_loc, mode: str, kind: str = "sha256"):
    """Per-leaf digests for a local slice. mode: 'base' (values (m,)),
    'ext' ((m, 4) ext codeword lanes), 'multi' ((k, m) row bundles)."""
    h = _hash_backend(kind)
    if mode == "ext":
        if salts_loc is None:
            return h.hash_unsalted_leaves_ext(values_loc)
        return h.hash_salted_leaves_ext(values_loc, salts_loc)
    if mode == "multi":
        return h.hash_salted_leaves_multi(values_loc, salts_loc)
    if salts_loc is None:
        return h.hash_unsalted_leaves(values_loc)
    return h.hash_salted_leaves(values_loc, salts_loc)


@functools.lru_cache(maxsize=8)
def _phases(n: int, D: int, cfg: StarkConfig = DEFAULT_CONFIG,
            air=_DEFAULT_AIR):
    """Jitted shard_map phases + host tables for (trace length, mesh size,
    config, AIR). `air` must be a long-lived (stateless) instance — the
    cache is keyed on it."""
    N = n * cfg.blowup
    assert N % D == 0, "mesh width must divide the LDE size"
    # No other layout preconditions since round 4 (was: D^2 | lde_size and
    # D | blowup): cross-shard trace rolls are one boundary ppermute
    # (mesh.roll_cyclic_local) and the four-step NTT replicates tiny
    # transforms (ntt_dist `small` plan).
    m_deg = cfg.mask_degree
    L = n + m_deg
    final_size = cfg.final_layer_size(n)
    B = cfg.blowup
    mloc = N // D

    k = getattr(air, "num_columns", 1)
    nc = getattr(air, "num_constraints", 1)
    ns = air.num_shifts
    ext = cfg.ext_challenges
    multi = k > 1 or nc > 1 or ns != 3
    hk = cfg.hash

    domain = Domain.new(n)
    shifted = Domain.new(N).get_coset(cfg.coset_shift)
    g = domain.group_gen()

    mesh = make_mesh(D)
    plan = ntt_dist.plan_tables(N, D, shifted.omega)
    shift_fwd, _shift_bwd_unused = ntt_dist.shift_tables_np(N, cfg.coset_shift)

    x_np = shifted.elements_np().astype(np.uint32)
    x_cyc = to_cyclic_np(x_np, D)
    h_n = pow(cfg.coset_shift, n, P)
    om_n = pow(shifted.omega, n, P)
    zh = (np_powers(om_n, B) * np.uint64(h_n) + np.uint64(P - 1)) % np.uint64(P)
    zh_inv = np.array([pow(int(v), P - 2, P) for v in zh], np.uint64)
    zh_inv_tile = to_cyclic_np(np.tile(_mont(zh_inv), n), D)
    h_inv = pow(cfg.coset_shift, P - 2, P)
    om_inv = pow(shifted.omega, P - 2, P)
    xs_inv0 = to_cyclic_np(
        _mont(np_powers(om_inv, N) * np.uint64(h_inv) % np.uint64(P)), D
    )

    cyc = Pspec(AXIS, None)
    blk = Pspec(AXIS)
    rep = Pspec()
    rep_sh = NamedSharding(mesh, rep)

    def _roll(v, s: int, axis: int = 0):
        """Local slice of the global trace roll by s*blowup positions."""
        return roll_cyclic_local(v, s * B, D, axis=axis)

    def _commit_with_levels(values_loc, salts_loc, mode="base"):
        """Cyclic values -> (lo_levels..., top_levels...) block/replicated."""
        digests = _leaf_digests(values_loc, salts_loc, mode, hk)
        m = digests.shape[0]
        if m % D == 0 and m >= D:
            block = _cyclic_to_block_local(digests, D)
            lo = _local_levels(block, hk)
            subroots = jax.lax.all_gather(lo[-1][0], AXIS, axis=0)  # (D, 8)
            top = _local_levels(subroots, hk)[1:]
            return lo, top
        # tiny layer: gather everything, build the whole tree replicated
        gathered = jax.lax.all_gather(digests, AXIS, axis=0)  # (D, m, 8)
        natural = jnp.swapaxes(gathered, 0, 1).reshape(D * m, 8)
        return [], _local_levels(natural, hk)

    if mloc % D == 0 and mloc >= D:
        # big-layer commit shape: block-sharded local subtrees + tiny
        # replicated top (the path _commit_with_levels takes at size N)
        lo_specs = [blk] * mloc.bit_length()
        top_specs = [rep] * (D.bit_length() - 1)
    else:
        # N < D^2: the whole tree is built replicated
        lo_specs = []
        top_specs = [rep] * N.bit_length()

    # ── interpolate + mask + LDE for one column (shared by both paths) ─────
    def _column_lde(trace_col, r_mask, shiftf_loc, W_loc):
        """Replicated (n,) column -> (that block slice, cyclic LDE)."""
        t_coeffs = intt(trace_col, domain.omega)
        t_pad = jnp.pad(t_coeffs, (0, L - n))
        r_low = jnp.pad(r_mask, (0, L - m_deg))
        r_shift = jnp.pad(r_mask, (n, L - m_deg - n))
        that = jnp.pad(bb.add(t_pad, bb.sub(r_shift, r_low)), (0, N - L))
        d = jax.lax.axis_index(AXIS)
        that_loc = jax.lax.dynamic_slice_in_dim(that, d * mloc, mloc)
        lde = ntt_dist.coset_fft_local(that_loc, shiftf_loc, W_loc, plan)
        return that_loc, lde

    fns = {}

    if not multi:
        # ── phase 1 (reference shape): fused trace + quotient commit ──────
        def commit_local(trace_col, r_mask, trace_salts, quot_salts,
                         x_loc, zh_loc, shiftf_loc, W_loc):
            x_loc, zh_loc = x_loc[0], zh_loc[0]
            trace_salts, quot_salts = trace_salts[0], quot_salts[0]
            _that_loc, trace_lde = _column_lde(trace_col, r_mask,
                                               shiftf_loc, W_loc)
            t_rolls = [
                _roll(trace_lde, s) for s in range(ns)
            ]
            c_evals = air.constraint_lde(t_rolls, x_loc, g, n)
            q_evals = bb.mont_mul(c_evals, zh_loc)
            t_lo, t_top = _commit_with_levels(trace_lde, trace_salts)
            q_lo, q_top = _commit_with_levels(q_evals, quot_salts)
            return dict(
                trace_lde=trace_lde[None],
                q_evals=q_evals[None],
                t_lo=t_lo, t_top=t_top, q_lo=q_lo, q_top=q_top,
            )

        fns["commit"] = jax.jit(jax.shard_map(
            commit_local, mesh=mesh,
            in_specs=(rep, rep, cyc, cyc, cyc, cyc, blk,
                      Pspec(None, AXIS)),
            out_specs=dict(
                trace_lde=cyc, q_evals=cyc,
                t_lo=lo_specs, t_top=top_specs, q_lo=lo_specs,
                q_top=top_specs,
            ),
            check_vma=False,
        ))
    else:
        # ── multi: two-dispatch commit (alphas are transcript outputs) ────
        def commit_trace_local(trace_cols, r_masks, trace_salts,
                               shiftf_loc, W_loc):
            trace_salts = trace_salts[0]
            ldes = []
            for c in range(k):
                _that_loc, lde = _column_lde(trace_cols[c], r_masks[c],
                                             shiftf_loc, W_loc)
                ldes.append(lde)
            lde_k = jnp.stack(ldes)                  # (k, mloc) cyclic rows
            t_lo, t_top = _commit_with_levels(lde_k, trace_salts, "multi")
            return dict(
                trace_lde=jnp.moveaxis(lde_k, 0, -1)[None],  # (1, mloc, k)
                t_lo=t_lo, t_top=t_top,
            )

        fns["commit_trace"] = jax.jit(jax.shard_map(
            commit_trace_local, mesh=mesh,
            in_specs=(rep, rep, cyc, blk, Pspec(None, AXIS)),
            out_specs=dict(
                trace_lde=cyc,
                t_lo=lo_specs, t_top=top_specs,
            ),
            check_vma=False,
        ))

        def commit_quot_local(trace_lde, quot_salts, alphas,
                              x_loc, zh_loc):
            lde_k = jnp.moveaxis(trace_lde[0], -1, 0)    # (k, mloc)
            quot_salts = quot_salts[0]
            x_loc, zh_loc = x_loc[0], zh_loc[0]
            t_views = [
                _roll(lde_k, s, axis=1) for s in range(ns)
            ]
            if k == 1:
                t_views = [v[0] for v in t_views]
            if nc > 1:
                c_evals = air.constraint_lde(t_views, x_loc, g, n, alphas)
            else:
                c_evals = air.constraint_lde(t_views, x_loc, g, n)
            q_evals = bb.mont_mul(c_evals, zh_loc)
            q_lo, q_top = _commit_with_levels(q_evals, quot_salts)
            return dict(
                q_evals=q_evals[None],
                q_lo=q_lo, q_top=q_top,
            )

        fns["commit_quot"] = jax.jit(jax.shard_map(
            commit_quot_local, mesh=mesh,
            in_specs=(cyc, cyc, rep, cyc, cyc),
            out_specs=dict(
                q_evals=cyc,
                q_lo=lo_specs, q_top=top_specs,
            ),
            check_vma=False,
        ))

    # ── OOD evaluation: barycentric from the cyclic eval vectors ───────────
    # For evals v_i of a degree-<N polynomial on the coset {x_i = h omega^i}:
    #   p(z) = (z^N - h^N)/(N h^N) * sum_i x_i v_i / (z - x_i)
    # T(g^s z) is the same formula over roll(lde, -s*blowup) (the eval vector
    # of T(g^s x)), so every OOD value shares ONE denominator inversion per
    # shard — returned cyclic and reused by the DEEP quotient. The partials
    # are exact mod-p sums, so shard order is irrelevant (one all-gather).
    h_N = pow(cfg.coset_shift, N, P)
    NhN_inv = pow(N * h_N % P, P - 2, P)

    def _bary_pref(z):
        return bb.mul_const(
            bb.sub(bb.pow_const(z, N), jnp.uint32(h_N)), NhN_inv
        )

    def _bary_ext_setup(x_loc, z4):
        zero = jnp.zeros_like(x_loc)
        x_minus_z = jnp.stack(
            [bb.sub(x_loc, z4[0])] + [bb.sub(zero, z4[j]) for j in (1, 2, 3)],
            axis=-1,
        )
        inv_xz = extf.inv_fast(x_minus_z)        # (mloc, 4)
        w = extf.mul_base(inv_xz, x_loc)         # x_i/(x_i - z) ext
        zN = extf.pow_const(z4[None, :], N)[0]
        hN4 = jnp.asarray(np.array([h_N, 0, 0, 0], np.uint32))
        pref = bb.mul_const(extf.sub(zN, hN4), NhN_inv)   # (4,)
        return inv_xz, w, pref

    if not multi:
        if ext:
            def ood_local(trace_lde, q_evals, x_loc, z4):
                trace_lde, q_evals = trace_lde[0], q_evals[0]
                inv_xz, w, pref = _bary_ext_setup(x_loc[0], z4)
                parts = jnp.stack([
                    bb.sum_mod(extf.mul_base(w, trace_lde), axis=0),
                    bb.sum_mod(extf.mul_base(
                        w, _roll(trace_lde, 1)), axis=0),
                    bb.sum_mod(extf.mul_base(
                        w, _roll(trace_lde, 2)), axis=0),
                    bb.sum_mod(extf.mul_base(w, q_evals), axis=0),
                ])  # (4, 4)
                allp = jax.lax.all_gather(parts, AXIS, axis=0)
                ssum = bb.sum_mod(allp, axis=0)            # (4, 4)
                vals = extf.mul(pref[None, :],
                                bb.sub(jnp.uint32(0), ssum))
                return vals, inv_xz[None]
        else:
            def ood_local(trace_lde, q_evals, x_loc, z):
                trace_lde, q_evals, x_loc = trace_lde[0], q_evals[0], x_loc[0]
                inv_xz = bb.inv(bb.sub(x_loc, z))
                w = bb.mul(x_loc, inv_xz)
                parts = jnp.stack([
                    bb.sum_mod(bb.mul(trace_lde, w)),
                    bb.sum_mod(bb.mul(_roll(trace_lde, 1), w)),
                    bb.sum_mod(bb.mul(_roll(trace_lde, 2), w)),
                    bb.sum_mod(bb.mul(q_evals, w)),
                ])  # (4,)
                allp = jax.lax.all_gather(parts, AXIS, axis=0)  # (D, 4)
                ssum = bb.sum_mod(allp, axis=0)
                vals = bb.mul(_bary_pref(z), bb.sub(jnp.uint32(0), ssum))
                return vals, inv_xz[None]
    else:
        if ext:
            def ood_local(trace_lde, q_evals, x_loc, z4):
                lde_k = jnp.moveaxis(trace_lde[0], -1, 0)   # (k, mloc)
                q_evals = q_evals[0]
                inv_xz, w, pref = _bary_ext_setup(x_loc[0], z4)
                rows = []
                for s in range(ns):
                    rolled = _roll(lde_k, s, axis=1)
                    for c in range(k):
                        rows.append(bb.sum_mod(
                            extf.mul_base(w, rolled[c]), axis=0))
                rows.append(bb.sum_mod(extf.mul_base(w, q_evals), axis=0))
                parts = jnp.stack(rows)  # (ns*k+1, 4)
                allp = jax.lax.all_gather(parts, AXIS, axis=0)
                ssum = bb.sum_mod(allp, axis=0)
                vals = extf.mul(pref[None, :],
                                bb.sub(jnp.uint32(0), ssum))
                return vals, inv_xz[None]
        else:
            def ood_local(trace_lde, q_evals, x_loc, z):
                lde_k = jnp.moveaxis(trace_lde[0], -1, 0)   # (k, mloc)
                q_evals, x_loc = q_evals[0], x_loc[0]
                inv_xz = bb.inv(bb.sub(x_loc, z))
                w = bb.mul(x_loc, inv_xz)
                rows = []
                for s in range(ns):
                    rolled = _roll(lde_k, s, axis=1)
                    for c in range(k):
                        rows.append(bb.sum_mod(bb.mul(rolled[c], w)))
                rows.append(bb.sum_mod(bb.mul(q_evals, w)))
                parts = jnp.stack(rows)  # (ns*k+1,)
                allp = jax.lax.all_gather(parts, AXIS, axis=0)
                ssum = bb.sum_mod(allp, axis=0)
                vals = bb.mul(_bary_pref(z), bb.sub(jnp.uint32(0), ssum))
                return vals, inv_xz[None]

    fns["ood"] = jax.jit(jax.shard_map(
        ood_local, mesh=mesh, in_specs=(cyc, cyc, cyc, rep),
        out_specs=(rep, cyc), check_vma=False,
    ))

    # ── DEEP quotient (fully local in cyclic layout; reuses the OOD
    # phase's 1/(x - z) inversion) ──────────────────────────────────────────
    def _deep_num_base(trace_lde, q_evals, oodv):
        """Base numerator sum for the reference shape (3 shifts, 1 col)."""
        num = bb.sub(q_evals, oodv[3])
        num = bb.add(num, bb.sub(_roll(trace_lde, 2), oodv[2]))
        num = bb.add(num, bb.sub(_roll(trace_lde, 1), oodv[1]))
        return bb.add(num, bb.sub(trace_lde, oodv[0]))

    if not multi and not ext:
        def deep_local(trace_lde, q_evals, oodv, inv_xz):
            trace_lde, q_evals = trace_lde[0], q_evals[0]
            num = _deep_num_base(trace_lde, q_evals, oodv)
            return bb.mul(num, inv_xz[0])[None]
    elif not multi and ext:
        def deep_local(trace_lde, q_evals, oodv, inv_xz):
            trace_lde, q_evals = trace_lde[0], q_evals[0]
            base_sum = bb.add(
                bb.add(q_evals, _roll(trace_lde, 2)),
                bb.add(_roll(trace_lde, 1), trace_lde),
            )
            ood_sum = bb.sum_mod(oodv, axis=0)  # (4,)
            zero = jnp.zeros_like(base_sum)
            num = jnp.stack(
                [bb.sub(base_sum, ood_sum[0])]
                + [bb.sub(zero, ood_sum[j]) for j in (1, 2, 3)],
                axis=-1,
            )
            return extf.mul(num, inv_xz[0])[None]
    elif multi and not ext:
        def deep_local(trace_lde, q_evals, oodv, inv_xz):
            lde_k = jnp.moveaxis(trace_lde[0], -1, 0)  # (k, mloc)
            q_evals = q_evals[0]
            num = bb.sub(q_evals, oodv[ns * k])
            for s in range(ns):
                rolled = _roll(lde_k, s, axis=1)
                for c in range(k):
                    num = bb.add(num, bb.sub(rolled[c], oodv[s * k + c]))
            return bb.mul(num, inv_xz[0])[None]
    else:
        def deep_local(trace_lde, q_evals, oodv, inv_xz):
            lde_k = jnp.moveaxis(trace_lde[0], -1, 0)
            q_evals = q_evals[0]
            base_sum = q_evals
            for s in range(ns):
                rolled = _roll(lde_k, s, axis=1)
                for c in range(k):
                    base_sum = bb.add(base_sum, rolled[c])
            ood_sum = bb.sum_mod(oodv, axis=0)  # (4,)
            zero = jnp.zeros_like(base_sum)
            num = jnp.stack(
                [bb.sub(base_sum, ood_sum[0])]
                + [bb.sub(zero, ood_sum[j]) for j in (1, 2, 3)],
                axis=-1,
            )
            return extf.mul(num, inv_xz[0])[None]

    fns["deep"] = jax.jit(jax.shard_map(
        deep_local, mesh=mesh,
        in_specs=(cyc, cyc, rep, cyc),
        out_specs=cyc, check_vma=False,
    ))

    # ── per-layer: commit a codeword with retained levels ──────────────────
    @functools.lru_cache(maxsize=32)
    def layer_commit_fn(size: int, salted: bool):
        ml = size // D
        mode = "ext" if ext else "base"

        def f_local(values, salts):
            lo, top = _commit_with_levels(
                values[0], salts[0] if salted else None, mode
            )
            return dict(lo=lo, top=top)

        # out-spec lengths must match what _commit_with_levels returns
        if ml % D == 0 and ml >= D:
            lo_s = [blk] * ml.bit_length()
            top_s = [rep] * (D.bit_length() - 1)
        else:
            lo_s = []
            top_s = [rep] * ((D * ml).bit_length())
        if salted:
            return jax.jit(jax.shard_map(
                f_local, mesh=mesh, in_specs=(cyc, cyc),
                out_specs=dict(lo=lo_s, top=top_s), check_vma=False,
            ))
        return jax.jit(jax.shard_map(
            lambda v: f_local(v, None), mesh=mesh, in_specs=(cyc,),
            out_specs=dict(lo=lo_s, top=top_s), check_vma=False,
        ))

    # ── per-layer: one FRI fold (sharded, cyclic layout) ───────────────────
    @functools.lru_cache(maxsize=32)
    def fold_fn(size: int):
        if ext:
            def f_local(current, xs, beta4):
                current, xs = current[0], xs[0]
                half_loc = current.shape[0] // 2
                folded = fri_fold_ext(current, xs[:half_loc], beta4)
                xs2 = bb.mont_mul(xs[:half_loc], xs[:half_loc])
                return folded[None], xs2[None]
        else:
            def f_local(current, xs, beta):
                current, xs = current[0], xs[0]
                half_loc = current.shape[0] // 2
                folded = _fold_traced(current, xs[:half_loc], beta)
                xs2 = bb.mont_mul(xs[:half_loc], xs[:half_loc])
                return folded[None], xs2[None]

        return jax.jit(jax.shard_map(
            f_local, mesh=mesh, in_specs=(cyc, cyc, rep),
            out_specs=(cyc, cyc), check_vma=False,
        ))

    # ── replicated tail: fold / commit for layers smaller than the mesh ────
    def _rep_fold(current, xs, beta):
        half = current.shape[0] // 2
        if ext:
            folded = fri_fold_ext(current, xs[:half], beta)
        else:
            folded = _fold_traced(current, xs[:half], beta)
        return folded, bb.mont_mul(xs[:half], xs[:half])

    def _rep_commit(values, salts):
        mode = "ext" if ext else "base"
        return _local_levels(_leaf_digests(values, salts, mode, hk), hk)

    fns["rep_fold"] = jax.jit(_rep_fold, out_shardings=(rep_sh, rep_sh))
    fns["rep_commit_salted"] = jax.jit(
        _rep_commit, out_shardings=rep_sh
    )
    fns["rep_commit_unsalted"] = jax.jit(
        lambda v: _rep_commit(v, None), out_shardings=rep_sh
    )
    # cyclic (D, 1, ...) -> natural replicated (D, ...): with one element
    # per shard the cyclic order IS the natural order
    fns["to_rep"] = jax.jit(lambda a: a[:, 0], out_shardings=rep_sh)

    # explicit global shardings so every process contributes its addressable
    # shards (required in multi-process runs; a no-op placement single-process)
    # (no inverse-NTT tables since round 2: the quotient never returns to
    # coefficient space — OOD evaluation is barycentric from the evals)
    tspec = dict(x=cyc, zh=cyc, xs0=cyc, shiftf=blk, W=Pspec(None, AXIS))
    traw = dict(
        x=x_cyc, zh=zh_inv_tile, xs0=xs_inv0, shiftf=shift_fwd,
        W=plan["W"],
    )
    tables = {
        kk: jax.device_put(jnp.asarray(v), NamedSharding(mesh, tspec[kk]))
        for kk, v in traw.items()
    }
    return dict(
        mesh=mesh, fns=fns,
        layer_commit=layer_commit_fn, fold=fold_fn, tables=tables,
        params=(N, L, final_size, B),
        shape=(k, nc, ns, ext, multi),
    )


class _DistTree:
    """Global tree view: list of levels (mixed block-sharded / replicated
    jax arrays), natural leaf order, plus the cyclic value/salt arrays.

    `values` is (D0, m, ...) with global leaf i at [i % D0, i // D0]; a
    REPLICATED natural-order layer stores values.reshape(size, 1, ...) so
    the same index algebra applies (i % size = i, i // size = 0)."""

    def __init__(self, lo, top, values_cyc, salts_cyc, mesh=None,
                 kind: str = "sha256"):
        self.levels = list(lo) + list(top)
        self.values = values_cyc  # (D0, m, ...) cyclic
        self.salts = salts_cyc    # (D0, m, 4) cyclic or None
        self.mesh = mesh
        self.kind = kind

    def root(self) -> bytes:
        return _hash_backend(self.kind).digest_bytes(
            np.asarray(self.levels[-1], np.uint32)[0]
        )

    def open_at(self, indices) -> tuple:
        """Gather values, salts, sibling paths for global indices (host list).
        Runs as jnp ops on the sharded global level arrays — XLA routes the
        cross-shard gathers; only the opened handful crosses to host. In
        multi-process runs the gather is jitted with REPLICATED output
        shardings so every process can materialize the result (a plain eager
        pull of a non-fully-addressable array raises)."""
        idx = np.asarray(indices, np.int64)
        if self.mesh is not None and jax.process_count() > 1:
            return self._open_at_multiprocess(idx)
        vals = np.asarray(
            jnp.asarray(self.values)[idx % self.values.shape[0],
                                     idx // self.values.shape[0]],
            np.uint64,
        )
        salts = (
            np.asarray(
                jnp.asarray(self.salts)[idx % self.salts.shape[0],
                                        idx // self.salts.shape[0]],
                np.uint64,
            )
            if self.salts is not None
            else None
        )
        paths = []
        cur = idx.copy()
        for level in self.levels[:-1]:
            paths.append(np.asarray(jnp.take(level, jnp.asarray(cur ^ 1), axis=0), np.uint32))
            cur >>= 1
        paths_np = np.stack(paths, axis=1)  # (Q, depth, 8)
        return vals, salts, paths_np

    def _open_at_multiprocess(self, idx: np.ndarray) -> tuple:
        rep = NamedSharding(self.mesh, Pspec())
        idx_j = jnp.asarray(idx)
        D = self.values.shape[0]
        salted = self.salts is not None

        def gather(values, salts, *levels):
            v = values[idx_j % D, idx_j // D]
            paths = []
            cur = idx_j
            for level in levels:
                paths.append(jnp.take(level, cur ^ 1, axis=0))
                cur = cur >> 1
            p = jnp.stack(paths, axis=1)
            if salted:
                return v, p, salts[idx_j % D, idx_j // D]
            return v, p, jnp.zeros((idx_j.shape[0], 4), jnp.uint32)

        out = jax.jit(gather, out_shardings=(rep, rep, rep))(
            self.values,
            self.salts if salted else jnp.zeros((D, 1, 4), jnp.uint32),
            *self.levels[:-1],
        )
        vals = np.asarray(out[0], np.uint64)
        paths_np = np.asarray(out[1], np.uint32)
        salts = np.asarray(out[2], np.uint64) if salted else None
        return vals, salts, paths_np


class DistributedStarkProver:
    """Drop-in StarkProver that runs every device phase over a D-way mesh.
    Produces byte-identical proofs to the single-device prover (same seed)
    in every protocol mode (base / ext / multi-column / multi-constraint)."""

    def __init__(self, trace: ExecutionTrace, n_devices: int,
                 air=None, config: StarkConfig = DEFAULT_CONFIG, seed=None,
                 phase_timeout_s: float | None = None):
        self.trace = trace
        self.D = n_devices
        self.air = air or _DEFAULT_AIR
        self.config = config
        self.rng = np.random.default_rng(seed)
        # Mid-run failure detection (SURVEY §5): bound every transcript
        # round trip so a peer dying inside a collective surfaces as a
        # prompt, attributed termination instead of an indefinite hang.
        # Size it to the slowest legitimate phase INCLUDING first-call
        # compiles, or warm up with one proof first (multihost.PhaseWatchdog).
        self.phase_timeout_s = phase_timeout_s
        self._wd = None

    def _ckpt(self, phase: str) -> None:
        if self._wd is not None:
            self._wd.checkpoint(phase)

    def _salts_np(self, count: int) -> np.ndarray:
        """Identical draw to StarkProver._salts (threefry is deterministic
        across backends), materialized to host for cyclic resharding.
        Poseidon2 mode: the same field-range masking as StarkProver._salts
        (byte-identity requires the exact same salt values)."""
        key = jax.random.PRNGKey(int(self.rng.integers(0, 2**63)))
        bits = np.asarray(jax.random.bits(key, (count, 4), dtype=jnp.uint32))
        if self.config.hash != "sha256":
            bits = bits & np.uint32(0x7FFFFFFF)
            bits = np.where(bits >= np.uint32(P), bits - np.uint32(P), bits)
        return bits

    # ── FRI (interactive: root -> transcript -> beta -> fold) ──────────────
    def _fri_phase(self, ph, d_evals, transcript, shard_cyc):
        """Shared FRI folding across all modes. `d_evals` is the cyclic
        (D, mloc[, 4]) DEEP codeword. Returns (sizes, trees, commitments,
        final_layer_host). Layers fold shard-local while D | half; smaller
        layers convert once to replicated natural order."""
        cfg = self.config
        D = self.D
        mesh = ph["mesh"]
        fns = ph["fns"]
        N, _L, final_size, _B = ph["params"]
        ext = ph["shape"][3]
        rep_sh = NamedSharding(mesh, Pspec())

        fri_sizes = [N]
        fri_trees = []
        fri_commitments = []

        salts0_np = self._salts_np(N)
        salts0 = shard_cyc(salts0_np)
        lv = ph["layer_commit"](N, True)(d_evals, salts0)
        tree0 = _DistTree(lv["lo"], lv["top"], d_evals, salts0, mesh,
                          kind=cfg.hash)
        root0 = tree0.root()
        self._ckpt("fri:deep-commit")
        transcript.absorb_commitment(root0)
        fri_commitments.append(root0)
        fri_trees.append(tree0)

        xs_inv = ph["tables"]["xs0"]
        current = d_evals
        size = N
        replicated = False
        while size > final_size:
            if ext:
                beta = transcript.squeeze_ext_challenge()
                beta_arg = jnp.asarray(beta, jnp.uint32)
            else:
                beta = transcript.squeeze_challenge()
                beta_arg = jnp.uint32(beta)
            if not replicated and (size // 2) % D != 0:
                # layer is about to shrink below the mesh: one conversion
                # to natural replicated (local length is 1, so cyclic IS
                # natural order), then the tiny tail folds replicated
                current = fns["to_rep"](current)
                xs_inv = fns["to_rep"](xs_inv)
                replicated = True
            if replicated:
                current, xs_inv = fns["rep_fold"](current, xs_inv, beta_arg)
            else:
                current, xs_inv = ph["fold"](size)(current, xs_inv, beta_arg)
            size //= 2
            fri_sizes.append(size)
            if size == final_size:
                salts = None
            else:
                salts_np = self._salts_np(size)
                salts = shard_cyc(salts_np) if not replicated else (
                    jax.device_put(jnp.asarray(salts_np), rep_sh)
                )
            if replicated:
                levels = (
                    fns["rep_commit_salted"](current, salts)
                    if salts is not None
                    else fns["rep_commit_unsalted"](current)
                )
                v2 = current.reshape(size, 1, *current.shape[1:])
                s2 = None if salts is None else salts.reshape(size, 1, 4)
                tree = _DistTree([], levels, v2, s2, mesh, kind=cfg.hash)
            else:
                lv = ph["layer_commit"](size, salts is not None)(
                    *((current, salts) if salts is not None else (current,))
                )
                tree = _DistTree(lv["lo"], lv["top"], current, salts,
                                 mesh, kind=cfg.hash)
            root = tree.root()
            self._ckpt(f"fri:layer-{size}")
            transcript.absorb_commitment(root)
            fri_commitments.append(root)
            fri_trees.append(tree)

        if replicated:
            final_np = np.asarray(current, np.uint64)  # natural already
        else:
            if jax.process_count() > 1:
                current = jax.jit(lambda a: a, out_shardings=rep_sh)(current)
            final_cyc = np.asarray(current, np.uint64)  # (D, final/D[, 4])
            final_np = final_cyc.swapaxes(0, 1).reshape(
                -1, *final_cyc.shape[2:]
            )
        if ext:
            fri_final_layer = [tuple(int(v) for v in row) for row in final_np]
        else:
            fri_final_layer = [int(v) for v in final_np]
        return fri_sizes, fri_trees, fri_commitments, fri_final_layer

    def generate_proof(self) -> StarkProof:
        if self.phase_timeout_s is None:
            return self._generate_proof_inner()
        from .multihost import PhaseWatchdog

        self._wd = PhaseWatchdog(self.phase_timeout_s).start()
        try:
            return self._generate_proof_inner()
        finally:
            self._wd.stop()
            self._wd = None

    def _generate_proof_inner(self) -> StarkProof:
        cfg = self.config
        D = self.D
        n = self.trace.num_rows
        air = self.air
        ph = _phases(n, D, cfg, air)
        N, _L, final_size, B = ph["params"]
        k, nc, ns, ext, multi = ph["shape"]
        mesh = ph["mesh"]
        fns = ph["fns"]
        tb = ph["tables"]
        domain = Domain.new(n)
        g = domain.group_gen()

        def shard_cyc(v_np):
            arr = to_cyclic_np(v_np, D)
            return jax.device_put(
                jnp.asarray(arr),
                NamedSharding(mesh, Pspec(AXIS, *([None] * (arr.ndim - 1)))),
            )

        rep_sh = NamedSharding(mesh, Pspec())

        # ── randomness, in the single-prover's exact draw order ────────────
        m_deg = cfg.mask_degree
        if multi:
            r_masks = jax.device_put(jnp.asarray(
                self.rng.integers(0, P, (k, m_deg), dtype=np.uint64)
                .astype(np.uint32)
            ), rep_sh)
            trace_cols = jax.device_put(jnp.asarray(
                np.stack([c.astype(np.uint32) for c in self.trace.columns])
            ), rep_sh)
            assert len(self.trace.columns) == k
        else:
            r_mask = jax.device_put(jnp.asarray(
                self.rng.integers(0, P, m_deg, dtype=np.uint64)
                .astype(np.uint32)
            ), rep_sh)
            trace_col = jax.device_put(
                jnp.asarray(self.trace.columns[0].astype(np.uint32)), rep_sh
            )
        trace_salts_np = self._salts_np(N)
        quot_salts_np = self._salts_np(N)
        trace_salts = shard_cyc(trace_salts_np)
        quot_salts = shard_cyc(quot_salts_np)

        # ── commit phase(s) ────────────────────────────────────────────────
        transcript = Transcript()
        if multi:
            out1 = fns["commit_trace"](
                trace_cols, r_masks, trace_salts, tb["shiftf"], tb["W"],
            )
            trace_tree = _DistTree(out1["t_lo"], out1["t_top"],
                                   out1["trace_lde"], trace_salts, mesh,
                                   kind=cfg.hash)
            trace_root = trace_tree.root()
            transcript.absorb_commitment(trace_root)
            alphas = (
                tuple(transcript.squeeze_challenge() for _ in range(nc))
                if nc > 1 else ()
            )
            out2 = fns["commit_quot"](
                out1["trace_lde"], quot_salts,
                jax.device_put(
                    jnp.asarray(np.array(alphas, np.uint32)), rep_sh
                ),
                tb["x"], tb["zh"],
            )
            quot_tree = _DistTree(out2["q_lo"], out2["q_top"],
                                  out2["q_evals"], quot_salts, mesh,
                                  kind=cfg.hash)
            quotient_root = quot_tree.root()
            transcript.absorb_commitment(quotient_root)
            self._ckpt("commit")
            trace_lde = out1["trace_lde"]
            q_evals = out2["q_evals"]
        else:
            out = fns["commit"](
                trace_col, r_mask, trace_salts, quot_salts,
                tb["x"], tb["zh"], tb["shiftf"], tb["W"],
            )
            trace_tree = _DistTree(out["t_lo"], out["t_top"],
                                   out["trace_lde"], trace_salts, mesh,
                                   kind=cfg.hash)
            quot_tree = _DistTree(out["q_lo"], out["q_top"],
                                  out["q_evals"], quot_salts, mesh,
                                  kind=cfg.hash)
            trace_root = trace_tree.root()
            quotient_root = quot_tree.root()
            transcript.absorb_commitment(trace_root)
            transcript.absorb_commitment(quotient_root)
            self._ckpt("commit")
            trace_lde = out["trace_lde"]
            q_evals = out["q_evals"]
            alphas = ()

        # ── z, OOD evaluations, constraint sanity, DEEP ────────────────────
        if ext:
            z = derive_z_ext(transcript, N, cfg.coset_shift)
            if multi:
                ood_vec, inv_xz = fns["ood"](
                    trace_lde, q_evals, tb["x"], jnp.asarray(z, jnp.uint32)
                )
                ood_np = np.asarray(ood_vec, np.uint64)        # (ns*k+1, 4)
                ood_trace = tuple(
                    tuple(tuple(int(v) for v in ood_np[s * k + c])
                          for c in range(k))
                    for s in range(ns)
                )
                q_z = tuple(int(v) for v in ood_np[ns * k])
                t_scalars = [
                    ood_trace[s] if k > 1 else ood_trace[s][0]
                    for s in range(ns)
                ]
                if nc > 1:
                    c_z = air.constraint_at_ext(t_scalars, z, g, n, alphas)
                else:
                    c_z = air.constraint_at_ext(t_scalars, z, g, n)
                z_z = extf.h_sub(extf.h_pow(z, n), extf.H_ONE)
                if c_z != extf.h_mul(q_z, z_z):
                    raise ValueError(
                        "Constraint check at z failed — invalid trace"
                    )
                for row in ood_trace:
                    for v in row:
                        transcript.absorb_ext(v)
                transcript.absorb_ext(q_z)
                d_evals = fns["deep"](trace_lde, q_evals, ood_vec, inv_xz)
            else:
                ood_vec, inv_xz = fns["ood"](
                    trace_lde, q_evals, tb["x"], jnp.asarray(z, jnp.uint32)
                )
                ood_np = np.asarray(ood_vec, np.uint64)  # (4, 4)
                t_z, t_gz, t_ggz, q_z = (
                    tuple(int(v) for v in row) for row in ood_np
                )
                c_z = air.constraint_at_ext([t_z, t_gz, t_ggz], z, g, n)
                z_z = extf.h_sub(extf.h_pow(z, n), extf.H_ONE)
                if c_z != extf.h_mul(q_z, z_z):
                    raise ValueError(
                        "Constraint check at z failed — invalid trace"
                    )
                for v in (t_z, t_gz, t_ggz, q_z):
                    transcript.absorb_ext(v)
                d_evals = fns["deep"](trace_lde, q_evals, ood_vec, inv_xz)
        else:
            z = derive_z(transcript, N, cfg.coset_shift)
            if multi:
                ood_vec, inv_xz = fns["ood"](
                    trace_lde, q_evals, tb["x"], jnp.uint32(z)
                )
                ood_np = np.asarray(ood_vec, np.uint64)
                ood_trace = tuple(
                    tuple(int(ood_np[s * k + c]) for c in range(k))
                    for s in range(ns)
                )
                q_z = int(ood_np[ns * k])
                t_scalars = [
                    ood_trace[s] if k > 1 else ood_trace[s][0]
                    for s in range(ns)
                ]
                if nc > 1:
                    c_z = air.constraint_at(t_scalars, z, g, n, alphas)
                else:
                    c_z = air.constraint_at(t_scalars, z, g, n)
                if c_z != q_z * domain.eval_vanishing(z) % P:
                    raise ValueError(
                        "Constraint check at z failed — invalid trace"
                    )
                for row in ood_trace:
                    for v in row:
                        transcript.absorb_field(v)
                transcript.absorb_field(q_z)
                d_evals = fns["deep"](trace_lde, q_evals, ood_vec, inv_xz)
            else:
                ood_vec, inv_xz = fns["ood"](
                    trace_lde, q_evals, tb["x"], jnp.uint32(z)
                )
                ood_np = np.asarray(ood_vec, np.uint64)
                t_z, t_gz, t_ggz, q_z = (int(v) for v in ood_np)
                c_z = air.constraint_at([t_z, t_gz, t_ggz], z, g, n)
                if c_z != q_z * domain.eval_vanishing(z) % P:
                    raise ValueError(
                        "Constraint check at z failed — invalid trace"
                    )
                for v in (t_z, t_gz, t_ggz, q_z):
                    transcript.absorb_field(v)
                d_evals = fns["deep"](trace_lde, q_evals, ood_vec, inv_xz)

        # ── FRI ────────────────────────────────────────────────────────────
        fri_sizes, fri_trees, fri_commitments, fri_final_layer = (
            self._fri_phase(ph, d_evals, transcript, shard_cyc)
        )

        # ── query phase (distributed gathers) ─────────────────────────────
        half0 = N // 2
        query_indices = transcript.squeeze_indices(cfg.num_queries, half0)
        num_folds = len(fri_sizes) - 1

        trace_idx = []
        for qi in query_indices:
            trace_idx += [(qi + s * B) % N for s in range(ns)]
        deep_idx = []
        for qi in query_indices:
            deep_idx += [qi, qi + half0]
        quot_idx = list(query_indices)
        fri_idx = [[] for _ in range(1, num_folds)]
        for qi in query_indices:
            idx = qi
            for li in range(1, num_folds):
                half = fri_sizes[li] // 2
                idx = idx % half
                fri_idx[li - 1] += [idx, idx + half]

        def openings(tree, indices):
            vals, salts, paths = tree.open_at(indices)
            proofs = openings_from_paths(indices, paths,
                                         len(tree.levels) - 1, tree.kind)
            return vals, salts, proofs

        self._ckpt("queries:start")
        tr_vals, tr_salts, tr_proofs = openings(trace_tree, trace_idx)
        q_vals, q_salts, q_proofs = openings(quot_tree, quot_idx)
        d_vals, d_salts, d_proofs = openings(fri_trees[0], deep_idx)
        fri_open = [
            openings(fri_trees[li], fri_idx[li - 1])
            for li in range(1, num_folds)
        ]
        self._ckpt("queries:done")

        def mk_open(indices, vals, salts, proofs, j):
            salt = (
                b"".join(int(w).to_bytes(4, "big") for w in salts[j])
                if salts is not None else b""
            )
            v = vals[j]
            value = tuple(int(x) for x in v) if np.ndim(v) else int(v)
            return MerkleOpening(indices[j], value, proofs[j], salt)

        query_proofs = []
        for q, qi in enumerate(query_indices):
            fri_ops = []
            for li in range(1, num_folds):
                vals, salts, proofs = fri_open[li - 1]
                fri_ops.append(
                    (mk_open(fri_idx[li - 1], vals, salts, proofs, 2 * q),
                     mk_open(fri_idx[li - 1], vals, salts, proofs,
                             2 * q + 1))
                )
            if multi:
                trace_ops = [
                    mk_open(trace_idx, tr_vals, tr_salts, tr_proofs,
                            ns * q + s)
                    for s in range(ns)
                ]
                query_proofs.append(
                    QueryProof(
                        index=qi,
                        deep_opening=mk_open(deep_idx, d_vals, d_salts,
                                             d_proofs, 2 * q),
                        deep_opening_pair=mk_open(deep_idx, d_vals, d_salts,
                                                  d_proofs, 2 * q + 1),
                        trace_opening=None,
                        trace_opening_g=None,
                        trace_opening_gg=None,
                        quotient_opening=mk_open(quot_idx, q_vals, q_salts,
                                                 q_proofs, q),
                        fri_openings=fri_ops,
                        trace_openings=trace_ops,
                    )
                )
            else:
                query_proofs.append(
                    QueryProof(
                        index=qi,
                        deep_opening=mk_open(deep_idx, d_vals, d_salts,
                                             d_proofs, 2 * q),
                        deep_opening_pair=mk_open(deep_idx, d_vals, d_salts,
                                                  d_proofs, 2 * q + 1),
                        trace_opening=mk_open(trace_idx, tr_vals, tr_salts,
                                              tr_proofs, ns * q),
                        trace_opening_g=mk_open(trace_idx, tr_vals, tr_salts,
                                                tr_proofs, ns * q + 1),
                        trace_opening_gg=mk_open(trace_idx, tr_vals,
                                                 tr_salts, tr_proofs,
                                                 ns * q + 2),
                        quotient_opening=mk_open(quot_idx, q_vals, q_salts,
                                                 q_proofs, q),
                        fri_openings=fri_ops,
                    )
                )

        if multi:
            return StarkProof(
                trace_len=n, lde_size=N,
                trace_commitment=trace_root,
                quotient_commitment=quotient_root,
                t_z=None, t_gz=None, t_ggz=None, q_z=q_z,
                fri_commitments=fri_commitments,
                fri_final_layer=fri_final_layer,
                query_proofs=query_proofs,
                ext=ext, ood_trace=ood_trace,
                num_columns=k, num_shifts=ns,
                hash=cfg.hash,
            )
        return StarkProof(
            trace_len=n, lde_size=N,
            trace_commitment=trace_root,
            quotient_commitment=quotient_root,
            t_z=t_z, t_gz=t_gz, t_ggz=t_ggz, q_z=q_z,
            fri_commitments=fri_commitments,
            fri_final_layer=fri_final_layer,
            query_proofs=query_proofs,
            ext=ext,
            hash=cfg.hash,
        )
