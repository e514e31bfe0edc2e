"""Zero-knowledge DEEP-ALI STARK prover, TPU-native.

Produces proofs with the reference protocol's exact shape and transcript
(reference: src/fibonacci.rs:99-310), but every vector phase is a whole-array
device computation and every polynomial transform is O(n log n):

  reference (scalar host loops)                 this prover (device arrays)
  ─────────────────────────────                 ───────────────────────────
  O(n^2) Lagrange trace interp (trace.rs:28-56) INTT on the trace domain
  Horner eval at 32n points  (fibonacci.rs:124) zero-pad + coset FFT (= LDE)
  per-point constraint loop  (fibonacci.rs:133) rolled eval-vector arithmetic
  pointwise Fermat inverses  (fibonacci.rs:147) closed-form Z_H tile + batch pow
  per-layer x inversions     (fri.rs:42)        inverse power table, squared
  per-leaf SHA-256           (merkle.rs:30)     batched leaf/level hashing

The Fiat-Shamir transcript (host) is byte-identical to the reference's; the
device only feeds it Merkle roots and OOD scalars at phase boundaries.

Zero-knowledge: T_hat = T + Z_H * R with MASK_DEGREE random blinding
coefficients (fibonacci.rs:110-121) and fresh 16-byte salts per committed
leaf (fibonacci.rs:327-353). Randomness comes from an injectable seed
(reproducible tests — unlike the reference's thread_rng) with OS entropy by
default.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .air import Air, FibonacciAir
from .config import DEFAULT_CONFIG, StarkConfig
from .domain import Domain
from .field import babybear as bb
from .field.babybear import P, MONT_R
from .merkle import (
    DeviceTree,
    build_salted_device_tree,
    build_unsalted_device_tree,
    extract_paths,
    openings_from_paths,
)
from .ops.ntt import np_powers
from .proof import MerkleOpening, QueryProof, StarkProof
from .trace import ExecutionTrace
from .transcript import Transcript, derive_z
from . import profiling

import functools
import jax


@functools.lru_cache(maxsize=16)
def _zh_inv_tile_dev(n: int, N: int, shift: int, omega: int) -> jnp.ndarray:
    """1 / Z_H over the shifted LDE domain, Montgomery form, device-cached."""
    B = N // n
    h_n = pow(shift, n, P)
    om_n = pow(omega, n, P)
    vals = np_powers(om_n, B) * np.uint64(h_n) % np.uint64(P)
    vals = (vals + np.uint64(P - 1)) % np.uint64(P)
    inv = np.array([pow(int(v), P - 2, P) for v in vals], np.uint64)
    inv_mont = inv * np.uint64(MONT_R) % np.uint64(P)
    with jax.ensure_compile_time_eval():
        return jnp.asarray(np.tile(inv_mont, n).astype(np.uint32))


@functools.lru_cache(maxsize=16)
def _xs_inv0_dev(N: int, shift: int, omega: int) -> jnp.ndarray:
    """x_i^-1 over the shifted LDE domain, Montgomery form, device-cached."""
    h_inv = pow(shift, P - 2, P)
    om_inv = pow(omega, P - 2, P)
    t = np_powers(om_inv, N) * np.uint64(h_inv) % np.uint64(P)
    t = t * np.uint64(MONT_R) % np.uint64(P)
    with jax.ensure_compile_time_eval():
        return jnp.asarray(t.astype(np.uint32))


_DEFAULT_AIR = FibonacciAir()

# Salted layers at or above this size are represented by their threefry KEY
# alone (never materialized outside a device program). 0 = ALWAYS, the
# round-4 default: (a) at the protocol ceiling (LDE 2^27) stored salt
# arrays would cost ~2 GiB per salted layer, ~10 GiB per proof — more than
# a v5e chip's HBM; (b) standalone (n, 4) salt materializations are
# layout-fragile on TPU — XLA assigned the eager 2^25-layer program a
# minor-dim-4 tiled layout, padding 512 MB to 16 GB (measured OOM), while
# in-graph generation leaves layout choices to temps. See ops/salts.py.
SALTLESS_MIN = 0


def _wrap_counted(fns: dict) -> dict:
    """Wrap every jitted phase callable so each invocation bumps the
    'dispatches' profiling counter — the per-proof dispatch count is part of
    the structured metrics line (`profiling.metrics_line`, CLI
    `prove --profile`). Host-side bookkeeping only; no device effect."""
    skip = {"tables", "x", "split_gathered"}

    def counted(f):
        def wrapper(*a, **kw):
            profiling.incr("dispatches")
            return f(*a, **kw)
        return wrapper

    for key, v in list(fns.items()):
        if key not in skip and callable(v):
            fns[key] = counted(v)
    return fns


def _d2h(x) -> np.ndarray:
    """Materialize a device array on host, counting transfer volume into the
    'd2h_bytes' profiling counter."""
    arr = np.asarray(x)
    profiling.incr("d2h_bytes", arr.nbytes)
    return arr


@functools.lru_cache(maxsize=8)
def _phase_fns(n: int, N: int, L: int, blowup: int, coset_shift: int, air,
               ext: bool = False, final_size: int = 0, num_queries: int = 0,
               hash_kind: str = "sha256"):
    """Jitted device phases (one dispatch each) for trace length n.

    On a remote-attached device every dispatch costs a ~25 ms round trip, so
    the whole commit phase, OOD evaluation, the DEEP quotient, each FRI fold,
    and each query gather are single fused programs; z and the OOD scalars
    enter as traced values. `air` must be a long-lived (stateless) instance —
    the cache is keyed on it, so constructing a fresh AIR per proof would
    recompile every proof.
    """
    from .domain import _shift_tables
    from .merkle import _device_levels as _levels_raw, _hash_backend
    from .ops.ntt import apply_ntt, ntt_tables

    # hash backend for every committed tree (leaf + node hashing inside the
    # fused programs); `sha` is the historical local name — it binds either
    # the SHA-256 or the Poseidon2 module, same entry-point surface
    sha = _hash_backend(hash_kind)

    def _device_levels(leaves):
        return _levels_raw(leaves, hash_kind)

    domain = Domain.new(n)
    shifted = Domain.new(N).get_coset(coset_shift)
    g = domain.group_gen()
    m = L - n
    inv_om_n = pow(domain.omega, P - 2, P)
    shift_fwd, _shift_bwd_unused = _shift_tables(N, coset_shift)
    n_inv = pow(n, P - 2, P)

    # Every large constant rides into the jitted programs as an ARGUMENT —
    # closing over device arrays would bake them into the compiled program
    # (at 2^20 rows that is >500 MB of inline constants, more than this
    # deployment's remote compiler accepts, and a compile-time tax anywhere).
    # No size-N inverse-transform tables since round 2: the quotient is never
    # interpolated back to coefficients (barycentric OOD from the evals).
    tables = dict(
        trace_intt=ntt_tables(n, inv_om_n),
        fft=ntt_tables(N, shifted.omega),
        shift_fwd=shift_fwd,
        zh_tile=_zh_inv_tile_dev(n, N, coset_shift, shifted.omega),
        x=shifted.elements(),
    )

    # Huge committed layers drop the stored bottom digest levels (merkle.py
    # prune_levels: level 0 alone is 1 GB at LDE 2^25, 4.3 GB at the 2^27
    # ceiling; at PRUNE_DEPTH the stored top is 1/128th) — query-time
    # sibling digests are recomputed from values + salts. Salt layers at or
    # above SALTLESS_MIN are never materialized outside a program at all:
    # the prover passes a (2,) threefry KEY, commits generate the layer
    # in-graph (an XLA temporary), and query gathers regenerate exactly the
    # opened indices (ops/salts.py — bit-identical to the bulk draw).
    from .merkle import prune_levels
    from .ops import salts as salts_mod

    pruned_n = prune_levels(N, True)
    field_salts = hash_kind != "sha256"

    def _full_salts(s, count):
        """(count, 4) salt words from either form of the salts argument."""
        if s.ndim == 1:
            return salts_mod.salts_full(s, count, field_salts)
        return s

    def _commit_levels(values, salts_arg, mode="base"):
        """Stored tree levels for one committed layer inside a commit
        program: chunk-streamed at deep pruning (the huge-layer regime —
        bounded SHA temps, single-traced compression; merkle.py), plain
        batched build below it."""
        from .merkle import _levels_salted_pruned

        if pruned_n >= 2:
            return _levels_salted_pruned(
                values, salts_arg, pruned_n, hash_kind, mode
            )
        salts = _full_salts(salts_arg, N)
        leaf = (
            sha.hash_salted_leaves_multi(values, salts) if mode == "multi"
            else sha.hash_salted_leaves(values, salts)
        )
        lv = _device_levels(leaf)
        return lv[pruned_n:] if pruned_n else lv

    def commit(trace_col, r_mask, trace_salts, quot_salts, tb):
        """Phases 1-2 (fibonacci.rs:110-154) as one program: interpolate,
        mask, coset LDE, constraint, quotient, and both Merkle trees.

        No quotient IFFT: since round 2 the OOD evaluations are barycentric
        from the already-materialized eval vectors (deg Q, deg T_hat < N, so
        the interpolants are exact), which drops an entire N-point inverse
        transform from every proof (the reference pays it at
        fibonacci.rs:145-151 just to Horner-evaluate q_poly at z)."""
        t_coeffs = bb.mul_const(apply_ntt(trace_col, tb["trace_intt"], n), n_inv)
        t_pad = jnp.pad(t_coeffs, (0, L - n))
        r_low = jnp.pad(r_mask, (0, L - m))
        r_shift = jnp.pad(r_mask, (n, L - m - n))
        that = bb.add(t_pad, bb.sub(r_shift, r_low))

        padded = jnp.pad(that, (0, N - L))
        trace_lde = apply_ntt(bb.mont_mul(padded, tb["shift_fwd"]), tb["fft"], N)
        trace_levels = _commit_levels(trace_lde, trace_salts)

        t_rolls = [jnp.roll(trace_lde, -k * blowup) for k in range(air.num_shifts)]
        c_evals = air.constraint_lde(t_rolls, tb["x"], g, n)
        q_evals = bb.mont_mul(c_evals, tb["zh_tile"])
        quot_levels = _commit_levels(q_evals, quot_salts)
        return dict(
            trace_lde=trace_lde,
            q_evals=q_evals,
            trace_levels=trace_levels,
            quot_levels=quot_levels,
        )

    # ── barycentric OOD machinery ──────────────────────────────────────────
    # For evals v_i of a degree-<N polynomial on the coset {x_i = h omega^i}:
    #   p(z) = (z^N - h^N)/(N h^N) * sum_i x_i v_i / (z - x_i)
    # (weights w_i = 1/l'(x_i) = x_i/(N h^N) since l(z) = z^N - h^N).
    # T(g^s z) comes free: roll(trace_lde, -s*blowup) is the eval vector of
    # T(g^s x), so every OOD value shares ONE denominator inversion — which
    # the DEEP quotient then reuses (it divides by the same x_i - z).
    h_N = pow(coset_shift, N, P)
    NhN_inv = pow(N * h_N % P, P - 2, P)

    def _bary_pref(z):
        """(z^N - h^N)/(N h^N) for a traced base scalar z."""
        return bb.mul_const(bb.sub(bb.pow_const(z, N), jnp.uint32(h_N)), NhN_inv)

    def ood4(trace_lde, q_evals, x, z):
        inv_xz = bb.inv(bb.sub(x, z))          # 1/(x_i - z), reused by DEEP
        w = bb.mul(x, inv_xz)                  # x_i/(x_i - z)
        pref = _bary_pref(z)
        zero = jnp.uint32(0)

        def ev(v):
            s = bb.sum_mod(bb.mul(v, w))
            return bb.mul(pref, bb.sub(zero, s))  # note 1/(z-x) = -1/(x-z)

        vals = jnp.stack([
            ev(trace_lde),
            ev(jnp.roll(trace_lde, -blowup)),
            ev(jnp.roll(trace_lde, -2 * blowup)),
            ev(q_evals),
        ])
        return vals, inv_xz

    def deep(trace_lde, q_evals, inv_xz, ood):
        num = bb.sub(q_evals, ood[3])
        num = bb.add(num, bb.sub(jnp.roll(trace_lde, -2 * blowup), ood[2]))
        num = bb.add(num, bb.sub(jnp.roll(trace_lde, -blowup), ood[1]))
        num = bb.add(num, bb.sub(trace_lde, ood[0]))
        return bb.mul(num, inv_xz)

    def _bary_ext(x, z4):
        """Shared ext barycentric setup: (inv_xz (N, 4) — reused by DEEP —
        and ev(v) evaluating a base eval-vector at the ext point z)."""
        from .field import ext as extf

        zero = jnp.zeros_like(x)
        x_minus_z = jnp.stack(
            [bb.sub(x, z4[0])] + [bb.sub(zero, z4[j]) for j in (1, 2, 3)],
            axis=-1,
        )
        inv_xz = extf.inv_fast(x_minus_z)
        w = extf.mul_base(inv_xz, x)            # x_i/(x_i - z), ext
        zN = extf.pow_const(z4[None, :], N)[0]
        hN4 = jnp.asarray(np.array([h_N, 0, 0, 0], np.uint32))
        pref = bb.mul_const(extf.sub(zN, hN4), NhN_inv)   # (4,)

        def ev(v):
            s = bb.sum_mod(extf.mul_base(w, v), axis=0)   # (4,)
            neg_s = bb.sub(jnp.uint32(0), s)
            return extf.mul(pref[None, :], neg_s[None, :])[0]

        return inv_xz, ev

    def fold(current, xs_inv, beta):
        from .pipeline import _fold_traced

        half = current.shape[0] // 2
        folded = _fold_traced(current, xs_inv[:half], beta)
        return folded, bb.mont_mul(xs_inv[:half], xs_inv[:half])

    def gather(levels, values, idx):
        vals = jnp.take(values, idx)
        paths = extract_paths(levels, idx)
        return vals, paths

    # ── pruned / saltless opening machinery (protocol-ceiling memory) ─────
    # Huge salted trees store only levels >= prune_levels(size) (merkle.py)
    # and may carry their salts as a (2,) threefry KEY instead of a (size,4)
    # array (ops/salts.py). Both properties are recovered statically from
    # ARGUMENT SHAPES at trace time — no flags to thread — so one gather
    # program covers every (pruned, saltless) combination per tree size.

    def _salt_slice(s, flat_idx):
        """Salt words at the given leaf indices: array take, or in-graph
        threefry regeneration when `s` is a (2,) key."""
        if s.ndim == 1:
            return salts_mod.salts_for_indices(s, flat_idx, field_salts)
        return jnp.take(s, flat_idx, axis=0)

    def _pruned_of(size: int, levels) -> int:
        """Dropped bottom levels = full depth - stored depth (static)."""
        return size.bit_length() - 1 - (len(levels) - 1)

    def _bottom_paths(leaf_digests_at, idx, pruned: int):
        """(Q, pruned, 8) sibling digests for the dropped bottom levels: one
        2^pruned-leaf block rehash per opened index, folded upward with the
        per-level sibling extracted along the way. `leaf_digests_at(flat)`
        hashes the leaves at flat indices (mode-specific)."""
        W = 1 << pruned
        Q = idx.shape[0]
        base = (idx >> pruned) << pruned
        block = base[:, None] + jnp.arange(W, dtype=idx.dtype)    # (Q, W)
        cur = leaf_digests_at(block.reshape(-1)).reshape(Q, W, 8)
        loc = idx & (W - 1)
        sibs = []
        for l in range(pruned):
            sib_loc = (loc >> l) ^ 1                              # (Q,)
            sibs.append(jnp.take_along_axis(
                cur, sib_loc[:, None, None], axis=1
            )[:, 0])
            if l + 1 < pruned:
                half = cur.shape[1] // 2
                cur = sha.hash_nodes(
                    cur[:, 0::2].reshape(-1, 8), cur[:, 1::2].reshape(-1, 8)
                ).reshape(Q, half, 8)
        return jnp.stack(sibs, axis=1)                            # (Q, pr, 8)

    def _gather_salted_any(levels, size, s, idx, leaf_digests_at, vals):
        """Shared body: opened values already taken by the caller (`vals`);
        returns (vals, paths, opened_salts) handling pruning + key salts."""
        pruned = _pruned_of(size, levels)
        opened_salts = _salt_slice(s, idx)
        if pruned == 0:
            return vals, extract_paths(levels, idx), opened_salts
        bottom = _bottom_paths(leaf_digests_at, idx, pruned)
        rest = extract_paths(levels, idx >> pruned)
        paths = jnp.concatenate([bottom, rest], axis=1)
        return vals, paths, opened_salts

    def gather_salted(levels, values, s, idx):
        def leaf_digests_at(flat):
            return sha.hash_salted_leaves(
                jnp.take(values, flat), _salt_slice(s, flat)
            )

        return _gather_salted_any(
            levels, values.shape[0], s, idx, leaf_digests_at,
            jnp.take(values, idx),
        )

    fns = dict(
        commit=jax.jit(commit),
        ood=jax.jit(ood4),
        deep=jax.jit(deep),
        fold=jax.jit(fold),
        gather=jax.jit(gather),
        gather_salted=jax.jit(gather_salted),
        x=tables["x"],
        tables=tables,
    )

    # ── fused query phase: EVERY opened tree in ONE dispatch ──────────────
    # The reference-shape query phase opens log2(N/final) + 2 trees. One
    # gather program per tree costs a tunnel round trip to dispatch and
    # another to materialize (~25 ms each on a remote-attached chip —
    # measured 1.85 s of a 4.2 s proof at 2^18). This program gathers every
    # tree and concatenates the results into three flat uint32 arrays, so
    # the whole phase is one dispatch + one transfer; `split_gathered`
    # reverses the packing on host.
    if final_size and num_queries:
        Q = num_queries
        _fri_sizes = []
        _layer = N // 2
        while _layer > final_size:
            _fri_sizes.append(_layer)
            _layer //= 2
        # opened trees in order: trace (3Q idxs), quotient (Q), DEEP/fri
        # layer 0 (2Q), then each intermediate FRI layer (2Q each; the final
        # layer is sent in the clear and never opened)
        gspec = [
            dict(size=N, nidx=3 * Q, ext=False),
            dict(size=N, nidx=Q, ext=False),
            dict(size=N, nidx=2 * Q, ext=ext),
        ] + [dict(size=s, nidx=2 * Q, ext=ext) for s in _fri_sizes]
        for t in gspec:
            t["depth"] = t["size"].bit_length() - 1

        def gather_all(trees, values, salts, idxs):
            v_out, p_out, s_out = [], [], []
            for t, levels, vals, slt, idx in zip(gspec, trees, values,
                                                 salts, idxs):
                v = jnp.take(vals, idx, axis=0)
                pruned = _pruned_of(t["size"], levels)
                leaf_fn = (
                    sha.hash_salted_leaves_ext if t["ext"]
                    else sha.hash_salted_leaves
                )

                def leaf_digests_at(flat, vals=vals, slt=slt,
                                    leaf_fn=leaf_fn):
                    return leaf_fn(
                        jnp.take(vals, flat, axis=0), _salt_slice(slt, flat)
                    )

                if pruned:
                    bottom = _bottom_paths(leaf_digests_at, idx, pruned)
                    rest = extract_paths(levels, idx >> pruned)
                    paths = jnp.concatenate([bottom, rest], axis=1)
                else:
                    paths = extract_paths(levels, idx)
                v_out.append(v.reshape(-1))
                p_out.append(paths.reshape(-1))
                s_out.append(_salt_slice(slt, idx).reshape(-1))
            return (jnp.concatenate(v_out), jnp.concatenate(p_out),
                    jnp.concatenate(s_out))

        def split_gathered(v_np, p_np, s_np):
            """Flat uint32 gather outputs -> per-tree (vals u64 [(Q,4) if
            ext], paths u32 (Q, depth, 8), salts u64 (Q, 4))."""
            out, vo, po, so = [], 0, 0, 0
            for t in gspec:
                nv = t["nidx"] * (4 if t["ext"] else 1)
                npth = t["nidx"] * t["depth"] * 8
                nsl = t["nidx"] * 4
                vals = v_np[vo:vo + nv].astype(np.uint64)
                if t["ext"]:
                    vals = vals.reshape(t["nidx"], 4)
                out.append((
                    vals,
                    p_np[po:po + npth].reshape(t["nidx"], t["depth"], 8),
                    s_np[so:so + nsl].astype(np.uint64).reshape(t["nidx"], 4),
                ))
                vo, po, so = vo + nv, po + npth, so + nsl
            return out

        fns["gather_all"] = jax.jit(gather_all)
        fns["split_gathered"] = split_gathered

    # ── generic multi-column / multi-constraint path ──────────────────────
    # Used when the AIR declares k columns, nc composed constraints, or a
    # shift count other than 3. The commit phase splits in two dispatches
    # (trace, then quotient) because the composition alphas are Fiat-Shamir
    # challenges squeezed from the trace root.
    k = getattr(air, "num_columns", 1)
    nc = getattr(air, "num_constraints", 1)
    ns = air.num_shifts
    multi = k > 1 or nc > 1 or ns != 3
    if multi:

        def commit_trace(trace_cols, r_masks, trace_salts, tb):
            """trace_cols (k, n), r_masks (k, m) -> thats (k, L), LDE (k, N),
            one row-bundle tree (leaf = salt || v_0 || ... || v_{k-1})."""
            ldes = []
            for c in range(k):
                t_coeffs = bb.mul_const(
                    apply_ntt(trace_cols[c], tb["trace_intt"], n), n_inv
                )
                t_pad = jnp.pad(t_coeffs, (0, L - n))
                r_low = jnp.pad(r_masks[c], (0, L - m))
                r_shift = jnp.pad(r_masks[c], (n, L - m - n))
                that = bb.add(t_pad, bb.sub(r_shift, r_low))
                padded = jnp.pad(that, (0, N - L))
                ldes.append(
                    apply_ntt(bb.mont_mul(padded, tb["shift_fwd"]), tb["fft"], N)
                )
            lde_k = jnp.stack(ldes)
            levels = _commit_levels(lde_k, trace_salts, "multi")
            return dict(trace_lde=lde_k, trace_levels=levels)

        def commit_quot(trace_lde, quot_salts, alphas, tb):
            t_views = [
                jnp.roll(trace_lde, -s * blowup, axis=1) for s in range(ns)
            ]
            if k == 1:
                t_views = [v[0] for v in t_views]
            if nc > 1:
                c_evals = air.constraint_lde(t_views, tb["x"], g, n, alphas)
            else:
                c_evals = air.constraint_lde(t_views, tb["x"], g, n)
            q_evals = bb.mont_mul(c_evals, tb["zh_tile"])
            quot_levels = _commit_levels(q_evals, quot_salts)
            return dict(q_evals=q_evals, quot_levels=quot_levels)

        def ood_multi(trace_lde, q_evals, x, z):
            """Barycentric OOD at [z, gz, ...]: returns ((ns*k + 1,) values
            shift-major column-minor quotient-last, inv_xz for DEEP).
            T_c(g^s z) = barycentric at z over roll(lde_c, -s*blowup)."""
            inv_xz = bb.inv(bb.sub(x, z))
            w = bb.mul(x, inv_xz)
            pref = _bary_pref(z)
            zero = jnp.uint32(0)

            def ev(v):
                return bb.mul(pref, bb.sub(zero, bb.sum_mod(bb.mul(v, w))))

            rows = []
            for s in range(ns):
                rolled = jnp.roll(trace_lde, -s * blowup, axis=1)
                for c in range(k):
                    rows.append(ev(rolled[c]))
            rows.append(ev(q_evals))
            return jnp.stack(rows), inv_xz

        def deep_multi(trace_lde, q_evals, inv_xz, ood):
            num = bb.sub(q_evals, ood[ns * k])
            for s in range(ns):
                rolled = jnp.roll(trace_lde, -s * blowup, axis=1)
                for c in range(k):
                    num = bb.add(num, bb.sub(rolled[c], ood[s * k + c]))
            return bb.mul(num, inv_xz)

        def gather_salted_multi(levels, values, s, idx):
            """values (k, N): open the k-value row bundle at each index
            (pruned trees and key-form salts handled shape-statically)."""
            def leaf_digests_at(flat):
                return sha.hash_salted_leaves_multi(
                    jnp.take(values, flat, axis=1), _salt_slice(s, flat)
                )

            return _gather_salted_any(
                levels, values.shape[1], s, idx, leaf_digests_at,
                jnp.take(values, idx, axis=1).T,
            )

        fns.update(
            commit_trace=jax.jit(commit_trace),
            commit_quot=jax.jit(commit_quot),
            ood_multi=jax.jit(ood_multi),
            deep_multi=jax.jit(deep_multi),
            gather_salted_multi=jax.jit(gather_salted_multi),
        )

        if ext:
            from .field import ext as extf

            def ood_multi_ext(trace_lde, q_evals, x, z4):
                """Barycentric ext OOD at [z, gz, ...]: returns
                ((ns*k + 1, 4) ext values shift-major column-minor
                quotient-last, inv_xz (N, 4) for DEEP)."""
                inv_xz, ev = _bary_ext(x, z4)
                rows = []
                for s in range(ns):
                    rolled = jnp.roll(trace_lde, -s * blowup, axis=1)
                    for c in range(k):
                        rows.append(ev(rolled[c]))
                rows.append(ev(q_evals))
                return jnp.stack(rows), inv_xz

            def deep_multi_ext(trace_lde, q_evals, inv_xz, ood):
                base_sum = q_evals
                for s in range(ns):
                    rolled = jnp.roll(trace_lde, -s * blowup, axis=1)
                    for c in range(k):
                        base_sum = bb.add(base_sum, rolled[c])
                ood_sum = bb.sum_mod(ood, axis=0)  # (4,)
                zero = jnp.zeros_like(base_sum)
                num = jnp.stack(
                    [bb.sub(base_sum, ood_sum[0])]
                    + [bb.sub(zero, ood_sum[j]) for j in (1, 2, 3)],
                    axis=-1,
                )
                return extf.mul(num, inv_xz)

            fns.update(
                ood_multi_ext=jax.jit(ood_multi_ext),
                deep_multi_ext=jax.jit(deep_multi_ext),
            )

    if not ext:
        return _wrap_counted(fns)

    # ── extension-field soundness mode: z and betas live in F_p^4 ─────────
    from .field import ext as extf
    from .ops.fri import fri_fold_ext

    def ood4_ext(trace_lde, q_evals, x, z4):
        """Barycentric ext OOD: rows t_z, t_gz, t_ggz, q_z — all four share
        one (N, 4) denominator inversion, which DEEP then reuses."""
        inv_xz, ev = _bary_ext(x, z4)
        vals = jnp.stack([
            ev(trace_lde),
            ev(jnp.roll(trace_lde, -blowup)),
            ev(jnp.roll(trace_lde, -2 * blowup)),
            ev(q_evals),
        ])  # (4, 4)
        return vals, inv_xz

    def deep_ext(trace_lde, q_evals, inv_xz, ood):
        # numerator = (base openings sum) - (ext OOD sum), an ext vector whose
        # base coefficient carries all the base-field work
        base_sum = bb.add(
            bb.add(q_evals, jnp.roll(trace_lde, -2 * blowup)),
            bb.add(jnp.roll(trace_lde, -blowup), trace_lde),
        )
        ood_sum = bb.sum_mod(ood, axis=0)  # (4,) ext scalar
        zero = jnp.zeros_like(base_sum)
        num = jnp.stack(
            [
                bb.sub(base_sum, ood_sum[0]),
                bb.sub(zero, ood_sum[1]),
                bb.sub(zero, ood_sum[2]),
                bb.sub(zero, ood_sum[3]),
            ],
            axis=-1,
        )
        return extf.mul(num, inv_xz)

    def fold_ext(current, xs_inv, beta4):
        half = current.shape[0] // 2
        folded = fri_fold_ext(current, xs_inv[:half], beta4)
        return folded, bb.mont_mul(xs_inv[:half], xs_inv[:half])

    def gather_ext(levels, values, idx):
        return jnp.take(values, idx, axis=0), extract_paths(levels, idx)

    def gather_salted_ext(levels, values, s, idx):
        def leaf_digests_at(flat):
            return sha.hash_salted_leaves_ext(
                jnp.take(values, flat, axis=0), _salt_slice(s, flat)
            )

        return _gather_salted_any(
            levels, values.shape[0], s, idx, leaf_digests_at,
            jnp.take(values, idx, axis=0),
        )

    fns.update(
        ood_ext=jax.jit(ood4_ext),
        deep_ext=jax.jit(deep_ext),
        fold_ext=jax.jit(fold_ext),
        gather_ext=jax.jit(gather_ext),
        gather_salted_ext=jax.jit(gather_salted_ext),
    )
    return _wrap_counted(fns)


class StarkProver:
    def __init__(
        self,
        trace: ExecutionTrace,
        air: Air | None = None,
        config: StarkConfig = DEFAULT_CONFIG,
        seed: int | None = None,
    ):
        self.trace = trace
        self.air = air or _DEFAULT_AIR
        self.config = config
        # Injectable randomness (cf. survey of thread_rng at fibonacci.rs:117).
        self.rng = np.random.default_rng(seed)

    # ── helpers ────────────────────────────────────────────────────────────

    def _salts(self, n: int) -> jnp.ndarray:
        """Per-leaf 16-byte salts as (n, 4) u32 big-endian words, generated ON
        DEVICE (threefry) from the injectable seed — word form feeds the
        SHA-256 block construction directly, and transferring host salts would
        cost 16 B/leaf of tunnel bandwidth per committed layer. Only the
        <=3*num_queries opened salts ever reach the host (query-time gather);
        their canonical byte form is the BE bytes of the 4 words.

        Values are the in-repo threefry clone's counter stream
        (ops/salts.py) — bit-identical to rounds 1-3's
        `jax.random.bits(PRNGKey(seed), (n, 4))` draw (tests pin the
        equality), so proof bytes are unchanged AND independent of jax's
        default PRNG configuration.

        Poseidon2 mode: salt words are FIELD ELEMENTS (the leaf sponge
        absorbs them as BabyBear lanes) — mask to 31 bits and conditionally
        subtract p. ~30.97 bits of entropy per word, ~124 per salt — the
        hiding property needs unpredictability, not exact uniformity."""
        from .ops import salts as salts_mod

        key = salts_mod.key_words(int(self.rng.integers(0, 2**63)))
        return salts_mod.salts_full(
            jnp.asarray(key), n, self.config.hash != "sha256"
        )

    def _layer_salts(self, size: int):
        """Salt representation for one committed layer: the (size, 4) word
        array below SALTLESS_MIN, else just the (2,) threefry key — the
        layer's salts are then generated in-graph at commit time and
        REGENERATED per opened index at query time (ops/salts.py), never
        stored in HBM. Same rng consumption either way, so the proof bytes
        do not depend on which representation a size uses."""
        from .ops import salts as salts_mod

        key = salts_mod.key_words(int(self.rng.integers(0, 2**63)))
        if size >= SALTLESS_MIN:
            return jnp.asarray(key)
        return salts_mod.salts_full(
            jnp.asarray(key), size, self.config.hash != "sha256"
        )

    def _fri_phase(self, fns, d_evals, transcript, final_size, N, ext):
        """FRI folding with Merkle commits (fibonacci.rs:200-247); shared by
        the reference-protocol and multi-column paths. Returns
        (layers, trees, salts, commitments, final_layer_host)."""
        cfg = self.config
        shifted = Domain.new(N).get_coset(cfg.coset_shift)
        fri_layers = [d_evals]
        fri_trees: list[DeviceTree] = []
        fri_salts: list = []
        fri_commitments: list = []

        kind = self.config.hash
        salts0 = self._layer_salts(N)
        profiling.incr("dispatches")  # tree build is its own program
        tree0 = build_salted_device_tree(d_evals, salts0, ext=ext, kind=kind)
        root0 = tree0.root()
        transcript.absorb_commitment(root0)
        fri_commitments.append(root0)
        fri_trees.append(tree0)
        fri_salts.append(salts0)

        xs_inv = _xs_inv0_dev(N, cfg.coset_shift, shifted.omega)
        current = d_evals
        while current.shape[0] > final_size:
            profiling_phase = profiling.phase(f"fri_fold_{current.shape[0]}")
            profiling_phase.__enter__()
            if ext:
                beta = transcript.squeeze_ext_challenge()
                current, xs_inv = fns["fold_ext"](
                    current, xs_inv, jnp.asarray(beta, jnp.uint32)
                )
            else:
                beta = transcript.squeeze_challenge()
                current, xs_inv = fns["fold"](current, xs_inv, jnp.uint32(beta))

            fri_layers.append(current)
            profiling.incr("dispatches")
            if current.shape[0] == final_size:
                tree = build_unsalted_device_tree(current, ext=ext, kind=kind)
                salts = None
            else:
                salts = self._layer_salts(current.shape[0])
                tree = build_salted_device_tree(current, salts, ext=ext,
                                                kind=kind)
            root = tree.root()
            transcript.absorb_commitment(root)
            fri_commitments.append(root)
            fri_trees.append(tree)
            fri_salts.append(salts)
            profiling_phase.__exit__(None, None, None)

        if ext:
            final = [
                tuple(int(v) for v in row)
                for row in np.asarray(current, np.uint64)
            ]
        else:
            final = [int(v) for v in np.asarray(current, np.uint64)]
        return fri_layers, fri_trees, fri_salts, fri_commitments, final

    def _generate_proof_multi(self, fns, k, nc, ns, ext=False) -> StarkProof:
        """Generic-AIR path: k trace columns in one row-bundle commitment,
        nc constraints composed with Fiat-Shamir alphas (squeezed from the
        trace root, so the commit phase is two dispatches), ns shifted
        openings per query. With (k, nc, ns) = (1, 1, 3) the transcript
        matches the reference protocol exactly — this path exists for the
        shapes the reference cannot express. `ext` combines it with the
        extension-field soundness mode (z/betas from F_p^4; alphas stay
        base-field)."""
        cfg = self.config
        n = self.trace.num_rows
        N = n * cfg.blowup
        domain = Domain.new(n)
        g = domain.group_gen()
        B = cfg.blowup
        m = cfg.mask_degree

        assert len(self.trace.columns) == k, (
            f"AIR declares {k} columns, trace has {len(self.trace.columns)}"
        )

        # ── commit trace (k columns, one tree) ────────────────────────────
        with profiling.phase("commit_trace"):
            r_masks = jnp.asarray(
                self.rng.integers(0, P, (k, m), dtype=np.uint64).astype(np.uint32)
            )
            trace_cols = jnp.asarray(
                np.stack(self.trace.columns).astype(np.uint32)
            )
            trace_salts = self._layer_salts(N)
            quot_salts = self._layer_salts(N)
            out1 = fns["commit_trace"](
                trace_cols, r_masks, trace_salts, fns["tables"]
            )
            trace_lde = out1["trace_lde"]
            from .merkle import prune_levels

            pruned = prune_levels(N, True)
            trace_tree = DeviceTree(out1["trace_levels"], pruned=pruned,
                                    kind=cfg.hash)
            trace_root = trace_tree.root()

        transcript = Transcript()
        transcript.absorb_commitment(trace_root)
        alphas = (
            tuple(transcript.squeeze_challenge() for _ in range(nc))
            if nc > 1
            else ()
        )

        # ── constraint + quotient commit (alphas are transcript outputs) ──
        with profiling.phase("commit_quot"):
            out2 = fns["commit_quot"](
                trace_lde, quot_salts,
                jnp.asarray(np.array(alphas, np.uint32)), fns["tables"],
            )
            q_evals = out2["q_evals"]
            quotient_tree = DeviceTree(out2["quot_levels"], pruned=pruned,
                                       kind=cfg.hash)
            quotient_root = quotient_tree.root()
        transcript.absorb_commitment(quotient_root)

        # ── z, OOD openings (shift-major, column-minor), sanity ───────────
        if ext:
            from .field import ext as extf
            from .transcript import derive_z_ext

            z = derive_z_ext(transcript, N, cfg.coset_shift)
            with profiling.phase("ood_evals"):
                ood_vec, inv_xz = fns["ood_multi_ext"](
                    trace_lde, q_evals, fns["x"], jnp.asarray(z, jnp.uint32)
                )
                ood_np = np.asarray(ood_vec, np.uint64)  # (ns*k+1, 4)
            ood_trace = tuple(
                tuple(tuple(int(v) for v in ood_np[s * k + c]) for c in range(k))
                for s in range(ns)
            )
            q_z = tuple(int(v) for v in ood_np[ns * k])

            t_scalars = [
                ood_trace[s] if k > 1 else ood_trace[s][0] for s in range(ns)
            ]
            if nc > 1:
                c_z = self.air.constraint_at_ext(t_scalars, z, g, n, alphas)
            else:
                c_z = self.air.constraint_at_ext(t_scalars, z, g, n)
            z_z = extf.h_sub(extf.h_pow(z, n), extf.H_ONE)
            if c_z != extf.h_mul(q_z, z_z):
                raise ValueError("Constraint check at z failed — invalid trace")

            for row in ood_trace:
                for v in row:
                    transcript.absorb_ext(v)
            transcript.absorb_ext(q_z)

            with profiling.phase("deep"):
                d_evals = fns["deep_multi_ext"](
                    trace_lde, q_evals, inv_xz, ood_vec
                )
        else:
            z = derive_z(transcript, N, cfg.coset_shift)
            with profiling.phase("ood_evals"):
                ood_vec, inv_xz = fns["ood_multi"](
                    trace_lde, q_evals, fns["x"], jnp.uint32(z)
                )
                ood_np = np.asarray(ood_vec, np.uint64)
            ood_trace = tuple(
                tuple(int(ood_np[s * k + c]) for c in range(k)) for s in range(ns)
            )
            q_z = int(ood_np[ns * k])

            t_scalars = [
                ood_trace[s] if k > 1 else ood_trace[s][0] for s in range(ns)
            ]
            if nc > 1:
                c_z = self.air.constraint_at(t_scalars, z, g, n, alphas)
            else:
                c_z = self.air.constraint_at(t_scalars, z, g, n)
            z_z = domain.eval_vanishing(z)
            if c_z != q_z * z_z % P:
                raise ValueError("Constraint check at z failed — invalid trace")

            for row in ood_trace:
                for v in row:
                    transcript.absorb_field(v)
            transcript.absorb_field(q_z)

            # ── DEEP ──────────────────────────────────────────────────────
            with profiling.phase("deep"):
                d_evals = fns["deep_multi"](
                    trace_lde, q_evals, inv_xz, ood_vec
                )
        final_size = cfg.final_layer_size(n)
        fri_layers, fri_trees, fri_salts, fri_commitments, fri_final_layer = (
            self._fri_phase(fns, d_evals, transcript, final_size, N, ext)
        )

        # ── query phase ───────────────────────────────────────────────────
        half0 = N // 2
        query_indices = transcript.squeeze_indices(cfg.num_queries, half0)
        num_folds = len(fri_layers) - 1

        trace_idx = []
        for qi in query_indices:
            trace_idx += [(qi + s * B) % N for s in range(ns)]
        quot_idx = list(query_indices)
        deep_idx = []
        for qi in query_indices:
            deep_idx += [qi, qi + half0]
        fri_idx = [[] for _ in range(1, num_folds)]
        for qi in query_indices:
            idx = qi
            for li in range(1, num_folds):
                half = fri_layers[li].shape[0] // 2
                idx = idx % half
                fri_idx[li - 1] += [idx, idx + half]

        def gathered(fn_name, tree, values, indices, salts):
            iarr = jnp.asarray(np.array(indices, np.int32))
            return fns[fn_name](tuple(tree.levels), values, salts, iarr)

        t_iarr = jnp.asarray(np.array(trace_idx, np.int32))
        # one unified gather per mode handles pruned trees and key-form
        # salts shape-statically (see _phase_fns)
        tr_pend = fns["gather_salted_multi"](
            tuple(trace_tree.levels), trace_lde, trace_salts, t_iarr
        )
        q_pend = gathered("gather_salted", quotient_tree, q_evals, quot_idx,
                          quot_salts)
        sfx = "_ext" if ext else ""
        d_pend = gathered("gather_salted" + sfx, fri_trees[0], fri_layers[0],
                          deep_idx, fri_salts[0])
        f_pend = [
            gathered(
                "gather_salted" + sfx,
                fri_trees[li], fri_layers[li], fri_idx[li - 1], fri_salts[li],
            )
            for li in range(1, num_folds)
        ]

        def materialize(tree, indices, vps):
            v, p, s = vps
            vals = _d2h(v).astype(np.uint64)
            paths = _d2h(p).astype(np.uint32)
            proofs = openings_from_paths(indices, paths, tree.depth,
                                         tree.kind)
            s_np = _d2h(s).astype(np.uint64) if s is not None else None
            return vals, proofs, s_np

        tr_vals, tr_proofs, tr_salts_np = materialize(trace_tree, trace_idx, tr_pend)
        q_vals, q_proofs, q_salts_np = materialize(quotient_tree, quot_idx, q_pend)
        d_vals, d_proofs, d_salts_np = materialize(fri_trees[0], deep_idx, d_pend)
        fri_done = [
            materialize(fri_trees[li], fri_idx[li - 1], f_pend[li - 1])
            for li in range(1, num_folds)
        ]

        def mk_open(indices, vals, proofs, salts_np, j):
            salt = (
                b"".join(int(w).to_bytes(4, "big") for w in salts_np[j])
                if salts_np is not None
                else b""
            )
            v = vals[j]
            value = tuple(int(x) for x in v) if np.ndim(v) else int(v)
            return MerkleOpening(indices[j], value, proofs[j], salt)

        query_proofs = []
        for q, qi in enumerate(query_indices):
            fri_openings = []
            for li in range(1, num_folds):
                vals, proofs, g_salts = fri_done[li - 1]
                fri_openings.append(
                    (mk_open(fri_idx[li - 1], vals, proofs, g_salts, 2 * q),
                     mk_open(fri_idx[li - 1], vals, proofs, g_salts, 2 * q + 1))
                )
            trace_ops = [
                mk_open(trace_idx, tr_vals, tr_proofs, tr_salts_np, ns * q + s)
                for s in range(ns)
            ]
            query_proofs.append(
                QueryProof(
                    index=qi,
                    deep_opening=mk_open(deep_idx, d_vals, d_proofs, d_salts_np, 2 * q),
                    deep_opening_pair=mk_open(deep_idx, d_vals, d_proofs, d_salts_np, 2 * q + 1),
                    trace_opening=None,
                    trace_opening_g=None,
                    trace_opening_gg=None,
                    quotient_opening=mk_open(quot_idx, q_vals, q_proofs, q_salts_np, q),
                    fri_openings=fri_openings,
                    trace_openings=trace_ops,
                )
            )

        return StarkProof(
            trace_len=n,
            lde_size=N,
            trace_commitment=trace_root,
            quotient_commitment=quotient_root,
            t_z=None,
            t_gz=None,
            t_ggz=None,
            q_z=q_z,
            fri_commitments=fri_commitments,
            fri_final_layer=fri_final_layer,
            query_proofs=query_proofs,
            ext=ext,
            ood_trace=ood_trace,
            num_columns=k,
            num_shifts=ns,
            hash=cfg.hash,
        )

    # ── main entry point ───────────────────────────────────────────────────

    def generate_proof(self) -> StarkProof:
        cfg = self.config
        n = self.trace.num_rows
        N = n * cfg.blowup
        domain = Domain.new(n)
        g = domain.group_gen()

        ext = cfg.ext_challenges
        fns = _phase_fns(
            n, N, n + cfg.mask_degree, cfg.blowup, cfg.coset_shift, self.air,
            ext, cfg.final_layer_size(n), cfg.num_queries, cfg.hash,
        )
        k = getattr(self.air, "num_columns", 1)
        nc = getattr(self.air, "num_constraints", 1)
        ns = self.air.num_shifts
        multi = "commit_trace" in fns
        if multi:
            return self._generate_proof_multi(fns, k, nc, ns, ext)

        # ── 1.+2. commit phases (fibonacci.rs:110-154), one fused program ─
        with profiling.phase("commit_core"):
            B = cfg.blowup
            m = cfg.mask_degree
            r_mask = jnp.asarray(
                self.rng.integers(0, P, m, dtype=np.uint64).astype(np.uint32)
            )
            trace_col = jnp.asarray(self.trace.columns[0].astype(np.uint32))
            assert domain.size == self.trace.num_rows
            trace_salts = self._layer_salts(N)
            quot_salts = self._layer_salts(N)
            out = fns["commit"](trace_col, r_mask, trace_salts, quot_salts, fns["tables"])
            trace_lde = out["trace_lde"]
            q_evals = out["q_evals"]
            x = fns["x"]
            from .merkle import prune_levels

            pruned = prune_levels(N, True)
            trace_tree = DeviceTree(out["trace_levels"], pruned=pruned,
                                    kind=cfg.hash)
            quotient_tree = DeviceTree(out["quot_levels"], pruned=pruned,
                                       kind=cfg.hash)
            trace_root = trace_tree.root()
            quotient_root = quotient_tree.root()

        # ── 3. Fiat-Shamir: derive OOD point z (fibonacci.rs:156-161) ─────
        transcript = Transcript()
        transcript.absorb_commitment(trace_root)
        transcript.absorb_commitment(quotient_root)

        if ext:
            from .field import ext as extf
            from .transcript import derive_z_ext

            z = derive_z_ext(transcript, N, cfg.coset_shift)

            with profiling.phase("ood_evals"):
                ood_vec, inv_xz = fns["ood_ext"](
                    trace_lde, q_evals, x, jnp.asarray(z, jnp.uint32)
                )
                ood_np = np.asarray(ood_vec, np.uint64)
                t_z, t_gz, t_ggz, q_z = (
                    tuple(int(v) for v in row) for row in ood_np
                )

            c_z = self.air.constraint_at_ext([t_z, t_gz, t_ggz], z, g, n)
            z_z = extf.h_sub(extf.h_pow(z, n), extf.H_ONE)
            if c_z != extf.h_mul(q_z, z_z):
                raise ValueError("Constraint check at z failed — invalid trace")

            for v in (t_z, t_gz, t_ggz, q_z):
                transcript.absorb_ext(v)

            with profiling.phase("deep"):
                d_evals = fns["deep_ext"](trace_lde, q_evals, inv_xz, ood_vec)
        else:
            z = derive_z(transcript, N, cfg.coset_shift)

            # ── 4. OOD evaluations (fibonacci.rs:163-183), barycentric from
            # the materialized eval vectors — O(N) with ONE inversion pass
            # shared by all four values and reused by DEEP below
            with profiling.phase("ood_evals"):
                ood_vec, inv_xz = fns["ood"](
                    trace_lde, q_evals, x, jnp.uint32(z)
                )
                ood_np = _d2h(ood_vec).astype(np.uint64)
                t_z, t_gz, t_ggz, q_z = (int(v) for v in ood_np)

            # Sanity: the constraint relation holds at z (the prover-side
            # check that fails loudly on an invalid trace, fibonacci.rs:169-177).
            c_z = self.air.constraint_at([t_z, t_gz, t_ggz], z, g, n)
            z_z = domain.eval_vanishing(z)
            if c_z != q_z * z_z % P:
                raise ValueError("Constraint check at z failed — invalid trace")

            for v in (t_z, t_gz, t_ggz, q_z):
                transcript.absorb_field(v)

            # ── 5. DEEP polynomial (fibonacci.rs:185-198) ─────────────────
            # All four quotients share the denominator (x - z), whose
            # inversion already happened in the OOD phase — reused here.
            with profiling.phase("deep"):
                d_evals = fns["deep"](trace_lde, q_evals, inv_xz, ood_vec)

        # ── 6. FRI folding with Merkle commits (fibonacci.rs:200-247) ─────
        # (inverse x-coordinates come from a closed-form power table squared
        # between layers — no Fermat inversions in the fold loop)
        final_size = cfg.final_layer_size(n)
        fri_layers, fri_trees, fri_salts, fri_commitments, fri_final_layer = (
            self._fri_phase(fns, d_evals, transcript, final_size, N, ext)
        )

        # ── 7. query phase (fibonacci.rs:249-295) ─────────────────────────
        # All openings are device gathers: sibling paths and opened values
        # come back in a handful of small transfers instead of full trees
        # (the reference walks host-resident levels, src/merkle.rs:50-80).
        half0 = N // 2
        query_indices = transcript.squeeze_indices(cfg.num_queries, half0)
        queries_timer = profiling.phase("queries")
        queries_timer.__enter__()

        num_folds = len(fri_layers) - 1

        # per-tree index lists (host int math, mirrors fibonacci.rs:255-294)
        trace_idx = []
        for qi in query_indices:
            trace_idx += [qi, (qi + B) % N, (qi + 2 * B) % N]
        quot_idx = list(query_indices)
        deep_idx = []
        for qi in query_indices:
            deep_idx += [qi, qi + half0]
        fri_idx = [[] for _ in range(1, num_folds)]
        for qi in query_indices:
            idx = qi
            for li in range(1, num_folds):
                half = fri_layers[li].shape[0] // 2
                idx = idx % half
                fri_idx[li - 1] += [idx, idx + half]

        def dispatch(tree, values, indices, salts, is_ext=False):
            """Enqueue the device gathers (no host sync)."""
            iarr = jnp.asarray(np.array(indices, np.int32))
            sfx = "_ext" if is_ext else ""
            if salts is not None:
                v, p, s = fns["gather_salted" + sfx](
                    tuple(tree.levels), values, salts, iarr
                )
            else:
                v, p = fns["gather" + sfx](tuple(tree.levels), values, iarr)
                s = None
            return v, p, s

        def materialize(tree, indices, vps):
            v, p, s = vps
            vals = _d2h(v).astype(np.uint64)
            paths = _d2h(p).astype(np.uint32)
            proofs = openings_from_paths(indices, paths, tree.depth,
                                         tree.kind)
            s_np = _d2h(s).astype(np.uint64) if s is not None else None
            return vals, proofs, s_np

        all_trees = [trace_tree, quotient_tree] + fri_trees[:num_folds]
        all_idx = [trace_idx, quot_idx, deep_idx] + fri_idx
        if "gather_all" in fns:
            # one dispatch + one transfer for the whole query phase
            all_vals = [trace_lde, q_evals] + fri_layers[:num_folds]
            all_salts = [trace_salts, quot_salts] + fri_salts[:num_folds]
            v_f, p_f, s_f = fns["gather_all"](
                tuple(tuple(t.levels) for t in all_trees),
                tuple(all_vals),
                tuple(all_salts),
                tuple(jnp.asarray(np.array(ix, np.int32)) for ix in all_idx),
            )
            parts = fns["split_gathered"](
                _d2h(v_f), _d2h(p_f), _d2h(s_f)
            )
            done = [
                (vals, openings_from_paths(idx, paths, tree.depth,
                                           tree.kind), s_np)
                for tree, idx, (vals, paths, s_np)
                in zip(all_trees, all_idx, parts)
            ]
        else:
            # per-tree gathers (fallback when the fused program is absent)
            pend = [
                (trace_tree, trace_idx, dispatch(trace_tree, trace_lde, trace_idx, trace_salts)),
                (quotient_tree, quot_idx, dispatch(quotient_tree, q_evals, quot_idx, quot_salts)),
                (fri_trees[0], deep_idx,
                 dispatch(fri_trees[0], fri_layers[0], deep_idx, fri_salts[0], ext)),
            ]
            for li in range(1, num_folds):
                pend.append(
                    (fri_trees[li], fri_idx[li - 1],
                     dispatch(fri_trees[li], fri_layers[li], fri_idx[li - 1],
                              fri_salts[li], ext))
                )
            done = [materialize(t, idx, vps) for (t, idx, vps) in pend]
        tr_vals, tr_proofs, tr_salts = done[0]
        q_vals, q_proofs, q_salts = done[1]
        d_vals, d_proofs, d_salts = done[2]
        fri_vals_proofs = done[3:]

        def mk_open(indices, vals, proofs, salts_np, k):
            salt = (
                b"".join(int(w).to_bytes(4, "big") for w in salts_np[k])
                if salts_np is not None
                else b""
            )
            v = vals[k]
            value = tuple(int(x) for x in v) if np.ndim(v) else int(v)
            return MerkleOpening(indices[k], value, proofs[k], salt)

        query_proofs = []
        for q, qi in enumerate(query_indices):
            fri_openings = []
            for li in range(1, num_folds):
                vals, proofs, g_salts = fri_vals_proofs[li - 1]
                op = mk_open(fri_idx[li - 1], vals, proofs, g_salts, 2 * q)
                op_pair = mk_open(fri_idx[li - 1], vals, proofs, g_salts, 2 * q + 1)
                fri_openings.append((op, op_pair))
            query_proofs.append(
                QueryProof(
                    index=qi,
                    deep_opening=mk_open(deep_idx, d_vals, d_proofs, d_salts, 2 * q),
                    deep_opening_pair=mk_open(deep_idx, d_vals, d_proofs, d_salts, 2 * q + 1),
                    trace_opening=mk_open(trace_idx, tr_vals, tr_proofs, tr_salts, 3 * q),
                    trace_opening_g=mk_open(trace_idx, tr_vals, tr_proofs, tr_salts, 3 * q + 1),
                    trace_opening_gg=mk_open(trace_idx, tr_vals, tr_proofs, tr_salts, 3 * q + 2),
                    quotient_opening=mk_open(quot_idx, q_vals, q_proofs, q_salts, q),
                    fri_openings=fri_openings,
                )
            )
        queries_timer.__exit__(None, None, None)

        return StarkProof(
            trace_len=n,
            lde_size=N,
            trace_commitment=trace_root,
            quotient_commitment=quotient_root,
            t_z=t_z,
            t_gz=t_gz,
            t_ggz=t_ggz,
            q_z=q_z,
            fri_commitments=fri_commitments,
            fri_final_layer=fri_final_layer,
            query_proofs=query_proofs,
            ext=ext,
            hash=cfg.hash,
        )
