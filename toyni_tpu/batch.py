"""Batched proving: B independent traces through one device dispatch stream.

The reference proves one trace at a time (its prover is a single sequential
function, src/fibonacci.rs:99-310). On a remote-attached TPU each proof pays
~15 host round trips for the transcript; those round trips are what dominate
small proofs. Batching amortizes them: every device phase (commit, OOD, DEEP,
each FRI fold, each tree build, the query gathers) runs once for the whole
batch with a leading (B, ...) axis, and the per-proof Fiat-Shamir transcripts
(which are inherently per-proof host state) consume one (B, ...)-shaped
transfer per phase instead of B separate ones.

Equivalence contract: `BatchStarkProver([t0..tB], seeds=[s0..sB])` produces
byte-identical proofs to `StarkProver(t_i, seed=s_i)` run sequentially — the
per-proof RNG draw order is replicated exactly (mask, then tree-salt keys in
commit/FRI layer order). Tests assert this equality.

Scope: every protocol shape — the reference shape, generic multi-column /
multi-constraint AIRs (`_generate_proofs_multi`), and the extension-field
soundness mode (`StarkConfig.ext_challenges`, via `_batch_ext_fns`'s vmapped
ext phases) in any combination. All traces in a batch share one AIR, config,
and trace length.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .air import Air, FibonacciAir
from .config import DEFAULT_CONFIG, StarkConfig
from .domain import Domain, _shift_tables
from .field import babybear as bb
from .field.babybear import P, MONT_R
from .merkle import openings_from_paths
from .merkle import _hash_backend
from .ops import sha256 as sha
from .ops.ntt import (
    ntt_batched,
    ntt_tables,
)
from .proof import MerkleOpening, QueryProof, StarkProof
from .prover import _xs_inv0_dev, _zh_inv_tile_dev
from .transcript import Transcript, derive_z
from . import profiling

_U32 = jnp.uint32


# ── batched transforms ──────────────────────────────────────────────────────

# `ntt_batched` lives in ops.ntt since round 2 (imported above) so the
# generic ntt() entry point and the batch prover share one batched dispatch.


def powers_traced_batched(base: jnp.ndarray, n: int, *, mont: bool = False):
    """(B,) traced bases -> (B, n) power tables (binary method)."""
    nbits = max(1, (n - 1).bit_length())
    idx = jnp.arange(n, dtype=_U32)[None, :]
    result = jnp.full((base.shape[0], n), MONT_R % P, _U32)
    sq = jnp.broadcast_to(bb.to_mont(base)[:, None], result.shape)
    for b in range(nbits):
        bit = (idx >> _U32(b)) & _U32(1)
        result = jnp.where(bit == 1, bb.mont_mul(result, sq), result)
        if b + 1 < nbits:
            sq = bb.mont_mul(sq, sq)
    return result if mont else bb.from_mont(result)


def _device_levels_batched(leaf_digests: jnp.ndarray,
                           kind: str = "sha256") -> list:
    """(B, n, 8) leaf digests -> all tree levels, batched over axis 0."""
    from .merkle import _hash_backend

    h = _hash_backend(kind)
    levels = [leaf_digests]
    cur = leaf_digests
    while cur.shape[1] > 1:
        cur = h.hash_nodes(cur[:, 0::2], cur[:, 1::2])
        levels.append(cur)
    return levels


def _fold_batched(current, xs_inv, betas):
    """(B, n) codewords, shared xs_inv (n/2,), per-proof betas (B,)."""
    from .ops.fri import _HALF_INV_MONT

    half = current.shape[1] // 2
    a = current[:, :half]
    b = current[:, half:]
    avg = bb.mont_mul(bb.add(a, b), _U32(_HALF_INV_MONT))
    diff = bb.mont_mul(bb.sub(a, b), _U32(_HALF_INV_MONT))
    odd = bb.mont_mul(bb.mul(diff, betas[:, None]), xs_inv[None, :half])
    return bb.add(avg, odd), bb.mont_mul(xs_inv[:half], xs_inv[:half])


@functools.lru_cache(maxsize=8)
def _batch_ext_fns(blowup: int, ns: int, k: int, hash_kind: str = "sha256"):
    """Jitted batched extension-field phases: the single-proof ext functions
    of prover._phase_fns lifted over the batch axis with `jax.vmap` (the
    codeword/beta/z arrays gain a leading (B,); domain tables stay shared).
    Keyed on (blowup, ns, k) — shapes specialize at trace time."""
    from .merkle import _hash_backend

    # hash backend for every committed tree; `sha` is the historical local
    # name (binds SHA-256 or Poseidon2 — same entry-point surface)
    sha = _hash_backend(hash_kind)

    def _device_levels_b(leaves):
        return _device_levels_batched(leaves, hash_kind)
    from .field import ext as extf
    from .ops.fri import fri_fold_ext

    def ood_one(that, q_coeffs, z4, gz4, ggz4):
        return jnp.stack(
            [
                extf.eval_poly_base_coeffs(that, z4),
                extf.eval_poly_base_coeffs(that, gz4),
                extf.eval_poly_base_coeffs(that, ggz4),
                extf.eval_poly_base_coeffs(q_coeffs, z4),
            ]
        )  # (4, 4)

    def deep_one(trace_lde, q_evals, x, ood, z4):
        base_sum = bb.add(
            bb.add(q_evals, jnp.roll(trace_lde, -2 * blowup)),
            bb.add(jnp.roll(trace_lde, -blowup), trace_lde),
        )
        ood_sum = bb.sum_mod(ood, axis=0)
        zero = jnp.zeros_like(base_sum)
        num = jnp.stack(
            [bb.sub(base_sum, ood_sum[0])]
            + [bb.sub(zero, ood_sum[j]) for j in (1, 2, 3)],
            axis=-1,
        )
        x_minus_z = jnp.stack(
            [bb.sub(x, z4[0])]
            + [bb.sub(zero, z4[j]) for j in (1, 2, 3)],
            axis=-1,
        )
        return extf.mul(num, extf.inv_fast(x_minus_z))

    def ood_multi_one(that, q_coeffs, pts):
        """that (k, L), pts (ns, 4) -> (ns*k + 1, 4)."""
        rows = []
        for s in range(ns):
            for c in range(k):
                rows.append(extf.eval_poly_base_coeffs(that[c], pts[s]))
        rows.append(extf.eval_poly_base_coeffs(q_coeffs, pts[0]))
        return jnp.stack(rows)

    def deep_multi_one(trace_lde, q_evals, x, ood, z4):
        base_sum = q_evals
        for s in range(ns):
            rolled = jnp.roll(trace_lde, -s * blowup, axis=1)
            for c in range(k):
                base_sum = bb.add(base_sum, rolled[c])
        ood_sum = bb.sum_mod(ood, axis=0)
        zero = jnp.zeros_like(base_sum)
        num = jnp.stack(
            [bb.sub(base_sum, ood_sum[0])]
            + [bb.sub(zero, ood_sum[j]) for j in (1, 2, 3)],
            axis=-1,
        )
        x_minus_z = jnp.stack(
            [bb.sub(x, z4[0])]
            + [bb.sub(zero, z4[j]) for j in (1, 2, 3)],
            axis=-1,
        )
        return extf.mul(num, extf.inv_fast(x_minus_z))

    def fold_ext_b(current, xs_inv, betas):
        """(B, n, 4) ext codewords, shared xs_inv (n/2,), betas (B, 4)."""
        half = current.shape[1] // 2
        folded = jax.vmap(fri_fold_ext, in_axes=(0, None, 0))(
            current, xs_inv[:half], betas
        )
        return folded, bb.mont_mul(xs_inv[:half], xs_inv[:half])

    def build_salted_ext(values, salts):
        return _device_levels_b(
            sha.hash_salted_leaves_ext(values, salts)
        )

    def build_unsalted_ext(values):
        return _device_levels_b(sha.hash_unsalted_leaves_ext(values))

    def gather_salted_ext(levels, values, salts, idx):
        vals = jnp.take_along_axis(values, idx[..., None], axis=1)  # (B,Q,4)
        return (vals, _extract_paths_batched(levels, idx),
                jnp.take_along_axis(salts, idx[..., None], axis=1))

    return dict(
        ood_ext=jax.jit(jax.vmap(ood_one)),
        deep_ext=jax.jit(jax.vmap(deep_one, in_axes=(0, 0, None, 0, 0))),
        ood_multi_ext=jax.jit(jax.vmap(ood_multi_one)),
        deep_multi_ext=jax.jit(
            jax.vmap(deep_multi_one, in_axes=(0, 0, None, 0, 0))
        ),
        fold_ext=jax.jit(fold_ext_b),
        build_salted_ext=jax.jit(build_salted_ext),
        build_unsalted_ext=jax.jit(build_unsalted_ext),
        gather_salted_ext=jax.jit(gather_salted_ext),
    )


def _extract_paths_batched(levels: list, indices: jnp.ndarray) -> jnp.ndarray:
    """levels: (B, n_i, 8); indices: (B, Q) -> (B, Q, depth, 8) sibling
    digests bottom-up."""
    idx = jnp.asarray(indices, jnp.int32)
    out = []
    for level in levels[:-1]:
        sib = (idx ^ 1)[..., None]
        out.append(jnp.take_along_axis(level, sib, axis=1))
        idx = idx >> 1
    return jnp.stack(out, axis=2)


@functools.lru_cache(maxsize=8)
def _batch_fns_multi(Bsz: int, n: int, N: int, L: int, blowup: int,
                     coset_shift: int, air, hash_kind: str = "sha256"):
    """Jitted batched phases for generic (k columns, nc constraints,
    ns shifts) AIRs — the batch analog of prover._phase_fns' multi branch.

    Batch layout notes: trace arrays carry a leading (B,) axis; the AIR's
    `constraint_lde` is reused UNCHANGED by shaping its inputs so the
    interface contract still holds elementwise — trace views are passed as
    (k, B, N) (so t[s][c] is the (B, N) eval array of column c) and the
    per-proof composition alphas as (B, 1) columns, which broadcast exactly
    like the traced scalars of the single-proof path."""
    from .merkle import _hash_backend

    # hash backend for every committed tree; `sha` is the historical local
    # name (binds SHA-256 or Poseidon2 — same entry-point surface)
    sha = _hash_backend(hash_kind)

    def _device_levels_b(leaves):
        return _device_levels_batched(leaves, hash_kind)
    domain = Domain.new(n)
    shifted = Domain.new(N).get_coset(coset_shift)
    g = domain.group_gen()
    m = L - n
    k = getattr(air, "num_columns", 1)
    nc = getattr(air, "num_constraints", 1)
    ns = air.num_shifts
    inv_om_n = pow(domain.omega, P - 2, P)
    inv_om_N = pow(shifted.omega, P - 2, P)
    shift_fwd, shift_bwd = _shift_tables(N, coset_shift)
    n_inv = pow(n, P - 2, P)
    N_inv = pow(N, P - 2, P)

    tables = dict(
        trace_intt=ntt_tables(n, inv_om_n),
        fft=ntt_tables(N, shifted.omega),
        ifft=ntt_tables(N, inv_om_N),
        shift_fwd=shift_fwd,
        shift_bwd=shift_bwd,
        zh_tile=_zh_inv_tile_dev(n, N, coset_shift, shifted.omega),
        x=shifted.elements(),
    )

    def commit_trace(trace_cols, r_masks, trace_salts, tb):
        """(B, k, n) columns -> (B, k, L) thats, (B, k, N) LDEs, row-bundle
        tree levels (leaf = salt || v_0 || ... || v_{k-1})."""
        flat = trace_cols.reshape(Bsz * k, n)
        t_coeffs = bb.mul_const(ntt_batched(flat, tb["trace_intt"], n), n_inv)
        t_pad = jnp.pad(t_coeffs, ((0, 0), (0, L - n)))
        rm = r_masks.reshape(Bsz * k, m)
        r_low = jnp.pad(rm, ((0, 0), (0, L - m)))
        r_shift = jnp.pad(rm, ((0, 0), (n, L - m - n)))
        that = bb.add(t_pad, bb.sub(r_shift, r_low))
        padded = jnp.pad(that, ((0, 0), (0, N - L)))
        lde = ntt_batched(
            bb.mont_mul(padded, tb["shift_fwd"][None, :]), tb["fft"], N
        )
        that = that.reshape(Bsz, k, L)
        lde = lde.reshape(Bsz, k, N)
        leaf = jax.vmap(sha.hash_salted_leaves_multi)(lde, trace_salts)
        return dict(
            that=that, trace_lde=lde,
            trace_levels=_device_levels_b(leaf),
        )

    def commit_quot(trace_lde, quot_salts, alphas, tb):
        t_views = [
            jnp.roll(trace_lde, -s * blowup, axis=2) for s in range(ns)
        ]
        if k == 1:
            t_views = [v[:, 0] for v in t_views]         # (B, N)
        else:
            t_views = [jnp.swapaxes(v, 0, 1) for v in t_views]  # (k, B, N)
        if nc > 1:
            al = tuple(alphas[:, j:j + 1] for j in range(nc))
            c_evals = air.constraint_lde(t_views, tb["x"][None, :], g, n, al)
        else:
            c_evals = air.constraint_lde(t_views, tb["x"][None, :], g, n)
        q_evals = bb.mont_mul(c_evals, tb["zh_tile"][None, :])
        q_coeffs = bb.mont_mul(
            bb.mul_const(ntt_batched(q_evals, tb["ifft"], N), N_inv),
            tb["shift_bwd"][None, :],
        )
        return dict(
            q_evals=q_evals, q_coeffs=q_coeffs,
            quot_levels=_device_levels_b(
                sha.hash_salted_leaves(q_evals, quot_salts)
            ),
        )

    def ood_multi(that, q_coeffs, pts):
        """that (B, k, L), pts (B, ns) -> (B, ns*k + 1) OOD values,
        shift-major column-minor, quotient-at-z last."""
        rows = []
        for s in range(ns):
            pw = powers_traced_batched(pts[:, s], L, mont=True)
            for c in range(k):
                rows.append(
                    bb.sum_mod(bb.mont_mul(that[:, c], pw), axis=1)
                )
        pw_n = powers_traced_batched(pts[:, 0], N, mont=True)
        rows.append(bb.sum_mod(bb.mont_mul(q_coeffs, pw_n), axis=1))
        return jnp.stack(rows, axis=1)

    def deep_multi(trace_lde, q_evals, x, ood, z):
        num = bb.sub(q_evals, ood[:, ns * k:ns * k + 1])
        for s in range(ns):
            rolled = jnp.roll(trace_lde, -s * blowup, axis=2)
            for c in range(k):
                num = bb.add(
                    num, bb.sub(rolled[:, c], ood[:, s * k + c:s * k + c + 1])
                )
        return bb.mul(num, bb.inv(bb.sub(x[None, :], z[:, None])))

    def build_salted(values, salts):
        return _device_levels_b(sha.hash_salted_leaves(values, salts))

    def build_unsalted(values):
        return _device_levels_b(sha.hash_unsalted_leaves(values))

    def gather_salted(levels, values, salts, idx):
        vals = jnp.take_along_axis(values, idx, axis=1)
        return (vals, _extract_paths_batched(levels, idx),
                jnp.take_along_axis(salts, idx[..., None], axis=1))

    def gather_salted_multi(levels, values, salts, idx):
        """values (B, k, N): open the k-value row bundle at each index."""
        vals = jnp.swapaxes(
            jnp.take_along_axis(values, idx[:, None, :], axis=2), 1, 2
        )  # (B, Q, k)
        return (vals, _extract_paths_batched(levels, idx),
                jnp.take_along_axis(salts, idx[..., None], axis=1))

    return dict(
        commit_trace=jax.jit(commit_trace),
        commit_quot=jax.jit(commit_quot),
        ood=jax.jit(ood_multi),
        deep=jax.jit(deep_multi),
        fold=jax.jit(_fold_batched),
        build_salted=jax.jit(build_salted),
        build_unsalted=jax.jit(build_unsalted),
        gather_salted=jax.jit(gather_salted),
        gather_salted_multi=jax.jit(gather_salted_multi),
        x=tables["x"],
        tables=tables,
    )


@functools.lru_cache(maxsize=8)
def _batch_fns(Bsz: int, n: int, N: int, L: int, blowup: int,
               coset_shift: int, air, hash_kind: str = "sha256"):
    """Jitted batched phases for (batch size, trace length)."""
    from .merkle import _hash_backend

    # hash backend for every committed tree; `sha` is the historical local
    # name (binds SHA-256 or Poseidon2 — same entry-point surface)
    sha = _hash_backend(hash_kind)

    def _device_levels_b(leaves):
        return _device_levels_batched(leaves, hash_kind)
    domain = Domain.new(n)
    shifted = Domain.new(N).get_coset(coset_shift)
    g = domain.group_gen()
    m = L - n
    inv_om_n = pow(domain.omega, P - 2, P)
    inv_om_N = pow(shifted.omega, P - 2, P)
    shift_fwd, shift_bwd = _shift_tables(N, coset_shift)
    n_inv = pow(n, P - 2, P)
    N_inv = pow(N, P - 2, P)

    tables = dict(
        trace_intt=ntt_tables(n, inv_om_n),
        fft=ntt_tables(N, shifted.omega),
        ifft=ntt_tables(N, inv_om_N),
        shift_fwd=shift_fwd,
        shift_bwd=shift_bwd,
        zh_tile=_zh_inv_tile_dev(n, N, coset_shift, shifted.omega),
        x=shifted.elements(),
    )

    def commit(trace_cols, r_masks, trace_salts, quot_salts, tb):
        """(B, n) columns -> masked LDEs, quotient, both tree level stacks."""
        t_coeffs = bb.mul_const(ntt_batched(trace_cols, tb["trace_intt"], n), n_inv)
        t_pad = jnp.pad(t_coeffs, ((0, 0), (0, L - n)))
        r_low = jnp.pad(r_masks, ((0, 0), (0, L - m)))
        r_shift = jnp.pad(r_masks, ((0, 0), (n, L - m - n)))
        that = bb.add(t_pad, bb.sub(r_shift, r_low))

        padded = jnp.pad(that, ((0, 0), (0, N - L)))
        trace_lde = ntt_batched(
            bb.mont_mul(padded, tb["shift_fwd"][None, :]), tb["fft"], N
        )
        trace_levels = _device_levels_b(
            sha.hash_salted_leaves(trace_lde, trace_salts)
        )

        t_rolls = [
            jnp.roll(trace_lde, -s * blowup, axis=1)
            for s in range(air.num_shifts)
        ]
        c_evals = air.constraint_lde(t_rolls, tb["x"][None, :], g, n)
        q_evals = bb.mont_mul(c_evals, tb["zh_tile"][None, :])
        q_coeffs = bb.mont_mul(
            bb.mul_const(ntt_batched(q_evals, tb["ifft"], N), N_inv),
            tb["shift_bwd"][None, :],
        )
        quot_levels = _device_levels_b(
            sha.hash_salted_leaves(q_evals, quot_salts)
        )
        return dict(
            that=that, trace_lde=trace_lde, q_evals=q_evals,
            q_coeffs=q_coeffs, trace_levels=trace_levels,
            quot_levels=quot_levels,
        )

    def ood4(that, q_coeffs, z, gz, ggz):
        def ev(coeffs, pts, ln):
            pw = powers_traced_batched(pts, ln, mont=True)
            return bb.sum_mod(bb.mont_mul(coeffs, pw), axis=1)

        return jnp.stack(
            [ev(that, z, L), ev(that, gz, L), ev(that, ggz, L),
             ev(q_coeffs, z, N)],
            axis=1,
        )  # (B, 4)

    def deep(trace_lde, q_evals, x, ood, z):
        num = bb.sub(q_evals, ood[:, 3:4])
        num = bb.add(num, bb.sub(jnp.roll(trace_lde, -2 * blowup, axis=1), ood[:, 2:3]))
        num = bb.add(num, bb.sub(jnp.roll(trace_lde, -blowup, axis=1), ood[:, 1:2]))
        num = bb.add(num, bb.sub(trace_lde, ood[:, 0:1]))
        return bb.mul(num, bb.inv(bb.sub(x[None, :], z[:, None])))

    def build_salted(values, salts):
        return _device_levels_b(sha.hash_salted_leaves(values, salts))

    def build_unsalted(values):
        return _device_levels_b(sha.hash_unsalted_leaves(values))

    def gather_salted(levels, values, salts, idx):
        vals = jnp.take_along_axis(values, idx, axis=1)
        paths = _extract_paths_batched(levels, idx)
        s = jnp.take_along_axis(salts, idx[..., None], axis=1)
        return vals, paths, s

    def gather_plain(levels, values, idx):
        vals = jnp.take_along_axis(values, idx, axis=1)
        return vals, _extract_paths_batched(levels, idx)

    return dict(
        commit=jax.jit(commit),
        ood=jax.jit(ood4),
        deep=jax.jit(deep),
        fold=jax.jit(_fold_batched),
        build_salted=jax.jit(build_salted),
        build_unsalted=jax.jit(build_unsalted),
        gather_salted=jax.jit(gather_salted),
        gather_plain=jax.jit(gather_plain),
        x=tables["x"],
        tables=tables,
    )


class BatchStarkProver:
    """Prove B same-length traces at once; see module docstring."""

    def __init__(self, traces, air: Air | None = None,
                 config: StarkConfig = DEFAULT_CONFIG, seeds=None):
        assert traces, "empty batch"
        self.traces = traces
        self.air = air or _DEFAULT_AIR
        self.config = config
        B = len(traces)
        if seeds is None:
            seeds = [None] * B
        assert len(seeds) == B
        self.rngs = [np.random.default_rng(s) for s in seeds]
        n0 = traces[0].num_rows
        assert all(t.num_rows == n0 for t in traces), \
            "batch traces must share one length"

    def _salts(self, i: int, n: int) -> jnp.ndarray:
        """Identical construction (and rng draw order) to
        StarkProver._salts, per batch member — including the Poseidon2
        field-range masking (byte-identity needs the exact same salts)."""
        key = jax.random.PRNGKey(int(self.rngs[i].integers(0, 2**63)))
        bits = jax.random.bits(key, (n, 4), dtype=jnp.uint32)
        if self.config.hash != "sha256":
            bits = bits & jnp.uint32(0x7FFFFFFF)
            bits = jnp.where(bits >= jnp.uint32(P), bits - jnp.uint32(P),
                             bits)
        return bits

    def generate_proofs(self) -> list:
        cfg = self.config
        ext = cfg.ext_challenges
        k = getattr(self.air, "num_columns", 1)
        nc = getattr(self.air, "num_constraints", 1)
        ns = self.air.num_shifts
        if k > 1 or nc > 1 or ns != 3:
            return self._generate_proofs_multi(k, nc, ns)
        B = len(self.traces)
        n = self.traces[0].num_rows
        N = n * cfg.blowup
        L = n + cfg.mask_degree
        m = cfg.mask_degree
        domain = Domain.new(n)
        g = domain.group_gen()
        blow = cfg.blowup

        fns = _batch_fns(B, n, N, L, blow, cfg.coset_shift, self.air,
                         cfg.hash)
        if ext:
            efns = _batch_ext_fns(blow, ns, k, cfg.hash)

        # ── commit (one dispatch for the whole batch) ─────────────────────
        with profiling.phase("batch_commit"):
            r_masks = jnp.asarray(
                np.stack([
                    r.integers(0, P, m, dtype=np.uint64).astype(np.uint32)
                    for r in self.rngs
                ])
            )
            trace_cols = jnp.asarray(
                np.stack([t.columns[0].astype(np.uint32) for t in self.traces])
            )
            trace_salts = jnp.stack([self._salts(i, N) for i in range(B)])
            quot_salts = jnp.stack([self._salts(i, N) for i in range(B)])
            out = fns["commit"](trace_cols, r_masks, trace_salts, quot_salts,
                                fns["tables"])
            trace_levels = out["trace_levels"]
            quot_levels = out["quot_levels"]
            trace_roots = np.asarray(trace_levels[-1], np.uint32)  # (B, 1, 8)
            quot_roots = np.asarray(quot_levels[-1], np.uint32)

        transcripts = [Transcript() for _ in range(B)]
        trace_root_b = [_hash_backend(cfg.hash).digest_bytes(trace_roots[i, 0]) for i in range(B)]
        quot_root_b = [_hash_backend(cfg.hash).digest_bytes(quot_roots[i, 0]) for i in range(B)]
        for i, tr in enumerate(transcripts):
            tr.absorb_commitment(trace_root_b[i])
            tr.absorb_commitment(quot_root_b[i])
        if ext:
            from .field import ext as extf
            from .transcript import derive_z_ext

            zs_h = [derive_z_ext(tr, N, cfg.coset_shift) for tr in transcripts]
            zs = np.array(zs_h, np.uint32)                        # (B, 4)
            gzs = np.array(
                [extf.h_mul_base(z, g) for z in zs_h], np.uint32
            )
            ggzs = np.array(
                [extf.h_mul_base(z, g * g % P) for z in zs_h], np.uint32
            )
            with profiling.phase("batch_ood"):
                ood = efns["ood_ext"](out["that"], out["q_coeffs"],
                                      jnp.asarray(zs), jnp.asarray(gzs),
                                      jnp.asarray(ggzs))
                ood_np = np.asarray(ood, np.uint64)               # (B, 4, 4)
            ood_rows = []
            for i in range(B):
                t_z, t_gz, t_ggz, q_z = (
                    tuple(int(v) for v in row) for row in ood_np[i]
                )
                c_z = self.air.constraint_at_ext(
                    [t_z, t_gz, t_ggz], zs_h[i], g, n
                )
                z_z = extf.h_sub(extf.h_pow(zs_h[i], n), extf.H_ONE)
                if c_z != extf.h_mul(q_z, z_z):
                    raise ValueError(
                        f"Constraint check at z failed for batch member {i}"
                    )
                for v in (t_z, t_gz, t_ggz, q_z):
                    transcripts[i].absorb_ext(v)
                ood_rows.append((t_z, t_gz, t_ggz, q_z))
            with profiling.phase("batch_deep"):
                d_evals = efns["deep_ext"](
                    out["trace_lde"], out["q_evals"], fns["x"], ood,
                    jnp.asarray(zs),
                )  # (B, N, 4)
        else:
            zs = np.array(
                [derive_z(tr, N, cfg.coset_shift) for tr in transcripts],
                np.uint32,
            )

            # ── OOD (one dispatch) ────────────────────────────────────────
            with profiling.phase("batch_ood"):
                gz = (np.uint64(g) * zs % np.uint64(P)).astype(np.uint32)
                ggz = (np.uint64(g) * np.uint64(g) % np.uint64(P) * zs
                       % np.uint64(P)).astype(np.uint32)
                ood = fns["ood"](out["that"], out["q_coeffs"], jnp.asarray(zs),
                                 jnp.asarray(gz), jnp.asarray(ggz))
                ood_np = np.asarray(ood, np.uint64)  # (B, 4)

            ood_rows = []
            for i in range(B):
                t_z, t_gz, t_ggz, q_z = (int(v) for v in ood_np[i])
                c_z = self.air.constraint_at([t_z, t_gz, t_ggz], int(zs[i]), g, n)
                z_z = domain.eval_vanishing(int(zs[i]))
                if c_z != q_z * z_z % P:
                    raise ValueError(
                        f"Constraint check at z failed for batch member {i}"
                    )
                for v in (t_z, t_gz, t_ggz, q_z):
                    transcripts[i].absorb_field(v)
                ood_rows.append((t_z, t_gz, t_ggz, q_z))

            # ── DEEP + FRI ────────────────────────────────────────────────
            with profiling.phase("batch_deep"):
                d_evals = fns["deep"](out["trace_lde"], out["q_evals"],
                                      fns["x"], ood, jnp.asarray(zs))

        final_size = cfg.final_layer_size(n)
        fri_layers = [d_evals]
        fri_levels = []
        fri_salts = []
        fri_commitments = [[] for _ in range(B)]

        build_salted = efns["build_salted_ext"] if ext else fns["build_salted"]
        build_unsalted = (
            efns["build_unsalted_ext"] if ext else fns["build_unsalted"]
        )
        fold = efns["fold_ext"] if ext else fns["fold"]

        salts0 = jnp.stack([self._salts(i, N) for i in range(B)])
        levels0 = build_salted(d_evals, salts0)
        roots0 = np.asarray(levels0[-1], np.uint32)
        for i in range(B):
            root = _hash_backend(cfg.hash).digest_bytes(roots0[i, 0])
            transcripts[i].absorb_commitment(root)
            fri_commitments[i].append(root)
        fri_levels.append(levels0)
        fri_salts.append(salts0)

        xs_inv = _xs_inv0_dev(N, cfg.coset_shift, Domain.new(N).get_coset(cfg.coset_shift).omega)
        current = d_evals
        while current.shape[1] > final_size:
            if ext:
                betas = np.array(
                    [tr.squeeze_ext_challenge() for tr in transcripts],
                    np.uint32,
                )  # (B, 4)
            else:
                betas = np.array(
                    [tr.squeeze_challenge() for tr in transcripts], np.uint32
                )
            current, xs_inv = fold(current, xs_inv, jnp.asarray(betas))
            fri_layers.append(current)
            if current.shape[1] == final_size:
                levels = build_unsalted(current)
                salts = None
            else:
                salts = jnp.stack([self._salts(i, current.shape[1]) for i in range(B)])
                levels = build_salted(current, salts)
            roots = np.asarray(levels[-1], np.uint32)
            for i in range(B):
                root = _hash_backend(cfg.hash).digest_bytes(roots[i, 0])
                transcripts[i].absorb_commitment(root)
                fri_commitments[i].append(root)
            fri_levels.append(levels)
            fri_salts.append(salts)

        final_np = np.asarray(current, np.uint64)  # (B, final[, 4])

        # ── queries (per-proof indices, batched gathers) ──────────────────
        half0 = N // 2
        num_folds = len(fri_layers) - 1
        query_indices = [
            tr.squeeze_indices(cfg.num_queries, half0) for tr in transcripts
        ]

        trace_idx = np.array(
            [[v for qi in qs for v in (qi, (qi + blow) % N, (qi + 2 * blow) % N)]
             for qs in query_indices], np.int32)
        quot_idx = np.array(query_indices, np.int32)
        deep_idx = np.array(
            [[v for qi in qs for v in (qi, qi + half0)] for qs in query_indices],
            np.int32)
        fri_idx = []
        for li in range(1, num_folds):
            rows = []
            for qs in query_indices:
                row = []
                for qi in qs:
                    idx = qi
                    for lj in range(1, li + 1):
                        idx = idx % (fri_layers[lj].shape[1] // 2)
                    row += [idx, idx + fri_layers[li].shape[1] // 2]
                rows.append(row)
            fri_idx.append(np.array(rows, np.int32))

        gather_fri = efns["gather_salted_ext"] if ext else fns["gather_salted"]
        pend = [
            fns["gather_salted"](tuple(trace_levels), out["trace_lde"],
                                 trace_salts, jnp.asarray(trace_idx)),
            fns["gather_salted"](tuple(quot_levels), out["q_evals"],
                                 quot_salts, jnp.asarray(quot_idx)),
            gather_fri(tuple(fri_levels[0]), fri_layers[0],
                       fri_salts[0], jnp.asarray(deep_idx)),
        ]
        for li in range(1, num_folds):
            pend.append(
                gather_fri(tuple(fri_levels[li]), fri_layers[li],
                           fri_salts[li], jnp.asarray(fri_idx[li - 1]))
            )

        def materialize(vps):
            v, p, s = vps
            return (np.asarray(v, np.uint64), np.asarray(p, np.uint32),
                    np.asarray(s, np.uint64) if s is not None else None)

        done = [materialize(vps) for vps in pend]

        proofs = []
        for i in range(B):
            def mk_open(indices, vals, paths, salts_np, j, depth):
                prf = openings_from_paths(
                    [indices[i][j]], paths[i][j:j + 1], depth, cfg.hash
                )[0]
                salt = (
                    b"".join(int(w).to_bytes(4, "big") for w in salts_np[i][j])
                    if salts_np is not None else b""
                )
                v = vals[i][j]
                value = tuple(int(x) for x in v) if np.ndim(v) else int(v)
                return MerkleOpening(int(indices[i][j]), value, prf, salt)

            tr_vals, tr_paths, tr_salts = done[0]
            q_vals, q_paths, q_salts = done[1]
            d_vals, d_paths, d_salts = done[2]
            depth0 = len(trace_levels) - 1
            query_proofs = []
            for q, qi in enumerate(query_indices[i]):
                fri_ops = []
                for li in range(1, num_folds):
                    f_vals, f_paths, f_salts = done[2 + li]
                    dep = len(fri_levels[li]) - 1
                    fri_ops.append(
                        (mk_open(fri_idx[li - 1], f_vals, f_paths, f_salts, 2 * q, dep),
                         mk_open(fri_idx[li - 1], f_vals, f_paths, f_salts, 2 * q + 1, dep))
                    )
                query_proofs.append(
                    QueryProof(
                        index=qi,
                        deep_opening=mk_open(deep_idx, d_vals, d_paths, d_salts, 2 * q, len(fri_levels[0]) - 1),
                        deep_opening_pair=mk_open(deep_idx, d_vals, d_paths, d_salts, 2 * q + 1, len(fri_levels[0]) - 1),
                        trace_opening=mk_open(trace_idx, tr_vals, tr_paths, tr_salts, 3 * q, depth0),
                        trace_opening_g=mk_open(trace_idx, tr_vals, tr_paths, tr_salts, 3 * q + 1, depth0),
                        trace_opening_gg=mk_open(trace_idx, tr_vals, tr_paths, tr_salts, 3 * q + 2, depth0),
                        quotient_opening=mk_open(quot_idx, q_vals, q_paths, q_salts, q, len(quot_levels) - 1),
                        fri_openings=fri_ops,
                    )
                )
            t_z, t_gz, t_ggz, q_z = ood_rows[i]
            if ext:
                final = [
                    tuple(int(v) for v in row) for row in final_np[i]
                ]
            else:
                final = [int(v) for v in final_np[i]]
            proofs.append(
                StarkProof(
                    trace_len=n,
                    lde_size=N,
                    trace_commitment=trace_root_b[i],
                    quotient_commitment=quot_root_b[i],
                    t_z=t_z, t_gz=t_gz, t_ggz=t_ggz, q_z=q_z,
                    fri_commitments=fri_commitments[i],
                    fri_final_layer=final,
                    query_proofs=query_proofs,
                    ext=ext,
                    hash=cfg.hash,
                )
            )
        return proofs


    def _generate_proofs_multi(self, k: int, nc: int, ns: int) -> list:
        """Batched generic-AIR path (k columns / nc composed constraints /
        ns shifts): the batch analog of StarkProver._generate_proof_multi,
        byte-identical to it per member for equal seeds. The commit phase is
        two dispatches per batch (trace, then quotient) because the
        composition alphas are Fiat-Shamir outputs of the trace roots."""
        cfg = self.config
        B = len(self.traces)
        n = self.traces[0].num_rows
        N = n * cfg.blowup
        L = n + cfg.mask_degree
        m = cfg.mask_degree
        domain = Domain.new(n)
        g = domain.group_gen()
        blow = cfg.blowup
        ext = cfg.ext_challenges

        fns = _batch_fns_multi(B, n, N, L, blow, cfg.coset_shift,
                               self.air, cfg.hash)
        if ext:
            efns = _batch_ext_fns(blow, ns, k, cfg.hash)

        # ── trace commit (one dispatch) ───────────────────────────────────
        with profiling.phase("batch_commit_trace"):
            r_masks = jnp.asarray(
                np.stack([
                    r.integers(0, P, (k, m), dtype=np.uint64).astype(np.uint32)
                    for r in self.rngs
                ])
            )
            trace_cols = jnp.asarray(
                np.stack([
                    np.stack(t.columns).astype(np.uint32) for t in self.traces
                ])
            )
            assert trace_cols.shape == (B, k, n)
            trace_salts = jnp.stack([self._salts(i, N) for i in range(B)])
            quot_salts = jnp.stack([self._salts(i, N) for i in range(B)])
            out1 = fns["commit_trace"](trace_cols, r_masks, trace_salts,
                                       fns["tables"])
            trace_levels = out1["trace_levels"]
            trace_roots = np.asarray(trace_levels[-1], np.uint32)

        transcripts = [Transcript() for _ in range(B)]
        trace_root_b = [_hash_backend(cfg.hash).digest_bytes(trace_roots[i, 0]) for i in range(B)]
        alphas = []
        for i, tr in enumerate(transcripts):
            tr.absorb_commitment(trace_root_b[i])
            alphas.append(
                tuple(tr.squeeze_challenge() for _ in range(nc))
                if nc > 1 else ()
            )

        # ── quotient commit (alphas are transcript outputs) ───────────────
        with profiling.phase("batch_commit_quot"):
            out2 = fns["commit_quot"](
                out1["trace_lde"], quot_salts,
                jnp.asarray(np.array(alphas, np.uint32).reshape(B, -1)),
                fns["tables"],
            )
            quot_levels = out2["quot_levels"]
            quot_roots = np.asarray(quot_levels[-1], np.uint32)
        quot_root_b = [_hash_backend(cfg.hash).digest_bytes(quot_roots[i, 0]) for i in range(B)]
        for i, tr in enumerate(transcripts):
            tr.absorb_commitment(quot_root_b[i])

        if ext:
            from .field import ext as extf
            from .transcript import derive_z_ext

            zs_h = [derive_z_ext(tr, N, cfg.coset_shift) for tr in transcripts]
            zs = np.array(zs_h, np.uint32)  # (B, 4)
            pts = np.stack([
                np.array(
                    [extf.h_mul_base(z, pow(g, s, P)) for s in range(ns)],
                    np.uint32,
                )
                for z in zs_h
            ])  # (B, ns, 4)
            with profiling.phase("batch_ood"):
                ood = efns["ood_multi_ext"](out1["that"], out2["q_coeffs"],
                                            jnp.asarray(pts))
                ood_np = np.asarray(ood, np.uint64)  # (B, ns*k+1, 4)
        else:
            zs = np.array(
                [derive_z(tr, N, cfg.coset_shift) for tr in transcripts],
                np.uint32,
            )

            # ── OOD (one dispatch; shift-major column-minor + q_z) ────────
            with profiling.phase("batch_ood"):
                pts = np.stack([
                    (np.uint64(zs) * np.uint64(pow(g, s, P)) % np.uint64(P))
                    .astype(np.uint32)
                    for s in range(ns)
                ], axis=1)  # (B, ns)
                ood = fns["ood"](out1["that"], out2["q_coeffs"],
                                 jnp.asarray(pts))
                ood_np = np.asarray(ood, np.uint64)  # (B, ns*k+1)

        ood_traces, q_zs = [], []
        for i in range(B):
            if ext:
                ood_trace = tuple(
                    tuple(
                        tuple(int(v) for v in ood_np[i, s * k + c])
                        for c in range(k)
                    )
                    for s in range(ns)
                )
                q_z = tuple(int(v) for v in ood_np[i, ns * k])
            else:
                ood_trace = tuple(
                    tuple(int(ood_np[i, s * k + c]) for c in range(k))
                    for s in range(ns)
                )
                q_z = int(ood_np[i, ns * k])
            t_scalars = [
                ood_trace[s] if k > 1 else ood_trace[s][0] for s in range(ns)
            ]
            if ext:
                from .field import ext as extf

                if nc > 1:
                    c_z = self.air.constraint_at_ext(t_scalars, zs_h[i], g, n,
                                                     alphas[i])
                else:
                    c_z = self.air.constraint_at_ext(t_scalars, zs_h[i], g, n)
                z_z = extf.h_sub(extf.h_pow(zs_h[i], n), extf.H_ONE)
                if c_z != extf.h_mul(q_z, z_z):
                    raise ValueError(
                        f"Constraint check at z failed for batch member {i}"
                    )
                for row in ood_trace:
                    for v in row:
                        transcripts[i].absorb_ext(v)
                transcripts[i].absorb_ext(q_z)
            else:
                if nc > 1:
                    c_z = self.air.constraint_at(t_scalars, int(zs[i]), g, n,
                                                 alphas[i])
                else:
                    c_z = self.air.constraint_at(t_scalars, int(zs[i]), g, n)
                if c_z != q_z * domain.eval_vanishing(int(zs[i])) % P:
                    raise ValueError(
                        f"Constraint check at z failed for batch member {i}"
                    )
                for row in ood_trace:
                    for v in row:
                        transcripts[i].absorb_field(v)
                transcripts[i].absorb_field(q_z)
            ood_traces.append(ood_trace)
            q_zs.append(q_z)

        # ── DEEP + FRI (same batched flow as the reference-protocol path) ─
        with profiling.phase("batch_deep"):
            deep = efns["deep_multi_ext"] if ext else fns["deep"]
            d_evals = deep(out1["trace_lde"], out2["q_evals"],
                           fns["x"], ood, jnp.asarray(zs))

        final_size = cfg.final_layer_size(n)
        fri_layers = [d_evals]
        fri_levels, fri_salts = [], []
        fri_commitments = [[] for _ in range(B)]

        build_salted = efns["build_salted_ext"] if ext else fns["build_salted"]
        build_unsalted = (
            efns["build_unsalted_ext"] if ext else fns["build_unsalted"]
        )
        fold = efns["fold_ext"] if ext else fns["fold"]

        salts0 = jnp.stack([self._salts(i, N) for i in range(B)])
        levels0 = build_salted(d_evals, salts0)
        roots0 = np.asarray(levels0[-1], np.uint32)
        for i in range(B):
            root = _hash_backend(cfg.hash).digest_bytes(roots0[i, 0])
            transcripts[i].absorb_commitment(root)
            fri_commitments[i].append(root)
        fri_levels.append(levels0)
        fri_salts.append(salts0)

        xs_inv = _xs_inv0_dev(
            N, cfg.coset_shift, Domain.new(N).get_coset(cfg.coset_shift).omega
        )
        current = d_evals
        while current.shape[1] > final_size:
            if ext:
                betas = np.array(
                    [tr.squeeze_ext_challenge() for tr in transcripts],
                    np.uint32,
                )
            else:
                betas = np.array(
                    [tr.squeeze_challenge() for tr in transcripts], np.uint32
                )
            current, xs_inv = fold(current, xs_inv, jnp.asarray(betas))
            fri_layers.append(current)
            if current.shape[1] == final_size:
                levels = build_unsalted(current)
                salts = None
            else:
                salts = jnp.stack(
                    [self._salts(i, current.shape[1]) for i in range(B)]
                )
                levels = build_salted(current, salts)
            roots = np.asarray(levels[-1], np.uint32)
            for i in range(B):
                root = _hash_backend(cfg.hash).digest_bytes(roots[i, 0])
                transcripts[i].absorb_commitment(root)
                fri_commitments[i].append(root)
            fri_levels.append(levels)
            fri_salts.append(salts)

        final_np = np.asarray(current, np.uint64)

        # ── queries (ns trace openings per query, k-value bundles) ────────
        half0 = N // 2
        num_folds = len(fri_layers) - 1
        query_indices = [
            tr.squeeze_indices(cfg.num_queries, half0) for tr in transcripts
        ]

        # per query, ns consecutive entries (shift-major)
        trace_idx = np.array(
            [[(qi + s * blow) % N for qi in qs for s in range(ns)]
             for qs in query_indices], np.int32)
        quot_idx = np.array(query_indices, np.int32)
        deep_idx = np.array(
            [[v for qi in qs for v in (qi, qi + half0)]
             for qs in query_indices], np.int32)
        fri_idx = []
        for li in range(1, num_folds):
            rows = []
            for qs in query_indices:
                row = []
                for qi in qs:
                    idx = qi
                    for lj in range(1, li + 1):
                        idx = idx % (fri_layers[lj].shape[1] // 2)
                    row += [idx, idx + fri_layers[li].shape[1] // 2]
                rows.append(row)
            fri_idx.append(np.array(rows, np.int32))

        gather_fri = efns["gather_salted_ext"] if ext else fns["gather_salted"]
        pend = [
            fns["gather_salted_multi"](tuple(trace_levels), out1["trace_lde"],
                                       trace_salts, jnp.asarray(trace_idx)),
            fns["gather_salted"](tuple(quot_levels), out2["q_evals"],
                                 quot_salts, jnp.asarray(quot_idx)),
            gather_fri(tuple(fri_levels[0]), fri_layers[0],
                       fri_salts[0], jnp.asarray(deep_idx)),
        ]
        for li in range(1, num_folds):
            pend.append(
                gather_fri(tuple(fri_levels[li]), fri_layers[li],
                           fri_salts[li], jnp.asarray(fri_idx[li - 1]))
            )

        def materialize(vps):
            v, p, s = vps
            return (np.asarray(v, np.uint64), np.asarray(p, np.uint32),
                    np.asarray(s, np.uint64) if s is not None else None)

        done = [materialize(vps) for vps in pend]

        proofs = []
        for i in range(B):
            def mk_open(indices, vals, paths, salts_np, j, depth):
                prf = openings_from_paths(
                    [indices[i][j]], paths[i][j:j + 1], depth, cfg.hash
                )[0]
                salt = (
                    b"".join(int(w).to_bytes(4, "big") for w in salts_np[i][j])
                    if salts_np is not None else b""
                )
                v = vals[i][j]
                value = tuple(int(x) for x in v) if np.ndim(v) else int(v)
                return MerkleOpening(int(indices[i][j]), value, prf, salt)

            tr_vals, tr_paths, tr_salts = done[0]
            q_vals, q_paths, q_salts = done[1]
            d_vals, d_paths, d_salts = done[2]
            depth0 = len(trace_levels) - 1
            query_proofs = []
            for q, qi in enumerate(query_indices[i]):
                fri_ops = []
                for li in range(1, num_folds):
                    f_vals, f_paths, f_salts = done[2 + li]
                    dep = len(fri_levels[li]) - 1
                    fri_ops.append(
                        (mk_open(fri_idx[li - 1], f_vals, f_paths, f_salts,
                                 2 * q, dep),
                         mk_open(fri_idx[li - 1], f_vals, f_paths, f_salts,
                                 2 * q + 1, dep))
                    )
                trace_ops = [
                    mk_open(trace_idx, tr_vals, tr_paths, tr_salts,
                            ns * q + s, depth0)
                    for s in range(ns)
                ]
                query_proofs.append(
                    QueryProof(
                        index=qi,
                        deep_opening=mk_open(
                            deep_idx, d_vals, d_paths, d_salts, 2 * q,
                            len(fri_levels[0]) - 1),
                        deep_opening_pair=mk_open(
                            deep_idx, d_vals, d_paths, d_salts, 2 * q + 1,
                            len(fri_levels[0]) - 1),
                        trace_opening=None,
                        trace_opening_g=None,
                        trace_opening_gg=None,
                        quotient_opening=mk_open(
                            quot_idx, q_vals, q_paths, q_salts, q,
                            len(quot_levels) - 1),
                        fri_openings=fri_ops,
                        trace_openings=trace_ops,
                    )
                )
            if ext:
                final = [tuple(int(v) for v in row) for row in final_np[i]]
            else:
                final = [int(v) for v in final_np[i]]
            proofs.append(
                StarkProof(
                    trace_len=n,
                    lde_size=N,
                    trace_commitment=trace_root_b[i],
                    quotient_commitment=quot_root_b[i],
                    t_z=None, t_gz=None, t_ggz=None,
                    q_z=q_zs[i],
                    fri_commitments=fri_commitments[i],
                    fri_final_layer=final,
                    query_proofs=query_proofs,
                    ext=ext,
                    ood_trace=ood_traces[i],
                    num_columns=k,
                    num_shifts=ns,
                    hash=cfg.hash,
                )
            )
        return proofs


_DEFAULT_AIR = FibonacciAir()
