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

Scope: the reference protocol shape (single-column AIRs, base-field
challenges). All traces in a batch share one AIR and trace length.
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
from .ops import sha256 as sha
from .ops.ntt import (
    _FOUR_STEP_MIN,
    _pallas_ntt_enabled,
    ntt_axis0,
    ntt_stages,
    ntt_tables,
)
from .proof import MerkleOpening, QueryProof, StarkProof
from .prover import _xs_inv0_dev, _zh_inv_tile_dev
from .trace import ExecutionTrace
from .transcript import Transcript, derive_z
from . import profiling

_U32 = jnp.uint32


# ── batched transforms ──────────────────────────────────────────────────────

def ntt_batched(values: jnp.ndarray, tabs, size: int) -> jnp.ndarray:
    """(B, n) batched NTT: four-step with B*sqrt(n)-wide lanes for large n
    (each of the two `ntt_axis0` passes treats the batch axis as extra
    lanes), flat per-stage kernel for small n."""
    if size < _FOUR_STEP_MIN:
        return ntt_stages(values, tabs)
    colt, rowt, W = tabs[0], tabs[1], tabs[2]
    n1, n2 = W.shape
    Bsz = values.shape[0]
    x3 = values.reshape(Bsz, n1, n2)
    xt = jnp.transpose(x3, (1, 0, 2)).reshape(n1, Bsz * n2)
    if len(tabs) == 5 and _pallas_ntt_enabled():
        # Fused-stage Mosaic kernel on the batch-widened lanes (same kernels
        # as the single-proof path; the W multiply stays an XLA elementwise
        # because W broadcasts over the batch axis).
        from .ops.ntt_pallas import _ntt_axis0_roll_nobitrev
        from .ops.ntt import _bitrev

        tw_col, tw_row = tabs[3], tabs[4]
        xb = jnp.take(xt, jnp.asarray(_bitrev(n1)), axis=0)
        a = _ntt_axis0_roll_nobitrev(xb, tw_col).reshape(n1, Bsz, n2)
        a = bb.mont_mul(a, W[:, None, :])
        at = jnp.transpose(a, (2, 1, 0)).reshape(n2, Bsz * n1)
        ab = jnp.take(at, jnp.asarray(_bitrev(n2)), axis=0)
        c = _ntt_axis0_roll_nobitrev(ab, tw_row).reshape(n2, Bsz, n1)
        return jnp.transpose(c, (1, 0, 2)).reshape(Bsz, n1 * n2)
    a = ntt_axis0(xt, colt).reshape(n1, Bsz, n2)
    a = bb.mont_mul(a, W[:, None, :])
    at = jnp.transpose(a, (2, 1, 0)).reshape(n2, Bsz * n1)
    c = ntt_axis0(at, rowt).reshape(n2, Bsz, n1)
    return jnp.transpose(c, (1, 0, 2)).reshape(Bsz, n1 * n2)


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


def _device_levels_batched(leaf_digests: jnp.ndarray) -> list:
    """(B, n, 8) leaf digests -> all tree levels, batched over axis 0."""
    levels = [leaf_digests]
    cur = leaf_digests
    while cur.shape[1] > 1:
        cur = sha.hash_nodes(cur[:, 0::2], cur[:, 1::2])
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
def _batch_fns(Bsz: int, n: int, N: int, L: int, blowup: int,
               coset_shift: int, air):
    """Jitted batched phases for (batch size, trace length)."""
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
        trace_levels = _device_levels_batched(
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
        quot_levels = _device_levels_batched(
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
        return _device_levels_batched(sha.hash_salted_leaves(values, salts))

    def build_unsalted(values):
        return _device_levels_batched(sha.hash_unsalted_leaves(values))

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
        StarkProver._salts, per batch member."""
        key = jax.random.PRNGKey(int(self.rngs[i].integers(0, 2**63)))
        return jax.random.bits(key, (n, 4), dtype=jnp.uint32)

    def generate_proofs(self) -> list:
        cfg = self.config
        assert not cfg.ext_challenges, "batched ext mode not supported yet"
        B = len(self.traces)
        n = self.traces[0].num_rows
        N = n * cfg.blowup
        L = n + cfg.mask_degree
        m = cfg.mask_degree
        domain = Domain.new(n)
        g = domain.group_gen()
        blow = cfg.blowup

        fns = _batch_fns(B, n, N, L, blow, cfg.coset_shift, self.air)

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
        trace_root_b = [sha.digest_bytes(trace_roots[i, 0]) for i in range(B)]
        quot_root_b = [sha.digest_bytes(quot_roots[i, 0]) for i in range(B)]
        for i, tr in enumerate(transcripts):
            tr.absorb_commitment(trace_root_b[i])
            tr.absorb_commitment(quot_root_b[i])
        zs = np.array(
            [derive_z(tr, N, cfg.coset_shift) for tr in transcripts],
            np.uint32,
        )

        # ── OOD (one dispatch) ────────────────────────────────────────────
        with profiling.phase("batch_ood"):
            gz = (np.uint64(g) * zs % np.uint64(P)).astype(np.uint32)
            ggz = (np.uint64(g) * np.uint64(g) % np.uint64(P) * zs
                   % np.uint64(P)).astype(np.uint32)
            ood = fns["ood"](out["that"], out["q_coeffs"], jnp.asarray(zs),
                             jnp.asarray(gz), jnp.asarray(ggz))
            ood_np = np.asarray(ood, np.uint64)  # (B, 4)

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

        # ── DEEP + FRI ────────────────────────────────────────────────────
        with profiling.phase("batch_deep"):
            d_evals = fns["deep"](out["trace_lde"], out["q_evals"], fns["x"],
                                  ood, jnp.asarray(zs))

        final_size = cfg.final_layer_size(n)
        fri_layers = [d_evals]
        fri_levels = []
        fri_salts = []
        fri_commitments = [[] for _ in range(B)]

        salts0 = jnp.stack([self._salts(i, N) for i in range(B)])
        levels0 = fns["build_salted"](d_evals, salts0)
        roots0 = np.asarray(levels0[-1], np.uint32)
        for i in range(B):
            root = sha.digest_bytes(roots0[i, 0])
            transcripts[i].absorb_commitment(root)
            fri_commitments[i].append(root)
        fri_levels.append(levels0)
        fri_salts.append(salts0)

        xs_inv = _xs_inv0_dev(N, cfg.coset_shift, Domain.new(N).get_coset(cfg.coset_shift).omega)
        current = d_evals
        while current.shape[1] > final_size:
            betas = np.array(
                [tr.squeeze_challenge() for tr in transcripts], np.uint32
            )
            current, xs_inv = fns["fold"](current, xs_inv, jnp.asarray(betas))
            fri_layers.append(current)
            if current.shape[1] == final_size:
                levels = fns["build_unsalted"](current)
                salts = None
            else:
                salts = jnp.stack([self._salts(i, current.shape[1]) for i in range(B)])
                levels = fns["build_salted"](current, salts)
            roots = np.asarray(levels[-1], np.uint32)
            for i in range(B):
                root = sha.digest_bytes(roots[i, 0])
                transcripts[i].absorb_commitment(root)
                fri_commitments[i].append(root)
            fri_levels.append(levels)
            fri_salts.append(salts)

        final_np = np.asarray(current, np.uint64)  # (B, final_size)

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

        pend = [
            fns["gather_salted"](tuple(trace_levels), out["trace_lde"],
                                 trace_salts, jnp.asarray(trace_idx)),
            fns["gather_salted"](tuple(quot_levels), out["q_evals"],
                                 quot_salts, jnp.asarray(quot_idx)),
            fns["gather_salted"](tuple(fri_levels[0]), fri_layers[0],
                                 fri_salts[0], jnp.asarray(deep_idx)),
        ]
        for li in range(1, num_folds):
            pend.append(
                fns["gather_salted"](tuple(fri_levels[li]), fri_layers[li],
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
                    [indices[i][j]], paths[i][j:j + 1], depth
                )[0]
                salt = (
                    b"".join(int(w).to_bytes(4, "big") for w in salts_np[i][j])
                    if salts_np is not None else b""
                )
                return MerkleOpening(int(indices[i][j]), int(vals[i][j]), prf, salt)

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
            t_z, t_gz, t_ggz, q_z = (int(v) for v in ood_np[i])
            proofs.append(
                StarkProof(
                    trace_len=n,
                    lde_size=N,
                    trace_commitment=trace_root_b[i],
                    quotient_commitment=quot_root_b[i],
                    t_z=t_z, t_gz=t_gz, t_ggz=t_ggz, q_z=q_z,
                    fri_commitments=fri_commitments[i],
                    fri_final_layer=[int(v) for v in final_np[i]],
                    query_proofs=query_proofs,
                )
            )
        return proofs


_DEFAULT_AIR = FibonacciAir()
