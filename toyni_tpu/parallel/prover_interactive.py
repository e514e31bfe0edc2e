"""Interactive distributed prover: the COMPLETE proof generation over a
device mesh, transcript and query phase included.

`make_sharded_prove_step` (prover_dist.py) fuses the vector phases into one
program with externally-supplied challenges — the benchmark/dryrun shape.
This module is the production shape: each transcript round trip is one
shard_map dispatch over the mesh, tree levels are RETAINED on device
(block-sharded global arrays), and the query phase gathers openings across
shards with plain jit (XLA routes the cross-shard gathers).

Equivalence contract (tested on the virtual CPU mesh): for the same trace
and seed, `DistributedStarkProver(trace, D, seed=s).generate_proof()` is
BYTE-IDENTICAL to the single-device `StarkProver(trace, seed=s)` proof —
same salts (threefry is backend-deterministic), same transcript, same tree
structure, same openings. Distribution is an implementation detail of the
prover, invisible in the proof.

Layout invariants (see parallel/mesh.py): codewords live cyclic so trace
rolls (D | blowup) and every FRI fold (D | final_layer_size) are shard-local;
coefficient vectors live in blocks; tree leaves are hashed cyclic then
all-to-all'd to block layout so sub-trees are shard-local.
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
from ..field.babybear import P, MONT_R
from ..merkle import MerkleProof, openings_from_paths
from ..ops import sha256 as sha
from ..ops.ntt import intt, np_powers
from ..pipeline import _fold_traced
from ..proof import MerkleOpening, QueryProof, StarkProof
from ..trace import ExecutionTrace
from ..transcript import Transcript, derive_z
from . import ntt_dist
from .mesh import AXIS, make_mesh, to_cyclic_np
from .prover_dist import _cyclic_to_block_local, _mont

_U32 = jnp.uint32


def _pow_traced(base, e: int):
    """base^e for a traced u32 scalar and static int e (square-multiply)."""
    result = jnp.uint32(1)
    sq = base
    first = True
    while e > 0:
        if e & 1:
            result = sq if first else bb.mul(result, sq)
            first = False
        e >>= 1
        if e > 0:
            sq = bb.mul(sq, sq)
    return jnp.uint32(1) if first else result


def _local_levels(leaves: jnp.ndarray) -> list:
    """All levels of a (m, 8) digest block, bottom-up, including the input."""
    levels = [leaves]
    cur = leaves
    while cur.shape[0] > 1:
        cur = sha.hash_nodes(cur[0::2], cur[1::2])
        levels.append(cur)
    return levels


@functools.lru_cache(maxsize=4)
def _phases(n: int, D: int, cfg: StarkConfig = DEFAULT_CONFIG):
    """Jitted shard_map phases + host tables for (trace length, mesh size)."""
    N = n * cfg.blowup
    assert N % (D * D) == 0, "need D^2 | lde_size for the four-step layout"
    assert cfg.blowup % D == 0, "need D | blowup so trace rolls stay local"
    m_deg = cfg.mask_degree
    L = n + m_deg
    final_size = cfg.final_layer_size(n)
    assert final_size % D == 0, "need D | final_layer_size"
    B = cfg.blowup
    mloc = N // D

    domain = Domain.new(n)
    shifted = Domain.new(N).get_coset(cfg.coset_shift)
    g = domain.group_gen()
    air = FibonacciAir()

    mesh = make_mesh(D)
    plan = ntt_dist.plan_tables(N, D, shifted.omega)
    shift_fwd, shift_bwd = ntt_dist.shift_tables_np(N, cfg.coset_shift)

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

    def _commit_with_levels(values_loc, salts_loc):
        """Cyclic values -> (lo_levels..., top_levels...) block/replicated."""
        digests = (
            sha.hash_salted_leaves(values_loc, salts_loc)
            if salts_loc is not None
            else sha.hash_unsalted_leaves(values_loc)
        )
        m = values_loc.shape[0]
        if m % D == 0 and m >= D:
            block = _cyclic_to_block_local(digests, D)
            lo = _local_levels(block)
            subroots = jax.lax.all_gather(lo[-1][0], AXIS, axis=0)  # (D, 8)
            top = _local_levels(subroots)[1:]
            return lo, top
        # tiny layer: gather everything, build the whole tree replicated
        gathered = jax.lax.all_gather(digests, AXIS, axis=0)  # (D, m, 8)
        natural = jnp.swapaxes(gathered, 0, 1).reshape(D * m, 8)
        return [], _local_levels(natural)

    # ── phase 1: trace + quotient commit ──────────────────────────────────
    def commit_local(trace_col, r_mask, trace_salts, quot_salts,
                     x_loc, zh_loc, shiftf_loc, W_loc, W_inv_loc, shiftb_loc):
        x_loc, zh_loc = x_loc[0], zh_loc[0]
        trace_salts, quot_salts = trace_salts[0], quot_salts[0]

        t_coeffs = intt(trace_col, domain.omega)
        t_pad = jnp.pad(t_coeffs, (0, L - n))
        r_low = jnp.pad(r_mask, (0, L - m_deg))
        r_shift = jnp.pad(r_mask, (n, L - m_deg - n))
        that = jnp.pad(bb.add(t_pad, bb.sub(r_shift, r_low)), (0, N - L))

        d = jax.lax.axis_index(AXIS)
        that_loc = jax.lax.dynamic_slice_in_dim(that, d * mloc, mloc)

        trace_lde = ntt_dist.coset_fft_local(that_loc, shiftf_loc, W_loc, plan)

        t_rolls = [jnp.roll(trace_lde, -k * (B // D)) for k in range(air.num_shifts)]
        c_evals = air.constraint_lde(t_rolls, x_loc, g, n)
        q_evals = bb.mont_mul(c_evals, zh_loc)
        q_coeffs_loc = ntt_dist.coset_ifft_local(
            q_evals, shiftb_loc, W_inv_loc, plan
        )

        t_lo, t_top = _commit_with_levels(trace_lde, trace_salts)
        q_lo, q_top = _commit_with_levels(q_evals, quot_salts)
        return dict(
            that_loc=that_loc,
            trace_lde=trace_lde[None],
            q_evals=q_evals[None],
            q_coeffs_loc=q_coeffs_loc,
            t_lo=t_lo, t_top=t_top, q_lo=q_lo, q_top=q_top,
        )

    n_lo = (mloc).bit_length()  # levels in a local subtree incl. leaves
    lo_specs = [blk] * n_lo
    top_specs = [rep] * (D.bit_length() - 1)

    commit = jax.jit(jax.shard_map(
        commit_local, mesh=mesh,
        in_specs=(rep, rep, cyc, cyc, cyc, cyc, blk,
                  Pspec(None, AXIS), Pspec(None, AXIS), blk),
        out_specs=dict(
            that_loc=blk, trace_lde=cyc, q_evals=cyc, q_coeffs_loc=blk,
            t_lo=lo_specs, t_top=top_specs, q_lo=lo_specs, q_top=top_specs,
        ),
        check_vma=False,
    ))

    # ── phase 2: OOD evaluation (local dots + gather of partials) ─────────
    def ood_local(that_loc, q_coeffs_loc, z, gz, ggz):
        d = jax.lax.axis_index(AXIS)
        partials = []
        for pt, coeffs in ((z, that_loc), (gz, that_loc), (ggz, that_loc),
                           (z, q_coeffs_loc)):
            pw = bb.powers_traced(pt, mloc, mont=True)
            local = bb.sum_mod(bb.mont_mul(coeffs, pw))
            factor = bb.powers_traced(_pow_traced(pt, mloc), D)[d]
            partials.append(bb.mul(local, factor))
        part = jnp.stack(partials)  # (4,)
        allp = jax.lax.all_gather(part, AXIS, axis=0)  # (D, 4)
        return bb.sum_mod(allp, axis=0)

    ood = jax.jit(jax.shard_map(
        ood_local, mesh=mesh,
        in_specs=(blk, blk, rep, rep, rep),
        out_specs=rep, check_vma=False,
    ))

    # ── phase 3: DEEP quotient (fully local in cyclic layout) ─────────────
    def deep_local(trace_lde, q_evals, oodv, z, x_loc):
        trace_lde, q_evals = trace_lde[0], q_evals[0]
        x_loc = x_loc[0]
        num = bb.sub(q_evals, oodv[3])
        num = bb.add(num, bb.sub(jnp.roll(trace_lde, -2 * (B // D)), oodv[2]))
        num = bb.add(num, bb.sub(jnp.roll(trace_lde, -(B // D)), oodv[1]))
        num = bb.add(num, bb.sub(trace_lde, oodv[0]))
        return bb.mul(num, bb.inv(bb.sub(x_loc, z)))[None]

    deep = jax.jit(jax.shard_map(
        deep_local, mesh=mesh,
        in_specs=(cyc, cyc, rep, rep, cyc),
        out_specs=cyc, check_vma=False,
    ))

    # ── per-layer: commit a codeword (salted) with retained levels ────────
    @functools.lru_cache(maxsize=32)
    def layer_commit_fn(size: int, salted: bool):
        ml = size // D

        def f_local(values, salts):
            lo, top = _commit_with_levels(
                values[0], salts[0] if salted else None
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

    # ── per-layer: one FRI fold ───────────────────────────────────────────
    @functools.lru_cache(maxsize=32)
    def fold_fn(size: int):
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

    # explicit global shardings so every process contributes its addressable
    # shards (required in multi-process runs; a no-op placement single-process)
    tspec = dict(x=cyc, zh=cyc, xs0=cyc, shiftf=blk, shiftb=blk,
                 W=Pspec(None, AXIS), W_inv=Pspec(None, AXIS))
    traw = dict(
        x=x_cyc, zh=zh_inv_tile, xs0=xs_inv0, shiftf=shift_fwd,
        shiftb=shift_bwd, W=plan["W"], W_inv=plan["W_inv"],
    )
    tables = {
        k: jax.device_put(jnp.asarray(v), NamedSharding(mesh, tspec[k]))
        for k, v in traw.items()
    }
    return dict(
        mesh=mesh, commit=commit, ood=ood, deep=deep,
        layer_commit=layer_commit_fn, fold=fold_fn, tables=tables,
        params=(N, L, final_size, B),
    )


class _DistTree:
    """Global tree view: list of levels (mixed block-sharded / replicated
    jax arrays), natural leaf order, plus the cyclic value/salt arrays."""

    def __init__(self, lo, top, values_cyc, salts_cyc, mesh=None):
        self.levels = list(lo) + list(top)
        self.values = values_cyc  # (D, m) cyclic
        self.salts = salts_cyc    # (D, m, 4) cyclic or None
        self.mesh = mesh

    def root(self) -> bytes:
        return sha.digest_bytes(np.asarray(self.levels[-1], np.uint32)[0])

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
    Produces byte-identical proofs to the single-device prover (same seed)."""

    def __init__(self, trace: ExecutionTrace, n_devices: int,
                 config: StarkConfig = DEFAULT_CONFIG, seed=None):
        self.trace = trace
        self.D = n_devices
        self.config = config
        self.rng = np.random.default_rng(seed)

    def _salts_np(self, count: int) -> np.ndarray:
        """Identical draw to StarkProver._salts (threefry is deterministic
        across backends), materialized to host for cyclic resharding."""
        key = jax.random.PRNGKey(int(self.rng.integers(0, 2**63)))
        return np.asarray(jax.random.bits(key, (count, 4), dtype=jnp.uint32))

    def generate_proof(self) -> StarkProof:
        cfg = self.config
        D = self.D
        n = self.trace.num_rows
        ph = _phases(n, D, cfg)
        N, _L, final_size, B = ph["params"]
        mesh = ph["mesh"]
        tb = ph["tables"]
        domain = Domain.new(n)
        g = domain.group_gen()

        def shard_cyc(v_np):
            arr = to_cyclic_np(v_np, D)
            return jax.device_put(
                jnp.asarray(arr), NamedSharding(mesh, Pspec(AXIS, *([None] * (arr.ndim - 1))))
            )

        rep_sh = NamedSharding(mesh, Pspec())

        # randomness, in the single-prover's exact draw order
        m_deg = cfg.mask_degree
        r_mask = jax.device_put(jnp.asarray(
            self.rng.integers(0, P, m_deg, dtype=np.uint64).astype(np.uint32)
        ), rep_sh)
        trace_salts_np = self._salts_np(N)
        quot_salts_np = self._salts_np(N)

        trace_col = jax.device_put(
            jnp.asarray(self.trace.columns[0].astype(np.uint32)), rep_sh
        )
        trace_salts = shard_cyc(trace_salts_np)
        quot_salts = shard_cyc(quot_salts_np)

        out = ph["commit"](
            trace_col, r_mask, trace_salts, quot_salts,
            tb["x"], tb["zh"], tb["shiftf"], tb["W"], tb["W_inv"], tb["shiftb"],
        )
        trace_tree = _DistTree(out["t_lo"], out["t_top"], out["trace_lde"],
                               trace_salts, mesh)
        quot_tree = _DistTree(out["q_lo"], out["q_top"], out["q_evals"],
                              quot_salts, mesh)
        trace_root = trace_tree.root()
        quotient_root = quot_tree.root()

        transcript = Transcript()
        transcript.absorb_commitment(trace_root)
        transcript.absorb_commitment(quotient_root)
        z = derive_z(transcript, N, cfg.coset_shift)

        ood_vec = ph["ood"](
            out["that_loc"], out["q_coeffs_loc"],
            jnp.uint32(z), jnp.uint32(g * z % P),
            jnp.uint32(g * g % P * z % P),
        )
        ood_np = np.asarray(ood_vec, np.uint64)
        t_z, t_gz, t_ggz, q_z = (int(v) for v in ood_np)

        air = FibonacciAir()
        c_z = air.constraint_at([t_z, t_gz, t_ggz], z, g, n)
        if c_z != q_z * domain.eval_vanishing(z) % P:
            raise ValueError("Constraint check at z failed — invalid trace")
        for v in (t_z, t_gz, t_ggz, q_z):
            transcript.absorb_field(v)

        d_evals = ph["deep"](
            out["trace_lde"], out["q_evals"], ood_vec, jnp.uint32(z), tb["x"],
        )

        # ── FRI (interactive: root -> transcript -> beta -> fold) ─────────
        fri_trees = []
        fri_layers = [d_evals]
        fri_commitments = []

        salts0_np = self._salts_np(N)
        salts0 = shard_cyc(salts0_np)
        lv = ph["layer_commit"](N, True)(d_evals, salts0)
        tree0 = _DistTree(lv["lo"], lv["top"], d_evals, salts0, mesh)
        root0 = tree0.root()
        transcript.absorb_commitment(root0)
        fri_commitments.append(root0)
        fri_trees.append(tree0)

        xs_inv = tb["xs0"]
        current = d_evals
        while current.shape[0] * current.shape[1] > final_size:
            beta = transcript.squeeze_challenge()
            size = current.shape[0] * current.shape[1]
            current, xs_inv = ph["fold"](size)(current, xs_inv, jnp.uint32(beta))
            fri_layers.append(current)
            size //= 2
            if size == final_size:
                lv = ph["layer_commit"](size, False)(current)
                tree = _DistTree(lv["lo"], lv["top"], current, None, mesh)
            else:
                salts_np = self._salts_np(size)
                salts = shard_cyc(salts_np)
                lv = ph["layer_commit"](size, True)(current, salts)
                tree = _DistTree(lv["lo"], lv["top"], current, salts, mesh)
            root = tree.root()
            transcript.absorb_commitment(root)
            fri_commitments.append(root)
            fri_trees.append(tree)

        if jax.process_count() > 1:
            current_rep = jax.jit(lambda a: a, out_shardings=rep_sh)(current)
            final_cyc = np.asarray(current_rep, np.uint64)  # (D, final/D)
        else:
            final_cyc = np.asarray(current, np.uint64)  # (D, final/D)
        fri_final_layer = [
            int(v) for v in final_cyc.swapaxes(0, 1).reshape(-1)
        ]

        # ── query phase (distributed gathers) ─────────────────────────────
        half0 = N // 2
        query_indices = transcript.squeeze_indices(cfg.num_queries, half0)
        num_folds = len(fri_layers) - 1

        trace_idx, deep_idx = [], []
        for qi in query_indices:
            trace_idx += [qi, (qi + B) % N, (qi + 2 * B) % N]
            deep_idx += [qi, qi + half0]
        quot_idx = list(query_indices)
        fri_idx = [[] for _ in range(1, num_folds)]
        for qi in query_indices:
            idx = qi
            for li in range(1, num_folds):
                half = (fri_layers[li].shape[0] * fri_layers[li].shape[1]) // 2
                idx = idx % half
                fri_idx[li - 1] += [idx, idx + half]

        def openings(tree, indices):
            vals, salts, paths = tree.open_at(indices)
            proofs = openings_from_paths(indices, paths, len(tree.levels) - 1)
            return vals, salts, proofs

        tr_vals, tr_salts, tr_proofs = openings(trace_tree, trace_idx)
        q_vals, q_salts, q_proofs = openings(quot_tree, quot_idx)
        d_vals, d_salts, d_proofs = openings(fri_trees[0], deep_idx)
        fri_open = [
            openings(fri_trees[li], fri_idx[li - 1])
            for li in range(1, num_folds)
        ]

        def mk_open(indices, vals, salts, proofs, j):
            salt = (
                b"".join(int(w).to_bytes(4, "big") for w in salts[j])
                if salts is not None else b""
            )
            return MerkleOpening(indices[j], int(vals[j]), proofs[j], salt)

        query_proofs = []
        for q, qi in enumerate(query_indices):
            fri_ops = []
            for li in range(1, num_folds):
                vals, salts, proofs = fri_open[li - 1]
                fri_ops.append(
                    (mk_open(fri_idx[li - 1], vals, salts, proofs, 2 * q),
                     mk_open(fri_idx[li - 1], vals, salts, proofs, 2 * q + 1))
                )
            query_proofs.append(
                QueryProof(
                    index=qi,
                    deep_opening=mk_open(deep_idx, d_vals, d_salts, d_proofs, 2 * q),
                    deep_opening_pair=mk_open(deep_idx, d_vals, d_salts, d_proofs, 2 * q + 1),
                    trace_opening=mk_open(trace_idx, tr_vals, tr_salts, tr_proofs, 3 * q),
                    trace_opening_g=mk_open(trace_idx, tr_vals, tr_salts, tr_proofs, 3 * q + 1),
                    trace_opening_gg=mk_open(trace_idx, tr_vals, tr_salts, tr_proofs, 3 * q + 2),
                    quotient_opening=mk_open(quot_idx, q_vals, q_salts, q_proofs, q),
                    fri_openings=fri_ops,
                )
            )

        return StarkProof(
            trace_len=n, lde_size=N,
            trace_commitment=trace_root, quotient_commitment=quotient_root,
            t_z=t_z, t_gz=t_gz, t_ggz=t_ggz, q_z=q_z,
            fri_commitments=fri_commitments,
            fri_final_layer=fri_final_layer,
            query_proofs=query_proofs,
        )
