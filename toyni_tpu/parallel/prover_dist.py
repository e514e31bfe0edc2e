"""Sharded proving step: the full device pipeline over a TPU mesh.

One jitted `shard_map` program covering every vector phase of proof
generation (the reference's phases 1-6, src/fibonacci.rs:110-247) across D
chips:

  trace column (replicated, small)
    -> replicated INTT + ZK mask                 [tiny: n + mask coeffs]
    -> block-sharded coset LDE via 4-step NTT    [2 all-to-alls]
    -> cyclic-layout constraint / quotient       [no communication when
                                                  D | blowup; otherwise one
                                                  boundary ppermute per
                                                  trace shift]
    -> DEEP numerators + batched inversion       [no communication]
    -> FRI folds                                 [no communication while
                                                  D | half: cyclic pairs are
                                                  shard-local; tiny (< D)
                                                  tail layers gather once and
                                                  fold replicated]
    -> Merkle leaf hashing (local) + one all-to-all per committed layer to
       block layout + local subtrees + all-gather of D sub-roots + replicated
       top tree -> roots

Communication total: 2 all-to-alls for the one big forward NTT + one
all-to-all + one (D,8)-word all-gather per commitment — independent of
log N. (The quotient IFFT and its 2 all-to-alls were retired in round 4:
barycentric OOD evaluation — round 2 — removed every consumer of the
quotient's coefficient form, and the real provers had already dropped
it.) The
transcript-driven scalars (z, betas) enter as inputs; the interactive prover
obtains them between phases, the benchmark/dryrun feeds fixed values.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as Pspec

from ..air import FibonacciAir
from ..config import DEFAULT_CONFIG, StarkConfig
from ..domain import Domain
from ..field import babybear as bb
from ..field.babybear import P, MONT_R
from ..ops import sha256 as sha
from ..ops.ntt import intt, np_powers
from ..pipeline import _fold_traced
from . import ntt_dist
from .mesh import AXIS, make_mesh, roll_cyclic_local, to_cyclic_np

_U32 = jnp.uint32


def _mont(v: np.ndarray) -> np.ndarray:
    return (v * np.uint64(MONT_R) % np.uint64(P)).astype(np.uint32)


def _cyclic_to_block_local(x_loc: jnp.ndarray, D: int):
    """Inside shard_map: convert a cyclic-layout local vector (m,) [global
    i = j*D + d] to block layout [global i = d*m + t]. One all-to-all plus a
    local transpose; requires D | m."""
    m = x_loc.shape[0]
    lead_ok = x_loc.shape[1:] if x_loc.ndim > 1 else ()
    parts = jax.lax.all_to_all(x_loc.reshape(D, m // D, *lead_ok), AXIS, 0, 0)
    # parts[e, j'] = value at global d*m + j'*D + e  -> interleave
    return jnp.swapaxes(parts, 0, 1).reshape(m, *lead_ok)


def _local_subtree(leaves: jnp.ndarray):
    """Hash a (m, 8) digest block up to its sub-root (8,)."""
    cur = leaves
    while cur.shape[0] > 1:
        cur = sha.hash_nodes(cur[0::2], cur[1::2])
    return cur[0]


def _top_tree_root(subroots: jnp.ndarray):
    """(D, 8) sub-roots -> (8,) root, computed replicated on every shard."""
    cur = subroots
    while cur.shape[0] > 1:
        cur = sha.hash_nodes(cur[0::2], cur[1::2])
    return cur[0]


def _commit_local(values_loc: jnp.ndarray, salts_loc, D: int):
    """Cyclic-layout value vector -> Merkle root (replicated (8,) words).

    salts_loc: (m, 16) u8 for salted commits (salts are indexed by *global*
    leaf position, passed pre-cyclically-sharded), or None for unsalted.

    Large layers (D | local length): leaf-hash locally, one all-to-all to
    block layout, local subtrees, all-gather D sub-roots, tiny replicated
    top tree. Small layers (late FRI folds): all-gather the whole layer and
    hash it replicated — it is at most D*D leaves.
    """
    m = values_loc.shape[0]
    if salts_loc is None:
        digests = sha.hash_unsalted_leaves(values_loc)
    else:
        digests = sha.hash_salted_leaves(values_loc, salts_loc)
    if m % D == 0:
        block = _cyclic_to_block_local(digests, D)
        sub = _local_subtree(block)
        subroots = jax.lax.all_gather(sub, AXIS, axis=0)  # (D, 8) replicated
        return _top_tree_root(subroots)
    # small-layer path: gather cyclic rows, restore natural leaf order
    gathered = jax.lax.all_gather(digests, AXIS, axis=0)  # (D, m, 8)
    natural = jnp.swapaxes(gathered, 0, 1).reshape(D * m, 8)
    return _local_subtree(natural)


@functools.lru_cache(maxsize=4)
def make_sharded_prove_step(n: int, D: int, cfg: StarkConfig = DEFAULT_CONFIG):
    """Build (mesh, jitted_fn, make_example_args) for trace length n over D
    devices. The function computes both commitments, DEEP, all FRI layers and
    all FRI roots in one compiled program."""
    N = n * cfg.blowup
    assert N % D == 0, "mesh width must divide the LDE size"
    # No other layout preconditions since round 4: trace rolls cross shard
    # boundaries via roll_cyclic_local when D does not divide the blowup,
    # and the four-step NTT falls back to a replicated tiny transform when
    # N < D^2 (ntt_dist.plan_tables `small`).
    m = cfg.mask_degree
    L = n + m
    final_size = cfg.final_layer_size(n)
    num_folds = (N // final_size).bit_length() - 1
    # A fold of global size s -> s/2 stays shard-local (cyclic pairs on the
    # same shard) iff D | s/2. Sizes are powers of two, so folds are local
    # down to size D; any smaller layers are tiny (< D elements) — they are
    # all-gathered once and folded/committed replicated, so ANY final layer
    # size works on ANY mesh width (no D | final_layer_size precondition).
    B = cfg.blowup

    domain = Domain.new(n)
    shifted = Domain.new(N).get_coset(cfg.coset_shift)
    g = domain.group_gen()
    air = FibonacciAir()

    mesh = make_mesh(D)
    plan = ntt_dist.plan_tables(N, D, shifted.omega)
    shift_fwd, _shift_bwd_unused = ntt_dist.shift_tables_np(N, cfg.coset_shift)

    # host tables in cyclic layout
    x_np = shifted.elements_np().astype(np.uint32)
    x_cyc = to_cyclic_np(x_np, D)
    h_n = pow(cfg.coset_shift, n, P)
    om_n = pow(shifted.omega, n, P)
    zh = (np_powers(om_n, B) * np.uint64(h_n) + np.uint64(P - 1)) % np.uint64(P)
    zh_inv = np.array([pow(int(v), P - 2, P) for v in zh], np.uint64)
    zh_inv_tile = to_cyclic_np(np.tile(_mont(zh_inv), n), D)
    h_inv = pow(cfg.coset_shift, P - 2, P)
    om_inv = pow(shifted.omega, P - 2, P)
    xs_inv0 = to_cyclic_np(_mont(np_powers(om_inv, N) * np.uint64(h_inv) % np.uint64(P)), D)

    cyc = Pspec(AXIS, None)
    blk = Pspec(AXIS)
    rep = Pspec()

    def local_fn(
        trace_col,      # (n,) replicated
        r_mask,         # (m,) replicated
        z,              # () u32 replicated
        ood,            # (4,) u32 replicated: t_z, t_gz, t_ggz, q_z
        betas,          # (num_folds,) u32 replicated
        trace_salts,    # (1, N/D, 16) cyclic row
        quot_salts,
        deep_salts,
        fri_salts,      # tuple: salts for intermediate FRI layers 1..f-1
                        #   (cyclic (1, s/D, 16) while s >= D, else (s, 16)
                        #   replicated) — matching the protocol's salted
                        #   hiding commits (fibonacci.rs:234-238)
        x_loc,          # (1, N/D) cyclic
        zh_loc,
        xs_inv_loc,
        shiftf_loc,     # (N/D,) block
        W_loc,          # (D, n2/D) step-3 twiddles
    ):
        x_loc = x_loc[0]
        zh_loc = zh_loc[0]
        xs_inv = xs_inv_loc[0]
        trace_salts = trace_salts[0]
        quot_salts = quot_salts[0]
        deep_salts = deep_salts[0]

        # ── replicated small prelude: interpolate + mask ──────────────────
        t_coeffs = intt(trace_col, domain.omega)
        t_pad = jnp.pad(t_coeffs, (0, L - n))
        r_low = jnp.pad(r_mask, (0, L - m))
        r_shift = jnp.pad(r_mask, (n, L - m - n))
        that = jnp.pad(bb.add(t_pad, bb.sub(r_shift, r_low)), (0, N - L))

        # take this shard's block of the padded coefficients
        d = jax.lax.axis_index(AXIS)
        that_loc = jax.lax.dynamic_slice_in_dim(that, d * (N // D), N // D)

        # ── distributed coset LDE (block -> cyclic) ───────────────────────
        trace_lde = ntt_dist.coset_fft_local(that_loc, shiftf_loc, W_loc, plan)

        # ── constraint + quotient (all local in cyclic layout) ────────────
        t_rolls = [
            roll_cyclic_local(trace_lde, k * B, D)
            for k in range(air.num_shifts)
        ]
        c_evals = air.constraint_lde(t_rolls, x_loc, g, n)
        q_evals = bb.mont_mul(c_evals, zh_loc)

        # ── commitments ───────────────────────────────────────────────────
        trace_root = _commit_local(trace_lde, trace_salts, D)
        quot_root = _commit_local(q_evals, quot_salts, D)

        # ── DEEP ──────────────────────────────────────────────────────────
        num = bb.sub(q_evals, ood[3])
        num = bb.add(num, bb.sub(t_rolls[2], ood[2]))
        num = bb.add(num, bb.sub(t_rolls[1], ood[1]))
        num = bb.add(num, bb.sub(t_rolls[0], ood[0]))
        d_evals = bb.mul(num, bb.inv(bb.sub(x_loc, z)))

        # ── FRI folds + roots ─────────────────────────────────────────────
        # Shard-local on the cyclic layout while D | half; once the layer
        # shrinks below D elements, gather it (and xs) to natural order once
        # and continue replicated — the tail layers are tiny. Intermediate
        # layers commit SALTED (the protocol's hiding commits); only the
        # final layer is unsalted (fibonacci.rs:234-238, 357-363).
        roots = [_commit_local(d_evals, deep_salts, D)]
        current = d_evals
        xs = xs_inv
        replicated = False
        for k in range(num_folds):
            if not replicated and (N >> (k + 1)) % D != 0:
                g_cur = jax.lax.all_gather(current, AXIS, axis=0)
                current = jnp.swapaxes(g_cur, 0, 1).reshape(-1)
                g_xs = jax.lax.all_gather(xs, AXIS, axis=0)
                xs = jnp.swapaxes(g_xs, 0, 1).reshape(-1)
                replicated = True
            half = current.shape[0] // 2
            current = _fold_traced(current, xs[:half], betas[k])
            xs = bb.mont_mul(xs[:half], xs[:half])
            salts_k = fri_salts[k] if k + 1 < num_folds else None
            if replicated:
                digests = (
                    sha.hash_salted_leaves(current, salts_k)
                    if salts_k is not None
                    else sha.hash_unsalted_leaves(current)
                )
                roots.append(_local_subtree(digests))
            else:
                roots.append(
                    _commit_local(
                        current,
                        salts_k[0] if salts_k is not None else None,
                        D,
                    )
                )

        if replicated:
            final_layer = current
        else:
            final_gather = jax.lax.all_gather(current, AXIS, axis=0)
            final_layer = jnp.swapaxes(final_gather, 0, 1).reshape(-1)

        return dict(
            trace_root=trace_root,
            quot_root=quot_root,
            trace_lde=trace_lde[None],
            fri_roots=jnp.stack(roots),
            final_layer=final_layer,
        )

    # per-intermediate-layer salt specs: cyclic while the layer is sharded
    # (D | size), replicated for the tiny gathered tail
    fri_salt_specs = tuple(
        cyc if (N >> (k + 1)) % D == 0 else rep
        for k in range(num_folds - 1)
    )

    shard = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, cyc, cyc, cyc, fri_salt_specs,
                  cyc, cyc, cyc, blk,
                  Pspec(None, AXIS)),
        out_specs=dict(
            trace_root=rep,
            quot_root=rep,
            trace_lde=cyc,
            fri_roots=rep,
            final_layer=rep,
        ),
        check_vma=False,
    )
    fn = jax.jit(shard)

    def make_example_args(seed: int = 0):
        rng = np.random.default_rng(seed)
        fib, a, b_ = [], 1, 1
        for _ in range(n):
            fib.append(a % P)
            a, b_ = b_, (a + b_) % P
        u8 = lambda *s: rng.integers(0, 256, s, dtype=np.uint64).astype(np.uint8)
        return (
            jnp.asarray(np.array(fib, np.uint32)),
            jnp.asarray(rng.integers(0, P, m, dtype=np.uint64).astype(np.uint32)),
            jnp.uint32(123457),
            jnp.asarray(rng.integers(0, P, 4, dtype=np.uint64).astype(np.uint32)),
            jnp.asarray(rng.integers(0, P, num_folds, dtype=np.uint64).astype(np.uint32)),
            jnp.asarray(to_cyclic_np(u8(N, 16), D)),
            jnp.asarray(to_cyclic_np(u8(N, 16), D)),
            jnp.asarray(to_cyclic_np(u8(N, 16), D)),
            tuple(
                jnp.asarray(to_cyclic_np(u8(N >> (k + 1), 16), D))
                if (N >> (k + 1)) % D == 0
                else jnp.asarray(u8(N >> (k + 1), 16))
                for k in range(num_folds - 1)
            ),
            jnp.asarray(x_cyc),
            jnp.asarray(zh_inv_tile),
            jnp.asarray(xs_inv0),
            jnp.asarray(shift_fwd),
            jnp.asarray(plan["W"]),
        )

    return mesh, fn, make_example_args
