"""Jit-compiled device pipeline for the proving hot path.

The prover's transcript forces host synchronization at phase boundaries, but
everything between those boundaries is pure array computation. This module
packages those phases as single jittable functions (traced once per shape,
the XLA analog of the reference CUDA path's persistent per-size context,
cuda/ntt_kernel.cu:202-292):

  commit_core:   trace column -> masked LDE + constraint + quotient
                 + both Merkle roots (fibonacci.rs:110-154 in one graph)
  deep_fri_core: OOD scalars + betas -> DEEP evals + all FRI layers
                 + all layer roots  (fibonacci.rs:185-247 in one graph)

Betas normally depend on each layer's root via the transcript; `deep_fri_core`
is therefore used by the *benchmark/dryrun* path (and by `entry()`), while the
interactive prover calls the same building blocks layer-by-layer.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .air import FibonacciAir
from .config import DEFAULT_CONFIG, StarkConfig
from .domain import Domain
from .field import babybear as bb
from .field.babybear import P, MONT_R
from .ops import sha256 as sha
from .ops.fri import fri_fold
from .ops.ntt import np_powers


def _mont(v: np.ndarray) -> np.ndarray:
    return (v * np.uint64(MONT_R) % np.uint64(P)).astype(np.uint32)


@functools.lru_cache(maxsize=8)
def make_commit_core(n: int, cfg: StarkConfig = DEFAULT_CONFIG):
    """Build the jitted commit-phase core for trace length n.

    Returns (fn, make_example_args). fn(trace_col, r_mask, trace_salts,
    quot_salts) -> dict of device outputs (roots as (8,) u32 words, eval
    vectors, tree levels).
    """
    N = n * cfg.blowup
    m = cfg.mask_degree
    L = n + m
    domain = Domain.new(n)
    shifted = Domain.new(N).get_coset(cfg.coset_shift)
    g = domain.group_gen()
    air = FibonacciAir()
    B = cfg.blowup

    # host-precomputed constant tables (captured as jit constants)
    x_np = shifted.elements_np()
    h_n = pow(cfg.coset_shift, n, P)
    om_n = pow(shifted.omega, n, P)
    zh = (np_powers(om_n, B) * np.uint64(h_n) + np.uint64(P - 1)) % np.uint64(P)
    zh_inv = np.array([pow(int(v), P - 2, P) for v in zh], np.uint64)
    zh_inv_tile = jnp.asarray(np.tile(_mont(zh_inv), n))
    x_dev = jnp.asarray(x_np.astype(np.uint32))

    def fn(trace_col, r_mask, trace_salts, quot_salts):
        # 1. interpolate + mask: T_hat = T + Z_H * R (coefficient-space)
        t_coeffs = domain.ifft(trace_col)
        t_pad = jnp.pad(t_coeffs, (0, L - n))
        r_low = jnp.pad(r_mask, (0, L - m))
        r_shift = jnp.pad(r_mask, (n, L - m - n))
        that = bb.add(t_pad, bb.sub(r_shift, r_low))

        # 2. LDE + trace commitment
        trace_lde = shifted.fft(that)
        trace_leaves = sha.hash_salted_leaves(trace_lde, trace_salts)
        trace_levels = _levels_jit(trace_leaves)

        # 3. constraint + quotient + commitment
        t_rolls = [jnp.roll(trace_lde, -k * B) for k in range(air.num_shifts)]
        c_evals = air.constraint_lde(t_rolls, x_dev, g, n)
        q_evals = bb.mont_mul(c_evals, zh_inv_tile)
        quot_leaves = sha.hash_salted_leaves(q_evals, quot_salts)
        quot_levels = _levels_jit(quot_leaves)

        # (no quotient IFFT since round 2: barycentric OOD evaluation reads
        # everything off the eval vectors, so q_coeffs has no consumer)
        return dict(
            that=that,
            trace_lde=trace_lde,
            q_evals=q_evals,
            trace_levels=trace_levels,
            quot_levels=quot_levels,
            trace_root=trace_levels[-1][0],
            quot_root=quot_levels[-1][0],
        )

    def make_example_args(seed: int = 0):
        rng = np.random.default_rng(seed)
        fib, a, b_ = [], 1, 1
        for _ in range(n):
            fib.append(a % P)
            a, b_ = b_, (a + b_) % P
        trace_col = jnp.asarray(np.array(fib, np.uint32))
        r = jnp.asarray(rng.integers(0, P, m, dtype=np.uint64).astype(np.uint32))
        ts = jnp.asarray(rng.integers(0, 256, (N, 16), dtype=np.uint64).astype(np.uint8))
        qs = jnp.asarray(rng.integers(0, 256, (N, 16), dtype=np.uint64).astype(np.uint8))
        return (trace_col, r, ts, qs)

    return jax.jit(fn), make_example_args


def _levels_jit(leaf_digests):
    """In-graph Merkle levels (power-of-two leaf counts only, which is all the
    protocol produces)."""
    levels = [leaf_digests]
    cur = leaf_digests
    while cur.shape[0] > 1:
        cur = sha.hash_nodes(cur[0::2], cur[1::2])
        levels.append(cur)
    return levels


def _fold_traced(evals, xs_inv, beta_u32):
    """fri_fold with a *traced* beta (the ops.fri version folds beta into a
    host-side Montgomery constant, which jit-traced betas cannot use)."""
    from .ops.fri import _HALF_INV_MONT

    half = evals.shape[-1] // 2
    a, b = evals[..., :half], evals[..., half:]
    avg = bb.mont_mul(bb.add(a, b), jnp.uint32(_HALF_INV_MONT))
    diff = bb.mont_mul(bb.sub(a, b), jnp.uint32(_HALF_INV_MONT))
    odd = bb.mont_mul(bb.mul(diff, beta_u32), xs_inv)
    return bb.add(avg, odd)


@functools.lru_cache(maxsize=8)
def make_deep_fri_core(n: int, cfg: StarkConfig = DEFAULT_CONFIG):
    """Jitted DEEP + full FRI fold/commit chain for trace length n.

    fn(trace_lde, q_evals, z_pows..., scalars, betas, salts) is the
    bench/dryrun shape of phases 5-6 (fibonacci.rs:185-247): betas are inputs
    rather than transcript-derived, so the whole chain fuses into one XLA
    program.
    """
    N = n * cfg.blowup
    final_size = cfg.final_layer_size(n)
    num_folds = (N // final_size).bit_length() - 1
    B = cfg.blowup
    shifted = Domain.new(N).get_coset(cfg.coset_shift)

    x_dev = jnp.asarray(shifted.elements_np().astype(np.uint32))
    h_inv = pow(cfg.coset_shift, P - 2, P)
    om_inv = pow(shifted.omega, P - 2, P)
    xs_inv0 = jnp.asarray(_mont(np_powers(om_inv, N) * np.uint64(h_inv) % np.uint64(P)))

    def fn(trace_lde, q_evals, ood, z, betas, fri_salts):
        """ood = (t_z, t_gz, t_ggz, q_z) u32 scalars; betas (num_folds,) u32;
        fri_salts: list of salt arrays for layers 0..num_folds-1 (final layer
        unsalted)."""
        t_z, t_gz, t_ggz, q_z = (ood[k] for k in range(4))
        num = bb.sub(q_evals, q_z)
        num = bb.add(num, bb.sub(jnp.roll(trace_lde, -2 * B), t_ggz))
        num = bb.add(num, bb.sub(jnp.roll(trace_lde, -B), t_gz))
        num = bb.add(num, bb.sub(trace_lde, t_z))
        d_evals = bb.mul(num, bb.inv(bb.sub(x_dev, z)))

        layers = [d_evals]
        roots = []
        leaves0 = sha.hash_salted_leaves(d_evals, fri_salts[0])
        roots.append(_levels_jit(leaves0)[-1][0])

        xs_inv = xs_inv0
        current = d_evals
        for k in range(num_folds):
            half = current.shape[0] // 2
            current = _fold_traced(current, xs_inv[:half], betas[k])
            xs_inv = bb.mont_mul(xs_inv[:half], xs_inv[:half])
            layers.append(current)
            if current.shape[0] == final_size:
                leaves = sha.hash_unsalted_leaves(current)
            else:
                leaves = sha.hash_salted_leaves(current, fri_salts[k + 1])
            roots.append(_levels_jit(leaves)[-1][0])
        return dict(d_evals=d_evals, layers=layers, roots=roots)

    def make_example_args(seed: int = 0):
        rng = np.random.default_rng(seed)
        u32 = lambda *s: jnp.asarray(rng.integers(0, P, s, dtype=np.uint64).astype(np.uint32))
        salts = tuple(
            jnp.asarray(rng.integers(0, 256, (N >> k, 16), dtype=np.uint64).astype(np.uint8))
            for k in range(num_folds)
        )
        return (
            u32(N), u32(N), u32(4), jnp.uint32(1234577), u32(num_folds), salts,
        )

    return jax.jit(fn), make_example_args
