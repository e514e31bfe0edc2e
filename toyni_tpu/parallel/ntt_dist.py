"""Distributed four-step NTT over a device mesh.

The reference's butterfly structure (stage s exchanges elements at stride
n/2^s, cuda/ntt_kernel.cu:119-137) would need a collective per stage if
sharded naively. The Bailey/four-step factorization N = D x n2 needs exactly
**two all-to-alls** regardless of log N:

  forward (block layout in, cyclic layout out), with omega of order N:
    1. all-to-all: block rows  -> column blocks        [transpose #1]
    2. local column DFTs of size D   (root omega^n2)
    3. local twiddle  A[k1, j2] *= omega^(j2 k1)
    4. all-to-all: column blocks -> full rows          [transpose #2]
    5. local row NTTs of size n2     (root omega^D)
  output X[k2*D + k1] lives on device k1 at local k2 — the cyclic layout.

  inverse (cyclic in, block out) runs the same dance backwards with inverse
  roots, 1/n2 and 1/D scaling folded into the two local INTTs.

Every local transform reuses the single-device `ntt_stages` kernel; the
twiddle matrix rides in as a sharded operand so each device keeps only its
(D, n2/D) slice.

All functions here are *local* (per-shard) computations meant to be called
inside `jax.shard_map` with axis name `mesh.AXIS`; `coset_fft_dist` /
`coset_ifft_dist` add the coset shift / unshift (domain.rs:153-174 semantics)
using block-sharded power tables.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..field.babybear import P, MONT_R
from ..ops.ntt import ntt_stages, _twiddle_tables, np_powers
from .mesh import AXIS

_U32 = jnp.uint32


def _mont(v: np.ndarray) -> np.ndarray:
    return (v * np.uint64(MONT_R) % np.uint64(P)).astype(np.uint32)


@functools.lru_cache(maxsize=32)
def plan_tables(N: int, D: int, omega: int):
    """Host-precomputed constants for a size-N transform over D shards.

    Returns dict with per-stage twiddle tuples for the size-D column
    transform and size-n2 row transform (forward + inverse), the n2^-1 / D^-1
    scales, and the full (D, n2) step-3 twiddle matrices (Montgomery form) to
    be passed in sharded on axis 1.
    """
    n2 = N // D
    omega_col = pow(omega, n2, P)   # order D
    omega_row = pow(omega, D, P)    # order n2
    inv_omega = pow(omega, P - 2, P)

    def tw(n, om):
        return tuple(jnp.asarray(t) for t in _twiddle_tables(n, om))

    if n2 % D != 0:
        # Tiny-transform fallback (N < D^2, i.e. each shard holds fewer than
        # D elements): the four-step's all-to-all needs D | n2 to split the
        # local block into D equal chunks. Rather than precondition the mesh
        # (the round-1..3 `D^2 | lde_size` assert), gather the whole vector —
        # it is under D^2 elements, noise at any mesh width where this path
        # triggers — and run the full transform replicated on every shard.
        return dict(
            D=D, n2=n2, small=True,
            full_fwd=tw(N, omega),
            full_inv=tw(N, pow(omega, P - 2, P)),
            inv_N_mont=pow(N, P - 2, P) * MONT_R % P,
            # step-3 twiddles are unused on this path; keep (D, D) zero
            # placeholders so callers can pass plan["W"] sharded on axis 1
            # (local slice (D, 1)) without branching
            W=np.zeros((D, D), np.uint32),
            W_inv=np.zeros((D, D), np.uint32),
        )

    # step-3 twiddle matrix W[k1, j2] = omega^(j2*k1); inverse uses omega^-1
    rows = []
    rows_inv = []
    for k1 in range(D):
        rows.append(np_powers(pow(omega, k1, P), n2))
        rows_inv.append(np_powers(pow(inv_omega, k1, P), n2))
    W = _mont(np.stack(rows))          # (D, n2)
    W_inv = _mont(np.stack(rows_inv))  # (D, n2)

    return dict(
        D=D,
        n2=n2,
        col_fwd=tw(D, omega_col),
        col_inv=tw(D, pow(omega_col, P - 2, P)),
        row_fwd=tw(n2, omega_row),
        row_inv=tw(n2, pow(omega_row, P - 2, P)),
        inv_n2_mont=pow(n2, P - 2, P) * MONT_R % P,
        inv_D_mont=pow(D, P - 2, P) * MONT_R % P,
        W=W,
        W_inv=W_inv,
    )


def ntt_forward_local(x_loc: jnp.ndarray, W_loc: jnp.ndarray, plan) -> jnp.ndarray:
    """Local body of the forward transform (block in -> cyclic out).

    x_loc: (n2,) this device's contiguous block. W_loc: (D, n2/D) its slice
    of the step-3 twiddle matrix. Returns (n2,) = X[k2*D + d] for k2 < n2.
    """
    D, n2 = plan["D"], plan["n2"]
    if plan.get("small"):
        # N < D^2 fallback: gather the (tiny) whole vector, transform it
        # replicated, keep this shard's cyclic subsequence X[j*D + d]
        full = jax.lax.all_gather(x_loc, AXIS, axis=0).reshape(D * n2)
        y = ntt_stages(full, plan["full_fwd"])
        d = jax.lax.axis_index(AXIS)
        return jax.lax.dynamic_slice_in_dim(
            y.reshape(n2, D).T, d, 1, axis=0
        )[0]
    # 1. transpose #1: block rows -> column blocks (device d keeps columns
    #    j2 in its block, all rows)
    cm = jax.lax.all_to_all(x_loc.reshape(D, n2 // D), AXIS, 0, 0)
    cm = cm.reshape(D, n2 // D)
    # 2. column DFTs (size D) along axis 0
    cm = ntt_stages(cm.T, plan["col_fwd"]).T
    # 3. twiddle
    cm = bb.mont_mul(cm, W_loc)
    # 4. transpose #2: column blocks -> full rows
    rm = jax.lax.all_to_all(cm, AXIS, 0, 0).reshape(n2)
    # 5. row NTT (size n2)
    return ntt_stages(rm, plan["row_fwd"])


def ntt_inverse_local(y_loc: jnp.ndarray, W_inv_loc: jnp.ndarray, plan) -> jnp.ndarray:
    """Local body of the inverse transform (cyclic in -> block out)."""
    D, n2 = plan["D"], plan["n2"]
    if plan.get("small"):
        # cyclic local rows -> natural full vector on every shard
        g = jax.lax.all_gather(y_loc, AXIS, axis=0)      # (D, n2)
        full = jnp.swapaxes(g, 0, 1).reshape(D * n2)
        a = ntt_stages(full, plan["full_inv"])
        a = bb.mont_mul(a, jnp.uint32(plan["inv_N_mont"]))
        d = jax.lax.axis_index(AXIS)
        return jax.lax.dynamic_slice_in_dim(a, d * n2, n2)
    # 1. row INTT over k2 (size n2): recovers A[d, j2]
    a = ntt_stages(y_loc, plan["row_inv"])
    a = bb.mont_mul(a, jnp.uint32(plan["inv_n2_mont"]))
    # 2. transpose: row-per-device -> column blocks
    cm = jax.lax.all_to_all(a.reshape(D, n2 // D), AXIS, 0, 0)
    cm = cm.reshape(D, n2 // D)
    # 3. un-twiddle
    cm = bb.mont_mul(cm, W_inv_loc)
    # 4. column INTT (size D) along axis 0
    cm = ntt_stages(cm.T, plan["col_inv"]).T
    cm = bb.mont_mul(cm, jnp.uint32(plan["inv_D_mont"]))
    # 5. transpose: column blocks -> block rows
    return jax.lax.all_to_all(cm, AXIS, 0, 0).reshape(n2)


@functools.lru_cache(maxsize=32)
def shift_tables_np(N: int, shift: int):
    """(shift^i, shift^-i) power tables (Montgomery), as host arrays to be
    block-sharded."""
    fwd = _mont(np_powers(shift, N))
    bwd = _mont(np_powers(pow(shift, P - 2, P), N))
    return fwd, bwd


def coset_fft_local(coeffs_loc, shiftpow_loc, W_loc, plan):
    """coeffs (block) -> coset evals (cyclic): shift then forward NTT."""
    return ntt_forward_local(bb.mont_mul(coeffs_loc, shiftpow_loc), W_loc, plan)


def coset_ifft_local(evals_loc, shiftinv_loc, W_inv_loc, plan):
    """coset evals (cyclic) -> coeffs (block): inverse NTT then unshift."""
    out = ntt_inverse_local(evals_loc, W_inv_loc, plan)
    return bb.mont_mul(out, shiftinv_loc)
