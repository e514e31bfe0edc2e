"""Device-mesh helpers.

The reference has no distributed story at all (its only parallel hardware
path is one CUDA device; survey of deps: rand + sha2 only). This framework
scales over a 1-D `jax.sharding.Mesh` of TPU chips: the length-N
codeword is the "sequence" being sharded, collectives ride ICI.

Layout conventions used throughout `parallel/`:

* **block layout**: global vector v (N,) sharded contiguously — device d owns
  v[d*N/D : (d+1)*N/D]. Natural for coefficient vectors entering the NTT.
* **cyclic layout**: device d owns v[i] with i ≡ d (mod D), represented as a
  global (D, N/D) array (row d = device d's subsequence, local index j ↔
  global i = j*D + d) sharded on axis 0. This is the layout the distributed
  NTT *outputs*, and it is closed under every FRI fold (pairs (i, i+half)
  share i mod D whenever D | half). Trace rolls by the blowup are local
  when D | blowup and otherwise cost one boundary `ppermute`
  (`roll_cyclic_local`) — so the constraint/quotient/DEEP/FRI pipeline
  runs with (at most ns-1 single-hop permutes of) communication between
  the NTT and the Merkle commits, on any mesh width.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

AXIS = "shards"


def roll_cyclic_local(x_loc, r: int, D: int, axis: int = 0):
    """Inside shard_map: this shard's slice of the global roll-by-`-r` of a
    cyclic-layout vector (w[i] = v[(i + r) mod N], the trace-shift direction
    jnp.roll(v, -r)).

    When D | r the rolled value at global j*D + d is v[(j + r/D)*D + d] —
    the shard assignment is unchanged and this is a pure local roll (the
    round-1..3 fast path, which required D | blowup). For general r =
    q*D + s the data for shard d lives on shard (d + s) mod D, at local
    offset q or q + 1 depending on whether d + s wraps past D — one
    `ppermute` around the shard ring with a per-shard choice between the two
    local shifts. So trace rolls cost at most one boundary permute on ANY
    mesh width; no D | blowup precondition remains."""
    m = x_loc.shape[axis]
    r %= D * m
    q, s = divmod(r, D)
    if s == 0:
        return jnp.roll(x_loc, -q, axis=axis) if q else x_loc
    d = jax.lax.axis_index(AXIS)
    send = jnp.where(
        d >= s,
        jnp.roll(x_loc, -q, axis=axis),
        jnp.roll(x_loc, -(q + 1), axis=axis),
    )
    perm = [(src, (src - s) % D) for src in range(D)]
    return jax.lax.ppermute(send, AXIS, perm)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        # host-major ordering: each process's devices contiguous on the shard
        # axis, so contiguous sub-blocks of every collective stay on-host in
        # multi-process runs (see parallel/multihost.py); identical to the
        # id ordering in single-process runs
        devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        if n_devices is not None and len(devices) < n_devices:
            # fall back to the (virtual) CPU backend for mesh emulation —
            # the testing analog of real multi-chip hardware
            devices = jax.local_devices(backend="cpu")
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices}-device mesh but only "
                f"{len(devices)} devices exist"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def block_spec() -> PartitionSpec:
    """(N,) vector, contiguous blocks."""
    return PartitionSpec(AXIS)


def cyclic_spec() -> PartitionSpec:
    """(D, N/D) cyclic representation, row-sharded."""
    return PartitionSpec(AXIS, None)


def replicated_spec() -> PartitionSpec:
    return PartitionSpec()


def to_cyclic_np(v: np.ndarray, D: int) -> np.ndarray:
    """Host reshape of a global (N, ...) array into (D, N/D, ...) cyclic form:
    out[d, j] = v[j*D + d]."""
    n = v.shape[0]
    return np.ascontiguousarray(v.reshape(n // D, D, *v.shape[1:]).swapaxes(0, 1))


def from_cyclic_np(c: np.ndarray) -> np.ndarray:
    """Inverse of `to_cyclic_np`: (D, N/D, ...) -> (N, ...)."""
    D, m = c.shape[0], c.shape[1]
    return np.ascontiguousarray(c.swapaxes(0, 1)).reshape(D * m, *c.shape[2:])
