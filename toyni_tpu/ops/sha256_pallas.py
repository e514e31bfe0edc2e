"""Pallas TPU kernels: fused SHA-256 leaf/node hashing.

The jnp SHA-256 in ops.sha256 materializes the message schedule window in HBM
every round (~12 KB of traffic per hash); these kernels keep the entire
compression in registers — HBM traffic is exactly read-message + write-digest
(~56-96 B per hash), and all 64 rounds are unrolled over a single (8, 128)
vreg tile so the Mosaic program stays small.

Layouts are PLANAR (word-major): digests are (8, N) uint32 — word w of lane i
at [w, i] — so every kernel operand is a wide 2-D tile. Conversion to the
(N, 8) row-major layout used at the host boundary is a transpose.

Message formats are the protocol's three fixed shapes (reference:
src/merkle.rs:105-123, src/fibonacci.rs:340-363):
  salted leaf   SHA256(0x00 || salt16 || value8LE)
  unsalted leaf SHA256(0x00 || value8LE)
  inner node    SHA256(0x01 || left32 || right32)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sha256 import _H0, _K

_U32 = jnp.uint32
# Sublane rows per program. Each SHA round is a serial dependency chain, so a
# program must carry several independent vregs per op (rows/8) to keep the
# VPU pipeline full; 64 rows = 8 vregs in flight = 8192 hashes per program.
_ROWS = 64
_LANE = 128


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


def _compress_words(w: list, state=None):
    """One unrolled compression of 16 message-word registers; returns the
    8-word state. Each w[t] is an arbitrary-shape u32 array."""
    if state is None:
        st = [jnp.full_like(w[0], int(h)) for h in _H0]
    else:
        st = list(state)
    a, b, c, d, e, f, g, h = st
    win = list(w)
    for t in range(64):
        w_t = win[0]
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + jnp.uint32(int(_K[t])) + w_t
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        s0 = _rotr(win[1], 7) ^ _rotr(win[1], 18) ^ (win[1] >> 3)
        s1 = _rotr(win[14], 17) ^ _rotr(win[14], 19) ^ (win[14] >> 10)
        new_w = win[0] + s0 + win[9] + s1
        win = win[1:] + [new_w]
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    out0 = [a, b, c, d, e, f, g, h]
    return [s + o for s, o in zip(st, out0)]


def _salted_leaf_kernel(v_ref, s_ref, o_ref):
    """v: (R, 128) values; s: (4, R, 128) salt words (BE); o: (8, R, 128)."""
    v = v_ref[:]
    s0, s1, s2, s3 = (s_ref[k] for k in range(4))
    z = jnp.zeros_like(v)
    w = [
        s0 >> 8,                                   # 0x00<<24 | salt bytes
        ((s0 & 0xFF) << 24) | (s1 >> 8),
        ((s1 & 0xFF) << 24) | (s2 >> 8),
        ((s2 & 0xFF) << 24) | (s3 >> 8),
        ((s3 & 0xFF) << 24) | ((v & 0xFF) << 16)
        | (((v >> 8) & 0xFF) << 8) | ((v >> 16) & 0xFF),
        ((v >> 24) & 0xFF) << 24,
        z + jnp.uint32(0x00800000),
        z, z, z, z, z, z, z, z,
        z + jnp.uint32(200),                       # 25-byte message, 200 bits
    ]
    st = _compress_words(w)
    for k in range(8):
        o_ref[k] = st[k]


def _unsalted_leaf_kernel(v_ref, o_ref):
    v = v_ref[:]
    z = jnp.zeros_like(v)
    w = [
        ((v & 0xFF) << 16) | (((v >> 8) & 0xFF) << 8) | ((v >> 16) & 0xFF),
        ((v >> 24) & 0xFF) << 24,
        z + jnp.uint32(0x00800000),
        z, z, z, z, z, z, z, z, z, z, z, z,
        z + jnp.uint32(72),                        # 9-byte message
    ]
    st = _compress_words(w)
    for k in range(8):
        o_ref[k] = st[k]


def _node_kernel(l_ref, r_ref, o_ref):
    """l, r: (8, R, 128) digests; o: (8, R, 128). 65-byte message, 2 blocks."""
    l = [l_ref[k] for k in range(8)]
    r = [r_ref[k] for k in range(8)]
    z = jnp.zeros_like(l[0])
    w = [jnp.uint32(0x01 << 24) | (l[0] >> 8)]
    for i in range(1, 8):
        w.append(((l[i - 1] & 0xFF) << 24) | (l[i] >> 8))
    w.append(((l[7] & 0xFF) << 24) | (r[0] >> 8))
    for i in range(1, 8):
        w.append(((r[i - 1] & 0xFF) << 24) | (r[i] >> 8))
    st = _compress_words(w)  # block 1 (w has 16 entries; w15 ends at byte 63)
    w2 = [((r[7] & 0xFF) << 24) | jnp.uint32(0x00800000)]
    w2 += [z] * 14
    w2.append(z + jnp.uint32(520))                 # 65-byte message
    st = _compress_words(w2, state=st)
    for k in range(8):
        o_ref[k] = st[k]


def _interpret(x) -> bool:
    try:
        return next(iter(x.devices())).platform != "tpu"
    except Exception:
        return jax.default_backend() != "tpu"


class _FakeRef:
    """Array-backed Ref shim: off-TPU the kernels run as plain *eager* jnp
    through this (bit-identical logic, same code path). Neither Pallas
    interpret mode nor a jitted version is usable off-TPU: XLA:CPU compile of
    the unrolled 64-round compression takes unbounded time, so the emulation
    stays eager (and the wrappers below are deliberately not jitted)."""

    def __init__(self, arr=None):
        self.arr = arr

    def __getitem__(self, idx):
        return self.arr[idx]

    def __setitem__(self, idx, val):
        if self.arr is None:
            raise ValueError("unallocated output ref")
        self.arr = self.arr.at[idx].set(val)


def _emulate(kernel, out_shape, *inputs):
    refs = [_FakeRef(x) for x in inputs]
    out = _FakeRef(jnp.zeros(out_shape, _U32))
    kernel(*refs, out)
    return out.arr


def _pad_to(v: jnp.ndarray, mult: int):
    n = v.shape[-1]
    pad = (-n) % mult
    if pad:
        v = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, pad)])
    return v, n


def _run_salted(v2d, s3d, *, interpret=False):
    R = v2d.shape[0]
    if interpret:
        return _emulate(_salted_leaf_kernel, (8, R, _LANE), v2d, s3d)
    return pl.pallas_call(
        _salted_leaf_kernel,
        out_shape=jax.ShapeDtypeStruct((8, R, _LANE), _U32),
        grid=(R // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _ROWS, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _ROWS, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    )(v2d, s3d)


def _run_unsalted(v2d, *, interpret=False):
    R = v2d.shape[0]
    if interpret:
        return _emulate(_unsalted_leaf_kernel, (8, R, _LANE), v2d)
    return pl.pallas_call(
        _unsalted_leaf_kernel,
        out_shape=jax.ShapeDtypeStruct((8, R, _LANE), _U32),
        grid=(R // _ROWS,),
        in_specs=[
            pl.BlockSpec((_ROWS, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _ROWS, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    )(v2d)


def _run_nodes(l3d, r3d, *, interpret=False):
    R = l3d.shape[1]
    if interpret:
        return _emulate(_node_kernel, (8, R, _LANE), l3d, r3d)
    return pl.pallas_call(
        _node_kernel,
        out_shape=jax.ShapeDtypeStruct((8, R, _LANE), _U32),
        grid=(R // _ROWS,),
        in_specs=[
            pl.BlockSpec((8, _ROWS, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _ROWS, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _ROWS, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    )(l3d, r3d)


_CHUNK = _ROWS * _LANE  # minimum padding granule (1024 lanes)


def hash_salted_leaves_planar(values: jnp.ndarray, salt_words: jnp.ndarray):
    """values (N,) u32, salt_words (4, N) u32 BE -> planar digests (8, N)."""
    interp = _interpret(values)
    v, n = _pad_to(values, _CHUNK)
    s, _ = _pad_to(salt_words, _CHUNK)
    R = v.shape[0] // _LANE
    out = _run_salted(
        v.reshape(R, _LANE), s.reshape(4, R, _LANE), interpret=interp
    )
    return out.reshape(8, R * _LANE)[:, :n]


def hash_unsalted_leaves_planar(values: jnp.ndarray):
    interp = _interpret(values)
    v, n = _pad_to(values, _CHUNK)
    R = v.shape[0] // _LANE
    out = _run_unsalted(v.reshape(R, _LANE), interpret=interp)
    return out.reshape(8, R * _LANE)[:, :n]


def hash_nodes_planar(left: jnp.ndarray, right: jnp.ndarray):
    """left/right (8, M) planar digests -> (8, M) parent digests."""
    interp = _interpret(left)
    l, m = _pad_to(left, _CHUNK)
    r, _ = _pad_to(right, _CHUNK)
    R = l.shape[1] // _LANE
    out = _run_nodes(
        l.reshape(8, R, _LANE), r.reshape(8, R, _LANE), interpret=interp
    )
    return out.reshape(8, R * _LANE)[:, :m]


def salts_to_words(salts_u8: np.ndarray) -> np.ndarray:
    """(N, 16) u8 salts -> (4, N) u32 big-endian words (host)."""
    w = salts_u8.reshape(-1, 4, 4)
    w32 = (
        (w[:, :, 0].astype(np.uint32) << 24)
        | (w[:, :, 1].astype(np.uint32) << 16)
        | (w[:, :, 2].astype(np.uint32) << 8)
        | w[:, :, 3].astype(np.uint32)
    )
    return np.ascontiguousarray(w32.T)
