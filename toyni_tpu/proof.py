"""Proof data structures + serialization.

Field-for-field mirror of the reference's proof objects
(reference: src/fibonacci.rs:25-86) plus a canonical byte serialization the
reference lacks (it keeps proofs as in-memory structs only); the wire format
here makes proofs checkpointable and transportable between hosts.
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass, field

from .merkle import MerkleProof


@dataclass
class MerkleOpening:
    """Opening of one position in a committed layer (src/fibonacci.rs:25-33).
    The leaf preimage is salt || value8LE (salt empty for unsalted trees)."""

    index: int
    value: int
    proof: MerkleProof
    salt: bytes


@dataclass
class QueryProof:
    """Everything needed to check one query position across all FRI layers
    (src/fibonacci.rs:37-59)."""

    index: int
    deep_opening: MerkleOpening
    deep_opening_pair: MerkleOpening
    trace_opening: MerkleOpening
    trace_opening_g: MerkleOpening
    trace_opening_gg: MerkleOpening
    quotient_opening: MerkleOpening
    fri_openings: list  # list[tuple[MerkleOpening, MerkleOpening]]


@dataclass
class StarkProof:
    """A complete STARK proof (src/fibonacci.rs:62-86)."""

    trace_len: int
    lde_size: int
    trace_commitment: bytes
    quotient_commitment: bytes
    t_z: int
    t_gz: int
    t_ggz: int
    q_z: int
    fri_commitments: list  # list[bytes]
    fri_final_layer: list  # list[int]
    query_proofs: list  # list[QueryProof]


# ── serialization (wire format v1) ──────────────────────────────────────────
#
# All integers little-endian. Layout:
#   magic "TSTK" | u16 version | u64 trace_len | u64 lde_size
#   | 32B trace_commitment | 32B quotient_commitment
#   | u64 t_z t_gz t_ggz q_z
#   | u32 n_fri_commitments | 32B each
#   | u32 final_len | u64 each
#   | u32 n_queries | QueryProof each

_MAGIC = b"TSTK"
_VERSION = 1


def _w_u16(buf, v): buf.write(struct.pack("<H", v))
def _w_u32(buf, v): buf.write(struct.pack("<I", v))
def _w_u64(buf, v): buf.write(struct.pack("<Q", v))
def _r_u16(buf): return struct.unpack("<H", buf.read(2))[0]
def _r_u32(buf): return struct.unpack("<I", buf.read(4))[0]
def _r_u64(buf): return struct.unpack("<Q", buf.read(8))[0]


def _write_opening(buf, op: MerkleOpening):
    _w_u64(buf, op.index)
    _w_u64(buf, op.value)
    _w_u32(buf, len(op.salt))
    buf.write(op.salt)
    _w_u32(buf, len(op.proof.path))
    for sib, pos in zip(op.proof.path, op.proof.position):
        buf.write(sib)
        buf.write(b"\x01" if pos else b"\x00")


def _read_opening(buf) -> MerkleOpening:
    index = _r_u64(buf)
    value = _r_u64(buf)
    salt = buf.read(_r_u32(buf))
    n = _r_u32(buf)
    path, position = [], []
    for _ in range(n):
        path.append(buf.read(32))
        position.append(buf.read(1) == b"\x01")
    return MerkleOpening(index, value, MerkleProof(path, position), salt)


def serialize(proof: StarkProof) -> bytes:
    buf = io.BytesIO()
    buf.write(_MAGIC)
    _w_u16(buf, _VERSION)
    _w_u64(buf, proof.trace_len)
    _w_u64(buf, proof.lde_size)
    buf.write(proof.trace_commitment)
    buf.write(proof.quotient_commitment)
    for v in (proof.t_z, proof.t_gz, proof.t_ggz, proof.q_z):
        _w_u64(buf, v)
    _w_u32(buf, len(proof.fri_commitments))
    for c in proof.fri_commitments:
        buf.write(c)
    _w_u32(buf, len(proof.fri_final_layer))
    for v in proof.fri_final_layer:
        _w_u64(buf, v)
    _w_u32(buf, len(proof.query_proofs))
    for qp in proof.query_proofs:
        _w_u64(buf, qp.index)
        for op in (qp.deep_opening, qp.deep_opening_pair, qp.trace_opening,
                   qp.trace_opening_g, qp.trace_opening_gg, qp.quotient_opening):
            _write_opening(buf, op)
        _w_u32(buf, len(qp.fri_openings))
        for a, b in qp.fri_openings:
            _write_opening(buf, a)
            _write_opening(buf, b)
    return buf.getvalue()


def deserialize(data: bytes) -> StarkProof:
    buf = io.BytesIO(data)
    assert buf.read(4) == _MAGIC, "bad magic"
    assert _r_u16(buf) == _VERSION, "unsupported proof version"
    trace_len = _r_u64(buf)
    lde_size = _r_u64(buf)
    trace_commitment = buf.read(32)
    quotient_commitment = buf.read(32)
    t_z, t_gz, t_ggz, q_z = (_r_u64(buf) for _ in range(4))
    fri_commitments = [buf.read(32) for _ in range(_r_u32(buf))]
    fri_final_layer = [_r_u64(buf) for _ in range(_r_u32(buf))]
    query_proofs = []
    for _ in range(_r_u32(buf)):
        index = _r_u64(buf)
        ops = [_read_opening(buf) for _ in range(6)]
        fri_openings = []
        for _ in range(_r_u32(buf)):
            a = _read_opening(buf)
            b = _read_opening(buf)
            fri_openings.append((a, b))
        query_proofs.append(QueryProof(index, *ops, fri_openings))
    return StarkProof(
        trace_len, lde_size, trace_commitment, quotient_commitment,
        t_z, t_gz, t_ggz, q_z, fri_commitments, fri_final_layer, query_proofs,
    )
