"""Native host runtime: C++ CPU NTT oracle + SHA-256/Merkle, loaded via
ctypes. Builds on first import with g++ and degrades gracefully to the pure
Python/NumPy paths when no toolchain is available — the counterpart of the
reference's nvcc-probe-and-degrade build (reference: build.rs:28-37)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "toyni_host.cpp")
_SO = os.path.join(_DIR, "libtoyni_host.so")

_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # toolchain missing / compile error: degrade
        print(f"toyni_tpu.native: build skipped ({e})", file=sys.stderr)
        return False


def load():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:  # don't re-pay a failed compile on every call
        return None
    _hdr = os.path.join(os.path.dirname(_SRC), "poseidon2_params.h")
    _newest_src = max(
        os.path.getmtime(_SRC),
        os.path.getmtime(_hdr) if os.path.exists(_hdr) else 0,
    )
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < _newest_src:
        if not _build():
            _build_failed = True
            return None
    lib = ctypes.CDLL(_SO)
    u64 = ctypes.c_uint64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.bb_ntt.argtypes = [u64p, u64, u64]
    lib.bb_intt.argtypes = [u64p, u64, u64]
    lib.bb_pow.argtypes = [u64, u64]
    lib.bb_pow.restype = u64
    lib.sha256_batch.argtypes = [u8p, u64, u64, u8p]
    lib.merkle_leaf_hashes.argtypes = [u8p, u64, u64, u8p]
    lib.merkle_build_levels.argtypes = [u8p, u64, u8p]
    lib.merkle_verify.argtypes = [u8p, u64, u8p, u8p, u64, u8p]
    lib.merkle_verify.restype = ctypes.c_int
    lib.stark_verify_v1.argtypes = [u8p, u64, u64, u64, u64, u64,
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.stark_verify_v1.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _require():
    """load() or a clear error — callers are expected to gate on
    `available()`; this turns a missed gate into an explicit failure
    instead of an AttributeError on None."""
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable (no C++ toolchain)")
    return lib


def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def ntt(values: np.ndarray, omega: int) -> np.ndarray:
    """Native CPU NTT (in the semantics of the reference src/ntt.rs:24-53)."""
    lib = _require()
    v = np.ascontiguousarray(values, np.uint64) % np.uint64(2013265921)
    lib.bb_ntt(_u64p(v), len(v), omega)
    return v


def intt(values: np.ndarray, omega: int) -> np.ndarray:
    lib = _require()
    v = np.ascontiguousarray(values, np.uint64) % np.uint64(2013265921)
    lib.bb_intt(_u64p(v), len(v), omega)
    return v


def sha256_batch(msgs: np.ndarray) -> np.ndarray:
    """(count, msg_len) u8 -> (count, 32) u8 digests."""
    lib = _require()
    m = np.ascontiguousarray(msgs, np.uint8)
    out = np.empty((m.shape[0], 32), np.uint8)
    lib.sha256_batch(_u8p(m), m.shape[1], m.shape[0], _u8p(out))
    return out


def merkle_leaf_hashes(leaves: np.ndarray) -> np.ndarray:
    """(count, leaf_len) u8 preimages -> (count, 32) tagged leaf digests."""
    lib = _require()
    m = np.ascontiguousarray(leaves, np.uint8)
    out = np.empty((m.shape[0], 32), np.uint8)
    lib.merkle_leaf_hashes(_u8p(m), m.shape[1], m.shape[0], _u8p(out))
    return out


def merkle_build_levels(leaf_digests: np.ndarray) -> list:
    """(count, 32) u8 leaf digests -> list of upper levels (each (k, 32))."""
    lib = _require()
    d = np.ascontiguousarray(leaf_digests, np.uint8)
    count = d.shape[0]
    sizes = []
    n = count
    while n > 1:
        n = (n + 1) // 2
        sizes.append(n)
    total = sum(sizes)
    buf = np.empty((total, 32), np.uint8)
    lib.merkle_build_levels(_u8p(d), count, _u8p(buf))
    levels, off = [], 0
    for s in sizes:
        levels.append(buf[off : off + s].copy())
        off += s
    return levels


def _air_id(air) -> int:
    """Bundled-AIR identifier for the native verifier (custom AIRs stay on
    the Python verifier — their constraints are arbitrary callables)."""
    from ..air import FibonacciAir, PairFibonacciAir, SboxChainAir

    if air is None or isinstance(air, FibonacciAir):
        return 0
    if isinstance(air, PairFibonacciAir):
        return 1
    if isinstance(air, SboxChainAir):
        return 2
    raise NotImplementedError(
        "native verifier covers the bundled AIRs; use the Python verifier "
        "for custom constraint systems"
    )


def verify_proof_blob(blob: bytes, config=None, air=None) -> bool:
    """Full native verification of a SERIALIZED proof (wire v1-v5) for a
    bundled AIR: the reference protocol (Fibonacci, v1), its ext-challenge
    mode (v2), the multi-column/multi-constraint formats (v3/v4 with
    PairFibonacci or SboxChain), and the Poseidon2-commitment format (v5,
    any shape). Parses, replays the transcript, and runs every check of
    toyni_tpu/verifier.py in C — the production host-verify path; the
    Python verifier remains the bit-exactness oracle (differential-tested,
    incl. the tamper fuzz). Raises ValueError on a malformed blob
    (mirroring proof.deserialize)."""
    import struct

    from ..config import DEFAULT_CONFIG

    cfg = config or DEFAULT_CONFIG
    lib = load()
    if lib is None:
        raise RuntimeError("native runtime unavailable (no C++ toolchain)")
    if len(blob) < 16:
        raise ValueError("truncated proof")
    # the C side validates trace_len (clean reject 0 — same verdict the
    # Python verifier gives); only peek it here for the final-size formula.
    # v5 inserts a u16 flags field before trace_len.
    version = struct.unpack_from("<H", blob, 4)[0]
    n = struct.unpack_from("<Q", blob, 8 if version == 5 else 6)[0]
    final_size = cfg.final_layer_size(n) if n else 0
    b = np.frombuffer(blob, np.uint8)
    rc = lib.stark_verify_v1(
        _u8p(b), len(blob), cfg.num_queries, cfg.blowup, cfg.coset_shift,
        final_size, int(bool(cfg.ext_challenges)), _air_id(air),
        int(getattr(cfg, "hash", "sha256") != "sha256"),
    )
    if rc < 0:
        raise ValueError("corrupt proof blob")
    return bool(rc)


def merkle_verify(leaf: bytes, path: list, positions: list, root: bytes) -> bool:
    lib = _require()
    lf = np.frombuffer(leaf, np.uint8)
    pa = np.frombuffer(b"".join(path), np.uint8) if path else np.empty(0, np.uint8)
    po = np.array([1 if p else 0 for p in positions], np.uint8)
    rt = np.frombuffer(root, np.uint8)
    return bool(
        lib.merkle_verify(_u8p(lf), len(leaf), _u8p(pa), _u8p(po), len(positions), _u8p(rt))
    )
