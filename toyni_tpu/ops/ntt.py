"""Number-theoretic transform over BabyBear, TPU-native.

Functionally equivalent to the reference's CPU NTT (reference: src/ntt.rs:24-66)
and CUDA NTT (cuda/ntt_kernel.cu:119-143), but structured for XLA: no in-place
scalar butterflies — each of the log2(n) stages is a whole-array reshape +
vectorized Montgomery butterfly, so the VPU processes n/2 butterflies per stage
in parallel. The bit-reverse permutation is a single static gather.

Twiddle tables are precomputed per (n, omega) in Montgomery form and cached —
the analog of the reference CUDA path's persistent per-size `NttCtx`
(cuda/ntt_kernel.cu:202-292, src/ntt.rs:128-141); here the table cache plus
XLA's compilation cache (keyed on shape) play that role, with no H2D/D2H
round-trips because everything stays on device.

Transforms apply along the **last** axis; leading axes are batch (used e.g. by
the extension-field transform = 4 batched base transforms).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import babybear as bb
from ..field.babybear import P, MONT_R

_U32 = jnp.uint32


def bit_reverse_permutation(n: int) -> np.ndarray:
    """Index array rev such that out[i] = in[rev[i]] (src/ntt.rs:13-21)."""
    log_n = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    x = idx.copy()
    for _ in range(log_n):
        rev = (rev << 1) | (x & 1)
        x >>= 1
    return rev


def np_powers(base: int, n: int) -> np.ndarray:
    """[base^0 .. base^(n-1)] mod p as numpy uint64, via the vectorized binary
    method (log n passes; u64 products of 31-bit values are exact)."""
    base %= P
    idx = np.arange(n, dtype=np.uint64)
    result = np.ones(n, np.uint64)
    sq = base
    for b in range(max(1, (n - 1).bit_length())):
        bit = (idx >> np.uint64(b)) & np.uint64(1)
        result = np.where(bit == 1, result * np.uint64(sq) % np.uint64(P), result)
        sq = sq * sq % P
    return result


@functools.lru_cache(maxsize=64)
def _twiddle_tables_np(n: int, omega: int) -> tuple:
    """Host (numpy) twiddle construction; see `_twiddle_tables`."""
    tables = []
    log_n = n.bit_length() - 1
    for s in range(1, log_n + 1):
        length = 1 << s
        half = length >> 1
        w_len = pow(omega, n // length, P)
        tw = np_powers(w_len, half) * np.uint64(MONT_R) % np.uint64(P)
        tables.append(tw.astype(np.uint32))
    return tuple(tables)


@functools.lru_cache(maxsize=64)
def _twiddle_tables(n: int, omega: int) -> tuple:
    """Per-stage twiddle vectors in Montgomery form, cached as DEVICE arrays
    (uploaded once per process — repeating the host->device transfer per
    transform costs seconds of tunnel time at 2^20+).

    Stage s (len = 2^s) uses [omega^(n/len * j) for j < len/2] — the same
    packed-table layout as the CUDA kernel (cuda/ntt_kernel.cu:145-185), kept
    per-stage so each stage's broadcast is shape-exact.
    """
    with jax.ensure_compile_time_eval():
        return tuple(jnp.asarray(t) for t in _twiddle_tables_np(n, omega))


@functools.lru_cache(maxsize=64)
def _bitrev(n: int) -> np.ndarray:
    return bit_reverse_permutation(n)


def ntt_stages(values: jnp.ndarray, twiddles: tuple) -> jnp.ndarray:
    """Apply bit-reverse + all butterfly stages. `twiddles` is a tuple of
    per-stage uint32 arrays (Montgomery form), stage s having 2^s entries."""
    n = values.shape[-1]
    log_n = n.bit_length() - 1
    assert len(twiddles) == log_n
    v = jnp.take(values, jnp.asarray(_bitrev(n)), axis=-1)
    lead = values.shape[:-1]
    for s in range(1, log_n + 1):
        length = 1 << s
        half = length >> 1
        v = v.reshape(*lead, n // length, 2, half)
        u = v[..., 0, :]
        t = bb.mont_mul(v[..., 1, :], twiddles[s - 1])
        v = jnp.concatenate([bb.add(u, t), bb.sub(u, t)], axis=-1)
        v = v.reshape(*lead, n)
    return v


# ── TPU-efficient layout: transform along axis 0 with wide lanes ─────────────
#
# The flat last-axis butterfly above produces trailing dims of size `half`,
# which is < 128 for the first 7 stages — each (8,128) VPU tile then carries
# almost no useful lanes. The fix: keep a WIDE second axis as pure batch and
# butterfly along axis 0, so every stage is full-width elementwise work; large
# 1-D transforms are decomposed four-step into two such batched passes.

def _r2_stage(v, twiddles, s: int, n1: int, B: int):
    """One radix-2 DIT stage s (len 2q) on a (…)-shaped view of (n1, B)."""
    q = 1 << (s - 1)
    v = v.reshape(n1 // (2 * q), 2, q, B)
    u, t = v[:, 0], bb.mont_mul(v[:, 1], twiddles[s - 1][None, :, None])
    return jnp.stack([bb.add(u, t), bb.sub(u, t)], axis=1)


def _r4_stages(v, twiddles, s: int, n1: int, B: int):
    """Fused stages s (len 2q) and s+1 (len 4q): radix-4 in registers."""
    q = 1 << (s - 1)
    v = v.reshape(n1 // (4 * q), 4, q, B)
    x0, x1, x2, x3 = v[:, 0], v[:, 1], v[:, 2], v[:, 3]
    w_s = twiddles[s - 1][None, :, None]            # (q,)
    w_a = twiddles[s][:q][None, :, None]            # w_{s+1}[j]
    w_b = twiddles[s][q:][None, :, None]            # w_{s+1}[q+j]
    t1 = bb.mont_mul(x1, w_s)
    t3 = bb.mont_mul(x3, w_s)
    a0, a1 = bb.add(x0, t1), bb.sub(x0, t1)
    a2, a3 = bb.add(x2, t3), bb.sub(x2, t3)
    u2 = bb.mont_mul(a2, w_a)
    u3 = bb.mont_mul(a3, w_b)
    return jnp.stack(
        [bb.add(a0, u2), bb.add(a1, u3), bb.sub(a0, u2), bb.sub(a1, u3)],
        axis=1,
    )


def ntt_axis0(x2d: jnp.ndarray, twiddles: tuple) -> jnp.ndarray:
    """Batched NTT along axis 0 of a (n1, B) array (B = lanes, ideally >=128).

    Consecutive radix-2 stages are fused in pairs (radix-4): the four outputs
    of a double butterfly are computed in registers from four inputs, so the
    array makes one HBM round trip per TWO stages — same multiply count, half
    the memory passes of the per-stage loop. Radix-4 is the measured sweet
    spot on v5e at 2^24: per-stage radix-2 ~58 ms, radix-4 6.4 ms, a fused
    radix-8 block 9.4 ms (the 8-slab block stops fusing into one pass).
    """
    n1 = x2d.shape[0]
    log_n = n1.bit_length() - 1
    assert len(twiddles) == log_n
    v = jnp.take(x2d, jnp.asarray(_bitrev(n1)), axis=0)
    B = x2d.shape[1]
    s = 1
    if log_n % 2 == 1:
        v = _r2_stage(v, twiddles, s, n1, B)
        s += 1
    while s <= log_n:
        v = _r4_stages(v, twiddles, s, n1, B)
        s += 2
    return v.reshape(n1, B)


@functools.lru_cache(maxsize=32)
def _four_step_tables(n: int, omega: int):
    """(n1, n2, col twiddle tuple, row twiddle tuple, W matrix) for the
    single-device four-step decomposition x[j1*n2+j2] -> X[k2*n1+k1]."""
    log_n = n.bit_length() - 1
    log_n1 = (log_n + 1) // 2
    n1 = 1 << log_n1
    n2 = n // n1
    col = _twiddle_tables_np(n1, pow(omega, n2, P))
    row = _twiddle_tables_np(n2, pow(omega, n1, P))
    # W[k1, j2] = omega^(k1*j2), Montgomery form; built with the binary
    # method applied row-wise (log n2 full-matrix exact u64 passes)
    r1 = np_powers(omega, n1)  # omega^k1
    idx = np.arange(n2, dtype=np.uint64)
    W = np.ones((n1, n2), np.uint64)
    sq = r1.copy()
    for b in range(max(1, (n2 - 1).bit_length())):
        bit = (idx >> np.uint64(b)) & np.uint64(1)
        W = np.where(bit[None, :] == 1, W * sq[:, None] % np.uint64(P), W)
        sq = sq * sq % np.uint64(P)
    W = (W * np.uint64(MONT_R) % np.uint64(P)).astype(np.uint32)
    return n1, n2, col, row, W


@functools.lru_cache(maxsize=32)
def _four_step_tables_dev(n: int, omega: int):
    """Device-resident copies of the four-step constants (uploaded once)."""
    n1, n2, col, row, W = _four_step_tables(n, omega)
    with jax.ensure_compile_time_eval():
        return (
            n1,
            n2,
            tuple(jnp.asarray(t) for t in col),
            tuple(jnp.asarray(t) for t in row),
            jnp.asarray(W),
        )


# flat transforms below this size (or batched inputs) skip the four-step
_FOUR_STEP_MIN = 1 << 12


_MXU_NTT = None


def _mxu_ntt_env() -> int:
    """TOYNI_MXU_NTT env override: 0 = force off (XLA four-step), 1 = the
    bf16 limb-matmul MXU recursion, 3 = the int8 balanced-digit variant
    (the auto default on TPU since round 4). Unset -> -1 (auto). The former
    =2 (fully-fused transposed-output chain) was retired in round 5 — it
    could not lower for >=3-level sizes on hardware and had no batched
    path; PERF.md keeps its measurements, git history the code."""
    global _MXU_NTT
    if _MXU_NTT is None:
        import os

        v = os.environ.get("TOYNI_MXU_NTT", "")
        _MXU_NTT = int(v) if v in ("0", "1", "3") else -1
    return _MXU_NTT


def _target_is_tpu() -> bool:
    """Whether device code dispatched now lands on a TPU — checked per call
    because tests and bench pin `jax_default_device` per leg."""
    try:
        d = jax.config.jax_default_device
        if d is not None:
            return d.platform == "tpu"
    except Exception:
        pass
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# Auto-mode size floor for the MXU path: the measured win region on v5e is
# >= 2^21 (1.24x at 2^21, 1.20x at 2^24, 1.56x at 2^25); below it the two
# paths are latency-floor-tied (2^13-2^19 within 4%) with one measured dip
# at 2^20 (0.71x), so XLA keeps the small sizes. PERF.md "MXU sweep".
_MXU_MIN = 1 << 21


def _mxu_ntt_variant() -> int:
    """Active MXU-NTT variant for this call: the env override if set, else
    the int8 balanced-digit path (v3) on TPU targets — the measured-fastest
    form since round 4 (4.47 ms / 45.0 Gbf/s at 2^24 vs 5.2 bf16 v1 and
    6.3 XLA: the 16 limb dots are ~40% of the kernel's time and the int8
    systolic path runs them at 2x the bf16 rate; PERF.md round 4) — and
    off elsewhere (on CPU the Pallas kernels would run in interpret mode,
    orders of magnitude slower than XLA)."""
    v = _mxu_ntt_env()
    if v >= 0:
        return v
    return 3 if _target_is_tpu() else 0


def _mxu_auto() -> bool:
    """True when the MXU path is active by auto-detection (no env force) —
    auto mode additionally applies the _MXU_MIN size floor."""
    return _mxu_ntt_env() < 0


def _mxu_ntt_enabled() -> bool:
    return _mxu_ntt_variant() > 0


def four_step_apply(values: jnp.ndarray, tabs) -> jnp.ndarray:
    """Apply a four-step transform given its (colt, rowt, W) tables (see
    `ntt_tables`).

    A DIF (decimation-in-frequency) formulation was tried and REVERTED: it
    removes both bit-reverse input gathers, but measured at 2^24 on v5e the
    DIF stage passes themselves run 9x slower than DIT under XLA (33.6 ms
    vs 3.9 per half — degenerate layouts on the shrinking-q reshapes) and
    the final flat output permutation is a 145 ms elementwise gather (row
    gathers move contiguous 16 KB rows at 1.2 ms; a flat 2^24 gather is
    element-at-a-time). See PERF.md.
    """
    colt, rowt, W = tabs[0], tabs[1], tabs[2]
    n1, n2 = W.shape
    x2d = values.reshape(n1, n2)
    a = ntt_axis0(x2d, colt)              # column DFTs, n2-wide lanes
    a = bb.mont_mul(a, W)                 # twiddle correction
    c = ntt_axis0(a.T, rowt)              # row DFTs, n1-wide lanes
    return c.reshape(n1 * n2)


def ntt_tables(size: int, omega: int):
    """The table pytree `apply_ntt`-style callers should pass INTO a jitted
    function as an argument. Closing a jit over these instead would bake up
    to hundreds of MB of constants into the compiled program (and into the
    remote-compile request)."""
    if size >= _FOUR_STEP_MIN:
        if _mxu_ntt_enabled() and not (_mxu_auto() and size < _MXU_MIN):
            from .ntt_mxu import mxu_ntt_tables, mxu_ntt_tables_i8

            if _mxu_ntt_variant() == 3:
                return mxu_ntt_tables_i8(size, omega)
            return mxu_ntt_tables(size, omega)
        _, _, colt, rowt, W = _four_step_tables_dev(size, omega)
        return (colt, rowt, W)
    return _twiddle_tables(size, omega)


def _is_mxu_tabs(tabs) -> bool:
    """MXU level tables: a tuple of (M_limbs (4,m,m), W|None) pairs —
    structurally distinct from both four-step and per-stage twiddle tables,
    so they can ride through jit arguments without a tag."""
    return (
        isinstance(tabs, tuple)
        and len(tabs) > 0
        and isinstance(tabs[0], tuple)
        and len(tabs[0]) == 2
        and getattr(tabs[0][0], "ndim", 0) == 3
    )


def apply_ntt(values: jnp.ndarray, tabs, size: int) -> jnp.ndarray:
    """Transform with explicitly-supplied tables (jit-argument safe)."""
    if _is_mxu_tabs(tabs):
        from .ntt_mxu import apply_mxu_ntt

        return apply_mxu_ntt(values, tabs)
    if size >= _FOUR_STEP_MIN:
        return four_step_apply(values, tabs)
    return ntt_stages(values, tabs)


def ntt_batched(values: jnp.ndarray, tabs, size: int) -> jnp.ndarray:
    """(B, n) batched NTT with explicitly-supplied tables: four-step with
    B*sqrt(n)-wide lanes for large n (each of the two `ntt_axis0` passes
    treats the batch axis as extra lanes), MXU levels with the batch as
    extra matmul lanes when MXU tables are active, flat per-stage kernel
    for small n."""
    if size < _FOUR_STEP_MIN:
        return ntt_stages(values, tabs)
    if _is_mxu_tabs(tabs):
        from .ntt_mxu import apply_mxu_ntt_batched

        return apply_mxu_ntt_batched(values, tabs)
    colt, rowt, W = tabs[0], tabs[1], tabs[2]
    n1, n2 = W.shape
    Bsz = values.shape[0]
    x3 = values.reshape(Bsz, n1, n2)
    xt = jnp.transpose(x3, (1, 0, 2)).reshape(n1, Bsz * n2)
    a = ntt_axis0(xt, colt).reshape(n1, Bsz, n2)
    a = bb.mont_mul(a, W[:, None, :])
    at = jnp.transpose(a, (2, 1, 0)).reshape(n2, Bsz * n1)
    c = ntt_axis0(at, rowt).reshape(n2, Bsz, n1)
    return jnp.transpose(c, (1, 0, 2)).reshape(Bsz, n1 * n2)


def ntt(values: jnp.ndarray, omega: int) -> jnp.ndarray:
    """Forward NTT: out[k] = sum_j values[j] * omega^(jk)  (src/ntt.rs:24-53).

    Large 1-D inputs take the four-step path (two wide batched passes + one
    transpose); small or batched inputs use the flat per-stage kernel.
    """
    n = values.shape[-1]
    if n >= _FOUR_STEP_MIN:
        # apply_ntt (not four_step_apply) so the structural dispatch handles
        # MXU-path tables when that mode is active — ntt_tables() returns a
        # different pytree there and four_step_apply would misparse it.
        # Batched inputs (e.g. the 4 lanes of an Ext transform) flatten the
        # leading axes into the batched four-step's extra lanes.
        tabs = ntt_tables(n, omega)
        if values.ndim == 1:
            return apply_ntt(values, tabs, n)
        lead = values.shape[:-1]
        flat = values.reshape(-1, n)
        return ntt_batched(flat, tabs, n).reshape(*lead, n)
    return ntt_stages(values, _twiddle_tables(n, omega))


def intt(values: jnp.ndarray, omega: int) -> jnp.ndarray:
    """Inverse NTT: forward transform with omega^(n-1), then scale by n^{-1}
    (src/ntt.rs:56-66)."""
    n = values.shape[-1]
    inv_omega = pow(omega, n - 1, P)
    v = ntt(values, inv_omega)
    n_inv = pow(n, P - 2, P)
    return bb.mul_const(v, n_inv)


def roots_of_unity_domain(n: int) -> jnp.ndarray:
    """{omega^i : i < n} for the canonical size-n subgroup — API parity with
    the reference helper (src/ntt.rs:69-81)."""
    omega = bb.get_root_of_unity(n.bit_length() - 1)
    return jnp.asarray(np_powers(omega, n).astype(np.uint32))
