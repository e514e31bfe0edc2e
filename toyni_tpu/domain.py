"""Evaluation domains over BabyBear with NTT-based coset FFT/IFFT.

The TPU-native counterpart of the reference's `BabyBearDomain`
(reference: src/math/domain.rs:10-175). Same semantics — a multiplicative
subgroup {omega^i} optionally shifted to a coset {h * omega^i}, with FFT =
coset-shift-then-NTT and IFFT = INTT-then-unshift — but all vector work
(shift application, element enumeration, the transform itself) happens as
whole-array device ops instead of scalar loops. There is no `use_gpu` toggle:
dispatch to the accelerator is XLA's job, with a `jax.jit` cache per shape
replacing the reference's per-size CUDA context cache (src/ntt.rs:128-141).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace

import numpy as np
import jax.numpy as jnp

from .field import babybear as bb
from .field.babybear import P, MONT_R, get_root_of_unity
from .ops import ntt as ntt_ops

_U32 = jnp.uint32


@functools.lru_cache(maxsize=64)
def _shift_tables(n: int, shift: int):
    """(shift^i, shift^-i) for i < n, Montgomery form, cached on DEVICE
    (uploaded once per process)."""
    import jax

    fwd = ntt_ops.np_powers(shift, n) * np.uint64(MONT_R) % np.uint64(P)
    inv_shift = pow(shift, P - 2, P)
    bwd = ntt_ops.np_powers(inv_shift, n) * np.uint64(MONT_R) % np.uint64(P)
    with jax.ensure_compile_time_eval():
        return (
            jnp.asarray(fwd.astype(np.uint32)),
            jnp.asarray(bwd.astype(np.uint32)),
        )


@functools.lru_cache(maxsize=64)
def _elements_dev(size: int, omega: int, shift: int) -> jnp.ndarray:
    import jax

    pw = ntt_ops.np_powers(omega, size)
    if shift != 1:
        pw = pw * np.uint64(shift) % np.uint64(P)
    with jax.ensure_compile_time_eval():
        return jnp.asarray(pw.astype(np.uint32))


@dataclass(frozen=True)
class Domain:
    """A size-2^k evaluation domain {shift * omega^i : i < size}."""

    size: int
    log_size: int
    omega: int  # host int: primitive size-th root of unity
    shift: int  # 1 for the standard domain, h for the coset {h * omega^i}

    @staticmethod
    def new(size: int) -> "Domain":
        assert size & (size - 1) == 0, "Domain size must be power of 2"
        log_size = size.bit_length() - 1
        return Domain(size, log_size, get_root_of_unity(log_size), 1)

    def get_coset(self, shift: int) -> "Domain":
        return replace(self, shift=shift % P)

    def group_gen(self) -> int:
        return self.omega

    # ── element enumeration ────────────────────────────────────────────────

    def elements(self) -> jnp.ndarray:
        """{shift * omega^i} as a device uint32 array, cached per domain
        (reference scalar loop: src/math/domain.rs:61-69)."""
        return _elements_dev(self.size, self.omega, self.shift)

    def elements_np(self) -> np.ndarray:
        """Host uint64 copy of the domain elements (verifier / tests)."""
        pw = ntt_ops.np_powers(self.omega, self.size)
        if self.shift != 1:
            pw = pw * np.uint64(self.shift) % np.uint64(P)
        return pw

    def vanishing_poly_coeffs(self) -> np.ndarray:
        """Coefficients of x^n - shift^n (host, numpy uint64)
        (src/math/domain.rs:74-80)."""
        h_n = pow(self.shift, self.size, P)
        coeffs = np.zeros(self.size + 1, np.uint64)
        coeffs[0] = (P - h_n) % P
        coeffs[self.size] = 1
        return coeffs

    def eval_vanishing(self, x: int) -> int:
        """Z_H(x) = x^n - shift^n at a host scalar."""
        return (pow(x, self.size, P) - pow(self.shift, self.size, P)) % P

    # ── transforms (device, along last axis) ───────────────────────────────

    def fft(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Evaluate the coefficient vector on this domain. Zero-pads to size
        (this *is* the low-degree extension when coeffs is shorter), applies
        the coset shift coeff[i] *= h^i, then NTT (src/math/domain.rs:107-123).
        """
        n = self.size
        c = jnp.asarray(coeffs, _U32)
        pad = n - c.shape[-1]
        assert pad >= 0, "more coefficients than domain points"
        if pad:
            c = jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, pad)])
        if self.shift != 1:
            fwd, _ = _shift_tables(n, self.shift)
            c = bb.mont_mul(c, fwd)
        return ntt_ops.ntt(c, self.omega)

    def ifft(self, evals: jnp.ndarray) -> jnp.ndarray:
        """Recover coefficients from evaluations on this domain: INTT then
        divide coeff[i] by h^i (src/math/domain.rs:85-102)."""
        assert evals.shape[-1] == self.size, "evaluation count must match size"
        v = ntt_ops.intt(jnp.asarray(evals, _U32), self.omega)
        if self.shift != 1:
            _, bwd = _shift_tables(self.size, self.shift)
            v = bb.mont_mul(v, bwd)
        return v

    # Extension-field transforms: the twiddles are base-field, so an Ext
    # transform is 4 independent base transforms (src/math/domain.rs:129-151).
    # With the (..., 4) layout that is just a batched transform over the
    # transposed coefficient axis.

    def fft_ext(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        return jnp.moveaxis(self.fft(jnp.moveaxis(coeffs, -1, -2)), -2, -1)

    def ifft_ext(self, evals: jnp.ndarray) -> jnp.ndarray:
        return jnp.moveaxis(self.ifft(jnp.moveaxis(evals, -1, -2)), -2, -1)
