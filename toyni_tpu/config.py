"""Protocol configuration.

The reference hard-codes these as compile-time consts
(reference: src/fibonacci.rs:11-19); here they are a frozen dataclass so the
framework is parameterizable while the defaults reproduce the reference
protocol exactly.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class StarkConfig:
    """Defaults = the reference protocol (soundness ~= (1/8)^44 ~ 2^-132)."""

    # Spot-check queries; at rate 1/8 each gives ~3 bits (src/fibonacci.rs:10-11)
    num_queries: int = 44
    # LDE blowup keeping the tested RS rate at 1/8 after masking
    # (src/fibonacci.rs:12-14)
    blowup: int = 32
    # Coset shift for the LDE domain (src/fibonacci.rs:15-16)
    coset_shift: int = 7
    # Extension-field soundness mode: draw z and the FRI betas from F_p^4
    # (~124-bit challenge space). The reference ships the Ext building blocks
    # and documents this intent (src/ext.rs:1-12) but its own pipeline stays
    # base-field; False reproduces the reference protocol byte-for-byte.
    ext_challenges: bool = False

    @property
    def mask_degree(self) -> int:
        """Random blinding coefficients per trace polynomial: covers every
        revealed trace evaluation — 3 openings per query + 3 OOD points + the
        reference's margin (src/fibonacci.rs:17-19)."""
        return 3 * self.num_queries + 8

    def fri_degree_bound(self, trace_len: int) -> int:
        """next_pow2(trace_len + mask_degree) (src/fibonacci.rs:220,
        src/verifier.rs:59)."""
        v = trace_len + self.mask_degree
        return 1 << (v - 1).bit_length()

    def final_layer_size(self, trace_len: int) -> int:
        return trace_len * self.blowup // self.fri_degree_bound(trace_len)


DEFAULT_CONFIG = StarkConfig()
