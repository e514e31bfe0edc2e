"""Execution-trace frontend.

The reference stores a row-major Vec<Vec<BabyBear>> and interpolates columns
with O(n^2) Lagrange (reference: src/program/trace.rs). Here the trace is a
column-major uint32 array (columns are what get interpolated/committed —
column-major means each column is a contiguous transform lane) and column
interpolation is an O(n log n) INTT on the trace domain, which produces the
identical polynomial (the interpolant on a domain is unique).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .domain import Domain


class ExecutionTrace:
    """Columns of equal power-of-two height."""

    def __init__(self):
        self.columns: list[np.ndarray] = []

    @property
    def num_rows(self) -> int:
        return len(self.columns[0]) if self.columns else 0

    def insert_column(self, column) -> None:
        """Append a column of per-row values (src/program/trace.rs:17-26)."""
        col = np.asarray(column, np.uint64)
        if self.columns:
            assert len(col) == self.num_rows, "Column length mismatch"
        self.columns.append(col)

    def interpolate_column(self, domain: Domain, column_idx: int) -> jnp.ndarray:
        """Coefficients of the unique interpolant of the column over `domain`.

        Replaces the reference's O(n^2) Lagrange loop
        (src/program/trace.rs:28-56) with a device INTT — bit-identical
        output, since both produce the unique degree-<n interpolant on the
        same points.
        """
        assert domain.size == self.num_rows, "Domain length must match trace height"
        assert domain.shift == 1, "trace domain is the standard domain"
        col = jnp.asarray(self.columns[column_idx].astype(np.uint32))
        return domain.ifft(col)
