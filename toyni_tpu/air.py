"""Generic AIR (Algebraic Intermediate Representation) interface.

The reference hard-codes its Fibonacci constraint system inside the prover
and verifier (reference: src/fibonacci.rs:315-325, src/verifier.rs:44-46);
its README frames the library as building blocks for consumers that define
their own constraint systems. This module formalizes that split: an `Air`
supplies (a) a *vectorized* composed-constraint evaluator over whole LDE
evaluation arrays (device), and (b) a *scalar* evaluator at one out-of-domain
point (host), which the verifier uses. Fibonacci is the bundled instance.

An AIR sees the trace polynomial through `num_shifts` shifted openings
T(x), T(g x), ..., T(g^{k-1} x); on the LDE grid the shift by g is a roll by
`blowup` positions (g = omega_N^blowup, src/fibonacci.rs:256-260).
"""

from __future__ import annotations

from typing import Protocol, Sequence

import jax.numpy as jnp

from .field import babybear as bb
from .field.babybear import P


class Air(Protocol):
    """Constraint system plugged into the generic prover/verifier."""

    num_shifts: int  # how many of T(x), T(gx), T(g^2 x), ... the AIR reads

    def constraint_lde(
        self, t: Sequence[jnp.ndarray], x: jnp.ndarray, g: int, n: int
    ) -> jnp.ndarray:
        """Composed constraint C evaluated on every LDE point (device).

        t[k] is the eval vector of T(g^k x) over the shifted LDE domain;
        x the domain elements; g the trace-domain generator; n the trace
        length. Returns the (N,) eval vector of C."""
        ...

    def constraint_at(self, t: Sequence[int], z: int, g: int, n: int) -> int:
        """Same constraint at a single host scalar z, from the OOD openings
        t[k] = T(g^k z)."""
        ...


class FibonacciAir:
    """The reference's bundled AIR (src/fibonacci.rs:315-325):

        C(x) = (T(g^2 x) - T(g x) - T(x)) * (x - g^(n-1)) * (x - g^(n-2))

    The two boundary factors *deactivate* the transition constraint on the
    final two rows (where the Fibonacci relation has no successor rows).
    """

    num_shifts = 3

    def constraint_lde(self, t, x, g: int, n: int):
        fib = bb.sub(t[2], bb.add(t[1], t[0]))
        b1 = bb.sub(x, jnp.uint32(pow(g, n - 1, P)))
        b2 = bb.sub(x, jnp.uint32(pow(g, n - 2, P)))
        return bb.mul(bb.mul(fib, b1), b2)

    def constraint_at(self, t, z: int, g: int, n: int) -> int:
        fib = (t[2] - t[1] - t[0]) % P
        b1 = (z - pow(g, n - 1, P)) % P
        b2 = (z - pow(g, n - 2, P)) % P
        return fib * b1 % P * b2 % P
