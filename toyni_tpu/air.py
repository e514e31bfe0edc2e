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
    """Constraint system plugged into the generic prover/verifier.

    Multi-column / multi-constraint AIRs (beyond the reference, which
    hard-codes one column and one composed constraint): declare
    `num_columns` k > 1 and the trace views t[shift] become (k, N) arrays on
    device / k-tuples of scalars on host. Declare `num_constraints` > 1 and
    the evaluators receive an extra `alphas` tuple of Fiat-Shamir challenges
    (squeezed after the trace commitment) with which they must compose their
    constraints into the single quotient numerator: C = sum_j alpha_j * C_j.
    With both left at 1 the interface and transcript are exactly the
    reference protocol's.
    """

    num_shifts: int  # how many of T(x), T(gx), T(g^2 x), ... the AIR reads
    num_columns: int = 1  # trace width k
    num_constraints: int = 1  # >1 => random-linear composition via alphas

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

    def constraint_at_ext(self, t, z, g: int, n: int):
        """Ext-mode variant: t[k] and z are F_p^4 scalars (4-tuples); used
        when `StarkConfig.ext_challenges` draws z from the extension field."""
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

    def constraint_at_ext(self, t, z, g: int, n: int):
        from .field import ext as extf

        fib = extf.h_sub(t[2], extf.h_add(t[1], t[0]))
        b1 = extf.h_sub(z, extf.h_from_base(pow(g, n - 1, P)))
        b2 = extf.h_sub(z, extf.h_from_base(pow(g, n - 2, P)))
        return extf.h_mul(extf.h_mul(fib, b1), b2)


class PairFibonacciAir:
    """Bundled two-column / two-constraint AIR: the Fibonacci recurrence in
    register form. Columns (A, B) hold consecutive pairs; transitions
        A(g x) = B(x),   B(g x) = A(x) + B(x)
    each deactivated on the last row by the boundary factor (x - g^(n-1)),
    composed with random alphas into one quotient numerator:
        C = alpha_0 (A(gx) - B(x)) b(x) + alpha_1 (B(gx) - A(x) - B(x)) b(x).

    Exercises every generic-AIR extension point: num_columns=2 (row-bundle
    trace commitments), num_constraints=2 (alpha composition, split commit
    phases), num_shifts=2 (only T(x), T(gx) are opened).
    """

    num_shifts = 2
    num_columns = 2
    num_constraints = 2

    def constraint_lde(self, t, x, g: int, n: int, alphas):
        a0, b0 = t[0][0], t[0][1]          # A(x), B(x) on the LDE grid
        a1, b1 = t[1][0], t[1][1]          # A(gx), B(gx)
        bdry = bb.sub(x, jnp.uint32(pow(g, n - 1, P)))
        c1 = bb.mul(bb.sub(a1, b0), bdry)
        c2 = bb.mul(bb.sub(b1, bb.add(a0, b0)), bdry)
        # alphas are TRACED scalars (squeezed between device dispatches and
        # fed in as program arguments), so broadcast-mul, not mul_const
        return bb.add(bb.mul(c1, alphas[0]), bb.mul(c2, alphas[1]))

    def constraint_at(self, t, z: int, g: int, n: int, alphas):
        a0, b0 = t[0]
        a1, b1 = t[1]
        bdry = (z - pow(g, n - 1, P)) % P
        c1 = (a1 - b0) % P * bdry % P
        c2 = (b1 - a0 - b0) % P * bdry % P
        return (alphas[0] * c1 + alphas[1] * c2) % P

    def constraint_at_ext(self, t, z, g: int, n: int, alphas):
        """Ext-mode host evaluator: t[s] is a k-tuple of ext scalars, z ext;
        alphas stay base-field (they compose constraints, not challenges)."""
        from .field import ext as extf

        a0, b0 = t[0]
        a1, b1 = t[1]
        bdry = extf.h_sub(z, extf.h_from_base(pow(g, n - 1, P)))
        c1 = extf.h_mul(extf.h_sub(a1, b0), bdry)
        c2 = extf.h_mul(extf.h_sub(b1, extf.h_add(a0, b0)), bdry)
        return extf.h_add(
            extf.h_mul_base(c1, alphas[0]), extf.h_mul_base(c2, alphas[1])
        )

    @staticmethod
    def generate_trace(n: int):
        """(A, B) columns of n rows: A=fib(i), B=fib(i+1) in F_p."""
        a, b = 1, 1
        col_a, col_b = [], []
        for _ in range(n):
            col_a.append(a)
            col_b.append(b)
            a, b = b, (a + b) % P
        return col_a, col_b


class SboxChainAir:
    """Bundled NONLINEAR AIR: a MiMC/Poseidon-style x^7 S-box chain,

        T(g x) = (T(x) + x)^7        (deactivated on the last row).

    alpha = 7 is the canonical BabyBear S-box exponent (gcd(7, p-1) = 1, so
    x^7 is a permutation; 3 and 5 divide p-1 and are not). The round constant
    is the domain element itself — RC(x) = x is a degree-1 public polynomial,
    so both evaluators stay closed-form. The composed constraint has degree 7
    in the trace polynomial; prove with
    `StarkConfig(constraint_degree=7)`, which widens the FRI degree budget
    to cover deg(Q) ~ 6L (the reference protocol only supports constraints
    LINEAR in T, src/fibonacci.rs:315-325 — this AIR exercises the part of
    the generic machinery it cannot express).

    num_shifts=2 routes proving through the generic path (wire format v3).
    """

    num_shifts = 2
    constraint_degree = 7

    @staticmethod
    def _sbox_lde(u):
        u2 = bb.mul(u, u)
        u4 = bb.mul(u2, u2)
        return bb.mul(bb.mul(u4, u2), u)

    def constraint_lde(self, t, x, g: int, n: int):
        u = self._sbox_lde(bb.add(t[0], x))
        bdry = bb.sub(x, jnp.uint32(pow(g, n - 1, P)))
        return bb.mul(bb.sub(t[1], u), bdry)

    def constraint_at(self, t, z: int, g: int, n: int) -> int:
        u = pow((t[0] + z) % P, 7, P)
        return (t[1] - u) % P * ((z - pow(g, n - 1, P)) % P) % P

    def constraint_at_ext(self, t, z, g: int, n: int):
        from .field import ext as extf

        u = extf.h_pow(extf.h_add(t[0], z), 7)
        bdry = extf.h_sub(z, extf.h_from_base(pow(g, n - 1, P)))
        return extf.h_mul(extf.h_sub(t[1], u), bdry)

    @staticmethod
    def generate_trace(n: int, x0: int = 3):
        """n rows t_0 = x0, t_{i+1} = (t_i + g^i)^7 (the last row is
        unconstrained, matching the boundary factor)."""
        from .domain import Domain

        g = Domain.new(n).group_gen()
        col, t, gi = [], x0 % P, 1
        for _ in range(n):
            col.append(t)
            t = pow((t + gi) % P, 7, P)
            gi = gi * g % P
        return col
