"""FRI folding, vectorized.

One fold-by-2 of a codeword (reference: src/math/fri.rs:27-48):
    folded[i] = (f(x_i) + f(-x_i))/2 + beta * (f(x_i) - f(-x_i))/2 * x_i^{-1}
with f(-x_i) = evals[i + half] on a half-coset-ordered codeword.

The reference inverts every x_i with a Fermat pow per element per layer. Here
the inverse x-coordinates come from a closed form — layer 0 of the protocol
uses x_i = h * omega^i, so x_i^{-1} = h^{-1} * (omega^{-1})^i is just another
power table — and successive layers square it (inv(x^2) = inv(x)^2), so **no
modular inversions are ever computed in the fold pipeline**.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import babybear as bb
from ..field.babybear import P, MONT_R

# (p+1)/2 = inverse of 2, in Montgomery form, as a host constant
HALF_INV = (P + 1) // 2
_HALF_INV_MONT = HALF_INV * MONT_R % P


def fri_fold(evals: jnp.ndarray, xs_inv: jnp.ndarray, beta: int) -> jnp.ndarray:
    """Fold a (n,) codeword to (n/2,) with challenge beta (host int).

    `xs_inv` is the length-(n/2) vector of x_i^{-1} in **Montgomery form**.
    """
    n = evals.shape[-1]
    half = n // 2
    a = evals[..., :half]
    b = evals[..., half:]
    avg = bb.mont_mul(bb.add(a, b), jnp.uint32(_HALF_INV_MONT))
    diff = bb.mont_mul(bb.sub(a, b), jnp.uint32(_HALF_INV_MONT))
    # diff * beta * x^{-1}: beta folded into Montgomery constant so the two
    # multiplies are two mont_muls
    odd = bb.mont_mul(bb.mul_const(diff, beta), xs_inv)
    return bb.add(avg, odd)


def fri_fold_ext(evals: jnp.ndarray, xs_inv: jnp.ndarray, beta) -> jnp.ndarray:
    """Extension-field FRI fold (reference: src/math/fri.rs:7-25).

    evals: (n, 4) Ext codeword; xs_inv: (n/2,) base-field x^{-1} in Montgomery
    form; beta: Ext element as a (4,) uint32 array (or 4-tuple of host ints).
    The evaluation points stay base-field — squaring base points stays base —
    so only the codeword and beta are Ext.
    """
    from ..field import ext as extf

    beta = jnp.asarray(beta, jnp.uint32)
    half = evals.shape[0] // 2
    a = evals[:half]
    b = evals[half:]
    avg = bb.mont_mul(bb.add(a, b), jnp.uint32(_HALF_INV_MONT))
    diff = bb.mont_mul(bb.sub(a, b), jnp.uint32(_HALF_INV_MONT))
    odd = extf.mul(diff, jnp.broadcast_to(beta, diff.shape))
    odd = bb.mont_mul(odd, xs_inv[:, None])
    return bb.add(avg, odd)


def h_fri_fold_ext(evals, xs, beta):
    """Host oracle for the Ext fold; evals/beta are 4-tuples of ints."""
    from ..field import ext as extf

    half = len(evals) // 2
    out = []
    for i in range(half):
        a, b = evals[i], evals[i + half]
        x_inv = pow(xs[i], P - 2, P)
        avg = extf.h_mul_base(extf.h_add(a, b), HALF_INV)
        diff = extf.h_mul_base(extf.h_sub(a, b), HALF_INV)
        folded = extf.h_add(avg, extf.h_mul_base(extf.h_mul(diff, beta), x_inv))
        out.append(folded)
    return out


def h_fri_fold(evals, xs, beta):
    """Host scalar-int oracle of the reference fold (src/math/fri.rs:27-48);
    evals/xs are Python-int lists."""
    half = len(evals) // 2
    half_inv = HALF_INV
    out = []
    for i in range(half):
        a, b = evals[i], evals[i + half]
        x_inv = pow(xs[i], P - 2, P)
        avg = (a + b) * half_inv % P
        diff = (a - b) * half_inv % P
        out.append((avg + diff * beta % P * x_inv) % P)
    return out
