"""Triangular solves for interpolative-decomposition coefficients.

The reference forms the ID coefficient matrix by solving one triangular
system *per column* through BLAS-2 ``trsv`` (rusty-compression
``qr.rs:290-301``, ``qr.rs:384-395``). Here the whole right-hand-side
block is solved in a single batched ``triangular_solve`` — one XLA op,
BLAS-3 shaped, MXU-friendly.
"""

from __future__ import annotations

import jax.lax.linalg as lax_linalg
import jax.numpy as jnp

__all__ = ["solve_upper_triangular", "solve_lower_triangular"]


def solve_upper_triangular(r, b):
    """Solve ``r @ x = b`` with ``r`` upper triangular, ``b`` (k, j)."""
    return lax_linalg.triangular_solve(
        jnp.asarray(r), jnp.asarray(b), left_side=True, lower=False)


def solve_lower_triangular(l, b):
    """Solve ``l @ x = b`` with ``l`` lower triangular, ``b`` (k, j)."""
    return lax_linalg.triangular_solve(
        jnp.asarray(l), jnp.asarray(b), left_side=True, lower=True)
