"""Precision-safe Cholesky factorization (TPU).

``jnp.linalg.cholesky`` lowers to ``hlo.cholesky`` on TPU, and XLA's
blocked expansion runs its internal matmuls outside JAX's
matmul-precision control (the same escape hatch as the TPU
``triangular_solve`` expansion — see ``ops.triangular``). For the
CholeskyQR-family kernels, a bf16-floored Cholesky of the Gram matrix
poisons Q beyond repair, so this module provides a pure-JAX recursive
blocked Cholesky whose every flop obeys the active precision policy:

* diagonal base cases (``block`` wide) factorize with a left-looking
  ``fori_loop`` of GEMV-and-scale steps;
* off-diagonal panels solve against the finished diagonal factor via
  the log-depth Neumann triangular inverse (``ops.triangular``);
* Schur complements are plain GEMMs.

Breakdown semantics match the XLA primitive: a non-positive pivot
produces NaN/Inf in the factor (callers detect breakdown with
``isfinite`` — ``ops.orthogonalize._chol`` relies on this).

Matrices here are small (Gram matrices of tall-skinny panels, l ≲ a few
hundred), so the ~n/block sequential base cases cost microseconds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .triangular import triangular_inverse
from ..utils.dtypes import herm

__all__ = ["cholesky"]


def _chol_unblocked(g):
    """Left-looking unblocked Cholesky (lower factor) of one (n, n)
    Hermitian matrix; ``fori_loop`` over columns."""
    n = g.shape[-1]
    dt = g.dtype
    rows = jnp.arange(n)

    def body(j, l):
        # Columns >= j of l are still zero, so the full GEMV subtracts
        # exactly the finished part.
        c = g[:, j] - l @ jnp.conjugate(l[j, :])
        pivot = jnp.sqrt(jnp.real(c[j]))  # NaN when non-PD: breakdown signal
        col = c * (1.0 / pivot).astype(dt)
        col = jnp.where(rows > j, col, 0.0)
        col = col.at[j].set(pivot.astype(dt))
        return l.at[:, j].set(col)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(g))


def cholesky(g, block: int = 48):
    """Lower-triangular Cholesky factor of Hermitian positive-definite
    ``g`` (..., n, n), batched over leading axes; all flops under the
    matmul-precision policy. NaN/Inf on breakdown (non-PD input)."""
    g = jnp.asarray(g)
    if g.ndim > 2:
        return jax.vmap(lambda x: cholesky(x, block))(
            g.reshape((-1,) + g.shape[-2:])).reshape(g.shape)
    n = g.shape[-1]
    if n <= block:
        return _chol_unblocked(g)
    h = (n // 2 + block - 1) // block * block  # split on the block grid
    h = min(h, n - 1)
    l11 = cholesky(g[:h, :h], block)
    # L21 = G21 L11^{-H}
    l21 = g[h:, :h] @ herm(triangular_inverse(l11, lower=True))
    s = g[h:, h:] - l21 @ herm(l21)
    l22 = cholesky(s, block)
    top = jnp.concatenate([l11, jnp.zeros((h, n - h), dtype=g.dtype)], axis=1)
    bot = jnp.concatenate([l21, l22], axis=1)
    return jnp.concatenate([top, bot], axis=0)
