"""Triangular solves for interpolative-decomposition coefficients.

The reference forms the ID coefficient matrix by solving one triangular
system *per column* through BLAS-2 ``trsv`` (rusty-compression
``qr.rs:290-301``, ``qr.rs:384-395``). Here the whole right-hand-side
block is solved in a single BLAS-3-shaped operation.

Two kernels:

* ``method="xla"`` — ``lax.linalg.triangular_solve`` (LAPACK ``trsm`` on
  CPU: exact substitution).
* ``method="inverse"`` — explicit triangular inverse via the log-depth
  Neumann product, then a GEMM. Writing ``R = D (I + N)`` with ``N``
  strictly triangular (nilpotent, ``N^l = 0``),

      (I + N)^{-1} = prod_{j=0}^{ceil(log2 l)-1} (I + (-N)^(2^j))

  is EXACT in exact arithmetic (the product telescopes to the full
  Neumann series, which terminates), and costs ceil(log2 l) small
  (l, l) matmuls — all of which respect the framework's matmul-precision
  policy. This matters on TPU: ``hlo.triangular_solve`` is expanded
  inside XLA with matmuls *outside* JAX's precision control, observed
  to run at raw-bf16 accuracy (~1e-2 relative) on some backends, which
  silently floored every downstream contract. Roundoff here is
  ~cond(R) * eps — the same class as substitution.

``method="auto"`` picks ``xla`` on CPU and ``inverse`` on TPU.
"""

from __future__ import annotations

import jax
import jax.lax.linalg as lax_linalg
import jax.numpy as jnp

__all__ = ["solve_upper_triangular", "solve_lower_triangular",
           "triangular_inverse", "triangular_solve"]


def _resolve(method: str) -> str:
    if method == "auto":
        return "inverse" if jax.default_backend() == "tpu" else "xla"
    if method not in ("xla", "inverse"):
        raise ValueError(f"unknown triangular-solve method {method!r}")
    return method


def triangular_inverse(r, lower: bool = False):
    """Explicit inverse of a (batched) triangular matrix via the
    log-depth Neumann product (see module docstring). All-GEMM: every
    flop lands on the MXU under the active precision policy."""
    r = jnp.asarray(r)
    l = r.shape[-1]
    d = jnp.diagonal(r, axis1=-2, axis2=-1)
    dinv = jnp.where(d == 0, 0.0, 1.0 / jnp.where(d == 0, 1.0, d))
    # N = D^{-1} R_off (strictly triangular), so R = D (I + N).
    tri = jnp.tril if lower else jnp.triu
    n_mat = tri(r * dinv[..., :, None], k=0) - jnp.eye(l, dtype=r.dtype)
    eye = jnp.eye(l, dtype=r.dtype)
    acc = eye - n_mat          # (I + (-N)^(2^0))
    p = -n_mat
    j = 1
    while (1 << j) < l:
        p = p @ p              # (-N)^(2^j); powers commute, order free
        acc = (eye + p) @ acc
        j += 1
    # R^{-1} = (I + N)^{-1} D^{-1}
    return acc * dinv[..., None, :]


def triangular_solve(r, b, *, left_side: bool = True, lower: bool = False,
                     method: str = "auto"):
    """Solve ``r @ x = b`` (``left_side``) or ``x @ r = b`` with
    triangular ``r``; batched over leading axes like the XLA op.

    Host numpy inputs stay on host (scipy ``trsm`` — the reference's
    BLAS class): complex containers on complex-rejecting devices hold
    numpy factors, and their conversions must not touch the device
    (transparent complex dispatch, qr.rs:408-416 semantics).
    """
    import numpy as np

    if isinstance(r, np.ndarray) and isinstance(b, np.ndarray) \
            and r.ndim == 2 and b.ndim == 2:
        from scipy.linalg import solve_triangular

        if left_side:
            return solve_triangular(r, b, lower=lower)
        return solve_triangular(r.T, b.T, lower=not lower).T
    r = jnp.asarray(r)
    b = jnp.asarray(b)
    if _resolve(method) == "xla":
        return lax_linalg.triangular_solve(r, b, left_side=left_side,
                                           lower=lower)
    rinv = triangular_inverse(r, lower=lower)
    return rinv @ b if left_side else b @ rinv


def solve_upper_triangular(r, b, method: str = "auto"):
    """Solve ``r @ x = b`` with ``r`` upper triangular, ``b`` (k, j)."""
    return triangular_solve(r, b, left_side=True, lower=False, method=method)


def solve_lower_triangular(l, b, method: str = "auto"):
    """Solve ``l @ x = b`` with ``l`` lower triangular, ``b`` (k, j)."""
    return triangular_solve(l, b, left_side=True, lower=True, method=method)
