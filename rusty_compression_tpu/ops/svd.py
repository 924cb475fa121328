"""Truncated / economy SVD backend.

Equivalent of the reference's LAPACK ``?gesdd`` backend
(rusty-compression ``src/compute_svd.rs:18-27``): economy-size U, s, Vt.
On TPU, ``jnp.linalg.svd`` lowers to XLA's on-device SVD; the production
path for large low-rank matrices is *sketch-then-SVD*
(``svd_from_range_estimate`` in the containers layer), which only ever
runs the dense SVD on a small (k, n) sketch.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["compute_svd"]


def compute_svd(a):
    """Economy SVD: ``a = u @ diag(s) @ vt`` with ``k = min(m, n)``.

    Returns ``(u, s, vt)`` with ``s`` real, descending — the contract of
    ``compute_svd.rs:18-27``.
    """
    a = jnp.asarray(a)
    u, s, vt = jnp.linalg.svd(a, full_matrices=False)
    return u, s, vt
