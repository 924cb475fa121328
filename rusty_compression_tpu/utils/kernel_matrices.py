"""Kernel test matrices for the BASELINE.md benchmark configurations.

These generate the physically motivated matrix families the benchmark
suite measures against (the reference's test fixture is purely
spectral; these add the integral-equation-flavored cases the north-star
workloads name):

* ``hilbert`` — the classic Hilbert matrix ``1 / (i + j + 1)``
  (BASELINE config 2's "Hilbert-type kernel"): exponentially decaying
  spectrum, brutally ill-conditioned.
* ``laplace_kernel_block`` — interaction block ``1 / |x_i - y_j|``
  between two well-separated 3-D point clouds (BASELINE configs 3-4's
  "Laplace kernel block" / "BEM off-diagonal block"): numerically
  low-rank by multipole arguments, the canonical H-matrix admissible
  block.

All jittable, device-resident, O(mn) construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["hilbert", "laplace_kernel_block", "random_cloud"]


def hilbert(n: int, dtype=jnp.float64):
    """Hilbert matrix ``H[i, j] = 1 / (i + j + 1)`` (n, n)."""
    i = jnp.arange(n, dtype=dtype)
    return 1.0 / (i[:, None] + i[None, :] + 1.0)


def random_cloud(key, n: int, center, radius: float = 0.5,
                 dtype=jnp.float64):
    """``n`` uniform points in a cube of half-width ``radius`` around
    ``center`` (3-vector)."""
    c = jnp.asarray(center, dtype=dtype)
    u = jax.random.uniform(key, (n, 3), dtype=dtype, minval=-radius,
                           maxval=radius)
    return c[None, :] + u


def laplace_kernel_block(targets, sources, dtype=None):
    """Laplace single-layer interaction block ``K[i, j] =
    1 / (4 pi |x_i - y_j|)`` between target points (m, 3) and source
    points (n, 3). For well-separated clouds this is the admissible
    H-matrix off-diagonal block — numerically low rank."""
    x = jnp.asarray(targets)
    y = jnp.asarray(sources)
    if dtype is not None:
        x, y = x.astype(dtype), y.astype(dtype)
    d2 = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    return 1.0 / (4.0 * jnp.pi * jnp.sqrt(d2))
