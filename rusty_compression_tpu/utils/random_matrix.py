"""Random matrix generation.

TPU-native equivalent of rusty-compression ``src/random_matrix.rs``:
Gaussian test/sketch matrices, random orthogonal matrices, and the
synthetic approximately-low-rank fixture with a geometrically spaced
singular spectrum that calibrates every accuracy test in the suite
(``random_matrix.rs:70-93``).

PRNG: explicit ``jax.random`` keys replace the reference's ``rand``
thread-RNG — the functional key discipline is what makes sketches
reproducible across hosts *without a broadcast* (every host derives the
same sketch from the same key).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import herm, is_complex, real_dtype

__all__ = [
    "random_gaussian",
    "random_orthogonal_matrix",
    "random_approximate_low_rank_matrix",
]


def random_gaussian(key, shape, dtype=jnp.float64):
    """Standard Gaussian matrix, entrywise N(0, 1).

    For complex dtypes, real and imaginary parts are each independent
    N(0, 1), matching the reference's complex sampler
    (``random_matrix.rs:133-145``) — note this gives the entries
    variance 2, which the HMT tolerance factor in the adaptive sampler is
    calibrated against.
    """
    dtype = np.dtype(dtype)
    if is_complex(dtype):
        rdt = real_dtype(dtype)
        kr, ki = jax.random.split(key)
        re = jax.random.normal(kr, shape, dtype=rdt)
        im = jax.random.normal(ki, shape, dtype=rdt)
        return (re + 1j * im).astype(dtype)
    return jax.random.normal(key, shape, dtype=dtype)


def random_orthogonal_matrix(key, shape, dtype=jnp.float64):
    """Random matrix with orthonormal columns (m >= n) or rows (n > m).

    Generates a Gaussian matrix and orthonormalizes it through the left
    singular vectors of its SVD, with the tall/wide swap of the reference
    (``random_matrix.rs:35-56``).
    """
    m, n = shape
    swapped = n > m
    if swapped:
        m, n = n, m
    g = random_gaussian(key, (m, n), dtype=dtype)
    u, _, _ = jnp.linalg.svd(g, full_matrices=False)
    return herm(u) if swapped else u


def random_approximate_low_rank_matrix(key, shape, sigma_max, sigma_min,
                                        dtype=jnp.float64):
    """Synthetic matrix ``U @ diag(sigma) @ Vt`` with log-spaced spectrum.

    Singular values are geometrically spaced in ``[sigma_min, sigma_max]``
    with random orthogonal U and Vt (``random_matrix.rs:70-93``). This is
    the universal test fixture: a matrix whose singular spectrum is known
    and log-linear, against which every compression tolerance is
    calibrated.
    """
    if not sigma_min < sigma_max:
        raise ValueError("`sigma_min` must be smaller than `sigma_max`")
    if not sigma_min > 0.0:
        raise ValueError("`sigma_min` must be positive.")
    m, n = shape
    k = min(m, n)
    ku, kv = jax.random.split(key)
    u = random_orthogonal_matrix(ku, (m, k), dtype=dtype)
    vt = random_orthogonal_matrix(kv, (k, n), dtype=dtype)
    sing = jnp.geomspace(sigma_max, sigma_min, k, dtype=real_dtype(dtype))
    return (u * sing.astype(u.dtype)[None, :]) @ vt
