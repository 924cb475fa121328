"""Scalar/dtype policy helpers.

The reference library is generic over four scalar types — f32, f64, c32,
c64 (``src/types.rs:9``, macro-instantiated per dtype everywhere). Here a
single code path is generic over JAX dtypes instead; these helpers capture
the dtype relationships (real counterpart, complex detection, Hermitian
transpose) that the Rust ``Scalar`` trait provided.

Note on naming: the reference's ``c32`` is complex with 32-bit *components*
(numpy ``complex64``) and ``c64`` is numpy ``complex128``. We expose the
numpy-convention names to avoid confusion in a Python codebase.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "SUPPORTED_DTYPES",
    "real_dtype",
    "is_complex",
    "herm",
    "eps",
]

#: The four scalar types of the reference API (types.rs:9), in numpy naming.
SUPPORTED_DTYPES = ("float32", "float64", "complex64", "complex128")


def real_dtype(dtype) -> np.dtype:
    """Real counterpart of a (possibly complex) dtype.

    float32 -> float32, complex64 -> float32, complex128 -> float64.
    """
    d = np.dtype(dtype)
    if d == np.complex64:
        return np.dtype(np.float32)
    if d == np.complex128:
        return np.dtype(np.float64)
    return d


def is_complex(dtype) -> bool:
    return np.issubdtype(np.dtype(dtype), np.complexfloating)


def herm(x):
    """Hermitian (conjugate) transpose of the last two axes.

    Everywhere the reference says "transpose" it means conjugate transpose
    for complex scalars (the ``.t().map(conj)`` pattern, e.g. qr.rs:355).
    Host numpy input stays numpy (a view, no copy/device transfer) —
    containers holding host factors on complex-rejecting devices route
    all their algebra through here.
    """
    if isinstance(x, np.ndarray):
        return np.conjugate(np.swapaxes(x, -1, -2))
    return jnp.conjugate(jnp.swapaxes(x, -1, -2))


def eps(dtype) -> float:
    """Machine epsilon of the real counterpart of ``dtype``."""
    return float(np.finfo(real_dtype(dtype)).eps)
