"""Relative-error metrics.

TPU-native equivalent of the reference ``RelDiff`` trait
(rusty-compression ``src/types.rs:162-204``): relative Frobenius-norm and
l2-norm differences, generic over real/complex dtypes, jittable.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rel_diff_fro", "rel_diff_l2"]


def rel_diff_fro(first, second):
    """``||first - second||_F / ||second||_F`` (types.rs:182-188).

    Works on single matrices or batches (norms taken over the last two
    axes). Returns a real scalar (or batch of scalars).
    """
    first = jnp.asarray(first)
    second = jnp.asarray(second)
    diff = jnp.linalg.norm(first - second, ord="fro", axis=(-2, -1))
    denom = jnp.linalg.norm(second, ord="fro", axis=(-2, -1))
    return diff / denom


def rel_diff_l2(first, second):
    """``||first - second||_2 / ||second||_2`` for vectors (types.rs:190-196)."""
    first = jnp.asarray(first)
    second = jnp.asarray(second)
    diff = jnp.linalg.norm(first - second, axis=-1)
    denom = jnp.linalg.norm(second, axis=-1)
    return diff / denom
