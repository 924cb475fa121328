"""Permutation utilities.

TPU-native equivalent of the reference permutation engine
(rusty-compression ``src/permutation.rs``). The reference applies
permutations with per-row/column copy loops (``permutation.rs:84-145``);
here every mode is a single gather (``jnp.take``) or scatter, which XLA
lowers to one fused dynamic-gather — no host loops, fully jittable and
vmappable.

Semantics (matching ``permutation.rs:40-75``):

* ``perm[i] = j`` means: after a *forward* permutation, position ``i`` of
  the result holds entry ``j`` of the original.
* Inverse permutation ``inv`` satisfies ``inv[perm[i]] = i``.
* Matrix modes ``COL``/``ROW`` apply forward permutation to columns/rows;
  ``COLINV``/``ROWINV`` apply the inverse permutation.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

__all__ = [
    "MatrixPermutationMode",
    "VectorPermutationMode",
    "invert_permutation_vector",
    "apply_matrix_permutation",
    "apply_vector_permutation",
]


class MatrixPermutationMode(enum.Enum):
    """Matrix permutation modes (permutation.rs:7-16)."""

    COL = "col"
    ROW = "row"
    COLINV = "colinv"
    ROWINV = "rowinv"


class VectorPermutationMode(enum.Enum):
    """Vector permutation modes (permutation.rs:19-24)."""

    INV = "inv"
    NOINV = "noinv"


def invert_permutation_vector(perm):
    """Inverse of a permutation vector: if ``perm[i] = j`` then ``inv[j] = i``.

    Reference: ``permutation.rs:28-38``. Implemented as a scatter, which is
    a single XLA op (vs. the reference's host loop). Host numpy input
    stays numpy (host-factor containers on complex-rejecting devices).
    """
    if isinstance(perm, np.ndarray):
        n = perm.shape[0]
        inv = np.zeros((n,), dtype=perm.dtype)
        inv[perm] = np.arange(n, dtype=perm.dtype)
        return inv
    perm = jnp.asarray(perm)
    n = perm.shape[0]
    inv = jnp.zeros((n,), dtype=perm.dtype)
    return inv.at[perm].set(jnp.arange(n, dtype=perm.dtype))


def apply_matrix_permutation(mat, perm, mode: MatrixPermutationMode):
    """Permute rows or columns of ``mat`` (last two axes; batch axes allowed).

    ``mode=COL``: ``out[..., :, i] = mat[..., :, perm[i]]`` (permutation.rs:95-105).
    ``mode=ROW``: ``out[..., i, :] = mat[..., perm[i], :]`` (permutation.rs:106-116).
    ``COLINV``/``ROWINV`` use the inverse permutation (permutation.rs:117-140).

    A host numpy ``mat`` is permuted in numpy — containers holding host
    factors (the complex route on complex-rejecting devices) never
    touch the device through their conversions.
    """
    xp = np if isinstance(mat, np.ndarray) else jnp
    perm = xp.asarray(perm)
    if mode in (MatrixPermutationMode.COLINV, MatrixPermutationMode.ROWINV):
        perm = invert_permutation_vector(perm)
    axis = -1 if mode in (MatrixPermutationMode.COL, MatrixPermutationMode.COLINV) else -2
    return xp.take(mat, perm, axis=axis)


def apply_vector_permutation(vec, perm, mode: VectorPermutationMode):
    """Permute a vector: ``out[i] = vec[perm[i]]`` (NOINV) or with the
    inverse permutation (INV). Reference: ``permutation.rs:147-184``."""
    xp = np if isinstance(vec, np.ndarray) else jnp
    perm = xp.asarray(perm)
    if mode is VectorPermutationMode.INV:
        perm = invert_permutation_vector(perm)
    return xp.take(vec, perm, axis=-1)
