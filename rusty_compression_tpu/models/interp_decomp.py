"""Interpolative decomposition containers.

TPU-native equivalents of rusty-compression
``src/col_interp_decomp.rs``, ``src/row_interp_decomp.rs`` and
``src/two_sided_interp_decomp.rs``:

* ``ColumnID``:   ``A ~= C Z``   — C is a column subset of A (col_ind).
* ``RowID``:      ``A ~= X R``   — R is a row subset of A (row_ind).
* ``TwoSidedID``: ``A ~= C X R`` — X is the skeleton submatrix
  ``A[row_ind[:k], col_ind[:k]]`` (two_sided_interp_decomp.rs:9-10).

All containers are pytrees, carry factored ``apply``/``conj_apply``
products (the ``Apply`` impls of the reference, e.g.
``col_interp_decomp.rs:134-154``), and convert into each other through
the QR/LQ layer.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..utils.dtypes import herm
from ..utils.precision import with_precision

__all__ = ["ColumnID", "RowID", "TwoSidedID"]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ColumnID:
    """Column interpolative decomposition ``A ~= C Z``.

    c: (m, k) columns of A; z: (k, n); col_ind: ``col_ind[i] = j`` means
    column ``i`` of C is column ``j`` of A (col_interp_decomp.rs:23-31).
    """

    c: jnp.ndarray
    z: jnp.ndarray
    col_ind: jnp.ndarray

    def tree_flatten(self):
        return (self.c, self.z, self.col_ind), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def nrows(self) -> int:
        return self.c.shape[-2]

    @property
    def ncols(self) -> int:
        return self.z.shape[-1]

    @property
    def rank(self) -> int:
        return self.c.shape[-1]

    @with_precision
    def to_mat(self):
        """``C @ Z`` (col_interp_decomp.rs:62-65)."""
        return self.c @ self.z

    @with_precision
    def apply(self, x):
        """Factored product ``C (Z x)`` for a vector or matrix ``x``
        (col_interp_decomp.rs:134-154)."""
        return self.c @ (self.z @ x)

    @with_precision
    def conj_apply(self, x):
        """Factored adjoint product ``Z^H (C^H x)``."""
        return herm(self.z) @ (herm(self.c) @ x)

    @with_precision
    def two_sided_id(self) -> "TwoSidedID":
        """Two-sided ID via pivoted LQ + row-ID of C
        (col_interp_decomp.rs:116-130)."""
        from .qr import LQ  # deferred: models.qr imports this module

        row_id = LQ.compute_from(self.c).row_id()
        return TwoSidedID(
            c=row_id.x,
            x=row_id.r,
            r=self.z,
            row_ind=row_id.row_ind,
            col_ind=self.col_ind,
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RowID:
    """Row interpolative decomposition ``A ~= X R``.

    x: (m, k); r: (k, n) rows of A; row_ind: ``row_ind[i] = j`` means row
    ``i`` of R is row ``j`` of A (row_interp_decomp.rs:25-33).
    """

    x: jnp.ndarray
    r: jnp.ndarray
    row_ind: jnp.ndarray

    def tree_flatten(self):
        return (self.x, self.r, self.row_ind), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def nrows(self) -> int:
        return self.x.shape[-2]

    @property
    def ncols(self) -> int:
        return self.r.shape[-1]

    @property
    def rank(self) -> int:
        return self.r.shape[-2]

    @with_precision
    def to_mat(self):
        """``X @ R`` (row_interp_decomp.rs:65-67)."""
        return self.x @ self.r

    @with_precision
    def apply(self, x):
        """Factored product ``X (R x)`` (row_interp_decomp.rs:134-154)."""
        return self.x @ (self.r @ x)

    @with_precision
    def conj_apply(self, x):
        """Factored adjoint product ``R^H (X^H x)``."""
        return herm(self.r) @ (herm(self.x) @ x)

    @with_precision
    def two_sided_id(self) -> "TwoSidedID":
        """Two-sided ID via pivoted QR + column-ID of R
        (row_interp_decomp.rs:120-131)."""
        from .qr import QR  # deferred: models.qr imports this module

        col_id = QR.compute_from(self.r).column_id()
        return TwoSidedID(
            c=self.x,
            x=col_id.c,
            r=col_id.z,
            row_ind=self.row_ind,
            col_ind=col_id.col_ind,
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class TwoSidedID:
    """Two-sided interpolative decomposition ``A ~= C X R``.

    ``X`` equals the skeleton submatrix ``A[row_ind[:k], col_ind[:k]]``
    (two_sided_interp_decomp.rs:9-10,19-30).
    """

    c: jnp.ndarray
    x: jnp.ndarray
    r: jnp.ndarray
    row_ind: jnp.ndarray
    col_ind: jnp.ndarray

    def tree_flatten(self):
        return (self.c, self.x, self.r, self.row_ind, self.col_ind), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def nrows(self) -> int:
        return self.c.shape[-2]

    @property
    def ncols(self) -> int:
        return self.r.shape[-1]

    @property
    def rank(self) -> int:
        return self.x.shape[-2]

    @with_precision
    def to_mat(self):
        """``C @ X @ R`` (two_sided_interp_decomp.rs:62-64)."""
        return self.c @ (self.x @ self.r)

    @with_precision
    def apply(self, y):
        """Factored product ``C (X (R y))``
        (two_sided_interp_decomp.rs:154-171)."""
        return self.c @ (self.x @ (self.r @ y))

    @with_precision
    def conj_apply(self, y):
        """Factored adjoint product ``R^H (X^H (C^H y))``."""
        return herm(self.r) @ (herm(self.x) @ (herm(self.c) @ y))
