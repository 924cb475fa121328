"""QR / LQ factorization containers and conversions.

TPU-native equivalent of rusty-compression ``src/qr.rs``: frozen
dataclasses registered as pytrees (so they pass through ``jit`` /
``vmap`` / ``shard_map``), with the reference's full conversion graph —
compress by rank/tolerance, QR→ColumnID, LQ→RowID, and the randomized
``compute_from_range_estimate`` entry point.

Pivot convention (qr.rs:31-40): ``ind[j] = k`` means column ``j`` of
``q @ r`` equals column ``k`` of the original matrix.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..linop import as_linear_operator
from ..ops.pivoted_qr import pivoted_lq, pivoted_qr
from ..ops.triangular import solve_upper_triangular
from ..utils.backend import use_host_complex as _host_complex
from ..utils.dtypes import herm
from ..utils.errors import CompressionError
from ..utils.precision import with_precision
from ..utils.permutation import MatrixPermutationMode, apply_matrix_permutation
from .compression import Adaptive, CompressionType, Rank
from .interp_decomp import ColumnID, RowID

__all__ = ["QR", "LQ"]


def _tolerance_position(diag_ratios, tol: float):
    """Truncation rank for a relative tolerance, or None if unreachable.

    Mirrors the scan of qr.rs:190-194 / svd.rs:92-95 — but against the
    *suffix-max envelope* of the ratios: the cut lands at the first
    position from which every later ratio is below ``tol``. For the
    strictly non-increasing diagonals LAPACK ``?geqp3`` guarantees (and
    for sorted singular values) this is identical to the reference's
    first-crossing scan; for this framework's blocked randomized-pivot
    RRQR, whose ``|r_ii|`` are only *approximately* non-increasing
    (ops/pivoted_qr.py), it prevents a transient dip from truncating
    early. Host-boundary operation (concretizes device values).
    """
    if not (0.0 <= tol < 1.0):
        raise ValueError("Require 0 <= tol < 1.0")
    ratios = np.abs(np.asarray(diag_ratios))
    envelope = np.maximum.accumulate(ratios[::-1])[::-1]
    below = envelope < tol
    idx = np.argmax(below)
    if not below[idx]:
        return None
    return int(idx)


def _tolerance_rank_device(diag, tol):
    """Device-side (jit/vmap-safe) version of ``_tolerance_position``.

    Returns ``(rank, ok)``: the suffix-max-envelope truncation rank and
    whether the tolerance was reachable (``ok=False`` mirrors the host
    API's ``CompressionError``; inside jit the caller masks on it).
    """
    ratios = jnp.abs(diag / diag[..., :1])
    ax = ratios.ndim - 1  # lax.cummax rejects negative axes
    envelope = jnp.flip(
        jax.lax.cummax(jnp.flip(ratios, axis=ax), axis=ax), axis=ax)
    below = envelope < tol
    ok = below[..., -1]
    rank = jnp.argmax(below, axis=-1).astype(jnp.int32)
    k = diag.shape[-1]
    return jnp.where(ok, rank, jnp.int32(k)), ok


def _mask_cols(a, rank):
    """Zero columns at index >= rank (static shape preserved)."""
    idx = jnp.arange(a.shape[-1])
    return a * (idx < rank).astype(a.dtype)


def _mask_rows(a, rank):
    idx = jnp.arange(a.shape[-2])
    return a * (idx < rank)[:, None].astype(a.dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QR:
    """Pivoted QR decomposition ``A P = Q R`` (qr.rs:31-40).

    q: (m, k) orthonormal columns; r: (k, n) upper triangular over the
    permuted columns; ind: (n,) int32 pivot vector.
    """

    q: jnp.ndarray
    r: jnp.ndarray
    ind: jnp.ndarray

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.q, self.r, self.ind), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- shape queries (qr.rs:144-157) --------------------------------------
    @property
    def nrows(self) -> int:
        return self.q.shape[-2]

    @property
    def ncols(self) -> int:
        return self.r.shape[-1]

    @property
    def rank(self) -> int:
        return self.q.shape[-1]

    # -- construction --------------------------------------------------------
    @classmethod
    def compute_from(cls, a, max_rank=None, **kwargs) -> "QR":
        """Pivoted QR of a dense matrix (qr.rs:251-253)."""
        q, r, ind = pivoted_qr(a, max_rank=max_rank, **kwargs)
        return cls(q, r, ind)

    @classmethod
    @with_precision
    def compute_from_range_estimate(cls, range_, op, **kwargs) -> "QR":
        """Randomized QR from an orthonormal range estimate (qr.rs:311-323).

        Forms the small sketch ``B = (A^H Q)^H`` (k, n), factorizes it, and
        lifts Q back: the dense factorization only ever touches the sketch.
        """
        op = as_linear_operator(op)
        range_ = (np.asarray(range_) if _host_complex(range_)
                  else jnp.asarray(range_))
        b = herm(op.conj_matmat(range_))
        qr_b = cls.compute_from(b, **kwargs)
        return cls(range_ @ qr_b.q, qr_b.r, qr_b.ind)

    # -- conversions ----------------------------------------------------------
    @with_precision
    def to_mat(self):
        """Reassemble the (approximate) original matrix:
        ``Q @ (R with inverse column permutation)`` (qr.rs:159-166)."""
        r_unperm = apply_matrix_permutation(
            self.r, self.ind, MatrixPermutationMode.COLINV)
        return self.q @ r_unperm

    def compress_qr_rank(self, max_rank: int) -> "QR":
        """Keep the leading ``max_rank`` columns of Q / rows of R
        (clamped to the available rank; qr.rs:169-184)."""
        max_rank = min(int(max_rank), self.rank)
        return QR(self.q[:, :max_rank], self.r[:max_rank, :], self.ind)

    def compress_qr_tolerance(self, tol: float) -> "QR":
        """Truncate before the first ``|r_ii / r_00| < tol``; raise
        ``CompressionError`` if the diagonal never drops below ``tol``
        (qr.rs:186-200)."""
        xp = np if isinstance(self.r, np.ndarray) else jnp
        d = xp.diagonal(self.r)
        ratios = xp.abs(d / d[0])
        pos = _tolerance_position(ratios, tol)
        if pos is None:
            raise CompressionError(
                f"Could not compress to relative tolerance {tol!r}")
        return self.compress_qr_rank(pos)

    def compress_qr_tolerance_masked(self, tol):
        """jit/vmap-safe tolerance truncation: mask instead of slice.

        Returns ``(rank, qr_masked, ok)`` where ``qr_masked`` keeps the
        padded static shape with columns of Q / rows of R beyond
        ``rank`` zeroed (so ``to_mat`` and factored applies are exact
        for the truncated factorization), and ``ok`` is False where the
        tolerance was unreachable (the in-jit analogue of the host
        API's ``CompressionError``, qr.rs:198; rank is then the full
        rank). The host-boundary ``compress_qr_tolerance`` slices; this
        variant is the SURVEY §7 mask-and-pad discipline for use inside
        ``jit`` — e.g. batched tolerance truncation that never leaves
        device (tests/test_containers.py::TestMaskedTolerance).
        """
        rank, ok = _tolerance_rank_device(jnp.diagonal(self.r), tol)
        masked = QR(_mask_cols(self.q, rank), _mask_rows(self.r, rank),
                    self.ind)
        return rank, masked, ok

    def compress(self, compression_type: CompressionType) -> "QR":
        """Dispatch on the compression selector (qr.rs:202-208)."""
        if isinstance(compression_type, Adaptive):
            return self.compress_qr_tolerance(compression_type.tol)
        if isinstance(compression_type, Rank):
            return self.compress_qr_rank(compression_type.rank)
        raise TypeError(f"unknown compression type: {compression_type!r}")

    @with_precision
    def column_id(self) -> ColumnID:
        """Column interpolative decomposition from this QR (qr.rs:270-309).

        Full-rank case: ``C = Q R`` and ``Z`` is the inverse-permuted
        identity (exact). Rank-deficient case:
        ``Z = [I | R11^{-1} R12]`` (one batched triangular solve instead of
        the reference's per-column loop), inverse-permuted; ``C = Q R11``.
        """
        xp = np if isinstance(self.r, np.ndarray) else jnp
        rank, ncols = self.rank, self.ncols
        if rank == ncols:
            c = self.q @ self.r
            z = apply_matrix_permutation(
                xp.eye(rank, dtype=self.r.dtype), self.ind,
                MatrixPermutationMode.COLINV)
            return ColumnID(c, z, self.ind)
        r11 = self.r[:, :rank]
        c = self.q @ r11
        z_tail = solve_upper_triangular(r11, self.r[:, rank:])
        z = xp.concatenate(
            [xp.eye(rank, dtype=self.r.dtype), z_tail], axis=1)
        z = apply_matrix_permutation(
            z, self.ind, MatrixPermutationMode.COLINV)
        return ColumnID(c, z, self.ind)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LQ:
    """Pivoted LQ decomposition ``P A = L Q`` (qr.rs:42-51).

    l: (m, k) lower triangular over permuted rows; q: (k, n) orthonormal
    rows; ind: (m,) int32 pivot vector (``ind[j] = k``: row ``j`` of
    ``L Q`` equals row ``k`` of the original).
    """

    l: jnp.ndarray
    q: jnp.ndarray
    ind: jnp.ndarray

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.l, self.q, self.ind), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- shape queries (qr.rs:57-70) -----------------------------------------
    @property
    def nrows(self) -> int:
        return self.l.shape[-2]

    @property
    def ncols(self) -> int:
        return self.q.shape[-1]

    @property
    def rank(self) -> int:
        return self.q.shape[-2]

    # -- construction --------------------------------------------------------
    @classmethod
    def compute_from(cls, a, max_rank=None, **kwargs) -> "LQ":
        """Pivoted LQ = (pivoted QR of A^H)^H (qr.rs:354-362)."""
        l, q, ind = pivoted_lq(a, max_rank=max_rank, **kwargs)
        return cls(l, q, ind)

    # -- conversions ----------------------------------------------------------
    @with_precision
    def to_mat(self):
        """``(L with inverse row permutation) @ Q`` (qr.rs:72-77)."""
        l_unperm = apply_matrix_permutation(
            self.l, self.ind, MatrixPermutationMode.ROWINV)
        return l_unperm @ self.q

    def compress_lq_rank(self, max_rank: int) -> "LQ":
        """Keep the leading ``max_rank`` rows of Q / columns of L
        (qr.rs:80-95)."""
        max_rank = min(int(max_rank), self.rank)
        return LQ(self.l[:, :max_rank], self.q[:max_rank, :], self.ind)

    def compress_lq_tolerance(self, tol: float) -> "LQ":
        """Mirror of ``QR.compress_qr_tolerance`` on the L diagonal
        (qr.rs:97-111)."""
        xp = np if isinstance(self.l, np.ndarray) else jnp
        d = xp.diagonal(self.l)
        ratios = xp.abs(d / d[0])
        pos = _tolerance_position(ratios, tol)
        if pos is None:
            raise CompressionError(
                f"Could not compress to relative tolerance {tol!r}")
        return self.compress_lq_rank(pos)

    def compress_lq_tolerance_masked(self, tol):
        """jit/vmap-safe tolerance truncation (mirror of
        ``QR.compress_qr_tolerance_masked`` on the L diagonal)."""
        rank, ok = _tolerance_rank_device(jnp.diagonal(self.l), tol)
        masked = LQ(_mask_cols(self.l, rank), _mask_rows(self.q, rank),
                    self.ind)
        return rank, masked, ok

    def compress(self, compression_type: CompressionType) -> "LQ":
        """Dispatch on the compression selector (qr.rs:113-119)."""
        if isinstance(compression_type, Adaptive):
            return self.compress_lq_tolerance(compression_type.tol)
        if isinstance(compression_type, Rank):
            return self.compress_lq_rank(compression_type.rank)
        raise TypeError(f"unknown compression type: {compression_type!r}")

    @with_precision
    def row_id(self) -> RowID:
        """Row interpolative decomposition from this LQ (qr.rs:363-403).

        Full-rank: ``X`` = inverse-row-permuted identity, ``R = L Q``.
        Rank-deficient: ``X = [I; L21 L11^{-1}]`` via one batched
        right-hand triangular solve, inverse-row-permuted; ``R = L11 Q``.
        """
        xp = np if isinstance(self.l, np.ndarray) else jnp
        rank, nrows = self.rank, self.nrows
        if rank == nrows:
            x = apply_matrix_permutation(
                xp.eye(rank, dtype=self.l.dtype), self.ind,
                MatrixPermutationMode.ROWINV)
            return RowID(x, self.l @ self.q, self.ind)
        l11 = self.l[:rank, :]
        r = l11 @ self.q
        # X2 = L21 @ L11^{-1}: right-hand-side lower-triangular solve.
        from ..ops.triangular import triangular_solve

        x_tail = triangular_solve(l11, self.l[rank:, :], left_side=False,
                                  lower=True)
        x = xp.concatenate(
            [xp.eye(rank, dtype=self.l.dtype), x_tail], axis=0)
        x = apply_matrix_permutation(
            x, self.ind, MatrixPermutationMode.ROWINV)
        return RowID(x, r, self.ind)
