"""tol <= 1e-8 interpolative decompositions on TPU.

The reference's flagship example — the two-sided interpolative
decomposition (rusty-compression examples/interpolative_decomposition.rs:
22-48) — runs natively in f64: pivoted QR through ``dgeqp3``
(pivoted_qr.rs:187-190), interpolation coefficients through f64
triangular solves (qr.rs:270-309, solves at qr.rs:296-300), skeletons
exact to f64. The TPU f32 container path floors near ``kappa * eps_f32``
(bench configs 2/4 gate at 1e-5/5e-3); this module reaches the
reference's accuracy class with the same split the refined rSVD uses:

1. **Capture (MXU, Ozaki double-float)** — ``highacc.refined_capture``
   produces a DF-orthonormal basis ``Q`` (m, L) and the host f64 core
   ``B = Q^H A`` (L, n) with ``||A - Q B|| <= eps_cap ||A||`` at the DF
   floor (fixed-round mode) or just below ``tol`` (growth mode). This
   is ALL of the O(m n L) work.
2. **Pivot (host f64, O(L^2 n))** — column-pivoted QR of the small core
   via LAPACK ``?geqp3`` (scipy), the reference's own kernel class, at
   a cost that is microseconds-to-milliseconds because it never touches
   the (m, n) matrix.
3. **Coefficients (host f64)** — ``Z = [I | R11^{-1} R12] P^{-1}`` via
   f64 triangular solves (qr.rs:296-300 class). The skeleton columns
   are taken VERBATIM from A, so per-column exactness is bitwise —
   stronger than the reference's f64-rounded ``C = Q R11``
   (qr.rs:287-288).

Error model: with ``B P = Q_B [R11 R12]`` and ``E = A - Q B``,

    A - C Z = E (I - S Z) + Q (B - B_J Z),   S = column selector,

so ``rel_err <= eps_cap (1 + ||Z||) + ||R22||_F / ||A||_F``: the first
term sits at the capture floor, the second is the pivoted-QR truncation
the tolerance controls — the same ``kappa * eps`` class the reference's
f64 path obeys. Pivot-index and permutation conventions follow
qr.rs:31-40 (``ind[j] = k`` — column j of the factorization is column k
of A) via the same inverse-permutation scatter the f32 containers use.

All returned containers hold host numpy f64/c128 factors (the accuracy
class lives in the factors; reconstruct in numpy — running them through
f32 device ops would re-floor the result).
"""

from __future__ import annotations

import numpy as np

from .models.interp_decomp import ColumnID, RowID, TwoSidedID
from .utils.errors import CompressionError

__all__ = ["refined_column_id", "refined_row_id", "refined_two_sided_id"]


def _as_f64(a) -> np.ndarray:
    """Host f64/c128 view of the input (DF pairs recombine exactly)."""
    from .utils.doublefloat import DF, df_to_f64

    if isinstance(a, DF):
        return df_to_f64(a)
    a = np.asarray(a)
    wide = np.complex128 if a.dtype.kind == "c" else np.float64
    return np.ascontiguousarray(a, dtype=wide)


def _host_qrcp(b: np.ndarray):
    """Column-pivoted QR of the small host core: LAPACK ``?geqp3``
    (the reference's kernel, pivoted_qr.rs:187-190) through scipy."""
    import scipy.linalg

    q, r, piv = scipy.linalg.qr(b, mode="economic", pivoting=True,
                                check_finite=False)
    return q, r, piv.astype(np.int64)


def _truncation_rank(diag: np.ndarray, tol: float | None, rank: int | None,
                     growth_captured: bool) -> int:
    """Reference tolerance semantics (qr.rs:186-200) on the core's
    R diagonal: truncate before the first ``|r_ii / r_00| < tol``
    (suffix-max envelope, robust to transient dips), error if the
    diagonal never drops below tol — unless the growth capture already
    certified the residual at tol, in which case the crossing sits at
    the capture boundary and the full core rank is the answer."""
    kk = diag.shape[0]
    kf = kk
    if tol is not None:
        ratios = np.abs(diag) / max(abs(diag[0]), np.finfo(np.float64).tiny)
        envelope = np.maximum.accumulate(ratios[::-1])[::-1]
        below = envelope < tol
        idx = int(np.argmax(below))
        if below[idx]:
            kf = idx
        elif not growth_captured:
            raise CompressionError(
                f"Could not compress to relative tolerance {tol!r}")
    if rank is not None:
        kf = min(kf, int(rank))
    return max(kf, 1)


def _capture_core(a64: np.ndarray, key, rank, tol, capture_kwargs):
    """Run the DF capture and return ``(b64, growth_mode, captured)``."""
    from .highacc import refined_capture

    _, b64, _, captured = refined_capture(a64, key, rank=rank, tol=tol,
                                          **capture_kwargs)
    growth = (rank is None
              and capture_kwargs.get("round_rank") is None)
    return b64, captured and growth


def _column_id_from_core(a64: np.ndarray, b64: np.ndarray,
                         tol: float | None, rank: int | None,
                         growth_captured: bool) -> ColumnID:
    """Host f64 column ID of A from its captured core ``B = Q^H A``:
    the pivots and coefficients of B transfer to A because
    ``A ~= Q B`` (qr.rs:270-309 container math on the core)."""
    n = a64.shape[1]
    _, rb, piv = _host_qrcp(b64)
    kf = _truncation_rank(np.diagonal(rb), tol, rank, growth_captured)
    z = _interp_coefficients(rb, piv, kf, n)
    c = a64[:, piv[:kf]].copy()  # verbatim columns of A (bitwise exact)
    return ColumnID(c, z, piv.astype(np.int32))


def _interp_coefficients(rb: np.ndarray, piv: np.ndarray, kf: int,
                         n: int) -> np.ndarray:
    """``Z = [I | R11^{-1} R12]`` inverse-column-permuted — one f64
    BLAS-3 triangular solve (vs the reference's per-column trsv loop,
    qr.rs:290-301)."""
    import scipy.linalg

    eye = np.eye(kf, dtype=rb.dtype)
    if kf < n:
        t = scipy.linalg.solve_triangular(rb[:kf, :kf], rb[:kf, kf:],
                                          lower=False, check_finite=False)
        zp = np.concatenate([eye, t], axis=1)
    else:
        zp = eye
    z = np.empty((kf, n), dtype=rb.dtype)
    z[:, piv] = zp  # COLINV scatter (permutation.rs:117-128 semantics)
    return z


def refined_column_id(a, key, rank: int | None = None,
                      tol: float | None = None,
                      **capture_kwargs) -> ColumnID:
    """Column interpolative decomposition ``A ~= C Z`` at the f64
    accuracy class on TPU (reference route: qr.rs:270-309 in f64).

    ``C`` holds verbatim columns of ``A`` (bitwise per-column
    exactness); ``Z`` comes from f64 triangular solves on the captured
    core. With ``tol`` alone the capture rank is discovered adaptively;
    ``rank=``/``round_rank=`` run the fixed-round (fused) capture.
    Raises ``CompressionError`` when the spectrum never crosses ``tol``
    (qr.rs:198 semantics). Factors are host numpy f64/c128.
    """
    a64 = _as_f64(a)
    b64, growth_captured = _capture_core(a64, key, rank, tol,
                                         capture_kwargs)
    return _column_id_from_core(a64, b64, tol, rank, growth_captured)


def refined_row_id(a, key, rank: int | None = None,
                   tol: float | None = None, **capture_kwargs) -> RowID:
    """Row interpolative decomposition ``A ~= X R`` at the f64 accuracy
    class: the conjugate-transposed column ID of ``A^H`` (the
    reference's own construction, qr.rs:354-362 + qr.rs:363-403).
    ``R`` holds verbatim rows of ``A``.
    """
    a64 = _as_f64(a)
    cid = refined_column_id(a64.conj().T, key, rank=rank, tol=tol,
                            **capture_kwargs)
    kf = cid.rank
    row_ind = np.asarray(cid.col_ind, dtype=np.int64)
    x = cid.z.conj().T
    r = a64[row_ind[:kf], :].copy()
    return RowID(x, r, row_ind.astype(np.int32))


def _host_row_id_of_columns(c: np.ndarray):
    """Exact (f64) row ID of a tall full-column-rank matrix ``C``:
    pivoted LQ of C = (QRCP of C^H)^H, then ``X = [I; L21 L11^{-1}]``
    inverse-row-permuted (qr.rs:363-403 at full column rank, where the
    row ID of C is exact up to conditioning)."""
    import scipy.linalg

    kf = c.shape[1]
    _, rc, pivr = _host_qrcp(c.conj().T)     # C^H (kf, m) -> rc (kf, m)
    l11 = rc[:, :kf].conj().T                # (kf, kf) lower triangular
    x_perm = np.empty((c.shape[0], kf), dtype=c.dtype)
    x_perm[:kf] = np.eye(kf, dtype=c.dtype)
    if c.shape[0] > kf:
        l21 = rc[:, kf:].conj().T            # (m-kf, kf)
        # X2^T solves L11^T X2^T = L21^T (plain transpose; qr.rs:384-395)
        x_perm[kf:] = scipy.linalg.solve_triangular(
            l11, l21.T, trans="T", lower=True, check_finite=False).T
    x = np.empty_like(x_perm)
    x[pivr, :] = x_perm                      # ROWINV scatter
    return x, pivr


def refined_two_sided_id(a, key, rank: int | None = None,
                         tol: float | None = None, side: str = "col",
                         **capture_kwargs) -> TwoSidedID:
    """Two-sided interpolative decomposition ``A ~= C X R`` at the f64
    accuracy class; ``X`` is the VERBATIM skeleton submatrix
    ``A[row_ind[:k], col_ind[:k]]`` (two_sided_interp_decomp.rs:9-10 —
    bitwise, where the reference carries f64 rounding).

    ``side="col"`` mirrors ``ColumnID::two_sided_id``
    (col_interp_decomp.rs:116-130): column ID of A, then an exact host
    row ID of the skeleton columns. ``side="row"`` mirrors
    ``RowID::two_sided_id`` (row_interp_decomp.rs:120-131).
    """
    a64 = _as_f64(a)
    if side == "col":
        cid = refined_column_id(a64, key, rank=rank, tol=tol,
                                **capture_kwargs)
        kf = cid.rank
        x, pivr = _host_row_id_of_columns(cid.c)
        skel = a64[pivr[:kf][:, None], np.asarray(cid.col_ind[:kf])].copy()
        return TwoSidedID(c=x, x=skel, r=cid.z,
                          row_ind=pivr.astype(np.int32),
                          col_ind=cid.col_ind)
    if side == "row":
        rid = refined_row_id(a64, key, rank=rank, tol=tol,
                             **capture_kwargs)
        kf = rid.rank
        # column ID of the skeleton rows R = A[I, :] (exact: R has full
        # row rank kf) — QRCP of the small (kf, n) block directly.
        _, rb, pivc = _host_qrcp(rid.r)
        z = _interp_coefficients(rb, pivc, kf, a64.shape[1])
        row_ind = np.asarray(rid.row_ind, dtype=np.int64)
        skel = a64[row_ind[:kf][:, None], pivc[:kf]].copy()
        return TwoSidedID(c=rid.x, x=skel, r=z,
                          row_ind=rid.row_ind,
                          col_ind=pivc.astype(np.int32))
    raise ValueError(f"side must be 'col' or 'row', got {side!r}")
