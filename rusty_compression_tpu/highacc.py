"""tol <= 1e-8 randomized SVD on TPU via compensated precision.

The reference reaches the 1e-8 accuracy class by running natively in
f64/c128 through LAPACK (rusty-compression src/qr.rs:408-416; 1e-12 test
contracts at src/svd.rs:289-298). This TPU has no usable f64 path at size
(CLAUDE.md), so this module reaches the same class with *iterative
refinement for low-rank approximation*:

1. **Round 1** — the fast f32 HMT pipeline (``sampling.range_finder`` +
   small SVD, all MXU) produces ``A1 = U1 W1`` with residual at the
   f32 floor (~1e-6..1e-7 relative).
2. **Exact residual** — ``R = A - U1 @ W1`` computed in double-float via
   the Ozaki-scheme GEMM (``ops.ozaki``): the f32 factors are *exact*
   inputs, so R carries the unexplained part of A *coherently* (it is
   low-rank: rank(R) <= rank(A_tail) + rank(A1)), at ~1e-11 accuracy.
3. **Round 2** — the same fast f32 pipeline compresses ``R.hi``
   (``R.lo`` is ~6e-8 * ||R|| ~ 1e-13 * ||A|| — negligible), capturing
   the directions round 1 missed.
4. **Merge** — ``[U1 | U2]`` is re-orthonormalized to double-float
   accuracy (Ozaki CholeskyQR2, ~1e-11 orthogonality), the projection
   ``B = Q^H A`` is recomputed in Ozaki arithmetic, and the small
   (L, n) matrix B gets an exact f64 SVD on the host. The final
   residual is pure projection error ``||(I - QQ^H) A||`` — the f32
   rounding noise of rounds 1/2 never enters the output factors.

Steps 2-4 run on the MXU as bf16 slice products (exact in f32 per
slice pair); the only host work is O(L^2 n) LAPACK on the tiny core.
Two orchestration modes exist:

* ``refined_rsvd`` — host-side stage by stage (each stage jitted),
  with data-dependent rank-deficiency handling (exact-f64 Gram
  eigencuts) between stages. The robust general route.
* ``refined_rsvd_fused`` / ``refined_rsvd_fused_batch`` — the whole
  capture traced into ONE XLA program (the host keeps only the tiny
  core SVD), with the DF merge done on device by the Newton-Schulz
  orthonormalization (ops/ns_polar.py). 2 dispatches per block (or per
  vmapped bucket chunk), which is what survives the TPU tunnel's
  25 ms-1.5 s per-dispatch flush latency; measured 3.8x end-to-end and
  ~4 GB/s/chip device-side at 4096^2. Falls back to the host route for
  saturated-tall shapes, on per-block verification misses (scheduler),
  and on backend compile rejections.

Design note (TPU-first): this replaces the reference's "just call dgemm/
dgesdd in f64" strategy — a direct translation would run at the
emulated-f64 path's ~100x slowdown. Complex (c128-class) inputs route
through the planar stages (``_c*``): a complex double-float is a c64
hi/lo pair (additive EFTs are componentwise), and every product runs as
4 real Ozaki slice GEMMs — the analogue of the reference's LAPACK
z-kernels (qr.rs:408-416 macro instantiation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .linop import DenseOperator
from .models.svd import SVD
from .ops.ozaki import ozaki_matmul_split, ozaki_split
from .sampling import range_finder
from .utils.doublefloat import (DF, df, df_add, df_complex, df_from_f64,
                                df_imag, df_norm_fro, df_real, df_sub,
                                df_to_f64, df_transpose)
from .utils.dtypes import herm
from .utils.errors import CompressionError
from .utils.precision import with_precision

__all__ = [
    "RefinedSVD", "refined_rsvd", "refined_rsvd_fused",
    "refined_rsvd_fused_batch", "refined_rsvd_batch", "refined_capture",
    "refined_fused_batch_begin", "refined_fused_batch_finish",
    "refined_rsvd_planar", "growth_capture_fused",
    "df_cholesky_qr2", "df_project", "cdf_cholesky_qr2",
    "DEFAULT_TERMS_PRODUCT", "DEFAULT_SLICES_DF", "SLICES_F32",
]

#: Slice-pair budget for DF x DF products (~2^-35 relative error —
#: three decades below the 1e-8 target).
DEFAULT_TERMS_PRODUCT = 7
#: Slices fully covering a double-float operand (49 bits / w=5).
DEFAULT_SLICES_DF = 10
#: Slices fully covering a plain f32 operand (24 bits / w=5).
SLICES_F32 = 5
#: ABSOLUTE magnitude cut for double-deflated merge directions (unit
#: columns in; genuine new directions deflate to sin(principal angle)
#: ~ O(1), in-span contamination to ~1e-7..1e-5 under TPU bf16 GEMMs).
#: A RELATIVE cut (pre-round-4: cn > 1e-5 * max(cn)) fails exactly when
#: a round is ALL noise — content rank below the round width, the
#: clamped-width stream's common case — because max(cn) is then itself
#: noise-scale and every filler survives svqb normalization (measured
#: 4.9e-8-class stream residuals, bench config 7). Cutting a genuine
#: direction at the 1e-4 line costs <= 1e-4 * ||R|| ~ 1e-12 relative
#: at the tol-1e-8 round where it can occur.
MERGE_CUT_ABS = 1e-4


def _nsl(terms: int) -> int:
    """Slices the pair cut at ``terms`` can actually consume: a product
    keeping pairs with p + q < terms never touches slice indices >=
    terms, so splitting beyond that wastes one full pass over the
    operand per extra slice (identical output either way)."""
    return min(DEFAULT_SLICES_DF, terms)


def _as_df(a) -> DF:
    """Coerce the input of a high-accuracy entry point to ``DF``.

    Accepts host f64/c128 arrays, device ``DF`` pairs, and
    ``LinearOperator``s. Operators are MATERIALIZED (``to_dense``): the
    Ozaki residual recurrence ``R = A - U W`` needs A's entries — a
    matrix-free high-accuracy path would need DF-accurate operator
    products, which a plain f32 closure cannot supply (the reference
    has no analogue either: its f64 path densifies through ``matmat``
    against identity-like probes, types.rs:60-71).
    """
    if isinstance(a, DF):
        return a
    from .linop import LinearOperator

    if isinstance(a, LinearOperator):
        a = np.asarray(jax.device_get(a.to_dense()))
    return df(a)


def _tri_inv(r64: np.ndarray) -> np.ndarray:
    """f64 inverse of a small upper-triangular matrix (host LAPACK)."""
    return np.linalg.solve(r64, np.eye(r64.shape[0], dtype=np.float64))


# ---------------------------------------------------------------------------
# Jitted device stages
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_slices", "contract_axis"))
def _split(x: DF, num_slices: int, contract_axis: int):
    return ozaki_split(x, num_slices, contract_axis=contract_axis)


@functools.partial(jax.jit, static_argnames=("terms",))
def _gram(y_slices, y_scale, terms: int) -> DF:
    """``Y^H Y`` from a column-scaled split of Y (slices reused
    transposed for the left operand — the per-column scale of Y is the
    per-row scale of Y^T, constant along the contraction axis)."""
    yt = jnp.swapaxes(y_slices, -1, -2)
    return ozaki_matmul_split(yt, y_scale.T, y_slices, y_scale, terms=terms)


@functools.partial(jax.jit, static_argnames=("terms", "slices_b"))
def _apply_right(y: DF, b: DF, terms: int, slices_b: int) -> DF:
    """``Y @ B`` with Y a (m, L) DF iterate and B small (L, L')."""
    ys, ysc = ozaki_split(y, _nsl(terms), contract_axis=1)
    bs, bsc = ozaki_split(b, min(slices_b, _nsl(terms)), contract_axis=0)
    return ozaki_matmul_split(ys, ysc, bs, bsc, terms=terms)


@functools.partial(jax.jit, static_argnames=("terms",))
def _residual(a: DF, u1, w1, terms: int) -> DF:
    """``A - U1 @ W1`` in double-float.

    U1/W1 are f32, but a 5-slice split is NOT exact for them: slices
    cover bits relative to the per-fiber max, so an element 2^-e below
    its row max keeps only ``25 - e`` of its 24 bits. A 5-slice
    residual floors the whole pipeline at ~3e-8 * sigma_1 (the
    regression in tests/test_highacc.py); 7 slices put the truncation
    floor at 2^-35 of the row scale — R exact to ~3e-11 * sigma_1,
    measured pipeline residual 1.7-2.2e-9 (same as the earlier 8-slice
    budget, at 28 instead of 36 pair-GEMMs over the (m, n) output).
    """
    s = max(terms, 7)
    us, usc = ozaki_split(df(u1), s, contract_axis=1)
    ws, wsc = ozaki_split(df(w1), s, contract_axis=0)
    p = ozaki_matmul_split(us, usc, ws, wsc, terms=s)
    return df_sub(a, p)


@functools.partial(jax.jit, static_argnames=("terms",))
def _project(q: DF, a_col_slices, a_col_scale, terms: int) -> DF:
    """``B = Q^H A`` from a cached column-scaled split of A."""
    qt = DF(q.hi.T, q.lo.T)
    qs, qsc = ozaki_split(qt, _nsl(terms), contract_axis=1)
    return ozaki_matmul_split(qs, qsc, a_col_slices, a_col_scale,
                              terms=terms)


# ---------------------------------------------------------------------------
# Complex (planar) stages
#
# A complex double-float is a c64 hi/lo pair: the additive EFTs in
# utils.doublefloat are componentwise FP adds, so they stay error-free
# per component — but the Ozaki mantissa-slice products are real-only,
# so every complex product decomposes into 4 real slice products
# (re/im planar). This is the c128-accuracy-class route the reference
# gets from LAPACK's z-kernels (macro instantiation qr.rs:408-416).
# ---------------------------------------------------------------------------


def _csplit(x: DF, num_slices: int, contract_axis: int):
    """Planar Ozaki splits of a complex DF: ((re_slices, re_scale),
    (im_slices, im_scale))."""
    return (ozaki_split(df_real(x), num_slices, contract_axis=contract_axis),
            ozaki_split(df_imag(x), num_slices, contract_axis=contract_axis))


def _cmul_from_splits(asp, bsp, terms: int) -> DF:
    """Complex product from planar splits: 4 real Ozaki GEMMs."""
    (ars, arc), (ais, aic) = asp
    (brs, brc), (bis, bic) = bsp
    rr = ozaki_matmul_split(ars, arc, brs, brc, terms=terms)
    ii = ozaki_matmul_split(ais, aic, bis, bic, terms=terms)
    ri = ozaki_matmul_split(ars, arc, bis, bic, terms=terms)
    ir = ozaki_matmul_split(ais, aic, brs, brc, terms=terms)
    return df_complex(df_sub(rr, ii), df_add(ri, ir))


@functools.partial(jax.jit, static_argnames=("num_slices", "contract_axis"))
def _csplit_jit(x: DF, num_slices: int, contract_axis: int):
    return _csplit(x, num_slices, contract_axis)


@functools.partial(jax.jit, static_argnames=("terms",))
def _cgram(yr_s, yr_c, yi_s, yi_c, terms: int) -> DF:
    """``Y^H Y`` for complex Y from planar column-scaled splits:
    ``(Yr^T Yr + Yi^T Yi) + i (Yr^T Yi - Yi^T Yr)``."""
    yrt = jnp.swapaxes(yr_s, -1, -2)
    yit = jnp.swapaxes(yi_s, -1, -2)
    rr = ozaki_matmul_split(yrt, yr_c.T, yr_s, yr_c, terms=terms)
    ii = ozaki_matmul_split(yit, yi_c.T, yi_s, yi_c, terms=terms)
    ri = ozaki_matmul_split(yrt, yr_c.T, yi_s, yi_c, terms=terms)
    ir = ozaki_matmul_split(yit, yi_c.T, yr_s, yr_c, terms=terms)
    return df_complex(df_add(rr, ii), df_sub(ri, ir))


@functools.partial(jax.jit, static_argnames=("terms", "slices_b"))
def _capply_right(y: DF, b: DF, terms: int, slices_b: int) -> DF:
    """Complex ``Y @ B``."""
    ysp = _csplit(y, _nsl(terms), 1)
    bsp = _csplit(b, min(slices_b, _nsl(terms)), 0)
    return _cmul_from_splits(ysp, bsp, terms)


@functools.partial(jax.jit, static_argnames=("terms",))
def _cresidual(a: DF, u1, w1, terms: int) -> DF:
    """Complex ``A - U1 @ W1`` (slice budget per ``_residual``)."""
    s = max(terms, 7)
    usp = _csplit(df(u1), s, 1)
    wsp = _csplit(df(w1), s, 0)
    return df_sub(a, _cmul_from_splits(usp, wsp, s))


@functools.partial(jax.jit, static_argnames=("terms",))
def _cproject(q: DF, a_sp, terms: int) -> DF:
    """Complex ``B = Q^H A`` against a cached planar split of A:
    ``(Qr^T Ar + Qi^T Ai) + i (Qr^T Ai - Qi^T Ar)``."""
    qr, qi = df_real(q), df_imag(q)
    qr_sp = ozaki_split(DF(qr.hi.T, qr.lo.T), _nsl(terms),
                        contract_axis=1)
    qi_sp = ozaki_split(DF(qi.hi.T, qi.lo.T), _nsl(terms),
                        contract_axis=1)
    (ars, arc), (ais, aic) = a_sp
    rr = ozaki_matmul_split(*qr_sp, ars, arc, terms=terms)
    ii = ozaki_matmul_split(*qi_sp, ais, aic, terms=terms)
    ri = ozaki_matmul_split(*qr_sp, ais, aic, terms=terms)
    ir = ozaki_matmul_split(*qi_sp, ars, arc, terms=terms)
    return df_complex(df_add(rr, ii), df_sub(ri, ir))


def cdf_cholesky_qr(y: DF, terms: int = DEFAULT_TERMS_PRODUCT,
                    always_shift: bool = False):
    """Complex CholeskyQR pass in planar Ozaki arithmetic (see
    ``df_cholesky_qr``); host work is c128 LAPACK on the tiny Gram."""
    ysp = _csplit_jit(y, _nsl(terms), 0)
    (yrs, yrc), (yis, yic) = ysp
    g = df_to_f64(_cgram(yrs, yrc, yis, yic, terms))
    g = (g + g.conj().T) / 2.0
    m, l = y.shape[-2], g.shape[0]
    big_shift = 11.0 * (m * l + l * (l + 1)) * _U_OZAKI * np.linalg.norm(g)
    if always_shift:
        shift = big_shift
    else:
        shift = 4.0 * np.finfo(np.float64).eps * np.trace(g).real / l
    try:
        r64 = np.linalg.cholesky(g + shift * np.eye(l)).conj().T
    except np.linalg.LinAlgError:
        r64 = np.linalg.cholesky(g + big_shift * np.eye(l)).conj().T
    rinv = df_from_f64(_tri_inv_c(r64))
    q = _capply_right(y, rinv, terms, DEFAULT_SLICES_DF)
    return q, r64


def cdf_cholesky_qr2(y: DF, terms: int = DEFAULT_TERMS_PRODUCT,
                     shifted: bool = False):
    """Complex CholeskyQR2 (mirror of ``df_cholesky_qr2``)."""
    if shifted:
        y, r0 = cdf_cholesky_qr(y, terms, always_shift=True)
    q1, r1 = cdf_cholesky_qr(y, terms)
    q2, r2 = cdf_cholesky_qr(q1, terms)
    r = r2 @ r1
    for _ in range(3):
        with jax.default_matmul_precision("highest"):
            ortho = jnp.max(jnp.abs(herm(q2.hi) @ q2.hi
                                    - jnp.eye(q2.shape[-1],
                                              dtype=q2.hi.dtype)))
        if float(ortho) <= 5e-7:
            break
        q2, r3 = cdf_cholesky_qr(q2, terms)
        r = r3 @ r
    return q2, (r @ r0 if shifted else r)


def _tri_inv_c(r64: np.ndarray) -> np.ndarray:
    """c128 inverse of a small upper-triangular matrix (host LAPACK)."""
    return np.linalg.solve(r64, np.eye(r64.shape[0], dtype=r64.dtype))


# ---------------------------------------------------------------------------
# Double-float orthonormalization (hybrid device/host)
# ---------------------------------------------------------------------------


#: Effective unit roundoff of the Ozaki products at the default budget.
_U_OZAKI = 2.0 ** -35


def df_cholesky_qr(y: DF, terms: int = DEFAULT_TERMS_PRODUCT,
                   always_shift: bool = False):
    """One CholeskyQR pass in Ozaki arithmetic.

    Gram on the MXU (exact bf16 slice products), Cholesky + triangular
    inversion of the tiny (L, L) factor in f64 on the host, then
    ``Q = Y @ R^{-1}`` back on the MXU. Returns ``(q, r64)`` with ``q``
    a device DF and ``r64`` the host f64 triangular factor.

    ``always_shift`` applies the Fukaya et al. shifted-CholeskyQR shift
    ``11 (m L + L (L+1)) u ||G||`` (u = the Ozaki-product roundoff) so
    the factorization exists for any numerically full-rank Y — the
    first pass of ``df_cholesky_qr2`` on an ill-conditioned merge.

    Replaces the reference's LAPACK ``?orgqr`` Q materialization
    (pivoted_qr.rs:104-114) for the high-accuracy path; see
    ops/orthogonalize.py for the plain-f32 equivalents.
    """
    ys, ysc = _split(y, _nsl(terms), 0)
    g = df_to_f64(_gram(ys, ysc, terms))
    g = (g + g.T) / 2.0
    m, l = y.shape[-2], g.shape[0]
    big_shift = 11.0 * (m * l + l * (l + 1)) * _U_OZAKI * np.linalg.norm(g)
    if always_shift:
        shift = big_shift
    else:
        # Tiny guard for iterates that are rank-deficient at the DF floor.
        shift = 4.0 * np.finfo(np.float64).eps * np.trace(g) / l
    try:
        r64 = np.linalg.cholesky(g + shift * np.eye(l)).T
    except np.linalg.LinAlgError:
        # Exactly rank-deficient iterate (e.g. more basis columns than
        # the block's numerical range, a padded-block stream): escalate
        # to the always-existing shifted factorization; the caller's
        # verification pass restores orthogonality.
        r64 = np.linalg.cholesky(g + big_shift * np.eye(l)).T
    rinv = df_from_f64(_tri_inv(r64))
    q = _apply_right(y, rinv, terms, DEFAULT_SLICES_DF)
    return q, r64


def df_cholesky_qr2(y: DF, terms: int = DEFAULT_TERMS_PRODUCT,
                    shifted: bool = False):
    """CholeskyQR2 in Ozaki arithmetic: orthogonality to ~2^-35.

    Two plain passes handle cond(Y) below ~2e5 (cond^2 * 2^-35 < 1).
    ``shifted=True`` prepends an always-shifted pass (DF analogue of
    shifted CholeskyQR3), extending the reach to arbitrarily overlapping
    inputs such as merged f32 basis blocks whose deflated columns came
    out near-parallel to the existing basis.
    """
    if shifted:
        y, r0 = df_cholesky_qr(y, terms, always_shift=True)
    q1, r1 = df_cholesky_qr(y, terms)
    q2, r2 = df_cholesky_qr(q1, terms)
    r = r2 @ r1
    # Escalated-shift escape hatch (rank-deficient merges, direct QR of
    # ill-conditioned inputs): a cheap f32-level orthogonality check
    # triggers polishing passes until the factor settles.
    for _ in range(3):
        with jax.default_matmul_precision("highest"):
            ortho = jnp.max(jnp.abs(herm(q2.hi) @ q2.hi
                                    - jnp.eye(q2.shape[-1],
                                              dtype=q2.hi.dtype)))
        if float(ortho) <= 5e-7:
            break
        q2, r3 = df_cholesky_qr(q2, terms)
        r = r3 @ r
    return q2, (r @ r0 if shifted else r)


def df_project(q: DF, a_col_split, terms: int = DEFAULT_TERMS_PRODUCT) -> DF:
    """``Q^H A`` against a cached ``ozaki_split(A, contract_axis=0)``."""
    return _project(q, a_col_split[0], a_col_split[1], terms)


# ---------------------------------------------------------------------------
# The refined rSVD driver
# ---------------------------------------------------------------------------


class RefinedSVD(NamedTuple):
    """High-accuracy SVD: device DF left factor, host f64 s / Vt.

    The (m, k) ``u`` stays on device in double-float (its natural form
    for further device work — e.g. factored applies via two Ozaki
    GEMMs); ``s``/``vt`` come from the host f64 core SVD. ``to_f64()``
    materializes the f64 triple on host.
    """

    u: DF
    s: np.ndarray
    vt: np.ndarray
    history: tuple
    #: False when a requested tolerance was unreachable and the caller
    #: asked for containment instead of ``CompressionError`` (stream
    #: drivers record the failure per block; SURVEY §5 elastic
    #: recovery). The factors are then the full-rank capture.
    tol_ok: bool = True
    #: Spectral-cut-optimal Frobenius residual: the tail Frobenius mass
    #: of the UNTRUNCATED core spectrum beyond the tolerance cut,
    #: ``sqrt(sum(s_hat[kf:]^2)) / ||s_hat||_2``. The reference's
    #: tolerance is a SPECTRAL cut (first ``s_i/s_0 < tol`` excluded,
    #: qr.rs:190-194 / svd.rs:92-95); on a flat-tailed spectrum (many
    #: just-below-tol directions — e.g. admissible Laplace blocks with
    #: a ~7e-9 numerical floor) the Frobenius residual of even the
    #: OPTIMAL rank-kf factorization is ~tol*sqrt(#tail), well above
    #: the 5*tol Frobenius gate calibrated on fast-decay fixtures.
    #: Stream drivers gate against ``max(5*tol, slack*opt_resid)`` —
    #: "achieved what the spectral contract allows".
    opt_resid: float | None = None

    @property
    def rank(self) -> int:
        return int(self.s.shape[0])

    def to_f64(self):
        return df_to_f64(self.u), self.s, self.vt

    def to_svd(self) -> SVD:
        """Device-f32/c64 view (drops the low parts) as a standard ``SVD``."""
        return SVD(self.u.hi, jnp.asarray(self.s, jnp.float32),
                   jnp.asarray(self.vt, self.u.hi.dtype))

    def residual_fro(self, a64: np.ndarray) -> float:
        """Host f64 ``||A - U S Vt||_F / ||A||_F`` (the bench gate)."""
        u64 = df_to_f64(self.u)
        r = a64 - u64 @ (self.s[:, None] * self.vt)
        return float(np.linalg.norm(r) / np.linalg.norm(a64))


@with_precision
def _orthonormalize_f32(y):
    # svqb, not a CholeskyQR variant: the deflated round-2 block is
    # rank-deficient whenever the basis already spans the block's
    # numerical range (padded blocks, over-ranked rounds). CholeskyQR
    # kernels emit garbage columns beyond cond ~ 1/u, which poisons the
    # DF merge; svqb emits its directions in descending-eigenvalue
    # order, so the caller can slice off the numerically dead tail.
    # passes=2: the DF Newton-Schulz merge after this handles Gram cond
    # up to ~1e4, so the third polish pass (one more ~0.7 ms device
    # eigh) bought nothing — accuracy gates unchanged at 2.
    from .ops.orthogonalize import svqb
    return svqb(y, passes=2)


@with_precision
def _gram_eigvals(d):
    """Ascending eigenvalues of the f32 Gram matrix (rank probe)."""
    return jnp.linalg.eigvalsh(herm(d) @ d)


@with_precision
def _f32_round(a_hi, key, size: int, power_iters: int,
               final_passes: int = 3, svd_lift: bool = False):
    """One fast-pipeline round: f32 range finder + projection.

    Returns ``(u, w) = (Q, Q^H A)`` — the f32 rank-``size``
    approximation ``a_hi ~= u @ w`` (the svd.rs:171-183 sketch pattern
    WITHOUT the small SVD: recomposing ``Q uhat, s vt`` spans the same
    subspace and carries the same f32-level factor error, which the
    Ozaki residual round repairs either way — but the (size, n) device
    SVD and the (m, size) lift GEMM it costs are the slowest non-GEMM
    ops in the fused capture on TPU).
    """
    # svqb everywhere, incl. mid-iteration: the power iterate's
    # condition is sigma_1/sigma_l of the *remaining* spectrum — beyond
    # CholeskyQR-family reach (1/u) when a round spans >7 decades in
    # f32. The eigh-free shift-NS alternative (ops.orthogonalize.nsqb)
    # was evaluated and REJECTED here: without the eigenbasis, weak
    # directions stay mixed into strong columns and fall below the f32
    # rounding floor — measured span residual 1.4e-6 vs svqb's 1.4e-7
    # on a decaying-spectrum iterate, flooring the whole capture at
    # ~3e-7. The eigh is load-bearing.
    # final_passes=3 (round-4 regression fix): with only 2 passes the
    # round basis Q keeps ~1e-5-class orthogonality error in its weak
    # directions under TPU 6-pass-bf16 GEMMs, so the Ozaki residual
    # R = A - Q(Q^H A) carries ~1e-5*sigma_weak of IN-SPAN
    # contamination; round 2 then spends its capacity re-capturing
    # span(Q) instead of the genuinely missing directions, flooring the
    # capture at 3.6e-8..2.4e-7 (the round-3 config-6/7 TPU gate
    # failures — deterministic per key: key 8 reproduces the recorded
    # 1.30e-7 exactly). The third pass polishes Q to the f32 floor and
    # restores the steady 8.7e-9 class (A/B over keys 8/81/82 at 4096^2
    # on TPU, 2026-08-19); its cost is one ~0.7 ms (l, l) eigh per
    # round — noise next to the tunnel wall. CPU tests cannot see any
    # of this (exact f32 GEMMs), which is how the trim slipped through.
    q = range_finder(DenseOperator(a_hi), key, size,
                     power_iters=power_iters, ortho="svqb",
                     final_passes=final_passes)
    w = herm(DenseOperator(a_hi).conj_matmat(q))
    if svd_lift:
        # Recompose the sketch SVD (the pre-round-3 round shape): same
        # span, but U comes out with near-exactly-orthonormal columns
        # aligned to the local spectrum — an A/B knob for the capture
        # margin (VERDICT r3 weak #1).
        uh, s, vt = jnp.linalg.svd(w, full_matrices=False)
        return q @ uh, s[:, None] * vt
    return q, w


def _certify_basis(u, iscx: bool):
    """Drop structurally dead columns from a round-1 basis.

    When the sketch width exceeds the block's CONTENT rank (the
    canonical case: a zero-padded bucket block whose true min dim is
    below ``l`` — e.g. a (129, 405) block in a (256, 512) bucket),
    svqb's clipped tail columns are out-of-span garbage at unit norm.
    They are mutually independent in the padded ambient space, so the
    round-2 merge certification (which only examines ADDED columns)
    never removes them — and they drive the DF merge's Gram exactly
    singular, costing ~sqrt(shift) of span accuracy (the 2e-4-class
    stream failures of the round-3 1k-block run). svqb orders columns
    by descending eigenvalue, so the dead tail is a suffix: certify
    with the same fast-f32 / exact-f64 Gram eigencut as ``_merge_block``
    and slice it off.
    """
    lam32 = np.asarray(_gram_eigvals(u))
    if lam32[0] > 1e-3 * lam32[-1]:
        return u
    c64 = np.asarray(u).astype(np.complex128 if iscx else np.float64)
    lam = np.linalg.eigvalsh(c64.conj().T @ c64)
    keep = max(int(np.sum(lam > 1e-12 * lam[-1])), 1)
    return jnp.asarray(np.asarray(u)[:, :keep])


def _merge_block(basis, u_i, iscx: bool, room: int):
    """Merge a new round's f32 block into the basis.

    The new block overlaps span(basis) (the residual carries the
    previous round's *in-span* factor error too), so the raw
    concatenation is near rank-deficient. Deflate in f32 (twice is
    enough), svqb the remainder, then append only the directions
    an *exact* (host f64) Gram certifies as independent: a padded
    or small block's content subspace can be narrower than the
    ambient min(m, n), and columns beyond its dimension are
    structurally impossible to orthonormalize — they turned the
    DF-merge Gram exactly singular and cost ~sqrt(shift) of span
    accuracy. Structural fillers show exact-Gram eigenvalues at
    the f64 rounding floor (~1e-16); genuinely-but-barely tilted
    directions (lam 1e-10..1e-4, i.e. sin(angle) 1e-5..1e-2) are
    KEPT — the DF CholeskyQR2 merge handles cond up to ~1e13, and
    dropping them costs sin(angle)*||r|| of capture. An f32 probe
    cannot draw this line; its noise floor sits inside the
    genuine range.

    Returns the (possibly unchanged) basis; a return with the same
    column count signals that nothing independent was left to add.
    """
    d = u_i - basis @ (herm(basis) @ u_i)
    d = d - basis @ (herm(basis) @ d)
    dq = _orthonormalize_f32(d)[:, :room]
    cand = jnp.concatenate([basis, dq], axis=1)
    # Fast path: an on-device f32 Gram certifies independence when
    # its min eigenvalue clears the f32 noise floor (~l*eps) — the
    # typical big-block case; no host round trip.
    lam32 = np.asarray(_gram_eigvals(cand))
    if lam32[0] > 1e-3 * lam32[-1]:
        return cand
    cand = np.asarray(cand)
    c64 = cand.astype(np.complex128 if iscx else np.float64)
    lam = np.linalg.eigvalsh(c64.conj().T @ c64)
    keep = int(np.sum(lam > 1e-12 * lam[-1])) - basis.shape[1]
    if keep <= 0:
        return basis
    return jnp.asarray(cand[:, :basis.shape[1] + keep])


def _capture_basis_host(a: DF, key, l: int, power_iters: int,
                        refine_rounds: int, terms: int):
    """Host-orchestrated fixed-round basis capture (see ``refined_rsvd``).

    Returns ``(q, history)`` — ``q`` the DF-orthonormal merged basis,
    ``history`` the f32-norm residual estimate after each round — or
    ``(None, ...)`` never: the saturated-tall guard is the caller's.
    """
    iscx = jnp.iscomplexobj(a.hi)
    m, n = a.shape
    keys = jax.random.split(key, 1 + refine_rounds)
    u1, w1 = _f32_round(a.hi, keys[0], l, power_iters)
    basis = _certify_basis(u1, iscx)
    history = []
    r = a
    u_i, w_i = u1, w1
    residual_fn = _cresidual if iscx else _residual
    for i in range(refine_rounds):
        r = residual_fn(r, u_i, w_i, terms=7)
        history.append(float(jnp.linalg.norm(r.hi)))
        room = min(m, n) - basis.shape[1]
        if room <= 0:
            break
        u_i, w_i = _f32_round(r.hi, keys[1 + i], l, power_iters)
        new_basis = _merge_block(basis, u_i, iscx, room)
        if new_basis.shape[1] == basis.shape[1]:
            break
        basis = new_basis

    # Polish the merged basis to ~2^-35 orthogonality (span-preserving).
    # The shifted first pass is required: deflated near-noise columns
    # can come out of the f32 orthonormalization with substantial
    # overlap onto the existing basis, so the merge is not guaranteed
    # well-conditioned.
    y = DF(basis, jnp.zeros_like(basis))
    qr2 = cdf_cholesky_qr2 if iscx else df_cholesky_qr2
    q, _ = qr2(y, terms, shifted=refine_rounds > 0)
    return q, tuple(history)


def _capture_basis_growth(a: DF, key, tol: float, oversample: int,
                          power_iters: int, terms: int,
                          block: int | None = None,
                          max_rank: int | None = None):
    """Adaptive basis capture: grow until the DF residual crosses ``tol``.

    The rank-discovery loop at the north-star tolerance — reference
    semantics of ``sample_range_adaptive`` (rusty-compression
    src/random_sampling.rs:202-282: keep drawing blocks while the
    residual estimate sits above tol, return the residual history) but
    with the residual tracked EXACTLY in double-float via the Ozaki
    residual recurrence ``R_{i+1} = R_i - U_i W_i`` (each round's f32
    approximation subtracted error-free), so the loop can stop at
    tolerances far below the f32 floor that bounds the device-side
    adaptive sampler.

    Returns ``(q, history, captured)``; ``captured`` is True when the
    loop stopped because the residual crossed ``tol`` (so a spectrum
    that never dips below tol in the projected core still counts as
    compressed at the full capture rank), False when the basis
    exhausted the search space first (the caller decides whether
    that is a ``CompressionError``).
    """
    iscx = jnp.iscomplexobj(a.hi)
    m, n = a.shape
    cap = min(m, n) if max_rank is None else min(max_rank, m, n)
    norm_a = float(df_norm_fro(a))
    if norm_a == 0.0:
        z = jnp.zeros((m, 1), dtype=a.hi.dtype)
        return DF(z, jnp.zeros_like(z)), (0.0,), True
    l = min(int(block) if block else max(16, int(oversample) + 22), cap)
    residual_fn = _cresidual if iscx else _residual
    qr2 = cdf_cholesky_qr2 if iscx else df_cholesky_qr2

    key, k0 = jax.random.split(key)
    u_i, w_i = _f32_round(a.hi, k0, l, power_iters)
    basis = _certify_basis(u_i, iscx)
    r = a
    history = []
    captured = False
    # Stop margin: the final residual is the projection error onto the
    # merged basis, bounded by the tracked recurrence residual (the
    # projection is optimal over a span containing every round's
    # columns, minus merge-dropped near-dependent directions whose
    # contribution already lies in the span). 0.5x covers the
    # difference plus the f32 norm estimate's noise.
    while True:
        r = residual_fn(r, u_i, w_i, terms=7)
        res = float(df_norm_fro(r)) / norm_a
        history.append(res)
        if res <= 0.5 * tol:
            captured = True
            break
        room = cap - basis.shape[1]
        if room <= 0:
            break
        # Saturated tall guard (see refined_rsvd): f32 round columns
        # tilt ~1e-7 out of span(A); once the basis approaches the
        # small dimension of a TALL matrix those tilts floor the
        # capture. Switch to the direct DF factorization of A itself —
        # every column is an A-combination, in span by construction.
        l_next = min(l, room)
        if m > n and basis.shape[1] + l_next >= n:
            q, _ = qr2(a, terms, shifted=True)
            return q, tuple(history), True
        key, ki = jax.random.split(key)
        u_i, w_i = _f32_round(r.hi, ki, l_next, power_iters)
        new_basis = _merge_block(basis, u_i, iscx, room)
        if new_basis.shape[1] == basis.shape[1]:
            break  # nothing independent left: span is exhausted
        basis = new_basis
        # Geometric block growth caps the round count (and the set of
        # compiled shapes) for deep spectra.
        l = min(2 * l, 256)

    y = DF(basis, jnp.zeros_like(basis))
    q, _ = qr2(y, terms, shifted=True)
    return q, tuple(history), captured


def _svqb_cut(y, passes: int = 3):
    """svqb with a final-pass eigencut to ZERO (fused-growth merge).

    Identical to ``ops.orthogonalize.svqb`` except (a) exactly-zero
    columns keep a zero diagonal scale (they stay zero instead of
    becoming unit fillers) and (b) the last pass zeroes directions
    whose Gram eigenvalue sits below 1e-6 of the top — deflated
    near-noise directions come out as ZERO columns. Inside the fused
    growth loop that is the right bias: a genuinely-but-barely tilted
    direction that gets cut is re-sampled by the NEXT round (the
    residual recurrence still sees it), whereas a unit-norm filler
    would poison the DF merge (the host route's exact-f64 certification
    is unavailable on device).
    """
    from .utils.dtypes import eps as _eps

    l = y.shape[-1]
    for p in range(passes):
        g = herm(y) @ y
        dg = jnp.real(jnp.diagonal(g, axis1=-2, axis2=-1))
        d = jnp.where(dg > 0, jax.lax.rsqrt(jnp.maximum(dg, 1e-30)), 0.0)
        d = d.astype(y.dtype)
        gs = g * d[..., :, None] * d[..., None, :]
        lam, v = jnp.linalg.eigh(gs)
        clip = l * _eps(y.dtype) * jnp.maximum(lam[..., -1:], 1e-30)
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(lam, clip))
        if p == passes - 1:
            # 1e-7: noise fillers sit at eigenvalue ~1e-10 of the top
            # (overlap ~1e-5 squared); genuine weak directions at
            # amplitude 3e-4+ survive. 1e-6 measurably cost capture
            # (config 6 resid 8.7e-9 -> 1.1e-8 on TPU).
            inv_sqrt = jnp.where(lam > 1e-7 * jnp.maximum(lam[..., -1:],
                                                          1e-30),
                                 inv_sqrt, 0.0)
        y = (y * d[..., None, :]) @ (v * inv_sqrt[..., None, :]
                                     .astype(y.dtype))
        y = y[..., ::-1]
    return y


@functools.partial(jax.jit, static_argnames=("l", "rounds", "power_iters",
                                             "terms", "residual_terms"))
def _fused_growth(a: DF, key, tol, l: int, rounds: int, power_iters: int,
                  terms: int, residual_terms: int = 7):
    """The WHOLE growth capture as one XLA program (rank discovery at
    tol <= 1e-8 in a single dispatch).

    The host growth loop (``_capture_basis_growth``) pays O(rounds)
    tunnel dispatches plus host eigencut round trips per round — 0.86 s
    at 512^2 for ms-class device compute (VERDICT r3 weak #5). Here the
    residual recurrence, the f32 rounds, the deflate/svqb merge, and
    the DF-norm stopping test run inside ``lax.while_loop`` over a
    preallocated (m, l*rounds) basis buffer: masked-rank discipline
    (zero columns stay zero through every stage — the svqb diagonal
    scale, the eigencut, and the shifted NS orthonormalization are all
    zero-preserving), with ``lax.dynamic_update_slice`` writes at the
    running column offset. Reference semantics: keep drawing blocks
    while the residual estimate sits above tol, return the residual
    history (random_sampling.rs:202-282) — with the residual tracked
    EXACTLY in double-float (the f32 device sampler's floor does not
    apply).

    Returns ``(q, b, hist, res, count)``: the DF basis over the full
    buffer (dead columns zero), the DF core ``Q^H A``, the per-round
    residual history (inf where rounds did not run), the last measured
    relative residual, and the column count. Real dtypes only (the
    planar complex growth stays on the host route).
    """
    from .ops.ns_polar import df_orthonormalize_ns

    m, n = a.shape
    cap = l * rounds
    norm_a = jnp.maximum(df_norm_fro(a), jnp.float32(1e-30))
    keys = jax.random.split(key, rounds + 1)
    u0, w0 = _f32_round(a.hi, keys[0], l, power_iters)
    buf0 = jnp.zeros((m, cap), a.hi.dtype)
    buf0 = jax.lax.dynamic_update_slice(buf0, u0, (0, 0))
    hist0 = jnp.full((rounds,), jnp.inf, jnp.float32)
    state0 = (jnp.int32(1), jnp.float32(jnp.inf), a, u0, w0, buf0, hist0)

    def cond(st):
        i, res, *_ = st
        # non-improvement stop (round 5): a FLAT spectral tail can
        # never reach the Frobenius target — its residual stalls at
        # the tail mass while further rounds sample pure noise, whose
        # merged fillers degrade the basis under bf16 GEMMs (measured
        # 5e-6-class captures on the volume's tall Laplace blocks).
        # hist[i-2] is the previous round's measured residual; a round
        # that bought < 10% stops the loop — the HMT estimator-driven
        # semantics (random_sampling.rs:248) with an honest stall
        # detector. Deep spectra improve by decades per round and
        # never trip it.
        # on entry, res == hist[i-2] (the latest measurement); the one
        # before it is hist[i-3] — defined from the third iteration on
        hist = st[6]
        prev = jnp.where(i >= 3, hist[jnp.maximum(i - 3, 0)],
                         jnp.float32(jnp.inf))
        improving = jnp.isinf(prev) | (res < 0.9 * prev)
        return (res > 0.5 * tol) & (i < rounds) & improving

    def body(st):
        i, res, r, u, w, buf, hist = st
        r2 = _residual(r, u, w, terms=residual_terms)
        res2 = (df_norm_fro(r2) / norm_a).astype(jnp.float32)
        hist2 = hist.at[i - 1].set(res2)

        def sample():
            u2, w2 = _f32_round(r2.hi, keys[i], l, power_iters)
            d = _deflate_twice(buf, u2)
            # magnitude cut BEFORE svqb: double-deflated in-span
            # columns shrink to ~1e-7; svqb's diagonal scaling would
            # erase that signal and promote them to unit fillers. The
            # cut is ABSOLUTE (see MERGE_CUT_ABS: a relative cut keeps
            # every filler when the whole round is noise).
            cn = jnp.linalg.norm(d, axis=0)
            d = d * ((cn > MERGE_CUT_ABS)
                     & (cn > 1e-5 * jnp.max(cn)))[None, :].astype(d.dtype)
            dq = _svqb_cut(d)
            return jax.lax.dynamic_update_slice(
                buf, dq, (jnp.int32(0), i * jnp.int32(l))), u2, w2

        buf2, u2, w2 = jax.lax.cond(
            res2 > 0.5 * tol, sample,
            lambda: (buf, jnp.zeros_like(u), jnp.zeros_like(w)))
        return (i + 1, res2, r2, u2, w2, buf2, hist2)

    i_f, res_f, _, _, _, buf_f, hist_f = jax.lax.while_loop(
        cond, body, state0)
    # Shifted robust NS: the merged buffer mixes svqb-deflated rounds
    # (Gram cond up to ~1e4) with exactly-zero dead columns — both
    # inside the shifted chain's domain; zeros stay zero.
    q = df_orthonormalize_ns(DF(buf_f, jnp.zeros_like(buf_f)),
                             terms=terms, mode="robust")
    a_col = ozaki_split(a, _nsl(terms), contract_axis=0)
    b = _project(q, a_col[0], a_col[1], terms)
    return q, b, hist_f, res_f, i_f * l


def _growth_rounds(cap: int, block: int) -> tuple[int, int]:
    """(l, rounds) for a fused growth buffer of capacity ``cap``:
    >= 2 rounds and ``l * rounds <= cap`` (see growth_capture_fused)."""
    l = max(min(int(block), cap // 2), 1)
    rounds = max(cap // l, 2)
    return cap // rounds, rounds


def _growth_fused_tall(a: DF, key, tol, block: int, power_iters: int,
                       terms: int, cap: int):
    """Fused growth for TALL real inputs via the transposed program.

    The direct fused loop saturates on tall matrices: the basis lives
    in R^m but can only hold min(m, n) = n directions, and every
    f32-sampled column tilts ~1e-7 out of span(A) — near saturation
    those tilts floor the capture (the reason round 4 routed m > n to
    the O(rounds)-dispatch host loop, highacc.py:857 r4). Growing the
    ROW-space basis instead is benign: A^T is (n, m) wide, its capture
    buffer fills the full ambient space R^n where no out-of-span tilt
    exists. Recompose on host:

      ``A ~= (A Q_r) Q_r^T = Y Q_r^T``,  ``Y := (Q_r^T A^T)^T`` exact
      in DF/Ozaki;  host f64 QR ``Y_live = Q R`` (live columns only —
      dead growth rounds are exact zeros);  ``B = R Q_r_live^T``.

    ``Q`` is exactly f64-orthonormal and ``A - Q B = A (I - Q_r
    Q_r^T)``, whose norm the device loop measured ``<= 0.5 tol``.
    One device dispatch + an O(m live^2) host QR (live ~ discovered
    rank + one round width) — reference semantics of the shape-
    agnostic adaptive sampler (random_sampling.rs:202-282).
    Returns ``(q, b64, hist, captured)``.
    """
    m, n = a.shape
    l, rounds = _growth_rounds(cap, block)
    at = df_transpose(a)
    q_r, b_r, hist, res, cnt = _fused_growth(at, key, tol, l=l,
                                             rounds=rounds,
                                             power_iters=power_iters,
                                             terms=terms)
    live = max(min(int(cnt), cap), 1)
    y64 = df_to_f64(b_r).T[:, :live]            # (m, live) = A Q_r_live
    q_r64 = df_to_f64(q_r)[:, :live]            # (n, live)
    # exact re-orthonormalization of the device basis without a second
    # read of A (see refined_fused_batch_finish's recompose): with
    # Q_r = U S V^H, A U = Y V S^{-1}
    ur, sr, vtr = np.linalg.svd(q_r64, full_matrices=False)
    keepm = sr > 1e-6 * max(float(sr[0]), 1e-30)
    sinv = np.where(keepm, 1.0 / np.where(sr > 0, sr, 1.0), 0.0)
    qy, ry = np.linalg.qr(y64 @ (vtr.T * sinv[None, :]))
    b64 = ry @ ur.T                             # (live, n)
    hist = tuple(float(h) for h in np.asarray(hist) if np.isfinite(h))
    captured = bool(float(res) <= 0.5 * tol)
    return df_from_f64(qy), b64, hist, captured


def _planar_project_c128(qc: np.ndarray, a: np.ndarray,
                         terms: int) -> np.ndarray:
    """Host c128 core ``B = Qc^H A`` from four REAL device Ozaki
    products (no complex dtype touches the device):
    ``Re B = Qr^T Ar + Qi^T Ai``, ``Im B = Qr^T Ai - Qi^T Ar``."""
    qr_df = df(np.ascontiguousarray(qc.real))
    qi_df = df(np.ascontiguousarray(qc.imag))
    are = _split(df(np.ascontiguousarray(a.real)), _nsl(terms), 0)
    aim = _split(df(np.ascontiguousarray(a.imag)), _nsl(terms), 0)
    rr = df_to_f64(_project(qr_df, are[0], are[1], terms))
    ii = df_to_f64(_project(qi_df, aim[0], aim[1], terms))
    ri = df_to_f64(_project(qr_df, aim[0], aim[1], terms))
    ir = df_to_f64(_project(qi_df, are[0], are[1], terms))
    return (rr + ii) + 1j * (ri - ir)


def _growth_fused_realified(a_c, key, tol, block: int = 64,
                            power_iters: int = 1,
                            terms: int = DEFAULT_TERMS_PRODUCT,
                            max_rank: int | None = None):
    """Complex adaptive growth with NO complex dtype on device.

    Realifies into the (2m, 2n) planar frame — ``sigma(Ar)``
    duplicates ``sigma(A)`` and relative residuals transfer one-to-one
    (see ``refined_rsvd_planar``) — and runs the SAME real fused
    growth program (single device dispatch; the transposed tall route
    when m > n). The complex basis is recovered on host: every
    captured column approximates ``rho(u) = (Re u; Im u)`` for a range
    vector ``u``, so ``q[:m] + i q[m:]`` is that vector; a host c128
    QR orthonormalizes the stack, and ``B = Qc^H A`` comes from four
    real Ozaki products. Replaces the O(rounds)-dispatch host loop for
    complex inputs (VERDICT r4 next #3).

    Returns ``(qc, b, history, captured)`` with ``qc`` host c128
    orthonormal and ``b`` the host c128 core.
    """
    a_c = np.ascontiguousarray(np.asarray(a_c), dtype=np.complex128)
    m, n = a_c.shape
    ar = np.block([[a_c.real, -a_c.imag], [a_c.imag, a_c.real]])
    q, _b, history, captured = growth_capture_fused(
        df(ar), key, tol, block=block, power_iters=power_iters,
        terms=terms,
        max_rank=(None if max_rank is None else 2 * int(max_rank)))
    q64 = df_to_f64(q)                       # (2m, L) real
    # drop exact-zero dead growth columns (host QR would replace them
    # with arbitrary fill directions — harmless but wasteful)
    live = np.linalg.norm(q64, axis=0) > 0
    if not live.any():
        live = np.zeros(q64.shape[1], bool)
        live[0] = True
    uc = q64[:m, live] + 1j * q64[m:, live]
    qc, _ = np.linalg.qr(uc)
    b = _planar_project_c128(qc, a_c, terms)
    return qc, b, history, captured


def growth_capture_fused(a, key, tol: float, block: int = 64,
                         power_iters: int = 1,
                         terms: int = DEFAULT_TERMS_PRODUCT,
                         max_rank: int | None = None,
                         oversample: int = 10):
    """Single-dispatch adaptive rank discovery (host wrapper).

    Drop-in for the fixed-round-free capture: returns
    ``(q, b64, history, captured)`` like ``refined_capture`` with
    ``tol`` alone, but the whole loop runs device-side (~1 dispatch +
    fetches instead of O(rounds) round trips). TALL inputs (m > n) run
    the transposed fused program (``_growth_fused_tall``); complex
    inputs realify into the (2m, 2n) planar frame and run the SAME
    real program, with the complex basis recovered on host
    (``_growth_fused_realified``) — no shape or dtype routes to the
    O(rounds)-dispatch host loop any more (VERDICT r4 next #3; the
    reference's sampler is shape-agnostic, random_sampling.rs:202-282).
    """
    a = _as_df(a)
    iscx = jnp.iscomplexobj(a.hi)
    m, n = a.shape
    if iscx:
        qc, b64, history, captured = _growth_fused_realified(
            df_to_f64(a), key, tol, block=block, power_iters=power_iters,
            terms=terms, max_rank=max_rank)
        return df_from_c128_host(qc), b64, history, captured
    cap = min(m, n) if max_rank is None else min(int(max_rank), m, n)
    if m > n:
        return _growth_fused_tall(a, key, tol, block=block,
                                  power_iters=power_iters, terms=terms,
                                  cap=cap)
    # >= 2 rounds (one refinement pass is what lifts the capture off
    # the f32 floor) AND l*rounds <= cap: a buffer wider than min(m, n)
    # has a structurally singular Gram no zero-cut can fully clean,
    # which wrecks the final NS orthonormalization.
    l = max(min(int(block), cap // 2), 1)
    rounds = max(cap // l, 2)
    l = cap // rounds
    q, b, hist, res, count = _fused_growth(a, key, tol, l=l,
                                           rounds=rounds,
                                           power_iters=power_iters,
                                           terms=terms)
    hist = tuple(float(h) for h in np.asarray(hist) if np.isfinite(h))
    captured = bool(float(res) <= 0.5 * tol)
    return q, df_to_f64(b), hist, captured


def _capture_rel_resid(a: DF, q: DF, b: DF, iscx: bool, terms: int) -> float:
    """Exact (DF/Ozaki) relative capture residual ``||A - Q B||_F /
    ||A||_F`` — the self-verification probe for fixed-round captures.

    The growth capture tracks this recurrence by construction; the
    fixed-round fused capture does not, so a backend whose GEMM
    numerics drift between sessions (observed on this tunnel: identical
    programs landed at 8.8e-9 in one window and 1.3e-7 in another
    before the round-4 svqb fix) can silently spend the margin. Three
    extra dispatches of already-jitted stages (~30% of one capture).
    """
    if iscx:
        p = _capply_right(q, b, terms, _nsl(terms))
    else:
        p = _apply_right(q, b, terms, _nsl(terms))
    r = df_sub(a, p)
    return float(df_norm_fro(r)) / float(df_norm_fro(a))


def _project_b64(a: DF, q: DF, iscx: bool, terms: int) -> np.ndarray:
    """Host f64/c128 core ``B = Q^H A`` via the Ozaki projection."""
    if iscx:
        return df_to_f64(_cproject(q, _csplit_jit(a, _nsl(terms), 0),
                                   terms))
    a_col = _split(a, _nsl(terms), 0)
    return df_to_f64(df_project(q, a_col, terms))


def refined_capture(a, key, rank: int | None = None,
                    tol: float | None = None, oversample: int = 10,
                    power_iters: int = 1, refine_rounds: int = 1,
                    terms: int = DEFAULT_TERMS_PRODUCT,
                    round_rank: int | None = None,
                    fused: bool = True, ns_mode: str = "fast",
                    residual_terms: int = 7, final_passes: int = 3,
                    svd_lift: bool = False, verify: bool = False):
    """DF-orthonormal range basis + f64 core of ``a`` (the capture).

    The shared front half of every high-accuracy factorization: the
    refined rSVD truncates the core's SVD (``refined_rsvd``); the
    interpolative decompositions pivot the core's QR (``highacc_id``).

    With ``round_rank`` (or ``rank``) given, runs the fixed-round
    pipeline (fused single-program capture when ``fused`` and the shape
    allows). With only ``tol``, runs the adaptive growth loop
    (``_capture_basis_growth``) — rank discovery at the north-star
    tolerance, reference semantics of random_sampling.rs:202-282.

    Returns ``(q, b64, history, captured)``: ``q`` the (m, L) DF basis,
    ``b64`` the host f64/c128 ``Q^H A`` core, ``history`` the per-round
    relative-residual estimates, and ``captured`` True when the capture
    residual provably crossed ``tol`` (always True in fixed-round mode —
    the caller's tolerance truncation re-checks against the spectrum).
    """
    a = _as_df(a)
    iscx = jnp.iscomplexobj(a.hi)
    m, n = a.shape

    if rank is None and round_rank is None:
        if tol is None:
            raise ValueError("need rank=, round_rank=, or tol=")
        if fused:
            # single-dispatch device-side growth loop (real, non-tall
            # inputs; growth_capture_fused routes the rest to the host
            # loop itself)
            try:
                return growth_capture_fused(a, key, tol,
                                            power_iters=power_iters,
                                            terms=terms,
                                            oversample=oversample)
            except jax.errors.JaxRuntimeError as ex:
                import warnings

                warnings.warn(f"fused growth failed ({ex}); falling "
                              "back to the host loop", RuntimeWarning)
        q, history, captured = _capture_basis_growth(
            a, key, tol, oversample, power_iters, terms)
        return q, _project_b64(a, q, iscx, terms), history, captured

    k = int(round_rank if round_rank is not None else rank)
    l = min(k + int(oversample), m, n)
    if m > n and l * (1 + refine_rounds) >= n:
        # Saturated tall case: when the randomized capacity would fill
        # the small dimension (l per round x rounds >= n < m), the
        # sketched basis needs ~n in-span directions but every
        # f32-computed column tilts ~1e-7 out of span(A); the tilts
        # keep the merged Gram well-conditioned while hiding in-span
        # rank deficiency, flooring the capture near 1e-7 (observed on
        # direct 120x90 streams). Instead orthonormalize A's own
        # columns in DF: every vector is an A-combination — in span(A)
        # by construction, capture exact to the Ozaki product accuracy.
        # (m <= n saturation is benign: the basis fills the whole
        # ambient space, where no tilt exists.)
        qr2 = cdf_cholesky_qr2 if iscx else df_cholesky_qr2
        q, _ = qr2(a, terms, shifted=True)
        return q, _project_b64(a, q, iscx, terms), (), True

    if fused:
        total = min(l * (1 + refine_rounds), m, n)
        try:
            q, b = _fused_capture(a, key, l=l, power_iters=power_iters,
                                  refine_rounds=refine_rounds, terms=terms,
                                  total=total, ns_mode=ns_mode,
                                  residual_terms=residual_terms,
                                  final_passes=final_passes,
                                  svd_lift=svd_lift)
            # Materialize inside the guard: dispatch is async, so
            # backend rejections surface at the first fetch.
            b64 = df_to_f64(b)
            if verify and tol is not None:
                # Self-verified capture: measure the exact DF residual;
                # on a miss (>2.5x tol — half the 5x accuracy gate),
                # discover the rank with the growth capture instead of
                # trusting the fixed-round result (backend-drift and
                # under-capacity insurance; see _capture_rel_resid).
                rel = _capture_rel_resid(a, q, b, iscx, terms)
                if rel <= 2.5 * tol:
                    # captured=True only when the measured residual is
                    # at tol itself (authorizes _finish_core's keep-all
                    # path); (tol, 2.5 tol] passes the 5x gate but keeps
                    # the reference's strict unreachable-tolerance error.
                    return q, b64, (rel,), rel <= tol
                q, history, captured = _capture_basis_growth(
                    a, jax.random.fold_in(key, 0x5EED), tol, oversample,
                    power_iters, terms)
                return (q, _project_b64(a, q, iscx, terms),
                        (rel, *history), captured)
            return q, b64, (), True
        except jax.errors.JaxRuntimeError as ex:
            # Environmental: the tunneled AOT compile helper
            # intermittently drops large programs ("response body
            # closed", HTTP 500), and some TPU backends reject pieces
            # of the fused complex program (UNIMPLEMENTED). The
            # host-orchestrated route compiles ~30 small programs
            # instead of one big one and gets through.
            import warnings

            warnings.warn(f"fused capture failed ({ex}); falling back "
                          "to the host-orchestrated route", RuntimeWarning)

    q, history = _capture_basis_host(a, key, l, power_iters,
                                     refine_rounds, terms)
    return q, _project_b64(a, q, iscx, terms), history, True


def refined_rsvd(a, key, rank: int | None = None, tol: float | None = None,
                 oversample: int = 10, power_iters: int = 1,
                 refine_rounds: int = 1,
                 terms: int = DEFAULT_TERMS_PRODUCT,
                 round_rank: int | None = None) -> RefinedSVD:
    """Randomized SVD of ``a`` to the f64 accuracy class on TPU.

    Args:
      a: (m, n) matrix — host f64/c128 array or device ``DF`` (complex
        pairs run through the planar 4x-real-product stages).
      key: PRNG key for the sketches.
      rank: target rank of each f32 round (default: ``round_rank``);
        the final factorization is truncated to ``rank`` (if given)
        after the merge.
      tol: relative tolerance for the final truncation (reference
        ``compress`` semantics, svd.rs:87-101: truncate before the first
        ``s_i/s_0 < tol``; raises ``CompressionError`` if the spectrum
        never drops below tol). When NEITHER ``rank`` nor ``round_rank``
        is given, ``tol`` alone drives the adaptive growth capture —
        rank discovery at the target tolerance (the reference's
        adaptive-sampling semantics, random_sampling.rs:202-282, at the
        f64 accuracy class).
      oversample: extra sketch columns per round (HMT p).
      power_iters: subspace iterations per f32 round (HMT q).
      refine_rounds: residual-compression rounds after round 1 in
        fixed-round mode. One round reaches ~1e-13 + spectral-tail; two
        are available for pathological spectra.
      terms: Ozaki slice-pair budget for the merge-stage products.
      round_rank: per-round capture rank (defaults to ``rank``).

    Returns a ``RefinedSVD``; ``history`` holds the estimated residual
    after each round (f32-norm estimates, diagnostic only).
    """
    from .utils.backend import use_host_complex

    if not isinstance(a, DF) and use_host_complex(a):
        # transparent complex dispatch (VERDICT r4 next #5): the device
        # rejects complex dtypes — run the realified ALL-REAL route
        # (same accuracy class; factors host-resident)
        return refined_rsvd_planar(a, key, rank=rank, tol=tol,
                                   oversample=oversample,
                                   power_iters=power_iters,
                                   refine_rounds=refine_rounds,
                                   terms=terms, round_rank=round_rank)
    a = _as_df(a)
    iscx = jnp.iscomplexobj(a.hi)
    if rank is None and round_rank is None:
        if tol is None:
            raise ValueError("need rank=, round_rank=, or tol= (tol alone "
                             "runs the adaptive growth capture)")
        q, history, captured = _capture_basis_growth(
            a, key, tol, oversample, power_iters, terms)
        b = _project_b64(a, q, iscx, terms)
        return _finish_core(q, b, iscx, terms, tol, rank, history,
                            captured=captured)

    k = int(round_rank if round_rank is not None else rank)
    m, n = a.shape
    l = min(k + int(oversample), m, n)
    if m > n and l * (1 + refine_rounds) >= n:
        qr2 = cdf_cholesky_qr2 if iscx else df_cholesky_qr2
        q, _ = qr2(a, terms, shifted=True)
        return _finish_refined(a, q, iscx, terms, tol, rank, history=())
    q, history = _capture_basis_host(a, key, l, power_iters,
                                     refine_rounds, terms)
    return _finish_refined(a, q, iscx, terms, tol, rank, history)


def _finish_refined(a: DF, q: DF, iscx: bool, terms: int,
                    tol: float | None, rank: int | None,
                    history: tuple) -> RefinedSVD:
    """Project, small-SVD, and truncate: the common tail of
    ``refined_rsvd`` (svd.rs:171-183 sketch-then-factorize pattern at
    DF accuracy; tolerance semantics of svd.rs:87-101)."""
    b = _project_b64(a, q, iscx, terms)
    return _finish_core(q, b, iscx, terms, tol, rank, history)


def _finish_core(q: DF, b: np.ndarray, iscx: bool, terms: int,
                 tol: float | None, rank: int | None,
                 history: tuple, captured: bool = False) -> RefinedSVD:
    """SVD of the host core + truncation + final DF apply."""
    uh, s, vt = np.linalg.svd(b, full_matrices=False)

    kf = s.shape[0]
    if tol is not None:
        below = np.nonzero(s / s[0] < tol)[0]
        if below.size == 0:
            if not captured:
                raise CompressionError(
                    f"Could not compress to relative tolerance {tol!r}")
            # The growth capture measured the residual at <= tol even
            # though no projected singular value dips below it: the
            # crossing sits exactly at the capture rank. Keep all of it.
        else:
            kf = int(below[0])
    if rank is not None:
        kf = min(kf, int(rank))
    uh = uh[:, :kf]
    opt = float(np.sqrt((s[kf:] ** 2).sum()) / np.linalg.norm(s))

    apply_fn = _capply_right if iscx else _apply_right
    u = apply_fn(q, df_from_f64(uh), terms, DEFAULT_SLICES_DF)
    return RefinedSVD(u, s[:kf], vt[:kf, :], tuple(history),
                      opt_resid=opt)


# ---------------------------------------------------------------------------
# Fused single-dispatch variant
# ---------------------------------------------------------------------------


@with_precision
def _deflate_twice(basis, u):
    """Two-pass block Gram-Schmidt of ``u`` against ``basis`` (f32)."""
    d = u - basis @ (herm(basis) @ u)
    return d - basis @ (herm(basis) @ d)


@functools.partial(jax.jit, static_argnames=("l", "power_iters",
                                             "refine_rounds", "terms",
                                             "total", "ns_mode",
                                             "residual_terms",
                                             "final_passes", "svd_lift",
                                             "cut_merge"))
def _fused_capture(a: DF, key, l: int, power_iters: int, refine_rounds: int,
                   terms: int, total: int, ns_mode: str = "fast",
                   residual_terms: int = 7, final_passes: int = 3,
                   svd_lift: bool = False, cut_merge: bool = False):
    """The whole high-accuracy capture as ONE XLA program.

    f32 HMT rounds, the Ozaki DF residual, the deflate/svqb merge, the
    Newton-Schulz DF orthonormalization (ops.ns_polar — the on-device
    replacement for the host-LAPACK Cholesky of ``df_cholesky_qr2``),
    and the DF projection ``B = Q^T A``, traced into a single jit.
    Returns ``(q, b)``; the caller does the tiny host SVD of ``b``.

    Motivation: the stage-by-stage route dispatches ~30 programs plus
    host LAPACK round-trips per block; through the TPU tunnel each
    dispatch costs 25 ms-1.5 s of flush latency (CLAUDE.md), which
    dominated the official tol-1e-8 bench (13-50 s wall for ~100 ms of
    device compute). Complex inputs run the planar stages throughout
    (4x-real Ozaki products; ns_polar's complex passes).
    """
    from .ops.ns_polar import df_orthonormalize_ns

    iscx = jnp.iscomplexobj(a.hi)
    keys = jax.random.split(key, 1 + refine_rounds)
    u1, w1 = _f32_round(a.hi, keys[0], l, power_iters,
                        final_passes=final_passes, svd_lift=svd_lift)
    basis = u1
    r = a
    u_i, w_i = u1, w1
    for i in range(refine_rounds):
        room = total - basis.shape[1]
        if room <= 0:
            break
        # residual_terms=7: exact residual to the ~2^-35 floor
        # (_residual doc) — three decades under the 1e-8 target at 28
        # pair-GEMMs (8 is the pre-round-3 margin setting).
        r = (_cresidual if iscx else _residual)(r, u_i, w_i,
                                                terms=residual_terms)
        u_i, w_i = _f32_round(r.hi, keys[1 + i], l, power_iters,
                              final_passes=final_passes, svd_lift=svd_lift)
        # The new block overlaps span(basis) (see refined_rsvd); after
        # the double deflation + svqb the merged basis's Gram condition
        # sits around 1e2-1e4 — inside df_orthonormalize_ns's domain.
        # Cut-merge (round 4): when the block's content rank is below
        # the round width (clamped-width stream chunks, padded frames,
        # over-ranked rounds), the deflated block is rank-deficient and
        # plain svqb promotes its noise directions to unit fillers with
        # ~1e-5 overlap under TPU bf16 GEMMs — measured 4.2e-8-class
        # stream residuals (vs 9e-9 for full-rank chunks). The
        # magnitude cut + _svqb_cut zero those directions instead;
        # exact zeros stay zero through the NS orthonormalization
        # (block-diagonal invariance) and contribute nothing to the
        # projection. A genuine direction cut at the 1e-4 line costs
        # <= 1e-4 * ||R|| ~ 1e-10 * sigma_1 — below the 1e-8 target.
        # (The host route's exact-f64 independence certification is
        # data-dependent control flow and stays host-side.) The plain
        # merge keeps the single fused path's measured 8.7e-9 margin;
        # the cut merge is bit-for-bit irrelevant there (full-rank
        # merges: same TPU resids with cuts on/off) but mandatory for
        # the clamped-width stream chunks, which enable it.
        if cut_merge:
            d = _deflate_twice(basis, u_i)
            cn = jnp.linalg.norm(d, axis=0)
            d = d * ((cn > MERGE_CUT_ABS)
                     & (cn > 1e-5 * jnp.max(cn)))[None, :].astype(d.dtype)
            dq = _svqb_cut(d)[:, :room]
        else:
            dq = _orthonormalize_f32(_deflate_twice(basis, u_i))[:, :room]
        basis = jnp.concatenate([basis, dq], axis=1)
    # mode="fast": the merged basis comes out of svqb-deflated f32
    # rounds with Gram cond <= ~1e2 — one unshifted NS pass + metric
    # corrections reach the DF floor; the robust 3-pass chain's extra
    # small-op latency (~40% of the capture) buys nothing here. The
    # scheduler's per-block f64 verification + host-route fallback
    # covers any pathological merge this misjudges.
    q = df_orthonormalize_ns(DF(basis, jnp.zeros_like(basis)), terms=terms,
                             mode=ns_mode)
    if iscx:
        b = _cproject(q, _csplit(a, _nsl(terms), 0), terms)
    else:
        a_col = ozaki_split(a, _nsl(terms), contract_axis=0)
        b = _project(q, a_col[0], a_col[1], terms)
    return q, b


def fused_capture_flops(m: int, n: int, l: int, power_iters: int = 1,
                        refine_rounds: int = 1,
                        terms: int = DEFAULT_TERMS_PRODUCT) -> int:
    """MXU bf16-pass FLOPs of one fused capture (MFU accounting).

    Counts every matmul at its bf16-pass cost: f32 GEMMs under the
    ``highest`` policy lower to 6 MXU passes (utils/mfu derate table),
    Ozaki pair-GEMMs are native bf16. Small O(L^3) ops (svqb eigh, NS
    corrections) are omitted — sub-1% of the total at capture shapes.
    Compare against the RAW bf16 peak (``mfu_pct(..., "default")``).
    """
    rounds = 1 + refine_rounds
    total = min(l * rounds, m, n)
    pairs = terms * (terms + 1) // 2
    flops = 0
    # f32 rounds: (2q+1) sketch GEMMs + 1 projection GEMM, each 2mnl
    # at 6 bf16 passes, plus deflation GEMMs on later rounds (small).
    flops += rounds * (2 * power_iters + 2) * 2 * m * n * l * 6
    # Ozaki residual at slice budget max(terms, 7): s(s+1)/2 pair-GEMMs.
    s = max(terms, 7)
    flops += refine_rounds * (s * (s + 1) // 2) * 2 * m * n * l
    # NS orthonormalization (fast mode: 2 passes), gram + apply per pass.
    flops += 2 * 2 * pairs * 2 * m * total * total
    # Final DF projection Q^H A.
    flops += pairs * 2 * total * m * n
    return flops


def refined_rsvd_fused(a, key, rank: int | None = None,
                       tol: float | None = None, oversample: int = 10,
                       power_iters: int = 1, refine_rounds: int = 1,
                       terms: int = DEFAULT_TERMS_PRODUCT,
                       round_rank: int | None = None,
                       ns_mode: str = "fast", residual_terms: int = 7,
                       final_passes: int = 3, svd_lift: bool = False,
                       verify: bool = False) -> RefinedSVD:
    """``refined_rsvd`` with the capture fused into one device program.

    Identical semantics and accuracy class for the common case
    (non-saturated shapes, well-separated merges); 2 dispatches total
    (capture; final ``U = Q Uhat``) instead of ~30 plus host LAPACK
    round-trips — the difference between tunnel-latency-bound and
    compute-bound. Complex inputs run fused planar stages. Falls back
    to ``refined_rsvd`` for the saturated-tall direct route and the
    tol-only growth capture (both need data-dependent host logic) and
    on tunneled-compile failures.

    ``verify=True`` (with ``tol``) self-checks the capture: the exact
    DF residual ``||A - Q B||/||A||`` is measured on device (~30% of
    one capture) and a miss of the 2.5x-tol line triggers the growth
    capture as repair — insurance against backend numerics drift and
    under-capacity ``round_rank`` (the round-3 TPU gate failures'
    shape). The accuracy knobs (``ns_mode``, ``residual_terms``,
    ``final_passes``, ``svd_lift``) default to the measured
    fastest-with->=5x-margin settings; see ``_f32_round``.
    """
    a = _as_df(a)
    iscx = jnp.iscomplexobj(a.hi)
    q, b64, history, captured = refined_capture(
        a, key, rank=rank, tol=tol, oversample=oversample,
        power_iters=power_iters, refine_rounds=refine_rounds, terms=terms,
        round_rank=round_rank, fused=True, ns_mode=ns_mode,
        residual_terms=residual_terms, final_passes=final_passes,
        svd_lift=svd_lift, verify=verify)
    # In plain fixed-round mode `captured` is vacuous (always True);
    # mask it so the strict unreachable-tolerance error stands. With
    # verify= the flag is a measured statement (DF residual <= tol) and
    # passes through.
    return _finish_core(q, b64, iscx, terms, tol, rank, history,
                        captured=captured and (verify or (
                            round_rank is None and rank is None)))


@functools.partial(jax.jit, static_argnames=("l", "power_iters",
                                             "refine_rounds", "terms",
                                             "total", "cut_merge"))
def _fused_capture_vmapped(hi, lo, keys, l, power_iters, refine_rounds,
                           terms, total, cut_merge=True):
    """``_fused_capture`` vmapped over a (B, m, n) stack — ONE device
    program for a whole bucket chunk. Inside vmap every op sees 2-D
    abstract values, so the single-block code is reused verbatim."""
    def one(h, lo_, k):
        q, b = _fused_capture(DF(h, lo_), k, l=l, power_iters=power_iters,
                              refine_rounds=refine_rounds, terms=terms,
                              total=total, cut_merge=cut_merge)
        return q.hi, q.lo, b.hi, b.lo

    qh, ql, bh, bl = jax.vmap(one)(hi, lo, keys)
    return DF(qh, ql), DF(bh, bl)


@functools.partial(jax.jit, static_argnames=("l", "rounds", "power_iters",
                                             "terms"))
def _fused_growth_vmapped(hi, lo, keys, tol, l, rounds, power_iters, terms):
    """``_fused_growth`` vmapped over a (B, m, n) stack — BATCHED rank
    discovery at the 1e-8 class in ONE device program (the while_loop
    runs until every lane's residual crosses tol; per-lane dead rounds
    are masked zeros). VERDICT r3 next #4."""
    def one(h, lo_, k):
        q, b, hist, res, cnt = _fused_growth(DF(h, lo_), k, tol, l=l,
                                             rounds=rounds,
                                             power_iters=power_iters,
                                             terms=terms)
        return q.hi, q.lo, b.hi, b.lo, res, cnt

    qh, ql, bh, bl, res, cnt = jax.vmap(one)(hi, lo, keys)
    return DF(qh, ql), DF(bh, bl), res, cnt


def refined_fused_batch_begin(blocks, key, rank: int | None = None,
                              tol: float | None = None, oversample: int = 10,
                              power_iters: int = 1, refine_rounds: int = 1,
                              terms: int = DEFAULT_TERMS_PRODUCT,
                              round_rank: int | None = None,
                              mesh=None, axis: str = "blocks",
                              on_unreachable: str = "raise",
                              growth_block: int = 64) -> dict:
    """Enqueue the vmapped fused capture for a block stack (async).

    Returns an opaque handle for ``refined_fused_batch_finish``. The
    device starts the capture immediately (JAX dispatch is async); the
    host-side tail (batched f64 SVD + truncation + final apply) runs in
    ``finish`` — stream drivers overlap the NEXT chunk's ``begin`` with
    the current chunk's ``finish`` (parallel.scheduler's windowed
    pipeline).

    With ``tol`` alone (no ``rank``/``round_rank``), real non-tall
    stacks run the BATCHED GROWTH capture (``_fused_growth`` vmapped):
    per-block rank discovery at the target tolerance in one device
    program — the volume-capable version of the reference's adaptive
    sampler (random_sampling.rs:202-282). ``growth_block`` sets the
    per-round width.
    """
    if on_unreachable not in ("raise", "mark"):
        raise ValueError("on_unreachable must be 'raise' or 'mark'")
    blocks = np.asarray(blocks)
    nb, m, n = blocks.shape
    if rank is None and round_rank is None:
        if tol is None:
            raise ValueError("need rank=, round_rank=, or tol= (tol "
                             "alone runs the batched growth capture)")
        keys = jax.random.split(key, max(nb, 1))
        common = dict(rank=None, tol=tol, oversample=oversample,
                      power_iters=power_iters, refine_rounds=refine_rounds,
                      terms=terms, round_rank=None,
                      on_unreachable=on_unreachable)
        if np.iscomplexobj(blocks):
            # complex blocks: per-block fused realified growth
            # (growth_capture_fused — one dispatch per block)
            return {"mode": "per_block", "blocks": blocks, "keys": keys,
                    **common}
        # TALL stacks run the transposed vmapped program (round 5, see
        # _growth_fused_tall): grow the row-space basis where
        # saturation is benign, recompose per block on host in finish.
        return _begin_growth_stack(blocks, keys, tol, growth_block,
                                   power_iters, terms, mesh, axis, common)
    k = int(round_rank if round_rank is not None else rank)
    l = min(k + int(oversample), m, n)
    keys = jax.random.split(key, max(nb, 1))
    common = dict(rank=rank, tol=tol, oversample=oversample,
                  power_iters=power_iters, refine_rounds=refine_rounds,
                  terms=terms, round_rank=round_rank,
                  on_unreachable=on_unreachable)
    # Complex stacks run the fused planar capture (each block's re/im
    # planes through 4x-real Ozaki products — the same _fused_capture
    # body); only the saturated-tall shape needs the per-block host
    # route (data-dependent independence logic).
    if m > n and l * (1 + refine_rounds) >= n:
        if not np.iscomplexobj(blocks):
            # Saturated-tall (the stream's shape for every tall
            # bucket): ONE transposed vmapped FIXED-ROUND capture
            # (round 5) instead of per-block host pipelines (10-40 s
            # PER BLOCK through the tunnel, ~half the round-4 volume).
            # The row-space capture is the regime where saturation is
            # benign (see _growth_fused_tall); bounded rounds avoid
            # the growth loop's noise-round merges on flat tails
            # (measured 5e-6-class on TPU). finish recomposes on host.
            lt = min(l, n)
            total_t = min(lt * (1 + refine_rounds), m, n)
            at = df(blocks.transpose(0, 2, 1))
            hi_t, lo_t, shard_t = at.hi, at.lo, None
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                if nb % mesh.shape[axis]:
                    raise ValueError(
                        f"block count {nb} not divisible by mesh axis "
                        f"{axis!r} ({mesh.shape[axis]}); pad the stack")
                shard_t = NamedSharding(mesh, PartitionSpec(axis))
                hi_t = jax.device_put(hi_t, shard_t)
                lo_t = jax.device_put(lo_t, shard_t)
                keys = jax.device_put(keys, shard_t)
            try:
                q, b = _fused_capture_vmapped(
                    hi_t, lo_t, keys, l=lt, power_iters=power_iters,
                    refine_rounds=refine_rounds, terms=terms,
                    total=total_t)
            except jax.errors.JaxRuntimeError as ex:
                import warnings

                warnings.warn(f"transposed fused capture failed ({ex}); "
                              "falling back to per-block pipelines",
                              RuntimeWarning)
                return {"mode": "per_block", "blocks": blocks,
                        "keys": keys, **common}
            return {"mode": "fused_tall", "q": q, "b": b, "nb": nb,
                    "shard": shard_t, "blocks": blocks, "keys": keys,
                    **common}
        return {"mode": "per_block", "blocks": blocks, "keys": keys,
                **common}
    total = min(l * (1 + refine_rounds), m, n)
    a = df(blocks)
    hi, lo = a.hi, a.lo
    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_shards = mesh.shape[axis]
        if nb % n_shards:
            raise ValueError(
                f"block count {nb} not divisible by mesh axis {axis!r} "
                f"({n_shards}); pad the stack (see parallel.scheduler)")
        shard = NamedSharding(mesh, PartitionSpec(axis))
        hi = jax.device_put(hi, shard)
        lo = jax.device_put(lo, shard)
        keys = jax.device_put(keys, shard)
    try:
        q, b = _fused_capture_vmapped(hi, lo, keys, l=l,
                                      power_iters=power_iters,
                                      refine_rounds=refine_rounds,
                                      terms=terms, total=total)
    except jax.errors.JaxRuntimeError as ex:
        import warnings

        warnings.warn(f"vmapped fused capture failed ({ex}); falling "
                      "back to per-block pipelines", RuntimeWarning)
        return {"mode": "per_block", "blocks": blocks, "keys": keys,
                **common}
    return {"mode": "fused", "q": q, "b": b, "nb": nb, "shard": shard,
            "blocks": blocks, "keys": keys, **common}


def _begin_growth_stack(blocks: np.ndarray, keys, tol, growth_block,
                        power_iters, terms, mesh, axis, common) -> dict:
    """Enqueue the vmapped growth capture for a real (nb, m, n) stack.

    Tall stacks transpose and run the row-space program (see
    ``_growth_fused_tall``); ``finish`` recomposes per block on host.
    """
    nb, m, n = blocks.shape
    tall = m > n
    cap = min(m, n)
    # >= 2 rounds and l*rounds <= cap: see growth_capture_fused
    l = max(min(int(growth_block), cap // 2), 1)
    rounds = max(cap // l, 2)
    l = cap // rounds
    a = df(blocks.transpose(0, 2, 1) if tall else blocks)
    hi, lo, shard = a.hi, a.lo, None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if nb % mesh.shape[axis]:
            raise ValueError(
                f"block count {nb} not divisible by mesh axis "
                f"{axis!r} ({mesh.shape[axis]}); pad the stack")
        shard = NamedSharding(mesh, PartitionSpec(axis))
        hi, lo = jax.device_put(hi, shard), jax.device_put(lo, shard)
        keys = jax.device_put(keys, shard)
    try:
        q, b, res, cnt = _fused_growth_vmapped(
            hi, lo, keys, jnp.float32(tol), l=l, rounds=rounds,
            power_iters=power_iters, terms=terms)
    except jax.errors.JaxRuntimeError as ex:
        import warnings

        warnings.warn(f"vmapped growth capture failed ({ex}); "
                      "falling back to per-block pipelines",
                      RuntimeWarning)
        return {"mode": "per_block", "blocks": blocks, "keys": keys,
                **common}
    return {"mode": "growth_tall" if tall else "growth", "q": q,
            "b": b, "res": res, "cnt": cnt, "nb": nb,
            "shard": shard, "blocks": blocks, "keys": keys, **common}


def refined_fused_batch_finish(h: dict) -> list[RefinedSVD]:
    """Synchronize + finish a ``refined_fused_batch_begin`` handle."""
    tol, rank, terms = h["tol"], h["rank"], h["terms"]
    mark = h["on_unreachable"] == "mark"

    def per_block():
        outs = []
        for bl, k_ in zip(h["blocks"], h["keys"]):
            try:
                outs.append(refined_rsvd(
                    bl, k_, rank=rank, tol=tol, oversample=h["oversample"],
                    power_iters=h["power_iters"],
                    refine_rounds=h["refine_rounds"], terms=terms,
                    round_rank=h["round_rank"]))
            except CompressionError:
                if not mark:
                    raise
                full = refined_rsvd(
                    bl, k_, rank=rank, oversample=h["oversample"],
                    power_iters=h["power_iters"],
                    refine_rounds=h["refine_rounds"], terms=terms,
                    round_rank=h["round_rank"])
                outs.append(full._replace(tol_ok=False))
        return outs

    if h["mode"] == "per_block":
        return per_block()

    import logging
    import time as _time

    _flog = logging.getLogger("rusty_compression_tpu.scheduler.chunks")
    _t0 = _time.perf_counter()
    try:
        b64 = df_to_f64(h["b"])  # synchronizes; async errors surface here
    except jax.errors.JaxRuntimeError as ex:
        import warnings

        warnings.warn(f"vmapped fused capture failed at fetch ({ex}); "
                      "falling back to per-block pipelines", RuntimeWarning)
        return per_block()
    _t_fetch = _time.perf_counter()
    # Non-finite lanes (observed on the TPU tunnel: a capture lane can
    # come back nan under degraded-backend numerics) would blow up the
    # BATCHED host SVD ("SVD did not converge" kills the whole chunk).
    # Sanitize the lane and re-run just those blocks per-block below.
    nb_ = b64.shape[0]
    bad = ~np.isfinite(b64.reshape(nb_, -1)).all(axis=1)
    if bad.any():
        import warnings

        warnings.warn(f"{int(bad.sum())}/{nb_} capture lanes non-finite; "
                      "re-running those blocks per-block", RuntimeWarning)
        b64 = b64.copy()
        b64[bad] = 0.0
        b64[bad, 0, 0] = 1.0
    q, nb = h["q"], h["nb"]
    # growth mode: per-block measured capture residuals authorize the
    # keep-all path (the crossing sits exactly at the capture rank)
    captured = None
    if h["mode"] in ("growth", "growth_tall"):
        captured = np.asarray(jax.device_get(h["res"])) <= 0.5 * float(tol)
    qy_host = None
    if h["mode"] in ("growth_tall", "fused_tall"):
        # Batched recompose of the transposed capture (round 5, see
        # _growth_fused_tall): Y = (Q_r^T A^T)^T per block, host f64
        # QR of the live columns, B = R Q_r_live^T. The final factors
        # are assembled fully on host (no device apply needed).
        q_r64 = df_to_f64(q)                       # (nb, n, cap)
        qbad = ~np.isfinite(q_r64.reshape(nb_, -1)).all(axis=1)
        if qbad.any():
            bad |= qbad
            q_r64 = q_r64.copy()
            q_r64[qbad] = 0.0
            b64[qbad] = 0.0
            b64[qbad, 0, 0] = 1.0
        cap = b64.shape[1]
        if h["mode"] == "growth_tall":
            cnt = np.asarray(jax.device_get(h["cnt"]))
            live = int(max(min(int(cnt.max()), cap), 1))
        else:  # fixed-round: every capture column is live
            live = cap
        y = b64.transpose(0, 2, 1)[:, :, :live]    # (nb, m, live) = A Q_r
        q_r64 = q_r64[:, :, :live]
        # The device basis Q_r need not be exactly orthonormal (the
        # fast NS merge can leave a saturated basis at ortho ~1e-1 on
        # some backends); re-orthonormalize it EXACTLY without a
        # second read of A: with Q_r = U S V^H (host f64 SVD), and
        # directions below the conditioning cut dropped,
        #   A U = (A Q_r) V S^{-1} = Y V S^{-1}
        # so the recompose projects onto the orthonormal U instead:
        #   A ~= Q_y (R U^T),  Q_y R = qr(Y V S^{-1}).
        ur, sr, vtr = np.linalg.svd(q_r64, full_matrices=False)
        smax = np.maximum(sr[:, :1], 1e-30)
        keepm = (sr > 1e-6 * smax)
        sinv = np.where(keepm, 1.0 / np.where(sr > 0, sr, 1.0), 0.0)
        w = vtr.transpose(0, 2, 1) * sinv[:, None, :]
        qy_host, ry = np.linalg.qr(y @ w)
        b64 = ry @ ur.transpose(0, 2, 1)
    _t_recompose = _time.perf_counter()
    try:
        uh, s, vt = np.linalg.svd(b64, full_matrices=False)  # batched f64
    except np.linalg.LinAlgError:
        import warnings

        warnings.warn("batched core SVD did not converge; falling back "
                      "to per-block pipelines", RuntimeWarning)
        return per_block()
    _t_svd = _time.perf_counter()
    kfs, oks = [], []
    for i in range(nb):
        kf, ok = s.shape[1], True
        if tol is not None:
            below = np.nonzero(s[i] / s[i, 0] < tol)[0]
            if below.size == 0:
                if captured is not None and captured[i]:
                    pass  # measured residual <= tol/2: full core kept
                elif not mark:
                    raise CompressionError(
                        f"Could not compress block {i} to relative "
                        f"tolerance {tol!r}")
                else:
                    ok = False  # containment: full-rank factors, marked
            else:
                kf = int(below[0])
        if rank is not None:
            kf = min(kf, int(rank))
        kfs.append(kf)
        oks.append(ok)
    # One vmapped apply at the padded max rank; per-block slice on host.
    # The pad width is quantized UP to a power of two: kmax is
    # data-dependent (max truncation rank of the chunk), and every
    # distinct width is a fresh compile of the apply program — through
    # the TPU tunnel that is 0.5-2.5 min per width, which dominated the
    # round-4 volume stream. Power-of-two keys bound the compile count
    # at log2(L) per (nb, m) bucket.
    kmax = max(kfs) if kfs else 0
    kq = min(1 << max(kmax - 1, 0).bit_length(), uh.shape[1]) if kmax else 0
    kq = max(kq, 1)
    uh_pad = np.zeros((nb, uh.shape[1], kq), dtype=uh.dtype)
    for i, kf in enumerate(kfs):
        uh_pad[i, :, :kf] = uh[i][:, :kf]
    if qy_host is not None:
        # tall recompose: U = Q_y Uhat entirely on host (Q_y is exact
        # f64-orthonormal; one batched GEMM), host-backed DF pair
        u64 = qy_host @ uh_pad                     # (nb, m, kq)
        u_hi = u64.astype(np.float32)
        u_lo = (u64 - u_hi).astype(np.float32)
    else:
        w_df = df_from_f64(uh_pad)
        if h["shard"] is not None:
            w_df = DF(jax.device_put(w_df.hi, h["shard"]),
                      jax.device_put(w_df.lo, h["shard"]))
        u = jax.vmap(lambda qh, ql, w_hi, w_lo: _apply_right(
            DF(qh, ql), DF(w_hi, w_lo), terms, DEFAULT_SLICES_DF))(
                q.hi, q.lo, w_df.hi, w_df.lo)
        # ONE batched fetch for the whole chunk: per-block device
        # slices + df_to_f64 each paid a full tunnel flush (25 ms-
        # 1.5 s) — at volume that was ~2 flushes PER BLOCK and the #1
        # stream wall. Host-backed DF slices keep to_f64()/factored-
        # apply semantics with zero further device traffic.
        u_hi, u_lo = jax.device_get((u.hi, u.lo))
    _flog.info(
        "finish mode=%s nb=%d core=%s fetch_b=%.2fs recompose=%.2fs "
        "svd=%.2fs apply+fetch_u=%.2fs", h["mode"], nb, b64.shape,
        _t_fetch - _t0, _t_recompose - _t_fetch, _t_svd - _t_recompose,
        _time.perf_counter() - _t_svd)

    def _norm_or_1(x):
        v = np.linalg.norm(x)
        return v if v > 0 else 1.0

    outs = [RefinedSVD(DF(u_hi[i, :, :kf], u_lo[i, :, :kf]),
                       s[i, :kf], vt[i, :kf, :], (), tol_ok=oks[i],
                       opt_resid=float(np.sqrt((s[i, kf:] ** 2).sum())
                                       / _norm_or_1(s[i])))
            for i, kf in enumerate(kfs)]
    bad_idx = np.nonzero(bad)[0]
    if len(bad_idx):
        # Re-run the garbage lanes in SMALL vmapped sub-batches (<= 8
        # lanes — the size class measured reliable throughout the
        # degradation window) rather than per-block host pipelines
        # (10-40 s/block through the tunnel). A lane still bad at
        # sub-batch size falls through to the per-block route inside
        # the recursive finish.
        sub = 8
        if nb > sub:
            for c0 in range(0, len(bad_idx), sub):
                ids = bad_idx[c0:c0 + sub]
                hs = refined_fused_batch_begin(
                    np.asarray(h["blocks"])[ids],
                    jax.random.fold_in(jax.random.key(0x5A11), int(ids[0])),
                    rank=rank, tol=tol, oversample=h["oversample"],
                    power_iters=h["power_iters"],
                    refine_rounds=h["refine_rounds"], terms=terms,
                    round_rank=h["round_rank"],
                    on_unreachable=h["on_unreachable"])
                for j, o in zip(ids, refined_fused_batch_finish(hs)):
                    outs[j] = o
        else:
            for i in bad_idx:
                try:
                    outs[i] = refined_rsvd(
                        h["blocks"][i], h["keys"][i], rank=rank, tol=tol,
                        oversample=h["oversample"],
                        power_iters=h["power_iters"],
                        refine_rounds=h["refine_rounds"], terms=terms,
                        round_rank=h["round_rank"])
                except CompressionError:
                    if not mark:
                        raise
                    outs[i] = refined_rsvd(
                        h["blocks"][i], h["keys"][i], rank=rank,
                        oversample=h["oversample"],
                        power_iters=h["power_iters"],
                        refine_rounds=h["refine_rounds"], terms=terms,
                        round_rank=h["round_rank"])._replace(tol_ok=False)
    return outs


def refined_rsvd_fused_batch(blocks, key, **kwargs) -> list[RefinedSVD]:
    """Fused tol-1e-8 pipeline over a same-shape block stack, vmapped.

    The per-block fused route still costs 2 tunnel dispatches per
    block; at north-star volume (10k blocks) that is ~8 min of pure
    flush latency. This driver runs the whole (B, m, n) stack as ONE
    capture program + ONE final-apply program (the host does a batched
    f64 SVD of the (B, L, n) cores in between) — dispatch count is
    O(1) per bucket chunk instead of O(B).

    Same semantics as ``refined_rsvd_fused`` per block. A block whose
    spectrum never crosses ``tol`` raises ``CompressionError`` by
    default; with ``on_unreachable="mark"`` it is contained instead —
    the block's factors are the full-rank capture and its result
    carries ``tol_ok=False`` (stream drivers must not die to one bad
    block; SURVEY §5 elastic recovery). Saturated-tall stacks route per
    block through the host pipeline; complex stacks run the fused
    planar capture.

    With ``mesh`` given, the stack and per-block keys are sharded over
    ``axis`` and the single capture program runs SPMD across the
    mesh's devices — data-parallel tol-1e-8 compression with zero
    collectives (per-block work is independent; the SPMD partitioner
    splits the batch dimension). The block count must be divisible by
    the mesh axis (the scheduler pads chunks to a mesh-granule
    multiple).

    ``refined_fused_batch_begin``/``finish`` expose the async split
    (device capture vs host tail) for windowed stream overlap.
    """
    return refined_fused_batch_finish(
        refined_fused_batch_begin(blocks, key, **kwargs))


def refined_rsvd_planar(a, key, rank: int | None = None,
                        tol: float | None = None, oversample: int = 10,
                        power_iters: int = 1, refine_rounds: int = 1,
                        terms: int = DEFAULT_TERMS_PRODUCT,
                        round_rank: int | None = None) -> RefinedSVD:
    """Complex (c128-class) refined rSVD with NO complex dtype on device.

    Some TPU backends reject every complex-dtype op (this repo's axon
    tunnel returns UNIMPLEMENTED even for a c64 add), so the planar
    Ozaki stages — which store complex DF pairs as c64 arrays — cannot
    run there. This route keeps the device ALL-REAL:

    1. **Realified capture.** The real pipeline runs unchanged on
       ``Ar = [[Re A, -Im A], [Im A, Re A]]`` (2m, 2n). With
       ``rho(u) = (Re u; Im u)``, ``Ar rho(v) = rho(A v)``, so
       ``range(Ar) = rho(range_C(A))`` (a complex r-space realifies to
       a real 2r-space) and ``sigma(Ar)`` duplicates ``sigma(A)`` —
       relative residuals transfer one-to-one. Cost: 4x the real mn
       work, exactly the 4-GEMM price of planar complex arithmetic.
    2. **Complex basis recovery (host).** Every captured basis column
       is (approximately) ``rho(u_j)`` for a range vector ``u_j``, so
       ``q[:m] + i q[m:]`` IS that complex vector; a host c128 QR of
       the (m, L) stack gives the complex-orthonormal ``Qc`` (L is
       small — O(m L^2) host flops).
    3. **Planar projection (device, real).** ``B = Qc^H A`` from four
       real Ozaki DF products: ``Re B = Qr^T Ar + Qi^T Ai``,
       ``Im B = Qr^T Ai - Qi^T Ar``; assembled in host c128.
    4. Host c128 SVD of B + reference tolerance semantics; the final
       ``U = Qc Uhat`` stays host-resident (its DF pair holds numpy
       planes — materializing c64 on the rejecting backend would
       throw).

    The reference gets this class from LAPACK's z-kernels
    (qr.rs:408-416); backends that DO accept complex dtypes should
    prefer ``refined_rsvd_fused`` (planar products, complex storage).
    """
    a = np.ascontiguousarray(np.asarray(a), dtype=np.complex128)
    m, n = a.shape

    if rank is None and round_rank is None:
        if tol is None:
            raise ValueError("need rank=, round_rank=, or tol=")
        # round 5: the realified growth runs as ONE device program
        # (transposed when tall) instead of the O(rounds)-dispatch host
        # loop — VERDICT r4 next #3
        qc, b, history, captured = _growth_fused_realified(
            a, key, tol, power_iters=power_iters, terms=terms)
    else:
        ar = np.block([[a.real, -a.imag], [a.imag, a.real]])
        adf = df(ar)
        k = int(round_rank if round_rank is not None else rank)
        # the realified rank doubles: capture 2k(+margin) real columns.
        # Fused fixed-round capture (round 5): round_rank chosen so the
        # capture width l = rr2 + oversample equals 2(k + oversample);
        # refined_capture falls back to the host stages on tunneled-
        # compile failures by itself.
        rr2 = max(2 * (k + int(oversample)) - int(oversample), 1)
        q, _b64r, history, _cap = refined_capture(
            adf, key, tol=None, round_rank=rr2, oversample=oversample,
            power_iters=power_iters, refine_rounds=refine_rounds,
            terms=terms, fused=True)
        captured = False
        q64 = df_to_f64(q)                   # (2m, L) real
        uc = q64[:m] + 1j * q64[m:]          # complex range vectors
        qc, _ = np.linalg.qr(uc)             # host c128 orthonormal basis
        # Planar device projection B = Qc^H A (real Ozaki products).
        b = _planar_project_c128(qc, a, terms)

    uh, s, vt = np.linalg.svd(b, full_matrices=False)
    kf = s.shape[0]
    if tol is not None:
        below = np.nonzero(s / s[0] < tol)[0]
        if below.size == 0:
            if not captured:
                raise CompressionError(
                    f"Could not compress to relative tolerance {tol!r}")
        else:
            kf = int(below[0])
    if rank is not None:
        kf = min(kf, int(rank))
    u = qc @ uh[:, :kf]                      # host c128 (small product)
    u_df = df_from_c128_host(u)
    opt = float(np.sqrt((s[kf:] ** 2).sum()) / np.linalg.norm(s))
    return RefinedSVD(u_df, s[:kf], vt[:kf, :], tuple(history),
                      opt_resid=opt)


def df_from_c128_host(x: np.ndarray) -> DF:
    """Host-resident complex DF pair (numpy leaves — never touches the
    device, for backends that reject complex dtypes)."""
    x = np.asarray(x, np.complex128)
    hi = x.astype(np.complex64)
    lo = (x - hi.astype(np.complex128)).astype(np.complex64)
    return DF(hi, lo)


def refined_rsvd_batch(blocks, key, **kwargs) -> list[RefinedSVD]:
    """Refined rSVD over a sequence of same-shape blocks.

    The pipeline is orchestrated host-side stage by stage, so batching
    here means *compilation amortization*, not vmap: every jitted stage
    (f32 rounds, Ozaki splits/products, DF CholeskyQR) is cached by
    shape, so blocks 2..B pay zero compile time and the host round
    trips stay O(L^2) scalars plus the (L, n) core per block. Blocks of
    different shapes work too — each new shape compiles once.

    Returns one ``RefinedSVD`` per block, in submission order, with
    independent per-block sketches derived from ``key``.
    """
    blocks = list(blocks)
    keys = jax.random.split(key, max(len(blocks), 1))
    return [refined_rsvd(b, k, **kwargs) for b, k in zip(blocks, keys)]
