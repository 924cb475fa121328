"""Tall-skinny orthonormalization kernels (MXU-resident).

Householder QR (``jnp.linalg.qr``) is the stability gold standard but is
sequential per panel — on TPU it runs at a small fraction of MXU peak.
For the sampling pipelines the iterates are tall-skinny (m >> l), where
Cholesky-QR variants compute the same factorization as two or three
GEMMs plus a tiny (l, l) Cholesky:

* ``cholqr2`` — CholeskyQR2 (Yamamoto et al. 2015): two plain
  CholeskyQR passes. Orthogonality to machine precision provided
  ``cond(Y)^2 * eps < 1`` (f32: cond below ~1e3).
* ``scholqr3`` — shifted CholeskyQR3 (Fukaya/Kannan/Nakatsukasa/
  Yamamoto/Yanagisawa 2020): a first pass on the shifted Gram matrix
  ``G + s I`` (the shift guarantees the Cholesky exists for any
  numerically full-rank Y), then CholeskyQR2. Robust to
  ``cond(Y) ~ 1/sqrt(eps)`` and beyond while staying all-GEMM.
* ``qr`` — Householder fallback (always stable; the right choice on
  CPU where LAPACK is fast).

``orthonormalize`` picks per backend: GEMM-rich ``scholqr3`` on TPU,
LAPACK Householder elsewhere.

These kernels replace the reference's LAPACK ``?orgqr``-materialized Q
(rusty-compression ``pivoted_qr.rs:104-114``) everywhere a *non-pivoted*
orthonormal basis is needed (power iteration re-orthogonalization,
adaptive-sampler block orthonormalization, HMT range finding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.dtypes import eps, herm, real_dtype
from ..utils.precision import with_precision

__all__ = ["nsqb", "cholesky_qr", "cholesky_qr2", "shifted_cholesky_qr3",
           "svqb", "orthonormalize"]


def _solve_rt(y, r):
    """``Y @ R^{-1}`` via a right-hand-side triangular solve (precise on
    TPU: ops.triangular routes around XLA's bf16 trsm expansion)."""
    from .triangular import triangular_solve

    return triangular_solve(r, y, left_side=False, lower=False)


def _shift_magnitude(g, m: int):
    """Fukaya et al.'s sCholQR shift ``11 (m l + l (l+1)) eps ||G||``
    (Frobenius upper-bounds the 2-norm; the shift only needs the right
    order of magnitude). Guarantees ``G + s I`` is numerically PD for
    any numerically full-rank ``Y`` with ``m`` rows."""
    l = g.shape[-1]
    gnorm = jnp.linalg.norm(g, ord="fro", axis=(-2, -1))
    return (11.0 * (m * l + l * (l + 1)) * eps(g.dtype)) * gnorm


def _chol_kernel(g):
    """Lower Cholesky, precision-safe: XLA's TPU ``hlo.cholesky``
    expansion escapes the matmul-precision policy (raw-bf16 internal
    matmuls), so TPU routes through the pure-JAX blocked factorization
    (ops.cholesky); CPU keeps LAPACK ``potrf``."""
    if jax.default_backend() == "tpu":
        from .cholesky import cholesky as chol_precise

        return chol_precise(g)
    return jnp.linalg.cholesky(g)


def _chol(g, m: int, always_shift: bool = False):
    """Cholesky of the (tiny, l x l) Gram matrix, guarded against
    breakdown: if the plain factorization produces non-finite entries
    (G indefinite under roundoff — e.g. exactly rank-deficient Y), fall
    back to the shifted factorization, which always exists. Both
    factorizations are l x l — negligible next to the Gram GEMM."""
    s = _shift_magnitude(g, m)
    shift = (s + jnp.where(s > 0, 0.0, 1.0)).astype(g.dtype) * jnp.eye(
        g.shape[-1], dtype=g.dtype)
    shifted = _chol_kernel(g + shift)
    if always_shift:
        return shifted
    plain = _chol_kernel(g)
    ok = jnp.all(jnp.isfinite(plain))
    return jnp.where(ok, plain, shifted)


@with_precision
def cholesky_qr(y, always_shift: bool = False):
    """One CholeskyQR pass: ``G = Y^H Y``, ``R = chol(G)^H``,
    ``Q = Y R^{-1}``. Returns ``(q, r)``. Breakdown-guarded (see
    ``_chol``): always produces finite output."""
    g = herm(y) @ y
    l = _chol(g, y.shape[-2], always_shift)
    r = herm(l)
    return _solve_rt(y, r), r


@with_precision
def cholesky_qr2(y):
    """CholeskyQR2: a second pass restores orthogonality to machine
    precision when the first pass was merely well-defined."""
    q1, r1 = cholesky_qr(y)
    q2, r2 = cholesky_qr(q1)
    return q2, r2 @ r1


@with_precision
def shifted_cholesky_qr3(y):
    """Shifted CholeskyQR + CholeskyQR2 — the robust all-GEMM path.

    The first pass factorizes the shifted Gram matrix (always exists;
    the shift leaves ``Q1`` well-conditioned: ``cond(Q1)^2 <=
    1 + ||Y||^2/s``), and the two trailing passes restore orthogonality
    to machine precision. For exactly rank-deficient ``Y`` the null
    directions come out as arbitrary near-orthonormal columns (same
    contract as Householder QR's arbitrary completion).
    """
    q1, r1 = cholesky_qr(y, always_shift=True)
    q2, r2 = cholesky_qr2(q1)
    return q2, r2 @ r1


@with_precision
def nsqb(y, shift_rel: float = 1e-5, iters: int = 22):
    """All-GEMM approximate orthonormalization: ``Q = Y (G + sigma I)^{-1/2}``
    via the coupled Newton-Schulz inverse square root — NO eigh/Cholesky.

    The eigh inside ``svqb`` costs ~0.7 ms per call on this TPU backend
    regardless of size, which dominated the f32 range-finder rounds of
    the high-accuracy capture (~5 orthonormalizations per round, more
    than all their GEMMs together). This kernel replaces it with ~2
    (l, l) GEMMs per NS iteration — sub-0.1 ms wall at sketch sizes.

    Semantics: directions with Gram eigenvalue above ``shift_rel *
    lambda_max`` come out orthonormal to ~(shift_rel + NS residual);
    weaker directions degrade gracefully to bounded near-duplicates
    (the shifted-CholeskyQR-style bias — span is preserved exactly,
    ``f(G)`` is full-rank spectral). Column order is preserved, NOT
    sorted by significance — use ``svqb`` when descending order or a
    spectral clip is required (basis merges, final capture bases).
    Intended for MID-ITERATION re-orthonormalization, where the result
    only preconditions the next operator application.
    """
    from .ns_polar import _ns_inv_sqrt_f32

    g = herm(y) @ y
    l = g.shape[-1]
    # Exact even-power-of-two scaling so ||G'|| <= 1 (NS domain).
    rowsum = jnp.maximum(jnp.max(jnp.sum(jnp.abs(g), axis=-1)),
                         jnp.asarray(1e-30, real_dtype(y.dtype)))
    _, e = jnp.frexp(jnp.real(rowsum))
    e = e + (e & 1)
    scale = jnp.ldexp(jnp.asarray(1.0, real_dtype(y.dtype)), -e)
    gs = g * scale.astype(g.dtype)
    shift = jnp.asarray(shift_rel, real_dtype(y.dtype)).astype(g.dtype)
    a = gs + shift * jnp.eye(l, dtype=g.dtype)
    z = _ns_inv_sqrt_f32(a, iters)  # hermitian-PSD NS works for c64 too
    half = jnp.ldexp(jnp.asarray(1.0, real_dtype(y.dtype)), -(e >> 1))
    return y @ (z * half.astype(z.dtype))


def svqb(y, passes: int = 3):
    """SVQB orthonormalization (Stathopoulos & Wu 2002): robust at ANY
    condition number, all-GEMM plus one tiny (l, l) eigh per pass.

    ``G = Y^H Y`` is diagonally scaled, eigendecomposed, eigenvalues
    clipped at ``l * eps * lambda_max``, and ``Q = Y D V L^{-1/2}``.
    Directions below the clip (numerically dead — e.g. power-iterate
    columns whose singular weight sits below the dtype's noise floor,
    cond ~ 1e11 in f32) come out as bounded near-orthonormal fillers
    instead of poisoning the whole basis — the failure mode of
    CholeskyQR-family kernels beyond cond ~ 1/u (shifted CholeskyQR3
    included), observed as ortho-error ~1 on TPU power iterations over
    10-decade spectra. Each pass contracts the condition number by roughly the
    clipping ratio; three passes take cond 1e11 to machine-precision
    orthogonality in f32 (tests/test_orthogonalize.py). Dominant directions come out first (descending
    eigenvalue order), matching the QR-family column convention.
    """
    l = y.shape[-1]
    for _ in range(passes):
        g = herm(y) @ y
        dg = jnp.real(jnp.diagonal(g, axis1=-2, axis2=-1))
        d = jnp.where(dg > 0, jax.lax.rsqrt(jnp.maximum(dg, 1e-30)), 1.0)
        d = d.astype(y.dtype)
        gs = g * d[..., :, None] * d[..., None, :]
        lam, v = jnp.linalg.eigh(gs)
        clip = l * eps(y.dtype) * jnp.maximum(lam[..., -1:], 1e-30)
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(lam, clip)).astype(y.dtype)
        y = (y * d[..., None, :]) @ (v * inv_sqrt[..., None, :])
        y = y[..., ::-1]  # descending eigenvalue order
    return y


@with_precision
def orthonormalize(y, method: str = "auto", passes: int | None = None):
    """Orthonormal basis of the columns of tall-skinny ``y``.

    Returns ``q`` only (the common need in the sampling pipelines).
    ``method``: ``"auto"`` (svqb on TPU, Householder elsewhere),
    ``"qr"``, ``"cholqr2"``, ``"scholqr3"``, ``"svqb"``.

    Auto rationale (round 2): on TPU the all-GEMM choices are scholqr3
    and svqb. scholqr3 *silently returns garbage* beyond cond ~ 1/u —
    measured rel err 0.64 (vs svqb's 2.3e-3 and the spectrum tail 1e-7)
    for a q=2 rSVD over a 7-decade spectrum, because every power/sample
    iterate carries the operator's full singular spread. svqb clips its
    Gram eigenvalues, so ill-conditioned iterates degrade gracefully to
    the Gram-method floor (~sqrt(eps)*sigma_1 capture for >7-decade
    f32 spreads) instead of corrupting the basis; its extra cost is one
    small (l, l) eigh per pass. Spectra needing tighter capture than
    the sqrt(eps) floor belong on the compensated-precision pipeline
    (highacc), which uses svqb internally for exactly this reason.
    Off-TPU, Householder QR is exact to working precision and fast.

    ``passes`` (svqb only): mid-power-iteration re-orthonormalizations
    only need *stabilization* (bounding the iterate's condition so no
    direction underflows) — a single svqb pass does that at a third of
    the eigh cost; the final basis keeps the full 3-pass polish.
    """
    if method == "auto":
        method = "svqb" if jax.default_backend() == "tpu" else "qr"
    if method == "qr":
        q, _ = jnp.linalg.qr(y, mode="reduced")
        return q
    if method == "cholqr2":
        return cholesky_qr2(y)[0]
    if method == "scholqr3":
        return shifted_cholesky_qr3(y)[0]
    if method == "svqb":
        return svqb(y) if passes is None else svqb(y, passes=passes)
    if method == "nsqb":
        return nsqb(y)
    raise ValueError(f"unknown orthonormalization method {method!r}")
