"""Double-float orthonormalization without host round-trips.

``highacc.df_cholesky_qr2`` reaches ~2^-35 orthogonality by computing
the small (L, L) Gram factorization in f64 **on the host** — a design
that costs one device<->host round-trip per pass (6-12 per merge).
Through the TPU tunnel each dispatch carries a flush latency that
ranges from ~25 ms (healthy) to >1 s (degraded windows, CLAUDE.md), so
the host-orchestrated merge dominates the tol-1e-8 pipeline's wall
time even though its FLOPs are negligible.

This module provides the fully-on-device equivalent: the inverse
square root of the DF Gram matrix via the **coupled Newton-Schulz
iteration** (Denman-Beavers form, numerically stable; Higham,
*Functions of Matrices*, ch. 6), which is pure GEMMs — exactly what
the MXU wants — and therefore compiles into a single XLA program with
everything around it:

1. Gram ``G = Y^H Y`` in Ozaki double-float (exact bf16 slice GEMMs).
2. Scale by an exact power of two so ``||G'|| <= 1``; add a relative
   shift ``sigma`` bounding the condition number the f32 stage must
   resolve (the shifted-CholeskyQR trick of Fukaya et al., applied
   spectrally — the shift only biases singular values, never the span:
   ``span(Y f(G)) = span(Y)`` for any full-rank spectral ``f``).
3. Coupled f32 Newton-Schulz (MXU, ``precision='highest'``) to
   ~1e-3 relative error, then 1-2 Newton *corrections* in Ozaki DF
   arithmetic — each squares the error, landing at the ~2^-35 DF
   product floor.
4. Three composed passes with decreasing shifts (1e-4, 1e-7, 0) mirror
   shifted-CholeskyQR3. The Gram is recomputed from the current Q at
   every pass (one tall Gram + one tall apply per pass), so each pass
   corrects the TRUE metric including the previous pass's apply
   rounding — a chained-approximation update was measured 6e-9 off.

Replaces LAPACK ``dpotrf``/``dtrtri`` + ``?orgqr`` for the
high-accuracy merge (reference: rusty-compression src/pivoted_qr.rs:
104-114 materializes Q via ``?orgqr``; src/qr.rs:408-416 instantiates
the f64 path). Complex DF pairs run the same passes through planar
4x-real products (``ozaki_matmul_complex``) and complex f32 seeds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.doublefloat import DF, df_add_f32, df_scale_pow2
from .ozaki import (ozaki_matmul, ozaki_matmul_complex, ozaki_matmul_split,
                    ozaki_split)

__all__ = ["df_orthonormalize_ns"]

#: (relative shift, f32 NS iterations) per pass. Shifts mirror shifted
#: CholeskyQR3: pass 1 bounds the f32 stage's condition number at ~1e4
#: for ANY input; pass 2 absorbs the 1e-4 orthogonality bias pass 1
#: left; pass 3 (shift 0, near-orthonormal input) polishes to the DF
#: floor. Iteration counts cover kappa = 1/shift plus quadratic
#: convergence margin (eigenvalue product grows ~2.25x/iter).
_PASSES = ((1e-4, 26), (1e-7, 28), (0.0, 16))
#: Fast mode: two unshifted passes. Valid when the input is already
#: well-conditioned at f32 level (Gram cond <= ~1e4 — e.g. the fused
#: pipeline's svqb-deflated merges): the f32 NS seeds converge without
#: a shift and the second fresh-Gram pass absorbs the first pass's
#: apply rounding (a single pass floored the fused residual at ~1e-8;
#: two restore the robust chain's ~2e-9 class at ~60% of its small-op
#: latency). Callers with unbounded inputs must use mode="robust".
_PASSES_FAST = ((0.0, 20), (0.0, 8))


def _gemm_f32(a, b):
    return jnp.matmul(a, b, precision="highest")


def _ns_inv_sqrt_f32(a_hi, iters: int):
    """Coupled Newton-Schulz ``Z ~= A^{-1/2}`` in f32 for SPD ``A`` with
    ``||A||_2 <= 1`` (guaranteed by the caller's power-of-two scaling).

    Invariant ``Y_k = A Z_k``; both sequences use only GEMMs. Stable in
    the coupled form (the uncoupled Newton sqrt iteration is not).
    """
    l = a_hi.shape[0]
    eye = jnp.eye(l, dtype=a_hi.dtype)

    def body(_, yz):
        y, z = yz
        m = 1.5 * eye - 0.5 * _gemm_f32(z, y)
        return _gemm_f32(y, m), _gemm_f32(m, z)

    _, z = jax.lax.fori_loop(0, iters, body, (a_hi, eye))
    return z


def _df_metric_corrections(a: DF, z: DF, terms: int, corrections: int):
    """Metric-based refinement of ``Z`` toward ``Z^T A Z = I``.

    A Newton-Schulz *function* correction (``Z <- Z(3I - ZAZ)/2``,
    coupled or not) amplifies the non-commuting error component by
    ``sqrt(kappa)/2`` per step (Frechet derivative at the fixed point
    maps ``F -> (F - A^{1/2} F A^{-1/2})/2``) — measured here as DF
    corrections *worse* than their f32 seed at kappa 1e4. But the
    orthonormalization only needs the **metric** ``Z^T A Z = I``, not
    the spectral function: with ``E = Z^T A Z - I`` (symmetric,
    computed cancellation-free in DF), the right-side update
    ``Z <- Z (I - E/2)`` gives ``E' = -(3/4) E^2 + O(E^3)`` with no
    condition-number factor — the CholeskyQR2 contraction with the
    Cholesky replaced by a first-order inverse square root. Globally
    safe: ``E >= -I`` always (``Z^T A Z`` is PSD), so the multiplier
    stays in ``(I/2, 3I/2]`` and an unconverged f32 seed just keeps
    growing at the NS rate. Returns ``(z, e)`` — ``e`` is the last
    *pre-update* metric error, so ``Z^T A Z = I - (3/4) e^2 + ...``.
    """
    l = z.shape[0]
    iscx = jnp.iscomplexobj(z.hi)
    eye = jnp.eye(l, dtype=jnp.float32)
    e_mat = None
    for _ in range(corrections):
        if iscx:
            w = ozaki_matmul_complex(a, z, terms=terms)    # A Z
            zh = DF(z.hi.T, z.lo.T)
            zw = ozaki_matmul_complex(zh, w, terms=terms, conj_a=True)
        else:
            w = ozaki_matmul(a, z, terms=terms)            # A Z
            zw = ozaki_matmul(DF(z.hi.T, z.lo.T), w, terms=terms)
        # NOT symmetrized: the Ozaki gram's asymmetry is ~2^-35 (far
        # below anything the correction propagates), and a DF
        # symmetrization (two_sum against the transpose) deep inside
        # this graph sends XLA:CPU compile time from seconds to >10min.
        e_mat = df_add_f32(zw, -eye)
        c = df_add_f32(df_scale_pow2(e_mat, -0.5), eye)    # I - E/2
        z = (ozaki_matmul_complex(z, c, terms=terms) if iscx
             else ozaki_matmul(z, c, terms=terms))
    return z, e_mat


def _df_gram(y: DF, terms: int) -> DF:
    """``Y^H Y`` in Ozaki DF. Real path reuses the column-scaled slices
    transposed for the left operand (the per-column scale of Y is the
    per-row scale of Y^T); complex goes through 4 planar products."""
    if jnp.iscomplexobj(y.hi):
        yh = DF(y.hi.T, y.lo.T)
        return ozaki_matmul_complex(yh, y, terms=terms, conj_a=True)
    ys, ysc = ozaki_split(y, min(10, terms), contract_axis=0)
    yt = jnp.swapaxes(ys, -1, -2)
    return ozaki_matmul_split(yt, ysc.T, ys, ysc, terms=terms)


def _df_apply(y: DF, z: DF, terms: int) -> DF:
    """Tall ``Y @ Z`` in Ozaki DF."""
    if jnp.iscomplexobj(y.hi):
        return ozaki_matmul_complex(y, z, terms=terms)
    ys, ysc = ozaki_split(y, min(10, terms), contract_axis=1)
    zs, zsc = ozaki_split(z, min(10, terms), contract_axis=0)
    return ozaki_matmul_split(ys, ysc, zs, zsc, terms=terms)


def _inv_sqrt_pass(g: DF, shift: float, iters: int, terms: int,
                   corrections: int) -> DF:
    """One shifted inverse-sqrt factor ``Z ~= (G' + shift I)^{-1/2}``
    (G' = G scaled by an exact even power of two so ``||G'|| <= 1``),
    f32 Newton-Schulz seed + DF metric corrections. The power-of-two
    un-scaling rides on Z exactly, so ``(Y Z)^T (Y Z) ~= I`` against
    the *unscaled* Gram."""
    l = g.shape[0]
    # Exact even-power-of-two scaling: an inexact scalar would bias
    # Q^T Q at 2^-24.
    rowsum = jnp.maximum(jnp.max(jnp.sum(jnp.abs(g.hi), axis=1)),
                         jnp.float32(1e-30))
    _, e = jnp.frexp(rowsum)
    e = e + (e & 1)  # round up to even
    gs = df_scale_pow2(g, jnp.ldexp(jnp.float32(1.0), -e))
    eye = jnp.eye(l, dtype=g.hi.dtype)
    a = df_add_f32(gs, jnp.float32(shift) * eye) if shift else gs
    z32 = _ns_inv_sqrt_f32(a.hi, iters)
    z, _ = _df_metric_corrections(a, DF(z32, jnp.zeros_like(z32)),
                                  terms, corrections)
    return df_scale_pow2(z, jnp.ldexp(jnp.float32(1.0), -(e >> 1)))


@functools.partial(jax.jit, static_argnames=("terms", "corrections", "mode"))
def df_orthonormalize_ns(y: DF, terms: int = 7, corrections: int = 2,
                         mode: str = "robust"):
    """Orthonormalize the columns of a tall DF matrix to ~1e-10, in one
    XLA program (no host round-trips, all GEMMs).

    Three composed passes of ``Q <- Q (Q^T Q + sigma I)^{-1/2}`` with
    decreasing shifts — the shifted-CholeskyQR3 structure with the
    Cholesky/solve replaced by the Newton-Schulz inverse square root.
    The Gram is recomputed *from the current Q* at every pass (as
    ``highacc.df_cholesky_qr2`` does), so each pass corrects the true
    metric including the previous pass's apply rounding; the final
    unshifted pass lands at the Ozaki product floor.

    Domain: Gram condition number up to ~1e8 (basis singular values
    spanning <= 4 decades — anything an f32-orthonormalized merge can
    produce). Span-preserving for any input (the shift biases singular
    values, never directions). Complex DF inputs run the same passes
    with planar 4x-real Ozaki products (ozaki_matmul_complex) and
    complex f32 NS seeds — the on-device analogue of the reference's
    z-kernel path (rusty-compression src/qr.rs:408-416).
    """
    q = y
    for shift, iters in (_PASSES if mode == "robust" else _PASSES_FAST):
        g = _df_gram(q, terms)
        z = _inv_sqrt_pass(g, shift, iters, terms, corrections)
        q = _df_apply(q, z, terms)
    return q
