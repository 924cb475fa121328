"""Ozaki-scheme high-precision GEMM on the TPU MXU.

The reference framework reaches tol<=1e-8 accuracy because every GEMM runs
in native f64 through BLAS (rusty-compression src/qr.rs:408-416 instantiates
all algorithms for f64/c128; ndarray ``.dot`` lowers to dgemm). TPUs have no
f64 MXU path, and XLA's f64 emulation is unusably slow at size (CLAUDE.md).

This module implements the error-free-splitting GEMM of Ozaki et al.
(Ozaki, Ogita, Oishi, Rump, "Error-free transformations of matrix
multiplication", Numer. Algorithms 59, 2012; applied to low-precision
matrix units by Ootomo et al., ozIMMU): each operand is split into slices
of ``w`` mantissa bits such that every slice-pair product accumulates in
f32 **without any rounding** on the MXU (bf16 inputs, f32 accumulator).
The only rounding happens when the per-magnitude-level partial sums are
combined — done in double-float (utils/doublefloat.py) on the VPU.

Exactness condition: slice values are multiples of ``2^-(p+1)w`` bounded
by ``2^-pw`` (w explicit bits, exact in bf16 for w <= 8); a pair product
is a multiple of its unit bounded by ``2^2w`` units; summing k of them
spans ``<= k * 2^2w <= 2^24`` f32-significand units for
``2w + log2(k) <= 24`` — i.e. w=5 supports k up to 16384 (the north-star
maximum block dimension, BASELINE.md config 4).

Accuracy: ``terms`` slices cover ``terms*w`` bits below the per-row /
per-column scale; terms=7 gives ~1e-10 relative, terms=10 reaches the
double-float storage floor (~2^-49). Cost: ``terms*(terms+1)/2`` bf16
GEMMs (28 at terms=7) — still far faster than any non-MXU path.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..utils.doublefloat import DF, df, fast_two_sum, two_sum

__all__ = ["ozaki_split", "ozaki_matmul", "ozaki_matmul_split",
           "ozaki_matmul_complex", "ozaki_flops",
           "DEFAULT_TERMS", "DEFAULT_W"]

DEFAULT_W = 5          # slice mantissa bits: 2*5 + log2(16384) = 24 <= 24
DEFAULT_TERMS = 7      # ~1e-10 relative accuracy

def _tail32_first_diag(terms: int, w: int) -> int:
    """First diagonal accumulated in plain f32 instead of a DF fold.

    A DF fold costs a full renormalization pass over the output per
    diagonal (5 array reads/writes — dominant HBM traffic for (m, n)
    outputs like the residual stage). An f32 running sum of the deep
    diagonals rounds each add at ``2^-24 * 2^(-d0 w)`` of the leading
    scale; keeping that at least ~2^-15 below the pair-truncation
    floor ``2^(-terms w)`` requires ``d0 >= terms - (24 - 9)/w`` —
    i.e. the last ~3 diagonals (w=5) ride the f32 tail, the leading
    ones keep exact DF folds. Validated against the 1e-13-of-row-scale
    gates in tests/test_doublefloat.py (terms=10 included).
    """
    return max(terms - 3, -(-20 // w))


def _exp2_int(e):
    """Exact 2^e for int32 e in [-126, 127], by exponent-bit construction.

    ``jnp.exp2`` is NOT exact on integer inputs on every backend (CPU XLA
    returned 2^21 + 1 for exp2(21.0)), which silently destroys the
    error-free-split guarantee — so the scale is built bitwise.
    """
    bits = ((e + 127) << 23).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _pow2_scale(x_hi, axis):
    """Per-fiber exact power-of-two scale ``2^ceil(log2 max|x|)``."""
    mu = jnp.max(jnp.abs(x_hi), axis=axis, keepdims=True)
    m, e = jnp.frexp(jnp.maximum(mu, jnp.float32(1e-38)))  # mu = m * 2^e
    e = jnp.where(m == 0.5, e - 1, e)  # mu an exact power of two: keep it
    e = jnp.clip(e, -126, 127).astype(jnp.int32)
    return _exp2_int(e), _exp2_int(-e)


def ozaki_split(x, num_slices: int, *, w: int = DEFAULT_W, contract_axis: int):
    """Split a DF (or f32) matrix into exact limited-mantissa bf16 slices.

    Args:
      x: DF or f32 array, 2-D.
      num_slices: slices to extract (5 covers plain f32; 10 covers DF).
      w: mantissa bits per slice.
      contract_axis: the axis that a subsequent matmul contracts over;
        scaling is constant along it so scales factor out of the sum.

    Returns:
      ``(slices, scale)`` — slices ``(num_slices, *x.shape)`` bf16 with
      ``x ~= scale * sum_p slices[p]`` (exact to num_slices*w bits below
      scale), scale a power-of-two array broadcastable against the
      matmul's output.
    """
    x = df(x)
    scale, inv_scale = _pow2_scale(x.hi, contract_axis)
    r_hi = x.hi * inv_scale  # exact (power of two)
    r_lo = x.lo * inv_scale
    chunks = []
    for p in range(num_slices):
        s = jnp.float32(2.0 ** ((p + 1) * w))
        c = jnp.trunc(r_hi * s) / s
        chunks.append(c.astype(jnp.bfloat16))  # exact: <= w explicit bits
        r_hi = r_hi - c  # exact (c = leading bits of r_hi)
        r_hi, r_lo = two_sum(r_hi, r_lo)
    return jnp.stack(chunks), scale


def _dot_f32(a_bf16, b_bf16):
    return jax.lax.dot_general(
        a_bf16, b_bf16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def ozaki_matmul_split(a_slices, a_scale, b_slices, b_scale,
                       *, terms: int = DEFAULT_TERMS,
                       w: int = DEFAULT_W) -> DF:
    """High-precision GEMM from pre-split operands (see ``ozaki_split``).

    Keeps slice pairs with ``p + q < terms``, batching pairs on the same
    anti-diagonal into ONE ``dot_general`` (contracting over both the
    pair index and k). Exactness is preserved: every product on diagonal
    ``d`` is an integer multiple of the same unit ``2^-(d+2)w`` bounded
    by ``2^-dw``, so a fused sum of ``c`` pair-GEMMs stays error-free in
    the f32 accumulator iff ``c * k * 2^(2w) <= 2^24`` — the group size
    below. (Products from *different* diagonals must NOT share an f32
    accumulator: their units differ by 2^w, so the sum rounds at 2^-24
    relative to the larger diagonal — a ~2^-29 global error that defeats
    the scheme; caught by TestOzakiGemm.)

    Why batch: the DF fold after each dot is an elementwise pass over
    the full (m, n) output — for large outputs the folds, not the MXU
    dots, dominate HBM traffic. Diagonal batching cuts the fold count
    from ``terms*(terms+1)/2`` to ~``terms`` and makes each dot larger
    (better MXU utilization), with zero accuracy change.
    """
    if w < 1 or 2 * w >= 24:
        raise ValueError(f"ozaki w={w} outside the error-free window "
                         "(need 1 <= w <= 11 so 2w < 24)")
    sa = int(a_slices.shape[0])
    sb = int(b_slices.shape[0])
    k = int(a_slices.shape[-1])
    group = max(1, (1 << (24 - 2 * w)) // max(k, 1))
    a_small = a_slices.shape[-2] <= b_slices.shape[-1]
    acc = None   # DF accumulator, built from largest diagonal down
    tail = None  # plain-f32 accumulator for the deep diagonals
    tail_d0 = _tail32_first_diag(terms, w)
    for d in range(terms):
        p_lo = max(0, d - (sb - 1))
        p_hi = min(d, sa - 1)
        if p_lo > p_hi:
            continue
        for g0 in range(p_lo, p_hi + 1, group):
            g1 = min(g0 + group - 1, p_hi)
            if g1 == g0:
                g = _dot_f32(a_slices[g0], b_slices[d - g0])
            else:
                # Pair p ascending with q = d - p descending: reverse
                # the smaller operand's selected slices.
                a_sel = jax.lax.slice_in_dim(a_slices, g0, g1 + 1, axis=0)
                b_sel = jax.lax.slice_in_dim(b_slices, d - g1, d - g0 + 1,
                                             axis=0)
                if a_small:
                    a_sel = jnp.flip(a_sel, axis=0)
                else:
                    b_sel = jnp.flip(b_sel, axis=0)
                g = jax.lax.dot_general(
                    a_sel, b_sel, (((0, 2), (0, 1)), ((), ())),
                    preferred_element_type=jnp.float32)
            if acc is not None and d >= tail_d0:
                # Deep diagonals: plain-f32 running sum, error well
                # below the pair-truncation floor (see
                # _tail32_first_diag) at a fraction of the DF fold's
                # HBM traffic on (m, n) outputs (the residual stage).
                tail = g if tail is None else tail + g
            else:
                acc = DF(g, jnp.zeros_like(g)) if acc is None else \
                    _df_add_f32_exactish(acc, g)
    if tail is not None:
        acc = _df_add_f32_exactish(acc, tail)
    out_scale = a_scale * b_scale  # powers of two; exact multiply below
    return DF(acc.hi * out_scale, acc.lo * out_scale)


def _df_add_f32_exactish(x: DF, y) -> DF:
    """DF + f32 with full renormalization (y smaller in magnitude)."""
    s, e = two_sum(x.hi, y)
    e = e + x.lo
    s, e = fast_two_sum(s, e)
    return DF(s, e)


def ozaki_matmul(a, b, *, terms: int = DEFAULT_TERMS, w: int = DEFAULT_W,
                 slices_a: int | None = None,
                 slices_b: int | None = None) -> DF:
    """``a @ b`` to ~``terms*w``-bit accuracy; a (m,k) and b (k,n) are DF
    or f32 (an f32 operand with limited dynamic range can use fewer slices — pass
    ``slices_a``/``slices_b``; 5 slices keep 25 bits below each row/col max)."""
    a = df(a)
    b = df(b)
    sa = min(terms, slices_a) if slices_a else terms
    sb = min(terms, slices_b) if slices_b else terms
    a_slices, a_scale = ozaki_split(a, sa, w=w, contract_axis=1)
    b_slices, b_scale = ozaki_split(b, sb, w=w, contract_axis=0)
    return ozaki_matmul_split(a_slices, a_scale, b_slices, b_scale,
                              terms=terms, w=w)


def ozaki_matmul_complex(a: DF, b: DF, *, terms: int = DEFAULT_TERMS,
                         conj_a: bool = False, conj_b: bool = False) -> DF:
    """``a @ b`` for complex DF operands via 4 planar real Ozaki GEMMs.

    The TPU MXU (and the slice scheme) is real-only; a complex DF is a
    c64 hi/lo pair whose re/im planes are independent real DFs (the
    additive EFTs in utils.doublefloat are componentwise). This is the
    kernel the complex high-accuracy paths (highacc planar stages,
    ns_polar complex merge) build on — the analogue of the reference's
    LAPACK z-kernels (rusty-compression src/qr.rs:408-416).
    """
    from ..utils.doublefloat import (df_add, df_complex, df_imag, df_neg,
                                     df_real, df_sub)

    ar, ai = df_real(a), df_imag(a)
    br, bi = df_real(b), df_imag(b)
    if conj_a:
        ai = df_neg(ai)
    if conj_b:
        bi = df_neg(bi)
    rr = ozaki_matmul(ar, br, terms=terms)
    ii = ozaki_matmul(ai, bi, terms=terms)
    ri = ozaki_matmul(ar, bi, terms=terms)
    ir = ozaki_matmul(ai, br, terms=terms)
    return df_complex(df_sub(rr, ii), df_add(ri, ir))


def ozaki_flops(m: int, n: int, k: int, terms: int = DEFAULT_TERMS) -> int:
    """MXU FLOPs of one ozaki GEMM (for MFU accounting)."""
    return terms * (terms + 1) * m * n * k  # (terms*(terms+1)/2) * 2mnk
