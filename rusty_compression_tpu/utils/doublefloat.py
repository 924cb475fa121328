"""Double-float (f32 hi/lo pair) arithmetic for TPU.

TPUs have no native f64 (XLA's f64 emulation on this backend is unusably
slow for large arrays — see CLAUDE.md). This module provides the classic
double-float representation: a value is an unevaluated sum ``hi + lo`` of
two f32 arrays with ``|lo| <= ulp(hi)/2``, giving ~49 bits of significand
(~3e-15 relative precision) out of pure f32 VPU ops.

Used as the accumulator / storage format of the high-accuracy compression
pipeline (ozaki.py, highacc.py), which is how this framework reaches the
reference's f64 accuracy class (rusty-compression runs natively in f64,
e.g. src/qr.rs:408-416, with 1e-12 test contracts at src/svd.rs:289-298)
on hardware without f64.

All primitives are branch-free elementwise ops (Knuth two-sum, Dekker
split two-prod) that XLA fuses; correctness requires IEEE f32 semantics
without fast-math reassociation, which XLA guarantees (verified on the
TPU backend by tests/test_doublefloat.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DF", "two_sum", "fast_two_sum", "two_prod",
    "df", "df_from_f64", "df_to_f64", "df_from_parts",
    "df_add", "df_sub", "df_neg", "df_add_f32", "df_mul_f32", "df_mul",
    "df_scale_pow2", "df_transpose", "df_abs_max", "df_norm_fro",
    "df_real", "df_imag", "df_complex", "df_conj",
]


class DF(NamedTuple):
    """Unevaluated f32 sum ``hi + lo`` (a pytree; vmap/jit/shard-safe)."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    @property
    def shape(self):
        return self.hi.shape

    @property
    def ndim(self):
        return self.hi.ndim

    @property
    def T(self) -> "DF":
        return DF(self.hi.T, self.lo.T)


# ---------------------------------------------------------------------------
# Error-free transforms
# ---------------------------------------------------------------------------


def two_sum(a, b):
    """Knuth's branch-free two-sum: s + e == a + b exactly, s = fl(a+b)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def fast_two_sum(a, b):
    """Dekker two-sum; exact only when ``|a| >= |b|`` (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


_SPLIT = np.float32(4097.0)  # 2**12 + 1 (Dekker split constant for f32)


def _split(a):
    """Dekker split: a == h + l with h, l each having <= 12 mantissa bits."""
    t = _SPLIT * a
    h = t - (t - a)
    return h, a - h


def two_prod(a, b):
    """Error-free product: p + e == a * b exactly (Dekker, FMA-free)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# Construction / conversion
# ---------------------------------------------------------------------------


def df(x) -> DF:
    """Coerce to DF: arrays of f64/c128 split exactly; f32/c64 get
    lo = 0. Complex pairs store c64 hi/lo — the additive EFTs below are
    componentwise FP adds, so they remain error-free per component;
    products must go planar (see highacc's complex stages)."""
    if isinstance(x, DF):
        return x
    x = np.asarray(x) if isinstance(x, (np.ndarray, float, int, complex)) else x
    if hasattr(x, "dtype") and x.dtype in (np.float64, np.complex128):
        return df_from_f64(x)
    narrow = (jnp.complex64 if hasattr(x, "dtype")
              and np.dtype(x.dtype).kind == "c" else jnp.float32)
    x = jnp.asarray(x, dtype=narrow)
    return DF(x, jnp.zeros_like(x))


def df_from_f64(x) -> DF:
    """Exact split of f64/c128 data into (hi, lo) f32/c64 (host-side
    numpy path works without jax x64; jax arrays require x64 enabled)."""
    if isinstance(x, (np.ndarray, jnp.ndarray)) and x.dtype.kind == "c":
        wide, narrow = np.complex128, np.complex64
    else:
        wide, narrow = np.float64, np.float32
    if isinstance(x, np.ndarray) or np.isscalar(x):
        x = np.asarray(x, dtype=wide)
        hi = x.astype(narrow)
        lo = (x - hi.astype(wide)).astype(narrow)
        return DF(jnp.asarray(hi), jnp.asarray(lo))
    hi = x.astype(narrow)
    lo = (x - hi.astype(x.dtype)).astype(narrow)
    return DF(hi, lo)


def df_to_f64(x: DF) -> np.ndarray:
    """Exact host-side f64/c128 value of the pair."""
    wide = (np.complex128 if np.dtype(np.asarray(
        jax.device_get(x.hi)).dtype).kind == "c" else np.float64)
    return (np.asarray(jax.device_get(x.hi)).astype(wide)
            + np.asarray(jax.device_get(x.lo)).astype(wide))


def df_from_parts(hi, lo) -> DF:
    """Renormalize an arbitrary (hi, lo) pair into canonical DF form."""
    s, e = two_sum(hi, lo)
    return DF(s, e)


# ---------------------------------------------------------------------------
# Arithmetic (elementwise, broadcasting like jnp)
# ---------------------------------------------------------------------------


def df_add(x: DF, y: DF) -> DF:
    """Accurate double-float addition (QD library ``ieee_add`` flavor)."""
    s1, s2 = two_sum(x.hi, y.hi)
    t1, t2 = two_sum(x.lo, y.lo)
    s2 = s2 + t1
    s1, s2 = fast_two_sum(s1, s2)
    s2 = s2 + t2
    s1, s2 = fast_two_sum(s1, s2)
    return DF(s1, s2)


def df_neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def df_sub(x: DF, y: DF) -> DF:
    return df_add(x, df_neg(y))


def df_add_f32(x: DF, y) -> DF:
    """DF + plain f32 array."""
    s1, s2 = two_sum(x.hi, y)
    s2 = s2 + x.lo
    s1, s2 = fast_two_sum(s1, s2)
    return DF(s1, s2)


def df_mul_f32(x: DF, y) -> DF:
    """DF * plain f32 array (y treated as exact)."""
    p, e = two_prod(x.hi, y)
    e = e + x.lo * y
    p, e = fast_two_sum(p, e)
    return DF(p, e)


def df_mul(x: DF, y: DF) -> DF:
    """DF * DF (drops the lo*lo term; error ~2^-49 relative)."""
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    p, e = fast_two_sum(p, e)
    return DF(p, e)


def df_scale_pow2(x: DF, s) -> DF:
    """Multiply by an exact power of two (no renormalization needed)."""
    return DF(x.hi * s, x.lo * s)


def df_transpose(x: DF) -> DF:
    return DF(x.hi.T, x.lo.T)


# ---------------------------------------------------------------------------
# Planar views for complex pairs (products go through real kernels)
# ---------------------------------------------------------------------------


def df_real(x: DF) -> DF:
    return DF(jnp.real(x.hi), jnp.real(x.lo))


def df_imag(x: DF) -> DF:
    return DF(jnp.imag(x.hi), jnp.imag(x.lo))


def df_complex(re: DF, im: DF) -> DF:
    """Assemble a complex pair from planar real/imaginary DFs."""
    return DF(jax.lax.complex(re.hi, im.hi), jax.lax.complex(re.lo, im.lo))


def df_conj(x: DF) -> DF:
    return DF(jnp.conjugate(x.hi), jnp.conjugate(x.lo))


# ---------------------------------------------------------------------------
# Reductions (f32-accuracy results; enough for gating/normalization)
# ---------------------------------------------------------------------------


def df_abs_max(x: DF):
    return jnp.max(jnp.abs(x.hi))


def df_norm_fro(x: DF):
    """Frobenius norm to ~f32 relative accuracy, overflow-safe."""
    scale = jnp.maximum(df_abs_max(x), jnp.float32(1e-30))
    y = jnp.abs(x.hi / scale)
    return scale * jnp.sqrt(jnp.sum(y * y))
