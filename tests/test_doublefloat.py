"""Double-float arithmetic and Ozaki-scheme GEMM accuracy (vs true f64).

These are the foundations of the tol<=1e-8-on-TPU pipeline (the reference
achieves this class natively in f64, src/qr.rs:408-416; we emulate it with
error-free transforms + exact bf16 slice products).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rusty_compression_tpu.ops.ozaki import (
    ozaki_matmul, ozaki_split, ozaki_matmul_split)
from rusty_compression_tpu.utils.doublefloat import (
    DF, df, df_add, df_from_f64, df_mul, df_mul_f32, df_sub, df_to_f64,
    two_prod, two_sum)


def rng(seed=0):
    return np.random.default_rng(seed)


class TestErrorFreeTransforms:
    def test_two_sum_exact(self):
        x = jnp.asarray(rng(0).standard_normal(512), dtype=jnp.float32)
        y = jnp.asarray(rng(1).standard_normal(512) * 1e-6,
                        dtype=jnp.float32)
        s, e = jax.jit(two_sum)(x, y)
        got = np.asarray(s, np.float64) + np.asarray(e, np.float64)
        want = np.asarray(x, np.float64) + np.asarray(y, np.float64)
        np.testing.assert_array_equal(got, want)

    def test_two_prod_exact(self):
        x = jnp.asarray(rng(2).standard_normal(512), dtype=jnp.float32)
        y = jnp.asarray(rng(3).standard_normal(512), dtype=jnp.float32)
        p, e = jax.jit(two_prod)(x, y)
        got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
        want = np.asarray(x, np.float64) * np.asarray(y, np.float64)
        np.testing.assert_array_equal(got, want)


class TestDF:
    def test_f64_roundtrip_near_exact(self):
        # hi+lo captures ~49+ significand bits of the f64 value
        x = rng(4).standard_normal((64, 32))
        rel = np.abs(df_to_f64(df_from_f64(x)) - x) / np.abs(x)
        assert rel.max() < 2.0 ** -48

    def test_add_sub_accuracy(self):
        a64 = rng(5).standard_normal((128,))
        b64 = rng(6).standard_normal((128,)) * np.logspace(-8, 8, 128)
        a, b = df_from_f64(a64), df_from_f64(b64)
        got = df_to_f64(jax.jit(df_add)(a, b))
        rel = np.abs(got - (a64 + b64)) / np.maximum(
            np.abs(a64) + np.abs(b64), 1e-300)
        assert rel.max() < 2.0 ** -46
        got = df_to_f64(jax.jit(df_sub)(a, b))
        rel = np.abs(got - (a64 - b64)) / np.maximum(
            np.abs(a64) + np.abs(b64), 1e-300)
        assert rel.max() < 2.0 ** -46

    def test_mul_accuracy(self):
        a64 = rng(7).standard_normal((256,))
        b64 = rng(8).standard_normal((256,))
        got = df_to_f64(jax.jit(df_mul)(df_from_f64(a64), df_from_f64(b64)))
        rel = np.abs(got - a64 * b64) / np.abs(a64 * b64)
        assert rel.max() < 2.0 ** -45
        got = df_to_f64(df_mul_f32(
            df_from_f64(a64), jnp.asarray(b64, dtype=jnp.float32)))
        b32 = np.asarray(b64, np.float32).astype(np.float64)
        rel = np.abs(got - a64 * b32) / np.abs(a64 * b32)
        assert rel.max() < 2.0 ** -45

    def test_pytree_through_vmap(self):
        a = df_from_f64(rng(9).standard_normal((8, 16)))
        out = jax.vmap(lambda x: df_add(x, x))(a)
        assert isinstance(out, DF)
        np.testing.assert_allclose(df_to_f64(out), 2 * df_to_f64(a),
                                   rtol=1e-14)


class TestOzakiGemm:
    def _check(self, a64, b64, terms, bound):
        c = ozaki_matmul(df_from_f64(a64), df_from_f64(b64), terms=terms)
        got = df_to_f64(c)
        want = a64 @ b64
        # Error relative to the row/col magnitude scale (the natural
        # backward-error yardstick for a GEMM).
        scale = (np.linalg.norm(a64, axis=1)[:, None]
                 * np.linalg.norm(b64, axis=0)[None, :])
        rel = np.abs(got - want) / np.maximum(scale, 1e-300)
        assert rel.max() < bound, f"max rel err {rel.max():.3e}"

    @pytest.mark.parametrize("shape", [(64, 96, 48), (128, 300, 77)])
    def test_terms7_reaches_1e10(self, shape):
        m, k, n = shape
        a = rng(10).standard_normal((m, k))
        b = rng(11).standard_normal((k, n))
        self._check(a, b, terms=7, bound=1e-9)

    def test_terms10_reaches_df_floor(self):
        a = rng(12).standard_normal((96, 200))
        b = rng(13).standard_normal((200, 64))
        self._check(a, b, terms=10, bound=1e-13)

    def test_badly_scaled_rows(self):
        a = rng(14).standard_normal((64, 128)) * np.logspace(
            -12, 12, 64)[:, None]
        b = rng(15).standard_normal((128, 64)) * np.logspace(
            8, -8, 64)[None, :]
        self._check(a, b, terms=10, bound=1e-13)

    def test_f32_operand(self):
        # An f32 operand at full slice count is represented exactly
        # (elements within ~26 bits of dynamic range of the row max).
        a32 = rng(16).standard_normal((64, 512)).astype(np.float32)
        b = rng(17).standard_normal((512, 32))
        got = df_to_f64(ozaki_matmul(jnp.asarray(a32), df_from_f64(b),
                                     terms=10))
        want = a32.astype(np.float64) @ b
        scale = (np.linalg.norm(a32, axis=1).astype(np.float64)[:, None]
                 * np.linalg.norm(b, axis=0)[None, :])
        assert (np.abs(got - want) / scale).max() < 1e-13
        # slices_a=5 truncates 25 bits below the row max — cheaper, with
        # a documented ~2^-24-class floor for full-dynamic-range data.
        got5 = df_to_f64(ozaki_matmul(jnp.asarray(a32), df_from_f64(b),
                                      terms=10, slices_a=5))
        assert (np.abs(got5 - want) / scale).max() < 2.0 ** -22

    def test_split_reconstructs(self):
        x = df_from_f64(rng(18).standard_normal((32, 48)))
        slices, scale = ozaki_split(x, 10, contract_axis=1)
        # the scale MUST be an exact power of two (regression: exp2 on
        # some backends returns 2^21 + 1 for exp2(21.0))
        log2s = np.log2(np.asarray(scale, np.float64))
        np.testing.assert_array_equal(log2s, np.round(log2s))
        recon = (np.asarray(slices, np.float64).sum(axis=0)
                 * np.asarray(scale, np.float64))
        want = df_to_f64(x)
        assert np.abs(recon - want).max() < 2.0 ** -49 * np.abs(want).max()

    def test_jit_and_long_k_exactness(self):
        # k at the north-star max (16384) stresses the 2w + log2 k <= 24
        # exactness budget; values in [-1, 1] hit the worst case.
        k = 16384
        a = rng(19).uniform(-1, 1, (8, k))
        b = rng(20).uniform(-1, 1, (k, 8))
        f = jax.jit(lambda a, b: ozaki_matmul(a, b, terms=10))
        got = df_to_f64(f(df_from_f64(a), df_from_f64(b)))
        want = a @ b
        scale = (np.linalg.norm(a, axis=1)[:, None]
                 * np.linalg.norm(b, axis=0)[None, :])
        assert (np.abs(got - want) / scale).max() < 1e-13


class TestOzakiComplex:
    def test_matmul_complex_matches_c128(self):
        from rusty_compression_tpu.ops.ozaki import ozaki_matmul_complex
        r = rng(3)
        a64 = (r.standard_normal((40, 30)) + 1j * r.standard_normal((40, 30)))
        b64 = (r.standard_normal((30, 20)) + 1j * r.standard_normal((30, 20)))
        out = df_to_f64(ozaki_matmul_complex(df_from_f64(a64),
                                             df_from_f64(b64), terms=10))
        ref = a64 @ b64
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-13

    def test_matmul_complex_conjugation_flags(self):
        from rusty_compression_tpu.ops.ozaki import ozaki_matmul_complex
        r = rng(4)
        a64 = (r.standard_normal((16, 24)) + 1j * r.standard_normal((16, 24)))
        b64 = (r.standard_normal((16, 24)) + 1j * r.standard_normal((16, 24)))
        at = df_from_f64(a64.T)
        out = df_to_f64(ozaki_matmul_complex(at, df_from_f64(b64),
                                             terms=10, conj_a=True))
        ref = a64.conj().T @ b64
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-13
