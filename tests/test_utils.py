"""Tests for permutations, metrics, and random-matrix generation.

Mirrors the reference suites in ``permutation.rs:186-240`` (exact shift
fixtures over all modes) and the implicit contracts of
``random_matrix.rs`` (orthogonality, prescribed spectrum).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rusty_compression_tpu as rc

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


class TestPermutation:
    """Exact 3x3 fixtures from permutation.rs:192-221."""

    MAT = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]])
    PERM = np.array([2, 0, 1])

    def test_col(self):
        out = rc.apply_matrix_permutation(
            self.MAT, self.PERM, rc.MatrixPermutationMode.COL)
        np.testing.assert_array_equal(
            out, [[3.0, 1.0, 2.0], [6.0, 4.0, 5.0], [9.0, 7.0, 8.0]])

    def test_colinv(self):
        out = rc.apply_matrix_permutation(
            self.MAT, self.PERM, rc.MatrixPermutationMode.COLINV)
        np.testing.assert_array_equal(
            out, [[2.0, 3.0, 1.0], [5.0, 6.0, 4.0], [8.0, 9.0, 7.0]])

    def test_row(self):
        out = rc.apply_matrix_permutation(
            self.MAT, self.PERM, rc.MatrixPermutationMode.ROW)
        np.testing.assert_array_equal(
            out, [[7.0, 8.0, 9.0], [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])

    def test_rowinv(self):
        out = rc.apply_matrix_permutation(
            self.MAT, self.PERM, rc.MatrixPermutationMode.ROWINV)
        np.testing.assert_array_equal(
            out, [[4.0, 5.0, 6.0], [7.0, 8.0, 9.0], [1.0, 2.0, 3.0]])

    def test_vector_modes(self):
        vec = np.array([1.0, 2.0, 3.0])
        out = rc.apply_vector_permutation(
            vec, self.PERM, rc.VectorPermutationMode.NOINV)
        np.testing.assert_array_equal(out, [3.0, 1.0, 2.0])
        out = rc.apply_vector_permutation(
            vec, self.PERM, rc.VectorPermutationMode.INV)
        np.testing.assert_array_equal(out, [2.0, 3.0, 1.0])

    def test_invert_roundtrip(self):
        perm = np.random.default_rng(0).permutation(17)
        inv = rc.invert_permutation_vector(perm)
        np.testing.assert_array_equal(np.asarray(inv)[perm], np.arange(17))

    def test_forward_then_inverse_is_identity(self):
        rng = np.random.default_rng(1)
        mat = rng.normal(size=(5, 7))
        perm = rng.permutation(7)
        fwd = rc.apply_matrix_permutation(
            mat, perm, rc.MatrixPermutationMode.COL)
        back = rc.apply_matrix_permutation(
            fwd, perm, rc.MatrixPermutationMode.COLINV)
        np.testing.assert_allclose(np.asarray(back), mat)


class TestMetrics:
    def test_rel_diff_fro(self):
        a = jnp.ones((4, 4))
        assert float(rc.rel_diff_fro(a, a)) == 0.0
        b = jnp.zeros((4, 4))
        assert float(rc.rel_diff_fro(b, a)) == pytest.approx(1.0)

    def test_rel_diff_l2(self):
        v = jnp.array([3.0, 4.0])
        assert float(rc.rel_diff_l2(2 * v, v)) == pytest.approx(1.0)

    def test_complex(self):
        a = jnp.array([[1 + 1j, 2.0], [0.0, 1 - 1j]], dtype=jnp.complex128)
        assert float(rc.rel_diff_fro(a, a)) == 0.0


@pytest.mark.parametrize("dtype", DTYPES)
class TestRandomMatrix:
    def test_gaussian_moments(self, key, dtype):
        g = rc.random_gaussian(key, (200, 200), dtype=dtype)
        assert g.dtype == jnp.dtype(dtype)
        mean = float(jnp.abs(jnp.mean(g)))
        assert mean < 0.05
        # Complex entries have component variance 1 each (variance 2 total).
        var = float(jnp.mean(jnp.abs(g) ** 2))
        expected = 2.0 if jnp.issubdtype(dtype, jnp.complexfloating) else 1.0
        assert var == pytest.approx(expected, rel=0.05)

    @pytest.mark.parametrize("shape", [(60, 40), (40, 60)])
    def test_orthogonal(self, key, dtype, shape):
        q = rc.random_orthogonal_matrix(key, shape, dtype=dtype)
        assert q.shape == shape
        m, n = shape
        if m >= n:
            gram = jnp.conjugate(q.T) @ q
        else:
            gram = q @ jnp.conjugate(q.T)
        k = min(m, n)
        tol = 1e-5 if gram.real.dtype == jnp.float32 else 1e-12
        np.testing.assert_allclose(np.asarray(gram), np.eye(k), atol=tol)

    def test_low_rank_spectrum(self, key, dtype):
        a = rc.random_approximate_low_rank_matrix(
            key, (50, 30), 1.0, 1e-6, dtype=dtype)
        s = np.linalg.svd(np.asarray(a), compute_uv=False)
        expected = np.geomspace(1.0, 1e-6, 30)
        rtol = 2e-3 if s.dtype == np.float32 else 1e-6
        # f32 can't resolve singular values near 1e-6; check the top ones.
        ncheck = 30 if s.dtype != np.float32 else 12
        np.testing.assert_allclose(s[:ncheck], expected[:ncheck], rtol=rtol)


class TestLinearOperator:
    def test_dense_operator(self, key):
        a = rc.random_gaussian(key, (10, 6), dtype=jnp.complex128)
        op = rc.as_linear_operator(a)
        x = rc.random_gaussian(jax.random.key(1), (6, 3), dtype=jnp.complex128)
        np.testing.assert_allclose(np.asarray(op.matmat(x)), np.asarray(a @ x))
        y = rc.random_gaussian(jax.random.key(2), (10, 3), dtype=jnp.complex128)
        np.testing.assert_allclose(
            np.asarray(op.conj_matmat(y)),
            np.asarray(np.conjugate(np.asarray(a)).T @ np.asarray(y)))
        v = x[:, 0]
        np.testing.assert_allclose(
            np.asarray(op.matvec(v)), np.asarray(a @ v))
        assert op.shape == (10, 6)

    def test_matrix_free_custom_operator(self, key):
        """The sampling API must accept operators that never materialize."""
        diag = jnp.linspace(1.0, 0.01, 32)

        class DiagOp(rc.LinearOperator):
            @property
            def shape(self):
                return (32, 32)

            @property
            def dtype(self):
                return jnp.float64

            def matmat(self, x):
                return diag[:, None] * x

            def conj_matmat(self, x):
                return diag[:, None] * x

        q = rc.sample_range_by_rank(DiagOp(), key, k=8)
        assert q.shape == (32, 8)
        np.testing.assert_allclose(
            np.asarray(q.T @ q), np.eye(8), atol=1e-12)


def test_mfu_model():
    from rusty_compression_tpu.utils.mfu import effective_peak_flops, mfu_pct

    # v5e at highest = bf16 peak / 6
    assert effective_peak_flops("TPU v5 lite", "highest") == 197e12 / 6
    assert effective_peak_flops("TPU v5p", "high") == 459e12 / 3
    assert effective_peak_flops("TPU v4", "default") == 275e12
    # unknown devices (CPU hosts) report no MFU rather than a guess
    assert effective_peak_flops("cpu", "highest") is None
    assert mfu_pct(1e12, 1.0, "cpu", "highest") is None
    got = mfu_pct(197e12 / 6, 1.0, "TPU v5 lite", "highest")
    assert abs(got - 100.0) < 1e-9
    import pytest

    with pytest.raises(ValueError):
        effective_peak_flops("TPU v4", "bf16")


class TestTriangular:
    """ops.triangular: the Neumann-inverse kernel must match LAPACK
    substitution to roundoff (it routes around XLA's TPU trsm expansion,
    which escapes the matmul-precision policy)."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64,
                                       jnp.complex64, jnp.complex128])
    @pytest.mark.parametrize("lower", [False, True])
    @pytest.mark.parametrize("left", [False, True])
    def test_inverse_matches_xla(self, dtype, lower, left):
        from rusty_compression_tpu.ops import triangular as tri

        rng = np.random.default_rng(0)
        l = 37
        r = rng.standard_normal((l, l))
        if np.dtype(dtype).kind == "c":
            r = r + 1j * rng.standard_normal((l, l))
        r = np.tril(r) if lower else np.triu(r)
        r[np.arange(l), np.arange(l)] += 4.0  # well-conditioned
        b = rng.standard_normal((l, 12) if left else (12, l))
        if np.dtype(dtype).kind == "c":
            b = b + 1j * rng.standard_normal(b.shape)
        r, b = r.astype(dtype), b.astype(dtype)
        x_ref = tri.triangular_solve(r, b, left_side=left, lower=lower,
                                     method="xla")
        x_inv = tri.triangular_solve(r, b, left_side=left, lower=lower,
                                     method="inverse")
        tol = 1e-5 if np.dtype(dtype).itemsize <= 8 else 1e-12
        np.testing.assert_allclose(np.asarray(x_inv), np.asarray(x_ref),
                                   atol=tol, rtol=tol)

    def test_inverse_exact_identity(self):
        from rusty_compression_tpu.ops.triangular import triangular_inverse

        rng = np.random.default_rng(1)
        r = np.triu(rng.integers(-3, 4, (16, 16)).astype(np.float64))
        np.fill_diagonal(r, 1.0)  # unit triangular: Neumann product exact
        rinv = np.asarray(triangular_inverse(r))
        np.testing.assert_allclose(r @ rinv, np.eye(16), atol=1e-12)

    def test_batched(self):
        from rusty_compression_tpu.ops import triangular as tri

        rng = np.random.default_rng(2)
        r = np.triu(rng.standard_normal((5, 9, 9)))
        r[:, np.arange(9), np.arange(9)] += 3.0
        b = rng.standard_normal((5, 9, 4))
        x_ref = tri.triangular_solve(r, b, method="xla")
        x_inv = tri.triangular_solve(r, b, method="inverse")
        np.testing.assert_allclose(np.asarray(x_inv), np.asarray(x_ref),
                                   atol=1e-10)
