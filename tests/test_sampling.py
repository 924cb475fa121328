"""Tests for randomized range sampling.

Covers the three samplers of random_sampling.rs (fixed-rank,
power-iteration with corrected semantics, adaptive) plus the
sketch-then-factorize entry points (qr.rs:311-323, svd.rs:171-183), the
max-col-norm estimator, determinism under fixed keys, and the adaptive
sampler's residual-history contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rusty_compression_tpu as rc

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


def _sigma_min(dtype):
    return 1e-5 if np.dtype(dtype).itemsize <= 8 else 1e-10


def _proj_err(a, q):
    a, q = np.asarray(a), np.asarray(q)
    resid = a - q @ (np.conjugate(q.T) @ a)
    return np.linalg.norm(resid) / np.linalg.norm(a)


class TestMaxColNorm:
    def test_value(self):
        a = jnp.array([[3.0, 0.0], [4.0, 1.0]])
        assert float(rc.max_col_norm(a)) == pytest.approx(5.0)


@pytest.mark.parametrize("dtype", DTYPES)
class TestSampleRangeByRank:
    def test_orthonormal_and_accurate(self, key, dtype):
        a = rc.random_approximate_low_rank_matrix(
            key, (120, 80), 1.0, _sigma_min(dtype), dtype=dtype)
        q = rc.sample_range_by_rank(a, jax.random.key(7), k=30, p=5)
        assert q.shape == (120, 30)
        atol = 1e-5 if np.dtype(dtype).itemsize <= 8 else 1e-12
        np.testing.assert_allclose(
            np.asarray(jnp.conjugate(q.T) @ q), np.eye(30), atol=atol)
        # sigma_31 of the fixture bounds the optimal projection error.
        s = np.geomspace(1.0, _sigma_min(dtype), 80)
        assert _proj_err(a, q) < 50 * s[30]

    def test_deterministic(self, key, dtype):
        a = rc.random_approximate_low_rank_matrix(
            key, (60, 40), 1.0, _sigma_min(dtype), dtype=dtype)
        q1 = rc.sample_range_by_rank(a, jax.random.key(3), k=10)
        q2 = rc.sample_range_by_rank(a, jax.random.key(3), k=10)
        np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
class TestPowerIteration:
    def test_improves_slow_spectrum(self, key, dtype):
        """On a slowly decaying spectrum, subspace iteration must beat the
        plain sketch (the corrected semantics of random_sampling.rs:74-81
        — the reference's shadowed-variable version would show no
        improvement with it_count)."""
        m, n, k = 150, 150, 10
        ku, kv = jax.random.split(key)
        u = rc.random_orthogonal_matrix(ku, (m, n), dtype=dtype)
        vt = rc.random_orthogonal_matrix(kv, (n, n), dtype=dtype)
        s = jnp.asarray(1.0 / np.arange(1, n + 1))  # slow 1/i decay
        a = (u * s.astype(u.dtype)[None, :]) @ vt

        errs = []
        for it in (0, 2, 4):
            q = rc.sample_range_power_iteration(
                a, jax.random.key(11), k=k, p=5, it_count=it)
            errs.append(_proj_err(a, q))
        assert errs[1] < errs[0]
        assert errs[2] <= errs[1] * 1.05
        # With q=4 the error should approach the optimal sigma_{k+1} tail.
        opt = float(np.sqrt(np.sum(np.asarray(s[k:]) ** 2))
                    / np.linalg.norm(np.asarray(s)))
        assert errs[2] < 1.6 * opt

    def test_zero_iters_matches_by_rank(self, key, dtype):
        a = rc.random_approximate_low_rank_matrix(
            key, (50, 40), 1.0, 1e-8, dtype=dtype)
        q0 = rc.sample_range_by_rank(a, jax.random.key(5), k=8, p=5)
        q1 = rc.sample_range_power_iteration(
            a, jax.random.key(5), k=8, p=5, it_count=0)
        np.testing.assert_allclose(np.asarray(q0), np.asarray(q1), atol=1e-12)


@pytest.mark.parametrize("dtype", DTYPES)
class TestAdaptiveSampling:
    def test_reaches_tolerance(self, key, dtype):
        """Mirror of examples/adaptive_sampling.rs: estimated residual
        history decreases below tol and the true projection error is
        comparable (the estimate is probabilistic)."""
        rel_tol = 1e-3 if np.dtype(dtype).itemsize <= 8 else 1e-5
        a = rc.random_approximate_low_rank_matrix(
            key, (200, 100), 1.0, _sigma_min(dtype), dtype=dtype)
        q, residuals = rc.sample_range_adaptive(
            a, jax.random.key(13), rel_tol, sample_size=10)
        assert q.shape[0] == 200
        assert q.shape[1] == residuals[-1][0]
        # History: ranks increase by sample_size; final estimate < tol.
        ranks = [r for r, _ in residuals]
        assert ranks == [10 * (i + 1) for i in range(len(ranks))]
        assert residuals[-1][1] < rel_tol
        # True residual within an order of magnitude of the estimate.
        assert _proj_err(a, q) < 10 * rel_tol
        # Q orthonormal.
        k = q.shape[1]
        atol = 1e-4 if np.dtype(dtype).itemsize <= 8 else 1e-12
        np.testing.assert_allclose(
            np.asarray(jnp.conjugate(q.T) @ q), np.eye(k), atol=atol)

    def test_history_is_decreasing(self, key, dtype):
        a = rc.random_approximate_low_rank_matrix(
            key, (150, 90), 1.0, _sigma_min(dtype), dtype=dtype)
        _, residuals = rc.sample_range_adaptive(
            a, jax.random.key(17), 1e-4, sample_size=8)
        vals = [v for _, v in residuals]
        assert all(b < a_ * 2.0 for a_, b in zip(vals, vals[1:]))
        assert vals[-1] < 1e-4


class TestRangeEstimateFactorizations:
    @pytest.mark.parametrize("dtype", DTYPES)
    def test_qr_from_range_estimate(self, key, dtype):
        """Stack 3.4 of SURVEY.md: sketch-then-factorize QR."""
        tol = 1e-3 if np.dtype(dtype).itemsize <= 8 else 1e-5
        a = rc.random_approximate_low_rank_matrix(
            key, (200, 100), 1.0, _sigma_min(dtype), dtype=dtype)
        q, _ = rc.sample_range_adaptive(
            a, jax.random.key(19), tol, sample_size=10)
        qr = rc.QR.compute_from_range_estimate(q, a)
        assert qr.nrows == 200 and qr.ncols == 100
        assert float(rc.rel_diff_fro(qr.to_mat(), a)) < 10 * tol

    @pytest.mark.parametrize("dtype", DTYPES)
    def test_svd_from_range_estimate(self, key, dtype):
        tol = 1e-3 if np.dtype(dtype).itemsize <= 8 else 1e-5
        a = rc.random_approximate_low_rank_matrix(
            key, (200, 100), 1.0, _sigma_min(dtype), dtype=dtype)
        q = rc.sample_range_by_rank(a, jax.random.key(23), k=60, p=5)
        svd = rc.SVD.compute_from_range_estimate(q, a)
        assert svd.nrows == 200 and svd.ncols == 100
        # Singular values of the fixture are reproduced to the sketch
        # accuracy for the dominant part of the spectrum.
        s_true = np.geomspace(1.0, _sigma_min(dtype), 100)
        np.testing.assert_allclose(
            np.asarray(svd.s[:20]), s_true[:20], rtol=1e-2)
        assert float(rc.rel_diff_fro(svd.to_mat(), a)) < 100 * s_true[60]

    def test_matrix_free_end_to_end(self, key):
        """Full randomized pipeline through an operator that never
        materializes its matrix (the matrix-free contract of
        random_sampling.rs:102-222)."""
        n = 64
        diag = jnp.geomspace(1.0, 1e-9, n)

        class DiagOp(rc.LinearOperator):
            @property
            def shape(self):
                return (n, n)

            @property
            def dtype(self):
                return jnp.float64

            def matmat(self, x):
                return diag[:, None] * x

            def conj_matmat(self, x):
                return diag[:, None] * x

        op = DiagOp()
        q, residuals = rc.sample_range_adaptive(
            op, jax.random.key(29), 1e-6, sample_size=4)
        assert residuals[-1][1] < 1e-6
        svd = rc.SVD.compute_from_range_estimate(q, op)
        np.testing.assert_allclose(
            np.asarray(svd.s[:10]), np.asarray(diag[:10]), rtol=1e-6)

    def test_adaptive_range_finder_jittable(self, key):
        """The padded adaptive range finder must be callable under jit
        with a DenseOperator pytree."""
        a = rc.random_approximate_low_rank_matrix(
            key, (80, 60), 1.0, 1e-8, dtype=jnp.float64)
        op = rc.DenseOperator(a)
        q_pad, b_pad, ncols, n_iters, hist = rc.adaptive_range_finder(
            op, jax.random.key(31), 1e-5, sample_size=8)
        assert q_pad.shape == (80, 64)  # padded to ceil(60/8)*8
        assert int(ncols) == int(n_iters) * 8
        # Padded tail columns are zero.
        np.testing.assert_array_equal(
            np.asarray(q_pad[:, int(ncols):]), 0.0)


class TestAdaptiveWrappers:
    """randomized_adaptive_qr / _svd (the reference's intended-but-
    commented convenience API, random_sampling.rs:302-352)."""

    def test_adaptive_qr(self, key):
        import jax
        a = rc.random_approximate_low_rank_matrix(key, (150, 100), 1.0,
                                                  1e-10)
        qr, hist = rc.randomized_adaptive_qr(a, jax.random.key(1), 1e-5, 10)
        assert qr.rank == len(hist) * 10
        assert float(rc.rel_diff_fro(qr.to_mat(), a)) < 5e-5

    def test_adaptive_svd(self, key):
        import jax
        a = rc.random_approximate_low_rank_matrix(key, (150, 100), 1.0,
                                                  1e-10)
        svd, hist = rc.randomized_adaptive_svd(a, jax.random.key(1), 1e-5,
                                               10)
        assert svd.rank == len(hist) * 10
        assert float(rc.rel_diff_fro(svd.to_mat(), a)) < 5e-5
        s = np.asarray(svd.s)
        assert np.all(np.diff(s) <= 1e-12)


class TestKernelMatrices:
    def test_hilbert(self):
        from rusty_compression_tpu.utils.kernel_matrices import hilbert
        h = np.asarray(hilbert(4))
        assert h[0, 0] == 1.0 and abs(h[1, 2] - 1.0 / 4.0) < 1e-15
        assert np.allclose(h, h.T)

    def test_laplace_block_low_rank(self, key):
        import jax
        from rusty_compression_tpu.utils.kernel_matrices import (
            laplace_kernel_block, random_cloud)
        kt, ks = jax.random.split(key)
        x = random_cloud(kt, 100, (0.0, 0.0, 0.0))
        y = random_cloud(ks, 80, (4.0, 0.0, 0.0))
        blk = laplace_kernel_block(x, y)
        assert blk.shape == (100, 80)
        assert float(jnp.min(blk)) > 0
        # well-separated => numerically low rank
        s = np.linalg.svd(np.asarray(blk), compute_uv=False)
        assert s[20] / s[0] < 1e-6


def test_adaptive_below_dtype_floor_stops_cleanly(key):
    """Tolerance below the f32 noise floor: the sampler must hit its
    stall guard and return a still-valid basis (the single-pass BGS of
    the reference diverges here — basis degrades and reconstruction
    blows up)."""
    a = rc.random_approximate_low_rank_matrix(
        key, (256, 256), 1.0, 1e-10, dtype=jnp.float32)
    q, hist = rc.sample_range_adaptive(a, jax.random.key(1),
                                       rel_tol=1e-9, sample_size=8)
    # the guard may let f32 grind close to the cap, but the basis must
    # never degrade (the failure mode was residual ~20x, not rank)
    assert q.shape[1] <= 256
    qn, an = np.asarray(q), np.asarray(a)
    # basis remains orthonormal and the projection remains a contraction
    assert np.linalg.norm(qn.T @ qn - np.eye(q.shape[1])) < 1e-4
    resid = np.linalg.norm(an - qn @ (qn.T @ an)) / np.linalg.norm(an)
    assert resid < 1e-5


class TestNystromSVD:
    """Single-pass generalized Nystrom factorization (beyond-reference)."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64,
                                       jnp.complex64, jnp.complex128])
    def test_accuracy_within_theory(self, key, dtype):
        a = rc.random_approximate_low_rank_matrix(key, (200, 150), 1.0,
                                                  1e-10, dtype=dtype)
        k = 40
        svd = rc.nystrom_svd(a, jax.random.key(1), k=k)
        err = float(rc.rel_diff_fro(svd.to_mat(), a))
        sigma_next = 10.0 ** (-10.0 * k / 149)
        # Nystrom bound: ~(1 + l/(l2-l-1)) * optimal ~ 3x; allow 10x
        assert err < 10 * sigma_next
        assert svd.rank == k
        u = np.asarray(svd.u)
        assert np.linalg.norm(np.conj(u.T) @ u - np.eye(k)) < 1e-4

    def test_matrix_free_and_jittable(self, key):
        import jax as _jax
        a = rc.random_approximate_low_rank_matrix(key, (150, 100), 1.0,
                                                  1e-10)
        op = rc.as_linear_operator(a)
        f = _jax.jit(lambda key: rc.nystrom_svd(op, key, k=20))
        svd = f(_jax.random.key(2))
        assert float(rc.rel_diff_fro(svd.to_mat(), a)) < 1e-1


def test_adaptive_slow_decay_still_converges(key):
    """Regression: the noise-floor stall guard must not fire on slowly
    decaying spectra far above the dtype floor (review finding: the
    ratio-only heuristic returned rank 20 with residual 0.78)."""
    a = rc.random_approximate_low_rank_matrix(key, (300, 300), 1.0, 1e-5)
    q, hist = rc.sample_range_adaptive(a, jax.random.key(1), 1e-4, 10)
    qn, an = np.asarray(q), np.asarray(a)
    resid = np.linalg.norm(an - qn @ (qn.T @ an)) / np.linalg.norm(an)
    assert resid <= 5e-4


def test_north_star_tolerance_1e8(key):
    """BASELINE.md's production tolerance (1e-8, f64): full adaptive
    pipeline reaches it end to end."""
    a = rc.random_approximate_low_rank_matrix(key, (300, 200), 1.0, 1e-14)
    svd, hist = rc.randomized_adaptive_svd(a, jax.random.key(1),
                                           rel_tol=1e-8, sample_size=10)
    err = float(rc.rel_diff_fro(svd.to_mat(), a))
    assert err < 5e-8
    # the residual history crossed the tolerance
    assert hist[-1][1] < 1e-8


def test_sketch_precision_knob():
    """Opt-in low-precision sketching: same API, sampling products run
    under the given matmul precision, projection stays at policy. On a
    tail-dominated spectrum the result must match full precision to
    the tail (HMT: the sketch only steers the subspace)."""
    from rusty_compression_tpu.parallel.batch import rsvd_block

    key = jax.random.key(0)
    a = rc.random_approximate_low_rank_matrix(key, (256, 192), 1.0, 1e-3)
    outs = {}
    for sp in (None, "highest"):
        out = rsvd_block(a, jax.random.key(1), rank=40, oversample=8,
                         power_iters=2, sketch_precision=sp)
        rec = out.u @ (out.s[:, None].astype(out.vt.dtype) * out.vt)
        outs[sp] = float(jnp.linalg.norm(a - rec) / jnp.linalg.norm(a))
    # identical route on CPU (precision context is a TPU lever); both
    # must sit at the spectrum position for rank 40
    expected = 10 ** (-3 * 40 / 191)
    for sp, err in outs.items():
        assert err < 5 * expected, (sp, err, expected)


class TestFunctionOperator:
    """matvec-only operators (the reference's minimum protocol,
    types.rs:40-51): matmat is derived by vmap over columns (the
    inversion of the reference's per-column loop, types.rs:60-71),
    and everything downstream — fixed-rank, power-iteration, adaptive
    sampling, range-estimate factorizations — flows through."""

    def _op(self, key, m=150, n=100, with_adjoint=True):
        a = rc.random_approximate_low_rank_matrix(key, (m, n), 1.0, 1e-10)
        cm = (lambda x: jnp.conj(a).T @ x) if with_adjoint else None
        return a, rc.FunctionOperator(lambda x: a @ x, (m, n),
                                      dtype=a.dtype, conj_matvec=cm)

    def test_matmat_matches_dense(self, key):
        a, op = self._op(key)
        x = jax.random.normal(jax.random.key(1), (100, 7), a.dtype)
        np.testing.assert_allclose(np.asarray(op.matmat(x)),
                                   np.asarray(a @ x), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(op.conj_matmat(a @ x)),
                                   np.asarray(a.T @ (a @ x)), rtol=1e-5)

    def test_fixed_rank_sampling_matvec_only(self, key):
        # no adjoint required for the plain ranged sampler
        a, op = self._op(key, with_adjoint=False)
        q = rc.sample_range_by_rank(op, jax.random.key(2), 30)
        proj = q @ (jnp.conj(q).T @ a)
        err = float(jnp.linalg.norm(a - proj) / jnp.linalg.norm(a))
        assert err < 5 * 10 ** (-10 * 30 / 99)

    def test_adaptive_sampling_and_range_estimate(self, key):
        a, op = self._op(key)
        q, residuals = rc.sample_range_adaptive(
            op, jax.random.key(3), 1e-5, sample_size=10)
        assert residuals[-1][1] < 1e-5
        svd = rc.SVD.compute_from_range_estimate(q, op)
        rec = svd.to_mat()
        err = float(jnp.linalg.norm(a - rec) / jnp.linalg.norm(a))
        assert err < 5e-5

    def test_power_iteration(self, key):
        a, op = self._op(key)
        q = rc.sample_range_power_iteration(op, jax.random.key(4), 30,
                                            it_count=2)
        proj = q @ (jnp.conj(q).T @ a)
        err = float(jnp.linalg.norm(a - proj) / jnp.linalg.norm(a))
        assert err < 5 * 10 ** (-10 * 30 / 99)

    def test_missing_adjoint_raises_named_error(self, key):
        _, op = self._op(key, with_adjoint=False)
        with pytest.raises(NotImplementedError, match="conj_matvec"):
            op.conj_matmat(jnp.ones((150, 3)))
        with pytest.raises(NotImplementedError, match="conj_matvec"):
            rc.sample_range_adaptive(op, jax.random.key(5), 1e-5,
                                     sample_size=10)


@pytest.mark.parametrize("dtype", DTYPES)
class TestSketchedID:
    """One-read interpolative decompositions (sampling.sketched_*):
    column/row/two-sided IDs built from a single sketch read plus a
    k-column gather. Contracts mirror the reference's ID tests
    (qr.rs:491-582, col_interp_decomp.rs:176-241) — reconstruction
    error against the known spectrum, literal column/row identity
    (bitwise here: C/R are gathers), and entrywise skeleton exactness —
    with the sketched-LS error multiple absorbed into the 5x-class
    gates."""

    def _fixture(self, key, dtype, m=120, n=90):
        a = rc.random_approximate_low_rank_matrix(
            key, (m, n), 1.0, _sigma_min(dtype), dtype=dtype)
        return a

    def test_column_id(self, key, dtype):
        a = self._fixture(key, dtype)
        k = 40
        cid = rc.sketched_column_id(a, jax.random.key(1), rank=k)
        assert cid.c.shape == (120, k) and cid.z.shape == (k, 90)
        # bitwise column identity (stronger than qr.rs:518-524's
        # per-column approximate identity)
        np.testing.assert_array_equal(
            np.asarray(cid.c), np.asarray(a)[:, np.asarray(cid.col_ind[:k])])
        err = float(rc.rel_diff_fro(cid.to_mat(), a))
        opt = _sigma_min(dtype) ** (k / 89)
        assert err < 10 * opt

    def test_row_id(self, key, dtype):
        a = self._fixture(key, dtype)
        k = 40
        rid = rc.sketched_row_id(a, jax.random.key(2), rank=k)
        assert rid.x.shape == (120, k) and rid.r.shape == (k, 90)
        np.testing.assert_array_equal(
            np.asarray(rid.r), np.asarray(a)[np.asarray(rid.row_ind[:k]), :])
        err = float(rc.rel_diff_fro(rid.to_mat(), a))
        opt = _sigma_min(dtype) ** (k / 89)
        assert err < 10 * opt

    def test_two_sided_id(self, key, dtype):
        a = self._fixture(key, dtype)
        k = 40
        ts = rc.sketched_two_sided_id(a, jax.random.key(3), rank=k)
        assert ts.x.shape == (k, k)
        err = float(rc.rel_diff_fro(ts.to_mat(), a))
        opt = _sigma_min(dtype) ** (k / 89)
        assert err < 10 * opt
        # entrywise skeleton contract (two_sided_interp_decomp.rs:9-10;
        # oracle of col_interp_decomp.rs:213-224)
        sk = np.asarray(a)[np.ix_(np.asarray(ts.row_ind[:k]),
                                  np.asarray(ts.col_ind[:k]))]
        tol = 1e-4 if np.dtype(dtype).itemsize <= 8 else 1e-9
        np.testing.assert_allclose(np.asarray(ts.x), sk,
                                   rtol=tol, atol=tol * np.abs(sk).max())

    def test_tolerance_mode(self, key, dtype):
        """tol= picks the rank from the sketch QRCP diagonal (the
        qr.rs:186-200 rule applied to the sketch; VERDICT r4 next #6):
        rank lands at the spectrum crossing and the reconstruction
        meets the 5x-tol-class gate."""
        if dtype in (jnp.complex64, jnp.complex128):
            pytest.skip("complex exercised via the planar route")
        # deep spectrum for f64 (the suite's shared fixture floors at
        # 1e-5, which a 1e-8 tolerance legitimately cannot reach)
        floor = 1e-4 if np.dtype(dtype).itemsize <= 4 else 1e-10
        a = rc.random_approximate_low_rank_matrix(
            key, (120, 90), 1.0, floor, dtype=dtype)
        tol = 1e-2 if np.dtype(dtype).itemsize <= 4 else 1e-8
        ts = rc.sketched_two_sided_id(a, jax.random.key(6), tol=tol)
        # crossing of sigma_i/sigma_0 = floor^(i/89) below tol/2
        # (the tightened cut): i = 89 * log(tol/2) / log(floor)
        import math
        expect = 89 * math.log(0.5 * tol) / math.log(floor)
        assert abs(ts.rank - expect) <= 6, (ts.rank, expect)
        err = float(rc.rel_diff_fro(ts.to_mat(), a))
        assert err < 5 * tol, err
        # skeleton contract survives the tolerance route
        sk = np.asarray(a)[np.ix_(np.asarray(ts.row_ind[:ts.rank]),
                                  np.asarray(ts.col_ind[:ts.rank]))]
        stol = 1e-3 if np.dtype(dtype).itemsize <= 4 else 1e-8
        np.testing.assert_allclose(np.asarray(ts.x), sk, rtol=stol,
                                   atol=stol * np.abs(sk).max())
        # max_rank bounds the sketch width; an unreachable tolerance
        # under that cap raises (qr.rs:198 semantics)
        with pytest.raises(rc.CompressionError):
            rc.sketched_column_id(a, jax.random.key(7), tol=tol,
                                  max_rank=10)

    def test_tolerance_mode_row_id(self, key, dtype):
        if dtype in (jnp.complex64, jnp.complex128):
            pytest.skip("complex exercised via the planar route")
        floor = 1e-4 if np.dtype(dtype).itemsize <= 4 else 1e-10
        a = rc.random_approximate_low_rank_matrix(
            key, (120, 90), 1.0, floor, dtype=dtype)
        tol = 1e-2 if np.dtype(dtype).itemsize <= 4 else 1e-8
        rid = rc.sketched_row_id(a, jax.random.key(8), tol=tol)
        assert float(rc.rel_diff_fro(rid.to_mat(), a)) < 5 * tol

    def test_matrix_free_operator(self, key, dtype):
        """The one-hot gather path: a matvec-only FunctionOperator."""
        a = self._fixture(key, dtype)
        widths: list[int] = []

        def matvec(x):
            return a @ x

        op = rc.FunctionOperator(
            matvec, a.shape, dtype=a.dtype,
            conj_matvec=lambda x: jnp.conj(a).T @ x)
        orig_matmat = type(op).matmat

        def counting_matmat(self_, x):
            widths.append(int(x.shape[1]))
            return orig_matmat(self_, x)

        op.matmat = counting_matmat.__get__(op)
        assert not op.has_cheap_dense()  # matvec-only: no dense view
        k = 30
        cid = rc.sketched_column_id(op, jax.random.key(4), rank=k)
        err = float(rc.rel_diff_fro(cid.to_mat(), a))
        assert err < 10 * _sigma_min(dtype) ** (k / 89)
        # the one-read contract (ADVICE r4): the forward operator is
        # only ever applied at gather width k — never materialized via
        # the derived to_dense (= matmat at full width ncols)
        assert widths and max(widths) <= k, widths

    def test_jit_vmap_clean(self, key, dtype):
        """Static shapes end-to-end: the batched one-read route."""
        from rusty_compression_tpu.parallel.batch import (
            batched_sketched_two_sided_id)

        if dtype in (jnp.complex64, jnp.complex128):
            pytest.skip("batched path exercised for real dtypes")
        ks = jax.random.split(key, 3)
        blocks = jnp.stack([
            self._fixture(ks[i], dtype) for i in range(3)])
        ts = jax.jit(
            lambda b, k_: batched_sketched_two_sided_id(b, k_, rank=24)
        )(blocks, jax.random.key(5))
        from rusty_compression_tpu.parallel.batch import batched_rel_diff_fro
        errs = np.asarray(batched_rel_diff_fro(ts, blocks))
        assert np.all(errs < 10 * _sigma_min(dtype) ** (24 / 89))

    def test_deterministic_under_fixed_key(self, key, dtype):
        a = self._fixture(key, dtype)
        t1 = rc.sketched_two_sided_id(a, jax.random.key(7), rank=20)
        t2 = rc.sketched_two_sided_id(a, jax.random.key(7), rank=20)
        for l1, l2 in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
