"""Tests for factorization containers and the conversion graph.

Mirrors the reference suites (SURVEY.md §4): QR compress by rank/tol
(qr.rs:427-489), column/row ID with per-column/row exactness
(qr.rs:491-582), SVD compress + SVD→QR roundtrip (svd.rs:203-320),
two-sided ID with entrywise skeleton checks
(col_interp_decomp.rs:176-241, row_interp_decomp.rs:176-235) — over the
4-dtype × thin/thick matrix with the geomspace-spectrum fixture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rusty_compression_tpu as rc

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]
SHAPES = [(100, 50), (50, 100)]


def _sigma_min(dtype):
    # f32 can't resolve 1e-10; use a spectrum the dtype can represent.
    return 1e-5 if np.dtype(dtype).itemsize <= 8 else 1e-10



def _expected_tail(shape, dtype, rank):
    """Relative Frobenius error of the optimal rank-`rank` truncation of
    the geomspace-spectrum fixture."""
    k = min(shape)
    s = np.geomspace(1.0, _sigma_min(dtype), k)
    return float(np.sqrt((s[rank:] ** 2).sum() / (s ** 2).sum()))

def _fixture(key, shape, dtype):
    return rc.random_approximate_low_rank_matrix(
        key, shape, 1.0, _sigma_min(dtype), dtype=dtype)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("shape", SHAPES)
class TestQRCompress:
    def test_compress_rank(self, key, dtype, shape):
        """Dims match the rank; reconstruction error ~ sigma_{rank+1}
        (qr.rs:427-457)."""
        a = _fixture(key, shape, dtype)
        rank = 20
        qr = rc.QR.compute_from(a).compress(rc.CompressionType.RANK(rank))
        assert qr.q.shape == (shape[0], rank)
        assert qr.r.shape == (rank, shape[1])
        bound = 5 * _expected_tail(shape, dtype, rank) + 10 * _sigma_min(dtype)
        assert float(rc.rel_diff_fro(qr.to_mat(), a)) < bound

    def test_compress_tolerance(self, key, dtype, shape):
        """rel error < 5*tol and achieved rank < min(m, n)
        (qr.rs:459-489)."""
        a = _fixture(key, shape, dtype)
        tol = 1e-3 if np.dtype(dtype).itemsize <= 8 else 1e-5
        qr = rc.QR.compute_from(a).compress(rc.CompressionType.ADAPTIVE(tol))
        assert float(rc.rel_diff_fro(qr.to_mat(), a)) < 5 * tol
        assert qr.rank < min(shape)

    def test_tolerance_unreachable_raises(self, key, dtype, shape):
        """Spectrum never below tol => CompressionError, not silent
        full rank (qr.rs:196-199)."""
        a = rc.random_gaussian(key, shape, dtype=dtype)  # flat spectrum
        qr = rc.QR.compute_from(a)
        with pytest.raises(rc.CompressionError):
            qr.compress_qr_tolerance(1e-12)

    def test_lq_compress(self, key, dtype, shape):
        a = _fixture(key, shape, dtype)
        rank = 20
        lq = rc.LQ.compute_from(a).compress(rc.CompressionType.RANK(rank))
        assert lq.l.shape == (shape[0], rank)
        assert lq.q.shape == (rank, shape[1])
        bound = 5 * _expected_tail(shape, dtype, rank) + 10 * _sigma_min(dtype)
        assert float(rc.rel_diff_fro(lq.to_mat(), a)) < bound


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("shape", SHAPES)
class TestColumnRowID:
    def test_column_id(self, key, dtype, shape):
        """rel error < 5*tol; per-column identity: C[:, i] equals the
        pivot column of A for i < rank (qr.rs:491-531)."""
        a = _fixture(key, shape, dtype)
        tol = 1e-3 if np.dtype(dtype).itemsize <= 8 else 1e-5
        cid = (rc.QR.compute_from(a)
               .compress(rc.CompressionType.ADAPTIVE(tol))
               .column_id())
        assert float(rc.rel_diff_fro(cid.to_mat(), a)) < 5 * tol
        a_np = np.asarray(a)
        c_np = np.asarray(cid.c)
        ind = np.asarray(cid.col_ind)
        for i in range(cid.rank):
            np.testing.assert_allclose(
                c_np[:, i], a_np[:, ind[i]],
                atol=10 * tol * np.abs(a_np).max())

    def test_row_id(self, key, dtype, shape):
        """Mirror on rows (qr.rs:532-582)."""
        a = _fixture(key, shape, dtype)
        tol = 1e-3 if np.dtype(dtype).itemsize <= 8 else 1e-5
        rid = (rc.LQ.compute_from(a)
               .compress(rc.CompressionType.ADAPTIVE(tol))
               .row_id())
        assert float(rc.rel_diff_fro(rid.to_mat(), a)) < 5 * tol
        a_np = np.asarray(a)
        r_np = np.asarray(rid.r)
        ind = np.asarray(rid.row_ind)
        for i in range(rid.rank):
            np.testing.assert_allclose(
                r_np[i, :], a_np[ind[i], :],
                atol=10 * tol * np.abs(a_np).max())

    def test_column_id_full_rank_exact(self, key, dtype, shape):
        """Uncompressed QR -> column_id is exact: C Z == A
        (qr.rs:274-281)."""
        a = rc.random_gaussian(key, (24, 24), dtype=dtype)
        cid = rc.QR.compute_from(a).column_id()
        atol = 1e-4 if np.dtype(dtype).itemsize <= 8 else 1e-10
        np.testing.assert_allclose(
            np.asarray(cid.to_mat()), np.asarray(a), atol=atol)

    def test_factored_apply(self, key, dtype, shape):
        """Apply through the factored form matches dense to_mat @ x
        (col_interp_decomp.rs:134-154)."""
        a = _fixture(key, shape, dtype)
        cid = (rc.QR.compute_from(a)
               .compress(rc.CompressionType.RANK(15)).column_id())
        x = rc.random_gaussian(jnp.asarray(key), (shape[1], 3), dtype=dtype)
        np.testing.assert_allclose(
            np.asarray(cid.apply(x)), np.asarray(cid.to_mat() @ x),
            atol=1e-4 if np.dtype(dtype).itemsize <= 8 else 1e-10)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("shape", SHAPES)
class TestTwoSidedID:
    def _check(self, a, tsid, tol):
        """Oracle of col_interp_decomp.rs:176-241: reconstruction, X is
        square rank x rank, and X entrywise equals the skeleton submatrix
        A[row_ind, col_ind]."""
        assert float(rc.rel_diff_fro(tsid.to_mat(), a)) < 5 * tol
        k = tsid.rank
        assert tsid.x.shape == (k, k)
        a_np = np.asarray(a)
        x_np = np.asarray(tsid.x)
        rind = np.asarray(tsid.row_ind)[:k]
        cind = np.asarray(tsid.col_ind)[:k]
        skel = a_np[np.ix_(rind, cind)]
        np.testing.assert_allclose(
            x_np, skel, atol=10 * tol * np.abs(skel).max())

    def test_via_column_id(self, key, dtype, shape):
        a = _fixture(key, shape, dtype)
        tol = 1e-3 if np.dtype(dtype).itemsize <= 8 else 1e-5
        tsid = (rc.QR.compute_from(a)
                .compress(rc.CompressionType.ADAPTIVE(tol))
                .column_id().two_sided_id())
        self._check(a, tsid, tol)

    def test_via_row_id(self, key, dtype, shape):
        a = _fixture(key, shape, dtype)
        tol = 5e-4 if np.dtype(dtype).itemsize <= 8 else 1e-5
        tsid = (rc.LQ.compute_from(a)
                .compress(rc.CompressionType.ADAPTIVE(tol))
                .row_id().two_sided_id())
        self._check(a, tsid, tol)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("shape", SHAPES)
class TestSVD:
    def test_compress_rank(self, key, dtype, shape):
        a = _fixture(key, shape, dtype)
        svd = rc.SVD.compute_from(a).compress(rc.CompressionType.RANK(20))
        assert svd.u.shape == (shape[0], 20)
        assert svd.vt.shape == (20, shape[1])
        bound = 2 * _expected_tail(shape, dtype, 20) + 10 * _sigma_min(dtype)
        assert float(rc.rel_diff_fro(svd.to_mat(), a)) < bound

    def test_compress_tolerance(self, key, dtype, shape):
        a = _fixture(key, shape, dtype)
        tol = 1e-3 if np.dtype(dtype).itemsize <= 8 else 1e-5
        svd = rc.SVD.compute_from(a).compress(rc.CompressionType.ADAPTIVE(tol))
        assert float(rc.rel_diff_fro(svd.to_mat(), a)) < 5 * tol

    def test_tolerance_unreachable_raises(self, key, dtype, shape):
        a = rc.random_gaussian(key, shape, dtype=dtype)
        with pytest.raises(rc.CompressionError):
            rc.SVD.compute_from(a).compress_svd_tolerance(1e-14)

    def test_to_qr_roundtrip(self, key, dtype, shape):
        """SVD -> QR -> to_mat reproduces A (svd.rs:203-298):
        1e-5 (f32) / 1e-12 (f64)."""
        a = _fixture(key, shape, dtype)
        qr = rc.SVD.compute_from(a).to_qr()
        tol = 1e-4 if np.dtype(dtype).itemsize <= 8 else 1e-11
        assert float(rc.rel_diff_fro(qr.to_mat(), a)) < tol


class TestPytreeIntegration:
    """Containers must pass through jit/vmap (the batched-block path)."""

    def test_qr_through_jit(self, key):
        import jax

        a = rc.random_gaussian(key, (32, 16), dtype=jnp.float64)

        @jax.jit
        def roundtrip(qr: rc.QR):
            return qr.to_mat()

        qr = rc.QR.compute_from(a)
        np.testing.assert_allclose(
            np.asarray(roundtrip(qr)), np.asarray(a), atol=1e-10)

    def test_svd_vmap(self, key):
        import jax

        blocks = rc.random_gaussian(key, (4, 24, 16), dtype=jnp.float64)
        svds = jax.vmap(lambda b: rc.SVD.compute_from(b))(blocks)
        assert svds.u.shape == (4, 24, 16)
        recon = jax.vmap(lambda s: s.to_mat())(svds)
        np.testing.assert_allclose(
            np.asarray(recon), np.asarray(blocks), atol=1e-10)


class TestFactoredOperator:
    """Factorization containers as matrix-free operators (the reference's
    Apply impls, col_interp_decomp.rs:134-154)."""

    def test_recompress_two_sided_id_matrix_free(self, key):
        import jax
        a = rc.random_approximate_low_rank_matrix(key, (200, 150), 1.0,
                                                  1e-10)
        tsid = rc.QR.compute_from(a, max_rank=60).column_id().two_sided_id()
        op = rc.as_linear_operator(tsid)
        assert op.shape == (200, 150)
        x = jnp.linspace(0, 1, 150 * 3).reshape(150, 3)
        np.testing.assert_allclose(np.asarray(op.matmat(x)),
                                   np.asarray(tsid.to_mat() @ x), atol=1e-10)
        # recompress the rank-60 factored form to rank 20, never dense
        svd, _ = rc.randomized_adaptive_svd(op, jax.random.key(1),
                                            rel_tol=1e-3, sample_size=10)
        err = float(rc.rel_diff_fro(svd.to_mat(), a))
        assert err < 5e-3

    def test_svd_container_as_operator(self, key):
        a = rc.random_approximate_low_rank_matrix(key, (80, 60), 1.0, 1e-10)
        svd = rc.SVD.compute_from(a)
        op = rc.as_linear_operator(svd)
        y = jnp.linspace(-1, 1, 80 * 2).reshape(80, 2)
        np.testing.assert_allclose(np.asarray(op.conj_matmat(y)),
                                   np.asarray(rc.utils_herm(a) @ y
                                              if hasattr(rc, 'utils_herm')
                                              else np.conj(np.asarray(a)).T @ np.asarray(y)),
                                   atol=1e-10)

    def test_rejects_non_container(self):
        from rusty_compression_tpu.linop import FactoredOperator
        with pytest.raises(TypeError, match="not a factorization container"):
            FactoredOperator(object())


class TestOperatorCombinators:
    """Matrix-free operator algebra (composite/sum/scaled/adjoint)."""

    def test_composite_compression(self, key):
        import jax
        k1, k2 = jax.random.split(key)
        b = rc.random_approximate_low_rank_matrix(k1, (80, 40), 1.0, 1e-8)
        c = rc.random_approximate_low_rank_matrix(k2, (40, 60), 1.0, 1e-8)
        op = rc.as_linear_operator(b) @ rc.as_linear_operator(c)
        dense = np.asarray(b) @ np.asarray(c)
        assert op.shape == (80, 60)
        svd = rc.nystrom_svd(op, jax.random.key(3), k=25)
        assert float(rc.rel_diff_fro(svd.to_mat(), dense)) < 1e-6

    def test_sum_scaled_adjoint(self, key):
        import jax
        b = rc.random_gaussian(key, (30, 20))
        B = rc.as_linear_operator(b)
        x = np.asarray(rc.random_gaussian(jax.random.key(1), (20, 4)))
        y = np.asarray(rc.random_gaussian(jax.random.key(2), (30, 4)))
        bn = np.asarray(b)
        np.testing.assert_allclose(np.asarray((B + B).matmat(x)),
                                   2 * bn @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray((3.0 * B).conj_matmat(y)),
                                   3 * bn.T @ y, atol=1e-12)
        np.testing.assert_allclose(np.asarray(B.H.matmat(y)), bn.T @ y,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(B.H.H.matmat(x)), bn @ x,
                                   atol=1e-12)

    def test_combinators_jit_and_sample(self, key):
        import jax
        b = rc.random_approximate_low_rank_matrix(key, (60, 60), 1.0, 1e-8)
        op = 0.5 * (rc.as_linear_operator(b) + rc.as_linear_operator(b))
        q = rc.range_finder(op, jax.random.key(1), 20, power_iters=1)
        bn = np.asarray(b)
        qn = np.asarray(q)
        resid = np.linalg.norm(bn - qn @ (qn.T @ bn)) / np.linalg.norm(bn)
        assert resid < 1e-2

    def test_shape_mismatch_rejected(self, key):
        b = rc.as_linear_operator(rc.random_gaussian(key, (8, 4)))
        with pytest.raises(ValueError, match="cannot compose"):
            _ = b @ b
        with pytest.raises(ValueError, match="shape mismatch"):
            _ = b + b.H


class TestSparseOperator:
    def test_products_exact(self, key):
        import jax
        from jax.experimental import sparse as jsparse
        rng = np.random.default_rng(0)
        dense = np.zeros((60, 40))
        idx = rng.integers(0, [60, 40], (120, 2))
        dense[idx[:, 0], idx[:, 1]] = rng.standard_normal(120)
        op = rc.SparseOperator(jsparse.BCOO.fromdense(jnp.asarray(dense)))
        x = rng.standard_normal((40, 3))
        y = rng.standard_normal((60, 3))
        np.testing.assert_allclose(np.asarray(op.matmat(jnp.asarray(x))),
                                   dense @ x, atol=1e-12)
        np.testing.assert_allclose(np.asarray(op.conj_matmat(jnp.asarray(y))),
                                   dense.T @ y, atol=1e-12)

    def test_sparse_plus_lowrank_compression(self, key):
        """Sparse near-field + low-rank far-field: the sum compresses to
        the far-field rank when the near-field is below tolerance."""
        import jax
        rng = np.random.default_rng(1)
        n = 120
        near = np.zeros((n, n))
        idx = rng.integers(0, n, (200, 2))
        near[idx[:, 0], idx[:, 1]] = 1e-9 * rng.standard_normal(200)
        far = rc.SVD.compute_from(rc.random_approximate_low_rank_matrix(
            key, (n, n), 1.0, 1e-12)).compress_svd_rank(12)
        op = rc.SparseOperator(jnp.asarray(near)) + rc.as_linear_operator(far)
        q, hist = rc.sample_range_adaptive(op, jax.random.key(2), 1e-5, 6)
        assert q.shape[1] <= 24  # far-field rank + slack, not full n
        dense = near + np.asarray(far.to_mat())
        qn = np.asarray(q)
        resid = np.linalg.norm(dense - qn @ (qn.T @ dense)) / \
            np.linalg.norm(dense)
        assert resid < 1e-4


class TestToleranceEnvelope:
    """Tolerance truncation over non-monotone diagonals (VERDICT r1 #5).

    Blocked randomized-pivot RRQR guarantees only *approximately*
    non-increasing |r_ii| (ops/pivoted_qr.py); the tolerance scan must
    use the suffix-max envelope so a transient dip cannot truncate
    early. Reference contract: qr.rs:186-200 (first crossing on a
    monotone diagonal — identical under the envelope).
    """

    def test_transient_dip_does_not_truncate(self):
        d = np.array([1.0, 0.5, 1e-9, 0.3, 0.1, 1e-9, 1e-10])
        k = d.size
        qr = rc.QR(jnp.eye(k), jnp.diag(jnp.asarray(d)),
                   jnp.arange(k, dtype=jnp.int32))
        out = qr.compress(rc.CompressionType.ADAPTIVE(1e-6))
        assert out.rank == 5  # not 2 (the dip)

    def test_monotone_matches_reference_scan(self):
        d = np.array([1.0, 0.5, 0.1, 1e-7, 1e-8])
        qr = rc.QR(jnp.eye(5), jnp.diag(jnp.asarray(d)),
                   jnp.arange(5, dtype=jnp.int32))
        assert qr.compress(rc.CompressionType.ADAPTIVE(1e-6)).rank == 3

    def test_lq_envelope(self):
        d = np.array([1.0, 1e-9, 0.4, 1e-9, 1e-9])
        lq = rc.LQ(jnp.diag(jnp.asarray(d)), jnp.eye(5),
                   jnp.arange(5, dtype=jnp.int32))
        assert lq.compress(rc.CompressionType.ADAPTIVE(1e-6)).rank == 3

    def test_blocked_qr_stairstep_matches_gs_rank(self):
        # Stair-step spectrum: plateaus tempt blocked pivoting into
        # locally non-monotone diagonals. The ADAPTIVE cut must agree
        # with the exact sequential (gs) pivoting within one block.
        key = jax.random.PRNGKey(11)
        m, n, blk = 256, 256, 32
        steps = np.repeat([1.0, 1e-2, 1e-4, 1e-6, 1e-9], [8, 24, 32, 32, 160])
        ku, kv = jax.random.split(key)
        u = rc.random_orthogonal_matrix(ku, (m, m))[:, :n]
        vt = rc.random_orthogonal_matrix(kv, (n, n))
        a = (u * jnp.asarray(steps, u.dtype)[None, :]) @ vt
        tol = 1e-5
        rank_gs = (rc.QR.compute_from(a, max_rank=128, mode="gs")
                   .compress(rc.CompressionType.ADAPTIVE(tol)).rank)
        rank_blk = (rc.QR.compute_from(a, max_rank=128, mode="blocked",
                                       block_size=blk)
                    .compress(rc.CompressionType.ADAPTIVE(tol)).rank)
        assert abs(rank_blk - rank_gs) <= blk


class TestMaskedTolerance:
    """In-jit masked tolerance compression (VERDICT r1 missing #3).

    The host API slices (dynamic shapes, qr.rs:186-200); these variants
    return (rank, masked factors, ok) with static shapes so tolerance
    truncation composes with jit/vmap — the SURVEY §7 mask-and-pad
    discipline.
    """

    def test_qr_masked_matches_host_compress(self):
        a = _fixture(jax.random.PRNGKey(0), (80, 60), jnp.float64)
        qr = rc.QR.compute_from(a)
        tol = 1e-3  # fixture spectrum floors at _sigma_min = 1e-5
        host = qr.compress(rc.CompressionType.ADAPTIVE(tol))
        rank, masked, ok = jax.jit(
            lambda q: q.compress_qr_tolerance_masked(tol))(qr)
        assert bool(ok)
        assert int(rank) == host.rank
        np.testing.assert_allclose(np.asarray(masked.to_mat()),
                                   np.asarray(host.to_mat()),
                                   rtol=0, atol=1e-12)

    def test_qr_masked_unreachable_flag(self):
        a = _fixture(jax.random.PRNGKey(1), (40, 30), jnp.float64)
        qr = rc.QR.compute_from(a)
        rank, _, ok = jax.jit(
            lambda q: q.compress_qr_tolerance_masked(1e-30))(qr)
        assert not bool(ok)
        assert int(rank) == qr.rank

    def test_lq_masked(self):
        a = _fixture(jax.random.PRNGKey(2), (30, 50), jnp.float64)
        lq = rc.LQ.compute_from(a)
        tol = 1e-3
        host = lq.compress(rc.CompressionType.ADAPTIVE(tol))
        rank, masked, ok = jax.jit(
            lambda x: x.compress_lq_tolerance_masked(tol))(lq)
        assert bool(ok) and int(rank) == host.rank
        np.testing.assert_allclose(np.asarray(masked.to_mat()),
                                   np.asarray(host.to_mat()),
                                   rtol=0, atol=1e-12)

    def test_svd_masked_batched_on_device(self):
        # Batched tolerance truncation that never leaves device: vmap
        # over blocks with per-block achieved ranks.
        keys = jax.random.split(jax.random.PRNGKey(3), 4)
        blocks = jnp.stack([_fixture(k, (48, 40), jnp.float64)
                            for k in keys])

        @jax.jit
        @jax.vmap
        def run(a):
            svd = rc.SVD.compute_from(a)
            rank, masked, ok = svd.compress_svd_tolerance_masked(1e-4)
            return rank, masked.to_mat(), ok

        ranks, mats, oks = run(blocks)
        assert bool(jnp.all(oks))
        for i in range(4):
            host = (rc.SVD.compute_from(blocks[i])
                    .compress(rc.CompressionType.ADAPTIVE(1e-4)))
            assert int(ranks[i]) == host.rank
            np.testing.assert_allclose(np.asarray(mats[i]),
                                       np.asarray(host.to_mat()),
                                       rtol=0, atol=1e-12)
