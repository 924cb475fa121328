"""High-accuracy interpolative decompositions (tol <= 1e-8 class).

The reference runs its flagship ID example natively in f64
(examples/interpolative_decomposition.rs:22-48, container math
qr.rs:270-309); highacc_id.py reaches the same class from bf16/f32
hardware via the Ozaki capture + host f64 core pivoting. All oracles
here are evaluated in numpy f64 (the factors' native form).
"""

import jax
import numpy as np
import pytest

from rusty_compression_tpu.highacc_id import (
    refined_column_id, refined_row_id, refined_two_sided_id)
from rusty_compression_tpu.models.interp_decomp import (
    ColumnID, RowID, TwoSidedID)
from rusty_compression_tpu.utils.errors import CompressionError


def decaying_matrix(seed, m, n, decay_rank=100, floor=1e-12, complex_=False):
    """Spectrum 10^(-10 i/(decay_rank-1)) with a flat floor — crosses
    1e-8 at i = 0.8 (decay_rank-1)."""
    rng = np.random.default_rng(seed)
    k = min(m, n)
    sig = np.maximum(10 ** (-10 * np.arange(k) / (decay_rank - 1)), floor)
    if complex_:
        u, _ = np.linalg.qr(rng.standard_normal((m, k))
                            + 1j * rng.standard_normal((m, k)))
        v, _ = np.linalg.qr(rng.standard_normal((n, k))
                            + 1j * rng.standard_normal((n, k)))
        return (u * sig) @ v.conj().T
    u, _ = np.linalg.qr(rng.standard_normal((m, k)))
    v, _ = np.linalg.qr(rng.standard_normal((n, k)))
    return (u * sig) @ v.T


def rel_fro(x, a):
    return float(np.linalg.norm(x - a) / np.linalg.norm(a))


TOL = 1e-8


class TestRefinedColumnID:
    def test_reaches_1e8_class(self):
        a = decaying_matrix(0, 384, 512)
        cid = refined_column_id(a, jax.random.PRNGKey(0), tol=TOL)
        assert isinstance(cid, ColumnID)
        assert rel_fro(cid.c @ cid.z, a) <= 5 * TOL
        # rank lands at the spectrum's 1e-8 crossing (i = 80); QRCP
        # diagonals cross a few indices after the singular values (the
        # reference's diag-based truncation shares this, qr.rs:190-194)
        assert 78 <= cid.rank <= 88

    def test_columns_bitwise_exact(self):
        # C holds verbatim columns of A — stronger than the reference's
        # f64-rounded C = Q R11 (qr.rs:287-288); the per-column oracle
        # of qr.rs:518-524 holds exactly.
        a = decaying_matrix(1, 256, 320)
        cid = refined_column_id(a, jax.random.PRNGKey(1), tol=TOL)
        ind = np.asarray(cid.col_ind)
        for j in range(cid.rank):
            np.testing.assert_array_equal(np.asarray(cid.c)[:, j],
                                          a[:, ind[j]])

    def test_fixed_rank_mode(self):
        a = decaying_matrix(2, 300, 400, decay_rank=60)
        cid = refined_column_id(a, jax.random.PRNGKey(2), rank=40)
        assert cid.rank == 40
        # optimal rank-40 error is sigma_41 ~ 10^(-10*40/59) ~ 1.7e-7
        s = np.linalg.svd(a, compute_uv=False)
        e_opt = np.sqrt((s[40:] ** 2).sum()) / np.sqrt((s ** 2).sum())
        assert rel_fro(cid.c @ cid.z, a) <= 10 * e_opt

    def test_unreachable_tolerance_raises(self):
        rng = np.random.default_rng(3)
        q, _ = np.linalg.qr(rng.standard_normal((96, 96)))
        a = q @ np.diag(np.linspace(1.0, 0.5, 96)) @ q.T
        with pytest.raises(CompressionError):
            refined_column_id(a, jax.random.PRNGKey(3), tol=1e-10)

    def test_complex_c128(self):
        a = decaying_matrix(4, 200, 260, complex_=True)
        cid = refined_column_id(a, jax.random.PRNGKey(4), tol=TOL)
        assert cid.c.dtype == np.complex128
        assert rel_fro(cid.c @ cid.z, a) <= 5 * TOL
        ind = np.asarray(cid.col_ind)
        for j in range(min(cid.rank, 8)):
            np.testing.assert_array_equal(np.asarray(cid.c)[:, j],
                                          a[:, ind[j]])


class TestRefinedRowID:
    def test_reaches_1e8_class(self):
        a = decaying_matrix(5, 512, 384)
        rid = refined_row_id(a, jax.random.PRNGKey(5), tol=TOL)
        assert isinstance(rid, RowID)
        assert rel_fro(rid.x @ rid.r, a) <= 5 * TOL
        ind = np.asarray(rid.row_ind)
        for i in range(rid.rank):
            np.testing.assert_array_equal(np.asarray(rid.r)[i, :],
                                          a[ind[i], :])

    def test_complex_adjoint_convention(self):
        a = decaying_matrix(6, 180, 220, complex_=True, decay_rank=50)
        rid = refined_row_id(a, jax.random.PRNGKey(6), tol=1e-6)
        assert rel_fro(rid.x @ rid.r, a) <= 5e-6


class TestRefinedTwoSidedID:
    @pytest.mark.parametrize("side", ["col", "row"])
    def test_reaches_1e8_class(self, side):
        a = decaying_matrix(7, 400, 320)
        ts = refined_two_sided_id(a, jax.random.PRNGKey(7), tol=TOL,
                                  side=side)
        assert isinstance(ts, TwoSidedID)
        assert rel_fro(ts.c @ (ts.x @ ts.r), a) <= 10 * TOL
        assert 78 <= ts.rank <= 88

    @pytest.mark.parametrize("side", ["col", "row"])
    def test_skeleton_bitwise_exact(self, side):
        # X == A[row_ind[:k], col_ind[:k]] entrywise-EXACT (the
        # reference's oracle allows 10*tol relative,
        # col_interp_decomp.rs:213-224; verbatim extraction is bitwise)
        a = decaying_matrix(8, 260, 300, decay_rank=60)
        ts = refined_two_sided_id(a, jax.random.PRNGKey(8), tol=1e-7,
                                  side=side)
        ri = np.asarray(ts.row_ind)[:ts.rank]
        ci = np.asarray(ts.col_ind)[:ts.rank]
        np.testing.assert_array_equal(np.asarray(ts.x), a[ri[:, None], ci])

    def test_complex(self):
        a = decaying_matrix(9, 220, 180, complex_=True)
        ts = refined_two_sided_id(a, jax.random.PRNGKey(9), tol=TOL)
        assert rel_fro(ts.c @ (ts.x @ ts.r), a) <= 10 * TOL

    def test_fixed_rank(self):
        a = decaying_matrix(10, 256, 256, decay_rank=60)
        ts = refined_two_sided_id(a, jax.random.PRNGKey(10), rank=30)
        assert ts.rank == 30
        s = np.linalg.svd(a, compute_uv=False)
        e_opt = np.sqrt((s[30:] ** 2).sum()) / np.sqrt((s ** 2).sum())
        assert rel_fro(ts.c @ (ts.x @ ts.r), a) <= 20 * e_opt

    def test_bad_side_raises(self):
        a = decaying_matrix(11, 64, 64, decay_rank=20)
        with pytest.raises(ValueError):
            refined_two_sided_id(a, jax.random.PRNGKey(11), rank=10,
                                 side="diag")


class TestReferenceExampleParity:
    def test_interpolative_decomposition_rs(self):
        # The reference example (interpolative_decomposition.rs:22-48):
        # 500x100 synthetic low-rank (sigma 1 -> 1e-10 geomspace over
        # min dim), two-sided ID at rank 20; its f64 run reports
        # rel_diff_fro ~ sigma_21/||A|| class. Here: same fixture
        # semantics, rank 20, f64-class gate.
        rng = np.random.default_rng(42)
        mdim, ndim, k = 500, 100, 20
        sig = np.geomspace(1.0, 1e-10, ndim)
        u, _ = np.linalg.qr(rng.standard_normal((mdim, ndim)))
        v, _ = np.linalg.qr(rng.standard_normal((ndim, ndim)))
        a = (u * sig) @ v.T
        ts = refined_two_sided_id(a, jax.random.PRNGKey(42), rank=k)
        err = rel_fro(ts.c @ (ts.x @ ts.r), a)
        # optimal rank-20 error: sqrt(sum sigma_i^2, i>20)/||A||
        e_opt = np.sqrt((sig[k:] ** 2).sum()) / np.sqrt((sig ** 2).sum())
        assert err <= 10 * e_opt
        np.testing.assert_array_equal(
            np.asarray(ts.x),
            a[np.asarray(ts.row_ind)[:k][:, None],
              np.asarray(ts.col_ind)[:k]])
