"""Standard-class complex containers with an all-real device (planarc).

The reference instantiates every container for c32/c64 via macros over
LAPACK z-kernels (qr.rs:408-416, col_interp_decomp.rs:158-161); planarc
reaches the same contracts on complex-rejecting backends through the
(2m, 2n) realification + host complex recovery. Contracts mirrored from
the reference's own tests: reconstruction error vs the known spectrum,
per-column exactness of C (qr.rs:518-524), entrywise skeleton identity
(col_interp_decomp.rs:213-224), dtype x thin/thick sweep.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rusty_compression_tpu as rc
from rusty_compression_tpu.utils.errors import CompressionError

DTYPES = [jnp.complex64, jnp.complex128]
SHAPES = [(120, 80), (80, 120)]  # thin / thick (the reference's sweep)


def fixture(key, shape, dtype):
    a = rc.random_approximate_low_rank_matrix(key, shape, 1.0, 1e-10,
                                              dtype=dtype)
    return np.asarray(jax.device_get(a))


def spectrum_err(shape, k):
    # geomspace fixture: sigma_i = 10^(-10 i / (min-1))
    return 10.0 ** (-10.0 * k / (min(shape) - 1))


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("shape", SHAPES)
class TestPlanarRSVD:
    def test_rank_truncation(self, key, shape, dtype):
        a = fixture(key, shape, dtype)
        k = 30
        svd = rc.planar_rsvd(a, jax.random.key(1), rank=k)
        assert svd.rank == k
        rec = np.asarray(svd.u) @ (np.asarray(svd.s)[:, None]
                                   * np.asarray(svd.vt))
        err = np.linalg.norm(rec - a) / np.linalg.norm(a)
        assert err < 10 * spectrum_err(shape, k), err
        # factors host-resident in the input's complex dtype
        assert isinstance(svd.u, np.ndarray)
        assert svd.u.dtype == np.dtype(dtype)
        # left factor orthonormal at the f32 class
        g = svd.u.conj().T @ svd.u
        assert np.abs(g - np.eye(k)).max() < 1e-4

    def test_tolerance_truncation(self, key, shape, dtype):
        a = fixture(key, shape, dtype)
        tol = 1e-4
        svd = rc.planar_rsvd(a, jax.random.key(2), rank=48, tol=tol)
        # crossing at 0.4 * (min - 1)
        expect = int(np.ceil(0.4 * (min(shape) - 1)))
        assert abs(svd.rank - expect) <= 2, (svd.rank, expect)
        rec = np.asarray(svd.u) @ (np.asarray(svd.s)[:, None]
                                   * np.asarray(svd.vt))
        err = np.linalg.norm(rec - a) / np.linalg.norm(a)
        assert err < 5 * tol

    def test_unreachable_tolerance_raises(self, key, shape, dtype):
        rng = np.random.default_rng(3)
        q, _ = np.linalg.qr(rng.standard_normal((80, 80))
                            + 1j * rng.standard_normal((80, 80)))
        flat = (q * np.linspace(1.0, 0.5, 80)) @ q.conj().T
        with pytest.raises(CompressionError):
            rc.planar_rsvd(flat.astype(dtype), jax.random.key(3),
                           rank=40, tol=1e-10)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("shape", SHAPES)
class TestPlanarIDs:
    def test_column_id_exact_columns(self, key, shape, dtype):
        a = fixture(key, shape, dtype)
        k = 30
        cid = rc.planar_column_id(a, jax.random.key(4), rank=k)
        assert cid.rank == k
        # per-column identity (qr.rs:518-524): C is an EXACT slice
        c = np.asarray(cid.c)
        ind = np.asarray(cid.col_ind)
        np.testing.assert_array_equal(c, a[:, ind[:k]].astype(c.dtype))
        rec = np.asarray(cid.to_mat())
        err = np.linalg.norm(rec - a) / np.linalg.norm(a)
        assert err < 50 * spectrum_err(shape, k), err

    def test_row_id(self, key, shape, dtype):
        a = fixture(key, shape, dtype)
        k = 30
        rid = rc.planar_row_id(a, jax.random.key(5), rank=k)
        assert rid.rank == k
        r = np.asarray(rid.r)
        ind = np.asarray(rid.row_ind)
        np.testing.assert_array_equal(r, a[ind[:k], :].astype(r.dtype))
        rec = np.asarray(rid.to_mat())
        err = np.linalg.norm(rec - a) / np.linalg.norm(a)
        assert err < 50 * spectrum_err(shape, k), err

    def test_two_sided_id_skeleton(self, key, shape, dtype):
        a = fixture(key, shape, dtype)
        k = 30
        ts = rc.planar_two_sided_id(a, jax.random.key(6), rank=k)
        assert ts.rank == k
        assert np.asarray(ts.x).shape == (k, k)
        # entrywise skeleton identity to the f32 class
        # (col_interp_decomp.rs:213-224 contract)
        skel = a[np.ix_(np.asarray(ts.row_ind)[:k],
                        np.asarray(ts.col_ind)[:k])]
        denom = max(np.abs(skel).max(), 1e-30)
        assert np.abs(np.asarray(ts.x) - skel).max() / denom < 1e-3
        rec = np.asarray(ts.to_mat())
        err = np.linalg.norm(rec - a) / np.linalg.norm(a)
        assert err < 100 * spectrum_err(shape, k), err


def test_capture_residual_f32_class(key):
    a = fixture(key, (150, 100), jnp.complex64)
    qc, b = rc.planar_range_capture(a, jax.random.key(7), 40)
    # A ~= Qc B at the f32 class; Qc complex-orthonormal to c128 QR
    err = np.linalg.norm(qc @ b - a) / np.linalg.norm(a)
    # bound: max(f32 floor, spectrum position at the complex rank 40
    # = 10^(-10*40/99) ~ 9e-5); measured ~1.3e-5
    assert err < 1e-4, err
    g = qc.conj().T @ qc
    assert np.abs(g - np.eye(qc.shape[1])).max() < 1e-12


def test_all_factors_host_numpy(key):
    """The whole point: nothing complex ever becomes a device array.
    All returned complex factors are host numpy."""
    a = fixture(key, (90, 70), jnp.complex64)
    ts = rc.planar_two_sided_id(a, jax.random.key(8), rank=20)
    for leaf in (ts.c, ts.x, ts.r):
        assert isinstance(leaf, np.ndarray), type(leaf)
    svd = rc.planar_rsvd(a, jax.random.key(9), rank=20)
    for leaf in (svd.u, svd.s, svd.vt):
        assert isinstance(leaf, np.ndarray), type(leaf)


def test_over_deep_rank_clamps_to_numerical_rank(key):
    """A rank request past the f32 capture floor must clamp (the
    reference clamps max_rank to available rank, qr.rs:172-174) instead
    of solving against noise-level diagonals and returning garbage."""
    a = fixture(key, (120, 80), jnp.complex64)  # sigma to 1e-10 over 80
    cid = rc.planar_column_id(a, jax.random.key(10), rank=70)
    assert cid.rank < 70  # sigma(70) ~ 10^-8.9 — below the f32 floor
    rec = np.asarray(cid.to_mat())
    err = np.linalg.norm(rec - a) / np.linalg.norm(a)
    assert err < 1e-3, err  # sane, not the 0.9-class garbage
    ts = rc.planar_two_sided_id(a, jax.random.key(11), rank=70)
    err2 = np.linalg.norm(np.asarray(ts.to_mat()) - a) / np.linalg.norm(a)
    assert err2 < 1e-3, err2
