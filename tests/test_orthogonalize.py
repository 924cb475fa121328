"""Tests for the Cholesky-QR orthonormalization kernels and the HMT
fast-path range finder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rusty_compression_tpu as rc

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]


def ortho_err(q):
    k = q.shape[1]
    return float(np.linalg.norm(
        np.conj(q.T) @ q - np.eye(k), ord="fro"))


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("method", ["qr", "cholqr2", "scholqr3"])
def test_orthonormalize_well_conditioned(key, dtype, method):
    y = rc.random_gaussian(key, (200, 40), dtype=dtype)
    q = rc.orthonormalize(y, method)
    assert q.shape == (200, 40)
    tol = 1e-4 if np.finfo(np.dtype(dtype).char.lower() == 'f' and np.float32
                           or np.float64).eps > 1e-10 else 1e-12
    eps = np.finfo(np.real(np.zeros(1, dtype)).dtype).eps
    assert ortho_err(np.asarray(q)) < 100 * eps * 40
    # q spans the same space as y: projection reproduces y
    y_np, q_np = np.asarray(y), np.asarray(q)
    err = np.linalg.norm(q_np @ (np.conj(q_np.T) @ y_np) - y_np)
    assert err < 1e-3 * np.linalg.norm(y_np) * (eps / np.finfo(np.float64).eps
                                                if eps > 1e-10 else 1)


@pytest.mark.parametrize("method", ["scholqr3", "qr"])
def test_orthonormalize_ill_conditioned(key, method):
    """scholqr3 must survive cond(Y) far beyond cholqr2's breakdown."""
    m, l = 300, 30
    k1, k2 = jax.random.split(key)
    u = rc.random_orthogonal_matrix(k1, (m, l))
    v = rc.random_orthogonal_matrix(k2, (l, l))
    sigma = jnp.geomspace(1.0, 1e-12, l)  # cond = 1e12 in f64
    y = u @ (sigma[:, None] * v)
    q = rc.orthonormalize(y, method)
    assert ortho_err(np.asarray(q)) < 1e-10


@pytest.mark.parametrize("dtype", DTYPES)
def test_cholesky_qr2_factorization(key, dtype):
    """Q R must reproduce Y with R upper triangular."""
    y = rc.random_gaussian(key, (120, 25), dtype=dtype)
    q, r = rc.cholesky_qr2(y)
    eps = np.finfo(np.real(np.zeros(1, dtype)).dtype).eps
    np.testing.assert_allclose(np.asarray(q @ r), np.asarray(y),
                               atol=1e3 * eps)
    assert np.allclose(np.asarray(r), np.triu(np.asarray(r)))


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
def test_range_finder_accuracy(key, dtype):
    a = rc.random_approximate_low_rank_matrix(key, (150, 90), 1.0, 1e-10,
                                              dtype=dtype)
    for ortho in ("qr", "scholqr3"):
        q = rc.range_finder(a, jax.random.key(1), 40, power_iters=1,
                            ortho=ortho)
        assert q.shape == (150, 40)
        a_np, q_np = np.asarray(a), np.asarray(q)
        resid = a_np - q_np @ (np.conj(q_np.T) @ a_np)
        rel = np.linalg.norm(resid) / np.linalg.norm(a_np)
        # sigma_41 of the geomspace spectrum over 90 points
        assert rel < 10 * 10.0 ** (-10.0 * 40 / 89)


def test_range_finder_matches_rsvd_quality(key):
    """rsvd through the fast path meets the HMT bound."""
    from rusty_compression_tpu.parallel.batch import rsvd_block

    a = rc.random_approximate_low_rank_matrix(key, (200, 120), 1.0, 1e-10)
    svd = rsvd_block(a, jax.random.key(2), rank=30, oversample=10,
                     power_iters=1)
    err = float(rc.rel_diff_fro(svd.to_mat(), a))
    sigma_next = 10.0 ** (-10.0 * 30 / 119)
    assert err < 10 * sigma_next
    # singular values descending and positive
    s = np.asarray(svd.s)
    assert np.all(np.diff(s) <= 1e-12) and np.all(s > 0)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("shape", [(30, 80), (80, 30)])
def test_gram_svd_matches_direct(key, dtype, shape):
    """Gram-EVD SVD agrees with the direct SVD above the sqrt(eps) floor."""
    from rusty_compression_tpu.ops.svd import compute_svd

    a = rc.random_approximate_low_rank_matrix(key, shape, 1.0, 1e-3,
                                              dtype=dtype)
    u1, s1, vt1 = compute_svd(a, method="direct")
    u2, s2, vt2 = compute_svd(a, method="gram")
    eps = np.finfo(np.real(np.zeros(1, dtype)).dtype).eps
    tol = 50 * np.sqrt(eps)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), rtol=tol,
                               atol=tol)
    # reconstructions agree (individual vectors may differ by phase)
    r1 = np.asarray(u1) @ (np.asarray(s1)[:, None] * np.asarray(vt1))
    r2 = np.asarray(u2) @ (np.asarray(s2)[:, None] * np.asarray(vt2))
    np.testing.assert_allclose(r2, r1, atol=100 * np.sqrt(eps))
    # descending order
    assert np.all(np.diff(np.asarray(s2)) <= 1e-12)


def test_gram_svd_bad_method():
    from rusty_compression_tpu.ops.svd import compute_svd

    with pytest.raises(ValueError, match="unknown SVD method"):
        compute_svd(np.eye(3), method="nope")
