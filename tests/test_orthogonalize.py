"""Tests for the Cholesky-QR orthonormalization kernels and the HMT
fast-path range finder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rusty_compression_tpu as rc
from rusty_compression_tpu.ops import orthogonalize

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


class TestSVQB:
    """SVQB (Stathopoulos & Wu 2002): any-condition orthonormalization."""

    def _cond_spectrum_matrix(self, seed, m, l, decades):
        rng = np.random.default_rng(seed)
        u, _ = np.linalg.qr(rng.standard_normal((m, l)))
        v, _ = np.linalg.qr(rng.standard_normal((l, l)))
        sig = 10.0 ** (-decades * np.arange(l) / (l - 1))
        return (u * sig) @ v.T, u

    def test_extreme_condition_f32(self):
        # cond 1e11 in f32 — beyond every CholeskyQR variant's reach;
        # the TPU power-iteration failure mode (ortho err ~ 1.0).
        y64, u = self._cond_spectrum_matrix(0, 1024, 96, 11)
        q = orthogonalize.svqb(jnp.asarray(y64, jnp.float32))
        q64 = np.asarray(q, np.float64)
        assert np.abs(q64.T @ q64 - np.eye(96)).max() < 1e-4
        # dominant half of the range preserved
        top = u[:, :48]
        loss = np.linalg.norm(top - q64 @ (q64.T @ top))
        assert loss < 1e-2

    def test_zero_columns_finite(self):
        rng = np.random.default_rng(1)
        y = jnp.asarray(rng.standard_normal((256, 32)), jnp.float32)
        y = y.at[:, 20:].set(0.0)
        q = orthogonalize.svqb(y)
        assert bool(jnp.all(jnp.isfinite(q)))
        q64 = np.asarray(q, np.float64)
        assert np.abs(q64[:, :20].T @ q64[:, :20] - np.eye(20)).max() < 1e-4

    def test_well_conditioned_machine_precision(self):
        rng = np.random.default_rng(2)
        y = jnp.asarray(rng.standard_normal((512, 64)), jnp.float32)
        q = orthogonalize.svqb(y)
        q64 = np.asarray(q, np.float64)
        assert np.abs(q64.T @ q64 - np.eye(64)).max() < 1e-5

    def test_complex(self):
        rng = np.random.default_rng(3)
        y = jnp.asarray(rng.standard_normal((256, 24))
                        + 1j * rng.standard_normal((256, 24)), jnp.complex64)
        q = orthogonalize.svqb(y)
        q64 = np.asarray(q, np.complex128)
        assert np.abs(np.conj(q64.T) @ q64 - np.eye(24)).max() < 1e-5

    def test_batched_vmap(self):
        rng = np.random.default_rng(4)
        y = jnp.asarray(rng.standard_normal((4, 128, 16)), jnp.float32)
        q = jax.vmap(orthogonalize.svqb)(y)
        assert q.shape == (4, 128, 16)
        for i in range(4):
            qi = np.asarray(q[i], np.float64)
            assert np.abs(qi.T @ qi - np.eye(16)).max() < 1e-5


class TestPreciseCholesky:
    """ops.cholesky: the pure-JAX blocked factorization (TPU precision
    route) must match LAPACK potrf to roundoff on every dtype."""

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64,
                                       jnp.complex64, jnp.complex128])
    @pytest.mark.parametrize("n", [7, 48, 130])
    def test_matches_lapack(self, dtype, n):
        from rusty_compression_tpu.ops.cholesky import cholesky

        rng = np.random.default_rng(0)
        y = rng.standard_normal((3 * n, n))
        if np.dtype(dtype).kind == "c":
            y = y + 1j * rng.standard_normal((3 * n, n))
        g = (y.conj().T @ y + 3 * n * np.eye(n)).astype(dtype)
        l_ours = np.asarray(cholesky(jnp.asarray(g), block=32))
        l_ref = np.linalg.cholesky(g.astype(
            np.complex128 if np.dtype(dtype).kind == "c" else np.float64))
        tol = 2e-5 if np.dtype(dtype).itemsize <= 8 else 1e-12
        scale = np.abs(l_ref).max()
        np.testing.assert_allclose(l_ours, l_ref, atol=tol * scale, rtol=tol)

    def test_breakdown_produces_nonfinite(self):
        from rusty_compression_tpu.ops.cholesky import cholesky

        g = np.diag([1.0, -1.0, 1.0]).astype(np.float32)  # indefinite
        out = np.asarray(cholesky(jnp.asarray(g)))
        assert not np.all(np.isfinite(out))

    def test_batched(self):
        from rusty_compression_tpu.ops.cholesky import cholesky

        rng = np.random.default_rng(1)
        y = rng.standard_normal((4, 60, 20))
        g = np.einsum("bij,bik->bjk", y, y) + 10 * np.eye(20)
        ours = np.asarray(cholesky(jnp.asarray(g.astype(np.float64)),
                                   block=8))
        ref = np.linalg.cholesky(g)
        np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_power_iteration_over_wide_spectrum_f32():
    """Regression (round 2, found on TPU): ortho='auto' must not route
    power-iteration rSVD through a CholeskyQR-family kernel. Every
    power/sample iterate carries the operator's full singular spread;
    beyond cond ~ 1/u scholqr3 silently corrupts the basis (rel err
    0.2-0.6 on a 7-decade f32 spectrum) while svqb degrades gracefully
    to the Gram-method floor. The TPU auto default is now svqb."""
    from rusty_compression_tpu.parallel.batch import rsvd_block
    from rusty_compression_tpu.utils.random_matrix import random_gaussian

    m, rank, p, q = 1024, 60, 8, 2
    k1, k2 = jax.random.split(jax.random.key(0))
    g1 = random_gaussian(k1, (m, 100), dtype=jnp.float32)
    g2 = random_gaussian(k2, (100, m), dtype=jnp.float32)
    sigma = jnp.concatenate([jnp.geomspace(1.0, 1e-7, 60, jnp.float32),
                             jnp.full((40,), 1e-7, jnp.float32)])
    a = (g1 * sigma[None, :]) @ g2

    def err(ortho):
        out = rsvd_block(a, jax.random.key(1), rank=rank, oversample=p,
                         power_iters=q, ortho=ortho, small_svd="direct")
        rec = out.u @ (out.s[:, None] * out.vt)
        return float(jnp.linalg.norm(a - rec) / jnp.linalg.norm(a))

    # x64-off: with x64 on, Python-float shift arithmetic quietly
    # upcasts the CholeskyQR path to f64 and hides the breakdown (the
    # TPU, where this bug bit, has no x64 at all).
    with jax.enable_x64(False):
        assert err("svqb") < 1e-4          # graceful on any backend
        assert err("auto") < 1e-4          # the default must be safe
        # the failure mode this guards against (why auto != scholqr3)
        assert err("scholqr3") > 1e-2


class TestNSQB:
    def test_well_conditioned_orthonormal(self):
        import numpy as np

        from rusty_compression_tpu.ops.orthogonalize import nsqb

        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.standard_normal((300, 48)), jnp.float32)
        q = np.asarray(nsqb(y))
        assert np.abs(q.T @ q - np.eye(48)).max() < 1e-3
        # span preserved (full-rank spectral transform)
        qq, _ = np.linalg.qr(np.asarray(y, np.float64))
        r = q - qq @ (qq.T @ q)
        assert np.linalg.norm(r) / np.linalg.norm(q) < 1e-5

    def test_rank_deficient_bounded(self):
        import numpy as np

        from rusty_compression_tpu.ops.orthogonalize import nsqb

        rng = np.random.default_rng(1)
        base = rng.standard_normal((200, 8))
        y = jnp.asarray(base @ rng.standard_normal((8, 24)), jnp.float32)
        q = np.asarray(nsqb(y))
        # dead directions degrade to bounded columns, never blow up
        assert np.isfinite(q).all()
        assert np.linalg.norm(q, axis=0).max() < 10.0
