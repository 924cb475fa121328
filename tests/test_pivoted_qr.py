"""Tests for the pivoted QR / LQ kernel.

Oracle style mirrors the reference suite (pivoted_qr.rs:198-317):
orthogonality of Q, per-column reconstruction identity against the pivot
vector, plus RRQR-specific invariants (non-increasing |r_ii| for the
sequential mode; near-optimal truncation error for the blocked mode).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import rusty_compression_tpu as rc

DTYPES = [jnp.float32, jnp.float64, jnp.complex64, jnp.complex128]
SHAPES = [(100, 50), (50, 100)]  # thin and thick, as in the reference


def check_invariants(a, q, r, ind, atol):
    a = np.asarray(a)
    q = np.asarray(q)
    r = np.asarray(r)
    ind = np.asarray(ind)
    m, n = a.shape
    k = q.shape[1]
    # Q has orthonormal columns (pivoted_qr.rs:222-232).
    np.testing.assert_allclose(
        np.conjugate(q.T) @ q, np.eye(k), atol=atol)
    # ind is a valid permutation of 0..n-1.
    assert sorted(ind.tolist()) == list(range(n))
    # R upper triangular.
    np.testing.assert_array_equal(r, np.triu(r))
    # Per-column identity (pivoted_qr.rs:236-242): (Q R)[:, j] == A[:, ind[j]]
    # — exact for j < k; for trailing columns it is the projection, which
    # matches A only when k == min(m, n) spans the range (k == m).
    qr_prod = q @ r
    ncheck = n if k == m else k
    scale = np.abs(a).max()
    np.testing.assert_allclose(
        qr_prod[:, :ncheck], a[:, ind[:ncheck]], atol=atol * scale * 10)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("shape", SHAPES)
class TestPivotedQRSequential:
    def test_invariants(self, key, dtype, shape):
        a = rc.random_gaussian(key, shape, dtype=dtype)
        q, r, ind = rc.pivoted_qr(a, mode="gs")
        atol = 1e-5 if np.dtype(q.dtype).itemsize <= 8 else 1e-12
        check_invariants(a, q, r, ind, atol)
        # Non-increasing |r_ii| (the contract tolerance-truncation relies
        # on, qr.rs:6, enforced exactly by max-norm pivoting).
        d = np.abs(np.diagonal(np.asarray(r)))
        assert np.all(d[:-1] >= d[1:] - 1e-6 * d[0])

    def test_lq_invariants(self, key, dtype, shape):
        a = rc.random_gaussian(key, shape, dtype=dtype)
        l, q, ind = rc.pivoted_lq(a, mode="gs")
        atol = 1e-5 if np.dtype(q.dtype).itemsize <= 8 else 1e-12
        l_, q_, ind_ = np.asarray(l), np.asarray(q), np.asarray(ind)
        k = q_.shape[0]
        # Q has orthonormal rows (pivoted_qr.rs:248-316 mirror).
        np.testing.assert_allclose(
            q_ @ np.conjugate(q_.T), np.eye(k), atol=atol)
        # L lower triangular; row identity (L Q)[j, :] == A[ind[j], :].
        np.testing.assert_array_equal(l_, np.tril(l_))
        lq_prod = l_ @ q_
        m, n = shape
        ncheck = m if k == n else k
        a_ = np.asarray(a)
        scale = np.abs(a_).max()
        np.testing.assert_allclose(
            lq_prod[:ncheck, :], a_[ind_[:ncheck], :], atol=atol * scale * 10)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64, jnp.complex64,
                                   jnp.complex128])
class TestPivotedQRBlocked:
    def test_invariants_large(self, key, dtype):
        a = rc.random_gaussian(key, (300, 200), dtype=dtype)
        q, r, ind = rc.pivoted_qr(a, mode="blocked", block_size=48)
        atol = 2e-4 if np.dtype(q.dtype).itemsize <= 8 else 1e-11
        check_invariants(a, q, r, ind, atol)

    def test_invariants_scholqr3_panel(self, key, dtype):
        """The all-GEMM panel factorization (TPU auto-default) must meet
        the same invariants as the Householder panel on every dtype —
        exercised explicitly here because CPU auto resolves to
        Householder."""
        a = rc.random_approximate_low_rank_matrix(
            key, (300, 200), 1.0,
            1e-4 if np.dtype(dtype).itemsize <= 8 else 1e-8, dtype=dtype)
        q, r, ind = rc.pivoted_qr(a, mode="blocked", block_size=48,
                                  panel_qr="scholqr3")
        atol = 5e-4 if np.dtype(q.dtype).itemsize <= 8 else 1e-10
        check_invariants(a, q, r, ind, atol)

    def test_left_looking_matches_householder_panel(self, key, dtype):
        """Same sketch key -> same pivots regardless of panel kernel, and
        both reconstruct to their precision class."""
        a = rc.random_approximate_low_rank_matrix(
            key, (160, 120), 1.0, 1e-4, dtype=dtype)
        import jax

        k5 = jax.random.key(5)
        _, _, ind_h = rc.pivoted_qr(a, max_rank=32, mode="blocked",
                                    block_size=16, panel_qr="house", key=k5)
        _, _, ind_c = rc.pivoted_qr(a, max_rank=32, mode="blocked",
                                    block_size=16, panel_qr="scholqr3",
                                    key=k5)
        # pivot CHOICE is sketch-driven; the panel kernel must not
        # change it (roundoff can swap near-tied pivots, so compare the
        # selected sets loosely: at least 30 of 32 in common)
        common = len(set(np.asarray(ind_h)[:32]) & set(np.asarray(ind_c)[:32]))
        assert common >= 30, common

    def test_rank_revealing_quality(self, key, dtype):
        """Truncated blocked RRQR error must be within a small factor of
        the optimal (SVD) rank-k error on a decaying-spectrum matrix."""
        if jnp.dtype(dtype) in (jnp.float32, jnp.complex64):
            sigma_min, k = 1e-4, 30
        else:
            sigma_min, k = 1e-10, 40
        a = rc.random_approximate_low_rank_matrix(
            key, (256, 192), 1.0, sigma_min, dtype=dtype)
        q, r, ind = rc.pivoted_qr(a, max_rank=k, mode="blocked",
                                  block_size=16)
        a_np = np.asarray(a)
        approx = np.asarray(q) @ np.asarray(r)
        # Undo the permutation for comparison.
        inv = np.argsort(np.asarray(ind))
        err = np.linalg.norm(approx[:, inv] - a_np) / np.linalg.norm(a_np)
        s = np.linalg.svd(a_np, compute_uv=False)
        opt = np.sqrt(np.sum(s[k:] ** 2)) / np.linalg.norm(a_np)
        assert err < 10 * opt + 1e-12, (err, opt)

    def test_truncated_matches_gs_subspace(self, key, dtype):
        """max_rank-truncated factorization: Q spans the dominant range."""
        a = rc.random_approximate_low_rank_matrix(
            key, (120, 80), 1.0, 1e-6, dtype=dtype)
        q, r, ind = rc.pivoted_qr(a, max_rank=25, mode="blocked",
                                  block_size=8)
        assert q.shape == (120, 25)
        assert r.shape == (25, 80)
        # Projection error ~ sigma_26.
        a_np = np.asarray(a)
        q_np = np.asarray(q)
        resid = a_np - q_np @ (np.conjugate(q_np.T) @ a_np)
        rel = np.linalg.norm(resid) / np.linalg.norm(a_np)
        s = np.linalg.svd(a_np, compute_uv=False)
        assert rel < 20 * np.sqrt(np.sum(s[25:] ** 2)) / np.linalg.norm(a_np)


class TestTournamentPivoting:
    """The candidate-shortlist pivot rule (pivot_candidates, the round-2
    default) must preserve RRQR quality vs the full-width rule."""

    def test_matches_full_width_quality(self, key):
        a = rc.random_approximate_low_rank_matrix(
            key, (256, 192), 1.0, 1e-5, dtype=jnp.float32)
        k = 48
        kk = __import__("jax").random.key(7)
        q2, r2, i2 = rc.pivoted_qr(a, max_rank=k, mode="blocked",
                                   block_size=16, pivot_candidates=2, key=kk)
        q0, r0, i0 = rc.pivoted_qr(a, max_rank=k, mode="blocked",
                                   block_size=16, pivot_candidates=0, key=kk)
        a_np = np.asarray(a, np.float64)

        def rel_err(q, r, ind):
            approx = np.asarray(q, np.float64) @ np.asarray(r, np.float64)
            inv = np.argsort(np.asarray(ind))
            return (np.linalg.norm(approx[:, inv] - a_np)
                    / np.linalg.norm(a_np))

        e2, e0 = rel_err(q2, r2, i2), rel_err(q0, r0, i0)
        s = np.linalg.svd(a_np, compute_uv=False)
        opt = np.sqrt(np.sum(s[k:] ** 2)) / np.linalg.norm(a_np)
        # both within the RRQR class of optimal, shortlist no worse
        # than a small factor over full-width
        assert e0 < 10 * opt + 1e-12, (e0, opt)
        assert e2 < 10 * opt + 1e-12, (e2, opt)
        assert e2 < 4 * max(e0, opt), (e2, e0, opt)

    def test_stair_step_spectrum(self, key):
        """Stair-step spectra maximize near-ties; the shortlist must not
        truncate a step early (quality within the usual factor)."""
        import jax

        m, n, k = 200, 160, 40
        ku, kv = jax.random.split(key)
        u = rc.random_orthogonal_matrix(ku, (m, n), dtype=jnp.float32)
        v = rc.random_orthogonal_matrix(kv, (n, n), dtype=jnp.float32)
        s = np.repeat(10.0 ** -np.arange(8), 20)[:n].astype(np.float32)
        a = u @ (s[:, None] * v)
        q, r, ind = rc.pivoted_qr(a, max_rank=k, mode="blocked",
                                  block_size=16)
        a_np = np.asarray(a, np.float64)
        approx = np.asarray(q, np.float64) @ np.asarray(r, np.float64)
        inv = np.argsort(np.asarray(ind))
        err = np.linalg.norm(approx[:, inv] - a_np) / np.linalg.norm(a_np)
        opt = np.sqrt(np.sum((s[k:] ** 2).astype(np.float64)))
        opt /= np.linalg.norm(a_np)
        assert err < 10 * opt, (err, opt)

    def test_unused_exhaustion_full_factorization(self, key):
        """Full blocked factorization (k == n): the final panels run out
        of unchosen columns, so the shortlist necessarily includes used
        ones — the mask must keep the permutation valid."""
        a = rc.random_gaussian(key, (96, 64), dtype=jnp.float32)
        q, r, ind = rc.pivoted_qr(a, mode="blocked", block_size=16,
                                  pivot_candidates=2)
        assert sorted(np.asarray(ind).tolist()) == list(range(64))
        check_invariants(a, q, r, ind, 2e-4)


class TestEdgeCases:
    def test_rank_deficient(self, key):
        """Exactly rank-deficient input: zero residual columns yield zero
        Q columns (the _safe_inv guard), no NaNs."""
        u = rc.random_gaussian(key, (40, 5), dtype=jnp.float64)
        a = u @ u.T  # rank 5, 40x40
        q, r, ind = rc.pivoted_qr(a, mode="gs")
        assert np.all(np.isfinite(np.asarray(q)))
        assert np.all(np.isfinite(np.asarray(r)))
        d = np.abs(np.diagonal(np.asarray(r)))
        assert d[5] < 1e-8 * d[0]
        np.testing.assert_allclose(
            np.asarray(q @ r)[:, np.argsort(np.asarray(ind))],
            np.asarray(a), atol=1e-10)

    def test_max_rank_gs(self, key):
        a = rc.random_gaussian(key, (64, 32), dtype=jnp.float64)
        q, r, ind = rc.pivoted_qr(a, max_rank=10, mode="gs")
        assert q.shape == (64, 10) and r.shape == (10, 32)
        assert ind.shape == (32,)

    def test_square_full(self, key):
        a = rc.random_gaussian(key, (32, 32), dtype=jnp.float64)
        q, r, ind = rc.pivoted_qr(a)
        np.testing.assert_allclose(
            np.asarray(q @ r), np.asarray(a)[:, np.asarray(ind)], atol=1e-10)


class TestPallasQRCP:
    """The fused Pallas panel kernel (interpret mode on CPU) must agree
    with the XLA Gram-Schmidt QRCP bit-for-bit in exact pivots and to
    f32 roundoff in factors."""

    def test_matches_gs_mode(self, key):
        import jax.numpy as jnp
        a = rc.random_approximate_low_rank_matrix(
            key, (80, 50), 1.0, 1e-6, dtype=jnp.float32)
        q1, r1, i1 = rc.pivoted_qr(a, max_rank=20, mode="pallas")
        q2, r2, i2 = rc.pivoted_qr(a, max_rank=20, mode="gs")
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                                   atol=1e-6)

    def test_contract_full_rank(self, key):
        import jax.numpy as jnp
        a = rc.random_gaussian(key, (40, 30), dtype=jnp.float32)
        q, r, ind = rc.pivoted_qr(a, mode="pallas")
        qn, rn, an = np.asarray(q), np.asarray(r), np.asarray(a)
        # orthogonality and per-column reconstruction (pivoted_qr.rs tests)
        assert np.linalg.norm(qn.T @ qn - np.eye(30)) < 1e-5
        np.testing.assert_allclose(qn @ rn, an[:, np.asarray(ind)],
                                   atol=1e-5)
        # non-increasing |r_ii|
        d = np.abs(np.diag(rn))
        assert np.all(d[1:] <= d[:-1] + 1e-6)

    def test_f64_rejected(self, key):
        a = rc.random_gaussian(key, (16, 8))
        with pytest.raises(ValueError, match="f32-only"):
            rc.pivoted_qr(a, mode="pallas")


def test_pallas_qrcp_used_mask(key):
    """Columns flagged `used` are never selected as pivots."""
    import jax.numpy as jnp
    from rusty_compression_tpu.ops.pallas.qrcp import qrcp_panel

    a = rc.random_gaussian(key, (48, 32), dtype=jnp.float32)
    used = np.zeros(32, dtype=bool)
    used[[0, 5, 17]] = True
    _, _, piv = qrcp_panel(a, 8, used=jnp.asarray(used), interpret=True)
    assert not set(np.asarray(piv)).intersection({0, 5, 17})
    # and with no mask, the selection matches the XLA rule
    from rusty_compression_tpu.ops.pivoted_qr import _select_block_pivots
    piv2, _ = _select_block_pivots(a, jnp.zeros(32, dtype=bool), 8)
    _, _, piv3 = qrcp_panel(a, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(piv3), np.asarray(piv2))


def test_pallas_qrcp_rank_deficient_pivots_stay_permutation(key):
    """Regression: the -1 exclusion sentinel must survive norm downdates
    — rank-deficient inputs previously produced duplicate pivots."""
    import jax.numpy as jnp
    from rusty_compression_tpu.ops.pallas.qrcp import qrcp_panel

    A = np.zeros((6, 4), np.float32)
    A[2, :] = 1.0  # rank one, identical columns
    _, _, piv = qrcp_panel(jnp.asarray(A), 4, interpret=True)
    assert sorted(np.asarray(piv)) == [0, 1, 2, 3]
    used = np.zeros(4, bool)
    used[0] = True
    _, _, piv2 = qrcp_panel(jnp.asarray(A), 3, used=jnp.asarray(used),
                            interpret=True)
    assert 0 not in np.asarray(piv2)


def test_pallas_qrcp_complex_matches_gs(key):
    """The planar complex kernel reproduces the XLA QRCP exactly."""
    import jax.numpy as jnp
    a = rc.random_approximate_low_rank_matrix(
        key, (70, 50), 1.0, 1e-6, dtype=jnp.complex64)
    q1, r1, i1 = rc.pivoted_qr(a, max_rank=20, mode="pallas")
    q2, r2, i2 = rc.pivoted_qr(a, max_rank=20, mode="gs")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
    qn = np.asarray(q1)
    assert np.linalg.norm(np.conj(qn.T) @ qn - np.eye(20)) < 1e-5


def test_pallas_qrcp_c128_rejected(key):
    import jax.numpy as jnp
    a = rc.random_gaussian(key, (16, 8), dtype=jnp.complex128)
    with pytest.raises(ValueError, match="c64-only"):
        from rusty_compression_tpu.ops.pallas.qrcp import qrcp_panel_complex
        qrcp_panel_complex(a, 4, interpret=True)


def test_auto_mode_never_selects_pallas_for_complex(key):
    """Regression (review): the c64 kernel is explicit-only — some TPU
    backends reject it and the probe only covers f32."""
    import jax.numpy as jnp
    import rusty_compression_tpu.ops.pivoted_qr as pq
    from rusty_compression_tpu.ops.pivoted_qr import _resolve_mode

    old = pq._pallas_available
    pq._pallas_available = True  # simulate a TPU with working f32 pallas
    try:
        assert _resolve_mode("auto", 64, 48, 16, jnp.complex64) == "gs"
        assert _resolve_mode("auto", 64, 48, 16, jnp.float32) == "pallas"
    finally:
        pq._pallas_available = old


def test_pallas_qrcp_complex_packed_matches_planar(key):
    """The 3-output packed-plane complex kernel must reproduce the
    5-output form exactly (same pivots, same factors) — it exists only
    as a Mosaic-compatibility layout."""
    from rusty_compression_tpu.ops.pallas.qrcp import qrcp_panel_complex

    a = rc.random_gaussian(key, (64, 48), dtype=jnp.complex64)
    q5, r5, p5 = qrcp_panel_complex(a, 16, interpret=True, packed=False)
    q3, r3, p3 = qrcp_panel_complex(a, 16, interpret=True, packed=True)
    np.testing.assert_array_equal(np.asarray(p5), np.asarray(p3))
    np.testing.assert_allclose(np.asarray(q3), np.asarray(q5), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r3), np.asarray(r5), atol=1e-5)
    # packed path demands 8-aligned plane extents when forced
    import pytest as _pytest

    with _pytest.raises(ValueError):
        qrcp_panel_complex(a[:63], 16, interpret=True, packed=True)


def test_blocked_small_k_wide_matrix_quality():
    """Regression (round 2, found via bench config 4b): the blocked
    small-k route on a smooth-kernel matrix. scholqr3 panels silently
    corrupted the basis (ortho error 1.0, reconstruction error 0.26 at
    16384^2 on TPU) because kernel-matrix pivot panels are
    ill-conditioned; _panel_qr now self-checks and redoes the panel
    with Householder under lax.cond. CPU checks the same contract at a
    CI-sized shape."""
    import jax

    from rusty_compression_tpu.utils.kernel_matrices import (
        laplace_kernel_block, random_cloud)

    n = 768
    kx, ky = jax.random.split(jax.random.key(40))
    x = random_cloud(kx, n, (0.0, 0.0, 0.0))
    y = random_cloud(ky, n, (3.0, 0.0, 0.0))
    a = laplace_kernel_block(x, y, dtype=jnp.float32)
    q, r, ind = rc.pivoted_qr(a, 16, mode="blocked", block_size=16,
                           panel_qr="scholqr3")
    q64 = np.asarray(q, np.float64)
    assert np.abs(q64.T @ q64 - np.eye(16)).max() < 1e-4
    rec = q64 @ np.asarray(r, np.float64)
    an = np.asarray(a, np.float64)
    err = np.linalg.norm(rec - an[:, np.asarray(ind)]) / np.linalg.norm(an)
    assert err < 1e-4, err
