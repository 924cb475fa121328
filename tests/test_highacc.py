"""Refined (compensated-precision) rSVD — the tol<=1e-8 pipeline.

The reference hits this accuracy class natively in f64 (src/qr.rs:408-416,
test contracts src/svd.rs:289-298); highacc.py reaches it from f32/bf16
hardware via Ozaki GEMMs + iterative refinement. These tests validate the
full pipeline against true f64 on CPU; the TPU measurement lives in
bench_suite.py (config 6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rusty_compression_tpu.highacc import (
    RefinedSVD, df_cholesky_qr2, refined_rsvd)
from rusty_compression_tpu.utils.doublefloat import DF, df_from_f64, df_to_f64
from rusty_compression_tpu.utils.errors import CompressionError


def decaying_matrix(seed, m, n, decay_rank=100, floor=1e-12):
    """Exponential spectrum to 1e-10 over ``decay_rank`` ranks, then a
    flat floor — a spectrum that *supports* tol 1e-8 at moderate rank
    (unlike the geomspace-over-min(m,n) fixture, where 1e-8 needs rank
    ~0.8 min(m,n))."""
    rng = np.random.default_rng(seed)
    k = min(m, n)
    sig = np.maximum(10 ** (-10 * np.arange(k) / (decay_rank - 1)), floor)
    u, _ = np.linalg.qr(rng.standard_normal((m, k)))
    v, _ = np.linalg.qr(rng.standard_normal((n, k)))
    return (u * sig) @ v.T


class TestRefinedRSVD:
    def test_reaches_1e8_class(self):
        # The headline contract: one refinement round lands the residual
        # two decades inside the 5e-8 gate. A 5-slice residual split
        # (the regression fixed in _residual) floors this at ~3e-8.
        a = decaying_matrix(0, 512, 512)
        out = refined_rsvd(a, jax.random.PRNGKey(0), rank=110,
                           refine_rounds=1)
        assert out.residual_fro(a) < 5e-9

    def test_refinement_improves_on_f32(self):
        a = decaying_matrix(1, 384, 512)
        r0 = refined_rsvd(a, jax.random.PRNGKey(0), rank=100,
                          refine_rounds=0).residual_fro(a)
        r1 = refined_rsvd(a, jax.random.PRNGKey(0), rank=100,
                          refine_rounds=1).residual_fro(a)
        assert r0 < 5e-6          # f32 floor
        assert r1 < r0 / 20       # refinement buys >1 decade
        assert r1 < 5e-9

    def test_tall_matrix(self):
        a = decaying_matrix(2, 768, 256, decay_rank=80)
        out = refined_rsvd(a, jax.random.PRNGKey(2), rank=90,
                           refine_rounds=1)
        assert out.residual_fro(a) < 5e-9

    def test_tolerance_truncation_matches_spectrum(self):
        # Reference compress semantics (svd.rs:87-101): truncate before
        # the first s_i/s_0 < tol; achieved rank must sit at the
        # spectrum's 1e-8 crossing (sigma_i = 10^(-10 i/99) < 1e-8 at
        # i = 80).
        a = decaying_matrix(3, 512, 512)
        out = refined_rsvd(a, jax.random.PRNGKey(3), round_rank=110,
                           tol=1e-8)
        assert 78 <= out.rank <= 82
        res = out.residual_fro(a)
        assert res < 5e-8
        # residual consistent with the truncated spectrum position
        assert res > 1e-9

    def test_tolerance_unreachable_raises(self):
        a = decaying_matrix(4, 256, 256)
        with pytest.raises(CompressionError):
            refined_rsvd(a, jax.random.PRNGKey(4), round_rank=60,
                         tol=1e-30)

    def test_requires_rank_round_rank_or_tol(self):
        a = decaying_matrix(5, 128, 128)
        with pytest.raises(ValueError):
            refined_rsvd(a, jax.random.PRNGKey(5))


class TestGrowthCapture:
    """tol-only adaptive rank discovery at the north-star tolerance
    (reference semantics: random_sampling.rs:202-282 keeps drawing
    blocks until the residual estimate crosses tol; here the residual
    is tracked exactly in DF, so tol <= 1e-8 works)."""

    def test_discovers_rank_at_1e8(self):
        # sigma_i = 10^(-10 i/99) crosses 1e-8 at i = 80; no rank hint.
        a = decaying_matrix(10, 512, 512)
        out = refined_rsvd(a, jax.random.PRNGKey(10), tol=1e-8)
        assert 78 <= out.rank <= 82
        assert out.residual_fro(a) < 5e-8
        # residual history is reported (reference contract:
        # random_sampling.rs:209-217) and decreasing
        assert len(out.history) >= 2
        assert out.history[-1] < out.history[0]

    def test_discovers_deep_rank(self):
        # crossing at i = 160 exercises the geometric block growth
        a = decaying_matrix(11, 600, 500, decay_rank=200)
        out = refined_rsvd(a, jax.random.PRNGKey(11), tol=1e-8)
        assert 158 <= out.rank <= 162
        assert out.residual_fro(a) < 5e-8

    def test_tall_saturation_routes_direct(self):
        # tol below the spectrum floor on a TALL matrix: growth hits
        # the saturation guard and the direct DF route must keep the
        # residual at the DF floor instead of the f32 tilt floor.
        rng = np.random.default_rng(12)
        u, _ = np.linalg.qr(rng.standard_normal((220, 90)))
        v, _ = np.linalg.qr(rng.standard_normal((90, 90)))
        sig = 10.0 ** (-6 * np.arange(90) / 89)  # floor 1e-6 > 1e-8
        a = (u * sig) @ v.T
        out = refined_rsvd(a, jax.random.PRNGKey(12), tol=1e-4)
        assert out.residual_fro(a) < 5e-4

    def test_unreachable_tolerance_raises(self):
        # flat spectrum never crosses: growth exhausts min(m, n) and
        # the truncation raises (qr.rs:198 semantics)
        rng = np.random.default_rng(13)
        q, _ = np.linalg.qr(rng.standard_normal((96, 96)))
        a = q @ np.diag(np.linspace(1.0, 0.5, 96)) @ q.T
        with pytest.raises(CompressionError):
            refined_rsvd(a, jax.random.PRNGKey(13), tol=1e-10)

    def test_full_capture_not_an_error(self):
        # spectrum crossing right at the capture boundary: the growth
        # loop certifies the residual <= tol, so a projected spectrum
        # that never dips below tol is a full-rank SUCCESS, not a
        # CompressionError.
        rng = np.random.default_rng(14)
        u, _ = np.linalg.qr(rng.standard_normal((256, 40)))
        v, _ = np.linalg.qr(rng.standard_normal((192, 40)))
        a = (u * np.geomspace(1.0, 1e-2, 40)) @ v.T  # exact rank 40
        out = refined_rsvd(a, jax.random.PRNGKey(14), tol=1e-6)
        assert out.rank >= 40
        assert out.residual_fro(a) < 5e-6

    def test_tall_growth_is_fused(self):
        # m > n runs the transposed fused program (round 5: one device
        # dispatch, VERDICT r4 next #3) — rank discovery + accuracy
        # must match the square route; the recomposed Q is exactly
        # orthonormal (host f64 QR).
        from rusty_compression_tpu.highacc import growth_capture_fused

        a = decaying_matrix(15, 640, 256, decay_rank=60)
        q, b64, hist, captured = growth_capture_fused(
            a, jax.random.PRNGKey(15), tol=1e-8)
        assert captured
        q64 = df_to_f64(q)
        assert np.abs(q64.T @ q64 - np.eye(q64.shape[1])).max() < 1e-12
        rec = q64 @ b64
        a64 = np.asarray(a, np.float64)
        assert np.linalg.norm(rec - a64) / np.linalg.norm(a64) < 5e-8
        # end-to-end through refined_rsvd: rank discovered at crossing
        out = refined_rsvd(a, jax.random.PRNGKey(16), tol=1e-8)
        # sigma_i = 10^(-10 i/59) crosses 1e-8 at i = 48
        assert 46 <= out.rank <= 50
        assert out.residual_fro(a) < 5e-8

    def test_complex_growth_is_fused(self):
        # complex inputs realify into the (2m, 2n) planar frame and run
        # the SAME real fused program (round 5); basis recovered on
        # host, residual contract unchanged. Uses the c128 class (CPU).
        from rusty_compression_tpu.highacc import growth_capture_fused

        rng = np.random.default_rng(17)
        u = np.linalg.qr(rng.standard_normal((220, 220))
                         + 1j * rng.standard_normal((220, 220)))[0]
        v = np.linalg.qr(rng.standard_normal((180, 180))
                         + 1j * rng.standard_normal((180, 180)))[0]
        sig = np.zeros(180)
        sig[:80] = 10.0 ** (-10 * np.arange(80) / 79)
        a = (u[:, :180] * sig) @ v.conj().T
        q, b64, hist, captured = growth_capture_fused(
            a, jax.random.PRNGKey(17), tol=1e-8)
        assert captured
        q64 = df_to_f64(q)
        assert np.abs(q64.conj().T @ q64
                      - np.eye(q64.shape[1])).max() < 1e-10
        rec = q64 @ b64
        assert (np.linalg.norm(rec - a) / np.linalg.norm(a)) < 5e-8

    def test_output_types(self):
        a = decaying_matrix(6, 256, 192, decay_rank=60)
        out = refined_rsvd(a, jax.random.PRNGKey(6), rank=70,
                           refine_rounds=1)
        assert isinstance(out, RefinedSVD)
        assert isinstance(out.u, DF)
        u64, s, vt = out.to_f64()
        assert u64.dtype == np.float64 and s.dtype == np.float64
        assert u64.shape == (256, 70) and vt.shape == (70, 192)
        assert np.all(np.diff(s) <= 0)
        # u columns orthonormal to well below the 1e-8 class
        assert np.abs(u64.T @ u64 - np.eye(70)).max() < 1e-8
        # f32 view round-trips into the standard container
        svd32 = out.to_svd()
        assert svd32.u.dtype == jnp.float32
        assert svd32.rank == 70


class TestDFCholeskyQR:
    def test_orthogonality_beyond_f32(self):
        rng = np.random.default_rng(0)
        y = df_from_f64(np.linalg.qr(rng.standard_normal((512, 64)))[0])
        q, r = df_cholesky_qr2(y)
        q64 = df_to_f64(q)
        # ~2^-35 per slice-pair plus k-fold dropped-pair accumulation
        assert np.abs(q64.T @ q64 - np.eye(64)).max() < 1e-8

    def test_shifted_handles_duplicated_columns(self):
        # The merge case: near-identical columns (cond ~ 1e7 in f32).
        rng = np.random.default_rng(1)
        base = np.linalg.qr(rng.standard_normal((256, 32)))[0]
        y64 = np.concatenate(
            [base, base + 1e-7 * rng.standard_normal((256, 32))], axis=1)
        q, r = df_cholesky_qr2(df_from_f64(y64), shifted=True)
        q64 = df_to_f64(q)
        assert np.isfinite(q64).all()
        assert np.abs(q64.T @ q64 - np.eye(64)).max() < 1e-6
        # span preserved: Y must be reconstructible from Q
        resid = y64 - q64 @ (q64.T @ y64)
        assert np.abs(resid).max() < 1e-6


def decaying_matrix_c(seed, m, n, decay_rank=100, floor=1e-12):
    """Complex analogue of ``decaying_matrix`` (c128, unitary factors)."""
    rng = np.random.default_rng(seed)
    k = min(m, n)
    sig = np.maximum(10 ** (-10 * np.arange(k) / (decay_rank - 1)), floor)
    u, _ = np.linalg.qr(rng.standard_normal((m, k))
                        + 1j * rng.standard_normal((m, k)))
    v, _ = np.linalg.qr(rng.standard_normal((n, k))
                        + 1j * rng.standard_normal((n, k)))
    return (u * sig) @ v.conj().T


class TestRefinedRSVDComplex:
    """Complex (c128-class) route: planar 4x-real-Ozaki-product stages.
    Reference parity: the z-dtype macro instantiations (qr.rs:408-416)
    with the 1e-12-class contracts of svd.rs:289-298."""

    def test_reaches_1e8_class_c128(self):
        a = decaying_matrix_c(0, 384, 384, decay_rank=80)
        out = refined_rsvd(a, jax.random.PRNGKey(0), rank=90,
                           refine_rounds=1)
        assert out.residual_fro(a) < 5e-8

    def test_tolerance_truncation_c128(self):
        a = decaying_matrix_c(1, 300, 300, decay_rank=60)
        out = refined_rsvd(a, jax.random.PRNGKey(1), round_rank=66,
                           tol=1e-8, refine_rounds=1)
        # spectrum hits 1e-8 at rank ceil(48*(60-1)/59): position of
        # 10^(-10 k/59) < 1e-8
        assert 44 <= out.rank <= 50, out.rank
        assert out.residual_fro(a) < 5e-8

    def test_unitary_left_factor(self):
        a = decaying_matrix_c(2, 256, 200, decay_rank=50)
        out = refined_rsvd(a, jax.random.PRNGKey(2), rank=60,
                           refine_rounds=1)
        u64 = df_to_f64(out.u)
        assert u64.dtype == np.complex128
        g = u64.conj().T @ u64
        assert np.abs(g - np.eye(g.shape[0])).max() < 5e-9

    def test_output_dtypes_c64(self):
        a = decaying_matrix_c(3, 128, 96, decay_rank=30)
        out = refined_rsvd(a, jax.random.PRNGKey(3), rank=32,
                           refine_rounds=1)
        svd32 = out.to_svd()
        assert svd32.u.dtype == jnp.complex64
        assert svd32.vt.dtype == jnp.complex64
        assert svd32.s.dtype == jnp.float32


class TestCDFCholeskyQR:
    def test_orthogonality_beyond_f32_complex(self):
        from rusty_compression_tpu.highacc import cdf_cholesky_qr2
        from rusty_compression_tpu.utils.doublefloat import df

        rng = np.random.default_rng(5)
        y64 = (rng.standard_normal((300, 40))
               + 1j * rng.standard_normal((300, 40)))
        q, r = cdf_cholesky_qr2(df(y64))
        q64 = df_to_f64(q)
        ortho = np.abs(q64.conj().T @ q64 - np.eye(40)).max()
        assert ortho < 5e-9, ortho   # far beyond c64's ~1e-7 floor
        # QR identity holds to the Ozaki budget
        rec = q64 @ r
        assert np.abs(rec - y64).max() / np.abs(y64).max() < 5e-9


def test_refined_rsvd_batch():
    from rusty_compression_tpu.highacc import refined_rsvd_batch

    blocks = [decaying_matrix(s, 160, 160, decay_rank=40) for s in (10, 11)]
    outs = refined_rsvd_batch(blocks, jax.random.PRNGKey(4), rank=46,
                              refine_rounds=1)
    assert len(outs) == 2
    for out, a in zip(outs, blocks):
        assert out.residual_fro(a) < 5e-8
    # independent sketches: different blocks -> different factors
    assert not np.allclose(df_to_f64(outs[0].u), df_to_f64(outs[1].u))


class TestSaturatedShapes:
    """Shapes where the randomized capacity saturates the small
    dimension. Tall saturated inputs route through the direct DF
    column orthonormalization (in-span by construction); every other
    class keeps the sampled path. Regression for the ~1.5e-7 capture
    floor from f32 basis tilt on direct tall streams."""

    @pytest.mark.parametrize("shape", [(120, 90), (90, 120), (100, 100),
                                       (300, 80)])
    def test_direct_saturated_reaches_1e8(self, shape):
        a = decaying_matrix(0, *shape, decay_rank=40)
        out = refined_rsvd(a, jax.random.PRNGKey(1), round_rank=46,
                           tol=1e-8)
        assert out.residual_fro(a) < 5e-8

    def test_complex_tall_saturated(self):
        a = (decaying_matrix(3, 120, 90, decay_rank=40)
             + 1j * decaying_matrix(4, 120, 90, decay_rank=40))
        out = refined_rsvd(a, jax.random.PRNGKey(2), round_rank=46,
                           tol=1e-8)
        assert out.residual_fro(a) < 5e-8

    def test_padded_stream_matches_unpadded(self):
        """Zero-padding to a bucket grid must not cost accuracy (the
        exact-Gram rank-revealing merge drops the structurally
        dependent filler directions)."""
        a = decaying_matrix(5, 100, 100, decay_rank=40)
        outs = []
        for pad in (100, 128):
            p = np.zeros((pad, pad))
            p[:100, :100] = a
            out = refined_rsvd(p, jax.random.PRNGKey(3), round_rank=46,
                               tol=1e-8)
            u64, s64, vt64 = out.to_f64()
            rec = (u64 @ (s64[:, None] * vt64))[:100, :100]
            outs.append(np.linalg.norm(rec - a) / np.linalg.norm(a))
        assert all(e < 5e-8 for e in outs), outs


class TestNsPolar:
    """Device-side DF orthonormalization (ops.ns_polar) — the
    single-program replacement for the host-LAPACK Cholesky merge."""

    @pytest.mark.parametrize("cond", [1e0, 1e2, 1e4])
    def test_ortho_and_span_in_domain(self, cond):
        from rusty_compression_tpu.ops.ns_polar import df_orthonormalize_ns
        rng = np.random.default_rng(int(np.log10(cond)))
        m, l = 600, 48
        u, _ = np.linalg.qr(rng.standard_normal((m, l)))
        s = np.geomspace(1.0, 1.0 / cond, l)
        v, _ = np.linalg.qr(rng.standard_normal((l, l)))
        y64 = (u * s) @ v.T
        q64 = df_to_f64(df_orthonormalize_ns(df_from_f64(y64)))
        ortho = np.abs(q64.T @ q64 - np.eye(l)).max()
        span = (np.linalg.norm(y64 - q64 @ (q64.T @ y64))
                / np.linalg.norm(y64))
        # documented domain: Gram cond <= ~1e8 (basis cond 1e4)
        assert ortho < 3e-8, ortho
        assert span < 1e-7, span

    def test_well_conditioned_hits_df_floor_class(self):
        from rusty_compression_tpu.ops.ns_polar import df_orthonormalize_ns
        rng = np.random.default_rng(9)
        q0, _ = np.linalg.qr(rng.standard_normal((400, 64)))
        # f32-orthonormal input (the fused pipeline's merge case)
        y64 = np.asarray(np.asarray(q0, np.float32), np.float64)
        q64 = df_to_f64(df_orthonormalize_ns(df_from_f64(y64)))
        assert np.abs(q64.T @ q64 - np.eye(64)).max() < 1e-8


class TestRefinedRSVDFused:
    """Single-dispatch capture (refined_rsvd_fused) — must match the
    host-orchestrated route's accuracy class and semantics."""

    def test_matches_host_route_accuracy(self):
        from rusty_compression_tpu.highacc import refined_rsvd_fused
        a = decaying_matrix(0, 512, 512)
        host = refined_rsvd(a, jax.random.PRNGKey(0), round_rank=110,
                            tol=1e-8)
        fused = refined_rsvd_fused(a, jax.random.PRNGKey(0), round_rank=110,
                                   tol=1e-8)
        # tol-truncated: the residual IS the spectrum tail (~sigma_81
        # ~ 8e-9 for this fixture) on both routes.
        rf, rh = fused.residual_fro(a), host.residual_fro(a)
        assert rf < 5e-8
        assert rf < 2 * rh + 1e-9, (rf, rh)
        assert abs(fused.rank - host.rank) <= 2

    def test_rectangular(self):
        from rusty_compression_tpu.highacc import refined_rsvd_fused
        a = decaying_matrix(1, 768, 384, decay_rank=80)
        out = refined_rsvd_fused(a, jax.random.PRNGKey(2), rank=90,
                                 refine_rounds=1)
        assert out.residual_fro(a) < 5e-9
        u64, _, _ = out.to_f64()
        assert np.abs(u64.T @ u64 - np.eye(90)).max() < 1e-8

    def test_tolerance_unreachable_raises(self):
        from rusty_compression_tpu.highacc import refined_rsvd_fused
        a = decaying_matrix(4, 256, 256)
        with pytest.raises(CompressionError):
            refined_rsvd_fused(a, jax.random.PRNGKey(4), round_rank=60,
                               tol=1e-30)

    def test_complex_fused_reaches_1e8(self):
        from rusty_compression_tpu.highacc import refined_rsvd_fused
        a = decaying_matrix_c(5, 300, 300, decay_rank=60)
        out = refined_rsvd_fused(a, jax.random.PRNGKey(5), round_rank=66,
                                 tol=1e-8, refine_rounds=1)
        assert 44 <= out.rank <= 50, out.rank
        assert out.residual_fro(a) < 5e-8


class TestVerifiedCapture:
    """Self-verified fused capture (``verify=True``): the exact DF
    capture residual is measured on device and a miss repairs through
    the growth capture — insurance against backend numerics drift (the
    round-3 TPU gate failures: identical programs landed at 8.8e-9 or
    1.3e-7 depending on the session) and under-capacity round_rank."""

    def test_verified_pass_records_residual(self):
        from rusty_compression_tpu.highacc import refined_rsvd_fused
        a = decaying_matrix(20, 384, 384)
        out = refined_rsvd_fused(a, jax.random.PRNGKey(20),
                                 round_rank=110, tol=1e-8, verify=True)
        # history[0] is the measured DF capture residual
        assert out.history and out.history[0] <= 2.5e-8
        assert out.residual_fro(a) < 5e-8

    def test_under_capacity_repairs_via_growth(self):
        from rusty_compression_tpu.highacc import refined_rsvd_fused
        # Fixed capacity 2*(24+10) = 68 < the spectrum's 1e-8 crossing
        # (rank 80): unverified this raises (no projected singular value
        # dips below tol); verify=True measures the miss and repairs by
        # rank discovery.
        a = decaying_matrix(21, 384, 384)
        with pytest.raises(CompressionError):
            refined_rsvd_fused(a, jax.random.PRNGKey(21), round_rank=24,
                               tol=1e-8)
        out = refined_rsvd_fused(a, jax.random.PRNGKey(21), round_rank=24,
                                 tol=1e-8, verify=True)
        assert 78 <= out.rank <= 82, out.rank
        assert out.residual_fro(a) < 5e-8
        # history: measured miss first, then the growth rounds
        assert out.history[0] > 2.5e-8
        assert len(out.history) >= 2

    def test_complex_verified_pass(self):
        from rusty_compression_tpu.highacc import refined_rsvd_fused
        a = decaying_matrix_c(22, 256, 256, decay_rank=60)
        out = refined_rsvd_fused(a, jax.random.PRNGKey(22), round_rank=66,
                                 tol=1e-8, verify=True)
        assert out.history and out.history[0] <= 2.5e-8
        assert out.residual_fro(a) < 5e-8
        u64 = df_to_f64(out.u)
        assert u64.dtype == np.complex128
        g = u64.conj().T @ u64
        assert np.abs(g - np.eye(g.shape[0])).max() < 5e-8

    def test_saturated_tall_falls_back(self):
        from rusty_compression_tpu.highacc import refined_rsvd_fused
        a = decaying_matrix(6, 300, 80, decay_rank=40)
        out = refined_rsvd_fused(a, jax.random.PRNGKey(6), round_rank=46,
                                 tol=1e-8)
        assert out.residual_fro(a) < 5e-8

    def test_compile_failure_falls_back(self, monkeypatch):
        """A tunneled AOT-compile flake on the fused program must not
        surface: the driver falls back to the host-orchestrated route
        (the failure mode that killed a bench_suite run on TPU)."""
        import rusty_compression_tpu.highacc as ha

        def boom(*a, **k):
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: remote_compile: response body closed")
        monkeypatch.setattr(ha, "_fused_capture", boom)
        a = decaying_matrix(7, 256, 256)
        with pytest.warns(RuntimeWarning, match="falling back"):
            out = ha.refined_rsvd_fused(a, jax.random.PRNGKey(7),
                                        round_rank=110, tol=1e-8)
        assert out.residual_fro(a) < 5e-8


class TestNsPolarComplex:
    def test_complex_ortho_and_span(self):
        from rusty_compression_tpu.ops.ns_polar import df_orthonormalize_ns
        rng = np.random.default_rng(2)
        m, l = 500, 40
        u, _ = np.linalg.qr(rng.standard_normal((m, l))
                            + 1j * rng.standard_normal((m, l)))
        s = np.geomspace(1.0, 1e-3, l)
        v, _ = np.linalg.qr(rng.standard_normal((l, l))
                            + 1j * rng.standard_normal((l, l)))
        y64 = (u * s) @ v.conj().T
        q64 = df_to_f64(df_orthonormalize_ns(df_from_f64(y64)))
        assert np.abs(q64.conj().T @ q64 - np.eye(l)).max() < 3e-8
        span = (np.linalg.norm(y64 - q64 @ (q64.conj().T @ y64))
                / np.linalg.norm(y64))
        assert span < 1e-7


class TestPaddedFrame:
    """Regression: a zero-padded bucket frame whose content min dim is
    below the capture width made round 1 structurally rank-deficient —
    svqb's garbage tail columns poisoned the DF merge for a 2e-4-class
    miss (round-3 1k-block stream). _certify_basis trims them."""

    def test_padded_block_reaches_1e8(self):
        a = decaying_matrix(20, 129, 405, decay_rank=58)
        pad = np.zeros((256, 512))
        pad[:129, :405] = a
        out = refined_rsvd(pad, jax.random.PRNGKey(20), round_rank=128,
                           tol=1e-8)
        assert out.residual_fro(pad) < 5e-8

    def test_padded_block_growth_mode(self):
        a = decaying_matrix(21, 133, 159, decay_rank=60)
        pad = np.zeros((256, 256))
        pad[:133, :159] = a
        out = refined_rsvd(pad, jax.random.PRNGKey(21), tol=1e-8)
        assert out.residual_fro(pad) < 5e-8


class TestPlanarComplex:
    """Complex capture with NO complex dtype on device (realified
    pipeline + planar projection) — the route for TPU backends that
    reject c64 ops outright (this repo's tunnel does, even for adds)."""

    def _cmatrix(self, seed, m, n, decay_rank=60):
        rng = np.random.default_rng(seed)
        k = min(m, n)
        sig = np.maximum(10 ** (-10 * np.arange(k) / (decay_rank - 1)),
                         1e-12)
        u, _ = np.linalg.qr(rng.standard_normal((m, k))
                            + 1j * rng.standard_normal((m, k)))
        v, _ = np.linalg.qr(rng.standard_normal((n, k))
                            + 1j * rng.standard_normal((n, k)))
        return (u * sig) @ v.conj().T

    def test_reaches_1e8_class(self):
        from rusty_compression_tpu.highacc import refined_rsvd_planar

        a = self._cmatrix(0, 256, 200)
        out = refined_rsvd_planar(a, jax.random.PRNGKey(0), round_rank=70,
                                  tol=1e-8)
        assert out.residual_fro(a) < 5e-8
        # rank at the spectrum's crossing (i = 48 for decay_rank 60)
        assert 46 <= out.rank <= 52
        # factors are host-resident (never materialize c64 on device)
        assert isinstance(out.u.hi, np.ndarray)
        u64 = df_to_f64(out.u)
        assert np.abs(np.conj(u64.T) @ u64
                      - np.eye(out.rank)).max() < 1e-7

    def test_growth_mode(self):
        from rusty_compression_tpu.highacc import refined_rsvd_planar

        a = self._cmatrix(1, 200, 160, decay_rank=40)
        out = refined_rsvd_planar(a, jax.random.PRNGKey(1), tol=1e-8)
        assert out.residual_fro(a) < 5e-8
        assert 30 <= out.rank <= 38


def test_refined_rsvd_accepts_matvec_only_operator():
    """The high-accuracy entry points accept LinearOperators (VERDICT r3
    missing #2 follow-through): a matvec-only FunctionOperator is
    materialized (the Ozaki residual needs entries) and lands at the
    1e-8 class like the dense path."""
    from rusty_compression_tpu.linop import FunctionOperator

    a = decaying_matrix(30, 256, 256, decay_rank=60)
    aj = jnp.asarray(a)
    op = FunctionOperator(lambda x: aj @ x, a.shape, dtype=aj.dtype)
    out = refined_rsvd(op, jax.random.PRNGKey(30), tol=1e-8)
    assert 44 <= out.rank <= 50, out.rank
    assert out.residual_fro(a) < 5e-8


class TestBatchedGrowth:
    """Batched rank discovery: refined_rsvd_fused_batch with tol alone
    runs the vmapped _fused_growth — one device program discovers each
    block's rank at the 1e-8 class (volume-capable adaptive sampling,
    random_sampling.rs:202-282 semantics)."""

    def test_discovers_per_block_ranks(self):
        from rusty_compression_tpu.highacc import refined_rsvd_fused_batch
        blocks = np.stack([decaying_matrix(40, 192, 192, decay_rank=40),
                           decaying_matrix(41, 192, 192, decay_rank=100),
                           decaying_matrix(42, 192, 192, decay_rank=40)])
        outs = refined_rsvd_fused_batch(blocks, jax.random.PRNGKey(40),
                                        tol=1e-8)
        # crossings at 0.8*(dk-1): 31 and 79
        assert 29 <= outs[0].rank <= 34, outs[0].rank
        assert 77 <= outs[1].rank <= 82, outs[1].rank
        assert 29 <= outs[2].rank <= 34, outs[2].rank
        for o, b in zip(outs, blocks):
            assert o.tol_ok
            assert o.residual_fro(b) < 5e-8

    def test_tall_stack_batched(self):
        # TALL stacks run the transposed vmapped growth (round 5):
        # per-block rank discovery + host recompose, no per-block
        # pipeline fallback. Factors come back host-backed.
        from rusty_compression_tpu.highacc import refined_rsvd_fused_batch
        blocks = np.stack([decaying_matrix(45, 320, 160, decay_rank=40),
                           decaying_matrix(46, 320, 160, decay_rank=80)])
        outs = refined_rsvd_fused_batch(blocks, jax.random.PRNGKey(45),
                                        tol=1e-8)
        assert 29 <= outs[0].rank <= 34, outs[0].rank
        assert 61 <= outs[1].rank <= 68, outs[1].rank
        for o, b in zip(outs, blocks):
            assert o.tol_ok
            assert o.residual_fro(b) < 5e-8
            u64 = df_to_f64(o.u)
            assert np.abs(u64.T @ u64
                          - np.eye(u64.shape[1])).max() < 1e-10

    def test_tall_saturated_fixed_round_redirects(self):
        # fixed-round capacity >= n on a TALL stack used to route
        # per-block host pipelines (10-40 s/block through the tunnel);
        # it now runs the transposed vmapped FIXED-ROUND capture
        # (round 5) — one device program, host recompose, same
        # accuracy contract (bounded rounds: no growth-loop noise
        # merges on flat tails).
        from rusty_compression_tpu import highacc as ha

        blocks = np.stack([decaying_matrix(47, 320, 96, decay_rank=30),
                           decaying_matrix(48, 320, 96, decay_rank=50)])
        h = ha.refined_fused_batch_begin(
            blocks, jax.random.PRNGKey(47), tol=1e-8, round_rank=64,
            on_unreachable="mark")
        assert h["mode"] == "fused_tall", h["mode"]
        outs = ha.refined_fused_batch_finish(h)
        assert 22 <= outs[0].rank <= 26, outs[0].rank
        assert 38 <= outs[1].rank <= 42, outs[1].rank
        for o, b in zip(outs, blocks):
            assert o.residual_fro(b) < 5e-8

    def test_unreachable_marked(self):
        from rusty_compression_tpu.highacc import refined_rsvd_fused_batch
        rng = np.random.default_rng(43)
        q, _ = np.linalg.qr(rng.standard_normal((96, 96)))
        flat = q @ np.diag(np.linspace(1.0, 0.5, 96)) @ q.T
        blocks = np.stack([decaying_matrix(44, 96, 96, decay_rank=30),
                           flat])
        outs = refined_rsvd_fused_batch(blocks, jax.random.PRNGKey(44),
                                        tol=1e-8, on_unreachable="mark")
        assert outs[0].tol_ok and outs[0].residual_fro(blocks[0]) < 5e-8
        assert not outs[1].tol_ok
