"""Transparent complex dispatch (VERDICT r4 next #5).

The reference's macro instantiation makes dtype invisible to the caller
(qr.rs:408-416, col_interp_decomp.rs:158-161). On a complex-REJECTING
device (this repo's axon tunnel returns UNIMPLEMENTED for any complex
op), the standard entry points must still work: they route through the
host ?geqp3/?gesdd-class kernels and the all-real planar pipelines, and
the containers come back with HOST numpy factors whose conversions
never touch the device.

These tests stub the rejecting backend (``RC_COMPLEX_DEVICE=0`` via the
probe cache) and assert BOTH the math contracts and that every factor
stays a numpy array — the witness that the host route ran.
"""

import jax
import numpy as np
import pytest

import rusty_compression_tpu as rc
from rusty_compression_tpu.models.qr import LQ, QR
from rusty_compression_tpu.models.svd import SVD
from rusty_compression_tpu.utils import backend as _backend
from rusty_compression_tpu.utils.errors import CompressionError


@pytest.fixture(autouse=True)
def rejecting_backend(monkeypatch):
    """Force the complex-rejecting route regardless of actual device."""
    monkeypatch.setattr(_backend, "_accepts_complex", False)
    yield
    _backend._reset_probe_cache()


def _fixture(seed, m, n, dtype=np.complex128, floor=1e-10):
    rng = np.random.default_rng(seed)
    k = min(m, n)
    u, _ = np.linalg.qr(rng.standard_normal((m, k))
                        + 1j * rng.standard_normal((m, k)))
    v, _ = np.linalg.qr(rng.standard_normal((n, k))
                        + 1j * rng.standard_normal((n, k)))
    sig = np.geomspace(1.0, floor, k)
    return ((u * sig) @ v.conj().T).astype(dtype)


def _rel(a, b):
    return np.linalg.norm(np.asarray(a) - np.asarray(b)) / np.linalg.norm(b)


@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
class TestStandardAPI:
    def test_qr_compute_compress_column_id(self, dtype):
        a = _fixture(0, 60, 50, dtype)
        qr = QR.compute_from(a)
        assert isinstance(qr.q, np.ndarray) and isinstance(qr.r, np.ndarray)
        # orthonormality + pivot-column identity (pivoted_qr.rs tests)
        assert np.abs(qr.q.conj().T @ qr.q
                      - np.eye(qr.rank)).max() < 1e-5
        assert _rel(qr.to_mat(), a) < 1e-5
        tr = qr.compress(rc.Rank(20))
        assert tr.rank == 20 and isinstance(tr.q, np.ndarray)
        cid = tr.column_id()
        assert isinstance(cid.c, np.ndarray)
        # C = literal columns contract holds through the conversion
        assert _rel(cid.to_mat(), a) < 10 * 10 ** (-10 * 20 / 49)
        ts = cid.two_sided_id()
        assert isinstance(ts.x, np.ndarray)
        assert _rel(ts.to_mat(), a) < 20 * 10 ** (-10 * 20 / 49)
        # skeleton entrywise contract (two_sided_interp_decomp.rs:9-10)
        sk = a[np.ix_(np.asarray(ts.row_ind[:ts.rank]),
                      np.asarray(ts.col_ind[:ts.rank]))]
        tol = 1e-3 if dtype == np.complex64 else 1e-6
        assert np.abs(np.asarray(ts.x) - sk).max() <= tol * np.abs(sk).max()

    def test_qr_tolerance_and_unreachable(self, dtype):
        a = _fixture(1, 50, 40, dtype)
        qr = QR.compute_from(a)
        tr = qr.compress(rc.Adaptive(1e-5))
        assert 0 < tr.rank < 40
        with pytest.raises(CompressionError):
            qr.compress(rc.Adaptive(1e-30))

    def test_lq_row_id(self, dtype):
        a = _fixture(2, 40, 60, dtype)
        lq = LQ.compute_from(a, max_rank=20)
        assert isinstance(lq.l, np.ndarray)
        rid = lq.row_id()
        assert isinstance(rid.x, np.ndarray)
        assert _rel(rid.to_mat(), a) < 10 * 10 ** (-10 * 20 / 39)

    def test_svd_compute_compress_to_qr(self, dtype):
        a = _fixture(3, 50, 45, dtype)
        svd = SVD.compute_from(a)
        assert isinstance(svd.u, np.ndarray)
        assert _rel(svd.to_mat(), a) < 1e-5
        tr = svd.compress(rc.Adaptive(1e-6))
        assert 0 < tr.rank < 45
        qr = tr.to_qr()
        assert isinstance(qr.q, np.ndarray)
        assert _rel(qr.to_mat(), tr.to_mat()) < 1e-5

    def test_compress_front_door(self, dtype):
        a = _fixture(4, 80, 64, dtype)
        cfg = rc.CompressionConfig.RANK(16, method="two_sided_id")
        ts = rc.compress(a, jax.random.key(0), cfg)
        assert isinstance(ts.x, np.ndarray)
        assert _rel(ts.to_mat(), a) < 50 * 10 ** (-10 * 16 / 63)

    def test_compress_front_door_adaptive(self, dtype):
        a = _fixture(5, 64, 64, dtype)
        cfg = rc.CompressionConfig.ADAPTIVE(1e-4)
        svd, hist = rc.compress(a, jax.random.key(1), cfg)
        assert isinstance(svd.u, np.ndarray)
        assert _rel(svd.to_mat(), a) < 5e-4


def test_compress_front_door_stack_and_list():
    """Stack and heterogeneous-list targets keep compress()'s result
    shapes on the rejecting backend (no list-vs-tuple surprises)."""
    stack = np.stack([_fixture(10 + i, 48, 40) for i in range(3)])
    svd, ranks, hists = rc.compress(stack, jax.random.key(3),
                                    rc.CompressionConfig.ADAPTIVE(1e-4))
    assert isinstance(svd.u, np.ndarray) and svd.u.shape[0] == 3
    assert ranks.shape == (3,) and len(hists) == 3
    for i in range(3):
        rec = svd.u[i] @ (svd.s[i][:, None] * svd.vt[i])
        assert _rel(rec, stack[i]) < 5e-4
    svd_f = rc.compress(stack, jax.random.key(4),
                        rc.CompressionConfig.RANK(12))
    assert isinstance(svd_f.u, np.ndarray) and svd_f.u.shape == (3, 48, 12)

    blocks = [_fixture(20, 40, 32), _fixture(21, 56, 44)]
    res = rc.compress(blocks, jax.random.key(5),
                      rc.CompressionConfig.RANK(10))
    assert [r.index for r in res] == [0, 1]
    for r, b in zip(res, blocks):
        assert isinstance(np.asarray(r.factors.u), np.ndarray)
        assert r.error is None
        assert r.rel_residual < 10 * 10 ** (-10 * 10 / 31)


def test_highacc_routes_planar():
    from rusty_compression_tpu.highacc import refined_rsvd

    a = _fixture(6, 96, 80, np.complex128)
    out = refined_rsvd(a, jax.random.key(2), tol=1e-8)
    assert out.residual_fro(a) < 5e-8
    assert isinstance(np.asarray(out.s), np.ndarray)


def test_range_estimate_stays_host():
    a = _fixture(7, 60, 50, np.complex128)
    rng = np.random.default_rng(7)
    q, _ = np.linalg.qr(a @ (rng.standard_normal((50, 24))
                             + 1j * rng.standard_normal((50, 24))))
    qr = QR.compute_from_range_estimate(q, a)
    assert isinstance(qr.q, np.ndarray)
    assert _rel(qr.to_mat(), a) < 10 * 10 ** (-10 * 20 / 49)
    svd = SVD.compute_from_range_estimate(q, a)
    assert isinstance(svd.u, np.ndarray)
    assert _rel(svd.to_mat(), a) < 10 * 10 ** (-10 * 20 / 49)
