"""Tests for the CompressionConfig front door."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rusty_compression_tpu as rc


@pytest.fixture
def mat(key):
    return rc.random_approximate_low_rank_matrix(key, (80, 60), 1.0, 1e-10)


@pytest.mark.parametrize("method,cls", [
    ("rsvd", "SVD"), ("column_id", "ColumnID"), ("row_id", "RowID"),
    ("two_sided_id", "TwoSidedID"), ("sketched_two_sided_id", "TwoSidedID")])
def test_single_matrix_routes(mat, method, cls):
    cfg = rc.CompressionConfig.RANK(12, method=method, power_iters=1)
    f = rc.compress(mat, jax.random.key(1), cfg)
    assert type(f).__name__ == cls
    assert f.rank == 12
    assert float(rc.rel_diff_fro(f.to_mat(), mat)) < 1e-1


def test_adaptive_single(mat):
    svd, hist = rc.compress(mat, jax.random.key(2),
                            rc.CompressionConfig.ADAPTIVE(1e-5))
    assert float(rc.rel_diff_fro(svd.to_mat(), mat)) < 5e-5
    assert len(hist) > 0


def test_stack_and_list(mat):
    stack = jnp.stack([mat, mat, mat])
    svd = rc.compress(stack, jax.random.key(3), rc.CompressionConfig.RANK(8))
    assert svd.u.shape == (3, 80, 8)
    res = rc.compress([np.asarray(mat), np.asarray(mat[:40, :30])],
                      jax.random.key(4), rc.CompressionConfig.RANK(8))
    assert [r.index for r in res] == [0, 1]


def test_config_validation():
    with pytest.raises(ValueError, match="exactly one"):
        rc.CompressionConfig()
    with pytest.raises(ValueError, match="exactly one"):
        rc.CompressionConfig(rank=3, rel_tol=0.1)
    with pytest.raises(ValueError, match="unknown method"):
        rc.CompressionConfig(rank=3, method="nope")
    with pytest.raises(ValueError, match="produces an SVD"):
        rc.CompressionConfig(rel_tol=0.1, method="column_id")


def test_list_path_non_rsvd_methods(key):
    """Regression: heterogeneous-list branch crashed for ID methods."""
    blocks = [np.asarray(rc.random_approximate_low_rank_matrix(
        k, (40, 30), 1.0, 1e-10)) for k in jax.random.split(key, 2)]
    for m in ("column_id", "row_id", "two_sided_id",
              "sketched_two_sided_id"):
        res = rc.compress(blocks, jax.random.key(1),
                          rc.CompressionConfig.RANK(6, method=m))
        assert len(res) == 2


def test_adaptive_knobs_reach_pipelines(key):
    """Regression (review): max_rank/ortho/small_svd must flow through
    the stack and list adaptive paths, not just the single-matrix path."""
    a = rc.random_approximate_low_rank_matrix(key, (100, 80), 1.0, 1e-10)
    cfg = rc.CompressionConfig.ADAPTIVE(1e-3, max_rank=24, sample_size=8)
    svd, ranks, hist = rc.compress(jnp.stack([a, a]), jax.random.key(1), cfg)
    # padded rank == ceil(24/8)*8 = 24, NOT min(m, n) = 80
    assert svd.u.shape[-1] == 24
    res = rc.compress([np.asarray(a)], jax.random.key(2), cfg)
    assert res[0].rank <= 24


def test_nystrom_method_all_layers(key):
    """nystrom routes through single/stack/list paths."""
    a = rc.random_approximate_low_rank_matrix(key, (80, 60), 1.0, 1e-10)
    cfg = rc.CompressionConfig.RANK(12, method="nystrom", oversample=10)
    f = rc.compress(a, jax.random.key(1), cfg)
    assert type(f).__name__ == "SVD" and f.rank == 12
    s = rc.compress(jnp.stack([a, a]), jax.random.key(2), cfg)
    assert s.u.shape == (2, 80, 12)
    res = rc.compress([np.asarray(a)], jax.random.key(3), cfg)
    assert res[0].rank == 12 and res[0].rel_residual < 0.2


def test_nystrom_power_iters_rejected():
    with pytest.raises(ValueError, match="single-pass"):
        rc.CompressionConfig.RANK(5, method="nystrom", power_iters=2)


def test_bcoo_coerces_to_sparse_operator():
    from jax.experimental import sparse as jsparse
    op = rc.as_linear_operator(jsparse.BCOO.fromdense(jnp.eye(6)))
    assert type(op).__name__ == "SparseOperator"


class TestHighaccFrontDoor:
    """CompressionConfig(highacc=True) routes to the compensated-
    precision pipeline for all three target shapes."""

    @staticmethod
    def _block(seed, m=120, n=90, dr=40):
        rng = np.random.default_rng(seed)
        k = min(m, n)
        sig = np.maximum(10 ** (-10 * np.arange(k) / (dr - 1)), 1e-12)
        u, _ = np.linalg.qr(rng.standard_normal((m, k)))
        v, _ = np.linalg.qr(rng.standard_normal((n, k)))
        return (u * sig) @ v.T

    def test_validation(self):
        with pytest.raises(ValueError, match="tolerance pipeline"):
            rc.CompressionConfig.RANK(8, highacc=True)
        with pytest.raises(ValueError, match="round_rank"):
            rc.CompressionConfig.ADAPTIVE(1e-8, highacc=True)

    def test_single_matrix(self):
        a = self._block(0)
        cfg = rc.CompressionConfig.ADAPTIVE(1e-8, highacc=True,
                                            round_rank=46)
        out, hist = rc.compress(a, jax.random.key(0), cfg)
        u64, s64, vt64 = out.to_f64()
        err = np.linalg.norm(u64 @ (s64[:, None] * vt64) - a)
        assert err / np.linalg.norm(a) < 5e-8
        # history is per-refinement-round; the saturated-tall direct
        # route legitimately has zero rounds
        assert isinstance(hist, tuple)

    def test_list_routes_to_refined_scheduler(self):
        blocks = [self._block(1), self._block(2, m=90, n=120)]
        cfg = rc.CompressionConfig.ADAPTIVE(1e-8, highacc=True,
                                            round_rank=46,
                                            bucket_floor=64)
        res = rc.compress(blocks, jax.random.key(1), cfg)
        assert [r.index for r in res] == [0, 1]
        assert all(r.rel_residual < 5e-8 for r in res)

    def test_operator_rejected(self):
        cfg = rc.CompressionConfig.ADAPTIVE(1e-8, highacc=True,
                                            round_rank=16)
        with pytest.raises(ValueError, match="dense"):
            rc.compress(rc.DenseOperator(jnp.eye(32)), jax.random.key(0),
                        cfg)
