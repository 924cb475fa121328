"""Tests for checkpoint/serialization, profiling, and metrics logging."""

import io as std_io
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rusty_compression_tpu as rc
from rusty_compression_tpu import io as rcio
from rusty_compression_tpu.parallel import compress_heterogeneous
from rusty_compression_tpu.utils.logging import MetricsLogger
from rusty_compression_tpu.utils.profiling import sync, timeit_slope


@pytest.mark.parametrize("maker", [
    lambda a: rc.QR.compute_from(a),
    lambda a: rc.LQ.compute_from(a),
    lambda a: rc.SVD.compute_from(a),
    lambda a: rc.QR.compute_from(a, max_rank=10).column_id(),
    lambda a: rc.LQ.compute_from(a, max_rank=10).row_id(),
    lambda a: rc.QR.compute_from(a, max_rank=10).column_id().two_sided_id(),
])
def test_factor_roundtrip(tmp_path, key, maker):
    a = rc.random_approximate_low_rank_matrix(key, (40, 30), 1.0, 1e-10)
    f = maker(a)
    path = str(tmp_path / "f.npz")
    rcio.save_factors(path, f)
    g = rcio.load_factors(path)
    assert type(g) is type(f)
    for x, y in zip(jax.tree_util.tree_leaves(f),
                    jax.tree_util.tree_leaves(g)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_factors_rejects_non_container(tmp_path):
    with pytest.raises(TypeError, match="not a factorization container"):
        rcio.save_factors(str(tmp_path / "x.npz"), np.eye(3))


def test_block_workload_checkpoint_and_recovery(tmp_path, key):
    shapes = [(40, 30), (80, 60), (40, 30)]
    keys = jax.random.split(key, 3)
    blocks = [np.asarray(rc.random_approximate_low_rank_matrix(
        k, s, 1.0, 1e-10)) for k, s in zip(keys, shapes)]
    results = compress_heterogeneous(blocks, jax.random.key(1), rank=10)
    d = str(tmp_path / "ckpt")
    rcio.save_block_results(d, results)

    loaded = rcio.load_block_results(d)
    assert [r["block"] for r in loaded] == [0, 1, 2]
    for rec, orig in zip(loaded, results):
        assert rec["rank"] == 10
        np.testing.assert_allclose(np.asarray(rec["factors"].to_mat()),
                                   np.asarray(orig.factors.to_mat()),
                                   atol=1e-12)
    # elastic recovery: nothing pending; a larger workload reports the rest
    assert rcio.pending_blocks(d, 3) == []
    assert rcio.pending_blocks(d, 5) == [3, 4]
    assert rcio.pending_blocks(str(tmp_path / "fresh"), 2) == [0, 1]


def test_metrics_logger():
    buf = std_io.StringIO()
    log = MetricsLogger(buf)
    log.write({"block": 3, "rank": 7})
    rec = json.loads(buf.getvalue())
    assert rec["block"] == 3 and rec["rank"] == 7
    assert "ts" in rec and "process" in rec


def test_timeit_slope_sane():
    x = jnp.ones((200, 200))
    f = jax.jit(lambda x: x @ x)
    dt = timeit_slope(f, x, n1=2, n2=6, trials=2)
    assert 0 <= dt < 1.0
    sync(f(x))  # smoke
