"""End-to-end tests for the command-line block-compression runner."""

import json
import os

import jax
import numpy as np

import rusty_compression_tpu as rc
from rusty_compression_tpu import io as rcio
from rusty_compression_tpu.cli import main


def write_blocks(d, shapes, key):
    os.makedirs(d, exist_ok=True)
    for i, s in enumerate(shapes):
        a = np.asarray(rc.random_approximate_low_rank_matrix(
            jax.random.fold_in(key, i), s, 1.0, 1e-10))
        np.save(os.path.join(d, f"b{i:03d}.npy"), a)


def test_cli_fixed_rank(tmp_path, key):
    blocks = str(tmp_path / "blocks")
    ckpt = str(tmp_path / "ckpt")
    metrics = str(tmp_path / "m.jsonl")
    write_blocks(blocks, [(60, 40), (130, 70)], key)
    rc_code = main([blocks, "-o", ckpt, "--rank", "12",
                    "--metrics", metrics])
    assert rc_code == 0
    loaded = rcio.load_block_results(ckpt)
    assert [r["block"] for r in loaded] == [0, 1]
    assert all(r["rank"] == 12 for r in loaded)
    recs = [json.loads(l) for l in open(metrics)]
    assert len(recs) == 2 and recs[0]["m"] == 60


def test_cli_adaptive_resume(tmp_path, key):
    blocks = str(tmp_path / "blocks")
    ckpt = str(tmp_path / "ckpt")
    write_blocks(blocks, [(50, 40), (90, 60), (50, 40)], key)
    main([blocks, "-o", ckpt, "--tol", "1e-5"])
    # drop one record to simulate a failed block, then resume
    manifest = os.path.join(ckpt, "manifest.jsonl")
    lines = open(manifest).readlines()
    open(manifest, "w").writelines(
        [l for l in lines if json.loads(l)["block"] != 1])
    assert rcio.pending_blocks(ckpt, 3) == [1]
    main([blocks, "-o", ckpt, "--tol", "1e-5", "--resume"])
    assert rcio.pending_blocks(ckpt, 3) == []
    loaded = rcio.load_block_results(ckpt)
    assert sorted(r["block"] for r in loaded) == [0, 1, 2]
    # idempotent: nothing pending on a third run
    assert main([blocks, "-o", ckpt, "--tol", "1e-5", "--resume"]) == 0


def test_cli_non_rsvd_methods(tmp_path, key):
    """--method column_id/two_sided_id must not leak sampling kwargs into
    pivoted_qr (regression: review finding)."""
    blocks = str(tmp_path / "blocks")
    write_blocks(blocks, [(40, 30)], key)
    for method in ("column_id", "row_id", "two_sided_id"):
        out = str(tmp_path / f"ckpt_{method}")
        assert main([blocks, "-o", out, "--rank", "6",
                     "--method", method]) == 0


def test_cli_nystrom(tmp_path, key):
    blocks = str(tmp_path / "blocks")
    write_blocks(blocks, [(50, 40)], key)
    out = str(tmp_path / "ckpt_ny")
    assert main([blocks, "-o", out, "--rank", "8",
                 "--method", "nystrom"]) == 0


def test_cli_highacc_tol(tmp_path):
    """--tol --highacc routes through the compensated-precision pipeline
    and checkpoints f64 SVD factors."""
    import numpy as np

    rng = np.random.default_rng(0)
    sig = np.maximum(10 ** (-10 * np.arange(100) / 39), 1e-12)
    u, _ = np.linalg.qr(rng.standard_normal((100, 100)))
    v, _ = np.linalg.qr(rng.standard_normal((100, 100)))
    a = (u * sig) @ v.T
    inp = tmp_path / "blocks"
    inp.mkdir()
    np.save(inp / "b0.npy", a)
    out = tmp_path / "ckpt"
    from rusty_compression_tpu import cli

    rc_ = cli.main([str(inp), "-o", str(out), "--tol", "1e-8", "--highacc",
                    "--round-rank", "46", "--bucket-floor", "64"])
    assert rc_ == 0
    from rusty_compression_tpu import io as rcio

    recs = rcio.load_block_results(str(out))
    assert len(recs) == 1
    assert recs[0]["rel_residual"] < 5e-8
    f = recs[0]["factors"]
    assert f.u.dtype == np.float64


def test_load_blocks_npy_dir_is_memory_mapped(tmp_path):
    """Out-of-core streams: .npy directories must load as mmap views
    (materialization happens per byte-budgeted scheduler chunk)."""
    import numpy as np
    from rusty_compression_tpu.cli import _load_blocks
    for i in range(3):
        np.save(tmp_path / f"b{i}.npy", np.full((8, 8), float(i)))
    blocks = _load_blocks(str(tmp_path))
    assert len(blocks) == 3
    assert all(isinstance(b, np.memmap) for b in blocks)
    assert float(blocks[2][0, 0]) == 2.0  # sorted-name submission order
