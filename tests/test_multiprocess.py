"""True multi-process distributed test: two OS processes form a
jax.distributed process group (Gloo over localhost), build a global
mesh, and run sharded block compression — the multi-host path of
BASELINE.md config 5, validated without pod hardware.

Every process derives identical inputs from shared PRNG keys (the
framework's no-broadcast design), compresses its shard, and reports the
global max residual; the test asserts both processes succeed and agree.
"""

import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent("""
    import os, sys
    proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=proc_id)
    import numpy as np
    sys.path.insert(0, "__REPO__")
    import jax.numpy as jnp
    import rusty_compression_tpu as rc
    from rusty_compression_tpu import parallel as par

    assert jax.process_count() == nprocs
    mesh = par.global_mesh()
    n_dev = len(jax.devices())
    blocks = jnp.stack([rc.random_approximate_low_rank_matrix(
        k, (48, 32), 1.0, 1e-10, dtype="float32")
        for k in jax.random.split(jax.random.key(0), n_dev * 2)])
    svd = par.compress_blocks(blocks, jax.random.key(1), rank=8, mesh=mesh)
    errs = par.batched_rel_diff_fro(svd, blocks)
    err_max = float(jnp.max(errs))
    # adaptive path: per-device shard_map while-loop across processes
    _, ranks, _ = par.compress_blocks_adaptive(
        blocks, jax.random.key(2), 1e-4, 8, 16, mesh=mesh)
    r_min = int(jnp.min(ranks))
    assert r_min > 0
    sl = par.local_block_slice(n_dev * 2)
    print(f"RESULT {proc_id} {sl.start} {sl.stop} {err_max:.6e}", flush=True)
""")


@pytest.mark.parametrize("nprocs", [2, 4])
def test_two_process_sharded_compression(tmp_path, nprocs):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script.write_text(WORKER.replace("__REPO__", repo))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(nprocs), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(nprocs)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(out)
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, lo, hi, err_max = line.split()
                results[int(pid)] = (int(lo), int(hi), float(err_max))
    assert set(results) == set(range(nprocs))
    # contiguous submission-order partition of the block stream
    spans = [results[i][:2] for i in range(nprocs)]
    assert spans[0][0] == 0
    for (a, b), (c, _) in zip(spans, spans[1:]):
        assert b == c
    # all processes agree on the global residual (same sketches, no bcast)
    errs = {results[i][2] for i in range(nprocs)}
    assert len(errs) == 1
    assert errs.pop() < 1e-2
