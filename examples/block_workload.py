"""End-to-end H-matrix block workload — the north-star production flow.

Generates a stream of heterogeneous admissible (well-separated) Laplace
kernel blocks, compresses them adaptively through the shape-bucketed
scheduler over all local devices, writes a resumable factor checkpoint
with per-block metrics, then demonstrates elastic recovery (drop a
block from the manifest, re-submit only the missing work).

This is the workload BASELINE.md config 5 describes, scaled to the
local machine. On a pod slice the same code runs per host over its
``distributed.local_block_slice`` of the manifest.

Run: ``python examples/block_workload.py``
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if jax.default_backend() != "tpu":
    jax.config.update("jax_enable_x64", True)  # TPU has no f64

import numpy as np  # noqa: E402

import rusty_compression_tpu as rc  # noqa: E402
from rusty_compression_tpu import parallel as par  # noqa: E402
from rusty_compression_tpu.utils.kernel_matrices import (  # noqa: E402
    laplace_kernel_block, random_cloud)
from rusty_compression_tpu.utils.logging import MetricsLogger  # noqa: E402


def make_blocks(key, sizes):
    """Admissible H-matrix blocks: interactions between well-separated
    clusters of varying size."""
    blocks = []
    for i, (m, n) in enumerate(sizes):
        kt = jax.random.fold_in(key, 2 * i)
        ks = jax.random.fold_in(key, 2 * i + 1)
        x = random_cloud(kt, m, (0.0, 0.0, 0.0))
        y = random_cloud(ks, n, (3.0 + 0.5 * (i % 3), 0.0, 0.0))
        blocks.append(np.asarray(laplace_kernel_block(x, y)))
    return blocks


def main():
    sizes = [(300, 200), (512, 512), (300, 200), (150, 400), (512, 512),
             (200, 200), (300, 200), (640, 300)]
    key = jax.random.key(0)
    blocks = make_blocks(key, sizes)
    total_mb = sum(b.nbytes for b in blocks) / 2**20
    print(f"{len(blocks)} admissible blocks, {total_mb:.1f} MiB total, "
          f"{jax.local_device_count()} device(s)")

    mesh = par.make_mesh() if jax.local_device_count() > 1 else None

    results = par.compress_heterogeneous(
        blocks, jax.random.key(1), rel_tol=1e-6, sample_size=8, mesh=mesh)

    log = MetricsLogger(sys.stdout)
    for r in results:
        log.write(r.record())

    stored = sum(sum(leaf.nbytes for leaf in
                     jax.tree_util.tree_leaves(r.factors))
                 for r in results) / 2**20
    print(f"\ncompression ratio: {total_mb:.1f} MiB -> {stored:.2f} MiB "
          f"({total_mb / stored:.1f}x), max residual "
          f"{max(r.rel_residual for r in results):.2e}")

    # -- checkpoint + elastic recovery ----------------------------------
    ckpt = os.path.join(tempfile.mkdtemp(prefix="rc_demo_"), "ckpt")
    rc.io.save_block_results(ckpt, results)
    print(f"checkpoint: {ckpt}")

    # simulate a lost block: drop #3 from the manifest
    manifest = os.path.join(ckpt, "manifest.jsonl")
    lines = open(manifest).readlines()
    open(manifest, "w").writelines(
        l for l in lines if json.loads(l)["block"] != 3)
    pending = rc.io.pending_blocks(ckpt, len(blocks))
    print(f"after simulated failure, pending blocks: {pending}")

    redo = par.compress_heterogeneous(
        [blocks[i] for i in pending], jax.random.key(1), rel_tol=1e-6,
        sample_size=8)
    import dataclasses

    redo = [dataclasses.replace(r, index=pending[i])
            for i, r in enumerate(redo)]
    rc.io.save_block_results(ckpt, redo, append=True)
    print(f"recovered; pending now: "
          f"{rc.io.pending_blocks(ckpt, len(blocks))}")


if __name__ == "__main__":
    main()
