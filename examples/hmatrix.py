"""Hierarchical matrix compression — the north-star workload end-to-end.

Builds the full H-matrix machinery the framework exists to serve:

1. a 3-D point cloud on a sphere surface with a recursive cluster tree
   (median bisection);
2. the standard admissibility condition
   ``min(diam(s), diam(t)) <= eta * dist(s, t)`` partitioning the
   Laplace kernel matrix into admissible (low-rank) and inadmissible
   (dense) blocks;
3. adaptive compression of every admissible block through the
   shape-bucketed scheduler (one stream, heterogeneous shapes,
   per-block discovered ranks);
4. an H-matrix matvec (dense near-field + factored far-field) checked
   against the dense operator.

Reports the block statistics, memory compression ratio, and matvec
accuracy.

Run: ``python examples/hmatrix.py`` (N_POINTS env to scale).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if jax.default_backend() != "tpu":
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import rusty_compression_tpu as rc  # noqa: E402
from rusty_compression_tpu import parallel as par  # noqa: E402
from rusty_compression_tpu.utils.kernel_matrices import (  # noqa: E402
    laplace_kernel_block)


# -- cluster tree ------------------------------------------------------------


class Cluster:
    def __init__(self, indices, points):
        self.indices = indices
        self.points = points[indices]
        self.center = self.points.mean(axis=0)
        self.radius = float(np.linalg.norm(
            self.points - self.center, axis=1).max())
        self.children = []


def build_tree(points, leaf_size=64):
    def split(idx):
        c = Cluster(idx, points)
        if len(idx) > leaf_size:
            spread = points[idx].max(0) - points[idx].min(0)
            ax = int(np.argmax(spread))
            med = np.median(points[idx, ax])
            left = idx[points[idx, ax] <= med]
            right = idx[points[idx, ax] > med]
            if len(left) and len(right):
                c.children = [split(left), split(right)]
        return c

    return split(np.arange(len(points)))


def admissible(s, t, eta=1.5):
    dist = np.linalg.norm(s.center - t.center) - s.radius - t.radius
    return dist > 0 and 2 * min(s.radius, t.radius) <= eta * dist


def partition(s, t, eta=1.5):
    """Recursive block partition: (admissible, inadmissible) leaf pairs."""
    if admissible(s, t, eta):
        return [(s, t)], []
    if not s.children and not t.children:
        return [], [(s, t)]
    # split the larger cluster
    ss = s.children if (s.children and (not t.children or
                                        s.radius >= t.radius)) else [s]
    ts = t.children if (t.children and (not s.children or
                                        t.radius > s.radius)) else [t]
    adm, inadm = [], []
    for a in ss:
        for b in ts:
            x, y = partition(a, b, eta)
            adm += x
            inadm += y
    return adm, inadm


def main():
    n_points = int(os.environ.get("N_POINTS", 3000))
    rng = np.random.default_rng(0)
    # points on a sphere surface (classic BEM geometry)
    g = rng.standard_normal((n_points, 3))
    points = g / np.linalg.norm(g, axis=1, keepdims=True)

    tree = build_tree(points)
    adm, inadm = partition(tree, tree)
    print(f"{n_points} points on the unit sphere -> "
          f"{len(adm)} admissible + {len(inadm)} dense blocks")

    pts = jnp.asarray(points)
    dt = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    tol = 1e-4 if dt == jnp.float32 else 1e-6

    if not adm:
        print("no admissible blocks at this size — nothing to compress "
              "(increase N_POINTS); exiting")
        return

    # far-field: one heterogeneous adaptive stream through the scheduler
    far_blocks = [np.asarray(laplace_kernel_block(
        pts[jnp.asarray(s.indices)], pts[jnp.asarray(t.indices)], dtype=dt))
        for s, t in adm]
    mesh = par.make_mesh() if jax.local_device_count() > 1 else None
    results = par.compress_heterogeneous(
        far_blocks, jax.random.key(1), rel_tol=tol, sample_size=8,
        mesh=mesh)
    ranks = [r.rank for r in results]
    print(f"far-field compressed: ranks min {min(ranks)} / "
          f"median {int(np.median(ranks))} / max {max(ranks)}, "
          f"max rel residual {max(r.rel_residual for r in results):.2e}")

    # near-field: dense diagonal-ish blocks (1/r singularity on the
    # diagonal handled with a simple cutoff)
    def near_block(s, t):
        x, y = points[s.indices], points[t.indices]
        d = np.linalg.norm(x[:, None, :] - y[None, :, :], axis=-1)
        d = np.maximum(d, 1e-2)
        return (1.0 / (4.0 * np.pi * d)).astype(np.dtype(dt))

    near = [(s, t, near_block(s, t)) for s, t in inadm]

    # memory accounting
    dense_bytes = n_points * n_points * np.dtype(dt).itemsize
    h_bytes = sum(b.nbytes for _, _, b in near) + sum(
        sum(leaf.nbytes for leaf in jax.tree_util.tree_leaves(r.factors))
        for r in results)
    print(f"memory: dense {dense_bytes/2**20:.1f} MiB -> H-matrix "
          f"{h_bytes/2**20:.1f} MiB ({dense_bytes/h_bytes:.1f}x)")

    # H-matrix matvec vs dense
    x = np.asarray(rc.random_gaussian(jax.random.key(2), (n_points,),
                                      dtype=dt))
    y_h = np.zeros(n_points, dtype=np.dtype(dt))
    for (s, t), r in zip(adm, results):
        y_h[s.indices] += np.asarray(r.factors.apply(
            jnp.asarray(x[t.indices][:, None])))[:, 0]
    for s, t, b in near:
        y_h[s.indices] += b @ x[t.indices]

    # dense reference (same near-field cutoff)
    d = np.linalg.norm(points[:, None, :] - points[None, :, :], axis=-1)
    dense = (1.0 / (4.0 * np.pi * np.maximum(d, 1e-2))).astype(np.dtype(dt))
    # overwrite far-field entries with the exact kernel (no cutoff there)
    for s, t in adm:
        blk = np.asarray(laplace_kernel_block(
            pts[jnp.asarray(s.indices)], pts[jnp.asarray(t.indices)],
            dtype=dt))
        dense[np.ix_(s.indices, t.indices)] = blk
    y_d = dense @ x
    err = np.linalg.norm(y_h - y_d) / np.linalg.norm(y_d)
    print(f"H-matrix matvec rel error vs dense: {err:.2e} (tol {tol:g})")
    assert err < 50 * tol, "H-matrix matvec accuracy regression"
    print("OK")


if __name__ == "__main__":
    main()
