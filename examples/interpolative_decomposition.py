"""Fixed-rank two-sided interpolative decomposition.

Re-creation of the reference example
``/root/reference/examples/interpolative_decomposition.rs`` (lines
8-50): build a 500x100 synthetic matrix with singular values decaying
geometrically from 1 to 1e-10, pivoted-QR it, compress to rank 20,
convert to a column ID and then a two-sided ID, and report the relative
Frobenius reconstruction error of each stage.

Run: ``python examples/interpolative_decomposition.py``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The ambient environment may force-register a TPU platform at import
# time; honor an explicit JAX_PLATFORMS=cpu request (see tests/conftest).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if jax.default_backend() != "tpu":
    jax.config.update("jax_enable_x64", True)  # TPU has no f64

import jax.numpy as jnp  # noqa: E402

import rusty_compression_tpu as rc  # noqa: E402


def main():
    m, n, rank = 500, 100, 20
    key = jax.random.key(42)
    dt = jnp.float64 if jax.default_backend() != "tpu" else jnp.float32

    print(f"Compressing a {m}x{n} matrix with geomspace spectrum "
          f"(1 -> 1e-10) at rank {rank}.\n")
    mat = rc.random_approximate_low_rank_matrix(
        key, (m, n), sigma_max=1.0, sigma_min=1e-10, dtype=dt)

    # Pivoted QR -> rank truncation (qr.rs:251-253, 169-184)
    qr = rc.QR.compute_from(mat).compress(rc.CompressionType.RANK(rank))
    print(f"QR compressed:      rank {qr.rank}, rel error "
          f"{float(rc.rel_diff_fro(qr.to_mat(), mat)):.3e}")

    # Column interpolative decomposition (qr.rs:270-309)
    col_id = qr.column_id()
    print(f"Column ID:          rank {col_id.rank}, rel error "
          f"{float(rc.rel_diff_fro(col_id.to_mat(), mat)):.3e}")

    # Two-sided ID (col_interp_decomp.rs:116-130)
    two_sided = col_id.two_sided_id()
    err = float(rc.rel_diff_fro(two_sided.to_mat(), mat))
    print(f"Two-sided ID:       rank {two_sided.rank}, rel error "
          f"{err:.3e}")

    # The skeleton matrix X equals A[row_ind[:k], col_ind[:k]]
    # (two_sided_interp_decomp.rs:9-10) — verify like the reference tests.
    skel = mat[two_sided.row_ind[:rank], :][:, two_sided.col_ind[:rank]]
    skel_err = float(jnp.max(jnp.abs(two_sided.x - skel)))
    print(f"Skeleton exactness: max |X - A[rows, cols]| = {skel_err:.3e}")

    sigma_next = 10.0 ** (-10.0 * rank / (n - 1))
    print(f"\n(sigma_{rank + 1}/sigma_1 = {sigma_next:.3e} — the "
          "best possible rank-20 error for this spectrum.)")


if __name__ == "__main__":
    main()
