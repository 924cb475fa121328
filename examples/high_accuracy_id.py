"""Two-sided interpolative decomposition at tol 1e-8 — the reference's
flagship example at its native accuracy class, on bf16/f32 hardware.

The reference example (rusty-compression
examples/interpolative_decomposition.rs:22-48) builds a 500x100
synthetic low-rank matrix (spectrum 1 -> 1e-10), computes a pivoted QR
in f64, compresses, and converts to a two-sided ID whose ``X`` factor is
the skeleton submatrix ``A[row_ind, col_ind]``. Its accuracy comes from
LAPACK's native f64 (qr.rs:270-309, triangular solves qr.rs:296-300).

This demo runs the same decomposition tolerance-driven at tol = 1e-8
through the TPU-native high-accuracy route (``highacc_id``): the heavy
O(m n L) range capture runs on the MXU in Ozaki double-float, the tiny
core is pivoted in f64 on the host, and the skeleton factors are taken
VERBATIM from A — per-column and per-entry exactness is bitwise,
stronger than the reference's f64-rounded factors. Rank is DISCOVERED
(no hint given): the adaptive growth capture keeps refining the exact
DF residual until it crosses tol.

Run: ``python examples/high_accuracy_id.py``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from rusty_compression_tpu.highacc_id import refined_two_sided_id

SMALL = bool(os.environ.get("RC_EXAMPLE_SMALL"))
M, N = (300, 80) if SMALL else (1500, 500)
TOL = 1e-8


def main():
    rng = np.random.default_rng(0)
    # The reference fixture: geomspace spectrum 1 -> 1e-10 over min(m,n)
    # (random_matrix.rs:70-93). It crosses 1e-8 at 0.8 * (min - 1).
    sig = np.geomspace(1.0, 1e-10, N)
    u, _ = np.linalg.qr(rng.standard_normal((M, N)))
    v, _ = np.linalg.qr(rng.standard_normal((N, N)))
    a = (u * sig) @ v.T
    crossing = int(np.argmax(sig / sig[0] < TOL))

    t0 = time.perf_counter()
    ts = refined_two_sided_id(a, jax.random.key(0), tol=TOL)
    wall = time.perf_counter() - t0

    err = np.linalg.norm(ts.c @ (ts.x @ ts.r) - a) / np.linalg.norm(a)
    ri = np.asarray(ts.row_ind)[:ts.rank]
    ci = np.asarray(ts.col_ind)[:ts.rank]
    skel_exact = np.array_equal(np.asarray(ts.x), a[ri[:, None], ci])

    print(f"A: {M}x{N}, spectrum 1 -> 1e-10, tol {TOL:g} "
          f"(crossing at rank {crossing})")
    print(f"discovered rank: {ts.rank}")
    print(f"rel_diff_fro(C X R, A) = {err:.3e}  (f64-measured)")
    print(f"skeleton X == A[row_ind, col_ind] bitwise: {skel_exact}")
    print(f"wall: {wall:.2f}s (incl. compiles)")
    assert err <= 10 * TOL, err
    assert skel_exact
    print("OK")


if __name__ == "__main__":
    main()
