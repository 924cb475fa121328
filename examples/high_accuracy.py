"""tol-1e-8 compression on bf16/f32 hardware — the north-star tolerance.

The reference reaches the 1e-8 accuracy class by running natively in
f64 through LAPACK (rusty-compression src/qr.rs:408-416; 1e-12-class
test contracts at src/svd.rs:289-298). TPUs have no fast f64, so this
framework reaches the same class with the compensated-precision
pipeline (``highacc.refined_rsvd_fused``): f32 HMT rounds on the MXU,
an exact Ozaki-scheme residual, a double-float Newton-Schulz basis
merge, and a tiny host f64 core SVD — the whole capture as ONE XLA
program (see docs/HIGHACC.md for the error model).

This demo compresses a 2048x2048 matrix whose spectrum decays to 1e-10
over 120 ranks, to relative tolerance 1e-8, and verifies the residual
in full f64 on the host. It runs identically on TPU (f32/bf16 chips)
and CPU.

Run: ``python examples/high_accuracy.py``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from rusty_compression_tpu.highacc import refined_rsvd_fused

SMALL = bool(os.environ.get("RC_EXAMPLE_SMALL"))
M = 512 if SMALL else 2048
DECAY_RANK = 60 if SMALL else 120
TOL = 1e-8


def main():
    rng = np.random.default_rng(0)
    r_gen = DECAY_RANK + 40
    sig = 10.0 ** (-10.0 * np.arange(r_gen) / (DECAY_RANK - 1))
    u, _ = np.linalg.qr(rng.standard_normal((M, r_gen)))
    v, _ = np.linalg.qr(rng.standard_normal((M, r_gen)))
    a = (u * sig) @ v.T  # f64 ground truth

    print(f"backend: {jax.default_backend()}  matrix: {M}x{M} f64-class, "
          f"spectrum 1 -> 1e-10 over {DECAY_RANK} ranks")

    t0 = time.perf_counter()
    out = refined_rsvd_fused(a, jax.random.key(0),
                             round_rank=int(DECAY_RANK * 1.1), tol=TOL)
    wall = time.perf_counter() - t0

    resid = out.residual_fro(a)  # exact host f64 verification
    u64, s, vt = out.to_f64()
    ortho = np.abs(u64.T @ u64 - np.eye(out.rank)).max()
    print(f"rank {out.rank} at tol {TOL:g}: rel residual {resid:.3e} "
          f"(gate 5e-8), U orthogonality {ortho:.1e}, {wall:.2f} s "
          f"(cold, incl. compile)")
    # The residual must sit at the spectrum's truncation point, far
    # below anything f32 alone can reach (~1e-7 floor).
    assert resid <= 5 * TOL, resid
    # spectrum position of the first sigma_i/sigma_0 < 1e-8
    expect = int(np.searchsorted(-sig / sig[0], -TOL))
    assert abs(out.rank - expect) <= 2, (out.rank, expect)
    print("OK: f64-accuracy-class compression on", jax.default_backend())


if __name__ == "__main__":
    main()
