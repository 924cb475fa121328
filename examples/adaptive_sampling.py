"""Adaptive randomized range sampling with residual-convergence plot.

Re-creation of the reference example
``/root/reference/examples/adaptive_sampling.rs`` (lines 8-93): build a
500x200 synthetic matrix, adaptively sample its range to relative
tolerance 1e-5 in blocks of 5 columns, plot the *estimated* residual
(the sampler's probabilistic max-column-norm estimate) against the
*exact* residual ||A - Q Q^H A||_F / ||A||_F as a function of rank, then
finish the compression with ``QR.compute_from_range_estimate`` and
report the final error.

Writes ``examples/residuals.png`` (matching the reference's plotters
output) and prints the residual history.

Run: ``python examples/adaptive_sampling.py``
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
import numpy as np  # noqa: E402

import rusty_compression_tpu as rc  # noqa: E402


def main():
    m, n = 500, 200
    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.float32 if on_tpu else jnp.float64
    rel_tol, sample_size = (1e-4 if on_tpu else 1e-5), 5
    key = jax.random.key(0)

    mat = rc.random_approximate_low_rank_matrix(
        key, (m, n), sigma_max=1.0, sigma_min=1e-10, dtype=dt)

    print(f"Adaptively sampling the range of a {m}x{n} matrix "
          f"(tol {rel_tol:.0e}, block size {sample_size})...")
    q, residuals = rc.sample_range_adaptive(
        mat, jax.random.key(1), rel_tol, sample_size)
    print(f"Converged at rank {q.shape[1]} after {len(residuals)} blocks.")

    # Exact residual at each recorded rank (adaptive_sampling.rs:53-73).
    a = np.asarray(mat)
    a_norm = np.linalg.norm(a)
    ranks = [r for (r, _) in residuals]
    est = [e for (_, e) in residuals]
    exact = []
    qn = np.asarray(q)
    for r in ranks:
        qr_ = qn[:, :min(r, qn.shape[1])]
        exact.append(np.linalg.norm(a - qr_ @ (qr_.T @ a)) / a_norm)

    print(f"{'rank':>6} {'estimated':>12} {'exact':>12}")
    for r, e, x in zip(ranks, est, exact):
        print(f"{r:>6} {e:>12.3e} {x:>12.3e}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4.5))
        ax.semilogy(ranks, est, "o-", label="estimated (HMT probe)")
        ax.semilogy(ranks, exact, "s--", label="exact ||A - QQ^T A|| / ||A||")
        ax.axhline(rel_tol, color="gray", lw=0.8, label=f"tol {rel_tol:.0e}")
        ax.set_xlabel("rank")
        ax.set_ylabel("relative residual")
        ax.set_title("Adaptive range sampling convergence (500x200)")
        ax.legend()
        fig.tight_layout()
        out = __file__.replace("adaptive_sampling.py", "residuals.png")
        fig.savefig(out, dpi=120)
        print(f"\nWrote {out}")
    except ImportError:
        print("\n(matplotlib unavailable — skipping residuals.png)")

    # Finish the factorization from the range estimate (qr.rs:311-323).
    qr = rc.QR.compute_from_range_estimate(q, mat)
    err = float(rc.rel_diff_fro(qr.to_mat(), mat))
    print(f"\nQR from range estimate: rank {qr.rank}, "
          f"rel error {err:.3e} (tol {rel_tol:.0e})")


if __name__ == "__main__":
    main()
