"""Complex (c64/c128) compression on a complex-rejecting accelerator.

The reference instantiates every container for complex scalars through
LAPACK's c/z kernels (rusty-compression src/qr.rs:408-416,
col_interp_decomp.rs:158-161). Some TPU backends reject every
complex-dtype op outright; this framework still runs the full container
family there, at two accuracy classes:

* **Standard (f32) class** — ``planarc``: the real randomized pipeline
  runs on the (2m, 2n) realification (all device FLOPs are real f32
  MXU GEMMs); the complex basis is recovered on the host and the small
  complex core math runs in host numpy. SVD, column ID (exact column
  slices), row ID, and two-sided ID (entrywise skeleton).
* **f64/c128 class** — ``highacc.refined_rsvd_planar``: the same
  realification with the double-float Ozaki machinery for tol <= 1e-8.

This demo builds a complex matrix with a known spectrum, compresses it
through both classes, and verifies the reference contracts (per-column
exactness, skeleton identity, residual vs the spectrum). Runs
identically on TPU (device all-real) and CPU.

Run: ``python examples/complex_operators.py``
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402

import rusty_compression_tpu as rc  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    m = n = 1024
    r_gen, dk = 96, 60  # spectrum decays to 1e-10 over 60 ranks
    sig = 10.0 ** (-10.0 * np.arange(r_gen) / (dk - 1))
    u, _ = np.linalg.qr(rng.standard_normal((m, r_gen))
                        + 1j * rng.standard_normal((m, r_gen)))
    v, _ = np.linalg.qr(rng.standard_normal((n, r_gen))
                        + 1j * rng.standard_normal((n, r_gen)))
    a = ((u * sig) @ v.conj().T).astype(np.complex64)

    print(f"matrix: {m}x{n} c64, spectrum 1 -> 1e-10 over {dk} ranks")
    print(f"device: {jax.devices()[0].device_kind} "
          f"(all complex math stays off it)\n")

    # ---- standard class: rSVD -------------------------------------------
    k = 27
    t0 = time.perf_counter()
    svd = rc.planar_rsvd(a, jax.random.key(1), rank=k)
    wall = time.perf_counter() - t0
    rec = svd.u @ (np.asarray(svd.s)[:, None] * svd.vt)
    err = np.linalg.norm(rec - a) / np.linalg.norm(a)
    print(f"planar rSVD rank {k}: rel err {err:.2e} "
          f"(spectrum position {sig[k]:.2e}), {wall:.2f} s")

    # ---- standard class: two-sided ID -----------------------------------
    t0 = time.perf_counter()
    ts = rc.planar_two_sided_id(a, jax.random.key(2), rank=k)
    wall = time.perf_counter() - t0
    rec = np.asarray(ts.to_mat())
    err = np.linalg.norm(rec - a) / np.linalg.norm(a)
    skel = a[np.ix_(np.asarray(ts.row_ind)[:ts.rank],
                    np.asarray(ts.col_ind)[:ts.rank])]
    skel_err = np.abs(np.asarray(ts.x) - skel).max() / np.abs(skel).max()
    print(f"planar two-sided ID rank {ts.rank}: rel err {err:.2e}, "
          f"skeleton entrywise {skel_err:.2e}, {wall:.2f} s")

    # ---- transparent dispatch (round 5): the STANDARD front door ---------
    # The caller never names planarc — QR.compute_from / SVD.compute_from /
    # rc.compress probe the backend once and route complex through the
    # host ?geqp3/?gesdd-class kernels + planar pipelines when the device
    # rejects complex (the reference's dtype-invisible macro surface,
    # qr.rs:408-416). Factors come back host-resident; every conversion
    # (compress, column_id, two_sided_id, to_mat) stays off the device.
    from rusty_compression_tpu.models.qr import QR

    qr = QR.compute_from(a)                       # c64 through the front door
    cid = qr.compress(rc.Rank(k)).column_id()
    err = np.linalg.norm(np.asarray(cid.to_mat()) - a) / np.linalg.norm(a)
    print(f"standard-API c64 QR -> column ID rank {k}: rel err {err:.2e} "
          f"(dispatched {'host/planar' if isinstance(qr.q, np.ndarray) else 'device'})")

    ts2 = rc.compress(a, jax.random.key(4),
                      rc.CompressionConfig.RANK(k, method="two_sided_id"))
    err = np.linalg.norm(np.asarray(ts2.to_mat()) - a) / np.linalg.norm(a)
    print(f"rc.compress c64 two-sided ID rank {ts2.rank}: rel err {err:.2e}")

    # ---- c128 class: refined planar rSVD at tol 1e-8 ---------------------
    a128 = a.astype(np.complex128)
    t0 = time.perf_counter()
    out = rc.refined_rsvd_planar(a128, jax.random.key(3), round_rank=66,
                                 tol=1e-8)
    wall = time.perf_counter() - t0
    res = out.residual_fro(a128)
    print(f"refined planar rSVD tol 1e-8: rank {out.rank}, "
          f"rel resid {res:.2e}, {wall:.2f} s")
    assert res <= 5e-8, res


if __name__ == "__main__":
    main()
