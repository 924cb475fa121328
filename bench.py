"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.md primary metric): **GB/s of matrix data compressed
per chip** by the fixed-rank randomized SVD pipeline (BASELINE.md config
3 shape: 8192x8192 block, k=100, q=2 power iterations, f32).

``vs_baseline`` is the wall-clock speedup against the *reference-style*
implementation: the identical algorithm (Gaussian sketch → power
iteration with QR re-orthogonalization → projection → dense SVD of the
small sketch) run through numpy/LAPACK on the host CPU — the same
BLAS/LAPACK backend the Rust reference links against
(/root/reference/Cargo.toml:30, src/compute_svd.rs:18-27).

Extra diagnostics (not the JSON line) go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


M = int(os.environ.get("BENCH_M", 8192))
N = int(os.environ.get("BENCH_N", 8192))
RANK = int(os.environ.get("BENCH_K", 100))
OVERSAMPLE = 8
POWER_ITERS = 2
REPS = int(os.environ.get("BENCH_REPS", 5))
CPU_BASELINE = os.environ.get("BENCH_CPU_BASELINE", "1") == "1"


def rsvd_flops(m, n, k, p, q):
    """Dominant FLOP count of the pipeline (matmuls + thin QRs)."""
    l = k + p
    sketch = 2 * m * n * l
    power = q * (4 * m * n * l + 2 * m * l * l + 2 * n * l * l)
    project = 2 * m * n * l
    small_svd = 8 * n * l * l
    lift = 2 * m * l * k
    return sketch + power + project + small_svd + lift


def cpu_reference_rsvd(a, k, p, q, rng):
    """Reference-style rSVD via numpy/LAPACK (the reference's backend)."""
    n = a.shape[1]
    l = k + p
    omega = rng.standard_normal((n, l), dtype=a.dtype)
    y = a @ omega
    for _ in range(q):
        qy, _ = np.linalg.qr(y)
        w, _ = np.linalg.qr(a.T @ qy)
        y = a @ w
    qy, _ = np.linalg.qr(y)
    b = qy.T @ a
    u_b, s, vt = np.linalg.svd(b, full_matrices=False)
    return (qy @ u_b)[:, :k], s[:k], vt[:k, :]


def backend_healthy(timeout_s: int | None = None) -> bool:
    """Probe the default backend in a subprocess (a hung TPU tunnel
    blocks uninterruptibly in-process; a subprocess can be killed)."""
    import subprocess

    if timeout_s is None:
        timeout_s = int(os.environ.get("RC_BENCH_PROBE_TIMEOUT", 90))
    code = ("import jax, jax.numpy as jnp; "
            "print(float((jnp.ones((256,256))@jnp.ones((256,256)))"
            "[0,0]))")
    try:
        subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                       check=True, capture_output=True)
        return True
    except Exception:
        return False


def backend_healthy_with_retry() -> bool:
    """Retry the health probe for a bounded window before giving up.

    TPU-tunnel outages here last on the order of an hour (CLAUDE.md);
    a single failed probe at capture time would permanently record a
    CPU number for the round. Retries every ~2 min for
    ``RC_BENCH_PROBE_WINDOW`` seconds (default 25 min, 0 = single
    probe) until the device answers.
    """
    window = float(os.environ.get("RC_BENCH_PROBE_WINDOW", 1500))
    deadline = time.monotonic() + window
    attempt = 0
    while True:
        attempt += 1
        if backend_healthy():
            if attempt > 1:
                log(f"backend recovered on probe attempt {attempt}")
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            log(f"backend probe failed {attempt}x over "
                f"{window:.0f}s window; giving up")
            return False
        wait = min(120.0, remaining)
        log(f"backend probe {attempt} failed; retrying in {wait:.0f}s "
            f"({remaining:.0f}s left in window)")
        time.sleep(wait)


def main():
    # Tunneled TPU backends sometimes hang on any device op; rather than
    # hang the harness, retry for a bounded window, then fall back to a
    # CPU run whose metric name says so (VERDICT r1: a near-identical
    # metric name on a different problem size misleads).
    if (os.environ.get("RC_BENCH_FALLBACK") != "1"
            and not backend_healthy_with_retry()):
        import subprocess

        log("default backend unhealthy (probe window exhausted); "
            "falling back to a small CPU config")
        env = dict(os.environ, RC_BENCH_FALLBACK="1", JAX_PLATFORMS="cpu",
                   BENCH_M="1024", BENCH_N="1024", BENCH_K="64")
        proc = subprocess.run([sys.executable, __file__], env=env,
                              capture_output=True, text=True, timeout=1200)
        sys.stderr.write(proc.stderr)
        print(proc.stdout.strip().splitlines()[-1] if proc.stdout.strip()
              else '{"metric": "bench_failed", "value": 0, "unit": "none", '
                   '"vs_baseline": 0}')
        return

    import jax
    import jax.numpy as jnp

    if os.environ.get("RC_BENCH_FALLBACK") == "1":
        jax.config.update("jax_platforms", "cpu")

    from rusty_compression_tpu.parallel.batch import rsvd_block
    from rusty_compression_tpu.utils.random_matrix import random_gaussian

    dev = jax.devices()[0]
    log(f"benchmark device: {dev.platform} ({dev.device_kind})")

    # Synthetic approximately-low-rank matrix (cheap to build at 8k):
    # A = G1 @ diag(sigma) @ G2 with a geometrically decaying spectrum.
    r = 4 * RANK
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    g1 = random_gaussian(k1, (M, r), dtype=jnp.float32)
    g2 = random_gaussian(k2, (r, N), dtype=jnp.float32)
    sigma = jnp.geomspace(1.0, 1e-6, r, dtype=jnp.float32)
    a = (g1 * sigma[None, :]) @ g2
    a = jax.block_until_ready(a)

    # gram small-SVD: valid here because the truncation target
    # (sigma_{k+1}/sigma_1 ~ 3e-2) is far above sqrt(eps_f32) ~ 3e-4;
    # the printed reconstruction error is the proof.
    from rusty_compression_tpu.utils.profiling import sync, timeit_slope

    run = jax.jit(lambda a, k: rsvd_block(a, k, rank=RANK,
                                          oversample=OVERSAMPLE,
                                          power_iters=POWER_ITERS,
                                          small_svd="gram"))
    t_tpu = timeit_slope(run, a, jax.random.key(1),
                         n1=5, n2=45, trials=max(REPS, 5))
    out = run(a, jax.random.key(1))
    sync(out)

    bytes_in = M * N * 4
    gbps = bytes_in / t_tpu / 1e9
    flops = rsvd_flops(M, N, RANK, OVERSAMPLE, POWER_ITERS)
    gflops = flops / t_tpu / 1e9
    log(f"rSVD {M}x{N} k={RANK} q={POWER_ITERS}: {t_tpu*1e3:.1f} ms, "
        f"{gbps:.1f} GB/s, {gflops:.0f} GFLOP/s")

    # accuracy gate: residual of the factorization vs HMT expectation
    u, s, vt = out.u, out.s, out.vt
    recon_err = float(jnp.linalg.norm(
        a - u @ (s[:, None] * vt)) / jnp.linalg.norm(a))
    log(f"rel reconstruction error: {recon_err:.3e} "
        f"(sigma_(k+1)/sigma_1 = {float(sigma[RANK]/sigma[0]):.3e})")

    # extra: single-pass generalized Nystrom (bandwidth-optimal; 2 HBM
    # passes over A vs 6 for q=2 power iteration). Looser accuracy
    # (~3x optimal) — reported alongside, not as the headline.
    from rusty_compression_tpu.sampling import nystrom_svd

    run_ny = jax.jit(lambda a, k: nystrom_svd(a, k, k=RANK,
                                              oversample=OVERSAMPLE,
                                              small_svd="gram"))
    t_ny = timeit_slope(run_ny, a, jax.random.key(7), n1=5, n2=45,
                        trials=max(REPS, 5))
    ny = run_ny(a, jax.random.key(7))
    ny_err = float(jnp.linalg.norm(
        a - ny.u @ (ny.s[:, None] * ny.vt)) / jnp.linalg.norm(a))
    log(f"nystrom single-pass: {t_ny*1e3:.1f} ms, "
        f"{bytes_in/t_ny/1e9:.1f} GB/s, rel err {ny_err:.3e}")

    # extra: bf16 sketching (opt-in knob) — HMT sampling products at
    # 1-pass bf16, final projection at policy precision. Valid here
    # because the target is tail-dominated (sigma_{k+1}/sigma_1 ~ 3e-2
    # >> bf16 sketch noise); the printed rel error is the proof.
    run_bf = jax.jit(lambda a, k: rsvd_block(a, k, rank=RANK,
                                             oversample=OVERSAMPLE,
                                             power_iters=POWER_ITERS,
                                             small_svd="gram",
                                             sketch_precision="default"))
    t_bf = timeit_slope(run_bf, a, jax.random.key(1), n1=5, n2=45,
                        trials=max(REPS, 5))
    out_bf = run_bf(a, jax.random.key(1))
    bf_err = float(jnp.linalg.norm(
        a - out_bf.u @ (out_bf.s[:, None] * out_bf.vt)) / jnp.linalg.norm(a))
    log(f"bf16-sketch rSVD: {t_bf*1e3:.1f} ms, {bytes_in/t_bf/1e9:.1f} GB/s, "
        f"rel err {bf_err:.3e}")

    # extra: device-side GB/s at the north-star tolerance (tol 1e-8) —
    # the fused compensated-precision capture, scan-iterated inside one
    # program so tunnel flush/transfer costs cancel (bench_kernels.py
    # methodology). Skipped on fallback (CPU time would be minutes).
    refined_gbps = None
    if not os.environ.get("RC_BENCH_FALLBACK") == "1" and M >= 4096:
        try:
            import bench_kernels as bk

            f6 = bk.measure_fused_1e8(m=4096, trials=4)
            g6 = f6["device_gbps_at_1e-8"]
            refined_gbps = round(g6, 3) if np.isfinite(g6) else None
            log(f"fused tol-1e-8 capture (device-side): "
                f"{f6['capture_ms']:.1f} ms = {refined_gbps} GB/s")
        except Exception as ex:  # keep the headline robust
            log(f"fused tol-1e-8 extra skipped: {ex!r}")

    vs_baseline = 1.0
    cpu_spread = None
    if CPU_BASELINE:
        # median-of-3 + recorded spread (VERDICT r4 next #7): a single
        # un-averaged numpy/LAPACK run swung the headline comparative
        # 155x -> 97x on denominator noise alone
        a_host = np.asarray(jax.device_get(a))
        rng = np.random.default_rng(0)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            cpu_reference_rsvd(a_host, RANK, OVERSAMPLE, POWER_ITERS, rng)
            runs.append(time.perf_counter() - t0)
        t_cpu = float(np.median(runs))
        cpu_spread = round((max(runs) - min(runs)) / t_cpu, 3)
        vs_baseline = t_cpu / t_tpu
        log(f"reference-style numpy/LAPACK pipeline: median "
            f"{t_cpu*1e3:.1f} ms of {[round(r*1e3) for r in runs]} "
            f"(spread {cpu_spread:.0%}) -> speedup {vs_baseline:.1f}x")

    fallback = os.environ.get("RC_BENCH_FALLBACK") == "1"
    name = f"rsvd_{M}x{N}_k{RANK}_q{POWER_ITERS}_f32_compression_throughput"
    if fallback:
        # A different machine AND a different problem size — the metric
        # name must not shadow the TPU headline (VERDICT r1, weak #8).
        name = f"cpu_fallback_{name}"
    print(json.dumps({
        "metric": name,
        "value": round(gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(vs_baseline, 3),
        "extra": {
            "gflops": round(gflops, 1),
            "wall_ms": round(t_tpu * 1e3, 2),
            "rel_error": recon_err,
            "nystrom_gbps": round(bytes_in / t_ny / 1e9, 3),
            "nystrom_rel_error": ny_err,
            "bf16_sketch_gbps": round(bytes_in / t_bf / 1e9, 3),
            "bf16_sketch_rel_error": bf_err,
            "refined_1e8_gbps_device": refined_gbps,
            "cpu_baseline_spread": cpu_spread,
            "device": f"{dev.platform}:{dev.device_kind}",
        },
    }))


if __name__ == "__main__":
    main()
