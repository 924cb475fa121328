"""Full benchmark suite — measures the BASELINE.md configuration table.

Runs every configuration BASELINE.md lists (scaled to the active
backend's capabilities: f64 configs run on CPU hosts, f32 on TPU where
f64 is unsupported), enforces each config's accuracy gate, and appends
the results to ``BENCH_SUITE.jsonl`` + prints a markdown table.

The driver-facing single-metric harness is ``bench.py``; this suite is
the complete record for BASELINE.md's "to be measured" table.

Usage: ``python bench_suite.py`` (add ``BENCH_SMALL=1`` for a quick
CI-sized run).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SMALL = os.environ.get("BENCH_SMALL", "0") == "1"


def main():
    import jax
    import jax.numpy as jnp

    # A timeout/driver SIGTERM must still reach the finally-block: the
    # configs that DID complete are the window's evidence (same
    # insurance as bench_kernels).
    import signal

    def _term(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    import rusty_compression_tpu as rc
    from rusty_compression_tpu import parallel as par
    from rusty_compression_tpu.parallel.batch import (
        batched_rel_diff_fro, batched_two_sided_id, rsvd_block)
    from rusty_compression_tpu.utils.kernel_matrices import (
        hilbert, laplace_kernel_block, random_cloud)
    from rusty_compression_tpu.utils.profiling import sync, timeit_slope

    from rusty_compression_tpu.utils.mfu import hbm_util_pct, mfu_pct
    from rusty_compression_tpu.utils.precision import default_precision

    dev = jax.devices()[0]
    dt = jnp.float32 if on_tpu else jnp.float64
    dt_name = np.dtype(dt).name
    results = []

    def record(config, metric, value, unit, gate, gate_ok, extra=None,
               flops=None, seconds=None, mfu_precision=None):
        row = {"config": config, "metric": metric, "value": value,
               "unit": unit, "accuracy_gate": gate,
               "gate_ok": bool(gate_ok),
               "dtype": dt_name,
               "device": f"{dev.platform}:{dev.device_kind}"}
        if flops is not None and seconds:
            # % of effective peak = device bf16 peak derated by the
            # active precision policy (utils/mfu; VERDICT r1 weak #3).
            # mfu_precision overrides when the model already counts
            # bf16 passes directly (the Ozaki pipelines).
            m_ = mfu_pct(flops, seconds, dev.device_kind,
                         mfu_precision or default_precision())
            if m_ is not None:
                row["mfu_pct"] = round(m_, 1)
        if extra:
            row["extra"] = extra
        results.append(row)
        mfu_s = (f", MFU {row['mfu_pct']:.1f}%"
                 if "mfu_pct" in row else "")
        log(f"[{config}] {metric} = {value:.4g} {unit} "
            f"(gate {gate}: {'PASS' if gate_ok else 'FAIL'}{mfu_s})")

    # Any config crash (e.g. a tunnel/compile-helper death
    # mid-run) must not lose the configs already measured:
    # record + append happen in the finally block.
    try:
        # ---- config 1: adaptive sampling, 500x500, tol 1e-5 ----------------
        n = 200 if SMALL else 500
        tol = 1e-4 if on_tpu else 1e-5
        a = rc.random_approximate_low_rank_matrix(
            jax.random.key(0), (n, n), 1.0, 1e-10, dtype=dt)
        rc.sample_range_adaptive(a, jax.random.key(9), tol, 10)  # compile warmup
        t0 = time.perf_counter()
        q, hist = rc.sample_range_adaptive(a, jax.random.key(1), tol, 10)
        wall = time.perf_counter() - t0
        an, qn = np.asarray(a), np.asarray(q)
        resid = np.linalg.norm(an - qn @ (np.conj(qn.T) @ an)) / np.linalg.norm(an)
        record("1-adaptive", "wall_time", wall, "s",
               f"rel residual <= 5x{tol:g}", resid <= 5 * tol,
               {"achieved_rank": int(q.shape[1]), "rel_residual": float(resid)})

        # ---- config 1h: adaptive rank discovery at tol 1e-8 ----------------
        # The growth capture (highacc._capture_basis_growth): tol alone,
        # no rank hint — the reference's adaptive-sampling semantics
        # (random_sampling.rs:202-282) at the f64 accuracy class, far
        # below the f32 floor that bounds config 1's device loop.
        n1h, dk1h = (192, 40) if SMALL else (512, 120)
        rng1h = np.random.default_rng(18)
        sig1h = np.maximum(10.0 ** (-10.0 * np.arange(n1h) / (dk1h - 1)),
                           1e-12)
        u1h, _ = np.linalg.qr(rng1h.standard_normal((n1h, n1h)))
        v1h, _ = np.linalg.qr(rng1h.standard_normal((n1h, n1h)))
        a1h = (u1h * sig1h) @ v1h.T
        cross = int(np.argmax(sig1h / sig1h[0] < 1e-8))  # = 0.8(dk-1)
        # round 4: the fused growth loop (highacc._fused_growth) — the
        # whole rank-discovery while_loop is ONE device program instead
        # of O(rounds) tunnel round trips (0.27 s vs 0.88 s at 512^2).
        rc.refined_rsvd_fused(a1h, jax.random.key(18), tol=1e-8)  # warmup
        walls1h = []
        for t_ in range(3):
            t0 = time.perf_counter()
            out1h = rc.refined_rsvd_fused(a1h, jax.random.key(19 + 100 * t_),
                                          tol=1e-8)
            walls1h.append(time.perf_counter() - t0)
        wall1h = min(walls1h)
        res1h = out1h.residual_fro(a1h)
        record("1h-adaptive-1e8", "wall_time", wall1h, "s",
               "rel resid <= 5e-8 & rank at crossing +-10",
               res1h <= 5e-8 and abs(out1h.rank - cross) <= 10,
               {"achieved_rank": out1h.rank, "spectrum_crossing": cross,
                "rel_residual": float(res1h), "walls": walls1h,
                "history": [float(x) for x in out1h.history]})

        # ---- config 1hb: BATCHED growth — rank discovery at volume ---------
        # vmapped _fused_growth: per-block rank discovery for a whole
        # stack in one device program (VERDICT r3 next #4's bench row).
        nb1h = 8
        dks = [30 + 10 * (i % 4) for i in range(nb1h)]
        blocks1h = np.stack([
            (np.linalg.qr(np.random.default_rng(50 + i)
                          .standard_normal((256, 256)))[0]
             * np.maximum(10.0 ** (-10.0 * np.arange(256) / (dks[i] - 1)),
                          1e-12))
            @ np.linalg.qr(np.random.default_rng(80 + i)
                           .standard_normal((256, 256)))[0].T
            for i in range(nb1h)])
        from rusty_compression_tpu.highacc import refined_rsvd_fused_batch
        refined_rsvd_fused_batch(blocks1h, jax.random.key(51),
                                 tol=1e-8)  # warmup
        t0 = time.perf_counter()
        outs1h = refined_rsvd_fused_batch(blocks1h, jax.random.key(52),
                                          tol=1e-8)
        wall1hb = time.perf_counter() - t0
        ranks1h = [o.rank for o in outs1h]
        crossings = [int(np.argmax(10.0 ** (-10.0 * np.arange(256)
                                            / (dk - 1)) < 1e-8))
                     for dk in dks]
        res1hb = max(o.residual_fro(b) for o, b in zip(outs1h, blocks1h))
        ok1hb = (res1hb <= 5e-8 and
                 all(abs(r - c) <= 10 for r, c in zip(ranks1h, crossings)))
        record("1hb-batched-growth", "throughput", nb1h / wall1hb,
               "blocks/s", "every block: resid <= 5e-8 & rank at "
               "crossing +-10", ok1hb,
               {"wall_s": wall1hb, "ranks": ranks1h,
                "crossings": crossings, "max_rel_residual": float(res1hb)})

        # ---- config 2: column ID of a Hilbert matrix -----------------------
        n = 256 if SMALL else 1024
        tol = 1e-5 if on_tpu else 1e-8
        h = hilbert(n, dtype=dt)
        # numerical rank of Hilbert at any tol is tiny; cap the factorization
        # (exact sequential/Pallas pivoting path) instead of running n steps
        qr_full = rc.QR.compute_from(h, max_rank=64)
        qr_c = qr_full.compress(rc.CompressionType.ADAPTIVE(tol))
        cid = qr_c.column_id()
        err = float(rc.rel_diff_fro(cid.to_mat(), h))
        # oracle: optimal rank-k Frobenius error of the true spectrum
        s_h = np.asarray(jnp.linalg.svd(h, compute_uv=False))
        e_opt = float(np.sqrt((s_h[cid.rank:] ** 2).sum()) / 
                      np.sqrt((s_h ** 2).sum()))
        # per-column exactness of C (the reference oracle)
        cn, ind = np.asarray(cid.c), np.asarray(cid.col_ind)
        hn = np.asarray(h)
        col_exact = float(max(np.abs(cn[:, j] - hn[:, ind[j]]).max()
                              for j in range(cid.rank)))
        # Dispatch-immune timing (VERDICT r2 weak #8: the dispatch-slope
        # number swung 2.7x with tunnel weather): the factorization runs
        # inside one lax.scan with a serializing dependency.
        from rusty_compression_tpu.utils.profiling import scan_timeit

        dt2 = scan_timeit(
            lambda hh: rc.QR.compute_from(hh, max_rank=64, mode="auto"),
            h, reps=(2, 26), trials=5)
        gbps = h.size * h.dtype.itemsize / dt2 / 1e9
        record("2-column-id", "throughput", gbps, "GB/s",
               "rel err <= 10x optimal rank-k error & exact columns",
               err <= 10 * e_opt + 100 * np.finfo(dt_name).eps
               and col_exact < (1e-12 if not on_tpu else 1e-5),
               {"rank": int(cid.rank), "rel_err": err, "e_opt": e_opt,
                "col_exact": col_exact, "wall_s": dt2,
                # HBM roofline (VERDICT r2 weak #5): the blocked
                # small-k path reads the input ~twice (pivot sketch +
                # R-row projection); container math is O((m+n)k)
                "hbm_util_pct": hbm_util_pct(2 * h.size * h.dtype.itemsize,
                                             dt2, dev.device_kind)},
               # truncated Householder QR to rank 64 (4 m n k) + the
               # randomized pivot sketch (2 l m n, l = block+p)
               flops=4 * n * n * 64 + 2 * 40 * n * n, seconds=dt2)

        # ---- config 2h: column ID at tol 1e-8 (f64 accuracy class) ---------
        # The reference's flagship capability (interpolative decomposition
        # at native f64, qr.rs:270-309) — previously f32-floored on TPU
        # (config 2 gates at 1e-5). highacc_id: Ozaki capture on the MXU
        # + host f64 core pivoting; C columns bitwise-exact.
        n2h = 256 if SMALL else 1024
        i2h = np.arange(n2h, dtype=np.float64)
        h64 = 1.0 / (i2h[:, None] + i2h[None, :] + 1.0)  # true f64 Hilbert
        rc.refined_column_id(h64, jax.random.key(20), tol=1e-8)  # warmup
        walls2h = []
        for t_ in range(2 if SMALL else 3):
            t0 = time.perf_counter()
            cid2h = rc.refined_column_id(h64, jax.random.key(21 + t_),
                                         tol=1e-8)
            walls2h.append(time.perf_counter() - t0)
        wall2h = min(walls2h)
        err2h = float(np.linalg.norm(cid2h.c @ cid2h.z - h64)
                      / np.linalg.norm(h64))
        ind2h = np.asarray(cid2h.col_ind)
        colex = all(np.array_equal(np.asarray(cid2h.c)[:, j],
                                   h64[:, ind2h[j]])
                    for j in range(cid2h.rank))
        record("2h-column-id-1e8", "throughput",
               h64.nbytes / wall2h / 1e9, "GB/s",
               "rel err <= 5e-8 & bitwise-exact columns",
               err2h <= 5e-8 and colex,
               {"rank": int(cid2h.rank), "rel_err": err2h,
                "col_bitwise_exact": bool(colex), "wall_s": wall2h,
                "walls": walls2h})

        # ---- config 3: fixed-rank rSVD (k=100, q=2) ------------------------
        m = 1024 if SMALL else 8192
        k, p, q_it = (32, 8, 2) if SMALL else (100, 8, 2)
        r = 4 * k
        k1, k2 = jax.random.split(jax.random.key(2))
        g1 = rc.random_gaussian(k1, (m, r), dtype=dt)
        g2 = rc.random_gaussian(k2, (r, m), dtype=dt)
        sig = jnp.geomspace(1.0, 1e-6, r, dtype=dt)
        a3 = (g1 * sig[None, :]) @ g2
        sync(a3)
        small_svd = "gram" if on_tpu else "direct"
        run3 = jax.jit(lambda a, key: rsvd_block(a, key, rank=k, oversample=p,
                                                 power_iters=q_it,
                                                 small_svd=small_svd))
        dt3 = timeit_slope(run3, a3, jax.random.key(3), n1=3,
                           n2=23 if on_tpu else 7, trials=3)
        l = k + p
        flops = (2 * m * m * l) * (2 * q_it + 2) + 8 * m * l * l
        svd3 = run3(a3, jax.random.key(3))
        err3 = float(rc.rel_diff_fro(svd3.to_mat(), a3))
        record("3-rsvd", "compute", flops / dt3 / 1e9, "GFLOP/s",
               "rel err <= 3x sigma_{k+1}",
               err3 <= 3 * float(sig[k] / sig[0]),
               {"wall_ms": dt3 * 1e3, "rel_err": err3,
                "gbps": m * m * a3.dtype.itemsize / dt3 / 1e9},
               flops=flops, seconds=dt3)

        # ---- config 4: batched two-sided ID of BEM blocks ------------------
        nb, mb = (4, 256) if SMALL else (8, 2048)
        # the admissible-block spectrum hits the dtype's noise floor near
        # rank ~20 (f32) / ~100 (f64); the interpolative solve must stay
        # strictly inside the numerical rank
        rank4 = 16 if SMALL else (16 if on_tpu else 100)
        kt, ks = jax.random.split(jax.random.key(4))
        blocks = []
        for i in range(nb):
            kti, ksi = jax.random.fold_in(kt, i), jax.random.fold_in(ks, i)
            x = random_cloud(kti, mb, (0.0, 0.0, 0.0))
            y = random_cloud(ksi, mb, (3.0, 0.0, 0.0))  # separated -> low rank
            blocks.append(laplace_kernel_block(x, y, dtype=dt))
        stack = jnp.stack(blocks)
        sync(stack)
        run4 = jax.jit(lambda s, key: batched_two_sided_id(s, key, rank=rank4))
        dt4 = timeit_slope(run4, stack, jax.random.key(5), n1=1, n2=4, trials=3)
        tsid = run4(stack, jax.random.key(5))
        errs4 = np.asarray(batched_rel_diff_fro(tsid, stack))
        blocks_s = nb / dt4
        # ID coefficients solve against R11 with kappa ~ sigma_1/sigma_k
        # (~5e5 here), so the f32 error floor is kappa * eps ~ 5e-3 — the
        # same bound that makes the reference relax its f32 gates
        # (row_interp_decomp.rs:231). f64 keeps the tight gate.
        gate4 = 5e-3 if on_tpu else 1e-4
        record("4-two-sided-id", "throughput", blocks_s, "blocks/s",
               f"rel err <= {gate4:g} (admissible blocks)",
               bool(np.all(errs4 <= gate4)),
               {"gbps": stack.size * stack.dtype.itemsize / dt4 / 1e9,
                "max_rel_err": float(errs4.max()), "block_dim": mb,
                "rank": rank4,
                "hbm_util_pct": hbm_util_pct(
                    2 * stack.size * stack.dtype.itemsize, dt4,
                    dev.device_kind)},
               # per block: truncated pivoted QR of (mb, mb) to rank k
               # (4 m n k), LQ of C (4 m k^2), ID triangular solves (k^2 n)
               flops=nb * (4 * mb * mb * rank4 + 4 * mb * rank4 ** 2
                           + rank4 ** 2 * mb), seconds=dt4)

        # ---- config 4b: the literal BASELINE.json dims (16384^2) --------
        # 64 simultaneous f32 blocks would need 64 GB HBM; the metric is
        # blocks/s, so blocks stream one at a time through a single
        # compiled program (the deployment pattern for blocks this
        # size). TPU only — a 16384^2 kernel block is impractical on
        # the CPU CI hosts.
        if on_tpu and not SMALL:
            mb_b = 16384
            rank_b = 16
            kxb, kyb = jax.random.split(jax.random.key(40))
            xb = random_cloud(kxb, mb_b, (0.0, 0.0, 0.0))
            yb = random_cloud(kyb, mb_b, (3.0, 0.0, 0.0))
            blk_b = laplace_kernel_block(xb, yb, dtype=dt)
            sync(blk_b)
            run4b = jax.jit(
                lambda b, key: batched_two_sided_id(b[None], key,
                                                    rank=rank_b))
            dt4b = timeit_slope(run4b, blk_b, jax.random.key(41), n1=1,
                                n2=4, trials=3)
            tsid_b = run4b(blk_b, jax.random.key(41))
            err4b = float(np.asarray(
                batched_rel_diff_fro(tsid_b, blk_b[None])).max())
            record("4b-two-sided-id-16k", "throughput", 1.0 / dt4b,
                   "blocks/s", "rel err <= 0.005 (admissible blocks)",
                   err4b <= 5e-3,
                   {"gbps": blk_b.size * blk_b.dtype.itemsize / dt4b / 1e9,
                    "block_dim": mb_b, "rank": rank_b,
                    "max_rel_err": err4b, "wall_s": dt4b,
                    "hbm_util_pct": hbm_util_pct(
                        2 * blk_b.size * blk_b.dtype.itemsize, dt4b,
                        dev.device_kind)},
                   flops=(4 * mb_b * mb_b * rank_b + 4 * mb_b * rank_b ** 2
                          + rank_b ** 2 * mb_b), seconds=dt4b)

            # ---- config 4b1: ONE-read sketched two-sided ID at the same
            # dims (VERDICT r3 weak #6: the blocked-RRQR route is 2-read
            # — sketch + R-rows — capping it at ~385 blocks/s; the
            # sketched ID reads the block once, halving the bandwidth
            # floor; sampling.sketched_two_sided_id) ---------------------
            from rusty_compression_tpu.parallel.batch import (
                batched_sketched_two_sided_id)

            run4b1 = jax.jit(
                lambda b, key: batched_sketched_two_sided_id(b[None], key,
                                                             rank=rank_b))
            dt4b1 = timeit_slope(run4b1, blk_b, jax.random.key(42), n1=1,
                                 n2=4, trials=3)
            tsid_b1 = run4b1(blk_b, jax.random.key(42))
            err4b1 = float(np.asarray(
                batched_rel_diff_fro(tsid_b1, blk_b[None])).max())
            record("4b1-two-sided-id-16k-oneread", "throughput", 1.0 / dt4b1,
                   "blocks/s", "rel err <= 0.005 (admissible blocks)",
                   err4b1 <= 5e-3,
                   {"gbps": blk_b.size * blk_b.dtype.itemsize / dt4b1 / 1e9,
                    "block_dim": mb_b, "rank": rank_b,
                    "max_rel_err": err4b1, "wall_s": dt4b1,
                    "hbm_util_pct": hbm_util_pct(
                        blk_b.size * blk_b.dtype.itemsize, dt4b1,
                        dev.device_kind)},
                   flops=(2 * mb_b * mb_b * (rank_b + 8)
                          + 4 * mb_b * rank_b ** 2), seconds=dt4b1)

            # ---- config 4b1t: sketched ID in TOLERANCE mode (round 5:
            # the sketch QRCP diagonal picks the rank — qr.rs:186-200
            # applied to the sketch; VERDICT r4 next #6) ----------------
            tol41 = 1e-3
            t0 = time.perf_counter()
            ts41 = rc.sketched_two_sided_id(blk_b, jax.random.key(43),
                                            tol=tol41, max_rank=64)
            err41 = float(jax.device_get(
                rc.rel_diff_fro(ts41.to_mat(), blk_b)))  # device-side
            dt41 = time.perf_counter() - t0
            record("4b1t-two-sided-id-16k-tol", "throughput", 1.0 / dt41,
                   "blocks/s", f"rel err <= 5*{tol41:g} & rank <= 64",
                   err41 <= 5 * tol41 and ts41.rank <= 64,
                   {"rank": int(ts41.rank), "max_rel_err": err41,
                    "wall_s": dt41, "tol": tol41})

        # ---- config 4h: two-sided ID at tol 1e-8 (BEM block) ---------------
        # BASELINE config 4's decomposition at the reference's accuracy
        # class: adaptive (tol-only) capture + host f64 skeleton math;
        # X is the bitwise skeleton submatrix. The kernel block is built
        # in TRUE f64 on the host (the on-device builder is f32 on TPU,
        # which cannot support a 1e-8 contract).
        m4h = 512 if SMALL else 8192
        rng4h = np.random.default_rng(44)
        x4h = rng4h.uniform(-1.0, 1.0, (m4h, 3))
        y4h = rng4h.uniform(-1.0, 1.0, (m4h, 3))
        y4h[:, 0] += 3.0  # separated clouds -> admissible (low-rank) block
        b4h = np.empty((m4h, m4h))
        for r0 in range(0, m4h, 1024):
            d_ = np.linalg.norm(x4h[r0:r0 + 1024, None, :]
                                - y4h[None, :, :], axis=-1)
            b4h[r0:r0 + 1024] = 1.0 / d_
        rc.refined_two_sided_id(  # warmup (compiles the growth stages)
            b4h, jax.random.key(44), tol=1e-8)
        t0 = time.perf_counter()
        ts4h = rc.refined_two_sided_id(b4h, jax.random.key(45), tol=1e-8)
        wall4h = time.perf_counter() - t0
        err4h = float(np.linalg.norm(ts4h.c @ (ts4h.x @ ts4h.r) - b4h)
                      / np.linalg.norm(b4h))
        ri = np.asarray(ts4h.row_ind)[:ts4h.rank]
        ci = np.asarray(ts4h.col_ind)[:ts4h.rank]
        skel_ok = np.array_equal(np.asarray(ts4h.x), b4h[ri[:, None], ci])
        record("4h-two-sided-id-1e8", "throughput", 1.0 / wall4h,
               "blocks/s", "rel err <= 1e-7 & bitwise skeleton",
               err4h <= 1e-7 and skel_ok,
               {"gbps": b4h.nbytes / wall4h / 1e9, "block_dim": m4h,
                "rank": int(ts4h.rank), "rel_err": err4h,
                "skeleton_bitwise": bool(skel_ok), "wall_s": wall4h})

        # ---- config 5: data-parallel scaling over the device mesh ----------
        ndev = jax.local_device_count()
        if ndev > 1:
            nb5 = ndev * (2 if SMALL else 4)
            mb5 = 128 if SMALL else 512
            k5 = 16 if SMALL else 50
            bl = rc.random_gaussian(jax.random.key(6), (nb5, mb5, mb5), dtype=dt)
            sync(bl)
            mesh = par.make_mesh()
            run_1 = jax.jit(lambda b, key: par.compress_blocks(b, key, k5))
            t_1 = timeit_slope(run_1, bl, jax.random.key(7), n1=1, n2=3,
                               trials=3)
            t_n = timeit_slope(
                lambda b, key: par.compress_blocks(b, key, k5, mesh=mesh),
                bl, jax.random.key(7), n1=1, n2=3, trials=3)
            eff = (t_1 / t_n) / ndev
            gate5 = ">= 80% linear" + (
                "" if on_tpu else " (virtual devices share host cores; "
                "expected to fail off-TPU)")
            record("5-scaling", "efficiency", eff * 100, "%",
                   gate5, eff >= 0.8,
                   {"n_devices": ndev, "t_single_s": t_1, "t_mesh_s": t_n})
        else:
            log("[5-scaling] skipped: single device visible")

        # ---- config 6: tol-1e-8 refined rSVD (the north-star tolerance) ----
        # The f64-accuracy-class pipeline (highacc.refined_rsvd): f32 HMT
        # rounds + Ozaki-GEMM residual refinement + DF merge. Runs on the
        # MXU as bf16 slice products — THIS is the per-chip GB/s at tol
        # 1e-8 the BASELINE.json primary metric asks for. Bytes counted at
        # f64 width (the data is f64-class, matching the reference's dgemm
        # pipelines and the CPU-host comparison rows).
        # Fused single-dispatch capture (round 2): the stage-by-stage route
        # paid 25 ms-1.5 s of tunnel flush latency ~30x per run and was
        # latency-bound, not compute-bound (walls 13-50 s for ~100 ms of
        # device work).
        from rusty_compression_tpu.highacc import refined_rsvd_fused as refined_rsvd

        m6 = 1024 if SMALL else 4096
        rank_decay, r_gen = (60, 96) if SMALL else (120, 160)
        rng6 = np.random.default_rng(6)
        sig6 = 10.0 ** (-10.0 * np.arange(r_gen) / (rank_decay - 1))
        u6, _ = np.linalg.qr(rng6.standard_normal((m6, r_gen)))
        v6, _ = np.linalg.qr(rng6.standard_normal((m6, r_gen)))
        a6 = (u6 * sig6) @ v6.T
        k6 = int(rank_decay * 1.1)
        tol6 = 1e-8

        def run6():
            return refined_rsvd(a6, jax.random.key(8), round_rank=k6,
                                tol=tol6, refine_rounds=1)

        out6 = run6()  # compile warmup (every jitted stage)
        walls = []
        for _ in range(2 if SMALL else 3):
            t0 = time.perf_counter()
            out6 = run6()
            walls.append(time.perf_counter() - t0)
        wall6 = min(walls)
        resid6 = out6.residual_fro(a6)
        gbps6 = m6 * m6 * 8 / wall6 / 1e9
        from rusty_compression_tpu.highacc import fused_capture_flops

        flops6 = fused_capture_flops(m6, m6, k6 + 10)
        record("6-refined-1e-8", "throughput", gbps6, "GB/s",
               f"rel resid <= 5x{tol6:g}", resid6 <= 5 * tol6,
               {"wall_s": wall6, "rel_residual": float(resid6),
                "rank": out6.rank, "walls": walls,
                "model_gflop": round(flops6 / 1e9, 1)},
               # capture-model FLOPs counted in bf16 passes vs the RAW
               # bf16 peak (VERDICT r2 weak #1); wall includes transfer
               # + host tail, so this MFU is a lower bound — the
               # device-side figure lives in bench_kernels (fused_1e8)
               flops=flops6, seconds=wall6, mfu_precision="default")

        # ---- config 6c: complex (c128-class) fused capture on TPU ----------
        # The planar 4x-real Ozaki route (reference z-kernel class,
        # qr.rs:408-416). Probed in a SUBPROCESS first on TPU: an
        # UNIMPLEMENTED backend rejection poisons the probing process's
        # backend state (CLAUDE.md).
        m6c = 256 if SMALL else 2048
        dk6c, rg6c = (30, 48) if SMALL else (60, 96)
        rng6c = np.random.default_rng(66)
        sig6c = 10.0 ** (-10.0 * np.arange(rg6c) / (dk6c - 1))
        u6c, _ = np.linalg.qr(rng6c.standard_normal((m6c, rg6c))
                              + 1j * rng6c.standard_normal((m6c, rg6c)))
        v6c, _ = np.linalg.qr(rng6c.standard_normal((m6c, rg6c))
                              + 1j * rng6c.standard_normal((m6c, rg6c)))
        a6c = (u6c * sig6c) @ v6c.conj().T
        k6c = int(dk6c * 1.1)
        cx_ok, cx_why = True, ""
        if on_tpu:
            import subprocess as _sp
            probe = (
                "import numpy as np, jax\n"
                "import rusty_compression_tpu as rc\n"
                "rng = np.random.default_rng(0)\n"
                "u, _ = np.linalg.qr(rng.standard_normal((128, 24))"
                " + 1j * rng.standard_normal((128, 24)))\n"
                "a = (u * np.geomspace(1, 1e-9, 24)) @ u[:96, :].conj().T\n"
                "o = rc.refined_rsvd_fused(a, jax.random.key(0),"
                " round_rank=20, refine_rounds=1)\n"
                "print('RESID', o.residual_fro(a))\n")
            try:
                pr = _sp.run([sys.executable, "-c", probe],
                             capture_output=True, text=True, timeout=420)
                cx_ok = pr.returncode == 0 and "RESID" in pr.stdout
                if not cx_ok:
                    lines = [ln for ln in pr.stderr.strip().splitlines()
                             if "Error" in ln or "error" in ln]
                    cx_why = (lines or pr.stderr.strip().splitlines()
                              or ["?"])[-1][:200]
            except _sp.TimeoutExpired:
                cx_ok, cx_why = False, "probe timed out (tunnel)"
        # Backends that reject complex dtypes outright (this tunnel
        # returns UNIMPLEMENTED even for a c64 add) run the realified
        # ALL-REAL route (highacc.refined_rsvd_planar); others run the
        # complex-storage fused capture.
        def run6c_fused():
            return refined_rsvd(a6c, jax.random.key(66),
                                round_rank=k6c, tol=1e-8,
                                refine_rounds=1)

        def run6c_planar():
            return rc.refined_rsvd_planar(a6c, jax.random.key(66),
                                          round_rank=k6c, tol=1e-8,
                                          refine_rounds=1)

        # Route order from the probe, but NEVER crash the suite on a
        # route failure: fall back to the other route, and on a double
        # failure record a STRUCTURED skip (config 6c round-3 weakness:
        # raw tracebacks in the record + the crash losing config 7).
        routes6c = ([("complex-storage fused", run6c_fused),
                     ("realified planar", run6c_planar)] if cx_ok else
                    [(f"realified planar (complex rejected: "
                      f"{cx_why[:60]})", run6c_planar),
                     ("complex-storage fused", run6c_fused)])
        skip6c = []
        for route6c, run6c in routes6c:
            try:
                out6c = run6c()  # warmup
                t0 = time.perf_counter()
                out6c = run6c()
                wall6c = time.perf_counter() - t0
                res6c = out6c.residual_fro(a6c)
                record("6c-refined-c64-1e8", "throughput",
                       a6c.nbytes / wall6c / 1e9, "GB/s",
                       "rel resid <= 5e-8 (c128 class)",
                       res6c <= 5e-8,
                       {"wall_s": wall6c, "rel_residual": float(res6c),
                        "rank": out6c.rank, "block_dim": m6c,
                        "route": route6c})
                break
            except Exception as ex:  # noqa: BLE001 — recorded, not lost
                skip6c.append({"route": route6c.split(" (")[0],
                               "type": type(ex).__name__,
                               "detail": str(ex).splitlines()[0][:160]
                               if str(ex) else ""})
        else:
            record("6c-refined-c64-1e8", "skipped", 0.0, "",
                   "rel resid <= 5e-8 (c128 class)", False,
                   {"skip": skip6c, "block_dim": m6c})

        # ---- config 6s: STANDARD-class (f32) c64 two-sided ID on TPU -------
        # The planar container route (planarc.py): realified all-real
        # device capture + host complex core — the reference's c-kernel
        # container class (qr.rs:408-416) on a complex-rejecting chip.
        # Reuses the 6c fixture; bytes counted at the input's c64 width.
        try:
            # rank inside the f32 capture floor: sigma(k6s) ~ 1e-4.5
            k6s = max(8, int(0.45 * dk6c))
            a6s = a6c.astype(np.complex64)

            def run6s():
                return rc.planar_two_sided_id(a6s, jax.random.key(67),
                                              rank=k6s)

            ts6s = run6s()  # warmup (device capture programs)
            t0 = time.perf_counter()
            ts6s = run6s()
            wall6s = time.perf_counter() - t0
            k6s = ts6s.rank  # numerical-rank clamp may trim
            rec6s = np.asarray(ts6s.to_mat())
            err6s = float(np.linalg.norm(rec6s - a6s)
                          / np.linalg.norm(a6s))
            skel = a6s[np.ix_(np.asarray(ts6s.row_ind)[:k6s],
                              np.asarray(ts6s.col_ind)[:k6s])]
            skel_err = float(np.abs(np.asarray(ts6s.x) - skel).max()
                             / max(np.abs(skel).max(), 1e-30))
            record("6s-planar-c64-two-sided-id", "throughput",
                   a6s.nbytes / wall6s / 1e9, "GB/s",
                   "rel err <= 5e-4 & skeleton entrywise <= 1e-3 (f32 "
                   "class, device all-real)",
                   err6s <= 5e-4 and skel_err <= 1e-3,
                   {"wall_s": wall6s, "rel_err": err6s,
                    "skeleton_err": skel_err, "rank": k6s,
                    "block_dim": m6c})
        except Exception as ex:  # noqa: BLE001 — recorded, not lost
            record("6s-planar-c64-two-sided-id", "skipped", 0.0, "",
                   "rel err <= 5e-4 (f32 class)", False,
                   {"skip": [{"type": type(ex).__name__,
                              "detail": str(ex).splitlines()[0][:160]
                              if str(ex) else ""}]})

        # ---- config 6st: TRANSPARENT complex dispatch (round 5,
        # VERDICT r4 next #5): a c64 block through the STANDARD front
        # door (rc.compress) — on the complex-rejecting device the
        # cached probe routes it through the planar pipeline without
        # the caller naming planarc ------------------------------------
        try:
            from rusty_compression_tpu.utils.backend import (
                backend_accepts_complex)

            cfg6t = rc.CompressionConfig.RANK(k6s, method="two_sided_id")
            ts6t = rc.compress(a6s, jax.random.key(69), cfg6t)  # warmup
            t0 = time.perf_counter()
            ts6t = rc.compress(a6s, jax.random.key(69), cfg6t)
            wall6t = time.perf_counter() - t0
            rec6t = np.asarray(ts6t.to_mat())
            err6t = float(np.linalg.norm(rec6t - a6s)
                          / np.linalg.norm(a6s))
            record("6st-standard-api-c64-dispatch", "throughput",
                   a6s.nbytes / wall6t / 1e9, "GB/s",
                   "rel err <= 5e-4 via rc.compress (dtype-invisible "
                   "front door, qr.rs:408-416 semantics)",
                   err6t <= 5e-4,
                   {"wall_s": wall6t, "rel_err": err6t,
                    "rank": int(ts6t.rank),
                    "device_accepts_complex": backend_accepts_complex(),
                    "factors_host": isinstance(ts6t.x, np.ndarray)})
        except Exception as ex:  # noqa: BLE001
            record("6st-standard-api-c64-dispatch", "skipped", 0.0, "",
                   "rc.compress on c64", False,
                   {"skip": [{"type": type(ex).__name__,
                              "detail": str(ex).splitlines()[0][:160]
                              if str(ex) else ""}]})

        # ---- config 6s8k: planarc at BEM scale (VERDICT r4 next #8:
        # 6s was only ever benched at 2048²; show the planar route
        # holds at 8192² with the skeleton contract) -------------------
        try:
            m8k = 1024 if SMALL else 8192
            dk8 = 96
            rng8 = np.random.default_rng(68)
            # low-rank complex block via thin factors (host QR of thin
            # panels only — full 8192² c128 QR would dwarf the bench)
            u8, _ = np.linalg.qr(rng8.standard_normal((m8k, dk8))
                                 + 1j * rng8.standard_normal((m8k, dk8)))
            v8, _ = np.linalg.qr(rng8.standard_normal((m8k, dk8))
                                 + 1j * rng8.standard_normal((m8k, dk8)))
            sig8 = np.geomspace(1.0, 1e-9, dk8)
            a8 = ((u8 * sig8) @ v8.conj().T).astype(np.complex64)
            k8 = max(8, int(0.45 * dk8))

            def run6s8k():
                return rc.planar_two_sided_id(a8, jax.random.key(68),
                                              rank=k8)

            ts8 = run6s8k()  # warmup
            t0 = time.perf_counter()
            ts8 = run6s8k()
            wall8 = time.perf_counter() - t0
            k8r = ts8.rank
            rec8 = np.asarray(ts8.to_mat())
            err8 = float(np.linalg.norm(rec8 - a8) / np.linalg.norm(a8))
            skel8 = a8[np.ix_(np.asarray(ts8.row_ind)[:k8r],
                              np.asarray(ts8.col_ind)[:k8r])]
            skel_err8 = float(np.abs(np.asarray(ts8.x) - skel8).max()
                              / max(np.abs(skel8).max(), 1e-30))
            record("6s8k-planar-c64-two-sided-id-8k", "throughput",
                   a8.nbytes / wall8 / 1e9, "GB/s",
                   "rel err <= 10*sigma(k) & skeleton entrywise <= 1e-3",
                   err8 <= 10 * float(sig8[min(k8r, dk8 - 1)])
                   and skel_err8 <= 1e-3,
                   {"wall_s": wall8, "rel_err": err8,
                    "skeleton_err": skel_err8, "rank": int(k8r),
                    "block_dim": m8k})
        except Exception as ex:  # noqa: BLE001
            record("6s8k-planar-c64-two-sided-id-8k", "skipped", 0.0, "",
                   "planarc at 8192^2", False,
                   {"skip": [{"type": type(ex).__name__,
                              "detail": str(ex).splitlines()[0][:160]
                              if str(ex) else ""}]})

        # ---- config 7: tol-1e-8 block stream (vmapped fused batches) ----
        # The volume x accuracy cross of BASELINE config 5: a stream of
        # heterogeneous blocks at the north-star tolerance through the
        # chunked scheduler (highacc.refined_rsvd_fused_batch — O(1)
        # dispatches per bucket chunk). blocks/s including per-block
        # f64 verification.
        nb7, m7 = (6, 96) if SMALL else (32, 256)
        rng7 = np.random.default_rng(7)
        dk7 = 30 if SMALL else 48
        blocks7 = []
        for _ in range(nb7):
            kk = dk7 + 16
            s7 = np.maximum(10.0 ** (-10.0 * np.arange(kk) / (dk7 - 1)),
                            1e-12)
            u7, _ = np.linalg.qr(rng7.standard_normal((m7, kk)))
            v7, _ = np.linalg.qr(rng7.standard_normal((m7 - 16, kk)))
            blocks7.append((u7 * s7) @ v7.T)
        par.compress_heterogeneous_refined(  # compile warmup
            blocks7[:2], jax.random.key(11), rel_tol=1e-8,
            round_rank=int(dk7 * 1.2), bucket_floor=64)
        t0 = time.perf_counter()
        res7 = par.compress_heterogeneous_refined(
            blocks7, jax.random.key(12), rel_tol=1e-8,
            round_rank=int(dk7 * 1.2), bucket_floor=64)
        wall7 = time.perf_counter() - t0
        err7 = max(r.rel_residual for r in res7)
        bm7 = 64 * -(-m7 // 64)  # bucket dims the chunks actually ran at
        flops7 = nb7 * fused_capture_flops(bm7, bm7, int(dk7 * 1.2) + 10)
        record("7-refined-stream", "throughput", nb7 / wall7, "blocks/s",
               "every block rel resid <= 5x1e-08", err7 <= 5e-8,
               {"n_blocks": nb7, "block_dim": m7, "wall_s": wall7,
                "max_rel_residual": float(err7),
                "gbps": sum(b.nbytes for b in blocks7) / wall7 / 1e9,
                "model_gflop": round(flops7 / 1e9, 1)},
               flops=flops7, seconds=wall7, mfu_precision="default")

    finally:
        with open("BENCH_SUITE.jsonl", "a") as f:
            stamp = {"ts": time.time(), "results": results}
            f.write(json.dumps(stamp) + "\n")

        print("\n| config | metric | value | MFU | accuracy gate |")
        print("|---|---|---|---|---|")
        for r_ in results:
            mfu_cell = (f"{r_['mfu_pct']:.1f}%" if "mfu_pct" in r_ else "—")
            print(f"| {r_['config']} | {r_['metric']} | {r_['value']:.4g} "
                  f"{r_['unit']} | {mfu_cell} | "
                  f"{'PASS' if r_['gate_ok'] else 'FAIL'}: "
                  f"{r_['accuracy_gate']} |")


if __name__ == "__main__":
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    main()
