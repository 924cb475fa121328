"""Round-4 A/B: config-7 stream residual localization.

The stream's max resid ~4.9e-8 (vs 8.7e-9 single-block config 6)
corresponds to the host-SVD truncation landing ~3 ranks early — the
captured core's weak singular values are deflated. Candidates: the
cut-merge (magnitude cut + _svqb_cut eigencut) dropping genuine weak
directions on TPU, a vmapped-vs-single difference, or the scheduler
wiring. One window answers all three:

  A) exact bench config-7 via the scheduler (headline number)
  B) direct vmapped capture on the padded stack, cut_merge True/False
  C) single-block refined_rsvd_fused on the worst block
"""
import time

import numpy as np
import jax

from rusty_compression_tpu import highacc
from rusty_compression_tpu import parallel as par
from rusty_compression_tpu.highacc import _fused_capture_vmapped
from rusty_compression_tpu.utils.doublefloat import df_from_f64, df_to_f64

t0 = time.perf_counter()
jax.device_get(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
print(f"health {time.perf_counter()-t0:.2f}s", flush=True)

nb7, m7, dk7 = 32, 256, 48
rng7 = np.random.default_rng(7)
blocks7 = []
for _ in range(nb7):
    kk = dk7 + 16
    s7 = np.maximum(10.0 ** (-10.0 * np.arange(kk) / (dk7 - 1)), 1e-12)
    u7, _ = np.linalg.qr(rng7.standard_normal((m7, kk)))
    v7, _ = np.linalg.qr(rng7.standard_normal((m7 - 16, kk)))
    blocks7.append((u7 * s7) @ v7.T)

# --- A: exact bench wiring ------------------------------------------------
t0 = time.perf_counter()
res = par.compress_heterogeneous_refined(
    blocks7, jax.random.key(12), rel_tol=1e-8,
    round_rank=int(dk7 * 1.2), bucket_floor=64)
w = time.perf_counter() - t0
resids = np.array([r.rel_residual for r in res])
order = np.argsort(resids)
print(f"A scheduler: max {resids.max():.3e} at block {order[-1]} "
      f"top3 {[f'{resids[i]:.2e}' for i in order[-3:]]} wall {w:.0f}s",
      flush=True)
ranks = [r.factors.s.shape[0] if hasattr(r.factors, 's') else -1 for r in res]
print(f"  ranks: worst block {ranks[order[-1]]}, median "
      f"{int(np.median(ranks))}", flush=True)

# --- B: direct vmapped capture, cut on/off --------------------------------
stack = np.zeros((nb7, 256, 256))
for i, b0 in enumerate(blocks7):
    stack[i, :, :240] = b0
a = df_from_f64(stack)
keys = jax.random.split(jax.random.key(12), nb7)
# l=67 (round_rank 57 + oversample 10), total=134 — the scheduler's widths

def run_b(cm, pi, rr=1):
    q, bb = _fused_capture_vmapped(a.hi, a.lo, keys, l=67, power_iters=pi,
                                   refine_rounds=rr, terms=7,
                                   total=min(67 * (1 + rr), 256),
                                   cut_merge=cm)
    b64 = df_to_f64(bb)
    q64 = df_to_f64(q)
    worst, wi, cut_ranks = 0.0, -1, []
    for i in range(nb7):
        uu, ss, vvt = np.linalg.svd(b64[i], full_matrices=False)
        below = np.nonzero(ss / ss[0] < 1e-8)[0]
        k = int(below[0]) if below.size else ss.size
        cut_ranks.append(k)
        rec = (q64[i] @ uu[:, :k]) * ss[:k] @ vvt[:k]
        r_ = np.linalg.norm(stack[i] - rec) / np.linalg.norm(stack[i])
        if r_ > worst:
            worst, wi = r_, i
    print(f"B vmapped cut={cm} pi={pi} rr={rr}: worst {worst:.3e} at "
          f"block {wi} (cut rank {cut_ranks[wi]}, "
          f"median {int(np.median(cut_ranks))})", flush=True)
    return wi


wi = run_b(True, 1)
run_b(True, 1, rr=2)  # the round-4 third round: recaptures the miss?

# --- C: single-block fused on the worst block ------------------------------
out = highacc.refined_rsvd_fused(blocks7[int(wi)],
                                 jax.random.key(99), round_rank=57,
                                 tol=1e-8, refine_rounds=1)
print(f"C single fused worst block: resid "
      f"{out.residual_fro(blocks7[int(wi)]):.3e} rank {out.rank}",
      flush=True)
