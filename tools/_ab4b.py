"""Round-4 TPU check after the cut-merge: config 6 exact + clamped-chunk case + fused growth wall."""
import time, numpy as np, jax
from rusty_compression_tpu.highacc import refined_rsvd_fused, refined_rsvd

t0 = time.perf_counter()
jax.device_get(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
print(f"health {time.perf_counter()-t0:.2f}s", flush=True)

# --- config 6 exact repro (must stay at the 8.7e-9 class) ---
m, rank_decay, r_gen = 4096, 120, 160
rng = np.random.default_rng(6)
sig = 10.0 ** (-10.0 * np.arange(r_gen) / (rank_decay - 1))
u, _ = np.linalg.qr(rng.standard_normal((m, r_gen)))
v, _ = np.linalg.qr(rng.standard_normal((m, r_gen)))
a = (u * sig) @ v.T
for i, ks in enumerate((8, 81, 82)):
    t0 = time.perf_counter()
    out = refined_rsvd_fused(a, jax.random.key(ks), round_rank=132,
                             tol=1e-8, refine_rounds=1)
    w = time.perf_counter() - t0
    print(f"cfg6 key={ks}: resid {out.residual_fro(a):.3e} rank {out.rank} "
          f"wall {w:.2f}s{' (compile)' if i == 0 else ''}", flush=True)

# --- clamped-chunk shape: content rank well under the round width ---
rng = np.random.default_rng(7)
m2, dk = 512, 40  # 1e-8 crossing at 32; round width 64 => rank-deficient round 2
sig2 = np.maximum(10.0 ** (-10.0 * np.arange(m2) / (dk - 1)), 1e-13)
u2, _ = np.linalg.qr(rng.standard_normal((m2, m2)))
v2, _ = np.linalg.qr(rng.standard_normal((m2, m2)))
a2 = (u2 * sig2) @ v2.T
for ks in (1, 2, 3):
    out = refined_rsvd_fused(a2, jax.random.key(ks), round_rank=54,
                             tol=1e-8, refine_rounds=1)
    print(f"overcap key={ks}: resid {out.residual_fro(a2):.3e} "
          f"rank {out.rank}", flush=True)

# --- fused growth wall at 512^2 (config 1h target <= 0.2 s) ---
rng = np.random.default_rng(8)
sig3 = np.maximum(10.0 ** (-10.0 * np.arange(512) / 99), 1e-13)
u3, _ = np.linalg.qr(rng.standard_normal((512, 512)))
v3, _ = np.linalg.qr(rng.standard_normal((512, 512)))
a3 = (u3 * sig3) @ v3.T
out = refined_rsvd_fused(a3, jax.random.key(19), tol=1e-8)  # compile
walls = []
for ks in (20, 21, 22):
    t0 = time.perf_counter()
    out = refined_rsvd_fused(a3, jax.random.key(ks), tol=1e-8)
    walls.append(time.perf_counter() - t0)
    print(f"growth key={ks}: resid {out.residual_fro(a3):.3e} rank {out.rank} "
          f"wall {walls[-1]:.3f}s", flush=True)
print("growth min wall", min(walls), flush=True)
