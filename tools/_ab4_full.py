import time, numpy as np, jax
from rusty_compression_tpu.highacc import refined_rsvd_fused
m, rank_decay, r_gen = 4096, 120, 160
rng = np.random.default_rng(6)
sig = 10.0 ** (-10.0 * np.arange(r_gen) / (rank_decay - 1))
u, _ = np.linalg.qr(rng.standard_normal((m, r_gen)))
v, _ = np.linalg.qr(rng.standard_normal((m, r_gen)))
a = (u * sig) @ v.T
k = int(rank_decay * 1.1)
t0 = time.perf_counter()
jax.device_get(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
print(f"health {time.perf_counter()-t0:.2f}s", flush=True)
for name, kw in [("trim", dict(final_passes=2)), ("fp3", dict(final_passes=3))]:
    for i, ks in enumerate((8, 81, 82)):
        t0 = time.perf_counter()
        out = refined_rsvd_fused(a, jax.random.key(ks), round_rank=k,
                                 tol=1e-8, refine_rounds=1, **kw)
        w = time.perf_counter() - t0
        print(f"{name} key={ks}: resid {out.residual_fro(a):.3e} rank {out.rank} "
              f"wall {w:.2f}s{' (compile)' if i==0 else ''}", flush=True)
