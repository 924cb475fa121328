"""Round-4 regression bisect: config-6 exact repro, all trim knobs.

Runs the bench_suite config-6 matrix (4096^2, geomspace decay over 120,
round_rank 132, tol 1e-8) through refined_rsvd_fused with each round-3
trim individually reverted, over several sketch keys, and prints
resid/wall per run. Usage: python _ab4.py [small]
"""
import sys
import time

import numpy as np
import jax

from rusty_compression_tpu.highacc import refined_rsvd_fused

SMALL = "small" in sys.argv[1:]

m, rank_decay, r_gen = (1024, 60, 96) if SMALL else (4096, 120, 160)
rng = np.random.default_rng(6)
sig = 10.0 ** (-10.0 * np.arange(r_gen) / (rank_decay - 1))
u, _ = np.linalg.qr(rng.standard_normal((m, r_gen)))
v, _ = np.linalg.qr(rng.standard_normal((m, r_gen)))
a = (u * sig) @ v.T
k = int(rank_decay * 1.1)

t0 = time.perf_counter()
jax.device_get(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
print(f"health {time.perf_counter() - t0:.2f}s {jax.devices()}", flush=True)

BASE = dict(power_iters=1, final_passes=2, residual_terms=7,
            ns_mode="fast", svd_lift=False)
VARIANTS = [
    ("trim", {}),
    ("q2", {"power_iters": 2}),
    ("fp3", {"final_passes": 3}),
    ("t8", {"residual_terms": 8}),
    ("robust", {"ns_mode": "robust"}),
    ("lift", {"svd_lift": True}),
    ("safe", {"power_iters": 2, "final_passes": 3, "residual_terms": 8,
              "ns_mode": "robust", "svd_lift": True}),
]
KEYS = (8, 81, 82)

for name, over in VARIANTS:
    kw = {**BASE, **over}
    walls = []
    for i, kseed in enumerate(KEYS):
        t0 = time.perf_counter()
        out = refined_rsvd_fused(a, jax.random.key(kseed), round_rank=k,
                                 tol=1e-8, refine_rounds=1, **kw)
        wall = time.perf_counter() - t0
        walls.append(wall)
        print(f"{name:7s} key={kseed}: resid {out.residual_fro(a):.3e} "
              f"rank {out.rank} wall {wall:.2f}s"
              f"{' (compile)' if i == 0 else ''}", flush=True)
print("done", flush=True)
