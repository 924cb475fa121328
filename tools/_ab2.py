import numpy as np, jax, time
import rusty_compression_tpu.highacc as ha
from rusty_compression_tpu.linop import DenseOperator
from rusty_compression_tpu.sampling import range_finder
from rusty_compression_tpu.utils.dtypes import herm
from rusty_compression_tpu.utils.precision import with_precision

rng = np.random.default_rng(6)
m, rank_decay, r_gen = 4096, 120, 160
sig = 10.0 ** (-10.0 * np.arange(r_gen) / (rank_decay - 1))
u, _ = np.linalg.qr(rng.standard_normal((m, r_gen)))
v, _ = np.linalg.qr(rng.standard_normal((m, r_gen)))
a = (u * sig) @ v.T

def report(tag, out):
    u64 = np.asarray(jax.device_get(out.u.hi), np.float64) + \
          np.asarray(jax.device_get(out.u.lo), np.float64)
    ortho = np.abs(u64.T @ u64 - np.eye(u64.shape[1])).max()
    print(f"{tag}: resid {out.residual_fro(a):.3e} rank {out.rank} "
          f"ortho(U) {ortho:.2e}", flush=True)

for fp in (2, 3):
    def patched_round(a_hi, key, size, power_iters, _fp=fp):
        @with_precision
        def run(a_hi, key):
            q = range_finder(DenseOperator(a_hi), key, size,
                             power_iters=power_iters, ortho="svqb",
                             final_passes=_fp)
            w = herm(DenseOperator(a_hi).conj_matmat(q))
            return q, w
        return run(a_hi, key)
    ha._f32_round = patched_round
    for q_it in (1, 2):
        out = ha.refined_rsvd_fused(a, jax.random.key(8), round_rank=132,
                                    tol=1e-8, power_iters=q_it,
                                    refine_rounds=1)
        report(f"q={q_it} fp={fp} tol-trunc", out)
