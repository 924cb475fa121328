"""TPU tunnel QUALITY probe (round 5).

The tunnel has (at least) three failure modes: dead (ops hang),
garbage-at-scale (large vmapped programs return non-finite lanes), and
DEGRADED NUMERICS (same programs return finite results 10x off the
accuracy class — observed 15:13-15:18 2026-08-20: fused captures at
5e-7 where the healthy class is 4e-8, any batch size). A
responsiveness probe cannot see the third mode; this probe runs a
4-lane vmapped fused capture on synthetic decaying blocks with known
keys and gates on the measured residual class.

Exit 0 = healthy (responsive AND resid < 1e-7); 1 = degraded/dead.
Run under `timeout` (compile ~1-2 min cold through the tunnel; cached
afterwards).
"""

import sys

import numpy as np


def main() -> int:
    import jax

    from rusty_compression_tpu import highacc as ha

    rng = np.random.default_rng(0)
    blocks = []
    for i in range(4):
        u, _ = np.linalg.qr(rng.standard_normal((192, 192)))
        v, _ = np.linalg.qr(rng.standard_normal((192, 192)))
        sig = 10.0 ** (-10 * np.arange(192) / 49)  # crosses 1e-8 at 40
        blocks.append((u * sig) @ v.T)
    stack = np.stack(blocks)
    outs = ha.refined_rsvd_fused_batch(
        stack, jax.random.key(7), tol=1e-8, round_rank=32,
        refine_rounds=2, on_unreachable="mark")
    resids = [o.residual_fro(b) for o, b in zip(outs, stack)]
    worst = max(resids)
    print(f"probe resids: {['%.2e' % r for r in resids]} worst {worst:.2e}")
    if not np.isfinite(worst) or worst > 1e-7:
        print("DEGRADED")
        return 1
    print("HEALTHY")
    return 0


if __name__ == "__main__":
    sys.exit(main())
