"""Generate the 10k-block heterogeneous stream for the north-star volume
run (BASELINE config 5 scaled to one chip): admissible Laplace kernel
blocks, dims 64-512, written as .npy files."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")

from rusty_compression_tpu.utils.kernel_matrices import (
    laplace_kernel_block, random_cloud)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ha_blocks10k"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(5)
key = jax.random.key(5)
total = 0
for i in range(N):
    m = int(rng.integers(64, 513))
    n = int(rng.integers(64, 513))
    path = os.path.join(OUT, f"block_{i:05d}.npy")
    if os.path.exists(path):
        continue  # resume: keep the rng stream aligned (draws above)
    kt = jax.random.fold_in(key, 2 * i)
    ks = jax.random.fold_in(key, 2 * i + 1)
    x = random_cloud(kt, m, (0.0, 0.0, 0.0))
    y = random_cloud(ks, n, (3.0 + 0.5 * (i % 5), 0.5 * (i % 3), 0.0))
    b = np.asarray(laplace_kernel_block(x, y), np.float64)
    np.save(path, b)
    total += b.nbytes
    if i % 1000 == 0:
        print(i, f"{total/1e9:.2f} GB", flush=True)
print("done", N, f"{total/1e9:.2f} GB")
