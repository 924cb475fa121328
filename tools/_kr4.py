"""Minimal kernel rows for the round-4 record: growth-device + the
4b one-read ablation rows (the full bench_kernels wedged a degraded
tunnel inside the 16384^2 stage sweep; this runs just the two missing
measurements and appends a partial record)."""
import json
import time

import jax
import jax.numpy as jnp

t0 = time.perf_counter()
jax.device_get(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
health = time.perf_counter() - t0
print(f"health {health:.2f}s", flush=True)

import bench_kernels as bk

dev = jax.devices()[0]


def record(payload):
    out = {"ts": time.time(), "health_roundtrip_s": health,
           "device": f"{dev.platform}:{dev.device_kind}",
           "partial": "targeted rows (_kr4.py)", **payload}
    with open("BENCH_KERNELS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)


growth = bk.measure_growth_device()
print("[growth-device]", growth, flush=True)
record({"growth_device": growth})

ab4b = bk.measure_4b_ablation(trials=2)
for row in ab4b:
    print("[4b-ablation]", row, flush=True)
record({"ablation_4b": ab4b})
