#!/bin/bash
# Round-4 TPU measurement queue: probe every 10 min; in the first healthy
# window run (1) final-config A/B validation, (2) bench_suite + bench_kernels
# (green-window evidence), (3) the 1024-block tol-1e-8 volume run with
# resume; keep resuming the volume run across windows until complete.
cd /root/repo
LOG=/tmp/queue_r4.log
OUT=/tmp/ha_ckpt_r4
probe() {
  timeout 60 python - <<'PYEOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
jax.device_get(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
PYEOF
}
PHASE=ab
for i in $(seq 1 60); do
  if probe; then
    echo "== $(date -u +%T) healthy (attempt $i) phase=$PHASE ==" >> "$LOG"
    if [ "$PHASE" = ab ]; then
      timeout 1500 python tools/_ab4b.py >> "$LOG" 2>&1 && PHASE=bench
    fi
    if [ "$PHASE" = bench ]; then
      if probe; then
        timeout 4200 python bench_suite.py >> "$LOG" 2>&1
        timeout 3000 python bench_kernels.py >> "$LOG" 2>&1
        PHASE=volume
      fi
    fi
    if [ "$PHASE" = volume ]; then
      if probe; then
        timeout 5400 python -m rusty_compression_tpu /tmp/ha_blocks -o "$OUT" \
          --tol 1e-8 --highacc --round-rank 128 --resume \
          --metrics /tmp/ha_vol_r4_metrics.jsonl >> "$LOG" 2>&1
        DONE=$(wc -l < "$OUT/manifest.jsonl" 2>/dev/null || echo 0)
        echo "-- volume manifest $DONE/1024 --" >> "$LOG"
        if [ "$DONE" -ge 1024 ]; then echo "ALL DONE $(date -u +%T)" >> "$LOG"; exit 0; fi
      fi
    fi
  else
    echo "$(date -u +%T) unhealthy ($i)" >> "$LOG"
  fi
  sleep 600
done
echo "queue exhausted" >> "$LOG"
