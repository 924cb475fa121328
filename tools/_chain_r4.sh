#!/bin/bash
# Round-4 TPU chain (phase 2): stream A/B validation -> volume 1024
# (resumable) -> bench_suite window 2. One TPU process at a time.
cd /root/repo
LOG=/tmp/chain_r4.log
probe() {
  timeout 60 python - <<'PYEOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
jax.device_get(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
PYEOF
}
PHASE=${1:-ab7}
for i in $(seq 1 48); do
  if probe; then
    echo "== $(date -u +%T) healthy ($i) phase=$PHASE ==" >> "$LOG"
    if [ "$PHASE" = ab7 ]; then
      timeout 2400 python tools/_ab7.py >> "$LOG" 2>&1 && PHASE=volume
    fi
    if [ "$PHASE" = volume ]; then
      if probe; then
        timeout 5400 python -m rusty_compression_tpu /tmp/ha_blocks -o /tmp/ha_ckpt_r4 \
          --tol 1e-8 --highacc --round-rank 128 --resume \
          --metrics /tmp/ha_vol_r4_metrics.jsonl >> "$LOG" 2>&1
        DONE=$(wc -l < /tmp/ha_ckpt_r4/manifest.jsonl 2>/dev/null || echo 0)
        echo "-- volume manifest $DONE/1024 --" >> "$LOG"
        [ "$DONE" -ge 1024 ] && PHASE=suite2
      fi
    fi
    if [ "$PHASE" = suite2 ]; then
      if probe; then
        timeout 4800 python bench_suite.py >> "$LOG" 2>&1
        echo "SUITE2 DONE $(date -u +%T)" >> "$LOG"
        exit 0
      fi
    fi
  else
    echo "$(date -u +%T) unhealthy ($i) phase=$PHASE" >> "$LOG"
  fi
  sleep 300
done
echo "chain exhausted phase=$PHASE" >> "$LOG"
