#!/bin/bash
# Round-5 window chain: probe tunnel QUALITY every 8 min; in healthy
# windows run the volume resume (1024-block, then the 10k stream), then
# the bench suites. One TPU process at a time; everything resumable.
#
#   nohup ./tools/_chain_r5.sh > /tmp/chain_r5.log 2>&1 &
#
# Phases: vol1024 -> vol10k -> bench -> kernels -> done.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export RC_CHUNK_LOG=1
# this tunnel rejects complex dtypes (probed); pinning it avoids the
# lazy subprocess probe racing a running stream (one-TPU-process rule)
export RC_COMPLEX_DEVICE=0
PHASE="${CHAIN_PHASE:-vol1024}"
LOG=/tmp/chain_r5_runs.log

probe() {
  timeout 420 python tools/_probe_quality.py >> "$LOG" 2>&1
}

while true; do
  echo "$(date +%H:%M:%S) phase=$PHASE probing" | tee -a "$LOG"
  if probe; then
    echo "$(date +%H:%M:%S) healthy -> $PHASE" | tee -a "$LOG"
    case "$PHASE" in
      vol1024)
        timeout 5400 python -m rusty_compression_tpu /tmp/ha_blocks \
          -o /tmp/ha_ckpt_r4 --tol 1e-8 --highacc --round-rank 128 \
          --resume --metrics /tmp/ha_metrics_r5.jsonl >> "$LOG" 2>&1
        if python - <<'EOF'
import json, sys
done = set()
for l in open('/tmp/ha_ckpt_r4/manifest.jsonl'):
    r = json.loads(l)
    if not (r.get('error') or '').startswith('environment:'):
        done.add(r['block'])
sys.exit(0 if len(done) >= 1024 else 1)
EOF
        then PHASE=vol10k; fi ;;
      vol10k)
        test -d /tmp/ha_blocks10k || JAX_PLATFORMS=cpu \
          python tools/_gen_blocks10k.py /tmp/ha_blocks10k 10000 \
          >> "$LOG" 2>&1
        timeout 7200 python -m rusty_compression_tpu /tmp/ha_blocks10k \
          -o /tmp/ha_ckpt10k --tol 1e-8 --highacc --round-rank 128 \
          --resume --metrics /tmp/ha10k_metrics.jsonl >> "$LOG" 2>&1
        if python - <<'EOF'
import json, os, sys
p = '/tmp/ha_ckpt10k/manifest.jsonl'
done = set()
if os.path.exists(p):
    for l in open(p):
        r = json.loads(l)
        if not (r.get('error') or '').startswith('environment:'):
            done.add(r['block'])
sys.exit(0 if len(done) >= 10000 else 1)
EOF
        then PHASE=bench; fi ;;
      bench)
        timeout 5400 python bench_suite.py >> "$LOG" 2>&1 && PHASE=kernels ;;
      kernels)
        timeout 5400 python bench_kernels.py >> "$LOG" 2>&1 && PHASE=done ;;
      done)
        echo "$(date +%H:%M:%S) all phases complete" | tee -a "$LOG"
        exit 0 ;;
    esac
  fi
  sleep 480
done
