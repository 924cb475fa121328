"""Summarize a volume checkpoint manifest for BASELINE reporting.

Usage: python tools/_vol_summary.py /tmp/ha_ckpt_r4 /tmp/ha_blocks
Prints one JSON line: block count, failures, residual stats, rank
stats, total bytes, and aggregate wall (sum of per-chunk amortized
walls — the pipelined stream throughput comes from the driver's own
aggregate log line, not this).
"""

import json
import os
import sys

import numpy as np


def main() -> int:
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ha_ckpt_r4"
    blocks_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ha_blocks"
    by_block = {}
    for l in open(os.path.join(ckpt, "manifest.jsonl")):
        r = json.loads(l)
        by_block[r["block"]] = r  # resume appends: last row wins
    rows = list(by_block.values())
    resids = np.array([r["rel_residual"] for r in rows], float)
    ranks = np.array([r["rank"] for r in rows], int)
    walls = np.array([r.get("wall_time_s") or 0.0 for r in rows], float)
    fails = [r for r in rows if r.get("error")]
    nbytes = sum(r["m"] * r["n"] * 8 for r in rows)
    total = len([f for f in os.listdir(blocks_dir)
                 if f.endswith(".npy")]) if os.path.isdir(blocks_dir) else None
    out = {
        "blocks_done": len(rows),
        "blocks_total": total,
        "failures": len(fails),
        "failure_blocks": [r["block"] for r in fails][:20],
        "resid_max": float(resids.max()),
        "resid_median": float(np.median(resids)),
        "resid_p99": float(np.percentile(resids, 99)),
        "rank_min": int(ranks.min()),
        "rank_max": int(ranks.max()),
        "gb_in": round(nbytes / 1e9, 3),
        "wall_sum_s": round(float(walls.sum()), 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
