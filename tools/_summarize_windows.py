"""Per-window gate summary for the round-4 BASELINE rows (untracked helper)."""
import json, sys, time
recs = [json.loads(l) for l in open("BENCH_SUITE.jsonl")]
focus = sys.argv[1:] or ["6-refined-1e-8", "6c-complex", "6s-planar-c64-tsid",
                         "7-stream-1e8", "4b-two-sided-id-16k",
                         "4b1-two-sided-id-16k-oneread", "1h-adaptive-1e8",
                         "1hb-batched-growth"]
for r in recs:
    ts = r.get("ts", 0)
    when = time.strftime("%m-%d %H:%M", time.gmtime(ts))
    rows = r.get("results", [])
    dev = rows[0].get("device", "?") if rows else "?"
    if not dev.startswith("tpu"):
        continue
    out = []
    for cfg in focus:
        m = [x for x in rows if x.get("config", "").startswith(cfg)]
        for x in m:
            extra = x.get("extra", {})
            val = x.get("value")
            gate = "PASS" if x.get("gate_ok") else ("SKIP" if x.get("skipped") else "FAIL")
            resid = extra.get("rel_residual") or extra.get("max_rel_err") or extra.get("rel_err")
            out.append(f"{x['config']}={gate}"
                       + (f"({resid:.2e})" if isinstance(resid, float) else "")
                       + (f" {val:.4g}{x.get('unit','')}" if isinstance(val, float) else ""))
    print(when, "|", " | ".join(out))
