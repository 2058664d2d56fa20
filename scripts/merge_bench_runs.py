#!/usr/bin/env python3
"""Merge N bench JSON lines into one min-per-query artifact (the committed
BENCH_rN_local.json discipline): per-query min across runs, total/anchor/
drifters/budget recomputed from the merged times, canary = min across runs
(the best-observed host state the merged numbers correspond to).

Usage: merge_bench_runs.py out.json run1.json run2.json [...]
"""
import json, sys

out, runs = sys.argv[1], [json.loads(open(p).read()) for p in sys.argv[2:]]
base = runs[0]
qs = {}
for r in runs:
    for k, v in r['queries'].items():
        if v < 0:
            continue
        qs[k] = min(qs.get(k, float('inf')), v)
failed = sorted(set.intersection(*[set(r['failed']) for r in runs])) if runs else []

anchor = {}
try:
    anchor = {k: float(v) for k, v in json.load(open('BENCH_ANCHOR.json')).items() if isinstance(v, (int, float))}
except Exception:
    pass
baseline = {}
try:
    baseline = {k: float(v) for k, v in json.load(open('BENCH_BASELINE.json')).items() if isinstance(v, (int, float))}
except Exception:
    pass

total = sum(qs.values())
shared = [(v, anchor[k]) for k, v in qs.items() if k in anchor]
anchor_ratio = sum(v for v, _ in shared) / sum(a for _, a in shared) if shared else -1.0
exceeded = [{"q": k, "sec": round(v, 3), "budget": round(max(baseline[k] * 1.5, 0.5), 3)}
            for k, v in sorted(qs.items())
            if k in baseline and v > max(baseline[k] * 1.5, 0.5)]
drifters = sorted(
    ({"q": k, "sec": round(v, 3), "anchor": round(anchor[k], 3),
      "ratio": round(v / anchor[k], 3)}
     for k, v in qs.items()
     if k in anchor and v / anchor[k] > 1.25 and v - anchor[k] > 0.3),
    key=lambda d: -d["ratio"])[:10]

# min over PRESENT, non-negative canaries only: one run missing the field
# must not poison the merged health signal to -1 (-1 means "no run
# carried a canary"); per-run values ride alongside for adjudication
def canary_min(field):
    vals = [r[field] for r in runs if r.get(field, -1) >= 0]
    return min(vals) if vals else -1

merged = {
    "metric": "total", "value": round(total, 3), "unit": "sec",
    "canary_sec": canary_min("canary_sec"),
    "canary_end_sec": canary_min("canary_end_sec"),
    "canary_per_run": [round(r.get("canary_sec", -1), 3) for r in runs],
    "runs_merged": len(runs),
    "queries": {k: round(v, 3) for k, v in qs.items()},
    "failed": failed, "budget_exceeded": exceeded,
    "baseline_queries": len(baseline),
    "anchor_ratio": round(anchor_ratio, 3), "anchor_queries": len(shared),
    "anchor_drifters": drifters, "sf": base.get("sf", ""),
}
json.dump(merged, open(out, "w"))
print(f"{len(qs)} queries, total {merged['value']}, anchor {merged['anchor_ratio']}, "
      f"exceeded {[d['q'] for d in exceeded]}, canary {merged['canary_sec']}")
