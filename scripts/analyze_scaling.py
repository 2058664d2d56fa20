#!/usr/bin/env python3
"""Assemble BENCH_r{N}_scaling.json from ScalingBench output lines.

Reads the raw per-tier JSON lines (one per multiple), computes per-doubling
cost ratios on min(cold, warm) — this box has multi-minute noisy episodes
that can inflate either rep, so the min is the steady-state proxy, the same
adjudication Bench's budget gate uses — and flags any doubling whose ratio
exceeds 1.2x-of-linear (i.e. min-time ratio > 2.4x for 2x the data).

Usage: analyze_scaling.py <raw_lines_file> <out_json> [note]
"""
import json, math, sys

raw, out = sys.argv[1], sys.argv[2]
note = sys.argv[3] if len(sys.argv) > 3 else ""

lines = []
for l in open(raw):
    l = l.strip()
    if '"tier"' in l:
        lines.append(json.loads(l[l.index('{'):]))

tiers = {}
for rec in lines:
    tiers.setdefault(rec["tier"], []).append(rec)

result = {"note": note, "tiers": []}
BAND = 2.0 * 1.2  # per-doubling: linear x2, +20% grace

for tier, recs in tiers.items():
    recs.sort(key=lambda r: r["mult"])
    qnames = sorted({q for r in recs for q in r["queries"]})
    curves = {}
    flags = []
    for q in qnames:
        pts = []
        for r in recs:
            if q in r["queries"]:
                t = r["queries"][q]
                pts.append({"mult": r["mult"], "cold": t["cold"], "warm": t["warm"],
                            "min": round(min(t["cold"], t["warm"]), 3)})
        for a, b in zip(pts, pts[1:]):
            # a step of xS spans log2(S) doublings; the allowed cost is
            # BAND per doubling, i.e. BAND ** log2(S) for the whole step
            doublings = math.log2(b["mult"] / a["mult"])
            b["ratio_vs_prev"] = round(b["min"] / a["min"], 2)
            if b["min"] / a["min"] > BAND ** doublings:
                flags.append({"q": q, "from": a["mult"], "to": b["mult"],
                              "ratio": round(b["min"] / a["min"], 2)})
        curves[q] = pts
    sizes = {k: v for k, v in recs[-1].items() if k not in ("tier", "mult", "queries")}
    # per-mult sizes/censuses (e.g. g2's n_nodes/n_edges per multiple):
    # lets a flagged curve be adjudicated against the data's own growth
    by_mult = {str(r["mult"]): {k: v for k, v in r.items()
                                if k not in ("tier", "mult", "queries")}
               for r in recs}
    result["tiers"].append({"tier": tier, "mults": [r["mult"] for r in recs],
                            "top_size": sizes, "sizes_by_mult": by_mult,
                            "curves": curves,
                            "over_band": flags})

json.dump(result, open(out, "w"), indent=1)
n_flags = sum(len(t["over_band"]) for t in result["tiers"])
print(f"{len(lines)} tier-lines -> {out}; {n_flags} over-band doublings")
for t in result["tiers"]:
    for f in t["over_band"]:
        print("  OVER:", t["tier"], f)
