#!/usr/bin/env python3
"""Refresh BENCH_BASELINE.json (the per-query budget reference Bench reads
for its budget_exceeded regression gate) from a bench JSON line/file.

ANCHOR-DRIFT GUARD: a query measured above 1.25x its frozen BENCH_ANCHOR
value does NOT get its budget refreshed from this run — refreshing would
absorb the drift into the budget (the a7 failure mode: its budget base
re-learned a 1.6x-vs-anchor time, so the alarm could never fire again).
Such queries keep their previous BENCH_BASELINE entry; the drift stays
visible to the budget gate until it is either fixed or re-anchored with
an adjudication in DIAG.

Usage: python3 scripts/make_bench_baseline.py BENCH_rN_local.json
"""
import json, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else 'BENCH_r6_local.json'
b = json.load(open(src))
qs = {k: v for k, v in b['queries'].items() if v >= 0}

anchor = json.load(open('BENCH_ANCHOR.json')) if os.path.isfile('BENCH_ANCHOR.json') else {}
prev = json.load(open('BENCH_BASELINE.json')) if os.path.isfile('BENCH_BASELINE.json') else {}

held = []
out = {}
for k, v in qs.items():
    a = anchor.get(k)
    if a and a > 0 and v / a > 1.25 and v - a > 0.3 and k in prev and prev[k] < v:
        out[k] = prev[k]   # keep the stricter budget; do not absorb drift
        held.append((k, v, a, prev[k]))
    else:
        out[k] = v

json.dump(out, open('BENCH_BASELINE.json', 'w'), indent=1, sort_keys=True)
print(f'{len(out)} queries -> BENCH_BASELINE.json (from {src})')
for k, v, a, p in held:
    print(f'  HELD {k}: measured {v:.3f} is {v/a:.2f}x anchor {a:.3f} '
          f'-> budget base stays {p:.3f}')
