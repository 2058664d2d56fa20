#!/usr/bin/env python3
"""Refresh BENCH_BASELINE.json (the per-query budget reference Bench reads
for its budget_exceeded regression gate) from a bench JSON line/file.

Usage: python3 scripts/make_bench_baseline.py BENCH_rN_local.json
"""
import json, sys
src = sys.argv[1] if len(sys.argv) > 1 else 'BENCH_r6_local.json'
b = json.load(open(src))
qs = {k: v for k, v in b['queries'].items() if v >= 0}
json.dump(qs, open('BENCH_BASELINE.json', 'w'), indent=1, sort_keys=True)
print(f'{len(qs)} queries -> BENCH_BASELINE.json (from {src})')
