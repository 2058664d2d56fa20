#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB differential check.

Usage:  python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB with the sfDir tables
registered as views. Compares schema (column names), row count, and values
(columns sorted by name, rows in emitted order, floats to 1e-9 rel).

Dev-only tool — NOT part of the engine (driver-side python env).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(r[i] for i in order) for r in rows], [cols[i] for i in order]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if type(a) is not type(b):
        return str(a) == str(b)
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_noracle = 0
    # A query that crashed in Verify writes no output dir — count it as a
    # failure instead of silently shrinking coverage.
    dirs = {d.name for d in Path(out_dir).iterdir() if d.is_dir()}
    for name in sorted(set(oracles) - dirs):
        print(f"  ✗ {name}: MISSING spark output (Verify failed?)")
        n_fail += 1
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        got = pq.read_table(str(d))
        if name not in oracles:
            print(f"  ~ {name}: no oracle (rows={got.num_rows})")
            n_noracle += 1
            continue
        try:
            want = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        g_cols, w_cols = list(got.column_names), list(want.column_names)
        if sorted(g_cols) != sorted(w_cols):
            print(f"  ✗ {name}: SCHEMA {sorted(g_cols)} != {sorted(w_cols)}")
            n_fail += 1
            continue
        # STRICT arrow-type comparison: the driver's exact hash is
        # type-sensitive (DuckDB sum(int)->HUGEINT vs Spark BIGINT shipped
        # 16 red rows in round 2 because this harness only compared values).
        g_types = {c: str(got.schema.field(c).type) for c in g_cols}
        w_types = {c: str(want.schema.field(c).type) for c in w_cols}
        bad_t = {c: (g_types[c], w_types[c]) for c in g_types
                 if g_types[c] != w_types[c]}
        if bad_t:
            print(f"  ✗ {name}: TYPE drift (spark vs duckdb): {bad_t}")
            n_fail += 1
            continue
        g_rows, _ = canon([list(r.values()) for r in got.to_pylist()], g_cols)
        w_rows, _ = canon([list(r.values()) for r in want.to_pylist()], w_cols)
        if len(g_rows) != len(w_rows):
            print(f"  ✗ {name}: ROWS {len(g_rows)} != {len(w_rows)}")
            n_fail += 1
            continue
        bad = next(
            (i for i, (g, w) in enumerate(zip(g_rows, w_rows))
             if not all(eq(x, y) for x, y in zip(g, w))), None)
        if bad is not None:
            print(f"  ✗ {name}: VALUE mismatch at row {bad}:")
            print(f"      spark : {g_rows[bad]}")
            print(f"      duckdb: {w_rows[bad]}")
            n_fail += 1
        else:
            print(f"  ✓ {name} ({len(g_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
