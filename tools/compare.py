#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each Spark result parquet under OUTDIR/<name>/, runs the matching
oracle SQL from OUTDIR/oracle_sql.json in DuckDB over the sf parquet
tables, sorts columns by name + rows by value, and compares cell-exact.

Usage: python3 tools/compare.py <sfDir> <outDir> [name ...]
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import numpy as np
    if isinstance(v, np.integer):
        v = int(v)
    elif isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def frame_key(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = duckdb.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')",
                connection=con).df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        gc, gr = frame_key(got)
        wc, wr = frame_key(want)
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} duckdb={wc}")
            n_fail += 1
        elif len(gr) != len(wr):
            print(f"FAIL {name}: rows spark={len(gr)} duckdb={len(wr)}")
            n_fail += 1
        elif gr != wr:
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  cols : {gc}")
            print(f"  spark: {gr[bad]}")
            print(f"  duck : {wr[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
