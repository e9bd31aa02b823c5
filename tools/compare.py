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
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; Spark-written scale fixtures
        # (graft.tools.ScaleFixture) are directories of part files
        p = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
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
            results[name] = {"rows": False, "schema": False, "hash": False,
                             "err": f"spark output unreadable: {e}"}
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            results[name] = {"rows": False, "schema": False, "hash": False,
                             "err": f"oracle sql error: {e}"}
            n_fail += 1
            continue
        gc, gr = frame_key(got)
        wc, wr = frame_key(want)
        if gc != wc:
            print(f"FAIL {name}: columns spark={gc} duckdb={wc}")
            results[name] = {"rows": len(gr) == len(wr), "schema": False,
                             "hash": False}
            n_fail += 1
        elif len(gr) != len(wr):
            print(f"FAIL {name}: rows spark={len(gr)} duckdb={len(wr)}")
            results[name] = {"rows": False, "schema": True, "hash": False}
            n_fail += 1
        elif gr != wr:
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            print(f"FAIL {name}: first diff at sorted row {bad}:")
            print(f"  cols : {gc}")
            print(f"  spark: {gr[bad]}")
            print(f"  duck : {wr[bad]}")
            results[name] = {"rows": True, "schema": True, "hash": False}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            results[name] = {"rows": True, "schema": True, "hash": True,
                             "n_rows": len(gr)}
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "pass": n_pass, "fail": n_fail,
                       "queries": results}, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
