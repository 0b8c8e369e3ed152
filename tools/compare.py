#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query dir in <outDir>, loads the Spark parquet result and the
DuckDB oracle result (oracle_sql.json), sorts columns by name and rows
by all values, and compares cell-by-cell.

Usage: python3 tools/compare.py <sfDir> <outDir>
"""
import glob
import json
import math
import os
import sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(v)
        out.append(tuple(str(x) for x in vals))
    return sorted(out), [cols[i] for i in order]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # A missing dump dir only means "not in this run" when Verify was
    # invoked on an explicit subset (SPARK_GRAFT_VERIFY_ONLY, mirrored
    # here via GRAFT_COMPARE_SUBSET=1). In a FULL run a missing dump is
    # a crashed query — silently skipping it would mask a correctness
    # regression behind an all-ok gate.
    subset = os.environ.get("GRAFT_COMPARE_SUBSET") == "1"
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if not glob.glob(f"{out_dir}/{name}/*.parquet"):
            if subset:
                continue  # not in this (subset) dump
            print(f"FAIL {name}: no Spark dump (query crashed during Verify?)")
            n_bad += 1
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            o_rel = con.execute(sql)
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        s_canon, s_names = canon(s_rows, s_cols)
        o_canon, o_names = canon(o_rows, o_cols)
        if s_names != o_names:
            print(f"FAIL {name}: columns {s_names} != {o_names}")
            n_bad += 1
        elif s_canon != o_canon:
            diff = [(a, b) for a, b in zip(s_canon, o_canon) if a != b]
            print(f"FAIL {name}: {len(s_canon)} vs {len(o_canon)} rows; "
                  f"first diffs: {diff[:3]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(s_canon)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
