#!/usr/bin/env python3
"""DuckDB twin of graft.Bench: time each SparkEntry.oracleSql (from a
Verify dump's oracle_sql.json) over the SAME parquet tables, restricted
to the query set passed on stdin (one name per line) — the BASELINE.md
ratio recipe made repeatable.

Usage:
  sbt "runMain graft.Verify <anySf> <outDir>"   # to get oracle_sql.json
  <names> | python3 tools/duck_bench.py <sfDir> <outDir>/oracle_sql.json
"""
import json
import sys
import time

import duckdb


def main(sf_dir, oracle_json):
    names = [ln.strip() for ln in sys.stdin if ln.strip()]
    oracles = json.load(open(oracle_json))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    total = 0.0
    timed = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            print(f"[duck] {name}: no oracle SQL — skipped", file=sys.stderr)
            continue
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            dt = time.time() - t0
            timed[name] = dt
            total += dt
            print(f'{{"q":"{name}","sec":{dt:.3f}}}')
        except Exception as e:
            print(f"[duck] {name} FAILED: {e}", file=sys.stderr)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 2),
                      "unit": "sec", "n": len(timed)}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
