#!/usr/bin/env python3
"""Diagnose driver hash_match failures at the representation level.

fetchall values are known-identical (tools/compare.py passes), so the
driver's hash must see a typed materialization. For each query this
prints, for the Spark parquet result vs the DuckDB oracle result:
  - exact DuckDB logical types (rel.types)
  - arrow schema (rel.arrow())
  - pandas dtypes (rel.df())
and flags any mismatch. Usage:
  python3 tools/hashdiag.py <sfDir> <outDir> [query ...]
"""
import glob
import json
import sys

import duckdb
import pandas as pd


def strict_rows(df):
    cols = sorted(df.columns)
    rows = sorted(tuple(str(r[c]) for c in cols) for _, r in df.iterrows())
    return cols, rows


def profiles(con, q):
    rel = con.sql(q)
    cols = rel.columns
    dtypes = [str(t) for t in rel.types]
    at = con.sql(q).arrow()
    arrow = [str(f.type) for f in at.schema]
    pdf = con.sql(q).df()
    pandas = [str(pdf[c].dtype) for c in pdf.columns]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order], [dtypes[i] for i in order],
            [arrow[i] for i in order], [pandas[i] for i in order])


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            sc, sd, sa, sp = profiles(con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            oc, od, oa, op = profiles(con, sql)
        except Exception as e:
            print(f"ERR  {name}: {e}")
            continue
        msgs = []
        for label, a, b in [("duck", sd, od), ("arrow", sa, oa), ("pandas", sp, op)]:
            if a != b:
                diffs = [f"{c}: {x} vs {y}" for c, x, y in zip(sc, a, b) if x != y]
                msgs.append(f"{label}[" + "; ".join(diffs) + "]")
        # presumed driver path: spark parquet via pandas, oracle via duckdb.df()
        sdf = pd.read_parquet(glob.glob(f"{out_dir}/{name}/*.parquet"))
        _, s_rows = strict_rows(sdf)
        _, o_rows = strict_rows(con.sql(sql).df())
        bad = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        if len(s_rows) != len(o_rows) or bad:
            msgs.append(f"strict-str[{len(bad)} row diffs, first={bad[:1]}]")
        print(("DIFF" if msgs else "ok  ") + f" {name}: " + " | ".join(msgs))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
