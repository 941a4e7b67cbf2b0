#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB over the sf tables; compares as
order-insensitive multisets with columns sorted by name.

Dev tool only (driver-side python env) — the Scala library never uses it.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize list columns to tuples so they sort/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     getattr(v, "__len__", None) is not None and
                     not isinstance(v, str), na_action="ignore").any():
            try:
                df[c] = df[c].map(lambda v: tuple(v) if v is not None and not isinstance(v, str) and hasattr(v, "__iter__") else v)
            except Exception:
                pass
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
            want = con.sql(sql).df()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_bad += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_bad += 1
                continue
            # dtype KIND compare FIRST: the driver hashes serialized frames,
            # so int64 `3` vs float64 `3.0` (DuckDB HUGEINT → pandas
            # float64) is a driver FAIL even though pandas `==` calls them
            # equal — this lenience produced a false local 109/109 in
            # round 2. Width-only diffs (int32 vs int64) serialize
            # identically and pass at the driver (14 r02-green entries have
            # them), so compare `.kind`, not the full dtype.
            dtype_diff = [(c, str(g[c].dtype), str(w[c].dtype))
                          for c in g.columns
                          if g[c].dtype.kind != w[c].dtype.kind]
            if dtype_diff:
                print(f"FAIL {name}: dtype diffs (spark vs oracle) {dtype_diff}")
                print("  hint: CAST the oracle column (HUGEINT sums -> "
                      "CAST(... AS BIGINT)) or align the Spark output type")
                n_bad += 1
                continue
            # exact value compare
            diff_cols = []
            for c in g.columns:
                a, b = g[c], w[c]
                eq = (a == b) | (a.isna() & b.isna())
                if not eq.all():
                    diff_cols.append((c, int((~eq).sum())))
            if diff_cols:
                print(f"FAIL {name}: value diffs {diff_cols}")
                for c, _ in diff_cols[:2]:
                    mask = ~((g[c] == w[c]) | (g[c].isna() & w[c].isna()))
                    print("  spark:", g[mask][c].head(3).tolist())
                    print("  duck :", w[mask][c].head(3).tolist())
                n_bad += 1
            else:
                print(f"ok   {name} ({len(g)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad, {len(oracle)} total")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
