#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name>/ parquet (Spark result) and runs the
corresponding oracle SQL from <out_dir>/oracle_sql.json in DuckDB over
views named after the tables in <sf_dir>. Compares: column names
(sorted), row count, then exact values after sorting rows by all
columns. This is dev tooling only — the shipped Scala library never
depends on it.
"""
import sys, json, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                else tuple(v) if isinstance(v, list) else v)
        # decimal/hugeint → float-safe int when lossless
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed, matched, skipped = [], 0, 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        spark_path = f"{out_dir}/{name}"
        if not os.path.isdir(spark_path):
            print(f"{name}: NO SPARK OUTPUT")
            failed.append(name)
            continue
        try:
            a = normalize(con.sql(
                f"SELECT * FROM '{spark_path}/*.parquet'").df())
            b = normalize(con.sql(sql).df())
        except Exception as e:
            print(f"{name}: ERROR {str(e)[:200]}")
            failed.append(name)
            continue
        if list(a.columns) != list(b.columns):
            print(f"{name}: COLUMNS spark={list(a.columns)} oracle={list(b.columns)}")
            failed.append(name)
            continue
        if len(a) != len(b):
            print(f"{name}: ROWS spark={len(a)} oracle={len(b)}")
            failed.append(name)
            continue
        cols = list(a.columns)
        a = a.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
        b = b.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            print(f"{name}: OK ({len(a)} rows)")
            matched += 1
        except AssertionError as e:
            msg = str(e).replace("\n", " | ")[:300]
            print(f"{name}: VALUES {msg}")
            failed.append(name)
    print()
    if failed:
        print(f"FAILED ({len(failed)}): {' '.join(failed)}")
        sys.exit(1)
    print(f"ALL MATCH ({matched} queries)")


if __name__ == "__main__":
    main()
