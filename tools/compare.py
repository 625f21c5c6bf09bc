#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs the DuckDB oracle.

Mimics the driver's correctness gate: run graft.Verify at a scale factor,
then for each query load the Spark parquet output and run the oracle SQL
in DuckDB over the same testdata tables; compare row counts, sorted
schemas, and value hashes (columns sorted by name, rows sorted).

Usage: python3 tools/compare.py [sfdir] [outdir]
"""
import json
import subprocess
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        # normalize any tz-aware ts to naive, ns to us
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype) in ("int32", "int16", "int8"):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> None:
    run_verify = "--no-verify" not in sys.argv
    if run_verify:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
            capture_output=True, text=True, cwd="/root/repo")
        if r.returncode != 0:
            print(r.stdout[-3000:], r.stderr[-3000:])
            sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))

    n_bad = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            spark_df = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            ora_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        s, o = canon(spark_df), canon(ora_df)
        rows = len(s) == len(o)
        schema = list(s.columns) == list(o.columns)
        if not schema:
            print(f"FAIL {name}: schema {list(s.columns)} vs {list(o.columns)}")
            n_bad += 1
            continue
        if not rows:
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False)
            print(f"OK   {name}: rows={len(s)}")
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:500]}")
            n_bad += 1
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
