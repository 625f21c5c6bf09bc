#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs the DuckDB oracle.

Mimics the driver's correctness gate AT DRIVER STRICTNESS:
  - runs graft.Verify at a scale factor, then for each query loads the
    Spark parquet output;
  - canonicalizes EVERY output (columns sorted by name, rows sorted) —
    including rows-only outputs with no oracle entry, because the
    driver canonicalizes those too (round 4's x47 raw-array column
    crashed the driver's canonicalizer and compare.py never noticed:
    it only loaded queries present in oracle_sql.json);
  - for oracle-backed queries, compares dtypes EXACTLY after the same
    int-width/datetime normalization the value hash implies (the
    driver's hash distinguishes int64 7 from float64 7.0 — round 4's
    x22 slipped through check_dtype=False), and values exactly
    (check_exact: a bit-different float is a hash mismatch at the
    driver, so tolerance here would be a lie).

With --twice, graft.Verify runs a SECOND time into <outdir>_run2 and
every output (including rows-only ones that have no oracle) must be
value-identical across the two runs after canonicalization — the
determinism check the single-run oracle can't do: a plan that breaks a
tie differently per run (partition ordering, top-k ties, float
summation order) passes its own oracle twice with two different
answers and flakes only at the driver. Row ORDER may differ (the
driver sorts before hashing); values may not.

Usage: python3 tools/compare.py [sfdir] [outdir] [--no-verify] [--twice]
"""
import json
import os
import subprocess
import sys

import duckdb
import pandas as pd

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF = _pos[0] if len(_pos) > 0 else "/root/testdata/sf0.01"
OUT = _pos[1] if len(_pos) > 1 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize representation-only dtype
    variance (int widths, datetime unit/tz), sort rows. Deliberately
    does NOT make list/array values sortable: the driver's
    canonicalizer crashes on them, so they must FAIL here too."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # normalize any tz-aware ts to naive, ns to us
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype) in ("int32", "int16", "int8"):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def run_verify_into(out: str) -> None:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {out}'],
        capture_output=True, text=True, cwd="/root/repo")
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-3000:])
        sys.exit(1)


def determinism_check(con, out1: str, out2: str) -> int:
    """Every output dir present in either run must exist in both and be
    value-identical after canonicalization (rows-only included)."""
    bad = 0
    dirs1 = {d for d in os.listdir(out1)
             if os.path.isdir(os.path.join(out1, d)) and not d.startswith("_")}
    dirs2 = {d for d in os.listdir(out2)
             if os.path.isdir(os.path.join(out2, d)) and not d.startswith("_")}
    for name in sorted(dirs1 ^ dirs2):
        print(f"FAIL {name}: present in only one Verify run")
        bad += 1
    if json.load(open(f"{out1}/oracle_sql.json")) != \
            json.load(open(f"{out2}/oracle_sql.json")):
        print("FAIL oracle_sql.json differs between runs")
        bad += 1
    for name in sorted(dirs1 & dirs2):
        try:
            a = canon(con.sql(f"SELECT * FROM '{out1}/{name}/*.parquet'").df())
            b = canon(con.sql(f"SELECT * FROM '{out2}/{name}/*.parquet'").df())
            pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
            print(f"OK   {name}: deterministic across runs, rows={len(a)}")
        except Exception as e:
            print(f"FAIL {name}: runs differ (nondeterministic plan): "
                  f"{type(e).__name__}: {str(e)[:300]}")
            bad += 1
    return bad


def main() -> None:
    run_verify = "--no-verify" not in sys.argv
    twice = "--twice" in sys.argv
    if run_verify:
        run_verify_into(OUT)
        if twice:
            run_verify_into(OUT + "_run2")

    con = duckdb.connect()
    for t in TABLES:
        # best-effort: a missing/broken fixture table must degrade to
        # per-query FAIL rows (its oracles error per-name below), not
        # kill the whole compare before a single row prints
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        except Exception as e:
            print(f"WARN cannot create view {t}: {e} — its oracle rows will FAIL")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))

    n_bad_det = 0
    if twice:
        if not os.path.isdir(OUT + "_run2"):
            print(f"FAIL --twice: {OUT}_run2 missing (ran with --no-verify?)")
            sys.exit(1)
        n_bad_det = determinism_check(con, OUT, OUT + "_run2")

    # every query output on disk, not just the oracle-backed subset —
    # a rows-only output that the driver cannot canonicalize is a red
    # gate row even though it has no oracle SQL
    outputs = sorted(
        d for d in os.listdir(OUT)
        if os.path.isdir(os.path.join(OUT, d)) and not d.startswith("_"))
    missing = set(oracles) - set(outputs)
    n_bad = n_bad_det
    for name in missing:
        print(f"FAIL {name}: oracle entry but no spark output directory")
        n_bad += 1

    for name in outputs:
        try:
            spark_df = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            s = canon(spark_df)
        except Exception as e:
            print(f"FAIL {name}: spark output not canonicalizable "
                  f"(driver would err): {type(e).__name__}: {str(e)[:200]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"OK   {name}: rows-only, rows={len(s)} (canonicalizable)")
            continue
        try:
            ora_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        try:
            o = canon(ora_df)
        except Exception as e:
            print(f"FAIL {name}: ORACLE output not canonicalizable: {e}")
            n_bad += 1
            continue
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: schema {list(s.columns)} vs {list(o.columns)}")
            n_bad += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            n_bad += 1
            continue
        s_dt, o_dt = [str(t) for t in s.dtypes], [str(t) for t in o.dtypes]
        if s_dt != o_dt:
            diffs = [f"{c}: spark {a} vs oracle {b}"
                     for c, a, b in zip(s.columns, s_dt, o_dt) if a != b]
            print(f"FAIL {name}: dtype drift (driver hash would differ): "
                  + "; ".join(diffs))
            n_bad += 1
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=True, check_exact=True)
            print(f"OK   {name}: rows={len(s)}")
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:500]}")
            n_bad += 1
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
