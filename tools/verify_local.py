#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/verify_local.py <sfdir> <outdir>
  (run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)

Loads each <outdir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outdir>/oracle_sql.json in DuckDB over the sfdir
tables, and diffs: column names, dtypes, row count, and exact values
after sorting columns by name and rows by all columns.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Timestamp unit (ns vs us) is a pandas artifact, not a type
    # divergence the driver sees — normalize to us before comparing.
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64[ns"):
            df[c] = df[c].astype(df[c].dtype.name.replace("[ns", "[us"))
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(os.listdir(outdir)):
        rdir = f"{outdir}/{name}"
        if not os.path.isdir(rdir):
            continue
        files = glob.glob(f"{rdir}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no parquet written")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracles:
            print(f"[rows-only] {name}: rows={len(spark_df)}" + (" EMPTY!" if len(spark_df) == 0 else ""))
            if len(spark_df) == 0:
                failures += 1
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"[FAIL] {name}: oracle SQL error: {ex}")
            failures += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL] {name}: columns {list(a.columns)} vs oracle {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"[FAIL] {name}: rows {len(a)} vs oracle {len(b)}")
            failures += 1
            continue
        # Dtype-strict: the driver's hash is representation-sensitive
        # (round 7 shipped 13 DuckDB-HUGEINT-vs-Spark-BIGINT failures that
        # a check_dtype=False compare green-lit). An oracle sum() over
        # integers is HUGEINT, which fetchdf() surfaces as float64/object
        # — any dtype divergence here is a real gate failure.
        bad_types = [(c, str(a[c].dtype), str(b[c].dtype))
                     for c in a.columns if a[c].dtype != b[c].dtype]
        if bad_types:
            print(f"[FAIL] {name}: dtype mismatch (spark vs oracle): {bad_types}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=True)
            print(f"[ok] {name}: {len(a)} rows exact-match")
        except AssertionError as ex:
            print(f"[FAIL] {name}: value mismatch\n{str(ex)[:600]}")
            # show first few diffs
            mask = (a != b) & ~(a.isna() & b.isna())
            bad = mask.any(axis=1)
            print(pd.concat([a[bad].head(3).add_suffix("_spark"), b[bad].head(3).add_suffix("_oracle")], axis=1).to_string())
            failures += 1
    print(f"== {failures} failures ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
