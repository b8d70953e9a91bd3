#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: check.py [sfDir] [outDir]
Reads outDir/<name>/ parquet dumps (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle in DuckDB against views over the
sfDir parquet tables, and compares: schema (column names), row count, and
exact values (columns sorted by name, rows sorted by all columns).
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.map(lambda v: (v is None or v != v, v))
                            if s.dtype == object else s)
    return df.reset_index(drop=True)

def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if sorted(a.columns) != sorted(b.columns):
        return f"COLS spark={sorted(a.columns)} duck={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    a, b = norm(a), norm(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = ((av.isna() & bv.isna()) | (av == bv)).all()
        else:
            ok = av.astype(object).where(pd.notna(av), None) \
                   .equals(bv.astype(object).where(pd.notna(bv), None))
        if not ok:
            neq = (av.astype(object).where(pd.notna(av), None) !=
                   bv.astype(object).where(pd.notna(bv), None))
            i = int(np.argmax(neq.values))
            return (f"VAL col={c} row={i} spark={av.iloc[i]!r} "
                    f"duck={bv.iloc[i]!r}")
    return None

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; StressGen corpora are
        # Spark-written directories of part files — glob those
        p = f"{sf}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        if t == "events":
            # StressGen round-trips ts as the raw nanos long (see
            # Tables.events' adaptive loader); mirror the Spark side's
            # LongType branch: nanos // 1000 -> micros -> timestamp
            ts_type = {r[0]: r[1] for r in con.sql(
                "DESCRIBE events").fetchall()}["ts"]
            if ts_type == "BIGINT":
                con.sql("DROP VIEW events")
                con.sql(f"CREATE VIEW events AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM {src}")
    sqls = json.load(open(f"{out}/oracle_sql.json"))
    npass = nfail = 0
    for name in sorted(sqls):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            # subset verify runs (Verify's 3rd arg) dump only some queries
            print(f"SKIP {name}: no spark output"); continue
        try:
            spark_df = con.sql(
                f"SELECT * FROM read_parquet({files!r})").df()
            duck_df = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); nfail += 1; continue
        diff = cmp(spark_df, duck_df)
        if diff: print(f"FAIL {name}: {diff}"); nfail += 1
        else: print(f"PASS {name} ({len(spark_df)} rows)"); npass += 1
    print(f"== {npass} pass, {nfail} fail")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
