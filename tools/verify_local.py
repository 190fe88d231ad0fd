#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

1. Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
2. Registers each <sfDir>/<table>.parquet as a DuckDB view.
3. Runs every SQL in <outDir>/oracle_sql.json, compares against the
   Spark parquet dump per query: column names (sorted), row counts, and
   STRINGIFIED values (sorted rows, column-sorted). Stringified — not
   numerically coerced — because the driver hashes rendered values, so a
   DuckDB HUGEINT fetched as float64 ("3.0") must NOT silently equal a
   Spark int64 ("3"). Round-1 lesson: every DuckDB SUM(integer) returns
   HUGEINT -> pandas float64; always CAST(sum(...) AS BIGINT) in oracle
   SQL. Bit-identical doubles stringify identically (shortest
   round-trip repr), so this is safe for genuinely-float columns too.

Driver-side tooling only (duckdb/pandas/pyarrow are not available to the
Scala engine itself).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # stringify for a stable total order incl. NaN/None
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    return df.iloc[key.argsort(kind="mergesort")].reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA mismatch: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS mismatch: spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        fa = pd.api.types.is_float_dtype(av)
        fb = pd.api.types.is_float_dtype(bv)
        if fa != fb:
            return (f"DTYPE mismatch col={c}: spark={av.dtype} "
                    f"duck={bv.dtype} — driver's string-hash WILL differ "
                    f"(e.g. '3' vs '3.0'); CAST the oracle side")
        if not av.astype(str).equals(bv.astype(str)):
            neq = av.astype(str) != bv.astype(str)
            i = neq.idxmax()
            return (f"VALUE mismatch col={c} row={i}: "
                    f"spark={av[i]!r} duck={bv[i]!r} "
                    f"(n_mismatch={int(neq.sum())})")
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    import glob
    n_ok = n_bad = 0
    names = sorted({p.split("/")[-1] for p in glob.glob(f"{out_dir}/*")
                    if not p.endswith(".json")})
    for name in names:
        try:
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in
                 sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                ignore_index=True)
        except Exception as e:
            print(f"[FAIL] {name}: cannot read spark output: {e}")
            n_bad += 1
            continue
        if name not in oracle:
            status = f"rows-only ({len(spark_df)} rows)"
            ok = len(spark_df) > 0
            print(f"[{'OK  ' if ok else 'WARN'}] {name}: {status}")
            n_ok += 1 if ok else 0
            n_bad += 0 if ok else 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        res = compare(name, spark_df, duck_df)
        if res == "OK":
            print(f"[OK  ] {name}: {len(spark_df)} rows")
            n_ok += 1
        else:
            print(f"[FAIL] {name}: {res}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
