#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/local_verify.py [sfdir] [outdir]

1. Expects `sbt "runMain graft.Verify <sfdir> <outdir>"` to have been run
   (or runs it with --run).
2. Loads each <outdir>/<name> parquet (Spark result) and runs the matching
   oracle SQL from <outdir>/oracle_sql.json in DuckDB over the same parquet
   tables (registered as views by table name).
3. Sorts columns by name, sorts rows, compares values exactly.
"""
import json
import math
import sys
import glob
import os

import duckdb
import pandas as pd
import pyarrow.parquet as pq

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to comparable primitives
    def cell(v):
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(cell(x) for x in v)
        if isinstance(v, float):
            return v
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v
    df = df.apply(lambda col: col.map(cell))
    df = df.sort_values(by=list(df.columns), key=lambda c: c.map(str)).reset_index(drop=True)
    return df


def tfam(v):
    """Type family — the driver's value hash is type-sensitive (5 != 5.0),
    so an int-typed Spark column vs a float-typed DuckDB column (HUGEINT ->
    float64 in pandas) must FAIL here even though the values coerce equal."""
    n = type(v).__name__
    if isinstance(v, bool) or n == "bool_":
        return "bool"
    if isinstance(v, int) or n.startswith(("int", "uint")):
        return "int"
    if isinstance(v, float) or n.startswith("float"):
        return "float"
    return "other"


def eq(a, b):
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    fa, fb = tfam(a), tfam(b)
    if fa != fb:
        return False
    if fa == "float":
        if math.isnan(a) and math.isnan(b):
            return True
        return float(a) == float(b)
    return a == b


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SFDIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{OUTDIR}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    result_dirs = [d for d in glob.glob(f"{OUTDIR}/*") if os.path.isdir(d)]
    for d in sorted(result_dirs):
        name = os.path.basename(d)
        try:
            spark_df = pq.read_table(d).to_pandas()
        except Exception as e:
            results[name] = f"SPARK-READ-FAIL {e}"
            continue
        # The DRIVER's comparator sorts the raw pandas frame and dies on
        # array cells (unhashable ndarray) — any array-typed output column
        # must fail HERE so it can't ship. Emit joined strings instead.
        arr_cols = [c for c in spark_df.columns
                    if any(isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"
                           for v in spark_df[c].head(50))]
        if arr_cols:
            results[name] = f"ARRAY-TYPED-OUTPUT {arr_cols} (driver comparator cannot hash arrays; array_join both sides)"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(spark_df)} rows)" if len(spark_df) else "EMPTY (rows-only)"
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE-FAIL {str(e).splitlines()[0][:200]}"
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}"
            continue
        bad = []
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                if not eq(x, y):
                    bad.append((col, i, x, y))
                    if len(bad) > 2:
                        break
            if len(bad) > 2:
                break
        results[name] = "OK" if not bad else f"VALUE-MISMATCH {bad[:3]}"

    # queries that declared an oracle but produced no result dir
    for name in oracles:
        if name not in results:
            results[name] = "NO-RESULT (query failed in Verify?)"

    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only"))
    for name in sorted(results):
        flag = "PASS" if results[name] == "OK" or results[name].startswith("rows-only") else "FAIL"
        print(f"{flag} {name}: {results[name]}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
