"""Local stand-in for the driver's correctness gate: runs every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same sf dir,
compares row count, column names, and order-insensitive values.

Usage: python tools/compare.py [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(only: list[str]):
    import __spark_entry__ as E
    from codegraph.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            results[name] = f"SPARK-ERROR {type(ex).__name__}: {str(ex)[:300]}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)"
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            results[name] = f"ORACLE-ERROR {type(ex).__name__}: {str(ex)[:300]}"
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"
        elif len(s) != len(o):
            results[name] = f"COUNT-MISMATCH spark={len(s)} oracle={len(o)}"
        elif not s.equals(o):
            neq = (s != o) & ~(s.isna() & o.isna())
            bad_cols = [c for c in s.columns if neq[c].any()]
            idx = neq.any(axis=1)
            results[name] = (f"VALUE-MISMATCH cols={bad_cols} "
                             f"n_bad_rows={int(idx.sum())}/{len(s)}\n"
                             f"  spark : {s[idx].head(3).to_dict('records')}\n"
                             f"  oracle: {o[idx].head(3).to_dict('records')}")
        else:
            results[name] = f"OK ({len(s)} rows, {time.time()-t0:.1f}s)"

    print("\n========== RESULTS ==========")
    ok = 0
    for name, r in results.items():
        flag = "PASS" if r.startswith(("OK", "rows-only")) else "FAIL"
        ok += flag == "PASS"
        print(f"[{flag}] {name}: {r}")
    print(f"{ok}/{len(results)} pass")


if __name__ == "__main__":
    main(sys.argv[1:])
