"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs every queries.QUERIES entry on Spark at sf0.01 and the matching
ORACLE_SQL on DuckDB over the same parquet files, then compares row count,
column names, and order-insensitive values (columns sorted by name, rows
sorted by all columns).  Usage: python tools/validate_queries.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.astype(str)
        elif "float" in str(s.dtype):
            df[c] = s.round(6)
        elif "bool" in str(s.dtype):
            df[c] = s.astype(str)
        elif "datetime" in str(s.dtype):
            df[c] = s.astype(str)
        else:
            try:
                df[c] = s.astype("int64")
            except (TypeError, ValueError):
                df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(ddf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        return problems
    if len(sdf) != len(ddf):
        problems.append(f"rowcount differ: spark={len(sdf)} duck={len(ddf)}")
    a, b = normalize(sdf), normalize(ddf)
    if len(a) == len(b):
        neq = (a.astype(str) != b.astype(str))
        if neq.any().any():
            bad_cols = [c for c in a.columns if neq[c].any()]
            idx = neq.any(axis=1).idxmax()
            problems.append(
                f"values differ in {bad_cols}; first row {idx}: "
                f"spark={a.iloc[idx].to_dict()} duck={b.iloc[idx].to_dict()}")
    return problems


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    from ocr_documents_spark.queries import (ORACLE_SQL, QUERIES,
                                             ensure_golden)
    from ocr_documents_spark.session import get_spark

    ensure_golden()

    spark = get_spark("validate-queries", master="local[8]",
                      shuffle_partitions=8)
    con = duck_conn(sf_dir)
    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in ORACLE_SQL:
            print(f"ok   {name}: rows={len(sdf)} (rows-only, no oracle)")
            continue
        try:
            ddf = con.execute(ORACLE_SQL[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + " | ".join(problems))
        else:
            print(f"ok   {name}: rows={len(sdf)}")
    spark.stop()
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    raise SystemExit(1 if main(sf, only) else 0)
