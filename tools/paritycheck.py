"""Local replica of the driver's correctness gate: run each queries() entry
in Spark and its oracle_sql() in DuckDB over the same parquet dir; compare
row count, column names, and order-insensitive values.

Usage: python tools/paritycheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from pds_hw2_mpi_connected_components_spark.plans.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    a, b = canon(sdf), canon(odf)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        problems.append(f"value mismatch in {int(bad.sum())}/{len(a)} rows; first diffs:")
        merged = pd.concat([a[bad].head(3).add_prefix("s_"), b[bad].head(3).add_prefix("o_")], axis=1)
        problems.append(merged.to_string())
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(entry.queries().keys())
    spark = get_spark(master="local[8]", app_name="paritycheck",
                      extra_conf={"spark.driver.memory": "12g"})
    con = duck_con(sf_dir)
    qs, osql = entry.queries(), entry.oracle_sql()
    failed = []
    for name in names:
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in osql:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.monotonic()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(osql[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name} [{time.monotonic()-t0:.1f}s]")
            for p in problems:
                print("      " + p.replace("\n", "\n      "))
            failed.append(name)
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.monotonic()-t0:.1f}s]")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
