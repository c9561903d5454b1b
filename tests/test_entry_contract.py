"""Driver-contract guard: entry() smoke + Spark-vs-DuckDB parity for every
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry
from tools.paritycheck import TABLES, canon, compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["label", "size"]
    assert sum(r["size"] for r in rows) == 500  # every doc labeled


def test_every_query_has_oracle_or_is_documented():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) <= set(qs)
    rows_only = set(qs) - set(osql)
    # since round 2 every query has a value oracle (PageRank's is a fixed-k
    # power iteration unrolled as chained CTEs)
    assert rows_only == set()


@pytest.mark.parametrize("name", sorted(entry.oracle_sql().keys()))
def test_parity(spark, duck, name):
    sdf = entry.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entry.oracle_sql()[name]).df()
    problems = compare(name, sdf, odf)
    assert not problems, problems
