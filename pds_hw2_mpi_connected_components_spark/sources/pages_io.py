"""Pages-table source: the engine's canonical input.

The input contract (BASELINE.json input_hint) is a table of Common-Crawl-
style web pages with columns (url string, warc_ts timestamp, html binary,
text string, lang string). This module loads it from Iceberg when the
runtime is present (the production target) or parquet (this sandbox), and
validates the schema up front with actionable errors — the reference's
format/bounds rejection (mtx_to_bin.c:100-151) transplanted to the pages
table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_FIELDS = {
    "url": T.StringType(),
    "warc_ts": T.TimestampType(),
    "html": T.BinaryType(),
    "text": T.StringType(),
    "lang": T.StringType(),
}


class PagesSchemaError(ValueError):
    pass


def validate_pages_schema(df: DataFrame) -> DataFrame:
    """Check the required columns exist with the contracted types; extra
    columns are allowed (projected away downstream by column pruning)."""
    by_name = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for name, want in PAGES_FIELDS.items():
        if name not in by_name:
            problems.append(f"missing column {name!r} ({want.simpleString()})")
        elif by_name[name] != want:
            problems.append(
                f"column {name!r} is {by_name[name].simpleString()}, "
                f"expected {want.simpleString()}"
            )
    if problems:
        raise PagesSchemaError(
            "pages table does not match the (url, warc_ts, html, text, lang) "
            "contract: " + "; ".join(problems)
        )
    return df


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Load the pages table. ``source`` is an Iceberg table name (used when
    the Iceberg runtime is on the classpath) or a parquet path. Schema is
    validated either way. A path that exists on the local filesystem is
    always read as parquet — a bare relative directory name like "pages"
    must not be misrouted to an Iceberg table lookup."""
    if "/" not in source and not os.path.exists(source) and _iceberg_available(spark):
        df = spark.read.format("iceberg").load(source)
    else:
        df = spark.read.parquet(source)
    return validate_pages_schema(df)


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False
