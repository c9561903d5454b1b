"""Vector column expressions over array<float>/array<double> embeddings.

Built-in higher-order functions only (zip_with/aggregate run JVM-side inside
codegen) — no Python UDF in the scoring path. Elements are cast to double
first so the fold is IEEE-double left-to-right, matching the DuckDB oracle
(list_cosine_similarity over DOUBLE[]).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
