"""Structured Streaming over the events table.

The reference is batch-only (SURVEY.md §2.10 — /root/reference/src/main.c is
a straight-line program), so this module is a north-rule capability
extension: the same windowed aggregations the batch engine exposes
(__spark_entry__.events_tumbling / events_sessionize) expressed as streaming
queries with watermarks, plus a session-window aggregation. Tests drive a
parquet-backed stream to completion with processAllAvailable() and assert
batch/stream parity — the streaming analog of the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def tumbling_counts(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Batch twin of the streaming aggregation below: (window_start,
    event_type, n, value_sum)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "value_sum")
    )


def read_events_stream(spark: SparkSession, path_glob: str) -> DataFrame:
    """Parquet-directory stream source (one file per micro-batch by default;
    in production this is the kafka/kinesis source with the same schema)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path_glob)
    )


def tumbling_counts_stream(
    events: DataFrame, width: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming tumbling-window aggregation with late-data watermark.
    outputMode=append emits a window once the watermark passes its end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "value_sum")
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "60 minutes"
) -> DataFrame:
    """Per-user session aggregation with a dynamic session window (gap-based
    close), the streaming twin of the batch lag/cumsum sessionization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id", "n_events", "value_sum",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked ingestion dedup — the shape an LLM-data pipeline runs on
    its event/document firehose: keep the FIRST arrival of each
    (keys..., event-time window) and drop re-deliveries. Output: (ws, keys...),
    one row per distinct key-window.

    State stays bounded at 100 TB because the dedup subset includes the
    window() struct, which carries the event-time watermark metadata: state
    for windows older than the watermark is evicted, so the operator holds
    ~|distinct keys per watermark horizon| rows, not the full history. Rows
    are emitted on first arrival (append mode needs no watermark close),
    and because only the key columns are projected, the result is
    deterministic regardless of arrival order — equal to the batch
    DISTINCT the DuckDB oracle computes (__spark_entry__.py:
    events_dedup_stream)."""
    keyed = (
        events.withWatermark("ts", watermark)
        .select(F.window("ts", window).alias("w"), *keys)
        .dropDuplicates(["w", *keys])
    )
    return keyed.select(F.col("w.start").alias("window_start"), *keys)


def run_stream_to_memory(stream_df: DataFrame, name: str, mode: str = "append"):
    """Drive a streaming query over a bounded source to completion; returns
    the query (caller reads `SELECT * FROM {name}` and stops it)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
