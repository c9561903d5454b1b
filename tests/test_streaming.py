"""Streaming/batch parity on the events table."""

import pyspark.sql.functions as F

from pds_hw2_mpi_connected_components_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    sessionize_stream,
    tumbling_counts,
    tumbling_counts_stream,
)

import shutil
import tempfile

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir():
    # FileStreamSource requires a directory of files, not a single file
    d = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{SF_DIR}/events.parquet", f"{d}/part-0.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_tumbling_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["value_sum"], 6))
        for r in tumbling_counts(batch).collect()
    }
    stream = read_events_stream(spark, events_dir)
    # complete mode: bounded source, full result after processAllAvailable
    q = (
        tumbling_counts_stream(stream).writeStream.outputMode("complete")
        .format("memory").queryName("tumbling_out").start()
    )
    q.processAllAvailable()
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["value_sum"], 6))
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    q.stop()
    assert got == want


def test_session_window_stream(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    q = (
        sessionize_stream(stream, gap="30 minutes").writeStream
        .outputMode("complete").format("memory").queryName("sess_out").start()
    )
    q.processAllAvailable()
    got = spark.sql("SELECT * FROM sess_out")
    n_sessions_per_user = {
        r["user_id"]: r["cnt"]
        for r in got.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    q.stop()
    # batch oracle: lag/gap sessionization (same as __spark_entry__ query)
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    want = {
        r["user_id"]: r["n_sessions"]
        for r in ev.withColumn("new_sess", F.when(gap.isNull() | (gap >= 1800), 1).otherwise(0))
        .groupBy("user_id").agg(F.sum("new_sess").alias("n_sessions")).collect()
    }
    assert n_sessions_per_user == want


def test_dedup_stream_matches_batch_distinct(spark, events_dir):
    """Watermarked streaming dedup over a REPLAYED stream (each file fed
    twice => genuine re-deliveries across micro-batches) equals the batch
    DISTINCT of the key-window tuples: first arrival survives, duplicates
    drop, and projecting only key columns makes the result order-free."""
    import shutil as _sh
    import tempfile as _tmp

    from pds_hw2_mpi_connected_components_spark.streaming.events import dedup_stream

    twice = _tmp.mkdtemp(prefix="events_dedup_")
    _sh.copy(f"{SF_DIR}/events.parquet", f"{twice}/part-0.parquet")
    _sh.copy(f"{SF_DIR}/events.parquet", f"{twice}/part-1.parquet")
    try:
        stream = dedup_stream(read_events_stream(spark, twice))
        q = run_stream_to_memory(stream, "dedup_out", mode="append")
        got = {
            (r["window_start"], r["user_id"], r["event_type"])
            for r in spark.sql("SELECT * FROM dedup_out").collect()
        }
        q.stop()
    finally:
        _sh.rmtree(twice, ignore_errors=True)
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        (r["ws"], r["user_id"], r["event_type"])
        for r in batch.select(
            F.window("ts", "5 minutes").getField("start").alias("ws"),
            "user_id", "event_type",
        ).distinct().collect()
    }
    assert got == want
