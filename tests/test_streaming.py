"""Structured Streaming ingest tests: availableNow trigger over the
static test parquet, results compared to the equivalent batch query.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from speech_data_pipeline_spark.streaming.ingest import (
    read_event_stream,
    streaming_sessionize,
    streaming_type_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if name == "raw" else "complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.fixture(scope="module")
def landing(spark):
    tmp = tempfile.mkdtemp()
    shutil.copy(f"{SF_DIR}/events.parquet", f"{tmp}/events.parquet")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_type_counts_match_batch(spark, landing):
    stream = streaming_type_counts(read_event_stream(spark, landing))
    got = run_stream(spark, stream, "type_counts")
    batch = (
        spark.read.parquet(f"{landing}/events.parquet")
        .withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.window("ts_ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_sessionize_matches_batch_session_window(spark, landing):
    stream = streaming_sessionize(read_event_stream(spark, landing), gap="10 minutes")
    got = run_stream(spark, stream, "sessions")
    batch = (
        spark.read.parquet(f"{landing}/events.parquet")
        .withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
        .groupBy(F.session_window("ts_ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            F.round("total_value", 6).alias("total_value"),
        )
    )
    got = got.withColumn("total_value", F.round("total_value", 6))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    assert got.count() > 0


def test_stream_capped_sessions_foreachbatch(spark, landing):
    import tempfile

    from speech_data_pipeline_spark.streaming.ingest import stream_capped_sessions

    out = tempfile.mkdtemp() + "/sessions"
    q = stream_capped_sessions(
        read_event_stream(spark, landing), out, tempfile.mkdtemp()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() > 0
    # single availableNow batch over static data == batch kernel output
    from speech_data_pipeline_spark.operators.sessions import sessionize_capped

    iv = (
        spark.read.parquet(f"{landing}/events.parquet")
        .selectExpr(
            "user_id",
            "ts div 1000 as start_us",
            "ts div 1000 + cast(floor(value * 60000000.0) as long) as end_us",
        )
    )
    want = sessionize_capped(iv, interval=600_000_000, max_duration=1_800_000_000)
    assert sorted(map(tuple, got.drop("batch_id").collect())) == sorted(
        map(tuple, want.collect())
    )
