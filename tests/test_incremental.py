"""Incremental runner semantics (SURVEY.md §2.9: J9 + A7 + idempotence)."""

import shutil
import tempfile

from pyspark.sql import functions as F

from speech_data_pipeline_spark.plans.incremental import (
    pending,
    run_incremental_stage,
    stage_counters,
)


def test_pending_anti_join_and_retry(spark):
    inputs = spark.createDataFrame([("a",), ("b",), ("c",)], ["audio_id"])
    done = spark.createDataFrame(
        [("a", "ok"), ("b", "failed")], ["audio_id", "status"]
    )
    todo = sorted(r.audio_id for r in pending(inputs, done).collect())
    assert todo == ["b", "c"]  # failed rows retried
    todo = sorted(
        r.audio_id for r in pending(inputs, done, retry_failed=False).collect()
    )
    assert todo == ["c"]


def test_run_incremental_stage_idempotent(spark):
    tmp = tempfile.mkdtemp()
    out_path = f"{tmp}/stage_out"
    calls = []

    def stage(df):
        calls.append([r.audio_id for r in df.select("audio_id").collect()])
        return df.withColumn("result", F.upper("audio_id"))

    try:
        inputs1 = spark.createDataFrame([("a",), ("b",)], ["audio_id"])
        out = run_incremental_stage(spark, inputs1, stage, out_path)
        assert sorted(r.audio_id for r in out.collect()) == ["a", "b"]

        # second run, superset input: only 'c' is computed
        inputs2 = spark.createDataFrame([("a",), ("b",), ("c",)], ["audio_id"])
        out = run_incremental_stage(spark, inputs2, stage, out_path)
        assert sorted(r.audio_id for r in out.collect()) == ["a", "b", "c"]
        assert sorted(calls[1]) == ["c"]

        # third run, no new input: stage_fn not called again
        n_calls = len(calls)
        out = run_incremental_stage(spark, inputs2, stage, out_path)
        assert len(calls) == n_calls
        assert out.count() == 3
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stage_counters(spark):
    stage_out = spark.createDataFrame(
        [("a", "ok"), ("a", "ok"), ("b", "failed"), ("c", "ok")],
        ["audio_id", "status"],
    )
    rows = {r.status: (r.n_keys, r.n_rows) for r in stage_counters(stage_out).collect()}
    assert rows == {"ok": (2, 3), "failed": (1, 1)}
