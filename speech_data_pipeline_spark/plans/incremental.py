"""Incremental / idempotent stage execution (SURVEY.md §2.9, J9, A7).

The reference's only recovery mechanism is ``skip_if_exist`` (per-file
output-existence checks in every stage) plus per-file try/except
counters. The engine's equivalents:

- ``pending``      — ``inputs LEFT ANTI JOIN done`` on the key: the
  incremental-processing primitive. One scan of the done-keys column
  (column-pruned), broadcast when small.
- ``run_incremental_stage`` — compute only pending rows, append results
  to the stage table. Failures are **rows, not control flow**: the
  stage function emits a ``status``/``error`` column pair; a re-run
  picks failed keys up again if ``retry_failed``.
- ``stage_counters`` — the A7 completed/failed report as one grouped
  aggregate instead of per-file exception counting.

At 100 TB the done-set is a Delta/parquet table partitioned like the
input; the anti-join prunes to key columns and broadcasts when the
done-set fits (the common incremental case: small delta of new files).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pending(
    inputs: DataFrame,
    done: DataFrame | None,
    key: str = "audio_id",
    retry_failed: bool = True,
) -> DataFrame:
    """Rows of ``inputs`` whose key is absent from ``done`` (J9).

    With ``retry_failed``, done rows whose ``status != 'ok'`` do not
    count as done, so failed keys re-enter the work set.
    """
    if done is None:
        return inputs
    done_keys = done
    if retry_failed and "status" in done.columns:
        done_keys = done.where(F.col("status") == "ok")
    return inputs.join(done_keys.select(key).distinct(), key, "left_anti")


def stage_counters(stage_out: DataFrame, key: str = "audio_id") -> DataFrame:
    """A7: per-status distinct-key counts for a stage table."""
    return (
        stage_out.groupBy("status")
        .agg(F.countDistinct(key).alias("n_keys"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy("status")
    )


def run_incremental_stage(
    spark: SparkSession,
    inputs: DataFrame,
    stage_fn: Callable[[DataFrame], DataFrame],
    out_path: str,
    key: str = "audio_id",
) -> DataFrame:
    """Run ``stage_fn`` over not-yet-done inputs; append to ``out_path``.

    ``stage_fn`` must return a DataFrame containing ``key`` and may
    include ``status``/``error`` columns (defaulted to 'ok'/null).
    Returns the full stage table after the append. Idempotent: a second
    call with the same inputs computes nothing new.
    """
    done = None
    if os.path.exists(out_path):
        done = spark.read.parquet(out_path)
    todo = pending(inputs, done, key=key)
    if todo.limit(1).count() == 0:
        return done if done is not None else spark.createDataFrame([], "audio_id string")
    out = stage_fn(todo)
    if "status" not in out.columns:
        out = out.withColumn("status", F.lit("ok")).withColumn(
            "error", F.lit(None).cast("string")
        )
    out.write.mode("append").parquet(out_path)
    return spark.read.parquet(out_path)
