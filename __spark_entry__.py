"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``speech_data_pipeline_spark/``; this module is
a thin adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Gap-sessionization of the event stream (the engine's signature W1
    operator) joined back to per-user event stats.
    """
    from pyspark.sql import functions as F

    from speech_data_pipeline_spark.operators.sessions import sessionize_gap
    from speech_data_pipeline_spark.sources.catalog import (
        derived_intervals,
        load_table,
    )

    sf_dir = "/root/testdata/sf0.001"
    iv = derived_intervals(spark, sf_dir)
    sessions = sessionize_gap(iv, interval=600_000_000)
    per_user = sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max(F.col("session_end") - F.col("session_start")).alias("max_session_us"),
        F.sum("n_segments").alias("n_segments"),
    )
    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2).cast("double").alias(
            "total_value"
        ),
    )
    return per_user.join(totals, "user_id").orderBy("user_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from speech_data_pipeline_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every SQL-expressible query."""
    from speech_data_pipeline_spark.queries import ORACLES

    return dict(ORACLES)
