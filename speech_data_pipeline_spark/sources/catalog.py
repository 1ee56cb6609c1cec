"""Table catalog over the driver-generated parquet test data.

Ten tables (TESTDATA.md): TPC-H-ish star schema (`region nation customer
supplier part orders lineitem`) plus `events` (timestamped stream),
`documents` (text corpus), `embeddings` (vector corpus).

Scale notes: each table is a single parquet file locally but the loaders
take any directory/glob — at 100 TB these are partitioned parquet/Delta
table roots and everything below is unchanged. Filters and projections
applied by callers reach the parquet scan via Catalyst pushdown (verify
with ``df.explain``: `PushedFilters`, `ReadSchema`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table from ``sf_dir``.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    unless nanos are surfaced as raw int64 — so in Spark ``ts`` is a
    **long of epoch nanoseconds** (set per-read; works on any session,
    including the driver's). DuckDB truncates the same column to
    microsecond TIMESTAMP at scan; ``ts div 1000`` on our side matches
    its ``epoch_us`` exactly (both truncate toward zero).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view for ``spark.sql``."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def derived_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical segment table derived from `events`.

    Mirrors the reference's core relational object — a per-file interval
    table ``(audio_id, start, end, ...)`` (SURVEY.md §1.1, reference
    modules/vad_multi.py:33-44) — with ``user_id`` in the ``audio_id``
    partition-key role and event duration taken from ``value`` seconds.

    All bounds are **integer microseconds**: exact in both Spark and
    external SQL engines, immune to float-epoch drift. ``floor(value *
    6e7)`` (value minutes, not seconds) is used rather than a bare cast
    because double→int casts truncate in Spark but round in some
    oracles; the ×60 scale makes segments long enough that
    containment/overlap joins and the sweep-line have real work.
    """
    ev = load_table(spark, sf_dir, "events")
    start_us = F.expr("ts div 1000")  # ts is epoch-nanos long; see load_table
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        start_us.alias("start_us"),
        (start_us + F.floor(F.col("value") * F.lit(60_000_000.0)).cast("long")).alias(
            "end_us"
        ),
        "value",
    )


#: DuckDB-dialect equivalent of :func:`derived_intervals`, shared by the
#: oracle SQL of every interval query (driver pre-registers `events`).
DERIVED_INTERVALS_SQL = """
    SELECT event_id, user_id, event_type,
           epoch_us(ts) AS start_us,
           epoch_us(ts) + CAST(floor(value * 60000000.0) AS BIGINT) AS end_us,
           value
    FROM events
"""
