"""SQL surface: the engine's operators exposed to ``spark.sql`` users
(SURVEY.md §7 design stance: register everything as SQL functions/TVFs).

Three layers:

- **Views** — the table catalog plus the derived ``intervals`` segment
  view, so ad-hoc SQL starts from the same relations the DataFrame API
  uses.
- **SQL scalar functions** (Spark 4 ``CREATE TEMPORARY FUNCTION ...
  RETURN expr``) — pure SQL bodies, fully Catalyst-optimizable (inlined
  into the caller's plan; no UDF boundary): interval overlap, trunc6,
  pad-and-clamp, audio-id normalization, speaker labels.
- **Python UDTF** — the capped session merge as a table-valued function
  with ``TABLE(...) PARTITION BY ... ORDER BY``: the SQL spelling of
  the applyInPandas kernel, one instance per partition, rows arriving
  in order, sessions emitted on terminate. Same 1-shuffle scale shape.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

from speech_data_pipeline_spark.sources.catalog import (
    DERIVED_INTERVALS_SQL,
    register_views,
)

_SQL_FUNCTIONS = [
    """
    CREATE OR REPLACE TEMPORARY FUNCTION overlap_len(
        a_start BIGINT, a_end BIGINT, b_start BIGINT, b_end BIGINT)
    RETURNS BIGINT
    RETURN greatest(least(a_end, b_end) - greatest(a_start, b_start),
                    CAST(0 AS BIGINT))
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION trunc6(x DOUBLE)
    RETURNS DOUBLE
    RETURN floor(x * 1000000.0) / 1000000.0
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION clamp_pad(
        x BIGINT, pad BIGINT, lo BIGINT, hi BIGINT)
    RETURNS BIGINT
    RETURN least(greatest(x - pad, lo), hi)
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION strip_audio_ext(name STRING)
    RETURNS STRING
    RETURN regexp_replace(name, '(?i)\\\\.(mp3|wav|flac|aac|ogg|m4a)$', '')
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION speaker_label(k INT)
    RETURNS STRING
    RETURN concat('speaker_', cast(k AS STRING))
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION zero_pad5(k BIGINT)
    RETURNS STRING
    RETURN lpad(cast(k AS STRING), 5, '0')
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION split_bucket(k BIGINT)
    RETURNS BIGINT
    RETURN pmod(cast(conv(substring(md5(cast(k AS STRING)), 1, 7), 16, 10)
                     AS BIGINT), 100)
    """,
]


@udtf(
    returnType=(
        "user_id bigint, session_id bigint, session_start bigint, "
        "session_end bigint, n_segments bigint"
    )
)
class SessionizeCappedUDTF:
    """W1 capped session merge as a SQL TVF.

    Use with a partitioned, ordered table argument::

        SELECT * FROM sessionize_capped(
            TABLE(intervals) PARTITION BY user_id ORDER BY (start_us, end_us),
            600000000, 1800000000)

    One UDTF instance per partition; rows arrive in ORDER BY order, so
    the sequential recurrence (strict-> gap, span cap vs running
    session start) runs exactly as in operators/sessions.py.
    """

    def __init__(self) -> None:
        self._key = None
        self._cur: list | None = None  # [start, end, n]
        self._sid = 0
        self._out: list[tuple] = []

    def _flush(self) -> None:
        if self._cur is not None:
            self._sid += 1
            self._out.append(
                (self._key, self._sid, self._cur[0], self._cur[1], self._cur[2])
            )

    def eval(self, row, interval: int, max_duration: int):
        s, e = row["start_us"], row["end_us"]
        self._key = row["user_id"]
        if self._cur is None:
            self._cur = [s, e, 1]
        elif s - self._cur[1] > interval or e - self._cur[0] > max_duration:
            self._flush()
            self._cur = [s, e, 1]
        else:
            self._cur[1] = max(self._cur[1], e)
            self._cur[2] += 1
        return iter(())

    def terminate(self):
        self._flush()
        yield from self._out


@udtf(
    returnType=(
        "source string, doc_id bigint, n_tokens bigint, seq_id bigint"
    )
)
class PackSequencesUDTF:
    """Greedy next-fit sequence packing as a SQL TVF
    (operators/packing.py semantics)::

        SELECT * FROM pack_sequences(
            TABLE(docs) PARTITION BY source ORDER BY (doc_id), 2048)

    One instance per partition, rows in ORDER BY order; a row that
    would push the running token total past the budget closes the
    sequence (oversized rows get their own).
    """

    def __init__(self) -> None:
        self._seq = 1
        self._total = 0
        self._out: list[tuple] = []

    def eval(self, row, budget: int):
        w = int(row["n_tokens"])
        if self._total > 0 and self._total + w > budget:
            self._seq += 1
            self._total = 0
        self._total += w
        self._out.append((row["source"], row["doc_id"], w, self._seq))
        return iter(())

    def terminate(self):
        yield from self._out


def register_sql_surface(spark: SparkSession, sf_dir: str) -> None:
    """Register views, SQL scalar functions, and TVFs on the session."""
    register_views(spark, sf_dir)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW intervals AS {DERIVED_INTERVALS_SQL}"
        .replace("epoch_us(ts)", "(ts div 1000)")
    )
    for ddl in _SQL_FUNCTIONS:
        spark.sql(ddl)
    spark.udtf.register("sessionize_capped", SessionizeCappedUDTF)
    spark.udtf.register("pack_sequences", PackSequencesUDTF)
