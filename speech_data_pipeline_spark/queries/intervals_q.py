"""Interval-algebra queries over the `events`-derived segment table.

`events` plays the role of the reference's per-file segment streams
(FIXTURES.md §"Mapping onto driver tables"): ``user_id`` is the
partition key (the reference's ``audio_id``), the event timestamp is
the segment start, and ``value`` seconds give the segment length. All
arithmetic is in integer microseconds (exact cross-engine).

Every query here has a DuckDB oracle — including the capped-session
kernel, whose sequential recurrence is replayed as a recursive CTE, and
the sweep-set kernel, verified against an O(n²) stabbing-query SQL
form. Kernel golden + property tests additionally pin the edge
semantics (tests/test_sessions.py, tests/test_sweepline.py,
tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from speech_data_pipeline_spark.operators import intervals as iv_ops
from speech_data_pipeline_spark.operators import sessions as sess_ops
from speech_data_pipeline_spark.operators import sweepline as sweep_ops
from speech_data_pipeline_spark.operators import windows as win_ops
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.sources.catalog import (
    DERIVED_INTERVALS_SQL,
    derived_intervals,
    load_table,
)

_IV = f"WITH iv AS ({DERIVED_INTERVALS_SQL})"

#: 10-minute session gap, in microseconds.
GAP_US = 600_000_000
#: 30-minute capped-session max span.
CAP_US = 1_800_000_000


@query(
    "j4_lead_gaps",
    oracle=f"""
    {_IV}
    SELECT user_id, gap_start, gap_end, gap_len FROM (
      SELECT user_id,
             end_us AS gap_start,
             lead(start_us) OVER w AS gap_end,
             lead(start_us) OVER w - end_us AS gap_len
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY start_us, end_us)
    ) WHERE gap_end IS NOT NULL AND gap_end >= gap_start
    """,
)
def j4_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successor-pair gap derivation (J4): lead() window, no self-join."""
    return iv_ops.lead_gaps(derived_intervals(spark, sf_dir)).select(
        "user_id", "gap_start", "gap_end", "gap_len"
    )


@query(
    "f7_monotonic_suppression",
    oracle=f"""
    {_IV}
    SELECT user_id, start_us, end_us FROM (
      SELECT user_id, start_us, end_us,
             max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM iv
    ) WHERE prev_max IS NULL OR end_us > prev_max
    """,
)
def f7_monotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contained-row suppression (F7): running-max window + filter."""
    return iv_ops.suppress_non_monotonic(derived_intervals(spark, sf_dir)).select(
        "user_id", "start_us", "end_us"
    )


@query(
    "f11_clamp_pad",
    oracle=f"""
    {_IV}, bounds AS (
      SELECT user_id, max(end_us) AS user_max_end FROM iv GROUP BY user_id
    )
    SELECT iv.event_id, iv.user_id,
           greatest(iv.start_us - 5000000, 0) AS start_clamped,
           least(iv.end_us + 5000000, b.user_max_end) AS end_clamped
    FROM iv JOIN bounds b ON iv.user_id = b.user_id
    """,
)
def f11_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pad-and-clamp bounds (F11) against a per-key upper bound.

    The per-user bound comes from a broadcast-able grouped aggregate —
    same shape as joining a file-durations table at scale.
    """
    ivd = derived_intervals(spark, sf_dir)
    bounds = ivd.groupBy("user_id").agg(F.max("end_us").alias("user_max_end"))
    return (
        ivd.join(F.broadcast(bounds), "user_id")
        .select(
            "event_id",
            "user_id",
            F.greatest(F.col("start_us") - F.lit(5_000_000), F.lit(0).cast("long")).alias(
                "start_clamped"
            ),
            F.least(F.col("end_us") + F.lit(5_000_000), F.col("user_max_end")).alias(
                "end_clamped"
            ),
        )
    )


@query(
    "w1_sessionize_gap",
    oracle=f"""
    {_IV}, flagged AS (
      SELECT user_id, start_us, end_us,
             CASE WHEN max(end_us) OVER
                    (PARTITION BY user_id ORDER BY start_us, end_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  OR start_us - max(end_us) OVER
                    (PARTITION BY user_id ORDER BY start_us, end_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > {GAP_US}
             THEN 1 ELSE 0 END AS new_session
      FROM iv
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(start_us) AS session_start,
           max(end_us) AS session_end, count(*) AS n_segments
    FROM (
      SELECT user_id, start_us, end_us,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY start_us, end_us
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    GROUP BY user_id, session_id
    """,
)
def w1_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-bounded session merge (W1, uncapped form): lag/flag/cumsum.

    Strict ``>`` break (reference parity, utils.py:78). One shuffle on
    the key, then two window passes and a grouped agg — the scalable
    sessionization default.
    """
    out = sess_ops.sessionize_gap(derived_intervals(spark, sf_dir), GAP_US)
    return out.select(
        "user_id", "session_id", "session_start", "session_end", "n_segments"
    )


@query(
    "w1_sessionize_capped",
    oracle=f"""
    WITH RECURSIVE iv AS ({DERIVED_INTERVALS_SQL}
    ), numbered AS (
      SELECT user_id, start_us, end_us,
             row_number() OVER (PARTITION BY user_id ORDER BY start_us, end_us) AS rn
      FROM iv
    ), walk AS (
      SELECT user_id, rn, start_us, end_us,
             start_us AS sess_start, end_us AS sess_end,
             CAST(1 AS BIGINT) AS session_id
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.rn, n.start_us, n.end_us,
             CASE WHEN (n.start_us - w.sess_end > {GAP_US})
                    OR (n.end_us - w.sess_start > {CAP_US})
                  THEN n.start_us ELSE w.sess_start END,
             CASE WHEN (n.start_us - w.sess_end > {GAP_US})
                    OR (n.end_us - w.sess_start > {CAP_US})
                  THEN n.end_us ELSE greatest(w.sess_end, n.end_us) END,
             w.session_id + CASE WHEN (n.start_us - w.sess_end > {GAP_US})
                                   OR (n.end_us - w.sess_start > {CAP_US})
                                 THEN 1 ELSE 0 END
      FROM walk w JOIN numbered n ON n.user_id = w.user_id AND n.rn = w.rn + 1
    )
    SELECT user_id, session_id, min(start_us) AS session_start,
           max(end_us) AS session_end, count(*) AS n_segments
    FROM walk GROUP BY user_id, session_id
    """,
)
def w1_sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full combine_timestamps semantics (W1): gap + running span cap.

    Non-associative recurrence → applyInPandas kernel per user_id
    (SURVEY.md §7 known-hard #1). The oracle replays the recurrence as
    a DuckDB recursive CTE stepping one segment per iteration — slow
    but exact, upgrading this kernel from a rows-only check to a full
    value-hash comparison. Golden + property tests pin the edge
    semantics (strict-gt gap, cap vs running session start).
    """
    out = sess_ops.sessionize_capped(
        derived_intervals(spark, sf_dir), interval=GAP_US, max_duration=CAP_US
    )
    return out.select(
        "user_id", "session_id", "session_start", "session_end", "n_segments"
    )


@query(
    "w1_sessionize_types",
    oracle=f"""
    WITH RECURSIVE iv AS ({DERIVED_INTERVALS_SQL}
    ), numbered AS (
      SELECT user_id, event_type, start_us, end_us,
             row_number() OVER (PARTITION BY user_id ORDER BY start_us, end_us)
               AS rn
      FROM iv
    ), walk AS (
      SELECT user_id, rn, event_type, start_us, end_us,
             start_us AS sess_start, end_us AS sess_end,
             CAST(1 AS BIGINT) AS session_id
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.rn, n.event_type, n.start_us, n.end_us,
             CASE WHEN (n.start_us - w.sess_end > {GAP_US})
                    OR (n.end_us - w.sess_start > {CAP_US})
                  THEN n.start_us ELSE w.sess_start END,
             CASE WHEN (n.start_us - w.sess_end > {GAP_US})
                    OR (n.end_us - w.sess_start > {CAP_US})
                  THEN n.end_us ELSE greatest(w.sess_end, n.end_us) END,
             w.session_id + CASE WHEN (n.start_us - w.sess_end > {GAP_US})
                                   OR (n.end_us - w.sess_start > {CAP_US})
                                 THEN 1 ELSE 0 END
      FROM walk w JOIN numbered n ON n.user_id = w.user_id AND n.rn = w.rn + 1
    ), sessions AS (
      SELECT user_id, session_id,
             min(start_us) AS session_start, max(end_us) AS session_end,
             count(*) AS n_segments,
             array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types
      FROM walk GROUP BY user_id, session_id
      HAVING bool_or(event_type = 'purchase')
    ), renum AS (
      SELECT user_id, session_start, session_end, n_segments, types,
             row_number() OVER (PARTITION BY user_id ORDER BY session_id)
               AS session_id
      FROM sessions
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           session_start, session_end, n_segments, types
    FROM renum
    """,
)
def w1_sessionize_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 with type accumulation + ``must_include`` (U3 /
    must_include_voice, reference modules/models/utils.py:85-94):
    sessions accumulate their members' type set and sessions lacking a
    'purchase'-typed member are dropped, with surviving sessions
    renumbered — the kernel increments its session counter only for
    kept sessions, which the oracle mirrors by renumbering after the
    HAVING filter. ``types`` is emitted as a sorted pipe-joined string
    (driver canonicalizer needs scalars)."""
    out = sess_ops.sessionize_capped(
        derived_intervals(spark, sf_dir),
        interval=GAP_US,
        max_duration=CAP_US,
        type_col="event_type",
        must_include="purchase",
    )
    return out.select(
        "user_id",
        "session_id",
        "session_start",
        "session_end",
        "n_segments",
        F.concat_ws("|", F.col("types")).alias("types"),
    )


@query(
    "w2_speaker_aware_merge",
    oracle=f"""
    WITH RECURSIVE iv AS ({DERIVED_INTERVALS_SQL}
    ), numbered AS (
      SELECT user_id, event_type, start_us, end_us,
             row_number() OVER (PARTITION BY user_id ORDER BY start_us, end_us)
               AS rn
      FROM iv
    ), walk AS (
      SELECT user_id, rn, event_type, start_us, end_us,
             start_us AS sess_start, end_us AS sess_end,
             CAST(1 AS BIGINT) AS session_id
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.rn, n.event_type, n.start_us, n.end_us,
             CASE WHEN (n.start_us - w.sess_end > {GAP_US})
                    OR (n.end_us - w.sess_start > {CAP_US})
                    OR (n.event_type <> w.event_type)
                  THEN n.start_us ELSE w.sess_start END,
             CASE WHEN (n.start_us - w.sess_end > {GAP_US})
                    OR (n.end_us - w.sess_start > {CAP_US})
                    OR (n.event_type <> w.event_type)
                  THEN n.end_us ELSE greatest(w.sess_end, n.end_us) END,
             w.session_id + CASE WHEN (n.start_us - w.sess_end > {GAP_US})
                                   OR (n.end_us - w.sess_start > {CAP_US})
                                   OR (n.event_type <> w.event_type)
                                 THEN 1 ELSE 0 END
      FROM walk w JOIN numbered n ON n.user_id = w.user_id AND n.rn = w.rn + 1
    ), sessions AS (
      SELECT user_id, session_id, event_type,
             min(start_us) AS session_start, max(end_us) AS session_end,
             count(*) AS n_segments
      FROM walk GROUP BY user_id, session_id, event_type
    )
    SELECT user_id, session_id, session_start, session_end, n_segments,
           event_type
    FROM sessions
    WHERE session_end - session_start > {GAP_US} / 100
    """,
)
def w2_speaker_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Speaker-aware session merge (W2): the W1 gap+cap kernel with a
    break column (event_type standing in for the speaker label,
    reference combine_same_speaker, modules/speaker_rematch.py:25-43),
    then the reference's trailing min-duration filter
    (speaker_rematch.py:43 drops merged segments <= min_duration).

    One kernel serves W1 and W2 (``break_cols``); the oracle replays
    the recurrence with the extra break condition. The walked
    ``event_type`` is constant within a session by construction, so
    grouping carries it through.
    """
    out = sess_ops.sessionize_capped(
        derived_intervals(spark, sf_dir),
        interval=GAP_US,
        max_duration=CAP_US,
        break_cols=("event_type",),
    )
    return out.where(
        F.col("session_end") - F.col("session_start") > GAP_US / 100
    ).select(
        "user_id", "session_id", "session_start", "session_end",
        "n_segments", "event_type",
    )


@query(
    "funnel_view_to_purchase",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'purchase'
    ), views AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'view'
      GROUP BY user_id, epoch_us(ts)
    ), attributed AS (
      SELECT p.user_id, p.event_id,
             CASE WHEN v.ts_us IS NOT NULL
                       AND p.ts_us - v.ts_us <= 86400000000
                  THEN 1 ELSE 0 END AS converted
      FROM purchases p ASOF LEFT JOIN views v
        ON p.user_id = v.user_id AND p.ts_us >= v.ts_us
    )
    SELECT user_id,
           count(*) AS n_purchases,
           CAST(sum(converted) AS BIGINT) AS n_attributed,
           floor(sum(converted) * 1.0 / count(*) * 1000000.0) / 1000000.0
             AS attribution_rate
    FROM attributed GROUP BY user_id
    """,
)
def funnel_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed conversion funnel: each purchase attributed to the most
    recent prior view within 24 h (last-touch attribution), rolled up
    to per-user attribution rates — the canonical event-analytics
    composite, built on the one-shuffle as-of join rather than a range
    join (the attribution window is a FILTER on the as-of result, not a
    join predicate, so the plan stays linear in events)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.expr("ts div 1000").alias("ts_us")
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", F.expr("ts div 1000").alias("ts_us"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("user_id", "ts_us", F.col("ts_us").alias("view_ts"))
    )
    att = iv_ops.asof_join(
        purchases, views, key="user_id", left_ts="ts_us", right_ts="ts_us",
        payload_cols=("view_ts",),
    ).withColumn(
        "converted",
        F.when(
            F.col("asof_view_ts").isNotNull()
            & (F.col("ts_us") - F.col("asof_view_ts") <= 86_400_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return att.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("converted").alias("n_attributed"),
        (
            F.floor(F.sum("converted") / F.count(F.lit(1)) * F.lit(1e6)) / F.lit(1e6)
        ).alias("attribution_rate"),
    )


@query(
    "rollup_time_hypertable",
    oracle="""
    WITH b AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 * 3600000000 AS hour_us,
             epoch_us(ts) // 86400000000 * 86400000000 AS day_us,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    )
    SELECT 'hour' AS grain, hour_us AS bucket_us, event_type,
           count(*) AS n,
           CAST(round(sum(v), 2) AS DOUBLE) AS total_value
    FROM b GROUP BY hour_us, event_type
    UNION ALL
    SELECT 'day' AS grain, day_us AS bucket_us, event_type,
           count(*) AS n,
           CAST(round(sum(v), 2) AS DOUBLE) AS total_value
    FROM b GROUP BY day_us, event_type
    """,
)
def rollup_time_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: hour and day
    continuous aggregates of the event stream in one pass — the
    materialized-rollup table a time-series store maintains per chunk.
    Bucket arithmetic is integer epoch math (timezone-free); sums
    accumulate as DECIMAL (shuffle-order-proof) and round while exact.
    At scale the day grain aggregates the hour grain's output
    (re-aggregation, not a second raw scan) — expressed here as one
    plan so Catalyst reuses the scan via the shared bucket projection.
    """
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        (F.expr("ts div 1000") - F.expr("ts div 1000") % F.lit(3_600_000_000)).alias(
            "hour_us"
        ),
        (
            F.expr("ts div 1000") - F.expr("ts div 1000") % F.lit(86_400_000_000)
        ).alias("day_us"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    hourly = b.groupBy("hour_us", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 2).cast("double").alias("total_value"),
    )
    daily = b.groupBy("day_us", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("v"), 2).cast("double").alias("total_value"),
    )
    return hourly.select(
        F.lit("hour").alias("grain"),
        F.col("hour_us").alias("bucket_us"),
        "event_type",
        "n",
        "total_value",
    ).unionByName(
        daily.select(
            F.lit("day").alias("grain"),
            F.col("day_us").alias("bucket_us"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "j_asof_last_view",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'click'
    ), views AS (
      SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS view_value
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, epoch_us(ts)
    )
    SELECT c.event_id, c.user_id, c.ts_us,
           v.view_value AS asof_view_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts_us >= v.ts_us
    """,
)
def j_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click gets the value of the user's most recent
    view at-or-before it (point-in-time lookup).

    Engine side is the union + carry-forward window
    (operators/intervals.asof_join) — ONE shuffle on the key, no range
    join; the oracle is DuckDB's native ASOF JOIN. The right stream is
    pre-aggregated per (user, ts) so equal-timestamp ties cannot make
    either engine's pick ambiguous.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.expr("ts div 1000").alias("ts_us")
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", F.expr("ts div 1000").alias("ts_us"))
        .agg(F.max("value").alias("view_value"))
    )
    out = iv_ops.asof_join(
        clicks, views, key="user_id", left_ts="ts_us", right_ts="ts_us",
        payload_cols=("view_value",),
    )
    return out.select(
        "event_id", "user_id", "ts_us",
        F.col("asof_view_value").alias("asof_view_value"),
    )


@query(
    "j_asof_null_payload",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'click'
    ), views AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             CASE WHEN count(*) % 2 = 0 THEN NULL ELSE max(value) END AS v1,
             min(event_id) AS v2
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, epoch_us(ts)
    )
    SELECT c.event_id, c.user_id, c.ts_us,
           v.v1 AS asof_v1, v.v2 AS asof_v2
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts_us >= v.ts_us
    """,
)
def j_asof_null_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with NULLABLE multi-column right payloads — pins the
    round-3 fix (operators/intervals.py asof_join): all payload
    columns ride ONE carried struct, so a matched row whose payload
    field is NULL yields that NULL, instead of ``last(ignorenulls)``
    silently substituting the field from an OLDER row (mixed-payload
    rows). Half the view rows carry a NULL v1 next to a non-NULL v2 —
    exactly the shape that exposed the defect — and the oracle is
    DuckDB's native ASOF LEFT JOIN, which always returns both fields
    from the single matched row."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.expr("ts div 1000").alias("ts_us")
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", F.expr("ts div 1000").alias("ts_us"))
        .agg(
            F.when(F.count(F.lit(1)) % 2 == 0, F.lit(None).cast("double"))
            .otherwise(F.max("value"))
            .alias("v1"),
            F.min("event_id").alias("v2"),
        )
    )
    out = iv_ops.asof_join(
        clicks, views, key="user_id", left_ts="ts_us", right_ts="ts_us",
        payload_cols=("v1", "v2"),
    )
    return out.select("event_id", "user_id", "ts_us", "asof_v1", "asof_v2")


@query(
    "w3_sweepline_counts",
    oracle=f"""
    {_IV}, ev AS (
      SELECT user_id, start_us AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT user_id, end_us AS t, -1 AS delta FROM iv
    ), merged AS (
      SELECT user_id, t, sum(delta) AS delta FROM ev GROUP BY user_id, t
    )
    SELECT user_id, piece_start, piece_end,
           CAST(n_active AS BIGINT) AS n_active FROM (
      SELECT user_id, t AS piece_start,
             lead(t) OVER (PARTITION BY user_id ORDER BY t) AS piece_end,
             sum(delta) OVER (PARTITION BY user_id ORDER BY t
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_active
      FROM merged
    ) WHERE piece_end IS NOT NULL AND n_active >= 1
    """,
)
def w3_sweepline_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line overlap flattening, concurrency-count form (W3).

    Boundary events + running sum — fully declarative, one shuffle.
    """
    return sweep_ops.flatten_active_counts(derived_intervals(spark, sf_dir))


@query(
    "w3_sweepline_sets",
    oracle=f"""
    {_IV}, tagged AS (
      SELECT user_id, start_us, end_us, event_type AS tag FROM iv
      WHERE end_us > start_us
    ), bounds AS (
      SELECT DISTINCT user_id, t FROM (
        SELECT user_id, start_us AS t FROM tagged
        UNION ALL SELECT user_id, end_us AS t FROM tagged
      )
    ), pieces AS (
      SELECT user_id, t AS piece_start,
             lead(t) OVER (PARTITION BY user_id ORDER BY t) AS piece_end
      FROM bounds
    )
    SELECT p.user_id, p.piece_start, p.piece_end,
           array_to_string(list_sort(list(DISTINCT g.tag)), '|') AS tags,
           count(DISTINCT g.tag) AS n_distinct_tags
    FROM pieces p
    JOIN tagged g
      ON g.user_id = p.user_id
     AND g.start_us < p.piece_end AND g.end_us > p.piece_start
    WHERE p.piece_end IS NOT NULL
    GROUP BY p.user_id, p.piece_start, p.piece_end
    """,
)
def w3_sweepline_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line with full active-set semantics (W3 kernel).

    Spark side runs the O(n log n) applyInPandas kernel; the oracle
    reproduces the semantics declaratively as piece×interval stabbing
    (O(n²) — fine for the oracle, not the engine path). Distinct-tag
    normalization on both sides makes the outputs comparable.
    """
    tagged = derived_intervals(spark, sf_dir).select(
        "user_id", "start_us", "end_us", F.col("event_type").alias("tag")
    )
    flat = sweep_ops.flatten_active_sets(tagged)
    return flat.select(
        "user_id",
        "piece_start",
        "piece_end",
        F.concat_ws("|", F.array_sort(F.array_distinct("tags"))).alias("tags"),
        F.size(F.array_distinct("tags")).cast("long").alias("n_distinct_tags"),
    )


@query(
    "w4_sliding_windows",
    oracle=f"""
    {_IV}, segs AS (
      SELECT user_id, start_us, end_us,
             CAST(ceil((end_us - start_us - 3600000000) / 1800000000.0) AS BIGINT) + 1
               AS n_windows
      FROM iv WHERE end_us - start_us > 3600000000
    )
    SELECT user_id, start_us AS seg_start, end_us AS seg_end,
           i AS w_idx,
           start_us + i * 1800000000 AS win_start,
           least(start_us + i * 1800000000 + 3600000000, end_us) AS win_end
    FROM segs, unnest(generate_series(0, n_windows - 1)) AS t(i)
    """,
)
def w4_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchored sliding-window explode (W4): 60 min windows, 30 min hop over
    segments longer than one window. sequence+explode, no UDF."""
    ivd = derived_intervals(spark, sf_dir).where(
        F.col("end_us") - F.col("start_us") > 3_600_000_000
    )
    return win_ops.sliding_windows(ivd, window=3_600_000_000, hop=1_800_000_000)


@query(
    "a12_budgeted_topk",
    oracle=f"""
    {_IV}, d AS (
      SELECT user_id, event_id, end_us - start_us AS dur_us FROM iv
    )
    SELECT user_id, event_id, dur_us FROM (
      SELECT user_id, event_id, dur_us,
             sum(dur_us) OVER (PARTITION BY user_id
                               ORDER BY dur_us DESC, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM d
    ) WHERE cum <= 500000000000
    """,
)
def a12_budgeted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted greedy accumulation (A12): longest-first within a 500000 s budget."""
    d = derived_intervals(spark, sf_dir).select(
        "user_id", "event_id", (F.col("end_us") - F.col("start_us")).alias("dur_us")
    )
    return win_ops.budgeted_topk(
        d, budget=500_000_000_000, weight_col="dur_us", order_cols=("event_id",)
    )


@query(
    "j1_containment_join",
    oracle=f"""
    {_IV},
    clicks AS (SELECT * FROM iv WHERE event_type = 'click'),
    views  AS (SELECT * FROM iv WHERE event_type = 'view')
    SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id
    FROM clicks c JOIN views v
      ON c.user_id = v.user_id
     AND c.start_us >= v.start_us AND c.end_us <= v.end_us
    """,
)
def j1_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment join (J1/J2): clicks inside view spans.

    Key-equi join + range predicates; per-key cardinality bounds the
    quadratic term exactly as in the per-file reference scan.
    """
    ivd = derived_intervals(spark, sf_dir)
    clicks = ivd.where(F.col("event_type") == "click").select(
        "user_id", "start_us", "end_us", F.col("event_id").alias("click_id")
    )
    views = ivd.where(F.col("event_type") == "view").select(
        "user_id", "start_us", "end_us", F.col("event_id").alias("view_id")
    )
    out = iv_ops.containment_join(clicks, views)
    return out.select("click_id", "view_id", "user_id")


@query(
    "j3_max_overlap_join",
    oracle=f"""
    {_IV},
    purchases AS (SELECT user_id, start_us AS l_start, end_us AS l_end
                  FROM iv WHERE event_type = 'purchase'),
    views AS (SELECT user_id, start_us, end_us, CAST(event_id AS VARCHAR) AS tag
              FROM iv WHERE event_type = 'view')
    SELECT user_id, l_start, l_end, best_tag, best_overlap FROM (
      SELECT p.user_id, p.l_start, p.l_end, v.tag AS best_tag,
             greatest(least(p.l_end, v.end_us) - greatest(p.l_start, v.start_us), 0)
               AS best_overlap,
             row_number() OVER (
               PARTITION BY p.user_id, p.l_start, p.l_end
               ORDER BY greatest(least(p.l_end, v.end_us)
                                 - greatest(p.l_start, v.start_us), 0) DESC,
                        v.tag DESC) AS rn
      FROM purchases p JOIN views v
        ON p.user_id = v.user_id
       AND p.l_start < v.end_us AND v.start_us < p.l_end
    ) WHERE rn = 1
    """,
)
def j3_max_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-overlap interval join (J3): overlap join + max_by per row."""
    ivd = derived_intervals(spark, sf_dir)
    purchases = ivd.where(F.col("event_type") == "purchase").select(
        "user_id", "start_us", "end_us"
    )
    views = ivd.where(F.col("event_type") == "view").select(
        "user_id", "start_us", "end_us", F.col("event_id").cast("string").alias("tag")
    )
    return iv_ops.max_overlap_join(purchases, views)


@query(
    "w9_barrier_sessionize",
    oracle=f"""
    {_IV}, segs AS (
      SELECT user_id, start_us, end_us, 0 AS is_barrier
      FROM iv WHERE event_type <> 'error'
    ), bars AS (
      SELECT user_id, start_us, start_us AS end_us, 1 AS is_barrier
      FROM iv WHERE event_type = 'error'
    ), unioned AS (
      SELECT * FROM segs UNION ALL SELECT * FROM bars
    ), with_bid AS (
      SELECT user_id, start_us, end_us, is_barrier,
             sum(is_barrier) OVER (PARTITION BY user_id
                                   ORDER BY start_us, is_barrier DESC, end_us
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS barrier_id
      FROM unioned
    ), flagged AS (
      SELECT user_id, barrier_id, start_us, end_us,
             CASE WHEN max(end_us) OVER w IS NULL
                  OR start_us - max(end_us) OVER w > {GAP_US}
             THEN 1 ELSE 0 END AS new_session
      FROM with_bid WHERE is_barrier = 0
      WINDOW w AS (PARTITION BY user_id, barrier_id ORDER BY start_us, end_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, CAST(barrier_id AS BIGINT) AS barrier_id,
           CAST(session_id AS BIGINT) AS session_id,
           min(start_us) AS session_start,
           max(end_us) AS session_end, count(*) AS n_segments
    FROM (
      SELECT user_id, barrier_id, start_us, end_us,
             sum(new_session) OVER (PARTITION BY user_id, barrier_id
                                    ORDER BY start_us, end_us
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    GROUP BY user_id, barrier_id, session_id
    """,
)
def w9_barriers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Barrier-flushed sessionization (W9): 'error' events break sessions.

    Barrier ids from one running sum over the unioned stream — no range
    join — then gap sessionization within (user, barrier_id).
    """
    ivd = derived_intervals(spark, sf_dir)
    segs = ivd.where(F.col("event_type") != "error")
    bars = ivd.where(F.col("event_type") == "error").select("user_id", "start_us")
    out = sess_ops.sessionize_barriers(segs, bars, GAP_US)
    return out.select(
        "user_id",
        "barrier_id",
        "session_id",
        "session_start",
        "session_end",
        "n_segments",
    )


@query(
    "f2_gap_classifier",
    oracle=f"""
    {_IV}, g AS (
      SELECT user_id,
             end_us AS gap_start,
             lead(start_us) OVER w AS gap_end,
             value AS prev_value,
             lead(value) OVER w AS next_value
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY start_us, end_us)
    )
    SELECT user_id, gap_start, gap_end,
           CASE WHEN (gap_end - gap_start < 30000000)
                  OR (prev_value > 100.0 AND next_value > 100.0)
                THEN 'silence' ELSE 'noise' END AS gap_class
    FROM g WHERE gap_end IS NOT NULL AND gap_end >= gap_start
    """,
)
def f2_gap_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound-predicate gap classifier (F2 analog).

    Short-gap short-circuit OR neighbor-energy conjunction — the
    reference's silence classifier shape over lead-derived gap rows
    (single window pass; prev/next context without self-joins).
    """
    from pyspark.sql import Window

    ivd = derived_intervals(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("start_us", "end_us")
    g = (
        ivd.withColumn("gap_end", F.lead("start_us").over(w))
        .withColumn("next_value", F.lead("value").over(w))
        .where(F.col("gap_end").isNotNull() & (F.col("gap_end") >= F.col("end_us")))
    )
    is_silence = (F.col("gap_end") - F.col("end_us") < 30_000_000) | (
        (F.col("value") > 100.0) & (F.col("next_value") > 100.0)
    )
    return g.select(
        "user_id",
        F.col("end_us").alias("gap_start"),
        "gap_end",
        F.when(is_silence, "silence").otherwise("noise").alias("gap_class"),
    )


@query(
    "f2_compat_double_append",
    oracle=f"""
    {_IV}, g AS (
      SELECT user_id,
             end_us AS gap_start,
             lead(start_us) OVER w AS gap_end,
             value / 200.0 AS r_prev,
             lead(value) OVER w / 200.0 AS r_next
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY start_us, end_us)
    ), rows_ AS (
      SELECT user_id, gap_start, gap_end,
             (gap_end - gap_start < 30000000) AS is_short,
             (r_prev < 0.1 AND r_next < 0.1) AS is_quiet
      FROM g WHERE gap_end IS NOT NULL AND gap_end >= gap_start
    )
    SELECT user_id, gap_start, gap_end, is_short, is_quiet,
           (is_short OR is_quiet) AS silence
    FROM rows_
    UNION ALL
    SELECT user_id, gap_start, gap_end, is_short, is_quiet, TRUE AS silence
    FROM rows_ WHERE is_short AND is_quiet
    """,
)
def f2_compat_double_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 with the reference's double-append quirk ON (SURVEY §7
    known-hard #2; modules/models/utils.py:127-143 appends a gap to the
    silence list twice when it is both short AND quiet — two
    independent ``if``s, not ``elif``). The engine reproduces the
    duplicate rows exactly behind ``compat_double_append=True``; the
    oracle is the fixed classifier UNION ALL the double-append rows.
    Row count — not just values — is the check here."""
    from pyspark.sql import Window

    from speech_data_pipeline_spark.operators.classify import classify_silence

    ivd = derived_intervals(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("start_us", "end_us")
    gaps = (
        ivd.withColumn("gap_end", F.lead("start_us").over(w))
        .withColumn("r_next", F.lead("value").over(w) / 200.0)
        .where(F.col("gap_end").isNotNull() & (F.col("gap_end") >= F.col("end_us")))
        .select(
            "user_id",
            F.col("end_us").alias("gap_start"),
            "gap_end",
            (F.col("value") / 200.0).alias("energy_ratio_prev"),
            F.col("r_next").alias("energy_ratio_next"),
            (F.col("value") / 200.0).alias("peak_ratio_prev"),
            F.col("r_next").alias("peak_ratio_next"),
        )
    )
    out = classify_silence(
        gaps,
        default_silence_duration=30_000_000,
        start="gap_start",
        end="gap_end",
        compat_double_append=True,
    )
    return out.select(
        "user_id", "gap_start", "gap_end", "is_short", "is_quiet", "silence"
    )


@query(
    "pipeline_composite_user_report",
    oracle=f"""
    {_IV}, kept AS (
      SELECT user_id, start_us, end_us FROM (
        SELECT user_id, start_us, end_us,
               max(end_us) OVER (PARTITION BY user_id ORDER BY start_us, end_us
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS prev_max
        FROM iv
      ) WHERE prev_max IS NULL OR end_us > prev_max
    ), flagged AS (
      SELECT user_id, start_us, end_us,
             CASE WHEN max(end_us) OVER w IS NULL
                  OR start_us - max(end_us) OVER w > {GAP_US}
             THEN 1 ELSE 0 END AS new_session
      FROM kept
      WINDOW w AS (PARTITION BY user_id ORDER BY start_us, end_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), sessions AS (
      SELECT user_id, session_id, min(start_us) AS s_start,
             max(end_us) AS s_end, count(*) AS n_segments
      FROM (
        SELECT user_id, start_us, end_us,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY start_us, end_us
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS session_id
        FROM flagged
      ) GROUP BY user_id, session_id
    )
    SELECT user_id,
           count(*) AS n_sessions,
           max(s_end - s_start) AS longest_session_us,
           CAST(sum(s_end - s_start) AS BIGINT) AS total_session_us,
           CAST(sum(n_segments) AS BIGINT) AS n_segments
    FROM sessions GROUP BY user_id
    """,
)
def pipeline_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline composite: the stage-2/3 shape as ONE declarative plan —
    monotonic suppression (F7) → gap sessionization (W1) → per-user
    session report (A1/A3). Three window passes and one aggregate over
    a single shuffle on the partition key; Catalyst fuses the whole
    thing into one stage chain with no intermediate materialization
    (the reference writes JSON between each of these steps).
    """
    ivd = derived_intervals(spark, sf_dir)
    kept = iv_ops.suppress_non_monotonic(ivd)
    sessions = sess_ops.sessionize_gap(kept, GAP_US)
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max(F.col("session_end") - F.col("session_start")).alias(
            "longest_session_us"
        ),
        F.sum(F.col("session_end") - F.col("session_start")).alias(
            "total_session_us"
        ),
        F.sum("n_segments").cast("long").alias("n_segments"),
    )


@query(
    "f5_single_overlap_split",
    oracle=f"""
    {_IV}, tagged AS (
      SELECT user_id, start_us, end_us, event_type AS tag FROM iv
      WHERE end_us > start_us
    ), bounds AS (
      SELECT DISTINCT user_id, t FROM (
        SELECT user_id, start_us AS t FROM tagged
        UNION ALL SELECT user_id, end_us AS t FROM tagged
      )
    ), pieces AS (
      SELECT user_id, t AS piece_start,
             lead(t) OVER (PARTITION BY user_id ORDER BY t) AS piece_end
      FROM bounds
    ), flat AS (
      SELECT p.user_id, p.piece_start, p.piece_end,
             array_to_string(list_sort(list(DISTINCT g.tag)), '|') AS tags_str,
             count(DISTINCT g.tag) AS n_active
      FROM pieces p
      JOIN tagged g
        ON g.user_id = p.user_id
       AND g.start_us < p.piece_end AND g.end_us > p.piece_start
      WHERE p.piece_end IS NOT NULL
      GROUP BY p.user_id, p.piece_start, p.piece_end
    )
    SELECT user_id, piece_start, piece_end,
           CASE WHEN n_active = 1 THEN 'single' ELSE 'overlap' END AS branch,
           tags_str
    FROM flat
    """,
)
def f5_single_overlap_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 as a gate query (previously pytest-only): the sweep-line's
    flattened pieces split into the single-speaker branch (exactly one
    active tag — exported with that tag) and the overlap branch (≥2
    active tags), re-unioned with a branch marker so one oracle checks
    both routes. Mirrors the reference's single/overlap segment split
    (modules/vad_multi.py single-vs-overlap routing); the oracle
    replays it as piece×interval stabbing.
    """
    tagged = derived_intervals(spark, sf_dir).select(
        "user_id", "start_us", "end_us", F.col("event_type").alias("tag")
    )
    single, overlap = sweep_ops.split_single_overlap(
        sweep_ops.flatten_active_sets(tagged)
    )
    return single.select(
        "user_id",
        "piece_start",
        "piece_end",
        F.lit("single").alias("branch"),
        F.col("tag").alias("tags_str"),
    ).unionByName(
        overlap.select(
            "user_id",
            "piece_start",
            "piece_end",
            F.lit("overlap").alias("branch"),
            F.concat_ws("|", F.col("tags")).alias("tags_str"),
        )
    )
