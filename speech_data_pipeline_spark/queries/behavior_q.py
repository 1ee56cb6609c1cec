"""Behavioral / time-series queries over the events stream: rolling
z-score anomaly detection, first-order Markov transition model, and
CDC-changelog apply (Delta ``MERGE INTO`` last-writer-wins semantics).

Engine-portable by the registry's standard contract: event values are
quantized to integer milli-units at the boundary so every windowed sum
crosses the shuffle as an exact BIGINT; z-scores come out of the
integer sums ``(n·x − Σx)/sqrt(n·Σx² − (Σx)²)`` so the only float ops
are one sqrt and one divide (IEEE-exact, shuffle-order-proof);
orderings tie-break on ``event_id``.

Reference parity: the reference's pipeline has no time-series surface
(its F-stage filters are per-file); these queries are part of the
beyond-reference analytics north star (SURVEY.md §2 "beyond").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speech_data_pipeline_spark.functions import trunc6
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.sources.catalog import load_table

#: Rolling-baseline frame: the 20 events strictly before the current
#: one (never the current row — the anomaly must not shift its own
#: baseline), minimum 10 for a usable variance.
_ZW_N = 20
_ZW_MIN = 10
_Z_THRESHOLD = 2.0


@query(
    "ts_anomaly_zscore",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us, value,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS mv
      FROM events
    ), w AS (
      SELECT user_id, event_id, t_us, value, mv,
             count(mv) OVER win AS n,
             sum(mv) OVER win AS s1,
             sum(mv * mv) OVER win AS s2
      FROM e
      WINDOW win AS (PARTITION BY user_id ORDER BY t_us, event_id
                     ROWS BETWEEN {_ZW_N} PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, t_us, value,
           floor(((n * mv - s1) / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)))
                 * 1000000.0) / 1000000.0 AS zscore
    FROM w
    WHERE n >= {_ZW_MIN} AND n * s2 - s1 * s1 > 0
      AND abs((n * mv - s1) / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)))
          >= {_Z_THRESHOLD}
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score anomaly detection.

    One shuffle (the ``user_id`` window sort); the frame carries only
    integer partial sums, so the flagged set is identical under any
    partitioning. z is derived entirely from the frame's integer
    ``(n, Σx, Σx²)``: ``z = (n·x − Σx) / sqrt(n·Σx² − (Σx)²)`` — the
    population z-score against the 20 PRIOR events, exact to the last
    bit on any engine (no running float mean crosses a boundary).
    """
    ev = load_table(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    base = ev.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("t_us"),
        "value",
        mv.alias("mv"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(-_ZW_N, -1)
    )
    stats = base.select(
        "user_id",
        "event_id",
        "t_us",
        "value",
        "mv",
        F.count("mv").over(win).alias("n"),
        F.sum("mv").over(win).alias("s1"),
        F.sum(F.col("mv") * F.col("mv")).over(win).alias("s2"),
    )
    var_num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    z = (F.col("n") * F.col("mv") - F.col("s1")) / F.sqrt(var_num.cast("double"))
    return stats.where(
        (F.col("n") >= _ZW_MIN) & (var_num > 0) & (F.abs(z) >= _Z_THRESHOLD)
    ).select(
        "user_id", "event_id", "t_us", "value", trunc6(z).alias("zscore")
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id)
               AS prev_type
      FROM events
    ), c AS (
      SELECT prev_type, event_type AS next_type, count(*) AS cnt
      FROM s WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, cnt,
           floor((CAST(cnt AS DOUBLE)
                  / sum(cnt) OVER (PARTITION BY prev_type))
                 * 1000000.0) / 1000000.0 AS prob
    FROM c
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams.

    Plan: one ``user_id`` window sort (lag), one grouped count — the
    transition matrix is |types|² rows, so the per-``prev_type``
    normalizing window runs over a bounded ≤|types|-row partition of an
    already-tiny aggregate, never over the event stream.
    """
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(
            Window.partitionBy("user_id").orderBy(
                F.expr("ts div 1000"), "event_id"
            )
        )
        .alias("prev_type"),
    )
    counts = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("cnt"))
    )
    norm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "cnt",
        trunc6(F.col("cnt").cast("double") / F.sum("cnt").over(norm)).alias(
            "prob"
        ),
    )


@query(
    "incr_merge_upserts",
    oracle="""
    WITH log AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us, event_type, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts) DESC, event_id DESC)
               AS rn
      FROM events
    )
    SELECT user_id, t_us AS last_t_us, event_type AS last_type,
           value AS last_value
    FROM log WHERE rn = 1 AND op = 'U'
    """,
)
def incr_merge_upserts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply: Delta ``MERGE INTO`` last-writer-wins.

    The events stream is read as a changelog keyed by ``user_id``
    (``error`` rows are tombstones, everything else an upsert); the
    surviving state is the latest non-superseded row per key. Shape is
    the A3 per-key argmax — one shuffle on the merge key, a
    ``WindowGroupLimit``-prunable ``row_number`` — exactly how a
    MERGE's dedup-latest pre-step runs on a real lakehouse table.
    """
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("t_us"),
        "event_type",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_us").desc(), F.col("event_id").desc()
    )
    return (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            "user_id",
            F.col("t_us").alias("last_t_us"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
        )
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH su AS (
      SELECT user_id, min(epoch_us(ts)) AS su_t
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), conv AS (
      SELECT s.user_id, s.su_t, min(epoch_us(e.ts)) AS p_t
      FROM su s JOIN events e ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.su_t
      GROUP BY s.user_id, s.su_t
    ), durs AS (
      SELECT su_t // 86400000000 AS cohort_day, p_t - su_t AS dur_us
      FROM conv
    )
    SELECT cohort_day,
           count(*) AS n_converted,
           floor(median(dur_us) * 1000000.0) / 1000000.0 AS med_dur_us,
           floor(quantile_cont(dur_us, 0.9) * 1000000.0) / 1000000.0 AS p90_dur_us
    FROM durs GROUP BY cohort_day
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion latency percentiles per signup-day
    cohort.

    Plan: one grouped min builds the per-user signup time (users-sized,
    re-keyed on user_id so the purchase join reuses the exchange); the
    first-qualifying-purchase min is a second grouped agg; cohort
    percentiles run grouped by day (bounded per-group state is the
    day's converting-user count — same contract as the registry's other
    exact-percentile queries).
    """
    ev = load_table(spark, sf_dir, "events")
    t_us = F.expr("ts div 1000")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(t_us).alias("su_t"))
    )
    conv = (
        su.join(
            ev.where(F.col("event_type") == "purchase").select(
                "user_id", t_us.alias("p_raw")
            ),
            "user_id",
        )
        .where(F.col("p_raw") >= F.col("su_t"))
        .groupBy("user_id", "su_t")
        .agg(F.min("p_raw").alias("p_t"))
    )
    durs = conv.select(
        F.expr("su_t div 86400000000").alias("cohort_day"),
        (F.col("p_t") - F.col("su_t")).alias("dur_us"),
    )
    return durs.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_converted"),
        (F.floor(F.expr("percentile(dur_us, 0.5)") * F.lit(1e6)) / 1e6).alias(
            "med_dur_us"
        ),
        (F.floor(F.expr("percentile(dur_us, 0.9)") * F.lit(1e6)) / 1e6).alias(
            "p90_dur_us"
        ),
    )


@query(
    "engagement_decay_score",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS mv
      FROM events
    ), nowt AS (SELECT max(t_us) AS now_us FROM e),
    c AS (
      SELECT user_id,
             mv // (CAST(1 AS BIGINT) << CAST(least(
               (now_us - t_us) // 604800000000, 62) AS INTEGER))
               AS contrib
      FROM e CROSS JOIN nowt
    )
    SELECT user_id, count(*) AS n_events,
           CAST(sum(contrib) AS DOUBLE) / 1000.0 AS score
    FROM c GROUP BY user_id
    """,
)
def engagement_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed engagement: each event's value halves per week
    of age (bucketed exponential decay as an integer right-shift — the
    float-free form of Σ value·2^(−Δt/τ), exact under any fold order,
    where a true ``exp`` would be vulnerable to cross-engine last-ulp
    drift at the truncation boundary).

    One grouped sum; "now" is the corpus max timestamp, a 1-row
    broadcast scalar.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.expr("ts div 1000").alias("t_us"),
        F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("mv"),
    )
    nowt = e.agg(F.max("t_us").alias("now_us"))
    c = e.crossJoin(F.broadcast(nowt)).select(
        "user_id",
        F.expr(
            "mv div shiftleft(cast(1 as bigint), "
            "cast(least((now_us - t_us) div 604800000000, 62) as int))"
        ).alias("contrib"),
    )
    return c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("contrib").cast("double") / F.lit(1000.0)).alias("score"),
    )


#: Journey sessionization gap (30 min in micros).
_JOURNEY_GAP_US = 1_800_000_000


@query(
    "session_entry_exit",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us
      FROM events
    ), marked AS (
      SELECT *,
             CASE WHEN t_us - lag(t_us) OVER w > {_JOURNEY_GAP_US}
                  OR lag(t_us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
    ), sess AS (
      SELECT *,
             sum(brk) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, CAST(sid AS BIGINT) AS sid,
           min(t_us) AS start_us, max(t_us) AS end_us,
           max(t_us) - min(t_us) AS duration_us,
           count(*) AS n_events,
           min_by(event_type,
                  t_us * CAST('10000000000000000000' AS HUGEINT) + event_id)
             AS entry_type,
           max_by(event_type,
                  t_us * CAST('10000000000000000000' AS HUGEINT) + event_id)
             AS exit_type
    FROM sess
    GROUP BY user_id, sid
    """,
)
def session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream journeys: 30-minute-gap sessions with entry/exit
    event types — the path-analysis view (landing/exit pages) over the
    event stream.

    One ``user_id`` window sort assigns session ids (gap-break running
    sum); the per-session aggregate rides the same partitioning; entry
    and exit are ``min_by``/``max_by`` on the (t, event_id) order key —
    no second window, no self-join.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    marked = e.withColumn(
        "brk",
        F.when(
            F.lag("t_us").over(w).isNull()
            | (F.col("t_us") - F.lag("t_us").over(w) > _JOURNEY_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "sid",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    # composite order key (t, event_id) packed into one exact number:
    # DuckDB's min_by takes only scalar keys, so both engines use
    # t·1e19 + event_id (DECIMAL(38,0) / HUGEINT). 1e19 > 2^63, so the
    # packing is collision-free for EVERY non-negative BIGINT event_id;
    # t·1e19 ≤ ~1.7e34 stays inside both DECIMAL(38,0) and HUGEINT.
    key = F.col("t_us").cast("decimal(38,0)") * F.expr(
        "cast('10000000000000000000' as decimal(38,0))"
    ) + F.col("event_id")
    return sess.groupBy("user_id", "sid").agg(
        F.min("t_us").alias("start_us"),
        F.max("t_us").alias("end_us"),
        (F.max("t_us") - F.min("t_us")).alias("duration_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("event_type", key).alias("entry_type"),
        F.max_by("event_type", key).alias("exit_type"),
    )


#: Page width (days) for the two-level cumulative-sum pattern.
_CUM_PAGE_DAYS = 32


@query(
    "users_cumulative_distinct",
    oracle="""
    WITH fs AS (
      SELECT user_id, min(epoch_us(ts) // 86400000000) AS d0
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT d0 AS day, count(*) AS new_users FROM fs GROUP BY d0
    )
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM daily
    """,
)
def users_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth curve — WITHOUT
    a global window or a distinct-state blowup.

    Two standard at-scale tricks compose:

    1. cumulative DISTINCT decomposes exactly into "new users per
       day" (min first-seen day per user, one shuffle) + a running
       SUM — no growing distinct state;
    2. the running sum over the unbounded day axis runs TWO-LEVEL:
       an intra-page cumsum partitioned by 32-day page, plus each
       page's offset = sum of all PRIOR pages' totals, computed on
       the page-level table (days/32 rows — ~11 rows per year; the
       only partition-less work is over that table, via a bounded
       self-join, not over days). The oracle is the plain global
       window, proving the two-level plan returns identical rows.
    """
    ev = load_table(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(
        F.expr("min((ts div 1000) div 86400000000)").alias("day")
    )
    daily = fs.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    d = daily.withColumn("page", F.expr(f"day div {_CUM_PAGE_DAYS}"))
    intra_w = (
        Window.partitionBy("page")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = d.withColumn("run_in_page", F.sum("new_users").over(intra_w))
    totals = d.groupBy("page").agg(F.sum("new_users").alias("page_total"))
    a, b = totals.alias("a"), totals.alias("b")
    offsets = (
        a.join(b, F.col("b.page") < F.col("a.page"), "left")
        .groupBy(F.col("a.page").alias("page"))
        .agg(F.coalesce(F.sum("b.page_total"), F.lit(0)).alias("offset"))
    )
    return (
        intra.join(F.broadcast(offsets), "page")
        .select(
            "day",
            F.col("new_users").cast("long").alias("new_users"),
            (F.col("run_in_page") + F.col("offset")).cast("long").alias(
                "cum_users"
            ),
        )
    )


@query(
    "events_path_trigrams",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT p2 AS step1, p1 AS step2, event_type AS step3,
           count(*) AS cnt
    FROM s WHERE p2 IS NOT NULL
    GROUP BY p2, p1, event_type
    """,
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third-order path mining: counts of every 3-step event sequence
    per user stream — the n-gram generalization of the Markov
    transition matrix (common-journey discovery).

    One user_id window sort carries BOTH lags; the trigram table is
    ≤|types|³ rows out of one grouped count.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.expr("ts div 1000"), "event_id")
    s = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    return (
        s.where(F.col("p2").isNotNull())
        .groupBy(
            F.col("p2").alias("step1"),
            F.col("p1").alias("step2"),
            F.col("event_type").alias("step3"),
        )
        .agg(F.count("*").alias("cnt"))
    )


#: Multi-touch attribution channels (the credited touchpoints) and the
#: conversion event. Epochs are "since the user's previous conversion".
_ATTR_TOUCHES = ("view", "click")
_ATTR_CONV = "purchase"
_ATTR_T_SQL = ", ".join(f"'{t}'" for t in _ATTR_TOUCHES)


@query(
    "attr_multi_touch",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us,
             coalesce(sum(CASE WHEN event_type = '{_ATTR_CONV}'
                               THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS epoch
      FROM events
      WHERE event_type IN ({_ATTR_T_SQL}, '{_ATTR_CONV}')
    ), conv AS (
      SELECT user_id, epoch FROM e WHERE event_type = '{_ATTR_CONV}'
    ), tch AS (
      SELECT user_id, epoch, event_type AS channel, t_us, event_id,
             count(*) OVER (PARTITION BY user_id, epoch) AS n_in_epoch,
             row_number() OVER (PARTITION BY user_id, epoch
                                ORDER BY t_us DESC, event_id DESC) AS rd
      FROM e WHERE event_type IN ({_ATTR_T_SQL})
    ), credited AS (
      SELECT t.channel, t.n_in_epoch, t.rd
      FROM tch t JOIN conv c
        ON c.user_id = t.user_id AND c.epoch = t.epoch
    )
    SELECT channel,
           count(*) AS n_touches,
           CAST(sum(1000000 // n_in_epoch) AS BIGINT) AS linear_ppm,
           floor(CAST(sum(1000000 // n_in_epoch) AS DOUBLE) / 1000000.0
                 * 1000000.0) / 1000000.0 AS linear_credit,
           CAST(sum(CASE WHEN rd = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch_wins
    FROM credited
    GROUP BY channel
    ORDER BY channel
    """,
)
def attr_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution: each conversion credits the
    view/click touches of its epoch (the stretch since the user's
    previous conversion) — linear credit 1/n per touch, last-touch
    credit to the latest touch.

    Plan shape: ONE user_id window sort assigns epochs (running count
    of strictly-preceding conversions — an epoch therefore holds at
    most one conversion, so conversion matching is a plain semi-join
    on (user, epoch), never a range join); per-epoch size and
    last-touch rank ride the same (user, epoch) partitioning; the
    final per-channel rollup is a |channels|-row aggregate. Linear
    credits are quantized to integer ppm (1000000 div n) BEFORE the
    cross-shuffle sum — the total is an exact BIGINT under any
    partitioning, floated only for display.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.where(
        F.col("event_type").isin(*_ATTR_TOUCHES, _ATTR_CONV)
    ).select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("t_us"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = e.withColumn(
        "epoch",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == _ATTR_CONV, 1).otherwise(0)
            ).over(w_run),
            F.lit(0),
        ),
    )
    conv = e.where(F.col("event_type") == _ATTR_CONV).select(
        "user_id", "epoch"
    )
    w_epoch = Window.partitionBy("user_id", "epoch")
    w_last = Window.partitionBy("user_id", "epoch").orderBy(
        F.col("t_us").desc(), F.col("event_id").desc()
    )
    tch = (
        e.where(F.col("event_type").isin(*_ATTR_TOUCHES))
        .select(
            "user_id",
            "epoch",
            F.col("event_type").alias("channel"),
            "t_us",
            "event_id",
        )
        .withColumn("n_in_epoch", F.count(F.lit(1)).over(w_epoch))
        .withColumn("rd", F.row_number().over(w_last))
    )
    credited = tch.join(conv, ["user_id", "epoch"], "semi")
    ppm = F.expr("1000000 div n_in_epoch")
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(ppm).alias("linear_ppm"),
            trunc6(
                F.sum(ppm).cast("double") / F.lit(1000000.0)
            ).alias("linear_credit"),
            F.sum(F.when(F.col("rd") == 1, 1).otherwise(0))
            .cast("long")
            .alias("last_touch_wins"),
        )
        .orderBy("channel")
    )


#: OHLC bar width in microseconds (1 hour).
_BAR_US = 3_600_000_000


@query(
    "ts_ohlc_bars",
    oracle=f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS t_us, event_id,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS mv
      FROM events
    ), r AS (
      SELECT event_type, t_us // {_BAR_US} AS bar, mv,
             row_number() OVER (PARTITION BY event_type, t_us // {_BAR_US}
                                ORDER BY t_us, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type, t_us // {_BAR_US})
               AS cnt
      FROM e
    )
    SELECT event_type, bar,
           count(*) AS n_events,
           floor(CAST(max(CASE WHEN rn = 1 THEN mv END) AS DOUBLE)
                 / 1000.0 * 1000000.0) / 1000000.0 AS open,
           floor(CAST(max(mv) AS DOUBLE) / 1000.0 * 1000000.0)
             / 1000000.0 AS high,
           floor(CAST(min(mv) AS DOUBLE) / 1000.0 * 1000000.0)
             / 1000000.0 AS low,
           floor(CAST(max(CASE WHEN rn = cnt THEN mv END) AS DOUBLE)
                 / 1000.0 * 1000000.0) / 1000000.0 AS close,
           CAST(sum(mv) AS BIGINT) AS sum_mv
    FROM r
    GROUP BY event_type, bar
    ORDER BY event_type, bar
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time bars — the hypertable/financial rollup primitive: per
    (event_type, hour) the opening, highest, lowest and closing value
    plus count and exact integer sum.

    Plan shape: ONE (type, bar) window sort yields both endpoints
    (rn = 1 opens, rn = cnt closes — the descending twin rides the
    same sort via the partition count), then one grouped aggregate on
    the identical keys — Spark plans window + groupBy on one exchange.
    Values are quantized to integer milli-units at the boundary; every
    extreme/sum crosses the shuffle as BIGINT; the /1000.0 display
    floats are single IEEE ops under trunc6 — bit-equal on any engine.
    Open/close tie-break on (t_us, event_id): deterministic even with
    duplicate timestamps.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.expr("ts div 1000").alias("t_us"),
        "event_id",
        F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("mv"),
    ).withColumn("bar", F.expr(f"t_us div {_BAR_US}"))
    w = Window.partitionBy("event_type", "bar").orderBy("t_us", "event_id")
    w_all = Window.partitionBy("event_type", "bar")
    r = e.select(
        "event_type",
        "bar",
        "mv",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    )
    milli = lambda c: trunc6(c.cast("double") / F.lit(1000.0))  # noqa: E731
    return (
        r.groupBy("event_type", "bar")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            milli(F.max(F.when(F.col("rn") == 1, F.col("mv")))).alias(
                "open"
            ),
            milli(F.max("mv")).alias("high"),
            milli(F.min("mv")).alias("low"),
            milli(
                F.max(F.when(F.col("rn") == F.col("cnt"), F.col("mv")))
            ).alias("close"),
            F.sum("mv").alias("sum_mv"),
        )
        .orderBy("event_type", "bar")
    )


# ---------------------------------------------------------------------------
# Sequential recurrences: EWMA smoothing and CUSUM change detection
# ---------------------------------------------------------------------------

#: CUSUM constants in milli-units of ``events.value`` (mean ≈ 49 630):
#: target ≈ the global mean, slack k = half a sigma, decision band h.
_CUSUM_TARGET = 50_000
_CUSUM_SLACK = 25_000
_CUSUM_H = 200_000

_EVENTS_MV_SQL = """
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS mv,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
"""


@query(
    "ts_ewma_smooth",
    oracle=f"""
    WITH RECURSIVE numbered AS ({_EVENTS_MV_SQL}
    ), walk AS (
      SELECT user_id, rn, event_id, t_us, CAST(mv AS DOUBLE) AS y
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.rn, n.event_id, n.t_us,
             0.75 * w.y + 0.25 * CAST(n.mv AS DOUBLE)
      FROM walk w JOIN numbered n
        ON n.user_id = w.user_id AND n.rn = w.rn + 1
    )
    SELECT user_id, event_id, t_us,
           floor((y / 1000.0) * 1000000.0) / 1000000.0 AS ewma
    FROM walk
    """,
)
def ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α = 1/4) of the event value — the smoothing
    primitive behind drift monitors and adaptive baselines.

    A running EWMA is a non-associative scan (no window frame computes
    it), so it runs as the engine's sequential-kernel shape
    (operators/recurrence.py ewma_smooth): one hash shuffle on
    user_id, partition-local sort, one mapInPandas walk. Float parity
    is exact, not approximate: α dyadic, input integers, identical op
    order in the kernel and the oracle's recursive CTE (module
    docstring spells out the IEEE argument).
    """
    from speech_data_pipeline_spark.operators.recurrence import ewma_smooth

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("t_us"),
        F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("mv"),
    )
    out = ewma_smooth(base, "user_id", ["t_us", "event_id"], "mv")
    return out.select(
        "user_id",
        "event_id",
        "t_us",
        trunc6(F.col("ewma") / F.lit(1000.0)).alias("ewma"),
    )


@query(
    "ts_cusum_alarms",
    oracle=f"""
    WITH RECURSIVE numbered AS ({_EVENTS_MV_SQL}
    ), walk AS (
      SELECT user_id, rn, event_id, t_us,
             greatest(CAST(0 AS BIGINT),
                      mv - {_CUSUM_TARGET} - {_CUSUM_SLACK}) AS s_raw,
             greatest(CAST(0 AS BIGINT),
                      {_CUSUM_TARGET} - mv - {_CUSUM_SLACK}) AS t_raw
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.rn, n.event_id, n.t_us,
             greatest(CAST(0 AS BIGINT),
                      (CASE WHEN w.s_raw > {_CUSUM_H} THEN 0
                            ELSE w.s_raw END)
                      + n.mv - {_CUSUM_TARGET} - {_CUSUM_SLACK}),
             greatest(CAST(0 AS BIGINT),
                      (CASE WHEN w.t_raw > {_CUSUM_H} THEN 0
                            ELSE w.t_raw END)
                      + {_CUSUM_TARGET} - n.mv - {_CUSUM_SLACK})
      FROM walk w JOIN numbered n
        ON n.user_id = w.user_id AND n.rn = w.rn + 1
    )
    SELECT user_id, event_id, t_us, 'high' AS side, s_raw AS stat,
           row_number() OVER (PARTITION BY user_id ORDER BY rn)
             AS alarm_no
    FROM walk WHERE s_raw > {_CUSUM_H}
    UNION ALL
    SELECT user_id, event_id, t_us, 'low' AS side, t_raw AS stat,
           row_number() OVER (PARTITION BY user_id ORDER BY rn)
             AS alarm_no
    FROM walk WHERE t_raw > {_CUSUM_H}
    """,
)
def ts_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided tabular CUSUM over per-user event values: alarms when
    the clamped cumulative drift from target exceeds the decision band,
    then restarts — mean-shift detection that a rolling z-score
    (ts_anomaly_zscore) structurally misses (small persistent shifts
    never clear a point-wise z threshold; they accumulate here).

    The clamp-at-zero + alarm-reset recursion is state-machine shaped
    → sequential kernel (operators/recurrence.py cusum_alarms), all
    BIGINT state so parity is exact arithmetic, not float luck. The
    oracle replays the recursion one event per step, carrying both
    sides' post-reset state through the recursive CTE.
    """
    from speech_data_pipeline_spark.operators.recurrence import cusum_alarms

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("t_us"),
        F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("mv"),
    )
    return cusum_alarms(
        base,
        "user_id",
        ["t_us", "event_id"],
        "mv",
        target=_CUSUM_TARGET,
        slack=_CUSUM_SLACK,
        threshold=_CUSUM_H,
    ).select("user_id", "event_id", "t_us", "side", "stat", "alarm_no")


@query(
    "ts_holt_linear",
    oracle=f"""
    WITH RECURSIVE numbered AS ({_EVENTS_MV_SQL}
    ), walk AS (
      SELECT user_id, rn, event_id, t_us,
             CAST(mv AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.rn, n.event_id, n.t_us,
             0.25 * CAST(n.mv AS DOUBLE) + 0.75 * (w.l + w.b),
             0.125 * ((0.25 * CAST(n.mv AS DOUBLE)
                       + 0.75 * (w.l + w.b)) - w.l)
               + 0.875 * w.b
      FROM walk w JOIN numbered n
        ON n.user_id = w.user_id AND n.rn = w.rn + 1
    )
    SELECT user_id, event_id, t_us,
           floor((l / 1000.0) * 1000000.0) / 1000000.0 AS level,
           floor((b / 1000.0) * 1000000.0) / 1000000.0 AS trend,
           floor(((l + b) / 1000.0) * 1000000.0) / 1000000.0 AS fc
    FROM walk
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt double exponential smoothing (level + trend,
    α=1/4, β=1/8) with the one-step-ahead forecast — the trend-aware
    upgrade of ts_ewma_smooth, same sequential-kernel shape
    (operators/recurrence.py holt_linear) and the same bit-exact
    dyadic-constant parity argument; the oracle's recursive CTE
    replays the identical two-op-per-step tree (the trend step
    recomputes the new level expression — same doubles, deterministic).
    """
    from speech_data_pipeline_spark.operators.recurrence import holt_linear

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("t_us"),
        F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("mv"),
    )
    out = holt_linear(base, "user_id", ["t_us", "event_id"], "mv")
    k = F.lit(1000.0)
    return out.select(
        "user_id",
        "event_id",
        "t_us",
        trunc6(F.col("level") / k).alias("level"),
        trunc6(F.col("trend") / k).alias("trend"),
        trunc6(F.col("fc") / k).alias("fc"),
    )


#: Seasonal profile: hourly buckets, 24-phase day cycle.
_SEAS_BUCKET_US = 3_600_000_000
_SEAS_PHASES = 24


@query(
    "ts_seasonal_profile",
    oracle=f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) // {_SEAS_BUCKET_US} AS bucket,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS mv
      FROM events
    ), hb AS (
      SELECT event_type, bucket, bucket % {_SEAS_PHASES} AS phase,
             sum(mv) AS tot
      FROM e GROUP BY event_type, bucket
    ), ph AS (
      SELECT event_type, phase, count(*) AS n_buckets,
             sum(tot) AS s
      FROM hb GROUP BY event_type, phase
    ), ty AS (
      SELECT event_type, sum(n_buckets) AS n_all, sum(s) AS s_all
      FROM ph GROUP BY event_type
    )
    SELECT ph.event_type, CAST(ph.phase AS BIGINT) AS phase,
           CAST(ph.n_buckets AS BIGINT) AS n_buckets,
           CAST(ph.s // ph.n_buckets AS BIGINT) AS mean_milli,
           floor((CAST(ph.s AS DOUBLE) / CAST(ph.n_buckets AS DOUBLE)
                  - CAST(ty.s_all AS DOUBLE) / CAST(ty.n_all AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS seasonal_milli
    FROM ph JOIN ty USING (event_type)
    """,
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal decomposition of the event stream: per
    (type, phase∈0..23) the mean hourly total and its deviation from
    the type's all-hours mean — the additive-seasonality profile an
    anomaly detector subtracts before thresholding (STL-lite: the
    seasonal component without the loess machinery).

    Plan shape: TWO map-side-combinable grouped integer sums (corpus →
    hourly buckets → 24-phase cells); the per-type baseline is a
    grouped rollup of the bounded cell table joined back (|types| rows
    broadcast). Means leave integers only at the final two divides.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.expr(f"(ts div 1000) div {_SEAS_BUCKET_US}").alias("bucket"),
        F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("mv"),
    )
    hb = e.groupBy("event_type", "bucket").agg(F.sum("mv").alias("tot"))
    ph = hb.withColumn("phase", F.col("bucket") % _SEAS_PHASES).groupBy(
        "event_type", "phase"
    ).agg(F.count(F.lit(1)).alias("n_buckets"), F.sum("tot").alias("s"))
    ty = ph.groupBy("event_type").agg(
        F.sum("n_buckets").alias("n_all"), F.sum("s").alias("s_all")
    )
    j = ph.join(F.broadcast(ty), "event_type")
    seasonal = (
        F.col("s").cast("double") / F.col("n_buckets").cast("double")
        - F.col("s_all").cast("double") / F.col("n_all").cast("double")
    )
    return j.select(
        "event_type",
        F.col("phase").cast("long").alias("phase"),
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.expr("s div n_buckets").alias("mean_milli"),
        trunc6(seasonal).alias("seasonal_milli"),
    )


@query(
    "survival_kaplan_meier",
    oracle="""
    WITH t AS (
      SELECT user_id, min(epoch_us(ts)) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts)
                      END) AS p_t
      FROM events GROUP BY user_id
    ), mx AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
    durs AS (
      SELECT CASE WHEN p_t IS NOT NULL
                  THEN (p_t - t0) // 86400000000
                  ELSE (tmax - t0) // 86400000000 END AS dur_days,
             CASE WHEN p_t IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM t CROSS JOIN mx
    ), byday AS (
      SELECT dur_days, CAST(sum(ev) AS BIGINT) AS n_event,
             CAST(sum(1 - ev) AS BIGINT) AS n_cens
      FROM durs GROUP BY dur_days
    ), risk AS (
      SELECT dur_days, n_event, n_cens,
             sum(n_event + n_cens) OVER () AS n_total,
             coalesce(sum(n_event + n_cens) OVER (ORDER BY dur_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_prev
      FROM byday
    ), terms AS (
      SELECT dur_days, n_event, n_cens,
             n_total - cum_prev AS at_risk,
             CASE WHEN n_event = 0 THEN 0
                  WHEN n_event >= n_total - cum_prev
                    THEN -100000000000
                  ELSE CAST(floor(ln(
                         CAST(n_total - cum_prev - n_event AS DOUBLE)
                         / CAST(n_total - cum_prev AS DOUBLE)) * 1e9)
                       AS BIGINT) END AS lnq
      FROM risk
    )
    SELECT dur_days, n_event, n_cens,
           CAST(at_risk AS BIGINT) AS at_risk,
           floor(exp(CAST(sum(lnq) OVER (ORDER BY dur_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / 1e9) * 1000000.0) / 1000000.0 AS survival
    FROM terms
    QUALIFY n_event > 0
    ORDER BY dur_days
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-purchase, right-
    censored at the corpus horizon (max event time): ``S(d) =
    Π_{d'≤d} (1 − e_{d'} / r_{d'})`` over whole-day durations.

    Exactness: the per-day hazard factors multiply as a RUNNING SUM of
    nano-nat INTEGER log terms (each ln quantized by floor to 1e-9
    before the cumulative sum), so the cross-row accumulation is exact
    integer arithmetic in any engine / any window implementation
    (DuckDB's segment-tree float sums would otherwise reorder adds);
    the only float ops are one ln and one exp per OUTPUT row. A day
    that exhausts the risk set gets the −100 ln sentinel (exp → 0
    below the 1e-6 output grid).

    Plan shape: one per-user grouped min pair collapses the corpus to
    users; the horizon is a 1-row broadcast scalar (whitelisted); the
    KM table itself is bounded by the OBSERVATION-WINDOW DAY COUNT,
    not the corpus, so its running sums are whitelisted partition-less
    windows over a tiny relation.
    """
    ev = load_table(spark, sf_dir, "events")
    t_us = F.expr("ts div 1000")
    per_user = ev.groupBy("user_id").agg(
        F.min(t_us).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", t_us)
        ).alias("p_t"),
    )
    mx = ev.agg(F.max(t_us).alias("tmax"))
    durs = per_user.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("p_t").isNotNull(),
            F.expr("(p_t - t0) div 86400000000"),
        )
        .otherwise(F.expr("(tmax - t0) div 86400000000"))
        .alias("dur_days"),
        F.when(F.col("p_t").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    byday = durs.groupBy("dur_days").agg(
        F.sum("ev").cast("long").alias("n_event"),
        F.sum(F.lit(1) - F.col("ev")).cast("long").alias("n_cens"),
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = byday.select(
        "dur_days",
        "n_event",
        "n_cens",
        (
            F.sum(F.col("n_event") + F.col("n_cens")).over(w_all)
            - F.coalesce(
                F.sum(F.col("n_event") + F.col("n_cens")).over(w_prev),
                F.lit(0),
            )
        ).alias("at_risk"),
    )
    lnq = (
        F.when(F.col("n_event") == 0, F.lit(0).cast("long"))
        .when(
            F.col("n_event") >= F.col("at_risk"),
            F.lit(-100000000000).cast("long"),
        )
        .otherwise(
            F.floor(
                F.log(
                    (F.col("at_risk") - F.col("n_event")).cast("double")
                    / F.col("at_risk").cast("double")
                )
                * F.lit(1e9)
            ).cast("long")
        )
    )
    w_run = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = risk.withColumn("lnq", lnq).select(
        "dur_days",
        "n_event",
        "n_cens",
        F.col("at_risk").cast("long").alias("at_risk"),
        trunc6(
            F.exp(F.sum("lnq").over(w_run).cast("double") / F.lit(1e9))
        ).alias("survival"),
    )
    return out.where(F.col("n_event") > 0)


#: ACF lags reported by ts_acf_lags.
_ACF_LAGS = (1, 2, 3, 4, 5)


def _acf_oracle() -> str:
    """DuckDB replay of the dense-grid integer-moment ACF."""
    leads = ", ".join(
        f"lead(x, {k}) OVER (PARTITION BY event_type ORDER BY day) AS l{k}"
        for k in _ACF_LAGS
    )
    moments = ", ".join(
        f"sum(CAST(x AS HUGEINT) * l{k}) AS p{k}, "
        f"CAST(sum(CASE WHEN l{k} IS NOT NULL THEN x END) AS HUGEINT)"
        f" AS a{k}, "
        f"CAST(sum(l{k}) AS HUGEINT) AS b{k}"
        for k in _ACF_LAGS
    )
    arms = " UNION ALL ".join(
        f"SELECT event_type, {k} AS lag, CAST(n AS BIGINT) AS n,"
        f" floor(CAST(n*n*p{k} - n*s1*(a{k}+b{k}) + (n-{k})*s1*s1"
        f" AS DOUBLE) / CAST(n*n*s2 - n*s1*s1 AS DOUBLE)"
        f" * 1000000.0) / 1000000.0 AS acf"
        f" FROM m WHERE n > {k} AND n*s2 > s1*s1"
        for k in _ACF_LAGS
    )
    return f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS sx
      FROM events GROUP BY event_type, day
    ), span AS (
      SELECT event_type, min(day) AS mn, max(day) AS mx
      FROM daily GROUP BY event_type
    ), grid AS (
      SELECT event_type, unnest(range(mn, mx + 1)) AS day FROM span
    ), series AS (
      SELECT g.event_type, g.day, coalesce(d.sx, 0) AS x
      FROM grid g LEFT JOIN daily d
        ON d.event_type = g.event_type AND d.day = g.day
    ), led AS (
      SELECT event_type, x, {leads} FROM series
    ), m AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s1,
             sum(CAST(x AS HUGEINT) * x) AS s2,
             {moments}
      FROM led GROUP BY event_type
    )
    {arms}
    """


@query("ts_acf_lags", oracle=_acf_oracle())
def ts_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of each event type's DAILY value series
    at lags 1–5, on a dense zero-filled day grid: ``r_k =
    Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²`` cleared to pure
    integers — ``(n²P_k − nS₁(A_k+B_k) + (n−k)S₁²) / (n²S₂ − nS₁²)``
    over milli-quantized sums, one float divide per output row.

    Plan shape: one grouped daily sum collapses the corpus to
    |types|·|days| cells; the dense grid is a per-type sequence explode
    (observation-window bounded); the lag products are lead() windows
    PARTITIONED by type (never global); the moment sums ride
    DECIMAL(38,0) (n²·S₂ of milli daily sums stays under 10³⁸ through
    ~petabyte-scale daily aggregates — noted here as the contract).
    """
    ev = load_table(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    daily = ev.groupBy(
        "event_type", F.expr("(ts div 1000) div 86400000000").alias("day")
    ).agg(F.sum(mv).alias("sx"))
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("day"),
    )
    series = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce(F.col("sx"), F.lit(0)).alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    led = series.select(
        "event_type",
        "x",
        *[F.lead("x", k).over(w).alias(f"l{k}") for k in _ACF_LAGS],
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aggs = [
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("x"))).alias("s1"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("s2"),
    ]
    for k in _ACF_LAGS:
        aggs += [
            F.sum(dec(F.col("x")) * dec(F.col(f"l{k}"))).alias(f"p{k}"),
            F.sum(
                F.when(F.col(f"l{k}").isNotNull(), dec(F.col("x")))
            ).alias(f"a{k}"),
            F.sum(dec(F.col(f"l{k}"))).alias(f"b{k}"),
        ]
    m = led.groupBy("event_type").agg(*aggs)
    arms = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.col(f"p{k}").alias("p"),
                F.col(f"a{k}").alias("a"),
                F.col(f"b{k}").alias("b"),
            )
            for k in _ACF_LAGS
        ]
    )
    rows = m.select(
        "event_type", "n", "s1", "s2", F.explode(arms).alias("t")
    ).where(
        (F.col("n") > F.col("t.lag").cast("decimal(38,0)"))
        & (F.col("n") * F.col("s2") > F.col("s1") * F.col("s1"))
    )
    num = (
        F.col("n") * F.col("n") * F.col("t.p")
        - F.col("n") * F.col("s1") * (F.col("t.a") + F.col("t.b"))
        + (F.col("n") - F.col("t.lag")) * F.col("s1") * F.col("s1")
    ).cast("double")
    den = (
        F.col("n") * F.col("n") * F.col("s2")
        - F.col("n") * F.col("s1") * F.col("s1")
    ).cast("double")
    return rows.select(
        "event_type",
        F.col("t.lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n"),
        trunc6(num / den).alias("acf"),
    )


# ---------------------------------------------------------------------------
# AR(1) forecast of daily purchase revenue
# ---------------------------------------------------------------------------

_AR1_H = 7  # forecast horizon, days


def _phi_pow_sql(h: int) -> str:
    """phi^h as an explicit left-assoc multiplication chain (both
    engines fold identically; pow() ulp behavior differs JVM vs C)."""
    return " * ".join(["phi"] * h)


def _ar1_oracle() -> str:
    arms = " UNION ALL ".join(
        f"SELECT {h} AS h, n_days, floor(phi * 1000000.0) / 1000000.0"
        f" AS phi,"
        f" floor((mean + ({_phi_pow_sql(h)}) * (xlast - mean)) / 1000.0"
        f" * 1000000.0) / 1000000.0 AS forecast"
        f" FROM ph"
        for h in range(1, _AR1_H + 1)
    )
    return f"""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS sx
      FROM events WHERE event_type = 'purchase' GROUP BY day
    ), span AS (
      SELECT min(day) AS mn, max(day) AS mx FROM daily
    ), series AS (
      SELECT g.day, coalesce(d.sx, 0) AS x
      FROM (SELECT unnest(range(mn, mx + 1)) AS day FROM span) g
      LEFT JOIN daily d ON d.day = g.day
    ), led AS (
      SELECT day, x, lead(x) OVER (ORDER BY day) AS l1 FROM series
    ), m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s1,
             sum(CAST(x AS HUGEINT) * x) AS s2,
             sum(CAST(x AS HUGEINT) * l1) AS p1,
             CAST(sum(CASE WHEN l1 IS NOT NULL THEN x END) AS HUGEINT)
               AS a1,
             CAST(sum(l1) AS HUGEINT) AS b1,
             max_by(x, day) AS xl
      FROM led
    ), ph AS (
      SELECT CAST(n AS BIGINT) AS n_days,
             CAST(n*n*p1 - n*s1*(a1+b1) + (n-1)*s1*s1 AS DOUBLE)
               / CAST(n*n*s2 - n*s1*s1 AS DOUBLE) AS phi,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CAST(xl AS DOUBLE) AS xlast
      FROM m WHERE n > 1 AND n*s2 > s1*s1
    )
    {arms}
    """


@query("ts_ar1_forecast", oracle=_ar1_oracle())
def ts_ar1_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) h-step forecast of daily purchase revenue by the
    Yule–Walker fit: ``φ = r₁`` (lag-1 autocorrelation), then
    ``x̂_{T+h} = x̄ + φʰ(x_T − x̄)`` for h = 1..7 — the geometric
    mean-reversion path a capacity planner projects.

    Parity: φ is the :func:`ts_acf_lags` exact-integer ratio (one
    float divide from DECIMAL(38,0) moments); φʰ is an EXPLICIT
    left-assoc multiplication chain — both engines fold identically,
    where ``pow()`` ulp behavior differs between the JVM and C.

    Plan shape: one grouped daily sum collapses the corpus to the
    observation-window day grid; one lead() window PARTITION-FREE but
    over that bounded grid (whitelisted); one 1-row moment aggregate;
    7 literal forecast arms off the broadcast scalar.
    """
    ev = load_table(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.expr("(ts div 1000) div 86400000000").alias("day"))
        .agg(F.sum(mv).alias("sx"))
    )
    span = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    grid = span.select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("day")
    )
    series = grid.join(daily, ["day"], "left").select(
        "day", F.coalesce(F.col("sx"), F.lit(0)).alias("x")
    )
    w = Window.orderBy("day")
    led = series.select(
        "day", "x", F.lead("x").over(w).alias("l1")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = led.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("x"))).alias("s1"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("s2"),
        F.sum(dec(F.col("x")) * dec(F.col("l1"))).alias("p1"),
        F.sum(F.when(F.col("l1").isNotNull(), dec(F.col("x")))).alias("a1"),
        F.sum(dec(F.col("l1"))).alias("b1"),
        F.max(F.struct("day", "x")).getField("x").alias("xl"),
    )
    num = (
        F.col("n") * F.col("n") * F.col("p1")
        - F.col("n") * F.col("s1") * (F.col("a1") + F.col("b1"))
        + (F.col("n") - 1) * F.col("s1") * F.col("s1")
    ).cast("double")
    den = (
        F.col("n") * F.col("n") * F.col("s2")
        - F.col("n") * F.col("s1") * F.col("s1")
    ).cast("double")
    ph = m.where(
        (F.col("n") > 1)
        & (F.col("n") * F.col("s2") > F.col("s1") * F.col("s1"))
    ).select(
        F.col("n").cast("long").alias("n_days"),
        (num / den).alias("phi"),
        (F.col("s1").cast("double") / F.col("n").cast("double")).alias(
            "mean"
        ),
        F.col("xl").cast("double").alias("xlast"),
    )
    arms = []
    for h in range(1, _AR1_H + 1):
        phih = F.col("phi")
        for _ in range(h - 1):
            phih = phih * F.col("phi")
        arms.append(
            F.struct(
                F.lit(h).alias("h"),
                (
                    (
                        F.col("mean")
                        + phih * (F.col("xlast") - F.col("mean"))
                    )
                    / F.lit(1000.0)
                ).alias("fc"),
            )
        )
    return ph.select(
        "n_days", "phi", F.explode(F.array(*arms)).alias("t")
    ).select(
        F.col("t.h").alias("h"),
        "n_days",
        trunc6(F.col("phi")).alias("phi"),
        trunc6(F.col("t.fc")).alias("forecast"),
    )


# ---------------------------------------------------------------------------
# Two-state burst detection (Viterbi DP)
# ---------------------------------------------------------------------------


def _burst_oracle() -> str:
    return """
    WITH RECURSIVE daily AS (
      SELECT event_type AS k, epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY event_type, day
    ), span AS (
      SELECT k, min(day) AS mn, max(day) AS mx FROM daily GROUP BY k
    ), grid AS (
      SELECT s.k, unnest(range(mn, mx + 1)) AS day FROM span s
    ), ser0 AS (
      SELECT g.k, g.day, coalesce(d.x, 0) AS x
      FROM grid g LEFT JOIN daily d ON d.k = g.k AND d.day = g.day
    ), cdf AS (
      SELECT k, x AS v, count(*) AS c FROM ser0 GROUP BY k, x
    ), run AS (
      SELECT k, v,
             sum(c) OVER (PARTITION BY k ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(c) OVER (PARTITION BY k) AS n
      FROM cdf
    ), lv AS (
      SELECT k,
             min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS lo,
             min(CASE WHEN 4 * cum >= 3 * n THEN v END) AS hi_raw
      FROM run GROUP BY k
    ), levels AS (
      SELECT k, lo, greatest(hi_raw, lo + 1) AS hi,
             greatest(hi_raw, lo + 1) - lo AS gamma
      FROM lv
    ), series AS (
      SELECT s.k, s.day, s.x, l.lo, l.hi, l.gamma,
             row_number() OVER (PARTITION BY s.k ORDER BY s.day) AS t
      FROM ser0 s JOIN levels l ON l.k = s.k
    ), dp AS (
      SELECT k, t, day,
             abs(x - lo) AS c0,
             abs(x - hi) + gamma AS c1,
             [0] AS f0s, [1] AS f1s
      FROM series WHERE t = 1
      UNION ALL
      SELECT s.k, s.t, s.day,
             abs(s.x - s.lo)
               + CASE WHEN dp.c1 + s.gamma < dp.c0
                      THEN dp.c1 + s.gamma ELSE dp.c0 END,
             abs(s.x - s.hi)
               + CASE WHEN dp.c0 + s.gamma < dp.c1
                      THEN dp.c0 + s.gamma ELSE dp.c1 END,
             list_append(dp.f0s,
               CASE WHEN dp.c1 + s.gamma < dp.c0 THEN 1 ELSE 0 END),
             list_append(dp.f1s,
               CASE WHEN dp.c0 + s.gamma < dp.c1 THEN 0 ELSE 1 END)
      FROM dp JOIN series s ON s.k = dp.k AND s.t = dp.t + 1
    ), fin AS (
      SELECT dp.k, dp.t, dp.c0, dp.c1, dp.f0s, dp.f1s
      FROM dp JOIN (SELECT k, max(t) AS T FROM series GROUP BY k) m
        ON m.k = dp.k AND dp.t = m.T
    ), bt AS (
      SELECT k, t, CASE WHEN c0 <= c1 THEN 0 ELSE 1 END AS s, f0s, f1s
      FROM fin
      UNION ALL
      SELECT k, t - 1,
             CASE WHEN s = 0 THEN f0s[t] ELSE f1s[t] END, f0s, f1s
      FROM bt WHERE t > 1
    ), st1 AS (
      SELECT se.k, se.day, se.x,
             se.day - row_number() OVER (PARTITION BY se.k
                                         ORDER BY se.day) AS grp
      FROM series se JOIN bt ON bt.k = se.k AND bt.t = se.t
      WHERE bt.s = 1
    )
    SELECT k AS event_type, min(day) AS start_day, max(day) AS end_day,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(x) AS BIGINT) AS peak,
           CAST(sum(x) AS BIGINT) AS total
    FROM st1 GROUP BY k, grp
    """


@query("ts_burst_intervals", oracle=_burst_oracle())
def ts_burst_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst intervals of each event type's DAILY count series by an
    exact two-state Viterbi DP (Kleinberg's burst automaton with L1
    emissions): state 0 tracks the per-type lower-median level, state
    1 the p75 level, switching costs γ = hi − lo — so isolated
    spikes don't open a burst but sustained elevation does. The DP is
    ALL INTEGER, hence engine-exact; the DuckDB oracle replays
    forward costs AND the backtrack as recursive CTEs.

    Plan shape: the corpus collapses to the per-type day grid (one
    grouped count); level selection is the MAD-style per-type CDF
    (PARTITIONED windows); the DP runs in the sessions.py kernel
    contract (operators/recurrence.py:viterbi_burst) — per-key series
    bounded by the observation window, never corpus rows; burst
    islands aggregate with the dense-day gaps-islands trick.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("k"),
        F.expr("(ts div 1000) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).alias("x"))
    span = daily.groupBy("k").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    grid = span.select(
        "k", F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("day")
    )
    ser0 = grid.join(daily, ["k", "day"], "left").select(
        "k", "day", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )
    cdf = ser0.groupBy("k", F.col("x").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_run = (
        Window.partitionBy("k")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("k")
    run = cdf.select(
        "k",
        "v",
        F.sum("c").over(w_run).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    lv = run.groupBy("k").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("v"))
        ).alias("lo"),
        F.min(
            F.when(4 * F.col("cum") >= 3 * F.col("n"), F.col("v"))
        ).alias("hi_raw"),
    )
    levels = lv.select(
        "k",
        "lo",
        F.greatest(F.col("hi_raw"), F.col("lo") + 1).alias("hi"),
        (
            F.greatest(F.col("hi_raw"), F.col("lo") + 1) - F.col("lo")
        ).alias("gamma"),
    )
    series = ser0.join(levels, "k")
    from speech_data_pipeline_spark.operators.recurrence import (
        viterbi_burst,
    )

    st = viterbi_burst(series, "k", "day", "x", "lo", "hi", "gamma")
    w_isl = Window.partitionBy("k").orderBy("day")
    st1 = st.where(F.col("state") == 1).select(
        "k",
        "day",
        "x",
        (F.col("day") - F.row_number().over(w_isl)).alias("grp"),
    )
    return st1.groupBy(F.col("k").alias("event_type"), "grp").agg(
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("x").cast("long").alias("peak"),
        F.sum("x").cast("long").alias("total"),
    ).drop("grp")


# ---------------------------------------------------------------------------
# Markov-chain attribution (removal effects)
# ---------------------------------------------------------------------------

#: Channel states (non-absorbing, fixed domain). purchase maps to the
#: absorbing CONV state; journeys without a purchase absorb at NULL.
_MKV_CHANNELS = ("click", "error", "signup", "view")
_MKV_STATES = ("START",) + _MKV_CHANNELS  # transient states, index order
_MKV_ITERS = 40


def _mkv_transitions_sql() -> str:
    """DuckDB CTE building journey transition counts (src, dst, c):
    per user ordered by (ts, event_id) up to and including the FIRST
    purchase; START precedes the first event; non-converting journeys
    end at NULL; purchase maps to CONV."""
    return """
    ev AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), fp AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'purchase' THEN rn END) AS fp_rn,
             max(rn) AS last_rn
      FROM ev GROUP BY user_id
    ), kept AS (
      SELECT e.user_id, e.rn,
             CASE WHEN e.event_type = 'purchase' THEN 'CONV'
                  ELSE e.event_type END AS st,
             coalesce(f.fp_rn, f.last_rn) AS end_rn
      FROM ev e JOIN fp f ON f.user_id = e.user_id
      WHERE e.rn <= coalesce(f.fp_rn, f.last_rn)
    ), hops AS (
      SELECT user_id, rn, st,
             lead(st) OVER (PARTITION BY user_id ORDER BY rn) AS nxt,
             rn = end_rn AS is_last
      FROM kept
    ), trans AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT 'START' AS src, st AS dst FROM kept WHERE rn = 1
        UNION ALL
        SELECT st AS src, nxt AS dst FROM hops WHERE nxt IS NOT NULL
        UNION ALL
        SELECT st AS src, 'NULL' AS dst FROM hops
        WHERE is_last AND st <> 'CONV'
      ) GROUP BY src, dst
    )"""


def _mkv_oracle() -> str:
    n = len(_MKV_STATES)
    scen_parts = []
    outs = []
    for si, removed in enumerate([None, *_MKV_CHANNELS]):
        tag = f"s{si}"
        # transition probabilities with `removed` blocked: hops INTO
        # the removed channel become losses (dst -> 'NULL')
        dst_expr = (
            "dst"
            if removed is None
            else f"CASE WHEN dst = '{removed}' THEN 'NULL' ELSE dst END"
        )
        # per transient state i: ordered list over [states..., CONV]
        # of p(i -> j); fold per iteration in fixed index order
        plists = []
        for st in _MKV_STATES:
            entries = ", ".join(
                f"coalesce(max(CASE WHEN src = '{st}' AND dst2 = '{dst}'"
                f" THEN p END), 0.0)"
                for dst in [*_MKV_STATES, "CONV"]
            )
            plists.append(f"[{entries}]")
        scen_parts.append(f"""
    p{tag} AS MATERIALIZED (
      SELECT src, dst2, CAST(sum(c) AS DOUBLE)
               / CAST(sum(sum(c)) OVER (PARTITION BY src) AS DOUBLE) AS p
      FROM (SELECT src, {dst_expr} AS dst2, c FROM trans)
      GROUP BY src, dst2
    ),
    m{tag} AS MATERIALIZED (
      SELECT {", ".join(f"{pl} AS r{i}" for i, pl in enumerate(plists))}
      FROM p{tag}
    ),
    it{tag} AS (
      SELECT 0 AS k,
             {", ".join(f"CAST(0.0 AS DOUBLE) AS v{i}" for i in range(n))}
      UNION ALL
      SELECT k + 1,
             {", ".join(
                 "list_sum(list_transform(range(1, %d + 1), "
                 "j -> m.r%d[j] * ([%s, 1.0])[j]))" % (
                     n + 1, i,
                     ", ".join(f"it.v{q}" for q in range(n)))
                 for i in range(n))}
      FROM it{tag} AS it, m{tag} AS m WHERE k < {_MKV_ITERS}
    ),
    f{tag} AS (SELECT v0 AS pconv FROM it{tag} WHERE k = {_MKV_ITERS})""")
        if removed is not None:
            outs.append(
                f"SELECT '{removed}' AS channel,"
                f" CASE WHEN fs0.pconv = 0.0 THEN 0.0 ELSE"
                f" floor((1.0 - fs{si}.pconv / fs0.pconv) * 1000000.0)"
                f" / 1000000.0 END AS removal_effect,"
                f" floor(fs0.pconv * 1000000.0) / 1000000.0 AS p_conv_base"
                f" FROM fs{si}, fs0"
            )
    return (
        "WITH RECURSIVE "
        + _mkv_transitions_sql()
        + ","
        + ",".join(scen_parts)
        + " "
        + " UNION ALL ".join(outs)
    )


@query("attr_markov_removal", oracle=_mkv_oracle())
def attr_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain attribution: model user journeys (START → channel
    hops → first purchase = CONV, else NULL) as a first-order chain
    and credit each channel its REMOVAL EFFECT — the relative drop in
    START→CONV absorption probability when hops into that channel are
    blocked (Anderl et al., the standard data-driven alternative to
    position rules like attr_multi_touch).

    Determinism: transition probabilities are exact-integer-count
    ratios (same doubles both engines); the absorption fixed point
    runs a FIXED {iters} synchronous iterations with per-state sums
    folded in state-index order — Python mirrors the oracle's
    list_sum fold exactly.

    Plan shape: corpus-sized work is ONE user-partitioned window pass
    + one grouped transition count (≤ (|channels|+2)² rows). The
    scenario fixed points run driver-side on that collected bounded
    matrix (the CMS-collect contract); results return as literals.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    st = F.when(F.col("event_type") == "purchase", "CONV").otherwise(
        F.col("event_type")
    )
    evr = ev.select(
        "user_id", st.alias("st"), F.row_number().over(w).alias("rn")
    )
    fp = evr.groupBy("user_id").agg(
        F.min(F.when(F.col("st") == "CONV", F.col("rn"))).alias("fp_rn"),
        F.max("rn").alias("last_rn"),
    )
    kept = (
        evr.join(fp, "user_id")
        .withColumn("end_rn", F.coalesce("fp_rn", "last_rn"))
        .where(F.col("rn") <= F.col("end_rn"))
    )
    w2 = Window.partitionBy("user_id").orderBy("rn")
    hops = kept.select(
        "st",
        F.lead("st").over(w2).alias("nxt"),
        (F.col("rn") == F.col("end_rn")).alias("is_last"),
        F.col("rn"),
    )
    starts = kept.where(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("st").alias("dst")
    )
    mids = hops.where(F.col("nxt").isNotNull()).select(
        F.col("st").alias("src"), F.col("nxt").alias("dst")
    )
    ends = hops.where(F.col("is_last") & (F.col("st") != "CONV")).select(
        F.col("st").alias("src"), F.lit("NULL").alias("dst")
    )
    trans = (
        starts.unionByName(mids)
        .unionByName(ends)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    counts = {(r["src"], r["dst"]): int(r["c"]) for r in trans}

    def pconv(removed):
        # blocked hops into `removed` become losses
        cc = {}
        for (src, dst), c in counts.items():
            d2 = "NULL" if removed is not None and dst == removed else dst
            cc[(src, d2)] = cc.get((src, d2), 0) + c
        tot = {}
        for (src, _), c in cc.items():
            tot[src] = tot.get(src, 0) + c
        states = list(_MKV_STATES)
        v = [0.0] * len(states)
        for _ in range(_MKV_ITERS):
            nv = []
            for s in states:
                acc = 0.0
                for j, d in enumerate([*states, "CONV"]):
                    c = cc.get((s, d), 0)
                    if c:
                        p = float(c) / float(tot[s])
                        x = v[j] if j < len(states) else 1.0
                        acc = acc + p * x
                nv.append(acc)
            v = nv
        return v[0]

    base = pconv(None)
    rows = []
    import math as _m

    for ch in _MKV_CHANNELS:
        # zero-conversion corpus: no channel can have a removal effect
        eff = 0.0 if base == 0.0 else 1.0 - pconv(ch) / base
        rows.append(
            (
                ch,
                _m.floor(eff * 1e6) / 1e6,
                _m.floor(base * 1e6) / 1e6,
            )
        )
    return spark.createDataFrame(
        rows, "channel string, removal_effect double, p_conv_base double"
    )


attr_markov_removal.__doc__ = attr_markov_removal.__doc__.format(
    iters=_MKV_ITERS
)

def _mkv_split_sql() -> str:
    from speech_data_pipeline_spark.queries.text_q import _hex7_to_int_sql

    return (
        _hex7_to_int_sql("md5('mkv:' || CAST(user_id AS VARCHAR))") + " % 2"
    )


@query(
    "events_markov_holdout_acc",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id)
               AS prev_type
      FROM events
    ), bg AS (
      SELECT user_id, prev_type, event_type AS next_type,
             {_mkv_split_sql()} AS half
      FROM s WHERE prev_type IS NOT NULL
    ), tc AS (
      SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS cnt
      FROM bg WHERE half = 0 GROUP BY prev_type, next_type
    ), pred AS (
      SELECT prev_type, next_type AS pred_next FROM (
        SELECT prev_type, next_type,
               row_number() OVER (PARTITION BY prev_type
                                  ORDER BY cnt DESC, next_type) AS rk
        FROM tc) WHERE rk = 1
    )
    SELECT b.prev_type, p.pred_next,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN b.next_type = p.pred_next
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           floor(CAST(sum(CASE WHEN b.next_type = p.pred_next
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) * 1000000.0) / 1000000.0
             AS accuracy
    FROM bg b JOIN pred p USING (prev_type)
    WHERE b.half = 1
    GROUP BY b.prev_type, p.pred_next
    """,
)
def events_markov_holdout_acc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out next-event prediction accuracy of the first-order
    Markov model — the EVAL companion to events_markov_transitions:
    train the argmax-next table on the hash-even half of USERS
    (user-level splits prevent within-sequence leakage), score the
    odd half's transitions. Per context type: the trained prediction,
    test count, hits, accuracy — the number that says whether the
    transition matrix is a usable next-action model or just a
    descriptive table.

    Plan: one per-user lag window (the transitions query's exact
    ordering contract: event-time micros, then event_id), one grouped
    count on the train half, a |types|-bounded argmax window, one
    broadcast join + grouped accuracy on the test half."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.expr("ts div 1000"), "event_id"
    )
    split = (
        F.expr(
            "conv(substring(md5('mkv:' || CAST(user_id AS STRING)), 1, 7),"
            " 16, 10)"
        ).cast("long")
        % 2
    )
    s = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    bg = s.where(F.col("prev_type").isNotNull()).select(
        "prev_type",
        F.col("event_type").alias("next_type"),
        split.alias("half"),
    )
    tc = (
        bg.where(F.col("half") == 0)
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_rk = Window.partitionBy("prev_type").orderBy(
        F.col("cnt").desc(), "next_type"
    )
    pred = (
        tc.withColumn("rk", F.row_number().over(w_rk))
        .where(F.col("rk") == 1)
        .select("prev_type", F.col("next_type").alias("pred_next"))
    )
    hit = F.when(F.col("next_type") == F.col("pred_next"), 1).otherwise(0)
    return (
        bg.where(F.col("half") == 1)
        .join(F.broadcast(pred), "prev_type")
        .groupBy("prev_type", "pred_next")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(hit).alias("n_correct"),
            trunc6(
                F.sum(hit).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("accuracy"),
        )
    )


# ---------------------------------------------------------------------------
# Bradley–Terry preference-strength model (MM fixed-point, fixed rounds)
# ---------------------------------------------------------------------------

#: MM rounds for the Bradley–Terry fit. Correctness does not depend on
#: convergence — Spark and the oracle replay the SAME quantized
#: trajectory — but 6 rounds is comfortably stable to 6 decimals on a
#: densely-compared 5-item design.
_BT_ROUNDS = 6

#: Shared comparison-extraction SQL: consecutive events of one user
#: with different types and different values form one pairwise
#: preference (higher `value` wins) — the classic implicit-feedback
#: reduction of an event stream to preference pairs.
_BT_COMP_SQL = """
    s AS (
      SELECT user_id, event_type, value,
             lag(event_type) OVER w AS prev_type,
             lag(value) OVER w AS prev_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), comp AS (
      SELECT CASE WHEN value > prev_value THEN event_type
                  ELSE prev_type END AS win,
             CASE WHEN value > prev_value THEN prev_type
                  ELSE event_type END AS lose
      FROM s
      WHERE prev_type IS NOT NULL
        AND value <> prev_value AND event_type <> prev_type
    ), wl AS (
      SELECT win, lose, CAST(count(*) AS BIGINT) AS cnt
      FROM comp GROUP BY win, lose
    ), pairs AS MATERIALIZED (
      SELECT i, j, CAST(sum(cnt) AS BIGINT) AS n FROM (
        SELECT win AS i, lose AS j, cnt FROM wl
        UNION ALL
        SELECT lose AS i, win AS j, cnt FROM wl
      ) GROUP BY i, j
    ), wins AS MATERIALIZED (
      SELECT win AS i, CAST(sum(cnt) AS BIGINT) AS wi FROM wl GROUP BY win
    ), ncomp AS MATERIALIZED (
      SELECT i, CAST(sum(n) AS BIGINT) AS nc FROM pairs GROUP BY i
    ), pi0 AS MATERIALIZED (
      SELECT DISTINCT i, CAST(1000000 AS BIGINT) AS pi FROM pairs
    )"""


def _bt_round_sql(r: int) -> str:
    """One MM round as chained CTEs: quantized term table → integer
    denominator sum → integer-division update → normalization to
    Σπ = m·10⁶ (the same integer trajectory the Spark side walks)."""
    return f"""
    t{r} AS (
      SELECT p.i,
             CAST(floor(CAST(p.n AS DOUBLE) * 1000000.0
                        / CAST(greatest(a.pi + b.pi, 1) AS DOUBLE)
                        * 1000000000.0) AS BIGINT) AS tn
      FROM pairs p
      JOIN pi{r} a ON a.i = p.i
      JOIN pi{r} b ON b.i = p.j
    ), d{r} AS (
      SELECT i, CAST(sum(tn) AS HUGEINT) AS dn FROM t{r} GROUP BY i
    ), raw{r} AS MATERIALIZED (
      SELECT d.i,
             CAST(CAST(coalesce(w.wi, 0) AS HUGEINT)
                  * 1000000000000000 // greatest(d.dn, 1) AS HUGEINT) AS pi
      FROM d{r} d LEFT JOIN wins w ON w.i = d.i
    ), pi{r + 1} AS MATERIALIZED (
      SELECT i,
             CAST(pi * (count(*) OVER ()) * 1000000
                  // greatest(sum(pi) OVER (), 1)
                  AS BIGINT) AS pi
      FROM raw{r}
    )"""


def bradley_terry_fit(wl: DataFrame, rounds: int = _BT_ROUNDS) -> DataFrame:
    """Fit Bradley–Terry strengths from a directed win-count table
    ``(win, lose, cnt)`` via Hunter's MM algorithm, ``rounds``
    fixed iterations from π=1:

        π_i ← W_i / Σ_j n_ij / (π_i + π_j)

    then normalized to Σπ = m·10⁶ each round.

    Exactness contract: π lives as INTEGER micro-units; each pair term
    ``n_ij/(π_i+π_j)`` is one deterministic double expression of
    integer inputs floor-quantized to nano-units BEFORE the per-item
    sum (BIGINT/DECIMAL across the shuffle — fold-order-proof); the
    update and the normalization are integer divisions. Both engines
    walk the identical integer trajectory, so the gate compares exact
    values, not converged approximations.

    Items that never win converge to π=0 (the BT MLE boundary — their
    strength IS zero under the model); ``greatest(·,1)`` guards keep
    the trajectory total.

    100 TB shape: the corpus-scale work is producing ``wl`` (callers:
    one lag window + one grouped count); everything here runs on the
    item×item table — |items|² rows, bounded by the type vocabulary,
    broadcast-sized at any corpus scale. Because the fit state is that
    bounded, the MM rounds run as ONE single-task Arrow pass over the
    coalesced win table (round-11 optimization, the tokenizer-trainer
    recipe, guide §1.2): the former per-round join/cross-attach chain
    spent its time in 6 rounds of broadcast builds and scalar
    aggregates, not in data. :func:`_bt_mm_rounds` replays the exact
    integer/double trajectory (same fold quantization, same integer
    divisions), so the values — still gated by the chained-CTE DuckDB
    oracle — are unchanged.
    """
    return wl.coalesce(1).mapInPandas(
        _bt_local_fit(rounds), "i string, pi long"
    )


def _bt_mm_rounds(rows: list, rounds: int) -> tuple[list, list]:
    """Pure-Python replay of the MM trajectory over the bounded win
    table — the EXACT sequence the former distributed loop (and the
    DuckDB oracle's chained CTEs) computes:

    - ``n_ij``: symmetrized integer pair counts (order-proof sums);
    - ``tn``: per-pair ``floor(n·1e6 / max(π_i+π_j, 1) · 1e9)`` with
      the identical double operation order, so the IEEE result matches
      the engine expression bit for bit;
    - per-item denominators, ``π_i ← W_i·10¹⁵ div max(Σtn, 1)`` and
      the ``π·m·10⁶ div max(Σπ, 1)`` renormalization — all non-negative
      integer divisions, where Python ``//`` equals SQL ``div``.
    """
    import math

    n_map: dict = {}
    wins: dict = {}
    for w_, l_, c in rows:
        c = int(c)
        n_map[(w_, l_)] = n_map.get((w_, l_), 0) + c
        n_map[(l_, w_)] = n_map.get((l_, w_), 0) + c
        wins[w_] = wins.get(w_, 0) + c
    items = sorted({i for i, _ in n_map})
    pi = {i: 1000000 for i in items}
    for _ in range(rounds):
        dn = {i: 0 for i in items}
        for (i, j), n in n_map.items():
            dn[i] += math.floor(
                float(n) * 1000000.0
                / float(max(pi[i] + pi[j], 1))
                * 1000000000.0
            )
        m = len(items)
        raw = {
            i: (wins.get(i, 0) * 10**15) // max(dn[i], 1) for i in items
        }
        s = sum(raw.values())
        pi = {i: (raw[i] * m * 1000000) // max(s, 1) for i in items}
    return items, [pi[i] for i in items]


def _bt_local_fit(rounds: int):
    """mapInPandas kernel factory: consume the (single-partition) win
    table, run :func:`_bt_mm_rounds` once, emit ``(i, pi)``."""

    def fn(batches):
        frames = list(batches)
        if frames:
            allb = pd.concat(frames, ignore_index=True)
            rows = list(
                zip(
                    allb["win"].tolist(),
                    allb["lose"].tolist(),
                    allb["cnt"].tolist(),
                )
            )
        else:
            rows = []
        items, pis = _bt_mm_rounds(rows, rounds)
        yield pd.DataFrame({"i": items, "pi": pis}).astype({"pi": "int64"})

    return fn


def _bt_oracle(rounds: int = _BT_ROUNDS) -> str:
    chain = "".join(_bt_round_sql(r) + "," for r in range(rounds))
    return f"""
    WITH {_BT_COMP_SQL}, {chain.rstrip(",")}
    SELECT p.i AS item,
           coalesce(w.wi, 0) AS n_wins,
           n.nc AS n_comparisons,
           floor(CAST(p.pi AS DOUBLE)
                 / CAST(greatest((SELECT sum(pi) FROM pi{rounds}), 1)
                        AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS strength
    FROM pi{rounds} p
    LEFT JOIN wins w ON w.i = p.i
    JOIN ncomp n ON n.i = p.i
    """


@query("pref_bradley_terry", oracle=_bt_oracle())
def pref_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry preference strengths over the event-type
    vocabulary — the model behind RLHF preference-data curation
    (rank responses/sources from pairwise human choices) and
    match-quality ranking, fit by Hunter's MM algorithm.

    Comparisons: consecutive events of one user with different types
    and different values form one pairwise preference — higher
    ``value`` wins (the implicit-feedback reduction; ties and
    same-type pairs are dropped). The fit itself is
    :func:`bradley_terry_fit` — see its docstring for the quantized
    integer-trajectory contract.

    Output: ``(item, n_wins, n_comparisons, strength)`` with strength
    normalized to Σ=1.

    Plan shape: one per-user lag window + one grouped count collapse
    the stream to the |types|² win matrix; the MM rounds run entirely
    on that broadcast-sized table. At 100 TB the window sort is the
    only corpus-scale stage (the same shape every sessionization query
    already pays), and the fit cost is independent of corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.expr("ts div 1000"), "event_id")
    s = ev.select(
        "event_type",
        "value",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("value").over(w).alias("prev_value"),
    )
    comp = s.where(
        F.col("prev_type").isNotNull()
        & (F.col("value") != F.col("prev_value"))
        & (F.col("event_type") != F.col("prev_type"))
    ).select(
        F.when(F.col("value") > F.col("prev_value"), F.col("event_type"))
        .otherwise(F.col("prev_type"))
        .alias("win"),
        F.when(F.col("value") > F.col("prev_value"), F.col("prev_type"))
        .otherwise(F.col("event_type"))
        .alias("lose"),
    )
    wl = comp.groupBy("win", "lose").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wl = wl.persist()
    pi = bradley_terry_fit(wl, _BT_ROUNDS)
    wins = wl.groupBy(F.col("win").alias("i")).agg(
        F.sum("cnt").cast("long").alias("wi")
    )
    pairs_n = (
        wl.select(F.col("win").alias("i"), "cnt")
        .unionAll(wl.select(F.col("lose").alias("i"), "cnt"))
        .groupBy("i")
        .agg(F.sum("cnt").cast("long").alias("nc"))
    )
    tot = pi.agg(F.sum("pi").alias("s"))
    return (
        pi.join(F.broadcast(wins), "i", "left")
        .join(F.broadcast(pairs_n), "i")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("i").alias("item"),
            F.coalesce(F.col("wi"), F.lit(0).cast("long")).alias("n_wins"),
            F.col("nc").alias("n_comparisons"),
            trunc6(
                F.col("pi").cast("double")
                / F.greatest(F.col("s"), F.lit(1).cast("long")).cast("double")
            ).alias("strength"),
        )
    )


# ---------------------------------------------------------------------------
# Ljung–Box portmanteau test (white-noise check over the ACF battery)
# ---------------------------------------------------------------------------

#: chi-square 95% critical values (ppm) for df = 1..5 — shared literal
#: table with the oracle; reject when Q_ppm exceeds the df'th entry.
_LB_CRIT_PPM = (3841459, 5991465, 7814728, 9487729, 11070498)


def _ljung_box_oracle() -> str:
    crit = ", ".join(str(c) for c in _LB_CRIT_PPM)
    return f"""
    WITH acf AS ({_acf_oracle()}),
    terms AS (
      SELECT event_type, n,
             CAST(floor(acf * acf / (n - lag) * 1000000000000.0)
                  AS HUGEINT) AS t_pico
      FROM acf
    ),
    q AS (
      SELECT event_type, max(n) AS n, count(*) AS df,
             CAST(floor(CAST(max(n) AS DOUBLE)
                        * (CAST(max(n) AS DOUBLE) + 2.0)
                        * CAST(sum(t_pico) AS DOUBLE) / 1000000000000.0
                        * 1000000.0) AS BIGINT) AS q_ppm
      FROM terms GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, CAST(df AS BIGINT) AS df,
           CAST(q_ppm AS DOUBLE) / 1000000.0 AS q_stat,
           CASE WHEN q_ppm > ([{crit}])[CAST(df AS INTEGER)]
                THEN 1 ELSE 0 END AS reject_white_noise
    FROM q
    """


@query("ts_ljung_box", oracle=_ljung_box_oracle())
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test per event type: is the daily value
    series distinguishable from white noise? ``Q = n(n+2) Σ_{k≤h}
    r_k²/(n−k)`` over the same lag-1..5 autocorrelations ts_acf_lags
    reports, compared against the χ²(0.05, df) critical value — the
    standard pre-flight before fitting any AR model (ts_ar1_forecast)
    or reading the ACF table as structure.

    Determinism: the r_k inputs are ts_acf_lags' OUTPUT values —
    already trunc6-quantized and oracle-hash-matched — so each term
    ``r_k²/(n−k)`` is one per-row float expression quantized to
    integer pico units before the cross-lag sum; Q is a single
    assembly from that integer, and the reject decision compares
    integer ppm against a shared literal critical-value table. No
    cross-engine float accumulation anywhere.

    Plan shape: everything rides the ACF plan (|types|·|days| cells,
    partitioned lead windows) plus ONE |types|-row aggregate — n/df
    and the Q ppm come out of the same groupBy, so the events-scan ACF
    subtree appears exactly once in the plan (a second aggregate +
    self-join would duplicate it per action — the same two-branch
    shape the blocking audits removed).
    """
    acf = ts_acf_lags(spark, sf_dir)
    terms = acf.select(
        "event_type",
        "n",
        F.floor(
            F.col("acf")
            * F.col("acf")
            / (F.col("n") - F.col("lag")).cast("double")
            * F.lit(1e12)
        )
        .cast("decimal(38,0)")
        .alias("t_pico"),
    )
    q = terms.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("df"),
        F.floor(
            F.max("n").cast("double")
            * (F.max("n").cast("double") + F.lit(2.0))
            * F.sum("t_pico").cast("double")
            / F.lit(1e12)
            * F.lit(1e6)
        )
        .cast("long")
        .alias("q_ppm"),
    )
    crit = F.array(*[F.lit(c).cast("long") for c in _LB_CRIT_PPM])
    return q.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("df").cast("long").alias("df"),
        (F.col("q_ppm").cast("double") / F.lit(1e6)).alias("q_stat"),
        F.when(
            F.col("q_ppm") > F.element_at(crit, F.col("df").cast("int")),
            1,
        )
        .otherwise(0)
        .alias("reject_white_noise"),
    )


# ---------------------------------------------------------------------------
# round 10: Nelson–Aalen cumulative hazard, two-group log-rank test
# ---------------------------------------------------------------------------


@query(
    "survival_nelson_aalen",
    oracle="""
    WITH t AS (
      SELECT user_id, min(epoch_us(ts)) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts)
                      END) AS p_t
      FROM events GROUP BY user_id
    ), mx AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
    durs AS (
      SELECT CASE WHEN p_t IS NOT NULL
                  THEN (p_t - t0) // 86400000000
                  ELSE (tmax - t0) // 86400000000 END AS dur_days,
             CASE WHEN p_t IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM t CROSS JOIN mx
    ), byday AS (
      SELECT dur_days, CAST(sum(ev) AS BIGINT) AS n_event,
             CAST(sum(1 - ev) AS BIGINT) AS n_cens
      FROM durs GROUP BY dur_days
    ), risk AS (
      SELECT dur_days, n_event,
             sum(n_event + n_cens) OVER ()
             - coalesce(sum(n_event + n_cens) OVER (ORDER BY dur_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS at_risk
      FROM byday
    ), terms AS (
      SELECT dur_days, n_event, at_risk,
             CAST(floor(CAST(n_event AS DOUBLE)
                        / CAST(at_risk AS DOUBLE) * 1e9)
                  AS BIGINT) AS hq
      FROM risk
    )
    SELECT dur_days, n_event, CAST(at_risk AS BIGINT) AS at_risk,
           floor(CAST(sum(hq) OVER (ORDER BY dur_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / 1e9 * 1000000.0) / 1000000.0 AS cum_hazard,
           floor(exp(-(CAST(sum(hq) OVER (ORDER BY dur_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) / 1e9)) * 1000000.0) / 1000000.0 AS na_survival
    FROM terms
    QUALIFY n_event > 0
    ORDER BY dur_days
    """,
)
def survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard ``H(d) = Σ_{d'≤d} e_{d'}/r_{d'}``
    for time-to-first-purchase (same duration construction as
    ``survival_kaplan_meier``), with the Fleming–Harrington survivor
    ``exp(−H)`` — the estimator of choice when hazard SHAPE (wear-in /
    wear-out) is the question, and better-behaved than KM in small
    risk sets.

    Exactness: each day's hazard increment is floor-quantized to
    integer nano units before the running sum (the KM lnq idiom), so
    the cross-row accumulation is exact integer arithmetic; exp is one
    float op per OUTPUT row.

    Plan shape: identical to KM — per-user grouped min pair, 1-row
    broadcast horizon, then day-bounded windows.
    """
    ev = load_table(spark, sf_dir, "events")
    t_us = F.expr("ts div 1000")
    per_user = ev.groupBy("user_id").agg(
        F.min(t_us).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", t_us)
        ).alias("p_t"),
    )
    mx = ev.agg(F.max(t_us).alias("tmax"))
    durs = per_user.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("p_t").isNotNull(),
            F.expr("(p_t - t0) div 86400000000"),
        )
        .otherwise(F.expr("(tmax - t0) div 86400000000"))
        .alias("dur_days"),
        F.when(F.col("p_t").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    byday = durs.groupBy("dur_days").agg(
        F.sum("ev").cast("long").alias("n_event"),
        F.sum(F.lit(1) - F.col("ev")).cast("long").alias("n_cens"),
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = byday.select(
        "dur_days",
        "n_event",
        (
            F.sum(F.col("n_event") + F.col("n_cens")).over(w_all)
            - F.coalesce(
                F.sum(F.col("n_event") + F.col("n_cens")).over(w_prev),
                F.lit(0),
            )
        ).alias("at_risk"),
    )
    hq = F.floor(
        F.col("n_event").cast("double")
        / F.col("at_risk").cast("double")
        * F.lit(1e9)
    ).cast("long")
    w_run = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("hq").over(w_run).cast("double") / F.lit(1e9)
    return (
        risk.withColumn("hq", hq)
        .select(
            "dur_days",
            "n_event",
            F.col("at_risk").cast("long").alias("at_risk"),
            trunc6(cum).alias("cum_hazard"),
            trunc6(F.exp(-cum)).alias("na_survival"),
        )
        .where(F.col("n_event") > 0)
        .orderBy("dur_days")
    )


@query(
    "survival_logrank_test",
    oracle="""
    WITH t AS (
      SELECT user_id, user_id % 2 AS grp, min(epoch_us(ts)) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts)
                      END) AS p_t
      FROM events GROUP BY user_id
    ), mx AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
    durs AS (
      SELECT grp,
             CASE WHEN p_t IS NOT NULL
                  THEN (p_t - t0) // 86400000000
                  ELSE (tmax - t0) // 86400000000 END AS dur_days,
             CASE WHEN p_t IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM t CROSS JOIN mx
    ), byday AS (
      SELECT dur_days,
             CAST(sum(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS BIGINT)
               AS e0,
             CAST(sum(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT)
               AS e1,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS t0c,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS t1c
      FROM durs GROUP BY dur_days
    ), risk AS (
      SELECT dur_days, e0, e1,
             sum(t0c) OVER ()
             - coalesce(sum(t0c) OVER (ORDER BY dur_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r0,
             sum(t1c) OVER ()
             - coalesce(sum(t1c) OVER (ORDER BY dur_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r1
      FROM byday
    ), terms AS (
      SELECT e0 + e1 AS e, r0 + r1 AS r, e1, r1,
             CAST(floor(CAST((e0 + e1) * r1 AS DOUBLE)
                        / CAST(r0 + r1 AS DOUBLE) * 1e9) AS BIGINT)
               AS e1q,
             CASE WHEN r0 + r1 > 1 THEN
               CAST(floor(CAST((e0 + e1) * r1 AS DOUBLE)
                          / CAST(r0 + r1 AS DOUBLE)
                          * (CAST(r0 AS DOUBLE) / CAST(r0 + r1 AS DOUBLE))
                          * (CAST(r0 + r1 - e0 - e1 AS DOUBLE)
                             / CAST(r0 + r1 - 1 AS DOUBLE))
                          * 1e9) AS BIGINT)
             ELSE 0 END AS vq
      FROM risk WHERE e0 + e1 > 0
    ), agg AS (
      SELECT CAST(sum(e1) AS BIGINT) AS o1,
             CAST(sum(e1q) AS BIGINT) AS e1sum,
             CAST(sum(vq) AS BIGINT) AS vsum
      FROM terms
    ), sizes AS (
      SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
      FROM durs
    )
    SELECT n0, n1, o1,
           floor(CAST(e1sum AS DOUBLE) / 1e9 * 1000000.0) / 1000000.0
             AS e1_expected,
           floor(CAST(vsum AS DOUBLE) / 1e9 * 1000000.0) / 1000000.0
             AS variance,
           floor((CAST(o1 AS DOUBLE) - CAST(e1sum AS DOUBLE) / 1e9)
                 * (CAST(o1 AS DOUBLE) - CAST(e1sum AS DOUBLE) / 1e9)
                 / (CAST(vsum AS DOUBLE) / 1e9) * 1000000.0) / 1000000.0
             AS chi2
    FROM agg CROSS JOIN sizes
    """,
)
def survival_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank (Mantel–Cox) test on time-to-first-purchase,
    groups = ``user_id % 2`` (a deterministic A/B split), censored at
    the corpus horizon: ``χ² = (O₁−E₁)²/V`` with the hypergeometric
    per-day expectation ``E₁ = Σ e·r₁/r`` and variance
    ``V = Σ e·(r₁/r)·(r₀/r)·(r−e)/(r−1)`` — THE standard test for
    comparing survival curves, the inferential companion of the KM /
    Nelson–Aalen estimators.

    Exactness: per-day E and V contributions are floor-quantized to
    integer nano units before summation (the KM lnq idiom); O₁ and the
    risk sets are exact integers; χ² is one float assembly at the end.

    Plan shape: per-user grouped min pair → day-grouped conditional
    counts → day-bounded windows → 1-row output.
    """
    ev = load_table(spark, sf_dir, "events")
    t_us = F.expr("ts div 1000")
    per_user = ev.groupBy("user_id").agg(
        F.min(t_us).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", t_us)
        ).alias("p_t"),
    )
    mx = ev.agg(F.max(t_us).alias("tmax"))
    durs = per_user.crossJoin(F.broadcast(mx)).select(
        (F.col("user_id") % 2).alias("grp"),
        F.when(
            F.col("p_t").isNotNull(),
            F.expr("(p_t - t0) div 86400000000"),
        )
        .otherwise(F.expr("(tmax - t0) div 86400000000"))
        .alias("dur_days"),
        F.when(F.col("p_t").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    byday = durs.groupBy("dur_days").agg(
        F.sum(F.when(F.col("grp") == 0, F.col("ev")).otherwise(0))
        .cast("long").alias("e0"),
        F.sum(F.when(F.col("grp") == 1, F.col("ev")).otherwise(0))
        .cast("long").alias("e1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long").alias("t0c"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long").alias("t1c"),
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("dur_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = byday.select(
        "dur_days",
        "e0",
        "e1",
        (
            F.sum("t0c").over(w_all)
            - F.coalesce(F.sum("t0c").over(w_prev), F.lit(0))
        ).alias("r0"),
        (
            F.sum("t1c").over(w_all)
            - F.coalesce(F.sum("t1c").over(w_prev), F.lit(0))
        ).alias("r1"),
    ).where((F.col("e0") + F.col("e1")) > 0)
    e = F.col("e0") + F.col("e1")
    r = F.col("r0") + F.col("r1")
    e1q = F.floor(
        (e * F.col("r1")).cast("double") / r.cast("double") * F.lit(1e9)
    ).cast("long")
    vq = F.when(
        r > 1,
        F.floor(
            (e * F.col("r1")).cast("double")
            / r.cast("double")
            * (F.col("r0").cast("double") / r.cast("double"))
            * ((r - e).cast("double") / (r - 1).cast("double"))
            * F.lit(1e9)
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    agg = risk.select(
        F.col("e1"), e1q.alias("e1q"), vq.alias("vq")
    ).agg(
        F.sum("e1").cast("long").alias("o1"),
        F.sum("e1q").cast("long").alias("e1sum"),
        F.sum("vq").cast("long").alias("vsum"),
    )
    sizes = durs.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long").alias("n0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long").alias("n1"),
    )
    o1d = F.col("o1").cast("double")
    e1d = F.col("e1sum").cast("double") / F.lit(1e9)
    vd = F.col("vsum").cast("double") / F.lit(1e9)
    return agg.crossJoin(F.broadcast(sizes)).select(
        "n0",
        "n1",
        "o1",
        trunc6(e1d).alias("e1_expected"),
        trunc6(vd).alias("variance"),
        trunc6((o1d - e1d) * (o1d - e1d) / vd).alias("chi2"),
    )
