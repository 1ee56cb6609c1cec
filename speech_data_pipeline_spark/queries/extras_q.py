"""Coverage extras: multimodal binary features, the W8 recursive
splitter, and the SQL surface Spark provides for free but the engine
must still expose correctly (rollup/cube, intersect/except, pivot-style
conditional aggregation — SURVEY.md §2.5/§2.7 'free from Spark' notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from speech_data_pipeline_spark.operators import multimodal as mm
from speech_data_pipeline_spark.operators.splitting import recursive_gap_split
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.sources.catalog import (
    DERIVED_INTERVALS_SQL,
    derived_intervals,
    load_table,
)

#: W8 split threshold: 4 hours in microseconds.
W8_MAX_SPAN = 4 * 3_600_000_000


@query(
    "mm_binary_features",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS sha256,
           64 + octet_length(encode(text)) % 577 AS fake_width,
           64 + (octet_length(encode(text)) * 31) % 577 AS fake_height
    FROM documents
    """,
)
def mm_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: binary payload column →
    Arrow-batched mapInPandas feature extraction.

    The oracle recomputes the same byte-level features in SQL, proving
    the Python kernel's batching/schema handling is faithful.
    """
    d = load_table(spark, sf_dir, "documents")
    return mm.extract_features(mm.attach_binary(d, "text"))


@query(
    "w8_recursive_split",
    oracle=f"""
    WITH RECURSIVE iv AS ({DERIVED_INTERVALS_SQL}
    ), pre AS (
      SELECT user_id, start_us, end_us,
             row_number() OVER w AS rn,
             max(end_us) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cummax_e,
             CASE WHEN row_number() OVER w = 1 THEN 0
                  ELSE start_us - max(end_us) OVER
                         (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             END AS gap_at
      FROM iv
      WINDOW w AS (PARTITION BY user_id ORDER BY start_us, end_us)
    ), cnts AS (
      SELECT user_id, count(*) AS n FROM pre GROUP BY user_id
    ), walk AS (
      SELECT user_id, CAST(1 AS BIGINT) AS lo, CAST(n AS BIGINT) AS hi FROM cnts
      UNION ALL
      SELECT w.user_id,
             CASE WHEN d.side = 0 THEN w.lo
                  ELSE (SELECT p.rn FROM pre p WHERE p.user_id = w.user_id
                        AND p.rn > w.lo AND p.rn <= w.hi
                        ORDER BY p.gap_at DESC, p.rn ASC LIMIT 1) END AS lo,
             CASE WHEN d.side = 0
                  THEN (SELECT p.rn FROM pre p WHERE p.user_id = w.user_id
                        AND p.rn > w.lo AND p.rn <= w.hi
                        ORDER BY p.gap_at DESC, p.rn ASC LIMIT 1) - 1
                  ELSE w.hi END AS hi
      FROM walk w
      JOIN (SELECT 0 AS side UNION ALL SELECT 1) d ON true
      WHERE w.hi > w.lo
        AND (SELECT max(p.gap_at) FROM pre p WHERE p.user_id = w.user_id
             AND p.rn > w.lo AND p.rn <= w.hi) > 0
        AND (SELECT p.cummax_e FROM pre p
             WHERE p.user_id = w.user_id AND p.rn = w.hi)
            - (SELECT p.start_us FROM pre p
               WHERE p.user_id = w.user_id AND p.rn = w.lo) > {W8_MAX_SPAN}
    ), pieces AS (
      SELECT w.user_id, w.lo, w.hi FROM walk w
      WHERE NOT (w.hi > w.lo
        AND coalesce((SELECT max(p.gap_at) FROM pre p WHERE p.user_id = w.user_id
                      AND p.rn > w.lo AND p.rn <= w.hi) > 0, false)
        AND (SELECT p.cummax_e FROM pre p
             WHERE p.user_id = w.user_id AND p.rn = w.hi)
            - (SELECT p.start_us FROM pre p
               WHERE p.user_id = w.user_id AND p.rn = w.lo) > {W8_MAX_SPAN})
    ), np_ AS (
      SELECT user_id, lo, hi,
             row_number() OVER (PARTITION BY user_id ORDER BY lo) - 1 AS piece_id
      FROM pieces
    )
    SELECT s.user_id, s.start_us, s.end_us,
           CAST(np_.piece_id AS BIGINT) AS piece_id,
           (SELECT p.start_us FROM pre p
            WHERE p.user_id = np_.user_id AND p.rn = np_.lo) AS piece_start,
           (SELECT p.cummax_e FROM pre p
            WHERE p.user_id = np_.user_id AND p.rn = np_.hi) AS piece_end
    FROM np_ JOIN pre s
      ON s.user_id = np_.user_id AND s.rn BETWEEN np_.lo AND np_.hi
    """,
)
def w8_recursive_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: recursively split >4 h user spans at the largest internal gap.

    The data-dependent recursion is replayed exactly in DuckDB as a
    recursive CTE over (lo, hi) index ranges: each iteration splits
    every still-too-long range at its max-gap cut (earliest tie, same
    as the kernel's argmax); final pieces are the ranges that stop
    splitting. Verified identical to a pure-NumPy kernel replay before
    wiring. Golden tests in tests/test_splitting.py pin edge semantics.
    """
    ivd = derived_intervals(spark, sf_dir)
    out = recursive_gap_split(ivd, max_span=4 * 3_600_000_000)
    return out.select(
        "user_id", "start_us", "end_us", "piece_id", "piece_start", "piece_end"
    )


@query(
    "rollup_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (free from Spark; exposed + oracle-checked)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total,
           count(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "set_intersect_except",
    oracle="""
    SELECT o_custkey AS custkey, 'both' AS tag FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey, 'both' FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    (SELECT o_custkey, 'only_open' FROM orders WHERE o_orderstatus = 'O'
     EXCEPT
     SELECT o_custkey, 'only_open' FROM orders WHERE o_orderstatus = 'F')
    """,
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operators (U-family completeness)."""
    o = load_table(spark, sf_dir, "orders")
    open_ = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    finished = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    both = open_.intersect(finished).withColumn("tag", F.lit("both"))
    only_open = open_.subtract(finished).withColumn("tag", F.lit("only_open"))
    return both.unionByName(only_open)


@query(
    "pivot_acctbal_by_segment",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                 THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE)
             AS automobile,
           CAST(round(sum(CASE WHEN c_mktsegment = 'BUILDING'
                 THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE)
             AS building,
           CAST(round(sum(CASE WHEN c_mktsegment = 'MACHINERY'
                 THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE 0 END), 2) AS DOUBLE)
             AS machinery
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def pivot_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation (portable form of groupBy.pivot)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dec = F.col("c_acctbal").cast("decimal(18,2)")

    def seg(name: str):
        return (
            F.round(
                F.sum(F.when(F.col("c_mktsegment") == name, dec).otherwise(F.lit(0))),
                2,
            )
            .cast("double")
            .alias(name.lower())
        )

    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(seg("AUTOMOBILE"), seg("BUILDING"), seg("MACHINERY"))
    )


@query(
    "a10_windowed_means",
    oracle="""
    SELECT user_id,
           epoch_us(date_trunc('day', ts)) AS day_us,
           floor((CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
                  / (100.0 * count(*))) * 1000000.0) / 1000000.0 AS mean_value,
           count(*) AS n
    FROM events
    GROUP BY user_id, date_trunc('day', ts)
    """,
)
def a10_windowed_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: per-(user, day) mean — windowed mean-reduce.

    The sum accumulates as exact decimal (merge-order-proof), converts
    to integer cents, and the mean is one double division of exact
    integers — bit-identical across engines (decimal *division* scale
    rules differ between engines, so the division must happen in
    doubles). Day bucketing truncates the nanos-long ts to
    86400-second boundaries — identical to the oracle's date_trunc
    because the data's epoch values are all positive — and the bucket
    is EMITTED as epoch micros (``day_us``), not a timestamp: an LTZ
    timestamp output renders in the collecting session's timezone,
    which the driver does not pin (tests/test_driver_compat.py runs
    this query under America/New_York to hold the line).
    """
    ev = load_table(spark, sf_dir, "events")
    day_us = (F.expr("ts div 1000") / F.lit(86_400_000_000)).cast("long") * F.lit(
        86_400_000_000
    )
    cents = (F.sum(F.col("value").cast("decimal(18,2)")) * 100).cast("long")
    return (
        ev.groupBy("user_id", day_us.alias("day_us"))
        .agg(
            (
                F.floor(cents / (F.lit(100.0) * F.count(F.lit(1))) * F.lit(1e6)) / 1e6
            ).alias("mean_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "a11_collect_set_types",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types_seen,
           count(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def a11_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: collect_set accumulation (speakers-seen analog), emitted as
    a sorted joined string so the value hash is order-independent."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws("|", F.array_sort(F.collect_set("event_type"))).alias(
            "types_seen"
        ),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "j7_composite_key_lookup",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'P'
    """,
)
def j7_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: equi-key lookup join (the (start,end)->value dict analog):
    filtered build side, streamed probe side."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderpriority"
    )


@query(
    "x_array_battery",
    oracle="""
    SELECT vec_id,
           array_to_string(list_transform(list_slice(embedding, 3, 6),
             x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                       AS VARCHAR)), '|') AS sliced,
           array_to_string(list_transform(
             CASE WHEN len(embedding) >= 70 THEN list_slice(embedding, 1, 70)
                  ELSE list_concat(embedding,
                         list_transform(range(1, 70 - len(embedding) + 1),
                                        i -> CAST(0.0 AS FLOAT)))
             END,
             x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
                       AS VARCHAR)), '|') AS padded,
           floor((list_sum(list_transform(
             list_zip(embedding, list_reverse(embedding)),
             p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))) * 1000000.0)
             / 1000000.0 AS sub_sum,
           floor((list_sum(list_transform(
             list_zip(embedding, list_reverse(embedding)),
             p -> (CAST(p[1] AS DOUBLE) + CAST(p[2] AS DOUBLE)) / 2.0))) * 1000000.0)
             / 1000000.0 AS mix_sum
    FROM embeddings
    """,
)
def x_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6/X7/X9/X10 as a query: slice, trim-or-pad, element-wise
    subtract and mixdown (vs the reversed vector), reduced to sums so
    the oracle compares scalars. The sliced/padded arrays are emitted
    as '|'-joined strings of floor(x*1e6) integers — integer string
    formatting is engine-identical, where raw float arrays crash the
    driver canonicalizer (round-1 gate) and float repr may diverge."""
    from speech_data_pipeline_spark.functions.arrays import (
        mono_mixdown,
        subtract_waves,
        trim_or_pad,
    )

    def _arr_str(col):
        return F.concat_ws(
            "|",
            F.transform(
                col,
                lambda x: F.floor(x.cast("double") * F.lit(1e6))
                .cast("long")
                .cast("string"),
            ),
        )

    e = load_table(spark, sf_dir, "embeddings")
    rev = F.reverse(F.col("embedding"))
    sub = subtract_waves(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.transform(rev, lambda x: x.cast("double")),
    )
    mix = mono_mixdown(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.transform(rev, lambda x: x.cast("double")),
    )
    return e.select(
        "vec_id",
        _arr_str(F.slice(F.col("embedding"), 3, 4)).alias("sliced"),
        _arr_str(trim_or_pad(F.col("embedding"), 70, 0.0)).alias("padded"),
        (
            F.floor(F.aggregate(sub, F.lit(0.0), lambda a, x: a + x) * F.lit(1e6))
            / 1e6
        ).alias("sub_sum"),
        (
            F.floor(F.aggregate(mix, F.lit(0.0), lambda a, x: a + x) * F.lit(1e6))
            / 1e6
        ).alias("mix_sum"),
    )


@query(
    "x_array_battery2",
    oracle="""
    WITH base AS (
      SELECT vec_id,
             list_transform(list_slice(embedding, 1, 8),
                            x -> CAST(x AS DOUBLE)) AS w8,
             list_transform(list_slice(embedding, 1, 5),
                            x -> CAST(x AS DOUBLE)) AS w5,
             CAST(embedding[1] AS DOUBLE) AS x0
      FROM embeddings
    ), stats AS (
      SELECT vec_id, w8, w5, x0,
             list_sum(w8) / 8 AS mu
      FROM base
    ), dm AS (
      SELECT vec_id, w5, x0,
             list_transform(w8, x -> x - mu) AS d,
             list_max(list_transform(w8, x -> abs(x - mu))) AS mx
      FROM stats
    )
    SELECT vec_id,
           array_to_string(list_transform(d,
             x -> CAST(CAST(floor(CASE WHEN mx > 0 THEN x * 0.95 / mx
                                       ELSE 0.0 END * 1000000.0)
                            AS BIGINT) AS VARCHAR)), '|') AS normalized,
           array_to_string(list_transform(
             flatten(list_transform(
               range(CAST(pow(2, CASE WHEN CAST(floor(63.0 / len(w5)) AS BIGINT) <= 0
                                      THEN 0
                                      ELSE length(bin(CAST(floor(63.0 / len(w5))
                                                           AS BIGINT)))
                                 END) AS INTEGER)),
               i -> w5)),
             x -> CAST(CAST(floor(x * 1000000.0) AS BIGINT) AS VARCHAR)),
             '|') AS repeated,
           floor((((0.99 * x0 - 0.82) * x0 + 1.13) * x0 + 0.04) * 1000000.0)
             / 1000000.0 AS poly
    FROM dm
    """,
)
def x_array_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 normalize + W5 repeat-pad doubling + X14 polyval as an
    oracle-gated query (previously pytest-only rows). Same stringified
    float convention as x_array_battery: elements emitted as '|'-joined
    floor(x*1e6) integer strings, scalars trunc6 — engine-identical
    where raw float arrays/reprs are not.

    - ``normalized``: demean + peak-scale of the first 8 embedding
      elements (reference utils.py:58-62).
    - ``repeated``: the DNSMOS doubling prelude (dnsmos.py:128-134) on
      a 5-element base padded toward 64 — full doubled length
      5·2^ceil(log2(64/5)) = 80, never cut to n.
    - ``poly``: cubic Horner on the first element (dnsmos.py:78-104).
    """
    from speech_data_pipeline_spark.functions.arrays import (
        normalize_wave,
        polyval,
        repeat_pad_to,
    )

    def _arr_str(col):
        return F.concat_ws(
            "|",
            F.transform(
                col,
                lambda x: F.floor(x.cast("double") * F.lit(1e6))
                .cast("long")
                .cast("string"),
            ),
        )

    e = load_table(spark, sf_dir, "embeddings")
    w8 = F.transform(
        F.slice(F.col("embedding"), 1, 8), lambda x: x.cast("double")
    )
    w5 = F.transform(
        F.slice(F.col("embedding"), 1, 5), lambda x: x.cast("double")
    )
    x0 = F.col("embedding")[0].cast("double")
    return e.select(
        "vec_id",
        _arr_str(normalize_wave(w8, peak=0.95)).alias("normalized"),
        _arr_str(repeat_pad_to(w5, 64)).alias("repeated"),
        (F.floor(polyval(x0, [0.99, -0.82, 1.13, 0.04]) * F.lit(1e6)) / 1e6).alias(
            "poly"
        ),
    )


@query(
    "window_function_battery",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile,
           lag(c_custkey) OVER w AS prev_key,
           floor(cume_dist() OVER w * 1000000.0) / 1000000.0 AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/analytic window surface: rank, dense_rank, ntile, lag,
    cume_dist in one partitioned ordered window."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("c_custkey").over(w).alias("prev_key"),
        (F.floor(F.cume_dist().over(w) * F.lit(1e6)) / 1e6).alias("cdist"),
    )


@query(
    "percentile_acctbal_by_nation",
    oracle="""
    SELECT c_nationkey,
           floor(median(c_acctbal) * 1000000.0) / 1000000.0 AS med,
           floor(quantile_cont(c_acctbal, 0.9) * 1000000.0) / 1000000.0 AS p90,
           count(*) AS n
    FROM customer
    GROUP BY c_nationkey
    """,
)
def percentile_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90) per group.

    Both engines implement linear interpolation over sorted values;
    the arithmetic is the same IEEE expression, truncated at 1e-6.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        (F.floor(F.expr("percentile(c_acctbal, 0.5)") * F.lit(1e6)) / 1e6).alias(
            "med"
        ),
        (F.floor(F.expr("percentile(c_acctbal, 0.9)") * F.lit(1e6)) / 1e6).alias(
            "p90"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           event_type
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property extraction + predicate (the
    reference's nested-dict payloads as queryable columns)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k_value"), "event_type").where(
        F.col("k_value") > 50
    )


@query(
    "w1_native_session_window",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS t_us FROM events
    ), flagged AS (
      SELECT user_id, t_us,
             CASE WHEN lag(t_us) OVER w IS NULL
                  OR t_us - lag(t_us) OVER w >= 600000000
             THEN 1 ELSE 0 END AS new_session
      FROM iv WINDOW w AS (PARTITION BY user_id ORDER BY t_us)
    ), sess AS (
      SELECT user_id, t_us,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY t_us
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged
    )
    SELECT user_id,
           min(t_us) AS win_start_us,
           max(t_us) + 600000000 AS win_end_us,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def w1_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in session_window in batch mode (the uncapped W1):
    window end = last event + gap, break on gap >= interval (note:
    session_window's break is >=, unlike the reference kernel's strict
    >; the oracle mirrors session_window here)."""
    ev = load_table(spark, sf_dir, "events")
    with_ts = ev.withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        with_ts.groupBy(
            F.session_window("ts_ts", "10 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("win_start_us"),
            F.unix_micros(F.col("w.end")).alias("win_end_us"),
            "n_events",
        )
    )


@query(
    "x_spectral_frame_energy",
    oracle="""
    SELECT vec_id,
           CAST(f AS INTEGER) AS frame_idx,
           floor(list_sum(list_transform(range(0, 16),
               n -> pow((0.5 - 0.5 * cos(2 * pi() * n / 16.0))
                        * CAST(embedding[CAST(f * 8 + n + 1 AS INTEGER)] AS DOUBLE), 2)
           )) * 1000000.0) / 1000000.0 AS frame_energy
    FROM embeddings, range(0, 7) t(f)
    """,
)
def x_spectral_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X13 cross-engine value check via Parseval's theorem: per-frame
    spectral energy computed from the one-sided rfft
    (operators/spectral.py:stft_frame_energy) must equal the
    time-domain Hann-windowed frame energy, which the SQL oracle CAN
    compute with list ops — so the FFT path itself is value-checked,
    not just row-counted. Uncentered frames (n_fft=16, hop=8) keep the
    SQL replay a plain windowed slice; both sides trunc6 (FFT
    round-trip error ~1e-15 relative, far inside the truncation).
    """
    from speech_data_pipeline_spark.functions import trunc6
    from speech_data_pipeline_spark.operators.spectral import stft_frame_energy

    e = load_table(spark, sf_dir, "embeddings")
    fe = stft_frame_energy(e, n_fft=16, hop=8)
    return fe.select(
        "vec_id", "frame_idx", trunc6(F.col("frame_energy")).alias("frame_energy")
    )


@query(
    "a_skew_salted_hotkey",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_skew_salted_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation through the salted two-phase operator
    (operators/skew.py:salted_aggregate), exercised in anger: the
    grouping key is ``l_returnflag`` — THREE distinct values over the
    whole lineitem table, the canonical hot-key shape where at 100 TB
    each reducer would otherwise receive a third of the corpus'
    per-key partials from a single shuffle key.

    Phase 1 shuffles on ``(l_returnflag, _salt)`` (16 salts from a row
    hash of the primary key — deterministic under retries), spreading
    each hot key over 16 reducers; phase 2 merges the 16 tiny partials
    per key. DECIMAL sums keep the two-phase result bit-identical to
    the oracle's single GROUP BY regardless of merge order. The plan
    must show BOTH HashAggregate rounds (asserted in
    tests/test_plan_shapes.py).
    """
    from speech_data_pipeline_spark.operators.skew import salted_aggregate

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_qty_dec", F.col("l_quantity").cast("decimal(18,2)")
    )
    out = salted_aggregate(
        li,
        key="l_returnflag",
        n_salts=16,
        salt_source_cols=["l_orderkey", "l_linenumber"],
        sums={"sum_qty": "_qty_dec"},
    )
    return out.select(
        "l_returnflag",
        "n",
        F.round("sum_qty", 2).cast("double").alias("sum_qty"),
    )


@query(
    "events_retention_cohort",
    oracle="""
    WITH d AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events
    ), c AS (
      SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day
      FROM d
    )
    SELECT cohort_day // 7 AS cohort_week,
           (day - cohort_day) // 7 AS week_off,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM c
    GROUP BY cohort_day // 7, (day - cohort_day) // 7
    """,
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    activity counted per week-offset since that first week — the
    canonical product-analytics rollup every event pipeline ships.

    All calendar math is integer division on epoch micros (exact and
    timezone-proof in both engines — no date_trunc, whose week origin
    differs across engines). Plan shape: one window shuffle on
    ``user_id`` attaches each user's cohort day (first activity), then
    one grouped distinct-count; Spark plans the count-distinct as the
    standard two-phase expand — no join back, no self-join, and the
    cohort matrix output is O(weeks²) rows regardless of corpus size.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    # integer div end-to-end: ts is epoch NANOS (~1.8e18) — a double
    # detour would round above 2^53 and can flip a day boundary
    day = F.expr("(ts div 1000) div 86400000000")
    d = ev.select("user_id", day.alias("day"))
    c = d.withColumn(
        "cohort_day", F.min("day").over(W.partitionBy("user_id"))
    )
    return (
        c.groupBy(
            F.expr("cohort_day div 7").alias("cohort_week"),
            F.expr("(day - cohort_day) div 7").alias("week_off"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "incr_view_maintenance",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def incr_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate (materialized-view) maintenance as a gate
    row: the orders history arrives as THREE date-ranged batches, each
    partial-aggregated independently (plans/incremental.py
    `aggregate_delta`) and folded into running state
    (`merge_aggregate_state` — full-outer join + coalesce-add). The
    oracle is the one-shot GROUP BY over all of history: the fold MUST
    equal the rescan, which is the whole correctness contract of
    incremental view maintenance (state ⊕ delta = state', associative,
    so out-of-order batches converge).

    Scale shape: each refresh touches one batch plus the keys-sized
    state — never rescans history; DECIMAL sums make the fold result
    independent of batch order and shuffle merge order.
    """
    from speech_data_pipeline_spark.plans.incremental import (
        aggregate_delta,
        merge_aggregate_state,
    )

    o = load_table(spark, sf_dir, "orders").withColumn(
        "_tot_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    keys = ["o_orderpriority", "o_orderstatus"]
    cuts = ["1997-01-01 00:00:00", "1999-01-01 00:00:00"]
    b1 = o.where(F.col("o_orderdate") < F.expr(f"TIMESTAMP_NTZ '{cuts[0]}'"))
    b2 = o.where(
        (F.col("o_orderdate") >= F.expr(f"TIMESTAMP_NTZ '{cuts[0]}'"))
        & (F.col("o_orderdate") < F.expr(f"TIMESTAMP_NTZ '{cuts[1]}'"))
    )
    b3 = o.where(F.col("o_orderdate") >= F.expr(f"TIMESTAMP_NTZ '{cuts[1]}'"))
    state = aggregate_delta(b1, keys, {"total_dec": "_tot_dec"})
    for batch in (b2, b3):
        state = merge_aggregate_state(
            state, aggregate_delta(batch, keys, {"total_dec": "_tot_dec"}), keys
        )
    return state.select(
        *keys,
        "n",
        F.round("total_dec", 2).cast("double").alias("total"),
    )


#: Sequence-pattern horizon: whole view→click→purchase chain within
#: 24 h (the synthetic corpus averages one event per user per ~11 h, so
#: a 1 h horizon matches nothing — vacuous for the gate).
_SEQ_HORIZON_US = 24 * 3_600_000_000


@query(
    "pattern_funnel_sequence",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS t, event_type, value
      FROM events
    ), w1 AS (
      SELECT *, last_value(CASE WHEN event_type = 'view' THEN t END
                           IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv
      FROM ev
    ), w2 AS (
      SELECT *, last_value(CASE WHEN event_type = 'click'
                                THEN struct_pack(ct := t, vt := lv) END
                           IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl
      FROM w1
    )
    SELECT user_id, cl.vt AS view_us, cl.ct AS click_us, t AS purchase_us,
           value AS amount
    FROM w2
    WHERE event_type = 'purchase' AND cl IS NOT NULL
      AND cl.vt IS NOT NULL AND cl.vt < cl.ct AND cl.ct < t
      AND t - cl.vt <= {_SEQ_HORIZON_US}
    """,
)
def pattern_funnel_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern: per user, every
    ``view → click → purchase`` chain (strictly increasing times,
    latest-match semantics, whole chain within 24 hours) — the CEP
    primitive product funnels need beyond the simple two-step as-of
    attribution of ``funnel_view_to_purchase``.

    The pattern automaton is encoded as TWO chained carry-forward
    windows over ONE partitioning (single shuffle on ``user_id``):
    pass 1 carries the latest view time; pass 2 carries, at each
    click, the struct (click_ts, view-at-click) — so every purchase
    row reads the full chain in O(1) and a WHERE applies the strict
    ordering + horizon. No self-joins, no per-user quadratic: the
    window state is one struct regardless of history length, the same
    shape `asof_join` uses. DuckDB replays it with
    ``last_value IGNORE NULLS`` windows.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("ts div 1000").alias("t"),
        "event_type", "value",
    )
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    lv = F.last(
        F.when(F.col("event_type") == "view", F.col("t")), ignorenulls=True
    ).over(w)
    ev1 = ev.withColumn("lv", lv)
    cl = F.last(
        F.when(
            F.col("event_type") == "click",
            F.struct(F.col("t").alias("ct"), F.col("lv").alias("vt")),
        ),
        ignorenulls=True,
    ).over(w)
    ev2 = ev1.withColumn("cl", cl)
    return (
        ev2.where(
            (F.col("event_type") == "purchase")
            & F.col("cl").isNotNull()
            & F.col("cl.vt").isNotNull()
            & (F.col("cl.vt") < F.col("cl.ct"))
            & (F.col("cl.ct") < F.col("t"))
            & (F.col("t") - F.col("cl.vt") <= _SEQ_HORIZON_US)
        )
        .select(
            "user_id",
            F.col("cl.vt").alias("view_us"),
            F.col("cl.ct").alias("click_us"),
            F.col("t").alias("purchase_us"),
            F.col("value").alias("amount"),
        )
    )
