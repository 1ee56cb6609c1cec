"""Market-basket analytics: co-purchase pair mining (support /
confidence / lift) and item-item cosine recommendations.

The classic association-rule surface over the order→part incidence.
Scale notes: the per-order self-join's blowup is bounded by the max
basket size squared (TPC-H baskets are ≤7 lines; real carts are tens
— never corpus-sized), pair counts shuffle once on the pair key, and
per-item totals join back on the item key; the only broadcast is the
1-row order-count scalar. All ratios are exact integer divisions
truncated at 1e-6.

Reference parity: none (beyond-reference analytics north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speech_data_pipeline_spark.functions import trunc6
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.sources.catalog import load_table

#: Minimum pair support (orders containing both items).
_MIN_SUPPORT = 2

_PAIR_CTES = f"""
    inc AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), pairs AS (
      SELECT a.p AS pa, b.p AS pb, count(*) AS cnt
      FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    ), item AS (
      SELECT p, count(*) AS c FROM inc GROUP BY p
    ), tot AS (
      SELECT count(DISTINCT o) AS n_orders FROM inc
    ), scored AS (
      SELECT pa, pb, cnt,
             ia.c AS ca, ib.c AS cb, n_orders
      FROM pairs
      JOIN item ia ON ia.p = pa
      JOIN item ib ON ib.p = pb
      CROSS JOIN tot
      WHERE cnt >= {_MIN_SUPPORT}
    )
"""


def _pair_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared pair-count chain: order→item incidence, bounded
    per-basket self-join, min-support pair counts, item totals joined
    back — the runtime twin of the SQL side's ``_PAIR_CTES``.
    Columns: (pa, pb, cnt, ca, cb)."""
    li = load_table(spark, sf_dir, "lineitem")
    inc = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = inc.alias("a"), inc.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= _MIN_SUPPORT)
    )
    item = inc.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    return pairs.join(
        item.select(F.col("p").alias("pa"), F.col("c").alias("ca")), "pa"
    ).join(item.select(F.col("p").alias("pb"), F.col("c").alias("cb")), "pb")


@query(
    "basket_copurchase_pairs",
    oracle=f"""
    WITH {_PAIR_CTES}
    SELECT pa, pb, cnt,
           floor(CAST(cnt AS DOUBLE) / ca * 1000000.0) / 1000000.0
             AS conf_a_to_b,
           floor((CAST(cnt AS DOUBLE) * n_orders)
                 / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS lift
    FROM scored
    """,
)
def basket_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association pairs over order baskets with support, confidence,
    and lift — one incidence dedup, one bounded per-basket self-join,
    one pair-key aggregate, item totals joined back on the item key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    tot = (
        li.select(F.col("l_orderkey").alias("o"))
        .agg(F.countDistinct("o").alias("n_orders"))
    )
    scored = _pair_scored(spark, sf_dir).crossJoin(F.broadcast(tot))
    return scored.select(
        "pa",
        "pb",
        "cnt",
        trunc6(F.col("cnt").cast("double") / F.col("ca")).alias("conf_a_to_b"),
        trunc6(
            (F.col("cnt").cast("double") * F.col("n_orders"))
            / (F.col("ca").cast("double") * F.col("cb").cast("double"))
        ).alias("lift"),
    )


#: Recommendations per item.
_REC_K = 3


@query(
    "recs_item_cosine",
    oracle=f"""
    WITH {_PAIR_CTES},
    sym AS (
      SELECT pa AS item, pb AS rec, cnt, ca AS ci, cb AS cr FROM scored
      UNION ALL
      SELECT pb AS item, pa AS rec, cnt, cb AS ci, ca AS cr FROM scored
    ), ranked AS (
      SELECT item, rec, cnt,
             floor(CAST(cnt AS DOUBLE)
                   / sqrt(CAST(ci AS DOUBLE) * CAST(cr AS DOUBLE))
                   * 1000000.0) / 1000000.0 AS score
      FROM sym
    )
    SELECT item, rec, cnt, score
    FROM (SELECT *, row_number() OVER (PARTITION BY item
                ORDER BY score DESC, rec) AS rn
          FROM ranked)
    WHERE rn <= {_REC_K}
    """,
)
def recs_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine recommendations from binary basket incidence:
    ``cos(i,j) = c_ij / sqrt(c_i·c_j)``, top-3 per item via a
    ``WindowGroupLimit``-prunable per-item rank (partitioned window —
    never a global sort)."""
    scored = _pair_scored(spark, sf_dir)
    sym = scored.select(
        F.col("pa").alias("item"),
        F.col("pb").alias("rec"),
        "cnt",
        F.col("ca").alias("ci"),
        F.col("cb").alias("cr"),
    ).unionByName(
        scored.select(
            F.col("pb").alias("item"),
            F.col("pa").alias("rec"),
            "cnt",
            F.col("cb").alias("ci"),
            F.col("ca").alias("cr"),
        )
    )
    ranked = sym.select(
        "item",
        "rec",
        "cnt",
        trunc6(
            F.col("cnt").cast("double")
            / F.sqrt(F.col("ci").cast("double") * F.col("cr").cast("double"))
        ).alias("score"),
    )
    w = Window.partitionBy("item").orderBy(F.col("score").desc(), "rec")
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _REC_K)
        .drop("rn")
    )


@query(
    "rfm_customer_segments",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_o,
             count(*) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS m_cents
      FROM orders GROUP BY o_custkey
    ), nowt AS (SELECT max(last_o) AS now_o FROM per),
    feat AS (
      SELECT o_custkey,
             (epoch_us(now_o) - epoch_us(last_o)) // 86400000000 AS r_days,
             n_orders, m_cents
      FROM per CROSS JOIN nowt
    ), th AS (
      SELECT quantile_cont(r_days, 0.25) AS r1, quantile_cont(r_days, 0.5) AS r2,
             quantile_cont(r_days, 0.75) AS r3,
             quantile_cont(n_orders, 0.25) AS f1, quantile_cont(n_orders, 0.5) AS f2,
             quantile_cont(n_orders, 0.75) AS f3,
             quantile_cont(m_cents, 0.25) AS m1, quantile_cont(m_cents, 0.5) AS m2,
             quantile_cont(m_cents, 0.75) AS m3
      FROM feat
    ), scored AS (
      SELECT o_custkey, r_days, n_orders,
             floor(m_cents / 100.0 * 1000000.0) / 1000000.0 AS monetary,
             1 + CAST(r_days <= r3 AS INT) + CAST(r_days <= r2 AS INT)
               + CAST(r_days <= r1 AS INT) AS r_score,
             1 + CAST(n_orders > f1 AS INT) + CAST(n_orders > f2 AS INT)
               + CAST(n_orders > f3 AS INT) AS f_score,
             1 + CAST(m_cents > m1 AS INT) + CAST(m_cents > m2 AS INT)
               + CAST(m_cents > m3 AS INT) AS m_score
      FROM feat CROSS JOIN th
    )
    SELECT o_custkey, CAST(r_days AS BIGINT) AS r_days,
           CAST(n_orders AS BIGINT) AS n_orders, monetary,
           CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CASE WHEN r_score >= 3 AND f_score >= 3 AND m_score >= 3
                  THEN 'champion'
                WHEN r_score >= 3 AND f_score <= 2 THEN 'new'
                WHEN r_score <= 2 AND (f_score >= 3 OR m_score >= 3)
                  THEN 'at_risk'
                ELSE 'hibernating' END AS segment
    FROM scored
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency / frequency / monetary quartile scores
    per customer, with the classic champion / new / at-risk /
    hibernating labels.

    Shape: one grouped agg builds the per-customer features (exact:
    integer day recency, integer cents); "now" and the nine quartile
    thresholds are ONE-row aggregates broadcast back, so scoring is a
    map-side projection — no rank window over the customer table (the
    usual ntile() formulation is a partition-less sort; threshold
    broadcasting is the shape that survives a billion customers, at
    the cost of the exact-percentile aggregate the registry already
    uses elsewhere).
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    per = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_o"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("m_cents"),
    )
    nowt = per.agg(F.max("last_o").alias("now_o"))
    feat = per.crossJoin(F.broadcast(nowt)).select(
        "o_custkey",
        F.expr(
            # NTZ-safe exact integer-microsecond difference (the
            # catalog's timestampdiff idiom; unix_micros rejects NTZ)
            "timestampdiff(MICROSECOND, last_o, now_o) div 86400000000"
        ).alias("r_days"),
        "n_orders",
        "m_cents",
    )
    th = feat.agg(
        *[
            F.expr(f"percentile({c}, {q})").alias(f"{a}{i}")
            for c, a in (("r_days", "r"), ("n_orders", "f"), ("m_cents", "m"))
            for i, q in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )
    s = feat.crossJoin(F.broadcast(th))
    r_score = (
        F.lit(1)
        + (F.col("r_days") <= F.col("r3")).cast("int")
        + (F.col("r_days") <= F.col("r2")).cast("int")
        + (F.col("r_days") <= F.col("r1")).cast("int")
    ).cast("long")
    f_score = (
        F.lit(1)
        + (F.col("n_orders") > F.col("f1")).cast("int")
        + (F.col("n_orders") > F.col("f2")).cast("int")
        + (F.col("n_orders") > F.col("f3")).cast("int")
    ).cast("long")
    m_score = (
        F.lit(1)
        + (F.col("m_cents") > F.col("m1")).cast("int")
        + (F.col("m_cents") > F.col("m2")).cast("int")
        + (F.col("m_cents") > F.col("m3")).cast("int")
    ).cast("long")
    scored = s.select(
        "o_custkey",
        F.col("r_days").cast("long").alias("r_days"),
        F.col("n_orders").cast("long").alias("n_orders"),
        (F.floor(F.col("m_cents") / F.lit(100.0) * F.lit(1e6)) / F.lit(1e6)).alias(
            "monetary"
        ),
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.when(
            (F.col("r_score") >= 3) & (F.col("f_score") >= 3)
            & (F.col("m_score") >= 3),
            "champion",
        )
        .when((F.col("r_score") >= 3) & (F.col("f_score") <= 2), "new")
        .when(
            (F.col("r_score") <= 2)
            & ((F.col("f_score") >= 3) | (F.col("m_score") >= 3)),
            "at_risk",
        )
        .otherwise("hibernating"),
    )


@query(
    "supplier_lead_time_percentiles",
    oracle="""
    WITH d AS (
      SELECT l.l_suppkey,
             (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
               // 86400000000 AS lead_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT l_suppkey,
           count(*) AS n_shipments,
           floor(median(lead_days) * 1000000.0) / 1000000.0 AS med_days,
           floor(quantile_cont(lead_days, 0.9) * 1000000.0) / 1000000.0
             AS p90_days,
           CAST(max(lead_days) AS BIGINT) AS max_days
    FROM d GROUP BY l_suppkey
    """,
)
def supplier_lead_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time percentiles per supplier — the supply-
    chain SLA report. Fact⋈orders on the order key (one exchange),
    integer day deltas, grouped exact percentiles (bounded per-group
    state = a supplier's shipment count)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "l_suppkey",
            F.expr(
                "timestampdiff(MICROSECOND, o_orderdate, l_shipdate)"
                " div 86400000000"
            ).alias("lead_days"),
        )
    )
    return d.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        (F.floor(F.expr("percentile(lead_days, 0.5)") * F.lit(1e6)) / 1e6).alias(
            "med_days"
        ),
        (F.floor(F.expr("percentile(lead_days, 0.9)") * F.lit(1e6)) / 1e6).alias(
            "p90_days"
        ),
        F.max("lead_days").cast("long").alias("max_days"),
    )


#: Minimum triple support for the Apriori level-3 pass.
_MIN_SUPPORT3 = 2


@query(
    "mine_itemsets_apriori",
    oracle=f"""
    WITH inc AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), fp AS (
      SELECT a.p AS pa, b.p AS pb
      FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING count(*) >= {_MIN_SUPPORT}
    ), bp AS (
      SELECT a.o, a.p AS pa, b.p AS pb
      FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
      JOIN fp ON fp.pa = a.p AND fp.pb = b.p
    ), tri AS (
      SELECT bp.o, bp.pa AS p1, bp.pb AS p2, c.p AS p3
      FROM bp JOIN inc c ON c.o = bp.o AND c.p > bp.pb
      JOIN fp f2 ON f2.pa = bp.pb AND f2.pb = c.p
      JOIN fp f3 ON f3.pa = bp.pa AND f3.pb = c.p
    ), cnt AS (
      SELECT p1, p2, p3, CAST(count(*) AS BIGINT) AS support
      FROM tri GROUP BY p1, p2, p3
      HAVING count(*) >= {_MIN_SUPPORT3}
    ), tot AS (SELECT count(DISTINCT o) AS n_orders FROM inc)
    SELECT p1, p2, p3, support,
           floor(CAST(support AS DOUBLE) / n_orders * 1000000.0)
             / 1000000.0 AS support_ratio
    FROM cnt CROSS JOIN tot
    """,
)
def mine_itemsets_apriori(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets by the Apriori level-wise pass: only
    candidate triples ALL of whose sub-pairs cleared the pair support
    floor are ever enumerated (the anti-monotone prune), then counted
    per basket.

    Plan shape: the frequent-pair table is the pair aggregate with a
    HAVING floor; per-basket pair enumeration is bounded by basket
    size² and runs ONCE (for the pair counts); the per-basket
    frequent-pair occurrences re-expand baskets only along frequent
    pairs (item ⋈ fp + a shares-the-basket semi probe — the prune
    kills the long Zipf tail BEFORE the 3-way extend); the
    triple extend joins one more incidence item per basket with two
    further frequent-pair filters, then one grouped count on the
    triple key. The n_orders denominator is a 1-row broadcast scalar.
    """
    li = load_table(spark, sf_dir, "lineitem")
    inc = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = inc.alias("a"), inc.alias("b")
    fp = (
        a.join(
            b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p"))
        )
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= _MIN_SUPPORT)
        .select("pa", "pb")
    )
    # Re-derive per-basket frequent-pair occurrences WITHOUT a second
    # full basket² enumeration: expand baskets only along the frequent
    # pairs they contain (item ⋈ fp on the leading item, then a semi
    # probe that the trailing item shares the basket).
    bp = (
        inc.select("o", F.col("p").alias("pa"))
        .join(fp, "pa")
        .join(
            inc.select("o", F.col("p").alias("pb")),
            ["o", "pb"],
            "left_semi",
        )
    )
    c = inc.select(F.col("o"), F.col("p").alias("p3"))
    tri = (
        bp.join(c, "o")
        .where(F.col("p3") > F.col("pb"))
        .join(
            fp.select(F.col("pa").alias("pb"), F.col("pb").alias("p3")),
            ["pb", "p3"],
            "left_semi",
        )
        .join(
            fp.select(F.col("pa"), F.col("pb").alias("p3")),
            ["pa", "p3"],
            "left_semi",
        )
    )
    cnt = (
        tri.groupBy(
            F.col("pa").alias("p1"),
            F.col("pb").alias("p2"),
            F.col("p3"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= _MIN_SUPPORT3)
    )
    tot = inc.agg(F.countDistinct("o").alias("n_orders"))
    return cnt.crossJoin(F.broadcast(tot)).select(
        "p1",
        "p2",
        "p3",
        "support",
        trunc6(
            F.col("support").cast("double") / F.col("n_orders")
        ).alias("support_ratio"),
    )


#: Slope One pair support floor, output size, and per-user profile cap
#: (a 200k-item "user" is a bot/aggregator, not a taste signal — and
#: uncapped it is a C(k,2) hot-task bomb: the skew corpus' hot customer
#: rates 199,531 items = 19.9e9 pairs in ONE task. Real CF systems cap
#: rater profiles; 256 first-by-id items keeps every user's pair block
#: <= 32,640 rows.)
_SLOPE1_MIN_N = 5
_SLOPE1_K = 20
_SLOPE1_PROFILE_CAP = 256


@query(
    "recs_slope_one",
    oracle=f"""
    WITH ur0 AS (
      SELECT o_custkey AS u, l_partkey AS i,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS r
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2
    ), ur AS (
      SELECT u, i, r FROM (
        SELECT u, i, r,
               row_number() OVER (PARTITION BY u ORDER BY i) AS rn
        FROM ur0
      ) WHERE rn <= 256
    ), p AS (
      SELECT a.i AS item_i, b.i AS item_j,
             CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(a.r - b.r) AS BIGINT) AS sdiff
      FROM ur a JOIN ur b ON a.u = b.u AND a.i < b.i
      GROUP BY 1, 2
    )
    SELECT item_i, item_j, n_common,
           floor(CAST(sdiff AS DOUBLE) / CAST(n_common AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS dev
    FROM p WHERE n_common >= {_SLOPE1_MIN_N}
    ORDER BY n_common DESC, item_i, item_j LIMIT {_SLOPE1_K}
    """,
)
def recs_slope_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slope One collaborative filtering deviations (Lemire &
    Maclachlan): for item pairs co-rated by the same customers
    ("rating" = total quantity purchased), the average rating
    deviation ``dev(i,j) = Σ_u (r_ui − r_uj) / |U_ij|`` — the entire
    model state of the classic lightweight recommender (predictions
    are ``r_uj + dev(i,j)`` averaged over co-rated items). Top-20
    pairs by support (ties by ids).

    Exactness: ratings are integer quantity sums; (n, Σdiff) are
    integer aggregates; dev is one float ratio per output row.

    Plan shape at 100 TB: fact⋈orders for the customer key (shuffle
    join on orderkey), one (user, item) grouped sum, a deterministic
    first-256-by-id profile cap (row_number per user — without it a
    single hot "user" is a C(k,2) task bomb; measured: the skew
    corpus' 199,531-item customer implies 19.9e9 pairs in one task),
    then the per-user self-join — pair volume linear in users with a
    hard per-user bound — a pair-grouped integer aggregate and
    TakeOrdered(k).
    """
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    w_cap = Window.partitionBy("u").orderBy("i")
    ur = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .select(
            F.col("o_custkey").alias("u"),
            F.col("l_partkey").alias("i"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("u", "i")
        .agg(F.sum("q").cast("long").alias("r"))
        .withColumn("rn", F.row_number().over(w_cap))
        .where(F.col("rn") <= _SLOPE1_PROFILE_CAP)
        .drop("rn")
        # persisted: both sides of the pair self-join read ur, and each
        # read re-ran the fact⋈orders join + grouped sum + cap window
        # (round 11, guide §5); the cached frame is also already
        # hash-partitioned by u from the cap window, so the self-join
        # is co-partitioned — no further exchange on either side
        .persist()
    )
    a = ur.select("u", F.col("i").alias("item_i"), F.col("r").alias("ra"))
    b = ur.select("u", F.col("i").alias("item_j"), F.col("r").alias("rb"))
    p = (
        a.join(b, "u")
        .where(F.col("item_i") < F.col("item_j"))
        .groupBy("item_i", "item_j")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum(F.col("ra") - F.col("rb")).cast("long").alias("sdiff"),
        )
        .where(F.col("n_common") >= _SLOPE1_MIN_N)
    )
    return (
        p.select(
            "item_i",
            "item_j",
            "n_common",
            trunc6(
                F.col("sdiff").cast("double")
                / F.col("n_common").cast("double")
            ).alias("dev"),
        )
        .orderBy(F.col("n_common").desc(), "item_i", "item_j")
        .limit(_SLOPE1_K)
    )
