"""TPC-H completion set: the remaining classic decision-support query
shapes (Q6-Q22) adapted to the driver's reduced star schema.

The point of these rows is plan-shape coverage, not benchmark
compliance: together they exercise every join strategy (broadcast hash,
shuffled hash/SMJ on the fact key, left-semi, left-anti, existence
double-correlation), scalar subqueries as single-row broadcasts,
conditional aggregation, disjunctive pushdown, count-distinct, and
scalar-threshold correlation via grouped-aggregate joins — the full
relational surface a warehouse user of the reference's segment tables
would expect (SURVEY.md §2.4-2.5 note Spark provides these "for free";
these rows pin that promise with oracles).

Schema adaptations (the driver's TPC-H-ish tables lack partsupp,
l_commitdate/l_receiptdate/l_shipmode, p_container, c_phone):

- Q9  profit uses ``p_retailprice*quantity/10`` as the cost proxy.
- Q11 concentration runs over lineitem value per part, not partsupp.
- Q12 "late" means shipped > 30/60 days after order date.
- Q16 counts distinct shipping suppliers per (brand,type,size) from
  lineitem instead of partsupp.
- Q20/Q21 waiting/promotion semantics rebuilt on shipdate lateness.
- Q22 groups by customer nation instead of phone country code.

Cross-engine determinism follows queries/relational.py: DECIMAL money
sums, epoch-micros timestamps, round(…,6) on ratios, id tie-breaks on
every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.sources.catalog import load_table


def _dec(c, scale: int = 2):
    return F.col(c).cast(f"decimal(18,{scale})")


def _ts(lit: str) -> F.Column:
    return F.expr(f"TIMESTAMP_NTZ '{lit} 00:00:00'")


_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


@query(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate revenue forecast.

    Plan shape: the whole WHERE clause is sargable and lands in
    ``PushedFilters`` on the parquet scan — zero joins, zero shuffles
    beyond the single-row final aggregate; at 100 TB this is the
    I/O-bound floor query (scan speed is the only cost). DECIMAL sum is
    shuffle-order-proof.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
             AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN customer ON c_custkey  = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    Plan shape: the two nation dimensions filter to ONE row each before
    joining, so supplier and customer shrink to ~1/N of their size at
    the broadcast joins; the only big exchange is lineitem⋈orders. The
    disjunctive nation-pair predicate runs AFTER both small joins as a
    cheap residual filter — Catalyst cannot push a cross-table
    disjunction into either scan, but the nation broadcast already
    pruned all but 2/N of the dimension rows.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s.join(n1, F.col("s_nationkey") == F.col("s_nk"))),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle="""
    WITH all_nations AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey  = l_partkey
      JOIN supplier ON s_suppkey  = l_suppkey
      JOIN customer ON c_custkey  = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region    ON r_regionkey    = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(round(
             CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's market share inside one region's promo
    part market, by order year.

    Plan shape: region→nation→customer is a broadcast star arm that
    prunes customers to one region BEFORE the fact join; part filters
    to the PROMO slice and broadcasts; the share is conditional
    aggregation over one grouped pass (no self-join of the numerator
    against the denominator). Exact DECIMAL sums divide as doubles only
    at the end — deterministic on any shuffle order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_arm = c.join(
        F.broadcast(
            n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select(
                F.col("n_nationkey").alias("c_nk")
            )
        ),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey")
    supp_arm = s.join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("s_nk"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    joined = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_arm, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_arm), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        )
        .cast("double")
        .alias("mkt_share")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
           CAST(round(
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             - CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))
                        * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / 10,
           2) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, year(l_shipdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted): profit on a part-name family by supplier
    nation and ship year; cost proxied as ``p_retailprice*qty/10``
    (no partsupp table in this schema).

    Plan shape: the LIKE filter prunes part before its broadcast, so
    the fact table shrinks at the first join; supplier⋈nation is the
    second broadcast arm; one grouped aggregate, no order join needed
    at all (year comes from l_shipdate directly — one less exchange
    than the textbook Q9).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    cost = _dec("p_retailprice") * _dec("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(
                s.join(n, F.col("s_nationkey") == F.col("n_nationkey")).select(
                    "s_suppkey", "n_name"
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("long").alias("o_year"),
        )
        # revenue and cost sum separately as exact DECIMALs; the /10 and
        # the subtraction run once per group in double (identical IEEE
        # result both engines) — a per-row decimal division would hit
        # engine-specific decimal scale/rounding rules.
        .agg(
            F.round(
                F.sum(rev).cast("double") - F.sum(cost).cast("double") / 10, 2
            )
            .cast("double")
            .alias("sum_profit")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
             AS revenue,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,2)), 2) AS DOUBLE) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter.

    Plan shape: both date bounds and the returnflag land in
    ``PushedFilters``; orders (one quarter) joins lineitem on the fact
    key — the single large exchange; nation broadcasts; the top-20 is
    TakeOrderedAndProject with c_custkey as the deterministic
    tie-break.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(_dec("c_acctbal"), 2).cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q11_part_value_concentration",
    oracle="""
    WITH part_value AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey < 5
      GROUP BY l_partkey
    )
    SELECT l_partkey,
           CAST(round(value_dec, 2) AS DOUBLE) AS part_value
    FROM part_value
    WHERE value_dec > (SELECT sum(value_dec) * 0.001 FROM part_value)
    """,
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted): parts whose shipped value through one
    nation group's suppliers exceeds 0.1% of that group's total.

    Plan shape: the supplier filter broadcasts as a semi join; one
    grouped aggregate builds the per-part values; the global threshold
    is a SINGLE-ROW aggregate of the same frame cross-joined back as a
    broadcast — the grouped frame is computed once and reused (Catalyst
    reuses the exchange; no second lineitem scan of a correlated
    rewrite). Exact DECIMAL comparison, no float threshold drift.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_nationkey") < 5)
    pv = (
        li.join(
            F.broadcast(s.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_dec"))
    )
    thresh = pv.agg(
        (F.sum("value_dec") * F.lit(0.001)).alias("thresh")
    )
    return (
        pv.crossJoin(F.broadcast(thresh))
        .where(F.col("value_dec") > F.col("thresh"))
        .select(
            "l_partkey",
            F.round(F.col("value_dec"), 2).cast("double").alias("part_value"),
        )
    )


@query(
    "q12_late_priority_counts",
    oracle="""
    SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY year(l_shipdate)
    """,
)
def q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted): late shipments (>60 days after order) by
    ship year, split into high/low order-priority counts.

    Plan shape: one fact-key join with the lateness predicate as a
    residual (cross-column — cannot push to either scan), then a
    conditional-aggregation pass; both CASE sums come from the same
    grouped aggregate (one exchange, not two).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(round(
             100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
           6) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo parts' percentage of one month's revenue.

    Plan shape: the month filter pushes to the lineitem scan (reads
    ~1/36 of the fact table); part broadcasts WITHOUT a type filter
    (the CASE needs both branches); numerator and denominator come from
    ONE aggregate pass. Exact DECIMAL sums; the division happens once,
    driver-side arithmetic-free.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-03-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(round(total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue in one quarter.

    Plan shape: the quarter filter pushes down; one grouped aggregate
    per supplier; the max is a single-row aggregate of the SAME frame
    broadcast back (exchange reuse — lineitem is scanned once, not
    twice as the naive correlated rewrite would). Equality on exact
    DECIMAL revenue, so "the max" is well-defined cross-engine; ties
    all surface (no LIMIT), matching the spec's view semantics.
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias(
                "total_rev"
            )
        )
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev"), 2).cast("double").alias("total_revenue"),
        )
    )


@query(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted): distinct shipping suppliers per
    (brand, type, size) bucket, excluding one brand and the promo line.

    Plan shape: all three part predicates (including the IN list)
    evaluate on the broadcast dimension before the fact join; the
    count-distinct runs as Spark's two-phase partial-distinct aggregate
    (dedup within partitions before the exchange) — the scalable
    distinct shape, no collect_set materialization.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH partavg AS (
      SELECT l_partkey AS pk,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
             AS DOUBLE) AS avg_yearly,
           count(*) AS n_small
    FROM lineitem
    JOIN part    ON p_partkey = l_partkey
    JOIN partavg ON pk = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from orders of less than 20% of a part's
    average quantity (small-lot analysis).

    Plan shape: the correlated scalar subquery decorrelates into a
    grouped per-part average joined back on the part key — the
    textbook rewrite; the brand filter broadcasts. The per-part
    average divides an exact DECIMAL sum by an exact count, so the
    0.2× threshold is bit-identical cross-engine (quantities are
    integral doubles).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    partavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(partavg, F.col("pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           epoch_us(o_orderdate) AS o_date_us,
           CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE)
             AS o_totalprice,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers who placed orders totalling >300 units.

    Plan shape: the HAVING subquery is a grouped aggregate on the fact
    key joined back as a LEFT-SEMI (Spark plans IN-subquery exactly
    so); the qty re-aggregation groups on the same key as the semi
    join's build side, so AQE coalesces into one exchange chain;
    top-100 is TakeOrderedAndProject with the order key tie-break.
    Quantities sum as DECIMAL — integral and exact.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 300)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    return (
        li.join(big, F.col("l_orderkey") == F.col("big_ok"), "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                " o_orderdate)"
            ).alias("o_date_us"),
            F.round(_dec("o_totalprice"), 2).cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_banded_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity band revenue.

    Plan shape: the disjunction spans both tables, so Catalyst derives
    the table-local implied predicates (brand IN (…)  on part,
    quantity ranges on lineitem) for pushdown and keeps the full
    disjunction as the join residual — the classic "OR of ANDs"
    pushdown test. Part stays broadcast; one aggregate row out.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(band)
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q20_part_promotion_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey < 10
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 100
      )
    """,
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted): suppliers in a nation group who shipped a
    meaningful volume of 'red' parts in 1997 (partsupp-free rewrite:
    shipped quantity stands in for surplus stock).

    Plan shape: part prunes on the LIKE prefix (pushes as a range
    filter) and broadcasts; the year bound pushes into lineitem; the
    HAVING subquery is one grouped aggregate semi-joined into the
    supplier dimension — supplier is the small side, so the semi join
    broadcasts the aggregate's survivors.
    """
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_nationkey") < 10)
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    vol = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 100)
    )
    return s.join(
        F.broadcast(vol), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
      FROM per_supp GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM per_supp
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE late = 1 AND n_supp >= 2 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted): suppliers who alone held up finalized
    multi-supplier orders (their shipment late, every co-supplier on
    time) — the EXISTS/NOT-EXISTS double correlation, decorrelated.

    Plan shape: both correlated subqueries collapse into ONE grouped
    pass per (order, supplier) + one per order — two aggregates over
    the same exchange instead of two extra lineitem scans (the naive
    EXISTS plan re-reads lineitem twice). The supplier name join
    broadcasts; top-10 is TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    per_supp = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    return (
        per_supp.join(per_order, F.col("l_orderkey") == F.col("ok"))
        .where((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@query(
    "q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           count(*) AS numcust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
      )
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted): wealthy customers with no recent orders,
    bucketed by nation (stand-in for phone country code).

    Plan shape: the scalar average is a single-row broadcast (customer
    scanned once for it — at 100 TB the dimension scan is cheap and
    Catalyst reuses the cached exchange); NOT EXISTS is a LEFT-ANTI
    join against the date-filtered orders (filter pushes into the
    orders scan BEFORE the anti join, shrinking its build side ~3x).
    The average divides an exact DECIMAL sum by a count, then the
    comparison runs in double — identical IEEE result both engines.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )
