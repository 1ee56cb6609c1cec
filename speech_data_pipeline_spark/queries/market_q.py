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
