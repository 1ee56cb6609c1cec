"""Feature-engineering encoders for tabular ML training data:
leakage-safe (out-of-fold) target encoding and weight-of-evidence /
information-value binning — the categorical-feature prep a training
pipeline runs before a GBDT/logistic fit.

Registry contract as everywhere: money is cents-integer at the scan,
per-(category, fold) partial sums cross the shuffle as DECIMAL(38,0),
and the encoded value is formed from exact sums with literal-identical
float expression trees (one divide / one ln per output), trunc6 on
output.

Reference parity: none (the reference has no tabular-ML surface);
beyond-reference analytics per SURVEY.md north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speech_data_pipeline_spark.functions import trunc6
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.sources.catalog import load_table

#: OOF target encoding: K folds by order-key residue (deterministic,
#: engine-independent), prior strength m (classic smoothing).
_TE_FOLDS = 5
_TE_M = 10.0

#: WOE binning: fixed-width acctbal bands in cents over TPC-H's
#: [-999.99, 9999.99] domain; +0.5/bin Laplace smoothing.
_WOE_BINS = 10
_WOE_LO_CENTS = -100_000
_WOE_WIDTH_CENTS = 110_000


@query(
    "feat_target_encode_oof",
    oracle=f"""
    WITH o AS (
      SELECT o_orderpriority AS category,
             o_orderkey % {_TE_FOLDS} AS fold,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), g AS (
      SELECT category, fold, count(*) AS n_cf, sum(cents) AS s_cf
      FROM o GROUP BY category, fold
    ), c AS (
      SELECT category, sum(n_cf) AS n_c, sum(s_cf) AS s_c
      FROM g GROUP BY category
    ), tot AS (
      SELECT sum(n_cf) AS n_t, sum(s_cf) AS s_t FROM g
    )
    SELECT g.category, CAST(g.fold AS BIGINT) AS fold,
           CAST(g.n_cf AS BIGINT) AS n_fold,
           CAST(c.n_c - g.n_cf AS BIGINT) AS n_oof,
           floor((CAST(c.s_c - g.s_cf AS DOUBLE)
                  + {_TE_M} * (CAST(t.s_t AS DOUBLE)
                               / CAST(t.n_t AS DOUBLE)))
                 / (CAST(c.n_c - g.n_cf AS DOUBLE) + {_TE_M})
                 * 1000000.0) / 1000000.0 AS enc_cents
    FROM g JOIN c USING (category) CROSS JOIN tot t
    """,
)
def feat_target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold out-of-fold target encoding of order priority by order
    value: each (category, fold) cell is encoded from every OTHER
    fold's rows (``(Σ_cat − Σ_fold) / (n_cat − n_fold)``, smoothed
    toward the global prior with strength m) — the leakage-safe mean
    encoding scheme (a row never sees its own fold's target).

    Plan shape: ONE corpus shuffle — the (category, fold) grouped sum
    (map-side combinable, K·|categories| result rows). Per-category
    totals are a window over that bounded cell table (partitioned by
    category); the global prior is a 1-row broadcast scalar. The
    out-of-fold trick is pure algebra on the cell sums — no per-row
    second pass, no fold-excluding self-join of the corpus.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("category"),
        (F.col("o_orderkey") % _TE_FOLDS).alias("fold"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    g = base.groupBy("category", "fold").agg(
        F.count(F.lit(1)).alias("n_cf"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s_cf"),
    )
    wc = Window.partitionBy("category")
    g = g.withColumn("n_c", F.sum("n_cf").over(wc)).withColumn(
        "s_c", F.sum("s_cf").over(wc)
    )
    tot = g.groupBy().agg(
        F.sum("n_cf").alias("n_t"), F.sum("s_cf").alias("s_t")
    )
    j = g.crossJoin(F.broadcast(tot))
    prior = F.col("s_t").cast("double") / F.col("n_t").cast("double")
    enc = (
        (F.col("s_c") - F.col("s_cf")).cast("double") + F.lit(_TE_M) * prior
    ) / ((F.col("n_c") - F.col("n_cf")).cast("double") + F.lit(_TE_M))
    return j.select(
        "category",
        F.col("fold").cast("long").alias("fold"),
        F.col("n_cf").cast("long").alias("n_fold"),
        (F.col("n_c") - F.col("n_cf")).cast("long").alias("n_oof"),
        trunc6(enc).alias("enc_cents"),
    )


@query(
    "feat_woe_iv",
    oracle=f"""
    WITH opens AS (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      GROUP BY o_custkey
    ), c AS (
      SELECT least({_WOE_BINS - 1},
                   (CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
                    - {_WOE_LO_CENTS}) // {_WOE_WIDTH_CENTS}) AS bin,
             CASE WHEN o.o_custkey IS NULL THEN 0 ELSE 1 END AS good
      FROM customer LEFT JOIN opens o ON o.o_custkey = c_custkey
    ), g AS (
      SELECT bin, sum(good) AS n_good,
             count(*) - sum(good) AS n_bad
      FROM c GROUP BY bin
    ), tot AS (
      SELECT sum(n_good) AS g_tot, sum(n_bad) AS b_tot FROM g
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n_good AS BIGINT) AS n_good,
           CAST(n_bad AS BIGINT) AS n_bad,
           floor(ln(((CAST(n_good AS DOUBLE) + 0.5)
                     / (CAST(g_tot AS DOUBLE) + {_WOE_BINS * 0.5}))
                    / ((CAST(n_bad AS DOUBLE) + 0.5)
                       / (CAST(b_tot AS DOUBLE) + {_WOE_BINS * 0.5})))
                 * 1000000.0) / 1000000.0 AS woe,
           floor((((CAST(n_good AS DOUBLE) + 0.5)
                   / (CAST(g_tot AS DOUBLE) + {_WOE_BINS * 0.5}))
                  - ((CAST(n_bad AS DOUBLE) + 0.5)
                     / (CAST(b_tot AS DOUBLE) + {_WOE_BINS * 0.5})))
                 * ln(((CAST(n_good AS DOUBLE) + 0.5)
                       / (CAST(g_tot AS DOUBLE) + {_WOE_BINS * 0.5}))
                      / ((CAST(n_bad AS DOUBLE) + 0.5)
                         / (CAST(b_tot AS DOUBLE) + {_WOE_BINS * 0.5})))
                 * 1000000.0) / 1000000.0 AS iv_term
    FROM g CROSS JOIN tot
    ORDER BY bin
    """,
)
def feat_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value binning of customer
    balance against the has-open-order label — the standard scorecard
    encoding (``WOE = ln(P(bin|good) / P(bin|bad))``, Laplace-smoothed
    0.5 per bin) with each bin's IV contribution.

    Plan shape: the label is a grouped-distinct open-order key table
    left-joined to customers (both sides hash on custkey — no
    broadcast assumption; at 100 TB both are large); binning is
    value-based integer projection (no ntile/global sort); one
    ≤10-row grouped count + a 1-row total attach. IV is emitted
    PER-BIN (iv_term) and never summed across bins in-engine — a
    cross-row float sum would be fold-order-dependent; the consumer
    adds ≤10 truncated terms.
    """
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    opens = (
        o.where(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("o_custkey")
    )
    cents = F.floor(F.col("c_acctbal") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    c = (
        cust.join(opens, cust.c_custkey == opens.o_custkey, "left")
        .select(
            F.least(
                F.lit(_WOE_BINS - 1).cast("long"),
                F.expr(
                    f"(cast(floor(c_acctbal * 100.0 + 0.5) as bigint)"
                    f" - {_WOE_LO_CENTS}) div {_WOE_WIDTH_CENTS}"
                ),
            ).alias("bin"),
            F.when(F.col("o_custkey").isNull(), 0).otherwise(1).alias("good"),
        )
    )
    g = c.groupBy("bin").agg(
        F.sum("good").alias("n_good"),
        (F.count(F.lit(1)) - F.sum("good")).alias("n_bad"),
    )
    tot = g.groupBy().agg(
        F.sum("n_good").alias("g_tot"), F.sum("n_bad").alias("b_tot")
    )
    j = g.crossJoin(F.broadcast(tot))
    half = F.lit(0.5)
    sm = F.lit(_WOE_BINS * 0.5)
    pg = (F.col("n_good").cast("double") + half) / (
        F.col("g_tot").cast("double") + sm
    )
    pb = (F.col("n_bad").cast("double") + half) / (
        F.col("b_tot").cast("double") + sm
    )
    woe = F.log(pg / pb)
    return j.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n_good").cast("long").alias("n_good"),
        F.col("n_bad").cast("long").alias("n_bad"),
        trunc6(woe).alias("woe"),
        trunc6((pg - pb) * woe).alias("iv_term"),
    ).orderBy("bin")
