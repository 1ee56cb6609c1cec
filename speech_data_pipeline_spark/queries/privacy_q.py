"""Privacy/governance analytics: k-anonymity audit over
quasi-identifiers and deterministic differentially-private count
release — the checks a data-governance pipeline runs before exporting
aggregates from a 100 TB corpus.

The DP noise is the exact inverse-CDF Laplace transform of a
HASH-derived uniform (not an RNG): ``u`` comes from a 20-bit slice of
``md5(key)``, so the release is reproducible across engines and runs —
the property the oracle gate needs. (A production release would use a
keyed secret hash; the transform and plumbing are identical.) Float
parity: both engines evaluate the same literal ``-b·sign(u−½)·
ln(1−2|u−½|)`` tree over the same exactly-representable ``u``.

Reference parity: none (the reference has no governance surface);
beyond-reference analytics per SURVEY.md north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from speech_data_pipeline_spark.functions import trunc6
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.sources.catalog import load_table

#: k-anonymity threshold and the quasi-identifier coarsening: market
#: segment × nation × 2000-dollar balance band (cents-integer bands).
_KANON_K = 5
_BAND_LO_CENTS = -100_000
_BAND_WIDTH_CENTS = 200_000

#: Laplace scale b = sensitivity/ε = 1/1.0 for count release.
_DP_B = 1.0
#: 20-bit uniform grid: u = (m + 0.5) / 2^20, m = md5-hash mod 2^20 —
#: exactly representable, never 0 or 1 (the ln argument stays finite).
_DP_MOD = 1 << 20


@query(
    "privacy_k_anonymity",
    oracle=f"""
    WITH qi AS (
      SELECT c_mktsegment, c_nationkey,
             (CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
              - {_BAND_LO_CENTS}) // {_BAND_WIDTH_CENTS} AS bal_band
      FROM customer
    ), g AS (
      SELECT c_mktsegment, c_nationkey, bal_band, count(*) AS n
      FROM qi GROUP BY c_mktsegment, c_nationkey, bal_band
    )
    SELECT c_mktsegment, CAST(c_nationkey AS INTEGER) AS c_nationkey,
           CAST(bal_band AS BIGINT) AS bal_band, CAST(n AS BIGINT) AS n
    FROM g WHERE n < {_KANON_K}
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: every quasi-identifier group (segment ×
    nation × balance band) with fewer than k=5 members — the rows a
    release would have to suppress or generalize further.

    Plan shape: value-based integer banding in-row, ONE grouped count
    (map-side combinable; result bounded by the QI domain, not the
    corpus), a literal filter. At 100 TB this is the cheapest query in
    the registry — and the one that gates every other export.
    """
    c = load_table(spark, sf_dir, "customer")
    qi = c.select(
        "c_mktsegment",
        "c_nationkey",
        F.expr(
            f"(cast(floor(c_acctbal * 100.0 + 0.5) as bigint)"
            f" - {_BAND_LO_CENTS}) div {_BAND_WIDTH_CENTS}"
        ).alias("bal_band"),
    )
    return (
        qi.groupBy("c_mktsegment", "c_nationkey", "bal_band")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") < _KANON_K)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            F.col("bal_band").cast("long").alias("bal_band"),
            F.col("n").cast("long").alias("n"),
        )
    )


def _dp_counts_oracle() -> str:
    from speech_data_pipeline_spark.queries.mining_q import _hex15_sql

    h = _hex15_sql("md5(event_type)")
    return f"""
    WITH g AS (
      SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    ), u AS (
      SELECT event_type, n,
             (CAST({h} % {_DP_MOD} AS DOUBLE) + 0.5) / {_DP_MOD}.0 AS u
      FROM g
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           floor((CAST(n AS DOUBLE)
                  + (-{_DP_B}) * sign(u - 0.5)
                    * ln(1.0 - 2.0 * abs(u - 0.5)))
                 * 1000000.0) / 1000000.0 AS noisy_count
    FROM u
    """


@query("privacy_dp_counts", oracle=_dp_counts_oracle())
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 differentially-private event-type counts via the inverse-CDF
    Laplace mechanism over a hash-derived 20-bit uniform (reproducible
    noise — see module docstring; a real release keys the hash with a
    secret and drops the true count column).

    Plan shape: ONE grouped count (map-side combinable, |types| result
    rows); the noise transform is in-row scalar algebra over the tiny
    group table. Noise adds per GROUP, not per row — cost is
    independent of corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    m = (
        F.conv(F.substring(F.md5(F.col("event_type")), 1, 15), 16, 10)
        .cast("long")
        % _DP_MOD
    )
    u = (m.cast("double") + F.lit(0.5)) / F.lit(float(_DP_MOD))
    noise = (
        F.lit(-_DP_B)
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    )
    return g.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        trunc6(F.col("n").cast("double") + noise).alias("noisy_count"),
    )


#: l-diversity floor for the sensitive attribute within a QI group.
_LDIV_L = 3


@query(
    "privacy_l_diversity",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment, c.c_nationkey, o.o_orderpriority
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), cell AS (
      SELECT c_mktsegment, c_nationkey, o_orderpriority,
             CAST(count(*) AS BIGINT) AS c
      FROM j GROUP BY c_mktsegment, c_nationkey, o_orderpriority
    ), g AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS distinct_l,
             CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                                 * 1e9) AS BIGINT)) AS BIGINT) AS s_nano
      FROM cell GROUP BY c_mktsegment, c_nationkey
    )
    SELECT c_mktsegment, CAST(c_nationkey AS INTEGER) AS c_nationkey,
           n, distinct_l,
           floor((ln(CAST(n AS DOUBLE))
                  - CAST(s_nano AS DOUBLE) / 1e9 / CAST(n AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS entropy,
           CASE WHEN distinct_l >= {_LDIV_L} THEN 1 ELSE 0 END AS ok_l
    FROM g
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of order priority (the sensitive attribute)
    within each (segment × nation) quasi-identifier group: distinct-l
    plus entropy l-diversity, ``H = ln n − (Σ c·ln c)/n``.

    Exactness: the cross-row entropy accumulation is a sum of
    per-cell ``c·ln c`` terms each floor-quantized to INTEGER
    nano-nats first, so the aggregate crosses the shuffle exactly; the
    only float ops are one ln per cell and the final assembly.

    Plan shape: one key-partitioned join (orders re-keyed on custkey),
    one (QI, sensitive) grouped count (map-side combinable, bounded by
    the QI × sensitive domain), one QI-grouped rollup of that bounded
    cell table. No windows, no broadcasts beyond AQE's own choice.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(
        c.select("c_custkey", "c_mktsegment", "c_nationkey"),
        o["o_custkey"] == c["c_custkey"],
    )
    cell = j.groupBy(
        "c_mktsegment", "c_nationkey", "o_orderpriority"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    s_nano = F.sum(
        F.floor(
            F.col("c").cast("double")
            * F.log(F.col("c").cast("double"))
            * F.lit(1e9)
        ).cast("long")
    )
    g = cell.groupBy("c_mktsegment", "c_nationkey").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("distinct_l"),
        s_nano.cast("long").alias("s_nano"),
    )
    return g.select(
        "c_mktsegment",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        "n",
        "distinct_l",
        trunc6(
            F.log(F.col("n").cast("double"))
            - F.col("s_nano").cast("double")
            / F.lit(1e9)
            / F.col("n").cast("double")
        ).alias("entropy"),
        F.when(F.col("distinct_l") >= _LDIV_L, 1).otherwise(0).alias("ok_l"),
    )

#: t-closeness threshold (Li, Li & Venkatasubramanian 2007).
_TCLOSE_T = 0.2


@query(
    "privacy_t_closeness",
    oracle=f"""
    WITH qi AS (
      SELECT c_mktsegment AS seg, c_nationkey AS nat,
             (CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT)
              - {_BAND_LO_CENTS}) // {_BAND_WIDTH_CENTS} AS band
      FROM customer
    ),
    cell AS (
      SELECT seg, nat, band, CAST(count(*) AS BIGINT) AS cnt
      FROM qi GROUP BY seg, nat, band
    ),
    grp AS (
      SELECT seg, nat, CAST(sum(cnt) AS BIGINT) AS n_g
      FROM cell GROUP BY seg, nat
    ),
    bt AS (
      SELECT band, CAST(sum(cnt) AS BIGINT) AS c_band
      FROM cell GROUP BY band
    ),
    tot AS (
      SELECT CAST(sum(c_band) AS BIGINT) AS n_all,
             CAST(count(*) AS BIGINT) AS m
      FROM bt
    ),
    bands AS (
      SELECT band,
             CAST(sum(c_band) OVER (ORDER BY band
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_all
      FROM bt
    ),
    grid AS (
      SELECT g.seg, g.nat, g.n_g, b.band, b.cum_all,
             COALESCE(c.cnt, 0) AS cnt
      FROM grp g CROSS JOIN bands b
      LEFT JOIN cell c ON c.seg = g.seg AND c.nat = g.nat
                      AND c.band = b.band
    ),
    cum AS (
      SELECT seg, nat, n_g, band, cum_all,
             CAST(sum(cnt) OVER (PARTITION BY seg, nat ORDER BY band
                                 ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_g
      FROM grid
    ),
    emd AS (
      SELECT seg, nat, any_value(n_g) AS n_g,
             CAST(sum(abs(cum_g * tot.n_all - cum_all * n_g))
                  AS BIGINT) AS emd_num,
             any_value(tot.n_all) AS n_all, any_value(tot.m) AS m
      FROM cum CROSS JOIN tot GROUP BY seg, nat
    )
    SELECT seg AS c_mktsegment, CAST(nat AS INTEGER) AS c_nationkey,
           n_g,
           floor(CAST(emd_num AS DOUBLE)
                 / CAST(n_g * n_all * (m - 1) AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS emd,
           CASE WHEN floor(CAST(emd_num AS DOUBLE)
                           / CAST(n_g * n_all * (m - 1) AS DOUBLE)
                           * 1000000.0) / 1000000.0 > {_TCLOSE_T}
                THEN 1 ELSE 0 END AS violates_t
    FROM emd
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al. 2007), completing the
    release-gate triad with k-anonymity and entropy l-diversity: per
    QI group (segment × nation), the 1-D Earth Mover's Distance
    between the group's SENSITIVE-attribute distribution (the
    2000-dollar balance band — ordered, so EMD = mean |CDF gap|) and
    the global one; groups with EMD > t = 0.2 leak attribute skew
    even when k and l pass.

    Exactness: the CDF gap at band i is
    ``(cum_g·N − cum_all·n_g) / (n_g·N)`` — the numerator is exact
    BIGINT, summed absolute, ONE float division per group at output.

    Plan: grouped counts to the QI×band cell table, a QI-domain ×
    value-domain grid (~|segments|·|nations| × ~15 bands — attribute
    domains, never corpus rows) for the gap-persists-at-missing-bands
    cumulative, two bounded window sums, one grouped EMD aggregate.
    """
    c = load_table(spark, sf_dir, "customer")
    from pyspark.sql import Window

    qi = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nat"),
        F.expr(
            f"(cast(floor(c_acctbal * 100.0 + 0.5) as bigint)"
            f" - {_BAND_LO_CENTS}) div {_BAND_WIDTH_CENTS}"
        ).alias("band"),
    )
    cell = qi.groupBy("seg", "nat", "band").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    grp = cell.groupBy("seg", "nat").agg(F.sum("cnt").alias("n_g"))
    bt = cell.groupBy("band").agg(F.sum("cnt").alias("c_band"))
    tot = bt.agg(
        F.sum("c_band").alias("n_all"), F.count(F.lit(1)).alias("m")
    )
    w_all = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bands = bt.select(
        "band", F.sum("c_band").over(w_all).alias("cum_all")
    )
    grid = (
        grp.crossJoin(F.broadcast(bands))
        .join(cell, ["seg", "nat", "band"], "left")
        .select(
            "seg",
            "nat",
            "n_g",
            "band",
            "cum_all",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )
    w_g = (
        Window.partitionBy("seg", "nat")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "seg",
        "nat",
        "n_g",
        "band",
        "cum_all",
        F.sum("cnt").over(w_g).alias("cum_g"),
    )
    emd = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("seg", "nat")
        .agg(
            F.first("n_g").alias("n_g"),
            F.sum(
                F.abs(
                    F.col("cum_g") * F.col("n_all")
                    - F.col("cum_all") * F.col("n_g")
                )
            ).alias("emd_num"),
            F.first("n_all").alias("n_all"),
            F.first("m").alias("m"),
        )
    )
    emd_val = trunc6(
        F.col("emd_num").cast("double")
        / (F.col("n_g") * F.col("n_all") * (F.col("m") - 1)).cast(
            "double"
        )
    )
    return emd.select(
        F.col("seg").alias("c_mktsegment"),
        F.col("nat").cast("int").alias("c_nationkey"),
        F.col("n_g").cast("long").alias("n_g"),
        emd_val.alias("emd"),
        F.when(emd_val > _TCLOSE_T, 1).otherwise(0).alias("violates_t"),
    )
