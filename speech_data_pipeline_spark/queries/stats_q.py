"""Statistical analytics queries: single-pass Pearson correlation
matrix and Welch's two-sample t-test.

Both are built on the moment-sum identity: quantize each measure to an
integer grid at the scan (cents / milli-units), carry ONLY integer
moment sums ``(n, Σx, Σx², Σxy)`` across the shuffle as
``DECIMAL(38,0)`` (exact at any corpus size — Σx² of cent-scaled
prices overflows BIGINT past ~10⁵ rows), and form the statistic from
the exact sums with one cast-to-double per term. Every float op is
then a single IEEE divide/sqrt over identical operands on any engine
or partitioning — the classic "corr in one pass, exact under
re-aggregation" shape a warehouse needs at 100 TB.

Reference parity: none (the reference has no statistics surface);
beyond-reference analytics per SURVEY.md north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speech_data_pipeline_spark.functions import trunc6
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.queries.text_q import _hex7_to_int_sql
from speech_data_pipeline_spark.sources.catalog import load_table

#: Correlation-matrix measures (all quantized ×100 → exact integers:
#: quantity is integral, price has 2dp cents, discount/tax have 2dp).
_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_oracle() -> str:
    cols = _CORR_COLS
    qsel = ", ".join(
        f"CAST(floor({c} * 100.0 + 0.5) AS BIGINT) AS q{i}"
        for i, c in enumerate(cols)
    )
    sums = ["count(*) AS n"]
    for i in range(len(cols)):
        sums.append(f"sum(q{i}) AS s{i}")
        for j in range(i, len(cols)):
            sums.append(f"sum(q{i} * q{j}) AS s{i}{j}")
    selects = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            num = f"CAST(n * s{i}{j} - s{i} * s{j} AS DOUBLE)"
            dx = f"CAST(n * s{i}{i} - s{i} * s{i} AS DOUBLE)"
            dy = f"CAST(n * s{j}{j} - s{j} * s{j} AS DOUBLE)"
            selects.append(
                f"SELECT '{cols[i]}' AS col_x, '{cols[j]}' AS col_y,"
                f" floor(({num} / sqrt({dx} * {dy})) * 1000000.0)"
                f" / 1000000.0 AS corr, CAST(n AS BIGINT) AS n FROM s"
            )
    body = " UNION ALL ".join(selects)
    return f"""
    WITH q AS (SELECT {qsel} FROM lineitem),
    s AS (SELECT {", ".join(sums)} FROM q)
    {body}
    """


@query("stats_corr_matrix", oracle=_corr_oracle())
def stats_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs Pearson correlation over the lineitem measures in ONE
    scan and ONE 1-row aggregate.

    The 14 moment sums ride a single partial-aggregate tree (map-side
    combine, a one-row final state); the 6 output rows are exploded
    from that single row — no per-pair scans, no second shuffle.
    """
    cols = list(_CORR_COLS)
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        *[
            F.floor(F.col(c) * F.lit(100.0) + F.lit(0.5))
            .cast("long")
            .alias(f"q{i}")
            for i, c in enumerate(cols)
        ]
    )
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for i in range(len(cols)):
        aggs.append(
            F.sum(F.col(f"q{i}").cast("decimal(38,0)")).alias(f"s{i}")
        )
        for j in range(i, len(cols)):
            aggs.append(
                F.sum(
                    (F.col(f"q{i}") * F.col(f"q{j}")).cast("decimal(38,0)")
                ).alias(f"s{i}{j}")
            )
    one = q.agg(*aggs)

    def corr(i: int, j: int):
        num = (F.col("n") * F.col(f"s{i}{j}") - F.col(f"s{i}") * F.col(f"s{j}")).cast(
            "double"
        )
        dx = (F.col("n") * F.col(f"s{i}{i}") - F.col(f"s{i}") * F.col(f"s{i}")).cast(
            "double"
        )
        dy = (F.col("n") * F.col(f"s{j}{j}") - F.col(f"s{j}") * F.col(f"s{j}")).cast(
            "double"
        )
        return trunc6(num / F.sqrt(dx * dy))

    pairs = F.array(
        *[
            F.struct(
                F.lit(cols[i]).alias("col_x"),
                F.lit(cols[j]).alias("col_y"),
                corr(i, j).alias("corr"),
            )
            for i in range(len(cols))
            for j in range(i + 1, len(cols))
        ]
    )
    return one.select(
        F.explode(pairs).alias("p"), F.col("n").cast("long").alias("n")
    ).select("p.col_x", "p.col_y", "p.corr", "n")


#: Welch's t-test arms: does `purchase` carry a different mean value
#: than `view`?
_AB_TREAT = "purchase"
_AB_CONTROL = "view"


@query(
    "ab_welch_ttest",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS mv
      FROM events
      WHERE event_type IN ('{_AB_TREAT}', '{_AB_CONTROL}')
    ), s AS (
      SELECT
        sum(CASE WHEN event_type = '{_AB_TREAT}' THEN 1 ELSE 0 END) AS nt,
        sum(CASE WHEN event_type = '{_AB_TREAT}' THEN mv ELSE 0 END) AS st1,
        sum(CASE WHEN event_type = '{_AB_TREAT}' THEN mv * mv ELSE 0 END) AS st2,
        sum(CASE WHEN event_type = '{_AB_CONTROL}' THEN 1 ELSE 0 END) AS nc,
        sum(CASE WHEN event_type = '{_AB_CONTROL}' THEN mv ELSE 0 END) AS sc1,
        sum(CASE WHEN event_type = '{_AB_CONTROL}' THEN mv * mv ELSE 0 END) AS sc2
      FROM q
    ), d AS (
      SELECT CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_control,
             CAST(st1 AS DOUBLE) / CAST(nt AS DOUBLE) / 1000.0 AS mean_treat,
             CAST(sc1 AS DOUBLE) / CAST(nc AS DOUBLE) / 1000.0 AS mean_control,
             CAST(nt * st2 - st1 * st1 AS DOUBLE)
               / (CAST(nt AS DOUBLE) * CAST(nt - 1 AS DOUBLE)) AS vt,
             CAST(nc * sc2 - sc1 * sc1 AS DOUBLE)
               / (CAST(nc AS DOUBLE) * CAST(nc - 1 AS DOUBLE)) AS vc
      FROM s
    )
    SELECT n_treat, n_control,
           floor(mean_treat * 1000000.0) / 1000000.0 AS mean_treat,
           floor(mean_control * 1000000.0) / 1000000.0 AS mean_control,
           floor(((mean_treat - mean_control)
                  / (sqrt(vt / n_treat + vc / n_control) / 1000.0))
                 * 1000000.0) / 1000000.0 AS t_stat,
           floor(((vt / n_treat + vc / n_control)
                   * (vt / n_treat + vc / n_control)
                  / ((vt / n_treat) * (vt / n_treat) / (n_treat - 1)
                     + (vc / n_control) * (vc / n_control) / (n_control - 1)))
                 * 1000000.0) / 1000000.0 AS df
    FROM d
    """,
)
def ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event-type arms, in
    one conditional-aggregation pass (1-row output).

    Sample variances come from the exact integer sums
    ``(n·Σx² − (Σx)²)/(n(n−1))`` on the milli-unit grid; the t statistic
    and Welch–Satterthwaite df are pure double expressions over those
    exact moments — bit-identical under any shuffle order. The /1000
    factors de-scale the milli-unit grid back to value units (t itself
    is scale-free; means are reported in natural units).
    """
    ev = load_table(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    q = ev.where(
        F.col("event_type").isin(_AB_TREAT, _AB_CONTROL)
    ).select("event_type", mv.alias("mv"))
    t_arm = F.col("event_type") == _AB_TREAT
    c_arm = F.col("event_type") == _AB_CONTROL
    mv2 = (F.col("mv") * F.col("mv")).cast("decimal(38,0)")
    mvd = F.col("mv").cast("decimal(38,0)")
    zero = F.lit(0).cast("decimal(38,0)")
    s = q.agg(
        F.sum(F.when(t_arm, 1).otherwise(0)).alias("nt"),
        F.sum(F.when(t_arm, mvd).otherwise(zero)).alias("st1"),
        F.sum(F.when(t_arm, mv2).otherwise(zero)).alias("st2"),
        F.sum(F.when(c_arm, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(c_arm, mvd).otherwise(zero)).alias("sc1"),
        F.sum(F.when(c_arm, mv2).otherwise(zero)).alias("sc2"),
    )
    nt_d = F.col("nt").cast("double")
    nc_d = F.col("nc").cast("double")
    d = s.select(
        F.col("nt").cast("long").alias("n_treat"),
        F.col("nc").cast("long").alias("n_control"),
        (F.col("st1").cast("double") / nt_d / F.lit(1000.0)).alias("mean_treat"),
        (F.col("sc1").cast("double") / nc_d / F.lit(1000.0)).alias("mean_control"),
        (
            (F.col("nt") * F.col("st2") - F.col("st1") * F.col("st1")).cast("double")
            / (nt_d * (F.col("nt") - 1).cast("double"))
        ).alias("vt"),
        (
            (F.col("nc") * F.col("sc2") - F.col("sc1") * F.col("sc1")).cast("double")
            / (nc_d * (F.col("nc") - 1).cast("double"))
        ).alias("vc"),
    )
    vt_n = F.col("vt") / F.col("n_treat")
    vc_n = F.col("vc") / F.col("n_control")
    se = vt_n + vc_n
    return d.select(
        "n_treat",
        "n_control",
        trunc6(F.col("mean_treat")).alias("mean_treat"),
        trunc6(F.col("mean_control")).alias("mean_control"),
        trunc6(
            (F.col("mean_treat") - F.col("mean_control"))
            / (F.sqrt(se) / F.lit(1000.0))
        ).alias("t_stat"),
        trunc6(
            se * se
            / (
                vt_n * vt_n / (F.col("n_treat") - 1)
                + vc_n * vc_n / (F.col("n_control") - 1)
            )
        ).alias("df"),
    )


@query(
    "stats_linreg",
    oracle="""
    WITH q AS (
      SELECT CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qx,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS qy
      FROM lineitem
    ), s AS (
      SELECT count(*) AS n, sum(qx) AS sx, sum(qy) AS sy,
             sum(qx * qx) AS sxx, sum(qy * qy) AS syy,
             sum(qx * qy) AS sxy
      FROM q
    ), d AS (
      SELECT CAST(n AS BIGINT) AS n,
             CAST(n * sxy - sx * sy AS DOUBLE) AS num,
             CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
             CAST(n * syy - sy * sy AS DOUBLE) AS dy,
             CAST(sy * sxx - sx * sxy AS DOUBLE) AS inum
      FROM s
    )
    SELECT n,
           floor((num / dx) * 1000000.0) / 1000000.0 AS slope,
           floor((inum / dx / 100.0) * 1000000.0) / 1000000.0 AS intercept,
           floor(((num / sqrt(dx * dy)) * (num / sqrt(dx * dy)))
                 * 1000000.0) / 1000000.0 AS r2
    FROM d
    """,
)
def stats_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS of extended price on quantity in one pass: the
    same exact DECIMAL(38,0) moment sums as :func:`stats_corr_matrix`
    give slope ``(nΣxy−ΣxΣy)/(nΣx²−(Σx)²)``, intercept, and r² with a
    single cast-to-double per exact term — bit-identical under any
    shuffle (both variables share the ×100 grid, so the slope is
    already in natural units; the intercept de-scales by 100).
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        F.floor(F.col("l_quantity") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("qx"),
        F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("qy"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = q.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("qx"))).alias("sx"),
        F.sum(dec(F.col("qy"))).alias("sy"),
        F.sum(dec(F.col("qx") * F.col("qx"))).alias("sxx"),
        F.sum(dec(F.col("qy") * F.col("qy"))).alias("syy"),
        F.sum(dec(F.col("qx") * F.col("qy"))).alias("sxy"),
    )
    d = s.select(
        F.col("n").cast("long").alias("n"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        .alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double")
        .alias("dx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("dy"),
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
        .cast("double")
        .alias("inum"),
    )
    corr = F.col("num") / F.sqrt(F.col("dx") * F.col("dy"))
    return d.select(
        "n",
        trunc6(F.col("num") / F.col("dx")).alias("slope"),
        trunc6(F.col("inum") / F.col("dx") / F.lit(100.0)).alias("intercept"),
        trunc6(corr * corr).alias("r2"),
    )


#: PSI drift bins: fixed-width over [0, 450) in value units, with
#: bin 9 as the overflow bin (>= 450) — fixed edges so the bin id is
#: pure integer arithmetic on the milli-grid.
_PSI_BINS = 10
_PSI_WIDTH_MILLI = 50_000  # 50.0 value units per bin


@query(
    "drift_psi_value",
    oracle=f"""
    WITH q AS (
      SELECT event_type,
             least(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)
                   // {_PSI_WIDTH_MILLI}, {_PSI_BINS - 1}) AS bin
      FROM events WHERE event_type IN ('purchase', 'view')
    ), c AS (
      SELECT bin,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nv
      FROM q GROUP BY bin
    ), t AS (
      SELECT CAST(sum(np) AS BIGINT) AS tp, CAST(sum(nv) AS BIGINT) AS tv
      FROM c
    ), terms AS (
      SELECT bin, np, nv,
             ((np + 1.0) / (tp + {_PSI_BINS}.0) - (nv + 1.0) / (tv + {_PSI_BINS}.0))
               * ln(((np + 1.0) / (tp + {_PSI_BINS}.0))
                    / ((nv + 1.0) / (tv + {_PSI_BINS}.0))) AS term
      FROM c CROSS JOIN t
    )
    SELECT CAST(bin AS BIGINT) AS bin, CAST(np AS BIGINT) AS n_treat,
           CAST(nv AS BIGINT) AS n_control,
           floor(term * 1000000.0) / 1000000.0 AS psi_term,
           floor(sum(term) OVER () * 1000000.0) / 1000000.0 AS psi_total
    FROM terms
    """,
)
def drift_psi_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the `purchase` and `view`
    value distributions over fixed-width bins — the standard
    production drift monitor (PSI > 0.25 ⇒ significant shift).

    Bin ids are integer milli-grid divisions (map-side); one grouped
    conditional count; bin totals are a 1-row broadcast. Proportions
    are Laplace-smoothed ((n+1)/(N+bins)) so a bin populated by only
    ONE arm — the most drifted case — still contributes a finite term
    instead of being dropped. Each PSI term is a per-row IEEE
    expression over exact integer counts, and the total is a sum over
    the 10-row bin table (the OVER () window is bounded by the bin
    count, never the corpus).
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.where(F.col("event_type").isin("purchase", "view")).select(
        "event_type",
        F.least(
            F.expr(
                f"cast(floor(value * 1000.0 + 0.5) as bigint)"
                f" div {_PSI_WIDTH_MILLI}"
            ),
            F.lit(_PSI_BINS - 1).cast("long"),
        ).alias("bin"),
    )
    c = q.groupBy("bin").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "np"
        ),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("nv"),
    )
    t = c.agg(
        F.sum("np").cast("long").alias("tp"),
        F.sum("nv").cast("long").alias("tv"),
    )
    p = (F.col("np") + F.lit(1.0)) / (F.col("tp") + F.lit(float(_PSI_BINS)))
    v = (F.col("nv") + F.lit(1.0)) / (F.col("tv") + F.lit(float(_PSI_BINS)))
    terms = (
        c.crossJoin(F.broadcast(t))
        .select(
            F.col("bin").cast("long").alias("bin"),
            F.col("np").cast("long").alias("n_treat"),
            F.col("nv").cast("long").alias("n_control"),
            ((p - v) * F.log(p / v)).alias("term"),
        )
    )
    return terms.select(
        "bin",
        "n_treat",
        "n_control",
        trunc6(F.col("term")).alias("psi_term"),
        trunc6(
            F.sum("term").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        ).alias("psi_total"),
    )


@query(
    "chisq_type_by_day",
    oracle="""
    WITH q AS (
      SELECT event_type,
             (epoch_us(ts) // 86400000000) % 7 AS dow
      FROM events
    ), o AS (
      SELECT event_type, dow, count(*) AS obs FROM q GROUP BY 1, 2
    ), r AS (SELECT event_type, sum(obs) AS rt FROM o GROUP BY 1),
    c AS (SELECT dow, sum(obs) AS ct FROM o GROUP BY 1),
    n AS (SELECT CAST(sum(obs) AS BIGINT) AS tot FROM o),
    cells AS (
      SELECT o.event_type, o.dow, o.obs,
             CAST(r.rt * c.ct AS DOUBLE) / tot AS expected
      FROM o JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN n
    )
    SELECT event_type, CAST(dow AS BIGINT) AS dow, CAST(obs AS BIGINT) AS obs,
           floor(expected * 1000000.0) / 1000000.0 AS expected,
           floor(sum((obs - expected) * (obs - expected) / expected) OVER ()
                 * 1000000.0) / 1000000.0 AS chi2_total
    FROM cells
    """,
)
def chisq_type_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test: event type × day-of-week.

    The contingency table is one grouped count; marginals re-aggregate
    the |types|×7 cell table (never the corpus); expected counts are
    exact integer products with one divide; the χ² sum runs over the
    bounded cell table. The categorical drift/independence monitor
    beside the numeric PSI.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        (F.expr("(ts div 1000) div 86400000000") % 7).alias("dow"),
    )
    o = q.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("obs"))
    r = o.groupBy("event_type").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("dow").agg(F.sum("obs").alias("ct"))
    n = o.agg(F.sum("obs").cast("long").alias("tot"))
    cells = (
        o.join(r, "event_type")
        .join(c, "dow")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            F.col("dow").cast("long").alias("dow"),
            F.col("obs").cast("long").alias("obs"),
            ((F.col("rt") * F.col("ct")).cast("double") / F.col("tot")).alias(
                "expected"
            ),
        )
    )
    dev = (F.col("obs") - F.col("expected")) * (
        F.col("obs") - F.col("expected")
    ) / F.col("expected")
    return cells.select(
        "event_type",
        "dow",
        "obs",
        trunc6(F.col("expected")).alias("expected"),
        trunc6(
            F.sum(dev).over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        ).alias("chi2_total"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------

#: Number of bootstrap replicates.
_BOOT_B = 200

#: Poisson(1) inverse-CDF thresholds in ppm: a uniform u ∈ [0, 1e6)
#: maps to weight w = #{t in _POIS_PPM : u >= t}. Truncated at w = 9
#: (P ≈ 1e-6·10⁻¹ beyond — identical truncation on both engines).
_POIS_PPM = (367879, 735758, 919698, 981011, 996340, 999405, 999916,
             999989, 999998)

#: 1-based positions of the 2.5% / 97.5% bounds in the ascending
#: B=200 replicate-mean list: floor(0.025·B)+1 and ceil(0.975·B).
_BOOT_LO_POS = 6
_BOOT_HI_POS = 195

#: Per-replicate affine uniform families over one 28-bit md5 base hash
#: (the minhash_coeffs construction): u_b = (a_b·h + c_b) mod p mod 1e6
#: — ONE md5 per row instead of B, the dominant bootstrap cost at any
#: scale. p = largest prime < 2^28; a·h + c < 2^56, no overflow.
_BOOT_P = 268435399


def _boot_coeffs(b: int = _BOOT_B) -> list[tuple[int, int]]:
    import random

    rng = random.Random(20240815)
    return [
        (rng.randrange(1, _BOOT_P), rng.randrange(0, _BOOT_P))
        for _ in range(b)
    ]


def _pois_case_sql(u_sql: str) -> str:
    """CASE ladder mapping a ppm uniform to a Poisson(1) weight —
    shared text for the DuckDB oracle."""
    arms = " ".join(
        f"WHEN {u_sql} < {t} THEN {k}" for k, t in enumerate(_POIS_PPM)
    )
    return f"CASE {arms} ELSE {len(_POIS_PPM)} END"


@query(
    "eval_bootstrap_ci",
    oracle=f"""
    WITH base AS (
      SELECT {_hex7_to_int_sql("md5('boot:' || CAST(o_orderkey AS VARCHAR))")}
               AS h,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), w AS (
      SELECT b,
             {_pois_case_sql(
                 "((([" + ", ".join(str(a) for a, _ in _boot_coeffs()) + "])[b + 1]"
                 " * h"
                 " + ([" + ", ".join(str(c) for _, c in _boot_coeffs()) + "])[b + 1])"
                 f" % {_BOOT_P}) % 1000000"
             )} AS wt,
             cents
      FROM base
      CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b)
    ), reps AS (
      SELECT b, CAST(sum(wt) AS BIGINT) AS nw,
             CAST(sum(wt * cents) AS HUGEINT) AS sw
      FROM w GROUP BY b
    ), means AS (
      SELECT (1000000::HUGEINT * sw) // nw AS mean_ucents FROM reps
      WHERE nw > 0
    ), sorted AS (
      SELECT list_sort(list(CAST(mean_ucents AS BIGINT))) AS l,
             count(*) AS nb
      FROM means
    ), fullagg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS HUGEINT) AS s
      FROM orders
    )
    SELECT fullagg.n AS n_orders, CAST(sorted.nb AS BIGINT) AS n_boot,
           floor(CAST(fullagg.s AS DOUBLE) / CAST(fullagg.n AS DOUBLE)
                 / 100.0 * 1000000.0) / 1000000.0 AS mean_price,
           floor(CAST(sorted.l[{_BOOT_LO_POS}] AS DOUBLE) / 100000000.0
                 * 1000000.0) / 1000000.0 AS ci_lo,
           floor(CAST(sorted.l[{_BOOT_HI_POS}] AS DOUBLE) / 100000000.0
                 * 1000000.0) / 1000000.0 AS ci_hi
    FROM sorted CROSS JOIN fullagg
    """,
)
def eval_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% CI for the mean order price via the POISSON BOOTSTRAP —
    the standard single-pass distributed resampling scheme (each row's
    multiplicity in replicate b is an independent Poisson(1) draw, so
    no replicate ever needs a global sample-with-replacement pass).

    Determinism: the draw is ONE seeded md5 base hash per row pushed
    through B Python-precomputed affine families (the minhash_coeffs
    construction — pairwise-independent uniforms, B× less hashing than
    md5-per-replicate, which dominated the bench at 45s/ sf0.1),
    mapped through the Poisson(1) inverse-CDF ppm ladder — identical
    on any engine and any partitioning. Replicate means are quantized to integer
    micro-cents by floor-division BEFORE the percentile pick, and the
    bounds are fixed 1-based positions in the ascending B-list.

    Plan shape: explode ×B is pipelined (never materialized) and
    collapses map-side into ≤B groups per task (partial aggregation),
    so the shuffle carries O(B · n_partitions) rows regardless of
    corpus size; the percentile pick sorts a bounded B-element array
    on the driver side of a 1-row aggregate. At 100 TB the only real
    cost is ONE md5 plus B affine maps per row — map-parallel integer
    CPU, no extra shuffle volume.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    coeffs = _boot_coeffs()
    base = o.select(
        "cents",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot:"),
                        F.col("o_orderkey").cast("string"),
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    a_arr = F.array(*[F.lit(a) for a, _ in coeffs])
    c_arr = F.array(*[F.lit(c) for _, c in coeffs])
    rep = base.select(
        "cents",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u = (
        (
            F.element_at(a_arr, F.col("b") + 1) * F.col("h")
            + F.element_at(c_arr, F.col("b") + 1)
        )
        % F.lit(_BOOT_P)
        % 1000000
    )
    wt = F.lit(len(_POIS_PPM))
    for k in range(len(_POIS_PPM) - 1, -1, -1):
        wt = F.when(u < _POIS_PPM[k], k).otherwise(wt)
    reps = (
        rep.select("b", "cents", wt.alias("wt"))
        .groupBy("b")
        .agg(
            F.sum("wt").cast("long").alias("nw"),
            F.sum(
                (F.col("wt") * F.col("cents")).cast("decimal(38,0)")
            ).alias("sw"),
        )
        .where(F.col("nw") > 0)
    )
    means = reps.select(
        F.expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sw) div nw AS LONG)")
        .alias("mean_ucents")
    )
    sorted_ = means.agg(
        F.array_sort(F.collect_list("mean_ucents")).alias("l"),
        F.count(F.lit(1)).alias("nb"),
    )
    full = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
    )
    return sorted_.crossJoin(F.broadcast(full)).select(
        F.col("n").alias("n_orders"),
        F.col("nb").cast("long").alias("n_boot"),
        trunc6(F.col("s").cast("double") / F.col("n").cast("double")
               / F.lit(100.0)).alias("mean_price"),
        trunc6(
            F.element_at("l", _BOOT_LO_POS).cast("double") / F.lit(1e8)
        ).alias("ci_lo"),
        trunc6(
            F.element_at("l", _BOOT_HI_POS).cast("double") / F.lit(1e8)
        ).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov test
# ---------------------------------------------------------------------------

_KS_A = "purchase"
_KS_B = "view"

#: Shared DuckDB CTE: the two-sample DISTINCT cent-value table used by
#: the KS / Wasserstein / Mann-Whitney oracles — extend this, don't
#: copy (the _cos_pair_sql convention).


def _two_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of :data:`_TWO_SAMPLE_CTE`: collapse the corpus to
    the DISTINCT cent-value table ``(v, c1, c2)`` for the purchase /
    view two-sample battery. ONE definition so the quantization and
    arm filter cannot drift between the three tests."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.where(F.col("event_type").isin(_KS_A, _KS_B)).select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    return q.groupBy("v").agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0)).alias(
            "c1"
        ),
        F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0)).alias(
            "c2"
        ),
    )


_TWO_SAMPLE_CTE = f"""q AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
    ), byv AS (
      SELECT v,
             sum(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END) AS c2
      FROM q GROUP BY v
    )"""



@query(
    "stats_ks_test",
    oracle=f"""
    WITH {_TWO_SAMPLE_CTE}, run AS (
      SELECT sum(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc1,
             sum(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc2,
             sum(c1) OVER () AS n1,
             sum(c2) OVER () AS n2
      FROM byv
    ), m AS (
      SELECT max(abs(CAST(cc1 AS HUGEINT) * n2 - CAST(cc2 AS HUGEINT) * n1)) AS num,
             CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
      FROM run
    )
    SELECT n1, n2,
           floor(CAST(num AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS ks,
           floor(1.36 * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
                 * 1000000.0) / 1000000.0 AS crit,
           CASE WHEN floor(CAST(num AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                 * 1000000.0)
                 > floor(1.36 * sqrt((CAST(n1 AS DOUBLE)
                       + CAST(n2 AS DOUBLE))
                     / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
                     * 1000000.0)
                THEN 1 ELSE 0 END AS reject
    FROM m
    """,
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    `purchase` and `view` value distributions on the cent grid:
    ``D = max_v |F₁(v) − F₂(v)|`` cleared to integers —
    ``max |cc₁·n₂ − cc₂·n₁| / (n₁·n₂)`` — with the α=0.05 large-sample
    critical value ``1.36·√((n₁+n₂)/(n₁n₂))`` and a reject flag
    compared on the SAME trunc6 ppm grid both engines share.

    Plan shape: one grouped count collapses the corpus to the
    DISTINCT cent-value table (bounded by the value domain — the
    eval_roc_auc contract); running ECDF sums over that bounded table
    (whitelisted partition-less window); one max aggregate. The max
    numerator is exact integer arithmetic — no float ECDF ever
    crosses a shuffle.
    """
    byv = _two_sample_counts(spark, sf_dir)
    w_run = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    run = byv.select(
        F.sum("c1").over(w_run).alias("cc1"),
        F.sum("c2").over(w_run).alias("cc2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = run.agg(
        F.max(
            F.abs(d38("cc1") * d38("n2") - d38("cc2") * d38("n1"))
        ).alias("num"),
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    ks_ppm = F.floor(
        F.col("num").cast("double") / (dbl("n1") * dbl("n2")) * F.lit(1e6)
    )
    crit_ppm = F.floor(
        F.lit(1.36)
        * F.sqrt((dbl("n1") + dbl("n2")) / (dbl("n1") * dbl("n2")))
        * F.lit(1e6)
    )
    return m.select(
        "n1",
        "n2",
        (ks_ppm / F.lit(1e6)).alias("ks"),
        (crit_ppm / F.lit(1e6)).alias("crit"),
        F.when(ks_ppm > crit_ppm, 1).otherwise(0).alias("reject"),
    )


# ---------------------------------------------------------------------------
# Gini concentration of customer revenue
# ---------------------------------------------------------------------------

#: Gini value grid: customer revenue quantized to whole dollars keeps
#: the distinct-value table bounded by the value DOMAIN (the
#: eval_roc_auc contract) at any corpus size.
_GINI_GRID = 100  # cents per grid unit


@query(
    "stats_gini_revenue",
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) // {_GINI_GRID} AS v
      FROM orders GROUP BY o_custkey
    ), byv AS (
      SELECT v, count(*) AS c FROM rev GROUP BY v
    ), ranked AS (
      SELECT v, c,
             1 + coalesce(sum(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS min_rank
      FROM byv
    ), m AS (
      SELECT CAST(sum(c) AS HUGEINT) AS n,
             CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS s,
             CAST(sum(CAST(v AS HUGEINT)
                      * (2 * CAST(c AS HUGEINT) * min_rank
                         + CAST(c AS HUGEINT) * (c - 1)))
                  AS HUGEINT) AS two_t
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           floor(CAST(s AS DOUBLE) * {_GINI_GRID} / CAST(n AS DOUBLE)
                 / 100.0 * 1000000.0) / 1000000.0 AS mean_revenue,
           floor((CAST(two_t AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                  - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS gini
    FROM m
    """,
)
def stats_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the concentration
    audit ("do 1% of customers carry 50% of revenue?") — via the
    sorted-rank identity ``G = 2Σᵢ i·xᵢ/(nΣx) − (n+1)/n`` with
    midrank-free EXACT block ranks: customers collapse to the
    dollar-grid distinct-value table, where a value block's rank sum
    is ``c·min_rank + c(c−1)/2`` — all integer.

    Plan shape: one per-customer grouped sum, one grouped count onto
    the bounded distinct-value table, one running sum over it
    (whitelisted partition-less window), one 1-row aggregate. 2T and
    n·S ride DECIMAL(38,0)/HUGEINT; the assembly is two float divides.
    """
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.expr(f"sum(cast(floor(o_totalprice * 100.0 + 0.5) as bigint))"
               f" div {_GINI_GRID}").alias("v")
    )
    byv = rev.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = byv.withColumn(
        "min_rank", F.lit(1) + F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = ranked.agg(
        F.sum(d38(F.col("c"))).alias("n"),
        F.sum(d38(F.col("v")) * d38(F.col("c"))).alias("s"),
        F.sum(
            d38(F.col("v"))
            * (
                F.lit(2) * d38(F.col("c")) * d38(F.col("min_rank"))
                + d38(F.col("c")) * d38(F.col("c") - 1)
            )
        ).alias("two_t"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return m.select(
        F.col("n").cast("long").alias("n_customers"),
        trunc6(
            dbl("s") * F.lit(float(_GINI_GRID)) / dbl("n") / F.lit(100.0)
        ).alias("mean_revenue"),
        trunc6(
            dbl("two_t") / (dbl("n") * dbl("s"))
            - (dbl("n") + F.lit(1.0)) / dbl("n")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Exact 1-D Wasserstein (earth mover) distance
# ---------------------------------------------------------------------------


@query(
    "stats_wasserstein_1d",
    oracle=f"""
    WITH {_TWO_SAMPLE_CTE}, run AS (
      SELECT v,
             coalesce(lead(v) OVER (ORDER BY v) - v, 0) AS dv,
             sum(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc1,
             sum(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc2,
             sum(c1) OVER () AS n1,
             sum(c2) OVER () AS n2
      FROM byv
    ), m AS (
      SELECT sum(abs(CAST(cc1 AS HUGEINT) * n2 - CAST(cc2 AS HUGEINT) * n1)
                 * CAST(dv AS HUGEINT)) AS num,
             CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2
      FROM run
    )
    SELECT n1, n2,
           floor(CAST(num AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 100.0
                 * 1000000.0) / 1000000.0 AS w1
    FROM m
    """,
)
def stats_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth mover) distance between the
    `purchase` and `view` value distributions on the cent grid —
    ``W₁ = ∫|F₁−F₂|dx = Σᵢ |F₁(vᵢ)−F₂(vᵢ)|·(vᵢ₊₁−vᵢ)`` — cleared to
    integers as ``Σ |cc₁n₂ − cc₂n₁|·dv / (n₁n₂)`` and reported in
    value units. The distributional companion to
    :func:`stats_ks_test`: KS is the sup-norm of the same ECDF gap,
    W₁ its L1 mass.

    Plan shape (the stats_ks_test contract): one grouped count
    collapses the corpus to the DISTINCT cent-value table; running
    ECDF sums plus one lead() over that bounded table (whitelisted
    partition-less window); one sum aggregate whose terms are exact
    DECIMAL(38,0) integers — no float ECDF crosses a shuffle.
    """
    byv = _two_sample_counts(spark, sf_dir)
    w_ord = Window.orderBy("v")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    run = byv.select(
        F.coalesce(
            F.lead("v").over(w_ord) - F.col("v"), F.lit(0)
        ).alias("dv"),
        F.sum("c1").over(w_run).alias("cc1"),
        F.sum("c2").over(w_run).alias("cc2"),
        F.sum("c1").over(w_all).alias("n1"),
        F.sum("c2").over(w_all).alias("n2"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = run.agg(
        F.sum(
            F.abs(d38("cc1") * d38("n2") - d38("cc2") * d38("n1"))
            * d38("dv")
        ).alias("num"),
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return m.select(
        "n1",
        "n2",
        trunc6(
            F.col("num").cast("double")
            / (dbl("n1") * dbl("n2"))
            / F.lit(100.0)
        ).alias("w1"),
    )


# ---------------------------------------------------------------------------
# Mann–Whitney U (Wilcoxon rank-sum) test
# ---------------------------------------------------------------------------


@query(
    "stats_mannwhitney_u",
    oracle=f"""
    WITH {_TWO_SAMPLE_CTE}, ranked AS (
      SELECT v, c1, c2, c1 + c2 AS t,
             1 + coalesce(sum(c1 + c2) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS min_rank
      FROM byv
    ), m AS (
      SELECT CAST(sum(c1) AS HUGEINT) AS n1,
             CAST(sum(c2) AS HUGEINT) AS n2,
             CAST(sum(CAST(c1 AS HUGEINT)
                      * (2 * min_rank + t - 1)) AS HUGEINT) AS two_r1,
             CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT)
               AS tie_cubes
      FROM ranked
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u,
           floor(CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE)
                 / (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS auc,
           floor((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0
                  - CAST(n1 * n2 AS DOUBLE) / 2.0)
                 / sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
                        * (CAST(n1 + n2 + 1 AS DOUBLE)
                           - CAST(tie_cubes AS DOUBLE)
                             / (CAST(n1 + n2 AS DOUBLE)
                                * CAST(n1 + n2 - 1 AS DOUBLE))))
                 * 1000000.0) / 1000000.0 AS z,
           CASE WHEN abs(floor((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE)
                     / 2.0 - CAST(n1 * n2 AS DOUBLE) / 2.0)
                 / sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
                        * (CAST(n1 + n2 + 1 AS DOUBLE)
                           - CAST(tie_cubes AS DOUBLE)
                             / (CAST(n1 + n2 AS DOUBLE)
                                * CAST(n1 + n2 - 1 AS DOUBLE))))
                 * 1000000.0)) > 1959963 THEN 1 ELSE 0 END AS reject
    FROM m
    """,
)
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test between the `purchase`
    and `view` value distributions on the cent grid, with midrank tie
    handling and the tie-corrected normal approximation
    ``z = (U − n₁n₂/2) / √(n₁n₂/12 · ((N+1) − Σ(t³−t)/(N(N−1))))``
    (no continuity correction), rejecting at α=0.05 on the shared ppm
    grid (|z_ppm| > 1959963). Completes the two-sample battery:
    KS (sup-norm), W₁ (L1 mass), Welch (means), U (stochastic order).

    Exactness: ``2R₁ = Σ c₁(2·min_rank + t − 1)`` and the tie term
    ``Σ(t³−t)`` are pure integers off the same DISTINCT cent-value
    table as stats_ks_test (whitelisted running rank window); z is
    one float assembly on the 1-row result.
    """
    byv = _two_sample_counts(spark, sf_dir)
    w_prev = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = byv.select(
        "c1",
        "c2",
        (F.col("c1") + F.col("c2")).alias("t"),
        (
            F.lit(1)
            + F.coalesce(
                F.sum(F.col("c1") + F.col("c2")).over(w_prev), F.lit(0)
            )
        ).alias("min_rank"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = ranked.agg(
        F.sum(d38(F.col("c1"))).alias("n1"),
        F.sum(d38(F.col("c2"))).alias("n2"),
        F.sum(
            d38(F.col("c1"))
            * (2 * d38(F.col("min_rank")) + d38(F.col("t")) - 1)
        ).alias("two_r1"),
        F.sum(
            d38(F.col("t")) * d38(F.col("t")) * d38(F.col("t"))
            - d38(F.col("t"))
        ).alias("tie_cubes"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    two_u1 = (
        F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)
    ).cast("double")
    u = two_u1 / F.lit(2.0)
    sigma = F.sqrt(
        dbl("n1") * dbl("n2") / F.lit(12.0)
        * (
            (dbl("n1") + dbl("n2") + F.lit(1.0))
            - F.col("tie_cubes").cast("double")
            / (
                (dbl("n1") + dbl("n2"))
                * (dbl("n1") + dbl("n2") - F.lit(1.0))
            )
        )
    )
    z_ppm = F.floor(
        (u - dbl("n1") * dbl("n2") / F.lit(2.0)) / sigma * F.lit(1e6)
    )
    return m.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        u.alias("u"),
        trunc6(u / (dbl("n1") * dbl("n2"))).alias("auc"),
        (z_ppm / F.lit(1e6)).alias("z"),
        F.when(F.abs(z_ppm) > 1959963, 1).otherwise(0).alias("reject"),
    )


# ---------------------------------------------------------------------------
# Median-absolute-deviation robust outlier audit
# ---------------------------------------------------------------------------


@query(
    "stats_mad_outliers",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      FROM events
    ), byv AS (
      SELECT event_type, v, count(*) AS c FROM q GROUP BY event_type, v
    ), cdf AS (
      SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM byv
    ), med AS (
      SELECT event_type, max(n) AS n,
             min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS med
      FROM cdf GROUP BY event_type
    ), dev AS (
      SELECT b.event_type, abs(b.v - m.med) AS d, b.c, b.v, m.med, m.n
      FROM byv b JOIN med m ON m.event_type = b.event_type
    ), dcdf AS (
      SELECT event_type, d, med, n,
             sum(c) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (SELECT event_type, d, med, n, sum(c) AS c
            FROM dev GROUP BY event_type, d, med, n)
    ), mad AS (
      SELECT event_type, max(med) AS med, max(n) AS n,
             min(CASE WHEN cum >= (n + 1) // 2 THEN d END) AS mad
      FROM dcdf GROUP BY event_type
    ), flg AS (
      SELECT d.event_type,
             sum(CASE WHEN 10000 * d.d > 44478 * m.mad
                      THEN d.c ELSE 0 END) AS n_outliers
      FROM dev d JOIN mad m ON m.event_type = d.event_type
      GROUP BY d.event_type
    )
    SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
           CAST(m.med AS DOUBLE) / 100.0 AS med,
           CAST(m.mad AS DOUBLE) / 100.0 AS mad,
           CAST(f.n_outliers AS BIGINT) AS n_outliers
    FROM mad m JOIN flg f ON f.event_type = m.event_type
    """,
)
def stats_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit per event type: lower-median and MAD on
    the cent grid, flagging ``|x − med| > 3·1.4826·MAD`` (the normal-
    consistent 3σ-equivalent fence) — immune to the outliers it
    hunts, unlike the z-score detector (ts_anomaly_zscore).

    Exactness: both medians are order statistics read off per-type
    CDF windows over the DISTINCT cent-value table (PARTITIONED by
    type — bounded by |types|×value-domain, never corpus); the fence
    compares pure integers (10000·dev > 44478·mad).
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    byv = q.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    w_cdf = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cdf = byv.select(
        "event_type",
        "v",
        "c",
        F.sum("c").over(w_cdf).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    med = cdf.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("v"))
        ).alias("med"),
    )
    dev = byv.join(med, "event_type").select(
        "event_type",
        F.abs(F.col("v") - F.col("med")).alias("d"),
        "c",
        "med",
        "n",
    )
    dgrp = dev.groupBy("event_type", "d", "med", "n").agg(
        F.sum("c").alias("c")
    )
    w_dcdf = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dcdf = dgrp.select(
        "event_type",
        "d",
        "med",
        "n",
        F.sum("c").over(w_dcdf).alias("cum"),
    )
    mad = dcdf.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("d"))
        ).alias("mad"),
    )
    flg = (
        dev.select("event_type", "d", "c")
        .join(mad.select("event_type", "mad"), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    10000 * F.col("d") > 44478 * F.col("mad"), F.col("c")
                ).otherwise(0)
            ).alias("n_outliers")
        )
    )
    return mad.join(flg, "event_type").select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("med").cast("double") / F.lit(100.0)).alias("med"),
        (F.col("mad").cast("double") / F.lit(100.0)).alias("mad"),
        F.col("n_outliers").cast("long").alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend slope
# ---------------------------------------------------------------------------


@query(
    "stats_theil_sen",
    oracle="""
    WITH weekly AS (
      SELECT epoch_us(ts) // 604800000000 AS wk,
             CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY wk
    ), pairs AS (
      SELECT (1000000 * (b.y - a.y)) // (b.wk - a.wk) AS s_micro
      FROM weekly a JOIN weekly b ON a.wk < b.wk
    ), bys AS (
      SELECT s_micro, count(*) AS c FROM pairs GROUP BY s_micro
    ), cdf AS (
      SELECT s_micro,
             sum(c) OVER (ORDER BY s_micro
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(c) OVER () AS np
      FROM bys
    ), pick AS (
      SELECT max(np) AS n_pairs,
             min(CASE WHEN cum >= (np + 1) // 2 THEN s_micro END) AS s_micro
      FROM cdf
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM weekly) AS n_weeks,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           floor(CAST(s_micro AS DOUBLE) / 1e6 / 1000.0
                 * 1000000.0) / 1000000.0 AS slope_per_week
    FROM pick
    """,
)
def stats_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimate of WEEKLY purchase revenue: the
    (lower) median of all pairwise slopes ``(y_j − y_i)/(j − i)`` —
    the 29%-breakdown alternative to OLS (stats_linreg) that one
    corrupted week cannot drag.

    Exactness: slopes quantize to integer micro-milli-units via
    truncating integer division (``div`` ≡ DuckDB ``//`` for BIGINTs,
    both truncate toward ZERO: −7÷2 → −3 — verified); the median is an
    order statistic off the slope-value CDF. The pair table is bounded by
    weeks² (observation window², never corpus — the corpus collapses
    to the weekly table first); its running window is whitelisted.
    """
    ev = load_table(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    weekly = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.expr("(ts div 1000) div 604800000000").alias("wk"))
        .agg(F.sum(mv).alias("y"))
    )
    a = weekly.select(F.col("wk").alias("wa"), F.col("y").alias("ya"))
    b = weekly.select(F.col("wk").alias("wb"), F.col("y").alias("yb"))
    pairs = a.join(b, F.col("wa") < F.col("wb")).select(
        F.expr("(1000000L * (yb - ya)) div (wb - wa)").alias("s_micro")
    )
    bys = pairs.groupBy("s_micro").agg(F.count(F.lit(1)).alias("c"))
    w_run = Window.orderBy("s_micro").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = bys.select(
        "s_micro",
        F.sum("c").over(w_run).alias("cum"),
        F.sum("c").over(w_all).alias("np"),
    )
    pick = cdf.agg(
        F.max("np").alias("n_pairs"),
        F.min(
            F.when(F.col("cum") >= F.expr("(np + 1) div 2"), F.col("s_micro"))
        ).alias("s_micro"),
    )
    n_weeks = weekly.agg(
        F.count(F.lit(1)).cast("long").alias("n_weeks")
    )
    return n_weeks.crossJoin(pick).select(
        "n_weeks",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        trunc6(
            F.col("s_micro").cast("double") / F.lit(1e6) / F.lit(1000.0)
        ).alias("slope_per_week"),
    )


# ---------------------------------------------------------------------------
# Sequential probability ratio test (SPRT)
# ---------------------------------------------------------------------------

import math as _math

#: SPRT hypotheses on the per-event purchase rate and α=β=0.05
#: barriers. ALL log constants are precomputed HERE in Python and
#: inlined as integer nano-nat literals in both engines — ln() ulp
#: behavior differs between the JVM and C, so neither engine ever
#: evaluates a log.
_SPRT_P0, _SPRT_P1 = 0.18, 0.22
_SPRT_L1_NN = _math.floor(_math.log(_SPRT_P1 / _SPRT_P0) * 1e9)
_SPRT_L0_NN = _math.floor(
    _math.log((1.0 - _SPRT_P1) / (1.0 - _SPRT_P0)) * 1e9
)
_SPRT_A_NN = _math.floor(_math.log(19.0) * 1e9)  # ln((1-β)/α)
_SPRT_B_NN = -_SPRT_A_NN  # symmetric α=β


@query(
    "ab_sprt_sequential",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM events GROUP BY day
    ), walk AS (
      SELECT day, n, conv,
             sum(conv * CAST({_SPRT_L1_NN} AS BIGINT)
                 + (n - conv) * CAST({_SPRT_L0_NN} AS BIGINT))
               OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS llr_nn
      FROM daily
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(n) AS BIGINT) AS total_trials,
             CAST(sum(conv) AS BIGINT) AS total_conv,
             min(CASE WHEN llr_nn >= {_SPRT_A_NN}
                       OR llr_nn <= {_SPRT_B_NN} THEN day END)
               AS first_cross_day,
             min(CASE WHEN llr_nn >= {_SPRT_A_NN} THEN day END) AS up_day,
             min(CASE WHEN llr_nn <= {_SPRT_B_NN} THEN day END) AS dn_day,
             max_by(llr_nn, day) AS final_llr_nn
      FROM walk
    )
    SELECT n_days, total_trials, total_conv, first_cross_day,
           CASE WHEN first_cross_day IS NULL THEN 'continue'
                WHEN up_day IS NOT NULL
                     AND (dn_day IS NULL OR up_day <= dn_day)
                  THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           floor(CAST(final_llr_nn AS DOUBLE) / 1e9 * 1000000.0)
             / 1000000.0 AS final_llr
    FROM agg
    """,
)
def ab_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test on the daily purchase
    rate: walk the cumulative log-likelihood ratio
    ``Σ conv·ln(p₁/p₀) + (n−conv)·ln(q₁/q₀)`` day by day and stop the
    experiment the first day it crosses ``±ln((1−β)/α)`` (α=β=0.05) —
    the always-valid early-stopping monitor a perpetual A/B platform
    runs instead of a fixed-horizon test.

    Exactness: the four log constants are precomputed in PYTHON and
    inlined as integer nano-nat literals in both engines (ln() ulp
    differs JVM vs C); the walk is then a pure-integer running sum
    over the day grid (whitelisted window, date-domain bounded) and
    crossing detection is integer comparison.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("(ts div 1000) div 86400000000").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    w_run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = daily.select(
        "day",
        "n",
        "conv",
        F.sum(
            F.col("conv") * F.lit(_SPRT_L1_NN)
            + (F.col("n") - F.col("conv")) * F.lit(_SPRT_L0_NN)
        )
        .over(w_run)
        .alias("llr_nn"),
    )
    crossed = (F.col("llr_nn") >= _SPRT_A_NN) | (
        F.col("llr_nn") <= _SPRT_B_NN
    )
    agg = walk.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("total_trials"),
        F.sum("conv").cast("long").alias("total_conv"),
        F.min(F.when(crossed, F.col("day"))).alias("first_cross_day"),
        F.min(
            F.when(F.col("llr_nn") >= _SPRT_A_NN, F.col("day"))
        ).alias("up_day"),
        F.min(
            F.when(F.col("llr_nn") <= _SPRT_B_NN, F.col("day"))
        ).alias("dn_day"),
        F.max(F.struct("day", "llr_nn"))
        .getField("llr_nn")
        .alias("final_llr_nn"),
    )
    decision = (
        F.when(F.col("first_cross_day").isNull(), "continue")
        .when(
            F.col("up_day").isNotNull()
            & (
                F.col("dn_day").isNull()
                | (F.col("up_day") <= F.col("dn_day"))
            ),
            "accept_h1",
        )
        .otherwise("accept_h0")
    )
    return agg.select(
        "n_days",
        "total_trials",
        "total_conv",
        "first_cross_day",
        decision.alias("decision"),
        trunc6(F.col("final_llr_nn").cast("double") / F.lit(1e9)).alias(
            "final_llr"
        ),
    )


# ---------------------------------------------------------------------------
# Trimmed mean (robust location)
# ---------------------------------------------------------------------------


@query(
    "stats_trimmed_mean",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      FROM events
    ), byv AS (
      SELECT event_type, v, count(*) AS c FROM q GROUP BY event_type, v
    ), cdf AS (
      SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM byv
    ), terms AS (
      SELECT event_type, n, k,
             v * greatest(least(cum, n - k) - greatest(cum - c, k), 0)
               AS contrib
      FROM (SELECT event_type, v, c, cum, n, n // 10 AS k FROM cdf)
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           CAST(max(k) AS BIGINT) AS n_trimmed_each_side,
           floor(CAST(sum(contrib) AS DOUBLE)
                 / CAST(max(n) - 2 * max(k) AS DOUBLE) / 100.0
                 * 1000000.0) / 1000000.0 AS trimmed_mean
    FROM terms GROUP BY event_type
    """,
)
def stats_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean of event values per type — the
    robust-location companion to stats_mad_outliers — computed WITHOUT
    sorting individual rows: on the per-type value CDF, a value with
    per-type cumulative range (cum−c, cum] contributes
    ``max(min(cum, n−k) − max(cum−c, k), 0)`` copies after trimming k
    = ⌊n/10⌋ from each side (the rank-interval clamp identity). All
    integer until one divide per type row.

    Plan shape: grouped count to the DISTINCT (type, value) table;
    per-type CDF windows (PARTITIONED — the stats_mad_outliers
    contract); one grouped sum.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    byv = q.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    w_cdf = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cdf = byv.select(
        "event_type",
        "v",
        "c",
        F.sum("c").over(w_cdf).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    ).withColumn("k", F.expr("n div 10"))
    contrib = F.col("v") * F.greatest(
        F.least(F.col("cum"), F.col("n") - F.col("k"))
        - F.greatest(F.col("cum") - F.col("c"), F.col("k")),
        F.lit(0),
    )
    return cdf.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("k").cast("long").alias("n_trimmed_each_side"),
        trunc6(
            F.sum(contrib).cast("double")
            / (F.max("n") - 2 * F.max("k")).cast("double")
            / F.lit(100.0)
        ).alias("trimmed_mean"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences estimator
# ---------------------------------------------------------------------------


@query(
    "ab_diff_in_diff",
    oracle="""
    WITH q AS (
      SELECT user_id, event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS mv
      FROM events
    ), span AS (
      SELECT (min(day) + max(day)) // 2 AS mid FROM q
    ), cells AS (
      SELECT ((strpos('0123456789abcdef', substr(md5('did:' || CAST(q.user_id AS VARCHAR)), 1, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substr(md5('did:' || CAST(q.user_id AS VARCHAR)), 2, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substr(md5('did:' || CAST(q.user_id AS VARCHAR)), 3, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substr(md5('did:' || CAST(q.user_id AS VARCHAR)), 4, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(md5('did:' || CAST(q.user_id AS VARCHAR)), 5, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(md5('did:' || CAST(q.user_id AS VARCHAR)), 6, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5('did:' || CAST(q.user_id AS VARCHAR)), 7, 1)) - 1) * 1) % 2 AS grp,
             CASE WHEN q.day > s.mid THEN 1 ELSE 0 END AS period,
             count(*) AS n,
             CAST(sum(q.mv) AS BIGINT) AS s
      FROM q CROSS JOIN span s
      WHERE q.event_type = 'purchase'
      GROUP BY 1, 2
    ), m AS (
      SELECT
        max(CASE WHEN grp = 1 AND period = 0 THEN CAST(s AS DOUBLE) / n END) AS t1,
        max(CASE WHEN grp = 1 AND period = 1 THEN CAST(s AS DOUBLE) / n END) AS t2,
        max(CASE WHEN grp = 0 AND period = 0 THEN CAST(s AS DOUBLE) / n END) AS c1,
        max(CASE WHEN grp = 0 AND period = 1 THEN CAST(s AS DOUBLE) / n END) AS c2,
        CAST(sum(CASE WHEN grp = 1 THEN n ELSE 0 END) AS BIGINT) AS n_treat,
        CAST(sum(CASE WHEN grp = 0 THEN n ELSE 0 END) AS BIGINT) AS n_control
      FROM cells
    )
    SELECT n_treat, n_control,
           floor(t1 / 1000.0 * 1000000.0) / 1000000.0 AS treat_pre,
           floor(t2 / 1000.0 * 1000000.0) / 1000000.0 AS treat_post,
           floor(c1 / 1000.0 * 1000000.0) / 1000000.0 AS control_pre,
           floor(c2 / 1000.0 * 1000000.0) / 1000000.0 AS control_post,
           floor(((t2 - t1) - (c2 - c1)) / 1000.0 * 1000000.0)
             / 1000000.0 AS did
    FROM m
    """,
)
def ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: mean purchase value of the
    hash-assigned rollout cohort (``md5('did:'‖user_id) % 2`` — the
    split_hash_buckets assignment convention) vs the holdout, before
    vs after the observation midpoint —
    ``DiD = (T̄₂−T̄₁) − (C̄₂−C̄₁)``, the control arm netting out the
    common time trend (the panel estimator an experimentation
    platform runs over a staged rollout).

    Exactness: per-cell means come from integer milli sums (2×2 cells
    — one conditional aggregation); the midpoint is an integer scalar
    off a 1-row min/max aggregate; DiD is float assembly on the 1-row
    result. Identical doubles both engines.

    Plan shape: one grouped min/max scalar (broadcast) + a MAP-ONLY
    hash cohort assignment, then one 4-cell conditional aggregation.
    No joins beyond the scalar attach, no windows.

    Degenerate-input contract: if any of the four (cohort, period)
    cells is empty, its mean — and therefore ``did`` — is NULL (the
    conditional ``max(CASE …)`` finds no row). Both engines agree;
    a NULL ``did`` means "not estimable from this window", never 0.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "user_id",
        "event_type",
        F.expr("(ts div 1000) div 86400000000").alias("day"),
        F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("mv"),
    )
    # integer `div`, NOT float-divide-then-cast: the oracle computes the
    # midpoint with DuckDB's integer `//`, and a double round-trip is only
    # coincidentally equal (and loses exactness above 2^53) — keep the
    # whole scalar in integer arithmetic on both engines
    span = q.agg(F.expr("(min(day) + max(day)) div 2").alias("mid"))
    grp = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("did:"), F.col("user_id").cast("string")
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    cells = (
        q.where(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(span))
        .groupBy(
            grp.alias("grp"),
            F.when(F.col("day") > F.col("mid"), 1)
            .otherwise(0)
            .alias("period"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("mv").alias("s"))
    )
    pick = lambda g, p: F.max(  # noqa: E731
        F.when(
            (F.col("grp") == g) & (F.col("period") == p),
            F.col("s").cast("double") / F.col("n").cast("double"),
        )
    )
    m = cells.agg(
        pick(1, 0).alias("t1"),
        pick(1, 1).alias("t2"),
        pick(0, 0).alias("c1"),
        pick(0, 1).alias("c2"),
        F.sum(F.when(F.col("grp") == 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_treat"),
        F.sum(F.when(F.col("grp") == 0, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_control"),
    )
    k = lambda c: trunc6(c / F.lit(1000.0))  # noqa: E731
    return m.select(
        "n_treat",
        "n_control",
        k(F.col("t1")).alias("treat_pre"),
        k(F.col("t2")).alias("treat_post"),
        k(F.col("c1")).alias("control_pre"),
        k(F.col("c2")).alias("control_post"),
        k(
            (F.col("t2") - F.col("t1")) - (F.col("c2") - F.col("c1"))
        ).alias("did"),
    )


@query(
    "ts_changepoint_sse",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS s
      FROM events GROUP BY event_type, day
    ),
    cum AS (
      SELECT event_type, day,
             sum(n) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS cn,
             sum(s) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS cs,
             sum(n) OVER (PARTITION BY event_type) AS tn,
             sum(s) OVER (PARTITION BY event_type) AS ts
      FROM daily
    ),
    scored AS (
      SELECT event_type, day, cn, cs, tn, ts,
             CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
               / CAST(cn AS DOUBLE)
             + CAST(ts - cs AS DOUBLE) * CAST(ts - cs AS DOUBLE)
               / CAST(tn - cn AS DOUBLE) AS score
      FROM cum WHERE cn < tn
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY score DESC, day) AS rk
      FROM scored
    )
    SELECT event_type, day AS split_day,
           CAST(cn AS BIGINT) AS n_left, CAST(tn - cn AS BIGINT) AS n_right,
           floor(score * 1000000.0) / 1000000.0 AS score,
           floor(CAST(cs AS DOUBLE) / CAST(cn AS DOUBLE) / 1000.0
                 * 1000000.0) / 1000000.0 AS mean_left,
           floor(CAST(ts - cs AS DOUBLE) / CAST(tn - cn AS DOUBLE)
                 / 1000.0 * 1000000.0) / 1000000.0 AS mean_right
    FROM best WHERE rk = 1
    """,
)
def ts_changepoint_sse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline single changepoint per event type: the day boundary
    minimizing total within-segment SSE of the daily value stream —
    equivalently maximizing ``S_L²/n_L + S_R²/n_R`` (Fisher's exact
    one-break segmentation; the offline companion to the online
    ts_cusum_alarms detector).

    Exactness: daily sums are BIGINT milli-units; the split score is
    a fixed-association IEEE expression of those exact integers
    (double multiply — overflow-free at any corpus size, identical in
    both engines), argmax tie-breaks to the earliest day. Plan: one
    grouped aggregation to the (type, day) grid, two window sums over
    the type partition (date-domain bounded, never corpus-row-sized),
    one row_number argmax — no self-join over splits.
    """
    ev = load_table(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    daily = ev.groupBy(
        "event_type", F.expr("(ts div 1000) div 86400000000").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(mv).alias("s"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("n").over(w_cum).alias("cn"),
        F.sum("s").over(w_cum).alias("cs"),
        F.sum("n").over(w_tot).alias("tn"),
        F.sum("s").over(w_tot).alias("ts"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    scored = cum.where(F.col("cn") < F.col("tn")).withColumn(
        "score",
        d(F.col("cs")) * d(F.col("cs")) / d(F.col("cn"))
        + d(F.col("ts") - F.col("cs")) * d(F.col("ts") - F.col("cs"))
        / d(F.col("tn") - F.col("cn")),
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.col("score").desc(), "day"
    )
    best = scored.withColumn("rk", F.row_number().over(w_rank)).where(
        F.col("rk") == 1
    )
    return best.select(
        "event_type",
        F.col("day").alias("split_day"),
        F.col("cn").alias("n_left"),
        (F.col("tn") - F.col("cn")).alias("n_right"),
        trunc6(F.col("score")).alias("score"),
        trunc6(d(F.col("cs")) / d(F.col("cn")) / F.lit(1000.0)).alias(
            "mean_left"
        ),
        trunc6(
            d(F.col("ts") - F.col("cs"))
            / d(F.col("tn") - F.col("cn"))
            / F.lit(1000.0)
        ).alias("mean_right"),
    )


@query(
    "stats_winsorized_mean",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      FROM events
    ), byv AS (
      SELECT event_type, v, count(*) AS c FROM q GROUP BY event_type, v
    ), cdf AS (
      SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM byv
    ), kk AS (
      SELECT event_type, v, c, cum, n, n // 10 AS k FROM cdf
    )
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           CAST(max(k) AS BIGINT) AS n_clamped_each_side,
           floor(CAST(min(CASE WHEN cum >= k + 1 THEN v END) AS DOUBLE)
                 / 100.0 * 1000000.0) / 1000000.0 AS lo_bound,
           floor(CAST(min(CASE WHEN cum >= n - k THEN v END) AS DOUBLE)
                 / 100.0 * 1000000.0) / 1000000.0 AS hi_bound,
           floor((CAST(sum(v * greatest(least(cum, n - k)
                                        - greatest(cum - c, k), 0))
                       AS DOUBLE)
                  + CAST(max(k) * min(CASE WHEN cum >= k + 1
                                      THEN v END) AS DOUBLE)
                  + CAST(max(k) * min(CASE WHEN cum >= n - k
                                      THEN v END) AS DOUBLE))
                 / CAST(max(n) AS DOUBLE) / 100.0
                 * 1000000.0) / 1000000.0 AS winsorized_mean
    FROM kk GROUP BY event_type
    """,
)
def stats_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided WINSORIZED mean per event type — the clamp
    companion to stats_trimmed_mean: instead of dropping the k = ⌊n/10⌋
    extreme values each side, they are replaced by the (k+1)-th and
    (n−k)-th order statistics, so every observation still counts (the
    estimator a bounded-influence pipeline prefers when sample size
    must not shrink).

    Same sort-free rank-interval machinery on the per-type value CDF:
    middle ranks contribute via the clamp identity, the two clamp
    bounds are conditional-min order statistics off the same CDF, and
    the mean is exact-integer until one divide per type row.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    byv = q.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    w_cdf = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cdf = byv.select(
        "event_type",
        "v",
        "c",
        F.sum("c").over(w_cdf).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    ).withColumn("k", F.expr("n div 10"))
    mid = F.col("v") * F.greatest(
        F.least(F.col("cum"), F.col("n") - F.col("k"))
        - F.greatest(F.col("cum") - F.col("c"), F.col("k")),
        F.lit(0),
    )
    lo = F.min(F.when(F.col("cum") >= F.col("k") + 1, F.col("v")))
    hi = F.min(F.when(F.col("cum") >= F.col("n") - F.col("k"), F.col("v")))
    return cdf.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("k").cast("long").alias("n_clamped_each_side"),
        trunc6(lo.cast("double") / F.lit(100.0)).alias("lo_bound"),
        trunc6(hi.cast("double") / F.lit(100.0)).alias("hi_bound"),
        trunc6(
            (
                F.sum(mid).cast("double")
                + (F.max("k") * lo).cast("double")
                + (F.max("k") * hi).cast("double")
            )
            / F.max("n").cast("double")
            / F.lit(100.0)
        ).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (midrank ties, integer-exact)
# ---------------------------------------------------------------------------


@query(
    "stats_spearman",
    oracle="""
    WITH rows_q AS (
      SELECT CAST(l_quantity AS BIGINT) AS qx,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS qy
      FROM lineitem
    ),
    xr AS (
      SELECT qx,
             2 * coalesce(sum(c) OVER (ORDER BY qx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS rx2
      FROM (SELECT qx, count(*) AS c FROM rows_q GROUP BY qx)
    ),
    yr AS (
      SELECT qy,
             2 * coalesce(sum(c) OVER (ORDER BY qy
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + c + 1 AS ry2
      FROM (SELECT qy, count(*) AS c FROM rows_q GROUP BY qy)
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(rx2 AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(ry2 AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(rx2 AS HUGEINT) * rx2) AS HUGEINT) AS sxx,
             CAST(sum(CAST(ry2 AS HUGEINT) * ry2) AS HUGEINT) AS syy,
             CAST(sum(CAST(rx2 AS HUGEINT) * ry2) AS HUGEINT) AS sxy
      FROM rows_q JOIN xr USING (qx) JOIN yr USING (qy)
    )
    SELECT CAST(n AS BIGINT) AS n,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS rho
    FROM m
    """,
)
def stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between lineitem quantity and extended
    price, with midrank tie handling — the rank-space companion of the
    Pearson ``stats_corr_matrix`` row for the same pair (Spearman is
    Pearson over midranks, so monotone-but-nonlinear association shows
    up here and not there).

    Exactness: midranks come off the two DISTINCT value tables (the
    stats_ks_test contract) carried as DOUBLED integers
    ``2·midrank = 2·cum_before + t + 1`` so ties never create a .5
    float; the five moment sums ride DECIMAL(38,0) (2r ≤ 2n ⇒
    Σ(2r)² ≤ 4n³ — exact past 10¹¹ rows) and ρ is one float assembly
    (the ×2 scale cancels in the Pearson ratio).

    Plan shape at 100 TB: two grouped counts over the DISTINCT value
    domains (quantity ≤ 50 distinct; cent prices are a ~10⁶-10⁷-point
    grid — value-domain bounded but NOT one-task small), so the
    midrank running sums go through ``ranged_cumsum_before``:
    deterministic width-65536 value buckets (no sampling, no
    partition ids — bucket assignment can never diverge between plan
    branches), local per-bucket cumsums, and a bucket-offset window
    over only the ≤|domain|/65536 bucket-total rows (≤153 for the
    cent grid) — the single partition-less window in the plan, never
    the value table. Then two equi-joins back to the fact rows (the
    50-row quantity side broadcasts; the price side is an ordinary
    shuffle join on a bounded key domain), one 1-row aggregate.
    """
    from speech_data_pipeline_spark.operators.windows import (
        ranged_cumsum_before,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rows_q = li.select(
        F.col("l_quantity").cast("long").alias("qx"),
        F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("qy"),
    )

    def rank2(col: str, out: str) -> DataFrame:
        byv = rows_q.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        return ranged_cumsum_before(byv, col, "c", out="_cb").select(
            col,
            (2 * F.col("_cb") + F.col("c") + 1).alias(out),
        )

    joined = rows_q.join(rank2("qx", "rx2"), "qx").join(
        rank2("qy", "ry2"), "qy"
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = joined.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d38("rx2")).alias("sx"),
        F.sum(d38("ry2")).alias("sy"),
        F.sum(d38("rx2") * d38("rx2")).alias("sxx"),
        F.sum(d38("ry2") * d38("ry2")).alias("syy"),
        F.sum(d38("rx2") * d38("ry2")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        F.col("n").cast("long").alias("n"),
        trunc6(num / F.sqrt(dx * dy)).alias("rho"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b (ties-corrected, 2D-suffix-sum over the bounded grid)
# ---------------------------------------------------------------------------


@query(
    "stats_kendall_tau",
    oracle="""
    WITH rows_q AS (
      SELECT CAST(l_quantity AS BIGINT) AS qx,
             CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS yb
      FROM lineitem
    ),
    cells AS (SELECT qx, yb, count(*) AS c FROM rows_q GROUP BY qx, yb),
    dense AS (
      SELECT xs.qx, ys.yb, coalesce(cells.c, 0) AS c
      FROM (SELECT DISTINCT qx FROM cells) xs
      CROSS JOIN (SELECT DISTINCT yb FROM cells) ys
      LEFT JOIN cells USING (qx, yb)
    ),
    a AS (
      SELECT qx, yb, c,
             coalesce(sum(c) OVER (PARTITION BY qx ORDER BY yb
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
               AS a_gt,
             coalesce(sum(c) OVER (PARTITION BY qx ORDER BY yb
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS a_lt
      FROM dense
    ),
    s AS (
      SELECT qx, yb, c,
             coalesce(sum(a_gt) OVER (PARTITION BY yb ORDER BY qx
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
               AS s_cc,
             coalesce(sum(a_lt) OVER (PARTITION BY yb ORDER BY qx
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
               AS s_dd
      FROM a
    ),
    m AS (
      SELECT CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS n,
             CAST(sum(CAST(c AS HUGEINT) * s_cc) AS HUGEINT) AS conc,
             CAST(sum(CAST(c AS HUGEINT) * s_dd) AS HUGEINT) AS disc
      FROM s
    ),
    tx AS (
      SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT) AS t2
      FROM (SELECT sum(c) AS t FROM cells GROUP BY qx)
    ),
    ty AS (
      SELECT CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT) AS t2
      FROM (SELECT sum(c) AS t FROM cells GROUP BY yb)
    )
    SELECT CAST(m.n AS BIGINT) AS n,
           CAST(m.conc AS DOUBLE) AS concordant,
           CAST(m.disc AS DOUBLE) AS discordant,
           floor(CAST(m.conc - m.disc AS DOUBLE)
                 / sqrt(CAST(m.n * (m.n - 1) - tx.t2 AS DOUBLE)
                        * CAST(m.n * (m.n - 1) - ty.t2 AS DOUBLE) / 4.0)
                 * 1000000.0) / 1000000.0 AS tau_b
    FROM m, tx, ty
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b (ties-corrected rank concordance) between lineitem
    quantity and the $1000 extended-price band — the ordinal companion
    of stats_spearman: tau counts pairwise order agreements, so it is
    robust where Spearman's midrank squares still weight outlier ranks.

    The O(n²) pair enumeration is collapsed onto the bounded
    contingency grid (≤50 quantity values × ~105 price bands):
    concordant pairs are ``Σ n_ij · S_ij`` with ``S_ij`` the
    2D strict-suffix sum, computed as two SEQUENTIAL partitioned
    windows (suffix over bands within a quantity row, then suffix over
    quantities within a band column — each partition ≤ grid width,
    never corpus rows) after densifying the grid with a bounded
    cross of the two DISTINCT-value tables (the SCALAR_CROSS
    whitelist contract). Discordant pairs reuse the same machinery on
    the lower-left quadrant. Tie corrections come off the two
    marginal tables; everything is integer (DECIMAL(38,0):
    Σ n_ij·S_ij ≤ n² — exact past 10⁹ rows) until the single
    tau assembly.

    ``tau_b = (C − D) / √((n(n−1)/2 − n_x)(n(n−1)/2 − n_y))`` with
    ``n_x = Σ tx(tx−1)/2`` over quantity marginals, ``n_y`` alike.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rows_q = li.select(
        F.col("l_quantity").cast("long").alias("qx"),
        F.floor(F.col("l_extendedprice") / F.lit(1000.0))
        .cast("long")
        .alias("yb"),
    )
    cells = rows_q.groupBy("qx", "yb").agg(F.count(F.lit(1)).alias("c"))
    xs = cells.select("qx").distinct()
    ys = cells.select("yb").distinct()
    dense = (
        xs.crossJoin(ys)
        .join(cells, ["qx", "yb"], "left")
        .select("qx", "yb", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    w_gt = (
        Window.partitionBy("qx")
        .orderBy("yb")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    w_lt = (
        Window.partitionBy("qx")
        .orderBy("yb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a = dense.select(
        "qx",
        "yb",
        "c",
        F.coalesce(F.sum("c").over(w_gt), F.lit(0)).alias("a_gt"),
        F.coalesce(F.sum("c").over(w_lt), F.lit(0)).alias("a_lt"),
    )
    w_x = (
        Window.partitionBy("yb")
        .orderBy("qx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    s = a.select(
        "c",
        F.coalesce(F.sum("a_gt").over(w_x), F.lit(0)).alias("s_cc"),
        F.coalesce(F.sum("a_lt").over(w_x), F.lit(0)).alias("s_dd"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = s.agg(
        F.sum(d38(F.col("c"))).alias("n"),
        F.sum(d38(F.col("c")) * d38(F.col("s_cc"))).alias("conc"),
        F.sum(d38(F.col("c")) * d38(F.col("s_dd"))).alias("disc"),
    )
    tx_m = (
        cells.groupBy("qx")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(d38(F.col("t")) * d38(F.col("t") - 1)).alias("t2x"))
    )
    ty_m = (
        cells.groupBy("yb")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(d38(F.col("t")) * d38(F.col("t") - 1)).alias("t2y"))
    )
    j = m.crossJoin(tx_m).crossJoin(ty_m)
    n = F.col("n")
    denom = F.sqrt(
        (n * (n - 1) - F.col("t2x")).cast("double")
        * (n * (n - 1) - F.col("t2y")).cast("double")
        / F.lit(4.0)
    )
    return j.select(
        n.cast("long").alias("n"),
        F.col("conc").cast("double").alias("concordant"),
        F.col("disc").cast("double").alias("discordant"),
        trunc6(
            (F.col("conc") - F.col("disc")).cast("double") / denom
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Cramér's V (categorical association strength)
# ---------------------------------------------------------------------------


@query(
    "stats_cramers_v",
    oracle="""
    WITH o AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls, count(*) AS obs
      FROM lineitem GROUP BY 1, 2
    ),
    r AS (SELECT rf, sum(obs) AS rt FROM o GROUP BY 1),
    c AS (SELECT ls, sum(obs) AS ct FROM o GROUP BY 1),
    n AS (SELECT CAST(sum(obs) AS BIGINT) AS tot FROM o),
    cells AS (
      SELECT CAST(floor(
               CAST(CAST(obs AS HUGEINT) * tot - CAST(rt AS HUGEINT) * ct
                    AS DOUBLE)
               * CAST(CAST(obs AS HUGEINT) * tot - CAST(rt AS HUGEINT) * ct
                      AS DOUBLE)
               / (CAST(tot AS DOUBLE) * CAST(CAST(rt AS HUGEINT) * ct
                                             AS DOUBLE))
               * 1000000000.0) AS HUGEINT) AS dev_nano
      FROM o JOIN r USING (rf) JOIN c USING (ls) CROSS JOIN n
    ),
    m AS (
      SELECT CAST(sum(dev_nano) AS HUGEINT) AS chi2_nano,
             (SELECT tot FROM n) AS tot,
             (SELECT count(*) FROM r) AS nr,
             (SELECT count(*) FROM c) AS nc
      FROM cells
    )
    SELECT CAST(tot AS BIGINT) AS n,
           CAST(nr AS BIGINT) AS n_rows_cat,
           CAST(nc AS BIGINT) AS n_cols_cat,
           floor(CAST(chi2_nano AS DOUBLE) / 1000000000.0 * 1000000.0)
             / 1000000.0 AS chi2,
           floor(sqrt(CAST(chi2_nano AS DOUBLE) / 1000000000.0
                      / (CAST(tot AS DOUBLE)
                         * least(nr - 1, nc - 1)))
                 * 1000000.0) / 1000000.0 AS cramers_v
    FROM m
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1]-normalized strength companion of the
    chi-square independence test (chisq_type_by_day reports the raw
    statistic; V makes tables of different size comparable):
    ``V = √(χ² / (n · min(r−1, c−1)))`` over the lineitem
    returnflag × linestatus contingency table, where the two flags are
    structurally dependent (returns only close as 'F'), so V is
    meaningfully away from 0 and the normalization is what the oracle
    checks.

    Exactness + validity bound: the per-cell deviation uses the
    integer identity ``(O·n − rm·cm)² / (n·rm·cm)``. The LINEAR
    numerator ``O·n − rm·cm`` is computed exactly in DECIMAL(38,0) /
    HUGEINT — |num| ≤ n², so it stays exact to n ≈ 1.3·10¹⁹ rows —
    then cast to double and squared in FLOAT space on both engines
    (identical IEEE round-to-nearest of the same integer → identical
    doubles → identical squares). Squaring inside the integer type
    would bound validity at n⁴ < 10³⁸ ⇒ n ≲ 3·10⁹ rows — inside the
    100 TB envelope, with Spark decimal overflow yielding silent NULLs;
    the double-square form keeps the whole pipeline valid at any
    realistic corpus size. Each cell quantizes to nano units so the
    cross-cell sum is an integer (order-immune across engines and
    partitionings, unlike a float Σ); χ² and V are single assemblies
    from that one integer.

    Plan shape at 100 TB: one grouped count (≤ r·c = 6 cells), two
    marginal re-aggregates of the CELL table, a 1-row total attach —
    never a second corpus pass, no windows, no sorts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = li.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls")
    ).agg(F.count(F.lit(1)).alias("obs"))
    r = o.groupBy("rf").agg(F.sum("obs").alias("rt"))
    c = o.groupBy("ls").agg(F.sum("obs").alias("ct"))
    n = o.agg(
        F.sum("obs").cast("long").alias("tot"),
        F.countDistinct("rf").alias("nr"),
        F.countDistinct("ls").alias("nc"),
    )
    d38 = lambda c_: c_.cast("decimal(38,0)")  # noqa: E731
    num = (
        d38(F.col("obs")) * d38(F.col("tot"))
        - d38(F.col("rt")) * d38(F.col("ct"))
    ).cast("double")
    dev_nano = F.floor(
        num
        * num
        / (
            F.col("tot").cast("double")
            * (d38(F.col("rt")) * d38(F.col("ct"))).cast("double")
        )
        * F.lit(1_000_000_000.0)
    ).cast("decimal(38,0)")
    m = (
        o.join(r, "rf")
        .join(c, "ls")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(dev_nano).alias("chi2_nano"),
            F.max("tot").alias("tot"),
            F.max("nr").alias("nr"),
            F.max("nc").alias("nc"),
        )
    )
    chi2 = F.col("chi2_nano").cast("double") / F.lit(1_000_000_000.0)
    return m.select(
        F.col("tot").cast("long").alias("n"),
        F.col("nr").cast("long").alias("n_rows_cat"),
        F.col("nc").cast("long").alias("n_cols_cat"),
        trunc6(chi2).alias("chi2"),
        trunc6(
            F.sqrt(
                chi2
                / (
                    F.col("tot").cast("double")
                    * F.least(F.col("nr") - 1, F.col("nc") - 1).cast(
                        "double"
                    )
                )
            )
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F (between-groups variance test)
# ---------------------------------------------------------------------------


@query(
    "stats_anova_f",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS mv
      FROM events
    ), g AS (
      SELECT event_type, count(*) AS ng,
             CAST(sum(CAST(mv AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(sum(CAST(mv AS HUGEINT) * mv) AS HUGEINT) AS s2
      FROM q GROUP BY event_type
    ), cells AS (
      SELECT ng, s1, s2,
             CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
               / CAST(ng AS DOUBLE) AS t
      FROM g
    ), m AS (
      SELECT CAST(sum(ng) AS HUGEINT) AS n, count(*) AS k,
             CAST(sum(s1) AS HUGEINT) AS gs1,
             CAST(sum(s2) AS HUGEINT) AS gs2,
             list_reduce(list_prepend(0.0, list(t ORDER BY t)),
                         (a, b) -> a + b) AS tsum
      FROM cells
    ), d AS (
      SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             tsum
               - CAST(gs1 AS DOUBLE) * CAST(gs1 AS DOUBLE)
                 / CAST(n AS DOUBLE) AS ssb_milli2,
             CAST(gs2 AS DOUBLE) - tsum AS ssw_milli2
      FROM m
    )
    SELECT n, k,
           floor(ssb_milli2 / 1000000.0 * 1000000.0) / 1000000.0
             AS ss_between,
           floor(ssw_milli2 / 1000000.0 * 1000000.0) / 1000000.0
             AS ss_within,
           floor((ssb_milli2 / (k - 1)) / (ssw_milli2 / (n - k))
                 * 1000000.0) / 1000000.0 AS f_stat
    FROM d
    """,
)
def stats_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test: does mean event ``value`` differ across
    event types? The k-group generalization of ``ab_welch_ttest``'s
    two-arm comparison — the screening test a corpus owner runs before
    pairwise drill-downs.

    Exactness: per-group integer moment sums (n_g, Σx, Σx²) on the
    milli-unit grid ride DECIMAL(38,0)/HUGEINT (exact at any corpus
    size); the ONE float expression per group, (Σx)²/n_g (linear sum
    exact, squared in DOUBLE — the stats_cramers_v discipline), is
    summed across groups by a SORTED FOLD: collect the ≤|types| terms,
    sort ascending, fold left-to-right from 0.0 — both engines execute
    the identical IEEE addition sequence, so the sum is bit-equal
    without any fixed-point quantization (a nano grid would overflow
    BIGINT here: ANOVA sums of squares span too many decades for one
    fixed scale). SSB/SSW are then single assemblies; ss_between/
    ss_within are reported in natural value units (the milli² grid
    de-scales by 10⁶; F itself is scale-free).

    Plan shape at 100 TB: ONE grouped aggregate over the corpus
    (|types| rows out, map-side partial), one |types|-row re-aggregate
    (the collect_list is the bounded group-term list, never rows),
    one 1-row assembly — no windows, no joins, no second pass.
    """
    ev = load_table(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    q = ev.select("event_type", mv.alias("mv"))
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(d38(F.col("mv"))).alias("s1"),
        F.sum(d38(F.col("mv")) * d38(F.col("mv"))).alias("s2"),
    )
    s1_d = F.col("s1").cast("double")
    term = s1_d * s1_d / F.col("ng").cast("double")
    m = g.agg(
        F.sum("ng").cast("decimal(38,0)").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("s1").alias("gs1"),
        F.sum("s2").alias("gs2"),
        F.sort_array(F.collect_list(term)).alias("ts"),
    )
    tsum = F.aggregate("ts", F.lit(0.0), lambda a, x: a + x)
    n_d = F.col("n").cast("double")
    gs1_d = F.col("gs1").cast("double")
    ssb = tsum - gs1_d * gs1_d / n_d
    ssw = F.col("gs2").cast("double") - tsum
    kk = F.col("k").cast("double")
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        trunc6(ssb / F.lit(1e6)).alias("ss_between"),
        trunc6(ssw / F.lit(1e6)).alias("ss_within"),
        trunc6(
            (ssb / (kk - F.lit(1.0)))
            / (ssw / (n_d - kk))
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test (daily activity series)
# ---------------------------------------------------------------------------


@query(
    "stats_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ), s AS (
      SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END)
                  AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON a.day < b.day
    ), nn AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM daily
    ), ties AS (
      SELECT coalesce(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
               AS tie_term
      FROM (SELECT count(*) AS t FROM daily GROUP BY x)
      WHERE t > 1
    )
    SELECT n, s_stat,
           floor((CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)
                  / 18.0) * 1000000.0) / 1000000.0 AS var_s,
           floor((CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                       WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                       ELSE 0.0 END
                  / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term
                              AS DOUBLE) / 18.0))
                 * 1000000.0) / 1000000.0 AS z_stat
    FROM s CROSS JOIN nn CROSS JOIN ties
    """,
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test over the daily total event
    value series — the nonparametric companion of ``stats_theil_sen``
    (that query estimates the slope; this one tests whether ANY
    monotone trend is distinguishable from noise): ``S = Σ_{i<j}
    sign(x_j − x_i)`` over day pairs, tie-corrected variance, and the
    continuity-corrected z statistic.

    Exactness: daily totals are exact milli-grid integers (one grouped
    sum), S and the tie term are pure integer aggregates, and var_s/z
    are single float assemblies — nothing accumulates in float.

    Plan shape at 100 TB: one corpus pass groups to the DAY grid
    (observation-window bounded — weeks, never rows); the pair join
    and tie grouping run over that bounded day table (|days|² pairs ≈
    10³-10⁴ for a quarter, broadcast-joined); three 1-row aggregates
    cross-attach.
    """
    ev = load_table(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    daily = (
        ev.select(
            F.expr("(ts div 1000) div 86400000000").alias("day"),
            mv.alias("mv"),
        )
        .groupBy("day")
        .agg(F.sum("mv").cast("long").alias("x"))
    )
    a = daily.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    s = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nn = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = F.col("t")
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(t > 1)
        .agg(
            F.coalesce(
                F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(ties))
    n = F.col("n")
    var_num = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("double")
    z_num = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double"))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double"))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "n",
        "s_stat",
        trunc6(var_num / F.lit(18.0)).alias("var_s"),
        trunc6(z_num / F.sqrt(var_num / F.lit(18.0))).alias("z_stat"),
    )

# ---------------------------------------------------------------------------
# Wald–Wolfowitz runs test (randomness of the daily series)
# ---------------------------------------------------------------------------


@query(
    "stats_runs_test",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM events GROUP BY 1
    ), ranked AS (
      SELECT day, x,
             row_number() OVER (ORDER BY x, day) AS rn,
             count(*) OVER () AS n
      FROM daily
    ), med AS (
      SELECT CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN x ELSE 0 END)
                  + sum(CASE WHEN rn = (n + 2) // 2 THEN x ELSE 0 END)
                  AS BIGINT) AS med2
      FROM ranked
    ), signs AS (
      SELECT day, CASE WHEN 2 * x > med2 THEN 1 ELSE 0 END AS s
      FROM daily CROSS JOIN med
      WHERE 2 * x <> med2
    ), runs AS (
      SELECT s,
             CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
                  OR lag(s) OVER (ORDER BY day) <> s
                  THEN 1 ELSE 0 END AS is_start
      FROM signs
    ), m AS (
      SELECT CAST(sum(s) AS BIGINT) AS n1,
             CAST(sum(1 - s) AS BIGINT) AS n2,
             CAST(sum(is_start) AS BIGINT) AS r
      FROM runs
    )
    SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
           floor((CAST(r AS DOUBLE)
                  - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / (CAST(n1 + n2 AS DOUBLE)
                           * (n1 + n2) * (n1 + n2 - 1)))
                 * 1000000.0) / 1000000.0 AS z_stat
    FROM m
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the daily total value series: are
    above-median and below-median days RANDOMLY interleaved, or do
    they clump (trend/regime) or alternate (oscillation)? The
    randomness companion of ``stats_mann_kendall`` (that test asks
    "is there a monotone trend"; this one asks "is the sequence
    exchangeable at all") — together the standard pre-flight pair
    before reading any time-series model's fit as structure.

    Exactness: daily totals are exact milli-grid integers; the median
    is the DOUBLED order statistic ``v[(n+1)/2] + v[(n+2)/2]`` (no .5
    floats; ties with the median are excluded, the standard
    convention); run starts, n1, n2 are integer window/aggregate
    algebra; z is one float assembly.

    Plan shape at 100 TB: one corpus pass groups to the DAY grid;
    everything after runs over that bounded table (rank + lag windows
    over ≤|days| rows — observation-window bounded, whitelisted), one
    1-row aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    daily = (
        ev.select(
            F.expr("(ts div 1000) div 86400000000").alias("day"),
            mv.alias("mv"),
        )
        .groupBy("day")
        .agg(F.sum("mv").cast("long").alias("x"))
    )
    w_rank = Window.orderBy("x", "day")
    ranked = daily.select(
        "day",
        "x",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    med = ranked.agg(
        (
            F.sum(
                F.when(
                    F.col("rn") == F.expr("(n + 1) div 2"), F.col("x")
                ).otherwise(F.lit(0))
            )
            + F.sum(
                F.when(
                    F.col("rn") == F.expr("(n + 2) div 2"), F.col("x")
                ).otherwise(F.lit(0))
            )
        )
        .cast("long")
        .alias("med2")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(2 * F.col("x") != F.col("med2"))
        .select(
            "day",
            F.when(2 * F.col("x") > F.col("med2"), 1).otherwise(0).alias("s"),
        )
    )
    w_day = Window.orderBy("day")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(w_day).isNull()
            | (F.lag("s").over(w_day) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    m = runs.agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
        F.sum("is_start").cast("long").alias("r"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    nn = n1 + n2
    e_r = F.lit(2.0) * n1 * n2 / nn + F.lit(1.0)
    var_r = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / (nn * nn * (nn - F.lit(1.0)))
    )
    return m.select(
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("n_runs"),
        trunc6((F.col("r").cast("double") - e_r) / F.sqrt(var_r)).alias(
            "z_stat"
        ),
    )


# ---------------------------------------------------------------------------
# Kruskal–Wallis H (rank-based one-way test, round 9)
# ---------------------------------------------------------------------------


@query(
    "stats_kruskal_wallis",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      FROM events
    ), gv AS (
      SELECT event_type, v, count(*) AS c FROM q GROUP BY 1, 2
    ), byv AS (
      SELECT v, CAST(sum(c) AS BIGINT) AS t FROM gv GROUP BY v
    ), ranked AS (
      SELECT v, t,
             1 + coalesce(sum(t) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS min_rank
      FROM byv
    ), grp AS (
      SELECT event_type,
             CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS ng,
             CAST(sum(CAST(c AS HUGEINT)
                      * (2 * r.min_rank + r.t - 1)) AS HUGEINT) AS two_r
      FROM gv JOIN ranked r USING (v) GROUP BY event_type
    ), ties AS (
      SELECT CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT)
               AS tie_cubes
      FROM byv
    ), m AS (
      SELECT CAST(sum(ng) AS HUGEINT) AS n, count(*) AS k,
             list_reduce(list_prepend(0.0,
               list((CAST(two_r AS DOUBLE) / 2.0)
                    * (CAST(two_r AS DOUBLE) / 2.0)
                    / CAST(ng AS DOUBLE) ORDER BY
                 (CAST(two_r AS DOUBLE) / 2.0)
                 * (CAST(two_r AS DOUBLE) / 2.0) / CAST(ng AS DOUBLE))),
               (a, b) -> a + b) AS rsum
      FROM grp
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           floor((12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
                  * rsum - 3.0 * CAST(n + 1 AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS h_stat,
           floor((12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
                  * rsum - 3.0 * CAST(n + 1 AS DOUBLE))
                 / (1.0 - CAST(tie_cubes AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                       * CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
                 * 1000000.0) / 1000000.0 AS h_adj
    FROM m CROSS JOIN ties
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H: the k-group rank-based generalization of
    ``stats_mannwhitney_u`` (as ``stats_anova_f`` generalizes the
    Welch pair) over event ``value`` by event type — the distribution-
    free screening test when group variances rule the F test out.
    Midrank ties via ``2·avg_rank = 2·min_rank + t − 1`` (integer),
    tie-corrected ``H / (1 − Σ(t³−t)/(N³−N))``.

    Exactness: everything through Σ c·(2·min_rank+t−1) is integer on
    DECIMAL(38,0)/HUGEINT; the one float term per group,
    (R_g)²/n_g, is summed by the stats_anova_f SORTED FOLD (identical
    IEEE sequence on both engines); H is a 1-row assembly.

    Plan shape at 100 TB: one corpus pass groups to the (type, cent)
    grid (bounded: k · value-domain rows); the rank window runs over
    the DISTINCT cent-value table (stats_ks_test contract, value-
    domain bounded, never corpus rows); one bounded join, one k-row
    aggregate, one 1-row assembly.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    gv = q.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    byv = gv.groupBy("v").agg(F.sum("c").alias("t"))
    w_prev = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = byv.select(
        "v",
        "t",
        (F.lit(1) + F.coalesce(F.sum("t").over(w_prev), F.lit(0))).alias(
            "min_rank"
        ),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    grp = (
        gv.join(ranked, "v")
        .groupBy("event_type")
        .agg(
            F.sum(d38(F.col("c"))).alias("ng"),
            F.sum(
                d38(F.col("c"))
                * (2 * d38(F.col("min_rank")) + d38(F.col("t")) - 1)
            ).alias("two_r"),
        )
    )
    r_d = F.col("two_r").cast("double") / F.lit(2.0)
    term = r_d * r_d / F.col("ng").cast("double")
    m = grp.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sort_array(F.collect_list(term)).alias("terms"),
    )
    ties = byv.agg(
        F.sum(
            d38(F.col("t")) * d38(F.col("t")) * d38(F.col("t"))
            - d38(F.col("t"))
        ).alias("tie_cubes")
    )
    rsum = F.aggregate("terms", F.lit(0.0), lambda a, x: a + x)
    n_d = F.col("n").cast("double")
    h = (
        F.lit(12.0) / (n_d * (n_d + F.lit(1.0))) * rsum
        - F.lit(3.0) * (n_d + F.lit(1.0))
    )
    corr = F.lit(1.0) - F.col("tie_cubes").cast("double") / (
        n_d * n_d * n_d - n_d
    )
    return m.crossJoin(F.broadcast(ties)).select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        trunc6(h).alias("h_stat"),
        trunc6(h / corr).alias("h_adj"),
    )


# ---------------------------------------------------------------------------
# Brown–Forsythe (median-based Levene) variance-homogeneity test (round 9)
# ---------------------------------------------------------------------------


@query(
    "stats_levene_bf",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      FROM events
    ), gv AS (
      SELECT event_type, v, count(*) AS c FROM q GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cc,
             sum(c) OVER (PARTITION BY event_type) AS ng
      FROM gv
    ), med AS (
      SELECT event_type, min(CASE WHEN 2 * cc >= ng THEN v END) AS mv
      FROM cum GROUP BY event_type
    ), z AS (
      SELECT gv.event_type, abs(gv.v - med.mv) AS z, gv.c
      FROM gv JOIN med USING (event_type)
    ), g AS (
      SELECT event_type, CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS ng,
             CAST(sum(CAST(c AS HUGEINT) * z) AS HUGEINT) AS s1,
             CAST(sum(CAST(c AS HUGEINT) * z * z) AS HUGEINT) AS s2
      FROM z GROUP BY event_type
    ), m AS (
      SELECT CAST(sum(ng) AS HUGEINT) AS n, count(*) AS k,
             CAST(sum(s1) AS HUGEINT) AS gs1,
             CAST(sum(s2) AS HUGEINT) AS gs2,
             list_reduce(list_prepend(0.0,
               list(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                    / CAST(ng AS DOUBLE) ORDER BY
                 CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(ng AS DOUBLE))),
               (a, b) -> a + b) AS tsum
      FROM g
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           floor(((tsum - CAST(gs1 AS DOUBLE) * CAST(gs1 AS DOUBLE)
                          / CAST(n AS DOUBLE)) / (k - 1))
                 / ((CAST(gs2 AS DOUBLE) - tsum) / (CAST(n AS BIGINT) - k))
                 * 1000000.0) / 1000000.0 AS w_stat
    FROM m
    """,
)
def stats_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (Levene with group MEDIANS): are event
    ``value`` variances homogeneous across event types? The
    gatekeeper assumption check for ``stats_anova_f`` — W is exactly
    the one-way F statistic applied to the absolute deviations
    ``z = |x − median_g|``.

    Exactness: group medians come off the (type, cent) grid by a
    PARTITIONED cumulative count (lower median: first cent value with
    2·cum ≥ n_g — a deterministic convention shared by both engines);
    z is then integer cents, its ANOVA moments ride HUGEINT/
    DECIMAL(38,0), and the per-group (Σz)²/n_g terms are summed by the
    stats_anova_f sorted fold.

    Plan shape at 100 TB: ONE corpus pass to the (type, cent) grid;
    medians, moments, and the F assembly all run over bounded grids
    (k · value-domain rows); the only windows are PARTITIONED BY
    event_type over the grid — no global window, no second corpus
    pass, no join back to raw rows (deviations are computed on the
    grid itself).
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    gv = q.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    cum = gv.select(
        "event_type",
        "v",
        "c",
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c").over(w_all).alias("ng"),
    )
    med = cum.groupBy("event_type").agg(
        F.min(F.when(2 * F.col("cc") >= F.col("ng"), F.col("v"))).alias(
            "mv"
        )
    )
    z = gv.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v") - F.col("mv")).alias("z"), "c"
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = z.groupBy("event_type").agg(
        F.sum(d38(F.col("c"))).alias("ng"),
        F.sum(d38(F.col("c")) * d38(F.col("z"))).alias("s1"),
        F.sum(
            d38(F.col("c")) * d38(F.col("z")) * d38(F.col("z"))
        ).alias("s2"),
    )
    s1_d = F.col("s1").cast("double")
    term = s1_d * s1_d / F.col("ng").cast("double")
    m = g.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("s1").alias("gs1"),
        F.sum("s2").alias("gs2"),
        F.sort_array(F.collect_list(term)).alias("terms"),
    )
    tsum = F.aggregate("terms", F.lit(0.0), lambda a, x: a + x)
    n_d = F.col("n").cast("double")
    k_d = F.col("k").cast("double")
    gs1_d = F.col("gs1").cast("double")
    ssb = tsum - gs1_d * gs1_d / n_d
    ssw = F.col("gs2").cast("double") - tsum
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        trunc6(
            (ssb / (k_d - F.lit(1.0))) / (ssw / (n_d - k_d))
        ).alias("w_stat"),
    )


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR over per-type mean tests (round 9)
# ---------------------------------------------------------------------------

#: Abramowitz & Stegun 7.1.26 erf coefficients (|error| < 1.5e-7) —
#: ONE definition drives both the Spark expression and the SQL text so
#: the two engines evaluate the identical IEEE tree.
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_FDR_ALPHA = 0.05


def _erfc_sql(x: str) -> str:
    """DuckDB text for erfc(x), x >= 0, via A&S 7.1.26:
    erfc(x) = poly(t) * exp(-x²), t = 1/(1 + p·x)."""
    t = f"(1.0 / (1.0 + {_AS_P} * ({x})))"
    a1, a2, a3, a4, a5 = _AS_A
    poly = f"((((({a5} * {t} + {a4}) * {t} + {a3}) * {t} + {a2}) * {t} + {a1}) * {t})"
    return f"({poly} * exp(-(({x}) * ({x}))))"


def _erfc_col(x):
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * x)
    a1, a2, a3, a4, a5 = _AS_A
    poly = (
        (
            (
                (F.lit(a5) * t + F.lit(a4)) * t + F.lit(a3)
            ) * t + F.lit(a2)
        ) * t + F.lit(a1)
    ) * t
    return poly * F.exp(-(x * x))


def _fdr_oracle() -> str:
    z_abs = "abs_z"
    p_expr = _erfc_sql(f"({z_abs} / sqrt(2.0))")
    return f"""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS mv
      FROM events
    ), g AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS ng,
             CAST(sum(CAST(mv AS HUGEINT)) AS HUGEINT) AS s1
      FROM q GROUP BY event_type
    ), tot AS (
      SELECT CAST(sum(CAST(mv AS HUGEINT)) AS HUGEINT) AS gs1,
             CAST(sum(CAST(mv AS HUGEINT) * mv) AS HUGEINT) AS gs2,
             CAST(count(*) AS HUGEINT) AS n
      FROM q
    ), zs AS (
      SELECT event_type, CAST(ng AS BIGINT) AS n_g,
             abs((CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE)
                  - CAST(gs1 AS DOUBLE) / CAST(n AS DOUBLE))
                 / (sqrt((CAST(gs2 AS DOUBLE)
                          - CAST(gs1 AS DOUBLE) * CAST(gs1 AS DOUBLE)
                            / CAST(n AS DOUBLE))
                         / CAST(n - 1 AS DOUBLE))
                    / sqrt(CAST(ng AS DOUBLE)))) AS abs_z
      FROM g CROSS JOIN tot
    ), ps AS (
      SELECT event_type, n_g, abs_z, {p_expr} AS p
      FROM zs
    ), ranked AS (
      SELECT event_type, n_g, abs_z, p,
             row_number() OVER (ORDER BY p, event_type) AS rnk,
             count(*) OVER () AS m
      FROM ps
    ), cut AS (
      SELECT coalesce(max(CASE WHEN p <= {_FDR_ALPHA} * rnk / m
                                THEN rnk END), 0) AS cutoff
      FROM ranked
    )
    SELECT event_type, n_g,
           floor(abs_z * 1000000.0) / 1000000.0 AS abs_z,
           floor(p * 1000000.0) / 1000000.0 AS p_value,
           CAST(rnk AS BIGINT) AS rnk,
           CASE WHEN rnk <= cutoff THEN 1 ELSE 0 END AS reject
    FROM ranked CROSS JOIN cut
    ORDER BY rnk
    """


@query("stats_fdr_bh", oracle=_fdr_oracle())
def stats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control over the per-event-type family
    of mean tests: each type's mean event value is z-tested against
    the corpus mean (corpus sd as the known σ — the screening
    convention), p-values from the Abramowitz–Stegun 7.1.26 erfc
    polynomial (|err| < 1.5e-7, far inside the ppm output grid), and
    the BH step-up rule rejects ranks ≤ max{i : p_(i) ≤ αi/m} at
    α = 0.05. The multiple-testing companion the per-test battery
    (welch/anova/mannwhitney) needs once k families are screened.

    Exactness: milli-grid integer moments on HUGEINT/DECIMAL(38,0);
    z and p are per-GROUP float assemblies over identical exact
    operands (the erfc polynomial is one shared literal tree — both
    engines run the same IEEE sequence); ordering ties break on
    event_type.

    Plan shape at 100 TB: one corpus grouped aggregate (k rows out) +
    one 1-row total, broadcast-joined; the rank window and the BH
    cutoff run over the k-row family table (bounded by |event types|,
    never corpus rows — whitelisted global window).
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5))
        .cast("long")
        .alias("mv"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("ng"),
        F.sum(d38(F.col("mv"))).alias("s1"),
    )
    tot = q.agg(
        F.sum(d38(F.col("mv"))).alias("gs1"),
        F.sum(d38(F.col("mv")) * d38(F.col("mv"))).alias("gs2"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ng_d = F.col("ng").cast("double")
    n_d = F.col("n").cast("double")
    gs1_d = F.col("gs1").cast("double")
    mean_g = F.col("s1").cast("double") / ng_d
    mean_all = gs1_d / n_d
    sd = F.sqrt(
        (F.col("gs2").cast("double") - gs1_d * gs1_d / n_d)
        / (n_d - F.lit(1.0))
    )
    abs_z = F.abs((mean_g - mean_all) / (sd / F.sqrt(ng_d)))
    ps = j.select(
        "event_type",
        F.col("ng").cast("long").alias("n_g"),
        abs_z.alias("abs_z"),
        _erfc_col(abs_z / F.sqrt(F.lit(2.0))).alias("p"),
    )
    w_rank = Window.orderBy("p", "event_type")
    ranked = ps.select(
        "event_type",
        "n_g",
        "abs_z",
        "p",
        F.row_number().over(w_rank).alias("rnk"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))
        ).alias("m"),
    )
    cut = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p")
                    <= F.lit(_FDR_ALPHA)
                    * F.col("rnk")
                    / F.col("m"),
                    F.col("rnk"),
                )
            ),
            F.lit(0),
        ).alias("cutoff")
    )
    return (
        ranked.crossJoin(F.broadcast(cut))
        .select(
            "event_type",
            "n_g",
            trunc6(F.col("abs_z")).alias("abs_z"),
            trunc6(F.col("p")).alias("p_value"),
            F.col("rnk").cast("long").alias("rnk"),
            F.when(F.col("rnk") <= F.col("cutoff"), 1)
            .otherwise(0)
            .alias("reject"),
        )
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# Cochran–Armitage trend test (round 9)
# ---------------------------------------------------------------------------


@query(
    "stats_cochran_armitage",
    oracle="""
    WITH q AS (
      SELECT (epoch_us(ts) // 86400000000) % 7 AS w,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r
      FROM events
    ), g AS (
      SELECT w, CAST(count(*) AS HUGEINT) AS ni,
             CAST(sum(r) AS HUGEINT) AS ri
      FROM q GROUP BY w
    ), m AS (
      SELECT CAST(sum(ni) AS HUGEINT) AS n,
             CAST(sum(ri) AS HUGEINT) AS rr,
             CAST(sum(w * ri) AS HUGEINT) AS swr,
             CAST(sum(w * ni) AS HUGEINT) AS swn,
             CAST(sum(w * w * ni) AS HUGEINT) AS swwn
      FROM g
    )
    SELECT CAST(n AS BIGINT) AS n,
           floor((CAST(swr AS DOUBLE)
                  - CAST(rr AS DOUBLE) * CAST(swn AS DOUBLE)
                    / CAST(n AS DOUBLE))
                 / sqrt((CAST(rr AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(rr AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(swwn AS DOUBLE)
                           - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE)
                             / CAST(n AS DOUBLE)))
                 * 1000000.0) / 1000000.0 AS z_trend,
           CASE WHEN abs(floor((CAST(swr AS DOUBLE)
                  - CAST(rr AS DOUBLE) * CAST(swn AS DOUBLE)
                    / CAST(n AS DOUBLE))
                 / sqrt((CAST(rr AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(rr AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(swwn AS DOUBLE)
                           - CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE)
                             / CAST(n AS DOUBLE)))
                 * 1000000.0)) > 1959963 THEN 1 ELSE 0 END AS reject
    FROM m
    """,
)
def stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test: does the purchase PROPORTION trend
    monotonically across the day-of-week exposure grades (scores
    w = 0..6)? The TREND companion of ``chisq_type_by_day``'s
    unordered association test — with ordered categories the 1-df
    trend statistic has far more power than the omnibus χ².
    ``z = Σw(r_w − n_w·p̄) / √(p̄(1−p̄)(Σw²n_w − (Σwn_w)²/N))``,
    rejecting two-sided at α = 0.05 on the shared ppm grid.

    Exactness: all five moments (N, R, Σwr, Σwn, Σw²n) are exact
    integers on HUGEINT/DECIMAL(38,0) off a 7-row grade table; z is a
    1-row float assembly.

    Plan shape at 100 TB: ONE map-side-combinable grouped aggregate to
    the 7-row day-of-week table, one 1-row re-aggregate — no windows,
    no joins.
    """
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        (F.expr("(ts div 1000) div 86400000000") % 7).alias("w"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "r"
        ),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = q.groupBy("w").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("ni"),
        F.sum(d38(F.col("r"))).alias("ri"),
    )
    m = g.agg(
        F.sum("ni").alias("n"),
        F.sum("ri").alias("rr"),
        F.sum(d38(F.col("w")) * F.col("ri")).alias("swr"),
        F.sum(d38(F.col("w")) * F.col("ni")).alias("swn"),
        F.sum(d38(F.col("w")) * d38(F.col("w")) * F.col("ni")).alias(
            "swwn"
        ),
    )
    n_d = F.col("n").cast("double")
    rr_d = F.col("rr").cast("double")
    p = rr_d / n_d
    num = F.col("swr").cast("double") - rr_d * F.col("swn").cast(
        "double"
    ) / n_d
    den = F.sqrt(
        p
        * (F.lit(1.0) - p)
        * (
            F.col("swwn").cast("double")
            - F.col("swn").cast("double")
            * F.col("swn").cast("double")
            / n_d
        )
    )
    z_ppm = F.floor(num / den * F.lit(1e6))
    return m.select(
        F.col("n").cast("long").alias("n"),
        (z_ppm / F.lit(1e6)).alias("z_trend"),
        F.when(F.abs(z_ppm) > 1959963, 1).otherwise(0).alias("reject"),
    )


# ---------------------------------------------------------------------------
# Granger causality (lag-1, daily purchase vs view counts) — round 9
# ---------------------------------------------------------------------------


def _granger_assembly_sql() -> str:
    """The float assembly (centered moments → restricted/unrestricted
    OLS → F) as ONE SQL string over the exact integer moment columns
    (n, sy, s1, s2, syy, s11, s22, s12, s1y, s2y) — shared textually
    by the Spark plan and the DuckDB oracle (the ml_ridge_closed_form
    discipline). Literals are CAST(... AS DOUBLE): Spark parses bare
    float literals as DECIMAL."""
    nd = "CAST(n AS DOUBLE)"

    def cen(ij, i, j):
        return (
            f"(CAST(s{ij} AS DOUBLE) - CAST(s{i} AS DOUBLE)"
            f" * CAST(s{j} AS DOUBLE) / {nd})"
        )

    s11 = cen("11", "1", "1")
    s22 = cen("22", "2", "2")
    s12 = cen("12", "1", "2")
    s1y = cen("1y", "1", "y")
    s2y = cen("2y", "2", "y")
    syy = cen("yy", "y", "y")
    det = f"({s11} * {s22} - {s12} * {s12})"
    b1 = f"(({s1y} * {s22} - {s2y} * {s12}) / {det})"
    b2 = f"(({s2y} * {s11} - {s1y} * {s12}) / {det})"
    sse_u = f"({syy} - ({b1} * {s1y} + {b2} * {s2y}))"
    sse_r = f"({syy} - {s1y} * {s1y} / {s11})"
    f_stat = (
        f"(({sse_r} - {sse_u})"
        f" * (CAST(n AS DOUBLE) - CAST(3 AS DOUBLE)) / {sse_u})"
    )
    t6 = lambda e: (  # noqa: E731
        f"floor({e} * CAST(1000000 AS DOUBLE)) / CAST(1000000 AS DOUBLE)"
    )
    return (
        f"CAST(n AS BIGINT) AS n, {t6(b1)} AS b_p_lag,"
        f" {t6(b2)} AS b_v_lag, {t6(f_stat)} AS f_granger"
    )


@query(
    "ts_granger",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS p,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS v
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT p AS y,
             lag(p) OVER (ORDER BY day) AS x1,
             lag(v) OVER (ORDER BY day) AS x2
      FROM daily
    ), m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(sum(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
             CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
             CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
             CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
             CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
             CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y
      FROM lagged WHERE x1 IS NOT NULL
    )
    SELECT {_granger_assembly_sql()} FROM m
    """,
)
def ts_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality: do yesterday's VIEW counts improve the
    prediction of today's PURCHASE counts beyond yesterday's purchases
    alone? Restricted model ``p_t ~ p_{{t-1}}`` vs unrestricted
    ``p_t ~ p_{{t-1}} + v_{{t-1}}`` over the OBSERVED day sequence;
    ``F = (SSE_r − SSE_u)(n−3)/SSE_u`` with 1 numerator df — the
    causal-screening companion of ``ts_ar1_forecast`` (same day grid,
    same lag construction) and ``stats_linreg``.

    Exactness: daily counts are integers, so ALL ten moments are exact
    on HUGEINT/DECIMAL(38,0); the entire float assembly (centered
    moments, the 2×2 Cramer solve, both SSEs, F) is ONE SQL string
    shared textually between F.expr and the oracle — identical IEEE
    tree by construction.

    Plan shape at 100 TB: one corpus grouped aggregate to the DAY grid
    (observation-window bounded); the lag window and the moment
    aggregate run over that bounded grid (whitelisted global window,
    the ts_ar1_forecast argument); one 1-row projection.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("(ts div 1000) div 86400000000").alias("day"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("is_p"),
            F.when(F.col("event_type") == "view", 1)
            .otherwise(0)
            .alias("is_v"),
        )
        .groupBy("day")
        .agg(
            F.sum("is_p").alias("p"),
            F.sum("is_v").alias("v"),
        )
    )
    w_day = Window.orderBy("day")
    lagged = daily.select(
        F.col("p").alias("y"),
        F.lag("p").over(w_day).alias("x1"),
        F.lag("v").over(w_day).alias("x2"),
    ).where(F.col("x1").isNotNull())
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = lagged.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d38("y")).alias("sy"),
        F.sum(d38("x1")).alias("s1"),
        F.sum(d38("x2")).alias("s2"),
        F.sum(d38("y") * d38("y")).alias("syy"),
        F.sum(d38("x1") * d38("x1")).alias("s11"),
        F.sum(d38("x2") * d38("x2")).alias("s22"),
        F.sum(d38("x1") * d38("x2")).alias("s12"),
        F.sum(d38("x1") * d38("y")).alias("s1y"),
        F.sum(d38("x2") * d38("y")).alias("s2y"),
    )
    from speech_data_pipeline_spark.queries.ml_q import _split_top_level

    return m.selectExpr(
        *[e.strip() for e in _split_top_level(_granger_assembly_sql())]
    )


# ---------------------------------------------------------------------------
# Weekly periodogram (spectral seasonality detection) — round 9
# ---------------------------------------------------------------------------

import math as _math

#: Fourier weights at the weekly (p=7) and control (p=11) periods,
#: NANO-quantized INTEGER constants computed ONCE here and inlined as
#: literals in BOTH engines — no libm cos/sin at query time, so the
#: per-day products are exact integers and the cross-row sums are
#: order-immune DECIMAL arithmetic.
_PGRAM_PERIODS = (7, 11)
_PGRAM_W = {
    p: (
        tuple(round(_math.cos(2 * _math.pi * k / p) * 1e9) for k in range(p)),
        tuple(round(_math.sin(2 * _math.pi * k / p) * 1e9) for k in range(p)),
    )
    for p in _PGRAM_PERIODS
}


def _pgram_case_sql(p: int, table: tuple) -> str:
    whens = " ".join(
        f"WHEN {k} THEN {table[k]}" for k in range(p)
    )
    return f"(CASE day % {p} {whens} END)"


def _pgram_oracle() -> str:
    moms = []
    for p in _PGRAM_PERIODS:
        wc, ws = _PGRAM_W[p]
        moms.append(
            f"CAST(sum(CAST(x AS HUGEINT) * {_pgram_case_sql(p, wc)})"
            f" AS HUGEINT) AS a{p},"
            f" CAST(sum(CAST(x AS HUGEINT) * {_pgram_case_sql(p, ws)})"
            f" AS HUGEINT) AS b{p},"
            f" CAST(sum(CAST({_pgram_case_sql(p, wc)} AS HUGEINT))"
            f" AS HUGEINT) AS wc{p},"
            f" CAST(sum(CAST({_pgram_case_sql(p, ws)} AS HUGEINT))"
            f" AS HUGEINT) AS ws{p}"
        )
    mom_sql = ", ".join(moms)
    outs = []
    for p in _PGRAM_PERIODS:
        ac = (
            f"((CAST(a{p} AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"
            f" * CAST(wc{p} AS DOUBLE)) / 1000000000.0)"
        )
        bc = (
            f"((CAST(b{p} AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"
            f" * CAST(ws{p} AS DOUBLE)) / 1000000000.0)"
        )
        pw = f"(2.0 * ({ac} * {ac} + {bc} * {bc}) / CAST(n AS DOUBLE))"
        outs.append(
            f"floor({pw} * 1000000.0) / 1000000.0 AS power_{p},"
            f" floor({pw} / ((CAST(sxx AS DOUBLE)"
            f" - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"
            f" / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))"
            f" * 1000000.0) / 1000000.0 AS ratio_{p}"
        )
    out_sql = ", ".join(outs)
    return f"""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ), m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             {mom_sql}
      FROM daily
    )
    SELECT CAST(n AS BIGINT) AS n_days, {out_sql} FROM m
    """


@query("ts_periodogram_weekly", oracle=_pgram_oracle())
def ts_periodogram_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral seasonality detection: the periodogram of the daily
    event-count series at the WEEKLY frequency (period 7) beside a
    non-seasonal control (period 11) — ``I_p = 2(A_p² + B_p²)/n`` with
    mean-corrected Fourier sums, plus each power as a fraction of the
    series variance. The frequency-domain companion of
    ``ts_seasonal_profile`` (that row shows the day-of-week SHAPE;
    this one quantifies how much variance the weekly line carries vs a
    control frequency).

    Exactness trick: the only transcendental inputs, cos/sin(2πk/p),
    take exactly p distinct values — they are computed ONCE in Python,
    NANO-quantized to integers, and inlined as CASE literals in BOTH
    engines. Per-day products and all cross-row sums are therefore
    exact integers on HUGEINT/DECIMAL(38,0) (no libm at query time, no
    float accumulation across partitions); the mean correction and the
    two power assemblies are 1-row float expressions.

    Plan shape at 100 TB: one corpus grouped aggregate to the DAY grid,
    one grid aggregate (the CASE weights are in-row literals), one
    1-row projection — no windows, no joins.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.expr("(ts div 1000) div 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def case_col(p: int, table: tuple):
        c = None
        for k in range(p):
            cond = (F.col("day") % p) == k
            c = (
                F.when(cond, F.lit(table[k]))
                if c is None
                else c.when(cond, F.lit(table[k]))
            )
        return c

    aggs = [
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d38(F.col("x"))).alias("sx"),
        F.sum(d38(F.col("x")) * d38(F.col("x"))).alias("sxx"),
    ]
    for p in _PGRAM_PERIODS:
        wc, ws = _PGRAM_W[p]
        aggs.append(
            F.sum(d38(F.col("x")) * d38(case_col(p, wc))).alias(f"a{p}")
        )
        aggs.append(
            F.sum(d38(F.col("x")) * d38(case_col(p, ws))).alias(f"b{p}")
        )
        aggs.append(F.sum(d38(case_col(p, wc))).alias(f"wc{p}"))
        aggs.append(F.sum(d38(case_col(p, ws))).alias(f"ws{p}"))
    m = daily.agg(*aggs)
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    var = (
        F.col("sxx").cast("double") - sx_d * sx_d / n_d
    ) / n_d
    cols = [F.col("n").cast("long").alias("n_days")]
    for p in _PGRAM_PERIODS:
        ac = (
            F.col(f"a{p}").cast("double")
            - sx_d / n_d * F.col(f"wc{p}").cast("double")
        ) / F.lit(1e9)
        bc = (
            F.col(f"b{p}").cast("double")
            - sx_d / n_d * F.col(f"ws{p}").cast("double")
        ) / F.lit(1e9)
        pw = F.lit(2.0) * (ac * ac + bc * bc) / n_d
        cols.append(trunc6(pw).alias(f"power_{p}"))
        cols.append(trunc6(pw / var).alias(f"ratio_{p}"))
    return m.select(*cols)


# ---------------------------------------------------------------------------
# round 10: Wilson CIs, Friedman test, balanced two-way ANOVA
# ---------------------------------------------------------------------------

#: z for a 95% two-sided interval (fixed literal on both engines)
_WILSON_Z = 1.959964


@query(
    "stats_wilson_ci",
    oracle=f"""
    WITH q AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                           > 10000 THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, x,
           floor((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0)
             / 1000000.0 AS p_hat,
           floor(((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                   + ({_WILSON_Z} * {_WILSON_Z}) / (2.0 * CAST(n AS DOUBLE))
                   - {_WILSON_Z} * sqrt(
                       (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                       / CAST(n AS DOUBLE)
                       + ({_WILSON_Z} * {_WILSON_Z})
                         / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                  / (1.0 + ({_WILSON_Z} * {_WILSON_Z}) / CAST(n AS DOUBLE)))
                 * 1000000.0) / 1000000.0 AS lo,
           floor(((CAST(x AS DOUBLE) / CAST(n AS DOUBLE)
                   + ({_WILSON_Z} * {_WILSON_Z}) / (2.0 * CAST(n AS DOUBLE))
                   + {_WILSON_Z} * sqrt(
                       (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                       / CAST(n AS DOUBLE)
                       + ({_WILSON_Z} * {_WILSON_Z})
                         / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                  / (1.0 + ({_WILSON_Z} * {_WILSON_Z}) / CAST(n AS DOUBLE)))
                 * 1000000.0) / 1000000.0 AS hi
    FROM q ORDER BY event_type
    """,
)
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for the per-event-type
    proportion of high-value events (cent-quantized value > 100.00) —
    the interval that stays inside [0, 1] and behaves at small n,
    which is why conversion dashboards use it over the Wald CI.

    Exactness: (n, x) are exact integer aggregates; p̂, lo, hi are one
    closed-form float assembly per output row over identical operands
    on any engine (the z constant is a shared literal).

    Plan shape at 100 TB: one grouped integer aggregate (map-side
    combinable) over the scan; output bounded by the type vocabulary.
    """
    ev = load_table(spark, sf_dir, "events")
    cent = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    q = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(cent > 10000, 1).otherwise(0)).cast("long").alias("x"),
    )
    z = F.lit(_WILSON_Z)
    nd = F.col("n").cast("double")
    p = F.col("x").cast("double") / nd
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / nd + (z * z) / (F.lit(4.0) * nd * nd)
    )
    denom = F.lit(1.0) + (z * z) / nd
    center = p + (z * z) / (F.lit(2.0) * nd)
    return q.select(
        "event_type",
        "n",
        "x",
        trunc6(p).alias("p_hat"),
        trunc6((center - half) / denom).alias("lo"),
        trunc6((center + half) / denom).alias("hi"),
    ).orderBy("event_type")


@query(
    "stats_friedman_test",
    oracle="""
    WITH obs AS (
      SELECT user_id, event_type,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS s
      FROM events GROUP BY user_id, event_type
    ), kk AS (
      SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM events
    ), blocks AS (
      SELECT user_id FROM obs GROUP BY user_id
      HAVING count(*) = (SELECT k FROM kk)
    ), ranked AS (
      SELECT o.user_id, o.event_type,
             2 * rank() OVER (PARTITION BY o.user_id ORDER BY o.s)
               + count(*) OVER (PARTITION BY o.user_id, o.s) - 1 AS r2
      FROM obs o JOIN blocks b USING (user_id)
    ), pertreat AS (
      SELECT event_type, CAST(sum(r2) AS BIGINT) AS rank2_sum
      FROM ranked GROUP BY event_type
    ), scalars AS (
      SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n,
             CAST(sum(r2 * r2) AS BIGINT) AS a2
      FROM ranked
    ), qstat AS (
      SELECT n, k,
             CASE WHEN a2 - n * k * (k + 1) * (k + 1) = 0 THEN 0.0
                  ELSE CAST(k - 1 AS DOUBLE)
                       * CAST((SELECT sum((rank2_sum - n * (k + 1))
                                          * (rank2_sum - n * (k + 1)))
                               FROM pertreat) AS DOUBLE)
                       / CAST(a2 - n * k * (k + 1) * (k + 1) AS DOUBLE)
                  END AS q
      FROM scalars CROSS JOIN kk
    )
    SELECT p.event_type, p.rank2_sum,
           floor((CAST(p.rank2_sum AS DOUBLE)
                  / (2.0 * CAST(s.n AS DOUBLE))) * 1000000.0)
             / 1000000.0 AS mean_rank,
           s.n, s.k,
           floor(s.q * 1000000.0) / 1000000.0 AS q_stat
    FROM pertreat p CROSS JOIN qstat s
    ORDER BY p.event_type
    """,
)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test for treatment effects across matched blocks:
    blocks = users, treatments = event types, observation = total
    cent-quantized value per (user, type); only COMPLETE blocks (users
    with all k types) enter, per the test's matched design. Uses the
    tie-robust Conover form ``Q = (k−1)·Σ_j(R_j − n(k+1)/2)² /
    (Σr² − nk(k+1)²/4)`` — the nonparametric two-way companion of
    ``stats_kruskal_wallis`` (repeated measures instead of independent
    groups).

    Exactness: ranks live in half-unit integers (``r2 = 2·rank``:
    average ranks of ties are exact), so every cross-row accumulation
    is an integer sum; Q is one float assembly over exact integers.

    Plan shape at 100 TB: grouped integer aggregate to (user, type)
    rows; the rank window partitions by user over ≤k rows each —
    perfectly parallel; everything after is vocabulary-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    cent = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    obs = ev.groupBy("user_id", "event_type").agg(
        F.sum(cent).cast("long").alias("s")
    )
    kk = ev.agg(F.countDistinct("event_type").cast("long").alias("k"))
    blocks = (
        obs.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(kk))
        .where(F.col("c") == F.col("k"))
        .select("user_id")
    )
    w_rank = Window.partitionBy("user_id").orderBy("s")
    w_tie = Window.partitionBy("user_id", "s")
    ranked = (
        obs.join(blocks, "user_id")
        .withColumn(
            "r2",
            F.lit(2) * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - F.lit(1),
        )
    )
    pertreat = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("long").alias("rank2_sum")
    )
    scalars = ranked.agg(
        F.countDistinct("user_id").cast("long").alias("n"),
        F.sum(F.col("r2") * F.col("r2")).cast("long").alias("a2"),
    ).crossJoin(F.broadcast(kk))
    num = pertreat.crossJoin(F.broadcast(scalars)).agg(
        F.sum(
            (F.col("rank2_sum") - F.col("n") * (F.col("k") + 1))
            * (F.col("rank2_sum") - F.col("n") * (F.col("k") + 1))
        ).alias("ssq")
    )
    qstat = (
        scalars.crossJoin(F.broadcast(num))
        .select(
            "n",
            "k",
            F.when(
                F.col("a2")
                - F.col("n") * F.col("k") * (F.col("k") + 1)
                * (F.col("k") + 1)
                == 0,
                F.lit(0.0),
            )
            .otherwise(
                (F.col("k") - 1).cast("double")
                * F.col("ssq").cast("double")
                / (
                    F.col("a2")
                    - F.col("n") * F.col("k") * (F.col("k") + 1)
                    * (F.col("k") + 1)
                ).cast("double")
            )
            .alias("q"),
        )
    )
    return (
        pertreat.crossJoin(F.broadcast(qstat))
        .select(
            "event_type",
            "rank2_sum",
            trunc6(
                F.col("rank2_sum").cast("double")
                / (F.lit(2.0) * F.col("n").cast("double"))
            ).alias("mean_rank"),
            "n",
            "k",
            trunc6(F.col("q")).alias("q_stat"),
        )
        .orderBy("event_type")
    )


@query(
    "stats_anova_twoway",
    oracle="""
    WITH base AS (
      SELECT event_type AS fa,
             (epoch_us(ts) // 86400000000) % 7 AS fb,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
             event_id
      FROM events
    ), cellcount AS (
      SELECT fa, fb, count(*) AS c FROM base GROUP BY fa, fb
    ), mm AS (SELECT CAST(min(c) AS BIGINT) AS m FROM cellcount),
    trimmed AS (
      SELECT fa, fb, v FROM (
        SELECT fa, fb, v,
               row_number() OVER (PARTITION BY fa, fb ORDER BY event_id)
                 AS rn
        FROM base
      ) WHERE rn <= (SELECT m FROM mm)
    ), cells AS (
      SELECT fa, fb, CAST(sum(v) AS BIGINT) AS t FROM trimmed
      GROUP BY fa, fb
    ), marg AS (
      SELECT CAST(count(DISTINCT fa) AS BIGINT) AS a,
             CAST(count(DISTINCT fb) AS BIGINT) AS b,
             CAST(sum(CAST(t AS HUGEINT)) AS HUGEINT) AS tt,
             CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS scell
      FROM cells
    ), ma AS (
      SELECT CAST(sum(CAST(ti AS HUGEINT) * ti) AS HUGEINT) AS sa
      FROM (SELECT fa, CAST(sum(t) AS BIGINT) AS ti FROM cells GROUP BY fa)
    ), mb AS (
      SELECT CAST(sum(CAST(tj AS HUGEINT) * tj) AS HUGEINT) AS sb
      FROM (SELECT fb, CAST(sum(t) AS BIGINT) AS tj FROM cells GROUP BY fb)
    ), sv AS (
      SELECT CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sv2
      FROM trimmed
    ), f AS (
      SELECT CAST(a AS DOUBLE) AS a, CAST(b AS DOUBLE) AS b,
             CAST(m AS DOUBLE) AS m,
             CAST(tt AS DOUBLE) AS tt, CAST(scell AS DOUBLE) AS scell,
             CAST(sa AS DOUBLE) AS sa, CAST(sb AS DOUBLE) AS sb,
             CAST(sv2 AS DOUBLE) AS sv2
      FROM marg CROSS JOIN ma CROSS JOIN mb CROSS JOIN sv CROSS JOIN mm
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
           CAST(m AS BIGINT) AS m,
           floor((sa / (b * m) - tt * tt / (a * b * m)) * 1000000.0)
             / 1000000.0 AS ss_a,
           floor((sb / (a * m) - tt * tt / (a * b * m)) * 1000000.0)
             / 1000000.0 AS ss_b,
           floor(((scell / m - tt * tt / (a * b * m))
                  - (sa / (b * m) - tt * tt / (a * b * m))
                  - (sb / (a * m) - tt * tt / (a * b * m))) * 1000000.0)
             / 1000000.0 AS ss_int,
           floor((sv2 - scell / m) * 1000000.0) / 1000000.0 AS ss_err,
           floor(((sa / (b * m) - tt * tt / (a * b * m)) / (a - 1.0))
                 / ((sv2 - scell / m) / (a * b * m - a * b))
                 * 1000000.0) / 1000000.0 AS f_a,
           floor(((sb / (a * m) - tt * tt / (a * b * m)) / (b - 1.0))
                 / ((sv2 - scell / m) / (a * b * m - a * b))
                 * 1000000.0) / 1000000.0 AS f_b,
           floor((((scell / m - tt * tt / (a * b * m))
                   - (sa / (b * m) - tt * tt / (a * b * m))
                   - (sb / (a * m) - tt * tt / (a * b * m)))
                  / ((a - 1.0) * (b - 1.0)))
                 / ((sv2 - scell / m) / (a * b * m - a * b))
                 * 1000000.0) / 1000000.0 AS f_int
    FROM f
    """,
)
def stats_anova_twoway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced two-way ANOVA with interaction: factors = event type ×
    weekday (epoch-day mod 7, timezone-free), response = cent-quantized
    value. The design is balanced BY CONSTRUCTION — every cell is
    trimmed to the global minimum cell count (first-m by event_id,
    deterministic), which is what makes the classical closed-form
    sums-of-squares exact (unbalanced designs need regression
    projections that aren't closed-form).

    Exactness: all sums (T, T_i, T_j, T_ij, Σv²) are exact integers
    carried as HUGEINT/DECIMAL(38,0) (Σv² of cent-scaled values
    overflows BIGINT at warehouse scale); SS and F terms are one float
    assembly with identical operand structure on both engines.

    Plan shape at 100 TB: one cell-count aggregate, a per-cell
    row_number trim (a·b = 35 cell partitions — diagnostic-grade; a
    production variant would hash-sample within cells), then grouped
    integer aggregates; output is a single row.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("event_type").alias("fa"),
        (F.expr("(ts div 1000) div 86400000000") % 7).alias("fb"),
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("v"),
        "event_id",
    )
    mm = base.groupBy("fa", "fb").agg(F.count(F.lit(1)).alias("c")).agg(
        F.min("c").cast("long").alias("m")
    )
    w_cell = Window.partitionBy("fa", "fb").orderBy("event_id")
    trimmed = (
        base.withColumn("rn", F.row_number().over(w_cell))
        .crossJoin(F.broadcast(mm))
        .where(F.col("rn") <= F.col("m"))
        .select("fa", "fb", "v")
    )
    cells = trimmed.groupBy("fa", "fb").agg(
        F.sum("v").cast("long").alias("t")
    )
    dec = "decimal(38,0)"
    marg = cells.agg(
        F.countDistinct("fa").cast("long").alias("a"),
        F.countDistinct("fb").cast("long").alias("b"),
        F.sum(F.col("t").cast(dec)).cast(dec).alias("tt"),
        F.sum(
            F.col("t").cast("decimal(19,0)") * F.col("t").cast("decimal(19,0)")
        ).cast(dec).alias("scell"),
    )
    ma = (
        cells.groupBy("fa")
        .agg(F.sum("t").cast("long").alias("ti"))
        .agg(
            F.sum(
                F.col("ti").cast("decimal(19,0)")
                * F.col("ti").cast("decimal(19,0)")
            ).cast(dec).alias("sa")
        )
    )
    mb = (
        cells.groupBy("fb")
        .agg(F.sum("t").cast("long").alias("tj"))
        .agg(
            F.sum(
                F.col("tj").cast("decimal(19,0)")
                * F.col("tj").cast("decimal(19,0)")
            ).cast(dec).alias("sb")
        )
    )
    sv = trimmed.agg(
        F.sum(
            F.col("v").cast("decimal(19,0)") * F.col("v").cast("decimal(19,0)")
        ).cast(dec).alias("sv2")
    )
    f = (
        marg.crossJoin(F.broadcast(ma))
        .crossJoin(F.broadcast(mb))
        .crossJoin(F.broadcast(sv))
        .crossJoin(F.broadcast(mm))
        .select(
            F.col("a").cast("double").alias("ad"),
            F.col("b").cast("double").alias("bd"),
            F.col("m").cast("double").alias("md"),
            F.col("tt").cast("double").alias("ttd"),
            F.col("scell").cast("double").alias("scelld"),
            F.col("sa").cast("double").alias("sad"),
            F.col("sb").cast("double").alias("sbd"),
            F.col("sv2").cast("double").alias("sv2d"),
        )
    )
    a, b, m = F.col("ad"), F.col("bd"), F.col("md")
    tt, scell = F.col("ttd"), F.col("scelld")
    sa, sb, sv2 = F.col("sad"), F.col("sbd"), F.col("sv2d")
    cterm = tt * tt / (a * b * m)
    ss_a = sa / (b * m) - cterm
    ss_b = sb / (a * m) - cterm
    ss_cell = scell / m - cterm
    ss_int = ss_cell - ss_a - ss_b
    ss_err = sv2 - scell / m
    mse = ss_err / (a * b * m - a * b)
    return f.select(
        F.col("ad").cast("long").alias("a"),
        F.col("bd").cast("long").alias("b"),
        F.col("md").cast("long").alias("m"),
        trunc6(ss_a).alias("ss_a"),
        trunc6(ss_b).alias("ss_b"),
        trunc6(ss_int).alias("ss_int"),
        trunc6(ss_err).alias("ss_err"),
        trunc6((ss_a / (a - F.lit(1.0))) / mse).alias("f_a"),
        trunc6((ss_b / (b - F.lit(1.0))) / mse).alias("f_b"),
        trunc6(
            (ss_int / ((a - F.lit(1.0)) * (b - F.lit(1.0)))) / mse
        ).alias("f_int"),
    )


@query(
    "stats_bartlett",
    oracle="""
    WITH q AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      FROM events
    ), g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS sx,
             CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sxx
      FROM q GROUP BY event_type
      HAVING count(*) >= 2
    ), terms AS (
      SELECT n, sx, sxx,
             CAST(floor(CAST(n - 1 AS DOUBLE)
               * ln((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
               * 1e9) AS BIGINT) AS lnq,
             CAST(floor(1e9 / CAST(n - 1 AS DOUBLE)) AS BIGINT) AS invq,
             CAST(floor(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                        / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS sxnq
      FROM g
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS nt,
             CAST(sum(lnq) AS BIGINT) AS sum_ln,
             CAST(sum(invq) AS BIGINT) AS sum_inv,
             CAST(sum(sxx) AS HUGEINT) AS txx,
             CAST(sum(sxnq) AS BIGINT) AS sxn_sum
      FROM terms
    )
    SELECT k, nt,
           floor(((CAST(nt - k AS DOUBLE)
                   * ln(CAST(nt - k AS DOUBLE)
                        * (CAST(txx AS DOUBLE)
                           - CAST(sxn_sum AS DOUBLE) / 1e6)
                        / CAST(nt - k AS DOUBLE)
                        / CAST(nt - k AS DOUBLE))
                   - CAST(sum_ln AS DOUBLE) / 1e9)
                  / (1.0 + (CAST(sum_inv AS DOUBLE) / 1e9
                            - 1.0 / CAST(nt - k AS DOUBLE))
                           / (3.0 * CAST(k - 1 AS DOUBLE))))
                 * 1000000.0) / 1000000.0 AS chi2
    FROM agg
""",
)
def stats_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for homogeneity of variances across event
    types — the PARAMETRIC companion of ``stats_levene_bf`` (more
    powerful under normality, famously fragile otherwise; a stats
    stack reports both): ``χ² = [(N−k)·ln(S_p²) −
    Σ(n_i−1)·ln(S_i²)] / C`` with the usual correction factor
    ``C = 1 + (Σ1/(n_i−1) − 1/(N−k)) / (3(k−1))``.

    Exactness: per-group moments are exact integers (cents,
    HUGEINT/DECIMAL squares); each group's (n−1)·ln(S²) and 1/(n−1)
    terms are floor-quantized to nano units before summation (the KM
    lnq idiom), as is the pooled Σ(Sx²/n) term (micro units), so every
    cross-row accumulation is integer; the final χ² is one float
    assembly. S_i² uses the unbiased n−1 denominator; the pooled
    S_p² = (ΣSxx − ΣSx²/n)/(N−k) is the within-group SSE over df.

    Plan shape at 100 TB: one grouped integer-moment aggregate
    (map-side combinable), then a ≤|types|-row reduction — 1-row output.
    """
    ev = load_table(spark, sf_dir, "events")
    cent = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    g = ev.select(F.col("event_type"), cent.alias("v")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("sx"),
        F.sum(
            F.col("v").cast("decimal(19,0)") * F.col("v").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("sxx"),
    ).where(F.col("n") >= 2)
    nd = F.col("n").cast("double")
    s2 = (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) / (nd * (F.col("n") - 1).cast("double"))
    terms = g.select(
        "n",
        "sx",
        "sxx",
        F.floor((F.col("n") - 1).cast("double") * F.log(s2) * F.lit(1e9))
        .cast("long")
        .alias("lnq"),
        F.floor(F.lit(1e9) / (F.col("n") - 1).cast("double"))
        .cast("long")
        .alias("invq"),
        F.floor(
            F.col("sx").cast("double")
            * F.col("sx").cast("double")
            / nd
            * F.lit(1e6)
        )
        .cast("long")
        .alias("sxnq"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum("lnq").cast("long").alias("sum_ln"),
        F.sum("invq").cast("long").alias("sum_inv"),
        F.sum("sxx").cast("decimal(38,0)").alias("txx"),
        F.sum("sxnq").cast("long").alias("sxn_sum"),
    )
    nk = (F.col("nt") - F.col("k")).cast("double")
    sse = F.col("txx").cast("double") - F.col("sxn_sum").cast("double") / F.lit(
        1e6
    )
    num = nk * F.log(nk * sse / nk / nk) - F.col("sum_ln").cast(
        "double"
    ) / F.lit(1e9)
    corr = F.lit(1.0) + (
        F.col("sum_inv").cast("double") / F.lit(1e9) - F.lit(1.0) / nk
    ) / (F.lit(3.0) * (F.col("k") - 1).cast("double"))
    return agg.select(
        "k",
        "nt",
        trunc6(num / corr).alias("chi2"),
    )


#: z for the 95% Wald interval on the log rate ratio
_POIS_Z = 1.959964


@query(
    "stats_poisson_ratio",
    oracle=f"""
    WITH c AS (
      SELECT CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x1,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x2
      FROM events
    )
    SELECT x1, x2,
           floor((CAST(x1 AS DOUBLE) / CAST(x2 AS DOUBLE)) * 1000000.0)
             / 1000000.0 AS rate_ratio,
           floor(((CAST(x1 AS DOUBLE) - CAST(x1 + x2 AS DOUBLE) / 2.0)
                  / sqrt(CAST(x1 + x2 AS DOUBLE) / 4.0)) * 1000000.0)
             / 1000000.0 AS z_cond,
           floor(exp(ln(CAST(x1 AS DOUBLE) / CAST(x2 AS DOUBLE))
                     - {_POIS_Z} * sqrt(1.0 / CAST(x1 AS DOUBLE)
                                        + 1.0 / CAST(x2 AS DOUBLE)))
                 * 1000000.0) / 1000000.0 AS rr_lo,
           floor(exp(ln(CAST(x1 AS DOUBLE) / CAST(x2 AS DOUBLE))
                     + {_POIS_Z} * sqrt(1.0 / CAST(x1 AS DOUBLE)
                                        + 1.0 / CAST(x2 AS DOUBLE)))
                 * 1000000.0) / 1000000.0 AS rr_hi
    FROM c
    """,
)
def stats_poisson_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate-ratio test for error vs click event
    counts over identical exposure (same observation window):
    the conditional-binomial z (given n = x₁+x₂, under H₀ x₁ ~
    Bin(n, ½)) and the 95% Wald interval on the log rate ratio
    ``exp(ln(x₁/x₂) ± z·√(1/x₁ + 1/x₂))`` — the incident-rate
    comparison an ops dashboard runs ("did the error rate really go
    up relative to traffic?").

    Exactness: (x₁, x₂) are exact integer counts; every statistic is
    one closed-form float assembly per output column.

    Plan shape at 100 TB: one conditional-count aggregate over the
    scan; 1-row output.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.agg(
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("x1"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x2"),
    )
    x1 = F.col("x1").cast("double")
    x2 = F.col("x2").cast("double")
    n = (F.col("x1") + F.col("x2")).cast("double")
    z = F.lit(_POIS_Z)
    lr = F.log(x1 / x2)
    half = z * F.sqrt(F.lit(1.0) / x1 + F.lit(1.0) / x2)
    return c.select(
        "x1",
        "x2",
        trunc6(x1 / x2).alias("rate_ratio"),
        trunc6((x1 - n / F.lit(2.0)) / F.sqrt(n / F.lit(4.0))).alias(
            "z_cond"
        ),
        trunc6(F.exp(lr - half)).alias("rr_lo"),
        trunc6(F.exp(lr + half)).alias("rr_hi"),
    )


@query(
    "stats_sign_test",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'click'
                      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS clicks,
             CAST(sum(CASE WHEN event_type = 'view'
                      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS views
      FROM events GROUP BY user_id
    ), c AS (
      SELECT CAST(sum(CASE WHEN clicks > views THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN clicks < views THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_neg,
             CAST(sum(CASE WHEN clicks = views THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_tie
      FROM per_user
    )
    SELECT n_pos, n_neg, n_tie,
           CASE WHEN n_pos + n_neg = 0 THEN 0.0
                ELSE floor(((abs(CAST(n_pos - n_neg AS DOUBLE)) - 1.0)
                            / sqrt(CAST(n_pos + n_neg AS DOUBLE)))
                           * 1000000.0) / 1000000.0 END AS z
    FROM c
    """,
)
def stats_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test: does a user's click spend exceed their view
    spend? Counts positive / negative / tied differences of the
    per-user cent totals and reports the continuity-corrected normal
    approximation ``z = (|P−M|−1)/√(P+M)`` — the assumption-free
    paired test (no symmetry needed, unlike Wilcoxon), the first
    sanity check on paired engagement metrics.

    Exactness: totals and counts are exact integers; z is one float
    assembly.

    Plan shape at 100 TB: one per-user conditional aggregate, one
    count reduction; 1-row output.
    """
    ev = load_table(spark, sf_dir, "events")
    cent = F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", cent).otherwise(0))
        .cast("long")
        .alias("clicks"),
        F.sum(F.when(F.col("event_type") == "view", cent).otherwise(0))
        .cast("long")
        .alias("views"),
    )
    c = per_user.agg(
        F.sum(F.when(F.col("clicks") > F.col("views"), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("clicks") < F.col("views"), 1).otherwise(0))
        .cast("long")
        .alias("n_neg"),
        F.sum(F.when(F.col("clicks") == F.col("views"), 1).otherwise(0))
        .cast("long")
        .alias("n_tie"),
    )
    pm = F.col("n_pos") + F.col("n_neg")
    return c.select(
        "n_pos",
        "n_neg",
        "n_tie",
        F.when(pm == 0, F.lit(0.0))
        .otherwise(
            trunc6(
                (
                    F.abs((F.col("n_pos") - F.col("n_neg")).cast("double"))
                    - F.lit(1.0)
                )
                / F.sqrt(pm.cast("double"))
            )
        )
        .alias("z"),
    )
