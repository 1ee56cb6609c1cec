"""Model-evaluation analytics: ROC AUC, per-class confusion/F1, and
inter-rater agreement (Cohen's κ) — the metrics a curation pipeline
computes before trusting a classifier or score as a filter.

All three follow the registry's exact-arithmetic contract: counts and
rank sums cross every shuffle as integers (DECIMAL(38,0) where a
product of corpus-scale counts can exceed BIGINT — n² at 10¹² rows
needs 80 bits), and each metric is formed from the exact sums with a
single float divide, truncated to 6 places. AUC uses the Mann-Whitney
rank-sum identity with midrank tie handling, kept integral by carrying
2·Σranks; F1 uses the harmonic identity ``2·tp / (n_pred + n_true)``
(algebraically 2PR/(P+R), but one exact divide instead of three).

Reference parity: none (the reference has no evaluation surface);
beyond-reference analytics per SURVEY.md north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speech_data_pipeline_spark.functions import trunc6
from speech_data_pipeline_spark.operators import text as tx
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.queries.text_q import (
    _QUALITY_FEAT_SQL,
    _QUALITY_RAW01_SQL,
    langid_pred_expr,
    langid_scored_sql,
)
from speech_data_pipeline_spark.sources.catalog import load_table

#: Binary labels for score evals: positive = English documents (the
#: dominant-but-not-majority class, 218/500 at sf0.01 — both AUC
#: marginals stay far from degenerate at every SF).
_POS_LANG = "en"

#: Cohen's-κ raters: A = composite quality ≥ 0.5, B = length ≥ 300
#: chars (the corpus median) — two cheap keep/drop filters whose
#: agreement beyond chance is exactly what κ measures.
_KAPPA_Q_PPM = 500_000
_KAPPA_LEN = 300


@query(
    "eval_roc_auc",
    oracle=f"""
    WITH feat AS (
      {_QUALITY_FEAT_SQL}
    ), scored AS (
      SELECT f.doc_id,
             CAST(floor({_QUALITY_RAW01_SQL} * 1000000.0) AS BIGINT) AS s,
             CASE WHEN d.lang = '{_POS_LANG}' THEN 1 ELSE 0 END AS pos
      FROM feat f JOIN (SELECT doc_id, lang FROM documents) d
        ON d.doc_id = f.doc_id
    ), byscore AS (
      SELECT s, count(*) AS n_tot, sum(pos) AS n_pos
      FROM scored GROUP BY s
    ), ranked AS (
      SELECT s, n_tot, n_pos,
             1 + coalesce(sum(n_tot) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS min_rank
      FROM byscore
    ), tot AS (
      SELECT CAST(sum(n_pos) AS HUGEINT) AS np,
             CAST(sum(n_tot) - sum(n_pos) AS HUGEINT) AS nn,
             CAST(sum(n_pos * (2 * min_rank + n_tot - 1)) AS HUGEINT)
               AS two_sum_rpos
      FROM ranked
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           floor(CAST(two_sum_rpos - np * (np + 1) AS DOUBLE)
                 / CAST(2 * np * nn AS DOUBLE) * 1000000.0)
             / 1000000.0 AS auc
    FROM tot
    """,
)
def eval_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of the composite quality score against the
    is-English label, via the Mann-Whitney rank-sum identity
    ``AUC = (Σr₊ − n₊(n₊+1)/2) / (n₊·n₋)`` with midranks for ties.

    Plan shape: one (score → n, n_pos) grouped count collapses the
    corpus to the DISTINCT ppm-score table (≤ 1e6+1 rows — bounded by
    the VALUE DOMAIN, not the corpus, the score_quantile_normalize
    contract); min-ranks come from ONE running sum over that bounded
    table (whitelisted partition-less window); the rank-sum folds to a
    1-row aggregate. 2·Σr₊ stays integral (midrank ·2), products of
    corpus-scale counts ride DECIMAL(38,0)/HUGEINT, and the only float
    op is the final divide.
    """
    d = load_table(spark, sf_dir, "documents")
    scored = tx.quality_score(d).select(
        F.round(F.col("quality") * F.lit(1000000.0)).cast("long").alias("s"),
        F.when(F.col("lang") == _POS_LANG, 1).otherwise(0).alias("pos"),
    )
    byscore = scored.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_tot"), F.sum("pos").alias("n_pos")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = byscore.withColumn(
        "min_rank", F.lit(1) + F.coalesce(F.sum("n_tot").over(w), F.lit(0))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = ranked.agg(
        dec(F.sum("n_pos")).alias("np"),
        dec(F.sum("n_tot") - F.sum("n_pos")).alias("nn"),
        dec(
            F.sum(
                F.col("n_pos")
                * (F.lit(2) * F.col("min_rank") + F.col("n_tot") - F.lit(1))
            )
        ).alias("two_sum_rpos"),
    )
    num = (
        F.col("two_sum_rpos") - F.col("np") * (F.col("np") + F.lit(1))
    ).cast("double")
    den = (F.lit(2) * F.col("np") * F.col("nn")).cast("double")
    return tot.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        trunc6(num / den).alias("auc"),
    )


@query(
    "eval_pr_auc",
    oracle=f"""
    WITH feat AS (
      {_QUALITY_FEAT_SQL}
    ), scored AS (
      SELECT f.doc_id,
             CAST(floor({_QUALITY_RAW01_SQL} * 1000000.0) AS BIGINT) AS s,
             CASE WHEN d.lang = '{_POS_LANG}' THEN 1 ELSE 0 END AS pos
      FROM feat f JOIN (SELECT doc_id, lang FROM documents) d
        ON d.doc_id = f.doc_id
    ), byscore AS (
      SELECT s, count(*) AS n_tot, sum(pos) AS n_pos
      FROM scored GROUP BY s
    ), ranked AS (
      SELECT s, n_tot, n_pos,
             sum(n_pos) OVER (ORDER BY s DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_pos,
             sum(n_tot) OVER (ORDER BY s DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tot
      FROM byscore
    ), terms AS (
      SELECT n_pos,
             (1000000::HUGEINT * cum_pos) // cum_tot AS prec_ppm
      FROM ranked
    ), tot AS (
      SELECT CAST(sum(n_pos) AS HUGEINT) AS np,
             CAST(sum(n_pos * prec_ppm) AS HUGEINT) AS ap_num
      FROM terms
    )
    SELECT CAST(np AS BIGINT) AS n_pos,
           floor(CAST(ap_num AS DOUBLE)
                 / (1000000.0 * CAST(np AS DOUBLE)) * 1000000.0)
             / 1000000.0 AS avg_precision
    FROM tot
    """,
)
def eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (PR-AUC) of the composite quality score
    against the is-English label: ``AP = (1/P)·Σ_blocks n₊(b) ·
    precision(b)`` where blocks are DISTINCT score values descending
    and precision(b) is cumulative-positives / cumulative-total
    through the block (ties collapse at block granularity — every row
    sharing a score gets the block's trailing precision).

    Plan shape: same skeleton as eval_roc_auc — ONE grouped count
    collapses the corpus to the ≤1e6+1-row distinct ppm-score table
    (bounded by the value domain, not the corpus); two running sums
    over that bounded table (whitelisted partition-less window); each
    block's precision is quantized to ppm by INTEGER floor-division
    before the cross-block sum, so the aggregate crosses the shuffle
    as an exact integer and the only float op is the final divide.
    """
    d = load_table(spark, sf_dir, "documents")
    scored = tx.quality_score(d).select(
        F.round(F.col("quality") * F.lit(1000000.0)).cast("long").alias("s"),
        F.when(F.col("lang") == _POS_LANG, 1).otherwise(0).alias("pos"),
    )
    byscore = scored.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_tot"), F.sum("pos").alias("n_pos")
    )
    w = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = byscore.select(
        "n_pos",
        F.sum("n_pos").over(w).alias("cum_pos"),
        F.sum("n_tot").over(w).alias("cum_tot"),
    )
    terms = ranked.select(
        "n_pos",
        F.expr("(1000000L * cum_pos) div cum_tot").alias("prec_ppm"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    tot = terms.agg(
        dec(F.sum("n_pos")).alias("np"),
        dec(F.sum(F.col("n_pos") * F.col("prec_ppm"))).alias("ap_num"),
    )
    return tot.select(
        F.col("np").cast("long").alias("n_pos"),
        trunc6(
            F.col("ap_num").cast("double")
            / (F.lit(1000000.0) * F.col("np").cast("double"))
        ).alias("avg_precision"),
    )


@query(
    "eval_confusion_f1",
    oracle=f"""
    WITH scored AS ({langid_scored_sql()}
    ), pred AS (
      SELECT doc_id, lang, {langid_pred_expr()} AS pred_lang FROM scored
    ), t AS (
      SELECT lang, count(*) AS n_true,
             sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS tp
      FROM pred GROUP BY lang
    ), p AS (
      SELECT pred_lang, count(*) AS n_pred FROM pred GROUP BY pred_lang
    )
    SELECT t.lang, CAST(t.n_true AS BIGINT) AS n_true,
           CAST(t.tp AS BIGINT) AS tp,
           CAST(coalesce(p.n_pred, 0) AS BIGINT) AS n_pred,
           CASE WHEN coalesce(p.n_pred, 0) = 0 THEN 0.0
                ELSE floor(CAST(t.tp AS DOUBLE) / CAST(p.n_pred AS DOUBLE)
                           * 1000000.0) / 1000000.0 END AS precis,
           floor(CAST(t.tp AS DOUBLE) / CAST(t.n_true AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS recall,
           floor(CAST(2 * t.tp AS DOUBLE)
                 / CAST(coalesce(p.n_pred, 0) + t.n_true AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS f1
    FROM t LEFT JOIN p ON p.pred_lang = t.lang
    """,
)
def eval_confusion_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 of the marker-lexicon language
    classifier against the corpus's true ``lang`` column.

    Plan shape: scoring is in-row regex algebra (text_language_id's
    plan); TWO |classes|-row grouped counts (true-class marginal with
    its diagonal, predicted-class marginal) joined by broadcast — the
    full n×n confusion matrix is never materialized because the class
    metrics only need the diagonal and the two marginals. F1 uses the
    harmonic identity 2·tp/(n_pred+n_true): one exact divide, zero
    intermediate float state.
    """
    d = load_table(spark, sf_dir, "documents")
    pred = tx.language_id(d).select("lang", "pred_lang")
    t = pred.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(
            F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0)
        ).alias("tp"),
    )
    p = pred.groupBy(F.col("pred_lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    j = t.join(F.broadcast(p), "lang", "left").withColumn(
        "n_pred", F.coalesce(F.col("n_pred"), F.lit(0))
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return j.select(
        "lang",
        F.col("n_true").cast("long").alias("n_true"),
        F.col("tp").cast("long").alias("tp"),
        F.col("n_pred").cast("long").alias("n_pred"),
        F.when(F.col("n_pred") == 0, F.lit(0.0))
        .otherwise(trunc6(dbl("tp") / dbl("n_pred")))
        .alias("precis"),
        trunc6(dbl("tp") / dbl("n_true")).alias("recall"),
        trunc6(
            (F.lit(2) * F.col("tp")).cast("double")
            / (F.col("n_pred") + F.col("n_true")).cast("double")
        ).alias("f1"),
    )


@query(
    "eval_cohens_kappa",
    oracle=f"""
    WITH feat AS (
      {_QUALITY_FEAT_SQL}
    ), r AS (
      SELECT CASE WHEN CAST(floor({_QUALITY_RAW01_SQL} * 1000000.0)
                        AS BIGINT) >= {_KAPPA_Q_PPM}
                  THEN 1 ELSE 0 END AS a,
             CASE WHEN n_chars >= {_KAPPA_LEN} THEN 1 ELSE 0 END AS b
      FROM feat
    ), c AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(a * b) AS HUGEINT) AS tp,
             CAST(sum(a * (1 - b)) AS HUGEINT) AS fp,
             CAST(sum((1 - a) * b) AS HUGEINT) AS fn,
             CAST(sum((1 - a) * (1 - b)) AS HUGEINT) AS tn
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(tp AS BIGINT) AS both_pos,
           CAST(tn AS BIGINT) AS both_neg,
           floor(CAST(tp + tn AS DOUBLE) / CAST(n AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS po,
           floor(CAST(n * (tp + tn)
                      - ((tp + fp) * (tp + fn) + (tn + fn) * (tn + fp))
                      AS DOUBLE)
                 / CAST(n * n
                        - ((tp + fp) * (tp + fn) + (tn + fn) * (tn + fp))
                        AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS kappa
    FROM c
    """,
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between two keep/drop raters (quality ≥ 0.5 vs length
    ≥ median): chance-corrected agreement,
    ``κ = (n·agree − Σ marginal products) / (n² − Σ marginal
    products)`` — the all-integer clearing of (pₒ−pₑ)/(1−pₑ).

    Plan shape: in-row quality algebra → ONE 1-row aggregate of four
    2×2 cell counts (map-side combinable); every product of counts is
    DECIMAL(38,0) (n² overflows BIGINT past ~3·10⁹ rows), and κ is a
    single float divide of two exact integers.
    """
    d = load_table(spark, sf_dir, "documents")
    scored = tx.quality_score(d).select(
        F.when(
            F.round(F.col("quality") * F.lit(1000000.0)).cast("long")
            >= _KAPPA_Q_PPM,
            1,
        )
        .otherwise(0)
        .alias("a"),
        F.when(F.length("text") >= _KAPPA_LEN, 1).otherwise(0).alias("b"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    c = scored.agg(
        dec(F.count(F.lit(1))).alias("n"),
        dec(F.sum(F.col("a") * F.col("b"))).alias("tp"),
        dec(F.sum(F.col("a") * (F.lit(1) - F.col("b")))).alias("fp"),
        dec(F.sum((F.lit(1) - F.col("a")) * F.col("b"))).alias("fn"),
        dec(
            F.sum((F.lit(1) - F.col("a")) * (F.lit(1) - F.col("b")))
        ).alias("tn"),
    )
    pe_num = (F.col("tp") + F.col("fp")) * (F.col("tp") + F.col("fn")) + (
        F.col("tn") + F.col("fn")
    ) * (F.col("tn") + F.col("fp"))
    return c.select(
        F.col("n").cast("long").alias("n"),
        F.col("tp").cast("long").alias("both_pos"),
        F.col("tn").cast("long").alias("both_neg"),
        trunc6(
            (F.col("tp") + F.col("tn")).cast("double")
            / F.col("n").cast("double")
        ).alias("po"),
        trunc6(
            (F.col("n") * (F.col("tp") + F.col("tn")) - pe_num).cast("double")
            / (F.col("n") * F.col("n") - pe_num).cast("double")
        ).alias("kappa"),
    )


@query(
    "eval_krippendorff_alpha",
    oracle="""
    WITH n_uc AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type
    ), mu AS (
      SELECT user_id, CAST(sum(c) AS BIGINT) AS m,
             CAST(sum(c * c) AS BIGINT) AS sc2
      FROM n_uc GROUP BY user_id
    ), pairable AS (SELECT user_id, m, sc2 FROM mu WHERE m >= 2),
    do_q AS (
      SELECT CAST(sum(CAST(floor(
               CAST(m * m - sc2 AS DOUBLE) / CAST(m - 1 AS DOUBLE) * 1e9)
             AS BIGINT)) AS BIGINT) AS doq,
             CAST(count(*) AS BIGINT) AS n_units,
             CAST(sum(m) AS BIGINT) AS n_total
      FROM pairable
    ), cat AS (
      SELECT CAST(sum(
               CAST(n.c AS HUGEINT) * n.c) AS HUGEINT) AS snc2
      FROM (
        SELECT event_type, CAST(sum(c) AS BIGINT) AS c
        FROM n_uc JOIN pairable USING (user_id)
        GROUP BY event_type
      ) n
    )
    SELECT n_units, n_total,
           floor(CAST(doq AS DOUBLE) / 1e9 * 1000000.0) / 1000000.0
             AS d_obs,
           floor((CAST(CAST(n_total AS HUGEINT) * n_total - snc2
                       AS DOUBLE)
                  / CAST(n_total - 1 AS DOUBLE)) * 1000000.0) / 1000000.0
             AS d_exp,
           floor((1.0 - (CAST(doq AS DOUBLE) / 1e9)
                        / (CAST(CAST(n_total AS HUGEINT) * n_total - snc2
                                AS DOUBLE)
                           / CAST(n_total - 1 AS DOUBLE)))
                 * 1000000.0) / 1000000.0 AS alpha
    FROM do_q CROSS JOIN cat
    """,
)
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's α for nominal data: units = users, "ratings" =
    the event types of each user's events (units with ≥2 ratings are
    pairable). α = 1 − D_o/D_e over the coincidence matrix:
    ``D_o = Σ_u (m_u² − Σ_c n_uc²)/(m_u − 1)`` (within-unit
    disagreeing pairs, unit-normalized) and ``D_e = (n² − Σ_c n_c²)/
    (n − 1)`` (chance disagreement from the margins). The
    any-number-of-raters generalization of ``eval_cohens_kappa`` — the
    agreement statistic annotation pipelines report when rater counts
    vary per item.

    Exactness: per-unit D_o contributions are floor-quantized to nano
    integers before summation (different per-unit denominators make
    the sum otherwise float-order-dependent); margins are exact
    integers carried as HUGEINT/DECIMAL where squares can overflow.

    Plan shape at 100 TB: two grouped integer aggregates (user×type,
    then user), a broadcast-joined margin aggregate — no windows, no
    corpus-row joins; output is one row.
    """
    ev = load_table(spark, sf_dir, "events")
    n_uc = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    mu = n_uc.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("m"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sc2"),
    )
    pairable = mu.where(F.col("m") >= 2)
    doq_term = F.floor(
        (F.col("m") * F.col("m") - F.col("sc2")).cast("double")
        / (F.col("m") - 1).cast("double")
        * F.lit(1e9)
    ).cast("long")
    do_q = pairable.select(doq_term.alias("dq"), "m").agg(
        F.sum("dq").cast("long").alias("doq"),
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("m").cast("long").alias("n_total"),
    )
    cat = (
        n_uc.join(pairable.select("user_id"), "user_id")
        .groupBy("event_type")
        .agg(F.sum("c").cast("long").alias("nc"))
        .agg(
            F.sum(
                F.col("nc").cast("decimal(19,0)")
                * F.col("nc").cast("decimal(19,0)")
            ).cast("decimal(38,0)").alias("snc2")
        )
    )
    j = do_q.crossJoin(F.broadcast(cat))
    d_obs = F.col("doq").cast("double") / F.lit(1e9)
    d_exp = (
        F.col("n_total").cast("decimal(19,0)")
        * F.col("n_total").cast("decimal(19,0)")
        - F.col("snc2")
    ).cast("double") / (F.col("n_total") - 1).cast("double")
    return j.select(
        "n_units",
        "n_total",
        trunc6(d_obs).alias("d_obs"),
        trunc6(d_exp).alias("d_exp"),
        trunc6(F.lit(1.0) - d_obs / d_exp).alias("alpha"),
    )


def _trigram_oracle_body() -> str:
    from speech_data_pipeline_spark.queries.text_q import (
        _langid_trigram_oracle,
    )

    return _langid_trigram_oracle()


def _marker_pred() -> str:
    from speech_data_pipeline_spark.queries.text_q import langid_pred_expr

    return langid_pred_expr()


def _marker_scored() -> str:
    from speech_data_pipeline_spark.queries.text_q import langid_scored_sql

    return langid_scored_sql()


@query(
    "eval_mcnemar",
    oracle="""
    WITH trig AS (
    """
    + _trigram_oracle_body()
    + """
    ), mark AS (
      SELECT doc_id, lang, """
    + _marker_pred()
    + """ AS pred_lang
      FROM ("""
    + _marker_scored()
    + """)
    ), pairs AS (
      SELECT m.doc_id,
             CASE WHEN m.pred_lang = m.lang THEN 1 ELSE 0 END AS ar,
             CASE WHEN t.pred_lang = t.lang THEN 1 ELSE 0 END AS br
      FROM mark m JOIN trig t USING (doc_id)
    ), cnt AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ar * br) AS BIGINT) AS n11,
             CAST(sum((1 - ar) * (1 - br)) AS BIGINT) AS n00,
             CAST(sum(ar * (1 - br)) AS BIGINT) AS b,
             CAST(sum((1 - ar) * br) AS BIGINT) AS c
      FROM pairs
    )
    SELECT n, n11, n00, b, c,
           CASE WHEN b + c = 0 THEN 0.0
                ELSE floor(CAST((b - c) * (b - c) AS DOUBLE)
                           / CAST(b + c AS DOUBLE) * 1000000.0)
                     / 1000000.0 END AS chi2,
           CASE WHEN b + c = 0 THEN 0.0
                ELSE floor((abs(CAST(b - c AS DOUBLE)) - 1.0)
                           * (abs(CAST(b - c AS DOUBLE)) - 1.0)
                           / CAST(b + c AS DOUBLE) * 1000000.0)
                     / 1000000.0 END AS chi2_corrected
    FROM cnt
    """,
)
def eval_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test comparing this repo's TWO real language
    classifiers (the marker-lexicon ID and the Cavnar–Trenkle trigram
    ID) on the same documents against the ``lang`` ground truth:
    ``χ² = (b−c)²/(b+c)`` over the discordant counts (b = marker
    right / trigram wrong, c = the reverse), plus the
    continuity-corrected form — THE test for "is classifier A actually
    better than B on paired data", the eval a model-swap decision
    should cite instead of comparing two accuracies.

    Exactness: all counts are integers; both χ² forms are one float
    assembly each.

    Plan shape at 100 TB: the two classifier subtrees (each already a
    registry query) joined on doc_id, one grouped count — nothing new
    crosses a shuffle beyond what the classifiers themselves do.
    """
    from speech_data_pipeline_spark.operators import text as tx
    from speech_data_pipeline_spark.queries.text_q import (
        text_language_trigram,
    )

    d = load_table(spark, sf_dir, "documents")
    mark = tx.language_id(d).select(
        "doc_id",
        (F.col("pred_lang") == F.col("lang")).cast("int").alias("ar"),
    )
    trig = text_language_trigram(spark, sf_dir).select(
        "doc_id",
        (F.col("pred_lang") == F.col("lang")).cast("int").alias("br"),
    )
    cnt = mark.join(trig, "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("ar") * F.col("br")).cast("long").alias("n11"),
        F.sum((1 - F.col("ar")) * (1 - F.col("br")))
        .cast("long")
        .alias("n00"),
        F.sum(F.col("ar") * (1 - F.col("br"))).cast("long").alias("b"),
        F.sum((1 - F.col("ar")) * F.col("br")).cast("long").alias("c"),
    )
    bc = F.col("b") + F.col("c")
    diff = (F.col("b") - F.col("c")).cast("double")
    absd = F.abs(diff)
    return cnt.select(
        "n",
        "n11",
        "n00",
        "b",
        "c",
        F.when(bc == 0, F.lit(0.0))
        .otherwise(trunc6(diff * diff / bc.cast("double")))
        .alias("chi2"),
        F.when(bc == 0, F.lit(0.0))
        .otherwise(
            trunc6(
                (absd - F.lit(1.0)) * (absd - F.lit(1.0))
                / bc.cast("double")
            )
        )
        .alias("chi2_corrected"),
    )
