"""Relational ML and data-layout queries: a fully declarative
multinomial naive-Bayes text classifier and Z-order multidimensional
clustering statistics.

Both are 100 TB-shaped: NB training is two grouped aggregates over the
token stream (model size = vocabulary × classes, orders below the
corpus); prediction is one join of the test token stream against the
model; Z-ordering is pure per-row bit arithmetic feeding a range
partitioner. Determinism follows the registry rules — every sum that
crosses a shuffle is an exact BIGINT (log-probabilities are quantized
onto a 2^-20 grid BEFORE summing), argmaxes tie-break on the label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speech_data_pipeline_spark.functions import trunc6
from speech_data_pipeline_spark.operators import text as tx
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.sources.catalog import load_table

#: Log-prob quantization grid: floor(ln(p) * 2^20) — BIGINT-exact sums
#: across any shuffle order; 1 ulp of ln() shifts a term only if it
#: sits exactly on a grid boundary (the same accepted hazard class as
#: the registry's trunc6 outputs).
_Q = float(1 << 20)


@query(
    "ml_nb_classify",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'),
                                t -> t <> '')) AS tok
      FROM documents
    ),
    train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
    test  AS (SELECT doc_id, tok, count(*) AS n_t
              FROM toks WHERE doc_id % 5 = 0 GROUP BY doc_id, tok),
    truth AS (SELECT doc_id, lang AS true_lang FROM documents
              WHERE doc_id % 5 = 0),
    ctc AS (SELECT lang, tok, count(*) AS c FROM train GROUP BY lang, tok),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM ctc GROUP BY lang),
    vocab AS (SELECT count(DISTINCT tok) AS v FROM train),
    prior AS (
      SELECT lang,
             CAST(floor(ln(CAST(count(*) AS DOUBLE)
                           / (SELECT count(*) FROM documents
                              WHERE doc_id % 5 <> 0)) * {_Q}) AS BIGINT)
               AS prior_q,
             count(*) AS n_docs
      FROM (SELECT DISTINCT doc_id, lang FROM train) GROUP BY lang
    ),
    scored AS (
      SELECT test.doc_id, tot.lang,
             CAST(sum(test.n_t * CAST(floor(ln(
               (COALESCE(ctc.c, 0) + 1.0) / (tot.tot + vocab.v)
             ) * {_Q}) AS BIGINT)) AS BIGINT) AS tok_score
      FROM test
      CROSS JOIN tot
      CROSS JOIN vocab
      LEFT JOIN ctc ON ctc.tok = test.tok AND ctc.lang = tot.lang
      GROUP BY test.doc_id, tot.lang
    ),
    ranked AS (
      SELECT scored.doc_id, scored.lang,
             scored.tok_score + prior.prior_q AS score_q,
             row_number() OVER (
               PARTITION BY scored.doc_id
               ORDER BY scored.tok_score + prior.prior_q DESC, scored.lang
             ) AS rn
      FROM scored JOIN prior USING (lang)
    )
    SELECT ranked.doc_id, ranked.lang AS pred_lang, truth.true_lang,
           CAST(ranked.score_q AS BIGINT) AS score_q,
           (ranked.lang = truth.true_lang) AS correct
    FROM ranked JOIN truth ON truth.doc_id = ranked.doc_id
    WHERE rn = 1
    """,
)
def ml_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language classifier, trained and scored
    entirely as relational algebra — no driver-side model object.

    Train/test split by key hash (``doc_id % 5``); Laplace-smoothed
    token likelihoods. The model IS two tables: per-(class, token)
    counts and per-class totals. Scoring joins the test token stream
    against the model per class (classes are a bounded broadcast; the
    token join is the only exchange) and sums QUANTIZED log-probs as
    exact BIGINTs — shuffle-order-proof, so the per-document argmax
    (score desc, label asc) is identical on any engine.

    At 100 TB: model size is |vocab|×|classes| (millions of rows, not
    corpus-scale); the unseen-token mass rides the LEFT join's
    ``coalesce(c, 0)`` so no dense vocab×class materialization exists;
    the per-document window partitions on doc_id with ≤|classes| rows
    per partition. Reference parity: the engine-side analogue of the
    reference's language-ID stage (SURVEY.md M8) with a trainable
    model instead of a fixed heuristic.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    train = toks.where(F.col("doc_id") % 5 != 0)
    test = (
        toks.where(F.col("doc_id") % 5 == 0)
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    truth = d.where(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    ctc = train.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    tot = ctc.groupBy("lang").agg(F.sum("c").cast("long").alias("tot"))
    vocab = train.agg(F.countDistinct("tok").alias("v"))
    train_docs = train.select("doc_id", "lang").distinct()
    n_train = train_docs.agg(F.count(F.lit(1)).alias("n_train"))
    prior = (
        train_docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(n_train))
        .select(
            "lang",
            F.floor(
                F.log(F.col("n_docs").cast("double") / F.col("n_train")) * _Q
            )
            .cast("long")
            .alias("prior_q"),
        )
    )
    lq = (
        F.floor(
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                / (F.col("tot") + F.col("v"))
            )
            * _Q
        )
        .cast("long")
    )
    scored = (
        test.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vocab))
        .join(ctc, ["tok", "lang"], "left")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("n_t") * lq).cast("long").alias("tok_score"))
        .join(F.broadcast(prior), "lang")
        .withColumn("score_q", F.col("tok_score") + F.col("prior_q"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score_q").desc(), F.col("lang"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(truth, "doc_id")
        .select(
            "doc_id",
            F.col("lang").alias("pred_lang"),
            "true_lang",
            F.col("score_q").cast("long").alias("score_q"),
            (F.col("lang") == F.col("true_lang")).alias("correct"),
        )
    )


def _zvalue_sql(x: str, y: str, bits: int) -> str:
    """Bit-interleaved Morton code as portable integer arithmetic:
    x's bit b lands at position 2b+1, y's at 2b."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) * {1 << (2 * b + 1)})")
        terms.append(f"((({y} >> {b}) & 1) * {1 << (2 * b)})")
    return "(" + " + ".join(terms) + ")"


@query(
    "layout_zorder_stats",
    oracle=f"""
    WITH z AS (
      SELECT {_zvalue_sql("(l_partkey % 1024)", "(l_suppkey % 1024)", 10)}
               AS zval,
             (l_partkey % 1024) AS x, (l_suppkey % 1024) AS y
      FROM lineitem
    )
    SELECT CAST(zval // {1 << 14} AS BIGINT) AS zbucket,
           count(*) AS n_rows,
           CAST(min(x) AS BIGINT) AS x_min, CAST(max(x) AS BIGINT) AS x_max,
           CAST(min(y) AS BIGINT) AS y_min, CAST(max(y) AS BIGINT) AS y_max,
           CAST(max(x) - min(x) + max(y) - min(y) AS BIGINT) AS bbox_span
    FROM z
    GROUP BY 1
    """,
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering manifest: interleave the bits of two
    join/filter dimensions into one sort key and report each
    target-file bucket's bounding box.

    This is the lakehouse ``OPTIMIZE ZORDER BY (a, b)`` primitive: at
    100 TB the write path is ``repartitionByRange(zval)`` + sort-within
    → parquet, and THESE bounding boxes become the row-group min/max
    stats that let point/range queries on EITHER dimension skip most
    files (a single-column sort gives pruning on one dimension only;
    the interleave bounds both). The z-value is pure per-row integer
    bit arithmetic — no UDF, no shuffle before the one grouped
    aggregate; ``bbox_span`` quantifies locality (smaller = better
    skipping), which a layout optimizer would monitor per bucket.
    """
    li = load_table(spark, sf_dir, "lineitem")
    z = li.selectExpr(
        f"{_zvalue_sql('(l_partkey % 1024)', '(l_suppkey % 1024)', 10)} AS zval",
        "(l_partkey % 1024) AS x",
        "(l_suppkey % 1024) AS y",
    )
    return (
        z.groupBy((F.col("zval") / (1 << 14)).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").cast("long").alias("x_min"),
            F.max("x").cast("long").alias("x_max"),
            F.min("y").cast("long").alias("y_min"),
            F.max("y").cast("long").alias("y_max"),
            (F.max("x") - F.min("x") + F.max("y") - F.min("y"))
            .cast("long")
            .alias("bbox_span"),
        )
    )


#: The 2-D range predicate the pruned-read query routes through the
#: bucket min/max manifest (and the pytest pushes down to partition
#: pruning on a z-partitioned layout). Chosen inside every SF's data
#: domain (x = partkey%1024 spans the full range from sf0.01 up;
#: y = suppkey%1024 only reaches ~SF·10'000) so the scanned-bucket
#: count is a real, nonzero fraction at each gate scale.
_ZBOX = {"x_lo": 100, "x_hi": 200, "y_lo": 3, "y_hi": 40}


def zorder_box_read(li: DataFrame):
    """Manifest-pruned 2-D box read over the z-ordered layout: build
    the per-zbucket min/max manifest, keep only buckets whose bounding
    box intersects the query box, and scan just those buckets for the
    exact predicate. Returns ``(scan, n_total, surviving)`` where
    ``scan`` is the pruned row stream and ``surviving`` the bucket
    manifest filter — the exact file-skipping flow a lakehouse reader
    runs off parquet row-group stats (the pytest proves the physical
    skip on a zbucket-partitioned layout via inputFiles()).

    The manifest is bucket-count-sized (zval≫14 ⇒ ≤ 64 buckets here,
    bounded by the bit budget at any corpus size), so the surviving-set
    join broadcasts; rows never shuffle — scan + filter is map-side."""
    b = _ZBOX
    z = li.selectExpr(
        f"{_zvalue_sql('(l_partkey % 1024)', '(l_suppkey % 1024)', 10)} AS zval",
        "(l_partkey % 1024) AS x",
        "(l_suppkey % 1024) AS y",
        "l_quantity",
    ).withColumn("zbucket", (F.col("zval") / (1 << 14)).cast("long"))
    man = z.groupBy("zbucket").agg(
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )
    surviving = man.where(
        (F.col("x_max") >= b["x_lo"])
        & (F.col("x_min") <= b["x_hi"])
        & (F.col("y_max") >= b["y_lo"])
        & (F.col("y_min") <= b["y_hi"])
    ).select("zbucket")
    scan = z.join(F.broadcast(surviving), "zbucket").where(
        F.col("x").between(b["x_lo"], b["x_hi"])
        & F.col("y").between(b["y_lo"], b["y_hi"])
    )
    return scan, man, surviving


@query(
    "layout_zorder_pruned_read",
    oracle=f"""
    WITH z AS (
      SELECT {_zvalue_sql("(l_partkey % 1024)", "(l_suppkey % 1024)", 10)}
               AS zval,
             (l_partkey % 1024) AS x, (l_suppkey % 1024) AS y, l_quantity
      FROM lineitem
    ), zb AS (
      SELECT CAST(zval // {1 << 14} AS BIGINT) AS zbucket, x, y, l_quantity
      FROM z
    ), man AS (
      SELECT zbucket, min(x) AS x_min, max(x) AS x_max,
             min(y) AS y_min, max(y) AS y_max
      FROM zb GROUP BY zbucket
    ), surv AS (
      SELECT zbucket FROM man
      WHERE x_max >= {_ZBOX["x_lo"]} AND x_min <= {_ZBOX["x_hi"]}
        AND y_max >= {_ZBOX["y_lo"]} AND y_min <= {_ZBOX["y_hi"]}
    ), hits AS (
      SELECT zb.* FROM zb JOIN surv USING (zbucket)
      WHERE x BETWEEN {_ZBOX["x_lo"]} AND {_ZBOX["x_hi"]}
        AND y BETWEEN {_ZBOX["y_lo"]} AND {_ZBOX["y_hi"]}
    )
    SELECT (SELECT count(*) FROM man) AS n_buckets_total,
           (SELECT count(*) FROM surv) AS n_buckets_scanned,
           count(*) AS n_rows_match,
           CAST(coalesce(sum(CAST(l_quantity AS BIGINT)), 0) AS BIGINT)
             AS sum_qty
    FROM hits
    """,
)
def layout_zorder_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """READ side of the Z-order layout (VERDICT r3 #5): a 2-D box
    predicate routed through the bucket min/max manifest —
    ``layout_zorder_stats``' bounding boxes actually skipping buckets.
    Reports how many buckets the manifest pruned next to the exact
    matched-row aggregate, so the oracle pins both the pruning math
    and that pruning loses no rows. The physical file-skip (parquet
    partition pruning off the same manifest) is asserted in
    tests/test_ml_q.py on a zbucket-partitioned layout."""
    li = load_table(spark, sf_dir, "lineitem")
    scan, man, surviving = zorder_box_read(li)
    return (
        scan.agg(
            F.count(F.lit(1)).alias("n_rows_match"),
            F.coalesce(F.sum(F.col("l_quantity").cast("long")), F.lit(0))
            .cast("long")
            .alias("sum_qty"),
        )
        .crossJoin(F.broadcast(man.agg(F.count(F.lit(1)).alias("n_buckets_total"))))
        .crossJoin(
            F.broadcast(surviving.agg(F.count(F.lit(1)).alias("n_buckets_scanned")))
        )
        .select("n_buckets_total", "n_buckets_scanned", "n_rows_match", "sum_qty")
    )


#: Perceptron gate config: integer features, label rule, rounds.
_PCT_ITERS = 3


def _perceptron_oracle(iters: int = _PCT_ITERS) -> str:
    """Chained-CTE replay of the batch-perceptron trajectory: w_t is a
    one-row CTE, each round's update one aggregate over feat × w_{t-1}
    — the exact SQL form of ml/linear.py's integer loop."""
    toks = (
        r"list_filter(string_split_regex(trim(text), "
        r"'[ \t\n\r\f\x0b]+'), t -> t <> '')"
    )
    margin = "y * (w0*x0 + w1*x1 + w2*x2 + b)"
    parts = [
        f"""
    WITH feat AS (
      SELECT CAST(len({toks}) AS BIGINT) AS x0,
             CAST(len(list_distinct({toks})) AS BIGINT) AS x1,
             CAST(length(text) AS BIGINT) AS x2,
             CASE WHEN length(text) >= 200 THEN 1 ELSE -1 END AS y
      FROM documents
    ), s0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
                     CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS b)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""", u{t} AS (
      SELECT CAST(sum(CASE WHEN {margin} <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
             CAST(sum(CASE WHEN {margin} <= 0 THEN y*x0 ELSE 0 END) AS BIGINT) AS d0,
             CAST(sum(CASE WHEN {margin} <= 0 THEN y*x1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(sum(CASE WHEN {margin} <= 0 THEN y*x2 ELSE 0 END) AS BIGINT) AS d2,
             CAST(sum(CASE WHEN {margin} <= 0 THEN y ELSE 0 END) AS BIGINT) AS db
      FROM feat CROSS JOIN s{t - 1}
    ), s{t} AS (
      SELECT s.w0 + u.d0 AS w0, s.w1 + u.d1 AS w1, s.w2 + u.d2 AS w2,
             s.b + u.db AS b
      FROM s{t - 1} s CROSS JOIN u{t} u
    )"""
        )
    rounds = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({t} AS INTEGER) AS round, u{t}.n AS n_miscl, "
        f"s{t}.b, s{t}.w0 AS w_n_tokens, s{t}.w1 AS w_n_distinct, "
        f"s{t}.w2 AS w_n_chars FROM s{t} CROSS JOIN u{t}"
        for t in range(1, iters + 1)
    )
    return "".join(parts) + "\n    " + rounds


@query("ml_perceptron_quality", oracle=_perceptron_oracle())
def ml_perceptron_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed model-based quality-classifier TRAINING (the
    FineWeb-style step after rule filters): a batch perceptron over
    integer text features (token count, distinct tokens, char length)
    learning the length rule ``n_chars >= 200``. One corpus aggregate
    per round, model state a broadcast row, exact bigint arithmetic —
    the trajectory replays as chained CTEs (ml/linear.py)."""
    from speech_data_pipeline_spark.ml.linear import perceptron_train

    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    feats = d.select(
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars"),
        F.when(F.length("text") >= 200, 1).otherwise(-1).alias("y"),
    )
    return perceptron_train(
        feats, ["n_tokens", "n_distinct", "n_chars"], "y", iters=_PCT_ITERS
    )


# ---------------------------------------------------------------------------
# Decision stump (1-level tree) by exact information gain
# ---------------------------------------------------------------------------


def _xlnx_sql(c: str) -> str:
    """Integer nano-nat c·ln(c) (0 at c=0) — the privacy_l_diversity
    entropy-quantization convention."""
    return (
        f"CASE WHEN {c} > 0 THEN CAST(floor(CAST({c} AS DOUBLE)"
        f" * ln(CAST({c} AS DOUBLE)) * 1e9) AS BIGINT) ELSE 0 END"
    )


@query(
    "ml_decision_stump",
    oracle=f"""
    WITH lab AS (
      SELECT epoch_us(l_shipdate) // 86400000000 AS v,
             CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ), byv AS (
      SELECT v, sum(y) AS pos, sum(1 - y) AS neg FROM lab GROUP BY v
    ), run AS (
      SELECT v,
             sum(pos) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl,
             sum(neg) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ql,
             sum(pos) OVER () AS tp,
             sum(neg) OVER () AS tq
      FROM byv
    ), cand AS (
      SELECT v, pl, ql, tp - pl AS pr, tq - ql AS qr,
             ({_xlnx_sql('(pl + ql)')} - {_xlnx_sql('pl')}
              - {_xlnx_sql('ql')})
             + ({_xlnx_sql('(tp - pl + tq - ql)')}
                - {_xlnx_sql('(tp - pl)')} - {_xlnx_sql('(tq - ql)')})
               AS child_nano
      FROM run WHERE pl + ql < tp + tq
    ), best AS (
      SELECT * FROM cand ORDER BY child_nano ASC, v ASC LIMIT 1
    )
    SELECT v AS threshold_day,
           CAST(pl + ql AS BIGINT) AS n_left,
           CAST(pr + qr AS BIGINT) AS n_right,
           floor(CAST(({_xlnx_sql('(pl + ql + pr + qr)')}
                       - {_xlnx_sql('(pl + pr)')}
                       - {_xlnx_sql('(ql + qr)')}) - child_nano
                      AS DOUBLE)
                 / 1e9 / CAST(pl + ql + pr + qr AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS gain_nats,
           floor((CAST(greatest(pl, ql) + greatest(pr, qr) AS DOUBLE)
                  / CAST(pl + ql + pr + qr AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS acc
    FROM best
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact information-gain decision stump: the best 1-feature
    threshold split of lineitem by ship day predicting
    ``l_returnflag = 'N'`` (TPC-H ships returnflag as a date-cutoff
    function, so the stump recovers a real boundary, not noise).

    The split criterion is the weighted child entropy cleared to
    INTEGER nano-nats (the privacy_l_diversity ``floor(c·ln c·1e9)``
    convention): argmin over candidate thresholds is an integer
    ordering with a min-day tie-break — no float ranking crosses
    engines. Gain and majority-vote accuracy assemble as one float
    divide each on the chosen row.

    Plan shape: one grouped count collapses the corpus to the
    DISTINCT ship-day table (date-domain bounded); running label
    sums over it (whitelisted partition-less window); TakeOrdered 1.
    """
    li = load_table(spark, sf_dir, "lineitem")
    lab = li.select(
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', l_shipdate)"
            " div 86400000000"
        ).alias("v"),
        F.when(F.col("l_returnflag") == "N", 1).otherwise(0).alias("y"),
    )
    byv = lab.groupBy("v").agg(
        F.sum("y").alias("pos"), F.sum(1 - F.col("y")).alias("neg")
    )
    w_run = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    run = byv.select(
        "v",
        F.sum("pos").over(w_run).alias("pl"),
        F.sum("neg").over(w_run).alias("ql"),
        F.sum("pos").over(w_all).alias("tp"),
        F.sum("neg").over(w_all).alias("tq"),
    )

    def xlnx(c):
        return F.when(
            c > 0,
            F.floor(
                c.cast("double") * F.log(c.cast("double")) * F.lit(1e9)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    pl, ql = F.col("pl"), F.col("ql")
    pr, qr = F.col("tp") - pl, F.col("tq") - ql
    child = (
        xlnx(pl + ql) - xlnx(pl) - xlnx(ql)
        + xlnx(pr + qr) - xlnx(pr) - xlnx(qr)
    )
    cand = run.where(pl + ql < F.col("tp") + F.col("tq")).select(
        "v",
        pl.alias("pl"),
        ql.alias("ql"),
        pr.alias("pr"),
        qr.alias("qr"),
        child.alias("child_nano"),
    )
    best = cand.orderBy(F.col("child_nano").asc(), F.col("v").asc()).limit(
        1
    )
    n_all = F.col("pl") + F.col("ql") + F.col("pr") + F.col("qr")
    parent = (
        xlnx(n_all)
        - xlnx(F.col("pl") + F.col("pr"))
        - xlnx(F.col("ql") + F.col("qr"))
    )
    return best.select(
        F.col("v").alias("threshold_day"),
        (F.col("pl") + F.col("ql")).cast("long").alias("n_left"),
        (F.col("pr") + F.col("qr")).cast("long").alias("n_right"),
        F.floor(
            (parent - F.col("child_nano")).cast("double")
            / F.lit(1e9)
            / n_all.cast("double")
            * F.lit(1e6)
        ).cast("double").alias("gain_nats_ppm_tmp"),
        F.floor(
            (
                F.greatest("pl", "ql") + F.greatest("pr", "qr")
            ).cast("double")
            / n_all.cast("double")
            * F.lit(1e6)
        ).cast("double").alias("acc_ppm_tmp"),
    ).select(
        "threshold_day",
        "n_left",
        "n_right",
        (F.col("gain_nats_ppm_tmp") / F.lit(1e6)).alias("gain_nats"),
        (F.col("acc_ppm_tmp") / F.lit(1e6)).alias("acc"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval
# ---------------------------------------------------------------------------

#: deterministic 3-way split on the order key and the 90% level
_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 1, 10  # alpha = 0.1


@query(
    "ml_conformal_interval",
    oracle=f"""
    WITH q AS (
      SELECT l_orderkey % 5 AS fold,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(x AS HUGEINT) * y) AS sxy
      FROM q WHERE fold NOT IN (0, 1)
    ), fit AS (
      SELECT CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
             (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE) AS icept
      FROM m
    ), resid AS (
      SELECT q.fold,
             CAST(floor(abs(CAST(q.y AS DOUBLE)
                            - (f.slope * CAST(q.x AS DOUBLE) + f.icept)))
                  AS BIGINT) AS r
      FROM q, fit WHERE q.fold IN (0, 1)
    ), calcdf AS (
      SELECT r,
             sum(c) OVER (ORDER BY r
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(c) OVER () AS n_cal
      FROM (SELECT r, count(*) AS c FROM resid WHERE fold = 0 GROUP BY r)
    ), qhat AS (
      SELECT max(n_cal) AS n_cal,
             min(CASE WHEN cum >= ((n_cal + 1) * {_CONF_ALPHA_DEN - _CONF_ALPHA_NUM}
                                   + {_CONF_ALPHA_DEN - 1}) // {_CONF_ALPHA_DEN}
                      THEN r END) AS q_cents
      FROM calcdf
    ), cov AS (
      SELECT count(*) AS n_test,
             sum(CASE WHEN resid.r <= qh.q_cents THEN 1 ELSE 0 END) AS n_in
      FROM resid, qhat qh WHERE resid.fold = 1
    )
    SELECT floor(f.slope * 1000000.0) / 1000000.0 AS slope_cents,
           floor(f.icept * 1000000.0) / 1000000.0 AS icept_cents,
           CAST(qh.n_cal AS BIGINT) AS n_cal,
           CAST(qh.q_cents AS DOUBLE) / 100.0 AS q_hat,
           CAST(cov.n_test AS BIGINT) AS n_test,
           floor(CAST(cov.n_in AS DOUBLE) / CAST(cov.n_test AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS coverage
    FROM fit f, qhat qh, cov
    """,
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval around the OLS fit of
    extended price on quantity: train on folds 2–4 (deterministic key
    split), take the ⌈(n_cal+1)(1−α)⌉-th smallest absolute calibration
    residual as the half-width ``q̂`` (α = 0.1), and report the
    finite-sample coverage on the held-out test fold — the
    distribution-free ML-uncertainty primitive (Vovk; Lei et al.).

    Exactness: OLS from DECIMAL(38,0) integer moments (the
    stats_linreg identity); residuals floor-quantized to cents (same
    doubles both engines → same floor); q̂ is an order statistic off
    the residual CDF (whitelisted window over the bounded cent table);
    coverage is an integer ratio.
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        (F.col("l_orderkey") % 5).alias("fold"),
        F.col("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = q.where(~F.col("fold").isin(0, 1)).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d38(F.col("x"))).alias("sx"),
        F.sum(d38(F.col("y"))).alias("sy"),
        F.sum(d38(F.col("x")) * d38(F.col("x"))).alias("sxx"),
        F.sum(d38(F.col("x")) * d38(F.col("y"))).alias("sxy"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    fit = m.select(
        slope.alias("slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("icept"),
    )
    resid = (
        q.where(F.col("fold").isin(0, 1))
        .crossJoin(F.broadcast(fit))
        .select(
            "fold",
            F.floor(
                F.abs(
                    F.col("y").cast("double")
                    - (
                        F.col("slope") * F.col("x").cast("double")
                        + F.col("icept")
                    )
                )
            )
            .cast("long")
            .alias("r"),
        )
    )
    bys = (
        resid.where(F.col("fold") == 0)
        .groupBy("r")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_run = Window.orderBy("r").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    calcdf = bys.select(
        "r",
        F.sum("c").over(w_run).alias("cum"),
        F.sum("c").over(w_all).alias("n_cal"),
    )
    k = F.expr(
        f"((n_cal + 1) * {_CONF_ALPHA_DEN - _CONF_ALPHA_NUM}"
        f" + {_CONF_ALPHA_DEN - 1}) div {_CONF_ALPHA_DEN}"
    )
    qhat = calcdf.agg(
        F.max("n_cal").alias("n_cal"),
        F.min(F.when(F.col("cum") >= k, F.col("r"))).alias("q_cents"),
    )
    cov = (
        resid.where(F.col("fold") == 1)
        .crossJoin(F.broadcast(qhat.select("q_cents")))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(F.col("r") <= F.col("q_cents"), 1).otherwise(0)
            ).alias("n_in"),
        )
    )
    return (
        fit.crossJoin(qhat)
        .crossJoin(cov)
        .select(
            trunc6(F.col("slope")).alias("slope_cents"),
            trunc6(F.col("icept")).alias("icept_cents"),
            F.col("n_cal").cast("long").alias("n_cal"),
            (F.col("q_cents").cast("double") / F.lit(100.0)).alias(
                "q_hat"
            ),
            F.col("n_test").cast("long").alias("n_test"),
            trunc6(
                F.col("n_in").cast("double")
                / F.col("n_test").cast("double")
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Logistic regression by fixed-round batch gradient descent (round 8)
# ---------------------------------------------------------------------------

_LOGREG_ROUNDS = 3
_LOGREG_LR = 4.0


def _logreg_oracle(rounds: int = _LOGREG_ROUNDS) -> str:
    """Chained-CTE replay of the micro-quantized GD trajectory — the
    ml_perceptron_quality pattern with a float link function: z and
    the per-row gradient use the IDENTICAL expression tree as the
    Spark plan (one exp per row — the accepted ln/exp hazard class),
    and every cross-row sum is an exact integer in MICRO units."""
    z = (
        "(CAST(s.w0 AS DOUBLE)"
        " + CAST(s.w1 AS DOUBLE) * (CAST(x1 AS DOUBLE) / 50.0)"
        " + CAST(s.w2 AS DOUBLE) * (CAST(x2 AS DOUBLE) / 10.0))"
        " / 1000000.0"
    )
    r = f"(1.0 / (1.0 + exp(-({z}))) - CAST(y AS DOUBLE))"
    parts = [
        """
    WITH feat AS (
      SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS x2,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ), s0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
                     CAST(0 AS BIGINT) AS w2)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""", u{t} AS (
      SELECT count(*) AS n,
             CAST(sum(CAST(floor({r} * 1000000.0) AS HUGEINT))
                  AS HUGEINT) AS g0,
             CAST(sum(CAST(floor({r} * (CAST(x1 AS DOUBLE) / 50.0)
                                 * 1000000.0) AS HUGEINT))
                  AS HUGEINT) AS g1,
             CAST(sum(CAST(floor({r} * (CAST(x2 AS DOUBLE) / 10.0)
                                 * 1000000.0) AS HUGEINT))
                  AS HUGEINT) AS g2
      FROM feat CROSS JOIN s{t - 1} s
    ), s{t} AS (
      SELECT CAST(s.w0 - floor({_LOGREG_LR!r} * CAST(u.g0 AS DOUBLE)
                               / CAST(u.n AS DOUBLE)) AS BIGINT) AS w0,
             CAST(s.w1 - floor({_LOGREG_LR!r} * CAST(u.g1 AS DOUBLE)
                               / CAST(u.n AS DOUBLE)) AS BIGINT) AS w1,
             CAST(s.w2 - floor({_LOGREG_LR!r} * CAST(u.g2 AS DOUBLE)
                               / CAST(u.n AS DOUBLE)) AS BIGINT) AS w2
      FROM s{t - 1} s CROSS JOIN u{t} u
    )"""
        )
    return "".join(parts) + f"""
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM feat) AS n,
           CAST(s.w0 AS DOUBLE) / 1000000.0 AS w_bias,
           CAST(s.w1 AS DOUBLE) / 1000000.0 AS w_quantity,
           CAST(s.w2 AS DOUBLE) / 1000000.0 AS w_discount,
           floor(CAST((SELECT sum(CASE WHEN ({z}) > 0.0 THEN y
                                       ELSE 1 - y END)
                       FROM feat CROSS JOIN s{rounds} s) AS DOUBLE)
                 / (SELECT count(*) FROM feat)
                 * 1000000.0) / 1000000.0 AS train_acc
    FROM s{rounds} s
    """


@query("ml_logreg_gd", oracle=_logreg_oracle())
def ml_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression by FIXED-ROUND batch gradient descent
    (3 rounds, lr 4.0) predicting returned lineitems from quantity
    and discount — the probabilistic trainer beside the perceptron's
    mistake-driven one (same one-aggregate-per-round shape, now with
    a float link): model state is a 1-row broadcast of MICRO-integer
    weights; each round computes ONE corpus aggregate of per-row
    gradients ``(σ(w·x) − y)·x``, micro-floored per row so the
    cross-row sums are exact integers (order-immune; the integer
    trajectory replays as chained CTEs in DuckDB). The per-row σ uses
    the same expression tree on both engines (one exp — the registry's
    accepted ln/exp hazard class); gradient-sum doubles stay exact
    below ~9·10⁹ rows (micro grid × 2⁵³ — the documented validity
    bound, the stats_spearman convention).

    On this corpus returnflag is independent of the features, so the
    fit converges toward the base-rate bias with near-zero feature
    weights and train_acc ≈ the majority class — the null-result
    check (a spuriously large weight here would flag a broken
    gradient).

    Plan shape at 100 TB: ``rounds`` corpus aggregates (map-side
    partial, 1-row state between rounds — the pagerank fixed-round
    contract), one final accuracy aggregate. No windows, no joins
    beyond the 1-row state attach.
    """
    li = load_table(spark, sf_dir, "lineitem")
    feat = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("x2"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    ).persist()

    def z_expr():
        x1d = F.col("x1").cast("double")
        x2d = F.col("x2").cast("double")
        return (
            F.col("w0").cast("double")
            + F.col("w1").cast("double") * (x1d / F.lit(50.0))
            + F.col("w2").cast("double") * (x2d / F.lit(10.0))
        ) / F.lit(1e6)

    w = feat.sparkSession.createDataFrame(
        [(0, 0, 0)], "w0 long, w1 long, w2 long"
    )
    for _ in range(_LOGREG_ROUNDS):
        j = feat.crossJoin(F.broadcast(w))
        rr = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-z_expr())
        ) - F.col("y").cast("double")
        x1d = F.col("x1").cast("double")
        x2d = F.col("x2").cast("double")
        u = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(rr * F.lit(1e6)).cast("decimal(38,0)")
            ).alias("g0"),
            F.sum(
                F.floor(rr * (x1d / F.lit(50.0)) * F.lit(1e6)).cast(
                    "decimal(38,0)"
                )
            ).alias("g1"),
            F.sum(
                F.floor(rr * (x2d / F.lit(10.0)) * F.lit(1e6)).cast(
                    "decimal(38,0)"
                )
            ).alias("g2"),
            F.max(F.col("w0")).alias("w0"),
            F.max(F.col("w1")).alias("w1"),
            F.max(F.col("w2")).alias("w2"),
        )
        n_d = F.col("n").cast("double")
        w = u.select(
            (
                F.col("w0")
                - F.floor(
                    F.lit(_LOGREG_LR) * F.col("g0").cast("double") / n_d
                )
            )
            .cast("long")
            .alias("w0"),
            (
                F.col("w1")
                - F.floor(
                    F.lit(_LOGREG_LR) * F.col("g1").cast("double") / n_d
                )
            )
            .cast("long")
            .alias("w1"),
            (
                F.col("w2")
                - F.floor(
                    F.lit(_LOGREG_LR) * F.col("g2").cast("double") / n_d
                )
            )
            .cast("long")
            .alias("w2"),
        )
    jf = feat.crossJoin(F.broadcast(w))
    hit = F.when(
        z_expr() > F.lit(0.0), F.col("y")
    ).otherwise(1 - F.col("y"))
    return jf.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(F.col("w0").cast("double") / F.lit(1e6)).alias("w_bias"),
        F.max(F.col("w1").cast("double") / F.lit(1e6)).alias("w_quantity"),
        F.max(F.col("w2").cast("double") / F.lit(1e6)).alias("w_discount"),
        trunc6(
            F.sum(hit).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("train_acc"),
    )


# ---------------------------------------------------------------------------
# Closed-form ridge regression (3 features, normal equations) — round 9
# ---------------------------------------------------------------------------

#: Ridge penalty on the cent² covariance scale (fixed by convention).
_RIDGE_LAMBDA = 1000.0


def _ridge_assembly_sql() -> str:
    """The ENTIRE float assembly — centered covariances, the 3×3
    Cramer solve of (S + λI)β = s, intercept, R² — as ONE SQL
    expression list over the exact integer moment columns
    (n, s1..s3, sy, s11, s12, s13, s22, s23, s33, s1y, s2y, s3y, syy).
    Shared TEXTUALLY by the Spark side (F.expr) and the DuckDB oracle,
    so the two engines evaluate the identical IEEE tree by
    construction."""
    nd = "CAST(n AS DOUBLE)"

    def cov(ij: str, i: str, j: str) -> str:
        return (
            f"(CAST(s{ij} AS DOUBLE) - CAST(s{i} AS DOUBLE)"
            f" * CAST(s{j} AS DOUBLE) / {nd})"
        )

    lam = f"CAST({_RIDGE_LAMBDA} AS DOUBLE)"
    a11 = f"({cov('11', '1', '1')} + {lam})"
    a22 = f"({cov('22', '2', '2')} + {lam})"
    a33 = f"({cov('33', '3', '3')} + {lam})"
    a12 = cov("12", "1", "2")
    a13 = cov("13", "1", "3")
    a23 = cov("23", "2", "3")
    c1 = (
        f"(CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE)"
        f" * CAST(sy AS DOUBLE) / {nd})"
    )
    c2 = (
        f"(CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE)"
        f" * CAST(sy AS DOUBLE) / {nd})"
    )
    c3 = (
        f"(CAST(s3y AS DOUBLE) - CAST(s3 AS DOUBLE)"
        f" * CAST(sy AS DOUBLE) / {nd})"
    )
    syy = (
        f"(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)"
        f" * CAST(sy AS DOUBLE) / {nd})"
    )

    def det3(m) -> str:
        (a, b, c), (d, e, f_), (g, h, i) = m
        return (
            f"({a} * ({e} * {i} - {f_} * {h})"
            f" - {b} * ({d} * {i} - {f_} * {g})"
            f" + {c} * ({d} * {h} - {e} * {g}))"
        )

    s_mat = ((a11, a12, a13), (a12, a22, a23), (a13, a23, a33))
    det = det3(s_mat)
    det1 = det3(((c1, a12, a13), (c2, a22, a23), (c3, a23, a33)))
    det2 = det3(((a11, c1, a13), (a12, c2, a23), (a13, c3, a33)))
    det3_ = det3(((a11, a12, c1), (a12, a22, c2), (a13, a23, c3)))
    b1 = f"({det1} / {det})"
    b2 = f"({det2} / {det})"
    b3 = f"({det3_} / {det})"
    icept = (
        f"((CAST(sy AS DOUBLE) - ({b1} * CAST(s1 AS DOUBLE)"
        f" + {b2} * CAST(s2 AS DOUBLE)"
        f" + {b3} * CAST(s3 AS DOUBLE))) / {nd})"
    )
    # ridge SSE from moments: Syy - 2 βᵀc + βᵀ S β (centered, WITHOUT
    # the λ inflation — λ only biases the solve)
    bsb = (
        f"({b1} * ({cov('11', '1', '1')} * {b1} + {a12} * {b2}"
        f" + {a13} * {b3})"
        f" + {b2} * ({a12} * {b1} + {cov('22', '2', '2')} * {b2}"
        f" + {a23} * {b3})"
        f" + {b3} * ({a13} * {b1} + {a23} * {b2}"
        f" + {cov('33', '3', '3')} * {b3}))"
    )
    sse = (
        f"({syy} - CAST(2 AS DOUBLE) * ({b1} * {c1} + {b2} * {c2} + {b3} * {c3})"
        f" + {bsb})"
    )
    r2 = f"(CAST(1 AS DOUBLE) - {sse} / {syy})"
    # NB: literals are CAST(... AS DOUBLE) because Spark SQL parses a
    # bare 1000000.0 as DECIMAL (DuckDB as DOUBLE) — the shared text
    # must type identically in both dialects.
    t6 = lambda e: (  # noqa: E731
        f"floor({e} * CAST(1000000 AS DOUBLE)) / CAST(1000000 AS DOUBLE)"
    )
    return (
        f"CAST(n AS BIGINT) AS n, {t6(b1)} AS b_quantity,"
        f" {t6(b2)} AS b_discount, {t6(b3)} AS b_tax,"
        f" {t6(icept)} AS intercept, {t6(r2)} AS r2"
    )


@query(
    "ml_ridge_closed_form",
    oracle=f"""
    WITH q AS (
      SELECT CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS x1,
             CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS x2,
             CAST(floor(l_tax * 100.0 + 0.5) AS BIGINT) AS x3,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(x1 AS HUGEINT)) AS HUGEINT) AS s1,
             CAST(sum(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
             CAST(sum(CAST(x3 AS HUGEINT)) AS HUGEINT) AS s3,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS s11,
             CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS s12,
             CAST(sum(CAST(x1 AS HUGEINT) * x3) AS HUGEINT) AS s13,
             CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s22,
             CAST(sum(CAST(x2 AS HUGEINT) * x3) AS HUGEINT) AS s23,
             CAST(sum(CAST(x3 AS HUGEINT) * x3) AS HUGEINT) AS s33,
             CAST(sum(CAST(x1 AS HUGEINT) * y) AS HUGEINT) AS s1y,
             CAST(sum(CAST(x2 AS HUGEINT) * y) AS HUGEINT) AS s2y,
             CAST(sum(CAST(x3 AS HUGEINT) * y) AS HUGEINT) AS s3y,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM q
    )
    SELECT {_ridge_assembly_sql()} FROM m
    """,
)
def ml_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression in closed form: predict line-item price (cents)
    from quantity/discount/tax via the normal equations
    ``(S + λI)β = s`` solved by 3×3 Cramer expansion, with intercept
    and R² from the same moment table — the multi-feature upgrade of
    ``stats_linreg`` (simple OLS) and the convex sibling of
    ``ml_logreg_gd`` (which iterates; ridge needs no iterations at
    ANY scale).

    Exactness: one corpus pass collects the 15 integer moment sums on
    DECIMAL(38,0)/HUGEINT (exact under any partitioning); the ENTIRE
    float assembly — centered covariances, determinants, coefficients,
    intercept, R² — is ONE SQL expression string shared TEXTUALLY
    between the Spark plan (F.expr) and the DuckDB oracle, so both
    engines execute the identical IEEE tree by construction (the
    strongest form of the repo's shared-literal-tree discipline).

    Plan shape at 100 TB: ONE map-side-combinable grouped aggregate
    (15 columns, 1 row out) and a 1-row projection. Training cost is
    a single corpus scan regardless of scale — the textbook reason
    closed-form GLMs are the first model a warehouse fits.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = lambda c: F.floor(  # noqa: E731
        F.col(c) * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    q = li.select(
        cents("l_quantity").alias("x1"),
        cents("l_discount").alias("x2"),
        cents("l_tax").alias("x3"),
        cents("l_extendedprice").alias("y"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = q.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d38("x1")).alias("s1"),
        F.sum(d38("x2")).alias("s2"),
        F.sum(d38("x3")).alias("s3"),
        F.sum(d38("y")).alias("sy"),
        F.sum(d38("x1") * d38("x1")).alias("s11"),
        F.sum(d38("x1") * d38("x2")).alias("s12"),
        F.sum(d38("x1") * d38("x3")).alias("s13"),
        F.sum(d38("x2") * d38("x2")).alias("s22"),
        F.sum(d38("x2") * d38("x3")).alias("s23"),
        F.sum(d38("x3") * d38("x3")).alias("s33"),
        F.sum(d38("x1") * d38("y")).alias("s1y"),
        F.sum(d38("x2") * d38("y")).alias("s2y"),
        F.sum(d38("x3") * d38("y")).alias("s3y"),
        F.sum(d38("y") * d38("y")).alias("syy"),
    )
    return m.selectExpr(*[
        e.strip() for e in _split_top_level(_ridge_assembly_sql())
    ])


def _split_top_level(s: str) -> list[str]:
    """Split a SELECT-list string on top-level commas (the assembly
    text is shared with the SQL oracle verbatim, so the Spark side
    splits it into selectExpr items rather than re-deriving it)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


# ---------------------------------------------------------------------------
# k-NN label-accuracy eval over a code-bounded embedding slice — round 9
# ---------------------------------------------------------------------------

_KNN_ACC_MOD = 2
_KNN_ACC_CAP = 500
_KNN_ACC_K = 5


@query(
    "ml_knn_label_accuracy",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, embedding, label FROM embeddings
      WHERE vec_id % {_KNN_ACC_MOD} = 0
        AND vec_id < {_KNN_ACC_MOD * _KNN_ACC_CAP}
    ), pairs AS (
      SELECT a.vec_id AS aid, a.label AS alabel,
             b.vec_id AS bid, b.label AS blabel,
             CAST(floor(
               list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[i] AS DOUBLE)
                      * CAST(b.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(a.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(b.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
               * 1000000000000.0) AS BIGINT) AS sim_pico
      FROM s a JOIN s b ON a.vec_id <> b.vec_id
    ), topk AS (
      SELECT * FROM (
        SELECT aid, alabel, blabel, sim_pico,
               row_number() OVER (PARTITION BY aid
                 ORDER BY sim_pico DESC, bid) AS rnk
        FROM pairs
      ) WHERE rnk <= {_KNN_ACC_K}
    ), votes AS (
      SELECT aid, alabel, blabel,
             count(*) AS c, CAST(sum(sim_pico) AS BIGINT) AS ssum
      FROM topk GROUP BY aid, alabel, blabel
    ), pred AS (
      SELECT aid, alabel, blabel AS plabel FROM (
        SELECT aid, alabel, blabel,
               row_number() OVER (PARTITION BY aid
                 ORDER BY c DESC, ssum DESC, blabel) AS r
        FROM votes
      ) WHERE r = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_anchors,
           CAST({_KNN_ACC_K} AS BIGINT) AS k,
           floor(CAST(sum(CASE WHEN plabel = alabel THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) * 1000000.0) / 1000000.0
             AS accuracy
    FROM pred
    """,
)
def ml_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out k-NN label accuracy over a CODE-ENFORCED
    embedding slice: for each anchor in the slice, the 5 cosine-
    nearest OTHER slice vectors vote on its label (majority, ties by
    summed similarity then label), and the query reports the fraction
    of anchors whose vote matches their true label — the standard
    embedding-quality probe (does the space cluster by label?) that
    completes the eval family beside ``sim_knn_recall_audit`` (that
    row audits an ANN index's recall; this one audits the EMBEDDING's
    semantic structure).

    The slice is id-bounded in code (vec_id % 2 = 0 AND vec_id <
    1000 — the sim_blocked_recall pattern), so the all-pairs scoring
    is ≤ cap² work at EVERY corpus scale: this is an audit over a
    deterministic sample by contract, never a corpus-quadratic join.

    Parity: similarities are pico-quantized integers before ranking;
    both rank windows carry total tie-breaks (neighbor id; then label).

    Plan shape at 100 TB: slice scan (partition-pruned filter), one
    bounded self-join (≤ cap² rows), two PARTITIONED rank windows, a
    1-row aggregate.
    """
    e = load_table(spark, sf_dir, "embeddings").where(
        ((F.col("vec_id") % _KNN_ACC_MOD) == 0)
        & (F.col("vec_id") < _KNN_ACC_MOD * _KNN_ACC_CAP)
    )
    # Row norms are computed ONCE per slice row, before the pair join
    # (round-10 optimization, guide §1.2 per-task work): inside the
    # join each anchor's norm was re-folded once per candidate —
    # |slice|² interpreted higher-order folds instead of |slice|. The
    # per-value arithmetic is unchanged (same fold, same doubles), so
    # sim_pico is bit-identical; only WHERE the norm is evaluated moves.
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    a = e.select(
        F.col("vec_id").alias("aid"),
        F.col("embedding").alias("ea"),
        F.col("label").alias("alabel"),
        norm(F.col("embedding")).alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("bid"),
        F.col("embedding").alias("eb"),
        F.col("label").alias("blabel"),
        norm(F.col("embedding")).alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, F.col("aid") != F.col("bid"))
        .select(
            "aid",
            "alabel",
            "bid",
            "blabel",
            F.floor(dot / (F.col("na") * F.col("nb")) * F.lit(1e12))
            .cast("long")
            .alias("sim_pico"),
        )
    )
    w_rank = Window.partitionBy("aid").orderBy(
        F.col("sim_pico").desc(), "bid"
    )
    topk = pairs.withColumn("rnk", F.row_number().over(w_rank)).where(
        F.col("rnk") <= _KNN_ACC_K
    )
    votes = topk.groupBy("aid", "alabel", "blabel").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("sim_pico").cast("long").alias("ssum"),
    )
    w_vote = Window.partitionBy("aid").orderBy(
        F.col("c").desc(), F.col("ssum").desc(), "blabel"
    )
    pred = (
        votes.withColumn("r", F.row_number().over(w_vote))
        .where(F.col("r") == 1)
        .select("aid", "alabel", F.col("blabel").alias("plabel"))
    )
    return pred.agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.lit(_KNN_ACC_K).cast("long").alias("k"),
        trunc6(
            F.sum(
                F.when(F.col("plabel") == F.col("alabel"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("accuracy"),
    )


#: Gaussian NB quantization lattice (2^-20, the embed_label_centroids
#: grid), probe slice (10 fixed probes at every scale), shared 2π
_GNB_Q = 1048576.0
_GNB_SLICE = "vec_id % 50 = 0 AND vec_id < 500"
_GNB_2PI = 6.283185307179586


@query(
    "ml_gaussian_nb",
    oracle=f"""
    WITH q AS (
      SELECT label, CAST(i AS INTEGER) AS i,
             CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * {_GNB_Q!r}) AS BIGINT) AS qx
      FROM embeddings, unnest(range(1, 65)) t(i)
    ), n AS (
      SELECT label, CAST(count(*) AS BIGINT) AS nl FROM embeddings
      GROUP BY label
    ), nt AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM embeddings),
    s AS (
      SELECT label, i, CAST(sum(qx) AS BIGINT) AS sv,
             CAST(sum(CAST(qx AS HUGEINT) * qx) AS HUGEINT) AS sq
      FROM q GROUP BY label, i
    ), mv AS (
      SELECT s.label, s.i,
             CAST(s.sv AS DOUBLE) / CAST(n.nl AS DOUBLE) AS mu,
             CAST(CAST(n.nl AS HUGEINT) * s.sq
                  - CAST(s.sv AS HUGEINT) * s.sv AS DOUBLE)
               / (CAST(n.nl AS DOUBLE) * CAST(n.nl AS DOUBLE)) + 1.0
               AS var
      FROM s JOIN n USING (label)
    ), stats AS (
      SELECT label, list(mu ORDER BY i) AS mus,
             list(var ORDER BY i) AS vars
      FROM mv GROUP BY label
    ), probes AS (
      SELECT vec_id, label AS true_label,
             list_transform(range(1, 65),
               i -> CAST(CAST(floor(
                 CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                 * {_GNB_Q!r}) AS BIGINT) AS DOUBLE)) AS xq
      FROM embeddings WHERE {_GNB_SLICE}
    ), scored AS (
      SELECT p.vec_id, p.true_label, st.label,
             CAST(floor((ln(CAST(n.nl AS DOUBLE))
                         - ln(CAST(nt.ntot AS DOUBLE))
                         + list_sum(list_transform(range(1, 65),
                             i -> -0.5 * ln({_GNB_2PI!r} * st.vars[i])
                                  - (p.xq[i] - st.mus[i])
                                    * (p.xq[i] - st.mus[i])
                                    / (2.0 * st.vars[i]))))
                        * 1000000.0) AS BIGINT) AS score_micro
      FROM probes p CROSS JOIN stats st
      JOIN n ON n.label = st.label CROSS JOIN nt
    )
    SELECT vec_id, true_label, label AS pred_label, score_micro,
           CASE WHEN label = true_label THEN 1 ELSE 0 END AS correct
    FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY score_micro DESC, label) AS rn
      FROM scored
    ) WHERE rn = 1
    ORDER BY vec_id
    """,
)
def ml_gaussian_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian naive Bayes over embeddings: per-(label, dimension)
    mean/variance trained from the WHOLE table on the 2^-20 integer
    lattice, then the 10 fixed probe vectors classified by exact
    log-likelihood argmax ``ln π_c + Σ_i [−½ln(2πσ²) − (x−μ)²/2σ²]``
    — the continuous companion of ``ml_nb_classify`` (multinomial
    text NB), and the closed-form baseline every embedding-space
    classifier gets compared against. A +1 micro² variance floor
    guards degenerate dimensions deterministically.

    Exactness: moments are exact integers on the quantized lattice
    (HUGEINT/DECIMAL squares); μ, σ², and each 64-term score fold are
    identical float assemblies on both engines (left-to-right
    aggregate); scores compare as micro-quantized integers with label
    tie-break.

    Plan shape at 100 TB: one (label, dim) grouped integer aggregate
    (≤ |labels|×64 rows cross the shuffle — the embed_label_centroids
    shape), stats broadcast to the 10-probe slice, argmax over
    |labels| rows per probe.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        "pos",
        F.floor(F.col("x").cast("double") * F.lit(_GNB_Q))
        .cast("long")
        .alias("qx"),
    )
    n = e.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("nl"))
    nt = e.agg(F.count(F.lit(1)).cast("long").alias("ntot"))
    s = q.groupBy("label", "pos").agg(
        F.sum("qx").cast("long").alias("sv"),
        F.sum(
            F.col("qx").cast("decimal(19,0)") * F.col("qx").cast("decimal(19,0)")
        ).cast("decimal(28,0)").alias("sq"),
    )
    nld = F.col("nl").cast("double")
    mv = s.join(F.broadcast(n), "label").select(
        "label",
        "pos",
        (F.col("sv").cast("double") / nld).alias("mu"),
        (
            (
                F.col("nl").cast("decimal(10,0)") * F.col("sq")
                - F.col("sv").cast("decimal(19,0)")
                * F.col("sv").cast("decimal(19,0)")
            ).cast("double")
            / (nld * nld)
            + F.lit(1.0)
        ).alias("var"),
    )
    stats = mv.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mu"))),
            lambda st: st["mu"],
        ).alias("mus"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "var"))),
            lambda st: st["var"],
        ).alias("vars"),
    )
    probes = e.where(F.expr(_GNB_SLICE)).select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.expr(
            f"transform(sequence(1, 64), i -> cast(cast(floor("
            f"cast(element_at(embedding, i) as double) * {_GNB_Q!r}) "
            f"as bigint) as double))"
        ).alias("xq"),
    )
    scored = (
        probes.crossJoin(
            F.broadcast(
                stats.join(n, "label").crossJoin(F.broadcast(nt))
            )
        )
        .select(
            "vec_id",
            "true_label",
            "label",
            F.floor(
                (
                    F.log(F.col("nl").cast("double"))
                    - F.log(F.col("ntot").cast("double"))
                    + F.expr(
                        f"aggregate(sequence(1, 64), cast(0.0 as double), "
                        f"(acc, i) -> acc + (-0.5 * ln({_GNB_2PI!r} "
                        f"* element_at(vars, i)) "
                        f"- (element_at(xq, i) - element_at(mus, i)) "
                        f"* (element_at(xq, i) - element_at(mus, i)) "
                        f"/ (2.0 * element_at(vars, i))))"
                    )
                )
                * F.lit(1e6)
            )
            .cast("long")
            .alias("score_micro"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("score_micro").desc(), "label"
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            "true_label",
            F.col("label").alias("pred_label"),
            "score_micro",
            (F.col("label") == F.col("true_label"))
            .cast("int")
            .alias("correct"),
        )
        .orderBy("vec_id")
    )
