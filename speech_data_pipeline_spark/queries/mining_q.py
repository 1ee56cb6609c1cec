"""Data-mining queries: exact substring-span dedup, feature-hashed
embedding search, temperature-based domain mixing, matrix-free PCA.

Round-3 widening of the training-data-pipeline surface beyond
queries/corpus_q.py. Engine-portable by construction: md5-prefix
hashes for content identity, integer arithmetic wherever sums cross a
shuffle, ``sqrt``/division as the only float ops (IEEE-exact), trunc6
on every reported fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speech_data_pipeline_spark.functions import trunc6
from speech_data_pipeline_spark.operators import dedup as dd
from speech_data_pipeline_spark.operators import text as tx
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.sources.catalog import load_table

#: Substring-dedup gram width (words). Lee et al. use 50 BPE tokens on
#: web text; 5 words keeps a meaningful duplicated-span population on
#: the synthetic small-vocabulary corpus (~14% of docs at sf0.01).
_SPAN_N = 5


def _hex15_sql(md5_expr: str) -> str:
    """DuckDB: first 15 md5 hex chars → 60-bit bigint (nibble fold)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({md5_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


@query(
    "dedup_substring_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '([a-z]+)', 1) AS t
      FROM documents
    ), base AS (
      SELECT doc_id, len(t) AS n_toks FROM toks
    ), grams AS (
      SELECT doc_id,
             unnest(range(1, greatest(len(t) - {_SPAN_N - 1}, 0) + 1)) AS pos,
             t
      FROM toks
    ), hashed AS (
      SELECT doc_id, pos,
             {_hex15_sql(
                 "md5(array_to_string(list_slice(t, CAST(pos AS INTEGER), "
                 f"CAST(pos AS INTEGER) + {_SPAN_N - 1}), ' '))"
             )} AS gh
      FROM grams
    ), dup AS (
      SELECT doc_id, pos
      FROM (SELECT doc_id, pos, count(*) OVER (PARTITION BY gh) AS c
            FROM hashed)
      WHERE c >= 2
    ), spans AS (
      SELECT doc_id,
             count(*) AS n_dup_grams,
             sum(CASE WHEN prev IS NULL OR pos - prev > {_SPAN_N}
                 THEN 1 ELSE 0 END) AS n_dup_spans,
             sum(CASE WHEN prev IS NULL THEN {_SPAN_N}
                 ELSE least(pos - prev, {_SPAN_N}) END) AS cov
      FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM dup)
      GROUP BY doc_id
    )
    SELECT b.doc_id,
           b.n_toks,
           CAST(COALESCE(s.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
           CAST(COALESCE(s.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           floor(CASE WHEN b.n_toks > 0
                 THEN COALESCE(s.cov, 0) * 1.0 / b.n_toks
                 ELSE 0.0 END * 1000000.0) / 1000000.0 AS dup_tok_frac
    FROM base b LEFT JOIN spans s USING (doc_id)
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring coverage (Lee et al. 2021
    word-gram variant): which spans of each document also appear
    elsewhere in the corpus, and how much of the text they cover."""
    d = load_table(spark, sf_dir, "documents")
    return dd.duplicated_span_stats(d, n=_SPAN_N, min_count=2)


@query(
    "dedup_substring_clean",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '([a-z]+)', 1) AS t
      FROM documents
    ), base AS (
      SELECT doc_id, len(t) AS n_toks FROM toks
    ), grams AS (
      SELECT doc_id,
             unnest(range(1, greatest(len(t) - {_SPAN_N - 1}, 0) + 1)) AS pos,
             t
      FROM toks
    ), hashed AS (
      SELECT doc_id, pos,
             {_hex15_sql(
                 "md5(array_to_string(list_slice(t, CAST(pos AS INTEGER), "
                 f"CAST(pos AS INTEGER) + {_SPAN_N - 1}), ' '))"
             )} AS gh
      FROM grams
    ), dup AS (
      SELECT doc_id, pos
      FROM (SELECT doc_id, pos, count(*) OVER (PARTITION BY gh) AS c
            FROM hashed)
      WHERE c >= 2
    ), marks AS (
      SELECT doc_id, pos,
             CASE WHEN prev IS NULL OR pos - prev > {_SPAN_N}
                  THEN 1 ELSE 0 END AS is_start
      FROM (SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM dup)
    ), spanid AS (
      SELECT doc_id, pos,
             sum(is_start) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
      FROM marks
    ), spans AS (
      SELECT doc_id, sid, min(pos) AS s, max(pos) + {_SPAN_N - 1} AS e
      FROM spanid GROUP BY doc_id, sid
    ), rm AS (
      SELECT doc_id, unnest(range(s, e + 1)) AS idx FROM spans
    ), tokpos AS (
      SELECT doc_id, unnest(t) AS tok,
             unnest(range(1, len(t) + 1)) AS idx
      FROM toks
    ), cleaned AS (
      SELECT p.doc_id,
             count(r.idx) AS n_removed,
             coalesce(array_to_string(
                 list(p.tok ORDER BY p.idx) FILTER (WHERE r.idx IS NULL),
                 ' '), '') AS clean_text
      FROM tokpos p LEFT JOIN rm r
        ON p.doc_id = r.doc_id AND p.idx = r.idx
      GROUP BY p.doc_id
    )
    SELECT b.doc_id,
           b.n_toks,
           CAST(coalesce(c.n_removed, 0) AS BIGINT) AS n_removed,
           coalesce(c.clean_text, '') AS clean_text
    FROM base b LEFT JOIN cleaned c USING (doc_id)
    """,
)
def dedup_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-span EXCISION (Lee et al. 2021's actual dedup step):
    cut every token covered by a duplicated merged span and emit the
    cleaned text — the production operator whose statistics
    ``dedup_substring_spans`` reports. The oracle replays gram
    hashing, span merge, index expansion, and an ordered
    filtered-list re-join, so the cleaned STRINGS hash-match, not
    just the counts."""
    d = load_table(spark, sf_dir, "documents")
    return dd.duplicated_span_clean(d, n=_SPAN_N, min_count=2)


#: Hash-embedding geometry + the literal search query.
_HE_DIM = 64
_HE_QUERY = "fast hash join over sorted columns"


def _he_query_parts():
    import math

    from speech_data_pipeline_spark.operators.text import hash_embed_vector

    qv = hash_embed_vector(_HE_QUERY, _HE_DIM)
    qnorm = math.sqrt(sum(v * v for v in qv.values()))
    return qv, qnorm


def _he_scored_ctes() -> str:
    """The hash-embed scored relation as composable CTE text (ends at
    ``hescored`` = (doc_id, cos_sim), no ORDER/LIMIT)."""
    qv, qnorm = _he_query_parts()
    values = ", ".join(f"({b}, {v})" for b, v in sorted(qv.items()))
    shift = _HE_DIM.bit_length() - 1
    return f"""occ AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS w
      FROM documents
    ), hh AS (
      SELECT doc_id, {_hex15_sql("md5(w)")} AS h FROM occ
    ), sp AS (
      SELECT doc_id, h % {_HE_DIM} AS bucket,
             CAST(SUM(CASE WHEN (h >> {shift}) % 2 = 0 THEN 1 ELSE -1 END)
                  AS BIGINT) AS dv
      FROM hh GROUP BY doc_id, bucket
    ), q(bucket, qv) AS (VALUES {values}),
    heagg AS (
      SELECT doc_id,
             CAST(SUM(dv * COALESCE(qv, 0)) AS BIGINT) AS num,
             CAST(SUM(dv * dv) AS BIGINT) AS nrm2
      FROM sp LEFT JOIN q USING (bucket) GROUP BY doc_id
    ), hescored AS (
      SELECT doc_id,
             floor(num / (sqrt(CAST(nrm2 AS DOUBLE)) * {qnorm!r})
                   * 1000000.0) / 1000000.0 AS cos_sim
      FROM heagg
      WHERE nrm2 > 0
    )"""


def _he_oracle() -> str:
    qv, qnorm = _he_query_parts()
    values = ", ".join(f"({b}, {v})" for b, v in sorted(qv.items()))
    shift = _HE_DIM.bit_length() - 1
    return f"""
    WITH occ AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS w
      FROM documents
    ), hh AS (
      SELECT doc_id, {_hex15_sql("md5(w)")} AS h FROM occ
    ), sp AS (
      SELECT doc_id, h % {_HE_DIM} AS bucket,
             CAST(SUM(CASE WHEN (h >> {shift}) % 2 = 0 THEN 1 ELSE -1 END)
                  AS BIGINT) AS dv
      FROM hh GROUP BY doc_id, bucket
    ), q(bucket, qv) AS (VALUES {values}),
    agg AS (
      SELECT doc_id,
             CAST(SUM(dv * COALESCE(qv, 0)) AS BIGINT) AS num,
             CAST(SUM(dv * dv) AS BIGINT) AS nrm2
      FROM sp LEFT JOIN q USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id,
           floor(num / (sqrt(CAST(nrm2 AS DOUBLE)) * {qnorm!r})
                 * 1000000.0) / 1000000.0 AS cos_sim
    FROM agg
    WHERE nrm2 > 0
    ORDER BY cos_sim DESC, doc_id
    LIMIT 10
    """


@query("sim_hash_embed_search", oracle=_he_oracle())
def sim_hash_embed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free semantic-ish search: feature-hashed bag-of-words
    embeddings (operators/text.py hash_embed_sparse) scored by cosine
    against a literal query string's own hash embedding.

    Plan shape: one (id, bucket) shuffle builds the doc vectors; the
    query vector is a ≤dim-row broadcast; numerator and norm come out
    of ONE groupBy(id) (left-join the query first, aggregate both sums
    together); top-10 is TakeOrderedAndProject. All integer until the
    final divide — exact on any engine.
    """
    return (
        _hash_embed_scored(spark, sf_dir)
        .orderBy(F.col("cos_sim").desc(), "doc_id")
        .limit(10)
    )


def _hash_embed_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cos_sim) hash-embed scores, unlimited (shared by the
    sparse search query and the RRF fusion's sparse branch)."""
    from speech_data_pipeline_spark.functions import trunc6
    from speech_data_pipeline_spark.operators.text import hash_embed_sparse

    qv, qnorm = _he_query_parts()
    d = load_table(spark, sf_dir, "documents")
    sp = hash_embed_sparse(d, dim=_HE_DIM)
    qdf = spark.createDataFrame(
        sorted(qv.items()), "bucket long, qv long"
    )
    agg = (
        sp.join(F.broadcast(qdf), "bucket", "left")
        .groupBy("id")
        .agg(
            F.sum(F.col("dv") * F.coalesce(F.col("qv"), F.lit(0))).alias("num"),
            F.sum(F.col("dv") * F.col("dv")).alias("nrm2"),
        )
    )
    return agg.where(F.col("nrm2") > 0).select(
        F.col("id").alias("doc_id"),
        trunc6(
            F.col("num")
            / (F.sqrt(F.col("nrm2").cast("double")) * F.lit(qnorm))
        ).alias("cos_sim"),
    )


#: Temperature-mixing knobs: doc budget to allocate, weight quantum.
_MIX_BUDGET = 10_000
_MIX_Q = 10 ** 12


@query(
    "mix_temperature_domains",
    oracle=f"""
    WITH per AS (
      SELECT source,
             count(*) AS n_docs,
             CAST(SUM(len(regexp_extract_all(lower(text), '([a-z]+)', 1)))
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens FROM per
    ), wq AS (
      SELECT source, n_docs, n_tokens,
             CAST(floor(sqrt(n_tokens * 1.0 / tot_tokens) * {_MIX_Q})
                  AS BIGINT) AS w
      FROM per, tot
    ), sw AS (
      SELECT CAST(SUM(w) AS BIGINT) AS sum_w FROM wq
    )
    SELECT source, n_docs, n_tokens,
           floor(n_tokens * 1.0 / (SELECT tot_tokens FROM tot)
                 * 1000000.0) / 1000000.0 AS share_natural,
           floor(w * 1.0 / sum_w * 1000000.0) / 1000000.0 AS share_temp,
           CAST(({_MIX_BUDGET} * w) // sum_w AS BIGINT) AS target_docs,
           floor((({_MIX_BUDGET} * w) // sum_w) * 1.0 / n_docs
                 * 1000000.0) / 1000000.0 AS epochs
    FROM wq, sw
    ORDER BY source
    """,
)
def mix_temperature_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled domain mixture (the GPT-3 / LLaMA / DoReMi
    pretraining-mix recipe): per-source sampling weights ∝ p^α with
    α = 0.5, flattening the natural token distribution so small
    domains are up-sampled. Reports natural vs tempered shares, the
    doc allocation of a fixed budget, and effective epochs per source
    (>1 ⇒ that domain repeats).

    Determinism: α = 0.5 makes the tempering a ``sqrt`` — IEEE
    correctly-rounded in every engine (a general ``pow`` is only
    1-ulp-accurate and can flip a floor at quantization). Weights are
    quantized to integers before normalization, so the allocation is
    pure bigint arithmetic.

    Plan shape: one groupBy(source) over the corpus (map-side
    combine), then a single-row global sum broadcast back — the
    textbook two-level aggregate; nothing scales with corpus size but
    the first scan.
    """
    from speech_data_pipeline_spark.functions import trunc6

    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).cast("long").alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").cast("long").alias("tot_tokens"))
    wq = per.crossJoin(F.broadcast(tot)).withColumn(
        "w",
        F.floor(
            F.sqrt(F.col("n_tokens") / F.col("tot_tokens")) * F.lit(_MIX_Q)
        ).cast("long"),
    )
    sw = wq.agg(F.sum("w").cast("long").alias("sum_w"))
    # exact bigint floor-division (a double divide + floor can flip
    # near an integer quotient; `div` is the SQL `//`)
    target = F.expr(f"({_MIX_BUDGET}L * w) div sum_w")
    return (
        wq.crossJoin(F.broadcast(sw))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            trunc6(F.col("n_tokens") / F.col("tot_tokens")).alias(
                "share_natural"
            ),
            trunc6(F.col("w") / F.col("sum_w")).alias("share_temp"),
            target.alias("target_docs"),
            trunc6(target / F.col("n_docs")).alias("epochs"),
        )
        .orderBy("source")
    )


#: PCA geometry: embedding dim, power-iteration rounds, fixed-point
#: grids (mirrors operators/similarity.py pca_power_topk defaults).
_PCA_D = 64
_PCA_ITERS = 3
_PCA_QB = float(1 << 20)
_PCA_CB = float(1 << 24)


def _pca_oracle() -> str:
    d, qb, cb = _PCA_D, _PCA_QB, _PCA_CB
    s_list = ", ".join(
        f"sum(CAST(floor(x[{j + 1}] * {qb!r}) AS BIGINT))" for j in range(d)
    )
    u_list = ", ".join(
        f"sum(CAST(floor(xc[{j + 1}] * dv * {cb!r}) AS BIGINT))"
        for j in range(d)
    )
    rng = f"range(1, {d + 1})"
    # iteration chain: d1 uses the literal v0; d2/d3 use the previous
    # normalized vector CTE. Every fold is list_sum over an
    # index-ordered list_transform — left-to-right like F.aggregate.
    its = [f"""
    d1 AS (
      SELECT vec_id, xc,
             list_sum(list_transform({rng}, j -> xc[j] * {1.0 / d ** 0.5!r}))
               AS dv
      FROM p
    ), u1 AS (
      SELECT [{u_list}] AS u FROM d1
    ), v1 AS (
      SELECT list_transform(un, e ->
               CASE WHEN nrm = 0.0 THEN 0.0 ELSE e / nrm END) AS v
      FROM (SELECT un, sqrt(list_sum(list_transform(un, y -> y * y))) AS nrm
            FROM (SELECT list_transform(u, e -> e / {cb!r}) AS un
                  FROM u1))
    )"""]
    for it in range(2, _PCA_ITERS + 1):
        its.append(f"""
    d{it} AS (
      SELECT p.vec_id, p.xc,
             list_sum(list_transform({rng}, j -> p.xc[j] * w.v[j])) AS dv
      FROM p, v{it - 1} w
    ), u{it} AS (
      SELECT [{u_list}] AS u FROM d{it}
    ), v{it} AS (
      SELECT list_transform(un, e ->
               CASE WHEN nrm = 0.0 THEN 0.0 ELSE e / nrm END) AS v
      FROM (SELECT un, sqrt(list_sum(list_transform(un, y -> y * y))) AS nrm
            FROM (SELECT list_transform(u, e -> e / {cb!r}) AS un
                  FROM u{it}))
    )""")
    return f"""
    WITH base AS (
      SELECT vec_id,
             list_transform({rng}, j -> CAST(embedding[j] AS DOUBLE)) AS x
      FROM embeddings
    ), qs AS (
      SELECT [{s_list}] AS s, count(*) AS n FROM base
    ), mu AS (
      SELECT list_transform({rng}, j -> s[j] / (n * {qb!r})) AS mu FROM qs
    ), p AS (
      SELECT b.vec_id,
             list_transform({rng}, j -> b.x[j] - m.mu[j]) AS xc
      FROM base b, mu m
    ),{",".join(its)}
    SELECT p.vec_id,
           floor(list_sum(list_transform({rng}, j -> p.xc[j] * w.v[j]))
                 * 1000000.0) / 1000000.0 AS pc1
    FROM p, v{_PCA_ITERS} w
    ORDER BY pc1 DESC, vec_id
    LIMIT 20
    """


@query("embed_pca_power", oracle=_pca_oracle())
def embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First principal component of the embedding corpus by matrix-free
    power iteration (operators/similarity.py pca_power_topk): top-20
    projections onto PC1. The covariance matrix never materializes —
    each round is ONE corpus aggregate of dim integer sums."""
    from speech_data_pipeline_spark.operators.similarity import pca_power_topk

    e = load_table(spark, sf_dir, "embeddings")
    return pca_power_topk(e, dim=_PCA_D, iters=_PCA_ITERS, k=20)


#: Gap-fill grid step: 1 day in microseconds.
_GF_STEP = 86_400_000_000


@query(
    "ts_gapfill_interpolate",
    oracle=f"""
    WITH obs AS (
      SELECT user_id, epoch_us(ts) AS t, arg_max(value, event_id) AS v
      FROM events
      WHERE event_type = 'view' AND value IS NOT NULL
      GROUP BY user_id, epoch_us(ts)
    ), bounds AS (
      SELECT user_id,
             CAST(ceil(min(t) * 1.0 / {_GF_STEP}) AS BIGINT) AS g0,
             CAST(floor(max(t) * 1.0 / {_GF_STEP}) AS BIGINT) AS g1
      FROM obs GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(range(g0, g1 + 1)) * {_GF_STEP} AS t
      FROM bounds WHERE g1 >= g0
    ), u AS (
      SELECT user_id, t, 0 AS kind, v FROM obs
      UNION ALL
      SELECT user_id, t, 1 AS kind, NULL AS v FROM grid
    ), w AS (
      SELECT user_id, t, kind,
             last_value(CASE WHEN kind = 0 THEN t END IGNORE NULLS)
               OVER win_p AS pt,
             last_value(CASE WHEN kind = 0 THEN v END IGNORE NULLS)
               OVER win_p AS pv,
             first_value(CASE WHEN kind = 0 THEN t END IGNORE NULLS)
               OVER win_f AS nt,
             first_value(CASE WHEN kind = 0 THEN v END IGNORE NULLS)
               OVER win_f AS nv
      FROM u
      WINDOW
        win_p AS (PARTITION BY user_id ORDER BY t, kind
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        win_f AS (PARTITION BY user_id ORDER BY t, kind
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, t AS grid_us,
           floor((CASE WHEN nt > pt
                  THEN pv + (nv - pv) * ((t - pt) * 1.0 / (nt - pt))
                  ELSE pv END) * 1000000.0) / 1000000.0 AS value_interp
    FROM w
    WHERE kind = 1 AND pt IS NOT NULL AND nt IS NOT NULL
    ORDER BY user_id, grid_us
    """,
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: resample each user's 'view' value series
    onto a regular daily grid with LINEAR interpolation between the
    surrounding observations (the timeseries-DB `interpolate()` /
    `time_bucket_gapfill` operator).

    Plan shape: observations collapse to one row per (user, ts)
    (arg_max tie-break); the grid is generated IN-ROW from each user's
    min/max (sequence + explode — no calendar table, no cross join);
    union + ONE hash shuffle on user_id feeds two window passes over
    the same sort (carry-forward previous obs, carry-back next obs) —
    Spark plans both windows in a single sort of one exchange. Grid
    cardinality is (span/step) per user, bounded by construction.

    Interpolation arithmetic: timestamps are exact integer micros;
    the lerp is per-row IEEE double, trunc6 on output — identical
    cross-engine.
    """
    from speech_data_pipeline_spark.functions import trunc6

    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.where((F.col("event_type") == "view") & F.col("value").isNotNull())
        .groupBy("user_id", F.expr("ts div 1000").alias("t"))
        .agg(F.max_by("value", "event_id").alias("v"))
    )
    bounds = obs.groupBy("user_id").agg(
        F.ceil(F.min("t") / F.lit(float(_GF_STEP))).cast("long").alias("g0"),
        F.floor(F.max("t") / F.lit(float(_GF_STEP))).cast("long").alias("g1"),
    )
    grid = (
        bounds.where(F.col("g1") >= F.col("g0"))
        .select(
            "user_id",
            F.explode(F.sequence("g0", "g1")).alias("gi"),
        )
        .select("user_id", (F.col("gi") * _GF_STEP).alias("t"))
    )
    u = obs.select(
        "user_id", "t", F.lit(0).alias("kind"), F.col("v")
    ).unionByName(
        grid.select(
            "user_id",
            "t",
            F.lit(1).alias("kind"),
            F.lit(None).cast("double").alias("v"),
        )
    )
    w_p = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry-BACK as a running window over the REVERSED sort: a
    # [currentRow, unboundedFollowing) frame looks symmetric but Spark
    # re-evaluates it from scratch per row — O(n²) in the partition,
    # 33 s on the stress set's hot user vs ~1 s for this form. (t,
    # kind) is unique per user, so the reversed order is exactly the
    # reversed sequence and `last` here == `first` over the
    # forward-looking frame, equal-t ties included.
    w_f = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").desc(), F.col("kind").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_t = F.when(F.col("kind") == 0, F.col("t"))
    obs_v = F.when(F.col("kind") == 0, F.col("v"))
    scored = u.select(
        "user_id",
        "t",
        "kind",
        F.last(obs_t, ignorenulls=True).over(w_p).alias("pt"),
        F.last(obs_v, ignorenulls=True).over(w_p).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(w_f).alias("nt"),
        F.last(obs_v, ignorenulls=True).over(w_f).alias("nv"),
    )
    lerp = F.when(
        F.col("nt") > F.col("pt"),
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((F.col("t") - F.col("pt")) / (F.col("nt") - F.col("pt"))),
    ).otherwise(F.col("pv"))
    return (
        scored.where(
            (F.col("kind") == 1)
            & F.col("pt").isNotNull()
            & F.col("nt").isNotNull()
        )
        .select(
            "user_id",
            F.col("t").alias("grid_us"),
            trunc6(lerp).alias("value_interp"),
        )
        .orderBy("user_id", "grid_us")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH pr AS (
      SELECT l_partkey, l_suppkey,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS p
      FROM lineitem
    ), m AS (
      SELECT l_partkey, min(p) AS mp FROM pr GROUP BY l_partkey
    ), w AS (
      SELECT pr.l_partkey, min(pr.l_suppkey) AS l_suppkey, m.mp
      FROM pr JOIN m ON pr.l_partkey = m.l_partkey AND pr.p = m.mp
      GROUP BY pr.l_partkey, m.mp
    )
    SELECT w.l_partkey AS p_partkey, p.p_name, w.l_suppkey AS s_suppkey,
           s.s_name, CAST(w.mp AS DOUBLE) AS min_price
    FROM w JOIN part p ON w.l_partkey = p.p_partkey
           JOIN supplier s ON w.l_suppkey = s.s_suppkey
    ORDER BY min_price DESC, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated min-cost subquery) re-keyed to this
    schema: for every part, the cheapest observed supplier — the
    classic ``WHERE cost = (SELECT min(cost) ... )`` decorrelated into
    one grouped aggregate.

    Plan shape: ONE lineitem shuffle — ``min(struct(price, suppkey))``
    per part computes the min price and its tie-broken supplier in the
    same pass (the oracle replays it as min + equality join-back, the
    textbook decorrelation; the struct-min is the one-pass Spark
    form). Part and supplier attach as broadcast dimensions; top-100
    is TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    w = (
        li.select(
            "l_partkey",
            F.struct(
                F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
                F.col("l_suppkey").alias("k"),
            ).alias("ps"),
        )
        .groupBy("l_partkey")
        .agg(F.min("ps").alias("m"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("m.k").alias("s_suppkey"),
            F.col("m.p").cast("double").alias("min_price"),
        )
    )
    return (
        w.join(F.broadcast(p), "p_partkey")
        .join(F.broadcast(s), "s_suppkey")
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "min_price")
        .orderBy(F.col("min_price").desc(), "p_partkey")
        .limit(100)
    )


@query(
    "q13_order_count_histogram",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM co GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the orders-per-customer distribution (including
    zero-order customers via the outer join). Two shuffles: the outer
    join + per-customer count, then the tiny histogram aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    co = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "grouping_sets_report",
    oracle="""
    SELECT n.n_name, c.c_mktsegment,
           CAST(GROUPING(n.n_name) AS BIGINT) * 2 +
           CAST(GROUPING(c.c_mktsegment) AS BIGINT) AS gid,
           count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n.n_name, c.c_mktsegment), (n.n_name),
                            (c.c_mktsegment), ())
    ORDER BY gid, n_name NULLS FIRST, c_mktsegment NULLS FIRST
    """,
)
def grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS beyond rollup/cube: the four-set account-balance
    report with an explicit grouping id (``GROUPING`` flags
    disambiguate a NULL group key from the all-group row — the
    standard cube-table idiom).

    Plan shape: Spark expands grouping sets into one Expand + ONE
    grouped aggregate (not a union of four scans); nation is a
    broadcast dimension; decimal sums are merge-order-proof.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    gid = (
        F.grouping("n_name").cast("long") * 2
        + F.grouping("c_mktsegment").cast("long")
    ).alias("gid")
    return (
        j.groupingSets(
            [["n_name", "c_mktsegment"], ["n_name"], ["c_mktsegment"], []],
            "n_name",
            "c_mktsegment",
        )
        .agg(
            gid,
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
        .select(
            "n_name", "c_mktsegment", "gid", "n_customers", "total_acctbal"
        )
        .orderBy(
            "gid",
            F.col("n_name").asc_nulls_first(),
            F.col("c_mktsegment").asc_nulls_first(),
        )
    )


#: Banded time join: half-band width in microseconds (±5 minutes).
_BAND_US = 300_000_000


@query(
    "j_banded_time_join",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS t FROM events
    ), pairs AS (
      SELECT a.event_id, count(*) AS n_near
      FROM e a JOIN e b
        ON b.t >= a.t - {_BAND_US} AND b.t <= a.t + {_BAND_US}
       AND a.user_id <> b.user_id
      GROUP BY a.event_id
    )
    SELECT e.event_id, CAST(COALESCE(p.n_near, 0) AS BIGINT) AS n_near
    FROM e LEFT JOIN pairs p USING (event_id)
    ORDER BY n_near DESC, event_id
    LIMIT 200
    """,
)
def j_banded_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded time self-join as a COUNT-BY-RANK, never a pair join:
    how many events of OTHER users happened within ±5 minutes of each
    event.

    A naive theta-join on ``|t_a - t_b| <= band`` plans as a nested
    loop; the round-4 bucketed equi-join fixed that but still
    MATERIALIZED every in-band pair — O(n²·band/span) joined rows, the
    one plan the sf1 stress bench caught scaling super-linearly
    (17.7× on 10× data). The query only needs counts, so round 5
    computes them by rank without building a single pair:

      n_near(a) = N_all(a) − N_same(a)
      N_all(a)  = c[k] + (c[k−1] − #{b∈k−1: t_b < t_a−band})
                       + #{b∈k+1: t_b ≤ t_a+band}     (k = t_a div band)
      N_same(a) = per-user RANGE window count over ±band (self incl.
                  both terms, so it cancels)

    bucket width = band, so [t−band, t+band] always covers bucket k
    entirely and clips only k−1 / k+1 — the two boundary terms. Those
    come from ONE running-count sweep per bucket: union the build rows
    with lo/hi marker rows, sort key (t, kind) placing a lo marker
    BEFORE equal-t builds (making ``<`` exact) and a hi marker AFTER
    them (making ``≤`` exact), then a running sum of builds. Every
    stage is linear in events and every shuffle is a hash shuffle on
    (bucket | user | event_id); a hot bucket costs one O(m log m) sort
    instead of O(m²) pairs — that is what survives 100 TB.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "user_id", F.expr("ts div 1000").alias("t")
    ).withColumn("bk0", F.expr(f"t div {_BAND_US}"))

    w_user = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-_BAND_US, _BAND_US)
    )
    same = e.select(
        "event_id",
        "bk0",
        F.count(F.lit(1)).over(w_user).alias("n_same"),
    )

    bcnt = e.groupBy(F.col("bk0").alias("bk")).agg(
        F.count(F.lit(1)).alias("c")
    )

    build = e.select(
        F.col("bk0").alias("bk"),
        F.col("t").alias("tm"),
        F.lit(0).alias("sk"),
        F.lit(None).cast("long").alias("mid"),
    )
    lo = e.select(
        (F.col("bk0") - 1).alias("bk"),
        (F.col("t") - _BAND_US).alias("tm"),
        F.lit(-1).alias("sk"),
        F.col("event_id").alias("mid"),
    )
    hi = e.select(
        (F.col("bk0") + 1).alias("bk"),
        (F.col("t") + _BAND_US).alias("tm"),
        F.lit(1).alias("sk"),
        F.col("event_id").alias("mid"),
    )
    w_sweep = (
        Window.partitionBy("bk")
        .orderBy("tm", "sk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marks = (
        build.unionByName(lo)
        .unionByName(hi)
        .select(
            "bk",
            "sk",
            "mid",
            F.sum(F.when(F.col("sk") == 0, 1).otherwise(0))
            .over(w_sweep)
            .alias("r"),
        )
        .where(F.col("sk") != 0)
        .groupBy(F.col("mid").alias("event_id"))
        .agg(
            F.sum(F.when(F.col("sk") == -1, F.col("r"))).alias("lt_lo"),
            F.sum(F.when(F.col("sk") == 1, F.col("r"))).alias("le_hi"),
            F.max(F.when(F.col("sk") == -1, F.col("bk"))).alias("bk_lo"),
        )
    )
    return (
        same.join(marks, "event_id")
        .join(
            bcnt.select(F.col("bk").alias("bk0"), F.col("c").alias("c_k")),
            "bk0",
        )
        .join(
            bcnt.select(
                F.col("bk").alias("bk_lo"), F.col("c").alias("c_lo")
            ),
            "bk_lo",
            "left",
        )
        .select(
            "event_id",
            (
                F.col("c_k")
                + (F.coalesce("c_lo", F.lit(0)) - F.col("lt_lo"))
                + F.col("le_hi")
                - F.col("n_same")
            ).alias("n_near"),
        )
        .orderBy(F.col("n_near").desc(), "event_id")
        .limit(200)
    )



@query(
    "dedup_fuzzy_partnames",
    oracle="""
    WITH names AS (
      SELECT DISTINCT p_name FROM part
    ), keyed AS (
      SELECT p_name,
             regexp_extract(p_name, '([a-z]+)$', 1) AS blk
      FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM keyed a JOIN keyed b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    ORDER BY dist, name_a, name_b
    """,
)
def dedup_fuzzy_partnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching with BLOCKING — the record-linkage
    primitive: near-identical part names by Levenshtein distance ≤ 4,
    candidate pairs restricted to names sharing their final word (the
    noun) so the quadratic comparison never crosses blocks.

    Plan shape: names collapse to the DISTINCT vocabulary first (names
    are vocabulary-sized, not corpus-sized — the dedup groupBy is the
    corpus' only shuffle); the self-join is a plain equi-join on the
    block key with the edit distance as a residual, so per-block work
    is O(block²) with vocabulary-bounded blocks. Levenshtein is the
    classic integer DP in both engines — exact parity.
    """
    p = load_table(spark, sf_dir, "part")
    keyed = p.select("p_name").distinct().select(
        "p_name",
        F.regexp_extract(F.col("p_name"), "([a-z]+)$", 1).alias("blk"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(dist <= 4)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("long").alias("dist"),
        )
        .orderBy("dist", "name_a", "name_b")
    )


@query(
    "scd2_user_value_history",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS t, event_id, value
      FROM events WHERE event_type = 'signup'
    ), chg AS (
      SELECT user_id, t, event_id, value,
             lag(value) OVER w AS prev_value
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ), hist AS (
      SELECT user_id, t AS valid_from, value,
             lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
               AS valid_to
      FROM chg
      WHERE prev_value IS NULL OR value <> prev_value
    )
    SELECT user_id, valid_from, valid_to,
           floor(value * 1000000.0) / 1000000.0 AS value,
           CAST(valid_to IS NULL AS BOOLEAN) AS is_current
    FROM hist
    ORDER BY user_id, valid_from
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (SCD type 2) history build: collapse
    each user's 'signup' value stream into validity intervals
    [valid_from, valid_to) that open when the value CHANGES and close
    at the next change (NULL = current row) — the standard warehouse
    dimension-history operator, derived here from the raw event log.

    Plan shape: one user_id shuffle; change detection (lag) and
    interval close (lead over the filtered change rows) are two window
    passes over the same sort. Timestamps stay integer micros;
    deterministic order by (t, event_id).
    """
    from speech_data_pipeline_spark.functions import trunc6

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "signup"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    chg = (
        ev.select(
            "user_id",
            F.expr("ts div 1000").alias("t"),
            "event_id",
            "value",
        )
        .withColumn("prev_value", F.lag("value").over(w))
        .where(
            F.col("prev_value").isNull()
            | (F.col("value") != F.col("prev_value"))
        )
    )
    hist = chg.select(
        "user_id",
        F.col("t").alias("valid_from"),
        "value",
        F.lead("t").over(
            Window.partitionBy("user_id").orderBy("t", "event_id")
        ).alias("valid_to"),
        "event_id",
    )
    return hist.select(
        "user_id",
        "valid_from",
        "valid_to",
        trunc6(F.col("value")).alias("value"),
        F.col("valid_to").isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from")


#: Reciprocal-rank-fusion constant (Cormack et al. 2009's k=60) and
#: per-branch candidate depth.
_RRF_K = 60
_RRF_DEPTH = 20


def _rrf_oracle() -> str:
    return f"""
    WITH {_he_scored_ctes()},
    qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
    dscored AS (
      SELECT e.vec_id,
             floor((
               list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.v[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(qv.v,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
               * 1000000.0) / 1000000.0 AS cos_sim
      FROM embeddings e, qv
    ),
    dtop AS (SELECT vec_id, cos_sim FROM dscored
             ORDER BY cos_sim DESC, vec_id LIMIT {_RRF_DEPTH}),
    dense AS (SELECT vec_id AS id,
                     CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id)
                          AS BIGINT) AS rd
              FROM dtop),
    stop_ AS (SELECT doc_id, cos_sim FROM hescored
              ORDER BY cos_sim DESC, doc_id LIMIT {_RRF_DEPTH}),
    sparse AS (SELECT doc_id AS id,
                      CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id)
                           AS BIGINT) AS rs
               FROM stop_),
    fused AS (
      SELECT COALESCE(d.id, s.id) AS id, d.rd, s.rs,
             COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + d.rd), 0)
               + COALESCE(CAST(1.0 AS DOUBLE) / ({_RRF_K} + s.rs), 0) AS score
      FROM dense d FULL OUTER JOIN sparse s ON d.id = s.id
    )
    SELECT id, rd AS dense_rank, rs AS sparse_rank,
           floor(score * 1000000.0) / 1000000.0 AS rrf_score
    FROM fused
    ORDER BY score DESC, id
    LIMIT 10
    """


@query("sim_rrf_fusion", oracle=_rrf_oracle())
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of a dense branch
    (brute-force cosine over ``embeddings`` vs the vec_id=0 query) and
    a sparse branch (hashing-trick bag-of-words search over
    ``documents``), RRF score = Σ 1/(60 + rank) (Cormack et al. 2009).

    Scale shape: each branch ends in TakeOrderedAndProject (per-
    partition heap, depth 20); the rank windows and the full-outer
    fusion join run over two ≤20-row relations — driver-size work no
    matter the corpus. Ranks are assigned on trunc6-quantized scores
    with id tie-breaks, so the fused ordering is engine-exact.
    """
    from speech_data_pipeline_spark.functions import trunc6
    from speech_data_pipeline_spark.operators import similarity as sim
    from speech_data_pipeline_spark.queries.text_q import _query_vec

    e = load_table(spark, sf_dir, "embeddings")
    dense = sim.cosine_topk(e, _query_vec(spark, sf_dir), k=_RRF_DEPTH).select(
        F.col("vec_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), "vec_id"))
        .cast("long")
        .alias("rd"),
    )
    sparse = (
        _hash_embed_scored(spark, sf_dir)
        .orderBy(F.col("cos_sim").desc(), "doc_id")
        .limit(_RRF_DEPTH)
        .select(
            F.col("doc_id").alias("id"),
            F.row_number()
            .over(Window.orderBy(F.col("cos_sim").desc(), "doc_id"))
            .cast("long")
            .alias("rs"),
        )
    )
    one = F.lit(1.0)
    score = F.coalesce(one / (F.lit(_RRF_K) + F.col("rd")), F.lit(0.0)) + (
        F.coalesce(one / (F.lit(_RRF_K) + F.col("rs")), F.lit(0.0))
    )
    return (
        dense.join(sparse, "id", "full_outer")
        .select(
            "id",
            F.col("rd").alias("dense_rank"),
            F.col("rs").alias("sparse_rank"),
            trunc6(score).alias("rrf_score"),
            score.alias("_s"),
        )
        .orderBy(F.col("_s").desc(), "id")
        .limit(10)
        .drop("_s")
    )


#: Keyword-retrieval query terms (words present in the synthetic
#: corpus vocabulary) and AND-ish threshold.
_BOOL_TERMS = ("fast", "hash", "join", "sorted")
_BOOL_MIN_MATCH = 3


@query(
    "search_boolean_retrieval",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '([a-z]+)', 1) AS w
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(list_filter(list_distinct(w),
                 x -> list_contains({list(_BOOL_TERMS)}, x))) AS match_cnt,
             len(list_filter(w,
                 x -> list_contains({list(_BOOL_TERMS)}, x))) AS tf
      FROM t
    )
    SELECT doc_id, CAST(match_cnt AS BIGINT) AS match_cnt,
           CAST(tf AS BIGINT) AS tf
    FROM m
    WHERE match_cnt >= {_BOOL_MIN_MATCH}
    ORDER BY match_cnt DESC, tf DESC, doc_id
    LIMIT 20
    """,
)
def search_boolean_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword retrieval: documents matching ≥3 of the 4 query terms,
    ranked by distinct-term coverage then total term frequency.

    ZERO-shuffle scoring — coverage and tf are in-row array folds over
    the tokenized document (the query is a literal array baked into the
    plan, the moral equivalent of an inverted-index AND with a
    broadcast posting filter); top-20 is TakeOrderedAndProject.
    """
    terms = F.array(*[F.lit(t) for t in _BOOL_TERMS])
    d = load_table(spark, sf_dir, "documents")
    w = F.expr(r"regexp_extract_all(lower(text), '([a-z]+)', 1)")
    m = d.select(
        "doc_id",
        F.size(
            F.filter(
                F.array_distinct(w), lambda x: F.array_contains(terms, x)
            )
        )
        .cast("long")
        .alias("match_cnt"),
        F.size(F.filter(w, lambda x: F.array_contains(terms, x)))
        .cast("long")
        .alias("tf"),
    )
    return (
        m.where(F.col("match_cnt") >= _BOOL_MIN_MATCH)
        .orderBy(
            F.col("match_cnt").desc(), F.col("tf").desc(), "doc_id"
        )
        .limit(20)
    )


#: PMI collocations: minimum pair occurrences and output size.
_PMI_MIN_PAIR = 5
_PMI_K = 20


@query(
    "text_pmi_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '([a-z]+)', 1) AS w
      FROM documents
    ),
    words AS (SELECT unnest(w) AS x FROM toks),
    uni AS (SELECT x, count(*) AS cx FROM words GROUP BY x),
    u AS (SELECT CAST(count(*) AS BIGINT) AS n_words FROM words),
    adj AS (
      SELECT w[CAST(i AS INTEGER)] AS l, w[CAST(i AS INTEGER) + 1] AS r
      FROM (SELECT w, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
            FROM toks)
    ),
    pairs AS (
      SELECT l, r, count(*) AS cxy FROM adj GROUP BY l, r
    ),
    tp AS (SELECT CAST(sum(cxy) AS BIGINT) AS n_pairs FROM pairs),
    scored AS (
      SELECT p.l, p.r, p.cxy,
             floor(ln((CAST(p.cxy AS DOUBLE) * n_words * n_words)
                      / (CAST(cl.cx AS DOUBLE) * cr.cx * n_pairs))
                   * 1000000.0) / 1000000.0 AS pmi
      FROM pairs p
      JOIN uni cl ON cl.x = p.l
      JOIN uni cr ON cr.x = p.r
      CROSS JOIN u CROSS JOIN tp
      WHERE p.cxy >= {_PMI_MIN_PAIR}
    )
    SELECT l, r, cxy, pmi FROM scored
    ORDER BY pmi DESC, l, r
    LIMIT {_PMI_K}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top-20 adjacent word pairs by pointwise
    mutual information ``ln(P(x,y) / (P(x)·P(y)))`` — the classic
    statistically-bound-phrase miner (complementary to TextRank's
    centrality keywords).

    Shape: one bigram explode → pair counts; unigram counts join back
    on the word key; the two corpus totals are 1-row broadcasts; PMI
    is one IEEE ln over exact integer counts, ranked truncated with
    lexicographic tie-breaks; top-20 is TakeOrderedAndProject.
    """
    from speech_data_pipeline_spark.functions import trunc6

    d = load_table(spark, sf_dir, "documents")
    w = F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
    toks = d.select(w.alias("w"))
    words = toks.select(F.explode("w").alias("x"))
    uni = words.groupBy("x").agg(F.count(F.lit(1)).alias("cx"))
    u = words.agg(F.count(F.lit(1)).alias("n_words"))
    n = F.greatest(F.size("w") - 1, F.lit(0))
    adj = toks.select(
        F.explode(
            F.zip_with(
                F.slice("w", 1, n),
                F.slice("w", 2, n),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("p")
    ).select("p.l", "p.r")
    pairs = (
        adj.groupBy("l", "r")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .where(F.col("cxy") >= _PMI_MIN_PAIR)
    )
    # total adjacency count = Σ max(len(w)-1, 0) — in-row, no second
    # pass over the exploded pair stream
    tp = toks.agg(
        F.sum(F.greatest(F.size("w") - 1, F.lit(0))).cast("long").alias("n_pairs")
    )
    scored = (
        pairs.join(uni.select(F.col("x").alias("l"), F.col("cx").alias("cl")), "l")
        .join(uni.select(F.col("x").alias("r"), F.col("cx").alias("cr")), "r")
        .crossJoin(F.broadcast(u))
        .crossJoin(F.broadcast(tp))
        .select(
            "l",
            "r",
            "cxy",
            trunc6(
                F.log(
                    (F.col("cxy").cast("double") * F.col("n_words") * F.col("n_words"))
                    / (F.col("cl").cast("double") * F.col("cr") * F.col("n_pairs"))
                )
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "l", "r").limit(_PMI_K)


@query(
    "search_phrase_positions",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '([a-z]+)', 1) AS w
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i + 1])) AS b
      FROM t WHERE len(w) >= 2
    ), top AS (
      SELECT b AS phrase,
             split_part(b, ' ', 1) AS w1,
             split_part(b, ' ', 2) AS w2
      FROM (SELECT b, count(*) AS c FROM bg GROUP BY b
            ORDER BY c DESC, b LIMIT 1)
    ), post AS (
      SELECT doc_id, w[i] AS word, i AS pos
      FROM t, unnest(range(1, len(w) + 1)) AS u(i)
    ), occ AS (
      SELECT p1.doc_id, count(*) AS n_occ
      FROM post p1
      JOIN top ON p1.word = top.w1
      JOIN post p2 ON p2.doc_id = p1.doc_id
                  AND p2.pos = p1.pos + 1 AND p2.word = top.w2
      GROUP BY p1.doc_id
    )
    SELECT o.doc_id, top.phrase, CAST(o.n_occ AS BIGINT) AS n_occ
    FROM occ o CROSS JOIN top
    ORDER BY n_occ DESC, doc_id
    LIMIT 20
    """,
)
def search_phrase_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PHRASE search over a positional inverted index — the
    retrieval primitive boolean term matching can't express: find the
    documents containing the corpus' most frequent word bigram as an
    adjacent pair, ranked by occurrence count.

    Plan shape: the query phrase is discovered from an IN-ROW bigram
    stream (transform over offsets — no position shuffle) collapsed by
    one grouped count + TakeOrderedAndProject top-1; the match phase
    is the real positional-index shape — posting lists (doc, word,
    pos) filtered to the two phrase words (filter pushes into the
    scan-side explode, so only matching postings shuffle), then
    PRE-AGGREGATED to one positions-array row per (doc, word) BEFORE
    the adjacency step (the round-7 rework: the row-per-position
    adjacency self-join re-shuffled every posting row and paired
    per-position; since the top bigram is built from the corpus' most
    frequent words, its postings are a large corpus fraction and that
    join was the measured superlinear term at sf10). Now each side
    collapses to ≤1 row per document and adjacency is an in-row
    ``array_intersect(transform(pp1, p → p+1), pp2)`` — positions are
    distinct within a document, so the set intersection counts
    adjacent occurrences exactly, including the w1 = w2 repeated-word
    phrase case. Per-doc position arrays obey the same row-width
    contract as the text column they came from. At 100 TB: one
    filtered-postings shuffle per side keyed by doc_id, a 1-row/doc
    hash join, zero positional fan-out. The 1-row phrase scalar rides
    a broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.expr(
            "regexp_extract_all(lower(text), '([a-z]+)', 1)"
        ).alias("w"),
    )
    bg = t.where(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("w"), i),
                    F.element_at(F.col("w"), i + 1),
                ),
            )
        ).alias("b"),
    )
    top = (
        bg.groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "b")
        .limit(1)
        .select(
            F.col("b").alias("phrase"),
            F.split("b", " ").getItem(0).alias("w1"),
            F.split("b", " ").getItem(1).alias("w2"),
        )
    )
    post = t.select(
        "doc_id",
        F.posexplode("w").alias("pos0", "word"),
    ).select("doc_id", "word", (F.col("pos0") + 1).alias("pos"))
    # BOTH posting sides pre-filter to their phrase word via the 1-row
    # broadcast BEFORE any exchange, then collapse to ONE
    # positions-array row per document — the adjacency join is
    # 1-row/doc vs 1-row/doc, never row-per-position.
    p1 = (
        post.join(F.broadcast(top), post["word"] == F.col("w1"))
        .groupBy("doc_id", "phrase")
        .agg(F.collect_list("pos").alias("pp1"))
    )
    p2 = (
        post.join(
            F.broadcast(top.select(F.col("w2").alias("w2k"))),
            post["word"] == F.col("w2k"),
        )
        .groupBy(F.col("doc_id").alias("doc_id2"))
        .agg(F.collect_list("pos").alias("pp2"))
    )
    occ = (
        p1.join(p2, F.col("doc_id2") == F.col("doc_id"))
        .select(
            "doc_id",
            "phrase",
            F.size(
                F.array_intersect(
                    F.transform(F.col("pp1"), lambda p: p + 1),
                    F.col("pp2"),
                )
            )
            .cast("long")
            .alias("n_occ"),
        )
        .where(F.col("n_occ") > 0)
    )
    return occ.orderBy(F.col("n_occ").desc(), "doc_id").limit(20)


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

#: BM25 query terms (corpus-vocabulary words with distinct document
#: frequencies) and standard Robertson parameters.
_BM25_TERMS = ("hash", "window", "spark")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10


def _bm25_oracle() -> str:
    tfs = ", ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    dfs = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    avgdl = "(CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    parts = []
    for i in range(len(_BM25_TERMS)):
        idf = (
            f"ln((CAST(n_docs - df{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df{i} AS DOUBLE) + 0.5) + 1.0)"
        )
        norm = (
            f"(CAST(tf{i} AS DOUBLE) * ({_BM25_K1} + 1.0))"
            f" / (CAST(tf{i} AS DOUBLE) + {_BM25_K1}"
            f" * (1.0 - {_BM25_B} + {_BM25_B}"
            f" * (CAST(dl AS DOUBLE) / {avgdl})))"
        )
        parts.append(
            f"(CASE WHEN tf{i} > 0 THEN {idf} * {norm} ELSE 0.0 END)"
        )
    score = " + ".join(parts)
    tf_out = ", ".join(
        f"CAST(tf{i} AS BIGINT) AS tf{i}" for i in range(len(_BM25_TERMS))
    )
    return f"""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '([a-z]+)', 1) AS w
      FROM documents
    ), per AS (
      SELECT doc_id, len(w) AS dl, {tfs} FROM t
    ), scal AS (
      SELECT count(*) AS n_docs, sum(dl) AS total_dl, {dfs} FROM per
    )
    SELECT doc_id, CAST(dl AS BIGINT) AS dl, {tf_out},
           floor(raw_score * 1000000.0) / 1000000.0 AS score
    FROM (
      SELECT per.*, {score} AS raw_score FROM per CROSS JOIN scal
    ) WHERE raw_score > 0.0
    ORDER BY raw_score DESC, doc_id
    LIMIT {_BM25_TOPK}
    """


@query("search_bm25_topk", oracle=_bm25_oracle())
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked retrieval for a literal query over the corpus —
    the idf/length-normalized upgrade of search_boolean_retrieval
    (Robertson k1=1.2, b=0.75, Lucene's +1 idf floor so scores stay
    positive at any document frequency).

    ZERO-shuffle scoring: per-term tf and dl are in-row array folds
    over the tokenized document (the query is baked into the plan —
    the broadcast-postings shape of a distributed inverted index); the
    corpus statistics (N, Σdl, per-term df) are ONE 1-row aggregate
    attached back by broadcast; top-10 is TakeOrderedAndProject
    (per-partition heap, never a global sort). Parity: the score is a
    single literal expression tree — identical IEEE op sequence on
    both engines (the text_tfidf_topk ln contract) — ranked on raw
    doubles, truncated only on output.
    """
    d = load_table(spark, sf_dir, "documents")
    w = F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)

    def term_eq(term):
        # NB: must stay single-parameter — a second (defaulted) lambda
        # param makes PySpark bind the ARRAY INDEX to it.
        return lambda x: x == F.lit(term)

    per = d.select(
        "doc_id",
        F.size(w).alias("dl"),
        *[
            F.size(F.filter(w, term_eq(t))).alias(f"tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    scal = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(
                f"df{i}"
            )
            for i in range(len(_BM25_TERMS))
        ],
    )
    j = per.crossJoin(F.broadcast(scal))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    score = None
    for i in range(len(_BM25_TERMS)):
        tf = F.col(f"tf{i}")
        dfc = F.col(f"df{i}")
        idf = F.log(
            ((F.col("n_docs") - dfc).cast("double") + F.lit(0.5))
            / (dfc.cast("double") + F.lit(0.5))
            + F.lit(1.0)
        )
        norm = (tf.cast("double") * (F.lit(_BM25_K1) + F.lit(1.0))) / (
            tf.cast("double")
            + F.lit(_BM25_K1)
            * (
                F.lit(1.0)
                - F.lit(_BM25_B)
                + F.lit(_BM25_B) * (F.col("dl").cast("double") / avgdl)
            )
        )
        part = F.when(tf > 0, idf * norm).otherwise(F.lit(0.0))
        score = part if score is None else score + part
    ranked = (
        j.withColumn("_score", score)
        .where(F.col("_score") > 0.0)
        .orderBy(F.col("_score").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )
    return ranked.select(
        "doc_id",
        F.col("dl").cast("long").alias("dl"),
        *[
            F.col(f"tf{i}").cast("long").alias(f"tf{i}")
            for i in range(len(_BM25_TERMS))
        ],
        trunc6(F.col("_score")).alias("score"),
    )


# ---------------------------------------------------------------------------
# Zipf-law fit over the corpus vocabulary
# ---------------------------------------------------------------------------

#: Zipf fit depth: the head of the frequency-ranked vocabulary.
_ZIPF_TOP = 100


@query(
    "text_zipf_slope",
    oracle=f"""
    WITH tf AS (
      SELECT term, count(*) AS c FROM (
        SELECT unnest(regexp_extract_all(lower(text), '([a-z]+)', 1))
          AS term
        FROM documents
      ) GROUP BY term
    ), top AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r
      FROM (SELECT term, c FROM tf ORDER BY c DESC, term LIMIT {_ZIPF_TOP})
    ), q AS (
      SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS x,
             CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT)
               AS y
      FROM top
    ), s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(y * y) AS HUGEINT) AS syy
      FROM q
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           floor(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS slope,
           floor((CAST(n * sxy - sx * sy AS DOUBLE)
                  * CAST(n * sxy - sx * sy AS DOUBLE))
                 / (CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS r2
    FROM s
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary head: OLS slope of
    ln(frequency) on ln(rank) for the top-100 terms, with r² — the
    corpus-health diagnostic (natural text sits near slope −1;
    synthetic/templated corpora flatten) a curation pipeline tracks
    per source and per snapshot.

    Plan shape: one (term) grouped count; the head is
    TakeOrderedAndProject (per-partition heap — the vocabulary is
    never globally sorted); ranks come from a row_number over the
    LIMIT-100 relation (bounded input, whitelisted). The regression
    is the registry's integer-moment contract: ln values quantized to
    ppm BEFORE the moment sums (float Σ over rows would be
    fold-order-dependent), slope/r² formed from exact integer moments
    with one divide each.
    """
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("([a-z]+)"), 1
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = tf.orderBy(F.col("c").desc(), "term").limit(_ZIPF_TOP)
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("c").desc(), "term"))
    )
    q = ranked.select(
        F.floor(F.log(F.col("r").cast("double")) * F.lit(1000000.0))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("c").cast("double")) * F.lit(1000000.0))
        .cast("long")
        .alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = q.agg(
        dec(F.count(F.lit(1))).alias("n"),
        dec(F.sum("x")).alias("sx"),
        dec(F.sum("y")).alias("sy"),
        dec(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
        dec(F.sum(F.col("x") * F.col("x"))).alias("sxx"),
        dec(F.sum(F.col("y") * F.col("y"))).alias("syy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        trunc6(cov / vx).alias("slope"),
        trunc6((cov * cov) / (vx * vy)).alias("r2"),
    )


#: Fuzzy-vocab bounds: word length window and minimum corpus frequency
#: for the symmetric-delete neighborhood (keeps deletion buckets and
#: the candidate join bounded, and drops hapax noise).
_FUZZ_MIN_LEN = 4
_FUZZ_MAX_LEN = 12
_FUZZ_MIN_FREQ = 2

_FUZZ_TOKS_SQL = r"""
    toks AS (
      SELECT list_filter(string_split_regex(trim(text),
                         '[ \t\n\r\f\x0b]+'), t -> t <> '') AS t
      FROM documents
    ), vocab AS (
      SELECT tok AS w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(t) AS tok FROM toks)
      GROUP BY tok
      HAVING count(*) >= {minf}
         AND len(tok) BETWEEN {minl} AND {maxl}
    ), dels AS (
      SELECT w, freq, CAST(i AS INTEGER) AS idx,
             substr(w, 1, CAST(i AS INTEGER) - 1)
               || substr(w, CAST(i AS INTEGER) + 1) AS key
      FROM (SELECT w, freq, unnest(range(1, len(w) + 1)) AS i FROM vocab)
    )
""".format(minf=_FUZZ_MIN_FREQ, minl=_FUZZ_MIN_LEN, maxl=_FUZZ_MAX_LEN)


@query(
    "search_fuzzy_symdelete",
    oracle=f"""
    WITH {_FUZZ_TOKS_SQL},
    subs AS (
      SELECT a.w AS w1, b.w AS w2, 'sub' AS kind,
             a.freq AS freq1, b.freq AS freq2
      FROM dels a JOIN dels b
        ON a.key = b.key AND a.idx = b.idx AND a.w < b.w
    ), insdel AS (
      SELECT DISTINCT least(v.w, d.w) AS w1, greatest(v.w, d.w) AS w2,
             'ins' AS kind,
             CASE WHEN v.w < d.w THEN v.freq ELSE d.freq END AS freq1,
             CASE WHEN v.w < d.w THEN d.freq ELSE v.freq END AS freq2
      FROM vocab v JOIN dels d ON v.w = d.key AND v.w <> d.w
    )
    SELECT * FROM subs UNION ALL SELECT * FROM insdel
    """,
)
def search_fuzzy_symdelete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 spelling-variant pairs over the corpus
    vocabulary via SYMMETRIC DELETION blocking (the SymSpell method):
    a substitution pair collides on the same-index single-deletion
    key; an insertion/deletion pair collides full-word-to-deletion.
    No pairwise vocabulary scan ever happens — candidates only meet
    inside a deletion bucket.

    Plan shape: one token count builds the vocabulary (bounded, Zipf);
    the neighborhood explode is ≤ word-length per word; both pair
    generators are EQUI-joins on the deletion string (+ index), so
    work is Σ bucket² over deletion buckets — bounded by the length
    window and min-frequency floor, never |vocab|². Output is exact
    distance-1 pairs (same-index del⇒substitution; full=del⇒ins/del),
    deduplicated.
    """
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(tx.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .where(
            (F.col("freq") >= _FUZZ_MIN_FREQ)
            & F.length("w").between(_FUZZ_MIN_LEN, _FUZZ_MAX_LEN)
        )
    )
    dels = vocab.select(
        "w",
        "freq",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(w)), i ->"
                " concat(substring(w, 1, i - 1),"
                " substring(w, i + 1, length(w))))"
            )
        ).alias("pos0", "key"),
    ).select(
        "w", "freq", (F.col("pos0") + 1).cast("int").alias("idx"), "key"
    )
    a = dels.select(
        F.col("key"), F.col("idx"),
        F.col("w").alias("wa"), F.col("freq").alias("fa"),
    )
    b = dels.select(
        F.col("key"), F.col("idx"),
        F.col("w").alias("wb"), F.col("freq").alias("fb"),
    )
    subs = (
        a.join(b, ["key", "idx"])
        .where(F.col("wa") < F.col("wb"))
        .select(
            F.col("wa").alias("w1"), F.col("wb").alias("w2"),
            F.lit("sub").alias("kind"),
            F.col("fa").alias("freq1"), F.col("fb").alias("freq2"),
        )
    )
    v = vocab.select(F.col("w").alias("vw"), F.col("freq").alias("vf"))
    insdel = (
        v.join(dels, v["vw"] == dels["key"])
        .where(F.col("vw") != F.col("w"))
        .select(
            F.least("vw", "w").alias("w1"),
            F.greatest("vw", "w").alias("w2"),
            F.lit("ins").alias("kind"),
            F.when(F.col("vw") < F.col("w"), F.col("vf"))
            .otherwise(F.col("freq"))
            .alias("freq1"),
            F.when(F.col("vw") < F.col("w"), F.col("freq"))
            .otherwise(F.col("vf"))
            .alias("freq2"),
        )
        .distinct()
    )
    return subs.unionByName(insdel)


# ---------------------------------------------------------------------------
# Query-likelihood retrieval (Dirichlet smoothing) — round 8
# ---------------------------------------------------------------------------

#: Same query terms as BM25 so the two ranked lists are comparable;
#: μ = 2000 is the standard Dirichlet prior (Zhai & Lafferty 2001).
_QL_TERMS = ("hash", "window", "spark")
_QL_MU = 2000.0
_QL_TOPK = 10


def _ql_oracle() -> str:
    tfs = ", ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_QL_TERMS)
    )
    cfs = ", ".join(f"sum(tf{i}) AS cf{i}" for i in range(len(_QL_TERMS)))
    parts = []
    for i in range(len(_QL_TERMS)):
        pc = f"(CAST(cf{i} AS DOUBLE) / CAST(total_dl AS DOUBLE))"
        parts.append(
            f"ln((CAST(tf{i} AS DOUBLE) + {_QL_MU!r} * {pc})"
            f" / (CAST(dl AS DOUBLE) + {_QL_MU!r}))"
        )
    score = " + ".join(parts)
    any_tf = " + ".join(f"tf{i}" for i in range(len(_QL_TERMS)))
    tf_out = ", ".join(
        f"CAST(tf{i} AS BIGINT) AS tf{i}" for i in range(len(_QL_TERMS))
    )
    return f"""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '([a-z]+)', 1) AS w
      FROM documents
    ), per AS (
      SELECT doc_id, len(w) AS dl, {tfs} FROM t
    ), scal AS (
      SELECT sum(dl) AS total_dl, {cfs} FROM per
    )
    SELECT doc_id, CAST(dl AS BIGINT) AS dl, {tf_out},
           floor(score * 1000000.0) / 1000000.0 AS score
    FROM (
      SELECT per.*, {score} AS score FROM per CROSS JOIN scal
      WHERE {any_tf} > 0
    )
    ORDER BY score DESC, doc_id
    LIMIT {_QL_TOPK}
    """


@query("search_query_likelihood", oracle=_ql_oracle())
def search_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood ranked retrieval with Dirichlet smoothing
    (Zhai–Lafferty μ=2000) for the same literal query as
    ``search_bm25_topk`` — the language-modeling retrieval family
    beside the probabilistic-relevance one, so a corpus owner can
    compare the two rankings (and feed both to ``sim_rrf_fusion``).
    ``score(d) = Σ_t ln((tf_t + μ·cf_t/|C|) / (dl + μ))`` over docs
    matching ≥1 term.

    ZERO-shuffle scoring, the BM25 contract: per-term tf and dl are
    in-row array folds; collection statistics (Σdl, per-term cf) are
    ONE 1-row aggregate broadcast back; the score is a single literal
    expression tree (identical IEEE op sequence on both engines),
    ranked on raw doubles, truncated on output; top-10 is
    TakeOrderedAndProject.
    """
    d = load_table(spark, sf_dir, "documents")
    w = F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)

    def term_eq(term):
        # single-parameter lambda: see search_bm25_topk note
        return lambda x: x == F.lit(term)

    per = d.select(
        "doc_id",
        F.size(w).alias("dl"),
        *[
            F.size(F.filter(w, term_eq(t))).alias(f"tf{i}")
            for i, t in enumerate(_QL_TERMS)
        ],
    )
    scal = per.agg(
        F.sum("dl").alias("total_dl"),
        *[F.sum(f"tf{i}").alias(f"cf{i}") for i in range(len(_QL_TERMS))],
    )
    j = per.crossJoin(F.broadcast(scal))
    score = None
    for i in range(len(_QL_TERMS)):
        tf = F.col(f"tf{i}").cast("double")
        pc = F.col(f"cf{i}").cast("double") / F.col("total_dl").cast(
            "double"
        )
        part = F.log(
            (tf + F.lit(_QL_MU) * pc)
            / (F.col("dl").cast("double") + F.lit(_QL_MU))
        )
        score = part if score is None else score + part
    any_tf = None
    for i in range(len(_QL_TERMS)):
        c = F.col(f"tf{i}")
        any_tf = c if any_tf is None else any_tf + c
    ranked = (
        j.where(any_tf > 0)
        .withColumn("_score", score)
        .orderBy(F.col("_score").desc(), "doc_id")
        .limit(_QL_TOPK)
    )
    return ranked.select(
        "doc_id",
        F.col("dl").cast("long").alias("dl"),
        *[
            F.col(f"tf{i}").cast("long").alias(f"tf{i}")
            for i in range(len(_QL_TERMS))
        ],
        trunc6(F.col("_score")).alias("score"),
    )


# ---------------------------------------------------------------------------
# pass@k estimator — round 8
# ---------------------------------------------------------------------------

#: pass@k geometry: problems = users, trials = events, success =
#: 'purchase'; the unbiased estimator needs n ≥ k trials per problem.
_PASSK_K = 5


@query(
    "eval_pass_at_k",
    oracle=f"""
    WITH per AS (
      SELECT user_id, count(*) AS n,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
      FROM events GROUP BY user_id
    ), ok AS (
      SELECT n, c FROM per WHERE n >= {_PASSK_K}
    ), est AS (
      SELECT CAST(floor((CASE WHEN n - c < {_PASSK_K} THEN 1.0
               ELSE 1.0 - (
                 {" * ".join(
                     f"(CAST(n - c - {i} AS DOUBLE) / CAST(n - {i} AS DOUBLE))"
                     for i in range(_PASSK_K)
                 )}
               ) END) * 1000000000000.0) AS BIGINT) AS p_pico
      FROM ok
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM ok) AS n_problems,
           CAST({_PASSK_K} AS BIGINT) AS k,
           floor(CAST(sum(p_pico) AS DOUBLE) / 1000000000000.0
                 / (SELECT count(*) FROM ok)
                 * 1000000.0) / 1000000.0 AS pass_at_k
    FROM est
    """,
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pass@k estimator (Chen et al. 2021, HumanEval): for each
    problem with n trials and c successes, the unbiased probability
    that at least one of k sampled trials succeeds — ``1 −
    C(n−c,k)/C(n,k)`` computed as the stable telescoped product
    ``1 − Π over i<k of (n−c−i)/(n−i)`` — averaged over problems with
    n ≥ k. The standard generation-eval aggregate an LLM pipeline
    reports beside MRR/NDCG's retrieval view; here problems = users,
    trials = events, success = 'purchase' on the synthetic corpus.

    Exactness: (n, c) are exact integer counts; the per-problem
    estimator is ONE fixed-k float expression (k literal factors —
    identical IEEE sequence on both engines), pico-quantized per
    problem so the cross-problem mean is an integer sum divided once.

    Plan shape at 100 TB: one user-grouped count (map-side partial),
    one filtered 1-row aggregate — no windows, no joins, no second
    corpus pass.
    """
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("c"),
    )
    ok = per.where(F.col("n") >= _PASSK_K)
    prod = None
    for i in range(_PASSK_K):
        f = (F.col("n") - F.col("c") - F.lit(i)).cast("double") / (
            F.col("n") - F.lit(i)
        ).cast("double")
        prod = f if prod is None else prod * f
    p = F.when(
        (F.col("n") - F.col("c")) < _PASSK_K, F.lit(1.0)
    ).otherwise(F.lit(1.0) - prod)
    est = ok.select(
        F.floor(p * F.lit(1e12)).cast("long").alias("p_pico")
    )
    return est.agg(
        F.count(F.lit(1)).cast("long").alias("n_problems"),
        F.lit(_PASSK_K).cast("long").alias("k"),
        trunc6(
            F.sum("p_pico").cast("double")
            / F.lit(1e12)
            / F.count(F.lit(1)).cast("double")
        ).alias("pass_at_k"),
    )


# ---------------------------------------------------------------------------
# corpus-level BLEU-2 between corpus halves — round 8
# ---------------------------------------------------------------------------


@query(
    "eval_corpus_bleu2",
    oracle="""
    WITH toks AS (
      SELECT doc_id % 2 AS half,
             regexp_extract_all(lower(text), '[a-z]+') AS t
      FROM documents
    ), uni AS (
      SELECT half, unnest(t) AS g FROM toks
    ), bi AS (
      SELECT half, unnest(list_transform(
               range(1, greatest(len(t) - 1, 0) + 1),
               i -> t[i] || ' ' || t[i+1])) AS g
      FROM toks
    ), uc AS (
      SELECT g,
             sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
      FROM uni GROUP BY g
    ), bc AS (
      SELECT g,
             sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
      FROM bi GROUP BY g
    ), m AS (
      SELECT
        (SELECT CAST(sum(ca) AS BIGINT) FROM uc) AS len_a,
        (SELECT CAST(sum(cb) AS BIGINT) FROM uc) AS len_b,
        (SELECT CAST(sum(least(ca, cb)) AS BIGINT) FROM uc) AS hit1,
        (SELECT CAST(sum(ca) AS BIGINT) FROM bc) AS n2_a,
        (SELECT CAST(sum(least(ca, cb)) AS BIGINT) FROM bc) AS hit2
    )
    SELECT len_a, len_b,
           floor(CAST(hit1 AS DOUBLE) / len_a * 1000000.0) / 1000000.0
             AS p1,
           floor(CAST(hit2 AS DOUBLE) / n2_a * 1000000.0) / 1000000.0
             AS p2,
           floor((CASE WHEN len_a >= len_b THEN 1.0
                       ELSE exp(1.0 - CAST(len_b AS DOUBLE) / len_a) END)
                 * sqrt((CAST(hit1 AS DOUBLE) / len_a)
                        * (CAST(hit2 AS DOUBLE) / n2_a))
                 * 1000000.0) / 1000000.0 AS bleu2
    FROM m
    """,
)
def eval_corpus_bleu2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-2 of the even-doc_id half against the odd
    half: clipped unigram/bigram precision (candidate n-gram counts
    clipped by the reference half's counts) with the brevity penalty,
    geometric-mean combined. The distribution-overlap generation
    metric an LLM pipeline reports beside per-sample evals — between
    two halves of the SAME corpus it reads as a diversity/overlap
    audit (the complement of ``text_js_divergence``'s divergence
    view; near-identical halves → BLEU → 1).

    Exactness: every count is an exact integer from two grouped
    counts (unigram + bigram tables, vocabulary-sized); clipping is
    integer least() per gram summed exactly; p1/p2/BP/BLEU are one
    float assembly on the 1-row result.

    Plan shape at 100 TB: two tokenize-explode grouped counts
    (map-side combinable, vocabulary-sized outputs), five bounded
    scalar aggregates — no joins on corpus rows, no windows.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("([a-z]+)"), 1
        ).alias("t"),
    )
    uni = toks.select("half", F.explode("t").alias("g"))
    # same descending-sequence guard as eval_chrf: a 0/1-token doc
    # must emit NO bigrams, not two null-padded ones
    bi = toks.select(
        "half",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(1, size(t) - 1),"
                " i -> concat(t[i-1], ' ', t[i])) "
                "ELSE array() END"
            )
        ).alias("g"),
    )

    def counts(df):
        return df.groupBy("g").agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cb"),
        )

    uc = counts(uni).agg(
        F.sum("ca").cast("long").alias("len_a"),
        F.sum("cb").cast("long").alias("len_b"),
        F.sum(F.least("ca", "cb")).cast("long").alias("hit1"),
    )
    bc = counts(bi).agg(
        F.sum("ca").cast("long").alias("n2_a"),
        F.sum(F.least("ca", "cb")).cast("long").alias("hit2"),
    )
    j = uc.crossJoin(F.broadcast(bc))
    la = F.col("len_a").cast("double")
    lb = F.col("len_b").cast("double")
    p1 = F.col("hit1").cast("double") / la
    p2 = F.col("hit2").cast("double") / F.col("n2_a").cast("double")
    bp = F.when(F.col("len_a") >= F.col("len_b"), F.lit(1.0)).otherwise(
        F.exp(F.lit(1.0) - lb / la)
    )
    return j.select(
        "len_a",
        "len_b",
        trunc6(p1).alias("p1"),
        trunc6(p2).alias("p2"),
        trunc6(bp * F.sqrt(p1 * p2)).alias("bleu2"),
    )


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance feedback query expansion (round 9)
# ---------------------------------------------------------------------------

#: RM3 parameters: feedback depth (the BM25 top-k), expansion count,
#: and the original-query interpolation weight.
_RM3_FB_DOCS = 10
_RM3_TOPK = 15
_RM3_LAMBDA = 0.5


def _rm3_oracle() -> str:
    # the BM25 scoring CTEs are re-derived from the same constants as
    # _bm25_oracle so the two retrieval rows cannot drift
    tfs = ", ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    dfs = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    avgdl = "(CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    parts = []
    for i in range(len(_BM25_TERMS)):
        idf = (
            f"ln((CAST(n_docs - df{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df{i} AS DOUBLE) + 0.5) + 1.0)"
        )
        norm = (
            f"(CAST(tf{i} AS DOUBLE) * ({_BM25_K1} + 1.0))"
            f" / (CAST(tf{i} AS DOUBLE) + {_BM25_K1}"
            f" * (1.0 - {_BM25_B} + {_BM25_B}"
            f" * (CAST(dl AS DOUBLE) / {avgdl})))"
        )
        parts.append(
            f"(CASE WHEN tf{i} > 0 THEN {idf} * {norm} ELSE 0.0 END)"
        )
    score = " + ".join(parts)
    in_q = " OR ".join(f"term = '{t}'" for t in _BM25_TERMS)
    return f"""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(lower(text), '([a-z]+)', 1) AS w
      FROM documents
    ), per AS (
      SELECT doc_id, len(w) AS dl, {tfs} FROM t
    ), scal AS (
      SELECT count(*) AS n_docs, sum(dl) AS total_dl, {dfs} FROM per
    ), fb AS (
      -- mass-weighting score truncated to the ppm grid exactly as
      -- search_bm25_topk RETURNS it (the Spark side reuses that
      -- query's output), but the feedback set is ORDERED on the RAW
      -- score — the alias would otherwise bind the floored output
      -- column in ORDER BY and flip floored ties at the rank-10 edge
      SELECT doc_id, dl,
             floor(raw_score * 1000000.0) / 1000000.0 AS score
      FROM (
        SELECT per.*, {score} AS raw_score FROM per CROSS JOIN scal
      ) WHERE raw_score > 0.0
      ORDER BY raw_score DESC, doc_id
      LIMIT {_RM3_FB_DOCS}
    ), fbtok AS (
      SELECT fb.doc_id, fb.dl, fb.score,
             unnest(regexp_extract_all(lower(d.text), '([a-z]+)', 1))
               AS term
      FROM fb JOIN documents d USING (doc_id)
    ), tfw AS (
      SELECT term, doc_id, count(*) AS tf, any_value(dl) AS dl,
             any_value(score) AS score
      FROM fbtok GROUP BY term, doc_id
    ), pr AS (
      SELECT term,
             list_reduce(list_prepend(0.0,
               list(score * CAST(tf AS DOUBLE) / CAST(dl AS DOUBLE)
                    ORDER BY doc_id)),
               (a, b) -> a + b) AS mass
      FROM tfw GROUP BY term
    ), tot AS (
      SELECT sum(score) AS fb_mass FROM fb
    )
    SELECT term,
           floor(({_RM3_LAMBDA} * (CASE WHEN {in_q}
                    THEN 1.0 / {len(_BM25_TERMS)} ELSE 0.0 END)
                  + (1.0 - {_RM3_LAMBDA}) * mass / fb_mass)
                 * 1000000.0) / 1000000.0 AS weight,
           CASE WHEN {in_q} THEN 1 ELSE 0 END AS in_query
    FROM pr CROSS JOIN tot
    ORDER BY ({_RM3_LAMBDA} * (CASE WHEN {in_q}
                THEN 1.0 / {len(_BM25_TERMS)} ELSE 0.0 END)
              + (1.0 - {_RM3_LAMBDA}) * mass / fb_mass) DESC, term
    LIMIT {_RM3_TOPK}
    """


@query("search_rm3_expansion", oracle=_rm3_oracle())
def search_rm3_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance-feedback expansion for the shared BM25
    query: retrieve the BM25 top-10 (identical constants and ranking
    convention as ``search_bm25_topk``), build the relevance model
    ``p(w|R) ∝ Σ_{d∈fb} score_d · tf(w,d)/dl_d``, and interpolate with
    the uniform original query at λ = 0.5 — the classic two-stage
    retrieval loop (Lavrenko–Croft relevance models as deployed in
    Indri/Anserini).

    Parity: feedback-doc selection reuses BM25's raw-double ordering
    contract (score DESC, doc_id); per-doc mass terms are summed in a
    DETERMINISTIC doc_id-ordered fold (both engines execute the same
    IEEE addition sequence — the stats_anova_f discipline applied to a
    ≤10-term list); weights truncate only on output.

    Plan shape at 100 TB: ONE corpus pass scores BM25 in-row
    (zero-shuffle; the 1-row stats broadcast), TakeOrdered(10) picks
    the feedback set, and everything after runs on TEN documents —
    the re-tokenize join is a 10-row broadcast against the corpus'
    doc_id (pushed-down point lookups), the relevance model
    aggregates the vocabulary of ten docs. Expansion cost is
    independent of corpus size by construction.
    """
    fb = search_bm25_topk(spark, sf_dir).select(
        "doc_id", "dl", F.col("score").alias("fb_score")
    )
    d = load_table(spark, sf_dir, "documents")
    toks = d.join(F.broadcast(fb), "doc_id").select(
        "doc_id",
        "dl",
        "fb_score",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit("([a-z]+)"), 1
            )
        ).alias("term"),
    )
    tfw = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("dl").alias("dl"),
        F.first("fb_score").alias("fb_score"),
    )
    mass_term = F.col("fb_score") * F.col("tf").cast("double") / F.col(
        "dl"
    ).cast("double")
    pr = tfw.groupBy("term").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("doc_id"), mass_term.alias("mt")))
            ),
            F.lit(0.0),
            lambda a, x: a + x["mt"],
        ).alias("mass")
    )
    tot = fb.agg(F.sum("fb_score").alias("fb_mass"))
    in_q = F.col("term").isin(*_BM25_TERMS)
    weight = F.lit(_RM3_LAMBDA) * F.when(
        in_q, F.lit(1.0 / len(_BM25_TERMS))
    ).otherwise(F.lit(0.0)) + F.lit(1.0 - _RM3_LAMBDA) * F.col(
        "mass"
    ) / F.col("fb_mass")
    return (
        pr.crossJoin(F.broadcast(tot))
        .select(
            "term",
            weight.alias("_w"),
            F.when(in_q, 1).otherwise(0).alias("in_query"),
        )
        .orderBy(F.col("_w").desc(), "term")
        .limit(_RM3_TOPK)
        .select("term", trunc6(F.col("_w")).alias("weight"), "in_query")
    )


# ---------------------------------------------------------------------------
# corpus-level chrF2 between corpus halves (round 9)
# ---------------------------------------------------------------------------

#: chrF character n-gram orders and the recall weight (beta = 2).
_CHRF_ORDERS = (1, 2, 3)
_CHRF_BETA2 = 4.0


def _chrf_oracle() -> str:
    per_n = []
    for n in _CHRF_ORDERS:
        per_n.append(f"""
    g{n} AS (
      SELECT half, unnest(list_transform(
               range(1, greatest(length(s) - {n - 1}, 0) + 1),
               i -> substr(s, CAST(i AS INTEGER), {n}))) AS g
      FROM norm
    ), c{n} AS (
      SELECT
        (SELECT CAST(sum(ca) AS BIGINT) FROM (
           SELECT sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca
           FROM g{n} GROUP BY g)) AS len_a,
        (SELECT CAST(sum(cb) AS BIGINT) FROM (
           SELECT sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
           FROM g{n} GROUP BY g)) AS len_b,
        (SELECT CAST(sum(least(ca, cb)) AS BIGINT) FROM (
           SELECT sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
           FROM g{n} GROUP BY g)) AS hit
    )""")
    ctes = ", ".join(per_n)
    k = len(_CHRF_ORDERS)
    p_terms = " + ".join(
        f"CAST(c{n}.hit AS DOUBLE) / c{n}.len_a" for n in _CHRF_ORDERS
    )
    r_terms = " + ".join(
        f"CAST(c{n}.hit AS DOUBLE) / c{n}.len_b" for n in _CHRF_ORDERS
    )
    froms = " CROSS JOIN ".join(f"c{n}" for n in _CHRF_ORDERS)
    return f"""
    WITH norm AS (
      SELECT doc_id % 2 AS half,
             regexp_replace(lower(text), '[^a-z]', '', 'g') AS s
      FROM documents
    ), {ctes}
    SELECT floor(({p_terms}) / {k}.0 * 1000000.0) / 1000000.0
             AS precision_avg,
           floor(({r_terms}) / {k}.0 * 1000000.0) / 1000000.0
             AS recall_avg,
           floor((1.0 + {_CHRF_BETA2})
                 * (({p_terms}) / {k}.0) * (({r_terms}) / {k}.0)
                 / ({_CHRF_BETA2} * (({p_terms}) / {k}.0)
                    + (({r_terms}) / {k}.0))
                 * 1000000.0) / 1000000.0 AS chrf2
    FROM {froms}
    """


@query("eval_chrf", oracle=_chrf_oracle())
def eval_chrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level chrF2 (Popović 2015) of the even-doc_id half
    against the odd half: clipped CHARACTER n-gram precision and
    recall (n = 1..3 over the letters-only normalized text), averaged
    over orders, combined with β = 2 recall weighting —
    ``(1+β²)PR / (β²P + R)``. The tokenization-free companion of
    ``eval_corpus_bleu2`` (BLEU breaks on morphology-rich text; chrF
    is the standard robust alternative an LLM eval stack reports
    beside it).

    Exactness: all n-gram counts are exact integers from per-order
    grouped counts (clipping is integer ``least`` per gram); P, R and
    chrF2 are one float assembly over exact integer ratios on the
    1-row result.

    Plan shape at 100 TB: one normalize pass feeds three
    explode→grouped-count subtrees (map-side combinable, each output
    bounded by the char n-gram vocabulary, tiny for n ≤ 3); the final
    row is a cross join of three 1-row aggregates — no joins on
    corpus rows, no windows.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.regexp_replace(F.lower(F.col("text")), "[^a-z]", "").alias("s"),
    )
    stats = []
    for n in _CHRF_ORDERS:
        # NB: guard the empty case explicitly — Spark's sequence(1, 0)
        # yields the DESCENDING [1, 0] (default step -1), which would
        # emit two spurious grams for strings shorter than n where the
        # oracle's range(1, ...) emits none.
        grams = norm.select(
            "half",
            F.explode(
                F.expr(
                    f"CASE WHEN length(s) >= {n} THEN "
                    f"transform(sequence(1, length(s) - {n - 1}),"
                    f" i -> substring(s, i, {n})) "
                    f"ELSE array() END"
                )
            ).alias("g"),
        )
        c = (
            grams.groupBy("g")
            .agg(
                F.sum(
                    F.when(F.col("half") == 0, 1).otherwise(0)
                ).alias("ca"),
                F.sum(
                    F.when(F.col("half") == 1, 1).otherwise(0)
                ).alias("cb"),
            )
            .agg(
                F.sum("ca").cast("long").alias(f"len_a{n}"),
                F.sum("cb").cast("long").alias(f"len_b{n}"),
                F.sum(F.least("ca", "cb")).cast("long").alias(f"hit{n}"),
            )
        )
        stats.append(c)
    j = stats[0]
    for c in stats[1:]:
        j = j.crossJoin(F.broadcast(c))
    k = float(len(_CHRF_ORDERS))
    p_avg = sum(
        [
            F.col(f"hit{n}").cast("double") / F.col(f"len_a{n}").cast("double")
            for n in _CHRF_ORDERS
        ],
        F.lit(0.0),
    ) / F.lit(k)
    r_avg = sum(
        [
            F.col(f"hit{n}").cast("double") / F.col(f"len_b{n}").cast("double")
            for n in _CHRF_ORDERS
        ],
        F.lit(0.0),
    ) / F.lit(k)
    chrf = (
        (F.lit(1.0) + F.lit(_CHRF_BETA2))
        * p_avg
        * r_avg
        / (F.lit(_CHRF_BETA2) * p_avg + r_avg)
    )
    return j.select(
        trunc6(p_avg).alias("precision_avg"),
        trunc6(r_avg).alias("recall_avg"),
        trunc6(chrf).alias("chrf2"),
    )


@query(
    "mix_waterfill_budget",
    oracle="""
    WITH dom AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(chars) AS BIGINT) AS total,
             CAST(sum(chars) // 2 AS BIGINT) AS budget,
             CAST(count(*) AS BIGINT) AS d
      FROM dom
    ), idx AS (
      SELECT source, chars,
             row_number() OVER (ORDER BY chars, source) AS i,
             coalesce(sum(chars) OVER (ORDER BY chars, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumb
      FROM dom
    ), lam AS (
      SELECT CAST(budget - cumb AS DOUBLE) / CAST(d - i + 1 AS DOUBLE)
               AS lam
      FROM idx CROSS JOIN tot
      WHERE budget - cumb <= chars * (d - i + 1)
      ORDER BY i LIMIT 1
    )
    SELECT dom.source, dom.chars,
           floor(CASE WHEN lam.lam IS NULL
                        OR CAST(dom.chars AS DOUBLE) <= lam.lam
                      THEN CAST(dom.chars AS DOUBLE) ELSE lam.lam END
                 * 1000000.0) / 1000000.0 AS alloc,
           CASE WHEN lam.lam IS NOT NULL
                 AND CAST(dom.chars AS DOUBLE) > lam.lam
                THEN 1 ELSE 0 END AS capped
    FROM dom LEFT JOIN lam ON true
    ORDER BY dom.source
    """,
)
def mix_waterfill_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation across domains: spend a
    budget of half the corpus (chars stand in for tokens) so every
    domain keeps min(cap λ, its size), with the water level λ chosen
    to exhaust the budget exactly — the max-min-fair split a training
    mix uses to stop head domains from eating the budget while never
    up-sampling tails (the allocation behind "domain-balanced"
    pretraining mixes; companion of ``mix_temperature_domains``, which
    reweights instead of capping).

    λ determination is exact integer arithmetic: sort domains
    ascending, find the first prefix position where the remaining
    budget spread over the remaining domains no longer exceeds the
    next domain size; λ is one integer ratio there.

    Plan shape at 100 TB: one grouped integer aggregate to the domain
    vocabulary, then windows over the tiny domain table — corpus rows
    are touched exactly once.
    """
    d = load_table(spark, sf_dir, "documents")
    dom = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("chars")
    )
    tot = dom.agg(
        F.sum("chars").cast("long").alias("total"),
        F.expr("sum(chars) div 2").cast("long").alias("budget"),
        F.count(F.lit(1)).cast("long").alias("d"),
    )
    w_i = Window.orderBy("chars", "source")
    w_prev = Window.orderBy("chars", "source").rowsBetween(
        Window.unboundedPreceding, -1
    )
    idx = dom.select(
        "source",
        "chars",
        F.row_number().over(w_i).alias("i"),
        F.coalesce(F.sum("chars").over(w_prev), F.lit(0)).alias("cumb"),
    )
    lam = (
        idx.crossJoin(F.broadcast(tot))
        .where(
            F.col("budget") - F.col("cumb")
            <= F.col("chars") * (F.col("d") - F.col("i") + 1)
        )
        .orderBy("i")
        .limit(1)
        .select(
            (
                (F.col("budget") - F.col("cumb")).cast("double")
                / (F.col("d") - F.col("i") + 1).cast("double")
            ).alias("lam")
        )
    )
    charsd = F.col("chars").cast("double")
    return (
        dom.join(F.broadcast(lam), F.lit(True), "left")
        .select(
            "source",
            "chars",
            trunc6(
                F.when(
                    F.col("lam").isNull() | (charsd <= F.col("lam")),
                    charsd,
                ).otherwise(F.col("lam"))
            ).alias("alloc"),
            F.when(
                F.col("lam").isNotNull() & (charsd > F.col("lam")), 1
            )
            .otherwise(0)
            .alias("capped"),
        )
        .orderBy("source")
    )
