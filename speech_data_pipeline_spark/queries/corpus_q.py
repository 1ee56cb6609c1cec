"""Corpus-governance queries: test-set decontamination, PII scrubbing,
deterministic training shuffle/sharding, quantile outlier filtering,
Bloom-filter membership, context-window chunking.

Round-3 widening of the training-data-pipeline surface (see also
queries/curation_q.py). Everything is engine-portable by construction:
seeded md5 hashes for any pseudo-randomness, integer or truncated
IEEE arithmetic, identical regex character classes in Java regex and
RE2. Every query has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speech_data_pipeline_spark.functions import trunc6, trunc6_sql
from speech_data_pipeline_spark.operators import text as tx
from speech_data_pipeline_spark.operators.sketches import (
    BLOOM_K,
    BLOOM_M,
    bloom_build,
    bloom_probe,
)
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.queries.text_q import _hex7_to_int_sql
from speech_data_pipeline_spark.sources.catalog import load_table

#: Decontamination gram width. Production stacks use 8–13-word grams;
#: 4 keeps a meaningful partial-overlap signal on the synthetic
#: small-vocabulary corpus (≈14% of train docs at sf0.01).
_DECON_N = 4

#: Context-window chunking: window / stride in tokens.
_CW_W = 32
_CW_S = 24


def _shard_expr(n_shards: int | None = None) -> "F.Column":
    """Seeded-md5 shard key (shared by shuffle_shard_manifest and the
    governed-mix capstone — ONE definition so the shard convention
    cannot silently fork).

    CONTRACT (requirement, not a note): ``n_shards`` must scale with
    the CLUSTER (≥ executor count), never stay fixed as the corpus
    grows — each shard is sorted by one task, so at a fixed shard
    count the per-shard sort grows linearly with the corpus and the
    manifest's only anti-pattern (shards ≪ executors) appears. The
    permutation SEMANTICS are shard-count-independent (see
    ``shard_permutation``): within-shard order is always the global
    ``(posk, doc_id)`` order restricted to the shard, so re-sharding a
    grown corpus with a bigger count preserves every co-sharded pair's
    relative order (pinned by tests/test_corpus_ops.py)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % (n_shards if n_shards is not None else _SHUF_SHARDS)
    )


def shard_permutation(d: DataFrame, n_shards: int | None = None) -> DataFrame:
    """``(doc_id, n_tokens, shard, pos)`` — the deterministic global
    training shuffle underlying shuffle_shard_manifest, at any shard
    count: shard = seeded-md5 bucket, pos = row_number over a SECOND
    seeded md5 within the shard. Ordering is defined globally by
    ``(posk, doc_id)`` and sharding only partitions it, so the
    permutation is reproducible and shard-count-stable."""
    sharded = d.select(
        "doc_id",
        (F.floor(F.col("n_chars") / F.lit(4.0)).cast("long") + 1).alias("n_tokens"),
        _shard_expr(n_shards).alias("shard"),
        F.md5(F.concat(F.lit("pos:"), F.col("doc_id").cast("string"))).alias("posk"),
    )
    w = Window.partitionBy("shard").orderBy("posk", "doc_id")
    return sharded.withColumn("pos", F.row_number().over(w))


def _bucket(col_sql: str = "doc_id") -> F.Column:
    """The md5 percent bucket shared with split_hash_buckets."""
    return (
        F.conv(F.substring(F.md5(F.col(col_sql).cast("string")), 1, 7), 16, 10)
        .cast("long")
        % 100
    )


_BUCKET_SQL = _hex7_to_int_sql("md5(CAST(doc_id AS VARCHAR))") + " % 100"


@query(
    "decon_ngram_overlap",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, {_BUCKET_SQL} AS bucket FROM documents
    ), toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '([a-z]+)', 1) AS t
      FROM documents
    ), dg AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(t) - {_DECON_N - 1}, 0) + 1),
                 i -> array_to_string(
                        list_slice(t, CAST(i AS INTEGER),
                                   CAST(i AS INTEGER) + {_DECON_N - 1}), ' ')))
                 AS gram
        FROM toks
      )
    ), train AS (
      SELECT doc_id FROM b WHERE bucket < 80
    ), bench AS (
      SELECT DISTINCT gram FROM dg
      JOIN (SELECT doc_id FROM b WHERE bucket >= 90) USING (doc_id)
    ), tg AS (
      SELECT dg.doc_id, dg.gram FROM dg JOIN train USING (doc_id)
    ), per AS (
      SELECT doc_id, count(*) AS n_grams FROM tg GROUP BY doc_id
    ), hits AS (
      SELECT doc_id, count(*) AS n_hits FROM tg
      WHERE gram IN (SELECT gram FROM bench) GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(p.n_grams, 0) AS n_grams,
           coalesce(h.n_hits, 0) AS n_hits,
           coalesce(h.n_hits, 0) > 0 AS contaminated
    FROM train t
    LEFT JOIN per p USING (doc_id)
    LEFT JOIN hits h USING (doc_id)
    """,
)
def decon_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-training decontamination: flag train-split documents sharing
    any word 4-gram with the held-out test split (the leakage
    check every LLM data pipeline runs before training). The benchmark
    gram set is broadcast; the corpus is never shuffled at gram width
    (operators/text.py `ngram_contamination`)."""
    d = load_table(spark, sf_dir, "documents")
    b = d.withColumn("bucket", _bucket())
    train = b.where(F.col("bucket") < 80).select("doc_id", "text")
    bench = b.where(F.col("bucket") >= 90).select("doc_id", "text")
    return tx.ngram_contamination(train, bench, n=_DECON_N)


@query(
    "pii_redact",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com ip 10.0.'
                  || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                  || ' tel 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                  || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t2
      FROM documents
    )
    SELECT doc_id,
      len(regexp_extract_all(t2, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}'))
        AS n_email,
      len(regexp_extract_all(regexp_replace(t2,
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
            '\b\d{1,3}(\.\d{1,3}){3}\b')) AS n_ip,
      len(regexp_extract_all(regexp_replace(regexp_replace(t2,
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
            '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
            '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
      md5(regexp_replace(regexp_replace(regexp_replace(t2,
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
            '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
            '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS redacted_md5,
      length(regexp_replace(regexp_replace(regexp_replace(t2,
            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
            '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
            '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g')) AS redacted_len
    FROM aug
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails / IPv4s / phone numbers → typed redaction
    tokens) with per-document match counts. The corpus carries no PII,
    so both engines first append a deterministic synthetic PII suffix
    per document — the redaction operator itself
    (operators/text.py `redact_pii`) is what's under test. Map-only,
    zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" tel 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t2"),
    )
    return tx.redact_pii(aug, text_col="t2").select(
        "doc_id",
        "n_email",
        "n_ip",
        "n_phone",
        F.md5("redacted").alias("redacted_md5"),
        F.length("redacted").alias("redacted_len"),
    )


#: Training-shuffle shard count.
_SHUF_SHARDS = 8

_SHARD_SQL = (
    _hex7_to_int_sql("md5('shard:' || CAST(doc_id AS VARCHAR))")
    + f" % {_SHUF_SHARDS}"
)


@query(
    "shuffle_shard_manifest",
    oracle=f"""
    WITH sharded AS (
      SELECT doc_id,
             CAST(floor(n_chars / 4.0) AS BIGINT) + 1 AS n_tokens,
             {_SHARD_SQL} AS shard,
             md5('pos:' || CAST(doc_id AS VARCHAR)) AS posk
      FROM documents
    ), positioned AS (
      SELECT shard, doc_id, n_tokens,
             row_number() OVER (PARTITION BY shard
                                ORDER BY posk, doc_id) AS pos
      FROM sharded
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           max(CASE WHEN pos = 1 THEN doc_id END) AS first_doc,
           CAST(sum(doc_id * pos) AS BIGINT) AS order_checksum
    FROM positioned GROUP BY shard
    """,
)
def shuffle_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: every document gets a
    pseudo-random shard (seeded md5 bucket) and a pseudo-random
    position *within* its shard (row_number over a second seeded md5)
    — together a reproducible permutation of the corpus, the property
    `ORDER BY rand()` lacks across engines, runs, and cluster layouts.

    Deliberately NOT a global sort: sharding is a map-side projection
    and each shard orders independently (per-shard window), so the
    plan parallelizes across shards at any scale — the manifest
    checksum (Σ doc_id·pos) pins the exact within-shard order
    cross-engine without materializing it.

    REQUIRED: the shard count scales with the cluster, not the corpus
    (see ``_shard_expr``'s contract) — at a fixed count the per-shard
    sort is the plan's only unbounded partition. Re-sharding with a
    bigger count is order-safe: co-sharded pairs keep their relative
    order at every count."""
    d = load_table(spark, sf_dir, "documents")
    return (
        shard_permutation(d)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max(F.when(F.col("pos") == 1, F.col("doc_id"))).alias("first_doc"),
            F.sum(F.col("doc_id") * F.col("pos")).alias("order_checksum"),
        )
    )


@query(
    "quality_quantile_filter",
    oracle="""
    WITH stats AS (
      SELECT source, count(*) AS n_total,
             quantile_cont(n_chars, 0.1) AS p10,
             quantile_cont(n_chars, 0.9) AS p90
      FROM documents GROUP BY source
    ), kept AS (
      SELECT d.source, count(*) AS n_kept,
             CAST(sum(CAST(floor(d.n_chars / 4.0) AS BIGINT) + 1) AS BIGINT)
               AS kept_tokens
      FROM documents d JOIN stats s USING (source)
      WHERE d.n_chars >= s.p10 AND d.n_chars <= s.p90
      GROUP BY d.source
    )
    SELECT s.source, s.n_total, k.n_kept, k.kept_tokens,
           floor(s.p10 * 1000000.0) / 1000000.0 AS p10,
           floor(s.p90 * 1000000.0) / 1000000.0 AS p90
    FROM stats s JOIN kept k USING (source)
    """,
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile outlier filter: drop documents outside the
    [P10, P90] length band of their source (the distribution-aware
    variant of fixed length cutoffs — each source keeps its own
    middle mass). Exact interpolated percentiles (one grouped agg),
    stats broadcast back onto the corpus (sources ≪ documents), then
    one re-aggregate — two shuffles total at any scale."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.expr("percentile(n_chars, 0.1)").alias("p10"),
        F.expr("percentile(n_chars, 0.9)").alias("p90"),
    )
    kept = (
        d.join(F.broadcast(stats), "source")
        .where((F.col("n_chars") >= F.col("p10")) & (F.col("n_chars") <= F.col("p90")))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.floor(F.col("n_chars") / F.lit(4.0)).cast("long") + 1).alias(
                "kept_tokens"
            ),
        )
    )
    return stats.join(kept, "source").select(
        "source",
        "n_total",
        "n_kept",
        "kept_tokens",
        trunc6(F.col("p10")).alias("p10"),
        trunc6(F.col("p90")).alias("p90"),
    )


#: Build-side predicate: customers with at least one order above this
#: price — a genuine subset (~1/3 of customers; every customer has
#: *some* order in the synthetic data, so unfiltered membership would
#: be degenerate: no true negatives, no observable false positives).
_BLOOM_THR = 480000


def _bloom_pos_sql(i: int, key_sql: str) -> str:
    return (
        _hex7_to_int_sql(f"md5('{i}:' || CAST({key_sql} AS VARCHAR))")
        + f" % {BLOOM_M}"
    )


@query(
    "sketch_bloom_membership",
    oracle=f"""
    WITH keys AS (
      SELECT DISTINCT o_custkey AS key FROM orders
      WHERE o_totalprice > {_BLOOM_THR}
    ), pos AS (
      {" UNION ".join(
          f"SELECT CAST({_bloom_pos_sql(i, 'key')} AS BIGINT) AS p FROM keys"
          for i in range(BLOOM_K)
      )}
    ), bits AS (
      SELECT list_sort(list(DISTINCT p)) AS bs FROM pos
    ), probe AS (
      SELECT c_custkey,
             {", ".join(
                 f"CAST({_bloom_pos_sql(i, 'c_custkey')} AS BIGINT) AS p{i}"
                 for i in range(BLOOM_K)
             )}
      FROM customer
    ), m AS (
      SELECT c_custkey,
             {" AND ".join(f"list_contains(bits.bs, p{i})" for i in range(BLOOM_K))}
               AS bloom_member
      FROM probe CROSS JOIN bits
    ), act AS (
      SELECT c.c_custkey, (k.key IS NOT NULL) AS actual_member
      FROM customer c LEFT JOIN keys k ON k.key = c.c_custkey
    )
    SELECT bloom_member, actual_member, count(*) AS n,
           min(m.c_custkey) AS min_key, max(m.c_custkey) AS max_key
    FROM m JOIN act USING (c_custkey)
    GROUP BY bloom_member, actual_member
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom filter built over the high-value-order
    customer keys (o_totalprice > 480000; high-value customers),
    probed with every customer; the confusion-matrix summary
    (bloom_member × actual_member) exhibits the sketch contract —
    false positives present, false negatives structurally impossible
    (the (false, true) row never exists; pinned in
    tests/test_corpus_ops.py). Build is one O(m)-state aggregate;
    probe is an in-row broadcast test, zero shuffle
    (operators/sketches.py)."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > _BLOOM_THR
    )
    cust = load_table(spark, sf_dir, "customer")
    bits = bloom_build(orders, "o_custkey")
    probed = bloom_probe(cust.select("c_custkey"), bits, "c_custkey")
    actual = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    return (
        probed.join(
            actual.withColumn("actual_member", F.lit(True)), "c_custkey", "left"
        )
        .withColumn("actual_member", F.coalesce("actual_member", F.lit(False)))
        .groupBy("bloom_member", "actual_member")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
    )


@query(
    "chunk_context_windows",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '([a-z]+)', 1) AS t
      FROM documents
    ), spec AS (
      SELECT doc_id, t, len(t) AS n,
             CASE WHEN len(t) > {_CW_W}
                  THEN CAST((len(t) - {_CW_W} + {_CW_S} - 1) // {_CW_S} AS BIGINT)
                  ELSE 0 END AS k_max
      FROM toks
    ), chunks AS (
      SELECT doc_id, k AS chunk_idx,
             list_slice(t, CAST(k * {_CW_S} + 1 AS INTEGER),
                        CAST(k * {_CW_S} + {_CW_W} AS INTEGER)) AS c
      FROM (SELECT doc_id, t, unnest(range(0, k_max + 1)) AS k FROM spec)
    )
    SELECT doc_id, chunk_idx, len(c) AS n_tok,
           md5(array_to_string(c, ' ')) AS chunk_md5
    FROM chunks WHERE len(c) > 0
    """,
)
def chunk_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window re-chunking: split each document's token stream
    into overlapping training windows (32 tokens, stride 24)
    — the standard pre-tokenization step that turns variable-length
    documents into model-context-sized pieces with cross-boundary
    overlap. Pure in-row algebra (tokenize once, slide with
    transform(sequence), explode) — the corpus never shuffles; chunk
    identity is pinned cross-engine by the window md5."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
    spec = d.select("doc_id", toks.alias("t")).withColumn(
        "k_max",
        F.when(
            F.size("t") > _CW_W,
            F.floor(
                (F.size("t") - F.lit(_CW_W) + F.lit(_CW_S - 1)) / F.lit(_CW_S)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    chunks = spec.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("k_max"))).alias(
            "chunk_idx"
        ),
        F.col("t"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.slice(
            F.col("t"), (F.col("chunk_idx") * _CW_S + 1).cast("int"), _CW_W
        ).alias("c"),
    )
    return chunks.where(F.size("c") > 0).select(
        "doc_id",
        "chunk_idx",
        F.size("c").alias("n_tok"),
        F.md5(F.concat_ws(" ", F.col("c"))).alias("chunk_md5"),
    )


@query(
    "mm_frame_sample_manifest",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             24.0 + (doc_id % 3) * 6 AS fps,
             n_chars / 50.0 AS duration
      FROM documents
    ), s AS (
      SELECT media_id, fps,
             unnest(range(0, CAST(ceil(duration * 2.0) AS BIGINT))) AS k
      FROM m WHERE duration > 0
    )
    SELECT media_id, k AS sample_idx,
           CAST(floor(k * fps / 2.0) AS BIGINT) AS frame_idx,
           k / 2.0 AS frame_ts
    FROM s
    """,
)
def mm_frame_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal frame-sampling PLAN as a gate query: a synthetic
    media catalog (per-document fps/duration) → the exact
    (media_id, frame_idx, ts) table a GPU decode stage would consume
    at 2 fps (operators/multimodal.py `sample_frames` — plan
    relationally, decode only the sampled frames; every sample
    strictly before duration). Pure sequence+explode arithmetic, no
    decode, no Python."""
    from speech_data_pipeline_spark.operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(24.0) + (F.col("doc_id") % 3) * 6).alias("fps"),
        (F.col("n_chars") / F.lit(50.0)).alias("duration"),
    )
    return sample_frames(media, target_fps=2.0)


@query(
    "profile_table_stats",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT doc_id) AS n_ids,
           count(DISTINCT source) AS n_sources,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_empty_text,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           floor(avg(n_chars) * 1000000.0) / 1000000.0 AS avg_chars
    FROM documents
    """,
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profiling in one pass: row/id/source/lang
    cardinalities, empty-text count, length min/max/total/mean — the
    data-quality dashboard every ingest runs first. Single aggregate,
    map-side partials; distinct counts shuffle only distinct values."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_ids"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(
            F.when(F.col("text").isNull() | (F.col("text") == ""), 1).otherwise(0)
        ).alias("n_empty_text"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("total_chars"),
        trunc6(F.avg("n_chars")).alias("avg_chars"),
    )


#: BPE training rounds for the tokenizer-merge query.
_BPE_ROUNDS = 5


def _bpe_ctes(n_merges: int = _BPE_ROUNDS) -> str:
    parts = [
        """w0 AS (
      SELECT word, freq,
             '  ' || array_to_string(string_split(word, ''), '  ') || '  '
               AS w
      FROM (
        SELECT word, count(*) AS freq FROM (
          SELECT unnest(regexp_extract_all(lower(text), '([a-z]+)', 1))
                   AS word
          FROM documents
        ) GROUP BY word
      )
    )"""
    ]
    for t in range(1, n_merges + 1):
        parts.append(f"""
    p{t} AS (
      SELECT p.a AS a, p.b AS b, sum(freq) AS c FROM (
        SELECT freq,
               unnest(list_transform(
                 range(1, greatest(len(syms) - 1, 0) + 1),
                 i -> {{'a': syms[CAST(i AS INTEGER)],
                        'b': syms[CAST(i AS INTEGER) + 1]}})) AS p
        FROM (
          SELECT list_filter(string_split(w, ' '), x -> x <> '') AS syms,
                 freq
          FROM w{t - 1}
        )
      ) GROUP BY p.a, p.b
    ),
    t{t} AS (SELECT a, b, c FROM p{t} ORDER BY c DESC, a, b LIMIT 1),
    w{t} AS (
      SELECT word, freq,
             replace(w, ' ' || a || '  ' || b || ' ',
                     ' ' || a || b || ' ') AS w
      FROM w{t - 1} CROSS JOIN t{t}
    )""")
    return "WITH " + ",".join(parts)


def _bpe_oracle(n_merges: int = _BPE_ROUNDS) -> str:
    sel = " UNION ALL ".join(
        f"SELECT {t} AS round, a AS left, b AS right, "
        f"CAST(c AS BIGINT) AS pair_count FROM t{t}"
        for t in range(1, n_merges + 1)
    )
    return _bpe_ctes(n_merges) + " " + sel


def _bpe_encode_oracle(n_merges: int = _BPE_ROUNDS) -> str:
    return (
        _bpe_ctes(n_merges)
        + f""",
    wc AS (
      SELECT word,
             len(list_filter(string_split(w, ' '), x -> x <> '')) AS n_sym
      FROM w{n_merges}
    ),
    docw AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS word
      FROM documents
    )
    SELECT doc_id, count(*) AS n_words,
           CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
    FROM docw JOIN wc USING (word) GROUP BY doc_id
    """
    )


@query("text_bpe_merges", oracle=_bpe_oracle())
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first 5 BPE tokenizer merges over the
    corpus word-frequency table (operators/text.py bpe_train_merges) —
    distributed tokenizer training, the step every LLM data pipeline
    runs before token counting is even defined. Corpus-sized work is
    one token count; each merge round is a vocab-sized pair count, a
    broadcast one-row argmax, and a boundary-preserving string
    replace. The DuckDB oracle replays the full greedy trajectory as
    chained CTEs."""
    return tx.bpe_train_merges(
        load_table(spark, sf_dir, "documents"), n_merges=_BPE_ROUNDS
    )


@query("text_bpe_encode", oracle=_bpe_encode_oracle())
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the learned BPE merges: a word's token
    count under the trained tokenizer is the symbol count of its final
    merged form, so encoding is the document word stream joined against
    the trained word table — never a per-document re-segmentation.
    Per document: word count and BPE token count (the number a packing
    budget actually needs)."""
    docs = load_table(spark, sf_dir, "documents")
    _, vocab = tx.bpe_train(docs, n_merges=_BPE_ROUNDS)
    syms = F.filter(F.split("w", " "), lambda x: x != "")
    wc = vocab.select("word", F.size(syms).alias("n_sym"))
    docw = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
        ).alias("word"),
    )
    return (
        docw.join(wc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
    )


@query(
    "pipeline_governed_mix",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text, source, n_chars,
             {_BUCKET_SQL} AS bucket,
             min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
      FROM documents
    ), toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '([a-z]+)', 1) AS t
      FROM documents
    ), dg AS (
      SELECT DISTINCT doc_id, gram FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(t) - {_DECON_N - 1}, 0) + 1),
                 i -> array_to_string(
                        list_slice(t, CAST(i AS INTEGER),
                                   CAST(i AS INTEGER) + {_DECON_N - 1}), ' ')))
                 AS gram
        FROM toks
      )
    ), bench AS (
      SELECT DISTINCT gram FROM dg
      JOIN (SELECT doc_id FROM b WHERE bucket >= 90) USING (doc_id)
    ), contaminated AS (
      SELECT DISTINCT doc_id FROM dg
      WHERE gram IN (SELECT gram FROM bench)
    ), stats AS (
      SELECT source,
             quantile_cont(n_chars, 0.1) AS p10,
             quantile_cont(n_chars, 0.9) AS p90
      FROM documents GROUP BY source
    ), kept AS (
      SELECT d.doc_id, d.source, d.n_chars,
             {_SHARD_SQL} AS shard
      FROM b d JOIN stats s USING (source)
      WHERE d.bucket < 80
        AND d.doc_id = d.canonical_id
        AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
        AND d.n_chars >= s.p10 AND d.n_chars <= s.p90
    )
    SELECT source, shard, count(*) AS n_docs,
           CAST(sum(CAST(n_chars // 4 + 1 AS BIGINT)) AS BIGINT)
             AS total_tokens,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM kept GROUP BY source, shard
    """,
)
def pipeline_governed_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 capstone: the full governance stack as ONE declarative
    plan — exact-dedup canonical filter → train-split selection →
    4-gram test-set decontamination (broadcast benchmark
    anti-join) → per-source quantile length band → deterministic shard
    assignment → per (source, shard) training-mix report.

    Catalyst fuses the whole chain: the corpus is scanned once for the
    document stream (plus once for the gram stream), the benchmark
    gram set and per-source stats are broadcast, and the only
    corpus-width shuffles are the canonical-digest window and the
    final report aggregate — the same count at 100 TB."""

    d = load_table(spark, sf_dir, "documents")
    # digest computed BEFORE the window so the canonical-dedup exchange
    # moves (doc_id, source, n_chars, bucket, dig) — never the text
    b = d.select(
        "doc_id",
        "source",
        "n_chars",
        _bucket().alias("bucket"),
        F.md5("text").alias("dig"),
    ).withColumn(
        "canonical_id", F.min("doc_id").over(Window.partitionBy("dig"))
    )
    grams = F.explode(
        F.array_distinct(tx.word_ngrams(F.col("text"), _DECON_N))
    ).alias("gram")
    # benchmark grams derive from the test split alone (10% of docs) —
    # re-tokenizing that slice is cheaper than a second full-corpus
    # gram pass (the un-persisted dg subtree would be evaluated once
    # per consuming branch)
    bench = (
        d.withColumn("bucket", _bucket())
        .where(F.col("bucket") >= 90)
        .select(grams)
        .distinct()
    )
    dg = d.select("doc_id", grams)  # per-doc distinct is in-row; no shuffle
    contaminated = (
        dg.join(F.broadcast(bench), "gram", "left_semi").select("doc_id").distinct()
    )
    stats = d.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.1)").alias("p10"),
        F.expr("percentile(n_chars, 0.9)").alias("p90"),
    )
    shard = _shard_expr()
    kept = (
        b.where((F.col("bucket") < 80) & (F.col("doc_id") == F.col("canonical_id")))
        .join(contaminated, "doc_id", "left_anti")
        .join(F.broadcast(stats), "source")
        .where(
            (F.col("n_chars") >= F.col("p10")) & (F.col("n_chars") <= F.col("p90"))
        )
        .withColumn("shard", shard)
    )
    return kept.groupBy("source", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.expr("n_chars div 4") + 1).cast("long").alias("total_tokens"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def _pagerank_oracle(iters: int = 3, fp: int = 1 << 30,
                     damping_pct: int = 85) -> str:
    teleport = (100 - damping_pct) * fp // 100
    parts = [
        """e0 AS (
      SELECT 'u:' || CAST(user_id AS VARCHAR) AS src,
             't:' || event_type AS dst, count(*) AS w
      FROM events GROUP BY user_id, event_type
    ),
    e AS (SELECT src, dst, w FROM e0
          UNION ALL SELECT dst, src, w FROM e0),
    od AS (SELECT src, sum(w) AS outdeg FROM e GROUP BY src),
    n AS (SELECT DISTINCT node FROM
            (SELECT src AS node FROM e UNION SELECT dst FROM e)),
    r0 AS (SELECT node, CAST(%d AS BIGINT) AS rank_fp FROM n)""" % fp
    ]
    for t in range(iters):
        parts.append(f"""
    i{t + 1} AS (
      SELECT e.dst, sum((r.rank_fp * e.w) // od.outdeg) AS s
      FROM e JOIN od USING (src) JOIN r{t} r ON r.node = e.src
      GROUP BY e.dst
    ),
    r{t + 1} AS (
      SELECT n.node,
             CAST({teleport} + ({damping_pct} * coalesce(i.s, 0)) // 100
                  AS BIGINT) AS rank_fp
      FROM n LEFT JOIN i{t + 1} i ON i.dst = n.node
    )""")
    return (
        "WITH " + ",".join(parts)
        + f" SELECT node, rank_fp FROM r{iters}"
    )


@query("graph_pagerank_activity", oracle=_pagerank_oracle())
def graph_pagerank_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank centrality over the bipartite user ↔
    event-type activity graph (both directions, edge weight = event
    count) — the graph-centrality curation signal (rank hosts /
    cluster members / pick diverse representatives), run with EXACT
    fixed-point integer arithmetic so the 3-iteration trajectory is
    bit-replayable as chained CTEs
    (operators/graph.py pagerank_fixed_point)."""
    from speech_data_pipeline_spark.operators.graph import pagerank_fixed_point

    ev = load_table(spark, sf_dir, "events")
    e0 = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("w"))
    u = F.concat(F.lit("u:"), F.col("user_id").cast("string"))
    t = F.concat(F.lit("t:"), F.col("event_type"))
    edges = e0.select(u.alias("src"), t.alias("dst"), "w").unionByName(
        e0.select(t.alias("src"), u.alias("dst"), "w")
    )
    return pagerank_fixed_point(edges, iters=3)


#: Weighted-sample size per stratum.
_PPS_K = 5


@query(
    "sample_weighted_pps",
    oracle=f"""
    WITH w AS (
      SELECT source, doc_id,
             CAST(n_chars // 4 + 1 AS BIGINT) AS wt,
             md5(CAST(doc_id AS VARCHAR)) AS ord
      FROM documents
    ), c AS (
      SELECT source, doc_id, wt,
             sum(wt) OVER (PARTITION BY source ORDER BY ord, doc_id) AS hi,
             sum(wt) OVER (PARTITION BY source) AS tot
      FROM w
    ), m AS (
      SELECT source, doc_id, wt,
        (CASE WHEN 2 * {_PPS_K} * hi >= tot
              THEN (2 * {_PPS_K} * hi - tot) // (2 * tot) + 1 ELSE 0 END)
        - (CASE WHEN 2 * {_PPS_K} * (hi - wt) >= tot
                THEN (2 * {_PPS_K} * (hi - wt) - tot) // (2 * tot) + 1
                ELSE 0 END) AS mult
      FROM c
    )
    SELECT source, doc_id, wt, CAST(mult AS BIGINT) AS mult
    FROM m WHERE mult > 0
    """,
)
def sample_weighted_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted (probability-proportional-to-size)
    sampling: exactly 5 draws per source with inclusion
    multiplicity ∝ token weight, via systematic sampling over the
    md5-ordered cumulative weight line — the particle-filter /
    PPS-survey technique, done ENTIRELY in integer arithmetic (sample
    point i sits at (2i+1)·W/(2k); a document's multiplicity is a
    difference of integer floor divisions), so the draw is bit-exact
    on any engine with no transcendental tie-break risk (the usual
    A-ES exponential keys need ln/pow, which are not cross-engine
    exactly rounded).

    Plan: two windows over the stratum key (cumsum + total), map-side
    multiplicity arithmetic, filter — one shuffle, no sort beyond the
    per-stratum window, never materializes a stratum."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "source",
        "doc_id",
        (F.expr("n_chars div 4") + 1).cast("long").alias("wt"),
        F.md5(F.col("doc_id").cast("string")).alias("ord"),
    )
    win = Window.partitionBy("source").orderBy("ord", "doc_id")
    c = w.select(
        "source",
        "doc_id",
        "wt",
        F.sum("wt").over(win).alias("hi"),
        F.sum("wt").over(Window.partitionBy("source")).alias("tot"),
    )
    k2 = 2 * _PPS_K
    # integer `div` throughout — floor(double-division) can round the
    # wrong way when the quotient lands next to an integer
    mult = F.expr(
        f"""(CASE WHEN {k2} * hi >= tot
                  THEN ({k2} * hi - tot) div (2 * tot) + 1 ELSE 0 END)
          - (CASE WHEN {k2} * (hi - wt) >= tot
                  THEN ({k2} * (hi - wt) - tot) div (2 * tot) + 1
                  ELSE 0 END)"""
    ).cast("long")
    m = c.select("source", "doc_id", "wt", mult.alias("mult"))
    return m.where(F.col("mult") > 0)


@query(
    "calibrate_isotonic",
    oracle="""
    WITH g AS (
      SELECT source, least(n_chars // 75, 9) AS bucket,
             count(*) AS n,
             CAST(sum(CASE WHEN len(regexp_extract_all(lower(text),
                                     '([a-z]+)', 1)) >= 40
                           THEN 1 ELSE 0 END) AS BIGINT) AS hits
      FROM documents GROUP BY source, bucket
    ), p AS (
      SELECT source, bucket, n, hits,
             sum(n) OVER w AS cn, sum(hits) OVER w AS ch,
             sum(n) OVER w - n AS pn, sum(hits) OVER w - hits AS ph
      FROM g WINDOW w AS (PARTITION BY source ORDER BY bucket)
    ), seg AS (
      SELECT pj.source, pj.bucket AS j, pk.bucket AS k,
             (pk.ch - pj.ph) * 1.0 / (pk.cn - pj.pn) AS v
      FROM p pj JOIN p pk
        ON pj.source = pk.source AND pj.bucket <= pk.bucket
    ), mm AS (
      SELECT s.source, s.j, pi.bucket AS i, min(s.v) AS mv
      FROM seg s JOIN p pi
        ON pi.source = s.source
       AND s.j <= pi.bucket AND pi.bucket <= s.k
      GROUP BY s.source, s.j, pi.bucket
    ), fit AS (
      SELECT source, i AS bucket, max(mv) AS fitted
      FROM mm GROUP BY source, i
    )
    SELECT g.source, g.bucket, g.n, g.hits,
           floor(f.fitted * 1000000.0) / 1000000.0 AS fitted
    FROM g JOIN fit f ON f.source = g.source AND f.bucket = g.bucket
    """,
)
def calibrate_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source isotonic calibration of a quality signal: bucket
    documents by length band, measure the integer hit rate of a
    downstream property (>= 40 alpha tokens), and fit the best
    non-decreasing step function with weighted PAVA
    (operators/calibration.py) — raw score → calibrated keep-rate, the
    classifier-calibration step of a filtering pipeline.

    Cross-engine exactness without replaying the sequential merge: all
    pool values are single divisions of exact integer sums, so the
    DuckDB oracle recomputes the SAME doubles through the closed-form
    minimax identity fit(i) = max_{j<=i} min_{k>=i} avg(j..k) — an
    O(buckets³) triple join that is trivial on the b<=10 bucket table
    (the corpus-sized work is the one grouped aggregate feeding it,
    in both engines)."""
    d = load_table(spark, sf_dir, "documents")
    from speech_data_pipeline_spark.operators.calibration import (
        isotonic_calibrate,
    )

    n_tok = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
    )
    g = (
        d.select(
            "source",
            F.least(F.expr("n_chars div 75"), F.lit(9)).alias("bucket"),
            (n_tok >= 40).cast("int").alias("hit"),
        )
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("hit").alias("hits"))
    )
    fit = isotonic_calibrate(g)
    return fit.select(
        "source", "bucket", "n", "hits", trunc6(F.col("fitted")).alias("fitted")
    )


@query(
    "embed_quantize_int8",
    oracle="""
    WITH e AS (
      SELECT vec_id, len(embedding) AS dim,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS v
      FROM embeddings
    ), s AS (
      SELECT vec_id, dim, v,
             greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127.0
               AS scale
      FROM e
    ), r AS (
      SELECT vec_id, dim, scale,
             list_transform(range(1, dim + 1),
               i -> abs(v[CAST(i AS INTEGER)]
                        - floor(v[CAST(i AS INTEGER)] / scale + 0.5) * scale))
               AS err
      FROM s
    )
    SELECT vec_id, dim,
           floor(scale * 1000000.0) / 1000000.0 AS scale,
           floor(list_max(err) * 1000000.0) / 1000000.0 AS max_abs_err,
           floor(list_sum(err) / dim * 1000000.0) / 1000000.0 AS mean_abs_err
    FROM r
    """,
)
def embed_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (per-vector absmax scale)
    with reconstruction-error report — the standard 4× compression
    before an ANN index ships to serving. Pure in-row array algebra on
    doubles; rounding is spelled ``floor(x/scale + 0.5)`` in BOTH
    engines so half-way ties cannot diverge. Zero shuffle, zero blowup
    — the quantized corpus never leaves its scan partition."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.expr("transform(embedding, x -> cast(x as double))")
    scale = F.expr(
        "greatest(array_max(transform(embedding,"
        " x -> abs(cast(x as double)))), 1e-12) / 127.0"
    )
    r = e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        v.alias("v"),
        scale.alias("scale"),
    ).withColumn(
        "err",
        F.expr("transform(v, x -> abs(x - floor(x / scale + 0.5) * scale))"),
    )
    return r.select(
        "vec_id",
        "dim",
        trunc6(F.col("scale")).alias("scale"),
        trunc6(F.array_max("err")).alias("max_abs_err"),
        trunc6(
            F.aggregate("err", F.lit(0.0), lambda a, x: a + x) / F.col("dim")
        ).alias("mean_abs_err"),
    )


def _hex15_to_int_sql(md5_expr: str) -> str:
    """DuckDB nibble fold for the first 15 hex chars of an md5 → the
    same 60-bit BIGINT Spark's ``conv(substring(md5, 1, 15), 16, 10)``
    produces (operators/sketches.py `_hex15`)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({md5_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (14 - i)}"
        for i in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


_HLL_H_SQL = _hex15_to_int_sql("md5(CAST(user_id AS VARCHAR))")


@query(
    "sketch_hll_distinct",
    oracle=f"""
    WITH jr AS (
      SELECT event_type,
             h % 16 AS j,
             least(CASE WHEN h // 16 = 0 THEN 57
                        ELSE 57 - length(bin(h // 16)) END, 53) AS rho
      FROM (SELECT event_type, {_HLL_H_SQL} AS h FROM events)
    ), regs AS (
      SELECT event_type, j, max(rho) AS rho FROM jr GROUP BY event_type, j
    ), allregs AS (
      SELECT event_type AS scope, j, rho FROM regs
      UNION ALL
      SELECT 'ALL' AS scope, j, max(rho) AS rho FROM regs GROUP BY j
    ), est AS (
      SELECT scope, count(*) AS n_regs,
             CAST(sum(1::BIGINT << (53 - rho))
                  + (16 - count(*)) * (1::BIGINT << 53) AS BIGINT)
               AS denom_scaled
      FROM allregs GROUP BY scope
    )
    SELECT scope, n_regs, denom_scaled,
           floor(((CAST(0.673 AS DOUBLE) * 256.0) * 9007199254740992.0
                  / CAST(denom_scaled AS DOUBLE)) * 1000000.0) / 1000000.0
             AS hll_distinct
    FROM est
    """,
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type, plus an
    ``ALL`` row computed by MERGING the per-type register tables
    (element-wise max) — never by rescanning the corpus. That merge is
    the whole point of HLL at 100 TB: build registers per shard / per
    day with one map-side-combinable grouped ``max``, union sketches
    associatively, estimate from O(groups × 16) rows of state.

    Engine-portable by construction (operators/sketches.py): seeded
    60-bit md5 hash, exact integer rho via ``length(bin(w))``, scaled
    BIGINT harmonic denominator, single final float division. The
    DuckDB oracle replays registers AND estimates bit-for-bit.

    Reference parity: the reference counts distincts exactly
    (e.g. speaker counts in reports); this is the sketch form those
    counters need once the key set no longer fits an exact distinct.
    """
    from speech_data_pipeline_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev, "user_id", ["event_type"])
    allregs = regs.select(
        F.col("event_type").alias("scope"), "j", "rho"
    ).unionByName(
        regs.groupBy("j")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("ALL").alias("scope"), "j", "rho")
    )
    return hll_estimate(allregs, ["scope"])


#: Equi-width histogram geometry for the quantile sketch.
_HIST_B = 128
_HIST_QS = [0.25, 0.5, 0.75, 0.9]


@query(
    "sketch_histogram_quantile",
    oracle=f"""
    WITH x AS (SELECT CAST(o_totalprice AS DOUBLE) AS x FROM orders),
    stats AS (SELECT min(x) AS mn, max(x) AS mx, count(*) AS n FROM x),
    b AS (
      SELECT CAST(least(floor(((x - mn) / (mx - mn)) * {float(_HIST_B)}),
                        {_HIST_B - 1}) AS BIGINT) AS bin
      FROM x, stats
    ), bins AS (SELECT bin, count(*) AS cnt FROM b GROUP BY bin),
    cum AS (
      SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin) AS cum,
             coalesce(sum(cnt) OVER (ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM bins
    ), qs AS (SELECT CAST(unnest([{", ".join(str(q) for q in _HIST_QS)}])
                          AS DOUBLE) AS q),
    pick AS (
      SELECT q, min(bin) AS bin
      FROM qs JOIN cum
        ON CAST(cum AS DOUBLE) >= q * (SELECT CAST(n AS DOUBLE) FROM stats)
      GROUP BY q
    )
    SELECT p.q,
           floor((mn + (CAST(c.bin AS DOUBLE)
                        + (p.q * CAST(n AS DOUBLE)
                           - CAST(c.cum_before AS DOUBLE))
                          / CAST(c.cnt AS DOUBLE))
                       * ((mx - mn) / {float(_HIST_B)})) * 1000000.0)
             / 1000000.0 AS est,
           n
    FROM pick p JOIN cum c ON p.bin = c.bin, stats
    """,
)
def sketch_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram quantile sketch over ``o_totalprice`` — the
    mergeable percentile estimator (the optimizer-statistics classic):
    bin counts are pure sums, so shard histograms union by addition and
    the quantile walk runs over O(B) state, never over rows.

    Two passes by construction (min/max bounds, then counts) — the
    standard tradeoff vs t-digest, bought back at scale because both
    passes are map-side-combinable aggregates with ≤B-row exchanges.
    The quantile interpolation itself runs IN-ROW over the collected
    ≤128-bin array (broadcast-bounded-array pattern — no partition-less
    window, same rule as the IVF probe ranking), picking the first bin
    whose cumulative count reaches ``q·n`` and interpolating linearly
    inside it. Every float op is replayed with identical operand order
    in the DuckDB oracle; trunc6 absorbs nothing — it matches exactly.
    """
    B = _HIST_B
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("x")
    )
    stats = o.agg(
        F.min("x").alias("mn"), F.max("x").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = o.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.floor(
                ((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")))
                * F.lit(float(B))
            ),
            F.lit(B - 1),
        )
        .cast("long")
        .alias("bin")
    )
    bins = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    one = (
        bins.agg(
            F.array_sort(F.collect_list(F.struct("bin", "cnt"))).alias("bs")
        )
        .crossJoin(F.broadcast(stats))
        .select(
            F.explode(
                F.array(*[F.lit(float(q)) for q in _HIST_QS])
            ).alias("q"),
            "bs", "mn", "mx", "n",
        )
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(B))
    t = F.col("q") * F.col("n").cast("double")
    zero = F.struct(
        F.lit(0).cast("long").alias("cum"), F.lit(-1.0).alias("est")
    )

    def step(a, s):
        new_cum = a["cum"] + s["cnt"]
        est_here = F.col("mn") + (
            s["bin"].cast("double")
            + (t - a["cum"].cast("double")) / s["cnt"].cast("double")
        ) * width
        return F.struct(
            new_cum.alias("cum"),
            F.when(a["est"] >= 0, a["est"])
            .when(new_cum.cast("double") >= t, est_here)
            .otherwise(F.lit(-1.0))
            .alias("est"),
        )

    walked = one.select(
        "q",
        F.aggregate("bs", zero, step)["est"].alias("_est"),
        "n",
    )
    return walked.select("q", trunc6(F.col("_est")).alias("est"), "n")


@query(
    "graph_triangle_count",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), deg AS (
      SELECT n, count(*) AS d
      FROM (SELECT x AS n FROM e UNION ALL SELECT y AS n FROM e)
      GROUP BY n
    ), oe AS (
      SELECT CASE WHEN (dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y))
                  THEN e.x ELSE e.y END AS su,
             CASE WHEN (dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y))
                  THEN e.y ELSE e.x END AS sv,
             CASE WHEN (dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y))
                  THEN dy.d ELSE dx.d END AS dv
      FROM e JOIN deg dx ON e.x = dx.n JOIN deg dy ON e.y = dy.n
    ), tri AS (
      SELECT count(*) AS n_triangles
      FROM oe a
      JOIN oe b ON a.su = b.su
              AND (a.dv < b.dv OR (a.dv = b.dv AND a.sv < b.sv))
      JOIN oe c ON c.su = a.sv AND c.sv = b.sv
    )
    SELECT (SELECT count(*) FROM deg) AS n_vertices,
           (SELECT count(*) FROM e) AS n_edges,
           n_triangles
    FROM tri
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting over the part co-purchase graph
    (parts are connected when some order contains both) — the third
    graph-analytics primitive beside connected components
    (dedup_resolve) and PageRank.

    Edge building is self-bounded: pairs form only within one order
    (≤7 items), so the pair join is O(items²-per-order), never global.
    Counting uses degree orientation (operators/graph.py
    `triangle_count`): the wedge join's out-degrees are O(√m) under
    the orientation, which is what makes the only quadratic step safe
    under hub skew at 100 TB. The DuckDB oracle replays the identical
    orientation and wedge-close joins.
    """
    from speech_data_pipeline_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b_ = op.select("o", F.col("p").alias("v"))
    edges = (
        a.join(b_, "o")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    return triangle_count(edges)


#: Known event-type domain for the DQ domain-membership constraint.
_DQ_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


@query(
    "dq_constraint_report",
    oracle=f"""
    WITH oa AS (
      SELECT count(*) AS n, count(DISTINCT o_orderkey) AS nd,
             sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS neg,
             sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS nulld
      FROM orders
    ), orph AS (
      SELECT count(*) AS n FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = o.o_custkey)
    ), la AS (
      SELECT count(*) AS n,
             count(DISTINCT (l_orderkey, l_linenumber)) AS nd,
             sum(CASE WHEN l_discount < 0 OR l_discount > 1
                      THEN 1 ELSE 0 END) AS oob
      FROM lineitem
    ), lorph AS (
      SELECT count(*) AS n FROM lineitem l
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey)
    ), ea AS (
      SELECT count(*) AS n, count(DISTINCT event_id) AS nd,
             sum(CASE WHEN event_type NOT IN
                 {_DQ_EVENT_TYPES} THEN 1 ELSE 0 END) AS ood,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nullv
      FROM events
    )
    SELECT * FROM (
      SELECT 'orders' AS tbl, 'pk_unique_o_orderkey' AS constraint_name,
             floor(CAST(nd AS DOUBLE) / n * 1000000.0) / 1000000.0 AS metric,
             nd = n AS ok FROM oa
      UNION ALL
      SELECT 'orders', 'non_negative_o_totalprice',
             CAST(neg AS DOUBLE), neg = 0 FROM oa
      UNION ALL
      SELECT 'orders', 'completeness_o_orderdate',
             floor((1.0 - CAST(nulld AS DOUBLE) / n) * 1000000.0)
               / 1000000.0, nulld = 0 FROM oa
      UNION ALL
      SELECT 'orders', 'fk_o_custkey_in_customer',
             CAST(n AS DOUBLE), n = 0 FROM orph
      UNION ALL
      SELECT 'lineitem', 'pk_unique_orderkey_linenumber',
             floor(CAST(nd AS DOUBLE) / n * 1000000.0) / 1000000.0,
             nd = n FROM la
      UNION ALL
      SELECT 'lineitem', 'range_l_discount_0_1',
             CAST(oob AS DOUBLE), oob = 0 FROM la
      UNION ALL
      SELECT 'lineitem', 'fk_l_orderkey_in_orders',
             CAST(n AS DOUBLE), n = 0 FROM lorph
      UNION ALL
      SELECT 'events', 'pk_unique_event_id',
             floor(CAST(nd AS DOUBLE) / n * 1000000.0) / 1000000.0,
             nd = n FROM ea
      UNION ALL
      SELECT 'events', 'domain_event_type',
             CAST(ood AS DOUBLE), ood = 0 FROM ea
      UNION ALL
      SELECT 'events', 'completeness_value',
             floor((1.0 - CAST(nullv AS DOUBLE) / n) * 1000000.0)
               / 1000000.0, nullv = 0 FROM ea
    )
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality constraint audit: uniqueness,
    completeness, value-range, domain-membership, and referential-
    integrity checks over three tables, emitted as one
    ``(tbl, constraint_name, metric, ok)`` report.

    The batching is the point at scale: every same-table constraint
    folds into ONE aggregate pass (3 scans for 8 of the 10
    constraints; map-side-combinable counts/distincts), and the two FK
    checks are anti-join counts AQE can broadcast. A naive
    constraint-per-scan runner reads each table once per check — 10
    scans; at 100 TB the difference is the audit being free vs being
    the pipeline's dominant job.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")

    t6 = trunc6  # the module-wide rounding rule, one definition

    def report_rows(agg_df, rows):
        structs = [
            F.struct(
                F.lit(tbl).alias("tbl"),
                F.lit(name).alias("constraint_name"),
                metric.alias("metric"),
                ok.alias("ok"),
            )
            for tbl, name, metric, ok in rows
        ]
        return agg_df.select(F.explode(F.array(*structs)).alias("r")).select(
            "r.tbl", "r.constraint_name", "r.metric", "r.ok"
        )

    oa = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderkey").alias("nd"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("neg"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias(
            "nulld"
        ),
    )
    r1 = report_rows(
        oa,
        [
            ("orders", "pk_unique_o_orderkey",
             t6(F.col("nd").cast("double") / F.col("n")),
             F.col("nd") == F.col("n")),
            ("orders", "non_negative_o_totalprice",
             F.col("neg").cast("double"), F.col("neg") == 0),
            ("orders", "completeness_o_orderdate",
             t6(F.lit(1.0) - F.col("nulld").cast("double") / F.col("n")),
             F.col("nulld") == 0),
        ],
    )
    orph = o.join(
        c, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    ).agg(F.count(F.lit(1)).alias("n"))
    r2 = report_rows(
        orph,
        [("orders", "fk_o_custkey_in_customer",
          F.col("n").cast("double"), F.col("n") == 0)],
    )
    la = li.agg(
        F.count(F.lit(1)).alias("n"),
        # struct key: a tuple with a NULL part must COUNT as a distinct
        # key (DuckDB count(DISTINCT (a,b)) semantics) — bare
        # countDistinct(a, b) silently drops NULL-bearing rows, which
        # is exactly the dirty data a PK audit exists to catch
        F.countDistinct(F.struct("l_orderkey", "l_linenumber")).alias("nd"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            .otherwise(0)
        ).alias("oob"),
    )
    r3 = report_rows(
        la,
        [
            ("lineitem", "pk_unique_orderkey_linenumber",
             t6(F.col("nd").cast("double") / F.col("n")),
             F.col("nd") == F.col("n")),
            ("lineitem", "range_l_discount_0_1",
             F.col("oob").cast("double"), F.col("oob") == 0),
        ],
    )
    lorph = li.join(
        o, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"
    ).agg(F.count(F.lit(1)).alias("n"))
    r4 = report_rows(
        lorph,
        [("lineitem", "fk_l_orderkey_in_orders",
          F.col("n").cast("double"), F.col("n") == 0)],
    )
    ea = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_id").alias("nd"),
        F.sum(
            F.when(~F.col("event_type").isin(list(_DQ_EVENT_TYPES)), 1)
            .otherwise(0)
        ).alias("ood"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("nullv"),
    )
    r5 = report_rows(
        ea,
        [
            ("events", "pk_unique_event_id",
             t6(F.col("nd").cast("double") / F.col("n")),
             F.col("nd") == F.col("n")),
            ("events", "domain_event_type",
             F.col("ood").cast("double"), F.col("ood") == 0),
            ("events", "completeness_value",
             t6(F.lit(1.0) - F.col("nullv").cast("double") / F.col("n")),
             F.col("nullv") == 0),
        ],
    )
    return r1.unionByName(r2).unionByName(r3).unionByName(r4).unionByName(r5)


def _bfs_oracle(source: str = "t:purchase", max_hops: int = 4) -> str:
    parts = ["""e0 AS (
      SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src,
             't:' || event_type AS dst
      FROM events
    ),
    e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    v0(node, hop) AS (SELECT '%s', 0)""" % source]
    for k in range(1, max_hops + 1):
        parts.append(f"""
    n{k} AS (
      SELECT DISTINCT e.dst AS node FROM e
      JOIN v{k - 1} f ON e.src = f.node AND f.hop = {k - 1}
      WHERE e.dst NOT IN (SELECT node FROM v{k - 1})
    ),
    v{k} AS (SELECT node, hop FROM v{k - 1}
             UNION ALL SELECT node, {k} FROM n{k})""")
    return (
        "WITH " + ",".join(parts)
        + f" SELECT node, CAST(hop AS INTEGER) AS hop FROM v{max_hops}"
    )


@query("graph_bfs_hops", oracle=_bfs_oracle())
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances from the ``t:purchase`` node over the
    bipartite user ↔ event-type activity graph — the frontier-
    expansion iterative primitive (operators/graph.py bfs_hops): each
    round joins only the FRONTIER onto the edge table and anti-joins
    the visited set; state is node-sized, rounds are a driver-known
    constant, and the trajectory replays exactly as chained CTEs."""
    from speech_data_pipeline_spark.operators.graph import bfs_hops

    ev = load_table(spark, sf_dir, "events")
    e0 = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
    ).distinct()
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return bfs_hops(edges, "t:purchase", max_hops=4)


def _textrank_oracle(iters: int = 3, fp: int = 1 << 30,
                     damping_pct: int = 85, min_len: int = 4,
                     k: int = 20) -> str:
    teleport = (100 - damping_pct) * fp // 100
    parts = [f"""toks AS (
      SELECT regexp_extract_all(lower(text), '([a-z]+)', 1) AS w
      FROM documents
    ),
    adj AS (
      SELECT w[CAST(i AS INTEGER)] AS l, w[CAST(i AS INTEGER) + 1] AS r
      FROM (SELECT w, unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i
            FROM toks)
    ),
    e0 AS (
      SELECT l AS src, r AS dst, count(*) AS w FROM adj
      WHERE length(l) >= {min_len} AND length(r) >= {min_len} AND l <> r
      GROUP BY l, r
    ),
    e AS (SELECT src, dst, w FROM e0
          UNION ALL SELECT dst, src, w FROM e0),
    od AS (SELECT src, sum(w) AS outdeg FROM e GROUP BY src),
    n AS (SELECT DISTINCT node FROM
            (SELECT src AS node FROM e UNION SELECT dst FROM e)),
    r0 AS (SELECT node, CAST({fp} AS BIGINT) AS rank_fp FROM n)"""]
    for t in range(iters):
        parts.append(f"""
    i{t + 1} AS (
      SELECT e.dst, sum((r.rank_fp * e.w) // od.outdeg) AS s
      FROM e JOIN od USING (src) JOIN r{t} r ON r.node = e.src
      GROUP BY e.dst
    ),
    r{t + 1} AS (
      SELECT n.node,
             CAST({teleport} + ({damping_pct} * coalesce(i.s, 0)) // 100
                  AS BIGINT) AS rank_fp
      FROM n LEFT JOIN i{t + 1} i ON i.dst = n.node
    )""")
    return (
        "WITH " + ",".join(parts)
        + f" SELECT node AS word, rank_fp FROM r{iters}"
        f" ORDER BY rank_fp DESC, word LIMIT {k}"
    )


@query("text_textrank_keywords", oracle=_textrank_oracle())
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): integer
    fixed-point PageRank over the corpus-level word co-occurrence
    graph (adjacent ≥4-char words, undirected, weight = count), top-20
    by centrality.

    A pure composition: the DSIR-style in-row bigram explode feeds
    operators/graph.py ``pagerank_fixed_point`` unchanged; the
    vocabulary-sized rank table ends in TakeOrderedAndProject. Same
    bit-replayable trajectory contract as graph_pagerank_activity.
    """
    from speech_data_pipeline_spark.operators.graph import pagerank_fixed_point

    d = load_table(spark, sf_dir, "documents")
    # multiplicity collapse (the exact_collapse_reps idea, carrying a
    # copy count instead of a representative id): identical texts
    # tokenize ONCE and weight the co-occurrence counts by their copy
    # count — edge weights (hence the whole trajectory) are IDENTICAL
    # to the per-doc form, but a duplicate mega-cluster costs one
    # tokenization, not cluster
    reps = d.groupBy(F.md5("text").alias("_dig")).agg(
        F.min("text").alias("text"), F.count(F.lit(1)).alias("copies")
    )
    w = F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
    toks = reps.select(w.alias("w"), "copies")
    n = F.greatest(F.size("w") - 1, F.lit(0))
    adj = toks.select(
        "copies",
        F.explode(
            F.zip_with(
                F.slice("w", 1, n),
                F.slice("w", 2, n),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("p"),
    ).select("copies", "p.l", "p.r")
    e0 = (
        adj.where(
            (F.length("l") >= 4) & (F.length("r") >= 4) & (F.col("l") != F.col("r"))
        )
        .groupBy(F.col("l").alias("src"), F.col("r").alias("dst"))
        .agg(F.sum("copies").alias("w"))
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    pr = pagerank_fixed_point(edges, iters=3)
    return (
        pr.select(F.col("node").alias("word"), "rank_fp")
        .orderBy(F.col("rank_fp").desc(), "word")
        .limit(20)
    )


#: KMV/theta sketch depth and the exact-double scale (k-1)·2^60 for
#: the union estimate (63·2^60 has a 6-bit mantissa — exactly
#: representable, so both engines multiply nothing and divide once).
_KMV_K = 64
_KMV_SCALE = float((_KMV_K - 1) * (1 << 60))


@query(
    "sketch_theta_intersection",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, {_HLL_H_SQL} AS h FROM events
    ), r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    ), sk AS (
      SELECT event_type, list_sort(list(h)) AS s
      FROM r WHERE rn <= {_KMV_K} GROUP BY event_type
    ), p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.s AS sa, b.s AS sb
      FROM sk a JOIN sk b ON a.event_type < b.event_type
    ), u AS (
      SELECT type_a, type_b, sa, sb,
             list_sort(list_distinct(list_concat(sa, sb)))[1:{_KMV_K}] AS mu
      FROM p
    ), m AS (
      SELECT type_a, type_b,
             len(mu) AS ku,
             mu[len(mu)] AS theta,
             len(list_filter(mu, v -> list_contains(sa, v)
                                  AND list_contains(sb, v))) AS matches
      FROM u
    )
    SELECT type_a, type_b,
           CAST(ku AS BIGINT) AS ku,
           CAST(matches AS BIGINT) AS matches,
           floor((CASE WHEN ku < {_KMV_K} THEN CAST(ku AS DOUBLE)
                       ELSE {_KMV_SCALE!r} / CAST(theta AS DOUBLE) END)
                 * 1000000.0) / 1000000.0 AS est_union,
           floor((CAST(matches AS DOUBLE) / ku) * 1000000.0) / 1000000.0
             AS est_jaccard,
           floor(((CAST(matches AS DOUBLE) / ku)
                  * (CASE WHEN ku < {_KMV_K} THEN CAST(ku AS DOUBLE)
                          ELSE {_KMV_SCALE!r} / CAST(theta AS DOUBLE) END))
                 * 1000000.0) / 1000000.0 AS est_intersection
    FROM m
    ORDER BY type_a, type_b
    """,
)
def sketch_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise distinct-user OVERLAP between event types from KMV /
    theta sketches (operators/sketches.py kmv_sketches) — the set-
    algebra sketch HLL can't provide: the merged k-smallest sample of
    A∪B gives θ (the k-th minimum), the union estimate (k−1)·2^60/θ,
    and the Jaccard estimate (matching sample fraction), hence the
    intersection estimate — all WITHOUT rescanning either set.

    Plan shape: one (type, hash) DISTINCT shuffle builds all sketches
    (per-type state capped at k=64 rows); the |types|²/2 pair table is
    a broadcast self-join of 5 single-array rows; every estimate is
    in-row array algebra over ≤2k-element arrays. At 100 TB the
    sketches are built per shard and merged associatively (the same
    DISTINCT + top-k), and audience-overlap queries never touch the
    raw corpus again. Exact doubles: the only float ops are the final
    divisions of exactly-representable integers, identical in any
    IEEE engine.
    """
    from speech_data_pipeline_spark.operators.sketches import kmv_sketches

    ev = load_table(spark, sf_dir, "events")
    sk = kmv_sketches(ev, "user_id", "event_type", _KMV_K)
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sa"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sb"))
    p = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    mu = F.slice(F.array_sort(F.array_union("sa", "sb")), 1, _KMV_K)
    m = (
        p.withColumn("mu", mu)
        .withColumn("ku", F.size("mu"))
        .withColumn("theta", F.element_at("mu", F.col("ku")))
        .withColumn(
            "matches",
            F.size(
                F.filter(
                    "mu",
                    lambda v: F.array_contains("sa", v)
                    & F.array_contains("sb", v),
                )
            ),
        )
    )
    est_union = F.when(
        F.col("ku") < _KMV_K, F.col("ku").cast("double")
    ).otherwise(F.lit(_KMV_SCALE) / F.col("theta").cast("double"))
    est_j = F.col("matches").cast("double") / F.col("ku")
    return m.select(
        "type_a",
        "type_b",
        F.col("ku").cast("long").alias("ku"),
        F.col("matches").cast("long").alias("matches"),
        trunc6(est_union).alias("est_union"),
        trunc6(est_j).alias("est_jaccard"),
        trunc6(est_j * est_union).alias("est_intersection"),
    ).orderBy("type_a", "type_b")


def _lpa_oracle(iters: int = 3) -> str:
    """Chained-CTE replay of the fixed-round synchronous label
    propagation (operators/graph.py label_propagation) over the part
    co-purchase graph — same edges as graph_triangle_count."""
    prev = "l0"
    rounds = []
    for t in range(1, iters + 1):
        rounds.append(
            f"""c{t} AS (
      SELECT u.s AS node, {prev}.lab AS nlab, count(*) AS c
      FROM und u JOIN {prev} ON {prev}.node = u.d
      GROUP BY u.s, {prev}.lab
    ), l{t} AS (
      SELECT node, nlab AS lab FROM (
        SELECT node, nlab,
               row_number() OVER (PARTITION BY node
                                  ORDER BY c DESC, nlab) AS rn
        FROM c{t})
      WHERE rn = 1
    )"""
        )
        prev = f"l{t}"
    return f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e0 AS (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), und AS (
      SELECT x AS s, y AS d FROM e0 UNION SELECT y, x FROM e0
    ), l0 AS (
      SELECT DISTINCT s AS node, s AS lab FROM und
    ), {", ".join(rounds)}
    SELECT node AS part_id, lab AS community FROM {prev}
    """


@query("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    part co-purchase graph — the DENSITY companion to the
    connectivity algorithms (dedup_resolve's connected components
    finds what touches; this finds what clusters): 3 deterministic
    rounds, neighbor-majority labels, ties to the smallest label.

    Plan shape per round (operators/graph.py label_propagation): one
    hash join of the edge list against the n-node label table, one
    (node, label) grouped count, one per-node grouped argmin on
    struct(-count, label) — no windows over the corpus, state
    persisted between rounds. The oracle replays the full 3-round
    trajectory as chained CTEs (the pagerank/k-means contract).
    """
    from speech_data_pipeline_spark.operators.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b_ = op.select("o", F.col("p").alias("v"))
    edges = (
        a.join(b_, "o")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    out = label_propagation(edges, iters=3, edges_distinct=True)
    return out.select(
        F.col("node").alias("part_id"), F.col("lab").alias("community")
    )


def _kcore_oracle(k: int = 3, rounds: int = 4) -> str:
    """Chained-CTE replay of the fixed-round synchronous k-core peel
    (operators/graph.py k_core) over the part co-purchase graph."""
    prev = "u0"
    ctes = []
    for t in range(1, rounds + 1):
        ctes.append(
            f"""a{t} AS (
      SELECT s AS node FROM {prev} GROUP BY s HAVING count(*) >= {k}
    ), u{t} AS (
      SELECT u.s, u.d FROM {prev} u
      JOIN a{t} x ON x.node = u.s
      JOIN a{t} y ON y.node = u.d
    )"""
        )
        prev = f"u{t}"
    return f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e0 AS (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), u0 AS (
      SELECT x AS s, y AS d FROM e0 UNION SELECT y, x FROM e0
    ), {", ".join(ctes)}
    SELECT s AS part_id, CAST(count(*) AS BIGINT) AS deg
    FROM {prev} GROUP BY s
    """


@query("graph_k_core", oracle=_kcore_oracle())
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the part co-purchase graph by 4 synchronous peel
    rounds — the subgraph where every surviving part co-occurs with
    ≥3 other survivors (the "stable catalog backbone" used to seed
    recommendations; connectivity ∈ components, density ∈ LPA, this
    is COHESION).

    Plan shape per round (operators/graph.py k_core): one grouped
    degree count + two left-semi filters of the edge table on the
    survivor set — key-partitioned hash joins only, state persisted
    between rounds. The oracle replays the identical 4-round peel as
    chained CTEs.
    """
    from speech_data_pipeline_spark.operators.graph import k_core

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b_ = op.select("o", F.col("p").alias("v"))
    edges = (
        a.join(b_, "o")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    out = k_core(edges, k=3, rounds=4, edges_distinct_directed=True)
    return out.select(F.col("node").alias("part_id"), "deg")


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------


@query(
    "dq_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1.0
    ), obs AS (
      SELECT digit, count(*) AS n_obs FROM d GROUP BY digit
    ), grid AS (
      SELECT g.digit, coalesce(o.n_obs, 0) AS n_obs,
             sum(coalesce(o.n_obs, 0)) OVER () AS n
      FROM (SELECT unnest(generate_series(1, 9)) AS digit) g
      LEFT JOIN obs o ON o.digit = g.digit
    ), terms AS (
      SELECT digit, n_obs, n,
             log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS exp_p,
             pow(CAST(n_obs AS DOUBLE)
                 - CAST(n AS DOUBLE)
                   * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2)
             / (CAST(n AS DOUBLE)
                * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))) AS term
      FROM grid
    )
    SELECT digit, n_obs,
           floor(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS obs_p,
           floor(exp_p * 1000000.0) / 1000000.0 AS exp_p,
           floor(sum(term) OVER (ORDER BY digit
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1000000.0) / 1000000.0 AS chi2_run
    FROM terms
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals —
    the classic fabricated-data / unit-mixing detector — with a
    chi-square goodness-of-fit accumulated in DIGIT ORDER
    (``chi2_run`` at digit 9 is the statistic; α=0.05 critical value
    for 8 df is 15.507).

    Cross-engine float rule: the chi-square is a running sum over the
    9-row digit grid ordered by digit, so both engines fold the same
    9 terms in the same order — no order-nondeterministic float sum.

    Plan shape: one grouped count collapses the corpus to ≤9 rows; a
    broadcast-able 9-row literal grid left-join restores absent
    digits; windows run over that 9-row table (whitelisted).
    """
    o = load_table(spark, sf_dir, "orders")
    obs = (
        o.where(F.col("o_totalprice") >= 1.0)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("long").cast("string"), 1, 1
            )
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    grid = spark.range(1, 10).select(F.col("id").alias("digit"))
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_run = Window.orderBy("digit").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    exp_p = F.log10(F.lit(1.0) + F.lit(1.0) / dbl(F.col("digit")))
    joined = (
        grid.join(obs, "digit", "left")
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        )
        .withColumn("n", F.sum("n_obs").over(w_all))
    )
    term = F.pow(
        dbl(F.col("n_obs")) - dbl(F.col("n")) * exp_p, F.lit(2.0)
    ) / (dbl(F.col("n")) * exp_p)
    return joined.select(
        "digit",
        "n_obs",
        trunc6(dbl(F.col("n_obs")) / dbl(F.col("n"))).alias("obs_p"),
        trunc6(exp_p).alias("exp_p"),
        trunc6(F.sum(term).over(w_run)).alias("chi2_run"),
    )


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (Bellman–Ford)
# ---------------------------------------------------------------------------


def _sssp_oracle(source: str = "t:purchase", rounds: int = 4) -> str:
    parts = ["""e0 AS (
      SELECT 'u:' || CAST(user_id AS VARCHAR) AS src,
             't:' || event_type AS dst,
             1 + 100 // count(*) AS w
      FROM events GROUP BY user_id, event_type
    ),
    e AS (SELECT src, dst, w FROM e0 UNION ALL SELECT dst, src, w FROM e0),
    v0(node, dist) AS (SELECT '%s', CAST(0 AS BIGINT))""" % source]
    for k in range(1, rounds + 1):
        parts.append(f"""
    v{k} AS (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM v{k - 1}
        UNION ALL
        SELECT e.dst AS node, f.dist + e.w AS dist
        FROM e JOIN v{k - 1} f ON e.src = f.node
      ) GROUP BY node
    )""")
    return (
        "WITH " + ",".join(parts)
        + f" SELECT node, dist FROM v{rounds}"
    )


@query("graph_sssp_bellman", oracle=_sssp_oracle())
def graph_sssp_bellman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths from the `purchase` hub over the
    user↔event-type interaction graph (the graph_bfs_hops bipartite
    construction), edge cost ``1 + 100 div count`` — frequent
    interactions are cheap hops. Four synchronous Bellman–Ford
    relaxations (see operators/graph.py:bellman_ford_sssp), exactly
    replayed by the chained-CTE oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    e0 = ev.groupBy("user_id", "event_type").agg(
        (F.lit(1) + F.expr("100 div count(*)")).alias("w")
    ).select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
        "w",
    )
    e = e0.unionByName(
        e0.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    from speech_data_pipeline_spark.operators.graph import bellman_ford_sssp

    return bellman_ford_sssp(e, "t:purchase", rounds=4)


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) sharding
# ---------------------------------------------------------------------------

_HRW_SHARDS = 8


def _hrw_oracle() -> str:
    def h(s: int) -> str:
        return _hex7_to_int_sql(
            f"md5(CAST(doc_id AS VARCHAR) || '_hrw_{s}')"
        )

    def argmax(n: int) -> str:
        m = "greatest(" + ", ".join(f"h{s}" for s in range(n)) + ")"
        arms = " ".join(
            f"WHEN h{s} = {m} THEN {s}" for s in range(n)
        )
        return f"CASE {arms} END"

    hs = ", ".join(f"{h(s)} AS h{s}" for s in range(_HRW_SHARDS))
    return f"""
    WITH hashes AS (
      SELECT doc_id, {hs} FROM documents
    ), assign AS (
      SELECT doc_id,
             {argmax(_HRW_SHARDS)} AS shard8,
             {argmax(_HRW_SHARDS - 1)} AS shard7
      FROM hashes
    ), grid AS (
      SELECT unnest(generate_series(0, {_HRW_SHARDS - 1})) AS shard
    )
    SELECT g.shard,
           CAST(coalesce(sum(CASE WHEN a.shard8 = g.shard
                             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_before,
           CAST(coalesce(sum(CASE WHEN a.shard7 = g.shard
                             AND g.shard < {_HRW_SHARDS - 1}
                        THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_after,
           CAST(coalesce(sum(CASE WHEN a.shard7 = g.shard
                             AND a.shard8 = {_HRW_SHARDS - 1}
                        THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_moved_in
    FROM grid g LEFT JOIN assign a ON TRUE
    GROUP BY g.shard
    """


@query("infra_rendezvous_shards", oracle=_hrw_oracle())
def infra_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight sharding (Thaler–Ravishankar
    1998): each document goes to the shard maximizing
    ``md5(doc_id ‖ shard)`` — and when shard 7 is REMOVED, only its
    own documents move (the minimal-disruption property consistent
    hashing is bought for). The report shows, per shard: assignment
    under 8 shards, under 7, and how many of shard 7's documents it
    inherited — ``n_after = n_before + n_moved_in`` everywhere.

    Map-only per-row algebra (8 md5 literals + an argmax CASE with a
    min-shard tie-break, identical in both engines) + one ≤8-row
    grouped count. The complement to shuffle_shard_manifest's
    seeded-permutation sharding: HRW is the assignment you use when
    shards must be STABLE under membership change.
    """
    d = load_table(spark, sf_dir, "documents")

    def h(s: int):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(f"_hrw_{s}"),
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")

    def argmax(n: int):
        m = F.greatest(*[F.col(f"h{s}") for s in range(n)])
        expr = F.when(F.col("h0") == m, 0)
        for s in range(1, n):
            expr = expr.when(F.col(f"h{s}") == m, s)
        return expr

    hashes = d.select(
        "doc_id", *[h(s).alias(f"h{s}") for s in range(_HRW_SHARDS)]
    )
    assign = hashes.select(
        "doc_id",
        argmax(_HRW_SHARDS).alias("shard8"),
        argmax(_HRW_SHARDS - 1).alias("shard7"),
    )
    # aggregate the corpus FIRST (map-side combinable, <=8 groups per
    # aggregate), then join the 8-row grid — never grid x corpus
    c_before = assign.groupBy(F.col("shard8").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_before")
    )
    c_after = assign.groupBy(F.col("shard7").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_after")
    )
    c_moved = (
        assign.where(F.col("shard8") == _HRW_SHARDS - 1)
        .groupBy(F.col("shard7").alias("shard"))
        .agg(F.count(F.lit(1)).alias("n_moved_in"))
    )
    grid = spark.range(_HRW_SHARDS).select(
        F.col("id").cast("int").alias("shard")
    )
    return (
        grid.join(c_before, "shard", "left")
        .join(c_after, "shard", "left")
        .join(c_moved, "shard", "left")
        .select(
            "shard",
            F.coalesce("n_before", F.lit(0)).alias("n_before"),
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
            F.coalesce("n_moved_in", F.lit(0)).alias("n_moved_in"),
        )
    )


def _bpe_fertility_oracle(n_merges: int = _BPE_ROUNDS) -> str:
    return (
        _bpe_ctes(n_merges)
        + f""",
    wc AS (
      SELECT word,
             len(list_filter(string_split(w, ' '), x -> x <> '')) AS n_sym
      FROM w{n_merges}
    ),
    docw AS (
      SELECT d.doc_id, d.lang,
             unnest(regexp_extract_all(lower(d.text), '([a-z]+)', 1))
               AS word
      FROM documents d
    )
    SELECT lang,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_sym) AS BIGINT) AS n_tokens,
           floor(CAST(sum(length(word)) AS DOUBLE)
                 / CAST(sum(n_sym) AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS chars_per_token
    FROM docw JOIN wc USING (word) GROUP BY lang
    """
    )


@query("text_bpe_fertility", oracle=_bpe_fertility_oracle())
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: characters per BPE token BY LANGUAGE
    under the trained merges — the standard multilingual-tokenizer
    equity metric (a language with low chars/token pays more tokens
    for the same text; its packing budgets and context limits shrink
    accordingly).

    Same plan skeleton as text_bpe_encode (train once, join the word
    stream against the trained word table — never per-document
    re-segmentation) with a per-language rollup; integer char/token
    sums cross the shuffle, one float divide per language row.
    """
    docs = load_table(spark, sf_dir, "documents")
    _, vocab = tx.bpe_train(docs, n_merges=_BPE_ROUNDS)
    syms = F.filter(F.split("w", " "), lambda x: x != "")
    wc = vocab.select("word", F.size(syms).alias("n_sym"))
    docw = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
        ).alias("word"),
    )
    return (
        docw.join(wc, "word")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_tokens"),
            trunc6(
                F.sum(F.length("word")).cast("double")
                / F.sum("n_sym").cast("double")
            ).alias("chars_per_token"),
        )
    )

#: Unigram-LM (SentencePiece-style) training hyper-parameters — small
#: fixed values so the DuckDB oracle replays the full EM trajectory.
_UNI_ROUNDS = 2
_UNI_MAXLEN = 4
_UNI_SEED = 150


def _unigram_ctes(
    n_rounds: int = _UNI_ROUNDS,
    ml: int = _UNI_MAXLEN,
    seed_multi: int = _UNI_SEED,
    with_final_seg: bool = False,
) -> str:
    """Chained-CTE replay of operators/text.py unigram_lm_train: seed
    substring counts → integer log costs → per-round recursive-CTE
    Viterbi (forward DP + backtrack, ties to the minimal j = longest
    piece) → usage → new vocab. ``with_final_seg`` appends one extra
    E-step under the final costs and a ``useg`` word table (the
    encode join target)."""
    q = tx.UNIGRAM_Q
    cost_sql = (
        "CAST(-floor(ln(CAST(cnt AS DOUBLE) / t.total) * {q}) AS BIGINT)"
    ).format(q=q)
    parts = [f"""uw AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(regexp_extract_all(lower(text), '([a-z]+)', 1))
          AS word
        FROM documents) GROUP BY word
    ),
    useed AS (
      SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        SELECT freq,
               unnest(flatten(list_transform(range(1, length(word) + 1),
                 j -> list_transform(
                   range(1, least({ml}, length(word) - j + 1) + 1),
                   L -> substr(word, CAST(j AS INT), CAST(L AS INT))))))
                 AS piece
        FROM uw) GROUP BY piece
    ),
    uv0 AS (
      SELECT piece, cnt FROM useed WHERE length(piece) = 1
      UNION ALL
      SELECT piece, cnt FROM (
        SELECT piece, cnt FROM useed WHERE length(piece) > 1
        ORDER BY cnt DESC, piece LIMIT {seed_multi})
    ),
    uc0 AS (
      SELECT piece, cnt, {cost_sql} AS cost
      FROM uv0, (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM uv0) t
    ),
    ueb AS (
      SELECT word, freq, CAST(length(word) AS BIGINT) AS n,
             e.j AS j, e.i AS i,
             substr(word, CAST(e.j AS INT) + 1, CAST(e.i - e.j AS INT))
               AS piece
      FROM (
        SELECT word, freq,
               unnest(flatten(list_transform(range(0, length(word)),
                 j -> list_transform(
                   range(1, least({ml}, length(word) - j) + 1),
                   L -> struct_pack(j := CAST(j AS BIGINT),
                                    i := CAST(j + L AS BIGINT)))))) AS e
        FROM uw)
    )"""]
    minj = (
        "list_min(list_transform(list_filter(es, e -> e.i = cur AND "
        "bests[CAST(e.j AS INT) + 1] + e.cost = "
        "bests[CAST(cur AS INT) + 1]), e -> e.j))"
    )
    last = n_rounds + 1 if with_final_seg else n_rounds
    for r in range(1, last + 1):
        parts.append(f"""
    ue{r} AS (
      SELECT b.word, b.freq, b.n, b.j, b.i, v.cost
      FROM ueb b JOIN uc{r - 1} v USING (piece)
    ),
    uwe{r} AS (
      SELECT word, any_value(freq) AS freq, any_value(n) AS n,
             list(struct_pack(i := i, j := j, cost := cost)
                  ORDER BY i, j) AS es
      FROM ue{r} GROUP BY word
    ),
    udp{r} AS (
      SELECT word, freq, n, es, CAST(0 AS BIGINT) AS i,
             [CAST(0 AS BIGINT)] AS bests
      FROM uwe{r}
      UNION ALL
      SELECT word, freq, n, es, i + 1,
             list_append(bests, list_min(list_transform(
               list_filter(es, e -> e.i = i + 1),
               e -> bests[CAST(e.j AS INT) + 1] + e.cost)))
      FROM udp{r} WHERE i < n
    ),
    ubt{r} AS (
      SELECT word, freq, n, es, bests, n AS cur,
             CAST([] AS VARCHAR[]) AS pieces
      FROM udp{r} WHERE i = n
      UNION ALL
      SELECT word, freq, n, es, bests, {minj},
             list_append(pieces, substr(word,
               CAST({minj} AS INT) + 1, CAST(cur - {minj} AS INT)))
      FROM ubt{r} WHERE cur > 0
    )""")
        if r <= n_rounds:
            parts.append(f"""
    uuse{r} AS (
      SELECT piece, CAST(sum(freq) AS BIGINT) AS usage FROM (
        SELECT freq, unnest(pieces) AS piece
        FROM ubt{r} WHERE cur = 0) GROUP BY piece
    ),
    uv{r} AS (
      SELECT s.piece, COALESCE(u.usage, 0) + 1 AS cnt
      FROM (SELECT piece FROM uv0 WHERE length(piece) = 1) s
      LEFT JOIN uuse{r} u USING (piece)
      UNION ALL
      SELECT piece, usage AS cnt FROM uuse{r} WHERE length(piece) > 1
    ),
    uc{r} AS (
      SELECT piece, cnt, {cost_sql} AS cost
      FROM uv{r}, (SELECT CAST(sum(cnt) AS DOUBLE) AS total
                   FROM uv{r}) t
    )""")
    if with_final_seg:
        parts.append(f"""
    useg AS (
      SELECT word, CAST(len(pieces) AS BIGINT) AS n_pieces,
             bests[CAST(n AS INT) + 1] AS word_cost
      FROM ubt{last} WHERE cur = 0
    )""")
    return "WITH RECURSIVE " + ",".join(parts)


def _unigram_train_oracle() -> str:
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, piece, cnt, cost FROM uc{r}"
        for r in range(0, _UNI_ROUNDS + 1)
    )
    return _unigram_ctes() + " " + sel


@query("text_unigram_train", oracle=_unigram_train_oracle())
def text_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a SentencePiece-style unigram-LM tokenizer (Kudo 2018) —
    the second production tokenizer family beside text_bpe_merges —
    and emit the full EM trajectory (round, piece, cnt, cost).

    Distributed shape (operators/text.py unigram_lm_train): corpus
    work is one word count; each EM round is a vocab join over the
    cached substring table plus an in-row Viterbi DP expressed
    entirely as Spark SQL higher-order functions (aggregate /
    filter / transform — zero Python per row), with integer 2^-20-nat
    log costs so the optimum is engine-exact. The DuckDB oracle
    replays seed selection, both recursive-CTE Viterbi passes, and
    the usage-pruned M-step for every round."""
    traj, _, _ = tx.unigram_lm_train(
        load_table(spark, sf_dir, "documents"),
        n_rounds=_UNI_ROUNDS,
        max_piece_len=_UNI_MAXLEN,
        seed_multi=_UNI_SEED,
    )
    return traj


def _unigram_encode_oracle() -> str:
    return (
        _unigram_ctes(with_final_seg=True)
        + """,
    docw AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '([a-z]+)', 1))
               AS word
      FROM documents
    )
    SELECT doc_id, count(*) AS n_words,
           CAST(sum(n_pieces) AS BIGINT) AS n_unigram_tokens,
           CAST(sum(word_cost) AS BIGINT) AS total_cost
    FROM docw JOIN useg USING (word) GROUP BY doc_id
    """
    )


@query("text_unigram_encode", oracle=_unigram_encode_oracle())
def text_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the trained unigram LM: a word's token
    count (and its Viterbi log cost — the quantity a perplexity
    budget needs) is read off the trained word table, so encoding is
    the document word stream joined against it — never per-document
    re-segmentation. Per document: word count, unigram token count,
    and total integer log cost."""
    docs = load_table(spark, sf_dir, "documents")
    _, _, word_seg = tx.unigram_lm_train(
        docs,
        n_rounds=_UNI_ROUNDS,
        max_piece_len=_UNI_MAXLEN,
        seed_multi=_UNI_SEED,
    )
    docw = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
        ).alias("word"),
    )
    return (
        docw.join(word_seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_unigram_tokens"),
            F.sum("word_cost").alias("total_cost"),
        )
    )


def _unigram_fertility_oracle() -> str:
    return (
        _unigram_ctes(with_final_seg=True)
        + """,
    docw AS (
      SELECT d.lang, d.doc_id,
             unnest(regexp_extract_all(lower(d.text), '([a-z]+)', 1))
               AS word
      FROM documents d
    )
    SELECT lang,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_pieces) AS BIGINT) AS n_tokens,
           floor(CAST(sum(length(word)) AS DOUBLE)
                 / CAST(sum(n_pieces) AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS chars_per_token
    FROM docw JOIN useg USING (word) GROUP BY lang
    """
    )


@query("text_unigram_fertility", oracle=_unigram_fertility_oracle())
def text_unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language under the trained unigram LM —
    the equity audit text_bpe_fertility runs for BPE, now comparable
    across BOTH production tokenizer families (chars/token per
    language decides whose packing budget shrinks)."""
    docs = load_table(spark, sf_dir, "documents")
    _, _, word_seg = tx.unigram_lm_train(
        docs,
        n_rounds=_UNI_ROUNDS,
        max_piece_len=_UNI_MAXLEN,
        seed_multi=_UNI_SEED,
    )
    docw = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
        ).alias("word"),
    )
    return (
        docw.join(word_seg, "word")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_tokens"),
            trunc6(
                F.sum(F.length("word")).cast("double")
                / F.sum("n_pieces").cast("double")
            ).alias("chars_per_token"),
        )
    )

#: WordPiece training rounds (small fixed value: full-trajectory oracle).
_WP_ROUNDS = 5


def _wordpiece_ctes(n_merges: int = _WP_ROUNDS) -> str:
    """Chained-CTE replay of operators/text.py wordpiece_train: per
    round a symbol count + pair count, the likelihood argmax
    ``count(ab)/(count(a)·count(b))`` (IEEE double of exact BIGINTs —
    bit-identical across engines; ties by count desc, a, b), and the
    ##-stripping merge replace."""
    parts = [
        """wp0 AS (
      SELECT word, freq,
             '  ' || substr(word, 1, 1)
                  || CASE WHEN length(word) > 1
                          THEN '  ##' || array_to_string(
                                 string_split(substr(word, 2), ''),
                                 '  ##')
                          ELSE '' END
                  || '  ' AS w
      FROM (
        SELECT word, count(*) AS freq FROM (
          SELECT unnest(regexp_extract_all(lower(text), '([a-z]+)', 1))
                   AS word
          FROM documents
        ) GROUP BY word
      )
    )"""
    ]
    for t in range(1, n_merges + 1):
        parts.append(f"""
    wsy{t} AS (
      SELECT s, CAST(sum(freq) AS BIGINT) AS sc FROM (
        SELECT freq,
               unnest(list_filter(string_split(w, ' '), x -> x <> ''))
                 AS s
        FROM wp{t - 1}) GROUP BY s
    ),
    wpp{t} AS (
      SELECT p.a AS a, p.b AS b, CAST(sum(freq) AS BIGINT) AS c FROM (
        SELECT freq,
               unnest(list_transform(
                 range(1, greatest(len(syms) - 1, 0) + 1),
                 i -> {{'a': syms[CAST(i AS INTEGER)],
                        'b': syms[CAST(i AS INTEGER) + 1]}})) AS p
        FROM (
          SELECT list_filter(string_split(w, ' '), x -> x <> '') AS syms,
                 freq
          FROM wp{t - 1}
        )
      ) GROUP BY p.a, p.b
    ),
    wpt{t} AS (
      SELECT a, b, c,
             CAST(c AS DOUBLE) / CAST(ca * cb AS DOUBLE) AS score
      FROM (
        SELECT p.a, p.b, p.c, sa.sc AS ca, sb.sc AS cb
        FROM wpp{t} p
        JOIN wsy{t} sa ON sa.s = p.a
        JOIN wsy{t} sb ON sb.s = p.b
      ) ORDER BY score DESC, c DESC, a, b LIMIT 1
    ),
    wp{t} AS (
      SELECT word, freq,
             replace(w, ' ' || a || '  ' || b || ' ',
                     ' ' || a || substr(b, 3) || ' ') AS w
      FROM wp{t - 1} CROSS JOIN wpt{t}
    )""")
    return "WITH " + ",".join(parts)


def _wordpiece_oracle(n_merges: int = _WP_ROUNDS) -> str:
    sel = " UNION ALL ".join(
        f"SELECT {t} AS round, a AS left, b AS right, c AS pair_count, "
        f"{trunc6_sql('score')} AS score FROM wpt{t}"
        for t in range(1, n_merges + 1)
    )
    return _wordpiece_ctes(n_merges) + " " + sel


@query("text_wordpiece_merges", oracle=_wordpiece_oracle())
def text_wordpiece_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first 5 WordPiece merges (Schuster & Nakajima 2012,
    the BERT tokenizer) — completing the production tokenizer triad
    beside text_bpe_merges and text_unigram_train. Same distributed
    loop as BPE (one corpus word count; vocab-sized recounts +
    broadcast 1-row argmax per round) but with ##-continuation
    symbols and the likelihood argmax count(ab)/(count(a)·count(b)),
    an IEEE-exact double of BIGINTs so the trajectory replays
    engine-identically."""
    merges, _ = tx.wordpiece_train(
        load_table(spark, sf_dir, "documents"), n_merges=_WP_ROUNDS
    )
    return merges


def _wordpiece_encode_oracle(n_merges: int = _WP_ROUNDS) -> str:
    return (
        _wordpiece_ctes(n_merges)
        + f""",
    wpc AS (
      SELECT word,
             len(list_filter(string_split(w, ' '), x -> x <> ''))
               AS n_sym
      FROM wp{n_merges}
    ),
    docw AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '([a-z]+)', 1))
               AS word
      FROM documents
    )
    SELECT doc_id, count(*) AS n_words,
           CAST(sum(n_sym) AS BIGINT) AS n_wordpiece_tokens
    FROM docw JOIN wpc USING (word) GROUP BY doc_id
    """
    )


@query("text_wordpiece_encode", oracle=_wordpiece_encode_oracle())
def text_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the trained WordPiece vocabulary: token
    count = the trained word table's symbol count, so encoding is a
    join against it (the text_bpe_encode skeleton). Per document:
    word count and WordPiece token count."""
    docs = load_table(spark, sf_dir, "documents")
    _, vocab = tx.wordpiece_train(docs, n_merges=_WP_ROUNDS)
    syms = F.filter(F.split("w", " "), lambda x: x != "")
    wc = vocab.select("word", F.size(syms).alias("n_sym"))
    docw = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
        ).alias("word"),
    )
    return (
        docw.join(wc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_wordpiece_tokens"),
        )
    )

def _hits_oracle(iters: int = 3, fp: int = 1 << 20) -> str:
    parts = [
        """he AS (
      SELECT 'u:' || CAST(user_id AS VARCHAR) AS src,
             't:' || event_type AS dst, count(*) AS w
      FROM events GROUP BY user_id, event_type
    ),
    hsrc AS (SELECT DISTINCT src AS node FROM he),
    hdst AS (SELECT DISTINCT dst AS node FROM he),
    h0 AS (SELECT node, CAST(%d AS BIGINT) AS hub_fp FROM hsrc)""" % fp
    ]
    for t in range(1, iters + 1):
        parts.append(f"""
    ar{t} AS (
      SELECT e.dst, sum(h.hub_fp * e.w) AS raw
      FROM he e JOIN h{t - 1} h ON h.node = e.src GROUP BY e.dst
    ),
    sa{t} AS (SELECT max(raw) // {fp} + 1 AS s FROM ar{t}),
    a{t} AS (
      SELECT dst AS node, CAST(raw // s AS BIGINT) AS auth_fp
      FROM ar{t}, sa{t}
    ),
    hr{t} AS (
      SELECT e.src, sum(a.auth_fp * e.w) AS raw
      FROM he e JOIN a{t} a ON a.node = e.dst GROUP BY e.src
    ),
    sh{t} AS (SELECT max(raw) // {fp} + 1 AS s FROM hr{t}),
    h{t} AS (
      SELECT src AS node, CAST(raw // s AS BIGINT) AS hub_fp
      FROM hr{t}, sh{t}
    )""")
    return (
        "WITH " + ",".join(parts)
        + f"""
    SELECT 'hub' AS kind, n.node, COALESCE(h.hub_fp, 0) AS score_fp
    FROM hsrc n LEFT JOIN h{iters} h USING (node)
    UNION ALL
    SELECT 'auth' AS kind, n.node, COALESCE(a.auth_fp, 0) AS score_fp
    FROM hdst n LEFT JOIN a{iters} a USING (node)
    """
    )


@query("graph_hits_scores", oracle=_hits_oracle())
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the DIRECTED user → event-type
    activity graph (edge weight = event count): users score as hubs
    (they do many kinds of high-authority activity), event types as
    authorities (they attract high-hub users) — the
    mutual-reinforcement centrality beside graph_pagerank_activity.
    Integer max-DIV renormalization per half-step keeps the
    3-iteration trajectory BIGINT-exact and overflow-safe at any
    corpus size (operators/graph.py hits_scores)."""
    from speech_data_pipeline_spark.operators.graph import hits_scores

    ev = load_table(spark, sf_dir, "events")
    e0 = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("w"))
    edges = e0.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
        "w",
    )
    hubs, auths = hits_scores(edges, iters=3)
    return hubs.select(
        F.lit("hub").alias("kind"), "node", F.col("hub_fp").alias("score_fp")
    ).unionByName(
        auths.select(
            F.lit("auth").alias("kind"),
            "node",
            F.col("auth_fp").alias("score_fp"),
        )
    )

#: Kneser-Ney discount D = 3/4 (expressed with integer numerators:
#: max(c - 3/4, 0) = greatest(4c - 3, 0) / 4) and the unigram log grid.
_KN_Q = 1 << 20

#: The KN probability as ONE shared expression string (valid in both
#: dialects, evaluated in the SAME association order so every IEEE
#: step is bit-identical): interpolated bigram KN with continuation
#: unigram back-off and an epsilon floor of 1/(4·N_bigrams).
_KN_P_SQL = """
    greatest(
      CASE WHEN ca > 0 THEN
        CAST(greatest(4 * cab - 3, 0) AS DOUBLE) / CAST(4 * ca AS DOUBLE)
        + CAST(3 * n1l AS DOUBLE) / CAST(4 * ca AS DOUBLE)
          * (CAST(n1r AS DOUBLE) / CAST(nb AS DOUBLE))
      ELSE CAST(n1r AS DOUBLE) / CAST(nb AS DOUBLE) END,
      1.0 / CAST(4 * nb AS DOUBLE))
"""

_KN_COST_SQL = f"CAST(-floor(ln({_KN_P_SQL}) * {_KN_Q}) AS BIGINT)"


def _kn_oracle() -> str:
    split = _hex7_to_int_sql("md5('kn:' || CAST(doc_id AS VARCHAR))")
    return f"""
    WITH kb AS (
      SELECT doc_id, source, {split} % 2 AS half, p.a AS a, p.b AS b
      FROM (
        SELECT doc_id, source,
               unnest(list_transform(
                 range(1, greatest(len(ws) - 1, 0) + 1),
                 i -> {{'a': ws[CAST(i AS INTEGER)],
                        'b': ws[CAST(i AS INTEGER) + 1]}})) AS p
        FROM (
          SELECT doc_id, source,
                 regexp_extract_all(lower(text), '([a-z]+)', 1) AS ws
          FROM documents)
      )
    ),
    cab AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS cab
      FROM kb WHERE half = 0 GROUP BY a, b
    ),
    actx AS (
      SELECT a, CAST(sum(cab) AS BIGINT) AS ca,
             CAST(count(*) AS BIGINT) AS n1l
      FROM cab GROUP BY a
    ),
    bcont AS (
      SELECT b, CAST(count(*) AS BIGINT) AS n1r FROM cab GROUP BY b
    ),
    nbt AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM cab),
    scored AS (
      SELECT t.source,
             COALESCE(x.cab, 0) AS cab,
             COALESCE(c.ca, 0) AS ca, COALESCE(c.n1l, 0) AS n1l,
             COALESCE(r.n1r, 0) AS n1r, nbt.nb AS nb
      FROM kb t
      LEFT JOIN cab x ON x.a = t.a AND x.b = t.b
      LEFT JOIN actx c ON c.a = t.a
      LEFT JOIN bcont r ON r.b = t.b
      CROSS JOIN nbt
      WHERE t.half = 1
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum({_KN_COST_SQL}) AS BIGINT) AS total_cost,
           {trunc6_sql(f"CAST(sum({_KN_COST_SQL}) AS DOUBLE) / CAST(count(*) AS DOUBLE) / {_KN_Q}")}
             AS xent_nats
    FROM scored GROUP BY source
    """


@query("lm_kneser_ney_xent", oracle=_kn_oracle())
def lm_kneser_ney_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram language model (D = 3/4) —
    train on the hash-even half of the corpus, score the held-out
    half's cross-entropy per source. THE production n-gram smoothing
    (beside the add-k LM quality_perplexity_buckets already uses):
    absolute discounting plus the continuation-unigram back-off
    P_cont(b) = |{a : c(ab)>0}| / N_bigrams, with an epsilon floor of
    1/(4·N_bigrams) for fully-unseen events.

    Engine shape: corpus work is one bigram explode; the model is
    three Heaps-bounded count tables (bigram, left-context,
    continuation) joined onto the held-out bigram stream; every
    probability is a fixed-association IEEE expression over exact
    BIGINT counts, costs land on the 2^-20-nat integer grid, so the
    per-source sums are engine-exact."""
    d = load_table(spark, sf_dir, "documents")
    split = F.expr(
        "conv(substring(md5('kn:' || CAST(doc_id AS STRING)), 1, 7), 16, 10)"
    ).cast("long") % 2
    kb = (
        d.select(
            "doc_id",
            "source",
            split.alias("half"),
            F.expr("regexp_extract_all(lower(text), '([a-z]+)', 1)").alias(
                "ws"
            ),
        )
        .select(
            "doc_id",
            "source",
            "half",
            F.explode(
                F.expr(
                    "CASE WHEN size(ws) >= 2 THEN zip_with("
                    "slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),"
                    " (x, y) -> named_struct('a', x, 'b', y)) "
                    "ELSE CAST(array() AS "
                    "array<struct<a:string,b:string>>) END"
                )
            ).alias("p"),
        )
        .select("doc_id", "source", "half", "p.a", "p.b")
    )
    cab = (
        kb.where(F.col("half") == 0)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    actx = cab.groupBy("a").agg(
        F.sum("cab").alias("ca"), F.count(F.lit(1)).alias("n1l")
    )
    bcont = cab.groupBy("b").agg(F.count(F.lit(1)).alias("n1r"))
    nbt = cab.agg(F.count(F.lit(1)).alias("nb"))
    scored = (
        kb.where(F.col("half") == 1)
        .join(F.broadcast(cab), ["a", "b"], "left")
        .join(F.broadcast(actx), "a", "left")
        .join(F.broadcast(bcont), "b", "left")
        .crossJoin(F.broadcast(nbt))
        .select(
            "source",
            F.coalesce("cab", F.lit(0)).alias("cab"),
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("n1l", F.lit(0)).alias("n1l"),
            F.coalesce("n1r", F.lit(0)).alias("n1r"),
            "nb",
        )
    )
    cost = F.expr(_KN_COST_SQL)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(cost).alias("total_cost"),
        trunc6(
            F.sum(cost).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(float(_KN_Q))
        ).alias("xent_nats"),
    )

@query(
    "graph_clustering_coeff",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), deg AS (
      SELECT n, count(*) AS d
      FROM (SELECT x AS n FROM e UNION ALL SELECT y AS n FROM e)
      GROUP BY n
    ), oe AS (
      SELECT CASE WHEN (dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y))
                  THEN e.x ELSE e.y END AS su,
             CASE WHEN (dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y))
                  THEN e.y ELSE e.x END AS sv,
             CASE WHEN (dx.d < dy.d OR (dx.d = dy.d AND e.x < e.y))
                  THEN dy.d ELSE dx.d END AS dv
      FROM e JOIN deg dx ON e.x = dx.n JOIN deg dy ON e.y = dy.n
    ), tri AS (
      SELECT a.su AS su, a.sv AS v1, b.sv AS v2
      FROM oe a
      JOIN oe b ON a.su = b.su
              AND (a.dv < b.dv OR (a.dv = b.dv AND a.sv < b.sv))
      JOIN oe c ON c.su = a.sv AND c.sv = b.sv
    ), corners AS (
      SELECT node, count(*) AS n_tri FROM (
        SELECT unnest([su, v1, v2]) AS node FROM tri) GROUP BY node
    )
    SELECT d.n AS node, CAST(d.d AS BIGINT) AS d,
           CAST(COALESCE(c.n_tri, 0) AS BIGINT) AS n_tri,
           CASE WHEN d.d < 2 THEN 0.0
                ELSE floor((2.0 * COALESCE(c.n_tri, 0))
                           / (CAST(d.d AS DOUBLE)
                              * CAST(d.d - 1 AS DOUBLE))
                           * 1000000.0) / 1000000.0 END AS coeff
    FROM deg d LEFT JOIN corners c ON c.node = d.n
    """,
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the part
    co-purchase graph — 2·T(v)/(d(v)·(d(v)−1)), the neighborhood
    density each entity reads (community tightness) where
    graph_triangle_count reads one global number. Shares the
    O(m^1.5) degree-oriented triangle ENUMERATION
    (operators/graph.py _oriented_triangles); attribution is a 3-row
    corner explode + one grouped count, output-linear beyond the
    count's own work."""
    from speech_data_pipeline_spark.operators.graph import (
        clustering_coefficient,
    )

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b_ = op.select("o", F.col("p").alias("v"))
    edges = (
        a.join(b_, "o")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    return clustering_coefficient(edges)

def _split_name_sql(bucket: str) -> str:
    return (
        f"CASE WHEN {bucket} < 8 THEN 'train' "
        f"WHEN {bucket} = 8 THEN 'val' ELSE 'test' END"
    )


@query(
    "split_leakage_safe",
    oracle=f"""
    WITH b AS (
      SELECT source, doc_id, n_chars, md5(text) AS dig FROM documents
    ), canon AS (
      SELECT dig, min(doc_id) AS canonical_id FROM b GROUP BY dig
    ), docs AS (
      SELECT b.source, b.doc_id, b.n_chars, c.canonical_id,
             {_split_name_sql(_hex7_to_int_sql(
                 "md5('split:' || CAST(c.canonical_id AS VARCHAR))")
                 + " % 10")} AS safe_split,
             {_split_name_sql(_hex7_to_int_sql(
                 "md5('split:' || CAST(b.doc_id AS VARCHAR))")
                 + " % 10")} AS naive_split
      FROM b JOIN canon c USING (dig)
    ), per_cluster AS (
      SELECT canonical_id,
             any_value(safe_split) AS safe_split,
             count(DISTINCT naive_split) AS naive_k
      FROM docs GROUP BY canonical_id
    )
    SELECT d.safe_split AS split_name,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT d.canonical_id) AS BIGINT) AS n_clusters,
           CAST(sum(d.n_chars // 4 + 1) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT CASE WHEN p.naive_k > 1
                               THEN d.canonical_id END) AS BIGINT)
             AS naive_leaked_clusters
    FROM docs d JOIN per_cluster p USING (canonical_id)
    GROUP BY d.safe_split
    """,
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split manifest (80/10/10): the
    split hash is taken on the EXACT-DUP CANONICAL id, so a
    duplicate cluster can never straddle splits — the
    train/test-contamination failure a naive per-document hash split
    commits silently. Per split: doc count, cluster count, token
    budget, and the COUNTERFACTUAL audit: how many of this split's
    clusters WOULD have leaked across splits under naive
    per-doc-id hashing (fires as soon as any duplicate cluster's
    members hash apart — the number this operator exists to drive to
    zero; pinned by the planted-duplicate test in
    tests/test_curation.py).

    Plan: one md5 collapse groupBy + member join (the exact-collapse
    shape every dedup query shares), one per-cluster distinct-count,
    one final grouped aggregate — nothing beyond corpus-linear work,
    no windows, no scalar cross joins."""
    d = load_table(spark, sf_dir, "documents")
    b = d.select(
        "source", "doc_id", "n_chars", F.md5(F.col("text")).alias("dig")
    )
    canon = b.groupBy("dig").agg(F.min("doc_id").alias("canonical_id"))
    name = lambda c: (  # noqa: E731
        F.when(c < 8, "train").when(c == 8, "val").otherwise("test")
    )
    h = lambda col: (  # noqa: E731
        F.expr(
            f"conv(substring(md5('split:' || CAST({col} AS STRING)), 1, 7),"
            " 16, 10)"
        ).cast("long")
        % 10
    )
    docs = b.join(canon, "dig").select(
        "source",
        "doc_id",
        "n_chars",
        "canonical_id",
        name(h("canonical_id")).alias("safe_split"),
        name(h("doc_id")).alias("naive_split"),
    )
    per_cluster = docs.groupBy("canonical_id").agg(
        F.countDistinct("naive_split").alias("naive_k")
    )
    return (
        docs.join(per_cluster, "canonical_id")
        .groupBy(F.col("safe_split").alias("split_name"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canonical_id").alias("n_clusters"),
            F.sum(F.expr("n_chars div 4") + 1).cast("long").alias(
                "total_tokens"
            ),
            F.countDistinct(
                F.when(F.col("naive_k") > 1, F.col("canonical_id"))
            ).alias("naive_leaked_clusters"),
        )
    )

#: Novelty n-gram order.
_NOV_N = 3


def _nov_split_sql() -> str:
    return (
        _hex7_to_int_sql("md5('nov:' || CAST(doc_id AS VARCHAR))") + " % 2"
    )


@query(
    "eval_ngram_novelty",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_nov_split_sql()} AS half,
             regexp_extract_all(lower(text), '([a-z]+)', 1) AS t
      FROM documents
    ), dg AS (
      SELECT doc_id, source, half,
             unnest(list_transform(
               range(1, greatest(len(t) - {_NOV_N - 1}, 0) + 1),
               i -> array_to_string(
                      list_slice(t, CAST(i AS INTEGER),
                                 CAST(i AS INTEGER) + {_NOV_N - 1}), ' ')))
               AS gram
      FROM toks
    ), traing AS (
      SELECT DISTINCT gram FROM dg WHERE half = 0
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN tr.seen IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           floor(CAST(sum(CASE WHEN tr.seen IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) * 1000000.0) / 1000000.0
             AS novelty
    FROM dg d
    LEFT JOIN (SELECT gram, 1 AS seen FROM traing) tr USING (gram)
    WHERE d.half = 1
    GROUP BY d.source
    """,
)
def eval_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram novelty (memorization audit): the fraction of word
    3-gram OCCURRENCES in the hash-odd half of the corpus that never
    appear in the hash-even half — the metric that distinguishes
    fresh text from near-verbatim repetition of the reference set
    (the generated-data / memorization check beside
    decon_ngram_overlap's benchmark-contamination flag).

    Plan: one gram explode each side, one DISTINCT on the train gram
    set (Heaps-bounded), one gram-keyed hash join of the test stream,
    one per-source aggregate — corpus-linear, no windows."""
    d = load_table(spark, sf_dir, "documents")
    split = (
        F.expr(
            "conv(substring(md5('nov:' || CAST(doc_id AS STRING)), 1, 7),"
            " 16, 10)"
        ).cast("long")
        % 2
    )
    dg = d.select(
        "doc_id",
        "source",
        split.alias("half"),
        F.explode(tx.word_ngrams(F.col("text"), _NOV_N)).alias("gram"),
    )
    traing = (
        dg.where(F.col("half") == 0).select("gram").distinct()
        .withColumn("seen", F.lit(1))
    )
    novel = F.when(F.col("seen").isNull(), 1).otherwise(0)
    return (
        dg.where(F.col("half") == 1)
        .join(traing, "gram", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).alias("n_novel"),
            trunc6(
                F.sum(novel).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("novelty"),
        )
    )

def _skew_cte(key_expr: str, key_name: str) -> str:
    return f"""
    SELECT '{key_name}' AS key_name,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(max(n) AS BIGINT) AS max_n,
           floor(CAST(max(n) AS DOUBLE) * CAST(count(*) AS DOUBLE)
                 / CAST(sum(n) AS DOUBLE) * 1000000.0) / 1000000.0
             AS skew_factor
    FROM (SELECT {key_expr} AS k, count(*) AS n
          FROM events GROUP BY 1)
    """


@query(
    "dq_key_skew_report",
    oracle=(
        _skew_cte("user_id", "user_id")
        + " UNION ALL "
        + _skew_cte("event_type", "event_type")
        + " UNION ALL "
        + _skew_cte("epoch_us(ts) // 86400000000", "day")
    ),
)
def dq_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report over the event stream: for each
    candidate partitioning key (user_id, event_type, day), the key
    count, row count, hottest-key size, and the skew factor
    ``max·n_keys / n_rows`` (1.0 = perfectly uniform; a factor of F
    means the hottest task runs ~F× the average) — the diagnostic
    that decides where salting / AQE skew-join splitting is needed
    BEFORE a job falls over at 100 TB.

    Plan: one map-side-combinable grouped count per key domain (the
    group tables are key-domain-sized), a 1-row aggregate each, a
    3-row union. The skew factor itself is the exact integer triple
    (max, n_keys, n_rows) assembled in one float expression."""
    ev = load_table(spark, sf_dir, "events")

    def one(key_col, key_name: str) -> DataFrame:
        g = ev.groupBy(key_col.alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        return g.agg(
            F.lit(key_name).alias("key_name"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_n"),
            trunc6(
                F.max("n").cast("double")
                * F.count(F.lit(1)).cast("double")
                / F.sum("n").cast("double")
            ).alias("skew_factor"),
        )
    return (
        one(F.col("user_id"), "user_id")
        .unionByName(one(F.col("event_type"), "event_type"))
        .unionByName(
            one(F.expr("(ts div 1000) div 86400000000"), "day")
        )
    )


# ---------------------------------------------------------------------------
# Degree assortativity (Newman's r) over the co-purchase graph
# ---------------------------------------------------------------------------


@query(
    "graph_assortativity",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), deg AS (
      SELECT n, count(*) AS d
      FROM (SELECT x AS n FROM e UNION ALL SELECT y AS n FROM e)
      GROUP BY n
    ), s AS (
      SELECT CAST(count(*) AS HUGEINT) AS m,
             CAST(sum(CAST(dx.d AS HUGEINT) + dy.d) AS HUGEINT) AS sx,
             CAST(sum(CAST(dx.d AS HUGEINT) * dx.d
                      + CAST(dy.d AS HUGEINT) * dy.d) AS HUGEINT) AS sxx,
             CAST(sum(2 * CAST(dx.d AS HUGEINT) * dy.d) AS HUGEINT) AS sxy
      FROM e JOIN deg dx ON e.x = dx.n JOIN deg dy ON e.y = dy.n
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
           CAST(m AS BIGINT) AS n_edges,
           floor(CAST(2 * m * sxy - sx * sx AS DOUBLE)
                 / CAST(2 * m * sxx - sx * sx AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS assortativity
    FROM s
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the part co-purchase graph (the
    same edge set as graph_triangle_count): Pearson correlation of the
    degrees at the two ends of every edge, with each undirected edge
    contributing both orientations — r > 0 means hubs attach to hubs
    (assortative), r < 0 the hub-and-spoke shape typical of
    co-occurrence graphs. The fourth graph-shape primitive beside
    triangles, clustering coefficient and k-core: together they answer
    "is this dedup/co-purchase graph clustered, hierarchical, or
    hub-dominated?" before committing a partitioning strategy.

    Exactness: with both orientations summed, Sx = Σ(dx+dy),
    Sxx = Σ(dx²+dy²), Sxy = 2Σ dx·dy over the k = 2m edge-end points
    are pure integers in DECIMAL(38,0) (d ≤ n ⇒ Σd·d' ≤ m·n² — exact
    far past any real graph); r = (k·Sxy − Sx²)/(k·Sxx − Sx²) is one
    float assembly.

    Plan shape at 100 TB: the edge build is the triangle-count
    contract (pairs only within one ≤7-item order — never a global
    pair join); degrees are one grouped count; the degree attach is
    two equi-joins on vertex id (shuffle-hash, skew-safe under AQE);
    one 1-row aggregate ends the plan. No windows, no sorts, no
    cross joins.
    """
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    b = op.select(F.col("o"), F.col("p").alias("y"))
    e = (
        op.join(b, "o")
        .where(F.col("p") < F.col("y"))
        .select(F.col("p").alias("x"), "y")
        .distinct()
    )
    deg = (
        e.select(F.col("x").alias("n_"))
        .unionAll(e.select(F.col("y").alias("n_")))
        .groupBy("n_")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dx = deg.select(F.col("n_").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("n_").alias("y"), F.col("d").alias("dy"))
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = (
        e.join(dx, "x")
        .join(dy, "y")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
            F.sum(d38(F.col("dx")) + d38(F.col("dy"))).alias("sx"),
            F.sum(
                d38(F.col("dx")) * d38(F.col("dx"))
                + d38(F.col("dy")) * d38(F.col("dy"))
            ).alias("sxx"),
            F.sum(2 * d38(F.col("dx")) * d38(F.col("dy"))).alias("sxy"),
        )
    )
    nv = deg.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    k = 2 * F.col("m")
    return s.crossJoin(F.broadcast(nv)).select(
        "n_vertices",
        F.col("m").cast("long").alias("n_edges"),
        trunc6(
            (k * F.col("sxy") - F.col("sx") * F.col("sx")).cast("double")
            / (k * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Link prediction: Adamic–Adar over hub-capped wedges (round 8)
# ---------------------------------------------------------------------------

#: Wedge centers above this degree are excluded from Adamic–Adar
#: evidence: their 1/ln(d) weight is tiny BY THE MEASURE'S OWN DESIGN
#: while their d² wedge fan-out is what makes common-neighbor joins
#: quadratic — capping centers bounds candidate generation at
#: Σ_{d≤cap} d² ≤ cap·m (linear in edges) at any scale.
_AA_HUB_CAP = 64
_AA_TOPK = 20


@query(
    "graph_adamic_adar",
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), deg AS (
      SELECT n, count(*) AS d
      FROM (SELECT x AS n FROM e UNION ALL SELECT y AS n FROM e)
      GROUP BY n
    ), adj AS (
      SELECT x AS n, y AS nbr FROM e
      UNION ALL SELECT y AS n, x AS nbr FROM e
    ), ctr AS (
      SELECT a.n, a.nbr,
             CAST(floor(1000000000000.0 / ln(CAST(d.d AS DOUBLE)))
                  AS BIGINT) AS w_pico
      FROM adj a JOIN deg d ON d.n = a.n
      WHERE d.d BETWEEN 2 AND {_AA_HUB_CAP}
    ), wedges AS (
      SELECT a.nbr AS u, b.nbr AS v, a.w_pico
      FROM ctr a JOIN ctr b ON a.n = b.n AND a.nbr < b.nbr
    ), scored AS (
      SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(w_pico) AS BIGINT) AS s_pico
      FROM wedges GROUP BY u, v
    ), nonedge AS (
      SELECT s.* FROM scored s
      LEFT JOIN e ON e.x = s.u AND e.y = s.v
      WHERE e.x IS NULL
    )
    SELECT u, v, n_common,
           floor(CAST(s_pico AS DOUBLE) / 1000000000000.0
                 * 1000000.0) / 1000000.0 AS aa_score
    FROM nonedge
    ORDER BY s_pico DESC, u, v LIMIT {_AA_TOPK}
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the part co-purchase graph: top-20
    NON-adjacent pairs by Adamic–Adar score ``Σ over common neighbors
    w of 1/ln(d_w)`` with wedge centers hub-capped at degree 64 — the
    recommender/graph-completion primitive beside the descriptive
    graph battery (clustering coeff says how dense a neighborhood IS;
    this says which edge is most likely MISSING).

    The hub cap is the scale contract, and it is principled, not a
    shortcut: Adamic–Adar itself downweights high-degree common
    neighbors to ~0 (1/ln d), while their wedge fan-out d² is exactly
    what blows up common-neighbor joins — excluding centers above the
    cap bounds candidate generation at Σ over d≤cap of d² ≤ cap·m
    (linear in edges at every scale) and changes scores only by the
    discarded ≤1/ln(cap) per-hub dust. Per-wedge weights are pico-quantized
    integers before the per-pair sum (order-immune; ranking compares
    integers), and the top-k total order (score, u, v) is tie-free.

    Plan shape at 100 TB: edge derivation + degree count (two grouped
    aggregates), one self-join of the CAPPED adjacency on the center
    (the bounded wedge join), one pair-grouped sum, an anti-join
    against the edge list, TakeOrdered(k).
    """
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b_ = op.select("o", F.col("p").alias("v"))
    edges = (
        a.join(b_, "o")
        .where(F.col("u") < F.col("v"))
        .select(F.col("u").alias("x"), F.col("v").alias("y"))
        .distinct()
        .persist()
    )
    # Degree table, capped-center filter, and wedge generation fused
    # into ONE grouped collect + in-row pair explode (round 11, guide
    # §2.4): a node's degree IS the size of its sorted neighbor array
    # (edges are distinct), so the former deg aggregate + adj⋈deg join
    # + wedge self-join — four shuffles and two sorts — collapse to a
    # single exchange. The sorted array emits exactly the u < v pairs
    # the join kept, and the ≤ cap array size bounds the per-row
    # fan-out at C(cap, 2) just as the capped self-join did.
    adj = edges.select(F.col("x").alias("n"), F.col("y").alias("nbr")).unionAll(
        edges.select(F.col("y").alias("n"), F.col("x").alias("nbr"))
    )
    nbrs = adj.groupBy("n").agg(
        F.array_sort(F.collect_list("nbr")).alias("ns")
    )
    ctr = nbrs.where(
        (F.size("ns") >= 2) & (F.size("ns") <= _AA_HUB_CAP)
    )
    # the wedge weight is the CENTER's 1/ln(d) — identical for every
    # pair emitted from one center row, so it rides the explode
    wedges = ctr.select(
        F.floor(F.lit(1e12) / F.log(F.size("ns").cast("double")))
        .cast("long")
        .alias("w_pico"),
        F.explode(
            F.expr(
                "flatten(transform(ns, (x, i) -> "
                "transform(slice(ns, i + 2, size(ns) - i - 1), "
                "y -> struct(x AS u, y AS v))))"
            )
        ).alias("p"),
    ).select(F.col("p.u").alias("u"), F.col("p.v").alias("v"), "w_pico")
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("w_pico").cast("long").alias("s_pico"),
    )
    nonedge = scored.join(
        edges,
        (scored["u"] == edges["x"]) & (scored["v"] == edges["y"]),
        "left_anti",
    )
    return (
        nonedge.orderBy(F.col("s_pico").desc(), "u", "v")
        .limit(_AA_TOPK)
        .select(
            "u",
            "v",
            "n_common",
            trunc6(F.col("s_pico").cast("double") / F.lit(1e12)).alias(
                "aa_score"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Link prediction battery: Jaccard / common-neighbors / preferential
# attachment over the same hub-capped wedge join (round 9)
# ---------------------------------------------------------------------------

_LP_TOPK = 20


@query(
    "graph_link_prediction",
    oracle=f"""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), e AS (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), deg AS (
      SELECT n, count(*) AS d
      FROM (SELECT x AS n FROM e UNION ALL SELECT y AS n FROM e)
      GROUP BY n
    ), ctr AS (
      SELECT a.n, a.nbr
      FROM (SELECT x AS n, y AS nbr FROM e
            UNION ALL SELECT y AS n, x AS nbr FROM e) a
      JOIN deg d ON d.n = a.n
      WHERE d.d BETWEEN 2 AND {_AA_HUB_CAP}
    ), scored AS (
      SELECT a.nbr AS u, b.nbr AS v, CAST(count(*) AS BIGINT) AS n_common
      FROM ctr a JOIN ctr b ON a.n = b.n AND a.nbr < b.nbr
      GROUP BY u, v
    ), nonedge AS (
      SELECT s.u, s.v, s.n_common,
             du.d AS deg_u, dv.d AS deg_v,
             CAST(floor(CAST(s.n_common AS DOUBLE) * 1000000000000.0
                        / CAST(du.d + dv.d - s.n_common AS DOUBLE))
                  AS BIGINT) AS jac_pico
      FROM scored s
      JOIN deg du ON du.n = s.u
      JOIN deg dv ON dv.n = s.v
      LEFT JOIN e ON e.x = s.u AND e.y = s.v
      WHERE e.x IS NULL
    )
    SELECT u, v, n_common,
           CAST(deg_u AS BIGINT) AS deg_u, CAST(deg_v AS BIGINT) AS deg_v,
           floor(CAST(jac_pico AS DOUBLE) / 1000000000000.0
                 * 1000000.0) / 1000000.0 AS jaccard,
           CAST(deg_u AS BIGINT) * CAST(deg_v AS BIGINT) AS pref_attach
    FROM nonedge
    ORDER BY jac_pico DESC, u, v LIMIT {_LP_TOPK}
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction battery over the part co-purchase graph: the
    top-20 NON-adjacent pairs by Jaccard coefficient
    ``|N(u)∩N(v)| / |N(u)∪N(v)|``, reported beside the raw
    common-neighbor count and the preferential-attachment product
    ``d_u·d_v`` — the three classical unsupervised predictors
    (Liben-Nowell & Kleinberg) on ``graph_adamic_adar``'s graph, so a
    user can compare rankings across measures on identical candidates.

    Candidate generation shares the Adamic–Adar hub cap: wedges form
    only through centers with degree ≤ 64, bounding the self-join at
    Σ_{{d≤cap}} d² ≤ cap·m (linear in edges at any scale). The Jaccard
    DENOMINATOR uses FULL endpoint degrees (the union size is exact;
    only the common-neighbor evidence is center-capped — same contract
    as Adamic–Adar, documented, conservative). Ranking compares the
    pico-quantized integer ratio; (u, v) breaks ties totally.

    Plan shape at 100 TB: the edge/degree aggregates, ONE capped wedge
    self-join, a pair-grouped count, two degree joins (shuffle joins on
    vertex id), an anti-join against the edge list, TakeOrdered(k).
    """
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b_ = op.select("o", F.col("p").alias("v"))
    edges = (
        a.join(b_, "o")
        .where(F.col("u") < F.col("v"))
        .select(F.col("u").alias("x"), F.col("v").alias("y"))
        .distinct()
        .persist()
    )
    # Same round-11 fusion as graph_adamic_adar: ONE grouped collect
    # replaces the deg aggregate + adj⋈deg join + wedge self-join
    # (guide §2.4); degree = size of the sorted neighbor array, the
    # sorted array emits the u < v pairs directly, and the FULL-degree
    # table both Jaccard denominators need is a projection of the same
    # persisted aggregate rather than a second grouped pass.
    adj = edges.select(
        F.col("x").alias("n"), F.col("y").alias("nbr")
    ).unionAll(edges.select(F.col("y").alias("n"), F.col("x").alias("nbr")))
    nbrs = (
        adj.groupBy("n")
        .agg(F.array_sort(F.collect_list("nbr")).alias("ns"))
        .persist()
    )
    deg = nbrs.select("n", F.size("ns").cast("long").alias("d"))
    ctr = nbrs.where(
        (F.size("ns") >= 2) & (F.size("ns") <= _AA_HUB_CAP)
    )
    scored = (
        ctr.select(
            F.explode(
                F.expr(
                    "flatten(transform(ns, (x, i) -> "
                    "transform(slice(ns, i + 2, size(ns) - i - 1), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("p")
        )
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("deg_u"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("deg_v"))
    cand = scored.join(du, "u").join(dv, "v")
    nonedge = cand.join(
        edges,
        (cand["u"] == edges["x"]) & (cand["v"] == edges["y"]),
        "left_anti",
    )
    jac_pico = F.floor(
        F.col("n_common").cast("double")
        * F.lit(1e12)
        / (F.col("deg_u") + F.col("deg_v") - F.col("n_common")).cast(
            "double"
        )
    ).cast("long")
    return (
        nonedge.withColumn("jac_pico", jac_pico)
        .orderBy(F.col("jac_pico").desc(), "u", "v")
        .limit(_LP_TOPK)
        .select(
            "u",
            "v",
            "n_common",
            F.col("deg_u").cast("long").alias("deg_u"),
            F.col("deg_v").cast("long").alias("deg_v"),
            trunc6(F.col("jac_pico").cast("double") / F.lit(1e12)).alias(
                "jaccard"
            ),
            (
                F.col("deg_u").cast("long") * F.col("deg_v").cast("long")
            ).alias("pref_attach"),
        )
    )


# ---------------------------------------------------------------------------
# round 10: connected components, Good–Turing smoothing, compaction plan
# ---------------------------------------------------------------------------


@query(
    "graph_connected_components",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), edges AS (
      SELECT DISTINCT a.p AS x, b.p AS y
      FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
    ), adj AS (
      SELECT x AS a, y AS b FROM edges
      UNION ALL SELECT y, x FROM edges
    ), seeds AS (
      -- seed the flood only from LOCAL MINIMA: each component's global
      -- min is one, floods the whole component (always < any target
      -- node, so the l < a prune never stops it), and non-minimal
      -- seeds prune fast — 13x faster than all-node seeding, same
      -- fixpoint
      SELECT a.a AS n FROM adj a GROUP BY a.a HAVING a.a < min(a.b)
    ), lbl AS (
      WITH RECURSIVE reach(n, l) AS (
        SELECT n, n FROM seeds
        UNION
        SELECT e.a, r.l FROM reach r JOIN adj e ON e.b = r.n
        WHERE r.l < e.a
      )
      SELECT n, min(l) AS comp FROM reach GROUP BY n
    )
    SELECT comp AS comp_id, CAST(count(*) AS BIGINT) AS size
    FROM lbl GROUP BY comp
    ORDER BY size DESC, comp_id LIMIT 10
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the part co-purchase graph by min-label
    propagation to FIXPOINT: every node's label converges to the
    smallest node id reachable from it, so components get canonical
    ids with no arbitrary tie-breaks. Output: the 10 largest
    components (size desc, id asc) — the missing classic beside
    pagerank/k-core/triangles in this registry, and the curation
    primitive behind "keep one crawl seed per mirror cluster".

    The min-label fixpoint IS connected components with min-id
    canonical labels — the exact contract
    ``operators.graph.connected_components`` (dedup_resolve's CC
    engine) already delivers, so this query calls the shared operator
    instead of running a bespoke hash-min driver loop (round-10
    optimization, guide §2.4/§1.2: the loop spent 8.2s/sf0.1 in
    per-round localCheckpoint + convergence-count jobs; the shared
    path's per-partition union-find contraction collapses all locally
    visible structure in ONE pass, and the alternating-star rounds —
    the 100 TB-hardened code path tests pin for dedup_resolve — only
    merge cross-partition structure). Same fixpoint, same labels.

    Oracle: a recursive CTE propagates labels with the ``l < node``
    prune and takes per-node minima — the same fixpoint.
    """
    from speech_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = op.select("o", F.col("p").alias("u"))
    b_ = op.select("o", F.col("p").alias("v"))
    edges = (
        a.join(b_, "o")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    comp = connected_components(edges, src="u", dst="v")
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("size"))
        .select(F.col("component").alias("comp_id"), "size")
        .orderBy(F.col("size").desc(), "comp_id")
        .limit(10)
    )


@query(
    "lm_good_turing",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS w
      FROM documents
    ), cnt AS (
      SELECT w, CAST(count(*) AS BIGINT) AS r FROM toks GROUP BY w
    ), nr AS (
      SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM cnt GROUP BY r
    ), tot AS (
      SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
             CAST(sum(n_r) AS BIGINT) AS vocab
      FROM nr
    )
    SELECT a.r, a.n_r,
           CASE WHEN b.n_r IS NULL THEN 0.0
                ELSE floor(CAST((a.r + 1) * b.n_r AS DOUBLE)
                           / CAST(a.n_r AS DOUBLE) * 1000000.0)
                     / 1000000.0 END AS r_star,
           t.n_tokens, t.vocab,
           floor(coalesce((SELECT CAST(n_r AS DOUBLE) FROM nr WHERE r = 1),
                          0.0)
                 / CAST(t.n_tokens AS DOUBLE) * 1000000.0) / 1000000.0
             AS p0_mass
    FROM (SELECT r, n_r FROM nr ORDER BY r LIMIT 10) a
    LEFT JOIN nr b ON b.r = a.r + 1
    CROSS JOIN tot t
    ORDER BY a.r
    """,
)
def lm_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing frequency smoothing table over corpus unigrams:
    count-of-counts ``N_r``, the Turing-discounted adjusted counts
    ``r* = (r+1)·N_{r+1}/N_r`` for the 10 SMALLEST observed counts
    (the low-count head is where GT correction matters; 0 where
    ``N_{r+1}`` is empty, per the standard cutoff before Simple-GT
    regression), and
    the unseen-mass estimate ``p₀ = N₁/N`` (0 when no hapaxes exist,
    as on saturated synthetic vocabularies) — the smoothing family
    Kneser–Ney descends from (companion of ``lm_kneser_ney_xent``),
    and the vocabulary-health report a tokenizer-training pipeline
    reads before fixing a vocab size.

    Exactness: everything up to r* is integer counting; r* and p₀ are
    single float ratios of exact integers.

    Plan shape at 100 TB: explode → two nested grouped counts (first
    vocabulary-bounded, then count-of-count-bounded ≤ max r) — the
    canonical two-level aggregation; the final join is over the tiny
    N_r table.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit("([a-z]+)"), 1
            )
        ).alias("w")
    )
    cnt = toks.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("r"))
    nr = cnt.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    tot = nr.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens"),
        F.sum("n_r").cast("long").alias("vocab"),
    )
    n1 = nr.agg(
        F.coalesce(
            F.sum(F.when(F.col("r") == 1, F.col("n_r"))), F.lit(0)
        )
        .cast("double")
        .alias("n1")
    )
    b = nr.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next")
    )
    return (
        nr.orderBy("r")
        .limit(10)
        .join(F.broadcast(b), "r", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            "n_r",
            F.when(F.col("n_r_next").isNull(), F.lit(0.0))
            .otherwise(
                trunc6(
                    ((F.col("r") + 1) * F.col("n_r_next")).cast("double")
                    / F.col("n_r").cast("double")
                )
            )
            .alias("r_star"),
            "n_tokens",
            "vocab",
            trunc6(
                F.col("n1") / F.col("n_tokens").cast("double")
            ).alias("p0_mass"),
        )
        .orderBy("r")
    )


#: compaction-plan target bin capacity (chars stand in for bytes on
#: the synthetic corpus; the shape is Spark's maxPartitionBytes
#: split packing)
_COMPACT_BIN = 65536


@query(
    "infra_compaction_plan",
    oracle=f"""
    WITH offs AS (
      SELECT source, n_chars,
             coalesce(sum(n_chars) OVER (PARTITION BY source
                 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM documents
    ), binned AS (
      SELECT source, n_chars, cum_before // {_COMPACT_BIN} AS bin_id
      FROM offs
    ), perbin AS (
      SELECT source, bin_id, CAST(count(*) AS BIGINT) AS n_files,
             CAST(sum(n_chars) AS BIGINT) AS bin_chars
      FROM binned GROUP BY source, bin_id
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(n_files) AS BIGINT) AS n_files,
           CAST(sum(bin_chars) AS BIGINT) AS total_chars,
           CAST(max(bin_chars) AS BIGINT) AS max_bin_chars,
           floor(CAST(sum(bin_chars) AS DOUBLE)
                 / (CAST(count(*) AS DOUBLE) * {_COMPACT_BIN}.0)
                 * 1000000.0) / 1000000.0 AS avg_fill
    FROM perbin GROUP BY source ORDER BY source
    """,
)
def infra_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction manifest: pack each source's documents
    (ordered by doc_id, sizes = n_chars) into target bins of 64 KiB by
    CUMULATIVE-OFFSET assignment ``bin = floor(cum_before / C)`` —
    exactly how Spark's ``maxPartitionBytes`` packs input splits, so
    the plan's fill statistics predict the scan parallelism a
    compacted layout would get. Output per source: bin count, file
    count, bytes, worst bin, average fill ratio — the table-maintenance
    report every lakehouse compaction job prints.

    Exactness: pure integer prefix sums and divisions; the fill ratio
    is one float ratio of exact integers.

    Plan shape at 100 TB: one per-source ordered prefix-sum window
    (range-partitioned by the shuffle on source boundaries — same
    shape as the shard manifests), then two grouped integer
    aggregates; output bounded by the source vocabulary.
    """
    d = load_table(spark, sf_dir, "documents")
    w_prev = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = d.select(
        "source",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w_prev), F.lit(0)).alias(
            "cum_before"
        ),
    )
    binned = offs.select(
        "source",
        "n_chars",
        F.expr(f"cum_before div {_COMPACT_BIN}").alias("bin_id"),
    )
    perbin = binned.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_chars").cast("long").alias("bin_chars"),
    )
    return (
        perbin.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.sum("n_files").cast("long").alias("n_files"),
            F.sum("bin_chars").cast("long").alias("total_chars"),
            F.max("bin_chars").cast("long").alias("max_bin_chars"),
            trunc6(
                F.sum("bin_chars").cast("double")
                / (
                    F.count(F.lit(1)).cast("double")
                    * F.lit(float(_COMPACT_BIN))
                )
            ).alias("avg_fill"),
        )
        .orderBy("source")
    )
