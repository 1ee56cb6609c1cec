"""Deduplication operators over a document corpus.

Four families, each shaped for 100 TB execution:

- **Exact** (`exact_dedup`): hash-groupBy on a content digest. One
  shuffle on the digest; at scale this is the cheapest possible dedup
  and the digest doubles as the canonical document key.

- **MinHash + LSH** (`minhash_signatures`, `lsh_candidate_pairs`,
  `minhash_dedup_pairs`): shingle → k minhashes → band → bucket-join.
  Candidate generation is an equi-join on ``(band_idx, band_hash)`` —
  the only quadratic work happens *within* a bucket, which is the whole
  point of LSH. One MD5 per distinct shingle provides a 28-bit base
  hash; k seeded affine families ``(a_i*h + b_i) mod p`` derive the
  signature — deterministic and portable to any SQL oracle (no
  engine-specific hash functions).

- **SimHash** (`simhash64`): 60-bit sign-aggregated token-hash
  fingerprint; near-dup candidates differ in few bits. Expressed as
  explode(token)×explode(bit) + groupBy-sum — the canonical map-reduce
  simhash, no UDF.

- **N-gram Jaccard** (`ngram_jaccard_pairs`): exact Jaccard on char
  shingle sets for candidate pairs (use after LSH blocking at scale;
  the all-pairs-within-block form here takes any blocking column).

Embedding-cosine near-dup lives in ``similarity.py`` (same candidate
mechanics over vectors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from speech_data_pipeline_spark.operators.text import char_shingles, word_ngrams
from speech_data_pipeline_spark.functions import trunc6


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition iff the input has fewer partitions than the cluster
    has cores.

    A small corpus in one parquet row group scans as ONE partition, so
    every expensive per-row expression downstream (md5 per shingle)
    would run single-threaded. At real scale the scan already has
    thousands of partitions and this is a no-op — the guard costs one
    plan-to-RDD translation, no job.
    """
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical content; keep the minimum id as canonical.

    Returns ``(content_md5, canonical_id, n_copies)`` — one row per
    distinct content. Join back on the digest to tag or drop copies.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


#: DuckDB CTE body of :func:`exact_collapse_reps` — keep the two in
#: lock-step (the _TWO_SAMPLE_CTE shared-fragment convention).
EXACT_COLLAPSE_SQL = (
    "SELECT min(doc_id) AS doc_id, min(text) AS text"
    " FROM documents GROUP BY md5(text)"
)


def exact_collapse_reps(
    df: "DataFrame", id_col: str = "doc_id", text_col: str = "text"
) -> "DataFrame":
    """Exact-collapse identical texts to a min-id representative row —
    the pre-step every pair-generating near-dup operator shares
    (minhash collapsed pairs, all-pairs prefix, winnow pairs): a
    byte-identical mega-cluster costs ONE node instead of cluster²
    pairs, and within-cluster duplicate pairs remain exact-dedup's
    output. ONE definition (+ :data:`EXACT_COLLAPSE_SQL` for oracles)
    so the collapse key cannot drift between call sites."""
    return df.groupBy(F.md5(text_col).alias("_dig")).agg(
        F.min(id_col).alias(id_col), F.min(text_col).alias(text_col)
    )


#: Modulus for the affine minhash families: largest prime < 2^28. Base
#: hashes are 28-bit, coefficients < p, so a*h + b < 2^56 — no signed-64
#: overflow in any SQL engine.
MINHASH_P = 268435399


def minhash_coeffs(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the k affine hash families."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P)) for _ in range(k)
    ]


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    shingle_len: int = 5,
    include_base: bool = False,
) -> DataFrame:
    """Per-document k-wide MinHash signature.

    One MD5 per distinct shingle (the expensive part), reduced to a
    28-bit base hash; the k families are cheap affine maps
    ``(a_i*h + b_i) mod p`` over the base hashes — the classic
    universal-hashing construction, and ~k× less hashing than
    rehashing every shingle per family. All column algebra: the
    shingle array never leaves its row, no shuffle until someone
    groups. With ``include_base`` the distinct shingle-hash array
    ``hs`` is kept beside the signature (the estimate-accuracy audit
    needs both to compare estimated vs exact Jaccard).
    """
    sh = F.array_distinct(char_shingles(F.col(text_col), shingle_len))
    base = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")
    )
    coeffs = minhash_coeffs(k)
    with_base = df.select(F.col(id_col).alias("id"), base.alias("hs"))

    def affine(a: int, b: int):
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)

    sig = F.array(
        *[F.array_min(F.transform(F.col("hs"), affine(a, b))) for a, b in coeffs]
    )
    if include_base:
        return with_base.select("id", "hs", sig.alias("sig"))
    return with_base.select("id", sig.alias("sig"))


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing >= 1 band.

    Scale shape: explode to ``bands`` rows per doc, shuffle once on
    ``(band_idx, band_hash)``, self-join within buckets, distinct-pair
    dedup. Returns ``(id_a, id_b)`` with ``id_a < id_b``.
    """
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col("sig")[b * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    shingle_len: int = 5,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end MinHash near-dup: candidates + estimated Jaccard filter.

    Estimated Jaccard = fraction of equal signature positions. Returns
    ``(id_a, id_b, est_jaccard)`` for pairs >= ``threshold``.

    Scale shape (round-2 rework after profiling): the expensive
    shingle→MD5→signature subtree is materialized ONCE (persisted; on a
    real cluster this is the signature table you'd write to storage),
    the band self-join carries only lean ``(id, band_idx, band_hash)``
    rows — no k-element array duplicated 2 × bands times through the
    shuffle — and the two signatures are attached after pair dedup via
    joins against the compact persisted sig table. Three narrow
    shuffles on small relations instead of one wide shuffle carrying
    the signature payload through the explode.
    """
    rows_per_band = k // bands
    sigs = minhash_signatures(
        _ensure_parallelism(df), id_col, text_col, k, shingle_len
    ).persist()
    # banding + bucket self-join: ONE definition (lsh_candidate_pairs)
    # shared with the standalone candidate generator
    pairs = lsh_candidate_pairs(sigs, bands, rows_per_band).select(
        "id_a", "id_b"
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(k))
    )
    return (
        pairs.join(
            sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
        .withColumn("est_jaccard", trunc6(est))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def minhash_dedup_pairs_collapsed(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_scores: bool = False,
    **mh_kwargs,
) -> DataFrame:
    """:func:`minhash_dedup_pairs` behind an EXACT-duplicate collapse —
    the production composition for corpora with mega-clusters of
    byte-identical documents (boilerplate, mirrored pages): a C-member
    identical-text cluster would land in one LSH bucket and emit C²/2
    pairs (the 20%-hot-cluster stress set put 9 781 copies on one seed
    → ~48 M pairs feeding connected components). Here each digest
    group collapses to its min-id representative first, MinHash runs
    on representatives only, and members link to their representative
    with one edge each — pairs are linear in the corpus again.

    Returns ``(id_a, id_b)`` — or ``(id_a, id_b, est_jaccard)`` when
    ``with_scores`` is set, where representative pairs carry the
    MinHash estimate and member→rep star links carry exactly 1.0
    (identical text ⇒ identical signatures ⇒ all k positions equal).
    CLOSURE-EQUIVALENT to the uncollapsed pair list by construction:
    identical texts have identical signatures, so (a) every
    within-group pair was a candidate with est_jaccard 1 — the
    member→rep star closes the same component — and (b) any
    cross-group candidate pair (a, b) has the same bands and estimate
    as (rep_a, rep_b), which is emitted instead. The dedup_resolve
    oracle (full uncollapsed replay + recursive closure) stays green
    on top of this operator.
    """
    # persisted: the full-text md5 pass feeds BOTH the group table and
    # the member links — without the persist each subtree re-scans the
    # corpus and re-hashes every document (same rule as the sigs
    # persist in minhash_dedup_pairs)
    digests = df.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("_dg")
    ).persist()
    groups = digests.groupBy("_dg").agg(F.min("id").alias("rep")).persist()
    reps = df.join(
        groups.select(F.col("rep").alias(id_col)).distinct(), id_col, "inner"
    )
    rep_pairs = minhash_dedup_pairs(reps, id_col, text_col, **mh_kwargs)
    links = (
        digests.join(groups, "_dg")
        .where(F.col("id") != F.col("rep"))
        .select(F.col("id").alias("id_a"), F.col("rep").alias("id_b"))
    )
    if with_scores:
        return rep_pairs.unionByName(
            links.withColumn("est_jaccard", F.lit(1.0))
        )
    return rep_pairs.select("id_a", "id_b").unionByName(links)


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60
) -> DataFrame:
    """SimHash fingerprint from whitespace tokens (<= 60 bits for
    portable signed-64 arithmetic).

    Token hash = first 15 hex chars of MD5 → 60-bit integer. Bit ``j``
    of the fingerprint is 1 iff more token hashes have bit ``j`` set
    than unset. Map-reduce shape: explode(token) × explode(bit) →
    groupBy(doc, bit) → sum(sign) → re-assemble.

    Contract: documents with NO tokens (empty/whitespace text) emit no
    row — consumers that must keep every document left-join this table
    and treat a missing fingerprint as "no content to compare".
    """
    from speech_data_pipeline_spark.operators.text import tokens

    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
    ).withColumn(
        "h", F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long")
    )
    bit = tok.select(
        "id",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
    ).withColumn(
        "vote",
        F.when(F.expr("shiftright(h, cast(j as int)) % 2") == 1, 1).otherwise(-1),
    )
    return (
        bit.groupBy("id", "j")
        .agg(F.sum("vote").alias("v"))
        .withColumn(
            "bitval",
            F.when(
                F.col("v") > 0,
                F.expr("shiftleft(cast(1 as bigint), cast(j as int))"),
            ).otherwise(F.lit(0).cast("long")),
        )
        .groupBy("id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 8,
    threshold: float = 0.2,
    max_df: int = 20,
) -> DataFrame:
    """Jaccard over *rare* char-shingle sets for pairs within a block.

    ``|A ∩ B| / |A ∪ B|`` via explode + equi-join on ``(block,
    shingle)`` + groupBy-count — never materializes the cross product,
    only co-occurring shingles shuffle. Shingles occurring in more than
    ``max_df`` documents of a block are dropped first (stop-shingle
    removal): they carry no similarity signal but quadratic join cost —
    the measured difference on the test corpus is a 566M-row join vs
    1.2M. Near-duplicate pairs share their *rare* shingles, so the
    filter preserves them while bounding worst-case skew; this is the
    property that keeps the operator viable at 100 TB.

    Returns ``(id_a, id_b, jaccard)`` above ``threshold``.
    """
    from pyspark.sql import Window

    df = _ensure_parallelism(df)
    all_sh = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(char_shingles(F.col(text_col), shingle_len))
        ).alias("shingle"),
    )
    # Document frequency as a window count over (blk, shingle): one
    # shuffle, no re-join against a grouped aggregate, and the shingle
    # explode is evaluated once instead of twice. A second window over
    # id attaches each document's rare-shingle count to every row, so
    # the pair join carries both set sizes and no size-lookup joins are
    # needed afterwards.
    w_df = Window.partitionBy("blk", "shingle")
    w_id = Window.partitionBy("id")
    sh = (
        all_sh.withColumn("_df", F.count(F.lit(1)).over(w_df))
        .where(F.col("_df") <= max_df)
        .withColumn("n_sh", F.count(F.lit(1)).over(w_id))
        .select("blk", "id", "shingle", "n_sh")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .withColumn(
            "jaccard",
            trunc6(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _span_token_base(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, t, n_toks)`` word-token table shared by the substring-span
    operators: lowercase ``[a-z]+`` runs, exactly the tokenizer the
    DuckDB oracles replay."""
    t = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("([a-z]+)"), 1)
    return df.select(F.col(id_col).alias("id"), t.alias("t")).select(
        "id", "t", F.size("t").alias("n_toks")
    )


def _dup_gram_positions(base: DataFrame, n: int, min_count: int) -> DataFrame:
    """``(id, pos)`` of every word ``n``-gram start whose gram occurs
    ``min_count``+ times corpus-wide (1-based ``pos``). Grams are
    hashed IN-ROW to 60-bit md5-prefix bigints before the explode, so
    the one gram-key shuffle carries bigints, never gram strings; the
    occurrence count is a window over that same key (no second scan)."""
    grams = base.select(
        "id",
        F.posexplode(
            F.transform(
                # sequence(1, 0) would run DESCENDING in Spark — guard
                # short docs to an explicit empty start list.
                F.when(
                    F.size("t") >= n,
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.conv(
                    F.substring(
                        F.md5(F.concat_ws(" ", F.slice(F.col("t"), i, n))), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
            )
        ).alias("p0", "gh"),
    ).select("id", (F.col("p0") + 1).alias("pos"), "gh")
    w_g = Window.partitionBy("gh")
    return (
        grams.withColumn("_c", F.count(F.lit(1)).over(w_g))
        .where(F.col("_c") >= min_count)
        .select("id", "pos")
    )


def duplicated_span_stats(
    df: DataFrame,
    n: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-span dedup statistics (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", arXiv
    2107.06499 — the word-gram bounded variant).

    A word ``n``-gram is *duplicated* when it occurs ``min_count``+
    times across the corpus (cross-document copies AND in-document
    repeats both count). Per document this reports how much of the
    text sits inside duplicated spans:

    - ``n_dup_grams`` — duplicated gram occurrences in the doc;
    - ``n_dup_spans`` — maximal merged spans (consecutive duplicated
      gram starts ≤ ``n`` apart fuse into one span);
    - ``dup_tok_frac`` — fraction of tokens covered by those spans.

    Plan shape (scales): grams are built IN-ROW (``transform`` over a
    ``sequence`` of start offsets — no corpus-width explode before
    hashing), then explode to ``(doc, pos, gram_hash)`` where the hash
    is the 60-bit md5 prefix — the shuffle carries a bigint, never the
    gram string. One groupBy counts occurrences (map-side partial
    combine); duplicated hashes flow back through a window count over
    the same key (no second scan); span merging is a per-document
    ``lag`` window: covered tokens = Σ min(pos - prev_pos, n), span
    starts where the gap exceeds ``n``. Two shuffles total (gram hash,
    then doc id) — at 100 TB both are plain hash exchanges with no
    skew beyond natural gram popularity, which ``min_count`` filtering
    happens after (a stop-gram ``max_df`` cap like ngram_jaccard's
    could bound it; popularity only inflates the count stage here, not
    a join).

    Cross-engine determinism: gram hash = md5 prefix (exact in DuckDB
    via nibble folding), all arithmetic integer, final fraction
    trunc6.
    """
    base = _span_token_base(df, id_col, text_col)
    dup = _dup_gram_positions(base, n, min_count)
    w_d = Window.partitionBy("id").orderBy("pos")
    spans = (
        dup.withColumn("prev", F.lag("pos").over(w_d))
        .select(
            "id",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > n),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("is_start"),
            F.when(
                F.col("prev").isNull(), F.lit(n).cast("long")
            )
            .otherwise(F.least(F.col("pos") - F.col("prev"), F.lit(n)).cast("long"))
            .alias("covered"),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_grams"),
            F.sum("is_start").alias("n_dup_spans"),
            F.sum("covered").alias("_cov"),
        )
    )
    return (
        base.select("id", "n_toks")
        .join(spans, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_toks",
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            trunc6(
                F.when(
                    F.col("n_toks") > 0,
                    F.coalesce(F.col("_cov"), F.lit(0)) / F.col("n_toks"),
                ).otherwise(F.lit(0.0))
            ).alias("dup_tok_frac"),
        )
    )


def duplicated_span_clean(
    df: DataFrame,
    n: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-span EXCISION (the production half of Lee et
    al. 2021: :func:`duplicated_span_stats` measures, this one
    removes). Every token covered by a duplicated merged span is cut
    and the survivors re-joined with single spaces.

    Output: ``(id_col, n_toks, n_removed, clean_text)`` — one row per
    input document; ``n_removed`` is the covered-token count (so
    cleaned length = ``n_toks - n_removed``).

    Plan shape (scales): shares :func:`_dup_gram_positions`' two
    shuffles (gram hash, then doc id). Span merging is the same lag
    window; covered indexes come from exploding each merged span's
    ``sequence(start, end)`` — spans are disjoint by construction
    (merge rule gap > ``n`` ⇒ next start ≥ prev end + 2), so the
    explode emits every removed index exactly once, Σ ≤ corpus
    tokens. The per-document removal set is re-collected as a MAP and
    each token probes it O(1) (an ``array_contains`` per token would
    be O(removed) per token — quadratic on a fully-duplicated doc).
    Collected arrays are per-document-sized, the same row-width
    contract as the source text column itself.
    """
    base = _span_token_base(df, id_col, text_col)
    dup = _dup_gram_positions(base, n, min_count)
    w_d = Window.partitionBy("id").orderBy("pos")
    spans = (
        dup.withColumn("prev", F.lag("pos").over(w_d))
        .withColumn(
            "is_start",
            F.when(
                F.col("prev").isNull() | (F.col("pos") - F.col("prev") > n),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("sid", F.sum("is_start").over(w_d))
        .groupBy("id", "sid")
        .agg(
            F.min("pos").alias("s"),
            (F.max("pos") + (n - 1)).alias("e"),
        )
    )
    rm = (
        spans.select("id", F.explode(F.sequence("s", "e")).alias("idx"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_removed"),
            F.map_from_arrays(
                F.collect_list("idx"),
                F.transform(F.collect_list("idx"), lambda _: F.lit(True)),
            ).alias("rmm"),
        )
    )
    return (
        base.join(rm, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_toks",
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            F.concat_ws(
                " ",
                F.filter(
                    "t",
                    lambda x, i: F.element_at(
                        F.coalesce(
                            F.col("rmm"), F.expr("map()").cast("map<int,boolean>")
                        ),
                        i + 1,
                    ).isNull(),
                ),
            ).alias("clean_text"),
        )
    )


def allpairs_prefix_cosine(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    t2_num: int = 49,
    t2_den: int = 100,
    ngram_n: int = 1,
) -> DataFrame:
    """All-pairs binary-cosine similarity join with PREFIX FILTERING
    (Bayardo/Ma/Srikant, WWW'07; prefix bound as in ppjoin): emit
    every document pair whose distinct feature sets (words, or word
    ``ngram_n``-grams for a discriminative feature space) satisfy
    ``cos = |A∩B|/√(|A||B|) ≥ t`` with ``t² = t2_num/t2_den`` —
    WITHOUT the O(n²) cross product and without MinHash's
    approximation.

    Completeness argument (exact integers throughout):
    - size filter: cos ≥ t ⇒ overlap ≥ t√(na·nb) and overlap ≤
      min(na,nb) ⇒ t²·max ≤ min, enforced as
      ``t2_num·na ≤ t2_den·nb ∧ t2_num·nb ≤ t2_den·na``;
    - prefix: under the global (df, token) order, if the pair's FIRST
      shared token sat beyond either prefix of length
      ``n − ⌈t²n⌉ + 1`` the remaining suffix (< ⌈t²n⌉ tokens) could
      not reach the required overlap ≥ ⌈t²n⌉ — so prefixes of both
      docs contain that same token and the prefix-prefix equi-join is
      complete. ``⌈t²n⌉`` is computed as the exact integer
      ``(t2_num·n + t2_den − 1) div t2_den`` (float ceil of 0.49·n
      can over-round and silently shorten the prefix).

    - POSITIONAL filter (the ppjoin upgrade, Xiao/Wang/Lin/Yu
      WWW'08): each prefix token carries its 1-based position in the
      globally-ordered set. Both sets are sorted by the SAME total
      (df, token) order, so shared tokens appear in the same relative
      order in both docs — which makes the pair's minimal-position
      prefix collision its true FIRST shared token (any earlier shared
      token would sit before it in both orders, hence inside both
      prefixes, hence be an earlier collision). At that first match
      (i, j) the overlap is bounded by ``1 + min(na−i, nb−j)`` (the
      match itself plus the shorter remaining suffix), so candidates
      with ``(1 + min(na−i, nb−j))² · t2_den < t2_num·na·nb`` are
      pruned BEFORE the verify joins — exactness untouched, candidate
      constant cut.

    100 TB shape: candidates meet ONLY through a shared prefix-token
    equi-join (rarest-first ordering keeps prefix tokens low-df);
    the pair-dedup groupBy doubles as the positional-filter argmin
    (min position per side — co-minimal at the first collision);
    verification re-joins the surviving candidate ids against the
    per-doc token arrays (two hash joins on id — the arrays are NOT
    carried through the prefix explode) and computes the overlap
    IN-ROW via array_intersect. Nothing quadratic ever materializes
    beyond the size-and-position-filtered candidate set.
    """
    features = (
        word_ngrams(F.col(text_col), ngram_n)
        if ngram_n > 1
        else F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("([a-z]+)"), 1
        )
    )
    df = _ensure_parallelism(df)
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(features)).alias("token"),
    )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ranked = tok.join(dfreq, "token")
    sets = ranked.groupBy("id").agg(
        F.sort_array(
            F.collect_list(F.struct("df", "token"))
        ).alias("ord"),
        F.count(F.lit(1)).alias("n"),
    )
    # exact ceil(t2*n) and prefix length — pure integer `div`, never
    # double division (float floor can over-round and shorten the
    # prefix past 2^53)
    alpha = F.expr(f"(n * {t2_num} + {t2_den - 1}) div {t2_den}")
    plen = (F.col("n") - alpha + 1).cast("int")
    prefix = sets.select(
        "id",
        "n",
        F.posexplode(
            F.transform(
                F.slice(F.col("ord"), F.lit(1), plen),
                lambda s: s.getField("token"),
            )
        ).alias("pos0", "token"),
    ).withColumn("pos", (F.col("pos0") + 1).cast("long")).drop("pos0")
    a = prefix.alias("a")
    b = prefix.alias("b")
    # per-collision positional residual: bound = 1 + min(remaining_a,
    # remaining_b) at THIS collision. Valid to filter every collision
    # row by its own bound: the FIRST collision of a true pair has
    # bound >= true overlap >= minoverlap, so at least one collision
    # row per true pair always survives (completeness), while
    # hopeless collision rows never reach the pair-dedup shuffle
    pos_ub = F.lit(1) + F.least(
        F.col("a.n") - F.col("a.pos"), F.col("b.n") - F.col("b.pos")
    )
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.n") * t2_num <= F.col("b.n") * t2_den)
            & (F.col("b.n") * t2_num <= F.col("a.n") * t2_den)
            & (
                pos_ub * pos_ub * t2_den
                >= F.lit(t2_num) * F.col("a.n") * F.col("b.n")
            ),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(
            # first prefix collision = first shared token (co-minimal
            # positions under the shared total order) — the pair-dedup
            # groupBy computes the positional bound for free
            F.min("a.pos").alias("ia"),
            F.min("b.pos").alias("ib"),
            F.first(F.col("a.n")).alias("pna"),
            F.first(F.col("b.n")).alias("pnb"),
        )
        .withColumn(
            "ub",
            F.lit(1)
            + F.least(
                F.col("pna") - F.col("ia"), F.col("pnb") - F.col("ib")
            ),
        )
        # ppjoin positional prune: max reachable overlap below the
        # pair's exact integer minoverlap — never a true pair
        .where(
            F.col("ub") * F.col("ub") * t2_den
            >= F.lit(t2_num) * F.col("pna") * F.col("pnb")
        )
        .select("id_a", "id_b")
    )
    arrs = sets.select(
        "id",
        F.transform(F.col("ord"), lambda s: s.getField("token")).alias(
            "arr"
        ),
        "n",
    )
    sa = arrs.select(
        F.col("id").alias("id_a"),
        F.col("arr").alias("arr_a"),
        F.col("n").alias("na"),
    )
    sb = arrs.select(
        F.col("id").alias("id_b"),
        F.col("arr").alias("arr_b"),
        F.col("n").alias("nb"),
    )
    ver = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "ov", F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
        )
        .where(
            F.col("ov") * F.col("ov") * t2_den
            >= F.lit(t2_num) * F.col("na") * F.col("nb")
        )
    )
    return ver.select(
        "id_a",
        "id_b",
        F.col("ov").alias("n_overlap"),
        trunc6(
            F.col("ov").cast("double")
            / F.sqrt(
                F.col("na").cast("double") * F.col("nb").cast("double")
            )
        ).alias("cosine"),
    )


def allpairs_blocked_cosine(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    t2_num: int = 1,
    t2_den: int = 2,
    ngram_n: int = 3,
    k: int = 16,
    shingle_len: int = 5,
    bands: int = 4,
) -> DataFrame:
    """EXACT cosine scores within LSH blocks — the bounded production
    composition of :func:`allpairs_prefix_cosine`'s scoring semantics.

    Contract: every document pair that collides in at least one
    MinHash band (:func:`lsh_candidate_pairs` over char-``shingle_len``
    shingles, ``bands`` bands of ``k/bands`` rows) is scored with the
    TRUE binary cosine over its distinct word ``ngram_n``-gram sets
    and emitted iff ``cos² ≥ t2_num/t2_den``. Scores are exact — no
    MinHash estimate in the output — while candidate volume is bounded
    by the banding, so recall is the LSH collision probability instead
    of 100%. A user who needs exact similarity values (curation-audit
    thresholds, score histograms) gets them at LSH cost; the global
    100%-recall form stays available as the diagnostic
    :func:`allpairs_prefix_cosine` (Σdf² by contract — measured
    90×/decade at sf10).

    Output: ``(id_a, id_b, n_overlap, cosine)`` — same schema and
    scoring expression as :func:`allpairs_prefix_cosine`, so the two
    are drop-in swappable.

    100 TB shape: one signature pass (MD5 per distinct shingle), one
    shuffle on ``(band_idx, band_hash)``, quadratic only within a
    band bucket (feed exact-collapsed representatives — the
    minhash_dedup_pairs_collapsed contract — so identical-text
    mega-clusters cost one node); verification is two hash joins on
    id attaching the per-doc gram arrays plus an in-row
    ``array_intersect``. The cheap integer size filter
    (``t²·max(na,nb) ≤ min(na,nb)``, same bound as the prefix
    operator) prunes candidates BEFORE the array-carrying joins.
    """
    ver = blocked_overlap_pairs(
        df, id_col, text_col,
        ngram_n=ngram_n, k=k, shingle_len=shingle_len, bands=bands,
        size_ratio=(t2_num, t2_den),
    ).where(
        F.col("ov") * F.col("ov") * t2_den
        >= F.lit(t2_num) * F.col("na") * F.col("nb")
    )
    return ver.select(
        "id_a",
        "id_b",
        F.col("ov").alias("n_overlap"),
        trunc6(
            F.col("ov").cast("double")
            / F.sqrt(
                F.col("na").cast("double") * F.col("nb").cast("double")
            )
        ).alias("cosine"),
    )


def blocked_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 3,
    k: int = 16,
    shingle_len: int = 5,
    bands: int = 4,
    size_ratio: tuple[int, int] | None = None,
    candidates: str = "bands",
    max_df: int = 20,
) -> DataFrame:
    """Shared blocked overlap core: every candidate pair with its
    exact word-``ngram_n``-gram set overlap — ``(id_a, id_b, ov, na,
    nb)`` — from which callers derive cosine
    (:func:`allpairs_blocked_cosine`), containment
    (:func:`allpairs_blocked_containment`), or score histograms
    without re-deriving the candidate/verify chain.

    ``candidates`` picks the blocking, matched to the score's geometry:

    - ``"bands"`` — MinHash/LSH band collisions (the
      lsh_candidate_pairs kernel). Right for SYMMETRIC scores
      (cosine/Jaccard): collision probability tracks Jaccard.
    - ``"rare-grams"`` — pairs sharing ≥1 globally RARE word n-gram
      (document frequency ≤ ``max_df``; the ngram_jaccard_pairs
      stop-shingle discipline). Right for CONTAINMENT: a paragraph
      embedded in a much longer page has near-zero Jaccard with it —
      MinHash bands almost never collide BY DESIGN — but its rare
      grams all occur in the host, so any one of them keys the pair.
      Join cost is Σ_{rare} df² ≤ max_df·|grams| — linear in corpus.

    ``size_ratio=(t2_num, t2_den)`` applies the cosine size bound
    ``t²·max(na,nb) ≤ min(na,nb)`` on lean (id, n) rows BEFORE the
    array-carrying joins (valid only for symmetric scores; containment
    has no size prune: a tiny document fully contained in a huge one
    is exactly the signal). ``None`` keeps all candidates.

    100 TB shape: one candidate shuffle (band hash or rare-gram key),
    two hash joins on id attaching gram arrays, in-row
    ``array_intersect`` — the allpairs_blocked_cosine plan minus its
    threshold filter.
    """
    df = _ensure_parallelism(df).persist()
    features = (
        word_ngrams(F.col(text_col), ngram_n)
        if ngram_n > 1
        else F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("([a-z]+)"), 1
        )
    )
    sets = (
        df.select(
            F.col(id_col).alias("id"),
            F.array_distinct(features).alias("arr"),
        )
        .withColumn("n", F.size("arr").cast("long"))
        .where(F.col("n") > 0)
        .persist()
    )
    if candidates == "bands":
        sigs = minhash_signatures(df, id_col, text_col, k, shingle_len)
        cand = lsh_candidate_pairs(sigs, bands, k // bands)
    elif candidates == "rare-grams":
        from pyspark.sql import Window as _W

        ex = sets.select("id", F.explode("arr").alias("g"))
        w_g = _W.partitionBy("g")
        rare = ex.withColumn("_df", F.count(F.lit(1)).over(w_g)).where(
            F.col("_df") <= max_df
        )
        ra = rare.select(F.col("id").alias("id_a"), "g")
        rb = rare.select(F.col("id").alias("id_b"), "g")
        cand = (
            ra.join(rb, "g")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    else:
        raise ValueError(f"unknown candidate mode {candidates!r}")
    if size_ratio is not None:
        t2_num, t2_den = size_ratio
        sa = sets.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
        sb = sets.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
        # size filter on lean (id, n) rows first: cos >= t forces
        # t2_num*max <= t2_den*min (exact integers) — candidates
        # failing it never touch the array-carrying verify joins
        cand = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .where(
                (F.col("na") * t2_num <= F.col("nb") * t2_den)
                & (F.col("nb") * t2_num <= F.col("na") * t2_den)
            )
            .select("id_a", "id_b")
        )
    va = sets.select(
        F.col("id").alias("id_a"),
        F.col("arr").alias("arr_a"),
        F.col("n").alias("na"),
    )
    vb = sets.select(
        F.col("id").alias("id_b"),
        F.col("arr").alias("arr_b"),
        F.col("n").alias("nb"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "ov", F.size(F.array_intersect("arr_a", "arr_b")).cast("long")
        )
        .select("id_a", "id_b", "ov", "na", "nb")
    )


def allpairs_blocked_containment(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    c_num: int = 4,
    c_den: int = 5,
    ngram_n: int = 3,
    max_df: int = 20,
) -> DataFrame:
    """ASYMMETRIC containment dedup over rare-gram blocks: emit
    candidate pairs whose exact word-``ngram_n``-gram CONTAINMENT
    ``|A∩B| / min(|A|, |B|)`` is ≥ ``c_num/c_den`` — the sub-document
    duplication signal cosine misses (a paragraph pasted into a much
    longer page scores high containment but low cosine, because the
    √(na·nb) denominator punishes the size gap). The standard
    complement to near-dup cosine in web-corpus curation
    (boilerplate, quote-heavy mirrors, partial scrapes).

    Candidates come from the RARE-GRAM join, not MinHash bands —
    containment pairs have near-zero Jaccard by construction, so band
    collision probability is ~0 for exactly the pairs this operator
    exists to find; sharing one globally rare gram (df ≤ ``max_df``)
    is the right key (see blocked_overlap_pairs ``candidates``).

    Output: ``(id_a, id_b, n_overlap, containment)`` with containment
    exact (trunc6) — NO size prune (smallness of one side is the
    point; see blocked_overlap_pairs).

    100 TB shape: one gram explode + df window + rare-key equi-join
    (Σ df² ≤ max_df·|grams| — linear), then the shared verify joins.
    """
    pairs = blocked_overlap_pairs(
        df, id_col, text_col,
        ngram_n=ngram_n, size_ratio=None,
        candidates="rare-grams", max_df=max_df,
    )
    return pairs.where(
        F.col("ov") * c_den >= F.lit(c_num) * F.least("na", "nb")
    ).select(
        "id_a",
        "id_b",
        F.col("ov").alias("n_overlap"),
        trunc6(
            F.col("ov").cast("double")
            / F.least("na", "nb").cast("double")
        ).alias("containment"),
    )
