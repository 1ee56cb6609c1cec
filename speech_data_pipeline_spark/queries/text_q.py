"""Text-analysis, dedup, and similarity queries over `documents` and
`embeddings` — the training-data-pipeline surface.

Oracle-parity design notes:
- all hashing is MD5 hex (identical in Spark and DuckDB), compared
  lexicographically — no engine-specific hash functions anywhere;
- DuckDB regexps are RE2 (no lookaround), so shared patterns use only
  alternation/classes; the oracle may use different *functions* as long
  as results match;
- embedding math folds left-to-right in double and is rounded to 6
  places on output.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from speech_data_pipeline_spark.functions import trunc6
from speech_data_pipeline_spark.operators import dedup as dd
from speech_data_pipeline_spark.operators.dedup import (
    EXACT_COLLAPSE_SQL as _EXACT_COLLAPSE,
)
from speech_data_pipeline_spark.operators import similarity as sim
from speech_data_pipeline_spark.operators import text as tx
from speech_data_pipeline_spark.queries.registry import query
from speech_data_pipeline_spark.sources.catalog import load_table

_SUBWORD_PAT = tx.SUBWORD_PAT  # one definition, shared with the operator


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> ''))
             AS n_tokens,
           len(regexp_extract_all(text, '{_SUBWORD_PAT}'))
             AS n_subwords,
           CAST(floor(length(text) / 4.0) AS BIGINT) AS n_tokens_approx
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish subword piece count."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.size(tx.tokens(t)).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(_SUBWORD_PAT), 0))
        .cast("long")
        .alias("n_subwords"),
        F.floor(F.length(t) / F.lit(4.0)).cast("long").alias("n_tokens_approx"),
    )


#: Quality-score SQL fragments — ONE definition of the feature CTE and
#: the raw [0,1] composite, shared by every oracle that replays
#: operators/text.py quality_score (the score itself and the
#: calibration diagram over it).
_QUALITY_FEAT_SQL = r"""SELECT doc_id,
             length(text) AS n_chars,
             list_filter(string_split_regex(trim(text), '[ \t\n\r\f\x0b]+'), t -> t <> '') AS toks,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
             length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
      FROM documents"""

_QUALITY_RAW01_SQL = """((least(len(toks) / 50.0, 1.0)
                  + (1.0 - least(n_punct / CAST(greatest(n_chars, 1) AS DOUBLE) * 10.0, 1.0))
                  + (1.0 - least(n_upper / CAST(greatest(n_alpha, 1) AS DOUBLE) * 2.0, 1.0))
                  + CASE WHEN len(toks) > 0
                         THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
                         ELSE 0.0 END) / 4.0)"""


@query(
    "text_quality_score",
    oracle=f"""
    WITH feat AS (
      {_QUALITY_FEAT_SQL}
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           floor((CASE WHEN len(toks) > 0
                      THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
                      ELSE 0.0 END) * 1000000.0) / 1000000.0 AS uniq_token_ratio,
           floor((CASE WHEN len(toks) > 0
                      THEN n_alpha / CAST(len(toks) AS DOUBLE)
                      ELSE 0.0 END) * 1000000.0) / 1000000.0 AS mean_word_len,
           floor({_QUALITY_RAW01_SQL} * 1000000.0) / 1000000.0 AS quality
    FROM feat
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punct/case/repetition composite."""
    d = load_table(spark, sf_dir, "documents")
    return tx.quality_score(d).select(
        "doc_id", "n_tokens", "uniq_token_ratio", "mean_word_len", "quality"
    )


def _langid_oracle() -> str:
    cols = ", ".join(f"score_{l}" for l in sorted(tx.LANG_MARKERS))
    return f"""
    WITH scored AS ({langid_scored_sql()})
    SELECT doc_id, lang, {cols}, {langid_pred_expr()} AS pred_lang FROM scored
    """


def langid_scored_sql() -> str:
    """Shared oracle fragment: the per-language marker-count CTE body
    (one definition for the langid query and every eval over it)."""
    score_cols = []
    for lang, markers in sorted(tx.LANG_MARKERS.items()):
        pattern = tx._marker_pattern(lang, markers)
        score_cols.append(
            f"len(regexp_extract_all(lower(text), '{pattern}', 1)) AS score_{lang}"
        )
    return f"SELECT doc_id, lang, {', '.join(score_cols)} FROM documents"


def langid_pred_expr() -> str:
    """Shared oracle fragment: argmax-with-smallest-lang-tie-break over
    the ``score_*`` columns of :func:`langid_scored_sql`."""
    langs = sorted(tx.LANG_MARKERS)
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    pred = "'und'"
    for lang in reversed(langs):
        pred = (
            f"CASE WHEN score_{lang} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {pred} END"
        )
    return pred


@query("text_language_id", oracle=_langid_oracle())
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID with deterministic tie-breaks."""
    d = load_table(spark, sf_dir, "documents")
    out = tx.language_id(d)
    score_cols = [f"score_{l}" for l in sorted(tx.LANG_MARKERS)]
    return out.select("doc_id", "lang", *score_cols, "pred_lang")


def _langid_trigram_oracle() -> str:
    profs = tx.ct_profiles()
    vals = ", ".join(
        f"('{lang}', '{tri}', {rank})"
        for lang, p in sorted(profs.items())
        for tri, rank in sorted(p.items(), key=lambda kv: kv[1])
    )
    gram_lists = ", ".join(
        f"list_transform(range(1, greatest(len(s) - {n - 1}, 0) + 1), "
        f"i -> substr(s, CAST(i AS INTEGER), {n}))"
        for n in tx.CT_NS
    )
    return f"""
    WITH prof(plang, tri, prank) AS (VALUES {vals}),
    langs AS (SELECT DISTINCT plang FROM prof),
    base AS (
      SELECT doc_id, lang,
             CASE WHEN t = '' THEN '' ELSE ' ' || t || ' ' END AS s
      FROM (SELECT doc_id, lang,
                   trim(regexp_replace(lower(text), '{tx.CT_NORM_PAT}',
                                       ' ', 'g')) AS t
            FROM documents)
    ), grams AS (
      SELECT doc_id, unnest(flatten([{gram_lists}])) AS tri
      FROM base WHERE len(s) >= 1
    ), counts AS (
      SELECT doc_id, tri, count(*) AS c FROM grams GROUP BY doc_id, tri
    ), dprof AS (
      SELECT doc_id, tri, drank FROM (
        SELECT doc_id, tri,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, tri) AS drank
        FROM counts)
      WHERE drank <= {tx.CT_K}
    ), dists AS (
      SELECT d.doc_id, l.plang,
             sum(CASE WHEN p.prank IS NULL THEN {tx.CT_K_PROF}
                 ELSE abs(d.drank - p.prank) END) AS dist
      FROM dprof d CROSS JOIN langs l
      LEFT JOIN prof p ON p.plang = l.plang AND p.tri = d.tri
      GROUP BY d.doc_id, l.plang
    ), best AS (
      SELECT doc_id, plang, dist FROM (
        SELECT doc_id, plang, dist,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY dist, plang) AS rn
        FROM dists)
      WHERE rn = 1
    )
    SELECT b.doc_id, b.lang,
           coalesce(s.plang, 'und') AS pred_lang,
           CAST(coalesce(s.dist, 0) AS BIGINT) AS best_dist
    FROM base b LEFT JOIN best s USING (doc_id)
    """


@query("text_language_trigram", oracle=_langid_trigram_oracle())
def text_language_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cavnar–Trenkle character-n-gram-profile language ID (VERDICT
    r3 #7): out-of-place distance between each document's ranked
    1-/2-/3-gram profile and seeded per-language profiles — the
    public, model-free classifier behind the marker heuristic's
    column contract, CJK path included. The oracle embeds the SAME
    Python-built profile table as VALUES and replays normalization,
    gram ranking, and the distance argmin end-to-end. 100% on the
    authored multilingual fixture (tests/test_text_similarity or
    test_mining fixture test)."""
    d = load_table(spark, sf_dir, "documents")
    return tx.language_id_trigram(d).select(
        "doc_id", "lang", "pred_lang", "best_dist"
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_aggregate(
             list_transform(
               range(1, greatest(length(text) - 7, 1) + 1),
               i -> md5(substr(text, CAST(i AS INTEGER), 8))),
             'min') AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style min-shingle-hash document fingerprint."""
    d = load_table(spark, sf_dir, "documents")
    return tx.fingerprint(d, k=8).select("doc_id", "fingerprint")


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_md5,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: digest groupBy, min-id canonical (one shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    return dd.exact_dedup(d)


def _hex7_to_int_sql(md5_expr: str) -> str:
    """DuckDB SQL turning the first 7 hex chars of an md5 into an int.

    DuckDB has no base-conversion function, so fold nibble positions:
    ``Σ (strpos(hexdigits, char_i) - 1) * 16^(6-i)``.
    """
    terms = [
        f"(strpos('0123456789abcdef', substr({md5_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (6 - i)}"
        for i in range(7)
    ]
    return "(" + " + ".join(terms) + ")"


def _minhash_sigs_cte(
    k: int = 16, shingle_len: int = 5, src: str = "documents"
) -> str:
    """CTE fragment ``sh, sigs`` replaying minhash_signatures in
    DuckDB — shared by the pair oracle and the blocked-exact oracle so
    the signature replay cannot drift between them."""
    from speech_data_pipeline_spark.operators.dedup import (
        MINHASH_P,
        minhash_coeffs,
    )

    coeffs = minhash_coeffs(k)
    sig_entries = ", ".join(
        f"list_aggregate(list_transform(hs, h -> (h * {a} + {b}) % {MINHASH_P}),"
        f" 'min')"
        for a, b in coeffs
    )
    h = _hex7_to_int_sql("md5(s)")
    return f"""
    sh AS (
      SELECT doc_id AS id,
             list_transform(
               list_distinct(list_transform(
                 range(1, greatest(length(text) - {shingle_len - 1}, 1) + 1),
                 i -> substr(text, CAST(i AS INTEGER), {shingle_len}))),
               s -> {h}) AS hs
      FROM {src}
    ), sigs AS (
      SELECT id, [{sig_entries}] AS sig FROM sh
    )"""


def _band_share_sql(k: int = 16, bands: int = 4) -> str:
    """OR-of-band-equality condition over ``a.sig``/``b.sig`` —
    replays lsh_candidate_pairs' bucket collision predicate."""
    rows = k // bands
    band_conds = []
    for b in range(bands):
        conj = " AND ".join(
            f"a.sig[{b * rows + r + 1}] = b.sig[{b * rows + r + 1}]"
            for r in range(rows)
        )
        band_conds.append(f"({conj})")
    return " OR ".join(band_conds)


def _minhash_pairs_cte(
    k: int = 16,
    shingle_len: int = 5,
    bands: int = 4,
    threshold: float = 0.5,
    src: str = "documents",
) -> str:
    """Shared CTE body ``sh, sigs, pairs`` replaying the MinHash+LSH
    pair generation in DuckDB (O(n²) pairwise form — the oracle checks
    semantics, the engine keeps the banded-join plan). ``src`` lets the
    collapsed oracle point the same replay at the representatives-only
    relation."""
    share_band = _band_share_sql(k, bands)
    eq_count = " + ".join(
        f"CASE WHEN a.sig[{i + 1}] = b.sig[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(k)
    )
    return f"""
    {_minhash_sigs_cte(k, shingle_len, src)}, pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             floor((({eq_count}) / {float(k)}) * 1000000.0) / 1000000.0
               AS est_jaccard
      FROM sigs a JOIN sigs b ON a.id < b.id
      WHERE ({share_band})
        AND floor((({eq_count}) / {float(k)}) * 1000000.0) / 1000000.0
              >= {threshold}
    )"""


def _minhash_oracle(k: int = 16, shingle_len: int = 5, bands: int = 4) -> str:
    return f"""
    WITH {_minhash_pairs_cte(k, shingle_len, bands)}
    SELECT id_a, id_b, est_jaccard FROM pairs
    """


def _minhash_collapsed_oracle(
    k: int = 16, shingle_len: int = 5, bands: int = 4
) -> str:
    """Replay of the production composition: md5 digest-collapse to
    min-id representatives, the MinHash+LSH pair CTE over
    representatives only, plus one member→rep link per collapsed
    duplicate at est_jaccard exactly 1.0."""
    return f"""
    WITH dg AS (
      SELECT doc_id AS id, md5(text) AS _dg FROM documents
    ), grp AS (
      SELECT _dg, min(id) AS rep FROM dg GROUP BY _dg
    ), repdocs AS (
      SELECT d.doc_id, d.text
      FROM documents d JOIN grp g ON g.rep = d.doc_id
    ), {_minhash_pairs_cte(k, shingle_len, bands, src="repdocs")}
    SELECT id_a, id_b, est_jaccard FROM pairs
    UNION ALL
    SELECT d.id AS id_a, g.rep AS id_b, CAST(1.0 AS DOUBLE) AS est_jaccard
    FROM dg d JOIN grp g ON g._dg = d._dg
    WHERE d.id <> g.rep
    """


@query("dedup_minhash_lsh", oracle=_minhash_collapsed_oracle())
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs — the PRODUCTION entry point:
    exact-duplicate collapse (md5 digest → min-id representative)
    first, shingle→minhash→band→bucket-join over representatives only,
    then one member→rep star link per collapsed duplicate (est 1.0 —
    identical text means every signature position matches).

    Why collapsed is the gate row: a C-member identical-text cluster
    lands in one band bucket and the uncollapsed pair list is C²/2 —
    at a 10M-copy boilerplate cluster that is ~5·10¹³ pairs, a true
    scale-killer. The collapse makes pair volume linear in the corpus
    again while staying CLOSURE-EQUIVALENT (operators/dedup.py
    minhash_dedup_pairs_collapsed), and was measured flat under the
    ~10k-copy sf1skew stress cluster where the uncollapsed form blew
    up 4.4×. The raw banded form remains available as the
    diagnostic-only ``dedup_minhash_lsh_uncollapsed``.

    The oracle replays the identical composition: collapse, the O(n²)
    pairwise MinHash replay over representatives, and the 1.0-scored
    star links.
    """
    d = load_table(spark, sf_dir, "documents")
    return dd.minhash_dedup_pairs_collapsed(
        d, k=16, shingle_len=5, bands=4, threshold=0.5, with_scores=True
    )


@query("dedup_minhash_lsh_uncollapsed", oracle=_minhash_oracle())
def dedup_minhash_uncollapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIAGNOSTIC-ONLY raw MinHash+LSH pair list (no exact-dup
    collapse): shingle→minhash→band→bucket-join, quadratic only within
    band buckets — which means quadratic in an identical-text cluster
    (C²/2 pairs for a C-member cluster; 4.4× wall-clock at the
    ~10k-copy sf1skew stress cluster). Use ``dedup_minhash_lsh`` (the
    collapsed composition) in production; keep this form for auditing
    raw band-collision behavior on corpora known to be free of exact
    duplicates. The oracle verifies semantics with the O(n²) pairwise
    form.
    """
    d = load_table(spark, sf_dir, "documents")
    return dd.minhash_dedup_pairs(d, k=16, shingle_len=5, bands=4, threshold=0.5)


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH allsh AS (
      SELECT lang AS blk, doc_id AS id,
             unnest(list_distinct(list_transform(
               range(1, greatest(length(text) - 7, 1) + 1),
               i -> substr(text, CAST(i AS INTEGER), 8)))) AS shingle
      FROM documents
    ), docfreq AS (
      SELECT blk, shingle, count(*) AS df FROM allsh GROUP BY blk, shingle
    ), sh AS (
      SELECT a.blk, a.id, a.shingle
      FROM allsh a JOIN docfreq f
        ON a.blk = f.blk AND a.shingle = f.shingle
      WHERE f.df <= 20
    ), sizes AS (
      SELECT id, count(*) AS n FROM sh GROUP BY id
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b
        ON a.blk = b.blk AND a.shingle = b.shingle AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b,
           floor((n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE)) * 1000000.0) / 1000000.0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE floor((n_inter / CAST(sa.n + sb.n - n_inter AS DOUBLE)) * 1000000.0) / 1000000.0 >= 0.05
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-8-gram Jaccard within language blocks (stop-shingle removal).

    Engine path: explode + document-frequency filter + equi-join on
    (block, shingle) — co-occurring rare shingles shuffle, the cross
    product never materializes, and the df cap bounds per-shingle skew.
    """
    d = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(
        d, block_col="lang", shingle_len=8, threshold=0.05, max_df=20
    )


def _simhash_oracle(bits: int = 60) -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id AS id, unnest(list_distinct(
               list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0b]+'), t -> t <> '')))
               AS token
      FROM documents
    ), h AS (
      SELECT id, substr(md5(token), 1, 15) AS hx FROM tok
    ), bit AS (
      SELECT id, j,
             CASE WHEN
               (CAST(floor(
                 (strpos('0123456789abcdef',
                         substr(hx, 15 - CAST(floor(j / 4) AS INTEGER), 1)) - 1)
                 / pow(2, j % 4)) AS BIGINT) % 2) = 1
             THEN 1 ELSE -1 END AS vote
      FROM h, unnest(generate_series(0, {bits - 1})) AS t(j)
    ), votes AS (
      SELECT id, j, sum(vote) AS v FROM bit GROUP BY id, j
    )
    SELECT id, CAST(sum(CASE WHEN v > 0
                             THEN CAST(pow(2, j) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY id
    """


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 60-bit fingerprints (map-reduce form, no UDF)."""
    d = load_table(spark, sf_dir, "documents")
    return dd.simhash64(d)


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


_COS_ORACLE = """
    WITH q AS MATERIALIZED (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS MATERIALIZED (
      SELECT e.vec_id,
             floor((
               list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.qv,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) * 1000000.0) / 1000000.0 AS cos_sim
      FROM embeddings e, q
    )
    SELECT vec_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id LIMIT 10
"""


@query("sim_cosine_topk", oracle=_COS_ORACLE)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 to the vec_id=0 embedding.

    TakeOrderedAndProject plan: per-partition heap, k-row merge — no
    global sort at any scale.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk(e, _query_vec(spark, sf_dir), k=10)


@query(
    "a5_embedding_energy",
    oracle="""
    SELECT vec_id,
           floor((list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1000000.0) / 1000000.0 AS energy,
           floor((list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE))))) * 1000000.0) / 1000000.0 AS peak
    FROM embeddings
    """,
)
def a5_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform-style energy (A5) + peak (A6) as higher-order folds."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        trunc6(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ).alias("energy"),
        trunc6(
            F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
        ).alias("peak"),
    )


def _plane_dot_sql(vec, e: str, dim: int = 64) -> str:
    """DuckDB dot of a column list with a literal vector, left-to-right
    (the fold every oracle in this family must share)."""
    lit = "[" + ", ".join(repr(float(x)) for x in vec) + "]"
    return (
        f"list_sum(list_transform(range(1, {dim} + 1), "
        f"i -> CAST({e}[i] AS DOUBLE) * ({lit})[i]))"
    )


def _bucket_sql(planes, e: str = "embedding", dim: int = 64) -> str:
    """Sign-bit LSH bucket key — ONE definition for every oracle that
    must replay operators/similarity.py rp_lsh_bucket."""
    return " || ".join(
        f"(CASE WHEN {_plane_dot_sql(p, e, dim)} >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )


def _capped_bucket_ctes(
    base: int,
    step: int,
    levels: int,
    cap: int,
    cols: str,
    e: str = "embedding",
    id_expr: str = "vec_id",
    dim: int = 64,
    seed: int = 42,
    src: str = "embeddings",
) -> str:
    """CTE chain replaying operators/similarity.py
    rp_lsh_bucket_capped: full-depth sign bits once, ``levels`` rounds
    of windowed-count escalation (buckets over ``cap`` extend their
    key by ``step`` bits), then the deterministic ``id % ceil(pop/cap)``
    salt shard. Ends in CTE ``cbkt`` with columns ``{cols}, bucket``.
    ONE definition for every capped-kernel oracle — the window counts
    here compute exactly the tiny grouped counts the engine broadcast-
    joins."""
    from speech_data_pipeline_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, base + step * levels, seed=seed)
    bits = _bucket_sql(planes, e, dim)
    parts = [
        f"cb0 AS (SELECT {cols}, {bits} AS _bits FROM {src})",
        f"cl0 AS (SELECT {cols}, _bits, substr(_bits, 1, {base}) AS bucket"
        f" FROM cb0)",
    ]
    for lvl in range(1, levels + 1):
        parts.append(
            f"cl{lvl} AS (SELECT {cols}, _bits,"
            f" CASE WHEN count(*) OVER (PARTITION BY bucket) > {cap}"
            f" THEN substr(_bits, 1, {base + step * lvl})"
            f" ELSE bucket END AS bucket FROM cl{lvl - 1})"
        )
    parts.append(
        f"cs AS (SELECT {cols}, bucket,"
        f" count(*) OVER (PARTITION BY bucket) AS _cnt FROM cl{levels})"
    )
    parts.append(
        f"cbkt AS (SELECT {cols},"
        f" CASE WHEN _cnt > {cap}"
        f" THEN bucket || '#' ||"
        f" CAST(({id_expr}) % ((_cnt + {cap} - 1) // {cap}) AS VARCHAR)"
        f" ELSE bucket END AS bucket FROM cs)"
    )
    return ",\n    ".join(parts)


def _cos_pair_sql(a: str, b: str, dim: int = 64) -> str:
    """DuckDB raw cosine between two list columns, fold-order-exact."""
    return f"""
        list_sum(list_transform(range(1, {dim} + 1),
            i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
        / (sqrt(list_sum(list_transform({a},
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform({b},
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
    """


_NEARDUP_CAP = 256


def _neardup_oracle(n_planes: int = 8, dim: int = 64, threshold: float = 0.3) -> str:
    ctes = _capped_bucket_ctes(
        n_planes, 5, 3, _NEARDUP_CAP, cols="vec_id, embedding", dim=dim
    )
    cos = _cos_pair_sql("a.embedding", "c.embedding", dim)
    return f"""
    WITH {ctes}, b AS (
      SELECT vec_id, embedding, bucket FROM cbkt
    )
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           floor(({cos}) * 1000000.0) / 1000000.0 AS cos_sim
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE floor(({cos}) * 1000000.0) / 1000000.0 >= {threshold}
    """


def _mp_query_vec(dim: int = 64, seed: int = 7) -> list[float]:
    """Seeded literal query vector — identical on both engines, so the
    multi-probe set is static and bakes into both plans."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.standard_normal(dim)]


def _multiprobe_oracle(n_planes: int = 6, dim: int = 64, n_probes: int = 5) -> str:
    from speech_data_pipeline_spark.operators.similarity import (
        hyperplanes,
        probe_buckets,
    )

    planes = hyperplanes(dim, n_planes, seed=42)
    qv = _mp_query_vec(dim)
    probes = probe_buckets(qv, planes, n_probes)

    bucket = _bucket_sql(planes, "embedding", dim)
    qlit = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    cos = f"""
        {_plane_dot_sql(qv, "embedding", dim)}
        / (sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           * sqrt(list_sum(list_transform({qlit}::DOUBLE[],
             x -> x * x))))
    """
    in_list = ", ".join(f"'{b}'" for b in probes)
    return f"""
    WITH b AS (
      SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
    )
    SELECT vec_id, bucket,
           floor(({cos}) * 1000000.0) / 1000000.0 AS cos_sim
    FROM b WHERE bucket IN ({in_list})
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """


@query("sim_lsh_multiprobe", oracle=_multiprobe_oracle())
def sim_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via multi-probe random-hyperplane LSH: the query's
    bucket plus the 4 lowest-flip-cost neighbor buckets (Lv et al.
    multi-probe), exact cosine rerank within the probed scan.

    The probe set is an `IN` filter on the bucket key — at scale the
    bucketed table is partitioned by bucket, so this prunes to
    n_probes/2^n_planes of the data before any distance math.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return sim.lsh_topk(
        e, _mp_query_vec(), k=10, n_planes=6, seed=42, n_probes=5
    )


def _batch_query_vecs(n: int = 4, dim: int = 64) -> list[list[float]]:
    """Seeded batch of query vectors (seeds 7..7+n-1, matching the
    single-query convention) — identical literals on both engines."""
    return [_mp_query_vec(dim, seed=7 + i) for i in range(n)]


def _ann_batch_oracle(
    n_planes: int = 6, dim: int = 64, n_probes: int = 3, k: int = 5
) -> str:
    from speech_data_pipeline_spark.operators.similarity import (
        hyperplanes,
        probe_buckets,
    )

    planes = hyperplanes(dim, n_planes, seed=42)
    qvs = _batch_query_vecs(dim=dim)

    bucket = _bucket_sql(planes, "embedding", dim)
    probe_vals = ", ".join(
        f"({qid}, '{b}')"
        for qid, qv in enumerate(qvs)
        for b in probe_buckets(qv, planes, n_probes)
    )
    qv_vals = ", ".join(
        f"({qid}, [" + ", ".join(repr(float(x)) for x in qv) + "]::DOUBLE[])"
        for qid, qv in enumerate(qvs)
    )
    return f"""
    WITH b AS (
      SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
    ), probes(query_id, bucket) AS (VALUES {probe_vals}),
    qv(query_id, v) AS (VALUES {qv_vals}),
    scored AS (
      SELECT p.query_id, b.vec_id,
             floor((
               list_sum(list_transform(range(1, {dim} + 1),
                 i -> CAST(b.embedding[i] AS DOUBLE) * q.v[i]))
               / (sqrt(list_sum(list_transform(b.embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.v, x -> x * x))))
             ) * 1000000.0) / 1000000.0 AS cos_sim
      FROM b JOIN probes p USING (bucket) JOIN qv q ON q.query_id = p.query_id
    )
    SELECT query_id, vec_id, cos_sim, rnk FROM (
      SELECT query_id, vec_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored
    ) WHERE rnk <= {k}
    """


@query("sim_ann_batch", oracle=_ann_batch_oracle())
def sim_ann_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-probe ANN: 4 query vectors' probe sets broadcast-
    joined against the bucketed corpus in ONE join, per-query top-5 via
    a bounded window — the scalable many-queries search shape (a
    per-query loop of limit(k) scans is the anti-pattern)."""
    e = load_table(spark, sf_dir, "embeddings")
    return sim.ann_batch_topk(
        e, _batch_query_vecs(), k=5, n_planes=6, seed=42, n_probes=3
    )


@query("sim_embedding_neardup", oracle=_neardup_oracle())
def sim_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via random-hyperplane LSH
    blocking + exact rerank within buckets (threshold 0.3 - the
    synthetic embeddings carry no true near-dups; the p99 within-bucket
    cosine is ~0.32, so 0.3 exercises the full path with real output).

    Bucketing is POPULATION-CAPPED (rp_lsh_bucket_capped, cap 256) so
    the within-bucket rerank kernel is O(cap²) at any corpus size or
    skew. The oracle replays the identical hyperplanes, escalation
    counts and salt (seeded literals + windowed counts) with an
    O(cap²)-within-bucket SQL join.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return sim.embedding_neardup_pairs(
        e, n_planes=8, seed=42, threshold=0.3, dim=64, cap=_NEARDUP_CAP
    )


def _ivf_oracle(
    dim: int = 64, n_cells: int = 8, nprobe: int = 2, k: int = 10,
    quant: int = 1 << 20,
) -> str:
    """DuckDB replay of the IVF plan: quantized-integer centroid means
    (bit-exact across engines), full argmin assignment, nprobe nearest
    cells to the query literal, exact cosine rerank."""
    qv = _mp_query_vec(dim)
    qlit = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    return f"""
    WITH q AS (SELECT {qlit}::DOUBLE[] AS qv),
    cent AS (
      SELECT vec_id % {n_cells} AS cell, i,
             CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * {quant}.0)
                           AS BIGINT)) AS DOUBLE)
               / (count(*) * {quant}.0) AS v
      FROM embeddings, range(1, {dim} + 1) t(i)
      GROUP BY cell, i
    ),
    cvec AS (SELECT cell, list(v ORDER BY i) AS c FROM cent GROUP BY cell),
    probed AS (
      SELECT cell FROM cvec, q
      ORDER BY list_sum(list_transform(range(1, {dim} + 1),
                 i -> (qv[i] - c[i]) * (qv[i] - c[i]))), cell
      LIMIT {nprobe}
    ),
    ranked AS (
      SELECT e.vec_id, cv.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(1, {dim} + 1),
                 i -> (CAST(e.embedding[i] AS DOUBLE) - cv.c[i])
                      * (CAST(e.embedding[i] AS DOUBLE) - cv.c[i]))),
               cv.cell) AS rn
      FROM embeddings e CROSS JOIN cvec cv
    ),
    assigned AS (SELECT vec_id, cell FROM ranked WHERE rn = 1)
    SELECT e.vec_id AS id, a.cell,
           floor((list_sum(list_transform(range(1, {dim} + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * qv[i]))
             / (sqrt(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(qv, x -> x * x)))))
             * 1000000.0) / 1000000.0 AS cos_sim
    FROM embeddings e
    JOIN assigned a USING (vec_id)
    JOIN probed p ON a.cell = p.cell
    CROSS JOIN q
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT {k}
    """


def _kmeans_oracle(dim: int = 64, n_cells: int = 8, iters: int = 2,
                   quant: int = 1 << 20) -> str:
    """Chained-CTE replay of the deterministic Lloyd trajectory: each
    iteration is a quantized-mean centroid CTE + an argmin assignment
    CTE over the previous assignment."""
    parts = [f"a0 AS (SELECT vec_id, embedding, vec_id % {n_cells} AS cell "
             f"FROM embeddings)"]
    for t in range(iters):
        parts.append(f"""
    c{t + 1} AS (
      SELECT cell, i,
             CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * {quant}.0)
                           AS BIGINT)) AS DOUBLE)
               / (count(*) * {quant}.0) AS v
      FROM a{t}, range(1, {dim} + 1) t(i)
      GROUP BY cell, i
    ),
    cv{t + 1} AS (SELECT cell, list(v ORDER BY i) AS c FROM c{t + 1}
                  GROUP BY cell),
    a{t + 1} AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, cv.cell,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_sum(list_transform(range(1, {dim} + 1),
                   i -> (CAST(e.embedding[i] AS DOUBLE) - cv.c[i])
                        * (CAST(e.embedding[i] AS DOUBLE) - cv.c[i]))),
                 cv.cell) AS rn
        FROM a{t} e CROSS JOIN cv{t + 1} cv
      ) WHERE rn = 1
    )""")
    return (
        "WITH " + ",".join(parts)
        + f" SELECT vec_id AS id, cell FROM a{iters}"
    )


@query("ml_kmeans_assign", oracle=_kmeans_oracle())
def ml_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of deterministic k-means (quantized-grid
    centroid means, tie-broken argmin): the iterative-refinement
    pattern as two grouped aggregates + two in-row argmins over the
    broadcast centroid array (zero assignment shuffle), value-replayed
    by a chained-CTE oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    return sim.kmeans_assign(e, dim=64, n_cells=8, iters=2)


def _semdedup_oracle(dim: int = 64, n_cells: int = 8, iters: int = 2,
                     quant: int = 1 << 20) -> str:
    """Kmeans chained-CTE replay + final-assignment centroids + per-cell
    nearest-member representative."""
    kmeans = _kmeans_oracle(dim, n_cells, iters, quant)
    prefix = kmeans[: kmeans.rindex(" SELECT ")]  # strip the final SELECT
    t = iters
    return f"""{prefix},
    cF AS (
      SELECT cell, i,
             CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * {quant}.0)
                           AS BIGINT)) AS DOUBLE)
               / (count(*) * {quant}.0) AS v
      FROM a{t}, range(1, {dim} + 1) t(i)
      GROUP BY cell, i
    ),
    cvF AS (SELECT cell, list(v ORDER BY i) AS c FROM cF GROUP BY cell),
    dist AS (
      SELECT a.vec_id, a.cell,
             list_sum(list_transform(range(1, {dim} + 1),
               i -> (CAST(a.embedding[i] AS DOUBLE) - cv.c[i])
                    * (CAST(a.embedding[i] AS DOUBLE) - cv.c[i]))) AS d
      FROM a{t} a JOIN cvF cv USING (cell)
    ),
    rep AS (
      SELECT cell, vec_id AS rep_id FROM (
        SELECT cell, vec_id,
               row_number() OVER (PARTITION BY cell ORDER BY d, vec_id) AS rn
        FROM dist
      ) WHERE rn = 1
    )
    SELECT dist.vec_id AS id, dist.cell, r.rep_id,
           dist.vec_id = r.rep_id AS is_rep,
           floor(dist.d * 1000000.0) / 1000000.0 AS dist
    FROM dist JOIN rep r USING (cell)
    """


@query("dedup_semantic", oracle=_semdedup_oracle())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: deterministic k-means
    cells, one representative per cell (nearest the final centroid,
    ties by id), every other member mapped to it — the embedding
    analog of exact-dedup's canonical survivor
    (operators/similarity.py semantic_dedup; chained-CTE oracle)."""
    e = load_table(spark, sf_dir, "embeddings")
    return sim.semantic_dedup(e, dim=64, n_cells=8, iters=2)


def _pq_oracle(dim: int = 64, m_sub: int = 4, n_cells: int = 4, k: int = 10,
               quant: int = 1 << 20) -> str:
    """DuckDB replay of the PQ/ADC plan: one-step codebooks per
    subspace (sliced from the all-dims quantized-mean centroid table),
    per-subspace argmin codes, distance-table ADC sum in j order."""
    sub = dim // m_sub
    qv = _mp_query_vec(dim)
    qlit = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    sq = (
        f"list_sum(list_transform(range(1, {sub} + 1), "
        f"i -> (CAST(e.embedding[CAST(j.j * {sub} + i AS INTEGER)] AS DOUBLE)"
        f" - cv.c[CAST(j.j * {sub} + i AS INTEGER)])"
        f" * (CAST(e.embedding[CAST(j.j * {sub} + i AS INTEGER)] AS DOUBLE)"
        f" - cv.c[CAST(j.j * {sub} + i AS INTEGER)])))"
    )
    qsq = (
        f"list_sum(list_transform(range(1, {sub} + 1), "
        f"i -> (q.qv[CAST(j.j * {sub} + i AS INTEGER)]"
        f" - cv.c[CAST(j.j * {sub} + i AS INTEGER)])"
        f" * (q.qv[CAST(j.j * {sub} + i AS INTEGER)]"
        f" - cv.c[CAST(j.j * {sub} + i AS INTEGER)])))"
    )
    return f"""
    WITH q AS (SELECT {qlit}::DOUBLE[] AS qv),
    cent AS (
      SELECT vec_id % {n_cells} AS cell, i,
             CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * {quant}.0)
                           AS BIGINT)) AS DOUBLE)
               / (count(*) * {quant}.0) AS v
      FROM embeddings, range(1, {dim} + 1) t(i)
      GROUP BY cell, i
    ),
    cvec AS (SELECT cell, list(v ORDER BY i) AS c FROM cent GROUP BY cell),
    codes AS (
      SELECT vec_id, j, cell FROM (
        SELECT e.vec_id, j.j AS j, cv.cell,
               row_number() OVER (PARTITION BY e.vec_id, j.j
                                  ORDER BY {sq}, cv.cell) AS rn
        FROM embeddings e
        CROSS JOIN range(0, {m_sub}) j(j) CROSS JOIN cvec cv
      ) WHERE rn = 1
    ),
    qd AS (
      SELECT j.j AS j, cv.cell, {qsq} AS d
      FROM cvec cv CROSS JOIN range(0, {m_sub}) j(j) CROSS JOIN q
    ),
    dist AS (
      SELECT c.vec_id,
             array_to_string(list(CAST(c.cell AS VARCHAR) ORDER BY c.j), '-')
               AS codes,
             list_sum(list(qd.d ORDER BY c.j)) AS adc
      FROM codes c JOIN qd ON qd.j = c.j AND qd.cell = c.cell
      GROUP BY c.vec_id
    )
    SELECT vec_id AS id, codes,
           floor(adc * 1000000.0) / 1000000.0 AS adc_dist
    FROM dist ORDER BY adc, vec_id LIMIT {k}
    """


@query("sim_pq_topk", oracle=_pq_oracle())
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via product quantization + asymmetric distance — the
    third ANN tier beside LSH and IVF (operators/similarity.py
    pq_topk): 4 subspaces × 4 one-step codebook centroids, in-row
    codes, ADC distance-table sum, TakeOrderedAndProject cut."""
    e = load_table(spark, sf_dir, "embeddings")
    return sim.pq_topk(e, _mp_query_vec(), m_sub=4, n_cells=4, k=10)


def _ivfpq_oracle(
    dim: int = 64, n_cells: int = 8, nprobe: int = 2, m_sub: int = 4,
    n_pq: int = 8, rerank_n: int = 50, k: int = 10, quant: int = 1 << 20,
) -> str:
    """Chained-CTE replay of the IVF+PQ composed index: coarse
    quantized-mean centroids + argmin assignment (= the IVF oracle),
    in-row residuals, PQ codebooks = sampled init (n_pq lowest-id
    residuals) + one Lloyd round of quantized-grid means per
    (subspace, code), per-(coarse cell, subspace) query distance
    tables over the probed cells only, ADC sum in subspace order,
    exact-cosine rerank of the ADC shortlist."""
    sub = dim // m_sub
    qv = _mp_query_vec(dim)
    qlit = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    idx = f"CAST(j.j * {sub} + i AS INTEGER)"
    seed_sq = (
        f"list_sum(list_transform(range(1, {sub} + 1), "
        f"i -> (r.r[{idx}] - s.r[{idx}]) * (r.r[{idx}] - s.r[{idx}])))"
    )
    code_sq = (
        f"list_sum(list_transform(range(1, {sub} + 1), "
        f"i -> (r.r[CAST(pv.j * {sub} + i AS INTEGER)] - pv.c[i])"
        f" * (r.r[CAST(pv.j * {sub} + i AS INTEGER)] - pv.c[i])))"
    )
    qd_sq = (
        f"list_sum(list_transform(range(1, {sub} + 1), "
        f"i -> ((q.qv[CAST(pv.j * {sub} + i AS INTEGER)]"
        f" - cv.c[CAST(pv.j * {sub} + i AS INTEGER)]) - pv.c[i])"
        f" * ((q.qv[CAST(pv.j * {sub} + i AS INTEGER)]"
        f" - cv.c[CAST(pv.j * {sub} + i AS INTEGER)]) - pv.c[i])))"
    )
    return f"""
    WITH q AS (SELECT {qlit}::DOUBLE[] AS qv),
    cent AS (
      SELECT vec_id % {n_cells} AS cell, i,
             CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * {quant}.0)
                           AS BIGINT)) AS DOUBLE)
               / (count(*) * {quant}.0) AS v
      FROM embeddings, range(1, {dim} + 1) t(i)
      GROUP BY cell, i
    ),
    cvec AS (SELECT cell, list(v ORDER BY i) AS c FROM cent GROUP BY cell),
    ranked AS (
      SELECT e.vec_id, cv.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(1, {dim} + 1),
                 i -> (CAST(e.embedding[i] AS DOUBLE) - cv.c[i])
                      * (CAST(e.embedding[i] AS DOUBLE) - cv.c[i]))),
               cv.cell) AS rn
      FROM embeddings e CROSS JOIN cvec cv
    ),
    assigned AS (SELECT vec_id, cell FROM ranked WHERE rn = 1),
    res AS (
      SELECT e.vec_id, a.cell,
             list_transform(range(1, {dim} + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) - cv.c[i]) AS r
      FROM embeddings e
      JOIN assigned a USING (vec_id)
      JOIN cvec cv ON cv.cell = a.cell
    ),
    seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS p, r
      FROM (SELECT vec_id, r FROM res ORDER BY vec_id LIMIT {n_pq})
    ),
    codes0 AS (
      SELECT vec_id, j, p FROM (
        SELECT r.vec_id, j.j AS j, s.p,
               row_number() OVER (PARTITION BY r.vec_id, j.j
                                  ORDER BY {seed_sq}, s.p) AS rn
        FROM res r CROSS JOIN range(0, {m_sub}) j(j) CROSS JOIN seeds s
      ) WHERE rn = 1
    ),
    pcent AS (
      SELECT c0.j, c0.p AS pcell, i,
             CAST(sum(CAST(floor(r.r[CAST(c0.j * {sub} + i AS INTEGER)]
                                 * {quant}.0) AS BIGINT)) AS DOUBLE)
               / (count(*) * {quant}.0) AS v
      FROM codes0 c0 JOIN res r USING (vec_id), range(1, {sub} + 1) t(i)
      GROUP BY c0.j, c0.p, i
    ),
    pvec AS (SELECT j, pcell, list(v ORDER BY i) AS c FROM pcent
             GROUP BY j, pcell),
    codes AS (
      SELECT vec_id, j, pcell FROM (
        SELECT r.vec_id, pv.j AS j, pv.pcell,
               row_number() OVER (PARTITION BY r.vec_id, pv.j
                                  ORDER BY {code_sq}, pv.pcell) AS rn
        FROM res r CROSS JOIN pvec pv
      ) WHERE rn = 1
    ),
    probed AS (
      SELECT cell FROM cvec, q
      ORDER BY list_sum(list_transform(range(1, {dim} + 1),
                 i -> (qv[i] - c[i]) * (qv[i] - c[i]))), cell
      LIMIT {nprobe}
    ),
    qd AS (
      SELECT cv.cell, pv.j AS j, pv.pcell, {qd_sq} AS d
      FROM cvec cv
      JOIN probed p ON p.cell = cv.cell
      CROSS JOIN pvec pv CROSS JOIN q
    ),
    dist AS (
      SELECT r.vec_id, r.cell,
             array_to_string(list(CAST(c.pcell AS VARCHAR) ORDER BY c.j), '-')
               AS codes,
             list_sum(list(qd.d ORDER BY c.j)) AS adc
      FROM res r
      JOIN codes c USING (vec_id)
      JOIN qd ON qd.cell = r.cell AND qd.j = c.j AND qd.pcell = c.pcell
      GROUP BY r.vec_id, r.cell
    ),
    short AS (
      SELECT vec_id, cell, codes, adc FROM dist
      ORDER BY adc, vec_id LIMIT {rerank_n}
    )
    SELECT s.vec_id AS id, s.cell, s.codes,
           floor(s.adc * 1000000.0) / 1000000.0 AS adc_dist,
           floor((list_sum(list_transform(range(1, {dim} + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * qv[i]))
             / (sqrt(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(qv, x -> x * x)))))
             * 1000000.0) / 1000000.0 AS cos_sim
    FROM short s JOIN embeddings e ON e.vec_id = s.vec_id CROSS JOIN q
    ORDER BY cos_sim DESC, s.vec_id LIMIT {k}
    """


@query("sim_ivfpq_topk", oracle=_ivfpq_oracle())
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via the composed IVF+PQ index (VERDICT r3 item #4's
    production billion-vector shape, operators/similarity.py
    ivfpq_topk): coarse IVF cells route the query to 2 probed cells,
    PQ codebooks (sampled init + one Lloyd round) trained on
    residuals, code-only ADC scan with per-cell distance tables, then
    exact-cosine rerank of the 50-row ADC shortlist (FAISS refine)."""
    e = load_table(spark, sf_dir, "embeddings")
    return sim.ivfpq_topk(
        e, _mp_query_vec(), k=10, n_cells=8, nprobe=2, m_sub=4, n_pq=8,
        rerank_n=50,
    )


@query("sim_ivf_topk", oracle=_ivf_oracle())
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via an IVF coarse quantizer (the second scale path
    beside LSH): one-step k-means centroids from an id-partition init,
    elements quantized to an exact 2^-20 integer grid so the centroid
    means are bit-identical on any engine or shuffle order; probe the
    2 cells nearest the query, exact cosine rerank inside.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return sim.ivf_topk(e, _mp_query_vec(), k=10, n_cells=8, nprobe=2)


# --------------------------------------------------------------------------
# Dedup resolution: pairs -> connected components -> canonical survivors
# --------------------------------------------------------------------------


def _cc_resolve_cte() -> str:
    """Recursive-CTE replay of connected components over the MinHash
    pair list: min-id reachability closure. O(V·E) in the oracle; the
    engine side is the O(log² n)-round star-contraction."""
    return f"""
    WITH RECURSIVE {_minhash_pairs_cte()},
    sym AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
    ),
    comp AS (
      SELECT u AS id, least(u, min(v)) AS component FROM reach GROUP BY u
    ),
    resolved AS (
      SELECT d.doc_id, d.source,
             coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    )"""


@query(
    "dedup_resolve",
    oracle=_cc_resolve_cte()
    + """
    SELECT doc_id, component,
           CAST(CASE WHEN doc_id = component THEN 1 ELSE 0 END AS BIGINT)
             AS is_canonical,
           CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS n_members
    FROM resolved
    """,
)
def dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup RESOLUTION: near-dup pairs closed into duplicate clusters
    (alternating large-star/small-star connected components,
    operators/graph.py), one canonical survivor per cluster.

    Pair lists under-delete on chains (A~B, B~C, A≁C); the transitive
    closure is what an actual 100 TB dedup deletes against. Oracle =
    recursive-CTE reachability closure in DuckDB.
    """
    from speech_data_pipeline_spark.operators import graph as gr

    d = load_table(spark, sf_dir, "documents")
    # exact-collapse composition: closure-identical pairs, linear (not
    # C² per identical-text cluster) — see minhash_dedup_pairs_collapsed
    pairs = dd.minhash_dedup_pairs_collapsed(
        d, k=16, shingle_len=5, bands=4, threshold=0.5
    )
    return gr.resolve_duplicates(d, pairs).select(
        "doc_id",
        "component",
        F.col("is_canonical").cast("long").alias("is_canonical"),
        F.col("n_members").cast("long").alias("n_members"),
    )


@query(
    "dedup_cluster_stats",
    oracle=_cc_resolve_cte()
    + """
    , sizes AS (
      SELECT component, count(*) AS sz FROM resolved GROUP BY component
    )
    SELECT CAST(floor(log2(CAST(sz AS DOUBLE))) AS BIGINT) AS size_log2,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(sum(sz - 1) AS BIGINT) AS n_removed,
           CAST(max(sz) AS BIGINT) AS max_cluster
    FROM sizes GROUP BY 1
    """,
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup IMPACT report: near-dup cluster-size histogram (log2
    buckets) with docs covered and docs a canonical-survivor policy
    would remove — the artifact a corpus-curation run publishes to
    justify its dedup pass (singletons land in bucket 0; a web-scale
    crawl's boilerplate mega-cluster shows up as one fat right-tail
    row instead of being invisible inside a global count).

    Scale shape: one groupBy over the component table (itself the
    star-contraction output) then a ~60-row histogram aggregate — no
    new joins, no skew sensitivity (the mega-cluster costs one row).
    """
    from speech_data_pipeline_spark.operators import graph as gr

    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_dedup_pairs_collapsed(
        d, k=16, shingle_len=5, bands=4, threshold=0.5
    )
    sizes = (
        gr.resolve_duplicates(d, pairs)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return sizes.groupBy(
        F.floor(F.log2(F.col("sz").cast("double"))).alias("size_log2")
    ).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
        F.sum(F.col("sz") - 1).alias("n_removed"),
        F.max("sz").alias("max_cluster"),
    )


_QUALITY_CTE = r"""
    feat AS (
      SELECT doc_id, source,
             length(text) AS n_chars,
             list_filter(string_split_regex(trim(text), '[ \t\n\r\f\x0b]+'), t -> t <> '') AS toks,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
             length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
      FROM documents
    ),
    qual AS (
      SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
             floor(((least(len(toks) / 50.0, 1.0)
                + (1.0 - least(n_punct / CAST(greatest(n_chars, 1) AS DOUBLE) * 10.0, 1.0))
                + (1.0 - least(n_upper / CAST(greatest(n_alpha, 1) AS DOUBLE) * 2.0, 1.0))
                + CASE WHEN len(toks) > 0
                       THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
                       ELSE 0.0 END) / 4.0) * 1000000.0) / 1000000.0 AS quality
      FROM feat
    )"""


@query(
    "pipeline_curation_report",
    oracle=_cc_resolve_cte()
    + ","
    + _QUALITY_CTE
    + """
    SELECT q.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN q.quality < 0.80 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_quality,
           CAST(sum(CASE WHEN r.doc_id <> r.component THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dupes_removed,
           CAST(sum(CASE WHEN q.quality >= 0.80 AND r.doc_id = r.component
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN q.quality >= 0.80 AND r.doc_id = r.component
                    THEN q.n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
    FROM qual q JOIN resolved r ON q.doc_id = r.doc_id
    GROUP BY q.source
    """,
)
def pipeline_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship training-data curation composite: quality scoring +
    near-dup clustering -> per-source keep/drop report (the shape of a
    C4/Gopher-style corpus curation run).

    A document is kept iff quality >= 0.80 AND it is the canonical
    survivor of its near-dup cluster. Counters are independent:
    ``n_low_quality`` counts all below-threshold docs,
    ``n_dupes_removed`` all non-canonical docs (a doc can be both).
    """
    from speech_data_pipeline_spark.operators import graph as gr

    d = load_table(spark, sf_dir, "documents")
    q = tx.quality_score(d)
    pairs = dd.minhash_dedup_pairs_collapsed(
        d, k=16, shingle_len=5, bands=4, threshold=0.5
    )
    r = gr.resolve_duplicates(q, pairs)
    kept = (F.col("quality") >= 0.80) & (F.col("doc_id") == F.col("component"))
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("quality") < 0.80, 1).otherwise(0)).alias(
                "n_low_quality"
            ),
            F.sum(
                F.when(F.col("doc_id") != F.col("component"), 1).otherwise(0)
            ).alias("n_dupes_removed"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias(
                "tokens_kept"
            ),
        )
    )


@query(
    "text_bigram_xent",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '[ \t\n\r\f\x0b]+'), t -> t <> '') AS t
      FROM documents
    ),
    bg AS (
      SELECT doc_id, t[CAST(i AS INTEGER)] AS w1,
             t[CAST(i AS INTEGER) + 1] AS w2
      FROM (
        SELECT doc_id, t,
               unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i
        FROM toks
      )
    ),
    c12 AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c FROM c12 GROUP BY w1),
    v AS (
      SELECT count(DISTINCT tok) AS nv
      FROM (SELECT unnest(t) AS tok FROM toks)
    )
    SELECT bg.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           floor(-avg(ln((c12.c + 0.5) / (c1.c + 0.5 * v.nv))) * 1000000.0)
             / 1000000.0 AS xent
    FROM bg
    JOIN c12 USING (w1, w2)
    JOIN c1 USING (w1)
    CROSS JOIN v
    GROUP BY bg.doc_id
    """,
)
def text_bigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM perplexity quality signal (CCNet-style): add-0.5
    smoothed bigram cross-entropy of each document against the corpus'
    own bigram counts. High xent = out-of-distribution / noisy text.

    Plan shape: bigrams stay in-row (``arrays_zip`` of two slices, no
    explode-join); corpus counts are two groupBy's; the conditional
    count ``c1`` is derived from the bigram counts (no second pass);
    vocabulary size is a broadcast scalar. At 100 TB the count tables
    are vocabulary-sized, orders below the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    t = tx.tokens(F.col("text"))
    docs = d.select("doc_id", t.alias("t"))
    n = F.greatest(F.size("t") - 1, F.lit(0))
    bg = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, n).alias("w1"), F.slice("t", 2, n).alias("w2")
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = docs.select(F.explode("t").alias("tok")).agg(
        F.countDistinct("tok").alias("nv")
    )
    p = (F.col("c12") + F.lit(0.5)) / (F.col("c1") + F.lit(0.5) * F.col("nv"))
    return (
        bg.join(c12, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            trunc6(-F.avg(F.log(p))).alias("xent"),
        )
    )


def _cluster_label_oracle() -> str:
    kmeans = _kmeans_oracle()
    prefix = kmeans[: kmeans.rindex(" SELECT ")]  # strip the final SELECT
    return f"""{prefix},
    occ AS (
      SELECT d.doc_id,
             unnest(regexp_extract_all(lower(d.text), '([a-z]+)', 1)) AS w
      FROM documents d
    ), tagged AS (
      SELECT a.cell, o.w FROM occ o JOIN a2 a ON o.doc_id = a.vec_id
    ), cw AS (
      SELECT cell, w, count(*) AS c FROM tagged GROUP BY cell, w
    ), wt AS (
      SELECT w, CAST(sum(c) AS BIGINT) AS tw FROM cw GROUP BY w
    ), ct AS (
      SELECT cell, CAST(sum(c) AS BIGINT) AS tc FROM cw GROUP BY cell
    ), g AS (
      SELECT CAST(sum(c) AS BIGINT) AS tg FROM cw
    ), scored AS (
      SELECT cw.cell, cw.w,
             CAST(cw.c AS BIGINT) * g.tg - wt.tw * ct.tc AS lift,
             cw.c
      FROM cw JOIN wt USING (w) JOIN ct USING (cell) CROSS JOIN g
    ), ranked AS (
      SELECT cell, w, lift, c,
             row_number() OVER (PARTITION BY cell
                                ORDER BY lift DESC, w) AS rnk
      FROM scored
    )
    SELECT cell, CAST(rnk AS BIGINT) AS rnk, w AS term,
           CAST(lift AS BIGINT) AS lift, CAST(c AS BIGINT) AS n_occ
    FROM ranked WHERE rnk <= 3
    ORDER BY cell, rnk
    """


@query("cluster_label_terms", oracle=_cluster_label_oracle())
def cluster_label_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster labeling capstone: k-means cells over the embedding
    corpus (the deterministic Lloyd trajectory of ``ml_kmeans_assign``)
    labeled with each cell's 3 most DISTINCTIVE terms from the paired
    documents (vec_id ≡ doc_id in the fixture, the usual
    one-embedding-per-doc contract).

    Distinctiveness avoids float idf entirely: term w is
    over-represented in cell c iff c_count/cell_total > w_total/grand,
    tested as the BIGINT cross-multiplication
    ``lift = c_count·grand − w_total·cell_total`` — exact on any
    engine, no log, no division.

    Plan shape: the Lloyd rounds are the only embedding shuffles; the
    assignment joins the exploded token stream on doc id (1 corpus
    shuffle); (cell, term) counts aggregate map-side; the w-totals
    join is vocabulary-sized, cell totals and the grand total are
    broadcast scalars; top-3 is a window over n_cells bounded
    partitions.
    """
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    assign = sim.kmeans_assign(e, dim=64, n_cells=8, iters=2)
    occ = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
        ).alias("w"),
    )
    cw = (
        occ.join(assign, occ["doc_id"] == assign["id"])
        .groupBy("cell", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        # persisted: wt, ct, g and the scored join all read cw, and
        # each read re-ran the corpus-scale token explode + assignment
        # join (4 full passes measured in the round-11 before-plan: 73
        # parquet scans); the cached frame is vocabulary×cells-sized
        # (round 11, guide §5)
        .persist()
    )
    wt = cw.groupBy("w").agg(F.sum("c").cast("long").alias("tw"))
    ct = cw.groupBy("cell").agg(F.sum("c").cast("long").alias("tc"))
    g = cw.agg(F.sum("c").cast("long").alias("tg"))
    scored = (
        cw.join(wt, "w")
        .join(F.broadcast(ct), "cell")
        .crossJoin(F.broadcast(g))
        .select(
            "cell",
            "w",
            (F.col("c").cast("long") * F.col("tg")
             - F.col("tw") * F.col("tc")).alias("lift"),
            "c",
        )
    )
    from pyspark.sql import Window

    rnk = F.row_number().over(
        Window.partitionBy("cell").orderBy(F.col("lift").desc(), "w")
    )
    return (
        scored.withColumn("rnk", rnk.cast("long"))
        .where(F.col("rnk") <= 3)
        .select(
            "cell",
            "rnk",
            F.col("w").alias("term"),
            "lift",
            F.col("c").cast("long").alias("n_occ"),
        )
        .orderBy("cell", "rnk")
    )


#: Hard-negative mining knobs: LSH candidate planes (fewer than the
#: near-dup blocker so buckets stay candidate-rich), near-dup ceiling.
_HN_PLANES = 6
_HN_DUP_CEIL = 0.95
_HN_CAP = 256


def _hn_oracle(n_planes: int = _HN_PLANES, dim: int = 64) -> str:
    ctes = _capped_bucket_ctes(
        n_planes, 5, 3, _HN_CAP, cols="vec_id, label, embedding", dim=dim
    )
    cos = _cos_pair_sql("a.embedding", "c.embedding", dim)
    return f"""
    WITH {ctes}, b AS (
      SELECT vec_id, label, embedding, bucket FROM cbkt
    ), cand AS (
      SELECT a.vec_id AS anchor_id, a.label AS label_a,
             c.vec_id AS neg_id, c.label AS label_n,
             ({cos}) AS cos_raw
      FROM b a JOIN b c
        ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
       AND a.label <> c.label
    ), ranked AS (
      SELECT anchor_id, label_a, neg_id, label_n, cos_raw,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY cos_raw DESC, neg_id) AS rn
      FROM cand WHERE cos_raw < {_HN_DUP_CEIL}
    )
    SELECT anchor_id, label_a, neg_id, label_n,
           floor(cos_raw * 1000000.0) / 1000000.0 AS cos_sim
    FROM ranked WHERE rn = 1
    ORDER BY anchor_id
    """


@query("mine_hard_negatives", oracle=_hn_oracle())
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: per
    anchor, the most-similar vector of a DIFFERENT label (the
    gradient-richest negative), with a near-dup ceiling so mislabeled
    twins are never served as negatives.

    Plan shape: candidates come from the SAME deterministic
    random-hyperplane LSH blocking as sim_embedding_neardup; the
    within-bucket quadratic runs as the per-bucket vectorized
    ``applyInPandas`` kernel (operators/similarity.py
    hard_negatives_in_buckets) — one shuffle on the bucket key, NO
    candidate pair rows materialized (a join formulation would emit
    O(bucket²) rows and evaluate the cosine fold inside the join
    condition — the anti-pattern embedding_neardup_pairs' docstring
    measures at ~4× redundant work). Each vector lives in exactly one
    bucket, so the kernel's per-anchor argmax IS the final answer —
    no second aggregate. Bucketing is POPULATION-CAPPED
    (rp_lsh_bucket_capped, cap 256: escalating sign-bit depth + salt
    shard) so every kernel invocation is O(cap²) at any corpus size
    or skew; the DuckDB oracle replays the identical planes,
    escalation counts, salt, candidate rule, raw-double ranking and
    neg_id tie-break.
    """
    from speech_data_pipeline_spark.operators.similarity import (
        hard_negatives_in_buckets,
    )

    e = load_table(spark, sf_dir, "embeddings")
    return hard_negatives_in_buckets(
        e, n_planes=_HN_PLANES, seed=42, dup_ceiling=_HN_DUP_CEIL, dim=64,
        cap=_HN_CAP,
    ).orderBy("anchor_id")


#: Centroid quantization grid: float32 components land exactly on a
#: 2^-20 integer lattice in BOTH engines (floor after a single double
#: multiply), so per-label sums are exact BIGINTs. Cosine is scale-
#: invariant, so the SUM vector stands in for the mean — no division
#: ever happens.
_CENT_Q = 1048576.0


@query(
    "embed_label_centroids",
    oracle=f"""
    WITH q AS (
      SELECT label, CAST(i AS INTEGER) AS i,
             CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                        * {_CENT_Q!r}) AS BIGINT) AS qx
      FROM embeddings, unnest(range(1, 65)) t(i)
    ), s AS (
      SELECT label, i, CAST(sum(qx) AS BIGINT) AS sv
      FROM q GROUP BY label, i
    ), n AS (
      SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label
    ), arr AS (
      SELECT label, list(sv ORDER BY i) AS c FROM s GROUP BY label
    ), pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             a.c AS ca, b.c AS cb
      FROM arr a JOIN arr b ON a.label < b.label
    )
    SELECT label_a, label_b,
           na.n_vecs AS n_a, nb.n_vecs AS n_b,
           floor((list_sum(list_transform(range(1, 65),
                    i -> CAST(ca[i] AS DOUBLE) * CAST(cb[i] AS DOUBLE)))
                  / (sqrt(list_sum(list_transform(ca,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                     * sqrt(list_sum(list_transform(cb,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
                 * 1000000.0) / 1000000.0 AS centroid_cos
    FROM pairs
    JOIN n na ON na.label = label_a
    JOIN n nb ON nb.label = label_b
    ORDER BY label_a, label_b
    """,
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid similarity matrix — the training-mix
    diagnostic that tells you which classes/sources have collapsing
    (or drifting) embedding distributions.

    Plan shape: components quantize onto a 2^-20 integer lattice
    in-row, ONE (label, dim) grouped sum builds all centroids
    (map-side combinable, ≤ labels×64 rows cross the shuffle), arrays
    reassemble per label, and the |labels|²/2 pair matrix is a
    broadcast self-join of 10 rows. Cosine's scale-invariance lets the
    exact integer SUM vector stand in for the mean — determinism
    without a single float crossing a shuffle.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "label", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "label",
        "pos",
        F.floor(F.col("x").cast("double") * F.lit(_CENT_Q))
        .cast("long")
        .alias("qx"),
    )
    arr = (
        q.groupBy("label", "pos")
        .agg(F.sum("qx").alias("sv"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sv"))),
                lambda st: st["sv"],
            ).alias("c")
        )
    )
    n = e.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    a = arr.select(F.col("label").alias("label_a"), F.col("c").alias("ca"))
    b = arr.select(F.col("label").alias("label_b"), F.col("c").alias("cb"))
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .join(
            F.broadcast(
                n.select(
                    F.col("label").alias("label_a"),
                    F.col("n_vecs").alias("n_a"),
                )
            ),
            "label_a",
        )
        .join(
            F.broadcast(
                n.select(
                    F.col("label").alias("label_b"),
                    F.col("n_vecs").alias("n_b"),
                )
            ),
            "label_b",
        )
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            trunc6(sim.cosine(F.col("ca"), F.col("cb"))).alias(
                "centroid_cos"
            ),
        )
        .orderBy("label_a", "label_b")
    )


#: NDCG@k geometry: integer-ppm discount table 1/log2(rank+1) and its
#: prefix sums, precomputed once driver-side — both engines index the
#: SAME literal list, so no libm log2 ever runs inside a plan.
_NDCG_K = 10
_NDCG_ANCHORS = 20
_NDCG_DISC = [
    round(1_000_000 / math.log2(i + 1)) for i in range(1, _NDCG_K + 1)
]
_NDCG_PREFIX = [
    sum(_NDCG_DISC[: i + 1]) for i in range(_NDCG_K)
]


@query(
    "eval_ndcg_at_k",
    oracle=f"""
    WITH a AS (
      SELECT vec_id AS anchor_id, label AS label_a, embedding AS va
      FROM embeddings WHERE vec_id < {_NDCG_ANCHORS}
    ), cand AS (
      SELECT a.anchor_id, a.label_a,
             CASE WHEN c.label = a.label_a THEN 1 ELSE 0 END AS rel,
             row_number() OVER (
               PARTITION BY a.anchor_id
               ORDER BY list_sum(list_transform(range(1, 65),
                   i -> CAST(va[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(va,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(c.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC,
                 c.vec_id) AS rn
      FROM a JOIN embeddings c ON c.vec_id <> a.anchor_id
    ), agg AS (
      SELECT anchor_id, label_a,
             CAST(sum(rel) AS BIGINT) AS n_rel,
             CAST(sum(CASE WHEN rn <= {_NDCG_K}
                      THEN rel * ({_NDCG_DISC})[rn] ELSE 0 END)
                  AS BIGINT) AS dcg_ppm
      FROM cand GROUP BY anchor_id, label_a
    )
    SELECT anchor_id, label_a, n_rel, dcg_ppm,
           CAST(CASE WHEN n_rel = 0 THEN 0
                ELSE ({_NDCG_PREFIX})[least(n_rel, {_NDCG_K})] END
                AS BIGINT) AS idcg_ppm,
           CASE WHEN n_rel = 0 THEN 0.0
                ELSE floor(CAST(dcg_ppm AS DOUBLE)
                           / ({_NDCG_PREFIX})[least(n_rel, {_NDCG_K})]
                           * 1000000.0) / 1000000.0 END AS ndcg
    FROM agg
    ORDER BY anchor_id
    """,
)
def eval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 retrieval-quality evaluation of the embedding space
    against its own labels — the eval primitive a training pipeline
    runs after every embedding refresh: for each anchor, rank ALL
    other vectors by exact cosine, mark same-label hits relevant, and
    score the top-10 with log-discounted gain normalized by the ideal
    ranking.

    Plan shape: the anchor set is a bounded LIMIT-style slice
    broadcast against the corpus (the sim_ann_batch shape — candidate
    volume is anchors×corpus, linear in corpus for a fixed eval set);
    one per-anchor rank window; one grouped aggregate. The discount
    table and its prefix sums are integer-ppm literals indexed by
    rank — dcg/idcg cross the shuffle as exact BIGINTs and the single
    float division happens at output. Ties: raw-double cosine desc,
    then vec_id.
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.where(F.col("vec_id") < _NDCG_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("label_a"),
        F.col("embedding").alias("va"),
    )
    cand = (
        F.broadcast(a)
        .join(
            e.select(
                F.col("vec_id").alias("cand_id"),
                F.col("label").alias("label_c"),
                F.col("embedding").alias("vc"),
            ),
            F.col("cand_id") != F.col("anchor_id"),
        )
        .select(
            "anchor_id",
            "label_a",
            "cand_id",
            F.when(F.col("label_c") == F.col("label_a"), 1)
            .otherwise(0)
            .alias("rel"),
            sim.cosine(F.col("va"), F.col("vc")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_raw").desc(), "cand_id"
    )
    disc = F.array(*[F.lit(d) for d in _NDCG_DISC])
    prefix = F.array(*[F.lit(p) for p in _NDCG_PREFIX])
    # rank-filter FIRST (compiles to WindowGroupLimit: per-map-partition
    # top-k before the shuffle, so no anchor partition ever holds the
    # corpus); n_rel needs no window at all — it is label_count − 1
    # (candidates are everyone but the anchor), a broadcast-tiny join.
    top = cand.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= _NDCG_K
    )
    lc = e.groupBy(F.col("label").alias("label_a")).agg(
        F.count(F.lit(1)).alias("n_lab")
    )
    agg = (
        top.groupBy("anchor_id", "label_a")
        .agg(
            F.sum(
                F.col("rel") * F.element_at(disc, F.col("rn"))
            ).alias("dcg_ppm"),
        )
        .join(F.broadcast(lc), "label_a")
        .withColumn("n_rel", F.col("n_lab") - 1)
    )
    idcg = F.when(F.col("n_rel") == 0, F.lit(0).cast("long")).otherwise(
        F.element_at(
            prefix, F.least(F.col("n_rel"), F.lit(_NDCG_K)).cast("int")
        )
    )
    return (
        agg.withColumn("idcg_ppm", idcg.cast("long"))
        .select(
            "anchor_id",
            "label_a",
            F.col("n_rel").cast("long").alias("n_rel"),
            F.col("dcg_ppm").cast("long").alias("dcg_ppm"),
            "idcg_ppm",
            F.when(F.col("n_rel") == 0, F.lit(0.0))
            .otherwise(
                trunc6(
                    F.col("dcg_ppm").cast("double") / F.col("idcg_ppm")
                )
            )
            .alias("ndcg"),
        )
        .orderBy("anchor_id")
    )


@query(
    "eval_calibration_bins",
    oracle=f"""
    WITH feat AS (
      {_QUALITY_FEAT_SQL}
    ), scored AS (
      SELECT doc_id,
             CAST(floor({_QUALITY_RAW01_SQL} * 1000000.0) AS BIGINT) AS q_ppm,
             CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS pos
      FROM feat
    ), binned AS (
      SELECT least(9, q_ppm // 100000) AS bin, q_ppm, pos FROM scored
    )
    SELECT bin,
           count(*) AS n_docs,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(q_ppm) // count(*) AS BIGINT) AS mean_pred_ppm,
           CAST((1000000 * sum(pos)) // count(*) AS BIGINT) AS obs_ppm,
           CAST(abs(sum(q_ppm) // count(*)
                    - (1000000 * sum(pos)) // count(*)) AS BIGINT)
             AS gap_ppm
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (calibration curve) of the composite quality
    score against the weak length label the perceptron trains on —
    the model-eval step a curation pipeline runs before trusting a
    score as a keep-probability: fixed-width probability bins, each
    reporting mean predicted vs observed positive rate and the gap.

    Plan shape: scoring is the in-row quality_score algebra; binning
    is a value-based projection (NO global rank/ntile — equal-width
    probability bins are the standard reliability-diagram form AND the
    scale-safe one; an equal-count decile version would need a global
    sort); one ≤10-group aggregate ends the plan. The score is lifted
    back to its exact ppm integer (round of trunc6·1e6 — within 1e-10
    of the integer, exact in both engines), so every per-bin statistic
    crosses the shuffle as a BIGINT.
    """
    d = load_table(spark, sf_dir, "documents")
    scored = tx.quality_score(d).select(
        F.round(F.col("quality") * F.lit(1000000.0))
        .cast("long")
        .alias("q_ppm"),
        F.when(F.length("text") >= 200, 1).otherwise(0).alias("pos"),
    )
    binned = scored.select(
        F.least(F.lit(9).cast("long"), F.expr("q_ppm div 100000")).alias(
            "bin"
        ),
        "q_ppm",
        "pos",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.expr("sum(q_ppm) div count(*)").alias("mean_pred_ppm"),
            F.expr("(1000000 * sum(pos)) div count(*)").alias("obs_ppm"),
            F.expr(
                "abs(sum(q_ppm) div count(*)"
                " - (1000000 * sum(pos)) div count(*))"
            ).alias("gap_ppm"),
        )
        .orderBy("bin")
    )


#: Mutual-kNN graph knobs: neighbor-list depth, the candidate blocking
#: BASE planes (shared with hard-negative mining so both reuse the same
#: bucket geometry argument), and the population cap / escalation shape
#: of rp_lsh_bucket_capped. cap=256: one ~256-member kernel is ~65k-pair
#: NumPy work — microseconds — and at sf0.01 (max bucket 18) nothing
#: escalates, so the gate result is continuous with the fixed-plane
#: geometry while the BOUND is exercised by the sf1/sf1skew stress runs
#: (base 6 → depth-21 escalation → salt) and by the dedicated
#: embed_knn_capped_escalation gate row.
_MKNN_K = 5
_MKNN_PLANES = 6
_MKNN_CAP = 256
_MKNN_STEP = 5
_MKNN_LEVELS = 3


def _mknn_oracle(k: int = _MKNN_K, n_planes: int = _MKNN_PLANES,
                 dim: int = 64) -> str:
    ctes = _capped_bucket_ctes(
        n_planes, _MKNN_STEP, _MKNN_LEVELS, _MKNN_CAP,
        cols="vec_id, embedding", dim=dim,
    )
    cos = _cos_pair_sql("a.embedding", "c.embedding", dim)
    return f"""
    WITH {ctes}, b AS (
      SELECT vec_id, embedding, bucket FROM cbkt
    ), cand AS (
      SELECT a.vec_id AS src, c.vec_id AS dst, ({cos}) AS cos_raw
      FROM b a JOIN b c
        ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
    ), ranked AS (
      SELECT src, dst, cos_raw,
             row_number() OVER (PARTITION BY src
                                ORDER BY cos_raw DESC, dst) AS rn
      FROM cand
    ), knn AS (
      SELECT src, dst, cos_raw FROM ranked WHERE rn <= {k}
    )
    SELECT x.src AS id_a, x.dst AS id_b,
           floor(x.cos_raw * 1000000.0) / 1000000.0 AS cos_sim
    FROM knn x JOIN knn y ON y.src = x.dst AND y.dst = x.src
    WHERE x.src < x.dst
    """


@query("embed_mutual_knn", oracle=_mknn_oracle())
def embed_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN graph over the embedding corpus: an undirected edge
    (a, b) survives only if b is in a's top-k cosine neighbors AND a
    is in b's — the standard noise-robust graph for manifold methods
    and graph-clustering over embeddings (one-sided kNN edges from
    hub vectors are exactly what mutuality prunes).

    Plan shape: neighbor lists come from the per-bucket kernel
    (operators/similarity.py knn_in_buckets — n·k edge rows out, the
    n² candidates never leave the kernel) behind POPULATION-CAPPED
    bucketing (rp_lsh_bucket_capped: escalating sign-bit depth + salt
    shard → every kernel invocation O(cap²) at any corpus size or
    skew; the capping itself never shuffles the vector table — tiny
    grouped counts broadcast back); mutuality is ONE self-join of the
    edge table on the reversed pair key (hash-partitioned on n·k
    rows, not on the corpus); src < dst keeps each undirected edge
    once. Cosines ride raw until the final trunc6.
    """
    from speech_data_pipeline_spark.operators.similarity import knn_in_buckets

    e = load_table(spark, sf_dir, "embeddings")
    knn = knn_in_buckets(
        e, k=_MKNN_K, n_planes=_MKNN_PLANES, dim=64,
        cap=_MKNN_CAP, step=_MKNN_STEP, levels=_MKNN_LEVELS,
    )
    rev = knn.select(
        F.col("src").alias("dst"), F.col("dst").alias("src")
    )
    return (
        knn.join(rev, ["src", "dst"])
        .where(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("id_a"),
            F.col("dst").alias("id_b"),
            trunc6(F.col("cos_raw")).alias("cos_sim"),
        )
    )


def _knn_capped_escalation_oracle(
    k: int = 3, base: int = 6, step: int = 5, levels: int = 1,
    cap: int = 2, dim: int = 64,
) -> str:
    ctes = _capped_bucket_ctes(
        base, step, levels, cap, cols="vec_id, embedding", dim=dim
    )
    cos = _cos_pair_sql("a.embedding", "c.embedding", dim)
    return f"""
    WITH {ctes}, cand AS (
      SELECT a.vec_id AS src, c.vec_id AS dst, ({cos}) AS cos_raw
      FROM cbkt a JOIN cbkt c
        ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
    )
    SELECT src, dst,
           floor(cos_raw * 1000000.0) / 1000000.0 AS cos_sim
    FROM (
      SELECT src, dst, cos_raw,
             row_number() OVER (PARTITION BY src
                                ORDER BY cos_raw DESC, dst) AS rn
      FROM cand
    ) WHERE rn <= {k}
    """


@query("embed_knn_capped_escalation", oracle=_knn_capped_escalation_oracle())
def embed_knn_capped_escalation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN edges under DELIBERATELY tiny capped-bucketing knobs
    (cap=2, one escalation level) so the gate exercises BOTH adaptive
    paths of rp_lsh_bucket_capped at sf0.01, where the production caps
    of embed_mutual_knn / mine_hard_negatives / sim_embedding_neardup
    never escalate: every 6-bit bucket here exceeds the cap and
    escalates to 11 bits, and the 11-bit buckets still over the cap
    salt-shard by ``vec_id % ceil(pop/cap)``. The oracle replays the
    full escalation/salt assignment with windowed counts — any drift
    in the capping logic (count rule, prefix arithmetic, shard
    formula, tie-breaks) hash-mismatches here even while the
    production rows sit in their no-escalation regime.
    """
    from speech_data_pipeline_spark.operators.similarity import knn_in_buckets

    e = load_table(spark, sf_dir, "embeddings")
    return knn_in_buckets(
        e, k=3, n_planes=6, dim=64, cap=2, step=5, levels=1
    ).select("src", "dst", trunc6(F.col("cos_raw")).alias("cos_sim"))


#: sim_knn_recall_audit knobs: production capped-bucket geometry (the
#: embed_mutual_knn constants) audited against brute-force truth on a
#: deterministic 1-in-17 anchor slice, CAPPED at 2000 anchors (ids
#: below MOD*CAP): without the id bound the slice grows linearly with
#: the corpus and the brute side total is quadratic again — the bound
#: keeps the audit |corpus| x 2000 at every scale.
_RECALL_ANCHOR_MOD = 17
_RECALL_ANCHOR_CAP = 2000


def _knn_recall_oracle(
    k: int = _MKNN_K, n_planes: int = _MKNN_PLANES, dim: int = 64
) -> str:
    ctes = _capped_bucket_ctes(
        n_planes, _MKNN_STEP, _MKNN_LEVELS, _MKNN_CAP,
        cols="vec_id, embedding", dim=dim,
    )
    cos = _cos_pair_sql("a.embedding", "c.embedding", dim)
    m = _RECALL_ANCHOR_MOD
    hi = _RECALL_ANCHOR_MOD * _RECALL_ANCHOR_CAP
    return f"""
    WITH {ctes}, appr AS (
      SELECT a.vec_id AS src, c.vec_id AS dst,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY ({cos}) DESC, c.vec_id) AS rn
      FROM cbkt a JOIN cbkt c
        ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
      WHERE a.vec_id % {m} = 0 AND a.vec_id < {hi}
    ), ak AS (
      SELECT src, dst FROM appr WHERE rn <= {k}
    ), tru AS (
      SELECT a.vec_id AS src, c.vec_id AS dst,
             row_number() OVER (PARTITION BY a.vec_id
                                ORDER BY ({cos}) DESC, c.vec_id) AS rn
      FROM embeddings a JOIN embeddings c ON a.vec_id <> c.vec_id
      WHERE a.vec_id % {m} = 0 AND a.vec_id < {hi}
    ), tk AS (
      SELECT src, dst FROM tru WHERE rn <= {k}
    )
    SELECT (SELECT count(*) FROM embeddings
            WHERE vec_id % {m} = 0 AND vec_id < {hi}) AS n_anchors,
           CAST({k} AS BIGINT) AS k,
           (SELECT count(*) FROM ak JOIN tk
              ON ak.src = tk.src AND ak.dst = tk.dst) AS total_hits,
           floor(CAST((SELECT count(*) FROM ak JOIN tk
                         ON ak.src = tk.src AND ak.dst = tk.dst)
                      AS DOUBLE)
                 / (CAST((SELECT count(*) FROM embeddings
                          WHERE vec_id % {m} = 0 AND vec_id < {hi})
                    AS DOUBLE) * {float(k)})
                 * 1000000.0) / 1000000.0 AS recall_at_k
    """


@query("sim_knn_recall_audit", oracle=_knn_recall_oracle())
def sim_knn_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@k of the PRODUCTION capped-LSH kNN path
    (rp_lsh_bucket_capped + per-bucket kernel, the embed_mutual_knn
    constants) against brute-force cosine truth, on a deterministic
    1-in-{mod} anchor slice capped at {cap} anchors (ids below
    mod·cap) — the ANN self-audit every approximate index needs before
    it is trusted at 100 TB. The cap is what keeps the audit linear:
    an uncapped modulo slice grows with the corpus and turns the brute
    side quadratic again; with it the work is |corpus| × ≤{cap}
    broadcast-NL rows at every scale (measured sf1: 38s on 32 cores
    after spreading the probe side — see the repartition note below).

    Output: one row ``(n_anchors, k, total_hits, recall_at_k)`` with
    recall_at_k = total_hits / (n_anchors · k). Anchors whose bucket
    holds fewer than k neighbors contribute their shortfall to the
    denominator — bucket-isolation loss IS recall loss and is exactly
    what the audit must surface.

    Reading the number: on this synthetic corpus the audit reports
    ~0.04-0.05 — single-probe sign-LSH recovers planted NEAR-DUP
    structure (high-cosine pairs collide with high probability; see
    sim_embedding_neardup) but NOT the brute-force top-5 of an
    arbitrary anchor, whose neighbors on a near-orthogonal random
    cloud sit at weak cosine and scatter across buckets. That is the
    decision this audit exists to inform: for weak-similarity queries
    use multi-probe (sim_lsh_multiprobe) or IVF (sim_ivf_topk), and
    re-run the audit after changing geometry — low recall HERE is the
    corpus talking, not a silent property of the index.

    Plan shape: approximate side reuses the capped kernel (O(cap²)
    per bucket) filtered to anchors; truth side is a broadcast
    nested-loop of the anchor slice against the corpus (bounded build
    side, |corpus| × |anchors| work by contract) topped by a
    per-anchor k-row window; the two k·|anchors|-row lists hash-join
    on (src, dst) and three 1-row aggregates cross-attach
    (SCALAR_CROSS_WHITELIST).
    """
    from speech_data_pipeline_spark.operators.similarity import (
        cosine,
        knn_in_buckets,
    )

    e = load_table(spark, sf_dir, "embeddings").persist()
    m = _RECALL_ANCHOR_MOD
    hi = _RECALL_ANCHOR_MOD * _RECALL_ANCHOR_CAP
    is_anchor = ((F.col("vec_id") % m) == 0) & (F.col("vec_id") < hi)
    anchors = e.where(is_anchor)
    ak = (
        knn_in_buckets(
            e, k=_MKNN_K, n_planes=_MKNN_PLANES, dim=64,
            cap=_MKNN_CAP, step=_MKNN_STEP, levels=_MKNN_LEVELS,
        )
        .where(((F.col("src") % m) == 0) & (F.col("src") < hi))
        .select("src", "dst")
    )
    a = anchors.select(
        F.col("vec_id").alias("src"), F.col("embedding").alias("av")
    )
    # The corpus side arrives as 1-2 file partitions at small SF; the
    # brute NL join's cost is |anchors| x |corpus| interpreted array
    # cosines, so spread the probe side across the full core count or
    # one straggler task serializes the whole audit.
    pairs = e.repartition(64).join(
        F.broadcast(a), F.col("vec_id") != F.col("src")
    ).select(
        "src",
        F.col("vec_id").alias("dst"),
        cosine(F.col("av"), F.col("embedding")).alias("cos_raw"),
    )
    w = Window.partitionBy("src").orderBy(
        F.col("cos_raw").desc(), F.col("dst")
    )
    tk = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _MKNN_K)
        .select("src", "dst")
    )
    hits = ak.join(tk, ["src", "dst"]).agg(
        F.count(F.lit(1)).alias("total_hits")
    )
    na = anchors.agg(F.count(F.lit(1)).alias("n_anchors"))
    return na.crossJoin(hits).select(
        "n_anchors",
        F.lit(_MKNN_K).cast("long").alias("k"),
        "total_hits",
        trunc6(
            F.col("total_hits").cast("double")
            / (F.col("n_anchors").cast("double") * F.lit(float(_MKNN_K)))
        ).alias("recall_at_k"),
    )


#: Held-out perplexity filter (CCNet-style): the reference LM trains
#: on the English subset only; every document is scored against it
#: and bucketed into head/middle/tail by corpus xent terciles.
_PPL_REF_LANG = "en"


@query(
    "quality_perplexity_buckets",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(trim(text),
                         '[ \t\n\r\f\x0b]+'), t -> t <> '') AS t
      FROM documents
    ), bg AS (
      SELECT doc_id, lang, t[CAST(i AS INTEGER)] AS w1,
             t[CAST(i AS INTEGER) + 1] AS w2
      FROM (
        SELECT doc_id, lang, t,
               unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i
        FROM toks
      )
    ), rc12 AS (
      SELECT w1, w2, count(*) AS c12 FROM bg
      WHERE lang = '{_PPL_REF_LANG}' GROUP BY w1, w2
    ), rc1 AS (
      SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM rc12 GROUP BY w1
    ), rv AS (
      SELECT count(DISTINCT tok) AS nv
      FROM (SELECT unnest(t) AS tok FROM toks WHERE lang = '{_PPL_REF_LANG}')
    ), terms AS (
      SELECT bg.doc_id,
             CAST(floor(ln((coalesce(rc12.c12, 0) + 0.5)
                           / (coalesce(rc1.c1, 0) + 0.5 * rv.nv)) * 1e9)
                  AS BIGINT) AS lp
      FROM bg
      LEFT JOIN rc12 ON rc12.w1 = bg.w1 AND rc12.w2 = bg.w2
      LEFT JOIN rc1 ON rc1.w1 = bg.w1
      CROSS JOIN rv
    ), scored AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(floor(CAST(-sum(lp) AS DOUBLE) / 1e9
                        / count(*) * 1000000.0) AS BIGINT) AS xent_ppm
      FROM terms GROUP BY doc_id
    ), cdf AS (
      SELECT xent_ppm AS s, count(*) AS c FROM scored GROUP BY xent_ppm
    ), cum AS (
      SELECT s, sum(c) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
             sum(c) OVER () AS n
      FROM cdf
    ), th AS (
      SELECT min(CASE WHEN cc * 3 >= n THEN s END) AS t1,
             min(CASE WHEN cc * 3 >= 2 * n THEN s END) AS t2
      FROM cum
    )
    SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
           CAST(sc.xent_ppm AS DOUBLE) / 1000000.0 AS xent,
           CASE WHEN sc.xent_ppm IS NULL THEN 'tail'
                WHEN sc.xent_ppm <= th.t1 THEN 'head'
                WHEN sc.xent_ppm <= th.t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN scored sc ON sc.doc_id = d.doc_id
    CROSS JOIN th
    """,
)
def quality_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity filter: an add-0.5 bigram LM trained on
    the ENGLISH reference subset scores EVERY document (held-out — the
    self-trained twin is text_bigram_xent), and the corpus is cut into
    head / middle / tail at the xent terciles, the buckets a pretrain
    mix weights differently.

    Exactness: each bigram's log-prob is floor-quantized to INTEGER
    nano-nats before the per-doc sum (exact cross-shuffle); per-doc
    xent is then floor-quantized to ppm BEFORE the tercile cut, so
    thresholds and buckets are integer comparisons on both engines.

    Plan shape: reference counts are two grouped aggregates (vocab-
    sized, Zipf); scoring joins are hash equi-joins on the bigram /
    unigram key (c1 broadcast — unigram heads are small; c12 hash);
    OOV handled by left-join coalesce, never a filter; sub-2-token
    documents (no bigrams) still get a row — NULL xent, 'tail' bucket
    — so the mix never silently loses them; terciles come
    from a running sum over the DISTINCT ppm-xent table (value-domain
    bounded, whitelisted) collapsed to a 1-row broadcast threshold
    scalar.
    """
    d = load_table(spark, sf_dir, "documents")
    t = tx.tokens(F.col("text"))
    docs = d.select("doc_id", "lang", t.alias("t"))
    n = F.greatest(F.size("t") - 1, F.lit(0))
    bg = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, n).alias("w1"), F.slice("t", 2, n).alias("w2")
            )
        ).alias("b"),
    ).select("doc_id", "lang", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    ref = bg.where(F.col("lang") == _PPL_REF_LANG)
    rc12 = ref.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    rc1 = rc12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    rv = (
        docs.where(F.col("lang") == _PPL_REF_LANG)
        .select(F.explode("t").alias("tok"))
        .agg(F.countDistinct("tok").alias("nv"))
    )
    p = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(0.5)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(0.5) * F.col("nv")
    )
    terms = (
        bg.join(rc12, ["w1", "w2"], "left")
        .join(rc1, "w1", "left")
        .crossJoin(F.broadcast(rv))
        .select(
            "doc_id",
            F.floor(F.log(p) * F.lit(1e9)).cast("long").alias("lp"),
        )
    )
    scored = terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.floor(
            (-F.sum("lp")).cast("double")
            / F.lit(1e9)
            / F.count(F.lit(1))
            * F.lit(1e6)
        )
        .cast("long")
        .alias("xent_ppm"),
    )
    cdf = scored.groupBy("xent_ppm").agg(F.count(F.lit(1)).alias("c"))
    w_run = Window.orderBy("xent_ppm").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = cdf.select(
        F.col("xent_ppm").alias("s"),
        F.sum("c").over(w_run).alias("cc"),
        F.sum("c").over(w_all).alias("n"),
    )
    th = cum.agg(
        F.min(F.when(F.col("cc") * 3 >= F.col("n"), F.col("s"))).alias("t1"),
        F.min(
            F.when(F.col("cc") * 3 >= 2 * F.col("n"), F.col("s"))
        ).alias("t2"),
    )
    alldocs = d.select("doc_id")
    return (
        alldocs.join(scored, "doc_id", "left")
        .crossJoin(F.broadcast(th))
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            (F.col("xent_ppm").cast("double") / F.lit(1e6)).alias("xent"),
            F.when(F.col("xent_ppm").isNull(), "tail")
            .when(F.col("xent_ppm") <= F.col("t1"), "head")
            .when(F.col("xent_ppm") <= F.col("t2"), "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


# ---------------------------------------------------------------------------
# Winnowing (MOSS) fingerprints
# ---------------------------------------------------------------------------

_WINNOW_K = 8
_WINNOW_W = 4


def _winnow_cte(src: str = "documents") -> str:
    """DuckDB CTE replaying winnowing: k-gram hex7 hashes, w-window
    rightmost-min selection, distinct (pos, fp) — shared by the
    fingerprint and pair-score oracles. ``src`` must expose
    (doc_id, text)."""
    k, w = _WINNOW_K, _WINNOW_W
    h = _hex7_to_int_sql("md5(substr(text, CAST(i AS INTEGER), %d))" % k)
    sl = "list_slice(grams, CAST(j AS INTEGER), CAST(j + %d AS INTEGER))" % (
        w - 1
    )
    return f"""
    g AS (
      SELECT doc_id AS id,
             list_transform(
               range(1, greatest(length(text) - {k - 1}, 1) + 1),
               i -> {h}) AS grams
      FROM {src}
    ), wins AS (
      -- (pos, fp) packed into one BIGINT (fp is 28 bits: 7 hex
      -- nibbles) because DuckDB's list_distinct lacks struct support
      SELECT id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(grams) - {w - 1}, 1) + 1),
               j -> (j + len({sl})
                     - list_position(list_reverse({sl}),
                                     list_min({sl}))) * 268435456
                    + list_min({sl})))) AS code
      FROM g
    ), fps AS (
      SELECT id, code // 268435456 AS pos,
             code % 268435456 AS fp
      FROM wins
    )"""


@query(
    "text_winnow_fingerprints",
    oracle=f"""
    WITH {_winnow_cte()}
    SELECT id, pos, fp FROM fps
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint selection — every selected
    ``(doc, shingle-pos, hash)`` — the local document-fingerprint
    algorithm that guarantees any shared substring of length
    ≥ w+k−1 = 11 chars yields a shared fingerprint while keeping
    ~2/(w+1) of the hashes (Schleimer/Wilkerson/Aiken, SIGMOD'03).

    Engine path: pure in-row array algebra per document (see
    operators/text.py:winnow_fingerprints) — the corpus never
    shuffles; the exploded selection is the output.
    """
    d = load_table(spark, sf_dir, "documents")
    return tx.winnow_fingerprints(
        d, k=_WINNOW_K, w=_WINNOW_W
    ).select(
        "id", "pos", F.col("fp").cast("long").alias("fp")
    )


@query(
    "dedup_winnow_pairs",
    oracle=f"""
    WITH reps AS (
      -- exact-collapse (operators/dedup.py EXACT_COLLAPSE_SQL)
      {_EXACT_COLLAPSE}
    ), {_winnow_cte(src="reps")}, sets AS (
      SELECT DISTINCT id, fp FROM fps
    ), sizes AS (
      SELECT id, count(*) AS n FROM sets GROUP BY id
    ), dfreq AS (
      SELECT fp, count(*) AS df FROM sets GROUP BY fp
    ), rare AS (
      SELECT s.id, s.fp FROM sets s JOIN dfreq f ON s.fp = f.fp
      WHERE f.df <= 20
    ), inter AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
      FROM rare a JOIN rare b ON a.fp = b.fp AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id_a, id_b, n_shared,
           floor(CAST(n_shared AS DOUBLE)
                 / CAST(least(sa.n, sb.n) AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS containment
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE CAST(n_shared AS DOUBLE)
          / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.2
    """,
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style overlap report: document pairs sharing winnowing
    fingerprints, scored by containment ``|A∩B| / min(|A|,|B|)`` —
    the plagiarism/boilerplate detector built on
    :func:`text_winnow_fingerprints`.

    100 TB shape: pairs meet ONLY through a shared-fingerprint
    equi-join; the document-frequency cap (df ≤ 20, the
    dedup_ngram_jaccard contract) bounds per-fingerprint fanout so a
    boilerplate fingerprint never goes quadratic.
    """
    d = load_table(spark, sf_dir, "documents")
    # exact-collapse to min-id representatives (the sim_allpairs_prefix
    # contract): identical texts share every fingerprint, so a
    # duplicate mega-cluster would pairwise-qualify at containment 1.0
    # — those pairs are dedup_exact's output, not a near-dup's
    reps = dd.exact_collapse_reps(d)
    fps = tx.winnow_fingerprints(reps, k=_WINNOW_K, w=_WINNOW_W)
    sets = fps.select("id", "fp").distinct()
    sizes = sets.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = sets.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    rare = (
        sets.join(dfreq, "fp")
        .where(F.col("df") <= 20)
        .select("id", "fp")
    )
    a = rare.alias("a")
    b = rare.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(
        F.col("id").alias("id_a"), F.col("n").alias("na")
    )
    sb = sizes.select(
        F.col("id").alias("id_b"), F.col("n").alias("nb")
    )
    scored = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "c_raw",
            F.col("n_shared").cast("double")
            / F.least("na", "nb").cast("double"),
        )
        .where(F.col("c_raw") >= 0.2)
    )
    return scored.select(
        "id_a", "id_b", "n_shared", trunc6(F.col("c_raw")).alias("containment")
    )


@query(
    "sim_allpairs_prefix",
    oracle=f"""
    WITH reps AS (
      -- exact-collapse (operators/dedup.py EXACT_COLLAPSE_SQL)
      {_EXACT_COLLAPSE}
    ), toks AS (
      SELECT doc_id AS id,
             regexp_extract_all(lower(text), '[a-z]+') AS t
      FROM reps
    ), sets AS (
      SELECT id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 0) + 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS arr
      FROM toks
    ), sized AS (
      SELECT id, arr, len(arr) AS n FROM sets WHERE len(arr) > 0
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             len(list_intersect(a.arr, b.arr)) AS n_overlap,
             a.n AS na, b.n AS nb
      FROM sized a JOIN sized b ON a.id < b.id
    )
    SELECT id_a, id_b, n_overlap,
           floor(CAST(n_overlap AS DOUBLE)
                 / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS cosine
    FROM pairs
    WHERE n_overlap * n_overlap * 2 >= na * nb
    """,
)
def sim_allpairs_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs set-cosine join at t = 1/√2 ≈ 0.707 over
    distinct word 3-gram sets via Bayardo prefix filtering (see
    operators/dedup.py:allpairs_prefix_cosine) — the deterministic
    complement to MinHash: EVERY qualifying pair, no banding
    approximation. Word 3-grams (not unigrams) make the feature space
    discriminative: stopword-sharing pushes every unigram pair above
    any usable threshold on this corpus. Identical texts are
    exact-collapsed to a min-id representative FIRST (the
    minhash_dedup_pairs_collapsed contract) so a mega-cluster of
    byte-identical copies costs one node, never cluster² pairs —
    within-cluster duplicate pairs are dedup_exact's output. The
    oracle verifies completeness with the brute O(n²) pairwise form
    over the same representatives.

    DIAGNOSTIC / EXACT-BY-CONTRACT at web scale: 100% recall costs
    Σdf² candidate work — measured 2674s (90×/decade) at the sf10
    spot-bench. Production entry points: ``sim_allpairs_blocked``
    (exact scores, LSH-bounded candidates — drop-in schema) when exact
    similarity values are needed, ``dedup_minhash_lsh`` when the
    MinHash estimate suffices. Reserve this global form for blocked
    subsets / audits.
    """
    d = load_table(spark, sf_dir, "documents")
    reps = dd.exact_collapse_reps(d)
    return dd.allpairs_prefix_cosine(reps, t2_num=1, t2_den=2, ngram_n=3)


@query(
    "sim_allpairs_blocked",
    oracle=f"""
    WITH reps AS (
      {_EXACT_COLLAPSE}
    ), {_minhash_sigs_cte(k=16, shingle_len=5, src="reps")}, cands AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sigs a JOIN sigs b ON a.id < b.id
      WHERE ({_band_share_sql(k=16, bands=4)})
    ), toks AS (
      SELECT doc_id AS id,
             regexp_extract_all(lower(text), '[a-z]+') AS t
      FROM reps
    ), sets AS (
      SELECT id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 0) + 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS arr
      FROM toks
    ), sized AS (
      SELECT id, arr, len(arr) AS n FROM sets WHERE len(arr) > 0
    ), scored AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(a.arr, b.arr)) AS n_overlap,
             a.n AS na, b.n AS nb
      FROM cands c
      JOIN sized a ON a.id = c.id_a
      JOIN sized b ON b.id = c.id_b
    )
    SELECT id_a, id_b, n_overlap,
           floor(CAST(n_overlap AS DOUBLE)
                 / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS cosine
    FROM scored
    WHERE n_overlap * n_overlap * 2 >= na * nb
    """,
)
def sim_allpairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION exact-score similarity join: TRUE binary cosine over
    word 3-gram sets (same scoring expression and output schema as
    ``sim_allpairs_prefix``) computed only for pairs colliding in ≥1
    MinHash/LSH band — candidate volume bounded by the banding instead
    of Σdf², recall = the LSH collision probability instead of 100%
    (operators/dedup.py:allpairs_blocked_cosine). Identical texts are
    exact-collapsed first (the shared mega-cluster contract).

    This is the bounded exact sibling the sf10 audit called for: the
    global 100%-recall form (`sim_allpairs_prefix`) measured
    90×/decade at sf10 (quadratic by contract); this composition does
    one signature pass + one band shuffle + per-candidate in-row
    array_intersect — the same ~linear-per-decade family as
    ``dedup_minhash_lsh``, while emitting EXACT scores.

    The oracle replays the identical composition in DuckDB: collapse →
    signature CTE (shared fragment with the minhash oracles) → O(n²)
    pairwise band-collision candidates → exact 3-gram cosine at
    t² = 1/2.
    """
    d = load_table(spark, sf_dir, "documents")
    reps = dd.exact_collapse_reps(d)
    return dd.allpairs_blocked_cosine(
        reps, t2_num=1, t2_den=2, ngram_n=3, k=16, shingle_len=5, bands=4
    )


#: sim_blocked_recall slice knobs: the audit's ground-truth side is the
#: Σdf² exact all-pairs join, affordable only on a BOUNDED document
#: slice — so the bound lives in code, not prose (the sim_knn_recall
#: audit's anchor-cap pattern): reps with ``doc_id % MOD == 0 AND
#: doc_id < MOD·CAP``. At sf0.01 that is ~half the corpus (ids 0-499);
#: from sf0.1 on it is a FIXED ≤2000-rep slice, so the exact side is
#: ≤2000² prefix-filtered work at every scale, never corpus-quadratic.
_BLK_RECALL_MOD = 2
_BLK_RECALL_CAP = 2000


@query(
    "sim_blocked_recall",
    oracle=f"""
    WITH reps AS (
      {_EXACT_COLLAPSE}
    ), srep AS (
      SELECT * FROM reps
      WHERE doc_id % {_BLK_RECALL_MOD} = 0
        AND doc_id < {_BLK_RECALL_MOD * _BLK_RECALL_CAP}
    ), {_minhash_sigs_cte(k=16, shingle_len=5, src="srep")}, cands AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sigs a JOIN sigs b ON a.id < b.id
      WHERE ({_band_share_sql(k=16, bands=4)})
    ), toks AS (
      SELECT doc_id AS id,
             regexp_extract_all(lower(text), '[a-z]+') AS t
      FROM srep
    ), sets AS (
      SELECT id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 0) + 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS arr
      FROM toks
    ), sized AS (
      SELECT id, arr, len(arr) AS n FROM sets WHERE len(arr) > 0
    ), exact AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sized a JOIN sized b ON a.id < b.id
      WHERE len(list_intersect(a.arr, b.arr))
            * len(list_intersect(a.arr, b.arr)) * 2 >= a.n * b.n
    ), blocked AS (
      SELECT e.id_a, e.id_b
      FROM exact e JOIN cands c ON c.id_a = e.id_a AND c.id_b = e.id_b
    )
    SELECT (SELECT count(*) FROM exact) AS n_exact,
           (SELECT count(*) FROM blocked) AS n_blocked,
           floor(CAST((SELECT count(*) FROM blocked) AS DOUBLE)
                 / greatest(CAST((SELECT count(*) FROM exact) AS DOUBLE),
                            1.0)
                 * 1000000.0) / 1000000.0 AS recall
    """,
)
def sim_blocked_recall(
    spark: SparkSession,
    sf_dir: str,
    slice_mod: int | None = _BLK_RECALL_MOD,
    slice_cap: int = _BLK_RECALL_CAP,
) -> DataFrame:
    """Measured pair RECALL of the LSH blocking behind
    ``sim_allpairs_blocked``: what fraction of the exact join's
    qualifying pairs (``sim_allpairs_prefix`` semantics, t = 1/√2)
    survive the band-collision candidate filter. Turns the 'recall is
    the LSH collision probability' contract into a number the corpus
    owner can track — the standard production audit before trusting an
    approximate path at full scale.

    The quadratic ground-truth side runs on a CODE-ENFORCED document
    slice (rep ids with ``doc_id % slice_mod == 0 AND doc_id <
    slice_mod·slice_cap`` — the ``sim_knn_recall_audit`` anchor-cap
    pattern), so the exact join is ≤ slice_cap² prefix-filtered work at
    every scale instead of corpus-quadratic. Band collision of a pair
    depends only on the two endpoints' signatures, so restricting BOTH
    sides to the slice leaves the recall definition unchanged on the
    slice. Pass ``slice_mod=None`` to run the full-corpus diagnostic
    form deliberately (the pre-round-8 behavior) — never the gate row.

    Output: one row ``(n_exact, n_blocked, recall)``. ``n_blocked``
    counts exact-qualifying pairs that are ALSO band candidates, so
    n_blocked ≤ n_exact by construction and recall = n_blocked /
    n_exact (1.0 when the blocking loses nothing at this scale).

    Plan shape: the exact side is the prefix-filtered join over the
    ≤ slice_cap-rep slice; band-candidate KEYS (same slice) left-join
    it on the pair key and ONE aggregate emits both counts — a single
    action with the bounded-quadratic subtree appearing exactly once.
    """
    d = load_table(spark, sf_dir, "documents")
    reps = dd.exact_collapse_reps(d)
    if slice_mod is not None:
        reps = reps.where(
            ((F.col("doc_id") % slice_mod) == 0)
            & (F.col("doc_id") < slice_mod * slice_cap)
        )
    exact = dd.allpairs_prefix_cosine(
        reps, t2_num=1, t2_den=2, ngram_n=3
    ).select("id_a", "id_b")
    # Candidate KEYS only — an exact-qualifying pair is blocked-recalled
    # iff it collides in >= 1 band, so re-scoring candidates
    # (allpairs_blocked_cosine) is redundant here: exact ∩ band-keys ==
    # exact ∩ blocked-qualifying by definition. One left join + ONE
    # aggregate keeps the quadratic exact side in a single plan subtree
    # (the previous two-branch crossJoin consumed the persisted exact
    # relation from two concurrent AQE stages — a cache-population race
    # that re-ran the quadratic join and showed up as 25s/102s/283s
    # run-to-run spread at sf1; this shape measures 1.12x across 3 runs).
    sigs = dd.minhash_signatures(reps, "doc_id", "text", k=16, shingle_len=5)
    cand = dd.lsh_candidate_pairs(sigs, bands=4, rows_per_band=4).withColumn(
        "hit", F.lit(1)
    )
    j = exact.join(cand, ["id_a", "id_b"], "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("hit").alias("n_blocked"),
        trunc6(
            F.count("hit").cast("double")
            / F.greatest(F.count(F.lit(1)).cast("double"), F.lit(1.0))
        ).alias("recall"),
    )


@query(
    "sim_blocked_precision",
    oracle=f"""
    WITH reps AS (
      {_EXACT_COLLAPSE}
    ), {_minhash_sigs_cte(k=16, shingle_len=5, src="reps")}, cands AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sigs a JOIN sigs b ON a.id < b.id
      WHERE ({_band_share_sql(k=16, bands=4)})
    ), toks AS (
      SELECT doc_id AS id,
             regexp_extract_all(lower(text), '[a-z]+') AS t
      FROM reps
    ), sets AS (
      SELECT id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 0) + 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS arr
      FROM toks
    ), sized AS (
      SELECT id, arr, len(arr) AS n FROM sets WHERE len(arr) > 0
    ), qual AS (
      SELECT c.id_a, c.id_b
      FROM cands c
      JOIN sized a ON a.id = c.id_a
      JOIN sized b ON b.id = c.id_b
      WHERE len(list_intersect(a.arr, b.arr))
            * len(list_intersect(a.arr, b.arr)) * 2 >= a.n * b.n
    )
    SELECT (SELECT count(*) FROM cands) AS n_cands,
           (SELECT count(*) FROM qual) AS n_qualifying,
           floor(CAST((SELECT count(*) FROM qual) AS DOUBLE)
                 / greatest(CAST((SELECT count(*) FROM cands) AS DOUBLE),
                            1.0)
                 * 1000000.0) / 1000000.0 AS precision
    """,
)
def sim_blocked_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured pair PRECISION of the LSH blocking behind
    ``sim_allpairs_blocked`` — the companion of ``sim_blocked_recall``
    (together they are the full blocking audit): what fraction of the
    band-collision candidate pairs actually qualify at the exact
    t = 1/√2 cosine threshold. Low precision means the banding wastes
    exact-scoring work on false candidates (too few bands / rows per
    band for the corpus' similarity profile); the corpus owner tunes
    (bands, k) against BOTH dials before a full-scale run.

    Output: one row ``(n_cands, n_qualifying, precision)`` with
    n_qualifying ≤ n_cands by construction.

    Plan shape: ONE pass over blocked_overlap_pairs — the band kernel
    runs once, every candidate carries its exact (ov, na, nb), and a
    single aggregate counts candidates and in-row evaluates the
    qualification predicate (round 8: the previous shape evaluated
    the candidate chain twice — once bare for n_cands, once inside
    the scoring composition for n_qualifying — making this the most
    expensive registry row at 7.4s/sf0.1; the one-pass form halves
    the work with identical counts, since qual ⊆ cand and the
    predicate is a per-row integer comparison). The count keeps the
    original contract — every band-collision pair counts, including
    pairs whose side has an empty gram set (left-joined, never
    qualifying). Unlike the recall audit there is NO quadratic side —
    safe on the full corpus at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    reps = dd.exact_collapse_reps(d)
    sigs = dd.minhash_signatures(reps, "doc_id", "text", k=16, shingle_len=5)
    cand = dd.lsh_candidate_pairs(sigs, bands=4, rows_per_band=4)
    features = dd.word_ngrams(F.col("text"), 3)
    sets = (
        reps.select(
            F.col("doc_id").alias("id"),
            F.array_distinct(features).alias("arr"),
        )
        .withColumn("n", F.size("arr").cast("long"))
        .where(F.col("n") > 0)
    )
    va = sets.select(
        F.col("id").alias("id_a"), F.col("arr").alias("arr_a"),
        F.col("n").alias("na"),
    )
    vb = sets.select(
        F.col("id").alias("id_b"), F.col("arr").alias("arr_b"),
        F.col("n").alias("nb"),
    )
    scored = (
        cand.join(va, "id_a", "left")
        .join(vb, "id_b", "left")
        .select(
            F.when(
                F.col("arr_a").isNotNull() & F.col("arr_b").isNotNull(),
                F.size(F.array_intersect("arr_a", "arr_b")).cast("long"),
            ).alias("ov"),
            "na",
            "nb",
        )
    )
    q = (
        F.col("ov").isNotNull()
        & (F.col("ov") * F.col("ov") * 2 >= F.col("na") * F.col("nb"))
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_cands"),
        F.sum(q.cast("long")).alias("n_qualifying"),
        trunc6(
            F.sum(q.cast("long")).cast("double")
            / F.greatest(F.count(F.lit(1)).cast("double"), F.lit(1.0))
        ).alias("precision"),
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection
# ---------------------------------------------------------------------------


def _jl_oracle(in_dim: int = 64, out_dim: int = 16) -> str:
    from speech_data_pipeline_spark.operators.similarity import (
        jl_sign_matrix,
    )

    signs = jl_sign_matrix(in_dim, out_dim)
    scale = 1.0 / float(out_dim) ** 0.5
    coords = ", ".join(
        f"floor(list_sum(list_transform(range(1, {in_dim} + 1),"
        f" i -> CAST(embedding[i] AS DOUBLE)"
        f" * ([{', '.join(f'{v}.0' for v in signs[j])}])[i]))"
        f" * {scale!r} * 1000000.0) / 1000000.0"
        for j in range(out_dim)
    )
    return f"""
    SELECT vec_id AS id, [{coords}] AS proj FROM embeddings
    """


@query("embed_random_projection", oracle=_jl_oracle())
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-d → 16-d Johnson–Lindenstrauss ±1 projection of the corpus
    embeddings (see operators/similarity.py:random_projection) — the
    cheap pre-reduction in front of ANN/clustering when PCA's
    corpus passes are not worth it.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return sim.random_projection(e, in_dim=64, out_dim=16)


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance diverse selection
# ---------------------------------------------------------------------------

_MMR_M = 20  # candidate pool (top-m by relevance)
_MMR_K = 6  # selections
# λ = 0.7 as exact integer weights on the ppm grid: score_e7 =
# 7·rel_ppm − 3·maxsim_ppm (monotone-equal to 0.7·rel − 0.3·maxsim)
_MMR_LN, _MMR_LD = 7, 3


def _mmr_oracle() -> str:
    cos_q = _cos_pair_sql("e.embedding", "q.qv")
    cos_ab = _cos_pair_sql("a.embedding", "b.embedding")
    parts = [
        f"""q AS MATERIALIZED (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS MATERIALIZED (
      SELECT e.vec_id, e.embedding,
             CAST(floor(({cos_q}) * 1000000.0) AS BIGINT) AS rel_ppm
      FROM embeddings e, q
    ),
    cand AS MATERIALIZED (
      SELECT * FROM scored ORDER BY rel_ppm DESC, vec_id LIMIT {_MMR_M}
    ),
    sims AS MATERIALIZED (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             CAST(floor(({cos_ab}) * 1000000.0) AS BIGINT) AS s_ppm
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    sel1 AS (
      SELECT vec_id, rel_ppm, 1 AS rank,
             {_MMR_LN} * rel_ppm AS score_e7
      FROM cand ORDER BY rel_ppm DESC, vec_id LIMIT 1
    )"""
    ]
    for t in range(2, _MMR_K + 1):
        prev = f"sel{t - 1}"
        parts.append(f"""
    pick{t} AS (
      SELECT c.vec_id, c.rel_ppm, {t} AS rank,
             {_MMR_LN} * c.rel_ppm - {_MMR_LD} * ms.m AS score_e7
      FROM cand c
      JOIN (SELECT ia, max(s_ppm) AS m FROM sims
            WHERE ib IN (SELECT vec_id FROM {prev}) GROUP BY ia) ms
        ON ms.ia = c.vec_id
      WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})
      ORDER BY score_e7 DESC, c.vec_id LIMIT 1
    ),
    sel{t} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL SELECT * FROM pick{t})""")
    return (
        "WITH " + ",".join(parts)
        + f"""
    SELECT CAST(rank AS INTEGER) AS rank, vec_id,
           CAST(rel_ppm AS DOUBLE) / 1000000.0 AS rel,
           CAST(score_e7 AS DOUBLE) / 10000000.0 AS mmr_score
    FROM sel{_MMR_K}"""
    )


@query("select_mmr_diverse", oracle=_mmr_oracle())
def select_mmr_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell/Goldstein, SIGIR'98)
    diverse top-k: greedily pick ``argmax λ·rel(c) − (1−λ)·max_{s∈S}
    sim(c,s)`` from the top-m relevance pool — the standard
    redundancy-free retrieval / training-data selection head.

    Determinism: relevance and pairwise cosines quantize to ppm
    integers IMMEDIATELY (the sim_cosine_topk convention), so every
    greedy comparison is integer with a vec_id tie-break; λ = 0.7
    becomes exact integer weights 7/3 on the e7 grid. The driver-side
    pairwise cosine folds per-dimension LEFT-TO-RIGHT — the repo-wide
    fold rule (≡ F.aggregate ≡ DuckDB list_sum), never numpy BLAS.

    Plan shape: the ONLY corpus-sized work is one TakeOrdered(m=20)
    relevance pool (per-partition heap, k-row driver merge); the k−1
    greedy rounds run driver-side over that m-row pool — a documented
    sketch-sized round-trip (m·k constant, the CMS-collect contract),
    exactly how a production reranker treats its candidate head.
    """
    e = load_table(spark, sf_dir, "embeddings")
    qv = F.array(*[F.lit(x) for x in _query_vec(spark, sf_dir)])
    scored = e.select(
        "vec_id",
        "embedding",
        F.floor(sim.cosine(F.col("embedding"), qv) * F.lit(1e6))
        .cast("long")
        .alias("rel_ppm"),
    )
    cand = (
        scored.orderBy(F.col("rel_ppm").desc(), F.col("vec_id"))
        .limit(_MMR_M)
        .collect()
    )

    def cos_ppm(a, b):
        # strict left-to-right fold, matching F.aggregate / list_sum
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        for x in a:
            na += float(x) * float(x)
        for y in b:
            nb += float(y) * float(y)
        import math

        return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6)

    pool = [
        (r["vec_id"], r["rel_ppm"], list(r["embedding"])) for r in cand
    ]
    sims = {
        (pa[0], pb[0]): cos_ppm(pa[2], pb[2])
        for pa in pool
        for pb in pool
        if pa[0] != pb[0]
    }
    first = max(pool, key=lambda p: (p[1], -p[0]))
    out = [(1, first[0], first[1], _MMR_LN * first[1])]
    chosen = {first[0]}
    for t in range(2, _MMR_K + 1):
        best = None
        for vid, rel_ppm, _ in pool:
            if vid in chosen:
                continue
            ms = max(sims[(vid, s)] for s in chosen)
            score = _MMR_LN * rel_ppm - _MMR_LD * ms
            key = (score, -vid)
            if best is None or key > best[0]:
                best = (key, vid, rel_ppm, score)
        if best is None:  # pool exhausted (<k candidates): degrade to
            break  # fewer rows, matching the oracle's empty pick CTE
        out.append((t, best[1], best[2], best[3]))
        chosen.add(best[1])
    res = spark.createDataFrame(
        out, "rank int, vec_id long, rel_ppm long, score_e7 long"
    )
    return res.select(
        "rank",
        "vec_id",
        (F.col("rel_ppm").cast("double") / F.lit(1e6)).alias("rel"),
        (F.col("score_e7").cast("double") / F.lit(1e7)).alias(
            "mmr_score"
        ),
    )


# ---------------------------------------------------------------------------
# k-center coreset (farthest-first traversal)
# ---------------------------------------------------------------------------

_KC_K = 5


def _sqdist_sql(a: str, b: str, dim: int = 64) -> str:
    """DuckDB squared L2 between two list columns, fold-order-exact."""
    return f"""
        list_sum(list_transform(range(1, {dim} + 1),
            i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))
                 * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))
    """


def _kcenter_oracle() -> str:
    parts = [
        """sel1 AS MATERIALIZED (
      SELECT vec_id, embedding, 1 AS rank, CAST(0 AS BIGINT) AS d_ppm
      FROM embeddings WHERE vec_id = 0
    )"""
    ]
    for t in range(2, _KC_K + 1):
        prev = f"sel{t - 1}"
        d = _sqdist_sql("e.embedding", "s.embedding")
        parts.append(f"""
    md{t} AS MATERIALIZED (
      SELECT e.vec_id, e.embedding,
             min(CAST(floor(({d}) * 1000000.0) AS BIGINT)) AS d_ppm
      FROM embeddings e, {prev} s
      GROUP BY e.vec_id, e.embedding
    ),
    pick{t} AS MATERIALIZED (
      SELECT vec_id, embedding, {t} AS rank, d_ppm
      FROM md{t} WHERE vec_id NOT IN (SELECT vec_id FROM {prev})
      ORDER BY d_ppm DESC, vec_id LIMIT 1
    ),
    sel{t} AS MATERIALIZED (
      SELECT * FROM {prev} UNION ALL SELECT * FROM pick{t}
    )""")
    return (
        "WITH " + ",".join(parts)
        + f"""
    SELECT CAST(rank AS INTEGER) AS rank, vec_id,
           CAST(d_ppm AS DOUBLE) / 1000000.0 AS sq_dist
    FROM sel{_KC_K}"""
    )


@query("select_kcenter_coreset", oracle=_kcenter_oracle())
def select_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (Gonzalez farthest-first traversal, the
    2-approximation): start from vec_id 0, then repeatedly add the
    point MAXIMIZING its squared distance to the selected set — the
    coverage-style data-selection head (pick maximally spread
    exemplars), complementing MMR's relevance-diversity blend.

    Determinism: per-point min-squared-distances quantize to ppm
    integers (left-to-right fold per pair — the repo fold rule);
    argmax is integer with a vec_id tie-break.

    Plan shape: k−1 rounds × (ONE corpus scan computing the in-row
    min distance against the ≤k BROADCAST selected vectors — plan
    literals collected one row per round, the documented bounded
    round-trip — + ONE TakeOrdered(1)). No pairwise table, no
    corpus shuffle, ever.
    """
    e = load_table(spark, sf_dir, "embeddings")
    first = (
        e.where(F.col("vec_id") == 0)
        .select("vec_id", "embedding")
        .first()
    )
    selected = [(1, int(first["vec_id"]), [float(x) for x in first["embedding"]], 0)]
    for t in range(2, _KC_K + 1):
        chosen_ids = [s[1] for s in selected]
        dists = [
            F.floor(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding"),
                        F.array(*[F.lit(x) for x in vec]),
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                * F.lit(1e6)
            ).cast("long")
            for (_, _, vec, _) in selected
        ]
        pick = (
            e.where(~F.col("vec_id").isin(chosen_ids))
            .select(
                "vec_id",
                "embedding",
                F.least(*dists).alias("d_ppm")
                if len(dists) > 1
                else dists[0].alias("d_ppm"),
            )
            .orderBy(F.col("d_ppm").desc(), F.col("vec_id"))
            .limit(1)
            .first()
        )
        selected.append(
            (
                t,
                int(pick["vec_id"]),
                [float(x) for x in pick["embedding"]],
                int(pick["d_ppm"]),
            )
        )
    res = spark.createDataFrame(
        [(r, v, d) for (r, v, _, d) in selected],
        "rank int, vec_id long, d_ppm long",
    )
    return res.select(
        "rank",
        "vec_id",
        (F.col("d_ppm").cast("double") / F.lit(1e6)).alias("sq_dist"),
    )


# ---------------------------------------------------------------------------
# Prefix autocomplete top-k
# ---------------------------------------------------------------------------


@query(
    "search_prefix_topk",
    oracle="""
    WITH vocab AS (
      SELECT word, count(*) AS freq FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        FROM documents
      ) GROUP BY word
    ), pfx AS (
      SELECT substr(word, 1, 3) AS prefix, word, freq,
             row_number() OVER (PARTITION BY substr(word, 1, 3)
                                ORDER BY freq DESC, word) AS rank
      FROM vocab WHERE length(word) >= 3
    )
    SELECT prefix, CAST(rank AS INTEGER) AS rank, word,
           CAST(freq AS BIGINT) AS freq
    FROM pfx WHERE rank <= 3
    """,
)
def search_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete index: top-3 completions by corpus frequency for
    every 3-char prefix (frequency-then-lexicographic tie-break) —
    the query-suggestion table a search box serves.

    Plan shape: the corpus collapses to the vocabulary (one grouped
    count); the per-prefix rank compiles to WindowGroupLimit (per-map-
    partition top-k BEFORE the shuffle), partitioned by prefix —
    bounded per group by vocabulary, never corpus rows.
    """
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("([a-z]+)"), 1
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy(F.substring("word", 1, 3)).orderBy(
        F.col("freq").desc(), F.col("word")
    )
    return (
        vocab.where(F.length("word") >= 3)
        .select(
            F.substring("word", 1, 3).alias("prefix"),
            F.row_number().over(w).alias("rank"),
            "word",
            F.col("freq").cast("long").alias("freq"),
        )
        .where(F.col("rank") <= 3)
    )


# ---------------------------------------------------------------------------
# Readability (Flesch) scoring
# ---------------------------------------------------------------------------


@query(
    "text_readability",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(text), '[a-z]+')) AS w,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl
      FROM documents
    )
    SELECT doc_id, CAST(w AS BIGINT) AS n_words,
           CAST(s AS BIGINT) AS n_sentences,
           CAST(syl AS BIGINT) AS n_syllables,
           CASE WHEN w > 0 THEN
             floor((206.835
                    - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                    - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)))
                   * 1000000.0) / 1000000.0
           END AS flesch,
           CASE WHEN w > 0 THEN
             floor((0.39 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                    + 11.8 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))
                    - 15.59)
                   * 1000000.0) / 1000000.0
           END AS fk_grade
    FROM c
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade per document, with
    the standard vowel-group syllable heuristic — the classic
    readability gate a quality-filter stack runs next to
    text_quality_score's surface features.

    Pure in-row column algebra (three regexp counts + two fixed
    formulas); integer counts, per-row double assembly, trunc6.
    """
    d = load_table(spark, sf_dir, "documents")
    w = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
    ).cast("long")
    s = F.greatest(
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("([.!?]+)"), 1)
        ),
        F.lit(1),
    ).cast("long")
    syl = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("([aeiouy]+)"), 1
        )
    ).cast("long")
    c = d.select(
        "doc_id", w.alias("w"), s.alias("s"), syl.alias("syl")
    )
    dbl = lambda col: F.col(col).cast("double")  # noqa: E731
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (dbl("w") / dbl("s"))
        - F.lit(84.6) * (dbl("syl") / dbl("w"))
    )
    fk = (
        F.lit(0.39) * (dbl("w") / dbl("s"))
        + F.lit(11.8) * (dbl("syl") / dbl("w"))
        - F.lit(15.59)
    )
    return c.select(
        "doc_id",
        F.col("w").alias("n_words"),
        F.col("s").alias("n_sentences"),
        F.col("syl").alias("n_syllables"),
        F.when(F.col("w") > 0, trunc6(flesch)).alias("flesch"),
        F.when(F.col("w") > 0, trunc6(fk)).alias("fk_grade"),
    )


# ---------------------------------------------------------------------------
# Cleaning / normalization audit
# ---------------------------------------------------------------------------

#: Explicit whitespace class (the simhash convention — never \\s, whose
#: semantics differ between Java regex and RE2).
_WS = r"[ \t\n\r\f\x0b]"
_CTRL = r"[\x00-\x08\x0e-\x1f\x7f]"


@query(
    "text_clean_normalize",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, text,
             len(regexp_extract_all(text, '{_CTRL}')) AS n_ctrl,
             len(regexp_extract_all(text, '{_WS}{{2,}}')) AS n_ws_runs,
             trim(regexp_replace(
               regexp_replace(text, '{_CTRL}', '', 'g'),
               '{_WS}+', ' ', 'g')) AS clean
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(clean) AS BIGINT) AS clean_chars,
           CAST(n_ctrl AS BIGINT) AS n_ctrl,
           CAST(n_ws_runs AS BIGINT) AS n_ws_runs,
           CASE WHEN clean = text THEN 0 ELSE 1 END AS changed,
           md5(clean) AS clean_md5
    FROM c
    """,
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text cleaning/normalization audit: strip control characters,
    collapse whitespace runs, trim — reporting per document what
    changed (control-char count, collapsed runs, length delta) and
    the cleaned content digest (the key an exact-dedup pass would
    then group on, making dedup robust to whitespace-only variants).

    Pure in-row column algebra; the whitespace class is EXPLICIT
    (the simhash convention — ``\\s`` semantics differ between Java
    regex and RE2, so it never appears in cross-engine expressions).
    """
    d = load_table(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _CTRL, ""),
            _WS + "+",
            " ",
        )
    )
    c = d.select(
        "doc_id",
        "text",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(f"({_CTRL})"), 1)
        ).alias("n_ctrl"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(f"({_WS}{{2,}})"), 1
            )
        ).alias("n_ws_runs"),
        clean.alias("clean"),
    )
    return c.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.length("clean").cast("long").alias("clean_chars"),
        F.col("n_ctrl").cast("long").alias("n_ctrl"),
        F.col("n_ws_runs").cast("long").alias("n_ws_runs"),
        F.when(F.col("clean") == F.col("text"), 0).otherwise(1).alias(
            "changed"
        ),
        F.md5("clean").alias("clean_md5"),
    )


@query(
    "dedup_canonical_pick",
    oracle=_cc_resolve_cte()
    + ","
    + _QUALITY_CTE
    + """
    , mem AS (
      SELECT r.component, r.doc_id, q.quality, f.n_chars
      FROM resolved r
      JOIN qual q ON q.doc_id = r.doc_id
      JOIN feat f ON f.doc_id = r.doc_id
    ), cl AS (
      SELECT component,
             CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(n_chars) AS BIGINT) AS total_chars,
             max(quality) AS best_quality
      FROM mem GROUP BY component HAVING count(*) >= 2
    ), pick AS (
      SELECT m.component,
             min(m.doc_id) AS survivor_id
      FROM mem m JOIN cl ON cl.component = m.component
      WHERE m.quality = cl.best_quality
      GROUP BY m.component
    )
    SELECT cl.component, p.survivor_id, cl.n_members,
           floor(cl.best_quality * 1000000.0) / 1000000.0 AS best_quality,
           CAST(cl.total_chars - s.n_chars AS BIGINT) AS chars_saved
    FROM cl
    JOIN pick p ON p.component = cl.component
    JOIN feat s ON s.doc_id = p.survivor_id
    """,
)
def dedup_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection: within each near-dup cluster
    (the dedup_resolve components), keep the HIGHEST-QUALITY member
    (ties → min doc_id) instead of the min-id default — the production
    survivorship rule ("best of cluster"), reporting per cluster the
    survivor, the member count, and the characters a delete pass
    reclaims.

    Plan shape: the dedup_resolve CC machinery + one per-component
    argmax (max struct — map-side combinable), keyed joins only.
    """
    from speech_data_pipeline_spark.operators import graph as gr

    d = load_table(spark, sf_dir, "documents")
    q = tx.quality_score(d)
    pairs = dd.minhash_dedup_pairs_collapsed(
        d, k=16, shingle_len=5, bands=4, threshold=0.5
    )
    r = gr.resolve_duplicates(q, pairs)
    mem = r.select(
        "component",
        "doc_id",
        "quality",
        F.length("text").cast("long").alias("n_chars"),
    )
    cl = (
        mem.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("n_chars").alias("total_chars"),
            F.max(
                F.struct(
                    F.col("quality").alias("q"),
                    (-F.col("doc_id")).alias("negid"),
                    F.col("n_chars").alias("nc"),
                )
            ).alias("best"),
        )
        .where(F.col("n_members") >= 2)
    )
    return cl.select(
        "component",
        (-F.col("best.negid")).alias("survivor_id"),
        F.col("n_members").cast("long").alias("n_members"),
        trunc6(F.col("best.q")).alias("best_quality"),
        (F.col("total_chars") - F.col("best.nc"))
        .cast("long")
        .alias("chars_saved"),
    )

def _li_oracle(n_sub: int = 8, sub: int = 8, k: int = 10) -> str:
    """MaxSim grid as one generated expression, mirroring
    operators/similarity.py late_interaction_topk fold-for-fold."""
    terms = []
    for i in range(n_sub):
        qo = i * sub
        q2 = (
            f"list_sum(list_transform(list_slice(q.qv, {qo + 1},"
            f" {qo + sub}), x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        )
        cands = []
        for j in range(n_sub):
            do = j * sub
            d2 = (
                f"list_sum(list_transform(list_slice(e.embedding,"
                f" {do + 1}, {do + sub}),"
                f" x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
            )
            dotx = (
                f"list_sum(list_transform(range(1, {sub + 1}),"
                f" kk -> CAST(e.embedding[{do} + kk] AS DOUBLE)"
                f" * CAST(q.qv[{qo} + kk] AS DOUBLE)))"
            )
            cands.append(
                f"CASE WHEN {d2} > 0 THEN {dotx} /"
                f" (sqrt({q2}) * sqrt({d2})) ELSE 0.0 END"
            )
        terms.append("greatest(" + ", ".join(cands) + ")")
    score = " + ".join(terms)
    return f"""
    WITH q AS MATERIALIZED (
      SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           floor(({score}) * 1000000.0) / 1000000.0 AS li_score
    FROM embeddings e, q
    ORDER BY li_score DESC, e.vec_id LIMIT {k}
    """


@query("sim_late_interaction_topk", oracle=_li_oracle())
def sim_late_interaction_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction (MaxSim) top-10: each 64-d
    embedding is treated as 8 token sub-vectors and scored
    Σ_i max_j cos(q_i, d_j) against the vec_id=0 query — the
    multi-vector retrieval model beside single-vector sim_cosine_topk.
    One generated map-only expression (in-row slices + the shared
    left-fold dot/norm primitives), TakeOrderedAndProject top-k
    (operators/similarity.py late_interaction_topk)."""
    e = load_table(spark, sf_dir, "embeddings")
    return sim.late_interaction_topk(
        e, _query_vec(spark, sf_dir), n_sub=8, k=10
    )

@query(
    "eval_mrr_at_k",
    oracle=f"""
    WITH a AS (
      SELECT vec_id AS anchor_id, label AS label_a, embedding AS va
      FROM embeddings WHERE vec_id < {_NDCG_ANCHORS}
    ), cand AS (
      SELECT a.anchor_id, a.label_a,
             CASE WHEN c.label = a.label_a THEN 1 ELSE 0 END AS rel,
             row_number() OVER (
               PARTITION BY a.anchor_id
               ORDER BY list_sum(list_transform(range(1, 65),
                   i -> CAST(va[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(va,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * sqrt(list_sum(list_transform(c.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) DESC,
                 c.vec_id) AS rn
      FROM a JOIN embeddings c ON c.vec_id <> a.anchor_id
    )
    SELECT anchor_id, label_a,
           CAST(COALESCE(min(CASE WHEN rel = 1 AND rn <= {_NDCG_K}
                              THEN rn END), 0) AS BIGINT) AS first_hit,
           CAST(sum(CASE WHEN rn <= {_NDCG_K} THEN rel ELSE 0 END)
                AS BIGINT) AS hits_at_k,
           CAST(COALESCE(1000000 // min(CASE WHEN rel = 1
                                        AND rn <= {_NDCG_K}
                                        THEN rn END), 0) AS BIGINT)
             AS rr_ppm
    FROM cand GROUP BY anchor_id, label_a
    ORDER BY anchor_id
    """,
)
def eval_mrr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 retrieval evaluation beside eval_ndcg_at_k: for each
    anchor, the rank of the FIRST same-label hit in the exact-cosine
    top-10 and its reciprocal (integer ppm: 10^6 div rank — exact in
    both engines, no float reciprocal). The metric navigation-style
    retrieval (one right answer) reads instead of NDCG's graded gain.
    Same plan skeleton: bounded anchor broadcast, WindowGroupLimit
    rank filter, one grouped aggregate."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.where(F.col("vec_id") < _NDCG_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("label_a"),
        F.col("embedding").alias("va"),
    )
    cand = (
        F.broadcast(a)
        .join(
            e.select(
                F.col("vec_id").alias("cand_id"),
                F.col("label").alias("label_c"),
                F.col("embedding").alias("vc"),
            ),
            F.col("cand_id") != F.col("anchor_id"),
        )
        .select(
            "anchor_id",
            "label_a",
            "cand_id",
            F.when(F.col("label_c") == F.col("label_a"), 1)
            .otherwise(0)
            .alias("rel"),
            sim.cosine(F.col("va"), F.col("vc")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_raw").desc(), "cand_id"
    )
    top = cand.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= _NDCG_K
    )
    first_hit = F.min(F.when(F.col("rel") == 1, F.col("rn")))
    return (
        top.groupBy("anchor_id", "label_a")
        .agg(
            F.coalesce(first_hit, F.lit(0)).cast("long").alias(
                "first_hit"
            ),
            F.sum("rel").cast("long").alias("hits_at_k"),
        )
        .withColumn(
            "rr_ppm",
            F.when(F.col("first_hit") == 0, F.lit(0))
            .otherwise(F.expr("1000000 div first_hit"))
            .cast("long"),
        )
        .orderBy("anchor_id")
    )

#: MATTR window size (Covington & McFall 2010).
_MATTR_W = 50


@query(
    "text_lexical_diversity",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '([a-z]+)', 1) AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(len(list_distinct(ws)) AS BIGINT) AS n_types,
           CASE WHEN len(ws) = 0 THEN 0.0
                ELSE floor(CAST(len(list_distinct(ws)) AS DOUBLE)
                           / CAST(len(ws) AS DOUBLE)
                           * 1000000.0) / 1000000.0 END AS ttr,
           CASE WHEN len(ws) < {_MATTR_W} THEN
                  CASE WHEN len(ws) = 0 THEN 0.0
                       ELSE floor(CAST(len(list_distinct(ws)) AS DOUBLE)
                                  / CAST(len(ws) AS DOUBLE)
                                  * 1000000.0) / 1000000.0 END
                ELSE floor(
                  CAST(list_sum(list_transform(
                         range(1, len(ws) - {_MATTR_W} + 2),
                         i -> len(list_distinct(list_slice(
                                ws, CAST(i AS INT),
                                CAST(i + {_MATTR_W} - 1 AS INT))))))
                       AS DOUBLE)
                  / CAST((len(ws) - {_MATTR_W} + 1) * {_MATTR_W}
                         AS DOUBLE)
                  * 1000000.0) / 1000000.0 END AS mattr
    FROM w
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per document: raw type-token ratio (TTR) and
    the moving-average TTR (MATTR, Covington & McFall 2010, window
    50) — the length-robust vocabulary-richness signal quality
    filters use where raw TTR just measures document length.

    In-row array algebra only: word array once, distinct counts per
    sliding window via transform over positions (O(n·W) per doc,
    doc-length bounded), exact integer window-distinct sums crossing
    nothing — a map-only plan at any corpus size. Documents shorter
    than the window fall back to raw TTR; empty documents report 0.
    """
    d = load_table(spark, sf_dir, "documents")
    w = _MATTR_W
    ws = F.expr("regexp_extract_all(lower(text), '([a-z]+)', 1)")
    out = d.select("doc_id", ws.alias("ws")).select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        F.size(F.array_distinct("ws")).cast("long").alias("n_types"),
        F.col("ws"),
    )
    ttr = F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
        trunc6(
            F.col("n_types").cast("double")
            / F.col("n_words").cast("double")
        )
    )
    winsum = F.expr(
        f"aggregate(transform(sequence(1, cast(size(ws) - {w} + 1 as int)),"
        f" i -> size(array_distinct(slice(ws, i, {w})))),"
        f" cast(0 as bigint), (acc, x) -> acc + x)"
    )
    mattr = F.when(F.col("n_words") < w, ttr).otherwise(
        trunc6(
            winsum.cast("double")
            / ((F.col("n_words") - w + 1) * w).cast("double")
        )
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_types",
        ttr.alias("ttr"),
        mattr.alias("mattr"),
    )


_HTML_PRE = (
    '<html><head><title>'
)
_HTML_MID1 = (
    '</title><style type="text/css">p { color: red; }</style></head>'
    '<body><h1>Doc '
)
_HTML_MID2 = (
    '</h1><!-- boilerplate comment --><p>'
)
_HTML_POST = (
    '</p><script type="text/javascript">var x = 1 < 2 && "</p>fake";'
    '</script><p>Tail &amp;lt; a&nbsp;list&#39;s &quot;end&quot;</p>'
    '</body></html>'
)


@query(
    "text_html_extract",
    oracle=f"""
    WITH page AS (
      SELECT doc_id,
             '{_HTML_PRE}' || source || '{_HTML_MID1}'
               || CAST(doc_id AS VARCHAR) || '{_HTML_MID2}' || text
               || '{_HTML_POST}' AS html
      FROM documents
    ),
    stripped AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                   '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                 '(?s)<!--.*?-->', ' ', 'g'),
               '(?s)<[^>]+>', ' ', 'g') AS t
      FROM page
    ),
    decoded AS (
      SELECT doc_id,
             replace(replace(replace(replace(replace(replace(t,
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
               '&#39;', CHR(39)), '&nbsp;', ' '), '&amp;', '&') AS t
      FROM stripped
    )
    SELECT doc_id,
           trim(regexp_replace(t, '[ \t\n\r\f\x0b]+', ' ', 'g')) AS web_text,
           CAST(length(trim(regexp_replace(t, '[ \t\n\r\f\x0b]+', ' ', 'g')))
                AS BIGINT) AS n_chars
    FROM decoded
    """,
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-crawl text extraction: strip scripts/styles/comments/tags
    and decode entities from an HTML page — the WARC→documents
    preprocessor every web-scale corpus build runs first, as a pure
    JVM-side regexp chain (operators/text.py html_to_text; no UDF, one
    map-only stage at 100 TB).

    The page is synthesized deterministically around each document's
    text (title/heading boilerplate, a <style> block, an inline
    <script> containing literal `<`, `&&` and a fake closing tag in a
    string, and an entity-bearing trailer — the traps that break naive
    tag-stripping), so extraction quality is value-checked against the
    DuckDB oracle running the identical spec.
    """
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(_HTML_PRE), F.col("source"), F.lit(_HTML_MID1),
        F.col("doc_id").cast("string"), F.lit(_HTML_MID2),
        F.col("text"), F.lit(_HTML_POST),
    )
    web_text = tx.html_to_text(html)
    return d.select(
        "doc_id",
        web_text.alias("web_text"),
        F.length(web_text).cast("long").alias("n_chars"),
    )


@query(
    "web_url_normalize",
    oracle=r"""
    WITH synth AS (
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INTEGER)
               WHEN 0 THEN 'HTTPS://WWW.' || source
                 || '.com:443/Articles/' || CAST(doc_id AS VARCHAR)
                 || '?utm_source=feed&utm_medium=rss&page=2#frag'
               WHEN 1 THEN 'http://' || source || '.com:80/a/b/'
               WHEN 2 THEN 'https://cdn.' || source || '.com/'
               ELSE 'https://' || source || '.com/path?utm_campaign=x'
             END AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS rawhost,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)', 1) AS rest0
      FROM synth
    ),
    hostfix AS (
      SELECT doc_id, url, scheme,
        CASE WHEN scheme = 'http'
               THEN regexp_replace(regexp_replace(rawhost, '^www\.', ''), ':80$', '')
             WHEN scheme = 'https'
               THEN regexp_replace(regexp_replace(rawhost, '^www\.', ''), ':443$', '')
             ELSE regexp_replace(rawhost, '^www\.', '') END AS host,
        regexp_replace(
          regexp_replace(
            regexp_replace(rest0, 'utm_[A-Za-z0-9_]*=[^&#]*&?', '', 'g'),
            '[?&]$', ''),
          '\?&', '?') AS rest1
      FROM parts
    ),
    norm AS (
      SELECT doc_id, url, scheme, host,
        regexp_replace(CASE WHEN rest1 = '' THEN '/' ELSE rest1 END,
                       '(.)/$', '\1') AS rest
      FROM hostfix
    )
    SELECT doc_id, url,
           scheme || '://' || host || rest AS norm_url,
           host,
           regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
           CAST(length(regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '[^/]', '', 'g'))
                AS BIGINT) AS path_depth,
           CAST(CASE WHEN url LIKE '%utm\_%' ESCAPE '\' THEN 1 ELSE 0 END AS BIGINT)
             AS had_tracking
    FROM norm
    """,
)
def web_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization: the dedup key of a crawl frontier.
    Lowercase scheme/host, strip www. and default ports, drop
    fragments and utm_* tracking params, canonicalize trailing
    slashes; emit host, registered domain and path depth (per-domain
    quotas and URL-exact dedup both key on these at crawl scale).

    URLs are synthesized deterministically around each document so
    every rule fires (mixed case, :443 with www + tracking + fragment;
    :80 with trailing slash; bare CDN root; mid-path utm) and the
    DuckDB oracle value-checks the canonical form byte-for-byte.
    Column algebra only — at 10^11 URLs this is a map-only pass.
    """
    d = load_table(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("HTTPS://WWW."), F.col("source"),
                F.lit(".com:443/Articles/"), sid,
                F.lit("?utm_source=feed&utm_medium=rss&page=2#frag"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("http://"), F.col("source"), F.lit(".com:80/a/b/")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://cdn."), F.col("source"), F.lit(".com/")),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), F.col("source"),
                F.lit(".com/path?utm_campaign=x"),
            )
        )
    )
    base = d.select("doc_id", url.alias("url"))
    norm = tx.url_normalize(F.col("url"))
    _, host0, rest0 = tx.url_parts(F.col("url"))
    host = F.regexp_replace(host0, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(
        F.regexp_extract(norm, r"^[a-z]+://[^/?#]+([^#]*)", 1), r"^([^?]*)", 1
    )
    return base.select(
        "doc_id",
        "url",
        norm.alias("norm_url"),
        host.alias("host"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
        F.length(F.regexp_replace(path, r"[^/]", "")).cast("long").alias(
            "path_depth"
        ),
        F.when(F.col("url").contains("utm_"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("had_tracking"),
    )


# ---------------------------------------------------------------------------
# Corpus token-distribution diagnostics: Shannon entropy + Simpson index
# ---------------------------------------------------------------------------


@query(
    "text_unigram_entropy",
    oracle=r"""
    WITH toks AS (
      SELECT lang,
             unnest(list_filter(string_split_regex(trim(text),
                    '[ \t\n\r\f\x0b]+'), t -> t <> '')) AS tok
      FROM documents
    ), c AS (
      SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY lang, tok
    ), tot AS (
      SELECT lang, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sumc2
      FROM c GROUP BY lang
    ), terms AS (
      SELECT c.lang,
             CAST(floor(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE)
                        * ln(CAST(t.n AS DOUBLE) / CAST(c.c AS DOUBLE))
                        * 1000000000.0) AS BIGINT) AS tn
      FROM c JOIN tot t USING (lang)
    ), ent AS (
      SELECT lang, CAST(sum(tn) AS BIGINT) AS sum_nano
      FROM terms GROUP BY lang
    )
    SELECT t.lang, t.n AS n_tokens, t.vocab AS vocab_size,
           CAST(e.sum_nano // 1000 AS DOUBLE) / 1000000.0 AS entropy_nats,
           floor(CAST(t.sumc2 AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS simpson
    FROM tot t JOIN ent e USING (lang)
    """,
)
def text_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language unigram-distribution diagnostics: Shannon entropy
    (nats) and the Simpson concentration index Σp² — the two numbers a
    corpus owner tracks for vocabulary collapse (synthetic/templated
    text shows low entropy and high Simpson long before eyeballing
    does) and for language-mix drift across snapshots.

    Exactness contract: each token's entropy term ``p·ln(1/p)`` is one
    deterministic double expression of the integer pair ``(c, n)``,
    floor-quantized to INTEGER nano-nats before the per-language sum —
    the sum crosses the shuffle as a BIGINT, immune to fold order (the
    perplexity-bucket idiom). Simpson is exact integer algebra
    (Σc² as DECIMAL(38,0) / HUGEINT) with a single final divide.

    Plan shape: one explode + one (lang, token) grouped count — the
    count table is vocabulary-sized (Zipf), orders below the corpus —
    then a broadcast-sized per-language totals join and one bounded
    grouped sum. No windows, no UDFs; at 100 TB the only corpus-scale
    pass is the first grouped count with map-side partial aggregation.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    c = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = c.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sumc2"),
    )
    terms = c.join(F.broadcast(tot), "lang").select(
        "lang",
        F.floor(
            F.col("c").cast("double") / F.col("n").cast("double")
            * F.log(F.col("n").cast("double") / F.col("c").cast("double"))
            * F.lit(1000000000.0)
        ).cast("long").alias("tn"),
    )
    ent = terms.groupBy("lang").agg(F.sum("tn").cast("long").alias("sum_nano"))
    return tot.join(ent, "lang").select(
        "lang",
        F.col("n").alias("n_tokens"),
        F.col("vocab").alias("vocab_size"),
        (F.expr("sum_nano div 1000").cast("double") / F.lit(1000000.0)).alias(
            "entropy_nats"
        ),
        trunc6(
            F.col("sumc2").cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("simpson"),
    )


# ---------------------------------------------------------------------------
# Heaps' law vocabulary-growth fit (corpus-prefix buckets, integer OLS)
# ---------------------------------------------------------------------------


@query(
    "text_heaps_law",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '[ \t\n\r\f\x0b]+'), t -> t <> '') AS t
      FROM documents
    ),
    mx AS (SELECT max(doc_id) AS max_id FROM toks),
    db AS (
      SELECT doc_id,
             least(9, (doc_id * 10) // (mx.max_id + 1)) AS b,
             greatest(len(t) - 1, 0) AS nb, t
      FROM toks CROSS JOIN mx
    ),
    base AS (SELECT b, sum(nb) AS toks_in FROM db GROUP BY b),
    bg AS (
      SELECT b, t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1]
               AS term
      FROM (
        SELECT b, t, unnest(range(1, greatest(len(t) - 1, 0) + 1)) AS i
        FROM db
      )
    ),
    nv AS (
      SELECT fb AS b, count(*) AS vocab_new
      FROM (SELECT term, min(b) AS fb FROM bg GROUP BY term)
      GROUP BY fb
    ),
    pts AS (
      SELECT b,
             sum(toks_in) OVER (ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_toks,
             sum(coalesce(vocab_new, 0)) OVER (ORDER BY b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_vocab
      FROM base LEFT JOIN nv USING (b)
    ),
    lp AS (
      SELECT CAST(floor(ln(CAST(cum_toks AS DOUBLE)) * 1000000000.0)
                  AS BIGINT) AS xq,
             CAST(floor(ln(CAST(cum_vocab AS DOUBLE)) * 1000000000.0)
                  AS BIGINT) AS yq,
             cum_toks, cum_vocab
      FROM pts WHERE cum_toks > 0 AND cum_vocab > 0
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS k,
             CAST(sum(CAST(xq AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(yq AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(xq AS HUGEINT) * xq) AS HUGEINT) AS sxx,
             CAST(sum(CAST(yq AS HUGEINT) * yq) AS HUGEINT) AS syy,
             CAST(sum(CAST(xq AS HUGEINT) * yq) AS HUGEINT) AS sxy,
             CAST(max(cum_toks) AS BIGINT) AS tokens_total,
             CAST(max(cum_vocab) AS BIGINT) AS vocab_total
      FROM lp
    )
    SELECT CAST(k AS BIGINT) AS n_points, tokens_total, vocab_total,
           floor(CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS beta,
           floor((CAST(sy AS DOUBLE)
                  - CAST(k * sxy - sx * sy AS DOUBLE)
                    / CAST(k * sxx - sx * sx AS DOUBLE)
                    * CAST(sx AS DOUBLE))
                 / (CAST(k AS DOUBLE) * 1000000000.0)
                 * 1000000.0) / 1000000.0 AS ln_k,
           floor(CAST(k * sxy - sx * sy AS DOUBLE)
                 * CAST(k * sxy - sx * sy AS DOUBLE)
                 / (CAST(k * sxx - sx * sx AS DOUBLE)
                    * CAST(k * syy - sy * sy AS DOUBLE))
                 * 1000000.0) / 1000000.0 AS r2
    FROM m
    """,
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit ``V(N) ≈ K·N^β`` of word-BIGRAM vocabulary growth
    over ten corpus prefixes — the growth-curve companion of
    text_zipf_slope (Zipf reads the frequency axis, Heaps the
    vocabulary axis; β ≈ 1/Zipf-α under the classic derivation), and a
    planning signal a 100 TB curation run needs: how fast does the
    open vocabulary keep growing as data is added?

    Construction: documents are cut into 10 corpus-prefix buckets by
    doc_id range (a documented prefix contract — ids are the corpus
    order); per bucket, token mass is the doc-level bigram count
    (Σ max(len−1, 0), so empty-bucket holes can't drop rows) and new
    vocabulary is the count of bigrams whose FIRST bucket is that
    bucket (min-aggregate per term — no quadratic distinct-per-prefix
    rescan). Cumulative (N_d, V_d) come off the ≤10-row bucket table
    (whitelisted bounded window); each point is quantized per-row as
    ``floor(ln·10⁹)`` so the OLS moment sums are INTEGER
    (DECIMAL(38,0), order-immune across engines and partitionings);
    β, ln K and r² are single float assemblies from those sums.
    K itself is deliberately reported as ln K — one exp() would be the
    only cross-engine-fragile op in the query.

    Plan shape at 100 TB: one max(doc_id) scalar attach (broadcast),
    one bigram explode feeding two grouped aggregates (term table is
    vocabulary-sized, orders below the corpus), a 10-row window, a
    1-row fit. No corpus-sized sort, join or window anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tx.tokens(F.col("text")).alias("t"))
    mx = toks.agg(F.max("doc_id").alias("max_id"))
    db = toks.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.lit(9), F.expr("(doc_id * 10) div (max_id + 1)")
        ).alias("b"),
        F.greatest(F.size("t") - 1, F.lit(0)).alias("nb"),
        "t",
    )
    base = db.groupBy("b").agg(F.sum("nb").alias("toks_in"))
    n = F.greatest(F.size("t") - 1, F.lit(0))
    bg = db.select(
        "b",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, n).alias("w1"), F.slice("t", 2, n).alias("w2")
            )
        ).alias("p"),
    ).select(
        "b", F.concat_ws(" ", F.col("p.w1"), F.col("p.w2")).alias("term")
    )
    nv = (
        bg.groupBy("term")
        .agg(F.min("b").alias("fb"))
        .groupBy("fb")
        .agg(F.count(F.lit(1)).alias("vocab_new"))
        .withColumnRenamed("fb", "b")
    )
    w_cum = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pts = (
        base.join(nv, "b", "left")
        .select(
            "b",
            F.sum("toks_in").over(w_cum).alias("cum_toks"),
            F.sum(F.coalesce(F.col("vocab_new"), F.lit(0)))
            .over(w_cum)
            .alias("cum_vocab"),
        )
        .where((F.col("cum_toks") > 0) & (F.col("cum_vocab") > 0))
    )
    lnq = lambda c: F.floor(  # noqa: E731
        F.log(F.col(c).cast("double")) * F.lit(1_000_000_000.0)
    ).cast("long")
    lp = pts.select(
        lnq("cum_toks").alias("xq"),
        lnq("cum_vocab").alias("yq"),
        "cum_toks",
        "cum_vocab",
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = lp.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("k"),
        F.sum(d38(F.col("xq"))).alias("sx"),
        F.sum(d38(F.col("yq"))).alias("sy"),
        F.sum(d38(F.col("xq")) * d38(F.col("xq"))).alias("sxx"),
        F.sum(d38(F.col("yq")) * d38(F.col("yq"))).alias("syy"),
        F.sum(d38(F.col("xq")) * d38(F.col("yq"))).alias("sxy"),
        F.max("cum_toks").cast("long").alias("tokens_total"),
        F.max("cum_vocab").cast("long").alias("vocab_total"),
    )
    num = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    beta = num / dx
    return m.select(
        F.col("k").cast("long").alias("n_points"),
        "tokens_total",
        "vocab_total",
        trunc6(beta).alias("beta"),
        trunc6(
            (F.col("sy").cast("double") - beta * F.col("sx").cast("double"))
            / (F.col("k").cast("double") * F.lit(1_000_000_000.0))
        ).alias("ln_k"),
        trunc6(num * num / (dx * dy)).alias("r2"),
    )


@query(
    "eval_ece",
    oracle=f"""
    WITH feat AS (
      {_QUALITY_FEAT_SQL}
    ), scored AS (
      SELECT doc_id,
             CAST(floor({_QUALITY_RAW01_SQL} * 1000000.0) AS BIGINT) AS q_ppm,
             CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS pos
      FROM feat
    ), binned AS (
      SELECT least(9, q_ppm // 100000) AS bin, q_ppm, pos FROM scored
    ), bins AS (
      SELECT bin, count(*) AS n_docs,
             CAST(abs(sum(q_ppm) // count(*)
                      - (1000000 * sum(pos)) // count(*)) AS HUGEINT)
               AS gap_ppm
      FROM binned GROUP BY bin
    )
    SELECT CAST(sum(n_docs) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_bins,
           floor(CAST(sum(CAST(n_docs AS HUGEINT) * gap_ppm) AS DOUBLE)
                 / CAST(sum(n_docs) AS DOUBLE) / 1000000.0
                 * 1000000.0) / 1000000.0 AS ece,
           floor(CAST(max(gap_ppm) AS DOUBLE) / 1000000.0 * 1000000.0)
             / 1000000.0 AS mce
    FROM bins
    """,
)
def eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected / maximum calibration error — the scalar summary of
    the eval_calibration_bins reliability diagram (the number a
    curation gate actually thresholds on): ``ECE = Σ_b (n_b/N)·|mean
    predicted − observed|``, ``MCE = max_b |·|``, over the same 10
    equal-width probability bins and weak length label.

    Exactness: the per-bin gap is the SAME integer-division ppm gap
    the bins query reports, so ECE's weighted sum ``Σ n_b·gap_ppm``
    is pure integer (DECIMAL(38,0)) and the statistic is one divide —
    no float accumulation anywhere, bit-stable on any engine or
    partitioning.

    Plan shape at 100 TB: identical to eval_calibration_bins (in-row
    score algebra + one ≤10-group aggregate) plus a 1-row
    re-aggregate of the bin table.
    """
    d = load_table(spark, sf_dir, "documents")
    scored = tx.quality_score(d).select(
        F.round(F.col("quality") * F.lit(1000000.0))
        .cast("long")
        .alias("q_ppm"),
        F.when(F.length("text") >= 200, 1).otherwise(0).alias("pos"),
    )
    bins = (
        scored.select(
            F.least(
                F.lit(9).cast("long"), F.expr("q_ppm div 100000")
            ).alias("bin"),
            "q_ppm",
            "pos",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr(
                "abs(sum(q_ppm) div count(*)"
                " - (1000000 * sum(pos)) div count(*))"
            )
            .cast("decimal(38,0)")
            .alias("gap_ppm"),
        )
    )
    return bins.agg(
        F.sum("n_docs").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        trunc6(
            F.sum(F.col("n_docs").cast("decimal(38,0)") * F.col("gap_ppm"))
            .cast("double")
            / F.sum("n_docs").cast("double")
            / F.lit(1_000_000.0)
        ).alias("ece"),
        trunc6(
            F.max("gap_ppm").cast("double") / F.lit(1_000_000.0)
        ).alias("mce"),
    )


@query(
    "eval_brier_score",
    oracle=f"""
    WITH feat AS (
      {_QUALITY_FEAT_SQL}
    ), scored AS (
      SELECT CAST(floor({_QUALITY_RAW01_SQL} * 1000000.0) AS BIGINT) AS q_ppm,
             CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS pos
      FROM feat
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           floor(CAST(sum(CAST(q_ppm - 1000000 * pos AS HUGEINT)
                          * (q_ppm - 1000000 * pos)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) / 1000000000000.0
                 * 1000000.0) / 1000000.0 AS brier,
           floor(CAST(sum(CAST(q_ppm AS HUGEINT)) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) / 1000000.0
                 * 1000000.0) / 1000000.0 AS mean_pred,
           floor(CAST(sum(pos) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS base_rate
    FROM scored
    """,
)
def eval_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of the composite quality score against the weak
    length label — the strictly-proper scoring rule beside the
    reliability diagram (eval_calibration_bins) and its scalar
    summaries (eval_ece): ECE can be gamed by a constant predictor,
    the Brier score cannot, so a curation gate reads both.

    Exactness: the score is lifted to its exact ppm integer, so
    ``Σ (p_ppm − 10⁶·y)²`` is a pure integer in DECIMAL(38,0)
    (≤ 10¹² per row — exact past 10²⁵ rows) and the statistic is one
    divide; mean prediction and base rate (the Brier decomposition's
    anchors) ride the same sums.

    Plan shape at 100 TB: in-row score algebra + ONE 1-row aggregate —
    the cheapest query in the eval battery.
    """
    d = load_table(spark, sf_dir, "documents")
    scored = tx.quality_score(d).select(
        F.round(F.col("quality") * F.lit(1000000.0))
        .cast("long")
        .alias("q_ppm"),
        F.when(F.length("text") >= 200, 1).otherwise(0).alias("pos"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    diff = d38(F.col("q_ppm") - 1000000 * F.col("pos"))
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        trunc6(
            F.sum(diff * diff).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1e12)
        ).alias("brier"),
        trunc6(
            F.sum(d38(F.col("q_ppm"))).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1e6)
        ).alias("mean_pred"),
        trunc6(
            F.sum("pos").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("base_rate"),
    )


# ---------------------------------------------------------------------------
# Containment dedup + blocking score histogram (round 8)
# ---------------------------------------------------------------------------


@query(
    "dedup_containment",
    oracle=f"""
    WITH reps AS (
      {_EXACT_COLLAPSE}
    ), toks AS (
      SELECT doc_id AS id,
             regexp_extract_all(lower(text), '[a-z]+') AS t
      FROM reps
    ), sets AS (
      SELECT id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 0) + 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS arr
      FROM toks
    ), sized AS (
      SELECT id, arr, len(arr) AS n FROM sets WHERE len(arr) > 0
    ), ex AS (
      SELECT id, unnest(arr) AS g FROM sized
    ), gdf AS (
      SELECT g, count(*) AS d FROM ex GROUP BY g
    ), rare AS (
      SELECT e.id, e.g FROM ex e JOIN gdf USING (g) WHERE d <= 20
    ), cands AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM rare a JOIN rare b ON a.g = b.g AND a.id < b.id
    ), scored AS (
      SELECT c.id_a, c.id_b,
             len(list_intersect(a.arr, b.arr)) AS ov,
             a.n AS na, b.n AS nb
      FROM cands c
      JOIN sized a ON a.id = c.id_a
      JOIN sized b ON b.id = c.id_b
    )
    SELECT id_a, id_b, ov AS n_overlap,
           floor(CAST(ov AS DOUBLE) / CAST(least(na, nb) AS DOUBLE)
                 * 1000000.0) / 1000000.0 AS containment
    FROM scored
    WHERE ov * 5 >= 4 * least(na, nb)
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document duplication: rare-gram candidate pairs whose
    word-3-gram CONTAINMENT ``|A∩B|/min(|A|,|B|)`` is ≥ 0.8
    (operators/dedup.py:allpairs_blocked_containment). The asymmetric
    complement of ``sim_allpairs_blocked``: a paragraph pasted into a
    much longer page scores high here and LOW on cosine (the √(na·nb)
    denominator punishes the size gap), which is why web-corpus
    curation runs both. Candidates come from sharing ≥1 globally RARE
    gram (df ≤ 20) instead of MinHash bands — containment pairs have
    near-zero Jaccard by construction, so band collisions would miss
    exactly the pairs this query exists to find. Identical texts
    exact-collapse first (the shared mega-cluster contract); no size
    prune — the small side being small IS the signal.

    100 TB shape: gram explode + df window + rare-key equi-join
    (Σ df² ≤ max_df·|grams| — linear in corpus, the
    ngram_jaccard_pairs stop-shingle discipline), then the shared
    verify joins with one in-row array_intersect per candidate.
    """
    d = load_table(spark, sf_dir, "documents")
    reps = dd.exact_collapse_reps(d)
    return dd.allpairs_blocked_containment(
        reps, c_num=4, c_den=5, ngram_n=3, max_df=20
    )


#: sim_cosine_histogram slice knobs (the sim_blocked_recall pattern):
#: the histogram scores EVERY band candidate with no threshold or
#: size prune, so its cost tracks candidate volume — which on a
#: densifying corpus grows ~97×/decade. A distribution PROFILE does
#: not need exhaustiveness: the code-enforced rep slice (doc_id % MOD
#: == 0 AND doc_id < MOD·CAP) bounds the profiled sub-corpus at
#: ≤20000 reps at every scale while covering half the corpus at the
#: gate SFs, keeping the audit's shape statistics meaningful.
_HIST_SLICE_MOD = 2
_HIST_SLICE_CAP = 20000


@query(
    "sim_cosine_histogram",
    oracle=f"""
    WITH reps AS (
      {_EXACT_COLLAPSE}
    ), srep AS (
      SELECT * FROM reps
      WHERE doc_id % {_HIST_SLICE_MOD} = 0
        AND doc_id < {_HIST_SLICE_MOD * _HIST_SLICE_CAP}
    ), {_minhash_sigs_cte(k=16, shingle_len=5, src="srep")}, cands AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sigs a JOIN sigs b ON a.id < b.id
      WHERE ({_band_share_sql(k=16, bands=4)})
    ), toks AS (
      SELECT doc_id AS id,
             regexp_extract_all(lower(text), '[a-z]+') AS t
      FROM srep
    ), sets AS (
      SELECT id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 0) + 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS arr
      FROM toks
    ), scored AS (
      SELECT len(list_intersect(a.arr, b.arr)) AS ov,
             a.n AS na, b.n AS nb
      FROM cands c
      JOIN (SELECT id, arr, len(arr) AS n FROM sets
            WHERE len(arr) > 0) a ON a.id = c.id_a
      JOIN (SELECT id, arr, len(arr) AS n FROM sets
            WHERE len(arr) > 0) b ON b.id = c.id_b
    )
    SELECT CAST(floor(CAST(ov AS DOUBLE)
                      / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                      * 10.0) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM scored GROUP BY 1
    """,
)
def sim_cosine_histogram(
    spark: SparkSession,
    sf_dir: str,
    slice_mod: int | None = _HIST_SLICE_MOD,
    slice_cap: int = _HIST_SLICE_CAP,
) -> DataFrame:
    """Similarity PROFILE of the LSH blocking: the decile histogram of
    exact word-3-gram cosine over band-collision candidate pairs
    (no threshold) — the tuning artifact behind
    ``sim_blocked_precision``'s single number. A corpus owner reads
    the shape before picking t: mass in low buckets = the banding
    wastes exact-scoring work (loosen bands); mass at bucket 10 =
    exact-duplicate leakage past the collapse. Buckets are
    ``floor(10·cos)`` ∈ 0..10 (10 = cos exactly 1.0).

    The profile runs on a CODE-ENFORCED ≤20000-representative slice
    (the ``sim_blocked_recall`` pattern): with no threshold and no
    size prune the full-corpus form scores EVERY candidate — measured
    47.7×/decade at sf10 on the densifying synthetic corpus, pure
    candidate-volume growth — while a distribution profile loses
    nothing statistical to a deterministic half/bounded sample. Pass
    ``slice_mod=None`` for the exhaustive diagnostic form.

    100 TB shape: blocked_overlap_pairs over the bounded slice + one
    ≤11-row aggregate — candidate volume bounded by slice_cap² in the
    worst case, banding-bounded in practice.
    """
    d = load_table(spark, sf_dir, "documents")
    reps = dd.exact_collapse_reps(d)
    if slice_mod is not None:
        reps = reps.where(
            ((F.col("doc_id") % slice_mod) == 0)
            & (F.col("doc_id") < slice_mod * slice_cap)
        )
    pairs = dd.blocked_overlap_pairs(
        reps, ngram_n=3, k=16, shingle_len=5, bands=4, size_ratio=None
    )
    bucket = F.floor(
        F.col("ov").cast("double")
        / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
        * F.lit(10.0)
    ).cast("long")
    return (
        pairs.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence between corpus halves (round 8)
# ---------------------------------------------------------------------------


@query(
    "text_js_divergence",
    oracle="""
    WITH toks AS (
      SELECT doc_id % 2 AS half, unnest(
               regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents
    ), c AS (
      SELECT w,
             sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
      FROM toks GROUP BY w
    ), tot AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cb) AS BIGINT) AS nb,
             CAST(count(*) AS BIGINT) AS vocab
      FROM c
    ), terms AS (
      SELECT CAST(floor((
               CASE WHEN ca > 0 THEN
                 0.5 * (CAST(ca AS DOUBLE) / na)
                     * ln((CAST(ca AS DOUBLE) / na)
                          / (0.5 * (CAST(ca AS DOUBLE) / na
                                    + CAST(cb AS DOUBLE) / nb)))
               ELSE 0.0 END
               +
               CASE WHEN cb > 0 THEN
                 0.5 * (CAST(cb AS DOUBLE) / nb)
                     * ln((CAST(cb AS DOUBLE) / nb)
                          / (0.5 * (CAST(ca AS DOUBLE) / na
                                    + CAST(cb AS DOUBLE) / nb)))
               ELSE 0.0 END
             ) * 1000000000000.0) AS BIGINT) AS t_pico
      FROM c CROSS JOIN tot
    )
    SELECT (SELECT vocab FROM tot) AS vocab,
           (SELECT na FROM tot) AS n_tokens_a,
           (SELECT nb FROM tot) AS n_tokens_b,
           floor(CAST(sum(t_pico) AS DOUBLE) / 1000000000000.0
                 * 1000000.0) / 1000000.0 AS jsd_nats
    FROM terms
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence (nats) between the unigram
    distributions of the two doc_id-parity halves of the corpus — the
    symmetric, bounded [0, ln 2] distribution-shift measure a corpus
    owner tracks between crawls/sources before mixing them (the text
    sibling of ``drift_psi_value``; on a homogeneous synthetic corpus
    the value sits near 0, which is itself the check).

    Exactness: per-word JSD contribution ``½p·ln(p/m) + ½q·ln(q/m)``
    (m the mixture) is ONE float expression from exact integer counts,
    pico-quantized per word so the cross-vocabulary sum is an integer
    (order-immune; the text_unigram_entropy discipline); the final
    value is a single assembly.

    Plan shape at 100 TB: one tokenize-explode pass → word-grouped
    conditional counts (vocabulary-sized table), one 1-row total
    attach, one vocabulary-sized integer sum. No windows, no joins on
    corpus rows.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit("([a-z]+)"), 1
            )
        ).alias("w"),
    )
    c = toks.groupBy("w").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cb"),
    )
    tot = c.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    j = c.crossJoin(F.broadcast(tot))
    pa = F.col("ca").cast("double") / F.col("na").cast("double")
    pb = F.col("cb").cast("double") / F.col("nb").cast("double")
    mix = F.lit(0.5) * (pa + pb)
    term = F.when(
        F.col("ca") > 0, F.lit(0.5) * pa * F.log(pa / mix)
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("cb") > 0, F.lit(0.5) * pb * F.log(pb / mix)
    ).otherwise(F.lit(0.0))
    terms = j.select(
        "vocab",
        "na",
        "nb",
        F.floor(term * F.lit(1e12)).cast("long").alias("t_pico"),
    )
    return terms.groupBy("vocab", "na", "nb").agg(
        F.sum("t_pico").alias("sp")
    ).select(
        "vocab",
        F.col("na").alias("n_tokens_a"),
        F.col("nb").alias("n_tokens_b"),
        trunc6(F.col("sp").cast("double") / F.lit(1e12)).alias("jsd_nats"),
    )


# ---------------------------------------------------------------------------
# Cross-source duplication matrix + vocabulary coverage (round 8)
# ---------------------------------------------------------------------------


@query(
    "dedup_source_matrix",
    oracle=f"""
    WITH dg AS (
      SELECT doc_id AS id, md5(text) AS _dg FROM documents
    ), grp AS (
      SELECT _dg, min(id) AS rep FROM dg GROUP BY _dg
    ), repdocs AS (
      SELECT d.doc_id, d.text
      FROM documents d JOIN grp g ON g.rep = d.doc_id
    ), {_minhash_pairs_cte(16, 5, 4, src="repdocs")}, allpairs AS (
      SELECT id_a, id_b FROM pairs
      UNION ALL
      SELECT d.id AS id_a, g.rep AS id_b
      FROM dg d JOIN grp g ON g._dg = d._dg
      WHERE d.id <> g.rep
    )
    SELECT least(a.source, b.source) AS source_a,
           greatest(a.source, b.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM allpairs p
    JOIN documents a ON a.doc_id = p.id_a
    JOIN documents b ON b.doc_id = p.id_b
    GROUP BY 1, 2
    """,
)
def dedup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHO copies from WHOM: the near-duplicate pair counts of the
    production MinHash composition (``dedup_minhash_lsh`` — collapse +
    banded LSH + member→rep star links) attributed to unordered
    (source, source) cells. The curation report a corpus owner reads
    before deciding which source to drop or down-weight: a heavy
    off-diagonal cell means two feeds mirror each other; a heavy
    diagonal means one feed re-publishes itself.

    Plan shape at 100 TB: the production pair stream (linear by the
    collapse contract) + two hash joins on doc_id attaching sources +
    one grouped count bounded by |sources|² cells.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_dedup_pairs_collapsed(
        d, k=16, shingle_len=5, bands=4, threshold=0.5, with_scores=True
    ).select("id_a", "id_b")
    sa = d.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa"))
    sb = d.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


_VOCAB_COVERAGE_K = 1000


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents
    ), c AS (
      SELECT w, count(*) AS cnt FROM toks GROUP BY w
    ), tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens,
             CAST(count(*) AS BIGINT) AS vocab_size
      FROM c
    ), topk AS (
      SELECT cnt FROM c ORDER BY cnt DESC, w LIMIT {_VOCAB_COVERAGE_K}
    )
    SELECT CAST({_VOCAB_COVERAGE_K} AS BIGINT) AS k,
           vocab_size, total_tokens,
           (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) FROM topk)
             AS covered_tokens,
           floor(CAST((SELECT coalesce(sum(cnt), 0) FROM topk) AS DOUBLE)
                 / CAST(total_tokens AS DOUBLE) * 1000000.0) / 1000000.0
             AS coverage
    FROM tot
    """,
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What fraction of token OCCURRENCES the top-K vocabulary covers —
    the practical question behind every fixed-vocabulary decision
    (tokenizer size, embedding table, stop-list length), and the
    integral counterpart of ``text_zipf_slope``'s exponent (a steeper
    Zipf slope ⇒ higher coverage at the same K).

    Plan shape at 100 TB: one tokenize-explode grouped count
    (vocabulary-sized, map-side combinable); top-K is
    TakeOrderedAndProject (per-partition heap, never a global sort of
    the vocabulary); two bounded aggregates assemble the row.
    """
    d = load_table(spark, sf_dir, "documents")
    c = (
        d.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("([a-z]+)"), 1
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = c.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    topk = (
        c.orderBy(F.col("cnt").desc(), "w")
        .limit(_VOCAB_COVERAGE_K)
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("cov"))
    )
    return tot.crossJoin(F.broadcast(topk)).select(
        F.lit(_VOCAB_COVERAGE_K).cast("long").alias("k"),
        "vocab_size",
        "total_tokens",
        F.col("cov").alias("covered_tokens"),
        trunc6(
            F.col("cov").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (round 8)
# ---------------------------------------------------------------------------

#: RAKE stopword delimiter set (fixed literal list shared with the
#: oracle — phrase boundaries, not content).
_RAKE_STOP = (
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "an", "be", "this", "are", "or",
    "from", "was", "were", "but", "not", "have", "has", "had",
)
_RAKE_TOPK = 20


def _rake_oracle() -> str:
    stop = ", ".join(f"'{w}'" for w in _RAKE_STOP)
    return f"""
    WITH toks AS (
      SELECT regexp_extract_all(lower(text), '[a-z]+') AS t
      FROM documents
    ), phr AS (
      SELECT trim(p) AS phrase
      FROM toks, unnest(string_split(array_to_string(
             list_transform(t, w -> CASE WHEN w IN ({stop})
                                         THEN '|' ELSE w END), ' '),
             '|')) AS u(p)
      WHERE trim(p) <> ''
    ), occ AS (
      SELECT phrase, count(*) AS n_occurrences FROM phr GROUP BY phrase
    ), wrows AS (
      SELECT len(string_split(phrase, ' ')) AS plen, w
      FROM phr, unnest(string_split(phrase, ' ')) AS uw(w)
    ), wscore AS (
      SELECT w,
             CAST(floor(CAST(sum(plen) AS DOUBLE) * 1000000.0
                        / count(*)) AS BIGINT) AS score_ppm
      FROM wrows GROUP BY w
    ), pscore AS (
      SELECT o.phrase, o.n_occurrences,
             CAST(len(string_split(o.phrase, ' ')) AS BIGINT) AS n_words,
             CAST(sum(s.score_ppm) AS BIGINT) AS score_ppm
      FROM occ o, unnest(string_split(o.phrase, ' ')) AS uw(w)
      JOIN wscore s ON s.w = uw.w
      GROUP BY o.phrase, o.n_occurrences
    )
    SELECT phrase, n_words, CAST(n_occurrences AS BIGINT) AS n_occurrences,
           CAST(score_ppm AS DOUBLE) / 1000000.0 AS score
    FROM pscore
    ORDER BY score_ppm DESC, phrase
    LIMIT {_RAKE_TOPK}
    """


@query("text_rake_keywords", oracle=_rake_oracle())
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword-free token runs; each
    word's score is degree/frequency (degree = Σ length of the phrases
    it appears in — co-occurrence weight); a phrase scores the sum of
    its member word scores; top-20 phrases by score. The
    phrase-level keyword view beside ``text_textrank_keywords``'s
    word-graph view and ``text_pmi_collocations``'s pair view —
    the standard cheap keyword extractor for corpus labeling.

    Exactness: phrase segmentation is one in-row expression (mark
    stopwords, join, split — both engines run the identical string
    algebra on the same fixed stopword literal); degree/freq are
    exact integer sums; the word score quantizes to ppm by ONE float
    floor per word (exact while degree ≤ ~9·10⁹ — the double holds
    deg·10⁶ exactly below 2⁵³; beyond that the ppm floor may differ
    in the last unit, documented bound); phrase scores are integer
    ppm sums and the top-k total order (score_ppm, phrase) is
    tie-free.

    Plan shape at 100 TB: one tokenize pass, one phrase-grouped count
    (distinct-phrase-sized), one word-grouped aggregate
    (vocabulary-sized), one explode of DISTINCT phrases joined to the
    word-score table, TakeOrdered(k).
    """
    d = load_table(spark, sf_dir, "documents")
    stop_arr = ", ".join(f"'{w}'" for w in _RAKE_STOP)
    phrases = d.select(
        F.explode(
            F.expr(
                f"""filter(transform(split(array_join(transform(
                      regexp_extract_all(lower(text), '([a-z]+)', 1),
                      w -> CASE WHEN w IN ({stop_arr}) THEN '|'
                                ELSE w END), ' '), '\\\\|'),
                      p -> trim(p)), p -> p != '')"""
            )
        ).alias("phrase")
    )
    occ = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    wrows = phrases.select(
        F.size(F.split("phrase", " ")).alias("plen"),
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    wscore = wrows.groupBy("w").agg(
        F.floor(
            F.sum("plen").cast("double")
            * F.lit(1e6)
            / F.count(F.lit(1)).cast("double")
        )
        .cast("long")
        .alias("score_ppm")
    )
    pw = occ.select(
        "phrase",
        "n_occurrences",
        F.size(F.split("phrase", " ")).cast("long").alias("n_words"),
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    pscore = (
        pw.join(wscore, "w")
        .groupBy("phrase", "n_occurrences", "n_words")
        .agg(F.sum("score_ppm").cast("long").alias("score_ppm"))
    )
    return (
        pscore.orderBy(F.col("score_ppm").desc(), "phrase")
        .limit(_RAKE_TOPK)
        .select(
            "phrase",
            "n_words",
            "n_occurrences",
            (F.col("score_ppm").cast("double") / F.lit(1e6)).alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash estimate-accuracy audit (round 9)
# ---------------------------------------------------------------------------

#: Code-enforced slice for the audit's exact-Jaccard side (the
#: sim_blocked_recall pattern): candidate generation is the production
#: banded join, but exact shingle-set Jaccard is evaluated only for
#: pairs inside this id-bounded slice, so the per-pair exact work is
#: constant at every corpus scale.
_MH_AUDIT_MOD = 2
_MH_AUDIT_CAP = 2000


def _mh_audit_oracle(k: int = 16, shingle_len: int = 5, bands: int = 4) -> str:
    share_band = _band_share_sql(k, bands)
    eq_count = " + ".join(
        f"CASE WHEN a.sig[{i + 1}] = b.sig[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(k)
    )
    return f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % {_MH_AUDIT_MOD} = 0
        AND doc_id < {_MH_AUDIT_MOD * _MH_AUDIT_CAP}
    ), {_minhash_sigs_cte(k, shingle_len, src="docs")}, pairs AS (
      SELECT a.id AS id_a, b.id AS id_b, ({eq_count}) AS matches
      FROM sigs a JOIN sigs b ON a.id < b.id
      WHERE ({share_band})
    ), ex AS (
      SELECT p.matches,
             len(list_intersect(x.hs, y.hs)) AS inter,
             len(x.hs) + len(y.hs) - len(list_intersect(x.hs, y.hs))
               AS uni
      FROM pairs p
      JOIN sh x ON x.id = p.id_a
      JOIN sh y ON y.id = p.id_b
    ), scored AS (
      SELECT least((matches * 10) // {k}, 9) AS decile,
             CAST(floor(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE)
                        * 1000000000000.0) AS BIGINT) AS ex_pico,
             CAST(floor(abs(CAST(matches AS DOUBLE) / {float(k)}
                            - CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE))
                        * 1000000000000.0) AS BIGINT) AS err_pico
      FROM ex
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n_pairs,
           floor(CAST(sum(ex_pico) AS DOUBLE) / count(*)
                 / 1000000000000.0 * 1000000.0) / 1000000.0 AS mean_exact,
           floor(CAST(sum(err_pico) AS DOUBLE) / count(*)
                 / 1000000000000.0 * 1000000.0) / 1000000.0
             AS mean_abs_err
    FROM scored GROUP BY decile ORDER BY decile
    """


@query("dedup_minhash_estimate_audit", oracle=_mh_audit_oracle())
def dedup_minhash_estimate_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Estimate-accuracy audit for the MinHash signature behind every
    LSH dedup row: over the banded candidate pairs of a CODE-ENFORCED
    id slice, compare the signature's Jaccard ESTIMATE (matching
    positions / k) against the EXACT distinct-shingle-set Jaccard, per
    estimate decile — n_pairs, mean exact similarity, mean |error|.
    The companion of ``sim_blocked_recall`` (that row audits the
    BLOCKING's recall; this one audits the ESTIMATOR's accuracy — the
    two independent error sources of approximate dedup).

    Exactness: the estimate is the integer match count over k = 16;
    exact Jaccard is a ratio of exact integers (|∩| / |∪| of the
    md5-derived shingle-hash sets both engines replay identically);
    per-pair values are pico-quantized integers before the decile
    means (order-immune sums), truncated to ppm on output.

    Plan shape at 100 TB: signatures + shingle sets in one map pass
    over the ≤ ``_MH_AUDIT_CAP`` slice; the banded self-join and the
    two hs lookups run on slice-sized relations (constant work at any
    corpus scale by the slice contract); one ≤10-row grouped output.
    """
    d = load_table(spark, sf_dir, "documents").where(
        ((F.col("doc_id") % _MH_AUDIT_MOD) == 0)
        & (F.col("doc_id") < _MH_AUDIT_MOD * _MH_AUDIT_CAP)
    )
    k = 16
    both = dd.minhash_signatures(d, include_base=True).persist()
    sigs = both.select("id", "sig")
    cands = dd.lsh_candidate_pairs(sigs)
    xa = both.select(
        F.col("id").alias("id_a"),
        F.col("hs").alias("hs_a"),
        F.col("sig").alias("sig_a"),
    )
    xb = both.select(
        F.col("id").alias("id_b"),
        F.col("hs").alias("hs_b"),
        F.col("sig").alias("sig_b"),
    )
    ex = cands.join(xa, "id_a").join(xb, "id_b")
    matches = F.aggregate(
        F.zip_with(
            "sig_a", "sig_b", lambda x, y: (x == y).cast("int")
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    uni = F.size("hs_a") + F.size("hs_b") - inter
    exact = inter.cast("double") / uni.cast("double")
    est = matches.cast("double") / F.lit(float(k))
    scored = ex.select(
        F.least(
            F.floor(matches * 10 / k).cast("int"), F.lit(9)
        ).alias("decile"),
        F.floor(exact * F.lit(1e12)).cast("long").alias("ex_pico"),
        F.floor(F.abs(est - exact) * F.lit(1e12))
        .cast("long")
        .alias("err_pico"),
    )
    return (
        scored.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            trunc6(
                F.sum("ex_pico").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e12)
            ).alias("mean_exact"),
            trunc6(
                F.sum("err_pico").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e12)
            ).alias("mean_abs_err"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# round 10: Matryoshka prefix-dim recall audit, binary sign-Hamming top-k
# ---------------------------------------------------------------------------

#: fixed query slice: 10 probes at every scale (code-enforced bound —
#: the sim_cosine_histogram slice pattern; queries × corpus stays
#: linear in the corpus)
_MRL_QSLICE = "vec_id % 50 = 0 AND vec_id < 500"
_MRL_PREFIX = 16
_MRL_K = 10

_MRL_DOT = (
    "list_sum(list_transform(range(1, {n} + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_MRL_NRM = (
    "sqrt(list_sum(list_transform(range(1, {n} + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
)


@query(
    "embed_matryoshka_recall",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE {_MRL_QSLICE}
    ), scored AS (
      SELECT q.qid, e.vec_id,
             CAST(floor(({_MRL_DOT.format(n=64, a='e.embedding', b='q.qv')})
               / (({_MRL_NRM.format(n=64, a='e.embedding')})
                  * ({_MRL_NRM.format(n=64, a='q.qv')})) * 1e12)
               AS BIGINT) AS sf,
             CAST(floor(({_MRL_DOT.format(n=_MRL_PREFIX, a='e.embedding',
                                          b='q.qv')})
               / (({_MRL_NRM.format(n=_MRL_PREFIX, a='e.embedding')})
                  * ({_MRL_NRM.format(n=_MRL_PREFIX, a='q.qv')})) * 1e12)
               AS BIGINT) AS sp
      FROM embeddings e JOIN q ON e.vec_id <> q.qid
    ), ftop AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                 ORDER BY sf DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {_MRL_K}
    ), ptop AS (
      SELECT qid, vec_id FROM (
        SELECT qid, vec_id,
               row_number() OVER (PARTITION BY qid
                 ORDER BY sp DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {_MRL_K}
    ), ov AS (
      SELECT f.qid, CAST(count(*) AS BIGINT) AS n_overlap
      FROM ftop f JOIN ptop p ON f.qid = p.qid AND f.vec_id = p.vec_id
      GROUP BY f.qid
    )
    SELECT q.qid AS vec_id, coalesce(ov.n_overlap, 0) AS n_overlap,
           floor(CAST(coalesce(ov.n_overlap, 0) AS DOUBLE)
                 / {_MRL_K}.0 * 1000000.0) / 1000000.0 AS recall
    FROM q LEFT JOIN ov ON ov.qid = q.qid
    ORDER BY vec_id
    """,
)
def embed_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation audit: for 10 fixed probe vectors,
    recall@10 of the PREFIX-16-dim cosine ranking against the full
    64-dim ranking — the measurement behind MRL-style truncatable
    embeddings ("can I serve the first quarter of the vector and keep
    the neighbors?"), run before committing a corpus to a cheaper
    index. Scores rank on pico-quantized integers with vec_id
    tie-break (total order on any engine).

    Plan shape at 100 TB: broadcast the 10 probes, one map-side score
    pass (both dots in the same scan), two row_number windows
    partitioned by probe (10 bounded partitions of corpus rows —
    probe-parallel), one k×k overlap join. Probe count is
    code-enforced constant, so candidate volume is linear in the
    corpus at every scale.
    """
    from speech_data_pipeline_spark.operators import similarity as sim

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.expr(_MRL_QSLICE)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    pre = _MRL_PREFIX
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.floor(
                sim.cosine(F.col("embedding"), F.col("qv")) * F.lit(1e12)
            ).cast("long").alias("sf"),
            F.floor(
                sim.cosine(
                    F.slice(F.col("embedding"), 1, pre),
                    F.slice(F.col("qv"), 1, pre),
                )
                * F.lit(1e12)
            ).cast("long").alias("sp"),
        )
    )
    w_f = Window.partitionBy("qid").orderBy(F.col("sf").desc(), "vec_id")
    w_p = Window.partitionBy("qid").orderBy(F.col("sp").desc(), "vec_id")
    ftop = (
        scored.withColumn("rn", F.row_number().over(w_f))
        .where(F.col("rn") <= _MRL_K)
        .select("qid", "vec_id")
    )
    ptop = (
        scored.withColumn("rn", F.row_number().over(w_p))
        .where(F.col("rn") <= _MRL_K)
        .select("qid", "vec_id")
    )
    ov = ftop.join(ptop, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    return (
        q.select("qid")
        .join(ov, "qid", "left")
        .select(
            F.col("qid").alias("vec_id"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            trunc6(
                F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double")
                / F.lit(float(_MRL_K))
            ).alias("recall"),
        )
        .orderBy("vec_id")
    )


@query(
    "sim_binary_hamming_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qv FROM embeddings
      WHERE {_MRL_QSLICE}
    ), scored AS (
      SELECT q.qid, e.vec_id,
             CAST(list_sum(list_transform(range(1, 64 + 1),
               i -> CASE WHEN (e.embedding[i] > 0) <> (q.qv[i] > 0)
                         THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
      FROM embeddings e JOIN q ON e.vec_id <> q.qid
    )
    SELECT qid AS query_id, vec_id, hamming, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT qid, vec_id, hamming,
             row_number() OVER (PARTITION BY qid
               ORDER BY hamming, vec_id) AS rn
      FROM scored
    ) WHERE rn <= {_MRL_K}
    ORDER BY query_id, rank
    """,
)
def sim_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary sign-quantized retrieval: 1-bit-per-dimension embeddings
    (bit = coordinate > 0) ranked by exact Hamming distance for the
    same 10 fixed probes — the 32×-compression companion of
    ``embed_quantize_int8`` and the ranking behind binary-vector
    indexes (sign bits preserve cosine neighborhoods remarkably well;
    this query is the audit that shows how well). Distances are
    integers, so ranking is exact on any engine; ties break by id.

    Plan shape at 100 TB: broadcast probes, one map-side XOR-popcount
    pass, one row_number window per probe (bounded partitions),
    TakeOrdered-k output per probe.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.expr(_MRL_QSLICE)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    ham = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("qv"),
            lambda x, y: F.when(
                (x > F.lit(0.0)) != (y > F.lit(0.0)), 1
            ).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", ham.cast("long").alias("hamming"))
    )
    w = Window.partitionBy("qid").orderBy("hamming", "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _MRL_K)
        .select(
            F.col("qid").alias("query_id"),
            "vec_id",
            "hamming",
            F.col("rn").cast("long").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )
