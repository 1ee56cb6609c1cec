"""Edge-case mini-gates: run a registry query AND its DuckDB oracle on
a crafted tiny corpus that the driver's synthetic tables never produce,
and require exact agreement — the regression net for cross-engine
divergences that only pathological inputs expose (round 9: Spark's
``sequence(1, 0)`` yields the DESCENDING [1, 0], so n-gram builders
over documents SHORTER than n emitted spurious grams where DuckDB's
``range(1, 1)`` emits none)."""

import duckdb
import pandas as pd
import pytest

from speech_data_pipeline_spark.queries import ORACLES, QUERIES


def _mini_documents(tmp_path):
    # even half: one normal doc + a 1-letter doc (no bigrams/trigrams)
    # odd half: one normal doc + an EMPTY doc (no grams at all)
    rows = [
        (0, "analytics engines at scale", "en", "web", 26),
        (1, "", "en", "web", 0),
        (2, "a", "en", "web", 1),
        (3, "spark analytics engines", "en", "web", 23),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def _oracle_rows(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.execute(sql).fetchall()


@pytest.mark.parametrize("name", ["eval_chrf", "eval_corpus_bleu2"])
def test_ngram_queries_on_short_documents(spark, tmp_path, name):
    sf_dir = _mini_documents(tmp_path)
    got = [tuple(r) for r in QUERIES[name](spark, sf_dir).collect()]
    want = _oracle_rows(ORACLES[name], sf_dir)
    assert len(got) == len(want) == 1
    for g, w in zip(sorted(got), sorted(want)):
        assert g == pytest.approx(w), (name, g, w)


def test_minhash_estimate_audit_with_degenerate_documents(
    spark, tmp_path
):
    """Empty and sub-shingle-length documents inside the audit slice:
    both engines must agree (and neither may crash) when shingle sets
    are empty and signatures degenerate."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "w", 44),
        (2, "the quick brown fox jumps over the lazy dog", "en", "w", 44),
        (4, "", "en", "w", 0),
        (6, "abc", "en", "w", 3),
        (8, "completely different text about spark engines", "en", "w", 46),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    name = "dedup_minhash_estimate_audit"
    got = sorted(tuple(r) for r in QUERIES[name](spark, str(tmp_path)).collect())
    want = sorted(_oracle_rows(ORACLES[name], str(tmp_path)))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == pytest.approx(w), (g, w)


def test_rm3_with_no_matching_feedback_docs(spark, tmp_path):
    """No document contains any BM25 query term: the feedback set is
    empty and both engines must return the same (empty) expansion."""
    rows = [
        (0, "alpha beta gamma", "en", "w", 16),
        (1, "delta epsilon zeta", "en", "w", 18),
    ]
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    name = "search_rm3_expansion"
    got = sorted(tuple(r) for r in QUERIES[name](spark, str(tmp_path)).collect())
    want = sorted(_oracle_rows(ORACLES[name], str(tmp_path)))
    assert got == [] and want == []
