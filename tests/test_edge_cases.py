"""Degenerate-input sweep: empty tables, single rows, and zero-length
payloads through the sequential kernels and search operators — the
failure modes that surface as executor crashes at 3 a.m. on a real
corpus (empty partition after a filter, one-row group, k > corpus)."""

from pyspark.sql import functions as F

from speech_data_pipeline_spark.operators.packing import pack_sequences
from speech_data_pipeline_spark.operators.sessions import (
    sessionize_capped,
    sessionize_gap,
)
from speech_data_pipeline_spark.operators.similarity import (
    ann_batch_topk,
    cosine_topk,
)
from speech_data_pipeline_spark.operators.splitting import recursive_gap_split
from speech_data_pipeline_spark.operators.sweepline import flatten_active_sets

IV_SCHEMA = "user_id long, start_us long, end_us long"


def test_kernels_on_empty_input(spark):
    empty = spark.createDataFrame([], IV_SCHEMA)
    assert sessionize_capped(empty, 10, 100).count() == 0
    assert sessionize_gap(empty, 10).count() == 0
    assert recursive_gap_split(empty, 100).count() == 0
    tagged = spark.createDataFrame([], IV_SCHEMA + ", tag string")
    assert flatten_active_sets(tagged).count() == 0
    docs = spark.createDataFrame([], "source string, doc_id long, n_tokens long")
    assert pack_sequences(docs, budget=10).count() == 0


def test_kernels_on_single_row(spark):
    one = spark.createDataFrame([(1, 5, 9)], IV_SCHEMA)
    s = sessionize_capped(one, 10, 100).collect()
    assert [(r.session_start, r.session_end, r.n_segments) for r in s] == [(5, 9, 1)]
    p = recursive_gap_split(one, 1).collect()  # span exceeds cap, unsplittable
    assert [(r.piece_id, r.piece_start, r.piece_end) for r in p] == [(0, 5, 9)]


def test_zero_length_segments_do_not_fabricate_pieces(spark):
    tagged = spark.createDataFrame(
        [(1, 5, 5, "a"), (1, 5, 9, "b")], IV_SCHEMA + ", tag string"
    )
    out = flatten_active_sets(tagged).collect()
    assert [(r.piece_start, r.piece_end, list(r.tags)) for r in out] == [(5, 9, ["b"])]


def test_topk_larger_than_corpus(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    assert cosine_topk(df, [1.0, 0.0], k=10).count() == 2
    got = ann_batch_topk(df, [[1.0, 0.0]], k=10, n_planes=2, n_probes=4)
    assert 1 <= got.count() <= 2  # probes may or may not cover both buckets


def test_all_identical_rows_one_session(spark):
    df = spark.createDataFrame([(1, 5, 9)] * 20, IV_SCHEMA)
    s = sessionize_capped(df, 10, 100).collect()
    assert len(s) == 1 and s[0].n_segments == 20


def test_packing_weight_equal_to_budget(spark):
    df = spark.createDataFrame(
        [("s", i, 100) for i in range(4)], "source string, doc_id long, n_tokens long"
    )
    out = {r.doc_id: r.seq_id for r in pack_sequences(df, budget=100).collect()}
    assert out == {0: 1, 1: 2, 2: 3, 3: 4}  # exact-fit rows each fill a bin
