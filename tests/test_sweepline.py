"""Golden tests for sweep-line overlap flattening (SURVEY.md W3).

Edge semantics pinned (reference modules/diarization.py:24-64):
- at a shared boundary, the ending segment closes before the starting
  one opens (no fabricated overlap for back-to-back segments);
- fully nested segments and 3-way overlaps partition correctly;
- the same tag active twice is reference-counted;
- zero-length segments are dropped.
"""

from conftest import rows

from speech_data_pipeline_spark.operators.sweepline import (
    flatten_active_counts,
    flatten_active_sets,
    split_single_overlap,
)


def tag_df(spark, data):
    return spark.createDataFrame(data, ["user_id", "start_us", "end_us", "tag"])


def test_back_to_back_no_overlap(spark):
    df = tag_df(spark, [("a", 0, 10, "s1"), ("a", 10, 20, "s2")])
    out = rows(flatten_active_sets(df), "piece_start", "piece_end", "tags")
    assert out == [(0, 10, ["s1"]), (10, 20, ["s2"])]


def test_nested_and_three_way(spark):
    df = tag_df(
        spark,
        [("a", 0, 100, "s1"), ("a", 10, 50, "s2"), ("a", 20, 30, "s3")],
    )
    out = rows(flatten_active_sets(df), "piece_start", "piece_end", "tags", "n_active")
    assert out == [
        (0, 10, ["s1"], 1),
        (10, 20, ["s1", "s2"], 2),
        (20, 30, ["s1", "s2", "s3"], 3),
        (30, 50, ["s1", "s2"], 2),
        (50, 100, ["s1"], 1),
    ]


def test_refcounted_duplicate_tag(spark):
    df = tag_df(spark, [("a", 0, 30, "s1"), ("a", 10, 20, "s1")])
    out = rows(flatten_active_sets(df), "piece_start", "piece_end", "tags", "n_active")
    # s1 stays active across the inner instance's end (refcounted), and
    # n_active counts DISTINCT active tags (set semantics, like the
    # reference's speaker sets) - so it stays 1 throughout.
    assert out == [
        (0, 10, ["s1"], 1),
        (10, 20, ["s1"], 1),
        (20, 30, ["s1"], 1),
    ]


def test_gap_emits_nothing_and_zero_length_dropped(spark):
    df = tag_df(spark, [("a", 0, 10, "s1"), ("a", 5, 5, "sz"), ("a", 20, 30, "s2")])
    out = rows(flatten_active_sets(df), "piece_start", "piece_end", "tags")
    assert out == [(0, 10, ["s1"]), (20, 30, ["s2"])]


def test_counts_match_sets(spark):
    df = tag_df(
        spark,
        [("a", 0, 100, "s1"), ("a", 10, 50, "s2"), ("b", 0, 10, "s1")],
    )
    counts = rows(
        flatten_active_counts(df), "user_id", "piece_start", "piece_end", "n_active"
    )
    sets_ = rows(
        flatten_active_sets(df), "user_id", "piece_start", "piece_end", "n_active"
    )
    assert counts == sets_


def test_split_single_overlap(spark):
    df = tag_df(spark, [("a", 0, 20, "s1"), ("a", 10, 30, "s2")])
    single, overlap = split_single_overlap(flatten_active_sets(df))
    assert rows(single, "piece_start", "piece_end", "tag") == [
        (0, 10, "s1"),
        (20, 30, "s2"),
    ]
    assert rows(overlap, "piece_start", "piece_end", "n_active") == [(10, 20, 2)]
