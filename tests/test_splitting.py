"""Golden tests for W8 recursive longest-gap splitting."""

from conftest import rows

from speech_data_pipeline_spark.operators.splitting import recursive_gap_split


def seg_df(spark, data):
    return spark.createDataFrame(data, ["user_id", "start_us", "end_us"])


def test_split_at_largest_gap(spark):
    # span 100 > cap 60; largest gap is 30->50
    df = seg_df(spark, [("a", 0, 10), ("a", 20, 30), ("a", 50, 100)])
    out = rows(recursive_gap_split(df, max_span=60), "start_us", "piece_id")
    assert out == [(0, 0), (20, 0), (50, 1)]


def test_no_split_when_under_cap(spark):
    df = seg_df(spark, [("a", 0, 10), ("a", 90, 100)])
    out = rows(recursive_gap_split(df, max_span=200), "start_us", "piece_id")
    assert out == [(0, 0), (90, 0)]


def test_recursive_multi_level(spark):
    # span 0..300; first cut at the biggest gap (100..200), then the left
    # half 0..100 still exceeds 60 and splits again at 40..70.
    df = seg_df(
        spark,
        [("a", 0, 20), ("a", 30, 40), ("a", 70, 100), ("a", 200, 300)],
    )
    out = rows(recursive_gap_split(df, max_span=60), "start_us", "piece_id")
    assert out == [(0, 0), (30, 0), (70, 1), (200, 2)]


def test_unsplittable_overlap_blob_kept_whole(spark):
    df = seg_df(spark, [("a", 0, 100), ("a", 50, 150)])
    out = rows(recursive_gap_split(df, max_span=60), "start_us", "piece_id")
    assert out == [(0, 0), (50, 0)]


def test_piece_bounds(spark):
    df = seg_df(spark, [("a", 0, 10), ("a", 20, 30), ("a", 50, 100)])
    out = rows(
        recursive_gap_split(df, max_span=60),
        "start_us", "piece_start", "piece_end",
    )
    assert out == [(0, 0, 30), (20, 0, 30), (50, 50, 100)]
