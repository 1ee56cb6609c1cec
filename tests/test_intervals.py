"""Golden tests for interval algebra (SURVEY.md J1-J4, F7, F11, X15)."""

from conftest import rows

from speech_data_pipeline_spark.operators.intervals import (
    clamp,
    containment_join,
    lead_gaps,
    max_overlap_join,
    suppress_non_monotonic,
)


def seg_df(spark, data, cols=("user_id", "start_us", "end_us")):
    return spark.createDataFrame(data, list(cols))


def test_lead_gaps_skips_overlapping_successor(spark):
    df = seg_df(
        spark,
        [("a", 0, 10), ("a", 5, 8), ("a", 20, 30), ("a", 40, 50)],
    )
    out = rows(lead_gaps(df), "gap_start", "gap_end", "gap_len")
    # (0,10)->(5,...) overlaps: no gap row; (5,8)->(20): gap 8-20 wait:
    # ordered by start: (0,10),(5,8),(20,30),(40,50).
    # (0,10)->next start 5 < end 10 -> skipped; (5,8)->20 gap; (20,30)->40 gap
    assert out == [(8, 20, 12), (30, 40, 10)]


def test_suppress_non_monotonic(spark):
    df = seg_df(spark, [("a", 0, 100), ("a", 10, 50), ("a", 20, 150)])
    out = rows(suppress_non_monotonic(df), "start_us", "end_us")
    assert out == [(0, 100), (20, 150)]


def test_containment_join(spark):
    inner = seg_df(spark, [("a", 10, 20), ("a", 200, 210)])
    outer = seg_df(spark, [("a", 0, 100), ("a", 5, 25), ("b", 0, 1000)])
    out = rows(
        containment_join(inner, outer), "i_start", "i_end", "o_start", "o_end"
    )
    assert out == [(10, 20, 0, 100), (10, 20, 5, 25)]


def test_max_overlap_join_tiebreak(spark):
    left = seg_df(spark, [("a", 10, 30)])
    right = spark.createDataFrame(
        [("a", 0, 20, "t1"), ("a", 20, 40, "t2"), ("a", 5, 25, "t0")],
        ["user_id", "start_us", "end_us", "tag"],
    )
    out = rows(max_overlap_join(left, right), "best_tag", "best_overlap")
    # overlaps: t1=10, t2=10, t0=15 -> t0 wins on overlap
    assert out == [("t0", 15)]
    # drop t0: t1 and t2 tie at 10 -> max tag string wins (t2)
    right2 = right.where(right.tag != "t0")
    out = rows(max_overlap_join(left, right2), "best_tag", "best_overlap")
    assert out == [("t2", 10)]


def test_clamp(spark):
    df = spark.createDataFrame(
        [("a", 2.0, 9.0, 10.0)], ["user_id", "start", "end", "duration"]
    )
    out = rows(clamp(df, pad=3.0), "start", "end")
    assert out == [(0.0, 10.0)]


def test_asof_join_golden_and_strict(spark):
    """Carry-forward as-of join: latest right row at-or-before each left
    ts; equal timestamps visible unless strict; no prior row -> NULL."""
    from speech_data_pipeline_spark.operators.intervals import asof_join

    left = spark.createDataFrame(
        [(1, 5, 100), (1, 10, 101), (1, 20, 102), (2, 7, 200)],
        "user_id long, ts_us long, event_id long",
    ).select("event_id", "user_id", "ts_us")
    right = spark.createDataFrame(
        [(1, 4, 1.0), (1, 10, 2.0), (1, 15, 3.0), (2, 9, 9.0)],
        "user_id long, ts_us long, value double",
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, payload_cols=("value",)).collect()
    }
    assert got == {100: 1.0, 101: 2.0, 102: 3.0, 200: None}
    strict = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, payload_cols=("value",), strict=True).collect()
    }
    assert strict[101] == 1.0  # equal-ts right row excluded under strict
    assert strict[100] == 1.0 and strict[200] is None


def test_asof_join_null_payload_from_matched_row(spark):
    """A matched right row whose payload is NULL must surface that NULL
    — not fall through to an older non-null row — and multiple payload
    columns must all come from the SAME matched right row."""
    from speech_data_pipeline_spark.operators.intervals import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 30, 101)], "user_id long, ts_us long, event_id long"
    ).select("event_id", "user_id", "ts_us")
    right = spark.createDataFrame(
        [(1, 5, 1.0, "a"), (1, 9, None, None), (1, 25, None, "c")],
        "user_id long, ts_us long, value double, tag string",
    )
    got = {
        r.event_id: (r.asof_value, r.asof_tag)
        for r in asof_join(left, right, payload_cols=("value", "tag")).collect()
    }
    # event 100 matches ts=9 (value NULL, tag NULL): both NULL, no mixing
    # with the ts=5 row's (1.0, 'a').
    assert got == {100: (None, None), 101: (None, "c")}
