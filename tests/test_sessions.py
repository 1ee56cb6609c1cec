"""Golden tests for the sessionization kernels (SURVEY.md W1/W2/W9).

Edge semantics pinned here mirror the reference's combine_timestamps
(modules/models/utils.py:64-102):
- a gap exactly equal to `interval` does NOT break (strict `>`);
- the span cap compares the candidate's end against the *running
  session start* before admitting it;
- `must_include` drops sessions without the required type;
- the trailing session always flushes.
"""

from conftest import rows

from speech_data_pipeline_spark.operators.sessions import (
    sessionize_barriers,
    sessionize_capped,
    sessionize_gap,
)


def seg_df(spark, data, cols=("user_id", "start_us", "end_us")):
    return spark.createDataFrame(data, list(cols))


def test_gap_merge_strict_gt(spark):
    df = seg_df(spark, [("a", 0, 10), ("a", 20, 30), ("a", 31, 40)])
    # gap of exactly 10 merges; sessionize with interval=10
    out = rows(
        sessionize_gap(df, interval=10, key="user_id"),
        "session_id", "session_start", "session_end", "n_segments",
    )
    assert out == [(1, 0, 40, 3)]
    # interval=9 breaks the first gap (10 > 9)
    out = rows(
        sessionize_gap(df, interval=9, key="user_id"),
        "session_id", "session_start", "session_end", "n_segments",
    )
    assert out == [(1, 0, 10, 1), (2, 20, 40, 2)]


def test_gap_merge_overlapping_out_of_order(spark):
    # second segment contained in first; third close to the *max* end
    df = seg_df(spark, [("a", 0, 100), ("a", 10, 20), ("a", 105, 110)])
    out = rows(
        sessionize_gap(df, interval=10, key="user_id"),
        "session_id", "session_start", "session_end", "n_segments",
    )
    assert out == [(1, 0, 110, 3)]


def test_capped_span_vs_session_start(spark):
    # all gaps merge, but the span cap (25) forces a break before seg 3:
    # session [0,10]+[12,22] span 22 <= 25; adding [24,34] would span 34.
    df = seg_df(spark, [("a", 0, 10), ("a", 12, 22), ("a", 24, 34)])
    out = rows(
        sessionize_capped(df, interval=5, max_duration=25, key="user_id"),
        "session_id", "session_start", "session_end", "n_segments",
    )
    assert out == [(1, 0, 22, 2), (2, 24, 34, 1)]


def test_capped_trailing_flush_and_gap_equal(spark):
    df = seg_df(spark, [("a", 0, 10), ("a", 15, 20)])
    out = rows(
        sessionize_capped(df, interval=5, max_duration=100, key="user_id"),
        "session_id", "session_start", "session_end", "n_segments",
    )
    assert out == [(1, 0, 20, 2)]  # gap 5 == interval 5 merges; tail flushed


def test_capped_must_include(spark):
    df = spark.createDataFrame(
        [
            ("a", 0, 10, "voice"),
            ("a", 12, 20, "silence"),
            ("a", 100, 110, "silence"),
        ],
        ["user_id", "start_us", "end_us", "seg_type"],
    )
    out = rows(
        sessionize_capped(
            df, interval=5, max_duration=1000, key="user_id",
            type_col="seg_type", must_include="voice",
        ),
        "session_start", "session_end", "types",
    )
    # second session has no voice -> dropped; types accumulated+sorted
    assert out == [(0, 20, ["silence", "voice"])]


def test_capped_break_cols_speaker_merge(spark):
    # W2: same-speaker merge breaks on speaker change even within gap
    df = spark.createDataFrame(
        [("a", 0, 10, "s1"), ("a", 11, 20, "s1"), ("a", 21, 30, "s2")],
        ["user_id", "start_us", "end_us", "speaker"],
    )
    out = rows(
        sessionize_capped(
            df, interval=5, max_duration=1000, key="user_id",
            break_cols=("speaker",),
        ),
        "speaker", "session_start", "session_end", "n_segments",
    )
    assert out == [("s1", 0, 20, 2), ("s2", 21, 30, 1)]


def test_barrier_sessionize(spark):
    segs = seg_df(spark, [("a", 0, 10), ("a", 12, 20), ("a", 30, 40)])
    bars = spark.createDataFrame([("a", 25)], ["user_id", "start_us"])
    out = rows(
        sessionize_barriers(segs, bars, interval=100, key="user_id"),
        "barrier_id", "session_start", "session_end", "n_segments",
    )
    # barrier at 25 splits [0,20] from [30,40] despite interval=100
    assert out == [(0, 0, 20, 2), (1, 30, 40, 1)]


def test_capped_compat_overwrite_end(spark):
    # contained segment: reference semantics shrink the session end to
    # the last merged segment's end (utils.py:94-96); engine default
    # keeps the running max.
    df = seg_df(spark, [("a", 0, 100), ("a", 10, 20)])
    default = rows(
        sessionize_capped(df, interval=5, max_duration=1000, key="user_id"),
        "session_start", "session_end",
    )
    assert default == [(0, 100)]
    compat = rows(
        sessionize_capped(
            df, interval=5, max_duration=1000, key="user_id",
            compat_overwrite_end=True,
        ),
        "session_start", "session_end",
    )
    assert compat == [(0, 20)]
