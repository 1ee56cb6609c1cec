"""Golden tests for sliding windows and budgeted accumulation (W4, A12)."""

from conftest import rows

from speech_data_pipeline_spark.operators.windows import budgeted_topk, sliding_windows


def test_sliding_windows_coverage_and_clip(spark):
    df = spark.createDataFrame([("a", 0, 25)], ["user_id", "start_us", "end_us"])
    out = rows(sliding_windows(df, window=10, hop=5), "w_idx", "win_start", "win_end")
    # len 25: n = ceil((25-10)/5)+1 = 4 windows; last clipped at 25
    assert out == [(0, 0, 10), (1, 5, 15), (2, 10, 20), (3, 15, 25)]


def test_sliding_windows_short_segment_single_window(spark):
    df = spark.createDataFrame([("a", 100, 105)], ["user_id", "start_us", "end_us"])
    out = rows(sliding_windows(df, window=10, hop=5), "w_idx", "win_start", "win_end")
    assert out == [(0, 100, 105)]


def test_sliding_windows_exact_multiple(spark):
    df = spark.createDataFrame([("a", 0, 20)], ["user_id", "start_us", "end_us"])
    out = rows(sliding_windows(df, window=10, hop=5), "w_idx", "win_end")
    # (20-10)/5 = 2 exactly -> 3 windows, final ends at 20 unclipped
    assert out == [(0, 10), (1, 15), (2, 20)]


def test_budgeted_topk_longest_first(spark):
    df = spark.createDataFrame(
        [("a", 1, 50), ("a", 2, 40), ("a", 3, 30), ("a", 4, 20)],
        ["user_id", "event_id", "dur_us"],
    )
    out = rows(
        budgeted_topk(df, budget=100, order_cols=("event_id",)),
        "event_id", "dur_us",
    )
    # 50 + 40 = 90 <= 100; +30 would exceed -> stops (cumsum semantics:
    # 30 makes 120 > 100, 20 makes 110 > 100 - neither admitted)
    assert out == [(1, 50), (2, 40)]


def test_ranged_cumsum_before_matches_naive(spark):
    """The two-level value-bucketed scan must equal the naive global
    exclusive prefix sum for every row, regardless of where the sampled
    bucket boundaries fall (here: 200 distinct keys in [0, 10000)
    over width-1024 value buckets → 10 buckets)."""
    import random

    from pyspark.sql import functions as F

    from speech_data_pipeline_spark.operators.windows import (
        ranged_cumsum_before,
    )

    rng = random.Random(7)
    rows = [(k, rng.randrange(1, 100)) for k in rng.sample(range(10_000), 200)]
    df = spark.createDataFrame(rows, "v long, c long")
    got = {
        r["v"]: r["cum_before"]
        for r in ranged_cumsum_before(df, "v", "c", bucket_width=1024).collect()
    }
    run, want = 0, {}
    for v, c in sorted(rows):
        want[v] = run
        run += c
    assert got == want


def test_ranged_cumsum_before_single_row_and_empty(spark):
    from speech_data_pipeline_spark.operators.windows import (
        ranged_cumsum_before,
    )

    one = spark.createDataFrame([(5, 3)], "v long, c long")
    assert ranged_cumsum_before(one, "v", "c").collect()[0]["cum_before"] == 0
    empty = spark.createDataFrame([], "v long, c long")
    assert ranged_cumsum_before(empty, "v", "c").count() == 0
