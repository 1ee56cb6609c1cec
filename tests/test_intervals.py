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


def test_banded_interval_joins_equal_unbanded(spark):
    """The (key, time-band) bucketing is invisible to semantics: on a
    dense hot-key fixture whose intervals span many bands, the banded
    containment join equals the pure key-equi join (band_us=None) and
    the banded max-overlap join equals a driver-side nested-loop
    argmax — single-bucket attribution emits every pair exactly once."""
    import random

    from pyspark.sql import functions as F

    rnd = random.Random(7)
    BAND = 14_400_000_000  # operator default
    rows_ = []
    for i in range(400):
        u = 1 if i % 5 else 2  # hot key 1 at 80%
        s = rnd.randrange(0, 30 * BAND)
        ln = rnd.randrange(1, 3 * BAND)  # spans 0-3 bands
        rows_.append((i, u, s, s + ln))
    # WIDE rows: an open-end sentinel and a months-long interval — must
    # route through the key-equi branch, not a span-sized explode
    rows_.append((1001, 1, 5 * BAND, (1 << 62)))
    rows_.append((1002, 1, 0, 500 * BAND))
    rows_.append((1003, 2, 2 * BAND, (1 << 62)))
    df = spark.createDataFrame(
        rows_, "event_id long, user_id long, start_us long, end_us long"
    )
    inner = df.where(F.col("event_id") % 2 == 0)
    outer = df.where(F.col("event_id") % 2 == 1).withColumnRenamed(
        "event_id", "o_id"
    )

    banded = rows(
        containment_join(inner, outer), "event_id", "o_id", "user_id"
    )
    plain = rows(
        containment_join(inner, outer, band_us=None),
        "event_id",
        "o_id",
        "user_id",
    )
    assert sorted(banded) == sorted(plain)
    assert len(banded) == len(set(banded))  # no pair emitted twice

    right = outer.select(
        "user_id", "start_us", "end_us", F.col("o_id").cast("string").alias("tag")
    )
    got = {
        (r["user_id"], r["l_start"], r["l_end"]): (r["best_tag"], r["best_overlap"])
        for r in max_overlap_join(inner, right).collect()
    }
    # driver replay: max over (overlap, tag) per left interval
    rights = [(u, s, e, str(o)) for o, u, s, e in
              [(r[0], r[1], r[2], r[3]) for r in rows_ if r[0] % 2 == 1]]
    expect = {}
    for eid, u, s, e in [r for r in rows_ if r[0] % 2 == 0]:
        best = None
        for ru, rs, re_, tag in rights:
            if ru == u and s < re_ and rs < e:
                ov = max(0, min(e, re_) - max(s, rs))
                kk = (ov, tag)
                if best is None or kk > best:
                    best = kk
        if best:
            expect[(u, s, e)] = (best[1], best[0])
    assert got == expect
