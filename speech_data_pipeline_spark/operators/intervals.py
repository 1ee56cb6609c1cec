"""Interval/segment algebra over segment tables.

A *segment table* is any DataFrame with a partition key column (the
reference's ``audio_id``; here usually ``user_id``) and inclusive
``start``/exclusive ``end`` bound columns (integer microseconds or double
seconds — the algebra is unit-agnostic).

Every operator here is a declarative DataFrame transform; Catalyst picks
the physical plan. Scale notes are given per-operator.

Reference parity citations (SURVEY.md §2.3/§2.4):
- lead_gaps            → modules/separation_filter.py:108-114 (J4)
- containment_join     → modules/separation_filter.py:190-193,231-236 (J1),
                         modules/speaker_rematch.py:147-155 (J2)
- max_overlap_join     → modules/speaker_rematch.py:224-234 (J3)
- suppress_non_monotonic → modules/models/silero_vad.py:136-139 (F7)
- clamp                → modules/vad_multi.py:33-35 (F11)
- overlap_length       → modules/speaker_rematch.py:227-230 (X15)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def overlap_length(
    a_start: Column, a_end: Column, b_start: Column, b_end: Column
) -> Column:
    """``max(0, min(ends) - max(starts))`` — temporal overlap (X15)."""
    return F.greatest(
        F.least(a_end, b_end) - F.greatest(a_start, b_start),
        F.lit(0).cast("long"),
    )


def clamp(
    df: DataFrame,
    pad: float,
    lower: float = 0.0,
    upper_col: str = "duration",
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """Pad bounds outward then clamp into ``[lower, upper_col]`` (F11)."""
    return df.withColumn(
        start, F.greatest(F.col(start) - F.lit(pad), F.lit(lower))
    ).withColumn(end, F.least(F.col(end) + F.lit(pad), F.col(upper_col)))


def lead_gaps(
    df: DataFrame,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
) -> DataFrame:
    """Derive the gap row between each segment and its successor (J4).

    ``lead`` over ``(partitionBy key, orderBy start)``; overlapping
    successors (next start < this end) produce no gap row, matching the
    reference's skip (modules/separation_filter.py:112-114).

    Scale: one shuffle on ``key``; window is within-partition after
    that. No driver-side iteration.
    """
    w = Window.partitionBy(key).orderBy(start, end)
    return (
        df.withColumn("next_start", F.lead(start).over(w))
        .withColumn("next_end", F.lead(end).over(w))
        .where(F.col("next_start").isNotNull() & (F.col("next_start") >= F.col(end)))
        .select(
            F.col(key),
            F.col(end).alias("gap_start"),
            F.col("next_start").alias("gap_end"),
            (F.col("next_start") - F.col(end)).alias("gap_len"),
            F.struct(F.col(start), F.col(end)).alias("prev"),
            F.struct(
                F.col("next_start").alias(start), F.col("next_end").alias(end)
            ).alias("next"),
        )
    )


def suppress_non_monotonic(
    df: DataFrame,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
) -> DataFrame:
    """Drop rows fully covered by any earlier-starting row (F7).

    Keeps a row only if its ``end`` exceeds the running max ``end`` of
    all preceding rows (ordered by ``start``) — the reference's
    monotonic-scan suppression of out-of-order/contained rows.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(start, end)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("_prev_max_end", F.max(end).over(w))
        .where(F.col("_prev_max_end").isNull() | (F.col(end) > F.col("_prev_max_end")))
        .drop("_prev_max_end")
    )


#: Default time-band width for the skew-resilient interval joins: 4
#: hours in microseconds. A hot key (one user/file carrying a large
#: fraction of all rows) makes a pure key-equi interval join quadratic
#: WITHIN the key — banding splits the key across (key, band) buckets
#: so per-partition work is density×band, and AQE can split the
#: residual hot buckets because the join stays equi. Width ≈ the mean
#: interval span: narrower bands shrink per-bucket populations but
#: inflate the span/band explode factor (1 h measured 2.5× overhead on
#: uniform data; 4 h is ~1.8× there while still cutting the 20%-hot-key
#: stress case j1 23.3→1.8 s and j3 23.6→2.5 s — BENCH_SCALE.md).
BAND_US = 14_400_000_000


#: An interval spanning more than this many bands is WIDE: it skips
#: the explode (which would build a span/band-element array — an
#: open-end sentinel like Long.MAX would ask for ~6.4e8 elements and
#: OOM the executor) and routes through a plain key-equi branch
#: instead. Wide rows are rare by construction (64 bands ≈ 10.7 days
#: at the 4 h default), so that branch stays small.
CAP_BANDS = 64


def _bucket_span(start, end, band_us: int):
    """All band buckets an interval [start, end] overlaps (ascending;
    degenerate/inverted intervals clamp to the start bucket). Callers
    must pre-filter WIDE intervals (``_is_wide``) — this sequence is
    unbounded in the span."""
    sb = F.floor(start / F.lit(band_us)).cast("long")
    eb = F.floor(end / F.lit(band_us)).cast("long")
    return F.sequence(sb, F.greatest(sb, eb))


def _is_wide(start, end, band_us: int):
    sb = F.floor(start / F.lit(band_us)).cast("long")
    eb = F.floor(end / F.lit(band_us)).cast("long")
    return (eb - sb) > CAP_BANDS


def containment_join(
    inner: DataFrame,
    outer: DataFrame,
    key: str = "user_id",
    inner_start: str = "start_us",
    inner_end: str = "end_us",
    outer_start: str = "start_us",
    outer_end: str = "end_us",
    how: str = "inner",
    band_us: int | None = BAND_US,
) -> DataFrame:
    """Join each ``inner`` segment to every ``outer`` segment containing it (J1/J2).

    Equi-join on (key, time-band) plus range predicates. Each outer
    interval explodes into every band it spans (span/band + 1 rows);
    each inner interval lands in exactly ONE band — the band of its
    start. A containing outer necessarily spans the inner's start, so
    every matched pair is discovered exactly once, no dedup needed.
    Outers spanning more than ``CAP_BANDS`` bands (open-end sentinels,
    corrupt timestamps) skip the explode and join by key alone — rare
    by construction, so that branch stays small and a single bad row
    cannot materialize a span-sized array. Per-band population is
    rate×band, so a hot key stays linear instead of quadratic-in-key;
    ``band_us=None`` recovers the pure key join (also used
    automatically for ``how`` other than inner — the two-branch union
    can't null-extend unmatched inner rows exactly once).

    The column-name collision is avoided by aliasing both sides; the
    caller gets ``i_*`` and ``o_*`` prefixed bound columns.
    """
    banded = band_us is not None and how == "inner"
    i = inner.select(
        F.col(key).alias("_k"),
        F.col(inner_start).alias("i_start"),
        F.col(inner_end).alias("i_end"),
        *[c for c in inner.columns if c not in (key, inner_start, inner_end)],
    )
    o = outer.select(
        F.col(key).alias("_k"),
        F.col(outer_start).alias("o_start"),
        F.col(outer_end).alias("o_end"),
        *[c for c in outer.columns if c not in (key, outer_start, outer_end)],
    )
    contain = (F.col("i_start") >= F.col("o_start")) & (
        F.col("i_end") <= F.col("o_end")
    )
    if banded:
        wide = _is_wide(F.col("o_start"), F.col("o_end"), band_us)
        ib = i.withColumn(
            "_b", F.floor(F.col("i_start") / F.lit(band_us)).cast("long")
        )
        on = o.where(~wide).withColumn(
            "_b", F.explode(_bucket_span(F.col("o_start"), F.col("o_end"), band_us))
        )
        ow = o.where(wide)
        narrow = (
            ib.join(
                on,
                (ib["_k"] == on["_k"]) & (ib["_b"] == on["_b"]) & contain,
                "inner",
            )
            .drop(on["_k"])
            .drop(ib["_b"])
            .drop(on["_b"])
        )
        wide_j = i.join(ow, (i["_k"] == ow["_k"]) & contain, "inner").drop(
            ow["_k"]
        )
        joined = narrow.unionByName(wide_j)
    else:
        joined = i.join(o, (i["_k"] == o["_k"]) & contain, how).drop(o["_k"])
    return joined.withColumnRenamed("_k", key)


def max_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    right_tag: str = "tag",
    left_start: str = "start_us",
    left_end: str = "end_us",
    right_start: str = "start_us",
    right_end: str = "end_us",
) -> DataFrame:
    """For each left segment, the right segment with maximal overlap (J3).

    Overlap predicate join then ``max_by(tag, overlap)`` per left row —
    the reference's find_overlap_global_speaker as one shuffle-grouped
    aggregate instead of a nested loop.

    Skew-resilient banding (same rationale as ``containment_join``):
    both sides explode into the time bands they span and the join is
    equi on (key, band); an overlapping pair shares the band of its
    OVERLAP START — ``greatest(l_start, r_start)`` (which lies inside
    both intervals) — and the residual keeps the pair only in that
    band, so each pair feeds the max aggregate exactly once. WIDE
    intervals (> ``CAP_BANDS`` bands — open-end sentinels, corrupt
    rows) skip the explode: pairs touching a wide row go through two
    small key-equi branches (wide-left × all-right, narrow-left ×
    wide-right), preserving the exactly-once pair stream.
    """
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_start).alias("l_start"),
        F.col(left_end).alias("l_end"),
    )
    r = right.select(
        F.col(key).alias("_k2"),
        F.col(right_start).alias("r_start"),
        F.col(right_end).alias("r_end"),
        F.col(right_tag).alias("r_tag"),
    )
    l_wide = _is_wide(F.col("l_start"), F.col("l_end"), BAND_US)
    r_wide = _is_wide(F.col("r_start"), F.col("r_end"), BAND_US)
    ln, lw = l.where(~l_wide), l.where(l_wide)
    rn, rw = r.where(~r_wide), r.where(r_wide)
    lb = ln.withColumn(
        "_b", F.explode(_bucket_span(F.col("l_start"), F.col("l_end"), BAND_US))
    )
    rb = rn.withColumn(
        "_b2", F.explode(_bucket_span(F.col("r_start"), F.col("r_end"), BAND_US))
    )
    ov = overlap_length(
        F.col("l_start"), F.col("l_end"), F.col("r_start"), F.col("r_end")
    )
    overlaps = (F.col("l_start") < F.col("r_end")) & (
        F.col("r_start") < F.col("l_end")
    )
    own = F.floor(
        F.greatest(F.col("l_start"), F.col("r_start")) / F.lit(BAND_US)
    ).cast("long")
    cols = ["_k", "l_start", "l_end", "r_start", "r_end", "r_tag"]
    narrow = (
        lb.join(
            rb,
            (F.col("_k") == F.col("_k2")) & (F.col("_b") == F.col("_b2")) & overlaps,
            "inner",
        )
        .where(F.col("_b") == own)
        .select(*cols)
    )
    wide_l = lw.join(
        r, (F.col("_k") == F.col("_k2")) & overlaps, "inner"
    ).select(*cols)
    wide_r = ln.join(
        rw, (F.col("_k") == F.col("_k2")) & overlaps, "inner"
    ).select(*cols)
    return (
        narrow.unionByName(wide_l)
        .unionByName(wide_r)
        .withColumn("_ov", ov)
        .groupBy(F.col("_k").alias(key), "l_start", "l_end")
        .agg(
            F.max_by("r_tag", F.struct(F.col("_ov"), F.col("r_tag"))).alias(
                "best_tag"
            ),
            F.max("_ov").alias("best_overlap"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts_us",
    right_ts: str = "ts_us",
    payload_cols: tuple = ("value",),
    strict: bool = False,
) -> DataFrame:
    """As-of join: each left row gets the LATEST right row at-or-before
    its timestamp (``strict=True``: strictly before) — the time-series
    point-in-time lookup Spark has no primitive for.

    NOT a range join: both streams are unioned, tagged, and scanned
    with one ``last_value(..., ignoreNulls)`` window over
    ``(key, ts, side)`` — the carry-forward trick. ONE shuffle on the
    key, O(n log n) for the partition sort, versus the unbounded-
    preceding range join (quadratic per key) a naive encoding produces.
    Left rows with no prior right row keep NULL payloads (left-outer
    as-of semantics).

    All payload columns ride in ONE struct whose presence marks "this
    is a right row" — the struct is non-null even when every payload
    field inside it is NULL, so ``last(ignorenulls)`` always carries
    the single MATCHED right row: a NULL payload on the matched row
    surfaces as NULL (true as-of / DuckDB ASOF semantics) instead of
    falling through to an older row, and multiple payload columns can
    never mix values from different right rows.
    """
    from pyspark.sql import Window

    rdt = dict(right.dtypes)
    struct_t = "struct<" + ",".join(f"{c}:{rdt[c]}" for c in payload_cols) + ">"
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_row"),
        F.lit(None).cast(struct_t).alias("_p"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l.schema["_row"].dataType).alias("_row"),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("_p"),
    )
    # at equal timestamps: strict=False orders the right row first so the
    # left row sees it; strict=True orders it after so it doesn't
    side_order = F.col("_is_left").asc() if not strict else F.col("_is_left").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l.unionByName(r).select(
        "_k",
        "_is_left",
        "_row",
        F.last("_p", ignorenulls=True).over(w).alias("_asof"),
    )
    out_cols = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    return carried.where(F.col("_is_left") == 1).select(
        *out_cols,
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in payload_cols],
    )
