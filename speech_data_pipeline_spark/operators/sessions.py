"""Sessionization operators (SURVEY.md §2.6 — W1, W2, W9).

Three flavors:

1. ``sessionize_gap`` — the classic gap-only merge: consecutive segments
   join when the gap to the predecessor is <= ``interval``. Pure window
   functions (lag → new-session flag → running sum = session id), fully
   Catalyst-optimizable, one shuffle on the partition key. This is the
   scalable default and is SQL-expressible for oracle checking.

2. ``sessionize_capped`` — the reference's full ``combine_timestamps``
   semantics (modules/models/utils.py:64-102): merge while gap <=
   interval AND the merged span stays <= ``max_duration``, measured
   against the *running session start*. The cap makes the recurrence
   non-associative (each break decision depends on where the current
   session started), so no fixed window-function composition computes
   it; it runs as a sequential per-key scan inside ``mapInPandas`` over
   hash-partitioned, partition-sorted rows (one Python call per Arrow
   batch, open session carried across batches — ~3× cheaper locally
   than a per-group ``applyInPandas`` at thousands of small groups).
   Per-key cardinality is one file's segments (~1e2-1e4 rows), the scan
   is O(n), data never leaves executors, and the whole operator is one
   shuffle — this is the 100 TB-honest shape.

3. ``sessionize_barriers`` — W9: rows of a barrier stream flush sessions;
   implemented as a cumulative count of barriers at-or-before each start
   (one extra window pass) feeding the gap kernel with the barrier id in
   the partition key.

Reference edge semantics preserved (tested in tests/test_sessions.py):
- gap break is strict ``>`` — a gap exactly equal to ``interval`` merges
  (utils.py:78 uses ``start - cur_end > interval`` to break);
- the span cap compares ``end - session_start > max_duration`` *before*
  admitting the segment (utils.py:79-83);
- ``must_include_voice`` drops sessions with no 'voice'-typed member
  while accumulating a ``types`` list (utils.py:85-94);
- trailing session always flushes (utils.py:97-101).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_gap(
    df: DataFrame,
    interval: float,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
    extra_keys: Iterable[str] = (),
) -> DataFrame:
    """Gap-bounded session merge (W1 without the span cap).

    Returns one row per session: ``key, session_id, session_start,
    session_end, n_segments``. A new session starts when
    ``start - max(previous ends) > interval`` (strict ``>``, reference
    parity). Using the running max of ``end`` (not ``lag(end)``) makes
    the flag correct even when segments overlap out of order.
    """
    keys = [key, *extra_keys]
    w = Window.partitionBy(*keys).orderBy(start, end)
    run_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flag = F.when(
        run_max_end.isNull() | (F.col(start) - run_max_end > F.lit(interval)),
        F.lit(1),
    ).otherwise(F.lit(0))
    with_id = df.withColumn("_new", flag).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_id.groupBy(*keys, "session_id")
        .agg(
            F.min(start).alias("session_start"),
            F.max(end).alias("session_end"),
            F.count(F.lit(1)).alias("n_segments"),
        )
    )


def sessionize_capped(
    df: DataFrame,
    interval: float,
    max_duration: float,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
    type_col: str | None = None,
    must_include: str | None = None,
    break_cols: Iterable[str] = (),
    compat_overwrite_end: bool = False,
) -> DataFrame:
    """Full ``combine_timestamps`` semantics (W1) / speaker-aware (W2).

    ``break_cols`` adds the reference's ``combine_same_speaker`` break
    (modules/speaker_rematch.py:25-43): a change in any break column
    ends the session, making this one kernel serve both W1 and W2.

    ``compat_overwrite_end``: the reference sets the session end to the
    *last merged segment's* end unconditionally
    (modules/models/utils.py:94-96) — on overlapping input a contained
    segment can SHRINK the session. The engine default keeps a running
    max (identical on the reference's own non-overlapping VAD input);
    the flag reproduces the overwrite byte-for-byte.

    Execution: one hash shuffle on ``key`` + partition-local sort, then
    a ``mapInPandas`` scan that walks each partition's (contiguous,
    sorted) groups with the sequential recurrence, carrying the open
    session across Arrow batch boundaries. One Python invocation per
    Arrow batch — NOT per key (an ``applyInPandas`` per-group kernel
    pays ~2.5 s of pure invocation overhead at 1.5k groups locally;
    this shape is ~3× cheaper and identical at cluster scale, where
    partitions hold many keys each).
    """
    break_cols = list(break_cols)
    dtypes = dict(df.dtypes)
    out_fields = [
        f"{key} {dtypes[key]}",
        "session_id long",
        "session_start long",
        "session_end long",
        "n_segments long",
    ]
    for c in break_cols:
        out_fields.append(f"{c} {dtypes[c]}")
    if type_col is not None:
        out_fields.append("types array<string>")
    schema = ", ".join(out_fields)

    has_types = type_col is not None
    out_cols = [key, "session_id", "session_start", "session_end", "n_segments"]
    out_cols += break_cols
    if has_types:
        out_cols.append("types")

    def run(batches) -> "pd.DataFrame":
        # state spans batches: (cur_key, cur=[start,end,n,types,breaks], sid)
        cur_key = None
        cur = None
        sid = 0
        rows = []

        def flush():
            nonlocal sid
            if cur is None:
                return
            if must_include is not None and must_include not in cur[3]:
                return
            sid += 1
            rows.append(
                (cur_key, sid, cur[0], cur[1], cur[2], *cur[4],
                 *([sorted(set(cur[3]))] if has_types else []))
            )

        for pdf in batches:
            keys = pdf[key].to_numpy()
            starts = pdf[start].to_numpy()
            ends = pdf[end].to_numpy()
            tys = pdf[type_col].to_numpy() if has_types else None
            bvs = (
                list(zip(*(pdf[c].to_numpy() for c in break_cols)))
                if break_cols
                else None
            )
            for i in range(len(pdf)):
                k, s, e = keys[i], starts[i], ends[i]
                bv = bvs[i] if bvs is not None else ()
                if k != cur_key:
                    flush()
                    cur_key, cur, sid = k, None, 0
                if cur is None:
                    cur = [s, e, 1, [tys[i]] if has_types else [], bv]
                elif (
                    s - cur[1] > interval
                    or e - cur[0] > max_duration
                    or bv != cur[4]
                ):
                    flush()
                    cur = [s, e, 1, [tys[i]] if has_types else [], bv]
                else:
                    cur[1] = e if compat_overwrite_end else max(cur[1], e)
                    cur[2] += 1
                    if has_types:
                        cur[3].append(tys[i])
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)
                rows = []
        flush()
        if rows:
            yield pd.DataFrame(rows, columns=out_cols)

    cols = [key, start, end]
    if has_types:
        cols.append(type_col)
    cols += break_cols
    return (
        df.select(*cols)
        .repartition(key)
        .sortWithinPartitions(key, start, end)
        .mapInPandas(run, schema=schema)
    )


def sessionize_barriers(
    df: DataFrame,
    barriers: DataFrame,
    interval: float,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
    barrier_start: str = "start_us",
) -> DataFrame:
    """W9: barrier rows flush sessions.

    ``barrier_id`` = count of barrier rows with start <= this row's
    start, computed by unioning the two streams and taking a running sum
    — one window pass, no range join. Sessions then form within
    ``(key, barrier_id)`` via :func:`sessionize_gap`.
    """
    seg = df.select(
        F.col(key), F.col(start), F.col(end), F.lit(0).alias("_is_barrier")
    )
    bar = barriers.select(
        F.col(key),
        F.col(barrier_start).alias(start),
        F.col(barrier_start).alias(end),
        F.lit(1).alias("_is_barrier"),
    )
    unioned = seg.unionByName(bar)
    w = Window.partitionBy(key).orderBy(start, F.col("_is_barrier").desc(), end)
    with_bid = (
        unioned.withColumn(
            "barrier_id",
            F.sum("_is_barrier").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .where(F.col("_is_barrier") == 0)
        .drop("_is_barrier")
    )
    return sessionize_gap(
        with_bid, interval, key=key, start=start, end=end, extra_keys=("barrier_id",)
    )
