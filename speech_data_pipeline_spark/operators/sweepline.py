"""Sweep-line overlap flattening (SURVEY.md W3; reference
modules/diarization.py:24-64).

Input: possibly-overlapping tagged segments ``(key, start, end, tag)``
(speaker-labelled diarization rows in the reference). Output: a flat,
non-overlapping partition of the covered timeline where each emitted
piece carries the full set of tags active over it.

Two implementations with identical semantics:

- ``flatten_active_counts`` — declarative: explode each segment into
  (+1 at start, -1 at end) boundary events, running sum = concurrency.
  Pure window functions; use when only the *count* of active tags is
  needed. Scales as one shuffle + one window pass.

- ``flatten_active_sets`` — the full active-*set* semantics. A running
  set (add on start event, remove on end event) is not expressible as a
  built-in window aggregate, so it runs as an O(n log n) per-key kernel
  inside ``mapInPandas`` over hash-partitioned, partition-sorted rows
  (one Python call per Arrow batch, the current key buffered across
  batch boundaries) — same algorithm as the reference, but per
  partition-key on executors instead of per file on one machine.

Reference edge semantics preserved: at equal boundary time, end events
are processed before start events (diarization.py:39 sorts by
``(time, is_end DESC)`` so back-to-back segments don't fabricate an
overlap); zero-length pieces between coincident boundaries are not
emitted; pieces with an empty active set (gaps) are not emitted.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def flatten_active_counts(
    df: DataFrame,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
) -> DataFrame:
    """Timeline pieces with the number of concurrently-active segments.

    Returns ``(key, piece_start, piece_end, n_active)`` for every
    maximal piece with ``n_active >= 1``.
    """
    starts = df.select(F.col(key), F.col(start).alias("t"), F.lit(1).alias("delta"))
    ends = df.select(F.col(key), F.col(end).alias("t"), F.lit(-1).alias("delta"))
    events = starts.unionByName(ends)
    # Single shuffle: a running sum over individual boundary rows equals
    # the per-timestamp grouped sum at the LAST row of each timestamp, so
    # instead of groupBy(key, t) (a second exchange on a different key)
    # we keep only last-of-t rows with a window predicate. The second
    # window pass reuses the first's hash partitioning (filter preserves
    # it), so it sorts without exchanging.
    w = Window.partitionBy(key).orderBy("t", "delta")
    events = events.withColumn(
        "n_active",
        F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("_next_t", F.lead("t").over(w))
    last_of_t = events.where(F.col("_next_t").isNull() | (F.col("_next_t") > F.col("t")))
    w2 = Window.partitionBy(key).orderBy("t")
    flat = (
        last_of_t.withColumn("piece_end", F.lead("t").over(w2))
        .where(F.col("piece_end").isNotNull() & (F.col("n_active") >= 1))
        .select(
            F.col(key),
            F.col("t").alias("piece_start"),
            "piece_end",
            F.col("n_active").cast("long").alias("n_active"),
        )
    )
    return flat


def flatten_active_sets(
    df: DataFrame,
    key: str = "user_id",
    tag: str = "tag",
    start: str = "start_us",
    end: str = "end_us",
) -> DataFrame:
    """Timeline pieces with the sorted set of active tags (full W3).

    Returns ``(key, piece_start, piece_end, tags array<string>,
    n_active)``. Multi-instance tags are reference-counted (the same
    tag active twice stays in the set until both instances end).
    Zero/negative-length segments are dropped on entry: they cover no
    timeline and would otherwise inject spurious piece boundaries.
    """
    df = df.where(F.col(end) > F.col(start))
    key_type = dict(df.dtypes)[key]
    schema = (
        f"{key} {key_type}, piece_start long, piece_end long, "
        "tags array<string>, n_active long"
    )
    cols = [key, "piece_start", "piece_end", "tags", "n_active"]

    def sweep_one(k, starts, ends, tags) -> list:
        events = [(s, 1, t) for s, t in zip(starts, tags)]
        events += [(e, 0, t) for e, t in zip(ends, tags)]
        events.sort(key=lambda ev: (ev[0], ev[1]))  # ends before starts at ties
        active: dict[str, int] = {}
        rows = []
        prev_t = None
        for t, is_start, tg in events:
            if prev_t is not None and t > prev_t and active:
                rows.append((k, prev_t, t, sorted(active), len(active)))
            if is_start:
                active[tg] = active.get(tg, 0) + 1
            else:
                active[tg] -= 1
                if active[tg] == 0:
                    del active[tg]
            prev_t = t
        return rows

    def run(batches):
        # One Python call per Arrow batch (not per key); a key's rows are
        # contiguous after the partition-local sort, so buffer the current
        # key across batch boundaries and sweep it when the key changes.
        cur_key = None
        b_start: list = []
        b_end: list = []
        b_tag: list = []
        out: list = []
        for pdf in batches:
            keys = pdf[key].to_numpy()
            starts = pdf[start].to_numpy()
            ends = pdf[end].to_numpy()
            tags = pdf[tag].astype(str).to_numpy()
            i = 0
            n = len(pdf)
            while i < n:
                j = i
                while j < n and keys[j] == keys[i]:
                    j += 1
                if cur_key is not None and keys[i] != cur_key:
                    out.extend(sweep_one(cur_key, b_start, b_end, b_tag))
                    b_start, b_end, b_tag = [], [], []
                cur_key = keys[i]
                b_start.extend(starts[i:j])
                b_end.extend(ends[i:j])
                b_tag.extend(tags[i:j])
                i = j
            if out:
                yield pd.DataFrame(out, columns=cols)
                out = []
        if cur_key is not None and b_start:
            rows = sweep_one(cur_key, b_start, b_end, b_tag)
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return (
        df.select(key, start, end, tag)
        .repartition(key)
        .sortWithinPartitions(key, start, end)
        .mapInPandas(run, schema=schema)
    )


def split_single_overlap(flat: DataFrame) -> tuple[DataFrame, DataFrame]:
    """F5: split flattened pieces into single-tag vs overlapping (size>1)."""
    single = flat.where(F.col("n_active") == 1).withColumn(
        "tag", F.col("tags")[0]
    ).drop("tags", "n_active")
    overlap = flat.where(F.col("n_active") > 1)
    return single, overlap
