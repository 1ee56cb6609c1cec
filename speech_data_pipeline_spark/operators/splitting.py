"""W8: recursive longest-gap splitting (SURVEY.md §2.6 W8; reference
modules/models/silero_vad.py:81-112 ``segment_speech``).

Spans longer than ``max_span`` are recursively split at their largest
internal gap between member segments until every piece fits (or no
internal gap remains). Inherently recursive with data-dependent split
points — no Catalyst primitive — so it runs as a per-key kernel inside
``mapInPandas`` over hash-partitioned, partition-sorted rows, the same
shape as the other session kernels: one shuffle, executor-side
recursion bounded by one file's segments, one Python call per Arrow
batch rather than per key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recursive_gap_split(
    df: DataFrame,
    max_span: int,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
) -> DataFrame:
    """Assign each segment a ``piece_id`` such that every piece's span
    (max end - min start) is <= ``max_span`` where achievable.

    Returns the input columns plus ``piece_id`` (0-based within key) and
    per-piece ``piece_start``/``piece_end``. Splitting always chooses
    the largest internal gap (ties: the earliest), exactly the
    reference's recursion.
    """
    import numpy as np

    key_type = dict(df.dtypes)[key]
    schema = (
        f"{key} {key_type}, {start} long, {end} long, "
        "piece_id long, piece_start long, piece_end long"
    )
    cols = [key, start, end, "piece_id", "piece_start", "piece_end"]

    def split_one(k, s, e) -> list:
        # rows arrive sorted by (start, end) from the partition-local sort
        s = np.asarray(s)
        e = np.asarray(e)
        # Global prefix cummax is valid at every recursion level: a split
        # only happens at a strictly positive gap, so the first element
        # of each right-piece ends later than everything before the cut,
        # making local and global cummax identical from its second
        # element on. One O(n) pass replaces per-level recomputation.
        cummax_e = np.maximum.accumulate(e)
        gap_at = np.empty_like(s)
        gap_at[0] = 0
        gap_at[1:] = s[1:] - cummax_e[:-1]  # gap before element i
        pieces: list[tuple[int, int]] = []

        def rec(lo: int, hi: int) -> None:  # [lo, hi) index range
            if cummax_e[hi - 1] - s[lo] <= max_span or hi - lo <= 1:
                pieces.append((lo, hi))
                return
            rel = gap_at[lo + 1 : hi]
            cut = int(rel.argmax()) + lo + 1
            if rel.max() <= 0:  # no internal gap: unsplittable overlap blob
                pieces.append((lo, hi))
                return
            rec(lo, cut)
            rec(cut, hi)

        rec(0, len(s))
        pieces.sort()
        rows = []
        for pid, (lo, hi) in enumerate(pieces):
            ps, pe = int(s[lo]), int(e[lo:hi].max())
            for i in range(lo, hi):
                rows.append((k, int(s[i]), int(e[i]), pid, ps, pe))
        return rows

    def run(batches):
        # one Python call per Arrow batch; buffer the (contiguous) current
        # key across batch boundaries — same shape as the session kernels
        cur_key = None
        b_s: list = []
        b_e: list = []
        out: list = []
        for pdf in batches:
            keys = pdf[key].to_numpy()
            starts = pdf[start].to_numpy()
            ends = pdf[end].to_numpy()
            i, n = 0, len(pdf)
            while i < n:
                j = i
                while j < n and keys[j] == keys[i]:
                    j += 1
                if cur_key is not None and keys[i] != cur_key:
                    out.extend(split_one(cur_key, b_s, b_e))
                    b_s, b_e = [], []
                cur_key = keys[i]
                b_s.extend(starts[i:j])
                b_e.extend(ends[i:j])
                i = j
            if out:
                yield pd.DataFrame(out, columns=cols)
                out = []
        if cur_key is not None and b_s:
            rows = split_one(cur_key, b_s, b_e)
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return (
        df.select(key, start, end)
        .repartition(key)
        .sortWithinPartitions(key, start, end)
        .mapInPandas(run, schema=schema)
    )
