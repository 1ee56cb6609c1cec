"""W8: recursive longest-gap splitting (SURVEY.md §2.6 W8; reference
modules/models/silero_vad.py:81-112 ``segment_speech``).

Spans longer than ``max_span`` are recursively split at their largest
internal gap between member segments until every piece fits (or no
internal gap remains). Inherently recursive with data-dependent split
points — no Catalyst primitive — so it runs as a per-key
``applyInPandas`` kernel over (key, span) groups, the same shape as the
other session kernels: one shuffle, executor-side recursion bounded by
one file's segments.
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
    key_type = dict(df.dtypes)[key]
    schema = (
        f"{key} {key_type}, {start} long, {end} long, "
        "piece_id long, piece_start long, piece_end long"
    )

    def split(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values([start, end], kind="mergesort").reset_index(drop=True)
        s = pdf[start].to_numpy()
        e = pdf[end].to_numpy()
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

        rec(0, len(pdf))
        pieces.sort()
        rows = []
        k = pdf[key].iloc[0]
        for pid, (lo, hi) in enumerate(pieces):
            ps, pe = int(s[lo]), int(e[lo:hi].max())
            for i in range(lo, hi):
                rows.append((k, int(s[i]), int(e[i]), pid, ps, pe))
        return pd.DataFrame(
            rows,
            columns=[key, start, end, "piece_id", "piece_start", "piece_end"],
        )

    return df.select(key, start, end).groupBy(key).applyInPandas(split, schema=schema)
