"""F2: the silence classifier, with the reference's double-append quirk
behind a compat flag (SURVEY.md §7 known-hard #2).

Reference semantics (modules/models/utils.py:127-143): a gap row is
silence if it is SHORT (``dur < default_silence_duration``) — appended —
and then, in an independent ``if`` (not ``elif``), if it is QUIET (all
four neighbor-ratio predicates under threshold) — appended AGAIN. A gap
that is both short and quiet therefore lands in the silence list twice.

The engine default fixes this (one row per gap, ``silence`` boolean);
``compat_double_append=True`` reproduces the duplicate rows exactly so
reference outputs can be diffed byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classify_silence(
    gaps: DataFrame,
    default_silence_duration: float = 0.25,
    energy_threshold: float = 0.1,
    peak_threshold: float = 0.1,
    start: str = "start",
    end: str = "end",
    compat_double_append: bool = False,
) -> DataFrame:
    """Classify gap rows into silence vs noise (F2).

    Expects the J4/J8 gap-row schema: ``energy_ratio_prev/next``,
    ``peak_ratio_prev/next`` columns alongside the bounds. Returns the
    input plus ``is_short``, ``is_quiet``, ``silence``; with the compat
    flag, short-AND-quiet rows are emitted twice (the reference bug).
    """
    is_short = (F.col(end) - F.col(start)) < default_silence_duration
    is_quiet = (
        (F.col("energy_ratio_prev") < energy_threshold)
        & (F.col("energy_ratio_next") < energy_threshold)
        & (F.col("peak_ratio_prev") < peak_threshold)
        & (F.col("peak_ratio_next") < peak_threshold)
    )
    out = (
        gaps.withColumn("is_short", is_short)
        .withColumn("is_quiet", is_quiet)
        .withColumn("silence", is_short | is_quiet)
    )
    if not compat_double_append:
        return out
    dupes = out.where(F.col("is_short") & F.col("is_quiet"))
    return out.unionByName(dupes)
