"""Sliding-window explode and budgeted accumulation (SURVEY.md W4/W5, A12).

``sliding_windows`` reproduces the reference's per-segment anchored
window generation (modules/separation_filter.py:242-260): for segments
longer than ``window``, emit windows of length ``window`` stepped by
``hop`` anchored at the segment start, the final window clipped to the
segment end, generation stopping once the segment is covered. Segments
shorter than or equal to ``window`` pass through as a single window.

This is `sequence` + `explode` — pure Catalyst, whole-stage codegen,
no UDF. Unlike ``F.window(ts, ...)`` the windows are anchored per
segment, not to the epoch, which is the reference's semantics.

``budgeted_topk`` is A12 (modules/host_rematch.py:100-109): per key,
take rows in descending-duration order while the running total stays
within ``budget`` — ordered window cumsum + filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_windows(
    df: DataFrame,
    window: int,
    hop: int,
    key: str = "user_id",
    start: str = "start_us",
    end: str = "end_us",
) -> DataFrame:
    """Explode each segment into anchored sliding windows.

    Window ``i`` spans ``[start + i*hop, min(start + i*hop + window,
    end))``. The number of windows is the smallest ``n`` such that
    ``start + (n-1)*hop + window >= end`` (coverage-based early break,
    reference parity: separation_filter.py:258-260), i.e.
    ``n = max(1, ceil((len - window) / hop) + 1)``.
    """
    seg_len = F.col(end) - F.col(start)
    n_windows = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((seg_len - F.lit(window)) / F.lit(hop).cast("double")) + F.lit(1),
    )
    return (
        df.withColumn("_n", n_windows)
        .withColumn("w_idx", F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n") - 1)))
        .select(
            F.col(key),
            F.col(start).alias("seg_start"),
            F.col(end).alias("seg_end"),
            F.col("w_idx"),
            (F.col(start) + F.col("w_idx") * F.lit(hop)).alias("win_start"),
            F.least(
                F.col(start) + F.col("w_idx") * F.lit(hop) + F.lit(window),
                F.col(end),
            ).alias("win_end"),
        )
    )


def budgeted_topk(
    df: DataFrame,
    budget,
    key: str = "user_id",
    weight_col: str = "dur_us",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Greedy longest-first accumulation up to ``budget`` per key (A12).

    Rows are taken in descending ``weight_col`` order while the running
    sum *including the current row* stays <= ``budget``. ``order_cols``
    break ties deterministically.
    """
    w = Window.partitionBy(key).orderBy(
        F.col(weight_col).desc(), *[F.col(c) for c in order_cols]
    )
    return (
        df.withColumn(
            "_cum",
            F.sum(weight_col).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .where(F.col("_cum") <= budget)
        .drop("_cum")
    )


def ranged_cumsum_before(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out: str = "cum_before",
    bucket_width: int = 65536,
) -> DataFrame:
    """Distributed EXCLUSIVE prefix sum of ``val_col`` in ``order_col``
    order — the scalable replacement for an unpartitioned
    ``sum().over(Window.orderBy(...))`` when the ordered relation is
    too large for one task (e.g. a DISTINCT-value table whose domain is
    millions of grid points, not a driver-known constant).

    Two-level scan over DETERMINISTIC value buckets ``order_col div
    bucket_width`` (order-preserving, computed from the value itself —
    no range-exchange sampling, no spark_partition_id, so the bucket
    of a row can never disagree between the two plan branches even if
    the shared subtree is re-evaluated): the running sum runs LOCALLY
    within each bucket, then each bucket's offset — the prefix sum of
    per-bucket totals — is computed by a window over only the
    bucket-total table and broadcast back. The only partition-less
    window in the plan therefore sorts |domain| / bucket_width rows,
    never the input relation.

    Intended for integer ``order_col`` with a value-domain-bounded
    range (distinct-value/grid tables): per-bucket rows ≤ bucket_width
    when the input holds distinct values, and the offset table is
    domain/width rows (e.g. a 10⁷-cent price grid at the default
    width → ≤153 bucket rows).

    Returns ``df``'s columns plus ``out``.
    """
    b = df.withColumn(
        "_bkt", (F.col(order_col) - (F.col(order_col) % bucket_width))
    )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn(
        "_lcum", F.coalesce(F.sum(val_col).over(w_in), F.lit(0).cast("long"))
    )
    ptot = b.groupBy("_bkt").agg(F.sum(val_col).alias("_pc"))
    w_p = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = ptot.select(
        "_bkt",
        F.coalesce(F.sum("_pc").over(w_p), F.lit(0).cast("long")).alias(
            "_poff"
        ),
    )
    return (
        local.join(F.broadcast(off), "_bkt")
        .withColumn(out, F.col("_lcum") + F.col("_poff"))
        .drop("_bkt", "_lcum", "_poff")
    )
