"""Per-key sequential recurrences: EWMA smoothing and CUSUM change
detection.

Both are order-dependent, non-associative scans — the class of operator
a declarative engine cannot express with windows alone (a running EWMA
is not a frame aggregate; CUSUM's clamp-at-zero and alarm-reset make it
state-machine shaped). The engine shape follows
``operators/sessions.py``: ONE hash shuffle on the key, a
partition-local sort, then a ``mapInPandas`` scan that walks each
partition's contiguous key groups carrying state across Arrow batch
boundaries — one Python invocation per Arrow batch, not per key, so
thousands of small keys cost nothing extra. At 100 TB each executor
scans only its own key range; no state ever crosses partitions.

Cross-engine float contract (EWMA): the recurrence is
``y ← 0.75·y + 0.25·x`` evaluated in IEEE float64 with x an
exactly-representable integer (milli-quantized at the scan). 0.25 and
0.75 are dyadic (exact binary), the multiply-by-0.25 is exact, so each
step is two rounded IEEE ops in a fixed order — a DuckDB recursive CTE
replaying the identical expression matches to the last bit. CUSUM is
all-integer (max(0, s + x − k) with BIGINT operands): exact everywhere.

Reference parity: none (the reference has no time-series surface);
beyond-reference analytics per SURVEY.md north star.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ewma_smooth(
    df: DataFrame,
    key: str,
    order: list[str],
    value_col: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
) -> DataFrame:
    """Per-key exponentially weighted moving average.

    ``alpha = alpha_num / alpha_den`` must be dyadic (den a power of
    two) so the blend constants are exact binary floats. State carries
    across Arrow batches; groups are contiguous after the repartition +
    partition sort.

    Output: key, order cols, ``value_col`` (passed through), ``ewma``
    (raw float64 — caller truncates for display).
    """
    if alpha_den & (alpha_den - 1):
        raise ValueError("alpha_den must be a power of two for exact floats")
    a = alpha_num / alpha_den
    b = 1.0 - a

    dtypes = dict(df.dtypes)
    out_cols = [key, *order, value_col, "ewma"]
    schema = ", ".join(
        [f"{key} {dtypes[key]}"]
        + [f"{c} {dtypes[c]}" for c in order]
        + [f"{value_col} {dtypes[value_col]}", "ewma double"]
    )

    def run(batches):
        cur_key = None
        y = 0.0
        rows = []
        for pdf in batches:
            keys = pdf[key].to_numpy()
            vals = pdf[value_col].to_numpy()
            ords = [pdf[c].to_numpy() for c in order]
            for i in range(len(pdf)):
                k = keys[i]
                x = float(vals[i])
                if k != cur_key:
                    cur_key = k
                    y = x
                else:
                    y = b * y + a * x
                rows.append((k, *(o[i] for o in ords), vals[i], y))
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)
                rows = []

    return (
        df.select(key, *order, value_col)
        .repartition(key)
        .sortWithinPartitions(key, *order)
        .mapInPandas(run, schema=schema)
    )


def cusum_alarms(
    df: DataFrame,
    key: str,
    order: list[str],
    value_col: str,
    target: int,
    slack: int,
    threshold: int,
) -> DataFrame:
    """Two-sided CUSUM over an integer-quantized measure.

    High side: ``s ← max(0, s + (x − target − slack))``; low side:
    ``t ← max(0, t + (target − x − slack))``. A side crossing
    ``threshold`` emits an alarm row and resets that side to zero
    (standard tabular-CUSUM restart). All state is BIGINT — exact on
    any engine, any partitioning.

    Output: key, order cols, ``side`` ('high'|'low'), ``stat`` (the
    statistic at the alarm), ``alarm_no`` (1-based per key+side).
    """
    dtypes = dict(df.dtypes)
    out_cols = [key, *order, "side", "stat", "alarm_no"]
    schema = ", ".join(
        [f"{key} {dtypes[key]}"]
        + [f"{c} {dtypes[c]}" for c in order]
        + ["side string", "stat long", "alarm_no long"]
    )

    def run(batches):
        cur_key = None
        s = t = 0
        n_hi = n_lo = 0
        rows = []
        for pdf in batches:
            keys = pdf[key].to_numpy()
            vals = pdf[value_col].to_numpy()
            ords = [pdf[c].to_numpy() for c in order]
            for i in range(len(pdf)):
                k = keys[i]
                x = int(vals[i])
                if k != cur_key:
                    cur_key, s, t, n_hi, n_lo = k, 0, 0, 0, 0
                s = max(0, s + (x - target - slack))
                t = max(0, t + (target - x - slack))
                okey = tuple(o[i] for o in ords)
                if s > threshold:
                    n_hi += 1
                    rows.append((k, *okey, "high", s, n_hi))
                    s = 0
                if t > threshold:
                    n_lo += 1
                    rows.append((k, *okey, "low", t, n_lo))
                    t = 0
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)
                rows = []

    return (
        df.select(key, *order, value_col)
        .repartition(key)
        .sortWithinPartitions(key, *order)
        .mapInPandas(run, schema=schema)
    )


def holt_linear(
    df: DataFrame,
    key: str,
    order: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + trend), with
    dyadic α=1/4, β=1/8 so every blend constant is an exact binary
    float (the :func:`ewma_smooth` parity contract).

    Recurrence (evaluated in EXACTLY this op order — the oracle's
    recursive CTE replays the same tree):

        l ← 0.25·x + 0.75·(l₋₁ + b₋₁)
        b ← 0.125·(l − l₋₁) + 0.875·b₋₁

    seeded l₁ = x₁, b₁ = 0. Output adds ``level``, ``trend`` and the
    one-step-ahead forecast ``fc = l + b`` as raw float64.
    """
    dtypes = dict(df.dtypes)
    out_cols = [key, *order, value_col, "level", "trend", "fc"]
    schema = ", ".join(
        [f"{key} {dtypes[key]}"]
        + [f"{c} {dtypes[c]}" for c in order]
        + [f"{value_col} {dtypes[value_col]}",
           "level double", "trend double", "fc double"]
    )

    def run(batches):
        cur_key = None
        l = b = 0.0
        rows = []
        for pdf in batches:
            keys = pdf[key].to_numpy()
            vals = pdf[value_col].to_numpy()
            ords = [pdf[c].to_numpy() for c in order]
            for i in range(len(pdf)):
                k = keys[i]
                x = float(vals[i])
                if k != cur_key:
                    cur_key, l, b = k, x, 0.0
                else:
                    lp = l
                    l = 0.25 * x + 0.75 * (lp + b)
                    b = 0.125 * (l - lp) + 0.875 * b
                rows.append(
                    (k, *(o[i] for o in ords), vals[i], l, b, l + b)
                )
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)
                rows = []

    return (
        df.select(key, *order, value_col)
        .repartition(key)
        .sortWithinPartitions(key, *order)
        .mapInPandas(run, schema=schema)
    )
