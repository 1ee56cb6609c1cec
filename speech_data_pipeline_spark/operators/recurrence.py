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


def viterbi_burst(
    df: DataFrame,
    key: str,
    order: str,
    value_col: str,
    lo_col: str,
    hi_col: str,
    gamma_col: str,
) -> DataFrame:
    """Per-key two-state burst segmentation by exact Viterbi DP: state
    0 tracks the base level ``lo``, state 1 the burst level ``hi``;
    per-step emission cost is the L1 deviation ``|x − level_s|`` and
    switching costs ``gamma`` (Kleinberg's two-state burst automaton
    with L1 emissions — all INTEGER, so the optimum is engine-exact).

    Recurrence: ``C_s(t) = |x_t − level_s| + min(C_s(t−1),
    C_{1−s}(t−1) + γ)``, init ``C_0(1) = |x₁−lo|``,
    ``C_1(1) = |x₁−hi| + γ``; ties prefer STAYING (strict < to
    switch), final state ties prefer 0. Backtrack recovers the argmin
    path. A DuckDB recursive CTE replays both passes exactly.

    Engine shape: the sessions.py kernel contract — one hash shuffle
    on ``key``, partition-local sort by ``order``, a mapInPandas scan
    carrying state across Arrow batches. Each key's series is
    buffered for the backtrack: series length is bounded by the
    OBSERVATION WINDOW (the caller aggregates the corpus to a per-day
    grid first), never by corpus rows.

    Output: ``(key, order, value_col, state)`` with state ∈ {0, 1}.
    """
    dtypes = dict(df.dtypes)
    schema = ", ".join(
        [
            f"{key} {dtypes[key]}",
            f"{order} {dtypes[order]}",
            f"{value_col} {dtypes[value_col]}",
            "state int",
        ]
    )

    def flush(buf, out):
        if not buf:
            return
        lo, hi, gamma = buf[0][3], buf[0][4], buf[0][5]
        xs = [b[2] for b in buf]
        c0 = abs(xs[0] - lo)
        c1 = abs(xs[0] - hi) + gamma
        from0, from1 = [0], [1]
        for x in xs[1:]:
            n0 = 1 if c1 + gamma < c0 else 0
            n1 = 0 if c0 + gamma < c1 else 1
            nc0 = abs(x - lo) + (c1 + gamma if n0 else c0)
            nc1 = abs(x - hi) + (c0 + gamma if n1 == 0 else c1)
            from0.append(n0)
            from1.append(n1)
            c0, c1 = nc0, nc1
        s = 0 if c0 <= c1 else 1
        states = [0] * len(xs)
        for t in range(len(xs) - 1, -1, -1):
            states[t] = s
            s = from0[t] if s == 0 else from1[t]
        for (k, o, x, *_), st in zip(buf, states):
            out.append((k, o, x, st))

    def run(batches):
        cur_key = None
        buf = []
        cols = [key, order, value_col, lo_col, hi_col, gamma_col]
        for pdf in batches:
            arrs = [pdf[c].to_numpy() for c in cols]
            rows_out = []
            for i in range(len(pdf)):
                k = arrs[0][i]
                if k != cur_key:
                    flush(buf, rows_out)
                    buf = []
                    cur_key = k
                buf.append(tuple(int(a[i]) if j else a[i]
                                 for j, a in enumerate(arrs)))
            if rows_out:
                yield pd.DataFrame(
                    rows_out, columns=[key, order, value_col, "state"]
                )
        tail = []
        flush(buf, tail)
        if tail:
            yield pd.DataFrame(
                tail, columns=[key, order, value_col, "state"]
            )

    sc = df.sparkSession.sparkContext
    return (
        df.repartition(sc.defaultParallelism, key)
        .sortWithinPartitions(key, order)
        .mapInPandas(run, schema=schema)
    )
