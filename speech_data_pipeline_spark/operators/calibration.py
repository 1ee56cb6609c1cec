"""Isotonic (monotone) calibration via pool-adjacent-violators — the
standard way to turn a raw quality signal into a calibrated keep-rate:
fit the best non-decreasing step function to per-bucket hit rates
(weighted least squares), so downstream thresholds act on probabilities
instead of raw scores.

Exactness design: buckets carry INTEGER (hits, n) pairs, every pool
value is ``Σhits / Σn`` — one double division of exact int64 sums — and
violation checks cross-multiply integers instead of comparing floats.
The whole fit is therefore a rational-arithmetic computation with a
single final rounding, which is what lets the DuckDB oracle replay it
bit-for-bit through a completely different algorithm: the minimax
identity ``fit(i) = max_{j<=i} min_{k>=i} avg(j..k)`` (an O(b³) triple
join — exact because the achieving (j,k) are the fitted pool's own
boundaries, so both engines divide the same two integers).

Scale shape: the kernel runs per GROUP over the already-aggregated
bucket table (buckets/group is small and fixed — the corpus-sized work
is the one grouped aggregate that built the buckets), so this is an
``applyInPandas`` over a tiny frame per key, like M5's per-file
clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pava_fit(hits, ns) -> list[tuple[int, int]]:
    """Weighted PAVA over integer (hits, n) buckets, non-decreasing.

    Returns per input bucket the (pool_hits, pool_n) of its fitted
    pool; the fitted value is pool_hits/pool_n. Violation test is the
    exact integer cross-product ``prev.hits * cur.n > cur.hits *
    prev.n``.
    """
    pools: list[list[int]] = []  # [hits, n, width]
    for h, n in zip(hits, ns):
        pools.append([int(h), int(n), 1])
        while len(pools) > 1 and (
            pools[-2][0] * pools[-1][1] > pools[-1][0] * pools[-2][1]
        ):
            b = pools.pop()
            pools[-1][0] += b[0]
            pools[-1][1] += b[1]
            pools[-1][2] += b[2]
        # (zero-weight buckets cannot occur: the aggregate only emits
        # buckets with members, so n >= 1 and divisions are safe)
    out: list[tuple[int, int]] = []
    for h, n, w in pools:
        out.extend([(h, n)] * w)
    return out


def isotonic_calibrate(
    buckets: DataFrame,
    group_col: str = "source",
    x_col: str = "bucket",
    hits_col: str = "hits",
    n_col: str = "n",
) -> DataFrame:
    """Fit per-group isotonic hit rates over ``x_col``-ordered buckets.

    Input: one row per (group, bucket) with integer ``hits``/``n``.
    Output adds ``pool_hits``, ``pool_n``, ``fitted`` (double).
    """
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col).reset_index(drop=True)
        pools = pava_fit(pdf[hits_col].tolist(), pdf[n_col].tolist())
        pdf["pool_hits"] = [p[0] for p in pools]
        pdf["pool_n"] = [p[1] for p in pools]
        pdf["fitted"] = pdf["pool_hits"] / pdf["pool_n"]
        return pdf

    schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in buckets.schema.fields
        )
        + ", pool_hits long, pool_n long, fitted double"
    )
    return buckets.groupBy(group_col).applyInPandas(fit, schema=schema)
