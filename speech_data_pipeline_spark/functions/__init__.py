"""Scalar/array column helpers shared across operators and queries.

Cross-engine float policy (load-bearing for the DuckDB oracle gate):

- ``trunc6`` — NEVER use ``F.round`` on a double that an oracle will
  recompute. Spark's round re-reads the double's shortest decimal
  string (BigDecimal.valueOf) and rounds that HALF_UP; DuckDB rounds
  the scaled binary value. On near-tie values (e.g. 0.0640625 from a
  small-integer ratio) they disagree by 1 ulp of the last digit.
  ``floor(x * 1e6) / 1e6`` is pure double arithmetic — bit-identical
  everywhere.
- DECIMAL aggregates may be rounded with ``F.round`` *while still
  decimal* (exact, HALF_UP in Spark == half-away in DuckDB for all
  signs), then cast to double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def trunc6(c: Column) -> Column:
    """Truncate a double to 6 decimal places, cross-engine-stable."""
    return F.floor(c * F.lit(1_000_000.0)) / F.lit(1_000_000.0)


def trunc6_sql(expr: str) -> str:
    """DuckDB-dialect equivalent of :func:`trunc6`."""
    return f"floor(({expr}) * 1000000.0) / 1000000.0"
