"""Query registry: the driver-facing correctness surface.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with
an equivalent DuckDB-dialect oracle SQL string (or ``None`` for
genuinely non-SQL-expressible kernels, which the driver checks
rows-only).

Cross-engine determinism rules used throughout (see also
sources/catalog.py):

- interval arithmetic in integer microseconds (``unix_micros`` /
  ``epoch_us``) — exact in both engines;
- additive money aggregates computed on DECIMAL then cast to double and
  rounded — immune to float-sum ordering across shuffle partitions;
- per-row double math rounded to 6 places on output — IEEE ops are
  deterministic, rounding absorbs fold-order ulp drift;
- every computed column aliased identically in Spark and SQL (the
  driver's compare is by sorted column name);
- deterministic tie-breaks (an id column) on every top-k / argmax.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None):
    """Register a query; ``oracle`` is DuckDB SQL or None (rows-only)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
