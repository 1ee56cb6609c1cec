"""Deterministic Bloom-filter membership (build + probe as DataFrames).

A Bloom filter is the standard pre-join existence sketch at data-lake
scale: build a bit set over the small(er) side's keys, broadcast it,
and prune the huge side map-side before any shuffle. Spark's own
runtime row-group filtering uses the same idea; this operator exposes
it as an explicit, *engine-portable* primitive — the k bit positions
are seeded md5 hashes (``hex7(md5("i:key")) % m``), so the exact same
filter (and the exact same false-positive set) is reproducible in any
engine, which is what makes it oracle-checkable.

Properties (tested in tests/test_corpus_ops.py): no false negatives,
ever; false-positive rate ≈ (1 - e^{-kn/m})^k.

100 TB shape: the built filter is a single row holding a sorted int
array of set positions (≤ m entries, m is a constant) — broadcast to
every task; probing is in-row ``array_contains`` × k, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default geometry: m bits, k hash rows.
BLOOM_M = 4096
BLOOM_K = 3


def _hex7(col: Column) -> Column:
    """First 7 hex chars of md5 → bigint (28 bits, exact in both
    engines; same fold as queries/text_q.py `_hex7_to_int_sql`)."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def bloom_positions(key: Column, m: int = BLOOM_M, k: int = BLOOM_K) -> Column:
    """The k bit positions of ``key`` as array<bigint>."""
    return F.array(
        *[
            _hex7(F.concat(F.lit(f"{i}:"), key.cast("string"))) % m
            for i in range(k)
        ]
    )


def bloom_build(df: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Build the filter: one row, one sorted array of distinct set bit
    positions. ``flatten`` + ``collect_set`` over an exploded position
    stream — a single aggregate producing O(m) state."""
    return (
        df.select(
            F.explode(bloom_positions(F.col(key_col), m, k)).alias("pos")
        )
        .agg(F.array_sort(F.collect_set("pos")).alias("bits"))
    )


def bloom_probe(
    probe: DataFrame,
    bits: DataFrame,
    key_col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Probe: attach the broadcast one-row bit set, test all k positions
    in-row. Adds boolean ``bloom_member``."""
    pos = bloom_positions(F.col(key_col), m, k)
    test = F.aggregate(
        pos,
        F.lit(True),
        lambda acc, p: acc & F.array_contains(F.col("bits"), p),
    )
    return (
        probe.crossJoin(F.broadcast(bits))
        .withColumn("bloom_member", test)
        .drop("bits")
    )
