"""Deterministic Bloom-filter membership (build + probe as DataFrames).

A Bloom filter is the standard pre-join existence sketch at data-lake
scale: build a bit set over the small(er) side's keys, broadcast it,
and prune the huge side map-side before any shuffle. Spark's own
runtime row-group filtering uses the same idea; this operator exposes
it as an explicit, *engine-portable* primitive — the k bit positions
are seeded md5 hashes (``hex7(md5("i:key")) % m``), so the exact same
filter (and the exact same false-positive set) is reproducible in any
engine, which is what makes it oracle-checkable (the DuckDB oracle of
``sketch_bloom_membership`` recomputes the position set relationally;
the confusion matrix matches bit for bit).

Properties (tested in tests/test_corpus_ops.py): no false negatives,
ever; false-positive rate ≈ (1 - e^{-kn/m})^k.

100 TB shape: the built filter is a single row holding a DENSE bitmap
— ``ceil(m/64)`` longs — broadcast to every task; probing is k O(1)
``element_at`` + shift bit tests per row, zero shuffle. (A first cut
kept a sorted array of set positions and probed with
``array_contains`` — an O(m) scan per hash per row. At sf0.1 the two
are within noise because fixed per-stage latency dominates, but the
bitmap is the only form whose probe cost is independent of m and of
fill, which is what matters when m grows with the build side.)
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


def bloom_build(
    df: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Build the filter: one row, one dense ``ceil(m/64)``-long bitmap
    (column ``bits``). One explode + one tiny grouped ``bit_or`` +
    one single-row densify — O(m) state regardless of key count;
    merging shard filters is element-wise OR."""
    n_words = (m + 63) // 64
    words = (
        df.select(F.explode(bloom_positions(F.col(key_col), m, k)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            F.pmod(F.col("pos"), F.lit(64)).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(cast(1 as bigint), b))").alias("word"))
    )
    return words.agg(
        F.expr(
            f"""transform(sequence(0, {n_words - 1}),
                 i -> coalesce(
                   map_from_entries(collect_list(struct(w, word)))[cast(i as bigint)],
                   cast(0 as bigint)))"""
        ).alias("bits")
    )


def bloom_probe(
    probe: DataFrame,
    bits: DataFrame,
    key_col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Probe: attach the broadcast one-row bitmap, test all k positions
    with O(1) word lookups. Adds boolean ``bloom_member``."""
    pos = bloom_positions(F.col(key_col), m, k)

    def bit_set(p: Column) -> Column:
        word = F.element_at(F.col("bits"), (p / 64).cast("int") + 1)
        # shiftright with a COLUMN shift amount needs call_function —
        # the python wrapper only takes a literal int
        return (
            F.call_function(
                "shiftright", word, F.pmod(p, F.lit(64)).cast("int")
            ).bitwiseAND(F.lit(1))
            == 1
        )

    test = F.aggregate(pos, F.lit(True), lambda acc, p: acc & bit_set(p))
    return (
        probe.crossJoin(F.broadcast(bits))
        .withColumn("bloom_member", test)
        .drop("bits")
    )
