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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Default geometry: m bits, k hash rows.
BLOOM_M = 4096
BLOOM_K = 3

#: HyperLogLog geometry: 2^HLL_P registers from a 60-bit seeded hash.
HLL_P = 4
HLL_M = 1 << HLL_P  # 16 registers
HLL_HASH_BITS = 60  # 15 hex chars of md5 — exact in a BIGINT
HLL_W_BITS = HLL_HASH_BITS - HLL_P  # 56-bit rho window
#: rho cap so the scaled harmonic denominator stays an exact BIGINT:
#: Σ 2^(53-ρ) over ≤2^p registers needs 53-ρ ≥ 0 and the sum < 2^63.
HLL_RHO_CAP = 53
HLL_ALPHA_16 = 0.673  # standard bias constant for m=16 (Flajolet et al.)


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


def _hex15(col: Column) -> Column:
    """First 15 hex chars of md5 → 60-bit nonneg bigint (exact in both
    engines; the DuckDB oracle folds nibbles — no conv there)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_register_rho(key: Column) -> tuple[Column, Column]:
    """``(j, rho)`` for one key: register index = low ``HLL_P`` hash
    bits; rho = 1 + leading zeros of the remaining ``HLL_W_BITS``-bit
    window, capped at :data:`HLL_RHO_CAP`.

    Bit length comes from ``length(bin(w))`` — an exact integer-string
    fold both engines implement identically (no float ``log2`` whose
    rounding near powers of two could disagree cross-engine).
    """
    h = _hex15(key.cast("string"))
    j = F.pmod(h, F.lit(HLL_M))
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    return j, F.least(rho, F.lit(HLL_RHO_CAP))


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-group HLL register table ``(group..., j, rho)``.

    One grouped ``max`` — max is partial-aggregable, so the corpus
    combines map-side and the exchange carries ≤ ``groups × HLL_M``
    rows regardless of input size. Register tables MERGE by the same
    ``max(rho) GROUP BY j`` (sketch union = element-wise max), which is
    what makes the sketch shardable: build per shard / per day, merge
    without rescanning (the ALL row of ``sketch_hll_distinct`` is
    computed exactly this way).
    """
    group_cols = group_cols or []
    j, rho = hll_register_rho(F.col(key_col))
    return (
        df.select(*group_cols, j.alias("j"), rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Raw HLL estimate per group from a register table.

    The harmonic denominator Σ 2^-M_j (absent registers count as 2^0)
    is kept EXACT by scaling to ``2^53``: each register contributes the
    BIGINT ``1 << (53 - rho)``, absent registers ``1 << 53``, and the
    partial sums are merge-order-proof integers. The single float op is
    the final ``alpha·m² · 2^53 / S`` division — bit-identical in any
    IEEE engine. Small-range (linear-counting) correction is
    deliberately NOT applied: with m=16 it would engage only under ~40
    distinct keys, and the raw form keeps the estimate a pure function
    of the register table in both engines (no ``ln`` whose libm
    rounding may differ).

    Output: ``(group..., n_regs, denom_scaled, hll_distinct)``.
    """
    group_cols = group_cols or []
    scale = 1 << HLL_RHO_CAP
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_regs"),
        # shiftleft with a COLUMN shift amount needs call_function —
        # the python wrapper only takes a literal int
        F.sum(
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.lit(HLL_RHO_CAP) - F.col("rho")).cast("int"),
            )
        ).alias("s_present"),
    )
    denom = F.col("s_present") + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(scale)
    est = (
        F.lit(HLL_ALPHA_16)
        * F.lit(float(HLL_M * HLL_M))
        * F.lit(float(scale))
        / denom.cast("double")
    )
    return agg.select(
        *group_cols,
        F.col("n_regs"),
        denom.alias("denom_scaled"),
        (F.floor(est * 1_000_000.0) / 1_000_000.0).alias("hll_distinct"),
    )


#: KMV ("theta") sketch depth: the k smallest distinct hash values.
KMV_K = 64


def kmv_sketches(
    df: DataFrame, key_col: str, group_col: str, k: int = KMV_K
) -> DataFrame:
    """Per-group KMV / theta sketch (Beyer et al. 2007, "On Synopses
    for Distinct-Value Estimation"; the Apache DataSketches theta
    family): the ``k`` smallest DISTINCT 60-bit hashes of ``key_col``,
    one sorted-array row per group.

    Why KMV beside HLL: HLL registers union cheaply but can only
    estimate INTERSECTIONS via inclusion-exclusion (variance blows up
    for small overlaps); a KMV sketch carries actual hash samples, so
    set algebra (∩, ∖) works directly on the sketches — the sketch
    the "audience overlap" class of queries needs.

    Plan shape: one (group, hash) DISTINCT shuffle (map-side
    combinable), then a per-group top-k rank — never a collect of the
    key universe; per-group state is capped at k rows no matter how
    many distinct keys exist. Estimates derived downstream are pure
    functions of these arrays — engine-portable because the hash is
    the registry's md5 prefix.
    """
    h = _hex15(F.col(key_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        df.select(F.col(group_col), h.alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy(group_col)
        .agg(F.array_sort(F.collect_list("h")).alias("sk"))
    )
