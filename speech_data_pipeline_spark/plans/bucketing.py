"""Bucketed tables for co-located, exchange-free joins.

At 100 TB, fact⋈fact joins (lineitem⋈orders-scale) pay a full shuffle
of both sides every query. Bucketing pre-shuffles ONCE at write time:
both tables hash-bucketed on the join key into the same bucket count
join with zero exchanges afterwards — the engine's standing answer to
"is there a shuffle here that becomes the bottleneck at scale?".

Spark needs a saveAsTable catalog entry for bucket metadata (plain
parquet paths don't carry it), so these helpers wrap the table API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) on ``key``.

    Sorting within buckets additionally enables exchange-AND-sort-free
    sort-merge joins.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    With matching bucket specs Catalyst plans a SortMergeJoin whose
    children read bucketed files directly — no Exchange on either side
    (verify with ``.explain``; tests assert it).
    """
    return spark.table(left_table).join(spark.table(right_table), key)
