"""Training-shard parquet sink: materialize the deterministic corpus
shuffle (queries/corpus_q.py `shuffle_shard_manifest`) as an on-disk
layout a training reader can stream in order.

Layout contract:

- one Hive partition directory per shard (``shard=K/``);
- within a shard, rows are in the seeded pseudo-random shuffle order
  (ascending ``md5('pos:' || id)``), and that order is recoverable
  from the files alone: the writer range-partitions by
  ``(shard, posk)`` so each task — hence each output file — covers a
  contiguous position range, and task ids (hence ``part-NNNNN`` file
  names) ascend with the range. Reading a shard's files in name order
  and concatenating yields the exact global shard order.

This is the 100 TB shape: no global sort ever happens — range
partitioning samples the key space and gives every executor a
contiguous slice to sort locally (Spark's ``repartitionByRange`` +
``sortWithinPartitions`` is exactly a distributed merge-sort whose
merge step is the file-name ordering, which the reader performs by
construction). Shard count and file count scale with the cluster, not
with corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default shard count (matches shuffle_shard_manifest).
N_SHARDS = 8


def shard_columns(df: DataFrame, id_col: str, n_shards: int = N_SHARDS) -> DataFrame:
    """Attach the deterministic ``shard`` and within-shard order key
    ``_posk`` (seeded md5 hashes of the stable id — identical to the
    manifest query's assignment)."""
    sid = F.col(id_col).cast("string")
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit("shard:"), sid)), 1, 7), 16, 10)
        .cast("long")
        % n_shards
    )
    return df.withColumn("shard", shard).withColumn(
        "_posk", F.md5(F.concat(F.lit("pos:"), sid))
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = N_SHARDS,
    files_per_shard: int = 1,
) -> None:
    """Write ``df`` as ordered training shards under ``path``.

    ``files_per_shard`` controls parallelism: total range partitions =
    ``n_shards * files_per_shard`` (at 100 TB you raise this to keep
    each sort task's slice in memory; the order contract is unchanged
    because ranges stay contiguous and file names stay ascending).
    """
    out = shard_columns(df, id_col, n_shards)
    (
        out.repartitionByRange(n_shards * files_per_shard, "shard", "_posk")
        .sortWithinPartitions("shard", "_posk", id_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def read_training_shard(spark, path: str, shard: int) -> DataFrame:
    """Read one shard with an explicit training-order key.

    Attaches ``file_idx`` (position of the source file in name order);
    ordering by ``(file_idx, _posk)`` reproduces the exact shard order
    regardless of how the scan splits or any downstream exchange —
    content-derived keys, no reliance on physical row order (the
    `monotonically_increasing_id` trap)."""
    import glob as _glob
    import os as _os

    files = sorted(
        _glob.glob(_os.path.join(path, f"shard={shard}", "part-*.parquet"))
    )
    df = None
    for i, f in enumerate(files):
        part = spark.read.parquet(f).withColumn("file_idx", F.lit(i))
        df = part if df is None else df.unionByName(part)
    return df
