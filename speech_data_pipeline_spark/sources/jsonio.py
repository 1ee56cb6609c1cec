"""JSON segment-table IO — the reference's inter-stage IR, kept as an
interchange option beside the parquet default.

The reference exchanges pretty-printed JSON per (file, stage) under
``{audio}_outputs/{stage}/`` (write_json, modules/models/utils.py:202-204;
layout :190-195; read, load_json :197-200 = S7/K1/K6). The engine's
canonical stage tables are parquet (columnar, predicate pushdown), but a
user migrating from the reference needs to (a) export any stage table
back to per-key JSON and (b) ingest the reference's existing JSON
outputs as a stage table. Both directions here:

- ``write_stage_json`` — one JSON directory per ``audio_id`` via
  ``partitionBy`` (the Spark-native form of the per-file layout; each
  partition directory holds that file's rows, readable by any JSON
  tool).
- ``read_stage_json`` — schema-enforced JSON read (S7's
  ``spark.read.schema(stage_schema).json`` mapping in SURVEY §2.1);
  never schema-inferred, so types survive the round trip and malformed
  rows surface in ``_corrupt_record`` instead of silently coercing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_stage_json(df: DataFrame, path: str, key: str = "audio_id") -> None:
    """Export a stage table as per-key JSON directories (K1/K6 parity)."""
    df.write.mode("overwrite").partitionBy(key).json(path)


def read_stage_json(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Schema-enforced JSON stage-table read (S7 parity).

    ``schema`` must include the partition key column; partition-directory
    values are recovered by Spark's partition discovery.
    """
    return spark.read.schema(schema).json(path)
