"""Audio corpus sources (SURVEY.md §2.1 S1/S6/S9/S10).

The reference scans a folder for six audio extensions and keys
everything by the file's basename (modules/models/utils.py:11-22).
Spark-first equivalent: a ``binaryFile`` scan with a glob pushdown —
file listing and reads are distributed, and the payload column is only
materialized for rows that survive pushed filters.

At 100 TB the corpus is millions of objects on S3/GCS: ``binaryFile``
parallelizes listing; pair it with ``spark.sql.files.maxPartitionBytes``
and the multimodal chunker (operators/multimodal.py) so no single row
exceeds Arrow limits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AUDIO_EXTENSIONS = ("mp3", "wav", "flac", "aac", "ogg", "m4a")


def audio_id_from_path(path: F.Column) -> F.Column:
    """X1: basename sans audio extension, case-insensitive."""
    base = F.element_at(F.split(path, "/"), -1)
    return F.regexp_replace(
        base, r"(?i)\.(" + "|".join(AUDIO_EXTENSIONS) + r")$", ""
    )


def scan_audio_dir(
    spark: SparkSession, directory: str, recursive: bool = False
) -> DataFrame:
    """S1: distributed audio-directory scan.

    Returns ``(audio_id, path, length, modificationTime, content)``.
    The glob filter prunes at the listing, before any bytes move. The
    glob carries upper/lower variants because Hadoop globs are
    case-sensitive while the reference's extension test is not (X17,
    utils.py:20). Note: binaryFile silently drops 0-byte files — the
    reference's empty-file guard (F8) for free.
    """
    exts = [e for x in AUDIO_EXTENSIONS for e in (x, x.upper())]
    reader = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{" + ",".join(exts) + "}")
    )
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(directory)
    return df.select(
        audio_id_from_path(F.col("path")).alias("audio_id"),
        "path",
        "length",
        "modificationTime",
        "content",
    )


def probe_durations(df: DataFrame, default_sr: int = 16_000) -> DataFrame:
    """S6: duration probe; 0.0 on failure (reference
    modules/vad_multi.py:12-16 returns 0 for broken files).

    REAL header-level parsing for wav/flac/mp3/ogg-vorbis/opus/m4a
    (operators/mediainfo.py — frame-header walks, Xing/VBRI, granule
    positions, mvhd; no codec libraries, like librosa's own
    ``get_duration`` path this mirrors). Files no parser recognizes
    fall back to the previous byte-length estimate
    (``bytes / (sr·2)``, the 16-bit-mono approximation), and empty
    payloads stay 0.0. Arrow-batched pandas UDF — a map-only metadata
    pass at any corpus size.
    """
    from speech_data_pipeline_spark.operators.mediainfo import (
        probe_media_bytes,
    )

    @F.pandas_udf("double")
    def _dur(content: pd.Series, length: pd.Series) -> pd.Series:
        out = []
        for b, ln in zip(content, length):
            info = None
            if b is not None and len(b) >= 12:
                try:
                    info = probe_media_bytes(bytes(b))
                except Exception:  # noqa: BLE001 — malformed headers
                    info = None
            if info is not None and info.get("duration") is not None:
                out.append(float(info["duration"]))
            elif ln is not None and ln > 0:
                out.append(float(ln) / (default_sr * 2.0))
            else:
                out.append(0.0)
        return pd.Series(out)

    return df.withColumn("duration", _dur(F.col("content"), F.col("length")))


def scan_reference_voiceprints(spark: SparkSession, directory: str) -> DataFrame:
    """S9: host voiceprint scan — ``host_id`` = wav basename."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(directory)
    )
    return df.select(
        audio_id_from_path(F.col("path")).alias("host_id"), "path", "content"
    )


def resolve_transcript_sidecars(
    audio: DataFrame, sidecars: DataFrame
) -> DataFrame:
    """S10: transcript sidecar preference join (reference
    modules/models/alignment.py:37-44): prefer
    ``{base}.en-orig_processed.txt`` over ``{base}.en_processed.txt``,
    drop files with neither. Two left joins + ``coalesce`` — no UDF,
    broadcastable sidecar index.

    ``sidecars``: ``(audio_id, kind, text)`` with kind in
    {'en-orig', 'en'}.
    """
    orig = sidecars.where(F.col("kind") == "en-orig").select(
        "audio_id", F.col("text").alias("_orig")
    )
    plain = sidecars.where(F.col("kind") == "en").select(
        "audio_id", F.col("text").alias("_plain")
    )
    return (
        audio.join(orig, "audio_id", "left")
        .join(plain, "audio_id", "left")
        .withColumn("transcript", F.coalesce("_orig", "_plain"))
        .where(F.col("transcript").isNotNull())
        .drop("_orig", "_plain")
    )


def longest_first_hint(df: DataFrame, duration_col: str = "duration") -> DataFrame:
    """W10: the reference sorts files longest-first so stragglers start
    early (modules/vad_multi.py:79-97). Spark's task scheduler makes
    the sort unnecessary; the surviving useful form is a range
    repartition by descending duration, which groups similarly-sized
    files so AQE sees balanced partitions."""
    return df.repartitionByRange(F.col(duration_col).desc())
