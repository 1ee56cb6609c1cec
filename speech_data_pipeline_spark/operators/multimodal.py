"""Multimodal columns: opaque binary payloads + typed metadata.

Design (SURVEY.md §1.1 waveform row + known-hard #5): media lives in a
``binary`` column with sibling metadata columns; decode/feature steps
are Arrow-batched ``mapInPandas`` stages so bytes stream executor-side
in bounded batches and never concentrate on the driver. Long payloads
are chunked ``(media_id, chunk_idx, payload)`` at ingest — the W6
pattern — and reassembled ordered via ``collect_list(struct(...))``.

The container has no image/audio codecs, so the *decode* kernel is a
clearly-marked stub (``decode_media`` raises NotImplementedError; a
deterministic fake hides behind ``fake=True``); the Spark-side plumbing
— schema, batch iteration, chunking, reassembly — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "media_id long, byte_len long, sha256 string, "
    "fake_width long, fake_height long"
)


def attach_binary(df: DataFrame, src_col: str, id_col: str = "doc_id") -> DataFrame:
    """Stand-in ingest: utf-8 encode a text column into a binary payload.

    Real corpora read ``spark.read.format('binaryFile')`` (reference
    get_audio_paths scan, modules/models/utils.py:11-16) — same
    resulting schema: ``(media_id, payload binary)``.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(src_col), "UTF-8").alias("payload"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Emits deterministic byte-level features (length, sha256 hex, fake
    decoded dimensions derived from length) — the real-model slot for
    image decode / audio fingerprint / frame sampling. mapInPandas
    keeps the payload batched executor-side; output drops the payload
    so only features shuffle.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(len),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "fake_width": payloads.map(lambda b: 64 + len(b) % 577),
                    "fake_height": payloads.map(lambda b: 64 + (len(b) * 31) % 577),
                }
            )

    return df.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def chunk_payload(df: DataFrame, chunk_bytes: int = 1 << 20) -> DataFrame:
    """Split payloads into bounded chunks (W6 pattern): long media must
    be chunked at ingest to stay under Arrow/row limits (a 3-hour
    44.1 kHz stereo file is ~1.9 GB — over the 2 GB row ceiling)."""
    n_chunks = F.greatest(
        F.ceil(F.length("payload") / F.lit(chunk_bytes)).cast("long"), F.lit(1).cast("long")
    )
    return (
        df.withColumn("_n", n_chunks)
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n") - 1)))
        .select(
            "media_id",
            "chunk_idx",
            F.expr(f"substring(payload, chunk_idx * {chunk_bytes} + 1, {chunk_bytes})").alias(
                "chunk"
            ),
        )
    )


def reassemble_payload(chunks: DataFrame) -> DataFrame:
    """Ordered chunk reassembly: collect_list(struct) + array_sort + concat."""
    return (
        chunks.groupBy("media_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("chunk_idx", "chunk"))
            ).alias("parts")
        )
        .select(
            "media_id",
            F.aggregate(
                F.col("parts"),
                F.lit(b""),
                lambda acc, p: F.concat(acc, p["chunk"]),
            ).alias("payload"),
        )
    )


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary media to waveform/pixels.

    STUB: the container ships no codecs (librosa/PIL/ffmpeg absent).
    With ``fake=True`` a deterministic pseudo-decode (bytes → floats in
    [-1, 1)) exercises the full plumbing; otherwise this raises to make
    the missing-backend contract explicit.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires a codec backend (librosa/PIL/ffmpeg); "
            "not available in this environment - use fake=True for the "
            "deterministic test decoder"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "samples": pdf["payload"].map(
                        lambda b: [((x / 255.0) * 2 - 1) for x in bytes(b)[:256]]
                    ),
                    "sr": 16_000,
                }
            )

    return df.mapInPandas(kernel, schema="media_id long, samples array<double>, sr int")
