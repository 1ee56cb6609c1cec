"""WARC (Web ARChive) ingestion: Common-Crawl-style web corpora →
the ``documents`` data model.

The canonical 100 TB training-data job starts from WARC: ~1 GB archive
files, each a sequence of records, each response record carrying one
HTTP exchange with the raw HTML body. The Common Crawl convention
gzips each record as its OWN gzip member and concatenates the members,
so a reader can split work at member boundaries; this reader handles
that layout (stdlib zlib, member-by-member via ``unused_data``) and
plain uncompressed WARC.

Spark shape: ``spark.read.format("binaryFile")`` → one task per
archive file (the natural Common-Crawl unit of parallelism — the fleet
processes N files as N independent map tasks, no shuffle) → an
Arrow-batched ``mapInPandas`` kernel explodes each archive into
response-record rows → the HTML→text step is NOT done in Python: the
raw ``html`` column goes back to the JVM and
``operators/text.html_to_text`` (a pure regexp chain) extracts visible
text inside whole-stage codegen. Python touches each byte once to
locate record boundaries; the string-heavy work stays JVM-side.

Parity note: the reference pipeline has no web-ingest surface — this
is part of the beyond-reference training-data stack (brief §"large-
scale training-data pipeline"), same family as the dedup/quality
operators that consume its output.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _gzip_members(payload: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one member at a
    time (the CC record-per-member layout)."""
    rest = payload
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(rest)
        if not d.eof:
            raise ValueError("truncated gzip member in WARC archive")
        yield out
        rest = d.unused_data


def _parse_headers(block: bytes) -> dict:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version/status line
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
    return headers


def iter_warc_records(chunk: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record in an uncompressed byte chunk
    (``warc_type``, ``target_uri``, ``warc_date``, ``record_id``,
    ``body`` bytes)."""
    pos = 0
    n = len(chunk)
    while pos < n:
        # Skip inter-record CRLF padding.
        while pos < n and chunk[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        hdr_end = chunk.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        head = chunk[pos:hdr_end]
        if not head.startswith(b"WARC/"):
            raise ValueError(f"lost WARC record framing at byte {pos}")
        h = _parse_headers(head)
        length = int(h.get("content-length", "0"))
        body_start = hdr_end + 4
        body = chunk[body_start : body_start + length]
        yield {
            "warc_type": h.get("warc-type", ""),
            "target_uri": h.get("warc-target-uri", ""),
            "warc_date": h.get("warc-date", ""),
            "record_id": h.get("warc-record-id", ""),
            "body": body,
        }
        pos = body_start + length


def parse_http_response(body: bytes) -> tuple[int, str, bytes]:
    """Split an HTTP response record body into (status, content_type,
    payload bytes)."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        return 0, "", body
    head = body[:sep]
    status_line = head.split(b"\r\n", 1)[0].split()
    status = int(status_line[1]) if len(status_line) > 1 else 0
    h = _parse_headers(head)
    ctype = h.get("content-type", "").split(";")[0].strip()
    return status, ctype, body[sep + 4 :]


def iter_response_rows(payload: bytes, path: str) -> Iterator[dict]:
    """All successful text/html response records of one WARC archive
    (gzip-multistream or plain) as flat dict rows."""
    if payload[:2] == b"\x1f\x8b":
        chunks: Iterator[bytes] = _gzip_members(payload)
    else:
        chunks = iter([payload])
    for chunk in chunks:
        for rec in iter_warc_records(chunk):
            if rec["warc_type"] != "response":
                continue
            status, ctype, html_bytes = parse_http_response(rec["body"])
            if status != 200 or (ctype and ctype != "text/html"):
                continue
            yield {
                "warc_file": path,
                "record_id": rec["record_id"],
                "target_uri": rec["target_uri"],
                "warc_date": rec["warc_date"],
                "http_status": status,
                "content_type": ctype or "text/html",
                "html": html_bytes.decode("utf-8", errors="replace"),
            }


_SCHEMA = (
    "warc_file string, record_id string, target_uri string, "
    "warc_date string, http_status int, content_type string, html string"
)


#: Records per emitted Arrow batch in read_warc's kernel. A CC archive
#: (~1 GB gzip → 3-5 GB HTML) must never materialize as ONE pandas
#: frame / Arrow batch on an executor core; bounding the batch at ~1k
#: records (~tens of MB of HTML) caps kernel-resident memory at
#: batch-size × mean-record, independent of archive size.
WARC_BATCH_RECORDS = 1024

_COLUMNS = [
    "warc_file", "record_id", "target_uri", "warc_date",
    "http_status", "content_type", "html",
]


def record_batches(
    batches: Iterator[pd.DataFrame], batch_records: int = WARC_BATCH_RECORDS
) -> Iterator[pd.DataFrame]:
    """The mapInPandas kernel behind :func:`read_warc`, module-level so
    tests can drive its chunking contract directly: explode
    (content, path) archive rows into response-record frames of at most
    ``batch_records`` rows each."""
    rows: list[dict] = []
    for pdf in batches:
        for payload, p in zip(pdf["content"], pdf["path"]):
            for row in iter_response_rows(bytes(payload), p):
                rows.append(row)
                if len(rows) >= batch_records:
                    yield pd.DataFrame(rows, columns=_COLUMNS)
                    rows = []
    yield pd.DataFrame(rows, columns=_COLUMNS)


def read_warc(
    spark: SparkSession, path: str, batch_records: int = WARC_BATCH_RECORDS
) -> DataFrame:
    """Load WARC archive(s) at ``path`` (file/dir/glob) into one row
    per 200-OK text/html response record. Records stream out of the
    kernel in ≤``batch_records``-row pandas frames so an archive's
    decompressed HTML is never resident all at once (the gzip members
    already decompress one record at a time)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from record_batches(batches, batch_records)

    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(kernel, schema=_SCHEMA)
    )


def warc_to_documents(warc_df: DataFrame) -> DataFrame:
    """WARC response rows → the ``documents`` shape: extract visible
    text JVM-side (html_to_text regexp chain — the Python kernel never
    touches the string-heavy work), derive a stable 63-bit ``doc_id``
    from the record id, keep the source URI."""
    from speech_data_pipeline_spark.operators.text import html_to_text

    return warc_df.select(
        F.abs(F.xxhash64("record_id")).alias("doc_id"),
        F.col("target_uri").alias("source"),
        html_to_text(F.col("html")).alias("text"),
        F.col("warc_date").alias("fetched_at"),
    ).where(F.length("text") > 0)
