"""WARC ingestion tests: record framing (plain + gzip-per-member, the
Common Crawl layout), HTTP response splitting, filtering, and the
Spark path down to the documents shape with JVM-side text extraction."""

import gzip

import pytest

from speech_data_pipeline_spark.sources.warc import (
    iter_response_rows,
    iter_warc_records,
    parse_http_response,
    read_warc,
    warc_to_documents,
)


def _warc_record(warc_type, uri, body: bytes, rec_id="<urn:uuid:1>"):
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-08-15T00:00:00Z\r\n"
        f"WARC-Record-ID: {rec_id}\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def _http_response(html: str, status=200, ctype="text/html; charset=utf-8"):
    payload = html.encode()
    return (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode() + payload


def _sample_archive(gzipped: bool) -> bytes:
    recs = [
        _warc_record("warcinfo", "", b"software: test\r\n"),
        _warc_record(
            "response",
            "http://example.com/a",
            _http_response("<html><body><p>Alpha &amp; beta</p></body></html>"),
            rec_id="<urn:uuid:a>",
        ),
        _warc_record(
            "request", "http://example.com/a", b"GET /a HTTP/1.1\r\n\r\n"
        ),
        _warc_record(
            "response",
            "http://example.com/404",
            _http_response("<html>gone</html>", status=404),
            rec_id="<urn:uuid:404>",
        ),
        _warc_record(
            "response",
            "http://example.com/img",
            _http_response("notreallyapng", ctype="image/png"),
            rec_id="<urn:uuid:img>",
        ),
        _warc_record(
            "response",
            "http://example.com/b",
            _http_response(
                "<html><head><script>var x=1;</script></head>"
                "<body>Bravo <b>bold</b> text</body></html>"
            ),
            rec_id="<urn:uuid:b>",
        ),
    ]
    if gzipped:
        # Common Crawl layout: each record its own gzip member.
        return b"".join(gzip.compress(r) for r in recs)
    return b"".join(recs)


def test_record_framing_plain():
    recs = list(iter_warc_records(_sample_archive(gzipped=False)))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "request", "response", "response", "response",
    ]
    assert recs[1]["target_uri"] == "http://example.com/a"


def test_http_response_split():
    status, ctype, payload = parse_http_response(
        _http_response("<p>hi</p>", status=301, ctype="text/html")
    )
    assert (status, ctype) == (301, "text/html")
    assert payload == b"<p>hi</p>"


@pytest.mark.parametrize("gzipped", [False, True])
def test_response_rows_filtering(gzipped):
    rows = list(
        iter_response_rows(_sample_archive(gzipped), "file:/x.warc.gz")
    )
    # warcinfo/request skipped, 404 and image/png filtered out.
    assert [r["target_uri"] for r in rows] == [
        "http://example.com/a", "http://example.com/b",
    ]
    assert all(r["http_status"] == 200 for r in rows)
    assert "Alpha &amp; beta" in rows[0]["html"]


def test_bad_framing_raises():
    with pytest.raises(ValueError, match="framing"):
        list(iter_warc_records(b"NOTWARC/1.0\r\n\r\nbody"))


def test_read_warc_to_documents(spark, tmp_path):
    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(_sample_archive(gzipped=True))
    df = read_warc(spark, str(p))
    rows = {r["target_uri"]: r for r in df.collect()}
    assert set(rows) == {"http://example.com/a", "http://example.com/b"}
    docs = {r["source"]: r for r in warc_to_documents(df).collect()}
    assert docs["http://example.com/a"]["text"] == "Alpha & beta"
    assert docs["http://example.com/b"]["text"] == "Bravo bold text"
    assert all(d["doc_id"] >= 0 for d in docs.values())
    # Stable ids: re-reading yields the same doc_ids.
    again = {
        r["source"]: r["doc_id"]
        for r in warc_to_documents(read_warc(spark, str(p))).collect()
    }
    assert {s: d["doc_id"] for s, d in docs.items()} == again


def _many_response_archive(n: int, gzipped=True) -> bytes:
    recs = [
        _warc_record(
            "response",
            f"http://example.com/p{i}",
            _http_response(f"<html><body>doc {i}</body></html>"),
            rec_id=f"<urn:uuid:p{i}>",
        )
        for i in range(n)
    ]
    if gzipped:
        return b"".join(gzip.compress(r) for r in recs)
    return b"".join(recs)


def test_kernel_emits_bounded_batches(tmp_path):
    """One archive must stream out as multiple bounded pandas frames —
    never one frame per archive (the executor-memory cliff for a ~1 GB
    CC archive whose HTML decompresses to several GB). Drives the real
    mapInPandas kernel (record_batches) directly."""
    import pandas as pd

    from speech_data_pipeline_spark.sources.warc import _COLUMNS, record_batches

    payload = _many_response_archive(25)
    src = pd.DataFrame({"content": [payload], "path": ["file:/big.warc.gz"]})
    frames = list(record_batches(iter([src]), batch_records=10))
    assert [len(f) for f in frames] == [10, 10, 5]
    assert list(frames[0].columns) == _COLUMNS
    uris = [u for f in frames for u in f["target_uri"]]
    assert uris == [f"http://example.com/p{i}" for i in range(25)]


def test_read_warc_bounded_batches_end_to_end(spark, tmp_path):
    """End-to-end through Spark with batch_records=7: all 25 records
    survive the multi-batch emission, no dupes, no drops."""
    p = tmp_path / "big.warc.gz"
    p.write_bytes(_many_response_archive(25))
    df = read_warc(spark, str(p), batch_records=7)
    uris = sorted(r["target_uri"] for r in df.collect())
    assert uris == sorted(f"http://example.com/p{i}" for i in range(25))
