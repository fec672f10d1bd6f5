"""WARC source: framing round-trips, gzip membering, error containment,
and the Spark operator end-to-end."""

import gzip
import io

import pytest

from fast_pdf_parser_spark.sources.warc import (
    WarcError,
    build_warc,
    deterministic_record_id,
    http_response,
    parse_warc,
    warc_response_docs,
)


def _recs(n=3, html=lambda i: f"<html><body><p>doc {i}</p></body></html>"):
    return [
        {"url": f"https://x.example/{i}",
         "record_id": deterministic_record_id(str(i)),
         "html": html(i)}
        for i in range(n)
    ]


def test_build_parse_roundtrip():
    data = build_warc(_recs())
    out = list(parse_warc(data))
    assert [r["url"] for r in out] == [f"https://x.example/{i}"
                                       for i in range(3)]
    for i, r in enumerate(out):
        assert r["type"] == "response"
        status, headers, body = http_response(r["payload"])
        assert status == 200
        assert headers["content-type"] == "text/html; charset=utf-8"
        assert body.decode() == f"<html><body><p>doc {i}</p></body></html>"
        assert int(headers["content-length"]) == len(body)


def test_gzip_members_roundtrip():
    plain = build_warc(_recs())
    gz = build_warc(_recs(), compress=True)
    assert gz[:2] == b"\x1f\x8b" and gz != plain
    assert [r["url"] for r in parse_warc(gz)] == \
        [r["url"] for r in parse_warc(plain)]


def test_payload_may_contain_warc_magic():
    """Framing must be Content-Length arithmetic, never marker scanning:
    a body containing the literal bytes 'WARC/1.0\\r\\n' must not split
    the record."""
    tricky = "ok WARC/1.0\r\nWARC-Type: response\r\n\r\n inside body"
    data = build_warc(_recs(2, html=lambda i: tricky))
    out = list(parse_warc(data))
    assert len(out) == 2
    for r in out:
        _, _, body = http_response(r["payload"])
        assert body.decode() == tricky


def test_truncated_tail_contained_per_file():
    data = build_warc(_recs(3))
    cut = data[: len(data) - 40]  # truncate inside the last record
    rows = list(warc_response_docs("f.warc", cut))
    ok = [r for r in rows if r[8] is None]
    errs = [r for r in rows if r[8] is not None]
    assert len(ok) == 2  # records before the corruption survive
    assert len(errs) == 1 and errs[0][8].startswith("file:")


def test_non_response_records_skipped():
    data = build_warc(_recs(1))
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
    rows = list(warc_response_docs("f", info + data))
    assert len(rows) == 1 and rows[0][3] == "https://x.example/0"


def test_boilerplate_stripped_from_record():
    from fast_pdf_parser_spark.sources.synth import HTML_PREFIX, HTML_SUFFIX

    html = f"{HTML_PREFIX}<p>real content words</p>{HTML_SUFFIX}"
    rows = list(warc_response_docs(
        "f", build_warc([{"url": "u", "record_id": "<urn:x>",
                          "html": html}])))
    assert rows[0][7] == "real content words"
    assert rows[0][6] == len(html.encode())


def test_spark_operator_e2e(spark):
    import pandas as pd

    from fast_pdf_parser_spark.sources.warc import read_warc_documents

    files = pd.DataFrame({
        "path": ["a.warc", "b.warc.gz"],
        "content": [build_warc(_recs(2)), build_warc(_recs(3), True)],
    })
    out = read_warc_documents(spark.createDataFrame(files)).collect()
    assert len(out) == 5
    assert {r.warc_name for r in out} == {"a.warc", "b.warc.gz"}
    assert all(r.http_status == 200 and r.error is None for r in out)
    assert sorted({r.record_seq for r in out if r.warc_name == "b.warc.gz"}) \
        == [0, 1, 2]
