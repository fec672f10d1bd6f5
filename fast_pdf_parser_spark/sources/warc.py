"""WARC container source — the ingestion format of web-scale text corpora.

Common Crawl and most crawl pipelines deliver documents as WARC/1.0 files:
a concatenation of records, each a header block (CRLF lines, terminated by
a blank line) followed by exactly ``Content-Length`` payload bytes and a
``CRLF CRLF`` trailer. Response records carry a full HTTP response
(status line + headers + body) as their payload. This module provides:

- ``build_warc``: a deterministic writer (test fixtures and the driver's
  synthetic corpus — the analogue of sources/pdf_builder for the WARC axis);
- ``parse_warc`` / ``http_response``: a strict framing walk — records are
  located ONLY by Content-Length arithmetic, never by scanning payload
  bytes for markers (payloads legally contain anything, including the
  bytes ``WARC/1.0``);
- transparent per-record gzip (``.warc.gz``): Common Crawl gzips each
  record as its own member, so a multi-member gunzip restores the exact
  concatenated stream;
- ``read_warc_documents``: the Spark operator — one input row per WARC
  file (``binary`` column), ``mapInPandas`` out to one row per response
  record with the extracted main content. Zero shuffle: records of a file
  are parsed where the file's bytes land, and the boilerplate strip
  (sources/html_extractor) runs in the same Arrow batch.

Scale notes (100 TB of WARC):
- a WARC FILE is the unit of parallelism (Common Crawl files are ~1 GB);
  ``spark.sql.files.maxPartitionBytes`` has no effect on binary columns,
  so ingest lists files into rows first (``spark.read.format("binaryFile")``)
  and lets the scan distribute them — same shape this operator consumes;
- per-record error containment: a malformed record poisons only its FILE
  TAIL (framing past a bad Content-Length is unrecoverable by design);
  parsed records before it are kept and the error is surfaced as a row,
  never an exception — a 10^9-file crawl always has corrupt members.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame

WARC_DDL = (
    "warc_name string, record_seq int, record_id string, url string, "
    "http_status int, content_type string, n_body_bytes bigint, "
    "main_text string, error string"
)


class WarcError(ValueError):
    pass


def build_warc(records: list[dict], compress: bool = False) -> bytes:
    """records: [{url, record_id, html, date?}] → WARC/1.0 bytes.

    Each record is a ``response`` wrapping an HTTP/1.1 200 response whose
    body is the html encoded utf-8. With ``compress``, each record is its
    own gzip member (the Common Crawl layout)."""
    out = []
    for r in records:
        body = r["html"].encode("utf-8")
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: " + str(len(body)).encode("ascii")
            + b"\r\n\r\n" + body
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: " + r["record_id"].encode("ascii") + b"\r\n"
            b"WARC-Date: " + r.get("date", "2026-01-01T00:00:00Z")
            .encode("ascii") + b"\r\n"
            b"WARC-Target-URI: " + r["url"].encode("ascii") + b"\r\n"
            b"Content-Type: application/http;msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode("ascii")
            + b"\r\n\r\n" + http + b"\r\n\r\n"
        )
        if compress:
            buf = io.BytesIO()
            # compresslevel=1: this writer exists to FRAME records (the
            # reader's gzip-member walk is what is under test/measure);
            # level 9 spent ~5x the CPU of level 1 per member for bytes
            # nobody stores, and the decompressed stream — all any
            # consumer sees — is identical at every level
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0,
                               compresslevel=1) as gz:
                gz.write(rec)
            rec = buf.getvalue()
        out.append(rec)
    return b"".join(out)


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members → concatenated plain bytes.

    A Common Crawl file is tens of thousands of members; stdlib
    ``gzip.decompress`` walks all members in ONE C-level pass — a manual
    per-member decompressobj loop is quadratic (each member's
    ``unused_data`` materializes an O(file-size) tail copy)."""
    try:
        return gzip.decompress(data)
    except (EOFError, gzip.BadGzipFile, OSError) as exc:
        raise WarcError(f"bad gzip member: {exc}") from exc


def parse_warc(data: bytes) -> Iterator[dict]:
    """WARC bytes → record dicts {type, url, record_id, content_type,
    payload}; framing strictly by Content-Length. Raises WarcError on a
    malformed header block — the caller decides containment scope."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if data[pos:pos + 5] != b"WARC/":
            raise WarcError(f"bad record header at byte {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcError("unterminated record header")
        fields: dict[str, str] = {}
        head = data[pos:hdr_end].decode("latin-1").split("\r\n")
        for line in head[1:]:
            k, sep, v = line.partition(":")
            if not sep:
                raise WarcError(f"bad header line {line!r}")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcError(f"bad Content-Length: {exc}") from exc
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise WarcError("record payload truncated")
        yield {
            "type": fields.get("warc-type", ""),
            "url": fields.get("warc-target-uri", ""),
            "record_id": fields.get("warc-record-id", ""),
            "content_type": fields.get("content-type", ""),
            "payload": data[body_start:body_start + clen],
        }
        pos = body_start + clen


def http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP response payload → (status, headers, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise WarcError("http payload has no header terminator")
    head = payload[:sep].decode("latin-1").split("\r\n")
    parts = head[0].split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise WarcError(f"bad http status line {head[0]!r}")
    status = int(parts[1])
    headers = {}
    for line in head[1:]:
        k, sep2, v = line.partition(":")
        if sep2:
            headers[k.strip().lower()] = v.strip()
    return status, headers, payload[sep + 4:]


def warc_response_docs(name: str, data: bytes) -> Iterator[tuple]:
    """One WARC file → WARC_DDL tuples (pure Python, unit-testable).

    Response records yield extracted main content; non-response records
    are skipped; a framing error yields ONE error row carrying the
    records-parsed-so-far count in record_seq."""
    from fast_pdf_parser_spark.sources.html_extractor import (
        html_main_content,
    )

    seq = 0
    try:
        for rec in parse_warc(data):
            if rec["type"] != "response":
                continue
            try:
                status, headers, body = http_response(rec["payload"])
                text = body.decode("utf-8", errors="replace")
                main = html_main_content(text)
                yield (name, seq, rec["record_id"], rec["url"], status,
                       headers.get("content-type", ""), len(body), main,
                       None)
            except Exception as exc:  # contain: record-level failure
                yield (name, seq, rec["record_id"], rec["url"], None,
                       None, None, None, f"record: {exc}")
            seq += 1
    except WarcError as exc:  # contain: file-tail failure
        yield (name, seq, None, None, None, None, None, None,
               f"file: {exc}")


def read_warc_documents(df: DataFrame, name_col: str = "path",
                        data_col: str = "content") -> DataFrame:
    """DataFrame(one row per WARC file, binary column) → one row per
    response record with extracted main content (WARC_DDL). The default
    column names match ``spark.read.format("binaryFile")``. Zero-shuffle:
    a file's records are parsed in place; input is pruned to the two
    columns before the UDF."""
    import pandas as pd

    cols = [f.split(" ")[0] for f in WARC_DDL.split(", ")]

    def gen(batches):
        for pdf in batches:
            rows = []
            for name, data in zip(pdf[name_col], pdf[data_col]):
                rows.extend(warc_response_docs(name, bytes(data)))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(name_col, data_col).mapInPandas(gen, schema=WARC_DDL)


def deterministic_record_id(key: str) -> str:
    """Stable urn for synthetic corpora (real WARCs carry uuids)."""
    return f"<urn:md5:{hashlib.md5(key.encode()).hexdigest()}>"
