"""WARC source: the web-archive container every web-scale corpus pipeline
ingests (Common-Crawl-style `.warc` / `.warc.gz`), parsed with the stdlib
only.

Reference analogue: the multipart upload source (S1) — an envelope format
wrapping heterogeneous payload bytes + per-record metadata; here re-expressed
for the archive format the 100-TB corpus actually arrives in.

Scale shape: one parse task per archive file via ``read_binary_files`` —
WARC-gzip is a stream of independently-deflated members, but the member
index is not in the file, so file granularity is the standard parallel unit
(Common Crawl ships ~1 GB archives precisely so that a file is a good task).
Each record becomes one row: envelope headers promoted to typed columns, the
HTTP payload left as an opaque ``binary`` column for downstream actor-pool
decode stages (stages/multimodal.py contract).
"""

from __future__ import annotations

import gzip
import io
from urllib.parse import urlsplit

import pyarrow as pa

import ray.data as rd

_CRLF2 = b"\r\n\r\n"


def _maybe_gunzip(data: bytes) -> bytes:
    """Inflate ALL gzip members (warc.gz concatenates one member per record);
    pass non-gzip bytes through untouched."""
    if data[:2] != b"\x1f\x8b":
        return data
    out, stream = [], io.BytesIO(data)
    while True:
        start = stream.tell()
        if start >= len(data):
            break
        with gzip.GzipFile(fileobj=stream) as g:
            out.append(g.read())
        # GzipFile stops at member end; loop picks up the next member
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # line 0 is the version/status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return headers


def parse_warc_bytes(data: bytes) -> list[dict]:
    """All records of one WARC file as dicts. Envelope headers are parsed
    per the WARC/1.0 grammar (version line, header block, Content-Length
    payload, CRLF CRLF trailer); HTTP response payloads are split into
    status / headers / body."""
    data = _maybe_gunzip(data)
    records, pos, n = [], 0, len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0 or not data[pos:].startswith(b"WARC/"):
            break  # truncated / garbage tail: stop cleanly
        head = _parse_headers(data[pos:head_end])
        length = int(head.get("content-length", "0"))
        body = data[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length

        rec = {
            "record_type": head.get("warc-type", ""),
            "url": head.get("warc-target-uri", ""),
            "warc_date": head.get("warc-date", ""),
            "record_id": head.get("warc-record-id", ""),
            "http_status": None,
            "http_content_type": None,
            "payload": b"",
        }
        rec["domain"] = urlsplit(rec["url"]).netloc.lower() if rec["url"] else ""
        if rec["record_type"] == "response" and body[:5] == b"HTTP/":
            hdr_end = body.find(_CRLF2)
            hdr_end = len(body) if hdr_end < 0 else hdr_end
            status_line = body[:hdr_end].split(b"\r\n", 1)[0].split()
            try:
                rec["http_status"] = int(status_line[1]) if len(status_line) > 1 else None
            except ValueError:  # malformed/non-numeric status token: degrade
                rec["http_status"] = None  # this one record, not the archive
            http = _parse_headers(body[:hdr_end])
            rec["http_content_type"] = http.get("content-type")
            rec["payload"] = body[hdr_end + 4 :]
        else:
            rec["payload"] = body
        rec["payload_len"] = len(rec["payload"])
        records.append(rec)
    return records


_WARC_SCHEMA = pa.schema(
    [
        ("record_type", pa.string()),
        ("url", pa.string()),
        ("domain", pa.string()),
        ("warc_date", pa.string()),
        ("record_id", pa.string()),
        ("http_status", pa.int64()),
        ("http_content_type", pa.string()),
        ("payload", pa.binary()),
        ("payload_len", pa.int64()),
    ]
)


def read_warc(paths: str | list[str], *, responses_only: bool = False) -> "rd.Dataset":
    """Distributed WARC read: one parse task per archive, typed Arrow rows
    out. ``responses_only`` drops request/metadata/warcinfo envelopes at the
    parse (the usual corpus-ingest filter) so non-content records never
    enter the stream."""

    def parse(batch: "pa.Table") -> "pa.Table":
        rows: list[dict] = []
        for data in batch["bytes"].to_pylist():
            for r in parse_warc_bytes(data):
                if responses_only and r["record_type"] != "response":
                    continue
                rows.append(r)
        return pa.Table.from_pylist(rows, schema=_WARC_SCHEMA)

    files = rd.read_binary_files(paths)
    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


def build_warc_bytes(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """Serialize records into a spec-shaped WARC file (test fixtures and the
    round-trip sink). ``gzip_members`` emits one gzip member per record —
    the `.warc.gz` layout."""
    out = []
    for r in records:
        body = r.get("payload", b"")
        if r.get("record_type") == "response" and r.get("http_status") is not None:
            http_head = (
                f"HTTP/1.1 {r['http_status']} OK\r\n"
                f"Content-Type: {r.get('http_content_type') or 'text/html'}\r\n"
                f"Content-Length: {len(body)}\r\n"
            ).encode()
            body = http_head + b"\r\n" + body
        head = [b"WARC/1.0"]
        head.append(f"WARC-Type: {r.get('record_type', 'resource')}".encode())
        if r.get("url"):
            head.append(f"WARC-Target-URI: {r['url']}".encode())
        head.append(
            f"WARC-Date: {r.get('warc_date', '2024-01-01T00:00:00Z')}".encode()
        )
        head.append(f"WARC-Record-ID: {r.get('record_id', '<urn:uuid:0>')}".encode())
        head.append(f"Content-Length: {len(body)}".encode())
        rec = b"\r\n".join(head) + _CRLF2 + body + _CRLF2
        if gzip_members:
            rec = gzip.compress(rec)
        out.append(rec)
    return b"".join(out)
