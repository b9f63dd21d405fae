"""WARC source: round-trip and parse-edge coverage (sources/warc.py).

Fixtures are built by build_warc_bytes — the same byte layout the WARC/1.0
grammar specifies — in both plain and per-record-gzip-member (.warc.gz)
forms, so the reader is tested against the container format itself, not a
mock of the parser.
"""

from __future__ import annotations

import gzip

import pytest

from medical_ocr_service_ray.sources.warc import (
    build_warc_bytes,
    parse_warc_bytes,
    read_warc,
)

RECORDS = [
    {
        "record_type": "warcinfo",
        "payload": b"software: test\r\n",
        "record_id": "<urn:uuid:info>",
    },
    {
        "record_type": "request",
        "url": "https://example.com/a",
        "payload": b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
        "record_id": "<urn:uuid:req>",
    },
    {
        "record_type": "response",
        "url": "https://Example.com/a",
        "http_status": 200,
        "http_content_type": "text/html; charset=utf-8",
        "payload": b"<html><body>hello \xc3\xa9</body></html>",
        "record_id": "<urn:uuid:resp1>",
    },
    {
        "record_type": "response",
        "url": "https://other.org/b?q=1",
        "http_status": 404,
        "http_content_type": "text/plain",
        "payload": b"not found",
        "record_id": "<urn:uuid:resp2>",
    },
]


class TestParse:
    def test_roundtrip_plain(self):
        recs = parse_warc_bytes(build_warc_bytes(RECORDS))
        assert [r["record_type"] for r in recs] == [
            "warcinfo",
            "request",
            "response",
            "response",
        ]
        resp = recs[2]
        assert resp["http_status"] == 200
        assert resp["http_content_type"] == "text/html; charset=utf-8"
        assert resp["payload"] == b"<html><body>hello \xc3\xa9</body></html>"
        assert resp["domain"] == "example.com"  # lowercased netloc
        assert recs[3]["http_status"] == 404
        assert recs[3]["domain"] == "other.org"

    def test_gzip_members_and_whole_file(self):
        # one gzip member per record (the .warc.gz layout)
        recs = parse_warc_bytes(build_warc_bytes(RECORDS, gzip_members=True))
        assert len(recs) == 4 and recs[2]["payload"].endswith(b"</html>")
        # a single whole-file gzip stream also inflates
        recs2 = parse_warc_bytes(gzip.compress(build_warc_bytes(RECORDS)))
        assert [r["record_id"] for r in recs2] == [r["record_id"] for r in recs]

    def test_binary_payload_with_crlf_crlf_inside(self):
        """Content-Length framing, not delimiter scanning: a payload
        containing CRLFCRLF must not split the record."""
        tricky = [
            {
                "record_type": "response",
                "url": "http://x.io/bin",
                "http_status": 200,
                "http_content_type": "application/octet-stream",
                "payload": b"AA\r\n\r\nBB\x00\x01\r\n\r\nCC",
                "record_id": "<urn:uuid:bin>",
            },
            {
                "record_type": "response",
                "url": "http://x.io/next",
                "http_status": 200,
                "http_content_type": "text/plain",
                "payload": b"after",
                "record_id": "<urn:uuid:next>",
            },
        ]
        recs = parse_warc_bytes(build_warc_bytes(tricky))
        assert len(recs) == 2
        assert recs[0]["payload"] == b"AA\r\n\r\nBB\x00\x01\r\n\r\nCC"
        assert recs[1]["payload"] == b"after"

    def test_truncated_tail_stops_cleanly(self):
        data = build_warc_bytes(RECORDS)[:-40] + b"garbage without warc header"
        recs = parse_warc_bytes(data)
        assert len(recs) >= 3  # earlier records intact, no exception


class TestReadWarc:
    @pytest.fixture()
    def warc_dir(self, tmp_path):
        d = tmp_path / "warcs"
        d.mkdir()
        (d / "a.warc").write_bytes(build_warc_bytes(RECORDS))
        (d / "b.warc.gz").write_bytes(
            build_warc_bytes(
                [
                    {
                        "record_type": "response",
                        "url": "https://example.com/c",
                        "http_status": 200,
                        "http_content_type": "text/html",
                        "payload": b"<html>c</html>",
                        "record_id": "<urn:uuid:c>",
                    }
                ],
                gzip_members=True,
            )
        )
        return str(d)

    def test_distributed_read_all(self, ray_session, warc_dir):
        df = read_warc(warc_dir).to_pandas()
        assert len(df) == 5
        assert set(df.record_type) == {"warcinfo", "request", "response"}
        assert df.payload.map(len).tolist() == df.payload_len.tolist()

    def test_responses_only_and_domain_rollup(self, ray_session, warc_dir):
        ds = read_warc(warc_dir, responses_only=True)
        df = ds.to_pandas()
        assert set(df.record_type) == {"response"}
        assert len(df) == 3
        counts = df.groupby("domain").size().to_dict()
        assert counts == {"example.com": 2, "other.org": 1}
        assert df.set_index("record_id").loc["<urn:uuid:c>"].http_status == 200
