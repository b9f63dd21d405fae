"""HMAC manifest signing: signed lines verify; tampering detected."""

from __future__ import annotations

import json

import pytest

from medical_ocr_service_ray.functions.signing import sign_payload, verify_payload
from medical_ocr_service_ray.state.manifest import Manifest, ManifestEntry


def _entry(pid: int) -> ManifestEntry:
    return ManifestEntry(
        stage=1, partition_id=pid, input_file=f"f{pid}.parquet", batch_range=[0, 10],
        extractor_version="v1", rows=10, bytes=100, errors=0, wall_ms=5,
        status="DONE", attempt=1,
    )


class TestSigning:
    def test_sign_verify_roundtrip(self):
        payload = {"a": 1, "b": "x"}
        sig = sign_payload("s3cret", payload)
        assert verify_payload("s3cret", payload, sig)
        assert not verify_payload("other", payload, sig)
        assert not verify_payload("s3cret", {**payload, "a": 2}, sig)

    def test_canonicalization_key_order_independent(self):
        assert sign_payload("k", {"a": 1, "b": 2}) == sign_payload("k", {"b": 2, "a": 1})


class TestSignedManifest:
    def test_signed_append_load(self, tmp_path):
        m = Manifest(tmp_path / "m.jsonl", secret="k1")
        m.append(_entry(0))
        m.append(_entry(1))
        assert {e.partition_id for e in m.load()} == {0, 1}
        assert m.done(1) == {0, 1}

    def test_tampered_line_rejected(self, tmp_path):
        path = tmp_path / "m.jsonl"
        m = Manifest(path, secret="k1")
        m.append(_entry(0))
        lines = path.read_text().splitlines()
        rec = json.loads(lines[0])
        rec["rows"] = 99999  # tamper
        path.write_text(json.dumps(rec) + "\n")
        # a fresh Manifest (the resume-in-a-new-process case) re-reads the
        # file and must reject the tampered line; the original instance
        # serves its in-memory cache by design
        with pytest.raises(ValueError, match="signature"):
            Manifest(path, secret="k1").load()

    def test_unsigned_line_rejected_when_secret_set(self, tmp_path):
        path = tmp_path / "m.jsonl"
        Manifest(path).append(_entry(0))  # unsigned write
        with pytest.raises(ValueError, match="signature"):
            Manifest(path, secret="k1").load()

    def test_unsigned_mode_ignores_sig_field(self, tmp_path):
        path = tmp_path / "m.jsonl"
        Manifest(path, secret="k1").append(_entry(0))
        # reading without a secret still parses (sig stripped)
        assert Manifest(path).load()[0].partition_id == 0
