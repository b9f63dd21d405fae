"""q59 document chunking and q60 PII redaction: reconstruction/coverage
invariants for the chunker, and planted email/phone/id redaction for the
scrubber (the sf data only exercises the digit-run pattern)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestChunking:
    def _chunk(self, texts):
        import ray.data as rd

        from medical_ocr_service_ray.pipelines.queries import q59_chunk_documents

        # exercise the same batch fn through a miniature table on disk
        import pyarrow as pa
        import pyarrow.parquet as pq
        import tempfile, os

        d = tempfile.mkdtemp()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        return (
            q59_chunk_documents(d)
            .to_pandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )

    def test_reconstruction_and_overlap(self, ray_session):
        from medical_ocr_service_ray.pipelines.queries import _Q59_SIZE, _Q59_STEP

        text = "".join(chr(ord("a") + i % 26) for i in range(553))
        out = self._chunk([text])
        # every chunk is the right slice of the original
        for _, r in out.iterrows():
            start = r.chunk_idx * _Q59_STEP
            assert r.chunk == text[start : start + _Q59_SIZE]
        # consecutive chunks overlap by size-step characters
        assert (out.chunk_idx.values == np.arange(len(out))).all()
        overlap = _Q59_SIZE - _Q59_STEP
        for i in range(len(out) - 1):
            assert out.chunk.iloc[i][-overlap:] == out.chunk.iloc[i + 1][:overlap]
        # stitching chunk[0] + tails of the rest reconstructs the doc
        stitched = out.chunk.iloc[0] + "".join(c[overlap:] for c in out.chunk.iloc[1:])
        assert stitched == text

    def test_edge_lengths(self, ray_session):
        from medical_ocr_service_ray.pipelines.queries import _Q59_SIZE, _Q59_STEP

        out = self._chunk(["", "x", "y" * _Q59_STEP, "z" * (_Q59_STEP + 1)])
        assert 0 not in set(out.doc_id)  # empty doc -> no chunks
        assert len(out[out.doc_id == 1]) == 1
        assert len(out[out.doc_id == 2]) == 1  # len == step -> single chunk
        assert len(out[out.doc_id == 3]) == 2  # one char past -> second chunk
        assert out[out.doc_id == 3].chunk.iloc[1] == "z"
        assert (out.chunk_chars == out.chunk.str.len()).all()

    def test_unicode_codepoint_slicing(self, ray_session):
        text = "ü" * 400  # 2-byte codepoints: byte slicing would split them
        out = self._chunk([text])
        assert out.chunk.iloc[0] == "ü" * 200
        assert out.chunk_chars.iloc[0] == 200


class TestRedaction:
    def test_planted_patterns(self):
        from medical_ocr_service_ray.pipelines.queries import redact_text

        s = pd.Series(
            [
                "contact john.doe@example.com or +1 555-123-4567 now",
                "order 1234567 shipped",  # 7 digits: too short for [PHONE] (needs 9+), hits [ID]
                "no pii here",
                "a@b.io and c@d.org",
            ]
        )
        red, hits = redact_text(s)
        assert red.iloc[0] == "contact [EMAIL] or [PHONE] now"
        assert red.iloc[1] == "order [ID] shipped"
        assert red.iloc[2] == "no pii here"
        assert red.iloc[3] == "[EMAIL] and [EMAIL]"
        assert list(hits) == [2, 1, 0, 2]

    def test_order_prevents_double_count(self):
        """The phone pattern must not re-match inside an already-redacted
        email, and the id pattern must not re-match a redacted phone."""
        from medical_ocr_service_ray.pipelines.queries import redact_text

        s = pd.Series(["mail 12345678@digits.com plus 123456 tail"])
        red, hits = redact_text(s)
        assert red.iloc[0] == "mail [EMAIL] plus [ID] tail"
        assert hits.iloc[0] == 2

    def test_matches_duckdb_on_planted(self):
        import duckdb

        from medical_ocr_service_ray.pipelines.queries import _REDACT_PATTERNS, redact_text

        rows = [
            "x ab.cd@ef-gh.net y",
            "tel +49 30 1234567 end",
            "ids 000001 and 9999999",
            "clean",
        ]
        red, hits = redact_text(pd.Series(rows))
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"s": rows}))
        expr, hit_terms = "s", []
        for pat, repl in _REDACT_PATTERNS:
            hit_terms.append(f"len(regexp_extract_all({expr}, '{pat}'))")
            expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
        exp = con.execute(
            f"SELECT {expr} AS red, {' + '.join(hit_terms)} AS hits FROM t"
        ).fetchdf()
        assert list(red) == list(exp.red)
        assert list(hits) == list(exp.hits)
