"""Real PDF binary text extraction (functions/pdfbin.py) and its decode-stage
wiring. Reference behavior: src/services/pdf.service.js:17-109 (pdftoppm +
OCR); the no-deps equivalent decodes the digital text layer instead."""

from __future__ import annotations

import numpy as np
import pytest

from medical_ocr_service_ray.functions.pdfbin import (
    PdfBinError,
    encode_pdf,
    extract_pdf_text,
    pdf_text_features,
)


class TestPdfBinCodec:
    def test_roundtrip_multipage_flate(self):
        pages = [["first line", "second line"], ["page two only"]]
        pdf = encode_pdf(pages)
        assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
        assert extract_pdf_text(pdf) == ["first line", "second line", "page two only"]

    def test_roundtrip_raw_stream(self):
        pdf = encode_pdf([["uncompressed body"]], compress=False)
        assert b"/FlateDecode" not in pdf
        assert extract_pdf_text(pdf) == ["uncompressed body"]

    def test_escapes_and_parens(self):
        line = r"balanced (parens) and \ backslash"
        assert extract_pdf_text(encode_pdf([[line]])) == [line]

    def test_octal_and_hex_strings(self):
        # hand-built content stream: octal escape + hex string + T* motion
        import zlib

        content = b"BT (oct\\101) Tj T* <48692100> Tj ET"
        data = zlib.compress(content)
        pdf = (
            b"%PDF-1.4\n1 0 obj\n<< /Length "
            + str(len(data)).encode()
            + b" /Filter /FlateDecode >>\nstream\n"
            + data
            + b"\nendstream\nendobj\n"
        )
        assert extract_pdf_text(pdf) == ["octA", "Hi!\x00"]

    def test_tj_array_strings_concatenate(self):
        pdf = (
            b"%PDF-1.4\n1 0 obj\n<< /Length 33 >>\nstream\n"
            b"BT [(kerned ) -20 (pair)] TJ ET\nendstream\nendobj\n"
        )
        assert extract_pdf_text(pdf) == ["kerned pair"]

    def test_error_paths(self):
        with pytest.raises(PdfBinError):
            extract_pdf_text(b"JUNKJUNK")
        with pytest.raises(PdfBinError):
            extract_pdf_text(b"%PDF-1.4\n/Encrypt <<>>")
        # corrupt flate stream
        bad = encode_pdf([["x"]]).replace(b"stream\n", b"stream\nZZ", 1)
        with pytest.raises(PdfBinError):
            extract_pdf_text(bad)

    def test_features_deterministic_and_content_sensitive(self):
        a = pdf_text_features(["hello world"])
        b = pdf_text_features(["hello world"])
        c = pdf_text_features(["different text"])
        assert np.allclose(a, b)
        assert not np.allclose(a, c)
        assert abs(a.sum() - 1.0) < 1e-9


class TestMediaStagePdf:
    def test_real_pdf_path_vs_fake(self, ray_session):
        """A decodable digital PDF takes the REAL text path (features derive
        from content, so same-bytes => same features, different-text =>
        different features); junk with a %PDF header falls back to fake."""
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        dec = MediaDecoderStub(op="features")
        p1 = encode_pdf([["invoice total 123"]])
        p2 = encode_pdf([["completely different content"]])
        f1 = dec._features(p1)
        f1b = dec._features(bytes(p1))
        f2 = dec._features(p2)
        assert np.allclose(f1, f1b)
        assert not np.allclose(f1, f2)
        exp = pdf_text_features(extract_pdf_text(p1), dim=dec.FEATURE_DIM)
        assert np.allclose(f1, exp)
        # %PDF header but undecodable: falls back to the deterministic fake
        junk = b"%PDF-1.4 not really a pdf"
        fj = dec._features(junk)
        assert fj.shape == (dec.FEATURE_DIM,)
