"""functions/tiff.py: pure-stdlib uncompressed TIFF codec roundtrip + format
edges (both byte orders, grayscale photometrics, multi-strip), and the media
stage's real-pixel path for TIFF payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from medical_ocr_service_ray.functions.tiff import TiffError, decode_tiff, encode_tiff


class TestTiffCodec:
    def test_roundtrip_rgb_both_endian(self):
        rng = np.random.default_rng(7)
        for h, w in ((1, 1), (3, 5), (16, 16), (7, 13)):
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for be in (False, True):
                back = decode_tiff(encode_tiff(img, big_endian=be))
                assert back.shape == (h, w, 3)
                assert (back == img).all()

    def test_roundtrip_grayscale(self):
        img = np.arange(24, dtype=np.uint8).reshape(4, 6) * 10
        back = decode_tiff(encode_tiff(img))
        assert back.shape == (4, 6)
        assert (back == img).all()

    def test_multi_strip(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(10, 4, 3), dtype=np.uint8)
        data = encode_tiff(img, rows_per_strip=3)  # 4 strips: 3+3+3+1 rows
        assert (decode_tiff(data) == img).all()

    def test_white_is_zero_inverts(self):
        """PhotometricInterpretation=0 means 0 = white: decode must invert
        so callers always see 0 = black."""
        img = np.full((2, 2), 40, dtype=np.uint8)
        data = bytearray(encode_tiff(img))
        # patch the photometric tag (262) value from 1 -> 0
        n = struct.unpack_from("<H", data, 8)[0]
        for i in range(n):
            base = 10 + 12 * i
            tag = struct.unpack_from("<H", data, base)[0]
            if tag == 262:
                struct.pack_into("<H", data, base + 8, 0)
        out = decode_tiff(bytes(data))
        assert (out == 255 - 40).all()

    def test_rejects_unsupported(self):
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        good = bytearray(encode_tiff(img))
        with pytest.raises(TiffError):
            decode_tiff(b"XX" + bytes(good[2:]))  # bad magic
        lzw = bytearray(good)
        n = struct.unpack_from("<H", lzw, 8)[0]
        for i in range(n):
            base = 10 + 12 * i
            if struct.unpack_from("<H", lzw, base)[0] == 259:
                struct.pack_into("<H", lzw, base + 8, 5)  # Compression = LZW
        with pytest.raises(TiffError):
            decode_tiff(bytes(lzw))
        with pytest.raises(TiffError):
            decode_tiff(bytes(good[:20]))  # truncated strip/IFD
        with pytest.raises(TiffError):
            encode_tiff(np.zeros((2, 2, 4), dtype=np.uint8))  # RGBA unsupported


class TestMediaStageTiff:
    def test_sniff_and_codec_independent_features(self):
        """TIFF magic is sniffed for both byte orders, and a TIFF re-encode
        of the same pixels yields the same features as the PNG encode
        (codec-independent real-pixel path)."""
        from medical_ocr_service_ray.functions.png import encode_png
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub, sniff_mime

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8)
        t_le, t_be = encode_tiff(img), encode_tiff(img, big_endian=True)
        assert sniff_mime(t_le) == "image/tiff"
        assert sniff_mime(t_be) == "image/tiff"
        stage = MediaDecoderStub(op="features")
        f_png = stage._features(encode_png(img))
        f_le = stage._features(t_le)
        f_be = stage._features(t_be)
        assert np.allclose(f_png, f_le) and np.allclose(f_png, f_be)

    def test_grayscale_promoted_to_rgb_layout(self):
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        img = np.arange(36, dtype=np.uint8).reshape(6, 6)
        stage = MediaDecoderStub(op="features")
        px = stage._decode_tiff(encode_tiff(img))
        assert px.shape == (6, 6, 3)
        assert (px[:, :, 0] == img).all() and (px[:, :, 2] == img).all()

    def test_malformed_takes_fake_path_not_crash(self):
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        stage = MediaDecoderStub(op="features")
        bad = b"II*\x00" + b"\xff" * 16
        assert stage._decode_tiff(bad) is None
        assert stage._features(bad).shape == (MediaDecoderStub.FEATURE_DIM,)
