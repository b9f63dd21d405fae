"""functions/bmp.py: pure-stdlib BMP codec roundtrip + format edges, and the
media stage's real-pixel path for BMP payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest


class TestBmpCodec:
    def test_roundtrip(self):
        from medical_ocr_service_ray.functions.bmp import decode_bmp, encode_bmp

        rng = np.random.default_rng(2)
        for h, w in ((1, 1), (3, 5), (16, 16), (7, 13)):  # incl. stride-padding widths
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            back = decode_bmp(encode_bmp(img))
            assert back.shape == (h, w, 3)
            assert (back == img).all()

    def test_top_down_rows(self):
        """Negative height = top-down storage; both orientations must decode
        to the same logical image."""
        from medical_ocr_service_ray.functions.bmp import decode_bmp, encode_bmp

        img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        data = bytearray(encode_bmp(img))
        # flip to top-down: negate height, reverse the stored row order
        h = struct.unpack_from("<i", data, 22)[0]
        struct.pack_into("<i", data, 22, -h)
        stride = ((3 * 3 + 3) & ~3)
        off = struct.unpack_from("<I", data, 10)[0]
        rows = [bytes(data[off + i * stride : off + (i + 1) * stride]) for i in range(h)]
        data[off:] = b"".join(reversed(rows))
        assert (decode_bmp(bytes(data)) == img).all()

    def test_32bpp_alpha_dropped(self):
        from medical_ocr_service_ray.functions.bmp import decode_bmp

        # hand-build a 1x1 32-bit BMP: pixel BGRA = (10, 20, 30, 99)
        pix = bytes([10, 20, 30, 99])
        file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 14 + 40)
        dib = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 32, 0, len(pix), 0, 0, 0, 0)
        out = decode_bmp(file_hdr + dib + pix)
        assert out.shape == (1, 1, 3)
        assert list(out[0, 0]) == [30, 20, 10]  # RGB

    def test_rejects_unsupported(self):
        from medical_ocr_service_ray.functions.bmp import BmpError, decode_bmp, encode_bmp

        img = np.zeros((2, 2, 3), dtype=np.uint8)
        good = bytearray(encode_bmp(img))
        with pytest.raises(BmpError):
            decode_bmp(b"XX" + bytes(good[2:]))  # bad magic
        rle = bytearray(good)
        struct.pack_into("<I", rle, 30, 1)  # compression = BI_RLE8
        with pytest.raises(BmpError):
            decode_bmp(bytes(rle))
        with pytest.raises(BmpError):
            decode_bmp(bytes(good[:40]))  # truncated
        with pytest.raises(BmpError):
            encode_bmp(np.zeros((2, 2), dtype=np.uint8))  # not RGB


class TestMediaStageBmp:
    def test_features_use_real_bmp_pixels(self):
        """Two BMPs with different pixels but identical bytes-length must get
        different features; re-encoding the same pixels as PNG must give the
        SAME features (codec-independent pixel path)."""
        from medical_ocr_service_ray.functions.bmp import encode_bmp
        from medical_ocr_service_ray.functions.png import encode_png
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        rng = np.random.default_rng(4)
        a = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8)
        b = rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8)
        stage = MediaDecoderStub(op="features")
        fa = stage._features(encode_bmp(a))
        fb = stage._features(encode_bmp(b))
        fa_png = stage._features(encode_png(a))
        assert not np.allclose(fa, fb)
        assert np.allclose(fa, fa_png)

    def test_resize_normalizes_bmp_to_png(self):
        import pyarrow as pa

        from medical_ocr_service_ray.functions.bmp import encode_bmp
        from medical_ocr_service_ray.functions.png import decode_png
        from medical_ocr_service_ray.stages.multimodal import (
            MEDIA_SCHEMA,
            MediaDecoderStub,
        )

        img = np.random.default_rng(7).integers(0, 256, size=(10, 20, 3), dtype=np.uint8)
        batch = pa.table(
            {
                "item_id": pa.array([1], pa.int64()),
                "payload": pa.array([encode_bmp(img)], pa.binary()),
                "declared_mime": pa.array(["image/bmp"], pa.string()),
                "meta": pa.array(
                    [{"width": 20, "height": 10, "ms": 0}], MEDIA_SCHEMA.field("meta").type
                ),
            }
        )
        out = MediaDecoderStub(op="resize", target=(8, 6))(batch)
        resized = decode_png(out["payload"][0].as_py())
        assert resized.shape == (6, 8, 3)

    def test_sniff_detects_bmp(self):
        from medical_ocr_service_ray.functions.bmp import encode_bmp
        from medical_ocr_service_ray.stages.multimodal import sniff_mime

        img = np.zeros((2, 2, 3), dtype=np.uint8)
        assert sniff_mime(encode_bmp(img)) == "image/bmp"
