"""functions/gif.py: pure-stdlib GIF codec — LZW roundtrip, interlace,
malformed payloads, and the media stage's real-pixel path for GIF."""

from __future__ import annotations

import numpy as np
import pytest


def _palette_image(rng, h, w, n_colors):
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, size=(h, w))]


class TestGifCodec:
    def test_roundtrip(self):
        from medical_ocr_service_ray.functions.gif import decode_gif, encode_gif

        rng = np.random.default_rng(5)
        for h, w, nc in ((1, 1, 2), (3, 5, 4), (16, 16, 32), (40, 23, 256), (9, 300, 7)):
            img = _palette_image(rng, h, w, nc)
            back = decode_gif(encode_gif(img))
            assert back.shape == (h, w, 3)
            assert (back == img).all()

    def test_interlaced_roundtrip(self):
        from medical_ocr_service_ray.functions.gif import decode_gif, encode_gif

        rng = np.random.default_rng(6)
        for h in (1, 2, 3, 7, 8, 9, 31):  # every interlace-pass boundary shape
            img = _palette_image(rng, h, 11, 5)
            assert (decode_gif(encode_gif(img, interlace=True)) == img).all()

    def test_long_stream_clear_codes(self):
        """>254-pixel images force periodic CLEAR codes in the encoder and a
        dictionary reset mid-stream in the decoder."""
        from medical_ocr_service_ray.functions.gif import decode_gif, encode_gif

        rng = np.random.default_rng(7)
        img = _palette_image(rng, 64, 64, 256)  # 4096 px, many clears
        assert (decode_gif(encode_gif(img)) == img).all()

    def test_malformed(self):
        from medical_ocr_service_ray.functions.gif import GifError, decode_gif, encode_gif

        rng = np.random.default_rng(8)
        good = bytearray(encode_gif(_palette_image(rng, 8, 8, 4)))
        with pytest.raises(GifError):
            decode_gif(b"GIF87a")  # truncated header
        with pytest.raises(GifError):
            decode_gif(b"NOTGIF" + bytes(good[6:]))
        with pytest.raises(GifError):
            decode_gif(bytes(good[: len(good) // 2]))  # truncated stream

    def test_media_stage_uses_real_gif_pixels(self, ray_session):
        """A GIF and a PNG of the SAME image must produce the SAME features
        (codec-independent pixel path), different from the blake2b fake."""
        import pandas as pd

        from medical_ocr_service_ray.functions.gif import encode_gif
        from medical_ocr_service_ray.functions.png import encode_png, image_features
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        rng = np.random.default_rng(9)
        img = _palette_image(rng, 20, 20, 8)
        dec = MediaDecoderStub(op="features")
        batch = pd.DataFrame(
            {
                "item_id": [0, 1],
                "payload": [encode_gif(img), encode_png(img)],
                "declared_mime": ["image/gif", "image/png"],
                "meta": [{"width": 20, "height": 20, "ms": 0}] * 2,
            }
        )
        import pyarrow as pa

        out = dec(pa.Table.from_pandas(batch))
        feats = out["features"].to_pylist()
        assert feats[0] == feats[1]  # same pixels -> same features
        want = image_features(img, MediaDecoderStub.FEATURE_DIM)
        assert np.allclose(feats[0], want, atol=1e-6)  # stage stores float32
