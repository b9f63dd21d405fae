"""functions/webp.py: pure-stdlib VP8L (lossless WebP) codec — exact
roundtrips across encoder options (subtract-green transform, color cache),
malformed/lossy payloads, RIFF sniff disambiguation, and the media stage's
real-pixel path for WebP."""

from __future__ import annotations

import struct

import numpy as np
import pytest


class TestWebpCodec:
    def test_roundtrip_exact(self):
        from medical_ocr_service_ray.functions.webp import decode_webp, encode_webp

        rng = np.random.default_rng(5)
        for h, w in ((1, 1), (3, 5), (16, 16), (33, 17), (9, 300), (64, 48)):
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            back = decode_webp(encode_webp(img))
            assert back.shape == (h, w, 3)
            assert (back == img).all()  # lossless: exact equality

    def test_roundtrip_subtract_green_and_cache(self):
        """Encoder options drive the decoder's transform and color-cache
        paths; every combination must still roundtrip exactly."""
        from medical_ocr_service_ray.functions.webp import decode_webp, encode_webp

        rng = np.random.default_rng(6)
        noisy = rng.integers(0, 256, size=(33, 17, 3), dtype=np.uint8)
        lowent = (rng.integers(0, 4, size=(40, 41, 3)) * 64).astype(np.uint8)
        for img in (noisy, lowent):
            for sg in (False, True):
                for cb in (0, 1, 3, 8, 11):
                    out = decode_webp(encode_webp(img, subtract_green=sg, cache_bits=cb))
                    assert (out == img).all(), (sg, cb)

    def test_run_heavy_image(self):
        """Flat regions force distance-1 LZ77 runs through the 2-D
        neighborhood distance map."""
        from medical_ocr_service_ray.functions.webp import decode_webp, encode_webp

        img = np.full((40, 40, 3), 200, np.uint8)
        img[10:20, 10:20] = 10
        assert (decode_webp(encode_webp(img)) == img).all()

    def test_lossy_vp8_raises(self):
        """VP8 (lossy) chunks are the declared boundary — must raise, not
        mis-decode."""
        from medical_ocr_service_ray.functions.webp import WebpError, decode_webp

        body = b"VP8 " + struct.pack("<I", 10) + b"\x00" * 10
        payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
        with pytest.raises(WebpError, match="lossy"):
            decode_webp(payload)

    def test_malformed(self):
        from medical_ocr_service_ray.functions.webp import (
            WebpError,
            decode_webp,
            encode_webp,
        )

        rng = np.random.default_rng(7)
        good = encode_webp(rng.integers(0, 256, size=(12, 12, 3), dtype=np.uint8))
        with pytest.raises(WebpError):
            decode_webp(b"")
        with pytest.raises(WebpError):
            decode_webp(b"RIFF\x00\x00\x00\x00WAVE" + good[12:])
        with pytest.raises(WebpError):
            decode_webp(good[: len(good) // 2])  # truncated stream
        with pytest.raises(WebpError):
            encode_webp(np.zeros((4, 4), np.uint8))  # wrong shape

    def test_sniff_riff_disambiguation(self):
        """RIFF is a container: the form tag splits image/webp from
        audio/wav (anti-spoof sniff must not call a WebP 'audio')."""
        from medical_ocr_service_ray.functions.webp import encode_webp
        from medical_ocr_service_ray.stages.multimodal import sniff_mime

        webp = encode_webp(np.zeros((4, 4, 3), np.uint8))
        assert sniff_mime(webp) == "image/webp"
        assert sniff_mime(b"RIFF\x10\x00\x00\x00WAVEjunk") == "audio/wav"
        assert sniff_mime(b"RIF") == "application/octet-stream"

    def test_media_stage_uses_real_webp_pixels(self):
        """A WebP and a PNG of the SAME image must produce the SAME features
        (codec-independent pixel path), different from the blake2b fake."""
        import pyarrow as pa

        from medical_ocr_service_ray.functions.png import encode_png, image_features
        from medical_ocr_service_ray.functions.webp import encode_webp
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        dec = MediaDecoderStub(op="features")
        batch = pa.table(
            {
                "item_id": pa.array([0, 1], pa.int64()),
                "payload": pa.array([encode_webp(img), encode_png(img)], pa.binary()),
                "declared_mime": pa.array(["image/webp", "image/png"], pa.string()),
            }
        )
        out = dec(batch)
        feats = out["features"].to_pylist()
        assert feats[0] == feats[1]  # same pixels -> same features
        want = image_features(img, MediaDecoderStub.FEATURE_DIM)
        assert feats[0] == pytest.approx(list(map(float, want)))


class TestWebpFuzz:
    def test_roundtrip_hypothesis(self):
        """Property fuzz: ANY rgb image roundtrips exactly through every
        encoder-option combination (shape, content entropy, subtract-green,
        cache size all drawn by hypothesis; deterministic via fixed seeds)."""
        from hypothesis import given, settings, strategies as st

        from medical_ocr_service_ray.functions.webp import decode_webp, encode_webp

        @settings(max_examples=25, deadline=None, derandomize=True)
        @given(
            h=st.integers(1, 40),
            w=st.integers(1, 40),
            seed=st.integers(0, 2**31 - 1),
            entropy=st.sampled_from(["noise", "flat", "palette", "gradient"]),
            sg=st.booleans(),
            cb=st.sampled_from([0, 2, 6, 10]),
        )
        def check(h, w, seed, entropy, sg, cb):
            rng = np.random.default_rng(seed)
            if entropy == "noise":
                img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            elif entropy == "flat":
                img = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
            elif entropy == "palette":
                img = (rng.integers(0, 3, size=(h, w, 3)) * 100).astype(np.uint8)
            else:  # gradient — exercises the predictor-free residual paths
                yy, xx = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [(yy * 7) % 256, (xx * 11) % 256, (yy + xx) % 256], axis=2
                ).astype(np.uint8)
            out = decode_webp(encode_webp(img, subtract_green=sg, cache_bits=cb))
            assert out.shape == (h, w, 3)
            assert (out == img).all()

        check()
