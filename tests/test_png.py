"""Pure-stdlib PNG codec (functions/png.py) + the un-stubbed media decode
path (VERDICT r2 item 6): q26 features must come from real pixel data for
PNG payloads."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from medical_ocr_service_ray.functions.png import (
    PngError,
    decode_png,
    encode_png,
    image_features,
    resize_nearest,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


class TestPngCodec:
    @pytest.mark.parametrize("shape", [(1, 1, 1), (5, 7, 3), (16, 16, 4), (33, 9, 2)])
    def test_roundtrip(self, shape):
        img = np.random.default_rng(3).integers(0, 256, size=shape, dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()

    def test_all_five_filters_reconstruct(self):
        """Golden: a PNG whose rows cycle filters 0..4 (None/Sub/Up/Avg/Paeth)
        must reconstruct to the original pixels."""
        rng = np.random.default_rng(9)
        h, w, ch = 5, 4, 3
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        flat = img.reshape(h, w * ch).astype(np.int32)

        def filt_row(f, cur, prev):
            n = len(cur)
            out = np.zeros(n, np.int32)
            for x in range(n):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (cur[x] - pred) & 0xFF
            return out.astype(np.uint8)

        rows, prev = [], np.zeros(w * ch, np.int32)
        for y in range(h):
            rows.append(bytes([y % 5]) + filt_row(y % 5, flat[y], prev).tobytes())
            prev = flat[y]
        sig = b"\x89PNG\r\n\x1a\n"
        data = (
            sig
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _chunk(b"IEND", b"")
        )
        assert (decode_png(data) == img).all()

    def test_palette(self):
        rng = np.random.default_rng(1)
        pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
        idx = rng.integers(0, 4, size=(6, 5), dtype=np.uint8)
        raw = b"".join(bytes([0]) + idx[y].tobytes() for y in range(6))
        sig = b"\x89PNG\r\n\x1a\n"
        data = (
            sig
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 3, 0, 0, 0))
            + _chunk(b"PLTE", pal.tobytes())
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        assert (decode_png(data) == pal[idx]).all()

    def test_malformed_raises_png_error(self):
        img = np.zeros((4, 4, 3), np.uint8)
        good = encode_png(img)
        for bad in [b"", b"notapng", good[:20], good[:-5], None, 123]:
            with pytest.raises(PngError):
                decode_png(bad)

    def test_resize_and_features(self):
        img = np.random.default_rng(5).integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
        r = resize_nearest(img, 8, 9)
        assert r.shape == (9, 8, 3)
        f = image_features(img)
        assert f.shape == (64,)
        assert 0.0 <= f.min() and f.max() <= 1.0
        # real-pixel sensitivity: a brighter image must move the features
        assert not np.allclose(f, image_features(np.minimum(img + 60, 255)))


class TestDecoderUsesRealPixels:
    def test_png_payload_features_match_decode(self, ray_session):
        """MediaDecoderStub must compute PNG features from decoded pixels,
        matching a direct decode_png+image_features call."""
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        import pyarrow as pa

        rng = np.random.default_rng(21)
        img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        payload = encode_png(img)
        batch = pa.table(
            {
                "item_id": pa.array([1], pa.int64()),
                "payload": pa.array([payload], pa.binary()),
                "declared_mime": pa.array(["image/png"], pa.string()),
                "meta": pa.array(
                    [{"width": 24, "height": 24, "ms": 0}],
                    pa.struct(
                        [("width", pa.int32()), ("height", pa.int32()), ("ms", pa.int32())]
                    ),
                ),
            }
        )
        out = MediaDecoderStub(op="features")(batch)
        got = np.asarray(out["features"][0].as_py())
        expected = image_features(img).astype(np.float32)
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_resize_op_really_resizes_png(self, ray_session):
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        import pyarrow as pa

        rng = np.random.default_rng(22)
        img = rng.integers(0, 256, size=(50, 40, 3), dtype=np.uint8)
        batch = pa.table(
            {
                "item_id": pa.array([7], pa.int64()),
                "payload": pa.array([encode_png(img)], pa.binary()),
                "declared_mime": pa.array(["image/png"], pa.string()),
                "meta": pa.array(
                    [{"width": 40, "height": 50, "ms": 0}],
                    pa.struct(
                        [("width", pa.int32()), ("height", pa.int32()), ("ms", pa.int32())]
                    ),
                ),
            }
        )
        out = MediaDecoderStub(op="resize", target=(16, 12))(batch)
        resized = decode_png(out["payload"][0].as_py())
        assert resized.shape == (12, 16, 3)
        meta = out["meta"][0].as_py()
        assert (meta["width"], meta["height"]) == (16, 12)
        assert (resized == resize_nearest(img, 16, 12)).all()

    def test_non_png_still_deterministic_fake(self, ray_session):
        """Non-PNG payloads keep the documented deterministic stand-in."""
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        import pyarrow as pa

        batch = pa.table(
            {
                "item_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array([b"\xff\xd8\xffJPEGJUNK", b"JUNK123"], pa.binary()),
                "declared_mime": pa.array(["image/jpeg", "x"], pa.string()),
                "meta": pa.array(
                    [None, None],
                    pa.struct(
                        [("width", pa.int32()), ("height", pa.int32()), ("ms", pa.int32())]
                    ),
                ),
            }
        )
        stub = MediaDecoderStub(op="features")
        a = stub(batch)
        b = stub(batch)
        assert a.equals(b)


class TestWavCodec:
    def test_roundtrip_pcm16(self):
        import numpy as np

        from medical_ocr_service_ray.functions.audio import decode_wav, encode_wav

        rate = 16000
        t = np.arange(1600) / rate
        mono = 0.5 * np.sin(2 * np.pi * 440 * t)
        samples, got_rate = decode_wav(encode_wav(mono, rate))
        assert got_rate == rate and samples.shape == (1600, 1)
        assert np.abs(samples[:, 0] - mono).max() < 1e-4  # PCM16 quantization

    def test_stereo_and_8bit(self):
        import struct

        import numpy as np

        from medical_ocr_service_ray.functions.audio import decode_wav, encode_wav

        stereo = np.stack([np.linspace(-1, 1, 100), np.linspace(1, -1, 100)], axis=1)
        s, r = decode_wav(encode_wav(stereo, 8000))
        assert s.shape == (100, 2) and r == 8000
        # hand-build an 8-bit mono file (unsigned PCM)
        pcm = bytes(range(0, 250))
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(pcm)) + pcm
        s8, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
        assert s8.shape == (250, 1)
        assert abs(s8[128, 0]) < 1e-9  # 128 is the 8-bit zero point

    def test_malformed_raises_waverror(self):
        import pytest

        from medical_ocr_service_ray.functions.audio import WavError, decode_wav

        for bad in (b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVE", b"JUNK" * 10):
            with pytest.raises(WavError):
                decode_wav(bad)

    def test_unsupported_layout_raises(self):
        import struct

        import pytest

        from medical_ocr_service_ray.functions.audio import WavError, decode_wav

        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float32 tag=3
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
        with pytest.raises(WavError):
            decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


class TestDecoderUsesRealAudio:
    def _batch(self, payloads):
        import pyarrow as pa

        meta_t = pa.struct(
            [("width", pa.int32()), ("height", pa.int32()), ("ms", pa.int32())]
        )
        return pa.table(
            {
                "item_id": pa.array(range(len(payloads)), pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
                "declared_mime": pa.array(["audio/wav"] * len(payloads), pa.string()),
                "meta": pa.array([None] * len(payloads), meta_t),
            }
        )

    def test_features_come_from_samples(self, ray_session):
        """Silence vs a loud tone must separate in the RMS feature — the
        blake2b fake could never produce that structure."""
        import numpy as np

        from medical_ocr_service_ray.functions.audio import encode_wav
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        rate = 8000
        silence = encode_wav(np.zeros(800), rate)
        tone = encode_wav(0.9 * np.sin(2 * np.pi * 440 * np.arange(800) / rate), rate)
        out = MediaDecoderStub(op="features")(self._batch([silence, tone]))
        feats = np.array(out["features"].to_pylist())
        rms_silence, rms_tone = feats[0, 1], feats[1, 1]
        assert rms_silence < 1e-6 and rms_tone > 0.5
        # envelope tail: silence flat at 0, tone energetic everywhere
        assert feats[0, 4:].max() < 1e-6 and feats[1, 4:].min() > 0.3

    def test_half_silent_envelope_localizes_energy(self, ray_session):
        import numpy as np

        from medical_ocr_service_ray.functions.audio import encode_wav
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        rate = 8000
        sig = np.concatenate(
            [np.zeros(4000), 0.8 * np.sin(2 * np.pi * 200 * np.arange(4000) / rate)]
        )
        out = MediaDecoderStub(op="features")(self._batch([encode_wav(sig, rate)]))
        env = np.array(out["features"].to_pylist())[0, 4:]
        half = len(env) // 2
        assert env[:half].max() < 1e-6 and env[half:].min() > 0.2

    def test_truncated_wav_takes_fake_path(self, ray_session):
        """A RIFF payload that fails to parse must not crash the stage."""
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        stub = MediaDecoderStub(op="features")
        a = stub(self._batch([b"RIFF\x10\x00\x00\x00WAVEjunk"]))
        b = stub(self._batch([b"RIFF\x10\x00\x00\x00WAVEjunk"]))
        assert a.equals(b) and a.num_rows == 1
