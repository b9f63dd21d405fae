"""functions/jpeg.py: pure-stdlib baseline JPEG codec — encode/decode
roundtrip closeness, 4:2:0 + grayscale + restart-marker decode (streams
hand-built from the module's own tables, so decoder paths the 4:4:4-only
encoder never emits are still exercised), malformed payloads, and the
media stage's real-pixel path for JPEG."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from medical_ocr_service_ray.functions import jpeg as J


def _gradient(h, w, base=(40, 80, 20)):
    """Smooth image (codec-friendly: little high-frequency energy)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    return np.stack(
        [
            base[0] + yy * (160.0 / max(h - 1, 1)),
            base[1] + xx * (160.0 / max(w - 1, 1)),
            base[2] + (yy + xx) * (160.0 / max(h + w - 2, 1)),
        ],
        axis=-1,
    ).astype(np.uint8)


def _encode_block(bw, blk, qm, enc_dc, enc_ac, pred):
    """Forward-DCT + quantize + huffman one 8x8 block; returns new DC pred."""
    coeff = J._C @ (blk - 128.0) @ J._C.T
    qz = np.round(coeff / qm).astype(np.int64)
    zz = qz.reshape(-1)[J.ZIGZAG]
    diff = int(zz[0]) - pred
    t = 0 if diff == 0 else int(abs(diff)).bit_length()
    code, ln = enc_dc[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run, last_nz = 0, 63
    while last_nz > 0 and zz[last_nz] == 0:
        last_nz -= 1
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c2, l2 = enc_ac[0xF0]
            bw.write(c2, l2)
            run -= 16
        s = int(abs(v)).bit_length()
        c2, l2 = enc_ac[(run << 4) | s]
        bw.write(c2, l2)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c2, l2 = enc_ac[0x00]
        bw.write(c2, l2)
    return int(zz[0])


def _headers(h, w, comps, quality, restart=0):
    """SOI + DQT + SOF0 + DHT (+DRI) + SOS for a hand-built stream.

    ``comps``: list of (cid, hv_byte, tq, td_ta_byte)."""
    out = bytearray(b"\xff\xd8")
    for tq, base in ((0, J._QL), (1, J._QC)):
        tbl = J._quality_scale(base, quality)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(tbl[i]) for i in range(64))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for cid, hv, tq, _ in comps:
        out += bytes([cid, hv, tq])
    for (kind, tid), (bits, values) in J._HT.items():
        tc = 0 if kind == "dc" else 1
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([(tc << 4) | tid]) + bytes(bits) + bytes(values)
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _, _, tdta in comps:
        out += bytes([cid, tdta])
    out += b"\x00\x3f\x00"
    return out


def _encode_420(img, quality=90, restart=0):
    """Hand-built 4:2:0 stream (h, w multiples of 16; chroma averaged 2x2),
    optionally with restart markers every ``restart`` MCUs."""
    h, w = img.shape[:2]
    assert h % 16 == 0 and w % 16 == 0
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

    ql = np.zeros(64, dtype=np.int64)
    ql[J.ZIGZAG] = J._quality_scale(J._QL, quality)
    qc = np.zeros(64, dtype=np.int64)
    qc[J.ZIGZAG] = J._quality_scale(J._QC, quality)
    qlm, qcm = ql.reshape(8, 8), qc.reshape(8, 8)
    enc = {k: J._build_encode_table(*v) for k, v in J._HT.items()}

    out = _headers(h, w, [(1, 0x22, 0, 0x00), (2, 0x11, 1, 0x11), (3, 0x11, 1, 0x11)], quality, restart)
    bw = J._BitWriter()
    pred = [0, 0, 0]
    mcu, rst = 0, 0
    for my in range(h // 16):
        for mx in range(w // 16):
            if restart and mcu and mcu % restart == 0:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                bw = J._BitWriter()
                pred = [0, 0, 0]
            for by in range(2):
                for bx in range(2):
                    y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                    pred[0] = _encode_block(
                        bw, y[y0 : y0 + 8, x0 : x0 + 8], qlm, enc[("dc", 0)], enc[("ac", 0)], pred[0]
                    )
            for ci, p in ((1, cb), (2, cr)):
                y0, x0 = my * 8, mx * 8
                pred[ci] = _encode_block(
                    bw, p[y0 : y0 + 8, x0 : x0 + 8], qcm, enc[("dc", 1)], enc[("ac", 1)], pred[ci]
                )
            mcu += 1
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _encode_gray(img2d, quality=90):
    """Hand-built single-component (grayscale) stream."""
    h, w = img2d.shape
    assert h % 8 == 0 and w % 8 == 0
    ql = np.zeros(64, dtype=np.int64)
    ql[J.ZIGZAG] = J._quality_scale(J._QL, quality)
    qlm = ql.reshape(8, 8)
    enc = {k: J._build_encode_table(*v) for k, v in J._HT.items()}
    out = _headers(h, w, [(1, 0x11, 0, 0x00)], quality)
    bw = J._BitWriter()
    pred = 0
    for my in range(h // 8):
        for mx in range(w // 8):
            pred = _encode_block(
                bw,
                img2d[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].astype(np.float64),
                qlm,
                enc[("dc", 0)],
                enc[("ac", 0)],
                pred,
            )
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


class TestJpegCodec:
    def test_roundtrip_close(self):
        for h, w in ((1, 1), (8, 8), (24, 16), (17, 31), (9, 100), (64, 48)):
            img = _gradient(h, w)
            back = J.decode_jpeg(J.encode_jpeg(img, quality=90))
            assert back.shape == (h, w, 3) and back.dtype == np.uint8
            assert np.abs(back.astype(int) - img.astype(int)).mean() < 3.0

    def test_quality_monotone(self):
        img = _gradient(40, 40)
        errs = []
        for q in (30, 60, 95):
            back = J.decode_jpeg(J.encode_jpeg(img, quality=q))
            errs.append(np.abs(back.astype(int) - img.astype(int)).mean())
        assert errs[0] >= errs[1] >= errs[2]

    def test_random_image_bounded_err(self):
        """Worst case for DCT (white noise) must still decode to a bounded
        error — proves the entropy coder handles dense AC coefficients,
        ZRL runs and byte stuffing."""
        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8)
        back = J.decode_jpeg(J.encode_jpeg(img, quality=95))
        assert np.abs(back.astype(int) - img.astype(int)).mean() < 20.0

    def test_420_decode(self):
        """Hand-built 4:2:0 stream: the decoder must lay out the 2x2 Y
        blocks per MCU and upsample chroma."""
        img = _gradient(32, 48)
        back = J.decode_jpeg(_encode_420(img, quality=90))
        assert back.shape == (32, 48, 3)
        assert np.abs(back.astype(int) - img.astype(int)).mean() < 4.0

    def test_420_restart_markers(self):
        img = _gradient(48, 64)  # 12 MCUs -> several RST markers
        payload = _encode_420(img, quality=90, restart=2)
        assert b"\xff\xd0" in payload or b"\xff\xd1" in payload
        back = J.decode_jpeg(payload)
        assert np.abs(back.astype(int) - img.astype(int)).mean() < 4.0

    def test_grayscale_decode(self):
        g = _gradient(16, 24)[..., 0]
        back = J.decode_jpeg(_encode_gray(g, quality=95))
        assert back.shape == (16, 24, 3)
        assert (back[..., 0] == back[..., 1]).all() and (back[..., 0] == back[..., 2]).all()
        assert np.abs(back[..., 0].astype(int) - g.astype(int)).mean() < 3.0

    def test_malformed(self):
        good = bytearray(J.encode_jpeg(_gradient(16, 16)))
        with pytest.raises(J.JpegError):
            J.decode_jpeg(b"\x89PNG\r\n\x1a\n")
        with pytest.raises(J.JpegError):
            J.decode_jpeg(bytes(good[: len(good) // 2]))  # truncated
        prog = bytearray(good)
        sof = prog.find(b"\xff\xc0")
        prog[sof + 1] = 0xC2  # claim progressive
        with pytest.raises(J.JpegError):
            J.decode_jpeg(bytes(prog))

    def test_media_stage_uses_real_jpeg_pixels(self, ray_session):
        """JPEG and PNG of the SAME smooth image must land near-identical
        features (both real pixel paths; JPEG is lossy so closeness, not
        equality), and far from the blake2b fake."""
        import pandas as pd
        import pyarrow as pa

        from medical_ocr_service_ray.functions.png import encode_png, image_features
        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        img = _gradient(20, 28)
        dec = MediaDecoderStub(op="features")
        batch = pd.DataFrame(
            {
                "item_id": [0, 1],
                "payload": [J.encode_jpeg(img, quality=95), encode_png(img)],
                "declared_mime": ["image/jpeg", "image/png"],
                "meta": [{"width": 20, "height": 28, "ms": 0}] * 2,
            }
        )
        out = dec(pa.Table.from_pandas(batch))
        feats = out["features"].to_pylist()
        want = image_features(img, MediaDecoderStub.FEATURE_DIM)
        assert np.allclose(feats[1], want, atol=1e-6)  # PNG exact
        # JPEG features come from real decoded pixels: close to the PNG's
        a, b = np.asarray(feats[0]), np.asarray(feats[1])
        assert float(np.abs(a - b).mean()) < 0.05
        assert not np.allclose(a, b, atol=1e-9)  # and genuinely lossy


class TestProgressiveJpeg:
    """SOF2 decode (T.81 Annex G): multi-scan spectral selection +
    successive approximation must reconstruct EXACTLY the coefficients a
    baseline scan of the same quantized image carries — so progressive and
    baseline decodes of the same source are bit-identical."""

    def test_bit_identical_to_baseline(self):
        rng = np.random.default_rng(7)
        for h, w in ((8, 8), (16, 16), (17, 9), (61, 83), (64, 48)):
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            base = J.decode_jpeg(J.encode_jpeg(img, quality=85))
            prog = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=85))
            assert prog.shape == (h, w, 3)
            assert (prog == base).all(), (h, w)

    def test_structured_image_and_qualities(self):
        img = _gradient(45, 37)
        for q in (30, 60, 95):
            base = J.decode_jpeg(J.encode_jpeg(img, quality=q))
            prog = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=q))
            assert (prog == base).all(), q

    def test_stream_is_really_progressive(self):
        payload = J.encode_jpeg_progressive(_gradient(16, 16), 85)
        assert b"\xff\xc2" in payload  # SOF2 marker
        assert payload.count(b"\xff\xda") == 8  # 2 DC + 3 AC first + 3 AC refine

    def test_refinement_paths_exercised(self):
        """White noise at high quality: dense ACs force ZRL runs, EOB runs,
        correction bits and newly-nonzero placements in the refine scans."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
        base = J.decode_jpeg(J.encode_jpeg(img, quality=95))
        prog = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=95))
        assert (prog == base).all()

    def test_media_stage_decodes_progressive_pixels(self, ray_session):
        """The q26 media path: a planted SOF2 payload must produce REAL-pixel
        features (identical to the baseline JPEG of the same image), not the
        blake2b fake."""
        import pandas as pd
        import pyarrow as pa

        from medical_ocr_service_ray.stages.multimodal import MediaDecoderStub

        img = _gradient(20, 28)
        dec = MediaDecoderStub(op="features")
        batch = pd.DataFrame(
            {
                "item_id": [0, 1],
                "payload": [
                    J.encode_jpeg_progressive(img, quality=95),
                    J.encode_jpeg(img, quality=95),
                ],
                "declared_mime": ["image/jpeg", "image/jpeg"],
                "meta": [{"width": 20, "height": 28, "ms": 0}] * 2,
            }
        )
        out = dec(pa.Table.from_pandas(batch))
        feats = out["features"].to_pylist()
        # same quantization tables -> same decoded pixels -> same features
        assert np.allclose(feats[0], feats[1], atol=1e-9)
