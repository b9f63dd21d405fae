"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's payloads ARE multimodal (base64 images / PDFs <= 10 MB inside
JSON rows, src/routes/v1/ordenes-batch.routes.js:38-48; sharp-based
normalization src/services/image.service.js:186-240; magic-number sniffing
src/middlewares/file-validator.middleware.js:28-136). This module carries the
Ray-side plumbing for binary media columns — schema, actor signature, batch
sizing, output layout — with the actual codec behind a clearly marked stub
(image/audio libraries are not in this container):

- ``sniff_media_batch``: magic-number MIME detection on the binary payload
  (M2) — real, pure Python.
- ``MediaDecoderStub``: actor-pool decode/feature stage. PNG payloads are
  decoded FOR REAL (pure-stdlib codec, functions/png.py: zlib inflate +
  per-scanline filter reconstruction), as are uncompressed 24/32-bit BMPs
  (functions/bmp.py) — features, resize and re-encode all operate on
  actual pixel data, as are GIFs (functions/gif.py: real LZW + interlace),
  uncompressed TIFFs (functions/tiff.py: both byte orders, multi-strip)
  and baseline JPEGs (functions/jpeg.py: huffman + IDCT, 4:4:4/4:2:0).
  Progressive JPEG / PDF-raster / video still lack a codec in
  this container: ``fake=True`` (default) produces deterministic
  pseudo-features (blake2b-seeded) so the distributed plumbing is fully
  testable; ``fake=False`` raises NotImplementedError("real decode needs
  pillow/ffmpeg") at the decode site.
- binary-payload batch sizing: media rows are MBs each, so stages run with
  small ``batch_size`` (default 16) to bound heap per task (M5 analogue of
  the 10 MB cap + compress-over-5MB rule).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("declared_mime", pa.string()),
        ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()), ("ms", pa.int32())])),
    ]
)

MEDIA_BATCH_SIZE = 16  # payloads are MB-class: keep batch x concurrency in heap

_MAGIC = (
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"BM", "image/bmp"),
    (b"GIF8", "image/gif"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
    (b"%PDF", "application/pdf"),
    (b"ID3", "audio/mpeg"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
)


def sniff_mime(payload: bytes | None) -> str:
    """Magic-number MIME detection — never trusts declared_mime (anti-spoof,
    file-validator.middleware.js:28-136). RIFF is a container: the form tag
    at bytes 8-12 splits WebP images from WAV audio (any other RIFF form is
    treated as WAV, the container's historical default here)."""
    if not payload:
        return "application/octet-stream"
    head = bytes(payload[:12])
    if head.startswith(b"RIFF"):
        return "image/webp" if head[8:12] == b"WEBP" else "audio/wav"
    for magic, mime in _MAGIC:
        if head.startswith(magic):
            return mime
    return "application/octet-stream"


def sniff_media_batch(batch: pa.Table) -> pa.Table:
    payloads = batch["payload"].to_pylist()
    sniffed = [sniff_mime(p) for p in payloads]
    declared = batch["declared_mime"].to_pylist()
    mismatch = [s != d for s, d in zip(sniffed, declared)]
    return batch.append_column("sniffed_mime", pa.array(sniffed, pa.string())).append_column(
        "mime_mismatch", pa.array(mismatch, pa.bool_())
    )


class MediaDecoderStub:
    """Actor-pool decode / feature-extract / resize / frame-sample stage.

    PNG payloads decode for real (pure-stdlib codec, functions/png.py) —
    reference behavior src/services/image.service.js:186-240 (sharp
    resize/compress before feature work) — as do uncompressed BMPs
    (functions/bmp.py), GIFs (functions/gif.py: general LZW, interlace,
    palettes), uncompressed TIFFs (functions/tiff.py: both byte orders,
    multi-strip), baseline JPEGs (functions/jpeg.py: huffman + IDCT, 4:4:4
    and 4:2:0) and RIFF/PCM WAV payloads (functions/audio.py). Digital PDFs
    decode their real TEXT layer (functions/pdfbin.py: FlateDecode content
    streams + BT/ET text operators); SCANNED PDFs decode their real RASTER
    (extract_pdf_images: DCTDecode via the baseline JPEG decoder,
    FlateDecode raw bitmaps — the in-container analogue of the reference's
    pdftoppm rasterize, pdf.service.js:17-109). Progressive JPEGs (SOF2)
    decode for real since round 5 (jpeg.py Annex-G multi-scan path, incl.
    successive approximation), as do lossless (VP8L) WebP payloads
    (functions/webp.py: full-spec decoder — the reference's sharp accepts
    .webp, gpt-vision.service.js:245-256). Remaining formats (video, lossy
    VP8 WebP, exotic PDF filters) are STUBBED
    (no pillow/ffmpeg in this container); the deterministic fake keeps every
    distributed aspect real: per-actor setup, small-batch processing,
    fixed-size feature output layout. A malformed PNG/WAV is an undecodable
    payload (PngError/WavError), not a crash: it takes the fake path."""

    FEATURE_DIM = 64

    def __init__(self, op: str = "features", fake: bool = True, target: tuple[int, int] = (224, 224)):
        assert op in ("features", "resize", "frame_sample")
        self.op = op
        self.fake = fake
        self.target = target

    def _decode_png(self, payload: bytes):
        """Real pixels for PNG payloads, None when this isn't a decodable PNG."""
        from medical_ocr_service_ray.functions import png as _png

        if not payload or not bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
            return None
        try:
            return _png.decode_png(payload)
        except _png.PngError:
            return None

    def _decode_bmp(self, payload: bytes):
        """Real pixels for uncompressed 24/32-bit BMPs (functions/bmp.py)."""
        from medical_ocr_service_ray.functions import bmp as _bmp

        if not payload or bytes(payload[:2]) != b"BM":
            return None
        try:
            return _bmp.decode_bmp(payload)
        except _bmp.BmpError:
            return None

    def _decode_jpeg(self, payload: bytes):
        """Real pixels for baseline AND progressive JPEGs (functions/jpeg.py:
        huffman + IDCT, 4:4:4 and 4:2:0, SOF2 multi-scan; arithmetic-coded
        raises -> fake path)."""
        from medical_ocr_service_ray.functions import jpeg as _jpeg

        if not payload or bytes(payload[:3]) != b"\xff\xd8\xff":
            return None
        try:
            return _jpeg.decode_jpeg(payload)
        except _jpeg.JpegError:
            return None

    def _decode_gif(self, payload: bytes):
        """Real pixels for GIF payloads (functions/gif.py: general LZW,
        interlace, global/local palettes; first frame of animations)."""
        from medical_ocr_service_ray.functions import gif as _gif

        if not payload or bytes(payload[:4]) != b"GIF8":
            return None
        try:
            return _gif.decode_gif(payload)
        except _gif.GifError:
            return None

    def _decode_tiff(self, payload: bytes):
        """Real pixels for uncompressed grayscale/RGB TIFFs
        (functions/tiff.py: both byte orders, multi-strip)."""
        from medical_ocr_service_ray.functions import tiff as _tiff

        if not payload or bytes(payload[:4]) not in (b"II*\x00", b"MM\x00*"):
            return None
        try:
            img = _tiff.decode_tiff(payload)
        except _tiff.TiffError:
            return None
        # grayscale -> (h, w, 3) so downstream features see one layout
        return np.repeat(img[:, :, None], 3, axis=2) if img.ndim == 2 else img

    def _decode_webp(self, payload: bytes):
        """Real pixels for lossless (VP8L) WebP payloads (functions/webp.py:
        full-spec decoder — prefix codes, meta prefix, color cache, LZ77,
        all four transforms). Lossy VP8 raises WebpError -> fake path."""
        from medical_ocr_service_ray.functions import webp as _webp

        if (
            not payload
            or bytes(payload[:4]) != b"RIFF"
            or bytes(payload[8:12]) != b"WEBP"
        ):
            return None
        try:
            return _webp.decode_webp(payload)
        except _webp.WebpError:
            return None

    def _decode_image(self, payload: bytes):
        """Any real raster codec that applies (PNG, BMP, GIF, TIFF, JPEG,
        WebP), else None."""
        for dec in (
            self._decode_png,
            self._decode_bmp,
            self._decode_gif,
            self._decode_tiff,
            self._decode_jpeg,
            self._decode_webp,
        ):
            img = dec(payload)
            if img is not None:
                return img
        return None

    def _decode_wav(self, payload: bytes):
        """Real samples for RIFF/PCM payloads, None when not decodable WAV."""
        from medical_ocr_service_ray.functions import audio as _audio

        if not payload or bytes(payload[:4]) != b"RIFF":
            return None
        try:
            return _audio.decode_wav(payload)
        except _audio.WavError:
            return None

    def _decode_pdf_text(self, payload: bytes):
        """Real text lines for digital PDFs (functions/pdfbin.py: object
        graph + FlateDecode + BT/ET text operators). A PDF with NO text
        layer (scanned) returns None so the raster path below gets a shot;
        encrypted/object-stream PDFs raise PdfBinError -> fallback."""
        from medical_ocr_service_ray.functions import pdfbin as _pdf

        if not payload or not bytes(payload[:4]) == b"%PDF":
            return None
        try:
            lines = _pdf.extract_pdf_text(payload)
        except _pdf.PdfBinError:
            return None
        return lines or None

    def _decode_pdf_images(self, payload: bytes):
        """Real pixels for SCANNED PDFs: embedded image XObjects decoded by
        the stdlib codecs (functions/pdfbin.py:extract_pdf_images —
        DCTDecode via the baseline JPEG decoder, FlateDecode raw raster).
        Closes the r3 gap where every scanned PDF took the fake path; the
        reference rasterizes these with pdftoppm (pdf.service.js:17-109).
        Returns the first page's raster (the scanned-page convention: one
        full-page image per page), None when not a decodable image PDF."""
        from medical_ocr_service_ray.functions import pdfbin as _pdf

        if not payload or not bytes(payload[:4]) == b"%PDF":
            return None
        try:
            imgs = _pdf.extract_pdf_images(payload)
        except _pdf.PdfBinError:
            return None
        return imgs[0] if imgs else None

    def _fake_features(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real media decode requires pillow/ffmpeg (not in this container); "
                "run with fake=True for the deterministic stand-in"
            )
        # deterministic pseudo-decode: blake2b(payload) seeds the "pixels"
        seed = int.from_bytes(hashlib.blake2b(payload or b"", digest_size=8).digest(), "big")
        return np.random.default_rng(seed).random(self.FEATURE_DIM, dtype=np.float64)

    def _features(self, payload: bytes) -> np.ndarray:
        from medical_ocr_service_ray.functions.png import image_features

        img = self._decode_image(payload)
        if img is not None:
            return image_features(img, self.FEATURE_DIM)
        wav = self._decode_wav(payload)
        if wav is not None:
            from medical_ocr_service_ray.functions.audio import audio_features

            return audio_features(*wav, dim=self.FEATURE_DIM)
        pdf_lines = self._decode_pdf_text(payload)
        if pdf_lines is not None:
            from medical_ocr_service_ray.functions.pdfbin import pdf_text_features

            return pdf_text_features(pdf_lines, dim=self.FEATURE_DIM)
        pdf_img = self._decode_pdf_images(payload)
        if pdf_img is not None:
            return image_features(pdf_img, self.FEATURE_DIM)
        return self._fake_features(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        if self.op == "features":
            feats = np.stack([self._features(p) for p in payloads]) if n else np.zeros((0, 64))
            col = pa.array(
                [list(map(float, f)) for f in feats], pa.list_(pa.float32(), self.FEATURE_DIM)
            )
            return pa.table(
                {"item_id": batch["item_id"], "features": col}
            )
        if self.op == "resize":
            from medical_ocr_service_ray.functions.png import encode_png, resize_nearest

            tw, th = self.target
            out_payloads, metas = [], []
            for p, old_meta in zip(payloads, batch["meta"].to_pylist()):
                img = self._decode_image(p)
                if img is not None:
                    # real pixel path: nearest-neighbor resize + re-encode
                    # (normalized container is PNG, whatever arrived)
                    out_payloads.append(encode_png(resize_nearest(img, tw, th)))
                    metas.append({"width": tw, "height": th, "ms": 0})
                else:
                    # no codec for this format: payload passthrough, meta
                    # records the target dims (plumbing-real stub path)
                    out_payloads.append(p)
                    metas.append({"width": tw, "height": th, "ms": 0})
            return pa.table(
                {
                    "item_id": batch["item_id"],
                    "payload": pa.array(out_payloads, pa.binary()),
                    "declared_mime": batch["declared_mime"],
                    "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
                }
            )
        # frame_sample: one row per sampled frame (every ~1000 ms of meta.ms)
        metas = batch["meta"].to_pylist()
        item_ids = batch["item_id"].to_pylist()
        out_id, out_frame = [], []
        for item, meta in zip(item_ids, metas):
            ms = (meta or {}).get("ms") or 0
            for f in range(max(1, ms // 1000)):
                out_id.append(item)
                out_frame.append(f)
        return pa.table(
            {
                "item_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int32()),
            }
        )


def media_pipeline(ds, op: str = "features", concurrency=(1, 4)):
    """Standard media stage wiring: actor pool + small batches."""
    return ds.map_batches(
        MediaDecoderStub,
        fn_constructor_kwargs={"op": op},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
    )


# Bump when synth_media_table's payload mix changes: the q26 serial-golden
# parquet is disk-cached per (corpus, EXTRACTOR_VERSION, THIS) — without the
# bump a machine with a warm cache would compare new fixtures against an old
# golden (queries_core._golden_fixture_dir keys the filename on it).
MEDIA_FIXTURE_VERSION = 2


def synth_media_table(n: int = 64, seed: int = 11) -> pa.Table:
    """Deterministic media fixture: REAL decodable JPEG/PNG/BMP/GIF/WAV/WebP
    payloads plus REAL PDFs — digital (text layer), scanned-flate and
    scanned-dct (image XObjects) — encoded with the stdlib codecs, so q26's
    features come from actual pixel/sample/text data; a slice of malformed
    %PDF / unknown payloads exercises the fallback path."""
    from medical_ocr_service_ray.functions.png import encode_png

    rng = np.random.default_rng(seed)
    payloads, mimes, metas = [], [], []
    from medical_ocr_service_ray.functions.audio import encode_wav

    pdf_i = 0
    magics = [b"\xff\xd8\xff", None, b"%PDF", b"JUNK", None, None, None, None]
    names = [
        "image/jpeg",
        "image/png",
        "application/pdf",
        "application/octet-stream",
        "audio/wav",
        "image/bmp",
        "image/gif",
        "image/webp",
    ]
    for i in range(n):
        k = int(rng.integers(0, 8))
        if k == 0:  # real JPEG: smooth gradient image (codec-friendly)
            from medical_ocr_service_ray.functions.jpeg import encode_jpeg

            h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
            base = rng.integers(0, 128, size=3)
            img = np.stack(
                [
                    base[0] + yy * (127.0 / max(h - 1, 1)),
                    base[1] + xx * (127.0 / max(w - 1, 1)),
                    base[2] + (yy + xx) * (127.0 / max(h + w - 2, 1)),
                ],
                axis=-1,
            ).astype(np.uint8)
            payloads.append(encode_jpeg(img, quality=85))
        elif k == 1:  # real PNG: random small RGB image
            h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_png(img))
        elif k == 5:  # real BMP: random small RGB image
            from medical_ocr_service_ray.functions.bmp import encode_bmp

            h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(img))
        elif k == 7:  # real lossless WebP (VP8L): random small RGB image
            from medical_ocr_service_ray.functions.webp import encode_webp

            h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_webp(img))
        elif k == 6:  # real GIF: palette image (some interlaced)
            from medical_ocr_service_ray.functions.gif import encode_gif

            h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            pal = rng.integers(0, 256, size=(int(rng.integers(2, 32)), 3), dtype=np.uint8)
            img = pal[rng.integers(0, len(pal), size=(h, w))]
            payloads.append(encode_gif(img, interlace=bool(rng.random() < 0.3)))
        elif k == 4:  # real WAV: short PCM16 sine + noise
            rate = int(rng.choice([8000, 16000]))
            t = np.arange(int(rate * rng.uniform(0.05, 0.3))) / rate
            wave = 0.5 * np.sin(2 * np.pi * float(rng.uniform(100, 2000)) * t)
            wave += 0.05 * rng.standard_normal(t.shape)
            payloads.append(encode_wav(wave, rate))
        elif k == 2:  # real PDFs: digital (text layer), scanned (flate/dct
            # image XObject), or malformed %PDF junk (fallback exercise) —
            # sub-kind CYCLES so all four kinds appear at any fixture size
            # with >= 4 PDF draws (a random sub-kind draw left the junk kind
            # absent from some sizes)
            from medical_ocr_service_ray.functions.pdfbin import (
                encode_pdf,
                encode_scanned_pdf,
            )

            r = (0.1, 0.4, 0.7, 0.9)[pdf_i % 4]
            pdf_i += 1
            if r < 0.3:
                n_lines = int(rng.integers(1, 6))
                lines = [
                    f"linea {j} doc {i} valor {int(rng.integers(0, 999))}"
                    for j in range(n_lines)
                ]
                payloads.append(encode_pdf([lines]))
            elif r < 0.6:
                h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
                img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                payloads.append(encode_scanned_pdf([img], codec="flate"))
            elif r < 0.85:
                h, w = int(rng.integers(16, 48)), int(rng.integers(16, 48))
                yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
                img = np.stack(
                    [yy * 255 / max(h - 1, 1), xx * 255 / max(w - 1, 1), (yy + xx) * 127 / max(h + w - 2, 1)],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(encode_scanned_pdf([img], codec="dct", quality=88))
            else:
                body = rng.integers(0, 256, size=int(rng.integers(500, 4000)), dtype=np.uint8).tobytes()
                payloads.append(b"%PDF" + body)
        else:
            body = rng.integers(0, 256, size=int(rng.integers(500, 4000)), dtype=np.uint8).tobytes()
            payloads.append(magics[k] + body)
        # 10% declared mismatches to exercise the anti-spoof flag
        mimes.append(names[(k + 1) % 8] if rng.random() < 0.1 else names[k])
        metas.append(
            {"width": int(rng.integers(100, 4000)), "height": int(rng.integers(100, 4000)),
             "ms": int(rng.integers(0, 10000))}
        )
    return pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "declared_mime": pa.array(mimes, pa.string()),
            "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
        },
        schema=pa.schema(
            [
                ("item_id", pa.int64()),
                ("payload", pa.binary()),
                ("declared_mime", pa.string()),
                ("meta", MEDIA_SCHEMA.field("meta").type),
            ]
        ),
    )


# ------------------------------------------------------- M18 ingest gate

# Upload-gate constants mirrored from the reference
# (src/utils/constants.js:22-32; sanitizer src/config/multer.config.js:15-19).
ALLOWED_MIME_TYPES = ("image/jpeg", "image/png", "application/pdf")
ALLOWED_EXTENSIONS = (".jpg", ".jpeg", ".png", ".pdf")
MAX_FILE_SIZE = 10 * 1024 * 1024  # 10 MB

_SANITIZE_RE = None


def sanitize_filename(name: str, payload: bytes | None = None) -> str:
    """Reference sanitizer semantics (multer.config.js:15-19): every char
    outside [a-zA-Z0-9.-] becomes '_', capped at 100 chars, prefixed with a
    unique id. The reference prefixes a uuid4; this engine derives the prefix
    from sha256(payload or name) so the same input always produces the same
    output (determinism is the engine-wide contract)."""
    global _SANITIZE_RE
    import hashlib
    import re as _re

    if _SANITIZE_RE is None:
        _SANITIZE_RE = _re.compile(r"[^a-zA-Z0-9.-]")
    safe = _SANITIZE_RE.sub("_", name or "")[:100]
    uid = hashlib.sha256(payload if payload is not None else (name or "").encode()).hexdigest()[:8]
    return f"{uid}-{safe}"


def ingest_gate_batch(batch: pa.Table, name_col: str = "filename") -> pa.Table:
    """Upload-validation analogue of the reference's multer fileFilter
    (multer.config.js:24-56 + constants.js:22-32): sanitize the filename,
    validate extension + declared MIME against the allow-lists and the
    payload size cap. Rejected rows are kept with a reject_reason (the
    dead-letter row pattern) instead of raising."""
    names = batch[name_col].to_pylist()
    payloads = batch["payload"].to_pylist() if "payload" in batch.column_names else [None] * len(names)
    mimes = (
        batch["declared_mime"].to_pylist()
        if "declared_mime" in batch.column_names
        else [""] * len(names)
    )
    safe, allowed, reason = [], [], []
    for n, p, m in zip(names, payloads, mimes):
        safe.append(sanitize_filename(n or "", p))
        ext_ok = any((n or "").lower().endswith(e) for e in ALLOWED_EXTENSIONS)
        mime_ok = m in ALLOWED_MIME_TYPES
        size_ok = p is None or len(p) <= MAX_FILE_SIZE
        if not mime_ok:
            allowed.append(False)
            reason.append(f"INVALID_FILE_TYPE:{m}")
        elif not ext_ok:
            allowed.append(False)
            reason.append("INVALID_EXTENSION")
        elif not size_ok:
            allowed.append(False)
            reason.append("FILE_TOO_LARGE")
        else:
            allowed.append(True)
            reason.append("")
    return (
        batch.append_column("safe_name", pa.array(safe, pa.string()))
        .append_column("allowed", pa.array(allowed, pa.bool_()))
        .append_column("reject_reason", pa.array(reason, pa.string()))
    )
