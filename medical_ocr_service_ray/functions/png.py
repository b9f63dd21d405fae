"""Pure-stdlib PNG decode/encode (zlib inflate + per-scanline filter
reconstruction) — un-stubs the image-decode path of ``MediaDecoderStub``
for one real format without adding dependencies.

Reference behavior being re-expressed: the service decodes and normalizes
image payload bytes before feature work (src/services/image.service.js:186-240
sharp resize/compress). This module implements the PNG subset that matters
for a data pipeline: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced. Anything else raises ``PngError``
(callers treat that as an undecodable payload, not a crash).

Decode hot path is vectorized per scanline with numpy: None/Up/Sub/Average/
Paeth filters; Sub/Average/Paeth carry pixel-recurrences along x, computed
per-scanline with a numpy carry loop over the row (x-loop in numpy ops per
PIXEL would be per-byte Python; we loop x once per row over ndarray slices,
which is the standard pure-python decoder shape — fine for the MB-class
payloads this stage handles at batch_size 16)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or unsupported PNG payload."""


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array. Raises PngError on
    malformed/unsupported input."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise PngError("payload is not bytes")
    data = bytes(data)
    if not data.startswith(_SIG):
        raise PngError("bad signature")

    width = height = None
    bit_depth = color_type = None
    palette: np.ndarray | None = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            if len(body) != 13:
                raise PngError("bad IHDR")
            width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise PngError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise PngError("unsupported compression/filter method")
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise PngError("bad PLTE")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise PngError("missing IHDR")
    if not idat:
        raise PngError("missing IDAT")
    if width == 0 or height == 0:
        raise PngError("zero-dimension image")

    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise PngError(f"IDAT inflate failed: {exc}") from None

    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise PngError("IDAT size mismatch")

    raw_arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw_arr[:, 0]
    rows = raw_arr[:, 1:].astype(np.int32)  # int32: filter math needs headroom
    out = np.zeros((height, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)

    for y in range(height):
        f = int(filters[y])
        cur = rows[y]
        if f == 0:  # None
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        elif f == 1:  # Sub: recurrence along x with lag = channels
            line = cur.copy()
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif f == 3:  # Average
            line = cur.copy()
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            line = cur.copy()
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise PngError(f"unknown filter {f}")
        out[y] = line
        prev = line

    img = out.astype(np.uint8).reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise PngError("palette index out of range")
        img = palette[idx]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, channels) uint8 -> PNG bytes (filter 0 every row,
    one zlib-deflated IDAT). Supports 1/2/3/4 channels."""
    arr = np.ascontiguousarray(np.asarray(img, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise PngError(f"unsupported array shape {arr.shape}")
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended per scanline
    raw = np.zeros((h, w * ch + 1), dtype=np.uint8)
    raw[:, 1:] = arr.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize (the deterministic, dependency-free analogue
    of the reference's sharp resize, image.service.js:186-240)."""
    h, w = img.shape[:2]
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray, dim: int = 64) -> np.ndarray:
    """Deterministic fixed-size features from real pixels: per-cell mean
    luminance over an 8x8 grid (dim=64), scaled to [0, 1]. Channel-agnostic:
    luminance = mean over channels."""
    if img.ndim == 3:
        lum = img.astype(np.float64).mean(axis=2)
    else:
        lum = img.astype(np.float64)
    side = int(np.sqrt(dim))
    assert side * side == dim, "dim must be a square number"
    h, w = lum.shape
    # integral-free block pooling via index binning (handles h,w < side too)
    ys = (np.arange(h) * side // max(h, 1)).clip(0, side - 1)
    xs = (np.arange(w) * side // max(w, 1)).clip(0, side - 1)
    sums = np.zeros((side, side), dtype=np.float64)
    counts = np.zeros((side, side), dtype=np.float64)
    np.add.at(sums, (ys[:, None].repeat(w, 1), xs[None, :].repeat(h, 0)), lum)
    np.add.at(counts, (ys[:, None].repeat(w, 1), xs[None, :].repeat(h, 0)), 1.0)
    counts[counts == 0] = 1.0
    return (sums / counts / 255.0).reshape(dim)
