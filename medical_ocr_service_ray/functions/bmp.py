"""Pure-stdlib BMP codec: uncompressed BI_RGB 24/32-bit, bottom-up or
top-down rows. Joins functions/png.py and functions/audio.py as a real
decode path behind the media stage (reference behavior: sharp accepts and
normalizes whatever raster formats arrive, src/services/image.service.js:
186-240 — this container has no pillow, so formats are un-stubbed one
codec at a time).

BMP layout: 14-byte file header (``BM``, file size, pixel-data offset) +
BITMAPINFOHEADER (width, signed height — negative means top-down, bpp,
compression); pixel rows are BGR(A), each padded to a 4-byte boundary.
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    pass


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode to an (h, w, 3) uint8 RGB array. Raises BmpError on anything
    that isn't an uncompressed 24/32-bit BI_RGB bitmap."""
    data = bytes(payload)
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpError("not a BMP payload")
    pix_offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise BmpError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    if width <= 0 or height == 0:
        raise BmpError("bad dimensions")
    top_down = height < 0
    h = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    need = pix_offset + stride * h
    if len(data) < need:
        raise BmpError("truncated pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=pix_offset)
    rows = rows.reshape(h, stride)[:, : width * bytes_pp].reshape(h, width, bytes_pp)
    if not top_down:
        rows = rows[::-1]
    # BGR(A) -> RGB; alpha (if any) dropped
    return np.ascontiguousarray(rows[:, :, 2::-1])


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a bottom-up 24-bit BMP."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise BmpError("encode_bmp expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB->BGR
    pixels = rows.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return file_hdr + dib + pixels
