"""Pure-stdlib GIF codec: real LZW decode (87a/89a, global or local palette,
interlaced or not; first frame of animations), plus a minimal valid encoder
for fixtures. Joins functions/png.py, bmp.py and audio.py as a real decode
path behind the media stage (reference behavior: sharp accepts whatever
raster arrives, src/services/image.service.js:186-240 — no pillow in this
container, so formats are un-stubbed one codec at a time).

GIF layout: 6-byte signature, logical screen descriptor (+ optional global
color table), then blocks: 0x21 extensions (skipped), 0x2C image descriptor
(+ optional local color table) followed by LZW-compressed color indices in
<=255-byte sub-blocks, 0x3B trailer. LZW codes are packed LSB-first with a
variable width that grows as the dictionary fills (max 12 bits); CLEAR
resets the dictionary, END terminates.

The encoder emits the classic "uncompressed GIF" stream: literal codes only,
with a CLEAR inserted before the dictionary would force a width change —
every decoder (including this one) must handle that per the spec.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    pass


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """GIF 4-pass interlace: rows appear in passes 0::8, 4::8, 2::4, 1::2."""
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """General GIF LZW decode -> uint8 index array of length ``expected``."""
    clear = 1 << min_code_size
    end = clear + 1
    # bitstream, LSB-first
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), bitorder="little")
    pos = 0
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    out = bytearray()
    nbits = len(bits)
    while pos + width <= nbits:
        code = 0
        for i in range(width):  # width <= 12: cheap
            code |= int(bits[pos + i]) << i
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("bad first code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the cScSc case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError("code out of range")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise GifError(f"short LZW stream: {len(out)} of {expected} pixels")
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode to an (h, w, 3) uint8 RGB array (first image of the stream).
    Raises GifError on anything that isn't a decodable GIF."""
    data = bytes(payload)
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if len(data) < pos + 3 * n:
            raise GifError("truncated global color table")
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        intro = data[pos]
        pos += 1
        if intro == 0x3B:  # trailer
            break
        if intro == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if intro != 0x2C:
            raise GifError(f"unexpected block 0x{intro:02x}")
        _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if len(data) < pos + 3 * n:
                raise GifError("truncated local color table")
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise GifError("no color table")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise GifError(f"bad LZW min code size {mcs}")
        lzw = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        if w <= 0 or h <= 0 or w * h > 64_000_000:
            raise GifError("bad dimensions")
        idx = _lzw_decode(bytes(lzw), mcs, w * h).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max()) >= len(pal):
            raise GifError("palette index out of range")
        return pal[idx]
    raise GifError("no image block")


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal valid GIF87a from an (h, w, 3) uint8 RGB array: the image is
    quantized to a 256-color palette (unique rows; fixtures use palette-
    friendly images), LZW stream is literals-only with periodic CLEARs."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise GifError("need (h, w, 3) uint8")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise GifError("more than 256 distinct colors; quantize first")
    pal_full = np.zeros((256, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    idx = inv.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate(
            [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
        )
        idx = idx[order]

    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # 256-entry GCT
    out += pal_full.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    mcs = 8
    clear, end = 256, 257
    out.append(mcs)
    # literals-only LZW: CLEAR, then <=254 9-bit literals, repeat; END last.
    codes: list[int] = [clear]
    for i, v in enumerate(idx.reshape(-1)):
        if i % 254 == 0 and i > 0:
            codes.append(clear)
        codes.append(int(v))
    codes.append(end)
    acc = 0
    nacc = 0
    stream = bytearray()
    for c in codes:
        acc |= c << nacc
        nacc += 9
        while nacc >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        stream.append(acc & 0xFF)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    return bytes(out)
