"""Pure-stdlib TIFF codec: uncompressed (Compression=1) baseline TIFF,
8-bit grayscale (PhotometricInterpretation 0/1) and RGB (2), both byte
orders, multi-strip. Joins png/bmp/gif/jpeg/audio as a real decode path
behind the media stage (reference behavior: sharp accepts and normalizes
whatever raster formats arrive, src/services/image.service.js:186-240 —
this container has no pillow, so formats are un-stubbed one codec at a
time).

TIFF layout: 8-byte header (``II*\\0`` little- or ``MM\\0*`` big-endian +
first-IFD offset) -> IFD = count + 12-byte tag entries + next-IFD offset;
pixel data lives in strips addressed by StripOffsets/StripByteCounts,
RowsPerStrip rows each, rows packed SamplesPerPixel bytes per pixel
(PlanarConfiguration=1, chunky).
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    pass


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i"}


def _read_ifd(data: bytes, off: int, bo: str) -> dict[int, list[int]]:
    if off + 2 > len(data):
        raise TiffError("truncated IFD")
    (n_entries,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = off + 2 + 12 * i
        if base + 12 > len(data):
            raise TiffError("truncated IFD entry")
        tag, typ, count = struct.unpack_from(bo + "HHI", data, base)
        if typ not in _TYPE_SIZE:
            continue  # unknown type: skip per spec
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            val_off = base + 8
        else:
            (val_off,) = struct.unpack_from(bo + "I", data, base + 8)
        if typ in _TYPE_FMT:
            fmt = bo + str(count) + _TYPE_FMT[typ]
            if val_off + struct.calcsize(fmt) > len(data):
                raise TiffError("tag value out of bounds")
            tags[tag] = list(struct.unpack_from(fmt, data, val_off))
        # RATIONAL / ASCII tags aren't needed for raster assembly
    return tags


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode to (h, w) uint8 grayscale or (h, w, 3) uint8 RGB. Raises
    TiffError on compressed/planar/tiled/deep variants."""
    data = bytes(payload)
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise TiffError("not a TIFF payload")
    bo = "<" if data[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(bo + "HI", data, 2)
    if magic != 42:
        raise TiffError("bad TIFF magic")
    tags = _read_ifd(data, ifd_off, bo)

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise TiffError(f"missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    planar = one(284, 1)
    if compression != 1:
        raise TiffError(f"unsupported compression {compression}")
    if planar != 1:
        raise TiffError("planar TIFF unsupported")
    if any(b != 8 for b in bits):
        raise TiffError(f"unsupported bit depth {bits}")
    if (photometric in (0, 1) and spp != 1) or (photometric == 2 and spp != 3):
        raise TiffError(f"photometric {photometric} with {spp} samples unsupported")
    if photometric not in (0, 1, 2):
        raise TiffError(f"unsupported photometric {photometric}")
    if w <= 0 or h <= 0:
        raise TiffError("bad dimensions")

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("missing strip layout")
    buf = bytearray()
    for o, c in zip(offsets, counts):
        if o + c > len(data):
            raise TiffError("truncated strip")
        buf += data[o : o + c]
    need = w * h * spp
    if len(buf) < need:
        raise TiffError("pixel data short")
    arr = np.frombuffer(bytes(buf[:need]), dtype=np.uint8)
    if spp == 1:
        img = arr.reshape(h, w)
        if photometric == 0:  # WhiteIsZero: invert to the usual convention
            img = 255 - img
        return np.ascontiguousarray(img)
    return np.ascontiguousarray(arr.reshape(h, w, 3))


def encode_tiff(img: np.ndarray, *, big_endian: bool = False, rows_per_strip: int | None = None) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as uncompressed TIFF
    (fixtures + sink). Multi-strip when ``rows_per_strip`` is given."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w, spp, photometric = *img.shape, 1, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        spp, photometric = 3, 2
    else:
        raise TiffError("encode_tiff expects (h,w) or (h,w,3) uint8")
    bo = ">" if big_endian else "<"
    rps = rows_per_strip or h
    strips = [img[r : r + rps].tobytes() for r in range(0, h, rps)]

    entries: list[tuple[int, int, int, list[int]]] = []  # tag, type, count, values

    def add(tag: int, typ: int, values: list[int]):
        entries.append((tag, typ, len(values), values))

    add(256, 3, [w])
    add(257, 3, [h])
    add(258, 3, [8] * spp)
    add(259, 3, [1])
    add(262, 3, [photometric])
    add(273, 4, [0] * len(strips))  # patched below
    add(277, 3, [spp])
    add(278, 3, [min(rps, h)])
    add(279, 4, [len(s) for s in strips])
    add(284, 3, [1])
    entries.sort()

    # layout: header(8) + IFD + overflow values + strips
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()

    def value_bytes(typ: int, values: list[int]) -> bytes:
        return struct.pack(bo + str(len(values)) + _TYPE_FMT[typ], *values)

    # first pass: sizes of overflow values
    fixed: list[tuple[int, int, int, bytes | int]] = []
    for tag, typ, count, values in entries:
        raw = value_bytes(typ, values)
        if len(raw) <= 4:
            fixed.append((tag, typ, count, raw.ljust(4, b"\x00")))
        else:
            fixed.append((tag, typ, count, overflow_off + len(overflow)))
            overflow += raw
    strip0 = overflow_off + len(overflow)
    # patch StripOffsets now that the data start is known
    offs, pos = [], strip0
    for s in strips:
        offs.append(pos)
        pos += len(s)
    out = bytearray()
    out += struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, ifd_off)
    out += struct.pack(bo + "H", len(fixed))
    overflow2 = bytearray(overflow)
    for tag, typ, count, val in fixed:
        if tag == 273:
            raw = value_bytes(4, offs)
            if len(raw) <= 4:
                val = raw.ljust(4, b"\x00")
            else:
                # the placeholder already reserved identical space in overflow
                off = val if isinstance(val, int) else None
                overflow2[off - overflow_off : off - overflow_off + len(raw)] = raw
        out += struct.pack(bo + "HHI", tag, typ, count)
        out += val if isinstance(val, bytes) else struct.pack(bo + "I", val)
    out += struct.pack(bo + "I", 0)  # no next IFD
    out += overflow2
    for s in strips:
        out += s
    return bytes(out)
