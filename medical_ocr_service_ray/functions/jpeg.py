"""Pure-stdlib JPEG codec: baseline (SOF0) AND progressive (SOF2) decode.

The last of the reference's raster formats to be un-stubbed
(src/services/image.service.js:186-240 — sharp decodes JPEG before resize/
feature work; this container has no pillow, so the codec is implemented
from the JPEG spec: ITU-T T.81 baseline sequential DCT + Annex G
progressive DCT).

Decoder: SOI -> DQT/DHT/SOF0|SOF2/DRI markers -> SOS entropy-coded
segment(s) (byte-stuffing removed), per-MCU huffman decode of DC deltas +
AC run-lengths in zig-zag order, dequantize, 8x8 IDCT as two matrix
products with the orthonormal DCT-II basis, upsample chroma, YCbCr -> RGB.
Restart markers honored. Progressive streams accumulate coefficients
across scans (spectral selection + successive approximation, including
the G.1.2.3 AC-refinement correction-bit algorithm and EOB runs), then
reconstruct once at EOI. Arithmetic coding and hierarchical (SOF3+)
remain declared unsupported.

Encoder (fixture path): quality-scaled Annex-K quantization tables,
standard Annex-K huffman tables, 4:4:4 (no subsampling), level-shifted
forward DCT via the same basis matrix. Lossy: tests assert closeness, not
equality.

JPEG entropy decode is inherently bit-serial per block; the per-payload
Python cost is real per-record compute (the same class as the HTML
extraction kernel), and media batches are deliberately small
(MEDIA_BATCH_SIZE) so an actor-pool stage stays memory- and
latency-bounded.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal DCT-II basis: X = C @ x @ C.T (forward), x = C.T @ X @ C (inverse)
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

# Annex K quantization tables (luminance, chrominance)
_QL = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int64,
)
_QC = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64,
)

# Annex K huffman tables: (bits[1..16], values)
_HT = {
    ("dc", 0): (
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)),
    ),
    ("dc", 1): (
        [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)),
    ),
    ("ac", 0): (
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
        [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
         0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
         0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
         0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
         0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
         0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
         0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
         0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
         0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
         0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
         0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
         0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
         0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
         0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
    ),
    ("ac", 1): (
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
        [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
         0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
         0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
         0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
         0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
         0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
         0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
         0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
         0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
         0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
         0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
         0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
         0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
         0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
    ),
}


def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, canonical huffman code assignment."""
    if len(bits) != 16 or sum(bits) > len(values):
        raise JpegError("truncated huffman table")
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length)."""
    dec = _build_decode_table(bits, values)
    return {v: (code, ln) for (ln, code), v in dec.items()}


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment (0xFF00 stuffing
    already handled by skipping the 0x00; restart markers handled by caller
    via reset())."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0  # pad: spec allows 1-fill/0-fill tail
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker (e.g. RSTn or EOI): caller must handle; pad
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_to_marker(self) -> int | None:
        """Drop bit buffer, scan to the next 0xFFxx marker, return xx."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                m = self.data[self.pos + 1]
                self.pos += 2
                return m
            self.pos += 1
        return None


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((ln, code))
        if v is not None:
            return v
    raise JpegError("bad huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG signed magnitude extension."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline (SOF0/1) or progressive (SOF2) JPEG to an (h, w, 3)
    uint8 RGB array. Grayscale expands to 3 channels. Raises JpegError on
    arithmetic/hierarchical/malformed streams."""
    data = bytes(payload)
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[str, int], dict] = {}
    frame = None
    restart_interval = 0
    coefs: list[np.ndarray] | None = None  # progressive coefficient store
    got_scan = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI (reached only on the progressive path)
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                o += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[o : o + 64], dtype=np.uint8).astype(np.int64)
                    o += 64
                else:
                    tbl = np.frombuffer(seg[o : o + 128], dtype=">u2").astype(np.int64)
                    o += 128
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = tbl
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                values = list(seg[o + 17 : o + 17 + nv])
                huff[("dc" if tc == 0 else "ac", th)] = _build_decode_table(bits, values)
                o += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], struct.unpack_from(">H", seg, 1)[0], struct.unpack_from(">H", seg, 3)[0], seg[5]
            if prec != 8:
                raise JpegError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
            if frame["progressive"]:
                coefs = _alloc_prog_coefs(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("only baseline/progressive huffman JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan = {}
            scan_ids = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cs] = (tdta >> 4, tdta & 0x0F)
                scan_ids.append(cs)
            if not frame["progressive"]:
                ecs = data[pos + seglen :]
                return _decode_scan(frame, scan, qt, huff, ecs, restart_interval)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ecs_start = pos + seglen
            end = _ecs_end(data, ecs_start)
            _decode_prog_scan(
                frame, coefs, scan, scan_ids, ss, se, ahal >> 4, ahal & 0x0F,
                huff, data[ecs_start:end], restart_interval,
            )
            got_scan = True
            pos = end
            continue
        pos += seglen
    if frame is not None and frame.get("progressive") and got_scan:
        return _reconstruct_progressive(frame, coefs, qt)
    raise JpegError("no SOS segment")


def _decode_scan(frame, scan, qt, huff, ecs, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if h == 0 or w == 0 or h * w > 64_000_000:
        raise JpegError("bad dimensions")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(ecs)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = br.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise JpegError("missing restart marker")
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dct = huff[("dc", td)]
                act = huff[("ac", ta)]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(br, dct)
                        diff = _extend(br.read_bits(t), t)
                        pred[ci] += diff
                        block[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            r, s = rs >> 4, rs & 0x0F
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise JpegError("AC index overflow")
                            block[k] = _extend(br.read_bits(s), s)
                            k += 1
                        zz = np.zeros(64, dtype=np.int64)
                        zz[ZIGZAG] = block
                        coeff = zz.reshape(8, 8) * q
                        pix = _C.T @ coeff @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    return _finish_planes(planes, comps, h, w, hmax, vmax)


def _finish_planes(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Shared decode tail: chroma upsample, crop, YCbCr -> RGB."""
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    if len(full) != 3:
        raise JpegError(f"unsupported component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.dstack([r, g, b]), 0, 255).astype(np.uint8)


def _frame_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return comps, hmax, vmax, mcux, mcuy


def _alloc_prog_coefs(frame) -> list[np.ndarray]:
    """Per-component coefficient store for progressive decode: MCU-padded
    block grid x 64 coefficients in ZIGZAG-scan order (int32 — successive
    approximation touches single bits, never overflows 2^15)."""
    comps, hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    if frame["h"] == 0 or frame["w"] == 0 or frame["h"] * frame["w"] > 64_000_000:
        raise JpegError("bad dimensions")
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32) for c in comps
    ]


def _comp_block_dims(frame, c) -> tuple[int, int]:
    """Non-interleaved scan block grid (T.81 A.1.1: ceil of the scaled
    component dimensions, NOT the MCU-padded grid)."""
    comps, hmax, vmax, _mx, _my = _frame_geometry(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _ecs_end(data: bytes, start: int) -> int:
    """Index just past a scan's entropy-coded bytes: the position of the
    next marker that is neither byte-stuffing (FF00) nor a restart."""
    i = start
    n = len(data)
    while i + 1 < n:
        if data[i] == 0xFF and data[i + 1] != 0x00 and not (0xD0 <= data[i + 1] <= 0xD7):
            return i
        i += 1
    return n


def _decode_prog_scan(
    frame, coefs, scan, scan_ids, ss, se, ah, al, huff, ecs, restart_interval
):
    """One progressive SOS (T.81 Annex G): DC scans may be interleaved,
    AC scans carry exactly one component; first passes (Ah=0) decode new
    magnitudes at bit position Al, refinements (Ah=Al+1) append one
    correction bit per touched coefficient (G.1.2.3)."""
    comps, hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    br = _BitReader(ecs)
    id2ci = {c["id"]: i for i, c in enumerate(comps)}

    def expect_restart(state):
        m = br.align_to_marker()
        if m is None or not (0xD0 <= m <= 0xD7):
            raise JpegError("missing restart marker")
        state["pred"] = [0] * len(comps)
        state["eobrun"] = 0

    state = {"pred": [0] * len(comps), "eobrun": 0}

    if ss == 0:  # DC scan
        if se != 0:
            raise JpegError("DC scan must have Se=0")
        units = 0
        if len(scan_ids) > 1:  # interleaved MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and units and units % restart_interval == 0:
                        expect_restart(state)
                    for cs in scan_ids:
                        ci = id2ci[cs]
                        c = comps[ci]
                        td = scan[cs][0]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                _dc_unit(
                                    br, coefs[ci], my * c["v"] + by,
                                    mx * c["h"] + bx, ah, al,
                                    huff.get(("dc", td)), state["pred"], ci,
                                )
                    units += 1
        else:
            ci = id2ci[scan_ids[0]]
            c = comps[ci]
            td = scan[scan_ids[0]][0]
            bh, bw = _comp_block_dims(frame, c)
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and units and units % restart_interval == 0:
                        expect_restart(state)
                    _dc_unit(
                        br, coefs[ci], by, bx, ah, al,
                        huff.get(("dc", td)), state["pred"], ci,
                    )
                    units += 1
        return

    # AC scan: exactly one component (T.81 G.1.1.1.1)
    if len(scan_ids) != 1:
        raise JpegError("progressive AC scan must be non-interleaved")
    ci = id2ci[scan_ids[0]]
    c = comps[ci]
    ta = scan[scan_ids[0]][1]
    act = huff.get(("ac", ta))
    if act is None:
        raise JpegError("missing AC huffman table")
    bh, bw = _comp_block_dims(frame, c)
    grid = coefs[ci]
    units = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and units and units % restart_interval == 0:
                expect_restart(state)
            if ah == 0:
                _ac_first_unit(br, grid[by, bx], ss, se, al, act, state)
            else:
                _ac_refine_unit(br, grid[by, bx], ss, se, al, act, state)
            units += 1


def _dc_unit(br, grid, by, bx, ah, al, dct, pred, ci):
    if ah == 0:  # first DC pass: new magnitude at bit Al
        if dct is None:
            raise JpegError("missing DC huffman table")
        t = _huff_decode(br, dct)
        pred[ci] += _extend(br.read_bits(t), t)
        grid[by, bx, 0] = pred[ci] << al
    else:  # refinement: one bit
        if br.read_bit():
            grid[by, bx, 0] |= 1 << al


def _ac_first_unit(br, block, ss, se, al, act, state):
    """G.1.2.2: first AC pass over band [Ss, Se] — run-lengths of zeros,
    new coefficients at magnitude << Al, EOB runs spanning blocks."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _huff_decode(br, act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.read_bits(r)
            break
        k += r
        if k > se:
            raise JpegError("AC index overflow")
        block[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _ac_refine_unit(br, block, ss, se, al, act, state):
    """G.1.2.3 AC refinement: correction bits for history-nonzero
    coefficients, ±1<<Al placements for newly-nonzero ones (libjpeg
    decode_mcu_AC_refine control flow)."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _huff_decode(br, act)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break
                # r == 15: run of 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("bad refinement magnitude")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                v = int(block[k])
                if v != 0:
                    if br.read_bit() and (v & p1) == 0:
                        block[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        if newval:
                            block[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if state["eobrun"] > 0:
        while k <= se:
            v = int(block[k])
            if v != 0 and br.read_bit() and (v & p1) == 0:
                block[k] = v + (p1 if v >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _reconstruct_progressive(frame, coefs, qt) -> np.ndarray:
    """Dequantize + IDCT every accumulated block at EOI — one vectorized
    einsum per component, no per-block Python."""
    comps, hmax, vmax, _mx, _my = _frame_geometry(frame)
    planes = []
    for ci, c in enumerate(comps):
        grid = coefs[ci]  # (bh, bw, 64) in zigzag order
        q = qt.get(c["tq"])
        if q is None:
            raise JpegError("missing quantization table")
        bh, bw = grid.shape[:2]
        nat = np.zeros((bh, bw, 64), dtype=np.int64)
        nat[..., ZIGZAG] = grid
        coeff = nat.reshape(bh, bw, 8, 8) * q
        pix = np.einsum("ij,xyjk,kl->xyil", _C.T, coeff.astype(np.float64), _C) + 128.0
        planes.append(pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _finish_planes(planes, comps, frame["h"], frame["w"], hmax, vmax)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill
        return bytes(self.out)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.clip((q * s + 50) // 100, 1, 255)
    return t.astype(np.int64)


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """Baseline 4:4:4 JPEG from an (h, w, 3) uint8 RGB array — Annex-K
    tables, standard huffman. Lossy by nature."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise JpegError("need (h, w, 3) uint8")
    h, w = img.shape[:2]
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    ql = np.zeros(64, dtype=np.int64)
    ql[ZIGZAG] = _quality_scale(_QL, quality)
    qc = np.zeros(64, dtype=np.int64)
    qc[ZIGZAG] = _quality_scale(_QC, quality)
    qlm, qcm = ql.reshape(8, 8), qc.reshape(8, 8)

    enc = {k: _build_encode_table(*v) for k, v in _HT.items()}

    out = bytearray(b"\xff\xd8")  # SOI
    for tq, tbl in ((0, _quality_scale(_QL, quality)), (1, _quality_scale(_QC, quality))):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(tbl[i]) for i in range(64)
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])  # 4:4:4
    for (kind, tid), (bits, values) in _HT.items():
        tc = 0 if kind == "dc" else 1
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([(tc << 4) | tid]) + bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tdta])
    out += b"\x00\x3f\x00"

    bw = _BitWriter()
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = []
    for p in (y, cb, cr):
        pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        planes.append(pad)
    pred = [0, 0, 0]
    for my in range(ph // 8):
        for mx in range(pw // 8):
            for ci, (p, qm, which) in enumerate(
                zip(planes, (qlm, qcm, qcm), (0, 1, 1))
            ):
                blk = p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
                coeff = _C @ blk @ _C.T
                qz = np.round(coeff / qm).astype(np.int64)
                zz = qz.reshape(-1)[ZIGZAG]
                dc_tab = enc[("dc", which)]
                ac_tab = enc[("ac", which)]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = 0 if diff == 0 else int(abs(diff)).bit_length()
                code, ln = dc_tab[t]
                bw.write(code, ln)
                if t:
                    bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
                run = 0
                last_nz = 63
                while last_nz > 0 and zz[last_nz] == 0:
                    last_nz -= 1
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_tab[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = int(abs(v)).bit_length()
                    code, ln = ac_tab[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_tab[0x00]  # EOB
                    bw.write(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _emit_sym(bw: _BitWriter, tab, sym: int) -> None:
    code, ln = tab[sym]
    bw.write(code, ln)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85) -> bytes:
    """Progressive (SOF2) 4:4:4 JPEG from an (h, w, 3) uint8 RGB array —
    the SOF2 fixture generator for decoder tests (no external encoder in
    this container). Six scans exercising every decoder path: interleaved
    DC first at Al=1, DC refinement, per-component AC first at Al=1
    (spectral band 1..63), per-component AC refinement (Ah=1, Al=0) with
    EOB runs capped at 1 so the Annex-K huffman tables suffice (only the
    0x00 EOB symbol among the s=0 codes is ever emitted). Point
    transforms follow T.81/libjpeg: arithmetic shift for DC,
    sign-magnitude shift for AC."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise JpegError("need (h, w, 3) uint8")
    h, w = img.shape[:2]
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    ql = np.zeros(64, dtype=np.int64)
    ql[ZIGZAG] = _quality_scale(_QL, quality)
    qc = np.zeros(64, dtype=np.int64)
    qc[ZIGZAG] = _quality_scale(_QC, quality)
    qms = (ql.reshape(8, 8), qc.reshape(8, 8), qc.reshape(8, 8))

    # quantized zigzag coefficients per component, block raster order
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    bh, bw_ = ph // 8, pw // 8
    zz_all = []
    for p, qm in zip((y, cb, cr), qms):
        pad = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blocks = pad.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
        coeff = np.einsum("ij,xyjk,kl->xyil", _C, blocks, _C.T)
        qz = np.round(coeff / qm).astype(np.int64).reshape(bh, bw_, 64)
        zz_all.append(qz[..., ZIGZAG])  # natural -> zigzag-scan order

    enc = {k: _build_encode_table(*v) for k, v in _HT.items()}

    out = bytearray(b"\xff\xd8")
    for tq, tbl in ((0, _quality_scale(_QL, quality)), (1, _quality_scale(_QC, quality))):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(tbl[i]) for i in range(64)
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, h, w, 3)  # SOF2
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    for (kind, tid), (bits, values) in _HT.items():
        tc = 0 if kind == "dc" else 1
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([(tc << 4) | tid]) + bytes(bits) + bytes(values)

    def sos_header(comp_specs, ss, se, ah, al) -> bytes:
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_specs), len(comp_specs))
        for cid, tdta in comp_specs:
            hdr += bytes([cid, tdta])
        return hdr + bytes([ss, se, (ah << 4) | al])

    def dc_scan(al_bit: int, refine: bool) -> bytes:
        bw = _BitWriter()
        pred = [0, 0, 0]
        for by in range(bh):
            for bx in range(bw_):
                for ci in range(3):
                    dc = int(zz_all[ci][by, bx, 0])
                    if not refine:
                        v = dc >> al_bit  # arithmetic shift (T.81 DC)
                        diff = v - pred[ci]
                        pred[ci] = v
                        t = 0 if diff == 0 else int(abs(diff)).bit_length()
                        _emit_sym(bw, enc[("dc", 0 if ci == 0 else 1)], t)
                        if t:
                            bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
                    else:
                        bw.write((dc >> al_bit) & 1, 1)
        return bw.flush()

    def ac_first(ci: int, al_bit: int) -> bytes:
        tab = enc[("ac", 0 if ci == 0 else 1)]
        bw = _BitWriter()
        for by in range(bh):
            for bx in range(bw_):
                blk = zz_all[ci][by, bx]
                run = 0
                emitted_any = False
                last = 63
                # sign-magnitude point transform: last nonzero AFTER shift
                mags = np.abs(blk[1:]) >> al_bit
                nz = np.nonzero(mags)[0]
                last = (nz[-1] + 1) if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(blk[k])
                    m = abs(v) >> al_bit
                    if m == 0:
                        run += 1
                        continue
                    while run > 15:
                        _emit_sym(bw, tab, 0xF0)
                        run -= 16
                    s = int(m).bit_length()
                    _emit_sym(bw, tab, (run << 4) | s)
                    sv = m if v > 0 else -m
                    bw.write(sv if sv > 0 else sv + (1 << s) - 1, s)
                    run = 0
                    emitted_any = True
                if last < 63 or not emitted_any:
                    _emit_sym(bw, tab, 0x00)  # EOB (run capped at 1)
        return bw.flush()

    def ac_refine(ci: int, al_bit: int) -> bytes:
        # libjpeg encode_mcu_AC_refine with EOBRUN forced to <=1 per block
        tab = enc[("ac", 0 if ci == 0 else 1)]
        bw = _BitWriter()
        for by in range(bh):
            for bx in range(bw_):
                blk = zz_all[ci][by, bx]
                absv = np.abs(blk) >> al_bit
                eob = 0
                for k in range(1, 64):
                    if absv[k] == 1:
                        eob = k
                run = 0
                pending: list[int] = []
                for k in range(1, 64):
                    m = int(absv[k])
                    if m == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eob:
                        _emit_sym(bw, tab, 0xF0)
                        run -= 16
                        for bit in pending:
                            bw.write(bit, 1)
                        pending = []
                    if m > 1:  # history coefficient: correction bit
                        pending.append(m & 1)
                        continue
                    # newly-nonzero (m == 1)
                    _emit_sym(bw, tab, (run << 4) | 1)
                    bw.write(1 if blk[k] > 0 else 0, 1)
                    for bit in pending:
                        bw.write(bit, 1)
                    pending = []
                    run = 0
                if run > 0 or pending:
                    _emit_sym(bw, tab, 0x00)  # EOBRUN = 1
                    for bit in pending:
                        bw.write(bit, 1)
        return bw.flush()

    # scan 1: DC first (interleaved, Al=1); scan 2: DC refine
    out += sos_header([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 1)
    out += dc_scan(1, refine=False)
    out += sos_header([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 1, 0)
    out += dc_scan(0, refine=True)
    # scans 3-5: AC first per component (Al=1); scans 6-8: AC refine
    for ci, cid in ((0, 1), (1, 2), (2, 3)):
        out += sos_header([(cid, 0x00 if ci == 0 else 0x01)], 1, 63, 0, 1)
        out += ac_first(ci, 1)
    for ci, cid in ((0, 1), (1, 2), (2, 3)):
        out += sos_header([(cid, 0x00 if ci == 0 else 0x01)], 1, 63, 1, 0)
        out += ac_refine(ci, 0)
    out += b"\xff\xd9"
    return bytes(out)
