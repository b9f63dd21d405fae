"""Pure-stdlib WebP LOSSLESS (VP8L) codec: full-spec decoder + fixture encoder.

The reference accepts ``.webp`` uploads (src/services/gpt-vision.service.js:
245-256 — sharp decodes WebP before resize/feature work); this container has
no pillow/libwebp, so the codec is implemented from the public "WebP Lossless
Bitstream Specification". Decoder covers the full VP8L feature set: LSB-first
bit stream, canonical prefix codes (simple and code-length-coded, incl. the
max_symbol short-circuit), meta prefix (entropy image), color cache, LZ77
back-references with the 120-entry 2-D distance neighborhood map, and all
four transforms (predictor with its 14 modes, cross-color, subtract-green,
color-indexing incl. sub-byte pixel bundling) applied inverse in reverse
stream order. Lossy WebP (VP8 chunks) raises — declared out of scope (a full
VP8 intra decoder; the honest boundary, like video).

Encoder (fixture path): literal + run-LZ77 (distance=1) VP8L streams with
full code-length-coded prefix tables and optional subtract-green transform
and color cache (so the decoder's transform/cache paths get real roundtrip
coverage) — LOSSLESS, so tests assert exact pixel equality, unlike the JPEG
closeness tests.
"""

from __future__ import annotations

import struct

import numpy as np


class WebpError(ValueError):
    pass


# ----------------------------------------------------------------- bits

class _LsbReader:
    """LSB-first bit reader (DEFLATE-style), as VP8L specifies."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise WebpError("bitstream overrun")
            v |= ((self.data[byte] >> (self.bitpos & 7)) & 1) << i
            self.bitpos += 1
        return v

    def read_bit(self) -> int:
        byte = self.bitpos >> 3
        if byte >= len(self.data):
            raise WebpError("bitstream overrun")
        b = (self.data[byte] >> (self.bitpos & 7)) & 1
        self.bitpos += 1
        return b


class _LsbWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_bits(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# --------------------------------------------------------- prefix codes

def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (shorter first, then
    symbol order) — the DEFLATE/VP8L convention."""
    codes = {}
    code = 0
    for ln in range(1, 16):
        for sym in sorted(s for s, l in lengths.items() if l == ln):
            codes[sym] = (code, ln)
            code += 1
        code <<= 1
    return codes


class _PrefixCode:
    """Decode table: walk bit-by-bit, MSB of the code first."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: dict[int, int]):
        nz = {s: l for s, l in lengths.items() if l > 0}
        if len(nz) == 1:
            self.single = next(iter(nz))
            self.table = {}
            return
        self.single = None
        self.table = {(ln, code): sym for sym, (code, ln) in _canonical_codes(nz).items()}
        if not self.table:
            raise WebpError("empty prefix code")

    def decode(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise WebpError("bad prefix code")


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: _LsbReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():  # first symbol is 8 bits
            first = br.read_bits(8)
        else:
            first = br.read_bits(1)
        if num_symbols == 2:
            # two symbols, both length 1; canonical assignment by symbol
            # order (the libwebp BuildHuffmanTable convention)
            return _PrefixCode({first: 1, br.read_bits(8): 1})
        pc = _PrefixCode.__new__(_PrefixCode)
        pc.single = first
        pc.table = {}
        return pc
    num_clc = br.read_bits(4) + 4
    clc_lengths = {}
    for i in range(num_clc):
        ln = br.read_bits(3)
        if ln:
            clc_lengths[_CLC_ORDER[i]] = ln
    clc = _PrefixCode(clc_lengths)
    # optional cap on the number of coded symbols
    if br.read_bit():
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clc.decode(br)
        if s < 16:
            if s:
                lengths[sym] = s
                prev = s
            sym += 1
        elif s == 16:
            rep = 3 + br.read_bits(2)
            for _ in range(rep):
                if sym < alphabet_size:
                    lengths[sym] = prev
                    sym += 1
        elif s == 17:
            sym += 3 + br.read_bits(3)
        elif s == 18:
            sym += 11 + br.read_bits(7)
        else:
            raise WebpError("bad code-length symbol")
    return _PrefixCode(lengths)


# ------------------------------------------------------- LZ77 value coding

def _lz77_decode_value(br: _LsbReader, prefix_code: int) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.read_bits(extra) + 1


def _lz77_encode_value(v: int) -> tuple[int, int, int]:
    """value >= 1 -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    n = x.bit_length() - 1
    e = n - 1
    b = (x >> e) & 1
    return 2 * e + 2 + b, x - ((2 + b) << e), e


# the 120-entry 2-D neighborhood for short distances (spec table)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (4, 6), (-4, 6), (6, 4), (-6, 4),
    (7, 1), (-7, 1), (2, 7), (-2, 7), (7, 2), (-7, 2), (3, 7), (-3, 7),
    (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5), (8, 0), (4, 7),
    (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6), (-6, 6), (2, 8),
    (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3), (5, 8), (-5, 8),
    (6, 7), (-6, 7), (8, 4), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7),
    (8, 6), (8, 7),
]


def _plane_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


# --------------------------------------------------------------- decoder

_HASH_MUL = 0x1E35A7BD


def _decode_entropy_image(br: _LsbReader, w: int, h: int, allow_meta: bool) -> np.ndarray:
    """Decode one ARGB image (uint32 array h x w) from the current stream
    position, in spec order — <color cache info> first, then <meta prefix>
    (spatially-coded / main image only), prefix groups, LZ77 pixel loop."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError("bad color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    num_groups = 1
    if allow_meta and br.read_bit():
        meta_bits = br.read_bits(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta = _decode_entropy_image(br, mw, mh, allow_meta=False)
        num_groups = int(((meta >> 8) & 0xFFFFFF).max()) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )

    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    total = w * h
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            g = int(meta[y >> meta_bits, x >> meta_bits])
            grp = groups[(g >> 8) & 0xFFFFFF]
        else:
            grp = groups[0]
        s = grp[0].decode(br)
        if s < 256:  # literal
            r = grp[1].decode(br)
            b = grp[2].decode(br)
            a = grp[3].decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            pos += 1
            if cache_size:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 256 + 24:  # LZ77 back-reference
            length = _lz77_decode_value(br, s - 256)
            dcode = _lz77_decode_value(br, grp[4].decode(br))
            dist = _plane_distance(dcode, w)
            if dist > pos or pos + length > total:
                raise WebpError("bad back-reference")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache_size:
                    cache[(_HASH_MUL * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        else:  # color cache hit
            if not cache_size:
                raise WebpError("cache symbol without cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1
    return out.reshape(h, w)


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-channel (a+b)//2 on packed ARGB uint32 scalars/arrays."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _unpack(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 255, (p >> 16) & 255, (p >> 8) & 255, p & 255


def _pack(a: int, r: int, g: int, b: int) -> int:
    return ((a & 255) << 24) | ((r & 255) << 16) | ((g & 255) << 8) | (b & 255)


def _add_px(p: int, q: int) -> int:
    pa, pr, pg, pb = _unpack(p)
    qa, qr, qg, qb = _unpack(q)
    return _pack(pa + qa, pr + qr, pg + qg, pb + qb)


def _select(l: int, t: int, tl: int) -> int:
    la, lr, lg, lb = _unpack(l)
    ta, tr, tg, tb = _unpack(t)
    xa, xr, xg, xb = _unpack(tl)
    pa, pr, pg, pb = la + ta - xa, lr + tr - xr, lg + tg - xg, lb + tb - xb
    cost_l = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
    cost_t = abs(pa - ta) + abs(pr - tr) + abs(pg - tg) + abs(pb - tb)
    return l if cost_l <= cost_t else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 255) + ((t >> sh) & 255) - ((tl >> sh) & 255)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 255
        b = (tl >> sh) & 255
        v = a + int((a - b) / 2)  # C truncation toward zero
        out |= max(0, min(255, v)) << sh
    return out


def _apply_inverse_predictor(img: np.ndarray, pred_img: np.ndarray, bits: int) -> None:
    h, w = img.shape
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                img[0, 0] = _add_px(int(img[0, 0]), 0xFF000000)
                continue
            if y == 0:
                mode = 1  # L
            elif x == 0:
                mode = 2  # T
            else:
                mode = (int(pred_img[y >> bits, x >> bits]) >> 8) & 0xFF
            L = int(img[y, x - 1]) if x > 0 else 0
            T = int(img[y - 1, x]) if y > 0 else 0
            TL = int(img[y - 1, x - 1]) if (x > 0 and y > 0) else 0
            # TR addresses the linear array at pos - w + 1; for the rightmost
            # column that wraps to the current row's leftmost (already
            # decoded) pixel — the spec's scan-order addressing, not T.
            if y > 0 and x + 1 < w:
                TR = int(img[y - 1, x + 1])
            else:
                TR = int(img[y, 0])
            if mode == 0:
                p = 0xFF000000
            elif mode == 1:
                p = L
            elif mode == 2:
                p = T
            elif mode == 3:
                p = TR
            elif mode == 4:
                p = TL
            elif mode == 5:
                p = int(_avg2(np.uint64(_avg2(np.uint64(L), np.uint64(TR))), np.uint64(T)))
            elif mode == 6:
                p = int(_avg2(np.uint64(L), np.uint64(TL)))
            elif mode == 7:
                p = int(_avg2(np.uint64(L), np.uint64(T)))
            elif mode == 8:
                p = int(_avg2(np.uint64(TL), np.uint64(T)))
            elif mode == 9:
                p = int(_avg2(np.uint64(T), np.uint64(TR)))
            elif mode == 10:
                p = int(
                    _avg2(
                        np.uint64(_avg2(np.uint64(L), np.uint64(TL))),
                        np.uint64(_avg2(np.uint64(T), np.uint64(TR))),
                    )
                )
            elif mode == 11:
                p = _select(L, T, TL)
            elif mode == 12:
                p = _clamp_add_sub_full(L, T, TL)
            elif mode == 13:
                p = _clamp_add_sub_half(int(_avg2(np.uint64(L), np.uint64(T))), TL)
            else:
                raise WebpError(f"bad predictor mode {mode}")
            img[y, x] = _add_px(int(img[y, x]), p)


def _cte(v: int) -> int:
    """Signed int8 view of a color-transform element byte."""
    return v - 256 if v >= 128 else v


def _ctd(t: int, c: int) -> int:
    """Color-transform delta: (int8(t) * int8(c)) >> 5 (signed c too)."""
    return (_cte(t) * _cte(c)) >> 5


def _apply_inverse_color_transform(img: np.ndarray, cimg: np.ndarray, bits: int) -> None:
    h, w = img.shape
    for y in range(h):
        for x in range(w):
            cx = int(cimg[y >> bits, x >> bits])
            # spec: ColorTransformElement {green_to_red = blue byte,
            # green_to_blue = green byte, red_to_blue = red byte}
            g2r = cx & 255
            g2b = (cx >> 8) & 255
            r2b = (cx >> 16) & 255
            p = int(img[y, x])
            a, r, g, b = _unpack(p)
            r = (r + _ctd(g2r, g)) & 255
            b = (b + _ctd(g2b, g) + _ctd(r2b, r)) & 255
            img[y, x] = _pack(a, r, g, b)


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a lossless (VP8L) WebP to an (h, w, 3) uint8 RGB array.
    Raises WebpError on lossy VP8 / malformed containers (declared
    boundary: VP8 intra-frame decode is out of scope, like video)."""
    data = bytes(payload)
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a WebP payload")
    pos = 12
    vp8l = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            raise WebpError("lossy WebP (VP8) not supported — lossless only")
        pos += 8 + size + (size & 1)
    if vp8l is None:
        raise WebpError("no VP8L chunk")
    if not vp8l or vp8l[0] != 0x2F:
        raise WebpError("bad VP8L signature")
    br = _LsbReader(vp8l[1:])
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    br.read_bit()  # alpha hint
    if br.read_bits(3) != 0:
        raise WebpError("unsupported VP8L version")
    if h * w > 64_000_000:
        raise WebpError("bad dimensions")

    cur_w = w
    transforms = []  # (type, data, bits) in stream order
    seen = set()
    while br.read_bit():
        ttype = br.read_bits(2)
        if ttype in seen:
            raise WebpError("duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = br.read_bits(3) + 2
            tw = -(-cur_w // (1 << bits))
            th = -(-h // (1 << bits))
            transforms.append((0, _decode_entropy_image(br, tw, th, False), bits))
        elif ttype == 1:  # cross-color
            bits = br.read_bits(3) + 2
            tw = -(-cur_w // (1 << bits))
            th = -(-h // (1 << bits))
            transforms.append((1, _decode_entropy_image(br, tw, th, False), bits))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, 0))
        else:  # color indexing
            n_colors = br.read_bits(8) + 1
            pal_deltas = _decode_entropy_image(br, n_colors, 1, False)[0]
            palette = np.zeros(n_colors, dtype=np.uint32)
            acc = 0
            for i in range(n_colors):
                acc = _add_px(acc, int(pal_deltas[i]))
                palette[i] = acc
            if n_colors <= 2:
                pbits = 3  # 8 px/byte, 1 bit each
            elif n_colors <= 4:
                pbits = 2
            elif n_colors <= 16:
                pbits = 1
            else:
                pbits = 0
            transforms.append((3, (palette, pbits, cur_w), 0))
            if pbits:
                cur_w = -(-cur_w // (1 << pbits))

    img = _decode_entropy_image(br, cur_w, h, allow_meta=True).astype(np.uint64)

    for ttype, tdata, bits in reversed(transforms):
        if ttype == 3:  # color indexing
            palette, pbits, orig_w = tdata
            if pbits:
                per = 1 << pbits  # pixels per packed byte
                bw = 8 >> pbits  # bits per pixel
                unpacked = np.zeros((h, orig_w), dtype=np.uint64)
                for y in range(h):
                    for x in range(orig_w):
                        packed = int(img[y, x >> pbits])
                        idx = ((packed >> 8) & 255) >> ((x % per) * bw) & ((1 << bw) - 1)
                        if idx >= len(palette):
                            raise WebpError("palette index out of range")
                        unpacked[y, x] = palette[idx]
                img = unpacked
            else:
                idx = ((img >> np.uint64(8)) & np.uint64(255)).astype(np.int64)
                if (idx >= len(palette)).any():
                    raise WebpError("palette index out of range")
                img = palette[idx].astype(np.uint64)
        elif ttype == 2:  # add green
            g = (img >> np.uint64(8)) & np.uint64(255)
            r = (((img >> np.uint64(16)) & np.uint64(255)) + g) & np.uint64(255)
            b = ((img & np.uint64(255)) + g) & np.uint64(255)
            img = (img & np.uint64(0xFF00FF00)) | (r << np.uint64(16)) | b
        elif ttype == 1:
            _apply_inverse_color_transform(img, tdata, bits)
        else:
            _apply_inverse_predictor(img, tdata, bits)

    r = ((img >> np.uint64(16)) & np.uint64(255)).astype(np.uint8)
    g = ((img >> np.uint64(8)) & np.uint64(255)).astype(np.uint8)
    b = (img & np.uint64(255)).astype(np.uint8)
    return np.dstack([r, g, b])


# --------------------------------------------------------------- encoder

def _huff_lengths(hist: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Prefix code lengths from a histogram (heap huffman, depth-capped by
    a flat fallback — fixtures never hit it in practice)."""
    import heapq
    import itertools

    syms = [s for s, c in hist.items() if c > 0]
    if not syms:
        return {}
    if len(syms) == 1:
        return {syms[0]: 1}
    cnt = itertools.count()
    heap = [(hist[s], next(cnt), s) for s in syms]
    heapq.heapify(heap)
    parent: dict = {}
    while len(heap) > 1:
        c1, _, n1 = heapq.heappop(heap)
        c2, _, n2 = heapq.heappop(heap)
        node = ("n", next(cnt))
        parent[n1] = node
        parent[n2] = node
        heapq.heappush(heap, (c1 + c2, next(cnt), node))
    lengths = {}
    for s in syms:
        d = 0
        n = s
        while n in parent:
            n = parent[n]
            d += 1
        lengths[s] = d
    if max(lengths.values()) > max_len:  # flat fallback (complete by Kraft)
        bits = max(1, (len(syms) - 1).bit_length())
        lengths = {s: bits for s in syms}
    return lengths


def _write_prefix_code(bw: _LsbWriter, lengths: dict[int, int], alphabet_size: int) -> dict:
    """Emit a full (non-simple) code-length-coded prefix table; returns the
    symbol -> (code, len) encode table."""
    if len(lengths) == 1:
        sym = next(iter(lengths))
        bw.write_bits(1, 1)  # simple
        bw.write_bits(0, 1)  # one symbol
        if sym < 2:
            bw.write_bits(0, 1)
            bw.write_bits(sym, 1)
        else:
            bw.write_bits(1, 1)
            bw.write_bits(sym, 8)
        return {sym: (0, 0)}
    bw.write_bits(0, 1)  # not simple
    # literal code-length stream: one entry per alphabet symbol (0 for absent)
    seq = [lengths.get(s, 0) for s in range(alphabet_size)]
    while seq and seq[-1] == 0:
        seq.pop()
    clc_hist: dict[int, int] = {}
    for v in seq:
        clc_hist[v] = clc_hist.get(v, 0) + 1
    clc_len = _huff_lengths(clc_hist, max_len=7)
    bw.write_bits(19 - 4, 4)  # write all 19 code-length-code lengths
    for s in _CLC_ORDER:
        bw.write_bits(clc_len.get(s, 0), 3)
    clc_codes = _canonical_codes(clc_len)
    if len(clc_len) == 1:
        clc_codes = {next(iter(clc_len)): (0, 0)}
    # max_symbol cap: explicit, so trailing zeros need no symbols
    bw.write_bits(1, 1)
    length_nbits = 2 + 2 * 7  # 16 bits: enough for any alphabet here
    bw.write_bits(7, 3)
    bw.write_bits(len(seq) - 2, length_nbits)
    for v in seq:
        code, ln = clc_codes[v]
        # prefix codes are written MSB-first into the LSB-first stream:
        for i in range(ln - 1, -1, -1):
            bw.write_bits((code >> i) & 1, 1)
    enc = _canonical_codes({s: l for s, l in lengths.items() if l > 0})
    return enc


def _emit_code(bw: _LsbWriter, enc: dict, sym: int) -> None:
    code, ln = enc[sym]
    for i in range(ln - 1, -1, -1):
        bw.write_bits((code >> i) & 1, 1)


def encode_webp(img: np.ndarray, subtract_green: bool = False, cache_bits: int = 0) -> bytes:
    """LOSSLESS VP8L encode of an (h, w, 3) uint8 RGB array — the fixture
    generator (no libwebp in this container). Literal + run-LZ77
    (distance=1 for runs >= 6) coding with full code-length-coded prefix
    tables; optional subtract-green transform and color cache (exercising
    the decoder's transform/cache paths). Decode(encode(x)) == x exactly."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise WebpError("need (h, w, 3) uint8")
    if not 0 <= cache_bits <= 11:
        raise WebpError("cache_bits out of range")
    h, w = img.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise WebpError("dimensions out of VP8L range")
    r_p = img[..., 0].astype(np.uint32)
    g_p = img[..., 1].astype(np.uint32)
    b_p = img[..., 2].astype(np.uint32)
    if subtract_green:  # forward transform; decoder adds green back
        r_p = (r_p - g_p) & 255
        b_p = (b_p - g_p) & 255
    flat = ((np.uint32(255) << 24) | (r_p << 16) | (g_p << 8) | b_p).reshape(-1)

    # tokenize: literals + distance-1 runs + color-cache hits, with the
    # cache state simulated in stream order (decoder inserts on literal AND
    # on every backref-copied pixel; run pixels repeat an already-inserted
    # value, so skipping the run insert keeps the state identical)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache: list = [None] * cache_size  # None matches no uint32 pixel
    tokens = []  # ("lit", px) | ("run", length) | ("cache", idx)
    i = 0
    n = len(flat)
    while i < n:
        # a distance-1 run copies the PREVIOUS pixel forward starting at i
        if i > 0 and flat[i] == flat[i - 1]:
            rep = 1
            while i + rep < n and flat[i + rep] == flat[i - 1] and rep < 4096:
                rep += 1
            if rep >= 6:
                tokens.append(("run", rep))
                i += rep
                continue
        px = int(flat[i])
        if cache_size:
            idx = ((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == px:
                tokens.append(("cache", idx))
                i += 1
                continue
            cache[idx] = px
        tokens.append(("lit", px))
        i += 1

    # histograms
    gh: dict[int, int] = {}
    rh: dict[int, int] = {}
    bh: dict[int, int] = {}
    ah: dict[int, int] = {}
    dh: dict[int, int] = {}
    for kind, v in tokens:
        if kind == "lit":
            a, r, g, b = _unpack(v)
            gh[g] = gh.get(g, 0) + 1
            rh[r] = rh.get(r, 0) + 1
            bh[b] = bh.get(b, 0) + 1
            ah[a] = ah.get(a, 0) + 1
        elif kind == "cache":
            gh[256 + 24 + v] = gh.get(256 + 24 + v, 0) + 1
        else:
            lcode, _, _ = _lz77_encode_value(v)
            gh[256 + lcode] = gh.get(256 + lcode, 0) + 1
            dcode, _, _ = _lz77_encode_value(1 + 120)  # distance 1 -> code 121
            dh[dcode] = dh.get(dcode, 0) + 1
    for hist in (rh, bh, ah, dh):
        if not hist:
            hist[0] = 1

    bw = _LsbWriter()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)  # no alpha hint
    bw.write_bits(0, 3)  # version
    if subtract_green:
        bw.write_bits(1, 1)  # transform present
        bw.write_bits(2, 2)  # type 2 = subtract green
    bw.write_bits(0, 1)  # end of transforms
    if cache_bits:
        bw.write_bits(1, 1)  # color cache present (spec: before meta prefix)
        bw.write_bits(cache_bits, 4)
    else:
        bw.write_bits(0, 1)  # no color cache
    bw.write_bits(0, 1)  # no meta prefix
    enc_g = _write_prefix_code(bw, _huff_lengths(gh), 256 + 24 + cache_size)
    enc_r = _write_prefix_code(bw, _huff_lengths(rh), 256)
    enc_b = _write_prefix_code(bw, _huff_lengths(bh), 256)
    enc_a = _write_prefix_code(bw, _huff_lengths(ah), 256)
    enc_d = _write_prefix_code(bw, _huff_lengths(dh), 40)
    for kind, v in tokens:
        if kind == "lit":
            a, r, g, b = _unpack(v)
            _emit_code(bw, enc_g, g)
            _emit_code(bw, enc_r, r)
            _emit_code(bw, enc_b, b)
            _emit_code(bw, enc_a, a)
        elif kind == "cache":
            _emit_code(bw, enc_g, 256 + 24 + v)
        else:
            lcode, lextra, lbits = _lz77_encode_value(v)
            _emit_code(bw, enc_g, 256 + lcode)
            if lbits:
                bw.write_bits(lextra, lbits)
            dcode, dextra, dbits = _lz77_encode_value(121)
            _emit_code(bw, enc_d, dcode)
            if dbits:
                bw.write_bits(dextra, dbits)
    body = b"\x2f" + bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff
