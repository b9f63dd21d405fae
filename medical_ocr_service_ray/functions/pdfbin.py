"""Real PDF BINARY text extraction — pure stdlib (zlib IS the stdlib half of
FlateDecode), no poppler/pdftoppm in this container.

Reference behavior: src/services/pdf.service.js:17-109 rasterizes PDFs with
pdftoppm and OCRs the images; the honest no-deps equivalent implemented here
decodes the text layer a digital PDF actually carries: parse the object
graph, inflate FlateDecode content streams, and evaluate the text-showing
operators (Tj / TJ / ' / ") inside BT..ET blocks, emitting a newline on the
line-motion operators (Td / TD / T* / ').

Scope (documented, tested): classic xref PDFs with uncompressed or
FlateDecode content streams and literal `(..)` / hex `<..>` strings —
exactly what ``encode_pdf`` produces and what simple digital PDFs contain.
Encrypted PDFs, object streams (/ObjStm), CCITT/DCT image-only pages and
exotic filters raise ``PdfBinError`` and take the caller's fallback path
(scanned PDFs have no text layer at all — those genuinely need the
rasterize+OCR pipeline the reference runs).
"""

from __future__ import annotations

import re
import zlib

import numpy as np


class PdfBinError(ValueError):
    pass


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)


def _content_streams(payload: bytes) -> list[bytes]:
    """All decodable stream payloads in object order."""
    if not payload.startswith(b"%PDF"):
        raise PdfBinError("not a PDF (missing %PDF header)")
    if b"/Encrypt" in payload:
        raise PdfBinError("encrypted PDF")
    out = []
    for m in _OBJ_RE.finditer(payload):
        body = m.group(3)
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        head = body[: sm.start()]
        data = sm.group(1)
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error as exc:
                raise PdfBinError(f"bad FlateDecode stream: {exc}") from exc
        elif b"/Filter" in head:
            # some other filter (DCT, CCITT, ...) — not a text content stream
            continue
        out.append(data)
    return out


def _unescape_literal(raw: bytes) -> str:
    """PDF literal-string unescape: \\n \\r \\t \\b \\f \\( \\) \\\\ and
    up-to-3-digit octal codes; a backslash-newline is a line continuation."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C:  # backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        e = raw[i]
        simple = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12, 0x28: 40, 0x29: 41, 0x5C: 92}
        if e in simple:
            out.append(simple[e])
            i += 1
        elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
            j = i
            while j < n and j < i + 3 and 0x30 <= raw[j] <= 0x37:
                j += 1
            out.append(int(raw[i:j], 8) & 0xFF)
            i = j
        elif e in (0x0A, 0x0D):  # line continuation
            i += 1
            if e == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:
            out.append(e)
            i += 1
    return out.decode("latin-1")


def _read_literal(data: bytes, i: int) -> tuple[str, int]:
    """data[i] == '(' — return (text, index after closing paren), honoring
    nesting and escapes."""
    depth = 0
    j = i
    n = len(data)
    while j < n:
        c = data[j]
        if c == 0x5C:
            j += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return _unescape_literal(data[i + 1 : j]), j + 1
        j += 1
    raise PdfBinError("unterminated literal string")


def _read_hex(data: bytes, i: int) -> tuple[str, int]:
    j = data.find(b">", i)
    if j < 0:
        raise PdfBinError("unterminated hex string")
    hx = re.sub(rb"\s", b"", data[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), j + 1
    except (UnicodeDecodeError, ValueError) as exc:
        # junk bytes inside <..> (malformed / binary garbage posing as a
        # hex string) must degrade as PdfBinError, not escape the parser
        raise PdfBinError(f"bad hex string: {exc}") from exc


_NEWLINE_OPS = {b"Td", b"TD", b"T*"}


def _extract_from_stream(data: bytes) -> list[str]:
    """Evaluate text operators inside BT..ET blocks of one content stream.
    Returns text lines (a line break per Td/TD/T*/' motion)."""
    lines: list[str] = []
    cur: list[str] = []
    pos = 0
    n = len(data)

    def flush():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while True:
        bt = data.find(b"BT", pos)
        if bt < 0:
            break
        et = data.find(b"ET", bt + 2)
        if et < 0:
            et = n
        block = data[bt + 2 : et]
        i = 0
        bn = len(block)
        pending: list[str] = []  # strings seen since the last operator
        while i < bn:
            c = block[i]
            if c == 0x28:  # (
                s, i = _read_literal(block, i)
                pending.append(s)
                continue
            if c == 0x3C and not block.startswith(b"<<", i):  # <hex>
                s, i = _read_hex(block, i)
                pending.append(s)
                continue
            tok = None
            if block.startswith(b"TJ", i) or block.startswith(b"Tj", i):
                tok = block[i : i + 2]
            elif block.startswith(b"TD", i) or block.startswith(b"Td", i):
                tok = block[i : i + 2]
            elif block.startswith(b"T*", i):
                tok = b"T*"
            elif c in (0x27, 0x22):  # ' or "
                tok = block[i : i + 1]
            if tok in (b"Tj", b"TJ"):
                cur.extend(pending)
                pending.clear()
                i += 2
                continue
            if tok in _NEWLINE_OPS:
                flush()
                pending.clear()  # positional args were numbers, not text
                i += len(tok)
                continue
            if tok in (b"'", b'"'):
                flush()
                cur.extend(pending)
                pending.clear()
                i += 1
                continue
            i += 1
        flush()
        pos = et + 2
    return lines


def extract_pdf_text(payload: bytes) -> list[str]:
    """All text lines across the PDF's content streams, document order."""
    streams = _content_streams(payload)
    lines: list[str] = []
    for s in streams:
        lines.extend(_extract_from_stream(s))
    return lines


def pdf_text_features(lines: list[str], dim: int = 64) -> np.ndarray:
    """Deterministic feature vector from extracted text: L1-normalized
    byte-bigram-folded histogram (same spirit as png.image_features — a
    stand-in for a real embedding model, but computed from REAL content)."""
    h = np.zeros(dim, dtype=np.float64)
    raw = "\n".join(lines).encode("utf-8")
    if len(raw):
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
        idx = (arr[:-1] * 31 + arr[1:]) % dim if len(arr) > 1 else arr % dim
        np.add.at(h, idx, 1.0)
        h /= h.sum() or 1.0
    return h


# ---------------------------------------------------------------- encoder

def encode_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """Minimal REAL classic-xref PDF: Catalog → Pages → one Page + one
    FlateDecode (or raw) content stream per page, Helvetica. Used for test
    fixtures; the output opens in standard viewers."""
    objs: list[bytes] = []  # 1-indexed object bodies (without "N 0 obj")

    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    font_num = 3 + 2 * n_pages
    for i, lines in enumerate(pages):
        page_num = 3 + 2 * i
        stream_num = page_num + 1
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {stream_num} 0 R >>"
            ).encode()
        )
        parts = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                parts.append(b"0 -14 Td")
            esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            parts.append(b"(" + esc.encode("latin-1") + b") Tj")
        parts.append(b"ET")
        content = b" ".join(parts)
        if compress:
            data = zlib.compress(content)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            data = content
            head = f"<< /Length {len(data)} >>".encode()
        objs.append(head + b"\nstream\n" + data + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ------------------------------------------------------- image XObjects (r4)

_INT_KEY_RE = {
    k: re.compile(rb"/" + k.encode() + rb"\s+(\d+)")
    for k in ("Width", "Height", "BitsPerComponent")
}


def _dict_int(head: bytes, key: str) -> int | None:
    m = _INT_KEY_RE[key].search(head)
    return int(m.group(1)) if m else None


def extract_pdf_images(payload: bytes) -> list[np.ndarray]:
    """Embedded image XObjects (/Subtype /Image) decoded to uint8 pixel
    arrays ((h, w, 3) RGB or (h, w) gray) — the SCANNED-PDF path: a scanned
    page is one full-page DCTDecode (JPEG) or FlateDecode (raw raster)
    image and no text layer. DCT streams feed the pure-stdlib baseline JPEG
    decoder (functions/jpeg.py); Flate streams reshape by /Width /Height
    /ColorSpace (8-bit DeviceRGB/DeviceGray, no predictor). Reference
    behavior: src/services/pdf.service.js:17-109 rasterizes every PDF at
    300 DPI before OCR; this recovers the raster a scanned PDF already
    carries, with zero new dependencies. Unsupported filters / predictors /
    bit depths raise PdfBinError (caller falls back)."""
    if not payload.startswith(b"%PDF"):
        raise PdfBinError("not a PDF (missing %PDF header)")
    if b"/Encrypt" in payload:
        raise PdfBinError("encrypted PDF")
    imgs: list[np.ndarray] = []
    for m in _OBJ_RE.finditer(payload):
        body = m.group(3)
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        head = body[: sm.start()]
        if b"/Subtype" not in head or b"/Image" not in head:
            continue
        w, h = _dict_int(head, "Width"), _dict_int(head, "Height")
        bpc = _dict_int(head, "BitsPerComponent") or 8
        if not w or not h:
            raise PdfBinError("image XObject missing /Width or /Height")
        data = sm.group(1)
        if b"/DCTDecode" in head:
            from medical_ocr_service_ray.functions.jpeg import JpegError, decode_jpeg

            try:
                imgs.append(decode_jpeg(bytes(data)))
            except JpegError as exc:
                raise PdfBinError(f"bad DCTDecode stream: {exc}") from exc
            continue
        if b"/FlateDecode" in head:
            if b"/Predictor" in head:
                raise PdfBinError("PNG/TIFF predictors not supported")
            if bpc != 8:
                raise PdfBinError(f"unsupported BitsPerComponent {bpc}")
            try:
                raw = zlib.decompress(data)
            except zlib.error as exc:
                raise PdfBinError(f"bad FlateDecode image: {exc}") from exc
            if b"/DeviceRGB" in head:
                ch = 3
            elif b"/DeviceGray" in head:
                ch = 1
            else:
                raise PdfBinError("unsupported /ColorSpace")
            if len(raw) != w * h * ch:
                raise PdfBinError(
                    f"image data length {len(raw)} != {w}x{h}x{ch}"
                )
            arr = np.frombuffer(raw, dtype=np.uint8)
            imgs.append(arr.reshape(h, w, ch) if ch == 3 else arr.reshape(h, w))
            continue
        raise PdfBinError("unsupported image filter")
    return imgs


def encode_scanned_pdf(
    images: list[np.ndarray], codec: str = "flate", quality: int = 85
) -> bytes:
    """Minimal REAL scanned-style PDF: one page per image, each page's sole
    content a full-page /Im0 Do of an image XObject — no text layer, like a
    scanner's output. ``codec='flate'`` stores raw 8-bit pixels under
    FlateDecode (lossless round-trip); ``codec='dct'`` embeds a real
    baseline JPEG (functions/jpeg.py encoder). Test-fixture producer, opens
    in standard viewers."""
    if codec not in ("flate", "dct"):
        raise ValueError(f"codec must be 'flate' or 'dct', got {codec!r}")
    objs: list[bytes] = []
    n_pages = len(images)
    kids = " ".join(f"{3 + 3 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())  # 2
    for i, img in enumerate(images):
        img = np.asarray(img, dtype=np.uint8)
        h, w = img.shape[:2]
        gray = img.ndim == 2
        page_num = 3 + 3 * i
        content_num, xobj_num = page_num + 1, page_num + 2
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}] "
                f"/Resources << /XObject << /Im0 {xobj_num} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        content = f"q {w} 0 0 {h} 0 0 cm /Im0 Do Q".encode()
        objs.append(
            f"<< /Length {len(content)} >>".encode()
            + b"\nstream\n"
            + content
            + b"\nendstream"
        )
        if codec == "dct":
            from medical_ocr_service_ray.functions.jpeg import encode_jpeg

            data = encode_jpeg(img if not gray else np.repeat(img[:, :, None], 3, 2), quality=quality)
            filt, cs = b"/DCTDecode", b"/DeviceRGB"
        else:
            data = zlib.compress(img.tobytes())
            filt, cs = b"/FlateDecode", b"/DeviceGray" if gray else b"/DeviceRGB"
        objs.append(
            (
                b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                b"/ColorSpace %s /BitsPerComponent 8 /Filter %s /Length %d >>"
                % (w, h, cs, filt, len(data))
            )
            + b"\nstream\n"
            + data
            + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)
