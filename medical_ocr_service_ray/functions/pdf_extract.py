"""Deterministic PDF-ish layout-text extraction.

Stand-in for the reference's PDF path (pdftoppm conversion + vision OCR,
src/services/pdf.service.js:17-109): page segmentation, running header/footer
removal, two-column reading-order recovery, table/figure span exclusion —
pure Python, deterministic (SURVEY.md §2.2 M3/M4).

The synthetic "pdfish" payload format (produced by ``synth.py``):
pages separated by form-feed or ``--- Page N ---`` markers; optional running
header/footer lines repeated on every page; ``Page N of M`` footers;
``[TABLE] ... [/TABLE]`` blocks and ``[FIGURE: ...]`` lines to exclude;
two-column regions where left and right cells are separated by 4+ spaces.
"""

from __future__ import annotations

import re

_PAGE_MARKER_RE = re.compile(r"^--- Page \d+ ---$")
_PAGENUM_RE = re.compile(r"^\s*(?:Page \d+(?: of \d+)?|-?\s*\d+\s*-?)\s*$")
_FIGURE_RE = re.compile(r"^\s*\[FIGURE[^\]]*\]\s*$")
_TABLE_OPEN = "[TABLE]"
_TABLE_CLOSE = "[/TABLE]"
_COLUMN_GAP_RE = re.compile(r"\s{4,}")
_WS_RE = re.compile(r"\s+")


def _split_pages(text: str) -> list[list[str]]:
    if text.lstrip()[:5].lower().startswith("%pdf"):
        text = text.lstrip()
        text = text[text.find("\n") + 1 :] if "\n" in text else ""
    pages: list[list[str]] = []
    cur: list[str] = []
    for chunk in text.split("\f"):
        for raw in chunk.split("\n"):
            if _PAGE_MARKER_RE.match(raw.strip()):
                if cur:
                    pages.append(cur)
                    cur = []
                continue
            if raw.strip():
                cur.append(raw.rstrip())
        if cur:
            pages.append(cur)
            cur = []
    return pages


def _running_lines(pages: list[list[str]]) -> set[str]:
    """Lines that repeat as first/last non-empty line on >= 2 pages are
    running headers/footers and are dropped."""
    if len(pages) < 2:
        return set()
    first: dict[str, int] = {}
    last: dict[str, int] = {}
    for lines in pages:
        a = lines[0].strip()
        b = lines[-1].strip()
        first[a] = first.get(a, 0) + 1
        last[b] = last.get(b, 0) + 1
    running = {k for k, v in first.items() if v >= 2}
    running |= {k for k, v in last.items() if v >= 2}
    return running


def _emit_columns(run: list[tuple[str, str]], out: list[str]) -> None:
    """Reading-order recovery: a contiguous run of 2-column lines reads as the
    full left column then the full right column."""
    if len(run) == 1:
        out.append(_WS_RE.sub(" ", f"{run[0][0]} {run[0][1]}").strip())
    else:
        out.extend(left for left, _ in run)
        out.extend(right for _, right in run)
    run.clear()


def extract_pdfish(text: str) -> tuple[str, list[str]]:
    """Return (reading_order_text, warnings)."""
    warnings: list[str] = []
    pages = _split_pages(text)
    running = _running_lines(pages)
    out: list[str] = []
    saw_table = False
    for lines in pages:
        in_table = False
        col_run: list[tuple[str, str]] = []
        for raw in lines:
            line = raw.strip()
            if line == _TABLE_OPEN:
                if col_run:
                    _emit_columns(col_run, out)
                in_table = True
                saw_table = True
                continue
            if line == _TABLE_CLOSE:
                in_table = False
                continue
            if in_table or _FIGURE_RE.match(line) or _PAGENUM_RE.match(line):
                continue
            if line in running:
                continue
            parts = _COLUMN_GAP_RE.split(raw.strip())
            if len(parts) == 2 and parts[0].strip() and parts[1].strip():
                col_run.append((parts[0].strip(), parts[1].strip()))
                continue
            if col_run:
                _emit_columns(col_run, out)
            out.append(_WS_RE.sub(" ", line))
        if col_run:
            _emit_columns(col_run, out)
        if in_table:
            warnings.append("unterminated_table")
    if saw_table:
        warnings.append("table_excluded")
    content = "\n".join(ln for ln in out if ln)
    if not content:
        warnings.append("empty_extraction")
    return content, warnings
