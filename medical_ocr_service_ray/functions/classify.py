"""Content-type classification for turn payloads.

Reference semantics: extension->MIME mapping (src/services/gpt-vision.service.js:245-256)
plus magic-number sniffing of the payload prefix that never trusts a declared
type (src/middlewares/file-validator.middleware.js:28-136). Here the payload is
a text column, so the analogue is structure sniffing on the text itself:
``html`` (markup-dominant), ``pdfish`` (page-structured layout text), ``plain``.
"""

from __future__ import annotations

import re

# Tag opener for common HTML elements; three or more => markup-dominant.
_TAG_RE = re.compile(
    r"</?(?:html|head|body|div|p|a|span|ul|ol|li|nav|footer|header|table|tr|td|"
    r"h[1-6]|br|img|script|style|article|section|aside|main|title|strong|em|b|i)\b",
    re.IGNORECASE,
)
_PAGE_MARKER_RE = re.compile(r"^--- Page \d+ ---$", re.MULTILINE)

HTML = "html"
PDFISH = "pdfish"
PLAIN = "plain"


def classify_content_type(text: str) -> str:
    """Classify one turn payload by its structure (never by a declared type).

    Precedence mirrors the reference's magic-number check (prefix first, then
    structure): explicit HTML prologue > PDF-ish page structure > tag density
    > plain.
    """
    if not text:
        return PLAIN
    head = text.lstrip()[:64].lower()
    if head.startswith("<!doctype") or head.startswith("<html"):
        return HTML
    if head.startswith("%pdf") or "\f" in text or _PAGE_MARKER_RE.search(text):
        return PDFISH
    if len(_TAG_RE.findall(text)) >= 3:
        return HTML
    return PLAIN
