"""Plain-text route: control-char strip + whitespace normalization.

Mirrors the reference's text normalizer semantics (lowercase-free variant of
src/services/embedding.service.js:200-206 whitespace collapse) applied as the
cleaning pass of the plain route.
"""

from __future__ import annotations

import re

# strip C0/C1 control chars except \n and \t
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
_INNER_WS_RE = re.compile(r"[ \t]+")


def extract_plain(text: str) -> tuple[str, list[str]]:
    """Return (clean_text, warnings): control chars stripped, each line
    whitespace-collapsed and trimmed, empty lines dropped."""
    warnings: list[str] = []
    cleaned = _CTRL_RE.sub("", text) if not text.isascii() or not text.isprintable() else text
    lines = []
    for raw in cleaned.split("\n"):
        # fast path: no runs to collapse
        if "  " in raw or "\t" in raw:
            line = _INNER_WS_RE.sub(" ", raw).strip()
        else:
            line = raw.strip()
        if line:
            lines.append(line)
    content = "\n".join(lines)
    if not content:
        warnings.append("empty_extraction")
    return content, warnings
