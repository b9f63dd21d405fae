"""Deterministic HTML main-content extraction (boilerplate strip).

This is the new engine's stand-in for the reference's LLM extraction core
(src/services/gpt-vision.service.js:15-158): a Readability-style block scorer
built on the stdlib HTMLParser — DOM tree build, tag-density and
text-to-link-ratio heuristics, block scoring — fully deterministic so golden
equality is achievable (SURVEY.md §2.2 M6).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

# Elements whose entire subtree is invisible boilerplate.
_DROP_TAGS = frozenset(
    {"script", "style", "noscript", "head", "nav", "footer", "header", "aside",
     "form", "button", "iframe", "svg", "template"}
)
# class/id hints that mark a subtree as chrome (Readability-style negative hints).
_DROP_HINT_RE = re.compile(
    r"(?:^|[\s_-])(?:nav|menu|footer|header|sidebar|side-bar|advert|ads?|banner|"
    r"comment|share|social|breadcrumb|promo|related)(?:$|[\s_-])",
    re.IGNORECASE,
)
# Block-level elements: each contributes its text as one output line.
_BLOCK_TAGS = frozenset(
    {"p", "div", "article", "section", "main", "li", "td", "th", "tr",
     "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol",
     "table", "body", "html", "br"}
)
# Containers eligible to be "the" main-content block.
_CANDIDATE_TAGS = frozenset({"div", "article", "section", "main", "td", "body"})
_VOID_TAGS = frozenset(
    {"br", "img", "hr", "meta", "link", "input", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)

_WS_RE = re.compile(r"\s+")


class _Node:
    __slots__ = ("tag", "dropped", "parent", "children", "order")

    def __init__(self, tag: str, dropped: bool, parent: "_Node | None", order: int):
        self.tag = tag
        self.dropped = dropped
        self.parent = parent
        self.children: list = []  # _Node or str
        self.order = order


class _TreeBuilder(HTMLParser):
    """Tolerant DOM builder: unclosed/mismatched tags never raise; an end tag
    pops to the nearest matching open tag or is ignored (malformed-markup
    tolerance analogous to the reference's tolerant JSON parse,
    src/services/gpt-vision.service.js:83-94)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", False, None, 0)
        self.cur = self.root
        self._order = 0
        self.malformed = False

    def handle_starttag(self, tag: str, attrs) -> None:
        dropped = tag in _DROP_TAGS
        if not dropped:
            for k, v in attrs:
                if k in ("class", "id") and v and _DROP_HINT_RE.search(v):
                    dropped = True
                    break
        self._order += 1
        node = _Node(tag, dropped or self.cur.dropped, self.cur, self._order)
        self.cur.children.append(node)
        if tag not in _VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in _VOID_TAGS:
            self.cur = self.cur.parent or self.root

    def handle_endtag(self, tag: str) -> None:
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is self.root:
            self.malformed = True
            return
        self.cur = node.parent or self.root

    def handle_data(self, data: str) -> None:
        if data and not data.isspace():
            self.cur.children.append(data)


def _stats(node: _Node) -> tuple[int, int, int]:
    """(text_len, link_text_len, p_count) of the visible subtree."""
    text_len = link_len = p_count = 0
    stack = [(node, False)]
    while stack:
        cur, in_link = stack.pop()
        if isinstance(cur, str):
            n = len(_WS_RE.sub(" ", cur).strip())
            text_len += n
            if in_link:
                link_len += n
            continue
        if cur.dropped and cur is not node:
            continue
        if cur.tag == "p":
            p_count += 1
        child_in_link = in_link or cur.tag == "a"
        for ch in cur.children:
            stack.append((ch, child_in_link))
    return text_len, link_len, p_count


def _render(node: _Node) -> str:
    """Visible text of a subtree, one line per block element, whitespace
    collapsed within lines, empty lines dropped."""
    lines: list[str] = []
    buf: list[str] = []

    def flush() -> None:
        if buf:
            line = _WS_RE.sub(" ", "".join(buf)).strip()
            if line:
                lines.append(line)
            buf.clear()

    # iterative walk (payloads can nest thousands of elements deep)
    FLUSH = object()
    stack: list = [node]
    while stack:
        cur = stack.pop()
        if cur is FLUSH:
            flush()
            continue
        if isinstance(cur, str):
            buf.append(cur)
            continue
        if cur.dropped and cur is not node:
            continue
        if cur.tag in _BLOCK_TAGS:
            flush()
            stack.append(FLUSH)
        for ch in reversed(cur.children):
            stack.append(ch)
    flush()
    return "\n".join(lines)


def extract_html(text: str) -> tuple[str, list[str]]:
    """Strip boilerplate, return (main_content_text, warnings).

    Scoring: score = (text_len - link_len) + 20 * p_count over candidate
    containers with >= 25 visible chars; best score wins, document order
    breaks ties. Falls back to whole-document visible text when no candidate
    qualifies."""
    warnings: list[str] = []
    builder = _TreeBuilder()
    try:
        builder.feed(unescape_safe(text))
        builder.close()
    except Exception:
        warnings.append("malformed_markup")
    if builder.malformed:
        warnings.append("malformed_markup")

    best: _Node | None = None
    best_score = -1.0
    stack = [builder.root]
    while stack:
        node = stack.pop()
        if isinstance(node, str) or node.dropped:
            continue
        if node.tag in _CANDIDATE_TAGS:
            text_len, link_len, p_count = _stats(node)
            if text_len >= 25:
                link_density = link_len / text_len if text_len else 1.0
                if link_density < 0.5:
                    score = (text_len - link_len) + 20.0 * p_count
                    # document order breaks ties deterministically
                    if score > best_score or (
                        score == best_score and best is not None and node.order < best.order
                    ):
                        best_score = score
                        best = node
        # reversed => document-order traversal with a LIFO stack
        for ch in reversed(node.children):
            if not isinstance(ch, str):
                stack.append(ch)

    content = _render(best if best is not None else builder.root)
    if not content:
        warnings.append("empty_extraction")
    return content, warnings


def unescape_safe(text: str) -> str:
    # HTMLParser(convert_charrefs=True) already unescapes character data;
    # feeding raw text keeps offsets/behavior deterministic. Kept as a hook.
    return text


__all__ = ["extract_html", "unescape"]
