"""Deterministic HTML main-content extraction (boilerplate strip).

This is the new engine's stand-in for the reference's LLM extraction core
(src/services/gpt-vision.service.js:15-158): a Readability-style block scorer
— DOM tree build, tag-density and text-to-link-ratio heuristics, block
scoring — fully deterministic so golden equality is achievable (SURVEY.md
§2.2 M6). The tree builder is a single-pass regex tokenizer (hot-path
replacement for stdlib HTMLParser, ~2.5x faster; tolerant of malformed
markup the same way: an end tag pops to the nearest matching open tag or is
ignored).
"""

from __future__ import annotations

import re
from html import unescape

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


# Single-pass tokenizer: comments / CDATA / declarations / end tags / start
# tags. Anything that doesn't parse as a tag is character data (tolerant).
_TAG_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<![^>]*>?"
    r"|<\?[^>]*>?"
    r"|</\s*([a-zA-Z][a-zA-Z0-9-]*)[^>]*>"  # 1: end tag name
    r"|<([a-zA-Z][a-zA-Z0-9-]*)"  # 2: start tag name
    r"((?:\"[^\"]*\"|'[^']*'|[^>])*?)"  # 3: raw attrs
    r"(/?)>",  # 4: self-closing slash
    re.DOTALL,
)
_CLASSID_RE = re.compile(
    r"(?<![\w-])(?:class|id)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.IGNORECASE
)
_RAWTEXT_END = {
    "script": re.compile(r"</script", re.IGNORECASE),
    "style": re.compile(r"</style", re.IGNORECASE),
}


def _build_tree(text: str) -> tuple[_Node, bool]:
    """Tolerant DOM build: unclosed/mismatched tags never raise; an end tag
    pops to the nearest matching open tag or is ignored (malformed-markup
    tolerance analogous to the reference's tolerant JSON parse,
    src/services/gpt-vision.service.js:83-94)."""
    root = _Node("#root", False, None, 0)
    cur = root
    order = 0
    malformed = False
    pos = 0
    n = len(text)
    append_data = lambda node, data: node.children.append(  # noqa: E731
        unescape(data) if "&" in data else data
    )
    while pos < n:
        m = _TAG_TOKEN_RE.search(text, pos)
        if m is None:
            data = text[pos:]
            if data and not data.isspace():
                append_data(cur, data)
            break
        if m.start() > pos:
            data = text[pos : m.start()]
            if data and not data.isspace():
                append_data(cur, data)
        pos = m.end()
        end_tag = m.group(1)
        start_tag = m.group(2)
        if end_tag is not None:
            tag = end_tag.lower()
            node = cur
            while node is not root and node.tag != tag:
                node = node.parent
            if node is root:
                malformed = True
            else:
                cur = node.parent or root
        elif start_tag is not None:
            tag = start_tag.lower()
            attrs = m.group(3)
            dropped = tag in _DROP_TAGS
            if not dropped and attrs:
                for am in _CLASSID_RE.finditer(attrs):
                    v = am.group(1) or am.group(2) or am.group(3) or ""
                    if v and _DROP_HINT_RE.search(v):
                        dropped = True
                        break
            order += 1
            node = _Node(tag, dropped or cur.dropped, cur, order)
            cur.children.append(node)
            if tag in _VOID_TAGS or m.group(4):
                continue
            if tag in _RAWTEXT_END:  # script/style content is raw text
                em = _RAWTEXT_END[tag].search(text, pos)
                content = text[pos:] if em is None else text[pos : em.start()]
                if content and not content.isspace():
                    node.children.append(content)
                if em is None:
                    pos = n
                else:
                    gt = text.find(">", em.start())
                    pos = gt + 1 if gt != -1 else n
                continue
            cur = node
        # comments / CDATA / declarations: skipped
    return root, malformed


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
            joined = "".join(buf)
            # fast path: most lines need no collapsing — C-level scans beat
            # the regex sub. Non-ASCII goes through the regex (\s covers
            # unicode whitespace like \xa0 from &nbsp;).
            if (
                not joined.isascii()
                or "  " in joined
                or "\t" in joined
                or "\n" in joined
                or "\r" in joined
                or "\f" in joined
                or "\v" in joined
            ):
                line = _WS_RE.sub(" ", joined).strip()
            else:
                line = joined.strip()
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
    try:
        root, malformed = _build_tree(text)
    except Exception:
        root, malformed = _Node("#root", False, None, 0), True
    if malformed:
        warnings.append("malformed_markup")

    best: _Node | None = None
    best_score = -1.0
    stack = [root]
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

    content = _render(best if best is not None else root)
    if not content:
        warnings.append("empty_extraction")
    return content, warnings


__all__ = ["extract_html"]
