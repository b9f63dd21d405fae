"""Text-analysis scalar functions: language-ID, token stats, quality score.

Large-scale training-data-pipeline additions (no direct counterpart in the
reference beyond its text normalizers, SURVEY.md §2.8). Every function here is
defined with integer / exact arithmetic so a DuckDB SQL oracle can reproduce
it bit-for-bit (the driver's value-hash gate):

- token counts = maximal runs of non-whitespace,
- marker-based language scores = substring occurrence counts on the
  space-padded lowercased text,
- quality score = a pure-integer formula of capped sub-scores.
"""

from __future__ import annotations

import re

_NONWS_RE = re.compile(r"\S+")
_WS_RE = re.compile(r"\s")

# alphabetical language order is the deterministic tie-break
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": (" der ", " und ", " die ", " nicht "),
    "en": (" the ", " and ", " of ", " is "),
    "es": (" el ", " de ", " que ", " los "),
    "fr": (" le ", " et ", " les ", " des "),
    "zh": (" de5 ", " shi4 ", " le5 ", " zai4 "),  # pinyin-ish markers for romanized text
}
LANGS = tuple(sorted(LANG_MARKERS))

STOPWORDS = (" the ", " and ", " of ", " a ", " to ", " in ", " is ")


def count_occurrences(haystack: str, needle: str) -> int:
    """Non-overlapping substring count — identical semantics to SQL
    (length(h) - length(replace(h, n, ''))) / length(n)."""
    return haystack.count(needle)


def lang_scores(text: str) -> dict[str, int]:
    padded = " " + text.lower() + " "
    return {
        lang: sum(count_occurrences(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: str) -> str:
    """Predicted language: argmax of marker scores, alphabetical-first on
    ties, 'und' when every score is zero."""
    scores = lang_scores(text)
    if all(v == 0 for v in scores.values()):
        return "und"
    for lang in LANGS:  # alphabetical; first lang >= all others wins
        s = scores[lang]
        if all(s >= scores[o] for o in LANGS):
            return lang
    return "und"  # unreachable


def token_stats(text: str) -> dict[str, int]:
    """n_tokens, n_chars, alpha_chars (non-whitespace chars),
    avg_token_len_x100 (integer floor division — exact)."""
    n_tokens = len(_NONWS_RE.findall(text))
    n_chars = len(text)
    alpha_chars = len(_WS_RE.sub("", text))
    avg_token_len_x100 = (100 * alpha_chars) // n_tokens if n_tokens else 0
    return {
        "n_tokens": n_tokens,
        "n_chars": n_chars,
        "alpha_chars": alpha_chars,
        "avg_token_len_x100": avg_token_len_x100,
    }


def quality_score(text: str) -> dict[str, int]:
    """Integer quality heuristic (length / stopword / punctuation sub-scores,
    each capped; max total 800)."""
    padded = " " + text.lower() + " "
    n_tokens = len(_NONWS_RE.findall(text))
    stop_hits = sum(count_occurrences(padded, s) for s in STOPWORDS)
    punct_count = text.count(".") + text.count(",") + text.count("!")
    len_score = min(n_tokens, 200)
    stop_score = min(stop_hits * 10, 100)
    punct_score = min(punct_count * 5, 100)
    return {
        "n_tokens": n_tokens,
        "stop_hits": stop_hits,
        "punct_count": punct_count,
        "quality": len_score * 2 + stop_score * 3 + punct_score,
    }


def sql_occurrences(col: str, needle: str) -> str:
    """SQL fragment mirroring count_occurrences (DuckDB)."""
    lit = needle.replace("'", "''")
    return f"CAST((length({col}) - length(replace({col}, '{lit}', ''))) / {len(needle)} AS BIGINT)"


def sql_lang_score(col: str, lang: str) -> str:
    return "(" + " + ".join(sql_occurrences(col, m) for m in LANG_MARKERS[lang]) + ")"
