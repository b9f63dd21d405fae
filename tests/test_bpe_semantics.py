"""q142's merge step applies a BPE pair merge as a REPLACE over the
boundary-wrapped token form ('a b c' -> '<a><b><c>', pattern '<l><r>' ->
'<lr>'). The SQL oracle uses the identical REPLACE, so Ray-vs-SQL equality
is trivially pinned — but both must equal what BPE means: a greedy-left scan
merging non-overlapping occurrences. This test pins the wrapped REPLACE
against an explicit scan-merge reference, exhaustively over short symbol
strings (including the overlap/disjoint-adjacent cases 'a a a' and
'a b a b' where a naive space-padded REPLACE diverges), and pins the
pair-count convention (overlaps counted)."""

from __future__ import annotations

from collections import Counter

import pytest


def wrapped_replace_merge(s: str, left: str, right: str) -> str:
    """The exact transform q142 applies (pandas .str.replace chain) and its
    SQL twin (nested replace())."""
    wrapped = "<" + s.replace(" ", "><") + ">"
    merged = wrapped.replace(f"<{left}><{right}>", f"<{left}{right}>")
    return merged.replace("><", " ").replace("<", "").replace(">", "")


def scan_merge(s: str, left: str, right: str) -> str:
    """Reference greedy-left BPE merge: scan tokens, merge at the first
    match, skip past the merged token (Sennrich-style)."""
    tk = s.split(" ")
    out = []
    i = 0
    while i < len(tk):
        if i + 1 < len(tk) and tk[i] == left and tk[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(tk[i])
            i += 1
    return " ".join(out)


CASES = [
    ("a b c", "a", "b"),
    ("a a a", "a", "a"),  # overlapping run: greedy-left keeps the tail 'a'
    ("a a a a", "a", "a"),  # disjoint adjacent: BOTH pairs must merge
    ("a a a a a", "a", "a"),
    ("b a a b a a", "a", "a"),
    ("x a b a b y", "a", "b"),  # disjoint occurrences with shared separator
    ("a b a b a", "b", "a"),
    ("q", "a", "b"),
    ("ab ab ab", "ab", "ab"),
    ("a ab b", "a", "b"),  # merged symbol must not match inside 'ab'
]


@pytest.mark.parametrize("s,l,r", CASES)
def test_wrapped_replace_equals_scan_merge(s, l, r):
    assert wrapped_replace_merge(s, l, r) == scan_merge(s, l, r)


def test_wrapped_replace_equals_scan_merge_exhaustive():
    """All symbol strings up to length 6 over {a, b, ab} x all merge pairs:
    the wrapped REPLACE and the greedy-left scan agree everywhere."""
    from itertools import product

    syms = ["a", "b", "ab"]
    for n in range(1, 7):
        for toks in product(syms, repeat=n):
            s = " ".join(toks)
            for left, right in product(syms, repeat=2):
                assert wrapped_replace_merge(s, left, right) == scan_merge(
                    s, left, right
                ), (s, left, right)


def test_duckdb_replace_matches_python():
    """The SQL twin's nested replace() chain produces the same strings as
    Python's str.replace on the adversarial cases (both engines replace
    left-to-right, non-overlapping)."""
    import duckdb

    con = duckdb.connect()
    for s, l, r in CASES:
        got = con.execute(
            """SELECT replace(replace(replace(
                        replace('<' || replace(?, ' ', '><') || '>',
                                '<' || ? || '><' || ? || '>',
                                '<' || ? || ? || '>'),
                        '><', ' '), '<', ''), '>', '')""",
            [s, l, r, l, r],
        ).fetchone()[0]
        assert got == wrapped_replace_merge(s, l, r) == scan_merge(s, l, r)


def test_pair_count_convention():
    """Adjacent-pair counts include overlapping runs ('a a a' -> (a,a) x2),
    matching both the Ray Counter loop and the SQL range(1, len) expansion."""
    tk = "a a a".split(" ")
    c = Counter(zip(tk, tk[1:]))
    assert c[("a", "a")] == 2
