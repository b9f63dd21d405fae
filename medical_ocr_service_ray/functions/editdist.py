"""Unit-cost Levenshtein edit distance + dictionary-encoded batch matcher.

The fuzzy-vocabulary matcher (reference analogue: the term matcher's
fuzzy fallback, src/services/rag.service.js exact-then-nearest lookup,
J2/J6 in SURVEY.md §2) resolves each input string to its closest term in a
small broadcast vocabulary. The scalable trick for text columns is
dictionary encoding: a batch of N rows usually carries far fewer DISTINCT
strings, so we compute the DP once per distinct value and gather — per-batch
cost is O(distinct × vocab × len²), independent of row count for
low-cardinality columns (exactly the shape of token/category columns).

Semantics match DuckDB's ``levenshtein()`` (insert/delete/substitute, all
cost 1), so the SQL oracle can cross-check bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def levenshtein(a: str, b: str) -> int:
    """Classic two-row DP; unit costs — identical to DuckDB levenshtein()."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):  # keep the inner row the shorter string
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def best_match(values: pd.Series, vocab: list[str]) -> pd.DataFrame:
    """Per row: (best_term, best_dist) = argmin over vocab by
    (distance, term) — the term tiebreak is lexicographic so the result is
    deterministic and mirrors SQL's ``ORDER BY dist, term LIMIT 1``.

    Dictionary-encoded: one DP per (distinct value, term)."""
    cats = pd.Categorical(values.astype(str))
    uniq = cats.categories.to_numpy(dtype=object)
    vocab_sorted = sorted(vocab)
    best_term = np.empty(len(uniq), dtype=object)
    best_dist = np.empty(len(uniq), dtype=np.int64)
    for i, v in enumerate(uniq):
        dists = [levenshtein(v, t) for t in vocab_sorted]
        j = int(np.argmin(dists))  # first minimum == lexicographically least term
        best_term[i] = vocab_sorted[j]
        best_dist[i] = dists[j]
    codes = cats.codes  # -1 never occurs: astype(str) leaves no NaN
    return pd.DataFrame(
        {"best_term": best_term[codes], "best_dist": best_dist[codes]},
        index=values.index,
    )


def _ascii_matrix(strs: list, width: int) -> np.ndarray:
    """(n, width) uint8 matrix of ASCII strings all of length ``width``."""
    buf = "".join(strs).encode("ascii")
    return np.frombuffer(buf, dtype=np.uint8).reshape(len(strs), width)


def lev_le1_batch(sx, sy) -> np.ndarray:
    """Vectorized ``levenshtein(a, b) <= 1`` over two aligned string
    sequences — the verify kernel for the edit-distance blocking join
    (stages/simjoin.py), where the Python DP loop was the hot spot
    (PERF_NOTES §27). Equal lengths reduce to hamming ≤ 1; lengths
    differing by 1 reduce to the single-deletion check (first-mismatch
    split: prefix equal, suffix of the longer shifted by one equal);
    length gap ≥ 2 is always False. Pure-numpy on ASCII groups, falls
    back to the exact DP per row for non-ASCII. Pinned equal to the DP
    by TestLevLe1Batch over exhaustive small alphabets."""
    sx = list(sx)
    sy = list(sy)
    n = len(sx)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    lx = np.fromiter((len(s) for s in sx), dtype=np.int64, count=n)
    ly = np.fromiter((len(s) for s in sy), dtype=np.int64, count=n)
    ascii_ok = np.fromiter(
        (a.isascii() and b.isascii() for a, b in zip(sx, sy)), dtype=bool, count=n
    )

    # equal length, grouped by L: hamming <= 1
    eq = (lx == ly) & ascii_ok
    for L in np.unique(lx[eq]):
        m = np.flatnonzero(eq & (lx == L))
        if L == 0:
            out[m] = True
            continue
        ax = _ascii_matrix([sx[i] for i in m], int(L))
        ay = _ascii_matrix([sy[i] for i in m], int(L))
        out[m] = (ax != ay).sum(axis=1) <= 1

    # |len diff| == 1, grouped by shorter length L: single-deletion check
    d1 = (np.abs(lx - ly) == 1) & ascii_ok
    sl = np.minimum(lx, ly)
    for L in np.unique(sl[d1]):
        m = np.flatnonzero(d1 & (sl == L))
        shorter = [sx[i] if lx[i] < ly[i] else sy[i] for i in m]
        longer = [sy[i] if lx[i] < ly[i] else sx[i] for i in m]
        L = int(L)
        B = _ascii_matrix(longer, L + 1)
        if L == 0:
            out[m] = True  # "" vs single char: distance 1
            continue
        A = _ascii_matrix(shorter, L)
        pre_mm = A != B[:, :L]
        has_pre = pre_mm.any(axis=1)
        p = np.where(has_pre, pre_mm.argmax(axis=1), L)
        suf_mm = A != B[:, 1:]
        last_suf = np.where(
            suf_mm.any(axis=1),
            (L - 1) - suf_mm[:, ::-1].argmax(axis=1),
            -1,
        )
        out[m] = last_suf < p

    # non-ASCII (rare): exact DP fallback
    rest = np.flatnonzero(~ascii_ok & (np.abs(lx - ly) <= 1))
    for i in rest:
        out[i] = levenshtein(sx[i], sy[i]) <= 1
    return out
