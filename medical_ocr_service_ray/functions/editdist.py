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
