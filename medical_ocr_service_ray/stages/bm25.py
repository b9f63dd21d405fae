"""Quantized-BM25 full-text retrieval over a document corpus.

The search-serving analogue of the engine's quantized ANN (q12): BM25
scoring made *integer-exact* so a DuckDB oracle can hash-check it
bit-for-bit. Real BM25 sums floats, and float SUM order is
engine-dependent; here both the tf-normalization and the final per-document
sum are int64, and the only transcendental (idf's ln) is quantized ONCE per
distinct query token — ``floor(1e6 * ln((2(N+1))/(2·df+1)))``, the
Lucene-style idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` rewritten so the
argument is a single exact-rational division (same libm double on both
engines).

Plan (the canonical two-pass shape of corpus-relative scoring):

1. **Stats pass** — per-batch partials for corpus size N, total token count
   L, and document frequency of the *query* tokens only (a document never
   spans batches, so per-batch distinct-doc counts sum to exact df). The
   partial output is O(blocks × |query vocab|) rows — driver-combinable by
   construction, never vocabulary-wide.
2. **Score pass** — broadcast the tiny idf table + (N, L) scalars into a
   second scan; each batch computes tf over query tokens, the int64
   tf-norm ``(22·10^6·tf·L) // (10·tf·L + 3·L + 9·dl·N)`` (BM25 with
   k1=6/5, b=3/4 multiplied through to integers), per-(query, doc) scores,
   and a per-batch partial top-k; a final tiny merge keeps rank ≤ k per
   query ordered by (score desc, doc_id asc).

Scale notes: both passes stream; the exchange volume is one tiny partial
table and k×|queries| candidate rows per batch. The int64 tf-norm bound is
``2.2·10^7 · tf · L < 2^63`` — comfortable to ~10^10 corpus tokens with
realistic tf; beyond that, shard L per corpus partition or widen to
int128/hugeint on both sides (documented, not silently truncated).
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from medical_ocr_service_ray.functions.hashing import tokens
from medical_ocr_service_ray.stages.aggregate import driver_combine

if TYPE_CHECKING:  # pragma: no cover
    import ray.data as rd

K1_NUM, K1_DEN = 6, 5  # k1 = 1.2
B_NUM, B_DEN = 3, 4  # b = 0.75
IDF_SCALE = 1_000_000
TF_SCALE = 1_000_000


def idf_quantized(n_docs: int, df: int) -> int:
    """floor(1e6 * ln(1 + (N - df + 0.5)/(df + 0.5))) with the argument
    evaluated as one double division of exact integers: (2(N+1))/(2·df+1)."""
    return math.floor(IDF_SCALE * math.log((2.0 * (n_docs + 1)) / (2 * df + 1)))


def _doc_tf(texts: list[str], keep: set[str]) -> tuple[list[dict], np.ndarray]:
    """Per document: counts of kept tokens + total token length."""
    per_doc = []
    dls = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = tokens(text or "")
        dls[i] = len(toks)
        counts: dict[str, int] = {}
        for t in toks:
            if t in keep:
                counts[t] = counts.get(t, 0) + 1
        per_doc.append(counts)
    return per_doc, dls


def bm25_topk(
    docs: "rd.Dataset",
    queries: dict[str, str],
    k: int = 10,
) -> pd.DataFrame:
    """Top-k documents per query by quantized BM25. ``docs`` needs
    (doc_id, text); ``queries`` maps query_id -> query text. Returns a tiny
    exploded frame (query_id, rank, doc_id, score_q) — k rows per query."""
    qtokens = {qid: sorted(set(tokens(qtext))) for qid, qtext in queries.items()}
    keep = set().union(*qtokens.values()) if qtokens else set()

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        per_doc, dls = _doc_tf(df["text"].tolist(), keep)
        rows = [
            {"token": t, "df_part": sum(1 for c in per_doc if t in c)} for t in sorted(keep)
        ]
        rows.append({"token": "~n_docs", "df_part": len(per_doc)})
        rows.append({"token": "~total_len", "df_part": int(dls.sum())})
        return pd.DataFrame(rows)

    def stats_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False)["df_part"].sum()

    stats = driver_combine(docs, stats_partial, stats_combine)
    smap = dict(zip(stats.token, stats.df_part.astype(int)))
    n_docs = smap.pop("~n_docs", 0)
    total_len = smap.pop("~total_len", 0)
    idf = {t: idf_quantized(n_docs, d) for t, d in smap.items() if d > 0}

    def score_partial(df: pd.DataFrame) -> pd.DataFrame:
        per_doc, dls = _doc_tf(df["text"].tolist(), keep)
        ids = df["doc_id"].to_numpy()
        out_q, out_d, out_s = [], [], []
        L, N = total_len, n_docs
        for qid, qtoks in qtokens.items():
            for i, counts in enumerate(per_doc):
                score = 0
                for t in qtoks:
                    tf = counts.get(t, 0)
                    if tf and t in idf:
                        tf_norm = (22 * TF_SCALE * tf * L) // (
                            10 * tf * L + 3 * L + 9 * int(dls[i]) * N
                        )
                        score += idf[t] * tf_norm
                if score > 0:
                    out_q.append(qid)
                    out_d.append(int(ids[i]))
                    out_s.append(score)
        part = pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="string"),
                "doc_id": pd.Series(out_d, dtype="int64"),
                "score_q": pd.Series(out_s, dtype="int64"),
            }
        )
        # partial top-k: at most k candidate rows per query leave the batch
        part = part.sort_values(
            ["query_id", "score_q", "doc_id"], ascending=[True, False, True]
        )
        return part.groupby("query_id", sort=False).head(k)

    parts = docs.map_batches(score_partial, batch_format="pandas").to_pandas()
    parts = parts.sort_values(
        ["query_id", "score_q", "doc_id"], ascending=[True, False, True]
    )
    top = parts.groupby("query_id", sort=False).head(k).reset_index(drop=True)
    top["rank"] = (top.groupby("query_id", sort=False).cumcount() + 1).astype("int64")
    # object dtype to match DuckDB's VARCHAR→pandas mapping exactly (the
    # driver's schema compare is dtype-strict; StringDtype would mismatch).
    top["query_id"] = top["query_id"].astype(object)
    return top[["query_id", "rank", "doc_id", "score_q"]]
