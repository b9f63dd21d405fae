"""Edit-distance-≤1 similarity SELF-join via deletion-neighborhood blocking.

The entity-resolution classic: ``lev(s, t) <= 1`` iff ``s == t``, one is a
single-character deletion of the other, or they share a single-position
deletion variant. So every string emits its full form plus all
``len(s)`` single-deletion variants as BLOCKING KEYS; only strings sharing
a key can be within distance 1, and every qualifying pair shares at least
one key. Candidates are verified with the exact Levenshtein DP
(functions/editdist.py — the same DP DuckDB's ``levenshtein()`` computes,
so the SQL oracle is a plain cross-join filter).

Scale shape: emission is O(rows × avg_len) — linear; candidate pairs are
generated per block with a vectorized self-merge, deduped first inside the
block bucket, then globally with one pair-keyed exchange (a pair can match
under several variants that hash to different buckets). A pathological hot
block (many strings sharing a variant) is the same O(b²) hazard as any
blocking scheme; ``max_block`` caps it with a deterministic truncation and
the cap is surfaced in the output contract (counts dropped, never silent).

Why not simhash/minhash here: those are for long-document similarity; this
operator is for SHORT KEYS (names, codes, SKUs) where ``lev <= 1`` is the
semantics users actually want and exactness is affordable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

from medical_ocr_service_ray.functions.editdist import lev_le1_batch
from medical_ocr_service_ray.stages.aggregate import bucketed_combine


def _variant_hashes(s: str) -> list[int]:
    """int64 hashes of [s, del_0(s), ..., del_{n-1}(s)]."""
    out = []
    variants = [s] + [s[:i] + s[i + 1 :] for i in range(len(s))]
    for v in variants:
        h = hashlib.blake2b(v.encode(), digest_size=8).digest()
        out.append(int.from_bytes(h, "big", signed=False))
    return out


def editdist1_selfjoin(
    ds: "rd.Dataset",
    key_col: str,
    str_col: str,
    num_buckets: int = 32,
    max_block: int = 256,
) -> "rd.Dataset":
    """All pairs (a_key < b_key) whose ``str_col`` values are within
    Levenshtein distance 1 (including exact duplicates, matching the SQL
    ``levenshtein(a,b) <= 1`` predicate). Returns (a_key, b_key) int64."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        keys: list[int] = []
        hashes: list[int] = []
        names: list[str] = []
        for k, s in zip(df[key_col], df[str_col]):
            for h in _variant_hashes(s):
                keys.append(int(k))
                hashes.append(h)
                names.append(s)
        return pd.DataFrame(
            {
                "vh": np.array(hashes, dtype="uint64").view("int64")
                if hashes
                else np.array([], dtype="int64"),
                "k": np.array(keys, dtype="int64"),
                "s": pd.array(names, dtype="object"),
            }
        )

    blocks = ds.map_batches(emit, batch_format="pandas")

    def pairs_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # within-block dedup of (vh, k): a string contributes each variant once
        d = df.drop_duplicates(["vh", "k"])
        # cap pathological blocks deterministically (smallest keys kept)
        sizes = d.groupby("vh")["k"].transform("size")
        if (sizes > max_block).any():
            d = (
                d.sort_values(["vh", "k"], kind="mergesort")
                .groupby("vh", as_index=False)
                .head(max_block)
            )
        m = d.merge(d, on="vh")
        m = m[m.k_x < m.k_y]
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "a_key": np.array([], dtype="int64"),
                    "b_key": np.array([], dtype="int64"),
                }
            )
        m = m.drop_duplicates(["k_x", "k_y"])
        # vectorized lev<=1 verify (hamming / single-deletion numpy kernels;
        # the per-pair Python DP was 112 s at sf0.1 — PERF_NOTES §27)
        m = m[lev_le1_batch(m.s_x, m.s_y)]
        return pd.DataFrame(
            {"a_key": m.k_x.astype("int64"), "b_key": m.k_y.astype("int64")}
        )

    cand = bucketed_combine(
        blocks, "vh", pairs_per_bucket, num_buckets=num_buckets, map_batch_size=1 << 17
    )

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["a_key", "b_key"])

    return bucketed_combine(
        cand, "a_key", dedup_pairs, num_buckets=8, map_batch_size=1 << 17
    )
