"""Training-data sampling / splitting / packing operators.

Standard large-scale training-pipeline operations with NO counterpart in the
reference (scale additions, SURVEY.md §2 extensions): deterministic hash
split (train/test), stratified per-group sampling, and context-length
sequence packing. Determinism rule: all "randomness" is arithmetic over ids
(Knuth multiplicative hash mod 2^32) so DuckDB can reproduce the exact rows
— no RNG state, no salt, stable across processes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

KNUTH = 2654435761  # 2^32 * golden-ratio conjugate; SQL: (id * 2654435761) % 4294967296


def knuth_hash_batch(ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized (id * KNUTH) mod 2^32 — the shared Ray/SQL arithmetic."""
    arr = np.asarray(ids.to_numpy(zero_copy_only=False), dtype=np.uint64)
    return ((arr * np.uint64(KNUTH)) % np.uint64(1 << 32)).astype(np.int64)


def hash_split(
    ds: "rd.Dataset", id_col: str, train_pct: int = 80
) -> "rd.Dataset":
    """Deterministic train/test split: split = 'train' iff
    hash(id) % 100 < train_pct. Stateless per-batch map — rows never move,
    the assignment is a pure function of the id (the property that makes the
    split reproducible at 100 TB and immune to repartitioning)."""

    def assign(t: pa.Table) -> pa.Table:
        h = knuth_hash_batch(t[id_col]) % 100
        split = np.where(h < train_pct, "train", "test")
        return t.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: "rd.Dataset",
    group_col: str,
    id_col: str,
    k_per_group: int,
    num_buckets: int = 8,
) -> "rd.Dataset":
    """Deterministic per-group sample: the k rows with the smallest
    (hash(id), id) per group. Per-batch partial top-k (each batch keeps at
    most k rows per group present in it) -> bucketed combine keyed on the
    group -> exact global per-group top-k. The partial bound makes the
    shuffle payload O(groups_per_batch * k), not the full table."""
    from medical_ocr_service_ray.stages.aggregate import partial_then_combine

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        h = (df[id_col].astype("uint64") * np.uint64(KNUTH)) % np.uint64(1 << 32)
        df = df.assign(__h=h.astype("int64"))
        df = df.sort_values(["__h", id_col], kind="mergesort")
        return df.groupby(group_col, sort=False).head(k_per_group)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = rank(df.drop(columns="__h"))
        return out.drop(columns="__h")

    return partial_then_combine(ds, rank, group_col, combine, num_buckets=num_buckets)


def pack_sequences(
    docs: "rd.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    num_buckets: int = 16,
) -> "rd.Dataset":
    """Context-length sequence packing: assign every document to exactly one
    pack whose total whitespace-token count is <= max_tokens (documents
    longer than the limit get a singleton pack). Greedy first-fit in
    ascending id order INSIDE each hash bucket — packing is inherently
    order-dependent, so the bucket is the determinism domain: pack ids are
    ``bucket * 2^32 + seq`` and the result is invariant to input
    partitioning. Returns (doc_id, n_tokens, pack_id, pack_tokens)."""
    from medical_ocr_service_ray.stages.aggregate import bucketed_combine

    def tokenize(t: pa.Table) -> pa.Table:
        n = [len((x or "").split()) for x in t[text_col].to_pylist()]
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(n, pa.int64()),
            }
        )

    counted = docs.map_batches(tokenize, batch_format="pyarrow", zero_copy_batch=True)

    def pack_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        # open packs: list of [remaining_capacity, pack_seq]
        pack_ids = np.empty(len(df), dtype=np.int64)
        open_packs: list[list[int]] = []  # [remaining, seq]
        next_seq = 0
        for i, tok in enumerate(df.n_tokens.astype("int64")):
            placed = False
            for slot in open_packs:
                if tok <= slot[0]:
                    slot[0] -= tok
                    pack_ids[i] = slot[1]
                    placed = True
                    break
            if not placed:
                open_packs.append([max(0, max_tokens - tok), next_seq])
                pack_ids[i] = next_seq
                next_seq += 1
        df = df.assign(__seq=pack_ids)
        totals = df.groupby("__seq")["n_tokens"].transform("sum")
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "n_tokens": df.n_tokens.astype("int64"),
                "pack_seq": df.__seq.astype("int64"),
                "pack_tokens": totals.astype("int64"),
            }
        )

    packed = bucketed_combine(counted, id_col, pack_bucket, num_buckets=num_buckets)

    # globally-unique pack ids: bucket * 2^32 + seq (bucket recomputed from
    # the id so the mapping is a pure function of the row)
    def finalize(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        bucket = ids % num_buckets
        pack_id = bucket * (1 << 32) + np.asarray(
            t["pack_seq"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": t["n_tokens"],
                "pack_id": pa.array(pack_id, pa.int64()),
                "pack_tokens": t["pack_tokens"],
            }
        )

    return packed.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
