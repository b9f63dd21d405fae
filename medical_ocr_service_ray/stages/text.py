"""Text-analysis Ray stages over a ``text`` column (documents table).

Stateless map_batches functions emitting the integer/exact outputs defined in
functions/textstats.py so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

import pyarrow as pa

from medical_ocr_service_ray.functions.textstats import lang_id, quality_score, token_stats


def token_stats_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    stats = [token_stats(t or "") for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array([s["n_tokens"] for s in stats], pa.int64()),
            "n_chars": pa.array([s["n_chars"] for s in stats], pa.int64()),
            "alpha_chars": pa.array([s["alpha_chars"] for s in stats], pa.int64()),
            "avg_token_len_x100": pa.array([s["avg_token_len_x100"] for s in stats], pa.int64()),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array([lang_id(t or "") for t in texts], pa.string()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    qs = [quality_score(t or "") for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array([q["n_tokens"] for q in qs], pa.int64()),
            "stop_hits": pa.array([q["stop_hits"] for q in qs], pa.int64()),
            "punct_count": pa.array([q["punct_count"] for q in qs], pa.int64()),
            "quality": pa.array([q["quality"] for q in qs], pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Winnowing-style rolling-hash fingerprints (document fingerprinting)."""
    from medical_ocr_service_ray.functions.hashing import rolling_fingerprint

    texts = batch["text"].to_pylist()
    fps = [rolling_fingerprint(t or "") for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
            "min_fingerprint": pa.array(
                [int(f.min()) if len(f) else 0 for f in fps], pa.int64()
            ),
        }
    )


def inverted_index(docs, k: int = 5, num_buckets: int = 16):
    """Inverted-index build (search/retrieval-index op, a web-scale pipeline
    staple): token -> (df, cf, top-k posting by tf). Returns EXPLODED rows
    (token, rank, doc_id, tf, df, cf), rank 1..k by (tf desc, doc_id asc) —
    scalar columns only, so the SQL oracle compares hash-exactly.

    Plan: per-batch vectorized (token, doc_id, tf) fold — tf is FINAL per
    row because a document never spans batches — then, STILL PER BATCH, a
    partial top-k by (tf desc, doc_id asc) per token plus per-token
    (df_part, cf_part) stats rows (marker doc_id = -1). Only those leave
    the batch, so a hot token (stopword with df ~ corpus size) contributes
    at most blocks x (k+1) rows to the exchange instead of df rows — the
    hot-key bound that makes the single token-keyed bucketed combine safe
    at 100 TB. The combine sums the stats rows and merges the candidate
    top-k slices (global top-k is a subset of the union of per-batch
    top-k: every discarded row was dominated by k kept rows in its own
    batch). Output is bounded by k x vocabulary."""
    import numpy as np
    import pandas as pd

    from medical_ocr_service_ray.functions.hashing import tokens
    from medical_ocr_service_ray.stages.aggregate import bucketed_combine

    def posting_partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        toks = [tokens(x or "") for x in texts]
        lens = np.fromiter((len(x) for x in toks), dtype=np.int64, count=len(toks))
        flat_tok = [w for ts in toks for w in ts]
        flat_id = np.repeat(np.asarray(ids, dtype=np.int64), lens)
        df = pd.DataFrame({"token": flat_tok, "doc_id": flat_id})
        tf = df.groupby(["token", "doc_id"], as_index=False, sort=False).size()
        tf = tf.rename(columns={"size": "tf"})
        # per-token stats partial (one row per distinct token in the batch)
        stats = tf.groupby("token", as_index=False).agg(
            df_part=("doc_id", "size"), cf_part=("tf", "sum")
        )
        stats["doc_id"] = -1
        stats["tf"] = 0
        # per-token partial top-k candidates
        cand = tf.sort_values(["token", "tf", "doc_id"], ascending=[True, False, True])
        cand = cand.groupby("token", sort=False).head(k).copy()
        cand["df_part"] = 0
        cand["cf_part"] = 0
        out = pd.concat([cand, stats], ignore_index=True)
        return pa.table(
            {
                "token": pa.array(out["token"], pa.string()),
                "doc_id": pa.array(out["doc_id"].astype("int64"), pa.int64()),
                "tf": pa.array(out["tf"].astype("int64"), pa.int64()),
                "df_part": pa.array(out["df_part"].astype("int64"), pa.int64()),
                "cf_part": pa.array(out["cf_part"].astype("int64"), pa.int64()),
            }
        )

    postings = docs.map_batches(posting_partial, batch_format="pyarrow", zero_copy_batch=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        agg = (
            df[df.doc_id < 0]
            .groupby("token", as_index=False)
            .agg(df_docs=("df_part", "sum"), cf=("cf_part", "sum"))
        )
        cand = df[df.doc_id >= 0]
        ranked = cand.sort_values(["token", "tf", "doc_id"], ascending=[True, False, True])
        ranked = ranked.assign(rank=ranked.groupby("token").cumcount() + 1)
        top = ranked[ranked["rank"] <= k].merge(agg, on="token")
        return pd.DataFrame(
            {
                "token": top.token,
                "rank": top["rank"].astype("int64"),
                "doc_id": top.doc_id.astype("int64"),
                "tf": top.tf.astype("int64"),
                "df": top.df_docs.astype("int64"),
                "cf": top.cf.astype("int64"),
            }
        )

    return bucketed_combine(postings, "token", combine, num_buckets=num_buckets)
