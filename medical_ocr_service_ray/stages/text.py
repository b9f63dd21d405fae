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
