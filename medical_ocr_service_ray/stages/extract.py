"""Ray Data extraction stages.

``TurnExtractor`` is the engine's core stateful stage — the Ray-native
analogue of the reference's extraction worker
(src/workers/previsacion.worker.js:18-227 driving
src/services/gpt-vision.service.js:15-158): a callable class used with
``map_batches(TurnExtractor, batch_format="pyarrow", concurrency=N)`` so
per-actor setup (compiled regexes, parser tables, extractor version) happens
once in ``__init__`` and each ``__call__`` processes one zero-copy Arrow
batch.

Per-row errors are captured into the output row (content_type="error",
warning carries the exception) and never thrown, so one bad payload cannot
kill a partition — the reference's Promise.allSettled error-row pattern
(src/services/batch.service.js:50-77).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from medical_ocr_service_ray.functions.extractor import extract_turn
from medical_ocr_service_ray.schemas import EXTRACTION_SCHEMA, EXTRACTOR_VERSION


class TurnExtractor:
    """Classify -> route -> extract -> normalize -> score, one Arrow batch at
    a time. Output schema: ``schemas.EXTRACTION_SCHEMA``."""

    def __init__(
        self, extractor_version: str | None = None, fail_text_marker: str | None = None
    ):
        # once per actor: warm the route extractors (regexes/parse tables are
        # compiled at module import; touching them here surfaces errors early)
        self.version = extractor_version or EXTRACTOR_VERSION
        self.fail_text_marker = fail_text_marker  # test hook, see config.py
        extract_turn("warmup <div>x</div>")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        content_type = [""] * n
        extracted = [""] * n
        spans: list = [None] * n
        warnings: list = [None] * n
        confidence = np.zeros(n, dtype=np.float32)
        sha = [""] * n
        for i, text in enumerate(texts):
            try:
                if (
                    self.fail_text_marker is not None
                    and text is not None
                    and self.fail_text_marker in text
                ):
                    raise ValueError("injected extract failure (test hook)")
                res = extract_turn(text)
            except Exception as exc:  # error-row capture, never raise
                res = {
                    "content_type": "error",
                    "extracted_text": "",
                    "spans": [],
                    "warnings": [f"extract_error:{type(exc).__name__}"],
                    "confidence": 0.0,
                    "text_sha256": "",
                }
            content_type[i] = res["content_type"]
            extracted[i] = res["extracted_text"]
            spans[i] = res["spans"]
            warnings[i] = res["warnings"]
            confidence[i] = res["confidence"]
            sha[i] = res["text_sha256"]
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "role": batch["role"],
                "content_type": pa.array(content_type, pa.string()),
                "extracted_text": pa.array(extracted, pa.string()),
                "spans": pa.array(spans, EXTRACTION_SCHEMA.field("spans").type),
                "warnings": pa.array(warnings, EXTRACTION_SCHEMA.field("warnings").type),
                "confidence": pa.array(confidence),
                "text_sha256": pa.array(sha, pa.string()),
                "extractor_version": pa.array([self.version] * n, pa.string()),
            },
            schema=EXTRACTION_SCHEMA,
        )


def split_error_rows(table: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(good, errors) split on ``content_type == "error"`` — the quarantine
    analogue of the reference's separate dead-letter failure table
    (database/migration_ingestion_jobs.sql:44-53): row-level failures are
    persisted beside the output, never mixed into it."""
    mask = pa.compute.equal(table["content_type"], "error")
    n_err = pa.compute.sum(mask).as_py() or 0
    if not n_err:
        return table, table.slice(0, 0)
    return table.filter(pa.compute.invert(mask)), table.filter(mask)


def publish_bucket_tables(
    good: pa.Table, final_path: str, errors: pa.Table, errors_path: str, codec: str
) -> None:
    """Atomically publish a finalized bucket: good rows to ``final_path``,
    quarantined error rows to ``errors_path`` (removed when a re-finalize
    produces none, so stale quarantine files can't survive a repair)."""
    import os

    import pyarrow.parquet as _pq

    tmp = final_path + ".tmp"
    _pq.write_table(good, tmp, row_group_size=65536, compression=codec)
    os.replace(tmp, final_path)
    if errors.num_rows:
        os.makedirs(os.path.dirname(errors_path), exist_ok=True)
        tmp_e = errors_path + ".tmp"
        _pq.write_table(errors, tmp_e, compression=codec)
        os.replace(tmp_e, errors_path)
    elif os.path.exists(errors_path):
        os.remove(errors_path)


def add_bucket_column(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Deterministic hash bucket of conv_id (crc32 — stable across processes,
    unlike Python's salted hash()). The ONE partitioning key reused by every
    keyed stage (SURVEY.md §7.4)."""
    conv = batch["conv_id"].to_pylist()
    buckets = np.fromiter(
        (zlib.crc32(c.encode()) % num_buckets for c in conv), dtype=np.int32, count=len(conv)
    )
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


def sort_group_by_turn(group: pa.Table) -> pa.Table:
    """Stable per-key ordering inside one bucket (north-rule T7 invariant:
    details ordered by item — pre-visacion.service.js:337)."""
    return group.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def dedup_turns_in_bucket(group: pa.Table) -> pa.Table:
    """Idempotency pre-step (D1 analogue: UNIQUE(archivo_hash) + upsert,
    database/schema_matching.sql:131): duplicated input rows — same
    (conv_id, turn_idx, text_sha256) — collapse to one output row. Keeps the
    first occurrence in (conv_id, turn_idx) order; duplicates of the same
    turn with DIFFERENT content are also collapsed to the first by key
    (last-writer-wins is a policy choice; first-wins is deterministic here
    because content is identical in the idempotency case)."""
    import pyarrow.compute as pc

    group = group.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    n = group.num_rows
    if n <= 1:
        return group
    # vectorized keep-first: row i is a duplicate iff (conv, turn) equals row i-1
    conv = group["conv_id"].combine_chunks()
    turn = group["turn_idx"].combine_chunks()
    dup = pc.and_(
        pc.equal(conv.slice(1), conv.slice(0, n - 1)),
        pc.equal(turn.slice(1), turn.slice(0, n - 1)),
    )
    dups = np.flatnonzero(dup.to_numpy(zero_copy_only=False)) + 1
    if len(dups) == 0:
        return group
    keep = np.setdiff1d(np.arange(n, dtype=np.int64), dups, assume_unique=True)
    return group.take(pa.array(keep))
