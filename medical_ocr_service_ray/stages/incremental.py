"""Incremental exact dedup against a persisted, bucketed hash index.

The corpus-level analogue of the reference's content-hash upsert —
``UNIQUE(archivo_hash)`` with ON CONFLICT skip (database/schema_matching.sql:131,
src/services/gpt-vision.service.js:22 computes the hash) — rebuilt for a
100 TB streaming corpus: a NEW batch of documents must be deduplicated
against everything already ingested *without rescanning the corpus*.

Design:

- The index is content hashes only, laid out as ``index_dir/b{bucket:04d}/
  part-*.parquet`` with ``bucket = int(sha256[:8], 16) % num_buckets``.
- The new batch is hashed per-batch (vectorized sha256, reusing
  stages/dedup.add_sha_batch), bucket-stamped, and exchanged ONCE on the
  bucket key. Each per-bucket task then reads ONLY ITS OWN index partition
  from disk — the index never moves through the object store and no task
  holds more than corpus/num_buckets hash bytes (size num_buckets with
  stages/aggregate.auto_num_buckets for the target corpus).
- Each task writes the bucket's NEW hashes as one part file via
  write-temp + atomic rename, with a content-derived name, so a Ray task
  retry republishes the same file instead of duplicating index entries.
- Within-batch duplicates collapse in the same task (keep min id),
  matching what a second run would see.

Output: the fresh rows (id, text_sha256). Re-running the same batch yields
zero fresh rows and leaves the index byte-stable — the idempotency
contract the reference gets from the SQL constraint.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path
from typing import TYPE_CHECKING

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from medical_ocr_service_ray.stages.dedup import add_sha_batch

if TYPE_CHECKING:  # pragma: no cover
    import ray.data as rd


def _bucket_from_sha(sha: pd.Series, num_buckets: int) -> pd.Series:
    # first 8 hex chars as int: stable across processes, derived from the
    # hash itself so the index layout is a pure function of content
    return (
        sha.str.slice(0, 8).apply(int, base=16).astype("int64") % num_buckets
    ).astype("int32")


def _index_hashes(bucket_dir: Path) -> set[str]:
    if not bucket_dir.is_dir():
        return set()
    files = sorted(str(p) for p in bucket_dir.glob("part-*.parquet"))
    if not files:
        return set()
    return set(pq.read_table(files, columns=["text_sha256"])["text_sha256"].to_pylist())


def incremental_exact_dedup(
    ds: "rd.Dataset",
    index_dir: str | os.PathLike,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Returns the rows of ``ds`` whose content hash is NOT in the index
    (min ``id_col`` per within-batch duplicate group), appending their
    hashes to the index as a side effect. ``num_buckets`` must stay fixed
    for the lifetime of one index directory (asserted via a marker file)."""
    index_dir = Path(index_dir)
    index_dir.mkdir(parents=True, exist_ok=True)
    marker = index_dir / f".buckets-{num_buckets}"
    existing = [p.name for p in index_dir.glob(".buckets-*")]
    if existing and marker.name not in existing:
        raise ValueError(
            f"index at {index_dir} was built with {existing[0]}, got num_buckets={num_buckets}"
        )
    marker.touch()

    hashed = ds.map_batches(
        lambda t: add_sha_batch(t, text_col), batch_format="pyarrow", zero_copy_batch=True
    ).select_columns([id_col, "text_sha256"])

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _bucket_from_sha(df["text_sha256"], num_buckets)
        return df

    idx_root = str(index_dir)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # map_groups may emit empty zero-column blocks
            return pd.DataFrame(
                {id_col: pd.Series(dtype="int64"), "text_sha256": pd.Series(dtype="object")}
            )
        bucket = int(df["__bucket"].iloc[0])
        bucket_dir = Path(idx_root) / f"b{bucket:04d}"
        seen = _index_hashes(bucket_dir)
        # collapse within-batch duplicates exactly like a rerun would see them
        fresh = (
            df[~df["text_sha256"].isin(seen)]
            .groupby("text_sha256", as_index=False)[[id_col]]
            .min()
        )
        if len(fresh):
            bucket_dir.mkdir(parents=True, exist_ok=True)
            import hashlib

            shas = "".join(sorted(fresh["text_sha256"]))
            name = hashlib.blake2b(shas.encode(), digest_size=12).hexdigest()
            final = bucket_dir / f"part-{name}.parquet"
            if not final.exists():  # retry of the same slice republishes
                tmp = bucket_dir / f".tmp-{uuid.uuid4().hex}.parquet"
                pq.write_table(
                    pa.table({"text_sha256": pa.array(sorted(fresh["text_sha256"]))}),
                    tmp,
                )
                os.replace(tmp, final)
        out = fresh[[id_col, "text_sha256"]].copy()
        out[id_col] = out[id_col].astype("int64")
        return out

    return (
        hashed.map_batches(stamp, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
