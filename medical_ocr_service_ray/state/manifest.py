"""Checkpoint manifest + resumable extraction runner.

The Ray-native rebuild of the reference's durable job queue with crash
recovery (src/services/job-queue.service.js:127-162: stale PROCESSING jobs
reset to QUEUED and re-run; results idempotently upserted via content-hash
UNIQUE, database/schema_matching.sql:131). Here the unit of recovery is a
PARTITION, not a job row:

- stage 1 (extraction): one partition per input file; each writes its
  bucket-partitioned intermediate atomically (tmp dir -> rename) and appends
  a manifest line with lineage + metrics.
- stage 2 (ordering): one partition per bucket; reads every stage-1
  intermediate for that bucket, sorts by (conv_id, turn_idx), publishes the
  final part file atomically.

On resume, DONE partitions are skipped; re-running a partial partition is
safe because publication is rename-atomic and deterministic (same input =>
same bytes). Manifest line shape mirrors ``ingestion_jobs``
(database/migration_ingestion_jobs.sql:6-20): partition id, input lineage,
extractor version, rows/bytes/errors/wall_ms metrics, status, attempt.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass
from pathlib import Path

import pyarrow.compute as pc
import pyarrow.parquet as pq

from medical_ocr_service_ray.config import PipelineConfig
from medical_ocr_service_ray.schemas import EXTRACTOR_VERSION


@dataclass
class ManifestEntry:
    stage: int  # 1 = extract, 2 = order/finalize
    partition_id: int  # input-file index (stage 1) or bucket id (stage 2)
    input_file: str
    batch_range: list[int]
    extractor_version: str
    rows: int
    bytes: int
    errors: int
    wall_ms: int
    status: str  # DONE | FAILED
    attempt: int


class Manifest:
    """Append-only JSONL manifest; one line per finished partition attempt.

    With ``secret`` set, every line carries an HMAC-SHA256 signature over its
    canonical JSON (the reference signs its outward-facing webhook records,
    webhook.service.js:63; here the outward-facing record is the manifest)
    and tampered lines raise on load."""

    def __init__(self, path: str | Path, secret: str | None = None):
        self.path = Path(path)
        self.secret = secret

    def load(self) -> list[ManifestEntry]:
        if not self.path.exists():
            return []
        from medical_ocr_service_ray.functions.signing import verify_payload

        entries = []
        for line in self.path.read_text().splitlines():
            if not line.strip():
                continue
            rec = json.loads(line)
            sig = rec.pop("sig", None)
            if self.secret is not None:
                if sig is None or not verify_payload(self.secret, rec, sig):
                    raise ValueError(f"manifest line failed signature check: {line[:120]}")
            entries.append(ManifestEntry(**rec))
        return entries

    def done(self, stage: int) -> set[int]:
        return {e.partition_id for e in self.load() if e.stage == stage and e.status == "DONE"}

    def attempts(self, stage: int, partition_id: int) -> int:
        return sum(
            1 for e in self.load() if e.stage == stage and e.partition_id == partition_id
        )

    def append(self, entry: ManifestEntry) -> None:
        rec = asdict(entry)
        if self.secret is not None:
            from medical_ocr_service_ray.functions.signing import sign_payload

            rec["sig"] = sign_payload(self.secret, asdict(entry))
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())


def _dir_bytes(path: Path) -> int:
    return sum(p.stat().st_size for p in path.rglob("*") if p.is_file())


def run_resumable_extraction(
    input_dir: str | Path,
    output_dir: str | Path,
    cfg: PipelineConfig | None = None,
    fail_after_stage1: int | None = None,
) -> Path:
    """Resumable two-stage extraction. Safe to re-invoke after any crash;
    completed partitions are never recomputed (north-rule checkpoint
    semantics). ``fail_after_stage1`` injects a crash after N stage-1
    partitions (test hook)."""
    import ray
    import ray.data as rd

    from medical_ocr_service_ray.pipelines.extraction import extract_dataset
    from medical_ocr_service_ray.stages.extract import add_bucket_column

    cfg = cfg or PipelineConfig()
    out = Path(output_dir)
    stage1 = out / "stage1"
    final = out / "final"
    for d in (out, stage1, final):
        d.mkdir(parents=True, exist_ok=True)
    manifest = Manifest(out / "manifest.jsonl")

    files = sorted(Path(input_dir).glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    nb = cfg.num_buckets

    # ---- stage 1: per-input-file extraction -> bucketed intermediate ----
    done1 = manifest.done(1)
    completed_this_run = 0
    for pid, f in enumerate(files):
        if pid in done1:
            continue
        part_dir = stage1 / f"p{pid:05d}"
        tmp_dir = stage1 / f"p{pid:05d}.tmp"
        if tmp_dir.exists():
            shutil.rmtree(tmp_dir)  # leftover from a crash mid-write
        t0 = time.time()
        n_rows = pq.read_metadata(f).num_rows
        ds = rd.read_parquet(str(f), columns=["conv_id", "turn_idx", "role", "text"])
        ds = extract_dataset(ds, cfg)
        ds = ds.map_batches(
            lambda t: add_bucket_column(t, nb), batch_format="pyarrow", zero_copy_batch=True
        )
        ds.write_parquet(str(tmp_dir), partition_cols=["bucket"])
        errors = 0
        for bf in tmp_dir.rglob("*.parquet"):
            tbl = pq.read_table(bf, columns=["content_type"])
            errors += pc.sum(pc.equal(tbl["content_type"], "error")).as_py() or 0
        if part_dir.exists():
            shutil.rmtree(part_dir)
        os.replace(tmp_dir, part_dir)  # atomic publish
        manifest.append(
            ManifestEntry(
                stage=1,
                partition_id=pid,
                input_file=str(f),
                batch_range=[0, n_rows],
                extractor_version=cfg.extractor_version_override or EXTRACTOR_VERSION,
                rows=n_rows,
                bytes=_dir_bytes(part_dir),
                errors=errors,
                wall_ms=int((time.time() - t0) * 1000),
                status="DONE",
                attempt=manifest.attempts(1, pid) + 1,
            )
        )
        completed_this_run += 1
        if fail_after_stage1 is not None and completed_this_run >= fail_after_stage1:
            raise RuntimeError(f"injected failure after {completed_this_run} stage-1 partitions")

    # ---- stage 2: per-bucket gather -> sort -> final part file ----
    @ray.remote
    def finalize_bucket(bucket: int, dirs: list[str], final_path: str) -> tuple[int, int]:
        # pq.read_table accepts one directory, but a LIST must be files
        shard_files = [str(p) for d in dirs for p in sorted(Path(d).glob("*.parquet"))]
        table = pq.read_table(shard_files)
        idx = pc.sort_indices(
            table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        table = table.take(idx)
        tmp = final_path + ".tmp"
        pq.write_table(table, tmp, row_group_size=65536)
        os.replace(tmp, final_path)
        return table.num_rows, os.path.getsize(final_path)

    done2 = manifest.done(2)
    pending = []
    for bucket in range(nb):
        if bucket in done2:
            continue
        dirs = sorted(str(d) for d in stage1.glob(f"p*/bucket={bucket}"))
        if not dirs:
            continue
        final_path = str(final / f"part-{bucket:05d}.parquet")
        t0 = time.time()
        pending.append((bucket, dirs, final_path, t0, finalize_bucket.remote(bucket, dirs, final_path)))
    for bucket, dirs, final_path, t0, fut in pending:
        rows, nbytes = ray.get(fut)
        manifest.append(
            ManifestEntry(
                stage=2,
                partition_id=bucket,
                input_file=f"{len(dirs)} stage1 shards",
                batch_range=[0, rows],
                extractor_version=cfg.extractor_version_override or EXTRACTOR_VERSION,
                rows=rows,
                bytes=nbytes,
                errors=0,
                wall_ms=int((time.time() - t0) * 1000),
                status="DONE",
                attempt=manifest.attempts(2, bucket) + 1,
            )
        )
    return final


def manifest_summary(output_dir: str | Path) -> dict:
    """Metrics roll-up across partitions (batch-summary analogue,
    src/services/batch.service.js:218-235 A1/A3): totals per stage."""
    entries = Manifest(Path(output_dir) / "manifest.jsonl").load()
    summary: dict = {}
    for stage in (1, 2):
        es = [e for e in entries if e.stage == stage and e.status == "DONE"]
        # latest attempt per partition only
        latest: dict[int, ManifestEntry] = {}
        for e in es:
            if e.partition_id not in latest or e.attempt > latest[e.partition_id].attempt:
                latest[e.partition_id] = e
        summary[f"stage{stage}"] = {
            "partitions": len(latest),
            "rows": sum(e.rows for e in latest.values()),
            "bytes": sum(e.bytes for e in latest.values()),
            "errors": sum(e.errors for e in latest.values()),
            "wall_ms": sum(e.wall_ms for e in latest.values()),
            "attempts": sum(e.attempt for e in latest.values()),
        }
    return summary
