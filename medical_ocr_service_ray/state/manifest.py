"""Checkpoint manifest + resumable extraction runner.

The Ray-native rebuild of the reference's durable job queue with crash
recovery (src/services/job-queue.service.js:127-162: stale PROCESSING jobs
reset to QUEUED and re-run; results idempotently upserted via content-hash
UNIQUE, database/schema_matching.sql:131) and its dead-letter capture
(src/services/webhook.service.js:99-202 `webhook_failures` insert; FAILED
state with a 3-attempt budget at src/services/job-queue.service.js:217-238).
Here the unit of recovery is a PARTITION, not a job row:

- stage 1 (extraction): one partition per input file; partitions run
  CONCURRENTLY (a bounded thread pool of independent Ray Data pipelines);
  each writes its bucket-partitioned intermediate atomically (tmp dir ->
  rename) and appends a manifest line with lineage + metrics. A partition
  failure appends a ``status=FAILED`` line with the error class — the
  dead-letter ledger — and does not abort the other partitions.
- stage 2 (ordering): one partition per bucket; reads every stage-1
  intermediate for that bucket, sorts by (conv_id, turn_idx), publishes the
  final part file atomically.

On resume, DONE partitions are skipped only when their recorded input-file
lineage still matches (adding/removing input files must not make positional
ids skip the wrong data); FAILED partitions re-run until ``cfg.max_attempts``
is exhausted, after which they are dead-lettered (skipped, surfaced in
``manifest_summary``, and the run raises unless ``allow_partial=True``).
Re-running a partial partition is safe because publication is rename-atomic
and deterministic (same input => same bytes). Manifest line shape mirrors
``ingestion_jobs`` (database/migration_ingestion_jobs.sql:6-20): partition
id, input lineage, extractor version, rows/bytes/errors/wall_ms metrics,
status, attempt, error class.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import asdict, dataclass
from pathlib import Path

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
    error: str = ""  # error class/message for FAILED lines (dead-letter)
    retryable: bool = True  # False = deterministic error, retry won't help
    # stage-2 only: fingerprint of the stage-1 state (lineage + attempt ids)
    # this bucket was finalized against. A bucket counts DONE on resume only
    # when its fingerprint matches the CURRENT stage-1 state — durable
    # invalidation that survives a crash between a stage-1 re-run and
    # stage-2 completion (in-memory invalidation would silently keep stale
    # bucket files in that window).
    fingerprint: str = ""


# Retry domain separation (the reference classifies non-retryable statuses
# before burning retry budget, src/utils/retry.js:11-59): deterministic
# input/logic errors fail the same way every time, so the runner dead-letters
# them for THIS run immediately instead of re-running; transient
# infrastructure errors get one immediate in-run retry. Cross-run resume may
# retry either kind (the operator may have repaired the input), bounded by
# cfg.max_attempts.
NON_RETRYABLE_ERRORS: tuple[type[BaseException], ...] = (
    ValueError,
    TypeError,
    KeyError,
    FileNotFoundError,
)


def classify_retryable(exc: BaseException) -> bool:
    """True if the error class suggests a retry could succeed. Unwraps
    Ray's task-error cause chain; ArrowInvalid (malformed input) counts as
    non-retryable."""
    import pyarrow as pa

    seen = 0
    cur: BaseException | None = exc
    while cur is not None and seen < 8:
        if isinstance(cur, NON_RETRYABLE_ERRORS + (pa.lib.ArrowInvalid,)):
            return False
        cur = getattr(cur, "cause", None) or cur.__cause__
        seen += 1
    return True


class Manifest:
    """Append-only JSONL manifest; one line per finished partition attempt.

    Entries are cached in memory after the first load — ``append`` updates
    both the file and the cache, so repeated ``done()``/``attempts()`` calls
    are O(1) in file size, not O(P^2) re-parses. Thread-safe: stage-1
    partitions append from concurrent worker threads.

    With ``secret`` set, every line carries an HMAC-SHA256 signature over its
    canonical JSON (the reference signs its outward-facing webhook records,
    webhook.service.js:63; here the outward-facing record is the manifest)
    and tampered lines raise on load."""

    def __init__(self, path: str | Path, secret: str | None = None):
        self.path = Path(path)
        self.secret = secret
        self._lock = threading.Lock()
        self._entries: list[ManifestEntry] | None = None

    def _load_locked(self) -> list[ManifestEntry]:
        if self._entries is not None:
            return self._entries
        entries: list[ManifestEntry] = []
        if self.path.exists():
            from medical_ocr_service_ray.functions.signing import verify_payload

            for line in self.path.read_text().splitlines():
                if not line.strip():
                    continue
                rec = json.loads(line)
                sig = rec.pop("sig", None)
                if self.secret is not None:
                    if sig is None or not verify_payload(self.secret, rec, sig):
                        raise ValueError(f"manifest line failed signature check: {line[:120]}")
                entries.append(ManifestEntry(**rec))
        self._entries = entries
        return entries

    def load(self) -> list[ManifestEntry]:
        with self._lock:
            # return a copy: callers iterate while appends may happen
            return list(self._load_locked())

    def done(self, stage: int) -> set[int]:
        return {e.partition_id for e in self.load() if e.stage == stage and e.status == "DONE"}

    def done_matching(self, stage: int, lineage: dict[int, str]) -> set[int]:
        """DONE partition ids whose recorded input_file also matches the
        current lineage — a positional id alone is not resume identity
        (input files added/removed between runs would shift indices and skip
        the wrong data)."""
        return {
            e.partition_id
            for e in self.load()
            if e.stage == stage
            and e.status == "DONE"
            and lineage.get(e.partition_id) == e.input_file
        }

    def attempts(self, stage: int, partition_id: int) -> int:
        return sum(
            1 for e in self.load() if e.stage == stage and e.partition_id == partition_id
        )

    def attempts_matching(self, stage: int, partition_id: int, input_file: str) -> int:
        """Attempts recorded against THIS input file only — when a partition
        id's input file changes between runs (lineage shift), the new file
        gets a fresh attempt budget instead of inheriting the old file's
        spent budget."""
        return sum(
            1
            for e in self.load()
            if e.stage == stage and e.partition_id == partition_id and e.input_file == input_file
        )

    def done_fingerprints(self, stage: int) -> dict[int, set[str]]:
        """partition_id -> set of fingerprints its DONE lines carry."""
        out: dict[int, set[str]] = {}
        for e in self.load():
            if e.stage == stage and e.status == "DONE":
                out.setdefault(e.partition_id, set()).add(e.fingerprint)
        return out

    def append(self, entry: ManifestEntry) -> None:
        rec = asdict(entry)
        if self.secret is not None:
            from medical_ocr_service_ray.functions.signing import sign_payload

            rec["sig"] = sign_payload(self.secret, asdict(entry))
        with self._lock:
            entries = self._load_locked()
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
                f.flush()
                os.fsync(f.fileno())
            entries.append(entry)


def _dir_bytes(path: Path) -> int:
    return sum(p.stat().st_size for p in path.rglob("*") if p.is_file())


def stage1_fingerprint(manifest: Manifest, lineage: dict[int, str]) -> str:
    """Deterministic digest of the CURRENT stage-1 state: for every partition
    of the current lineage with a matching DONE line, its (pid, input_file,
    latest attempt). Any stage-1 re-run bumps an attempt number — and any
    lineage change swaps an input_file — so stage-2 DONE lines recorded
    against an older state stop matching, durably."""
    import hashlib

    latest: dict[int, int] = {}
    for e in manifest.load():
        if e.stage == 1 and e.status == "DONE" and lineage.get(e.partition_id) == e.input_file:
            if e.attempt > latest.get(e.partition_id, -1):
                latest[e.partition_id] = e.attempt
    canon = json.dumps([[pid, lineage[pid], att] for pid, att in sorted(latest.items())])
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


def _preseed_fsspec_http_stub() -> None:
    """Defuse a concurrent-import race in Ray Data's path resolution.

    Every read/write dataset creation calls path_util._is_http_filesystem,
    which tries ``from fsspec.implementations.http import HTTPFileSystem``.
    When aiohttp is absent that import FAILS every time (so Python re-runs it
    on every call), and two driver threads importing it concurrently can
    observe a partially-initialized module — an ImportError that Ray's
    ``except ModuleNotFoundError`` does not catch. Pre-seeding a stub module
    (only when the real import is impossible anyway) makes every later import
    a no-op sys.modules hit, eliminating the race for concurrent pipelines."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return  # real module available: nothing to do
    except ImportError:
        pass
    try:
        import fsspec  # noqa: F401
    except ImportError:  # pragma: no cover - fsspec ships with ray[data]
        return
    stub = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # placeholder: aiohttp absent, real class can't load
        pass

    stub.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = stub


def run_resumable_extraction(
    input_dir: str | Path,
    output_dir: str | Path,
    cfg: PipelineConfig | None = None,
    fail_after_stage1: int | None = None,
    allow_partial: bool = False,
    stage1_parallelism: int | None = None,
) -> Path:
    """Resumable two-stage extraction. Safe to re-invoke after any crash;
    completed partitions are never recomputed (north-rule checkpoint
    semantics). Partition failures are dead-lettered (``status=FAILED``
    manifest lines with the error class) instead of aborting sibling
    partitions; FAILED partitions re-run on resume until ``cfg.max_attempts``
    is exhausted. With ``allow_partial=True`` a run with exhausted partitions
    still finalizes the DONE subset (the reference's job queue likewise keeps
    serving around permanently-FAILED jobs); the default raises so callers
    cannot silently lose data.

    ``fail_after_stage1`` injects a crash after N stage-1 partitions (test
    hook; forces sequential stage-1 so the crash point is deterministic)."""
    import ray
    import ray.data as rd

    from medical_ocr_service_ray.pipelines.extraction import extract_dataset
    from medical_ocr_service_ray.stages.extract import add_bucket_column, dedup_turns_in_bucket

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
    lineage = {pid: str(f) for pid, f in enumerate(files)}

    @ray.remote
    def count_error_rows(shard_file: str) -> int:
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        tbl = _pq.read_table(shard_file, columns=["content_type"])
        return _pc.sum(_pc.equal(tbl["content_type"], "error")).as_py() or 0

    # ---- stage 1: per-input-file extraction -> bucketed intermediate ----
    done1 = manifest.done_matching(1, lineage)
    exhausted: list[int] = []
    pending1: list[int] = []
    for pid in range(len(files)):
        if pid in done1:
            continue
        if manifest.attempts_matching(1, pid, lineage[pid]) >= cfg.max_attempts:
            exhausted.append(pid)  # dead-lettered: budget spent on THIS file, skip
            continue
        pending1.append(pid)

    crash_lock = threading.Lock()
    completed_this_run = 0
    injected: list[RuntimeError] = []

    def run_partition(pid: int) -> None:
        nonlocal completed_this_run
        f = files[pid]
        part_dir = stage1 / f"p{pid:05d}"
        tmp_dir = stage1 / f"p{pid:05d}.tmp"

        def attempt_once() -> bool:
            """One extraction attempt; appends its own manifest line.
            Returns True on success, False on a FAILED (recorded) attempt."""
            if tmp_dir.exists():
                shutil.rmtree(tmp_dir)  # leftover from a crash mid-write
            t0 = time.time()
            attempt = manifest.attempts_matching(1, pid, str(f)) + 1
            try:
                n_rows = pq.read_metadata(f).num_rows
                ds = rd.read_parquet(str(f), columns=["conv_id", "turn_idx", "role", "text"])
                ds = extract_dataset(ds, cfg)
                ds = ds.map_batches(
                    lambda t: add_bucket_column(t, nb),
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                )
                ds.write_parquet(str(tmp_dir), partition_cols=["bucket"])
                # error-row count: parallel remote tasks over the just-written
                # shards (never a sequential driver re-read between partitions)
                shard_files = [str(p) for p in tmp_dir.rglob("*.parquet")]
                errors = sum(ray.get([count_error_rows.remote(s) for s in shard_files]))
                if part_dir.exists():
                    shutil.rmtree(part_dir)
                os.replace(tmp_dir, part_dir)  # atomic publish
            except Exception as exc:
                manifest.append(
                    ManifestEntry(
                        stage=1,
                        partition_id=pid,
                        input_file=str(f),
                        batch_range=[0, 0],
                        extractor_version=cfg.extractor_version_override or EXTRACTOR_VERSION,
                        rows=0,
                        bytes=0,
                        errors=0,
                        wall_ms=int((time.time() - t0) * 1000),
                        status="FAILED",
                        attempt=attempt,
                        error=f"{type(exc).__name__}: {exc}"[:300],
                        retryable=classify_retryable(exc),
                    )
                )
                return False
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
                    attempt=attempt,
                )
            )
            return True

        ok = attempt_once()
        if not ok:
            last = [e for e in manifest.load() if e.stage == 1 and e.partition_id == pid][-1]
            # transient error class: one immediate in-run retry (the
            # reference's within-job retry domain); deterministic errors
            # wait for resume (the input may get repaired between runs)
            if last.retryable and manifest.attempts_matching(1, pid, str(f)) < cfg.max_attempts:
                ok = attempt_once()
        if not ok:
            return
        with crash_lock:
            completed_this_run += 1
            if fail_after_stage1 is not None and completed_this_run >= fail_after_stage1:
                raise RuntimeError(
                    f"injected failure after {completed_this_run} stage-1 partitions"
                )

    if fail_after_stage1 is not None:
        # deterministic crash point for the test hook: sequential
        for pid in pending1:
            run_partition(pid)
    elif pending1:
        # bounded concurrency: each partition is its own Ray Data pipeline
        # (internally parallel), so a small pool keeps the cluster fed while
        # many-small-file corpora don't serialize on the driver loop
        total_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # each pipeline's actor pool HOLDS its CPUs for life: the per-pipeline
        # pool must be sized so workers x (pool + read/write headroom) fits
        # the cluster, or the pools deadlock the upstream reads
        workers = stage1_parallelism or min(4, len(pending1), max(1, total_cpus // 8))
        if workers <= 1:
            for pid in pending1:
                run_partition(pid)
        else:
            if cfg.extract_concurrency is None:
                from dataclasses import replace

                per_pipeline = max(1, (total_cpus - workers) // workers)
                cfg = replace(cfg, extract_concurrency=per_pipeline)
            _preseed_fsspec_http_stub()
            # warm every other lazy import path serially before fanning out
            run_partition(pending1[0])
            pending1_rest = pending1[1:]
            with ThreadPoolExecutor(max_workers=workers) as pool:
                futures = {pool.submit(run_partition, pid): pid for pid in pending1_rest}
                for fut in futures:
                    exc = fut.exception()
                    if exc is not None:
                        injected.append(exc)  # pragma: no cover - appends never raise here
    if injected:  # pragma: no cover
        raise injected[0]

    failed_now = sorted(
        pid for pid in pending1 if pid not in manifest.done_matching(1, lineage)
    )
    dead = sorted(
        set(exhausted)
        | {p for p in failed_now
           if manifest.attempts_matching(1, p, lineage[p]) >= cfg.max_attempts}
    )
    if (failed_now or exhausted) and not allow_partial:
        raise RuntimeError(
            f"stage-1 partitions failed: {failed_now or exhausted} "
            f"(dead-lettered after {cfg.max_attempts} attempts: {dead}); "
            "re-invoke to retry, or pass allow_partial=True to finalize the DONE subset"
        )

    # ---- stage 2: per-bucket gather -> sort -> final part file ----
    @ray.remote
    def finalize_bucket(
        bucket: int, dirs: list[str], final_path: str, errors_path: str,
        dedup: bool, codec: str,
    ) -> tuple[int, int]:
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        from medical_ocr_service_ray.stages.extract import (
            publish_bucket_tables,
            split_error_rows,
        )

        # pq.read_table accepts one directory, but a LIST must be files
        shard_files = [str(p) for d in dirs for p in sorted(Path(d).glob("*.parquet"))]
        table = _pq.read_table(shard_files)
        if dedup:
            table = dedup_turns_in_bucket(table)  # sorts + collapses dup turns
        else:
            idx = _pc.sort_indices(
                table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
            table = table.take(idx)
        # error-row quarantine: failed rows land in errors/, never in final/
        good, errs = split_error_rows(table)
        publish_bucket_tables(good, final_path, errs, errors_path, codec)
        return good.num_rows, os.path.getsize(final_path)

    # a bucket's final file is a function of EVERY stage-1 partition: a
    # bucket counts DONE only when its recorded stage-1 fingerprint matches
    # the CURRENT stage-1 state (durable invalidation — survives a crash
    # between a stage-1 re-run and stage-2 completion; overwriting is safe
    # because publication is atomic + deterministic). On a pure noop rerun
    # every fingerprint matches and the DONE set short-circuits everything.
    fp_now = stage1_fingerprint(manifest, lineage)
    done2 = {
        b for b, fps in manifest.done_fingerprints(2).items() if fp_now in fps
    }
    # only partitions DONE under the CURRENT lineage feed stage 2: a p{pid}
    # dir left by an older lineage (failed/changed partition under
    # allow_partial) must not leak its stale rows into the final output
    current_parts = [
        stage1 / f"p{pid:05d}" for pid in sorted(manifest.done_matching(1, lineage))
    ]
    pending2 = []
    for bucket in range(nb):
        if bucket in done2:
            continue
        # shards restricted to the CURRENT lineage's partitions — a stale
        # p* dir from a removed input file must not leak into the output
        dirs = sorted(str(p / f"bucket={bucket}") for p in current_parts
                      if (p / f"bucket={bucket}").is_dir())
        if not dirs:
            continue
        final_path = str(final / f"part-{bucket:05d}.parquet")
        errors_path = str(out / "errors" / f"part-{bucket:05d}.parquet")
        t0 = time.time()
        pending2.append(
            (bucket, dirs, final_path, t0,
             finalize_bucket.remote(bucket, dirs, final_path, errors_path,
                                    cfg.dedup_turns, cfg.output_compression))
        )
    stage2_failed: list[int] = []
    for bucket, dirs, final_path, t0, fut in pending2:
        attempt = manifest.attempts(2, bucket) + 1  # cross-state history: monotone id
        try:
            rows, nbytes = ray.get(fut)
        except Exception as exc:
            stage2_failed.append(bucket)
            manifest.append(
                ManifestEntry(
                    stage=2,
                    partition_id=bucket,
                    input_file=f"{len(dirs)} stage1 shards",
                    batch_range=[0, 0],
                    extractor_version=cfg.extractor_version_override or EXTRACTOR_VERSION,
                    rows=0,
                    bytes=0,
                    errors=0,
                    wall_ms=int((time.time() - t0) * 1000),
                    status="FAILED",
                    attempt=attempt,
                    error=f"{type(exc).__name__}: {exc}"[:300],
                    fingerprint=fp_now,
                )
            )
            continue
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
                attempt=attempt,
                fingerprint=fp_now,
            )
        )
    if stage2_failed and not allow_partial:
        raise RuntimeError(f"stage-2 buckets failed: {stage2_failed}; re-invoke to retry")
    return final


def manifest_summary(output_dir: str | Path) -> dict:
    """Metrics roll-up across partitions (batch-summary analogue,
    src/services/batch.service.js:218-235 A1/A3): totals per stage, plus the
    dead-letter view — partitions whose LATEST attempt is FAILED."""
    entries = Manifest(Path(output_dir) / "manifest.jsonl").load()
    summary: dict = {}
    for stage in (1, 2):
        es = [e for e in entries if e.stage == stage]
        # latest attempt per partition only
        latest: dict[int, ManifestEntry] = {}
        for e in es:
            if e.partition_id not in latest or e.attempt > latest[e.partition_id].attempt:
                latest[e.partition_id] = e
        done = {pid: e for pid, e in latest.items() if e.status == "DONE"}
        failed = {pid: e for pid, e in latest.items() if e.status != "DONE"}
        summary[f"stage{stage}"] = {
            "partitions": len(done),
            "rows": sum(e.rows for e in done.values()),
            "bytes": sum(e.bytes for e in done.values()),
            "errors": sum(e.errors for e in done.values()),
            "wall_ms": sum(e.wall_ms for e in done.values()),
            "attempts": sum(e.attempt for e in latest.values()),
            "failed_partitions": sorted(failed),
            "failed_errors": {pid: e.error for pid, e in sorted(failed.items())},
        }
    return summary
