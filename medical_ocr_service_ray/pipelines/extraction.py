"""The flagship pipeline: transcripts -> extracted text + spans, Ray-Data-first.

Shape (SURVEY.md §7):
    read_parquet(transcripts)
      -> map_batches(TurnExtractor, batch_format="pyarrow")   # per-turn, embarrassingly parallel
      -> [optional exact dedup on text_sha256]
      -> add bucket = crc32(conv_id) % P                      # the one partitioning key
      -> groupby(bucket).map_groups(sort by (conv_id, turn_idx))  # keyed stable ordering
      -> write_parquet / return

Never calls ray.init/ray.shutdown (driver owns the session). Streaming
end-to-end: nothing materializes the full dataset.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa

import ray.data as rd

from medical_ocr_service_ray.config import PipelineConfig
from medical_ocr_service_ray.stages.extract import (
    TurnExtractor,
    add_bucket_column,
    dedup_turns_in_bucket,
    sort_group_by_turn,
)


def read_transcripts(input_dir: str | Path) -> "rd.Dataset":
    files = sorted(str(p) for p in Path(input_dir).glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    # prune at the read: extraction needs exactly these columns (ts/tool are
    # not consumed by any extraction stage and never leave storage)
    return rd.read_parquet(files, columns=["conv_id", "turn_idx", "role", "text"])


def extract_dataset(ds: "rd.Dataset", cfg: PipelineConfig | None = None) -> "rd.Dataset":
    cfg = cfg or PipelineConfig()
    # actor pool (callable class): setup once per actor. Default pool size =
    # cluster CPUs (read/write stages are cheap and interleave); an
    # autoscaling (min,max) ramps too slowly for short jobs.
    if cfg.extract_concurrency is not None:
        concurrency = cfg.extract_concurrency
    else:
        import ray

        total_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # leave 2 CPUs for the read/write/shuffle stages: actors HOLD their
        # CPU for their lifetime, so a pool of size == cluster CPUs deadlocks
        # the upstream read.
        concurrency = max(2, total_cpus - 2)
    return ds.map_batches(
        TurnExtractor,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
        fn_constructor_kwargs={
            "extractor_version": cfg.extractor_version_override,
            "fail_text_marker": cfg.fail_text_marker,
        },
        concurrency=concurrency,
        # transient-failure retry budget (the reference's 3-attempt job retry,
        # job-queue.service.js:217-238): dead actors restart, in-flight batches
        # retry; per-ROW errors never raise (captured as error rows instead)
        max_restarts=2,
        max_task_retries=3,
    )


def finalize_ordered(ds: "rd.Dataset", cfg: PipelineConfig | None = None) -> "rd.Dataset":
    """Keyed stable-ordering stage: one shuffle on the bucket key, then an
    in-bucket (conv_id, turn_idx) sort. Bucket count bounds per-task memory;
    long conversations never split across buckets so ordering is total per
    conversation."""
    cfg = cfg or PipelineConfig()
    nb = cfg.num_buckets
    # NOTE: this stage's groupby sort needs push-based shuffle (more than
    # halves the exchange cost — 41s -> 27s on 600k turns / 32 CPUs); Ray
    # reads the strategy at EXECUTION time, so the engine's entry points set
    # it session-persistently via config.set_engine_shuffle_profile().
    # coalesce extractor output into ~nb blocks first: fewer, larger shuffle
    # map inputs (measured 37.6s -> 29.2s on 600k turns / 32 CPUs)
    ds = ds.repartition(nb)
    ds = ds.map_batches(
        lambda t: add_bucket_column(t, nb), batch_format="pyarrow", zero_copy_batch=True
    )
    group_fn = dedup_turns_in_bucket if cfg.dedup_turns else sort_group_by_turn
    return ds.groupby("bucket").map_groups(group_fn, batch_format="pyarrow")


def run_extraction_pipeline(
    input_dir: str | Path,
    output_dir: str | Path | None = None,
    cfg: PipelineConfig | None = None,
    ordered: bool = True,
) -> "rd.Dataset":
    """Build (and optionally write) the full pipeline. Returns the lazy
    Dataset; callers consume it (write_parquet/iter_batches/to_pandas).

    Sets the engine's push-based shuffle profile (see
    ``config.set_engine_shuffle_profile``: Ray reads the strategy
    at execution time, and the returned Dataset is lazy, so the setting must
    persist past this call)."""
    from medical_ocr_service_ray.config import set_engine_shuffle_profile

    cfg = cfg or PipelineConfig()
    set_engine_shuffle_profile()
    ds = extract_dataset(read_transcripts(input_dir), cfg)
    if ordered:
        ds = finalize_ordered(ds, cfg)
    if output_dir is not None:
        ds = ds.drop_columns(["bucket"]) if ordered else ds
        ds.write_parquet(str(output_dir))
    return ds


def shard_content_name(part: pa.Table) -> str:
    """Content-derived, retry-idempotent shard name: blake2b over vectorized
    64-bit per-row hashes of the FULL key columns (conv_id, turn_idx) plus the
    row count — NOT a prefix. A Ray task retry re-emitting the same slice
    produces the same name (second publish is a harmless overwrite of
    identical bytes); two distinct slices that happen to share a 64-row prefix
    and row count must NOT collide (collision = one slice silently overwrites
    the other = row loss under the 1:1 input/output parity contract)."""
    import hashlib

    import pandas as _pd

    h = hashlib.blake2b(digest_size=10)
    h.update(_pd.util.hash_array(part["conv_id"].to_numpy(zero_copy_only=False)).tobytes())
    h.update(
        part["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False).astype("int64").tobytes()
    )
    h.update(str(part.num_rows).encode())
    return h.hexdigest()


def run_extraction_fs_bucketed(
    input_dir: str | Path,
    output_dir: str | Path,
    cfg: PipelineConfig | None = None,
) -> None:
    """Two-pass bucketed output (the production/headline path):

    pass 1: extract -> STREAMING bucket-shard writer: a stateless
            ``map_batches`` stage that slices each (large) batch by bucket
            and writes one uncompressed shard file per (batch, bucket)
            immediately. The all-to-all exchange happens through the
            filesystem with NO barrier — writer tasks run pipelined with the
            extraction actors under the streaming executor, so the write
            cost hides under extraction compute (the previous
            ``repartition -> write_parquet(partition_cols)`` materialized
            every block before the first byte hit disk: a hard barrier that
            cost the end-to-end path ~25% at 32 CPUs).
    pass 2: one task per bucket: read the bucket dir, sort by
            (conv_id, turn_idx), write ONE final part file atomically.

    Shard names are content-derived (blake2b of the slice's key columns), so
    a retried writer task republishes the same file instead of duplicating
    rows (rename-atomic, same bytes). Advantages at scale: the only barrier
    is per bucket (a preempted run resumes at bucket granularity — see
    state/manifest.py), the final files are the sorted, dedupable unit the
    north rule requires, and the tail beyond raw extraction is one cheap
    local sort per bucket."""
    import os

    import ray

    cfg = cfg or PipelineConfig()
    out = Path(output_dir)
    # the stage-1 intermediate is EPHEMERAL shuffle data (rebuilt on retry):
    # place it on fast scratch (tmpfs) when available — the durable,
    # checkpointed variant of this pipeline is state/manifest.py, which keeps
    # its intermediates next to the output on purpose.
    scratch = os.environ.get("MOSR_SCRATCH")
    if scratch is None and Path("/dev/shm").is_dir():
        scratch = "/dev/shm/mosr_scratch"
    tmp = (Path(scratch) if scratch else out.parent) / (out.name + ".stage1")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    tmp.parent.mkdir(parents=True, exist_ok=True)
    out.mkdir(parents=True, exist_ok=True)

    ds = extract_dataset(read_transcripts(input_dir), cfg)
    nb = cfg.num_buckets
    tmp_str = str(tmp)

    def write_shards(batch: pa.Table) -> pa.Table:
        """Slice one batch by bucket and publish each slice as a shard file.
        Large batch_size bounds the file count at ~(rows/batch_size) x the
        buckets a batch actually touches; uncompressed because the
        intermediate is ephemeral (usually tmpfs) and encode CPU buys
        nothing there."""
        import os as _os

        import pyarrow.parquet as _pq

        batch = add_bucket_column(batch, nb)
        buckets = batch["bucket"]
        out_rows = []
        for bucket in pa.compute.unique(buckets).to_pylist():
            part = batch.filter(pa.compute.equal(buckets, bucket)).drop_columns(["bucket"])
            d = _os.path.join(tmp_str, f"bucket={bucket}")
            _os.makedirs(d, exist_ok=True)
            name = _os.path.join(d, f"shard-{shard_content_name(part)}.parquet")
            _pq.write_table(part, name + ".tmp", compression="NONE")
            _os.replace(name + ".tmp", name)  # retry-idempotent publish
            out_rows.append((bucket, part.num_rows))
        return pa.table(
            {
                "bucket": pa.array([b for b, _ in out_rows], pa.int32()),
                "rows": pa.array([r for _, r in out_rows], pa.int64()),
            }
        )

    @ray.remote
    def finalize_bucket(
        bucket_dir: str, final_path: str, errors_path: str, dedup: bool, codec: str
    ) -> int:
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        from medical_ocr_service_ray.stages.extract import (
            publish_bucket_tables,
            split_error_rows,
        )

        table = _pq.read_table(bucket_dir)
        if dedup:
            # honor cfg.dedup_turns on this output path too (it sorts and
            # collapses duplicated (conv_id, turn_idx) rows)
            table = dedup_turns_in_bucket(table)
        else:
            idx = _pc.sort_indices(
                table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
            table = table.take(idx)
        good, errs = split_error_rows(table)
        publish_bucket_tables(good, final_path, errs, errors_path, codec)
        return good.num_rows

    try:
        # consume the tiny summary stream: this drives the pipelined
        # extract -> write execution end to end with no barrier. Fractional
        # num_cpus: the extraction actor pool holds CPUs-2 for its lifetime,
        # so 1-CPU writer tasks would serialize on the 2 leftover slots and
        # drain as a post-extraction tail; the write is a brief uncompressed
        # encode + (usually tmpfs) copy, so mild oversubscription overlaps it
        # fully. Inside the try: a pass-1 failure must also clean the scratch.
        ds.map_batches(
            write_shards, batch_format="pyarrow", batch_size=32768, num_cpus=0.25
        ).count()

        bucket_dirs = sorted(tmp.glob("bucket=*"))
        futures = [
            finalize_bucket.remote(
                str(d), str(out / f"part-{int(d.name.split('=')[1]):05d}.parquet"),
                str(out / "errors" / f"part-{int(d.name.split('=')[1]):05d}.parquet"),
                cfg.dedup_turns, cfg.output_compression,
            )
            for d in bucket_dirs
        ]
        ray.get(futures)
    finally:
        # the intermediate is ephemeral shuffle data (often tmpfs): never
        # leak it, even when a finalize task raises
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


def extraction_result_table(input_dir: str | Path, cfg: PipelineConfig | None = None) -> pa.Table:
    """Small-scale helper for tests: run the pipeline and return one Arrow
    table sorted by (conv_id, turn_idx) for golden comparison."""
    import ray

    ds = run_extraction_pipeline(input_dir, cfg=cfg, ordered=True)
    # Ray's map_groups can emit empty zero-column blocks for empty partitions
    blocks = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
    table = pa.concat_tables(blocks).combine_chunks()
    if "bucket" in table.column_names:
        table = table.drop_columns(["bucket"])
    order = pa.compute.sort_indices(
        table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return table.take(order)
