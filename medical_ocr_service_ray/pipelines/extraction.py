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
        fn_constructor_kwargs={"extractor_version": cfg.extractor_version_override},
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
    # NOTE: push-based shuffle (which more than halves this stage's exchange
    # cost — measured 41s -> 27s on 600k turns / 32 CPUs) must be enabled on
    # the DataContext BEFORE the source dataset is created: Ray Data snapshots
    # the context at dataset creation, so setting it here would not affect
    # this pipeline and would leak into unrelated later ones. The entry points
    # (run_extraction_pipeline, bench, run_job) set-and-restore it around
    # dataset construction.
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
    Dataset; callers consume it (write_parquet/iter_batches/to_pandas)."""
    from ray.data import DataContext

    cfg = cfg or PipelineConfig()
    # enable push-based shuffle for THIS pipeline only: the context is
    # snapshotted when the source dataset is created, so set -> create ->
    # restore scopes the flag without a session-wide side effect
    ctx = DataContext.get_current()
    prev_push = ctx.use_push_based_shuffle
    ctx.use_push_based_shuffle = True
    try:
        ds = extract_dataset(read_transcripts(input_dir), cfg)
        if ordered:
            ds = finalize_ordered(ds, cfg)
    finally:
        ctx.use_push_based_shuffle = prev_push
    if output_dir is not None:
        ds = ds.drop_columns(["bucket"]) if ordered else ds
        ds.write_parquet(str(output_dir))
    return ds


def run_extraction_fs_bucketed(
    input_dir: str | Path,
    output_dir: str | Path,
    cfg: PipelineConfig | None = None,
) -> None:
    """Two-pass bucketed output (the production/headline path):

    pass 1: extract -> add bucket -> ``write_parquet(partition_cols=[bucket])``
            (the all-to-all exchange happens through the filesystem: each task
            appends its rows to every bucket directory it touches — no
            distributed sort machinery in the hot path);
    pass 2: one task per bucket: read the bucket dir, sort by
            (conv_id, turn_idx), write ONE final part file atomically.

    Advantages at scale: the only barrier is per bucket (a preempted run
    resumes at bucket granularity — see state/manifest.py), the final files
    are the sorted, dedupable unit the north rule requires, and the tail cost
    beyond raw extraction is a cheap local sort per bucket."""
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
    # coalesce blocks first: the partitioned write emits one file per
    # (block, bucket) pair — without this it is blocks x buckets tiny files
    ds = ds.repartition(max(32, nb // 2))
    ds = ds.map_batches(
        lambda t: add_bucket_column(t, nb), batch_format="pyarrow", zero_copy_batch=True
    )
    # the intermediate is ephemeral and usually on tmpfs: compression buys
    # nothing there and costs encode CPU
    ds.write_parquet(str(tmp), partition_cols=["bucket"], compression="NONE")

    @ray.remote
    def finalize_bucket(bucket_dir: str, final_path: str, dedup: bool) -> int:
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

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
        tmp_path = final_path + ".tmp"
        _pq.write_table(table, tmp_path, row_group_size=65536)
        import os

        os.replace(tmp_path, final_path)  # atomic publish
        return table.num_rows

    bucket_dirs = sorted(tmp.glob("bucket=*"))
    futures = [
        finalize_bucket.remote(
            str(d), str(out / f"part-{int(d.name.split('=')[1]):05d}.parquet"),
            cfg.dedup_turns,
        )
        for d in bucket_dirs
    ]
    ray.get(futures)
    import shutil

    shutil.rmtree(tmp)


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
