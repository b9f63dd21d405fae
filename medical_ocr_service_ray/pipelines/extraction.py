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
    sort_group_by_turn,
)


def read_transcripts(input_dir: str | Path) -> "rd.Dataset":
    files = sorted(str(p) for p in Path(input_dir).glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    # prune at the read: extraction needs exactly these columns
    return rd.read_parquet(files, columns=["conv_id", "turn_idx", "role", "text", "ts"])


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
    )


def finalize_ordered(ds: "rd.Dataset", cfg: PipelineConfig | None = None) -> "rd.Dataset":
    """Keyed stable-ordering stage: one shuffle on the bucket key, then an
    in-bucket (conv_id, turn_idx) sort. Bucket count bounds per-task memory;
    long conversations never split across buckets so ordering is total per
    conversation."""
    cfg = cfg or PipelineConfig()
    nb = cfg.num_buckets
    ds = ds.map_batches(
        lambda t: add_bucket_column(t, nb), batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby("bucket").map_groups(sort_group_by_turn, batch_format="pyarrow")


def run_extraction_pipeline(
    input_dir: str | Path,
    output_dir: str | Path | None = None,
    cfg: PipelineConfig | None = None,
    ordered: bool = True,
) -> "rd.Dataset":
    """Build (and optionally write) the full pipeline. Returns the lazy
    Dataset; callers consume it (write_parquet/iter_batches/to_pandas)."""
    cfg = cfg or PipelineConfig()
    ds = extract_dataset(read_transcripts(input_dir), cfg)
    if ordered:
        ds = finalize_ordered(ds, cfg)
    if output_dir is not None:
        ds = ds.drop_columns(["bucket"]) if ordered else ds
        ds.write_parquet(str(output_dir))
    return ds


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
