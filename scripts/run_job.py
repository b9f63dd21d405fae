"""Cluster entry point for the extraction pipeline (the `ray job submit`
launch path from the north rule). On a real cluster:

    ray job submit --working-dir . -- \
        python scripts/run_job.py --input s3://bucket/transcripts \
            --output s3://bucket/extracted --num-buckets 4096 --resumable

Single-node (this sandbox):

    python scripts/run_job.py --input /tmp/mosr_transcripts/sf0.01 \
        --output /tmp/mosr_job_out --num-buckets 32 --resumable

The script owns the Ray session (connects to the cluster via RAY_ADDRESS when
submitted as a job, falls back to local otherwise) and always shuts down so
the next run starts clean. With --resumable, re-submitting the same job after
a crash/preemption skips DONE partitions (state/manifest.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="directory of transcript parquet files")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--num-buckets", type=int, default=64,
                    help="ordering/output buckets (~input_bytes / 1 GiB at scale)")
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--concurrency", type=int, default=None,
                    help="extraction actor pool size (default: cluster CPUs - 2)")
    ap.add_argument("--dedup-turns", action="store_true",
                    help="collapse duplicated (conv_id, turn_idx) input rows")
    ap.add_argument("--resumable", action="store_true",
                    help="checkpointed two-stage run with manifest (resume on re-submit)")
    ap.add_argument("--max-attempts", type=int, default=3,
                    help="per-partition attempt budget before dead-lettering (resumable)")
    ap.add_argument("--allow-partial", action="store_true",
                    help="finalize the DONE subset even when partitions are dead-lettered")
    ap.add_argument("--stage1-parallelism", type=int, default=None,
                    help="concurrent stage-1 file partitions (default: auto from CPUs)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit`, RAY_ADDRESS points at the cluster; standalone
        # runs get a local session
        ray.init(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from medical_ocr_service_ray.config import PipelineConfig

    cfg = PipelineConfig(
        batch_size=args.batch_size,
        extract_concurrency=args.concurrency,
        num_buckets=args.num_buckets,
        dedup_turns=args.dedup_turns,
        max_attempts=args.max_attempts,
    )
    t0 = time.time()
    if args.resumable:
        from medical_ocr_service_ray.state.manifest import (
            manifest_summary,
            run_resumable_extraction,
        )

        final = run_resumable_extraction(
            args.input,
            args.output,
            cfg,
            allow_partial=args.allow_partial,
            stage1_parallelism=args.stage1_parallelism,
        )
        summary = manifest_summary(args.output)
        print(json.dumps({"final_dir": str(final), "wall_s": round(time.time() - t0, 1),
                          **summary}))
    else:
        from medical_ocr_service_ray.pipelines.extraction import run_extraction_fs_bucketed

        run_extraction_fs_bucketed(args.input, args.output, cfg)
        print(json.dumps({"final_dir": args.output, "wall_s": round(time.time() - t0, 1)}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
