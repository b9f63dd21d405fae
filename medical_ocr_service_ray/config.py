"""Pipeline configuration (the reference's env-var knobs as a dataclass:
WORKER_CONCURRENCY / BATCH_MAX_CONCURRENCY / MAX_FILE_SIZE_MB —
src/services/job-queue.service.js:5, src/services/batch.service.js:13)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # rows per extraction batch: HTML/PDF parse is ~0.5-1 ms/row of Python
    # work; 1024 measured best (512: -7% from task overhead, 2048: -5% from
    # imbalance at the tail).
    batch_size: int = 1024
    # actor-pool size for the stateful extraction stage; None = stateless tasks
    # that autoscale to the cluster. (min, max) tuples also accepted by Ray.
    extract_concurrency: int | tuple[int, int] | None = None
    # hash buckets for the keyed ordering stage. At 100 TB choose
    # total_bytes / ~1 GiB so one bucket fits comfortably in a task heap;
    # here sized for shuffle parallelism at 32 CPUs (measured best at 64
    # with block coalescing; >64 explodes the partitioned-write file count).
    num_buckets: int = 64
    # NOTE on salting (SURVEY.md §4.3.1): extraction is per-turn, so no stage
    # before the final ordering groups by conv_id — there is nothing to salt.
    # The ordering stage must keep a conversation whole (total per-conv order),
    # so its skew bound is the largest single conversation, verified by the
    # 20k-turn hot-key stress test rather than by key salting.
    extractor_version_override: str | None = None
    # idempotency pre-step (D1): collapse duplicated (conv_id, turn_idx) rows
    # to one output row in the ordering stage. Off by default (golden parity
    # assumes 1:1 input/output).
    dedup_turns: bool = False
    # codec for the durable final part files: zstd writes ~30% fewer bytes
    # than snappy for this text-heavy schema at similar encode cost — and the
    # single shared disk, not CPU, is the measured bottleneck of the write
    # tail (BASELINE.md variance attribution).
    output_compression: str = "zstd"
    # per-partition attempt budget for the resumable runner (the reference's
    # 3-attempt job retry before permanent FAILED, job-queue.service.js:221):
    # a partition whose attempts are exhausted is dead-lettered — skipped on
    # resume and surfaced in manifest_summary — instead of retried forever.
    max_attempts: int = 3
    # TEST HOOK (same policy as run_resumable_extraction's fail_after_stage1):
    # rows whose text contains this marker raise inside the extractor and are
    # captured as error rows — the only way to exercise the error-quarantine
    # path deterministically, since extract_turn is total on real string
    # inputs. None in production.
    fail_text_marker: str | None = None


def set_engine_shuffle_profile() -> None:
    """Set push-based sort shuffle as the session's execution profile.

    Every keyed stage in this engine rides ``groupby(bucket)`` sorts;
    push-based shuffle cuts their flat exchange cost ~3x (measured: q15 at
    sf0.01 3.8 s -> 1.2 s; round-1: ordering stage 41 s -> 27 s). Ray reads
    the strategy at EXECUTION time, and most queries return lazy Datasets
    the caller consumes later, so a set-and-restore scope cannot work — the
    engine's entry points set it deliberately and persistently (documented
    here rather than leaked as a side effect from mid-pipeline code; a
    caller that needs pull-based shuffle for a different workload can reset
    ``DataContext.get_current().shuffle_strategy`` afterwards)."""
    from ray.data.context import DataContext, ShuffleStrategy

    DataContext.get_current().shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    _silence_schema_hash_warning()


def _silence_schema_hash_warning() -> None:
    """Filter Ray Data's per-batch "Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'" warning. It fires inside
    ``unify_schemas``'s *early-exit optimization* (``set(schemas)``) whenever
    a block schema isn't hashable — the unify itself still succeeds, so the
    message is pure noise, but at one line per schema-unify it floods bench
    logs and buries real warnings. Scoped to that exact message prefix on
    that exact logger; everything else passes through."""
    import logging

    class _Drop(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:  # pragma: no cover
            return not str(record.getMessage()).startswith(
                "Failed to hash the schemas (for deduplication)"
            )

    logger = logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow")
    if not any(isinstance(f, _Drop) for f in logger.filters):
        logger.addFilter(_Drop())

    class _DropEmptySchemaDivergence(logging.Filter):
        """Ray's streaming executor warns when an operator bundle's schema
        differs from the previous bundle's. When the NEW schema is EMPTY
        ("new schema: .") the bundle is a zero-column empty block — the
        map_groups empty-partition artifact, not a real divergence (the
        executor itself early-exits when the OLD schema is empty, just not
        in this direction). Drop exactly that case; genuine divergences
        print a non-empty schema and pass through."""

        def filter(self, record: logging.LogRecord) -> bool:  # pragma: no cover
            msg = str(record.getMessage())
            return not (
                "Operator produced a RefBundle with a different schema" in msg
                and "new schema: . This may lead" in msg
            )

    ex_logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(isinstance(f, _DropEmptySchemaDivergence) for f in ex_logger.filters):
        ex_logger.addFilter(_DropEmptySchemaDivergence())
