"""The two production output paths — run_extraction_fs_bucketed (fast,
ephemeral intermediates) and run_resumable_extraction (durable checkpointed
intermediates) — must produce identical final data for the same input."""

from __future__ import annotations

import pyarrow.compute as pc
import pyarrow.parquet as pq


def _sorted_table(path_glob):
    t = pq.read_table([str(p) for p in path_glob])
    return t.take(
        pc.sort_indices(t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )


def test_fs_bucketed_equals_resumable(ray_session, unit_corpus, tmp_path):
    from medical_ocr_service_ray.config import PipelineConfig
    from medical_ocr_service_ray.pipelines.extraction import run_extraction_fs_bucketed
    from medical_ocr_service_ray.state.manifest import run_resumable_extraction

    cfg = PipelineConfig(num_buckets=8)
    fast_out = tmp_path / "fast"
    run_extraction_fs_bucketed(unit_corpus, fast_out, cfg)
    durable_final = run_resumable_extraction(unit_corpus, tmp_path / "durable", cfg)

    a = _sorted_table(sorted(fast_out.glob("part-*.parquet")))
    b = _sorted_table(sorted(durable_final.glob("part-*.parquet")))
    assert a.num_rows == b.num_rows
    # column order may differ between writers; compare aligned
    b = b.select(a.column_names)
    assert a.equals(b), "fs-bucketed and resumable outputs diverge"
