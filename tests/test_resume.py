"""Checkpoint/resume semantics (FIXTURES.md F5 + invariant 5): after a
mid-run crash, DONE partitions are not recomputed and the final output is
byte-identical to an uninterrupted run."""

from __future__ import annotations

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _final_table(final_dir):
    t = pq.read_table(sorted(str(p) for p in final_dir.glob("part-*.parquet")))
    return t.take(
        pc.sort_indices(t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )


def test_resume_after_crash(ray_session, unit_corpus, golden_table, tmp_path):
    from medical_ocr_service_ray.config import PipelineConfig
    from medical_ocr_service_ray.state.manifest import (
        Manifest,
        manifest_summary,
        run_resumable_extraction,
    )

    cfg = PipelineConfig(num_buckets=8)

    # uninterrupted reference run
    ref_final = run_resumable_extraction(unit_corpus, tmp_path / "ref", cfg)
    ref = _final_table(ref_final)
    assert ref.select(golden_table.column_names).equals(golden_table)

    # crash after 2 stage-1 partitions
    out = tmp_path / "crashy"
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable_extraction(unit_corpus, out, cfg, fail_after_stage1=2)
    m = Manifest(out / "manifest.jsonl")
    assert m.done(1) == {0, 1}
    assert m.done(2) == set()
    mtimes_before = {
        p.name: (out / "stage1" / p.name).stat().st_mtime for p in (out / "stage1").iterdir()
    }

    # resume: completes the rest without recomputing partitions 0/1
    final = run_resumable_extraction(unit_corpus, out, cfg)
    got = _final_table(final)
    assert got.equals(ref), "resumed output differs from uninterrupted run"

    for name in ("p00000", "p00001"):
        assert (out / "stage1" / name).stat().st_mtime == mtimes_before[name], (
            f"{name} was recomputed on resume"
        )
    entries = m.load()
    assert all(e.attempt == 1 for e in entries), "no partition should need attempt 2"

    summary = manifest_summary(out)
    assert summary["stage1"]["rows"] == golden_table.num_rows
    assert summary["stage2"]["rows"] == golden_table.num_rows
    assert summary["stage1"]["partitions"] == 4  # n_files in the unit corpus


def test_rerun_when_complete_is_noop(ray_session, unit_corpus, tmp_path):
    from medical_ocr_service_ray.config import PipelineConfig
    from medical_ocr_service_ray.state.manifest import Manifest, run_resumable_extraction

    cfg = PipelineConfig(num_buckets=4)
    out = tmp_path / "complete"
    run_resumable_extraction(unit_corpus, out, cfg)
    n_lines = len(Manifest(out / "manifest.jsonl").load())
    run_resumable_extraction(unit_corpus, out, cfg)  # second invocation
    assert len(Manifest(out / "manifest.jsonl").load()) == n_lines, "noop rerun appended entries"
