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


def _corrupted_copy(unit_corpus, tmp_path, bad_idx: int = 2):
    """Copy of the unit corpus with one input file replaced by garbage bytes.
    Returns (corpus_dir, bad_path, original_bytes)."""
    import shutil

    dst = tmp_path / "corpus"
    shutil.copytree(unit_corpus, dst)
    files = sorted(dst.glob("*.parquet"))
    bad = files[bad_idx]
    original = bad.read_bytes()
    bad.write_bytes(b"this is not a parquet file")
    return dst, bad, original


def test_failed_partition_ledger_and_retry(ray_session, unit_corpus, golden_table, tmp_path):
    """Dead-letter semantics: a partition failure appends a FAILED manifest
    line (error class included) without aborting siblings; resume re-runs
    ONLY the failed partition; once the input is repaired the output matches
    the clean run."""
    from medical_ocr_service_ray.config import PipelineConfig
    from medical_ocr_service_ray.state.manifest import Manifest, run_resumable_extraction

    cfg = PipelineConfig(num_buckets=8, max_attempts=3)
    corpus, bad, original = _corrupted_copy(unit_corpus, tmp_path)
    out = tmp_path / "deadletter"

    with pytest.raises(RuntimeError, match="stage-1 partitions failed"):
        run_resumable_extraction(corpus, out, cfg)
    m = Manifest(out / "manifest.jsonl")
    failed = [e for e in m.load() if e.status == "FAILED"]
    assert len(failed) == 1 and failed[0].partition_id == 2
    assert failed[0].error, "FAILED line must record the error class"
    assert m.done(1) == {0, 1, 3}, "sibling partitions must complete"

    # second invocation: retries only partition 2, fails again
    with pytest.raises(RuntimeError, match="stage-1 partitions failed"):
        run_resumable_extraction(corpus, out, cfg)
    m = Manifest(out / "manifest.jsonl")
    assert m.attempts(1, 2) == 2
    assert len([e for e in m.load() if e.stage == 1 and e.status == "DONE"]) == 3

    # repair the input; third attempt succeeds and output == clean run
    bad.write_bytes(original)
    final = run_resumable_extraction(corpus, out, cfg)
    got = _final_table(final)
    assert got.select(golden_table.column_names).equals(golden_table)


def test_attempt_budget_dead_letters_partition(ray_session, unit_corpus, tmp_path):
    """Skip-after-budget: once max_attempts is exhausted the partition is
    not re-run; allow_partial=True finalizes the DONE subset and the summary
    surfaces the dead letter."""
    import pyarrow.parquet as _pq

    from medical_ocr_service_ray.config import PipelineConfig
    from medical_ocr_service_ray.state.manifest import (
        Manifest,
        manifest_summary,
        run_resumable_extraction,
    )

    cfg = PipelineConfig(num_buckets=8, max_attempts=2)
    corpus, bad, _ = _corrupted_copy(unit_corpus, tmp_path)
    out = tmp_path / "budget"

    for _ in range(2):
        with pytest.raises(RuntimeError, match="stage-1 partitions failed"):
            run_resumable_extraction(corpus, out, cfg)
    assert Manifest(out / "manifest.jsonl").attempts(1, 2) == 2

    # budget exhausted: the partition is SKIPPED (attempts unchanged), not retried
    with pytest.raises(RuntimeError, match="dead-lettered"):
        run_resumable_extraction(corpus, out, cfg)
    assert Manifest(out / "manifest.jsonl").attempts(1, 2) == 2

    final = run_resumable_extraction(corpus, out, cfg, allow_partial=True)
    summary = manifest_summary(out)
    assert summary["stage1"]["failed_partitions"] == [2]
    assert summary["stage1"]["failed_errors"][2]
    good_rows = sum(
        _pq.read_metadata(f).num_rows
        for f in sorted(corpus.glob("*.parquet"))
        if f != bad
    )
    assert _final_table(final).num_rows == good_rows


def test_resume_lineage_change_recomputes(ray_session, unit_corpus, tmp_path):
    """Resume identity is (partition_id, input_file), not position alone:
    removing an input file shifts indices, so every shifted partition must
    recompute and the final output must match a fresh oracle run over the
    remaining files (no stale stage-1 data may leak in)."""
    import shutil

    from medical_ocr_service_ray.config import PipelineConfig
    from medical_ocr_service_ray.oracle import oracle_extract_dir
    from medical_ocr_service_ray.state.manifest import run_resumable_extraction

    corpus = tmp_path / "corpus"
    shutil.copytree(unit_corpus, corpus)
    cfg = PipelineConfig(num_buckets=8)
    out = tmp_path / "lineage"
    run_resumable_extraction(corpus, out, cfg)

    sorted(corpus.glob("*.parquet"))[0].unlink()  # drop the first input file
    final = run_resumable_extraction(corpus, out, cfg)
    got = _final_table(final)
    expected = oracle_extract_dir(corpus)
    assert got.select(expected.column_names).equals(expected)


def test_parallel_stage1_matches_sequential(ray_session, unit_corpus, golden_table, tmp_path):
    """Concurrent stage-1 partitions (thread pool of independent pipelines)
    must produce byte-identical output to the sequential path."""
    from medical_ocr_service_ray.config import PipelineConfig
    from medical_ocr_service_ray.state.manifest import run_resumable_extraction

    # 1-actor pools so 2 concurrent pipelines fit the 4-CPU test cluster
    cfg = PipelineConfig(num_buckets=8, extract_concurrency=1)
    final = run_resumable_extraction(
        unit_corpus, tmp_path / "par", cfg, stage1_parallelism=2
    )
    got = _final_table(final)
    assert got.select(golden_table.column_names).equals(golden_table)


def test_transient_error_retried_in_run(ray_session, unit_corpus, golden_table, tmp_path, monkeypatch):
    """Retry domain separation: a transient (retryable-classified) failure
    gets ONE immediate in-run retry and the run completes; the FAILED line
    records retryable=True. Deterministic errors (e.g. malformed input) are
    classified non-retryable and wait for resume — covered by
    test_failed_partition_ledger_and_retry."""
    from medical_ocr_service_ray import state
    from medical_ocr_service_ray.config import PipelineConfig
    from medical_ocr_service_ray.pipelines import extraction as ext_mod
    from medical_ocr_service_ray.state.manifest import Manifest, run_resumable_extraction

    real = ext_mod.extract_dataset
    calls = {"n": 0}

    def flaky(ds, cfg=None):
        calls["n"] += 1
        if calls["n"] == 2:  # second partition's first attempt blows up
            raise OSError("transient: connection reset")
        return real(ds, cfg)

    monkeypatch.setattr(ext_mod, "extract_dataset", flaky)
    cfg = PipelineConfig(num_buckets=8)
    final = run_resumable_extraction(unit_corpus, tmp_path / "flaky", cfg)
    got = _final_table(final)
    assert got.select(golden_table.column_names).equals(golden_table)

    entries = Manifest(tmp_path / "flaky" / "manifest.jsonl").load()
    failed = [e for e in entries if e.status == "FAILED"]
    assert len(failed) == 1 and failed[0].retryable is True
    assert failed[0].attempt == 1
    done_same = [
        e for e in entries
        if e.stage == 1 and e.partition_id == failed[0].partition_id and e.status == "DONE"
    ]
    assert len(done_same) == 1 and done_same[0].attempt == 2


def test_nonretryable_classification():
    import pyarrow as pa

    from medical_ocr_service_ray.state.manifest import classify_retryable

    assert classify_retryable(OSError("reset")) is True
    assert classify_retryable(ValueError("bad")) is False
    assert classify_retryable(pa.lib.ArrowInvalid("not parquet")) is False
    wrapped = RuntimeError("task died")
    wrapped.__cause__ = ValueError("inner")
    assert classify_retryable(wrapped) is False
