"""North-rule correctness gate: Ray pipeline output == single-process oracle,
per turn, under stable (conv_id, turn_idx) ordering; plus ordering/parallelism
invariance properties (FIXTURES.md invariants 1-4)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _sorted(table: pa.Table) -> pa.Table:
    order = pc.sort_indices(
        table, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return table.take(order)


@pytest.fixture(scope="module")
def ray_result(ray_session, unit_corpus):
    from medical_ocr_service_ray.pipelines.extraction import extraction_result_table

    return extraction_result_table(unit_corpus)


class TestGoldenParity:
    def test_per_turn_equality(self, ray_result, golden_table):
        assert ray_result.num_rows == golden_table.num_rows
        assert ray_result.equals(golden_table), "Ray output != oracle golden"

    def test_extracted_text_column_byte_equal(self, ray_result, golden_table):
        assert ray_result["extracted_text"].equals(golden_table["extracted_text"])

    def test_spans_equal(self, ray_result, golden_table):
        assert ray_result["spans"].equals(golden_table["spans"])


class TestInvariance:
    def test_physical_order_independence(self, ray_session, unit_corpus, golden_table, tmp_path):
        """Shuffling input row order must not change output (invariant 2)."""
        import numpy as np

        from medical_ocr_service_ray.pipelines.extraction import extraction_result_table

        files = sorted(unit_corpus.glob("*.parquet"))
        table = pa.concat_tables([pq.read_table(f) for f in files])
        perm = np.random.default_rng(7).permutation(table.num_rows)
        shuffled = table.take(perm)
        shuf_dir = tmp_path / "shuffled"
        shuf_dir.mkdir()
        third = table.num_rows // 3 + 1
        for i in range(3):
            pq.write_table(shuffled.slice(i * third, third), shuf_dir / f"t-{i}.parquet")
        res = extraction_result_table(shuf_dir)
        assert res.equals(golden_table)

    def test_partitioning_independence(self, ray_session, unit_corpus, golden_table):
        """Different bucket count / batch size => identical output (invariant 3)."""
        from medical_ocr_service_ray.config import PipelineConfig
        from medical_ocr_service_ray.pipelines.extraction import extraction_result_table

        res = extraction_result_table(
            unit_corpus, cfg=PipelineConfig(batch_size=64, num_buckets=7, extract_concurrency=3)
        )
        assert res.equals(golden_table)

    def test_write_then_read_roundtrip(self, ray_session, unit_corpus, golden_table, tmp_path):
        from medical_ocr_service_ray.pipelines.extraction import run_extraction_pipeline

        out = tmp_path / "out"
        run_extraction_pipeline(unit_corpus, output_dir=out)
        got = _sorted(pq.read_table(out))
        assert got.equals(golden_table)


class TestErrorCapture:
    def test_bad_rows_become_error_rows(self, ray_session):
        import ray.data as rd

        from medical_ocr_service_ray.pipelines.extraction import extract_dataset

        bad = pa.table(
            {
                "conv_id": pa.array(["c1"] * 3),
                "turn_idx": pa.array([0, 1, 2], pa.int32()),
                "role": pa.array(["user"] * 3),
                "text": pa.array([None, "ok text", "\x00\x01"]),
                "tool": pa.array([""] * 3),
                "ts": pa.array([0] * 3, pa.timestamp("us")),
            }
        )
        res = extract_dataset(rd.from_arrow(bad))
        table = pa.Table.from_pandas(res.to_pandas())
        assert table.num_rows == 3  # no row lost, nothing raised
