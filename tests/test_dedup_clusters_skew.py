"""Dedup cluster components + input-duplication idempotency + skew stress."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


class TestDedupClusters:
    def test_components_and_min_cluster_ids(self):
        from medical_ocr_service_ray.stages.dedup import dedup_clusters

        pairs = pd.DataFrame(
            {"doc_a": [1, 2, 10, 20, 21], "doc_b": [2, 3, 11, 21, 22]}
        )
        out = dedup_clusters(pairs)
        by_doc = dict(zip(out.doc_id, out.cluster_id))
        assert by_doc[1] == by_doc[2] == by_doc[3] == 1
        assert by_doc[10] == by_doc[11] == 10
        assert by_doc[20] == by_doc[21] == by_doc[22] == 20
        sizes = dict(zip(out.doc_id, out.cluster_size))
        assert sizes[3] == 3 and sizes[10] == 2 and sizes[22] == 3

    def test_transitive_chain_order_independent(self):
        from medical_ocr_service_ray.stages.dedup import dedup_clusters

        chain = pd.DataFrame({"doc_a": [5, 4, 3, 2], "doc_b": [6, 5, 4, 3]})
        rev = chain.iloc[::-1].reset_index(drop=True)
        a, b = dedup_clusters(chain), dedup_clusters(rev)
        assert a.equals(b)
        assert set(a.cluster_id) == {2} and (a.cluster_size == 5).all()


class TestInputDuplicationIdempotency:
    def test_duplicated_rows_collapse(self, ray_session, unit_corpus, golden_table, tmp_path):
        """FIXTURES invariant 4: duplicated input rows (same conv_id,
        turn_idx, text) collapse to one output row with dedup_turns=True."""
        import ray

        from medical_ocr_service_ray.config import PipelineConfig
        from medical_ocr_service_ray.pipelines.extraction import run_extraction_pipeline

        files = sorted(unit_corpus.glob("*.parquet"))
        table = pa.concat_tables([pq.read_table(f) for f in files])
        dup_dir = tmp_path / "dup"
        dup_dir.mkdir()
        pq.write_table(table, dup_dir / "a.parquet")
        pq.write_table(table.slice(0, 500), dup_dir / "b.parquet")  # 500 dup rows

        ds = run_extraction_pipeline(
            dup_dir, cfg=PipelineConfig(num_buckets=8, dedup_turns=True), ordered=True
        )
        blocks = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows > 0]
        got = pa.concat_tables(blocks).combine_chunks()
        got = got.drop_columns(["bucket"])
        got = got.take(
            pc.sort_indices(got, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
        )
        assert got.num_rows == golden_table.num_rows  # dups collapsed
        assert got.equals(golden_table)


class TestSkew:
    def test_single_giant_conversation(self, ray_session, tmp_path):
        """A 20k-turn conversation (hot key) flows through the ordered
        pipeline without error and stays correctly ordered (SURVEY §4.3.1)."""
        import numpy as np

        from medical_ocr_service_ray.config import PipelineConfig
        from medical_ocr_service_ray.pipelines.extraction import extraction_result_table
        from medical_ocr_service_ray.schemas import TRANSCRIPT_SCHEMA

        n = 20_000
        rng = np.random.default_rng(3)
        perm = rng.permutation(n)
        table = pa.table(
            {
                "conv_id": pa.array(["conv-giant"] * n, pa.string()),
                "turn_idx": pa.array(perm, pa.int32()),  # shuffled physical order
                "role": pa.array(["user"] * n, pa.string()),
                "text": pa.array([f"turno {i} TOMOGRAFIA 01/02/2024" for i in perm], pa.string()),
                "tool": pa.array([""] * n, pa.string()),
                "ts": pa.array(range(n), pa.timestamp("us")),
            },
            schema=TRANSCRIPT_SCHEMA,
        )
        d = tmp_path / "giant"
        d.mkdir()
        half = n // 2
        pq.write_table(table.slice(0, half), d / "a.parquet")
        pq.write_table(table.slice(half), d / "b.parquet")
        res = extraction_result_table(d, cfg=PipelineConfig(num_buckets=8))
        assert res.num_rows == n
        assert res["turn_idx"].to_pylist() == list(range(n))  # total order restored
        assert res["extracted_text"][0].as_py() == "turno 0 TOMOGRAFIA 2024-02-01"


class TestDistributedClusters:
    """Distributed min-label propagation must equal driver union-find."""

    def _check(self, pairs_df):
        import ray.data as rd

        from medical_ocr_service_ray.stages.dedup import (
            dedup_clusters,
            dedup_clusters_distributed,
        )

        expected = dedup_clusters(pairs_df).reset_index(drop=True)
        got = (
            dedup_clusters_distributed(rd.from_pandas(pairs_df))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expected)

    def test_matches_unionfind_basic(self, ray_session):
        self._check(
            pd.DataFrame({"doc_a": [1, 2, 10, 20, 21], "doc_b": [2, 3, 11, 21, 22]})
        )

    def test_matches_unionfind_chain_diameter(self, ray_session):
        """A 12-node chain needs ~diameter rounds of propagation (kept small:
        every round is a full keyed shuffle on the 4-CPU test cluster)."""
        self._check(pd.DataFrame({"doc_a": list(range(12)), "doc_b": list(range(1, 13))}))

    def test_matches_unionfind_skewed_star(self, ray_session):
        """One hub connected to 500 spokes (the hot-cluster case) plus
        disjoint small clusters."""
        import numpy as np

        hub = pd.DataFrame({"doc_a": [1000] * 500, "doc_b": list(range(1001, 1501))})
        small = pd.DataFrame({"doc_a": [1, 5, 7], "doc_b": [2, 6, 8]})
        rng = np.random.default_rng(9)
        pairs = pd.concat([hub, small], ignore_index=True)
        pairs = pairs.iloc[rng.permutation(len(pairs))].reset_index(drop=True)
        self._check(pairs)
