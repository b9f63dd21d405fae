"""Round-3 hardening: full-key shard naming, size-derived bucket counts,
error-row quarantine, durable stage-2 invalidation, and per-lineage attempt
budgets (VERDICT r2 items 2/4/8 + ADVICE high/medium)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _final_table(final_dir):
    t = pq.read_table(sorted(str(p) for p in final_dir.glob("part-*.parquet")))
    return t.take(
        pc.sort_indices(t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )


class TestShardContentName:
    def test_shared_prefix_distinct_tails_do_not_collide(self):
        """Two slices with identical first-64 keys AND identical row count
        must get different shard names (the old prefix hash collided here —
        silent row loss on a simulated task retry)."""
        from medical_ocr_service_ray.pipelines.extraction import shard_content_name

        prefix_conv = [f"c{i:04d}" for i in range(64)]
        prefix_turn = list(range(64))
        a = pa.table(
            {
                "conv_id": prefix_conv + [f"tail_a{i}" for i in range(36)],
                "turn_idx": pa.array(prefix_turn + list(range(36)), pa.int32()),
            }
        )
        b = pa.table(
            {
                "conv_id": prefix_conv + [f"tail_b{i}" for i in range(36)],
                "turn_idx": pa.array(prefix_turn + list(range(36)), pa.int32()),
            }
        )
        assert shard_content_name(a) != shard_content_name(b)

    def test_retry_idempotent(self):
        """Same logical slice (even re-chunked) -> same name, so a Ray task
        retry republishes over its own file instead of duplicating rows."""
        from medical_ocr_service_ray.pipelines.extraction import shard_content_name

        t = pa.table(
            {
                "conv_id": [f"c{i}" for i in range(100)],
                "turn_idx": pa.array(list(range(100)), pa.int32()),
            }
        )
        rechunked = pa.concat_tables([t.slice(0, 37), t.slice(37)])
        assert shard_content_name(t) == shard_content_name(rechunked)


class TestAutoNumBuckets:
    def test_grows_with_input_bytes(self):
        from medical_ocr_service_ray.stages.aggregate import auto_num_buckets

        assert auto_num_buckets(0) == 16  # floor
        assert auto_num_buckets(10 * (1 << 30)) == 16  # below floor*1GiB
        assert auto_num_buckets(100 * (1 << 30)) == 100
        assert auto_num_buckets(100 * (1 << 40)) == 4096  # ceiling
        small = auto_num_buckets(1 << 20)
        big = auto_num_buckets(512 * (1 << 30))
        assert big > small

    def test_dataset_input_bytes_from_parquet(self, ray_session, unit_corpus):
        import ray.data as rd

        from medical_ocr_service_ray.stages.aggregate import dataset_input_bytes

        import os

        files = sorted(str(p) for p in unit_corpus.glob("*.parquet"))
        ds = rd.read_parquet(files)
        expected = sum(os.path.getsize(f) for f in files)
        assert dataset_input_bytes(ds) == expected > 0

    def test_from_arrow_falls_back_to_floor(self, ray_session):
        import ray.data as rd

        from medical_ocr_service_ray.stages.aggregate import (
            auto_num_buckets,
            dataset_input_bytes,
        )

        ds = rd.from_arrow(pa.table({"x": [1, 2, 3]}))
        assert auto_num_buckets(dataset_input_bytes(ds)) == 16


class TestErrorQuarantine:
    @pytest.fixture(scope="class")
    def marked_corpus(self, tmp_path_factory):
        """Unit-size corpus where a known subset of rows carries the
        fail_text_marker, so the extractor's error-row path fires."""
        from medical_ocr_service_ray.synth import generate_transcripts

        out = tmp_path_factory.mktemp("marked") / "corpus"
        corpus = generate_transcripts(out, 1000, seed=7, n_files=3)
        # stamp the marker into ~1/50 rows of each file, deterministically
        for f in sorted(corpus.glob("*.parquet")):
            t = pq.read_table(f)
            texts = t["text"].to_pylist()
            n_marked = 0
            for i in range(0, len(texts), 50):
                texts[i] = (texts[i] or "") + " __BOOM__"
                n_marked += 1
            assert n_marked
            t = t.set_column(
                t.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
            )
            pq.write_table(t, f)
        return corpus

    def test_resumable_path_quarantines(self, ray_session, marked_corpus, tmp_path):
        from medical_ocr_service_ray.config import PipelineConfig
        from medical_ocr_service_ray.state.manifest import (
            manifest_summary,
            run_resumable_extraction,
        )

        cfg = PipelineConfig(num_buckets=4, fail_text_marker="__BOOM__")
        final = run_resumable_extraction(marked_corpus, tmp_path / "out", cfg)
        got = _final_table(final)
        err_files = sorted((tmp_path / "out" / "errors").glob("part-*.parquet"))
        assert err_files, "no quarantine files were written"
        errs = pq.read_table([str(p) for p in err_files])

        n_input = sum(
            pq.read_metadata(f).num_rows for f in sorted(marked_corpus.glob("*.parquet"))
        )
        assert errs.num_rows > 0
        assert got.num_rows + errs.num_rows == n_input, "quarantine lost/duplicated rows"
        assert set(pc.unique(errs["content_type"]).to_pylist()) == {"error"}
        assert "error" not in set(pc.unique(got["content_type"]).to_pylist()), (
            "error rows leaked into final/"
        )
        # manifest still counts them (stage-1 error metric unchanged)
        assert manifest_summary(tmp_path / "out")["stage1"]["errors"] == errs.num_rows

    def test_fs_bucketed_path_quarantines(self, ray_session, marked_corpus, tmp_path):
        from medical_ocr_service_ray.config import PipelineConfig
        from medical_ocr_service_ray.pipelines.extraction import run_extraction_fs_bucketed

        cfg = PipelineConfig(num_buckets=4, fail_text_marker="__BOOM__")
        out = tmp_path / "fast"
        run_extraction_fs_bucketed(marked_corpus, out, cfg)
        got = _final_table(out)
        err_files = sorted((out / "errors").glob("part-*.parquet"))
        assert err_files
        errs = pq.read_table([str(p) for p in err_files])
        n_input = sum(
            pq.read_metadata(f).num_rows for f in sorted(marked_corpus.glob("*.parquet"))
        )
        assert got.num_rows + errs.num_rows == n_input
        assert "error" not in set(pc.unique(got["content_type"]).to_pylist())


class TestDurableStage2Invalidation:
    def test_crash_between_stage1_rerun_and_stage2(self, ray_session, unit_corpus, tmp_path):
        """ADVICE r2 (high): repair-rerun a FAILED partition, crash before
        stage 2, then resume with pending1 empty. In-memory invalidation
        would skip every bucket (stale final files missing the repaired
        rows); the durable stage-1 fingerprint must force re-finalize."""
        import shutil

        from medical_ocr_service_ray.config import PipelineConfig
        from medical_ocr_service_ray.oracle import oracle_extract_dir
        from medical_ocr_service_ray.state.manifest import run_resumable_extraction

        corpus = tmp_path / "corpus"
        shutil.copytree(unit_corpus, corpus)
        files = sorted(corpus.glob("*.parquet"))
        bad = files[1]
        original = bad.read_bytes()
        bad.write_bytes(b"not parquet")

        cfg = PipelineConfig(num_buckets=4)
        out = tmp_path / "out"
        # run 1: partition 1 FAILS, rest finalize (partial output published)
        final = run_resumable_extraction(corpus, out, cfg, allow_partial=True)
        partial_rows = _final_table(final).num_rows

        # repair, then crash AFTER the stage-1 re-run, BEFORE stage 2
        bad.write_bytes(original)
        with pytest.raises(RuntimeError, match="injected failure"):
            run_resumable_extraction(corpus, out, cfg, fail_after_stage1=1)

        # resume: pending1 is now empty — the buggy path would short-circuit
        # stage 2 entirely and keep the stale partial finals
        final = run_resumable_extraction(corpus, out, cfg)
        got = _final_table(final)
        expected = oracle_extract_dir(corpus)
        assert got.num_rows > partial_rows
        assert got.select(expected.column_names).equals(expected), (
            "stale bucket files survived the stage-1 re-run"
        )


class TestPerLineageAttemptBudget:
    def test_attempts_matching_ignores_other_files(self, tmp_path):
        from medical_ocr_service_ray.state.manifest import Manifest, ManifestEntry

        m = Manifest(tmp_path / "m.jsonl")
        for attempt in (1, 2, 3):
            m.append(
                ManifestEntry(
                    stage=1, partition_id=0, input_file="/data/old.parquet",
                    batch_range=[0, 0], extractor_version="v", rows=0, bytes=0,
                    errors=0, wall_ms=1, status="FAILED", attempt=attempt,
                )
            )
        assert m.attempts(1, 0) == 3
        assert m.attempts_matching(1, 0, "/data/old.parquet") == 3
        # same positional id, different file => fresh budget
        assert m.attempts_matching(1, 0, "/data/new.parquet") == 0

    def test_new_file_at_same_pid_gets_fresh_budget(self, ray_session, unit_corpus, tmp_path):
        """Exhaust the budget on a corrupt file, then REPLACE it (new path at
        the same positional index). The new lineage must run — not inherit
        the dead-letter — and the final output must match the oracle."""
        import shutil

        from medical_ocr_service_ray.config import PipelineConfig
        from medical_ocr_service_ray.oracle import oracle_extract_dir
        from medical_ocr_service_ray.state.manifest import run_resumable_extraction

        corpus = tmp_path / "corpus"
        shutil.copytree(unit_corpus, corpus)
        files = sorted(corpus.glob("*.parquet"))
        bad = files[2]
        original = bad.read_bytes()
        bad.write_bytes(b"not parquet")

        cfg = PipelineConfig(num_buckets=4, max_attempts=1)
        out = tmp_path / "out"
        run_resumable_extraction(corpus, out, cfg, allow_partial=True)
        # budget for the bad file is spent
        run_resumable_extraction(corpus, out, cfg, allow_partial=True)

        # replace: delete the corrupt file, add the repaired data under a new
        # name that sorts into the same position
        bad.unlink()
        repaired = bad.with_name(bad.stem + "_repaired.parquet")
        repaired.write_bytes(original)

        final = run_resumable_extraction(corpus, out, cfg)
        got = _final_table(final)
        expected = oracle_extract_dir(corpus)
        assert got.select(expected.column_names).equals(expected)


class TestInvertedIndex:
    """q41: token -> (df, cf, top-k postings by tf) as exploded scalar rows,
    hash-exact vs a DuckDB window-function oracle."""

    DOCS = [
        (1, "the cat sat on the the mat"),
        (2, "the dog the dog the dog"),
        (3, ""),
        (4, "Ünïcödé wörds ünïcödé"),
        (5, "cat dog cat dog"),  # tf tie -> doc_id asc breaks it
        (6, "the"), (7, "the"), (8, "the"), (9, "the"), (10, "the"),
        (11, "the"),  # 7 docs with tf('the')=1 -> k=5 cutoff exercised
    ]

    def _ray(self, k, num_buckets=4):
        import pyarrow as pa
        import ray.data as rd

        from medical_ocr_service_ray.stages.text import inverted_index

        t = pa.table(
            {
                "doc_id": pa.array([d for d, _ in self.DOCS], pa.int64()),
                "text": pa.array([x for _, x in self.DOCS], pa.string()),
            }
        )
        out = inverted_index(
            rd.from_arrow(t).repartition(3), k=k, num_buckets=num_buckets
        ).to_pandas()
        return out.sort_values(["token", "rank"]).reset_index(drop=True)

    def _oracle(self, k):
        import duckdb
        import pandas as pd

        from medical_ocr_service_ray.pipelines.queries import _Q41_SQL

        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(self.DOCS, columns=["doc_id", "text"]),
        )
        sql = _Q41_SQL.replace("r.rank <= 5", f"r.rank <= {k}")
        out = con.execute(sql).fetchdf()
        return out.sort_values(["token", "rank"]).reset_index(drop=True)

    def test_matches_oracle(self, ray_session):
        got, exp = self._ray(k=5), self._oracle(k=5)
        pd_assert = __import__("pandas").testing.assert_frame_equal
        pd_assert(got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False)

    def test_k_cutoff_and_tie_order(self, ray_session):
        got = self._ray(k=2)
        the = got[got.token == "the"]
        assert list(the["rank"]) == [1, 2]
        # tf desc first (doc 2 has tf=3, doc 1 tf=3 -> doc_id asc)
        assert the.iloc[0].doc_id == 1 and the.iloc[0].tf == 3
        assert int(the.df.iloc[0]) == 8  # df counts ALL docs, not just top-k
        pd_assert = __import__("pandas").testing.assert_frame_equal
        exp = self._oracle(k=2)
        pd_assert(got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False)

    def test_bucket_count_invariant(self, ray_session):
        a, b = self._ray(k=5, num_buckets=2), self._ray(k=5, num_buckets=9)
        __import__("pandas").testing.assert_frame_equal(a, b)


class TestRunningAggregates:
    """q42: per-key running window features, hash-exact vs SQL windows."""

    def _events(self):
        import pandas as pd

        return pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5, 6, 7],
                "ts": pd.to_datetime(
                    format="ISO8601",
                    arg=[
                        "2026-01-01 00:00:00",
                        "2026-01-01 00:00:00",  # tie with event 1 -> event_id order
                        "2026-01-01 00:00:59.999999",  # sub-second gap floors to 59
                        "2026-01-02 00:00:00",
                        "2026-01-01 05:00:00",
                        "2026-01-01 06:30:00",
                        "2026-03-01 00:00:00",  # singleton user
                    ]
                ).astype("datetime64[us]"),
                "user_id": [10, 10, 10, 10, 20, 20, 30],
                "value": [1.5, -2.25, 0.0001, 100.0, 3.0, -3.0, 7.0],
            }
        )

    def _ray(self, num_buckets=4):
        import ray.data as rd

        from medical_ocr_service_ray.stages.window import running_aggregates

        out = running_aggregates(
            rd.from_pandas(self._events()).repartition(3),
            key="user_id",
            order_cols=["ts", "event_id"],
            cum_sum_col="value",
            gap_from="ts",
            num_buckets=num_buckets,
        ).to_pandas()
        return out.sort_values(["user_id", "rn"]).reset_index(drop=True)

    def test_matches_sql_windows(self, ray_session):
        import duckdb
        import pandas as pd

        from medical_ocr_service_ray.pipelines.queries import _Q42_SQL

        con = duckdb.connect()
        con.register("events", self._events())
        exp = (
            con.execute(_Q42_SQL)
            .fetchdf()
            .sort_values(["user_id", "rn"])
            .reset_index(drop=True)
        )
        got = self._ray()[["user_id", "event_id", "rn", "cum_value_x10000", "gap_s"]]
        pd.testing.assert_frame_equal(
            got, exp[got.columns.tolist()], check_dtype=False
        )

    def test_semantics(self, ray_session):
        got = self._ray()
        u10 = got[got.user_id == 10]
        assert list(u10.rn) == [1, 2, 3, 4]
        assert list(u10.event_id) == [1, 2, 3, 4]  # ts tie broken by event_id
        assert list(u10.gap_s) == [-1, 0, 59, 86340]  # floor, not round
        assert list(u10.cum_value_x10000) == [15000, -7500, -7499, 992501]
        assert list(got[got.user_id == 30].gap_s) == [-1]

    def test_bucket_count_invariant(self, ray_session):
        import pandas as pd

        pd.testing.assert_frame_equal(self._ray(2), self._ray(7))


class TestBM25:
    """q43: quantized-BM25 retrieval — integer-exact scoring semantics."""

    CORPUS = [
        (1, "fast hash join fast hash join fast"),  # dense in all terms
        (2, "fast join " + "filler " * 200),  # long doc -> length-normalized down
        (3, "hash"),  # one term, short
        (4, ""),  # empty doc never matches
        (5, "sort merge the table"),
    ]

    def _run(self, queries, k=10):
        import pyarrow as pa
        import ray.data as rd

        from medical_ocr_service_ray.stages.bm25 import bm25_topk

        t = pa.table(
            {
                "doc_id": pa.array([d for d, _ in self.CORPUS], pa.int64()),
                "text": pa.array([x for _, x in self.CORPUS], pa.string()),
            }
        )
        return bm25_topk(rd.from_arrow(t).repartition(3), queries, k=k)

    def test_relevance_and_length_norm(self, ray_session):
        out = self._run({"q": "fast hash join"})
        got = out[out.query_id == "q"]
        # doc 1 (dense, short) must beat doc 2 (sparse, 200-token filler)
        assert list(got.doc_id)[:2] == [1, 2] or list(got.doc_id)[0] == 1
        assert got.iloc[0].doc_id == 1
        assert 4 not in set(got.doc_id)  # empty doc absent
        assert 5 not in set(got.doc_id)  # no query term -> absent
        assert list(got["rank"]) == list(range(1, len(got) + 1))
        assert (got.score_q > 0).all()

    def test_out_of_vocab_token_ignored(self, ray_session):
        a = self._run({"q": "fast hash join"})
        b = self._run({"q": "fast hash join warehouse"})
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)

    def test_matches_sql_on_unit_corpus(self, ray_session):
        import duckdb
        import pandas as pd

        from medical_ocr_service_ray.pipelines.queries import _BM25_QUERIES, _q43_sql

        got = self._run(_BM25_QUERIES)
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame(self.CORPUS, columns=["doc_id", "text"])
        )
        exp = con.execute(_q43_sql()).fetchdf()

        def norm(d):
            d = d[sorted(d.columns)]
            return d.sort_values(list(d.columns)).reset_index(drop=True)

        a, b = norm(got), norm(exp)
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))

    def test_k_cutoff(self, ray_session):
        out = self._run({"q": "fast hash join"}, k=1)
        assert len(out) == 1 and out.iloc[0].doc_id == 1


class TestExactGroupQuantiles:
    """q44: exact percentile_disc from mergeable value-count histograms."""

    def _run(self, rows, quantiles, num_buckets=3, nparts=4):
        import pandas as pd
        import ray.data as rd

        from medical_ocr_service_ray.stages.quantiles import exact_group_quantiles

        df = pd.DataFrame(rows, columns=["grp", "val"])
        return (
            exact_group_quantiles(
                rd.from_pandas(df).repartition(nparts),
                key="grp",
                value_col="val",
                quantiles=quantiles,
                num_buckets=num_buckets,
            )
            .to_pandas()
            .sort_values("grp")
            .reset_index(drop=True)
        )

    def test_boundary_ranks(self, ray_session):
        # n=4 values [10,20,30,40]: p25 -> ceil(1) = 1st = 10; p50 -> 2nd = 20;
        # p75 -> 3rd = 30; p90 -> ceil(3.6) = 4th = 40
        rows = [("a", v) for v in (40, 10, 30, 20)]
        out = self._run(
            rows, [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10)]
        )
        r = out.iloc[0]
        assert (r.n, r.p25, r.p50, r.p75, r.p90) == (4, 10, 20, 30, 40)

    def test_matches_duckdb_percentile_disc(self, ray_session):
        import duckdb
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(7)
        rows = [
            (g, int(v))
            for g in ("x", "y", "z")
            for v in rng.integers(0, 40, size=997 if g == "y" else 256)
        ]
        out = self._run(rows, [("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10)])
        con = duckdb.connect()
        con.register("t", pd.DataFrame(rows, columns=["grp", "val"]))
        exp = con.execute(
            """SELECT grp, CAST(COUNT(*) AS BIGINT) n,
                      percentile_disc(0.25) WITHIN GROUP (ORDER BY val) p25,
                      percentile_disc(0.5) WITHIN GROUP (ORDER BY val) p50,
                      percentile_disc(0.9) WITHIN GROUP (ORDER BY val) p90
               FROM t GROUP BY grp ORDER BY grp"""
        ).fetchdf()
        pd.testing.assert_frame_equal(out, exp, check_dtype=False)

    def test_partitioning_invariant(self, ray_session):
        import pandas as pd

        rows = [("a", v % 13) for v in range(500)] + [("b", v % 7) for v in range(99)]
        a = self._run(rows, [("p50", 1, 2)], num_buckets=2, nparts=2)
        b = self._run(rows, [("p50", 1, 2)], num_buckets=7, nparts=9)
        pd.testing.assert_frame_equal(a, b)


class TestIncrementalDedup:
    """q45: dedup a new batch against a persisted bucketed hash index."""

    def _ds(self, rows):
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        ).repartition(2)

    def test_two_batches_then_redelivery(self, ray_session, tmp_path):
        from medical_ocr_service_ray.stages.incremental import incremental_exact_dedup

        idx = tmp_path / "idx"
        a = [(1, "alpha"), (2, "beta"), (3, "alpha")]  # 3 dups 1 within-batch
        b = [(10, "beta"), (11, "gamma"), (12, "delta")]

        fresh_a = incremental_exact_dedup(self._ds(a), idx, num_buckets=4).to_pandas()
        assert sorted(fresh_a.doc_id) == [1, 2]  # min-id kept for 'alpha'

        fresh_b = incremental_exact_dedup(self._ds(b), idx, num_buckets=4).to_pandas()
        assert sorted(fresh_b.doc_id) == [11, 12]  # 'beta' already indexed

        # exact re-delivery of batch b -> nothing fresh, index byte-stable
        import pathlib

        before = sorted(p.name for p in pathlib.Path(idx).rglob("part-*.parquet"))
        again = incremental_exact_dedup(self._ds(b), idx, num_buckets=4).to_pandas()
        after = sorted(p.name for p in pathlib.Path(idx).rglob("part-*.parquet"))
        assert len(again) == 0 and before == after

    def test_bucket_count_is_pinned(self, ray_session, tmp_path):
        import pytest

        from medical_ocr_service_ray.stages.incremental import incremental_exact_dedup

        idx = tmp_path / "idx"
        incremental_exact_dedup(self._ds([(1, "x")]), idx, num_buckets=4).to_pandas()
        with pytest.raises(ValueError, match="num_buckets"):
            incremental_exact_dedup(self._ds([(2, "y")]), idx, num_buckets=8)

    def test_incremental_equals_batch_dedup(self, ray_session, tmp_path):
        """Union of fresh sets across N incremental runs == one-shot exact
        dedup of the concatenated corpus (by content hash set)."""
        import numpy as np

        from medical_ocr_service_ray.stages.incremental import incremental_exact_dedup

        rng = np.random.default_rng(3)
        corpus = [(i, f"doc {int(rng.integers(0, 40))}") for i in range(120)]
        idx = tmp_path / "idx"
        seen = []
        for lo in range(0, 120, 40):
            out = incremental_exact_dedup(
                self._ds(corpus[lo : lo + 40]), idx, num_buckets=4
            ).to_pandas()
            seen.extend(out.text_sha256)
        assert len(seen) == len(set(seen))
        expected = {t for _, t in corpus}
        assert len(seen) == len(expected)


class TestKMeansQuantized:
    """q46: integer-exact Lloyd's — equality oracle, not tolerance."""

    def _blobs(self, n_per=60, seed=5):
        import numpy as np

        rng = np.random.default_rng(seed)
        centers = np.array(
            [[1.0] * 8 + [0.0] * 8, [0.0] * 8 + [1.0] * 8, [0.5] * 16]
        )
        rows = []
        for ci, c in enumerate(centers):
            pts = c + 0.05 * rng.standard_normal((n_per, 16))
            base = len(rows)
            rows.extend([(base + i, pts[i], ci) for i in range(n_per)])
        return rows

    def _ds(self, rows, nparts=3):
        import pandas as pd
        import ray.data as rd

        df = pd.DataFrame(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": [list(map(float, r[1])) for r in rows],
            }
        )
        return rd.from_pandas(df).repartition(nparts)

    def _numpy_reference(self, rows, k, iters):
        """Same arithmetic, single process: the correctness oracle."""
        import numpy as np

        from medical_ocr_service_ray.stages.kmeans import assign, quantize

        ordered = sorted(rows, key=lambda r: r[0])
        x = quantize(np.stack([r[1] for r in ordered]))
        cents = x[:k].copy()
        for _ in range(iters):
            a = assign(x, cents)
            new = cents.copy()
            for j in range(k):
                sel = x[a == j]
                if len(sel):
                    new[j] = sel.sum(axis=0, dtype=np.int64) // len(sel)
            cents = new
        return cents, assign(x, cents)

    def test_matches_reference_and_recovers_blobs(self, ray_session):
        import numpy as np

        from medical_ocr_service_ray.stages.kmeans import kmeans_assign, kmeans_fit

        rows = self._blobs()
        cents = kmeans_fit(self._ds(rows), k=3, iters=4)
        exp_cents, exp_assign = self._numpy_reference(rows, k=3, iters=4)
        assert (cents == exp_cents).all()  # bit-exact across the cluster

        out = (
            kmeans_assign(self._ds(rows), cents)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert (out.cluster.to_numpy() == exp_assign).all()
        # planted blobs recovered: each true blob maps to ONE cluster id
        true = np.array([r[2] for r in sorted(rows, key=lambda r: r[0])])
        for b in range(3):
            assert len(set(out.cluster[true == b])) == 1
        assert len(set(out.cluster)) == 3

    def test_partitioning_invariant(self, ray_session):
        from medical_ocr_service_ray.stages.kmeans import kmeans_fit

        rows = self._blobs(seed=11)
        a = kmeans_fit(self._ds(rows, nparts=2), k=3, iters=3)
        b = kmeans_fit(self._ds(rows, nparts=7), k=3, iters=3)
        assert (a == b).all()
