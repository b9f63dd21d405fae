"""Sources (aliased CSV, JSONL sink, union) + stage registry tests."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest


class TestCsvAliased:
    def test_headers_renamed_and_synonyms_split(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.readers import read_csv_aliased, split_synonyms

        csv = tmp_path / "terms.csv"
        csv.write_text(
            "Codigo,NOMBRE ,sinonimos,Peso\n"
            "1,ECOGRAFIA,eco;ultrasonido,0.5\n"
            "2,TOMOGRAFIA,tac|scanner,0.7\n"
        )
        ds = read_csv_aliased(str(csv), "lookup_terms")
        ds = ds.map_batches(split_synonyms, batch_format="pyarrow")
        df = ds.to_pandas()
        assert list(df.columns) == ["term_id", "term", "synonyms", "weight"]
        assert list(df.synonyms[0]) == ["eco", "ultrasonido"]
        assert list(df.synonyms[1]) == ["tac", "scanner"]

    def test_unknown_headers_kept(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.readers import read_csv_aliased

        csv = tmp_path / "x.csv"
        csv.write_text("Codigo,mystery_col\n1,foo\n")
        df = read_csv_aliased(str(csv), "lookup_terms").to_pandas()
        assert list(df.columns) == ["term_id", "mystery_col"]


class TestJsonlSink:
    def test_one_object_per_line(self, ray_session, tmp_path):
        import ray.data as rd

        from medical_ocr_service_ray.sources.readers import write_jsonl

        t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
        out = tmp_path / "jsonl"
        write_jsonl(rd.from_arrow(t), out)
        lines = []
        for f in sorted(out.glob("*.json")):
            lines += [json.loads(line) for line in f.read_text().splitlines() if line.strip()]
        assert sorted(lines, key=lambda r: r["a"]) == [
            {"a": 1, "b": "x"}, {"a": 2, "b": "y"}, {"a": 3, "b": "z"}
        ]


class TestUnion:
    def test_union_counts(self, ray_session):
        import ray.data as rd

        from medical_ocr_service_ray.sources.readers import union_datasets

        a = rd.from_arrow(pa.table({"x": [1, 2]}))
        b = rd.from_arrow(pa.table({"x": [3]}))
        c = rd.from_arrow(pa.table({"x": [4, 5, 6]}))
        assert union_datasets(a, b, c).count() == 6


class TestRegistry:
    def test_builtin_stages_listed(self):
        from medical_ocr_service_ray.pipelines.registry import list_stages

        got = set(list_stages())
        assert {"extract_turns", "token_stats", "lang_id", "sniff_media", "decode_media"} <= got

    def test_build_pipeline_from_names(self, ray_session):
        import ray.data as rd

        from medical_ocr_service_ray.pipelines.registry import build_pipeline

        docs = rd.from_arrow(
            pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["the cat sat", "el perro corre"]})
        )
        out = build_pipeline(docs, ["lang_id"]).to_pandas()
        assert list(out.columns) == ["doc_id", "lang_pred"]

    def test_custom_stage_registration_and_dispatch(self, ray_session):
        import ray.data as rd

        from medical_ocr_service_ray.pipelines.registry import build_pipeline, register_stage

        def shout(batch: pa.Table, suffix: str = "!") -> pa.Table:
            vals = [f"{t.upper()}{suffix}" for t in batch["text"].to_pylist()]
            return batch.set_column(
                batch.column_names.index("text"), "text", pa.array(vals, pa.string())
            )

        register_stage("shout_test", shout)
        docs = rd.from_arrow(pa.table({"text": ["hey"]}))
        out = build_pipeline(docs, [("shout_test", {"suffix": "?!"})]).to_pandas()
        assert out.text[0] == "HEY?!"

    def test_actor_stage_with_constructor_override(self, ray_session):
        import ray.data as rd

        from medical_ocr_service_ray.pipelines.registry import build_pipeline
        from medical_ocr_service_ray.stages.multimodal import synth_media_table

        media = rd.from_arrow(synth_media_table(8))
        frames = build_pipeline(media, [("decode_media", {"op": "frame_sample"})]).to_pandas()
        assert list(frames.columns) == ["item_id", "frame_idx"]
        assert len(frames) >= 8  # >=1 frame per item

    def test_duplicate_registration_rejected(self):
        from medical_ocr_service_ray.pipelines.registry import register_stage

        with pytest.raises(ValueError, match="already registered"):
            register_stage("token_stats", lambda b: b)

    def test_unknown_stage_error_names_known(self, ray_session):
        import ray.data as rd

        from medical_ocr_service_ray.pipelines.registry import apply_stage

        with pytest.raises(KeyError, match="unknown stage"):
            apply_stage(rd.from_arrow(pa.table({"x": [1]})), "nope")
