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


def _write_min_xlsx(path):
    """Minimal SpreadsheetML fixture: rels-resolved sheet name, shared
    strings, a rich-text header ('Nombre' split across runs), a rich-text
    data cell, inline strings, and integral numbers."""
    import zipfile

    M = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    R = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    members = {
        "xl/workbook.xml": (
            f'<workbook {M} {R}><sheets>'
            '<sheet name="Datos" sheetId="1" r:id="rId7"/></sheets></workbook>'
        ),
        "xl/_rels/workbook.xml.rels": (
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId7" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"'
            ' Target="worksheets/datos_hoja.xml"/></Relationships>'
        ),
        "xl/sharedStrings.xml": (
            f'<sst {M} count="4" uniqueCount="4">'
            "<si><t>Codigo</t></si>"
            "<si><r><t>Nom</t></r><r><t>bre</t></r></si>"  # rich-text header
            "<si><t>Sinonimos</t></si>"
            "<si><r><t>eco</t></r><r><t>grafia</t></r></si>"  # rich-text cell
            "</sst>"
        ),
        "xl/worksheets/datos_hoja.xml": (
            f'<worksheet {M}><sheetData>'
            '<row r="1">'
            '<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c>'
            "</row>"
            '<row r="2">'
            '<c r="A2"><v>101</v></c><c r="B2" t="s"><v>3</v></c>'
            '<c r="C2" t="inlineStr"><is><t>eco; ultrasonido</t></is></c>'
            "</row>"
            '<row r="3">'
            '<c r="A3"><v>102</v></c>'
            '<c r="B3" t="inlineStr"><is><t>tomografia</t></is></c>'
            "</row>"
            "</sheetData></worksheet>"
        ),
    }
    with zipfile.ZipFile(path, "w") as zf:
        for name, content in members.items():
            zf.writestr(name, content)
    return path


class TestXlsxReader:
    def test_parse_bytes_reference_semantics(self, tmp_path):
        from medical_ocr_service_ray.sources.readers import parse_xlsx_bytes

        p = _write_min_xlsx(tmp_path / "dim.xlsx")
        rows = parse_xlsx_bytes(p.read_bytes())
        assert rows == [
            {"codigo": 101, "nombre": "ecografia", "sinonimos": "eco; ultrasonido"},
            {"codigo": 102, "nombre": "tomografia"},
        ]  # headers lowercased, rich text flattened, ints integral

    def test_read_xlsx_aliased_dataset(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.readers import read_xlsx_aliased, split_synonyms

        p = _write_min_xlsx(tmp_path / "dim.xlsx")
        ds = read_xlsx_aliased(str(p), "lookup_terms")
        out = ds.map_batches(split_synonyms, batch_format="pyarrow").to_pandas()
        assert list(out.columns) == ["term_id", "term", "synonyms"]
        assert out.term_id.tolist() == [101, 102]
        assert out.term.tolist() == ["ecografia", "tomografia"]
        assert list(out.synonyms.tolist()[0]) == ["eco", "ultrasonido"]


class TestSchemaEvolvingRead:
    """read_parquet_evolving: drifted schemas unify under the promoted
    union schema with typed-null backfill and numeric up-casts."""

    def _write_generations(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        g1 = tmp_path / "gen1.parquet"
        g2 = tmp_path / "gen2.parquet"
        g3 = tmp_path / "gen3.parquet"
        pq.write_table(
            pa.table({"id": pa.array([1, 2], pa.int32()), "name": ["a", "b"]}), g1
        )
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([3], pa.int64()),
                    "name": ["c"],
                    "score": pa.array([0.5], pa.float64()),
                }
            ),
            g2,
        )
        pq.write_table(pa.table({"name": ["d"], "flag": [True]}), g3)
        return [str(g1), str(g2), str(g3)]

    def test_union_schema_nulls_and_promotion(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.readers import read_parquet_evolving

        srcs = self._write_generations(tmp_path)
        out = read_parquet_evolving(srcs).to_pandas().sort_values("name")
        assert list(out.columns) == ["id", "name", "score", "flag"]
        assert out.name.tolist() == ["a", "b", "c", "d"]
        assert out.id.tolist()[:3] == [1, 2, 3]  # int32 promoted into int64
        assert out.id.isna().tolist() == [False, False, False, True]
        assert out.score.isna().tolist() == [True, True, False, True]
        assert out.flag.isna().tolist() == [True, True, True, False]

    def test_column_pruned_read_with_backfill(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.readers import read_parquet_evolving

        srcs = self._write_generations(tmp_path)
        out = read_parquet_evolving(srcs, columns=["score", "name"]).to_pandas()
        assert list(out.columns) == ["score", "name"]
        assert len(out) == 4
        assert out.score.notna().sum() == 1

    def test_unknown_column_raises(self, ray_session, tmp_path):
        import pytest as _pytest

        from medical_ocr_service_ray.sources.readers import read_parquet_evolving

        srcs = self._write_generations(tmp_path)
        with _pytest.raises(KeyError):
            read_parquet_evolving(srcs, columns=["nope"])

    def test_directory_sources(self, ray_session, tmp_path):
        """A source may be a DIRECTORY of part files (the normal table
        layout); schema probing must touch one footer per source."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.sources.readers import read_parquet_evolving

        d1 = tmp_path / "gen1"; d1.mkdir()
        d2 = tmp_path / "gen2"; d2.mkdir()
        pq.write_table(pa.table({"id": [1, 2], "name": ["a", "b"]}), d1 / "p0.parquet")
        pq.write_table(pa.table({"id": [3], "name": ["c"]}), d1 / "p1.parquet")
        pq.write_table(pa.table({"id": [4], "score": [1.5]}), d2 / "p0.parquet")
        out = read_parquet_evolving([str(d1), str(d2)]).to_pandas().sort_values("id")
        assert list(out.columns) == ["id", "name", "score"]
        assert out.id.tolist() == [1, 2, 3, 4]
        assert out.name.isna().tolist() == [False, False, False, True]
        assert out.score.isna().tolist() == [True, True, True, False]

    def test_drift_within_one_directory(self, ray_session, tmp_path):
        """Schema drift WITHIN a source dir (early files missing a column
        later files carry) must keep the real values — files are grouped by
        their actual footer schema, not the first file's."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.sources.readers import read_parquet_evolving

        d = tmp_path / "tbl"; d.mkdir()
        pq.write_table(pa.table({"id": [1, 2]}), d / "p0.parquet")
        pq.write_table(pa.table({"id": [3], "score": [2.5]}), d / "p1.parquet")
        out = read_parquet_evolving([str(d)]).to_pandas().sort_values("id")
        assert out.score.tolist()[:2] == [None, None] or out.score.isna().tolist()[:2] == [True, True]
        assert out.score.tolist()[2] == 2.5  # p1's real value survives

    def test_empty_directory_raises(self, ray_session, tmp_path):
        import pytest as _pytest

        from medical_ocr_service_ray.sources.readers import read_parquet_evolving

        d = tmp_path / "empty"; d.mkdir()
        with _pytest.raises(FileNotFoundError):
            read_parquet_evolving([str(d)])
