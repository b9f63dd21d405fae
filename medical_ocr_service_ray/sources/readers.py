"""Sources: aliased CSV reader, JSONL sink, union (SURVEY.md §2.1).

Mirrors the reference's ingest surface:
- S4 Excel/CSV reader with header-row mapping
  (src/routes/v1/data-ingest.routes.js:538-574)
- S5 per-table COLUMN_MAPS: lowercase-trimmed header -> canonical field
  (src/routes/v1/data-ingest.routes.js:487-536, 576-586)
- S11 JSONL writer streaming one JSON object per line
  (src/services/auto-training.service.js:213-249)
"""

from __future__ import annotations

from pathlib import Path

import ray.data as rd

# canonical alias maps (S5): lowercase/trimmed header -> canonical column
COLUMN_MAPS: dict[str, dict[str, str]] = {
    "lookup_terms": {
        "id": "term_id",
        "term id": "term_id",
        "codigo": "term_id",
        "term": "term",
        "nombre": "term",
        "descripcion": "term",
        "synonyms": "synonyms",
        "sinonimos": "synonyms",
        "group": "group",
        "grupo": "group",
        "weight": "weight",
        "peso": "weight",
    },
    "transcripts": {
        "conversation id": "conv_id",
        "conv": "conv_id",
        "conv_id": "conv_id",
        "turn": "turn_idx",
        "turn_idx": "turn_idx",
        "role": "role",
        "rol": "role",
        "text": "text",
        "texto": "text",
        "tool": "tool",
        "ts": "ts",
        "timestamp": "ts",
    },
}


def normalize_header(name: str) -> str:
    return name.strip().lower()


def read_csv_aliased(paths: str | list[str], table: str) -> "rd.Dataset":
    """CSV source with header-alias normalization: any header matching an
    alias (case/whitespace-insensitive) is renamed to the canonical field;
    unknown headers are kept verbatim (the reference keeps them too and Joi
    strips later)."""
    column_map = COLUMN_MAPS.get(table, {})
    ds = rd.read_csv(paths)

    def rename(batch):
        new_names = []
        for name in batch.column_names:
            canonical = column_map.get(normalize_header(name), name)
            new_names.append(canonical)
        return batch.rename_columns(new_names)

    return ds.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def split_synonyms(batch, col: str = "synonyms"):
    """Split a delimited synonym string column into list<string> on [,;|]
    (src/routes/v1/data-ingest.routes.js:679-684)."""
    import re

    import pyarrow as pa

    if col not in batch.column_names:
        return batch
    splitter = re.compile(r"[,;|]")
    vals = batch[col].to_pylist()
    lists = [
        [s.strip() for s in splitter.split(v) if s.strip()] if isinstance(v, str) else (v or [])
        for v in vals
    ]
    idx = batch.column_names.index(col)
    return batch.set_column(idx, col, pa.array(lists, pa.list_(pa.string())))


def write_jsonl(ds: "rd.Dataset", out_dir: str | Path) -> None:
    """JSONL sink: one JSON object per line, directory of part files (S11)."""
    ds.write_json(str(out_dir))


def union_datasets(*datasets: "rd.Dataset") -> "rd.Dataset":
    """D5: union of several job/record streams into one dataset."""
    first, *rest = datasets
    return first.union(*rest) if rest else first
