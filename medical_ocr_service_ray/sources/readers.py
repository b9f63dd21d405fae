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


_XLSX_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_R_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


def _xlsx_cell_col(ref: str) -> int:
    """'BC12' -> 0-based column index 54."""
    col = 0
    for ch in ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return col - 1


def _xlsx_text(el) -> str:
    """Flatten a <si>/<is> element: plain <t> or rich-text <r><t> runs joined
    (the reference's richText .map(r => r.text).join('') —
    data-ingest.routes.js:563-566)."""
    t = el.find("m:t", _XLSX_NS)
    if t is not None:
        return t.text or ""
    return "".join(
        (r.find("m:t", _XLSX_NS).text or "")
        for r in el.findall("m:r", _XLSX_NS)
        if r.find("m:t", _XLSX_NS) is not None
    )


def parse_xlsx_bytes(data: bytes) -> list[dict]:
    """Parse .xlsx (SpreadsheetML zip, stdlib-only — no openpyxl in this
    environment) with the reference's semantics
    (data-ingest.routes.js:538-574): FIRST worksheet only, row 1 =
    lowercase/trimmed headers, rich text flattened, empty rows skipped,
    cells without a header ignored. Numbers come back as int when integral
    else float; shared/inline strings as str; booleans as bool."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    zf = zipfile.ZipFile(io.BytesIO(data))

    # first sheet via workbook.xml -> workbook.xml.rels (sheet order in the
    # workbook, not zip member order)
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    first_sheet = wb.find("m:sheets/m:sheet", _XLSX_NS)
    if first_sheet is None:
        raise ValueError("xlsx has no data sheets")
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target = None
    for rel in rels.findall("r:Relationship", _REL_NS):
        if rel.get("Id") == first_sheet.get(_R_ATTR):
            target = rel.get("Target").lstrip("/")
            break
    sheet_path = f"xl/{target}" if target and not target.startswith("xl/") else (
        target or "xl/worksheets/sheet1.xml"
    )

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        shared = [_xlsx_text(si) for si in sst.findall("m:si", _XLSX_NS)]

    def cell_value(c):
        t = c.get("t", "n")
        if t == "inlineStr":
            is_el = c.find("m:is", _XLSX_NS)
            return _xlsx_text(is_el) if is_el is not None else ""
        v = c.find("m:v", _XLSX_NS)
        if v is None or v.text is None:
            return None
        if t == "s":
            return shared[int(v.text)]
        if t == "str":
            return v.text
        if t == "b":
            return v.text == "1"
        num = float(v.text)
        return int(num) if num.is_integer() else num

    root = ET.fromstring(zf.read(sheet_path))
    headers: dict[int, str] = {}
    rows: list[dict] = []
    for row in root.iterfind("m:sheetData/m:row", _XLSX_NS):
        cells = {}
        for c in row.findall("m:c", _XLSX_NS):
            val = cell_value(c)
            if val is None:
                continue
            cells[_xlsx_cell_col(c.get("r", "A"))] = val
        if row.get("r") == "1" or (not headers and not rows):
            headers = {col: str(v).strip().lower() for col, v in cells.items()}
            continue
        obj = {headers[col]: v for col, v in cells.items() if col in headers}
        if obj:
            rows.append(obj)
    return rows


def read_xlsx_aliased(paths: str | list[str], table: str) -> "rd.Dataset":
    """S4 Excel source: distributed parse (one task per file via
    ``read_binary_files``; xlsx is a zip so byte-ranges cannot split — file
    granularity is the natural parallel unit) -> alias-normalized Arrow
    batches, same COLUMN_MAPS path as the CSV reader. Missing headers in a
    row become nulls; headers are unioned per file."""
    import pyarrow as pa

    column_map = COLUMN_MAPS.get(table, {})

    def parse(batch: "pa.Table") -> "pa.Table":
        tables = []
        for data in batch["bytes"].to_pylist():
            rows = parse_xlsx_bytes(data)
            if not rows:
                continue
            cols: list[str] = []
            for r in rows:
                for k in r:
                    if k not in cols:
                        cols.append(k)
            renamed = [column_map.get(normalize_header(c), c) for c in cols]
            tables.append(
                pa.table({rc: [r.get(c) for r in rows] for c, rc in zip(cols, renamed)})
            )
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default")

    files = rd.read_binary_files(paths)
    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)


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


def _cheapest_column(sch: "pa.Schema") -> str:
    """The cheapest single column to read when only the ROW COUNT matters:
    the narrowest fixed-width (bit-width-bearing) field in the footer
    schema; falls back to the first field only when every column is
    variable-width/nested."""
    import pyarrow as pa  # noqa: F811 (local for stand-alone use)

    best, best_bits = None, None
    for fld in sch:
        try:  # bit_width raises on variable-width/nested types
            bits = int(fld.type.bit_width)
        except (AttributeError, TypeError, ValueError):
            bits = None
        if bits is not None and (best_bits is None or bits < best_bits):
            best, best_bits = fld.name, bits
    return best if best is not None else sch.names[0]


def read_parquet_evolving(
    sources: list[str],
    columns: list[str] | None = None,
) -> "rd.Dataset":
    """Schema-evolution-on-read: union several parquet sources whose schemas
    DRIFTED over time (columns added/dropped across ingest generations, int
    widths widened) into one dataset under the promoted union schema —
    missing columns surface as typed nulls, narrower numeric types are cast
    up. The contract every long-lived lakehouse table needs once writers
    evolve.

    Scale shape: the driver touches only parquet FOOTERS (one
    ``read_schema`` per part FILE — drift can happen WITHIN a directory
    source too, so every file's footer is probed and files are grouped by
    their actual schema; footer reads are KBs each, the same cost model as
    ``collect_parquet_stats``); each schema-group is then a normal pruned
    streaming ``read_parquet`` whose batches are aligned to the union
    schema with zero-copy ``append_column`` of null arrays + Arrow casts.
    ``columns`` prunes at the read for columns a group has, and back-fills
    nulls for those it doesn't."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def _files_of(src: str) -> list[str]:
        p = Path(src)
        if not p.is_dir():
            return [str(p)]
        fs = sorted(str(f) for f in p.rglob("*.parquet"))
        if not fs:
            raise FileNotFoundError(f"no parquet files under source {src}")
        return fs

    # group every part file (across all sources) by its ACTUAL footer schema
    groups: dict[tuple, tuple[pa.Schema, list[str]]] = {}
    for src in sources:
        for f in _files_of(src):
            sch = pq.read_schema(f)
            key = tuple(sorted((fld.name, str(fld.type)) for fld in sch))
            groups.setdefault(key, (sch, []))[1].append(f)

    schemas = [sch for sch, _ in groups.values()]
    target = pa.unify_schemas(schemas, promote_options="permissive")
    if columns is not None:
        missing = [c for c in columns if c not in target.names]
        if missing:
            raise KeyError(f"columns not in any source schema: {missing}")
        target = pa.schema([target.field(c) for c in columns])

    def _align(batch: pa.Table, target: pa.Schema = target) -> pa.Table:
        cols = []
        for field in target:
            if field.name in batch.column_names:
                col = batch[field.name]
                cols.append(col.cast(field.type) if col.type != field.type else col)
            else:
                cols.append(pa.nulls(batch.num_rows, field.type))
        return pa.Table.from_arrays(cols, schema=target)

    parts = []
    for sch, files in groups.values():
        have = [c for c in (columns or [f.name for f in target]) if c in sch.names]
        # a group holding NONE of the requested columns still contributes
        # its row count (all-null rows): read its cheapest single column —
        # the narrowest fixed-width field from the footer, never names[0]
        # blindly (that could be the widest text/embedding column)
        ds = rd.read_parquet(files, columns=have or [_cheapest_column(sch)])
        parts.append(ds.map_batches(_align, batch_format="pyarrow", zero_copy_batch=True))
    return union_datasets(*parts)
