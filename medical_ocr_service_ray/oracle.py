"""Single-process oracle: the golden-output producer (FIXTURES.md F2).

Runs the exact same pure extraction functions row-by-row in a plain loop —
no Ray — over a transcripts directory, returning results sorted by
(conv_id, turn_idx). The Ray pipeline's output must match this per turn
(the north-rule correctness gate; SURVEY.md §5.2).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from medical_ocr_service_ray.functions.extractor import extract_turn
from medical_ocr_service_ray.schemas import EXTRACTION_SCHEMA


def oracle_extract_table(transcripts: pa.Table) -> pa.Table:
    """Extract every turn of an in-memory transcripts table (plain loop)."""
    order = pa.compute.sort_indices(
        transcripts, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    transcripts = transcripts.take(order)
    conv_ids = transcripts["conv_id"].to_pylist()
    turn_idxs = transcripts["turn_idx"].to_pylist()
    roles = transcripts["role"].to_pylist()
    texts = transcripts["text"].to_pylist()

    out = {name: [] for name in EXTRACTION_SCHEMA.names}
    for conv_id, turn_idx, role, text in zip(conv_ids, turn_idxs, roles, texts):
        res = extract_turn(text)
        out["conv_id"].append(conv_id)
        out["turn_idx"].append(turn_idx)
        out["role"].append(role)
        for k in ("content_type", "extracted_text", "spans", "warnings",
                  "confidence", "text_sha256", "extractor_version"):
            out[k].append(res[k])
    return pa.table(
        {n: pa.array(out[n], EXTRACTION_SCHEMA.field(n).type) for n in EXTRACTION_SCHEMA.names},
        schema=EXTRACTION_SCHEMA,
    )


def oracle_extract_dir(transcripts_dir: str | Path) -> pa.Table:
    files = sorted(Path(transcripts_dir).glob("*.parquet"))
    table = pa.concat_tables([pq.read_table(f) for f in files])
    return oracle_extract_table(table)


def write_golden(transcripts_dir: str | Path, golden_path: str | Path) -> Path:
    golden = oracle_extract_dir(transcripts_dir)
    golden_path = Path(golden_path)
    golden_path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(golden, golden_path)
    return golden_path
