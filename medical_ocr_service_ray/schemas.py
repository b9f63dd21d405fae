"""Canonical Arrow schemas for the extraction engine.

Input shape follows BASELINE.json ``input_hint`` exactly; the output shape is
the Ray-native analogue of the reference's canonical extraction-result JSON
(reference: src/prompts/system.prompt.js:163-206, validated by
src/schemas/response.schema.js:120-128) — struct/list columns instead of JSONB.
"""

from __future__ import annotations

import pyarrow as pa

# One row per conversation turn (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Span offsets always refer to the ORIGINAL ``text`` of the turn, not the
# cleaned output (new surface demanded by the north star; the reference's
# regex extractors are at src/utils/constants.js:103-120 and
# src/workers/previsacion.worker.js:231-263).
SPAN_TYPE = pa.struct(
    [
        ("field", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)

EXTRACTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("content_type", pa.string()),  # html | pdfish | plain
        ("extracted_text", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("warnings", pa.list_(pa.string())),
        ("confidence", pa.float32()),
        ("text_sha256", pa.string()),  # dedup / idempotency key (ref: gpt-vision.service.js:22)
        ("extractor_version", pa.string()),
    ]
)

EXTRACTOR_VERSION = "mosr-extract-1.0.0"
