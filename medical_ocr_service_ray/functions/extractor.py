"""Per-turn extraction facade: classify -> route -> normalize -> score.

This single pure function defines the engine's golden contract; the
single-process oracle (oracle.py) and the Ray actor stages
(stages/extract.py) both call it, so Ray-vs-oracle equality reduces to
ordering/partitioning correctness.

Pipeline order (deterministic, mirrors SURVEY.md §3.1 step list):
classify (M1/M2) -> route extract (M3/M6/M10 analogues) -> length cap +
field normalize (M5/M7/M13-M15) -> span extraction over ORIGINAL text (M16)
-> confidence + review flags (M8/M9/M11) -> content hash (M17).
"""

from __future__ import annotations

from medical_ocr_service_ray.functions.classify import HTML, PDFISH, classify_content_type
from medical_ocr_service_ray.functions.confidence import score_confidence
from medical_ocr_service_ray.functions.hashing import sha256_hex
from medical_ocr_service_ray.functions.html_extract import extract_html
from medical_ocr_service_ray.functions.normalize import normalize_text
from medical_ocr_service_ray.functions.pdf_extract import extract_pdfish
from medical_ocr_service_ray.functions.plain_extract import extract_plain
from medical_ocr_service_ray.functions.spans import extract_spans
from medical_ocr_service_ray.schemas import EXTRACTOR_VERSION


def extract_turn(text: str) -> dict:
    """Extract one turn payload. Returns the output-row dict (minus keys
    carried through from the input row)."""
    if text is None:
        text = ""
    content_type = classify_content_type(text)
    if content_type == HTML:
        body, warnings = extract_html(text)
    elif content_type == PDFISH:
        body, warnings = extract_pdfish(text)
    else:
        body, warnings = extract_plain(text)

    body, norm_warnings = normalize_text(body)
    warnings = warnings + norm_warnings

    spans = extract_spans(text)
    span_fields = {s["field"] for s in spans}
    confidence, warnings = score_confidence(body, span_fields, warnings)

    return {
        "content_type": content_type,
        "extracted_text": body,
        "spans": spans,
        "warnings": warnings,
        "confidence": confidence,
        "text_sha256": sha256_hex(text),
        "extractor_version": EXTRACTOR_VERSION,
    }
