"""Confidence scoring.

Mirrors the reference's weighted field-presence scorer and legibility
multipliers (src/services/gpt-vision.service.js:209-243, weights 2/2/1.5/1/
0.5/0.5/3) and the review-needed rules (src/services/validation.service.js:
110-151: confidence < 0.7, >= 3 warnings). Rounded to 2 decimals for
cross-platform determinism (pre-visacion.service.js:262).
"""

from __future__ import annotations

_WEIGHTS = {
    "id_number": 2.0,
    "date": 1.5,
    "matricula": 3.0,
    "procedure": 2.0,
    "urgency": 0.5,
}
_LEN_WEIGHT = 1.0  # extracted_text length >= 40 chars
_TOTAL = sum(_WEIGHTS.values()) + _LEN_WEIGHT  # 10.0

REVIEW_THRESHOLD = 0.7


def score_confidence(
    extracted_text: str, span_fields: set[str], warnings: list[str]
) -> tuple[float, list[str]]:
    """Return (confidence rounded to 2 decimals, warnings + review flag).

    Multipliers: x0.7 on empty extraction (legibility BAJA analogue), x0.85
    when >= 3 warnings accumulated before review flagging.
    """
    got = sum(w for f, w in _WEIGHTS.items() if f in span_fields)
    if len(extracted_text) >= 40:
        got += _LEN_WEIGHT
    score = got / _TOTAL
    if not extracted_text:
        score *= 0.7
    if len(warnings) >= 3:
        score *= 0.85
    score = round(score, 2)
    out_warnings = list(warnings)
    if score < REVIEW_THRESHOLD:
        out_warnings.append("review_needed")
    return score, out_warnings
