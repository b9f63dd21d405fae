"""Field-span extraction over the ORIGINAL turn text.

Offsets always index into the original payload (the north-star's new surface;
the reference never tracks offsets). Patterns mirror:
- matricula patterns + urgency keywords (src/utils/constants.js:103-120)
- the 19-procedure narrative fallback regex table
  (src/workers/previsacion.worker.js:229-263), including its seen-set dedupe
- ci/id digit-run normalization targets (src/services/gpt-vision.service.js:171)

Matching runs over a LENGTH-PRESERVING accent-folded uppercase copy so offsets
remain valid in the original string.
"""

from __future__ import annotations

import re

from medical_ocr_service_ray.functions.normalize import _trie_regex, fold_accents

_DATE_RE = re.compile(r"\b(\d{2})/(\d{2})/(\d{4})\b")
_ID_RE = re.compile(r"\b\d{1,3}(?:[.\-]\d{3}){2,}\b")
_MATRICULA_RE = re.compile(r"\b(?:M\.?\s?[NP]\.?|MAT\.?|MATRICULA)\s*:?\s*\d{3,8}\b")

URGENCY_KEYWORDS = (
    "URGENTE",
    "URGENCIA",
    "EMERGENCIA",
    "PRIORITARIO",
    "INMEDIATO",
    "STAT",
)
# prefix-factored (trie) alternations: same literal set, shared-prefix
# descent instead of per-branch probing (measured equivalent matches,
# ~1.4x faster on the 19-procedure table; see normalize._trie_regex)
_URGENCY_RE = re.compile(r"\b(?:" + _trie_regex(list(URGENCY_KEYWORDS)) + r")\b")

# Reference fallback table: previsacion.worker.js:231-251 (19 procedures).
PROCEDURES = (
    "RADIOTERAPIA",
    "QUIMIOTERAPIA",
    "TOMOGRAFIA",
    "RESONANCIA MAGNETICA",
    "RESONANCIA",
    "ECOGRAFIA",
    "RADIOGRAFIA",
    "LABORATORIO",
    "ELECTROCARDIOGRAMA",
    "ELECTROENCEFALOGRAMA",
    "ENDOSCOPIA",
    "COLONOSCOPIA",
    "MAMOGRAFIA",
    "DENSITOMETRIA",
    "HEMOGRAMA",
    "BIOPSIA",
    "CIRUGIA",
    "INTERNACION",
    "DIALISIS",
)
# trie factoring preserves longest-match (greedy optional suffix groups), so
# RESONANCIA MAGNETICA still beats RESONANCIA
_PROCEDURE_RE = re.compile(r"\b(?:" + _trie_regex(list(PROCEDURES)) + r")\b")


def extract_spans(text: str) -> list[dict]:
    """Return [{field, start, end}, ...] sorted by (start, end, field).

    Procedures are deduped by canonical (folded, uppercased) name — first
    occurrence wins, mirroring the reference's ``vistos`` set
    (previsacion.worker.js:252-259).
    """
    if not text:
        return []
    folded = fold_accents(text)
    upper = folded.upper()
    if len(upper) != len(folded):
        # str.upper() is not 1:1 for every codepoint ('ß' -> 'SS', ligatures):
        # fall back to a per-codepoint uppercase that keeps offsets aligned,
        # leaving multi-char-expanding codepoints unchanged
        upper = "".join(c.upper() if len(c.upper()) == 1 else c for c in folded)
    folded = upper
    spans: list[tuple[int, int, str]] = []
    for m in _ID_RE.finditer(folded):
        spans.append((m.start(), m.end(), "id_number"))
    for m in _DATE_RE.finditer(folded):
        spans.append((m.start(), m.end(), "date"))
    for m in _MATRICULA_RE.finditer(folded):
        spans.append((m.start(), m.end(), "matricula"))
    for m in _URGENCY_RE.finditer(folded):
        spans.append((m.start(), m.end(), "urgency"))
    seen: set[str] = set()
    for m in _PROCEDURE_RE.finditer(folded):
        name = m.group(0)
        if name in seen:
            continue
        seen.add(name)
        spans.append((m.start(), m.end(), "procedure"))
    spans.sort(key=lambda s: (s[0], s[1], s[2]))
    return [{"field": f, "start": a, "end": b} for a, b, f in spans]
