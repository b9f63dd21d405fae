"""Deterministic field normalizers applied to extracted text.

Mirrors the reference's canonicalizer / validator rules:
- digits-only id normalization, strips ``[.-]`` (src/services/gpt-vision.service.js:171;
  src/services/validation.service.js:57-71)
- DD/MM/YYYY -> ISO date conversion + validity check
  (src/prompts/system.prompt.js:142-145; src/services/validation.service.js:169-175)
- abbreviation expansion table (src/prompts/system.prompt.js:20-77 carries 80+;
  a representative deterministic subset here)
- accent folding for match keys (database/schema_matching.sql:418-428), as a
  LENGTH-PRESERVING translate so span offsets into the original text stay valid
- 8000-char cap with truncation warning (src/services/embedding.service.js:200-206;
  src/utils/constants.js:12-19)
"""

from __future__ import annotations

import re

MAX_TEXT_CHARS = 8000

# length-preserving accent fold (1:1 codepoint translate)
_FOLD_TABLE = str.maketrans(
    "áéíóúýàèìòùâêîôûäëïöüãõñçÁÉÍÓÚÝÀÈÌÒÙÂÊÎÔÛÄËÏÖÜÃÕÑÇ",
    "aeiouyaeiouaeiouaeiouaoncAEIOUYAEIOUAEIOUAEIOUAONC",
)

_DATE_RE = re.compile(r"\b(\d{2})/(\d{2})/(\d{4})\b")
_ID_RE = re.compile(r"\b\d{1,3}(?:[.\-]\d{3}){2,}\b")

_DAYS_IN_MONTH = (31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

# Representative expansion table (reference: system.prompt.js:20-77).
ABBREVIATIONS: dict[str, str] = {
    "Dx": "diagnostico",
    "Tx": "tratamiento",
    "Rx": "radiografia",
    "Eco": "ecografia",
    "TAC": "tomografia axial computarizada",
    "RMN": "resonancia magnetica nuclear",
    "ECG": "electrocardiograma",
    "EEG": "electroencefalograma",
    "HTA": "hipertension arterial",
    "DBT": "diabetes",
    "IAM": "infarto agudo de miocardio",
    "ACV": "accidente cerebrovascular",
    "FC": "frecuencia cardiaca",
    "TA": "tension arterial",
    "Hb": "hemoglobina",
    "GB": "globulos blancos",
}
_ABBREV_RE = re.compile(
    r"\b(" + "|".join(sorted(map(re.escape, ABBREVIATIONS), key=len, reverse=True)) + r")\b"
)


def fold_accents(text: str) -> str:
    """Length-preserving accent fold (match-key normalizer, M14)."""
    return text.translate(_FOLD_TABLE)


def valid_date(day: int, month: int, year: int) -> bool:
    if not (1 <= month <= 12 and 1900 <= year <= 2100):
        return False
    dmax = _DAYS_IN_MONTH[month - 1]
    if month == 2 and not (year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)):
        dmax = 28
    return 1 <= day <= dmax


def normalize_text(text: str) -> tuple[str, list[str]]:
    """Apply id, date and abbreviation normalization; cap length.

    Returns (normalized_text, warnings). Deterministic; single pass per rule.
    """
    warnings: list[str] = []

    def _id_repl(m: re.Match) -> str:
        return m.group(0).replace(".", "").replace("-", "")

    out = _ID_RE.sub(_id_repl, text)

    bad_date = False

    def _date_repl(m: re.Match) -> str:
        nonlocal bad_date
        d, mo, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
        if valid_date(d, mo, y):
            return f"{y:04d}-{mo:02d}-{d:02d}"
        bad_date = True
        return m.group(0)

    out = _DATE_RE.sub(_date_repl, out)
    if bad_date:
        warnings.append("invalid_date")

    out = _ABBREV_RE.sub(lambda m: ABBREVIATIONS[m.group(1)], out)

    if len(out) > MAX_TEXT_CHARS:
        out = out[:MAX_TEXT_CHARS]
        warnings.append("truncated")
    return out, warnings
