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

# Full expansion table mirroring the reference's 80+ abbreviation semantics
# (src/prompts/system.prompt.js:20-77). Matching is case-sensitive exact-token
# (\b-delimited), single-pass (an expansion is never re-expanded). Ambiguity
# policy: when the reference lists one key with two meanings (PA, TA listed
# under both antecedentes and vital signs), the FIRST listing in the prompt
# wins, deterministically. Expansions are lowercase (engine convention).
ABBREVIATIONS: dict[str, str] = {
    # generales
    "Px": "paciente",
    "Dx": "diagnostico",
    "Tx": "tratamiento",
    "Sx": "sintomas",
    "Hx": "antecedentes",
    # antecedentes
    "AF": "antecedentes familiares",
    "APP": "antecedentes personales patologicos",
    "APNP": "antecedentes personales no patologicos",
    "AHF": "antecedentes heredo-familiares",
    "PA": "padecimiento actual",  # first listing wins (vs presion arterial)
    "AEA": "antecedentes de la enfermedad actual",
    # signos vitales
    "SV": "signos vitales",
    "TA": "tension arterial",
    "FC": "frecuencia cardiaca",
    "FR": "frecuencia respiratoria",
    "SpO2": "saturacion de oxigeno",
    "IMC": "indice de masa corporal",
    # via de administracion
    "VO": "via oral",
    "IV": "intravenosa",
    "IM": "intramuscular",
    "SC": "subcutanea",
    "ID": "intradermica",
    "SL": "sublingual",
    "INH": "inhalatoria",
    "IO": "intraosea",
    # formas farmaceuticas y unidades
    "amp": "ampolla",
    "cp": "comprimido",
    "cap": "capsula",
    "sol": "solucion",
    "susp": "suspension",
    "gts": "gotas",
    "sup": "supositorio",
    "mg": "miligramo",
    "ml": "mililitro",
    "mcg": "microgramo",
    "UI": "unidad internacional",
    "MUI": "millones de ui",
    "mmHg": "milimetro de mercurio",
    "dl": "decilitro",
    "h": "hora",
    "d": "dia",
    "sem": "semana",
    "DU": "dosis unica",
    "PRN": "segun necesidad",
    "c/8h": "cada 8 horas",
    "c/12h": "cada 12 horas",
    "c/24h": "cada 24 horas",
    # diagnosticos
    "HTA": "hipertension arterial",
    "DM": "diabetes mellitus",
    "DBT": "diabetes mellitus",
    "EPOC": "enfermedad pulmonar obstructiva cronica",
    "ECV": "enfermedad cardiovascular",
    "ACV": "accidente cerebrovascular",
    "IAM": "infarto agudo de miocardio",
    "TB": "tuberculosis",
    "VIH": "virus inmunodeficiencia humana",
    "SIDA": "sindrome inmunodeficiencia adquirida",
    "ERC": "enfermedad renal cronica",
    "ITU": "infeccion del tracto urinario",
    # farmacologia
    "AINE": "antiinflamatorio no esteroideo",
    "AAS": "acido acetilsalicilico",
    "ADO": "antidiabetico oral",
    "IECA": "inhibidor enzima convertidora angiotensina",
    "ARV": "antirretroviral",
    "HBPM": "heparina bajo peso molecular",
    # estudios de imagen
    "Rx": "radiografia",
    "RX": "radiografia",
    "TAC": "tomografia axial computarizada",
    "TC": "tomografia axial computarizada",
    "RM": "resonancia magnetica",
    "RMN": "resonancia magnetica",
    "ECO": "ecografia",
    "Eco": "ecografia",
    "ECOCG": "ecocardiograma",
    "ECD": "eco doppler",
    # estudios funcionales y laboratorio
    "ECG": "electrocardiograma",
    "EKG": "electrocardiograma",
    "EEG": "electroencefalograma",
    "EMG": "electromiografia",
    "PFR": "prueba de funcion respiratoria",
    "HMG": "hemograma",
    "BH": "hemograma",
    "GLU": "glucemia",
    "QS": "quimica sanguinea",
    "EGO": "examen general de orina",
    "PFH": "pruebas funcion hepatica",
    "PFU": "pruebas funcion renal",
    "TP": "tiempo de protrombina",
    "TTP": "tiempo tromboplastina parcial",
    "PCR": "reaccion cadena polimerasa",
    "PAP": "papanicolau",
    "LAB": "laboratorio",
    # procedimientos
    "PL": "puncion lumbar",
    "Bx": "biopsia",
    "Cx": "cirugia",
    "QX": "quirurgico",
    "VEDA": "video endoscopia digestiva alta",
    "VCC": "video colonoscopia",
    "LAP": "laparoscopia",
    "LAPE": "laparotomia exploradora",
    # tratamientos oncologicos y especiales
    "RT": "radioterapia",
    "QTx": "quimioterapia",
    "QT": "quimioterapia",
    "IT": "inmunoterapia",
    "HT": "hormonoterapia",
    "RCP": "reanimacion cardiopulmonar",
    "RQ": "riesgo quirurgico",
    # servicios hospitalarios
    "UCI": "unidad de cuidados intensivos",
    "UTI": "unidad de terapia intensiva",
    "UCIN": "unidad de cuidados intensivos neonatal",
    "UCIP": "unidad de cuidados intensivos pediatrica",
    "GO": "ginecologia y obstetricia",
    "ORL": "otorrinolaringologia",
    # hematologia (kept from the engine's original subset; consistent with
    # the reference's lab vocabulary)
    "Hb": "hemoglobina",
    "GB": "globulos blancos",
}
_ABBREV_RE = re.compile(
    r"\b(" + "|".join(sorted(map(re.escape, ABBREVIATIONS), key=len, reverse=True)) + r")\b"
)

# Hot-loop fast path: a flat 100+-branch alternation probes every branch at
# every position (~0.3 ms per turn). A prefix-factored (trie) regex matches
# the same literal set with shared-prefix descent; greedy optional suffix
# groups make the longest key win at each node (TAC before TA), exactly like
# the longest-first flat alternation.
def _trie_regex(keys: list[str]) -> str:
    trie: dict = {}
    for key in keys:
        node = trie
        for ch in key:
            node = node.setdefault(ch, {})
        node[""] = {}  # end-of-key marker

    def emit(node: dict) -> str:
        if not node:
            return ""
        end = "" in node
        branches = []
        for ch, child in sorted((c, n) for c, n in node.items() if c):
            branches.append(re.escape(ch) + emit(child))
        if not branches:
            return ""
        if len(branches) == 1 and not end:
            return branches[0]
        body = "(?:" + "|".join(branches) + ")"
        return body + "?" if end else body

    return emit(trie)


_ABBREV_TRIE_RE = re.compile(r"\b(" + _trie_regex(list(ABBREVIATIONS)) + r")\b")


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

    out = _ABBREV_TRIE_RE.sub(lambda m: ABBREVIATIONS[m.group(1)], out)

    if len(out) > MAX_TEXT_CHARS:
        out = out[:MAX_TEXT_CHARS]
        warnings.append("truncated")
    return out, warnings
