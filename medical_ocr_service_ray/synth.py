"""Deterministic synthetic transcript generator (FIXTURES.md F1).

Produces the BASELINE.json ``input_hint`` table: one Parquet row per turn of a
multi-turn conversation, heavy-tailed conversation lengths (skew exercise),
payload mix plain / HTML-ish / PDF-ish / edge cases, rows written in shuffled
physical order so output ordering must come from (conv_id, turn_idx).

Everything is keyed off (seed, conv index): generation is order-independent
and re-runnable; no wall-clock, no global RNG state.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from medical_ocr_service_ray.schemas import TRANSCRIPT_SCHEMA

_WORDS = (
    "paciente orden consulta estudio control resultado informe medico clinica "
    "hospital turno practica cobertura plan obra social autorizacion receta "
    "derivacion guardia historia sintoma dolor fiebre tos presion analisis "
    "sangre orina placa imagen zona lumbar cervical abdominal toracica "
    "cronico agudo leve moderado severo indicacion tratamiento dosis diaria "
    "semanal reposo dieta actividad fisica evolucion favorable estable alta "
    "seguimiento interconsulta especialista cardiologia neurologia pediatria "
    "traumatologia dermatologia oftalmologia laboratorio completo perfil "
    "lipidico glucemia urea creatinina hepatograma coagulograma sedimento"
).split()

_TOOLS = ("lookup", "schedule", "billing", "records", "none")

_PROCS = (
    "radioterapia", "quimioterapia", "tomografia", "resonancia magnetica",
    "ecografia", "radiografia", "laboratorio", "electrocardiograma",
    "endoscopia", "mamografia", "hemograma", "biopsia", "dialisis",
)
_URGENCY = ("URGENTE", "urgencia", "EMERGENCIA", "prioritario")
_ACCENTED = (
    "atención médica con evaluación según indicación",
    "revisión clínica del corazón y pulmón",
    "análisis de glóbulos rojos y hemoglobina",
)


def _conv_rng(seed: int, conv_idx: int) -> np.random.Generator:
    h = hashlib.blake2b(f"{seed}:{conv_idx}".encode(), digest_size=8).digest()
    return np.random.default_rng(int.from_bytes(h, "big"))


def _sentence(rng: np.random.Generator, n: int) -> str:
    return " ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), n))


def _artifacts(rng: np.random.Generator) -> list[str]:
    """Deterministic sprinkle of fields the normalizer/spans must handle."""
    bits: list[str] = []
    if rng.random() < 0.35:
        bits.append(f"fecha {rng.integers(1, 29):02d}/{rng.integers(1, 13):02d}/{rng.integers(2015, 2026)}")
    if rng.random() < 0.08:  # invalid date
        bits.append(f"control 45/13/{rng.integers(2015, 2026)}")
    if rng.random() < 0.30:
        bits.append(f"ci {rng.integers(1, 10)}.{rng.integers(100, 1000)}.{rng.integers(100, 1000)}")
    if rng.random() < 0.20:
        bits.append(f"M.N. {rng.integers(1000, 100000)}")
    if rng.random() < 0.15:
        bits.append(str(rng.choice(_URGENCY)))
    if rng.random() < 0.40:
        bits.append(str(rng.choice(_PROCS)))
    if rng.random() < 0.15:
        bits.append(str(rng.choice(_ACCENTED)))
    if rng.random() < 0.20:
        bits.append(f"Dx {_sentence(rng, 2)} Tx {_sentence(rng, 2)}")
    return bits


def _plain_payload(rng: np.random.Generator) -> str:
    parts = [_sentence(rng, int(rng.integers(6, 18))) for _ in range(int(rng.integers(1, 5)))]
    arts = _artifacts(rng)
    # interleave deterministically
    out: list[str] = []
    for i, p in enumerate(parts):
        out.append(p)
        if i < len(arts):
            out.append(arts[i])
    out.extend(arts[len(parts):])
    sep = "  " if rng.random() < 0.3 else " "
    return sep.join(out)


def _html_payload(rng: np.random.Generator) -> str:
    nav = "".join(f'<li><a href="/{w}">{w}</a></li>' for w in rng.choice(_WORDS, 5))
    paras = "".join(
        f"<p>{_sentence(rng, int(rng.integers(8, 25)))} {' '.join(_artifacts(rng))}</p>"
        for _ in range(int(rng.integers(2, 6)))
    )
    sidebar = "".join(f'<a href="#{w}">{w}</a> ' for w in rng.choice(_WORDS, 8))
    footer = f'<div class="footer"><a href="/terms">terminos</a> <a href="/priv">privacidad</a></div>'
    main = f'<div id="content"><h1>{_sentence(rng, 3)}</h1>{paras}</div>'
    doc = (
        f"<!DOCTYPE html><html><head><title>{_sentence(rng, 2)}</title>"
        f"<style>.x{{color:red}}</style></head><body>"
        f'<nav><ul>{nav}</ul></nav><div class="sidebar">{sidebar}</div>'
        f"{main}{footer}</body></html>"
    )
    if rng.random() < 0.10:  # truncated / malformed markup
        doc = doc[: int(rng.integers(len(doc) // 2, len(doc)))]
    return doc


def _pdfish_payload(rng: np.random.Generator) -> str:
    n_pages = int(rng.integers(1, 4))
    header = f"CLINICA {_sentence(rng, 2).upper()}"
    pages = []
    for p in range(1, n_pages + 1):
        lines = [f"--- Page {p} ---", header]
        for _ in range(int(rng.integers(2, 6))):
            lines.append(_sentence(rng, int(rng.integers(5, 12))) + " " + " ".join(_artifacts(rng)))
        if rng.random() < 0.5:  # two-column block
            for _ in range(int(rng.integers(2, 5))):
                lines.append(f"{_sentence(rng, 3)}      {_sentence(rng, 3)}")
        if rng.random() < 0.4:
            lines.append("[TABLE]")
            for _ in range(int(rng.integers(1, 4))):
                lines.append(f"{_sentence(rng, 2)} | {rng.integers(1, 100)}")
            lines.append("[/TABLE]")
        if rng.random() < 0.3:
            lines.append(f"[FIGURE: {_sentence(rng, 3)}]")
        lines.append(f"Page {p} of {n_pages}")
        pages.append("\n".join(lines))
    return "\f".join(pages)


def _edge_payload(rng: np.random.Generator) -> str:
    kind = int(rng.integers(0, 5))
    if kind == 0:
        return ""
    if kind == 1:
        return "   \t\n  \n "
    if kind == 2:  # large payload (>100 KB at full size; scaled-down knob kept)
        return (_sentence(rng, 200) + "\n") * 80
    if kind == 3:
        return "<div><p>" + _sentence(rng, 10)  # truncated markup
    return str(rng.choice(_ACCENTED)) + " URGENTE " + _sentence(rng, 8)


def _conv_turn_count(rng: np.random.Generator) -> int:
    """Heavy-tailed turn counts: ~80% short, ~19% medium, ~1% very long."""
    u = rng.random()
    if u < 0.80:
        return int(rng.integers(2, 11))
    if u < 0.99:
        return int(rng.integers(11, 51))
    return int(rng.integers(200, 1001))


def generate_conversation(seed: int, conv_idx: int) -> list[dict]:
    rng = _conv_rng(seed, conv_idx)
    conv_id = f"conv-{conv_idx:08d}"
    n = _conv_turn_count(rng)
    base_ts = 1_700_000_000_000_000 + int(rng.integers(0, 10**9)) * 1000
    rows = []
    ts = base_ts
    roles = ("user", "assistant", "tool")
    for t in range(n):
        role = roles[t % 3]
        u = rng.random()
        if u < 0.40:
            text = _plain_payload(rng)
        elif u < 0.75:
            text = _html_payload(rng)
        elif u < 0.95:
            text = _pdfish_payload(rng)
        else:
            text = _edge_payload(rng)
        ts += int(rng.integers(1, 120)) * 1_000_000
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": str(rng.choice(_TOOLS)) if role == "tool" else "",
                "ts": ts,
            }
        )
    return rows


def _rows_to_table(rows: list[dict], perm: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([rows[i]["conv_id"] for i in perm], pa.string()),
            "turn_idx": pa.array([rows[i]["turn_idx"] for i in perm], pa.int32()),
            "role": pa.array([rows[i]["role"] for i in perm], pa.string()),
            "text": pa.array([rows[i]["text"] for i in perm], pa.string()),
            "tool": pa.array([rows[i]["tool"] for i in perm], pa.string()),
            "ts": pa.array([rows[i]["ts"] for i in perm], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def generate_transcripts_parallel(
    out_dir: str | Path, n_turns: int, seed: int = 42, n_files: int = 32
) -> Path:
    """Parallel corpus generation with Ray tasks (bench-scale corpora only;
    same per-conversation content as the serial path — conversations are keyed
    on (seed, conv_idx) — but a different physical file layout). Requires an
    initialized Ray session."""
    import ray

    out = Path(out_dir)
    marker = out / "_SUCCESS"
    if marker.exists():
        return out
    out.mkdir(parents=True, exist_ok=True)

    # count conversations needed (turn counts are the first RNG draws per conv)
    total = 0
    n_convs = 0
    while total < n_turns:
        total += _conv_turn_count(_conv_rng(seed, n_convs))
        n_convs += 1

    @ray.remote
    def gen_file(file_idx: int) -> int:
        rows: list[dict] = []
        for conv_idx in range(file_idx, n_convs, n_files):
            rows.extend(generate_conversation(seed, conv_idx))
        perm = np.random.default_rng((seed, file_idx)).permutation(len(rows))
        table = _rows_to_table(rows, perm)
        pq.write_table(table, out / f"transcripts-{file_idx:05d}.parquet", row_group_size=16384)
        return table.num_rows

    written = sum(ray.get([gen_file.remote(f) for f in range(n_files)]))
    marker.write_text(f"rows={written}\n")
    return out


def generate_transcripts(
    out_dir: str | Path,
    n_turns: int,
    seed: int = 42,
    n_files: int = 8,
    overwrite: bool = False,
) -> Path:
    """Generate ~n_turns turns into ``out_dir`` as ``n_files`` parquet files,
    global row order shuffled. Idempotent via a _SUCCESS marker."""
    out = Path(out_dir)
    marker = out / "_SUCCESS"
    if marker.exists() and not overwrite:
        return out
    if n_turns >= 200_000:
        import ray

        if ray.is_initialized():
            return generate_transcripts_parallel(out, n_turns, seed=seed, n_files=max(n_files, 32))
    out.mkdir(parents=True, exist_ok=True)
    rows: list[dict] = []
    conv_idx = 0
    while len(rows) < n_turns:
        rows.extend(generate_conversation(seed, conv_idx))
        conv_idx += 1
    rows = rows[:n_turns]

    perm = np.random.default_rng(seed).permutation(len(rows))
    cols = {
        "conv_id": [rows[i]["conv_id"] for i in perm],
        "turn_idx": [rows[i]["turn_idx"] for i in perm],
        "role": [rows[i]["role"] for i in perm],
        "text": [rows[i]["text"] for i in perm],
        "tool": [rows[i]["tool"] for i in perm],
        "ts": [rows[i]["ts"] for i in perm],
    }
    table = pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    n = table.num_rows
    per = (n + n_files - 1) // n_files
    for f in range(n_files):
        chunk = table.slice(f * per, per)
        if chunk.num_rows == 0:
            break
        pq.write_table(chunk, out / f"transcripts-{f:05d}.parquet", row_group_size=16384)
    marker.write_text("ok\n")
    return out


# sf -> target turn count (matches the driver's lineitem scaling: sf0.01 ~ 60k)
SF_TURNS = {"sf0.001": 6_000, "sf0.01": 60_000, "sf0.1": 600_000}


def ensure_transcripts_for_sf(sf_dir: str, cache_root: str = "/tmp/mosr_transcripts") -> Path:
    """Deterministic transcript corpus sized to match an sf testdata dir;
    cached under /tmp (scratch) so repeated queries()/bench calls reuse it."""
    name = os.path.basename(os.path.normpath(sf_dir))
    n_turns = SF_TURNS.get(name, 6_000)
    return generate_transcripts(Path(cache_root) / name, n_turns, seed=42)
