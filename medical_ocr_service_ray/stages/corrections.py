"""Corrections overlay: join-and-patch (feedback-loop analogue).

Reference semantics: per-item corrections applied by dot-path onto a deep
clone of the stored result (src/services/feedback.service.js:306-336
``aplicarCorrecciones`` / ``setNestedProperty``; CORREGIR transitions in
src/routes/v1/feedback.routes.js:104-154). Rebuild: a small corrections table
``(conv_id, turn_idx, field, corrected_value)`` (FIXTURES.md F4) broadcast
via ray.put; a map_batches actor patches matching rows columnar-ly. The
patched row keeps lineage: ``corrected_fields`` lists which fields changed.
"""

from __future__ import annotations

import pyarrow as pa

import ray

PATCHABLE_FIELDS = ("extracted_text", "content_type")


class CorrectionsApplier:
    """map_batches actor: patch rows keyed by (conv_id, turn_idx).

    The corrections dict resolves once per actor. Last writer wins when the
    same (key, field) appears twice (D4 upsert semantics)."""

    def __init__(self, corrections_ref):
        rows = ray.get(corrections_ref)
        self.by_key: dict[tuple[str, int], dict[str, str]] = {}
        for r in rows:
            key = (r["conv_id"], int(r["turn_idx"]))
            if r["field"] not in PATCHABLE_FIELDS:
                continue
            self.by_key.setdefault(key, {})[r["field"]] = r["corrected_value"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        cols = {f: batch[f].to_pylist() for f in PATCHABLE_FIELDS if f in batch.column_names}
        corrected: list[list[str]] = [[] for _ in conv]
        hit = False
        for i, key in enumerate(zip(conv, turn)):
            patch = self.by_key.get(key)
            if not patch:
                continue
            hit = True
            for field, value in sorted(patch.items()):
                if field in cols:
                    cols[field][i] = value
                    corrected[i].append(field)
        out = batch
        if hit:
            for f, vals in cols.items():
                idx = out.column_names.index(f)
                out = out.set_column(idx, f, pa.array(vals, pa.string()))
        return out.append_column("corrected_fields", pa.array(corrected, pa.list_(pa.string())))


def apply_corrections(ds, corrections_rows: list[dict], concurrency=(1, 8)):
    """corrections_rows: [{conv_id, turn_idx, field, corrected_value}, ...]"""
    ref = ray.put(corrections_rows)
    return ds.map_batches(
        CorrectionsApplier,
        fn_constructor_kwargs={"corrections_ref": ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def synth_corrections(golden: pa.Table, every_nth: int = 97) -> list[dict]:
    """Deterministic corrections fixture: every Nth turn (by sorted position)
    gets its extracted_text replaced."""
    out = []
    conv = golden["conv_id"].to_pylist()
    turn = golden["turn_idx"].to_pylist()
    for i in range(0, len(conv), every_nth):
        out.append(
            {
                "conv_id": conv[i],
                "turn_idx": turn[i],
                "field": "extracted_text",
                "corrected_value": f"[CORRECTED:{conv[i]}:{turn[i]}]",
            }
        )
    return out
