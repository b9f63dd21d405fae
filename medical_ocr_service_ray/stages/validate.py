"""Declarative data-contract validation — the Great-Expectations-shaped
gate a production pipeline runs at its ingest boundary, as a stateless
Ray Data stage.

A contract is a list of rules ``(rule_id, column, kind, param)`` with kinds:

- ``not_null``            — value must be non-null
- ``ge`` / ``le``         — numeric bound (param = bound)
- ``in_set``              — value ∈ param (tuple of allowed values)
- ``str_maxlen``          — len(str) ≤ param

``check_batch`` evaluates every rule VECTORIZED over a pandas batch and
returns per-rule violation counts (one tiny row per rule per batch — the
partial-aggregation shape, so the corpus-wide report is a bounded driver
combine). ``split_batch`` additionally routes violating ROWS (any rule) to
a quarantine frame, mirroring the engine's error-row quarantine for
extraction (state/manifest.py): contracts fail loudly in counts, not
silently in downstream joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

Rule = tuple[str, str, str, object]


def _violation_mask(df: pd.DataFrame, col: str, kind: str, param) -> np.ndarray:
    s = df[col]
    if kind == "not_null":
        return s.isna().to_numpy()
    if kind == "ge":
        return (s < param).fillna(False).to_numpy()
    if kind == "le":
        return (s > param).fillna(False).to_numpy()
    if kind == "in_set":
        # NULL is not_null's violation class, not in_set's (matches SQL
        # NOT IN, where a NULL comparand yields NULL → not counted)
        return (~s.isin(tuple(param)) & ~s.isna()).to_numpy()
    if kind == "str_maxlen":
        # mask nulls BEFORE astype(str) — otherwise NaN renders as 'nan'
        # (len 3) and a NULL double-counts as a maxlen violation
        return (
            (s.astype(str).str.len() > int(param)) & ~s.isna()
        ).fillna(False).to_numpy()
    raise ValueError(f"unknown rule kind: {kind}")


def check_batch(df: pd.DataFrame, rules: list[Rule]) -> pd.DataFrame:
    """Per-rule violation counts for one batch (rule_id, n_violations)."""
    return pd.DataFrame(
        {
            "rule_id": [r[0] for r in rules],
            "n_violations": [
                int(_violation_mask(df, col, kind, param).sum())
                for (_, col, kind, param) in rules
            ],
        }
    )


def split_batch(
    df: pd.DataFrame, rules: list[Rule]
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(clean, quarantined) rows; a row quarantines if ANY rule flags it."""
    bad = np.zeros(len(df), dtype=bool)
    for _, col, kind, param in rules:
        bad |= _violation_mask(df, col, kind, param)
    return df[~bad], df[bad]
