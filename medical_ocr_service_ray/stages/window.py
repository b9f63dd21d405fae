"""Keyed running-window transforms (row_number / cumulative sums / lag gaps).

The per-row analogue of the engine's keyed aggregates: every input row is
emitted, enriched with window columns computed over the full per-key history
in event order. The reference keeps per-job running counters in SQL triggers
and status roll-ups (database/schema.sql progress columns,
src/services/batch.service.js:156-190 processed/total counters); this stage
generalizes that to arbitrary keyed running aggregates as ONE hash-keyed
exchange + vectorized per-bucket pandas kernels — the standard
feature-engineering shape (user history features) in a training-data
pipeline.

Scale notes: output rows == input rows, so the exchange moves each row
exactly once; bucket count should come from ``auto_num_buckets`` so a
bucket's rows fit one task heap. Skew bound is the hottest single key
(one user's history must colocate — same invariant as the ordering stage,
SURVEY.md §4.3.1); running sums are computed with int64 fixed-point, never
float accumulation, so results are associativity-independent and
hash-exact against a SQL window-function oracle.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from medical_ocr_service_ray.stages.aggregate import bucketed_combine

if TYPE_CHECKING:  # pragma: no cover
    import ray.data as rd


def running_aggregates(
    ds: "rd.Dataset",
    key: str,
    order_cols: list[str],
    cum_sum_col: str | None = None,
    cum_scale: int = 10000,
    gap_from: str | None = None,
    num_buckets: int = 16,
) -> "rd.Dataset":
    """Per ``key``, ordered by ``order_cols`` (ascending, deterministic —
    include a unique tiebreaker), add:

    - ``rn``: 1-based row number within the key
    - ``cum_<col>_x<scale>``: running int64 fixed-point sum of ``cum_sum_col``
    - ``gap_s``: whole seconds since the key's previous row's ``gap_from``
      timestamp (int64; -1 for each key's first row, so the column stays
      integer and NULL-free for exact hashing)
    """

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols + [key], kind="mergesort").reset_index(drop=True)
        g = df.groupby(key, sort=False)
        out = df.copy()
        out["rn"] = (g.cumcount() + 1).astype("int64")
        if cum_sum_col is not None:
            fixed = np.rint(df[cum_sum_col].to_numpy() * cum_scale).astype("int64")
            out[f"cum_{cum_sum_col}_x{cum_scale}"] = (
                pd.Series(fixed).groupby(df[key].to_numpy(), sort=False).cumsum()
            ).astype("int64")
        if gap_from is not None:
            # integer microseconds end-to-end (never float seconds), so the
            # floor-division to whole seconds is bit-identical to the SQL
            # oracle's (epoch_us(ts) - epoch_us(prev)) // 1000000
            us = df[gap_from].astype("datetime64[us]").astype("int64")
            prev = pd.Series(us).groupby(df[key].to_numpy(), sort=False).shift(1)
            gap = (us - prev) // 1_000_000
            out["gap_s"] = gap.fillna(-1).astype("int64")
        return out

    return bucketed_combine(ds, key, combine, num_buckets=num_buckets)
