"""2-D pareto skyline (dominance filter) as a combiner-safe operator.

A row ``a`` dominates ``b`` iff ``a.max_col >= b.max_col`` and
``a.min_col <= b.min_col`` with at least one strict inequality; the skyline
is the set of non-dominated rows (ties — identical (max, min) pairs — do
not dominate each other, so duplicates of a skyline point all survive).

Scale shape: the skyline operator is a *semilattice* —
``skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B))`` — so it runs as a
per-batch local skyline (``map_batches``) whose survivors are provably
bounded by the number of distinct ``max_col`` values, followed by one
driver-side final pass over ``O(distinct_max × blocks)`` candidate rows.
No shuffle at all; the reference's closest analogue is the priority
re-rank + slice (SURVEY.md §2 T2/T5), which this generalizes to
two-objective dominance.

Arithmetic note: callers pass integer columns (e.g. price cents) so the
dominance comparisons are exact and mirror the SQL oracle's NOT EXISTS
formulation bit-for-bit.
"""

from __future__ import annotations

import pandas as pd


def local_skyline(df: pd.DataFrame, max_col: str, min_col: str) -> pd.DataFrame:
    """Vectorized O(n log n) 2-D skyline of one frame.

    Sort by (max desc, min asc); a row survives iff its ``min_col`` equals
    its ``max_col``-group minimum AND is strictly below the running minimum
    over all strictly-larger ``max_col`` groups (a larger-``max`` row with
    ``min <=`` ours dominates strictly via the max dimension).
    """
    if len(df) == 0:
        return df
    d = df.sort_values([max_col, min_col], ascending=[False, True], kind="mergesort")
    grp_min = d.groupby(max_col, sort=False)[min_col].transform("min")
    cand = d[d[min_col].to_numpy() == grp_min.to_numpy()]
    firsts = cand.drop_duplicates(max_col)
    prev_cummin = firsts[min_col].cummin().shift(1)
    keep = firsts[max_col][prev_cummin.isna() | (firsts[min_col] < prev_cummin)]
    return cand[cand[max_col].isin(set(keep))]


def skyline(ds, max_col: str, min_col: str) -> pd.DataFrame:
    """Distributed skyline: per-batch local pass, driver final pass over the
    bounded candidate set. Returns a pandas DataFrame (skylines are small by
    construction; the driver pull is O(distinct max_col × blocks) rows)."""

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        return local_skyline(df, max_col, min_col)

    cands = ds.map_batches(per_batch, batch_format="pandas").to_pandas()
    return local_skyline(cands, max_col, min_col)
