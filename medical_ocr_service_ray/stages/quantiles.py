"""Exact keyed quantiles over discrete-valued columns.

The exact complement of the mergeable log-histogram sketch
(stages/sketch.py:LogHistogramSketch, q40): when the value domain is
discrete with bounded cardinality (status codes, integral quantities,
bucketed sizes), per-batch value-count partials merge associatively and the
quantile is recovered *exactly* from the cumulative histogram — no sketch
error, still one bounded exchange. The reference's SQL dashboards compute
percentiles directly in Postgres (database/schema.sql stats views); this is
the distributed analogue that never ships raw rows.

Selection rule (mirrored literally by the SQL oracle, never delegated to an
engine's quantile builtin): for p = num/den over n values ascending, take
the first value whose cumulative count >= ceil(n * num / den) — standard
``percentile_disc``, with the rank computed in *integer* arithmetic
((n*num + den - 1) // den) so both engines agree on every boundary.

Scale notes: the exchange is O(groups × distinct values) count rows —
independent of row count. For unbounded/continuous domains use q40's
log-histogram sketch instead; this module asserts nothing silently (a
domain explosion shows up as a big-but-correct shuffle, not wrong answers).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd

from medical_ocr_service_ray.stages.aggregate import partial_then_combine

if TYPE_CHECKING:  # pragma: no cover
    import ray.data as rd


def exact_group_quantiles(
    ds: "rd.Dataset",
    key: str,
    value_col: str,
    quantiles: list[tuple[str, int, int]],
    num_buckets: int = 16,
) -> "rd.Dataset":
    """Per ``key``: n rows plus one exact quantile column per
    ``(out_name, num, den)`` entry. ``value_col`` must be orderable;
    counts are int64 throughout."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([key, value_col], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        merged = df.groupby([key, value_col], as_index=False)["cnt"].sum()
        merged = merged.sort_values([key, value_col], kind="mergesort")
        g = merged.groupby(key, sort=False)
        merged["cum"] = g["cnt"].cumsum()
        totals = g["cnt"].sum().rename("n")
        out = totals.reset_index()
        for name, num, den in quantiles:
            ranks = (totals * num + den - 1) // den  # ceil(n*num/den), exact
            picks = []
            for grp, sub in merged.groupby(key, sort=False):
                r = int(ranks.loc[grp])
                picks.append((grp, sub.loc[sub["cum"] >= r, value_col].iloc[0]))
            out = out.merge(pd.DataFrame(picks, columns=[key, name]), on=key)
        out["n"] = out["n"].astype("int64")
        return out

    return partial_then_combine(ds, partial, key, combine, num_buckets=num_buckets)
