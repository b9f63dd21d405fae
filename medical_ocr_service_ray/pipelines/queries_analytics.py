"""windows, churn, CDC/SCD, triangles, z-order, profiling (q87-q112) — split from pipelines/queries.py (r5), no behavior change."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pathlib import Path
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from medical_ocr_service_ray.config import set_engine_shuffle_profile
from medical_ocr_service_ray.functions.textstats import (
    LANGS,
    STOPWORDS,
    sql_lang_score,
    sql_occurrences,
)
from medical_ocr_service_ray.stages import text as text_stages
from medical_ocr_service_ray.stages.aggregate import (
    bucketed_combine,
    driver_combine,
    partial_then_combine,
)
from medical_ocr_service_ray.stages.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs
from medical_ocr_service_ray.stages.join import BroadcastMapper, SemiAntiFilter
from medical_ocr_service_ray.pipelines._qcommon import (
    Path,
    _cents,
    _events_max_us,
    _read,
    bucketed_combine,
    driver_combine,
    np,
    pa,
    partial_then_combine,
    pd,
    pq,
    rd,
)
from medical_ocr_service_ray.pipelines.queries_core import _day_index
from medical_ocr_service_ray.pipelines.queries_joins import (
    _WEEK_US,
    _drop_mega_baskets,
)




# --------------------------------------------------------------------- q87

def q87_user_gaps_churn(sf_dir: str):
    """Per-user inter-event gap profile + churn flag: max gap between
    consecutive events (µs), event count, and churned = (corpus max ts −
    user's last ts) > 2 weeks. The LAG-window analogue done scale-right:
    corpus max comes from parquet footer statistics (zero scan); gaps need a
    user's events co-located and ordered, so ONE keyed exchange on user_id
    (2 narrow columns) with a vectorized per-bucket sort + shifted diff —
    the same co-location contract as sessionization (q28)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    max_us = _events_max_us(sf_dir)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df.user_id.astype("int64"),
                "us": df.ts.to_numpy().astype("datetime64[us]").astype("int64"),
                "event_id": df.event_id.astype("int64"),
            }
        )

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        prev = df.groupby("user_id")["us"].shift(1)
        gap = df.us - prev
        out = (
            df.assign(gap=gap)
            .groupby("user_id", as_index=False)
            .agg(max_gap_us=("gap", "max"), n_events=("us", "size"), last_us=("us", "max"))
        )
        out["max_gap_us"] = out.max_gap_us.fillna(0).astype("int64")
        out["n_events"] = out.n_events.astype("int64")
        out["churned"] = ((max_us - out.last_us) > 2 * _WEEK_US).astype("int64")
        return out[["user_id", "max_gap_us", "n_events", "churned"]]

    return bucketed_combine(
        ds.map_batches(project, batch_format="pandas"), "user_id", gaps
    )


_Q87_SQL = """
WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
g AS (
  SELECT user_id, epoch_us(ts) AS us,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                ORDER BY epoch_us(ts), event_id) AS gap
  FROM events
)
SELECT user_id, COALESCE(MAX(gap), 0)::BIGINT AS max_gap_us,
       COUNT(*)::BIGINT AS n_events,
       CAST((mx.m - MAX(us)) > 1209600000000 AS BIGINT) AS churned
FROM g, mx GROUP BY user_id, mx.m
"""


# --------------------------------------------------------------------- q88

def q88_mad_outliers(sf_dir: str):
    """Robust outlier detection per group: discrete median + MAD (median
    absolute deviation) over the 1e-6-quantized value, and the count of rows
    beyond 3·MAD — the statistical data-quality gate run before training
    ingestion. ONE exchange: per-batch (type, value) partial counts; the
    per-type combine derives the median from the cumulative histogram, then
    builds the DEVIATION histogram from the SAME histogram (|v−med| with
    counts — never re-touching rows), takes its median, and counts outliers
    weighted by cnt. Exchange volume is O(groups × distinct values),
    independent of row count; all arithmetic integer (q44's disc-quantile
    rule), so the window-function oracle matches exactly."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"event_type": df.event_type, "v": _cents(df.value, 1_000_000)})
            .groupby(["event_type", "v"])
            .size()
            .reset_index(name="cnt")
        )

    def _disc_median(sorted_vals: np.ndarray, cnts: np.ndarray) -> int:
        cum = cnts.cumsum()
        n = int(cum[-1])
        return int(sorted_vals[np.searchsorted(cum, (n + 1) // 2)])

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "v"], as_index=False)["cnt"].sum()
        rows = []
        for et, sub in g.groupby("event_type"):
            sub = sub.sort_values("v")
            v, c = sub.v.to_numpy(), sub.cnt.to_numpy()
            med = _disc_median(v, c)
            dev = pd.DataFrame({"d": np.abs(v - med), "cnt": c}).groupby("d", as_index=False)[
                "cnt"
            ].sum()
            mad = _disc_median(dev.d.to_numpy(), dev.cnt.to_numpy())
            rows.append(
                {
                    "event_type": et,
                    "med": med,
                    "mad": mad,
                    "n_outliers": int(c[np.abs(v - med) > 3 * mad].sum()),
                    "n": int(c.sum()),
                }
            )
        out = pd.DataFrame(rows)
        for col in ("med", "mad", "n_outliers", "n"):
            out[col] = out[col].astype("int64")
        return out

    return partial_then_combine(ds, partial, "event_type", per_type, num_buckets=4)


_Q88_SQL = """
WITH counts AS (
  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS v, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
), cum AS (
  SELECT event_type, v, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum_n,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM counts
), med AS (
  SELECT event_type, CAST(any_value(n) AS BIGINT) AS n,
         MIN(v) FILTER (WHERE cum_n >= (n + 1) // 2) AS med
  FROM cum GROUP BY event_type
), dev AS (
  SELECT c.event_type, ABS(c.v - m.med) AS d, SUM(c.cnt) AS cnt
  FROM counts c JOIN med m USING (event_type) GROUP BY 1, 2
), dcum AS (
  SELECT event_type, d, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY d) AS cum_n,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type, MIN(d) FILTER (WHERE cum_n >= (n + 1) // 2) AS mad
  FROM dcum GROUP BY event_type
)
SELECT m.event_type, m.med::BIGINT AS med, a.mad::BIGINT AS mad,
       COALESCE(SUM(c.cnt) FILTER (WHERE ABS(c.v - m.med) > 3 * a.mad), 0)::BIGINT AS n_outliers,
       m.n::BIGINT AS n
FROM med m JOIN mad a USING (event_type) JOIN counts c USING (event_type)
GROUP BY m.event_type, m.med, a.mad, m.n
"""


# --------------------------------------------------------------------- q89

def q89_dense_week_grid(sf_dir: str):
    """Time-series densification (gap filling): per user, one row for EVERY
    epoch-week between first and last activity — zero-filled weeks included —
    the grid a feature store feeds to sequence models. Per-batch (user, week)
    partial counts shrink the exchange; the per-user combine expands spans
    vectorized (np.repeat over span lengths + offset arange — no Python
    per-user loop) and left-merges the counts. Output size is the sum of user
    spans: bounded and explicit, never a cross join."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        wk = df.ts.to_numpy().astype("datetime64[us]").astype("int64") // _WEEK_US
        return (
            pd.DataFrame({"user_id": df.user_id, "wk": wk})
            .groupby(["user_id", "wk"])
            .size()
            .reset_index(name="n")
        )

    def densify(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["user_id", "wk"], as_index=False)["n"].sum()
        span = c.groupby("user_id", as_index=False)["wk"].agg(["min", "max"])
        lens = (span["max"] - span["min"] + 1).to_numpy()
        users = np.repeat(span.user_id.to_numpy(), lens)
        starts = np.repeat(span["min"].to_numpy(), lens)
        # offset within each user's span: global arange minus each span start
        offs = np.arange(lens.sum()) - np.repeat(np.cumsum(lens) - lens, lens)
        grid = pd.DataFrame({"user_id": users, "wk": starts + offs})
        out = grid.merge(c, on=["user_id", "wk"], how="left")
        out["n_events"] = out.n.fillna(0).astype("int64")
        return out[["user_id", "wk", "n_events"]]

    return partial_then_combine(ds, partial, "user_id", densify)


_Q89_SQL = """
WITH uw AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
c AS (SELECT user_id, wk, COUNT(*)::BIGINT AS n FROM uw GROUP BY 1, 2),
span AS (SELECT user_id, MIN(wk) AS a, MAX(wk) AS b FROM uw GROUP BY 1),
grid AS (SELECT user_id, a + u.o AS wk FROM span, unnest(range(0, b - a + 1)) AS u(o))
SELECT g.user_id, g.wk, COALESCE(c.n, 0)::BIGINT AS n_events
FROM grid g LEFT JOIN c USING (user_id, wk)
"""


# --------------------------------------------------------------------- q90

def q90_incremental_agg_merge(sf_dir: str):
    """Incremental materialized-view maintenance: the per-user (spend, count)
    aggregate is built as a BASE state (even event_ids) and a DELTA state
    (odd event_ids) in independent passes, then merged state-to-state — the
    pattern that updates a 100-TB rollup from an hourly delta without
    rescanning the base. Merge = tagged union of the two partial-state
    datasets + one keyed combine summing mergeable fields. The oracle is the
    FULL recompute over all events, so the green hash proves
    incremental == from-scratch (the invariant that matters)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def state(df: pd.DataFrame, parity: int) -> pd.DataFrame:
        sub = df[df.event_id % 2 == parity]
        return (
            pd.DataFrame({"user_id": sub.user_id, "c": _cents(sub.value)})
            .groupby("user_id")
            .agg(spend_cents=("c", "sum"), n_events=("c", "size"))
            .reset_index()
        )

    base = ds.map_batches(lambda df: state(df, 0), batch_format="pandas")
    delta = ds.map_batches(lambda df: state(df, 1), batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False).agg(
            spend_cents=("spend_cents", "sum"), n_events=("n_events", "sum")
        )
        out["spend_cents"] = out.spend_cents.astype("int64")
        out["n_events"] = out.n_events.astype("int64")
        return out

    # the union doubles the tiny partial-state block count: bundle slivers
    # before the bucket stamp (PERF_NOTES §14) so the exchange pays bytes,
    # not per-block task overhead
    return bucketed_combine(
        base.union(delta), "user_id", merge, map_batch_size=65536
    )


_Q90_SQL = """
SELECT user_id, SUM(CAST(round(value * 100) AS BIGINT))::BIGINT AS spend_cents,
       COUNT(*)::BIGINT AS n_events
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------- q91

def q91_salted_join_revenue(sf_dir: str):
    """Skew-aware large-large inner join (stages/skewjoin.py): lineitem ⋈
    orders on orderkey, revenue cents by (o_orderpriority, l_returnflag).
    Hot keys are detected from bounded per-batch partial counts and split
    over 8 salts — the probe side's salt spreads a hot key over 8 bucket
    tasks while the build side replicates only its hot rows 8×. This corpus
    has no hot orderkeys (the detector returns ∅ and the join degrades to
    the plain one-exchange hash join, which is the correct behavior); the
    planted-skew pytest (TestSaltedJoin) is where the salting is proven to
    both split the hot key across tasks and keep the join exact."""
    from medical_ocr_service_ray.stages.skewjoin import detect_hot_keys, salted_inner_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_returnflag"])

    def li_project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "okey": df.l_orderkey.astype("int64"),
                "cents": _cents(df.l_extendedprice),
                "l_returnflag": df.l_returnflag,
            }
        )

    left = li.map_batches(li_project, batch_format="pandas")
    hot = detect_hot_keys(left, "okey", threshold_frac=0.001)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def o_project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"okey": df.o_orderkey.astype("int64"), "o_orderpriority": df.o_orderpriority}
        )

    right = orders.map_batches(o_project, batch_format="pandas")
    joined = salted_inner_join(
        left,
        right,
        "okey",
        hot_keys=hot,
        fanout=8,
        left_schema=pa.schema(
            [("okey", pa.int64()), ("cents", pa.int64()), ("l_returnflag", pa.string())]
        ),
        right_schema=pa.schema([("okey", pa.int64()), ("o_orderpriority", pa.string())]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["o_orderpriority", "l_returnflag"], as_index=False)
            .agg(revenue_cents=("cents", "sum"), n=("cents", "size"))
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["o_orderpriority", "l_returnflag"], as_index=False).agg(
            revenue_cents=("revenue_cents", "sum"), n=("n", "sum")
        )
        out["revenue_cents"] = out.revenue_cents.astype("int64")
        out["n"] = out.n.astype("int64")
        return out

    return partial_then_combine(joined, partial, "o_orderpriority", combine, num_buckets=4)


_Q91_SQL = """
SELECT o.o_orderpriority, l.l_returnflag,
       SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))::BIGINT AS revenue_cents,
       COUNT(*)::BIGINT AS n
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""


# --------------------------------------------------------------------- q92

_DAY_US = 86400 * 1_000_000


def q92_rolling_wau(sf_dir: str):
    """Rolling 7-day active users per epoch-day (the WAU curve): a user
    counts toward day d when active on any day in [d-6, d]. Windowed
    COUNT(DISTINCT) does not pre-aggregate — the trick is to move the window
    to the USER side: per user, merge active days into contribution
    intervals [day, day+6] (q79's vectorized island merge, one user-bucketed
    exchange), then the interval set explodes into at most 7x distinct
    (user, day) rows whose per-day counts ARE the distinct counts (each
    user contributes each day at most once by construction). Output days are
    clipped to the observed corpus day range so the curve has no
    beyond-horizon tail."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    max_day = _events_max_us(sf_dir) // _DAY_US

    def days(df: pd.DataFrame) -> pd.DataFrame:
        d = df.ts.to_numpy().astype("datetime64[us]").astype("int64") // _DAY_US
        return pd.DataFrame({"user_id": df.user_id, "day": d}).drop_duplicates()

    def contribution_counts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(["user_id", "day"], kind="mergesort")
        s = df.day.to_numpy()
        e = s + 7  # half-open [day, day+7) == days day..day+6
        sub = pd.DataFrame({"user_id": df.user_id.to_numpy(), "s": s, "e": e})
        cummax_e = sub.groupby("user_id")["e"].cummax()
        prev = cummax_e.groupby(sub.user_id).shift(1)
        new_island = prev.isna() | (sub.s > prev)
        island = new_island.astype("int64").groupby(sub.user_id).cumsum()
        isl = (
            sub.assign(island=island)
            .groupby(["user_id", "island"], as_index=False)
            .agg(s=("s", "min"), e=("e", "max"))
        )
        isl["e"] = np.minimum(isl.e, max_day + 1)  # clip to the corpus horizon
        lens = (isl.e - isl.s).to_numpy()
        day = np.arange(lens.sum()) - np.repeat(np.cumsum(lens) - lens, lens) + np.repeat(
            isl.s.to_numpy(), lens
        )
        grid = pd.DataFrame({"day": day})
        return grid.groupby("day").size().reset_index(name="n")

    per_user = partial_then_combine(ds, days, "user_id", contribution_counts)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("day", as_index=False)["n"].sum()
        out.columns = ["day", "wau"]
        out["day"] = out.day.astype("int64")
        out["wau"] = out.wau.astype("int64")
        return out

    return bucketed_combine(per_user, "day", total, num_buckets=4)


_Q92_SQL = """
WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
hz AS (SELECT MAX(day) AS max_day FROM ud),
contrib AS (
  SELECT DISTINCT ud.user_id, ud.day + u.o AS day
  FROM ud, hz, unnest(range(0, 7)) AS u(o)
  WHERE ud.day + u.o <= hz.max_day
)
SELECT day, COUNT(*)::BIGINT AS wau FROM contrib GROUP BY day
"""


# --------------------------------------------------------------------- q93

def q93_user_spend_trend(sf_dir: str):
    """Per-user OLS spend trend (is this account ramping up or churning?):
    regress spend-cents on week index with ALL-INTEGER sufficient statistics
    — slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²) reported as exact int64
    numerator/denominator, so the SQL oracle matches bit-for-bit and the
    consumer divides. x = weeks since the user's own first week (small),
    y = cents: every product fits int64 with orders of magnitude to spare.
    Grouped-regression pattern: one partial+combine, no per-user loop —
    the x-recentering happens vectorized inside the user bucket."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        wk = df.ts.to_numpy().astype("datetime64[us]").astype("int64") // _WEEK_US
        return pd.DataFrame(
            {"user_id": df.user_id, "wk": wk, "cents": _cents(df.value)}
        )

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        base = df.groupby("user_id")["wk"].transform("min")
        x = (df.wk - base).astype("int64")
        y = df.cents.astype("int64")
        g = pd.DataFrame(
            {"user_id": df.user_id, "x": x, "y": y, "xy": x * y, "xx": x * x}
        ).groupby("user_id", as_index=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"),
        )
        out = pd.DataFrame(
            {
                "user_id": g.user_id,
                "slope_num": (g.n * g.sxy - g.sx * g.sy).astype("int64"),
                "slope_den": (g.n * g.sxx - g.sx * g.sx).astype("int64"),
                "n_events": g.n.astype("int64"),
            }
        )
        return out

    # x is recentered per user, so the sufficient statistics cannot be
    # combined across batches — co-locate each user's rows with ONE keyed
    # exchange (narrow: 3 int columns), same contract as q57/q87
    return bucketed_combine(
        ds.map_batches(project, batch_format="pandas"), "user_id", per_user
    )


_Q93_SQL = """
WITH p AS (
  SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), x AS (
  SELECT user_id, wk - MIN(wk) OVER (PARTITION BY user_id) AS x, cents AS y
  FROM p
), s AS (
  SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*y) AS sxy, SUM(x*x) AS sxx
  FROM x GROUP BY user_id
)
SELECT user_id, (n*sxy - sx*sy)::BIGINT AS slope_num,
       (n*sxx - sx*sx)::BIGINT AS slope_den, n::BIGINT AS n_events
FROM s
"""


# --------------------------------------------------------------------- q94

def q94_late_events(sf_dir: str):
    """Event-time vs arrival-order lateness audit (the streaming watermark
    concept, batch-exact): treating event_id as arrival order per user, an
    event is LATE when its event time precedes the watermark — the max event
    time among the user's earlier arrivals — by more than a 1-hour
    allowed-lateness. Reports per user: late count and max lateness (µs).
    Running max needs arrival order, so each user's rows co-locate in ONE
    keyed exchange; inside the bucket it is a vectorized sort + cummax +
    shift, the q87 shape with the comparison against the shifted running
    max instead of the neighbor gap."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    HOUR_US = 3600 * 1_000_000

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df.user_id.astype("int64"),
                "us": df.ts.to_numpy().astype("datetime64[us]").astype("int64"),
                "event_id": df.event_id.astype("int64"),
            }
        )

    def lateness(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_id"], kind="mergesort")
        wm = df.groupby("user_id")["us"].cummax().groupby(df.user_id).shift(1)
        late_by = (wm - df.us - HOUR_US).fillna(-1)
        df = df.assign(late=(late_by > 0), late_us=late_by.clip(lower=0))
        out = df.groupby("user_id", as_index=False).agg(
            n_late=("late", "sum"), max_late_us=("late_us", "max"), n_events=("late", "size")
        )
        out["n_late"] = out.n_late.astype("int64")
        out["max_late_us"] = out.max_late_us.astype("int64")
        out["n_events"] = out.n_events.astype("int64")
        return out

    return bucketed_combine(
        ds.map_batches(project, batch_format="pandas"), "user_id", lateness
    )


_Q94_SQL = """
WITH w AS (
  SELECT user_id, epoch_us(ts) AS us,
         MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events
)
SELECT user_id,
       COUNT(*) FILTER (WHERE wm - us > 3600000000)::BIGINT AS n_late,
       COALESCE(MAX(GREATEST(wm - us - 3600000000, 0)), 0)::BIGINT AS max_late_us,
       COUNT(*)::BIGINT AS n_events
FROM w GROUP BY user_id
"""


# --------------------------------------------------------------------- q95

def q95_sorted_export(sf_dir: str):
    """Total-order sorted export (the sorted-final-table need downstream
    merge joins and binary-searchable archives have) WITHOUT ds.sort's
    whole-table sample machinery: (1) a bounded driver pass builds exact range
    boundaries from the distinct-key histogram (keys here are order dates —
    a small domain; for dense domains the same histogram is the q85 decile
    map), (2) one streaming pass stamps each row's range, (3) per-range
    in-bucket sort writes one file per range under /tmp — files are
    internally sorted AND range-disjoint, so their lexical concatenation is
    the global ORDER BY. Returns the concatenated read-back (content is
    oracle-checked; the ORDER property itself is pinned by TestSortedExport
    because the driver's hash compare is order-insensitive)."""
    import shutil

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def key_hist(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderdate").size().reset_index(name="c")

    hist = driver_combine(
        ds, key_hist, lambda df: df.groupby("o_orderdate", as_index=False)["c"].sum()
    ).sort_values("o_orderdate")
    n_ranges = 8
    cum = hist.c.cumsum().to_numpy()
    total = int(cum[-1])
    # exact equi-depth boundaries over the distinct-key histogram
    rng_of_key = dict(
        zip(hist.o_orderdate, np.minimum((n_ranges * (cum - 1)) // total, n_ranges - 1))
    )
    import ray as _ray

    rng_ref = _ray.put(rng_of_key)

    out_dir = Path("/tmp/mosr_q95_sorted") / Path(sf_dir).name
    shutil.rmtree(out_dir, ignore_errors=True)
    out_dir.mkdir(parents=True, exist_ok=True)

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(rng_ref)
        df = df.copy()
        df["__rng"] = df.o_orderdate.map(m).astype("int64")
        df["cents"] = _cents(df.o_totalprice)
        return df.drop(columns="o_totalprice")

    def sort_and_write(df: pd.DataFrame) -> pd.DataFrame:
        rng = int(df.__rng.iloc[0])
        df = df.drop(columns="__rng").sort_values(
            ["o_orderdate", "o_orderkey"], kind="mergesort"
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            out_dir / f"range-{rng:04d}.parquet",
        )
        return pd.DataFrame({"rng": [rng], "n": [len(df)]})

    stamped = ds.map_batches(stamp, batch_format="pandas", batch_size=1 << 18)
    written = stamped.groupby("__rng").map_groups(sort_and_write, batch_format="pandas")
    written.materialize()  # drive the write

    tables = [pq.read_table(p) for p in sorted(out_dir.glob("range-*.parquet"))]
    return pa.concat_tables(tables)


_Q95_SQL = """
SELECT o_orderkey, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
FROM orders
ORDER BY o_orderdate, o_orderkey
"""


# --------------------------------------------------------------------- q96

def q96_table_checksums(sf_dir: str):
    """Order-independent table content checksum — validate a 100-TB copy or
    migration without sorting anything: per row, a deterministic polynomial
    over its key numeric fields (wrapping int64 arithmetic, the Knuth
    multiplier family shared with q35/q37), summed per table with wrapping
    addition. Any dropped/duplicated/bit-flipped row moves the sum. One
    streaming partial+driver-combine per table, three narrow columns read.
    SQL mirrors the wrap via 128-bit intermediates reduced mod 2^64."""
    M = np.int64(-7046029254386353131)  # 2654435761 * 2^32 + 1 class odd mult

    def poly(cols: list[np.ndarray]) -> np.ndarray:
        acc = np.zeros(len(cols[0]), dtype=np.int64)
        with np.errstate(over="ignore"):
            for c in cols:
                acc = acc * M + c.astype("int64")
        return acc

    specs = {
        "orders": ("orders", ["o_orderkey", "o_custkey"], lambda df: [
            df.o_orderkey.to_numpy(), df.o_custkey.to_numpy()
        ]),
        "lineitem": ("lineitem", ["l_orderkey", "l_partkey", "l_quantity"], lambda df: [
            df.l_orderkey.to_numpy(), df.l_partkey.to_numpy(),
            df.l_quantity.to_numpy().astype("int64"),
        ]),
        "events": ("events", ["event_id", "user_id"], lambda df: [
            df.event_id.to_numpy(), df.user_id.to_numpy()
        ]),
    }
    rows = []
    for name, (table, cols, extract) in specs.items():
        ds = _read(sf_dir, table, cols)

        def partial(df: pd.DataFrame, extract=extract) -> pd.DataFrame:
            with np.errstate(over="ignore"):
                s = np.int64(poly(extract(df)).sum())
            return pd.DataFrame({"chk": [s], "n": [np.int64(len(df))]})

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            with np.errstate(over="ignore"):
                return pd.DataFrame(
                    {"chk": [np.int64(df.chk.to_numpy().sum())], "n": [df.n.sum()]}
                )

        agg = driver_combine(ds, partial, combine)
        rows.append(
            {"tbl": name, "checksum": int(agg.chk[0]), "n_rows": int(agg.n[0])}
        )
    out = pd.DataFrame(rows)
    out["checksum"] = out.checksum.astype("int64")
    out["n_rows"] = out.n_rows.astype("int64")
    return out


def _q96_sql() -> str:
    """Wrapping-int64 polynomial + wrapping sum in SQL. The Horner chain
    acc = acc*M + c over columns c1..cn equals the flat sum
    sum_j c_j * M^(n-1-j)  (mod 2^64), so the oracle precomputes each
    column's constant K_j = M^(n-1-j) mod 2^64 in Python and emits one
    multiply per column. A naive HUGEINT a*K overflows INT128 (both
    operands can reach 2^64), so each multiply is split at 32 bits:
    a*K mod 2^64 = (a0*K0 + 2^32*((a1*K0 + a0*K1) mod 2^32)) mod 2^64 —
    every intermediate stays under 2^65. The signed representative is
    restored at the end."""
    m_u = (-7046029254386353131) % (1 << 64)  # Fibonacci-hash odd multiplier
    tables = {
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "CAST(l_quantity AS BIGINT)"],
        "events": ["event_id", "user_id"],
    }
    w = "18446744073709551616::HUGEINT"  # 2^64
    b32 = "4294967296::HUGEINT"  # 2^32
    parts = []
    for tbl, cols in tables.items():
        n = len(cols)
        terms = []
        for j, c in enumerate(cols):
            k = pow(m_u, n - 1 - j, 1 << 64)
            k1, k0 = k >> 32, k & 0xFFFFFFFF
            a = f"((({c})::HUGEINT % {w}) + {w}) % {w}"
            if k == 1:
                terms.append(f"({a})")
                continue
            a0 = f"(({a}) % {b32})"
            a1 = f"(({a}) // {b32})"
            terms.append(
                f"(({a0} * {k0}::HUGEINT"
                f" + (({a1} * {k0}::HUGEINT + {a0} * {k1}::HUGEINT) % {b32}) * {b32})"
                f" % {w})"
            )
        row = f"(({' + '.join(terms)}) % {w})"
        parts.append(
            f"""SELECT '{tbl}' AS tbl,
  (CASE WHEN s >= 9223372036854775808::HUGEINT THEN s - {w} ELSE s END)::BIGINT AS checksum,
  n::BIGINT AS n_rows
FROM (SELECT SUM({row}) % {w} AS s, COUNT(*) AS n FROM {tbl})"""
        )
    return "\nUNION ALL\n".join(parts)


# --------------------------------------------------------------------- q97

def q97_cdc_merge_patch(sf_dir: str, batch_size: int = 65536):
    """Merge-patch CDC apply (the Debezium/lakehouse partial-update MERGE):
    the event stream is a per-user change log ordered by (ts, event_id) where
    each record is a DELETE tombstone (event_id % 11 == 0) or an upsert that
    patches a SUBSET of columns (cents present iff event_id % 3 != 0, type
    present iff event_id % 2 == 0). Final state per user: the row exists iff
    an upsert follows the last delete; each column holds its last non-NULL
    patch AFTER that delete (sentinels -1 / '' when no surviving patch).

    Scale shape: per-batch partial keeps ONE candidate row per user per batch
    (max delete key, per-column argmax-non-null, max upsert key) so the single
    exchange carries O(users-per-batch) rows, never the log. The same reduce
    runs in the bucketed combine — reduction is associative because argmax
    over (ts, event_id) tuples is."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])

    NEV = pd.Timestamp("1677-09-22")  # "never happened" sentinel, < any data ts

    def reduce_log(df: pd.DataFrame) -> pd.DataFrame:
        """The associative per-user reduce: works on raw rows AND on partial
        rows (partials re-enter as upsert-shaped rows with the same cols)."""
        dele = df[df.is_del]
        ups = df[~df.is_del]
        # last delete key per user
        dk = (
            dele.sort_values(["user_id", "ts", "event_id"])
            .groupby("user_id", as_index=False)
            .tail(1)[["user_id", "ts", "event_id"]]
            .rename(columns={"ts": "d_ts", "event_id": "d_eid"})
        )
        # last upsert key per user (row-existence witness)
        uk = (
            ups.sort_values(["user_id", "ts", "event_id"])
            .groupby("user_id", as_index=False)
            .tail(1)[["user_id", "ts", "event_id"]]
            .rename(columns={"ts": "u_ts", "event_id": "u_eid"})
        )
        # per-column last non-NULL patch (explicit presence flags — a
        # legitimately negative cents value or empty-string type is still
        # a patch; the -1/'' sentinels appear only in the OUTPUT)
        vc = ups[ups.has_cents]
        vk = (
            vc.sort_values(["user_id", "ts", "event_id"])
            .groupby("user_id", as_index=False)
            .tail(1)[["user_id", "ts", "event_id", "cents"]]
            .rename(columns={"ts": "v_ts", "event_id": "v_eid"})
        )
        tc = ups[ups.has_type]
        tk = (
            tc.sort_values(["user_id", "ts", "event_id"])
            .groupby("user_id", as_index=False)
            .tail(1)[["user_id", "ts", "event_id", "etype"]]
            .rename(columns={"ts": "t_ts", "event_id": "t_eid"})
        )
        out = uk.merge(dk, on="user_id", how="outer").merge(vk, on="user_id", how="outer").merge(
            tk, on="user_id", how="outer"
        )
        for c in ("d_ts", "u_ts", "v_ts", "t_ts"):
            out[c] = out[c].fillna(NEV)
        for c in ("d_eid", "u_eid", "v_eid", "t_eid"):
            out[c] = out[c].fillna(-1).astype("int64")
        out["cents"] = out.cents.fillna(-1).astype("int64")
        out["etype"] = out.etype.fillna("")
        return out

    def after(out: pd.DataFrame, p: str) -> pd.Series:
        """(p_ts, p_eid) > (d_ts, d_eid) — the survived-the-delete test."""
        return (out[f"{p}_ts"] > out.d_ts) | (
            (out[f"{p}_ts"] == out.d_ts) & (out[f"{p}_eid"] > out.d_eid)
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            is_del=(df.event_id % 11) == 0,
            has_cents=(df.event_id % 3) != 0,
            has_type=(df.event_id % 2) == 0,
            cents=np.where((df.event_id % 3) != 0, _cents(df.value), -1).astype("int64"),
            etype=np.where((df.event_id % 2) == 0, df.event_type, ""),
        )[["user_id", "ts", "event_id", "is_del", "has_cents", "has_type", "cents", "etype"]]
        out = reduce_log(df)
        # re-encode the partial as log-shaped rows so combine = same reduce:
        # one delete row (if any) + one row per surviving column candidate +
        # the bare existence row. Columns stay (user_id, ts, event_id, ...).
        rows = []
        d = out[out.d_eid >= 0]
        rows.append(
            pd.DataFrame(
                {"user_id": d.user_id, "ts": d.d_ts, "event_id": d.d_eid,
                 "is_del": True, "has_cents": False, "has_type": False,
                 "cents": -1, "etype": ""}
            )
        )
        u = out[out.u_eid >= 0]
        rows.append(
            pd.DataFrame(
                {"user_id": u.user_id, "ts": u.u_ts, "event_id": u.u_eid,
                 "is_del": False, "has_cents": False, "has_type": False,
                 "cents": -1, "etype": ""}
            )
        )
        v = out[out.v_eid >= 0]
        rows.append(
            pd.DataFrame(
                {"user_id": v.user_id, "ts": v.v_ts, "event_id": v.v_eid,
                 "is_del": False, "has_cents": True, "has_type": False,
                 "cents": v.cents, "etype": ""}
            )
        )
        t = out[out.t_eid >= 0]
        rows.append(
            pd.DataFrame(
                {"user_id": t.user_id, "ts": t.t_ts, "event_id": t.t_eid,
                 "is_del": False, "has_cents": False, "has_type": True,
                 "cents": -1, "etype": t.etype}
            )
        )
        return pd.concat(rows, ignore_index=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = reduce_log(df)
        live = out[after(out, "u")].copy()
        live["last_cents"] = np.where(after(live, "v"), live.cents, -1).astype("int64")
        live["last_type"] = np.where(after(live, "t"), live.etype, "")
        live["last_ts"] = live.u_ts
        live["user_id"] = live.user_id.astype("int64")
        return live[["user_id", "last_cents", "last_type", "last_ts"]]

    return partial_then_combine(ds, partial, "user_id", combine, batch_size=batch_size)


_Q97_SQL = """
WITH log AS (
  SELECT user_id, ts, event_id,
         (event_id % 11) = 0 AS is_del,
         CASE WHEN (event_id % 11) <> 0 AND (event_id % 3) <> 0
              THEN CAST(round(value * 100) AS BIGINT) END AS cents,
         CASE WHEN (event_id % 11) <> 0 AND (event_id % 2) = 0
              THEN event_type END AS etype,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
thresh AS (
  SELECT user_id, COALESCE(MAX(rn) FILTER (WHERE is_del), 0) AS del_rn
  FROM log GROUP BY user_id
),
live AS (
  SELECT l.* FROM log l JOIN thresh t USING (user_id)
  WHERE NOT l.is_del AND l.rn > t.del_rn
)
SELECT user_id,
       COALESCE(arg_max(cents, rn) FILTER (WHERE cents IS NOT NULL), -1) AS last_cents,
       COALESCE(arg_max(etype, rn) FILTER (WHERE etype IS NOT NULL), '') AS last_type,
       arg_max(ts, rn) AS last_ts
FROM live GROUP BY user_id
"""


# --------------------------------------------------------------------- q98

def q98_scd2_intervals(sf_dir: str):
    """SCD-type-2 dimension history build: per user, the event_type attribute's
    validity intervals [valid_from, valid_to) with consecutive equal values
    collapsed; the open current interval closes at a fixed far-future sentinel
    so every column is non-NULL. One bucketed exchange on user_id; the island
    detection (shift-compare + cumsum) and the interval close (groupby shift)
    are fully vectorized inside each bucket — per-bucket memory is the three
    narrow columns of that bucket's users only."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    SENTINEL = pd.Timestamp("2100-01-01")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = df.user_id.ne(df.user_id.shift())
        chg = new_user | df.event_type.ne(df.event_type.shift())
        df = df.assign(__island=chg.cumsum())
        g = df.groupby("__island", as_index=False).agg(
            user_id=("user_id", "first"),
            event_type=("event_type", "first"),
            valid_from=("ts", "first"),
            n_events=("ts", "size"),
        )
        nxt = g.groupby("user_id").valid_from.shift(-1)
        g["valid_to"] = nxt.fillna(SENTINEL)
        g["n_events"] = g.n_events.astype("int64")
        return g[["user_id", "event_type", "valid_from", "valid_to", "n_events"]]

    return bucketed_combine(ds, "user_id", combine)


_Q98_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
c AS (
  SELECT *, CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END AS chg
  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY rn)
),
i AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY rn) AS island FROM c),
g AS (
  SELECT user_id, island, MIN(event_type) AS event_type, MIN(ts) AS valid_from,
         COUNT(*) AS n_events
  FROM i GROUP BY user_id, island
)
SELECT user_id, event_type, valid_from,
       COALESCE(lead(valid_from) OVER (PARTITION BY user_id ORDER BY island),
                TIMESTAMP '2100-01-01') AS valid_to,
       n_events
FROM g
"""


# --------------------------------------------------------------------- q99

def q99_uniform_sample(sf_dir: str):
    """Deterministic global uniform k-sample as bottom-k by arithmetic hash
    (the Knuth multiply shared with q35/q37, so DuckDB reproduces the exact
    rows): each batch keeps its k smallest (hash, doc_id), the driver merges
    blocks x k candidate rows — the table itself never moves and the result
    is independent of partitioning. The 100-TB reservoir-sample replacement:
    no RNG state, restartable, same sample every run."""
    K = 100
    ds = _read(sf_dir, "documents", ["doc_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = (df.doc_id.astype("uint64") * np.uint64(2654435761)) % np.uint64(1 << 32)
        df = df.assign(h=h.astype("int64"))
        return df.nsmallest(K, ["h", "doc_id"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(K, ["h", "doc_id"])

    return combine(driver_combine(ds, partial, lambda d: d))[["doc_id", "h"]].reset_index(
        drop=True
    )


_Q99_SQL = """
SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS h
FROM documents
ORDER BY h, doc_id
LIMIT 100
"""


# -------------------------------------------------------------------- q100

def q100_triangle_count(sf_dir: str, broadcast_max_bytes: int = 512 << 20):
    """Distributed triangle counting over the co-purchase graph (nodes =
    parts, edges = q71's same-order pairs, deduplicated) — the
    Suri–Vassilvitskii wedge-closure MapReduce shape on Ray Data, fused to
    TWO exchanges:

    1. distinct-per-order-bucket pair expansion (exchange 1). Cross-bucket
       duplicate pairs survive this stage deliberately;
    2. orientation: every pair points from its (degree, node)-smaller
       endpoint. The order only needs to be CONSISTENT for correctness —
       degree accuracy affects the out-degree bound, not the count — so
       degrees come from the stage-1 pairs (≤3% dupe inflation) via one
       bounded driver pass over the NODE domain (the part dimension;
       broadcast like every small-dim side, q33 caveat applies);
    3. one (src)-keyed exchange fuses the rest into a single task per
       bucket: exact dedup (every copy of (src,v) lands in src's bucket),
       pure-numpy ordered-pair wedge expansion (the q89 repeat/arange
       idiom — 5x faster than a pandas self-merge), and closure by
       searchsorted against the BROADCAST sorted edge-key array (the small
       side of the wedge⋈edge join: 41 M wedges vs 1.2 M edges at sf0.1).
       Wedges never leave their task.

    When the edge set exceeds ``broadcast_max_bytes`` (default 512 MiB) the
    closure falls back to the no-broadcast scale path: the fused bucket
    emits (v, w, multiplicity) wedge keys + its deduped edges, and one
    more (v)-keyed tagged-union exchange counts closures — three exchanges
    total, nothing broadcast but the dimension-sized degree map. Both
    paths proven equal in TestTriangleCount."""
    p1, nb = _copurchase_pairs(sf_dir)
    return _triangles_from_pairs(p1, nb, broadcast_max_bytes)


def _copurchase_pairs(sf_dir: str):
    """Stage 1 of the co-purchase graph queries (q100/q156): per-order
    distinct (a<b) part pairs via one l_orderkey-keyed exchange,
    MATERIALIZED so both the degree pass and the wedge pass can consume it
    without recomputing the expansion. Cross-bucket duplicate pairs
    survive deliberately (each consumer dedups where its semantics need
    it). Returns (pairs_dataset, num_buckets)."""
    from medical_ocr_service_ray.stages.aggregate import (
        compute_num_buckets,
        dataset_input_bytes,
    )

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    nb = compute_num_buckets(dataset_input_bytes(ds))

    def pairs_distinct(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        out = m[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
        return out.rename(columns={"l_partkey_x": "a", "l_partkey_y": "b"})

    p1 = bucketed_combine(ds, "l_orderkey", pairs_distinct, num_buckets=nb).materialize()
    return p1, nb


def _triangles_from_pairs(
    p1,
    nb: int,
    broadcast_max_bytes: int = 512 << 20,
    want_wedges: bool = False,
):
    """q100's plan from the materialized pair stream on: orientation
    degrees, fused dedup+wedge+closure buckets, broadcast / no-broadcast
    paths (see q100_triangle_count docstring). With ``want_wedges`` the
    result gains an exact ``n_wedges`` column (sum d*(d-1)/2 over EXACT
    node degrees): on the broadcast path the globally-deduped edge-key
    array ``ek`` already sits on the driver, so degrees are one numpy
    unique-with-counts over its two endpoint columns — zero extra
    exchanges (this is what lets q156 drop its standalone degree-dedup
    exchange); the no-broadcast scale path falls back to one (a)-keyed
    bucketed dedup (complete: every copy of an a<b pair hashes to a's
    bucket) emitting bounded per-node degree partials."""
    import ray as _ray

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        n = pd.concat([df.a, df.b], ignore_index=True)
        return n.value_counts().rename_axis("node").reset_index(name="d")

    deg = driver_combine(
        p1, deg_partial, lambda df: df.groupby("node", as_index=False)["d"].sum()
    )
    n_nodes = len(deg)  # dupes add no nodes: exact even over stage-1 pairs
    # (degree, node) total order packed into one int64: deg < 2^31, node < 2^31
    ordk = (deg.d.to_numpy().astype("int64") << 31) | deg.node.to_numpy().astype("int64")
    ord_ref = _ray.put(dict(zip(deg.node.to_numpy(), ordk)))

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        om = _ray.get(ord_ref)
        ka = df.a.map(om).to_numpy()
        kb = df.b.map(om).to_numpy()
        fwd = ka < kb
        return pd.DataFrame(
            {
                "src": np.where(fwd, df.a, df.b).astype("int64"),
                "v": np.where(fwd, df.b, df.a).astype("int64"),
                "kv": np.where(fwd, kb, ka).astype("int64"),
            }
        )

    oriented = p1.map_batches(orient, batch_format="pandas")

    def dedup_and_wedges(df: pd.DataFrame) -> tuple[pd.DataFrame, np.ndarray, np.ndarray]:
        """Per src-bucket: exact edge dedup, then all ordered out-neighbor
        pairs per src, pure numpy: sort by (src, kv); each element at
        within-group position p pairs, as the kv-LARGER side, with its p
        predecessors."""
        df = df.drop_duplicates(["src", "v"]).sort_values(["src", "kv"], kind="mergesort")
        src = df.src.to_numpy()
        v = df.v.to_numpy()
        n = len(src)
        if n == 0:
            return df, np.empty(0, np.int64), np.empty(0, np.int64)
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        glen = np.diff(np.r_[starts, n])
        gstart = np.repeat(starts, glen)
        pos = np.arange(n) - gstart
        total = int(pos.sum())
        offs = np.cumsum(pos) - pos
        y_idx = np.repeat(np.arange(n), pos)
        x_idx = np.arange(total) - np.repeat(offs, pos) + np.repeat(gstart, pos)
        return df, v[x_idx].astype(np.int64), v[y_idx].astype(np.int64)

    est_edge_bytes = p1.count() * 16
    if est_edge_bytes <= broadcast_max_bytes:
        oriented = oriented.materialize()  # consumed twice below (ek + closure)
        # global sorted edge-key array from the stage-1 pairs: duplicates
        # cannot change MEMBERSHIP, so dedup happens in one driver unique
        ek = np.unique(
            driver_combine(
                oriented,
                lambda df: pd.DataFrame(
                    {"k": (df.src.to_numpy().astype("int64") << 31) | df.v.to_numpy()}
                ),
                lambda df: df,
            ).k.to_numpy()
        )
        n_edges = len(ek)
        wedges = None
        if want_wedges:
            ends = np.concatenate([ek >> 31, ek & ((1 << 31) - 1)])
            _, dcnt = np.unique(ends, return_counts=True)
            wedges = sum(int(x) * (int(x) - 1) // 2 for x in dcnt)
        ek_ref = _ray.put(ek)

        def close_bucket(df: pd.DataFrame) -> pd.DataFrame:
            keys = _ray.get(ek_ref)
            _, wx, wy = dedup_and_wedges(df)
            comp = (wx << 31) | wy
            pos = np.searchsorted(keys, comp)
            pos[pos >= len(keys)] = len(keys) - 1
            return pd.DataFrame({"tri": [np.int64((keys[pos] == comp).sum())]})

        tri = int(
            bucketed_combine(oriented, "src", close_bucket, num_buckets=nb)
            .to_pandas()
            .tri.sum()
        )
    else:
        # No-broadcast scale path: the fused bucket emits wedge keys with
        # multiplicity plus its deduped edge rows; one more (v)-keyed
        # tagged-union exchange counts the closures.
        def wedges_and_edges(df: pd.DataFrame) -> pd.DataFrame:
            e, wx, wy = dedup_and_wedges(df)
            comp, mult = np.unique((wx << 31) | wy, return_counts=True)
            wrows = pd.DataFrame(
                {
                    "v": (comp >> 31).astype("int64"),
                    "w": (comp & ((1 << 31) - 1)).astype("int64"),
                    "mult": mult.astype("int64"),
                    "side": np.int8(0),
                }
            )
            erows = pd.DataFrame(
                {
                    "v": e.src.to_numpy(),
                    "w": e.v.to_numpy(),
                    "mult": np.int64(1),
                    "side": np.int8(1),
                }
            )
            return pd.concat([wrows, erows], ignore_index=True)

        tagged = bucketed_combine(oriented, "src", wedges_and_edges, num_buckets=nb)

        def close_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            e = df[df.side == 1][["v", "w"]]
            wd = df[df.side == 0]
            hit = wd.merge(e, on=["v", "w"])
            return pd.DataFrame(
                {
                    "tri": [np.int64(hit.mult.sum())],
                    "ne": [np.int64(len(e))],
                }
            )

        closed = bucketed_combine(tagged, "v", close_per_bucket, num_buckets=nb).to_pandas()
        tri = int(closed.tri.sum())
        n_edges = int(closed["ne"].sum())
        wedges = None
        if want_wedges:

            def deg_bucket(df: pd.DataFrame) -> pd.DataFrame:
                d = df.drop_duplicates(["a", "b"])
                n = pd.concat([d.a, d.b], ignore_index=True)
                return n.value_counts().rename_axis("node").reset_index(name="d")

            deg = (
                bucketed_combine(p1, "a", deg_bucket, num_buckets=nb)
                .to_pandas()
                .groupby("node", as_index=False)["d"]
                .sum()
            )
            wedges = sum(int(x) * (int(x) - 1) // 2 for x in deg.d)

    out = {
        "n_nodes": [np.int64(n_nodes)],
        "n_edges": [np.int64(n_edges)],
        "n_triangles": [np.int64(tri)],
    }
    if want_wedges:
        out["n_wedges"] = [np.int64(wedges)]
    return pd.DataFrame(out)


_Q100_SQL = """
WITH e AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
)
SELECT
  (SELECT COUNT(*) FROM (SELECT a AS node FROM e UNION SELECT b FROM e))::BIGINT AS n_nodes,
  (SELECT COUNT(*) FROM e)::BIGINT AS n_edges,
  (SELECT COUNT(*) FROM e x
     JOIN e y ON y.a = x.b
     JOIN e z ON z.a = x.a AND z.b = y.b)::BIGINT AS n_triangles
"""


# -------------------------------------------------------------------- q101

def q101_partitioned_write_prune(sf_dir: str):
    """Hive-partitioned sink + partition-pruned read-back — the layout/prune
    contract every lakehouse table relies on: (1) one streaming pass writes
    events hive-partitioned by event_type (``write_parquet(partition_cols=)``,
    one directory per value, resumable per-partition); (2) the consumer reads
    ONLY the ``event_type=purchase`` directory — pruning happens at the PATH
    level, so at 100 TB the other partitions' files are never listed past the
    directory walk, never opened, never decoded (TestPartitionPrune pins
    ``input_files()`` ⊆ the one partition); (3) a bounded daily rollup over
    the pruned read. The partition column itself lives in the path, not the
    files — the read-back proves the round trip."""
    import shutil

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    out_dir = Path("/tmp/mosr_q101_part") / Path(sf_dir).name
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.write_parquet(str(out_dir), partition_cols=["event_type"])

    pruned = rd.read_parquet(str(out_dir / "event_type=purchase"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"day": df.ts.dt.strftime("%Y-%m-%d"), "cents": _cents(df.value)})
            .groupby("day", as_index=False)
            .agg(p_n=("cents", "size"), p_c=("cents", "sum"))
        )

    def combine(partials: pd.DataFrame) -> pd.DataFrame:
        out = partials.groupby("day", as_index=False).agg(
            n_events=("p_n", "sum"), cents=("p_c", "sum")
        )
        out["n_events"] = out.n_events.astype("int64")
        out["cents"] = out.cents.astype("int64")
        return out

    return driver_combine(pruned, partial, combine)


_Q101_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       COUNT(*)::BIGINT AS n_events,
       SUM(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
FROM events
WHERE event_type = 'purchase'
GROUP BY 1
"""


# -------------------------------------------------------------------- q102

def q102_tfidf_by_source(sf_dir: str):
    """Per-source TF-IDF top terms (corpus characterization / domain-drift
    monitoring): each SOURCE is one pseudo-document; tf = token occurrences
    in the source, df = number of sources containing the token,
    idf_q = floor(1e6·ln(N/df)) (the q43/q69 quantized-ln idiom, proven
    bit-identical to DuckDB), score = tf·idf_q all-int64.

    Plan: per-batch (source, token) counts (tokenizer shared with q41/SQL)
    → ONE token-keyed bucketed combine where df is complete (a token's rows
    all land in its bucket) and each bucket emits its per-source top-10
    candidates — buckets partition tokens, so the global per-source top-10
    is a subset of the union; the driver merges buckets×10 rows per source.
    The hot-token exchange bound is the q41 partial-count shape: one row
    per (source, token, batch), never per occurrence."""
    from medical_ocr_service_ray.functions.hashing import tokens

    K = 10
    ds = _read(sf_dir, "documents", ["text", "source"])

    n_sources = len(
        driver_combine(
            ds,
            lambda df: df[["source"]].drop_duplicates(),
            lambda df: df.drop_duplicates(),
        )
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        srcs, toks = [], []
        for s, t in zip(df.source, df.text):
            tt = tokens(t or "")
            toks.extend(tt)
            srcs.extend([s] * len(tt))
        return (
            pd.DataFrame({"source": srcs, "token": toks})
            .groupby(["source", "token"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    def rank_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(["source", "score", "token"], ascending=[True, False, True])
            .groupby("source", as_index=False)
            .head(K)
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        tf = df.groupby(["source", "token"], as_index=False)["c"].sum()
        dfreq = tf.groupby("token", as_index=False).agg(df=("source", "size"))
        m = tf.merge(dfreq, on="token")
        idf_q = np.floor(
            1e6 * np.log(float(n_sources) / m["df"].to_numpy().astype(np.float64))
        ).astype("int64")
        m["score"] = m.c.to_numpy().astype("int64") * idf_q
        return rank_topk(m)

    cand = bucketed_combine(ds.map_batches(partial, batch_format="pandas"), "token", combine)
    out = rank_topk(cand.to_pandas()).reset_index(drop=True)
    out["rank"] = out.groupby("source").cumcount() + 1
    out["tf"] = out.c.astype("int64")
    out["df"] = out["df"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    return out[["source", "rank", "token", "tf", "df", "score"]]


_Q102_SQL = r"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[\p{L}\p{N}_]+')) AS token
  FROM documents
), tf AS (
  SELECT source, token, COUNT(*)::BIGINT AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT token, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1
), n AS (
  SELECT COUNT(DISTINCT source) AS n FROM documents
), scored AS (
  SELECT t.source, t.token, t.tf, d.df,
         t.tf * CAST(floor(1000000 * ln(CAST(n.n AS DOUBLE) / d.df)) AS BIGINT) AS score
  FROM tf t JOIN dfreq d USING (token), n
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY score DESC, token) AS rank
  FROM scored
)
SELECT source, rank::BIGINT AS rank, token, tf, df, score
FROM ranked WHERE rank <= 10
"""


# -------------------------------------------------------------------- q103

def _morton_spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of x so bit i lands at position 2i — the
    classic magic-number interleave, int64 throughout."""
    v = x.astype(np.int64) & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def q103_zorder_cluster(sf_dir: str):
    """Z-order (Morton) clustering — the Databricks Z-ORDER / lakehouse
    data-layout op: interleave the bits of (user_id, day_index) into one
    z-key so rows close in BOTH dimensions land close in the linear order,
    then range-partition on the z-key with q95's exact equi-depth histogram
    machinery and write one internally-sorted file per range. Readers
    filtering on EITHER column then skip most files via min/max stats —
    TestZorderCluster pins the locality win (per-file bounding-box area vs
    a single-column sort layout). Returns the stamped rows (event_id,
    user_id, day_idx, zkey); the SQL oracle reproduces the bit interleave
    as a generated 16-term shift expression, so the z-key arithmetic is
    hash-checked end-to-end."""
    import shutil

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        day = _day_index(df.ts)
        z = _morton_spread16(df.user_id.to_numpy()) | (_morton_spread16(day) << 1)
        return pd.DataFrame(
            {
                "event_id": df.event_id.astype("int64"),
                "user_id": df.user_id.astype("int64"),
                "day_idx": day,
                "zkey": z.astype("int64"),
            }
        )

    # materialized ONCE: the boundary derivation (prefix histogram +
    # needle pass inside _equidepth_boundaries) and the final range write
    # all re-read cached blocks instead of re-running the scan + interleave
    stamped = ds.map_batches(stamp, batch_format="pandas").materialize()

    # Equi-depth boundaries with O(n_ranges) driver/broadcast state — the
    # shared _equidepth_boundaries rule (this function is where it came
    # from; q136/q140 reuse it). Same assignment as r3's per-distinct-key
    # dict, reformulated: rng(k) = floor(n_ranges·(cum_k−1)/total) equals
    # #{r : b_r ≤ k} with b_r = min key with cum ≥ ceil(r·total/n)+1 —
    # duplicates kept so a heavy key spanning depths counts multiply.
    # TestZorderBoundaryEquivalence pins the bit-equality; zkey < 2^33
    # (16-bit spread ×2, +1 shift) ⇒ pshift=17 keeps prefixes ≤ 2^16.
    n_ranges = 16
    # lazy import: the helper lives with q136 in queries_mlprep (a LATER
    # family module) — importing at call time instead of module top keeps
    # the family modules' import order acyclic and linear
    from medical_ocr_service_ray.pipelines.queries_mlprep import (
        _equidepth_boundaries,
    )

    boundaries = _equidepth_boundaries(
        stamped, lambda df: df.zkey.to_numpy(), n_ranges, pshift=17
    )

    out_dir = Path("/tmp/mosr_q103_zorder") / Path(sf_dir).name
    shutil.rmtree(out_dir, ignore_errors=True)
    out_dir.mkdir(parents=True, exist_ok=True)

    def add_rng(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__rng"] = np.searchsorted(
            boundaries, df.zkey.to_numpy(), side="right"
        ).astype("int64")
        return df

    def sort_and_write(df: pd.DataFrame) -> pd.DataFrame:
        rng = int(df.__rng.iloc[0])
        df = df.drop(columns="__rng").sort_values(["zkey", "event_id"], kind="mergesort")
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            out_dir / f"range-{rng:04d}.parquet",
        )
        return df

    return (
        stamped.map_batches(add_rng, batch_format="pandas")
        .groupby("__rng")
        .map_groups(sort_and_write, batch_format="pandas")
    )


def _q103_sql() -> str:
    """Generated 16-term bit-spread mirror of _morton_spread16: spread(x) =
    Σ_i ((x >> i) & 1) << 2i, as plain BIGINT shift arithmetic."""

    def spread(col: str, shift: int) -> str:
        terms = [
            f"((({col} >> {i}) & 1) << {2 * i + shift})" for i in range(16)
        ]
        return " + ".join(terms)

    day = "CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01') / 86400000000.0) AS BIGINT)"
    return f"""
WITH s AS (
  SELECT event_id, user_id, {day} AS day_idx FROM events
)
SELECT event_id, user_id, day_idx,
       ({spread("user_id", 0)}) + ({spread("day_idx", 1)}) AS zkey
FROM s
"""


# -------------------------------------------------------------------- q104

def q104_cube_rollup(sf_dir: str):
    """GROUP BY CUBE(event_type, iso_dow): all four grouping sets computed
    from ONE shared finest-grain partial — the (type, dow) cells are tiny
    (|types|×7), so the three coarser sets are driver-side re-aggregations
    of the same partial, never a second scan or exchange. 'ALL' is the
    grouping sentinel on both sides."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "event_type": df.event_type,
                    "dow": (df.ts.dt.dayofweek + 1).astype("int64").astype(str),
                    "cents": _cents(df.value),
                }
            )
            .groupby(["event_type", "dow"], as_index=False)
            .agg(p_n=("cents", "size"), p_c=("cents", "sum"))
        )

    def combine(partials: pd.DataFrame) -> pd.DataFrame:
        fine = partials.groupby(["event_type", "dow"], as_index=False).agg(
            n_events=("p_n", "sum"), cents=("p_c", "sum")
        )
        sets = [fine]
        g = fine.groupby("event_type", as_index=False)[["n_events", "cents"]].sum()
        g["dow"] = "ALL"
        sets.append(g)
        g = fine.groupby("dow", as_index=False)[["n_events", "cents"]].sum()
        g["event_type"] = "ALL"
        sets.append(g)
        sets.append(
            pd.DataFrame(
                {
                    "event_type": ["ALL"],
                    "dow": ["ALL"],
                    "n_events": [fine.n_events.sum()],
                    "cents": [fine.cents.sum()],
                }
            )
        )
        out = pd.concat(sets, ignore_index=True)[
            ["event_type", "dow", "n_events", "cents"]
        ]
        out["n_events"] = out.n_events.astype("int64")
        out["cents"] = out.cents.astype("int64")
        return out

    return driver_combine(ds, partial, combine)


_Q104_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(strftime(ts, '%u'), 'ALL') AS dow,
       COUNT(*)::BIGINT AS n_events,
       SUM(CAST(round(value * 100) AS BIGINT))::BIGINT AS cents
FROM events
GROUP BY CUBE (event_type, strftime(ts, '%u'))
"""


# -------------------------------------------------------------------- q105

def q105_debounce_events(sf_dir: str):
    """Telemetry de-bounce: drop an event when the SAME (user, type) fired
    within the last 5 minutes (gap measured against the previous RAW event —
    the LAG contract, exactly SQL-mirrorable; chain-vs-kept debounce is the
    iterative variant this op deliberately isn't). One (user)-keyed bucketed
    exchange; per-bucket vectorized sort + grouped shift."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    GAP = np.timedelta64(300_000_000, "us")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"], kind="mergesort")
        same = df.user_id.eq(df.user_id.shift()) & df.event_type.eq(df.event_type.shift())
        gap = df.ts - df.ts.shift()
        keep = ~(same & (gap <= GAP))
        out = df[keep]
        return pd.DataFrame(
            {
                "event_id": out.event_id.astype("int64"),
                "user_id": out.user_id.astype("int64"),
                "event_type": out.event_type,
                "ts": out.ts,
            }
        )

    return bucketed_combine(ds, "user_id", combine)


_Q105_SQL = """
SELECT event_id, user_id, event_type, ts
FROM events
QUALIFY lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) IS NULL
     OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id, event_type
                                              ORDER BY ts, event_id)) > 300000000
"""


# -------------------------------------------------------------------- q106

def q106_mixture_sample(sf_dir: str):
    """Training-data mixture sampling to a per-source token budget — the
    data-mixture op an LLM corpus build runs last: each source s gets a
    target share (20 + 5·(idx(s) mod 8))% of its own tokens, and docs are
    selected DETERMINISTICALLY until the budget fills.

    The scalable selection rule is hash-BIN-granular (no per-doc sequential
    cumsum anywhere): docs hash into 64 Knuth bins; a bounded partial+driver
    pass builds the (source, bin) token histogram (20×64 rows); bins are
    admitted in bin order while the inclusive cumulative token count stays
    within budget; the admitted set broadcasts into one stateless filter
    pass. Budget granularity is one bin (~1/64 of a source) — documented,
    and exactly mirrored by the SQL window cumsum."""
    import ray as _ray

    from medical_ocr_service_ray.stages.sampling import KNUTH

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    N_BINS = 64

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        nt = np.fromiter(
            (len(t.split()) if t else 0 for t in df.text), dtype=np.int64, count=len(df)
        )
        h = (df.doc_id.to_numpy().astype("uint64") * np.uint64(KNUTH)) % np.uint64(1 << 32)
        return pd.DataFrame(
            {
                "doc_id": df.doc_id.astype("int64"),
                "source": df.source,
                "n_tokens": nt,
                "bin": (h % N_BINS).astype("int64"),
            }
        )

    stamped = ds.map_batches(stamp, batch_format="pandas")

    hist = driver_combine(
        stamped,
        lambda df: df.groupby(["source", "bin"], as_index=False)["n_tokens"].sum(),
        lambda df: df.groupby(["source", "bin"], as_index=False)["n_tokens"].sum(),
    ).sort_values(["source", "bin"])

    tot = hist.groupby("source")["n_tokens"].sum()
    hist["cum"] = hist.groupby("source")["n_tokens"].cumsum()
    idx = hist.source.str.slice(3).astype(int)
    frac = 20 + 5 * (idx % 8)
    inc = hist[hist.cum * 100 <= frac.to_numpy() * hist.source.map(tot).to_numpy()]
    inc_set = set(zip(inc.source, inc["bin"]))
    inc_ref = _ray.put(inc_set)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        s = _ray.get(inc_ref)
        mask = [(src, b) in s for src, b in zip(df.source, df["bin"])]
        out = df[np.asarray(mask, dtype=bool)]
        return out[["doc_id", "source", "n_tokens"]]

    return stamped.map_batches(pick, batch_format="pandas")


_Q106_SQL = r"""
WITH d AS (
  SELECT doc_id, source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS n_tokens,
         ((doc_id * 2654435761) % 4294967296) % 64 AS bin
  FROM documents
), bins AS (
  SELECT source, bin, SUM(n_tokens) AS bt FROM d GROUP BY 1, 2
), cum AS (
  SELECT source, bin, SUM(bt) OVER (PARTITION BY source ORDER BY bin) AS cbt FROM bins
), tot AS (
  SELECT source, SUM(n_tokens) AS tt FROM d GROUP BY 1
), inc AS (
  SELECT c.source, c.bin
  FROM cum c JOIN tot t USING (source)
  WHERE c.cbt * 100 <= (20 + 5 * (CAST(substr(c.source, 4) AS INT) % 8)) * t.tt
)
SELECT d.doc_id, d.source, d.n_tokens
FROM d JOIN inc USING (source, bin)
"""


# -------------------------------------------------------------------- q107

def q107_repetition_gate(sf_dir: str):
    """Gopher-style repetition quality rule: per document, the fraction of
    word-BIGRAM occurrences that belong to a repeated bigram; documents
    above the 20% threshold are flagged for removal. Stateless per-batch
    map (the tokenizer is the q9 whitespace recipe, shared with SQL);
    exact integer comparison dup·10 ≤ 2·total — no float thresholds.
    Documents with fewer than one bigram are out of scope on both sides."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        ids, nb, dup = [], [], []
        for did, t in zip(df.doc_id, df.text):
            toks = (t or "").split()
            if len(toks) < 2:
                continue
            c = Counter(zip(toks, toks[1:]))
            ids.append(did)
            nb.append(sum(c.values()))
            dup.append(sum(v for v in c.values() if v > 1))
        n = np.asarray(nb, dtype=np.int64)
        d = np.asarray(dup, dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "n_bigrams": n,
                "dup_bigrams": d,
                "keep": (d * 10 <= 2 * n).astype("int64"),
            }
        )

    return ds.map_batches(gate, batch_format="pandas")


_Q107_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS arr
  FROM documents WHERE trim(text) <> ''
), big AS (
  SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS bg
  FROM toks, LATERAL unnest(range(1, len(arr))) AS t(i)
), cnt AS (
  SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2
)
SELECT doc_id,
       SUM(c)::BIGINT AS n_bigrams,
       SUM(CASE WHEN c > 1 THEN c ELSE 0 END)::BIGINT AS dup_bigrams,
       (CASE WHEN SUM(CASE WHEN c > 1 THEN c ELSE 0 END) * 10 <= 2 * SUM(c)
             THEN 1 ELSE 0 END)::BIGINT AS keep
FROM cnt GROUP BY 1
"""


# -------------------------------------------------------------------- q108

def q108_point_lookup(sf_dir: str):
    """Primary-key point lookups over a hash-bucketed SORTED layout — the
    serving-path read that a 100-TB table answers in O(log rows/bucket) per
    key with zero scan: (1) one streaming pass writes orders into 64
    hash(o_orderkey)-bucketed files, each internally sorted by o_orderkey
    (the layout the headline extraction already uses); (2) the lookup
    routes each probe key to its ONE bucket file, binary-searches the
    sorted key column, and reads nothing else — TestPointLookup pins that
    at most len(keys) distinct files are opened of the 64. Probe keys are
    arithmetic (97·k, k=1..10) so the SQL oracle is a plain IN-list; keys
    absent from the table are simply not returned (both sides)."""
    import shutil

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    N_BUCKETS = 64
    out_dir = Path("/tmp/mosr_q108_kv") / Path(sf_dir).name
    shutil.rmtree(out_dir, ignore_errors=True)
    out_dir.mkdir(parents=True, exist_ok=True)

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cents"] = _cents(df.o_totalprice)
        df["__bucket"] = (df.o_orderkey % N_BUCKETS).astype("int64")
        return df.drop(columns="o_totalprice")

    def sort_and_write(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df.__bucket.iloc[0])
        df = df.drop(columns="__bucket").sort_values("o_orderkey", kind="mergesort")
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            out_dir / f"bucket-{b:04d}.parquet",
        )
        return pd.DataFrame({"b": [b], "n": [len(df)]})

    (
        ds.map_batches(stamp, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(sort_and_write, batch_format="pandas")
        .materialize()  # drive the layout write
    )

    keys = [97 * k for k in range(1, 11)]
    by_bucket: dict[int, list[int]] = {}
    for k in keys:
        by_bucket.setdefault(k % N_BUCKETS, []).append(k)

    rows = []
    for b, ks in sorted(by_bucket.items()):
        path = out_dir / f"bucket-{b:04d}.parquet"
        if not path.exists():
            continue
        t = pq.read_table(path)  # ONE file per probed bucket; 63 others untouched
        col = t.column("o_orderkey").to_numpy()
        for k in sorted(ks):
            i = int(np.searchsorted(col, k))
            if i < len(col) and col[i] == k:
                rows.append(
                    {
                        "o_orderkey": int(k),
                        "o_custkey": int(t.column("o_custkey")[i].as_py()),
                        "cents": int(t.column("cents")[i].as_py()),
                    }
                )
    out = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey", "cents"])
    return out.astype({"o_orderkey": "int64", "o_custkey": "int64", "cents": "int64"})


_Q108_SQL = """
SELECT o_orderkey, o_custkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS cents
FROM orders
WHERE o_orderkey IN (97, 194, 291, 388, 485, 582, 679, 776, 873, 970)
"""


# -------------------------------------------------------------------- q109

def q109_phrase_search(sf_dir: str):
    """Positional phrase search — the retrieval op a bag-of-words index
    (q41) cannot answer: find documents containing the exact phrase
    "table value" and count its occurrences plus the first match position.
    Positions come from the q9 whitespace tokenizer (1-based), and a
    document never spans batches, so the whole op is ONE stateless
    map_batches pass: only the two phrase terms' positions are ever
    materialized (never a full positional index), adjacency is a sorted
    intersection (searchsorted of pos+1 into the second term's positions).
    Zero exchanges, output bounded by matching docs."""
    T1, T2 = "table", "value"
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def find(df: pd.DataFrame) -> pd.DataFrame:
        ids, cnts, firsts = [], [], []
        for did, t in zip(df.doc_id, df.text):
            toks = (t or "").split()
            p1 = [i + 1 for i, w in enumerate(toks) if w == T1]
            if not p1:
                continue
            p2 = {i + 1 for i, w in enumerate(toks) if w == T2}
            hits = [p for p in p1 if p + 1 in p2]
            if hits:
                ids.append(did)
                cnts.append(len(hits))
                firsts.append(hits[0])
        return pd.DataFrame(
            {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "n_matches": np.asarray(cnts, dtype=np.int64),
                "first_pos": np.asarray(firsts, dtype=np.int64),
            }
        )

    return ds.map_batches(find, batch_format="pandas")


_Q109_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS arr
  FROM documents WHERE trim(text) <> ''
), pos AS (
  SELECT doc_id, i AS p, arr[i] AS w
  FROM toks, LATERAL unnest(range(1, len(arr) + 1)) AS t(i)
), hits AS (
  SELECT a.doc_id, a.p
  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
  WHERE a.w = 'table' AND b.w = 'value'
)
SELECT doc_id, COUNT(*)::BIGINT AS n_matches, MIN(p)::BIGINT AS first_pos
FROM hits GROUP BY 1
"""


# -------------------------------------------------------------------- q110

def q110_forward_fill(sf_dir: str):
    """Per-user LOCF (last-observation-carried-forward) imputation — the
    standard feature-engineering gap fill: a reading is 'present' iff
    event_id % 4 != 0 (the q97-style deterministic missingness), and every
    missing row takes the latest prior present value (in (ts, event_id)
    order), -1 until one exists. One user-keyed exchange; the fill is a
    vectorized grouped cummax-index gather (np.maximum.accumulate over
    present-row indices), no per-row loop."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = _cents(df.value).to_numpy()
        present = (df.event_id.to_numpy() % 4) != 0
        n = len(df)
        idx = np.where(present, np.arange(n), -1)
        filled_idx = np.maximum.accumulate(idx)
        # reset carries at user boundaries: a carry from a previous user is
        # any filled index before this user's first row
        uid = df.user_id.to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        ustart = np.maximum.accumulate(np.where(new_user, np.arange(n), -1))
        valid = filled_idx >= ustart
        out = np.where(valid & (filled_idx >= 0), cents[np.maximum(filled_idx, 0)], -1)
        return pd.DataFrame(
            {
                "event_id": df.event_id.astype("int64"),
                "user_id": df.user_id.astype("int64"),
                "filled_cents": out.astype("int64"),
                "was_present": present.astype("int64"),
            }
        )

    return bucketed_combine(ds, "user_id", combine)


_Q110_SQL = """
SELECT event_id, user_id,
       COALESCE(
         last_value(CASE WHEN event_id % 4 <> 0
                         THEN CAST(round(value * 100) AS BIGINT) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         -1) AS filled_cents,
       (CASE WHEN event_id % 4 <> 0 THEN 1 ELSE 0 END)::BIGINT AS was_present
FROM events
"""


# -------------------------------------------------------------------- q111

def q111_grouped_correlation(sf_dir: str):
    """Exact grouped Pearson correlation between spend (cents) and
    hour-of-day, per event_type — reported as the INTEGER sufficient
    statistics (n, num = n·Σxy − Σx·Σy, den_x = n·Σx² − (Σx)²,
    den_y likewise), the q93-OLS idiom: the ratio num/sqrt(den_x·den_y)
    is the correlation, but the integers are what hash-compare exactly.
    One bounded partial+driver combine (cardinality = |event types|);
    int64 throughout (overflow margin to ~1e9 rows/group at these value
    scales — beyond that, widen to the q96 HUGEINT split)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = _cents(df.value).to_numpy()
        y = df.ts.dt.hour.to_numpy().astype("int64")
        return (
            pd.DataFrame(
                {"event_type": df.event_type, "x": x, "y": y,
                 "xy": x * y, "x2": x * x, "y2": y * y}
            )
            .groupby("event_type", as_index=False)
            .agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
                 sxy=("xy", "sum"), sx2=("x2", "sum"), sy2=("y2", "sum"))
        )

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("event_type", as_index=False).sum()
        n = g.n.to_numpy().astype("int64")
        sx, sy = g.sx.to_numpy(), g.sy.to_numpy()
        out = pd.DataFrame(
            {
                "event_type": g.event_type,
                "n": n,
                "corr_num": n * g.sxy.to_numpy() - sx * sy,
                "den_x": n * g.sx2.to_numpy() - sx * sx,
                "den_y": n * g.sy2.to_numpy() - sy * sy,
            }
        )
        for c in ("corr_num", "den_x", "den_y"):
            out[c] = out[c].astype("int64")
        return out

    return driver_combine(ds, partial, combine)


_Q111_SQL = """
WITH d AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS x,
         CAST(hour(ts) AS BIGINT) AS y
  FROM events
)
SELECT event_type,
       COUNT(*)::BIGINT AS n,
       (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))::BIGINT AS corr_num,
       (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))::BIGINT AS den_x,
       (COUNT(*) * SUM(y * y) - SUM(y) * SUM(y))::BIGINT AS den_y
FROM d GROUP BY 1
"""


# -------------------------------------------------------------------- q112

def q112_association_rules(sf_dir: str):
    """Market-basket association rules: the top-20 co-purchase pairs by
    order co-occurrence, carrying the exact INTEGER support counts
    (cnt = orders with both, cnt_a/cnt_b = orders with each item,
    n_orders = basket universe) from which support/confidence/lift are
    ratios — integers hash-compare exactly, floats wouldn't.

    Plan (r4 fusion — ONE scan, TWO exchanges; was 3 scans / 4 exchanges):
    the order-bucketed task already holds the bucket's complete DISTINCT
    (order, part) relation, so it emits THREE tagged partial kinds in one
    pass — pair counts (q71's sum(basket²) bound, mega-baskets capped),
    per-item order-count partials (part_b = -1), and the bucket's distinct
    order count (part_b = -2) — all riding the SAME part_a-keyed second
    combine (a plain group-sum works uniformly for every kind). The driver
    receives per-batch top-20 pair candidates + the item-dimension counts
    (broadcast class) + one n_orders row; never a table join for 20 rows."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs_distinct(df: pd.DataFrame) -> pd.DataFrame:
        po = df.drop_duplicates(["l_orderkey", "l_partkey"])
        item = po.groupby("l_partkey", as_index=False).size()
        items = pd.DataFrame(
            {
                "part_a": item.l_partkey.astype("int64"),
                "part_b": np.int64(-1),
                "cnt": item["size"].astype("int64"),
            }
        )
        nord = pd.DataFrame(
            {
                "part_a": [np.int64(-2)],
                "part_b": [np.int64(-2)],
                "cnt": [np.int64(po.l_orderkey.nunique())],
            }
        )
        # the cap applies to PAIR MINING only (SQL: pc/n CTEs are uncapped)
        pom = _drop_mega_baskets(po, "q112")
        m = pom.merge(pom, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        g = (
            m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False)
            .size()
            .rename(
                columns={"l_partkey_x": "part_a", "l_partkey_y": "part_b", "size": "cnt"}
            )
            .astype({"part_a": "int64", "part_b": "int64", "cnt": "int64"})
        )
        return pd.concat([g, items, nord], ignore_index=True)

    combined = bucketed_combine(
        bucketed_combine(ds, "l_orderkey", pairs_distinct, num_buckets=32),
        "part_a",
        lambda df: df.groupby(["part_a", "part_b"], as_index=False)["cnt"].sum(),
        num_buckets=16,
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["cnt", "part_a", "part_b"], ascending=[False, True, True]).head(20)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df[df.part_b >= 0]
        return pd.concat([topk(pairs), df[df.part_b < 0]], ignore_index=True)

    cand = combined.map_batches(keep, batch_format="pandas").to_pandas()
    top = topk(cand[cand.part_b >= 0]).reset_index(drop=True)
    cnts = cand[cand.part_b == -1].set_index("part_a")["cnt"]
    n_orders = int(cand[cand.part_b == -2].cnt.sum())
    top["cnt_a"] = top.part_a.map(cnts).astype("int64")
    top["cnt_b"] = top.part_b.map(cnts).astype("int64")
    top["n_orders"] = np.int64(n_orders)
    top["cnt"] = top.cnt.astype("int64")
    return top[["part_a", "part_b", "cnt", "cnt_a", "cnt_b", "n_orders"]]


_Q112_SQL = """
WITH po AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), ok AS (
  SELECT l_orderkey FROM po GROUP BY 1 HAVING COUNT(*) <= 1000
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*)::BIGINT AS cnt
  FROM po a JOIN po b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_orderkey IN (SELECT l_orderkey FROM ok)
  GROUP BY 1, 2
), pc AS (
  SELECT l_partkey, COUNT(*)::BIGINT AS c FROM po GROUP BY 1
), n AS (
  SELECT COUNT(DISTINCT l_orderkey)::BIGINT AS n_orders FROM lineitem
)
SELECT p.part_a, p.part_b, p.cnt, x.c AS cnt_a, y.c AS cnt_b, n.n_orders
FROM pairs p JOIN pc x ON x.l_partkey = p.part_a
             JOIN pc y ON y.l_partkey = p.part_b, n
ORDER BY p.cnt DESC, p.part_a, p.part_b
LIMIT 20
"""


# -------------------------------------------------------------------- q173

_Q173_RELATIONS = [
    ("events", "user_id"),
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
]


def q173_key_skew_profile(sf_dir: str):
    """Hot-key / skew diagnostics over the engine's own shuffle keys — the
    profiling pass a distributed engine runs BEFORE choosing a join or
    groupby plan (this repo's salted join, stages/skewjoin.py, and the
    bucketed combines all assume a skew model; q173 measures it). The
    reference sizes its retry/queue behavior from per-batch status
    roll-ups (src/services/job-queue.service.js:88-117) — same idea, key
    mass instead of job states. Per profiled (table, key): distinct-key
    count, total rows, the top-1 and top-10 key masses, and their
    ppm shares (integer floor, so the DuckDB mirror hash-matches; tied
    counts make the top-10 SUM order-insensitive). Plan per relation: one
    key-keyed exchange for exact counts, then a per-block (nd, tot,
    top-10 partial) row — the driver merges <= 10 x blocks candidate
    counts; nothing key-shaped ever reaches the driver."""
    rows = []
    for table, key in _Q173_RELATIONS:
        ds = _read(sf_dir, table, [key])

        def kp(df: pd.DataFrame, key=key) -> pd.DataFrame:
            vc = df[key].value_counts()
            return pd.DataFrame(
                {"k": vc.index.to_numpy(), "c": vc.to_numpy().astype("int64")}
            )

        counts = partial_then_combine(
            ds, kp, "k", lambda df: df.groupby("k", as_index=False)["c"].sum()
        )
        parts = counts.map_batches(
            lambda df: pd.DataFrame(
                {
                    "nd": [len(df)],
                    "tot": [int(df.c.sum())],
                    "top": [np.sort(df.c.to_numpy())[-10:].astype("int64").tobytes()],
                }
            ),
            batch_format="pandas",
        ).to_pandas()
        cand = np.sort(
            np.concatenate(
                [np.frombuffer(b, dtype=np.int64) for b in parts.top]
            )
        )
        top10 = cand[-10:]
        nd, tot = int(parts.nd.sum()), int(parts.tot.sum())
        top1 = int(top10[-1]) if len(top10) else 0
        t10 = int(top10.sum())
        rows.append(
            (
                f"{table}.{key}",
                nd,
                tot,
                top1,
                t10,
                top1 * 1_000_000 // tot if tot else 0,
                t10 * 1_000_000 // tot if tot else 0,
            )
        )
    out = pd.DataFrame(
        rows,
        columns=[
            "relation", "n_keys", "total_rows", "top1_count",
            "top10_count", "top1_ppm", "top10_ppm",
        ],
    )
    out["relation"] = out.relation.astype(object)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def _q173_sql() -> str:
    # One grouped-counts CTE per relation; top-10 mass via ORDER BY c DESC
    # LIMIT 10 (ties at the cut carry equal c, so the SUM is well-defined);
    # ppm shares use // on nonnegative ints = floor on both engines.
    legs = []
    for table, key in _Q173_RELATIONS:
        cte = f"g_{table}"
        legs.append(
            f"""
SELECT '{table}.{key}' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(c) AS BIGINT) AS total_rows,
       CAST(MAX(c) AS BIGINT) AS top1_count,
       CAST((SELECT SUM(c) FROM (SELECT c FROM {cte} ORDER BY c DESC LIMIT 10))
            AS BIGINT) AS top10_count,
       CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS top1_ppm,
       CAST((SELECT SUM(c) FROM (SELECT c FROM {cte} ORDER BY c DESC LIMIT 10))
            * 1000000 // SUM(c) AS BIGINT) AS top10_ppm
FROM {cte}"""
        )
    ctes = ",\n".join(
        f"g_{table} AS (SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS c"
        f" FROM {table} GROUP BY {key})"
        for table, key in _Q173_RELATIONS
    )
    body = "\nUNION ALL\n".join(legs)
    return f"WITH {ctes}\n{body}\nORDER BY relation"


# -------------------------------------------------------------------- q177

_Q177_KS = (2, 5, 10)


def q177_k_anonymity_audit(sf_dir: str):
    """k-anonymity audit over a quasi-identifier tuple — the data-
    governance gate a training-data pipeline runs before release (q60
    redacts direct PII; this measures REIDENTIFICATION risk from indirect
    attributes): a QI group smaller than k means those rows are
    k-distinguishable. QI = (event_type, day, value decabucket); for each
    k in (2, 5, 10) emit how many QI groups violate k-anonymity and how
    many rows sit in them. Plan: ONE QI-keyed exchange for exact group
    sizes, then per-block threshold partials (3 rows each) and a tiny
    driver merge — group-count-shaped data never leaves the cluster.
    value buckets ride the repo's cents convention (np.rint == SQL round
    on this data, _qcommon._cents); cents are nonnegative here so // is
    floor on both engines."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def qi_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "event_type": df.event_type,
                "day": df.ts.dt.floor("D"),
                "vb": _cents(df.value.astype("float64")) // 1000,
            }
        )
        out = g.groupby(["event_type", "day", "vb"], as_index=False).size()
        return out.rename(columns={"size": "c"})

    sizes = partial_then_combine(
        ds,
        qi_partial,
        "day",  # day has the widest spread of the QI columns -> even buckets
        lambda df: df.groupby(["event_type", "day", "vb"], as_index=False)["c"].sum(),
    )

    def thresh_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df.c.to_numpy()
        rows = [
            (k, int((c < k).sum()), int(c[c < k].sum())) for k in _Q177_KS
        ]
        return pd.DataFrame(
            rows, columns=["k_threshold", "violating_groups", "violating_rows"]
        )

    out = (
        sizes.map_batches(thresh_partial, batch_format="pandas")
        .to_pandas()
        .groupby("k_threshold", as_index=False)
        .sum()
        .sort_values("k_threshold")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q177_sql() -> str:
    ks = ", ".join(f"({k})" for k in _Q177_KS)
    return f"""
WITH g AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(round(value * 100) AS BIGINT) // 1000 AS vb,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
)
SELECT CAST(k.k AS BIGINT) AS k_threshold,
       CAST(SUM(CASE WHEN c < k.k THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_groups,
       CAST(SUM(CASE WHEN c < k.k THEN c ELSE 0 END) AS BIGINT)
         AS violating_rows
FROM g, (VALUES {ks}) k(k)
GROUP BY k.k ORDER BY k.k
"""


# -------------------------------------------------------------------- q179

_Q179_EVENT_DOMAIN = ("click", "error", "purchase", "signup", "view")


def q179_expectations_suite(sf_dir: str):
    """Declarative data-quality expectations (the Great-Expectations /
    dbt-tests pattern): a battery of table-level contracts evaluated in
    ONE streaming scan per table, each emitting (check, n_checked,
    n_failed, ok). The reference validates every AI result against a Joi
    contract before persisting (src/services/validation.service.js:14-17
    stripUnknown + defaults); this is the same gate applied to the LAKE
    instead of one payload. Checks: domain membership, non-negativity,
    null/empty rates, range bounds — all per-batch counter partials summed
    on the driver (bytes per block) — plus ONE key-uniqueness check
    (orders.o_orderkey), the only expectation that needs an exchange
    (exact distinct via key-bucketed combine, q34's machinery)."""
    def check_partials(table, cols, fns):
        def part(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                [(name, len(df), int(fail(df))) for name, fail in fns],
                columns=["check_name", "n_checked", "n_failed"],
            )

        return _read(sf_dir, table, cols).map_batches(
            part, batch_format="pandas", batch_size=65536
        )

    legs = []
    legs.append(check_partials(
        "events",
        ["event_type", "ts", "value"],
        [
            ("events.event_type_in_domain",
             lambda df: (~df.event_type.isin(_Q179_EVENT_DOMAIN)).sum()),
            ("events.ts_not_null", lambda df: df.ts.isna().sum()),
            ("events.value_nonneg",
             lambda df: (~(df.value >= 0)).sum()),  # NaN counts as failed
        ],
    ))
    legs.append(check_partials(
        "orders",
        ["o_totalprice"],
        [("orders.o_totalprice_positive",
          lambda df: (~(df.o_totalprice > 0)).sum())],
    ))
    legs.append(check_partials(
        "lineitem",
        ["l_quantity"],
        [("lineitem.l_quantity_in_1_50",
          lambda df: (~df.l_quantity.between(1, 50)).sum())],
    ))
    legs.append(check_partials(
        "documents",
        ["text"],
        [("documents.text_nonempty",
          lambda df: (df.text.isna() | (df.text == "")).sum())],
    ))

    # ALL four tables' counter partials ride ONE union'd execution (one
    # Ray job, zero exchanges) instead of four serial to_pandas passes
    u = legs[0]
    for leg in legs[1:]:
        u = u.union(leg)
    agg = u.to_pandas().groupby("check_name", as_index=False).sum()
    rows = list(agg.itertuples(index=False, name=None))

    # uniqueness: the one expectation that needs an exchange — exact
    # distinct via key-bucketed combine; the total-row side reuses the
    # o_totalprice check's n_checked (same table, same full scan)
    dparts = partial_then_combine(
        _read(sf_dir, "orders", ["o_orderkey"]),
        lambda df: df[["o_orderkey"]].drop_duplicates(),
        "o_orderkey",
        lambda df: pd.DataFrame({"nd": [df.o_orderkey.nunique()]}),
    ).to_pandas()
    n = int(
        agg.loc[agg.check_name == "orders.o_totalprice_positive", "n_checked"]
        .iloc[0]
    )
    nd = int(dparts.nd.sum())
    rows.append(("orders.o_orderkey_unique", n, n - nd))

    out = pd.DataFrame(rows, columns=["check_name", "n_checked", "n_failed"])
    out = out.sort_values("check_name").reset_index(drop=True)
    out["check_name"] = out.check_name.astype(object)
    out["n_checked"] = out.n_checked.astype("int64")
    out["n_failed"] = out.n_failed.astype("int64")
    out["ok"] = out.n_failed == 0
    return out


def _q179_sql() -> str:
    domain = ", ".join(f"'{e}'" for e in _Q179_EVENT_DOMAIN)
    return f"""
WITH u AS (
SELECT 'documents.text_nonempty' AS check_name,
       CAST(COUNT(*) AS BIGINT) AS n_checked,
       CAST(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_failed
FROM documents
UNION ALL
SELECT 'events.event_type_in_domain', COUNT(*),
       SUM(CASE WHEN event_type NOT IN ({domain})
                  OR event_type IS NULL THEN 1 ELSE 0 END)
FROM events
UNION ALL
SELECT 'events.ts_not_null', COUNT(*),
       SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) FROM events
UNION ALL
SELECT 'events.value_nonneg', COUNT(*),
       SUM(CASE WHEN value >= 0 THEN 0 ELSE 1 END) FROM events
UNION ALL
SELECT 'lineitem.l_quantity_in_1_50', COUNT(*),
       SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)
FROM lineitem
UNION ALL
SELECT 'orders.o_orderkey_unique', COUNT(*),
       COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders
UNION ALL
SELECT 'orders.o_totalprice_positive', COUNT(*),
       SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) FROM orders
)
SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_failed AS BIGINT) AS n_failed, n_failed = 0 AS ok
FROM u
ORDER BY check_name
"""


# -------------------------------------------------------------------- q194

_Q194_LS = (2, 3, 5)


def q194_l_diversity_audit(sf_dir: str):
    """l-diversity audit — k-anonymity's (q177) stronger sibling
    (Machanavajjhala et al. 2007): a QI group can be large (k-anonymous)
    yet still leak if every row shares the SAME sensitive value; a group
    is l-diverse iff its sensitive attribute takes >= l distinct values.
    QI = q177's (event_type, day, value decabucket); sensitive =
    user_id. For each l in (2, 3, 5): violating groups + rows in them.
    Plan: per-batch (QI, user) pre-counts, ONE day-keyed exchange (the
    QI includes day, so whole groups co-locate and distinct-user counts
    finish in-exchange), then 3-row threshold partials to a driver
    merge. Output: (l_threshold, violating_groups, violating_rows)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value", "user_id"])

    def qi_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "event_type": df.event_type,
                "day": df.ts.dt.floor("D"),
                "vb": _cents(df.value.astype("float64")) // 1000,
                "user_id": df.user_id,
            }
        )
        out = g.groupby(
            ["event_type", "day", "vb", "user_id"], as_index=False
        ).size()
        return out.rename(columns={"size": "c"})

    def qi_combine(df: pd.DataFrame) -> pd.DataFrame:
        per_user = df.groupby(
            ["event_type", "day", "vb", "user_id"], as_index=False
        )["c"].sum()
        return per_user.groupby(
            ["event_type", "day", "vb"], as_index=False
        ).agg(n_rows=("c", "sum"), du=("user_id", "nunique"))

    sizes = partial_then_combine(ds, qi_partial, "day", qi_combine)

    def thresh_partial(df: pd.DataFrame) -> pd.DataFrame:
        du = df.du.to_numpy()
        c = df.n_rows.to_numpy()
        rows = [
            (l, int((du < l).sum()), int(c[du < l].sum()))
            for l in _Q194_LS
        ]
        return pd.DataFrame(
            rows,
            columns=["l_threshold", "violating_groups", "violating_rows"],
        )

    out = (
        sizes.map_batches(thresh_partial, batch_format="pandas")
        .to_pandas()
        .groupby("l_threshold", as_index=False)
        .sum()
        .sort_values("l_threshold")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q194_sql() -> str:
    ls = ", ".join(f"({l})" for l in _Q194_LS)
    return f"""
WITH g AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(round(value * 100) AS BIGINT) // 1000 AS vb, user_id
  FROM events
), gg AS (
  SELECT event_type, day, vb,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS du
  FROM g GROUP BY 1, 2, 3
)
SELECT CAST(l.l AS BIGINT) AS l_threshold,
       CAST(SUM(CASE WHEN du < l.l THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_groups,
       CAST(SUM(CASE WHEN du < l.l THEN n_rows ELSE 0 END) AS BIGINT)
         AS violating_rows
FROM gg, (VALUES {ls}) l(l)
GROUP BY l.l ORDER BY l.l
"""


# -------------------------------------------------------------------- q195

_Q195_TS_PPM = (5_000, 15_000, 40_000)
_Q195_VB_DIV = 2000  # cents // 2000 = 20-currency-unit ordered buckets


def q195_t_closeness_audit(sf_dir: str):
    """t-closeness audit — the third rung of the release-gate privacy
    ladder (k-anonymity q177, l-diversity q194; Li et al. 2007): a QI
    group can be large AND diverse yet still leak if its sensitive-value
    DISTRIBUTION differs sharply from the global one (skewness attack).
    A group is t-close iff EMD(group dist, global dist) <= t. QI =
    (event_type, day); sensitive = the ORDERED value bucket (cents //
    2000), so the distance is the ordered-domain EMD = sum of
    |cumulative share diffs| / (m-1), computed exactly in integers by
    cross-multiplying counts over the common denominator n_g * N
    (q161's trick, lifted per-group). Plan: ONE day-keyed exchange for
    exact (QI, vb) cells (the QI includes day, so groups co-locate),
    then a driver pull BOUNDED by QI-groups x sensitive domain —
    event_types x calendar days x value buckets, calendar-bounded at
    any corpus size (q161's "(bin x period) cells" precedent). Final
    division runs in Python bigints (numerator 1e6 * sum|cd| exceeds
    int64 past ~sf1; the SQL twin uses HUGEINT). For each t in
    (5k, 15k, 40k) ppm (sized to the corpus: group EMDs shrink ~1/sqrt(n_g)
    as groups grow, so the ladder brackets the observed range at every sf): groups with emd_ppm > t + rows in them."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "event_type": df.event_type,
                "day": df.ts.dt.floor("D"),
                "vb": _cents(df.value.astype("float64")) // _Q195_VB_DIV,
            }
        )
        out = g.groupby(["event_type", "day", "vb"], as_index=False).size()
        return out.rename(columns={"size": "c"})

    cells = partial_then_combine(
        ds,
        cell_partial,
        "day",
        lambda df: df.groupby(["event_type", "day", "vb"], as_index=False)["c"].sum(),
    ).to_pandas()

    dom = np.sort(cells.vb.unique())
    m = int(dom.size)
    glob = cells.groupby("vb")["c"].sum()
    C = glob.reindex(dom).to_numpy(dtype="int64")
    N = int(C.sum())

    # dense (group x domain) grid: cumulative cross-multiplied diffs
    piv = (
        cells.pivot_table(
            index=["event_type", "day"], columns="vb", values="c",
            aggfunc="sum", fill_value=0,
        )
        .reindex(columns=dom, fill_value=0)
    )
    cnt = piv.to_numpy(dtype="int64")
    ng = cnt.sum(axis=1)
    cd = np.cumsum(cnt * N - C[None, :] * ng[:, None], axis=1)
    tot = np.abs(cd).sum(axis=1)
    if m > 1:
        emd = np.array(
            [
                (1_000_000 * int(t)) // (int(g) * N * (m - 1))
                for t, g in zip(tot, ng)
            ],
            dtype="int64",
        )
    else:
        emd = np.zeros(len(ng), dtype="int64")

    rows = [
        (t, int((emd > t).sum()), int(ng[emd > t].sum()))
        for t in _Q195_TS_PPM
    ]
    return pd.DataFrame(
        rows,
        columns=["t_threshold_ppm", "violating_groups", "violating_rows"],
    ).astype("int64")


def _q195_sql() -> str:
    ts = ", ".join(f"({t})" for t in _Q195_TS_PPM)
    return f"""
WITH g AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(round(value * 100) AS BIGINT) // {_Q195_VB_DIV} AS vb,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
), gl AS (
  SELECT vb, CAST(SUM(c) AS HUGEINT) AS cg FROM g GROUP BY vb
), tot AS (
  SELECT CAST(SUM(cg) AS HUGEINT) AS nn, CAST(COUNT(*) AS HUGEINT) AS m
  FROM gl
), qi AS (
  SELECT event_type, day, CAST(SUM(c) AS HUGEINT) AS ng
  FROM g GROUP BY 1, 2
), grid AS (
  SELECT qi.event_type, qi.day, qi.ng, gl.vb, gl.cg,
         CAST(COALESCE(g.c, 0) AS HUGEINT) AS cgj
  FROM qi CROSS JOIN gl
  LEFT JOIN g ON g.event_type = qi.event_type AND g.day = qi.day
             AND g.vb = gl.vb
), cum AS (
  SELECT event_type, day, ng,
         SUM(cgj * (SELECT nn FROM tot) - cg * ng)
           OVER (PARTITION BY event_type, day ORDER BY vb
                 ROWS UNBOUNDED PRECEDING) AS cd
  FROM grid
), emd AS (
  SELECT event_type, day, MAX(ng) AS ng,
         CASE WHEN (SELECT m FROM tot) > 1 THEN
           (1000000 * SUM(abs(cd)))
             // (MAX(ng) * (SELECT nn FROM tot) * ((SELECT m FROM tot) - 1))
         ELSE 0 END AS emd_ppm
  FROM cum GROUP BY event_type, day
)
SELECT CAST(t.t AS BIGINT) AS t_threshold_ppm,
       CAST(SUM(CASE WHEN emd_ppm > t.t THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_groups,
       CAST(SUM(CASE WHEN emd_ppm > t.t THEN ng ELSE 0 END) AS BIGINT)
         AS violating_rows
FROM emd, (VALUES {ts}) t(t)
GROUP BY t.t ORDER BY t.t
"""
