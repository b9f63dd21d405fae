"""Range joins: the two shapes Ray Data has no native operator for.

1. **Keyed range join** (``range_join_orders_lineitem``): equi key + time
   window — "for each order, aggregate the lineitems shipped within W days
   of the order date". The feature-engineering join every training-data
   pipeline runs at label time. Plan: tagged union of both sides keyed on
   the join key -> ONE bucket shuffle -> per bucket, a *cumulative-sum
   double asof probe*: sort the right side by ts, attach per-key running
   (count, sum), then two ``pd.merge_asof`` probes at the window bounds;
   the window aggregate is F(hi) - F(lo). No pair explosion — cost is
   O(n log n) per bucket regardless of window width, unlike the naive
   key-join-then-filter which materializes every (order, lineitem) pair.

2. **Band join, no equi key** (``band_join_events``): "count rows within
   +/-band of each probe row" — interval self-join on time alone. Plan:
   slice time into buckets of width 2*band; every build row lands in
   exactly ONE bucket (its own), every probe is replicated to its bucket
   +/-1 (fixed 3x fan-out); inside a bucket the band intersected with the
   bucket's span is a contiguous ts interval, so a single global
   ``np.searchsorted`` over the bucket's sorted build timestamps answers
   every probe. Partial counts then combine per probe id (<= 3 partials
   each). Skew note: a hot time bucket is bounded by bucket width, not key
   cardinality — at 100 TB shrink the band bucket width (more buckets),
   never the shuffle bucket count.

Neither the reference nor Ray Data ships these; the reference's nearest
analogue is SQL-side windowed reporting (database/migration_*.sql date
filters). Partitioning assumption (documented per the build rules): keyed
range join requires key co-location (the bucket shuffle provides it); band
join requires time-bucket co-location (ditto).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from medical_ocr_service_ray.stages.aggregate import bucketed_combine


def _us(series: pd.Series) -> pd.Series:
    """Timestamps as int64 microseconds regardless of pandas ns/us storage."""
    return series.astype("datetime64[us]").astype("int64")


def range_join_orders_lineitem(
    orders: "rd.Dataset",
    lineitem: "rd.Dataset",
    window_days: int = 90,
    num_buckets: int = 16,
) -> "rd.Dataset":
    """LEFT keyed range join: every order row, with count and revenue
    (rev4 = cents(price) * cents(1-discount), int64-exact like q33) of its
    lineitems whose l_shipdate falls in [o_orderdate, o_orderdate + W days).
    Returns (o_orderkey, n_shipped_90d, rev4_90d)."""
    win_us = int(window_days) * 86_400_000_000

    def prep_orders(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df.o_orderkey.astype("int64"),
                "side": np.int8(1),
                "ts_us": _us(df.o_orderdate),
                "rev4": np.int64(0),
            }
        )

    def prep_lineitem(df: pd.DataFrame) -> pd.DataFrame:
        cents_p = np.rint(df.l_extendedprice.to_numpy() * 100).astype("int64")
        cents_d = np.rint((1.0 - df.l_discount.to_numpy()) * 100).astype("int64")
        return pd.DataFrame(
            {
                "key": df.l_orderkey.astype("int64"),
                "side": np.int8(0),
                "ts_us": _us(df.l_shipdate),
                "rev4": cents_p * cents_d,
            }
        )

    unified = orders.map_batches(prep_orders, batch_format="pandas").union(
        lineitem.map_batches(prep_lineitem, batch_format="pandas")
    )

    empty = pd.DataFrame(
        {
            "o_orderkey": pd.Series(dtype="int64"),
            "n_shipped_90d": pd.Series(dtype="int64"),
            "rev4_90d": pd.Series(dtype="int64"),
        }
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        od = df[df.side == 1][["key", "ts_us"]]
        li = df[df.side == 0][["key", "ts_us", "rev4"]]
        if od.empty:
            return empty
        if li.empty:
            return pd.DataFrame(
                {
                    "o_orderkey": od.key.astype("int64"),
                    "n_shipped_90d": np.zeros(len(od), dtype="int64"),
                    "rev4_90d": np.zeros(len(od), dtype="int64"),
                }
            )
        # right side: sorted by ts, per-key running count/sum; the LAST row
        # among equal (key, ts) carries the full tie-group total, which is
        # exactly the row merge_asof(direction="backward") selects.
        li = li.sort_values("ts_us", kind="mergesort")
        g = li.groupby("key", sort=False)
        li = li.assign(cn=g.cumcount().to_numpy() + 1, cv=g.rev4.cumsum().to_numpy())
        li = li[["key", "ts_us", "cn", "cv"]]
        # two probes: F(window_end - 1us) - F(window_start - 1us)
        probes = od.assign(hi=od.ts_us + (win_us - 1), lo=od.ts_us - 1)
        f = {}
        for bound in ("hi", "lo"):
            p = probes[["key", bound]].rename(columns={bound: "ts_us"})
            p = p.sort_values("ts_us", kind="mergesort")
            m = pd.merge_asof(p, li, on="ts_us", by="key", direction="backward")
            f[bound] = m.set_index(p.index)[["cn", "cv"]].fillna(0)
        # the probe frames kept their bound-sorted order; label-align the
        # diff, then bring it back into od's row order before pairing
        n = (f["hi"].cn - f["lo"].cn).reindex(od.index).astype("int64")
        v = (f["hi"].cv - f["lo"].cv).reindex(od.index).astype("int64")
        return pd.DataFrame(
            {
                "o_orderkey": od.key.astype("int64"),
                "n_shipped_90d": n.to_numpy(),
                "rev4_90d": v.to_numpy(),
            }
        )

    return bucketed_combine(unified, "key", combine, num_buckets=num_buckets)


def band_join_events(
    events: "rd.Dataset",
    band_seconds: int = 3600,
    probe_type: str = "purchase",
    num_buckets: int = 16,
) -> "rd.Dataset":
    """Pure (no-equi-key) band self-join: for each event of ``probe_type``,
    count ALL events (any user, any type, the probe itself included) with
    ts within +/- band_seconds. Returns (event_id, n_nearby)."""
    band = int(band_seconds) * 1_000_000
    width = 2 * band  # bucket width >= band interval length => +/-1 covers

    def prep_build(df: pd.DataFrame) -> pd.DataFrame:
        ts = _us(df.ts).to_numpy()
        return pd.DataFrame(
            {
                "tbucket": ts // width,
                "side": np.int8(0),
                "ts_us": ts,
                "event_id": np.int64(-1),
            }
        )

    def prep_probes(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.event_type == probe_type]
        ts = _us(df.ts).to_numpy()
        eid = df.event_id.astype("int64").to_numpy()
        b = ts // width
        out = []
        for delta in (-1, 0, 1):  # fixed 3x probe fan-out
            out.append(
                pd.DataFrame(
                    {"tbucket": b + delta, "side": np.int8(1), "ts_us": ts, "event_id": eid}
                )
            )
        return pd.concat(out, ignore_index=True)

    unified = events.map_batches(prep_build, batch_format="pandas").union(
        events.map_batches(prep_probes, batch_format="pandas")
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        pr = df[df.side == 1]
        if pr.empty:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"), "pn": pd.Series(dtype="int64")}
            )
        # build rows of every time-bucket in this task, sorted ONCE; each
        # probe's band clipped to its target bucket's span is a contiguous
        # interval that only that bucket's build rows can fall in.
        ts_sorted = np.sort(df[df.side == 0].ts_us.to_numpy())
        b = pr.tbucket.to_numpy()
        p = pr.ts_us.to_numpy()
        lo = np.maximum(p - band, b * width)
        hi = np.minimum(p + band, (b + 1) * width - 1)
        cnt = np.searchsorted(ts_sorted, hi, side="right") - np.searchsorted(
            ts_sorted, lo, side="left"
        )
        cnt = np.where(lo > hi, 0, cnt).astype("int64")
        return pd.DataFrame({"event_id": pr.event_id.to_numpy(), "pn": cnt})

    partials = bucketed_combine(unified, "tbucket", per_bucket, num_buckets=num_buckets)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_id", as_index=False).agg(n_nearby=("pn", "sum"))
        return out.astype({"event_id": "int64", "n_nearby": "int64"})

    return bucketed_combine(partials, "event_id", final, num_buckets=num_buckets)
