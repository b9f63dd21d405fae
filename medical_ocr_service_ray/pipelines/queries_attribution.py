"""attribution, funnels, distribution stats, checksums (q113-q131) — split from pipelines/queries.py (r5), no behavior change."""

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
    _cents,
    _read,
    bucketed_combine,
    driver_combine,
    np,
    partial_then_combine,
    pd,
    pq,
)




# -------------------------------------------------------------------- q113

def q113_last_touch_attribution(sf_dir: str):
    """Marketing last-touch attribution: each purchase is credited to the
    user's LATEST click at-or-before it within a 7-day window (-1 sentinels
    when none). Ties: a click at the purchase's exact timestamp counts;
    equal-timestamp clicks resolve to the highest event_id.

    Implemented as one user-keyed exchange + the q110 LOCF kernel over the
    interleaved click/purchase scan (clicks sort before purchases at equal
    ts so <= semantics fall out of the order): forward-fill the last click
    (id, ts) per user with np.maximum.accumulate, select purchase rows,
    apply the window. Mirrors DuckDB's IGNORE NULLS last_value windows
    exactly."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    WINDOW = np.timedelta64(7 * 86400_000_000, "us")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.event_type.isin(["click", "purchase"])].copy()
        df["is_p"] = (df.event_type == "purchase").astype("int64")
        df = df.sort_values(["user_id", "ts", "is_p", "event_id"], kind="mergesort")
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "click_id": pd.Series(dtype="int64"),
                    "gap_us": pd.Series(dtype="int64"),
                }
            )
        is_click = (df.is_p.to_numpy() == 0)
        idx = np.where(is_click, np.arange(n), -1)
        filled = np.maximum.accumulate(idx)
        uid = df.user_id.to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        ustart = np.maximum.accumulate(np.where(new_user, np.arange(n), -1))
        valid = (filled >= ustart) & (filled >= 0)
        ts = df.ts.to_numpy().astype("datetime64[us]")
        eids = df.event_id.to_numpy()
        c_id = np.where(valid, eids[np.maximum(filled, 0)], -1)
        gap = ts - ts[np.maximum(filled, 0)]
        in_window = valid & (gap <= WINDOW)
        out = pd.DataFrame(
            {
                "event_id": eids,
                "user_id": uid,
                "click_id": np.where(in_window, c_id, -1).astype("int64"),
                "gap_us": np.where(
                    in_window, gap.astype("timedelta64[us]").astype("int64"), -1
                ).astype("int64"),
            }
        )
        return out[df.is_p.to_numpy() == 1].reset_index(drop=True)

    return bucketed_combine(ds, "user_id", combine)


_Q113_SQL = """
WITH s AS (
  SELECT event_id, ts, user_id,
         (event_type = 'purchase')::INT AS is_p,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts
  FROM events WHERE event_type IN ('click', 'purchase')
), f AS (
  SELECT *,
         last_value(click_id IGNORE NULLS) OVER w AS last_click,
         last_value(click_ts IGNORE NULLS) OVER w AS last_click_ts
  FROM s
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_p, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       CASE WHEN last_click IS NOT NULL
             AND epoch_us(ts) - epoch_us(last_click_ts) <= 604800000000
            THEN last_click ELSE -1 END AS click_id,
       CASE WHEN last_click IS NOT NULL
             AND epoch_us(ts) - epoch_us(last_click_ts) <= 604800000000
            THEN epoch_us(ts) - epoch_us(last_click_ts) ELSE -1 END AS gap_us
FROM f WHERE is_p = 1
"""


# -------------------------------------------------------------------- q114

def q114_multi_touch_counts(sf_dir: str):
    """Multi-touch attribution denominator: per purchase, the number of the
    user's clicks inside the inclusive [ts−7d, ts] window (linear
    attribution credits each 1/n — n is the exact integer reported).

    One user-keyed exchange; inside each bucket the range count is TWO
    searchsorted calls over a composite (dense-user, ts-offset) int64 key —
    no per-user loop, no pair materialization (the q61 range-join
    cumulative-count idea specialized to counting)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    W_US = np.int64(7 * 86400_000_000)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.event_type.isin(["click", "purchase"])]
        if not len(df):
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "n_clicks": pd.Series(dtype="int64"),
                }
            )
        ts_us = df.ts.to_numpy().astype("datetime64[us]").astype("int64")
        t0 = ts_us.min()
        uid = df.user_id.to_numpy()
        dense = pd.factorize(uid, sort=True)[0].astype("int64")
        SPAN = np.int64(ts_us.max() - t0 + W_US + 2)
        key = dense * SPAN + (ts_us - t0)
        is_c = (df.event_type == "click").to_numpy()
        ckeys = np.sort(key[is_c])
        p = ~is_c
        lo = np.searchsorted(ckeys, key[p] - W_US, side="left")
        hi = np.searchsorted(ckeys, key[p], side="right")
        return pd.DataFrame(
            {
                "event_id": df.event_id.to_numpy()[p].astype("int64"),
                "user_id": uid[p].astype("int64"),
                "n_clicks": (hi - lo).astype("int64"),
            }
        )

    return bucketed_combine(ds, "user_id", combine)


_Q114_SQL = """
SELECT p.event_id, p.user_id, COUNT(c.event_id)::BIGINT AS n_clicks
FROM events p
LEFT JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click'
 AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 604800000000
WHERE p.event_type = 'purchase'
GROUP BY 1, 2
"""


# -------------------------------------------------------------------- q115

_Q115_TYPES = ["click", "error", "purchase", "signup", "view"]


def q115_audience_overlap_exact(sf_dir: str):
    """EXACT audience-overlap matrix — the precise counterpart of q68's HLL
    estimate: for every event-type pair (a ≤ b), the number of distinct
    users who did BOTH. The trick that avoids 10 pairwise distinct-joins:
    each user folds to ONE bitmask of the types they ever did (5 types →
    int in [0,32)), masks fold to a 32-cell histogram, and every pairwise
    intersection is a popcount-filtered SUM over that tiny histogram —
    driver arithmetic on 32 rows. One user-keyed exchange total, partials
    pre-OR masks per batch. SQL mirrors with bit_or over CASE powers."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    bit = {t: 1 << i for i, t in enumerate(_Q115_TYPES)}

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # each row's mask is one power of two, so OR per user == SUM over
        # the user's DISTINCT bits — fully vectorized, no per-group lambda
        m = df.event_type.map(bit).fillna(0).astype("int64")
        d = pd.DataFrame({"user_id": df.user_id, "mask": m}).drop_duplicates()
        return d.groupby("user_id", as_index=False)["mask"].sum()

    NB = len(_Q115_TYPES)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # OR of arbitrary partial masks: per-bit grouped max, recomposed
        mk = df["mask"].to_numpy().astype("int64")
        tmp = df.assign(**{f"b{i}": (mk >> i) & 1 for i in range(NB)})
        g = tmp.groupby("user_id", as_index=False)[[f"b{i}" for i in range(NB)]].max()
        mask = sum(g[f"b{i}"].to_numpy().astype("int64") << i for i in range(NB))
        return (
            pd.Series(mask).value_counts().rename_axis("mask").reset_index(name="n_users")
        )

    hist = (
        partial_then_combine(ds, partial, "user_id", combine)
        .to_pandas()
        .groupby("mask", as_index=False)["n_users"]
        .sum()  # cells from different user-buckets are disjoint; sum merges
    )
    masks = hist["mask"].to_numpy()
    counts = hist.n_users.to_numpy()
    rows = []
    for i, a in enumerate(_Q115_TYPES):
        for j in range(i, len(_Q115_TYPES)):
            b = _Q115_TYPES[j]
            need = bit[a] | bit[b]
            rows.append(
                {
                    "type_a": a,
                    "type_b": b,
                    "n_users": int(counts[(masks & need) == need].sum()),
                }
            )
    out = pd.DataFrame(rows)
    out["n_users"] = out.n_users.astype("int64")
    return out


def _q115_sql() -> str:
    cases = " + ".join(
        f"CASE WHEN bool_or(event_type = '{t}') THEN {1 << i} ELSE 0 END"
        for i, t in enumerate(_Q115_TYPES)
    )
    pairs = []
    for i, a in enumerate(_Q115_TYPES):
        for j in range(i, len(_Q115_TYPES)):
            b = _Q115_TYPES[j]
            need = (1 << i) | (1 << j)
            pairs.append(
                f"SELECT '{a}' AS type_a, '{b}' AS type_b, "
                f"SUM(CASE WHEN mask & {need} = {need} THEN 1 ELSE 0 END)::BIGINT AS n_users "
                f"FROM m"
            )
    body = "\nUNION ALL\n".join(pairs)
    return f"WITH m AS (SELECT user_id, {cases} AS mask FROM events GROUP BY user_id)\n{body}"


# -------------------------------------------------------------------- q116

def q116_weighted_median(sf_dir: str):
    """Exact WEIGHTED median per group (price cents weighted by quantity,
    per l_returnflag) — the q44 mergeable value-count-histogram idiom with
    weights: per-batch (group, value)→Σweight partials collapse duplicates
    before the single group-keyed exchange; per group the median is the
    smallest value whose cumulative weight reaches half the total
    (2·cum ≥ total, integer comparison, no float quantile interpolation).
    Output: group, weighted median, total weight."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "flag": df.l_returnflag,
                    "cents": _cents(df.l_extendedprice),
                    "w": df.l_quantity.to_numpy().astype("int64"),
                }
            )
            .groupby(["flag", "cents"], as_index=False)["w"]
            .sum()
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby(["flag", "cents"], as_index=False)["w"].sum()
        h = h.sort_values(["flag", "cents"], kind="mergesort")
        cw = h.groupby("flag")["w"].cumsum().to_numpy()
        tw = h.flag.map(h.groupby("flag")["w"].sum()).to_numpy()
        h = h.assign(__med=2 * cw >= tw, __tw=tw)
        first = h[h.__med].groupby("flag", as_index=False).head(1)
        return pd.DataFrame(
            {
                "flag": first.flag,
                "wmedian_cents": first.cents.astype("int64"),
                "total_weight": first.__tw.astype("int64"),
            }
        )

    return partial_then_combine(ds, partial, "flag", combine)


_Q116_SQL = """
WITH d AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
), h AS (
  SELECT flag, cents, SUM(w) AS w FROM d GROUP BY 1, 2
), c AS (
  SELECT flag, cents, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY cents) AS cw,
         SUM(w) OVER (PARTITION BY flag) AS tw
  FROM h
)
SELECT flag,
       MIN(CASE WHEN 2 * cw >= tw THEN cents END)::BIGINT AS wmedian_cents,
       MAX(tw)::BIGINT AS total_weight
FROM c GROUP BY flag
"""


# -------------------------------------------------------------------- q117

def q117_column_profile(sf_dir: str):
    """Data-quality column profiler over orders — the catalog stats job
    every warehouse runs: per column (orderkey, custkey, totalprice-cents,
    orderdate-day-index), exact row/null counts, min/max, sum, and EXACT
    distinct counts. min/max/sum/counts are one bounded partial+driver
    combine; all four exact distincts share ONE tagged exchange: rows fold
    to (col_id, value) pairs, de-duplicated per batch, bucketed on value,
    counted per col inside each bucket — a hot value costs one row per
    (batch, col), and no per-column extra pass exists."""
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    ds = _read(sf_dir, "orders", cols)

    def to_ints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df.o_orderkey.astype("int64"),
                "o_custkey": df.o_custkey.astype("int64"),
                "cents": _cents(df.o_totalprice),
                # DAY index since 1992-01-01 (dates are day-aligned):
                # µs sums overflow int64 at any base, day sums are safe
                # to sf1000; the oracle uses the same unit
                "date_day": (
                    (
                        df.o_orderdate.to_numpy().astype("datetime64[us]")
                        - np.datetime64("1992-01-01", "us")
                    )
                    // np.timedelta64(86400_000_000, "us")
                ).astype("int64"),
            }
        )

    names = ["o_orderkey", "o_custkey", "cents", "date_day"]

    def stat_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = to_ints(df)
        rows = []
        for i, c in enumerate(names):
            v = d[c]
            rows.append(
                {
                    "col_id": i,
                    "n": len(v),
                    "n_null": int(v.isna().sum()),
                    "vmin": int(v.min()),
                    "vmax": int(v.max()),
                    "vsum": int(v.sum()),
                }
            )
        return pd.DataFrame(rows)

    def stat_combine(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby("col_id", as_index=False).agg(
            n=("n", "sum"), n_null=("n_null", "sum"),
            vmin=("vmin", "min"), vmax=("vmax", "max"), vsum=("vsum", "sum"),
        )

    stats = driver_combine(ds, stat_partial, stat_combine)

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = to_ints(df)
        parts = [
            pd.DataFrame({"col_id": np.int64(i), "value": d[c].unique()})
            for i, c in enumerate(names)
        ]
        return pd.concat(parts, ignore_index=True)

    def distinct_combine(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates(["col_id", "value"])
        return u.groupby("col_id", as_index=False).size().rename(columns={"size": "nd"})

    nd = (
        partial_then_combine(ds, pair_partial, "value", distinct_combine)
        .to_pandas()
        .groupby("col_id", as_index=False)["nd"]
        .sum()  # value-buckets are disjoint, per-col counts add
    )
    out = stats.merge(nd, on="col_id").sort_values("col_id")
    out["column"] = [names[i] for i in out.col_id]
    out["n_distinct"] = out.nd.astype("int64")
    for c in ("n", "n_null", "vmin", "vmax", "vsum"):
        out[c] = out[c].astype("int64")
    return out[["column", "n", "n_null", "n_distinct", "vmin", "vmax", "vsum"]].reset_index(
        drop=True
    )


_Q117_SQL = """
WITH d AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS date_day
  FROM orders
)
SELECT 'o_orderkey' AS "column", COUNT(*)::BIGINT AS n,
       (COUNT(*) - COUNT(o_orderkey))::BIGINT AS n_null,
       COUNT(DISTINCT o_orderkey)::BIGINT AS n_distinct,
       MIN(o_orderkey)::BIGINT AS vmin, MAX(o_orderkey)::BIGINT AS vmax,
       SUM(o_orderkey)::BIGINT AS vsum
FROM d
UNION ALL
SELECT 'o_custkey', COUNT(*)::BIGINT, (COUNT(*) - COUNT(o_custkey))::BIGINT,
       COUNT(DISTINCT o_custkey)::BIGINT, MIN(o_custkey)::BIGINT,
       MAX(o_custkey)::BIGINT, SUM(o_custkey)::BIGINT
FROM d
UNION ALL
SELECT 'cents', COUNT(*)::BIGINT, (COUNT(*) - COUNT(cents))::BIGINT,
       COUNT(DISTINCT cents)::BIGINT, MIN(cents)::BIGINT,
       MAX(cents)::BIGINT, SUM(cents)::BIGINT
FROM d
UNION ALL
SELECT 'date_day', COUNT(*)::BIGINT, (COUNT(*) - COUNT(date_day))::BIGINT,
       COUNT(DISTINCT date_day)::BIGINT, MIN(date_day)::BIGINT,
       MAX(date_day)::BIGINT, SUM(date_day)::BIGINT
FROM d
"""


# -------------------------------------------------------------------- q118

def q118_event_trigrams(sf_dir: str):
    """Sequential-pattern mining: the top-10 event-type TRIGRAMS across all
    per-user timelines (q54's transcript bigrams, lifted to length-3 and
    the events table). One user-keyed exchange orders each user's timeline;
    trigram extraction is two vectorized shifts + user-boundary masking;
    per-bucket counts pre-aggregate before the driver's tiny top-10 merge
    (the trigram alphabet is |types|³ ≤ 125 — bounded)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t0 = df.event_type.to_numpy()
        u = df.user_id.to_numpy()
        n = len(df)
        if n < 3:
            return pd.DataFrame({"trigram": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype="int64")})
        same3 = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        tri = np.char.add(
            np.char.add(np.char.add(t0[:-2].astype(str), ">"),
                        np.char.add(t0[1:-1].astype(str), ">")),
            t0[2:].astype(str),
        )[same3]
        vc = pd.Series(tri).value_counts()
        return vc.rename_axis("trigram").reset_index(name="cnt")

    counts = (
        bucketed_combine(ds, "user_id", combine)
        .to_pandas()
        .groupby("trigram", as_index=False)["cnt"]
        .sum()  # user-buckets are disjoint; alphabet <= |types|^3
    )
    out = counts.sort_values(["cnt", "trigram"], ascending=[False, True]).head(10)
    out["cnt"] = out.cnt.astype("int64")
    return out.reset_index(drop=True)


_Q118_SQL = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT event_type || '>' || t2 || '>' || t3 AS trigram, COUNT(*)::BIGINT AS cnt
FROM o WHERE t3 IS NOT NULL
GROUP BY 1
ORDER BY cnt DESC, trigram
LIMIT 10
"""


# -------------------------------------------------------------------- q119

def q119_daily_bounce_rate(sf_dir: str):
    """Per-day session bounce metrics — the q28 sessionization (30-min gap
    rule) composed into the analytics rollup a web property actually reads:
    for each day (of session start), total sessions, single-event
    ("bounced") sessions, and total session-seconds. One user-keyed
    exchange sessionizes (vectorized gap + cumsum islands); per-session
    rows collapse to per-(day) partial counts inside the same bucket task,
    so the second aggregation is a driver combine over days×buckets rows."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    GAP = np.timedelta64(1_800_000_000, "us")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = df.user_id.ne(df.user_id.shift())
        gap = df.ts - df.ts.shift()
        new_sess = new_user | (gap > GAP)
        sid = new_sess.cumsum()
        g = df.assign(__sid=sid).groupby("__sid", as_index=False).agg(
            start=("ts", "first"), end=("ts", "last"), n=("ts", "size")
        )
        g["day"] = g.start.dt.strftime("%Y-%m-%d")
        g["dur_s"] = (
            (g.end.to_numpy() - g.start.to_numpy()) // np.timedelta64(1, "s")
        ).astype("int64")
        return g.groupby("day", as_index=False).agg(
            n_sessions=("n", "size"),
            n_bounced=("n", lambda s: int((s == 1).sum())),
            total_dur_s=("dur_s", "sum"),
        )

    parts = bucketed_combine(ds, "user_id", combine).to_pandas()
    out = parts.groupby("day", as_index=False).sum()
    for c in ("n_sessions", "n_bounced", "total_dur_s"):
        out[c] = out[c].astype("int64")
    return out


_Q119_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, event_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
), sess AS (
  SELECT user_id, session_idx, MIN(ts) AS start_ts, MAX(ts) AS end_ts,
         COUNT(*) AS n
  FROM numbered GROUP BY 1, 2
)
SELECT strftime(start_ts, '%Y-%m-%d') AS day,
       COUNT(*)::BIGINT AS n_sessions,
       SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounced,
       SUM(epoch_us(end_ts - start_ts) // 1000000)::BIGINT AS total_dur_s
FROM sess GROUP BY 1
"""


# -------------------------------------------------------------------- q120

def q120_order_count_distribution(sf_dir: str):
    """Degree-distribution rollup: how many customers placed exactly k
    orders, for every observed k — the frequency-of-frequencies shape whose
    naive form is two chained shuffles. Here: per-batch (custkey → orders)
    partial counts, ONE custkey-keyed combine completes per-customer
    counts AND collapses them to (k → n_customers) inside the same bucket
    task (customer-buckets are disjoint), so the driver merge sums a few
    dozen k-cells per bucket."""
    ds = _read(sf_dir, "orders", ["o_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).size().rename(columns={"size": "c"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        per_cust = df.groupby("o_custkey", as_index=False)["c"].sum()
        return (
            per_cust.groupby("c", as_index=False)
            .size()
            .rename(columns={"c": "n_orders", "size": "n_customers"})
        )

    parts = partial_then_combine(ds, partial, "o_custkey", combine).to_pandas()
    out = parts.groupby("n_orders", as_index=False)["n_customers"].sum()
    out["n_orders"] = out.n_orders.astype("int64")
    out["n_customers"] = out.n_customers.astype("int64")
    return out


_Q120_SQL = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*)::BIGINT AS n_orders FROM orders GROUP BY 1
)
SELECT n_orders, COUNT(*)::BIGINT AS n_customers
FROM per_cust GROUP BY 1
"""


# -------------------------------------------------------------------- q121

def q121_winsorized_stats(sf_dir: str):
    """Winsorized (outlier-clamped) spend statistics per event type: exact
    P1/P99 bounds from the value-count histogram (q44's exact-quantile
    rule: smallest value with 100·cum ≥ q·total), values clamped to the
    bounds, then clamped sum/count — the robust-mean pattern that kills
    heavy tails without dropping rows. Two passes over the same narrow
    read: a bounded histogram exchange for the bounds, a stateless clamp
    stamp + bounded combine for the sums (bounds ride the closure, never a
    join)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"t": df.event_type, "cents": _cents(df.value)})
            .groupby(["t", "cents"], as_index=False)
            .size()
            .rename(columns={"size": "w"})
        )

    def hist_combine(df: pd.DataFrame) -> pd.DataFrame:
        h = df.groupby(["t", "cents"], as_index=False)["w"].sum()
        h = h.sort_values(["t", "cents"], kind="mergesort")
        cw = h.groupby("t")["w"].cumsum().to_numpy()
        tw = h.t.map(h.groupby("t")["w"].sum()).to_numpy()
        lo_ok = 100 * cw >= 1 * tw
        hi_ok = 100 * cw >= 99 * tw
        out = []
        for flag, name in ((lo_ok, "p1"), (hi_ok, "p99")):
            f = h[flag].groupby("t", as_index=False).head(1)
            out.append(pd.DataFrame({"t": f.t, "q": name, "cents": f.cents}))
        return pd.concat(out, ignore_index=True)

    bounds = partial_then_combine(ds, hist_partial, "t", hist_combine).to_pandas()
    lo = bounds[bounds.q == "p1"].set_index("t").cents
    hi = bounds[bounds.q == "p99"].set_index("t").cents

    def clamp_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df.value).to_numpy()
        l = df.event_type.map(lo).to_numpy()
        h = df.event_type.map(hi).to_numpy()
        w = np.clip(c, l, h)
        return (
            pd.DataFrame({"event_type": df.event_type, "wc": w})
            .groupby("event_type", as_index=False)
            .agg(n=("wc", "size"), wsum=("wc", "sum"))
        )

    def clamp_combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("event_type", as_index=False).sum()
        g["n"] = g.n.astype("int64")
        g["wsum"] = g.wsum.astype("int64")
        return g

    out = driver_combine(ds, clamp_partial, clamp_combine)
    out["p1_cents"] = out.event_type.map(lo).astype("int64")
    out["p99_cents"] = out.event_type.map(hi).astype("int64")
    return out[["event_type", "n", "p1_cents", "p99_cents", "wsum"]]


_Q121_SQL = """
WITH d AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), h AS (
  SELECT event_type, cents, COUNT(*) AS w FROM d GROUP BY 1, 2
), c AS (
  SELECT event_type, cents, w,
         SUM(w) OVER (PARTITION BY event_type ORDER BY cents) AS cw,
         SUM(w) OVER (PARTITION BY event_type) AS tw
  FROM h
), b AS (
  SELECT event_type,
         MIN(CASE WHEN 100 * cw >= 1 * tw THEN cents END) AS p1,
         MIN(CASE WHEN 100 * cw >= 99 * tw THEN cents END) AS p99
  FROM c GROUP BY 1
)
SELECT d.event_type, COUNT(*)::BIGINT AS n,
       b.p1::BIGINT AS p1_cents, b.p99::BIGINT AS p99_cents,
       SUM(LEAST(GREATEST(d.cents, b.p1), b.p99))::BIGINT AS wsum
FROM d JOIN b USING (event_type)
GROUP BY d.event_type, b.p1, b.p99
"""


# -------------------------------------------------------------------- q122

def q122_revenue_share(sf_dir: str):
    """Share-of-total revenue per order priority as an EXACT integer
    fraction (numerator = priority cents, denominator = global cents) plus
    basis points (floor(10000·num/den)) — the ratio-to-report window
    (SUM OVER ()) without any window shuffle: one bounded partial+driver
    combine produces both the group cells and, by summing them, the global
    denominator."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"p": df.o_orderpriority, "cents": _cents(df.o_totalprice)})
            .groupby("p", as_index=False)
            .agg(n=("cents", "size"), cents=("cents", "sum"))
        )

    def combine(parts: pd.DataFrame) -> pd.DataFrame:
        g = parts.groupby("p", as_index=False).sum()
        total = np.int64(g.cents.sum())
        g["total_cents"] = total
        g["share_bps"] = (10000 * g.cents.to_numpy().astype("int64")) // total
        for c in ("n", "cents", "total_cents", "share_bps"):
            g[c] = g[c].astype("int64")
        return g.rename(columns={"p": "o_orderpriority"})

    return driver_combine(ds, partial, combine)


_Q122_SQL = """
WITH g AS (
  SELECT o_orderpriority, COUNT(*)::BIGINT AS n,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, n, cents,
       SUM(cents) OVER ()::BIGINT AS total_cents,
       ((10000 * cents) // SUM(cents) OVER ())::BIGINT AS share_bps
FROM g
"""


# -------------------------------------------------------------------- q123

_Q123_RULES = [
    ("value_nonneg", "value", "ge", 0.0),
    ("value_le_45", "value", "le", 45.0),
    ("known_type", "event_type", "in_set", ("click", "error", "purchase", "signup", "view")),
    ("ts_not_null", "ts", "not_null", None),
    ("user_lt_1400", "user_id", "le", 1399),
]


def q123_contract_violations(sf_dir: str):
    """Data-contract audit over events (stages/validate.py): five
    declarative rules evaluated vectorized per batch, per-rule counts
    pre-aggregated before one bounded driver combine — the ingest-boundary
    report every production pipeline runs. Rules chosen so some genuinely
    fire on the synthetic data (value ≤ 45, user_id ≤ 1399) and some don't
    (type whitelist, non-null ts): both directions are oracle-checked."""
    from medical_ocr_service_ray.stages.validate import check_batch

    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = check_batch(df, _Q123_RULES)
        out["n_rows"] = np.int64(len(df))
        return out

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("rule_id", as_index=False).agg(
            n_violations=("n_violations", "sum"), n_rows=("n_rows", "sum")
        )
        g["n_violations"] = g.n_violations.astype("int64")
        g["n_rows"] = g.n_rows.astype("int64")
        return g

    return driver_combine(ds, partial, combine)


_Q123_SQL = """
WITH counts AS (
  SELECT
    SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS value_nonneg,
    SUM(CASE WHEN value > 45.0 THEN 1 ELSE 0 END) AS value_le_45,
    SUM(CASE WHEN event_type NOT IN ('click','error','purchase','signup','view')
             THEN 1 ELSE 0 END) AS known_type,
    SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS ts_not_null,
    SUM(CASE WHEN user_id > 1399 THEN 1 ELSE 0 END) AS user_lt_1400,
    COUNT(*) AS n_rows
  FROM events
)
SELECT 'value_nonneg' AS rule_id, value_nonneg::BIGINT AS n_violations, n_rows::BIGINT AS n_rows FROM counts
UNION ALL SELECT 'value_le_45', value_le_45::BIGINT, n_rows::BIGINT FROM counts
UNION ALL SELECT 'known_type', known_type::BIGINT, n_rows::BIGINT FROM counts
UNION ALL SELECT 'ts_not_null', ts_not_null::BIGINT, n_rows::BIGINT FROM counts
UNION ALL SELECT 'user_lt_1400', user_lt_1400::BIGINT, n_rows::BIGINT FROM counts
"""


# -------------------------------------------------------------------- q124

def q124_conversion_latency(sf_dir: str):
    """Conversion-latency summary: over q113's attributed purchases, the
    exact lower-median click→purchase latency in WHOLE SECONDS (second
    granularity keeps the value-count histogram small — the q44/q116
    mergeable-histogram rule; µs-resolution gaps are near-all-distinct and
    would degenerate the histogram to row count), plus attributed/total
    purchase counts. Pipeline composition: the q113 dataset streams into a
    per-batch (latency_s → count) partial and one driver-side median pick
    — attribution itself stays one exchange."""
    attributed = q113_last_touch_attribution(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hit = df[df.click_id >= 0]
        return (
            pd.DataFrame({"lat_s": (hit.gap_us.to_numpy() // 1_000_000).astype("int64")})
            .groupby("lat_s", as_index=False)
            .size()
            .rename(columns={"size": "w"})
        )

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        h = p.groupby("lat_s", as_index=False)["w"].sum().sort_values("lat_s")
        cw = h.w.cumsum().to_numpy()
        tw = int(h.w.sum())
        med = int(h.lat_s.to_numpy()[np.argmax(2 * cw >= tw)]) if tw else -1
        return pd.DataFrame(
            {
                "n_attributed": [np.int64(tw)],
                "median_latency_s": [np.int64(med)],
            }
        )

    out = driver_combine(attributed, partial, combine)
    n_purchases = attributed.count()
    out["n_purchases"] = np.int64(n_purchases)
    return out[["n_purchases", "n_attributed", "median_latency_s"]]


_Q124_SQL = """
WITH s AS (
  SELECT event_id, ts, user_id,
         (event_type = 'purchase')::INT AS is_p,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
         CASE WHEN event_type = 'click' THEN ts END AS click_ts
  FROM events WHERE event_type IN ('click', 'purchase')
), f AS (
  SELECT *,
         last_value(click_id IGNORE NULLS) OVER w AS last_click,
         last_value(click_ts IGNORE NULLS) OVER w AS last_click_ts
  FROM s
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_p, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), attr AS (
  SELECT CASE WHEN last_click IS NOT NULL
               AND epoch_us(ts) - epoch_us(last_click_ts) <= 604800000000
              THEN (epoch_us(ts) - epoch_us(last_click_ts)) // 1000000 END AS lat_s
  FROM f WHERE is_p = 1
), h AS (
  SELECT lat_s, COUNT(*) AS w FROM attr WHERE lat_s IS NOT NULL GROUP BY 1
), c AS (
  SELECT lat_s, w, SUM(w) OVER (ORDER BY lat_s) AS cw, SUM(w) OVER () AS tw FROM h
)
SELECT (SELECT COUNT(*) FROM attr)::BIGINT AS n_purchases,
       (SELECT COALESCE(SUM(w), 0) FROM h)::BIGINT AS n_attributed,
       COALESCE(MIN(CASE WHEN 2 * cw >= tw THEN lat_s END), -1)::BIGINT AS median_latency_s
FROM c
"""


# -------------------------------------------------------------------- q125

def q125_share_of_region(sf_dir: str):
    """Hierarchical share-of-parent rollup: each nation's order revenue as
    exact basis points of its REGION's total (the percent-of-parent drill
    every BI hierarchy renders). One broadcast custkey→(nation, region)
    lookup stamped inside the fact partial (q33's dimension rule), one
    bounded driver combine over ≤25 nation cells; region denominators are
    sums of those cells — no window shuffle exists."""
    import ray as _ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    r_name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nk_to = {
        k: (n, r_name[r])
        for k, n, r in zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
    }
    ckeys = cust["c_custkey"].to_pylist()
    cnk = cust["c_nationkey"].to_pylist()
    cust_nation = {c: nk_to[k][0] for c, k in zip(ckeys, cnk)}
    cust_region = {c: nk_to[k][1] for c, k in zip(ckeys, cnk)}
    ref = _ray.put((cust_nation, cust_region))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        mn, mr = _ray.get(ref)
        return (
            pd.DataFrame(
                {
                    "nation": df.o_custkey.map(mn),
                    "region": df.o_custkey.map(mr),
                    "cents": _cents(df.o_totalprice),
                }
            )
            .groupby(["region", "nation"], as_index=False)
            .agg(n=("cents", "size"), cents=("cents", "sum"))
        )

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby(["region", "nation"], as_index=False).sum()
        reg = g.groupby("region")["cents"].sum()
        g["region_cents"] = g.region.map(reg).astype("int64")
        g["share_bps"] = (
            10000 * g.cents.to_numpy().astype("int64") // g.region_cents.to_numpy()
        ).astype("int64")
        for c in ("n", "cents"):
            g[c] = g[c].astype("int64")
        return g[["region", "nation", "n", "cents", "region_cents", "share_bps"]]

    return driver_combine(ds, partial, combine)


_Q125_SQL = """
WITH g AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         COUNT(*)::BIGINT AS n,
         SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, n, cents,
       SUM(cents) OVER (PARTITION BY region)::BIGINT AS region_cents,
       ((10000 * cents) // SUM(cents) OVER (PARTITION BY region))::BIGINT AS share_bps
FROM g
"""


# -------------------------------------------------------------------- q126

def q126_cumulative_daily_revenue(sf_dir: str):
    """Running cumulative revenue by day — the chart-feed rollup: daily
    cents from one bounded partial+driver combine (day cardinality is the
    calendar, not the data), then the running total is a driver cumsum over
    those ≤O(days) cells. The window function never touches a fact row."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "day": df.o_orderdate.dt.strftime("%Y-%m-%d"),
                    "cents": _cents(df.o_totalprice),
                }
            )
            .groupby("day", as_index=False)
            .agg(n=("cents", "size"), cents=("cents", "sum"))
        )

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("day", as_index=False).sum().sort_values("day")
        g["cum_cents"] = g.cents.cumsum()
        for c in ("n", "cents", "cum_cents"):
            g[c] = g[c].astype("int64")
        return g.reset_index(drop=True)

    return driver_combine(ds, partial, combine)


_Q126_SQL = """
WITH g AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         COUNT(*)::BIGINT AS n,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS cents
  FROM orders GROUP BY 1
)
SELECT day, n, cents,
       SUM(cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_cents
FROM g
"""


# -------------------------------------------------------------------- q127

def q127_grouped_variance(sf_dir: str):
    """Exact grouped variance as integer sufficient statistics (n, Σx,
    population-variance numerator n·Σx² − (Σx)², denominator n²) — the
    q111-correlation idiom for the single-column second moment. One bounded
    partial+driver combine; int64 headroom to ~sf1 documented in q111."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = _cents(df.value).to_numpy()
        return (
            pd.DataFrame({"event_type": df.event_type, "x": x, "x2": x * x})
            .groupby("event_type", as_index=False)
            .agg(n=("x", "size"), sx=("x", "sum"), sx2=("x2", "sum"))
        )

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("event_type", as_index=False).sum()
        n = g.n.to_numpy().astype("int64")
        sx = g.sx.to_numpy().astype("int64")
        out = pd.DataFrame(
            {
                "event_type": g.event_type,
                "n": n,
                "sum_cents": sx,
                "var_num": n * g.sx2.to_numpy().astype("int64") - sx * sx,
                "var_den": n * n,
            }
        )
        for c in ("n", "sum_cents", "var_num", "var_den"):
            out[c] = out[c].astype("int64")
        return out

    return driver_combine(ds, partial, combine)


_Q127_SQL = """
WITH d AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x FROM events
)
SELECT event_type, COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS sum_cents,
       (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))::BIGINT AS var_num,
       (COUNT(*) * COUNT(*))::BIGINT AS var_den
FROM d GROUP BY 1
"""


# -------------------------------------------------------------------- q128

def q128_unpivot_orders(sf_dir: str):
    """UNPIVOT / melt — the inverse of q47's pivot: each order row explodes
    to (o_orderkey, metric, value) long-form rows for the two numeric
    metrics (cents, custkey). Stateless per-batch transform: two column
    repeats + one interleave, output exactly 2× input rows, no exchange —
    the wide→long reshaping feature stores feed on."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        k = df.o_orderkey.to_numpy().astype("int64")
        vals = {
            "cents": _cents(df.o_totalprice).to_numpy(),
            "custkey": df.o_custkey.to_numpy().astype("int64"),
        }
        return pd.DataFrame(
            {
                "o_orderkey": np.concatenate([k, k]),
                "metric": np.repeat(list(vals.keys()), len(df)),
                "value": np.concatenate(list(vals.values())).astype("int64"),
            }
        )

    return ds.map_batches(melt, batch_format="pandas")


_Q128_SQL = """
SELECT o_orderkey, 'cents' AS metric,
       CAST(round(o_totalprice * 100) AS BIGINT) AS value
FROM orders
UNION ALL
SELECT o_orderkey, 'custkey', o_custkey FROM orders
"""


# -------------------------------------------------------------------- q129

def q129_exact_heavy_hitters(sf_dir: str, capacity: int = 1024):
    """EXACT top-10 most frequent tokens via the sketch-then-verify two-pass
    — the pattern that upgrades q58's approximation to a provable answer a
    SQL oracle can hash-check: (1) SpaceSaving pass (capacity 1024 counters
    per batch, KB driver merge) yields a ≤1024-item CANDIDATE set that
    provably contains every token with true count > N/capacity; (2) one
    broadcast-filtered recount pass computes exact counts of candidates
    only (plus N itself); the op then ASSERTS the guarantee condition
    (10th exact count > N/capacity) so a pathological flat distribution
    fails loudly instead of silently returning a wrong top-10."""
    import ray as _ray

    from medical_ocr_service_ray.stages.sketch import SpaceSavingSketch

    ds = _read(sf_dir, "documents", ["text"])

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        vals = df.text.astype(str).str.split(r"\s+").explode()
        vals = vals[vals.str.len() > 0]
        vc = vals.value_counts()
        sk = SpaceSavingSketch(capacity)
        sk.add_counts(vc.index.to_numpy(dtype=object), vc.to_numpy())
        return pd.DataFrame({"sketch": [sk.serialize()]})

    partials = ds.map_batches(sketch_batch, batch_format="pandas").take_all()
    merged = SpaceSavingSketch(capacity)
    for row in partials:
        merged = merged.merge(SpaceSavingSketch.deserialize(row["sketch"]))
    cand = set(merged.counts.keys())
    cand_ref = _ray.put(cand)

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        cs = _ray.get(cand_ref)
        vals = df.text.astype(str).str.split(r"\s+").explode()
        vals = vals[vals.str.len() > 0]
        n = len(vals)
        vc = vals[vals.isin(cs)].value_counts()
        out = vc.rename_axis("token").reset_index(name="cnt")
        return pd.concat(
            [out, pd.DataFrame({"token": ["\x00total"], "cnt": [n]})], ignore_index=True
        )

    counts = driver_combine(
        ds, recount, lambda df: df.groupby("token", as_index=False)["cnt"].sum()
    )
    total = int(counts[counts.token == "\x00total"].cnt.iloc[0])
    exact = counts[counts.token != "\x00total"].sort_values(
        ["cnt", "token"], ascending=[False, True]
    )
    top = exact.head(10).reset_index(drop=True)
    if not (int(top.cnt.iloc[-1]) * capacity > total):
        raise AssertionError(
            "SpaceSaving candidate guarantee not met: raise `capacity`"
        )
    top["cnt"] = top.cnt.astype("int64")
    return top[["token", "cnt"]]


_Q129_SQL = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents
)
SELECT token, COUNT(*)::BIGINT AS cnt
FROM toks WHERE token <> ''
GROUP BY 1
ORDER BY cnt DESC, token
LIMIT 10
"""


# -------------------------------------------------------------------- q130

def q130_bucket_checksum_diff(sf_dir: str):
    """Partition-level sync diff — find WHICH key-buckets differ between two
    table versions without ever comparing rows (the anti-entropy /
    incremental-replication primitive; q96's order-independent wrapping
    polynomial, grouped by hash bucket). The second version is derived
    deterministically (orders minus the row o_orderkey = 42) so the oracle
    sees both sides; exactly bucket 42 % 64 must differ. One streaming
    pass computes BOTH versions' 64 bucket checksums (the filtered sum is
    the full sum minus the excluded rows' contribution — no second scan)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    NB = 64
    M = np.int64(-7046029254386353131)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df.o_orderkey.to_numpy().astype("int64")
        c = df.o_custkey.to_numpy().astype("int64")
        with np.errstate(over="ignore"):
            row = k * M + c
        b = (k % NB).astype("int64")
        d = pd.DataFrame({"b": b, "chk": row, "excl": (k == 42)})
        with np.errstate(over="ignore"):
            full = d.groupby("b")["chk"].sum()
            exc = d[d.excl].groupby("b")["chk"].sum()
        out = full.rename("chk_full").reset_index()
        # reindex keeps int64 end-to-end: a map+fillna roundtrip promotes to
        # float64 and silently loses the checksum's low bits (>2^53)
        out["chk_excl"] = exc.reindex(out.b, fill_value=0).to_numpy(dtype="int64")
        out["n"] = d.groupby("b").size().to_numpy().astype("int64")
        out["n_excl"] = (
            d[d.excl].groupby("b").size().reindex(out.b, fill_value=0)
            .to_numpy(dtype="int64")
        )
        return out

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            g = p.groupby("b", as_index=False).agg(
                chk_full=("chk_full", "sum"), chk_excl=("chk_excl", "sum"),
                n=("n", "sum"), n_excl=("n_excl", "sum"),
            )
            g["chk_v2"] = (g.chk_full.to_numpy().astype("int64")
                           - g.chk_excl.to_numpy().astype("int64"))
        g["differs"] = (g.chk_full != g.chk_v2).astype("int64")
        out = pd.DataFrame(
            {
                "bucket": g.b.astype("int64"),
                "n_v1": g.n.astype("int64"),
                "n_v2": (g.n - g.n_excl).astype("int64"),
                "chk_v1": g.chk_full.astype("int64"),
                "chk_v2": g.chk_v2.astype("int64"),
                "differs": g.differs,
            }
        )
        return out.sort_values("bucket").reset_index(drop=True)

    return driver_combine(ds, partial, combine)


def _q130_sql() -> str:
    """Grouped version of the q96 32-bit-split wrapping checksum: one
    mulmod64 term (o_orderkey · M) plus o_custkey, summed mod 2^64 per
    bucket for both versions, signed representative restored."""
    m_u = (-7046029254386353131) % (1 << 64)
    k1, k0 = m_u >> 32, m_u & 0xFFFFFFFF
    w = "18446744073709551616::HUGEINT"
    b32 = "4294967296::HUGEINT"
    a = f"(((o_orderkey)::HUGEINT % {w}) + {w}) % {w}"
    a0 = f"(({a}) % {b32})"
    a1 = f"(({a}) // {b32})"
    mul = (
        f"(({a0} * {k0}::HUGEINT"
        f" + (({a1} * {k0}::HUGEINT + {a0} * {k1}::HUGEINT) % {b32}) * {b32}) % {w})"
    )
    cu = f"(((o_custkey)::HUGEINT % {w}) + {w}) % {w}"
    row = f"(({mul} + {cu}) % {w})"

    def sgn(expr: str) -> str:
        return (
            f"(CASE WHEN {expr} >= 9223372036854775808::HUGEINT "
            f"THEN {expr} - {w} ELSE {expr} END)::BIGINT"
        )

    return f"""
WITH r AS (
  SELECT o_orderkey % 64 AS bucket, o_orderkey, {row} AS rowchk FROM orders
), v1 AS (
  SELECT bucket, SUM(rowchk) % {w} AS s, COUNT(*) AS n FROM r GROUP BY 1
), v2 AS (
  SELECT bucket, SUM(rowchk) % {w} AS s, COUNT(*) AS n FROM r
  WHERE o_orderkey <> 42 GROUP BY 1
)
SELECT v1.bucket::BIGINT AS bucket, v1.n::BIGINT AS n_v1, v2.n::BIGINT AS n_v2,
       {sgn("v1.s")} AS chk_v1,
       {sgn("v2.s")} AS chk_v2,
       (CASE WHEN v1.s <> v2.s THEN 1 ELSE 0 END)::BIGINT AS differs
FROM v1 JOIN v2 USING (bucket)
"""


# -------------------------------------------------------------------- q131

def q131_first_touch_attribution(sf_dir: str):
    """First-touch attribution — the EARLIEST click inside the inclusive
    [ts−7d, ts] window (q113 credits the latest; marketing reads both).
    Same one-exchange shape as q114: per bucket, clicks lexsort by
    (dense-user·SPAN + ts, event_id) so the leftmost searchsorted hit IS
    the earliest click with ties broken to the smallest event_id; -1
    sentinels when the window is empty."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    W_US = np.int64(7 * 86400_000_000)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.event_type.isin(["click", "purchase"])]
        empty = pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "click_id": pd.Series(dtype="int64"),
                "gap_us": pd.Series(dtype="int64"),
            }
        )
        if not len(df):
            return empty
        ts_us = df.ts.to_numpy().astype("datetime64[us]").astype("int64")
        t0 = ts_us.min()
        uid = df.user_id.to_numpy()
        dense = pd.factorize(uid, sort=True)[0].astype("int64")
        SPAN = np.int64(ts_us.max() - t0 + W_US + 2)
        key = dense * SPAN + (ts_us - t0)
        eid = df.event_id.to_numpy().astype("int64")
        is_c = (df.event_type == "click").to_numpy()
        order = np.lexsort((eid[is_c], key[is_c]))
        ckeys = key[is_c][order]
        cids = eid[is_c][order]
        cts = ts_us[is_c][order]
        p = ~is_c
        if not p.any():
            return empty
        if not is_c.any():
            # purchases but zero clicks in this bucket: every window is empty
            return pd.DataFrame(
                {
                    "event_id": eid[p],
                    "user_id": uid[p].astype("int64"),
                    "click_id": np.full(int(p.sum()), -1, dtype="int64"),
                    "gap_us": np.full(int(p.sum()), -1, dtype="int64"),
                }
            )
        lo = np.searchsorted(ckeys, key[p] - W_US, side="left")
        hi = np.searchsorted(ckeys, key[p], side="right")
        hit = lo < hi
        safe = np.minimum(lo, len(ckeys) - 1)
        click_id = np.where(hit, cids[safe], -1).astype("int64")
        gap = np.where(hit, ts_us[p] - cts[safe], -1).astype("int64")
        return pd.DataFrame(
            {
                "event_id": eid[p],
                "user_id": uid[p].astype("int64"),
                "click_id": click_id,
                "gap_us": gap,
            }
        )

    return bucketed_combine(ds, "user_id", combine)


_Q131_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.event_id AS pe, p.user_id, p.ts AS pts, c.event_id AS ce, c.ts AS cts
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id
   AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 604800000000
), f1 AS (
  SELECT pe, user_id, pts, MIN(cts) AS fts FROM j GROUP BY 1, 2, 3
)
SELECT f1.pe AS event_id, f1.user_id,
       COALESCE(MIN(j.ce) FILTER (WHERE j.cts = f1.fts), -1)::BIGINT AS click_id,
       COALESCE(MIN(CASE WHEN j.cts = f1.fts
                         THEN epoch_us(f1.pts) - epoch_us(j.cts) END), -1)::BIGINT AS gap_us
FROM f1 LEFT JOIN j ON j.pe = f1.pe
GROUP BY 1, 2
"""
