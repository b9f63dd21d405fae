"""cohorts, drift, BPE, ANN eval, entity resolution (q132-q150) — split from pipelines/queries.py (r5), no behavior change."""

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
    pa,
    partial_then_combine,
    pd,
)
from medical_ocr_service_ray.pipelines.queries_core import (
    _day_index,
    _emb_dataset,
    _emb_query_table,
    _q30_sql,
    _session_key,
    q30_dedup_clusters,
)
from medical_ocr_service_ray.pipelines.queries_text import _kmeans_cte_chain
from medical_ocr_service_ray.pipelines.queries_joins import q77_name_editdist_pairs




# -------------------------------------------------------------------- q132

def q132_retention_cohorts(sf_dir: str):
    """SIGNUP-ANCHORED retention cohort matrix — q80's first-activity
    cohorts with the anchor moved to a specific event type (the classic
    product-analytics definition): cohort = week of FIRST signup, users
    without a signup drop (anchored inner join — the path q80 never takes),
    cell (cohort_week, week_offset) = distinct cohort users active that
    week. Same one-user-keyed-exchange shape as q80: users are partitioned
    by the bucket hash, so per-bucket distinct-user cell counts SUM
    exactly; the driver sees O(weeks²) cells. Week index =
    days-since-2024-01-01 // 7 (nested floor divisions agree with SQL's
    single floor by 7 days for nonnegative spans)."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        day = _day_index(df.ts)
        d = pd.DataFrame(
            {
                "user_id": df.user_id.to_numpy(),
                "week": day // 7,
                "is_signup": (df.event_type == "signup").to_numpy(),
            }
        )
        su = d[d.is_signup].groupby("user_id")["week"].min().rename("cohort_week")
        act = d[["user_id", "week"]].drop_duplicates()
        m = act.merge(su, on="user_id")  # inner: only users with a signup
        m = m[m.week >= m.cohort_week]
        m["week_offset"] = m.week - m.cohort_week
        return m.groupby(["cohort_week", "week_offset"], as_index=False).agg(
            n_users=("user_id", "nunique")
        )

    cells = bucketed_combine(ds, "user_id", combine).to_pandas()
    out = cells.groupby(["cohort_week", "week_offset"], as_index=False)["n_users"].sum()
    return (
        out.sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
        .astype("int64")
    )


_Q132_SQL = """
WITH w AS (
  SELECT user_id, event_type,
         CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01') / 604800000000.0) AS BIGINT) AS week
  FROM events
), su AS (
  SELECT user_id, MIN(week) AS cohort_week FROM w WHERE event_type = 'signup' GROUP BY 1
), act AS (
  SELECT DISTINCT user_id, week FROM w
)
SELECT su.cohort_week, act.week - su.cohort_week AS week_offset,
       COUNT(DISTINCT act.user_id)::BIGINT AS n_users
FROM act JOIN su USING (user_id)
WHERE act.week >= su.cohort_week
GROUP BY 1, 2
"""


# -------------------------------------------------------------------- q133

def q133_time_weighted_avg(sf_dir: str):
    """Per-user TIME-WEIGHTED average of `value`: each event's value is
    held until the user's next event; weighted mean over the observed span
    in EXACT integer arithmetic (cents × µs summed, floor-divided by the
    span — Σgap == span bounds the int64 products). Users with <2 events
    drop (zero span). One user-keyed exchange; mirrors SQL lead() windows
    bit-for-bit. cents ≥ 0 on this data, so DuckDB's truncating `//`
    agrees with numpy's floor `//` (asserted in the combine)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df.user_id.to_numpy()
        ts = df.ts.to_numpy().astype("datetime64[us]").astype("int64")
        cents = _cents(df.value).to_numpy()
        assert (cents >= 0).all(), "negative cents: SQL // would diverge"
        nxt_same = np.r_[uid[1:] == uid[:-1], False]
        gap = np.where(nxt_same, np.r_[ts[1:], 0] - ts, 0).astype("int64")
        w = pd.DataFrame({"user_id": uid, "wsum": cents * gap, "span": gap})
        g = w.groupby("user_id", as_index=False).sum()
        g = g[g.span > 0]
        return pd.DataFrame(
            {
                "user_id": g.user_id.astype("int64"),
                "twa_cents": (g.wsum // g.span).astype("int64"),
            }
        )

    return (
        bucketed_combine(ds, "user_id", combine)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


_Q133_SQL = """
WITH e AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2
  FROM events
), g AS (
  SELECT user_id, SUM(cents * (t2 - t)) AS wsum, SUM(t2 - t) AS span
  FROM e WHERE t2 IS NOT NULL GROUP BY 1
)
SELECT user_id, CAST(wsum // span AS BIGINT) AS twa_cents
FROM g WHERE span > 0
"""


# -------------------------------------------------------------------- q134

def q134_quantity_mad(sf_dir: str):
    """Exact median + MAD (median absolute deviation — the robust-stats
    pair) of l_quantity ×100. ONE bounded exchange: the quantity domain is
    discrete, so per-batch value-count partials collapse to a driver-side
    histogram of O(distinct values); the MAD histogram is a pure driver
    transform of the same histogram (|v−median| re-binning), no second
    scan. Rank rule = the engine's integer percentile_disc (first value
    with cum ≥ ceil(n/2) = (n+1)//2), mirrored literally in SQL cumulative
    windows."""
    ds = _read(sf_dir, "lineitem", ["l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"v": _cents(df.l_quantity)})
            .groupby("v", as_index=False)
            .size()
        )

    hist = driver_combine(
        ds, partial, lambda df: df.groupby("v", as_index=False)["size"].sum()
    ).sort_values("v")

    def disc_median(vals: np.ndarray, counts: np.ndarray) -> int:
        cum = counts.cumsum()
        n = int(cum[-1])
        return int(vals[np.searchsorted(cum, (n + 1) // 2, side="left")])

    v = hist.v.to_numpy()
    c = hist["size"].to_numpy().astype("int64")
    med = disc_median(v, c)
    dev = pd.DataFrame({"dv": np.abs(v - med), "c": c}).groupby("dv", as_index=False)["c"].sum()
    mad = disc_median(dev.dv.to_numpy(), dev.c.to_numpy().astype("int64"))
    return pd.DataFrame({"median_x100": [med], "mad_x100": [mad]}).astype("int64")


_Q134_SQL = """
WITH h AS (
  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS v, COUNT(*)::BIGINT AS c
  FROM lineitem GROUP BY 1
), n AS (SELECT SUM(c) AS n FROM h),
med AS (
  SELECT MIN(v) AS m FROM (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM h), n
  WHERE cum >= (n + 1) // 2
), d AS (
  SELECT abs(v - (SELECT m FROM med)) AS dv, SUM(c) AS c FROM h GROUP BY 1
), mad AS (
  SELECT MIN(dv) AS m FROM (SELECT dv, SUM(c) OVER (ORDER BY dv) AS cum FROM d), n
  WHERE cum >= (n + 1) // 2
)
SELECT (SELECT m FROM med)::BIGINT AS median_x100, (SELECT m FROM mad)::BIGINT AS mad_x100
"""


# -------------------------------------------------------------------- q135

def q135_dense_event_grid(sf_dir: str):
    """GLOBAL dense (day × event_type) grid over HIGH-VALUE events
    (value > 250, sparse by construction) with ZERO-FILLED empty cells —
    the cross-product complement of q89's per-user span densification: the
    grid axes here come from global bounds × a categorical domain, not
    per-key spans, and the measure is a filtered subset so empty cells are
    real. Two tiny
    driver_combines (bounded outputs): pass A derives the grid bounds
    (min/max day + type domain) from the FULL data, pass B aggregates the
    filtered cells; the dense reindex + zero fill happens on the
    O(days × types) driver frame."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    day_of = _day_index

    def bounds_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:  # zero-row block: contribute nothing to the bounds
            return pd.DataFrame(
                {
                    "lo": pd.Series(dtype="int64"),
                    "hi": pd.Series(dtype="int64"),
                    "event_type": pd.Series(dtype="object"),
                }
            )
        day = day_of(df.ts)
        types = df.event_type.unique()
        return pd.DataFrame(
            {
                "lo": int(day.min()),
                "hi": int(day.max()),
                "event_type": types,
            }
        )

    b = driver_combine(
        ds,
        bounds_partial,
        lambda df: pd.DataFrame(
            {
                "lo": [int(df.lo.min())],
                "hi": [int(df.hi.max())],
                "types": [sorted(df.event_type.unique())],
            }
        ),
    )
    lo, hi, types = int(b.lo[0]), int(b.hi[0]), list(b.types[0])

    def cells_partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df.value > 250.0]
        if sub.empty:
            return pd.DataFrame(
                {
                    "day": pd.Series(dtype="int64"),
                    "event_type": pd.Series(dtype="object"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        return (
            pd.DataFrame({"day": day_of(sub.ts), "event_type": sub.event_type})
            .groupby(["day", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    cells = driver_combine(
        ds,
        cells_partial,
        lambda df: df.groupby(["day", "event_type"], as_index=False)["n"].sum(),
    )
    grid = (
        cells.set_index(["day", "event_type"])
        .reindex(
            pd.MultiIndex.from_product(
                [range(lo, hi + 1), types], names=["day", "event_type"]
            ),
            fill_value=0,
        )
        .reset_index()
    )
    grid["n"] = grid.n.astype("int64")
    grid["day"] = grid.day.astype("int64")
    return grid


_Q135_SQL = """
WITH f AS (
  SELECT CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01') / 86400000000.0) AS BIGINT) AS day,
         event_type, value
  FROM events
), bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM f),
days AS (
  SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT) AS day FROM bounds
), types AS (SELECT DISTINCT event_type FROM events),
agg AS (
  SELECT day, event_type, COUNT(*)::BIGINT AS n FROM f WHERE value > 250.0 GROUP BY 1, 2
)
SELECT d.day, t.event_type, COALESCE(a.n, 0)::BIGINT AS n
FROM days d CROSS JOIN types t
LEFT JOIN agg a ON a.day = d.day AND a.event_type = t.event_type
"""


# -------------------------------------------------------------------- q136

def _equidepth_boundaries(
    ds: "rd.Dataset",
    values_of,
    n_bins: int,
    pshift: int,
    num_buckets: int = 16,
) -> np.ndarray:
    """Exact equi-depth boundary values over an int64-valued column with
    O(n_bins) driver/broadcast state (the q103 rule): boundary b_r =
    smallest value with cum ≥ ceil(r·n/n_bins)+1, duplicates KEPT. The
    value histogram is collected per PREFIX (value >> pshift — size the
    shift so prefixes ≤ 2^16 by key-space width) and only needle prefixes
    ship their per-value counts. ``values_of(df) -> np.ndarray[int64]``.
    Shared by q136 (feature binning) and q140 (drift monitoring)."""

    def pfx_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"pfx": values_of(df) >> pshift})
            .groupby("pfx", as_index=False)
            .size()
        )

    hist = driver_combine(
        ds, pfx_partial, lambda df: df.groupby("pfx", as_index=False)["size"].sum()
    ).sort_values("pfx")
    pc_ = hist["size"].to_numpy().astype("int64")
    total = int(pc_.sum())
    pcum = pc_.cumsum()
    threshes = [
        -((-r * total) // n_bins) + 1
        for r in range(1, n_bins)
        if -((-r * total) // n_bins) + 1 <= total
    ]
    needles: dict[int, list[int]] = {}
    pfx_vals = hist.pfx.to_numpy()
    for t in threshes:
        i = int(np.searchsorted(pcum, t, side="left"))
        needles.setdefault(int(pfx_vals[i]), []).append(t - (int(pcum[i - 1]) if i else 0))
    needle_set = np.array(sorted(needles), dtype="int64")

    def bnd_partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = values_of(df)
        sub = vals[np.isin(vals >> pshift, needle_set)]
        out = pd.DataFrame({"v": sub}).groupby("v", as_index=False).size()
        out["pfx"] = out.v.to_numpy() >> pshift
        return out

    def bnd_combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pfx, sub in df.groupby("pfx"):
            sub = sub.groupby("v", as_index=False)["size"].sum().sort_values("v")
            cc = sub["size"].cumsum().to_numpy()
            vv = sub.v.to_numpy()
            for local in needles[int(pfx)]:
                rows.append(vv[int(np.searchsorted(cc, local, side="left"))])
        return pd.DataFrame({"b": pd.Series(rows, dtype="int64")})

    return np.sort(
        partial_then_combine(ds, bnd_partial, "pfx", bnd_combine, num_buckets=num_buckets)
        .to_pandas()
        .b.to_numpy()
        .astype("int64")
    )


def q136_equidepth_price_bins(sf_dir: str):
    """16 EQUI-DEPTH bins over l_extendedprice cents + per-bin stats — ML
    feature binning with exact integer boundaries, the q103 boundary rule
    generalized to a plain column: boundary b_r = smallest value with
    cum ≥ ceil(r·n/16)+1 (duplicates kept — a heavy value spanning depths
    counts multiply), bin = #boundaries ≤ value via searchsorted. Driver /
    broadcast state is O(n_bins); the value histogram is collected per
    PREFIX (cents>>8, ≤2^16 cells by key-space width) and only needle
    prefixes ship their full per-value counts."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    n_bins = 16

    def cents_of(df: pd.DataFrame) -> np.ndarray:
        return _cents(df.l_extendedprice).to_numpy()

    boundaries = _equidepth_boundaries(ds, cents_of, n_bins, pshift=8)

    def bin_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = cents_of(df)
        b = np.searchsorted(boundaries, cents, side="right").astype("int64")
        return (
            pd.DataFrame({"bin": b, "cents": cents})
            .groupby("bin", as_index=False)
            .agg(
                p_n=("cents", "size"),
                p_sum=("cents", "sum"),
                p_min=("cents", "min"),
                p_max=("cents", "max"),
            )
        )

    out = driver_combine(
        ds,
        bin_partial,
        lambda df: df.groupby("bin", as_index=False).agg(
            n=("p_n", "sum"),
            sum_cents=("p_sum", "sum"),
            min_cents=("p_min", "min"),
            max_cents=("p_max", "max"),
        ),
    )
    return out.sort_values("bin").reset_index(drop=True).astype("int64")


_Q136_SQL = """
WITH v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
), h AS (SELECT cents, COUNT(*)::BIGINT AS c FROM v GROUP BY 1),
cum AS (SELECT cents, SUM(c) OVER (ORDER BY cents) AS cum FROM h),
n AS (SELECT SUM(c) AS n FROM h),
t AS (
  SELECT r, (r * (SELECT n FROM n) + 15) // 16 + 1 AS thresh
  FROM (SELECT CAST(range AS BIGINT) AS r FROM range(1, 16))
  WHERE (r * (SELECT n FROM n) + 15) // 16 + 1 <= (SELECT n FROM n)
), b AS (
  SELECT t.r, MIN(cum.cents) AS bval FROM cum, t WHERE cum.cum >= t.thresh GROUP BY t.r
), assign AS (
  SELECT cents, (SELECT COUNT(*) FROM b WHERE b.bval <= v.cents) AS bin FROM v
)
SELECT bin, COUNT(*)::BIGINT AS n, SUM(cents)::BIGINT AS sum_cents,
       MIN(cents)::BIGINT AS min_cents, MAX(cents)::BIGINT AS max_cents
FROM assign GROUP BY 1
"""


# -------------------------------------------------------------------- q137

def q137_boilerplate_grams(sf_dir: str):
    """C4-style boilerplate detection: a word-5-gram occurring in more than
    10 DISTINCT documents is boilerplate; per doc report distinct grams and
    how many are boilerplate (the removal set). TWO exchanges: distinct
    (doc, gram) pairs bucket on gram — each bucket counts gram doc-frequency
    AND flags its own pairs in one task — then per-doc partials sum in a
    doc-keyed combine. Gram STRINGS are exchanged for oracle exactness at
    bench scale; at 100 TB swap in the 62-bit Horner gram hash (q13's
    machinery) — counts identical modulo hash collisions."""
    from medical_ocr_service_ray.functions.hashing import tokens

    K_DOCS = 10
    G = 5
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, grams = [], []
        for doc_id, text in zip(df.doc_id, df.text):
            tk = tokens(text or "")
            gs = {
                " ".join(tk[i : i + G]) for i in range(len(tk) - G + 1)
            }
            doc_ids.extend([doc_id] * len(gs))
            grams.extend(gs)
        return pd.DataFrame({"g": grams, "doc_id": pd.array(doc_ids, dtype="int64")})

    def per_gram_bucket(df: pd.DataFrame) -> pd.DataFrame:
        nd = df.groupby("g")["doc_id"].nunique()
        boiler = df.g.map(nd > K_DOCS).to_numpy()
        out = pd.DataFrame(
            {"doc_id": df.doc_id, "b": boiler.astype("int64"), "one": np.int64(1)}
        )
        return out.groupby("doc_id", as_index=False).agg(
            p_n=("one", "sum"), p_b=("b", "sum")
        )

    partials = partial_then_combine(ds, pairs, "g", per_gram_bucket, num_buckets=16)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).agg(
            n_grams=("p_n", "sum"), n_boiler=("p_b", "sum")
        )
        return g.astype("int64")

    return (
        bucketed_combine(partials, "doc_id", per_doc, num_buckets=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


_Q137_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\p{L}\p{N}_]+') AS tk
  FROM documents
), grams AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(tk) < 5 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(range(1, len(tk) - 3),
              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4])
    END) AS g
  FROM toks
), freq AS (
  SELECT g, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY 1
)
SELECT doc_id, COUNT(*)::BIGINT AS n_grams,
       SUM(CASE WHEN f.nd > 10 THEN 1 ELSE 0 END)::BIGINT AS n_boiler
FROM grams JOIN freq f USING (g)
GROUP BY 1
"""


# -------------------------------------------------------------------- q138

def q138_negative_sampling(sf_dir: str):
    """Deterministic negative sampling for contrastive training: each doc
    gets 2 pseudo-random negatives via modular hash arithmetic over the
    dense id space (partition-invariant, no RNG state — the q35/q63
    sampling-family convention); self-collisions step to the next id. One
    stateless vectorized map; n comes from parquet metadata (count), no
    scan. Asserts the dense-id precondition (count == max+1)."""
    docs = _read(sf_dir, "documents", ["doc_id"])
    n = docs.count()
    A, B, C = 2654435761, 40503, 12345
    mx = docs.max("doc_id")
    if n != mx + 1:
        raise ValueError(f"doc_id space not dense: n={n} max={mx}")

    def sample(t: pa.Table) -> pa.Table:
        # uint64 WRAPPING multiply (doc_id*A overflows int64 past ~3.5e9
        # docs) — the SQL mirrors the wrap with HUGEINT % 2^64, the q13
        # idiom, so both sides agree at any scale instead of one silently
        # wrapping while the other raises
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
        du = d.view(np.uint64)  # nonneg ids: reinterpret, wrap-safe
        out_doc, out_j, out_neg = [], [], []
        for j in (1, 2):
            with np.errstate(over="ignore"):
                raw = ((du * np.uint64(A) + np.uint64(j * B + C)) % np.uint64(n)).astype(
                    "int64"
                )
            neg = np.where(raw == d, (raw + 1) % n, raw)
            out_doc.append(d)
            out_j.append(np.full(len(d), j, dtype="int64"))
            out_neg.append(neg)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                "neg_idx": pa.array(np.concatenate(out_j), pa.int64()),
                "neg_id": pa.array(np.concatenate(out_neg), pa.int64()),
            }
        )

    return (
        docs.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values(["doc_id", "neg_idx"])
        .reset_index(drop=True)
    )


_Q138_SQL = """
WITH n AS (SELECT COUNT(*) AS n FROM documents),
j AS (SELECT CAST(unnest(generate_series(1, 2)) AS BIGINT) AS j),
raws AS (
  SELECT d.doc_id, j.j,
         CAST(((CAST(d.doc_id AS HUGEINT) * 2654435761 + j.j * 40503 + 12345)
               % 18446744073709551616) % n.n AS BIGINT) AS raw,
         n.n AS n
  FROM documents d CROSS JOIN j CROSS JOIN n
)
SELECT doc_id, j AS neg_idx,
       CASE WHEN raw = doc_id THEN (raw + 1) % n ELSE raw END AS neg_id
FROM raws
"""


# -------------------------------------------------------------------- q139

def q139_dedup_survivors(sf_dir: str):
    """The corpus AFTER near-dup dedup — what a training pipeline actually
    ships: every unclustered doc plus one representative per MinHash-LSH
    cluster (the min-label rep == cluster_id from q30's min-label
    propagation). The cluster table is small (bounded by true near-dups),
    so the drop set broadcasts and the corpus filter is one zero-copy Arrow
    pass — the corpus itself never exchanges."""
    import ray

    clusters = q30_dedup_clusters(sf_dir)
    drop = np.sort(
        clusters.loc[clusters.doc_id != clusters.cluster_id, "doc_id"].to_numpy()
    )
    ref = ray.put(drop)
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def filt(t: pa.Table) -> pa.Table:
        d = ray.get(ref)
        keep = ~np.isin(t["doc_id"].to_numpy(zero_copy_only=False), d)
        return t.filter(pa.array(keep))

    return (
        docs.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _q139_sql() -> str:
    return f"""
WITH clusters AS ({_q30_sql()})
SELECT d.doc_id, d.n_chars
FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
WHERE c.doc_id IS NULL OR c.cluster_id = d.doc_id
"""


# -------------------------------------------------------------------- q140

def q140_drift_bins(sf_dir: str):
    """Feature-drift monitoring (the PSI / population-stability workflow):
    8 equi-depth bins are derived from the REFERENCE period's value
    distribution (events days 0-14, the q136/_equidepth_boundaries rule),
    then BOTH periods are stamped against those frozen boundaries and
    counted per bin — (bin, n_ref, n_cur) integer cells from which PSI /
    KL are driver-side float ratios (integers hash-compare exactly, the
    float score wouldn't). One boundary derivation over the ref slice +
    one counting pass over the full table; O(n_bins) broadcast state."""
    ds = _read(sf_dir, "events", ["ts", "value"])
    SPLIT_DAY = 15
    n_bins = 8

    def ref_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[_day_index(df.ts) < SPLIT_DAY]

    def cents_of(df: pd.DataFrame) -> np.ndarray:
        return _cents(df.value).to_numpy()

    boundaries = _equidepth_boundaries(
        ds.map_batches(ref_only, batch_format="pandas"),
        cents_of,
        n_bins,
        pshift=0,  # value cents ≤ ~49k < 2^16: the histogram IS the domain
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = np.searchsorted(boundaries, cents_of(df), side="right").astype("int64")
        is_ref = (_day_index(df.ts) < SPLIT_DAY).astype("int64")
        return (
            pd.DataFrame({"bin": b, "p_ref": is_ref, "p_cur": 1 - is_ref})
            .groupby("bin", as_index=False)
            .sum()
        )

    out = driver_combine(
        ds,
        count_partial,
        lambda df: df.groupby("bin", as_index=False)[["p_ref", "p_cur"]].sum(),
    ).rename(columns={"p_ref": "n_ref", "p_cur": "n_cur"})
    return out.sort_values("bin").reset_index(drop=True).astype("int64")


_Q140_SQL = """
WITH f AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01') / 86400000000.0) AS BIGINT) < 15 AS is_ref
  FROM events
), h AS (
  SELECT cents, COUNT(*)::BIGINT AS c FROM f WHERE is_ref GROUP BY 1
), cum AS (SELECT cents, SUM(c) OVER (ORDER BY cents) AS cum FROM h),
n AS (SELECT SUM(c) AS n FROM h),
t AS (
  SELECT r, (r * (SELECT n FROM n) + 7) // 8 + 1 AS thresh
  FROM (SELECT CAST(range AS BIGINT) AS r FROM range(1, 8))
  WHERE (r * (SELECT n FROM n) + 7) // 8 + 1 <= (SELECT n FROM n)
), b AS (
  SELECT t.r, MIN(cum.cents) AS bval FROM cum, t WHERE cum.cum >= t.thresh GROUP BY t.r
), assign AS (
  SELECT (SELECT COUNT(*) FROM b WHERE b.bval <= f.cents) AS bin, is_ref FROM f
)
SELECT bin, SUM(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT AS n_ref,
       SUM(CASE WHEN is_ref THEN 0 ELSE 1 END)::BIGINT AS n_cur
FROM assign GROUP BY 1
"""


# -------------------------------------------------------------------- q141

def q141_pit_features(sf_dir: str):
    """POINT-IN-TIME training-feature assembly (the feature-store join that
    prevents label leakage): for every purchase, the user's trailing-7-day
    click count over [ts−7d, ts) — STRICTLY before the label event — and
    lifetime prior spend (exclusive running sum). One user-keyed exchange;
    in-bucket it's the q114 composite-key searchsorted (SPAN padded past
    the window so a range query can never leak into the previous user) plus
    a per-user exclusive cumsum. Exact integer cents; mirrors SQL windows
    bit-for-bit."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    WINDOW = 7 * 86400_000_000  # µs

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.event_type.isin(["click", "purchase"])]
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        empty = pd.DataFrame(
            {
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "clicks_7d": pd.Series(dtype="int64"),
                "spend_cents_prior": pd.Series(dtype="int64"),
            }
        )
        if df.empty:
            return empty
        uid = df.user_id.to_numpy()
        ts = df.ts.to_numpy().astype("datetime64[us]").astype("int64")
        is_p = (df.event_type == "purchase").to_numpy()
        _, uinv = np.unique(uid, return_inverse=True)
        span = int(ts.max() - ts.min()) + WINDOW + 2  # window can't cross users
        comp = uinv.astype("int64") * span + (ts - int(ts.min()))
        ck = comp[~is_p]  # sorted: (user, ts) ascending => comp ascending
        p_comp = comp[is_p]
        lo = np.searchsorted(ck, p_comp - WINDOW, side="left")
        hi = np.searchsorted(ck, p_comp, side="left")  # strict <
        cents_p = _cents(df.value.iloc[is_p.nonzero()[0]]).to_numpy()
        excl = np.cumsum(cents_p) - cents_p
        up = uinv[is_p]
        first = np.flatnonzero(np.r_[True, up[1:] != up[:-1]])
        base = np.repeat(excl[first], np.diff(np.r_[first, len(up)]))
        out = pd.DataFrame(
            {
                "event_id": df.event_id.to_numpy()[is_p].astype("int64"),
                "user_id": uid[is_p].astype("int64"),
                "clicks_7d": (hi - lo).astype("int64"),
                "spend_cents_prior": (excl - base).astype("int64"),
            }
        )
        return out

    return (
        bucketed_combine(ds, "user_id", combine)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


_Q141_SQL = """
WITH e AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
), p AS (SELECT * FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM e WHERE event_type = 'click'),
spend AS (
  SELECT event_id,
         COALESCE(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sp
  FROM p
)
SELECT p.event_id, p.user_id,
       (SELECT COUNT(*) FROM c
        WHERE c.user_id = p.user_id
          AND c.ts >= p.ts - INTERVAL 7 DAY AND c.ts < p.ts)::BIGINT AS clicks_7d,
       s.sp::BIGINT AS spend_cents_prior
FROM p JOIN spend s USING (event_id)
"""


# trained merge tables are tiny (K rows) and training is deterministic per
# corpus — memoize per (sf_dir, session) so the apply-side query (q153)
# doesn't re-train; same policy as _EXTRACT_CACHE
_BPE_ROUNDS_CACHE: dict[tuple, list] = {}


def _bpe_train_rounds(sf_dir: str, K: int = 4) -> list:
    """Distributed BPE tokenizer training, K merge rounds — returns the
    merge table as [(round, left_sym, right_sym, pair_count)]. Shared by
    q142 (reports the table) and q153 (applies it to encode the corpus).

    The vocab-learn step of Sennrich-style subword tokenizers, a
    first-class training-data pipeline op. The corpus is touched ONCE: a
    word-count reduction (one
    bucketed exchange) collapses it to the distinct-word vocabulary, which
    stays a DATASET — every later pass is map_batches over vocab rows, so
    the design survives 1e8+ distinct words. Per round: adjacent symbol-pair
    counts are per-batch partials over a pair space bounded by the merged
    alphabet squared (<= (26+K)^2 cells — the ONLY thing that ever reaches
    the driver), the argmax pair (count DESC, then lexicographic) is chosen,
    and the merge is applied as a vectorized REPLACE over the
    BOUNDARY-WRAPPED form '<a><b><c>': the pattern '<l><r>' cannot consume a
    neighboring token's boundary, so left-to-right non-overlapping REPLACE
    is exactly canonical greedy-left BPE ('a a a' -> 'aa a', 'a b a b' ->
    'ab ab') — pinned against an explicit scan-merge reference by
    tests/test_bpe_semantics.py, and identical in pandas and DuckDB. (A
    naive space-padded REPLACE is NOT canonical: it eats the shared
    separator and skips disjoint adjacent occurrences.) Pair counts include
    overlaps (classic BPE: 'aaa' counts (a,a) twice)."""
    import re
    from collections import Counter

    key = (_session_key(sf_dir), K)
    hit = _BPE_ROUNDS_CACHE.get(key)
    if hit is not None:
        return hit

    ds = _read(sf_dir, "documents", ["text"])
    word_re = re.compile(r"[a-z]+")

    def word_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df.text:
            c.update(word_re.findall((t or "").lower()))
        return pd.DataFrame(
            {"w": list(c.keys()), "n": pd.array(list(c.values()), "int64")}
        )

    def word_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("w", as_index=False)["n"].sum()

    def to_syms(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"s": df.w.map(lambda w: " ".join(w)), "n": df.n.astype("int64")}
        )

    vocab = (
        partial_then_combine(ds, word_partial, "w", word_combine, num_buckets=16)
        .map_batches(to_syms, batch_format="pandas")
        .materialize()
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for s, n in zip(df.s, df.n):
            tk = s.split(" ")
            for i in range(len(tk) - 1):
                c[(tk[i], tk[i + 1])] += int(n)
        if not c:
            return pd.DataFrame(
                {
                    "l": pd.Series(dtype="string"),
                    "r": pd.Series(dtype="string"),
                    "cnt": pd.Series(dtype="int64"),
                }
            )
        ls, rs = zip(*c.keys())
        return pd.DataFrame(
            {"l": list(ls), "r": list(rs), "cnt": pd.array(list(c.values()), "int64")}
        )

    rounds = []
    for rnd in range(1, K + 1):
        cells = driver_combine(
            vocab,
            pair_partial,
            lambda df: df.groupby(["l", "r"], as_index=False)["cnt"].sum(),
        )
        if cells.empty:
            break
        best = cells.sort_values(
            ["cnt", "l", "r"], ascending=[False, True, True]
        ).iloc[0]
        left, right, cnt = str(best.l), str(best.r), int(best.cnt)
        rounds.append((rnd, left, right, cnt))
        pat, rep = f"<{left}><{right}>", f"<{left}{right}>"

        def apply_merge(df: pd.DataFrame, pat=pat, rep=rep) -> pd.DataFrame:
            wrapped = "<" + df.s.str.replace(" ", "><", regex=False) + ">"
            s2 = (
                wrapped.str.replace(pat, rep, regex=False)
                .str.replace("><", " ", regex=False)
                .str.replace("<", "", regex=False)
                .str.replace(">", "", regex=False)
            )
            return pd.DataFrame({"s": s2, "n": df.n})

        vocab = vocab.map_batches(apply_merge, batch_format="pandas").materialize()

    _BPE_ROUNDS_CACHE[key] = rounds
    return rounds


def q142_bpe_merges(sf_dir: str):
    """BPE tokenizer training report: the K=4 merge table learned by
    ``_bpe_train_rounds`` (see its docstring for the distributed plan and
    the greedy-left REPLACE semantics). One row per merge round:
    (merge_round, left_sym, right_sym, pair_count)."""
    rounds = _bpe_train_rounds(sf_dir)
    return pd.DataFrame(
        {
            "merge_round": pd.array([x[0] for x in rounds], "int64"),
            "left_sym": [x[1] for x in rounds],
            "right_sym": [x[2] for x in rounds],
            "pair_count": pd.array([x[3] for x in rounds], "int64"),
        }
    )


def _q142_sql() -> str:
    """Unrolled 4-round BPE in DuckDB: each round re-derives pair counts
    from the previous vocab CTE, picks the same (count DESC, l, r) argmax,
    and applies the same boundary-wrapped REPLACE merge (canonical
    greedy-left; see q142_bpe_merges docstring)."""
    parts = [
        r"""WITH words AS (
  SELECT w, COUNT(*)::BIGINT AS n FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
  ) GROUP BY w
), v0 AS (
  SELECT array_to_string(regexp_extract_all(w, '.'), ' ') AS s, n FROM words
)"""
    ]
    for i in range(1, 5):
        parts.append(
            f""", c{i} AS (
  SELECT string_split(pr, '|')[1] AS l, string_split(pr, '|')[2] AS r,
         SUM(n)::BIGINT AS cnt
  FROM (
    SELECT unnest(list_transform(range(1, len(tk)), j -> tk[j] || '|' || tk[j+1])) AS pr, n
    FROM (SELECT string_split(s, ' ') AS tk, n FROM v{i-1})
  )
  GROUP BY 1, 2
), b{i} AS (SELECT l, r, cnt FROM c{i} ORDER BY cnt DESC, l, r LIMIT 1)
, v{i} AS (
  SELECT replace(replace(replace(
           replace('<' || replace(s, ' ', '><') || '>',
                   (SELECT '<' || l || '><' || r || '>' FROM b{i}),
                   (SELECT '<' || l || r || '>' FROM b{i})),
           '><', ' '), '<', ''), '>', '') AS s, n
  FROM v{i-1}
)"""
        )
    parts.append(
        """
SELECT * FROM (
  SELECT 1::BIGINT AS merge_round, l AS left_sym, r AS right_sym, cnt AS pair_count FROM b1
  UNION ALL SELECT 2, l, r, cnt FROM b2
  UNION ALL SELECT 3, l, r, cnt FROM b3
  UNION ALL SELECT 4, l, r, cnt FROM b4
) ORDER BY merge_round"""
    )
    return "".join(parts)


_Q142_SQL = _q142_sql()


def q143_ann_recall_eval(sf_dir: str):
    """Retrieval-quality evaluation of the IVF index against exact search —
    the recall@k harness every ANN deployment needs. For the 8 lowest-vec_id
    query vectors: exact top-10 (integer-quantized dot, q12's kernel
    generalized to a query MATRIX) and IVF top-10 (q78's probe path,
    nprobe=2 over the k=8/2-iter quantized-Lloyd's quantizer) are computed
    in ONE corpus scan — each batch emits per-query partial top-10s for BOTH
    paths (the IVF side additionally gated on probe-cluster assignment), so
    the driver merge is blocks x 8 x 2 x 10 rows. Per query:
    (query_vec_id, n_overlap, recall_x1000). All-integer arithmetic, so the
    DuckDB oracle rebuilds quantizer, probes, both top-10 cuts, and the
    overlap bit-for-bit."""
    import ray

    from medical_ocr_service_ray.stages.ann import _stack_embeddings, probe_clusters
    from medical_ocr_service_ray.stages.kmeans import assign, kmeans_fit, quantize

    N_Q, K, NPROBE = 8, 10, 2
    ds = _emb_dataset(sf_dir)  # shared materialized memo (q12/q22/q78)
    centroids = kmeans_fit(ds, k=8, iters=2)

    emb = _emb_query_table(sf_dir)
    qdf = (
        pd.DataFrame(
            {"vec_id": emb["vec_id"].to_pandas(), "e": emb["embedding"].to_pylist()}
        )
        .sort_values("vec_id")
        .head(N_Q)
    )
    qids = qdf.vec_id.to_numpy(dtype=np.int64)
    qm = quantize(np.asarray(qdf.e.tolist(), dtype=np.float64))  # (N_Q, dim)
    probes = [probe_clusters(qm[i], centroids, NPROBE) for i in range(len(qids))]
    bundle = ray.put((centroids, qm, qids, [set(map(int, p)) for p in probes]))

    def partial(batch: pa.Table, _ref=bundle) -> pa.Table:
        cents, qmat, qv_ids, probe_sets = ray.get(_ref)
        v = quantize(_stack_embeddings(batch))
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        dots = v @ qmat.T  # (n, N_Q) int64-exact
        a = assign(v, cents)
        out_q, out_id, out_dot, out_kind = [], [], [], []
        for qi in range(len(qv_ids)):
            col = dots[:, qi]
            order = np.lexsort((ids, -col))[:K]
            out_q.extend([int(qv_ids[qi])] * len(order))
            out_id.extend(ids[order].tolist())
            out_dot.extend(col[order].tolist())
            out_kind.extend([0] * len(order))
            mask = np.isin(a, np.fromiter(probe_sets[qi], dtype=np.int64))
            mids, mdots = ids[mask], col[mask]
            morder = np.lexsort((mids, -mdots))[:K]
            out_q.extend([int(qv_ids[qi])] * len(morder))
            out_id.extend(mids[morder].tolist())
            out_dot.extend(mdots[morder].tolist())
            out_kind.extend([1] * len(morder))
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "dot_q": pa.array(out_dot, pa.int64()),
                "kind": pa.array(out_kind, pa.int64()),
            }
        )

    merged = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = merged.sort_values(
        ["qid", "kind", "dot_q", "vec_id"], ascending=[True, True, False, True]
    )
    top = merged.groupby(["qid", "kind"]).head(K)
    rows = []
    for qid in qids:
        ex = set(top[(top.qid == qid) & (top.kind == 0)].vec_id)
        iv = set(top[(top.qid == qid) & (top.kind == 1)].vec_id)
        n = len(ex & iv)
        rows.append((int(qid), n, (1000 * n) // K))
    return pd.DataFrame(
        {
            "query_vec_id": pd.array([r[0] for r in rows], "int64"),
            "n_overlap": pd.array([r[1] for r in rows], "int64"),
            "recall_x1000": pd.array([r[2] for r in rows], "int64"),
        }
    )


def _q143_sql(k: int = 8, iters: int = 2, dim: int = 64, scale: int = 1024,
              nprobe: int = 2, topk: int = 10, n_q: int = 8) -> str:
    """q78's quantizer chain, generalized to a query SET: per-query exact
    and in-probe top-k cuts, then the overlap count."""
    return (
        _kmeans_cte_chain(k, iters, dim, scale)
        + f""", qs AS (
  SELECT vec_id AS qid, v AS qv FROM q ORDER BY vec_id LIMIT {n_q}
), ex AS (
  SELECT qid, vec_id FROM (
    SELECT s.qid, t.vec_id,
           row_number() OVER (
             PARTITION BY s.qid
             ORDER BY CAST(list_inner_product(t.v, s.qv) AS BIGINT) DESC,
                      t.vec_id) AS rn
    FROM q t, qs s) WHERE rn <= {topk}
), af AS (
  SELECT vec_id, v, cluster FROM (
    SELECT q.vec_id, q.v, c.cluster,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(q.v, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM q, c{iters} c) WHERE rn = 1
), pr AS (
  SELECT qid, cluster FROM (
    SELECT s.qid, c.cluster,
           row_number() OVER (
             PARTITION BY s.qid
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(s.qv, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM qs s, c{iters} c) WHERE rn <= {nprobe}
), iv AS (
  SELECT qid, vec_id FROM (
    SELECT p.qid, a.vec_id,
           row_number() OVER (
             PARTITION BY p.qid
             ORDER BY CAST(list_inner_product(a.v, s.qv) AS BIGINT) DESC,
                      a.vec_id) AS rn
    FROM af a JOIN pr p ON a.cluster = p.cluster
              JOIN qs s ON s.qid = p.qid) WHERE rn <= {topk}
)
SELECT e.qid AS query_vec_id,
       COUNT(i.vec_id)::BIGINT AS n_overlap,
       ((1000 * COUNT(i.vec_id)) // {topk})::BIGINT AS recall_x1000
FROM ex e LEFT JOIN iv i ON e.qid = i.qid AND e.vec_id = i.vec_id
GROUP BY e.qid ORDER BY e.qid
"""
    )


_Q143_SQL = _q143_sql()


def q144_user_day_paths(sf_dir: str):
    """Ordered-aggregation journey strings: per (user, day) the time-ordered
    event-type path ('view>click>purchase') plus its length — session-path
    mining for funnel/behavior-model training data. ONE user-keyed exchange;
    the in-bucket combine sorts its own rows (user_id, day, ts, event_id —
    the deterministic total order) and string-joins per group. Per-group
    ordering never needs a global sort: a user's rows land in one bucket.
    Mirrors SQL string_agg(... ORDER BY) bit-for-bit."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.assign(day=df.ts.dt.strftime("%Y-%m-%d")).sort_values(
            ["user_id", "day", "ts", "event_id"]
        )
        g = d.groupby(["user_id", "day"], as_index=False).agg(
            path=("event_type", ">".join), n_events=("event_id", "size")
        )
        g["n_events"] = g.n_events.astype("int64")
        return g

    # returned as a Dataset: user-day cardinality is unbounded at scale, so
    # the result must never require a driver pull (harnesses sort themselves)
    return bucketed_combine(ds, "user_id", per_bucket, num_buckets=16)


_Q144_SQL = """
SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
       COUNT(*)::BIGINT AS n_events
FROM events
GROUP BY user_id, day
ORDER BY user_id, day
"""


def q145_embedding_dim_stats(sf_dir: str):
    """Per-DIMENSION standardization statistics over the embedding column —
    the stats pass of feature scaling (z-score): exact integer sufficient
    statistics (n, sum, n*sumsq - sum^2) per dimension from ONE streaming
    pass with a vectorized axis-0 reduction per batch (no exchange at all:
    the driver combines blocks x 64 cells). The stamp pass this feeds is a
    broadcast map_batches; int64 is safe while n * (scale^2 * n) < 2^63 —
    beyond ~1e8 rows promote the variance numerator to 128-bit (the SQL
    twin's HUGEINT). Quantization = stages/kmeans.quantize (floor(x*1024
    + 0.5)), so the oracle is bit-exact."""
    from medical_ocr_service_ray.stages.ann import _stack_embeddings
    from medical_ocr_service_ray.stages.kmeans import quantize

    ds = _emb_dataset(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        v = quantize(_stack_embeddings(batch))
        return pa.table(
            {
                "dim_idx": pa.array(np.arange(1, v.shape[1] + 1), pa.int64()),
                "n": pa.array(np.full(v.shape[1], v.shape[0]), pa.int64()),
                "s": pa.array(v.sum(axis=0), pa.int64()),
                "ss": pa.array((v * v).sum(axis=0), pa.int64()),
            }
        )

    cells = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = cells.groupby("dim_idx", as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum")
    )
    return pd.DataFrame(
        {
            "dim_idx": g.dim_idx.astype("int64"),
            "n": g.n.astype("int64"),
            "sum_q": g.s.astype("int64"),
            "var_num": (g.n * g.ss - g.s * g.s).astype("int64"),
        }
    ).sort_values("dim_idx").reset_index(drop=True)


_Q145_SQL = """
WITH q AS (
  SELECT list_transform(embedding, x -> CAST(floor(x * 1024 + 0.5) AS BIGINT)) AS v
  FROM embeddings
)
SELECT t.i::BIGINT AS dim_idx, COUNT(*)::BIGINT AS n, SUM(v[t.i])::BIGINT AS sum_q,
       (COUNT(*) * SUM(v[t.i] * v[t.i]) - SUM(v[t.i]) * SUM(v[t.i]))::BIGINT AS var_num
FROM q, UNNEST(generate_series(1, 64)) AS t(i)
GROUP BY t.i ORDER BY dim_idx
"""


def q146_collocation_lift(sf_dir: str):
    """Collocation / phrase-candidate mining (the word2vec-phrases step of a
    corpus pipeline): top-20 token pairs by integer LIFT = N * n_ab /
    (n_a * n_b), restricted to the top-64 vocabulary by document frequency
    so the pair space is bounded (<= 2016 cells). Pass 1: doc-frequency
    counts via one token-keyed exchange, per-bucket top-64 partials, tiny
    driver merge. Pass 2: vocab broadcast; each batch intersects its docs
    with the vocab and emits co-occurrence cells (Counter over <= 2016
    keys) — the pair count combine is driver-side over blocks x cells.
    lift_x1e6 = (1e6 * n_ab * N) // (n_a * n_b), all BIGINT-exact."""
    import re
    from itertools import combinations

    import ray

    V, TOPN = 64, 20
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    word_re = re.compile(r"[a-z]+")

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in df.text:
            c.update(set(word_re.findall((t or "").lower())))
        return pd.DataFrame(
            {"tok": list(c.keys()), "df": pd.array(list(c.values()), "int64")}
        )

    def df_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", as_index=False)["df"].sum()
        # top-(V) partial per bucket: the global top-V is within the union
        g = g.sort_values(["df", "tok"], ascending=[False, True]).head(V)
        return g

    bucketed = partial_then_combine(ds, df_partial, "tok", df_combine, num_buckets=16)
    vocab_df = (
        bucketed.to_pandas()
        .sort_values(["df", "tok"], ascending=[False, True])
        .head(V)
        .reset_index(drop=True)
    )
    n_total = _read(sf_dir, "documents", ["doc_id"]).count()
    vocab = dict(zip(vocab_df.tok, vocab_df.df.astype("int64")))
    vocab_ref = ray.put(frozenset(vocab))

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        vs = ray.get(vocab_ref)
        c: Counter = Counter()
        for t in df.text:
            present = sorted(vs & set(word_re.findall((t or "").lower())))
            c.update(combinations(present, 2))
        if not c:
            return pd.DataFrame(
                {
                    "tok_a": pd.Series(dtype="string"),
                    "tok_b": pd.Series(dtype="string"),
                    "n_ab": pd.Series(dtype="int64"),
                }
            )
        a, b = zip(*c.keys())
        return pd.DataFrame(
            {"tok_a": list(a), "tok_b": list(b), "n_ab": pd.array(list(c.values()), "int64")}
        )

    cells = driver_combine(
        ds,
        pair_partial,
        lambda df: df.groupby(["tok_a", "tok_b"], as_index=False)["n_ab"].sum(),
    )
    if cells.empty:
        return pd.DataFrame(
            {
                "tok_a": pd.Series(dtype="string"),
                "tok_b": pd.Series(dtype="string"),
                "n_ab": pd.Series(dtype="int64"),
                "n_a": pd.Series(dtype="int64"),
                "n_b": pd.Series(dtype="int64"),
                "lift_x1e6": pd.Series(dtype="int64"),
            }
        )
    cells["n_a"] = cells.tok_a.map(vocab).astype("int64")
    cells["n_b"] = cells.tok_b.map(vocab).astype("int64")
    cells["lift_x1e6"] = (
        1_000_000 * cells.n_ab * int(n_total) // (cells.n_a * cells.n_b)
    ).astype("int64")
    return (
        cells.sort_values(["lift_x1e6", "tok_a", "tok_b"], ascending=[False, True, True])
        .head(TOPN)
        .reset_index(drop=True)[["tok_a", "tok_b", "n_ab", "n_a", "n_b", "lift_x1e6"]]
    )


_Q146_SQL = r"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
), dfreq AS (
  SELECT tok, COUNT(*)::BIGINT AS df FROM toks GROUP BY tok
), vocab AS (
  SELECT tok, df FROM dfreq ORDER BY df DESC, tok LIMIT 64
), vt AS (
  SELECT t.doc_id, t.tok, v.df FROM toks t JOIN vocab v USING (tok)
), pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*)::BIGINT AS n_ab,
         ANY_VALUE(a.df)::BIGINT AS n_a, ANY_VALUE(b.df)::BIGINT AS n_b
  FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY a.tok, b.tok
), n AS (SELECT COUNT(*)::BIGINT AS n_total FROM documents)
SELECT tok_a, tok_b, n_ab, n_a, n_b,
       (1000000 * n_ab * n.n_total // (n_a * n_b))::BIGINT AS lift_x1e6
FROM pairs, n
ORDER BY lift_x1e6 DESC, tok_a, tok_b
LIMIT 20
"""


def q147_activity_streaks(sf_dir: str):
    """Gaps-and-islands: per user the number of distinct active days and the
    LONGEST run of consecutive calendar days with activity (engagement-streak
    features). Per-batch distinct (user, day) partials collapse the event
    stream before the ONE user-keyed exchange; in-bucket the island anchor is
    day - cumcount DAYS (identical arithmetic to the SQL window), so streak
    lengths are island sizes. Driver never sees per-event rows."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": df.user_id.astype("int64"), "day": df.ts.dt.normalize()}
        ).drop_duplicates()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["user_id", "day"]).sort_values(["user_id", "day"])
        rn = d.groupby("user_id").cumcount()
        d = d.assign(anchor=d.day - pd.to_timedelta(rn, unit="D"))
        isl = d.groupby(["user_id", "anchor"], as_index=False).size()
        g = isl.groupby("user_id", as_index=False).agg(
            n_active_days=("size", "sum"), longest_streak=("size", "max")
        )
        return g.astype("int64")

    # Dataset out: per-user cardinality is unbounded at scale (q47 convention)
    return partial_then_combine(ds, partial, "user_id", per_bucket, num_buckets=16)


_Q147_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), r AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS anchor
  FROM d
), isl AS (
  SELECT user_id, anchor, COUNT(*)::BIGINT AS streak FROM r GROUP BY user_id, anchor
)
SELECT user_id, SUM(streak)::BIGINT AS n_active_days,
       MAX(streak)::BIGINT AS longest_streak
FROM isl GROUP BY user_id ORDER BY user_id
"""


def q148_contamination_matrix(sf_dir: str):
    """Cross-source contamination audit: for every source pair, the count of
    shared distinct word-8-gram shingles and the integer Jaccard — the
    train/test-leakage MATRIX generalizing q66's one-directional
    decontamination. Per-batch distinct (gram, source) partials, ONE
    gram-keyed exchange; each bucket self-merges its grams (bounded x
    sources^2) into pair cells AND counts per-source distinct grams — a gram
    lives wholly in one bucket, so both sums are exact. Driver combines
    <= sources^2 + sources cells. Gram STRINGS at bench scale for oracle
    exactness; the 100-TB path swaps in the 62-bit Horner hash (q137's
    note). Zero-overlap pairs are omitted (mirrors the SQL inner join)."""
    from medical_ocr_service_ray.functions.hashing import tokens

    G = 8
    ds = _read(sf_dir, "documents", ["text", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        srcs, grams = [], []
        for src, text in zip(df.source, df.text):
            tk = tokens(text or "")
            gs = {" ".join(tk[i : i + G]) for i in range(len(tk) - G + 1)}
            srcs.extend([src] * len(gs))
            grams.extend(gs)
        return pd.DataFrame({"gram": grams, "source": srcs}).drop_duplicates()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["gram", "source"])
        per_src = d.groupby("source", as_index=False).size()
        m = d.merge(d, on="gram")
        m = m[m.source_x < m.source_y]
        pairs = m.groupby(["source_x", "source_y"], as_index=False).size()
        return pd.concat(
            [
                pd.DataFrame(
                    {
                        "src_a": pairs.source_x,
                        "src_b": pairs.source_y,
                        "cnt": pairs["size"].astype("int64"),
                        "kind": np.int64(0),
                    }
                ),
                pd.DataFrame(
                    {
                        "src_a": per_src.source,
                        "src_b": "",
                        "cnt": per_src["size"].astype("int64"),
                        "kind": np.int64(1),
                    }
                ),
            ],
            ignore_index=True,
        )

    cells = (
        partial_then_combine(ds, partial, "gram", per_bucket, num_buckets=16)
        .to_pandas()
        .groupby(["src_a", "src_b", "kind"], as_index=False)["cnt"]
        .sum()
    )
    per_src = dict(zip(cells[cells.kind == 1].src_a, cells[cells.kind == 1].cnt))
    p = cells[cells.kind == 0].copy()
    if p.empty:
        return pd.DataFrame(
            {
                "src_a": pd.Series(dtype="string"),
                "src_b": pd.Series(dtype="string"),
                "n_shared": pd.Series(dtype="int64"),
                "n_a": pd.Series(dtype="int64"),
                "n_b": pd.Series(dtype="int64"),
                "jaccard_x1e6": pd.Series(dtype="int64"),
            }
        )
    p["n_a"] = p.src_a.map(per_src).astype("int64")
    p["n_b"] = p.src_b.map(per_src).astype("int64")
    p["n_shared"] = p.cnt.astype("int64")
    p["jaccard_x1e6"] = (
        1_000_000 * p.n_shared // (p.n_a + p.n_b - p.n_shared)
    ).astype("int64")
    return (
        p.sort_values(["src_a", "src_b"])
        .reset_index(drop=True)[["src_a", "src_b", "n_shared", "n_a", "n_b", "jaccard_x1e6"]]
    )


_Q148_SQL = r"""
WITH toks AS (
  SELECT source, regexp_extract_all(lower(text), '[\p{L}\p{N}_]+') AS tk
  FROM documents
), g AS (
  SELECT DISTINCT source, unnest(
    CASE WHEN len(tk) < 8 THEN CAST([] AS VARCHAR[])
         ELSE list_transform(range(1, len(tk) - 6),
              i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
                   || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7])
    END) AS gram
  FROM toks
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*)::BIGINT AS n_shared
  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
), per AS (
  SELECT source, COUNT(*)::BIGINT AS n FROM g GROUP BY source
)
SELECT p.src_a, p.src_b, p.n_shared, pa.n AS n_a, pb.n AS n_b,
       ((1000000 * p.n_shared) // (pa.n + pb.n - p.n_shared))::BIGINT AS jaccard_x1e6
FROM pairs p JOIN per pa ON pa.source = p.src_a JOIN per pb ON pb.source = p.src_b
ORDER BY p.src_a, p.src_b
"""


def q149_entity_clusters(sf_dir: str):
    """Entity resolution end-to-end: the lev<=1 name-pair graph (q77's
    deletion-neighborhood blocking join, vectorized verify) fed into the
    task-mesh connected components (q30's machinery) — canonical entity id =
    min custkey in the component, plus entity size. A composition query: the
    fuzzy-match and clustering stages chain as Datasets with no driver
    materialization between them; only pair-connected customers appear
    (singletons are their own trivial entities, mirroring the SQL inner
    shape). Oracle: q77's cross-join filter + the q30 recursive min-label
    CTE."""
    from medical_ocr_service_ray.stages.dedup import dedup_clusters_distributed

    pairs = q77_name_editdist_pairs(sf_dir)
    renamed = pairs.map_batches(
        lambda t: t.rename_columns(["doc_a", "doc_b"]), batch_format="pyarrow"
    )
    out = dedup_clusters_distributed(renamed).to_pandas()
    return (
        pd.DataFrame(
            {
                "c_custkey": out.doc_id.astype("int64"),
                "entity_id": out.cluster_id.astype("int64"),
                "entity_size": out.cluster_size.astype("int64"),
            }
        )
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )


_Q149_SQL = """
WITH pairs AS (
  SELECT c1.c_custkey AS a_key, c2.c_custkey AS b_key
  FROM customer c1
  JOIN customer c2 ON c1.c_custkey < c2.c_custkey
  WHERE levenshtein(c1.c_name, c2.c_name) <= 1
), edges AS (
  SELECT a_key AS u, b_key AS v FROM pairs
  UNION ALL
  SELECT b_key, a_key FROM pairs
), nodes AS (
  SELECT DISTINCT u AS node FROM edges
), reach AS (
  WITH RECURSIVE r(node, lbl) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.v, r.lbl FROM r JOIN edges e ON e.u = r.node
  ) SELECT * FROM r
), comp AS (
  SELECT node AS c_custkey, MIN(lbl) AS entity_id FROM reach GROUP BY node
)
SELECT c.c_custkey::BIGINT AS c_custkey, c.entity_id::BIGINT AS entity_id,
       CAST(COUNT(*) OVER (PARTITION BY c.entity_id) AS BIGINT) AS entity_size
FROM comp c
"""


def q150_trending_tokens(sf_dir: str):
    """Per-day trending terms: the top-5 props-tokens of each events day by
    count (ties -> lexicographic) — the daily-trending feed every content
    pipeline ships. Token cardinality is unbounded, so counts reduce in ONE
    token-keyed exchange ((day, token) cells, partial per batch first);
    each bucket then emits only its per-day top-5 CANDIDATES (days are
    bounded, so bucket output is <= days x 5 rows) and the driver merges
    blocks x days x 5 rows — the global per-day top-5 is within the union
    of per-bucket top-5s because a token's global count lives wholly in its
    bucket. Returns (day, rank, token, n)."""
    import re

    K = 5
    ds = _read(sf_dir, "events", ["ts", "props"])
    word_re = re.compile(r"[a-z]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for day, props in zip(df.ts.dt.strftime("%Y-%m-%d"), df.props):
            for t in word_re.findall((props or "").lower()):
                c[(day, t)] += 1
        if not c:
            return pd.DataFrame(
                {
                    "day": pd.Series(dtype="string"),
                    "token": pd.Series(dtype="string"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        days, toks = zip(*c.keys())
        return pd.DataFrame(
            {"day": list(days), "token": list(toks), "n": pd.array(list(c.values()), "int64")}
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["day", "token"], as_index=False)["n"].sum()
        g = g.sort_values(["day", "n", "token"], ascending=[True, False, True])
        return g.groupby("day").head(K)

    cand = (
        partial_then_combine(ds, partial, "token", per_bucket, num_buckets=16)
        .to_pandas()
        .sort_values(["day", "n", "token"], ascending=[True, False, True])
    )
    top = cand.groupby("day").head(K).reset_index(drop=True)
    top["rank"] = top.groupby("day").cumcount().astype("int64") + 1
    top["n"] = top.n.astype("int64")
    return top[["day", "rank", "token", "n"]]


_Q150_SQL = r"""
WITH cells AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         unnest(regexp_extract_all(lower(props), '[a-z]+')) AS token
  FROM events
), counts AS (
  SELECT day, token, COUNT(*)::BIGINT AS n FROM cells GROUP BY day, token
), ranked AS (
  SELECT day, token, n,
         row_number() OVER (PARTITION BY day ORDER BY n DESC, token) AS rank
  FROM counts
)
SELECT day, rank::BIGINT AS rank, token, n FROM ranked WHERE rank <= 5
ORDER BY day, rank
"""


# -------------------------------------------------------------------- q175

_Q175_NSUB, _Q175_SUBD, _Q175_KC, _Q175_ITERS = 8, 8, 16, 2
_Q175_NQ, _Q175_K = 5, 10


def q175_pq_ann_recall(sf_dir: str):
    """Product-quantization ANN (Jégou et al. 2011) with a recall@10 eval
    against exact search — THE memory-compression scale path for
    100 TB-corpus similarity search (64 float dims -> 8 one-byte codes:
    the codes table is ~32x smaller than the vectors, and ADC scoring
    reads only codes + a k×sub_dim lookup table per query). Codebooks:
    an independent integer-Lloyd's fit per 8-dim subspace, all 8 trained
    in ONE streaming pass per iteration (stages/kmeans.pq_fit). Scoring:
    asymmetric distance computation — per query a (n_sub × k) int64
    LUT of subspace dots, per corpus vector est = sum of LUT entries at
    its assigned codes; exact and ADC top-10 partials ride the SAME
    corpus scan (q143's dual-partial harness), so the driver merge is
    blocks × 5 × 2 × 10 rows. All-integer arithmetic end-to-end: the
    DuckDB oracle unrolls all 8 subspace fits, re-derives every code and
    every ADC estimate bit-exactly. Output per probe query:
    (query_vec_id, n_overlap, recall_x1000)."""
    import ray

    from medical_ocr_service_ray.stages.ann import _stack_embeddings
    from medical_ocr_service_ray.stages.kmeans import assign, pq_fit, quantize

    n_sub, sub_dim, kc = _Q175_NSUB, _Q175_SUBD, _Q175_KC
    n_q, k = _Q175_NQ, _Q175_K
    ds = _emb_dataset(sf_dir)
    books = pq_fit(ds, n_sub, sub_dim, k=kc, iters=_Q175_ITERS)  # (8,16,8)

    emb = _emb_query_table(sf_dir)
    qdf = (
        pd.DataFrame(
            {"vec_id": emb["vec_id"].to_pandas(), "e": emb["embedding"].to_pylist()}
        )
        .sort_values("vec_id")
        .head(n_q)
    )
    qids = qdf.vec_id.to_numpy(dtype=np.int64)
    qm = quantize(np.asarray(qdf.e.tolist(), dtype=np.float64))  # (n_q, 64)
    # ADC lookup tables: lut[qi, m, j] = dot(query slice m, codebook m row j)
    lut = np.stack(
        [qm[:, m * sub_dim : (m + 1) * sub_dim] @ books[m].T
         for m in range(n_sub)],
        axis=1,
    )  # (n_q, n_sub, kc) int64
    bundle = ray.put((books, qm, qids, lut))

    def partial(batch: pa.Table, _ref=bundle) -> pa.Table:
        bks, qmat, qv_ids, luts = ray.get(_ref)
        v = quantize(_stack_embeddings(batch))
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        dots = v @ qmat.T  # (n, n_q) exact
        est = np.zeros((v.shape[0], len(qv_ids)), dtype=np.int64)
        for m in range(bks.shape[0]):
            codes = assign(v[:, m * sub_dim : (m + 1) * sub_dim], bks[m])
            est += luts[:, m, :][:, codes].T  # (n, n_q)
        out_q, out_id, out_dot, out_kind = [], [], [], []
        for qi in range(len(qv_ids)):
            for kind, col in ((0, dots[:, qi]), (1, est[:, qi])):
                order = np.lexsort((ids, -col))[:k]
                out_q.extend([int(qv_ids[qi])] * len(order))
                out_id.extend(ids[order].tolist())
                out_dot.extend(col[order].tolist())
                out_kind.extend([kind] * len(order))
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "dot_q": pa.array(out_dot, pa.int64()),
                "kind": pa.array(out_kind, pa.int64()),
            }
        )

    merged = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = merged.sort_values(
        ["qid", "kind", "dot_q", "vec_id"], ascending=[True, True, False, True]
    )
    top = merged.groupby(["qid", "kind"]).head(k)
    rows = []
    for qid in qids:
        ex = set(top[(top.qid == qid) & (top.kind == 0)].vec_id)
        pq_ = set(top[(top.qid == qid) & (top.kind == 1)].vec_id)
        n = len(ex & pq_)
        rows.append((int(qid), n, (1000 * n) // k))
    return pd.DataFrame(
        {
            "query_vec_id": pd.array([r[0] for r in rows], "int64"),
            "n_overlap": pd.array([r[1] for r in rows], "int64"),
            "recall_x1000": pd.array([r[2] for r in rows], "int64"),
        }
    )


def _pq_subspace_chain(m: int, k: int, iters: int, sub_dim: int) -> str:
    """One subspace's unrolled integer-Lloyd's chain (prefix ``s{m}``),
    operating on list_slice(v, m*sub_dim+1, (m+1)*sub_dim) of the shared
    quantized relation ``q`` — the _kmeans_cte_chain semantics verbatim
    (k-smallest-id init, int L2 lowest-index ties, positive-floor-mod
    floor division, COALESCE empty-cluster keep) at dim=sub_dim."""
    lo, hi = m * sub_dim + 1, (m + 1) * sub_dim
    parts = [
        f""", s{m}q AS (
  SELECT vec_id, list_slice(v, {lo}, {hi}) AS v FROM q
), s{m}c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c
  FROM s{m}q ORDER BY vec_id LIMIT {k}
)"""
    ]
    for it in range(1, iters + 1):
        prev, cur = f"s{m}c{it - 1}", f"s{m}c{it}"
        parts.append(
            f""", s{m}a{it} AS (
  SELECT vec_id, v, cluster FROM (
    SELECT t.vec_id, t.v, c.cluster,
           row_number() OVER (
             PARTITION BY t.vec_id
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(t.v, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM s{m}q t, {prev} c) WHERE rn = 1
), s{m}upd{it} AS (
  SELECT cluster, list(cj ORDER BY i) AS c FROM (
    SELECT cluster, i,
           CAST((s - (((s % n) + n) % n)) / n AS BIGINT) AS cj
    FROM (
      SELECT a.cluster, t.i, SUM(a.v[t.i]) AS s, COUNT(*) AS n
      FROM s{m}a{it} a, UNNEST(generate_series(1, {sub_dim})) AS t(i)
      GROUP BY a.cluster, t.i))
  GROUP BY cluster
), {cur} AS (
  SELECT p.cluster, COALESCE(u.c, p.c) AS c
  FROM {prev} p LEFT JOIN s{m}upd{it} u USING (cluster)
)"""
        )
    return "".join(parts)


def _q175_sql() -> str:
    n_sub, sub_dim, kc, iters = _Q175_NSUB, _Q175_SUBD, _Q175_KC, _Q175_ITERS
    n_q, k, scale = _Q175_NQ, _Q175_K, 1024
    chains = "".join(
        _pq_subspace_chain(m, kc, iters, sub_dim) for m in range(n_sub)
    )
    codes = "".join(
        f""", codes{m} AS (
  SELECT vec_id, cluster FROM (
    SELECT t.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY t.vec_id
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(t.v, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM s{m}q t, s{m}c{iters} c) WHERE rn = 1
)"""
        for m in range(n_sub)
    )
    est_terms = " + ".join(
        f"CAST(list_inner_product(list_slice(p.qv, {m * sub_dim + 1},"
        f" {(m + 1) * sub_dim}), c{m}.c) AS BIGINT)"
        for m in range(n_sub)
    )
    est_joins = "\n  ".join(
        (
            f"JOIN codes{m} a{m} ON a{m}.vec_id = a0.vec_id\n  "
            if m else ""
        )
        + f"JOIN s{m}c{iters} c{m} ON c{m}.cluster = a{m}.cluster"
        for m in range(n_sub)
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(x * {scale} + 0.5) AS BIGINT)) AS v
  FROM embeddings
){chains}{codes}, qs AS (
  SELECT vec_id AS qid, v AS qv FROM q ORDER BY vec_id LIMIT {n_q}
), ex AS (
  SELECT qid, vec_id FROM (
    SELECT s.qid, t.vec_id,
           row_number() OVER (
             PARTITION BY s.qid
             ORDER BY CAST(list_inner_product(t.v, s.qv) AS BIGINT) DESC,
                      t.vec_id) AS rn
    FROM q t, qs s) WHERE rn <= {k}
), adc AS (
  SELECT p.qid, a0.vec_id, {est_terms} AS est
  FROM qs p, codes0 a0
  {est_joins}
), pq AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (
             PARTITION BY qid ORDER BY est DESC, vec_id) AS rn
    FROM adc) WHERE rn <= {k}
)
SELECT s.qid AS query_vec_id,
       CAST((SELECT COUNT(*) FROM ex e JOIN pq p
             ON e.qid = s.qid AND p.qid = s.qid AND e.vec_id = p.vec_id)
            AS BIGINT) AS n_overlap,
       CAST((1000 * (SELECT COUNT(*) FROM ex e JOIN pq p
             ON e.qid = s.qid AND p.qid = s.qid AND e.vec_id = p.vec_id))
            // {k} AS BIGINT) AS recall_x1000
FROM qs s
ORDER BY s.qid
"""


# -------------------------------------------------------------------- q180

_Q180_TRUNC, _Q180_NQ, _Q180_K = 16, 5, 10


def q180_matryoshka_recall(sf_dir: str):
    """Matryoshka-truncation retrieval eval (Kusupati et al. 2022): how
    much exact-search recall@10 survives keeping only the FIRST 16 of 64
    embedding dims — the question every embedding-storage budget decision
    asks (4x fewer bytes, same index machinery; PQ — q175 — compresses
    codes, truncation compresses the vectors themselves). Both legs are
    exact integer-dot searches riding ONE corpus scan (q143's
    dual-partial harness): full-dim top-10 is the truth, prefix-dim
    top-10 is the candidate. Output per probe query: (query_vec_id,
    n_overlap, recall_x1000) — all-integer, oracle rebuilds both cuts
    with list_slice."""
    import ray

    from medical_ocr_service_ray.stages.ann import _stack_embeddings
    from medical_ocr_service_ray.stages.kmeans import quantize

    t, n_q, k = _Q180_TRUNC, _Q180_NQ, _Q180_K
    ds = _emb_dataset(sf_dir)
    emb = _emb_query_table(sf_dir)
    qdf = (
        pd.DataFrame(
            {"vec_id": emb["vec_id"].to_pandas(), "e": emb["embedding"].to_pylist()}
        )
        .sort_values("vec_id")
        .head(n_q)
    )
    qids = qdf.vec_id.to_numpy(dtype=np.int64)
    qm = quantize(np.asarray(qdf.e.tolist(), dtype=np.float64))
    bundle = ray.put((qm, qids))

    def partial(batch: pa.Table, _ref=bundle) -> pa.Table:
        qmat, qv_ids = ray.get(_ref)
        v = quantize(_stack_embeddings(batch))
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        full = v @ qmat.T
        trunc = v[:, :t] @ qmat[:, :t].T
        out_q, out_id, out_dot, out_kind = [], [], [], []
        for qi in range(len(qv_ids)):
            for kind, col in ((0, full[:, qi]), (1, trunc[:, qi])):
                order = np.lexsort((ids, -col))[:k]
                out_q.extend([int(qv_ids[qi])] * len(order))
                out_id.extend(ids[order].tolist())
                out_dot.extend(col[order].tolist())
                out_kind.extend([kind] * len(order))
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "dot_q": pa.array(out_dot, pa.int64()),
                "kind": pa.array(out_kind, pa.int64()),
            }
        )

    merged = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = merged.sort_values(
        ["qid", "kind", "dot_q", "vec_id"], ascending=[True, True, False, True]
    )
    top = merged.groupby(["qid", "kind"]).head(k)
    rows = []
    for qid in qids:
        ex = set(top[(top.qid == qid) & (top.kind == 0)].vec_id)
        tr = set(top[(top.qid == qid) & (top.kind == 1)].vec_id)
        n = len(ex & tr)
        rows.append((int(qid), n, (1000 * n) // k))
    return pd.DataFrame(
        {
            "query_vec_id": pd.array([r[0] for r in rows], "int64"),
            "n_overlap": pd.array([r[1] for r in rows], "int64"),
            "recall_x1000": pd.array([r[2] for r in rows], "int64"),
        }
    )


def _q180_sql() -> str:
    t, n_q, k, scale = _Q180_TRUNC, _Q180_NQ, _Q180_K, 1024
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(x * {scale} + 0.5) AS BIGINT)) AS v
  FROM embeddings
), qs AS (
  SELECT vec_id AS qid, v AS qv FROM q ORDER BY vec_id LIMIT {n_q}
), ex AS (
  SELECT qid, vec_id FROM (
    SELECT s.qid, x.vec_id,
           row_number() OVER (
             PARTITION BY s.qid
             ORDER BY CAST(list_inner_product(x.v, s.qv) AS BIGINT) DESC,
                      x.vec_id) AS rn
    FROM q x, qs s) WHERE rn <= {k}
), tr AS (
  SELECT qid, vec_id FROM (
    SELECT s.qid, x.vec_id,
           row_number() OVER (
             PARTITION BY s.qid
             ORDER BY CAST(list_inner_product(list_slice(x.v, 1, {t}),
                                              list_slice(s.qv, 1, {t}))
                           AS BIGINT) DESC,
                      x.vec_id) AS rn
    FROM q x, qs s) WHERE rn <= {k}
)
SELECT s.qid AS query_vec_id,
       CAST((SELECT COUNT(*) FROM ex e JOIN tr r
             ON e.qid = s.qid AND r.qid = s.qid AND e.vec_id = r.vec_id)
            AS BIGINT) AS n_overlap,
       CAST((1000 * (SELECT COUNT(*) FROM ex e JOIN tr r
             ON e.qid = s.qid AND r.qid = s.qid AND e.vec_id = r.vec_id))
            // {k} AS BIGINT) AS recall_x1000
FROM qs s
ORDER BY s.qid
"""


# -------------------------------------------------------------------- q182

_Q182_KCOARSE, _Q182_NPROBE = 8, 2


def q182_ivfpq_recall(sf_dir: str):
    """IVF-PQ combined index eval — the FAISS IndexIVFPQ shape, and the
    production layout for 10^11-vector search: a coarse quantizer (q78's
    IVF, k=8) prunes WHICH vectors are scored, PQ codes (q175's 8x8-dim
    codebooks) compress HOW they are scored — candidate set shrinks
    nprobe/k-fold AND each candidate costs 8 LUT lookups instead of a
    64-dim dot. Both structures reuse their tested fits verbatim
    (kmeans_fit + pq_fit); the eval rides ONE corpus scan emitting exact
    top-10 truth AND in-probe ADC top-10 partials (q143's dual-partial
    harness with q175's LUT scoring inside the probe gate). Output per
    probe query: (query_vec_id, n_overlap, recall_x1000) — recall
    compounds BOTH loss sources (probe misses + code quantization), so
    q143 (IVF-only) and q175 (PQ-only) bound it from above."""
    import ray

    from medical_ocr_service_ray.stages.ann import _stack_embeddings, probe_clusters
    from medical_ocr_service_ray.stages.kmeans import assign, kmeans_fit, pq_fit, quantize

    n_sub, sub_dim, kc = _Q175_NSUB, _Q175_SUBD, _Q175_KC
    n_q, k = _Q175_NQ, _Q175_K
    ds = _emb_dataset(sf_dir)
    coarse = kmeans_fit(ds, k=_Q182_KCOARSE, iters=2)
    books = pq_fit(ds, n_sub, sub_dim, k=kc, iters=_Q175_ITERS)

    emb = _emb_query_table(sf_dir)
    qdf = (
        pd.DataFrame(
            {"vec_id": emb["vec_id"].to_pandas(), "e": emb["embedding"].to_pylist()}
        )
        .sort_values("vec_id")
        .head(n_q)
    )
    qids = qdf.vec_id.to_numpy(dtype=np.int64)
    qm = quantize(np.asarray(qdf.e.tolist(), dtype=np.float64))
    lut = np.stack(
        [qm[:, m * sub_dim : (m + 1) * sub_dim] @ books[m].T
         for m in range(n_sub)],
        axis=1,
    )
    probes = [
        set(map(int, probe_clusters(qm[i], coarse, _Q182_NPROBE)))
        for i in range(len(qids))
    ]
    bundle = ray.put((coarse, books, qm, qids, lut, probes))

    def partial(batch: pa.Table, _ref=bundle) -> pa.Table:
        crs, bks, qmat, qv_ids, luts, probe_sets = ray.get(_ref)
        v = quantize(_stack_embeddings(batch))
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        dots = v @ qmat.T
        a = assign(v, crs)
        est = np.zeros((v.shape[0], len(qv_ids)), dtype=np.int64)
        for m in range(bks.shape[0]):
            codes = assign(v[:, m * sub_dim : (m + 1) * sub_dim], bks[m])
            est += luts[:, m, :][:, codes].T
        out_q, out_id, out_dot, out_kind = [], [], [], []
        for qi in range(len(qv_ids)):
            order = np.lexsort((ids, -dots[:, qi]))[:k]
            out_q.extend([int(qv_ids[qi])] * len(order))
            out_id.extend(ids[order].tolist())
            out_dot.extend(dots[order, qi].tolist())
            out_kind.extend([0] * len(order))
            mask = np.isin(a, np.fromiter(probe_sets[qi], dtype=np.int64))
            mids, mest = ids[mask], est[mask, qi]
            morder = np.lexsort((mids, -mest))[:k]
            out_q.extend([int(qv_ids[qi])] * len(morder))
            out_id.extend(mids[morder].tolist())
            out_dot.extend(mest[morder].tolist())
            out_kind.extend([1] * len(morder))
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "dot_q": pa.array(out_dot, pa.int64()),
                "kind": pa.array(out_kind, pa.int64()),
            }
        )

    merged = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = merged.sort_values(
        ["qid", "kind", "dot_q", "vec_id"], ascending=[True, True, False, True]
    )
    top = merged.groupby(["qid", "kind"]).head(k)
    rows = []
    for qid in qids:
        ex = set(top[(top.qid == qid) & (top.kind == 0)].vec_id)
        iv = set(top[(top.qid == qid) & (top.kind == 1)].vec_id)
        n = len(ex & iv)
        rows.append((int(qid), n, (1000 * n) // k))
    return pd.DataFrame(
        {
            "query_vec_id": pd.array([r[0] for r in rows], "int64"),
            "n_overlap": pd.array([r[1] for r in rows], "int64"),
            "recall_x1000": pd.array([r[2] for r in rows], "int64"),
        }
    )


def _q182_sql() -> str:
    from medical_ocr_service_ray.pipelines.queries_text import _kmeans_cte_chain

    n_sub, sub_dim, kc, iters = _Q175_NSUB, _Q175_SUBD, _Q175_KC, _Q175_ITERS
    n_q, k = _Q175_NQ, _Q175_K
    kcoarse, nprobe, citers = _Q182_KCOARSE, _Q182_NPROBE, 2
    chains = "".join(
        _pq_subspace_chain(m, kc, iters, sub_dim) for m in range(n_sub)
    )
    codes = "".join(
        f""", codes{m} AS (
  SELECT vec_id, cluster FROM (
    SELECT t.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY t.vec_id
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(t.v, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM s{m}q t, s{m}c{iters} c) WHERE rn = 1
)"""
        for m in range(n_sub)
    )
    est_terms = " + ".join(
        f"CAST(list_inner_product(list_slice(p.qv, {m * sub_dim + 1},"
        f" {(m + 1) * sub_dim}), c{m}.c) AS BIGINT)"
        for m in range(n_sub)
    )
    est_joins = "\n  ".join(
        (
            f"JOIN codes{m} a{m} ON a{m}.vec_id = a0.vec_id\n  "
            if m else ""
        )
        + f"JOIN s{m}c{iters} c{m} ON c{m}.cluster = a{m}.cluster"
        for m in range(n_sub)
    )
    # coarse chain provides WITH q AS (...), c0..c{citers}
    return (
        _kmeans_cte_chain(kcoarse, citers, 64, 1024)
        + chains
        + codes
        + f""", qs AS (
  SELECT vec_id AS qid, v AS qv FROM q ORDER BY vec_id LIMIT {n_q}
), ex AS (
  SELECT qid, vec_id FROM (
    SELECT s.qid, t.vec_id,
           row_number() OVER (
             PARTITION BY s.qid
             ORDER BY CAST(list_inner_product(t.v, s.qv) AS BIGINT) DESC,
                      t.vec_id) AS rn
    FROM q t, qs s) WHERE rn <= {k}
), af AS (
  SELECT vec_id, cluster FROM (
    SELECT t.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY t.vec_id
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(t.v, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM q t, c{citers} c) WHERE rn = 1
), pr AS (
  SELECT qid, cluster FROM (
    SELECT s.qid, c.cluster,
           row_number() OVER (
             PARTITION BY s.qid
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(s.qv, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM qs s, c{citers} c) WHERE rn <= {nprobe}
), adc AS (
  SELECT p.qid, a0.vec_id, {est_terms} AS est
  FROM qs p, codes0 a0
  {est_joins}
  JOIN af ON af.vec_id = a0.vec_id
  JOIN pr ON pr.qid = p.qid AND pr.cluster = af.cluster
), ivfpq AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (
             PARTITION BY qid ORDER BY est DESC, vec_id) AS rn
    FROM adc) WHERE rn <= {k}
)
SELECT s.qid AS query_vec_id,
       CAST((SELECT COUNT(*) FROM ex e JOIN ivfpq p
             ON e.qid = s.qid AND p.qid = s.qid AND e.vec_id = p.vec_id)
            AS BIGINT) AS n_overlap,
       CAST((1000 * (SELECT COUNT(*) FROM ex e JOIN ivfpq p
             ON e.qid = s.qid AND p.qid = s.qid AND e.vec_id = p.vec_id))
            // {k} AS BIGINT) AS recall_x1000
FROM qs s
ORDER BY s.qid
"""
    )


# -------------------------------------------------------------------- q188

_Q188_S = 50  # ADC shortlist size feeding the exact reranker


def q188_rerank_recall(sf_dir: str):
    """Two-stage retrieval eval — the PRODUCTION serving composition for
    compressed indexes (FAISS refine / DiskANN rerank): stage 1 scores
    every vector cheaply with q175's PQ-ADC codes and keeps a shortlist
    of 50, stage 2 re-scores ONLY the shortlist with exact dots and cuts
    to 10. Reports recall@10 vs exact truth for BOTH the raw ADC top-10
    and the reranked top-10 — the rerank lift (rr >= adc by construction
    whenever the shortlist covers truth) is the number that justifies
    storing codes instead of vectors. Plan: the q175 single-scan harness
    extended to emit three partials per block — exact top-10 (truth),
    and ADC-top-50 rows carrying BOTH est (for the global shortlist cut)
    AND the exact dot (already computed in the same block — the rerank
    costs ZERO extra corpus reads); driver merge is blocks x (10 + 50)
    rows. Output per probe query: (query_vec_id, adc_overlap,
    adc_recall_x1000, rr_overlap, rr_recall_x1000)."""
    import ray

    from medical_ocr_service_ray.stages.ann import _stack_embeddings
    from medical_ocr_service_ray.stages.kmeans import assign, pq_fit, quantize

    n_sub, sub_dim, kc = _Q175_NSUB, _Q175_SUBD, _Q175_KC
    n_q, k, S = _Q175_NQ, _Q175_K, _Q188_S
    ds = _emb_dataset(sf_dir)
    books = pq_fit(ds, n_sub, sub_dim, k=kc, iters=_Q175_ITERS)

    emb = _emb_query_table(sf_dir)
    qdf = (
        pd.DataFrame(
            {"vec_id": emb["vec_id"].to_pandas(), "e": emb["embedding"].to_pylist()}
        )
        .sort_values("vec_id")
        .head(n_q)
    )
    qids = qdf.vec_id.to_numpy(dtype=np.int64)
    qm = quantize(np.asarray(qdf.e.tolist(), dtype=np.float64))
    lut = np.stack(
        [qm[:, m * sub_dim : (m + 1) * sub_dim] @ books[m].T
         for m in range(n_sub)],
        axis=1,
    )
    bundle = ray.put((books, qm, qids, lut))

    def partial(batch: pa.Table, _ref=bundle) -> pa.Table:
        bks, qmat, qv_ids, luts = ray.get(_ref)
        v = quantize(_stack_embeddings(batch))
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        dots = v @ qmat.T
        est = np.zeros((v.shape[0], len(qv_ids)), dtype=np.int64)
        for m in range(bks.shape[0]):
            codes = assign(v[:, m * sub_dim : (m + 1) * sub_dim], bks[m])
            est += luts[:, m, :][:, codes].T
        out = {c: [] for c in ("qid", "vec_id", "est", "dot", "kind")}
        for qi in range(len(qv_ids)):
            order = np.lexsort((ids, -dots[:, qi]))[:k]  # truth partial
            out["qid"].extend([int(qv_ids[qi])] * len(order))
            out["vec_id"].extend(ids[order].tolist())
            out["est"].extend(est[order, qi].tolist())
            out["dot"].extend(dots[order, qi].tolist())
            out["kind"].extend([0] * len(order))
            sorder = np.lexsort((ids, -est[:, qi]))[:S]  # shortlist partial
            out["qid"].extend([int(qv_ids[qi])] * len(sorder))
            out["vec_id"].extend(ids[sorder].tolist())
            out["est"].extend(est[sorder, qi].tolist())
            out["dot"].extend(dots[sorder, qi].tolist())
            out["kind"].extend([1] * len(sorder))
        return pa.table({c: pa.array(v_, pa.int64()) for c, v_ in out.items()})

    merged = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    truth = (
        merged[merged.kind == 0]
        .sort_values(["qid", "dot", "vec_id"], ascending=[True, False, True])
        .groupby("qid")
        .head(k)
    )
    short = (
        merged[merged.kind == 1]
        .sort_values(["qid", "est", "vec_id"], ascending=[True, False, True])
        .groupby("qid")
        .head(S)
    )
    rows = []
    for qid in qids:
        ex = set(truth[truth.qid == qid].vec_id)
        sl = short[short.qid == qid]
        adc = set(sl.head(k).vec_id)
        rr = set(
            sl.sort_values(["dot", "vec_id"], ascending=[False, True])
            .head(k).vec_id
        )
        na, nr = len(ex & adc), len(ex & rr)
        rows.append((int(qid), na, (1000 * na) // k, nr, (1000 * nr) // k))
    return pd.DataFrame(
        {
            "query_vec_id": pd.array([r[0] for r in rows], "int64"),
            "adc_overlap": pd.array([r[1] for r in rows], "int64"),
            "adc_recall_x1000": pd.array([r[2] for r in rows], "int64"),
            "rr_overlap": pd.array([r[3] for r in rows], "int64"),
            "rr_recall_x1000": pd.array([r[4] for r in rows], "int64"),
        }
    )


def _q188_sql() -> str:
    n_sub, sub_dim, kc, iters = _Q175_NSUB, _Q175_SUBD, _Q175_KC, _Q175_ITERS
    n_q, k, S, scale = _Q175_NQ, _Q175_K, _Q188_S, 1024
    chains = "".join(
        _pq_subspace_chain(m, kc, iters, sub_dim) for m in range(n_sub)
    )
    codes = "".join(
        f""", codes{m} AS (
  SELECT vec_id, cluster FROM (
    SELECT t.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY t.vec_id
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(t.v, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM s{m}q t, s{m}c{iters} c) WHERE rn = 1
)"""
        for m in range(n_sub)
    )
    est_terms = " + ".join(
        f"CAST(list_inner_product(list_slice(p.qv, {m * sub_dim + 1},"
        f" {(m + 1) * sub_dim}), c{m}.c) AS BIGINT)"
        for m in range(n_sub)
    )
    est_joins = "\n  ".join(
        (
            f"JOIN codes{m} a{m} ON a{m}.vec_id = a0.vec_id\n  "
            if m else ""
        )
        + f"JOIN s{m}c{iters} c{m} ON c{m}.cluster = a{m}.cluster"
        for m in range(n_sub)
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(x * {scale} + 0.5) AS BIGINT)) AS v
  FROM embeddings
){chains}{codes}, qs AS (
  SELECT vec_id AS qid, v AS qv FROM q ORDER BY vec_id LIMIT {n_q}
), ex AS (
  SELECT qid, vec_id FROM (
    SELECT s.qid, t.vec_id,
           row_number() OVER (
             PARTITION BY s.qid
             ORDER BY CAST(list_inner_product(t.v, s.qv) AS BIGINT) DESC,
                      t.vec_id) AS rn
    FROM q t, qs s) WHERE rn <= {k}
), adc AS (
  SELECT p.qid, a0.vec_id, {est_terms} AS est
  FROM qs p, codes0 a0
  {est_joins}
), short AS (
  SELECT qid, vec_id, est, rn FROM (
    SELECT qid, vec_id, est,
           row_number() OVER (
             PARTITION BY qid ORDER BY est DESC, vec_id) AS rn
    FROM adc) WHERE rn <= {S}
), adc10 AS (
  SELECT qid, vec_id FROM short WHERE rn <= {k}
), rr AS (
  SELECT qid, vec_id FROM (
    SELECT s.qid, s.vec_id,
           row_number() OVER (
             PARTITION BY s.qid
             ORDER BY CAST(list_inner_product(t.v, p.qv) AS BIGINT) DESC,
                      s.vec_id) AS rn
    FROM short s JOIN q t ON t.vec_id = s.vec_id
                 JOIN qs p ON p.qid = s.qid) WHERE rn <= {k}
)
SELECT s.qid AS query_vec_id,
       CAST((SELECT COUNT(*) FROM ex e JOIN adc10 a
             ON e.qid = s.qid AND a.qid = s.qid AND e.vec_id = a.vec_id)
            AS BIGINT) AS adc_overlap,
       CAST((1000 * (SELECT COUNT(*) FROM ex e JOIN adc10 a
             ON e.qid = s.qid AND a.qid = s.qid AND e.vec_id = a.vec_id))
            // {k} AS BIGINT) AS adc_recall_x1000,
       CAST((SELECT COUNT(*) FROM ex e JOIN rr r
             ON e.qid = s.qid AND r.qid = s.qid AND e.vec_id = r.vec_id)
            AS BIGINT) AS rr_overlap,
       CAST((1000 * (SELECT COUNT(*) FROM ex e JOIN rr r
             ON e.qid = s.qid AND r.qid = s.qid AND e.vec_id = r.vec_id))
            // {k} AS BIGINT) AS rr_recall_x1000
FROM qs s
ORDER BY s.qid
"""
