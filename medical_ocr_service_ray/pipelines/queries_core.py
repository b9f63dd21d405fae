"""q1 core aggregates, dedup, extraction flagship, sketches (q1-q34) — split from pipelines/queries.py (r5), no behavior change."""

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
    BroadcastMapper,
    LANGS,
    Path,
    STOPWORDS,
    SemiAntiFilter,
    _cents,
    _read,
    bucketed_combine,
    driver_combine,
    exact_dedup,
    minhash_lsh_pairs,
    np,
    pa,
    partial_then_combine,
    pc,
    pd,
    pq,
    simhash_pairs,
    sql_lang_score,
    sql_occurrences,
    text_stages,
)




# --------------------------------------------------------------------- q1

def q1_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate with per-batch partial pre-aggregation
    (A1/A2/A7 pattern: partial-per-task then final reduce, SURVEY.md §2.5)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            cents_base=_cents(df.l_extendedprice),
            disc100=_cents(1.0 - df.l_discount),
            d100=_cents(df.l_discount),
        )
        df["cents_disc"] = df.cents_base * df.disc100
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            p_qty=("l_quantity", "sum"),
            p_base=("cents_base", "sum"),
            p_disc=("cents_disc", "sum"),
            p_d100=("d100", "sum"),
            p_n=("l_quantity", "size"),
        )
        return g

    def combine(partials: pd.DataFrame) -> pd.DataFrame:
        out = partials.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("p_qty", "sum"),
            cents_base=("p_base", "sum"),
            cents_disc=("p_disc", "sum"),
            sum_d100=("p_d100", "sum"),
            count_order=("p_n", "sum"),
        )
        n = out.count_order.astype("int64")
        out["sum_base_price"] = out.cents_base / 100.0
        out["sum_disc_price"] = out.cents_disc / 10000.0
        out["avg_qty"] = out.sum_qty / n
        out["avg_price"] = (out.cents_base / 100.0) / n
        out["avg_disc"] = (out.sum_d100 / 100.0) / n
        out["count_order"] = n
        return out[
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price",
             "avg_qty", "avg_price", "avg_disc", "count_order"]
        ]

    # 6 groups total => partial rows are blocks x 6: driver combine is exact
    return driver_combine(ds, partial, combine)


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)
              * CAST(round((1.0-l_discount)*100, 0) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_disc_price,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       (CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) / 100.0) / COUNT(*) AS avg_price,
       (CAST(SUM(CAST(round(l_discount*100, 0) AS BIGINT)) AS BIGINT) / 100.0) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------- q2

def q2_daily_events(sf_dir: str):
    """Daily usage rollup incl. distinct users (usage.service.js:56-89, A6)."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "day": df.ts.dt.strftime("%Y-%m-%d"),
                    "user_id": df.user_id,
                    "v4": _cents(df.value, 10000),
                }
            )
            .groupby(["day", "user_id"], as_index=False)
            .agg(p_n=("v4", "size"), p_v4=("v4", "sum"))
        )

    def combine(partials: pd.DataFrame) -> pd.DataFrame:
        per_user = partials.groupby(["day", "user_id"], as_index=False).agg(
            n=("p_n", "sum"), v4=("p_v4", "sum")
        )
        out = per_user.groupby("day", as_index=False).agg(
            n_events=("n", "sum"), v4=("v4", "sum"), n_users=("user_id", "size")
        )
        out["n_events"] = out.n_events.astype("int64")
        out["sum_value"] = out.v4.astype("int64") / 10000.0
        out["n_users"] = out.n_users.astype("int64")
        return out[["day", "n_events", "sum_value", "n_users"]]

    # bounded cardinality (days x users) => driver combine of per-batch partials
    return driver_combine(ds, partial, combine)


_Q2_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value*10000, 0) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY day
"""


# --------------------------------------------------------------------- q3

def q3_top_customers(sf_dir: str):
    """Top-100 customers by order revenue: groupby -> sort/limit -> broadcast
    name lookup (T3/T4 + J3: sort().limit() + broadcast dict)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.assign(cents=_cents(df.o_totalprice))
            .groupby("o_custkey", as_index=False)
            .agg(p_cents=("cents", "sum"))
        )

    def combine_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(cents=("p_cents", "sum"))
        # per-bucket top-100: global top-100 is within the union of bucket top-100s
        return g.sort_values(["cents", "o_custkey"], ascending=[False, True]).head(100)

    per_bucket = partial_then_combine(orders, partial, "o_custkey", combine_topk)
    top = (
        per_bucket.to_pandas()  # <= 16 buckets x 100 rows
        .sort_values(["cents", "o_custkey"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )
    names = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    name_map = dict(zip(names["c_custkey"].to_pylist(), names["c_name"].to_pylist()))
    top["c_name"] = top.o_custkey.map(name_map)
    top["revenue"] = top.cents.astype("int64") / 100.0
    return top[["o_custkey", "c_name", "revenue"]]


_Q3_SQL = """
SELECT o_custkey, c_name,
       CAST(SUM(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY o_custkey, c_name
ORDER BY CAST(SUM(CAST(round(o_totalprice*100, 0) AS BIGINT)) AS BIGINT) DESC, o_custkey
LIMIT 100
"""


# --------------------------------------------------------------------- q4

def q4_priority_counts(sf_dir: str):
    """GROUP BY estado -> COUNT (job-queue stats A4/A5 analogue)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(p_n=("o_orderpriority", "size"))

    def combine(partials: pd.DataFrame) -> pd.DataFrame:
        out = partials.groupby("o_orderpriority", as_index=False).agg(n_orders=("p_n", "sum"))
        out["n_orders"] = out.n_orders.astype("int64")
        return out

    return driver_combine(ds, partial, combine)


_Q4_SQL = "SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders GROUP BY o_orderpriority"


# --------------------------------------------------------------------- q5

def q5_region_rollup(sf_dir: str):
    """Customer rollup to nation/region via a broadcast dimension lookup
    STAGE (J1-J6 pattern: small side published once via ray.put, resolved in
    each actor's __init__, appended per batch — no shuffle join)."""
    import ray

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    r_name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    n_info = {
        k: (n, r_name[r])
        for k, n, r in zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
    }
    mapping_ref = ray.put(n_info)

    customers = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"]).map_batches(
        BroadcastMapper,
        fn_constructor_kwargs={
            "mapping_ref": mapping_ref,
            "key_col": "c_nationkey",
            "out_cols": ["n_name", "r_name"],
            "out_types": [pa.string(), pa.string()],
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.assign(cents=_cents(df.c_acctbal))
            .groupby(["r_name", "n_name"], as_index=False)
            .agg(p_n=("cents", "size"), p_cents=("cents", "sum"))
        )

    def combine(partials: pd.DataFrame) -> pd.DataFrame:
        agg = partials.groupby(["r_name", "n_name"], as_index=False).agg(
            n_customers=("p_n", "sum"), cents=("p_cents", "sum")
        )
        agg["n_customers"] = agg.n_customers.astype("int64")
        agg["total_acctbal"] = agg.cents.astype("int64") / 100.0
        return agg[["r_name", "n_name", "n_customers", "total_acctbal"]]

    return driver_combine(customers, partial, combine)  # 25 nations


_Q5_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(round(c_acctbal*100, 0) AS BIGINT)) AS BIGINT) / 100.0 AS total_acctbal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------- q6

def q6_high_value_purchases(sf_dir: str):
    """Vectorized predicate filter + projection (M-filters; urgency-keyword
    filter analogue, constants.js:113-120)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value", "ts"])

    def flt(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t["event_type"], pa.scalar("purchase")), pc.greater(t["value"], pa.scalar(100.0))
        )
        return t.filter(mask).select(["event_id", "user_id", "value", "ts"])

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


_Q6_SQL = """
SELECT event_id, user_id, value, ts FROM events
WHERE event_type = 'purchase' AND value > 100.0
"""


# --------------------------------------------------------------------- q7

def q7_exact_dedup_documents(sf_dir: str):
    """Exact content dedup: sha256 hash-partition, keep min(doc_id) (D1)."""
    return exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


_Q7_SQL = "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count FROM documents GROUP BY text"


# --------------------------------------------------------------------- q8

def q8_latest_event_per_user(sf_dir: str):
    """Last-writer-wins per key (D4: upsert-by-id => latest by (ts, id))."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch pre-reduce: at most one row per user per batch
        df = df.sort_values(["user_id", "ts", "event_id"], ascending=[True, False, False])
        return df.groupby("user_id", as_index=False).head(1)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], ascending=[True, False, False])
        out = df.groupby("user_id", as_index=False).head(1)
        return out[["user_id", "event_id", "event_type", "value", "ts"]]

    return partial_then_combine(ds, partial, "user_id", combine)


_Q8_SQL = """
SELECT user_id, event_id, event_type, value, ts FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


# --------------------------------------------------------------------- q9

def q9_token_stats(sf_dir: str):
    """Token counting over documents (text-analysis addition)."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        text_stages.token_stats_batch, batch_format="pyarrow", zero_copy_batch=True
    )


_Q9_SQL = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS alpha_chars,
       CASE WHEN trim(text) = '' THEN 0
            ELSE CAST(floor(100.0 * length(regexp_replace(text, '\\s', '', 'g'))
                 / length(string_split_regex(trim(text), '\\s+'))) AS BIGINT) END AS avg_token_len_x100
FROM documents
"""


# --------------------------------------------------------------------- q10

def q10_lang_id(sf_dir: str):
    """Marker-based language-ID heuristic (text-analysis addition)."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        text_stages.lang_id_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _q10_sql() -> str:
    scores = ",\n       ".join(f"{sql_lang_score('p', lang)} AS s_{lang}" for lang in LANGS)
    zero = " AND ".join(f"s_{lang} = 0" for lang in LANGS)
    cases = "\n            ".join(
        "WHEN "
        + " AND ".join(f"s_{lang} >= s_{o}" for o in LANGS if o != lang)
        + f" THEN '{lang}'"
        for lang in LANGS
    )
    return f"""
WITH padded AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
scores AS (SELECT doc_id, {scores} FROM padded)
SELECT doc_id,
       CASE WHEN {zero} THEN 'und'
            {cases}
            ELSE 'und' END AS lang_pred
FROM scores
"""


# --------------------------------------------------------------------- q11

def q11_quality(sf_dir: str):
    """Integer quality-score heuristic (text-analysis addition)."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        text_stages.quality_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _q11_sql() -> str:
    stop = " + ".join(sql_occurrences("p", s) for s in STOPWORDS)
    punct = " + ".join(sql_occurrences("text", c) for c in (".", ",", "!"))
    return f"""
WITH base AS (
  SELECT doc_id, text, ' ' || lower(text) || ' ' AS p,
         CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens
  FROM documents
), scored AS (
  SELECT doc_id, n_tokens, {stop} AS stop_hits, {punct} AS punct_count FROM base
)
SELECT doc_id, n_tokens, stop_hits, punct_count,
       least(n_tokens, 200) * 2 + least(stop_hits * 10, 100) * 3 + least(punct_count * 5, 100) AS quality
FROM scored
"""


# --------------------------------------------------------------------- q12

# the ANN family (q12/q22/q23) shares ONE embeddings read per (sf_dir,
# session): a driver-side pruned table mints the query vectors, and one
# materialized Dataset feeds every scorer instead of re-scanning the file
# per query (same deliberate reuse policy as _EXTRACT_CACHE — standalone
# single-query paths should stream instead).
_EMB_CACHE: dict[tuple, "rd.Dataset"] = {}
_EMB_TABLE_CACHE: dict[str, pa.Table] = {}


def _emb_query_table(sf_dir: str) -> pa.Table:
    t = _EMB_TABLE_CACHE.get(sf_dir)
    if t is None:
        t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        _EMB_TABLE_CACHE[sf_dir] = t
    return t


def _emb_dataset(sf_dir: str) -> "rd.Dataset":
    key = _session_key(sf_dir)
    ds = _EMB_CACHE.get(key)
    if ds is None:
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"]).materialize()
        _EMB_CACHE[key] = ds
    return ds


def q12_knn_quantized_dot(sf_dir: str):
    """Top-10 by integer-quantized dot product vs the min-vec_id query vector:
    exact integer arithmetic end-to-end => bit-reproducible by SQL (T1 knn
    analogue of matching.service.js:44-47)."""
    import ray

    from medical_ocr_service_ray.stages.ann import quantized_dot_batch

    emb = _emb_query_table(sf_dir)
    min_idx = pc.index(emb["vec_id"], pc.min(emb["vec_id"]).as_py()).as_py()
    query = np.asarray(emb["embedding"][min_idx].as_py(), dtype=np.float64)
    query_ref = ray.put(query)

    scored = _emb_dataset(sf_dir).map_batches(
        quantized_dot_batch,
        fn_kwargs={"query_ref": query_ref},
        batch_format="pyarrow",
    )

    # partial top-k per batch + tiny driver merge (the brute_force_topk
    # pattern, stages/ann.py) — the global top-10 is within the union of
    # per-batch top-10s, so no all-to-all sort of the scored table is needed.
    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["dot_q", "vec_id"], ascending=[False, True]).head(10),
            preserve_index=False,
        )

    merged = scored.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = merged.sort_values(["dot_q", "vec_id"], ascending=[False, True]).head(10)
    return pa.Table.from_pandas(out.reset_index(drop=True))


_Q12_SQL = """
WITH q AS (
  SELECT list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS qv
  FROM embeddings WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
)
SELECT vec_id,
       list_inner_product(list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)), q.qv) AS dot_q
FROM embeddings, q
ORDER BY dot_q DESC, vec_id
LIMIT 10
"""


# --------------------------------------------------------------------- q13/q14

def _session_key(sf_dir: str) -> tuple:
    """Cache key scoped to the CURRENT Ray session: a materialized Dataset
    references object-store objects that die with the session, so a cache
    entry from before a ray.shutdown()/re-init must never be served again."""
    import ray

    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    return (sf_dir, job)


_EPOCH0_US = np.datetime64("2024-01-01", "us")


def _day_index(ts) -> np.ndarray:
    """Days since 2024-01-01 as int64. Single home of the day-index
    arithmetic shared by q103/q132/q135/q140: the SQL mirrors all encode
    the SAME expression — CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01')
    / 86400000000.0) AS BIGINT) — and spans here are nonnegative, so
    numpy's floor division and DuckDB's truncation agree; any change must
    land in both shapes at once."""
    arr = ts.to_numpy() if hasattr(ts, "to_numpy") else np.asarray(ts)
    return (
        (arr.astype("datetime64[us]") - _EPOCH0_US)
        // np.timedelta64(86400_000_000, "us")
    ).astype("int64")


# verified pairs are the shared prefix of q13 and q30; the result is small
# post-LSH (bounded by true near-dups), so one materialized copy per
# (sf_dir, session) is a legitimate cache — same policy as _EXTRACT_CACHE
_PAIRS_CACHE: dict[tuple, "rd.Dataset"] = {}


def q13_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs verified by true Jaccard
    (shingle -> minhash -> band -> bucket groupby; verification resolves
    texts via keyed bucket joins — the corpus is never driver-materialized
    or broadcast). SQL-oracled: shingle hashes are 62-bit Horner chains and
    the permutation constants are embedded literals, so DuckDB rebuilds the
    exact signatures, band-matches candidates (list-slice equality — the
    lossless mirror of the banded shuffle), and verifies Jaccard over
    shingle-string sets (_q13_sql)."""
    key = _session_key(sf_dir)
    ds = _PAIRS_CACHE.get(key)
    if ds is None:
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        ds = minhash_lsh_pairs(docs, threshold_x1000=500).materialize()
        _PAIRS_CACHE[key] = ds
    return ds


def _q13_base_sql(num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                  seed: int = 7, threshold_x1000: int = 500) -> str:
    """DuckDB mirror of minhash_lsh_pairs: the CTE chain ends in a `pairs`
    relation (doc_a, doc_b, jaccard_x1000). Shared by the q13 and q30
    oracles.

    Exactness notes: (a*x+b) is computed in numpy uint64 (wraps mod 2^64)
    before the Mersenne mod — the SQL mirrors that with HUGEINT % 2^64.
    `& 0xFFFFFFFF` == % 4294967296 for non-negative values. Jaccard is
    counted over distinct shingle STRINGS — identical counts to the hashed
    sets the Ray side intersects, 62-bit collisions aside."""
    from medical_ocr_service_ray.functions.hashing import minhash_params

    a, b = minhash_params(num_perm, seed)
    rows_per_band = num_perm // bands
    perm_values = ", ".join(
        f"({k}, {int(a[k])}, {int(b[k])})" for k in range(num_perm)
    )
    horner = (
        "list_reduce(list_transform(string_split_regex(s, ''),"
        " c -> CAST(unicode(c) AS BIGINT)), (x, y) -> (x * 257 + y) % 2147483647)"
        " | (list_reduce(list_transform(string_split_regex(s, ''),"
        " c -> CAST(unicode(c) AS BIGINT)), (x, y) -> (x * 263 + y) % 2147483647) << 31)"
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\p{{L}}\p{{N}}_]+') AS tk
  FROM documents
), shstr AS (
  SELECT doc_id, unnest(
    CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
         WHEN len(tk) < {shingle_k} THEN [array_to_string(tk, ' ')]
         ELSE list_transform(range(1, len(tk) - {shingle_k - 2}),
                             i -> {" || ' ' || ".join(f"tk[i+{j}]" for j in range(shingle_k)).replace("tk[i+0]", "tk[i]")})
    END) AS s
  FROM toks
), shh AS (
  SELECT DISTINCT doc_id, {horner} AS h
  FROM shstr
), perms(k, pa, pb) AS (
  VALUES {perm_values}
), sigv AS (
  SELECT doc_id, k,
         MIN(CAST(((CAST(pa AS HUGEINT) * CAST(h AS HUGEINT) + pb)
                   % 18446744073709551616) % 2305843009213693951
                  % 4294967296 AS BIGINT)) AS mh
  FROM shh CROSS JOIN perms
  GROUP BY doc_id, k
), sigfull AS (
  SELECT d.doc_id, p.k, COALESCE(s.mh, 4294967295) AS mh
  FROM (SELECT doc_id FROM documents) d
  CROSS JOIN perms p
  LEFT JOIN sigv s ON s.doc_id = d.doc_id AND s.k = p.k
), bandrow AS (
  SELECT doc_id, k // {rows_per_band} AS band_id, list(mh ORDER BY k) AS bsig
  FROM sigfull GROUP BY doc_id, k // {rows_per_band}
), cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bandrow x JOIN bandrow y
    ON x.band_id = y.band_id AND x.bsig = y.bsig AND x.doc_id < y.doc_id
), shsets AS (
  SELECT doc_id, list(DISTINCT s) AS ss FROM shstr GROUP BY doc_id
), verif AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(COALESCE(x.ss, []), COALESCE(y.ss, []))) AS inter,
         len(COALESCE(x.ss, [])) + len(COALESCE(y.ss, []))
           - len(list_intersect(COALESCE(x.ss, []), COALESCE(y.ss, []))) AS uni
  FROM cand c
  LEFT JOIN shsets x ON x.doc_id = c.doc_a
  LEFT JOIN shsets y ON y.doc_id = c.doc_b
), pairs AS (
  SELECT doc_a, doc_b,
         CAST(CASE WHEN uni = 0 THEN 1000 ELSE (1000 * inter) // uni END AS BIGINT)
           AS jaccard_x1000
  FROM verif
  WHERE (CASE WHEN uni = 0 THEN 1000 ELSE (1000 * inter) // uni END) >= {threshold_x1000}
)"""


def _q13_sql() -> str:
    return _q13_base_sql() + "\nSELECT doc_a, doc_b, jaccard_x1000 FROM pairs\n"


def _q30_sql() -> str:
    """Connected components over the q13 pairs: recursive min-label
    propagation (the SQL mirror of dedup_clusters_distributed's fixpoint)."""
    return _q13_base_sql() + """
, edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
), nodes AS (
  SELECT DISTINCT u AS node FROM edges
), reach AS (
  WITH RECURSIVE r(node, lbl) AS (
    SELECT node, node FROM nodes
    UNION
    SELECT e.v, r.lbl FROM r JOIN edges e ON e.u = r.node
  ) SELECT * FROM r
), comp AS (
  SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
)
SELECT c.doc_id, c.cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS cluster_size
FROM comp c
"""


def q14_simhash_pairs(sf_dir: str):
    """SimHash hamming<=3 near-dup pairs. SQL-oracled: the banded Ray plan
    finds exactly the pairs a brute-force O(n^2) scan finds (hamming<=3 over
    4x16-bit bands => pigeonhole guarantees >=1 identical band), and the
    per-token hash is arithmetic (functions/hashing.py:token_hash62), so
    DuckDB reproduces signatures bit-exactly (_Q14_SQL)."""
    return simhash_pairs(_read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3)


# DuckDB mirror of simhash_pairs: same tokenizer (\w+ on lower()), same
# 62-bit two-chain Horner token hash, same +/-1 bit vote with ties -> 0,
# then brute-force pairing (equivalent to the banded LSH for hamming<=3).
_Q14_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\p{L}\p{N}_]+')) AS tok
  FROM documents
), th AS (
  SELECT doc_id,
         list_reduce(list_transform(string_split_regex(tok, ''),
                                    c -> CAST(unicode(c) AS BIGINT)),
                     (a, b) -> (a * 257 + b) % 2147483647)
         | (list_reduce(list_transform(string_split_regex(tok, ''),
                                       c -> CAST(unicode(c) AS BIGINT)),
                        (a, b) -> (a * 263 + b) % 2147483647) << 31) AS h
  FROM toks
), votes AS (
  SELECT doc_id, bitpos,
         SUM(CASE WHEN (h >> bitpos) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN (SELECT unnest(range(0, 62)) AS bitpos) bits
  GROUP BY doc_id, bitpos
), sig AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bitpos) ELSE 0 END) AS simhash
  FROM votes GROUP BY doc_id
), sigall AS (
  SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
  FROM documents d LEFT JOIN sig s USING (doc_id)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sigall a JOIN sigall b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# --------------------------------------------------------------------- q15

_SHINGLE_THRESHOLD_X1000 = 200


# A (source, shingle) shared by d documents emits d*(d-1)/2 pair rows;
# stopword-like bigrams ("of the") make that quadratic at scale. Shingles
# above this document-frequency cap are dropped BEFORE pairing — they carry
# ~zero Jaccard signal (present in everything) and unbounded cost. The SQL
# oracle applies the identical cap, so correctness stays hash-exact.
_Q15_DF_CAP = 128


def q15_ngram_jaccard(sf_dir: str):
    """Exact word-bigram Jaccard for same-source document pairs:
    shingle explode -> (source, shingle) groupby -> pair counts -> integer
    jaccard. The same-source restriction bounds the pair blowup (at 100 TB
    the 'source' key is the co-location/bucketing key).

    Physical-plan choices (measured at sf0.1): each exploded row CARRIES its
    doc's distinct-shingle count, so pair rows are self-contained
    (doc_a, doc_b, na, nb) — no separate counting pass, no broadcast, one
    read and one explode total. (source, shingle) travels as ONE vectorized
    64-bit hash key, not strings (same pair/intersection counts — a 64-bit
    collision at this cardinality is ~1e-7 — for a fraction of the shuffle
    bytes). Pair generation is a vectorized self-merge per bucket (no Python
    per-group loop), hot shingles are cut by ``_Q15_DF_CAP`` (global DF is
    exact per bucket because all rows of a key share a bucket), and the
    per-bucket output is pre-aggregated to (pair, partial-intersection)
    rows, so the second exchange moves at most num_buckets rows per
    surviving pair."""
    from medical_ocr_service_ray.functions.textstats import _NONWS_RE  # tokenizer shared

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        srcs = t["source"].to_pylist()
        texts = t["text"].to_pylist()
        all_sh: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for i, txt in enumerate(texts):
            ws = _NONWS_RE.findall((txt or "").lower().strip())
            shset = set(f"{a} {b}" for a, b in zip(ws, ws[1:]))
            all_sh.extend(shset)
            counts[i] = len(shset)
        h_sh = pd.util.hash_array(np.asarray(all_sh, dtype=object))
        h_src = pd.util.hash_array(np.asarray(srcs, dtype=object))
        # joint (source, shingle) key: golden-ratio mix keeps it a single
        # int64 column through the shuffle instead of shipping source strings
        key = (h_sh * np.uint64(0x9E3779B97F4A7C15) + np.repeat(h_src, counts)).astype(
            "int64"
        )
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
                "key": pa.array(key, pa.int64()),
                "n_sh": pa.array(np.repeat(counts, counts), pa.int64()),
            }
        )

    sh = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def pairs_per_shingle(df: pd.DataFrame) -> pd.DataFrame:
        """(a<b) doc pairs per key group via vectorized self-merge, partial
        intersection counts per pair. Singleton keys dropped first; keys
        above the DF cap dropped (each would emit O(DF^2) pairs)."""
        df = df[df.duplicated("key", keep=False)]
        if len(df):
            sizes = df.groupby("key")["doc_id"].transform("size")
            df = df[sizes <= _Q15_DF_CAP]
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_a": pd.array([], "int64"),
                    "doc_b": pd.array([], "int64"),
                    "na": pd.array([], "int64"),
                    "nb": pd.array([], "int64"),
                    "inter_part": pd.array([], "int64"),
                }
            )
        m = df.merge(df, on="key", suffixes=("_a", "_b"))
        m = m[m.doc_id_a.to_numpy() < m.doc_id_b.to_numpy()]
        part = (
            m.groupby(["doc_id_a", "doc_id_b", "n_sh_a", "n_sh_b"], as_index=False)
            .size()
            .rename(
                columns={
                    "doc_id_a": "doc_a",
                    "doc_id_b": "doc_b",
                    "n_sh_a": "na",
                    "n_sh_b": "nb",
                    "size": "inter_part",
                }
            )
        )
        part["inter_part"] = part["inter_part"].astype("int64")
        return part

    def combine_jaccard(df: pd.DataFrame) -> pd.DataFrame:
        """Sum partial intersections per pair and apply the threshold INSIDE
        the combine — the driver never holds the sub-threshold pair set."""
        g = df.groupby(["doc_a", "doc_b", "na", "nb"], as_index=False)["inter_part"].sum()
        inter = g.inter_part.astype("int64")
        g["jaccard_x1000"] = (1000 * inter) // (g.na + g.nb - inter)
        out = g[g.jaccard_x1000 >= _SHINGLE_THRESHOLD_X1000]
        return out[["doc_a", "doc_b", "jaccard_x1000"]].reset_index(drop=True)

    pair_rows = bucketed_combine(sh, "key", pairs_per_shingle, num_buckets=16)
    return bucketed_combine(pair_rows, "doc_a", combine_jaccard)


_Q15_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS ws
  FROM documents WHERE trim(text) <> ''
), sh AS (
  SELECT DISTINCT doc_id, source, ws[i] || ' ' || ws[i+1] AS shingle
  FROM toks, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
), counts AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), sh_capped AS (
  -- hot-shingle document-frequency cap, mirrored from the Ray plan
  SELECT doc_id, source, shingle FROM (
    SELECT doc_id, source, shingle,
           COUNT(*) OVER (PARTITION BY source, shingle) AS df
    FROM sh
  ) WHERE df <= {_Q15_DF_CAP}
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM sh_capped a
  JOIN sh_capped b ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, (1000 * i) // (ca.n_sh + cb.n_sh - i) AS jaccard_x1000
FROM inter
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE (1000 * i) // (ca.n_sh + cb.n_sh - i) >= {_SHINGLE_THRESHOLD_X1000}
"""


# --------------------------------------------------------------------- q16/q17

# extraction is the expensive shared prefix of q16/q17/q24/q25: materialize
# once per (sf_dir, session) so a sequential driver run over all queries
# extracts once (the result is small relative to the object store; the
# standalone pipelines never materialize mid-stream)
_EXTRACT_CACHE: dict[tuple, "rd.Dataset"] = {}


def _extracted_ordered(sf_dir: str) -> "rd.Dataset":
    key = _session_key(sf_dir)
    ds = _EXTRACT_CACHE.get(key)
    if ds is None:
        from medical_ocr_service_ray.pipelines.extraction import run_extraction_pipeline
        from medical_ocr_service_ray.synth import ensure_transcripts_for_sf

        corpus = ensure_transcripts_for_sf(sf_dir)
        ds = run_extraction_pipeline(corpus, ordered=True).materialize()
        _EXTRACT_CACHE[key] = ds
    return ds


def q16_extract_transcripts(sf_dir: str):
    """FLAGSHIP: the full extraction pipeline over the deterministic synthetic
    transcript corpus sized to this sf (north rule). SQL-oracled since r4 via
    the single-process golden fixture (_golden_fixture_dir): the oracle reads
    the serial loop's output, so the driver hash-compares distributed vs
    serial extraction — the golden parity gate, driver-visible."""
    ds = _extracted_ordered(sf_dir)
    _golden_fixture_dir(sf_dir)

    def flatten(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        n_spans = pc.list_value_length(t["spans"]).cast(pa.int32())
        n_warnings = pc.list_value_length(t["warnings"]).cast(pa.int32())
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "role": t["role"],
                "content_type": t["content_type"],
                "extracted_text": t["extracted_text"],
                "n_spans": n_spans,
                "n_warnings": n_warnings,
                "confidence": t["confidence"],
                "text_sha256": t["text_sha256"],
            }
        )

    return ds.map_batches(flatten, batch_format="pyarrow", zero_copy_batch=True)


_EXTRACT_VIEW_KEY: list = [None]  # last (sf_dir, session) written to .../current


def _extraction_view_dir(sf_dir: str) -> str:
    """Write the columns the q17/q27 oracles consume (conv_id, turn_idx,
    role, content_type, extracted_text, conf100 int64) to the FIXED path
    /tmp/mosr_extraction_view/current, so the DuckDB oracle (a static SQL
    string with no sf parameter) aggregates the SAME rows the distributed
    rollup aggregates regardless of which sf the harness runs. The query
    writes the view before returning; the harness runs the oracle after the
    query. conf100 is rounded on the Ray side (np.rint, half-to-even) so
    the oracle checks pure SQL aggregation — extraction semantics are gated
    by the golden parity pytest, this view oracles the distributed
    rollup/assembly on top."""
    import shutil as _shutil

    out = "/tmp/mosr_extraction_view/current"
    key = _session_key(sf_dir)
    # Fixed SHARED path: trust the memo only while the on-disk KEY marker
    # still names this (sf_dir, session) — a concurrent harness process may
    # have rewritten `current` (same contract as _golden_fixture_dir).
    if _EXTRACT_VIEW_KEY[0] == key:
        try:
            if (Path(out) / "KEY").read_text() == repr(key):
                return out
        except OSError:
            pass

    def project(t: pa.Table) -> pa.Table:
        conf = np.rint(
            np.asarray(t["confidence"].to_numpy(zero_copy_only=False), dtype=np.float64) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "role": t["role"],
                "content_type": t["content_type"],
                "extracted_text": t["extracted_text"],
                "conf100": pa.array(conf, pa.int64()),
            }
        )

    _shutil.rmtree(out, ignore_errors=True)
    q16_extract_transcripts(sf_dir).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(out)
    (Path(out) / "KEY").write_text(repr(key))
    _EXTRACT_VIEW_KEY[0] = key
    return out


_GOLDEN_VIEW_KEY: list = [None]  # last (sf_dir, session) copied to .../current


def _q26_n_media(sf_dir: str) -> int:
    """Single home of the q26 media-fixture size rule — the query and its
    serial golden (_golden_fixture_dir) MUST agree on n or the hash gate
    fails confusingly. Keyed on the sf directory BASENAME only, so a parent
    path containing '0.1' cannot misfire."""
    import os

    return 256 if "0.1" in os.path.basename(os.path.normpath(sf_dir)) else 64


def _golden_fixture_dir(sf_dir: str) -> str | None:
    """Write the SINGLE-PROCESS golden for the flagship to the fixed path
    /tmp/mosr_golden/current so q16/q24 get real DuckDB oracles: the oracle
    side is the serial loop (oracle.py — same pure functions, no Ray), the
    query side is the distributed pipeline, so the SQL hash-compare gates the
    distribution (batching, ordering, actor-pool broadcast) end-to-end from
    the driver's harness, not just from pytest. Cached on disk per
    (corpus, extractor_version) — the 33 s serial extract at sf0.01 runs once
    per machine. Skipped under MOSR_SKIP_ORACLE_FIXTURES=1 (bench timing
    runs set it: nothing reads the fixtures there and the serial loop is
    deliberately unparallelized)."""
    import os
    import shutil as _shutil

    if os.environ.get("MOSR_SKIP_ORACLE_FIXTURES") == "1":
        return None
    from medical_ocr_service_ray.schemas import EXTRACTOR_VERSION
    from medical_ocr_service_ray.synth import ensure_transcripts_for_sf

    cur = Path("/tmp/mosr_golden/current")
    key = _session_key(sf_dir)
    # `current` is a fixed SHARED path: another process (a concurrent sweep
    # at a different sf) may have overwritten it since our memo was set, so
    # a memo hit is only trusted when the on-disk marker still names THIS
    # corpus — otherwise we fall through and re-copy.
    marker = f"{sf_dir}|{EXTRACTOR_VERSION}"
    if _GOLDEN_VIEW_KEY[0] == key:
        try:
            if (cur / "KEY").read_text() == marker:
                return str(cur)
        except OSError:
            pass

    corpus = ensure_transcripts_for_sf(sf_dir)
    cache = Path("/tmp/mosr_golden") / f"{corpus.name}-{EXTRACTOR_VERSION}"
    flat_p = cache / "q16_flat.parquet"
    q24_p = cache / "q24_matches.parquet"
    if not (flat_p.exists() and q24_p.exists()):
        cache.mkdir(parents=True, exist_ok=True)
        from medical_ocr_service_ray.oracle import oracle_extract_dir

        golden = oracle_extract_dir(corpus)
        pq.write_table(
            pa.table(
                {
                    "conv_id": golden["conv_id"],
                    "turn_idx": golden["turn_idx"],
                    "role": golden["role"],
                    "content_type": golden["content_type"],
                    "extracted_text": golden["extracted_text"],
                    "n_spans": pc.list_value_length(golden["spans"]).cast(pa.int32()),
                    "n_warnings": pc.list_value_length(golden["warnings"]).cast(
                        pa.int32()
                    ),
                    "confidence": golden["confidence"],
                    "text_sha256": golden["text_sha256"],
                }
            ),
            flat_p,
        )
        pq.write_table(_q24_serial_golden(golden), q24_p)

    from medical_ocr_service_ray.stages.multimodal import MEDIA_FIXTURE_VERSION

    n_media = _q26_n_media(sf_dir)
    q26_p = cache / f"q26_media_{n_media}_v{MEDIA_FIXTURE_VERSION}.parquet"
    if not q26_p.exists():
        cache.mkdir(parents=True, exist_ok=True)
        pq.write_table(_q26_serial_golden(n_media), q26_p)

    _shutil.rmtree(cur, ignore_errors=True)
    cur.mkdir(parents=True, exist_ok=True)
    _shutil.copy2(flat_p, cur / "q16_flat.parquet")
    _shutil.copy2(q24_p, cur / "q24_matches.parquet")
    _shutil.copy2(q26_p, cur / "q26_media.parquet")
    (cur / "KEY").write_text(marker)
    _GOLDEN_VIEW_KEY[0] = key
    return str(cur)


def _q26_serial_golden(n: int) -> pa.Table:
    """Serial (no-Ray) mirror of q26 over the SAME deterministic media
    fixture: sniff + the MediaDecoderStub feature decode applied in ONE
    plain call over the whole table — the SQL hash-compare then gates
    exactly the distributed risk (the actor pool's batch_size=16 slicing
    and concurrency must not change a single feature bit)."""
    from medical_ocr_service_ray.stages.multimodal import (
        MediaDecoderStub,
        sniff_media_batch,
        synth_media_table,
    )

    tbl = synth_media_table(n)
    sn = sniff_media_batch(tbl).to_pandas()[
        ["item_id", "sniffed_mime", "mime_mismatch"]
    ]
    ft = MediaDecoderStub(op="features")(tbl).to_pandas()
    ft["feat_sum_x1000"] = ft.features.map(lambda f: int(sum(f) * 1000)).astype("int64")
    out = sn.merge(ft[["item_id", "feat_sum_x1000"]], on="item_id")
    return pa.Table.from_pandas(out, preserve_index=False)


def _q24_serial_golden(golden: pa.Table) -> pa.Table:
    """Serial (no-Ray) mirror of q24: the same pure matching pieces
    (fold_accents, _PROCEDURE_RE, make_term_index, match_term) applied in a
    plain loop over the golden extraction — checks the TermMatcher actor
    pool's broadcast/batching/dedup plumbing, with an unbounded memo where
    the actor uses the bounded LRU (cache policy must not change results)."""
    from medical_ocr_service_ray.functions.normalize import fold_accents
    from medical_ocr_service_ray.functions.spans import _PROCEDURE_RE
    from medical_ocr_service_ray.stages.enrich import (
        load_agreements,
        load_lookup_terms,
        make_term_index,
        match_term,
    )

    terms = load_lookup_terms()
    index = make_term_index(terms)
    agreements = frozenset(load_agreements(terms))
    memo: dict[str, list] = {}
    n_matched, best_id, best_agr = [], [], []
    for text in golden["extracted_text"].to_pylist():
        folded = fold_accents(text or "").upper()
        queries = list(dict.fromkeys(m.group(0) for m in _PROCEDURE_RE.finditer(folded)))
        matches: list[tuple] = []
        seen: set[int] = set()
        for q in queries:
            res = memo.get(q)
            if res is None:
                res = match_term(q, index, agreements)
                memo[q] = res
            for tid, score, agr in res:
                if tid not in seen:
                    seen.add(tid)
                    matches.append((tid, score, agr))
        n_matched.append(len(matches))
        best_id.append(matches[0][0] if matches else -1)
        best_agr.append(bool(matches[0][2]) if matches else False)
    return pa.table(
        {
            "conv_id": golden["conv_id"],
            "turn_idx": golden["turn_idx"],
            "n_matched_terms": pa.array(n_matched, pa.int32()),
            "best_term_id": pa.array(best_id, pa.int32()),
            "best_has_agreement": pa.array(best_agr, pa.bool_()),
        }
    )


_Q16_SQL = """
SELECT conv_id, turn_idx, role, content_type, extracted_text,
       n_spans, n_warnings, confidence, text_sha256
FROM read_parquet('/tmp/mosr_golden/current/q16_flat.parquet')
"""

_Q24_SQL = """
SELECT conv_id, turn_idx, n_matched_terms, best_term_id, best_has_agreement
FROM read_parquet('/tmp/mosr_golden/current/q24_matches.parquet')
"""

_Q26_SQL = """
SELECT item_id, sniffed_mime, mime_mismatch, feat_sum_x1000
FROM read_parquet('/tmp/mosr_golden/current/q26_media.parquet')
"""


def q17_conv_stats(sf_dir: str):
    """Per-conversation rollup of extraction output (A2 analogue:
    COUNT(items)/AVG(confianza) per header, pre-visacion.service.js:388-410).
    SQL-oracled via the materialized extraction view (_extraction_view_dir):
    the oracle re-aggregates the identical rows in DuckDB, checking the
    bucketed distributed combine end-to-end."""
    ds = q16_extract_transcripts(sf_dir)
    _extraction_view_dir(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            conf100=np.rint(df.confidence.astype("float64") * 100).astype("int64"),
            is_html=(df.content_type == "html").astype("int64"),
            is_pdf=(df.content_type == "pdfish").astype("int64"),
            is_plain=(df.content_type == "plain").astype("int64"),
        )
        return df.groupby("conv_id", as_index=False).agg(
            p_n=("conf100", "size"),
            p_conf=("conf100", "sum"),
            p_html=("is_html", "sum"),
            p_pdf=("is_pdf", "sum"),
            p_plain=("is_plain", "sum"),
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("conv_id", as_index=False).agg(
            n_turns=("p_n", "sum"),
            sum_conf100=("p_conf", "sum"),
            n_html=("p_html", "sum"),
            n_pdfish=("p_pdf", "sum"),
            n_plain=("p_plain", "sum"),
        )
        g["avg_confidence_x100"] = g.sum_conf100.astype("int64") // g.n_turns.astype("int64")
        return g[["conv_id", "n_turns", "n_html", "n_pdfish", "n_plain", "avg_confidence_x100"]]

    # conv_id cardinality is unbounded at scale -> bucketed distributed combine
    return partial_then_combine(ds, partial, "conv_id", combine, num_buckets=16)


# The driver runs the correctness harness at sf0.01; q17's Ray run writes
# the view before returning, so the oracle (run after the query, as the
# harness does) reads the same rows. np.rint rounding happens Ray-side
# (conf100 is already an int in the view) — the SQL is pure aggregation.
_Q17_SQL = """
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(CASE WHEN content_type = 'html'   THEN 1 ELSE 0 END) AS BIGINT) AS n_html,
       CAST(SUM(CASE WHEN content_type = 'pdfish' THEN 1 ELSE 0 END) AS BIGINT) AS n_pdfish,
       CAST(SUM(CASE WHEN content_type = 'plain'  THEN 1 ELSE 0 END) AS BIGINT) AS n_plain,
       CAST(SUM(conf100) // COUNT(*) AS BIGINT) AS avg_confidence_x100
FROM read_parquet('/tmp/mosr_extraction_view/current/*.parquet')
GROUP BY conv_id
"""


# --------------------------------------------------------------------- q18

def q18_semi_anti_join(sf_dir: str):
    """Semi + anti join via broadcast key set (J5/J7: set-membership filter,
    anti-side capture)."""
    import ray  # local import keeps module importable without a session

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"])
    rich = {
        k
        for k, b in zip(cust["c_custkey"].to_pylist(), cust["c_acctbal"].to_pylist())
        if b > 5000.0
    }
    key_ref = ray.put(rich)
    orders = _read(sf_dir, "orders", ["o_custkey"])
    n_semi = orders.map_batches(
        SemiAntiFilter,
        fn_constructor_kwargs={"key_set_ref": key_ref, "key_col": "o_custkey", "anti": False},
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).count()
    n_anti = orders.map_batches(
        SemiAntiFilter,
        fn_constructor_kwargs={"key_set_ref": key_ref, "key_col": "o_custkey", "anti": True},
        batch_format="pyarrow",
        concurrency=(1, 4),
    ).count()
    return pd.DataFrame({"n_semi": [n_semi], "n_anti": [n_anti]}).astype("int64")


_Q18_SQL = """
SELECT
  (SELECT COUNT(*) FROM orders WHERE o_custkey IN
     (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)) AS n_semi,
  (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN
     (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)) AS n_anti
"""


# --------------------------------------------------------------------- q19

def q19_distinct_event_types(sf_dir: str):
    """Distinct values (A10: COUNT(DISTINCT ...) family)."""
    vals = sorted(_read(sf_dir, "events", ["event_type"]).unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


_Q19_SQL = "SELECT DISTINCT event_type FROM events"


# --------------------------------------------------------------------- q20

def q20_fingerprints(sf_dir: str):
    """Winnowing rolling-hash document fingerprints. SQL-oracled: the hash is
    a base-257 Horner chain over codepoints mod 2^31-1 (functions/hashing.py:
    rolling_fingerprint), which DuckDB reproduces exactly via per-window
    Horner expressions (_Q20_SQL)."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        text_stages.fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _q20_sql(window: int = 8, mod_select: int = 16) -> str:
    """Generate the DuckDB mirror of rolling_fingerprint: same Horner chain
    (base 257, mod 2^31-1) over a sliding codepoint window, same
    h % mod_select == 0 selection, same short-text whole-string fallback."""
    m = (1 << 31) - 1
    # Horner over cps[i] .. cps[i+window-1] (DuckDB lists are 1-indexed;
    # i ranges over 1..n-window+1). Mirrors h=(h*257+cp)%m per step.
    expr = "cps[i]"
    for k in range(1, window):
        expr = f"(({expr}) * 257 + cps[i+{k}]) % {m}"
    return f"""
WITH cp AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR text = ''
              THEN CAST([] AS BIGINT[])
              ELSE list_transform(string_split_regex(text, ''),
                                  c -> CAST(unicode(c) AS BIGINT)) END AS cps
  FROM documents
), fp AS (
  SELECT doc_id,
    CASE
      WHEN len(cps) = 0 THEN CAST([] AS BIGINT[])
      WHEN len(cps) < {window}
        THEN [list_reduce(cps, (a, b) -> (a * 257 + b) % {m})]
      ELSE list_filter(
             list_transform(range(1, len(cps) - {window - 2}), i -> {expr}),
             h -> h % {mod_select} = 0)
    END AS fps
  FROM cp
)
SELECT doc_id,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       CAST(COALESCE(list_min(fps), 0) AS BIGINT) AS min_fingerprint
FROM fp
"""


# --------------------------------------------------------------------- q21

def q21_hourly_user_windows(sf_dir: str):
    """Tumbling 1-hour window per user (streaming-shaped: event-time window
    as groupby over (key, hour) — Ray Data has no watermarks, ordering comes
    from the key, SURVEY.md §2.9)."""
    ds = _read(sf_dir, "events", ["ts", "user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "user_id": df.user_id,
                    "hour": df.ts.dt.strftime("%Y-%m-%d %H"),
                    "v4": _cents(df.value, 10000),
                }
            )
            .groupby(["user_id", "hour"], as_index=False)
            .agg(p_n=("v4", "size"), p_v4=("v4", "sum"))
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "hour"], as_index=False).agg(
            n_events=("p_n", "sum"), v4=("p_v4", "sum")
        )
        g["n_events"] = g.n_events.astype("int64")
        g["sum_value"] = g.v4.astype("int64") / 10000.0
        return g[["user_id", "hour", "n_events", "sum_value"]]

    return partial_then_combine(ds, partial, "user_id", combine, num_buckets=16)


_Q21_SQL = """
SELECT user_id, strftime(ts, '%Y-%m-%d %H') AS hour, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value*10000, 0) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_value
FROM events
GROUP BY user_id, hour
"""


# --------------------------------------------------------------------- q22/q23

def q22_ann_cosine_topk(sf_dir: str):
    """Brute-force cosine top-10 for the 3 lowest-vec_id query vectors,
    INTEGER-EXACT: embeddings quantize to floor(x*1000) int64 and the score
    is sign(dot) * (10^12 * dot^2) // (|q|^2 * |v|^2) in arbitrary-precision
    ints — strictly monotone in cosine over the quantized vectors, so the
    ranking is bit-reproducible by the DuckDB oracle (_Q22_SQL; HUGEINT).
    Plan shape is q12's: per-batch partial top-k, tiny driver merge. The
    float cosine path stays in stages/ann.py (brute_force_topk,
    pytest-gated vs numpy) — float sum order is engine-specific, so the SQL
    contract pins the integer variant. At 100 TB the big-int rescore would
    follow a float prefilter of per-batch candidates."""
    import ray

    emb = _emb_query_table(sf_dir)
    ids = emb["vec_id"].to_pylist()
    order = np.argsort(ids)[:3]
    qids = [int(ids[int(i)]) for i in order]
    qq = np.floor(
        np.stack(
            [np.asarray(emb["embedding"][int(i)].as_py(), dtype=np.float64) for i in order]
        )
        * 1000.0
    ).astype(np.int64)
    query_ref = ray.put((qids, qq))

    def score_topk(t: pa.Table) -> pa.Table:
        from medical_ocr_service_ray.stages.ann import _stack_embeddings

        qids_, qq_ = ray.get(query_ref)
        v = np.floor(_stack_embeddings(t).astype(np.float64) * 1000.0).astype(np.int64)
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        nb2 = (v * v).sum(axis=1)
        out_q, out_v, out_s = [], [], []
        for k, qid in enumerate(qids_):
            na2 = int((qq_[k] * qq_[k]).sum())
            dots = v @ qq_[k]
            # exact big-int scores; bounded work: one partial top-10 per batch
            scores = np.fromiter(
                (
                    0
                    if na2 == 0 or b2 == 0
                    else (-1 if d < 0 else 1)
                    * ((10**12 * int(d) * int(d)) // (na2 * int(b2)))
                    for d, b2 in zip(dots, nb2)
                ),
                dtype=np.int64,
                count=len(vids),
            )
            top = np.lexsort((vids, -scores))[:10]
            out_q.extend([qid] * len(top))
            out_v.extend(vids[top].tolist())
            out_s.extend(scores[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "score_x1e12": pa.array(out_s, pa.int64()),
            }
        )

    merged = (
        _emb_dataset(sf_dir)
        .map_batches(score_topk, batch_format="pyarrow")
        .to_pandas()
    )
    out = (
        merged.sort_values(["query_id", "score_x1e12", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(10)
    )
    return out.reset_index(drop=True)


_Q22_SQL = """
WITH v AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vv
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, vv AS qv FROM v ORDER BY vec_id LIMIT 3
), scored AS (
  SELECT q.query_id, v.vec_id,
         CAST(list_inner_product(q.qv, v.vv) AS HUGEINT) AS dot,
         CAST(list_inner_product(q.qv, q.qv) AS HUGEINT) AS na2,
         CAST(list_inner_product(v.vv, v.vv) AS HUGEINT) AS nb2
  FROM q CROSS JOIN v
)
SELECT query_id, vec_id,
       CAST(CASE WHEN na2 * nb2 = 0 THEN 0
                 ELSE (CASE WHEN dot < 0 THEN -1 ELSE 1 END)
                      * ((1000000000000 * dot * dot) // (na2 * nb2))
            END AS BIGINT) AS score_x1e12
FROM scored
QUALIFY row_number() OVER (
  PARTITION BY query_id
  ORDER BY CASE WHEN na2 * nb2 = 0 THEN 0
                ELSE (CASE WHEN dot < 0 THEN -1 ELSE 1 END)
                     * ((1000000000000 * dot * dot) // (na2 * nb2)) END DESC,
           vec_id
) <= 10
"""


def _cos_pairs_group(group: "pa.Table", t_num: int, t_den: int) -> "pa.Table":
    """The exact-rational cosine pair kernel shared by the blocked
    embedding-near-dup queries (q23 label-blocked, q158 quantizer-blocked):
    vectors quantize to floor(x*1000) int64; a pair passes iff dot > 0 and
    t_den^2*dot^2 >= t_num^2*|a|^2*|b|^2. The int64 matmul is CHUNKED
    (1024 x G per step) so peak memory is O(chunk*G), not O(G^2); a float
    PRE-mask with margin (never excludes a true positive: float64 cosine
    of int64 inputs is within ~1e-14) gates the exact Python-int test to
    the tiny candidate set — overflow-free at any vector scale."""
    from medical_ocr_service_ray.stages.ann import _stack_embeddings

    tn2, td2 = t_num * t_num, t_den * t_den
    v = np.floor(_stack_embeddings(group).astype(np.float64) * 1000.0).astype(np.int64)
    ids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    v, ids = v[order], ids[order]
    nb2 = (v * v).sum(axis=1)  # |v|^2, int64
    n = len(ids)
    a_o, b_o, s_o = [], [], []
    chunk = 1024
    t_f = t_num / t_den
    nb2f = nb2.astype(np.float64)
    for i0 in range(0, n, chunk):
        i1 = min(i0 + chunk, n)
        dots = v[i0:i1] @ v.T  # (chunk, n) int64, exact
        denf = np.sqrt(nb2f[i0:i1, None] * nb2f[None, :])
        denf[denf == 0] = 1.0
        cosf = dots / denf
        upper = np.arange(n)[None, :] > np.arange(i0, i1)[:, None]
        cand = (dots > 0) & (cosf >= t_f - 1e-9) & upper
        for li, j in zip(*np.nonzero(cand)):
            gi = i0 + int(li)
            d = int(dots[li, j])
            den = int(nb2[gi]) * int(nb2[j])
            if den == 0 or td2 * d * d < tn2 * den:
                continue
            a_o.append(int(ids[gi]))
            b_o.append(int(ids[j]))
            s_o.append((10**6 * d * d) // den)
    return pa.table(
        {
            "vec_a": pa.array(a_o, pa.int64()),
            "vec_b": pa.array(b_o, pa.int64()),
            "cos2_x1e6": pa.array(s_o, pa.int64()),
        }
    )


def q23_embedding_neardup(sf_dir: str, t_num: int = 7, t_den: int = 20):
    """Embedding-cosine near-dup pairs via same-label blocking + in-group
    brute force (the label column is the IVF-coarse-bucket analogue).

    INTEGER-EXACT semantics (SQL-oracled, _Q23_SQL): vectors quantize to
    floor(x*1000) int64 and a pair passes iff dot > 0 and
    t_den^2 * dot^2 >= t_num^2 * |a|^2 * |b|^2 — i.e. cosine >= t_num/t_den
    as an exact rational, no float compare anywhere. The query pins
    t=7/20=0.35 so the check is non-trivial on the near-orthogonal synthetic
    embeddings (max same-label cos there ~0.47); production near-dup use is
    t=19/20=0.95 (the pytest plants near-identical vectors and runs at that
    threshold). Output score is cos2_x1e6 = (10^6*dot^2)//(|a|^2*|b|^2).

    Partitioning assumption / group-size bound: the blocking key must keep
    each group to G rows; the int64 matmul is CHUNKED (1024 x G per step),
    so peak memory is O(chunk * G), not O(G^2). With G ~ 100k that is
    ~0.8 GB per chunk step: acceptable; beyond that the label must be
    refined (e.g. IVF sub-clustering) before this stage."""
    ds = _emb_dataset(sf_dir)

    def pairs(group: pa.Table) -> pa.Table:
        return _cos_pairs_group(group, t_num, t_den)

    out = ds.groupby("label").map_groups(pairs, batch_format="pyarrow").to_pandas()
    # stable schema even when no pair passes the threshold
    if list(out.columns) != ["vec_a", "vec_b", "cos2_x1e6"]:
        out = pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                            "vec_b": pd.Series(dtype="int64"),
                            "cos2_x1e6": pd.Series(dtype="int64")})
    return out


# t = 7/20: the constants 400 (=t_den^2) and 49 (=t_num^2) mirror the
# query's default exactly — the whole test is integer arithmetic.
_Q23_SQL = """
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vv
  FROM embeddings
), p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(list_inner_product(a.vv, b.vv) AS HUGEINT) AS dot,
         CAST(list_inner_product(a.vv, a.vv) AS HUGEINT) AS na2,
         CAST(list_inner_product(b.vv, b.vv) AS HUGEINT) AS nb2
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       CAST((1000000 * dot * dot) // (na2 * nb2) AS BIGINT) AS cos2_x1e6
FROM p
WHERE dot > 0 AND na2 * nb2 > 0 AND 400 * dot * dot >= 49 * na2 * nb2
"""


# --------------------------------------------------------------------- q24-q26

def q24_enriched_extraction(sf_dir: str):
    """Flagship + semantic-matching enrichment: per-procedure top-k against
    the broadcast lookup_terms dimension with agreement preference (J1/J5/J6
    composed, matching.service.js:351-432). SQL-oracled since r4 against the
    serial matching golden (_q24_serial_golden)."""
    import ray

    from medical_ocr_service_ray.stages.enrich import (
        TermMatcher,
        load_agreements,
        load_lookup_terms,
    )

    ds = q16_extract_transcripts(sf_dir)
    terms = load_lookup_terms()
    enriched = ds.map_batches(
        TermMatcher,
        fn_constructor_kwargs={
            "terms_ref": ray.put(terms),
            "agreements_ref": ray.put(load_agreements(terms)),
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def flatten(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        n_matched = pc.list_value_length(t["matched_terms"]).cast(pa.int32())
        best = [
            (m[0]["term_id"] if m else -1) for m in t["matched_terms"].to_pylist()
        ]
        has_agr = [
            bool(m[0]["has_agreement"]) if m else False for m in t["matched_terms"].to_pylist()
        ]
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "n_matched_terms": n_matched,
                "best_term_id": pa.array(best, pa.int32()),
                "best_has_agreement": pa.array(has_agr, pa.bool_()),
            }
        )

    return enriched.map_batches(flatten, batch_format="pyarrow")


def q25_apply_corrections(sf_dir: str):
    """Corrections overlay join-and-patch (M19/F4: feedback.service.js:306-336).
    Deterministic synthetic corrections patch every 97th turn. SQL-oracled:
    the run persists the corrections table next to the extraction view; the
    oracle re-applies them as a last-writer-wins join-and-patch in DuckDB
    (_Q25_SQL), checking the broadcast patch stage against pure SQL."""
    import pyarrow.parquet as _pq

    from medical_ocr_service_ray.stages.corrections import apply_corrections, synth_corrections
    from medical_ocr_service_ray.synth import ensure_transcripts_for_sf

    corpus = ensure_transcripts_for_sf(sf_dir)
    # corrections are minted from a tiny golden sample (first file only) so
    # the fixture stays cheap at bench scale
    first = sorted(corpus.glob("*.parquet"))[0]
    from medical_ocr_service_ray.oracle import oracle_extract_table

    sample_golden = oracle_extract_table(_pq.read_table(first).slice(0, 2000))
    corrections = synth_corrections(sample_golden, every_nth=97)

    # persist the fixture for the DuckDB oracle: seq = list position, the
    # last-writer-wins tiebreak the applier uses
    _extraction_view_dir(sf_dir)
    corr_path = "/tmp/mosr_extraction_view/corrections.parquet"
    _pq.write_table(
        pa.table(
            {
                "conv_id": pa.array([r["conv_id"] for r in corrections], pa.string()),
                "turn_idx": pa.array([int(r["turn_idx"]) for r in corrections], pa.int32()),
                "field": pa.array([r["field"] for r in corrections], pa.string()),
                "corrected_value": pa.array(
                    [r["corrected_value"] for r in corrections], pa.string()
                ),
                "seq": pa.array(range(len(corrections)), pa.int64()),
            }
        ),
        corr_path,
    )

    ds = q16_extract_transcripts(sf_dir)
    out = apply_corrections(ds, corrections)

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "extracted_text": t["extracted_text"],
                "n_corrected": pc.list_value_length(t["corrected_fields"]).cast(pa.int32()),
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


# Last-writer-wins patch re-applied in SQL over the persisted extraction
# view + corrections fixture. corrected_fields counts every patchable field
# with a correction for the key (extracted_text and content_type).
_Q25_SQL = """
WITH corr AS (
  SELECT conv_id, turn_idx, field, corrected_value
  FROM (SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx, field
                                     ORDER BY seq DESC) AS rn
        FROM read_parquet('/tmp/mosr_extraction_view/corrections.parquet'))
  WHERE rn = 1 AND field IN ('extracted_text', 'content_type')
), patch AS (
  SELECT conv_id, turn_idx,
         COUNT(*) AS n_corrected,
         MAX(CASE WHEN field = 'extracted_text' THEN corrected_value END) AS new_text
  FROM corr GROUP BY conv_id, turn_idx
)
SELECT v.conv_id, CAST(v.turn_idx AS INTEGER) AS turn_idx,
       COALESCE(p.new_text, v.extracted_text) AS extracted_text,
       CAST(COALESCE(p.n_corrected, 0) AS INTEGER) AS n_corrected
FROM read_parquet('/tmp/mosr_extraction_view/current/*.parquet') v
LEFT JOIN patch p USING (conv_id, turn_idx)
"""


def q26_media_features(sf_dir: str):
    """Multimodal plumbing: magic-number sniff + feature decode over a
    deterministic binary-payload fixture (M2/M5 analogues). PNG payloads are
    REAL images decoded by the pure-stdlib codec (functions/png.py), so their
    features come from actual pixel data; formats without a codec in this
    container use the documented deterministic stand-in
    (stages/multimodal.py). SQL-oracled since late r4 against a serial
    single-call golden (_q26_serial_golden → /tmp/mosr_golden/current):
    the hash-compare gates the actor pool's batching/concurrency."""
    import ray.data as _rd

    _golden_fixture_dir(sf_dir)  # oracle fixture (no-op under bench skip)

    from medical_ocr_service_ray.stages.multimodal import (
        media_pipeline,
        sniff_media_batch,
        synth_media_table,
    )

    n = _q26_n_media(sf_dir)
    media = _rd.from_arrow(synth_media_table(n))
    sniffed = media.map_batches(sniff_media_batch, batch_format="pyarrow", batch_size=16)
    feats = media_pipeline(media, op="features")

    sn = sniffed.to_pandas()[["item_id", "sniffed_mime", "mime_mismatch"]]
    ft = feats.to_pandas()
    ft["feat_sum_x1000"] = ft.features.map(lambda f: int(sum(f) * 1000))
    return sn.merge(ft[["item_id", "feat_sum_x1000"]], on="item_id")


# --------------------------------------------------------------------- q27/q28

def q27_assemble_conversations(sf_dir: str):
    """Per-conversation ordered document assembly (T7 invariant + M12 text
    builder analogue). SQL-oracled via the materialized extraction view:
    string_agg(... ORDER BY turn_idx) re-derives the ordered document, so
    the check exercises exactly the distributed risk — stable per-group
    ordering through the bucketed shuffle."""
    from medical_ocr_service_ray.pipelines.assemble import assemble_conversations

    _extraction_view_dir(sf_dir)
    return assemble_conversations(_extracted_ordered(sf_dir))


_Q27_SQL = """
WITH doc AS (
  SELECT conv_id,
         COUNT(*) AS n_turns,
         string_agg(upper(role) || ': ' || extracted_text, chr(10)
                    ORDER BY turn_idx) AS document
  FROM read_parquet('/tmp/mosr_extraction_view/current/*.parquet')
  GROUP BY conv_id
)
SELECT conv_id, CAST(n_turns AS BIGINT) AS n_turns, document,
       CAST(length(document) AS BIGINT) AS doc_chars
FROM doc
"""


def q28_sessionize_events(sf_dir: str):
    """Gap-based (30 min) session windows per user over the events stream
    (streaming-shaped §2.9; SQL oracle via LAG + running session counter)."""
    from medical_ocr_service_ray.pipelines.assemble import sessionize_events

    return sessionize_events(_read(sf_dir, "events", ["event_id", "user_id", "ts"]))


_Q28_SQL = """
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
                                ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, COUNT(*) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts
FROM numbered GROUP BY user_id, session_idx
"""


# --------------------------------------------------------------------- q29

def q29_join_revenue_by_priority(sf_dir: str):
    """Large-large hash join (lineitem x orders on orderkey), the one join
    class the reference never needed (its joins are all broadcast lookups,
    SURVEY.md §2.4). Scale discipline: lineitem is pre-aggregated to one row
    per orderkey BEFORE the join shuffle (combiner-first), then Ray's
    hash-partitioned Dataset.join co-locates the two keyed sides; the final
    5-group rollup is a driver combine. Portable fallback when Dataset.join
    is unavailable: bucket both sides on crc32(key) % B and merge matching
    buckets pairwise inside map_groups."""
    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df.l_extendedprice) * _cents(1.0 - df.l_discount)
        return (
            pd.DataFrame({"l_orderkey": df.l_orderkey, "c": cents})
            .groupby("l_orderkey", as_index=False)
            .agg(p_c=("c", "sum"))
        )

    rev = partial_then_combine(
        line,
        partial,
        "l_orderkey",
        lambda df: df.groupby("l_orderkey", as_index=False).agg(rev4=("p_c", "sum")),
        num_buckets=16,
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = rev.join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def roll_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False).agg(
            p_n=("rev4", "size"), p_rev=("rev4", "sum")
        )

    def roll_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("p_n", "sum"), rev4=("p_rev", "sum")
        )
        g["n_orders"] = g.n_orders.astype("int64")
        g["revenue"] = g.rev4.astype("int64") / 10000.0
        return g[["o_orderpriority", "n_orders", "revenue"]]

    return driver_combine(joined, roll_partial, roll_combine)


_Q29_SQL = """
WITH rev AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)
                * CAST(round((1.0-l_discount)*100, 0) AS BIGINT)) AS BIGINT) AS rev4
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderpriority, COUNT(*) AS n_orders, CAST(SUM(rev4) AS BIGINT) / 10000.0 AS revenue
FROM rev JOIN orders ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------- q30

def q30_dedup_clusters(sf_dir: str):
    """Near-dup clusters: MinHash-LSH verified pairs (shared with q13 via the
    session memo) -> DISTRIBUTED min-label-propagation connected components
    -> (doc_id, cluster_id, cluster_size). SQL-oracled via a recursive-CTE
    min-label propagation over the same pair relation (_q30_sql); pytest
    oracle: equality vs driver union-find
    (tests/test_dedup_clusters_skew.py)."""
    from medical_ocr_service_ray.stages.dedup import dedup_clusters_distributed

    out = dedup_clusters_distributed(q13_minhash_pairs(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# --------------------------------------------------------------------- q31

def q31_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate distinct users over events: one mergeable
    sketch per batch, KB-sized merge instead of a row shuffle (the sketch
    pattern for 10^12-row cardinality). The estimator is deterministic
    (sha256-derived hashes, exact-integer register sum), so it carries an
    exact SQL oracle that rebuilds the registers in DuckDB; the error bound
    vs exact distinct stays pytest-checked (tests/test_sketch.py).
    num_partials (a Ray blocking detail) is deliberately not in the output."""
    from medical_ocr_service_ray.stages.sketch import approx_distinct

    res = approx_distinct(_read(sf_dir, "events", ["user_id"]), "user_id")
    return pd.DataFrame({"approx_distinct": [res["approx_distinct"]]})


def _hll_estimate_sql(rows_sql: str, p: int = 12) -> str:
    """Scalar subquery: the HLL estimate of the single-column row source
    ``rows_sql`` (must SELECT one expression aliased ``v``). Registers
    rebuilt exactly: h = first 8 bytes of sha256(str(v)); idx = top p bits
    (h // 2^(64-p)); rank = leading zeros of the remaining 64-p bits + 1
    via length(bin(low)) — integer-exact, no float log2. Estimate mirrors
    HllSketch.estimate(): integer register sum S = sum(2^(64-M)) in HUGEINT
    (absent registers contribute 2^64 each), then the identical float
    expression, with the same linear-counting branch."""
    m = 1 << p
    low_mod = 1 << (64 - p)
    cap = 64 - p + 1
    two64 = "CAST(1 AS HUGEINT) << 64"
    return f"""
(SELECT CASE WHEN raw <= 2.5 * {m}.0 AND zeros > 0
             THEN {m}.0 * LN({m}.0 / zeros) ELSE raw END
 FROM (
   SELECT (0.7213 / (1.0 + 1.079 / {m}.0)) * {m}.0 * {m}.0 * 18446744073709551616.0
            / CAST(({m} - present) * ({two64}) + s_present AS DOUBLE) AS raw,
          {m} - present AS zeros
   FROM (
     SELECT COUNT(*) AS present,
            SUM(CAST(1 AS HUGEINT) << (64 - r)) AS s_present
     FROM (
       SELECT h // {low_mod} AS idx,
              MAX(CASE WHEN h % {low_mod} = 0 THEN {cap}
                       ELSE {64 - p} - length(bin(h % {low_mod})) + 1 END) AS r
       FROM (
         SELECT CAST(('0x' || substr(sha256(CAST(v AS VARCHAR)), 1, 16)) AS UBIGINT) AS h
         FROM ({rows_sql})
       ) GROUP BY 1
     )
   )
 ))"""


def _q31_sql(p: int = 12) -> str:
    return f"""
SELECT {_hll_estimate_sql("SELECT user_id AS v FROM events", p)} AS approx_distinct
"""


# --------------------------------------------------------------------- q32

def q32_asof_join(sf_dir: str):
    """As-of join: each event matched to the latest order (user_id+1 ==
    o_custkey) with o_orderdate <= ts. Bucketed merge_asof; exact DuckDB
    ASOF JOIN oracle with the same tie reduction."""
    from medical_ocr_service_ray.stages.asof import asof_join_events_orders

    return asof_join_events_orders(
        _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
    )


_Q32_SQL = """
WITH orders2 AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey AS matched_orderkey
FROM events e ASOF JOIN orders2 o
  ON e.user_id + 1 = o.o_custkey AND e.ts >= o.o_orderdate
"""


# --------------------------------------------------------------------- q33

def q33_revenue_by_nation(sf_dir: str):
    """TPC-H-Q5-style composed pipeline: lineitem revenue pre-aggregated per
    orderkey -> hash join with orders (large-large) -> broadcast lookups
    custkey->nationkey->nation/region names -> rollup. Demonstrates mixing
    the two join strategies by side size (broadcast dims, shuffle facts).
    Note: at 100 TB the customer map is itself a keyed join, not a broadcast;
    here it is the small side by construction."""
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    n_name = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    cust_nation = {
        c: n_name[k]
        for c, k in zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    }
    mapping_ref = ray.put(cust_nation)

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df.l_extendedprice) * _cents(1.0 - df.l_discount)
        return (
            pd.DataFrame({"l_orderkey": df.l_orderkey, "c": cents})
            .groupby("l_orderkey", as_index=False)
            .agg(p_c=("c", "sum"))
        )

    rev = partial_then_combine(
        line,
        partial,
        "l_orderkey",
        lambda df: df.groupby("l_orderkey", as_index=False).agg(rev4=("p_c", "sum")),
        num_buckets=16,
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = rev.join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    ).map_batches(
        BroadcastMapper,
        fn_constructor_kwargs={
            "mapping_ref": mapping_ref,
            "key_col": "o_custkey",
            "out_cols": ["n_name"],
            "out_types": [pa.string()],
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def roll_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_name", as_index=False).agg(p_n=("rev4", "size"), p_rev=("rev4", "sum"))

    def roll_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_name", as_index=False).agg(n_orders=("p_n", "sum"), rev4=("p_rev", "sum"))
        g["n_orders"] = g.n_orders.astype("int64")
        g["revenue"] = g.rev4.astype("int64") / 10000.0
        return g[["n_name", "n_orders", "revenue"]]

    return driver_combine(joined, roll_partial, roll_combine)


_Q33_SQL = """
WITH rev AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)
                * CAST(round((1.0-l_discount)*100, 0) AS BIGINT)) AS BIGINT) AS rev4
  FROM lineitem GROUP BY l_orderkey
)
SELECT n_name, COUNT(*) AS n_orders, CAST(SUM(rev4) AS BIGINT) / 10000.0 AS revenue
FROM rev
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name
"""


# --------------------------------------------------------------------- q34

def q34_distinct_users_by_type(sf_dir: str):
    """Grouped exact distinct (A10: COUNT(DISTINCT ...) per group), two-level
    de-skewed: dedupe (type, user) pairs per batch, bucket on USER_ID (not the
    low-cardinality, potentially hot event_type), dedupe + count per type per
    bucket, then sum the tiny per-bucket counts. Each (type, user) pair lands
    in exactly one user bucket, so the per-bucket distinct is globally exact
    and a hot event_type spreads across all buckets instead of one task. The
    HLL sketch (q31) is the approximate companion for when even the bucketed
    pair set is too large."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["event_type", "user_id"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df.drop_duplicates(["event_type", "user_id"])
        return pairs.groupby("event_type", as_index=False).agg(p_users=("user_id", "size"))

    per_bucket_counts = partial_then_combine(ds, partial, "user_id", per_bucket, num_buckets=16)
    # final merge: num_buckets x n_types tiny rows
    out = (
        per_bucket_counts.to_pandas()
        .groupby("event_type", as_index=False)
        .agg(n_users=("p_users", "sum"))
    )
    out["n_users"] = out.n_users.astype("int64")
    return out


_Q34_SQL = "SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type"


# -------------------------------------------------------------------- q189

def q189_split_contamination(sf_dir: str):
    """Train/eval split-contamination audit — the near-dup leakage check
    every benchmark-quality pipeline runs AFTER choosing a split: a hash
    split (q35's Knuth rule) is reproducible, but if two near-duplicate
    documents (q13's verified MinHash pairs) land on opposite sides, the
    eval set leaks training content and the benchmark is inflated
    (the Lee et al. 2021 dedup paper's core motivation). Per pair kind
    ('train-train' / 'cross' / 'test-test') reports the pair count and
    the number of DISTINCT test documents involved — 'cross' test docs
    are the contaminated eval set to drop. Plan: stamp both endpoints of
    each q13 pair with the split (a pure arithmetic function of doc_id —
    NO join against the corpus, the property hash splits exist for),
    then reduce the LSH-bounded pairs table (q13's own result size) on
    the driver. Output: (pair_kind, n_pairs, n_test_docs)."""
    from medical_ocr_service_ray.stages.sampling import knuth_hash_batch

    pairs = q13_minhash_pairs(sf_dir)

    def stamp(t: pa.Table) -> pa.Table:
        sa = knuth_hash_batch(t["doc_a"]) % 100 < 80
        sb = knuth_hash_batch(t["doc_b"]) % 100 < 80
        kind = np.where(
            sa & sb, "train-train", np.where(~sa & ~sb, "test-test", "cross")
        )
        return pa.table(
            {
                "pair_kind": pa.array(kind, pa.string()),
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "a_test": pa.array(~sa),
                "b_test": pa.array(~sb),
            }
        )

    df = pairs.map_batches(stamp, batch_format="pyarrow").to_pandas()
    td = pd.concat(
        [
            df[df.a_test][["pair_kind", "doc_a"]].rename(columns={"doc_a": "doc"}),
            df[df.b_test][["pair_kind", "doc_b"]].rename(columns={"doc_b": "doc"}),
        ]
    ).drop_duplicates()
    nt = td.groupby("pair_kind")["doc"].nunique()
    np_ = df.groupby("pair_kind").size()
    kinds = sorted(np_.index)
    return pd.DataFrame(
        {
            "pair_kind": pd.array(kinds, "object"),
            "n_pairs": pd.array([int(np_[k]) for k in kinds], "int64"),
            "n_test_docs": pd.array(
                [int(nt.get(k, 0)) for k in kinds], "int64"
            ),
        }
    )


def _q189_sql() -> str:
    return _q13_base_sql() + """
, stamped AS (
  SELECT doc_a, doc_b,
         ((doc_a * 2654435761) % 4294967296 % 100 < 80) AS a_train,
         ((doc_b * 2654435761) % 4294967296 % 100 < 80) AS b_train
  FROM pairs
), kinds AS (
  SELECT CASE WHEN a_train AND b_train THEN 'train-train'
              WHEN NOT a_train AND NOT b_train THEN 'test-test'
              ELSE 'cross' END AS pair_kind,
         doc_a, doc_b, a_train, b_train
  FROM stamped
), np AS (
  SELECT pair_kind, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM kinds GROUP BY pair_kind
), td AS (
  SELECT pair_kind, CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_test_docs
  FROM (
    SELECT pair_kind, doc_a AS doc FROM kinds WHERE NOT a_train
    UNION ALL
    SELECT pair_kind, doc_b FROM kinds WHERE NOT b_train
  ) GROUP BY pair_kind
)
SELECT np.pair_kind, np.n_pairs, COALESCE(td.n_test_docs, 0) AS n_test_docs
FROM np LEFT JOIN td USING (pair_kind)
ORDER BY np.pair_kind
"""
