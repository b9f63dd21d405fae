"""range/band joins, decontamination, HLL, graph, ANN (q61-q86) — split from pipelines/queries.py (r5), no behavior change."""

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
    _events_max_us,
    _parquet_num_rows,
    _read,
    bucketed_combine,
    driver_combine,
    np,
    pa,
    partial_then_combine,
    pc,
    pd,
)
from medical_ocr_service_ray.pipelines.queries_core import (
    _emb_query_table,
    _hll_estimate_sql,
)
from medical_ocr_service_ray.pipelines.queries_text import _kmeans_cte_chain




# --------------------------------------------------------------------- q61

def q61_range_join_shipments(sf_dir: str):
    """Keyed range join (equi key + time window): every order with the count
    and int64-exact revenue of lineitems shipped within 90 days of the order
    date. One tagged-union bucket shuffle + per-bucket cumulative-sum double
    asof probe — no (order x lineitem) pair explosion (stages/rangejoin.py).
    The reference's nearest analogue is its SQL date-filtered reporting
    (database/migration_core_tables.sql windowed queries)."""
    from medical_ocr_service_ray.stages.rangejoin import range_join_orders_lineitem

    return range_join_orders_lineitem(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]),
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]),
    )


_Q61_SQL = """
SELECT o.o_orderkey,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_shipped_90d,
       CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND((1 - l.l_discount) * 100) AS BIGINT)), 0)
            AS BIGINT) AS rev4_90d
FROM orders o LEFT JOIN lineitem l
  ON l.l_orderkey = o.o_orderkey
 AND l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
GROUP BY o.o_orderkey
"""


# --------------------------------------------------------------------- q62

def q62_band_join_activity(sf_dir: str):
    """Pure band join (no equi key): for each purchase event, the count of
    ALL events within +/-1 hour — per-row temporal context density. Time
    sliced into 2h buckets, probes fanned out x3, one searchsorted per
    bucket (stages/rangejoin.py); partial counts combine per probe id."""
    from medical_ocr_service_ray.stages.rangejoin import band_join_events

    return band_join_events(
        _read(sf_dir, "events", ["event_id", "ts", "event_type"]),
        band_seconds=3600,
        probe_type="purchase",
    )


_Q62_SQL = """
SELECT p.event_id, CAST(COUNT(e.event_id) AS BIGINT) AS n_nearby
FROM events p JOIN events e
  ON e.ts BETWEEN p.ts - INTERVAL 3600 SECOND AND p.ts + INTERVAL 3600 SECOND
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


# --------------------------------------------------------------------- q63

def q63_weighted_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): rank by ln(u)/w with u derived from the shared Knuth
    hash (same arithmetic as q35/q37, so DuckDB reproduces the EXACT rows;
    ln and IEEE division are bit-identical across both engines). Weight =
    n_chars, k = 50. Per-batch partial top-k -> tiny driver merge (bounded
    at k rows per input block) — the q12/q3 pattern; no shuffle."""
    from medical_ocr_service_ray.stages.sampling import KNUTH

    k = 50

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.n_chars > 0]
        h = (df.doc_id.to_numpy(np.uint64) * np.uint64(KNUTH)) % np.uint64(1 << 32)
        u = (h.astype(np.float64) + 0.5) / float(1 << 32)
        key = np.log(u) / df.n_chars.to_numpy(np.float64)
        out = pd.DataFrame(
            {
                "doc_id": df.doc_id.astype("int64").to_numpy(),
                "n_chars": df.n_chars.astype("int64").to_numpy(),
                "key": key,
            }
        )
        return out.sort_values(
            ["key", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    parts = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        partial, batch_format="pandas"
    )
    top = parts.to_pandas()  # <= k rows per block by construction
    top = top.sort_values(["key", "doc_id"], ascending=[False, True], kind="mergesort")
    return top.head(k)[["doc_id", "n_chars"]].reset_index(drop=True)


_Q63_SQL = """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         ln(((doc_id * 2654435761) % 4294967296 + 0.5) / 4294967296.0)
           / n_chars AS key
  FROM documents WHERE n_chars > 0
) ORDER BY key DESC, doc_id LIMIT 50
"""


# --------------------------------------------------------------------- q64

def q64_source_lang_entropy(sf_dir: str):
    """Label-distribution entropy per corpus source (the dataset-quality
    check a training pipeline runs before mixing corpora): Shannon entropy
    of the language mix, 1e6-quantized ln (the q43 idiom) so the oracle
    hash-matches. entropy_q ~= 1e6 * H(lang | source) in nats. One partial
    per batch, one bucket shuffle keyed on source."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["source", "lang"], as_index=False).size()
        return out.rename(columns={"size": "c"})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "lang"], as_index=False).agg(c=("c", "sum"))
        c = g.c.to_numpy(np.int64)
        lnq = np.floor(1e6 * np.log(c.astype(np.float64))).astype(np.int64)
        g = g.assign(clnc=c * lnq)
        out = g.groupby("source", as_index=False).agg(
            n_docs=("c", "sum"), s=("clnc", "sum")
        )
        n = out.n_docs.to_numpy(np.int64)
        lnn = np.floor(1e6 * np.log(n.astype(np.float64))).astype(np.int64)
        # clamp before the floor-div: numpy floors, DuckDB truncates — both
        # agree on non-negatives, and quantization can push a near-zero
        # entropy numerator epsilon-negative
        num = np.maximum(n * lnn - out.s.to_numpy(np.int64), 0)
        return pd.DataFrame(
            {
                "source": out.source,
                "n_docs": n,
                "entropy_q": (num // n).astype("int64"),
            }
        )

    return partial_then_combine(
        _read(sf_dir, "documents", ["source", "lang"]), partial, "source", combine
    )


_Q64_SQL = """
WITH cl AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang
), s AS (
  SELECT source, SUM(c) AS n_docs,
         SUM(c * CAST(FLOOR(1000000 * LN(c)) AS BIGINT)) AS s
  FROM cl GROUP BY source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(GREATEST(n_docs * CAST(FLOOR(1000000 * LN(n_docs)) AS BIGINT) - s, 0)
            // n_docs AS BIGINT) AS entropy_q
FROM s
"""


# --------------------------------------------------------------------- q65

def q65_minmax_normalize(sf_dir: str):
    """Per-group min-max feature normalization (classic ML preprocessing):
    value scaled to [0, 1e6] within its event_type. Two passes: a
    driver-combined min/max per type (bounded cardinality — the A3
    pattern), broadcast via ray.put, then a stateless vectorized map.
    Integer-exact: cents in, floor-div out."""
    import ray

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def mm_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"event_type": df.event_type, "v": _cents(df.value)})
        return d.groupby("event_type", as_index=False).agg(mn=("v", "min"), mx=("v", "max"))

    def mm_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(mn=("mn", "min"), mx=("mx", "max"))

    mm = driver_combine(ds, mm_partial, mm_combine)
    ref = ray.put(
        {t: (int(a), int(b)) for t, a, b in zip(mm.event_type, mm.mn, mm.mx)}
    )

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(ref)
        mn_map = pd.Series({t: v[0] for t, v in table.items()}, dtype="int64")
        mx_map = pd.Series({t: v[1] for t, v in table.items()}, dtype="int64")
        mn = df.event_type.map(mn_map).to_numpy(np.int64)
        mx = df.event_type.map(mx_map).to_numpy(np.int64)
        v = _cents(df.value).to_numpy()
        span = mx - mn
        norm = np.where(span > 0, (v - mn) * 1_000_000 // np.maximum(span, 1), 0)
        return pd.DataFrame(
            {
                "event_id": df.event_id.astype("int64"),
                "event_type": df.event_type,
                "norm_q": norm.astype("int64"),
            }
        )

    return ds.map_batches(normalize, batch_format="pandas")


_Q65_SQL = """
SELECT event_id, event_type,
       CASE WHEN mx = mn THEN 0
            ELSE (CAST(ROUND(value * 100) AS BIGINT) - mn) * 1000000 // (mx - mn)
       END AS norm_q
FROM (
  SELECT event_id, event_type, value,
         MIN(CAST(ROUND(value * 100) AS BIGINT)) OVER (PARTITION BY event_type) AS mn,
         MAX(CAST(ROUND(value * 100) AS BIGINT)) OVER (PARTITION BY event_type) AS mx
  FROM events
)
"""


# --------------------------------------------------------------------- q66

def q66_decontaminate(sf_dir: str):
    """Train/test decontamination — the check every LLM data pipeline runs
    before training: which TEST documents share word-bigram shingles with
    ANY train document (split = the q35 Knuth arithmetic, so DuckDB
    reproduces the exact membership). Unlike pairwise Jaccard (q15) this is
    EXISTENCE per shingle, so there is no O(df^2) pair blowup and no DF cap
    is needed: shingle explode (distinct per doc, hashed to one int64) ->
    bucket shuffle on shingle -> per-bucket presence flag + per-doc partial
    sums -> per-doc combine. Two linear exchanges. Returns
    (doc_id, n_sh, n_cont, contamination_x1000) for every test doc with
    >= 1 shingle."""
    from medical_ocr_service_ray.functions.textstats import _NONWS_RE
    from medical_ocr_service_ray.stages.sampling import KNUTH

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        all_sh: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for i, txt in enumerate(texts):
            ws = _NONWS_RE.findall((txt or "").lower().strip())
            shset = set(f"{a} {b}" for a, b in zip(ws, ws[1:]))
            all_sh.extend(shset)
            counts[i] = len(shset)
        key = pd.util.hash_array(np.asarray(all_sh, dtype=object)).astype("int64")
        rep_ids = np.repeat(ids, counts)
        is_test = (
            (rep_ids.astype(np.uint64) * np.uint64(KNUTH)) % np.uint64(1 << 32) % 100
            >= 80
        )
        return pa.table(
            {
                "doc_id": pa.array(rep_ids, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "n_sh": pa.array(np.repeat(counts, counts), pa.int64()),
                "is_test": pa.array(is_test, pa.bool_()),
            }
        )

    sh = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def per_shingle_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """All rows of a shingle key share this bucket, so train-presence is
        globally exact here; emit one partial row per (test doc) in bucket."""
        pres = (~df.is_test).groupby(df.key).transform("max")
        te = df[df.is_test]
        if te.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n_sh": pd.Series(dtype="int64"),
                    "pc": pd.Series(dtype="int64"),
                }
            )
        hit = pres[te.index].to_numpy().astype("int64")
        return (
            pd.DataFrame({"doc_id": te.doc_id, "n_sh": te.n_sh, "pc": hit})
            .groupby(["doc_id", "n_sh"], as_index=False)
            .agg(pc=("pc", "sum"))
        )

    partials = bucketed_combine(sh, "key", per_shingle_bucket, num_buckets=16)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["doc_id", "n_sh"], as_index=False).agg(n_cont=("pc", "sum"))
        return pd.DataFrame(
            {
                "doc_id": out.doc_id.astype("int64"),
                "n_sh": out.n_sh.astype("int64"),
                "n_cont": out.n_cont.astype("int64"),
                "contamination_x1000": (
                    1000 * out.n_cont.to_numpy(np.int64) // out.n_sh.to_numpy(np.int64)
                ),
            }
        )

    return bucketed_combine(partials, "doc_id", per_doc, map_batch_size=1 << 17)


_Q66_SQL = """
WITH toks AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS ws,
         (doc_id * 2654435761) % 4294967296 % 100 >= 80 AS is_test
  FROM documents WHERE trim(text) <> ''
), sh AS (
  SELECT DISTINCT doc_id, is_test, ws[i] || ' ' || ws[i+1] AS shingle
  FROM toks, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
), train_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE NOT is_test
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_sh,
       CAST(COUNT(t.shingle) AS BIGINT) AS n_cont,
       CAST(1000 * COUNT(t.shingle) // COUNT(*) AS BIGINT) AS contamination_x1000
FROM sh s LEFT JOIN train_sh t ON s.shingle = t.shingle
WHERE s.is_test
GROUP BY s.doc_id
"""


# --------------------------------------------------------------------- q67

def q67_json_field_rollup(sf_dir: str):
    """Semi-structured field promotion: parse the JSON ``props`` payload
    per event (stdlib json — a real per-record decode kernel, like the HTML
    extraction core; there is no vectorized JSON kernel in this container),
    promote ``$.k`` to a typed column, roll up per event_type. Bounded
    key cardinality -> the A3 driver_combine pattern. Malformed/missing
    payloads count as absent, mirroring SQL NULL semantics."""
    import json

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks = []
        for s in df.props:
            try:
                v = json.loads(s).get("k") if s else None
            except (ValueError, AttributeError):
                v = None
            ks.append(v if isinstance(v, int) else None)
        d = pd.DataFrame({"event_type": df.event_type, "k": pd.array(ks, dtype="Int64")})
        g = d.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"),
            n_k=("k", "count"),
            sum_k=("k", "sum"),
            max_k=("k", "max"),
        )
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"),
            n_k=("n_k", "sum"),
            sum_k=("sum_k", "sum"),
            max_k=("max_k", "max"),
        )
        for c in ("n_events", "n_k", "sum_k", "max_k"):
            out[c] = out[c].astype("int64")
        return out

    return driver_combine(ds, partial, combine)


_Q67_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_k,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------- q68

def q68_hll_set_algebra(sf_dir: str):
    """Sketch set algebra — the audience-overlap question answered without
    any exact distinct: HLL sketches of purchasing and viewing users, union
    by register max (merge-then-estimate == estimate-over-union because
    registers are MAX over rows), intersection by inclusion-exclusion.
    Deterministic end-to-end (q31's estimator), so the whole algebra has an
    exact SQL oracle. Returns one row
    (d_purchase, d_view, d_union, d_intersect)."""
    from medical_ocr_service_ray.stages.sketch import sketch_distinct

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def only(event_type: str):
        return ds.map_batches(
            lambda df, et=event_type: df[df.event_type == et][["user_id"]],
            batch_format="pandas",
        )

    sk_p, _ = sketch_distinct(only("purchase"), "user_id")
    sk_v, _ = sketch_distinct(only("view"), "user_id")
    d_p, d_v = sk_p.estimate(), sk_v.estimate()
    d_u = sk_p.merge(sk_v).estimate()
    return pd.DataFrame(
        {
            "d_purchase": [d_p],
            "d_view": [d_v],
            "d_union": [d_u],
            "d_intersect": [d_p + d_v - d_u],
        }
    )


def _q68_sql() -> str:
    p = _hll_estimate_sql(
        "SELECT user_id AS v FROM events WHERE event_type = 'purchase'"
    )
    v = _hll_estimate_sql("SELECT user_id AS v FROM events WHERE event_type = 'view'")
    u = _hll_estimate_sql(
        "SELECT user_id AS v FROM events WHERE event_type IN ('purchase', 'view')"
    )
    return f"""
SELECT d_purchase, d_view, d_union,
       d_purchase + d_view - d_union AS d_intersect
FROM (SELECT {p} AS d_purchase, {v} AS d_view, {u} AS d_union)
"""


# --------------------------------------------------------------------- q69

_Q69_SENTINEL = 27  # joins docs in the packed code array; pairs touching it drop


def _q69_clean(texts: pd.Series) -> pd.Series:
    """lower + strip to [a-z ] — vectorized, and the identical regex runs in
    the SQL oracle (re and RE2 agree on this class)."""
    return texts.astype(str).str.lower().str.replace("[^a-z ]", "", regex=True)


def _q69_codes(cleaned: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """All docs packed into ONE uint8 code array ('a'..'z' -> 0..25,
    ' ' -> 26) with a sentinel between docs, plus per-doc start offsets —
    one vectorized pass computes every doc's bigrams, no per-row loop."""
    joined = "\x7f".join(cleaned)  # \x7f: never in the cleaned alphabet
    raw = np.frombuffer(joined.encode("ascii"), dtype=np.uint8).astype(np.int64)
    codes = np.where(raw == 0x7F, _Q69_SENTINEL, np.where(raw == 32, 26, raw - 97))
    lens = np.array([len(t) for t in cleaned], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens[:-1] + 1)])
    return codes, starts


def q69_char_lm_quality(sf_dir: str):
    """LM-based quality scoring (the CCNet/Gopher 'perplexity filter'
    pattern): a char-bigram language model trained on the corpus itself,
    then every doc scored by its total and mean negative log-likelihood.
    Two passes: (1) global 27x27 bigram counts — per-batch vectorized
    bincount partials, driver-combined (729 cells, the A3 bounded-
    cardinality pattern) and broadcast; (2) per-pair nll values looked up
    vectorized and summed per doc with np.add.reduceat over the packed code
    array. 1e6-quantized ln (the q43 idiom) keeps every score int64, so the
    DuckDB oracle reproduces it exactly. Returns
    (doc_id, n_bigrams, nll_q_sum, nll_q_avg) for docs with >= 1 bigram."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        codes, _ = _q69_codes(_q69_clean(df.text).tolist())
        if len(codes) < 2:
            return pd.DataFrame({"bg": pd.Series(dtype="int64"), "c": pd.Series(dtype="int64")})
        a, b = codes[:-1], codes[1:]
        keep = (a != _Q69_SENTINEL) & (b != _Q69_SENTINEL)
        bg = a[keep] * 27 + b[keep]
        cnt = np.bincount(bg, minlength=729)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"bg": nz.astype("int64"), "c": cnt[nz].astype("int64")})

    def count_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bg", as_index=False).agg(c=("c", "sum"))

    counts = driver_combine(ds, count_partial, count_combine)
    cnt_full = np.zeros(729, dtype=np.int64)
    cnt_full[counts.bg.to_numpy()] = counts.c.to_numpy()
    row_tot = cnt_full.reshape(27, 27).sum(axis=1)  # pairs starting with a
    # quantized nll per bigram cell: lnq(rowtot[a] + 27) - lnq(cnt[ab] + 1)
    lnq = lambda x: np.floor(1e6 * np.log(x.astype(np.float64))).astype(np.int64)  # noqa: E731
    nll_cell = np.repeat(lnq(row_tot + 27), 27) - lnq(cnt_full + 1)
    ref = ray.put(nll_cell)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        cell = ray.get(ref)
        cleaned = _q69_clean(df.text).tolist()
        codes, starts = _q69_codes(cleaned)
        if len(codes) < 2:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n_bigrams": pd.Series(dtype="int64"),
                    "nll_q_sum": pd.Series(dtype="int64"),
                    "nll_q_avg": pd.Series(dtype="int64"),
                }
            )
        a, b = codes[:-1], codes[1:]
        keep = (a != _Q69_SENTINEL) & (b != _Q69_SENTINEL)
        vals = np.where(keep, cell[np.minimum(a, 26) * 27 + np.minimum(b, 26)], 0)
        pair_starts = np.minimum(starts, len(vals))
        sums = np.add.reduceat(np.concatenate([vals, [0]]), pair_starts)
        # reduceat over doc spans: doc i's pairs live at [starts[i], next-1)
        # (the -1 pair crosses the sentinel and was zeroed by `keep`)
        nb = np.maximum(np.diff(np.concatenate([starts, [len(codes) + 1]])) - 2, 0)
        out = pd.DataFrame(
            {
                "doc_id": df.doc_id.astype("int64").to_numpy(),
                "n_bigrams": nb,
                "nll_q_sum": sums,
            }
        )
        out = out[out.n_bigrams > 0]
        out["nll_q_avg"] = out.nll_q_sum // out.n_bigrams
        return out

    return ds.map_batches(score, batch_format="pandas")


_Q69_SQL = """
WITH clean AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z ]', '', 'g') AS t
  FROM documents
), pairs AS (
  SELECT doc_id, substr(t, i, 2) AS bg, substr(t, i, 1) AS a
  FROM clean, UNNEST(generate_series(1, length(t) - 1)) AS g(i)
  WHERE length(t) >= 2
), cnt AS (
  SELECT bg, COUNT(*) AS c FROM pairs GROUP BY bg
), rowt AS (
  SELECT a, COUNT(*) AS rt FROM pairs GROUP BY a
), scored AS (
  SELECT p.doc_id,
         CAST(FLOOR(1000000 * LN(r.rt + 27)) AS BIGINT)
           - CAST(FLOOR(1000000 * LN(c.c + 1)) AS BIGINT) AS v
  FROM pairs p JOIN cnt c USING (bg) JOIN rowt r USING (a)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(v) AS BIGINT) AS nll_q_sum,
       CAST(SUM(v) // COUNT(*) AS BIGINT) AS nll_q_avg
FROM scored GROUP BY doc_id
"""


# --------------------------------------------------------------------- q70

def q70_grouped_hll(sf_dir: str):
    """Sketches as DISTRIBUTED aggregation state: approx distinct users per
    event_type, with one serialized HLL per (batch, group) partial and the
    register merge running INSIDE a bucketed combine keyed on the group —
    the shape q31's driver merge cannot take when the group count is large
    (per-type here, but the plan is group-cardinality-independent).
    Deterministic like q31, so it carries the same register-rebuild SQL
    oracle, one estimate per group. Returns (event_type, approx_users)."""
    from medical_ocr_service_ray.stages.sketch import HllSketch, hash_column

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in df.groupby("event_type"):
            sk = HllSketch()
            sk.add_hashes(hash_column(sub.user_id.tolist()))
            rows.append({"event_type": et, "sketch": sk.serialize()})
        return pd.DataFrame(rows)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, sub in df.groupby("event_type"):
            merged = HllSketch()
            for b in sub.sketch:
                merged = merged.merge(HllSketch.deserialize(bytes(b)))
            rows.append({"event_type": et, "approx_users": float(merged.estimate())})
        return pd.DataFrame(rows)

    return partial_then_combine(ds, partial, "event_type", combine, num_buckets=4)


def _q70_sql() -> str:
    """Per-group register rebuild: the q31 estimator correlated per
    event_type (5 groups -> 5 scalar evaluations; DuckDB handles the
    correlated subquery by decorrelating it)."""
    est = _hll_estimate_sql(
        "SELECT user_id AS v FROM events e2 WHERE e2.event_type = g.event_type"
    )
    return f"""
SELECT event_type, {est} AS approx_users
FROM (SELECT DISTINCT event_type FROM events) g
"""


# --------------------------------------------------------------------- q71

# Pair expansion is sum(basket²): one pathological mega-basket makes a single
# task quadratic. Orders with more basket rows than this are excluded from
# pair mining (disclosed via log) — mirrored in the SQL oracles as
# HAVING COUNT(*) <= _MAX_BASKET, so Ray and oracle stay bit-equal even on
# degenerate data. TPC-H-shaped orders have ≤7 lines, so real inputs never
# hit the cap.
_MAX_BASKET = 1000


def _drop_mega_baskets(df: pd.DataFrame, tag: str) -> pd.DataFrame:
    sz = df.groupby("l_orderkey")["l_partkey"].transform("size")
    big = sz > _MAX_BASKET
    if bool(big.any()):
        import logging

        logging.getLogger(__name__).warning(
            "%s: dropped %d mega-basket orders (> %d rows) from pair mining",
            tag,
            int(df.loc[big, "l_orderkey"].nunique()),
            _MAX_BASKET,
        )
        df = df[~big]
    return df


def q71_copurchase_pairs(sf_dir: str):
    """Market-basket co-occurrence: count part pairs bought in the same
    order, top-50. The pair expansion runs INSIDE the order-keyed bucket
    (per-bucket vectorized self-merge), so its cost is sum(basket²) — bounded
    because baskets are (and at 100 TB remain) small; a degenerate
    mega-basket would need a per-order cap, which TPC-H-shaped data never
    hits (≤7 lines/order). Two exchanges total (orderkey buckets → pair-key
    buckets), then per-batch partial top-k so the driver merge sees
    O(50 × blocks) rows. Reference analogue: co-occurrence stats over
    order detail lines (SURVEY.md §2 A4/T3 composition)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = _drop_mega_baskets(df, "q71")
        m = df.merge(df, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        g = (
            m.groupby(["l_partkey_x", "l_partkey_y"]).size().reset_index(name="cnt")
        )
        return g.rename(columns={"l_partkey_x": "part_a", "l_partkey_y": "part_b"})

    pair_partials = bucketed_combine(ds, "l_orderkey", pairs_per_bucket, num_buckets=32)

    def combine_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["part_a", "part_b"], as_index=False)["cnt"].sum()

    combined = bucketed_combine(pair_partials, "part_a", combine_pairs, num_buckets=16)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["cnt", "part_a", "part_b"], ascending=[False, True, True]
        ).head(50)

    cand = combined.map_batches(topk, batch_format="pandas").to_pandas()
    out = topk(cand).reset_index(drop=True)
    out["cnt"] = out.cnt.astype("int64")
    return out


_Q71_SQL = """
WITH ok AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING COUNT(*) <= 1000
)
SELECT l1.l_partkey AS part_a, l2.l_partkey AS part_b, COUNT(*)::BIGINT AS cnt
FROM lineitem l1
JOIN lineitem l2
  ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
WHERE l1.l_orderkey IN (SELECT l_orderkey FROM ok)
GROUP BY 1, 2
ORDER BY cnt DESC, part_a, part_b
LIMIT 50
"""


# --------------------------------------------------------------------- q72

def q72_duplicated_span_mass(sf_dir: str):
    """Substring-level dedup signal (the Lee-et-al training-data op): for
    every document, the number of 8-token window offsets whose window also
    occurs in at least one OTHER document. Windows are keyed by the first 8
    bytes of sha256(window) — the SQL oracle derives the IDENTICAL key
    (q31's '0x'||substr(sha256(..)) idiom), so even a hash collision would
    merge the same groups on both sides. Plan: per-batch (window, doc)
    partial counts → window-keyed bucket combine (flag windows whose
    distinct-doc count ≥ 2, emit per-doc offset mass) → doc-keyed combine.
    Two linear exchanges, no pair materialization — unlike a pairwise
    near-dup join, the output is per-document, so hot windows cost O(docs
    containing them), never O(d²)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    K = 8

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        docs: list[int] = []
        hashes: list[int] = []
        for did, txt in zip(df.doc_id, df.text):
            toks = txt.split(" ")
            for o in range(max(len(toks) - K + 1, 0)):
                h = hashlib.sha256(" ".join(toks[o : o + K]).encode()).digest()[:8]
                hashes.append(int.from_bytes(h, "big"))
                docs.append(did)
        out = pd.DataFrame(
            {
                "gh": np.array(hashes, dtype="uint64").view("int64")
                if hashes
                else np.array([], dtype="int64"),
                "doc_id": np.array(docs, dtype="int64"),
            }
        )
        return out.groupby(["gh", "doc_id"]).size().reset_index(name="c")

    partials = ds.map_batches(explode, batch_format="pandas")

    def per_window(df: pd.DataFrame) -> pd.DataFrame:
        gp = df.groupby(["gh", "doc_id"], as_index=False)["c"].sum()
        ndocs = gp.groupby("gh")["doc_id"].transform("size")
        flagged = gp[ndocs >= 2]
        return flagged.groupby("doc_id", as_index=False)["c"].sum()

    by_window = bucketed_combine(partials, "gh", per_window, num_buckets=16)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", as_index=False)["c"].sum()
        return out.rename(columns={"c": "dup_spans"}).astype("int64")

    return bucketed_combine(by_window, "doc_id", per_doc, num_buckets=4)


_Q72_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id,
         ('0x' || substr(sha256(array_to_string(list_slice(toks, o, o + 7), ' ')), 1, 16))::UBIGINT AS gh
  FROM t, unnest(range(1, greatest(len(toks) - 6, 1))) AS u(o)
),
pg AS (SELECT gh, doc_id, COUNT(*)::BIGINT AS c FROM g GROUP BY 1, 2),
f AS (SELECT gh FROM pg GROUP BY gh HAVING COUNT(*) >= 2)
SELECT doc_id, SUM(c)::BIGINT AS dup_spans
FROM pg JOIN f USING (gh)
GROUP BY doc_id
"""


# --------------------------------------------------------------------- q73

def q73_customer_spend_leftjoin(sf_dir: str):
    """LEFT OUTER large-large join (J8 beyond Dataset.join's inner path):
    every customer with order count + exact-cents spend, customers without
    orders kept at 0. Orders are pre-reduced per batch BEFORE the exchange
    (combiner-first), then both sides meet in ONE custkey-bucketed exchange
    as a tagged union; per bucket a vectorized left merge resolves the outer
    semantics. No broadcast — both sides stream, so the plan holds when the
    dimension is also fact-sized."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def opartial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.assign(cents=_cents(df.o_totalprice))
            .groupby("o_custkey")
            .agg(n_orders=("cents", "size"), spend_cents=("cents", "sum"))
            .reset_index()
        )
        return pd.DataFrame(
            {
                "c_custkey": g.o_custkey.astype("int64"),
                "c_mktsegment": "",
                "n_orders": g.n_orders.astype("int64"),
                "spend_cents": g.spend_cents.astype("int64"),
                "side": np.int8(1),
            }
        )

    def cpartial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df.c_custkey.astype("int64"),
                "c_mktsegment": df.c_mktsegment,
                "n_orders": np.int64(0),
                "spend_cents": np.int64(0),
                "side": np.int8(0),
            }
        )

    from medical_ocr_service_ray.sources.readers import union_datasets

    u = union_datasets(
        cust.map_batches(cpartial, batch_format="pandas"),
        orders.map_batches(opartial, batch_format="pandas"),
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df.side == 0][["c_custkey", "c_mktsegment"]]
        right = (
            df[df.side == 1]
            .groupby("c_custkey", as_index=False)[["n_orders", "spend_cents"]]
            .sum()
        )
        m = left.merge(right, on="c_custkey", how="left")
        m["n_orders"] = m.n_orders.fillna(0).astype("int64")
        m["spend_cents"] = m.spend_cents.fillna(0).astype("int64")
        return m

    return bucketed_combine(u, "c_custkey", per_bucket, num_buckets=16)


_Q73_SQL = """
SELECT c.c_custkey, c.c_mktsegment,
       COUNT(o.o_custkey)::BIGINT AS n_orders,
       COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)), 0)::BIGINT AS spend_cents
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
"""


# --------------------------------------------------------------------- q74

def q74_part_skyline(sf_dir: str):
    """Pareto skyline over part (maximize p_size, minimize price): the
    non-dominated frontier, computed with the semilattice property —
    per-batch local skyline, driver final over O(distinct sizes × blocks)
    candidates, ZERO shuffles (stages/skyline.py). Prices compared in exact
    integer cents so the NOT EXISTS oracle mirrors bit-for-bit."""
    from medical_ocr_service_ray.stages.skyline import local_skyline, skyline

    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "p_partkey": df.p_partkey.astype("int64"),
                "p_size": df.p_size.astype("int64"),
                "price_cents": _cents(df.p_retailprice),
            }
        )
        return local_skyline(out, "p_size", "price_cents")

    sky = skyline(ds.map_batches(prep, batch_format="pandas"), "p_size", "price_cents")
    return sky.sort_values("p_partkey").reset_index(drop=True)


_Q74_SQL = """
WITH p AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
  FROM part
)
SELECT p_partkey, p_size, price_cents
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.p_size >= a.p_size AND b.price_cents <= a.price_cents
    AND (b.p_size > a.p_size OR b.price_cents < a.price_cents)
)
ORDER BY p_partkey
"""


# --------------------------------------------------------------------- q75

def q75_quantity_percent_rank(sf_dir: str):
    """Per-row CDF / percent_rank within group over a DISCRETE domain — the
    inverse of q44's quantile selection: a bounded-cardinality value
    histogram (driver_combine: 3 flags × 50 quantities) turns into a
    cumulative-rank lookup that is merged back onto every row vectorized
    (the tiny lookup frame ships in the task closure — broadcast-back, no
    second shuffle, no per-row Python). Rank arithmetic is integer
    micro-units so the window-function oracle matches exactly."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["l_returnflag", "l_quantity"]).size().reset_index(name="c")

    def comb(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["l_returnflag", "l_quantity"], as_index=False)["c"].sum()

    hist = driver_combine(ds, partial, comb)
    hist = hist.sort_values(["l_returnflag", "l_quantity"]).reset_index(drop=True)
    less = hist.groupby("l_returnflag")["c"].cumsum() - hist["c"]
    tot = hist.groupby("l_returnflag")["c"].transform("sum")
    hist["pr_micro"] = np.where(
        tot > 1, (less * 1_000_000) // (tot - 1), 0
    ).astype("int64")
    lookup = hist[["l_returnflag", "l_quantity", "pr_micro"]]

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(lookup, on=["l_returnflag", "l_quantity"], how="left")
        return m[["l_orderkey", "l_linenumber", "pr_micro"]]

    return ds.map_batches(assign, batch_format="pandas")


_Q75_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN COUNT(*) OVER (PARTITION BY l_returnflag) = 1 THEN 0
            ELSE ((RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) - 1) * 1000000)
                 // (COUNT(*) OVER (PARTITION BY l_returnflag) - 1)
       END AS pr_micro
FROM lineitem
"""


# --------------------------------------------------------------------- q76

def q76_copurchase_pagerank(sf_dir: str):
    """Iterative PageRank over the co-purchase graph (parts linked when
    bought in the same order) — the graph sibling of q46's iterative
    k-means: int64 fixed-point damping, 3 rounds, each round = 2 linear
    keyed exchanges (stages/pagerank.py), edge set materialized ONCE and
    re-read from the object store per round. The SQL oracle unrolls the 3
    iterations as chained CTEs with the IDENTICAL integer arithmetic
    (floor-division contributions, 85//100 damping), so the driver
    hash-compares exact values. Output: top-100 nodes by final rank."""
    from medical_ocr_service_ray.stages.pagerank import pagerank_quantized

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def distinct_pairs_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        g = m[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
        return g.rename(columns={"l_partkey_x": "a", "l_partkey_y": "b"})

    pairs = bucketed_combine(ds, "l_orderkey", distinct_pairs_per_bucket, num_buckets=32)

    def global_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["a", "b"])

    pairs = bucketed_combine(pairs, "a", global_distinct, num_buckets=16, map_batch_size=1 << 17)

    def both_directions(df: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"src": df.a.astype("int64"), "dst": df.b.astype("int64")})
        rev = pd.DataFrame({"src": df.b.astype("int64"), "dst": df.a.astype("int64")})
        return pd.concat([fwd, rev], ignore_index=True)

    edges = pairs.map_batches(both_directions, batch_format="pandas")
    ranks = pagerank_quantized(edges, iterations=3, num_buckets=16)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["r", "node"], ascending=[False, True]).head(100)

    cand = ranks.map_batches(topk, batch_format="pandas").to_pandas()
    out = topk(cand).reset_index(drop=True)
    return out.rename(columns={"node": "p_partkey", "r": "pr_micro"})


def _q76_sql() -> str:
    iters = []
    prev = "r0"
    for i in (1, 2, 3):
        iters.append(
            f"""r{i} AS (
  SELECT e.dst AS node, CAST(150000 + (85 * SUM({prev}.r // d.d)) // 100 AS BIGINT) AS r
  FROM edges e
  JOIN deg d ON d.src = e.src
  JOIN {prev} ON {prev}.node = e.src
  GROUP BY e.dst
)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(iters)
    return f"""
WITH pairs AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1
  JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
deg AS (SELECT src, COUNT(*)::BIGINT AS d FROM edges GROUP BY 1),
r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
{chain}
SELECT node AS p_partkey, r AS pr_micro
FROM r3
ORDER BY pr_micro DESC, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------- q77

def q77_name_editdist_pairs(sf_dir: str):
    """Similarity self-join: all customer pairs whose names are within
    Levenshtein distance 1, via deletion-neighborhood blocking
    (stages/simjoin.py) — linear emission, block-local vectorized candidate
    generation, exact-DP verification with the SAME Levenshtein the DuckDB
    oracle calls. The oracle is the naive O(n²) cross-join filter, which is
    exactly what the blocking provably equals."""
    from medical_ocr_service_ray.stages.simjoin import editdist1_selfjoin

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return editdist1_selfjoin(ds, "c_custkey", "c_name")


_Q77_SQL = """
SELECT c1.c_custkey AS a_key, c2.c_custkey AS b_key
FROM customer c1
JOIN customer c2 ON c1.c_custkey < c2.c_custkey
WHERE levenshtein(c1.c_name, c2.c_name) <= 1
"""


# --------------------------------------------------------------------- q78

def q78_ivf_ann(sf_dir: str):
    """IVF ANN top-10 (the scale path q12's brute force upgrades to): fit
    the quantized-k-means coarse quantizer (k=8, 2 iterations), probe the
    query's 2 nearest centroids, score only rows assigned to probed
    clusters by exact int64 dot product (stages/ann.ivf_topk). Every step
    is integer arithmetic, so the WHOLE index — fit, assignment, probe,
    scores, the top-k cut — is rebuilt exactly by the DuckDB oracle
    (_q78_sql reuses q46's unrolled-Lloyd's CTE chain). Query = the
    min-vec_id embedding, same convention as q12."""
    from medical_ocr_service_ray.stages.ann import ivf_topk
    from medical_ocr_service_ray.stages.kmeans import kmeans_fit, quantize

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    centroids = kmeans_fit(ds, k=8, iters=2)
    emb = _emb_query_table(sf_dir)
    min_idx = pc.index(emb["vec_id"], pc.min(emb["vec_id"]).as_py()).as_py()
    query_q = quantize(np.asarray(emb["embedding"][min_idx].as_py(), dtype=np.float64))
    return ivf_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        centroids,
        query_q,
        nprobe=2,
        k=10,
    )


def _q78_sql(k: int = 8, iters: int = 2, dim: int = 64, scale: int = 1024,
             nprobe: int = 2, topk: int = 10) -> str:
    """q46's unrolled-Lloyd's chain + probe-set + in-probe exact-dot top-k.
    All scores are integer-valued doubles (< 2^53) cast back to BIGINT, so
    the ORDER BY ... LIMIT cuts are deterministic with the vec_id tiebreak."""
    return (
        _kmeans_cte_chain(k, iters, dim, scale)
        + f""", qv AS (
  SELECT v FROM q WHERE vec_id = (SELECT MIN(vec_id) FROM q)
), probe AS (
  SELECT c.cluster
  FROM c{iters} c, qv
  ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
           - 2 * CAST(list_inner_product(qv.v, c.c) AS BIGINT),
           c.cluster
  LIMIT {nprobe}
), af AS (
  SELECT vec_id, v, cluster FROM (
    SELECT q.vec_id, q.v, c.cluster,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(q.v, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM q, c{iters} c) WHERE rn = 1
)
SELECT a.vec_id, a.cluster,
       CAST(list_inner_product(a.v, qv.v) AS BIGINT) AS dot_q
FROM af a, qv
WHERE a.cluster IN (SELECT cluster FROM probe)
ORDER BY dot_q DESC, a.vec_id
LIMIT {topk}
"""
    )


# --------------------------------------------------------------------- q79

_WEEK_US = 7 * 86400 * 1_000_000


def q79_interval_coverage(sf_dir: str):
    """Union-of-intervals coverage per key (utilization / uptime op): each
    event covers [ts, ts + value seconds); per user, merge overlapping
    intervals and report total covered time + island count. All island
    detection is vectorized pandas (groupby cummax + shift) inside ONE
    user-bucketed combine — a user's intervals land in one task, buckets are
    auto-sized from input bytes, so per-task memory is bounded by design.
    Time is integer epoch-microseconds end to end, so the window-function
    oracle (MAX(e) OVER preceding → island cumsum) matches exactly.
    Reference analogue: session/coverage roll-ups over event streams
    (SURVEY.md §2.5 A9 keyed metrics family)."""
    from medical_ocr_service_ray.stages.aggregate import compute_num_buckets, dataset_input_bytes

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    nb = compute_num_buckets(dataset_input_bytes(ds), per_bucket_bytes=256 << 20)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        s = df.ts.to_numpy().astype("datetime64[us]").astype("int64")
        dur = np.maximum(np.rint(df.value.to_numpy() * 1_000_000).astype("int64"), 1)
        return pd.DataFrame({"user_id": df.user_id, "s": s, "e": s + dur})

    def merge_islands(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "s", "e"], kind="mergesort").reset_index(drop=True)
        cummax_e = df.groupby("user_id")["e"].cummax()
        prev_max = cummax_e.groupby(df["user_id"]).shift(1)
        new_island = prev_max.isna() | (df["s"] > prev_max)
        island = new_island.astype("int64").groupby(df["user_id"]).cumsum()
        isl = (
            df.assign(island=island)
            .groupby(["user_id", "island"], as_index=False)
            .agg(s=("s", "min"), e=("e", "max"))
        )
        out = isl.assign(span=isl.e - isl.s).groupby("user_id", as_index=False).agg(
            covered_us=("span", "sum"), n_islands=("island", "size")
        )
        out["n_islands"] = out.n_islands.astype("int64")
        return out

    return bucketed_combine(
        ds.map_batches(emit, batch_format="pandas"), "user_id", merge_islands, num_buckets=nb
    )


_Q79_SQL = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + GREATEST(CAST(round(value*1000000, 0) AS BIGINT), 1) AS e
  FROM events
), w AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM iv
), g AS (
  SELECT user_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e) AS island
  FROM w
), isl AS (
  SELECT user_id, island, MIN(s) AS s, MAX(e) AS e FROM g GROUP BY user_id, island
)
SELECT user_id, SUM(e - s)::BIGINT AS covered_us, COUNT(*)::BIGINT AS n_islands
FROM isl GROUP BY user_id
"""


# --------------------------------------------------------------------- q80

def q80_cohort_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by first-activity epoch-week
    (cohort), distinct active users per (cohort_week, week_offset). Two
    exchanges: (1) distinct (user, week) pairs bucketed on user — the
    per-user MIN and the offset expansion happen inside the bucket, and
    because a user lives in exactly one bucket the per-bucket distinct-user
    counts per (cohort, offset) are disjoint partials; (2) a tiny combine
    summing partials over (cohort, offset). No count-distinct shuffle of raw
    events ever happens. Reference analogue: daily usage + distinct-user
    roll-ups (SURVEY.md §2.5 A6/A10) generalized to the training-data
    retention matrix."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        wk = df.ts.to_numpy().astype("datetime64[us]").astype("int64") // _WEEK_US
        return pd.DataFrame({"user_id": df.user_id, "wk": wk}).drop_duplicates()

    def per_user_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        cohort = df.groupby("user_id")["wk"].transform("min")
        off = df.wk - cohort
        part = (
            pd.DataFrame({"cohort_wk": cohort, "week_offset": off})
            .groupby(["cohort_wk", "week_offset"])
            .size()
            .reset_index(name="n_users")
        )
        return part

    partials = partial_then_combine(ds, pairs, "user_id", per_user_bucket)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["cohort_wk", "week_offset"], as_index=False)["n_users"].sum()
        out["n_users"] = out.n_users.astype("int64")
        return out

    return bucketed_combine(partials, "cohort_wk", total, num_buckets=4)


_Q80_SQL = """
WITH ue AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
), fw AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM ue GROUP BY user_id
)
SELECT f.cohort_wk, u.wk - f.cohort_wk AS week_offset,
       COUNT(DISTINCT u.user_id)::BIGINT AS n_users
FROM ue u JOIN fw f USING (user_id)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------- q81

def _copurchase_edge_partials(sf_dir: str, tag: str) -> "rd.Dataset":
    """Shared co-purchase edge builder for the task-mesh graph queries
    (q81 BFS / q163 LPA / q164 walks): q71's same-order part pairs, BOTH
    directions, mega-basket capped (_drop_mega_baskets — mirrored by the
    SQL oracles' HAVING <= 1000 `ok` CTE), distinct per order bucket.
    Cross-bucket duplicate pairs survive deliberately: csr_partition's
    in-bucket dedup is complete because every copy of (src, dst) hashes to
    src's bucket. The cap/direction/dedup semantics are load-bearing
    oracle invariants — change them HERE and in the `ok`/`e` CTEs
    together."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def edges_per_order(df: pd.DataFrame) -> pd.DataFrame:
        df = _drop_mega_baskets(df, tag)
        m = df.merge(df, on="l_orderkey")
        m = m[m.l_partkey_x != m.l_partkey_y]
        return m[["l_partkey_x", "l_partkey_y"]].drop_duplicates().rename(
            columns={"l_partkey_x": "src", "l_partkey_y": "dst"}
        )

    return bucketed_combine(ds, "l_orderkey", edges_per_order, num_buckets=32)


def q81_bfs_hops(sf_dir: str):
    """Bounded-depth BFS (hop distance ≤ 4) from the minimum partkey over
    the co-purchase graph (q71's edge definition, both directions), on the
    TASK MESH (stages/pagerank.py:bfs_hops_mesh — the §23/§24 pattern):
    adjacency CSR-partitioned once, then each hop is num_buckets raw tasks
    exchanging only frontier node ids. The r3 plan paid 2 Ray Data sorts
    per hop (~1.5 s fixed each) plus a per-hop materialize — 64 s at
    sf0.1/32; the mesh runs the 5 rounds in milliseconds. Results equal
    the oracle's level-unrolled MIN chain (BFS = first-discovery depth)."""
    from medical_ocr_service_ray.stages.pagerank import bfs_hops_mesh

    edge_partials = _copurchase_edge_partials(sf_dir, "q81")

    seed = int(
        _read(sf_dir, "lineitem", ["l_partkey"])
        .map_batches(
            lambda t: pa.table({"m": [pc.min(t["l_partkey"]).as_py()]}),
            batch_format="pyarrow",
        )
        .min("m")
    )
    # csr_partition dedupes in-bucket, so the cross-bucket duplicate pairs
    # surviving the order-bucketed expansion are fine
    dist = bfs_hops_mesh(edge_partials, seed, max_hops=4, num_buckets=16)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={"node": "partkey"})
        out["hops"] = out.hops.astype("int64")
        return out[["partkey", "hops"]]

    return dist.map_batches(finish, batch_format="pandas")


def _q81_sql(max_hops: int = 4) -> str:
    lines = [
        """WITH ok AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING COUNT(*) <= 1000
), e AS (
  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
  WHERE l1.l_orderkey IN (SELECT l_orderkey FROM ok)
), d0 AS (SELECT MIN(l_partkey) AS node, 0 AS hops FROM lineitem)"""
    ]
    for h in range(1, max_hops + 1):
        lines.append(
            f""", d{h} AS (
  SELECT node, MIN(hops) AS hops FROM (
    SELECT node, hops FROM d{h-1}
    UNION ALL
    SELECT e.dst AS node, d.hops + 1 AS hops
    FROM d{h-1} d JOIN e ON e.src = d.node WHERE d.hops = {h-1}
  ) GROUP BY node)"""
        )
    lines.append(
        f"\nSELECT node AS partkey, CAST(hops AS BIGINT) AS hops FROM d{max_hops}"
    )
    return "".join(lines)


# --------------------------------------------------------------------- q82

def q82_mode_event_type(sf_dir: str):
    """Mode per group (most frequent event_type per user; ties break to the
    lexicographically smallest type): per-batch partial counts shrink the
    exchange to (user, type) pairs, ONE user-bucketed combine sums and takes
    the per-user argmax via a single vectorized sort + drop_duplicates.
    Reference analogue: per-entity categorical roll-ups (SURVEY.md §2.5 A4)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "event_type"]).size().reset_index(name="cnt")

    def argmax(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], as_index=False)["cnt"].sum()
        g = g.sort_values(
            ["user_id", "cnt", "event_type"], ascending=[True, False, True],
            kind="mergesort",
        )
        out = g.drop_duplicates("user_id").rename(columns={"event_type": "mode_type"})
        out["cnt"] = out.cnt.astype("int64")
        return out[["user_id", "mode_type", "cnt"]]

    return partial_then_combine(ds, partial, "user_id", argmax)


_Q82_SQL = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS cnt FROM events GROUP BY 1, 2
), r AS (
  SELECT user_id, event_type, cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_type, cnt::BIGINT AS cnt FROM r WHERE rn = 1
"""


# --------------------------------------------------------------------- q83

def q83_decayed_engagement(sf_dir: str):
    """Time-decayed engagement score per user: each event contributes
    2^20 >> age_weeks (age measured back from the corpus max timestamp,
    clamped at 20 weeks so the weight floor is 1). All-integer arithmetic —
    the halving decay is exact bit-shift, so the SQL oracle reproduces the
    sums bit-for-bit. The corpus max comes from parquet footer statistics
    (zero scan, exact; falls back to a 1-row-per-batch driver reduce); the
    main pass is the standard partial+combine. The decay pattern is what
    freshness-weighted training-data sampling uses at scale."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    max_us = _events_max_us(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df.ts.to_numpy().astype("datetime64[us]").astype("int64")
        age_wk = np.minimum((max_us - us) // _WEEK_US, 20)
        w = (1 << 20) >> age_wk
        return (
            pd.DataFrame({"user_id": df.user_id, "w": w})
            .groupby("user_id")
            .agg(decayed=("w", "sum"), n_events=("w", "size"))
            .reset_index()
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False).agg(
            decayed=("decayed", "sum"), n_events=("n_events", "sum")
        )
        out["decayed"] = out.decayed.astype("int64")
        out["n_events"] = out.n_events.astype("int64")
        return out

    return partial_then_combine(ds, partial, "user_id", combine)


_Q83_SQL = """
WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events)
SELECT user_id,
       SUM(1048576 >> CAST(LEAST((mx.m - epoch_us(ts)) // 604800000000, 20) AS INTEGER))::BIGINT AS decayed,
       COUNT(*)::BIGINT AS n_events
FROM events, mx GROUP BY user_id
"""


# --------------------------------------------------------------------- q84

def q84_auc_per_type(sf_dir: str):
    """Exact AUC (Mann-Whitney rank-sum with tie-averaged ranks) per
    event_type — the classifier-evaluation op a training pipeline runs over
    billions of scored rows. Label = event_id parity (a deterministic stand-in
    for a prediction table's label column); score = value quantized to 1e-6.
    All arithmetic is integer: with average ranks, 2·R_pos is always an
    integer, so the op reports ``u2 = 2·U`` exactly and the oracle matches
    bit-for-bit (AUC = u2 / (2·n_pos·n_neg), computed by the consumer).

    Scale shape: per-batch partial counts shrink the exchange to distinct
    (event_type, score) rows — ranks need only the cumulative count of
    SMALLER scores, never row-level ranks, so nothing resembling a global
    sort of raw rows ever happens. One small bucketed combine finishes."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = _cents(df.value, 1_000_000)
        lab = (df.event_id.to_numpy() % 2 == 1).astype("int64")
        return (
            pd.DataFrame({"event_type": df.event_type, "q": q, "lab": lab})
            .groupby(["event_type", "q"])
            .agg(n1=("lab", "sum"), t=("lab", "size"))
            .reset_index()
        )

    def rank_sum(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "q"], as_index=False).agg(
            n1=("n1", "sum"), t=("t", "sum")
        )
        g = g.sort_values(["event_type", "q"], kind="mergesort")
        cum = g.groupby("event_type")["t"].cumsum()
        cless = cum - g.t  # count of strictly smaller scores in the type
        r2 = g.n1 * (2 * cless + g.t + 1)  # 2 * (avg-rank sum of positives)
        agg = (
            g.assign(r2=r2)
            .groupby("event_type", as_index=False)
            .agg(r2=("r2", "sum"), n_pos=("n1", "sum"), n=("t", "sum"))
        )
        out = pd.DataFrame(
            {
                "event_type": agg.event_type,
                "u2": (agg.r2 - agg.n_pos * (agg.n_pos + 1)).astype("int64"),
                "n_pos": agg.n_pos.astype("int64"),
                "n_neg": (agg.n - agg.n_pos).astype("int64"),
            }
        )
        return out

    return partial_then_combine(ds, partial, "event_type", rank_sum)


_Q84_SQL = """
WITH s AS (
  SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS q,
         CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END AS lab
  FROM events
), c AS (
  SELECT event_type, q, SUM(lab) AS n1, COUNT(*) AS t FROM s GROUP BY 1, 2
), w AS (
  SELECT event_type, q, n1, t,
         COALESCE(SUM(t) OVER (PARTITION BY event_type ORDER BY q
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cless
  FROM c
)
SELECT event_type,
       (SUM(n1 * (2*cless + t + 1)) - SUM(n1) * (SUM(n1) + 1))::BIGINT AS u2,
       SUM(n1)::BIGINT AS n_pos, (SUM(t) - SUM(n1))::BIGINT AS n_neg
FROM w GROUP BY event_type
"""


# --------------------------------------------------------------------- q85

def q85_length_deciles(sf_dir: str):
    """Global decile bucketing by document length (curriculum / balanced-batch
    binning): decile(v) = ceil(10 · cume_dist(v)) — the tie-stable NTILE
    variant where equal values always share a bucket, so it is deterministic
    and SQL-exact (CUME_DIST window). Distributed shape: per-batch
    distinct-length counts -> ONE tiny combine over distinct lengths (bounded
    by the length domain, not row count) -> the value->decile map is
    broadcast and stamped in a second streaming pass; no row-level rank or
    global sort ever materializes."""
    import ray as _ray

    ds = _read(sf_dir, "documents", ["n_chars"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("n_chars").size().reset_index(name="c")

    hist = driver_combine(
        ds, counts, lambda df: df.groupby("n_chars", as_index=False)["c"].sum()
    ).sort_values("n_chars")
    n = int(hist.c.sum())
    cum = hist.c.cumsum().to_numpy()
    # ceil(10*cum/n) in exact integers
    decile = (10 * cum + n - 1) // n
    dec_map_ref = _ray.put(dict(zip(hist.n_chars.to_numpy(), decile)))

    def stamp_and_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(dec_map_ref)
        d = df.n_chars.map(m)
        return (
            pd.DataFrame({"decile": d, "len": df.n_chars})
            .groupby("decile")
            .agg(n_docs=("len", "size"), min_len=("len", "min"), max_len=("len", "max"))
            .reset_index()
        )

    partials = ds.map_batches(stamp_and_partial, batch_format="pandas")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("decile", as_index=False).agg(
            n_docs=("n_docs", "sum"), min_len=("min_len", "min"), max_len=("max_len", "max")
        )
        for c in ("decile", "n_docs", "min_len", "max_len"):
            out[c] = out[c].astype("int64")
        return out

    return bucketed_combine(partials, "decile", combine, num_buckets=4)


_Q85_SQL = """
WITH c AS (
  SELECT n_chars,
         CAST(ceil(10 * CUME_DIST() OVER (ORDER BY n_chars)) AS BIGINT) AS decile
  FROM documents
)
SELECT decile, COUNT(*)::BIGINT AS n_docs,
       MIN(n_chars)::BIGINT AS min_len, MAX(n_chars)::BIGINT AS max_len
FROM c GROUP BY decile
"""


# --------------------------------------------------------------------- q86

def q86_fk_integrity(sf_dir: str):
    """Referential-integrity audit (ingestion data-quality gate): orphan and
    total counts for three fact->dim edges in one report. Each edge is the
    EXACT Bloom anti-join (stages/bloom.py): definite Bloom negatives are
    counted without any exchange, possible-positives pay one bucketed
    membership pass — large-large safe, no key set ever sits in one heap.
    Table cardinalities come from parquet FOOTERS (zero scan): the dim count
    only sizes the Bloom filter, the fact count is exact metadata — so each
    edge costs exactly one dim scan (bloom build) + one fact scan (stamp) +
    the surviving-fraction exchange, nothing else. Reference analogue: the
    NOT-EXISTS reconciliation audit (database/migration_ingestion_jobs.sql)
    generalized to every FK edge."""
    from concurrent.futures import ThreadPoolExecutor

    import ray

    from medical_ocr_service_ray.stages.aggregate import (
        compute_num_buckets,
        dataset_input_bytes,
    )
    from medical_ocr_service_ray.stages.bloom import (
        _stamp_batch,
        bloom_params,
        build_bloom,
    )

    edges = [
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ]

    # ONE Bloom filter per dim, built concurrently (driver-blocking dim
    # scans overlap in threads; dataset CONSTRUCTION stays on the main
    # thread — read_parquet's lazy fsspec imports aren't thread-safe)
    builds = []
    for ei, (name, fact, fk, dim, pk) in enumerate(edges):
        build = _read(sf_dir, dim, [pk]).map_batches(
            lambda df, pk=pk: pd.DataFrame({"k": df[pk].astype("int64").unique()}),
            batch_format="pandas",
        )
        builds.append((build, bloom_params(_parquet_num_rows(sf_dir, dim), 0.01)))
    with ThreadPoolExecutor(len(edges)) as pool:
        bloom_refs = list(
            pool.map(lambda s: ray.put(build_bloom(s[0], "k", *s[1])), builds)
        )

    # ROUND-5 FUSION: all three edges ride ONE bucketed exchange instead of
    # three (each exchange carries ~1.5 s fixed latency at bench scale —
    # PERF_NOTES §23), and each fact column is scanned ONCE instead of
    # twice: the scan value-counts the fk, stamps the edge's Bloom, counts
    # definite negatives per batch WITHOUT any exchange (tag=2 counter
    # rows), and forwards only possible-positives into the exchange with
    # the edge id packed into the key (kk = k*4 + edge — exact while keys
    # < 2^61; counter rows use kk = -(edge+1), which cannot collide with
    # packed nonnegative keys). Build keys join the union tagged 1.
    def scan_fact(df: pd.DataFrame, fk: str, ei: int, bloom_ref, m_bits: int, k: int):
        g = df[fk].astype("int64").value_counts()
        kc = pd.DataFrame({"k": g.index.to_numpy(), "c": g.to_numpy().astype("int64")})
        pos = _stamp_batch(kc, keep=True, bloom_ref=bloom_ref, key_col="k", m_bits=m_bits, k=k)
        neg_c = int(kc.c.sum()) - int(pos.c.sum())
        out = pd.DataFrame(
            {
                "kk": pos.k.to_numpy() * 4 + ei,
                "c": pos.c.to_numpy(),
                "__tag": np.int8(0),
            }
        )
        if neg_c:
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {"kk": [-(ei + 1)], "c": [neg_c], "__tag": np.int8(2)}
                    ),
                ],
                ignore_index=True,
            )
        return out

    parts = []
    probe_bytes = 0
    for ei, (name, fact, fk, dim, pk) in enumerate(edges):
        probe = _read(sf_dir, fact, [fk])
        probe_bytes += dataset_input_bytes(probe)
        m_bits, kh = builds[ei][1]
        parts.append(
            probe.map_batches(
                scan_fact,
                fn_kwargs=dict(fk=fk, ei=ei, bloom_ref=bloom_refs[ei], m_bits=m_bits, k=kh),
                batch_format="pandas",
                batch_size=1 << 18,
            )
        )
        parts.append(
            builds[ei][0].map_batches(
                lambda df, ei=ei: pd.DataFrame(
                    {
                        "kk": df.k.to_numpy() * 4 + ei,
                        "c": np.int64(0),
                        "__tag": np.int8(1),
                    }
                ),
                batch_format="pandas",
            )
        )

    nb = compute_num_buckets(probe_bytes)

    def membership(df: pd.DataFrame) -> pd.DataFrame:
        keys = df.loc[df.__tag == 1, "kk"].unique()
        probe = df[df.__tag == 0]
        orph = probe[~probe.kk.isin(keys)]
        cnt = pd.DataFrame(
            {"edge_id": (orph.kk % 4).astype("int64"), "c": orph.c.astype("int64")}
        )
        neg = df[df.__tag == 2]
        if len(neg):
            cnt = pd.concat(
                [cnt, pd.DataFrame({"edge_id": (-neg.kk - 1).astype("int64"), "c": neg.c})],
                ignore_index=True,
            )
        return cnt.groupby("edge_id", as_index=False)["c"].sum()

    first, *rest = parts
    cdf = bucketed_combine(
        first.union(*rest), "kk", membership, num_buckets=nb, map_batch_size=1 << 18
    ).to_pandas()
    # a fully-clean table yields only empty zero-column blocks
    counts = (
        cdf.groupby("edge_id")["c"].sum()
        if "edge_id" in cdf.columns
        else pd.Series(dtype="int64")
    )
    out = pd.DataFrame(
        {
            "edge": [e[0] for e in edges],
            "n_orphans": [int(counts.get(i, 0)) for i in range(len(edges))],
            "n_rows": [_parquet_num_rows(sf_dir, e[1]) for e in edges],
        }
    )
    out["n_orphans"] = out.n_orphans.astype("int64")
    out["n_rows"] = out.n_rows.astype("int64")
    return out


_Q86_SQL = """
SELECT 'orders->customer' AS edge,
       COUNT(*) FILTER (WHERE c.c_custkey IS NULL)::BIGINT AS n_orphans,
       COUNT(*)::BIGINT AS n_rows
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'lineitem->orders',
       COUNT(*) FILTER (WHERE oo.o_orderkey IS NULL)::BIGINT,
       COUNT(*)::BIGINT
FROM lineitem l LEFT JOIN orders oo ON l.l_orderkey = oo.o_orderkey
UNION ALL
SELECT 'lineitem->part',
       COUNT(*) FILTER (WHERE p.p_partkey IS NULL)::BIGINT,
       COUNT(*)::BIGINT
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
"""


# -------------------------------------------------------------------- q178

_Q178_D, _Q178_W = 4, 65536


def q178_join_size_estimate(sf_dir: str):
    """Sketch-based join-cardinality estimation (the AGMS/count-min inner-
    product estimator, Alon-Matias-Szegedy lineage) — the statistic a
    distributed planner consults BEFORE picking broadcast vs shuffle vs
    salted join (q173 profiles one side's skew; this predicts the join's
    OUTPUT size without running it): |A join B| is estimated per CMS row i
    as sum_b cmsA[i][b] * cmsB[i][b], upper-bounding the true size
    (collisions only ADD mass), and the estimate = min over the d rows.
    Both sketches build in one streaming pass per side with 2 MB partial
    arrays (w sized so the expected collision mass sum_a*sum_b/w stays near
    the true pair count at bench scale; at 100 TB, w scales with worker
    memory, never with rows) (driver-summed, NO exchange); the exact size — for the eval —
    takes the one key-keyed exchange the estimator is designed to avoid.
    Join measured: events.user_id x orders.o_custkey. All hashes are the
    d disjoint 8-byte slices of one sha256(str(key)) (q172's idiom), so
    the DuckDB oracle rebuilds both sketches and the minimum bit-exactly.
    Output: one row (exact_pairs, cms_est) — pair sums fit int64 here and
    the SQL side runs in HUGEINT (disclosed; at 10^12 rows shard the
    product sum before casting down)."""
    import hashlib

    d, w = _Q178_D, _Q178_W

    def sketch_partials(table: str, col: str, side: str):
        def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
            vc = df[col].value_counts()
            flat = np.zeros(d * w, dtype=np.int64)
            for key, c in vc.items():
                h = hashlib.sha256(str(int(key)).encode()).digest()
                for i in range(d):
                    b = int.from_bytes(h[8 * i : 8 * i + 8], "big") % w
                    flat[i * w + b] += int(c)
            return pd.DataFrame({"side": [side], "sketch": [flat.tobytes()]})

        # batch_size sized UP: every partial is a dense d*w int64 array
        # (2 MB) however few rows it saw — small batches would ship
        # hundreds of them to the driver (measured 128 x 2 MB = 268 MB);
        # at 64k rows/batch the partial count is the block count (~13)
        return _read(sf_dir, table, [col]).map_batches(
            sketch_batch, batch_format="pandas", batch_size=65536
        )

    # both sides' sketch partials ride ONE union'd execution (one Ray job,
    # zero exchanges) instead of two serial take_all passes
    ca = np.zeros(d * w, dtype=np.int64)
    cb = np.zeros(d * w, dtype=np.int64)
    both = sketch_partials("events", "user_id", "a").union(
        sketch_partials("orders", "o_custkey", "b")
    )
    for row in both.take_all():
        (ca if row["side"] == "a" else cb)[:] += np.frombuffer(
            row["sketch"], dtype=np.int64
        )
    ca, cb = ca.reshape(d, w), cb.reshape(d, w)
    est = int(min((ca[i] * cb[i]).sum() for i in range(d)))

    # exact join size: per-side per-key counts meet in ONE keyed exchange
    def side_partial(col: str, tag: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            vc = df[col].value_counts()
            n = vc.to_numpy().astype("int64")
            z = np.zeros(len(vc), dtype="int64")
            return pd.DataFrame(
                {"k": vc.index.to_numpy(dtype="int64"),
                 "ce": n if tag == "a" else z,
                 "co": z if tag == "a" else n}
            )
        return fn

    ea = _read(sf_dir, "events", ["user_id"]).map_batches(
        side_partial("user_id", "a"), batch_format="pandas", batch_size=65536
    )
    ob = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        side_partial("o_custkey", "b"), batch_format="pandas", batch_size=65536
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("k", as_index=False).sum()
        return pd.DataFrame(
            {"pairs": [int((g.ce.to_numpy() * g.co.to_numpy()).sum())]}
        )

    from medical_ocr_service_ray.stages.aggregate import bucketed_combine

    parts = bucketed_combine(ea.union(ob), "k", combine).to_pandas()
    exact = int(parts.pairs.sum())
    return pd.DataFrame(
        {"exact_pairs": pd.array([exact], "int64"),
         "cms_est": pd.array([est], "int64")}
    )


def _q178_sql() -> str:
    d, w = _Q178_D, _Q178_W
    def side(table: str, col: str, name: str) -> str:
        slices = ",\n         ".join(
            f"CAST(('0x' || substr(sha256(CAST(k AS VARCHAR)), {1 + 16 * i}, 16))"
            f" AS UBIGINT) % {w} AS b{i}"
            for i in range(d)
        )
        rows = ",\n".join(
            f"{name}r{i} AS (SELECT b{i} AS b, CAST(SUM(c) AS HUGEINT) AS cnt"
            f" FROM {name}h GROUP BY b{i})"
            for i in range(d)
        )
        return (
            f"{name}t AS (SELECT {col} AS k, CAST(COUNT(*) AS BIGINT) AS c"
            f" FROM {table} GROUP BY {col}),\n"
            f"{name}h AS (SELECT k, c,\n         {slices}\n  FROM {name}t),\n"
            f"{rows}"
        )
    prods = ",\n".join(
        f"p{i} AS (SELECT CAST(COALESCE(SUM(a.cnt * b.cnt), 0) AS HUGEINT) AS v"
        f" FROM sar{i} a JOIN sbr{i} b USING (b))"
        for i in range(d)
    )
    least = ", ".join(f"(SELECT v FROM p{i})" for i in range(d))
    return f"""
WITH {side("events", "user_id", "sa")},
{side("orders", "o_custkey", "sb")},
{prods},
exact AS (
  SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) AS pairs
  FROM sat a JOIN sbt b USING (k)
)
SELECT pairs AS exact_pairs,
       CAST(LEAST({least}) AS BIGINT) AS cms_est
FROM exact
"""
