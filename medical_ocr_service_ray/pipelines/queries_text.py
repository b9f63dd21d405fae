"""sampling, text stats, BM25/TF-IDF, k-means, pivots (q35-q60) — split from pipelines/queries.py (r5), no behavior change."""

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
    STOPWORDS,
    _cents,
    _read,
    bucketed_combine,
    driver_combine,
    np,
    pa,
    partial_then_combine,
    pc,
    pd,
    pq,
    rd,
    sql_occurrences,
    text_stages,
)
from medical_ocr_service_ray.pipelines.queries_core import _session_key




# ------------------------------------------------------- q35-q38 (sampling)

def q35_train_test_split(sf_dir: str):
    """Deterministic train/test hash split (training-data op): split is a
    pure arithmetic function of doc_id (Knuth multiplicative hash mod 100),
    so it is reproducible at any scale, immune to repartitioning, and
    SQL-exact. No shuffle — a stateless per-batch map."""
    from medical_ocr_service_ray.stages.sampling import hash_split

    ds = hash_split(_read(sf_dir, "documents", ["doc_id"]), "doc_id", train_pct=80)
    return ds.select_columns(["doc_id", "split"])


_Q35_SQL = """
SELECT doc_id,
       CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80
            THEN 'train' ELSE 'test' END AS split
FROM documents
"""


def q36_sliding_windows(sf_dir: str):
    """Sliding event-time windows (60 min length, 30 min slide): each event
    belongs to exactly two windows, exploded per batch, then the engine-wide
    partial+bucketed-combine aggregation. window_start is epoch seconds
    (integer) so Ray and SQL agree bit-for-bit."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sec = df.ts.astype("datetime64[us]").astype("int64") // 1_000_000
        w1 = (sec // 1800) * 1800
        v4 = _cents(df.value, 10000)
        both = pd.DataFrame(
            {
                "window_start": pd.concat([pd.Series(w1), pd.Series(w1 - 1800)], ignore_index=True),
                "v4": pd.concat([pd.Series(v4), pd.Series(v4)], ignore_index=True),
            }
        )
        return both.groupby("window_start", as_index=False).agg(
            p_n=("v4", "size"), p_v4=("v4", "sum")
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("window_start", as_index=False).agg(
            n_events=("p_n", "sum"), v4=("p_v4", "sum")
        )
        g["window_start"] = g.window_start.astype("int64")
        g["n_events"] = g.n_events.astype("int64")
        g["sum_value"] = g.v4.astype("int64") / 10000.0
        return g[["window_start", "n_events", "sum_value"]]

    return partial_then_combine(ds, partial, "window_start", combine, num_buckets=16)


_Q36_SQL = """
WITH w AS (
  SELECT unnest([ (CAST(floor(epoch(ts) / 1800) AS BIGINT)) * 1800,
                  (CAST(floor(epoch(ts) / 1800) AS BIGINT)) * 1800 - 1800 ]) AS window_start,
         value
  FROM events
)
SELECT window_start, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value*10000, 0) AS BIGINT)) AS BIGINT) / 10000.0 AS sum_value
FROM w GROUP BY window_start
"""


def q37_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: the 50 events with the smallest
    (knuth_hash(event_id), event_id) per event_type — per-batch partial
    top-k bounds the shuffle to O(groups x k) per batch (training-data op;
    SQL-exact via the same arithmetic hash)."""
    from medical_ocr_service_ray.stages.sampling import stratified_sample

    ds = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])
    return stratified_sample(ds, "event_type", "event_id", k_per_group=50)


_Q37_SQL = """
SELECT event_id, event_type, user_id FROM events
QUALIFY row_number() OVER (
  PARTITION BY event_type
  ORDER BY (event_id * 2654435761) % 4294967296, event_id
) <= 50
"""


def q38_pack_sequences(sf_dir: str):
    """Context-length sequence packing (training-data op): every document
    assigned to exactly one pack with total whitespace tokens <= 512
    (oversize docs get singleton packs); greedy first-fit in ascending
    doc_id order inside each hash bucket, so the result is a pure function
    of the ids (invariant to input partitioning). SQL-oracled: the greedy
    simulation is reproduced exactly by a recursive CTE that advances one
    document per bucket per step, carrying the open-pack state as parallel
    (remaining, seq) lists (_Q38_SQL); pytest asserts the invariants."""
    from medical_ocr_service_ray.stages.sampling import pack_sequences

    return pack_sequences(_read(sf_dir, "documents", ["doc_id", "text"]), max_tokens=512)


# Recursive first-fit simulation: `sim` steps through each bucket's docs in
# doc_id order; `j` is the first open pack with room (list_position = 0/NULL
# when none -> open a new pack). Recursion depth = max docs per bucket.
_Q38_SQL = r"""
WITH RECURSIVE counted AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
         doc_id % 16 AS bucket
  FROM documents
), ranked AS (
  SELECT doc_id, n_tokens, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM counted
), sim(bucket, i, rems, seqs, next_seq, doc_id, n_tokens, seq) AS (
  SELECT bucket, 0, CAST([] AS BIGINT[]), CAST([] AS BIGINT[]), 0,
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
  FROM (SELECT DISTINCT bucket FROM ranked)
  UNION ALL
  SELECT s.bucket, s.i + 1,
         CASE WHEN COALESCE(t.j, 0) = 0
              THEN list_append(s.rems, greatest(0, 512 - d.n_tokens))
              ELSE list_transform(range(1, len(s.rems) + 1),
                                  x -> CASE WHEN x = t.j THEN s.rems[x] - d.n_tokens
                                            ELSE s.rems[x] END)
         END,
         CASE WHEN COALESCE(t.j, 0) = 0 THEN list_append(s.seqs, s.next_seq) ELSE s.seqs END,
         CASE WHEN COALESCE(t.j, 0) = 0 THEN s.next_seq + 1 ELSE s.next_seq END,
         d.doc_id, d.n_tokens,
         CASE WHEN COALESCE(t.j, 0) = 0 THEN s.next_seq ELSE s.seqs[t.j] END
  FROM sim s
  JOIN ranked d ON d.bucket = s.bucket AND d.rn = s.i + 1
  CROSS JOIN LATERAL (
    SELECT list_position(list_transform(s.rems, r -> r >= d.n_tokens), true) AS j
  ) t
), assigned AS (
  SELECT doc_id, n_tokens, bucket * 4294967296 + seq AS pack_id
  FROM sim WHERE i > 0
)
SELECT doc_id, n_tokens, pack_id,
       CAST(SUM(n_tokens) OVER (PARTITION BY pack_id) AS BIGINT) AS pack_tokens
FROM assigned
"""


def q40_approx_quantiles(sf_dir: str):
    """Approximate value quantiles over events via a mergeable log-histogram
    sketch (DDSketch-family, <= ~1% relative error at gamma=1.02): one
    KB-sized sketch per batch, merged on the driver — the quantile companion
    to the HLL distinct sketch (q31). The estimator is DETERMINISTIC (counts
    in log buckets; ln/pow verified bit-identical numpy vs DuckDB on this
    box), so unlike q31 it carries an exact SQL oracle that rebuilds the
    same histogram; error bounds vs exact stay pytest-checked
    (tests/test_sketch.py). num_partials (a Ray blocking detail) is
    deliberately NOT in the output — it isn't a property of the data."""
    from medical_ocr_service_ray.stages.sketch import approx_quantiles

    res = approx_quantiles(
        _read(sf_dir, "events", ["value"]), "value", quantiles=(0.5, 0.9, 0.99)
    )
    return pd.DataFrame(
        {
            "n": [int(res["n"])],
            "p50": [res["p50"]],
            "p90": [res["p90"]],
            "p99": [res["p99"]],
        }
    )


def _q40_sql(gamma: float = 1.02) -> str:
    """The sketch's histogram, rebuilt in SQL: bucket = CEIL(LN(v)/LN(g))
    (bit-identical to numpy on this box — verified over the full data and
    bucket range), rank = q*(n-1), answer = pow(g, b-0.5) of the first
    bucket whose zero-inclusive cumulative count exceeds the rank."""

    def pick(q: float) -> str:
        return f"""
  CASE WHEN {q} * (t.n - 1) < t.z THEN 0.0
       ELSE (SELECT pow({gamma}, CAST(MIN(b) AS DOUBLE) - 0.5)
             FROM cum WHERE t.z + cumc > {q} * (t.n - 1)) END"""

    return f"""
WITH vals AS (SELECT value FROM events WHERE value IS NOT NULL),
t AS (SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE value <= 0) AS z FROM vals),
hist AS (
  SELECT CAST(CEIL(LN(value) / LN({gamma})) AS BIGINT) AS b, COUNT(*) AS c
  FROM vals WHERE value > 0 GROUP BY 1
),
cum AS (SELECT b, SUM(c) OVER (ORDER BY b) AS cumc FROM hist)
SELECT CAST(t.n AS BIGINT) AS n,
       {pick(0.5)} AS p50,
       {pick(0.9)} AS p90,
       {pick(0.99)} AS p99
FROM t
"""


def q39_corpus_prep(sf_dir: str):
    """FLAGSHIP COMPOSITION (training-data pipeline): the classic pretraining
    corpus-prep chain as one streaming composition of the engine's stages —

        documents
          -> exact dedup keyed on sha256 (keep min doc_id, full row carried
             through the bucketed combine: no winner-set broadcast)
          -> quality filter (integer quality score >= 150)
          -> deterministic hash split, keep the train side
          -> context-length sequence packing (<= 512 tokens per pack)

    Returns (doc_id, n_tokens, pack_id, pack_tokens) for the packed train
    corpus. SQL-oracled END-TO-END (_q39_sql): DuckDB sha256 window dedup ->
    the q11 quality formula -> the q35 Knuth split -> the q38 recursive
    first-fit simulation, composed over the same survivor set; the
    composition invariants are additionally gated in
    tests/test_sampling.py::TestCorpusPrep."""
    from medical_ocr_service_ray.stages.dedup import add_sha_batch
    from medical_ocr_service_ray.stages.sampling import hash_split, pack_sequences

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    hashed = docs.map_batches(
        lambda t: add_sha_batch(t, "text"), batch_format="pyarrow", zero_copy_batch=True
    )

    # keyed dedupe carrying the full row: all rows of a sha share a bucket,
    # min(doc_id) per sha is globally exact
    def keep_min_per_sha(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["text_sha256", "doc_id"], kind="mergesort")
        return df.groupby("text_sha256", as_index=False).head(1)[["doc_id", "text"]]

    unique_docs = bucketed_combine(hashed, "text_sha256", keep_min_per_sha, num_buckets=16)

    def quality_filter(t: pa.Table) -> pa.Table:
        scored = text_stages.quality_batch(
            pa.table({"doc_id": t["doc_id"], "text": t["text"]})
        )
        mask = pc.greater_equal(scored["quality"], pa.scalar(150, pa.int64()))
        return t.filter(mask)

    good = unique_docs.map_batches(quality_filter, batch_format="pyarrow")

    def keep_train(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["split"], pa.scalar("train")))

    train = hash_split(good, "doc_id", train_pct=80).map_batches(
        keep_train, batch_format="pyarrow", zero_copy_batch=True
    )
    return pack_sequences(train, max_tokens=512)


def _q39_sql() -> str:
    """The q39 chain composed in DuckDB: each CTE mirrors one engine stage
    (dedup=q7 semantics, quality=q11 formula, split=q35 Knuth arithmetic,
    packing=q38 recursive first-fit over the surviving train docs)."""
    stop = " + ".join(sql_occurrences("p", s) for s in STOPWORDS)
    punct = " + ".join(sql_occurrences("text", c) for c in (".", ",", "!"))
    return rf"""
WITH RECURSIVE uniq AS (
  SELECT doc_id, text
  FROM (SELECT doc_id, text,
               row_number() OVER (PARTITION BY sha256(COALESCE(text, ''))
                                  ORDER BY doc_id) AS rn
        FROM documents)
  WHERE rn = 1
), qbase AS (
  SELECT doc_id, text, ' ' || lower(text) || ' ' AS p,
         CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(length(string_split_regex(trim(text), '\s+')) AS BIGINT)
         END AS n_tokens
  FROM uniq
), qscored AS (
  SELECT doc_id, n_tokens, {stop} AS stop_hits, {punct} AS punct_count FROM qbase
), ranked AS (
  SELECT doc_id, n_tokens, doc_id % 16 AS bucket,
         row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) AS rn
  FROM qscored
  WHERE least(n_tokens, 200) * 2 + least(stop_hits * 10, 100) * 3
        + least(punct_count * 5, 100) >= 150
    AND ((doc_id * 2654435761) % 4294967296) % 100 < 80
), sim(bucket, i, rems, seqs, next_seq, doc_id, n_tokens, seq) AS (
  SELECT bucket, 0, CAST([] AS BIGINT[]), CAST([] AS BIGINT[]), 0,
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
  FROM (SELECT DISTINCT bucket FROM ranked)
  UNION ALL
  SELECT s.bucket, s.i + 1,
         CASE WHEN COALESCE(t.j, 0) = 0
              THEN list_append(s.rems, greatest(0, 512 - d.n_tokens))
              ELSE list_transform(range(1, len(s.rems) + 1),
                                  x -> CASE WHEN x = t.j THEN s.rems[x] - d.n_tokens
                                            ELSE s.rems[x] END)
         END,
         CASE WHEN COALESCE(t.j, 0) = 0 THEN list_append(s.seqs, s.next_seq) ELSE s.seqs END,
         CASE WHEN COALESCE(t.j, 0) = 0 THEN s.next_seq + 1 ELSE s.next_seq END,
         d.doc_id, d.n_tokens,
         CASE WHEN COALESCE(t.j, 0) = 0 THEN s.next_seq ELSE s.seqs[t.j] END
  FROM sim s
  JOIN ranked d ON d.bucket = s.bucket AND d.rn = s.i + 1
  CROSS JOIN LATERAL (
    SELECT list_position(list_transform(s.rems, r -> r >= d.n_tokens), true) AS j
  ) t
), assigned AS (
  SELECT doc_id, n_tokens, bucket * 4294967296 + seq AS pack_id
  FROM sim WHERE i > 0
)
SELECT doc_id, n_tokens, pack_id,
       CAST(SUM(n_tokens) OVER (PARTITION BY pack_id) AS BIGINT) AS pack_tokens
FROM assigned
"""


# --------------------------------------------------------------------- q41

def q41_inverted_index(sf_dir: str):
    """Inverted-index build over the documents table: token -> document
    frequency, corpus frequency, and the top-5 posting rows by term
    frequency (tf desc, doc_id asc). Exploded scalar rows -> hash-exact SQL
    oracle. The retrieval-index analogue of the engine's aggregation
    pattern: per-batch (token, doc, tf) partials, one token-keyed bucketed
    combine (stages/text.py:inverted_index)."""
    return text_stages.inverted_index(
        _read(sf_dir, "documents", ["doc_id", "text"]), k=5
    )


_Q41_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\p{L}\p{N}_]+')) AS token
  FROM documents
), tf AS (
  SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY token, doc_id
), agg AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
  FROM tf GROUP BY token
), ranked AS (
  SELECT token, doc_id, tf,
         row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id) AS rank
  FROM tf
)
SELECT r.token, CAST(r.rank AS BIGINT) AS rank, r.doc_id, r.tf, a.df, a.cf
FROM ranked r JOIN agg a USING (token)
WHERE r.rank <= 5
"""


# --------------------------------------------------------------------- q42

def q42_user_running_features(sf_dir: str):
    """Per-user running history features over events: row number, running
    fixed-point sum of value, whole-second gap since the previous event —
    the canonical feature-engineering window shape. One hash-keyed exchange
    (output rows == input rows), vectorized per-bucket kernels, int64
    arithmetic end-to-end (stages/window.py:running_aggregates)."""
    from medical_ocr_service_ray.stages.window import running_aggregates

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = running_aggregates(
        ds,
        key="user_id",
        order_cols=["ts", "event_id"],
        cum_sum_col="value",
        cum_scale=10000,
        gap_from="ts",
        num_buckets=16,
    )
    return out.map_batches(
        lambda df: df[["user_id", "event_id", "rn", "cum_value_x10000", "gap_s"]],
        batch_format="pandas",
    )


_Q42_SQL = """
SELECT user_id, event_id,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(SUM(CAST(round(value * 10000) AS BIGINT)) OVER w AS BIGINT)
         AS cum_value_x10000,
       CAST(COALESCE((epoch_us(ts) - lag(epoch_us(ts)) OVER w) // 1000000, -1)
         AS BIGINT) AS gap_s
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --------------------------------------------------------------------- q43

# Fixed retrieval workload (literals shared verbatim with the SQL oracle;
# 'warehouse' is deliberately out-of-vocabulary to exercise the zero-df path).
_BM25_QUERIES = {
    "r1": "fast hash join",
    "r2": "sort merge join big table",
    "r3": "stream window agg",
    "r4": "slow warehouse scan filter query",
    "r5": "vector data row dup",
}


def q43_bm25_search(sf_dir: str):
    """Quantized-BM25 top-10 retrieval over documents for a fixed query
    workload (stages/bm25.py). Integer-exact scores: int64 tf-normalization
    + per-token 1e6-quantized ln idf, so the DuckDB oracle hash-matches.
    Two streaming passes: corpus stats (driver-combinable by construction),
    then broadcast-idf scoring with per-batch partial top-k."""
    from medical_ocr_service_ray.stages.bm25 import bm25_topk

    return bm25_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]), _BM25_QUERIES, k=10
    )


def _bm25_ranked_ctes() -> str:
    """The q43 BM25 CTE chain up through ``ranked`` (query_id, doc_id,
    score_q, rank) — shared verbatim by the q43 oracle (rank <= 10) and the
    q170 hybrid-fusion oracle (lexical leg, rank <= 50), so the two mirrors
    can never drift apart."""
    qvals = ",\n         ".join(
        f"('{qid}', '{qtext}')" for qid, qtext in _BM25_QUERIES.items()
    )
    return rf"""qdefs(query_id, qtext) AS (
  VALUES {qvals}
), qterms AS (
  SELECT DISTINCT query_id, unnest(regexp_extract_all(lower(qtext), '[\p{{L}}\p{{N}}_]+')) AS token
  FROM qdefs
), toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\p{{L}}\p{{N}}_]+')) AS token
  FROM documents
), docstats AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), corpus AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n,
         (SELECT CAST(COALESCE(SUM(dl), 0) AS BIGINT) FROM docstats) AS l
), tf AS (
  SELECT q.query_id, t.doc_id, t.token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks t JOIN (SELECT DISTINCT token, query_id FROM qterms) q USING (token)
  GROUP BY q.query_id, t.doc_id, t.token
), df AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks WHERE token IN (SELECT token FROM qterms) GROUP BY token
), idf AS (
  SELECT token,
         CAST(floor(1000000 * ln((2.0 * (g.n + 1)) / (2 * d.df + 1))) AS BIGINT) AS idf_q
  FROM df d, corpus g WHERE d.df > 0
), scored AS (
  SELECT tf.query_id, tf.doc_id,
         CAST(SUM(i.idf_q * ((22000000 * tf.tf * g.l)
              // (10 * tf.tf * g.l + 3 * g.l + 9 * ds.dl * g.n))) AS BIGINT) AS score_q
  FROM tf
  JOIN idf i USING (token)
  JOIN docstats ds ON tf.doc_id = ds.doc_id
  CROSS JOIN corpus g
  GROUP BY tf.query_id, tf.doc_id
), ranked AS (
  SELECT query_id, doc_id, score_q,
         row_number() OVER (PARTITION BY query_id ORDER BY score_q DESC, doc_id) AS rank
  FROM scored WHERE score_q > 0
)"""


def _q43_sql() -> str:
    return f"""
WITH {_bm25_ranked_ctes()}
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_q
FROM ranked WHERE rank <= 10
"""


# --------------------------------------------------------------------- q44

def q44_exact_group_quantiles(sf_dir: str):
    """Exact per-group percentiles of a discrete-valued column via mergeable
    value-count histograms (stages/quantiles.py) — the exact complement of
    q40's log-histogram sketch. Exchange volume is O(groups x distinct
    values), independent of row count."""
    from medical_ocr_service_ray.stages.quantiles import exact_group_quantiles

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return exact_group_quantiles(
        ds,
        key="l_returnflag",
        value_col="l_quantity",
        quantiles=[("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10)],
        num_buckets=4,
    )


_Q44_SQL = """
WITH counts AS (
  SELECT l_returnflag, l_quantity AS v, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, v, cnt,
         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum_n,
         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
  FROM counts
)
SELECT l_returnflag,
       CAST(any_value(n) AS BIGINT) AS n,
       MIN(v) FILTER (WHERE cum_n >= (n * 1 + 3) // 4) AS p25,
       MIN(v) FILTER (WHERE cum_n >= (n * 1 + 1) // 2) AS p50,
       MIN(v) FILTER (WHERE cum_n >= (n * 9 + 9) // 10) AS p90
FROM cum GROUP BY l_returnflag
"""


# --------------------------------------------------------------------- q45

def q45_incremental_dedup(sf_dir: str):
    """Incremental exact dedup against a persisted bucketed hash index
    (stages/incremental.py): ingest the docs with doc_id % 5 < 3 first
    (building the index), then present the FULL table as a re-delivery
    batch; the result is only the genuinely new rows. A fresh tmp index per
    call keeps the query side-effect-free for the driver. The SQL oracle
    replays the same two-step membership semantics with DuckDB's sha256."""
    import shutil
    import tempfile

    from medical_ocr_service_ray.stages.incremental import incremental_exact_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    idx = tempfile.mkdtemp(prefix="mosr_incdedup_")
    try:
        batch1 = docs.map_batches(
            lambda t: t.filter(pa.array(t["doc_id"].to_numpy() % 5 < 3)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # consume: the index write is the effect we need
        incremental_exact_dedup(batch1, idx, num_buckets=8).materialize()
        fresh = incremental_exact_dedup(docs, idx, num_buckets=8)
        out = fresh.to_pandas().sort_values("doc_id").reset_index(drop=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return out


_Q45_SQL = """
WITH h AS (
  SELECT doc_id, sha256(COALESCE(text, '')) AS text_sha256 FROM documents
), ingested AS (
  SELECT DISTINCT text_sha256 FROM h WHERE doc_id % 5 < 3
)
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, text_sha256
FROM h
WHERE text_sha256 NOT IN (SELECT text_sha256 FROM ingested)
GROUP BY text_sha256
"""


# --------------------------------------------------------------------- q46

def q46_kmeans_clusters(sf_dir: str):
    """Quantized Lloyd's k-means over the embeddings table (k=8, 4
    iterations): fit via per-iteration broadcast + one streaming partial-sum
    pass, then one labeling pass. Integer arithmetic end-to-end makes the
    result bit-deterministic and partitioning-invariant (pytest equality vs
    a same-arithmetic numpy reference) — and, since every step is exact
    int64 (floor-quantize, int argmin with lowest-index ties, floor-divided
    centroid updates), the WHOLE iteration unrolls into an exact DuckDB
    oracle (``_q46_sql``): iterative != non-SQL-expressible when the
    arithmetic is integer and the iteration count is fixed."""
    from medical_ocr_service_ray.stages.kmeans import kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    centroids = kmeans_fit(ds, k=8, iters=4)
    return kmeans_assign(_read(sf_dir, "embeddings", ["vec_id", "embedding"]), centroids)


def _kmeans_cte_chain(k: int, iters: int, dim: int, scale: int) -> str:
    """Unrolled Lloyd's iterations as CTE layers ending in ``c{iters}``
    (cluster, c) plus the quantized input relation ``q`` (vec_id, v).
    Shared by the q46 and q78 oracles. Exactness argument:
    quantized coords |q| <= ~scale, so dots <= dim*scale^2 ~ 6.7e7 — integer-
    valued doubles well under 2^53; assignment scores CAST back to BIGINT are
    exact. Ties -> lowest cluster via the window ORDER BY. Centroid update
    subtracts the positive floor-mod before dividing, so truncating division
    equals numpy's floor division on negative sums. Empty clusters keep the
    previous centroid (COALESCE), mirroring kmeans_fit."""
    parts = [
        f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(x * {scale} + 0.5) AS BIGINT)) AS v
  FROM embeddings
), c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c
  FROM q ORDER BY vec_id LIMIT {k}
)"""
    ]
    for it in range(1, iters + 1):
        prev, cur = f"c{it - 1}", f"c{it}"
        parts.append(
            f""", a{it} AS (
  SELECT vec_id, v, cluster FROM (
    SELECT q.vec_id, q.v, c.cluster,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(q.v, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM q, {prev} c) WHERE rn = 1
), upd{it} AS (
  SELECT cluster, list(cj ORDER BY i) AS c FROM (
    SELECT cluster, i,
           CAST((s - (((s % n) + n) % n)) / n AS BIGINT) AS cj
    FROM (
      SELECT a.cluster, t.i, SUM(a.v[t.i]) AS s, COUNT(*) AS n
      FROM a{it} a, UNNEST(generate_series(1, {dim})) AS t(i)
      GROUP BY a.cluster, t.i))
  GROUP BY cluster
), {cur} AS (
  SELECT p.cluster, COALESCE(u.c, p.c) AS c
  FROM {prev} p LEFT JOIN upd{it} u USING (cluster)
)"""
        )
    return "".join(parts)


def _q46_sql(k: int = 8, iters: int = 4, dim: int = 64, scale: int = 1024) -> str:
    """Final labeling pass over the unrolled-Lloyd's chain (_kmeans_cte_chain)."""
    return (
        _kmeans_cte_chain(k, iters, dim, scale)
        + f"""
SELECT vec_id, cluster FROM (
  SELECT q.vec_id, c.cluster,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                    - 2 * CAST(list_inner_product(q.v, c.c) AS BIGINT),
                    c.cluster) AS rn
  FROM q, c{iters} c) WHERE rn = 1
"""
    )


# --------------------------------------------------------------------- q47

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q47_event_type_pivot(sf_dir: str):
    """Pivot / conditional aggregation: one row per user with event-type
    counts spread into columns plus purchase value (SUM(CASE WHEN ...) — the
    reference's per-status dashboard roll-up shape, A2/A5 analogue). user_id
    cardinality is unbounded at scale, so partial per batch then ONE bucketed
    combine; the pivot itself is free (it happens inside the partial, before
    any exchange)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": df.user_id.astype("int64")})
        for et in _EVENT_TYPES:
            out[f"n_{et}"] = (df.event_type == et).astype("int64")
        v10000 = np.rint(df.value.astype("float64") * 10000).astype("int64")
        out["purchase_value_x10000"] = np.where(df.event_type == "purchase", v10000, 0)
        return out.groupby("user_id", as_index=False).sum()

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).sum()

    return partial_then_combine(ds, partial, "user_id", combine, num_buckets=16)


_Q47_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type='click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type='error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type='signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type='view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type='purchase'
                     THEN CAST(round(value * 10000) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS purchase_value_x10000
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------- q48

def q48_rollup_revenue(sf_dir: str):
    """ROLLUP / grouping-sets aggregate: order revenue at three grain levels
    (region+nation, region, grand total) in ONE pass. Facts carry only a
    broadcast-mapped dim key; the rollup levels are derived from the
    (≤ nations) combined result — no second scan, no extra shuffle. At
    100 TB the custkey map becomes a keyed join (q33's documented caveat);
    nation/region stay broadcast."""
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    r_name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    nk_to_names = {
        nk: (r_name[rk], nn)
        for nk, nn, rk in zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
    }
    cust_r = {}
    cust_n = {}
    for c, nk in zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()):
        rn, nn = nk_to_names[nk]
        cust_r[c] = rn
        cust_n[c] = nn
    ref_r, ref_n = ray.put(cust_r), ray.put(cust_n)

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        return (
            pd.DataFrame(
                {
                    "r_name": df.o_custkey.map(_ray.get(ref_r)),
                    "n_name": df.o_custkey.map(_ray.get(ref_n)),
                    "cents": _cents(df.o_totalprice),
                }
            )
            .groupby(["r_name", "n_name"], as_index=False)
            .agg(p_cents=("cents", "sum"), p_n=("cents", "size"))
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        base = df.groupby(["r_name", "n_name"], as_index=False).agg(
            revenue_cents=("p_cents", "sum"), n_orders=("p_n", "sum")
        )
        lvl0 = base.assign(lvl=0)
        lvl1 = (
            base.groupby("r_name", as_index=False)
            .agg(revenue_cents=("revenue_cents", "sum"), n_orders=("n_orders", "sum"))
            .assign(n_name="ALL", lvl=1)
        )
        lvl2 = pd.DataFrame(
            {
                "r_name": ["ALL"],
                "n_name": ["ALL"],
                "revenue_cents": [base.revenue_cents.sum()],
                "n_orders": [base.n_orders.sum()],
                "lvl": [2],
            }
        )
        out = pd.concat([lvl0, lvl1, lvl2], ignore_index=True)
        out["lvl"] = out.lvl.astype("int64")
        out["revenue_cents"] = out.revenue_cents.astype("int64")
        out["n_orders"] = out.n_orders.astype("int64")
        return out[["r_name", "n_name", "lvl", "revenue_cents", "n_orders"]]

    # ≤ |nations| distinct keys per batch partial => driver combine is exact
    return driver_combine(orders, partial, combine)


_Q48_SQL = """
WITH rev AS (
  SELECT r_name, n_name, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
)
SELECT COALESCE(r_name, 'ALL') AS r_name,
       COALESCE(n_name, 'ALL') AS n_name,
       CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS lvl,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM rev GROUP BY ROLLUP(r_name, n_name)
"""


# --------------------------------------------------------------------- q49

def q49_top_events_per_user(sf_dir: str):
    """Top-3 events per user by value (row_number() per group over unbounded
    group cardinality — T1/T3 generalized to per-key). Per-batch partial
    top-k bounds the exchange to O(users × 3) rows; the bucketed combine
    re-ranks exactly. Deterministic tiebreak (value desc, event_id asc)."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "value"])
    K = 3

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "v10000", "event_id"], ascending=[True, False, True]
        )
        return df.groupby("user_id", as_index=False).head(K)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(v10000=np.rint(df.value.astype("float64") * 10000).astype("int64"))
        return topk(df)[["user_id", "event_id", "v10000"]]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = topk(df).copy()
        out["rank"] = out.groupby("user_id").cumcount().astype("int64") + 1
        return out[["user_id", "rank", "event_id", "v10000"]]

    return partial_then_combine(ds, partial, "user_id", combine, num_buckets=16)


_Q49_SQL = """
WITH s AS (
  SELECT user_id, event_id, CAST(round(value * 10000) AS BIGINT) AS v10000 FROM events
), r AS (
  SELECT user_id, event_id, v10000,
         row_number() OVER (PARTITION BY user_id ORDER BY v10000 DESC, event_id) AS rn
  FROM s
)
SELECT user_id, CAST(rn AS BIGINT) AS rank, event_id, v10000 FROM r WHERE rn <= 3
"""


# --------------------------------------------------------------------- q50

_Q50_T1 = "2024-01-15 00:00:00"
_Q50_T2 = "2024-01-23 00:00:00"


def q50_snapshot_delta(sf_dir: str):
    """Snapshot-delta / CDC operator: diff of the keyed latest-state view
    ("latest event per user", q8's shape) between two as-of cutoffs, emitting
    added/changed keys only. Both snapshots are computed in ONE scan + ONE
    keyed exchange: the partial keeps a per-(user, snapshot) argmax candidate
    per batch, the bucketed combine finishes the argmax and diffs. The
    upsert-feed analogue of the reference's last-writer-wins sink (D4)."""
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    t1_us = int(pd.Timestamp(_Q50_T1).value // 1000)
    t2_us = int(pd.Timestamp(_Q50_T2).value // 1000)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df.ts.astype("datetime64[us]").astype("int64")
        base = pd.DataFrame(
            {"user_id": df.user_id.astype("int64"), "event_id": df.event_id.astype("int64"), "us": us}
        )
        out = []
        for snap, cutoff in ((1, t1_us), (2, t2_us)):
            m = base[base.us < cutoff]
            if len(m):
                g = (
                    m.sort_values(["user_id", "us", "event_id"])
                    .groupby("user_id", as_index=False)
                    .last()
                )
                g["snap"] = snap
                out.append(g)
        if not out:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "event_id": pd.Series(dtype="int64"),
                    "us": pd.Series(dtype="int64"),
                    "snap": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.sort_values(["user_id", "snap", "us", "event_id"])
            .groupby(["user_id", "snap"], as_index=False)
            .last()
        )
        p1 = g[g.snap == 1][["user_id", "event_id"]].rename(columns={"event_id": "old_event_id"})
        p2 = g[g.snap == 2][["user_id", "event_id"]].rename(columns={"event_id": "new_event_id"})
        m = p2.merge(p1, on="user_id", how="left")
        m["change_type"] = np.where(m.old_event_id.isna(), "added", "changed")
        m["old_event_id"] = m.old_event_id.fillna(-1).astype("int64")
        m = m[m.old_event_id != m.new_event_id]
        return m[["user_id", "change_type", "old_event_id", "new_event_id"]]

    return partial_then_combine(ds, partial, "user_id", combine, num_buckets=16)


_Q50_SQL = f"""
WITH r1 AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts < TIMESTAMP '{_Q50_T1}'
), l1 AS (SELECT user_id, event_id AS old_event_id FROM r1 WHERE rn = 1),
r2 AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE ts < TIMESTAMP '{_Q50_T2}'
), l2 AS (SELECT user_id, event_id AS new_event_id FROM r2 WHERE rn = 1)
SELECT l2.user_id,
       CASE WHEN l1.user_id IS NULL THEN 'added' ELSE 'changed' END AS change_type,
       CAST(COALESCE(l1.old_event_id, -1) AS BIGINT) AS old_event_id,
       l2.new_event_id
FROM l2 LEFT JOIN l1 USING (user_id)
WHERE l1.user_id IS NULL OR l1.old_event_id <> l2.new_event_id
"""


# --------------------------------------------------------------------- q51

# probe vocabulary: deliberate typos of corpus tokens (shared verbatim with
# the SQL oracle); exercises dist 1..n including the out-of-vocab path
_Q51_VOCAB = ["jion", "scann", "sorrt", "aggg", "windw", "vektor"]


def q51_fuzzy_vocab_match(sf_dir: str):
    """Fuzzy vocabulary matcher (J2/J6 fuzzy fallback analogue): resolve each
    document's leading token to its nearest probe term by Levenshtein
    distance, dictionary-encoded per batch (one DP per DISTINCT token —
    row-count independent for low-cardinality text columns;
    functions/editdist.py). Stateless Arrow-in/pandas-kernel map_batches —
    embarrassingly parallel, no exchange."""
    from medical_ocr_service_ray.functions.editdist import best_match

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    vocab = list(_Q51_VOCAB)

    def match(df: pd.DataFrame) -> pd.DataFrame:
        first_tok = (
            df.text.astype(str).str.lower().str.extract(r"([a-z]+)", expand=False).fillna("")
        )
        bm = best_match(first_tok, vocab)
        return pd.DataFrame(
            {
                "doc_id": df.doc_id.astype("int64"),
                "first_tok": first_tok,
                "best_term": bm.best_term,
                "best_dist": bm.best_dist,
            }
        )

    return ds.map_batches(match, batch_format="pandas")


def _q51_sql() -> str:
    vals = ", ".join(f"('{t}')" for t in _Q51_VOCAB)
    return f"""
WITH probes(term) AS (VALUES {vals}),
d AS (
  SELECT doc_id, COALESCE(regexp_extract(lower(text), '[a-z]+'), '') AS first_tok
  FROM documents
), x AS (
  SELECT doc_id, first_tok, term,
         CAST(levenshtein(first_tok, term) AS BIGINT) AS dist,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY levenshtein(first_tok, term), term) AS rn
  FROM d CROSS JOIN probes
)
SELECT doc_id, first_tok, term AS best_term, dist AS best_dist FROM x WHERE rn = 1
"""


# --------------------------------------------------------------------- q52

_Q52_OPS_RE = "join|scan|sort|merge"


def q52_regex_fields(sf_dir: str):
    """Regex field extraction (M10/M16 narrative-regex analogue as a generic
    operator): pull structured columns out of free text with compiled,
    vectorized patterns — first token + occurrence counts. Pattern semantics
    are the intersection of Python re and RE2 (plain alternation of distinct
    literals) so the DuckDB oracle matches exactly."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        text = df.text.astype(str)
        return pd.DataFrame(
            {
                "doc_id": df.doc_id.astype("int64"),
                "first_tok": text.str.lower().str.extract(r"([a-z]+)", expand=False).fillna(""),
                "n_ops": text.str.count(_Q52_OPS_RE).astype("int64"),
                "n_spark": text.str.count("spark").astype("int64"),
            }
        )

    return ds.map_batches(extract, batch_format="pandas")


_Q52_SQL = f"""
SELECT doc_id,
       COALESCE(regexp_extract(lower(text), '[a-z]+'), '') AS first_tok,
       CAST(len(regexp_extract_all(text, '{_Q52_OPS_RE}')) AS BIGINT) AS n_ops,
       CAST(len(regexp_extract_all(text, 'spark')) AS BIGINT) AS n_spark
FROM documents
"""


# --------------------------------------------------------------------- q53

def q53_funnel(sf_dir: str):
    """Ordered-sequence funnel over the event stream: users reaching
    view -> click(after) -> purchase(after), strict timestamp ordering.
    The per-user stage times need all of a user's rows co-located once:
    project to (user, type, us) at the read (3 int/short cols), ONE keyed
    exchange, vectorized per-bucket stage computation, then a bounded
    (3-row) driver sum. The sessionize/q28 family's analysis complement."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df.event_type.isin(["view", "click", "purchase"])]
        return pd.DataFrame(
            {
                "user_id": m.user_id.astype("int64"),
                "event_type": m.event_type,
                "us": m.ts.astype("datetime64[us]").astype("int64"),
            }
        )

    def stages(df: pd.DataFrame) -> pd.DataFrame:
        t1 = (
            df[df.event_type == "view"].groupby("user_id").us.min().rename("t1").reset_index()
        )
        b = df[df.event_type == "click"].merge(t1, on="user_id")
        t2 = b[b.us > b.t1].groupby("user_id").us.min().rename("t2").reset_index()
        c = df[df.event_type == "purchase"].merge(t2, on="user_id")
        t3 = c[c.us > c.t2].groupby("user_id").us.min().rename("t3").reset_index()
        return pd.DataFrame({"n1": [len(t1)], "n2": [len(t2)], "n3": [len(t3)]})

    counts = bucketed_combine(
        ds.map_batches(project, batch_format="pandas"), "user_id", stages, num_buckets=16
    ).to_pandas()  # bounded: one row per bucket
    return pd.DataFrame(
        {
            "stage": pd.array([1, 2, 3], dtype="int64"),
            "n_users": pd.array(
                [int(counts.n1.sum()), int(counts.n2.sum()), int(counts.n3.sum())],
                dtype="int64",
            ),
        }
    )


_Q53_SQL = """
WITH a AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
), b AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN a USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > a.t1 GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN b USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > b.t2 GROUP BY 1
)
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), (SELECT CAST(COUNT(*) AS BIGINT) FROM a)),
  (CAST(2 AS BIGINT), (SELECT CAST(COUNT(*) AS BIGINT) FROM b)),
  (CAST(3 AS BIGINT), (SELECT CAST(COUNT(*) AS BIGINT) FROM c))) AS f(stage, n_users)
"""


# --------------------------------------------------------------------- q54

_TOOL_VIEW_KEY: list = [None]  # last (sf_dir, session) written to .../current


def _tool_view_dir(sf_dir: str) -> str:
    """Project the transcript corpus's tool-call rows (conv_id, turn_idx,
    tool) to the FIXED path /tmp/mosr_tool_view/current so the static SQL
    oracle reads the same rows the distributed query aggregates (same
    mechanism as _extraction_view_dir / q17)."""
    import shutil as _shutil

    from medical_ocr_service_ray.synth import ensure_transcripts_for_sf

    out = "/tmp/mosr_tool_view/current"
    key = _session_key(sf_dir)
    # Fixed SHARED path: trust the memo only while the on-disk KEY marker
    # still names this (sf_dir, session) — a concurrent harness process may
    # have rewritten `current` (same contract as _golden_fixture_dir).
    if _TOOL_VIEW_KEY[0] == key:
        try:
            if (Path(out) / "KEY").read_text() == repr(key):
                return out
        except OSError:
            pass
    corpus = ensure_transcripts_for_sf(sf_dir)
    files = sorted(str(p) for p in Path(corpus).glob("*.parquet"))
    sch = pq.read_schema(files[0]).remove_metadata()
    sch = pa.schema([sch.field(c) for c in ["conv_id", "turn_idx", "role", "tool"]])
    ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "role", "tool"], schema=sch)

    def project(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t["role"], "tool"))
        return m.select(["conv_id", "turn_idx", "tool"])

    _shutil.rmtree(out, ignore_errors=True)
    ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True).write_parquet(out)
    (Path(out) / "KEY").write_text(repr(key))
    _TOOL_VIEW_KEY[0] = key
    return out


def q54_tool_transitions(sf_dir: str):
    """Agent-transcript analytics: tool-call transition bigram counts
    (prev_tool -> next_tool within a conversation, turn order). The adjacency
    needs each conversation co-located once: ONE keyed exchange on conv_id,
    vectorized shift inside each bucket, then a bounded
    (tools² × buckets) driver sum. North-rule-native: this is the kind of
    corpus statistic a transcript pipeline publishes next to extraction."""
    view = _tool_view_dir(sf_dir)
    sch = pa.schema(
        [pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int32()), pa.field("tool", pa.string())]
    )
    files = sorted(str(p) for p in Path(view).glob("*.parquet"))
    ds = rd.read_parquet(files, schema=sch)

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"])
        prev_tool = df.tool.shift(1)
        same_conv = df.conv_id.eq(df.conv_id.shift(1))
        m = pd.DataFrame(
            {"prev_tool": prev_tool[same_conv], "next_tool": df.tool[same_conv]}
        )
        if not len(m):
            return pd.DataFrame(
                {
                    "prev_tool": pd.Series(dtype="object"),
                    "next_tool": pd.Series(dtype="object"),
                    "p_n": pd.Series(dtype="int64"),
                }
            )
        return m.groupby(["prev_tool", "next_tool"], as_index=False).agg(
            p_n=("next_tool", "size")
        )

    counts = bucketed_combine(ds, "conv_id", transitions, num_buckets=16).to_pandas()
    out = counts.groupby(["prev_tool", "next_tool"], as_index=False).agg(n=("p_n", "sum"))
    out["n"] = out.n.astype("int64")
    return out


_Q54_SQL = """
WITH t AS (
  SELECT conv_id, turn_idx, tool
  FROM read_parquet('/tmp/mosr_tool_view/current/*.parquet')
), s AS (
  SELECT conv_id, tool,
         lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool
  FROM t
)
SELECT prev_tool, tool AS next_tool, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE prev_tool IS NOT NULL
GROUP BY prev_tool, tool
"""


# --------------------------------------------------------------- q55 / q56

def _q55_sides(sf_dir: str):
    """Probe = orders projected to (o_orderkey, cents); build = the DISTINCT
    orderkeys of high-quantity lineitems. Neither side is assumed to fit in
    one object — this is the large-large semi/anti path (stages/bloom.py)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def hot_keys(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"o_orderkey": df.l_orderkey[df.l_quantity >= 48].astype("int64").unique()}
        )

    build = li.map_batches(hot_keys, batch_format="pandas")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"o_orderkey": df.o_orderkey.astype("int64"), "cents": _cents(df.o_totalprice)}
        )

    probe = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        project, batch_format="pandas"
    )
    # filter sizing is an ESTIMATE (only moves the FPR, never correctness):
    # high-quantity lines are a thin slice of lineitem
    n_est = max(1024, pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows // 8)
    return probe, build, n_est


def q55_bloom_semi_join(sf_dir: str):
    """Large-large EXACT semi join with a Bloom pre-filter: orders having at
    least one lineitem with l_quantity >= 48. Definite Bloom negatives
    (~80% of orders here) never enter the exchange; false positives die in
    the exact per-bucket membership pass, so the result hash-matches the
    EXISTS oracle (J5 at fact×fact scale; stages/bloom.py)."""
    from medical_ocr_service_ray.stages.bloom import bloom_semi_join

    probe, build, n_est = _q55_sides(sf_dir)
    return bloom_semi_join(probe, build, "o_orderkey", n_build_keys=n_est)


def q56_bloom_anti_join(sf_dir: str):
    """Anti variant (J7 at fact×fact scale): orders with NO high-quantity
    lineitem. Bloom negatives are emitted DIRECTLY (no-false-negative
    guarantee) — only the possible-positive fraction pays the exchange."""
    from medical_ocr_service_ray.stages.bloom import bloom_semi_join

    probe, build, n_est = _q55_sides(sf_dir)
    return bloom_semi_join(probe, build, "o_orderkey", n_build_keys=n_est, anti=True)


_Q55_SQL = """
SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
"""

_Q56_SQL = """
SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
"""


# --------------------------------------------------------------- q57 / q58

def q57_user_journeys(sf_dir: str):
    """Ordered string aggregation (string_agg ... ORDER BY): each user's
    event-type journey in strict (ts, event_id) order. A co-location op like
    q42 — the concatenation is order-sensitive so it cannot pre-reduce
    across batches; ONE keyed exchange on user_id (3 narrow columns + the
    short type string), vectorized sort + join inside each bucket."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df.user_id.astype("int64"),
                "event_type": df.event_type,
                "us": df.ts.astype("datetime64[us]").astype("int64"),
                "event_id": df.event_id.astype("int64"),
            }
        )

    def journeys(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"])
        out = df.groupby("user_id", as_index=False).agg(
            journey=("event_type", ">".join), n_events=("event_type", "size")
        )
        out["n_events"] = out.n_events.astype("int64")
        return out

    return bucketed_combine(
        ds.map_batches(project, batch_format="pandas"), "user_id", journeys, num_buckets=16
    )


_Q57_SQL = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS journey,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
"""


_Q58_CAP = 256


def q58_heavy_hitter_tokens(sf_dir: str):
    """Approximate heavy hitters over document tokens (SpaceSaving sketch,
    Metwally et al. 2005: fixed 256 counters however large the corpus,
    KB-sized driver merge) — returned as the sketch's GUARANTEE AUDIT so
    the order-sensitive sketch gets a deterministic DuckDB oracle. The
    sketch contents depend on batch order, but its GUARANTEES don't:
    (a) every token with true count*capacity > N is present, and
    (b) every sketch item satisfies 0 <= est - true <= max_overestimate.
    The query emits one row per guaranteed-heavy token
    (item, true_count, ok) where ok = present AND within bounds, plus a
    '__SKETCH__' summary row with true_count = min(n_distinct, capacity)
    (the provable sketch size) and ok = every sketch item within bounds —
    all deterministic IF the guarantees hold, which is exactly what the
    SQL oracle (same rows with ok = TRUE literals) certifies. Exact
    counts reduce in ONE token-keyed exchange (materialized once, read by
    two bounded consumers); driver pulls are <= 2*capacity rows + one
    totals row per block."""
    from medical_ocr_service_ray.stages.sketch import SpaceSavingSketch

    cap = _Q58_CAP
    ds = _read(sf_dir, "documents", ["text"])

    def tokens_of(s: pd.Series) -> pd.Series:
        vals = s.fillna("").astype(str).str.split(r"\s+").explode()
        return vals[vals.str.len() > 0]

    # pass 1 — sketch per batch (no exchange; partials are capacity-bounded)
    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        vc = tokens_of(df.text).value_counts()
        sk = SpaceSavingSketch(cap)
        sk.add_counts(vc.index.to_numpy(dtype=object), vc.to_numpy())
        return pd.DataFrame({"sketch": [sk.serialize()]})

    merged = SpaceSavingSketch(cap)
    for row in ds.map_batches(sketch_batch, batch_format="pandas").take_all():
        merged = merged.merge(SpaceSavingSketch.deserialize(row["sketch"]))
    sk_items = dict(merged.counts)  # item -> (est, err); <= cap entries

    # pass 2 — exact per-token counts, one token-keyed exchange
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = tokens_of(df.text).value_counts()
        return pd.DataFrame(
            {"item": vc.index.to_numpy(dtype=object),
             "true_count": vc.to_numpy().astype("int64")}
        )

    def count_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("item", as_index=False)["true_count"].sum()

    counts = partial_then_combine(
        ds, count_partial, "item", count_combine
    ).materialize()  # vocab-sized; object-store resident (spills), 2 readers

    tot_parts = counts.map_batches(
        lambda df: pd.DataFrame(
            {"tot": [int(df.true_count.sum())], "nd": [len(df)]}
        ),
        batch_format="pandas",
    ).to_pandas()  # one tiny row per block
    tot, nd = int(tot_parts.tot.sum()), int(tot_parts.nd.sum())

    sketch_set = set(sk_items)  # <= cap strings, closure-captured broadcast

    def relevant(df: pd.DataFrame) -> pd.DataFrame:
        m = (df.true_count.to_numpy() * cap > tot) | df.item.isin(sketch_set)
        return df[m]

    pulled = counts.map_batches(relevant, batch_format="pandas").to_pandas()
    exact = dict(zip(pulled.item, pulled.true_count))  # <= 2*cap entries

    def in_bounds(item) -> bool:
        est, err = sk_items[item]
        return 0 <= est - int(exact[item]) <= err

    heavy = sorted(
        pulled.item[pulled.true_count.to_numpy() * cap > tot].tolist()
    )
    rows = [
        (g, int(exact[g]), (g in sk_items) and in_bounds(g)) for g in heavy
    ]
    rows.append(
        (
            "__SKETCH__",
            min(nd, cap),
            len(sk_items) == min(nd, cap) and all(in_bounds(i) for i in sk_items),
        )
    )
    return pd.DataFrame(rows, columns=["item", "true_count", "ok"]).astype(
        {"true_count": "int64", "ok": "bool"}
    )


def _q58_sql() -> str:
    # The oracle certifies the audit: the guaranteed-heavy set and its exact
    # counts are deterministic SQL; ok is the literal TRUE the guarantees
    # promise. A sketch bug (missing heavy hitter, bound violation, wrong
    # merged size) flips a Ray-side ok/row and fails the hash compare.
    return rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(COALESCE(text, ''), '\s+')) AS item
  FROM documents
), t AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM toks WHERE length(item) > 0 GROUP BY item
), n AS (
  SELECT CAST(COALESCE(SUM(true_count), 0) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS nd
  FROM t
)
SELECT item, true_count, TRUE AS ok FROM t, n WHERE true_count * {_Q58_CAP} > total
UNION ALL
SELECT '__SKETCH__', LEAST(nd, {_Q58_CAP}), TRUE FROM n
"""


# --------------------------------------------------------------- q59 / q60

_Q59_SIZE, _Q59_STEP = 200, 150  # 50-char overlap


def q59_chunk_documents(sf_dir: str):
    """RAG-prep document chunking: overlapping fixed-size character windows
    (size 200, stride 150). Embarrassingly parallel flat-map; vectorized by
    CHUNK INDEX, not by row — one ``str.slice`` with scalar bounds per
    chunk ordinal covers every doc long enough, so per-batch cost is
    O(max_chunks) pandas kernels. Unicode-safe: codepoint slicing on both
    engines (pandas str.slice == SQL substr on VARCHAR)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        text = df.text.astype(str)
        lens = text.str.len()
        out = []
        max_chunks = int(np.ceil(lens.max() / _Q59_STEP)) if len(df) and lens.max() > 0 else 0
        for i in range(max_chunks):
            start = i * _Q59_STEP
            m = lens > start
            if not m.any():
                break
            piece = text[m].str.slice(start, start + _Q59_SIZE)
            out.append(
                pd.DataFrame(
                    {
                        "doc_id": df.doc_id[m].astype("int64"),
                        "chunk_idx": np.int64(i),
                        "chunk": piece,
                        "chunk_chars": piece.str.len().astype("int64"),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "chunk_idx": pd.Series(dtype="int64"),
                    "chunk": pd.Series(dtype="object"),
                    "chunk_chars": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True)

    return ds.map_batches(chunk, batch_format="pandas")


_Q59_SQL = f"""
SELECT doc_id, CAST(s / {_Q59_STEP} AS BIGINT) AS chunk_idx,
       substr(text, CAST(s + 1 AS BIGINT), {_Q59_SIZE}) AS chunk,
       CAST(length(substr(text, CAST(s + 1 AS BIGINT), {_Q59_SIZE})) AS BIGINT) AS chunk_chars
FROM (SELECT doc_id, text,
             unnest(range(0, greatest(length(text), 0), {_Q59_STEP})) AS s
      FROM documents)
"""


# patterns whose semantics are identical in Python re and RE2 (no
# backrefs/lookaround): applied IN ORDER, global replace
_REDACT_PATTERNS = [
    ("[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "[EMAIL]"),
    ("\\+?[0-9][0-9 -]{7,}[0-9]", "[PHONE]"),
    ("[0-9]{6,}", "[ID]"),
]


def redact_text(series: pd.Series, patterns=None) -> tuple[pd.Series, pd.Series]:
    """Generic multi-pattern PII scrub: sequential global regex replace
    (compiled once, vectorized str.replace / str.count per pattern).
    Returns (redacted, total_hits). The M10/M16 regex machinery pointed at
    the privacy problem every training-data pipeline has."""
    pats = patterns if patterns is not None else _REDACT_PATTERNS
    out = series.astype(str)
    hits = pd.Series(np.zeros(len(series), dtype=np.int64), index=series.index)
    for pat, repl in pats:
        hits = hits + out.str.count(pat).astype("int64")
        out = out.str.replace(pat, repl, regex=True)
    return out, hits


def q60_redact_pii(sf_dir: str):
    """PII redaction over customer names (the only column in the corpus
    with real ID digit-runs; emails/phones are exercised by the planted
    pytest). Stateless vectorized map_batches — no exchange."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        red, hits = redact_text(df.c_name)
        return pd.DataFrame(
            {"c_custkey": df.c_custkey.astype("int64"), "redacted": red, "n_hits": hits}
        )

    return ds.map_batches(scrub, batch_format="pandas")


def _q60_sql() -> str:
    expr = "c_name"
    hit_terms = []
    for pat, repl in _REDACT_PATTERNS:
        hit_terms.append(f"len(regexp_extract_all({expr}, '{pat}'))")
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    hits = " + ".join(hit_terms)
    return f"""
SELECT c_custkey, {expr} AS redacted, CAST({hits} AS BIGINT) AS n_hits
FROM customer
"""


# --------------------------------------------------------------------- q170

# Probe vectors for the semantic leg: the five fixed retrieval queries map
# (in sorted query_id order) onto the five lowest vec_ids — deterministic,
# self-contained, and shared verbatim with the SQL mirror.
_Q170_PROBES = {qid: i for i, qid in enumerate(sorted(_BM25_QUERIES))}
_Q170_LEG_K = 50  # per-leg candidate depth fed into the fusion
_RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


def _hybrid_legs(sf_dir: str):
    """The two retrieval legs shared by q170 (fusion) and q171 (recall
    eval): lexical = q43's quantized BM25 top-50 over documents, semantic =
    q22's integer-exact cosine top-50 over embeddings (probe vectors = the
    embeddings of the five lowest vec_ids, one per query). Each leg is one
    streaming corpus scan with per-batch partial top-k and an O(queries x
    k) driver merge. Returns (lex, sem) frames of (query_id, doc_id, rank);
    sem rank order is exact (the leg is brute force, not approximate)."""
    import ray

    from medical_ocr_service_ray.pipelines.queries_core import (
        _emb_dataset,
        _emb_query_table,
    )
    from medical_ocr_service_ray.stages.ann import _stack_embeddings
    from medical_ocr_service_ray.stages.bm25 import bm25_topk

    # ---- lexical leg: BM25 top-50 per query (two streaming passes)
    lex = bm25_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]), _BM25_QUERIES, k=_Q170_LEG_K
    )[["query_id", "doc_id", "rank"]]

    # ---- semantic leg: integer-exact cosine top-50 per probe (q22 kernel)
    emb = _emb_query_table(sf_dir)
    ids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids)
    qids, qvecs = [], []
    for qid, probe in sorted(_Q170_PROBES.items()):
        row = int(order[probe])  # probe = rank among sorted vec_ids
        qids.append(qid)
        qvecs.append(np.asarray(emb["embedding"][row].as_py(), dtype=np.float64))
    qq = np.floor(np.stack(qvecs) * 1000.0).astype(np.int64)
    query_ref = ray.put((qids, qq))

    def score_topk(t: pa.Table) -> pa.Table:
        qids_, qq_ = ray.get(query_ref)
        v = np.floor(_stack_embeddings(t).astype(np.float64) * 1000.0).astype(np.int64)
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        nb2 = (v * v).sum(axis=1)
        out_q, out_v, out_s = [], [], []
        for k, qid in enumerate(qids_):
            na2 = int((qq_[k] * qq_[k]).sum())
            dots = v @ qq_[k]
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
            top = np.lexsort((vids, -scores))[:_Q170_LEG_K]
            out_q.extend([qid] * len(top))
            out_v.extend(vids[top].tolist())
            out_s.extend(scores[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.string()),
                "doc_id": pa.array(out_v, pa.int64()),
                "score": pa.array(out_s, pa.int64()),
            }
        )

    sem = (
        _emb_dataset(sf_dir)
        .map_batches(score_topk, batch_format="pyarrow")
        .to_pandas()
    )
    sem = (
        sem.sort_values(["query_id", "score", "doc_id"], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(_Q170_LEG_K)
    )
    sem["rank"] = sem.groupby("query_id").cumcount() + 1
    return lex, sem[["query_id", "doc_id", "rank"]]


def _rrf_fuse(lex: "pd.DataFrame", sem: "pd.DataFrame") -> "pd.DataFrame":
    """Integer reciprocal-rank fusion of two (query_id, doc_id, rank) leg
    frames: score = sum over legs of 1e6 // (60 + rank); re-ranked by
    (score desc, doc_id). Touches only the O(queries x k) leg rows."""
    contrib = pd.concat(
        [lex[["query_id", "doc_id", "rank"]], sem[["query_id", "doc_id", "rank"]]],
        ignore_index=True,
    )
    contrib["c"] = 1_000_000 // (_RRF_K + contrib["rank"].astype("int64"))
    fused = contrib.groupby(["query_id", "doc_id"], as_index=False)["c"].sum()
    fused = fused.rename(columns={"c": "rrf_x1e6"})
    fused["rrf_x1e6"] = fused.rrf_x1e6.astype("int64")
    fused = fused.sort_values(
        ["query_id", "rrf_x1e6", "doc_id"], ascending=[True, False, True]
    )
    fused["rank"] = fused.groupby("query_id").cumcount().astype("int64") + 1
    return fused


def q170_hybrid_rrf(sf_dir: str):
    """Hybrid retrieval with reciprocal-rank fusion: BM25 top-50 (lexical)
    x integer-exact cosine top-50 (semantic), fused by integer RRF
    1e6 // (60 + rank) — all arithmetic integer so the DuckDB oracle
    hash-matches. The reference ranks matches by embedding cosine with an
    exact-string short-circuit (embedding.service.js findBestMatches); RRF
    is the general form of that lexical+semantic blend every retrieval
    stack uses. Legs + fusion in _hybrid_legs/_rrf_fuse (shared with the
    q171 recall eval); the fusion touches only the 2 x 5 x 50 candidate
    rows — corpus-size-independent. doc_id and vec_id are the same key
    space (TESTDATA.md: the tables are row-aligned), which is what makes
    the fusion well-posed."""
    lex, sem = _hybrid_legs(sf_dir)
    fused = _rrf_fuse(lex, sem)
    out = fused[fused["rank"] <= 10].reset_index(drop=True)
    out["query_id"] = out.query_id.astype(object)
    out["doc_id"] = out.doc_id.astype("int64")
    return out[["query_id", "rank", "doc_id", "rrf_x1e6"]]


def q171_hybrid_recall_eval(sf_dir: str):
    """Retrieval-quality eval for the hybrid stack (q143's eval-harness
    idea applied to retrieval): the semantic leg is EXACT brute-force
    cosine, so its top-10 IS the ground truth — measure how much of it the
    fused top-10 recovers vs the lexical-only top-10. One run of the
    shared legs (each one streaming corpus scan), then pure driver set
    arithmetic over the O(queries x k) leg rows. Integer recalls
    (1e6-quantized) so the DuckDB oracle hash-matches. Per query:
    n_truth (=min(10, corpus)), fused_hits, lex_hits, *_recall_x1e6."""
    lex, sem = _hybrid_legs(sf_dir)
    fused = _rrf_fuse(lex, sem)
    rows = []
    for qid in sorted(_BM25_QUERIES):
        truth = set(
            sem[(sem.query_id == qid) & (sem["rank"] <= 10)].doc_id.tolist()
        )
        f10 = set(
            fused[(fused.query_id == qid) & (fused["rank"] <= 10)].doc_id.tolist()
        )
        l10 = set(
            lex[(lex.query_id == qid) & (lex["rank"] <= 10)].doc_id.tolist()
        )
        nt = len(truth)
        fh, lh = len(f10 & truth), len(l10 & truth)
        rows.append(
            {
                "query_id": qid,
                "n_truth": nt,
                "fused_hits": fh,
                "lex_hits": lh,
                "fused_recall_x1e6": (1_000_000 * fh) // nt if nt else 0,
                "lex_recall_x1e6": (1_000_000 * lh) // nt if nt else 0,
            }
        )
    out = pd.DataFrame(rows)
    out["query_id"] = out.query_id.astype(object)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def _hybrid_ctes() -> str:
    """The full hybrid-retrieval CTE chain (BM25 ranked -> lex leg, probe
    mapping -> exact-cosine sem leg, RRF contrib -> fused -> final_ranked)
    — shared verbatim by the q170 oracle (fused top-10) and the q171
    recall-eval oracle (fused/lex recall against the exact semantic truth,
    which IS sem_ranked: the semantic leg is exact brute force), so the
    mirrors cannot drift."""
    probes = ",\n         ".join(
        f"('{qid}', {vid})" for qid, vid in sorted(_Q170_PROBES.items())
    )
    sem_score = """CAST(CASE WHEN na2 * nb2 = 0 THEN 0
                 ELSE (CASE WHEN dot < 0 THEN -1 ELSE 1 END)
                      * ((1000000000000 * dot * dot) // (na2 * nb2))
            END AS HUGEINT)"""
    return f"""{_bm25_ranked_ctes()},
lex AS (
  SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank
  FROM ranked WHERE rank <= {_Q170_LEG_K}
), probes(query_id, probe_rank) AS (
  VALUES {probes}
), v AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vv
  FROM embeddings
), probe_ids AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS pr
  FROM embeddings QUALIFY pr <= {max(_Q170_PROBES.values())}
), qv AS (
  SELECT p.query_id, v.vv AS qv
  FROM probes p JOIN probe_ids pi ON pi.pr = p.probe_rank
  JOIN v ON v.vec_id = pi.vec_id
), sem_scored AS (
  SELECT q.query_id, v.vec_id AS doc_id,
         CAST(list_inner_product(q.qv, v.vv) AS HUGEINT) AS dot,
         CAST(list_inner_product(q.qv, q.qv) AS HUGEINT) AS na2,
         CAST(list_inner_product(v.vv, v.vv) AS HUGEINT) AS nb2
  FROM qv q CROSS JOIN v
), sem_ranked AS (
  SELECT query_id, doc_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY {sem_score} DESC, doc_id
         ) AS BIGINT) AS rank
  FROM sem_scored
), sem AS (
  SELECT query_id, doc_id, rank FROM sem_ranked WHERE rank <= {_Q170_LEG_K}
), contrib AS (
  SELECT query_id, doc_id, 1000000 // ({_RRF_K} + rank) AS c FROM lex
  UNION ALL
  SELECT query_id, doc_id, 1000000 // ({_RRF_K} + rank) AS c FROM sem
), fused AS (
  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_x1e6
  FROM contrib GROUP BY query_id, doc_id
), final_ranked AS (
  SELECT query_id, doc_id, rrf_x1e6,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rrf_x1e6 DESC, doc_id
         ) AS BIGINT) AS rank
  FROM fused
)"""


def _q170_sql() -> str:
    return f"""
WITH {_hybrid_ctes()}
SELECT query_id, rank, doc_id, rrf_x1e6
FROM final_ranked WHERE rank <= 10
"""


def _q171_sql() -> str:
    return f"""
WITH {_hybrid_ctes()},
truth AS (
  SELECT query_id, doc_id FROM sem_ranked WHERE rank <= 10
), f10 AS (
  SELECT query_id, doc_id FROM final_ranked WHERE rank <= 10
), l10 AS (
  SELECT query_id, doc_id FROM lex WHERE rank <= 10
), qids(query_id) AS (
  SELECT query_id FROM probes
), stats AS (
  SELECT q.query_id,
         (SELECT COUNT(*) FROM truth t WHERE t.query_id = q.query_id)
           ::BIGINT AS n_truth,
         (SELECT COUNT(*) FROM f10 f JOIN truth t
            ON t.query_id = f.query_id AND t.doc_id = f.doc_id
          WHERE f.query_id = q.query_id)::BIGINT AS fused_hits,
         (SELECT COUNT(*) FROM l10 l JOIN truth t
            ON t.query_id = l.query_id AND t.doc_id = l.doc_id
          WHERE l.query_id = q.query_id)::BIGINT AS lex_hits
  FROM qids q
)
SELECT query_id, n_truth, fused_hits, lex_hits,
       (CASE WHEN n_truth = 0 THEN 0
             ELSE (1000000 * fused_hits) // n_truth END)::BIGINT
         AS fused_recall_x1e6,
       (CASE WHEN n_truth = 0 THEN 0
             ELSE (1000000 * lex_hits) // n_truth END)::BIGINT
         AS lex_recall_x1e6
FROM stats
"""


# -------------------------------------------------------------------- q172

_Q172_D, _Q172_W, _Q172_CAP = 4, 512, 256


def q172_countmin_heavy(sf_dir: str):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
    estimates with an EXACT DuckDB oracle — the order-independent
    counterpart to q58's SpaceSaving guarantee audit. Where SpaceSaving's
    contents depend on arrival order (hence q58's audit-style oracle), CMS
    counters are pure sums — counter[i][b] = sum of true counts of every
    token whose i-th hash lands in bucket b — so the merged sketch is
    partitioning-invariant and the oracle can rebuild every probed counter
    bit-exactly instead of merely certifying bounds. The reference's
    analytics layer keeps per-key usage tallies in bounded memory
    (src/services/job-queue.service.js:88-117 status roll-ups); CMS is the
    10^12-row form of that tally. Plan: pass 1 builds the d x w sketch as
    per-batch int64 partial arrays (one 16 KB row per block, driver-summed
    — NO exchange; the classic mergeable-sketch shape); pass 2 reuses one
    token-keyed exchange for exact counts and pulls only the
    guaranteed-heavy set (true_count * cap > total, <= cap rows by the
    pigeonhole bound). The d hash rows are the four disjoint 8-byte slices
    of ONE sha256 per token, so the SQL mirror derives identical buckets
    via substr(sha256(item), 1+16*i, 16). Output per heavy token:
    (item, true_count, cms_est) with est >= true by construction and est
    bit-equal to the SQL reconstruction."""
    import hashlib

    d, w, cap = _Q172_D, _Q172_W, _Q172_CAP
    ds = _read(sf_dir, "documents", ["text"])

    def tokens_of(s: pd.Series) -> pd.Series:
        vals = s.fillna("").astype(str).str.split(r"\s+").explode()
        return vals[vals.str.len() > 0]

    def _buckets(tok: str) -> list[int]:
        h = hashlib.sha256(tok.encode()).digest()
        return [int.from_bytes(h[8 * i : 8 * i + 8], "big") % w for i in range(d)]

    # pass 1 — one d*w partial counter array per batch (16 KB), no exchange
    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        vc = tokens_of(df.text).value_counts()
        flat = np.zeros(d * w, dtype=np.int64)
        for tok, c in vc.items():
            for i, b in enumerate(_buckets(str(tok))):
                flat[i * w + b] += int(c)
        return pd.DataFrame({"sketch": [flat.tobytes()]})

    counters = np.zeros(d * w, dtype=np.int64)
    for row in ds.map_batches(sketch_batch, batch_format="pandas").take_all():
        counters += np.frombuffer(row["sketch"], dtype=np.int64)

    # pass 2 — exact counts, one token-keyed exchange (q58's two-consumer
    # shape: totals partials + the bounded heavy pull)
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = tokens_of(df.text).value_counts()
        return pd.DataFrame(
            {"item": vc.index.to_numpy(dtype=object),
             "true_count": vc.to_numpy().astype("int64")}
        )

    counts = partial_then_combine(
        ds,
        count_partial,
        "item",
        lambda df: df.groupby("item", as_index=False)["true_count"].sum(),
    ).materialize()

    tot_parts = counts.map_batches(
        lambda df: pd.DataFrame({"tot": [int(df.true_count.sum())]}),
        batch_format="pandas",
    ).to_pandas()
    tot = int(tot_parts.tot.sum())

    pulled = counts.map_batches(
        lambda df: df[df.true_count.to_numpy() * cap > tot],
        batch_format="pandas",
    ).to_pandas()  # <= cap rows (pigeonhole)

    pulled = pulled.sort_values("item").reset_index(drop=True)
    ests = [
        int(min(counters[i * w + b] for i, b in enumerate(_buckets(str(t)))))
        for t in pulled.item
    ]
    return pd.DataFrame(
        {
            "item": pulled.item.to_numpy(dtype=object),
            "true_count": pulled.true_count.astype("int64").to_numpy(),
            "cms_est": np.asarray(ests, dtype="int64"),
        }
    )


def _q172_sql() -> str:
    # Exact counter reconstruction: the d rows are GROUP BYs over the same
    # sha256-slice buckets the Ray side uses; cms_est = LEAST over the d
    # probed counters. A sketch bug (wrong bucket math, lost partial,
    # overflow) lands on a different counter value and fails the hash.
    w, cap = _Q172_W, _Q172_CAP
    slices = [
        f"CAST(('0x' || substr(sha256(item), {1 + 16 * i}, 16)) AS UBIGINT)"
        f" % {w} AS b{i}"
        for i in range(_Q172_D)
    ]
    rows = ",\n".join(
        f"r{i} AS (SELECT b{i} AS b, CAST(SUM(true_count) AS BIGINT) AS cnt"
        f" FROM h GROUP BY b{i})"
        for i in range(_Q172_D)
    )
    joins = "\n".join(
        f"JOIN r{i} ON heavy.b{i} = r{i}.b" for i in range(_Q172_D)
    )
    least = ", ".join(f"r{i}.cnt" for i in range(_Q172_D))
    slices_sql = ",\n         ".join(slices)
    return rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(COALESCE(text, ''), '\s+')) AS item
  FROM documents
), t AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM toks WHERE length(item) > 0 GROUP BY item
), n AS (
  SELECT CAST(COALESCE(SUM(true_count), 0) AS BIGINT) AS total FROM t
), h AS (
  SELECT item, true_count,
         {slices_sql}
  FROM t
),
{rows},
heavy AS (SELECT h.* FROM h, n WHERE true_count * {cap} > total)
SELECT heavy.item, heavy.true_count, LEAST({least}) AS cms_est
FROM heavy
{joins}
"""


# -------------------------------------------------------------------- q174

_Q174_SCALE = 1_000_000
_Q174_MIN_COUNT = 2


def q174_bigram_lm_score(sf_dir: str):
    """Bigram-LM fluency scoring — the classic n-gram quality filter of
    LLM data pipelines (CCNet/KenLM-style: train a cheap LM on a clean
    split, score the rest, drop the tail), in integer arithmetic so the
    DuckDB oracle hash-matches. Train on even doc_ids, score odd ones.
    Per eval-doc bigram instance the contribution is the scaled MLE
    conditional floor(c12 * 1e6 / c1) — c12 = train count of the bigram
    (pruned at min_count=2: rare bigrams carry ~zero MLE mass), c1 = train
    successor count of its left token (UNpruned denominator) — summed per
    doc with OOV/pruned bigrams contributing 0. The reference scores
    extraction confidence per field and aggregates per document
    (src/services/confidence.service.js); this is the corpus-level
    analogue. Plan: ONE w1-keyed exchange builds the whole model (bigrams
    sharing a left token co-locate, so c1 and every c12 reduce in the same
    group — vocab-bounded per group; a stopword-grade hot w1 costs its
    successor-vocab size, disclosed), one bg-keyed left join scores eval
    instances against it, one doc-keyed combine sums. No corpus broadcast,
    no driver-side model. Output per eval doc with >=1 bigram:
    (doc_id, n_bigrams, seen_bigrams, fluency_score)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bigrams_of(df: pd.DataFrame, parity: int) -> pd.DataFrame:
        sub = df[df.doc_id % 2 == parity]
        toks = sub.text.fillna("").astype(str).str.split()
        n = toks.str.len()
        keep = n >= 2
        toks, sub_ids = toks[keep], sub.doc_id[keep]
        rows_doc: list[np.ndarray] = []
        rows_w1: list[list[str]] = []
        rows_bg: list[list[str]] = []
        for did, tl in zip(sub_ids.to_numpy(), toks):
            rows_doc.append(np.full(len(tl) - 1, did, dtype=np.int64))
            rows_w1.append(tl[:-1])
            rows_bg.append([a + " " + b for a, b in zip(tl, tl[1:])])
        if not rows_doc:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "w1": pd.Series([], dtype=object),
                 "bg": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(rows_doc),
                "w1": np.concatenate(rows_w1),
                "bg": np.concatenate(rows_bg),
            }
        )

    # model: ONE w1-keyed exchange — per-batch (w1, bg) instance counts,
    # per-group c1 = sum of its bigram counts, contrib = c12*SCALE // c1
    def train_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = bigrams_of(df, 0)
        g = b.groupby(["w1", "bg"], as_index=False).size()
        return g.rename(columns={"size": "c12"})

    def train_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["w1", "bg"], as_index=False)["c12"].sum()
        c1 = g.groupby("w1")["c12"].transform("sum")
        g["contrib"] = (
            g.c12.to_numpy().astype("int64") * _Q174_SCALE
            // c1.to_numpy().astype("int64")
        )
        g = g[g.c12 >= _Q174_MIN_COUNT]
        return g[["bg", "contrib"]]

    model = partial_then_combine(ds, train_partial, "w1", train_combine)

    # eval instances: per-batch (doc_id, bg) counts -> bg-keyed left join
    def eval_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = bigrams_of(df, 1)
        g = b.groupby(["doc_id", "bg"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    inst = ds.map_batches(eval_partial, batch_format="pandas")
    joined = inst.join(
        model,
        join_type="left_outer",
        num_partitions=16,
        on=("bg",),
    )

    def score_partial(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.cnt.to_numpy().astype("int64")
        contrib = df.contrib.to_numpy(dtype="float64")  # NaN where unseen
        seen = ~np.isnan(contrib)
        return pd.DataFrame(
            {
                "doc_id": df.doc_id.to_numpy(),
                "n_bigrams": cnt,
                "seen_bigrams": np.where(seen, cnt, 0),
                "fluency_score": np.where(
                    seen, cnt * np.nan_to_num(contrib).astype("int64"), 0
                ),
            }
        )

    def score_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False).agg(
            n_bigrams=("n_bigrams", "sum"),
            seen_bigrams=("seen_bigrams", "sum"),
            fluency_score=("fluency_score", "sum"),
        )

    out = (
        partial_then_combine(joined, score_partial, "doc_id", score_combine)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _q174_sql() -> str:
    # list_filter-then-adjacency == Python str.split() (tokens carry no
    # whitespace, so ' ' is an unambiguous bigram separator); // on
    # nonnegative ints = floor on both engines; COUNT(m.contrib) counts
    # only matched (non-null) bigram instances.
    return rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS bg
  FROM d, unnest(generate_series(1, len(toks) - 1)) AS g(i)
), train AS (
  SELECT bg, w1, CAST(COUNT(*) AS BIGINT) AS c12
  FROM bg WHERE doc_id % 2 = 0 GROUP BY bg, w1
), lefts AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM train GROUP BY w1
), model AS (
  SELECT t.bg, CAST(t.c12 * {_Q174_SCALE} // l.c1 AS BIGINT) AS contrib
  FROM train t JOIN lefts l USING (w1)
  WHERE t.c12 >= {_Q174_MIN_COUNT}
), ev AS (
  SELECT doc_id, bg FROM bg WHERE doc_id % 2 = 1
)
SELECT e.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(COUNT(m.contrib) AS BIGINT) AS seen_bigrams,
       CAST(COALESCE(SUM(m.contrib), 0) AS BIGINT) AS fluency_score
FROM ev e LEFT JOIN model m USING (bg)
GROUP BY e.doc_id
ORDER BY e.doc_id
"""


# -------------------------------------------------------------------- q176

_Q176_NNEG, _Q176_TRUTH_K = 5, 10


def q176_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive retrieval training — the
    training-data op behind every dense-retriever fine-tune (DPR/ANCE
    style): per query, documents the LEXICAL ranker finds plausible (BM25
    top-50) that are NOT in the semantic truth set (exact-cosine top-10)
    are the informative negatives; random negatives are too easy. Reuses
    q170's shared legs verbatim (one BM25 scan + one cosine scan), then
    pure driver set arithmetic over the O(queries x k) leg rows — adding
    this op to the engine costs zero new exchanges. Output per query: the
    top-5 hard negatives by BM25 rank (query_id, neg_rank, doc_id,
    bm25_rank)."""
    lex, sem = _hybrid_legs(sf_dir)
    truth = sem[sem["rank"] <= _Q176_TRUTH_K]
    rows = []
    for qid in sorted(_BM25_QUERIES):
        tset = set(truth[truth.query_id == qid].doc_id.tolist())
        cand = lex[lex.query_id == qid].sort_values("rank")
        neg = cand[~cand.doc_id.isin(tset)].head(_Q176_NNEG)
        for i, (_, r) in enumerate(neg.iterrows(), start=1):
            rows.append((qid, i, int(r.doc_id), int(r["rank"])))
    out = pd.DataFrame(
        rows, columns=["query_id", "neg_rank", "doc_id", "bm25_rank"]
    )
    out["query_id"] = out.query_id.astype(object)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def _q176_sql() -> str:
    return f"""
WITH {_hybrid_ctes()},
truth AS (
  SELECT query_id, doc_id FROM sem_ranked WHERE rank <= {_Q176_TRUTH_K}
), neg AS (
  SELECT l.query_id, l.doc_id, l.rank AS bm25_rank,
         row_number() OVER (PARTITION BY l.query_id ORDER BY l.rank)
           AS neg_rank
  FROM lex l LEFT JOIN truth t
    ON t.query_id = l.query_id AND t.doc_id = l.doc_id
  WHERE t.doc_id IS NULL
)
SELECT query_id, CAST(neg_rank AS BIGINT) AS neg_rank, doc_id,
       CAST(bm25_rank AS BIGINT) AS bm25_rank
FROM neg WHERE neg_rank <= {_Q176_NNEG}
ORDER BY query_id, neg_rank
"""


# -------------------------------------------------------------------- q181

_Q181_BUDGET = 1_000_000


def q181_mixture_allocation(sf_dir: str):
    """Training-mix planning: apportion a fixed token budget across
    sources proportionally to their corpus mass, with LARGEST-REMAINDER
    (Hamilton) rounding so the allocations are integers that sum EXACTLY
    to the budget — the deterministic core of every dataset-mixing recipe
    (The Pile / Dolma style mix tables). Per source: n_tokens (exact
    whitespace-token mass, one streaming scan with per-batch partials —
    source cardinality is catalog-bounded, so the combine is a driver
    merge), base = floor(B*n/N), and the R = B - sum(base) leftover units
    go to the largest remainders (ties -> source asc). All-integer, so
    the SQL mirror is exact. Output: (source, n_tokens, alloc_tokens)."""
    B = _Q181_BUDGET
    ds = _read(sf_dir, "documents", ["source", "text"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        nt = (
            df.text.fillna("").astype(str).str.split().str.len()
            .astype("int64")
        )
        g = pd.DataFrame({"source": df.source, "nt": nt})
        return g.groupby("source", as_index=False)["nt"].sum()

    counts = driver_combine(
        ds, part, lambda df: df.groupby("source", as_index=False)["nt"].sum()
    ).sort_values("source").reset_index(drop=True)
    n = counts.nt.to_numpy().astype("int64")
    N = int(n.sum())
    base = B * n // N
    rem = (B * n) % N
    R = B - int(base.sum())
    order = np.lexsort((counts.source.to_numpy(), -rem))  # rem desc, src asc
    alloc = base.copy()
    alloc[order[:R]] += 1
    return pd.DataFrame(
        {
            "source": counts.source.astype(object),
            "n_tokens": n,
            "alloc_tokens": alloc.astype("int64"),
        }
    )


def _q181_sql() -> str:
    return rf"""
WITH toks AS (
  SELECT source,
         len(list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'),
                         x -> length(x) > 0)) AS nt
  FROM documents
), s AS (
  SELECT source, CAST(SUM(nt) AS BIGINT) AS n FROM toks GROUP BY source
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total FROM s
), base AS (
  SELECT source, n,
         CAST(({_Q181_BUDGET} * n) // t.total AS BIGINT) AS b,
         CAST(({_Q181_BUDGET} * n) % t.total AS BIGINT) AS r
  FROM s, tot t
), rk AS (
  SELECT *, row_number() OVER (ORDER BY r DESC, source) AS rn FROM base
), need AS (
  SELECT CAST({_Q181_BUDGET} - SUM(b) AS BIGINT) AS R FROM base
)
SELECT source, n AS n_tokens,
       CAST(b + CASE WHEN rn <= need.R THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_tokens
FROM rk, need
ORDER BY source
"""


# -------------------------------------------------------------------- q183

_Q183_D = 4096
_Q183_SCALE = 1_000_000
_Q183_TOPK = 100
_Q183_TARGET_LANG = "en"


def _q183_bucket_of(uniq: np.ndarray) -> np.ndarray:
    """sha256-slice bucket per UNIQUE bigram string (q172's hash idiom:
    first 8 bytes of one sha256, mod D) — hashing only uniques keeps the
    Python hash loop off the per-instance path."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(hashlib.sha256(u.encode()).digest()[:8], "big")
            % _Q183_D
            for u in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )


def _q183_instances(df: pd.DataFrame) -> tuple[pd.DataFrame, np.ndarray]:
    """Explode a documents batch into bigram instances: returns
    (frame[doc_id, lang], bucket array), one entry per bigram instance."""
    toks = df.text.fillna("").astype(str).str.split()
    n = toks.str.len()
    keep = n >= 2
    toks = toks[keep]
    sub = df[keep]
    if not len(sub):
        empty = pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "lang": pd.Series([], dtype=object)}
        )
        return empty, np.zeros(0, dtype=np.int64)
    doc_rep, lang_rep, bgs = [], [], []
    for did, lg, tl in zip(sub.doc_id.to_numpy(), sub.lang.fillna(""), toks):
        doc_rep.append(np.full(len(tl) - 1, did, dtype=np.int64))
        lang_rep.append(np.full(len(tl) - 1, lg, dtype=object))
        bgs.append([a + " " + b for a, b in zip(tl, tl[1:])])
    all_bg = np.concatenate([np.asarray(b, dtype=object) for b in bgs])
    uniq, inv = np.unique(all_bg.astype(str), return_inverse=True)
    buckets = _q183_bucket_of(uniq)[inv]
    frame = pd.DataFrame(
        {"doc_id": np.concatenate(doc_rep),
         "lang": np.concatenate(lang_rep)}
    )
    return frame, buckets


def q183_dsir_selection(sf_dir: str):
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every NON-target
    document by how target-like its hashed-bigram features are, select the
    top-K. Features are word bigrams hashed into D=4096 buckets (the
    paper's hashed n-gram generative model); per bucket the importance
    weight is the add-1-smoothed target/raw ratio in fixed point,
    w[b] = floor((t[b]+1)*1e6/(r[b]+1)) — the log-free integer variant
    (per-feature monotone in the same ratio the paper's log-likelihood
    uses; exact cross-engine, unlike float logs). Target = lang='en' docs;
    raw = the whole corpus; candidates = everything non-target. A doc's
    raw_score sums w over its bigram instances; selection ranks by
    length-debiased avg_score = raw_score // n_bigrams (deterministic
    top-K in place of the paper's Gumbel sampling, disclosed).

    Plan (ZERO exchanges): pass 1 streams the corpus once emitting one
    (2 x 32 KB) dense bucket-count partial per BLOCK (batch_size sized to
    blocks — a fixed-size dense partial costs per CALL, PERF_NOTES #36),
    driver-summed; the 4096-entry weight table is closure-shipped to pass
    2, which scores candidates per batch and emits only its LOCAL top-K
    (global top-K = top-K of per-block top-Ks, the q3 partial-top-k
    shape). Driver merge is O(blocks x K). The reference scores documents
    against per-practice term models and keeps the best matches
    (src/services/enrichment.service.js top-k rerank); this is the
    corpus-selection form. Output: (sel_rank, doc_id, n_bigrams,
    raw_score, avg_score), rank 1 = most target-like."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        frame, buckets = _q183_instances(df)
        is_t = (frame.lang == _Q183_TARGET_LANG).to_numpy()
        t = np.bincount(buckets[is_t], minlength=_Q183_D).astype(np.int64)
        r = np.bincount(buckets, minlength=_Q183_D).astype(np.int64)
        return pd.DataFrame({"t": [t.tobytes()], "r": [r.tobytes()]})

    t_cnt = np.zeros(_Q183_D, dtype=np.int64)
    r_cnt = np.zeros(_Q183_D, dtype=np.int64)
    for row in ds.map_batches(
        count_partial, batch_format="pandas", batch_size=65536
    ).take_all():
        t_cnt += np.frombuffer(row["t"], dtype=np.int64)
        r_cnt += np.frombuffer(row["r"], dtype=np.int64)
    w = (t_cnt + 1) * _Q183_SCALE // (r_cnt + 1)  # 32 KB, closure-shipped

    def score_partial(df: pd.DataFrame) -> pd.DataFrame:
        frame, buckets = _q183_instances(df)
        cand = (frame.lang != _Q183_TARGET_LANG).to_numpy()
        g = pd.DataFrame(
            {"doc_id": frame.doc_id[cand], "wgt": w[buckets[cand]]}
        ).groupby("doc_id", as_index=False).agg(
            n_bigrams=("wgt", "size"), raw_score=("wgt", "sum")
        )
        g["avg_score"] = (
            g.raw_score.to_numpy().astype("int64")
            // g.n_bigrams.to_numpy().astype("int64")
        )
        return g.sort_values(
            ["avg_score", "doc_id"], ascending=[False, True]
        ).head(_Q183_TOPK)

    parts = ds.map_batches(score_partial, batch_format="pandas").to_pandas()
    top = (
        parts.sort_values(["avg_score", "doc_id"], ascending=[False, True])
        .head(_Q183_TOPK)
        .reset_index(drop=True)
    )
    out = pd.DataFrame(
        {
            "sel_rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "doc_id": top.doc_id.astype("int64"),
            "n_bigrams": top.n_bigrams.astype("int64"),
            "raw_score": top.raw_score.astype("int64"),
            "avg_score": top.avg_score.astype("int64"),
        }
    )
    return out


def _q183_sql() -> str:
    # Same bigrams (q174's adjacency unnest), same sha256-slice buckets
    # (q172's idiom), same add-1 fixed-point weights; // on nonnegative
    # ints = floor on both engines. Every scored bucket exists in r
    # (candidates are a subset of raw), so the inner join loses nothing.
    return rf"""
WITH d AS (
  SELECT doc_id, COALESCE(lang, '') AS lang,
         list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), bg AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(sha256(toks[i] || ' ' || toks[i + 1]), 1, 16))
              AS UBIGINT) % {_Q183_D} AS b
  FROM d, unnest(generate_series(1, len(toks) - 1)) AS g(i)
), t AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS tc FROM bg
  WHERE lang = '{_Q183_TARGET_LANG}' GROUP BY b
), r AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS rc FROM bg GROUP BY b
), w AS (
  SELECT r.b,
         CAST((COALESCE(t.tc, 0) + 1) * {_Q183_SCALE} // (r.rc + 1)
              AS BIGINT) AS wgt
  FROM r LEFT JOIN t USING (b)
), sc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(w.wgt) AS BIGINT) AS raw_score
  FROM bg JOIN w USING (b)
  WHERE lang <> '{_Q183_TARGET_LANG}'
  GROUP BY doc_id
), ranked AS (
  SELECT *, CAST(raw_score // n_bigrams AS BIGINT) AS avg_score
  FROM sc
)
SELECT CAST(row_number() OVER (ORDER BY avg_score DESC, doc_id) AS BIGINT)
         AS sel_rank,
       doc_id, n_bigrams, raw_score, avg_score
FROM ranked
ORDER BY avg_score DESC, doc_id
LIMIT {_Q183_TOPK}
"""


# -------------------------------------------------------------------- q184

_Q184_MULT = 2654435761  # Knuth multiplicative constant
_Q184_MOD = 8191  # Mersenne prime -> weights in [-4095, 4095]


def q184_quality_classifier(sf_dir: str):
    """fastText-style hashed linear quality classifier — the model shape
    behind the CCNet / GPT-3 / CommonCrawl "quality filter" stage: a doc's
    score is the sum of per-feature weights over hashed unigrams AND word
    bigrams (fastText wordNgrams=2, hashing-trick bucket table), keep =
    score > 0. The weight table is PLANTED deterministically (w(b) =
    (b*Knuth) mod 8191 - 4095 over the q183 bucket space) — a stand-in
    for trained parameters with the exact serving-path dataflow; this is
    disclosed, the point is the scoring operator, not the fit. Per
    (source, lang) the output reports docs, kept docs, keep rate in ppm
    and the summed score — the per-slice keep-rate report a filtering run
    ships. Plan: ONE streaming scan, per-batch vectorized hashed scoring
    (uniques-only sha256), per-batch (source, lang) partial counters,
    catalog-bounded driver merge — ZERO exchanges, no model pass (weights
    are a pure bucket function). Reference analogue: the per-document
    confidence scorer + review gate (src/services/confidence.service.js)
    applied corpus-wide. Output: (source, lang, n_docs, keep_docs,
    keep_ppm, sum_score)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "source", "lang"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        toks = df.text.fillna("").astype(str).str.split()
        pos_rep, grams = [], []
        for i, tl in enumerate(toks):
            n = len(tl)
            if n == 0:
                continue
            pos_rep.append(np.full(2 * n - 1, i, dtype=np.int64))
            grams.append(np.asarray(
                tl + [a + " " + b for a, b in zip(tl, tl[1:])], dtype=object
            ))
        score = np.zeros(len(df), dtype=np.int64)
        if grams:
            allg = np.concatenate(grams).astype(str)
            uniq, inv = np.unique(allg, return_inverse=True)
            wu = (_q183_bucket_of(uniq) * _Q184_MULT) % _Q184_MOD - (
                (_Q184_MOD - 1) // 2
            )
            np.add.at(score, np.concatenate(pos_rep), wu[inv])
        g = pd.DataFrame(
            {
                "source": df.source.to_numpy(dtype=object),
                "lang": df.lang.fillna("").to_numpy(dtype=object),
                "n_docs": np.ones(len(df), dtype=np.int64),
                "keep_docs": (score > 0).astype(np.int64),
                "sum_score": score,
            }
        )
        return g.groupby(["source", "lang"], as_index=False).sum()

    out = driver_combine(
        ds, part,
        lambda df: df.groupby(["source", "lang"], as_index=False).sum(),
    ).sort_values(["source", "lang"]).reset_index(drop=True)
    out["keep_ppm"] = (
        out.keep_docs.to_numpy().astype("int64") * 1_000_000
        // out.n_docs.to_numpy().astype("int64")
    )
    for c in ("n_docs", "keep_docs", "keep_ppm", "sum_score"):
        out[c] = out[c].astype("int64")
    return out[["source", "lang", "n_docs", "keep_docs", "keep_ppm",
                "sum_score"]]


def _q184_sql() -> str:
    half = (_Q184_MOD - 1) // 2
    return rf"""
WITH d AS (
  SELECT doc_id, source, COALESCE(lang, '') AS lang,
         list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), uni AS (
  SELECT doc_id, unnest(toks) AS g FROM d
), bi AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
  FROM d, unnest(generate_series(1, len(toks) - 1)) AS t(i)
), grams AS (
  SELECT * FROM uni UNION ALL SELECT * FROM bi
), wt AS (
  SELECT doc_id,
         CAST((CAST(('0x' || substr(sha256(g), 1, 16)) AS UBIGINT)
               % {_Q183_D}) * {_Q184_MULT} % {_Q184_MOD} AS BIGINT)
           - {half} AS w
  FROM grams
), sc AS (
  SELECT doc_id, CAST(SUM(w) AS BIGINT) AS score FROM wt GROUP BY doc_id
), alldocs AS (
  SELECT d.source, d.lang, COALESCE(sc.score, 0) AS score
  FROM d LEFT JOIN sc USING (doc_id)
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS keep_docs,
       CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS keep_ppm,
       CAST(SUM(score) AS BIGINT) AS sum_score
FROM alldocs
GROUP BY source, lang
ORDER BY source, lang
"""


# -------------------------------------------------------------------- q185

_Q185_SHARDS = 10


def q185_novelty_curve(sf_dir: str):
    """Corpus-saturation (Heaps-law) diagnostic: ingest the corpus as
    shards 0..9 (shard = doc_id % 10, the deterministic arrival order) and
    report how much NEW vocabulary each successive shard contributes —
    novel_tokens(s) = distinct tokens whose FIRST shard is s, plus the
    cumulative distinct count. The marginal-data-value curve every
    scaling-laws data-curation effort draws before buying more of a
    source: when the curve flattens, the next shard of this corpus is
    mostly repetition. Plan: per-batch (token, min_shard) pre-reduce, ONE
    token-keyed exchange taking the min, then a 10-cell count — the
    combine-before-shuffle shape (A7). Doc counts per shard ride a
    separate per-batch 10-row partial on the same scan lineage. Output:
    (shard, n_docs, novel_tokens, cum_tokens)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df.text.fillna("").astype(str).str.split().explode()
        shard = (df.doc_id % _Q185_SHARDS).reindex(toks.index)
        sub = pd.DataFrame({"token": toks, "shard": shard}).dropna()
        sub = sub[sub.token.str.len() > 0]
        return sub.groupby("token", as_index=False)["shard"].min()

    def tok_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False)["shard"].min()

    mins = partial_then_combine(ds, tok_partial, "token", tok_combine)
    nov_parts = mins.map_batches(
        lambda df: df.groupby("shard", as_index=False).size(),
        batch_format="pandas",
    ).to_pandas()
    nov = nov_parts.groupby("shard")["size"].sum()

    nd_parts = driver_combine(
        ds,
        lambda df: pd.DataFrame({"shard": df.doc_id % _Q185_SHARDS})
        .groupby("shard", as_index=False)
        .size(),
        lambda df: df.groupby("shard", as_index=False)["size"].sum(),
    )
    nd = nd_parts.set_index("shard")["size"]

    shards = np.arange(_Q185_SHARDS, dtype=np.int64)
    novel = np.asarray(
        [int(nov.get(s, 0)) for s in shards], dtype=np.int64
    )
    return pd.DataFrame(
        {
            "shard": shards,
            "n_docs": np.asarray(
                [int(nd.get(s, 0)) for s in shards], dtype=np.int64
            ),
            "novel_tokens": novel,
            "cum_tokens": np.cumsum(novel).astype(np.int64),
        }
    )


def _q185_sql() -> str:
    return rf"""
WITH d AS (
  SELECT doc_id % {_Q185_SHARDS} AS shard,
         list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), nd AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs FROM d GROUP BY shard
), tok AS (
  SELECT shard, unnest(toks) AS token FROM d
), ms AS (
  SELECT token, MIN(shard) AS shard FROM tok GROUP BY token
), nov AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS novel_tokens
  FROM ms GROUP BY shard
)
SELECT g.shard, COALESCE(nd.n_docs, 0) AS n_docs,
       COALESCE(nov.novel_tokens, 0) AS novel_tokens,
       CAST(SUM(COALESCE(nov.novel_tokens, 0))
            OVER (ORDER BY g.shard) AS BIGINT) AS cum_tokens
FROM (SELECT unnest(generate_series(0, {_Q185_SHARDS - 1})) AS shard) g
LEFT JOIN nd USING (shard)
LEFT JOIN nov USING (shard)
ORDER BY g.shard
"""


# -------------------------------------------------------------------- q186

_Q186_A_CHARS = 300
_Q186_B_TOKENS = 48
_Q186_PPM = 1_000_000


def q186_annotator_agreement(sf_dir: str):
    """Inter-annotator agreement (Cohen's kappa) between two weak
    labelers — the label-quality audit run before trusting any
    rule-derived or model-derived training label: labeler A flags docs
    with n_chars >= 300, labeler B flags docs with >= 48 whitespace
    tokens. Reports the confusion matrix and po/pe/kappa in ppm, all
    integer (exact rational arithmetic scaled by 1e6; the one division
    truncates toward zero on BOTH engines by construction — operands are
    made nonnegative via an explicit sign split). Plan: ONE streaming
    scan, four int64 counters per batch, driver sum — zero exchanges,
    O(1) driver state. The reference's review gate compares its
    confidence rule against the validation rule per document
    (src/services/validation.service.js); kappa is the corpus-level
    agreement statistic between two such gates. Output one row:
    (n_docs, n11, n10, n01, n00, po_ppm, pe_ppm, kappa_ppm)."""
    ds = _read(sf_dir, "documents", ["text", "n_chars"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        a = (df.n_chars.fillna(0).to_numpy() >= _Q186_A_CHARS)
        ntok = (
            df.text.fillna("").astype(str).str.split().str.len().to_numpy()
        )
        b = ntok >= _Q186_B_TOKENS
        return pd.DataFrame(
            {
                "n11": [int((a & b).sum())],
                "n10": [int((a & ~b).sum())],
                "n01": [int((~a & b).sum())],
                "n00": [int((~a & ~b).sum())],
            }
        )

    c = driver_combine(ds, part, lambda df: df.sum().to_frame().T)
    n11, n10, n01, n00 = (int(c[k].iloc[0]) for k in ("n11", "n10", "n01", "n00"))
    N = n11 + n10 + n01 + n00
    a1, b1 = n11 + n10, n11 + n01
    po_num = n11 + n00
    pe_n2 = a1 * b1 + (N - a1) * (N - b1)  # pe * N^2, exact
    num = po_num * N - pe_n2  # (po - pe) * N^2
    den = N * N - pe_n2  # (1 - pe) * N^2
    kappa = (1 if num >= 0 else -1) * (abs(num) * _Q186_PPM // den)
    return pd.DataFrame(
        {
            "n_docs": [N], "n11": [n11], "n10": [n10],
            "n01": [n01], "n00": [n00],
            "po_ppm": [po_num * _Q186_PPM // N],
            "pe_ppm": [pe_n2 * _Q186_PPM // (N * N)],
            "kappa_ppm": [kappa],
        }
    ).astype("int64")


def _q186_sql() -> str:
    # sign-split division mirrors the Python trunc-toward-zero exactly;
    # every other step is exact integer arithmetic (HUGEINT intermediates
    # collapse back to BIGINT via the final CASTs).
    return rf"""
WITH lab AS (
  SELECT (COALESCE(n_chars, 0) >= {_Q186_A_CHARS}) AS a,
         (len(list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'),
                          x -> length(x) > 0)) >= {_Q186_B_TOKENS}) AS b
  FROM documents
), m AS (
  SELECT CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
  FROM lab
), s AS (
  SELECT *, n11 + n10 + n01 + n00 AS N, n11 + n10 AS a1, n11 + n01 AS b1
  FROM m
), t AS (
  SELECT *, n11 + n00 AS po_num,
         a1 * b1 + (N - a1) * (N - b1) AS pe_n2
  FROM s
)
SELECT CAST(N AS BIGINT) AS n_docs, n11, n10, n01, n00,
       CAST(po_num * {_Q186_PPM} // N AS BIGINT) AS po_ppm,
       CAST(pe_n2 * {_Q186_PPM} // (N * N) AS BIGINT) AS pe_ppm,
       CAST(CASE WHEN po_num * N >= pe_n2 THEN 1 ELSE -1 END
            * (abs(po_num * N - pe_n2) * {_Q186_PPM} // (N * N - pe_n2))
            AS BIGINT) AS kappa_ppm
FROM t
"""


# -------------------------------------------------------------------- q187

_Q187_BUDGET = 1_000_000


def q187_alpha_mixture(sf_dir: str):
    """Temperature-scaled mixture allocation (alpha = 0.5) — the
    multilingual/multi-source sampling scheme of XLM-R / mC4: allocate a
    token budget proportional to n_tokens^alpha instead of n_tokens, so
    small sources are upsampled relative to their mass. q181's Hamilton
    largest-remainder apportionment applied to weight = isqrt(n_tokens)
    (the exact integer sqrt, so the SQL mirror is exact via a
    float-sqrt-then-correct idiom — no float drift can survive the +-1
    correction). Same plan as q181: one streaming token-mass scan,
    catalog-bounded driver merge, integer-exact sum == budget. Output:
    (source, n_tokens, weight, alloc_tokens)."""
    import math

    B = _Q187_BUDGET
    ds = _read(sf_dir, "documents", ["source", "text"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        nt = (
            df.text.fillna("").astype(str).str.split().str.len()
            .astype("int64")
        )
        g = pd.DataFrame({"source": df.source, "nt": nt})
        return g.groupby("source", as_index=False)["nt"].sum()

    counts = driver_combine(
        ds, part, lambda df: df.groupby("source", as_index=False)["nt"].sum()
    ).sort_values("source").reset_index(drop=True)
    n = counts.nt.to_numpy().astype("int64")
    wgt = np.asarray([math.isqrt(int(x)) for x in n], dtype=np.int64)
    W = int(wgt.sum())
    base = B * wgt // W
    rem = (B * wgt) % W
    R = B - int(base.sum())
    order = np.lexsort((counts.source.to_numpy(), -rem))
    alloc = base.copy()
    alloc[order[:R]] += 1
    return pd.DataFrame(
        {
            "source": counts.source.astype(object),
            "n_tokens": n,
            "weight": wgt,
            "alloc_tokens": alloc.astype("int64"),
        }
    )


def _q187_sql() -> str:
    return rf"""
WITH toks AS (
  SELECT source,
         len(list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'),
                         x -> length(x) > 0)) AS nt
  FROM documents
), s AS (
  SELECT source, CAST(SUM(nt) AS BIGINT) AS n FROM toks GROUP BY source
), sq AS (
  -- exact isqrt: float sqrt then +-1 correction (the correction absorbs
  -- any last-ulp float error; result is the true floor sqrt)
  SELECT source, n,
         CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s0
  FROM s
), w AS (
  SELECT source, n,
         s0 + (CASE WHEN (s0 + 1) * (s0 + 1) <= n THEN 1 ELSE 0 END)
            - (CASE WHEN s0 * s0 > n THEN 1 ELSE 0 END) AS wgt
  FROM sq
), tot AS (
  SELECT CAST(SUM(wgt) AS BIGINT) AS W FROM w
), base AS (
  SELECT source, n, wgt,
         CAST(({_Q187_BUDGET} * wgt) // t.W AS BIGINT) AS b,
         CAST(({_Q187_BUDGET} * wgt) % t.W AS BIGINT) AS r
  FROM w, tot t
), rk AS (
  SELECT *, row_number() OVER (ORDER BY r DESC, source) AS rn FROM base
), need AS (
  SELECT CAST({_Q187_BUDGET} - SUM(b) AS BIGINT) AS R FROM base
)
SELECT source, n AS n_tokens, CAST(wgt AS BIGINT) AS weight,
       CAST(b + CASE WHEN rn <= need.R THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_tokens
FROM rk, need
ORDER BY source
"""


# -------------------------------------------------------------------- q190

# function-word list adapted to the synthetic corpus vocabulary (the
# English list kills 100% here — a degenerate gate teaches nothing);
# structure and threshold are the paper's
_Q190_STOP = ("a", "the", "data", "value", "key", "row", "table", "line")


def q190_gopher_rules(sf_dir: str):
    """Gopher-style rule-based quality filter (Rae et al. 2021, Table A1
    — the published rule suite RefinedWeb/Dolma/FineWeb all descend
    from), restricted to its integer-expressible core so the oracle is
    exact: R1 word count in [50, 100000]; R2 mean word length in [3, 10]
    (as 3*nw <= sum_len <= 10*nw — no division); R3 symbol-to-word ratio
    <= 0.1 for '#' and '...' (as 10*nsym <= nw); R4 >= 80% of words
    contain an alphabetic character (as 5*n_alpha >= 4*nw); R5 at least
    2 distinct stopwords present. Zero-token docs fail R1/R2/R4 by
    definition. Output: per-rule documents KILLED plus the all-pass
    survivor count — the per-rule attribution a filtering run reports
    before anyone tunes thresholds. Plan: ONE streaming scan, per-batch
    vectorized rule evaluation, six int64 counters to the driver — zero
    exchanges. Output: (metric, n_docs)."""
    ds = _read(sf_dir, "documents", ["text"])
    stop = set(_Q190_STOP)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        txt = df.text.fillna("").astype(str)
        toks = txt.str.split()
        nw = toks.str.len().to_numpy(dtype=np.int64)
        ex = toks.explode().dropna()
        ex = ex[ex.str.len() > 0]
        sumlen = (
            ex.str.len().groupby(level=0).sum()
            .reindex(df.index, fill_value=0)
            .to_numpy(dtype=np.int64)
        )
        nalpha = (
            ex.str.contains("[a-zA-Z]", regex=True)
            .groupby(level=0).sum()
            .reindex(df.index, fill_value=0)
            .to_numpy(dtype=np.int64)
        )
        nstop = (
            ex.str.lower()[ex.str.lower().isin(stop)]
            .groupby(level=0).nunique()
            .reindex(df.index, fill_value=0)
            .to_numpy(dtype=np.int64)
        )
        nsym = (
            txt.str.count("#") + txt.str.count(r"\.\.\.")
        ).to_numpy(dtype=np.int64)
        r1 = (nw >= 50) & (nw <= 100_000)
        r2 = (nw > 0) & (3 * nw <= sumlen) & (sumlen <= 10 * nw)
        r3 = 10 * nsym <= nw
        r4 = (nw > 0) & (5 * nalpha >= 4 * nw)
        r5 = nstop >= 2
        return pd.DataFrame(
            {
                "r1_word_count": [int((~r1).sum())],
                "r2_mean_word_len": [int((~r2).sum())],
                "r3_symbol_ratio": [int((~r3).sum())],
                "r4_alpha_words": [int((~r4).sum())],
                "r5_stopwords": [int((~r5).sum())],
                "all_pass": [int((r1 & r2 & r3 & r4 & r5).sum())],
            }
        )

    c = driver_combine(ds, part, lambda df: df.sum().to_frame().T)
    metrics = sorted(c.columns)
    return pd.DataFrame(
        {
            "metric": pd.array(metrics, "object"),
            "n_docs": pd.array([int(c[m].iloc[0]) for m in metrics], "int64"),
        }
    )


def _q190_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in _Q190_STOP)
    return rf"""
WITH d AS (
  SELECT list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'),
                     x -> length(x) > 0) AS toks,
         COALESCE(text, '') AS txt
  FROM documents
), f AS (
  SELECT len(toks) AS nw,
         COALESCE(list_sum(list_transform(toks, x -> length(x))), 0)
           AS sumlen,
         len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]')))
           AS nalpha,
         len(list_intersect(list_distinct(list_transform(toks,
                                                         x -> lower(x))),
                            [{stops}])) AS nstop,
         (length(txt) - length(replace(txt, '#', '')))
           + (length(txt) - length(replace(txt, '...', ''))) // 3 AS nsym
  FROM d
), r AS (
  SELECT (nw >= 50 AND nw <= 100000) AS r1,
         (nw > 0 AND 3 * nw <= sumlen AND sumlen <= 10 * nw) AS r2,
         (10 * nsym <= nw) AS r3,
         (nw > 0 AND 5 * nalpha >= 4 * nw) AS r4,
         (nstop >= 2) AS r5
  FROM f
)
SELECT metric, n_docs FROM (
  SELECT 'r1_word_count' AS metric,
         CAST(SUM(CASE WHEN r1 THEN 0 ELSE 1 END) AS BIGINT) AS n_docs FROM r
  UNION ALL
  SELECT 'r2_mean_word_len',
         CAST(SUM(CASE WHEN r2 THEN 0 ELSE 1 END) AS BIGINT) FROM r
  UNION ALL
  SELECT 'r3_symbol_ratio',
         CAST(SUM(CASE WHEN r3 THEN 0 ELSE 1 END) AS BIGINT) FROM r
  UNION ALL
  SELECT 'r4_alpha_words',
         CAST(SUM(CASE WHEN r4 THEN 0 ELSE 1 END) AS BIGINT) FROM r
  UNION ALL
  SELECT 'r5_stopwords',
         CAST(SUM(CASE WHEN r5 THEN 0 ELSE 1 END) AS BIGINT) FROM r
  UNION ALL
  SELECT 'all_pass',
         CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5
                       THEN 1 ELSE 0 END) AS BIGINT) FROM r
)
ORDER BY metric
"""


# -------------------------------------------------------------------- q191

def q191_distinct_ngrams(sf_dir: str):
    """Corpus diversity via distinct-n (Li et al. 2016, the distinct-1/
    distinct-2 generation-diversity metric, applied per source): for each
    (source, n in 1..3), the total n-gram instance count, the distinct
    n-gram count, and their ratio in ppm — LOW distinct-n flags a source
    as templated/repetitive BEFORE it floods a training mix (the corpus-
    level complement of q107's per-doc repetition gate). Plan: per-batch
    (source, n, gram) pre-counts, ONE gram-keyed exchange (grams sharing
    a hash co-locate, so per-(source,n,gram) totals finish in-exchange),
    then per-block (source, n) cell partials (<= sources x 3 rows each)
    to a driver merge. Output: (source, n, total_grams, distinct_grams,
    distinct_ppm)."""
    ds = _read(sf_dir, "documents", ["source", "text"])

    def gram_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df.text.fillna("").astype(str).str.split()
        src_rep, n_rep, grams = [], [], []
        for src, tl in zip(df.source.to_numpy(dtype=object), toks):
            L = len(tl)
            for n in (1, 2, 3):
                if L < n:
                    continue
                gs = (
                    tl if n == 1
                    else [" ".join(tl[i : i + n]) for i in range(L - n + 1)]
                )
                src_rep.append(np.full(len(gs), src, dtype=object))
                n_rep.append(np.full(len(gs), n, dtype=np.int64))
                grams.append(np.asarray(gs, dtype=object))
        if not grams:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64"),
                 "gram": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype="int64")}
            )
        g = pd.DataFrame(
            {"source": np.concatenate(src_rep),
             "n": np.concatenate(n_rep),
             "gram": np.concatenate(grams)}
        ).groupby(["source", "n", "gram"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    def gram_combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source", "n", "gram"], as_index=False)["c"].sum()

    per_gram = partial_then_combine(ds, gram_partial, "gram", gram_combine)
    cells = per_gram.map_batches(
        lambda df: df.groupby(["source", "n"], as_index=False).agg(
            total_grams=("c", "sum"), distinct_grams=("c", "size")
        ),
        batch_format="pandas",
    ).to_pandas()
    out = (
        cells.groupby(["source", "n"], as_index=False)[
            ["total_grams", "distinct_grams"]
        ].sum()
        .sort_values(["source", "n"])
        .reset_index(drop=True)
    )
    out["distinct_ppm"] = (
        out.distinct_grams.to_numpy().astype("int64") * 1_000_000
        // out.total_grams.to_numpy().astype("int64")
    )
    for c in ("n", "total_grams", "distinct_grams", "distinct_ppm"):
        out[c] = out[c].astype("int64")
    out["source"] = out.source.astype(object)
    return out


def _q191_sql() -> str:
    return r"""
WITH d AS (
  SELECT source,
         list_filter(regexp_split_to_array(COALESCE(text, ''), '\s+'),
                     x -> length(x) > 0) AS toks
  FROM documents
), grams AS (
  SELECT source, 1 AS n, unnest(toks) AS g FROM d
  UNION ALL
  SELECT source, 2, toks[i] || ' ' || toks[i + 1]
  FROM d, unnest(generate_series(1, len(toks) - 1)) AS t(i)
  UNION ALL
  SELECT source, 3, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
  FROM d, unnest(generate_series(1, len(toks) - 2)) AS t(i)
), cnt AS (
  SELECT source, n, g, CAST(COUNT(*) AS BIGINT) AS c
  FROM grams GROUP BY source, n, g
)
SELECT source, CAST(n AS BIGINT) AS n,
       CAST(SUM(c) AS BIGINT) AS total_grams,
       CAST(COUNT(*) AS BIGINT) AS distinct_grams,
       CAST(COUNT(*) * 1000000 // SUM(c) AS BIGINT) AS distinct_ppm
FROM cnt
GROUP BY source, n
ORDER BY source, n
"""


# -------------------------------------------------------------------- q192

def q192_dedup_report(sf_dir: str):
    """Per-source exact-duplication report — the dedup-yield table a
    curation run publishes per domain (which sources are worth deduping,
    which are already clean): per source, total docs, distinct texts,
    duplicate docs (total - distinct) and dup rate in ppm. Plan:
    per-batch (source, text-hash) pre-counts, ONE hash-keyed exchange
    (q7's exact-dedup partitioning), per-block (source) cell partials to
    a catalog-bounded driver merge. Hashing the text (q31's sha256-slice
    idiom) keeps the exchange rows fixed-width — the full text never
    shuffles. Output: (source, n_docs, distinct_texts, dup_docs,
    dup_ppm)."""
    import hashlib

    ds = _read(sf_dir, "documents", ["source", "text"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.sha256(t.encode()).digest()[:8], "big"
                ) >> 1
                for t in df.text.fillna("").astype(str)
            ),
            dtype=np.int64,
            count=len(df),
        )
        g = pd.DataFrame(
            {"source": df.source.to_numpy(dtype=object), "h": h}
        ).groupby(["source", "h"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    def comb(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source", "h"], as_index=False)["c"].sum()

    per_text = partial_then_combine(ds, part, "h", comb)
    cells = per_text.map_batches(
        lambda df: df.groupby("source", as_index=False).agg(
            n_docs=("c", "sum"), distinct_texts=("c", "size")
        ),
        batch_format="pandas",
    ).to_pandas()
    out = (
        cells.groupby("source", as_index=False)[["n_docs", "distinct_texts"]]
        .sum()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["dup_docs"] = out.n_docs - out.distinct_texts
    out["dup_ppm"] = (
        out.dup_docs.to_numpy().astype("int64") * 1_000_000
        // out.n_docs.to_numpy().astype("int64")
    )
    for c in ("n_docs", "distinct_texts", "dup_docs", "dup_ppm"):
        out[c] = out[c].astype("int64")
    out["source"] = out.source.astype(object)
    return out


def _q192_sql() -> str:
    # sha256-slice >> 1 == the Ray side's 63-bit nonnegative key; counting
    # distinct hashes (not distinct texts) keeps collision behavior
    # IDENTICAL across engines even if a 63-bit collision ever occurred
    return r"""
WITH h AS (
  SELECT source,
         CAST(('0x' || substr(sha256(COALESCE(text, '')), 1, 16))
              AS UBIGINT) >> 1 AS h
  FROM documents
), cnt AS (
  SELECT source, h, CAST(COUNT(*) AS BIGINT) AS c FROM h GROUP BY source, h
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS distinct_texts,
       CAST(SUM(c) - COUNT(*) AS BIGINT) AS dup_docs,
       CAST((SUM(c) - COUNT(*)) * 1000000 // SUM(c) AS BIGINT) AS dup_ppm
FROM cnt
GROUP BY source
ORDER BY source
"""
