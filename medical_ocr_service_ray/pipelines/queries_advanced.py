"""curriculum, semantic dedup, graph mesh, itemsets, LSH eval (q151-q169) — split from pipelines/queries.py (r5), no behavior change."""

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
    _cos_pairs_group,
    _day_index,
    _emb_dataset,
    _q13_base_sql,
)
from medical_ocr_service_ray.pipelines.queries_text import _kmeans_cte_chain
from medical_ocr_service_ray.pipelines.queries_joins import (
    _copurchase_edge_partials,
    _drop_mega_baskets,
)
from medical_ocr_service_ray.pipelines.queries_analytics import (
    _copurchase_pairs,
    _triangles_from_pairs,
)
from medical_ocr_service_ray.pipelines.queries_mlprep import (
    _bpe_train_rounds,
    _equidepth_boundaries,
)




# -------------------------------------------------------------------- q151

def q151_curriculum_shards(sf_dir: str):
    """Global ordered shard assignment (distributed zipWithIndex): every
    document gets its EXACT rank under the curriculum order (n_chars DESC,
    doc_id ASC) and a contiguous shard id (rank-1)//SHARD — the "sort the
    corpus by difficulty and cut contiguous training shards" step of
    curriculum learning. Classic two-pass global ranking with NO global
    sort: pass 1 reduces the corpus to per-length counts (the length
    domain is bounded by the ingestion truncation cap — M5's semantics,
    functions/normalize.py — so the driver offset table is O(domain), not
    O(rows)); pass 2 is ONE n_chars-keyed exchange where each bucket sorts
    its lengths locally (doc_id within a length) and adds the broadcast
    prefix offset. Equal-length docs co-locate by construction, so the
    within-length tie-break is exact. Returns a per-doc DATASET (q47
    convention: per-doc cardinality is unbounded at scale)."""
    import ray as _ray

    from medical_ocr_service_ray.stages.aggregate import (
        compute_num_buckets,
        dataset_input_bytes,
    )

    SHARD = 500
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    nb = compute_num_buckets(dataset_input_bytes(ds))

    def len_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_chars", as_index=False).size()
        return g.rename(columns={"size": "n"})

    cnt = driver_combine(
        ds, len_partial, lambda df: df.groupby("n_chars", as_index=False)["n"].sum()
    ).sort_values("n_chars", ascending=False)
    # offset[L] = number of docs strictly longer than L
    off_ref = _ray.put(
        dict(zip(cnt.n_chars.to_numpy(), (cnt.n.cumsum() - cnt.n).to_numpy()))
    )

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        om = _ray.get(off_ref)
        d = df.sort_values(["n_chars", "doc_id"])
        local = d.groupby("n_chars").cumcount().to_numpy()
        rank = (d.n_chars.map(om).to_numpy() + local + 1).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": d.doc_id.to_numpy().astype("int64"),
                "global_rank": rank,
                "shard_id": ((rank - 1) // SHARD).astype("int64"),
            }
        )

    return bucketed_combine(ds, "n_chars", rank_bucket, num_buckets=nb)


_Q151_SQL = """
WITH r AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
)
SELECT doc_id, rk::BIGINT AS global_rank, ((rk - 1) // 500)::BIGINT AS shard_id
FROM r ORDER BY doc_id
"""


# -------------------------------------------------------------------- q152

def q152_vocab_spectrum(sf_dir: str):
    """Corpus frequency-of-frequencies spectrum over word 3-gram shingles
    (the Zipf-tail audit behind hapax filtering / vocab truncation before
    tokenizer training). Shingle cardinality is unbounded, so occurrence
    counts reduce in ONE gram-keyed exchange; each bucket then collapses
    its exact counts into log2-frequency bins (<= 64 cells — a gram's
    global count lives wholly in its bucket, so binning in-bucket is
    exact) and the driver merges blocks x 64 rows. freq_bin is the integer
    bit-length-minus-1 of the count (np.frexp exponent — exact for
    int64 < 2^53; mirrored in SQL as length(bin(n)) - 1). Returns
    (freq_bin, n_grams, n_occurrences)."""
    import re
    from collections import Counter

    ds = _read(sf_dir, "documents", ["text"])
    word_re = re.compile(r"[a-z]+")

    def gram_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in df.text:
            ws = word_re.findall((t or "").lower())
            for i in range(len(ws) - 2):
                c[" ".join(ws[i : i + 3])] += 1
        return pd.DataFrame(
            {"g": list(c.keys()), "n": pd.array(list(c.values()), "int64")}
        )

    def spectrum_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("g", as_index=False)["n"].sum()
        if g.empty:
            return pd.DataFrame(
                {
                    "freq_bin": pd.Series(dtype="int64"),
                    "n_grams": pd.Series(dtype="int64"),
                    "n_occurrences": pd.Series(dtype="int64"),
                }
            )
        b = (np.frexp(g.n.to_numpy().astype("float64"))[1] - 1).astype("int64")
        out = (
            pd.DataFrame({"freq_bin": b, "n_grams": np.int64(1), "n_occurrences": g.n})
            .groupby("freq_bin", as_index=False)
            .sum()
        )
        return out.astype("int64")

    cells = partial_then_combine(
        ds, gram_partial, "g", spectrum_bucket, num_buckets=16
    ).to_pandas()
    out = cells.groupby("freq_bin", as_index=False).sum().sort_values("freq_bin")
    return out.astype("int64").reset_index(drop=True)


_Q152_SQL = """
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents
), grams AS (
  SELECT unnest(list_transform(range(1, len(ws) - 1),
                j -> ws[j] || ' ' || ws[j+1] || ' ' || ws[j+2])) AS g
  FROM toks
), counts AS (
  SELECT g, COUNT(*)::BIGINT AS n FROM grams GROUP BY g
)
SELECT (length(bin(n)) - 1)::BIGINT AS freq_bin,
       COUNT(*)::BIGINT AS n_grams,
       SUM(n)::BIGINT AS n_occurrences
FROM counts GROUP BY 1 ORDER BY 1
"""


# -------------------------------------------------------------------- q153

def q153_bpe_encode(sf_dir: str):
    """Tokenizer APPLY: encode the corpus with the q142-trained merge table
    and report per-source token economics — the "how many tokens is my
    dataset under this tokenizer" question every training budget starts
    with. The trained artifact is K tiny rows carried in the task closure;
    encoding never touches the corpus row-by-row: the corpus reduces to
    distinct (source, word) count cells in ONE word-keyed exchange, each
    cell is encoded ONCE (the same boundary-wrapped REPLACE chain as
    training — chaining works because a merged token stays '<lr>'-wrapped,
    so later rounds see the updated symbols), and per-source sums are a
    bounded driver merge. Cost is O(distinct words x sources), not
    O(corpus tokens). Returns (source, n_docs, n_words, n_tokens)."""
    import re
    from collections import Counter

    merges = [(l, r) for (_rnd, l, r, _cnt) in _bpe_train_rounds(sf_dir)]
    ds = _read(sf_dir, "documents", ["text", "source"])
    word_re = re.compile(r"[a-z]+")

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for src, t in zip(df.source, df.text):
            for w in word_re.findall((t or "").lower()):
                c[(src, w)] += 1
        if not c:
            return pd.DataFrame(
                {
                    "source": pd.Series(dtype="string"),
                    "w": pd.Series(dtype="string"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        srcs, ws = zip(*c.keys())
        return pd.DataFrame(
            {"source": list(srcs), "w": list(ws), "n": pd.array(list(c.values()), "int64")}
        )

    def encode_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "w"], as_index=False)["n"].sum()
        wrapped = "<" + g.w.map(lambda w: "><".join(w)) + ">"
        for left, right in merges:
            wrapped = wrapped.str.replace(
                f"<{left}><{right}>", f"<{left}{right}>", regex=False
            )
        t = (wrapped.str.count("><") + 1).astype("int64")
        part = pd.DataFrame(
            {"source": g.source, "n_words": g.n, "n_tokens": g.n * t}
        )
        return part.groupby("source", as_index=False).sum()

    tok = (
        partial_then_combine(ds, cell_partial, "w", encode_bucket, num_buckets=16)
        .to_pandas()
        .groupby("source", as_index=False)
        .sum()
    )
    docs = driver_combine(
        ds,
        lambda df: df.groupby("source", as_index=False).size().rename(
            columns={"size": "n_docs"}
        ),
        lambda df: df.groupby("source", as_index=False)["n_docs"].sum(),
    )
    out = docs.merge(tok, on="source", how="left").fillna(0).sort_values("source")
    for c in ("n_docs", "n_words", "n_tokens"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def _bpe_apply_chain() -> str:
    """The shared unrolled 4-round BPE train chain carrying the word w
    through every merge round, ending in relation ``tok(w, t)`` = final
    token count per distinct word (used by the q153 and q193 oracles)."""
    parts = [
        r"""WITH words AS (
  SELECT w, COUNT(*)::BIGINT AS n FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
  ) GROUP BY w
), v0 AS (
  SELECT w, array_to_string(regexp_extract_all(w, '.'), ' ') AS s, n FROM words
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
  SELECT w, replace(replace(replace(
           replace('<' || replace(s, ' ', '><') || '>',
                   (SELECT '<' || l || '><' || r || '>' FROM b{i}),
                   (SELECT '<' || l || r || '>' FROM b{i})),
           '><', ' '), '<', ''), '>', '') AS s, n
  FROM v{i-1}
)"""
        )
    parts.append(
        """, tok AS (
  SELECT w, len(string_split(s, ' '))::BIGINT AS t FROM v4
), cells AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), sw AS (
  SELECT source, w, COUNT(*)::BIGINT AS n FROM cells GROUP BY 1, 2
)"""
    )
    return "".join(parts)


def _q153_sql() -> str:
    return _bpe_apply_chain() + """
, enc AS (
  SELECT sw.source, SUM(sw.n)::BIGINT AS n_words,
         SUM(sw.n * tok.t)::BIGINT AS n_tokens
  FROM sw JOIN tok USING (w) GROUP BY 1
), d AS (
  SELECT source, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY 1
)
SELECT d.source, d.n_docs,
       COALESCE(enc.n_words, 0)::BIGINT AS n_words,
       COALESCE(enc.n_tokens, 0)::BIGINT AS n_tokens
FROM d LEFT JOIN enc USING (source) ORDER BY d.source"""


_Q153_SQL = _q153_sql()


# -------------------------------------------------------------------- q154

def q154_daily_anomaly(sf_dir: str):
    """Per event-type daily-count anomaly detection: days whose count sits
    more than 2 POPULATION sigma from that type's own mean — the alerting
    primitive on every ingestion dashboard. Exactness without floats: the
    2-sigma test is the cross-multiplied integer inequality
    (c*k - s)^2 > 4*(k*ssq - s^2) over per-type day-count cells (k days,
    sum s, sum-of-squares ssq), evaluated in Python ints on the driver
    (HUGEINT in the SQL mirror) so no overflow and no float divergence at
    any scale. The distributed part reduces the event stream to (type, day)
    counts — bounded by types x the calendar window, the q135 dense-grid
    precedent — via per-batch partials and one driver merge. Returns only
    the anomalous (event_type, day, n) rows."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {"event_type": df.event_type, "day": df.ts.dt.strftime("%Y-%m-%d")}
        )
        return d.groupby(["event_type", "day"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    cells = driver_combine(
        ds,
        partial,
        lambda df: df.groupby(["event_type", "day"], as_index=False)["n"].sum(),
    )
    keep_rows = []
    for _etype, grp in cells.groupby("event_type"):
        ns = [int(x) for x in grp.n]
        k, s, ssq = len(ns), sum(ns), sum(x * x for x in ns)
        for (_, row), c in zip(grp.iterrows(), ns):
            if (c * k - s) ** 2 > 4 * (k * ssq - s * s):
                keep_rows.append((row.event_type, row.day, c))
    keep_rows.sort()
    return pd.DataFrame(
        {
            "event_type": [r[0] for r in keep_rows],
            "day": [r[1] for r in keep_rows],
            "n": pd.array([r[2] for r in keep_rows], "int64"),
        }
    )


_Q154_SQL = """
WITH d AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, COUNT(*)::HUGEINT AS k, SUM(n)::HUGEINT AS sm,
         SUM(n::HUGEINT * n::HUGEINT)::HUGEINT AS ssq
  FROM d GROUP BY 1
)
SELECT d.event_type, d.day, d.n
FROM d JOIN s USING (event_type)
WHERE (d.n::HUGEINT * s.k - s.sm) * (d.n::HUGEINT * s.k - s.sm)
      > 4 * (s.k * s.ssq - s.sm * s.sm)
ORDER BY 1, 2
"""


# -------------------------------------------------------------------- q155

def q155_ttr_by_source(sf_dir: str):
    """Lexical diversity per source: distinct words, total words, and the
    integer type-token ratio ttr_x1e6 = 1e6*distinct//total — the cheap
    repetitiveness screen run next to q11's quality gates. Distinct-word
    cardinality is unbounded, so (source, word) cells reduce in ONE
    word-keyed exchange; a word lives wholly in its bucket, so per-bucket
    per-source distinct counts and word sums are exact partials, and the
    driver merges blocks x sources rows. Returns (source, n_distinct,
    n_tokens, ttr_x1e6)."""
    import re
    from collections import Counter

    ds = _read(sf_dir, "documents", ["text", "source"])
    word_re = re.compile(r"[a-z]+")

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for src, t in zip(df.source, df.text):
            for w in word_re.findall((t or "").lower()):
                c[(src, w)] += 1
        if not c:
            return pd.DataFrame(
                {
                    "source": pd.Series(dtype="string"),
                    "w": pd.Series(dtype="string"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        srcs, ws = zip(*c.keys())
        return pd.DataFrame(
            {"source": list(srcs), "w": list(ws), "n": pd.array(list(c.values()), "int64")}
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "w"], as_index=False)["n"].sum()
        return g.groupby("source", as_index=False).agg(
            n_distinct=("w", "size"), n_tokens=("n", "sum")
        )

    agg = (
        partial_then_combine(ds, cell_partial, "w", per_bucket, num_buckets=16)
        .to_pandas()
        .groupby("source", as_index=False)
        .sum()
        .sort_values("source")
    )
    agg["n_distinct"] = agg.n_distinct.astype("int64")
    agg["n_tokens"] = agg.n_tokens.astype("int64")
    agg["ttr_x1e6"] = (1_000_000 * agg.n_distinct // agg.n_tokens).astype("int64")
    return agg.reset_index(drop=True)


_Q155_SQL = """
WITH cells AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
)
SELECT source, COUNT(DISTINCT w)::BIGINT AS n_distinct,
       COUNT(*)::BIGINT AS n_tokens,
       (1000000 * COUNT(DISTINCT w) // COUNT(*))::BIGINT AS ttr_x1e6
FROM cells GROUP BY source ORDER BY source
"""


# -------------------------------------------------------------------- q156

def q156_clustering_coefficient(sf_dir: str):
    """Global clustering coefficient of the co-purchase graph — 3*triangles
    / wedges, the one-number density health check run next to q100. The
    triangle count, node count, exact edge count AND exact wedge count all
    come from ONE call to q100's fused plan (_triangles_from_pairs with
    want_wedges=True) over the SAME materialized pair stream — the
    expensive per-order pair expansion runs once, and on the broadcast
    path the exact degrees (q100's orientation degrees tolerate
    cross-bucket duplicate pairs, a wedge COUNT does not) are a driver-side
    numpy unique over the globally-deduped edge-key array the plan already
    holds, so the old standalone (a)-keyed degree-dedup exchange is gone
    (r5: in-suite 8.9 -> ~triangle cost). Wedges = sum d*(d-1)/2 in Python
    ints (no overflow at any degree). gcc_x1e6 = (3*tri*1e6)//wedges, 0
    when the graph has no wedges."""
    p1, nb = _copurchase_pairs(sf_dir)

    base = _triangles_from_pairs(p1, nb, want_wedges=True)
    wedges = int(base.n_wedges.iloc[0])
    tri = int(base.n_triangles.iloc[0])
    gcc = (3 * tri * 1_000_000) // wedges if wedges else 0
    return pd.DataFrame(
        {
            "n_nodes": base.n_nodes.astype("int64"),
            "n_edges": base.n_edges.astype("int64"),
            "n_wedges": pd.array([wedges], "int64"),
            "n_triangles": base.n_triangles.astype("int64"),
            "gcc_x1e6": pd.array([gcc], "int64"),
        }
    )


_Q156_SQL = """
WITH e AS (
  SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
  FROM lineitem l1
  JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
), deg AS (
  SELECT node, COUNT(*)::BIGINT AS d
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node
), w AS (SELECT SUM(d * (d - 1) // 2)::BIGINT AS nw FROM deg),
t AS (
  SELECT COUNT(*)::BIGINT AS nt FROM e x
  JOIN e y ON y.a = x.b
  JOIN e z ON z.a = x.a AND z.b = y.b
)
SELECT (SELECT COUNT(*) FROM deg)::BIGINT AS n_nodes,
       (SELECT COUNT(*) FROM e)::BIGINT AS n_edges,
       (SELECT nw FROM w) AS n_wedges,
       (SELECT nt FROM t) AS n_triangles,
       (CASE WHEN (SELECT nw FROM w) = 0 THEN 0
             ELSE (SELECT 3 * nt * 1000000 FROM t) // (SELECT nw FROM w)
        END)::BIGINT AS gcc_x1e6
"""


# -------------------------------------------------------------------- q157

def q157_global_revenue_rank(sf_dir: str):
    """Exact global ROW_NUMBER and DENSE_RANK over every part's lifetime
    revenue (rev DESC, part ASC) — q151's zipWithIndex generalized to an
    UNBOUNDED value domain: no per-value driver offset table can exist, so
    prefix offsets come from 64 equi-depth revenue RANGES instead
    (_equidepth_boundaries — O(n_bins) driver/broadcast state; equal values
    always land in the same range under one searchsorted side, so both
    window functions decompose exactly across ranges). Plan: one
    l_partkey-keyed exchange reduces lineitem to per-part revenue (integer
    rev4 units, the q29 convention, materialized once); boundary
    derivation is two bounded histogram passes; then ONE range-keyed
    exchange per phase — phase 1 emits per-range (count, n_distinct)
    summaries (<= n_bins rows to the driver, which prefix-sums them into
    row/dense offsets), phase 2 sorts each range in-bucket (rev DESC,
    part ASC) and stamps offset + local rank. Equi-depth ranges bound
    per-bucket rows at ~n_parts/64 by construction; a single hot revenue
    VALUE concentrates in one range (disclosed — rev4 units make exact
    ties rare). Returns a per-part DATASET (q47 convention)."""
    import ray as _ray

    N_BINS = 64
    line = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        units = _cents(df.l_extendedprice) * _cents(1.0 - df.l_discount)
        return (
            pd.DataFrame({"l_partkey": df.l_partkey, "rev": units})
            .groupby("l_partkey", as_index=False)["rev"]
            .sum()
        )

    rev = partial_then_combine(
        line,
        rev_partial,
        "l_partkey",
        lambda df: df.groupby("l_partkey", as_index=False)["rev"].sum(),
        num_buckets=16,
    ).materialize()

    mx = int(
        driver_combine(
            rev,
            lambda df: pd.DataFrame({"m": [int(df.rev.max()) if len(df) else 0]}),
            lambda df: pd.DataFrame({"m": [int(df.m.max()) if len(df) else 0]}),
        ).m.iloc[0]
    )
    pshift = max(0, mx.bit_length() - 14)  # prefixes <= 2^14 regardless of scale
    boundaries = _equidepth_boundaries(
        rev, lambda df: df.rev.to_numpy(), N_BINS, pshift=pshift
    )

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        rng = np.searchsorted(boundaries, df.rev.to_numpy(), side="right")
        return df.assign(rng=rng.astype("int64"))

    stamped = rev.map_batches(stamp, batch_format="pandas").materialize()

    def summary_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("rng").agg(cnt=("rev", "size"), nd=("rev", "nunique"))
        return g.reset_index().astype("int64")

    summ = (
        bucketed_combine(stamped, "rng", summary_bucket, num_buckets=N_BINS)
        .to_pandas()
        .sort_values("rng", ascending=False)  # highest revenue range first
    )
    row_off = dict(zip(summ.rng, summ.cnt.cumsum() - summ.cnt))
    dense_off = dict(zip(summ.rng, summ.nd.cumsum() - summ.nd))
    off_ref = _ray.put((row_off, dense_off))

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        row_o, dense_o = _ray.get(off_ref)
        outs = []
        for r, grp in df.groupby("rng"):
            g = grp.sort_values(["rev", "l_partkey"], ascending=[False, True])
            rv = g.rev.to_numpy()
            # desc-sorted, so first-appearance factorize codes ARE the
            # local dense ranks
            dense_local = pd.factorize(rv)[0] + 1
            outs.append(
                pd.DataFrame(
                    {
                        "l_partkey": g.l_partkey.to_numpy().astype("int64"),
                        "rev_units": rv.astype("int64"),
                        "global_row": (
                            int(row_o[r]) + np.arange(1, len(g) + 1)
                        ).astype("int64"),
                        "revenue_dense_rank": (
                            int(dense_o[r]) + dense_local
                        ).astype("int64"),
                    }
                )
            )
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                {
                    "l_partkey": pd.Series(dtype="int64"),
                    "rev_units": pd.Series(dtype="int64"),
                    "global_row": pd.Series(dtype="int64"),
                    "revenue_dense_rank": pd.Series(dtype="int64"),
                }
            )
        )

    return bucketed_combine(stamped, "rng", rank_bucket, num_buckets=N_BINS)


_Q157_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)
                * CAST(round((1.0-l_discount)*100, 0) AS BIGINT)) AS BIGINT) AS rev_units
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, rev_units,
       row_number() OVER (ORDER BY rev_units DESC, l_partkey)::BIGINT AS global_row,
       dense_rank() OVER (ORDER BY rev_units DESC)::BIGINT AS revenue_dense_rank
FROM rev ORDER BY l_partkey
"""


# -------------------------------------------------------------------- q158

def q158_semantic_dedup(sf_dir: str, t_num: int = 7, t_den: int = 20):
    """Semantic near-dup pairs with a LEARNED blocking key: q23's exact
    rational cosine test (_cos_pairs_group), blocked by the q46/q78 coarse
    quantizer (integer Lloyd's, k=8, 2 iters) instead of a given label —
    the production path when no label column exists. fit → assignment
    stamp (centroids broadcast once, stateless vectorized map that KEEPS
    the embedding) → per-cluster map_groups brute pairs (chunked int64
    matmul). Quantizer, assignment, and pair test are ALL integer, so the
    DuckDB oracle rebuilds the whole chain bit-exact (q143's rigor).
    RECALL caveat, disclosed: pairs straddling a cluster boundary are
    missed — the standard IVF-blocking tradeoff; raise nprobe-style
    multi-assignment when recall matters more than cost. Cluster
    granularity bounds the group size (k scales with corpus; q23's chunked
    kernel bounds task memory)."""
    import ray as _ray

    from medical_ocr_service_ray.stages.kmeans import assign, kmeans_fit, quantize

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    centroids = kmeans_fit(ds, k=8, iters=2)
    cref = _ray.put(centroids)

    def stamp(batch: pa.Table) -> pa.Table:
        from medical_ocr_service_ray.stages.ann import _stack_embeddings

        cents = _ray.get(cref)
        q = quantize(_stack_embeddings(batch))
        return batch.append_column("cluster", pa.array(assign(q, cents)))

    labeled = ds.map_batches(stamp, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(group: pa.Table) -> pa.Table:
        return _cos_pairs_group(group, t_num, t_den)

    out = labeled.groupby("cluster").map_groups(pairs, batch_format="pyarrow").to_pandas()
    if list(out.columns) != ["vec_a", "vec_b", "cos2_x1e6"]:
        out = pd.DataFrame(
            {
                "vec_a": pd.Series(dtype="int64"),
                "vec_b": pd.Series(dtype="int64"),
                "cos2_x1e6": pd.Series(dtype="int64"),
            }
        )
    return out


def _q158_sql(k: int = 8, iters: int = 2, dim: int = 64, scale: int = 1024,
              t_num: int = 7, t_den: int = 20) -> str:
    """Quantizer rebuild (q46's unrolled-Lloyd's chain) + final assignment
    + intra-cluster self-join with the exact rational cosine test — the
    whole learned-blocking dedup, bit-exact in SQL."""
    tn2, td2 = t_num * t_num, t_den * t_den
    return (
        _kmeans_cte_chain(k, iters, dim, scale)
        + f""", af AS (
  SELECT vec_id, cluster FROM (
    SELECT q.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(q.v, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM q, c{iters} c) WHERE rn = 1
), v1000 AS (
  SELECT e.vec_id, af.cluster,
         list_transform(e.embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vv
  FROM embeddings e JOIN af USING (vec_id)
), p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(list_inner_product(a.vv, b.vv) AS HUGEINT) AS dot,
         CAST(list_inner_product(a.vv, a.vv) AS HUGEINT) AS na2,
         CAST(list_inner_product(b.vv, b.vv) AS HUGEINT) AS nb2
  FROM v1000 a JOIN v1000 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       CAST((1000000 * dot * dot) // (na2 * nb2) AS BIGINT) AS cos2_x1e6
FROM p
WHERE dot > 0 AND na2 * nb2 > 0 AND {td2} * dot * dot >= {tn2} * na2 * nb2
"""
    )


_Q158_SQL = _q158_sql()


# -------------------------------------------------------------------- q159

def q159_semantic_dedup_multiprobe(sf_dir: str, t_num: int = 7, t_den: int = 20,
                                   nprobe: int = 2):
    """q158 with MULTI-ASSIGNMENT blocking (nprobe=2): every vector joins
    its two nearest coarse clusters, so a near-dup pair straddling one
    cluster boundary is still co-blocked somewhere — the standard IVF
    recall fix, bought with 2x block membership instead of any cross-block
    exchange. Plan: one Arrow explode stamps (cluster, vec) rows for the
    top-nprobe centroids (stable argsort == the SQL row_number tie-break:
    score, then cluster id), per-cluster chunked int64 pairs
    (_cos_pairs_group), then ONE vec_a-keyed bucketed dedup collapses the
    pairs found in BOTH shared clusters (same vectors -> bit-identical
    score rows, so drop_duplicates is exact). Post-threshold pairs are
    bounded by true near-dups (q13's argument), so the dedup exchange is
    tiny. Returns the distinct (vec_a, vec_b, cos2_x1e6) pairs."""
    import ray as _ray

    from medical_ocr_service_ray.stages.kmeans import kmeans_fit, quantize

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    centroids = kmeans_fit(ds, k=8, iters=2)
    cref = _ray.put(centroids)

    def stamp_multi(batch: pa.Table) -> pa.Table:
        from medical_ocr_service_ray.stages.ann import _stack_embeddings

        cents = _ray.get(cref)
        q = quantize(_stack_embeddings(batch))
        cc = (cents * cents).sum(axis=1)
        scores = q @ cents.T * (-2) + cc[None, :]  # int64 exact
        # stable argsort: ties resolve to the LOWER cluster id, exactly the
        # SQL window's ORDER BY score, cluster
        top = np.argsort(scores, axis=1, kind="stable")[:, :nprobe]
        n = batch.num_rows
        idx = np.repeat(np.arange(n), nprobe)
        out = batch.take(pa.array(idx))
        return out.append_column("cluster", pa.array(top.reshape(-1).astype("int64")))

    labeled = ds.map_batches(stamp_multi, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(group: pa.Table) -> pa.Table:
        return _cos_pairs_group(group, t_num, t_den)

    found = labeled.groupby("cluster").map_groups(pairs, batch_format="pyarrow")
    return bucketed_combine(
        found,
        "vec_a",
        lambda df: df.drop_duplicates(["vec_a", "vec_b"]),
        num_buckets=16,
    )


def _q159_sql(k: int = 8, iters: int = 2, dim: int = 64, scale: int = 1024,
              t_num: int = 7, t_den: int = 20, nprobe: int = 2) -> str:
    """q158's oracle with rn <= nprobe in the assignment CTE and a DISTINCT
    over the pair output."""
    tn2, td2 = t_num * t_num, t_den * t_den
    return (
        _kmeans_cte_chain(k, iters, dim, scale)
        + f""", af AS (
  SELECT vec_id, cluster FROM (
    SELECT q.vec_id, c.cluster,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(list_inner_product(c.c, c.c) AS BIGINT)
                      - 2 * CAST(list_inner_product(q.v, c.c) AS BIGINT),
                      c.cluster) AS rn
    FROM q, c{iters} c) WHERE rn <= {nprobe}
), v1000 AS (
  SELECT e.vec_id, af.cluster,
         list_transform(e.embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS vv
  FROM embeddings e JOIN af USING (vec_id)
), p AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(list_inner_product(a.vv, b.vv) AS HUGEINT) AS dot,
         CAST(list_inner_product(a.vv, a.vv) AS HUGEINT) AS na2,
         CAST(list_inner_product(b.vv, b.vv) AS HUGEINT) AS nb2
  FROM v1000 a JOIN v1000 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       CAST((1000000 * dot * dot) // (na2 * nb2) AS BIGINT) AS cos2_x1e6
FROM p
WHERE dot > 0 AND na2 * nb2 > 0 AND {td2} * dot * dot >= {tn2} * na2 * nb2
"""
    )


_Q159_SQL = _q159_sql()


# -------------------------------------------------------------------- q160

def q160_daily_token_drift(sf_dir: str):
    """Day-over-day vocabulary drift: integer Jaccard between CONSECUTIVE
    days' distinct props-token sets — the content-drift time series that
    tells an ingestion pipeline its upstream changed. Token cardinality is
    unbounded, so distinct (token, day) cells reduce in ONE token-keyed
    exchange; a token's full day-set lives in its bucket, so each bucket
    emits exact per-(day, next_day) intersection partials plus per-day
    distinct partials (days are calendar-bounded, q135's precedent), and
    the driver merges blocks x days cells: jacc_x1e6 =
    1e6*|A∩B| // |A∪B|. Returns (day, next_day, n_common, n_union,
    jacc_x1e6) for adjacent observed days."""
    import re
    from collections import Counter

    ds = _read(sf_dir, "events", ["ts", "props"])
    word_re = re.compile(r"[a-z]+")

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        seen = set()
        for day, props in zip(df.ts.dt.strftime("%Y-%m-%d"), df.props):
            for t in word_re.findall((props or "").lower()):
                seen.add((t, day))
        if not seen:
            return pd.DataFrame(
                {"token": pd.Series(dtype="string"), "day": pd.Series(dtype="string")}
            )
        toks, days = zip(*seen)
        return pd.DataFrame({"token": list(toks), "day": list(days)})

    def drift_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["token", "day"])
        per_day = d.groupby("day").size().rename("n").reset_index()
        per_day["next_day"] = ""
        per_day["kind"] = np.int8(0)
        # adjacent-day co-presence: sort each token's days, pair consecutive
        # CALENDAR days (day + 1) only
        d = d.sort_values(["token", "day"])
        same_tok = d.token.to_numpy()[1:] == d.token.to_numpy()[:-1]
        day_np = d.day.to_numpy()
        prev_d = pd.to_datetime(day_np[:-1])
        next_d = pd.to_datetime(day_np[1:])
        adj = same_tok & ((next_d - prev_d) == pd.Timedelta(days=1))
        inter = pd.DataFrame(
            {"day": day_np[:-1][adj], "next_day": day_np[1:][adj]}
        )
        inter = inter.groupby(["day", "next_day"]).size().rename("n").reset_index()
        inter["kind"] = np.int8(1)
        return pd.concat([per_day, inter], ignore_index=True)

    cells = partial_then_combine(
        ds, cell_partial, "token", drift_bucket, num_buckets=16
    ).to_pandas()
    per_day = (
        cells[cells.kind == 0].groupby("day")["n"].sum().astype("int64").to_dict()
    )
    inter = (
        cells[cells.kind == 1]
        .groupby(["day", "next_day"], as_index=False)["n"]
        .sum()
    )
    days_sorted = sorted(per_day)
    rows = []
    imap = {(r.day, r.next_day): int(r.n) for r in inter.itertuples()}
    for a, b in zip(days_sorted[:-1], days_sorted[1:]):
        if (pd.Timestamp(b) - pd.Timestamp(a)) != pd.Timedelta(days=1):
            continue
        ni = imap.get((a, b), 0)
        nu = per_day[a] + per_day[b] - ni
        rows.append((a, b, ni, nu, (1_000_000 * ni) // nu if nu else 1_000_000))
    return pd.DataFrame(
        {
            "day": [r[0] for r in rows],
            "next_day": [r[1] for r in rows],
            "n_common": pd.array([r[2] for r in rows], "int64"),
            "n_union": pd.array([r[3] for r in rows], "int64"),
            "jacc_x1e6": pd.array([r[4] for r in rows], "int64"),
        }
    )


_Q160_SQL = """
WITH cells AS (
  SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day,
         unnest(regexp_extract_all(lower(props), '[a-z]+')) AS token
  FROM events
), days AS (
  SELECT day, COUNT(*)::BIGINT AS n FROM cells GROUP BY day
), pairs AS (
  SELECT a.day, b.day AS next_day, COUNT(*)::BIGINT AS n_common
  FROM cells a JOIN cells b
    ON a.token = b.token
   AND CAST(b.day AS DATE) = CAST(a.day AS DATE) + INTERVAL 1 DAY
  GROUP BY 1, 2
), adj AS (
  SELECT da.day, db.day AS next_day, da.n AS na, db.n AS nb
  FROM days da JOIN days db
    ON CAST(db.day AS DATE) = CAST(da.day AS DATE) + INTERVAL 1 DAY
)
SELECT adj.day, adj.next_day,
       COALESCE(p.n_common, 0)::BIGINT AS n_common,
       (adj.na + adj.nb - COALESCE(p.n_common, 0))::BIGINT AS n_union,
       (1000000 * COALESCE(p.n_common, 0)
        // (adj.na + adj.nb - COALESCE(p.n_common, 0)))::BIGINT AS jacc_x1e6
FROM adj LEFT JOIN pairs p USING (day, next_day)
ORDER BY adj.day
"""


# -------------------------------------------------------------------- q161

def q161_emd_value_drift(sf_dir: str):
    """Earth-mover's distance between the purchase-value distributions of
    the reference period (first SPLIT_DAY days) and the rest — the
    distribution-shift metric that catches drift PSI bins (q140) smooth
    over, exact in integers: EMD over the q140-style equi-depth bins is
    sum |cumsum(ref_share) - cumsum(cur_share)| per boundary, computed on
    counts cross-multiplied to avoid division (x1e6 over n_ref*n_cur
    common denominator). Boundary derivation + one counting pass, both
    bounded (O(n_bins) state; (bin x period) count cells to the driver) —
    the q140 plan with a different driver-side final. Returns one row
    (n_ref, n_cur, emd_x1e6)."""
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
        pshift=8,
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = np.searchsorted(boundaries, cents_of(df), side="right").astype("int64")
        is_ref = (_day_index(df.ts) < SPLIT_DAY).astype("int64")
        return (
            pd.DataFrame({"bin": b, "p_ref": is_ref, "p_cur": 1 - is_ref})
            .groupby("bin", as_index=False)
            .sum()
        )

    cells = driver_combine(
        ds, count_partial, lambda df: df.groupby("bin", as_index=False).sum()
    ).sort_values("bin")
    n_ref = int(cells.p_ref.sum())
    n_cur = int(cells.p_cur.sum())
    # |cum_ref/n_ref - cum_cur/n_cur| summed, common denominator n_ref*n_cur
    cr = ck = 0
    num = 0
    for _, row in cells.iterrows():
        cr += int(row.p_ref)
        ck += int(row.p_cur)
        num += abs(cr * n_cur - ck * n_ref)
    den = n_ref * n_cur
    emd = (1_000_000 * num) // den if den else 0
    return pd.DataFrame(
        {
            "n_ref": pd.array([n_ref], "int64"),
            "n_cur": pd.array([n_cur], "int64"),
            "emd_x1e6": pd.array([emd], "int64"),
        }
    )


# boundary CTE mirrors q140's oracle (same helper, same counts); the EMD
# final is the cumulative-share L1 with HUGEINT cross-multiplication.
_Q161_SQL = """
WITH f AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01') / 86400000000.0)
              AS BIGINT) < 15 AS is_ref
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
), cells AS (
  SELECT (SELECT COUNT(*) FROM b WHERE b.bval <= f.cents) AS bin,
         SUM(CASE WHEN is_ref THEN 1 ELSE 0 END)::HUGEINT AS p_ref,
         SUM(CASE WHEN is_ref THEN 0 ELSE 1 END)::HUGEINT AS p_cur
  FROM f GROUP BY 1
), tot AS (
  SELECT SUM(p_ref)::HUGEINT AS n_ref, SUM(p_cur)::HUGEINT AS n_cur FROM cells
), cums AS (
  SELECT SUM(p_ref) OVER (ORDER BY bin)::HUGEINT AS cr,
         SUM(p_cur) OVER (ORDER BY bin)::HUGEINT AS ck
  FROM cells
)
SELECT tot.n_ref::BIGINT AS n_ref, tot.n_cur::BIGINT AS n_cur,
       ((1000000 * (SELECT SUM(abs(cr * tot.n_cur - ck * tot.n_ref)) FROM cums))
        // (tot.n_ref * tot.n_cur))::BIGINT AS emd_x1e6
FROM tot
"""


# -------------------------------------------------------------------- q162

def _embedding_gram_cells(sf_dir: str) -> pd.DataFrame:
    """Shared sufficient-statistics pass for q162/q196: per-batch upper-
    triangular V^T·V + per-dim sums (one 64x64 int64 matmul per block),
    driver-combined to one row per (dim_i<=dim_j) with summed n / gram /
    sxi / sxj. ZERO exchanges; driver state is blocks x 2080 cells."""
    from medical_ocr_service_ray.stages.ann import _stack_embeddings
    from medical_ocr_service_ray.stages.kmeans import quantize

    ds = _emb_dataset(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        v = quantize(_stack_embeddings(batch))
        d = v.shape[1]
        gram = v.T @ v  # (d, d) int64, exact
        s = v.sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "dim_i": pa.array(iu + 1, pa.int64()),
                "dim_j": pa.array(ju + 1, pa.int64()),
                "n": pa.array(np.full(iu.size, v.shape[0]), pa.int64()),
                "gram": pa.array(gram[iu, ju], pa.int64()),
                "sxi": pa.array(s[iu], pa.int64()),
                "sxj": pa.array(s[ju], pa.int64()),
            }
        )

    cells = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return cells.groupby(["dim_i", "dim_j"], as_index=False).sum()


def q162_embedding_covariance(sf_dir: str):
    """Exact integer covariance (Gram) matrix of the embedding column — the
    sufficient-statistics pass PCA / whitening starts from, q145 lifted
    from per-dimension to per-PAIR: each batch contributes its upper-
    triangular V^T·V (one 64x64 int64 matmul, vectorized) plus per-dim
    sums, the driver combines blocks x 2080 cells, ZERO exchanges. cov_num
    = n*gram - s_i*s_j on the combined totals (int64 safe while
    n * dim-scaled gram < 2^63, ~1e8 rows at scale 1024 — promote to the
    SQL twin's HUGEINT beyond). Quantization = stages/kmeans.quantize, so
    the oracle is bit-exact. Returns (dim_i, dim_j, n, gram, cov_num) for
    i <= j."""
    g = _embedding_gram_cells(sf_dir)
    return pd.DataFrame(
        {
            "dim_i": g.dim_i.astype("int64"),
            "dim_j": g.dim_j.astype("int64"),
            "n": g.n.astype("int64"),
            "gram": g.gram.astype("int64"),
            "cov_num": (g.n * g.gram - g.sxi * g.sxj).astype("int64"),
        }
    ).sort_values(["dim_i", "dim_j"]).reset_index(drop=True)


_Q162_SQL = """
WITH q AS (
  SELECT list_transform(embedding,
                        x -> CAST(floor(x * 1024 + 0.5) AS BIGINT)) AS v
  FROM embeddings
), cells AS (
  SELECT i.i AS dim_i, j.j AS dim_j,
         q.v[i.i] AS xi, q.v[j.j] AS xj
  FROM q,
       UNNEST(generate_series(1, 64)) AS i(i),
       UNNEST(generate_series(1, 64)) AS j(j)
  WHERE j.j >= i.i
)
SELECT dim_i, dim_j, COUNT(*)::BIGINT AS n,
       SUM(xi * xj)::BIGINT AS gram,
       (COUNT(*) * SUM(xi * xj) - SUM(xi) * SUM(xj))::BIGINT AS cov_num
FROM cells GROUP BY dim_i, dim_j
ORDER BY dim_i, dim_j
"""


# -------------------------------------------------------------------- q163

def q163_label_propagation(sf_dir: str):
    """Community detection by SYNCHRONOUS label propagation (3 rounds) over
    the co-purchase graph (q81's capped edge set, both directions) — the
    clustering complement to PageRank/CC on the same TASK MESH
    (stages/pagerank.py:label_propagation_mesh): adjacency CSR-partitioned
    once, each round is num_buckets raw tasks exchanging pre-reduced
    (dst, label, count) cells. Majority vote, ties -> lowest label,
    strictly synchronous — so the unrolled 3-round SQL CTE chain rebuilds
    every round bit-for-bit. Returns (partkey, community) per graph node
    as a Dataset."""
    from medical_ocr_service_ray.stages.pagerank import label_propagation_mesh

    edge_partials = _copurchase_edge_partials(sf_dir, "q163")
    com = label_propagation_mesh(edge_partials, rounds=3, num_buckets=16)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={"node": "partkey"})
        out["community"] = out.community.astype("int64")
        return out[["partkey", "community"]]

    return com.map_batches(finish, batch_format="pandas")


def _q163_sql(rounds: int = 3) -> str:
    """q81's capped edge CTE + unrolled synchronous majority rounds: every
    round, node label = argmax neighbor-label count (ties -> lowest label)
    over the PREVIOUS round's labels."""
    parts = [
        """WITH ok AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING COUNT(*) <= 1000
), e AS (
  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
  WHERE l1.l_orderkey IN (SELECT l_orderkey FROM ok)
), l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""", r{i} AS (
  SELECT e.dst AS node, l.lab, COUNT(*)::BIGINT AS c
  FROM e JOIN l{i - 1} l ON l.node = e.src GROUP BY 1, 2
), l{i} AS (
  SELECT node, lab FROM (
    SELECT node, lab,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
    FROM r{i}) WHERE rn = 1
)"""
        )
    parts.append(
        f"""
SELECT node AS partkey, lab::BIGINT AS community FROM l{rounds} ORDER BY node"""
    )
    return "".join(parts)


_Q163_SQL = _q163_sql()


# -------------------------------------------------------------------- q164

def q164_random_walks(sf_dir: str):
    """Fixed-length (3-step) deterministic random walks from every node of
    the co-purchase graph — the corpus-prep step of node2vec/DeepWalk
    graph embeddings, made hash-deterministic
    (stages/pagerank.py:random_walks_mesh) so the unrolled SQL chain
    replays every step: next = neighbors-sorted-by-dst[(cur*48271 +
    step*12345) % (2^31-1) % deg]. Adjacency partitioned once; each step
    is num_buckets raw tasks re-routing (start, cur) walker pairs — walker
    traffic is O(nodes) per step, never O(edges). Returns
    (start_node, end_node)."""
    from medical_ocr_service_ray.stages.pagerank import random_walks_mesh

    edge_partials = _copurchase_edge_partials(sf_dir, "q164")
    return random_walks_mesh(edge_partials, length=3, num_buckets=16)


def _q164_sql(length: int = 3) -> str:
    parts = [
        """WITH ok AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING COUNT(*) <= 1000
), e AS (
  SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
  FROM lineitem l1 JOIN lineitem l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
  WHERE l1.l_orderkey IN (SELECT l_orderkey FROM ok)
), adj AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
         COUNT(*) OVER (PARTITION BY src) AS d
  FROM e
), w0 AS (SELECT DISTINCT src AS start, src AS cur FROM e)"""
    ]
    for i in range(1, length + 1):
        parts.append(
            f""", w{i} AS (
  SELECT w.start, a.dst AS cur
  FROM w{i - 1} w JOIN adj a
    ON a.src = w.cur
   AND a.idx = (((w.cur % 2147483647) * 48271 + {i} * 12345) % 2147483647) % a.d
)"""
        )
    parts.append(
        f"""
SELECT start AS start_node, cur AS end_node FROM w{length} ORDER BY start"""
    )
    return "".join(parts)


_Q164_SQL = _q164_sql()


# -------------------------------------------------------------------- q165

def q165_chi2_contingency(sf_dir: str):
    """Association test between event_type and value QUARTILE — the
    data-quality screen for "is this feature independent of the label".
    Exact integers end to end: quartile boundaries via the shared
    equi-depth machinery (O(n_bins) state), then ONE bounded contingency
    pass (types x 4 cells to the driver, q135's precedent). The statistic
    is the per-cell floored chi-square term chi2_x1e6 =
    Σ 1e6·(n·O − R·C)² // (n·R·C) — floors are applied PER CELL in both
    shapes, so the SQL mirror is bit-exact (sum-of-floors is the defined
    metric, disclosed). Returns one row per event_type with its cell-sum
    plus the global statistic repeated (bounded rows)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def cents_of(df: pd.DataFrame) -> np.ndarray:
        return _cents(df.value).to_numpy()

    boundaries = _equidepth_boundaries(ds, cents_of, 4, pshift=8)

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        b = np.searchsorted(boundaries, cents_of(df), side="right").astype("int64")
        return (
            pd.DataFrame({"event_type": df.event_type, "bin": b})
            .groupby(["event_type", "bin"], as_index=False)
            .size()
            .rename(columns={"size": "o"})
        )

    cells = driver_combine(
        ds,
        cell_partial,
        lambda df: df.groupby(["event_type", "bin"], as_index=False)["o"].sum(),
    )
    n = int(cells.o.sum())
    rsum = cells.groupby("event_type")["o"].sum().to_dict()
    csum = cells.groupby("bin")["o"].sum().to_dict()
    per_type: dict[str, int] = {}
    for _, row in cells.iterrows():
        r, c, o = int(rsum[row.event_type]), int(csum[row.bin]), int(row.o)
        term = (1_000_000 * (n * o - r * c) ** 2) // (n * r * c)
        per_type[row.event_type] = per_type.get(row.event_type, 0) + term
    total = sum(per_type.values())
    types = sorted(per_type)
    return pd.DataFrame(
        {
            "event_type": types,
            "chi2_part_x1e6": pd.array([per_type[t] for t in types], "int64"),
            "chi2_total_x1e6": pd.array([total] * len(types), "int64"),
        }
    )


_Q165_SQL = """
WITH f AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), h AS (
  SELECT cents, COUNT(*)::BIGINT AS c FROM f GROUP BY 1
), cum AS (SELECT cents, SUM(c) OVER (ORDER BY cents) AS cum FROM h),
n0 AS (SELECT SUM(c) AS n FROM h),
t AS (
  SELECT r, (r * (SELECT n FROM n0) + 3) // 4 + 1 AS thresh
  FROM (SELECT CAST(range AS BIGINT) AS r FROM range(1, 4))
  WHERE (r * (SELECT n FROM n0) + 3) // 4 + 1 <= (SELECT n FROM n0)
), b AS (
  SELECT t.r, MIN(cum.cents) AS bval FROM cum, t WHERE cum.cum >= t.thresh GROUP BY t.r
), cells AS (
  SELECT event_type,
         (SELECT COUNT(*) FROM b WHERE b.bval <= f.cents) AS bin,
         COUNT(*)::HUGEINT AS o
  FROM f GROUP BY 1, 2
), tot AS (SELECT SUM(o)::HUGEINT AS n FROM cells),
rs AS (SELECT event_type, SUM(o)::HUGEINT AS r FROM cells GROUP BY 1),
cs AS (SELECT bin, SUM(o)::HUGEINT AS c FROM cells GROUP BY 1),
terms AS (
  SELECT cells.event_type,
         (1000000 * (tot.n * cells.o - rs.r * cs.c) * (tot.n * cells.o - rs.r * cs.c)
          // (tot.n * rs.r * cs.c)) AS term
  FROM cells JOIN rs USING (event_type) JOIN cs USING (bin) CROSS JOIN tot
), per_t AS (
  SELECT event_type, SUM(term)::BIGINT AS chi2_part_x1e6 FROM terms GROUP BY 1
)
SELECT event_type, chi2_part_x1e6,
       (SELECT SUM(chi2_part_x1e6) FROM per_t)::BIGINT AS chi2_total_x1e6
FROM per_t ORDER BY event_type
"""


# -------------------------------------------------------------------- q166

def q166_markov_backtest(sf_dir: str):
    """Train/serve split for a first-order next-event model: transition
    counts learned on the first 15 days (consecutive same-user event
    pairs, both in-train), prediction = argmax next (ties -> lexicographic),
    accuracy measured on the eval period's pairs (both in-eval; boundary
    straddlers dropped in both shapes) — the backtest-shaped pipeline every
    behavioral model ships with. ONE user-keyed exchange: in-bucket each
    user's events sort by (ts, event_id), consecutive pairs tag their
    period, and (prev, next, is_train) COUNT partials are bounded by
    types^2 x 2 — the driver fits the tiny model and scores the tiny eval
    matrix. Returns per prev-type (prev_type, predicted, n_eval, n_hits,
    acc_x1e6)."""
    from medical_ocr_service_ray.stages.aggregate import (
        compute_num_buckets,
        dataset_input_bytes,
    )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    nb = compute_num_buckets(dataset_input_bytes(ds))
    SPLIT_DAY = 15

    def pair_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "ts", "event_id"])
        same = d.user_id.to_numpy()[1:] == d.user_id.to_numpy()[:-1]
        day = _day_index(d.ts)
        tr = (day[:-1] < SPLIT_DAY) & (day[1:] < SPLIT_DAY) & same
        ev = (day[:-1] >= SPLIT_DAY) & (day[1:] >= SPLIT_DAY) & same
        et = d.event_type.to_numpy()
        out = pd.DataFrame(
            {
                "prev": np.concatenate([et[:-1][tr], et[:-1][ev]]),
                "nxt": np.concatenate([et[1:][tr], et[1:][ev]]),
                "is_train": np.concatenate(
                    [np.ones(int(tr.sum()), "int64"), np.zeros(int(ev.sum()), "int64")]
                ),
            }
        )
        return out.groupby(["prev", "nxt", "is_train"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    cells = (
        bucketed_combine(ds, "user_id", pair_bucket, num_buckets=nb)
        .to_pandas()
        .groupby(["prev", "nxt", "is_train"], as_index=False)["n"]
        .sum()
    )
    train = cells[cells.is_train == 1].sort_values(
        ["prev", "n", "nxt"], ascending=[True, False, True]
    )
    w = train.drop_duplicates("prev")
    pred = dict(zip(w.prev, w.nxt))
    ev = cells[cells.is_train == 0]
    rows = []
    for prev, grp in ev.groupby("prev"):
        if prev not in pred:
            continue  # unseen in training: no prediction to score (SQL inner join)
        n_eval = int(grp.n.sum())
        n_hits = int(grp[grp.nxt == pred[prev]].n.sum())
        rows.append((prev, pred[prev], n_eval, n_hits, (1_000_000 * n_hits) // n_eval))
    rows.sort()
    return pd.DataFrame(
        {
            "prev_type": [r[0] for r in rows],
            "predicted": [r[1] for r in rows],
            "n_eval": pd.array([r[2] for r in rows], "int64"),
            "n_hits": pd.array([r[3] for r in rows], "int64"),
            "acc_x1e6": pd.array([r[4] for r in rows], "int64"),
        }
    )


_Q166_SQL = """
WITH seq AS (
  SELECT event_type AS prev,
         lead(event_type) OVER w AS nxt,
         lead(user_id) OVER w AS next_user,
         user_id,
         CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01') / 86400000000.0)
              AS BIGINT) AS day,
         lead(CAST(floor(epoch_us(ts - TIMESTAMP '2024-01-01') / 86400000000.0)
              AS BIGINT)) OVER w AS next_day
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), pairs AS (
  SELECT prev, nxt,
         CASE WHEN day < 15 AND next_day < 15 THEN 1
              WHEN day >= 15 AND next_day >= 15 THEN 0 END AS is_train
  FROM seq WHERE nxt IS NOT NULL AND next_user = user_id
), cells AS (
  SELECT prev, nxt, is_train, COUNT(*)::BIGINT AS n
  FROM pairs WHERE is_train IS NOT NULL GROUP BY 1, 2, 3
), model AS (
  SELECT prev, nxt AS predicted FROM (
    SELECT prev, nxt,
           row_number() OVER (PARTITION BY prev ORDER BY n DESC, nxt) AS rn
    FROM cells WHERE is_train = 1) WHERE rn = 1
), ev AS (
  SELECT prev, SUM(n)::BIGINT AS n_eval,
         SUM(CASE WHEN nxt = m.predicted THEN n ELSE 0 END)::BIGINT AS n_hits
  FROM cells JOIN model m USING (prev)
  WHERE is_train = 0 GROUP BY prev, m.predicted
)
SELECT ev.prev AS prev_type, m.predicted, ev.n_eval, ev.n_hits,
       (1000000 * ev.n_hits // ev.n_eval)::BIGINT AS acc_x1e6
FROM ev JOIN model m ON m.prev = ev.prev
ORDER BY prev_type
"""


# -------------------------------------------------------------------- q167

def q167_interval_overlap_join(sf_dir: str):
    """Interval-OVERLAP join (range x range) — the join type q61 (point in
    range) and q62 (band) don't cover: per user, every click interval
    [ts, ts + value MINUTES) paired with every OVERLAPPING error interval
    (a.s < b.e AND b.s < a.e, strict), reporting the overlap length —
    "did a browsing session overlap an incident window". ONE user-keyed
    exchange; in-bucket the two sides merge per user (pair work is
    Σ|A_u|·|B_u| per user — bounded by per-user activity, the q113/q124
    partitioning assumption; a pathological user would need q91-style
    salting). Integer epoch-microseconds end to end. Returns
    (user_id, click_id, error_id, overlap_us)."""
    from medical_ocr_service_ray.stages.aggregate import (
        compute_num_buckets,
        dataset_input_bytes,
    )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"])
    nb = compute_num_buckets(dataset_input_bytes(ds), per_bucket_bytes=256 << 20)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df.event_type.isin(("click", "error"))]
        s = d.ts.to_numpy().astype("datetime64[us]").astype("int64")
        # floor(x+0.5) == DuckDB round() (half-away-from-zero) for the
        # nonnegative durations here; np.rint (half-to-even) would diverge
        # at exact .5 — the x6e7 scale carries no never-near-.5 guarantee
        # (unlike the _cents scale-100 argument), so match round() exactly
        dur = np.maximum(
            np.floor(d.value.to_numpy() * 60_000_000 + 0.5).astype("int64"), 1
        )
        return pd.DataFrame(
            {
                "user_id": d.user_id.to_numpy(),
                "event_id": d.event_id.to_numpy(),
                "side": (d.event_type.to_numpy() == "error").astype("int8"),
                "s": s,
                "e": s + dur,
            }
        )

    def overlap_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df.side == 0]
        b = df[df.side == 1]
        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "click_id": pd.Series(dtype="int64"),
                "error_id": pd.Series(dtype="int64"),
                "overlap_us": pd.Series(dtype="int64"),
            }
        )
        if a.empty or b.empty:
            return empty
        m = a.merge(b, on="user_id", suffixes=("_a", "_b"))
        if m.empty:
            return empty
        keep = (m.s_a < m.e_b) & (m.s_b < m.e_a)
        m = m[keep]
        return pd.DataFrame(
            {
                "user_id": m.user_id.to_numpy().astype("int64"),
                "click_id": m.event_id_a.to_numpy().astype("int64"),
                "error_id": m.event_id_b.to_numpy().astype("int64"),
                "overlap_us": (
                    np.minimum(m.e_a.to_numpy(), m.e_b.to_numpy())
                    - np.maximum(m.s_a.to_numpy(), m.s_b.to_numpy())
                ).astype("int64"),
            }
        )

    return partial_then_combine(ds, emit, "user_id", overlap_bucket, num_buckets=nb)


_Q167_SQL = """
WITH iv AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts)::BIGINT AS s,
         epoch_us(ts)::BIGINT
           + greatest(CAST(round(value * 60000000) AS BIGINT), 1) AS e
  FROM events WHERE event_type IN ('click', 'error')
)
SELECT a.user_id, a.event_id AS click_id, b.event_id AS error_id,
       (least(a.e, b.e) - greatest(a.s, b.s))::BIGINT AS overlap_us
FROM iv a JOIN iv b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'error'
 AND a.s < b.e AND b.s < a.e
ORDER BY a.user_id, click_id, error_id
"""


# -------------------------------------------------------------------- q168

class _BandsAndShingleRows:
    """q168's fused corpus scan (ONE pass where round 4 ran two): per batch,
    shingle-hash every doc with a single vectorized Horner pass, then emit
    BOTH the q13 band-collision rows (band_id >= 0, k = band_key) AND the
    exact-truth shingle rows (band_id = -1, k = shingle hash, n_sh = the
    doc's DISTINCT shingle count) into one union-schema table, so the two
    eval sides ride one exchange keyed on k. Signatures are bit-identical
    to MinHashSignatures (same params, duplicate-invariant minima)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 7):
        from medical_ocr_service_ray.functions.hashing import minhash_params

        assert num_perm % bands == 0
        self.a, self.b = minhash_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from medical_ocr_service_ray.functions.hashing import (
            hash64_bytes,
            minhash_signature_arr,
            shingle_hashes_batch,
        )

        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        hs, offs = shingle_hashes_batch(texts, self.shingle_k)
        k_parts, band_parts, id_parts, nsh_parts = [], [], [], []
        for i in range(len(ids)):
            h = hs[offs[i] : offs[i + 1]]
            sig = minhash_signature_arr(h, self.a, self.b)
            bkeys = np.fromiter(
                (
                    hash64_bytes(
                        sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                        .astype("<u8")
                        .tobytes()
                    )
                    & 0x7FFFFFFFFFFFFFFF
                    for b in range(self.bands)
                ),
                dtype=np.int64,
                count=self.bands,
            )
            hu = np.unique(h)  # truth side is set-semantics
            k_parts.append(bkeys)
            k_parts.append(hu)
            band_parts.append(np.arange(self.bands, dtype=np.int32))
            band_parts.append(np.full(hu.size, -1, np.int32))
            id_parts.append(np.full(self.bands + hu.size, ids[i], np.int64))
            nsh_parts.append(np.zeros(self.bands, np.int64))
            nsh_parts.append(np.full(hu.size, hu.size, np.int64))
        if not k_parts:
            k_parts = [np.empty(0, np.int64)]
            band_parts = [np.empty(0, np.int32)]
            id_parts = [np.empty(0, np.int64)]
            nsh_parts = [np.empty(0, np.int64)]
        return pa.table(
            {
                "k": pa.array(np.concatenate(k_parts), pa.int64()),
                "band_id": pa.array(np.concatenate(band_parts), pa.int32()),
                "doc_id": pa.array(np.concatenate(id_parts), pa.int64()),
                "n_sh": pa.array(np.concatenate(nsh_parts), pa.int64()),
            }
        )


def q168_lsh_recall_eval(sf_dir: str, threshold_x1000: int = 500, df_cap: int = 128):
    """Banding QUALITY eval for the MinHash LSH index (q143's recall-harness
    idea applied to dedup): ground truth = EXACT word-3-gram Jaccard >=
    threshold over all pairs (hot-shingle DF cap mirrored from q15's plan —
    exact per bucket because a shingle's rows co-locate), candidates = the
    band-collision pairs exactly as q13's index emits them (pre-verify).
    Reports n_true / n_candidates / n_hits plus integer recall
    (hits/true — banding misses) and hit-rate (hits/candidates — the
    verify stage's workload efficiency). Round-5 plan: ONE fused corpus
    scan emits band rows and truth-shingle rows together
    (_BandsAndShingleRows — the corpus is shingled once, vectorized, where
    r4 shingled it twice with a per-doc Python loop), then TWO keyed
    exchanges total (down from four): k-keyed (band keys and shingle
    hashes share the column; candidate pair groups stay exactly
    (band_id, band_key) in-bucket, shingle df_cap stays exact because a
    shingle's rows co-locate) emitting tagged pair partials, then a
    doc_a-keyed meet that sums truth intersections, thresholds, and
    counts; the driver sees per-bucket counters. Jaccard counts hashed
    shingles on the Ray side vs distinct strings in SQL — q13's
    documented collisions-aside equivalence."""
    from medical_ocr_service_ray.stages.aggregate import (
        compute_num_buckets,
        dataset_input_bytes,
        pool_width,
    )
    from medical_ocr_service_ray.stages.dedup import _pairs_from_groups

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = compute_num_buckets(dataset_input_bytes(docs))

    rows = docs.map_batches(
        _BandsAndShingleRows,
        fn_constructor_kwargs={"num_perm": 64, "bands": 16, "shingle_k": 3},
        batch_format="pyarrow",
        concurrency=(1, pool_width()),
    )

    _PAIR_SCHEMA = {
        "doc_a": "int64",
        "doc_b": "int64",
        "na": "int64",
        "nb": "int64",
        "i": "int64",
        "which": "int8",
    }

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _PAIR_SCHEMA.items()})

    def pairs_stage(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        cand = df[df.band_id >= 0]
        if len(cand):
            cp = _pairs_from_groups(cand, ["band_id", "k"])
            if len(cp):
                cp = cp.assign(
                    na=np.int64(0), nb=np.int64(0), i=np.int64(0), which=np.int8(0)
                )
                out.append(cp)
        tr = df[df.band_id < 0]
        if len(tr):
            tr = tr[tr.groupby("k")["doc_id"].transform("size") <= df_cap]
            m = tr.merge(tr, on="k")
            m = m[m.doc_id_x < m.doc_id_y]
            if len(m):
                g = m.groupby(
                    ["doc_id_x", "doc_id_y", "n_sh_x", "n_sh_y"], as_index=False
                ).size()
                out.append(
                    pd.DataFrame(
                        {
                            "doc_a": g.doc_id_x.astype("int64"),
                            "doc_b": g.doc_id_y.astype("int64"),
                            "na": g.n_sh_x.astype("int64"),
                            "nb": g.n_sh_y.astype("int64"),
                            "i": g["size"].astype("int64"),
                            "which": np.int8(1),
                        }
                    )
                )
        return pd.concat(out, ignore_index=True) if out else _empty_pairs()

    tagged = bucketed_combine(rows, "k", pairs_stage, num_buckets=nb)

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        # map_groups empty partitions emit zero-column blocks (29a68f9)
        return df if "doc_a" in df.columns else _empty_pairs()

    def counters(df: pd.DataFrame) -> pd.DataFrame:
        tr = df[df.which == 1]
        g = tr.groupby(["doc_a", "doc_b", "na", "nb"], as_index=False)["i"].sum()
        j = (1000 * g.i) // (g.na + g.nb - g.i) if len(g) else g.i
        t = set(zip(g.doc_a[j >= threshold_x1000], g.doc_b[j >= threshold_x1000]))
        cd = df[df.which == 0]
        c = set(zip(cd.doc_a, cd.doc_b))
        return pd.DataFrame(
            {
                "n_true": pd.array([len(t)], "int64"),
                "n_candidates": pd.array([len(c)], "int64"),
                "n_hits": pd.array([len(t & c)], "int64"),
            }
        )

    cells = bucketed_combine(
        tagged.map_batches(normalize, batch_format="pandas"),
        "doc_a",
        counters,
        num_buckets=16,
    ).to_pandas()
    n_true = int(cells.n_true.sum())
    n_cand = int(cells.n_candidates.sum())
    n_hits = int(cells.n_hits.sum())
    return pd.DataFrame(
        {
            "n_true": pd.array([n_true], "int64"),
            "n_candidates": pd.array([n_cand], "int64"),
            "n_hits": pd.array([n_hits], "int64"),
            "recall_x1e6": pd.array(
                [(1_000_000 * n_hits) // n_true if n_true else 1_000_000], "int64"
            ),
            "hit_rate_x1e6": pd.array(
                [(1_000_000 * n_hits) // n_cand if n_cand else 1_000_000], "int64"
            ),
        }
    )


def _q168_sql(threshold_x1000: int = 500, df_cap: int = 128) -> str:
    """q13's base chain (signatures + band candidates, `cand` in scope) plus
    an exact capped all-pairs truth over the SAME shingle relation."""
    return _q13_base_sql() + f"""
, shd AS (SELECT DISTINCT doc_id, s FROM shstr),
nsh AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
shc AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM shd
  ) WHERE df <= {df_cap}
), ti AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
  FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT doc_a, doc_b FROM ti
  JOIN nsh na ON na.doc_id = ti.doc_a
  JOIN nsh nb ON nb.doc_id = ti.doc_b
  WHERE (1000 * i) // (na.n + nb.n - i) >= {threshold_x1000}
), hits AS (SELECT COUNT(*)::BIGINT AS c FROM truth JOIN cand USING (doc_a, doc_b)),
m AS (
  SELECT (SELECT COUNT(*) FROM truth)::BIGINT AS n_true,
         (SELECT COUNT(*) FROM cand)::BIGINT AS n_candidates,
         (SELECT c FROM hits) AS n_hits
)
SELECT n_true, n_candidates, n_hits,
       (CASE WHEN n_true = 0 THEN 1000000
             ELSE 1000000 * n_hits // n_true END)::BIGINT AS recall_x1e6,
       (CASE WHEN n_candidates = 0 THEN 1000000
             ELSE 1000000 * n_hits // n_candidates END)::BIGINT AS hit_rate_x1e6
FROM m
"""


_Q168_SQL = _q168_sql()


# -------------------------------------------------------------------- q169

def q169_frequent_triples(sf_dir: str, min_support: int = 2):
    """A-priori frequent 3-itemsets over distinct-item baskets — the
    iterative candidate-PRUNING pattern q71/q112's pair mining stops short
    of: level 2 mines frequent pairs (two exchanges), level 3 expands a
    triple candidate ONLY when all three sub-pairs are globally frequent
    (downward closure), so the cubic blowup never materializes. The
    frequent-pair set is the broadcast small side (its size is CONTROLLED
    by min_support — raise it at scale; a semi-join replaces the broadcast
    past the q100-style size cap, disclosed), shipped as one sorted int64
    key array probed with searchsorted. Per-order triple expansion runs
    in the order-keyed bucket (two pre-pruned self-merges); counts reduce
    in one triple-keyed exchange. Pair keys pack as (a<<32)|b — exact while
    partkey < 2^32 (~4e9 parts; widen to a two-column key beyond, the q162
    promote-note convention). Returns (part_a, part_b, part_c, support)
    for support >= min_support."""
    import ray as _ray

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def items_distinct(df: pd.DataFrame) -> pd.DataFrame:
        df = _drop_mega_baskets(df, "q169")
        return df[["l_orderkey", "l_partkey"]].drop_duplicates()

    def pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # dedup fused into the pair bucket (order-keyed => complete): a
        # separate distinct-items exchange measured as pure floor cost
        df = items_distinct(df)
        m = df.merge(df, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        return m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False).size()

    pair_counts = (
        bucketed_combine(ds, "l_orderkey", pairs_bucket, num_buckets=32)
        .to_pandas()
        .groupby(["l_partkey_x", "l_partkey_y"], as_index=False)["size"]
        .sum()
    )
    fp = pair_counts[pair_counts["size"] >= min_support]
    fp_keys = np.sort(
        (fp.l_partkey_x.to_numpy().astype("int64") << 32)
        | fp.l_partkey_y.to_numpy().astype("int64")
    )
    fp_ref = _ray.put(fp_keys)

    TRI_EMPTY = {
        "part_a": pd.Series(dtype="int64"),
        "part_b": pd.Series(dtype="int64"),
        "part_c": pd.Series(dtype="int64"),
        "n": pd.Series(dtype="int64"),
    }

    def triples_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(TRI_EMPTY)
        keys = _ray.get(fp_ref)
        df = items_distinct(df)
        m = df.merge(df, on="l_orderkey")
        m = m[m.l_partkey_x < m.l_partkey_y]
        k = (m.l_partkey_x.to_numpy().astype("int64") << 32) | m.l_partkey_y.to_numpy()
        pos = np.searchsorted(keys, k)
        pos[pos >= len(keys)] = max(len(keys) - 1, 0)
        m = m[keys[pos] == k] if len(keys) else m.iloc[:0]
        t = m.merge(m, on=["l_orderkey", "l_partkey_x"], suffixes=("", "_2"))
        t = t[t.l_partkey_y < t.l_partkey_y_2]
        kbc = (t.l_partkey_y.to_numpy().astype("int64") << 32) | t.l_partkey_y_2.to_numpy()
        pos = np.searchsorted(keys, kbc)
        pos[pos >= len(keys)] = max(len(keys) - 1, 0)
        t = t[keys[pos] == kbc] if len(keys) else t.iloc[:0]
        g = t.groupby(
            ["l_partkey_x", "l_partkey_y", "l_partkey_y_2"], as_index=False
        ).size()
        return g.rename(
            columns={
                "l_partkey_x": "part_a",
                "l_partkey_y": "part_b",
                "l_partkey_y_2": "part_c",
                "size": "n",
            }
        )

    tri_partials = bucketed_combine(ds, "l_orderkey", triples_bucket, num_buckets=32)

    def tri_final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(TRI_EMPTY)
        g = df.groupby(["part_a", "part_b", "part_c"], as_index=False)["n"].sum()
        return g[g.n >= min_support]

    out = bucketed_combine(tri_partials, "part_a", tri_final, num_buckets=16).to_pandas()
    if list(out.columns) != ["part_a", "part_b", "part_c", "n"]:
        # every partition empty -> zero-column blocks: stable typed schema
        out = pd.DataFrame(TRI_EMPTY)
    out = out.sort_values(["part_a", "part_b", "part_c"]).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.rename(columns={"n": "support"})


_Q169_SQL = """
WITH ok AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING COUNT(*) <= 1000
), it AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey IN (SELECT l_orderkey FROM ok)
), p AS (
  SELECT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
  FROM it a JOIN it b USING (l_orderkey) WHERE a.l_partkey < b.l_partkey
), pc AS (SELECT pa, pb, COUNT(*) AS cnt FROM p GROUP BY 1, 2),
fp AS (SELECT pa, pb FROM pc WHERE cnt >= 2),
pf AS (SELECT p.* FROM p JOIN fp USING (pa, pb)),
tri AS (
  SELECT x.pa, x.pb, y.pb AS pc3, COUNT(*) AS n
  FROM pf x JOIN pf y ON x.l_orderkey = y.l_orderkey AND x.pa = y.pa AND x.pb < y.pb
  JOIN fp f ON f.pa = x.pb AND f.pb = y.pb
  GROUP BY 1, 2, 3
)
SELECT pa AS part_a, pb AS part_b, pc3 AS part_c, n::BIGINT AS support
FROM tri WHERE n >= 2 ORDER BY 1, 2, 3
"""


# -------------------------------------------------------------------- q193

def q193_bpe_fertility(sf_dir: str):
    """Tokenizer fertility eval — chars-per-token under the q142-trained
    BPE, per source: the compression-ratio table that decides whether a
    tokenizer (or a data source) is token-efficient before committing a
    training budget (multilingual tokenizer papers report exactly this
    per language). fertility_ppm = 1e6 * word_chars / bpe_tokens — higher
    means each token covers more characters. Same
    O(distinct words x sources) plan as q153 (the trained merge table is
    a closure-carried artifact; the corpus reduces to (source, word)
    cells in ONE word-keyed exchange, each cell encoded once) with char
    mass riding the same cells — adding the eval costs no new exchange.
    Output: (source, n_words, n_chars, n_tokens, fertility_ppm)."""
    import re
    from collections import Counter

    merges = [(l, r) for (_rnd, l, r, _cnt) in _bpe_train_rounds(sf_dir)]
    ds = _read(sf_dir, "documents", ["text", "source"])
    word_re = re.compile(r"[a-z]+")

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for src, t in zip(df.source, df.text):
            for w in word_re.findall((t or "").lower()):
                c[(src, w)] += 1
        if not c:
            return pd.DataFrame(
                {
                    "source": pd.Series(dtype="string"),
                    "w": pd.Series(dtype="string"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        srcs, ws = zip(*c.keys())
        return pd.DataFrame(
            {"source": list(srcs), "w": list(ws),
             "n": pd.array(list(c.values()), "int64")}
        )

    def encode_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "w"], as_index=False)["n"].sum()
        wrapped = "<" + g.w.map(lambda w: "><".join(w)) + ">"
        for left, right in merges:
            wrapped = wrapped.str.replace(
                f"<{left}><{right}>", f"<{left}{right}>", regex=False
            )
        t = (wrapped.str.count("><") + 1).astype("int64")
        part = pd.DataFrame(
            {
                "source": g.source,
                "n_words": g.n,
                "n_chars": g.n * g.w.str.len().astype("int64"),
                "n_tokens": g.n * t,
            }
        )
        return part.groupby("source", as_index=False).sum()

    out = (
        partial_then_combine(ds, cell_partial, "w", encode_bucket,
                             num_buckets=16)
        .to_pandas()
        .groupby("source", as_index=False)
        .sum()
        .sort_values("source")
        .reset_index(drop=True)
    )
    out["fertility_ppm"] = (
        out.n_chars.to_numpy().astype("int64") * 1_000_000
        // out.n_tokens.to_numpy().astype("int64")
    )
    for c in ("n_words", "n_chars", "n_tokens", "fertility_ppm"):
        out[c] = out[c].astype("int64")
    out["source"] = out.source.astype(object)
    return out


def _q193_sql() -> str:
    return _bpe_apply_chain() + """
, enc AS (
  SELECT sw.source,
         SUM(sw.n)::BIGINT AS n_words,
         SUM(sw.n * length(sw.w))::BIGINT AS n_chars,
         SUM(sw.n * tok.t)::BIGINT AS n_tokens
  FROM sw JOIN tok USING (w) GROUP BY 1
)
SELECT source, n_words, n_chars, n_tokens,
       CAST(n_chars * 1000000 // n_tokens AS BIGINT) AS fertility_ppm
FROM enc ORDER BY source"""


# -------------------------------------------------------------------- q196

_Q196_ITERS = 8
_Q196_VSCALE = 1024


def q196_top_pc_power_iteration(sf_dir: str):
    """Top principal component of the embedding corpus by INTEGER power
    iteration over q162's exact covariance numerator — the whitening /
    PCA-drift primitive on top of the sufficient-statistics pass: the
    corpus is touched ONCE (the shared _embedding_gram_cells scan, zero
    exchanges); the 64x64 eigen-iteration is driver-side Python-bigint
    arithmetic (cov_num entries grow ~n^2 x scale^2 and the matvec adds
    x64x1024 — past int64 from ~20k rows, so NO numpy in the iteration;
    the SQL twin runs the same 8 rounds in HUGEINT). Deterministic: v0 =
    all-ones, each round w = A·v then renormalize to |v|_inf = 1024 with
    SIGN-SPLIT truncating division (identical on both engines regardless
    of their native // semantics). Output: (dim, v_q, ev_share_ppm) —
    the quantized eigenvector and the Rayleigh share of total variance
    v'Av / (v'v * trace(A)) in ppm (A is exactly PSD: integer centered
    Gram), the 'how much does one direction dominate' anisotropy number
    a curriculum/whitening stage reads before deciding to decorrelate."""
    g = _embedding_gram_cells(sf_dir)
    cov = (g.n * g.gram - g.sxi * g.sxj).astype("int64")
    d = int(g.dim_j.max())
    A = [[0] * d for _ in range(d)]
    for i, j, c in zip(g.dim_i, g.dim_j, cov):
        A[i - 1][j - 1] = int(c)
        A[j - 1][i - 1] = int(c)

    v = [1] * d
    for _ in range(_Q196_ITERS):
        w = [sum(A[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(max(abs(x) for x in w), 1)
        v = [
            (abs(x) * _Q196_VSCALE // mx) * (1 if x >= 0 else -1) for x in w
        ]

    num = sum(A[i][j] * v[i] * v[j] for i in range(d) for j in range(d))
    den = sum(x * x for x in v)
    trace = sum(A[i][i] for i in range(d))
    share = (num * 1_000_000) // (den * trace) if den and trace else 0
    return pd.DataFrame(
        {
            "dim": pd.array(range(1, d + 1), "int64"),
            "v_q": pd.array(v, "int64"),
            "ev_share_ppm": pd.array([share] * d, "int64"),
        }
    )


def _q196_sql() -> str:
    """q162's cells CTE -> mirrored full matrix -> 8 unrolled HUGEINT
    matvec+renormalize rounds (sign-split // so truncation matches the
    Python bigint side exactly) -> Rayleigh share in ppm. Every CTE that
    is referenced more than once (cov, a, each w_r / v_r) is marked
    MATERIALIZED: DuckDB inlines CTEs by default, and because v_r reads
    w_r twice the inlined plan re-expands the whole upstream chain
    2^rounds times — 256 parquet scans that exhaust the process fd
    table before they exhaust patience."""
    S = _Q196_VSCALE
    parts = [
        f"""WITH q AS (
  SELECT list_transform(embedding,
                        x -> CAST(floor(x * 1024 + 0.5) AS BIGINT)) AS v
  FROM embeddings
), cells AS (
  SELECT i.i AS dim_i, j.j AS dim_j, q.v[i.i] AS xi, q.v[j.j] AS xj
  FROM q,
       UNNEST(generate_series(1, 64)) AS i(i),
       UNNEST(generate_series(1, 64)) AS j(j)
  WHERE j.j >= i.i
), cov AS MATERIALIZED (
  SELECT dim_i, dim_j,
         CAST(COUNT(*) * SUM(xi * xj) - SUM(xi) * SUM(xj) AS HUGEINT) AS a
  FROM cells GROUP BY dim_i, dim_j
), a AS MATERIALIZED (
  SELECT dim_i AS i, dim_j AS j, a FROM cov
  UNION ALL
  SELECT dim_j, dim_i, a FROM cov WHERE dim_i <> dim_j
), v0 AS (
  SELECT CAST(range AS BIGINT) AS i, CAST(1 AS HUGEINT) AS v
  FROM range(1, 65)
)"""
    ]
    for r in range(1, _Q196_ITERS + 1):
        parts.append(
            f""", w{r} AS MATERIALIZED (
  SELECT a.i, SUM(a.a * p.v) AS w FROM a JOIN v{r-1} p ON p.i = a.j
  GROUP BY a.i
), m{r} AS (SELECT GREATEST(MAX(ABS(w)), 1) AS m FROM w{r})
, v{r} AS MATERIALIZED (
  SELECT i, CASE WHEN w >= 0 THEN (w * {S}) // (SELECT m FROM m{r})
           ELSE -(((-w) * {S}) // (SELECT m FROM m{r})) END AS v
  FROM w{r}
)"""
        )
    R = _Q196_ITERS
    parts.append(
        f""", ray AS (
  SELECT SUM(a.a * vi.v * vj.v) AS num
  FROM a JOIN v{R} vi ON vi.i = a.i JOIN v{R} vj ON vj.i = a.j
), dn AS (SELECT SUM(v * v) AS den FROM v{R}),
tr AS (SELECT SUM(a) AS trace FROM cov WHERE dim_i = dim_j)
SELECT CAST(v{R}.i AS BIGINT) AS dim, CAST(v{R}.v AS BIGINT) AS v_q,
       CAST(CASE WHEN dn.den > 0 AND tr.trace > 0 THEN
              (ray.num * 1000000) // (dn.den * tr.trace) ELSE 0 END
            AS BIGINT) AS ev_share_ppm
FROM v{R}, ray, dn, tr ORDER BY dim"""
    )
    return "".join(parts)


# -------------------------------------------------------------------- q197

_Q197_BIN = 256


def q197_sequence_packing(sf_dir: str):
    """Next-fit sequence packing of the document stream into fixed
    token-budget bins (B=256) per source — the pretraining batch-packing
    op (concatenate docs into context windows in arrival order, T5/GPT-3
    style): ONE vectorized corpus scan counts whitespace tokens
    (pyarrow count of \\S+ runs — exactly q9's SQL split semantics),
    then ONE source-keyed exchange folds each source's doc stream in
    doc_id order with the O(1)-state next-fit rule (fill+t>B opens a
    new bin). The per-stream fold is inherently sequential — that IS
    the packing semantics, not a limitation: the parallelism unit is
    the source/stream and per-group state is (fill, bins), so it
    streams at any corpus size. Docs longer than B are truncated to B
    for packing (t_eff=min(t,B), disclosed); empty docs are skipped.
    Output per source: n_docs (packed), tokens_eff, bins, lb_bins
    (ceil(tokens_eff/B), the bin-count lower bound), fill_ppm (mean
    bin utilization). SQL twin: list_reduce over list(t ORDER BY
    doc_id) with state encoded as (bins-1)*2^20 + fill."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        t = pc.count_substring_regex(batch["text"], r"\S+").cast(pa.int64())
        return pa.table(
            {"doc_id": batch["doc_id"], "source": batch["source"], "t": t}
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[df.t > 0]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in df.groupby("source", sort=False):
            tv = np.minimum(
                g.sort_values("doc_id").t.to_numpy(), _Q197_BIN
            )
            fill = bins = 0
            for t in tv:
                t = int(t)
                if bins == 0 or fill + t > _Q197_BIN:
                    bins += 1
                    fill = t
                else:
                    fill += t
            tot = int(tv.sum())
            rows.append(
                (
                    src,
                    len(tv),
                    tot,
                    bins,
                    (tot + _Q197_BIN - 1) // _Q197_BIN,
                    tot * 1_000_000 // (bins * _Q197_BIN) if bins else 0,
                )
            )
        out = pd.DataFrame(
            rows,
            columns=[
                "source", "n_docs", "tokens_eff", "bins", "lb_bins", "fill_ppm",
            ],
        )
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out

    return partial_then_combine(
        ds.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True),
        partial,
        "source",
        combine,
        num_buckets=16,
    )


_Q197_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         END AS t
  FROM documents
), eff AS (
  SELECT doc_id, source, LEAST(t, {_Q197_BIN}) AS t FROM toks WHERE t > 0
), packed AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(t) AS BIGINT) AS tokens_eff,
         list_reduce(list(t ORDER BY doc_id),
                     (acc, x) -> CASE WHEN acc % 1048576 + x > {_Q197_BIN}
                                      THEN acc - (acc % 1048576) + 1048576 + x
                                      ELSE acc + x END) AS st
  FROM eff GROUP BY source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, tokens_eff,
       CAST(st // 1048576 + 1 AS BIGINT) AS bins,
       CAST((tokens_eff + {_Q197_BIN - 1}) // {_Q197_BIN} AS BIGINT) AS lb_bins,
       CAST(tokens_eff * 1000000 // ((st // 1048576 + 1) * {_Q197_BIN}) AS BIGINT)
         AS fill_ppm
FROM packed ORDER BY source
"""


# -------------------------------------------------------------------- q198

_Q198_TOPK = 20


def q198_embedding_outliers(sf_dir: str):
    """Embedding outlier audit: top-20 vectors farthest from the corpus
    centroid, exact to the integer — the pre-training sanity pass that
    catches corrupt / out-of-distribution embeddings before they poison
    ANN index training or semantic dedup. Two zero-exchange corpus
    scans: pass 1 folds per-dim (n, sum) sufficient statistics (q145's
    pattern, blocks x 64 driver cells); pass 2 broadcasts the 64-int
    centroid numerator and scores each vector with the common-
    denominator squared distance dist2_num = sum_d (n*x_d - s_d)^2
    (true squared distance x n^2 — rank-equivalent, division-free,
    bit-exact on both engines), keeping a per-block top-20 partial so
    the driver merges blocks x 20 rows, never the corpus. int64 safe
    while n^2 * (scale*|x|_max)^2 * dim < 2^63 (~5e5 rows at scale
    1024) — promote to the SQL twin's HUGEINT beyond. Ties break by
    vec_id ascending on both engines."""
    from medical_ocr_service_ray.stages.ann import _stack_embeddings
    from medical_ocr_service_ray.stages.kmeans import quantize

    ds = _emb_dataset(sf_dir)

    def stat_partial(batch: pa.Table) -> pa.Table:
        v = quantize(_stack_embeddings(batch))
        return pa.table(
            {
                "d": pa.array(np.arange(1, v.shape[1] + 1), pa.int64()),
                "n": pa.array(np.full(v.shape[1], v.shape[0]), pa.int64()),
                "s": pa.array(v.sum(axis=0), pa.int64()),
            }
        )

    cells = ds.map_batches(stat_partial, batch_format="pyarrow").to_pandas()
    g = cells.groupby("d", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))
    g = g.sort_values("d")
    n = int(g.n.iloc[0])
    s = g.s.to_numpy().astype("int64")

    def score_partial(batch: pa.Table) -> pa.Table:
        v = quantize(_stack_embeddings(batch))
        diff = n * v.astype("int64") - s
        dist = (diff * diff).sum(axis=1)
        ids = np.asarray(batch["vec_id"], dtype="int64")
        keep = np.lexsort((ids, -dist))[:_Q198_TOPK]
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], pa.int64()),
                "dist2_num": pa.array(dist[keep], pa.int64()),
            }
        )

    top = ds.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    top = (
        top.sort_values(["dist2_num", "vec_id"], ascending=[False, True])
        .head(_Q198_TOPK)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "rank": pd.array(range(1, len(top) + 1), "int64"),
            "vec_id": top.vec_id.astype("int64"),
            "n": pd.array([n] * len(top), "int64"),
            "dist2_num": top.dist2_num.astype("int64"),
        }
    )


_Q198_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(x * 1024 + 0.5) AS BIGINT)) AS v
  FROM embeddings
), stats AS MATERIALIZED (
  SELECT t.i AS d, COUNT(*) AS n, CAST(SUM(v[t.i]) AS BIGINT) AS s
  FROM q, UNNEST(generate_series(1, 64)) AS t(i)
  GROUP BY t.i
), dist AS (
  SELECT q.vec_id,
         CAST(SUM((stats.n * q.v[stats.d] - stats.s)
                * (stats.n * q.v[stats.d] - stats.s)) AS BIGINT) AS dist2_num,
         CAST(MAX(stats.n) AS BIGINT) AS n
  FROM q, stats GROUP BY q.vec_id
)
SELECT CAST(row_number() OVER (ORDER BY dist2_num DESC, vec_id) AS BIGINT) AS rank,
       vec_id, n, dist2_num
FROM dist ORDER BY dist2_num DESC, vec_id LIMIT {_Q198_TOPK}
"""


# -------------------------------------------------------------------- q199

_Q199_BATCH = 8


def q199_pad_waste_audit(sf_dir: str):
    """Padding-waste audit for length-grouped batching — q197's sibling
    for the pad-don't-pack serving/finetune path: batch each source's
    docs in groups of 8 and charge every doc the pad tokens up to its
    batch max, once in arrival (doc_id) order and once length-sorted
    (the dynamic-batching upper bound). The gap between the two is the
    token waste a length-bucketing sampler would reclaim. ONE vectorized
    token-count scan (q9 split semantics) + ONE source-keyed exchange;
    the per-group kernel is numpy reduceat over both orderings (no
    Python per-doc loop). Last partial batch pads to its own max. Output
    per source: n_docs, tokens, waste_arrival, waste_sorted, saving_ppm
    = (waste_arrival-waste_sorted)*1e6 // waste_arrival."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        t = pc.count_substring_regex(batch["text"], r"\S+").cast(pa.int64())
        return pa.table(
            {"doc_id": batch["doc_id"], "source": batch["source"], "t": t}
        )

    def _waste(tv: np.ndarray) -> int:
        starts = np.arange(0, len(tv), _Q199_BATCH)
        mx = np.maximum.reduceat(tv, starts)
        sizes = np.diff(np.append(starts, len(tv)))
        return int((mx * sizes).sum() - tv.sum())

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for src, g in df.groupby("source", sort=False):
            g = g.sort_values("doc_id")
            tv = g.t.to_numpy()
            wa = _waste(tv)
            ws = _waste(np.sort(tv, kind="stable"))
            rows.append(
                (
                    src,
                    len(tv),
                    int(tv.sum()),
                    wa,
                    ws,
                    (wa - ws) * 1_000_000 // wa if wa else 0,
                )
            )
        out = pd.DataFrame(
            rows,
            columns=[
                "source", "n_docs", "tokens",
                "waste_arrival", "waste_sorted", "saving_ppm",
            ],
        )
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out

    return partial_then_combine(
        ds.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True),
        lambda df: df,
        "source",
        combine,
        num_buckets=16,
    )


_Q199_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         END AS t
  FROM documents
), arr AS (
  SELECT source, t,
         (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)
           // {_Q199_BATCH} AS b
  FROM toks
), wa AS (
  SELECT source, CAST(SUM(mx - t) AS BIGINT) AS waste
  FROM (SELECT source, t, MAX(t) OVER (PARTITION BY source, b) AS mx FROM arr)
  GROUP BY source
), srt AS (
  SELECT source, t,
         (row_number() OVER (PARTITION BY source ORDER BY t, doc_id) - 1)
           // {_Q199_BATCH} AS b
  FROM toks
), ws AS (
  SELECT source, CAST(SUM(mx - t) AS BIGINT) AS waste
  FROM (SELECT source, t, MAX(t) OVER (PARTITION BY source, b) AS mx FROM srt)
  GROUP BY source
), base AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(t) AS BIGINT) AS tokens
  FROM toks GROUP BY source
)
SELECT base.source, CAST(n_docs AS BIGINT) AS n_docs, tokens,
       wa.waste AS waste_arrival, ws.waste AS waste_sorted,
       CAST(CASE WHEN wa.waste > 0
                 THEN (wa.waste - ws.waste) * 1000000 // wa.waste
                 ELSE 0 END AS BIGINT) AS saving_ppm
FROM base JOIN wa ON wa.source = base.source JOIN ws ON ws.source = base.source
ORDER BY base.source
"""


# -------------------------------------------------------------------- q200

def q200_label_separability(sf_dir: str):
    """Per-label centroid separability audit (Fisher / LDA-style between-
    vs-within scatter) over the embedding corpus — the label-quality
    gate a classifier-training pipeline reads before trusting its
    labels: a label whose centroid sits inside the within-class cloud
    (low fisher_ppm) is noise, not signal. ONE zero-exchange corpus
    scan emits per-(label, dim) sufficient statistics (n, sum, sumsq;
    labels x 64 cells per block, labels bounded); the driver combines
    cells and finishes in Python bigints: within_num_l = n_l*ss_l -
    |s_l|^2 (= n_l^2 x mean within-class squared deviation), between
    = ||N*s_l - n_l*S||^2 with the global (N, S) common denominator —
    the cross term exceeds int64 in the worst case, so the driver uses
    Python ints and the SQL twin HUGEINT; the exported between_q =
    between // N^2 and fisher_ppm = between * 1e6 // (N^2 * within_num)
    are back in int64. Quantization = stages/kmeans.quantize, bit-exact
    vs the oracle."""
    from medical_ocr_service_ray.stages.ann import _stack_embeddings
    from medical_ocr_service_ray.stages.kmeans import quantize

    ds = _emb_dataset(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        v = quantize(_stack_embeddings(batch))
        lab = np.asarray(batch["label"], dtype="int64")
        labels, ds_, ns, ss_, ssd = [], [], [], [], []
        for L in np.unique(lab):
            vm = v[lab == L]
            labels.append(np.full(v.shape[1], L))
            ds_.append(np.arange(1, v.shape[1] + 1))
            ns.append(np.full(v.shape[1], vm.shape[0]))
            ss_.append(vm.sum(axis=0))
            ssd.append((vm * vm).sum(axis=0))
        return pa.table(
            {
                "label": pa.array(np.concatenate(labels), pa.int64()),
                "d": pa.array(np.concatenate(ds_), pa.int64()),
                "n": pa.array(np.concatenate(ns), pa.int64()),
                "s": pa.array(np.concatenate(ss_), pa.int64()),
                "ssd": pa.array(np.concatenate(ssd), pa.int64()),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["label", "d"], as_index=False)
        .sum()
    )
    labs = sorted(cells.label.unique())
    gs = cells.groupby("d").s.sum()  # global per-dim sums
    S = [int(x) for x in gs.sort_index()]
    nt = int(cells.groupby("d").n.sum().iloc[0])
    rows = []
    for L in labs:
        g = cells[cells.label == L].sort_values("d")
        n_l = int(g.n.iloc[0])
        s_l = [int(x) for x in g.s]
        ss_l = int(g.ssd.sum())
        s2 = sum(x * x for x in s_l)
        within = n_l * ss_l - s2
        between = sum((nt * a - n_l * b) ** 2 for a, b in zip(s_l, S))
        rows.append(
            (
                int(L),
                n_l,
                within,
                between // (nt * nt),
                between * 1_000_000 // (nt * nt * within) if within > 0 else 0,
            )
        )
    out = pd.DataFrame(
        rows, columns=["label", "n", "within_num", "between_q", "fisher_ppm"]
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_Q200_SQL = """
WITH q AS (
  SELECT label,
         list_transform(embedding, x -> CAST(floor(x * 1024 + 0.5) AS BIGINT)) AS v
  FROM embeddings
), cells AS MATERIALIZED (
  SELECT label, t.i AS d, COUNT(*) AS n, CAST(SUM(v[t.i]) AS BIGINT) AS s,
         CAST(SUM(v[t.i] * v[t.i]) AS BIGINT) AS ssd
  FROM q, UNNEST(generate_series(1, 64)) AS t(i)
  GROUP BY label, t.i
), lab AS MATERIALIZED (
  SELECT label, MAX(n) AS n, SUM(ssd) AS ss, SUM(s * s) AS s2
  FROM cells GROUP BY label
), tot AS MATERIALIZED (SELECT CAST(SUM(n) AS HUGEINT) AS nt FROM lab),
gs AS MATERIALIZED (SELECT d, CAST(SUM(s) AS HUGEINT) AS sd FROM cells GROUP BY d),
betw AS (
  SELECT cells.label,
         SUM((tot.nt * cells.s - CAST(lab.n AS HUGEINT) * gs.sd)
           * (tot.nt * cells.s - CAST(lab.n AS HUGEINT) * gs.sd)) AS bn
  FROM cells JOIN gs ON gs.d = cells.d JOIN lab ON lab.label = cells.label, tot
  GROUP BY cells.label
)
SELECT CAST(lab.label AS BIGINT) AS label, CAST(lab.n AS BIGINT) AS n,
       CAST(lab.n * lab.ss - lab.s2 AS BIGINT) AS within_num,
       CAST(bn // (tot.nt * tot.nt) AS BIGINT) AS between_q,
       CAST(CASE WHEN lab.n * lab.ss - lab.s2 > 0
                 THEN bn * 1000000
                      // (tot.nt * tot.nt * CAST(lab.n * lab.ss - lab.s2 AS HUGEINT))
                 ELSE 0 END AS BIGINT) AS fisher_ppm
FROM lab JOIN betw ON betw.label = lab.label, tot ORDER BY label
"""
