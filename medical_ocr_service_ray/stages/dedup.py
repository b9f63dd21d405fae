"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Exact dedup mirrors the reference's SHA-256 + UNIQUE(archivo_hash) idempotency
(src/services/gpt-vision.service.js:22; database/schema_matching.sql:131;
SURVEY.md §2.7 D1). The near-dup operators are scale additions using standard
public algorithms (MinHash-LSH banding, SimHash hamming buckets, shingle-join
Jaccard), expressed Ray-Data-first: vectorized signature stages ->
groupby-on-bucket-key shuffles -> pairwise verification inside groups.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from medical_ocr_service_ray.functions.hashing import (
    hash64_bytes,
    minhash_params,
    minhash_signature_arr,
    sha256_hex,
    shingle_hashes_batch,
    shingles,
    simhash64,
)


# ---------------------------------------------------------------- exact dedup

def add_sha_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    return batch.append_column(
        "text_sha256", pa.array([sha256_hex(t or "") for t in texts], pa.string())
    )


def exact_dedup(ds: "rd.Dataset", id_col: str = "doc_id", text_col: str = "text") -> "rd.Dataset":
    """Hash-partition on content hash, keep min(id) per group + dup_count:
    per-batch partial (min,count per sha) BEFORE the shuffle, then a bucketed
    vectorized combine (the 100 TB partial-aggregation pattern)."""
    import pandas as pd

    from medical_ocr_service_ray.stages.aggregate import partial_then_combine

    hashed = ds.map_batches(
        lambda t: add_sha_batch(t, text_col), batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["text_sha256", id_col])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("text_sha256", as_index=False).agg(
            p_min=(id_col, "min"), p_n=(id_col, "size")
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("text_sha256", as_index=False).agg(
            **{id_col: ("p_min", "min"), "dup_count": ("p_n", "sum")}
        )
        g[id_col] = g[id_col].astype("int64")
        g["dup_count"] = g.dup_count.astype("int64")
        return g[[id_col, "dup_count"]]

    return partial_then_combine(hashed, partial, "text_sha256", combine, num_buckets=16)


# ---------------------------------------------------------------- MinHash LSH

class MinHashSignatures:
    """Actor stage: hash params built once per actor (ST1-style warm state)."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 7):
        assert num_perm % bands == 0
        self.a, self.b = minhash_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Explode each doc into one row per LSH band: (band_id, band_key, doc_id).
        Docs sharing any (band_id, band_key) are candidate near-dups.
        Shingle hashing is ONE vectorized Horner pass over the whole batch
        (shingle_hashes_batch; per-doc numpy calls were overhead-bound) —
        signatures are bit-identical to the per-doc set path because
        MinHash minima are duplicate-invariant."""
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        hs, offs = shingle_hashes_batch(texts, self.shingle_k)
        out_band, out_key, out_id = [], [], []
        for i, doc_id in enumerate(ids):
            sig = minhash_signature_arr(hs[offs[i] : offs[i + 1]], self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                out_band.append(band)
                # blake2b over the raw signature bytes: deterministic across
                # interpreter versions (hash(tuple) is not guaranteed stable)
                out_key.append(
                    hash64_bytes(chunk.astype("<u8").tobytes()) & 0x7FFFFFFFFFFFFFFF
                )
                out_id.append(doc_id)
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
            }
        )


def _pairs_from_groups(df, group_cols: list[str]):
    """All (a<b) doc pairs within each group of a bucket's DataFrame.

    Singleton groups (the vast majority: most shingles/band-keys belong to
    one doc) produce no pairs, so they are dropped with one vectorized
    ``duplicated`` mask BEFORE the Python group iteration — iterating
    millions of size-1 groups was the hot spot, not the pair loops."""
    import pandas as pd

    df = df[df.duplicated(group_cols, keep=False)]
    a_out, b_out = [], []
    for _, g in df.groupby(group_cols, sort=False):
        ids = sorted(set(g["doc_id"]))
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
    return pd.DataFrame({"doc_a": pd.array(a_out, "int64"), "doc_b": pd.array(b_out, "int64")})


def _jaccard_keep(pair_texts, shingle_k: int, threshold_x1000: int):
    """Single home of the pair-verification kernel shared by all three
    verify_pairs_jaccard tiers (broadcast / candidate-keyed / two-join):
    consumes (doc_a, doc_b, text_a, text_b) rows, memoizes shingle sets per
    doc id, keeps rows meeting the threshold. The jaccard convention —
    floor(1000*|A∩B| / |A∪B|), union==0 ⇒ 1000 — lives ONLY here so the
    tiers cannot drift (their equality is pinned by
    TestVerifyPairsFastPath)."""
    import pandas as pd

    empty = pd.DataFrame(
        {
            "doc_a": pd.Series(dtype="int64"),
            "doc_b": pd.Series(dtype="int64"),
            "jaccard_x1000": pd.Series(dtype="int64"),
        }
    )
    sh_memo: dict[int, set] = {}

    def sh_of(doc_id: int, text: str) -> set:
        s = sh_memo.get(doc_id)
        if s is None:
            s = shingles(text, shingle_k)
            sh_memo[doc_id] = s
        return s

    keep_a, keep_b, keep_j = [], [], []
    for a, b, ta, tb in pair_texts:
        sa = sh_of(a, ta)
        sb = sh_of(b, tb)
        union = len(sa | sb)
        inter = len(sa & sb)
        j_x1000 = (1000 * inter) // union if union else 1000
        if j_x1000 >= threshold_x1000:
            keep_a.append(a)
            keep_b.append(b)
            keep_j.append(j_x1000)
    if not keep_a:
        return empty
    return pd.DataFrame(
        {
            "doc_a": pd.array(keep_a, "int64"),
            "doc_b": pd.array(keep_b, "int64"),
            "jaccard_x1000": pd.array(keep_j, "int64"),
        }
    )


def verify_pairs_jaccard(
    pairs: "rd.Dataset",
    docs: "rd.Dataset",
    shingle_k: int = 3,
    threshold_x1000: int = 600,
    num_buckets: int | None = None,
    broadcast_max_ids: int = 32_000_000,
    broadcast_max_bytes: int = 256 << 20,
) -> "rd.Dataset":
    """Verify candidate (doc_a, doc_b) pairs with true shingle Jaccard.

    Fast path (the common case): the distinct candidate-id set — bounded by
    the LSH candidate pairs, NOT by the corpus — is pulled once and
    broadcast; the corpus is scanned ONCE and filtered down to pair-involved
    docs. Tier 1: when those texts also fit ``broadcast_max_bytes``, they are
    broadcast as an id->text dict and verification is a stateless map over the
    pair list — ZERO residual exchanges. Tier 2: otherwise the candidate texts
    enter two residual exchanges (endpoint-keyed text routing, then
    pair-keyed verification), both sized by the candidate set. The corpus
    itself never exchanges in either tier. When the candidate-id set exceeds
    ``broadcast_max_ids`` (256 MiB of int64 at the default — an adversarially
    dup-dense corpus), it falls back to :func:`_verify_pairs_two_join`, which
    exchanges the corpus texts instead of broadcasting anything.
    All paths return identical (doc_a, doc_b, jaccard_x1000) rows
    (>= threshold only); equality is pinned by TestVerifyPairsFastPath."""
    import ray

    import numpy as np
    import pandas as pd

    from medical_ocr_service_ray.stages.aggregate import bucketed_combine, driver_combine

    # the candidate exchange already ran; its output is small — materialize so
    # the id pull and the routing exchange don't recompute the banding lineage
    pairs = pairs.materialize()
    # raw-count guard BEFORE the driver pull: a raw count beyond 4x the
    # distinct-pair cap (broadcast_max_ids // 2) routes to the no-pull path
    # without ever materializing the distinct set on the driver; modest
    # multi-band duplication (< 4x) still reaches the exact distinct check
    if pairs.count() > 2 * broadcast_max_ids:
        return _verify_pairs_two_join(pairs, docs, shingle_k, threshold_x1000, num_buckets)
    pairs_df = driver_combine(
        pairs,
        lambda df: df[["doc_a", "doc_b"]].drop_duplicates(),
        lambda df: df.drop_duplicates().reset_index(drop=True),
    )
    if len(pairs_df) > broadcast_max_ids // 2:
        return _verify_pairs_two_join(pairs, docs, shingle_k, threshold_x1000, num_buckets)
    cand_ids = np.unique(
        np.concatenate(
            [
                pairs_df.doc_a.to_numpy(dtype="int64", na_value=-1),
                pairs_df.doc_b.to_numpy(dtype="int64", na_value=-1),
            ]
        )
        if len(pairs_df)
        else np.empty(0, np.int64)
    )
    if not cand_ids.size:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard_x1000": pa.array([], pa.int64()),
                }
            )
        )
    ids_ref = ray.put(cand_ids)

    def filt(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        keep = np.isin(t["doc_id"].to_numpy(zero_copy_only=False), ids)
        return t.filter(pa.array(keep))

    docs_f = docs.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # tier 1 (zero residual exchanges): candidate texts fit the broadcast cap
    # — ship the id->text dict once via the object store and verify as a
    # stateless map over the deduplicated pair list. 256 MiB covers ~1M
    # candidate docs of typical web-page size; beyond that, tier 2 routes
    # texts through two candidate-sized exchanges instead.
    if (docs_f.size_bytes() or 0) <= broadcast_max_bytes:
        tpd = docs_f.to_pandas()
        tmap_ref = ray.put(dict(zip(tpd.doc_id, tpd.text.fillna("").astype(str))))

        def verify_bcast(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return _jaccard_keep((), shingle_k, threshold_x1000)
            tmap = ray.get(tmap_ref)
            return _jaccard_keep(
                (
                    (int(a), int(b), tmap.get(a, ""), tmap.get(b, ""))
                    for a, b in zip(df.doc_a, df.doc_b)
                ),
                shingle_k,
                threshold_x1000,
            )

        chunks = [pairs_df] if len(pairs_df) <= 8192 else np.array_split(
            pairs_df, int(np.ceil(len(pairs_df) / 8192))
        )
        return rd.from_pandas(list(chunks)).map_batches(
            verify_bcast, batch_format="pandas"
        )

    def docs_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df.doc_id.astype("int64"),
                "tag": np.int64(0),
                "other": np.int64(-1),
                "text": df.text.fillna("").astype(str),
            }
        )

    def copy_a(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df.doc_a.astype("int64"),
                "tag": np.int64(1),
                "other": df.doc_b.astype("int64"),
                "text": "",
            }
        )

    def copy_b(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df.doc_b.astype("int64"),
                "tag": np.int64(2),
                "other": df.doc_a.astype("int64"),
                "text": "",
            }
        )

    unified = docs_f.map_batches(docs_side, batch_format="pandas").union(
        pairs.map_batches(copy_a, batch_format="pandas"),
        pairs.map_batches(copy_b, batch_format="pandas"),
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        """Attach the keyed endpoint's text to each pair copy. A pair may
        surface from several LSH bands; every copy-1 duplicate shares doc_a
        (this bucket's key) and every copy-2 duplicate shares doc_b, so one
        in-bucket drop_duplicates per tag is globally exact."""
        d = df[df.tag == 0]
        p = df[df.tag != 0].drop_duplicates(["key", "tag", "other"])
        if p.empty:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "which": pd.Series(dtype="int64"),
                    "text": pd.Series(dtype="string"),
                }
            )
        tmap = dict(zip(d.key, d.text))
        is_a = (p.tag == 1).to_numpy()
        return pd.DataFrame(
            {
                "doc_a": np.where(is_a, p.key, p.other).astype("int64"),
                "doc_b": np.where(is_a, p.other, p.key).astype("int64"),
                "which": p.tag.astype("int64").to_numpy(),
                "text": p.key.map(tmap).fillna("").astype(str),
            }
        )

    resolved = bucketed_combine(unified, "key", attach, num_buckets=16, map_batch_size=65536)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _jaccard_keep((), shingle_k, threshold_x1000)
        a_rows = df[df.which == 1]
        b_rows = df[df.which == 2]
        tb = dict(zip(zip(b_rows.doc_a, b_rows.doc_b), b_rows.text))
        return _jaccard_keep(
            (
                (int(a), int(b), text_a, tb.get((a, b), ""))
                for a, b, text_a in zip(a_rows.doc_a, a_rows.doc_b, a_rows.text)
            ),
            shingle_k,
            threshold_x1000,
        )

    # both copies of a pair share doc_a, so a doc_a-keyed bucket sees them both
    return bucketed_combine(resolved, "doc_a", verify, num_buckets=16, map_batch_size=65536)


def _verify_pairs_two_join(
    pairs: "rd.Dataset",
    docs: "rd.Dataset",
    shingle_k: int = 3,
    threshold_x1000: int = 600,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Verify candidate (doc_a, doc_b) pairs with true shingle Jaccard,
    resolving texts via TWO keyed bucket joins (the asof.py tagged-union
    pattern) — the corpus is never materialized on the driver or broadcast:

        join 1 (key = doc_a): pair rows + doc rows co-located by bucket;
                              each pair picks up text_a.
        join 2 (key = doc_b): same shuffle keyed on the other endpoint;
                              each pair picks up text_b, verifies in-group.

    At 100 TB each join moves the doc texts once (same cost class as one
    groupby over the corpus) and the pair side is small post-LSH. Returns
    (doc_a, doc_b, jaccard_x1000), only rows >= threshold."""
    import pandas as pd

    from medical_ocr_service_ray.stages.aggregate import (
        bucketed_combine,
        compute_num_buckets,
        dataset_input_bytes,
    )

    if num_buckets is None:
        # each join's per-bucket task holds ~corpus/num_buckets text bytes in
        # a dict: derive the count from the input size (sizing rule,
        # aggregate.py) instead of trusting a fixed default
        num_buckets = compute_num_buckets(dataset_input_bytes(docs))

    def docs_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df.doc_id.astype("int64"),
                "side": 0,
                "doc_a": -1,
                "text": df.text.fillna("").astype(str),
            }
        )

    def pairs_side(df: pd.DataFrame) -> pd.DataFrame:
        # key on doc_b for join 1's OUTPUT shape symmetry: join 1 keys on
        # doc_a; its output re-keys on doc_b for join 2
        return pd.DataFrame(
            {
                "key": df.doc_a.astype("int64"),
                "side": 1,
                "doc_a": df.doc_b.astype("int64"),  # carries the OTHER endpoint
                "text": "",
            }
        )

    unified1 = docs.map_batches(docs_side, batch_format="pandas").union(
        pairs.map_batches(pairs_side, batch_format="pandas")
    )

    def join_text_a(df: pd.DataFrame) -> pd.DataFrame:
        """Attach text_a to each pair; re-key the output on doc_b. Pairs are
        deduplicated here rather than in a separate upstream shuffle: this
        combine is keyed on doc_a, so every copy of a (doc_a, doc_b) pair
        (one per LSH band that surfaced it) lands in the same bucket and one
        drop_duplicates is globally exact — saving a full exchange."""
        d = df[df.side == 0]
        p = df[df.side == 1].drop_duplicates(["key", "doc_a"])
        if p.empty:
            # typed empty frame: "string" dtype keeps the Arrow schema stable
            # (an object-dtype empty column would infer as null type and break
            # the union with the docs side)
            return pd.DataFrame(
                {"key": pd.Series(dtype="int64"), "side": pd.Series(dtype="int64"),
                 "doc_a": pd.Series(dtype="int64"), "text": pd.Series(dtype="string")}
            )
        tmap = dict(zip(d.key, d.text))
        return pd.DataFrame(
            {
                "key": p.doc_a.astype("int64"),  # doc_b becomes the join-2 key
                "side": 1,
                "doc_a": p.key.astype("int64"),  # original doc_a rides along
                "text": p.key.map(tmap).fillna("").astype(str),  # text_a
            }
        )

    pairs_with_a = bucketed_combine(unified1, "key", join_text_a, num_buckets=num_buckets)

    unified2 = docs.map_batches(docs_side, batch_format="pandas").union(pairs_with_a)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df.side == 0]
        p = df[df.side == 1]
        if p.empty:
            return _jaccard_keep((), shingle_k, threshold_x1000)
        tmap = dict(zip(d.key, d.text))
        return _jaccard_keep(
            (
                (int(a), int(b), text_a, tmap.get(b, ""))
                for a, b, text_a in zip(p.doc_a, p.key, p.text)
            ),
            shingle_k,
            threshold_x1000,
        )

    return bucketed_combine(unified2, "key", verify, num_buckets=num_buckets)


def minhash_lsh_pairs(
    docs: "rd.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold_x1000: int = 600,
) -> "rd.Dataset":
    """shingle -> minhash -> band -> bucket-groupby -> candidate pairs ->
    dedupe pairs -> verify true Jaccard via keyed text joins (no driver
    materialization, no broadcast of the corpus). Returns
    (doc_a, doc_b, jaccard_x1000)."""
    from medical_ocr_service_ray.stages.aggregate import bucketed_combine, pool_width


    banded = docs.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pyarrow",
        # signature computation is the q13 family's dominant cost: size the
        # pool to the cluster (7.8 -> 3.9 s at sf0.1/32 going 8 -> 24)
        concurrency=(1, pool_width()),
    )
    candidates = bucketed_combine(
        banded, "band_key", lambda df: _pairs_from_groups(df, ["band_id", "band_key"])
    )
    # a pair can surface from several bands; the verify stage's first join is
    # keyed on doc_a and dedupes in-bucket, so candidates go in directly —
    # no separate dedupe exchange
    return verify_pairs_jaccard(
        candidates, docs, shingle_k=shingle_k, threshold_x1000=threshold_x1000
    )  # verify derives its bucket count from the docs input bytes


# ------------------------------------------------------- cluster components

def dedup_clusters(pairs_df, id_cols: tuple[str, str] = ("doc_a", "doc_b")):
    """Connected components over verified near-dup pairs -> (doc_id,
    cluster_id = min doc_id in component, cluster_size).

    Driver-side union-find: the candidate-pair graph is provably small
    relative to the corpus (pairs already passed LSH banding + Jaccard
    verification). Scale path when pairs outgrow one machine: iterate
    min-label propagation — each round, every edge sends min(label) to both
    endpoints via the bucketed combine, until a fixpoint (guide pattern);
    the per-round primitive is exactly ``stages/aggregate.bucketed_combine``.
    """
    import pandas as pd

    parent: dict = {}

    def find(x):
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-root union keeps cluster_id = min(doc_id) deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    a_col, b_col = id_cols
    for a, b in zip(pairs_df[a_col], pairs_df[b_col]):
        union(int(a), int(b))
    members: dict[int, list[int]] = {}
    for node in list(parent):
        members.setdefault(find(node), []).append(node)
    rows = []
    for root, nodes in members.items():
        for n in nodes:
            rows.append((n, root, len(nodes)))
    rows.sort()
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id", "cluster_size"]).astype("int64")


def dedup_clusters_distributed(
    pairs: "rd.Dataset", num_buckets: int = 16, max_rounds: int = 64
):
    """Distributed connected components over verified near-dup pairs via
    min-label propagation — TASK-MESH iteration (r4, the PageRank §23
    pattern): the adjacency is hash-partitioned on node ONCE (the only
    Dataset exchange) into actor-owned plasma CSR arrays; every propagation
    round is ``num_buckets`` raw tasks exchanging only CHANGED labels,
    pre-min-reduced and pre-sliced per destination bucket via
    ``num_returns`` — message volume shrinks as components converge, and
    no sort ever re-ships the edge set. The r3 plan paid one ~1.5 s Ray
    Data sort per round (19 s for a diameter-8 graph of 256 edges);
    rounds here are milliseconds. Fixpoint = a round where no bucket
    changed any label (labels are monotone non-increasing). Cluster sizes
    attach with two more task rounds (count partials to the cluster-id
    owner bucket, size map back to each requester).

    Partitioning assumption (documented): bucket_of(node) is the single
    hash shared by adjacency keys, label rows and message dsts, so each
    round's merge + forward completes in one task per bucket. Returns a
    Dataset (doc_id, cluster_id = min id in component, cluster_size),
    equal to driver-side ``dedup_clusters`` output; only pair-connected
    docs appear."""
    import numpy as np
    import pandas as pd

    import ray

    from medical_ocr_service_ray.stages.aggregate import bucket_of
    from medical_ocr_service_ray.stages.pagerank import _EdgeStash

    nb = num_buckets
    stash = _EdgeStash.remote()

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        key = pd.concat([df.doc_a, df.doc_b], ignore_index=True).astype("int64")
        val = pd.concat([df.doc_b, df.doc_a], ignore_index=True).astype("int64")
        out = pd.DataFrame({"key": key, "val": val})
        out["__bucket"] = bucket_of(out.key, nb)
        return out

    def store(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"bucket": pd.Series(dtype="int64")})
        b = int(df["__bucket"].iloc[0])
        # in-bucket dedup mirrors pagerank.csr_partition: duplicate pairs
        # (multi-band LSH candidates) would otherwise inflate every
        # propagation round's message volume
        df = df.drop_duplicates(["key", "val"])
        key = df.key.to_numpy()
        order = np.argsort(key, kind="stable")
        key, val = key[order], df.val.to_numpy()[order]
        nodes, counts = np.unique(key, return_counts=True)
        indptr = np.concatenate([[0], counts.cumsum()]).astype("int64")
        ray.get(
            stash.put.remote(
                b,
                {
                    "nodes": np.ascontiguousarray(nodes),
                    "indptr": indptr,
                    "neigh": np.ascontiguousarray(val),
                },
            )
        )
        return pd.DataFrame({"bucket": [b]})

    (
        pairs.select_columns(["doc_a", "doc_b"])
        .map_batches(stamp, batch_format="pandas", batch_size=1 << 17)
        .groupby("__bucket")
        .map_groups(store, batch_format="pandas")
        .materialize()
    )
    adj_refs = ray.get(stash.refs.remote())
    buckets = sorted(adj_refs)
    if not buckets:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "cluster_size": pa.array([], pa.int64()),
                }
            )
        )

    final_refs = _cc_mesh(adj_refs, buckets, nb, max_rounds)
    ray.wait(final_refs, num_returns=len(final_refs))
    return rd.from_arrow_refs(final_refs)


def _remote_lazy(fn):
    """Lazily wrap ``fn`` as a Ray remote function on first use (module
    stays importable without a Ray session; same policy as the local
    ``import ray`` convention elsewhere in this package)."""
    holder: dict = {}

    def get():
        if "r" not in holder:
            import ray

            holder["r"] = ray.remote(fn)
        return holder["r"]

    return get


def _slice_min_labels(dst: "np.ndarray", lab: "np.ndarray", nb: int) -> list:
    """Per-dst min labels, pre-sliced by destination bucket (nb dicts)."""
    import numpy as np
    import pandas as pd

    g = pd.DataFrame({"dst": dst, "lab": lab}).groupby("dst")["lab"].min()
    gd, gl = g.index.to_numpy(), g.to_numpy()
    # MUST equal bucket_of's int branch (floor mod) — the adjacency was
    # partitioned with bucket_of; TestMeshRoutingInvariant pins the equality
    gb = gd % nb
    return [
        {"dst": np.ascontiguousarray(gd[gb == b]), "lab": np.ascontiguousarray(gl[gb == b])}
        for b in range(nb)
    ]


@_remote_lazy
def _cc_seed(adj: dict, nb: int):
    """Round 0: every node sends its own id to all neighbors; initial
    labels = self. Returns (labels, slice_0..slice_{nb-1})."""
    import numpy as np

    counts = adj["indptr"][1:] - adj["indptr"][:-1]
    src_lab = np.repeat(adj["nodes"], counts)
    labels = {"node": adj["nodes"], "lab": adj["nodes"].copy()}
    return tuple([labels] + _slice_min_labels(adj["neigh"], src_lab, nb))


@_remote_lazy
def _cc_round(adj: dict, labels: dict, nb: int, *slices: dict):
    """Merge incoming label candidates, forward CHANGED labels to
    neighbors. Returns (labels, changed_flag, slice_0..slice_{nb-1})."""
    import numpy as np

    dst = np.concatenate([s["dst"] for s in slices])
    lab = np.concatenate([s["lab"] for s in slices])
    nodes, cur = labels["node"], labels["lab"]
    new = cur.copy()
    if len(dst):
        # incoming dsts are a subset of this bucket's nodes by construction
        idx = np.searchsorted(nodes, dst)
        np.minimum.at(new, idx, lab)
    changed = new < cur
    empty = [{"dst": np.empty(0, dtype="int64"), "lab": np.empty(0, dtype="int64")}] * nb
    if not changed.any():
        return tuple([{"node": nodes, "lab": new}, False] + empty)
    counts = adj["indptr"][1:] - adj["indptr"][:-1]
    edge_changed = np.repeat(changed, counts)
    out_dst = adj["neigh"][edge_changed]
    out_lab = np.repeat(new, counts)[edge_changed]
    return tuple(
        [{"node": nodes, "lab": new}, True] + _slice_min_labels(out_dst, out_lab, nb)
    )


@_remote_lazy
def _cc_count_partial(labels: dict, nb: int, my_bucket: int):
    """Per-cluster member counts from this bucket, sliced by the cluster
    id's OWNER bucket, each partial stamped with the requester bucket."""
    import numpy as np
    import pandas as pd

    g = pd.DataFrame({"c": labels["lab"]}).groupby("c").size()
    cid, cnt = g.index.to_numpy(), g.to_numpy().astype("int64")
    cb = cid % nb  # same bucket_of-int-branch invariant as _slice_min_labels
    return [
        {
            "c": np.ascontiguousarray(cid[cb == b]),
            "n": np.ascontiguousarray(cnt[cb == b]),
            "req": my_bucket,
        }
        for b in range(nb)
    ]


@_remote_lazy
def _cc_size_owner(nb: int, *partials: dict):
    """Owner bucket: total size per cluster, re-sliced per requester."""
    import numpy as np
    import pandas as pd

    c = np.concatenate([p["c"] for p in partials])
    n = np.concatenate([p["n"] for p in partials])
    req = np.concatenate([np.full(len(p["c"]), p["req"], dtype="int64") for p in partials])
    tot = pd.DataFrame({"c": c, "n": n}).groupby("c")["n"].sum()
    out = []
    for b in range(nb):
        m = req == b
        cb = c[m]
        out.append(
            {
                "c": np.ascontiguousarray(cb),
                "size": tot.loc[cb].to_numpy().astype("int64")
                if len(cb)
                else np.empty(0, dtype="int64"),
            }
        )
    return out


@_remote_lazy
def _cc_finalize(labels: dict, *size_slices: dict):
    """Attach cluster sizes to this bucket's label rows -> Arrow table."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    c = np.concatenate([s["c"] for s in size_slices])
    sz = np.concatenate([s["size"] for s in size_slices])
    smap = pd.Series(sz, index=c)
    smap = smap[~smap.index.duplicated()]  # owner may echo a cluster to several requesters
    sizes = smap.loc[labels["lab"]].to_numpy().astype("int64")
    return pa.table(
        {
            "doc_id": pa.array(labels["node"], pa.int64()),
            "cluster_id": pa.array(labels["lab"], pa.int64()),
            "cluster_size": pa.array(sizes, pa.int64()),
        }
    )


def _cc_mesh(adj_refs: dict, buckets: list, nb: int, max_rounds: int) -> list:
    """Drive the propagation mesh; returns per-bucket Arrow table refs."""
    import ray

    seed = {
        b: _cc_seed().options(num_returns=nb + 1).remote(adj_refs[b], nb)
        for b in buckets
    }
    labels = {b: seed[b][0] for b in buckets}
    slices = {b: seed[b][1:] for b in buckets}
    for _ in range(max_rounds):
        nxt = {
            b: _cc_round()
            .options(num_returns=nb + 2)
            .remote(adj_refs[b], labels[b], nb, *[slices[sb][b] for sb in buckets])
            for b in buckets
        }
        labels = {b: nxt[b][0] for b in buckets}
        flags = ray.get([nxt[b][1] for b in buckets])
        slices = {b: nxt[b][2:] for b in buckets}
        if not any(flags):
            break
    parts = {
        b: _cc_count_partial().options(num_returns=nb).remote(labels[b], nb, b)
        for b in buckets
    }
    size_out = {
        b: _cc_size_owner()
        .options(num_returns=nb)
        .remote(nb, *[parts[sb][b] for sb in buckets])
        for b in buckets
    }
    return [
        _cc_finalize().remote(labels[b], *[size_out[sb][b] for sb in buckets])
        for b in buckets
    ]


# ------------------------------------------------------------------- SimHash

def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    sigs = [simhash64(t or "") & 0x7FFFFFFFFFFFFFFF for t in texts]  # 63 bits -> int64-safe
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(sigs, pa.int64()),
        }
    )


def simhash_pairs(docs: "rd.Dataset", max_hamming: int = 3) -> "rd.Dataset":
    """SimHash near-dup: 4 x 16-bit bands (any exact band match => candidate,
    catches all pairs with hamming distance <= 3), verify hamming in-group."""
    sigs = docs.map_batches(simhash_batch, batch_format="pyarrow", zero_copy_batch=True)

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        hs = t["simhash"].to_pylist()
        band_id, band_key, doc_id, sim = [], [], [], []
        for d, h in zip(ids, hs):
            for b in range(4):
                band_id.append(b)
                band_key.append((h >> (16 * b)) & 0xFFFF)
                doc_id.append(d)
                sim.append(h)
        return pa.table(
            {
                "band_id": pa.array(band_id, pa.int32()),
                "band_key": pa.array(band_key, pa.int32()),
                "doc_id": pa.array(doc_id, pa.int64()),
                "simhash": pa.array(sim, pa.int64()),
            }
        )

    def pairs_in_buckets(df) -> "pd.DataFrame":
        import pandas as pd

        df = df[df.duplicated(["band_id", "band_key"], keep=False)]  # drop singleton bands
        a_o, b_o, d_o = [], [], []
        for _, g in df.groupby(["band_id", "band_key"], sort=False):
            rows = sorted(set(zip(g["doc_id"], g["simhash"])))
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    dist = bin(rows[i][1] ^ rows[j][1]).count("1")
                    if dist <= max_hamming:
                        a_o.append(rows[i][0])
                        b_o.append(rows[j][0])
                        d_o.append(dist)
        return pd.DataFrame(
            {
                "doc_a": pd.array(a_o, "int64"),
                "doc_b": pd.array(b_o, "int64"),
                "hamming": pd.array(d_o, "int64"),
            }
        )

    from medical_ocr_service_ray.stages.aggregate import bucketed_combine

    cands = bucketed_combine(
        sigs.map_batches(explode_bands, batch_format="pyarrow"), "band_key", pairs_in_buckets
    )
    return bucketed_combine(
        cands,
        "doc_a",
        lambda df: df.groupby(["doc_a", "doc_b"], as_index=False).agg(hamming=("hamming", "min")),
    )
