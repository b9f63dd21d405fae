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
    minhash_signature,
    sha256_hex,
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
        Docs sharing any (band_id, band_key) are candidate near-dups."""
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_band, out_key, out_id = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = minhash_signature(shingles(text or "", self.shingle_k), self.a, self.b)
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


def verify_pairs_jaccard(
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
        auto_num_buckets,
        bucketed_combine,
        dataset_input_bytes,
    )

    if num_buckets is None:
        # each join's per-bucket task holds ~corpus/num_buckets text bytes in
        # a dict: derive the count from the input size (sizing rule,
        # aggregate.py) instead of trusting a fixed default
        num_buckets = auto_num_buckets(dataset_input_bytes(docs))

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
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series(dtype="int64"),
                "doc_b": pd.Series(dtype="int64"),
                "jaccard_x1000": pd.Series(dtype="int64"),
            }
        )
        if p.empty:
            return empty
        tmap = dict(zip(d.key, d.text))
        sh_memo: dict[int, set] = {}

        def sh_of(doc_id: int, text: str) -> set:
            s = sh_memo.get(doc_id)
            if s is None:
                s = shingles(text, shingle_k)
                sh_memo[doc_id] = s
            return s

        keep_a, keep_b, keep_j = [], [], []
        for a, b, text_a in zip(p.doc_a, p.key, p.text):
            sa = sh_of(int(a), text_a)
            sb = sh_of(int(b), tmap.get(b, ""))
            union = len(sa | sb)
            inter = len(sa & sb)
            j_x1000 = (1000 * inter) // union if union else 1000
            if j_x1000 >= threshold_x1000:
                keep_a.append(int(a))
                keep_b.append(int(b))
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
    from medical_ocr_service_ray.stages.aggregate import bucketed_combine

    banded = docs.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=(1, 8),
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
    min-label propagation (the scale path sketched in ``dedup_clusters``):

    - labels start as each node's own id;
    - each round, every edge forwards min(label) across itself through ONE
      tagged-union bucket shuffle keyed on node (labels + exploded edges
      co-located per bucket), then a keyed min-combine;
    - labels are monotonically non-increasing, so the fixpoint test is
      "sum(labels) unchanged" — a per-batch partial sum, bytes to the driver;
    - rounds needed = graph diameter (ring-graph worst case bounded by
      ``max_rounds``; near-dup graphs are shallow in practice).

    Returns a Dataset (doc_id, cluster_id = min id in component,
    cluster_size), equal to driver-side ``dedup_clusters`` output."""
    import pandas as pd

    from medical_ocr_service_ray.stages.aggregate import bucketed_combine

    # unified row kinds flowing through ONE keyed shuffle per round:
    #   kind 0 = edge    (key = node, val = neighbor)   — re-shuffled each round
    #   kind 1 = cand    (key = node, val = candidate label)
    #   kind 2 = sum     (key = -1-bucket, val = per-bucket label sum) — the
    #            fixpoint probe, filtered out of the next round's input
    def explode_edges(df: pd.DataFrame) -> pd.DataFrame:
        key = pd.concat([df.doc_a, df.doc_b], ignore_index=True).astype("int64")
        val = pd.concat([df.doc_b, df.doc_a], ignore_index=True).astype("int64")
        edges_part = pd.DataFrame({"key": key, "kind": 0, "val": val})
        init = pd.DataFrame({"key": key, "kind": 1, "val": key})  # label := self
        return pd.concat([edges_part, init], ignore_index=True)

    state = pairs.select_columns(["doc_a", "doc_b"]).map_batches(
        explode_edges, batch_format="pandas"
    ).materialize()

    def round_combine(df: pd.DataFrame) -> pd.DataFrame:
        edg = df[df.kind == 0]
        cand = df[df.kind == 1]
        lab = cand.groupby("key", as_index=False).agg(val=("val", "min"))  # new labels
        lmap = dict(zip(lab.key, lab.val))
        retain = pd.DataFrame({"key": lab.key, "kind": 1, "val": lab.val})
        msgs = pd.DataFrame(
            {"key": edg.val.astype("int64"), "kind": 1, "val": edg.key.map(lmap).astype("int64")}
        )
        probe = pd.DataFrame({"key": [-1], "kind": 2, "val": [int(lab.val.sum())]})
        # edges pass through so the next round re-shuffles them with the cands
        out = pd.concat([edg[["key", "kind", "val"]], retain, msgs, probe], ignore_index=True)
        return out.astype({"key": "int64", "kind": "int64", "val": "int64"})

    prev_sum = None
    for _ in range(max_rounds):
        state = bucketed_combine(state, "key", round_combine, num_buckets=num_buckets).materialize()
        probes = state.map_batches(
            lambda df: df[df.kind == 2][["val"]], batch_format="pandas"
        ).to_pandas()  # num_buckets tiny rows
        cur_sum = int(probes.val.sum())
        state = state.map_batches(
            lambda df: df[df.kind != 2], batch_format="pandas"
        )
        if cur_sum == prev_sum:  # labels monotone non-increasing => fixpoint
            break
        prev_sum = cur_sum

    # final labels: min candidate per node
    labels = bucketed_combine(
        state.map_batches(lambda df: df[df.kind == 1], batch_format="pandas"),
        "key",
        lambda df: df.groupby("key", as_index=False)
        .agg(val=("val", "min"))
        .rename(columns={"key": "node", "val": "label"}),
        num_buckets=num_buckets,
    ).materialize()

    # attach cluster sizes: keyed count + one tagged-union join back
    def size_side(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("label", as_index=False).agg(n=("node", "size"))
        return pd.DataFrame(
            {"key": g.label.astype("int64"), "side": 0, "node": -1, "n": g.n.astype("int64")}
        )

    def combine_sizes(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("key", as_index=False).agg(n=("n", "sum"))
        return pd.DataFrame(
            {"key": g.key.astype("int64"), "side": 0, "node": -1, "n": g.n.astype("int64")}
        )

    sizes = bucketed_combine(
        labels.map_batches(size_side, batch_format="pandas"),
        "key",
        combine_sizes,
        num_buckets=num_buckets,
    )

    def member_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"key": df.label.astype("int64"), "side": 1, "node": df.node.astype("int64"), "n": -1}
        )

    unified_sz = sizes.union(labels.map_batches(member_side, batch_format="pandas"))

    def join_sizes(df: pd.DataFrame) -> pd.DataFrame:
        smap = dict(zip(df[df.side == 0].key, df[df.side == 0].n))
        m = df[df.side == 1]
        return pd.DataFrame(
            {
                "doc_id": m.node.astype("int64"),
                "cluster_id": m.key.astype("int64"),
                "cluster_size": m.key.map(smap).astype("int64"),
            }
        )

    return bucketed_combine(unified_sz, "key", join_sizes, num_buckets=num_buckets)


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
