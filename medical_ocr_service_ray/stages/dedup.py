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
from ray.data.aggregate import Count, Min

from medical_ocr_service_ray.functions.hashing import (
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
    """Hash-partition on content hash, keep min(id) per group + dup_count.
    Pure aggregate (no map_groups) so Ray pre-combines per block before the
    shuffle — the partial-aggregation pattern for 100 TB inputs."""
    hashed = ds.map_batches(
        lambda t: add_sha_batch(t, text_col), batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["text_sha256", id_col])
    agg = hashed.groupby("text_sha256").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="dup_count")
    )
    return agg.select_columns([id_col, "dup_count"])


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
                out_key.append(hash(tuple(int(x) for x in chunk)) & 0x7FFFFFFFFFFFFFFF)
                out_id.append(doc_id)
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.int64()),
                "doc_id": pa.array(out_id, pa.int64()),
            }
        )


def _emit_pairs(group: pa.Table) -> pa.Table:
    """All (a<b) pairs within one LSH bucket."""
    ids = sorted(set(group["doc_id"].to_pylist()))
    a_out, b_out = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pa.table({"doc_a": pa.array(a_out, pa.int64()), "doc_b": pa.array(b_out, pa.int64())})


class JaccardVerifier:
    """Actor stage: verify candidate pairs with true shingle Jaccard, texts
    resolved from a broadcast {doc_id: text} dict (small-side lookup — at
    100 TB this becomes a hash-bucket join of pair keys back to texts)."""

    def __init__(self, texts_ref, shingle_k: int = 3, threshold_x1000: int = 600):
        import ray

        self.texts = ray.get(texts_ref)
        self.k = shingle_k
        self.threshold = threshold_x1000

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch["doc_a"].to_pylist()
        b_ids = batch["doc_b"].to_pylist()
        keep_a, keep_b, keep_j = [], [], []
        for a, b in zip(a_ids, b_ids):
            sa = shingles(self.texts.get(a, ""), self.k)
            sb = shingles(self.texts.get(b, ""), self.k)
            union = len(sa | sb)
            inter = len(sa & sb)
            j_x1000 = (1000 * inter) // union if union else 1000
            if j_x1000 >= self.threshold:
                keep_a.append(a)
                keep_b.append(b)
                keep_j.append(j_x1000)
        return pa.table(
            {
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
                "jaccard_x1000": pa.array(keep_j, pa.int64()),
            }
        )


def minhash_lsh_pairs(
    docs: "rd.Dataset",
    texts_ref,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold_x1000: int = 600,
) -> "rd.Dataset":
    """shingle -> minhash -> band -> bucket-groupby -> candidate pairs ->
    dedupe pairs -> verify true Jaccard. Returns (doc_a, doc_b, jaccard_x1000)."""
    banded = docs.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    candidates = banded.groupby(["band_id", "band_key"]).map_groups(
        _emit_pairs, batch_format="pyarrow"
    )
    # a pair can surface from several bands: dedupe before the (expensive) verify
    unique_pairs = candidates.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="nbands"))
    return unique_pairs.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={
            "texts_ref": texts_ref,
            "shingle_k": shingle_k,
            "threshold_x1000": threshold_x1000,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


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

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        rows = sorted(set(zip(group["doc_id"].to_pylist(), group["simhash"].to_pylist())))
        a_o, b_o, d_o = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                dist = bin(rows[i][1] ^ rows[j][1]).count("1")
                if dist <= max_hamming:
                    a_o.append(rows[i][0])
                    b_o.append(rows[j][0])
                    d_o.append(dist)
        return pa.table(
            {
                "doc_a": pa.array(a_o, pa.int64()),
                "doc_b": pa.array(b_o, pa.int64()),
                "hamming": pa.array(d_o, pa.int64()),
            }
        )

    cands = sigs.map_batches(explode_bands, batch_format="pyarrow").groupby(
        ["band_id", "band_key"]
    ).map_groups(pairs_in_bucket, batch_format="pyarrow")
    return cands.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))
