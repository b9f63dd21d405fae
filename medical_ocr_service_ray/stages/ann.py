"""Similarity search over an embedding column (list<float>).

The reference's vector knn is `ORDER BY embedding <=> $1 LIMIT k` over pgvector
(src/services/matching.service.js:44-47; IVFFlat index built at
src/workers/embedding.worker.js:154-190). Ray-native rebuild:

- brute-force top-k: the query matrix is broadcast once (ray.put); every batch
  computes a numpy matmul and emits only its local top-k partials; a final
  tiny sort+limit merges them. No shuffle of the embedding table itself.
- LSH-bucketed variant (the scale path, IVF analogue): random-hyperplane
  bucket signatures; the search touches only matching buckets.
- integer-quantized dot-product variant: exact integer arithmetic end to end
  so a DuckDB oracle reproduces scores bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _stack_embeddings(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ExtensionArray):
        # blocks that round-tripped through pandas carry the embedding as an
        # ArrowTensorArray (no .values); its to_numpy is already (n, dim)
        return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=np.float64)
    return np.asarray(arr.values).reshape(len(batch), -1).astype(np.float64)


class BruteForceTopK:
    """Per-batch partial top-k against a broadcast query matrix."""

    def __init__(self, query_ref, k: int = 10, metric: str = "cosine"):
        q = np.asarray(ray.get(query_ref), dtype=np.float64)
        self.q = q if q.ndim == 2 else q[None, :]
        self.qnorm = np.linalg.norm(self.q, axis=1)
        self.k = k
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _stack_embeddings(batch)
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        scores = emb @ self.q.T  # (n, Q)
        if self.metric == "cosine":
            norms = np.linalg.norm(emb, axis=1)
            norms[norms == 0] = 1.0
            scores = scores / norms[:, None] / self.qnorm[None, :]
        q_out, id_out, s_out = [], [], []
        k = min(self.k, emb.shape[0])
        for qi in range(self.q.shape[0]):
            col = scores[:, qi]
            part = np.argpartition(-col, k - 1)[:k]
            for i in part:
                q_out.append(qi)
                id_out.append(int(ids[i]))
                s_out.append(float(col[i]))
        return pa.table(
            {
                "query_id": pa.array(q_out, pa.int32()),
                "vec_id": pa.array(id_out, pa.int64()),
                "score": pa.array(s_out, pa.float64()),
            }
        )


def _brute_force_partial(batch: pa.Table, query_ref, k: int, metric: str) -> pa.Table:
    """Task-form of ``BruteForceTopK`` (see ``quantized_dot_batch`` for why:
    setup is one zero-copy broadcast read, so tasks beat actor spin-up)."""
    return BruteForceTopK(query_ref, k=k, metric=metric)(batch)


def brute_force_topk(
    ds: "rd.Dataset", query_matrix: np.ndarray, k: int = 10, metric: str = "cosine"
) -> pa.Table:
    """Global top-k per query: per-batch partials -> tiny driver-side merge."""
    query_ref = ray.put(np.asarray(query_matrix))
    partials = ds.map_batches(
        _brute_force_partial,
        fn_kwargs={"query_ref": query_ref, "k": k, "metric": metric},
        batch_format="pyarrow",
    )
    merged = partials.to_pandas()  # size: n_blocks * Q * k — small by construction
    merged = merged.sort_values(
        ["query_id", "score", "vec_id"], ascending=[True, False, True]
    )
    return pa.Table.from_pandas(merged.groupby("query_id").head(k).reset_index(drop=True))


class QuantizedDot:
    """Exact integer dot-product scores vs ONE broadcast query vector,
    elementwise-quantized floor(x*1000) — bit-reproducible by SQL."""

    def __init__(self, query_ref):
        q = np.asarray(ray.get(query_ref), dtype=np.float64)
        self.q_int = np.floor(q * 1000.0).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return quantized_dot_batch(batch, q_int=self.q_int)


def quantized_dot_batch(batch: pa.Table, query_ref=None, q_int=None) -> pa.Table:
    """Task-form of ``QuantizedDot``: the per-call setup (one ``ray.get`` of
    a broadcast ref — zero-copy — plus quantizing a single vector) is trivial,
    so a plain task-based ``map_batches`` avoids paying actor-pool spin-up on
    every query invocation. Actor pools are reserved for genuinely heavy init
    (model/table warmup, stages/extract.py)."""
    if q_int is None:
        q = np.asarray(ray.get(query_ref), dtype=np.float64)
        q_int = np.floor(q * 1000.0).astype(np.int64)
    emb = _stack_embeddings(batch)
    emb_int = np.floor(emb * 1000.0).astype(np.int64)
    dots = emb_int @ q_int
    return pa.table(
        {
            "vec_id": batch["vec_id"],
            "dot_q": pa.array(dots.astype(np.float64), pa.float64()),
        }
    )


def lsh_bucket_signs(emb: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Random-hyperplane signature -> integer bucket id."""
    bits = (emb @ planes.T) >= 0
    return (bits.astype(np.int64) * (1 << np.arange(planes.shape[0], dtype=np.int64))).sum(axis=1)


class LshTopK:
    """IVF/LSH-bucketed ANN: score only vectors whose bucket signature is
    within hamming<=1 of the query's (recall/throughput tradeoff documented in
    the query docstring)."""

    def __init__(self, query_ref, planes_ref, k: int = 10):
        self.q = np.asarray(ray.get(query_ref), dtype=np.float64)
        self.planes = np.asarray(ray.get(planes_ref), dtype=np.float64)
        qsig = lsh_bucket_signs(self.q[None, :], self.planes)[0]
        nbits = self.planes.shape[0]
        self.accept = {qsig} | {qsig ^ (1 << b) for b in range(nbits)}
        self.qnorm = float(np.linalg.norm(self.q)) or 1.0
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _stack_embeddings(batch)
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        sigs = lsh_bucket_signs(emb, self.planes)
        mask = np.fromiter((int(s) in self.accept for s in sigs), dtype=bool, count=len(sigs))
        emb, ids = emb[mask], ids[mask]
        if emb.shape[0] == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        scores = (emb @ self.q) / norms / self.qnorm
        k = min(self.k, len(scores))
        part = np.argpartition(-scores, k - 1)[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[part], pa.int64()),
                "score": pa.array(scores[part], pa.float64()),
            }
        )


def probe_clusters(query_q: np.ndarray, centroids: np.ndarray, nprobe: int) -> np.ndarray:
    """The query's ``nprobe`` nearest centroids by exact int64 squared L2
    (||c||^2 - 2 q.c — the ||q||^2 term is constant), ties -> lowest cluster
    index. Mirrors stages/kmeans.assign arithmetic so a SQL
    ``ORDER BY score, cluster LIMIT nprobe`` reproduces the probe set."""
    cc = (centroids * centroids).sum(axis=1)
    scores = cc - 2 * (centroids @ query_q)
    order = np.lexsort((np.arange(len(scores)), scores))
    return order[:nprobe].astype(np.int64)


def ivf_topk(
    ds: "rd.Dataset",
    centroids: np.ndarray,
    query_q: np.ndarray,
    nprobe: int = 2,
    k: int = 10,
) -> pa.Table:
    """IVF-style ANN (the scale path of the reference's IVFFlat index,
    src/workers/embedding.worker.js:154-190), integer-exact end to end:

    - coarse quantizer = quantized Lloyd's centroids (stages/kmeans, SCALE
      1024) — bit-deterministic, so the SQL oracle can rebuild it;
    - the query probes its ``nprobe`` nearest centroids (driver-side, k×dim
      ints — tiny); the (centroids, probe-set, query) triple is broadcast
      ONCE via ray.put, never re-shipped per batch;
    - one streaming pass: each batch assigns rows to centroids (vectorized
      int64 L2), keeps only rows in probed clusters, scores them by exact
      int64 dot vs the quantized query, and emits a per-batch partial top-k;
    - tiny driver merge (blocks × k rows). No shuffle of the embedding table.

    At 100 TB the same plan holds with k in the thousands: the partial-top-k
    keeps the exchange O(blocks × k), and the probe filter cuts the scored
    fraction to ~nprobe/k_clusters of the corpus.
    """
    from medical_ocr_service_ray.stages.kmeans import assign, quantize

    probes = probe_clusters(query_q, centroids, nprobe)
    bundle_ref = ray.put((centroids, set(int(p) for p in probes), query_q))

    def partial(batch: pa.Table, _ref=bundle_ref) -> pa.Table:
        cents, probe_set, qv = ray.get(_ref)
        v = quantize(_stack_embeddings(batch))
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        a = assign(v, cents)
        mask = np.isin(a, np.fromiter(probe_set, dtype=np.int64))
        v, ids, a = v[mask], ids[mask], a[mask]
        empty = {
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64()),
            "dot_q": pa.array([], pa.int64()),
        }
        if v.shape[0] == 0:
            return pa.table(empty)
        dots = v @ qv  # exact int64: |coord| <= ~scale, dim*scale^2 << 2^63
        kk = min(k, len(dots))
        order = np.lexsort((ids, -dots))[:kk]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "cluster": pa.array(a[order], pa.int64()),
                "dot_q": pa.array(dots[order], pa.int64()),
            }
        )

    merged = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = merged.sort_values(["dot_q", "vec_id"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(merged.reset_index(drop=True))
