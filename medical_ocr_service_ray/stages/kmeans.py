"""Quantized Lloyd's k-means over an embedding column — the engine's
iterative-algorithm pattern.

Continues the integer-exactness theme of q12 (quantized dot) and q43
(quantized BM25): embeddings quantize once to int64 (``round(x * SCALE)``),
assignment distances and the per-cluster partial sums are exact int64
arithmetic, and centroid updates floor-divide the summed coordinates —
so every iteration is **bit-deterministic and partitioning-invariant**
(integer addition is associative; float k-means is neither), which is what
makes the planted-blob pytest an equality oracle instead of a tolerance.

Dataflow per iteration (the canonical broadcast-iterate shape):

- centroids (k × dim int64, a few KB) broadcast via ``ray.put`` once per
  iteration — never re-shipped per batch;
- one streaming pass: each batch assigns rows to nearest centroid
  (vectorized squared-L2 over the int64 matrix) and emits k partial
  (sum-vector, count) rows — O(k × dim) per batch leaves the task;
- driver combines k × blocks tiny partials and floor-divides: exact.

Init is deterministic: the k rows with the smallest ids. Convergence:
fixed iteration budget (callers at 100 TB stop on unchanged centroids —
comparison is integer equality, so "unchanged" is well-defined).

Scale notes: per-iteration exchange is O(blocks × k × dim) ints; input is
re-scanned per iteration (Lloyd's is a multi-pass algorithm — at 100 TB
cache the quantized column as parquet once and iterate over that).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pragma: no cover
    import ray.data as rd

SCALE = 1024  # power of two: quantization is exact halving-friendly


def quantize(vectors: np.ndarray) -> np.ndarray:
    # floor(x*SCALE + 0.5), NOT np.rint: the embeddings' float32 mantissas DO
    # land exactly on .5 after *1024, and half-even (rint) has no DuckDB
    # equivalent — floor(+0.5) is the same arithmetic in both engines, which
    # is what lets q46 carry an exact unrolled-SQL oracle
    return np.floor(np.asarray(vectors, dtype=np.float64) * SCALE + 0.5).astype(np.int64)


def assign(q: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest centroid by exact int64 squared L2 (ties -> lowest index).
    ||x-c||^2 compared via -2x.c + ||c||^2 (the ||x||^2 term is constant
    per row); int64 is safe while 4*SCALE^2*dim*k fits, i.e. essentially
    always for unit-norm embeddings."""
    cc = (centroids * centroids).sum(axis=1)  # (k,)
    scores = q @ centroids.T * (-2) + cc[None, :]
    return np.argmin(scores, axis=1).astype(np.int64)


def kmeans_fit(
    ds: "rd.Dataset",
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Returns the final int64 centroid matrix (k × dim)."""
    import ray

    # deterministic init: the k smallest ids, found with per-batch partial
    # bottom-k (driver pulls k rows per block, never a global sort)
    init_parts = ds.map_batches(
        lambda df: df.nsmallest(k, id_col)[[id_col, vec_col]], batch_format="pandas"
    ).to_pandas()
    init = init_parts.nsmallest(k, id_col).sort_values(id_col)
    centroids = quantize(np.stack(init[vec_col].to_numpy()))

    for _ in range(iters):
        ref = ray.put(centroids)

        def partial(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            cents = ray.get(_ref)
            q = quantize(np.stack(df[vec_col].to_numpy()))
            a = assign(q, cents)
            rows = []
            for j in np.unique(a):
                sel = q[a == j]
                rows.append(
                    {
                        "cluster": int(j),
                        "n": int(sel.shape[0]),
                        "sums": sel.sum(axis=0, dtype=np.int64).tobytes(),
                    }
                )
            return pd.DataFrame(rows)

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        dim = centroids.shape[1]
        new = centroids.copy()
        for j, sub in parts.groupby("cluster"):
            total = np.zeros(dim, dtype=np.int64)
            for b in sub["sums"]:
                total += np.frombuffer(b, dtype=np.int64)
            n = int(sub["n"].sum())
            if n:
                new[int(j)] = total // n  # floor: exact, deterministic
        centroids = new
    return centroids


def kmeans_assign(
    ds: "rd.Dataset",
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "rd.Dataset":
    """One streaming pass labeling every row with its nearest centroid."""
    import ray

    ref = ray.put(centroids)

    def label(df: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(ref)
        q = quantize(np.stack(df[vec_col].to_numpy()))
        return pd.DataFrame(
            {id_col: df[id_col].astype("int64"), "cluster": assign(q, cents)}
        )

    return ds.map_batches(label, batch_format="pandas")


def pq_fit(
    ds: "rd.Dataset",
    n_sub: int,
    sub_dim: int,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebooks: an independent quantized-Lloyd's fit
    per contiguous ``sub_dim``-wide subspace, ALL subspaces trained in the
    same streaming pass per iteration (one map_batches emits per-(subspace,
    cluster) partial sums — n_sub separate kmeans_fit calls would re-scan
    the corpus n_sub times for identical results). Same integer semantics
    as kmeans_fit per subspace: init = the k smallest ids' slices, int64 L2
    assignment with lowest-index ties, floor-divided centroid updates,
    empty clusters keep the previous centroid — so the whole fit unrolls
    into an exact DuckDB mirror (q175). Returns (n_sub, k, sub_dim) int64."""
    import ray

    init_parts = ds.map_batches(
        lambda df: df.nsmallest(k, id_col)[[id_col, vec_col]], batch_format="pandas"
    ).to_pandas()
    init = init_parts.nsmallest(k, id_col).sort_values(id_col)
    full = quantize(np.stack(init[vec_col].to_numpy()))  # (k, n_sub*sub_dim)
    books = np.stack(
        [full[:, m * sub_dim : (m + 1) * sub_dim] for m in range(n_sub)]
    )  # (n_sub, k, sub_dim)

    for _ in range(iters):
        ref = ray.put(books)

        def partial(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            bks = ray.get(_ref)
            q = quantize(np.stack(df[vec_col].to_numpy()))
            rows = []
            for m in range(bks.shape[0]):
                qs = q[:, m * sub_dim : (m + 1) * sub_dim]
                a = assign(qs, bks[m])
                for j in np.unique(a):
                    sel = qs[a == j]
                    rows.append(
                        {
                            "sub": int(m),
                            "cluster": int(j),
                            "n": int(sel.shape[0]),
                            "sums": sel.sum(axis=0, dtype=np.int64).tobytes(),
                        }
                    )
            return pd.DataFrame(rows)

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        new = books.copy()
        for (m, j), sub in parts.groupby(["sub", "cluster"]):
            total = np.zeros(sub_dim, dtype=np.int64)
            for b in sub["sums"]:
                total += np.frombuffer(b, dtype=np.int64)
            n = int(sub["n"].sum())
            if n:
                new[int(m), int(j)] = total // n
        books = new
    return books
