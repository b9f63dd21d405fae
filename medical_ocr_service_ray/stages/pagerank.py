"""Quantized PageRank on Ray Data — iterative graph algorithm as repeated
keyed exchanges (the graph sibling of stages/kmeans.py's iterative design).

All arithmetic is int64 fixed-point (micro-units, damping 0.85 as
``150000 + (85 * s) // 100``) so every iteration is bit-deterministic,
partitioning-invariant, and mirrorable by an UNROLLED SQL oracle — the
same trick that made k-means (q46) hash-exact in DuckDB.

Plan per iteration (2 linear exchanges, no driver materialization):
  1. union(edges ⊎ ranks) bucketed on src → per bucket: contribution
     ``r[src] // deg[src]`` per edge, pre-summed per dst inside the bucket;
  2. bucketed combine on dst → ``r' = 150000 + (85 * Σ contrib) // 100``.

Degrees are joined onto the edge set ONCE up front (same tagged-union
bucket merge), and the edge list is ``materialize()``d so iterations re-read
cached blocks from the object store instead of recomputing the edge
derivation — the one deliberate materialization, O(edges), spillable.

Scale notes: node state never lives on the driver; a hot node (huge
in-degree) is pre-summed inside every source bucket before the dst
exchange, so its traffic is O(buckets), not O(degree). Dangling nodes
(out-degree 0) cannot occur when the caller feeds an undirected edge set
(both directions present), which is what q76 does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from medical_ocr_service_ray.stages.aggregate import bucketed_combine

_ALPHA_NUM = 85  # damping numerator (0.85)
_ALPHA_DEN = 100
_BASE = 150_000  # (1 - 0.85) in micro-units
_R0 = 1_000_000


def _tag_union(a: "rd.Dataset", b: "rd.Dataset") -> "rd.Dataset":
    return a.union(b)


def attach_degrees(edges: "rd.Dataset", num_buckets: int = 16) -> "rd.Dataset":
    """(src, dst) -> (src, dst, d) with d = out-degree of src, via one
    tagged-union bucket merge (no broadcast: the node set scales with the
    graph)."""

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("src").size().reset_index(name="d")
        return pd.DataFrame(
            {
                "src": g.src.astype("int64"),
                "dst": np.int64(-1),
                "d": g.d.astype("int64"),
                "side": np.int8(1),
            }
        )

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df.src.astype("int64"),
                "dst": df.dst.astype("int64"),
                "d": np.int64(0),
                "side": np.int8(0),
            }
        )

    u = _tag_union(
        edges.map_batches(edge_rows, batch_format="pandas"),
        edges.map_batches(deg_partial, batch_format="pandas"),
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        deg = (
            df[df.side == 1].groupby("src", as_index=False)["d"].sum()
        )
        e = df[df.side == 0][["src", "dst"]]
        return e.merge(deg, on="src", how="left")

    return bucketed_combine(u, "src", per_bucket, num_buckets=num_buckets, map_batch_size=1 << 17)


def pagerank_quantized(
    edges: "rd.Dataset",
    iterations: int = 3,
    num_buckets: int = 16,
) -> "rd.Dataset":
    """``edges``: (src:int64, dst:int64), both directions present for an
    undirected graph. Returns (node, pr_micro) after ``iterations`` rounds
    from a uniform 1e6 start. Deterministic int64 arithmetic throughout."""
    ewd = attach_degrees(edges, num_buckets=num_buckets).materialize()

    # r0: every src node (== every node, undirected) at 1e6
    def nodes_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df.src.unique().astype("int64")})

    def nodes_combine(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df.node.unique()})

    ranks = bucketed_combine(
        ewd.map_batches(nodes_partial, batch_format="pandas"),
        "node",
        nodes_combine,
        num_buckets=num_buckets,
        map_batch_size=1 << 17,
    ).map_batches(
        lambda df: df.assign(r=np.int64(_R0)), batch_format="pandas"
    )

    for _ in range(iterations):
        ranks = _one_iteration(ewd, ranks, num_buckets)
    return ranks


def _one_iteration(ewd: "rd.Dataset", ranks: "rd.Dataset", num_buckets: int) -> "rd.Dataset":
    def edge_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df.src,
                "dst": df.dst,
                "d": df.d,
                "r": np.int64(0),
                "side": np.int8(0),
            }
        )

    def rank_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df.node.astype("int64"),
                "dst": np.int64(-1),
                "d": np.int64(0),
                "r": df.r.astype("int64"),
                "side": np.int8(1),
            }
        )

    u = _tag_union(
        ewd.map_batches(edge_side, batch_format="pandas"),
        ranks.map_batches(rank_side, batch_format="pandas"),
    )

    def contrib_per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        r = df[df.side == 1][["src", "r"]]
        e = df[df.side == 0][["src", "dst", "d"]]
        m = e.merge(r, on="src", how="inner")
        m["c"] = m.r.to_numpy() // m.d.to_numpy()
        # pre-sum per dst INSIDE the src bucket: hot dst traffic = O(buckets)
        return m.groupby("dst", as_index=False)["c"].sum()

    partial = bucketed_combine(
        u, "src", contrib_per_bucket, num_buckets=num_buckets, map_batch_size=1 << 17
    )

    def new_rank(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dst", as_index=False)["c"].sum()
        return pd.DataFrame(
            {
                "node": g.dst.astype("int64"),
                "r": (_BASE + (_ALPHA_NUM * g.c.to_numpy()) // _ALPHA_DEN).astype(
                    "int64"
                ),
            }
        )

    return bucketed_combine(
        partial, "dst", new_rank, num_buckets=num_buckets, map_batch_size=1 << 17
    )
