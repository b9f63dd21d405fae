"""Quantized PageRank on Ray Data — iterative graph algorithm where the
EDGES STAY PUT and only tiny contribution partials move.

All arithmetic is int64 fixed-point (micro-units, damping 0.85 as
``150000 + (85 * s) // 100``) so every iteration is bit-deterministic,
partitioning-invariant, and mirrorable by an UNROLLED SQL oracle — the
same trick that made k-means (q46) hash-exact in DuckDB.

Physical plan (r4 redesign #2, VERDICT r3 ask #7):

  setup — ONE exchange total: edges are hash-bucketed on src with the
  engine's standard bucketed groupby; each bucket task derives out-degrees
  IN-BUCKET (every edge of a src shares its bucket, so the per-src count is
  complete), sorts by src, and stashes the (src, dst, d) numpy arrays in an
  ACTOR-OWNED plasma object (``_EdgeStash``). The old plan paid two more
  sorts here (a tagged-union degree join + a separate store pass).

  iterations — ZERO Dataset exchanges: each round is ``num_buckets`` raw
  Ray tasks. Task b receives its bucket's edge arrays (plasma-local after
  the first fetch) plus the ≤``num_buckets`` contribution slices addressed
  to it from the previous round, sums per dst (int64-exact), applies
  damping, and emits its next contributions PRE-SLICED by destination
  bucket via ``num_returns=num_buckets`` — a 16×16 mesh of tiny objects
  instead of a sort. Measured: each Ray Data sort has ~1.5 s fixed latency
  at bench scale, so the Dataset-API iteration (2 sorts/round in r3, 1 in
  the fused attempt) was exchange-floor-bound regardless of data size; the
  task mesh removes the floor entirely. Round k+1's task b starts as soon
  as its 16 input slices exist — rounds pipeline naturally.

This is the documented raw-task exception (SURVEY §1.4): the Dataset API
cannot express "iterate N times against a pinned partitioned dataset
without re-exchanging it". Partitioning assumption: bucket_of(node) is the
single hash shared by edge srcs, contribution dsts and rank rows, so a
bucket's rank combine, damping and outgoing contributions all complete in
one task. Final ranks come back as per-bucket Arrow tables via
``ray.data.from_arrow_refs`` — never driver-materialized.

Scale notes: node state never lives on the driver; a hot node (huge
in-degree) is pre-summed inside every source bucket before slices are
emitted, so its traffic is O(buckets), not O(degree). Per-bucket edge
arrays follow the engine-wide ~1 GiB bucket sizing (auto_num_buckets); the
inter-round mesh is O(num_buckets² × distinct-dst-per-bucket-pair) — KBs
to MBs, independent of edge count. Dangling nodes (out-degree 0) cannot
occur when the caller feeds an undirected edge set (both directions
present), which is what q76 does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from medical_ocr_service_ray.stages.aggregate import bucket_of

_ALPHA_NUM = 85  # damping numerator (0.85)
_ALPHA_DEN = 100
_BASE = 150_000  # (1 - 0.85) in micro-units
_R0 = 1_000_000


@ray.remote
class _EdgeStash:
    """Holds the bucket-partitioned, src-sorted edge arrays for one
    PageRank run. ``put`` re-puts the arrays from inside the actor so the
    plasma objects are OWNED by the actor (not by the transient map worker
    that produced the partition); the driver keeps the handle alive until
    ``ray.wait`` confirms every step task has finished with them."""

    def __init__(self):
        self._refs: dict[int, "ray.ObjectRef"] = {}

    def put(self, bucket: int, arrays: dict) -> None:
        self._refs[bucket] = ray.put(arrays)

    def refs(self) -> dict:
        return dict(self._refs)


def _slice_contribs(dst: np.ndarray, c: np.ndarray, num_buckets: int) -> list:
    """Per-dst int64-exact partial sums, pre-sliced by destination bucket.
    Returns ``num_buckets`` dicts of numpy arrays (empty ones included)."""
    g = (
        pd.DataFrame({"dst": dst, "c": c})
        .groupby("dst", as_index=False)["c"]
        .sum()
    )
    gd = g.dst.to_numpy()
    gc = g.c.to_numpy()
    # MUST equal bucket_of's int branch (floor mod) — the adjacency was
    # partitioned with bucket_of; TestMeshRoutingInvariant pins the equality
    gb = gd % num_buckets
    out = []
    for b2 in range(num_buckets):
        m = gb == b2
        out.append(
            {"dst": np.ascontiguousarray(gd[m]), "c": np.ascontiguousarray(gc[m])}
        )
    return out


@ray.remote
def _pr_seed(edges: dict, num_buckets: int) -> list:
    """Round 0: contributions from the uniform r0 start (no rank input)."""
    return _slice_contribs(edges["dst"], _R0 // edges["d"], num_buckets)


@ray.remote
def _pr_step(edges: dict, num_buckets: int, last: bool, *slices: dict):
    """Combine this bucket's incoming contribution slices, damp, and either
    emit the final (node, r) Arrow table (``last``) or the next round's
    pre-sliced contributions."""
    dst = np.concatenate([s["dst"] for s in slices])
    c = np.concatenate([s["c"] for s in slices])
    g = pd.DataFrame({"dst": dst, "c": c}).groupby("dst")["c"].sum()
    nodes_s = g.index.to_numpy()  # sorted unique node ids
    r_s = (_BASE + (_ALPHA_NUM * g.to_numpy()) // _ALPHA_DEN).astype("int64")
    if last:
        return pa.table({"node": pa.array(nodes_s, pa.int64()), "r": pa.array(r_s, pa.int64())})
    # every edge src has a rank by construction (undirected graph: each
    # node receives contributions every round)
    c2 = r_s[np.searchsorted(nodes_s, edges["src"])] // edges["d"]
    return _slice_contribs(edges["dst"], c2, num_buckets)


def pagerank_quantized(
    edges: "rd.Dataset",
    iterations: int = 3,
    num_buckets: int = 16,
) -> "rd.Dataset":
    """``edges``: (src:int64, dst:int64), both directions present for an
    undirected graph. Returns (node, r) micro-unit ranks after
    ``iterations`` rounds from a uniform 1e6 start, as a Dataset backed by
    the step tasks' per-bucket Arrow outputs (never driver-materialized).
    Deterministic int64 arithmetic throughout. ``iterations`` must be ≥ 1:
    the mesh's seed round emits contribution slices, not ranks, so the
    final-rank shape only exists after at least one step."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    stash = _EdgeStash.remote()

    def stamp_src(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = bucket_of(df.src, num_buckets)
        return df

    def store(df: pd.DataFrame) -> pd.DataFrame:
        """Degree-derive + src-sort + stash this bucket's edges. Degrees are
        complete in-bucket: every edge of a src hashes to the src's bucket."""
        if df.empty:
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"), "n_edges": pd.Series(dtype="int64")})
        b = int(df["__bucket"].iloc[0])
        src = df.src.to_numpy().astype("int64", copy=False)
        order = np.argsort(src, kind="stable")
        src = src[order]
        uniq, counts = np.unique(src, return_counts=True)
        d = np.repeat(counts, counts)  # src-sorted => per-edge out-degree
        ray.get(
            stash.put.remote(
                b,
                {
                    "src": np.ascontiguousarray(src),
                    "dst": np.ascontiguousarray(
                        df.dst.to_numpy().astype("int64", copy=False)[order]
                    ),
                    "d": np.ascontiguousarray(d.astype("int64")),
                },
            )
        )
        return pd.DataFrame({"bucket": [b], "n_edges": [len(df)]})

    # the ONE exchange of the whole algorithm
    (
        edges.map_batches(stamp_src, batch_format="pandas", batch_size=1 << 17)
        .groupby("__bucket")
        .map_groups(store, batch_format="pandas")
        .materialize()
    )
    edge_refs = ray.get(stash.refs.remote())
    buckets = sorted(edge_refs)
    nb = num_buckets
    if not buckets:  # empty edge set
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "r": pa.array([], pa.int64())})
        )

    # raw-task rounds: slices[b][b2] = contribs produced by bucket b for
    # bucket b2. num_returns gives each slice its own (driver-owned) object
    # so consumers fetch only what's addressed to them.
    slices = {
        b: _pr_seed.options(num_returns=nb).remote(edge_refs[b], nb) for b in buckets
    }
    for it in range(iterations):
        last = it == iterations - 1
        nxt = {}
        for b in buckets:
            inputs = [slices[src_b][b] for src_b in buckets]
            if last:
                nxt[b] = _pr_step.options(num_returns=1).remote(
                    edge_refs[b], nb, True, *inputs
                )
            else:
                nxt[b] = _pr_step.options(num_returns=nb).remote(
                    edge_refs[b], nb, False, *inputs
                )
        slices = nxt

    final_refs = [slices[b] for b in buckets]
    # wait (not fetch) for every step task: after this nothing references
    # the stash-owned edge objects, so the actor may die with the handle
    ray.wait(final_refs, num_returns=len(final_refs))
    return rd.from_arrow_refs(final_refs)


def csr_partition(
    edges: "rd.Dataset", num_buckets: int, stash
) -> dict:
    """Hash-partition (src, dst) edges by bucket_of(src) into actor-owned
    plasma CSR arrays (nodes sorted unique, indptr, neigh; in-bucket edge
    dedup — complete because every copy of (src, dst) hashes to src's
    bucket). ONE exchange; returns {bucket: ObjectRef}. Used by the BFS
    mesh (q81); connected components (stages/dedup.py) instantiates the
    same stamp/store/dedup pattern on undirected doc pairs — keep the
    %num_buckets routing invariant in sync between the two (pinned by
    TestMeshRoutingInvariant)."""

    def stamp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = bucket_of(df.src, num_buckets)
        return df

    def store(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"bucket": pd.Series(dtype="int64")})
        b = int(df["__bucket"].iloc[0])
        df = df.drop_duplicates(["src", "dst"])
        src = df.src.to_numpy().astype("int64", copy=False)
        order = np.argsort(src, kind="stable")
        src = src[order]
        nodes, counts = np.unique(src, return_counts=True)
        indptr = np.concatenate([[0], counts.cumsum()]).astype("int64")
        ray.get(
            stash.put.remote(
                b,
                {
                    "nodes": np.ascontiguousarray(nodes),
                    "indptr": indptr,
                    "neigh": np.ascontiguousarray(
                        df.dst.to_numpy().astype("int64", copy=False)[order]
                    ),
                },
            )
        )
        return pd.DataFrame({"bucket": [b]})

    (
        edges.map_batches(stamp, batch_format="pandas", batch_size=1 << 17)
        .groupby("__bucket")
        .map_groups(store, batch_format="pandas")
        .materialize()
    )
    return ray.get(stash.refs.remote())


def _slice_nodes(nodes: np.ndarray, nb: int) -> list:
    u = np.unique(nodes)
    ub = u % nb  # bucket_of int branch (floor mod) — TestMeshRoutingInvariant
    return [{"n": np.ascontiguousarray(u[ub == b])} for b in range(nb)]


@ray.remote
def _bfs_round(adj: dict, state: dict, hop: int, nb: int, *slices: dict):
    """One BFS hop for one bucket: merge the incoming frontier, record
    newly-discovered nodes at ``hop``, emit their neighbors pre-sliced by
    destination bucket. Returns (state, slice_0..slice_{nb-1})."""
    empty = [{"n": np.empty(0, dtype="int64")}] * nb
    incoming = np.unique(np.concatenate([s["n"] for s in slices]))
    if not len(incoming):
        return tuple([state] + empty)
    seen = np.isin(incoming, state["node"], assume_unique=True)
    new = incoming[~seen]
    if not len(new):
        return tuple([state] + empty)
    nodes = np.concatenate([state["node"], new])
    hops = np.concatenate([state["hops"], np.full(len(new), hop, dtype="int64")])
    order = np.argsort(nodes, kind="stable")
    state = {"node": nodes[order], "hops": hops[order]}
    # expand: neighbors of the newly-discovered (every frontier node exists
    # in some bucket's adjacency, but THIS bucket only expands its own keys)
    idx = np.searchsorted(adj["nodes"], new)
    idx = np.minimum(idx, len(adj["nodes"]) - 1)
    present = adj["nodes"][idx] == new
    pi = idx[present]
    counts = adj["indptr"][pi + 1] - adj["indptr"][pi]
    starts = adj["indptr"][pi]
    total = int(counts.sum())
    flat = np.repeat(starts, counts) + (
        np.arange(total) - np.repeat(counts.cumsum() - counts, counts)
    )
    return tuple([state] + _slice_nodes(adj["neigh"][flat], nb))


@ray.remote
def _bfs_finalize(state: dict):
    return pa.table(
        {
            "node": pa.array(state["node"], pa.int64()),
            "hops": pa.array(state["hops"], pa.int64()),
        }
    )


def bfs_hops_mesh(
    edges: "rd.Dataset", seed: int, max_hops: int, num_buckets: int = 16
) -> "rd.Dataset":
    """Bounded-depth BFS on the task mesh (the §23/§24 pattern): adjacency
    partitioned ONCE (csr_partition, the only Dataset exchange), then
    ``max_hops`` rounds of ``num_buckets`` raw tasks exchanging only
    frontier node ids (num_returns-sliced per destination bucket). The r3
    plan paid 2 Ray Data sorts per hop (~1.5 s fixed each); rounds here are
    milliseconds and empty frontiers short-circuit. Returns (node, hops),
    hops ∈ [0, max_hops], seed included at 0."""
    nb = num_buckets
    stash = _EdgeStash.remote()
    adj_refs = csr_partition(edges, nb, stash)
    buckets = sorted(adj_refs)
    if not buckets:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([seed], pa.int64()),
                    "hops": pa.array([0], pa.int64()),
                }
            )
        )
    empty_state = {
        "node": np.empty(0, dtype="int64"),
        "hops": np.empty(0, dtype="int64"),
    }
    states = {b: empty_state for b in buckets}
    # seed slice addressed to its bucket (hop 0 discovers the seed itself)
    seed_arr = np.array([seed], dtype="int64")
    slices = {
        b: [
            {"n": seed_arr if (b == buckets[0] and b2 == seed % nb) else np.empty(0, dtype="int64")}
            for b2 in range(nb)
        ]
        for b in buckets
    }
    for hop in range(0, max_hops + 1):
        nxt = {
            b: _bfs_round.options(num_returns=nb + 1).remote(
                adj_refs[b], states[b], hop, nb, *[slices[sb][b] for sb in buckets]
            )
            for b in buckets
        }
        states = {b: nxt[b][0] for b in buckets}
        slices = {b: list(nxt[b][1:]) for b in buckets}
    final_refs = [_bfs_finalize.remote(states[b]) for b in buckets]
    ray.wait(final_refs, num_returns=len(final_refs))
    out = rd.from_arrow_refs(final_refs)
    if seed % nb not in buckets:
        # isolated seed: its bucket has no adjacency, so no task could
        # record the hop-0 discovery — emit the seed row directly
        out = out.union(
            rd.from_arrow(
                pa.table(
                    {"node": pa.array([seed], pa.int64()), "hops": pa.array([0], pa.int64())}
                )
            )
        )
    return out


# ------------------------------------------------- label propagation (LPA)

def _lpa_slices(lab: "np.ndarray", indptr: "np.ndarray", neigh: "np.ndarray", nb: int) -> list:
    """Outgoing label messages, pre-reduced to (dst, label, count) cells and
    pre-sliced by destination bucket (dst % nb — the mesh routing
    invariant). Cell count per bucket-pair is bounded by distinct
    (dst, label), which shrinks as communities converge."""
    import pandas as pd

    deg = np.diff(indptr)
    df = pd.DataFrame({"d": neigh, "l": np.repeat(lab, deg)})
    g = df.groupby(["d", "l"], as_index=False).size()
    d = g.d.to_numpy().astype("int64")
    l = g.l.to_numpy().astype("int64")
    c = g["size"].to_numpy().astype("int64")
    gb = d % nb
    out = []
    for b2 in range(nb):
        m = gb == b2
        out.append({"d": d[m], "l": l[m], "c": c[m]})
    return out


@ray.remote
def _lpa_seed(adj: dict, nb: int):
    """Labels start as node ids; emit the first round's message slices."""
    lab = adj["nodes"].copy()
    return (lab, *_lpa_slices(lab, adj["indptr"], adj["neigh"], nb))


@ray.remote
def _lpa_round(adj: dict, lab_old: "np.ndarray", nb: int, last: bool, *slices: dict):
    """SYNCHRONOUS majority round: merge incoming (node, label, count)
    cells (all derived from every bucket's OLD labels), new label = argmax
    count with ties -> min label; a node with no messages keeps its label
    (cannot happen on a both-directions edge set, kept for safety). Emits
    the next round's slices from the NEW labels (none on the last round)."""
    import pandas as pd

    nodes = adj["nodes"]
    d = np.concatenate([s["d"] for s in slices]) if slices else np.empty(0, "int64")
    new_lab = lab_old.copy()
    if d.size:
        df = pd.DataFrame(
            {
                "d": d,
                "l": np.concatenate([s["l"] for s in slices]),
                "c": np.concatenate([s["c"] for s in slices]),
            }
        )
        g = df.groupby(["d", "l"], as_index=False)["c"].sum()
        g = g.sort_values(["d", "c", "l"], ascending=[True, False, True])
        win = g.drop_duplicates("d")
        pos = np.searchsorted(nodes, win.d.to_numpy())
        ok = (pos < len(nodes)) & (nodes[np.minimum(pos, len(nodes) - 1)] == win.d.to_numpy())
        new_lab[pos[ok]] = win.l.to_numpy()[ok]
    if last:
        empty = {"d": np.empty(0, "int64"), "l": np.empty(0, "int64"), "c": np.empty(0, "int64")}
        return (new_lab, *[empty] * nb)
    return (new_lab, *_lpa_slices(new_lab, adj["indptr"], adj["neigh"], nb))


@ray.remote
def _lpa_finalize(adj: dict, lab: "np.ndarray") -> "pa.Table":
    return pa.table(
        {
            "node": pa.array(adj["nodes"], pa.int64()),
            "community": pa.array(lab.astype("int64"), pa.int64()),
        }
    )


def label_propagation_mesh(
    edges: "rd.Dataset", rounds: int = 3, num_buckets: int = 16
) -> "rd.Dataset":
    """Synchronous label-propagation community detection on the task mesh
    (the §23/§24 pattern, majority vote instead of PageRank's sum / CC's
    min): adjacency CSR-partitioned ONCE (the only Dataset exchange), then
    ``rounds`` waves of ``num_buckets`` raw tasks exchanging pre-reduced
    (dst, label, count) cells sliced per destination bucket. Deterministic:
    ties break to the LOWEST label, updates are strictly synchronous, so an
    unrolled SQL CTE chain reproduces every round bit-for-bit (q163's
    oracle). Returns (node, community) — community = the surviving label."""
    stash = _EdgeStash.remote()
    nb = num_buckets
    adj_refs = csr_partition(edges, nb, stash)
    buckets = sorted(adj_refs)
    if not buckets:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "community": pa.array([], pa.int64()),
                }
            )
        )
    seed = {
        b: _lpa_seed.options(num_returns=nb + 1).remote(adj_refs[b], nb)
        for b in buckets
    }
    labels = {b: seed[b][0] for b in buckets}
    slices = {b: seed[b][1:] for b in buckets}
    for r in range(rounds):
        last = r == rounds - 1
        nxt = {
            b: _lpa_round.options(num_returns=nb + 1).remote(
                adj_refs[b], labels[b], nb, last, *[slices[sb][b] for sb in buckets]
            )
            for b in buckets
        }
        labels = {b: nxt[b][0] for b in buckets}
        slices = {b: list(nxt[b][1:]) for b in buckets}
    final_refs = [_lpa_finalize.remote(adj_refs[b], labels[b]) for b in buckets]
    ray.wait(final_refs, num_returns=len(final_refs))
    return rd.from_arrow_refs(final_refs)


# --------------------------------------------------- deterministic walks

_WALK_M = 2147483647  # 2^31 - 1: (cur % M) * 48271 stays < 2^62, int64-safe


@ray.remote
def _walk_sorted_adj(adj: dict) -> dict:
    """One-time per-bucket transform: sort each node's neighbor slice by
    dst so ``neigh[indptr[p] + h % deg]`` is a DETERMINISTIC pick that SQL
    reproduces with row_number() OVER (PARTITION BY src ORDER BY dst)."""
    src_rep = np.repeat(adj["nodes"], np.diff(adj["indptr"]))
    order = np.lexsort((adj["neigh"], src_rep))
    return {
        "nodes": adj["nodes"],
        "indptr": adj["indptr"],
        "neigh": adj["neigh"][order],
    }


def _walk_slices(start: "np.ndarray", cur: "np.ndarray", nb: int) -> list:
    gb = cur % nb
    return [
        {"s": start[gb == b2], "c": cur[gb == b2]} for b2 in range(nb)
    ]


@ray.remote
def _walk_seed(adj: dict, nb: int):
    """Every graph node starts one walker at itself."""
    nodes = adj["nodes"]
    return tuple(_walk_slices(nodes, nodes.copy(), nb))


@ray.remote
def _walk_round(adj: dict, step: int, nb: int, last: bool, *slices: dict):
    """Advance every walker currently AT a node this bucket owns:
    next = sorted_neigh[ (cur*48271 + step*12345) % M % deg ]. Walkers
    re-route to their new node's bucket; on the last step they are
    returned as (start, end) pairs instead."""
    start = np.concatenate([s["s"] for s in slices]) if slices else np.empty(0, "int64")
    cur = np.concatenate([s["c"] for s in slices]) if slices else np.empty(0, "int64")
    nodes, indptr, neigh = adj["nodes"], adj["indptr"], adj["neigh"]
    pos = np.searchsorted(nodes, cur)
    # membership guard (the _lpa_round pattern): a walker whose node this
    # bucket does not own — possible only on a DIRECTED edge set, where a
    # node can appear as dst but never src — terminates here, mirroring the
    # SQL chain's inner join on adj (no out-neighbors => dropped walker)
    ok = (pos < len(nodes)) & (nodes[np.minimum(pos, max(len(nodes) - 1, 0))] == cur)
    start, cur, pos = start[ok], cur[ok], pos[ok]
    deg = indptr[pos + 1] - indptr[pos]
    h = (cur % _WALK_M) * 48271 + step * 12345
    idx = (h % _WALK_M) % deg
    nxt = neigh[indptr[pos] + idx]
    if last:
        done = pa.table(
            {
                "start_node": pa.array(start, pa.int64()),
                "end_node": pa.array(nxt.astype("int64"), pa.int64()),
            }
        )
        empty = {"s": np.empty(0, "int64"), "c": np.empty(0, "int64")}
        return (done, *[empty] * nb)
    return (None, *_walk_slices(start, nxt.astype("int64"), nb))


def random_walks_mesh(
    edges: "rd.Dataset", length: int = 3, num_buckets: int = 16
) -> "rd.Dataset":
    """Deterministic fixed-length random walks from EVERY node (the
    corpus-prep step of node2vec/DeepWalk-style graph embeddings, made
    hash-deterministic so a SQL oracle can replay each step; a walker
    reaching a node with no OUT-neighbors — possible only on directed edge
    sets — terminates, mirroring the SQL chain's inner join): adjacency
    CSR-partitioned once with per-node neighbor lists SORTED (one extra
    per-bucket task), then ``length`` mesh rounds where each walker picks
    sorted_neigh[(cur*48271 + step*12345) % (2^31-1) % deg] and re-routes
    to the new node's bucket. Returns (start_node, end_node)."""
    stash = _EdgeStash.remote()
    nb = num_buckets
    adj_refs = csr_partition(edges, nb, stash)
    buckets = sorted(adj_refs)
    if not buckets:
        return rd.from_arrow(
            pa.table(
                {
                    "start_node": pa.array([], pa.int64()),
                    "end_node": pa.array([], pa.int64()),
                }
            )
        )
    sorted_refs = {b: _walk_sorted_adj.remote(adj_refs[b]) for b in buckets}
    seed = {
        b: _walk_seed.options(num_returns=nb).remote(sorted_refs[b], nb)
        for b in buckets
    }
    slices = {b: list(seed[b]) for b in buckets}
    done_refs = []
    for step in range(1, length + 1):
        last = step == length
        nxt = {
            b: _walk_round.options(num_returns=nb + 1).remote(
                sorted_refs[b], step, nb, last, *[slices[sb][b] for sb in buckets]
            )
            for b in buckets
        }
        slices = {b: list(nxt[b][1:]) for b in buckets}
        if last:
            done_refs = [nxt[b][0] for b in buckets]
    ray.wait(done_refs, num_returns=len(done_refs))
    return rd.from_arrow_refs(done_refs)
