"""Mergeable sketches: HyperLogLog approximate distinct count.

No sketches exist in the reference (SURVEY.md §2.5 notes this); this is the
scale addition for cardinality questions that exact distinct can't answer at
10^12 rows. Pattern (ray_guide): emit ONE serialized sketch per batch inside
``map_batches``, merge the tiny sketches in a final reduce — sketches are
designed to be mergeable, so the shuffle moves KBs, not rows.

Standard HLL (Flajolet et al. 2007 + small-range linear counting
correction), deterministic sha256-derived hashing — results are identical
at any parallelism / batch split because max() is commutative/associative,
and SQL-reproducible because DuckDB ships sha256 (q31's exact oracle).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd


class HllSketch:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """hashes: uint64 array."""
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)  # remaining 64-p bits at the top
        # rank = leading zeros of `rest` + 1, capped at 64-p+1
        ranks = np.full(len(hashes), 64 - self.p + 1, dtype=np.uint8)
        nonzero = rest != 0
        if nonzero.any():
            rz = rest[nonzero]
            # integer bit-length (float log2 is imprecise near 2^k):
            # leading zeros = 63 - bit_length_minus_one
            bl = np.zeros(len(rz), dtype=np.uint8)
            v = rz.copy()
            for shift in (32, 16, 8, 4, 2, 1):
                mask = v >= (np.uint64(1) << np.uint64(shift))
                bl[mask] += shift
                v[mask] >>= np.uint64(shift)
            ranks[nonzero] = (63 - bl) + 1
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HllSketch") -> "HllSketch":
        assert self.p == other.p
        out = HllSketch(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        # register sum as an EXACT integer (sum of 2^(64-M_j), a Python int):
        # the float form sum(2^-M_j) rounds, and its value then depends on
        # summation ORDER — the integer sum is order-free, which is what
        # lets the q31 DuckDB oracle reproduce the estimate bit-for-bit
        vals, cnts = np.unique(self.registers, return_counts=True)
        s = sum(int(c) << (64 - int(r)) for r, c in zip(vals, cnts))
        raw = alpha * m * m * 2.0**64 / float(s)
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros > 0:
            return m * np.log(m / zeros)  # linear counting, small range
        return raw

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HllSketch":
        sk = cls(data[0])
        sk.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return sk


def hash_column(values: list) -> np.ndarray:
    """Deterministic 64-bit hashes of arbitrary values: the first 8 bytes of
    sha256(str(v)) — chosen over blake2b because DuckDB ships sha256(), so
    the whole HLL register build is SQL-reproducible (q31's oracle)."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.sha256(str(v).encode()).digest()[:8], "big")
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def sketch_distinct(ds: "rd.Dataset", col: str, p: int = 12) -> tuple["HllSketch", int]:
    """One HLL per batch -> merged sketch object (for estimate() or further
    set algebra via merge()). Returns (sketch, num_partials)."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        sk = HllSketch(p)
        sk.add_hashes(hash_column(batch[col].to_pylist()))
        return pa.table({"sketch": pa.array([sk.serialize()], pa.binary())})

    partials = ds.map_batches(sketch_batch, batch_format="pyarrow", batch_size=65536).take_all()
    merged = HllSketch(p)
    for row in partials:
        merged = merged.merge(HllSketch.deserialize(row["sketch"]))
    return merged, len(partials)


def approx_distinct(ds: "rd.Dataset", col: str, p: int = 12) -> dict:
    """One HLL per batch -> merge -> estimate. Returns
    {approx_distinct, sketch_bytes, num_partials}."""
    merged, n_parts = sketch_distinct(ds, col, p)
    return {
        "approx_distinct": float(merged.estimate()),
        "sketch_bytes": merged.m,
        "num_partials": n_parts,
    }


class LogHistogramSketch:
    """Mergeable quantile sketch: log-spaced histogram with bounded RELATIVE
    error (gamma-bucket family, the DDSketch idea — Masson et al. 2019,
    public algorithm). bucket(v) = ceil(log(v)/log(gamma)) for v > 0, with a
    dedicated zero bucket; quantile answers are bucket representatives
    (geometric mean of bounds), so any estimate is within a factor
    sqrt(gamma) of the true value. Deterministic, order-independent
    (counts add), and KB-sized: the engine-wide sketch contract."""

    __slots__ = ("gamma", "zero_count", "counts")

    def __init__(self, gamma: float = 1.02):
        self.gamma = gamma
        self.zero_count = 0
        self.counts: dict[int, int] = {}

    def add_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        zeros = v <= 0.0
        self.zero_count += int(zeros.sum())
        pos = v[~zeros]
        if len(pos) == 0:
            return
        buckets = np.ceil(np.log(pos) / np.log(self.gamma)).astype(np.int64)
        uniq, cnt = np.unique(buckets, return_counts=True)
        for b, c in zip(uniq, cnt):
            self.counts[int(b)] = self.counts.get(int(b), 0) + int(c)

    def merge(self, other: "LogHistogramSketch") -> "LogHistogramSketch":
        assert self.gamma == other.gamma
        out = LogHistogramSketch(self.gamma)
        out.zero_count = self.zero_count + other.zero_count
        out.counts = dict(self.counts)
        for b, c in other.counts.items():
            out.counts[b] = out.counts.get(b, 0) + c
        return out

    @property
    def n(self) -> int:
        return self.zero_count + sum(self.counts.values())

    def quantile(self, q: float) -> float:
        """Value at quantile q in [0, 1]; relative error <= sqrt(gamma)-1."""
        total = self.n
        if total == 0:
            return float("nan")
        rank = q * (total - 1)
        if rank < self.zero_count:
            return 0.0
        acc = self.zero_count
        for b in sorted(self.counts):
            acc += self.counts[b]
            if acc > rank:
                # representative: geometric mean of (gamma^(b-1), gamma^b]
                return float(self.gamma ** (b - 0.5))
        return float(self.gamma ** (max(self.counts) - 0.5))  # pragma: no cover

    def serialize(self) -> bytes:
        import json

        return json.dumps(
            {"g": self.gamma, "z": self.zero_count, "c": self.counts}
        ).encode()

    @classmethod
    def deserialize(cls, data: bytes) -> "LogHistogramSketch":
        import json

        rec = json.loads(data)
        sk = cls(rec["g"])
        sk.zero_count = rec["z"]
        sk.counts = {int(k): v for k, v in rec["c"].items()}
        return sk


def approx_quantiles(
    ds: "rd.Dataset", col: str, quantiles: tuple[float, ...] = (0.5, 0.9, 0.99), gamma: float = 1.02
) -> dict:
    """One log-histogram sketch per batch -> KB merge -> quantile estimates
    with <= (sqrt(gamma)-1) relative error. Same shape as approx_distinct."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        sk = LogHistogramSketch(gamma)
        sk.add_values(np.asarray(batch[col].to_numpy(zero_copy_only=False), dtype=np.float64))
        return pa.table({"sketch": pa.array([sk.serialize()], pa.binary())})

    partials = ds.map_batches(sketch_batch, batch_format="pyarrow", batch_size=65536).take_all()
    merged = LogHistogramSketch(gamma)
    for row in partials:
        merged = merged.merge(LogHistogramSketch.deserialize(row["sketch"]))
    return {
        "n": merged.n,
        "num_partials": len(partials),
        **{f"p{int(q * 100)}": merged.quantile(q) for q in quantiles},
    }


class SpaceSavingSketch:
    """SpaceSaving heavy-hitters summary (Metwally et al. 2005), mergeable
    per Agarwal et al. "Mergeable Summaries" (PODS'12): fixed ``capacity``
    counters however large the stream; after any merge tree the estimate
    satisfies ``true <= est <= true + err`` with ``err`` tracked per item,
    and every item with true count > n/capacity is guaranteed present.
    The distributed shape matches HllSketch: one sketch per batch (bounded
    bytes), KB-sized merges — no exchange over the data."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.counts: dict = {}  # item -> (count, overestimate_err)

    def add_counts(self, items, counts) -> None:
        """Bulk-add pre-aggregated (item, count) pairs — the per-batch path
        runs a vectorized value_counts first, so Python cost is per DISTINCT
        item, not per row."""
        for item, c in zip(items, counts):
            c = int(c)
            if item in self.counts:
                cnt, err = self.counts[item]
                self.counts[item] = (cnt + c, err)
            elif len(self.counts) < self.capacity:
                self.counts[item] = (c, 0)
            else:
                # evict the current minimum; its count becomes the new
                # item's overestimate
                evict = min(self.counts, key=lambda i: self.counts[i][0])
                mn = self.counts.pop(evict)[0]
                self.counts[item] = (mn + c, mn)

    def _floor(self) -> int:
        """Max mass any EVICTED item can have in this sketch: the minimum
        counter when full, 0 otherwise (nothing was ever evicted)."""
        if len(self.counts) < self.capacity:
            return 0
        return min(c for c, _ in self.counts.values())

    def merge(self, other: "SpaceSavingSketch") -> "SpaceSavingSketch":
        """Standard mergeable-summaries combine: an item present in only one
        sketch gets the OTHER sketch's floor added to estimate and error
        (its true count there is at most that floor — this is what keeps
        ``true <= est`` through any merge tree), then truncate to the
        top-capacity estimates with a deterministic tiebreak."""
        out = SpaceSavingSketch(self.capacity)
        fa, fb = self._floor(), other._floor()
        combined: dict = {}
        for item, (cnt, err) in self.counts.items():
            if item in other.counts:
                c2, e2 = other.counts[item]
                combined[item] = (cnt + c2, err + e2)
            else:
                combined[item] = (cnt + fb, err + fb)
        for item, (cnt, err) in other.counts.items():
            if item not in self.counts:
                combined[item] = (cnt + fa, err + fa)
        kept = sorted(combined.items(), key=lambda kv: (-kv[1][0], str(kv[0])))
        out.counts = dict(kept[: self.capacity])
        return out

    def items(self) -> list:
        """[(item, est_count, overestimate_err)] sorted by est desc, item."""
        return [
            (i, c, e)
            for i, (c, e) in sorted(
                self.counts.items(), key=lambda kv: (-kv[1][0], str(kv[0]))
            )
        ]

    def serialize(self) -> bytes:
        import json

        return json.dumps(
            {"cap": self.capacity, "c": [[str(i), c, e] for i, (c, e) in self.counts.items()]}
        ).encode()

    @classmethod
    def deserialize(cls, data: bytes) -> "SpaceSavingSketch":
        import json

        rec = json.loads(data)
        sk = cls(rec["cap"])
        sk.counts = {i: (c, e) for i, c, e in rec["c"]}
        return sk


def approx_heavy_hitters(
    ds: "rd.Dataset", col: str, capacity: int = 64, top: int = 10, split=None
) -> "pd.DataFrame":
    """Approximate top-``top`` most frequent values of ``col`` with a
    SpaceSaving sketch per batch merged on the driver (partials are
    capacity-bounded KBs). ``split`` optionally tokenizes each value first
    (regex string) so the column can be raw text. Returns
    (item, est_count, max_overestimate) — ``est - err <= true <= est``."""
    import pandas as pd

    def sketch_batch(df: "pd.DataFrame") -> "pd.DataFrame":
        s = df[col].astype(str)
        vals = s.str.split(split).explode() if split else s
        vals = vals[vals.str.len() > 0]
        vc = vals.value_counts()
        sk = SpaceSavingSketch(capacity)
        sk.add_counts(vc.index.to_numpy(dtype=object), vc.to_numpy())
        return pd.DataFrame({"sketch": [sk.serialize()]})

    partials = ds.map_batches(sketch_batch, batch_format="pandas").take_all()
    merged = SpaceSavingSketch(capacity)
    for row in partials:
        merged = merged.merge(SpaceSavingSketch.deserialize(row["sketch"]))
    rows = merged.items()[:top]
    return pd.DataFrame(
        {
            "item": [r[0] for r in rows],
            "est_count": pd.array([r[1] for r in rows], dtype="int64"),
            "max_overestimate": pd.array([r[2] for r in rows], dtype="int64"),
        }
    )
