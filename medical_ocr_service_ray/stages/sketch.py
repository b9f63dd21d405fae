"""Mergeable sketches: HyperLogLog approximate distinct count.

No sketches exist in the reference (SURVEY.md §2.5 notes this); this is the
scale addition for cardinality questions that exact distinct can't answer at
10^12 rows. Pattern (ray_guide): emit ONE serialized sketch per batch inside
``map_batches``, merge the tiny sketches in a final reduce — sketches are
designed to be mergeable, so the shuffle moves KBs, not rows.

Standard HLL (Flajolet et al. 2007 + small-range linear counting
correction), deterministic blake2b hashing — results are identical at any
parallelism / batch split because max() is commutative/associative.
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
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
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
    """Deterministic 64-bit hashes (blake2b) of arbitrary values."""
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big")
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def approx_distinct(ds: "rd.Dataset", col: str, p: int = 12) -> dict:
    """One HLL per batch -> merge -> estimate. Returns
    {approx_distinct, sketch_bytes, num_partials}."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        sk = HllSketch(p)
        sk.add_hashes(hash_column(batch[col].to_pylist()))
        return pa.table({"sketch": pa.array([sk.serialize()], pa.binary())})

    partials = ds.map_batches(sketch_batch, batch_format="pyarrow", batch_size=65536).take_all()
    merged = HllSketch(p)
    for row in partials:
        merged = merged.merge(HllSketch.deserialize(row["sketch"]))
    return {
        "approx_distinct": float(merged.estimate()),
        "sketch_bytes": merged.m,
        "num_partials": len(partials),
    }
