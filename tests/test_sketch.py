"""HLL sketch: accuracy vs exact distinct, merge associativity, determinism
under any batch split (the mergeable-sketch contract)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from medical_ocr_service_ray.stages.sketch import HllSketch, approx_distinct, hash_column


class TestHllCore:
    def test_accuracy_within_bound(self):
        # p=12 -> typical error ~1.04/sqrt(4096) ~ 1.6%; assert < 5%
        for true_n in (100, 5_000, 100_000):
            sk = HllSketch(12)
            sk.add_hashes(hash_column([f"user-{i}" for i in range(true_n)]))
            est = sk.estimate()
            assert abs(est - true_n) / true_n < 0.05, (true_n, est)

    def test_duplicates_dont_inflate(self):
        sk = HllSketch(12)
        values = [f"u-{i % 500}" for i in range(50_000)]
        sk.add_hashes(hash_column(values))
        assert abs(sk.estimate() - 500) / 500 < 0.05

    def test_merge_equals_single_pass(self):
        values = [f"item-{i}" for i in range(20_000)]
        whole = HllSketch(12)
        whole.add_hashes(hash_column(values))
        # any split + merge must give IDENTICAL registers (max is associative)
        for split in (3, 7, 1000):
            merged = HllSketch(12)
            for chunk in np.array_split(np.array(values), split):
                part = HllSketch(12)
                part.add_hashes(hash_column(list(chunk)))
                merged = merged.merge(part)
            assert (merged.registers == whole.registers).all()
            assert merged.estimate() == whole.estimate()

    def test_serialize_roundtrip(self):
        sk = HllSketch(10)
        sk.add_hashes(hash_column(list(range(1000))))
        rt = HllSketch.deserialize(sk.serialize())
        assert rt.p == sk.p and (rt.registers == sk.registers).all()


class TestDistributed:
    def test_matches_exact_within_bound(self, ray_session):
        import ray.data as rd

        n_users = 150
        t = pa.table({"user_id": pa.array([i % n_users for i in range(30_000)], pa.int64())})
        res = approx_distinct(rd.from_arrow(t), "user_id")
        assert abs(res["approx_distinct"] - n_users) / n_users < 0.05
        assert res["num_partials"] >= 1

    def test_estimate_independent_of_batching(self, ray_session):
        import ray.data as rd

        t = pa.table({"k": pa.array([f"k{i}" for i in range(10_000)], pa.string())})
        a = approx_distinct(rd.from_arrow(t), "k")["approx_distinct"]
        b = approx_distinct(rd.from_arrow(t).repartition(13), "k")["approx_distinct"]
        assert a == b  # identical, not just close: merged registers are equal
