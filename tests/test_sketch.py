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


class TestLogHistogramQuantiles:
    def test_relative_error_bound(self, ray_session):
        import numpy as np
        import pyarrow as pa

        import ray.data as rd

        from medical_ocr_service_ray.stages.sketch import approx_quantiles

        rng = np.random.default_rng(21)
        vals = np.concatenate([rng.lognormal(3, 1.5, 20000), np.zeros(50)])
        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
        res = approx_quantiles(ds, "v", quantiles=(0.5, 0.9, 0.99), gamma=1.02)
        assert res["n"] == len(vals)
        tol = 1.02 ** 0.5 - 1 + 0.01  # bucket bound + quantile-rank discreteness
        for q in (50, 90, 99):
            exact = float(np.quantile(vals, q / 100))
            got = res[f"p{q}"]
            assert abs(got - exact) / exact <= tol * 2, (q, got, exact)

    def test_split_invariance(self, ray_session):
        import numpy as np
        import pyarrow as pa

        import ray.data as rd

        from medical_ocr_service_ray.stages.sketch import approx_quantiles

        rng = np.random.default_rng(4)
        vals = rng.exponential(100, 5000)
        t = pa.table({"v": pa.array(vals, pa.float64())})
        a = approx_quantiles(rd.from_arrow(t), "v")
        b = approx_quantiles(rd.from_arrow(t).repartition(13), "v")
        for k in ("p50", "p90", "p99", "n"):
            assert a[k] == b[k], k

    def test_merge_equals_single(self):
        import numpy as np

        from medical_ocr_service_ray.stages.sketch import LogHistogramSketch

        rng = np.random.default_rng(9)
        vals = rng.lognormal(2, 1, 4000)
        one = LogHistogramSketch(); one.add_values(vals)
        a = LogHistogramSketch(); a.add_values(vals[:1500])
        b = LogHistogramSketch(); b.add_values(vals[1500:])
        m = a.merge(b)
        assert m.counts == one.counts and m.zero_count == one.zero_count
        assert m.quantile(0.5) == one.quantile(0.5)
