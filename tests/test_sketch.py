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


class TestSpaceSaving:
    """q58: mergeable heavy-hitters with the true<=est<=true+err guarantee."""

    def _stream(self, seed=0, n=20000, vocab=400):
        import numpy as np

        rng = np.random.default_rng(seed)
        # zipf-ish: heavy head + long tail
        z = rng.zipf(1.3, size=n) % vocab
        return [f"tok{v}" for v in z]

    def _exact(self, items):
        from collections import Counter

        return Counter(items)

    def _tree_merge(self, items, capacity, chunks):
        from medical_ocr_service_ray.stages.sketch import SpaceSavingSketch
        import numpy as np

        parts = np.array_split(np.array(items, dtype=object), chunks)
        sketches = []
        for p in parts:
            sk = SpaceSavingSketch(capacity)
            vals, counts = np.unique(p.astype(str), return_counts=True)
            sk.add_counts(vals.astype(object), counts)
            sketches.append(sk)
        while len(sketches) > 1:  # pairwise tree, like a distributed reduce
            nxt = [a.merge(b) for a, b in zip(sketches[::2], sketches[1::2])]
            if len(sketches) % 2:
                nxt.append(sketches[-1])
            sketches = nxt
        return sketches[0]

    def test_bounds_after_tree_merge(self):
        items = self._stream()
        exact = self._exact(items)
        sk = self._tree_merge(items, capacity=128, chunks=9)
        for item, est, err in sk.items():
            true = exact[item]
            assert true <= est, f"{item}: est {est} < true {true}"
            assert est - err <= true, f"{item}: est-err {est - err} > true {true}"

    def test_heavy_items_guaranteed_present(self):
        items = self._stream(seed=3)
        exact = self._exact(items)
        cap = 128
        sk = self._tree_merge(items, capacity=cap, chunks=7)
        present = {i for i, _, _ in sk.items()}
        threshold = len(items) / cap
        for item, true in exact.items():
            if true > threshold:
                assert item in present, f"heavy item {item} (n={true}) evicted"

    def test_single_sketch_is_exact_under_capacity(self):
        from medical_ocr_service_ray.stages.sketch import SpaceSavingSketch

        sk = SpaceSavingSketch(16)
        sk.add_counts(["a", "b", "a", "c"], [3, 1, 2, 4])
        got = {i: (c, e) for i, c, e in sk.items()}
        assert got == {"a": (5, 0), "c": (4, 0), "b": (1, 0)}

    def test_serialize_roundtrip(self):
        from medical_ocr_service_ray.stages.sketch import SpaceSavingSketch

        sk = self._tree_merge(self._stream(seed=5, n=2000), capacity=32, chunks=4)
        back = SpaceSavingSketch.deserialize(sk.serialize())
        assert back.capacity == sk.capacity and back.counts == sk.counts

    def test_distributed_matches_guarantees(self, ray_session):
        import pandas as pd
        import ray.data as rd
        from collections import Counter

        from medical_ocr_service_ray.stages.sketch import approx_heavy_hitters

        items = self._stream(seed=8, n=8000, vocab=200)
        docs = [" ".join(items[i : i + 40]) for i in range(0, len(items), 40)]
        ds = rd.from_pandas(pd.DataFrame({"text": docs})).repartition(5)
        out = approx_heavy_hitters(ds, "text", capacity=96, top=10, split=r"\s+")
        exact = Counter(items)
        true_top = exact.most_common(1)[0][0]
        assert out.item.iloc[0] == true_top  # dominant token always wins
        for _, row in out.iterrows():
            true = exact[row["item"]]
            assert true <= row.est_count <= true + row.max_overestimate
