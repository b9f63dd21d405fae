"""Bloom-filter large-large semi/anti join (stages/bloom.py): the filter's
no-false-negative guarantee (what makes the pre-filter EXACT-safe), the FPR
sizing, and end-to-end equivalence of the joined result to a plain set-based
semi/anti join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestBloomFilterCore:
    def test_no_false_negatives(self):
        from medical_ocr_service_ray.stages.bloom import (
            _bit_positions,
            _set_bits,
            _test_bits,
            bloom_params,
        )

        rng = np.random.default_rng(5)
        keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
        m, k = bloom_params(len(keys), fpr=0.01)
        bitmap = np.zeros(m // 8, dtype=np.uint8)
        _set_bits(bitmap, _bit_positions(keys, m, k))
        assert _test_bits(bitmap, _bit_positions(keys, m, k)).all()

    def test_fpr_near_target(self):
        from medical_ocr_service_ray.stages.bloom import (
            _bit_positions,
            _set_bits,
            _test_bits,
            bloom_params,
        )

        rng = np.random.default_rng(9)
        members = rng.integers(0, 2**40, size=10000, dtype=np.int64)
        m, k = bloom_params(len(members), fpr=0.01)
        bitmap = np.zeros(m // 8, dtype=np.uint8)
        _set_bits(bitmap, _bit_positions(members, m, k))
        # disjoint probe population
        probes = rng.integers(2**41, 2**42, size=20000, dtype=np.int64)
        fpr = _test_bits(bitmap, _bit_positions(probes, m, k)).mean()
        assert fpr < 0.03  # target 1%, generous noise margin

    def test_params_monotone(self):
        from medical_ocr_service_ray.stages.bloom import bloom_params

        m1, _ = bloom_params(1000, fpr=0.01)
        m2, _ = bloom_params(100000, fpr=0.01)
        m3, _ = bloom_params(1000, fpr=0.0001)
        assert m2 > m1 and m3 > m1
        assert m1 % 8 == 0 and m2 % 8 == 0

    def test_deterministic_across_chunking(self):
        from medical_ocr_service_ray.stages.bloom import _bit_positions

        keys = np.arange(-50, 50, dtype=np.int64)
        a = _bit_positions(keys, 1 << 16, 5)
        b = np.concatenate([_bit_positions(keys[:30], 1 << 16, 5), _bit_positions(keys[30:], 1 << 16, 5)])
        assert (a == b).all()


class TestDistributedBuild:
    def test_merged_bloom_equals_single_shot(self, ray_session):
        import ray.data as rd

        from medical_ocr_service_ray.stages.bloom import (
            _bit_positions,
            _set_bits,
            bloom_params,
            build_bloom,
        )

        rng = np.random.default_rng(3)
        keys = rng.integers(0, 2**40, size=3000, dtype=np.int64)
        m, k = bloom_params(len(keys), fpr=0.01)
        ds = rd.from_pandas(pd.DataFrame({"key": keys})).repartition(5)
        got = np.frombuffer(build_bloom(ds, "key", m, k), dtype=np.uint8)
        exp = np.zeros(m // 8, dtype=np.uint8)
        _set_bits(exp, _bit_positions(keys, m, k))
        assert (got == exp).all()


class TestBloomSemiJoin:
    def _sides(self, seed=1, n_probe=2000, n_build=300):
        rng = np.random.default_rng(seed)
        probe = pd.DataFrame(
            {
                "key": rng.integers(0, 1000, size=n_probe).astype("int64"),
                "payload": rng.integers(0, 10**6, size=n_probe).astype("int64"),
                "label": [f"row{i}" for i in range(n_probe)],
            }
        )
        build = pd.DataFrame({"key": rng.integers(0, 1000, size=n_build).astype("int64")})
        return probe, build

    def _run(self, probe, build, anti, num_buckets=4, fpr=0.01, n_est=None):
        import ray.data as rd

        from medical_ocr_service_ray.stages.bloom import bloom_semi_join

        out = bloom_semi_join(
            rd.from_pandas(probe).repartition(4),
            rd.from_pandas(build).repartition(3),
            "key",
            n_build_keys=n_est if n_est is not None else build.key.nunique(),
            anti=anti,
            fpr=fpr,
            num_buckets=num_buckets,
        ).to_pandas()
        return out.sort_values(["key", "payload", "label"]).reset_index(drop=True)

    def _expected(self, probe, build, anti):
        member = probe.key.isin(set(build.key))
        out = probe[~member] if anti else probe[member]
        return out.sort_values(["key", "payload", "label"]).reset_index(drop=True)

    @pytest.mark.parametrize("anti", [False, True])
    def test_equals_exact_set_join(self, ray_session, anti):
        probe, build = self._sides()
        got = self._run(probe, build, anti)
        exp = self._expected(probe, build, anti)
        pd.testing.assert_frame_equal(got, exp)
        # dtypes survive the union's null-padding upcast
        assert str(got.payload.dtype) == "int64"

    @pytest.mark.parametrize("anti", [False, True])
    def test_exact_even_with_terrible_fpr(self, ray_session, anti):
        """An undersized filter (high FPR) must only cost performance —
        the exact membership pass keeps the result identical."""
        probe, build = self._sides(seed=2)
        got = self._run(probe, build, anti, fpr=0.5, n_est=10)
        pd.testing.assert_frame_equal(got, self._expected(probe, build, anti))

    def test_bucket_count_invariant(self, ray_session):
        probe, build = self._sides(seed=4)
        a = self._run(probe, build, anti=False, num_buckets=2)
        b = self._run(probe, build, anti=False, num_buckets=7)
        pd.testing.assert_frame_equal(a, b)

    def test_semi_anti_partition_probe(self, ray_session):
        probe, build = self._sides(seed=6)
        semi = self._run(probe, build, anti=False)
        anti = self._run(probe, build, anti=True)
        assert len(semi) + len(anti) == len(probe)
        assert set(semi.label).isdisjoint(anti.label)
