"""Round-3 session-3 operators: skyline semilattice, co-purchase pair
bounds, left-outer join null-side, percent-rank edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestSkyline:
    def _brute(self, df):
        keep = []
        for i, a in df.iterrows():
            dominated = False
            for _, b in df.iterrows():
                if (
                    b["mx"] >= a["mx"]
                    and b["mn"] <= a["mn"]
                    and (b["mx"] > a["mx"] or b["mn"] < a["mn"])
                ):
                    dominated = True
                    break
            if not dominated:
                keep.append(i)
        return df.loc[keep]

    def test_matches_brute_force(self):
        from medical_ocr_service_ray.stages.skyline import local_skyline

        rng = np.random.default_rng(4)
        for n in (1, 2, 17, 200):
            df = pd.DataFrame(
                {
                    "id": np.arange(n),
                    "mx": rng.integers(0, 12, n),
                    "mn": rng.integers(0, 12, n),
                }
            )
            got = local_skyline(df, "mx", "mn").sort_values("id")
            want = self._brute(df).sort_values("id")
            assert got.id.tolist() == want.id.tolist()

    def test_duplicates_of_skyline_point_all_survive(self):
        from medical_ocr_service_ray.stages.skyline import local_skyline

        df = pd.DataFrame({"id": [0, 1, 2], "mx": [5, 5, 3], "mn": [1, 1, 9]})
        got = local_skyline(df, "mx", "mn")
        assert sorted(got.id.tolist()) == [0, 1]  # tie kept twice, (3,9) dominated? no
        # (3,9): needs mx>=3, mn<=9, one strict -> (5,1) dominates it
        assert 2 not in got.id.tolist()

    def test_semilattice_partition_invariance(self):
        """skyline(A ∪ B) == skyline(skyline(A) ∪ skyline(B)) — the property
        the distributed plan relies on."""
        from medical_ocr_service_ray.stages.skyline import local_skyline

        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {
                "id": np.arange(300),
                "mx": rng.integers(0, 40, 300),
                "mn": rng.integers(0, 40, 300),
            }
        )
        whole = set(local_skyline(df, "mx", "mn").id)
        for cut in (1, 57, 150, 299):
            a, b = df.iloc[:cut], df.iloc[cut:]
            merged = pd.concat(
                [local_skyline(a, "mx", "mn"), local_skyline(b, "mx", "mn")]
            )
            assert set(local_skyline(merged, "mx", "mn").id) == whole


class TestSession3Queries:
    def test_q71_pair_count_symmetry(self, ray_session):
        """Pair (a,b) is canonical (a<b) and counts match a pandas oracle."""
        from medical_ocr_service_ray.pipelines.queries import q71_copurchase_pairs

        out = q71_copurchase_pairs("/root/testdata/sf0.001")
        assert (out.part_a < out.part_b).all()
        assert out.cnt.is_monotonic_decreasing or (
            out.sort_values(["cnt", "part_a", "part_b"], ascending=[False, True, True])
            .reset_index(drop=True)
            .equals(out)
        )

    def test_q73_keeps_orderless_customers(self, ray_session, tmp_path):
        """The testdata gives every customer orders (left==inner there), so
        the OUTER semantics are exercised on a fabricated mini sf_dir with
        an orderless customer and a dangling order."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import (
            q73_customer_spend_leftjoin,
        )

        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3], pa.int64()),
                    "c_mktsegment": ["A", "B", "A"],
                }
            ),
            str(tmp_path / "customer.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array([1, 1, 99], pa.int64()),  # 99 dangles
                    "o_totalprice": [10.25, 4.75, 7.0],
                }
            ),
            str(tmp_path / "orders.parquet"),
        )
        out = (
            q73_customer_spend_leftjoin(str(tmp_path))
            .to_pandas()
            .sort_values("c_custkey")
            .reset_index(drop=True)
        )
        assert out.c_custkey.tolist() == [1, 2, 3]  # all kept, dangle dropped
        assert out.n_orders.tolist() == [2, 0, 0]
        assert out.spend_cents.tolist() == [1500, 0, 0]

    def test_pagerank_matches_quantized_reference(self, ray_session):
        """3-iteration Ray PageRank == a single-process numpy loop with the
        identical int64 arithmetic, on a small random graph, regardless of
        input block layout."""
        import ray.data as rd

        from medical_ocr_service_ray.stages.pagerank import pagerank_quantized

        rng = np.random.default_rng(13)
        n_nodes = 40
        pairs = set()
        while len(pairs) < 120:
            a, b = sorted(rng.integers(0, n_nodes, 2).tolist())
            if a != b:
                pairs.add((a, b))
        edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        # reference: same quantized arithmetic
        deg = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        r = {s: 1_000_000 for s in deg}
        for _ in range(3):
            acc = {}
            for s, d in edges:
                acc[d] = acc.get(d, 0) + r[s] // deg[s]
            r = {k: 150_000 + (85 * v) // 100 for k, v in acc.items()}

        for nblocks in (1, 7):
            ds = rd.from_pandas(
                np.array_split(
                    pd.DataFrame(edges, columns=["src", "dst"]).astype("int64"),
                    nblocks,
                )
            )
            got = pagerank_quantized(ds, iterations=3, num_buckets=4).to_pandas()
            got_map = dict(zip(got.node, got.r))
            assert got_map == r

    def test_editdist1_join_planted(self, ray_session):
        """Every lev<=1 relation kind is found; distance-2 pairs are not."""
        import ray.data as rd

        from medical_ocr_service_ray.stages.simjoin import editdist1_selfjoin

        names = {
            1: "alpha",   # vs 2: substitution (alphA? no: alpha/alpba)
            2: "alpba",   # lev(alpha, alpba) = 1
            3: "alph",    # deletion of 1
            4: "xalpha",  # insertion at front of 1
            5: "alpha",   # exact duplicate of 1
            6: "omega",   # unrelated
            7: "omeg4x",  # distance 2 from omega
        }
        df = pd.DataFrame(
            {"k": list(names), "s": [names[k] for k in names]}
        ).astype({"k": "int64"})
        out = editdist1_selfjoin(rd.from_pandas(df), "k", "s").to_pandas()
        got = set(zip(out.a_key, out.b_key))
        expected = {(1, 2), (1, 3), (1, 4), (1, 5), (2, 5), (3, 5), (4, 5)}
        assert got == expected

    def test_editdist1_hot_block_cap(self, ray_session):
        """A block larger than max_block is truncated deterministically
        (smallest keys kept) instead of going quadratic."""
        import ray.data as rd

        from medical_ocr_service_ray.stages.simjoin import editdist1_selfjoin

        # 30 identical strings: one block of 30
        df = pd.DataFrame({"k": np.arange(30, dtype="int64"), "s": "same"})
        out = editdist1_selfjoin(
            rd.from_pandas(df), "k", "s", num_buckets=2, max_block=10
        ).to_pandas()
        # only pairs among the 10 smallest keys survive the cap
        assert set(zip(out.a_key, out.b_key)) == {
            (a, b) for a in range(10) for b in range(10) if a < b
        }

    def test_q75_rank_bounds_and_monotone(self, ray_session):
        from medical_ocr_service_ray.pipelines.queries import (
            q75_quantity_percent_rank,
        )

        out = q75_quantity_percent_rank("/root/testdata/sf0.001").to_pandas()
        assert out.pr_micro.between(0, 1_000_000).all()
        assert out.pr_micro.min() == 0
