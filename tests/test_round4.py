"""Round-4 session-1: mega-basket cap for pair mining (VERDICT r3 ask #9) and
q112 bounded n_orders (ask #1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestMegaBasketCap:
    def test_drop_mega_baskets_unit(self):
        from medical_ocr_service_ray.pipelines.queries import (
            _MAX_BASKET,
            _drop_mega_baskets,
        )

        big = pd.DataFrame(
            {
                "l_orderkey": np.repeat(1, _MAX_BASKET + 1),
                "l_partkey": np.arange(_MAX_BASKET + 1),
            }
        )
        small = pd.DataFrame({"l_orderkey": [2, 2, 3], "l_partkey": [10, 11, 12]})
        out = _drop_mega_baskets(pd.concat([big, small]), "test")
        assert set(out.l_orderkey) == {2, 3}
        assert len(out) == 3
        # under the cap: untouched
        out2 = _drop_mega_baskets(small.copy(), "test")
        assert out2.equals(small)

    def test_q71_planted_mega_basket_matches_capped_oracle(
        self, ray_session, tmp_path
    ):
        """One pathological 1500-line order must not enter pair mining (its
        pair expansion alone would be ~1.1M rows in one task); the capped SQL
        oracle (HAVING COUNT(*) <= 1000) must agree bit-for-bit."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import (
            _Q71_SQL,
            q71_copurchase_pairs,
        )

        rng = np.random.default_rng(7)
        norm_orders = np.repeat(np.arange(100, 160), 4)
        norm_parts = rng.integers(0, 30, norm_orders.size)
        mega_order = np.repeat(1, 1500)
        mega_parts = np.arange(1500)
        li = pa.table(
            {
                "l_orderkey": np.concatenate([norm_orders, mega_order]).astype(
                    "int64"
                ),
                "l_partkey": np.concatenate([norm_parts, mega_parts]).astype("int64"),
            }
        )
        pq.write_table(li, tmp_path / "lineitem.parquet")

        got = (
            q71_copurchase_pairs(str(tmp_path))
            .sort_values(["cnt", "part_a", "part_b"], ascending=[False, True, True])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM '{tmp_path}/lineitem.parquet'"
        )
        exp = con.execute(_Q71_SQL).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[exp.columns].astype("int64"), exp.astype("int64")
        )
        # the mega basket's parts never appear as a pair
        assert not ((got.part_a >= 30) | (got.part_b >= 30)).any()


class TestQ112BoundedNOrders:
    def test_n_orders_matches_exact_distinct(self, ray_session):
        """q112's n_orders now arrives as <=num_buckets per-bucket distinct
        counts, never the distinct keys themselves — value must equal the
        exact COUNT(DISTINCT l_orderkey)."""
        import duckdb

        from medical_ocr_service_ray.pipelines.queries import (
            q112_association_rules,
        )

        sf = "/root/testdata/sf0.001"
        out = q112_association_rules(sf)
        exp = (
            duckdb.connect()
            .execute(
                f"SELECT COUNT(DISTINCT l_orderkey) FROM '{sf}/lineitem.parquet'"
            )
            .fetchone()[0]
        )
        assert (out.n_orders == exp).all()
