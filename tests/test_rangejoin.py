"""Range-join stages (stages/rangejoin.py): window-boundary inclusion,
bucket-boundary probe fan-out, and empty-side handling — planted data with
hand-computed expectations."""

from __future__ import annotations

import pandas as pd
import pytest


def _ds(df):
    import ray.data as rd

    return rd.from_pandas(df)


class TestKeyedRangeJoin:
    def test_window_boundaries_and_left_semantics(self, ray_session):
        from medical_ocr_service_ray.stages.rangejoin import range_join_orders_lineitem

        d0 = pd.Timestamp("2024-01-01")
        orders = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3],
                "o_orderdate": [d0, d0 + pd.Timedelta(days=10), d0],
            }
        )
        # key 1: ship at d0 (included, window is closed-left), at d0+89d
        # (included), at d0+90d (EXCLUDED, open-right), before d0 (excluded).
        # key 2: one in-window row. key 3: no lineitems at all (LEFT row).
        lineitem = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 1, 1, 2],
                "l_shipdate": [
                    d0,
                    d0 + pd.Timedelta(days=89),
                    d0 + pd.Timedelta(days=90),
                    d0 - pd.Timedelta(seconds=1),
                    d0 + pd.Timedelta(days=11),
                ],
                "l_extendedprice": [10.0, 20.0, 40.0, 80.0, 5.0],
                "l_discount": [0.0, 0.5, 0.0, 0.0, 0.2],
            }
        )
        out = (
            range_join_orders_lineitem(_ds(orders), _ds(lineitem), num_buckets=4)
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        assert list(out.o_orderkey) == [1, 2, 3]
        assert list(out.n_shipped_90d) == [2, 1, 0]
        # rev4 = cents(price) * cents(1-discount)
        assert list(out.rev4_90d) == [1000 * 100 + 2000 * 50, 500 * 80, 0]

    def test_duplicate_ship_ts_ties(self, ray_session):
        """Several lineitems at the SAME (key, ts): the cumulative trick must
        count the whole tie group, not just the last row."""
        from medical_ocr_service_ray.stages.rangejoin import range_join_orders_lineitem

        d0 = pd.Timestamp("2024-06-01")
        orders = pd.DataFrame({"o_orderkey": [7], "o_orderdate": [d0]})
        lineitem = pd.DataFrame(
            {
                "l_orderkey": [7, 7, 7],
                "l_shipdate": [d0 + pd.Timedelta(days=1)] * 3,
                "l_extendedprice": [1.0, 2.0, 3.0],
                "l_discount": [0.0, 0.0, 0.0],
            }
        )
        out = range_join_orders_lineitem(_ds(orders), _ds(lineitem), num_buckets=2).to_pandas()
        assert int(out.n_shipped_90d.iloc[0]) == 3
        assert int(out.rev4_90d.iloc[0]) == (100 + 200 + 300) * 100


class TestBandJoin:
    def test_band_inclusive_and_bucket_crossing(self, ray_session):
        from medical_ocr_service_ray.stages.rangejoin import band_join_events

        band_s = 10
        width = pd.Timedelta(seconds=2 * band_s)
        t0 = pd.Timestamp("2024-01-01")
        # probe sits 1s before a bucket boundary; neighbors live in the NEXT
        # bucket — only the +/-1 fan-out finds them.
        probe_ts = t0 + width - pd.Timedelta(seconds=1)
        rows = [
            ("purchase", probe_ts, 100),
            ("view", probe_ts - pd.Timedelta(seconds=band_s), 1),  # exactly -band: in
            ("view", probe_ts + pd.Timedelta(seconds=band_s), 2),  # exactly +band: in
            ("view", probe_ts + pd.Timedelta(seconds=band_s + 1), 3),  # out
            ("view", probe_ts - pd.Timedelta(seconds=band_s + 1), 4),  # out
            ("view", probe_ts + pd.Timedelta(seconds=2), 5),  # next bucket: in
        ]
        events = pd.DataFrame(
            {
                "event_id": [r[2] for r in rows],
                "ts": [r[1] for r in rows],
                "event_type": [r[0] for r in rows],
            }
        )
        out = band_join_events(
            _ds(events), band_seconds=band_s, probe_type="purchase", num_buckets=4
        ).to_pandas()
        assert len(out) == 1
        # self + ids 1, 2, 5
        assert int(out.n_nearby.iloc[0]) == 4

    def test_randomized_vs_bruteforce(self, ray_session):
        """200 random events x 3 seeds against an O(n^2) pandas oracle —
        catches alignment/off-by-one bugs the planted cases can't."""
        import numpy as np

        from medical_ocr_service_ray.stages.rangejoin import band_join_events

        for seed in (1, 2, 3):
            rng = np.random.default_rng(seed)
            n = 200
            t0 = pd.Timestamp("2024-03-01").value // 1000  # us
            ts_us = t0 + rng.integers(0, 3_000_000_000, size=n)  # 50 min span
            types = rng.choice(["purchase", "view", "click"], size=n)
            events = pd.DataFrame(
                {
                    "event_id": np.arange(n, dtype="int64"),
                    "ts": pd.to_datetime(ts_us, unit="us"),
                    "event_type": types,
                }
            )
            band_s = int(rng.integers(5, 120))
            got = (
                band_join_events(
                    _ds(events), band_seconds=band_s, probe_type="purchase", num_buckets=5
                )
                .to_pandas()
                .sort_values("event_id")
                .reset_index(drop=True)
            )
            band_us = band_s * 1_000_000
            probes = events[events.event_type == "purchase"]
            want = pd.DataFrame(
                {
                    "event_id": probes.event_id.to_numpy(),
                    "n_nearby": [
                        int(((ts_us >= p - band_us) & (ts_us <= p + band_us)).sum())
                        for p in ts_us[probes.index.to_numpy()]
                    ],
                }
            ).sort_values("event_id").reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_hot_chunk_all_events_in_one_band(self, ray_session):
        """Extreme time skew: every event inside ONE band width — each probe
        matches everything. The count path must stay O(n log n) (searchsorted
        over the chunk), never materialize the n^2 pairs."""
        import numpy as np

        from medical_ocr_service_ray.stages.rangejoin import band_join_events

        rng = np.random.default_rng(11)
        n = 500
        t0 = pd.Timestamp("2024-05-01").value // 1000
        ts_us = t0 + rng.integers(0, 30_000_000, size=n)  # all within 30s
        events = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype="int64"),
                "ts": pd.to_datetime(ts_us, unit="us"),
                "event_type": np.where(np.arange(n) % 5 == 0, "purchase", "view"),
            }
        )
        out = band_join_events(
            _ds(events), band_seconds=120, probe_type="purchase", num_buckets=4
        ).to_pandas()
        assert len(out) == (n + 4) // 5
        assert (out.n_nearby == n).all()  # every probe sees every event

    def test_randomized_keyed_vs_bruteforce(self, ray_session):
        import numpy as np

        from medical_ocr_service_ray.stages.rangejoin import range_join_orders_lineitem

        rng = np.random.default_rng(7)
        n_orders, n_lines = 60, 400
        d0 = pd.Timestamp("2024-01-01")
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(n_orders, dtype="int64"),
                "o_orderdate": d0 + pd.to_timedelta(rng.integers(0, 200, n_orders), unit="D"),
            }
        )
        lineitem = pd.DataFrame(
            {
                "l_orderkey": rng.integers(0, n_orders, n_lines).astype("int64"),
                "l_shipdate": d0 + pd.to_timedelta(rng.integers(0, 300, n_lines), unit="D"),
                "l_extendedprice": rng.integers(1, 1000, n_lines) / 10.0,
                "l_discount": rng.integers(0, 50, n_lines) / 100.0,
            }
        )
        got = (
            range_join_orders_lineitem(_ds(orders), _ds(lineitem), num_buckets=4)
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        m = orders.merge(lineitem, left_on="o_orderkey", right_on="l_orderkey")
        inwin = m[
            (m.l_shipdate >= m.o_orderdate)
            & (m.l_shipdate < m.o_orderdate + pd.Timedelta(days=90))
        ].copy()
        inwin["rev4"] = (inwin.l_extendedprice * 100).round().astype("int64") * (
            (1 - inwin.l_discount) * 100
        ).round().astype("int64")
        agg = inwin.groupby("o_orderkey").agg(
            n_shipped_90d=("l_orderkey", "size"), rev4_90d=("rev4", "sum")
        )
        want = (
            agg.reindex(orders.o_orderkey, fill_value=0)
            .reset_index()
            .astype({"n_shipped_90d": "int64", "rev4_90d": "int64"})
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_no_probes_yields_empty(self, ray_session):
        from medical_ocr_service_ray.stages.rangejoin import band_join_events

        events = pd.DataFrame(
            {
                "event_id": [1, 2],
                "ts": [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-02")],
                "event_type": ["view", "view"],
            }
        )
        out = band_join_events(_ds(events), band_seconds=60, probe_type="purchase").to_pandas()
        assert len(out) == 0
