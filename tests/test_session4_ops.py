"""Round-3 session-4 operators: interval coverage islands, cohort retention,
BFS hop distance, mode-per-group tie-breaks, exact bit-shift decay.

The sf0.001 DuckDB parity for q79-q83 lives in test_assemble_and_sql_gate's
GATED list; these tests pin the SEMANTICS on hand-built inputs where the
edge cases are visible (touching intervals, unreachable nodes, count ties).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _events_parquet(tmp_path, rows: pd.DataFrame) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(rows.ts.to_numpy().astype("datetime64[us]")),
            "user_id": pa.array(rows.user_id, pa.int64()),
            "event_type": pa.array(rows.get("event_type", ["x"] * len(rows))),
            "value": pa.array(rows.value, pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, d / "events.parquet")
    return str(d)


class TestIntervalCoverage:
    def test_overlap_touch_nest_duplicate(self, ray_session, tmp_path):
        """[0,5)+[3,9) merge; [9,12) touches e==s and merges (half-open
        adjacency); [20,21) separate island; nested and duplicate intervals
        add no new coverage."""
        from medical_ocr_service_ray.pipelines.queries import q79_interval_coverage

        base = np.datetime64("2024-01-01T00:00:00", "us")
        rows = pd.DataFrame(
            {
                "ts": [base + np.timedelta64(s, "s") for s in [0, 3, 9, 20, 1, 0]],
                "user_id": [7, 7, 7, 7, 7, 7],
                "value": [5.0, 6.0, 3.0, 1.0, 2.0, 5.0],  # seconds
            }
        )
        out = q79_interval_coverage(_events_parquet(tmp_path, rows)).to_pandas()
        assert len(out) == 1
        # islands: [0,12) and [20,21) -> 13 s coverage, 2 islands
        assert int(out.covered_us[0]) == 13_000_000
        assert int(out.n_islands[0]) == 2

    def test_users_independent(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q79_interval_coverage

        base = np.datetime64("2024-01-01T00:00:00", "us")
        rows = pd.DataFrame(
            {
                "ts": [base, base, base + np.timedelta64(10, "s")],
                "user_id": [1, 2, 2],
                "value": [1.0, 1.0, 1.0],
            }
        )
        out = (
            q79_interval_coverage(_events_parquet(tmp_path, rows))
            .to_pandas()
            .set_index("user_id")
        )
        assert int(out.loc[1].covered_us) == 1_000_000
        assert int(out.loc[2].covered_us) == 2_000_000
        assert int(out.loc[2].n_islands) == 2


class TestCohortRetention:
    def test_offsets_and_distinctness(self, ray_session, tmp_path):
        """Two users in one cohort week; repeated activity in the same week
        counts once; a later-joining user forms its own cohort."""
        from medical_ocr_service_ray.pipelines.queries import q80_cohort_retention

        wk = np.timedelta64(7 * 86400, "s")
        base = np.datetime64("2024-01-04T00:00:00", "us")  # mid-week, any anchor
        rows = pd.DataFrame(
            {
                "ts": [base, base, base + wk, base + wk, base + wk, base + 2 * wk],
                "user_id": [1, 2, 1, 1, 3, 3],
                "value": [0.0] * 6,
            }
        )
        out = q80_cohort_retention(_events_parquet(tmp_path, rows)).to_pandas()
        got = {
            (int(r.cohort_wk), int(r.week_offset)): int(r.n_users)
            for r in out.itertuples()
        }
        c0 = min(k[0] for k in got)
        # cohort c0: users 1,2 at offset 0; user 1 again at offset 1 (deduped)
        assert got[(c0, 0)] == 2
        assert got[(c0, 1)] == 1
        # user 3 joined one week later: own cohort, active offsets 0 and 1
        assert got[(c0 + 1, 0)] == 1
        assert got[(c0 + 1, 1)] == 1


class TestBfsHops:
    def test_matches_brute_bfs(self, ray_session, tmp_path):
        """Chain + branch graph built from synthetic orders; node beyond 4
        hops is absent; unreachable component absent."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import q81_bfs_hops

        # orders as baskets: co-purchase edges within each basket
        baskets = [
            [1, 2],        # 1-2
            [2, 3],        # 2-3
            [3, 4, 5],     # 3-4, 3-5, 4-5
            [5, 6],        # 5-6
            [6, 7],        # 6-7  -> 7 is 5 hops from 1: must be absent
            [100, 101],    # unreachable island
        ]
        ok, pk = [], []
        for i, b in enumerate(baskets):
            for p in b:
                ok.append(i)
                pk.append(p)
        d = tmp_path / "sf"
        d.mkdir(exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array(ok, pa.int64()),
                    "l_partkey": pa.array(pk, pa.int64()),
                }
            ),
            d / "lineitem.parquet",
        )
        out = q81_bfs_hops(str(d)).to_pandas().set_index("partkey").hops.to_dict()
        assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 3, 6: 4}


class TestModeEventType:
    def test_tie_breaks_lexicographic(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q82_mode_event_type

        base = np.datetime64("2024-01-01T00:00:00", "us")
        rows = pd.DataFrame(
            {
                "ts": [base] * 5,
                "user_id": [1, 1, 1, 1, 2],
                "event_type": ["b", "a", "b", "a", "z"],
                "value": [0.0] * 5,
            }
        )
        out = (
            q82_mode_event_type(_events_parquet(tmp_path, rows))
            .to_pandas()
            .set_index("user_id")
        )
        assert out.loc[1].mode_type == "a" and int(out.loc[1].cnt) == 2
        assert out.loc[2].mode_type == "z" and int(out.loc[2].cnt) == 1


class TestDecayedEngagement:
    def test_exact_bit_shift_weights(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q83_decayed_engagement

        wk = np.timedelta64(7 * 86400, "s")
        newest = np.datetime64("2024-06-01T00:00:00", "us")
        rows = pd.DataFrame(
            {
                # ages 0, 1, 3, 25(clamped to 20) weeks
                "ts": [newest, newest - wk, newest - 3 * wk, newest - 25 * wk],
                "user_id": [9, 9, 9, 9],
                "value": [0.0] * 4,
            }
        )
        out = q83_decayed_engagement(_events_parquet(tmp_path, rows)).to_pandas()
        expect = (1 << 20) + (1 << 19) + (1 << 17) + 1
        assert int(out.decayed[0]) == expect
        assert int(out.n_events[0]) == 4


class TestAucPerType:
    def test_perfect_ties_and_reversed(self, ray_session, tmp_path):
        """Perfect separation -> u2 = 2*n_pos*n_neg (AUC 1); all-equal scores
        -> u2 = n_pos*n_neg (AUC 0.5); reversed separation -> u2 = 0.
        Labels are event_id parity (odd = positive)."""
        from medical_ocr_service_ray.pipelines.queries import q84_auc_per_type

        base = np.datetime64("2024-01-01T00:00:00", "us")
        # type P: positives (odd ids 1,3) score high, negatives (0,2) low
        # type T: everyone scores 5.0
        # type R: positives low, negatives high
        rows = pd.DataFrame(
            {
                "ts": [base] * 12,
                "user_id": list(range(12)),
                "event_type": ["P"] * 4 + ["T"] * 4 + ["R"] * 4,
                "value": [1.0, 9.0, 2.0, 8.0, 5.0, 5.0, 5.0, 5.0, 9.0, 1.0, 8.0, 2.0],
            }
        )
        out = (
            q84_auc_per_type(_events_parquet(tmp_path, rows))
            .to_pandas()
            .set_index("event_type")
        )
        assert int(out.loc["P"].u2) == 2 * 2 * 2
        assert int(out.loc["T"].u2) == 2 * 2
        assert int(out.loc["R"].u2) == 0
        assert int(out.loc["P"].n_pos) == 2 and int(out.loc["P"].n_neg) == 2


class TestLengthDeciles:
    def test_ties_share_bucket(self, ray_session, tmp_path):
        """All-equal lengths land in decile 10 together (cume_dist = 1);
        distinct lengths spread into per-value deciles."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import q85_length_deciles

        d = tmp_path / "sf"
        d.mkdir(exist_ok=True)
        n_chars = [7] * 5 + list(range(100, 105))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(10), pa.int64()),
                    "text": pa.array(["x"] * 10),
                    "lang": pa.array(["en"] * 10),
                    "source": pa.array(["s"] * 10),
                    "n_chars": pa.array(n_chars, pa.int64()),
                }
            ),
            d / "documents.parquet",
        )
        out = q85_length_deciles(str(d)).to_pandas().set_index("decile")
        # the five 7s: cume_dist = 5/10 -> decile 5, all together
        assert int(out.loc[5].n_docs) == 5
        assert int(out.loc[5].min_len) == 7 and int(out.loc[5].max_len) == 7
        # 100..104: cume_dist 6/10..10/10 -> deciles 6..10, one each
        for dec in range(6, 11):
            assert int(out.loc[dec].n_docs) == 1


class TestFkIntegrity:
    def test_planted_orphans(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import q86_fk_integrity

        d = tmp_path / "sf"
        d.mkdir(exist_ok=True)
        pq.write_table(
            pa.table({"c_custkey": pa.array([1, 2], pa.int64())}),
            d / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                    "o_custkey": pa.array([1, 2, 99], pa.int64()),  # 99 orphan
                }
            ),
            d / "orders.parquet",
        )
        pq.write_table(
            pa.table({"p_partkey": pa.array([5], pa.int64())}), d / "part.parquet"
        )
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([10, 77, 12], pa.int64()),  # 77 orphan
                    "l_partkey": pa.array([5, 5, 6], pa.int64()),      # 6 orphan
                }
            ),
            d / "lineitem.parquet",
        )
        out = q86_fk_integrity(str(d)).set_index("edge")
        assert int(out.loc["orders->customer"].n_orphans) == 1
        assert int(out.loc["orders->customer"].n_rows) == 3
        assert int(out.loc["lineitem->orders"].n_orphans) == 1
        assert int(out.loc["lineitem->part"].n_orphans) == 1


class TestUserGapsChurn:
    def test_gap_and_churn_flags(self, ray_session, tmp_path):
        """User 1's max gap is the 3-day hole; user 2 stopped 3 weeks before
        the corpus max -> churned; single-event user has gap 0."""
        from medical_ocr_service_ray.pipelines.queries import q87_user_gaps_churn

        day = np.timedelta64(86400, "s")
        end = np.datetime64("2024-06-30T00:00:00", "us")
        rows = pd.DataFrame(
            {
                "ts": [
                    end - 5 * day, end - 2 * day, end,         # user 1: gaps 3d, 2d
                    end - 23 * day, end - 21 * day,            # user 2: last 3wk ago
                    end - 1 * day,                             # user 3: single event
                ],
                "user_id": [1, 1, 1, 2, 2, 3],
                "value": [0.0] * 6,
            }
        )
        out = (
            q87_user_gaps_churn(_events_parquet(tmp_path, rows))
            .to_pandas()
            .set_index("user_id")
        )
        assert int(out.loc[1].max_gap_us) == 3 * 86400 * 1_000_000
        assert int(out.loc[1].churned) == 0
        assert int(out.loc[2].max_gap_us) == 2 * 86400 * 1_000_000
        assert int(out.loc[2].churned) == 1
        assert int(out.loc[3].max_gap_us) == 0 and int(out.loc[3].n_events) == 1


class TestMadOutliers:
    def test_median_mad_and_outlier_count(self, ray_session, tmp_path):
        """Values 1..7 plus a far outlier 1000: med=4(.5 -> disc lower rule
        picks the (n+1)//2-th), MAD from the deviation histogram, outlier
        beyond 3*MAD counted once."""
        from medical_ocr_service_ray.pipelines.queries import q88_mad_outliers

        base = np.datetime64("2024-01-01T00:00:00", "us")
        vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 1000.0]
        rows = pd.DataFrame(
            {
                "ts": [base] * len(vals),
                "user_id": list(range(len(vals))),
                "event_type": ["A"] * len(vals),
                "value": vals,
            }
        )
        out = q88_mad_outliers(_events_parquet(tmp_path, rows)).to_pandas()
        # quantized by 1e6; n=8 -> (n+1)//2 = 4 -> 4th smallest = 4
        assert int(out.med[0]) == 4_000_000
        # deviations sorted: 0,1e6,1e6,2e6,2e6,3e6,3e6,996e6 -> 4th = 2e6
        assert int(out.mad[0]) == 2_000_000
        # |v-med| > 6e6 -> only 1000.0
        assert int(out.n_outliers[0]) == 1
        assert int(out.n[0]) == 8


class TestDenseWeekGrid:
    def test_zero_weeks_filled(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q89_dense_week_grid

        wk = np.timedelta64(7 * 86400, "s")
        base = np.datetime64("2024-01-04T00:00:00", "us")
        rows = pd.DataFrame(
            {
                # user 1: weeks 0 and 3 active -> grid rows for 0,1,2,3
                # user 2: single week -> one row
                "ts": [base, base, base + 3 * wk, base + wk],
                "user_id": [1, 1, 1, 2],
                "value": [0.0] * 4,
            }
        )
        out = q89_dense_week_grid(_events_parquet(tmp_path, rows)).to_pandas()
        u1 = out[out.user_id == 1].sort_values("wk")
        assert u1.n_events.tolist() == [2, 0, 0, 1]
        assert len(out[out.user_id == 2]) == 1
        assert int(out[out.user_id == 2].n_events.iloc[0]) == 1


class TestIncrementalAggMerge:
    def test_merged_equals_full(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q90_incremental_agg_merge

        base = np.datetime64("2024-01-01T00:00:00", "us")
        rows = pd.DataFrame(
            {
                "ts": [base] * 6,
                "user_id": [1, 1, 1, 2, 2, 3],
                "value": [1.5, 2.25, 3.0, 10.0, 0.5, 7.77],
            }
        )
        out = (
            q90_incremental_agg_merge(_events_parquet(tmp_path, rows))
            .to_pandas()
            .set_index("user_id")
        )
        assert int(out.loc[1].spend_cents) == 150 + 225 + 300
        assert int(out.loc[1].n_events) == 3
        assert int(out.loc[2].spend_cents) == 1050 and int(out.loc[2].n_events) == 2
        assert int(out.loc[3].spend_cents) == 777


class TestRollingWau:
    def test_window_membership_and_horizon_clip(self, ray_session, tmp_path):
        """A user active on day 0 contributes to days 0..6; two activity
        days 10 apart produce two separate 7-day runs; the curve never
        extends past the corpus max day."""
        from medical_ocr_service_ray.pipelines.queries import q92_rolling_wau

        day = np.timedelta64(86400, "s")
        base = np.datetime64("2024-01-01T00:00:00", "us")
        rows = pd.DataFrame(
            {
                "ts": [base, base + 10 * day, base + 12 * day],
                "user_id": [1, 1, 2],
                "value": [0.0] * 3,
            }
        )
        out = q92_rolling_wau(_events_parquet(tmp_path, rows)).to_pandas()
        got = dict(zip(out.day.astype(int), out.wau.astype(int)))
        d0 = min(got)
        # user1: days 0-6 and 10-12 (clipped at corpus max = day 12)
        # user2: day 12 only
        for o in range(0, 7):
            assert got[d0 + o] == 1
        assert (d0 + 7) not in got and (d0 + 8) not in got and (d0 + 9) not in got
        assert got[d0 + 10] == 1 and got[d0 + 11] == 1
        assert got[d0 + 12] == 2
        assert max(got) == d0 + 12


class TestUserSpendTrend:
    def test_exact_slope_fraction(self, ray_session, tmp_path):
        """Linear spend (100, 200, 300 cents over weeks 0,1,2) -> slope
        exactly 100 cents/week: num/den = 600/6."""
        from medical_ocr_service_ray.pipelines.queries import q93_user_spend_trend

        wk = np.timedelta64(7 * 86400, "s")
        base = np.datetime64("2024-01-01T00:00:00", "us")
        rows = pd.DataFrame(
            {
                "ts": [base, base + wk, base + 2 * wk, base],
                "user_id": [1, 1, 1, 2],
                "value": [1.0, 2.0, 3.0, 5.0],
            }
        )
        out = (
            q93_user_spend_trend(_events_parquet(tmp_path, rows))
            .to_pandas()
            .set_index("user_id")
        )
        assert int(out.loc[1].slope_num) == 600 and int(out.loc[1].slope_den) == 6
        # single point: degenerate regression, both terms zero
        assert int(out.loc[2].slope_num) == 0 and int(out.loc[2].slope_den) == 0


class TestLateEvents:
    def test_watermark_lateness(self, ray_session, tmp_path):
        """Arrival order = event_id. Event 3 arrives 2h behind the watermark
        (late by 1h beyond allowance); event 4 only 30min behind (on time)."""
        from medical_ocr_service_ray.pipelines.queries import q94_late_events

        h = np.timedelta64(3600, "s")
        base = np.datetime64("2024-01-01T12:00:00", "us")
        # event_ids are assigned 0..n-1 by the fixture in arrival order
        rows = pd.DataFrame(
            {
                "ts": [base, base + 4 * h, base + 2 * h, base + 4 * h - np.timedelta64(1800, "s")],
                "user_id": [1, 1, 1, 1],
                "value": [0.0] * 4,
            }
        )
        out = q94_late_events(_events_parquet(tmp_path, rows)).to_pandas()
        assert int(out.n_late[0]) == 1
        assert int(out.max_late_us[0]) == 3600 * 1_000_000  # 2h behind - 1h allowance
        assert int(out.n_events[0]) == 4


class TestSortedExport:
    def test_files_sorted_and_range_disjoint(self, ray_session):
        """The driver hash-compare is order-insensitive, so the ORDER
        property q95 exists for is pinned here: every range file is
        internally sorted by (o_orderdate, o_orderkey), ranges are
        key-disjoint and file-name order = key order, so concatenation is
        the exact global ORDER BY. Row parity with the input guards loss."""
        import pyarrow.parquet as pq
        from pathlib import Path

        from medical_ocr_service_ray.pipelines.queries import q95_sorted_export

        sf = "/root/testdata/sf0.001"
        out = q95_sorted_export(sf).to_pandas()
        src = pq.read_table(f"{sf}/orders.parquet", columns=["o_orderkey"])
        assert len(out) == src.num_rows

        files = sorted(Path("/tmp/mosr_q95_sorted/sf0.001").glob("range-*.parquet"))
        assert len(files) > 1
        prev_max = None
        for p in files:
            df = pq.read_table(p).to_pandas()
            keys = list(zip(df.o_orderdate, df.o_orderkey))
            assert keys == sorted(keys)  # internally sorted
            if prev_max is not None:
                assert keys[0] > prev_max  # ranges disjoint + ordered
            prev_max = keys[-1]
        # concatenation in file order == global sort of the returned table
        glob_keys = list(zip(out.o_orderdate, out.o_orderkey))
        assert glob_keys == sorted(glob_keys)


class TestTableChecksums:
    def _write(self, d, orders, lineitem, events):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.Table.from_pandas(orders, preserve_index=False), d / "orders.parquet")
        pq.write_table(pa.Table.from_pandas(lineitem, preserve_index=False), d / "lineitem.parquet")
        pq.write_table(pa.Table.from_pandas(events, preserve_index=False), d / "events.parquet")
        return str(d)

    def _fixtures(self):
        rng = np.random.default_rng(7)
        orders = pd.DataFrame(
            {"o_orderkey": np.arange(50, dtype=np.int64),
             "o_custkey": rng.integers(0, 9, 50).astype(np.int64)}
        )
        lineitem = pd.DataFrame(
            {"l_orderkey": rng.integers(0, 50, 80).astype(np.int64),
             "l_partkey": rng.integers(0, 20, 80).astype(np.int64),
             "l_quantity": rng.integers(1, 40, 80).astype(np.float64)}
        )
        events = pd.DataFrame(
            {"event_id": np.arange(30, dtype=np.int64),
             "user_id": rng.integers(0, 5, 30).astype(np.int64)}
        )
        return orders, lineitem, events

    def test_detects_single_value_flip(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q96_table_checksums

        orders, lineitem, events = self._fixtures()
        a = tmp_path / "a"; a.mkdir()
        base = q96_table_checksums(self._write(a, orders, lineitem, events))

        flipped = lineitem.copy()
        flipped.loc[17, "l_partkey"] += 1
        b = tmp_path / "b"; b.mkdir()
        got = q96_table_checksums(self._write(b, orders, flipped, events))

        base = base.set_index("tbl"); got = got.set_index("tbl")
        assert got.loc["lineitem"].checksum != base.loc["lineitem"].checksum
        assert got.loc["lineitem"].n_rows == base.loc["lineitem"].n_rows
        assert got.loc["orders"].checksum == base.loc["orders"].checksum
        assert got.loc["events"].checksum == base.loc["events"].checksum

    def test_order_and_column_position_sensitivity(self, ray_session, tmp_path):
        """Row order must NOT change the sum (wrapping add is commutative);
        swapping two values BETWEEN columns of one row must (the positional
        multiplier distinguishes (a,b) from (b,a))."""
        from medical_ocr_service_ray.pipelines.queries import q96_table_checksums

        orders, lineitem, events = self._fixtures()
        a = tmp_path / "a"; a.mkdir()
        base = q96_table_checksums(self._write(a, orders, lineitem, events)).set_index("tbl")

        shuffled = lineitem.sample(frac=1.0, random_state=3).reset_index(drop=True)
        b = tmp_path / "b"; b.mkdir()
        got = q96_table_checksums(self._write(b, orders, shuffled, events)).set_index("tbl")
        assert got.loc["lineitem"].checksum == base.loc["lineitem"].checksum

        swapped = orders.copy()
        swapped.loc[5, ["o_orderkey", "o_custkey"]] = (
            orders.loc[5, "o_custkey"], orders.loc[5, "o_orderkey"])
        c = tmp_path / "c"; c.mkdir()
        got2 = q96_table_checksums(self._write(c, swapped, lineitem, events)).set_index("tbl")
        assert got2.loc["orders"].checksum != base.loc["orders"].checksum
