"""Round-3 session-5 operators: merge-patch CDC apply (q97), SCD2 validity
intervals (q98), deterministic bottom-k uniform sample (q99), sorted export
(q95, order property in test_session4_ops).

The sf0.01/sf0.1 DuckDB oracle is the value gate; these tests pin the edge
semantics on hand-built logs where the cases are visible (delete-then-patch
ordering, tombstone-last users, equal-ts ties, single-event islands) and —
for q97 — force MANY partial batches so the associative reduce is exercised
(the sf tables fit in one 65536-row batch, so the oracle runs alone never
split the log)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _events_parquet(tmp_path, rows: pd.DataFrame) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    t = pa.table(
        {
            "event_id": pa.array(rows.event_id.to_numpy(), pa.int64()),
            "ts": pa.array(rows.ts.to_numpy().astype("datetime64[us]")),
            "user_id": pa.array(rows.user_id, pa.int64()),
            "event_type": pa.array(rows.get("event_type", ["x"] * len(rows))),
            "value": pa.array(rows.get("value", [0.0] * len(rows)), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, d / "events.parquet")
    return str(d)


def _ts(hours):
    base = np.datetime64("2024-03-01T00:00:00", "us")
    return [base + np.timedelta64(int(h * 3600), "s") for h in np.atleast_1d(hours)]


class TestCdcMergePatch:
    """event_id % 11 == 0 -> tombstone; cents patch iff id % 3 != 0;
    type patch iff id % 2 == 0."""

    def test_delete_ordering_semantics(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q97_cdc_merge_patch

        rows = pd.DataFrame(
            {
                # user 1: patch(cents+type, id=2) .. DELETE(id=11) .. patch(cents only, id=13)
                #   -> survives; last_cents from id=13, last_type cleared by the delete
                # user 2: patches then DELETE last (id=22) -> dropped entirely
                # user 3: never deleted, type-only last patch (id=4)
                "event_id": [2, 11, 13, 5, 22, 4, 8],
                "ts": _ts([1, 2, 3, 1, 2, 1, 2]),
                "user_id": [1, 1, 1, 2, 2, 3, 3],
                "event_type": ["a", "del", "b", "c", "del", "d", "e"],
                "value": [1.0, 0.0, 2.0, 3.0, 0.0, 4.0, 5.0],
            }
        )
        out = (
            q97_cdc_merge_patch(_events_parquet(tmp_path, rows))
            .to_pandas()
            .set_index("user_id")
            .sort_index()
        )
        assert list(out.index) == [1, 3]
        # id=13: 13%3!=0 -> cents=200; 13%2!=0 -> no type patch, and the
        # pre-delete type 'a' must NOT leak through the tombstone
        assert int(out.loc[1].last_cents) == 200
        assert out.loc[1].last_type == ""
        # user 3: id=8 patches both (8%3!=0, 8%2==0)
        assert int(out.loc[3].last_cents) == 500
        assert out.loc[3].last_type == "e"

    def test_partial_combine_associativity(self, ray_session, tmp_path):
        """Split a 400-row log into 7-row batches: the partial->combine chain
        must equal the single-pass answer (computed via one giant batch)."""
        from medical_ocr_service_ray.pipelines.queries import q97_cdc_merge_patch

        rng = np.random.default_rng(11)
        n = 400
        rows = pd.DataFrame(
            {
                "event_id": np.arange(1, n + 1),
                "ts": _ts(rng.integers(0, 50, n)),
                "user_id": rng.integers(0, 12, n),
                "event_type": rng.choice(["a", "b", "c"], n),
                "value": rng.uniform(0, 9, n).round(2),
            }
        )
        sf = _events_parquet(tmp_path, rows)
        tiny = q97_cdc_merge_patch(sf, batch_size=7).to_pandas()
        one = q97_cdc_merge_patch(sf, batch_size=1 << 20).to_pandas()
        key = ["user_id"]
        tiny = tiny.sort_values(key).reset_index(drop=True)
        one = one.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(tiny, one)


class TestScd2Intervals:
    def test_collapse_ties_and_sentinel(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q98_scd2_intervals

        rows = pd.DataFrame(
            {
                # user 1: a,a,b,a -> three islands; the two ts=2 events tie,
                # event_id order (3 then 4) makes the run a,a,[b,b],a? no:
                # ids 1,2 at ts 0,1 are 'a'; ids 3,4 at ts 2 are 'b','a'
                "event_id": [1, 2, 3, 4, 9],
                "ts": _ts([0, 1, 2, 2, 0]),
                "user_id": [1, 1, 1, 1, 2],
                "event_type": ["a", "a", "b", "a", "z"],
            }
        )
        out = q98_scd2_intervals(_events_parquet(tmp_path, rows)).to_pandas()
        u1 = out[out.user_id == 1].sort_values("valid_from").reset_index(drop=True)
        assert list(u1.event_type) == ["a", "b", "a"]
        assert list(u1.n_events) == [2, 1, 1]
        # intervals chain: each valid_to == next valid_from
        assert list(u1.valid_to[:-1]) == list(u1.valid_from[1:])
        assert u1.valid_to.iloc[-1] == pd.Timestamp("2100-01-01")
        u2 = out[out.user_id == 2]
        assert len(u2) == 1 and u2.valid_to.iloc[0] == pd.Timestamp("2100-01-01")


class TestUniformSample:
    def test_equals_bruteforce_bottomk(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import q99_uniform_sample

        d = tmp_path / "sf"
        d.mkdir()
        ids = np.arange(0, 5000, 3, dtype=np.int64)  # 1667 docs
        pq.write_table(
            pa.table({"doc_id": ids, "text": [""] * len(ids)}), d / "documents.parquet"
        )
        out = q99_uniform_sample(str(d))
        h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
        brute = (
            pd.DataFrame({"doc_id": ids, "h": h.astype(np.int64)})
            .nsmallest(100, ["h", "doc_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, brute)


class TestTriangleCount:
    def _lineitem(self, tmp_path, orders: list[list[int]]) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / "sf"
        d.mkdir(exist_ok=True)
        ok, pk = [], []
        for i, parts in enumerate(orders):
            ok += [i] * len(parts)
            pk += parts
        pq.write_table(
            pa.table(
                {"l_orderkey": pa.array(ok, pa.int64()), "l_partkey": pa.array(pk, pa.int64())}
            ),
            d / "lineitem.parquet",
        )
        return str(d)

    def _brute(self, orders):
        import itertools

        edges = set()
        for parts in orders:
            for a, b in itertools.combinations(sorted(set(parts)), 2):
                edges.add((a, b))
        nodes = {n for e in edges for n in e}
        tri = sum(
            1
            for a, b in edges
            for c in nodes
            if c > b and (b, c) in edges and (a, c) in edges
        )
        return len(nodes), len(edges), tri

    def test_matches_bruteforce_and_paths_agree(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q100_triangle_count

        rng = np.random.default_rng(5)
        # dense-ish random baskets so triangles actually exist
        orders = [list(rng.integers(0, 25, rng.integers(2, 6))) for _ in range(120)]
        sf = self._lineitem(tmp_path, orders)
        n_nodes, n_edges, tri = self._brute(orders)

        bcast = q100_triangle_count(sf)
        assert (int(bcast.n_nodes[0]), int(bcast.n_edges[0]), int(bcast.n_triangles[0])) == (
            n_nodes, n_edges, tri,
        )
        # force the no-broadcast exchange path; must agree exactly
        exch = q100_triangle_count(sf, broadcast_max_bytes=0)
        assert exch.equals(bcast)

    def test_duplicate_lines_and_isolated_parts(self, ray_session, tmp_path):
        """Repeated (order, part) lines must not create self-edges or inflate
        multiplicity; a part never co-purchased contributes no node."""
        from medical_ocr_service_ray.pipelines.queries import q100_triangle_count

        orders = [[1, 1, 2, 3], [2, 3, 4], [1, 4, 2], [9]]  # 9 isolated
        sf = self._lineitem(tmp_path, orders)
        out = q100_triangle_count(sf)
        n_nodes, n_edges, tri = self._brute(orders)
        assert (int(out.n_nodes[0]), int(out.n_edges[0]), int(out.n_triangles[0])) == (
            n_nodes, n_edges, tri,
        )


class TestPartitionPrune:
    def test_roundtrip_and_path_pruning(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q101_partitioned_write_prune

        rng = np.random.default_rng(3)
        n = 300
        rows = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "ts": _ts(rng.integers(0, 72, n)),
                "user_id": rng.integers(0, 9, n),
                "event_type": rng.choice(["view", "click", "purchase"], n),
                "value": rng.uniform(0, 50, n).round(2),
            }
        )
        sf = _events_parquet(tmp_path, rows)
        out = q101_partitioned_write_prune(sf).sort_values("day").reset_index(drop=True)

        p = rows[rows.event_type == "purchase"]
        exp = (
            pd.DataFrame(
                {
                    "day": pd.to_datetime(p.ts.to_numpy()).strftime("%Y-%m-%d"),
                    "cents": np.round(p.value.to_numpy() * 100).astype("int64"),
                }
            )
            .groupby("day", as_index=False)
            .agg(n_events=("cents", "size"), cents=("cents", "sum"))
            .sort_values("day")
            .reset_index(drop=True)
        )
        assert list(out.day) == list(exp.day)
        assert list(out.n_events) == list(exp.n_events.astype("int64"))
        assert list(out.cents) == list(exp.cents)

        # the layout is hive-partitioned and the pruned read opens ONLY the
        # selected partition's files (path-level pruning)
        import ray.data as rd
        from pathlib import Path

        root = Path("/tmp/mosr_q101_part") / Path(sf).name
        parts = sorted(d.name for d in root.iterdir())
        assert parts == ["event_type=click", "event_type=purchase", "event_type=view"]
        pruned = rd.read_parquet(str(root / "event_type=purchase"))
        files = pruned.input_files()
        assert files and all("event_type=purchase" in f for f in files)


class TestTfidfBySource:
    def test_matches_bruteforce(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.functions.hashing import tokens
        from medical_ocr_service_ray.pipelines.queries import q102_tfidf_by_source

        d = tmp_path / "sf"
        d.mkdir()
        docs = [
            ("alpha", "apple banana apple cherry"),
            ("alpha", "banana date apple"),
            ("beta", "cherry cherry elder apple"),
            ("beta", "fig grape FIG"),
            ("gamma", ""),  # tokenless source still counts toward N
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "source": pa.array([s for s, _ in docs]),
                    "text": pa.array([t for _, t in docs]),
                }
            ),
            d / "documents.parquet",
        )
        out = q102_tfidf_by_source(str(d))

        # brute force with the same tokenizer + quantization
        tf = {}
        for s, t in docs:
            for tok in tokens(t):
                tf[(s, tok)] = tf.get((s, tok), 0) + 1
        df = {}
        for (s, tok) in tf:
            df[tok] = df.get(tok, 0) + 1
        N = 3
        scored = [
            (s, tok, c, df[tok], c * int(np.floor(1e6 * np.log(float(N) / df[tok]))))
            for (s, tok), c in tf.items()
        ]
        exp_rows = []
        for src in ["alpha", "beta"]:
            rows = sorted(
                [r for r in scored if r[0] == src], key=lambda r: (-r[4], r[1])
            )[:10]
            exp_rows += [(src, i + 1, tok, c, dfv, sc) for i, (_, tok, c, dfv, sc) in enumerate(rows)]
        exp = pd.DataFrame(
            exp_rows, columns=["source", "rank", "token", "tf", "df", "score"]
        ).astype({"rank": "int64", "tf": "int64", "df": "int64", "score": "int64"})
        got = out.sort_values(["source", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp.sort_values(["source", "rank"]).reset_index(drop=True))

    def test_ubiquitous_token_scores_zero(self, ray_session, tmp_path):
        """A token present in every source has idf floor(1e6*ln(1)) = 0."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import q102_tfidf_by_source

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "source": pa.array(["a", "b"]),
                    "text": pa.array(["common rare", "common"]),
                }
            ),
            d / "documents.parquet",
        )
        out = q102_tfidf_by_source(str(d)).set_index(["source", "token"])
        assert int(out.loc[("a", "common")].score) == 0
        assert int(out.loc[("b", "common")].score) == 0
        assert int(out.loc[("a", "rare")].score) == int(np.floor(1e6 * np.log(2.0)))


class TestZorderCluster:
    def test_zkey_bits_and_file_locality(self, ray_session, tmp_path):
        """Dense 64x64 (user, day) grid: (1) zkey equals the brute-force bit
        interleave; (2) range files are zkey-disjoint and internally sorted;
        (3) the locality contract: any single user appears in at most 4 of
        the 16 range files (a day-sorted layout puts every user in all 16 —
        that's the min/max-stats skipping win Z-order exists for)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pathlib import Path

        from medical_ocr_service_ray.pipelines.queries import q103_zorder_cluster

        d = tmp_path / "sf"
        d.mkdir()
        users, days = np.meshgrid(np.arange(64), np.arange(64))
        users, days = users.ravel(), days.ravel()
        base = np.datetime64("2024-01-01T06:00:00", "us")
        ts = base + days * np.timedelta64(86400, "s")
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(np.arange(len(users)), pa.int64()),
                    "ts": pa.array(ts),
                    "user_id": pa.array(users.astype(np.int64)),
                    "event_type": pa.array(["x"] * len(users)),
                    "value": pa.array(np.zeros(len(users))),
                    "props": pa.array(["{}"] * len(users)),
                }
            ),
            d / "events.parquet",
        )
        out = q103_zorder_cluster(str(d)).to_pandas()

        def brute_z(u, dy):
            z = 0
            for i in range(16):
                z |= ((u >> i) & 1) << (2 * i)
                z |= ((dy >> i) & 1) << (2 * i + 1)
            return z

        samp = out.sample(50, random_state=1)
        for _, r in samp.iterrows():
            assert r.zkey == brute_z(int(r.user_id), int(r.day_idx))

        files = sorted(Path(f"/tmp/mosr_q103_zorder/{d.name}").glob("range-*.parquet"))
        assert len(files) == 16
        prev_max = None
        user_file_count = {}
        for p in files:
            t = pq.read_table(p).to_pandas()
            assert list(t.zkey) == sorted(t.zkey)
            if prev_max is not None:
                assert t.zkey.iloc[0] > prev_max
            prev_max = t.zkey.iloc[-1]
            for u in t.user_id.unique():
                user_file_count[u] = user_file_count.get(u, 0) + 1
        assert max(user_file_count.values()) <= 4


class TestCubeRollup:
    def test_all_grouping_sets(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q104_cube_rollup

        rng = np.random.default_rng(9)
        n = 200
        rows = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "ts": _ts(rng.integers(0, 24 * 14, n)),
                "user_id": rng.integers(0, 5, n),
                "event_type": rng.choice(["view", "click"], n),
                "value": rng.uniform(0, 10, n).round(2),
            }
        )
        sf = _events_parquet(tmp_path, rows)
        out = q104_cube_rollup(sf)

        cents = np.round(rows.value.to_numpy() * 100).astype("int64")
        dow = (pd.to_datetime(rows.ts.to_numpy()).dayofweek + 1).astype(str)
        base = pd.DataFrame({"et": rows.event_type, "dow": dow, "c": cents})
        # grand total row
        g = out[(out.event_type == "ALL") & (out.dow == "ALL")]
        assert int(g.n_events.iloc[0]) == n and int(g.cents.iloc[0]) == cents.sum()
        # one-dim rollups sum to the grand total
        et_rows = out[(out.event_type != "ALL") & (out.dow == "ALL")]
        assert int(et_rows.n_events.sum()) == n
        dow_rows = out[(out.event_type == "ALL") & (out.dow != "ALL")]
        assert int(dow_rows.n_events.sum()) == n
        # spot-check one fine cell
        fine = out[(out.event_type == "view") & (out.dow == "3")]
        exp = base[(base.et == "view") & (base.dow == "3")]
        if len(exp):
            assert int(fine.n_events.iloc[0]) == len(exp)
            assert int(fine.cents.iloc[0]) == int(exp.c.sum())


class TestDebounceEvents:
    def test_gap_boundary_and_type_isolation(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q105_debounce_events

        base = np.datetime64("2024-03-01T00:00:00", "us")
        s = np.timedelta64(1, "s")
        rows = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5, 6, 7],
                "ts": [
                    base,            # kept (first)
                    base + 200 * s,  # dropped (200s after raw prev, same type)
                    base + 500 * s,  # kept? gap to PREVIOUS RAW (id2) = 300s -> dropped (<=)
                    base + 801 * s,  # kept: 301s after id3
                    base,            # other type: kept (own partition)
                    base + 100 * s,  # other type: dropped
                    base,            # other user: kept
                ],
                "user_id": [1, 1, 1, 1, 1, 1, 2],
                "event_type": ["a", "a", "a", "a", "b", "b", "a"],
                "value": [0.0] * 7,
            }
        )
        out = q105_debounce_events(_events_parquet(tmp_path, rows)).to_pandas()
        assert sorted(out.event_id) == [1, 4, 5, 7]


class TestMixtureSample:
    def test_budget_tight_greedy(self, ray_session, tmp_path):
        """Per source: selected tokens <= budget, and the FIRST excluded bin
        would have pushed it over (greedy tightness at bin granularity)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import q106_mixture_sample
        from medical_ocr_service_ray.stages.sampling import KNUTH

        rng = np.random.default_rng(21)
        n = 600
        words = lambda k: " ".join(rng.choice(["a", "b", "c"], k))
        srcs = [f"src{int(i)}" for i in rng.integers(0, 4, n)]
        texts = [words(int(rng.integers(1, 40))) for _ in range(n)]
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "source": pa.array(srcs),
                    "text": pa.array(texts),
                }
            ),
            d / "documents.parquet",
        )
        out = q106_mixture_sample(str(d)).to_pandas()

        all_docs = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "source": srcs,
                "n_tokens": [len(t.split()) for t in texts],
            }
        )
        all_docs["bin"] = (
            (all_docs.doc_id.to_numpy().astype(np.uint64) * np.uint64(KNUTH))
            % np.uint64(1 << 32)
        ).astype(np.int64) % 64
        for src, grp in all_docs.groupby("source"):
            frac = 20 + 5 * (int(src[3:]) % 8)
            total = grp.n_tokens.sum()
            sel = out[out.source == src]
            picked_tokens = sel.n_tokens.sum()
            assert picked_tokens * 100 <= frac * total
            # tightness: first non-admitted bin would exceed the budget
            bins = grp.groupby("bin")["n_tokens"].sum().sort_index()
            cum = bins.cumsum()
            admitted = set(bins.index[cum * 100 <= frac * total])
            assert set(sel["doc_id"]) == set(grp[grp["bin"].isin(admitted)].doc_id)
            not_adm = [b for b in bins.index if b not in admitted]
            if not_adm:
                b0 = not_adm[0]
                assert (picked_tokens + bins.loc[b0]) * 100 > frac * total


class TestRepetitionGate:
    def test_counts_and_threshold_boundary(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import q107_repetition_gate

        docs = [
            "a b a b a",        # bigrams: ab,ba,ab,ba -> all 4 duplicated
            "w x y z",          # 3 bigrams, 0 dup -> keep
            "q q q w e r t y u i o p",  # 'q q' x2 dup of 11 -> keep (2*10<=2*11)
            "solo",             # <2 tokens: out of scope
            "",
        ]
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs),
                }
            ),
            d / "documents.parquet",
        )
        out = q107_repetition_gate(str(d)).to_pandas().set_index("doc_id")
        assert sorted(out.index) == [0, 1, 2]
        assert (int(out.loc[0].n_bigrams), int(out.loc[0].dup_bigrams), int(out.loc[0].keep)) == (4, 4, 0)
        assert (int(out.loc[1].n_bigrams), int(out.loc[1].dup_bigrams), int(out.loc[1].keep)) == (3, 0, 1)
        assert (int(out.loc[2].n_bigrams), int(out.loc[2].dup_bigrams), int(out.loc[2].keep)) == (11, 2, 1)


class TestPointLookup:
    def test_values_and_files_opened(self, ray_session, tmp_path, monkeypatch):
        """Lookup opens at most len(probe-keys) of the 64 bucket files, and
        returns exactly the probed rows (missing keys silently absent)."""
        import pyarrow.parquet as pq_mod

        from medical_ocr_service_ray.pipelines import queries as Q

        sf = "/root/testdata/sf0.001"
        opened = []
        real_read = pq_mod.read_table

        def spy(path, *a, **kw):
            p = str(path)
            if "mosr_q108_kv" in p:
                opened.append(p)
            return real_read(path, *a, **kw)

        monkeypatch.setattr(Q.pq, "read_table", spy)
        out = Q.q108_point_lookup(sf)
        assert len(opened) <= 10
        assert len(set(opened)) == len(opened)  # each bucket read once

        import duckdb

        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
        exp = con.execute(Q.ORACLE_SQL["q108_point_lookup"]).df()
        got = out.sort_values("o_orderkey").reset_index(drop=True)
        exp = exp.sort_values("o_orderkey").reset_index(drop=True)
        assert list(got.o_orderkey) == list(exp.o_orderkey)
        assert list(got.cents) == list(exp.cents.astype("int64"))


class TestPhraseSearch:
    def test_overlaps_counts_positions(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import q109_phrase_search

        docs = [
            "table value starts here",        # match at 1
            "x table table value y",          # 'table table value': match at 3
            "table value mid table value",    # two matches (1 and 4)
            "value table reversed",           # no match
            "table x value split",            # no match (not adjacent)
            "",
        ]
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs)}),
            d / "documents.parquet",
        )
        out = q109_phrase_search(str(d)).to_pandas().set_index("doc_id")
        assert sorted(out.index) == [0, 1, 2]
        assert (int(out.loc[0].n_matches), int(out.loc[0].first_pos)) == (1, 1)
        assert (int(out.loc[1].n_matches), int(out.loc[1].first_pos)) == (1, 3)
        assert (int(out.loc[2].n_matches), int(out.loc[2].first_pos)) == (2, 1)


class TestForwardFill:
    def test_carry_reset_and_sentinel(self, ray_session, tmp_path):
        """Missing rows (id%4==0) carry the latest prior present value;
        a user's first rows before any present value get -1; carries never
        leak across users."""
        from medical_ocr_service_ray.pipelines.queries import q110_forward_fill

        rows = pd.DataFrame(
            {
                # user 1: id4 (missing) -> -1; id5 present 200; id8 missing -> 200
                # user 2: id12 missing -> -1 (no leak from user 1); id13 present 500
                "event_id": [4, 5, 8, 12, 13],
                "ts": _ts([0, 1, 2, 0, 1]),
                "user_id": [1, 1, 1, 2, 2],
                "value": [9.99, 2.0, 9.99, 9.99, 5.0],
            }
        )
        out = (
            q110_forward_fill(_events_parquet(tmp_path, rows))
            .to_pandas()
            .set_index("event_id")
        )
        assert int(out.loc[4].filled_cents) == -1 and int(out.loc[4].was_present) == 0
        assert int(out.loc[5].filled_cents) == 200 and int(out.loc[5].was_present) == 1
        assert int(out.loc[8].filled_cents) == 200 and int(out.loc[8].was_present) == 0
        assert int(out.loc[12].filled_cents) == -1
        assert int(out.loc[13].filled_cents) == 500


class TestLastTouchAttribution:
    def test_window_ties_and_sentinels(self, ray_session, tmp_path):
        """Click at the exact purchase ts counts; equal-ts clicks resolve to
        max event_id; a click 7d+1us back is out of window; no cross-user
        leakage."""
        from medical_ocr_service_ray.pipelines.queries import (
            q113_last_touch_attribution,
        )

        D = 24.0  # hours per day
        rows = pd.DataFrame(
            {
                #                     user 1                      user 2
                "event_id": [1, 2, 3, 4, 5, 6, 7, 8],
                "ts": _ts([0, 1, 1, 1, 8 * D + 1, 8 * D + 1 + 7 * D, 0, 1]),
                "user_id": [1, 1, 1, 1, 1, 1, 2, 2],
                "event_type": [
                    "click",     # id1 t0
                    "click",     # id2 t1 (tie with id3)
                    "click",     # id3 t1 -> max id wins
                    "purchase",  # id4 t1 -> attributed to id3, gap 0
                    "click",     # id5 t(8d+1h)
                    "purchase",  # id6 exactly 7d after id5 -> in window (<=)
                    "purchase",  # id7 user 2, no clicks -> -1
                    "click",     # id8 user 2 AFTER purchase -> must not attach
                ],
            }
        )
        out = (
            q113_last_touch_attribution(_events_parquet(tmp_path, rows))
            .to_pandas()
            .set_index("event_id")
        )
        assert sorted(out.index) == [4, 6, 7]
        assert int(out.loc[4].click_id) == 3 and int(out.loc[4].gap_us) == 0
        assert int(out.loc[6].click_id) == 5
        assert int(out.loc[6].gap_us) == 7 * 86400 * 1_000_000
        assert int(out.loc[7].click_id) == -1 and int(out.loc[7].gap_us) == -1


class TestMultiTouchCounts:
    def test_window_bounds_and_user_isolation(self, ray_session, tmp_path):
        """Inclusive [ts-7d, ts] bounds; a previous user's clicks just under
        the boundary key space never leak into an early purchase (the SPAN
        padding property)."""
        from medical_ocr_service_ray.pipelines.queries import q114_multi_touch_counts

        D = 24.0
        rows = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5, 6, 7],
                "ts": _ts([10 * D, 3 * D, 3 * D + 0.5, 10 * D, 17 * D, 9.9 * D, 0.1]),
                "user_id": [1, 1, 1, 1, 1, 2, 3],
                "event_type": [
                    "click",     # u1 exactly at purchase ts -> counts
                    "click",     # u1 exactly 7d before -> counts (inclusive)
                    "click",     # u1 in window
                    "purchase",  # u1 at 10D: expects 3 clicks
                    "purchase",  # u1 at 17D: click id1 exactly 7d back -> 1
                    "click",     # u2 late click (high key) — not u3's
                    "purchase",  # u3 very early purchase, no own clicks -> 0
                ],
            }
        )
        out = (
            q114_multi_touch_counts(_events_parquet(tmp_path, rows))
            .to_pandas()
            .set_index("event_id")
        )
        assert int(out.loc[4].n_clicks) == 3
        assert int(out.loc[5].n_clicks) == 1
        assert int(out.loc[7].n_clicks) == 0


class TestAudienceOverlapExact:
    def test_matches_bruteforce_sets(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import (
            _Q115_TYPES,
            q115_audience_overlap_exact,
        )

        rng = np.random.default_rng(13)
        n = 400
        rows = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "ts": _ts(rng.integers(0, 48, n)),
                "user_id": rng.integers(0, 40, n),
                "event_type": rng.choice(_Q115_TYPES, n),
                "value": np.zeros(n),
            }
        )
        out = (
            q115_audience_overlap_exact(_events_parquet(tmp_path, rows))
            .set_index(["type_a", "type_b"])
        )
        users_of = {
            t: set(rows[rows.event_type == t].user_id) for t in _Q115_TYPES
        }
        for i, a in enumerate(_Q115_TYPES):
            for b in _Q115_TYPES[i:]:
                assert int(out.loc[(a, b)].n_users) == len(users_of[a] & users_of[b])


class TestWeightedMedian:
    def test_matches_bruteforce_expansion(self, ray_session, tmp_path):
        """Weighted median == plain median of the weight-expanded multiset
        (lower-median convention: smallest value with 2*cum >= total)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import q116_weighted_median

        rng = np.random.default_rng(17)
        n = 300
        flags = rng.choice(["A", "N", "R"], n)
        price = rng.uniform(1, 50, n).round(2)
        qty = rng.integers(1, 9, n)
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "l_returnflag": pa.array(flags),
                    "l_extendedprice": pa.array(price),
                    "l_quantity": pa.array(qty.astype(np.float64)),
                }
            ),
            d / "lineitem.parquet",
        )
        out = q116_weighted_median(str(d)).to_pandas().set_index("flag")
        cents = np.round(price * 100).astype(np.int64)
        for f in "ANR":
            sel = flags == f
            expanded = np.sort(np.repeat(cents[sel], qty[sel]))
            tw = len(expanded)
            # smallest v with 2*rank(v) >= tw  (rank = count of <= v)
            k = int(np.ceil(tw / 2)) - 1
            assert int(out.loc[f].wmedian_cents) == int(expanded[k])
            assert int(out.loc[f].total_weight) == tw


class TestColumnProfile:
    def test_exact_profile(self, ray_session):
        import duckdb

        from medical_ocr_service_ray.pipelines import queries as Q

        sf = "/root/testdata/sf0.001"
        out = Q.q117_column_profile(sf).set_index("column")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
        exp = con.execute(Q.ORACLE_SQL["q117_column_profile"]).df().set_index("column")
        for c in out.index:
            for f in ("n", "n_null", "n_distinct", "vmin", "vmax", "vsum"):
                assert int(out.loc[c][f]) == int(exp.loc[c][f]), (c, f)


class TestEventTrigrams:
    def test_user_boundaries_and_order(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q118_event_trigrams

        rows = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5, 6, 7],
                "ts": _ts([0, 1, 2, 3, 0, 1, 2]),
                "user_id": [1, 1, 1, 1, 2, 2, 2],
                "event_type": ["a", "b", "c", "a", "b", "c", "a"],
            }
        )
        out = q118_event_trigrams(_events_parquet(tmp_path, rows)).set_index("trigram")
        # u1: a>b>c, b>c>a; u2: b>c>a — NO cross-user a>b>c from (4,5,6)
        assert int(out.loc["b>c>a"].cnt) == 2
        assert int(out.loc["a>b>c"].cnt) == 1
        assert len(out) == 2


class TestDailyBounceRate:
    def test_gap_rule_and_bounce_flag(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q119_daily_bounce_rate

        m = 1 / 60.0  # hours per minute
        rows = pd.DataFrame(
            {
                "event_id": [1, 2, 3, 4, 5],
                # u1: events at 0 and 29min (one session, 1740s), then 61min
                # later -> new session (single event => bounce)
                "ts": _ts([0, 29 * m, 29 * m + 61 * m, 0, 0]),
                "user_id": [1, 1, 1, 2, 3],
                "event_type": ["x"] * 5,
            }
        )
        out = q119_daily_bounce_rate(_events_parquet(tmp_path, rows))
        assert len(out) == 1
        r = out.iloc[0]
        # sessions: u1 x2, u2 x1, u3 x1 = 4; bounced: u1's 2nd, u2, u3 = 3
        assert int(r.n_sessions) == 4 and int(r.n_bounced) == 3
        assert int(r.total_dur_s) == 1740


class TestOrderCountDistribution:
    def test_frequency_of_frequencies(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import (
            q120_order_count_distribution,
        )

        custs = [1, 1, 1, 2, 2, 3, 4, 4, 4, 4]
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.table({"o_custkey": pa.array(custs, pa.int64())}), d / "orders.parquet"
        )
        out = q120_order_count_distribution(str(d)).set_index("n_orders")
        assert int(out.loc[1].n_customers) == 1  # cust 3
        assert int(out.loc[2].n_customers) == 1  # cust 2
        assert int(out.loc[3].n_customers) == 1  # cust 1
        assert int(out.loc[4].n_customers) == 1  # cust 4


class TestWinsorizedStats:
    def test_bounds_and_clamped_sum(self, ray_session, tmp_path):
        from medical_ocr_service_ray.pipelines.queries import q121_winsorized_stats

        # 100 values 1.00..100.00 for one type: P1 bound = 1.00, P99 = 99.00
        # (smallest value with 100*cum >= q*total); clamped sum replaces
        # 100.00 with 99.00
        n = 100
        rows = pd.DataFrame(
            {
                "event_id": np.arange(n),
                "ts": _ts(np.zeros(n)),
                "user_id": np.zeros(n, dtype=int),
                "event_type": ["x"] * n,
                "value": np.arange(1, n + 1, dtype=float),
            }
        )
        out = q121_winsorized_stats(_events_parquet(tmp_path, rows)).iloc[0]
        assert int(out.p1_cents) == 100
        assert int(out.p99_cents) == 9900
        exp = sum(min(max(v, 100), 9900) for v in range(100, 10001, 100))
        assert int(out.wsum) == exp


class TestContractValidation:
    def test_rule_kinds_and_split(self, ray_session):
        from medical_ocr_service_ray.stages.validate import check_batch, split_batch

        df = pd.DataFrame(
            {
                "v": [1.0, -2.0, 50.0, np.nan],
                "t": ["a", "b", "zz", "a"],
                "s": ["ok", "toolongvalue", "ok", "ok"],
            }
        )
        rules = [
            ("nonneg", "v", "ge", 0.0),
            ("le45", "v", "le", 45.0),
            ("known", "t", "in_set", ("a", "b")),
            ("nn", "v", "not_null", None),
            ("short", "s", "str_maxlen", 5),
        ]
        out = check_batch(df, rules).set_index("rule_id")
        assert int(out.loc["nonneg"].n_violations) == 1   # -2
        assert int(out.loc["le45"].n_violations) == 1     # 50
        assert int(out.loc["known"].n_violations) == 1    # zz
        assert int(out.loc["nn"].n_violations) == 1       # NaN
        assert int(out.loc["short"].n_violations) == 1    # toolongvalue
        clean, bad = split_batch(df, rules)
        assert len(clean) == 1 and len(bad) == 3  # row0 clean... rows 1,2,3 bad
        assert clean.index.tolist() == [0]

    def test_sf_counts_match_duckdb(self, ray_session):
        import duckdb

        from medical_ocr_service_ray.pipelines import queries as Q

        sf = "/root/testdata/sf0.001"
        out = Q.q123_contract_violations(sf).set_index("rule_id")
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        exp = con.execute(Q.ORACLE_SQL["q123_contract_violations"]).df().set_index("rule_id")
        for r in out.index:
            assert int(out.loc[r].n_violations) == int(exp.loc[r].n_violations)
