"""Table-maintenance utilities (sources/maintenance.py): small-file
compaction (row-exact, atomic publish) and footer-only catalog stats."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture
def shardy_dir(tmp_path):
    """40 tiny parquet shards with a known global min/max and nulls."""
    rng = np.random.default_rng(3)
    rows = 0
    for i in range(40):
        n = int(rng.integers(50, 150))
        vals = rng.integers(-1000, 1000, n)
        t = pa.table(
            {
                "id": pa.array(np.arange(rows, rows + n), pa.int64()),
                "v": pa.array(vals, pa.int64()),
                "name": pa.array(
                    [None if rng.random() < 0.1 else f"u{int(x):04d}" for x in vals]
                ),
            }
        )
        pq.write_table(t, tmp_path / f"part-{i:03d}.parquet")
        rows += n
    return tmp_path, rows


class TestCompaction:
    def test_row_exact_and_fewer_files(self, ray_session, shardy_dir, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import compact_parquet

        in_dir, rows = shardy_dir
        out = tmp_path / "compacted"
        res = compact_parquet(in_dir, out, target_mb=1)
        assert res["rows"] == rows
        assert res["files_in"] == 40
        assert res["files_out"] < res["files_in"]
        got = pq.read_table(out)
        assert got.num_rows == rows
        # content identical (order-insensitive)
        a = pq.read_table(sorted(str(p) for p in in_dir.glob("*.parquet"))).to_pandas()
        b = got.to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("id").reset_index(drop=True),
            b.sort_values("id").reset_index(drop=True),
        )

    def test_no_files_raises(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import compact_parquet

        (tmp_path / "empty").mkdir()
        with pytest.raises(ValueError):
            compact_parquet(tmp_path / "empty", tmp_path / "out")

    def test_sorted_compaction_yields_disjoint_footer_intervals(
        self, ray_session, shardy_dir, tmp_path
    ):
        """OPTIMIZE-with-sort: the input shards' v-intervals all overlap
        (random interleave); after sort_by='v' compaction the output
        files carry touching-at-most footer intervals, so point/range
        reads prune to O(1) files."""
        from medical_ocr_service_ray.sources.maintenance import compact_parquet

        in_dir, rows = shardy_dir

        def intervals(d):
            out = []
            for f in sorted(d.glob("*.parquet")):
                md = pq.read_metadata(f)
                lo = min(md.row_group(i).column(1).statistics.min
                         for i in range(md.num_row_groups))
                hi = max(md.row_group(i).column(1).statistics.max
                         for i in range(md.num_row_groups))
                out.append((lo, hi))
            return sorted(out)

        ins = intervals(in_dir)
        overlapping = sum(
            1 for (a, b), (c, _) in zip(ins, ins[1:]) if c < b
        )
        assert overlapping > len(ins) // 2  # unsorted ingest: interleaved

        out = tmp_path / "sorted"
        res = compact_parquet(in_dir, out, target_mb=0.02, sort_by="v")
        assert res["rows"] == rows and res["files_out"] > 1
        outs = intervals(out)
        assert all(b[0] >= a[1] for a, b in zip(outs, outs[1:]))  # disjoint
        # content identical (order-insensitive)
        a = pq.read_table(
            sorted(str(p) for p in in_dir.glob("*.parquet"))
        ).to_pandas()
        b = pq.read_table(out).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values(["id"]).reset_index(drop=True),
            b.sort_values(["id"]).reset_index(drop=True),
        )


class TestCatalogStats:
    def test_matches_full_scan(self, ray_session, shardy_dir):
        from medical_ocr_service_ray.sources.maintenance import collect_parquet_stats

        in_dir, rows = shardy_dir
        stats = collect_parquet_stats(in_dir).set_index("column")
        full = pq.read_table(sorted(str(p) for p in in_dir.glob("*.parquet"))).to_pandas()
        assert int(stats.loc["v", "rows"]) == rows
        assert stats.loc["v", "min"] == repr(int(full.v.min()))
        assert stats.loc["v", "max"] == repr(int(full.v.max()))
        assert int(stats.loc["name", "nulls"]) == int(full.name.isna().sum())
        # string column min/max compare natively, not lexicographic-on-repr
        assert stats.loc["name", "min"] == repr(full.name.dropna().min())
        assert stats.loc["name", "max"] == repr(full.name.dropna().max())


class TestGcOrphans:
    def test_dry_run_then_delete(self, tmp_path):
        import pandas as pd

        from medical_ocr_service_ray.sources.maintenance import gc_orphans

        d = tmp_path / "data"
        d.mkdir()
        for name in ("s-aa.parquet", "s-bb.parquet", "orphan-1.parquet", "tmp-xyz"):
            (d / name).write_bytes(b"x")
        ref = {"s-aa.parquet", "s-bb.parquet"}

        dry = gc_orphans(d, ref)  # default dry_run
        assert dict(zip(dry.file, dry.status)) == {
            "s-aa.parquet": "kept",
            "s-bb.parquet": "kept",
            "orphan-1.parquet": "orphan",
            "tmp-xyz": "orphan",
        }
        assert sorted(p.name for p in d.iterdir()) == sorted(
            ["s-aa.parquet", "s-bb.parquet", "orphan-1.parquet", "tmp-xyz"]
        )

        out = gc_orphans(d, ref, dry_run=False)
        assert set(out.loc[out.status == "deleted", "file"]) == {
            "orphan-1.parquet",
            "tmp-xyz",
        }
        assert sorted(p.name for p in d.iterdir()) == ["s-aa.parquet", "s-bb.parquet"]
        # idempotent rerun: nothing left to delete
        again = gc_orphans(d, ref, dry_run=False)
        assert (again.status == "kept").all()


class TestSnapshotsTimeTravel:
    def _write(self, d, name, lo, hi):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(pa.table({"x": list(range(lo, hi))}), d / name)
        return name

    def test_append_replace_time_travel(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            read_at_snapshot,
            snapshot_log,
        )

        f1 = self._write(tmp_path, "a.parquet", 0, 10)
        s1 = commit_snapshot(tmp_path, [f1])
        f2 = self._write(tmp_path, "b.parquet", 10, 30)
        s2 = commit_snapshot(tmp_path, [f2])  # append
        fc = self._write(tmp_path, "compacted.parquet", 0, 30)
        s3 = commit_snapshot(tmp_path, [fc], op="replace")

        assert (s1, s2, s3) == (1, 2, 3)
        assert read_at_snapshot(tmp_path, 1).count() == 10
        assert read_at_snapshot(tmp_path, 2).count() == 30
        assert read_at_snapshot(tmp_path).count() == 30  # head = replace
        log = snapshot_log(tmp_path)
        assert log.op.tolist() == ["append", "append", "replace"]
        assert log.n_files.tolist() == [1, 2, 1]

    def test_expire_then_gc_reclaims_only_dead_files(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            expire_snapshots,
            gc_orphans,
            live_files,
            read_at_snapshot,
        )

        f1 = self._write(tmp_path, "a.parquet", 0, 10)
        commit_snapshot(tmp_path, [f1])
        f2 = self._write(tmp_path, "b.parquet", 10, 30)
        commit_snapshot(tmp_path, [f2])
        fc = self._write(tmp_path, "compacted.parquet", 0, 30)
        commit_snapshot(tmp_path, [fc], op="replace")

        # all three snapshots live -> nothing is an orphan
        rep = gc_orphans(tmp_path, live_files(tmp_path), dry_run=True)
        assert (rep.status == "kept").all()

        expired = expire_snapshots(tmp_path, keep_last=1)
        assert expired == [1, 2]
        rep = gc_orphans(tmp_path, live_files(tmp_path), dry_run=False)
        got = dict(zip(rep.file, rep.status))
        assert got["compacted.parquet"] == "kept"
        assert got["a.parquet"] == "deleted" and got["b.parquet"] == "deleted"
        assert read_at_snapshot(tmp_path).count() == 30  # head still reads

    def test_full_expiry_never_reuses_ids(self, tmp_path):
        """expire_snapshots(keep_last=0) empties the manifest log; the next
        commit must CONTINUE the id sequence (high-water mark), never
        restart at 1 — a reader holding an old id must get KeyError, not a
        silently different table version."""
        import pytest

        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            expire_snapshots,
            read_at_snapshot,
        )

        self._write(tmp_path, "a.parquet", 0, 5)
        self._write(tmp_path, "b.parquet", 5, 12)
        assert commit_snapshot(tmp_path, ["a.parquet"]) == 1
        assert commit_snapshot(tmp_path, ["b.parquet"]) == 2
        assert expire_snapshots(tmp_path, keep_last=0) == [1, 2]
        # id sequence continues past the expired high-water mark
        assert commit_snapshot(tmp_path, ["a.parquet"]) == 3
        with pytest.raises(KeyError):
            read_at_snapshot(tmp_path, 1)
        # a second full expiry keeps raising the floor
        assert expire_snapshots(tmp_path, keep_last=0) == [3]
        assert commit_snapshot(tmp_path, ["b.parquet"]) == 4

    def test_commit_race_never_reuses_an_id(self, tmp_path):
        """Two concurrent committers: O_EXCL must hand out distinct ids and
        both file lists must survive in the final union."""
        from concurrent.futures import ThreadPoolExecutor

        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            live_files,
        )

        self._write(tmp_path, "a.parquet", 0, 1)
        self._write(tmp_path, "b.parquet", 0, 1)
        with ThreadPoolExecutor(2) as ex:
            ids = list(
                ex.map(lambda f: commit_snapshot(tmp_path, [f]), ["a.parquet", "b.parquet"])
            )
        assert sorted(ids) == [1, 2]
        assert live_files(tmp_path) == {"a.parquet", "b.parquet"}


class TestDeleteRows:
    """GDPR erasure as a replace-snapshot commit: footer-stats pruning
    keeps out-of-range files untouched (same bytes), matching rows vanish
    at head, older snapshots still read the pre-delete data."""

    def _mk(self, d, name, ids):
        t = pa.table({"user_id": pa.array(ids, pa.int64()),
                      "v": pa.array([i * 10 for i in ids], pa.int64())})
        pq.write_table(t, d / name)
        return name

    def test_delete_prune_timetravel(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            delete_rows,
            read_at_snapshot,
        )

        f1 = self._mk(tmp_path, "a.parquet", [1, 2, 3])
        f2 = self._mk(tmp_path, "b.parquet", [100, 101])
        s1 = commit_snapshot(tmp_path, [f1, f2])
        mtime_b = (tmp_path / f2).stat().st_mtime_ns

        res = delete_rows(tmp_path, "user_id", [2, 3])
        assert res["rows_deleted"] == 2
        assert res["files_rewritten"] == 1
        # footer prune: b.parquet (ids 100-101) was never a candidate
        assert res["files_scanned"] == 1
        assert (tmp_path / f2).stat().st_mtime_ns == mtime_b

        head = read_at_snapshot(tmp_path).to_pandas()
        assert sorted(head.user_id) == [1, 100, 101]
        # time travel: the pre-delete snapshot still reads everything
        old = read_at_snapshot(tmp_path, s1).to_pandas()
        assert sorted(old.user_id) == [1, 2, 3, 100, 101]

    def test_noop_delete_keeps_every_file(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            delete_rows,
            live_files,
        )

        f1 = self._mk(tmp_path, "a.parquet", [1, 2, 3])
        commit_snapshot(tmp_path, [f1])
        before = live_files(tmp_path)
        res = delete_rows(tmp_path, "user_id", [999])
        assert res["rows_deleted"] == 0 and res["files_rewritten"] == 0
        assert live_files(tmp_path) == before

    def test_erasure_becomes_physical_after_expire_gc(
        self, ray_session, tmp_path
    ):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            delete_rows,
            expire_snapshots,
            gc_orphans,
            live_files,
        )

        f1 = self._mk(tmp_path, "a.parquet", [1, 2, 3])
        commit_snapshot(tmp_path, [f1])
        delete_rows(tmp_path, "user_id", [2])
        expire_snapshots(tmp_path, keep_last=1)
        gc_orphans(tmp_path, live_files(tmp_path), dry_run=False)
        assert not (tmp_path / f1).exists()  # the bytes holding id=2 are gone


class TestBloomSidecars:
    """Per-file Bloom sidecars: point-lookup file skipping where footer
    min/max is useless (interleaved key ranges). Skipping is deterministic
    (splitmix64 double hashing, no RNG), so the observed prune is pinned
    exactly; correctness = result equality with the unpruned scan."""

    def _mk(self, d):
        # interleaved keys (file i holds i, i+3, i+6, ...): every file's
        # [min, max] contains every probe, so footer stats can never skip
        # — blooms can. 200 keys/file so m is sized by the formula, not
        # the 64-bit floor (the tiny-n floor saturates and false-positives
        # every probe).
        for i in range(3):
            ids = list(range(i, i + 600, 3))
            t = pa.table({"k": pa.array(ids, pa.int64()),
                          "v": pa.array([x * 2 for x in ids], pa.int64())})
            pq.write_table(t, d / f"p{i}.parquet")

    def test_skip_and_exact_result(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            bloom_prune_files,
            point_read_with_blooms,
            write_bloom_sidecars,
        )

        self._mk(tmp_path)
        res = write_bloom_sidecars(tmp_path, "k")
        assert res["files"] == 3
        cand, skipped = bloom_prune_files(tmp_path, "k", [300])
        assert str(tmp_path / "p0.parquet") in cand
        assert len(skipped) == 2  # deterministic: no RNG in the hash
        got = point_read_with_blooms(tmp_path, "k", [300]).to_pandas()
        import pandas as pd

        full = pd.concat(
            [pq.read_table(tmp_path / f"p{i}.parquet").to_pandas() for i in range(3)]
        )
        want = full[full.k == 300].reset_index(drop=True)
        assert got.sort_values("k").reset_index(drop=True).equals(want)

    def test_missing_sidecar_is_candidate(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            bloom_prune_files,
            write_bloom_sidecars,
        )

        self._mk(tmp_path)
        write_bloom_sidecars(tmp_path, "k")
        (tmp_path / "p1.parquet").with_suffix(".bloom-k.npz").unlink()
        cand, _ = bloom_prune_files(tmp_path, "k", [4])
        assert str(tmp_path / "p1.parquet") in cand  # never skip blind

    def test_absent_value_skips_everything(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            bloom_prune_files,
            point_read_with_blooms,
            write_bloom_sidecars,
        )

        self._mk(tmp_path)
        write_bloom_sidecars(tmp_path, "k")
        cand, skipped = bloom_prune_files(tmp_path, "k", [123456789])
        assert cand == [] and len(skipped) == 3  # deterministic
        assert point_read_with_blooms(tmp_path, "k", [123456789]).count() == 0


class TestMergeRows:
    """MERGE INTO (copy-on-write upsert): matched target rows replaced
    with update values (multiplicity preserved), unmatched update keys
    appended as one insert file, out-of-range files carried byte-identical,
    pre-merge snapshot still time-travel-readable."""

    def _mk(self, d, name, ids):
        t = pa.table({"user_id": pa.array(ids, pa.int64()),
                      "v": pa.array([i * 10 for i in ids], pa.int64())})
        pq.write_table(t, d / name)
        return name

    def test_update_insert_prune_timetravel(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            merge_rows,
            read_at_snapshot,
        )

        f1 = self._mk(tmp_path, "a.parquet", [1, 2, 3])
        f2 = self._mk(tmp_path, "b.parquet", [100, 101])
        s1 = commit_snapshot(tmp_path, [f1, f2])
        mtime_b = (tmp_path / f2).stat().st_mtime_ns

        upd = pa.table({"user_id": pa.array([2, 3, 7], pa.int64()),
                        "v": pa.array([-2, -3, -7], pa.int64())})
        res = merge_rows(tmp_path, upd, "user_id")
        assert res["rows_updated"] == 2 and res["rows_inserted"] == 1
        assert res["files_rewritten"] == 1
        assert res["files_scanned"] == 1  # footer prune skipped b.parquet
        assert (tmp_path / f2).stat().st_mtime_ns == mtime_b

        head = read_at_snapshot(tmp_path).to_pandas().sort_values("user_id")
        assert list(head.user_id) == [1, 2, 3, 7, 100, 101]
        assert list(head.v) == [10, -2, -3, -7, 1000, 1010]
        old = read_at_snapshot(tmp_path, s1).to_pandas()
        assert sorted(old.v) == [10, 20, 30, 1000, 1010]

    def test_duplicate_target_rows_all_updated(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            merge_rows,
            read_at_snapshot,
        )

        f1 = self._mk(tmp_path, "a.parquet", [5, 5, 6])
        commit_snapshot(tmp_path, [f1])
        upd = pa.table({"user_id": pa.array([5], pa.int64()),
                        "v": pa.array([-5], pa.int64())})
        res = merge_rows(tmp_path, upd, "user_id")
        assert res["rows_updated"] == 2 and res["rows_inserted"] == 0
        head = read_at_snapshot(tmp_path).to_pandas()
        assert sorted(head.v) == [-5, -5, 60]  # both dup rows updated

    def test_ambiguous_updates_and_schema_mismatch_raise(
        self, ray_session, tmp_path
    ):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            merge_rows,
        )

        f1 = self._mk(tmp_path, "a.parquet", [1])
        commit_snapshot(tmp_path, [f1])
        dup = pa.table({"user_id": pa.array([9, 9], pa.int64()),
                        "v": pa.array([1, 2], pa.int64())})
        with pytest.raises(ValueError, match="ambiguous"):
            merge_rows(tmp_path, dup, "user_id")
        subset = pa.table({"user_id": pa.array([9], pa.int64())})
        with pytest.raises(ValueError, match="schema"):
            merge_rows(tmp_path, subset, "user_id")

    def test_chained_replace_commits_do_not_resurrect(self, ray_session, tmp_path):
        """head_files regression: a second replace-commit op (delete after
        delete) must build on the HEAD manifest, not the all-snapshot
        union — the union would resurrect pre-delete rows."""
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            delete_rows,
            read_at_snapshot,
        )

        f1 = self._mk(tmp_path, "a.parquet", [1, 2, 3, 4])
        commit_snapshot(tmp_path, [f1])
        delete_rows(tmp_path, "user_id", [2])
        delete_rows(tmp_path, "user_id", [3])
        head = read_at_snapshot(tmp_path).to_pandas()
        assert sorted(head.user_id) == [1, 4]


class TestChangeFeed:
    """Snapshot diff + row-level CDC read: appends stream as inserts,
    replace-rewrites as delete+insert pairs over ONLY the changed files."""

    def _mk(self, d, name, ids):
        t = pa.table({"user_id": pa.array(ids, pa.int64()),
                      "v": pa.array([i * 10 for i in ids], pa.int64())})
        pq.write_table(t, d / name)
        return name

    def test_append_is_insert_only(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            diff_snapshots,
            read_changes,
        )

        f1 = self._mk(tmp_path, "a.parquet", [1, 2])
        s1 = commit_snapshot(tmp_path, [f1])
        f2 = self._mk(tmp_path, "b.parquet", [3])
        s2 = commit_snapshot(tmp_path, [f2])  # append op

        d = diff_snapshots(tmp_path, s1, s2)
        assert d == {"added": ["b.parquet"], "removed": []}
        ch = read_changes(tmp_path, s1, s2).to_pandas()
        assert list(ch._change_type) == ["insert"]
        assert list(ch.user_id) == [3]

    def test_rewrite_is_delete_insert_pair(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            delete_rows,
            read_changes,
        )

        f1 = self._mk(tmp_path, "a.parquet", [1, 2, 3])
        s1 = commit_snapshot(tmp_path, [f1])
        res = delete_rows(tmp_path, "user_id", [2])
        ch = read_changes(tmp_path, s1, res["snapshot_id"]).to_pandas()
        ins = ch[ch._change_type == "insert"]
        dele = ch[ch._change_type == "delete"]
        # old file's 3 rows out, rewritten file's 2 survivors in:
        # consumers reconcile by key -> net effect = row 2 deleted
        assert sorted(dele.user_id) == [1, 2, 3]
        assert sorted(ins.user_id) == [1, 3]

    def test_identical_snapshots_and_gc_guard(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            delete_rows,
            read_changes,
        )

        f1 = self._mk(tmp_path, "a.parquet", [1, 2])
        s1 = commit_snapshot(tmp_path, [f1])
        assert read_changes(tmp_path, s1, s1).count() == 0
        res = delete_rows(tmp_path, "user_id", [1])
        # simulate GC reclaiming the pre-delete file while the manifest
        # survives: the feed must refuse, never emit a silent partial
        (tmp_path / "a.parquet").unlink()
        with pytest.raises(FileNotFoundError, match="GC-reclaimed"):
            read_changes(tmp_path, s1, res["snapshot_id"])


class TestLakeLifecycle:
    """End-to-end lake lifecycle driving the WHOLE maintenance surface in
    one story: ingest appends -> sorted compaction committed as replace ->
    GDPR delete -> MERGE upsert -> CDC-fed incremental aggregate that
    matches a full recompute at every version -> retention + GC, with
    time travel checked along the way. The piecewise unit tests above pin
    each op; this pins their COMPOSITION (manifest lineage, file reuse,
    feed consistency)."""

    def _mk(self, d, name, ids, vs):
        t = pa.table({"user_id": pa.array(ids, pa.int64()),
                      "v": pa.array(vs, pa.int64())})
        pq.write_table(t, d / name)
        return name

    @staticmethod
    def _full_sum(tmp_path, sid):
        from medical_ocr_service_ray.sources.maintenance import read_at_snapshot

        df = read_at_snapshot(tmp_path, sid).to_pandas()
        return df.groupby("user_id")["v"].sum().to_dict()

    @staticmethod
    def _apply_changes(state, tmp_path, s_from, s_to):
        from medical_ocr_service_ray.sources.maintenance import read_changes

        ch = read_changes(tmp_path, s_from, s_to).to_pandas()
        out = dict(state)
        for _, r in ch.iterrows():
            delta = int(r.v) if r._change_type == "insert" else -int(r.v)
            out[int(r.user_id)] = out.get(int(r.user_id), 0) + delta
        return {k: v for k, v in out.items() if v != 0 or k in out}

    def test_full_lifecycle(self, ray_session, tmp_path):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            compact_parquet,
            delete_rows,
            expire_snapshots,
            gc_orphans,
            head_files,
            live_files,
            merge_rows,
            read_at_snapshot,
        )

        # 1) two ingest appends (small-file phase)
        f1 = self._mk(tmp_path, "ing-1.parquet", [1, 2, 3], [10, 20, 30])
        s1 = commit_snapshot(tmp_path, [f1])
        f2 = self._mk(tmp_path, "ing-2.parquet", [2, 4], [200, 40])
        s2 = commit_snapshot(tmp_path, [f2])

        # 2) sorted compaction, committed as a replace snapshot
        comp = tmp_path / "_compact_out"
        compact_parquet(tmp_path, comp, target_mb=128, sort_by="user_id")
        names = []
        for i, p in enumerate(sorted(comp.glob("*.parquet"))):
            name = f"compact-{i}.parquet"
            p.rename(tmp_path / name)
            names.append(name)
        s3 = commit_snapshot(tmp_path, names, op="replace")
        assert read_at_snapshot(tmp_path, s3).count() == 5

        # 3) GDPR delete of user 2 (both its rows, across former files)
        d = delete_rows(tmp_path, "user_id", [2])
        s4 = d["snapshot_id"]
        assert d["rows_deleted"] == 2

        # 4) MERGE upsert: update user 3, insert user 9
        upd = pa.table({"user_id": pa.array([3, 9], pa.int64()),
                        "v": pa.array([-30, 90], pa.int64())})
        m = merge_rows(tmp_path, upd, "user_id")
        s5 = m["snapshot_id"]
        assert m["rows_updated"] == 1 and m["rows_inserted"] == 1

        # 5) CDC consumer: fold each version's change feed into a running
        #    per-user sum; at EVERY version it must equal the recompute
        state = {}
        prev = None
        for sid in (s1, s2, s3, s4, s5):
            if prev is None:
                state = self._full_sum(tmp_path, sid)
            else:
                state = self._apply_changes(state, tmp_path, prev, sid)
            full = self._full_sum(tmp_path, sid)
            assert {k: v for k, v in state.items() if v != 0} == full, sid
            prev = sid

        # final contents: 1:10, 3:-30, 4:40, 9:90 (user 2 erased)
        assert self._full_sum(tmp_path, s5) == {1: 10, 3: -30, 4: 40, 9: 90}

        # 6) time travel to every historical version still works pre-GC
        assert self._full_sum(tmp_path, s1) == {1: 10, 2: 20, 3: 30}
        assert self._full_sum(tmp_path, s2) == {1: 10, 2: 220, 3: 30, 4: 40}

        # 7) retention + GC: only the head survives; its files all exist
        expire_snapshots(tmp_path, keep_last=1)
        gc_orphans(tmp_path, live_files(tmp_path), dry_run=False)
        assert self._full_sum(tmp_path, s5) == {1: 10, 3: -30, 4: 40, 9: 90}
        for f in head_files(tmp_path):
            assert (tmp_path / f).exists()
        # erased user's data is now physically gone from the data dir
        import pyarrow.dataset as pads

        left = pq.read_table(
            [str(tmp_path / f) for f in head_files(tmp_path)]
        ).to_pandas()
        assert 2 not in set(left.user_id)


class TestMergeRowsProperty:
    """Hypothesis: merge_rows == the pandas reference upsert for random
    target shards (duplicate keys allowed, arbitrary file splits) and
    random unique update sets — pins matched-multiplicity, insert
    remainder, and footer-prune correctness across shapes the unit tests
    don't enumerate. Few examples: each spins real Ray tasks."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @staticmethod
    def _reference(target: pd.DataFrame, upd: pd.DataFrame) -> dict:
        m = target.merge(upd, on="user_id", how="left", suffixes=("", "_u"))
        out_v = m.v_u.where(m.v_u.notna(), m.v)
        got = pd.DataFrame({"user_id": m.user_id, "v": out_v})
        ins = upd[~upd.user_id.isin(target.user_id)]
        got = pd.concat([got, ins])
        return (
            got.astype("int64")
            .sort_values(["user_id", "v"])
            .reset_index(drop=True)
            .to_dict("list")
        )

    @given(
        target=st.lists(
            st.tuples(st.integers(0, 15), st.integers(-100, 100)),
            min_size=1, max_size=24,
        ),
        upd_keys=st.sets(st.integers(0, 20), min_size=1, max_size=8),
        n_files=st.integers(1, 3),
    )
    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_matches_pandas_upsert(
        self, ray_session, tmp_path_factory, target, upd_keys, n_files
    ):
        from medical_ocr_service_ray.sources.maintenance import (
            commit_snapshot,
            merge_rows,
            read_at_snapshot,
        )

        d = tmp_path_factory.mktemp("merge_prop")
        tdf = pd.DataFrame(target, columns=["user_id", "v"]).astype("int64")
        files = []
        for i, part in enumerate(np.array_split(tdf, n_files)):
            if not len(part):
                continue
            name = f"t-{i}.parquet"
            pq.write_table(
                pa.Table.from_pandas(part, preserve_index=False), d / name
            )
            files.append(name)
        commit_snapshot(d, files)
        keys = sorted(upd_keys)
        upd = pa.table(
            {"user_id": pa.array(keys, pa.int64()),
             "v": pa.array([1000 + k for k in keys], pa.int64())}
        )
        merge_rows(d, upd, "user_id")
        got = (
            read_at_snapshot(d).to_pandas().astype("int64")
            .sort_values(["user_id", "v"]).reset_index(drop=True)
            .to_dict("list")
        )
        udf = upd.to_pandas()
        assert got == self._reference(tdf, udf)
