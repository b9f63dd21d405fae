"""Table-maintenance utilities for parquet datasets at scale.

Two operations every 100-TB lake needs and no transform query covers:

- ``compact_parquet``: the small-files problem. Long-running ingest (or a
  resumable shard writer like pipelines/extraction.py) leaves thousands of
  KB-class part files; reads then pay per-file open/footer cost instead of
  per-byte scan cost. Compaction rewrites a directory into
  ~target-sized files: file count derives from the INPUT BYTES (not row
  count — rows/byte varies wildly across schemas), the rewrite is a
  streaming Ray Data read -> repartition -> write (never materializes the
  table on the driver), and output goes to a fresh directory + atomic
  rename so a crashed compaction never destroys the input.

- ``collect_parquet_stats``: data-catalog column stats (rows, nulls,
  min/max) WITHOUT scanning data — parquet footers already carry per-
  row-group statistics; this reads ONLY metadata (KBs per file regardless
  of file size) and reduces it. At 100 TB this is the difference between a
  catalog refresh costing seconds and costing a full-table scan. Footer
  reads fan out as a Ray Data map over the file list.

Reference analogue: the reference's batch-job bookkeeping scans its upload
tables for sizes/status (database/migration_ingestion_jobs.sql); these are
the lake-native equivalents.
"""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd


def compact_parquet(
    in_dir: str | Path,
    out_dir: str | Path,
    target_mb: float = 128,
    sort_by: str | None = None,
) -> dict:
    """Rewrite ``in_dir``'s parquet files into ~target_mb files at
    ``out_dir`` (fresh dir + atomic rename). With ``sort_by``, the
    rewrite CLUSTERS the data on that column (a range-partitioned global
    sort) so the output files carry disjoint footer min/max intervals —
    the Delta OPTIMIZE ZORDER/sort analogue: after long unordered ingest,
    point/range reads prune to O(1) files instead of touching every one
    (the same footer stats delete_rows/merge_rows prune with). The sort
    is the one all-to-all exchange compaction is allowed to spend; plain
    bin-packing stays exchange-free. Returns a summary dict
    {files_in, files_out, rows, bytes_in}."""
    import shutil

    in_dir = Path(in_dir)
    files = sorted(str(p) for p in in_dir.rglob("*.parquet"))
    if not files:
        raise ValueError(f"no parquet files under {in_dir}")
    bytes_in = sum(os.path.getsize(f) for f in files)
    target_bytes = max(1, int(target_mb * (1 << 20)))
    n_out = max(1, -(-bytes_in // target_bytes))  # ceil

    tmp = Path(str(out_dir) + ".compacting")
    shutil.rmtree(tmp, ignore_errors=True)
    ds = rd.read_parquet(files)
    if sort_by is not None:
        ds = ds.sort(sort_by)
    ds.repartition(int(n_out)).write_parquet(str(tmp))

    rows_in = sum(pq.read_metadata(f).num_rows for f in files)
    out_files = sorted(str(p) for p in tmp.rglob("*.parquet"))
    rows_out = sum(pq.read_metadata(f).num_rows for f in out_files)
    if rows_out != rows_in:  # refuse to publish a lossy rewrite
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(f"compaction row mismatch: {rows_in} in, {rows_out} out")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return {
        "files_in": len(files),
        "files_out": len(out_files),
        "rows": rows_out,
        "bytes_in": bytes_in,
    }


def _stats_of_file(path: str) -> list[dict]:
    """Per-column stats of ONE file from its footer only."""
    md = pq.read_metadata(path)
    schema = md.schema.to_arrow_schema()
    acc: dict[str, dict] = {
        name: {"nulls": 0, "min": None, "max": None} for name in schema.names
    }
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name not in acc:  # nested leaf (e.g. list element) — skip
                continue
            a = acc[name]
            st = col.statistics
            if st is None:
                continue
            if st.null_count is not None:
                a["nulls"] += st.null_count
            if st.has_min_max:
                a["min"] = st.min if a["min"] is None else min(a["min"], st.min)
                a["max"] = st.max if a["max"] is None else max(a["max"], st.max)
    import base64
    import pickle

    # min/max cross-file reduction must compare NATIVE values (string repr
    # would sort "9" > "10"); ship them pickled, reduce on the driver
    return [
        {
            "column": name,
            "rows": md.num_rows,
            "nulls": a["nulls"],
            "minmax_b64": base64.b64encode(
                pickle.dumps((a["min"], a["max"]))
            ).decode("ascii"),
        }
        for name, a in acc.items()
    ]


def collect_parquet_stats(in_dir: str | Path) -> "pd.DataFrame":
    """Catalog stats for every column under ``in_dir`` — footer reads only,
    fanned out as Ray tasks over the file list; the per-file rows are tiny
    (columns x files) so the final reduce is a driver-side pandas groupby."""
    import pandas as pd

    files = sorted(str(p) for p in Path(in_dir).rglob("*.parquet"))
    if not files:
        raise ValueError(f"no parquet files under {in_dir}")

    def per_file(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for p in batch["path"].to_pylist():
            rows.extend(_stats_of_file(p))
        return pa.Table.from_pylist(rows)

    parts = (
        rd.from_items([{"path": f} for f in files])
        .map_batches(per_file, batch_format="pyarrow", batch_size=8)
        .to_pandas()  # bounded: columns x files rows of footer metadata
    )

    import base64
    import pickle

    rows = []
    for col, sub in parts.groupby("column"):
        mins, maxs = [], []
        for b in sub.minmax_b64:
            mn, mx = pickle.loads(base64.b64decode(b))
            if mn is not None:
                mins.append(mn)
            if mx is not None:
                maxs.append(mx)
        rows.append(
            {
                "column": col,
                "rows": int(sub.rows.sum()),
                "nulls": int(sub.nulls.sum()),
                "min": repr(min(mins)) if mins else None,
                "max": repr(max(maxs)) if maxs else None,
            }
        )
    return (
        pd.DataFrame(rows).sort_values("column").reset_index(drop=True)
    )


def gc_orphans(
    data_dir: str | Path,
    referenced: set[str],
    *,
    dry_run: bool = True,
) -> "pd.DataFrame":
    """Lakehouse garbage collection: part files in ``data_dir`` that no
    manifest references are ORPHANS (crashed writers, aborted compactions,
    superseded shards — the idempotent sink's deterministic shard names
    [pipelines/extraction.py:121] make the referenced set derivable from
    the inputs alone). Returns a deterministic (file, status) frame sorted
    by name; ``dry_run=True`` (default) only reports, ``dry_run=False``
    unlinks orphans. Listing + unlink are O(files) metadata operations —
    never opens file contents; at 100 TB this is a directory walk, not a
    scan. Deletion is idempotent: a vanished file (concurrent GC) counts
    as already collected."""
    import pandas as pd

    data_dir = Path(data_dir)
    rows = []
    for f in sorted(p for p in data_dir.iterdir() if p.is_file()):
        if f.name in referenced:
            rows.append((f.name, "kept"))
            continue
        if dry_run:
            rows.append((f.name, "orphan"))
            continue
        try:
            f.unlink()
        except FileNotFoundError:
            pass
        rows.append((f.name, "deleted"))
    return pd.DataFrame(rows, columns=["file", "status"])


# --------------------------------------------------------------- snapshots

def _id_high_water(snap_dir: Path) -> int:
    """Highest snapshot id ever EXPIRED from this log (0 if none) — the
    floor below which ids must never be re-allocated. Maintained by
    ``expire_snapshots`` (the only path that removes manifests) as
    creation-only marker files under ``_expired/`` — concurrent expirers
    each create their own marker and the mark is the max over them, so it
    can never go backwards (no read-modify-write race). A commit after a
    full expiry therefore continues the id sequence instead of restarting
    at 1 and violating the immutable-manifest contract."""
    hw_dir = snap_dir / "_expired"
    if not hw_dir.is_dir():
        return 0
    ids = [int(p.name) for p in hw_dir.iterdir() if p.name.isdigit()]
    return max(ids, default=0)


def _raise_id_high_water(snap_dir: Path, sid: int) -> None:
    """Record that ids up to ``sid`` have been expired (idempotent)."""
    hw_dir = snap_dir / "_expired"
    hw_dir.mkdir(exist_ok=True)
    (hw_dir / str(sid)).touch()
    # prune superseded markers — removing ids < sid can't lower the max
    for p in hw_dir.iterdir():
        if p.name.isdigit() and int(p.name) < sid:
            p.unlink(missing_ok=True)


def commit_snapshot(
    table_dir: str | Path,
    files: list[str],
    *,
    op: str = "append",
) -> int:
    """Commit a table SNAPSHOT: an immutable manifest naming exactly the
    part files that make up the table at this version (op='append' extends
    the parent's file list with ``files``; op='replace' makes ``files``
    the complete new list — what a compaction commits). Snapshots live as
    ``_snapshots/<id>.json`` next to the data; the commit writes the FULL
    payload to a private temp file first and publishes it with an atomic
    ``os.link`` onto the next id — link fails with FileExistsError if the
    id is taken, so two racing writers cannot both win one id AND no
    reader (or crash) can ever observe a truncated manifest: the id either
    doesn't exist or holds complete JSON. The loser retries against the
    refreshed parent — a filesystem-native optimistic-concurrency commit
    (the Iceberg/Delta commit protocol shrunk to one primitive). Data
    files are NEVER rewritten or touched: time travel is just reading an
    older manifest. Returns the new snapshot id (1-based)."""
    import json
    import os
    import uuid

    snap_dir = Path(table_dir) / "_snapshots"
    snap_dir.mkdir(parents=True, exist_ok=True)
    while True:
        log = sorted(int(p.stem) for p in snap_dir.glob("*.json"))
        # Ids are NEVER reused, even after expire_snapshots deletes every
        # manifest: allocation consults the persisted high-water mark that
        # expiration maintains, so a reader holding an old id can never
        # silently resolve to a different table version.
        sid = max(log[-1] if log else 0, _id_high_water(snap_dir)) + 1
        if op == "append":
            try:
                prev = (
                    json.loads((snap_dir / f"{log[-1]}.json").read_text())["files"]
                    if log
                    else []
                )
            except FileNotFoundError:
                continue  # parent expired between glob and read: re-glob
            flist = list(dict.fromkeys([*prev, *files]))
        elif op == "replace":
            flist = list(dict.fromkeys(files))
        else:
            raise ValueError(f"op must be 'append' or 'replace', got {op!r}")
        payload = json.dumps({"snapshot_id": sid, "op": op, "files": flist})
        tmp = snap_dir / f".tmp-{uuid.uuid4().hex}"
        tmp.write_text(payload)  # complete payload BEFORE publication
        try:
            os.link(tmp, snap_dir / f"{sid}.json")  # atomic claim of the id
            return sid
        except FileExistsError:
            continue  # lost the race: recompute against the new head
        finally:
            tmp.unlink(missing_ok=True)


def snapshot_log(table_dir: str | Path) -> "pd.DataFrame":
    """The table's snapshot history: (snapshot_id, op, n_files), ascending."""
    import json

    import pandas as pd

    snap_dir = Path(table_dir) / "_snapshots"
    rows = []
    if snap_dir.is_dir():
        for p in sorted(snap_dir.glob("*.json"), key=lambda p: int(p.stem)):
            try:
                d = json.loads(p.read_text())
            except FileNotFoundError:
                continue  # expired between glob and read
            rows.append((d["snapshot_id"], d["op"], len(d["files"])))
    return pd.DataFrame(rows, columns=["snapshot_id", "op", "n_files"])


def read_at_snapshot(
    table_dir: str | Path,
    snapshot_id: int | None = None,
    columns: list[str] | None = None,
) -> "rd.Dataset":
    """TIME TRAVEL: a streaming pruned read of exactly the part files the
    given snapshot (default: current head) references — older versions
    stay readable until ``expire_snapshots`` + ``gc_orphans`` reclaim
    them. O(1) manifest read on the driver; the scan itself is a normal
    ``read_parquet`` over the named files."""
    import json

    snap_dir = Path(table_dir) / "_snapshots"
    ids = sorted(int(p.stem) for p in snap_dir.glob("*.json"))
    if not ids:
        raise FileNotFoundError(f"no snapshots committed under {table_dir}")
    sid = ids[-1] if snapshot_id is None else snapshot_id
    if sid not in ids:
        raise KeyError(f"snapshot {sid} not in log (have {ids[0]}..{ids[-1]})")
    try:
        d = json.loads((snap_dir / f"{sid}.json").read_text())
    except FileNotFoundError:
        # expired between the ids glob and the manifest read — same KeyError
        # contract as the not-in-log path (the guarded pattern the sibling
        # readers use for this race)
        raise KeyError(f"snapshot {sid} expired") from None
    paths = [str(Path(table_dir) / f) for f in d["files"]]
    return rd.read_parquet(paths, columns=columns)


def expire_snapshots(table_dir: str | Path, keep_last: int) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` snapshot manifests
    (their ids are returned). Data files they referenced become orphans
    exactly when NO surviving snapshot references them — feed
    ``live_files`` to ``gc_orphans`` to reclaim the bytes."""
    snap_dir = Path(table_dir) / "_snapshots"
    ids = sorted(int(p.stem) for p in snap_dir.glob("*.json"))
    expired = ids[:-keep_last] if keep_last > 0 else ids
    if expired:
        # raise the never-reuse floor BEFORE unlinking: if we crash mid-way
        # the worst case is a gap in the id sequence, never a reused id
        _raise_id_high_water(snap_dir, expired[-1])
    for sid in expired:
        (snap_dir / f"{sid}.json").unlink(missing_ok=True)
    return expired


def head_files(table_dir: str | Path) -> list[str]:
    """The CURRENT table contents: the newest snapshot's file list (order
    preserved). Distinct from ``live_files`` — that is the union over ALL
    surviving snapshots (the GC keep-set); using the union as "current"
    would resurrect files an earlier replace-commit removed."""
    import json

    snap_dir = Path(table_dir) / "_snapshots"
    ids = sorted(int(p.stem) for p in snap_dir.glob("*.json")) if snap_dir.is_dir() else []
    if not ids:
        raise FileNotFoundError(f"no snapshots committed under {table_dir}")
    try:
        return list(json.loads((snap_dir / f"{ids[-1]}.json").read_text())["files"])
    except FileNotFoundError:
        raise KeyError(f"snapshot {ids[-1]} expired") from None


def live_files(table_dir: str | Path) -> set[str]:
    """Union of every surviving snapshot's file list — the ``referenced``
    set ``gc_orphans`` must keep for time travel to stay sound."""
    import json

    snap_dir = Path(table_dir) / "_snapshots"
    out: set[str] = set()
    if snap_dir.is_dir():
        for p in snap_dir.glob("*.json"):
            try:
                out.update(json.loads(p.read_text())["files"])
            except FileNotFoundError:
                continue  # expired between glob and read
    return out


def delete_rows(
    table_dir: str | Path,
    column: str,
    values: list,
) -> dict:
    """GDPR-style row erasure as a SNAPSHOT COMMIT (the Delta/Iceberg
    DELETE shape): rewrite ONLY the live part files whose footer min/max
    interval can contain a target value — every other file is carried
    into the new snapshot untouched (never re-read, never re-written) —
    then commit a 'replace' manifest naming untouched + rewritten files.
    Rewrites fan out as one Ray task per candidate file (at 100 TB the
    candidates after footer pruning are the unit of parallelism; a file
    whose rows ALL survive keeps its original name and bytes). Older
    snapshots still reference the pre-delete files, so time travel keeps
    working until ``expire_snapshots`` + ``gc_orphans`` reclaim them —
    which IS the erasure retention boundary: run both to make the delete
    physical. Returns {snapshot_id, files_scanned, files_rewritten,
    rows_deleted}.

    Reference parity: the reference erases per-document rows by key
    (ordenes_procesadas UNIQUE archivo_hash upsert/delete surface,
    src/services/feedback.service.js:28-58); this is the same operation
    expressed against immutable parquet + a manifest log."""
    import ray

    table_dir = Path(table_dir)
    snap_dir = table_dir / "_snapshots"
    if snap_dir.is_dir() and any(snap_dir.glob("*.json")):
        # the HEAD manifest, not live_files' all-snapshot union: the union
        # is the GC keep-set and would resurrect files an earlier
        # replace-commit (a previous delete/merge/compaction) removed
        live = sorted(head_files(table_dir))
    else:
        live = sorted(p.name for p in table_dir.glob("*.parquet"))
    if not live:
        raise FileNotFoundError(f"no live part files under {table_dir}")

    vals = sorted(set(values))
    vset = set(vals)

    def _may_contain(path: Path) -> bool:
        md = pq.read_metadata(path)
        saw_stats = False
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema != column:
                    continue
                st = col.statistics
                if st is None or st.min is None or st.max is None:
                    return True  # no stats -> cannot prune
                saw_stats = True
                if any(st.min <= v <= st.max for v in vals):
                    return True
        if not saw_stats:
            # column absent from footer stats entirely -> cannot prune
            return True
        return False

    candidates = [f for f in live if _may_contain(table_dir / f)]

    @ray.remote
    def _rewrite(fname: str) -> tuple[str, str | None, int]:
        import pyarrow.compute as _pc
        import pyarrow.parquet as _pq

        t = _pq.read_table(table_dir / fname)
        mask = _pc.is_in(t[column], value_set=pa.array(vals))
        keep = t.filter(_pc.fill_null(_pc.invert(mask), True))
        dropped = t.num_rows - keep.num_rows
        if dropped == 0:
            return fname, None, 0  # false positive of the stats prune
        import hashlib

        tag = hashlib.sha256(
            ("|".join(map(str, vals)) + "|" + fname).encode()
        ).hexdigest()[:8]
        new_name = f"{Path(fname).stem}.del-{tag}.parquet"
        _pq.write_table(keep, table_dir / new_name)
        return fname, new_name, dropped

    results = ray.get([_rewrite.remote(f) for f in candidates])
    renames = {old: new for old, new, _ in results if new is not None}
    rows_deleted = sum(d for _, _, d in results)
    new_list = [renames.get(f, f) for f in live]
    sid = commit_snapshot(table_dir, new_list, op="replace")
    return {
        "snapshot_id": sid,
        "files_scanned": len(candidates),
        "files_rewritten": len(renames),
        "rows_deleted": int(rows_deleted),
    }


def write_bloom_sidecars(
    data_dir: str | Path,
    column: str,
    fpr: float = 0.01,
) -> dict:
    """FILE-SKIPPING indexes for a secondary int64 column: one Bloom
    sidecar (``<part>.bloom-<column>.npz``: bitmap + k) per part file,
    built by one Ray task per file reading ONLY that column. Footer
    min/max stats (collect_parquet_stats) prune RANGE predicates; they are
    useless for point lookups on a high-cardinality column whose values
    span every file — a per-file Bloom answers "can this file contain
    key X?" with no false negatives at ~10 bits/key. This is parquet's
    own bloom_filter feature rebuilt as an explicit, separately-GC-able
    lake artifact (and the per-file form of stages/bloom.py's join
    filter — same splitmix64 double hashing, so a bitmap built here is
    probe-compatible with the join path). Returns {files, bytes}."""
    import ray

    from medical_ocr_service_ray.stages.bloom import (
        _bit_positions,
        _set_bits,
        bloom_params,
    )

    data_dir = Path(data_dir)
    files = sorted(p for p in data_dir.glob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {data_dir}")

    @ray.remote
    def _one(path: str) -> int:
        import numpy as _np
        import pyarrow.parquet as _pq

        t = _pq.read_table(path, columns=[column])
        keys = _np.unique(_np.asarray(t[column].to_pylist(), dtype=_np.int64))
        m_bits, k = bloom_params(len(keys), fpr)
        bitmap = _np.zeros(m_bits // 8, dtype=_np.uint8)
        if len(keys):
            _set_bits(bitmap, _bit_positions(keys, m_bits, k))
        out = Path(path).with_suffix(f".bloom-{column}.npz")
        with open(out, "wb") as f:
            _np.savez(f, bitmap=bitmap, k=_np.int64(k))
        return out.stat().st_size

    sizes = ray.get([_one.remote(str(p)) for p in files])
    return {"files": len(files), "bytes": int(sum(sizes))}


def bloom_prune_files(
    data_dir: str | Path,
    column: str,
    values: list[int],
) -> tuple[list[str], list[str]]:
    """Split ``data_dir``'s part files into (candidates, skipped) for a
    point lookup on ``column``: a file is a candidate iff its Bloom
    sidecar admits at least one probe value (a missing sidecar always
    makes the file a candidate — skipping is only ever an optimization,
    NEVER correctness: no false negatives by Bloom construction). O(files
    × k) bit probes on the driver, no data read."""
    import numpy as _np

    from medical_ocr_service_ray.stages.bloom import _bit_positions, _test_bits

    data_dir = Path(data_dir)
    probe = _np.asarray(sorted(set(values)), dtype=_np.int64)
    cand, skipped = [], []
    for p in sorted(data_dir.glob("*.parquet")):
        side = p.with_suffix(f".bloom-{column}.npz")
        if not side.exists():
            cand.append(str(p))
            continue
        z = _np.load(side)
        bitmap, k = z["bitmap"], int(z["k"])
        m_bits = _np.uint64(len(bitmap) * 8)
        hit = _test_bits(bitmap, _bit_positions(probe, m_bits, k)).any()
        (cand if hit else skipped).append(str(p))
    return cand, skipped


def point_read_with_blooms(
    data_dir: str | Path,
    column: str,
    values: list[int],
    columns: list[str] | None = None,
) -> "rd.Dataset":
    """Bloom-pruned point read: consult the sidecars, then a normal pruned
    ``read_parquet`` over ONLY the candidate files, filtered to the probe
    values. Returns an (possibly empty) streaming Dataset with exactly the
    matching rows — identical to a full-scan filter, minus the skipped
    files' IO."""
    import pyarrow.dataset as pads

    cand, _ = bloom_prune_files(data_dir, column, values)
    if not cand:
        # typed-empty result: read zero rows via an impossible filter on
        # any one file's schema-bearing path is overkill — just return an
        # empty dataset from an empty list of items
        import ray.data as _rd

        return _rd.from_items([])
    return rd.read_parquet(
        cand,
        columns=columns,
        filter=pads.field(column).isin(list(map(int, values))),
    )


def merge_rows(
    table_dir: str | Path,
    updates: "pa.Table",
    key: str,
) -> dict:
    """MERGE INTO (upsert) as a SNAPSHOT COMMIT — the Delta/Iceberg
    copy-on-write MERGE: every target row whose ``key`` appears in
    ``updates`` is replaced with the update's values (WHEN MATCHED THEN
    UPDATE), and update keys matching no target row are appended as new
    rows (WHEN NOT MATCHED THEN INSERT). Only part files whose footer
    min/max interval on ``key`` can contain an update key are read or
    rewritten — everything else is carried into the new snapshot
    byte-identical. Rewrites fan out one Ray task per candidate file (the
    unit of parallelism at 100 TB); the insert remainder lands in ONE new
    part file; the commit is a 'replace' manifest, so time travel to the
    pre-merge version keeps working until expiration + GC.

    Semantics pinned down:
    - ``updates`` must be unique on ``key`` (two source rows for one key
      is the ambiguous-merge error every lake engine raises).
    - Duplicate keys in the TARGET each get updated (multiplicity is
      preserved, exactly like SQL MERGE's per-target-row update).
    - ``updates`` must carry the full table schema (column-subset updates
      would silently null the missing columns on the rewrite path).

    Reference parity: the reference's idempotent re-ingest upserts by
    archivo_hash (ordenes_procesadas UNIQUE + ON CONFLICT UPDATE,
    database/migration_processing.sql); this is that operation against
    immutable parquet + a manifest log. Returns {snapshot_id,
    files_scanned, files_rewritten, rows_updated, rows_inserted}."""
    import hashlib

    import ray

    table_dir = Path(table_dir)
    snap_dir = table_dir / "_snapshots"
    if snap_dir.is_dir() and any(snap_dir.glob("*.json")):
        live = sorted(head_files(table_dir))
    else:
        live = sorted(p.name for p in table_dir.glob("*.parquet"))
    if not live:
        raise FileNotFoundError(f"no live part files under {table_dir}")

    if not isinstance(updates, pa.Table):
        updates = pa.Table.from_pandas(updates, preserve_index=False)
    import pyarrow.compute as _pc

    n_keys = updates.num_rows
    if n_keys == 0:
        raise ValueError("empty updates table")
    if _pc.count_distinct(updates[key]).as_py() != n_keys:
        raise ValueError(f"updates not unique on {key!r}: ambiguous MERGE")

    # align the updates to the table schema (order + types); missing or
    # extra columns are a contract error, not a silent cast
    tbl_schema = pq.read_schema(table_dir / live[0])
    if set(updates.schema.names) != set(tbl_schema.names):
        raise ValueError(
            f"updates schema {sorted(updates.schema.names)} != table schema "
            f"{sorted(tbl_schema.names)}"
        )
    updates = updates.select(tbl_schema.names).cast(tbl_schema)
    upd_keys = updates[key].combine_chunks()
    vals = sorted(v for v in upd_keys.to_pylist())

    def _may_contain(path: Path) -> bool:
        md = pq.read_metadata(path)
        saw_stats = False
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema != key:
                    continue
                st = col.statistics
                if st is None or st.min is None or st.max is None:
                    return True
                saw_stats = True
                lo, hi = st.min, st.max
                import bisect

                i = bisect.bisect_left(vals, lo)
                if i < len(vals) and vals[i] <= hi:
                    return True
        return not saw_stats

    candidates = [f for f in live if _may_contain(table_dir / f)]
    upd_ref = ray.put(updates)

    @ray.remote
    def _rewrite(fname: str) -> tuple[str, str | None, int, list]:
        import pyarrow.compute as _pc2
        import pyarrow.parquet as _pq

        upd = ray.get(upd_ref) if isinstance(upd_ref, ray.ObjectRef) else upd_ref
        t = _pq.read_table(table_dir / fname)
        mask = _pc2.fill_null(_pc2.is_in(t[key], value_set=upd[key].combine_chunks()), False)
        n_matched = _pc2.sum(_pc2.cast(mask, pa.int64())).as_py() or 0
        if n_matched == 0:
            return fname, None, 0, []
        keep = t.filter(_pc2.invert(mask))
        matched_keys = t.filter(mask)[key]  # multiplicity preserved
        # replacement rows: for each matched target row, the update row of
        # its key (index_in into the unique update keys)
        idx = _pc2.index_in(matched_keys, value_set=upd[key].combine_chunks())
        repl = upd.take(idx)
        out = pa.concat_tables([keep, repl]).combine_chunks()
        tag = hashlib.sha256(
            ("|".join(map(str, vals)) + "|" + fname).encode()
        ).hexdigest()[:8]
        new_name = f"{Path(fname).stem}.mrg-{tag}.parquet"
        _pq.write_table(out, table_dir / new_name)
        seen = _pc2.unique(matched_keys).to_pylist()
        return fname, new_name, n_matched, seen

    results = ray.get([_rewrite.remote(f) for f in candidates])
    renames = {old: new for old, new, _, _ in results if new is not None}
    rows_updated = sum(n for _, _, n, _ in results)
    matched_all: set = set()
    for _, _, _, seen in results:
        matched_all.update(seen)

    new_list = [renames.get(f, f) for f in live]
    insert_mask = _pc.invert(
        _pc.is_in(upd_keys, value_set=pa.array(sorted(matched_all), type=upd_keys.type))
    ) if matched_all else None
    inserts = updates.filter(insert_mask) if insert_mask is not None else updates
    rows_inserted = inserts.num_rows
    if rows_inserted:
        tag = hashlib.sha256(("ins|" + "|".join(map(str, vals))).encode()).hexdigest()[:8]
        ins_name = f"merge-insert-{tag}.parquet"
        pq.write_table(inserts, table_dir / ins_name)
        new_list.append(ins_name)
    sid = commit_snapshot(table_dir, new_list, op="replace")
    return {
        "snapshot_id": sid,
        "files_scanned": len(candidates),
        "files_rewritten": len(renames),
        "rows_updated": int(rows_updated),
        "rows_inserted": int(rows_inserted),
    }


def diff_snapshots(
    table_dir: str | Path,
    from_id: int,
    to_id: int,
) -> dict:
    """FILE-level snapshot diff — the manifest comparison every
    incremental consumer starts from: which part files did the table gain
    / lose between two versions? O(manifest) driver work, no data read.
    Returns {added: [...], removed: [...]} (each sorted). A file that a
    replace-commit rewrote shows up as its old name removed + new name
    added — exactly the copy-on-write signal ``read_changes`` expands to
    row-level delete+insert pairs."""
    import json

    snap_dir = Path(table_dir) / "_snapshots"

    def _files(sid: int) -> set[str]:
        try:
            return set(json.loads((snap_dir / f"{sid}.json").read_text())["files"])
        except FileNotFoundError:
            raise KeyError(f"snapshot {sid} not in log or expired") from None

    a, b = _files(from_id), _files(to_id)
    return {"added": sorted(b - a), "removed": sorted(a - b)}


def read_changes(
    table_dir: str | Path,
    from_id: int,
    to_id: int,
    columns: list[str] | None = None,
) -> "rd.Dataset":
    """ROW-level change feed (CDC) between two snapshots — the Delta
    change-data-feed shape for a copy-on-write table WITHOUT per-commit
    change files: rows in files the table gained stream out tagged
    ``_change_type='insert'``, rows in files it lost tagged ``'delete'``.
    A row rewritten in place (same values, file renamed by a
    delete/merge rewrite) therefore appears as a delete+insert PAIR — the
    standard copy-on-write CDC contract (consumers reconcile by key).
    Requires the ``from`` snapshot's files to still exist on disk (i.e.
    GC has not reclaimed them): raises FileNotFoundError otherwise, never
    a silent partial feed. Streaming pruned reads over ONLY the changed
    files; unchanged files are never opened."""
    d = diff_snapshots(table_dir, from_id, to_id)
    table_dir = Path(table_dir)
    missing = [f for f in (*d["added"], *d["removed"]) if not (table_dir / f).exists()]
    if missing:
        raise FileNotFoundError(
            f"change feed {from_id}->{to_id} needs GC-reclaimed files: {missing}"
        )

    def _tag(kind: str):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_change_type", pa.array([kind] * t.num_rows, type=pa.string())
            )

        return f

    legs = []
    if d["added"]:
        legs.append(
            rd.read_parquet([str(table_dir / f) for f in d["added"]], columns=columns)
            .map_batches(_tag("insert"), batch_format="pyarrow")
        )
    if d["removed"]:
        legs.append(
            rd.read_parquet([str(table_dir / f) for f in d["removed"]], columns=columns)
            .map_batches(_tag("delete"), batch_format="pyarrow")
        )
    if not legs:
        return rd.from_items([])
    out = legs[0]
    for leg in legs[1:]:
        out = out.union(leg)
    return out
