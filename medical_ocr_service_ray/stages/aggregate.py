"""Aggregation helpers: partial pre-aggregation + bucketed vectorized combine.

Ray's built-in ``groupby().aggregate()`` accumulates per row in Python — fine
for narrow cases, pathological for many groups (~650 rows/s observed). The
scalable pattern used across this engine instead:

1. **partial**: inside ``map_batches`` do a vectorized pandas groupby per
   batch, emitting one row per (key, batch) — shrinks data by the batch/key
   ratio BEFORE any shuffle (SURVEY.md §2.5 A7, metrics partial-aggregation).
2. **combine**: add an int bucket column (hash of the first key), shuffle once
   on that bucket (few distinct values => cheap sort shuffle), and run ONE
   vectorized pandas groupby per bucket via ``map_groups``.

Bucket count bounds per-task memory: at 100 TB choose
``num_buckets ~ partial_bytes / 1 GiB``. Rows with equal first key share a
bucket, so grouping by the full key inside a bucket is complete.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

import ray.data as rd


def auto_num_buckets(
    input_bytes: int,
    per_bucket_bytes: int = 1 << 30,
    lo: int = 16,
    hi: int = 4096,
) -> int:
    """Derive the bucket count from input size so per-bucket state (e.g. the
    verify-join's in-task text dict, dedup.py) is bounded BY DESIGN:
    ``buckets ~ bytes / 1 GiB`` (the module-docstring sizing rule), clamped to
    [lo, hi]. A fixed default of 16 puts corpus/16 bytes in one task heap at
    100 TB; this keeps it ~per_bucket_bytes regardless of corpus size."""
    import math

    return max(lo, min(hi, math.ceil(max(0, input_bytes) / per_bucket_bytes)))


def compute_num_buckets(input_bytes: int, per_bucket_bytes: int = 1 << 30) -> int:
    """``auto_num_buckets`` with an additional floor of 2x the cluster CPU
    count, for bucketed combines whose per-bucket kernel is COMPUTE-heavy
    (pair expansion, wedge closure, shingle verify): the byte rule alone
    floors at 16 buckets, which caps those kernels at 16 concurrent tasks
    and strands half a 32-CPU node (measured: the q100 pair expansion at
    sf0.1/32 drops 3.97 s -> 1.07 s going 16 -> 64 buckets). At real scale
    the byte rule dominates anyway; the CPU floor only lifts small-input
    runs. Every per-bucket kernel is partition-count-invariant by the
    engine-wide contract, so bucket count is a pure performance knob —
    EXCEPT q130's checksum, whose SQL oracle mirrors a FIXED 16 and must
    not route through this helper."""
    import ray

    try:
        min_parallel = int(ray.cluster_resources().get("CPU", 8)) * 2
    except Exception:
        min_parallel = 16
    return max(auto_num_buckets(input_bytes, per_bucket_bytes), min_parallel)


def pool_width(frac: float = 0.75, lo: int = 8) -> int:
    """Upper bound for an actor-pool's ``concurrency=(1, N)``: a fixed N
    caps the pool regardless of cluster size (the MinHash banding stage
    measured 7.8 s -> 3.9 s at sf0.1/32 going 8 -> 24 actors). ``frac`` of
    the cluster's CPUs, floored at ``lo``, leaves headroom for the
    downstream exchange stages running concurrently."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", lo))
    except Exception:
        cpus = lo
    return max(lo, int(cpus * frac))


def dataset_input_bytes(ds: "rd.Dataset") -> int:
    """Best-effort input size WITHOUT executing the dataset: sum of the
    source files' on-disk sizes (0 when unavailable, e.g. from_arrow)."""
    import os

    try:
        return sum(
            os.path.getsize(f) for f in ds.input_files() if os.path.exists(f)
        )
    except Exception:
        return 0


def bucket_of(series: pd.Series, num_buckets: int) -> pd.Series:
    """Deterministic bucket id (modulo for ints; vectorized siphash via
    ``pd.util.hash_array`` with its fixed default key for everything else) —
    stable across processes, unlike Python's salted hash(). The string path
    used to be a per-row Python crc32 map: on a shingle-explode shuffle
    (millions of short strings) the vectorized hash is the difference
    between the bucket stamp being free and being the hot spot."""
    if series.dtype.kind in "iu":
        return (series.astype("int64") % num_buckets).astype("int32")
    vals = pd.util.hash_array(series.astype(str).to_numpy(dtype=object))
    return (vals % num_buckets).astype("int32")


def bucket_of_arrow(col, num_buckets: int):
    """Arrow-column twin of ``bucket_of`` — SAME bucket values (int64 modulo;
    siphash of the str() rendering otherwise), computed without converting
    the rest of the table to pandas. A NULL in an int column would make the
    fast path cast through NaN (undefined int), so nullable int columns take
    the pandas twin verbatim — identical buckets to a pandas-lineage block
    of the same data."""
    import pyarrow as pa

    import numpy as np

    if pa.types.is_integer(col.type) and col.null_count == 0:
        v = col.to_numpy(zero_copy_only=False).astype("int64", copy=False)
        return pa.array((v % num_buckets).astype("int32"))
    # bucket_of returns a Series on the int branch, an ndarray on the hash
    # branch — normalize both ends
    vals = bucket_of(pd.Series(col.to_pandas()), num_buckets)
    return pa.array(np.asarray(vals, dtype="int32"))


def bucketed_combine(
    ds: "rd.Dataset",
    first_key: str,
    combine_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 16,
    map_batch_size: int | None = None,
) -> "rd.Dataset":
    """Shuffle once on hash(first_key) % num_buckets, then run ``combine_fn``
    (a vectorized pandas reduction) once per bucket.

    ``map_batch_size``: when the input arrives as MANY TINY blocks (e.g. a
    pre-filter that kept a sliver of each block), the all-to-all's cost is
    per-block task overhead, not bytes — pass a large batch size so the
    bucket-stamp pass bundles blocks back together first (measured on the
    Bloom join: Sort 5.9 s -> sub-second at identical row counts)."""

    def add_bucket(batch):
        # batch_format=None hands over the NATIVE block: Arrow lineages
        # (read_parquet-fed callers) stamp via zero-copy append_column with
        # no Arrow->pandas round-trip of the payload columns; pandas
        # lineages (partial outputs, incl. object-dtype cells Arrow can't
        # hold) keep the exact legacy path. Bucket VALUES are identical on
        # both branches (bucket_of/bucket_of_arrow twins) — q130's SQL
        # oracle mirrors the int-modulo stamp bit-for-bit.
        import pyarrow as pa

        if isinstance(batch, pa.Table):
            return batch.append_column(
                "__bucket", bucket_of_arrow(batch[first_key], num_buckets)
            )
        df = batch.copy()
        df["__bucket"] = bucket_of(df[first_key], num_buckets)
        return df

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return combine_fn(df.drop(columns="__bucket"))

    kw = {"batch_size": map_batch_size} if map_batch_size is not None else {}
    return (
        ds.map_batches(add_bucket, batch_format=None, zero_copy_batch=True, **kw)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def partial_then_combine(
    ds: "rd.Dataset",
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    first_key: str,
    combine_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 16,
    batch_size: int = 65536,
) -> "rd.Dataset":
    """The full pattern: per-batch partial -> bucketed vectorized combine."""
    partials = ds.map_batches(partial_fn, batch_format="pandas", batch_size=batch_size)
    return bucketed_combine(partials, first_key, combine_fn, num_buckets)


def driver_combine(
    ds: "rd.Dataset",
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    combine_fn: Callable[[pd.DataFrame], pd.DataFrame],
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Partial per batch, final combine on the driver. ONLY for provably
    bounded key cardinality (dashboards / manifest roll-ups: partial output is
    blocks x cardinality rows, all tiny)."""
    partials = ds.map_batches(partial_fn, batch_format="pandas", batch_size=batch_size)
    return combine_fn(partials.to_pandas())
