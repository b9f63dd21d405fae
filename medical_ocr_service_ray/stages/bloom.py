"""Bloom-filter pre-filtered large-large semi / anti join.

The broadcast path (``stages/join.py:SemiAntiFilter``, J5/J7) needs the
build side's KEY SET to fit in one object — fine for dimensions, wrong when
both sides are fact-scale. The scalable alternative implemented here
(reference analogue: the NOT-EXISTS ingestion reconciliation,
database/migration_ingestion_jobs.sql — at its scale a set lookup; re-done
for 100 TB):

1. **Bloom build** — per-batch partial Bloom bitmaps over the build side's
   keys (a fixed ``m_bits/8``-byte numpy array each, independent of row
   count), streamed to a driver OR with no exchange (see ``build_bloom``
   for why a broadcastable filter never needs more).
2. **Probe pre-filter** — one ``map_batches`` pass stamps each probe row
   with the Bloom verdict. Definite negatives (no false negatives ever) are
   resolved WITHOUT any exchange: dropped for semi, emitted directly for
   anti. Only possible-positives — build-hit-rate + FPR of the probe —
   continue.
3. **Exact membership** — possible-positives and the build keys are
   tag-unioned and hash-bucketed in ONE exchange; a per-bucket vectorized
   ``isin`` finishes the join exactly. Bloom false positives die here, so
   results are exact (SQL-oracle-able) while the exchange moved only the
   surviving fraction of the probe side.

Hashing is splitmix64 double-hashing — pure int64 arithmetic, vectorized,
deterministic across processes (no salted Python ``hash``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from medical_ocr_service_ray.stages.aggregate import bucketed_combine

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (public-domain mixer)."""
    with np.errstate(over="ignore"):
        x = (x + _C1).astype(np.uint64)
        x ^= x >> np.uint64(30)
        x *= _C2
        x ^= x >> np.uint64(27)
        x *= _C3
        x ^= x >> np.uint64(31)
    return x


def bloom_params(n_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for ``n_keys`` at the target false-positive rate;
    m rounded up to a byte multiple. Standard formulas."""
    n = max(1, n_keys)
    m = max(64, int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))))
    m = (m + 7) // 8 * 8
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _bit_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: h1 + i*h2 mod m."""
    x = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(x)
    h2 = _splitmix64(x ^ _C1) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        return (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(bitmap, flat >> np.uint64(3), np.uint8(1) << (flat & np.uint64(7)).astype(np.uint8))


def _test_bits(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Row-wise AND over the k probes -> membership mask."""
    bits = (bitmap[(pos >> np.uint64(3)).reshape(-1)] >> (pos & np.uint64(7)).astype(np.uint8).reshape(-1)) & 1
    return bits.reshape(pos.shape).all(axis=1)


def build_bloom(
    keys_ds: "rd.Dataset", key_col: str, m_bits: int, k: int, batch_size: int = 262144
) -> bytes:
    """Distributed Bloom build over an int64 key column. Returns the merged
    bitmap bytes (``m_bits/8`` long).

    Per-batch partial bitmaps stream to a driver OR with NO exchange —
    driver traffic is ``num_partials × m/8`` bytes, and the OR holds one
    partial at a time. With the big ``batch_size`` this is a few KB-to-MB
    per partial for any filter that makes sense to broadcast (the merged
    bitmap must fit in one object anyway). If the build side ever needed a
    filter too large to broadcast, the right design is different in kind,
    not degree: hash-exchange the keys once and keep PARTITIONED sub-blooms
    colocated with a partitioned probe — don't scale this function."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        keys = df[key_col].to_numpy()
        if len(keys):
            _set_bits(bitmap, _bit_positions(keys, m_bits, k))
        return pd.DataFrame({"bloom": [bitmap.tobytes()]})

    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    partials = keys_ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    for batch in partials.iter_batches(batch_size=64, batch_format="pandas"):
        for b in batch.bloom:
            merged |= np.frombuffer(b, dtype=np.uint8)
    return merged.tobytes()


def _stamp_batch(batch, *, bloom_ref, key_col: str, m_bits: int, k: int, keep: bool):
    """Task-pool stamp: keep rows whose Bloom verdict matches ``keep``
    (True = possible member, False = definite non-member). A plain task —
    not an actor pool — because the anti path forks the stamped lineage into
    two branches; two actor pools on a small cluster can starve the
    read/sort tasks. ``ray.get`` of the bitmap inside the task is a local
    zero-copy plasma read (the broadcast pattern), not a per-batch ship.
    Native-block dual path (batch_format=None): the probe is usually a raw
    parquet read, so the Arrow branch filters zero-copy instead of paying an
    Arrow->pandas conversion of every probe column just to drop rows."""
    bitmap = np.frombuffer(ray.get(bloom_ref), dtype=np.uint8)
    is_arrow = isinstance(batch, pa.Table)
    keys = (
        batch[key_col].to_numpy(zero_copy_only=False)
        if is_arrow
        else batch[key_col].to_numpy()
    )
    maybe = (
        _test_bits(bitmap, _bit_positions(keys, m_bits, k))
        if len(keys)
        else np.zeros(0, dtype=bool)
    )
    mask = maybe if keep else ~maybe
    return batch.filter(pa.array(mask)) if is_arrow else batch[mask]


def bloom_semi_join(
    probe: "rd.Dataset",
    build_keys: "rd.Dataset",
    key_col: str,
    *,
    n_build_keys: int,
    anti: bool = False,
    fpr: float = 0.01,
    num_buckets: int | None = None,
    probe_schema: "pa.Schema | None" = None,
) -> "rd.Dataset":
    """EXACT semi (or anti) join of ``probe`` against the int64 key column
    ``key_col`` of ``build_keys``, with a Bloom pre-filter so only the
    possibly-matching fraction of the probe side enters the exchange.
    ``n_build_keys`` sizes the filter (an estimate is fine — it only moves
    the FPR, never correctness). Pass ``probe_schema`` when the caller knows
    it — ``Dataset.schema()`` on a mapped lineage executes a sample task,
    a measurable constant per call."""
    if num_buckets is None:
        # byte rule + CPU floor (compute-heavy membership kernel): measured
        # q86 6.7 -> 5.6 s at sf0.1/32 going 16 -> 64 buckets
        from medical_ocr_service_ray.stages.aggregate import (
            compute_num_buckets,
            dataset_input_bytes,
        )

        num_buckets = compute_num_buckets(dataset_input_bytes(probe))
    m_bits, k = bloom_params(n_build_keys, fpr)
    bloom_ref = ray.put(build_bloom(build_keys, key_col, m_bits, k))
    kw = dict(bloom_ref=bloom_ref, key_col=key_col, m_bits=m_bits, k=k)

    # possible members -> the exchange; definite negatives (anti only) are
    # resolved with NO exchange. The two branches fork the probe lineage, so
    # anti scans the probe twice — still far cheaper than shuffling all of it
    # when the build-hit rate is low.
    # explicit batch_size bundles the read's split blocks (a single parquet
    # file arrives as ~64 slivers): without it every map stage here runs one
    # tiny task per sliver and the pipeline is task-overhead-bound
    positives = probe.map_batches(
        _stamp_batch, fn_kwargs=dict(keep=True, **kw), batch_format=None,
        zero_copy_batch=True, batch_size=1 << 18,
    )
    negatives = probe.map_batches(
        _stamp_batch, fn_kwargs=dict(keep=False, **kw), batch_format=None,
        zero_copy_batch=True, batch_size=1 << 18,
    )

    # exact membership for the possible-positives: tag-union with the build
    # keys, ONE hash-bucketed exchange, vectorized isin per bucket
    if probe_schema is None:
        probe_schema = probe.schema()
    probe_cols = list(probe_schema.names)
    # the union pads build-side rows with nulls, upcasting e.g. int64 ->
    # float64 in the concatenated bucket frame; record the probe's pandas
    # dtypes so the changed columns can be cast back after the padded rows
    # are dropped. schema().types is Arrow types for parquet-backed datasets
    # and numpy dtypes for pandas-backed ones — normalize both.
    probe_dtypes = {
        n: (t.to_pandas_dtype() if isinstance(t, pa.DataType) else t)
        for n, t in zip(probe_schema.names, probe_schema.types)
    }

    def tag_probe(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__tag"] = np.int8(0)
        return df

    def tag_build(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key_col: df[key_col].astype("int64").unique()})
        out["__tag"] = np.int8(1)
        return out

    unioned = positives.map_batches(tag_probe, batch_format="pandas", batch_size=1 << 18).union(
        build_keys.map_batches(tag_build, batch_format="pandas", batch_size=1 << 18)
    )

    def membership(df: pd.DataFrame) -> pd.DataFrame:
        keys = df.loc[df.__tag == 1, key_col].unique()
        rows = df[df.__tag == 0]
        hit = rows[key_col].isin(keys)
        out = rows[~hit] if anti else rows[hit]
        out = out[probe_cols]
        changed = {c: t for c, t in probe_dtypes.items() if str(out[c].dtype) != str(t)}
        return out.astype(changed) if changed else out

    # the stamp pass keeps a sliver of each probe block, so the union is
    # many tiny blocks — bundle them before the exchange or the sort pays
    # per-block task overhead instead of bytes
    exact = bucketed_combine(
        unioned, key_col, membership, num_buckets=num_buckets, map_batch_size=1 << 18
    )
    return exact.union(negatives) if anti else exact
