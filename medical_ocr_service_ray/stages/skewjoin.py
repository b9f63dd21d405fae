"""Skew-aware (salted) large-large inner join.

A hash join's unit of work is one key's rows; a hot key (one customer with
10% of all events, a null-ish default id, a viral document) lands its whole
row set in ONE bucket task and the exchange's wall-time becomes that task.
The standard fix, implemented here:

1. **Detect** — per-batch partial key counts, driver-combined (bounded:
   each batch contributes its top few candidates only), flag keys above a
   row-fraction threshold. O(batches × top_per_batch) driver rows.
2. **Salt** — left rows with a hot key get a salt in ``[0, fanout)``
   derived from their position (salting only moves rows BETWEEN tasks —
   join output is salt-invariant, so batch-dependent salts are safe);
   cold rows take salt 0.
3. **Replicate** — right rows with a hot key are duplicated into ALL
   ``fanout`` salts (the small price that buys the split); cold rows take
   salt 0.
4. **One exchange** — tag-union both sides, hash-bucket on (key, salt),
   vectorized pandas merge per bucket. A hot key's work is now spread over
   ``fanout`` tasks instead of one.

Reference analogue: the read-side joins (SURVEY.md §2.4 J8) at fact×fact
scale where the reference's SQL engine handled skew for it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data as rd

from medical_ocr_service_ray.stages.aggregate import bucket_of, bucketed_combine


def detect_hot_keys(
    ds: "rd.Dataset",
    key_col: str,
    *,
    threshold_frac: float = 0.01,
    top_per_batch: int = 20,
    batch_size: int = 262144,
) -> set[int]:
    """Keys holding more than ``threshold_frac`` of all rows. Per-batch
    top-``top_per_batch`` counts + the batch's row count stream to the
    driver (bounded: top_per_batch+0 rows per batch); a key hot globally at
    fraction f is hot in some batch, so the candidate set contains every
    truly hot key whenever top_per_batch is not absurdly small. Candidate
    sums are exact only over batches where the key ranked top-N — an
    UNDERcount — so the final >= threshold check can only miss borderline
    keys (which by definition barely matter), never split a cold key."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df[key_col].value_counts().head(top_per_batch)
        out = pd.DataFrame({"k": g.index.to_numpy().astype("int64"),
                            "c": g.to_numpy().astype("int64")})
        out["rows"] = np.int64(0)
        # one marker row per batch carrying the batch size
        marker = pd.DataFrame({"k": [np.int64(-(2**62))], "c": [np.int64(0)],
                               "rows": [np.int64(len(df))]})
        return pd.concat([out, marker], ignore_index=True)

    cand = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size).to_pandas()
    if cand.empty:
        return set()
    n_total = int(cand.rows.sum())
    if n_total == 0:
        return set()
    sums = cand[cand.rows == 0].groupby("k")["c"].sum()
    return set(sums[sums >= threshold_frac * n_total].index.astype(int))


def salted_inner_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    key_col: str,
    *,
    hot_keys: set[int],
    fanout: int = 8,
    num_buckets: int = 16,
    map_batch_size: int = 1 << 18,
    left_schema=None,
    right_schema=None,
) -> "rd.Dataset":
    """Exact inner join of two Datasets on int64 ``key_col`` with hot keys
    split over ``fanout`` salts. Column sets must be disjoint apart from the
    key. Output rows = the SQL inner join's rows (order unspecified). Pass
    the pyarrow schemas when known (``Dataset.schema()`` on a mapped lineage
    executes a sample task)."""
    import pyarrow as pa

    hot_ref = ray.put(np.array(sorted(hot_keys), dtype="int64"))
    left_schema = left_schema if left_schema is not None else left.schema()
    right_schema = right_schema if right_schema is not None else right.schema()

    def _dtypes(schema) -> dict:
        return {
            n: (t.to_pandas_dtype() if isinstance(t, pa.DataType) else t)
            for n, t in zip(schema.names, schema.types)
        }

    want_dtypes = {**_dtypes(left_schema), **_dtypes(right_schema)}

    def salt_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        keys = df[key_col].to_numpy().astype("int64")
        hot = np.isin(keys, ray.get(hot_ref))
        salt = np.zeros(len(df), dtype="int64")
        # position-derived salt: distributes a hot key's rows uniformly;
        # join output is salt-invariant so batch-dependence is safe
        salt[hot] = np.arange(int(hot.sum()), dtype="int64") % fanout
        df["__salt"] = salt
        df["__side"] = np.int8(0)
        return df

    def replicate_right(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[key_col].to_numpy().astype("int64")
        hot = np.isin(keys, ray.get(hot_ref))
        cold = df[~hot].copy()
        cold["__salt"] = np.int64(0)
        parts = [cold]
        hot_rows = df[hot]
        if len(hot_rows):
            rep = hot_rows.loc[hot_rows.index.repeat(fanout)].copy()
            rep["__salt"] = np.tile(np.arange(fanout, dtype="int64"), len(hot_rows))
            parts.append(rep)
        out = pd.concat(parts, ignore_index=True)
        out["__side"] = np.int8(1)
        return out

    l_tagged = left.map_batches(salt_left, batch_format="pandas", batch_size=map_batch_size)
    r_tagged = right.map_batches(
        replicate_right, batch_format="pandas", batch_size=map_batch_size
    )

    left_cols = list(left_schema.names)
    right_cols = [c for c in right_schema.names if c != key_col]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        # composite (key, salt) bucket: a hot key's salts land in DIFFERENT
        # buckets, which is the entire point
        comp = df[key_col].to_numpy().astype("int64") * np.int64(31) + df["__salt"].to_numpy()
        df["__bucket"] = bucket_of(pd.Series(comp), num_buckets)
        return df

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # union-padding turned absent columns into nulls and upcast the
        # survivors (int64 -> float64): cast the join keys back BEFORE the
        # merge and the value columns after. Caveat (same as the Bloom
        # join's restore): int64 keys beyond 2^53 would lose precision in
        # the float detour — use hashed-down keys if ids ever get that wide
        l = df.loc[df.__side == 0, [*left_cols, "__salt"]].astype(
            {key_col: "int64", "__salt": "int64"}
        )
        r = df.loc[df.__side == 1, [key_col, *right_cols, "__salt"]].astype(
            {key_col: "int64", "__salt": "int64"}
        )
        merged = l.merge(r, on=[key_col, "__salt"])[[*left_cols, *right_cols]]
        changed = {
            c: t for c, t in want_dtypes.items()
            if c in merged.columns and str(merged[c].dtype) != str(t)
        }
        return merged.astype(changed) if changed else merged

    unioned = l_tagged.union(r_tagged)
    stamped = unioned.map_batches(add_bucket, batch_format="pandas", batch_size=map_batch_size)
    return stamped.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
