"""Broadcast-join / lookup stages.

All of the reference's joins are small-dimension lookups (SURVEY.md §2.4
J1-J8): the small side is materialized ONCE, published to the object store
with ``ray.put``, and read by every task/actor via its ObjectRef — never
re-shipped per batch, never a distributed shuffle join.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray


def put_lookup_dict(parquet_path: str | Path, key_col: str, value_cols: list[str]):
    """Load a small dimension table and publish {key: (values...)} once.
    Returns the ObjectRef (pass it into stage constructors)."""
    table = pq.read_table(parquet_path, columns=[key_col, *value_cols])
    keys = table[key_col].to_pylist()
    if len(value_cols) == 1:
        vals = table[value_cols[0]].to_pylist()
        mapping = dict(zip(keys, vals))
    else:
        cols = [table[c].to_pylist() for c in value_cols]
        mapping = {k: tuple(c[i] for c in cols) for i, k in enumerate(keys)}
    return ray.put(mapping)


def put_key_set(parquet_path: str | Path, key_col: str):
    """Broadcast the key set of a small table (semi/anti-join side)."""
    table = pq.read_table(parquet_path, columns=[key_col])
    return ray.put(set(table[key_col].to_pylist()))


class BroadcastMapper:
    """map_batches actor: append columns looked up from a broadcast dict.

    ``mapping_ref`` resolves once per actor in ``__init__`` (ST5 analogue:
    src/services/rag.service.js:130-189 top-k dim snapshot in each worker).
    Missing keys yield nulls (left-join semantics; anti-join capture J7)."""

    def __init__(self, mapping_ref, key_col: str, out_cols: list[str], out_types: list[pa.DataType]):
        self.mapping = ray.get(mapping_ref)
        self.key_col = key_col
        self.out_cols = out_cols
        self.out_types = out_types
        self.single = len(out_cols) == 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        if self.single:
            vals = [self.mapping.get(k) for k in keys]
            return batch.append_column(self.out_cols[0], pa.array(vals, self.out_types[0]))
        rows = [self.mapping.get(k) for k in keys]
        for j, (name, typ) in enumerate(zip(self.out_cols, self.out_types)):
            batch = batch.append_column(
                name, pa.array([r[j] if r is not None else None for r in rows], typ)
            )
        return batch


class SemiAntiFilter:
    """map_batches actor: keep rows whose key is (semi) / is not (anti) in a
    broadcast key set — J5/J7 semantics without any shuffle."""

    def __init__(self, key_set_ref, key_col: str, anti: bool = False):
        self.keys = ray.get(key_set_ref)
        self.key_col = key_col
        self.anti = anti

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.key_col].to_pylist()
        member = np.fromiter((k in self.keys for k in col), dtype=bool, count=len(col))
        mask = ~member if self.anti else member
        return batch.filter(pa.array(mask))
