"""As-of (temporal) join: for each left event, the latest right row with
ts <= event ts for the same key.

Neither the reference nor plain Ray Data has this operator; the guide's
pattern applies: bucket BOTH sides on the join key, then ``pd.merge_asof``
per bucket over sorted frames. The two sides travel through one union'd
dataset with a side tag and a unified schema, so the single bucket shuffle
co-locates every row of a key (SURVEY.md §2.4 mapping for range/as-of).

Tie discipline: right rows are pre-reduced to one row per (key, ts) —
max(orderkey) wins — BEFORE the as-of, because merge_asof/ASOF-JOIN tie
behavior is engine-specific; the DuckDB oracle applies the identical
reduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from medical_ocr_service_ray.stages.aggregate import bucketed_combine


def asof_join_events_orders(
    events: "rd.Dataset", orders: "rd.Dataset", num_buckets: int = 16
) -> "rd.Dataset":
    """events(user_id, event_id, ts) ASOF orders(o_custkey, o_orderdate,
    o_orderkey) on user_id + 1 == o_custkey AND o_orderdate <= ts (inner).
    Returns (event_id, user_id, matched_orderkey)."""

    # Arrow-native tag preps (VERDICT r3 ask #6): zero-copy payload columns,
    # constants as numpy fills; the per-bucket merge_asof kernel stays pandas
    def prep_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "user_key": pc.add(t["user_id"].cast(pa.int64()), pa.scalar(1, pa.int64())),
                "side": pa.array(np.zeros(n, np.int64)),
                "event_id": t["event_id"].cast(pa.int64()),
                "ts": t["ts"],
                "okey": pa.array(np.full(n, -1, np.int64)),
            }
        )

    def prep_orders(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "user_key": t["o_custkey"].cast(pa.int64()),
                "side": pa.array(np.ones(n, np.int64)),
                "event_id": pa.array(np.full(n, -1, np.int64)),
                "ts": t["o_orderdate"],
                "okey": t["o_orderkey"].cast(pa.int64()),
            }
        )

    unified = events.map_batches(
        prep_events, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        orders.map_batches(prep_orders, batch_format="pyarrow", zero_copy_batch=True)
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df.side == 0][["user_key", "event_id", "ts"]]
        od = df[df.side == 1][["user_key", "ts", "okey"]]
        if ev.empty or od.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "matched_orderkey": pd.Series(dtype="int64"),
                }
            )
        # deterministic tie reduction: one right row per (key, ts)
        od = od.groupby(["user_key", "ts"], as_index=False).agg(okey=("okey", "max"))
        ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
        od = od.sort_values(["ts", "user_key"], kind="mergesort")
        merged = pd.merge_asof(ev, od, on="ts", by="user_key", direction="backward")
        merged = merged[merged.okey.notna()]
        return pd.DataFrame(
            {
                "event_id": merged.event_id.astype("int64"),
                "user_id": (merged.user_key - 1).astype("int64"),
                "matched_orderkey": merged.okey.astype("int64"),
            }
        )

    return bucketed_combine(unified, "user_key", combine, num_buckets=num_buckets)
