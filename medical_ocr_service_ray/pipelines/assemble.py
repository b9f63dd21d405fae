"""Per-conversation document assembly + event sessionization.

- ``assemble_conversations``: the T7 stable-ordering invariant made visible:
  all turns of a conversation are grouped, sorted by ``turn_idx``, and joined
  into one document (role-prefixed lines) — the analogue of the reference's
  header + ordered-details assembly (``visacion_previa`` + details ORDER BY
  item, src/services/pre-visacion.service.js:308-338) and its observations
  text builder (M12, :265-297).

- ``sessionize_events``: streaming-shaped session windows (gap-based) per
  user. Ray Data has no watermarks; ordering comes from the key: all events
  of a user are co-located by the bucket shuffle and sorted by (ts, event_id)
  inside the combine (SURVEY.md §2.9 ordering-by-key rule).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from medical_ocr_service_ray.stages.aggregate import partial_then_combine


def assemble_conversations(extracted: "rd.Dataset", num_buckets: int = 16) -> "rd.Dataset":
    """(conv_id) -> one row: ordered concatenation of extracted turn texts.

    Returns columns: conv_id, n_turns, document (role-prefixed lines),
    doc_chars. Deterministic under any physical input order: the per-bucket
    combine sorts by (conv_id, turn_idx) before joining."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # no pre-reduction possible (need every turn); pass through the
        # needed columns only to shrink the shuffle payload
        return df[["conv_id", "turn_idx", "role", "extracted_text"]]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        lines = df.role.str.upper() + ": " + df.extracted_text
        g = pd.DataFrame({"conv_id": df.conv_id, "line": lines}).groupby(
            "conv_id", as_index=False, sort=True
        )
        out = g.agg(n_turns=("line", "size"), document=("line", "\n".join))
        out["n_turns"] = out.n_turns.astype("int64")
        out["doc_chars"] = out.document.str.len().astype("int64")
        return out[["conv_id", "n_turns", "document", "doc_chars"]]

    return partial_then_combine(extracted, partial, "conv_id", combine, num_buckets=num_buckets)


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def sessionize_events(events: "rd.Dataset", num_buckets: int = 16) -> "rd.Dataset":
    """Gap-based sessionization per user: a new session starts when the gap
    since the previous event exceeds 30 minutes.

    Returns one row per session: user_id, session_idx (0-based, in ts order),
    n_events, start_ts, end_ts. SQL-expressible via window functions (the
    oracle uses LAG + a running SUM of new-session flags)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["user_id", "event_id", "ts"]]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(drop=True)
        # normalize the unit explicitly: a ns-backed frame (older pandas /
        # ns-unit parquet) would otherwise compare nanoseconds against the
        # microsecond gap constant and make every event its own session
        ts_us = df.ts.astype("datetime64[us]").astype("int64")
        prev = ts_us.groupby(df.user_id).shift(1)
        new_session = (prev.isna() | ((ts_us - prev) > SESSION_GAP_US)).astype("int64")
        df["session_idx"] = new_session.groupby(df.user_id).cumsum() - 1
        g = df.groupby(["user_id", "session_idx"], as_index=False).agg(
            n_events=("event_id", "size"), start_ts=("ts", "min"), end_ts=("ts", "max")
        )
        g["n_events"] = g.n_events.astype("int64")
        g["session_idx"] = g.session_idx.astype("int64")
        return g[["user_id", "session_idx", "n_events", "start_ts", "end_ts"]]

    return partial_then_combine(events, partial, "user_id", combine, num_buckets=num_buckets)
