"""Agent-ops / conversation-quality analytics over the transcript corpus.

The reference instruments its worker loop end to end — per-batch status
roll-ups and retry budgets (src/services/queue.service.js), per-document
processing-time metrics (src/services/metrics.service.js) — and this module
carries the equivalent OPERATIONAL analytics for an LLM agent-serving stream
over the north-rule transcript table (conv_id, turn_idx, role, text, tool,
ts): inactivity sessionization, tool-retry loops, canned-response detection,
dialogue-shape census, cross-conversation template reuse, token-mass
inequality, and the wall-time-vs-length regression a capacity planner fits.

Plan shapes reuse the serving family's machinery (queries_serving):
ONE vectorized token/hash scan over the corpus, at most ONE conv_id-keyed
bucketed exchange for order-dependent kernels (plus, where equal content
must be co-located across conversations, a SECOND tiny exchange keyed by the
digest — q209's pattern: the corpus's raw bytes never shuffle, only 16-32
byte digests do), and bounded per-bucket partials merged on the driver.
Every output is dashboard-sized. SQL twins read the same hardlinked
/tmp/mosr_turns_view/current view and recompute everything from raw text,
gating the full plan end to end.

Integer-division convention (pinned by a live probe, this round): DuckDB's
`//` TRUNCATES toward zero (-7 // 2 = -3) while Python's `//` floors
(-7 // 2 = -4) — identical only for nonnegative operands. Every ppm/mean
here is nonnegative EXCEPT q219's slope/intercept, which uses an explicit
truncate-toward-zero helper to match the SQL twin sign-for-sign.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from medical_ocr_service_ray.pipelines.queries_serving import (
    _SQL_TOKS,
    _TURNS_VIEW,
    _toks_ds,
    _turns_ds,
)
from medical_ocr_service_ray.stages.aggregate import bucketed_combine, driver_combine

# -------------------------------------------------------------------- q213

_SESSION_GAP_US = 60_000_000  # 1 min of inactivity starts a new session


def q213_sessionization(sf_dir: str):
    """Inactivity-gap sessionization census: a conversation's turn stream
    splits into SESSIONS wherever the gap to the previous turn exceeds
    60 seconds (the classic web-analytics sessionizer, thresholded to the
    agent-transcript timescale where turns are seconds apart, applied to agent
    transcripts — a conversation revisited hours later is a new serving
    session with a cold KV cache). Output per session-count: how many
    conversations split into exactly that many sessions, their total turn
    mass, and the mean turns per session (floor). ONE conv-keyed exchange;
    per bucket the gap test is a vectorized shift-compare and partials are
    keyed by n_sessions (bounded by the max per-conversation session
    count)."""
    ds = _turns_ds(sf_dir, ["conv_id", "turn_idx", "ts"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "us": batch["ts"].cast(pa.int64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        gap = (df.us - df.us.shift(1)).where(df.conv_id.eq(df.conv_id.shift(1)))
        new_sess = gap.gt(_SESSION_GAP_US)
        per = (
            pd.DataFrame({"conv_id": df.conv_id, "brk": new_sess})
            .groupby("conv_id", sort=False)
            .agg(n_turns=("brk", "size"), n_sessions=("brk", "sum"))
        )
        per["n_sessions"] = per.n_sessions.astype("int64") + 1
        return per.groupby("n_sessions", as_index=False).agg(
            n_convs=("n_turns", "size"), total_turns=("n_turns", "sum")
        )

    parts = bucketed_combine(
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True),
        "conv_id",
        combine,
        num_buckets=16,
    ).to_pandas()
    out = parts.groupby("n_sessions", as_index=False).agg(
        n_convs=("n_convs", "sum"), total_turns=("total_turns", "sum")
    )
    out["mean_turns_per_session"] = out.total_turns.to_numpy() // (
        out.n_sessions.to_numpy() * out.n_convs.to_numpy()
    )
    out = out.sort_values("n_sessions").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_Q213_SQL = f"""
WITH v AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS us
  FROM read_parquet('{_TURNS_VIEW}/*.parquet')
),
s AS (
  SELECT conv_id,
         CASE WHEN us - lag(us) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM v
),
per AS (
  SELECT conv_id, COUNT(*) AS n_turns, SUM(brk) + 1 AS n_sessions
  FROM s GROUP BY conv_id
)
SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(SUM(n_turns) AS BIGINT) AS total_turns,
       CAST(SUM(n_turns) // (n_sessions * COUNT(*)) AS BIGINT)
         AS mean_turns_per_session
FROM per GROUP BY n_sessions ORDER BY n_sessions
"""


# -------------------------------------------------------------------- q214

def q214_tool_retry_census(sf_dir: str):
    """Tool-retry census: a tool invocation immediately followed (among the
    conversation's TOOL turns, in turn order) by the SAME tool is a retry —
    the broken-agent-loop smell the reference's queue retry budget guards
    against (exponential backoff + attempt cap,
    src/services/queue.service.js). Per tool: total calls, retries,
    retry_ppm, and the longest consecutive-same-tool run. ONE conv-keyed
    exchange (q211's filter-then-shift kernel plus a vectorized
    run-length pass); partials are bounded by the tool catalog."""
    ds = _turns_ds(sf_dir, ["conv_id", "turn_idx", "role", "tool"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.role.eq("tool")].sort_values(["conv_id", "turn_idx"], kind="mergesort")
        if not len(df):
            return pd.DataFrame(
                {
                    "tool": pd.Series(dtype="object"),
                    "n_calls": pd.Series(dtype="int64"),
                    "n_retries": pd.Series(dtype="int64"),
                    "max_run": pd.Series(dtype="int64"),
                }
            )
        same_prev = df.conv_id.eq(df.conv_id.shift(1)) & df.tool.eq(df.tool.shift(1))
        # run id increments whenever the (conv, tool) chain breaks; run
        # lengths per run, then per-tool calls/retries/max — all vectorized
        runs = (
            pd.DataFrame({"tool": df.tool, "run": (~same_prev).cumsum()})
            .groupby(["tool", "run"], as_index=False)
            .size()
        )
        per_tool = runs.groupby("tool", as_index=False).agg(
            n_calls=("size", "sum"), max_run=("size", "max"), n_runs=("size", "size")
        )
        per_tool["n_retries"] = per_tool.n_calls - per_tool.n_runs
        return per_tool[["tool", "n_calls", "n_retries", "max_run"]]

    parts = bucketed_combine(ds, "conv_id", combine, num_buckets=16).to_pandas()
    if "tool" not in parts.columns:  # every bucket empty: zero-col blocks
        return pd.DataFrame(
            {
                "tool": pd.Series(dtype="object"),
                "n_calls": pd.Series(dtype="int64"),
                "n_retries": pd.Series(dtype="int64"),
                "retry_ppm": pd.Series(dtype="int64"),
                "max_run": pd.Series(dtype="int64"),
            }
        )
    out = parts.groupby("tool", as_index=False).agg(
        n_calls=("n_calls", "sum"), n_retries=("n_retries", "sum"), max_run=("max_run", "max")
    )
    out["retry_ppm"] = out.n_retries.to_numpy() * 1_000_000 // np.maximum(
        out.n_calls.to_numpy(), 1
    )
    out = out[["tool", "n_calls", "n_retries", "retry_ppm", "max_run"]]
    out = out.sort_values("tool").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


_Q214_SQL = f"""
WITH t AS (
  SELECT conv_id, turn_idx, tool
  FROM read_parquet('{_TURNS_VIEW}/*.parquet') WHERE role = 'tool'
),
s AS (
  SELECT conv_id, turn_idx, tool,
         CASE WHEN tool = lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
              THEN 0 ELSE 1 END AS brk
  FROM t
),
r AS (
  SELECT tool, conv_id,
         SUM(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM s
),
runs AS (
  SELECT tool, conv_id, run_id, COUNT(*) AS len
  FROM r GROUP BY tool, conv_id, run_id
),
g AS (
  SELECT tool, SUM(len) AS n_calls, SUM(len - 1) AS n_retries, MAX(len) AS max_run
  FROM runs GROUP BY tool
)
SELECT tool, CAST(n_calls AS BIGINT) AS n_calls,
       CAST(n_retries AS BIGINT) AS n_retries,
       CAST(n_retries * 1000000 // GREATEST(n_calls, 1) AS BIGINT) AS retry_ppm,
       CAST(max_run AS BIGINT) AS max_run
FROM g ORDER BY tool
"""


# -------------------------------------------------------------------- q215

def q215_canned_response_census(sf_dir: str):
    """Canned-response census: the top-20 most-repeated EXACT assistant turn
    texts — templated/boilerplate model outputs ("I cannot help with
    that...") that an SFT-data curator caps or drops before training. The
    corpus text never shuffles: the scan emits (md5(text), conv_id) for
    assistant turns only with a per-batch pre-reduce (hot templates
    collapse to one counted row before the exchange), ONE digest-keyed
    exchange co-locates equal texts, per-bucket top-20 partials (count
    desc, hash asc), and the driver merges buckets x 20 rows. Output:
    (h, n_uses, n_convs) ordered by n_uses desc then h — deterministic
    under ties on both engines."""
    ds = _turns_ds(sf_dir, ["conv_id", "role", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        m = np.asarray(batch["role"].to_numpy(zero_copy_only=False) == "assistant")
        texts = batch["text"].to_pylist()
        convs = batch["conv_id"].to_pylist()
        df = pd.DataFrame(
            {
                "h": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t, keep in zip(texts, m)
                    if keep
                ],
                "conv_id": [cv for cv, keep in zip(convs, m) if keep],
            }
        )
        if not len(df):
            return pa.table(
                {
                    "h": pa.array([], pa.string()),
                    "conv_id": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        g = df.groupby(["h", "conv_id"], as_index=False).size().rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("h")
            .agg(n_uses=("n", "sum"), n_convs=("conv_id", "nunique"))
            .reset_index()
        )
        return g.sort_values(["n_uses", "h"], ascending=[False, True]).head(20)

    parts = bucketed_combine(
        ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True),
        "h",
        per_bucket,
        num_buckets=16,
    ).to_pandas()
    out = (
        parts.sort_values(["n_uses", "h"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    out["n_uses"] = out.n_uses.astype("int64")
    out["n_convs"] = out.n_convs.astype("int64")
    return out[["h", "n_uses", "n_convs"]]


_Q215_SQL = f"""
WITH a AS (
  SELECT md5(text) AS h, conv_id
  FROM read_parquet('{_TURNS_VIEW}/*.parquet') WHERE role = 'assistant'
)
SELECT h, CAST(COUNT(*) AS BIGINT) AS n_uses,
       CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM a GROUP BY h
ORDER BY n_uses DESC, h ASC LIMIT 20
"""


# -------------------------------------------------------------------- q216

def q216_dialogue_shape_census(sf_dir: str):
    """Dialogue-shape census: each conversation maps to its role-sequence
    signature (one char per turn in turn order: u/a/t) and the census
    reports the top-10 shapes with conversation counts — the structural
    fingerprint that separates chat traffic (uaua...) from agent loops
    (uat+a) and broken sessions. The shape string is ~1 byte per turn, so
    the conv-keyed exchange ships signatures, not text (q209's rationale);
    a second shape-keyed exchange co-locates equal shapes across conv
    buckets with per-bucket top-10 partials (count desc, shape asc)."""
    ds = _turns_ds(sf_dir, ["conv_id", "turn_idx", "role"])

    def shapes(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        sig = df.role.str[0].groupby(df.conv_id, sort=False).agg("".join)
        return pd.DataFrame({"shape": sig.to_numpy()})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["shape"].value_counts()
        g = pd.DataFrame({"shape": vc.index.to_numpy(), "n_convs": vc.to_numpy()})
        return g.sort_values(["n_convs", "shape"], ascending=[False, True]).head(10)

    sigs = bucketed_combine(ds, "conv_id", shapes, num_buckets=16)
    parts = bucketed_combine(sigs, "shape", per_bucket, num_buckets=16).to_pandas()
    out = (
        parts.sort_values(["n_convs", "shape"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    out["n_convs"] = out.n_convs.astype("int64")
    return out[["shape", "n_convs"]]


_Q216_SQL = f"""
WITH per AS (
  SELECT conv_id,
         string_agg(substr(role, 1, 1), '' ORDER BY turn_idx) AS shape
  FROM read_parquet('{_TURNS_VIEW}/*.parquet') GROUP BY conv_id
)
SELECT shape, CAST(COUNT(*) AS BIGINT) AS n_convs
FROM per GROUP BY shape
ORDER BY n_convs DESC, shape ASC LIMIT 10
"""


# -------------------------------------------------------------------- q217

def q217_turn_template_reuse(sf_dir: str):
    """Cross-conversation template reuse per role: how many DISTINCT turn
    texts exist, how many of them appear in 2+ different conversations
    (reused templates — system boilerplate, canned tool output), and the
    turn mass those reused texts carry. The dedup-policy input one level
    below q209 (whole-conversation dedup): at 100 TB, reused-turn mass is
    what turn-level exact dedup would reclaim. Scan emits (role, md5(text),
    conv_id) with per-batch pre-reduce; ONE digest-keyed exchange; per
    bucket the (role, h) groups are complete, so distinct-conv counts are
    exact and partials collapse to <=3 rows per bucket."""
    ds = _turns_ds(sf_dir, ["conv_id", "role", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "role": batch["role"].to_pylist(),
                "h": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t in batch["text"].to_pylist()
                ],
                "conv_id": batch["conv_id"].to_pylist(),
            }
        )
        g = (
            df.groupby(["role", "h", "conv_id"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["role", "h"])
            .agg(n_uses=("n", "sum"), n_convs=("conv_id", "nunique"))
            .reset_index()
        )
        g["reused_turns"] = g.n_uses.where(g.n_convs.ge(2), 0)
        g["is_reused"] = g.n_convs.ge(2).astype("int64")
        return g.groupby("role", as_index=False).agg(
            n_texts=("h", "size"),
            n_reused=("is_reused", "sum"),
            reused_turns=("reused_turns", "sum"),
            total_turns=("n_uses", "sum"),
        )

    parts = bucketed_combine(
        ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True),
        "h",
        per_bucket,
        num_buckets=16,
    ).to_pandas()
    out = parts.groupby("role", as_index=False).agg(
        n_texts=("n_texts", "sum"),
        n_reused=("n_reused", "sum"),
        reused_turns=("reused_turns", "sum"),
        total_turns=("total_turns", "sum"),
    )
    out["reuse_ppm"] = out.reused_turns.to_numpy() * 1_000_000 // np.maximum(
        out.total_turns.to_numpy(), 1
    )
    out = out.sort_values("role").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


_Q217_SQL = f"""
WITH per AS (
  SELECT role, md5(text) AS h, COUNT(*) AS n_uses,
         COUNT(DISTINCT conv_id) AS n_convs
  FROM read_parquet('{_TURNS_VIEW}/*.parquet') GROUP BY role, md5(text)
)
SELECT role, CAST(COUNT(*) AS BIGINT) AS n_texts,
       CAST(COUNT(*) FILTER (WHERE n_convs >= 2) AS BIGINT) AS n_reused,
       CAST(COALESCE(SUM(n_uses) FILTER (WHERE n_convs >= 2), 0) AS BIGINT)
         AS reused_turns,
       CAST(SUM(n_uses) AS BIGINT) AS total_turns,
       CAST(COALESCE(SUM(n_uses) FILTER (WHERE n_convs >= 2), 0) * 1000000
            // GREATEST(SUM(n_uses), 1) AS BIGINT) AS reuse_ppm
FROM per GROUP BY role ORDER BY role
"""


# -------------------------------------------------------------------- q218

def q218_token_gini(sf_dir: str):
    """Token-mass inequality per role: the exact Gini coefficient of
    per-turn token counts — how concentrated each role's token budget is
    in its longest turns (the skew number that decides whether per-turn
    batching needs length bucketing at all). Computed from a merged
    (role, t) value-count distribution with ZERO exchanges: per-batch
    partials are bounded by roles x distinct token counts (token counts
    cluster far below the 8000-char cap; disclosed like q205 — a corpus
    with unbounded distinct counts would use the q40 sketch). Gini =
    (2*sum(rank_i * x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending
    values; tied values commute (sum rank*x is invariant within a tie
    group), so value-count order is immaterial and the numerator is
    always >= 0 (floor == truncate). Driver finishes in Python bigints
    (rank x mass x 1e6 exceeds int64 at scale; SQL twin in HUGEINT);
    exported ppm lands back in int64."""
    ds = _toks_ds(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["role", "t"], as_index=False).size().rename(columns={"size": "c"})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby(["role", "t"], as_index=False).agg(c=("c", "sum"))
        rows = []
        for role, g in d.groupby("role"):
            g = g.sort_values("t")
            n = int(g.c.sum())
            s = sum(int(v) * int(c) for v, c in zip(g.t, g.c))
            # 2*sum(rank*x) over ascending ranks 1..n: a tie group of size
            # c occupying ranks (cum+1 .. cum+c) contributes
            # v * (2*cum + c + 1) * c  (already doubled)
            t2, cum = 0, 0
            for v, c in zip(g.t, g.c):
                v, c = int(v), int(c)
                t2 += v * (2 * cum + c + 1) * c
                cum += c
            gini_ppm = (t2 - (n + 1) * s) * 1_000_000 // (n * s) if n * s > 0 else 0
            rows.append((role, n, s, gini_ppm))
        out = pd.DataFrame(rows, columns=["role", "n_turns", "tokens", "gini_ppm"])
        out = out.sort_values("role").reset_index(drop=True)
        for col in out.columns[1:]:
            out[col] = out[col].astype("int64")
        return out

    return driver_combine(ds, partial, merge)


_Q218_SQL = f"""
WITH toks AS ({_SQL_TOKS}),
d AS (SELECT role, t, COUNT(*) AS c FROM toks GROUP BY role, t),
o AS (
  SELECT role, t, c,
         SUM(c) OVER (PARTITION BY role ORDER BY t) AS cum
  FROM d
),
g AS (
  SELECT role, SUM(c) AS n, SUM(t * c) AS s,
         SUM(CAST(t AS HUGEINT) * (2 * (cum - c) + c + 1) * c) AS t2
  FROM o GROUP BY role
)
SELECT role, CAST(n AS BIGINT) AS n_turns, CAST(s AS BIGINT) AS tokens,
       CAST(CASE WHEN n > 0 AND s > 0
                 THEN (t2 - (n + 1) * CAST(s AS HUGEINT)) * 1000000
                      // (CAST(n AS HUGEINT) * s)
                 ELSE 0 END AS BIGINT) AS gini_ppm
FROM g ORDER BY role
"""


# -------------------------------------------------------------------- q219

def q219_wall_vs_turns_slope(sf_dir: str):
    """Conversation wall-time vs length regression: the exact integer OLS
    fit of wall_us (last ts - first ts) on n_turns across conversations —
    the capacity-planning line ("each extra turn costs ~b µs of session
    wall time") and its r² in ppm. ONE conv-keyed exchange emitting a
    single 6-number sufficient-statistics row per bucket (n, Σx, Σy, Σxy,
    Σx², Σy²); the driver solves the normal equations in Python bigints
    (Σy² crosses int64 near ~1e6 conversations) and truncates toward zero
    to match DuckDB's `//` (probed this round: -7 // 2 = -3 there, -4 in
    Python — slope/intercept CAN be negative, so the convention is
    load-bearing here, unlike the repo's nonnegative ppm divisions)."""
    ds = _turns_ds(sf_dir, ["conv_id", "ts"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"conv_id": batch["conv_id"], "us": batch["ts"].cast(pa.int64())})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        per = df.groupby("conv_id", sort=False)["us"].agg(["size", "min", "max"])
        x = per["size"].to_numpy().astype("int64")
        y = (per["max"] - per["min"]).to_numpy().astype("int64")
        return pd.DataFrame(
            {
                "n": [len(per)],
                "sx": [int(x.sum())],
                "sy": [int(y.sum())],
                "sxy": [sum(int(a) * int(b) for a, b in zip(x, y))],
                "sxx": [int((x * x).sum())],
                "syy": [sum(int(b) * int(b) for b in y)],
            }
        )

    parts = bucketed_combine(
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True),
        "conv_id",
        combine,
        num_buckets=16,
    ).to_pandas()
    n, sx, sy, sxy, sxx, syy = (int(parts[c].sum()) for c in ("n", "sx", "sy", "sxy", "sxx", "syy"))
    cov_n = n * sxy - sx * sy  # n^2 x covariance
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy

    def tdiv(num: int, den: int) -> int:
        # truncate-toward-zero division, matching DuckDB's integer //
        if den == 0:
            return 0
        q = abs(num) // abs(den)
        return -q if (num < 0) != (den < 0) else q

    slope_us = tdiv(cov_n, var_x)
    intercept_us = tdiv(sy - slope_us * sx, n)
    # r2 in divide-early evaluation order — (cov*1e6 // var_x) * cov //
    # var_y, NOT cov^2*1e6 // (var_x*var_y): the naive order overflows
    # INT128 already at sf0.001 (cov ~ 7e16 -> cov^2*1e6 ~ 5e39). Both
    # engines evaluate the SAME expression, so the integers agree exactly;
    # the value differs from true r2*1e6 by < 1 ulp of the inner division
    # (slope_ppm is ~1e12 here, so the relative error is ~1e-12).
    r2_ppm = tdiv(tdiv(cov_n * 1_000_000, var_x) * cov_n, var_y)
    return pd.DataFrame(
        {
            "n_convs": [n],
            "slope_us_per_turn": [slope_us],
            "intercept_us": [intercept_us],
            "r2_ppm": [r2_ppm],
        }
    ).astype("int64")


_Q219_SQL = f"""
WITH per AS (
  SELECT conv_id, COUNT(*) AS x, epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS y
  FROM read_parquet('{_TURNS_VIEW}/*.parquet') GROUP BY conv_id
),
s AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(x) AS HUGEINT) AS sx,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM per
),
d AS (
  SELECT n, sx, sy,
         n * sxy - sx * sy AS cov_n,
         n * sxx - sx * sx AS var_x,
         n * syy - sy * sy AS var_y
  FROM s
),
f AS (
  SELECT *, CASE WHEN var_x > 0 THEN cov_n // var_x ELSE 0 END AS slope
  FROM d
)
SELECT CAST(n AS BIGINT) AS n_convs,
       CAST(slope AS BIGINT) AS slope_us_per_turn,
       CAST(CASE WHEN n > 0 THEN (sy - slope * sx) // n ELSE 0 END AS BIGINT)
         AS intercept_us,
       CAST(CASE WHEN var_x > 0 AND var_y > 0
                 THEN (cov_n * 1000000 // var_x) * cov_n // var_y
                 ELSE 0 END AS BIGINT) AS r2_ppm
FROM f
"""


# -------------------------------------------------------------------- q220

def q220_stuck_loop_census(sf_dir: str):
    """WITHIN-conversation exact-repetition census per role — the
    stuck-loop detector: a conversation where the assistant emits the
    byte-identical text 2+ times is a model loop, an identical tool
    output repeated is an idempotent retry, an identical user message
    repeated is a human retrying. q217 measures reuse ACROSS
    conversations (n_convs >= 2); this is its in-conversation complement
    (same conv, same role, same text, count >= 2) — the reference's
    queue retry budget (src/services/queue.service.js) is the analogous
    per-item loop guard. Output per role: (conv, role) pairs seen,
    conversations with a loop, turns inside loops (the wasted serving
    mass), total turns, the single worst repeat count, and loop mass in
    ppm. Plan: scan emits (conv_id, role, md5) pre-reduced per batch;
    ONE conv-keyed exchange (conversations complete per bucket, so
    per-(conv, role, text) counts are exact in-bucket); <=3-row partials
    per bucket to a driver merge. The corpus text never shuffles — only
    16-byte digests do (q209's rationale)."""
    ds = _turns_ds(sf_dir, ["conv_id", "role", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": batch["conv_id"].to_pylist(),
                "role": batch["role"].to_pylist(),
                "h": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t in batch["text"].to_pylist()
                ],
            }
        )
        g = (
            df.groupby(["conv_id", "role", "h"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["conv_id", "role", "h"], as_index=False)["n"].sum()
        g["loop_n"] = g.n.where(g.n.ge(2), 0)
        conv = g.groupby(["conv_id", "role"], as_index=False).agg(
            turns=("n", "sum"), loop_turns=("loop_n", "sum"), max_rep=("n", "max")
        )
        conv["looping"] = conv.loop_turns.gt(0).astype("int64")
        return conv.groupby("role", as_index=False).agg(
            n_convs=("conv_id", "size"),
            n_looping_convs=("looping", "sum"),
            loop_turns=("loop_turns", "sum"),
            total_turns=("turns", "sum"),
            max_repeat=("max_rep", "max"),
        )

    parts = bucketed_combine(
        ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True),
        "conv_id",
        per_bucket,
        num_buckets=16,
    ).to_pandas()
    out = parts.groupby("role", as_index=False).agg(
        n_convs=("n_convs", "sum"),
        n_looping_convs=("n_looping_convs", "sum"),
        loop_turns=("loop_turns", "sum"),
        total_turns=("total_turns", "sum"),
        max_repeat=("max_repeat", "max"),
    )
    out["loop_ppm"] = out.loop_turns.to_numpy() * 1_000_000 // np.maximum(
        out.total_turns.to_numpy(), 1
    )
    out = out.sort_values("role").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


_Q220_SQL = f"""
WITH per AS (
  SELECT conv_id, role, md5(text) AS h, COUNT(*) AS n
  FROM read_parquet('{_TURNS_VIEW}/*.parquet')
  GROUP BY conv_id, role, md5(text)
), conv AS (
  SELECT conv_id, role, SUM(n) AS turns,
         COALESCE(SUM(n) FILTER (WHERE n >= 2), 0) AS loop_turns,
         MAX(n) AS max_rep
  FROM per GROUP BY conv_id, role
)
SELECT role,
       CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(COUNT(*) FILTER (WHERE loop_turns > 0) AS BIGINT)
         AS n_looping_convs,
       CAST(SUM(loop_turns) AS BIGINT) AS loop_turns,
       CAST(SUM(turns) AS BIGINT) AS total_turns,
       CAST(MAX(max_rep) AS BIGINT) AS max_repeat,
       CAST(SUM(loop_turns) * 1000000 // GREATEST(SUM(turns), 1) AS BIGINT)
         AS loop_ppm
FROM conv GROUP BY role ORDER BY role
"""
