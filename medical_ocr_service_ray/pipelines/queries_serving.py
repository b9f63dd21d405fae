"""Serving-economics / SFT-prep operators over the transcript corpus.

The reference's unit of work is a conversation-shaped document stream (job
payloads grouped per batch, src/routes/v1/ordenes-batch.routes.js:38-48;
per-document confidence/usage roll-ups, src/services/pre-visacion.service.js);
this module carries the north-rule-native analytics an LLM *serving and
fine-tuning* pipeline publishes over the same (conv_id, turn_idx, role, text,
tool, ts) stream: prefix-cache prefill economics, SFT prompt/completion pair
mining, loss-mask (trainable-token) mass, context-window overflow audits,
assistant-latency SLA percentiles and per-role wall-time attribution.

Shared plan shape: tokenize each turn in ONE vectorized pyarrow scan (the
`\\S+`-run count — exactly q9/q199's pinned split semantics), then ONE
conv_id-keyed bucketed exchange so each conversation is co-located ONCE for
the order-dependent kernels (cumsum / adjacency via vectorized shift), with
bounded per-bucket partials (conv-length keys, power-of-2 length buckets,
distinct latency values, roles) merged on the driver. Nothing here
materializes the corpus; every output is dashboard-sized.

Oracle mechanism: the transcript corpus is synthesized (BASELINE.json
input_hint; FIXTURES.md F1), so the static DuckDB twins read the fixed path
/tmp/mosr_turns_view/current — hardlinks to the corpus parquet files, laid
down by `_turns_view_dir` before the query returns (same contract as
_tool_view_dir / _extraction_view_dir). The SQL recomputes tokenization from
raw text itself (string_split_regex on trimmed text), so the oracle gates
tokenize + exchange + kernel end to end, not just the final aggregation.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from medical_ocr_service_ray.stages.aggregate import bucketed_combine, driver_combine

# ------------------------------------------------------------------ helpers

_TURNS_VIEW = "/tmp/mosr_turns_view/current"
_TURNS_VIEW_KEY: list = [None]  # last corpus dir hardlinked to .../current


def _turns_view_dir(sf_dir: str) -> str | None:
    """Hardlink the synthetic transcript corpus to the FIXED path the static
    SQL twins read. Hardlinks, not copies: the view is the same bytes, and
    unlike the extraction view there is no session-scoped object-store state
    — the cache key is just the corpus directory. Skipped under
    MOSR_SKIP_ORACLE_FIXTURES=1 (bench timing runs: nothing reads the view
    there)."""
    if os.environ.get("MOSR_SKIP_ORACLE_FIXTURES") == "1":
        return None
    from medical_ocr_service_ray.synth import ensure_transcripts_for_sf

    corpus = str(ensure_transcripts_for_sf(sf_dir))
    # `current` is a fixed SHARED path: a concurrent harness process (e.g.
    # pytest at sf0.001 next to a sweep at sf0.01) may have re-linked it
    # since our memo was set, so a memo hit is only trusted when the on-disk
    # KEY marker still names THIS corpus (same contract as
    # _golden_fixture_dir). The write-then-read race between two live
    # processes remains inherent to the fixed-path oracle mechanism — run
    # one harness per box (the driver does).
    if _TURNS_VIEW_KEY[0] == corpus:
        try:
            if (Path(_TURNS_VIEW) / "KEY").read_text() == corpus:
                return _TURNS_VIEW
        except OSError:
            pass
    shutil.rmtree(_TURNS_VIEW, ignore_errors=True)
    os.makedirs(_TURNS_VIEW, exist_ok=True)
    for f in sorted(Path(corpus).glob("*.parquet")):
        try:
            os.link(f, Path(_TURNS_VIEW) / f.name)
        except OSError:  # cross-device corpus (planted test fixtures)
            shutil.copy2(f, Path(_TURNS_VIEW) / f.name)
    (Path(_TURNS_VIEW) / "KEY").write_text(corpus)
    _TURNS_VIEW_KEY[0] = corpus
    return _TURNS_VIEW


def _turns_ds(sf_dir: str, columns: list[str]) -> "rd.Dataset":
    """Pruned read over the transcript corpus (writes the oracle view as a
    side effect — the harness runs the SQL after the query returns)."""
    from medical_ocr_service_ray.config import set_engine_shuffle_profile
    from medical_ocr_service_ray.synth import ensure_transcripts_for_sf

    set_engine_shuffle_profile()
    corpus = ensure_transcripts_for_sf(sf_dir)
    _turns_view_dir(sf_dir)
    files = sorted(str(p) for p in Path(corpus).glob("*.parquet"))
    sch = pq.read_schema(files[0]).remove_metadata()
    sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(files, columns=columns, schema=sch)


def _token_scan(batch: pa.Table) -> pa.Table:
    """Per-turn whitespace-token count (count of `\\S+` runs — identical to
    the SQL twin's string_split_regex on trimmed text; semantics pinned by
    q9's oracle), keeping only the grouping/order columns."""
    t = pc.count_substring_regex(batch["text"], r"\S+").cast(pa.int64())
    keep = [c for c in ("conv_id", "turn_idx", "role") if c in batch.column_names]
    return pa.table({**{c: batch[c] for c in keep}, "t": t})


# q201/q202/q204 share the IDENTICAL tokenize prefix over the transcript
# corpus (the text scan is ~6x the cost of everything downstream). One
# materialized (conv_id, turn_idx, role, t) Dataset per (corpus, Ray
# session) — the _EMB_CACHE/_EXTRACT_CACHE reuse policy: the cached table
# is 4 narrow columns per turn living in the (distributed, spillable)
# object store, never on the driver; standalone single-query paths still
# stream. Keyed by the CORPUS dir (not sf_dir) so planted-fixture corpora
# never collide with the synth cache.
_TOKS_CACHE: dict = {}


def _toks_ds(sf_dir: str) -> "rd.Dataset":
    import ray

    from medical_ocr_service_ray.synth import ensure_transcripts_for_sf

    corpus = str(ensure_transcripts_for_sf(sf_dir))
    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    key = (corpus, job)
    ds = _TOKS_CACHE.get(key)
    if ds is None:
        ds = _turns_ds(sf_dir, ["conv_id", "turn_idx", "role", "text"]).map_batches(
            _token_scan, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        _TOKS_CACHE[key] = ds
    else:
        _turns_view_dir(sf_dir)  # oracle view side effect on cache hits too
    return ds


# SQL fragment shared by every twin that tokenizes: one definition so the
# split semantics cannot drift between queries. Counts `\S+` runs directly
# (regexp_extract_all) — the exact mirror of the Ray side's
# count_substring_regex; the q9/q199 trim+split idiom undercounts here
# because transcript payloads carry leading/trailing TABS/NEWLINES
# (DuckDB trim() strips spaces only, leaving empty split heads/tails).
_SQL_TOKS = f"""
  SELECT conv_id, turn_idx, role,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS t
  FROM read_parquet('{_TURNS_VIEW}/*.parquet')
"""


# -------------------------------------------------------------------- q201

def q201_prefix_cache_savings(sf_dir: str):
    """Prefix-cache (KV-cache reuse) prefill economics per conversation
    length — the serving-cost table behind "enable prefix caching": an
    assistant turn at position k prefills its context C_{k-1} = sum of all
    prior turn tokens; WITHOUT cross-turn caching every assistant turn pays
    its full context, WITH caching each context token is prefilled exactly
    once (the conversation's turns form a prefix chain), so the cached cost
    per conversation is the context of its LAST assistant turn. ONE
    vectorized token scan + ONE conv-keyed exchange (cumsum needs the
    conversation co-located once); per-bucket partials are keyed by
    conversation length (bounded by the distinct-length count), driver
    merges buckets x lengths rows. Output per n_turns: n_convs,
    prefill_nocache, prefill_cached, saving_ppm."""
    toks = _toks_ds(sf_dir)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        cum = df.groupby("conv_id", sort=False)["t"].cumsum()
        ctx = (cum - df.t).astype("int64")  # tokens BEFORE this turn
        is_a = df.role.eq("assistant")
        per = (
            pd.DataFrame(
                {
                    "conv_id": df.conv_id,
                    "nocache": ctx.where(is_a, 0),
                    # -1 sentinel = "not an assistant turn"; max picks the
                    # LAST assistant turn's context (ctx is nondecreasing)
                    "cached": ctx.where(is_a, -1),
                }
            )
            .groupby("conv_id", sort=False)
            .agg(n_turns=("nocache", "size"), nocache=("nocache", "sum"), cached=("cached", "max"))
        )
        per = per[per.cached >= 0]  # conversations with >=1 assistant turn
        return per.groupby("n_turns", as_index=False).agg(
            n_convs=("nocache", "size"),
            prefill_nocache=("nocache", "sum"),
            prefill_cached=("cached", "sum"),
        )

    parts = bucketed_combine(toks, "conv_id", combine, num_buckets=16).to_pandas()
    out = parts.groupby("n_turns", as_index=False).agg(
        n_convs=("n_convs", "sum"),
        prefill_nocache=("prefill_nocache", "sum"),
        prefill_cached=("prefill_cached", "sum"),
    )
    # ppm in Python bigints: prefill sums reach ~1e13 at sf0.1 and grow
    # linearly with corpus size, so the x1e6 cross product exceeds int64
    # (the SQL twin's SUM() is HUGEINT for the same reason); the exported
    # ppm is < 1e6 and lands back in int64.
    out["saving_ppm"] = [
        (int(n) - int(c)) * 1_000_000 // int(n) if n > 0 else 0
        for n, c in zip(out.prefill_nocache, out.prefill_cached)
    ]
    out = out.sort_values("n_turns").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_Q201_SQL = f"""
WITH toks AS ({_SQL_TOKS}),
c AS (
  SELECT conv_id, role,
         SUM(t) OVER (PARTITION BY conv_id ORDER BY turn_idx
                      ROWS UNBOUNDED PRECEDING) - t AS ctx
  FROM toks
),
per AS (
  SELECT conv_id, COUNT(*) AS n_turns,
         COALESCE(SUM(ctx) FILTER (WHERE role = 'assistant'), 0) AS nocache,
         MAX(ctx) FILTER (WHERE role = 'assistant') AS cached
  FROM c GROUP BY conv_id
)
SELECT CAST(n_turns AS BIGINT) AS n_turns,
       CAST(COUNT(*) AS BIGINT) AS n_convs,
       CAST(SUM(nocache) AS BIGINT) AS prefill_nocache,
       CAST(SUM(cached) AS BIGINT) AS prefill_cached,
       CAST(CASE WHEN SUM(nocache) > 0
                 THEN (SUM(nocache) - SUM(cached)) * 1000000 // SUM(nocache)
                 ELSE 0 END AS BIGINT) AS saving_ppm
FROM per WHERE cached IS NOT NULL
GROUP BY n_turns
ORDER BY n_turns
"""


# -------------------------------------------------------------------- q202

def q202_sft_pairs(sf_dir: str):
    """SFT pair mining: every (user turn -> immediately following assistant
    turn) adjacency is a (prompt, completion) training pair; report the
    corpus's pair inventory bucketed by prompt length (power-of-2 buckets:
    bucket = bit_length(prompt_tokens+1)-1) with prompt/completion token
    mass and the completion-per-prompt ratio — the table a finetune data
    loader reads to size its length-grouped batches. ONE token scan + ONE
    conv-keyed exchange; adjacency is a vectorized shift inside the bucket
    (turn_idx+1 match — no Python loop); partials are bucket-keyed
    (<= 64 rows each). Exact-integer bucketing on both engines:
    numpy frexp exponent here (exact for ints < 2^53), length(bin(x)) in
    the twin."""
    toks = _toks_ds(sf_dir)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        same = df.conv_id.eq(df.conv_id.shift(-1)) & (
            df.turn_idx.shift(-1) == df.turn_idx + 1
        )
        m = (same & df.role.eq("user") & df.role.shift(-1).eq("assistant")).to_numpy()
        pt = df.t.to_numpy()[m]
        ct = df.t.shift(-1).to_numpy()[m].astype("int64")
        b = np.frexp((pt + 1).astype("float64"))[1] - 1  # bit_length(pt+1)-1
        return (
            pd.DataFrame({"len_bucket": b, "pt": pt, "ct": ct})
            .groupby("len_bucket", as_index=False)
            .agg(n_pairs=("pt", "size"), prompt_tokens=("pt", "sum"), completion_tokens=("ct", "sum"))
        )

    parts = bucketed_combine(toks, "conv_id", combine, num_buckets=16).to_pandas()
    out = parts.groupby("len_bucket", as_index=False).agg(
        n_pairs=("n_pairs", "sum"),
        prompt_tokens=("prompt_tokens", "sum"),
        completion_tokens=("completion_tokens", "sum"),
    )
    p = out.prompt_tokens.to_numpy()
    out["ct_per_pt_ppm"] = np.where(
        p > 0, out.completion_tokens.to_numpy() * 1_000_000 // np.maximum(p, 1), 0
    )
    out = out.sort_values("len_bucket").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_Q202_SQL = f"""
WITH toks AS ({_SQL_TOKS}),
s AS (
  SELECT conv_id, turn_idx, role, t,
         lead(role) OVER w AS nrole,
         lead(t) OVER w AS nt,
         lead(turn_idx) OVER w AS nidx
  FROM toks WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
p AS (
  SELECT length(bin(t + 1)) - 1 AS len_bucket, t AS pt, nt AS ct
  FROM s
  WHERE role = 'user' AND nrole = 'assistant' AND nidx = turn_idx + 1
)
SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(pt) AS BIGINT) AS prompt_tokens,
       CAST(SUM(ct) AS BIGINT) AS completion_tokens,
       CAST(CASE WHEN SUM(pt) > 0 THEN SUM(ct) * 1000000 // SUM(pt)
                 ELSE 0 END AS BIGINT) AS ct_per_pt_ppm
FROM p GROUP BY len_bucket ORDER BY len_bucket
"""


# -------------------------------------------------------------------- q203

def q203_loss_mask_mass(sf_dir: str):
    """Loss-mask mass: what fraction of the corpus's tokens is actually
    TRAINABLE under assistant-only supervision (user/tool turns are
    attention context but loss-masked)? The first number an SFT run
    budgets with — epochs are priced on trainable tokens, not corpus
    tokens. ZERO exchanges: per-batch (role -> n_turns, tokens) partials
    (<= 3 rows each) over the shared token table, driver merge; shares in
    exact integer ppm."""
    ds = _toks_ds(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"role": df.role, "t": df.t})
            .groupby("role", as_index=False)
            .agg(n_turns=("t", "size"), tokens=("t", "sum"))
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("role", as_index=False).agg(
            n_turns=("n_turns", "sum"), tokens=("tokens", "sum")
        )
        total = int(out.tokens.sum())
        out["token_share_ppm"] = (
            out.tokens.to_numpy() * 1_000_000 // max(total, 1)
        )
        out["trainable"] = out.role.eq("assistant").astype("int64")
        out = out.sort_values("role").reset_index(drop=True)
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out

    return driver_combine(ds, partial, merge)


_Q203_SQL = f"""
WITH toks AS (
  SELECT role,
         CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS t
  FROM read_parquet('{_TURNS_VIEW}/*.parquet')
),
g AS (
  SELECT role, COUNT(*) AS n_turns, SUM(t) AS tokens FROM toks GROUP BY role
)
SELECT role, CAST(n_turns AS BIGINT) AS n_turns, CAST(tokens AS BIGINT) AS tokens,
       CAST(tokens * 1000000 // GREATEST((SELECT SUM(tokens) FROM g), 1) AS BIGINT)
         AS token_share_ppm,
       CAST(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS BIGINT) AS trainable
FROM g ORDER BY role
"""


# -------------------------------------------------------------------- q204

_Q204_WINDOWS = (512, 2048, 8192)


def q204_context_overflow(sf_dir: str):
    """Context-window overflow audit: for each candidate window size W,
    how many turns sit beyond W cumulative context tokens (they would be
    truncated or require eviction), how many conversations exceed W at
    all, and the total token mass past the window — the table that picks
    the serving context length / decides what long-context finetuning
    would rescue. Reuses q201's plan: ONE token scan + ONE conv-keyed
    exchange; per-bucket partials are one row per window size."""
    toks = _toks_ds(sf_dir)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        cum = df.groupby("conv_id", sort=False)["t"].cumsum().to_numpy()
        total = df.groupby("conv_id", sort=False)["t"].sum().to_numpy()
        n_turns = len(df)
        rows = []
        for w in _Q204_WINDOWS:
            over = total[total > w]
            rows.append(
                (
                    w,
                    int((cum > w).sum()),
                    int(len(over)),
                    int((over - w).sum()),
                    n_turns,
                )
            )
        return pd.DataFrame(
            rows,
            columns=["window_tokens", "n_turns_over", "n_convs_over", "tokens_over", "n_turns"],
        )

    parts = bucketed_combine(toks, "conv_id", combine, num_buckets=16).to_pandas()
    out = parts.groupby("window_tokens", as_index=False).agg(
        n_turns_over=("n_turns_over", "sum"),
        n_convs_over=("n_convs_over", "sum"),
        tokens_over=("tokens_over", "sum"),
        n_turns=("n_turns", "sum"),
    )
    out["turns_over_ppm"] = (
        out.n_turns_over.to_numpy() * 1_000_000 // np.maximum(out.n_turns.to_numpy(), 1)
    )
    out = out.drop(columns=["n_turns"]).sort_values("window_tokens").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_Q204_SQL = f"""
WITH toks AS ({_SQL_TOKS}),
c AS (
  SELECT conv_id,
         SUM(t) OVER (PARTITION BY conv_id ORDER BY turn_idx
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM toks
),
p AS (SELECT conv_id, MAX(cum) AS total FROM c GROUP BY conv_id),
w(w) AS (VALUES ({_Q204_WINDOWS[0]}), ({_Q204_WINDOWS[1]}), ({_Q204_WINDOWS[2]}))
SELECT CAST(w.w AS BIGINT) AS window_tokens,
       CAST((SELECT COUNT(*) FROM c WHERE cum > w.w) AS BIGINT) AS n_turns_over,
       CAST((SELECT COUNT(*) FROM p WHERE total > w.w) AS BIGINT) AS n_convs_over,
       CAST((SELECT COALESCE(SUM(total - w.w), 0) FROM p WHERE total > w.w) AS BIGINT)
         AS tokens_over,
       CAST((SELECT COUNT(*) FILTER (WHERE cum > w.w) * 1000000 // COUNT(*) FROM c)
         AS BIGINT) AS turns_over_ppm
FROM w ORDER BY w.w
"""


# q205/q206/q207 share the per-(role, tool, latency) value-count
# distribution: one (conv_id, turn_idx, role, tool, ts) scan + ONE
# conv-keyed exchange for the lag adjacency, per-bucket
# (role, tool, lat)->count partials, driver merge. The merged table is
# bounded by (roles x tool names) x DISTINCT latency values (timestamp
# deltas cluster on scheduler/clock granularity — q205's disclosure), so
# caching it per (corpus, Ray session) is dashboard-sized state, and all
# three queries finish driver-side from it (q205: assistant percentiles;
# q206: per-role wall sums; q207: per-tool wall sums — Python bigints).
_LAG_CACHE: dict = {}


def _lag_counts(sf_dir: str) -> pd.DataFrame:
    import ray

    from medical_ocr_service_ray.synth import ensure_transcripts_for_sf

    corpus = str(ensure_transcripts_for_sf(sf_dir))
    job = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    key = (corpus, job)
    hit = _LAG_CACHE.get(key)
    if hit is not None:
        _turns_view_dir(sf_dir)  # oracle view side effect on cache hits too
        return hit
    ds = _turns_ds(sf_dir, ["conv_id", "turn_idx", "role", "tool", "ts"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "role": batch["role"],
                "tool": batch["tool"],
                "us": batch["ts"].cast(pa.int64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        lat = (df.us - df.us.shift(1)).where(df.conv_id.eq(df.conv_id.shift(1)))
        m = lat.notna()
        return (
            pd.DataFrame(
                {"role": df.role[m], "tool": df.tool[m], "lat_us": lat[m].astype("int64")}
            )
            .groupby(["role", "tool", "lat_us"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    parts = bucketed_combine(
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True),
        "conv_id",
        combine,
        num_buckets=16,
    ).to_pandas()
    out = parts.groupby(["role", "tool", "lat_us"], as_index=False).agg(c=("c", "sum"))
    _LAG_CACHE[key] = out
    return out


# -------------------------------------------------------------------- q205

def q205_assistant_latency(sf_dir: str):
    """Assistant response-latency SLA: the time from the preceding turn's
    timestamp to each assistant turn's timestamp, with EXACT nearest-rank
    percentiles (p50/p90/p99 = smallest latency whose cumulative count
    reaches ceil(q*n/100)) — computed from a value-count distribution, not
    a sort: the shared _lag_counts table (ONE conv-keyed exchange for the
    adjacency, vectorized lag; exchange shared with q206). Partial
    size is bounded by the number of DISTINCT latency values (timestamp
    deltas cluster on scheduler/clock granularity; here <=120 values —
    disclosed: a corpus with fully continuous microsecond deltas would
    need a quantile sketch instead, which q40 provides)."""
    lc = _lag_counts(sf_dir)
    d = (
        lc[lc.role.eq("assistant")]
        .groupby("lat_us", as_index=False)
        .agg(c=("c", "sum"))
        .sort_values("lat_us")
    )
    lat = d.lat_us.to_numpy()
    cum = d.c.to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0

    def pct(q: int) -> int:
        rank = (q * n + 99) // 100  # ceil(q*n/100), nearest-rank
        return int(lat[np.searchsorted(cum, rank)])

    total = int((d.lat_us.to_numpy() * d.c.to_numpy()).sum())
    return pd.DataFrame(
        {
            "n_latencies": [n],
            "p50_us": [pct(50)],
            "p90_us": [pct(90)],
            "p99_us": [pct(99)],
            "mean_us": [total // max(n, 1)],
            "max_us": [int(lat.max()) if len(lat) else 0],
        }
    ).astype("int64")


_Q205_SQL = f"""
WITH v AS (
  SELECT conv_id, turn_idx, role, epoch_us(ts) AS us
  FROM read_parquet('{_TURNS_VIEW}/*.parquet')
),
s AS (
  SELECT role, us - lag(us) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS lat
  FROM v
),
l AS (SELECT lat FROM s WHERE role = 'assistant' AND lat IS NOT NULL),
d AS (SELECT lat, COUNT(*) AS c FROM l GROUP BY lat),
o AS (SELECT lat, SUM(c) OVER (ORDER BY lat) AS cum FROM d),
n AS (SELECT COUNT(*) AS n, SUM(lat) AS s, MAX(lat) AS mx FROM l)
SELECT CAST(n AS BIGINT) AS n_latencies,
       CAST((SELECT MIN(lat) FROM o WHERE cum >= (50 * n + 99) // 100) AS BIGINT) AS p50_us,
       CAST((SELECT MIN(lat) FROM o WHERE cum >= (90 * n + 99) // 100) AS BIGINT) AS p90_us,
       CAST((SELECT MIN(lat) FROM o WHERE cum >= (99 * n + 99) // 100) AS BIGINT) AS p99_us,
       CAST(s // n AS BIGINT) AS mean_us,
       CAST(mx AS BIGINT) AS max_us
FROM n
"""


# -------------------------------------------------------------------- q206

def q206_turn_time_attribution(sf_dir: str):
    """Per-role wall-time attribution: the gap (ts_k - ts_{k-1}) is the time
    spent PRODUCING turn k — charge it to turn k's role and report each
    role's share of total conversation wall time (which role is the
    latency budget: the model, the human, or the tools?). Finishes
    driver-side from the shared per-(role, latency) value-count table
    (_lag_counts — one conv-keyed exchange, shared with q205); wall sums
    run in Python bigints (per-role wall_us passes 1e13 µs at sf0.1, so
    lat x count x 1e6 cross products exceed int64; the SQL twin's SUM is
    HUGEINT) and the exported columns land back in int64."""
    lc = _lag_counts(sf_dir)
    rows = []
    for role, g in lc.groupby("role"):
        n = int(g.c.sum())
        wall = sum(int(l) * int(c) for l, c in zip(g.lat_us, g.c))
        rows.append((role, n, wall))
    total = sum(w for _, _, w in rows) or 1
    out = pd.DataFrame(
        [(r, n, w, w * 1_000_000 // total) for r, n, w in sorted(rows)],
        columns=["role", "n_turns_timed", "wall_us", "wall_share_ppm"],
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


_Q206_SQL = f"""
WITH v AS (
  SELECT conv_id, turn_idx, role, epoch_us(ts) AS us
  FROM read_parquet('{_TURNS_VIEW}/*.parquet')
),
s AS (
  SELECT role, us - lag(us) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS lat
  FROM v
),
g AS (
  SELECT role, COUNT(*) AS n_turns_timed, SUM(lat) AS wall_us
  FROM s WHERE lat IS NOT NULL GROUP BY role
)
SELECT role, CAST(n_turns_timed AS BIGINT) AS n_turns_timed,
       CAST(wall_us AS BIGINT) AS wall_us,
       CAST(wall_us * 1000000 // GREATEST((SELECT SUM(wall_us) FROM g), 1) AS BIGINT)
         AS wall_share_ppm
FROM g ORDER BY role
"""

# -------------------------------------------------------------------- q207

def q207_tool_wall_time(sf_dir: str):
    """Per-TOOL wall-time attribution — q206 sliced one level deeper: the
    gap (ts_k - ts_{k-1}) before each tool turn is that tool invocation's
    production time; report each tool's call count, total/mean wall and
    share of the tool-role budget (which tool to cache, parallelize or cut
    from the agent loop). Finishes driver-side from the shared
    _lag_counts table (the ONE conv-keyed exchange shared with q205/q206);
    wall sums in Python bigints, exports back in int64."""
    lc = _lag_counts(sf_dir)
    lc = lc[lc.role.eq("tool")]
    rows = []
    for tool, g in lc.groupby("tool"):
        n = int(g.c.sum())
        wall = sum(int(l) * int(c) for l, c in zip(g.lat_us, g.c))
        rows.append((tool, n, wall))
    total = sum(w for _, _, w in rows) or 1
    out = pd.DataFrame(
        [
            (t, n, w, w // max(n, 1), w * 1_000_000 // total)
            for t, n, w in sorted(rows)
        ],
        columns=["tool", "n_calls", "wall_us", "mean_us", "wall_share_ppm"],
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


_Q207_SQL = f"""
WITH v AS (
  SELECT conv_id, turn_idx, role, tool, epoch_us(ts) AS us
  FROM read_parquet('{_TURNS_VIEW}/*.parquet')
),
s AS (
  SELECT role, tool,
         us - lag(us) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS lat
  FROM v
),
g AS (
  SELECT tool, COUNT(*) AS n_calls, SUM(lat) AS wall_us
  FROM s WHERE role = 'tool' AND lat IS NOT NULL GROUP BY tool
)
SELECT tool, CAST(n_calls AS BIGINT) AS n_calls,
       CAST(wall_us AS BIGINT) AS wall_us,
       CAST(wall_us // GREATEST(n_calls, 1) AS BIGINT) AS mean_us,
       CAST(wall_us * 1000000 // GREATEST((SELECT SUM(wall_us) FROM g), 1) AS BIGINT)
         AS wall_share_ppm
FROM g ORDER BY tool
"""


# -------------------------------------------------------------------- q208

def q208_depth_token_profile(sf_dir: str):
    """Turn-depth token profile: mean tokens per (role, power-of-2
    turn-position bucket) — do turns get longer or shorter as the
    conversation deepens, and for which role? The curve that sizes
    per-depth context budgets and validates truncation policy. ZERO
    exchanges over the shared token table: bucket = bit_length(turn_idx+1)-1
    is in-row, so per-batch (role, bucket) partials (<= 3 x ~12 rows)
    merge on the driver; mean is exact floor division."""
    ds = _toks_ds(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = np.frexp((df.turn_idx.to_numpy().astype("int64") + 1).astype("float64"))[1] - 1
        return (
            pd.DataFrame({"role": df.role, "idx_bucket": b, "t": df.t})
            .groupby(["role", "idx_bucket"], as_index=False)
            .agg(n_turns=("t", "size"), tokens=("t", "sum"))
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["role", "idx_bucket"], as_index=False).agg(
            n_turns=("n_turns", "sum"), tokens=("tokens", "sum")
        )
        out["mean_tokens"] = out.tokens.to_numpy() // np.maximum(out.n_turns.to_numpy(), 1)
        out = out.sort_values(["role", "idx_bucket"]).reset_index(drop=True)
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out

    return driver_combine(ds, partial, merge)


_Q208_SQL = f"""
WITH toks AS ({_SQL_TOKS}),
b AS (
  SELECT role, length(bin(CAST(turn_idx AS BIGINT) + 1)) - 1 AS idx_bucket, t
  FROM toks
)
SELECT role, CAST(idx_bucket AS BIGINT) AS idx_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(t) AS BIGINT) AS tokens,
       CAST(SUM(t) // COUNT(*) AS BIGINT) AS mean_tokens
FROM b GROUP BY role, idx_bucket ORDER BY role, idx_bucket
"""


# -------------------------------------------------------------------- q209

def q209_conversation_dedup(sf_dir: str):
    """Conversation-level EXACT dedup census: two conversations are
    duplicates iff their ordered turn texts are identical. Fingerprint =
    md5 of the chr(31)-joined PER-TURN md5 hexes in turn_idx order — the
    per-turn hashing happens in the corpus scan, so the conv-keyed
    exchange ships 32-char digests instead of raw text (the corpus's
    bytes never shuffle; at 100 TB that is the difference between an
    all-to-all of the corpus and one of ~1%% of it). Second tiny exchange
    keyed by fingerprint co-locates equal-content conversations (which a
    conv_id-keyed bucket cannot — dup convs have different conv_ids),
    emitting per-bucket frequency-of-frequencies partials; the driver
    merges group-size rows, never the fingerprint table. Output: one row
    per duplicate-group size (group_size, n_groups, n_convs)."""
    import hashlib

    ds = _turns_ds(sf_dir, ["conv_id", "turn_idx", "text"])

    def turn_hash(batch: pa.Table) -> pa.Table:
        h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table(
            {"conv_id": batch["conv_id"], "turn_idx": batch["turn_idx"], "h": pa.array(h)}
        )

    def conv_fp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        fp = (
            df.groupby("conv_id", sort=False)["h"]
            .agg("\x1f".join)
            .map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        )
        return pd.DataFrame({"fp": fp.to_numpy()})

    def fof(df: pd.DataFrame) -> pd.DataFrame:
        sz = df.fp.value_counts()
        fo = sz.value_counts()
        return pd.DataFrame(
            {"group_size": fo.index.to_numpy().astype("int64"), "n_groups": fo.to_numpy()}
        )

    fps = bucketed_combine(
        ds.map_batches(turn_hash, batch_format="pyarrow", zero_copy_batch=True),
        "conv_id",
        conv_fp,
        num_buckets=16,
    )
    parts = bucketed_combine(fps, "fp", fof, num_buckets=16).to_pandas()
    out = parts.groupby("group_size", as_index=False).agg(n_groups=("n_groups", "sum"))
    out["n_convs"] = out.group_size * out.n_groups
    out = out.sort_values("group_size").reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


_Q209_SQL = f"""
WITH per AS (
  SELECT conv_id, md5(string_agg(md5(text), chr(31) ORDER BY turn_idx)) AS fp
  FROM read_parquet('{_TURNS_VIEW}/*.parquet') GROUP BY conv_id
),
g AS (SELECT fp, COUNT(*) AS sz FROM per GROUP BY fp)
SELECT CAST(sz AS BIGINT) AS group_size,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(sz * COUNT(*) AS BIGINT) AS n_convs
FROM g GROUP BY sz ORDER BY sz
"""

# -------------------------------------------------------------------- q210

def q210_abandonment_census(sf_dir: str):
    """Conversation-abandonment census: the role of each conversation's
    FINAL turn — a conversation ending on a user turn is an unanswered
    (abandoned) session, ending on a tool turn is a broken agent loop,
    ending on an assistant turn is a served session. The first funnel
    number a serving dashboard shows. ONE conv-keyed exchange: per bucket,
    the max-turn_idx row per conversation (vectorized idxmax), then
    (role -> n_convs, plus that conversation's turn count via the same
    max) partials (<= 3 rows each); driver merge with exact ppm shares."""
    toks = _toks_ds(sf_dir)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        last = df.loc[df.groupby("conv_id")["turn_idx"].idxmax()]
        n_turns = df.groupby("conv_id", sort=False).size()
        return (
            pd.DataFrame(
                {
                    "last_role": last.role.to_numpy(),
                    "turns": n_turns.reindex(last.conv_id).to_numpy(),
                }
            )
            .groupby("last_role", as_index=False)
            .agg(n_convs=("turns", "size"), total_turns=("turns", "sum"))
        )

    parts = bucketed_combine(toks, "conv_id", combine, num_buckets=16).to_pandas()
    out = parts.groupby("last_role", as_index=False).agg(
        n_convs=("n_convs", "sum"), total_turns=("total_turns", "sum")
    )
    total = int(out.n_convs.sum())
    out["conv_share_ppm"] = out.n_convs.to_numpy() * 1_000_000 // max(total, 1)
    out = out.sort_values("last_role").reset_index(drop=True)
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


_Q210_SQL = f"""
WITH v AS (
  SELECT conv_id, turn_idx, role
  FROM read_parquet('{_TURNS_VIEW}/*.parquet')
),
per AS (
  SELECT conv_id, arg_max(role, turn_idx) AS last_role, COUNT(*) AS turns
  FROM v GROUP BY conv_id
),
g AS (
  SELECT last_role, COUNT(*) AS n_convs, SUM(turns) AS total_turns
  FROM per GROUP BY last_role
)
SELECT last_role, CAST(n_convs AS BIGINT) AS n_convs,
       CAST(total_turns AS BIGINT) AS total_turns,
       CAST(n_convs * 1000000 // GREATEST((SELECT SUM(n_convs) FROM g), 1) AS BIGINT)
         AS conv_share_ppm
FROM g ORDER BY last_role
"""


# -------------------------------------------------------------------- q211

def q211_tool_transitions(sf_dir: str):
    """Tool-chain bigrams: for consecutive TOOL invocations within a
    conversation (in turn order, skipping the user/assistant turns between
    them), count (prev_tool -> next_tool) transitions — the agent-loop
    structure miner (q54's event-transition analogue lifted onto the
    transcript stream). ONE conv-keyed exchange; inside a bucket the tool
    rows are filtered THEN shifted (vectorized), so partials are bounded
    by tools^2 rows (<= 25)."""
    ds = _turns_ds(sf_dir, ["conv_id", "turn_idx", "role", "tool"])

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.role.eq("tool")].sort_values(
            ["conv_id", "turn_idx"], kind="mergesort"
        )
        nxt = df.tool.shift(-1)
        same = df.conv_id.eq(df.conv_id.shift(-1))
        return (
            pd.DataFrame({"tool_a": df.tool[same], "tool_b": nxt[same]})
            .groupby(["tool_a", "tool_b"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    parts = bucketed_combine(ds, "conv_id", combine, num_buckets=16).to_pandas()
    if "tool_a" not in parts.columns:  # every bucket empty: zero-col blocks
        return pd.DataFrame(
            {
                "tool_a": pd.Series(dtype="object"),
                "tool_b": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
            }
        )
    out = (
        parts.groupby(["tool_a", "tool_b"], as_index=False)
        .agg(n=("n", "sum"))
        .sort_values(["tool_a", "tool_b"])
        .reset_index(drop=True)
    )
    out["n"] = out.n.astype("int64")
    return out


_Q211_SQL = f"""
WITH t AS (
  SELECT conv_id, turn_idx, tool
  FROM read_parquet('{_TURNS_VIEW}/*.parquet') WHERE role = 'tool'
),
s AS (
  SELECT conv_id, tool AS tool_a,
         lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS tool_b
  FROM t
)
SELECT tool_a, tool_b, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE tool_b IS NOT NULL
GROUP BY tool_a, tool_b ORDER BY tool_a, tool_b
"""


# -------------------------------------------------------------------- q212

def q212_time_to_first_assistant(sf_dir: str):
    """Time-to-first-assistant distribution: per conversation, the wall
    time from the FIRST turn to the FIRST assistant turn (0 when the
    conversation opens with the assistant; conversations with no assistant
    turn are excluded) — the user-visible "time to first token" at
    session granularity, with exact nearest-rank p50/p90/p99 via q205's
    value-count mechanism (bounded by distinct deltas — same disclosure).
    ONE conv-keyed exchange; per-bucket (delta -> count) partials."""
    ds = _turns_ds(sf_dir, ["conv_id", "turn_idx", "role", "ts"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "role": batch["role"],
                "us": batch["ts"].cast(pa.int64()),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        g = df.groupby("conv_id", sort=False)
        first_us = g["us"].transform("min")
        d = (
            pd.DataFrame(
                {"conv_id": df.conv_id, "tt": df.us - first_us}
            )[df.role.eq("assistant").to_numpy()]
            .groupby("conv_id", sort=False)["tt"]
            .min()
        )
        if not len(d):
            return pd.DataFrame(
                {"tt_us": pd.Series(dtype="int64"), "c": pd.Series(dtype="int64")}
            )
        vc = d.value_counts()
        return pd.DataFrame({"tt_us": vc.index.to_numpy(), "c": vc.to_numpy()})

    parts = bucketed_combine(
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True),
        "conv_id",
        combine,
        num_buckets=16,
    ).to_pandas()
    d = parts.groupby("tt_us", as_index=False).agg(c=("c", "sum")).sort_values("tt_us")
    tt = d.tt_us.to_numpy()
    cum = d.c.to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0

    def pct(q: int) -> int:
        rank = (q * n + 99) // 100
        return int(tt[np.searchsorted(cum, rank)])

    total = sum(int(v) * int(c) for v, c in zip(d.tt_us, d.c))
    return pd.DataFrame(
        {
            "n_convs": [n],
            "p50_us": [pct(50)],
            "p90_us": [pct(90)],
            "p99_us": [pct(99)],
            "mean_us": [total // max(n, 1)],
            "max_us": [int(tt.max()) if len(tt) else 0],
        }
    ).astype("int64")


_Q212_SQL = f"""
WITH v AS (
  SELECT conv_id, turn_idx, role, epoch_us(ts) AS us
  FROM read_parquet('{_TURNS_VIEW}/*.parquet')
),
per AS (
  SELECT conv_id,
         MIN(us) FILTER (WHERE role = 'assistant') - MIN(us) AS tt
  FROM v GROUP BY conv_id
),
l AS (SELECT tt FROM per WHERE tt IS NOT NULL),
d AS (SELECT tt, COUNT(*) AS c FROM l GROUP BY tt),
o AS (SELECT tt, SUM(c) OVER (ORDER BY tt) AS cum FROM d),
n AS (SELECT COUNT(*) AS n, SUM(tt) AS s, MAX(tt) AS mx FROM l)
SELECT CAST(n AS BIGINT) AS n_convs,
       CAST((SELECT MIN(tt) FROM o WHERE cum >= (50 * n + 99) // 100) AS BIGINT) AS p50_us,
       CAST((SELECT MIN(tt) FROM o WHERE cum >= (90 * n + 99) // 100) AS BIGINT) AS p90_us,
       CAST((SELECT MIN(tt) FROM o WHERE cum >= (99 * n + 99) // 100) AS BIGINT) AS p99_us,
       CAST(s // n AS BIGINT) AS mean_us,
       CAST(mx AS BIGINT) AS max_us
FROM n
"""
