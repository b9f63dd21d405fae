"""Planted-fixture tests for the agent-ops family (q213-q219).

A four-conversation hand-written turns table with every edge the kernels
must get right — a >60s inactivity gap inside a conversation (session
break) next to an exactly-60s gap (NOT a break), a canned assistant text
repeated both WITHIN one conversation and ACROSS conversations (q215/q217
must distinguish uses from distinct conversations), a tool retry chain that
crosses an interleaved assistant turn (tool adjacency is among TOOL turns
only), a run of three identical tool calls (max_run), a single-turn
conversation, and a conversation set whose OLS fit has a truncating
(non-exact) slope so the DuckDB-vs-Python division convention is load-
bearing. Every expected number is hand-derived in comments; the SQL gate
(test_assemble_and_sql_gate) separately checks Ray-vs-DuckDB on the
synthetic corpus at sf0.001."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from medical_ocr_service_ray.schemas import TRANSCRIPT_SCHEMA

_TURNS = [
    # conv  idx  role         text           tool      ts (us)
    ("c1", 0, "user", "hi", "", 0),
    ("c1", 1, "assistant", "hello world", "", 10_000_000),
    ("c1", 2, "user", "again", "", 80_000_000),  # gap 70s > 60s: break
    ("c1", 3, "assistant", "hello world", "", 90_000_000),  # canned, same conv
    ("c2", 0, "user", "hi", "", 0),  # "hi" reused across c1/c2
    ("c2", 1, "assistant", "hello world", "", 30_000_000),  # canned, 2nd conv
    ("c2", 2, "tool", "r1", "search", 40_000_000),
    ("c2", 3, "tool", "r2", "search", 45_000_000),  # search retry
    ("c2", 4, "assistant", "done", "", 50_000_000),
    ("c3", 0, "user", "q", "", 0),
    ("c3", 1, "tool", "a", "search", 5_000_000),
    ("c3", 2, "assistant", "mid", "", 10_000_000),
    ("c3", 3, "tool", "b", "browse", 15_000_000),  # search->browse ACROSS the
    ("c3", 4, "tool", "c", "browse", 20_000_000),  # assistant turn: adjacency
    ("c3", 5, "tool", "d", "browse", 25_000_000),  # is among tool turns only
    ("c4", 0, "user", "solo", "", 1_000_000),
]


def _write_corpus(dirpath, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    table = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
            "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    pq.write_table(table, dirpath / "transcripts-00000.parquet")


@pytest.fixture(scope="module")
def planted_sf_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("agentops_planted")
    corpus = root / "corpus"
    _write_corpus(corpus, _TURNS)

    import medical_ocr_service_ray.synth as synth
    from medical_ocr_service_ray.pipelines import queries_serving

    orig = synth.ensure_transcripts_for_sf
    synth.ensure_transcripts_for_sf = lambda sf_dir, **kw: corpus
    queries_serving._TURNS_VIEW_KEY[0] = None  # force a fresh view relink
    yield str(root)
    synth.ensure_transcripts_for_sf = orig
    queries_serving._TURNS_VIEW_KEY[0] = None


def _rows(df):
    return [tuple(r) for r in df.itertuples(index=False)]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


class TestSessionization:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_agentops import q213_sessionization

        out = q213_sessionization(planted_sf_dir)
        # c1 gaps [10s, 70s(break), 10s] -> 2 sessions / 4 turns;
        # c2 gaps [30,10,5,5]s -> 1 session / 5 turns; c3 gaps 5x5s -> 1/6;
        # c4 single turn -> 1/1.  n_sessions=1: 3 convs, 12 turns,
        # mean 12//(1*3)=4; n_sessions=2: 1 conv, 4 turns, mean 4//(2*1)=2.
        assert list(out.columns) == [
            "n_sessions", "n_convs", "total_turns", "mean_turns_per_session",
        ]
        assert _rows(out) == [(1, 3, 12, 4), (2, 1, 4, 2)]


class TestToolRetryCensus:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_agentops import q214_tool_retry_census

        out = q214_tool_retry_census(planted_sf_dir)
        # browse: c3 run of 3 -> calls 3, retries 2, ppm 666666, max_run 3.
        # search: c2 run of 2 (retry) + c3 singleton (the c3 search is
        # followed by browse ACROSS an assistant turn — a transition, not a
        # retry) -> calls 3, retries 1, ppm 333333, max_run 2.
        assert list(out.columns) == ["tool", "n_calls", "n_retries", "retry_ppm", "max_run"]
        assert _rows(out) == [
            ("browse", 3, 2, 666_666, 3),
            ("search", 3, 1, 333_333, 2),
        ]


class TestCannedResponseCensus:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_agentops import (
            q215_canned_response_census,
        )

        out = q215_canned_response_census(planted_sf_dir)
        # assistant texts: "hello world" x3 uses in 2 convs (c1 twice, c2
        # once — uses and convs must differ); "done" 1/1; "mid" 1/1, the
        # singletons ordered by hash asc under the count tie.
        single = sorted([_md5("done"), _md5("mid")])
        assert _rows(out) == [
            (_md5("hello world"), 3, 2),
            (single[0], 1, 1),
            (single[1], 1, 1),
        ]


class TestDialogueShapeCensus:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_agentops import (
            q216_dialogue_shape_census,
        )

        out = q216_dialogue_shape_census(planted_sf_dir)
        # c1 "uaua", c2 "uatta", c3 "utattt", c4 "u" — all distinct, so the
        # census is count-tied and ordered by shape asc.
        assert _rows(out) == [("u", 1), ("uatta", 1), ("uaua", 1), ("utattt", 1)]


class TestTurnTemplateReuse:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_agentops import (
            q217_turn_template_reuse,
        )

        out = q217_turn_template_reuse(planted_sf_dir)
        # assistant: texts {hello world(3 uses, 2 convs), done, mid} ->
        #   3 texts, 1 reused, reused_turns 3, total 5, ppm 600000.
        # tool: r1 r2 a b c d -> 6 texts, none reused.
        # user: {hi(2 uses, 2 convs), again, q, solo} -> 4 texts, 1 reused,
        #   reused_turns 2, total 5, ppm 400000. NOTE c1's within-conv
        #   repeat would NOT count as reuse (n_convs must be >= 2) — that
        #   edge is exercised by "hello world" spanning c1 AND c2 while
        #   "done"/"mid" stay single-conv.
        assert list(out.columns) == [
            "role", "n_texts", "n_reused", "reused_turns", "total_turns", "reuse_ppm",
        ]
        assert _rows(out) == [
            ("assistant", 3, 1, 3, 5, 600_000),
            ("tool", 6, 0, 0, 6, 0),
            ("user", 4, 1, 2, 5, 400_000),
        ]


class TestTokenGini:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_agentops import q218_token_gini

        out = q218_token_gini(planted_sf_dir)
        # assistant token counts [2,2,2,1,1] -> ascending [1,1,2,2,2]:
        # n=5, s=8; 2*sum(rank*x): tie group (1,c=2): 1*(0+2+1)*2=6;
        # (2,c=3): 2*(4+3+1)*3=48 -> t2=54; gini=(54-6*8)*1e6//40=150000.
        # user and tool turns are all 1 token -> gini 0.
        assert list(out.columns) == ["role", "n_turns", "tokens", "gini_ppm"]
        assert _rows(out) == [
            ("assistant", 5, 8, 150_000),
            ("tool", 6, 6, 0),
            ("user", 5, 5, 0),
        ]


class TestWallVsTurnsSlope:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_agentops import (
            q219_wall_vs_turns_slope,
        )

        out = q219_wall_vs_turns_slope(planted_sf_dir)
        # per-conv (x=turns, y=wall_us): c1 (4, 90e6), c2 (5, 50e6),
        # c3 (6, 25e6), c4 (1, 0).  n=4, sx=16, sy=165e6, sxy=760e6,
        # sxx=78, syy=11225e12.  cov_n=4*760e6-16*165e6=400e6; var_x=56;
        # slope=trunc(400e6/56)=7142857 (NOT exact — pins the truncation
        # convention); intercept=trunc((165e6-7142857*16)/4)=12678572;
        # var_y=4*11225e12-165e6^2=17675e12;
        # r2=trunc(trunc(4e14/56)*400e6/17675e12)
        #   =trunc(7142857142857*4e8/1.7675e16)=161648.
        assert _rows(out) == [(4, 7_142_857, 12_678_572, 161_648)]


class TestStuckLoopCensus:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_agentops import (
            q220_stuck_loop_census,
        )

        out = q220_stuck_loop_census(planted_sf_dir)
        # WITHIN-conv repeats only (q217's cross-conv "hello world" c1+c2
        # and "hi" c1+c2 must NOT count here unless repeated in ONE conv):
        # assistant: (conv,role) pairs c1/c2/c3 -> 3; c1 has "hello world"
        #   x2 (the only loop) -> 1 looping conv, loop_turns 2, total
        #   turns c1=2,c2=2,c3=1 -> 5, max_repeat 2, ppm 2*1e6//5=400000.
        # tool: c2 (r1,r2) + c3 (a,b,c,d) all distinct -> 2 pairs, 0 loops,
        #   total 6, max_repeat 1.
        # user: c1 (hi,again), c2 (hi), c3 (q), c4 (solo) -> 4 pairs, 0
        #   loops, total 5, max_repeat 1.
        assert list(out.columns) == [
            "role", "n_convs", "n_looping_convs", "loop_turns",
            "total_turns", "max_repeat", "loop_ppm",
        ]
        assert _rows(out) == [
            ("assistant", 3, 1, 2, 5, 2, 400_000),
            ("tool", 2, 0, 0, 6, 1, 0),
            ("user", 4, 0, 0, 5, 1, 0),
        ]
