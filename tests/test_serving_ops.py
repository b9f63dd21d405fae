"""Planted-fixture tests for the serving/SFT transcript family (q201-q209).

A four-conversation hand-written turns table with every edge the kernels must
get right — a conversation with NO assistant turn (dropped by q201), an
assistant-FIRST conversation (context 0; no latency row because there is no
preceding turn), text with leading tabs / trailing newlines (pins the `\\S+`
tokenizer against the trim+split idiom that undercounts here), a 600-token
turn that crosses the 512 context window, and a tool turn (third role in the
attribution tables). Every expected number below is hand-derived in the
comments; the SQL gate (test_assemble_and_sql_gate) separately checks
Ray-vs-DuckDB on the synthetic corpus at sf0.001.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from medical_ocr_service_ray.schemas import TRANSCRIPT_SCHEMA

# token counts:        ca: [2, 1, 3, 1]   cb: [2, 2]   cc: [2]   cd: [600, 10]
_TURNS = [
    # conv  idx  role         text                    tool       ts (us)
    ("ca", 0, "user", "hi there", "", 1_000_000),
    ("ca", 1, "assistant", "hello", "", 1_400_000),
    ("ca", 2, "user", "\ta b c\n", "", 2_000_000),  # tabs/newline: 3 tokens
    ("ca", 3, "assistant", "d", "", 2_100_000),
    ("cb", 0, "user", "only user", "", 0),
    ("cb", 1, "tool", "x y", "lookup", 500_000),
    ("cc", 0, "assistant", "first mover", "", 7_000_000),
    ("cd", 0, "user", " ".join(["w"] * 600), "", 10_000_000),
    ("cd", 1, "assistant", "ok then maybe yes no a b c d e", "", 13_000_000),
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
    """Write the planted corpus and point ensure_transcripts_for_sf at it for
    the duration of the module (module-scoped monkeypatch)."""
    root = tmp_path_factory.mktemp("serving_planted")
    corpus = root / "corpus"
    _write_corpus(corpus, _TURNS)

    import medical_ocr_service_ray.synth as synth
    from medical_ocr_service_ray.pipelines import queries_serving

    orig = synth.ensure_transcripts_for_sf
    orig_key = queries_serving._TURNS_VIEW_KEY[0]
    synth.ensure_transcripts_for_sf = lambda sf_dir, **kw: corpus
    queries_serving._TURNS_VIEW_KEY[0] = None  # force a fresh view relink
    yield str(root)
    synth.ensure_transcripts_for_sf = orig
    queries_serving._TURNS_VIEW_KEY[0] = None
    assert orig_key is None or True  # original key is stale either way


def _rows(df):
    return [tuple(r) for r in df.itertuples(index=False)]


class TestPrefixCacheSavings:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import (
            q201_prefix_cache_savings,
        )

        out = q201_prefix_cache_savings(planted_sf_dir)
        # ca ctx=[0,2,3,6]: assistant ctx 2+6 -> nocache=8, cached(last)=6
        # cb: no assistant turn -> dropped entirely
        # cc ctx=[0]: nocache=0 cached=0 (assistant-first still counts)
        # cd ctx=[0,600]: nocache=600 cached=600 (single assistant turn:
        #   caching saves nothing)
        assert list(out.columns) == [
            "n_turns",
            "n_convs",
            "prefill_nocache",
            "prefill_cached",
            "saving_ppm",
        ]
        assert _rows(out) == [
            (1, 1, 0, 0, 0),
            (2, 1, 600, 600, 0),
            (4, 1, 8, 6, (8 - 6) * 10**6 // 8),  # 250000
        ]


class TestSftPairs:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import q202_sft_pairs

        out = q202_sft_pairs(planted_sf_dir)
        # pairs: ca(2->1) bucket bit_length(3)-1=1; ca(3->1) bucket
        # bit_length(4)-1=2; cd(600->10) bucket bit_length(601)-1=9.
        # cb user->tool and cc assistant-first are NOT pairs.
        assert _rows(out) == [
            (1, 1, 2, 1, 500_000),
            (2, 1, 3, 1, 333_333),
            (9, 1, 600, 10, 10 * 10**6 // 600),  # 16666
        ]


class TestLossMaskMass:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import q203_loss_mask_mass

        out = q203_loss_mask_mass(planted_sf_dir)
        # assistant: 4 turns, 1+1+2+10=14 tokens; user: 4 turns, 2+3+2+600=607;
        # tool: 1 turn, 2 tokens; total 623.
        assert _rows(out) == [
            ("assistant", 4, 14, 14 * 10**6 // 623, 1),
            ("tool", 1, 2, 2 * 10**6 // 623, 0),
            ("user", 4, 607, 607 * 10**6 // 623, 0),
        ]


class TestContextOverflow:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import (
            q204_context_overflow,
        )

        out = q204_context_overflow(planted_sf_dir)
        # cum: ca=[2,3,6,7] cb=[2,4] cc=[2] cd=[600,610]; 9 turns total.
        # W=512: cd's two turns exceed (600,610); conv cd total 610>512,
        # tokens_over=98; ppm=2e6//9.
        assert _rows(out) == [
            (512, 2, 1, 98, 2 * 10**6 // 9),  # 222222
            (2048, 0, 0, 0, 0),
            (8192, 0, 0, 0, 0),
        ]


class TestAssistantLatency:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import (
            q205_assistant_latency,
        )

        out = q205_assistant_latency(planted_sf_dir)
        # latencies: ca1=400000, ca3=100000, cd1=3000000 (cc0 has no lag).
        # sorted [1e5, 4e5, 3e6]; nearest-rank p50 -> rank ceil(1.5)=2 ->
        # 400000; p90 rank ceil(2.7)=3; p99 rank 3; mean 3500000//3.
        assert _rows(out) == [
            (3, 400_000, 3_000_000, 3_000_000, 3_500_000 // 3, 3_000_000)
        ]


class TestTurnTimeAttribution:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import (
            q206_turn_time_attribution,
        )

        out = q206_turn_time_attribution(planted_sf_dir)
        # gaps charged to the turn's role: ca1 a=400000, ca2 u=600000,
        # ca3 a=100000, cb1 tool=500000, cd1 a=3000000. total=4600000.
        assert _rows(out) == [
            ("assistant", 3, 3_500_000, 3_500_000 * 10**6 // 4_600_000),
            ("tool", 1, 500_000, 500_000 * 10**6 // 4_600_000),
            ("user", 1, 600_000, 600_000 * 10**6 // 4_600_000),
        ]


class TestToolWallTime:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import q207_tool_wall_time

        out = q207_tool_wall_time(planted_sf_dir)
        # only tool turn with a predecessor: cb1 (tool=lookup, lat=500000)
        assert _rows(out) == [("lookup", 1, 500_000, 500_000, 1_000_000)]


class TestDepthTokenProfile:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import (
            q208_depth_token_profile,
        )

        out = q208_depth_token_profile(planted_sf_dir)
        # bucket = bit_length(turn_idx+1)-1: idx0->0, idx1/idx2->1, idx3->2
        # assistant: b0 cc0(2); b1 ca1(1)+cd1(10); b2 ca3(1)
        # tool: b1 cb1(2); user: b0 ca0(2)+cb0(2)+cd0(600); b1 ca2(3)
        assert _rows(out) == [
            ("assistant", 0, 1, 2, 2),
            ("assistant", 1, 2, 11, 5),
            ("assistant", 2, 1, 1, 1),
            ("tool", 1, 1, 2, 2),
            ("user", 0, 3, 604, 201),
            ("user", 1, 1, 3, 3),
        ]


class TestConversationDedup:
    def test_all_unique_on_shared_fixture(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import (
            q209_conversation_dedup,
        )

        out = q209_conversation_dedup(planted_sf_dir)
        assert _rows(out) == [(1, 4, 4)]

    def test_duplicate_groups(self, ray_session, tmp_path):
        """Dedicated corpus with known dup groups: x1==x2 (2 turns), y1==y2==y3
        (1 turn), z unique, w1/w2 = same texts in OPPOSITE turn order (NOT
        dups — the fingerprint is order-sensitive)."""
        rows = [
            ("x1", 0, "user", "same first", "", 1_000_000),
            ("x1", 1, "assistant", "same second", "", 2_000_000),
            ("x2", 0, "user", "same first", "", 5_000_000),
            ("x2", 1, "assistant", "same second", "", 6_000_000),
            ("y1", 0, "user", "solo", "", 0),
            ("y2", 0, "user", "solo", "", 1),
            ("y3", 0, "user", "solo", "", 2),
            ("z", 0, "user", "one of a kind", "", 3),
            ("w1", 0, "user", "alpha", "", 10),
            ("w1", 1, "user", "beta", "", 20),
            ("w2", 0, "user", "beta", "", 30),
            ("w2", 1, "user", "alpha", "", 40),
        ]
        corpus = tmp_path / "dedup_corpus"
        _write_corpus(corpus, rows)

        import medical_ocr_service_ray.synth as synth
        from medical_ocr_service_ray.pipelines import queries_serving
        from medical_ocr_service_ray.pipelines.queries_serving import (
            q209_conversation_dedup,
        )

        prev = synth.ensure_transcripts_for_sf
        prev_key = queries_serving._TURNS_VIEW_KEY[0]
        synth.ensure_transcripts_for_sf = lambda sf_dir, **kw: corpus
        queries_serving._TURNS_VIEW_KEY[0] = None
        try:
            out = q209_conversation_dedup(str(tmp_path))
            # sizes: 1 -> {z, w1, w2}; 2 -> {x}; 3 -> {y}
            assert _rows(out) == [(1, 3, 3), (2, 1, 2), (3, 1, 3)]
        finally:
            synth.ensure_transcripts_for_sf = prev
            queries_serving._TURNS_VIEW_KEY[0] = None
            assert prev_key is None or True


class TestAbandonmentCensus:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import (
            q210_abandonment_census,
        )

        out = q210_abandonment_census(planted_sf_dir)
        # final turns: ca3 assistant (conv of 4), cb1 tool (2), cc0 assistant
        # (1), cd1 assistant (2) -> assistant 3 convs / 7 turns, tool 1 / 2.
        assert _rows(out) == [
            ("assistant", 3, 7, 750_000),
            ("tool", 1, 2, 250_000),
        ]


class TestToolTransitions:
    def test_no_consecutive_tools_is_empty(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import (
            q211_tool_transitions,
        )

        out = q211_tool_transitions(planted_sf_dir)
        # only one tool turn in the fixture -> zero bigrams, schema intact
        assert list(out.columns) == ["tool_a", "tool_b", "n"]
        assert len(out) == 0

    def test_chain_bigrams(self, ray_session, tmp_path):
        """Two tool chains: conv t1 lookup->billing->lookup (two bigrams,
        skipping the assistant turn between); conv t2 billing->billing."""
        rows = [
            ("t1", 0, "tool", "a", "lookup", 0),
            ("t1", 1, "assistant", "b", "", 1_000_000),
            ("t1", 2, "tool", "c", "billing", 2_000_000),
            ("t1", 3, "tool", "d", "lookup", 3_000_000),
            ("t2", 0, "tool", "e", "billing", 0),
            ("t2", 1, "tool", "f", "billing", 1_000_000),
        ]
        corpus = tmp_path / "tool_corpus"
        _write_corpus(corpus, rows)

        import medical_ocr_service_ray.synth as synth
        from medical_ocr_service_ray.pipelines import queries_serving
        from medical_ocr_service_ray.pipelines.queries_serving import (
            q211_tool_transitions,
        )

        prev = synth.ensure_transcripts_for_sf
        synth.ensure_transcripts_for_sf = lambda sf_dir, **kw: corpus
        queries_serving._TURNS_VIEW_KEY[0] = None
        try:
            out = q211_tool_transitions(str(tmp_path))
            assert _rows(out) == [
                ("billing", "billing", 1),
                ("billing", "lookup", 1),
                ("lookup", "billing", 1),
            ]
        finally:
            synth.ensure_transcripts_for_sf = prev
            queries_serving._TURNS_VIEW_KEY[0] = None


class TestTimeToFirstAssistant:
    def test_hand_computed(self, ray_session, planted_sf_dir):
        from medical_ocr_service_ray.pipelines.queries_serving import (
            q212_time_to_first_assistant,
        )

        out = q212_time_to_first_assistant(planted_sf_dir)
        # ca: 1.4e6-1.0e6=400000; cb: no assistant (excluded); cc: 0
        # (assistant-first); cd: 13e6-10e6=3000000. sorted [0,4e5,3e6]:
        # p50 rank ceil(1.5)=2 -> 400000; p90/p99 rank 3 -> 3000000.
        assert _rows(out) == [
            (3, 400_000, 3_000_000, 3_000_000, 3_400_000 // 3, 3_000_000)
        ]
