"""Property-based tests (hypothesis): the extraction core must be total,
deterministic, and self-consistent on arbitrary input text — no payload may
crash it, span offsets always index the original text, confidence is always
a valid rounded score."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from medical_ocr_service_ray.functions.classify import classify_content_type
from medical_ocr_service_ray.functions.extractor import extract_turn
from medical_ocr_service_ray.functions.normalize import fold_accents, normalize_text
from medical_ocr_service_ray.functions.spans import extract_spans

# arbitrary unicode, plus a generator biased toward markup-ish fragments
_markupish = st.text(
    alphabet=st.sampled_from(list("<>/= \"'abcdiv!-\n\tpPDF%\fM.N0123456789URGENTE")),
    max_size=400,
)
_any_text = st.one_of(st.text(max_size=400), _markupish)


class TestTotality:
    @settings(max_examples=300, deadline=None)
    @given(_any_text)
    def test_extract_turn_never_raises(self, text):
        res = extract_turn(text)
        assert res["content_type"] in ("html", "pdfish", "plain")
        assert isinstance(res["extracted_text"], str)
        assert isinstance(res["warnings"], list)
        assert len(res["text_sha256"]) == 64

    @settings(max_examples=300, deadline=None)
    @given(_any_text)
    def test_deterministic(self, text):
        assert extract_turn(text) == extract_turn(text)


class TestSpanInvariants:
    @settings(max_examples=300, deadline=None)
    @given(_any_text)
    def test_offsets_index_original(self, text):
        folded = fold_accents(text).upper()
        for span in extract_spans(text):
            assert 0 <= span["start"] < span["end"] <= len(text)
            # the folded slice at those offsets must re-match the field class
            piece = folded[span["start"] : span["end"]]
            assert piece == piece.strip()

    @settings(max_examples=200, deadline=None)
    @given(_any_text)
    def test_spans_sorted_and_in_bounds(self, text):
        spans = extract_spans(text)
        keys = [(s["start"], s["end"], s["field"]) for s in spans]
        assert keys == sorted(keys)


class TestScoreInvariants:
    @settings(max_examples=200, deadline=None)
    @given(_any_text)
    def test_confidence_bounded_and_rounded(self, text):
        res = extract_turn(text)
        c = res["confidence"]
        assert 0.0 <= c <= 1.0
        assert abs(c - round(c, 2)) < 1e-9

    @settings(max_examples=200, deadline=None)
    @given(_any_text)
    def test_cap_always_respected(self, text):
        out, _ = normalize_text(text)
        assert len(out) <= 8000


class TestNormalizeInvariants:
    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=200))
    def test_fold_accents_length_preserving(self, text):
        assert len(fold_accents(text)) == len(text)

    @settings(max_examples=200, deadline=None)
    @given(_any_text)
    def test_classifier_total(self, text):
        assert classify_content_type(text) in ("html", "pdfish", "plain")
