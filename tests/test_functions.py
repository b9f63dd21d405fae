"""Operator-level unit tests for the pure extraction functions.

Edge cases derive from reference behavior (SURVEY.md §5.2): digits-only id
normalization (validation.service.js:57-71), regex fallback table
(previsacion.worker.js:231-251), confidence weights (gpt-vision.service.js:
217-241), date validation (validation.service.js:169-175).
"""

from __future__ import annotations

from medical_ocr_service_ray.functions.classify import classify_content_type
from medical_ocr_service_ray.functions.extractor import extract_turn
from medical_ocr_service_ray.functions.html_extract import extract_html
from medical_ocr_service_ray.functions.normalize import fold_accents, normalize_text
from medical_ocr_service_ray.functions.pdf_extract import extract_pdfish
from medical_ocr_service_ray.functions.plain_extract import extract_plain
from medical_ocr_service_ray.functions.spans import extract_spans


class TestClassify:
    def test_html_doctype(self):
        assert classify_content_type("  <!DOCTYPE html><html></html>") == "html"

    def test_html_tag_density(self):
        assert classify_content_type("a <div>b</div> <p>c</p> <span>d</span>") == "html"

    def test_pdfish_formfeed(self):
        assert classify_content_type("page one\fpage two") == "pdfish"

    def test_pdfish_marker(self):
        assert classify_content_type("--- Page 1 ---\nhello") == "pdfish"

    def test_plain(self):
        assert classify_content_type("just ordinary text with < 3 tags") == "plain"

    def test_empty(self):
        assert classify_content_type("") == "plain"

    def test_html_beats_pdfish_on_prologue(self):
        # explicit prologue wins even if a formfeed appears later
        assert classify_content_type("<!doctype html><body>\f</body>") == "html"


class TestHtmlExtract:
    def test_strips_nav_footer(self):
        doc = (
            "<html><body><nav><a href='/'>home</a><a href='/x'>x</a></nav>"
            "<div id='content'><p>the main content paragraph is here and long enough</p>"
            "<p>another substantial paragraph of content text follows here</p></div>"
            "<div class='footer'><a href='/t'>terms</a></div></body></html>"
        )
        text, warnings = extract_html(doc)
        assert "main content paragraph" in text
        assert "home" not in text
        assert "terms" not in text

    def test_link_farm_rejected(self):
        doc = (
            "<html><body>"
            "<div>" + "".join(f"<a href='/{i}'>link number {i} text</a>" for i in range(20)) + "</div>"
            "<div><p>genuine article body with enough prose to score highly here</p></div>"
            "</body></html>"
        )
        text, _ = extract_html(doc)
        assert "genuine article body" in text
        assert "link number 3" not in text

    def test_script_style_dropped(self):
        doc = "<div><script>var x=1;</script><style>.a{}</style><p>visible content text that is long enough to qualify</p></div>"
        text, _ = extract_html(doc)
        assert "var x" not in text and "visible content" in text

    def test_malformed_no_crash(self):
        text, warnings = extract_html("<div><p>unclosed everywhere <a<b <span")
        assert isinstance(text, str)

    def test_deep_nesting_no_recursion_error(self):
        doc = "<div>" * 5000 + "deep content here that should be extracted fine"
        text, _ = extract_html(doc)
        assert "deep content" in text

    def test_empty(self):
        text, warnings = extract_html("")
        assert text == "" and "empty_extraction" in warnings


class TestPdfExtract:
    def test_page_split_and_footer_drop(self):
        doc = "--- Page 1 ---\nbody line one\nPage 1 of 2\f--- Page 2 ---\nbody line two\nPage 2 of 2"
        text, _ = extract_pdfish(doc)
        assert text == "body line one\nbody line two"

    def test_running_header_removed(self):
        doc = "HOSPITAL CENTRAL\nalpha\nPage 1 of 2\fHOSPITAL CENTRAL\nbeta\nPage 2 of 2"
        text, _ = extract_pdfish(doc)
        assert text == "alpha\nbeta"

    def test_single_page_keeps_header(self):
        text, _ = extract_pdfish("HOSPITAL CENTRAL\nalpha")
        assert text == "HOSPITAL CENTRAL\nalpha"

    def test_two_column_reading_order(self):
        doc = "left one      right one\nleft two      right two"
        text, _ = extract_pdfish(doc)
        assert text == "left one\nleft two\nright one\nright two"

    def test_single_gap_line_not_columnized(self):
        text, _ = extract_pdfish("alpha      beta")
        assert text == "alpha beta"

    def test_three_column_line_collapsed_not_columnized(self):
        # only exact 2-part gap splits trigger reading-order recovery;
        # 3+ parts are treated as one line with gaps collapsed
        text, _ = extract_pdfish("aaa      bbb      ccc\nddd      eee      fff")
        assert text == "aaa bbb ccc\nddd eee fff"

    def test_pdf_prologue_stripped(self):
        t = "%PDF-1.4\nHeader Line\nbody content here\nPage 1 of 1"
        from medical_ocr_service_ray.functions.classify import classify_content_type

        assert classify_content_type(t) == "pdfish"
        text, _ = extract_pdfish(t)
        assert text == "Header Line\nbody content here"  # %PDF line + footer dropped

    def test_table_and_figure_excluded(self):
        doc = "intro\n[TABLE]\na | 1\nb | 2\n[/TABLE]\n[FIGURE: some chart]\noutro"
        text, warnings = extract_pdfish(doc)
        assert text == "intro\noutro"
        assert "table_excluded" in warnings


class TestPlainAndNormalize:
    def test_control_strip_collapse(self):
        text, _ = extract_plain("a\x00b   c\t d \n\n e")
        assert text == "ab c d\ne"

    def test_id_digits_only(self):
        out, _ = normalize_text("ci 4.321.765 ok")
        assert out == "ci 4321765 ok"

    def test_date_iso(self):
        out, w = normalize_text("el 05/03/2024 fue")
        assert out == "el 2024-03-05 fue" and w == []

    def test_invalid_date_warned(self):
        out, w = normalize_text("el 45/13/2024 fue")
        assert "45/13/2024" in out and "invalid_date" in w

    def test_leap_day(self):
        assert normalize_text("29/02/2024")[0] == "2024-02-29"
        assert "invalid_date" in normalize_text("29/02/2023")[1]

    def test_abbreviation_expansion(self):
        out, _ = normalize_text("Dx pendiente")
        assert out == "diagnostico pendiente"

    def test_abbreviation_table_complete(self):
        """Full parity with the reference's 80+ entry expansion semantics
        (system.prompt.js:20-77)."""
        from medical_ocr_service_ray.functions.normalize import ABBREVIATIONS

        assert len(ABBREVIATIONS) >= 80

    def test_abbreviation_new_entries(self):
        assert (
            normalize_text("EPOC y VIH")[0]
            == "enfermedad pulmonar obstructiva cronica y virus inmunodeficiencia humana"
        )
        assert normalize_text("tomar 1 cp c/8h VO")[0] == "tomar 1 comprimido cada 8 horas via oral"
        assert normalize_text("UCIN llena")[0] == "unidad de cuidados intensivos neonatal llena"

    def test_abbreviation_longest_first(self):
        # TAC must beat TA, QTx must beat QT, c/12h must beat h
        assert normalize_text("TAC de torax")[0] == "tomografia axial computarizada de torax"
        assert normalize_text("QTx adyuvante")[0] == "quimioterapia adyuvante"
        assert normalize_text("c/12h")[0] == "cada 12 horas"

    def test_abbreviation_ambiguity_first_listing_wins(self):
        # PA appears twice in the reference prompt; the first listing
        # (padecimiento actual) is the deterministic choice
        assert normalize_text("PA estable")[0] == "padecimiento actual estable"

    def test_abbreviation_case_sensitive_single_pass(self):
        assert normalize_text("rx pendiente")[0] == "rx pendiente"  # lowercase not a key
        assert normalize_text("IT")[0] == "inmunoterapia"
        # expansions are never re-expanded (single regex pass)
        assert normalize_text("VO")[0] == "via oral"

    def test_truncation(self):
        out, w = normalize_text("x" * 9000)
        assert len(out) == 8000 and "truncated" in w

    def test_fold_accents_length_preserving(self):
        s = "atención médica ñandú"
        assert len(fold_accents(s)) == len(s)
        assert fold_accents(s) == "atencion medica nandu"


class TestSpans:
    def test_offsets_into_original(self):
        s = "pedir TOMOGRAFIA el 01/02/2024 urgente ci 1.234.567"
        spans = extract_spans(s)
        by_field = {sp["field"]: sp for sp in spans}
        assert s[by_field["procedure"]["start"] : by_field["procedure"]["end"]] == "TOMOGRAFIA"
        assert s[by_field["date"]["start"] : by_field["date"]["end"]] == "01/02/2024"
        assert s[by_field["urgency"]["start"] : by_field["urgency"]["end"]] == "urgente"
        assert s[by_field["id_number"]["start"] : by_field["id_number"]["end"]] == "1.234.567"

    def test_accented_procedure_matches_with_original_offsets(self):
        s = "hacer tomografía hoy"
        spans = extract_spans(s)
        proc = [sp for sp in spans if sp["field"] == "procedure"]
        assert proc and s[proc[0]["start"] : proc[0]["end"]] == "tomografía"

    def test_procedure_dedupe_first_occurrence(self):
        s = "ECOGRAFIA luego otra ECOGRAFIA"
        procs = [sp for sp in extract_spans(s) if sp["field"] == "procedure"]
        assert len(procs) == 1 and procs[0]["start"] == 0

    def test_longest_procedure_wins(self):
        s = "RESONANCIA MAGNETICA de rodilla"
        procs = [sp for sp in extract_spans(s) if sp["field"] == "procedure"]
        assert s[procs[0]["start"] : procs[0]["end"]] == "RESONANCIA MAGNETICA"

    def test_matricula(self):
        s = "profesional M.N. 12345 firma"
        m = [sp for sp in extract_spans(s) if sp["field"] == "matricula"]
        assert m and s[m[0]["start"] : m[0]["end"]] == "M.N. 12345"


class TestExtractTurn:
    def test_deterministic(self):
        s = "<html><body><div><p>contenido principal del documento aqui presente</p></div></body></html>"
        assert extract_turn(s) == extract_turn(s)

    def test_confidence_rounded(self):
        r = extract_turn("TOMOGRAFIA 01/02/2024 ci 1.234.567 M.N. 12345 urgente y mas texto de relleno")
        assert r["confidence"] == round(r["confidence"], 2)
        assert r["confidence"] == 1.0

    def test_empty_gets_review(self):
        r = extract_turn("")
        assert r["confidence"] == 0.0 and "review_needed" in r["warnings"]

    def test_none_payload(self):
        r = extract_turn(None)
        assert r["extracted_text"] == ""


class TestTrieRegex:
    """_trie_regex must match exactly the same spans as the longest-first
    flat alternation, for any literal key set."""

    def _assert_equiv(self, keys, texts):
        import re

        from medical_ocr_service_ray.functions.normalize import _trie_regex

        flat = re.compile(
            r"\b(?:" + "|".join(sorted(map(re.escape, keys), key=len, reverse=True)) + r")\b"
        )
        trie = re.compile(r"\b(?:" + _trie_regex(list(keys)) + r")\b")
        for t in texts:
            a = [(m.start(), m.end()) for m in flat.finditer(t)]
            b = [(m.start(), m.end()) for m in trie.finditer(t)]
            assert a == b, (t, a, b)

    def test_prefix_keys_longest_wins(self):
        keys = ["TA", "TAC", "TACO", "T", "QT", "QTx", "c/8h", "h"]
        texts = ["TA TAC TACO T", "x TAC. QTx QT", "c/8h h 8h TACOS", "TATAC TAC0"]
        self._assert_equiv(keys, texts)

    def test_hypothesis_random_keys(self):
        import itertools
        import random

        rng = random.Random(5)
        alphabet = "ABCdx/8"
        for _ in range(30):
            keys = {"".join(rng.choice(alphabet) for _ in range(rng.randint(1, 4)))
                    for _ in range(rng.randint(1, 12))}
            text = " ".join(
                "".join(rng.choice(alphabet + " .") for _ in range(rng.randint(0, 6)))
                for _ in range(20)
            )
            self._assert_equiv(keys, [text])
