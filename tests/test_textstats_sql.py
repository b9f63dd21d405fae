"""Text-analysis functions vs their DuckDB SQL mirrors on edge-case docs —
the same SQL fragments used by oracle_sql() must match the Python bit-for-bit
on empties, unicode, repeated markers, and punctuation runs."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from medical_ocr_service_ray.functions.textstats import (
    LANGS,
    lang_id,
    quality_score,
    sql_lang_score,
    sql_occurrences,
    token_stats,
)

EDGE_DOCS = [
    "",
    "   ",
    "one",
    "the quick brown fox and the lazy dog of the farm is here",
    "el rapido zorro de la granja que los perros el el el",
    "der und die der nicht und",
    "le et les des le et",
    "word " * 500,
    "a.b,c!d.e,f!",
    "tabs\tand\nnewlines\r\nmixed   spaces",
    "Ünïcödé wörds ärê fine tōō",
    " the and of a to in is ",
    "THE AND OF",  # case folding
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    df = pd.DataFrame({"doc_id": range(len(EDGE_DOCS)), "text": EDGE_DOCS})
    c.register("docs", df)
    return c


class TestTokenStatsSql:
    def test_matches_sql(self, con):
        sql = """
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS alpha_chars,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE CAST(floor(100.0 * length(regexp_replace(text, '\\s', '', 'g'))
                         / length(string_split_regex(trim(text), '\\s+'))) AS BIGINT) END AS avg_token_len_x100
        FROM docs ORDER BY doc_id
        """
        exp = con.execute(sql).df()
        for i, text in enumerate(EDGE_DOCS):
            got = token_stats(text)
            row = exp.iloc[i]
            assert got["n_tokens"] == row.n_tokens, (i, text)
            assert got["n_chars"] == row.n_chars, (i, text)
            assert got["alpha_chars"] == row.alpha_chars, (i, text)
            assert got["avg_token_len_x100"] == row.avg_token_len_x100, (i, text)


class TestLangIdSql:
    def test_matches_sql(self, con):
        scores = ", ".join(f"{sql_lang_score('p', lang)} AS s_{lang}" for lang in LANGS)
        zero = " AND ".join(f"s_{lang} = 0" for lang in LANGS)
        cases = " ".join(
            "WHEN "
            + " AND ".join(f"s_{lang} >= s_{o}" for o in LANGS if o != lang)
            + f" THEN '{lang}'"
            for lang in LANGS
        )
        sql = f"""
        WITH padded AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM docs),
        scores AS (SELECT doc_id, {scores} FROM padded)
        SELECT doc_id, CASE WHEN {zero} THEN 'und' {cases} ELSE 'und' END AS lang_pred
        FROM scores ORDER BY doc_id
        """
        exp = con.execute(sql).df()
        for i, text in enumerate(EDGE_DOCS):
            assert lang_id(text) == exp.iloc[i].lang_pred, (i, text)


class TestQualitySql:
    def test_matches_sql(self, con):
        from medical_ocr_service_ray.functions.textstats import STOPWORDS

        stop = " + ".join(sql_occurrences("p", s) for s in STOPWORDS)
        punct = " + ".join(sql_occurrences("text", c) for c in (".", ",", "!"))
        sql = f"""
        WITH base AS (
          SELECT doc_id, text, ' ' || lower(text) || ' ' AS p,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) END AS n_tokens
          FROM docs
        )
        SELECT doc_id, n_tokens, {stop} AS stop_hits, {punct} AS punct_count,
               least(n_tokens, 200)*2 + least(({stop})*10, 100)*3 + least(({punct})*5, 100) AS quality
        FROM base ORDER BY doc_id
        """
        exp = con.execute(sql).df()
        for i, text in enumerate(EDGE_DOCS):
            got = quality_score(text)
            row = exp.iloc[i]
            assert got["n_tokens"] == row.n_tokens, (i, text)
            assert got["stop_hits"] == row.stop_hits, (i, text)
            assert got["punct_count"] == row.punct_count, (i, text)
            assert got["quality"] == row.quality, (i, text)
