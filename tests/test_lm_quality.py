"""q69 char-LM quality scoring: the packed-codes/reduceat path against a
per-doc brute-force reference, with the edge shapes the vectorization could
break on (empty docs, 1-char docs, empty doc at the end of the pack)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _brute(texts: list[str]) -> pd.DataFrame:
    """Per-doc reference: same cleaning, python-dict bigram model."""
    import re
    from collections import Counter

    clean = [re.sub("[^a-z ]", "", (t or "").lower()) for t in texts]
    pairs = Counter()
    rowt = Counter()
    for t in clean:
        for a, b in zip(t, t[1:]):
            pairs[(a, b)] += 1
            rowt[a] += 1
    lnq = lambda x: int(np.floor(1e6 * np.log(float(x))))  # noqa: E731
    rows = []
    for i, t in enumerate(clean):
        n = max(len(t) - 1, 0)
        if n == 0:
            continue
        s = sum(lnq(rowt[a] + 27) - lnq(pairs[(a, b)] + 1) for a, b in zip(t, t[1:]))
        rows.append({"doc_id": i, "n_bigrams": n, "nll_q_sum": s, "nll_q_avg": s // n})
    return pd.DataFrame(rows)


class TestCharLmQuality:
    @pytest.mark.parametrize(
        "texts",
        [
            ["hello world", "the quick brown fox", "aaa bbb", "zz"],
            # edge shapes: empty, 1-char, punctuation-only (cleans to empty),
            # and an empty doc at the END of the packed array
            ["", "a", "?!42", "some normal text here", ""],
            ["repeated repeated repeated", "x y", " ", "tail doc", "q"],
        ],
    )
    def test_matches_bruteforce(self, ray_session, texts, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from medical_ocr_service_ray.pipelines.queries import q69_char_lm_quality

        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "source": pa.array(["s"] * len(texts)),
                "lang": pa.array(["en"] * len(texts)),
                "n_chars": pa.array([len(x) for x in texts], pa.int64()),
            }
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        got = (
            q69_char_lm_quality(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = _brute(texts).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
