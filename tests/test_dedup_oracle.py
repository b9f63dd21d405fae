"""Pytest oracles for the non-SQL dedup operators: planted near-duplicates
must be found; results must match a pure-Python brute-force reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray

from medical_ocr_service_ray.functions.hashing import jaccard, shingles


@pytest.fixture(scope="module")
def planted_docs(ray_session):
    """120 docs: 100 unique + 10 exact-dup pairs is impossible here, so:
    ids 0..99 unique prose; 100..109 are near-copies of 0..9 (one word
    changed); 110..119 are exact copies of 10..19."""
    rng = np.random.default_rng(123)
    vocab = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambatter mu nu xi "
        "omicron pi rho sigma tau upsilon phi chi psi omega red green blue "
        "yellow orange purple mountain river forest desert ocean valley"
    ).split()
    texts = [" ".join(rng.choice(vocab, 40)) for _ in range(100)]
    near = []
    for i in range(10):
        words = texts[i].split()
        words[5] = "CHANGEDWORD"
        near.append(" ".join(words))
    exact = [texts[10 + i] for i in range(10)]
    all_texts = texts + near + exact
    return pa.table(
        {
            "doc_id": pa.array(range(len(all_texts)), pa.int64()),
            "text": pa.array(all_texts, pa.string()),
        }
    )


class TestExactDedup:
    def test_exact_pairs_collapse(self, planted_docs):
        import ray.data as rd

        from medical_ocr_service_ray.stages.dedup import exact_dedup

        out = exact_dedup(rd.from_arrow(planted_docs)).to_pandas()
        assert len(out) == 110  # 120 docs, 10 exact dup pairs
        dups = out[out.dup_count == 2]
        assert sorted(dups.doc_id) == list(range(10, 20))  # min doc_id kept


class TestMinHashLSH:
    def test_finds_planted_near_dups(self, planted_docs):
        import ray.data as rd

        from medical_ocr_service_ray.stages.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            rd.from_arrow(planted_docs), threshold_x1000=600
        ).to_pandas()
        found = set(zip(pairs.doc_a, pairs.doc_b))
        for i in range(10):
            assert (i, 100 + i) in found, f"missed near-dup pair ({i}, {100+i})"
        for i in range(10, 20):
            assert (i, 100 + i) in found, f"missed exact pair ({i}, {110+i-10})"

    def test_jaccard_values_match_bruteforce(self, planted_docs):
        import ray.data as rd

        from medical_ocr_service_ray.stages.dedup import minhash_lsh_pairs

        ids = planted_docs["doc_id"].to_pylist()
        texts = planted_docs["text"].to_pylist()
        lookup = dict(zip(ids, texts))
        pairs = minhash_lsh_pairs(
            rd.from_arrow(planted_docs), threshold_x1000=600
        ).to_pandas()
        for _, row in pairs.iterrows():
            sa, sb = shingles(lookup[row.doc_a]), shingles(lookup[row.doc_b])
            expected = (1000 * len(sa & sb)) // len(sa | sb)
            assert row.jaccard_x1000 == expected

    def test_no_false_positives_above_threshold(self, planted_docs):
        """Every reported pair must truly have Jaccard >= threshold (the
        verify stage guarantees it by construction; check anyway)."""
        import ray.data as rd

        from medical_ocr_service_ray.stages.dedup import minhash_lsh_pairs

        lookup = dict(zip(planted_docs["doc_id"].to_pylist(), planted_docs["text"].to_pylist()))
        pairs = minhash_lsh_pairs(
            rd.from_arrow(planted_docs), threshold_x1000=600
        ).to_pandas()
        for _, row in pairs.iterrows():
            assert jaccard(shingles(lookup[row.doc_a]), shingles(lookup[row.doc_b])) >= 0.6


class TestSimHash:
    def test_exact_copies_hamming_zero(self, planted_docs):
        import ray.data as rd

        from medical_ocr_service_ray.stages.dedup import simhash_pairs

        pairs = simhash_pairs(rd.from_arrow(planted_docs), max_hamming=3).to_pandas()
        found = {(a, b): h for a, b, h in zip(pairs.doc_a, pairs.doc_b, pairs.hamming)}
        for i in range(10, 20):
            assert found.get((i, 100 + i)) == 0, f"exact copy pair ({i},{100+i}) not at hamming 0"


class TestVerifyPairsFastPath:
    """The three verify_pairs_jaccard tiers (broadcast / candidate-sized
    exchanges / corpus two-join fallback) must return identical rows."""

    def _pairs_ds(self):
        import pandas as pd
        import ray.data as rd

        # duplicated candidates (multi-band surfacing), a low-jaccard pair
        # that must be filtered, and a pair whose endpoint is absent from
        # the corpus (text resolves to "")
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_a": pd.array([0, 0, 10, 10, 10, 5, 3, 50], "int64"),
                    "doc_b": pd.array([100, 100, 110, 110, 110, 7, 103, 999], "int64"),
                }
            )
        )

    def _run(self, planted_docs, **kw):
        import ray.data as rd

        from medical_ocr_service_ray.stages.dedup import verify_pairs_jaccard

        out = verify_pairs_jaccard(
            self._pairs_ds(), rd.from_arrow(planted_docs), threshold_x1000=600, **kw
        ).to_pandas()
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    def test_three_tiers_identical(self, planted_docs):
        import pandas as pd

        t1 = self._run(planted_docs)  # broadcast tier
        t2 = self._run(planted_docs, broadcast_max_bytes=0)  # exchange tier
        t3 = self._run(planted_docs, broadcast_max_ids=0)  # corpus two-join
        assert len(t1) > 0
        pd.testing.assert_frame_equal(t1, t2)
        pd.testing.assert_frame_equal(t1, t3)

    def test_values_and_filtering(self, planted_docs):
        lookup = dict(
            zip(planted_docs["doc_id"].to_pylist(), planted_docs["text"].to_pylist())
        )
        out = self._run(planted_docs)
        found = dict(zip(zip(out.doc_a, out.doc_b), out.jaccard_x1000))
        assert (0, 100) in found and (10, 110) in found
        assert (5, 7) not in found  # unrelated prose, below threshold
        assert (50, 999) not in found  # missing endpoint -> empty shingles
        assert found[(10, 110)] == 1000  # exact copy
        sa, sb = shingles(lookup[0]), shingles(lookup[100])
        assert found[(0, 100)] == (1000 * len(sa & sb)) // len(sa | sb)
        # no duplicate output rows despite multi-band duplicate candidates
        assert len(out) == len(out.drop_duplicates(["doc_a", "doc_b"]))

    def test_empty_pairs(self, planted_docs):
        import pandas as pd
        import ray.data as rd

        from medical_ocr_service_ray.stages.dedup import verify_pairs_jaccard

        empty = rd.from_pandas(
            pd.DataFrame(
                {"doc_a": pd.array([], "int64"), "doc_b": pd.array([], "int64")}
            )
        )
        out = verify_pairs_jaccard(empty, rd.from_arrow(planted_docs)).to_pandas()
        assert len(out) == 0
