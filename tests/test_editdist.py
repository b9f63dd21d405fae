"""Unit tests for the Levenshtein kernel behind q51 (fuzzy vocab match,
J2/J6 fuzzy-fallback analogue). The DP must agree bit-exactly with DuckDB's
levenshtein() so the SQL oracle can hash-match, and the dictionary-encoded
batch matcher must be a pure gather of the per-distinct results."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest


class TestLevenshtein:
    def test_known_values(self):
        from medical_ocr_service_ray.functions.editdist import levenshtein

        assert levenshtein("", "") == 0
        assert levenshtein("abc", "") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("flaw", "lawn") == 2
        assert levenshtein("same", "same") == 0

    def test_symmetry_and_bounds(self):
        from medical_ocr_service_ray.functions.editdist import levenshtein

        rng = np.random.default_rng(11)
        alpha = "abcde"
        for _ in range(50):
            a = "".join(rng.choice(list(alpha), size=rng.integers(0, 9)))
            b = "".join(rng.choice(list(alpha), size=rng.integers(0, 9)))
            d = levenshtein(a, b)
            assert d == levenshtein(b, a)
            assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))

    def test_matches_duckdb_random(self):
        """The SQL-oracle contract: identical to DuckDB levenshtein() on
        random ASCII strings including empty."""
        from medical_ocr_service_ray.functions.editdist import levenshtein

        rng = np.random.default_rng(7)
        alpha = list("abcdefgh ")
        pairs = [
            (
                "".join(rng.choice(alpha, size=rng.integers(0, 12))),
                "".join(rng.choice(alpha, size=rng.integers(0, 12))),
            )
            for _ in range(100)
        ]
        con = duckdb.connect()
        con.register("p", pd.DataFrame(pairs, columns=["a", "b"]))
        exp = con.execute("SELECT levenshtein(a, b) AS d FROM p").fetchdf().d.tolist()
        got = [levenshtein(a, b) for a, b in pairs]
        assert got == exp


class TestBestMatch:
    VOCAB = ["jion", "scann", "sorrt"]

    def test_tiebreak_is_lexicographic(self):
        from medical_ocr_service_ray.functions.editdist import best_match

        # "sionn" is distance 2 from both "jion" and "scann" -> "jion" wins
        out = best_match(pd.Series(["sionn"]), self.VOCAB)
        from medical_ocr_service_ray.functions.editdist import levenshtein

        dists = {t: levenshtein("sionn", t) for t in self.VOCAB}
        best = min(dists.values())
        expected_term = min(t for t, d in dists.items() if d == best)
        assert out.best_term.iloc[0] == expected_term
        assert out.best_dist.iloc[0] == best

    def test_dictionary_gather_matches_rowwise(self):
        """Batch with heavy duplication: dictionary-encoded result must equal
        the naive per-row computation (and preserve the input index)."""
        from medical_ocr_service_ray.functions.editdist import best_match, levenshtein

        vals = pd.Series(
            ["jons", "scan", "jons", "", "sort", "scan", "jons"],
            index=[5, 3, 9, 0, 7, 1, 2],
        )
        out = best_match(vals, self.VOCAB)
        assert list(out.index) == list(vals.index)
        for v, term, dist in zip(vals, out.best_term, out.best_dist):
            dists = [(levenshtein(v, t), t) for t in sorted(self.VOCAB)]
            ed, et = min(dists)
            assert (term, dist) == (et, ed)

    def test_exact_hit_is_distance_zero(self):
        from medical_ocr_service_ray.functions.editdist import best_match

        out = best_match(pd.Series(["scann"]), self.VOCAB)
        assert out.best_term.iloc[0] == "scann"
        assert out.best_dist.iloc[0] == 0


class TestLevLe1Batch:
    def test_matches_dp_over_random_small_alphabet(self):
        """Vectorized lev<=1 kernel equals the exact DP on 20k random pairs
        over a 3-letter alphabet (incl. a non-ASCII char to force the
        fallback path), lengths 0-4 — covers equal-length hamming,
        single-deletion at every position, and the >=2 length gap."""
        import itertools
        import random

        import numpy as np

        from medical_ocr_service_ray.functions.editdist import (
            lev_le1_batch,
            levenshtein,
        )

        alpha = "abñ"
        strs = [""] + [
            "".join(t) for L in (1, 2, 3, 4) for t in itertools.product(alpha, repeat=L)
        ]
        rng = random.Random(0)
        pairs = [(rng.choice(strs), rng.choice(strs)) for _ in range(20000)]
        got = lev_le1_batch([a for a, _ in pairs], [b for _, b in pairs])
        exp = np.array([levenshtein(a, b) <= 1 for a, b in pairs])
        assert (got == exp).all()
