"""Semantic-matching enrichment: the reference's core lookup join, rebuilt
deterministically.

Reference semantics (SURVEY.md §2.4): per extracted practice, knn over the
``nomencladores`` dimension with combined score ``0.7*vector + 0.3*trigram``
(src/services/matching.service.js:60-66), agreement semi-join preferring
candidates with a vigente acuerdo (J5/J6, matching.service.js:298-341,
351-432), top-5 alternates with ``tiene_acuerdo`` flags (:395-406), plus an
LRU-cached embedding key (ST1, src/services/embedding.service.js:4-53).

Deterministic rebuild: trigram-set Jaccard replaces the embedding cosine
(integer x1000 arithmetic), term weight replaces the trigram side score:
``combined_x1000 = (700 * trigram_x1000 + 300 * weight_x1000) // 1000``.
The dimension table is broadcast once via ray.put; each actor builds its
trigram index in ``__init__`` and keeps a bounded memo cache per actor.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from medical_ocr_service_ray.functions.normalize import fold_accents

TOP_K = 5  # top-5 alternates, pre-visacion.service.js:132


def trigrams(text: str) -> frozenset:
    s = " " + fold_accents(text.lower()).strip() + " "
    if len(s) < 3:
        return frozenset()
    return frozenset(s[i : i + 3] for i in range(len(s) - 2))


def make_term_index(terms: list[dict]) -> list[tuple[int, str, frozenset, int]]:
    """[(term_id, canonical, trigram_set, weight_x1000)] — one entry per
    canonical term AND per synonym (synonym hits map to the canonical id)."""
    index = []
    for t in terms:
        weight = int(round(t.get("weight", 0.0) * 1000))
        index.append((t["term_id"], t["term"], trigrams(t["term"]), weight))
        for syn in t.get("synonyms", []) or []:
            index.append((t["term_id"], t["term"], trigrams(syn), weight))
    return index


def match_term(
    query: str,
    index: list[tuple[int, str, frozenset, int]],
    agreements: frozenset,
    min_score_x1000: int = 150,
) -> list[tuple[int, int, bool]]:
    """Top-K (term_id, combined_x1000, has_agreement), agreement-preferred.

    Ordering: candidates WITH an agreement first (J6 preference), then by
    combined score desc, then term_id asc — fully deterministic."""
    q = trigrams(query)
    if not q:
        return []
    best: dict[int, int] = {}
    for term_id, _canon, tset, weight in index:
        union = len(q | tset)
        tri = (1000 * len(q & tset)) // union if union else 0
        combined = (700 * tri + 300 * weight) // 1000
        if combined >= min_score_x1000 and combined > best.get(term_id, -1):
            best[term_id] = combined
    ranked = sorted(
        ((tid, score, tid in agreements) for tid, score in best.items()),
        key=lambda x: (not x[2], -x[1], x[0]),
    )
    return ranked[:TOP_K]


class TermMatcher:
    """Actor stage: enrich extraction rows with matched dimension terms.

    ``terms_ref``/``agreements_ref`` resolve once per actor (broadcast small
    side); a bounded per-actor memo caches query->matches (ST1 LRU analogue,
    500 entries like embedding.service.js:6)."""

    MATCH_TYPE = pa.list_(
        pa.struct(
            [("term_id", pa.int32()), ("score_x1000", pa.int32()), ("has_agreement", pa.bool_())]
        )
    )

    def __init__(self, terms_ref, agreements_ref, text_col: str = "extracted_text"):
        self.index = make_term_index(ray.get(terms_ref))
        self.agreements = frozenset(ray.get(agreements_ref))
        self.text_col = text_col
        self.cache: dict[str, list] = {}
        self.cache_cap = 500

    def _match_cached(self, query: str) -> list:
        hit = self.cache.get(query)
        if hit is not None:
            return hit
        res = match_term(query, self.index, self.agreements)
        if len(self.cache) >= self.cache_cap:
            self.cache.pop(next(iter(self.cache)))  # evict oldest-inserted
        self.cache[query] = res
        return res

    def __call__(self, batch: pa.Table) -> pa.Table:
        from medical_ocr_service_ray.functions.spans import _PROCEDURE_RE

        texts = batch[self.text_col].to_pylist()
        out = []
        for text in texts:
            # one query per distinct procedure mention in the cleaned text
            # (the reference matches per practica, not per document)
            folded = fold_accents(text or "").upper()
            queries = list(dict.fromkeys(m.group(0) for m in _PROCEDURE_RE.finditer(folded)))
            matches: list[dict] = []
            seen: set[int] = set()
            for q in queries:
                for tid, score, agr in self._match_cached(q):
                    if tid not in seen:  # dedupe across spans (D2 analogue)
                        seen.add(tid)
                        matches.append(
                            {"term_id": tid, "score_x1000": score, "has_agreement": agr}
                        )
            out.append(matches)
        return batch.append_column("matched_terms", pa.array(out, self.MATCH_TYPE))


def load_lookup_terms(seed: int = 42) -> list[dict]:
    """Deterministic lookup_terms dimension (FIXTURES.md F3): canonical
    procedures (the 19-regex fallback table) + seeded synonyms/weights."""
    import numpy as np

    from medical_ocr_service_ray.functions.spans import PROCEDURES

    rng = np.random.default_rng(seed)
    groups = ("IMAGEN", "LABORATORIO", "TERAPIA", "CIRUGIA")
    terms = []
    for i, name in enumerate(sorted(set(PROCEDURES))):
        synonyms = []
        if rng.random() < 0.6:
            synonyms.append(name.lower())
        if rng.random() < 0.4:
            synonyms.append(name[:6])
        terms.append(
            {
                "term_id": i + 1,
                "term": name,
                "synonyms": synonyms,
                "group": groups[int(rng.integers(0, len(groups)))],
                "weight": round(float(rng.random()), 3),
            }
        )
    return terms


def load_agreements(terms: list[dict], seed: int = 42) -> set[int]:
    """Deterministic 'acuerdo vigente' id set (verificarAcuerdo J4 analogue)."""
    import numpy as np

    rng = np.random.default_rng(seed + 1)
    return {t["term_id"] for t in terms if rng.random() < 0.5}
