"""Training-data sampling/splitting/packing oracles: deterministic hash
split, stratified sample vs pure-pandas reference, and sequence-packing
invariants incl. partitioning invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _docs_table(n=200, seed=3):
    rng = np.random.default_rng(seed)
    texts = [" ".join("w" + str(int(x)) for x in rng.integers(0, 50, rng.integers(1, 120)))
             for _ in range(n)]
    texts[7] = " ".join(["long"] * 900)  # oversize doc -> singleton pack
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


class TestHashSplit:
    def test_matches_arithmetic_formula(self, ray_session):
        import ray.data as rd

        from medical_ocr_service_ray.stages.sampling import KNUTH, hash_split

        t = _docs_table()
        out = hash_split(rd.from_arrow(t), "doc_id", train_pct=80).to_pandas()
        expected = np.where((np.arange(200, dtype=np.uint64) * KNUTH) % (1 << 32) % 100 < 80,
                            "train", "test")
        assert (out.sort_values("doc_id").split.to_numpy() == expected).all()

    def test_assignment_is_row_local(self, ray_session):
        """Same split no matter how the input is partitioned."""
        import ray.data as rd

        from medical_ocr_service_ray.stages.sampling import hash_split

        t = _docs_table()
        a = hash_split(rd.from_arrow(t), "doc_id").to_pandas().sort_values("doc_id")
        b = (
            hash_split(rd.from_arrow(t).repartition(7), "doc_id")
            .to_pandas()
            .sort_values("doc_id")
        )
        assert (a.split.to_numpy() == b.split.to_numpy()).all()


class TestStratifiedSample:
    def test_matches_pandas_reference(self, ray_session):
        import ray.data as rd

        from medical_ocr_service_ray.stages.sampling import KNUTH, stratified_sample

        rng = np.random.default_rng(11)
        n = 1000
        t = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "event_type": pa.array([f"t{int(x)}" for x in rng.integers(0, 4, n)]),
            }
        )
        got = (
            stratified_sample(rd.from_arrow(t), "event_type", "event_id", k_per_group=20)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)[["event_id", "event_type"]]
        )
        df = t.to_pandas()
        df["h"] = (df.event_id.astype("uint64") * np.uint64(KNUTH)) % np.uint64(1 << 32)
        exp = (
            df.sort_values(["h", "event_id"])
            .groupby("event_type", sort=False)
            .head(20)
            .sort_values("event_id")
            .reset_index(drop=True)[["event_id", "event_type"]]
        )
        pd.testing.assert_frame_equal(got, exp)


class TestPackSequences:
    def _run(self, ds):
        from medical_ocr_service_ray.stages.sampling import pack_sequences

        return (
            pack_sequences(ds, max_tokens=512)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_invariants(self, ray_session):
        import ray.data as rd

        t = _docs_table()
        out = self._run(rd.from_arrow(t))
        # every doc exactly once
        assert sorted(out.doc_id) == list(range(200))
        # token counts match whitespace tokenization
        texts = t["text"].to_pylist()
        assert (out.n_tokens.to_numpy() == [len(x.split()) for x in texts]).all()
        # pack totals: sum of members, and <= 512 unless a singleton oversize doc
        g = out.groupby("pack_id")
        for pack_id, grp in g:
            assert grp.pack_tokens.nunique() == 1
            total = int(grp.n_tokens.sum())
            assert total == int(grp.pack_tokens.iloc[0])
            if total > 512:
                assert len(grp) == 1, "oversize pack must be a singleton"

    def test_partitioning_invariance(self, ray_session):
        import ray.data as rd

        t = _docs_table()
        a = self._run(rd.from_arrow(t))
        b = self._run(rd.from_arrow(t).repartition(9))
        pd.testing.assert_frame_equal(a, b)


class TestCorpusPrep:
    def test_composition_invariants(self, ray_session):
        """q39: packed train corpus = exact-deduped, quality-filtered,
        train-split documents, each packed exactly once with valid totals."""
        from medical_ocr_service_ray.functions.textstats import quality_score
        from medical_ocr_service_ray.pipelines.queries import QUERIES
        from medical_ocr_service_ray.stages.sampling import KNUTH

        sf = "/root/testdata/sf0.001"
        out = QUERIES["q39_corpus_prep"](sf).to_pandas().sort_values("doc_id")

        # pure-python reference: dedupe on text (min doc_id), quality >= 150,
        # train split — mirrors q7/q11/q35 semantics

        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
        t = t.loc[t.groupby("text").doc_id.idxmin()]  # exact dedupe, min doc_id
        t["quality"] = [quality_score(x)["quality"] for x in t.text]
        t = t[t.quality >= 150]
        h = (t.doc_id.astype("uint64") * KNUTH) % (1 << 32) % 100
        t = t[h < 80]
        assert sorted(out.doc_id) == sorted(t.doc_id)
        # packing invariants
        for _, grp in out.groupby("pack_id"):
            total = int(grp.n_tokens.sum())
            assert total == int(grp.pack_tokens.iloc[0])
            if total > 512:
                assert len(grp) == 1
