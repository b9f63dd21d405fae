"""Embedding-cosine near-dup: planted near-identical vectors must be found
(the sf testdata embeddings are near-orthogonal, so q23 returning zero pairs
there is truthful — this test proves the operator itself works)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def test_planted_neardup_vectors_found(ray_session, tmp_path, monkeypatch):
    import pyarrow.parquet as pq

    from medical_ocr_service_ray.pipelines.queries import q23_embedding_neardup

    rng = np.random.default_rng(21)
    base = rng.standard_normal((50, 32)).astype(np.float32)
    # plant: vecs 100..104 are tiny perturbations of vecs 0..4 (same label)
    planted = base[:5] + rng.standard_normal((5, 32)).astype(np.float32) * 0.01
    vecs = np.vstack([base, planted])
    ids = list(range(50)) + list(range(100, 105))
    labels = [i % 3 for i in range(50)] + [i % 3 for i in range(5)]
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    d = tmp_path / "sfX"
    d.mkdir()
    pq.write_table(table, d / "embeddings.parquet")

    # production near-dup threshold 19/20 = 0.95 (the query entry pins the
    # demonstration threshold 7/20 so the SQL oracle is non-trivial on the
    # near-orthogonal sf testdata)
    out = q23_embedding_neardup(str(d), t_num=19, t_den=20)
    pairs = set(zip(out.vec_a, out.vec_b))
    for i in range(5):
        assert (i, 100 + i) in pairs, f"missed planted near-dup ({i}, {100+i})"
    # no false positives among the random base vectors
    assert all(a >= 100 or b >= 100 for a, b in pairs)
    # integer-exact score: planted pairs are near-identical -> cos2 ~ 1e6
    assert all(s > 990_000 for (a, b), s in
               zip(zip(out.vec_a, out.vec_b), out.cos2_x1e6) if b == a + 100)
