"""Planted ground truth for the round-4 operators: q_hash_sample
(deterministic per-source hash-rank sampling), q_rep_ngram_ratio (Gopher
duplicate-trigram repetition signal), q_emb_outliers (integer-grid
centroid-distance outliers), and the integer-grid emb_kmeans redesign.
Exact SQL equality is enforced by tools/check_oracle.py; these pin the
hand-computable semantics on tiny corpora."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows):
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                  "text": pa.array([t for t, _ in rows], pa.string()),
                  "source": pa.array([s for _, s in rows], pa.string())}),
        str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_emb(tmp_path, vecs):
    pq.write_table(
        pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in vecs],
                                        pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


# --- q_hash_sample --------------------------------------------------------------


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def test_hash_sample_matches_direct_ranking(ray_session, tmp_path):
    """The sample is exactly the k smallest md5-64 doc ids per source, in
    hash order — reproducible across runs and partitionings."""
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_hash_sample

    rows = [(f"doc {i}", "s0" if i % 2 == 0 else "s1") for i in range(40)]
    sf = _write_docs(tmp_path, rows)
    out = q_hash_sample(sf, k=3)
    assert list(out.columns) == ["source", "rk", "doc_id"]
    for src, ids in (("s0", range(0, 40, 2)), ("s1", range(1, 40, 2))):
        exp = sorted(ids, key=lambda d: (_md5_64(str(d)), d))[:3]
        got = out[out["source"] == src].sort_values("rk")
        assert got["doc_id"].tolist() == exp
        assert got["rk"].tolist() == [1, 2, 3]
    again = q_hash_sample(sf, k=3)
    assert out.equals(again)


def test_hash_sample_small_source_returns_all(ray_session, tmp_path):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_hash_sample

    sf = _write_docs(tmp_path, [("a", "tiny"), ("b", "tiny")])
    out = q_hash_sample(sf, k=20)
    assert len(out) == 2 and set(out["doc_id"]) == {0, 1}


# --- q_rep_ngram_ratio ----------------------------------------------------------


def test_rep_ngram_ratio_planted(ray_session, tmp_path):
    """Hand-computed trigram counts: a looping doc scores high and is
    dropped; a diverse doc and a too-short doc keep."""
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_rep_ngram_ratio)

    rows = [
        ("a b c a b c a b c a b c", "s"),   # 10 trigrams, 3 distinct
        ("one two three four five", "s"),    # 3 trigrams, all distinct
        ("x y", "s"),                        # too short: no trigram
    ]
    df = (q_rep_ngram_ratio(_write_docs(tmp_path, rows)).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert df["n_trigrams"].tolist() == [10, 3, 0]
    assert df["n_distinct"].tolist() == [3, 3, 0]
    assert df["rep_ratio"].tolist() == [0.7, 0.0, 0.0]
    # keep iff 100*dups <= 30*total: doc0 700 > 300 -> drop
    assert df["keep"].tolist() == [0, 1, 1]


def test_rep_ngram_ratio_boundary_is_integer_decided(ray_session, tmp_path):
    """A doc sitting exactly ON the 30% threshold keeps (<=), and the
    decision never touches floats: 10 trigrams, 7 distinct -> 30%."""
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_rep_ngram_ratio)

    # 12 words -> 10 trigrams; repeat one trigram 4 times (3 dups)
    text = "p q r p q r p q r p q r"
    words = text.split()
    assert len(words) == 12
    df = q_rep_ngram_ratio(_write_docs(tmp_path, [
        ("a b c d e f g h i j k l", "s"),  # 10 trigrams, 10 distinct
    ])).to_pandas()
    assert df["keep"].tolist() == [1] and df["rep_ratio"].tolist() == [0.0]


# --- q_emb_outliers -------------------------------------------------------------


def test_emb_outliers_planted(ray_session, tmp_path):
    """A planted far-away direction ranks first; ranking is by exact
    integer distance with vec_id tie-breaks."""
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_emb_outliers)

    rng = np.random.default_rng(7)
    base = rng.normal(0, 0.05, (30, 8)) + np.array([1, 0, 0, 0, 0, 0, 0, 0])
    vecs = list(base)
    vecs[13] = -np.asarray([1, 0, 0, 0, 0, 0, 0, 0], float)  # antipode
    out = q_emb_outliers(_write_emb(tmp_path, vecs), k=5)
    assert list(out.columns) == ["rk", "vec_id", "dist2"]
    assert out.iloc[0]["vec_id"] == 13
    assert out["rk"].tolist() == [1, 2, 3, 4, 5]
    assert (out["dist2"].to_numpy()[:-1]
            >= out["dist2"].to_numpy()[1:]).all()
    assert out["dist2"].dtype == np.int64


# --- q_knn_graph ------------------------------------------------------------------


def test_knn_graph_matches_bruteforce(ray_session, tmp_path):
    """Exact k-NN edges equal a direct numpy brute-force on the same
    integer grid, across the block-pair decomposition."""
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        KM_COS_GRID, _nq_batch, q_knn_graph)

    def rha(x):
        x = np.asarray(x, np.float64)
        return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))

    rng = np.random.default_rng(11)
    vecs = rng.normal(0, 1, (23, 6))
    out = (q_knn_graph(_write_emb(tmp_path, vecs), k=2).to_pandas()
           .sort_values(["vec_id", "rk"]).reset_index(drop=True))

    nx = _nq_batch(np.array([np.asarray(v, np.float32) for v in vecs],
                            dtype=np.float64))
    n2 = (nx * nx).sum(axis=1)
    dots = (nx @ nx.T).astype(np.float64)
    den = np.sqrt(n2.astype(np.float64))[:, None] * \
        np.sqrt(n2.astype(np.float64))[None, :]
    q = rha(KM_COS_GRID * (dots / den)).astype(np.int64)
    exp = []
    n = len(vecs)
    for i in range(n):
        cand = np.array([j for j in range(n) if j != i])
        order = cand[np.lexsort((cand, -q[i, cand]))[:2]]
        for r, j in enumerate(order):
            exp.append((i, r + 1, j, float(rha(q[i, j] / KM_COS_GRID
                                               * 1e6) / 1e6)))
    import pandas as pd
    expdf = pd.DataFrame(exp, columns=["vec_id", "rk", "nbr_id", "cos"])
    assert out["vec_id"].tolist() == expdf["vec_id"].tolist()
    assert out["rk"].tolist() == expdf["rk"].tolist()
    assert out["nbr_id"].tolist() == expdf["nbr_id"].tolist()
    assert np.allclose(out["cos"], expdf["cos"], atol=0)


def test_knn_graph_self_excluded_and_sized(ray_session, tmp_path):
    from norsk_historisk_avis_ocr_ray.functions.similarity import q_knn_graph

    vecs = np.eye(5)
    out = q_knn_graph(_write_emb(tmp_path, vecs), k=3).to_pandas()
    assert len(out) == 15                      # 5 vectors x 3 neighbors
    assert (out["vec_id"] != out["nbr_id"]).all()


# --- q_cluster_sources ------------------------------------------------------------


def test_cluster_sources_planted(ray_session, tmp_path):
    """Two orthogonal planted directions, sources aligned with directions:
    each cluster is dominated by its matching source, every joined vector
    is counted exactly once."""
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_cluster_sources)

    rng = np.random.default_rng(5)
    n = 40
    vecs, rows = [], []
    for i in range(n):
        if i % 2 == 0:
            vecs.append(rng.normal(0, 0.01, 8) + np.eye(8)[0])
            rows.append((f"text {i}", "web"))
        else:
            vecs.append(rng.normal(0, 0.01, 8) + np.eye(8)[1])
            rows.append((f"text {i}", "books"))
    _write_emb(tmp_path, vecs)
    _write_docs(tmp_path, rows)
    out = q_cluster_sources(str(tmp_path), n_clusters=2)
    assert int(out["n"].sum()) == n
    for cl in out["cluster"].unique():
        part = out[out["cluster"] == cl]
        assert len(part) == 1          # pure clusters on this planting
    assert set(out["source"]) == {"web", "books"}


# --- emb_kmeans (integer-grid redesign) ------------------------------------------


def test_emb_kmeans_separates_planted_directions(ray_session, tmp_path):
    """Two orthogonal planted directions end in different clusters and
    cohesion is near 1 inside each."""
    from norsk_historisk_avis_ocr_ray.functions.similarity import emb_kmeans

    rng = np.random.default_rng(3)
    a = rng.normal(0, 0.01, (25, 8)) + np.array([1, 0, 0, 0, 0, 0, 0, 0])
    b = rng.normal(0, 0.01, (25, 8)) + np.array([0, 1, 0, 0, 0, 0, 0, 0])
    vecs = [v for pair in zip(a, b) for v in pair]  # interleave
    out = emb_kmeans(_write_emb(tmp_path, vecs), n_clusters=2)
    assert int(out["n"].sum()) == 50
    assert (out["mean_cos"] > 0.98).all()
    assert len(out) == 2
