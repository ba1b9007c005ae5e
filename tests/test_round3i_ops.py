"""Semantic invariants for the exact embedding ops (emb_label_centroid,
emb_vec_norms). Exact equality vs DuckDB is enforced by
tools/check_oracle.py."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.01"


def _emb_matrix():
    df = duckdb.sql(f"SELECT vec_id, label, embedding FROM "
                    f"'{SF}/embeddings.parquet' ORDER BY vec_id").df()
    mat = np.array(df["embedding"].tolist(), dtype=np.float64)
    return df, mat


def test_centroids_match_numpy_mean(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        emb_label_centroid)

    out = emb_label_centroid(SF)
    df, mat = _emb_matrix()
    assert len(out) == df["label"].nunique() * mat.shape[1]
    for lab in df["label"].unique()[:3]:
        mean = mat[df["label"].to_numpy() == lab].mean(axis=0)
        got = (out[out["label"] == lab].sort_values("dim")["centroid"]
               .to_numpy())
        assert np.allclose(got, mean, atol=2e-6)
    # counts per label partition the table
    assert int(out.groupby("label")["n"].first().sum()) == len(df)


def test_norms_match_numpy(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        emb_vec_norms)

    out = (emb_vec_norms(SF).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    df, mat = _emb_matrix()
    assert len(out) == len(df)
    ref = np.linalg.norm(mat, axis=1)
    assert np.allclose(out["l2_norm"].to_numpy(), ref, atol=2e-3)
    assert np.allclose(out["max_abs"].to_numpy(),
                       np.abs(mat).max(axis=1), atol=1e-3)
