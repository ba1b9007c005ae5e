"""Round-3 operators: rolling DAU, doc chunking, distributed PCA."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_rolling_dau_planted(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import q_rolling_dau

    D = 86_400_000_000  # one day in us
    # day 0: users 1,2 · day 1: user 1 (twice) · day 8: user 3
    ev = pa.table({
        "user_id": pa.array([1, 2, 1, 1, 3], pa.int64()),
        "ts": pa.array([0, 1, D, D + 5, 8 * D], pa.timestamp("us")),
    })
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    out = q_rolling_dau(str(tmp_path))
    got = {int(r.day): (int(r.dau), int(r.dau_7d))
           for r in out.itertuples()}
    # day 0: dau 2, 7d window {1,2} = 2
    # day 1: dau 1, window days 0..1 → {1,2} = 2
    # day 8: dau 1, window days 2..8 → {3} = 1 (day 0/1 outside 7-day window)
    assert got == {0: (2, 2), 1: (1, 2), 8: (1, 1)}
    # only observed event days appear (no window-only phantom days)
    assert sorted(got) == [0, 1, 8]


def test_doc_chunks_planted(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import doc_chunks

    toks = [f"t{i}" for i in range(450)]
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([" ".join(toks), "one two", "   "]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (doc_chunks(str(tmp_path)).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    # doc 0: 450 tokens, stride 180 → ceil(450/180)=3 chunks of 200/200/90
    d0 = out[out["doc_id"] == 0]
    assert list(d0["n_tokens"]) == [200, 200, 90]
    assert d0.iloc[1]["chunk_md5"] == hashlib.md5(
        " ".join(toks[180:380]).encode()).hexdigest()
    assert d0.iloc[2]["chunk_md5"] == hashlib.md5(
        " ".join(toks[360:450]).encode()).hexdigest()
    # doc 1: single short chunk; doc 2 (whitespace-only): no chunks
    assert list(out[out["doc_id"] == 1]["n_tokens"]) == [2]
    assert (out["doc_id"] == 2).sum() == 0


def test_emb_pca_matches_numpy_and_invariants(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.similarity import emb_pca

    out = emb_pca(SF, n_components=8)
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_pylist()).astype(np.float64)
    cov = np.cov(x, rowvar=False, bias=True)
    ref = np.maximum(np.linalg.eigvalsh(cov)[::-1], 0.0)
    # the operator reports round-half-away(·, 6): allow the rounding step
    np.testing.assert_allclose(out["explained_var"].to_numpy(), ref[:8],
                               atol=5.1e-7)
    ev = out["explained_var"].to_numpy()
    assert (np.diff(ev) <= 1e-12).all()          # non-increasing spectrum
    cr = out["cum_ratio"].to_numpy()
    assert (np.diff(cr) >= -1e-12).all() and cr[-1] <= 1.0 + 1e-9


def test_emb_pca_batch_independence(ray_session):
    # moments are mergeable: tiny batches must give the identical spectrum
    from norsk_historisk_avis_ocr_ray.functions import similarity

    a = similarity.emb_pca(SF)
    orig = similarity._emb

    def small_blocks(sf_dir):
        import ray
        return orig(sf_dir).repartition(7)

    similarity._emb = small_blocks
    try:
        b = similarity.emb_pca(SF)
    finally:
        similarity._emb = orig
    pd.testing.assert_frame_equal(a, b)
