"""Planted ground truth for q_inverted_index (token-bucketed posting
lists), q_simpson_diversity (per-source lexical concentration), and
q_vec_quantize (global-grid int8 scalar quantization). Exact SQL
equality is enforced by tools/check_oracle.py; these pin the hand-
computable semantics on tiny corpora."""

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


# --- q_inverted_index ----------------------------------------------------------


def test_inverted_index_planted(ray_session, tmp_path):
    """Postings are distinct doc_ids in ascending order; a token repeated
    inside one doc appears once in that doc's posting entry."""
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_inverted_index)

    rows = [("a b a", "s"), ("b c", "s"), ("a", "s")]
    df = (q_inverted_index(_write_docs(tmp_path, rows)).to_pandas()
          .sort_values("tok").reset_index(drop=True))
    assert df["tok"].tolist() == ["a", "b", "c"]
    assert df["df"].tolist() == [2, 2, 1]
    assert df["postings"].tolist() == ["0,2", "0,1", "1"]
    assert df["df"].dtype == np.int64


def test_inverted_index_case_fold_and_empty(ray_session, tmp_path):
    """Uppercase folds into the same posting; empty/None text contributes
    no tokens (and double spaces don't create empty tokens)."""
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_inverted_index)

    rows = [("Word  word", "s"), ("", "s"), ("WORD", "s")]
    df = q_inverted_index(_write_docs(tmp_path, rows)).to_pandas()
    assert df["tok"].tolist() == ["word"]
    assert df["postings"].tolist() == ["0,2"]


# --- q_simpson_diversity -------------------------------------------------------


def test_simpson_planted(ray_session, tmp_path):
    """s1: tokens a a b -> N=3, distinct=2, num=2 -> D=2/6; s2 has one
    token -> D defined as 0.0."""
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_simpson_diversity)

    rows = [("a a", "s1"), ("b", "s1"), ("x", "s2")]
    df = q_simpson_diversity(_write_docs(tmp_path, rows))
    assert df["source"].tolist() == ["s1", "s2"]
    assert df["n_tokens"].tolist() == [3, 1]
    assert df["n_distinct"].tolist() == [2, 1]
    assert df["simpson"].tolist() == [2.0 / 6.0, 0.0]
    assert df["n_tokens"].dtype == np.int64


def test_simpson_monoculture_is_one(ray_session, tmp_path):
    """A source that repeats one token N times has D = N(N-1)/N(N-1) = 1."""
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_simpson_diversity)

    df = q_simpson_diversity(_write_docs(tmp_path, [("z z z z", "s")]))
    assert df["simpson"].tolist() == [1.0]


# --- q_vec_quantize ------------------------------------------------------------


def test_vec_quantize_planted(ray_session, tmp_path):
    """dim0 spans 0..1, dim1 spans 1..3: codes are exact integer floor
    divisions on the 1e-3 grid; min maps to 0, max to 255."""
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_vec_quantize)

    vecs = [[0.0, 1.0], [0.5, 2.0], [1.0, 3.0]]
    df = (q_vec_quantize(_write_emb(tmp_path, vecs)).to_pandas()
          .sort_values("vec_id").reset_index(drop=True))
    # codes: v0=(0,0) v1=(127,127) v2=(255,255)
    assert df["code_sum"].tolist() == [0, 254, 510]
    assert df["n_zero"].tolist() == [2, 0, 0]
    assert df["n_full"].tolist() == [0, 0, 2]
    assert df["code_sum"].dtype == np.int64


def test_vec_quantize_constant_dim_codes_zero(ray_session, tmp_path):
    """A dimension with hi == lo quantizes to code 0 everywhere (counted
    in n_zero, never in n_full)."""
    from norsk_historisk_avis_ocr_ray.functions.similarity import (
        q_vec_quantize)

    vecs = [[5.0, 0.0], [5.0, 1.0]]
    df = (q_vec_quantize(_write_emb(tmp_path, vecs)).to_pandas()
          .sort_values("vec_id").reset_index(drop=True))
    assert df["code_sum"].tolist() == [0, 255]
    assert df["n_zero"].tolist() == [2, 1]
    assert df["n_full"].tolist() == [0, 1]
