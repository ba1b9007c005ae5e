"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: brute-force cosine top-k — the exact baseline. The query
  matrix is broadcast once (``ray.put``); each batch computes a numpy matmul
  against it and emits only its *local* top-k per query (a combiner), so the
  final per-query selection shuffles k rows per (query, batch), never the
  full score matrix.
- ``embedding_neardup``: all pairs with cosine ≥ threshold — batch × broadcast
  matrix matmul (exact; SQL-oracled).
- ``ann_ivf_topk``: the scale path — IVF-style bucketing: vectors are assigned
  to the nearest of C seeded centroids (one pass), queries probe the
  ``nprobe`` nearest buckets only. Approximate; rows-only check.

All math in float64 with stable tie-breaks (score desc, vec_id asc) so results
are deterministic and comparable against the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .rounding import round_half_away

N_QUERIES = 10
TOP_K = 5
NEARDUP_T = 0.4
IVF_CENTROIDS = 16
IVF_NPROBE = 4


def _emb(sf_dir: str) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t["vec_id"].to_numpy()
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(norms, 1e-30)


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    tbl = pa.concat_tables(_emb(sf_dir).iter_batches(batch_format="pyarrow"))
    mask = np.flatnonzero(tbl["vec_id"].to_numpy() < N_QUERIES)
    sub = tbl.take(mask)
    ids, mat = _batch_matrix(sub)
    order = np.argsort(ids)
    return ids[order], _normalize(mat[order])


def ann_topk(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-5 for queries vec_id < 10 (self excluded)."""
    qids, qmat = _load_queries(sf_dir)
    q_ref = ray.put((qids, qmat))

    def local_topk(t: pa.Table) -> pa.Table:
        qids, qmat = ray.get(q_ref)
        ids, mat = _batch_matrix(t)
        sims = _normalize(mat) @ qmat.T  # (batch, n_queries)
        out_q, out_v, out_c = [], [], []
        for j, qid in enumerate(qids):
            col = sims[:, j]
            keep = ids != qid
            cand_ids, cand = ids[keep], col[keep]
            order = np.lexsort((cand_ids, -cand))[:TOP_K]
            out_q.extend([qid] * len(order))
            out_v.extend(cand_ids[order])
            out_c.extend(cand[order])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cos": pa.array(out_c, pa.float64())})

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(TOP_K)
        return g

    out = (_emb(sf_dir)
           .map_batches(local_topk, batch_format="pyarrow", batch_size=4096)
           .groupby("query_id")
           .map_groups(final_topk, batch_format="pandas"))
    df = out.to_pandas()
    df["cos"] = round_half_away(df["cos"].to_numpy(), 6)
    return df.sort_values(["query_id", "cos", "vec_id"],
                          ascending=[True, False, True]).reset_index(drop=True)


def embedding_neardup(sf_dir: str, threshold: float = NEARDUP_T) -> pd.DataFrame:
    """Exact near-dup pairs: cosine ≥ threshold, a < b (SQL-oracled)."""
    full = pa.concat_tables(_emb(sf_dir).iter_batches(batch_format="pyarrow"))
    all_ids, all_mat = _batch_matrix(full)
    order = np.argsort(all_ids)
    ref = ray.put((all_ids[order], _normalize(all_mat[order])))

    def pairs(t: pa.Table) -> pa.Table:
        all_ids, all_norm = ray.get(ref)
        ids, mat = _batch_matrix(t)
        sims = _normalize(mat) @ all_norm.T
        rows, cols = np.nonzero(sims >= threshold)
        a, b = ids[rows], all_ids[cols]
        keep = a < b
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64()),
                         "cos": pa.array(round_half_away(sims[rows, cols][keep], 6),
                                         pa.float64())})

    df = (_emb(sf_dir)
          .map_batches(pairs, batch_format="pyarrow", batch_size=2048)
          .to_pandas())
    if df.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "cos": pd.Series([], dtype="float64")})
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF-bucketed approximate top-5: assign to seeded centroids, probe the
    nprobe nearest buckets per query. Rows-only check (approximate)."""
    tbl = pa.concat_tables(_emb(sf_dir).iter_batches(batch_format="pyarrow"))
    dim = len(tbl["embedding"][0])
    rng = np.random.default_rng(97)
    centroids = _normalize(rng.standard_normal((IVF_CENTROIDS, dim)))
    c_ref = ray.put(centroids)
    qids, qmat = _load_queries(sf_dir)
    q_probe = np.argsort(-(qmat @ centroids.T), axis=1)[:, :IVF_NPROBE]
    probe_sets = {int(q): set(map(int, p)) for q, p in zip(qids, q_probe)}
    p_ref = ray.put(probe_sets)
    q_ref = ray.put((qids, qmat))

    def local(t: pa.Table) -> pa.Table:
        centroids = ray.get(c_ref)
        probe_sets = ray.get(p_ref)
        qids, qmat = ray.get(q_ref)
        ids, mat = _batch_matrix(t)
        norm = _normalize(mat)
        assign = np.argmax(norm @ centroids.T, axis=1)
        sims = norm @ qmat.T
        out_q, out_v, out_c = [], [], []
        for j, qid in enumerate(qids):
            allowed = np.fromiter((int(a) in probe_sets[int(qid)] for a in assign),
                                  dtype=bool, count=len(assign))
            keep = allowed & (ids != qid)
            cand_ids, cand = ids[keep], sims[keep, j]
            order = np.lexsort((cand_ids, -cand))[:TOP_K]
            out_q.extend([qid] * len(order))
            out_v.extend(cand_ids[order])
            out_c.extend(cand[order])
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cos": pa.array(out_c, pa.float64())})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(TOP_K)

    df = (_emb(sf_dir)
          .map_batches(local, batch_format="pyarrow", batch_size=4096)
          .groupby("query_id")
          .map_groups(final, batch_format="pandas")
          .to_pandas())
    df["cos"] = round_half_away(df["cos"].to_numpy(), 6)
    return df.sort_values(["query_id", "cos", "vec_id"],
                          ascending=[True, False, True]).reset_index(drop=True)
