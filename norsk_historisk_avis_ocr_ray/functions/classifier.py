"""Distributed quality-classifier training (model-based quality filtering).

The fastText-style step of a pretraining-data pipeline (GPT-3 / CCNet
lineage): train a linear classifier on weak labels ("looks like the
reference corpus" vs not) and score every document with it, so a quality
threshold can gate the training set. Here: logistic regression over hashed
unigram features, trained by FULL-BATCH distributed gradient descent with
deterministic backtracking (a candidate step that raises the loss is
rejected and the rate halves) — each iteration is one streaming
``map_batches`` pass emitting per-batch gradient partials, merged on the
driver (the d-dimensional gradient is result-sized; the corpus never
leaves the cluster).

Determinism by integer quantization: per-DOCUMENT gradient contributions
are quantized to int64 micro-units (scale 2^24) before summation, so the
batch/block partitioning cannot change the result — integer addition is
associative where float addition is not. The trained weights and every
score are therefore bit-identical under any ``override_num_blocks``,
which the pytest pins (same corpus, 1 block vs 7 blocks → equal outputs).

Not SQL-expressible (iterative optimization) → rows-only driver check;
correctness is pinned by (a) the partitioning-determinism test, (b) loss
monotonicity, and (c) planted-vocabulary separation in pytest.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from . import scale
from .collect import ensure_schema
from .rounding import round_half_away

QC_DIM = 1024          # hashed feature dimension
QC_ITERS = 12          # full-batch GD iterations
QC_LR = 25.0           # learning rate (features are L1-normalized, so
                       # per-feature gradients are small; 100 diverges)
QC_QUANT = float(1 << 24)   # per-doc gradient quantization scale
QC_POS_LANG = "en"     # weak positive label: "looks like the target lang"


def _features_batch(texts: list, dim: int = QC_DIM):
    """Per-text (ids, counts) hashed-unigram sparse features — the shared
    md5-prefix bucket convention (``mlprep._dsir_feature_batch``), counted
    with multiplicity."""
    from .mlprep import _dsir_feature_batch

    out = []
    for ids in _dsir_feature_batch(texts, dim=dim):
        uids, counts = np.unique(ids, return_counts=True)
        out.append((uids.astype(np.int64), counts.astype(np.float64)))
    return out


def _featurize(sf_dir: str, pos_lang: str, dim: int,
               num_blocks: int | None) -> Dataset:
    """One tokenization pass → compact per-doc feature rows (list<int64>
    ids, list<double> L1-normalized values, label). Materialized: the
    training loop re-reads it every iteration, and the int/float feature
    representation is the compressed form of the text (at corpus scale this
    is the standard 'build the design matrix once' trade; recomputing would
    re-tokenize per iteration)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"],
        override_num_blocks=num_blocks or scale.read_blocks())

    def feat(t: pa.Table) -> pa.Table:
        rows = _features_batch(t["text"].to_pylist(), dim)
        ids = [r[0] for r in rows]
        vals = [r[1] / max(r[1].sum(), 1.0) for r in rows]   # L1 normalize
        y = np.array([1.0 if v == pos_lang else 0.0
                      for v in t["lang"].to_pylist()], np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "ids": pa.array(ids, pa.list_(pa.int64())),
            "vals": pa.array(vals, pa.list_(pa.float64())),
            "y": pa.array(y, pa.float64())})

    return ds.map_batches(feat, batch_format="pyarrow",
                          batch_size=8192).materialize()


def _doc_matrix(t: pa.Table, dim: int):
    """CSR-ish views of one batch: flat ids/vals + per-doc offsets."""
    ids = t["ids"].combine_chunks()
    flat_ids = ids.flatten().to_numpy(zero_copy_only=False)
    flat_vals = (t["vals"].combine_chunks().flatten()
                 .to_numpy(zero_copy_only=False))
    lens = pa.compute.list_value_length(ids).to_numpy(zero_copy_only=False)
    offs = np.concatenate([[0], np.cumsum(lens)])
    y = t["y"].to_numpy(zero_copy_only=False)
    return flat_ids, flat_vals, offs.astype(np.int64), y


def train_quality_classifier(sf_dir: str, pos_lang: str = QC_POS_LANG,
                             dim: int = QC_DIM, iters: int = QC_ITERS,
                             lr: float = QC_LR,
                             num_blocks: int | None = None):
    """Train the logistic quality classifier; returns ``(w, losses,
    feats)`` — ``w`` is the augmented weight vector (``w[:dim]`` weights,
    ``w[dim]`` bias), ``losses`` the per-accepted-step loss history, and
    ``feats`` the materialized feature Dataset (reused by scoring).
    Deterministic under any partitioning (see module doc)."""
    feats = _featurize(sf_dir, pos_lang, dim, num_blocks)
    w = np.zeros(dim + 1, np.float64)          # [weights..., bias]
    g_q, loss_q, n = _grad_pass_aug(feats, w, dim)
    if n == 0:
        return w, [], feats
    loss = loss_q / QC_QUANT / float(n)
    grad = g_q.astype(np.float64) / QC_QUANT / float(n)
    losses = [loss]
    # Backtracking GD: a candidate step that RAISES the loss is rejected
    # and the rate halves (deterministic — no corpus-dependent tuning).
    # Each accepted or rejected candidate costs one distributed pass;
    # ``iters`` bounds total passes.
    lr_cur = lr
    passes = 1
    while passes < iters:
        w_new = w - lr_cur * grad
        g2_q, l2_q, _ = _grad_pass_aug(feats, w_new, dim)
        passes += 1
        loss2 = l2_q / QC_QUANT / float(n)
        if loss2 <= loss:
            w, loss = w_new, loss2
            grad = g2_q.astype(np.float64) / QC_QUANT / float(n)
            losses.append(loss)
        else:
            lr_cur /= 2.0
    return w, losses, feats


def _batch_forward(wt: np.ndarray, t: pa.Table, dim: int):
    """Vectorized forward pass for one batch: per-doc z, p and the CSR
    views. No Python loop over docs — segment sums via bincount."""
    flat_ids, flat_vals, offs, y = _doc_matrix(t, dim)
    n = len(y)
    lens = np.diff(offs)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    prod = wt[flat_ids] * flat_vals
    z = np.bincount(doc_of, weights=prod, minlength=n) + wt[dim]
    p = 1.0 / (1.0 + np.exp(-z))
    return flat_ids, flat_vals, doc_of, y, p


def _grad_pass_aug(feats: Dataset, w: np.ndarray, dim: int) -> tuple:
    """Gradient pass over the bias-augmented weight vector w[dim+1]."""
    w_ref = ray.put(w)

    def partial(t: pa.Table) -> pa.Table:
        wt = ray.get(w_ref)
        flat_ids, flat_vals, doc_of, y, p = _batch_forward(wt, t, dim)
        n = len(y)
        resid = p - y
        grad_q = np.zeros(dim + 1, np.int64)
        gq = np.rint(resid[doc_of] * flat_vals * QC_QUANT).astype(np.int64)
        np.add.at(grad_q, flat_ids, gq)
        grad_q[dim] = np.rint(resid * QC_QUANT).astype(np.int64).sum()
        eps = 1e-12
        li = -(y * np.log(p + eps) + (1.0 - y) * np.log(1.0 - p + eps))
        loss_q = int(np.rint(li * QC_QUANT).astype(np.int64).sum())
        return pa.table({"g": pa.array([grad_q.tobytes()], pa.binary()),
                         "loss_q": pa.array([loss_q], pa.int64()),
                         "n": pa.array([n], pa.int64())})

    total_g = np.zeros(dim + 1, np.int64)
    total_loss = 0
    total_n = 0
    for b in (feats.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=256)):
        for raw, lq, n in zip(b["g"].to_pylist(), b["loss_q"].to_pylist(),
                              b["n"].to_pylist()):
            total_g += np.frombuffer(raw, dtype=np.int64)
            total_loss += lq
            total_n += n
    return total_g, total_loss, total_n


def quality_classifier(sf_dir: str, pos_lang: str = QC_POS_LANG,
                       dim: int = QC_DIM, iters: int = QC_ITERS,
                       lr: float = QC_LR,
                       num_blocks: int | None = None) -> Dataset:
    """Train + score: every document gets the trained classifier's
    probability of being target-like (``prob`` rounded to 6) and the 0/1
    prediction. Per-doc output → streaming Dataset."""
    w, losses, feats = train_quality_classifier(
        sf_dir, pos_lang=pos_lang, dim=dim, iters=iters, lr=lr,
        num_blocks=num_blocks)
    w_ref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        wt = ray.get(w_ref)
        _, _, _, y, prob = _batch_forward(wt, t, dim)
        return pa.table({
            "doc_id": t["doc_id"],
            "label": pa.array(y.astype(np.int64), pa.int64()),
            "prob": pa.array(round_half_away(prob, 6), pa.float64()),
            "pred": pa.array((prob >= 0.5).astype(np.int64), pa.int64())})

    return ensure_schema(
        feats.map_batches(score, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("label", pa.int64()),
                   ("prob", pa.float64()), ("pred", pa.int64())]))
