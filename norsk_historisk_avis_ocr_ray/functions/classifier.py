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

EXACTLY DuckDB-oracle-replayable (the round-4 conversion from rows-only)
— every distributed fold and every state transition is integer-exact:

- features quantize to int64 micro-units (``vq = round(2²⁴·count/total)``,
  the md5-prefix bucket shared with dsir_score);
- weights/bias live on the same 2²⁴ integer grid, so the per-doc logit is
  an EXACT int64 dot divided once (``z = S/2⁴⁸ + bias/2²⁴``);
- the sigmoid/log-loss call ``math.exp`` / ``math.log`` per doc — glibc's
  scalar libm, which DuckDB's ``exp``/``ln`` matches bit-for-bit (numpy's
  SIMD ``np.exp`` does NOT — it diverges in the last ulp ~25% of the
  time, measured);
- per-doc gradient/loss contributions round half-away onto int64
  micro-units before summation, so partitioning cannot change any fold;
- the backtracking accept test compares INTEGER losses, and each accepted
  step is itself integer-rounded.

The oracle replays all ``QC_ITERS`` passes as unrolled MATERIALIZED CTEs
(state = weight table + scalar (loss, bias, lr) row per round — the
``_int_kmeans_ctes`` precedent). The per-doc scalar libm loop is
oracle-exactness-motivated, like the gram-md5 loops (CLAUDE.md contract);
everything around it is vectorized.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from . import scale
from .collect import ensure_schema
from .rounding import round_half_away

QC_DIM = 1024          # hashed feature dimension
QC_ITERS = 12          # full-batch GD passes (1 initial + 11 candidates)
QC_LR = 25.0           # learning rate (features are L1-normalized, so
                       # per-feature gradients are small; 100 diverges)
QC_QUANT = float(1 << 24)   # micro-unit grid for vals/weights/grads/loss
QC_Z_DEN = float(1 << 48)   # logit denominator: vq·wq products are 2⁴⁸×
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
    ids, list<int64> micro-unit L1 values, label). Materialized: the
    training loop re-reads it every iteration, and the int feature
    representation is the compressed form of the text (at corpus scale this
    is the standard 'build the design matrix once' trade; recomputing would
    re-tokenize per iteration)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"],
        override_num_blocks=num_blocks or scale.read_blocks())

    def feat(t: pa.Table) -> pa.Table:
        rows = _features_batch(t["text"].to_pylist(), dim)
        ids = [r[0] for r in rows]
        # micro-unit L1 weights: round(2²⁴ · count/total) — the oracle
        # replays the same double division + half-away round per feature
        vq = [round_half_away(
                  QC_QUANT * (r[1] / max(r[1].sum(), 1.0)), 0
              ).astype(np.int64) for r in rows]
        y = np.array([1.0 if v == pos_lang else 0.0
                      for v in t["lang"].to_pylist()], np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "ids": pa.array(ids, pa.list_(pa.int64())),
            "vq": pa.array(vq, pa.list_(pa.int64())),
            "y": pa.array(y, pa.float64())})

    return ds.map_batches(feat, batch_format="pyarrow",
                          batch_size=8192).materialize()


def _doc_matrix(t: pa.Table, dim: int):
    """CSR-ish views of one batch: flat ids/micro-vals + per-doc offsets."""
    ids = t["ids"].combine_chunks()
    flat_ids = ids.flatten().to_numpy(zero_copy_only=False)
    flat_vq = (t["vq"].combine_chunks().flatten()
               .to_numpy(zero_copy_only=False).astype(np.int64))
    lens = pa.compute.list_value_length(ids).to_numpy(zero_copy_only=False)
    offs = np.concatenate([[0], np.cumsum(lens)])
    y = t["y"].to_numpy(zero_copy_only=False)
    return flat_ids, flat_vq, offs.astype(np.int64), y


def _batch_forward(wq: np.ndarray, t: pa.Table, dim: int):
    """Forward pass for one batch: per-doc EXACT int64 logit numerator
    (segment-summed with ``np.add.at`` — never a float bincount), one
    double division, then the glibc scalar sigmoid per doc."""
    flat_ids, flat_vq, offs, y = _doc_matrix(t, dim)
    n = len(y)
    lens = np.diff(offs)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    prod = wq[flat_ids] * flat_vq            # exact int64 products
    s = np.zeros(n, np.int64)
    np.add.at(s, doc_of, prod)               # exact int64 segment sums
    zf = s.astype(np.float64) / QC_Z_DEN + float(wq[dim]) / QC_QUANT
    p = np.fromiter((1.0 / (1.0 + math.exp(-v)) for v in zf),
                    np.float64, n)
    return flat_ids, flat_vq, doc_of, y, p


def train_quality_classifier(sf_dir: str, pos_lang: str = QC_POS_LANG,
                             dim: int = QC_DIM, iters: int = QC_ITERS,
                             lr: float = QC_LR,
                             num_blocks: int | None = None):
    """Train the logistic quality classifier; returns ``(wq, losses,
    feats)`` — ``wq`` is the augmented int64 micro-unit weight vector
    (``wq[:dim]`` weights, ``wq[dim]`` bias), ``losses`` the
    per-accepted-step mean-loss history, and ``feats`` the materialized
    feature Dataset (reused by scoring). Bit-deterministic under any
    partitioning AND replayed exactly by the DuckDB oracle."""
    feats = _featurize(sf_dir, pos_lang, dim, num_blocks)
    wq = np.zeros(dim + 1, np.int64)          # [weights..., bias] micro
    g_q, loss_q, n = _grad_pass_aug(feats, wq, dim)
    if n == 0:
        return wq, [], feats
    losses = [loss_q / QC_QUANT / float(n)]
    # Backtracking GD: a candidate step that RAISES the integer loss is
    # rejected and the rate halves (deterministic — no corpus-dependent
    # tuning). Each accepted or rejected candidate costs one distributed
    # pass; ``iters`` bounds total passes.
    lr_cur = lr
    passes = 1
    nf = float(n)
    while passes < iters:
        gradf = g_q.astype(np.float64) / QC_QUANT / nf
        step = round_half_away(QC_QUANT * (lr_cur * gradf), 0
                               ).astype(np.int64)
        w_new = wq - step
        g2_q, l2_q, _ = _grad_pass_aug(feats, w_new, dim)
        passes += 1
        if l2_q <= loss_q:                    # INTEGER accept test
            wq, loss_q, g_q = w_new, l2_q, g2_q
            losses.append(loss_q / QC_QUANT / nf)
        else:
            lr_cur /= 2.0
    return wq, losses, feats


def _grad_pass_aug(feats: Dataset, wq: np.ndarray, dim: int) -> tuple:
    """Gradient pass over the bias-augmented micro-unit weights wq[dim+1].
    Every per-doc contribution rounds half-away onto int64 micro-units
    before any sum, so the fold is partition-order-free and the oracle
    replays it as an integer GROUP BY."""
    w_ref = ray.put(wq)

    def partial(t: pa.Table) -> pa.Table:
        wt = ray.get(w_ref)
        flat_ids, flat_vq, doc_of, y, p = _batch_forward(wt, t, dim)
        n = len(y)
        resid = p - y
        grad_q = np.zeros(dim + 1, np.int64)
        gq = round_half_away(resid[doc_of] * flat_vq.astype(np.float64), 0
                             ).astype(np.int64)
        np.add.at(grad_q, flat_ids, gq)
        grad_q[dim] = round_half_away(resid * QC_QUANT, 0
                                      ).astype(np.int64).sum()
        # glibc scalar log per doc — matches DuckDB ln bit-for-bit
        lp = np.fromiter((math.log(v) for v in p + 1e-12), np.float64, n)
        l1p = np.fromiter((math.log(v) for v in 1.0 - p + 1e-12),
                          np.float64, n)
        li = -(y * lp + (1.0 - y) * l1p)
        loss_q = int(round_half_away(li * QC_QUANT, 0
                                     ).astype(np.int64).sum())
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
    wq, losses, feats = train_quality_classifier(
        sf_dir, pos_lang=pos_lang, dim=dim, iters=iters, lr=lr,
        num_blocks=num_blocks)
    w_ref = ray.put(wq)

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
