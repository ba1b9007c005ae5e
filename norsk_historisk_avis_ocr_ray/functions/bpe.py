"""Distributed BPE vocabulary training (tokenizer learning).

Classic byte-pair-encoding training (Sennrich et al. 2016,
arXiv:1508.07909) factored the way every production tokenizer trainer
does it: the corpus-sized work is ONE distributed word-count (per-batch
Counters pre-aggregate, a single ``groupby(word)`` shuffle merges), and
the merge loop runs on the *word histogram* — which is result-sized
(vocabulary, not corpus: merge decisions depend only on word types ×
counts, never on word order). A ``max_words`` knob caps the histogram at
the top-N words by count for truly unbounded vocabularies (the dropped
tail carries negligible pair mass — the standard trade).

Deterministic: pair selection breaks ties by (count desc, left, right);
word counts are integers. Exact-oracled since round 4: the merge loop is
bounded (BPE_MERGES ranks), so the oracle unrolls it as one CTE per rank
and replays the left-to-right merge scan as a window computation (merge
at even offsets within each island of consecutive pair matches) — see
``_bpe_chain_ctes`` in ``__ray_entry__.py``. Pytest additionally pins
hand-computed merges on a planted corpus and histogram-vs-corpus
equivalence.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from . import scale

BPE_MERGES = 40
BPE_MAX_WORDS = 1_000_000
_EOW = "</w>"


def _word_histogram(sf_dir: str, max_words: int) -> pd.DataFrame:
    """Distributed word histogram: the only corpus-scale stage."""
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(
        path, columns=["text"],
        override_num_blocks=scale.read_blocks_for_path(path))

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t["text"].to_pylist():
            c.update((txt or "").lower().split())
        if not c:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        words, ns = zip(*c.items())
        return pa.table({"word": pa.array(list(words), pa.string()),
                         "n": pa.array(np.array(ns, np.int64))})

    hist = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=8192)
            .groupby("word").aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    if hist.empty:
        return pd.DataFrame({"word": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64")})
    hist["n"] = hist["n"].astype(np.int64)
    if len(hist) > max_words:
        hist = (hist.sort_values(["n", "word"], ascending=[False, True],
                                 kind="mergesort").head(max_words))
    return hist.reset_index(drop=True)


def _train_merges(hist: pd.DataFrame, n_merges: int) -> list[tuple]:
    """BPE merge loop over the word histogram (driver-side, O(vocab)):
    returns [(rank, left, right, pair_count)]. Symbols start as characters
    plus an end-of-word marker."""
    seqs = [tuple(w) + (_EOW,) for w in hist["word"]]
    counts = hist["n"].to_numpy(np.int64)
    merges: list[tuple] = []
    for rank in range(n_merges):
        pair_counts: Counter = Counter()
        for seq, n in zip(seqs, counts):
            for i in range(len(seq) - 1):
                pair_counts[(seq[i], seq[i + 1])] += int(n)
        if not pair_counts:
            break
        best = min(pair_counts.items(),
                   key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), pc = best
        if pc < 2:
            break
        merges.append((rank, left, right, pc))
        new_sym = left + right
        out_seqs = []
        for seq in seqs:
            if left not in seq:
                out_seqs.append(seq)
                continue
            out, i = [], 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == left
                        and seq[i + 1] == right):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            out_seqs.append(tuple(out))
        seqs = out_seqs
    return merges


def bpe_train(sf_dir: str, n_merges: int = BPE_MERGES,
              max_words: int = BPE_MAX_WORDS) -> pd.DataFrame:
    """Learn a BPE merge table from the corpus; returns one row per merge:
    (rank, left, right, pair_count). Result-sized output."""
    hist = _word_histogram(sf_dir, max_words)
    merges = _train_merges(hist, n_merges)
    if not merges:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                             "left": pd.Series([], dtype="object"),
                             "right": pd.Series([], dtype="object"),
                             "pair_count": pd.Series([], dtype="int64")})
    df = pd.DataFrame(merges, columns=["rank", "left", "right",
                                       "pair_count"])
    df["rank"] = df["rank"].astype(np.int64)
    df["pair_count"] = df["pair_count"].astype(np.int64)
    return df


class BpeApplyStage:
    """Actor-pool tokenizer apply: the learned merge table is broadcast
    once per actor (constructor arg), and encoding memoizes per WORD — the
    corpus word distribution is Zipfian, so the per-actor cache turns the
    per-word merge loop into a dict hit for almost every token.

    Apply semantics: merges in RANK order, each replacing all occurrences
    with the left-to-right non-overlapping scan — exactly the training
    loop's apply step (Sennrich subword-nmt style). This is what makes
    encoding DuckDB-replayable: the oracle's per-rank scan is a window
    computation (merge at even offsets within runs of consecutive
    matches), where the old lowest-rank-anywhere greedy was an inherently
    sequential per-word loop."""

    def __init__(self, merges: list[tuple]):
        self.merges = [(left, right) for _, left, right, _ in merges]
        self.cache: dict[str, tuple] = {}

    def _encode_word(self, w: str) -> tuple:
        got = self.cache.get(w)
        if got is not None:
            return got
        seq: list[str] = list(w) + [_EOW]
        for left, right in self.merges:
            out, i = [], 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == left
                        and seq[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        res = tuple(seq)
        self.cache[w] = res
        return res

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        ids, n_words, n_toks, digests = [], [], [], []
        for doc_id, txt in zip(batch["doc_id"].to_pylist(),
                               batch["text"].to_pylist()):
            words = (txt or "").lower().split()
            toks: list[str] = []
            for w in words:
                toks.extend(self._encode_word(w))
            ids.append(doc_id)
            n_words.append(len(words))
            n_toks.append(len(toks))
            digests.append(hashlib.md5(
                "\x00".join(toks).encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(np.array(ids, np.int64)),
            "n_words": pa.array(np.array(n_words, np.int64)),
            "n_bpe_tokens": pa.array(np.array(n_toks, np.int64)),
            "tok_digest": pa.array(digests, pa.string())})


class BpeFertilityStage(BpeApplyStage):
    """BpeApplyStage variant emitting per-batch (source, 3-int) partials
    instead of per-doc rows — the rollup stays distributed (no
    corpus-sized doc→source join)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        agg: dict[str, list] = {}
        for src, txt in zip(batch["source"].to_pylist(),
                            batch["text"].to_pylist()):
            words = (txt or "").lower().split()
            nb = sum(len(self._encode_word(w)) for w in words)
            a = agg.setdefault(src, [0, 0, 0])
            a[0] += 1
            a[1] += len(words)
            a[2] += nb
        srcs = sorted(agg)
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "c": pa.array(np.array([agg[s][0] for s in srcs], np.int64)),
            "nw": pa.array(np.array([agg[s][1] for s in srcs], np.int64)),
            "nb": pa.array(np.array([agg[s][2] for s in srcs], np.int64))})


def q_bpe_fertility(sf_dir: str, n_merges: int = BPE_MERGES,
                    max_words: int = BPE_MAX_WORDS) -> pd.DataFrame:
    """Fertility of the TRAINED BPE vocabulary per source: post-merge
    tokens per word — the after-training counterpart of q_fertility's
    pre-tokenizer proxy, and the number that tells you which sources the
    learned vocabulary actually serves (a source full of out-of-merge
    words fragments to characters and burns sequence budget).

    EXACT: the merge table and per-word encodings ride the proven
    bpe_train/bpe_encode chain (deterministic tie-breaks, window-replay
    oracle); per-source counts fold as int64 partials; ONE double
    division per output row.

    Ray shape: the result-sized merge table broadcasts into each actor
    as a constructor arg; one streaming actor-pool pass emits (source,
    3-int) partials → one ≤ |sources|-group groupby. Result-sized →
    DataFrame."""
    from .collect import typed_empty
    from .rounding import series_round_half_away as _rs

    merges_df = bpe_train(sf_dir, n_merges=n_merges, max_words=max_words)
    merges = [(int(r.rank), r.left, r.right, int(r.pair_count))
              for r in merges_df.itertuples(index=False)]
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(
        path, columns=["source", "text"],
        override_num_blocks=scale.read_blocks_for_path(path))
    df = (ds.map_batches(BpeFertilityStage, fn_constructor_args=(merges,),
                         batch_format="pyarrow", batch_size=4096,
                         concurrency=2, num_cpus=1)
          .groupby("source")
          .aggregate(Sum("c", alias_name="n_docs"),
                     Sum("nw", alias_name="n_words"),
                     Sum("nb", alias_name="n_bpe_tokens"))
          .to_pandas())                        # ≤ |sources| rows
    if df.empty:
        return typed_empty(source="object", n_docs="int64",
                           n_words="int64", n_bpe_tokens="int64",
                           bpe_fertility="float64")
    for c in ("n_docs", "n_words", "n_bpe_tokens"):
        df[c] = df[c].astype(np.int64)
    df["bpe_fertility"] = _rs(
        df["n_bpe_tokens"].astype(np.float64)
        / np.maximum(df["n_words"].to_numpy(np.int64), 1)
        .astype(np.float64), 6)
    return (df[["source", "n_docs", "n_words", "n_bpe_tokens",
                "bpe_fertility"]]
            .sort_values("source").reset_index(drop=True))


def bpe_encode(sf_dir: str, n_merges: int = BPE_MERGES,
               max_words: int = BPE_MAX_WORDS) -> Dataset:
    """Train-then-apply: learn the merge table (see ``bpe_train``) and
    tokenize the corpus with it — per doc the post-BPE token count and an
    md5 digest of the token sequence (content-verifying, so the pinned
    test catches any apply-order or cache bug). The merge table rides into
    each actor as a constructor arg (broadcast once per actor, never per
    batch). Per-doc output → streaming Dataset; exact-oracled (unrolled
    merge-rank CTEs) and pinned in pytest."""
    from .collect import ensure_schema

    merges_df = bpe_train(sf_dir, n_merges=n_merges, max_words=max_words)
    merges = [(int(r.rank), r.left, r.right, int(r.pair_count))
              for r in merges_df.itertuples(index=False)]
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(
        path, columns=["doc_id", "text"],
        override_num_blocks=scale.read_blocks_for_path(path))
    out = ds.map_batches(BpeApplyStage, fn_constructor_args=(merges,),
                         batch_format="pyarrow", batch_size=4096,
                         concurrency=2, num_cpus=1)
    return ensure_schema(out, pa.schema([
        ("doc_id", pa.int64()), ("n_words", pa.int64()),
        ("n_bpe_tokens", pa.int64()), ("tok_digest", pa.string())]))
