"""Text-analysis operators over a documents table: token counting, quality
scoring, language-ID, fingerprinting.

All are stateless, fully vectorized ``map_batches`` stages (Arrow compute /
numpy); language-ID holds its stopword profiles as per-actor state. These are
the per-document scoring primitives a large-scale training-data pipeline runs
before filtering/dedup.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from . import scale
from .collect import ensure_schema
from .rounding import round_half_away
from .textops import whitespace_token_counts

PUNCT_CLASS = r"[.,;:!?]"

# GPT-2-style pre-tokenizer split, restricted to RE2 syntax (no lookahead)
# so the Arrow kernel and the DuckDB oracle — both RE2 — agree exactly:
# contractions, space-prefixed letter/digit runs, punctuation runs, whitespace.
BPE_SPLIT = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def _docs(sf_dir: str, columns=("doc_id", "text")) -> Dataset:
    # cluster+size-derived block count (see scale.read_blocks_for_path)
    path = f"{sf_dir}/documents.parquet"
    return ray.data.read_parquet(
        path, columns=list(columns),
        override_num_blocks=scale.read_blocks_for_path(path))


def _stats_batch(t: pa.Table) -> pa.Table:
    text = t["text"]
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = whitespace_token_counts(text)
    n_subtokens = pc.count_substring_regex(text, BPE_SPLIT).cast(pa.int64())
    stripped = pc.replace_substring_regex(text, PUNCT_CLASS, "")
    n_punct = pc.subtract(n_chars, pc.utf8_length(stripped).cast(pa.int64()))
    nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    punct_ratio = round_half_away(
        n_punct.to_numpy(zero_copy_only=False) / np.maximum(nc, 1.0), 6)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_chars": n_chars,
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_subtokens": n_subtokens,
        "n_punct": n_punct,
        "punct_ratio": pa.array(punct_ratio, pa.float64()),
    })


def text_token_stats(sf_dir: str) -> Dataset:
    """Per-doc char/token/punctuation stats (SQL-oracled)."""
    return ensure_schema(
        _docs(sf_dir).map_batches(_stats_batch, batch_format="pyarrow",
                                  batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64()),
                   ("n_tokens", pa.int64()), ("n_subtokens", pa.int64()),
                   ("n_punct", pa.int64()), ("punct_ratio", pa.float64())]))


def quality_from_stats(n_tokens: "np.ndarray",
                       n_chars: "np.ndarray") -> "np.ndarray":
    """THE quality formula (token-count saturation + mean-word-length band,
    rounded half-away to 6 decimals). Single source of truth: three queries
    (quality_score, q_corpus_stats, mlprep's q_training_corpus/prepare) are
    each pinned to a DuckDB oracle encoding this exact expression — any
    change must touch all the oracle SQL strings too."""
    n_tokens = n_tokens.astype(np.float64)
    n_chars = n_chars.astype(np.float64)
    wlen = ((n_chars - np.maximum(n_tokens - 1, 0))
            / np.maximum(n_tokens, 1))
    return round_half_away(
        0.5 * np.minimum(n_tokens / 100.0, 1.0)
        + 0.5 * np.clip((wlen - 2.0) / 8.0, 0.0, 1.0), 6)


def quality_score(sf_dir: str) -> Dataset:
    """Heuristic quality score in [0,1]: token-count saturation + mean word
    length band — the usual cheap pre-filter for web-scale text."""

    def score(t: pa.Table) -> pa.Table:
        s = _stats_batch(t)
        q = quality_from_stats(s["n_tokens"].to_numpy(),
                               s["n_chars"].to_numpy())
        return pa.table({"doc_id": t["doc_id"],
                         "quality": pa.array(q, pa.float64())})

    return ensure_schema(
        _docs(sf_dir).map_batches(score, batch_format="pyarrow",
                                  batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("quality", pa.float64())]))


def doc_fingerprint(sf_dir: str) -> Dataset:
    """Per-doc content fingerprint: md5 of the text (the exact-dedup key;
    SQL-oracled). SimHash fingerprints live in functions.dedup."""

    def fp(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        md5s = [hashlib.md5((x or "").encode("utf-8")).hexdigest() for x in texts]
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint": pa.array(md5s, pa.string())})

    return ensure_schema(
        _docs(sf_dir).map_batches(fp, batch_format="pyarrow", batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("fingerprint", pa.string())]))


# --- winnowing fingerprint ----------------------------------------------------

WINNOW_K = 8          # k-gram length (characters)
WINNOW_W = 4          # winnowing window (hashes)


def _gram_hashes(text: str, cache: dict | None = None) -> np.ndarray:
    """md5-64 hash of every character k-gram of ``text`` at positions
    0..max(len−k, 0) — the shared first half of winnow_hashes and
    q_cdc_chunks (same substr semantics as the DuckDB replay; ``cache``
    amortizes the md5 across a batch — see winnow_hashes)."""
    from .dedup import _md5_64

    t = text or ""
    n = max(len(t) - WINNOW_K + 1, 1)
    if cache is None:
        return np.fromiter((_md5_64(t[i:i + WINNOW_K]) for i in range(n)),
                           dtype=np.uint64, count=n)
    get = cache.get

    def hv(i: int) -> int:
        g = t[i:i + WINNOW_K]
        v = get(g)
        if v is None:
            v = _md5_64(g)
            cache[g] = v
        return v

    return np.fromiter(map(hv, range(n)), dtype=np.uint64, count=n)


def winnow_hashes(text: str, cache: dict | None = None) -> np.ndarray:
    """Selected k-gram hash values of ``text`` under winnowing
    (Schleimer/Wilkerson/Aiken, SIGMOD'03): an md5-derived 64-bit hash of
    every character k-gram, then the minimum of each w-hash window —
    partial leading windows included, so the rule is uniform at every
    position (and exactly one SQL window frame:
    ``min(h) OVER (... ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``) —
    deduplicated. Guarantee: two texts sharing a substring of length
    ≥ w + k - 1 share at least one selected hash (the w consecutive
    shared grams form one full window in both texts; partial-window
    extras only ADD selections). The gram hash is ``dedup._md5_64`` —
    md5 is the one digest DuckDB shares with Python, which is what makes
    this operator exactly SQL-oracle-able (round-3; it replaced a
    Karp-Rabin uint64 dot product whose wraparound arithmetic DuckDB
    cannot replay over bytes). ``cache`` (gram → hash) amortizes the md5
    across a batch: natural-language 8-grams repeat heavily (~2% distinct
    across a 2k-doc batch at sf0.1), so a shared per-batch dict cuts the
    digest calls ~45×."""
    h = _gram_hashes(text, cache)
    n = len(h)
    if n <= WINNOW_W - 1:
        sel = np.minimum.accumulate(h)
    else:
        lead = np.minimum.accumulate(h[:WINNOW_W - 1])
        body = np.lib.stride_tricks.sliding_window_view(
            h, WINNOW_W).min(axis=1)
        sel = np.concatenate([lead, body])
    return np.unique(sel)


def winnow_fingerprint(sf_dir: str) -> Dataset:
    """Per-doc winnowed fingerprint: the count of selected k-gram hashes
    plus a stable digest over them (md5 of the comma-joined sorted decimal
    hash values — DuckDB: ``md5(string_agg(sel::VARCHAR, ',' ORDER BY
    sel))``). Exactly SQL-oracled (``__ray_entry__``): the oracle replays
    gram extraction (char-based substr on both engines), the md5-64 gram
    hash, the w-window min with partial leading frames, DISTINCT, and the
    digest."""

    def fp(t: pa.Table) -> pa.Table:
        counts, digests = [], []
        cache: dict = {}
        for x in t["text"].to_pylist():
            hs = winnow_hashes(x or "", cache)
            counts.append(len(hs))
            digests.append(hashlib.md5(
                ",".join(str(int(v)) for v in hs).encode()).hexdigest())
        return pa.table({"doc_id": t["doc_id"],
                         "n_fingerprints": pa.array(counts, pa.int64()),
                         "fp_digest": pa.array(digests, pa.string())})

    return ensure_schema(
        # batch_size=None → one batch per read block (cluster-size-derived),
        # so the per-gram Python scan parallelizes; 8192 was coalescing the
        # whole sf0.1 table into ONE task (0.98 s single-task UDF).
        _docs(sf_dir).map_batches(fp, batch_format="pyarrow",
                                  batch_size=None),
        pa.schema([("doc_id", pa.int64()), ("n_fingerprints", pa.int64()),
                   ("fp_digest", pa.string())]))


def q_encoding_health(sf_dir: str) -> pd.DataFrame:
    """Per-source encoding-health scan: non-ASCII codepoint ratio,
    U+FFFD replacement-character count (the mojibake smoking gun), and
    control-character count — the triage that catches a bad
    decode/transcode step before it poisons a training corpus (a source
    whose FFFD count is nonzero went through a wrong-charset decode).

    EXACT: counts are integer codepoint arithmetic via the SAME RE2
    class on both engines (Arrow ``replace_substring_regex`` == DuckDB
    ``regexp_replace g``); per-source sums fold as int64 partials; one
    double division per output row.

    Ray shape: one vectorized Arrow pass → per-batch (source, 4-int)
    partials → ≤ |sources|-group groupby. Result-sized → DataFrame."""
    from ray.data.aggregate import Sum

    from .collect import typed_empty
    from .rounding import series_round_half_away as _rs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        nc = pc.utf8_length(text).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ascii_only = pc.utf8_length(pc.replace_substring_regex(
            text, r"[^\x00-\x7F]", "")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n_fffd = pc.count_substring(text, "�").cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        no_ctrl = pc.utf8_length(pc.replace_substring_regex(
            text, r"[\x00-\x08\x0B\x0C\x0E-\x1F]", "")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"source": t["source"].to_numpy(
                               zero_copy_only=False),
                           "c": np.ones(len(nc), np.int64),
                           "nc": nc.astype(np.int64),
                           "na": (nc - ascii_only).astype(np.int64),
                           "nf": n_fffd.astype(np.int64),
                           "nk": (nc - no_ctrl).astype(np.int64)})
             .groupby("source", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
          .groupby("source")
          .aggregate(Sum("c", alias_name="n_docs"),
                     Sum("nc", alias_name="n_chars"),
                     Sum("na", alias_name="n_non_ascii"),
                     Sum("nf", alias_name="n_replacement"),
                     Sum("nk", alias_name="n_control"))
          .to_pandas())                         # ≤ |sources| rows
    if df.empty:
        return typed_empty(source="object", n_docs="int64",
                           n_chars="int64", n_non_ascii="int64",
                           n_replacement="int64", n_control="int64",
                           non_ascii_ratio="float64")
    for c in ("n_docs", "n_chars", "n_non_ascii", "n_replacement",
              "n_control"):
        df[c] = df[c].astype(np.int64)
    df["non_ascii_ratio"] = _rs(
        df["n_non_ascii"].astype(np.float64)
        / np.maximum(df["n_chars"].to_numpy(np.int64), 1)
        .astype(np.float64), 6)
    return (df[["source", "n_docs", "n_chars", "n_non_ascii",
                "n_replacement", "n_control", "non_ascii_ratio"]]
            .sort_values("source").reset_index(drop=True))


CDC_MASK = 64      # boundary where gram_hash % 64 == 0 (~64-gram chunks)


def q_cdc_chunks(sf_dir: str) -> Dataset:
    """Content-defined chunking (Rabin-style CDC, the storage-dedup /
    incremental-sync primitive — LBFS, Muthitacharoen et al. 2001): a
    chunk boundary wherever the character-8-gram hash satisfies
    ``h % 64 == 0``, so boundaries survive insertions/deletions (unlike
    fixed-size chunking) and shared content between near-identical
    documents chunks identically. Per doc: gram count, chunk count, max
    chunk length — the stats that size a CDC dedup store.

    EXACT: the gram hash is the winnowing chain's md5-64
    (``_gram_hashes`` — md5 is the digest DuckDB shares with Python);
    the boundary test and chunk lengths are pure integers. One streaming
    pass, zero shuffles; per-doc output → streaming Dataset."""

    def chunks(t: pa.Table) -> pa.Table:
        n_grams, n_chunks, max_chunk = [], [], []
        cache: dict = {}
        for x in t["text"].to_pylist():
            h = _gram_hashes(x or "", cache)
            n = len(h)
            pos = np.nonzero(h % np.uint64(CDC_MASK)
                             == np.uint64(0))[0] + 1   # 1-based
            lens = np.diff(np.concatenate(
                [[0], pos, [n]]).astype(np.int64))
            n_grams.append(n)
            n_chunks.append(len(pos) + 1)
            max_chunk.append(int(lens.max()))
        return pa.table({"doc_id": t["doc_id"],
                         "n_grams": pa.array(n_grams, pa.int64()),
                         "n_chunks": pa.array(n_chunks, pa.int64()),
                         "max_chunk": pa.array(max_chunk, pa.int64())})

    return ensure_schema(
        # batch_size=None: one batch per read block — the per-gram Python
        # scan parallelizes (the winnow_fingerprint lesson)
        _docs(sf_dir).map_batches(chunks, batch_format="pyarrow",
                                  batch_size=None),
        pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()),
                   ("n_chunks", pa.int64()), ("max_chunk", pa.int64())]))


# --- language identification (stateful stopword profiles) --------------------

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "für"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pas", "avec", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "no", "con", "para"},
    "nb": {"og", "i", "det", "som", "en", "av", "på", "til", "er", "for", "ikke"},
}


class LangIdStage:
    """Actor-pool stage: stopword-profile language scoring. The profiles are
    compiled once per actor into a single ``word -> language bitmask`` dict,
    so scoring is one vectorized token pass for ALL languages (explode +
    dict-map + per-bit bincount) instead of a per-token Python loop per
    language."""

    def __init__(self):
        self.langs = sorted(STOPWORDS)
        self.word2mask: dict[str, int] = {}
        for li, lang in enumerate(self.langs):
            for w in STOPWORDS[lang]:
                self.word2mask[w] = self.word2mask.get(w, 0) | (1 << li)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ndocs = len(batch)
        toks = (batch["text"].fillna("").str.lower().str.split()
                .reset_index(drop=True))
        ntok = np.maximum(toks.str.len().to_numpy(dtype=np.int64), 1)
        ex = toks.explode()
        masks = ex.map(self.word2mask).fillna(0).to_numpy(dtype=np.int64)
        idx = ex.index.to_numpy(dtype=np.int64)
        scores = np.zeros((len(self.langs), ndocs))
        for li in range(len(self.langs)):
            hits = np.bincount(idx, weights=(masks >> li) & 1, minlength=ndocs)
            scores[li] = hits / ntok
        best_idx = np.argmax(scores, axis=0)  # first max == sorted-lang order
        best = scores[best_idx, np.arange(ndocs)]
        preds = np.where(best > 0.05,
                         np.array(self.langs, dtype=object)[best_idx], "und")
        # half-away rounding: the score is hits/ntok (exact int ratio in
        # float64 on both engines), so the SQL oracle matches bit-for-bit
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                             "lang_pred": preds,
                             "lang_score": round_half_away(best, 6)})


def lang_id(sf_dir: str) -> Dataset:
    # Task form, not an actor pool: the stage's only state is a 55-entry
    # stopword bitmask dict (microseconds per task to rebuild/ship), so the
    # elastic task pool wins — same reasoning as MinHasher in dedup.py.
    return ensure_schema(
        _docs(sf_dir).map_batches(LangIdStage(), batch_format="pandas",
                                  batch_size=1024),
        pa.schema([("doc_id", pa.int64()), ("lang_pred", pa.string()),
                   ("lang_score", pa.float64())]))


def q_fertility(sf_dir: str) -> pd.DataFrame:
    """Tokenizer fertility by declared language: subword tokens per
    whitespace word (the GPT-2 pre-tokenizer regex as the subword proxy)
    and chars per subword — the multilingual vocabulary-budget
    diagnostic: a language whose fertility sits far above the corpus
    mean is under-served by the tokenizer and burns sequence length
    (the SentencePiece / XLM-R fertility analysis).

    EXACT: per-doc char/word/subtoken counts are the proven
    ``text_token_stats`` integer kernels (Arrow count_substring_regex ==
    DuckDB regexp_extract_all on the same pattern); per-lang sums fold
    as int64 partials through one ≤ |langs|-group groupby; the two
    double divisions happen ONCE per output row on identical integers.

    Ray shape: one streaming pass, per-batch (lang, 4-int) partials →
    tiny groupby. Result-sized output → DataFrame."""
    from ray.data.aggregate import Sum

    from .collect import typed_empty
    from .rounding import series_round_half_away as _rs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        text = t["text"]
        nc = pc.utf8_length(text).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        nw = whitespace_token_counts(text)
        ns = pc.count_substring_regex(text, BPE_SPLIT).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"lang": t["lang"].to_numpy(
                               zero_copy_only=False),
                           "c": np.ones(len(nc), np.int64),
                           "nc": nc.astype(np.int64),
                           "nw": np.asarray(nw, np.int64),
                           "ns": ns.astype(np.int64)})
             .groupby("lang", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
          .groupby("lang")
          .aggregate(Sum("c", alias_name="n_docs"),
                     Sum("nw", alias_name="n_words"),
                     Sum("ns", alias_name="n_subtokens"),
                     Sum("nc", alias_name="n_chars"))
          .to_pandas())                          # ≤ |langs| rows
    if df.empty:
        return typed_empty(lang="object", n_docs="int64", n_words="int64",
                           n_subtokens="int64", n_chars="int64",
                           fertility="float64",
                           chars_per_subtoken="float64")
    for c in ("n_docs", "n_words", "n_subtokens", "n_chars"):
        df[c] = df[c].astype(np.int64)
    # int64 → float64 then ONE division each: same order as DuckDB
    df["fertility"] = _rs(
        df["n_subtokens"].astype(np.float64)
        / np.maximum(df["n_words"].to_numpy(np.int64), 1)
        .astype(np.float64), 6)
    df["chars_per_subtoken"] = _rs(
        df["n_chars"].astype(np.float64)
        / np.maximum(df["n_subtokens"].to_numpy(np.int64), 1)
        .astype(np.float64), 6)
    return (df[["lang", "n_docs", "n_words", "n_subtokens", "n_chars",
                "fertility", "chars_per_subtoken"]]
            .sort_values("lang").reset_index(drop=True))


def q_lang_confusion(sf_dir: str) -> pd.DataFrame:
    """Language-ID confusion matrix: declared ``lang`` column × predicted
    language, with doc counts and the mean detector score per cell — the
    eval that decides whether the cheap stopword detector is trustworthy
    enough to route documents in a multilingual pipeline, and which
    declared-language slices it mangles.

    EXACT: predictions ride the proven ``lang_id`` chain (integer
    hits/ntok ratios, first-max tie-break over sorted languages, 0.05
    threshold, 1e-6 half-away grid); per-cell score sums fold as int64
    1e-6-grid integers with ONE double division per output row (the
    q_ccnet_buckets device).

    Ray shape: one streaming pass — per-batch LangIdStage scoring +
    (lang, lang_pred) partials → one ≤ |langs|²-group groupby. Result-
    sized output → DataFrame."""
    from ray.data.aggregate import Sum

    from .collect import typed_empty
    from .rounding import series_round_half_away as _rs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
    stage = LangIdStage()      # tiny state: ships with the task closure

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pred = stage(b)
        pu = round_half_away(
            pred["lang_score"].to_numpy() * 1e6, 0).astype(np.int64)
        return (pd.DataFrame({"lang": b["lang"].to_numpy(),
                              "lang_pred": pred["lang_pred"].to_numpy(),
                              "c": np.ones(len(b), np.int64), "sp": pu})
                .groupby(["lang", "lang_pred"], as_index=False).sum())

    df = (ds.map_batches(partial, batch_format="pandas", batch_size=1024)
          .groupby(["lang", "lang_pred"])
          .aggregate(Sum("c", alias_name="n_docs"),
                     Sum("sp", alias_name="sp"))
          .to_pandas())                         # ≤ |langs|² rows
    if df.empty:
        return typed_empty(lang="object", lang_pred="object",
                           n_docs="int64", mean_score="float64")
    df["n_docs"] = df["n_docs"].astype(np.int64)
    # sum(pu)/1e6 then /count: same integers, same division order as the
    # DuckDB oracle — bit-identical
    df["mean_score"] = _rs((df["sp"].astype(np.float64) / 1e6)
                           / df["n_docs"].astype(np.float64), 6)
    return (df[["lang", "lang_pred", "n_docs", "mean_score"]]
            .sort_values(["lang", "lang_pred"]).reset_index(drop=True))


# --- Gopher-style quality-rule filter ------------------------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
# Norwegian + English stop list (the Gopher "contains common words" rule,
# localized); single source of truth — the oracle VALUES are generated from
# this set (__ray_entry__._gopher_stop_values).
GOPHER_STOPS = frozenset(STOPWORDS["nb"] | STOPWORDS["en"])
_GOPHER_ALPHA_RE = "[A-Za-zæøåÆØÅ]"   # "word contains a letter" class —
#   spelled out explicitly (not \p{L} / str.isalpha) so the Arrow kernel and
#   the DuckDB RE2 oracle test the IDENTICAL predicate.
_GOPHER_BULLETS = ("•", "-", "*")


def _seg_sums(vals: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-segment sums of a flat value array under segment lengths
    ``counts`` — cumsum-difference form (``np.add.reduceat`` misbehaves on
    zero-length segments)."""
    csum = np.concatenate(([0], np.cumsum(vals, dtype=np.int64)))
    ends = np.cumsum(counts)
    starts = ends - counts
    return csum[ends] - csum[starts]


def _gopher_batch(t: pa.Table) -> pa.Table:
    text = pc.fill_null(t["text"], "")
    ndocs = len(text)

    words = pc.utf8_split_whitespace(text)
    # Arrow's split emits EMPTY fields for leading/trailing/repeated
    # whitespace (Python's str.split() does not) — segment on the raw list
    # lengths but count only nonempty tokens as words.
    nw_raw = pc.list_value_length(words).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    flat = pc.list_flatten(words)
    wlen = pc.utf8_length(flat).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    nw = _seg_sums((wlen > 0).astype(np.int64), nw_raw)
    sum_len = _seg_sums(wlen, nw_raw)
    alpha = pc.match_substring_regex(flat, _GOPHER_ALPHA_RE).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_alpha = _seg_sums(alpha, nw_raw)

    # distinct stopwords per doc: factorize lowered tokens against the stop
    # list, then unique (doc, stop_idx) pairs
    stop_idx = pc.index_in(pc.utf8_lower(flat),
                           value_set=pa.array(sorted(GOPHER_STOPS)))
    si = stop_idx.to_numpy(zero_copy_only=False)
    mask = ~np.isnan(si) if si.dtype.kind == "f" else si >= 0
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), nw_raw)
    keys = np.unique(doc_idx[mask] * 64 + si[mask].astype(np.int64))
    n_stop = np.bincount(keys // 64, minlength=ndocs).astype(np.int64)

    lines = pc.split_pattern(text, "\n")
    nl = pc.list_value_length(lines).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    flatl = pc.list_flatten(lines)
    bullet = np.zeros(len(flatl), np.int64)
    for b in _GOPHER_BULLETS:
        bullet |= pc.starts_with(flatl, b).to_numpy(
            zero_copy_only=False).astype(np.int64)
    n_bullet = _seg_sums(bullet, nl)
    ellip = (pc.ends_with(flatl, "...").to_numpy(zero_copy_only=False)
             | pc.ends_with(flatl, "…").to_numpy(zero_copy_only=False))
    n_ellip = _seg_sums(ellip.astype(np.int64), nl)

    n_sym = (pc.count_substring(text, "#").cast(pa.int64()).to_numpy(
                 zero_copy_only=False)
             + pc.count_substring(text, "...").cast(pa.int64()).to_numpy(
                 zero_copy_only=False)
             + pc.count_substring(text, "…").cast(pa.int64()).to_numpy(
                 zero_copy_only=False))

    nw_f = np.maximum(nw, 1).astype(np.float64)
    nl_f = np.maximum(nl, 1).astype(np.float64)
    # the keep decision is ALL-INTEGER comparisons (ratio thresholds cleared
    # of floats: mean in [3,10] <=> 3n <= sum <= 10n, etc.) so the oracle
    # can never diverge on a rounding edge
    keep = ((nw >= GOPHER_MIN_WORDS) & (nw <= GOPHER_MAX_WORDS)
            & (3 * nw <= sum_len) & (sum_len <= 10 * nw)
            & (10 * n_sym < nw)
            & (10 * n_bullet <= 9 * nl)
            & (10 * n_ellip <= 3 * nl)
            & (5 * n_alpha >= 4 * nw)
            & (n_stop >= 2)).astype(np.int64)

    return pa.table({
        "doc_id": t["doc_id"],
        "n_words": pa.array(nw, pa.int64()),
        "n_lines": pa.array(nl, pa.int64()),
        "mean_word_len": pa.array(
            round_half_away(np.where(nw > 0, sum_len / nw_f, 0.0), 6)),
        "symbol_ratio": pa.array(
            round_half_away(np.where(nw > 0, n_sym / nw_f, 0.0), 6)),
        "bullet_frac": pa.array(round_half_away(n_bullet / nl_f, 6)),
        "ellipsis_frac": pa.array(round_half_away(n_ellip / nl_f, 6)),
        "alpha_frac": pa.array(
            round_half_away(np.where(nw > 0, n_alpha / nw_f, 0.0), 6)),
        "n_stop": pa.array(n_stop, pa.int64()),
        "keep": pa.array(keep, pa.int64()),
    })


def q_gopher_filter(sf_dir: str) -> Dataset:
    """Gopher-style quality-rule document filter (Rae et al. 2021 §A1.1,
    localized): per doc the rule signals — word count, mean word length,
    symbol-to-word ratio ('#'/'...'/'…'), bullet-start and ellipsis-end line
    fractions, letter-word fraction, distinct-stopword count — plus the
    all-rules ``keep`` decision as integer predicates (no float thresholds
    anywhere in the decision, so it is partitioning- and oracle-exact).

    One vectorized Arrow pass per batch, zero shuffles — the canonical
    pre-dedup quality gate of a web-scale training-data pipeline."""
    return ensure_schema(
        _docs(sf_dir).map_batches(_gopher_batch, batch_format="pyarrow",
                                  batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("n_words", pa.int64()),
                   ("n_lines", pa.int64()), ("mean_word_len", pa.float64()),
                   ("symbol_ratio", pa.float64()),
                   ("bullet_frac", pa.float64()),
                   ("ellipsis_frac", pa.float64()),
                   ("alpha_frac", pa.float64()), ("n_stop", pa.int64()),
                   ("keep", pa.int64())]))


# --- Gopher-style repetition statistics ---------------------------------------

def q_repetition_stats(sf_dir: str) -> Dataset:
    """Per-document repetition statistics — the Gopher-rules quality signals
    (Rae et al. 2021: "most-common-word fraction", "duplicate n-gram
    fraction"): word count, fraction of words taken by the single most
    frequent word, and fraction of bigrams taken by the most frequent bigram.

    Fully vectorized per batch and shuffle-free: Arrow regex split →
    ``dictionary_encode`` (batch vocabulary) → composed integer keys →
    ``np.unique`` counts → per-doc max via ``np.maximum.at`` over the
    (already-unique) group keys. No Python loop touches a word."""

    def rep(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        ndocs = len(lists)
        n_words = pc.list_value_length(lists).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        enc = lists.flatten().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), n_words)
        vocab = max(len(enc.dictionary), 1)

        # top word count per doc: unique (doc, code) pairs with counts
        uw, cw = np.unique(doc_idx * vocab + codes, return_counts=True)
        top_w = np.zeros(ndocs, np.int64)
        np.maximum.at(top_w, uw // vocab, cw)

        # bigrams: adjacent codes within the same doc, re-encoded compactly
        same = doc_idx[:-1] == doc_idx[1:] if len(codes) else np.array([], bool)
        bg = (codes[:-1] * vocab + codes[1:])[same]
        bdoc = doc_idx[:-1][same]
        bcodes = pd.factorize(bg)[0]
        nbg = max(len(bg), 1)
        ub, cb = np.unique(bdoc * nbg + bcodes, return_counts=True)
        top_b = np.zeros(ndocs, np.int64)
        np.maximum.at(top_b, ub // nbg, cb)

        n_bigrams = np.maximum(n_words - 1, 0)
        twf = round_half_away(top_w / np.maximum(n_words, 1), 6)
        tbf = round_half_away(
            np.where(n_bigrams > 0, top_b / np.maximum(n_bigrams, 1), 0.0), 6)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "top_word_frac": pa.array(twf, pa.float64()),
            "top_bigram_frac": pa.array(tbf, pa.float64()),
        })

    return ensure_schema(
        _docs(sf_dir).map_batches(rep, batch_format="pyarrow",
                                  batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("n_words", pa.int64()),
                   ("top_word_frac", pa.float64()),
                   ("top_bigram_frac", pa.float64())]))


def q_corpus_stats(sf_dir: str) -> pd.DataFrame:
    """Per-language corpus composition report — the artifact every
    data-prep run publishes: doc count, token volume, average quality.

    ONE fused streaming pass computes tokens + quality per doc and
    pre-aggregates per (batch, lang); the only shuffle is the final tiny
    ``groupby(lang)``. Exact DuckDB oracle (same token/quality formulas as
    text_token_stats / quality_score)."""
    from ray.data.aggregate import Sum

    # doc_id is unused by the aggregate but _stats_batch's schema needs it
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        s = _stats_batch(t)
        n_tokens = s["n_tokens"].to_numpy().astype(np.float64)
        q = quality_from_stats(s["n_tokens"].to_numpy(),
                               s["n_chars"].to_numpy())
        g = (pd.DataFrame({"lang": t["lang"].to_numpy(zero_copy_only=False),
                           "tok": n_tokens.astype(np.int64), "q": q})
             .groupby("lang", as_index=False)
             .agg(n_docs=("q", "size"), sum_tokens=("tok", "sum"),
                  sum_q=("q", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
          .groupby("lang")
          .aggregate(Sum("n_docs", alias_name="n_docs"),
                     Sum("sum_tokens", alias_name="sum_tokens"),
                     Sum("sum_q", alias_name="sum_q"))
          .to_pandas())  # one row per language — result-sized
    if df.empty:
        return pd.DataFrame({"lang": pd.Series([], dtype="object"),
                             "n_docs": pd.Series([], dtype="int64"),
                             "sum_tokens": pd.Series([], dtype="int64"),
                             "avg_quality": pd.Series([], dtype="float64")})
    df["avg_quality"] = round_half_away(
        (df["sum_q"] / df["n_docs"]).to_numpy(), 6)
    df["n_docs"] = df["n_docs"].astype(np.int64)
    df["sum_tokens"] = df["sum_tokens"].astype(np.int64)
    return (df[["lang", "n_docs", "sum_tokens", "avg_quality"]]
            .sort_values("lang").reset_index(drop=True))


# --- per-document character entropy (micro-quantized exact) --------------------

ENTROPY_SCALE = 1e12


def q_char_entropy(sf_dir: str) -> Dataset:
    """Per-document Shannon entropy of the character distribution — the
    gibberish/low-diversity quality signal (binary blobs and repeated-char
    spam score near 0; natural text sits ~4-4.7 bits ≈ 2.8-3.3 nats).

    Exactness (same mechanics as dsir_score/q_bigram_ppl): H = ln(n) −
    (Σ cᵢ·ln cᵢ)/n is NOT order-stable in float, so each term quantizes to
    ``floor(c·ln(c)·1e12)`` — glibc-libm ``ln`` and IEEE multiply/floor are
    bit-identical in DuckDB and CPython ``math.log`` — and the per-doc sum
    folds as exact integers; only the final two-op float expression runs in
    double, in the same operation order on both engines. Everything is
    row-local (zero shuffles, corpus-sized streaming output); the
    ``c → floor(c·ln c·1e12)`` table is cached per batch since char counts
    repeat heavily."""
    import math

    def per_batch(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        ent = np.zeros(len(texts), np.float64)
        nlog: dict[int, int] = {}
        for i, tx in enumerate(texts):
            if not tx:
                continue
            codes = np.frombuffer(tx.encode("utf-32-le"), np.uint32)
            cnts = np.unique(codes, return_counts=True)[1]
            s = 0
            for c in cnts.tolist():
                q = nlog.get(c)
                if q is None:
                    q = math.floor(c * math.log(c) * ENTROPY_SCALE)
                    nlog[c] = q
                s += q
            n = len(codes)
            ent[i] = round_half_away(
                math.log(n) - (s / ENTROPY_SCALE) / n, 6)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pc.utf8_length(t["text"]).cast(pa.int64()),
            "char_entropy": pa.array(ent, pa.float64())})

    return ensure_schema(
        _docs(sf_dir).map_batches(per_batch, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64()),
                   ("char_entropy", pa.float64())]))


# --- Heaps'-law vocabulary growth curve ---------------------------------------

HEAPS_PCTS = (10, 25, 50, 75, 100)


def q_heaps_curve(sf_dir: str) -> pd.DataFrame:
    """Vocabulary-growth checkpoints (the empirical Heaps'-law curve): at
    each doc-id-prefix checkpoint ``T = (max_id + 1) * pct // 100``, how
    many documents precede T and how many DISTINCT tokens first occur
    before T. The distributed kernel is the FIRST-OCCURRENCE aggregation:
    per-batch distinct (doc, token-hash) pairs → one ``groupby(tok)`` Min
    over int64 rows (token md5-64, the established vocabulary-collision
    acceptance) → a 5-int histogram partial per block, summed. Nothing
    corpus-sized ever reaches the driver; the shuffle carries
    (token-hash, doc_id) ints only. Tokenization is the ``q_vocab_topk``
    convention (lowercased single-space split, empties dropped)."""
    from ray.data.aggregate import Max, Min, Sum

    from .dedup import _md5_64

    ds = _docs(sf_dir)

    bounds = ds.aggregate(Max("doc_id"))
    max_id = bounds["max(doc_id)"]
    if max_id is None:    # empty corpus: no curve (oracle: WHERE n NOT NULL)
        return pd.DataFrame({
            "pct": pd.Series([], dtype="int64"),
            "n_docs": pd.Series([], dtype="int64"),
            "vocab_size": pd.Series([], dtype="int64")})
    n = int(max_id) + 1
    cuts = np.array([n * p // 100 for p in HEAPS_PCTS], np.int64)

    def doc_tok_rows(t: pa.Table) -> pa.Table:
        s = pd.Series(t["text"].to_pylist(),
                      index=t["doc_id"].to_pylist()).fillna("")
        ex = s.str.lower().str.split(" ").explode()
        ex = ex[ex != ""]
        pairs = (ex.rename("tok").rename_axis("doc_id").reset_index()
                 .drop_duplicates())
        th = np.fromiter((_md5_64(x) for x in pairs["tok"]), np.uint64,
                         len(pairs)).view(np.int64)
        return pa.table({"tok": pa.array(th, pa.int64()),
                         "doc_id": pa.array(
                             pairs["doc_id"].to_numpy(np.int64))})

    first = (ds.map_batches(doc_tok_rows, batch_format="pyarrow",
                            batch_size=4096)
             .groupby("tok").aggregate(Min("doc_id",
                                           alias_name="first_doc")))

    def hist_partial(t: pa.Table) -> pa.Table:
        fd = t["first_doc"].to_numpy(zero_copy_only=False)
        v = np.array([(fd < c).sum() for c in cuts], np.int64)
        return pa.table({"pct": pa.array(list(HEAPS_PCTS), pa.int64()),
                         "v": pa.array(v, pa.int64())})

    vs = (first.map_batches(hist_partial, batch_format="pyarrow",
                            batch_size=None)
          .groupby("pct").aggregate(Sum("v", alias_name="vocab_size"))
          .to_pandas().set_index("pct")["vocab_size"])

    def docs_partial(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        v = np.array([(d < c).sum() for c in cuts], np.int64)
        return pa.table({"pct": pa.array(list(HEAPS_PCTS), pa.int64()),
                         "v": pa.array(v, pa.int64())})

    nd = (ds.map_batches(docs_partial, batch_format="pyarrow",
                         batch_size=None)
          .groupby("pct").aggregate(Sum("v", alias_name="n_docs"))
          .to_pandas().set_index("pct")["n_docs"])

    return pd.DataFrame({
        "pct": pd.Series(HEAPS_PCTS, dtype="int64"),
        "n_docs": pd.Series([int(nd.get(p, 0)) for p in HEAPS_PCTS],
                            dtype="int64"),
        "vocab_size": pd.Series([int(vs.get(p, 0)) for p in HEAPS_PCTS],
                                dtype="int64")})


# --- n-gram novelty vs earlier corpus -----------------------------------------

NOVELTY_N = 5      # word n-gram order


def q_ngram_novelty(sf_dir: str) -> Dataset:
    """Per-doc novelty: the fraction of a document's distinct word
    5-grams that FIRST occur in that document (min doc_id over the whole
    corpus) — the intra-corpus freshness score that separates original
    writing from remixes of earlier documents. Gram-less docs (< 5
    tokens) score 1.0 (vacuously novel).

    One pass over the corpus emits distinct (gram-md5-64, doc_id) int
    rows; a gram-bucketed combine resolves each gram's first occurrence
    AND the per-doc gram totals in the SAME bucket (both are functions of
    the bucket's rows), emitting two int partials per (bucket, doc); a
    doc-bucketed combine sums partials and takes the one division. Only
    int rows shuffle; nothing corpus-sized reaches the driver. Tokens are
    the ``q_vocab_topk`` convention (lowercased single-space split,
    empties dropped); the gram hash is ``dedup._md5_64`` under the
    established vocabulary-collision acceptance."""
    from .combine import bucketed_combine
    from .dedup import _md5_64

    ds = _docs(sf_dir)

    def gram_rows(t: pa.Table) -> pa.Table:
        docs: list[int] = []
        ghs: list[int] = []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = [w for w in (x or "").lower().split(" ") if w]
            gs = {" ".join(toks[i:i + NOVELTY_N])
                  for i in range(len(toks) - NOVELTY_N + 1)}
            docs.extend([d] * len(gs))
            ghs.extend(_md5_64(g) for g in gs)
        gh = (np.fromiter(ghs, np.uint64, len(ghs)).view(np.int64)
              if ghs else np.empty(0, np.int64))
        return pa.table({"gh": pa.array(gh, pa.int64()),
                         "doc_id": pa.array(np.asarray(docs, np.int64),
                                            pa.int64())})

    def per_gram_bucket(g: pd.DataFrame) -> pd.DataFrame:
        fd = g.groupby("gh")["doc_id"].transform("min")
        nv = (g.loc[g["doc_id"].to_numpy() == fd.to_numpy()]
              .groupby("doc_id").size())
        ng = g.groupby("doc_id").size()
        return pd.DataFrame({
            "doc_id": ng.index.to_numpy(np.int64),
            "ng": ng.to_numpy(np.int64),
            "nv": nv.reindex(ng.index).fillna(0).to_numpy(np.int64)})

    partials = bucketed_combine(
        ds.map_batches(gram_rows, batch_format="pyarrow", batch_size=4096),
        "gh", per_gram_bucket)

    def doc_scaffold(t: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "ng": z, "nv": z})

    scaffold = _docs(sf_dir, columns=("doc_id",)).map_batches(
        doc_scaffold, batch_format="pyarrow")

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby("doc_id", as_index=False)
             .agg(n_grams=("ng", "sum"), n_novel=("nv", "sum")))
        ngr = s["n_grams"].to_numpy(np.int64)
        nov = np.where(
            ngr == 0, 1.0,
            round_half_away(s["n_novel"].to_numpy(np.float64)
                            / np.maximum(ngr, 1), 6))
        return pd.DataFrame({
            "doc_id": s["doc_id"].to_numpy(np.int64),
            "n_grams": ngr,
            "n_novel": s["n_novel"].to_numpy(np.int64),
            "novelty": nov})

    return ensure_schema(
        bucketed_combine(partials.union(scaffold), "doc_id", finalize),
        pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()),
                   ("n_novel", pa.int64()), ("novelty", pa.float64())]))


# --- multi-keyword corpus scan ------------------------------------------------

KEYWORDS = ("spark", "hash join", "window", "slow query", "stream")


def q_keyword_match(sf_dir: str,
                    keywords: tuple[str, ...] = KEYWORDS) -> pd.DataFrame:
    """Per-keyword corpus hit stats: how many documents contain each
    (case-sensitive) substring, and the earliest matching doc — the
    broadcast-pattern scan every corpus triage starts with (brand terms,
    contamination markers, layout artifacts). The keyword list is a
    driver-side constant closed over by the batch fn (bytes-tiny; at a
    larger pattern inventory it would ship once via ``ray.put``);
    per batch each pattern is ONE vectorized Arrow ``match_substring``
    kernel, reduced to |keywords|-sized (hits, min-doc) partials — the
    corpus never shuffles."""
    ds = _docs(sf_dir)

    def scan(t: pa.Table) -> pa.Table:
        text = t["text"]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hits, first = [], []
        for kw in keywords:
            m = pc.match_substring(text, kw).to_numpy(zero_copy_only=False)
            m = np.asarray(m, bool)
            hits.append(int(m.sum()))
            first.append(int(ids[m].min()) if m.any()
                         else np.iinfo(np.int64).max)
        return pa.table({"keyword": pa.array(list(keywords), pa.string()),
                         "n": pa.array(hits, pa.int64()),
                         "fd": pa.array(first, pa.int64())})

    from ray.data.aggregate import Min, Sum
    agg = (ds.map_batches(scan, batch_format="pyarrow", batch_size=None)
           .groupby("keyword")
           .aggregate(Sum("n", alias_name="n_docs"),
                      Min("fd", alias_name="first_doc"))
           .to_pandas())
    # unmatched keywords are absent from the result (empty-corpus contract:
    # zero rows), so first_doc is always a real id — no nullable ints
    agg = agg[agg["n_docs"] > 0] if not agg.empty else agg
    if agg.empty:
        from .collect import typed_empty
        return typed_empty(keyword="object", n_docs="int64",
                           first_doc="int64")
    out = agg.sort_values("keyword").reset_index(drop=True)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["first_doc"] = out["first_doc"].astype(np.int64)
    return out[["keyword", "n_docs", "first_doc"]]


# --- source-pair content overlap ----------------------------------------------


def q_source_overlap(sf_dir: str) -> pd.DataFrame:
    """Corpus-level content overlap between every pair of sources: the
    Jaccard of their distinct word-5-gram sets — the mixture-planning
    diagnostic that finds mirrored/recrawled sources BEFORE per-doc dedup
    (two sources sharing 80% of their grams are one source). The overlap
    join runs at corpus key cardinality: distinct (gram-md5-64, source)
    int-keyed rows, a gram-bucketed combine holds each gram's source set
    whole (sources-per-gram is bounded by |sources|, so the self-merge is
    tiny) and emits |sources|²-sized pair partials plus per-source
    distinct-gram totals as sentinel rows; one small final groupby. Only
    pairs sharing ≥1 gram appear. Same token/gram conventions and
    collision acceptance as ``q_ngram_novelty``."""
    from .combine import bucketed_combine
    from .dedup import _md5_64

    ds = _docs(sf_dir, columns=("text", "source"))

    def gram_rows(t: pa.Table) -> pa.Table:
        srcs: list[str] = []
        ghs: list[int] = []
        for s, x in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            toks = [w for w in (x or "").lower().split(" ") if w]
            gs = {" ".join(toks[i:i + NOVELTY_N])
                  for i in range(len(toks) - NOVELTY_N + 1)}
            srcs.extend([s] * len(gs))
            ghs.extend(_md5_64(g) for g in gs)
        gh = (np.fromiter(ghs, np.uint64, len(ghs)).view(np.int64)
              if ghs else np.empty(0, np.int64))
        t2 = pa.table({"gh": pa.array(gh, pa.int64()),
                       "source": pa.array(srcs, pa.string())})
        # batch-local distinct: different docs of one source repeat grams
        return pa.Table.from_pandas(
            t2.to_pandas().drop_duplicates(["gh", "source"]),
            preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["gh", "source"])
        m = g.merge(g, on="gh")
        m = m[m["source_x"] < m["source_y"]]
        p = (m.groupby(["source_x", "source_y"], as_index=False)
             .agg(n=("gh", "size")))
        p.columns = ["source_a", "source_b", "n"]
        s = (g.groupby("source", as_index=False).agg(n=("gh", "size")))
        s.columns = ["source_a", "n"]
        s["source_b"] = ""
        out = pd.concat([p, s[["source_a", "source_b", "n"]]],
                        ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    from ray.data.aggregate import Sum
    part = (bucketed_combine(
                ds.map_batches(gram_rows, batch_format="pyarrow",
                               batch_size=4096),
                "gh", per_bucket)
            .groupby(["source_a", "source_b"])
            .aggregate(Sum("n", alias_name="n_shared")).to_pandas())
    if part.empty:
        from .collect import typed_empty
        return typed_empty(source_a="object", source_b="object",
                           n_shared="int64", jaccard="float64")
    singles = (part[part["source_b"] == ""]
               .set_index("source_a")["n_shared"].astype(np.int64))
    out = part[part["source_b"] != ""].copy()
    if out.empty:
        from .collect import typed_empty
        return typed_empty(source_a="object", source_b="object",
                           n_shared="int64", jaccard="float64")
    out["n_shared"] = out["n_shared"].astype(np.int64)
    na = singles.reindex(out["source_a"]).to_numpy(np.float64)
    nb = singles.reindex(out["source_b"]).to_numpy(np.float64)
    sh = out["n_shared"].to_numpy(np.float64)
    out["jaccard"] = round_half_away(sh / (na + nb - sh), 6)
    return (out[["source_a", "source_b", "n_shared", "jaccard"]]
            .sort_values(["source_a", "source_b"]).reset_index(drop=True))


# --- per-source Simpson diversity (lexical concentration diagnostic) ------------

def q_simpson_diversity(sf_dir: str) -> pd.DataFrame:
    """Per-source Simpson index over the unigram distribution — the
    lexical-concentration diagnostic of a multi-source training mix
    (a source dominated by boilerplate shows a high collision
    probability D = Σ_t c(c−1) / (N(N−1)); a diverse one tends to 0).

    Exactness: D is a ratio of two BIGINT aggregates — the numerator
    folds per-token as integer c·(c−1), so nothing depends on float
    summation order; the single ``float(num)/float(den)`` division at
    the end replays DuckDB's CAST-then-divide bit-for-bit.

    Ray shape (the q_source_kl template): per-batch (tok, source)
    count partials → ONE token-bucketed combine resolves each token's
    global per-source count AND reduces straight to per-source
    integer partials inside the bucket (only |sources|-sized rows
    leave the shuffle) → a tiny ``groupby(source)`` Sum → the driver
    takes the one division per source."""
    from ray.data.aggregate import Sum

    from .collect import typed_empty
    from .combine import bucketed_combine
    from .dedup import _hash64

    ds = _docs(sf_dir, ["source", "text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        words = pc.utf8_split_whitespace(pc.utf8_lower(text))
        nw_raw = pc.list_value_length(words).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(words)
        keep = pc.utf8_length(flat).cast(pa.int64()).to_numpy(
            zero_copy_only=False) > 0
        src = np.repeat(np.asarray(t["source"].to_pylist(), dtype=object),
                        nw_raw)[keep]
        toks = np.asarray(flat.to_pylist(), dtype=object)[keep]
        df = (pd.DataFrame({"tok": toks, "source": src})
              .groupby(["tok", "source"], as_index=False).size())
        cache: dict[str, int] = {}
        th = np.fromiter(
            (cache.setdefault(x, _hash64(x) // 2) for x in df["tok"]),
            np.int64, count=len(df))
        return pa.table({"tok_h": pa.array(th, pa.int64()),
                         "tok": pa.array(df["tok"], pa.string()),
                         "source": pa.array(df["source"], pa.string()),
                         "c": pa.array(df["size"].to_numpy(np.int64))})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cnt = (g.groupby(["tok", "source"], as_index=False)
                .agg(c=("c", "sum")))
        c = cnt["c"].to_numpy(np.int64)
        cnt["num"] = c * (c - 1)
        out = (cnt.groupby("source", as_index=False)
               .agg(n_tokens=("c", "sum"), n_distinct=("c", "size"),
                    num=("num", "sum")))
        for col in ("n_tokens", "n_distinct", "num"):
            out[col] = out[col].astype(np.int64)
        return out[["source", "n_tokens", "n_distinct", "num"]]

    parts = bucketed_combine(
        ds.map_batches(tok_counts, batch_format="pyarrow",
                       batch_size=8192),
        "tok_h", per_bucket)
    df = (parts.groupby("source")
          .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                     Sum("n_distinct", alias_name="n_distinct"),
                     Sum("num", alias_name="num")).to_pandas())
    if df.empty:
        return typed_empty(source="object", n_tokens="int64",
                           n_distinct="int64", simpson="float64")
    for col in ("n_tokens", "n_distinct", "num"):
        df[col] = df[col].astype(np.int64)
    n = df["n_tokens"].to_numpy(np.int64)
    num = df["num"].to_numpy(np.int64)
    # CAST-then-divide, exactly as the oracle: int→double conversions and
    # one IEEE division are deterministic given identical integers
    den = n.astype(np.float64) * (n - 1).astype(np.float64)
    df["simpson"] = np.where(
        n > 1, num.astype(np.float64) / np.where(n > 1, den, 1.0), 0.0)
    return (df[["source", "n_tokens", "n_distinct", "simpson"]]
            .sort_values("source").reset_index(drop=True))


# --- Zipf-exponent fit over the unigram rank-frequency curve --------------------

ZIPF_TOP_V = 128
ZIPF_LOG_GRID = 1_000_000.0


def q_zipf_slope(sf_dir: str) -> pd.DataFrame:
    """OLS fit of ``ln(freq) ~ ln(rank)`` over the corpus's top-128
    unigrams — the Zipf-law diagnostic of a training mix (natural text
    fits slope ≈ −1 with high R²; templated/boilerplate corpora flatten
    or kink the curve).

    Exactness: each log quantizes ELEMENTWISE to the 1e-6 integer grid
    (``round(1e6·ln(x))`` — ln is the shared libm, the q_pmi_topk
    precedent), so the OLS moment sums are integer folds (Python ints on
    the driver, HUGEINT in DuckDB — order-free and overflow-free); slope
    and R² are deterministic int→double casts with the SAME association
    on both sides, one division each. The grid scale cancels in the
    slope ratio, so the reported slope is in natural ln units.

    Ray shape: per-batch token-count partials → ONE token-bucketed
    combine resolves global frequencies AND takes the bucket-local
    top-128 by the final total order ``(freq DESC, tok ASC)`` (a token
    lives whole in one bucket, so this is a valid top-k combiner) → the
    driver merges ≤ 128 × n_buckets candidate rows and fits on 128
    points. The full vocabulary never leaves the cluster."""
    from .collect import typed_empty
    from .combine import bucketed_combine
    from .dedup import _hash64

    ds = _docs(sf_dir, ["text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        words = pc.utf8_split_whitespace(pc.utf8_lower(text))
        flat = pc.list_flatten(words)
        toks = np.asarray(flat.to_pylist(), dtype=object)
        toks = toks[np.fromiter((len(x) > 0 for x in toks), bool,
                                count=len(toks))] if len(toks) else toks
        df = (pd.DataFrame({"tok": toks})
              .groupby("tok", as_index=False).size())
        cache: dict[str, int] = {}
        th = np.fromiter(
            (cache.setdefault(x, _hash64(x) // 2) for x in df["tok"]),
            np.int64, count=len(df))
        return pa.table({"tok_h": pa.array(th, pa.int64()),
                         "tok": pa.array(df["tok"], pa.string()),
                         "freq": pa.array(df["size"].to_numpy(np.int64))})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("tok", as_index=False).agg(freq=("freq", "sum"))
        cnt["freq"] = cnt["freq"].astype(np.int64)
        cnt = cnt.sort_values(["freq", "tok"], ascending=[False, True],
                              kind="mergesort")
        return cnt.head(ZIPF_TOP_V)[["tok", "freq"]]

    cand = bucketed_combine(
        ds.map_batches(tok_counts, batch_format="pyarrow",
                       batch_size=8192),
        "tok_h", per_bucket).to_pandas()
    if len(cand) < 2:
        return typed_empty(n_terms="int64", zipf_slope="float64",
                           r2="float64")
    top = (cand.sort_values(["freq", "tok"], ascending=[False, True],
                            kind="mergesort")
           .head(ZIPF_TOP_V).reset_index(drop=True))
    n = len(top)
    if n < 2:
        return typed_empty(n_terms="int64", zipf_slope="float64",
                           r2="float64")
    rank = np.arange(1, n + 1, dtype=np.float64)
    freq = top["freq"].to_numpy(np.int64).astype(np.float64)
    qx = round_half_away(ZIPF_LOG_GRID * np.log(rank), 0).astype(np.int64)
    qy = round_half_away(ZIPF_LOG_GRID * np.log(freq), 0).astype(np.int64)
    # Python-int moments: arbitrary precision, mirrors DuckDB's HUGEINT
    sx, sy = int(qx.sum()), int(qy.sum())
    sxy = int((qx * qy).sum())
    sxx = int((qx * qx).sum())
    syy = int((qy * qy).sum())
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    slope = round_half_away(float(num) / float(denx), 6)
    r2 = (0.0 if deny == 0 else
          round_half_away((float(num) * float(num))
                          / (float(denx) * float(deny)), 6))
    return pd.DataFrame({"n_terms": np.array([n], np.int64),
                         "zipf_slope": np.array([slope], np.float64),
                         "r2": np.array([r2], np.float64)})


# --- winnowing containment pairs --------------------------------------------------

CONTAIN_MAX_DF = 16   # drop boilerplate fingerprints present in > MAX_DF docs
CONTAIN_T = 0.5       # containment threshold (of the smaller fingerprint set)


def q_containment_pairs(sf_dir: str, threshold: float = CONTAIN_T,
                        max_df: int = CONTAIN_MAX_DF) -> pd.DataFrame:
    """ASYMMETRIC near-duplicate detection: document pairs whose winnowed
    fingerprint sets overlap by ≥ ``threshold`` of the SMALLER set —
    the quote/excerpt/subset-duplication case Jaccard dedup misses (a
    short doc fully contained in a long one has low Jaccard but
    containment 1.0; Broder's containment measure over
    Schleimer-et-al winnowing fingerprints).

    Operator definition (exactly SQL-replayable): fingerprints with
    document frequency > ``max_df`` are dropped FIRST (boilerplate
    8-grams — the ``dedup_ngram_jaccard`` max_df knob; without it the
    fingerprint self-join is quadratic in the hub grams), set sizes are
    counted AFTER the drop, containment = |∩| / min(n_a, n_b) is one
    integer division rounded half-away to 6, and the filter compares the
    ROUNDED value. All decisions integer-or-deterministic.

    Ray shape: per-doc winnow selection (the ``winnow_fingerprint``
    scan), a small df groupby + inner join drops hub fingerprints, one
    doc-bucketed combine re-counts the filtered set sizes onto the rows,
    then the ngram-jaccard blocking — self-join on the fingerprint, a
    block-local ordered-pair combiner, and a candidate-pair-sized final
    fold. The pair list is O(result) (~13k at sf0.1)."""
    import pyarrow.compute as pc

    from .collect import typed_empty
    from .combine import bucketed_combine

    docs = _docs(sf_dir)

    def winnow_rows(t: pa.Table) -> pa.Table:
        cache: dict = {}
        ids, sels = [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            hs = winnow_hashes(x or "", cache)
            ids.append(np.full(len(hs), d, np.int64))
            sels.append(hs.view(np.int64))   # uint64 → int64 bit view
        if not ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sel": pa.array([], pa.int64())})
        return pa.table({"doc_id": pa.array(np.concatenate(ids)),
                         "sel": pa.array(np.concatenate(sels), pa.int64())})

    rows = docs.map_batches(winnow_rows, batch_format="pyarrow",
                            batch_size=None).materialize()
    if rows.count() == 0:
        # Ray's hash join crashes on schema-less empty sides; an empty
        # corpus/partition is a routine condition (minhash_candidates
        # has the same guard)
        return typed_empty(a="int64", b="int64", containment="float64")

    def df_filter(g: pd.DataFrame) -> pd.DataFrame:
        # a fingerprint lives whole in its sel-bucket, so the bucket-local
        # df count is GLOBAL — one combine replaces the
        # groupby(sel).count() + inner-join pair (a full shuffle saved)
        keep = (g.groupby("sel")["doc_id"].transform("size")
                <= max_df)
        return g[keep.to_numpy()]

    rows = bucketed_combine(rows, "sel", df_filter)

    def attach_n(g: pd.DataFrame) -> pd.DataFrame:
        # post-filter set size onto every row (a doc lives in one bucket)
        g = g.copy()
        g["n"] = g.groupby("doc_id")["sel"].transform("size").astype(
            np.int64)
        return g[["doc_id", "n", "sel"]]

    rows = bucketed_combine(rows, "doc_id", attach_n).materialize()
    if rows.count() == 0:
        return typed_empty(a="int64", b="int64", containment="float64")

    joined = rows.join(rows, join_type="inner",
                       num_partitions=scale.join_partitions(),
                       on=("sel",), right_suffix="_r")

    def pair_counts(t: pa.Table) -> pa.Table:
        # block-local combiner (see dedup_ngram_jaccard)
        t = t.filter(pc.less(t["doc_id"], t["doc_id_r"]))
        return (pa.table({"a": t["doc_id"], "b": t["doc_id_r"],
                          "n_a": t["n"], "n_b": t["n_r"],
                          "c": pa.array(np.ones(t.num_rows, np.int64))})
                .group_by(["a", "b"])
                .aggregate([("n_a", "max"), ("n_b", "max"), ("c", "sum")])
                .rename_columns(["a", "b", "n_a", "n_b", "c"]))

    g = (joined.map_batches(pair_counts, batch_format="pyarrow",
                            batch_size=None).to_pandas()
         .groupby(["a", "b"], as_index=False, sort=False)
         .agg(n_a=("n_a", "max"), n_b=("n_b", "max"), c=("c", "sum")))
    if g.empty:
        return typed_empty(a="int64", b="int64", containment="float64")
    c = g["c"].to_numpy(np.float64)
    cont = round_half_away(
        c / np.minimum(g["n_a"].to_numpy(np.float64),
                       g["n_b"].to_numpy(np.float64)), 6)
    keep = cont >= threshold
    out = pd.DataFrame({"a": g["a"].to_numpy(np.int64)[keep],
                        "b": g["b"].to_numpy(np.int64)[keep],
                        "containment": cont[keep]})
    if out.empty:
        return typed_empty(a="int64", b="int64", containment="float64")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# --- distribution drift / concentration over doc length --------------------------

def _length_counts(sf_dir: str) -> pd.DataFrame:
    """(source, n_chars value, count) — the shared exact reduction behind
    the KS-drift and Gini operators. One slim 2-column read (the
    precomputed ``n_chars`` column, never the text payload), per-batch
    integer count partials, ONE (source × value)-sized groupby. The
    result is bounded by |sources| × |distinct lengths| — distinct
    document lengths are capped by the max document size, not the corpus
    size, so the driver pull stays result-sized at any N."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"],
        override_num_blocks=scale.read_blocks_for_path(
            f"{sf_dir}/documents.parquet"))

    def partial(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({
                "source": t["source"].to_numpy(zero_copy_only=False),
                "v": t["n_chars"].to_numpy(zero_copy_only=False)
                     .astype(np.int64)})
             .groupby(["source", "v"], as_index=False).size()
             .rename(columns={"size": "c"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
          .groupby(["source", "v"]).aggregate(Sum("c", alias_name="c"))
          .to_pandas())
    if not df.empty:
        df["v"] = df["v"].astype(np.int64)
        df["c"] = df["c"].astype(np.int64)
    return df


def q_ks_drift(sf_dir: str) -> pd.DataFrame:
    """Pairwise two-sample Kolmogorov-Smirnov statistic between every
    source pair on the document-length distribution — the standard
    distribution-drift monitor between corpus snapshots / data sources
    (a large KS between an old and a new crawl of the same source flags
    a pipeline change upstream).

    EXACT under any partitioning: the empirical-CDF gap maximization
    compares CROSS-MULTIPLIED integers — ``max |cum_a·n_b − cum_b·n_a|``
    over the merged value grid (Python-int fold on the result-sized
    count table, overflow-free at any N) — and the single float division
    by ``n_a·n_b`` happens once per pair at the end.

    Output: one row per unordered source pair (source_a < source_b)."""
    from .collect import typed_empty

    empty = typed_empty(source_a="object", source_b="object",
                        n_a="int64", n_b="int64", ks="float64")
    df = _length_counts(sf_dir)
    if df.empty:
        return empty
    vals = np.sort(df["v"].unique())
    sources = sorted(df["source"].unique())
    pos = {v: i for i, v in enumerate(vals)}
    cums: dict[str, list[int]] = {}
    tots: dict[str, int] = {}
    for s in sources:
        g = df[df["source"] == s]
        arr = np.zeros(len(vals), np.int64)
        arr[[pos[v] for v in g["v"]]] = g["c"].to_numpy(np.int64)
        cum = np.cumsum(arr)
        cums[s] = [int(x) for x in cum]       # Python ints: no overflow
        tots[s] = int(cum[-1])
    rows = []
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            na, nb = tots[a], tots[b]
            num = max(abs(ca * nb - cb * na)
                      for ca, cb in zip(cums[a], cums[b]))
            rows.append((a, b, na, nb,
                         float(round_half_away(
                             np.float64(num) / (np.float64(na)
                                                * np.float64(nb)), 6))))
    out = pd.DataFrame(rows, columns=["source_a", "source_b",
                                      "n_a", "n_b", "ks"])
    out["n_a"] = out["n_a"].astype(np.int64)
    out["n_b"] = out["n_b"].astype(np.int64)
    return (out.sort_values(["source_a", "source_b"])
            .reset_index(drop=True))


def q_charclass_profile(sf_dir: str) -> pd.DataFrame:
    """Per-source character-class mix: letters, digits, whitespace,
    punctuation/other as fractions of all codepoints — the content-type
    profile that separates prose from number-heavy tables and markup
    residue before any tokenizer sees the text. Companion of
    q_encoding_health on the same codepoint-arithmetic discipline.

    EXACT: class counts are length-differences under identical RE2
    classes on both engines (Arrow ``replace_substring_regex`` ==
    DuckDB ``regexp_replace g``); int64 partials; three divisions per
    output row (other = remainder).

    Ray shape: one vectorized Arrow pass → ≤ |sources|-group groupby.
    Result-sized → DataFrame."""
    from ray.data.aggregate import Sum

    from .collect import typed_empty

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])

    def _cnt(text, pattern):
        return pc.utf8_length(pc.replace_substring_regex(
            text, pattern, "")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)

    def partial(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        nc = pc.utf8_length(text).cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nl = nc - _cnt(text, r"[A-Za-zæøåÆØÅ]")
        nd = nc - _cnt(text, r"[0-9]")
        nw = nc - _cnt(text, r"\s")
        g = (pd.DataFrame({"source": t["source"].to_numpy(
                               zero_copy_only=False),
                           "nc": nc, "nl": nl.astype(np.int64),
                           "nd": nd.astype(np.int64),
                           "nw": nw.astype(np.int64)})
             .groupby("source", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=8192)
          .groupby("source")
          .aggregate(Sum("nc", alias_name="n_chars"),
                     Sum("nl", alias_name="n_letters"),
                     Sum("nd", alias_name="n_digits"),
                     Sum("nw", alias_name="n_space"))
          .to_pandas())
    if df.empty or "n_chars" not in df.columns:
        return typed_empty(source="object", n_chars="int64",
                           letter_frac="float64", digit_frac="float64",
                           space_frac="float64")
    for c in ("n_chars", "n_letters", "n_digits", "n_space"):
        df[c] = df[c].astype(np.int64)
    den = np.maximum(df["n_chars"].to_numpy(np.int64), 1).astype(
        np.float64)
    df["letter_frac"] = round_half_away(
        df["n_letters"].to_numpy(np.float64) / den, 6)
    df["digit_frac"] = round_half_away(
        df["n_digits"].to_numpy(np.float64) / den, 6)
    df["space_frac"] = round_half_away(
        df["n_space"].to_numpy(np.float64) / den, 6)
    return (df[["source", "n_chars", "letter_frac", "digit_frac",
                "space_frac"]]
            .sort_values("source").reset_index(drop=True))


def q_stopword_profile(sf_dir: str) -> pd.DataFrame:
    """Per-source stopword MASS: what fraction of a source's tokens are
    function words (the GOPHER_STOPS list) — the fluency signal CCNet
    and Gopher both lean on, as a source-level profile (natural prose
    sits in a band; OCR noise and keyword-stuffed spam fall far below
    it). Distinct from q_gopher_filter's per-doc DISTINCT-stopword
    count: this is token mass, per source.

    EXACT: token counts are one vectorized Arrow pass (``index_in``
    against the sorted stop list — the _gopher_batch kernel); per-source
    int64 partials; ONE division per output row.

    Ray shape: one streaming pass → ≤ |sources|-group groupby.
    Result-sized → DataFrame."""
    from ray.data.aggregate import Sum

    from .collect import typed_empty

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])
    stops = pa.array(sorted(GOPHER_STOPS))

    def partial(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        words = pc.utf8_split_whitespace(pc.utf8_lower(text))
        nw_raw = pc.list_value_length(words).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(words)
        nonempty = (pc.utf8_length(flat).cast(pa.int64())
                    .to_numpy(zero_copy_only=False) > 0)
        si = pc.index_in(flat, value_set=stops).to_numpy(
            zero_copy_only=False)
        hit = (~np.isnan(si) if si.dtype.kind == "f"
               else si >= 0).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(nw_raw), dtype=np.int64),
                            nw_raw)
        nt = np.bincount(doc_idx[nonempty],
                         minlength=len(nw_raw)).astype(np.int64)
        ns = np.bincount(doc_idx, weights=hit,
                         minlength=len(nw_raw)).astype(np.int64)
        g = (pd.DataFrame({"source": t["source"].to_numpy(
                               zero_copy_only=False),
                           "nt": nt, "ns": ns})
             .groupby("source", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=8192)
          .groupby("source")
          .aggregate(Sum("nt", alias_name="n_tokens"),
                     Sum("ns", alias_name="n_stop"))
          .to_pandas())
    if df.empty or "n_tokens" not in df.columns:
        return typed_empty(source="object", n_tokens="int64",
                           n_stop="int64", stop_frac="float64")
    for c in ("n_tokens", "n_stop"):
        df[c] = df[c].astype(np.int64)
    df["stop_frac"] = round_half_away(
        df["n_stop"].to_numpy(np.float64)
        / np.maximum(df["n_tokens"].to_numpy(np.int64), 1)
        .astype(np.float64), 6)
    return (df[["source", "n_tokens", "n_stop", "stop_frac"]]
            .sort_values("source").reset_index(drop=True))


def q_keep_by_length(sf_dir: str) -> pd.DataFrame:
    """Gopher-keep rate by document-length decile — the filter-ablation
    curve that answers "is the quality filter just a length proxy?"
    before anyone tunes thresholds: per global length decile, doc count,
    kept count and keep rate.

    EXACT: decile cuts come from the bounded (n_chars, count) CDF with
    the all-integer inverse-CDF test ``min v : 10·cum ≥ q·n`` (the
    q_length_percentiles device); a doc's decile is
    ``1 + #{cuts < n_chars}`` — integer comparisons against 9 broadcast
    cut values, no NTILE remainder ambiguity to replay; keep flags ride
    the proven ``_gopher_batch`` integer predicates; ONE division per
    output row.

    Ray shape: the slim CDF pass folds 9 cuts on the driver (bounded
    table) → one text pass computes keep + decile per batch and emits
    (decile, 2-int) partials → a ≤ 10-group groupby. Result-sized →
    DataFrame."""
    from ray.data.aggregate import Sum

    from .collect import typed_empty

    cdf = _length_counts(sf_dir)
    if cdf.empty:
        return typed_empty(decile="int64", n_docs="int64",
                           n_keep="int64", keep_rate="float64")
    g = (cdf.groupby("v", as_index=False)["c"].sum()
         .sort_values("v", kind="mergesort"))
    v = g["v"].to_numpy(np.int64)
    cum = np.cumsum(g["c"].to_numpy(np.int64))
    n = int(cum[-1])
    cuts = np.array(sorted(
        int(v[int(np.searchsorted(10 * cum, q * n))])
        for q in range(1, 10)), np.int64)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "n_chars", "text"])

    def partial(t: pa.Table) -> pa.Table:
        keep = _gopher_batch(t)["keep"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        dec = 1 + np.searchsorted(cuts, nc, side="left").astype(np.int64)
        gg = (pd.DataFrame({"decile": dec,
                            "c": np.ones(len(nc), np.int64),
                            "k": keep})
              .groupby("decile", as_index=False).sum())
        return pa.Table.from_pandas(gg, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
          .groupby("decile")
          .aggregate(Sum("c", alias_name="n_docs"),
                     Sum("k", alias_name="n_keep"))
          .to_pandas())                       # ≤ 10 rows
    if df.empty or "n_docs" not in df.columns:
        return typed_empty(decile="int64", n_docs="int64",
                           n_keep="int64", keep_rate="float64")
    for c in ("decile", "n_docs", "n_keep"):
        df[c] = df[c].astype(np.int64)
    df["keep_rate"] = round_half_away(
        df["n_keep"].to_numpy(np.float64)
        / df["n_docs"].to_numpy(np.float64), 6)
    return (df[["decile", "n_docs", "n_keep", "keep_rate"]]
            .sort_values("decile").reset_index(drop=True))


PCT_POINTS = (50, 90, 99)     # reported percentiles (inverse-CDF, lower)


def q_length_percentiles(sf_dir: str) -> pd.DataFrame:
    """Per-source EXACT p50/p90/p99 of document length — the
    batching/packing planner's numbers (p99 sizes the sequence budget,
    p50 the padding waste), exact where ``approx_group_quantiles`` gives
    the bottom-k sketch estimate.

    EXACT and all-integer: rides the shared ``_length_counts`` bounded
    (source, value, count) CDF; percentile q is the inverse empirical
    CDF ``min v : 100·cum(v) ≥ q·n`` — an integer test with no float
    thresholds, so any partitioning produces the same value. Oracle
    replays the same test with window cumsums.

    Ray shape: per-batch count partials → one bounded groupby → driver
    walks each source's cumulative once. Result-sized → DataFrame."""
    from .collect import typed_empty

    df = _length_counts(sf_dir)
    if df.empty:
        return typed_empty(source="object", n_docs="int64", p50="int64",
                           p90="int64", p99="int64")
    rows = []
    for s, g in df.groupby("source", sort=True):
        g = g.sort_values("v", kind="mergesort")
        v = g["v"].to_numpy(np.int64)
        cum = np.cumsum(g["c"].to_numpy(np.int64))
        n = int(cum[-1])
        picks = [int(v[int(np.searchsorted(100 * cum, q * n))])
                 for q in PCT_POINTS]
        rows.append((s, n, *picks))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "p50", "p90",
                                      "p99"])
    for c in ("n_docs", "p50", "p90", "p99"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


def q_gini_length(sf_dir: str) -> pd.DataFrame:
    """Per-source Gini coefficient of the document-length distribution —
    the concentration diagnostic mixture planning reads next to the
    Zipf slope (a source whose token mass sits in a few huge documents
    behaves differently under per-doc dedup and sampling than one with
    uniform lengths).

    EXACT: Gini over a multiset is ``(2·Σ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx)``
    with ranks over the sorted values; from the (value, count) table the
    rank-weighted sum folds per tie-run as
    ``v · (c·p + c·(c−1)/2)`` — all Python-int arithmetic on the
    result-sized count table, ONE float division per source at the end
    (ties contribute identically under any rank permutation, so the
    row_number replay in the oracle cannot diverge)."""
    from .collect import typed_empty

    empty = typed_empty(source="object", n_docs="int64", gini="float64")
    df = _length_counts(sf_dir)
    if df.empty:
        return empty
    rows = []
    for s in sorted(df["source"].unique()):
        g = df[df["source"] == s].sort_values("v")
        n = tot = si = 0
        for v, c in zip(g["v"].tolist(), g["c"].tolist()):
            p = n + 1                         # 1-based start rank of run
            si += v * (c * p + c * (c - 1) // 2)
            tot += v * c
            n += c
        gini = (0.0 if n * tot == 0 else
                float(round_half_away(
                    np.float64(2 * si - (n + 1) * tot)
                    / np.float64(n * tot), 6)))
        rows.append((s, n, gini))
    out = pd.DataFrame(rows, columns=["source", "n_docs", "gini"])
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)
