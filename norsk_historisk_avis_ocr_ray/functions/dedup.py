"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The large-scale-pipeline workhorses, expressed Ray-Data-first:

- **exact**: content hash per batch (vectorized) → ``groupby(hash)`` →
  first-per-group. One shuffle over (hash, doc_id) pairs only.
- **MinHash + LSH**: per-batch shingling + 128-permutation MinHash (numpy) →
  explode to (band, band_hash, doc_id) rows → ``groupby`` on the band key →
  candidate pairs within buckets → n-gram Jaccard verification. The shuffle
  moves 16 small rows per doc, never the text.
- **SimHash**: 64-bit signed-projection fingerprint per doc; candidate
  blocking on 16-bit chunks (Hamming ≤ 3 ⇒ at least one of 4 chunks equal),
  verify by Hamming distance.

Hashing is process-deterministic (Python's builtin ``hash`` is salted per
process and must never be used in a distributed pipeline) with genuinely
independent 64 bits per token (a crc32-pair scheme used earlier had only
~32 bits of entropy because CRC32 is linear in its init value). The TOKEN
hash is md5-derived (first 8 digest bytes) rather than blake2b: md5 is the
one cryptographic hash DuckDB shares with Python, which is what lets the
whole MinHash/SimHash family be EXACTLY SQL-oracled — every downstream
quantity (shingle mix, permutation minima, band keys, bit votes) is plain
uint64/mod-p arithmetic a DuckDB HUGEINT query replays bit-for-bit.

Verification hash-joins the candidate (a, b) pair list back to the documents
table twice (text-only joins), so no worker or the driver ever holds the
whole corpus — the 10^12-doc-safe dataflow.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from . import scale

MERSENNE = (1 << 61) - 1
_P61 = np.uint64(MERSENNE)
NUM_PERM = 128
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS


def _hash64(token: str) -> int:
    """Deterministic 64-bit token hash (blake2b 8-byte digest — full 64-bit
    entropy, unlike crc32 pairs which are linear in the seed)."""
    return int.from_bytes(
        hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big")


def _md5_64(token: str) -> int:
    """md5-derived 64-bit token hash: the first 8 digest bytes, big-endian —
    i.e. the first 16 hex chars of ``md5(token)``, which DuckDB reproduces as
    ``('0x' || substr(md5(tok), 1, 16))::UBIGINT``. The shared-hash bridge
    that makes MinHash/SimHash exactly SQL-oracle-able (``__ray_entry__``)."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8],
                          "big")


# Shingle hashes are derived from token hashes with a vectorized mixer, NOT
# blake2b per shingle: a batch of 1k docs has ~60k shingles but only a few
# thousand *distinct tokens*, so hashing the vocabulary once and combining in
# numpy removes millions of per-shingle digest calls from the hot stage.
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)   # splitmix64 finalizer constants
_MIX2 = np.uint64(0x94D049BB133111EB)
_POS = (np.uint64(0x9E3779B97F4A7C15),  # odd position multipliers (k ≤ 3)
        np.uint64(0xC2B2AE3D27D4EB4F),
        np.uint64(0x165667B19E3779F9))


def _fmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, elementwise (uint64 wrap-around is intended;
    errstate silences numpy's scalar-overflow RuntimeWarning — arrays wrap
    silently but a uint64 SCALAR input warns, and some callers pass one)."""
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(30))
        x = x * _MIX1
        x = x ^ (x >> np.uint64(27))
        x = x * _MIX2
        return x ^ (x >> np.uint64(31))


# Odd per-row multipliers for the LSH band key (rows-per-band ≤ 8): the key
# is fmix64 of a position-weighted wraparound dot product of the band's
# signature values. A linear mix + ONE finalizer (rather than an iterated
# fmix chain) keeps the band key SQL-oracle-able: DuckDB expands chained
# lateral aliases by substitution, so an 8-deep fmix fold explodes the
# expression tree exponentially at plan time, while a SUM aggregate plus a
# single finalizer is linear. Collision semantics are unchanged — the key
# only has to identify equal 8-tuples.
_BANDC = _fmix64(np.arange(1, 9, dtype=np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)


def _shingles_from_tokens(th: np.ndarray, k: int = 3) -> np.ndarray:
    """Unique k-gram shingle hashes from a doc's token-hash array (uint64).

    Each shingle hash mixes the k token hashes with distinct odd position
    multipliers (order-sensitive) through the splitmix64 finalizer."""
    n = len(th)
    if n == 0:
        return np.array([], dtype=np.uint64)
    if n < k:
        acc = np.uint64(0)
        for i in range(n):
            acc = acc + th[i] * _POS[i]
        return _fmix64(np.array([acc], dtype=np.uint64))
    acc = th[: n - k + 1] * _POS[0]
    for i in range(1, k):
        acc = acc + th[i: n - k + 1 + i] * _POS[i]
    return np.unique(_fmix64(acc))


def _hash_tokens_batch(texts: list, lower: bool = True) -> list[np.ndarray]:
    """Token-hash arrays for a batch of texts, hashing each DISTINCT token
    once (md5 over the batch vocabulary, dict lookups for the rest — md5 so
    DuckDB oracles can replay the hash, see ``_md5_64``).
    ``lower=False`` keeps case (for ops whose SQL oracle is case-sensitive)."""
    tok_lists = [((t or "").lower() if lower else (t or "")).split()
                 for t in texts]
    vocab: dict[str, int] = {}
    for toks in tok_lists:
        for t in toks:
            if t not in vocab:
                vocab[t] = _md5_64(t)
    get = vocab.__getitem__
    return [np.fromiter(map(get, toks), np.uint64, count=len(toks))
            for toks in tok_lists]


def _mod61(x: np.ndarray) -> np.ndarray:
    """x mod (2^61 - 1) for uint64 inputs (fold high bits, then subtract)."""
    v = (x >> np.uint64(61)) + (x & _P61)
    return np.where(v >= _P61, v - _P61, v)


def _modmul61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod (2^61 - 1) without 128-bit ints, for a, x < 2^61.

    Split both into 31/30-bit halves; with p = 2^61 - 1 we have
    2^61 ≡ 1 and 2^62 ≡ 2 (mod p), so every partial product stays < 2^63
    and fits uint64. (The round-1 version multiplied uint64s directly and
    silently overflowed, so it was not the claimed universal family.)"""
    lo31 = np.uint64(0x7FFFFFFF)
    a0, a1 = a & lo31, a >> np.uint64(31)          # a = a1*2^31 + a0
    x0, x1 = x & lo31, x >> np.uint64(31)
    t = a1 * x1 * np.uint64(2)                     # a1*x1*2^62 ≡ 2*a1*x1
    m = a1 * x0 + a0 * x1                          # < 2^62
    m_lo = m & np.uint64((1 << 30) - 1)
    m_hi = m >> np.uint64(30)
    # m*2^31 = m_hi*2^61 + m_lo*2^31 ≡ m_hi + m_lo*2^31
    v = t + m_hi + (m_lo << np.uint64(31)) + a0 * x0   # < 2^63
    return _mod61(_mod61(v))


def _shingle_array(text: str, k: int = 3) -> np.ndarray:
    return _shingles_from_tokens(_hash_tokens_batch([text])[0], k)


def word_shingles(text: str, k: int = 3) -> set[int]:
    return set(_shingle_array(text, k).tolist())


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = _shingle_array(a, k), _shingle_array(b, k)
    if not len(sa) and not len(sb):
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 0.0


def _docs(sf_dir: str, num_blocks: int | None = None) -> Dataset:
    """``num_blocks`` splits the read itself (row-range granularity) so a
    single-file test input doesn't arrive as ONE block and serialize the
    compute stage behind it — free, unlike a repartition() all-to-all."""
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"],
                                 override_num_blocks=num_blocks)


# --- exact dedup --------------------------------------------------------------

def dedup_exact(sf_dir: str) -> Dataset:
    """Survivors of exact-content dedup: min(doc_id) per md5(text).

    The combine is BUCKETED on an int64 view of the fingerprint
    (functions/combine.py): one distinct key per document makes this the
    textbook high-cardinality aggregate, where Ray's per-group Python
    iteration (~0.4 ms/key) would dominate — one vectorized pandas
    min-per-key per bucket instead."""
    from .collect import ensure_schema
    from .combine import bucketed_combine

    def add_hash(t: pa.Table) -> pa.Table:
        md5s = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
                for x in t["text"].to_pylist()]
        fph = np.array([np.uint64(int(m[:16], 16)) for m in md5s],
                       np.uint64).view(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint": pa.array(md5s, pa.string()),
                         "fph": pa.array(fph, pa.int64())})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("fingerprint", as_index=False)
                .agg(doc_id=("doc_id", "min")))
        out["doc_id"] = out["doc_id"].astype(np.int64)
        return out[["fingerprint", "doc_id"]]

    ds = bucketed_combine(
        _docs(sf_dir).map_batches(add_hash, batch_format="pyarrow",
                                  batch_size=8192),
        "fph", keep_first)
    # Streaming result: survivors are corpus-sized — never pulled to the
    # driver (the gate's compare sorts rows itself).
    return ensure_schema(ds, pa.schema([
        ("fingerprint", pa.string()), ("doc_id", pa.int64())]))


def q_dup_leakage(sf_dir: str) -> pd.DataFrame:
    """Cross-source exact-duplicate leakage matrix: for every source pair
    (a ≤ b), how many duplicate DOC PAIRS share identical text, and how
    many distinct contents are involved. The mixture-planning companion of
    ``dedup_exact``: a hot (a, b) cell means source b republishes source
    a (mirrors, syndication, scraper overlap), so sampling both at full
    weight double-counts that content.

    EXACT and all-integer: the md5 fingerprint chain is dedup_exact's;
    every fingerprint's per-source counts resolve GLOBALLY inside ONE
    combine bucket (fph is a pure function of the text), so the pair
    counts c_a·c_b / C(c,2) are partitioning-independent integers and the
    per-pair group counts are additive across buckets (each fingerprint
    lives in exactly one).

    Ray shape: per-batch (fph, source, count) partials → one bucketed
    combine (pandas self-merge per bucket emits ≤ |sources|² rows each) →
    driver folds the |sources|²-sized matrix. Result-sized → DataFrame."""
    from .collect import typed_empty
    from .combine import bucketed_combine

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        md5s = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
                for x in t["text"].to_pylist()]
        fph = np.array([np.uint64(int(m[:16], 16)) for m in md5s],
                       np.uint64).view(np.int64)
        g = (pd.DataFrame({"fph": fph,
                           "source": t["source"].to_numpy(
                               zero_copy_only=False),
                           "c": np.ones(len(md5s), np.int64)})
             .groupby(["fph", "source"], as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        cc = g.groupby(["fph", "source"], as_index=False)["c"].sum()
        m = cc.merge(cc, on="fph", suffixes=("_a", "_b"))
        m = m[m["source_a"] <= m["source_b"]]
        if m.empty:
            return pd.DataFrame({"source_a": pd.Series([], dtype=object),
                                 "source_b": pd.Series([], dtype=object),
                                 "n_pairs": pd.Series([], dtype=np.int64),
                                 "n_groups": pd.Series([], dtype=np.int64)})
        same = (m["source_a"] == m["source_b"]).to_numpy()
        ca = m["c_a"].to_numpy(np.int64)
        cb = m["c_b"].to_numpy(np.int64)
        m = m.assign(n_pairs=np.where(same, ca * (ca - 1) // 2, ca * cb))
        m = m[m["n_pairs"] > 0]
        out = (m.groupby(["source_a", "source_b"], as_index=False)
                .agg(n_pairs=("n_pairs", "sum"), n_groups=("fph", "size")))
        for c in ("n_pairs", "n_groups"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = bucketed_combine(
        ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192),
        "fph", pairs).to_pandas()        # ≤ buckets × |sources|² rows
    if parts.empty:
        return typed_empty(source_a="object", source_b="object",
                           n_pairs="int64", n_groups="int64")
    out = (parts.groupby(["source_a", "source_b"], as_index=False)
           .agg(n_pairs=("n_pairs", "sum"), n_groups=("n_groups", "sum")))
    for c in ("n_pairs", "n_groups"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["source_a", "source_b"])
            .reset_index(drop=True))


def q_near_dup_leakage(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """Cross-source NEAR-duplicate leakage matrix: the q_dup_leakage
    question asked of the verified MinHash pairs (word-3-gram Jaccard ≥
    threshold) instead of exact hashes — the matrix that actually lights
    up on a web corpus, where syndication edits a headline or a byline
    and exact-hash leakage reads zero.

    EXACT: pairs ride the full proven ``dedup_minhash`` chain (LSH
    candidates → semi-join-reduced verify); source attachment is a second
    semi-join reduction (the pair-involved doc-ids — O(result) ints —
    broadcast into one filtered scan, never a corpus-sized join);
    least/greatest source ordering and the count are integers.

    Result-sized output → DataFrame."""
    import pyarrow.compute as pc

    from .collect import typed_empty

    empty = typed_empty(source_a="object", source_b="object",
                        n_pairs="int64")
    pairs = dedup_minhash(sf_dir, threshold=threshold)
    if pairs.empty:
        return empty
    id_set = pa.array(np.unique(np.concatenate(
        [pairs["a"].to_numpy(np.int64), pairs["b"].to_numpy(np.int64)])))
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])

    def only_involved(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=id_set))

    sl = docs.map_batches(only_involved,
                          batch_format="pyarrow").to_pandas()  # O(result)
    src = dict(zip(sl["doc_id"].to_numpy(np.int64), sl["source"]))
    sa = pairs["a"].map(src).to_numpy()
    sb = pairs["b"].map(src).to_numpy()
    lo = np.where(sa <= sb, sa, sb)
    hi = np.where(sa <= sb, sb, sa)
    out = (pd.DataFrame({"source_a": lo, "source_b": hi})
           .groupby(["source_a", "source_b"], as_index=False).size()
           .rename(columns={"size": "n_pairs"}))
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return (out.sort_values(["source_a", "source_b"])
            .reset_index(drop=True))


def q_dedup_savings(sf_dir: str) -> pd.DataFrame:
    """What an exact-dedup pass SAVES: documents and characters removed
    when each md5-content group keeps its min-doc_id survivor — the
    storage/compute budget line that justifies (or kills) running dedup
    at all. One row: removed doc/char counts, totals, and the saved
    fraction.

    EXACT and all-integer: group resolution rides the dedup_exact
    bucketed combine (a fingerprint's rows land whole in one bucket, so
    per-bucket removed-docs/removed-chars sums are additive); one
    division at the end.

    Ray shape: one md5 pass → one bucketed combine emitting per-bucket
    2-int partials → driver folds four integers. 1-row → DataFrame
    (empty corpus → zero rows)."""
    from .collect import typed_empty
    from .combine import bucketed_combine
    from .rounding import round_half_away

    empty = typed_empty(n_docs="int64", n_removed="int64",
                        n_chars="int64", chars_removed="int64",
                        saved_frac="float64")
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        md5s = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
                for x in texts]
        fph = np.array([np.uint64(int(m[:16], 16)) for m in md5s],
                       np.uint64).view(np.int64)
        nc = np.array([len(x or "") for x in texts], np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "fph": pa.array(fph, pa.int64()),
                         "nc": pa.array(nc, pa.int64())})

    def savings(g: pd.DataFrame) -> pd.DataFrame:
        surv = g.groupby("fph")["doc_id"].transform("min")
        rem = g["doc_id"].to_numpy(np.int64) != surv.to_numpy(np.int64)
        return pd.DataFrame({
            "d": np.array([len(g)], np.int64),
            "dr": np.array([int(rem.sum())], np.int64),
            "c": np.array([int(g["nc"].sum())], np.int64),
            "cr": np.array([int(g.loc[rem, "nc"].sum())], np.int64)})

    f = bucketed_combine(
        ds.map_batches(add_hash, batch_format="pyarrow",
                       batch_size=8192),
        "fph", savings).to_pandas()
    if f.empty or "d" not in f.columns:
        return empty
    s = f.sum()
    n, dr, c, cr = (int(s["d"]), int(s["dr"]), int(s["c"]),
                    int(s["cr"]))
    return pd.DataFrame({
        "n_docs": pd.Series([n], dtype="int64"),
        "n_removed": pd.Series([dr], dtype="int64"),
        "n_chars": pd.Series([c], dtype="int64"),
        "chars_removed": pd.Series([cr], dtype="int64"),
        "saved_frac": [float(round_half_away(
            np.float64(cr) / np.float64(max(c, 1)), 6))]})


DUP_DIST_GRID = 100    # distance log-grid: g = floor(100·ln(1+|a−b|))


def q_dup_distance(sf_dir: str) -> pd.DataFrame:
    """Duplicate-locality histogram: the doc_id distance |a − b| of every
    verified MinHash near-dup pair on a bounded log grid — the lens that
    separates crawl-revisit duplication (near pairs: the same site
    scraped twice in sequence) from cross-site syndication (far pairs),
    which need different dedup strategies upstream.

    EXACT: pairs ride the proven ``dedup_minhash`` chain; the grid is
    the q_ccnet device ``floor(100·ln(1+d))`` (``math.log`` == DuckDB
    ``ln``; bounded by 100·ln(corpus size) however large the id space);
    counts are integers.

    Result-sized throughout (the verified pair list) → DataFrame."""
    import math

    from .collect import typed_empty

    pairs = dedup_minhash(sf_dir)
    if pairs.empty:
        return typed_empty(dist_bucket="int64", n_pairs="int64",
                           min_dist="int64", max_dist="int64")
    d = np.abs(pairs["a"].to_numpy(np.int64)
               - pairs["b"].to_numpy(np.int64))
    g = np.fromiter((math.floor(
        DUP_DIST_GRID * math.log(1.0 + float(x))) for x in d),
        np.int64, count=len(d))
    out = (pd.DataFrame({"dist_bucket": g, "n_pairs": 1, "min_dist": d,
                         "max_dist": d})
           .groupby("dist_bucket", as_index=False)
           .agg(n_pairs=("n_pairs", "sum"), min_dist=("min_dist", "min"),
                max_dist=("max_dist", "max")))
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("dist_bucket").reset_index(drop=True)


DEDUP_T_CURVE = (0.7, 0.8, 0.9)    # thresholds the curve reports


def q_dedup_thresholds(sf_dir: str) -> pd.DataFrame:
    """Near-dup threshold-tuning curve: how many LSH-candidate pairs
    verify at Jaccard ≥ t for t ∈ {0.7, 0.8, 0.9} — from ONE candidate
    sweep and one verification pass, the curve that picks the dedup
    threshold before a corpus-scale run. (Pairs are candidate-verified:
    banding is tuned for 0.8, so the 0.7 row reports the band-recalled
    subset — the same estimate an operator tuning DOWN from 0.8 reads.)

    EXACT: verified jaccards ride the proven ``dedup_minhash`` chain
    rounded to the 1e-6 grid; per-threshold counts are integer
    comparisons on that grid.

    Ray shape: one ``dedup_minhash`` run at the lowest threshold (the
    superset), then three integer counts over the result-sized pair
    list. 3-row output → DataFrame (empty corpus → zero rows, the
    empty-safety contract)."""
    from .collect import typed_empty

    if _docs(sf_dir).count() == 0:
        return typed_empty(threshold="float64", n_pairs="int64")
    pairs = dedup_minhash(sf_dir, threshold=min(DEDUP_T_CURVE))
    rows = []
    jac = (pairs["jaccard"].to_numpy(np.float64)
           if len(pairs) else np.zeros(0))
    for t in DEDUP_T_CURVE:
        rows.append((float(t), int((jac >= t).sum())))
    out = pd.DataFrame(rows, columns=["threshold", "n_pairs"])
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out.sort_values("threshold").reset_index(drop=True)


def q_dedup_funnel(sf_dir: str) -> pd.DataFrame:
    """Dedup-pipeline funnel: how many documents each dedup stage would
    keep, measured INDEPENDENTLY on the full corpus — 'input' (all
    docs), 'exact' (distinct md5 contents), 'near_dup' (docs minus
    removable MinHash near-dup cluster members, one representative kept
    per component). The planning table that says what an exact pass
    buys vs a full MinHash pass before anyone runs either at scale.

    EXACT: the md5 distinct count resolves per combine bucket (fph
    partitions the key space, so per-bucket nunique sums are the global
    distinct count); near-dup members/components ride the proven
    ``minhash_clusters`` chain. All integers.

    Ray shape: one count, one bucketed-combine distinct count, and the
    result-sized cluster table. 3-row output → DataFrame."""
    from .collect import typed_empty
    from .combine import bucketed_combine

    empty = typed_empty(stage="object", n_kept="int64",
                        n_removed="int64")
    docs = _docs(sf_dir)
    n = docs.count()
    if n == 0:
        return empty

    def add_hash(t: pa.Table) -> pa.Table:
        md5s = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
                for x in t["text"].to_pylist()]
        fph = np.array([np.uint64(int(m[:16], 16)) for m in md5s],
                       np.uint64).view(np.int64)
        # per-batch distinct first: the combine only needs unique keys
        u = np.unique(fph)
        return pa.table({"fph": pa.array(u, pa.int64())})

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"d": np.array([g["fph"].nunique()],
                                           np.int64)})

    d = int(bucketed_combine(
        docs.map_batches(add_hash, batch_format="pyarrow",
                         batch_size=8192),
        "fph", uniq).to_pandas()["d"].sum())

    from .cluster import minhash_clusters   # function-local: cluster
    cl = minhash_clusters(sf_dir)            # imports dedup at top level
    members, clusters = len(cl), int(cl["cluster_id"].nunique())
    rows = [("exact", d, n - d),
            ("input", n, 0),
            ("near_dup", n - (members - clusters), members - clusters)]
    out = pd.DataFrame(rows, columns=["stage", "n_kept", "n_removed"])
    for c in ("n_kept", "n_removed"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("stage").reset_index(drop=True)


# --- MinHash + LSH -------------------------------------------------------------

class MinHasher:
    """Per-batch shingle→MinHash→LSH-band stage (actor: permutation params
    generated once)."""

    def __init__(self, num_perm: int = NUM_PERM, bands: int = BANDS, k: int = 3):
        rng = np.random.default_rng(1729)
        self.a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.k = k

    def _signature_from_shingles(self, sh: np.ndarray) -> np.ndarray:
        if not len(sh):
            return np.full(self.num_perm, MERSENNE, dtype=np.uint64)
        x = _mod61(sh)
        # true universal family: (a*x + b) mod p with overflow-safe modmul
        prod = _modmul61(self.a[:, None], x[None, :]) + self.b[:, None]
        prod = np.where(prod >= _P61, prod - _P61, prod)
        return prod.min(axis=1)

    def signature(self, text: str) -> np.ndarray:
        return self._signature_from_shingles(_shingle_array(text, self.k))

    def _signatures_batch(self, tok_arrays: list[np.ndarray]) -> np.ndarray:
        """(ndocs, num_perm) signature matrix for a whole batch in ONE
        permutation matmul: shingles of all docs are concatenated, hashed
        against every permutation at once, and the per-doc minima taken with
        ``minimum.reduceat`` over the doc boundaries — no per-doc Python."""
        shingle_arrays = [_shingles_from_tokens(th, self.k)
                          for th in tok_arrays]
        lens = np.array([len(s) for s in shingle_arrays], np.int64)
        sigs = np.full((len(lens), self.num_perm), MERSENNE, dtype=np.uint64)
        nz_idx = np.flatnonzero(lens)
        if not len(nz_idx):
            return sigs
        # Sub-chunk so the (shingles × num_perm) modmul temporaries stay
        # L2-resident (512 shingles → 512×256×8 B ≈ 1 MB per temp); one giant
        # matrix over the whole batch thrashes DRAM and runs 2.5× slower.
        # Shingle-major orientation: reduceat then runs over contiguous rows.
        CHUNK = 512
        nz_lens = lens[nz_idx]
        acc = 0
        bounds = [0]
        for i, ln in enumerate(nz_lens):
            acc += ln
            if acc >= CHUNK:
                bounds.append(i + 1)
                acc = 0
        if bounds[-1] != len(nz_lens):
            bounds.append(len(nz_lens))
        for g0, g1 in zip(bounds[:-1], bounds[1:]):
            idx = nz_idx[g0:g1]
            flat = np.concatenate([shingle_arrays[i] for i in idx])
            x = _mod61(flat)
            prod = _modmul61(self.a[None, :], x[:, None]) + self.b[None, :]
            prod = np.where(prod >= _P61, prod - _P61, prod)  # (sh, perm)
            starts = np.concatenate(([0], np.cumsum(nz_lens[g0:g1])[:-1]))
            sigs[idx] = np.minimum.reduceat(prod, starts, axis=0)
        return sigs

    def _band_keys(self, sigs: np.ndarray) -> np.ndarray:
        """(ndocs, bands) uint64 band keys: fmix64 of each band's
        position-weighted wraparound dot product with ``_BANDC`` (vectorized
        across all docs and bands — replaces one blake2b call per
        (doc, band), and SQL-replayable: see ``_BANDC``)."""
        chunks = sigs.reshape(len(sigs), self.bands, self.rows)
        acc = (chunks * _BANDC[: self.rows][None, None, :]).sum(
            axis=2, dtype=np.uint64)
        return _fmix64(acc)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tok_arrays = _hash_tokens_batch(batch["text"].to_pylist())
        sigs = self._signatures_batch(tok_arrays)
        keys = self._band_keys(sigs)                      # (ndocs, bands)
        ndocs = len(sigs)
        doc_ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), self.bands)
        bands = np.tile(np.arange(self.bands, dtype=np.int32), ndocs)
        return pa.table({
            "doc_id": pa.array(doc_ids),
            "band": pa.array(bands, pa.int32()),
            "band_hash": pa.array(keys.reshape(-1), pa.uint64()),
        })


def minhash_candidates(docs: Dataset,
                       band_checkpoint: str | None = None) -> Dataset:
    """documents → distinct LSH candidate pairs (a < b).

    Bucket pairing is a self-join on the band key (vectorized hash join —
    per-bucket Python loops over tens of thousands of tiny groups are the
    slow anti-pattern). Distinctness is a per-batch combiner only: pairs
    sharing several bands mostly collide inside one joined partition (the
    join co-locates equal keys), and the caller's driver-side pull — already
    O(candidates), the function's result size class — drops stragglers. A
    global distinct-aggregate here would add a second all-to-all whose only
    job is removing a handful of cross-block repeats.

    The signature stage runs as a task pool, not an actor pool: MinHasher's
    only state is 256 seeded permutation constants (microseconds to rebuild
    per task), so actor-pool startup latency buys nothing and the task form
    composes with the streaming executor's own parallelism control — the
    general rule "stateful stage = actor pool" applies when __init__ is
    *expensive* (model load, index build), which this is not.
    """
    hasher = MinHasher()
    # Self-joined, so the plan has two consumers. The materialize() is a
    # DELIBERATE pin, unlike the extract span stream (removed round 3):
    # recompute here would run the MinHash signature pass — the operator's
    # dominant cost — twice, and the pinned rows are slim fixed-width ints
    # (3 × 8 B × BANDS ≈ 400 B/doc, spillable), not document text. At
    # cluster scale prefer a parquet spool (band_checkpoint) over recompute.
    band_rows = docs.map_batches(hasher, batch_format="pyarrow",
                                 batch_size=1024)
    if band_checkpoint is not None:
        import os as _os

        ckpt = _os.path.join(band_checkpoint, "minhash_band_rows")
        band_rows.write_parquet(ckpt)
        band_rows = ray.data.read_parquet(ckpt)
    else:
        band_rows = band_rows.materialize()
    if band_rows.count() == 0:
        # Ray's hash join crashes on schema-less empty sides; an empty
        # corpus/partition is a routine condition, not an error.
        return ray.data.from_arrow(pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
    joined = band_rows.join(band_rows, join_type="inner", num_partitions=scale.join_partitions(),
                            on=("band", "band_hash"), right_suffix="_r")

    def ordered(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.less(t["doc_id"], t["doc_id_r"])
        t = t.filter(keep)
        return (pa.table({"a": t["doc_id"], "b": t["doc_id_r"]})
                .group_by(["a", "b"]).aggregate([]))  # batch-local distinct

    return joined.map_batches(ordered, batch_format="pyarrow")


JOIN_CUTOVER_PAIRS = 250_000


def dedup_minhash(sf_dir: str, threshold: float = 0.8,
                  join_cutover: int = JOIN_CUTOVER_PAIRS,
                  pair_ids: pd.DataFrame | None = None) -> pd.DataFrame:
    """Near-duplicate pairs with verified word-3-gram Jaccard ≥ threshold.

    Verification texts arrive by joining the (a, b) candidate list back to
    the documents table — but a naive hash join would shuffle the FULL
    corpus text once per side for a candidate list LSH has already pruned
    to a sliver. So first a *semi-join reduction*: the candidate doc-ids
    (ints, O(result) — the same size class as the value this function
    returns) are pulled and broadcast, docs are filtered by ``is_in`` in a
    plain scan (no shuffle), and only the matched texts enter the two hash
    joins. No whole-corpus driver materialization or broadcast (the round-1
    ``ray.put({doc_id: text})`` was a scale-killer at 10^12 docs)."""
    import pyarrow.compute as pc

    from .rounding import round_half_away

    docs = _docs(sf_dir, num_blocks=scale.read_blocks())
    if pair_ids is None:
        # int pairs only, O(candidates); global distinct happens here (the
        # banding stage dedupes per batch — see minhash_candidates).
        # Callers that already hold the distinct pair list (q_minhash_recall)
        # pass it in to skip a second candidate sweep.
        pair_ids = minhash_candidates(docs).to_pandas().drop_duplicates()
    if pair_ids.empty:  # no candidates: skip the joins (empty sides crash)
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    id_set = pa.array(np.unique(np.concatenate(
        [pair_ids["a"].to_numpy(), pair_ids["b"].to_numpy()])))

    def only_candidates(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=id_set))

    # Materialize the reduced text set (same size class as the result):
    # both attach paths consume it, and without this the read+filter scan
    # of the FULL corpus would execute once per branch.
    needed = docs.map_batches(only_candidates,
                              batch_format="pyarrow").materialize()

    # Attach texts to pairs. The candidate set is O(result) after LSH — for
    # the common case it fits the driver, and two pandas merges beat two
    # distributed hash joins whose aggregator-actor startup alone costs
    # seconds. Above the cutover the hash-join path keeps every side
    # distributed (never a whole-corpus pull — the round-1 scale-killer was
    # broadcasting ALL texts, not the candidate-filtered sliver).
    if len(pair_ids) <= join_cutover:
        ndf = needed.to_pandas()
        joined = ray.data.from_pandas(
            pair_ids
            .merge(ndf.rename(columns={"doc_id": "a", "text": "text_a"}),
                   on="a")
            .merge(ndf.rename(columns={"doc_id": "b", "text": "text_b"}),
                   on="b"))
    else:
        cands_ds = ray.data.from_pandas(pair_ids)
        docs_a = needed.rename_columns({"doc_id": "a", "text": "text_a"})
        docs_b = needed.rename_columns({"doc_id": "b", "text": "text_b"})
        joined = (cands_ds
                  .join(docs_a, join_type="inner", num_partitions=scale.join_partitions(),
                        on=("a",))
                  .join(docs_b, join_type="inner", num_partitions=scale.join_partitions(),
                        on=("b",)))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        jac = round_half_away(
            [ngram_jaccard(ta, tb)
             for ta, tb in zip(batch["text_a"], batch["text_b"])], 6)
        batch = batch.assign(jaccard=jac)
        return batch.loc[batch["jaccard"] >= threshold,
                         ["a", "b", "jaccard"]]

    df = joined.map_batches(verify, batch_format="pandas").to_pandas()
    if df.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def minhash_pairs_stream(sf_dir: str, threshold: float = 0.8,
                         cands: Dataset | None = None) -> Dataset:
    """Verified near-dup pair STREAM — the corpus-scale form of
    ``dedup_minhash``: the candidate list stays a Dataset end-to-end (no
    driver pull, no ``is_in`` id broadcast — both are O(candidates) and on
    a duplicated 100-TB crawl the candidate list grows with the corpus);
    texts attach through two distributed hash joins and verification runs
    as a map_batches over the joined stream. Returns (a, b, jaccard) with
    ``jaccard`` ≥ threshold.

    Distinctness contract: pairs are distinct only batch-locally (the
    banding stage's per-batch combiner); rare cross-block repeats verify
    to identical rows. The intended consumer — the distributed min-label
    component closure (``cluster._close_edges_distributed``) — is
    idempotent to duplicate edges, so no global distinct shuffle is spent
    here. Callers needing an exactly-distinct pair LIST should use
    ``dedup_minhash`` (driver path) or add a (a, b) groupby."""
    docs = _docs(sf_dir, num_blocks=scale.read_blocks())
    if cands is None:
        cands = minhash_candidates(docs).materialize()
    if cands.count() == 0:
        return ray.data.from_arrow(pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}))

    from .rounding import round_half_away

    docs_a = docs.rename_columns({"doc_id": "a", "text": "text_a"})
    docs_b = docs.rename_columns({"doc_id": "b", "text": "text_b"})
    joined = (cands
              .join(docs_a, join_type="inner",
                    num_partitions=scale.join_partitions(), on=("a",))
              .join(docs_b, join_type="inner",
                    num_partitions=scale.join_partitions(), on=("b",)))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        jac = round_half_away(
            [ngram_jaccard(ta, tb)
             for ta, tb in zip(batch["text_a"], batch["text_b"])], 6)
        batch = batch.assign(jaccard=jac)
        return batch.loc[batch["jaccard"] >= threshold,
                         ["a", "b", "jaccard"]]

    return joined.map_batches(verify, batch_format="pandas")


# --- exact n-gram Jaccard dedup -------------------------------------------------

def q_minhash_jaccard_est(sf_dir: str) -> pd.DataFrame:
    """MinHash Jaccard ESTIMATES for every LSH candidate pair: the count of
    agreeing permutation minima (``agree``) and ``agree/128`` — the
    estimator a web-scale dedup pipeline thresholds on before (or instead
    of) exact verification, exposed as a first-class result so its quality
    is inspectable against ``dedup_minhash``'s exact jaccard.

    Exactly SQL-oracled end-to-end: the oracle replays the full md5 →
    shingle → permutation-minima chain (the dedup_minhash machinery) and
    counts equal signature slots per candidate pair. The signature pull is
    candidate-docs-only (O(result) × 128 ints — the semi-join-reduce
    sliver, same size class as the returned pair list)."""
    from .rounding import round_half_away

    docs = _docs(sf_dir, num_blocks=scale.read_blocks())
    cands = minhash_candidates(docs).to_pandas().drop_duplicates()
    if cands.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "agree": pd.Series([], dtype="int64"),
                             "est_jaccard": pd.Series([], dtype="float64")})
    id_set = pa.array(np.unique(np.concatenate(
        [cands["a"].to_numpy(), cands["b"].to_numpy()])))
    hasher = MinHasher()

    def sigs_of_candidates(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.is_in(t["doc_id"], value_set=id_set))
        if not len(t):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.binary())})
        sigs = hasher._signatures_batch(
            _hash_tokens_batch(t["text"].to_pylist()))
        return pa.table({
            "doc_id": t["doc_id"],
            "sig": pa.array([row.tobytes() for row in sigs], pa.binary())})

    sdf = (docs.map_batches(sigs_of_candidates, batch_format="pyarrow",
                            batch_size=1024).to_pandas())
    sig_by_id = {int(d): np.frombuffer(s, np.uint64)
                 for d, s in zip(sdf["doc_id"], sdf["sig"])}
    a = cands["a"].to_numpy(np.int64)
    b = cands["b"].to_numpy(np.int64)
    agree = np.fromiter(
        (int((sig_by_id[int(x)] == sig_by_id[int(y)]).sum())
         for x, y in zip(a, b)), np.int64, count=len(a))
    df = pd.DataFrame({
        "a": a, "b": b, "agree": agree,
        "est_jaccard": round_half_away(agree / float(NUM_PERM), 6)})
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def dedup_ngram_jaccard(sf_dir: str, tau: float = 0.6, k: int = 3,
                        max_df: int | None = None) -> pd.DataFrame:
    """Exact word-k-gram Jaccard near-dup pairs (``a < b``,
    ``jaccard >= tau``) — the exhaustive counterpart of ``dedup_minhash``
    (no LSH recall loss; full SQL oracle).

    Scale shape — ALL PAIRS BY SHARED SHINGLE, no text ever crosses a
    shuffle: each doc reduces to its DISTINCT shingle-hash set once
    (case-preserving, matching the oracle's literal n-gram strings; 64-bit
    collisions are ~1e-11 at gate scale), exploded to ``(doc, n, sh)`` int
    rows. One self-join on ``sh`` co-locates equal shingles, a batch-local
    combiner pre-counts ordered pairs, and a small ``groupby(a, b)`` sums
    shared-shingle counts; jaccard comes from the carried set sizes
    (``c / (n_a + n_b - c)``). Intersection counting is exact and the pair
    list is result-sized.

    The documented scale knob is ``max_df``: dropping shingles present in
    more than ``max_df`` docs before the join caps the |group|² blowup of
    boilerplate shingles at web scale (a pair sharing ONLY ultra-common
    shingles can't reach a meaningful tau); the oracle-facing default keeps
    every shingle — exact at any tau.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Max, Sum

    from .rounding import series_round_half_away

    docs = _docs(sf_dir, num_blocks=scale.read_blocks())

    def shingle_rows(t: pa.Table) -> pa.Table:
        toks = _hash_tokens_batch(t["text"].to_pylist(), lower=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_ids, out_ns, out_sh = [], [], []
        for d, th in zip(ids, toks):
            if len(th) < k:   # oracle: docs under k tokens have no k-grams
                continue
            sh = _shingles_from_tokens(th, k)
            out_ids.append(np.full(len(sh), d, np.int64))
            out_ns.append(np.full(len(sh), len(sh), np.int64))
            # bit-identical int64 view: uint64 shuffle keys above 2^63 trip
            # Ray's aggregate rebuild into pickled-object columns
            out_sh.append(sh.view(np.int64))
        if not out_ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.int64())})
        return pa.table({"doc_id": pa.array(np.concatenate(out_ids)),
                         "n": pa.array(np.concatenate(out_ns)),
                         "sh": pa.array(np.concatenate(out_sh), pa.int64())})

    empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                          "b": pd.Series([], dtype="int64"),
                          "jaccard": pd.Series([], dtype="float64")})
    rows = docs.map_batches(shingle_rows, batch_format="pyarrow",
                            batch_size=4096)
    if max_df is not None:
        # scale knob: drop boilerplate shingles before the quadratic join
        lim = int(max_df)

        def under_df(t: pa.Table) -> pa.Table:
            return t.filter(pc.less_equal(t["count()"], lim)).select(["sh"])

        df_counts = rows.groupby("sh").count().map_batches(
            under_df, batch_format="pyarrow")
        rows = rows.join(df_counts, join_type="inner",
                         num_partitions=scale.join_partitions(), on=("sh",))
    rows = rows.materialize()   # self-joined: two consumers of one plan
    if rows.count() == 0:
        return empty

    joined = rows.join(rows, join_type="inner",
                       num_partitions=scale.join_partitions(),
                       on=("sh",), right_suffix="_r")

    def pair_counts(t: pa.Table) -> pa.Table:
        # block-local combiner (batch_size=None → whole join partition):
        # equal shingles are co-located by the join, so most of a pair's
        # incidences collapse here; what remains is one row per (pair,
        # partition-of-one-of-its-shingles)
        t = t.filter(pc.less(t["doc_id"], t["doc_id_r"]))
        return (pa.table({"a": t["doc_id"], "b": t["doc_id_r"],
                          "n_a": t["n"], "n_b": t["n_r"],
                          "c": pa.array(np.ones(t.num_rows, np.int64))})
                .group_by(["a", "b"])
                .aggregate([("n_a", "max"), ("n_b", "max"), ("c", "sum")])
                .rename_columns(["a", "b", "n_a", "n_b", "c"]))

    partials = joined.map_batches(pair_counts, batch_format="pyarrow",
                                  batch_size=None).materialize()

    # Cross-partition combine. Ray's sort-based aggregate collapses at
    # candidate-pair cardinality (measured 35-95 s for 1.2M groups at sf0.1
    # — per-group Python iteration), so below the cutover the combine is a
    # single vectorized pandas groupby over the partial rows — the same
    # O(candidates) driver size class as dedup_minhash's pair pull, and the
    # max_df knob bounds it at web scale. Above the cutover, fall back to
    # the fully distributed (slow, but never driver-resident) aggregate.
    if partials.count() <= JOIN_CUTOVER_PAIRS * 20:
        g = (partials.to_pandas()
             .groupby(["a", "b"], as_index=False, sort=False)
             .agg(n_a=("n_a", "max"), n_b=("n_b", "max"), c=("c", "sum")))
    else:  # pragma: no cover - exercised only at cluster scale
        g = (partials.groupby(["a", "b"])
             .aggregate(Max("n_a"), Max("n_b"), Sum("c")).to_pandas()
             .rename(columns={"max(n_a)": "n_a", "max(n_b)": "n_b",
                              "sum(c)": "c"}))

    c = g["c"].to_numpy(np.float64)
    jac = c / (g["n_a"].to_numpy(np.float64)
               + g["n_b"].to_numpy(np.float64) - c)
    keep = jac >= tau   # oracle filters the UNROUNDED ratio
    df = pd.DataFrame({"a": g["a"].to_numpy(np.int64),
                       "b": g["b"].to_numpy(np.int64),
                       "jaccard": series_round_half_away(
                           pd.Series(jac), 6)})[keep]
    if df.empty:
        return empty
    return df.sort_values(["a", "b"]).reset_index(drop=True)


# --- SimHash -------------------------------------------------------------------

def _simhash_from_tokens(hashes: np.ndarray) -> int:
    if not len(hashes):
        return 0
    # bit votes via unpackbits: (n, 64) 0/1 matrix without 64 shift columns
    bits = np.unpackbits(hashes[:, None].view(np.uint8), axis=1,
                         bitorder="little").astype(np.int64)
    votes = bits.sum(axis=0) * 2 - len(hashes)
    return int(((votes > 0).astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).sum())


def simhash64(text: str) -> int:
    return _simhash_from_tokens(_hash_tokens_batch([text])[0])


def _simhash_batch(tok_arrays: list[np.ndarray]) -> np.ndarray:
    """uint64 SimHash per doc for a whole batch in ONE unpackbits: token
    hashes of all docs are concatenated, bit-expanded once, and the per-doc
    bit votes taken with ``add.reduceat`` over the doc boundaries."""
    lens = np.array([len(a) for a in tok_arrays], np.int64)
    out = np.zeros(len(lens), np.uint64)
    nz_idx = np.flatnonzero(lens)
    if not len(nz_idx):
        return out
    # Sub-chunk to keep the (tokens × 64) bit matrix L2-resident (1k tokens
    # ≈ 64 KB) — one monolithic reduceat over the whole batch runs ~100×
    # slower (the same DRAM-thrash trap as MinHasher._signatures_batch).
    CHUNK = 1024
    nz_lens = lens[nz_idx]
    acc = 0
    bounds = [0]
    for i, ln in enumerate(nz_lens):
        acc += ln
        if acc >= CHUNK:
            bounds.append(i + 1)
            acc = 0
    if bounds[-1] != len(nz_lens):
        bounds.append(len(nz_lens))
    ar64 = np.arange(64, dtype=np.uint64)
    for g0, g1 in zip(bounds[:-1], bounds[1:]):
        idx = nz_idx[g0:g1]
        flat = np.concatenate([tok_arrays[i] for i in idx])
        bits = np.unpackbits(flat[:, None].view(np.uint8), axis=1,
                             bitorder="little")               # (n, 64) uint8
        starts = np.concatenate(([0], np.cumsum(nz_lens[g0:g1])[:-1]))
        sums = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
        votes = sums * 2 - nz_lens[g0:g1][:, None]
        out[idx] = ((votes > 0).astype(np.uint64) << ar64).sum(axis=1)
    return out


def simhash_signatures(sf_dir: str) -> Dataset:
    from .collect import ensure_schema

    def sig(t: pa.Table) -> pa.Table:
        hs = _simhash_batch(_hash_tokens_batch(t["text"].to_pylist()))
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array([f"{h:016x}" for h in hs], pa.string())})
    return ensure_schema(
        _docs(sf_dir, num_blocks=scale.read_blocks(0.25)).map_batches(
            sig, batch_format="pyarrow", batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("simhash", pa.string())]))


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash Hamming ≤ max_hamming, blocked on 16-bit
    chunks (pigeonhole: Hamming ≤ 3 ⇒ ≥1 of 4 chunks identical)."""

    def sig_and_explode(t: pa.Table) -> pa.Table:
        hs = _simhash_batch(_hash_tokens_batch(t["text"].to_pylist()))
        ndocs = len(hs)
        hexes = np.array([f"{h:016x}" for h in hs], dtype=object)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        vals = ((hs[:, None] >> shifts[None, :])
                & np.uint64(0xFFFF)).astype(np.int32)          # (docs, 4)
        return pa.table({
            "doc_id": pa.array(np.repeat(
                t["doc_id"].to_numpy(zero_copy_only=False), 4)),
            "chunk": pa.array(np.tile(np.arange(4, dtype=np.int32), ndocs)),
            "val": pa.array(vals.reshape(-1), pa.int32()),
            "simhash": pa.array(np.repeat(hexes, 4), pa.string())})

    chunk_rows = (_docs(sf_dir, num_blocks=scale.read_blocks())
                  .map_batches(sig_and_explode, batch_format="pyarrow",
                               batch_size=8192)
                  .materialize())
    if chunk_rows.count() == 0:  # empty corpus: skip the self-join
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    joined = chunk_rows.join(chunk_rows, join_type="inner", num_partitions=scale.join_partitions(),
                             on=("chunk", "val"), right_suffix="_r")

    def _hex16_to_u64(strs: list[str]) -> np.ndarray:
        # vectorized hex parse: ASCII nibbles -> values -> base-16 dot
        if not strs:
            return np.array([], dtype=np.uint64)
        b = np.array(strs, dtype="S16").view(np.uint8).reshape(-1, 16)
        v = np.where(b >= 97, b - 87, b - 48).astype(np.uint64)
        powers = np.uint64(16) ** np.arange(15, -1, -1, dtype=np.uint64)
        return (v * powers).sum(axis=1, dtype=np.uint64)

    def verify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.less(t["doc_id"], t["doc_id_r"]))
        ua = _hex16_to_u64(t["simhash"].to_pylist())
        ub = _hex16_to_u64(t["simhash_r"].to_pylist())
        # vectorized popcount of the XOR (no np.bitwise_count on numpy 1.x)
        ham = np.unpackbits((ua ^ ub).view(np.uint8)).reshape(-1, 64).sum(
            axis=1).astype(np.int64) if len(ua) else np.array([], np.int64)
        keep = ham <= max_hamming
        # batch-local distinct only: a pair matching on several chunks mostly
        # lands in one joined partition; the driver-side drop_duplicates is
        # O(result) and replaces a whole groupby all-to-all whose only job
        # was removing those repeats (hamming is pair-deterministic, so no
        # Min-combine is needed).
        return (pa.table({
            "a": t["doc_id"].to_numpy(zero_copy_only=False)[keep],
            "b": t["doc_id_r"].to_numpy(zero_copy_only=False)[keep],
            "hamming": pa.array(ham[keep], pa.int64())})
            .group_by(["a", "b", "hamming"]).aggregate([]))

    df = (joined.map_batches(verify, batch_format="pyarrow")
                .to_pandas().drop_duplicates())
    if df.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    return df.sort_values(["a", "b"]).reset_index(drop=True)


# --- exact duplicated-substring detection (suffix-array-style dedup) -----------

SUBSTR_K = 4                          # window length in words
SUBSTR_MIN_COUNT = 2                  # corpus occurrences to call a span dup
SUBSTR_BROADCAST_CUTOVER = 250_000    # dup-vocab rows above which we join

# Position multipliers for arbitrary k (the _POS tuple stops at 3): odd
# splitmix64 outputs of the position index, deterministic.
_POSK = _fmix64(np.arange(1, 64, dtype=np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)


def _gram_hashes_all(th: np.ndarray, k: int) -> np.ndarray:
    """ALL positional k-gram hashes of a token-hash array — one per window,
    duplicates preserved (unlike ``_shingles_from_tokens``, which dedups):
    occurrence counting needs every position."""
    n = len(th)
    if n < k:
        return np.array([], dtype=np.uint64)
    acc = th[: n - k + 1] * _POSK[0]
    for i in range(1, k):
        acc = acc + th[i: n - k + 1 + i] * _POSK[i]
    return _fmix64(acc)


def _dup_gram_vocab(docs: Dataset, k: int, min_count: int) -> Dataset:
    """Materialized (h) table of k-gram content hashes occurring
    ≥ min_count times corpus-wide — the shared count pass of the
    duplicated-substring DETECTION and REMOVAL operators. Per-batch
    ``np.unique`` pre-counts, one bucketed int-only combine."""
    from .combine import bucketed_combine

    def partial_counts(t: pa.Table) -> pa.Table:
        hs = [_gram_hashes_all(th, k)
              for th in _hash_tokens_batch(t["text"].to_pylist())]
        flat = (np.concatenate(hs) if hs else np.array([], np.uint64))
        if flat.size == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        u, c = np.unique(flat, return_counts=True)
        return pa.table({"h": pa.array(u.view(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    def sum_filter(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("h", as_index=False).agg(n=("n", "sum"))
        return out.loc[out["n"] >= min_count, ["h"]]

    return bucketed_combine(
        docs.map_batches(partial_counts, batch_format="pyarrow",
                         batch_size=8192),
        "h", sum_filter).materialize()


def dedup_substring(sf_dir: str, k: int = SUBSTR_K,
                    min_count: int = SUBSTR_MIN_COUNT,
                    broadcast_cutover: int = SUBSTR_BROADCAST_CUTOVER
                    ) -> Dataset:
    """Exact duplicated-substring detection — the document-level summary of
    the suffix-array dedup pass of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better", arXiv:2107.06499): every word
    ``k``-gram window whose content occurs ≥ ``min_count`` times corpus-wide
    is a duplicated span. Per document: window count, duplicated-window
    count, duplicated fraction.

    Dataflow (three streaming passes, int-only shuffles):

    1. *count*: per-batch token-vocabulary hashing (blake2b once per
       distinct token) + positional k-gram mixing gives every window a
       64-bit content hash; per-batch ``np.unique`` pre-counts, so the one
       corpus shuffle is a bucketed combine over (int64 h, int64 n) rows —
       text never crosses the wire. A raw ``groupby(h)`` would pay Ray's
       per-group Python floor over ~O(corpus) distinct grams; the bucketed
       combine does one vectorized pandas sum per bucket.
    2. *vocabulary*: grams with total count ≥ min_count. Below
       ``broadcast_cutover`` rows it is ``ray.put`` ONCE as a sorted int64
       array and probed per batch with ``searchsorted`` (the
       q_contamination shape); above, it stays distributed and the exploded
       (doc_id, h, m) stream hash-joins against it instead.
    3. *score*: one streaming re-scan emits (doc_id, n_grams, n_dup,
       dup_frac) per document — recomputing window hashes is cheaper than
       pinning the exploded gram stream in the object store.

    64-bit hash collisions merge distinct grams at ~n²/2⁶⁴ probability
    (≈1e-5 at 10⁹ windows) — the same accepted tradeoff as
    q_contamination's oracle. Output is per-document → streaming Dataset."""
    from .collect import ensure_schema
    from .combine import bucketed_combine
    from .rounding import round_half_away

    docs = _docs(sf_dir, num_blocks=scale.read_blocks())
    dup_ds = _dup_gram_vocab(docs, k, min_count)
    n_vocab = dup_ds.count()

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_grams", pa.int64()),
        ("n_dup", pa.int64()), ("dup_frac", pa.float64())])

    if n_vocab <= broadcast_cutover:
        dup_pd = dup_ds.to_pandas()
        # empty corpus: the combine never ran → no "h" column at all
        dup_arr = (np.sort(dup_pd["h"].to_numpy(np.int64))
                   if "h" in dup_pd.columns else np.array([], np.int64))
        dup_ref = ray.put(dup_arr)

        def score(t: pa.Table) -> pa.Table:
            dup = ray.get(dup_ref)
            hs = [_gram_hashes_all(th, k)
                  for th in _hash_tokens_batch(t["text"].to_pylist())]
            lens = np.array([len(x) for x in hs], np.int64)
            flat = (np.concatenate(hs).view(np.int64) if hs
                    else np.array([], np.int64))
            if len(dup) and flat.size:
                pos = np.minimum(np.searchsorted(dup, flat), len(dup) - 1)
                hit = dup[pos] == flat
            else:
                hit = np.zeros(flat.size, bool)
            doc_idx = np.repeat(np.arange(len(lens)), lens)
            n_dup = np.bincount(doc_idx, weights=hit,
                                minlength=len(lens)).astype(np.int64)
            frac = round_half_away(n_dup / np.maximum(lens, 1), 6)
            return pa.table({
                "doc_id": t["doc_id"],
                "n_grams": pa.array(lens, pa.int64()),
                "n_dup": pa.array(n_dup, pa.int64()),
                "dup_frac": pa.array(frac, pa.float64())})

        return ensure_schema(
            docs.map_batches(score, batch_format="pyarrow",
                             batch_size=8192), out_schema)

    # distributed fallback: the dup vocabulary is too large to broadcast.
    def doc_gram_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hs = [_gram_hashes_all(th, k)
              for th in _hash_tokens_batch(t["text"].to_pylist())]
        rows_id, rows_h, rows_m = [], [], []
        for i, grams in enumerate(hs):
            if grams.size == 0:
                continue
            u, c = np.unique(grams, return_counts=True)
            rows_id.append(np.full(len(u), ids[i], np.int64))
            rows_h.append(u.view(np.int64))
            rows_m.append(c.astype(np.int64))
        if not rows_id:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64()),
                             "m": pa.array([], pa.int64())})
        return pa.table({"doc_id": pa.array(np.concatenate(rows_id)),
                         "h": pa.array(np.concatenate(rows_h)),
                         "m": pa.array(np.concatenate(rows_m))})

    gram_rows = docs.map_batches(doc_gram_rows, batch_format="pyarrow",
                                 batch_size=8192)
    hits = gram_rows.join(dup_ds, join_type="inner",
                          num_partitions=scale.join_partitions(), on=("h",))

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(n_dup=("m", "sum"))
        out["n_dup"] = out["n_dup"].astype(np.int64)
        return out[["doc_id", "n_dup"]]

    ndup_ds = bucketed_combine(hits, "doc_id", per_doc)

    def base_counts(t: pa.Table) -> pa.Table:
        lens = np.array(
            [max(len(th) - k + 1, 0)
             for th in _hash_tokens_batch(t["text"].to_pylist())], np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_grams": pa.array(lens, pa.int64())})

    base = docs.map_batches(base_counts, batch_format="pyarrow",
                            batch_size=8192)
    joined = base.join(ndup_ds, join_type="left_outer",
                       num_partitions=scale.join_partitions(),
                       on=("doc_id",))

    def finish(t: pa.Table) -> pa.Table:
        nd = np.nan_to_num(
            t["n_dup"].to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        ng = t["n_grams"].to_numpy(zero_copy_only=False)
        frac = round_half_away(nd / np.maximum(ng, 1), 6)
        return pa.table({"doc_id": t["doc_id"], "n_grams": t["n_grams"],
                         "n_dup": pa.array(nd, pa.int64()),
                         "dup_frac": pa.array(frac, pa.float64())})

    return ensure_schema(
        joined.map_batches(finish, batch_format="pyarrow"), out_schema)


# --- exact duplicated-substring REMOVAL ------------------------------------------

def _remove_covered(toks: list, hit: np.ndarray, k: int) -> tuple:
    """Drop tokens covered by any duplicated window start. ``hit`` is the
    per-start dup flag array (len = n-k+1). Returns (kept_tokens,
    n_removed). Vectorized sliding-OR via difference of cumsums: token p is
    covered iff any start in [p-k+1, p] (clipped to valid starts) is dup."""
    n = len(toks)
    if n < k or not hit.any():
        return toks, 0
    cs = np.concatenate([[0], np.cumsum(hit.astype(np.int64))])
    p = np.arange(n)
    lo = np.clip(p - k + 1, 0, None)
    hi = np.minimum(p, n - k)
    covered = (hi >= lo) & (cs[hi + 1] - cs[lo] > 0)
    kept = [t for t, c in zip(toks, covered) if not c]
    return kept, int(covered.sum())


def dedup_substring_remove(
        sf_dir: str, k: int = SUBSTR_K,
        min_count: int = SUBSTR_MIN_COUNT,
        broadcast_cutover: int = SUBSTR_BROADCAST_CUTOVER) -> Dataset:
    """Exact duplicated-substring REMOVAL — the rewrite half of Lee et al.
    2022 (arXiv:2107.06499): every token covered by a word-``k``-gram
    window whose content occurs ≥ ``min_count`` times corpus-wide is
    excised, and the document is reassembled from the surviving tokens
    (canonical lowercase-token form). ``dedup_substring`` reports the
    damage; this operator performs the surgery.

    Dataflow: the shared ``_dup_gram_vocab`` count pass builds the
    duplicated-gram table (int-only bucketed combine); below
    ``broadcast_cutover`` it broadcasts as a sorted int64 array and one
    streaming re-scan rewrites each document (sliding-window cover via
    difference-of-cumsums — no per-token Python); above, the exploded
    (doc_id, start, h) stream hash-joins the vocabulary, dup STARTS are
    list-collected per doc (bucketed combine), joined back to the
    documents table, and the same rewrite runs per row. Output carries
    md5(clean text) so the corpus-sized compare moves digests. Exact
    DuckDB oracle (gram strings + window-cover replay)."""
    from .collect import ensure_schema
    from .combine import bucketed_combine

    docs = _docs(sf_dir, num_blocks=scale.read_blocks())
    dup_ds = _dup_gram_vocab(docs, k, min_count)
    n_vocab = dup_ds.count()

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
        ("n_removed", pa.int64()), ("clean_md5", pa.string())])

    def _emit(ids, tok_lists, hits) -> pa.Table:
        import hashlib

        n_tok, n_rm, digests = [], [], []
        for toks, hit in zip(tok_lists, hits):
            kept, removed = _remove_covered(toks, hit, k)
            n_tok.append(len(toks))
            n_rm.append(removed)
            digests.append(hashlib.md5(
                " ".join(kept).encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": ids,
            "n_tokens": pa.array(np.array(n_tok, np.int64)),
            "n_removed": pa.array(np.array(n_rm, np.int64)),
            "clean_md5": pa.array(digests, pa.string())})

    if n_vocab <= broadcast_cutover:
        dup_pd = dup_ds.to_pandas()
        dup_arr = (np.sort(dup_pd["h"].to_numpy(np.int64))
                   if "h" in dup_pd.columns else np.array([], np.int64))
        dup_ref = ray.put(dup_arr)

        def clean(t: pa.Table) -> pa.Table:
            dup = ray.get(dup_ref)
            texts = t["text"].to_pylist()
            tok_lists = [(s or "").lower().split() for s in texts]
            hits = []
            for th in _hash_tokens_batch(texts):
                hs = _gram_hashes_all(th, k).view(np.int64)
                if len(dup) and hs.size:
                    pos = np.minimum(np.searchsorted(dup, hs),
                                     len(dup) - 1)
                    hits.append(dup[pos] == hs)
                else:
                    hits.append(np.zeros(hs.size, bool))
            return _emit(t["doc_id"], tok_lists, hits)

        return ensure_schema(
            docs.map_batches(clean, batch_format="pyarrow",
                             batch_size=8192), out_schema)

    # distributed fallback: dup vocabulary too large to broadcast — ship
    # (doc_id, start, h) gram rows through a hash join instead, collect
    # each doc's dup starts, and join them back to the documents table.
    def gram_start_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_i, out_h = [], [], []
        for j, th in enumerate(_hash_tokens_batch(t["text"].to_pylist())):
            hs = _gram_hashes_all(th, k)
            if hs.size == 0:
                continue
            out_id.append(np.full(hs.size, ids[j], np.int64))
            out_i.append(np.arange(hs.size, dtype=np.int64))
            out_h.append(hs.view(np.int64))
        if not out_id:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        return pa.table({"doc_id": pa.array(np.concatenate(out_id)),
                         "i": pa.array(np.concatenate(out_i)),
                         "h": pa.array(np.concatenate(out_h))})

    starts = (docs.map_batches(gram_start_rows, batch_format="pyarrow",
                               batch_size=8192)
              .join(dup_ds, join_type="inner",
                    num_partitions=scale.join_partitions(), on=("h",)))

    def collect_starts(g: pd.DataFrame) -> pd.DataFrame:
        # packed int64 bytes, not list<int64>: Acero's hash join rejects
        # list-typed non-key payload columns
        agg = (g.groupby("doc_id")["i"]
               .agg(lambda v: np.sort(v.to_numpy(np.int64)).tobytes())
               .reset_index().rename(columns={"i": "starts"}))
        return agg

    starts_ds = bucketed_combine(starts, "doc_id", collect_starts)
    joined = docs.join(starts_ds, join_type="left_outer",
                       num_partitions=scale.join_partitions(),
                       on=("doc_id",))

    def clean_joined(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        tok_lists = [(s or "").lower().split() for s in texts]
        starts_col = t["starts"].to_pylist()
        hits = []
        for toks, st in zip(tok_lists, starts_col):
            n_starts = max(len(toks) - k + 1, 0)
            hit = np.zeros(n_starts, bool)
            if st is not None and n_starts:
                idx = np.frombuffer(st, np.int64)
                hit[idx[(idx >= 0) & (idx < n_starts)]] = True
            hits.append(hit)
        return _emit(t["doc_id"], tok_lists, hits)

    return ensure_schema(
        joined.map_batches(clean_joined, batch_format="pyarrow"),
        out_schema)


# --- exact edit-distance similarity join (PassJoin) ---------------------------

EDIT_D = 3            # byte-level Levenshtein threshold


def _edit_distance_bytes(a: bytes, b: bytes) -> int:
    """Exact byte-level Levenshtein distance (unit costs), matching
    DuckDB's ``levenshtein`` (which operates on the UTF-8 OCTETS:
    ``levenshtein('blåbær','blaber') = 4``, not the character-level 2).
    Row-vectorized DP: the sequential insertion recurrence
    ``cur[j] <= cur[j-1] + 1`` is closed with one prefix-min over
    ``cur - j`` (f[j] = cur[j] - j is non-increasing under insertion
    chains), so each of the |a| rows is O(|b|) numpy ops."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    n = len(b)
    bb = np.frombuffer(b, dtype=np.uint8)
    j = np.arange(n + 1, dtype=np.int64)
    prev = j.copy()
    cur = np.empty(n + 1, np.int64)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (bb != ca), out=cur[1:])
        cur = np.minimum.accumulate(cur - j) + j
        prev, cur = cur, prev
    return int(prev[n])


def _ed_segments(L: int, d: int) -> list[tuple[int, int]]:
    """Even partition of ``[0, L)`` into ``d + 1`` (start, length) segments;
    the first ``L mod (d+1)`` segments carry the extra byte. Both the index
    and the probe side derive positions from this one rule."""
    k = d + 1
    base, extra = divmod(L, k)
    out, p = [], 0
    for i in range(k):
        m = base + (1 if i < extra else 0)
        out.append((p, m))
        p += m
    return out


def _ed_key(seg_i: int, src_len: int, sub: bytes) -> int:
    """int64 join key for a (segment index, source length, substring)
    triple. Collisions only MERGE candidate buckets — verification culls
    every candidate with a full DP, so exactness is preserved."""
    h = hashlib.md5(bytes((seg_i,)) + src_len.to_bytes(4, "big") + sub)
    return int.from_bytes(h.digest()[:8], "big") - (1 << 63)


def dedup_edit_distance(sf_dir: str, d: int = EDIT_D) -> pd.DataFrame:
    """Exact edit-distance similarity self-join over the DISTINCT
    ``part.p_name`` values: every unordered pair of distinct names within
    byte-Levenshtein distance ``d`` (columns ``name_a < name_b``,
    ``dist``). The typo-clustering operator for a string column at corpus
    scale, shaped as:

    1. **distinct-reduce** — the raw column (every part row) collapses to
       its vocabulary first (batch-local distinct + one groupby), so all
       downstream work is vocab-sized, not corpus-sized;
    2. **pigeonhole blocking** (PassJoin, Li/Deng/Feng, VLDB'11): each
       name is split into ``d + 1`` byte segments; ``ed(s, t) <= d``
       forces at least one segment of ``s`` to appear EXACTLY in ``t``,
       start position shifted by at most ``d``. The index side emits its
       ``d + 1`` segment keys; the probe side emits every substring of
       the matching length within the position window, for every
       candidate source length in ``[len(t) - d, len(t) + d]``. One
       distributed hash join on the int64 segment key replaces the
       all-pairs cross product (names of byte-length < d + 1 fall back
       to a short-string key: some segment is empty, so every
       length-compatible pair must meet);
    3. **DP verification**: each candidate pair is checked with the exact
       byte-level Levenshtein DP — blocking is lossless (a superset), so
       the result equals the brute-force join the DuckDB oracle runs.

    The candidate pair list is result-sized (vocab pairs sharing a
    segment), so the distinct + verify step runs on the driver below the
    established pair cutover, mirroring ``dedup_minhash``."""
    import pyarrow.compute as pc

    path = f"{sf_dir}/part.parquet"
    names_ds = ray.data.read_parquet(
        path, columns=["p_name"],
        override_num_blocks=scale.read_blocks_for_path(path))

    def local_distinct(t: pa.Table) -> pa.Table:
        col = pc.drop_null(t["p_name"]).unique()
        return pa.table({"p_name": col})

    distinct = (names_ds.map_batches(local_distinct, batch_format="pyarrow")
                .groupby("p_name").count().select_columns(["p_name"])
                .materialize())     # vocab-sized; two consumers below

    empty = pd.DataFrame({"name_a": pd.Series([], dtype="object"),
                          "name_b": pd.Series([], dtype="object"),
                          "dist": pd.Series([], dtype="int64")})
    if distinct.count() == 0:
        return empty

    k = d + 1

    def index_rows(t: pa.Table) -> pa.Table:
        keys, names = [], []
        for s in t["p_name"].to_pylist():
            sb = s.encode("utf-8")
            L = len(sb)
            if L < k:       # some segment empty: short-string bucket
                keys.append(_ed_key(255, L, b""))
                names.append(s)
                continue
            for i, (p, m) in enumerate(_ed_segments(L, d)):
                keys.append(_ed_key(i, L, sb[p:p + m]))
                names.append(s)
        return pa.table({"key": pa.array(keys, pa.int64()),
                         "iname": pa.array(names, pa.string())})

    def probe_rows(t: pa.Table) -> pa.Table:
        keys, names = [], []
        for s in t["p_name"].to_pylist():
            tb = s.encode("utf-8")
            lt = len(tb)
            seen = set()
            for l in range(max(lt - d, 0), lt + d + 1):
                if l < k:   # pair with short indexed strings
                    seen.add(_ed_key(255, l, b""))
                    continue
                for i, (p, m) in enumerate(_ed_segments(l, d)):
                    lo = max(0, p - d)
                    hi = min(lt - m, p + d)
                    for q in range(lo, hi + 1):
                        seen.add(_ed_key(i, l, tb[q:q + m]))
            keys.extend(seen)
            names.extend([s] * len(seen))
        return pa.table({"key": pa.array(keys, pa.int64()),
                         "pname": pa.array(names, pa.string())})

    idx = distinct.map_batches(index_rows, batch_format="pyarrow")
    prb = distinct.map_batches(probe_rows, batch_format="pyarrow")
    joined = idx.join(prb, join_type="inner",
                      num_partitions=scale.join_partitions(), on=("key",))

    def local_pairs(t: pa.Table) -> pa.Table:
        # batch-local normalize + distinct: candidate pairs are vocab-pair
        # sized; most duplicates (one per shared segment key) collapse here
        a = t["iname"].to_pylist()
        b = t["pname"].to_pylist()
        pairs = {(x, y) if x < y else (y, x)
                 for x, y in zip(a, b) if x != y}
        pairs = sorted(pairs)
        return pa.table({"name_a": pa.array([p[0] for p in pairs]),
                         "name_b": pa.array([p[1] for p in pairs])})

    cand = (joined.map_batches(local_pairs, batch_format="pyarrow",
                               batch_size=None)
            .to_pandas().drop_duplicates(ignore_index=True))

    if cand.empty:
        return empty
    dists = np.fromiter(
        (_edit_distance_bytes(x.encode("utf-8"), y.encode("utf-8"))
         for x, y in zip(cand["name_a"], cand["name_b"])),
        dtype=np.int64, count=len(cand))
    out = cand.loc[dists <= d].copy()
    out["dist"] = dists[dists <= d]
    return out.sort_values(["name_a", "name_b"]).reset_index(drop=True)


# --- MinHash candidate-quality evaluation ----------------------------------------

def q_minhash_recall(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    """Recall/precision of the MinHash-LSH candidate generator against the
    EXACT Jaccard ground truth — the eval every web-scale dedup deployment
    runs before trusting its band/row parameters (Leskovec et al., MMDS
    ch.3): n_truth = all pairs with verified jaccard ≥ threshold over the
    exhaustive shingle self-join, n_cand = distinct LSH candidates,
    n_verified = candidates passing verification (= truth ∩ candidates,
    since both use the same rounded-jaccard rule), recall =
    n_verified / n_truth, precision = n_verified / n_cand.

    All three counts are integers and the two ratios are single
    int→double divisions, so the whole report is exactly SQL-oracled —
    the oracle composes the full MinHash replay chain (md5 shingles →
    mod-p permutation minima → band keys → bucket self-join) with the
    literal-gram exhaustive self-join, over the SAME lowered token-gram
    space (including the <k-token partial gram the signature path hashes).

    Ray shape: the candidate and verified counts ride the existing
    ``minhash_candidates`` / ``dedup_minhash`` pipelines (O(result) driver
    pulls by their own contracts); ground truth is the
    ``dedup_ngram_jaccard`` all-pairs-by-shared-shingle blocking — one
    shingle self-join, a block-local pair-count combiner, and a
    candidate-pair-sized final combine. Empty corpus → zero rows (both
    sides)."""
    from .rounding import round_half_away

    docs = _docs(sf_dir, num_blocks=scale.read_blocks())
    empty = pd.DataFrame({"n_truth": pd.Series([], dtype="int64"),
                          "n_cand": pd.Series([], dtype="int64"),
                          "n_verified": pd.Series([], dtype="int64"),
                          "recall": pd.Series([], dtype="float64"),
                          "precision": pd.Series([], dtype="float64")})
    if docs.count() == 0:
        return empty

    # ground truth: exhaustive shingle-blocked exact jaccard on the
    # SIGNATURE gram space (lower=True + partial gram — unlike
    # dedup_ngram_jaccard's case-preserving k≥3 grams)
    def shingle_rows(t: pa.Table) -> pa.Table:
        toks = _hash_tokens_batch(t["text"].to_pylist(), lower=True)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_ids, out_ns, out_sh = [], [], []
        for d, th in zip(ids, toks):
            if len(th) == 0:
                continue
            sh = _shingles_from_tokens(th)
            out_ids.append(np.full(len(sh), d, np.int64))
            out_ns.append(np.full(len(sh), len(sh), np.int64))
            out_sh.append(sh.view(np.int64))
        if not out_ids:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.int64())})
        return pa.table({"doc_id": pa.array(np.concatenate(out_ids)),
                         "n": pa.array(np.concatenate(out_ns)),
                         "sh": pa.array(np.concatenate(out_sh), pa.int64())})

    def truth_count() -> int:
        rows = docs.map_batches(shingle_rows, batch_format="pyarrow",
                                batch_size=4096).materialize()
        if rows.count() == 0:
            return 0
        import pyarrow.compute as pc

        joined = rows.join(rows, join_type="inner",
                           num_partitions=scale.join_partitions(),
                           on=("sh",), right_suffix="_r")

        def pair_counts(t: pa.Table) -> pa.Table:
            # block-local combiner (see dedup_ngram_jaccard)
            t = t.filter(pc.less(t["doc_id"], t["doc_id_r"]))
            return (pa.table({"a": t["doc_id"], "b": t["doc_id_r"],
                              "n_a": t["n"], "n_b": t["n_r"],
                              "c": pa.array(np.ones(t.num_rows,
                                                    np.int64))})
                    .group_by(["a", "b"])
                    .aggregate([("n_a", "max"), ("n_b", "max"),
                                ("c", "sum")])
                    .rename_columns(["a", "b", "n_a", "n_b", "c"]))

        g = (joined.map_batches(pair_counts, batch_format="pyarrow",
                                batch_size=None).to_pandas()
             .groupby(["a", "b"], as_index=False, sort=False)
             .agg(n_a=("n_a", "max"), n_b=("n_b", "max"), c=("c", "sum")))
        if not len(g):
            return 0
        c = g["c"].to_numpy(np.float64)
        jac = round_half_away(
            c / (g["n_a"].to_numpy(np.float64)
                 + g["n_b"].to_numpy(np.float64) - c), 6)
        return int((jac >= threshold).sum())

    # The truth chain shares nothing with the candidate chain, so it runs
    # on a second driver thread — Ray datasets execute independently and
    # the streaming executor interleaves both pipelines' tasks (measured
    # ~5.5 s → ~4 s at sf0.1; results are unchanged by construction:
    # both consumers only return counts).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        truth_fut = pool.submit(truth_count)
        pair_ids = minhash_candidates(docs).to_pandas().drop_duplicates()
        n_cand = len(pair_ids)
        n_verified = len(dedup_minhash(sf_dir, threshold=threshold,
                                       pair_ids=pair_ids))
        n_truth = truth_fut.result()

    recall = (1.0 if n_truth == 0 else
              round_half_away(n_verified / float(n_truth), 6))
    precision = (1.0 if n_cand == 0 else
                 round_half_away(n_verified / float(n_cand), 6))
    return pd.DataFrame({
        "n_truth": np.array([n_truth], np.int64),
        "n_cand": np.array([n_cand], np.int64),
        "n_verified": np.array([n_verified], np.int64),
        "recall": np.array([recall], np.float64),
        "precision": np.array([precision], np.float64)})


def q_lsh_bucket_stats(sf_dir: str) -> pd.DataFrame:
    """Band-bucket size distribution of the MinHash LSH index — the skew
    diagnostic that decides banding parameters before a web-scale dedup
    run: a bucket of size s costs s² candidate pairs, so the tail of this
    histogram IS the shuffle hot-spot forecast (and the signal for
    salting or df-capping boilerplate). Rows: (band, bucket_size,
    n_buckets) — all integers, exactly oracle-replayable via the same
    band-key chain the candidate generator uses.

    Ray shape: the MinHasher streaming pass (signatures → band keys),
    then ONE key-bucketed combine: a (band, band_hash) bucket lives whole
    in its combine bucket, so its size is final there and each combine
    bucket emits a LOCAL (band, size) histogram partial — the final
    groupby folds ≤ bands × max_size tiny rows. The band-key space never
    reaches the driver."""
    from .combine import bucketed_combine

    docs = _docs(sf_dir, num_blocks=scale.read_blocks())
    hasher = MinHasher()
    rows = docs.map_batches(hasher, batch_format="pyarrow",
                            batch_size=1024)

    def to_key(t: pa.Table) -> pa.Table:
        bh = t["band_hash"].to_numpy(zero_copy_only=False).view(np.int64)
        return pa.table({
            "band": t["band"].to_numpy(zero_copy_only=False).astype(
                np.int64),
            "bh": pa.array(bh, pa.int64())})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        sizes = (g.groupby(["band", "bh"], as_index=False).size()
                 .rename(columns={"size": "bucket_size"}))
        out = (sizes.groupby(["band", "bucket_size"], as_index=False)
               .size().rename(columns={"size": "n_buckets"}))
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    from ray.data.aggregate import Sum

    df = (bucketed_combine(
        rows.map_batches(to_key, batch_format="pyarrow"), "bh", fold)
        .groupby(["band", "bucket_size"])
        .aggregate(Sum("n_buckets", alias_name="n_buckets")).to_pandas())
    if df.empty:
        return pd.DataFrame({"band": pd.Series([], dtype="int64"),
                             "bucket_size": pd.Series([], dtype="int64"),
                             "n_buckets": pd.Series([], dtype="int64")})
    for c in ("band", "bucket_size", "n_buckets"):
        df[c] = df[c].astype(np.int64)
    return (df[["band", "bucket_size", "n_buckets"]]
            .sort_values(["band", "bucket_size"]).reset_index(drop=True))


def q_incremental_dedup(sf_dir: str) -> "ray.data.Dataset":
    """INCREMENTAL dedup — the production ingest shape: a new crawl delta
    is checked against the existing base corpus (here the md5 doc-id
    split: bucket ≥ 90 is the delta, < 90 the base). Per delta doc:
    ``exact_dup`` (its text md5 exists in the base) and ``near_cand``
    (it shares a MinHash band bucket with a base doc — the LSH candidate
    probe an incremental pipeline runs before exact verification).

    All decisions integer/EXISTS — exactly SQL-oracled via the shared
    band-key replay chain.

    Ray shape (what makes incremental different from full-corpus dedup):
    the base never pairs with itself — each fingerprint/band-key bucket
    only answers "does the base occupy this key" (a ``max`` flag) and
    flags the delta rows in the same bucket, so the exchange is one
    key-bucketed combine per probe (no base×base quadratic work, no
    driver pull of anything base-sized); the per-delta-doc fold is a
    second delta-sized bucketed combine. Output is delta-sized →
    streaming Dataset."""
    from .collect import ensure_schema
    from .combine import bucketed_combine
    from .mlprep import _md5_bucket

    docs = _docs(sf_dir, num_blocks=scale.read_blocks())
    schema = pa.schema([("doc_id", pa.int64()), ("exact_dup", pa.int64()),
                        ("near_cand", pa.int64())])
    hasher = MinHasher()

    def probe_rows(t: pa.Table) -> pa.Table:
        """(key, doc_id, is_base, kind) rows: kind 0 = text-md5
        fingerprint (one per doc), kind 1 = band key (BANDS per doc)."""
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        if not ids:
            return pa.table({"key": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "is_base": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.int64())})
        is_delta = np.fromiter((_md5_bucket(int(d)) >= 90 for d in ids),
                               bool, count=len(ids))
        fph = np.fromiter((_md5_64(x or "") for x in texts), np.uint64,
                          count=len(texts)).view(np.int64)
        sigs = hasher._signatures_batch(_hash_tokens_batch(texts))
        bands = hasher._band_keys(sigs).view(np.int64)  # (ndocs, BANDS)
        nb = bands.shape[1]
        ids_np = np.asarray(ids, np.int64)
        # `key` only routes bucketing; equality is decided on the full
        # (kind, band, key) tuple in key_probe, so cross-domain or
        # cross-band hash collisions cost locality, never correctness
        return pa.table({
            "key": pa.array(np.concatenate([fph, bands.reshape(-1)])),
            "band": pa.array(np.concatenate(
                [np.full(len(ids_np), -1, np.int64),
                 np.tile(np.arange(nb, dtype=np.int64), len(ids_np))])),
            "doc_id": pa.array(np.concatenate(
                [ids_np, np.repeat(ids_np, nb)])),
            "is_base": pa.array(np.concatenate(
                [~is_delta, np.repeat(~is_delta, nb)]).astype(np.int64)),
            "kind": pa.array(np.concatenate(
                [np.zeros(len(ids_np), np.int64),
                 np.ones(len(ids_np) * nb, np.int64)]))})

    def key_probe(g: pd.DataFrame) -> pd.DataFrame:
        """Per (kind, band, key): does the base occupy it? Flag the delta
        rows that share it."""
        base_occ = (g.groupby(["kind", "band", "key"])["is_base"]
                    .transform("max").to_numpy(np.int64))
        d = g[g["is_base"].to_numpy() == 0]
        hit = base_occ[(g["is_base"].to_numpy() == 0)]
        out = pd.DataFrame({"doc_id": d["doc_id"].to_numpy(np.int64),
                            "kind": d["kind"].to_numpy(np.int64),
                            "hit": hit})
        # delta-sized partial: one row per (delta doc, kind) per bucket
        out = (out.groupby(["doc_id", "kind"], as_index=False)
               .agg(hit=("hit", "max")))
        out["hit"] = out["hit"].astype(np.int64)
        return out

    partials = bucketed_combine(
        docs.map_batches(probe_rows, batch_format="pyarrow",
                         batch_size=1024),
        "key", key_probe)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        p = (g.pivot_table(index="doc_id", columns="kind", values="hit",
                           aggfunc="max", fill_value=0)
             .reindex(columns=[0, 1], fill_value=0).reset_index())
        p.columns = ["doc_id", "exact_dup", "near_cand"]
        for c in p.columns:
            p[c] = p[c].astype(np.int64)
        return p

    return ensure_schema(
        bucketed_combine(partials, "doc_id", per_doc), schema)
