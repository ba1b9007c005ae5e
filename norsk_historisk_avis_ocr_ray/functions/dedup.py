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

Hashing uses blake2b (8-byte digests) — deterministic across worker
processes (Python's builtin ``hash`` is salted per process and must never be
used in a distributed pipeline) with genuinely independent 64 bits per token
(a crc32-pair scheme used earlier had only ~32 bits of entropy because CRC32
is linear in its init value).

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


def word_shingles(text: str, k: int = 3) -> set[int]:
    toks = (text or "").lower().split()
    if len(toks) < k:
        return {_hash64(" ".join(toks))} if toks else set()
    return {_hash64(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)}


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = word_shingles(a, k), word_shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def _docs(sf_dir: str) -> Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


# --- exact dedup --------------------------------------------------------------

def dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Survivors of exact-content dedup: min(doc_id) per md5(text)."""

    def add_hash(t: pa.Table) -> pa.Table:
        md5s = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
                for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint": pa.array(md5s, pa.string())})

    from ray.data.aggregate import Min

    # vectorized hash aggregate (NOT per-group Python: min-per-key is exactly
    # keep-first dedup and runs as a partial+final combine)
    ds = (_docs(sf_dir)
          .map_batches(add_hash, batch_format="pyarrow", batch_size=8192)
          .groupby("fingerprint")
          .aggregate(Min("doc_id", alias_name="doc_id")))
    df = ds.to_pandas()
    if df.empty:  # empty aggregate loses its columns; keep the schema stable
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "fingerprint": pd.Series([], dtype="object")})
    return df.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "fingerprint"]]


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

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, MERSENNE, dtype=np.uint64)
        x = _mod61(np.fromiter(sh, dtype=np.uint64, count=len(sh)))
        # true universal family: (a*x + b) mod p with overflow-safe modmul
        prod = _modmul61(self.a[:, None], x[None, :]) + self.b[:, None]
        prod = np.where(prod >= _P61, prod - _P61, prod)
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, band_hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            sig = self.signature(text)
            for bi in range(self.bands):
                chunk = sig[bi * self.rows:(bi + 1) * self.rows]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                doc_ids.append(doc_id)
                bands.append(bi)
                band_hashes.append(h)
        return pa.table({
            "doc_id": pa.array(doc_ids),
            "band": pa.array(bands, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.string()),
        })


def minhash_candidates(docs: Dataset) -> Dataset:
    """documents → distinct LSH candidate pairs (a < b).

    Bucket pairing is a self-join on the band key (vectorized hash join —
    per-bucket Python loops over tens of thousands of tiny groups are the
    slow anti-pattern), followed by a vectorized count-aggregate for
    distinctness.

    The signature stage runs as a task pool, not an actor pool: MinHasher's
    only state is 256 seeded permutation constants (microseconds to rebuild
    per task), so actor-pool startup latency buys nothing and the task form
    composes with the streaming executor's own parallelism control — the
    general rule "stateful stage = actor pool" applies when __init__ is
    *expensive* (model load, index build), which this is not.
    """
    from ray.data.aggregate import Count

    hasher = MinHasher()
    band_rows = docs.map_batches(hasher, batch_format="pyarrow",
                                 batch_size=1024).materialize()  # self-joined
    if band_rows.count() == 0:
        # Ray's hash join crashes on schema-less empty sides; an empty
        # corpus/partition is a routine condition, not an error.
        return ray.data.from_arrow(pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
    joined = band_rows.join(band_rows, join_type="inner", num_partitions=4,
                            on=("band", "band_hash"), right_suffix="_r")

    def ordered(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.less(t["doc_id"], t["doc_id_r"])
        t = t.filter(keep)
        return pa.table({"a": t["doc_id"], "b": t["doc_id_r"]})

    pairs = joined.map_batches(ordered, batch_format="pyarrow")
    return (pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands"))
            .select_columns(["a", "b"]))


def dedup_minhash(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
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

    docs = _docs(sf_dir)
    cands = minhash_candidates(docs).materialize()

    pair_ids = cands.to_pandas()  # int pairs only, O(candidates)
    if pair_ids.empty:  # no candidates: skip the joins (empty sides crash)
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    id_set = pa.array(np.unique(np.concatenate(
        [pair_ids["a"].to_numpy(), pair_ids["b"].to_numpy()])))

    def only_candidates(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=id_set))

    needed = docs.map_batches(only_candidates, batch_format="pyarrow")
    docs_a = needed.rename_columns({"doc_id": "a", "text": "text_a"})
    docs_b = needed.rename_columns({"doc_id": "b", "text": "text_b"})
    joined = (cands.join(docs_a, join_type="inner", num_partitions=4, on=("a",))
                   .join(docs_b, join_type="inner", num_partitions=4, on=("b",)))

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


# --- SimHash -------------------------------------------------------------------

def simhash64(text: str) -> int:
    toks = (text or "").lower().split()
    if not toks:
        return 0
    hashes = np.fromiter((_hash64(t) for t in toks), dtype=np.uint64,
                         count=len(toks))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_signatures(sf_dir: str) -> Dataset:
    from .collect import ensure_schema

    def sig(t: pa.Table) -> pa.Table:
        hs = [simhash64(x) for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array([f"{h:016x}" for h in hs], pa.string())})
    return ensure_schema(
        _docs(sf_dir).map_batches(sig, batch_format="pyarrow", batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("simhash", pa.string())]))


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by SimHash Hamming ≤ max_hamming, blocked on 16-bit
    chunks (pigeonhole: Hamming ≤ 3 ⇒ ≥1 of 4 chunks identical)."""
    sigs = simhash_signatures(sf_dir)

    def explode_chunks(t: pa.Table) -> pa.Table:
        doc_ids, chunks, vals, full = [], [], [], []
        for doc_id, hx in zip(t["doc_id"].to_pylist(), t["simhash"].to_pylist()):
            h = int(hx, 16)
            for c in range(4):
                doc_ids.append(doc_id)
                chunks.append(c)
                vals.append((h >> (16 * c)) & 0xFFFF)
                full.append(hx)
        return pa.table({"doc_id": pa.array(doc_ids), "chunk": pa.array(chunks, pa.int32()),
                         "val": pa.array(vals, pa.int32()), "simhash": pa.array(full)})

    from ray.data.aggregate import Min

    chunk_rows = sigs.map_batches(explode_chunks,
                                  batch_format="pyarrow").materialize()
    if chunk_rows.count() == 0:  # empty corpus: skip the self-join
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    joined = chunk_rows.join(chunk_rows, join_type="inner", num_partitions=4,
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
        return pa.table({
            "a": t["doc_id"].to_numpy(zero_copy_only=False)[keep],
            "b": t["doc_id_r"].to_numpy(zero_copy_only=False)[keep],
            "hamming": pa.array(ham[keep], pa.int64())})

    pairs = (joined.map_batches(verify, batch_format="pyarrow")
                   .groupby(["a", "b"])
                   .aggregate(Min("hamming", alias_name="hamming")))
    df = pairs.to_pandas()
    if df.empty:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    return df.sort_values(["a", "b"]).reset_index(drop=True)
