"""Training-data preparation operators: deterministic hash splits, PII
scrubbing, JSON field extraction, top-term scoring, sequence packing.

The stages a 100-TB training-data pipeline runs between raw extraction and
tokenized output, expressed Ray-Data-first:

- **q_hash_split**: md5(doc_id)-deterministic train/val/test assignment —
  reproducible across runs, machines and partitionings (never ``random`` or
  salted ``hash``), with a per-batch combiner so the final ``groupby`` moves
  one row per (split, batch). Exact DuckDB oracle via hex-cast of md5().
- **pii_scrub**: RE2 redaction of long digit runs (account/phone-shaped) via
  Arrow's ``replace_substring_regex`` — both Arrow and DuckDB run RE2, so the
  oracle match is exact. Stateless vectorized map, no shuffle.
- **q_json_extract**: typed field extraction from a JSON string column with
  ``extract_regex`` + grouped stats (partial-then-final aggregation).
- **tfidf_top_term**: per-document top term by the integer *tf-rarity* score
  ``tf × (N − df)`` — a tf-idf-shaped weight chosen integer-exact so the
  oracle comparison has no float-rounding risk. Dataflow: per-batch (doc,
  tok, tf) rows → ``groupby(tok)`` document frequency → hash join back on
  the token (NOT a vocabulary broadcast — at corpus scale the vocabulary is
  unbounded) → per-doc argmax as ONE ``Max`` aggregate over an
  order-encoded ``score|token`` key (no per-group Python, no map_groups).
- **seq_pack**: greedy fixed-capacity sequence packing (the step that turns
  documents into fixed-length training rows), per doc_id shard so packing is
  deterministic and embarrassingly parallel: ``groupby(shard)`` is the only
  shuffle and each group packs independently. Inherently order-stateful ⇒
  no SQL form; correctness is pinned by a planted pytest ground truth.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Sum

from .collect import ensure_schema, typed_empty
from .rounding import round_half_away
from .rounding import series_round_half_away as _r
from . import scale


def _read(sf_dir: str, table: str, columns: list[str]) -> Dataset:
    # cluster+size-derived block count (see scale.read_blocks_for_path)
    path = f"{sf_dir}/{table}.parquet"
    return ray.data.read_parquet(
        path, columns=columns,
        override_num_blocks=scale.read_blocks_for_path(path))


# --- deterministic hash split -------------------------------------------------

TRAIN_PCT, VAL_PCT = 80, 10


def _md5_bucket(doc_id: int) -> int:
    """First 8 hex digits of md5(str(doc_id)) mod 100 — matches DuckDB's
    ``CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)``."""
    h = hashlib.md5(str(doc_id).encode("ascii")).hexdigest()
    return int(h[:8], 16) % 100


def q_hash_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test split over documents with per-split
    doc count and average text length."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        b = np.fromiter((_md5_bucket(i) for i in t["doc_id"].to_pylist()),
                        dtype=np.int64, count=t.num_rows)
        split = np.where(b < TRAIN_PCT, "train",
                         np.where(b < TRAIN_PCT + VAL_PCT, "val", "test"))
        lens = pc.utf8_length(t["text"]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        g = (pd.DataFrame({"split": split, "len": lens})
             .groupby("split", as_index=False)
             .agg(n_docs=("len", "size"), sum_len=("len", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    final = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
             .groupby("split")
             .aggregate(Sum("n_docs", alias_name="n_docs"),
                        Sum("sum_len", alias_name="sum_len")))
    df = final.to_pandas()
    if df.empty:
        return typed_empty(split="object", n_docs="int64", avg_len="float64")
    df["avg_len"] = _r(df["sum_len"] / df["n_docs"], 6)
    return (df.drop(columns=["sum_len"])
            .sort_values("split").reset_index(drop=True))


# --- deterministic stratified sampling ------------------------------------------

SAMPLE_PCT = 10


def q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic ~10% sample per language stratum (md5-bucket < 10),
    reporting per-stratum totals, sampled counts, and sampled average
    length. The sample is a pure filter — reproducible across runs and
    partitionings, no ``random_shuffle``, no coordination."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        b = np.fromiter((_md5_bucket(i) for i in t["doc_id"].to_pylist()),
                        dtype=np.int64, count=t.num_rows)
        sampled = b < SAMPLE_PCT
        lens = pc.utf8_length(t["text"]).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        g = (pd.DataFrame({"lang": t["lang"].to_pylist(), "s": sampled,
                           "len": np.where(sampled, lens, 0)})
             .groupby("lang", as_index=False)
             .agg(n_total=("s", "size"), n_sampled=("s", "sum"),
                  sum_len=("len", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    final = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
             .groupby("lang")
             .aggregate(Sum("n_total", alias_name="n_total"),
                        Sum("n_sampled", alias_name="n_sampled"),
                        Sum("sum_len", alias_name="sum_len")))
    df = final.to_pandas()
    if df.empty:
        return typed_empty(lang="object", n_total="int64",
                           n_sampled="int64", avg_sampled_len="float64")
    df["avg_sampled_len"] = _r(
        df["sum_len"] / np.maximum(df["n_sampled"], 1), 6)
    return (df.drop(columns=["sum_len"])
            .sort_values("lang").reset_index(drop=True))


# --- PII scrubbing --------------------------------------------------------------

PII_DIGIT_RUN = r"\d{4,}"


SOURCE_CAP = 15


def q_source_cap(sf_dir: str, cap: int = SOURCE_CAP) -> pd.DataFrame:
    """Per-source quota sampling (the web-pipeline "domain cap": at most
    ``cap`` docs per source, chosen deterministically by md5(doc_id) order
    so re-runs and resharding pick the identical subset).

    Scale shape — distributed top-k per group, ZERO shuffle: sources are a
    bounded dimension (domains/feeds bucketize), so each batch keeps only
    its local ``cap`` smallest hashes per source and the driver finishes
    the exact global top-``cap`` on the ≤ cap × |sources| × n_blocks
    sliver — the same local-topk + tiny-merge shape as
    ``q_running_user_value``'s final-100."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def local_top(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        df = pd.DataFrame({
            "doc_id": np.asarray(ids, np.int64),
            "source": t["source"].to_pylist(),
            "h": [hashlib.md5(str(d).encode("ascii")).hexdigest()
                  for d in ids]})
        top = (df.sort_values(["source", "h", "doc_id"], kind="mergesort")
                 .groupby("source", sort=False).head(cap))
        return pa.Table.from_pandas(top, preserve_index=False)

    sliver = (ds.map_batches(local_top, batch_format="pyarrow")
                .to_pandas())
    if sliver.empty:
        return typed_empty(doc_id="int64", source="object",
                           sample_rank="int64")
    out = (sliver.sort_values(["source", "h", "doc_id"], kind="mergesort")
                 .groupby("source", sort=False).head(cap)
                 .reset_index(drop=True))
    out["sample_rank"] = (out.groupby("source", sort=False).cumcount()
                          + 1).astype(np.int64)
    return (out[["doc_id", "source", "sample_rank"]]
            .sort_values("doc_id").reset_index(drop=True))


# --- fixed-size token chunking (RAG / context-window prep) ---------------------

CHUNK_TOKENS = 200
CHUNK_OVERLAP = 20
CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def doc_chunks(sf_dir: str, size: int = CHUNK_TOKENS,
               stride: int = CHUNK_STRIDE) -> Dataset:
    """Fixed-size token chunking with overlap — the step that turns
    documents into retrieval/context-window units (seq_pack's
    content-addressed cousin). Chunk ``i`` covers tokens
    ``[i·stride, i·stride + size)``; the trailing chunk may be short.

    Emits ``(doc_id, chunk_idx, n_tokens, chunk_md5)`` — the md5 is over
    the space-joined token slice, so the exact SQL oracle verifies chunk
    CONTENT, not just counts. Stateless vectorized map, zero shuffle,
    corpus-sized output → streaming Dataset."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def chunk(t: pa.Table) -> pa.Table:
        ids, idxs, ntoks, digests = [], [], [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = (x or "").split()
            n = len(toks)
            if n == 0:
                continue
            for i in range((n + stride - 1) // stride):
                s = i * stride
                piece = toks[s:s + size]
                ids.append(d)
                idxs.append(i)
                ntoks.append(len(piece))
                digests.append(hashlib.md5(
                    " ".join(piece).encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int64()),
            "n_tokens": pa.array(ntoks, pa.int64()),
            "chunk_md5": pa.array(digests, pa.string()),
        })

    return ensure_schema(
        ds.map_batches(chunk, batch_format="pyarrow", batch_size=4096),
        pa.schema([("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
                   ("n_tokens", pa.int64()), ("chunk_md5", pa.string())]))


def pii_scrub(sf_dir: str) -> Dataset:
    """Redact account/phone-shaped digit runs (≥4 digits) in customer names;
    emits the scrubbed name plus the per-row redaction count. Stateless
    vectorized RE2 map — zero shuffles, streams at any scale."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def scrub(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"],
            "clean_name": pc.replace_substring_regex(
                t["c_name"], pattern=PII_DIGIT_RUN, replacement="[ID]"),
            "n_masked": pc.count_substring_regex(
                t["c_name"], pattern=PII_DIGIT_RUN).cast(pa.int64()),
        })

    return ensure_schema(
        ds.map_batches(scrub, batch_format="pyarrow", batch_size=8192),
        pa.schema([("c_custkey", pa.int64()), ("clean_name", pa.string()),
                   ("n_masked", pa.int64())]))


# --- JSON field extraction ------------------------------------------------------

JSON_K_PATTERN = r'"k": (?P<k>\d+)'


def q_json_extract(sf_dir: str) -> pd.DataFrame:
    """Extract the integer ``k`` field from the JSON ``props`` column and
    aggregate per event type (partial-then-final)."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ks = pc.struct_field(
            pc.extract_regex(t["props"], JSON_K_PATTERN), "k")
        k = pc.cast(ks, pa.int64()).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"event_type": t["event_type"].to_pylist(), "k": k})
             .groupby("event_type", as_index=False)
             .agg(n_events=("k", "size"), sum_k=("k", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    final = (ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
             .groupby("event_type")
             .aggregate(Sum("n_events", alias_name="n_events"),
                        Sum("sum_k", alias_name="sum_k")))
    df = final.to_pandas()
    if df.empty:
        return typed_empty(event_type="object", n_events="int64",
                           sum_k="int64", avg_k="float64")
    df["avg_k"] = _r(df["sum_k"] / df["n_events"], 6)
    return df.sort_values("event_type").reset_index(drop=True)


# --- per-document top term by tf-rarity -----------------------------------------

VOCAB_BROADCAST_CUTOVER = 250_000


def tfidf_top_term(sf_dir: str,
                   vocab_cutover: int = VOCAB_BROADCAST_CUTOVER) -> Dataset:
    """Per-document top term by the integer score ``tf × (N − df)``.

    The corpus is tokenized ONCE into materialized per-doc-distinct
    (doc_id, tok, tf) rows; document frequency is a ``groupby(tok)`` Count
    over those rows. When the vocabulary fits (≤ ``vocab_cutover`` distinct
    tokens) it is broadcast once and the per-doc argmax computes
    BLOCK-LOCALLY over the tf rows — a doc's rows were produced by one
    tokenizing task, so with block-aligned batches they never split and no
    further shuffle happens. Above the cutover the vocabulary is unbounded:
    the df table joins BACK on the token distributedly, with the argmax as
    a single ``Max`` aggregate over the order-encoded key
    ``zfill20(score)|tok`` (uint64-wide pad — a 12-digit pad mis-ranked
    scores ≥ 1e12) — max score, ties to the lexically largest token, no
    per-group Python. Tokenization is single-space split (matches SQL
    ``string_split``)."""
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("top_tok", pa.string()),
                            ("top_score", pa.int64())])
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_total = docs.count()
    if n_total == 0:
        return ray.data.from_arrow(pa.table(
            {n: pa.array([], type=t)
             for n, t in zip(out_schema.names, out_schema.types)}))

    def _tf_frame(t: pa.Table) -> pd.DataFrame:
        s = pd.Series(t["text"].to_pylist(),
                      index=t["doc_id"].to_pylist()).fillna("")
        ex = s.str.lower().str.split(" ").explode()
        ex = ex[ex != ""]
        return (ex.rename("tok").rename_axis("doc_id").reset_index()
                .groupby(["doc_id", "tok"], as_index=False).size()
                .rename(columns={"size": "tf"}))

    def tf_rows(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_tf_frame(t), preserve_index=False)

    # ONE tokenization pass, materialized: feeds the df aggregate AND the
    # argmax (broadcast path) / join (fallback path).
    tf = docs.map_batches(tf_rows, batch_format="pyarrow",
                          batch_size=4096).materialize()
    # tf rows are per-doc distinct by construction -> Count == df
    df_counts = (tf.groupby("tok").aggregate(Count(alias_name="df"))
                 .materialize())

    if df_counts.count() <= vocab_cutover:
        vdf = df_counts.to_pandas()
        order = np.argsort(vdf["tok"].to_numpy())
        vocab_ref = ray.put((vdf["tok"].to_numpy()[order],
                             vdf["df"].to_numpy(np.int64)[order]))

        def local_argmax(t: pa.Table) -> pa.Table:
            toks, dfs = ray.get(vocab_ref)
            if t.num_rows == 0:
                return pa.table({"doc_id": pa.array([], pa.int64()),
                                 "top_tok": pa.array([], pa.string()),
                                 "top_score": pa.array([], pa.int64())})
            g = t.to_pandas()
            gt = g["tok"].to_numpy()
            pos = np.searchsorted(toks, gt)
            df_v = dfs[pos]  # every token is in the global vocab by constr.
            g = g.assign(score=(g["tf"].to_numpy(np.int64)
                                * (n_total - df_v)))
            # per-doc argmax, block-local: a doc's tf rows come from the one
            # task that tokenized its (single-row) text, and batch_size=None
            # below keeps batches block-aligned so they never split.
            top = (g.sort_values(["doc_id", "score", "tok"],
                                 kind="mergesort")
                   .groupby("doc_id", as_index=False).tail(1))
            return pa.table({
                "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
                "top_tok": pa.array(top["tok"], pa.string()),
                "top_score": pa.array(top["score"].to_numpy(np.int64))})

        return ensure_schema(
            tf.map_batches(local_argmax, batch_format="pyarrow",
                           batch_size=None),
            out_schema)

    joined = tf.join(df_counts, join_type="inner", num_partitions=scale.join_partitions(),
                     on=("tok",))

    def encode(t: pa.Table) -> pa.Table:
        tf_v = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        df_v = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = tf_v * (n_total - df_v)
        keys = (pd.Series(score).astype(str).str.zfill(20) + "|"
                + pd.Series(t["tok"].to_pylist()))
        return pa.table({"doc_id": t["doc_id"],
                         "key": pa.array(keys, pa.string())})

    top = (joined.map_batches(encode, batch_format="pyarrow")
           .groupby("doc_id").aggregate(Max("key", alias_name="key")))

    def decode(t: pa.Table) -> pa.Table:  # row-local key split, streamed
        keys = pd.Series(t["key"].to_pylist())
        parts = keys.str.split("|", n=1)
        return pa.table({
            "doc_id": t["doc_id"],
            "top_tok": pa.array(parts.str[1], pa.string()),
            "top_score": pa.array(parts.str[0].astype(np.int64))})

    # Streaming result (one row per document = corpus-sized).
    return ensure_schema(top.map_batches(decode, batch_format="pyarrow"),
                         out_schema)


# --- greedy sequence packing ----------------------------------------------------

PACK_CAPACITY = 512
PACK_SHARD = 256


def seq_pack(sf_dir: str, capacity: int = PACK_CAPACITY,
             shard_size: int = PACK_SHARD) -> pd.DataFrame:
    """Greedy fixed-capacity packing of documents into training rows.

    Docs are packed in doc_id order within a ``doc_id // shard_size`` shard;
    a doc that would overflow the open bin starts a new one (an oversize doc
    occupies a bin alone). Per-shard packing keeps the operator deterministic
    under any input partitioning and parallel across shards — the one
    shuffle is the ``groupby(shard)``. Output: one row per bin.

    Exactly SQL-oracled since round 3: the reset-on-overflow greedy scan is
    a recursive CTE over per-shard row numbers (depth = shard size)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        s = pd.Series(t["text"].to_pylist()).fillna("")
        n_tok = s.str.split().str.len().to_numpy(dtype=np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"shard": pa.array(ids // shard_size, pa.int64()),
                         "doc_id": t["doc_id"],
                         "n_tokens": pa.array(n_tok, pa.int64())})

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        bins, n_docs, n_toks = [], [], []
        cur_docs = cur_toks = 0
        for nt in g["n_tokens"].to_numpy():
            if cur_docs and cur_toks + nt > capacity:
                n_docs.append(cur_docs)
                n_toks.append(cur_toks)
                cur_docs = cur_toks = 0
            cur_docs += 1
            cur_toks += int(nt)
        if cur_docs:
            n_docs.append(cur_docs)
            n_toks.append(cur_toks)
        bins = np.arange(len(n_docs), dtype=np.int64)
        return pd.DataFrame({"shard": g["shard"].iloc[0], "bin_idx": bins,
                             "n_docs": np.array(n_docs, np.int64),
                             "n_tokens": np.array(n_toks, np.int64)})

    packed = (ds.map_batches(tok_counts, batch_format="pyarrow",
                             batch_size=8192)
              .groupby("shard").map_groups(pack, batch_format="pandas"))
    df = packed.to_pandas()
    if df.empty:
        return typed_empty(shard="int64", bin_idx="int64", n_docs="int64",
                           n_tokens="int64", fill="float64")
    df["fill"] = _r(df["n_tokens"] / capacity, 6)
    return df.sort_values(["shard", "bin_idx"]).reset_index(drop=True)


def q_pack_stats(sf_dir: str, capacity: int = PACK_CAPACITY,
                 shard_size: int = PACK_SHARD) -> pd.DataFrame:
    """Packing-efficiency report over the ``seq_pack`` bins: the fill-rate
    histogram (decile of capacity per bin, deciles > 10 = oversize docs
    that overflow a bin alone) with bin/doc/token counts per decile — the
    number that says how much sequence budget the packer wastes and how
    heavy the oversize tail is.

    EXACT and ALL-integer: bins ride the proven per-shard greedy chain
    (deterministic under any partitioning); ``fill_decile =
    (10·n_tokens) // capacity`` is integer division; counts fold as
    integer Sums. Unlike ``seq_pack`` (whose per-bin rows the driver
    pulls), the rollup here stays distributed: per-batch decile partials
    → one ≤ few-dozen-group groupby. Result-sized → DataFrame."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        s = pd.Series(t["text"].to_pylist()).fillna("")
        n_tok = s.str.split().str.len().to_numpy(dtype=np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"shard": pa.array(ids // shard_size, pa.int64()),
                         "doc_id": t["doc_id"],
                         "n_tokens": pa.array(n_tok, pa.int64())})

    def pack_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        n_docs, n_toks = [], []
        cur_docs = cur_toks = 0
        for nt in g["n_tokens"].to_numpy():
            if cur_docs and cur_toks + nt > capacity:
                n_docs.append(cur_docs)
                n_toks.append(cur_toks)
                cur_docs = cur_toks = 0
            cur_docs += 1
            cur_toks += int(nt)
        if cur_docs:
            n_docs.append(cur_docs)
            n_toks.append(cur_toks)
        toks = np.array(n_toks, np.int64)
        out = (pd.DataFrame({"fill_decile": (10 * toks) // capacity,
                             "n_bins": np.ones(len(toks), np.int64),
                             "n_docs": np.array(n_docs, np.int64),
                             "n_tokens": toks})
               .groupby("fill_decile", as_index=False).sum())
        return out

    df = (ds.map_batches(tok_counts, batch_format="pyarrow",
                         batch_size=8192)
          .groupby("shard").map_groups(pack_partial,
                                       batch_format="pandas")
          .groupby("fill_decile")
          .aggregate(Sum("n_bins", alias_name="n_bins"),
                     Sum("n_docs", alias_name="n_docs"),
                     Sum("n_tokens", alias_name="n_tokens"))
          .to_pandas())                      # ≤ max-decile rows
    if df.empty:
        return typed_empty(fill_decile="int64", n_bins="int64",
                           n_docs="int64", n_tokens="int64")
    for c in df.columns:
        df[c] = df[c].astype(np.int64)
    return (df[["fill_decile", "n_bins", "n_docs", "n_tokens"]]
            .sort_values("fill_decile").reset_index(drop=True))


SKEW_SHARDS = 32     # == pipelines.prepare.PREPARE_SHARDS


def q_shard_skew(sf_dir: str, n_shards: int = SKEW_SHARDS) -> pd.DataFrame:
    """Shard-balance forecast for the resumable prepare job: per
    ``splitmix64(doc_id) % n_shards`` shard (the EXACT sharding
    ``pipelines/prepare.py`` uses), doc count, char load and load
    fraction — read this before launching a 100-TB prepare run to see
    whether any output shard will straggle.

    EXACT: splitmix64 replays in SQL via the ``_fmix_proj`` HUGEINT
    expression (the LSH band-key bridge); counts fold as int64 partials;
    the one double division per row divides two exact integers.

    Ray shape: one slim 2-column pass → per-batch (shard, 2-int)
    partials → ≤ n_shards-group groupby. Result-sized → DataFrame."""
    from ray.data.aggregate import Sum

    from .dedup import _fmix64

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sh = (_fmix64(ids) % np.uint64(n_shards)).astype(np.int64)
        g = (pd.DataFrame({"shard": sh,
                           "c": np.ones(len(sh), np.int64),
                           "nc": t["n_chars"].to_numpy(
                               zero_copy_only=False).astype(np.int64)})
             .groupby("shard", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
          .groupby("shard")
          .aggregate(Sum("c", alias_name="n_docs"),
                     Sum("nc", alias_name="n_chars"))
          .to_pandas())                         # ≤ n_shards rows
    if df.empty:
        return typed_empty(shard="int64", n_docs="int64", n_chars="int64",
                           load_frac="float64")
    for c in ("shard", "n_docs", "n_chars"):
        df[c] = df[c].astype(np.int64)
    tot = int(df["n_chars"].sum())
    df["load_frac"] = _r(df["n_chars"].astype(np.float64)
                         / np.float64(max(tot, 1)), 6)
    return (df[["shard", "n_docs", "n_chars", "load_frac"]]
            .sort_values("shard").reset_index(drop=True))


def q_quality_vs_dup(sf_dir: str) -> pd.DataFrame:
    """Quality × duplication contingency: the Gopher keep decision
    crossed with exact-duplicate membership (md5 group size ≥ 2) — the
    FineWeb-style ablation question "are duplicates lower-quality?",
    answered as a 2×2 integer table before anyone spends a dedup pass.

    EXACT: keep flags ride the proven ``q_gopher_filter`` chain
    (all-integer predicates); dup membership resolves globally inside
    one md5-bucketed combine (the dedup_exact chain); cell counts fold
    as integer Sums. The dup-id set is the dedup SURPLUS — a sliver on
    real corpora (8 ids at sf0.1) — broadcast into the flagging scan via
    closure (the dedup_substring broadcast-below-cutover contract; above
    it, flag by a distributed join instead).

    Ray shape: one bucketed combine emits dup ids → one streaming pass
    over the gopher stream emits (keep, is_dup) partials → a ≤ 4-group
    groupby. Result-sized → DataFrame."""
    import pyarrow.compute as pc

    from .combine import bucketed_combine
    from .textstats import q_gopher_filter

    empty = typed_empty(keep="int64", is_dup="int64", n_docs="int64")
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        md5s = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
                for x in t["text"].to_pylist()]
        fph = np.array([np.uint64(int(m[:16], 16)) for m in md5s],
                       np.uint64).view(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "fph": pa.array(fph, pa.int64())})

    def dup_only(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby("fph")["doc_id"].transform("size")
        out = g.loc[cnt > 1, ["doc_id"]].copy()
        out["doc_id"] = out["doc_id"].astype(np.int64)
        return out

    dups = bucketed_combine(
        ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192),
        "fph", dup_only).to_pandas()          # the dedup surplus sliver
    id_set = (pa.array(dups["doc_id"].to_numpy(np.int64))
              if len(dups) else None)

    def partial(t: pa.Table) -> pa.Table:
        keep = t["keep"].to_numpy(zero_copy_only=False).astype(np.int64)
        if id_set is None:
            isd = np.zeros(len(keep), np.int64)
        else:
            isd = pc.is_in(t["doc_id"], value_set=id_set).to_numpy(
                zero_copy_only=False).astype(np.int64)
        g = (pd.DataFrame({"keep": keep, "is_dup": isd,
                           "n": np.ones(len(keep), np.int64)})
             .groupby(["keep", "is_dup"], as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (q_gopher_filter(sf_dir)
          .map_batches(partial, batch_format="pyarrow", batch_size=8192)
          .groupby(["keep", "is_dup"])
          .aggregate(Sum("n", alias_name="n_docs"))
          .to_pandas())                        # ≤ 4 rows
    if df.empty or "keep" not in df.columns:
        return empty
    for c in ("keep", "is_dup", "n_docs"):
        df[c] = df[c].astype(np.int64)
    return (df[["keep", "is_dup", "n_docs"]]
            .sort_values(["keep", "is_dup"]).reset_index(drop=True))


# --- benchmark-contamination check ---------------------------------------------

CONTAM_MOD = 20   # docs with doc_id % 20 == 0 form the "benchmark" set
CONTAM_K = 3      # word n-gram order


def q_contamination(sf_dir: str) -> "ray.data.Dataset":
    """Benchmark-contamination scan: for every non-benchmark document, the
    fraction of its distinct word 3-grams that also occur in the benchmark
    set (docs with ``doc_id % 20 == 0`` stand in for an eval suite).

    Scale shape — broadcast-small-side, never a shuffle: the benchmark set
    is tiny by definition (an eval suite, not the corpus), so pass 1 reduces
    it to a distinct 64-bit shingle-hash array (per-batch dedup first, driver
    union after) and ``ray.put``s it ONCE; pass 2 streams the corpus and
    probes via one ``searchsorted`` per batch over the concatenated per-doc
    shingles. Shingle hashing reuses dedup.py's vectorized splitmix mixer
    over a per-batch token vocabulary (case-preserving here — the SQL oracle
    compares literal n-gram strings). Hash collisions across 64 bits are
    ~1e-11 at bench scale, far below the oracle's row count."""
    from .dedup import _hash_tokens_batch, _shingles_from_tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bench_hashes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % CONTAM_MOD == 0))
        hs = [_shingles_from_tokens(th, CONTAM_K)
              for th in _hash_tokens_batch(t["text"].to_pylist(), lower=False)
              if len(th) >= CONTAM_K]
        flat = (np.unique(np.concatenate(hs)) if hs
                else np.array([], np.uint64))
        return pa.table({"h": pa.array(flat, pa.uint64())})

    bench_df = (ds.map_batches(bench_hashes, batch_format="pyarrow",
                               batch_size=8192).to_pandas())
    bench_arr = (np.unique(bench_df["h"].to_numpy().astype(np.uint64))
                 if "h" in bench_df.columns else np.array([], np.uint64))
    bench_ref = ray.put(bench_arr)

    def score(t: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)  # zero-copy view from the object store
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % CONTAM_MOD != 0))
        toks = _hash_tokens_batch(t["text"].to_pylist(), lower=False)
        keep = np.array([len(th) >= CONTAM_K for th in toks], bool)
        t = t.filter(pa.array(keep))
        shs = [_shingles_from_tokens(th, CONTAM_K)
               for th, k in zip(toks, keep) if k]
        lens = np.array([len(s) for s in shs], np.int64)
        flat = (np.concatenate(shs) if shs else np.array([], np.uint64))
        pos = np.searchsorted(bench, flat)
        pos_c = np.minimum(pos, max(len(bench) - 1, 0))
        hit = (bench[pos_c] == flat) if len(bench) else np.zeros(len(flat), bool)
        doc_idx = np.repeat(np.arange(len(lens)), lens)
        n_hit = np.bincount(doc_idx, weights=hit,
                            minlength=len(lens)).astype(np.int64)
        frac = _r(pd.Series(n_hit / np.maximum(lens, 1)), 6).to_numpy()
        return pa.table({
            "doc_id": t["doc_id"],
            "n_grams": pa.array(lens, pa.int64()),
            "n_hit": pa.array(n_hit, pa.int64()),
            "contamination_frac": pa.array(frac, pa.float64()),
        })

    return ensure_schema(
        ds.map_batches(score, batch_format="pyarrow", batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()),
                   ("n_hit", pa.int64()),
                   ("contamination_frac", pa.float64())]))


# --- corpus line-level dedup (CCNet-style boilerplate removal) -----------------

LINE_DEDUP_MIN_COUNT = 3


def line_dedup(sf_dir: str,
               min_count: int = LINE_DEDUP_MIN_COUNT) -> Dataset:
    """CCNet-style line-level dedup: drop every line that occurs ≥
    ``min_count`` times corpus-wide (headers, footers, nav chrome — the
    boilerplate a web-extraction pipeline strips before training), then
    rebuild each document from its surviving lines in order.

    Dataflow (the same semi-join-reduce shape as dedup_minhash):

    1. one streaming pass hashes every line (blake2b-64 over the batch's
       distinct lines) and pre-aggregates counts per batch, so the only
       shuffle is a ``groupby(line_hash).sum`` over (uint64→int64 hash,
       int64 n) rows — text never enters the shuffle;
    2. lines with total count ≥ min_count are the *boilerplate vocabulary*
       — O(distinct repeated lines), a sliver by construction (boilerplate
       is frequent ⇒ few distinct strings) — broadcast once via ``ray.put``;
    3. a second streaming pass rebuilds documents, dropping lines whose
       hash hits the sorted sliver (vectorized ``searchsorted``).

    64-bit hash collisions would need ~2^32 distinct lines to matter; the
    DuckDB oracle compares literal strings and matches exactly on the test
    tables. The driver tables are single-line (nothing is removed there);
    the planted-boilerplate pytest proves the removal path.
    """
    from .dedup import _hash64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _line_hashes(texts: list) -> list[np.ndarray]:
        cache: dict[str, int] = {}
        get = cache.get
        out = []
        for t in texts:
            ls = (t or "").split("\n")
            hs = np.empty(len(ls), np.uint64)
            for i, ln in enumerate(ls):
                h = get(ln)
                if h is None:
                    h = _hash64(ln)
                    cache[ln] = h
                hs[i] = h
            out.append(hs)
        return out

    def partial_counts(t: pa.Table) -> pa.Table:
        hs = _line_hashes(t["text"].to_pylist())
        flat = np.concatenate(hs) if hs else np.array([], np.uint64)
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table({"lh": pa.array(uniq.view(np.int64), pa.int64()),
                         "n": pa.array(cnt.astype(np.int64))})

    hot_df = (ds.map_batches(partial_counts, batch_format="pyarrow",
                             batch_size=8192)
              .groupby("lh").aggregate(Sum("n", alias_name="n"))
              .filter(expr=f"n >= {int(min_count)}")
              .to_pandas())
    hot = (np.sort(hot_df["lh"].to_numpy(np.int64).view(np.uint64))
           if len(hot_df) else np.array([], np.uint64))
    hot_ref = ray.put(hot)

    def rebuild(t: pa.Table) -> pa.Table:
        boiler = ray.get(hot_ref)
        texts = t["text"].to_pylist()
        hs = _line_hashes(texts)
        clean, n_lines, n_removed = [], [], []
        for txt, h in zip(texts, hs):
            ls = (txt or "").split("\n")
            if len(boiler):
                pos = np.minimum(np.searchsorted(boiler, h), len(boiler) - 1)
                drop = boiler[pos] == h
            else:
                drop = np.zeros(len(h), bool)
            clean.append("\n".join(
                ln for ln, d in zip(ls, drop) if not d))
            n_lines.append(len(ls))
            n_removed.append(int(drop.sum()))
        return pa.table({
            "doc_id": t["doc_id"],
            "clean_text": pa.array(clean, pa.string()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64())})

    # Streaming result (the rebuilt corpus is corpus-sized — never pull it
    # to the driver; the gate's compare sorts rows itself).
    return ensure_schema(
        ds.map_batches(rebuild, batch_format="pyarrow", batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("clean_text", pa.string()),
                   ("n_lines", pa.int64()), ("n_removed", pa.int64())]))


# --- end-to-end training-corpus preparation (composed, single fused pass) ------

TC_MIN_QUALITY = 0.3
TC_MIN_TOKENS = 5
TC_MAX_CONTAM = 0.2


def corpus_bench_hashes(ds: Dataset) -> np.ndarray:
    """Benchmark 3-gram hash sliver over a documents Dataset (docs with
    ``doc_id % CONTAM_MOD == 0`` stand in for an eval suite — tiny by
    definition): per-batch distinct hashes, driver union. Shared by
    q_training_corpus and pipelines.prepare."""
    from .dedup import _hash_tokens_batch, _shingles_from_tokens

    def bench_hashes(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % CONTAM_MOD == 0))
        hs = [_shingles_from_tokens(th, CONTAM_K)
              for th in _hash_tokens_batch(t["text"].to_pylist(), lower=False)
              if len(th) >= CONTAM_K]
        flat = (np.unique(np.concatenate(hs)) if hs
                else np.array([], np.uint64))
        return pa.table({"h": pa.array(flat, pa.uint64())})

    bdf = (ds.map_batches(bench_hashes, batch_format="pyarrow",
                          batch_size=8192).to_pandas())
    return (np.unique(bdf["h"].to_numpy().astype(np.uint64))
            if "h" in bdf.columns else np.array([], np.uint64))


def corpus_fused_signals(t: pa.Table, bench: np.ndarray,
                         with_text: bool = False) -> pa.Table:
    """ONE fused pass of the corpus-preparation signals for a batch:
    md5 fingerprint, token stats, quality, 3-gram contamination probe vs
    the broadcast ``bench`` sliver — rows failing the keep-filter dropped
    BEFORE any shuffle. ``with_text=True`` carries the text through (the
    prepare job writes it; the oracled query drops it)."""
    from .dedup import _hash_tokens_batch, _shingles_from_tokens
    from .textstats import _stats_batch, quality_from_stats

    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(ids % CONTAM_MOD != 0))
    cols = {"fingerprint": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "quality": pa.array([], pa.float64()),
            "contamination_frac": pa.array([], pa.float64())}
    if with_text:
        cols["text"] = pa.array([], pa.string())
    if t.num_rows == 0:
        return pa.table(cols)
    texts = t["text"].to_pylist()
    # token/char stats + quality (same formulas as the oracled
    # quality_score / text_token_stats operators)
    s = _stats_batch(t)
    n_tokens = s["n_tokens"].to_numpy().astype(np.float64)
    quality = quality_from_stats(s["n_tokens"].to_numpy(),
                                 s["n_chars"].to_numpy())
    # contamination probe (distinct 3-gram hit rate vs the bench sliver)
    toks = _hash_tokens_batch(texts, lower=False)
    shs = [_shingles_from_tokens(th, CONTAM_K) if len(th) >= CONTAM_K
           else np.array([], np.uint64) for th in toks]
    lens = np.array([len(x) for x in shs], np.int64)
    flat = (np.concatenate(shs) if shs else np.array([], np.uint64))
    if len(bench) and len(flat):
        pos = np.minimum(np.searchsorted(bench, flat), len(bench) - 1)
        hit = bench[pos] == flat
    else:
        hit = np.zeros(len(flat), bool)
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    n_hit = np.bincount(doc_idx, weights=hit,
                        minlength=len(lens)).astype(np.int64)
    contam = _r(pd.Series(n_hit / np.maximum(lens, 1)), 6).to_numpy()
    # the filter, applied BEFORE the shuffle
    keep = ((quality >= TC_MIN_QUALITY)
            & (n_tokens >= TC_MIN_TOKENS)
            & (contam < TC_MAX_CONTAM)
            & (lens >= 1))  # n_tokens>=5 implies >=3 grams; belt+braces
    kept_texts = [x for x, k in zip(texts, keep) if k]
    md5s = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
            for x in kept_texts]
    out = {
        "fingerprint": pa.array(md5s, pa.string()),
        "doc_id": pa.array(t["doc_id"].to_numpy(
            zero_copy_only=False)[keep]),
        "n_tokens": pa.array(n_tokens[keep].astype(np.int64)),
        "quality": pa.array(quality[keep], pa.float64()),
        "contamination_frac": pa.array(contam[keep], pa.float64())}
    if with_text:
        out["text"] = pa.array(kept_texts, pa.string())
    return pa.table(out)


def q_training_corpus(sf_dir: str) -> Dataset:
    """The composed corpus-preparation pipeline in ONE fused streaming pass:
    quality score + token floor + benchmark decontamination + exact dedup.

    This is the capstone composition of the individually-oracled signals
    (quality_score, text_token_stats, q_contamination, dedup_exact) — the
    point is the FUSION: every per-doc signal (md5, token stats, quality,
    3-gram contamination probe against the broadcast benchmark sliver) is
    computed in a single ``map_batches`` over a single read, the filter
    drops rejects before anything is shuffled, and the only shuffle is the
    dedup ``groupby(md5)``. Signals ride through the dedup aggregate as
    ``Min`` columns (identical text ⇒ identical signals, so Min is exact) —
    no join-back. SQL oracle recomputes the same thing relationally.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bench_ref = ray.put(corpus_bench_hashes(ds))

    def fused_signals(t: pa.Table) -> pa.Table:
        return corpus_fused_signals(t, ray.get(bench_ref))

    from ray.data.aggregate import Min

    deduped = (ds.map_batches(fused_signals, batch_format="pyarrow",
                              batch_size=8192)
               .groupby("fingerprint")
               .aggregate(Min("doc_id", alias_name="doc_id"),
                          Min("n_tokens", alias_name="n_tokens"),
                          Min("quality", alias_name="quality"),
                          Min("contamination_frac",
                              alias_name="contamination_frac")))

    def drop_fp(t: pa.Table) -> pa.Table:
        return t.drop_columns(["fingerprint"])

    # Streaming result (survivors are corpus-sized).
    return ensure_schema(
        deduped.map_batches(drop_fp, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                   ("quality", pa.float64()),
                   ("contamination_frac", pa.float64())]))


# --- corpus vocabulary: top tokens by document frequency -----------------------

VOCAB_TOP_N = 100


def q_vocab_topk(sf_dir: str) -> pd.DataFrame:
    """Top-100 tokens by document frequency — the vocabulary-building step
    of tokenizer training. A document lives in exactly one input row, so
    per-batch per-doc token dedup is GLOBAL dedup: each batch emits its
    distinct (doc, tok) pairs projected to ``tok`` rows, one
    ``groupby(tok)`` Count is the document frequency, and a block-local
    top-k combiner bounds the driver merge to k × n_blocks rows (the full
    vocabulary never leaves the cluster). Tokenization is lowercased
    single-space split, matching SQL ``string_split(lower(text), ' ')``."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def doc_tokens(t: pa.Table) -> pa.Table:
        s = pd.Series(t["text"].to_pylist(),
                      index=t["doc_id"].to_pylist()).fillna("")
        ex = s.str.lower().str.split(" ").explode()
        ex = ex[ex != ""]
        pairs = (ex.rename("tok").rename_axis("doc_id").reset_index()
                 .drop_duplicates())
        return pa.Table.from_pandas(pairs[["tok"]], preserve_index=False)

    dfreq = (ds.map_batches(doc_tokens, batch_format="pyarrow",
                            batch_size=4096)
             .groupby("tok").aggregate(Count(alias_name="df")))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= VOCAB_TOP_N:
            return t
        d = t.to_pandas().sort_values(["df", "tok"],
                                      ascending=[False, True],
                                      kind="mergesort")
        return pa.Table.from_pandas(d.head(VOCAB_TOP_N),
                                    preserve_index=False)

    df = dfreq.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if df.empty:
        return typed_empty(tok="object", df="int64")
    df["df"] = df["df"].astype(np.int64)
    return (df.sort_values(["df", "tok"], ascending=[False, True],
                           kind="mergesort")
            .head(VOCAB_TOP_N).reset_index(drop=True)[["tok", "df"]])


# --- deterministic global corpus shuffle with exact positions -------------------

SHUFFLE_SEED = "42"
def _shuffle_prefixes() -> tuple[int, int]:
    """(hex_digits, bucket_count) for the global-shuffle range partition:
    2 hex digits (256 ranges) on a single VM, 3 (4096) once the cluster
    outgrows 256-way parallelism (VERDICT r03 item 5 — fixed shuffle
    widths cap big clusters). Exactness-neutral: positions are the global
    ``ORDER BY md5`` rank whatever the range width; derived ONCE at query
    build on the driver and closed over."""
    nd = 2 if scale.pow2_buckets(floor=256) <= 256 else 3
    return nd, 16 ** nd


def q_global_shuffle(sf_dir: str) -> Dataset:
    """Deterministic global shuffle of the training corpus with EXACT
    shuffled positions — reproducible across runs, machines and
    partitionings (``ray.data.Dataset.random_shuffle`` is none of those).
    The shuffle key is ``md5(doc_id || ':seed')``; the global position is a
    distributed rank over that key:

    - *pass A* (cheap scan + 256-row agg): per-batch counts per 2-hex-digit
      key prefix → driver exclusive cumsum = per-prefix offsets (the md5
      prefix is uniform, so the 256 ranges are balanced by construction —
      no boundary sampling needed, unlike ``q_event_rank``).
    - *pass B* (the one corpus shuffle): ``groupby(prefix)`` range
      partition, local sort by (key, doc_id), position = offset + arange.

    Lowercase-hex string order equals the prefix's integer order, so the
    local sort inside a prefix bucket composes with the offset into the
    exact global ``ORDER BY md5(...)`` rank. Corpus-sized output →
    streaming Dataset."""
    ds = _read(sf_dir, "documents", ["doc_id"])
    nd, nb = _shuffle_prefixes()   # driver-derived, closed over below

    def keyed(t: pa.Table) -> tuple[np.ndarray, list[str]]:
        ids = t["doc_id"].to_pylist()
        keys = [hashlib.md5(f"{i}:{SHUFFLE_SEED}".encode("ascii"))
                .hexdigest() for i in ids]
        pref = np.fromiter((int(k[:nd], 16) for k in keys),
                           dtype=np.int64, count=len(keys))
        return pref, keys

    def prefix_counts(t: pa.Table) -> pa.Table:
        pref, _ = keyed(t)
        n = np.bincount(pref, minlength=nb)
        return pa.table({"prefix": pa.array(np.arange(nb, dtype=np.int64)),
                         "n": pa.array(n.astype(np.int64))})

    counts = (ds.map_batches(prefix_counts, batch_format="pyarrow")
              .groupby("prefix").aggregate(Sum("n", alias_name="n"))
              .to_pandas())            # exactly ≤ nb rows
    arr = np.zeros(nb, np.int64)
    if len(counts):
        arr[counts["prefix"].to_numpy()] = counts["n"].to_numpy(np.int64)
    offsets = np.concatenate([[0], arr.cumsum()[:-1]])
    off_ref = ray.put(offsets)

    def tag(t: pa.Table) -> pa.Table:
        pref, keys = keyed(t)
        return (t.append_column("prefix", pa.array(pref))
                .append_column("key", pa.array(keys, pa.string())))

    def position(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["key", "doc_id"], kind="mergesort")
        base = int(offs[int(g["prefix"].iat[0])])
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "pos": base + np.arange(len(g), dtype=np.int64)})

    return ensure_schema(
        ds.map_batches(tag, batch_format="pyarrow")
          .groupby("prefix").map_groups(position, batch_format="pandas"),
        pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())]))


# --- weighted mixture sampling per source ---------------------------------------

def q_mixture_sample(sf_dir: str) -> Dataset:
    """Corpus mixture re-weighting: each source keeps a deterministic
    percentage of its documents (the 'mix web down, books up' step of
    training-corpus assembly). Both the per-source keep percentage
    (10 + md5(source)%90 — self-contained for ANY source vocabulary, no
    hardcoded weight table) and the per-document coin
    (md5(doc_id || ':mix')) are pure md5 functions, so membership is
    reproducible across runs, machines and partitionings, and the
    keep test is ALL-INTEGER (h32·100 < pct·2³²) — no float threshold to
    diverge from the SQL oracle. Stateless vectorized filter, no shuffle;
    corpus-sized output → streaming Dataset."""
    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def keep(t: pa.Table) -> pa.Table:
        src = t["source"].to_pylist()
        ids = t["doc_id"].to_pylist()
        pct = np.fromiter(
            (10 + int(hashlib.md5(s.encode("utf-8")).hexdigest()[:4],
                      16) % 90 for s in src),
            dtype=np.int64, count=len(src))
        h32 = np.fromiter(
            (int(hashlib.md5(f"{i}:mix".encode("ascii")).hexdigest()[:8],
                 16) for i in ids),
            dtype=np.int64, count=len(ids))
        m = h32 * 100 < pct * 4294967296
        return pa.table({
            "doc_id": pa.array(np.asarray(ids, np.int64)[m]),
            "source": pa.array([s for s, k in zip(src, m) if k],
                               pa.string()),
            "sample_pct": pa.array(pct[m])})

    return ensure_schema(
        ds.map_batches(keep, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("source", pa.string()),
                   ("sample_pct", pa.int64())]))


# --- collocation mining: top adjacent-word bigrams -----------------------------

BIGRAM_TOP_N = 50


def q_bigram_topk(sf_dir: str) -> pd.DataFrame:
    """Top-50 adjacent-word collocations by corpus occurrence count — the
    phrase/collocation-mining step of tokenizer and n-gram-LM training,
    all-integer so the oracle compare carries no float-rounding risk.

    Per-batch bigram counting is fully vectorized (Arrow regex split →
    ``dictionary_encode`` → composed integer pair keys → ``np.unique``
    counts; no Python loop touches a word) and emits one (w1, w2, n) row
    per DISTINCT bigram per batch, so the single ``groupby`` shuffle moves
    batch vocabularies, not the corpus. A block-local top-k combiner bounds
    the driver merge to k × n_blocks rows. Ties break lexicographically,
    mirroring SQL ``ORDER BY n DESC, w1, w2``. Tokenization is lowercased
    ``\\s+`` split after trim, matching ``string_split_regex(trim(lower(
    text)), '\\s+')``."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        text = pc.fill_null(t["text"].combine_chunks(), "")
        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(text)), r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        n_words = pc.list_value_length(lists).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        enc = lists.flatten().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if codes.size < 2:
            return empty
        doc_idx = np.repeat(np.arange(len(lists), dtype=np.int64), n_words)
        same = doc_idx[:-1] == doc_idx[1:]
        if not same.any():
            return empty
        vocab = np.int64(max(len(enc.dictionary), 1))
        pair = codes[:-1][same] * vocab + codes[1:][same]
        uniq, cnt = np.unique(pair, return_counts=True)
        words = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        return pa.table({"w1": pa.array(words[uniq // vocab]),
                         "w2": pa.array(words[uniq % vocab]),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n")))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= BIGRAM_TOP_N:
            return t
        d = t.to_pandas().sort_values(["n", "w1", "w2"],
                                      ascending=[False, True, True],
                                      kind="mergesort")
        return pa.Table.from_pandas(d.head(BIGRAM_TOP_N),
                                    preserve_index=False)

    df = agg.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if df.empty:
        return typed_empty(w1="object", w2="object", n="int64")
    df["n"] = df["n"].astype(np.int64)
    return (df.sort_values(["n", "w1", "w2"], ascending=[False, True, True],
                           kind="mergesort")
            .head(BIGRAM_TOP_N).reset_index(drop=True)[["w1", "w2", "n"]])


# --- DSIR importance scoring (data selection via importance resampling) --------

DSIR_N_FEATURES = 4096        # hashed unigram feature dimension (fixed by
                              # design, so the weight table broadcast is
                              # BOUNDED at any corpus scale — Xie et al. 2023)
DSIR_TARGET_SOURCE = "src0"   # the "target distribution" slice


def _dsir_feature_batch(texts: list,
                        dim: int = DSIR_N_FEATURES) -> list[np.ndarray]:
    """Per-text arrays of hashed-unigram feature ids (md5-prefix mod
    ``dim`` — the same hex-cast convention as q_hash_split, so the DuckDB
    oracle reproduces the bucket exactly). md5 runs once per DISTINCT
    token in the batch. Shared by DSIR, the unigram-ppl filter and the
    quality classifier — the hash convention anchors exact oracles, so it
    lives in exactly one place."""
    tok_lists = [(t or "").lower().split() for t in texts]
    cache: dict[str, int] = {}
    for toks in tok_lists:
        for t in toks:
            if t not in cache:
                cache[t] = int(hashlib.md5(t.encode("utf-8"))
                               .hexdigest()[:16], 16) % dim
    get = cache.__getitem__
    return [np.fromiter(map(get, toks), np.int64, count=len(toks))
            for toks in tok_lists]


def dsir_score(sf_dir: str, target_source: str = DSIR_TARGET_SOURCE,
               n_features: int = DSIR_N_FEATURES) -> Dataset:
    """DSIR importance scoring (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169): score
    every document by the log-likelihood ratio between a hashed-unigram
    bag-of-words model of the TARGET slice (docs from ``target_source``)
    and one of the rest of the corpus, with add-1 smoothing. High scores =
    "looks like the target distribution" — the selection signal for
    importance resampling of pretraining data.

    Dataflow:

    1. *count pass*: per-batch feature-id bincounts for target and raw
       slices — the shuffle is a ``groupby(bucket)`` over ≤ n_features
       rows per batch (the hashed feature space is FIXED-dimension by
       design, which is the paper's own trick for bounding memory).
    2. *driver weights*: the (n_features)-row table turns into int64
       micro-log weights ``round((ln((nt+1)/(Nt+F)) − ln((nr+1)/(Nr+F)))
       × 1e6)``. ``math.log`` and DuckDB ``ln`` are BOTH glibc libm on
       this platform — bit-identical — and quantizing to integer micro-logs
       makes every downstream sum order-independent, so the oracle is
       exact (np.log is SIMD-vectorized and rounds differently: it would
       break the hash gate).
    3. *score pass*: one streaming re-scan sums each document's token
       weights (int64) — per-doc output → streaming Dataset.
    """
    import math

    from .collect import ensure_schema

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        feats = _dsir_feature_batch(t["text"].to_pylist())
        is_t = np.array([s == target_source
                         for s in t["source"].to_pylist()], bool)
        nt = np.zeros(n_features, np.int64)
        nr = np.zeros(n_features, np.int64)
        for f, tgt in zip(feats, is_t):
            if f.size == 0:
                continue
            c = np.bincount(f, minlength=n_features)
            if tgt:
                nt += c
            else:
                nr += c
        return pa.table({"b": pa.array(np.arange(n_features, dtype=np.int64)),
                         "nt": pa.array(nt), "nr": pa.array(nr)})

    cnt = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
           .groupby("b").aggregate(Sum("nt", alias_name="nt"),
                                   Sum("nr", alias_name="nr"))
           .to_pandas())                      # n_features rows — bounded
    nt = np.zeros(n_features, np.int64)
    nr = np.zeros(n_features, np.int64)
    if not cnt.empty:
        nt[cnt["b"].to_numpy(np.int64)] = cnt["nt"].to_numpy(np.int64)
        nr[cnt["b"].to_numpy(np.int64)] = cnt["nr"].to_numpy(np.int64)
    tot_t, tot_r = float(nt.sum() + n_features), float(nr.sum() + n_features)
    # math.log (glibc libm, == DuckDB ln) per feature — NOT np.log (SIMD,
    # different last-ulp rounding, would break the exact oracle).
    diffs = np.array([(math.log((int(a) + 1) / tot_t)
                       - math.log((int(b) + 1) / tot_r)) * 1e6
                      for a, b in zip(nt, nr)], np.float64)
    w = round_half_away(diffs, 0).astype(np.int64)
    w_ref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        wt = ray.get(w_ref)
        feats = _dsir_feature_batch(t["text"].to_pylist())
        lens = np.array([f.size for f in feats], np.int64)
        scores = np.array([int(wt[f].sum()) if f.size else 0
                           for f in feats], np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(lens, pa.int64()),
                         "score_micro": pa.array(scores, pa.int64())})

    return ensure_schema(
        ds.map_batches(score, batch_format="pyarrow", batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                   ("score_micro", pa.int64())]))


# --- unigram-LM perplexity quality filter ---------------------------------------

def _hashed_unigram_lpq(ds: Dataset,
                        n_features: int = DSIR_N_FEATURES) -> np.ndarray:
    """Count pass + int64 micro-log-prob table of the add-1-smoothed
    hashed-unigram LM over ``ds``'s ``text`` column — the shared first
    half of q_unigram_ppl and q_ccnet_buckets. One bounded
    ``groupby(bucket)`` count pass (fixed 4096-dim hashed feature space),
    then the driver folds ``round(ln((c+1)/(tot+F))·1e6)`` per feature
    with ``math.log`` (== DuckDB ``ln`` == glibc libm, bit-identical;
    np.log's SIMD rounding differs)."""
    import math

    def partial(t: pa.Table) -> pa.Table:
        feats = _dsir_feature_batch(t["text"].to_pylist())
        n = np.zeros(n_features, np.int64)
        for f in feats:
            if f.size:
                n += np.bincount(f, minlength=n_features)
        return pa.table({"b": pa.array(np.arange(n_features, dtype=np.int64)),
                         "n": pa.array(n)})

    cnt = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
           .groupby("b").aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    counts = np.zeros(n_features, np.int64)
    if not cnt.empty:
        counts[cnt["b"].to_numpy(np.int64)] = cnt["n"].to_numpy(np.int64)
    tot = float(counts.sum() + n_features)
    return round_half_away(
        np.array([math.log((int(c) + 1) / tot) * 1e6 for c in counts],
                 np.float64), 0).astype(np.int64)


def q_unigram_ppl(sf_dir: str, n_features: int = DSIR_N_FEATURES) -> Dataset:
    """Perplexity quality filter — the CCNet-style 'score every document by
    a language model of the corpus' step (Wenzek et al. 2020 use KenLM;
    the SQL-oracled stand-in is an add-1-smoothed hashed-unigram LM over
    the corpus itself). Low perplexity = typical text; high = noise.

    Same two-pass shape as dsir_score: the ``_hashed_unigram_lpq`` count
    pass builds the int64 micro-log-prob table → one streaming scoring
    pass sums each document's token log-probs as integers
    (order-independent) and exponentiates per doc with ``math.exp``
    (== DuckDB ``exp``; np.exp's SIMD rounding differs).
    ppl = exp(−avg logprob), rounded half-away to 6. Exact DuckDB
    oracle; per-doc output → streaming Dataset."""
    import math

    from .collect import ensure_schema

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    lp_ref = ray.put(_hashed_unigram_lpq(ds, n_features))

    def score(t: pa.Table) -> pa.Table:
        lp = ray.get(lp_ref)
        feats = _dsir_feature_batch(t["text"].to_pylist())
        lens = np.array([f.size for f in feats], np.int64)
        s = np.array([int(lp[f].sum()) if f.size else 0
                      for f in feats], np.int64)
        # math.exp per doc: bit-identical to the oracle's exp()
        ppl = np.array([math.exp(-(si / 1e6) / ni) if ni else 0.0
                        for si, ni in zip(s, lens)], np.float64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(lens, pa.int64()),
                         "ppl": pa.array(round_half_away(ppl, 6),
                                         pa.float64())})

    return ensure_schema(
        ds.map_batches(score, batch_format="pyarrow", batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                   ("ppl", pa.float64())]))


# --- CCNet perplexity buckets (head / middle / tail per source) -----------------

CCNET_GRID = 100       # log-grid resolution: v = floor(100·ln(1+ppl))


def q_ccnet_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020 §4.4): within each
    source, documents split into perplexity terciles — *head* (lowest-ppl
    third, cleanest text), *middle*, *tail* — the partition CCNet uses to
    downsample noisy web text before LM training. Output: per
    (source, bucket) doc count, token count and mean perplexity.

    EXACT under any partitioning, via three integer devices:

    - per-doc ppl rides the ``_hashed_unigram_lpq`` chain (integer
      log-prob sums, ``math.exp`` == DuckDB ``exp``), rounded to the 1e-6
      grid exactly as q_unigram_ppl;
    - tercile boundaries live on a BOUNDED log grid
      ``v = floor(100·ln(1+ppl))`` (``math.log`` == DuckDB ``ln``;
      v ≤ 100·ln(1+corpus tokens) < 4000 however large the corpus, unlike
      a raw-ppl grid whose distinct values grow with the corpus), so the
      CDF table the terciles are cut from is result-sized — CCNet itself
      cuts on histogram quantiles, so grid-resolution terciles are the
      published semantics, not an approximation;
    - the bucket test is all-integer cume_dist: ``3·cum > n_s`` /
      ``3·cum > 2·n_s`` — no float threshold; mean ppl folds from int64
      1e-6-grid sums and divides ONCE per output row.

    Ray shape: count pass (bounded 4096-row partials) → one streaming
    scoring pass emitting per-batch (source, v) partials → one bounded
    ``groupby((source, v))`` → driver folds the ≤ |sources|·4000-row CDF.
    Result-sized output → DataFrame."""
    import math

    ds = _read(sf_dir, "documents", ["source", "text"])
    lp_ref = ray.put(_hashed_unigram_lpq(ds))

    def partial(t: pa.Table) -> pa.Table:
        lp = ray.get(lp_ref)
        feats = _dsir_feature_batch(t["text"].to_pylist())
        lens = np.array([f.size for f in feats], np.int64)
        ppl = np.array(
            [math.exp(-(int(lp[f].sum()) / 1e6) / int(n)) if n else 0.0
             for f, n in zip(feats, lens)], np.float64)
        ppl = round_half_away(ppl, 6)          # the q_unigram_ppl output grid
        # math.log per doc: libm-bit-identical to DuckDB ln (np.log is not)
        v = np.fromiter(
            (math.floor(CCNET_GRID * math.log(1.0 + p)) for p in ppl),
            np.int64, count=len(ppl))
        pu = round_half_away(ppl * 1e6, 0).astype(np.int64)
        g = (pd.DataFrame({"source": t["source"].to_pylist(), "v": v,
                           "c": np.ones(len(v), np.int64), "nt": lens,
                           "sp": pu})
             .groupby(["source", "v"], as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    cdf = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
           .groupby(["source", "v"])
           .aggregate(Sum("c", alias_name="c"), Sum("nt", alias_name="nt"),
                      Sum("sp", alias_name="sp"))
           .to_pandas())                     # bounded: |sources| × grid
    if cdf.empty:
        return typed_empty(source="object", bucket="int64", n_docs="int64",
                           n_tokens="int64", mean_ppl="float64")
    cdf = cdf.sort_values(["source", "v"], kind="mergesort")
    cum = cdf.groupby("source")["c"].cumsum().to_numpy(np.int64)
    ns = cdf.groupby("source")["c"].transform("sum").to_numpy(np.int64)
    cdf["bucket"] = (1 + (3 * cum > ns).astype(np.int64)
                     + (3 * cum > 2 * ns).astype(np.int64))
    out = (cdf.groupby(["source", "bucket"], as_index=False)
           .agg(n_docs=("c", "sum"), n_tokens=("nt", "sum"),
                sp=("sp", "sum")))
    for c in ("bucket", "n_docs", "n_tokens"):
        out[c] = out[c].astype(np.int64)
    # sum(pu)/1e6 then /count: both engines convert the same integers to
    # double and divide in the same order — bit-identical
    out["mean_ppl"] = _r((out["sp"].astype(np.float64) / 1e6)
                         / out["n_docs"].astype(np.float64), 6)
    return (out[["source", "bucket", "n_docs", "n_tokens", "mean_ppl"]]
            .sort_values(["source", "bucket"]).reset_index(drop=True))


# --- DoReMi-style mixture reweighting --------------------------------------------

DOREMI_ETA = 1.0            # multiplicative-weights step size
DOREMI_WGRID = 1_000_000_000    # 1e9 weight grid for exact normalization


def q_doremi_weights(sf_dir: str) -> pd.DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, one
    multiplicative-weights step, deterministic stand-in): each source's
    proxy loss is its mean per-token negative log-likelihood under the
    corpus-level hashed-unigram LM (the q_unigram_ppl chain standing in
    for DoReMi's proxy model); sources with EXCESS loss over the corpus
    mean — the under-trained domains the method upweights — get weight
    ``u_s · exp(η·excess)``, normalized. Output is the training mixture
    a sampler like q_mixture_sample consumes.

    EXACT via three devices: per-source log-prob sums fold as int64
    micro-log integers (order-independent); loss/excess/exp use
    ``math.log``-free per-source driver arithmetic with ``math.exp`` ==
    DuckDB ``exp`` (libm-bit-identical); the normalizing sum — the one
    place float addition order could diverge — happens on an int64 1e9
    grid (``floor(e_s·1e9)``), so it is an integer sum and the final
    weight is one double division of two exact integers.

    Ray shape: the ``_hashed_unigram_lpq`` count pass → one streaming
    scoring pass emitting (source, n_tok, lp_sum) int partials → one
    ≤ |sources|-group groupby → driver folds the |sources|-row table.
    Result-sized → DataFrame."""
    import math

    ds = _read(sf_dir, "documents", ["source", "text"])
    lp_ref = ray.put(_hashed_unigram_lpq(ds))

    def partial(t: pa.Table) -> pa.Table:
        lp = ray.get(lp_ref)
        feats = _dsir_feature_batch(t["text"].to_pylist())
        nt = np.array([f.size for f in feats], np.int64)
        sp = np.array([int(lp[f].sum()) for f in feats], np.int64)
        g = (pd.DataFrame({"source": t["source"].to_pylist(),
                           "nt": nt, "sp": sp})
             .groupby("source", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
          .groupby("source")
          .aggregate(Sum("nt", alias_name="nt"), Sum("sp", alias_name="sp"))
          .to_pandas())                       # ≤ |sources| rows
    # empty corpus: Ray's empty aggregate loses its columns — bail before
    # the nt filter would KeyError
    if df.empty or "nt" not in df.columns:
        return typed_empty(source="object", n_tokens="int64",
                           loss="float64", excess="float64",
                           weight="float64")
    df = df[df["nt"] > 0]
    if df.empty:
        return typed_empty(source="object", n_tokens="int64",
                           loss="float64", excess="float64",
                           weight="float64")
    df = df.sort_values("source").reset_index(drop=True)
    nt = df["nt"].to_numpy(np.int64)
    sp = df["sp"].to_numpy(np.int64)
    # corpus mean loss: the same two exact integers on both engines
    loss_c = (-float(sp.sum()) / 1e6) / float(nt.sum())
    # per source: micro-int sums → double loss (one division), libm exp
    loss = np.array([(-float(s) / 1e6) / float(n)
                     for s, n in zip(sp, nt)], np.float64)
    excess = np.maximum(loss - loss_c, 0.0)
    eq = np.array([math.floor(math.exp(DOREMI_ETA * float(e))
                              * DOREMI_WGRID) for e in excess], np.int64)
    tot = int(eq.sum())                       # exact integer sum
    out = pd.DataFrame({
        "source": df["source"], "n_tokens": nt,
        "loss": round_half_away(loss, 6),
        "excess": round_half_away(excess, 6),
        "weight": round_half_away(eq.astype(np.float64) / float(tot), 6)})
    out["n_tokens"] = out["n_tokens"].astype(np.int64)
    return out


def q_curation_report(sf_dir: str) -> pd.DataFrame:
    """Per-source curation scorecard — the first table a corpus owner
    pulls before planning a training mix: doc/token counts, Gopher
    keep-rate, mean token NLL under the corpus unigram LM (the CCNet
    quality axis), and non-ASCII ratio (the encoding axis), one row per
    source. Composes three PROVEN chains (q_gopher_filter,
    q_unigram_ppl's LM, q_encoding_health) into ONE fused streaming
    pass — the per-batch partial computes all six integers together, so
    the corpus is read once (plus the bounded LM count pass), not three
    times.

    EXACT: every folded quantity is an int64 partial; the three ratios
    divide exact integers once per output row; mean NLL follows the
    q_doremi_weights arithmetic. Oracle composes the gated
    q_gopher_filter SQL (taken from the dict — cannot drift) with the
    unigram-LM and encoding replays."""
    import pyarrow.compute as pc

    from .textstats import _gopher_batch

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    lp_ref = ray.put(_hashed_unigram_lpq(ds))

    def partial(t: pa.Table) -> pa.Table:
        lp = ray.get(lp_ref)
        feats = _dsir_feature_batch(t["text"].to_pylist())
        nt = np.array([f.size for f in feats], np.int64)
        sp = np.array([int(lp[f].sum()) for f in feats], np.int64)
        keep = _gopher_batch(t)["keep"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        text = pc.fill_null(t["text"], "")
        nc = pc.utf8_length(text).cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        na = nc - pc.utf8_length(pc.replace_substring_regex(
            text, r"[^\x00-\x7F]", "")).cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        g = (pd.DataFrame({"source": t["source"].to_numpy(
                               zero_copy_only=False),
                           "c": np.ones(len(nt), np.int64),
                           "nt": nt, "sp": sp, "keep": keep,
                           "nc": nc, "na": na})
             .groupby("source", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
          .groupby("source")
          .aggregate(Sum("c", alias_name="n_docs"),
                     Sum("nt", alias_name="n_tokens"),
                     Sum("sp", alias_name="sp"),
                     Sum("keep", alias_name="n_keep"),
                     Sum("nc", alias_name="n_chars"),
                     Sum("na", alias_name="na"))
          .to_pandas())                         # ≤ |sources| rows
    if df.empty or "n_docs" not in df.columns:
        return typed_empty(source="object", n_docs="int64",
                           n_tokens="int64", keep_rate="float64",
                           mean_nll="float64",
                           non_ascii_ratio="float64")
    for c in ("n_docs", "n_tokens", "sp", "n_keep", "n_chars", "na"):
        df[c] = df[c].astype(np.int64)
    nt = df["n_tokens"].to_numpy(np.int64)
    sp = df["sp"].to_numpy(np.int64)
    df["keep_rate"] = _r(df["n_keep"].astype(np.float64)
                         / df["n_docs"].astype(np.float64), 6)
    # the q_doremi_weights arithmetic: (-sp/1e6)/nt, one division each
    df["mean_nll"] = round_half_away(np.array(
        [((-float(s) / 1e6) / float(n)) if n else 0.0
         for s, n in zip(sp, nt)], np.float64), 6)
    df["non_ascii_ratio"] = _r(
        df["na"].astype(np.float64)
        / np.maximum(df["n_chars"].to_numpy(np.int64), 1)
        .astype(np.float64), 6)
    return (df[["source", "n_docs", "n_tokens", "keep_rate", "mean_nll",
                "non_ascii_ratio"]]
            .sort_values("source").reset_index(drop=True))


# --- per-source KL divergence (corpus-mixture analysis) --------------------------

KL_SCALE = 1_000_000_000_000   # 1e12 micro-units per contribution


def q_source_entropy(sf_dir: str) -> pd.DataFrame:
    """Shannon entropy of each source's unigram distribution —
    H_s = −Σ_t (c_st/n_s)·ln(c_st/n_s) — the lexical-complexity
    companion of q_source_kl: a low-entropy source is template/
    boilerplate text however large it is, a high-entropy one carries
    real language. Reported with the vocabulary size per source.

    EXACT by the q_source_kl discipline: every (token, source) count
    resolves globally inside one combine bucket (``_source_tok_rows``);
    each term quantizes to ``floor(p·ln(p)·1e12)`` int64 (``math.log``
    == DuckDB ``ln``) so the per-source sum is order-independent; ONE
    double division per output row.

    Ray shape: the shared token-bucketed combine → per-source totals
    broadcast → one streaming scoring map over the vocabulary-sized
    count rows → a |sources|-group groupby."""
    import math

    counts = _source_tok_rows(_read(sf_dir, "documents",
                                    ["source", "text"])).materialize()
    totals = (counts.groupby("source")
              .aggregate(Sum("c_st", alias_name="n_s")).to_pandas())
    if totals.empty or "n_s" not in totals.columns:
        return typed_empty(source="object", n_tokens="int64",
                           vocab="int64", ent_q="int64",
                           entropy="float64")
    ns_map = {s: int(v) for s, v in zip(totals["source"], totals["n_s"])}
    ns_ref = ray.put(ns_map)

    def score(t: pa.Table) -> pa.Table:
        nm = ray.get(ns_ref)
        src = t["source"].to_pylist()
        c = t["c_st"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = np.array([nm[s] for s in src], np.int64)
        # math.log per vocabulary row: libm == DuckDB ln (np.log is not)
        q = np.fromiter(
            (math.floor((float(ci) * 1.0 / float(n))
                        * math.log(float(ci) * 1.0 / float(n))
                        * 1e12)
             for ci, n in zip(c, ns)), np.int64, count=len(c))
        g = (pd.DataFrame({"source": src,
                           "v": np.ones(len(c), np.int64), "q": q})
             .groupby("source", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (counts.map_batches(score, batch_format="pyarrow",
                             batch_size=65536)
          .groupby("source")
          .aggregate(Sum("v", alias_name="vocab"),
                     Sum("q", alias_name="ent_q"))
          .to_pandas())
    if df.empty:
        return typed_empty(source="object", n_tokens="int64",
                           vocab="int64", ent_q="int64",
                           entropy="float64")
    df = df.merge(totals, on="source")
    df["n_tokens"] = df["n_s"].astype(np.int64)
    for c in ("vocab", "ent_q"):
        df[c] = df[c].astype(np.int64)
    df["entropy"] = _r(-df["ent_q"].astype(np.float64) / 1e12, 6)
    return (df[["source", "n_tokens", "vocab", "ent_q", "entropy"]]
            .sort_values("source").reset_index(drop=True))


def q_source_kl(sf_dir: str) -> pd.DataFrame:
    """KL(source ‖ corpus) over unigram distributions — the data-mixture
    diagnostic of a multi-source training corpus (which sources diverge
    from the blend): ``Σ_t (c_st/n_s) · ln((c_st·n)/(n_s·c_t))`` per
    source, every term quantized to ``floor(c · 1e12)`` int64 so the sum
    is order-independent and the DuckDB oracle (same libm ``ln``, same
    integer ratios) matches bit-for-bit.

    Ray shape: ONE bucketed-by-token combine computes (source, tok, c_st)
    AND the token's corpus total c_t inside the same bucket (every row of
    a token is co-located — no second shuffle, no join); per-source token
    totals fold from a 20-row aggregate and broadcast; scoring is a
    streaming map over the vocabulary-sized count rows; the final
    ``groupby(source)`` moves one int row per (source, batch)."""
    import math

    from .combine import bucketed_combine

    ds = _read(sf_dir, "documents", ["source", "text"])

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
        # bucketed_combine requires an int key: blake2b token hash (the
        # bucket routing only — grouping inside the bucket is by string)
        from .dedup import _hash64
        cache: dict[str, int] = {}
        th = np.fromiter(
            (cache.setdefault(x, _hash64(x) // 2) for x in df["tok"]),
            np.int64, count=len(df))
        return pa.table({"tok_h": pa.array(th, pa.int64()),
                         "tok": pa.array(df["tok"], pa.string()),
                         "source": pa.array(df["source"], pa.string()),
                         "c": pa.array(df["size"].to_numpy(np.int64))})

    def per_tok(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["tok", "source"], as_index=False)
                .agg(c_st=("c", "sum")))
        tot = out.groupby("tok")["c_st"].transform("sum")
        out["c_t"] = tot.astype(np.int64)
        out["c_st"] = out["c_st"].astype(np.int64)
        return out

    counts = bucketed_combine(
        ds.map_batches(tok_counts, batch_format="pyarrow",
                       batch_size=8192),
        "tok_h", per_tok).materialize()

    totals = (counts.groupby("source")
              .aggregate(Sum("c_st", alias_name="n_s")).to_pandas())
    if totals.empty:
        return typed_empty(source="object", n_tokens="int64",
                           kl_q="int64", kl="float64")
    n = int(totals["n_s"].sum())
    ns_map = {s: int(v) for s, v in zip(totals["source"], totals["n_s"])}
    ns_ref = ray.put((ns_map, n))

    def score(t: pa.Table) -> pa.Table:
        ns_map, n = ray.get(ns_ref)
        src = t["source"].to_pylist()
        c_st = t["c_st"].to_numpy(zero_copy_only=False)
        c_t = t["c_t"].to_numpy(zero_copy_only=False)
        ns = np.array([ns_map[s] for s in src], np.int64)
        # math.log per vocabulary row: libm-bit-identical to DuckDB ln
        # (np.log is NOT) — the dsir/pmi exactness discipline
        q = np.fromiter(
            (math.floor((int(cst) / int(nsi))
                        * math.log((int(cst) * n) / (int(nsi) * int(ct)))
                        * KL_SCALE)
             for cst, nsi, ct in zip(c_st, ns, c_t)),
            np.int64, count=len(ns))
        return pa.table({"source": pa.array(src, pa.string()),
                         "kl_q": pa.array(q, pa.int64())})

    df = (counts.map_batches(score, batch_format="pyarrow",
                             batch_size=65536)
          .groupby("source").aggregate(Sum("kl_q", alias_name="kl_q"))
          .to_pandas())
    df = df.merge(totals, on="source")
    df["kl_q"] = df["kl_q"].astype(np.int64)
    df["n_tokens"] = df["n_s"].astype(np.int64)
    df["kl"] = _r(df["kl_q"] / KL_SCALE, 6)
    return (df[["source", "n_tokens", "kl_q", "kl"]]
            .sort_values("source").reset_index(drop=True))


# --- Good-Turing unseen-mass estimate per source ---------------------------------

def _source_tok_rows(ds: Dataset) -> Dataset:
    """Globally-exact (tok, source, c_st) count rows via ONE token-bucketed
    combine — the shared backbone of q_good_turing / q_token_cover (and the
    same shape q_source_kl inlines with its extra per-token corpus total).
    Tokenization is lowercased whitespace split with empties dropped,
    matching SQL ``string_split_regex(trim(lower(text)), '\\s+')``."""
    from .combine import bucketed_combine

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
        from .dedup import _hash64
        cache: dict[str, int] = {}
        th = np.fromiter(
            (cache.setdefault(x, _hash64(x) // 2) for x in df["tok"]),
            np.int64, count=len(df))
        return pa.table({"tok_h": pa.array(th, pa.int64()),
                         "tok": pa.array(df["tok"], pa.string()),
                         "source": pa.array(df["source"], pa.string()),
                         "c": pa.array(df["size"].to_numpy(np.int64))})

    def per_tok(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["tok", "source"], as_index=False)
                 .agg(c_st=("c", "sum")))

    return bucketed_combine(
        ds.map_batches(tok_counts, batch_format="pyarrow",
                       batch_size=8192),
        "tok_h", per_tok)


def q_good_turing(sf_dir: str) -> pd.DataFrame:
    """Per-source vocabulary statistics with the Good-Turing unseen-mass
    estimate ``N1/N`` (hapax-legomena count over token count) — the
    classic coverage diagnostic for corpus sampling: a source whose
    unseen mass is still high is under-sampled relative to its true
    vocabulary, one near zero is saturated.

    EXACT: token counts ride the same bucketed-by-token combine as
    ``q_source_kl`` (every (token, source) pair resolved GLOBALLY inside
    one bucket, so hapax flags are partitioning-independent integers);
    n_tokens / vocab / hapax fold as integer Sums and the single double
    division per source happens once at the end.

    Ray shape: one token-bucketed combine over per-batch count partials
    (``_source_tok_rows``); the survivor rows reduce through per-batch
    (source, 3-int) partials and a |sources|-sized groupby. Nothing
    vocabulary-sized leaves the workers."""
    counts = _source_tok_rows(_read(sf_dir, "documents",
                                    ["source", "text"]))

    def partial(t: pa.Table) -> pa.Table:
        c = t["c_st"].to_numpy(zero_copy_only=False).astype(np.int64)
        g = (pd.DataFrame({"source": t["source"].to_numpy(
                               zero_copy_only=False),
                           "n_tokens": c,
                           "vocab": np.ones(len(c), np.int64),
                           "hapax": (c == 1).astype(np.int64)})
             .groupby("source", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (counts.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
          .groupby("source")
          .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                     Sum("vocab", alias_name="vocab"),
                     Sum("hapax", alias_name="hapax"))
          .to_pandas())
    if df.empty:
        return typed_empty(source="object", n_tokens="int64",
                           vocab="int64", hapax="int64",
                           gt_unseen="float64")
    for c in ("n_tokens", "vocab", "hapax"):
        df[c] = df[c].astype(np.int64)
    n = df["n_tokens"].to_numpy(np.float64)
    df["gt_unseen"] = np.where(
        n == 0, 0.0,
        round_half_away(df["hapax"].to_numpy(np.float64)
                        / np.where(n == 0, 1.0, n), 6))
    return (df[["source", "n_tokens", "vocab", "hapax", "gt_unseen"]]
            .sort_values("source").reset_index(drop=True))


# --- vocabulary coverage: types needed for 90% of token mass --------------------

COVER_PCT_NUM, COVER_PCT_DEN = 9, 10    # cover threshold = 90% of tokens


def q_token_cover(sf_dir: str) -> pd.DataFrame:
    """Tokenizer-sizing diagnostic: per source, the minimum number of
    vocabulary types that covers ≥ 90% of the token mass (types taken in
    descending count order). A Zipf-flat source needs a big vocabulary; a
    boilerplate-heavy one saturates with a few hundred types — the number
    that sizes BPE vocabularies and spots template-dominated sources.

    EXACT, all-integer, and — the key device — independent of which
    *specific* types sit at the cut: only the per-source count HISTOGRAM
    (count value → #types with that count) matters, because types with
    equal counts are interchangeable and the partial tie-group take is
    ``ceil((need − mass_above) / c)``. The histogram is bounded (distinct
    count values are O(√tokens) under Zipf — the q_rank_normalize
    bounded-CDF argument), so the driver fold is result-sized at any
    corpus scale.

    Ray shape: the shared ``_source_tok_rows`` token-bucketed combine →
    per-batch (source, c) histogram partials → one bounded groupby →
    driver walks each source's descending-count cumulative. Oracle
    replays the walk with window cumsums + QUALIFY."""
    counts = _source_tok_rows(_read(sf_dir, "documents",
                                    ["source", "text"]))

    def hist(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({"source": t["source"].to_numpy(
                               zero_copy_only=False),
                           "c": t["c_st"].to_numpy(
                               zero_copy_only=False).astype(np.int64)})
             .groupby(["source", "c"], as_index=False).size()
             .rename(columns={"size": "k"}))
        g["k"] = g["k"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (counts.map_batches(hist, batch_format="pyarrow",
                             batch_size=65536)
          .groupby(["source", "c"]).aggregate(Sum("k", alias_name="k"))
          .to_pandas())                  # bounded histogram rows
    if df.empty:
        return typed_empty(source="object", n_tokens="int64",
                           n_types="int64", cover_types="int64",
                           cover_ratio="float64")
    rows = []
    for src, g in df.groupby("source", sort=True):
        g = g.sort_values("c", ascending=False, kind="mergesort")
        c = g["c"].to_numpy(np.int64)
        k = g["k"].to_numpy(np.int64)
        mass = c * k
        total, types = int(mass.sum()), int(k.sum())
        need = (COVER_PCT_NUM * total + COVER_PCT_DEN - 1) // COVER_PCT_DEN
        cum = np.cumsum(mass)
        i = int(np.searchsorted(cum, need))        # first cum ≥ need
        before_mass = int(cum[i]) - int(mass[i])
        before_types = int(k[:i].sum())
        cover = before_types + (need - before_mass + int(c[i]) - 1) \
            // int(c[i])
        rows.append((src, total, types, cover))
    out = pd.DataFrame(rows, columns=["source", "n_tokens", "n_types",
                                      "cover_types"])
    for col in ("n_tokens", "n_types", "cover_types"):
        out[col] = out[col].astype(np.int64)
    # one double division of two identical integers per output row
    out["cover_ratio"] = _r(out["cover_types"].astype(np.float64)
                            / out["n_types"].astype(np.float64), 6)
    return out.sort_values("source").reset_index(drop=True)


# --- BM25 top-k retrieval --------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20
BM25_QUERY_DOC = 0       # the query = distinct lowered tokens of this doc


def q_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 similar-document retrieval: score every document against the
    distinct lowered tokens of doc ``BM25_QUERY_DOC`` (classic
    more-like-this), return the top 20 (query doc excluded).

    Exactness discipline (the dsir/ppl pattern): every per-(doc, term)
    contribution quantizes to ``floor(c · 1e9)`` int64 micro-units so the
    per-doc score is an ORDER-INDEPENDENT integer sum; the idf's ``ln`` is
    ``math.log`` on the driver (glibc-libm-bit-identical to DuckDB ``ln``
    — np.log is NOT), and the tf/length normalization mirrors the oracle's
    expression tree operation-for-operation (all SQL float literals cast
    ::DOUBLE — a bare ``1.2`` parses as DECIMAL and diverges).

    Ray shape: pass A streams per-batch partials (df per query term, total
    token count, doc count — a few dozen int rows per batch, no shuffle);
    the driver folds them and broadcasts (terms, idf, avgdl) once; pass B
    scores each batch vectorized (token→term ``index_in``, bincount tf
    matrix) and emits its LOCAL top-20, so the driver sees ≤ 20 rows per
    batch — the ann_topk combiner shape for text."""
    import math

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    qrows = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filter=pc.field("doc_id") == BM25_QUERY_DOC).take_all()
    if not qrows:
        return typed_empty(doc_id="int64", bm25_q="int64", bm25="float64")
    terms = sorted(set((qrows[0]["text"] or "").lower().split()))
    if not terms:
        return typed_empty(doc_id="int64", bm25_q="int64", bm25="float64")
    terms_arr = pa.array(terms)
    t_ref = ray.put(terms_arr)

    def _doc_tokens(t: pa.Table):
        """(flat lowered tokens, raw field counts, true word counts)."""
        text = pc.fill_null(t["text"], "")
        words = pc.utf8_split_whitespace(pc.utf8_lower(text))
        nw_raw = pc.list_value_length(words).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(words)
        nonempty = (pc.utf8_length(flat).cast(pa.int64())
                    .to_numpy(zero_copy_only=False) > 0)
        csum = np.concatenate(([0], np.cumsum(nonempty.astype(np.int64))))
        ends = np.cumsum(nw_raw)
        dl = csum[ends] - csum[ends - nw_raw]
        return flat, nw_raw, dl

    def partials(t: pa.Table) -> pa.Table:
        terms_arr = ray.get(t_ref)
        flat, nw_raw, dl = _doc_tokens(t)
        ndocs = len(nw_raw)
        ti = pc.index_in(flat, value_set=terms_arr).to_numpy(
            zero_copy_only=False)
        mask = ~np.isnan(ti) if ti.dtype.kind == "f" else ti >= 0
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), nw_raw)
        hit = np.unique(doc_idx[mask] * len(terms_arr)
                        + ti[mask].astype(np.int64))
        df_part = np.bincount(hit % len(terms_arr),
                              minlength=len(terms_arr)).astype(np.int64)
        idx = np.concatenate((np.arange(len(terms_arr), dtype=np.int64),
                              [-1, -2]))
        val = np.concatenate((df_part, [int(dl.sum()), ndocs]))
        return pa.table({"idx": pa.array(idx, pa.int64()),
                         "val": pa.array(val, pa.int64())})

    agg = np.zeros(len(terms) + 2, np.int64)
    for b in (ds.map_batches(partials, batch_format="pyarrow",
                             batch_size=8192)
                .iter_batches(batch_format="pyarrow")):
        idx = b["idx"].to_numpy()
        val = b["val"].to_numpy()
        agg[np.where(idx >= 0, idx, len(terms) + (-idx) - 1)] += val
    df_counts = agg[: len(terms)]
    total_len, n_docs = int(agg[len(terms)]), int(agg[len(terms) + 1])
    if n_docs == 0:
        return typed_empty(doc_id="int64", bm25_q="int64", bm25="float64")
    avgdl = total_len / n_docs
    idf = np.array([math.log((n_docs - int(d) + 0.5) / (int(d) + 0.5) + 1.0)
                    for d in df_counts], np.float64)
    s_ref = ray.put((terms_arr, idf, avgdl))

    def score(t: pa.Table) -> pa.Table:
        terms_arr, idf, avgdl = ray.get(s_ref)
        flat, nw_raw, dl = _doc_tokens(t)
        ndocs = len(nw_raw)
        nt = len(terms_arr)
        ti = pc.index_in(flat, value_set=terms_arr).to_numpy(
            zero_copy_only=False)
        mask = ~np.isnan(ti) if ti.dtype.kind == "f" else ti >= 0
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), nw_raw)
        tf = np.bincount(doc_idx[mask] * nt + ti[mask].astype(np.int64),
                         minlength=ndocs * nt).reshape(ndocs, nt)
        tf = tf.astype(np.float64)
        dlf = dl.astype(np.float64)
        # EXACT mirror of the oracle expression tree (left-assoc):
        # floor(idf * (tf * (k1+1)) / (tf + k1*(1 - b + b*(dl/avgdl))) * 1e9)
        den = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dlf / avgdl))[:, None]
        with np.errstate(invalid="ignore", divide="ignore"):
            contrib = idf[None, :] * (tf * (BM25_K1 + 1.0)) / den * 1e9
        contrib = np.where(tf > 0, np.floor(contrib), 0.0)
        score_q = contrib.sum(axis=1).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = (ids != BM25_QUERY_DOC) & (score_q > 0)
        ids, score_q = ids[keep], score_q[keep]
        order = np.lexsort((ids, -score_q))[:BM25_TOP]
        return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                         "bm25_q": pa.array(score_q[order], pa.int64())})

    df = (ds.map_batches(score, batch_format="pyarrow", batch_size=8192)
            .to_pandas())
    if df.empty:
        return typed_empty(doc_id="int64", bm25_q="int64", bm25="float64")
    df = (df.sort_values(["bm25_q", "doc_id"], ascending=[False, True])
            .head(BM25_TOP).reset_index(drop=True))
    df["bm25"] = _r(df["bm25_q"] / 1e9, 6)
    return df


# --- C4-style line-level cleaning filter ----------------------------------------

C4_TERMINALS = (".", "!", "?", '"')
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
C4_BAD_SUBSTR = "javascript"          # line-level drop (lowered match)
C4_BAD_DOC = ("lorem ipsum", "{")     # doc-level drops (lowered match)


def q_c4_filter(sf_dir: str) -> Dataset:
    """C4-style cleaning (Raffel et al. 2020 §2.2, the public rule set):
    keep a LINE iff it ends in terminal punctuation ('.', '!', '?', '\"'
    after space/tab rstrip), has ≥ 5 whitespace words, and does not mention
    'javascript' (lowered); keep the DOC iff ≥ 3 lines survive and the raw
    text contains neither 'lorem ipsum' nor '{'. Emits the rebuilt text's
    md5 (content-verified by the oracle without moving corpus-sized strings
    through the compare) plus the line counts and the keep flag.

    One vectorized Arrow pass over lines (flatten + ends_with/word-count
    kernels), zero shuffles; the doc rebuild is a C-level join per doc.
    Exact DuckDB oracle: same predicates over an unnest of the line list,
    ``string_agg(... ORDER BY line idx)`` re-joined and md5'd."""

    def clean(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t["text"], "")
        ndocs = len(text)
        lines = pc.split_pattern(text, "\n")
        nl = pc.list_value_length(lines).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        flat = pc.list_flatten(lines)
        stripped = pc.utf8_rtrim(flat, " \t")
        term = np.zeros(len(flat), bool)
        for ch in C4_TERMINALS:
            term |= pc.ends_with(stripped, ch).to_numpy(zero_copy_only=False)
        # words per line = nonempty whitespace-split fields
        wsplit = pc.utf8_split_whitespace(flat)
        wflat_len = pc.utf8_length(pc.list_flatten(wsplit)).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        nw_raw = pc.list_value_length(wsplit).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        csum = np.concatenate(([0], np.cumsum((wflat_len > 0).astype(
            np.int64))))
        ends = np.cumsum(nw_raw)
        line_words = csum[ends] - csum[ends - nw_raw]
        nojs = ~pc.match_substring(pc.utf8_lower(flat),
                                   C4_BAD_SUBSTR).to_numpy(
            zero_copy_only=False)
        keep_line = term & (line_words >= C4_MIN_LINE_WORDS) & nojs

        lo = pc.utf8_lower(text)
        bad_doc = np.zeros(ndocs, bool)
        for pat in C4_BAD_DOC:
            bad_doc |= pc.match_substring(lo, pat).to_numpy(
                zero_copy_only=False)

        flat_py = flat.to_pylist()
        doc_ends = np.cumsum(nl)
        n_kept, md5s = np.zeros(ndocs, np.int64), []
        for i in range(ndocs):
            s, e = doc_ends[i] - nl[i], doc_ends[i]
            kept = [flat_py[j] for j in range(s, e) if keep_line[j]]
            n_kept[i] = len(kept)
            md5s.append(hashlib.md5("\n".join(kept).encode("utf-8"))
                        .hexdigest())
        keep = ((n_kept >= C4_MIN_KEPT_LINES) & ~bad_doc).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_lines": pa.array(nl, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "keep": pa.array(keep, pa.int64()),
            "clean_md5": pa.array(md5s, pa.string()),
        })

    return ensure_schema(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            clean, batch_format="pyarrow", batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("n_lines", pa.int64()),
                   ("n_kept", pa.int64()), ("keep", pa.int64()),
                   ("clean_md5", pa.string())]))


# --- unicode text normalization (NFC + whitespace canonicalization) -------------

def q_text_normalize(sf_dir: str) -> Dataset:
    """Canonicalize document text for training: Unicode NFC normalization
    (composed accents — 'e'+U+0301 → 'é') then whitespace squashing and
    trimming. NFC runs through ``unicodedata.normalize`` (one C call per
    string — pyarrow 16's ``utf8_normalize`` does NOT compose combining
    marks, silently diverging from DuckDB's ``nfc_normalize``; caught by
    the planted test); the squash is vectorized RE2 (``\\s+`` — pyarrow
    and DuckDB agree) and the trim strips exactly the single leading /
    trailing space the squash can leave (mirroring DuckDB ``trim``). The
    output row carries the md5 of the normalized text (so the corpus-sized
    compare moves 32-hex digests, not documents) plus the normalized
    code-point length. Zero shuffles — streams at any scale."""
    import unicodedata

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    schema = pa.schema([("doc_id", pa.int64()),
                        ("norm_md5", pa.string()),
                        ("n_chars_norm", pa.int64())])

    def norm(t: pa.Table) -> pa.Table:
        comp = [unicodedata.normalize("NFC", s or "")
                for s in t["text"].to_pylist()]
        x = pc.replace_substring_regex(pa.array(comp, pa.string()),
                                       pattern=r"\s+", replacement=" ")
        x = pc.utf8_trim(x, characters=" ")
        digests = [hashlib.md5(s.encode("utf-8")).hexdigest()
                   for s in x.to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "norm_md5": pa.array(digests, pa.string()),
            "n_chars_norm": pc.utf8_length(x).cast(pa.int64())})

    return ensure_schema(
        ds.map_batches(norm, batch_format="pyarrow", batch_size=8192),
        schema)


# --- bigram-LM perplexity quality filter -----------------------------------------

def _bigram_feature_batch(texts: list,
                          dim: int = DSIR_N_FEATURES) -> list[tuple]:
    """Per-text (ctx_ids, pair_ids) hashed-bigram features: ctx = md5
    bucket of w1, pair = md5 bucket of "w1 w2" (md5-prefix convention,
    shared with ``_dsir_feature_batch`` so the DuckDB oracle replays the
    buckets exactly). md5 runs once per DISTINCT token / pair per batch."""
    tok_lists = [(t or "").lower().split() for t in texts]
    cache: dict[str, int] = {}

    def bucket(s: str) -> int:
        v = cache.get(s)
        if v is None:
            v = int(hashlib.md5(s.encode("utf-8"))
                    .hexdigest()[:16], 16) % dim
            cache[s] = v
        return v

    out = []
    for toks in tok_lists:
        if len(toks) < 2:
            out.append((np.array([], np.int64), np.array([], np.int64)))
            continue
        ctx = np.fromiter((bucket(t) for t in toks[:-1]), np.int64,
                          count=len(toks) - 1)
        pair = np.fromiter(
            (bucket(a + " " + b) for a, b in zip(toks[:-1], toks[1:])),
            np.int64, count=len(toks) - 1)
        out.append((ctx, pair))
    return out


def q_bigram_ppl(sf_dir: str, n_features: int = DSIR_N_FEATURES) -> Dataset:
    """Bigram-LM perplexity quality filter — one conditioning step up from
    ``q_unigram_ppl`` (CCNet's KenLM is a 5-gram of the same family):
    score every document by an add-1-smoothed hashed-BIGRAM language model
    of the corpus, ``P(w2|w1) = (c(w1 w2)+1) / (c(w1·)+F)`` over fixed
    4096-bucket hash spaces for both the pair and the context.

    Exactness mechanics (shared with dsir_score / q_unigram_ppl): the
    per-bigram log-prob DECOMPOSES into two bounded int64 micro-log
    tables — ``round(ln(c_pair+1)·1e6) − round(ln(c_ctx+F)·1e6)`` — so
    per-doc scores are integer sums (order-independent under any
    partitioning) and ``math.log`` / ``math.exp`` are bit-identical to
    DuckDB ``ln`` / ``exp`` (both glibc libm). Dataflow: one bounded
    ``groupby(bucket)`` count pass (≤ 4096 rows per batch) → driver builds
    the two 32 KiB weight tables → one broadcast streaming scoring pass.
    Per-doc output → streaming Dataset."""
    import math

    from .collect import ensure_schema

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        feats = _bigram_feature_batch(t["text"].to_pylist(), n_features)
        nc = np.zeros(n_features, np.int64)
        npair = np.zeros(n_features, np.int64)
        for ctx, pair in feats:
            if ctx.size:
                nc += np.bincount(ctx, minlength=n_features)
                npair += np.bincount(pair, minlength=n_features)
        return pa.table({
            "b": pa.array(np.arange(n_features, dtype=np.int64)),
            "n_ctx": pa.array(nc), "n_pair": pa.array(npair)})

    cnt = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
           .groupby("b").aggregate(Sum("n_ctx", alias_name="n_ctx"),
                                   Sum("n_pair", alias_name="n_pair"))
           .to_pandas())
    n_ctx = np.zeros(n_features, np.int64)
    n_pair = np.zeros(n_features, np.int64)
    if not cnt.empty:
        b = cnt["b"].to_numpy(np.int64)
        n_ctx[b] = cnt["n_ctx"].to_numpy(np.int64)
        n_pair[b] = cnt["n_pair"].to_numpy(np.int64)
    lnum = round_half_away(
        np.array([math.log(int(c) + 1) * 1e6 for c in n_pair], np.float64),
        0).astype(np.int64)
    lden = round_half_away(
        np.array([math.log(int(c) + n_features) * 1e6 for c in n_ctx],
                 np.float64), 0).astype(np.int64)
    w_ref = ray.put((lnum, lden))

    def score(t: pa.Table) -> pa.Table:
        ln_, ld_ = ray.get(w_ref)
        feats = _bigram_feature_batch(t["text"].to_pylist(), n_features)
        lens = np.array([c.size for c, _ in feats], np.int64)
        s = np.array([int(ln_[p].sum() - ld_[c].sum()) if c.size else 0
                      for c, p in feats], np.int64)
        ppl = np.array([math.exp(-(si / 1e6) / ni) if ni else 0.0
                        for si, ni in zip(s, lens)], np.float64)
        return pa.table({"doc_id": t["doc_id"],
                         "n_bigrams": pa.array(lens, pa.int64()),
                         "ppl": pa.array(round_half_away(ppl, 6),
                                         pa.float64())})

    return ensure_schema(
        ds.map_batches(score, batch_format="pyarrow", batch_size=8192),
        pa.schema([("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
                   ("ppl", pa.float64())]))


# --- PMI collocation mining (libm-exact log scoring) ----------------------------

PMI_MIN_COUNT = 5
PMI_TOP_N = 50


def q_pmi_topk(sf_dir: str) -> pd.DataFrame:
    """Top-50 adjacent-word collocations by pointwise mutual information,
    PMI = ln(c₁₂·N / (c₁·c₂)) — the association-strength upgrade of
    ``q_bigram_topk`` (raw counts favor stopword pairs; PMI surfaces real
    phrases).

    Exactness: all counts fold as integers; the score decomposes as
    ``ln c₁₂ + ln N − ln c₁ − ln c₂`` evaluated per SURVIVING pair with
    ``math.log`` (glibc-libm, bit-identical to DuckDB ``ln`` — np.log is
    NOT), so no float ever crosses a partition boundary. Scale shape:
    per-batch vectorized bigram/unigram partials (dictionary-encode, no
    Python per word) → two count groupbys → the ``n ≥ 5`` filter prunes
    the pair table BEFORE two DISTRIBUTED joins attach unigram counts
    (the vocabulary is corpus-scale — never broadcast) → block-local
    top-k bounds the driver merge. The pair-count table is materialized
    once: N (total bigrams) and the filtered stream both read it without
    recomputing the corpus scan."""
    ds = _read(sf_dir, "documents", ["text"])

    def tok_lists(t: pa.Table):
        text = pc.fill_null(t["text"].combine_chunks(), "")
        lists = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(text)), r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        return lists

    def pair_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"w1": pa.array([], pa.string()),
                          "w2": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        lists = tok_lists(t)
        n_words = pc.list_value_length(lists).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        enc = lists.flatten().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if codes.size < 2:
            return empty
        doc_idx = np.repeat(np.arange(len(lists), dtype=np.int64), n_words)
        same = doc_idx[:-1] == doc_idx[1:]
        if not same.any():
            return empty
        vocab = np.int64(max(len(enc.dictionary), 1))
        pair = codes[:-1][same] * vocab + codes[1:][same]
        uniq, cnt = np.unique(pair, return_counts=True)
        words = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        return pa.table({"w1": pa.array(words[uniq // vocab]),
                         "w2": pa.array(words[uniq % vocab]),
                         "n": pa.array(cnt.astype(np.int64))})

    def unigram_partial(t: pa.Table) -> pa.Table:
        enc = tok_lists(t).flatten().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if not codes.size:
            return pa.table({"w": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        uniq, cnt = np.unique(codes, return_counts=True)
        words = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        return pa.table({"w": pa.array(words[uniq]),
                         "c": pa.array(cnt.astype(np.int64))})

    pairs = (ds.map_batches(pair_partial, batch_format="pyarrow")
             .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
             .materialize())
    empty = typed_empty(w1="object", w2="object", n="int64", pmi="float64")
    n_total = pairs.sum("n") if pairs.count() else 0
    if not n_total:
        return empty
    uni = (ds.map_batches(unigram_partial, batch_format="pyarrow")
           .groupby("w").aggregate(Sum("c", alias_name="c")))

    surv = pairs.filter(expr=f"n >= {PMI_MIN_COUNT}")
    surv = surv.materialize()
    if surv.count() == 0:
        return empty
    j = (surv.rename_columns({"w1": "w"})
         .join(uni, join_type="inner", num_partitions=scale.join_partitions(),
               on=("w",))
         .rename_columns({"w": "w1", "c": "c1"})
         .rename_columns({"w2": "w"})
         .join(uni, join_type="inner", num_partitions=scale.join_partitions(),
               on=("w",))
         .rename_columns({"w": "w2", "c": "c2"}))
    import math
    ln_n = math.log(n_total)

    def score_topk(t: pa.Table) -> pa.Table:
        d = t.to_pandas()
        lncache: dict[int, float] = {}

        def ln(c: int) -> float:
            v = lncache.get(c)
            if v is None:
                v = math.log(c)
                lncache[c] = v
            return v

        d["pmi"] = round_half_away(np.array(
            [ln(int(a)) + ln_n - ln(int(b)) - ln(int(cc))
             for a, b, cc in zip(d["n"], d["c1"], d["c2"])]), 6)
        d = d.sort_values(["pmi", "w1", "w2"],
                          ascending=[False, True, True], kind="mergesort")
        return pa.Table.from_pandas(
            d.head(PMI_TOP_N)[["w1", "w2", "n", "pmi"]],
            preserve_index=False)

    df = j.map_batches(score_topk, batch_format="pyarrow").to_pandas()
    if df.empty:
        return empty
    df["n"] = df["n"].astype(np.int64)
    return (df.sort_values(["pmi", "w1", "w2"],
                           ascending=[False, True, True], kind="mergesort")
            .head(PMI_TOP_N).reset_index(drop=True)[["w1", "w2", "n", "pmi"]])


# --- temperature-weighted source mixing ---------------------------------------

MIX_ALPHA = 0.3           # sampling temperature exponent (mT5-style)
MIX_BUDGET = 1_000_000    # integer draw budget the floor-quota is taken from
_MIX_WQ = 1_000_000_000   # weight quantization grid (1e-9 resolution)


def q_temperature_mix(sf_dir: str, alpha: float = MIX_ALPHA) -> pd.DataFrame:
    """Temperature-weighted corpus mixing plan: per-source sampling
    weights ``n_docs ** alpha`` (alpha < 1 upsamples low-resource
    sources — the multilingual-LM sampling rule of Arivazhagan et al. '19
    / mT5), normalized to probabilities and to an integer draw quota out
    of ``MIX_BUDGET``. The float chain is exact under any partitioning:
    ``pow`` is a single libm call on the REDUCED per-source count (shared
    bit-for-bit with DuckDB's ``pow``), the weight is quantized to an
    int64 grid before the normalizing sum (integer summation has no
    order), and the quota is pure BIGINT floor arithmetic.

    Scale shape: one per-batch partial count + a source-cardinality
    groupby; everything after is result-sized driver math."""
    ds = _read(sf_dir, "documents", ["source"])

    def partial(t: pa.Table) -> pa.Table:
        c = t["source"].combine_chunks().value_counts()
        return pa.table({"source": c.field("values"),
                         "n": c.field("counts").cast(pa.int64())})

    g = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("source").aggregate(Sum("n", alias_name="n_docs"))
         .to_pandas())
    if g.empty:
        return typed_empty(source="object", n_docs="int64", weight="float64",
                           prob="float64", quota="int64")
    n = g["n_docs"].to_numpy(np.int64)
    wq = np.array([int(round_half_away(float(x) ** alpha * _MIX_WQ, 0))
                   for x in n], dtype=np.int64)
    total = int(wq.sum())
    out = pd.DataFrame({
        "source": g["source"].astype(object),
        "n_docs": pd.Series(n, dtype="int64"),
        "weight": round_half_away(wq / _MIX_WQ, 6),
        "prob": round_half_away(wq / total, 6),
        "quota": pd.Series(wq * MIX_BUDGET // total, dtype="int64"),
    })
    return out.sort_values("source").reset_index(drop=True)


# --- dedup survivorship by source ---------------------------------------------


def q_dedup_survivorship(sf_dir: str) -> pd.DataFrame:
    """Per-source survivorship of exact dedup: how many of a source's
    documents remain after keep-min-doc-per-md5(text) — the pipeline
    health metric that tells you WHERE the duplication lives (a crawl
    source with 40% survival is mostly mirrors; 100% is unique content).

    Scale shape: the ``dedup_exact`` bucketed min-per-fingerprint combine,
    except each bucket group resolves the survivor's SOURCE locally
    (idxmin over the bucket's rows — fingerprint groups never span
    buckets), so survivors reduce straight to per-source count partials
    inside the combine; the driver sees only source-cardinality rows from
    both sides (totals + survivor counts)."""
    from .combine import bucketed_combine

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def add_hash(t: pa.Table) -> pa.Table:
        md5s = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
                for x in t["text"].to_pylist()]
        fph = np.array([np.uint64(int(m[:16], 16)) for m in md5s],
                       np.uint64).view(np.int64)
        return pa.table({"doc_id": t["doc_id"],
                         "source": t["source"],
                         "fingerprint": pa.array(md5s, pa.string()),
                         "fph": pa.array(fph, pa.int64())})

    def survivors_per_source(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.loc[g.groupby("fingerprint")["doc_id"].idxmin()]
        out = (keep.groupby("source", as_index=False)
               .agg(ns=("doc_id", "size")))
        out["ns"] = out["ns"].astype(np.int64)
        return out[["source", "ns"]]

    sv = (bucketed_combine(
            ds.map_batches(add_hash, batch_format="pyarrow",
                           batch_size=8192),
            "fph", survivors_per_source)
          .groupby("source").aggregate(Sum("ns", alias_name="n_survivors"))
          .to_pandas())

    def totals(t: pa.Table) -> pa.Table:
        c = t["source"].combine_chunks().value_counts()
        return pa.table({"source": c.field("values"),
                         "n": c.field("counts").cast(pa.int64())})

    tot = (ds.map_batches(totals, batch_format="pyarrow")
           .groupby("source").aggregate(Sum("n", alias_name="n_docs"))
           .to_pandas())
    if tot.empty:
        return typed_empty(source="object", n_docs="int64",
                           n_survivors="int64", survival_rate="float64")
    out = tot.merge(sv, on="source", how="left")
    out["n_survivors"] = out["n_survivors"].fillna(0).astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["survival_rate"] = round_half_away(
        out["n_survivors"].to_numpy(np.float64)
        / out["n_docs"].to_numpy(np.float64), 6)
    return (out[["source", "n_docs", "n_survivors", "survival_rate"]]
            .sort_values("source").reset_index(drop=True))


# --- inverted-index build: token -> sorted doc-id posting list ------------------

def q_inverted_index(sf_dir: str) -> Dataset:
    """Distributed inverted-index construction — the retrieval-side
    artifact of a training-data pipeline (contamination lookups, BM25
    serving, dedup audits all consume posting lists). One row per
    distinct token: document frequency + the comma-joined ``doc_id``
    posting list in ascending order.

    Scale shape: a document lives in exactly one input row, so the
    per-batch distinct (doc_id, tok) projection is already the GLOBAL
    distinct — the only corpus-sized exchange is ONE token-bucketed
    combine (``bucketed_combine``: many tokens per group call) that
    sorts and joins each token's postings locally. The vocabulary-sized
    output streams as a Dataset; no global sort (the driver gate
    canonicalizes row order). Tokenization is the vocab convention:
    lowercased single-space split = SQL ``string_split(lower(text), ' ')``."""
    from .combine import bucketed_combine
    from .dedup import _hash64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    schema = pa.schema([("tok", pa.string()), ("df", pa.int64()),
                        ("postings", pa.string())])

    def doc_tok_pairs(t: pa.Table) -> pa.Table:
        s = pd.Series(t["text"].to_pylist(),
                      index=t["doc_id"].to_pylist()).fillna("")
        ex = s.str.lower().str.split(" ").explode()
        ex = ex[ex != ""]
        pairs = (ex.rename("tok").rename_axis("doc_id").reset_index()
                 .drop_duplicates())
        cache: dict[str, int] = {}
        th = np.fromiter(
            (cache.setdefault(x, _hash64(x) // 2) for x in pairs["tok"]),
            np.int64, count=len(pairs))
        return pa.table({
            "tok_h": pa.array(th, pa.int64()),
            "tok": pa.array(pairs["tok"], pa.string()),
            "doc_id": pa.array(pairs["doc_id"].to_numpy(np.int64))})

    def build_postings(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tok", "doc_id"], kind="mergesort")
        out = (g.groupby("tok", sort=False)["doc_id"]
               .agg([("df", "size"),
                     ("postings", lambda d: ",".join(map(str, d)))])
               .reset_index())
        out["df"] = out["df"].astype(np.int64)
        return out[["tok", "df", "postings"]]

    return ensure_schema(
        bucketed_combine(
            ds.map_batches(doc_tok_pairs, batch_format="pyarrow",
                           batch_size=4096),
            "tok_h", build_postings),
        schema)


# --- deterministic per-source hash sampling (reproducible subcorpus) -----------

HASH_SAMPLE_K = 20


def q_hash_sample(sf_dir: str, k: int = HASH_SAMPLE_K) -> pd.DataFrame:
    """Reproducible per-source sample: the ``k`` docs with the smallest
    md5-64 hash of their id per source — the standard deterministic
    "uniform random but replayable" subcorpus pick for eval sets and
    ablations (hash rank ~ uniform order; no RNG state, any worker/rerun
    agrees). Output (source, rk, doc_id) — the hash itself stays internal
    (uint64 would overflow the gate's int64 canon).

    Ray shape: per-batch local top-k per source (sort by (source, hash)
    combiner), then one driver fold over k × n_batches × |sources|
    candidate rows — result-sized; the corpus never concentrates. Exactly
    SQL-oracle-able via the shared md5 bridge
    (``('0x' || substr(md5(id),1,16))::UBIGINT`` == ``dedup._md5_64``)."""
    from .dedup import _md5_64

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "hkey": pa.array([], pa.uint64())})
        h = np.fromiter((_md5_64(str(int(d))) for d in ids), np.uint64,
                        count=len(ids))
        g = pd.DataFrame({
            "source": t["source"].to_numpy(zero_copy_only=False),
            "doc_id": ids.astype(np.int64), "hkey": h})
        g = (g.sort_values(["source", "hkey", "doc_id"], kind="mergesort")
             .groupby("source", sort=False).head(k))
        return pa.Table.from_pandas(g, preserve_index=False)

    cand = (ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=8192).to_pandas())
    if cand.empty:
        return typed_empty(source="object", rk="int64", doc_id="int64")
    cand = (cand.sort_values(["source", "hkey", "doc_id"], kind="mergesort")
            .groupby("source", sort=False).head(k))
    cand["rk"] = cand.groupby("source", sort=False).cumcount() + 1
    out = cand[["source", "rk", "doc_id"]].reset_index(drop=True)
    out["rk"] = out["rk"].astype(np.int64)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out.sort_values(["source", "rk"]).reset_index(drop=True)


# --- intra-document n-gram repetition (Gopher rep signal) ----------------------

REP_NGRAM_N = 3
REP_MAX_RATIO_PCT = 30   # keep iff duplicate-trigram share <= 30%


def q_rep_ngram_ratio(sf_dir: str) -> Dataset:
    """Per-doc duplicate-trigram share — the Gopher repetition filter
    (Rae et al. 2021, arXiv:2112.11446 §A1.1: "fraction of duplicate
    n-grams") the quality family was missing: documents that loop the
    same phrases score high and get dropped before training.

    ``rep_ratio = (n_trigrams − n_distinct) / n_trigrams`` (0 when no
    trigram), ``keep`` decided ALL-INTEGER
    (``100·dups ≤ REP_MAX_RATIO_PCT·n_trigrams``) so no float threshold
    can flip; the ratio itself is one exact int division rounded to 6.
    Tokenization is the vocab convention: lowercased single-space split ==
    SQL ``string_split(lower(text), ' ')`` with empties dropped.

    Ray shape: embarrassingly parallel per-doc map (docs live whole in one
    row), zero shuffle; corpus-sized output streams as a Dataset."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    schema = pa.schema([("doc_id", pa.int64()), ("n_trigrams", pa.int64()),
                        ("n_distinct", pa.int64()),
                        ("rep_ratio", pa.float64()), ("keep", pa.int64())])

    def per_doc(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n_tri = np.zeros(len(ids), np.int64)
        n_dis = np.zeros(len(ids), np.int64)
        for j, txt in enumerate(t["text"].to_pylist()):
            w = [x for x in (txt or "").lower().split(" ") if x != ""]
            if len(w) < REP_NGRAM_N:
                continue
            grams = [" ".join(w[i:i + REP_NGRAM_N])
                     for i in range(len(w) - REP_NGRAM_N + 1)]
            n_tri[j] = len(grams)
            n_dis[j] = len(set(grams))
        dup = n_tri - n_dis
        ratio = np.where(
            n_tri == 0, 0.0,
            round_half_away(dup / np.where(n_tri == 0, 1, n_tri), 6))
        keep = (100 * dup <= REP_MAX_RATIO_PCT * n_tri).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids.astype(np.int64)),
                         "n_trigrams": pa.array(n_tri),
                         "n_distinct": pa.array(n_dis),
                         "rep_ratio": pa.array(ratio, pa.float64()),
                         "keep": pa.array(keep)})

    return ensure_schema(
        ds.map_batches(per_doc, batch_format="pyarrow", batch_size=4096),
        schema)


# --- weighted sampling without replacement (Efraimidis-Spirakis) ------------------

WSAMPLE_K = 50


def q_weighted_sample(sf_dir: str, k: int = WSAMPLE_K) -> pd.DataFrame:
    """Reproducible WEIGHTED sample without replacement: the top-``k``
    documents by the Efraimidis-Spirakis key ``ln(u) / w`` (u uniform,
    w = n_chars) — the standard one-pass distributed weighted reservoir
    ("Weighted random sampling with a reservoir", IPL 2006), the
    pick-probability-proportional-to-length subcorpus draw a mixture
    plan executes. Deterministic and exactly SQL-oracled: u is the md5
    bridge hash of the doc id divided by 2^64 (a power of two — the
    division is EXACT), ln is the shared libm, the key ratio is one
    deterministic division, and ranking compares identical doubles
    (md5 makes ties impossible). Zero-weight docs are excluded on both
    sides.

    Ray shape: per-batch local top-k combiner (sort by key desc), one
    driver fold over k × n_batches candidate rows — result-sized, the
    corpus never concentrates."""
    from .dedup import _md5_64

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = w > 0
        ids, w = ids[keep], w[keep]
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64()),
                             "es_key": pa.array([], pa.float64())})
        h = np.fromiter((_md5_64(str(int(d))) for d in ids), np.uint64,
                        count=len(ids))
        u = h.astype(np.float64) / float(1 << 64)   # exact /2^64
        key = np.log(u) / w.astype(np.float64)
        g = (pd.DataFrame({"doc_id": ids, "n_chars": w, "es_key": key})
             .sort_values("es_key", ascending=False, kind="mergesort")
             .head(k))
        return pa.Table.from_pandas(g, preserve_index=False)

    cand = (ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=8192).to_pandas())
    if cand.empty:
        return typed_empty(rk="int64", doc_id="int64", n_chars="int64")
    out = (cand.sort_values("es_key", ascending=False, kind="mergesort")
           .head(k).reset_index(drop=True))
    out["rk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rk", "doc_id", "n_chars"]]


def q_split_leakage(sf_dir: str) -> pd.DataFrame:
    """Train/test 3-gram leakage of the md5 hash split — the split-hygiene
    check run before trusting held-out numbers: what fraction of the test
    split's distinct word-3-grams also occur somewhere in the train
    split. (q_contamination checks the corpus against an external
    benchmark sliver; this checks the split against ITSELF, so BOTH sides
    are corpus-sized — no broadcast is possible and the overlap must fold
    gram-bucketed.)

    All-integer counts + one division, exactly SQL-oracled: the split is
    the shared ``_md5_bucket`` rule (train < 80, test ≥ 90; val excluded),
    grams are the lowered trimmed whitespace trigrams of the
    dedup_ngram_jaccard oracle convention, and per-gram side flags fold
    as ``max`` — order-free.

    Ray shape: one scan emits batch-local-distinct (gram-hash, in_train,
    in_test) int rows; ONE gram-bucketed combine resolves each gram's
    global side flags and reduces to three per-bucket BIGINT partials
    (train/test/both counts); the driver sums ≤ n_buckets rows. The gram
    vocabulary never concentrates anywhere."""
    from .dedup import _md5_64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    empty = typed_empty(n_train_grams="int64", n_test_grams="int64",
                        n_shared="int64", leak_frac="float64")
    if ds.count() == 0:
        return empty

    def gram_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        gh, tr, te = [], [], []
        cache: dict[str, int] = {}
        for d, x in zip(ids, texts):
            b = _md5_bucket(int(d))
            if TRAIN_PCT <= b < TRAIN_PCT + VAL_PCT:
                continue            # val docs don't participate
            is_test = b >= TRAIN_PCT + VAL_PCT
            toks = (x or "").lower().strip().split()
            if len(toks) < 3:
                continue
            seen = set()
            for i in range(len(toks) - 2):
                g3 = " ".join(toks[i:i + 3])
                h = cache.get(g3)
                if h is None:
                    h = _md5_64(g3) // 2
                    cache[g3] = h
                if h not in seen:
                    seen.add(h)
                    gh.append(h)
                    tr.append(0 if is_test else 1)
                    te.append(1 if is_test else 0)
        return pa.table({"gh": pa.array(gh, pa.int64()),
                         "tr": pa.array(tr, pa.int64()),
                         "te": pa.array(te, pa.int64())})

    from .combine import bucketed_combine

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        per = (g.groupby("gh", as_index=False)
               .agg(tr=("tr", "max"), te=("te", "max")))
        return pd.DataFrame({
            "n_train_grams": np.array([per["tr"].sum()], np.int64),
            "n_test_grams": np.array([per["te"].sum()], np.int64),
            "n_shared": np.array([(per["tr"] * per["te"]).sum()],
                                 np.int64)})

    parts = bucketed_combine(
        ds.map_batches(gram_rows, batch_format="pyarrow",
                       batch_size=4096),
        "gh", fold).to_pandas()
    ntr = int(parts["n_train_grams"].sum()) if len(parts) else 0
    nte = int(parts["n_test_grams"].sum()) if len(parts) else 0
    nsh = int(parts["n_shared"].sum()) if len(parts) else 0
    leak = 0.0 if nte == 0 else round_half_away(nsh / float(nte), 6)
    return pd.DataFrame({
        "n_train_grams": np.array([ntr], np.int64),
        "n_test_grams": np.array([nte], np.int64),
        "n_shared": np.array([nsh], np.int64),
        "leak_frac": np.array([leak], np.float64)})


# --- empirical-quantile (rank) normalization --------------------------------------

def q_rank_normalize(sf_dir: str) -> Dataset:
    """Empirical-quantile normalization of document length: every doc's
    ``n_chars`` maps to its corpus CDF position ``count(≤ v) / N`` — the
    distribution-free feature transform (quantile/rank normalization)
    ML-prep applies before mixing heterogeneous sources whose raw scales
    differ.

    EXACT under any partitioning: the CDF is built from the
    (value, count) reduction — distinct lengths are bounded by the max
    document size, not the corpus (the q_ks_drift argument) — so the
    broadcast table is result-sized; each row's rank is an integer table
    lookup and the single division ``cum / N`` is the same two integers
    on both engines. Oracle replays it as ``cume_dist()``.

    Ray shape: pass A = per-batch value-count partials → one
    |values|-sized groupby → driver fold → ``ray.put`` of the sorted
    (values, cumulative) arrays; pass B = one streaming searchsorted
    map over the corpus. Output corpus-sized → Dataset."""
    from ray.data.aggregate import Sum

    schema = pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64()),
                        ("pct_rank", pa.float64())])
    path = f"{sf_dir}/documents.parquet"
    ds = ray.data.read_parquet(
        path, columns=["doc_id", "n_chars"],
        override_num_blocks=scale.read_blocks_for_path(path))

    def vc(t: pa.Table) -> pa.Table:
        v = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(uk),
                         "c": pa.array(cnt.astype(np.int64))})

    counts = (ds.map_batches(vc, batch_format="pyarrow",
                             batch_size=65536)
              .groupby("v").aggregate(Sum("c", alias_name="c"))
              .to_pandas())      # |distinct lengths| rows — bounded
    if counts.empty:
        return ensure_schema(ray.data.from_items([]), schema)
    counts = counts.sort_values("v")
    vals = counts["v"].to_numpy(np.int64)
    cum = np.cumsum(counts["c"].to_numpy(np.int64))
    n_total = int(cum[-1])
    cdf_ref = ray.put((vals, cum, n_total))

    def score(t: pa.Table) -> pa.Table:
        vals, cum, n = ray.get(cdf_ref)
        v = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(vals, v, side="right") - 1
        pct = round_half_away(
            cum[pos].astype(np.float64) / np.float64(n), 6)
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "n_chars": pa.array(v),
            "pct_rank": pa.array(pct)})

    return ensure_schema(
        ds.map_batches(score, batch_format="pyarrow", batch_size=65536),
        schema)
