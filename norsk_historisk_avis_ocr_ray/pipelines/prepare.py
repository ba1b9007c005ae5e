"""Resumable training-corpus preparation job.

The mlprep capstone (quality filter + token floor + benchmark
decontamination + exact dedup — `functions/mlprep.py`) wired into the same
manifest/atomic-write protocol as the extraction runner (`pipelines/run.py`,
`state/manifest.py`): documents parquet in → hash-sharded, filtered,
deduped training-corpus parquet out, resumable per OUTPUT SHARD.

Dataflow (all streaming until the per-shard writes):

1. one pass builds the benchmark 3-gram sliver (broadcast once);
2. one fused pass computes every per-doc signal and drops rejects BEFORE
   any shuffle (`corpus_fused_signals(with_text=True)`);
3. the dedup ``groupby(md5)`` keeps min-doc_id per fingerprint — the text
   and signals ride the aggregate as ``Min`` columns (identical text ⇒
   identical values, so Min is exact and no join-back is needed);
4. survivors are hash-sharded (``splitmix64(doc_id) % n_shards``) and each
   shard group writes its parquet to a temp path → atomic rename →
   manifest line with lineage (rows, tokens, bytes, wall). A re-run
   anti-joins the shard list against the manifest and only writes pending
   shards; a crash between rename and commit re-writes that shard
   idempotently (the rename replaces it).

Per-shard output means a 100-TB run resumes at shard granularity and the
output directory is consumable while later shards are still writing.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
from ray.data import Dataset
from ray.data.aggregate import Min

from ..functions.dedup import _fmix64
from ..functions.mlprep import corpus_bench_hashes, corpus_fused_signals
from ..state.manifest import Manifest
from ..functions import scale

PREPARE_SHARDS = 32


def _survivors(docs: Dataset) -> Dataset:
    """documents → deduped, filtered rows with text + signals."""
    bench_ref = ray.put(corpus_bench_hashes(docs))

    def fused(t: pa.Table) -> pa.Table:
        return corpus_fused_signals(t, ray.get(bench_ref), with_text=True)

    return (docs.map_batches(fused, batch_format="pyarrow", batch_size=8192)
            .groupby("fingerprint")
            .aggregate(Min("doc_id", alias_name="doc_id"),
                       Min("n_tokens", alias_name="n_tokens"),
                       Min("quality", alias_name="quality"),
                       Min("contamination_frac",
                           alias_name="contamination_frac"),
                       Min("text", alias_name="text")))


def prepare_training_corpus(sf_dir: str, out_dir: str,
                            n_shards: int = PREPARE_SHARDS) -> dict:
    """Run (or resume) the preparation job; returns a summary dict with
    per-run lineage totals. Finished shards are never re-written."""
    os.makedirs(out_dir, exist_ok=True)
    man = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    done = set(man.committed())
    all_shards = [f"shard-{i:05d}" for i in range(n_shards)]
    pending = [s for s in all_shards if s not in done]
    if not pending:
        return {"shards": n_shards, "written": 0, "skipped": n_shards,
                "out_dir": out_dir}

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"],
                                 override_num_blocks=scale.read_blocks())
    surv = _survivors(docs)

    pending_ref = ray.put(frozenset(pending))

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sh = (_fmix64(ids) % np.uint64(n_shards)).astype(np.int64)
        return t.append_column("shard", pa.array(sh))

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        sid = int(g["shard"].iloc[0])
        name = f"shard-{sid:05d}"
        lineage = {"shard": name, "rows": 0, "skipped": True}
        if name not in ray.get(pending_ref):
            return pd.DataFrame([lineage])
        t0 = time.time()
        g = (g.drop(columns=["shard", "fingerprint"])
             .sort_values("doc_id"))
        tbl = pa.Table.from_pandas(g, preserve_index=False)
        final = os.path.join(out_dir, f"{name}.parquet")
        tmp = final + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, final)  # atomic on one filesystem
        return pd.DataFrame([{
            "shard": name, "rows": len(g), "skipped": False,
            "n_tokens": int(g["n_tokens"].sum()),
            "bytes": os.path.getsize(final),
            "wall_s": round(time.time() - t0, 4)}])

    lineage = (surv.map_batches(add_shard, batch_format="pyarrow")
               .groupby("shard")
               .map_groups(write_shard, batch_format="pandas")
               .to_pandas())  # one row per shard — result-sized

    written = 0
    for rec in lineage.to_dict("records"):
        if rec.get("skipped"):
            continue
        name = rec.pop("shard")
        rec.pop("skipped", None)
        # schema-union on resume runs pads the skipped rows' columns with
        # NaN and floats the numeric fields — commit clean ints
        for k in ("rows", "n_tokens", "bytes"):
            if k in rec and pd.notna(rec[k]):
                rec[k] = int(rec[k])
        man.commit(name, rec)
        written += 1
    # shards with NO surviving rows still need a commit line, or a resume
    # run would re-scan the corpus to rediscover their emptiness
    # ("shard" guard: a zero-survivor corpus yields a column-less frame)
    produced = (set(lineage["shard"]) if "shard" in lineage.columns
                else set())
    for name in pending:
        if name not in produced:
            man.commit(name, {"rows": 0, "empty": True})
            written += 1
    return {"shards": n_shards, "written": written,
            "skipped": n_shards - len(pending), "out_dir": out_dir}


def read_prepared(out_dir: str) -> Dataset:
    """Read a prepared corpus back as a Dataset (only committed shards)."""
    man = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    files = [os.path.join(out_dir, f"{name}.parquet")
             for name, rec in man.committed().items()
             if not rec.get("empty")]
    if not files:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "quality": pa.array([], pa.float64()),
            "contamination_frac": pa.array([], pa.float64()),
            "text": pa.array([], pa.string())}))
    return ray.data.read_parquet(files)
