"""Shard-local extraction: the zero-shuffle scale path for co-partitioned
corpora, and the unit of resumability.

When documents and their pages are co-partitioned into shards (the natural
ingest layout at 10^12-doc scale: partition by hash(doc_id), keep each doc's
media in the same shard), the whole extraction — explode → layout+OCR →
clean → repack → correct — is shard-local: every row of a document lives in
exactly one shard, so reading-order reassembly needs **no groupby shuffle at
all**. One Ray task per shard, elastic task-pool scheduling, skew handled by
shard count ≫ core count (a 6-column broadsheet-heavy shard just takes
longer; work stealing balances the rest).

Partitioning assumption (documented per the operator contract): all spans of
a ``doc_id`` and all pages they reference are inside the shard. Inputs that
don't satisfy it must use ``pipelines.extract.extract`` (the general
shuffle-based pipeline); a cross-shard ``media_ref`` here degrades to a
per-row MissingMedia error, never a wrong span sequence.

The same per-shard function is the body of the resumable runner
(``pipelines.run``): output is written per shard and committed to a manifest.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import pyarrow as pa
import pyarrow.parquet as pq

import ray
from ray.data import Dataset

from ..functions.textops import clean_batch
from ..stages.correct import CorrectorStage
from ..stages.explode import explode_spans
from ..stages.ocr import LayoutOcrStage, MockBarcodeOcr
from ..stages.repack import repack_table


def list_shards(corpus_dir: str) -> list[dict]:
    """Pair documents/ and pages/ shard files by part number.

    Shards are returned **largest pages-file first** (LPT order). The task
    pool schedules blocks roughly in input order, so putting the heaviest
    shards (broadsheet-dense → biggest image payload → longest layout+OCR
    time) at the front means the final wave holds only small shards — the
    straggler tail that otherwise idles ``ncpu - 1`` cores for one big-shard
    duration shrinks to a small-shard duration. Pure scheduling; per-shard
    results are unchanged and the output order was never guaranteed."""
    docs_dir = os.path.join(corpus_dir, "documents")
    pages_dir = os.path.join(corpus_dir, "pages")
    pages = {}
    if os.path.isdir(pages_dir):
        for f in os.listdir(pages_dir):
            if f.endswith(".parquet"):
                pages[f] = os.path.join(pages_dir, f)
    shards = []
    for f in sorted(os.listdir(docs_dir)):
        if f.endswith(".parquet"):
            shards.append({"shard": f.rsplit(".", 1)[0],
                           "docs_file": os.path.join(docs_dir, f),
                           "pages_file": pages.get(f, "")})
    def weight(s: dict) -> int:
        try:
            return os.path.getsize(s["pages_file"]) if s["pages_file"] \
                else os.path.getsize(s["docs_file"])
        except OSError:
            return 0
    shards.sort(key=weight, reverse=True)
    return shards


def process_shard(
    docs: pa.Table,
    pages: dict[str, tuple[bytes, int, int, str]],
    engine: Any,
    correction: bool = True,
    emit_diff: bool = True,
    overlap_px: int = 20,
) -> pa.Table:
    """The full extraction for one co-partitioned shard, in-process."""
    stage = LayoutOcrStage.__new__(LayoutOcrStage)  # engine supplied, no ray.get
    stage.engine = engine
    stage.overlap_px = overlap_px
    stage.pages = pages
    stage.store = None
    regions = clean_batch(stage(explode_spans(docs)))
    repacked = repack_table(regions)
    return CorrectorStage(enabled=correction, emit_diff=emit_diff)(repacked)


_ENGINE_CACHE: dict[str, Any] = {}


def _factory_key(factory: Callable[[], Any]) -> str:
    """Stable per-worker cache key for an engine factory. ``id()`` is useless
    here: remote-task arguments are deserialized fresh per task, so identity
    never repeats — key on the factory's qualified name (+ partial kwargs)."""
    f = getattr(factory, "func", factory)  # unwrap functools.partial
    kw = getattr(factory, "keywords", None) or {}
    return (f"{getattr(f, '__module__', '?')}.{getattr(f, '__qualname__', repr(f))}"
            f"|{sorted(kw.items())!r}")


def cached_engine(engine_factory: Callable[[], Any]) -> Any:
    """Construct + ``load()`` the engine once per worker process."""
    key = _factory_key(engine_factory)
    engine = _ENGINE_CACHE.get(key)
    if engine is None:
        engine = engine_factory()
        engine.load()
        _ENGINE_CACHE[key] = engine
    return engine


def _shard_task_fn(engine_factory: Callable[[], Any], correction: bool,
                   emit_diff: bool):
    def fn(batch: pa.Table) -> pa.Table:
        engine = cached_engine(engine_factory)
        outs = []
        for row in batch.to_pylist():
            docs = pq.read_table(row["docs_file"])
            pages: dict[str, tuple[bytes, int, int, str]] = {}
            if row["pages_file"]:
                p = pq.read_table(row["pages_file"],
                                  columns=["media_ref", "image", "width",
                                           "height", "codec"])
                pages = {r: (i, w, h, c) for r, i, w, h, c in zip(
                    p["media_ref"].to_pylist(), p["image"].to_pylist(),
                    p["width"].to_pylist(), p["height"].to_pylist(),
                    p["codec"].to_pylist())}
            outs.append(process_shard(docs, pages, engine,
                                      correction=correction,
                                      emit_diff=emit_diff))
        return pa.concat_tables(outs)
    return fn


def extract_sharded(
    corpus_dir: str,
    *,
    engine_factory: Callable[[], Any] = MockBarcodeOcr,
    correction: bool = True,
    emit_diff: bool = True,
) -> Dataset:
    """Co-partitioned corpus directory → output Dataset, one task per shard.

    Tasks (not actors): the engine is cached per worker process, and the
    elastic task pool uses every free CPU — there is no pool size to
    misconfigure and no stage can starve another.
    """
    shards = list_shards(corpus_dir)
    if not shards:
        raise ValueError(f"no document shards under {corpus_dir!r}")
    ds = ray.data.from_items(shards)
    # one task per shard row; override_num_blocks so each shard is a block
    ds = ds.repartition(len(shards))
    return ds.map_batches(
        _shard_task_fn(engine_factory, correction, emit_diff),
        batch_format="pyarrow", batch_size=1,
    )
