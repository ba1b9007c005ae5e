"""PageStore: keyed media resolution with per-actor shard caching.

Media payloads live in a directory of parquet shards keyed by ``media_ref``
(the corpus writer co-partitions pages with their documents, so the refs an
OCR actor sees cluster by shard). Resolution strategy per actor:

- a tiny broadcast **index** (media_ref → shard file), built once on the
  driver from just the ``media_ref`` columns and ``ray.put`` once;
- an LRU cache of decoded shard tables inside each actor — a shard file is
  read at most a few times per pool, then hit in memory.

This is the scale path for media-heavy inputs: no node ever holds the whole
page table (broadcasting all pages is only right when the media side is
small), payload bytes move storage→actor exactly once, and the span stream
itself stays text-only. The same contract (``get(media_ref) -> (bytes, w, h,
codec)``) would front a Lance dataset's take-by-key at 10^12-doc scale.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import pyarrow.parquet as pq


def build_page_index(pages_path: str) -> dict[str, str]:
    """media_ref → shard file path, reading only the media_ref columns."""
    index: dict[str, str] = {}
    if os.path.isdir(pages_path):
        files = sorted(
            os.path.join(pages_path, f) for f in os.listdir(pages_path)
            if f.endswith(".parquet")
        )
    else:
        files = [pages_path]
    for f in files:
        refs = pq.read_table(f, columns=["media_ref"])["media_ref"].to_pylist()
        for r in refs:
            index[r] = f
    return index


class PageStore:
    """Per-actor shard-cached lookup. Constructed inside the OCR actor from
    the broadcast index ref."""

    def __init__(self, index: dict[str, str], cache_shards: int = 8):
        self.index = index
        self.cache_shards = cache_shards
        self._cache: OrderedDict[str, dict[str, tuple[bytes, int, int, str]]] = OrderedDict()

    def _load_shard(self, path: str) -> dict[str, tuple[bytes, int, int, str]]:
        shard = self._cache.get(path)
        if shard is not None:
            self._cache.move_to_end(path)
            return shard
        t = pq.read_table(path, columns=["media_ref", "image", "width",
                                         "height", "codec"])
        shard = {
            ref: (img, w, h, codec)
            for ref, img, w, h, codec in zip(
                t["media_ref"].to_pylist(), t["image"].to_pylist(),
                t["width"].to_pylist(), t["height"].to_pylist(),
                t["codec"].to_pylist())
        }
        self._cache[path] = shard
        if len(self._cache) > self.cache_shards:
            self._cache.popitem(last=False)
        return shard

    def get(self, media_ref: str) -> tuple[bytes, int, int, str]:
        path = self.index.get(media_ref)
        if path is None:
            raise KeyError(f"media_ref not found in page index: {media_ref!r}")
        shard = self._load_shard(path)
        if media_ref not in shard:
            raise KeyError(f"media_ref missing from shard {path}: {media_ref!r}")
        return shard[media_ref]
