"""Table IO: Lance-first with parquet fallback, plus JSONL/CSV ingest.

BASELINE.json specifies Lance tables of interleaved documents; this container
has no Lance library, so readers/writers prefer ``ray.data.read_lance`` /
``Dataset.write_lance`` when the ``lance`` package is importable and fall
back to parquet (identical schema and partition layout) otherwise. Raw-crawl
drop formats (``.jsonl``/``.ndjson`` via ``ray.data.read_json``, ``.csv``
via ``ray.data.read_csv``) are accepted at ingest so a reference user's
non-columnar inputs work unchanged. All pipeline code is format-agnostic:
it only sees ``ray.data.Dataset``.
"""

from __future__ import annotations

import ray
from ray.data import Dataset


def _have_lance() -> bool:
    try:
        import lance  # noqa: F401
        return True
    except ImportError:
        return False


def read_documents(path: str, **kwargs) -> Dataset:
    if path.endswith(".lance") and _have_lance():
        return ray.data.read_lance(path, **kwargs)
    if path.endswith((".jsonl", ".ndjson", ".json")):
        return ray.data.read_json(path, **kwargs)
    if path.endswith(".csv"):
        return ray.data.read_csv(path, **kwargs)
    return ray.data.read_parquet(path, **kwargs)


def write_output(ds: Dataset, path: str, **kwargs) -> None:
    if path.endswith(".lance") and _have_lance():
        ds.write_lance(path, **kwargs)
    else:
        ds.write_parquet(path, **kwargs)
