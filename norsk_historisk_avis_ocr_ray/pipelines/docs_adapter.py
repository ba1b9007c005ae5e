"""Adapter: a plain documents table (doc_id, text) → span-model documents.

The driver's generic ``documents`` test table has one flat text per row; the
engine's native input is ``(doc_id, spans)``. This adapter wraps each text as
a single text span (offset 0) — the '10% text-only docs' path of the span
pipeline — fully vectorized in Arrow.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..schema import SPAN_STRUCT


def to_span_docs_batch(t: pa.Table) -> pa.Table:
    n = t.num_rows
    doc_ids = pc.cast(t["doc_id"], pa.string())
    text = pc.fill_null(pc.cast(t["text"], pa.string()), "")
    spans = pa.ListArray.from_arrays(
        pa.array(range(n + 1), pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(["text"] * n, pa.string()),
                text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text,
                pa.array([""] * n, pa.string()),
                pa.array([0] * n, pa.int32()),
            ],
            fields=list(SPAN_STRUCT),
        ),
    )
    return pa.table({"doc_id": doc_ids, "spans": spans})


def read_span_docs(sf_dir: str) -> Dataset:
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(to_span_docs_batch, batch_format="pyarrow")
