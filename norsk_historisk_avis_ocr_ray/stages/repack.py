"""Reading-order reassembly: region rows → one output row per document.

This is the engine's single wide step (reference A1): the per-region rows are
shuffled by ``groupby("doc_id")`` and each group is sorted by
``(in_offset, region_idx)`` — input-span order, then header-first /
columns-left→right within a page (``tesseract_engine.py:158-181``,
``claude_vision_engine.py:313-348``). Derived columns:

- ``combined``        — span texts joined with ``"\\n\\n"`` (reference S5)
- ``transcribed_raw`` — non-empty reflowed sections joined (reference S6,
  pre-correction; the corrector stage finalizes ``transcribed``)

Exact duplicate ``(in_offset, region_idx)`` rows are dropped (keep-first):
defensive ingest dedup for duplicated doc_id rows, which the reference got
for free from its filesystem keyed by file stem.

By this stage the stream is text-only — images were projected away inside the
OCR stage — so the shuffle never moves binary payloads.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textops import reflow_text
from ..schema import SPAN_STRUCT

REPACKED_SCHEMA = pa.schema([
    pa.field("doc_id", pa.string()),
    pa.field("spans", pa.list_(SPAN_STRUCT)),
    pa.field("combined", pa.string()),
    pa.field("transcribed_raw", pa.string()),
    pa.field("n_errors", pa.int32()),
])


def repack_table(tbl: pa.Table) -> pa.Table:
    """Repack region rows for one or many documents (rows need not be sorted;
    all rows of a doc must be present — the caller guarantees co-location,
    either via groupby(doc_id) or shard-local processing)."""
    tbl = tbl.sort_by([("doc_id", "ascending"), ("in_offset", "ascending"),
                       ("region_idx", "ascending")])
    doc_ids = tbl["doc_id"].to_pylist()
    in_offsets = tbl["in_offset"].to_pylist()
    region_idxs = tbl["region_idx"].to_pylist()
    kinds = tbl["kind"].to_pylist()
    texts = tbl["text"].to_pylist()
    refs = tbl["media_ref"].to_pylist()
    errors = tbl["error"].to_pylist() if "error" in tbl.column_names else [None] * len(kinds)

    out_rows: list[dict] = []
    cur_doc = None
    spans: list[dict] = []
    section_texts: list[str] = []
    n_errors = 0
    prev_key = None

    def flush():
        if cur_doc is None:
            return
        combined = "\n\n".join(section_texts)
        reflowed = (reflow_text(t) for t in section_texts)
        transcribed_raw = "\n\n".join(t for t in reflowed if t)
        out_rows.append({"doc_id": cur_doc, "spans": list(spans),
                         "combined": combined,
                         "transcribed_raw": transcribed_raw,
                         "n_errors": n_errors})

    for doc_id, io, ri, kind, text, ref, err in zip(
        doc_ids, in_offsets, region_idxs, kinds, texts, refs, errors
    ):
        if doc_id != cur_doc:
            flush()
            cur_doc = doc_id
            spans, section_texts, n_errors, prev_key = [], [], 0, None
        key = (io, ri)
        if key == prev_key:
            continue  # duplicate doc ingested twice — keep first
        prev_key = key
        if err:
            n_errors += 1
        if kind == "empty":
            continue
        text = text or ""
        spans.append({"kind": "text", "text": text, "media_ref": ref or "",
                      "offset": len(spans)})
        section_texts.append(text)
    flush()

    return pa.Table.from_pylist(out_rows, schema=REPACKED_SCHEMA)


def repack_group(group: pa.Table) -> pa.Table:
    """Per-group form for ``groupby("doc_id").map_groups`` (one doc)."""
    return repack_table(group)
