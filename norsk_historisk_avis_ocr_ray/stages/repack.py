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


def repack_group(group: pa.Table) -> pa.Table:
    group = group.sort_by([("in_offset", "ascending"), ("region_idx", "ascending")])
    doc_id = group["doc_id"][0].as_py()
    in_offsets = group["in_offset"].to_pylist()
    region_idxs = group["region_idx"].to_pylist()
    kinds = group["kind"].to_pylist()
    texts = group["text"].to_pylist()
    refs = group["media_ref"].to_pylist()
    errors = group["error"].to_pylist() if "error" in group.column_names else [None] * len(kinds)

    spans: list[dict] = []
    section_texts: list[str] = []
    n_errors = 0
    prev_key = None
    for io, ri, kind, text, ref, err in zip(
        in_offsets, region_idxs, kinds, texts, refs, errors
    ):
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

    combined = "\n\n".join(section_texts)
    reflowed = [reflow_text(t) for t in section_texts]
    transcribed_raw = "\n\n".join(t for t in reflowed if t)

    return pa.Table.from_pylist(
        [{
            "doc_id": doc_id,
            "spans": spans,
            "combined": combined,
            "transcribed_raw": transcribed_raw,
            "n_errors": n_errors,
        }],
        schema=REPACKED_SCHEMA,
    )
