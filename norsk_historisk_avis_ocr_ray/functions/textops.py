"""Scalar text operators: divider-noise cleanup, reflow, word-level diff.

Semantics match the reference exactly (so golden span/text equality holds):
- ``clean_divider_noise``  — reference ``tesseract_engine.py:24-65`` (T1)
- ``reflow_text``          — reference ``tesseract_engine.py:68-88``  (T2)
- ``readable_diff``        — reference ``tesseract_claude_engine.py:15-57`` (T3)

These are pure per-string functions; the batch-level wrappers at the bottom are
what the pipeline's ``map_batches`` stages call (one vectorized pass over the
Arrow string child array — the per-line drop logic requires Python, but the
regexes are compiled once at module import and the loop is per *span*, not per
character, so a batch of thousands of spans is a single task).
"""

from __future__ import annotations

import difflib
import re

import numpy as np
import pyarrow as pa

# Trailing pipe + up to 3 bleed chars ("text | s", "text|g"), leading mirror.
_TRAIL_PIPE = re.compile(r"\s*\|.{0,3}$")
_LEAD_PIPE = re.compile(r"^.{0,3}\|\s*")
_HYPHEN_BREAK = re.compile(r"-\n\s*")
_NEWLINES = re.compile(r"\n+")
_MULTISPACE = re.compile(r"  +")


def clean_divider_noise(text: str) -> str:
    """Strip column-divider pipe artifacts from raw OCR text.

    Per line: remove trailing ``|`` + ≤3 bleed chars, then leading mirror image,
    then standalone pipes; drop lines whose stripped remainder is 1–2 chars
    (stray garbage — dropped, not blanked, so hyphen rejoining in reflow still
    works); finally collapse runs of 2+ blank lines to one.
    """
    cleaned = []
    for line in text.split("\n"):
        line = _TRAIL_PIPE.sub("", line)
        line = _LEAD_PIPE.sub("", line)
        line = line.strip("|").rstrip()
        stripped = line.strip()
        if 0 < len(stripped) <= 2:
            continue
        cleaned.append(line)

    out: list[str] = []
    blanks = 0
    for line in cleaned:
        if line.strip() == "":
            blanks += 1
            if blanks <= 1:
                out.append(line)
        else:
            blanks = 0
            out.append(line)
    return "\n".join(out)


def reflow_text(section_text: str) -> str:
    """One OCR section → flowing text: rejoin ``word-\\n`` breaks, collapse
    newlines to spaces, squeeze runs of spaces."""
    section_text = section_text.strip()
    if not section_text:
        return ""
    section_text = _HYPHEN_BREAK.sub("", section_text)
    section_text = _NEWLINES.sub(" ", section_text)
    section_text = _MULTISPACE.sub(" ", section_text)
    return section_text.strip()


def readable_diff(before: str, after: str) -> str:
    """Word-level diff with 3 words of context; ``«old» → «new»`` lines."""
    bw, aw = before.split(), after.split()
    sm = difflib.SequenceMatcher(None, bw, aw)
    ctx = 3
    changes = []
    for op, i1, i2, j1, j2 in sm.get_opcodes():
        if op == "equal":
            continue
        before_ctx = bw[max(0, i1 - ctx):i1]
        after_ctx = bw[i2:i2 + ctx]
        old = " ".join(bw[i1:i2]) if i1 < i2 else ""
        new = " ".join(aw[j1:j2]) if j1 < j2 else ""
        parts = []
        if before_ctx:
            parts.append("..." + " ".join(before_ctx))
        if op == "replace":
            parts.append(f"«{old}» → «{new}»")
        elif op == "delete":
            parts.append(f"«{old}» → (deleted)")
        elif op == "insert":
            parts.append(f"(inserted) «{new}»")
        if after_ctx:
            parts.append(" ".join(after_ctx) + "...")
        changes.append(" ".join(parts))
    if not changes:
        return "No changes detected."
    header = f"Correction changes ({len(changes)} edits):\n"
    return header + "\n".join(f"  {i + 1}. {c}" for i, c in enumerate(changes))


# --- batch-level wrappers (Arrow in / Arrow out) ----------------------------

def _map_string_column(tbl: pa.Table, col: str, fn, out_col: str | None = None) -> pa.Table:
    """Apply a scalar str→str fn over one string column of an Arrow table."""
    vals = tbl[col].to_pylist()
    out = pa.array([None if v is None else fn(v) for v in vals], type=pa.string())
    name = out_col or col
    if name in tbl.column_names:
        return tbl.set_column(tbl.column_names.index(name), name, out)
    return tbl.append_column(name, out)


def clean_batch(tbl: pa.Table, col: str = "text") -> pa.Table:
    return _map_string_column(tbl, col, clean_divider_noise)


def reflow_batch(tbl: pa.Table, col: str = "text", out_col: str = "reflowed") -> pa.Table:
    return _map_string_column(tbl, col, reflow_text, out_col)


def whitespace_token_counts(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized whitespace token count (used by text-stats operators)."""
    import pyarrow.compute as pc

    # split_pattern_regex then list_value_length is fully vectorized in Arrow.
    trimmed = pc.utf8_trim_whitespace(texts)
    parts = pc.split_pattern_regex(trimmed, r"\s+")
    n = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    n = n.astype(np.int64)
    n[empty] = 0
    return n
