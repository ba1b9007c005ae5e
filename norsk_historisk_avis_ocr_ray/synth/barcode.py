"""Pixel barcode: the machine-readable text payload of synthetic pages.

Synthetic pages embed each region's ground-truth text *in the raster itself*
(one pixel row per region: magic marker, 2-byte big-endian length, UTF-8 bytes
as pixel values), so the deterministic mock OCR engine is a genuine
image→text function over the cropped region — if layout analysis crops the
wrong region, OCR recovers the wrong text and the golden span test fails.
That is what makes exact span-sequence equality testable (the reference repo
has no automated tests at all; see SURVEY.md §5).

Placement contract (mirrored by synth.pagegen):
- column text: row ``page_height - 4``, starting at ``column_left + 40``
- title text:  row 8, starting at ``title_left + 40``
Column crops always extend to the page bottom and headers always start at
y=0, so the decoder only scans the bottom 6 and top 13 rows of a crop.
"""

from __future__ import annotations

import numpy as np

MAGIC = (17, 34, 51, 68)
COLUMN_ROW_FROM_BOTTOM = 4
TITLE_ROW = 8
X_PAD = 40


def write_barcode(img: np.ndarray, y: int, x: int, text: str) -> None:
    """Write the payload for one region into the page raster (in place)."""
    data = text.encode("utf-8")
    if len(data) > 0xFFFF:
        raise ValueError("barcode payload too long")
    payload = np.frombuffer(
        bytes(MAGIC) + len(data).to_bytes(2, "big") + data, dtype=np.uint8
    )
    if x + payload.size > img.shape[1]:
        raise ValueError(
            f"barcode does not fit: x={x} len={payload.size} width={img.shape[1]}"
        )
    img[y, x:x + payload.size] = payload


def _scan_row(row: np.ndarray) -> str | None:
    if row.size < 6:
        return None
    m = (
        (row[:-3] == MAGIC[0])
        & (row[1:-2] == MAGIC[1])
        & (row[2:-1] == MAGIC[2])
        & (row[3:] == MAGIC[3])
    )
    hits = np.flatnonzero(m)
    if hits.size == 0:
        return None
    i = int(hits[0])
    if i + 6 > row.size:
        return None
    length = (int(row[i + 4]) << 8) | int(row[i + 5])
    data = row[i + 6:i + 6 + length]
    if data.size < length:
        return None  # truncated crop
    return data.astype(np.uint8).tobytes().decode("utf-8", errors="replace")


def read_barcode(region: np.ndarray) -> str:
    """Decode the first payload found in a cropped region ('' if none)."""
    h = region.shape[0]
    rows = list(range(max(0, h - 6), h)) + list(range(0, min(13, h)))
    for y in rows:
        text = _scan_row(region[y])
        if text is not None:
            return text
    return ""
