"""Deterministic synthetic newspaper-page rasters with known ground truth.

Pages are uint8 grayscale rasters with real layout geometry — dark ink divider
lines (exercises the reference's Phase-1 band-divider path,
``_columns.py:121-209``) or white gutters between text blocks (exercises the
Phase-2 gap-coverage fallback, ``_columns.py:212-291``), optional multi-column
title region with a ≥40-row blank gap (``_columns.py:36-41`` semantics), and
simulated body-text line strips. Each region's ground-truth text is embedded
as a pixel barcode (see ``synth.barcode``) so the mock OCR engine is a genuine
image→text function.

All geometry constants are chosen against the layout thresholds:
- text-line duty cycle 10/18 rows keeps per-band vertical projections below
  the 80% divider-peak threshold;
- gutters are 44px ≥ the 15px min light-run, so gap coverage ≈ 1.0 at gutters
  vs ≈ 0.45 inside text;
- the title gap (rows ~47–159) is ≥40 blank rows ending before 40% of height,
  and the body resumes above 5% of page height — exactly the elevated-column
  criterion.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import barcode

INK = "ink"
GUTTER = "gutter"

COL_WIDTH = 730          # reference's expected column width at 300 DPI
TEXT_VALUE = 40          # dark ink
BG = 255
TITLE_BODY_TOP = 160     # body resume row for title columns
GUTTER_HALF = 22         # gutter = 44px of white centred on the boundary


@dataclass
class PageTruth:
    """Everything the generator knows about a rendered page."""
    width: int
    height: int
    style: str
    n_cols: int
    boundaries: list[int]          # ideal column boundaries incl. 0 and width
    has_title: bool
    title_cols: tuple[int, int]    # [t0, t1) column range of the title group
    title_text: str                # raw (pre-clean) title text, '' if none
    column_texts: list[str]        # raw (pre-clean) text per column, left→right

    def region_texts(self) -> list[str]:
        """Raw region texts in reading order: header first, then columns."""
        out = [self.title_text] if self.has_title else []
        return out + list(self.column_texts)


def _draw_text_lines(img: np.ndarray, x0: int, x1: int, y0: int, y1: int,
                     rng: np.random.Generator) -> None:
    """Simulated body text: 10 dark rows per 18-row pitch, ragged right edge."""
    y = y0
    i = 0
    while y + 10 <= y1:
        right = x1 if i % 5 else x0 + max(30, int((x1 - x0) * 0.6))
        img[y:y + 10, x0:right] = TEXT_VALUE
        y += 18
        i += 1


def render_page(
    rng: np.random.Generator,
    n_cols: int,
    style: str,
    has_title: bool,
    column_texts: list[str],
    title_text: str = "",
    height: int | None = None,
) -> tuple[np.ndarray, PageTruth]:
    """Render one page; ``column_texts`` must have ``n_cols`` entries."""
    assert len(column_texts) == n_cols
    height = height or int(rng.integers(1700, 2400))
    width = n_cols * COL_WIDTH
    img = np.full((height, width), BG, dtype=np.uint8)
    boundaries = [i * COL_WIDTH for i in range(n_cols + 1)]

    title_cols = (0, 0)
    if has_title and n_cols >= 2:
        t0 = int(rng.integers(0, n_cols - 1))
        t1 = int(rng.integers(t0 + 2, n_cols + 1))  # span ≥2 columns
        title_cols = (t0, t1)
    else:
        has_title = False
        title_text = ""

    # Body text per column (title columns start below the title gap).
    for c in range(n_cols):
        xl, xr = boundaries[c], boundaries[c + 1]
        if style == GUTTER:
            xl, xr = xl + GUTTER_HALF, xr - GUTTER_HALF
        else:
            xl, xr = xl + 13, xr - 13
        y0 = TITLE_BODY_TOP if (has_title and title_cols[0] <= c < title_cols[1]) else 4
        _draw_text_lines(img, xl, xr, y0, height - 30, rng)

    # Title block: two wide strips + the ≥40-row blank gap below.
    if has_title:
        tl = boundaries[title_cols[0]]
        tr = boundaries[title_cols[1]]
        img[0:TITLE_BODY_TOP, tl:tr] = BG  # clear gap area under the title
        img[14:26, tl + 20:tr - 20] = TEXT_VALUE
        img[34:46, tl + 20:tr - 20] = TEXT_VALUE
        barcode.write_barcode(img, barcode.TITLE_ROW, tl + barcode.X_PAD, title_text)

    # Ink dividers (3px, full height) — drawn after text so they stay crisp.
    if style == INK:
        for b in boundaries[1:-1]:
            img[:, b - 1:b + 2] = 0

    # Column barcodes along the bottom margin.
    img[height - 8:height, :] = BG
    for c in range(n_cols):
        barcode.write_barcode(
            img, height - barcode.COLUMN_ROW_FROM_BOTTOM,
            boundaries[c] + barcode.X_PAD, column_texts[c],
        )

    truth = PageTruth(
        width=width, height=height, style=style, n_cols=n_cols,
        boundaries=boundaries, has_title=has_title, title_cols=title_cols,
        title_text=title_text, column_texts=list(column_texts),
    )
    return img, truth


def render_tiny_page(rng: np.random.Generator) -> tuple[np.ndarray, PageTruth]:
    """A sub-30px-wide image: the reference's no-columns fallback path
    (``_columns.py:521-522``) — whole image as one region, no barcode fits,
    so OCR recovers ''."""
    h = int(rng.integers(40, 80))
    img = np.full((h, 20), BG, dtype=np.uint8)
    img[5:10, 2:18] = TEXT_VALUE
    truth = PageTruth(width=20, height=h, style=INK, n_cols=1,
                      boundaries=[0, 20], has_title=False, title_cols=(0, 0),
                      title_text="", column_texts=[""])
    return img, truth
