"""Layout-analysis unit tests: divider detection (L1), gap-coverage fallback
(L2), title detection (L3), split_columns orchestration (L4) — parameter
semantics of reference _columns.py, verified on synthetic rasters with known
geometry."""

import numpy as np
import pytest

from norsk_historisk_avis_ocr_ray.stages.layout import (
    detect_title_region,
    find_band_dividers,
    find_gap_boundaries,
    split_columns,
)
from norsk_historisk_avis_ocr_ray.synth import pagegen


def make_rng():
    return np.random.default_rng(7)


def render(n_cols, style, has_title=False, title_text="t tekst", height=2000):
    rng = make_rng()
    texts = [f"kolonne {i} tekst her" for i in range(n_cols)]
    return pagegen.render_page(rng, n_cols, style, has_title, texts,
                               title_text if has_title else "", height=height)


class TestBandDividers:
    def test_ink_dividers_found_exactly(self):
        img, truth = render(3, pagegen.INK)
        xs = find_band_dividers(img)
        assert xs == truth.boundaries[1:-1]

    def test_no_dividers_in_gutter_page(self):
        img, _ = render(3, pagegen.GUTTER)
        assert find_band_dividers(img) == []

    def test_single_column_no_dividers(self):
        img, _ = render(1, pagegen.INK)
        assert find_band_dividers(img) == []

    def test_drift_clustering(self):
        # a divider drifting ±6px across bands is one cluster near the mean
        img = np.full((1000, 800), 255, np.uint8)
        for b in range(5):
            x = 400 + (b % 2) * 6
            img[b * 200:(b + 1) * 200, x:x + 2] = 0
        xs = find_band_dividers(img)
        assert len(xs) == 1
        assert abs(xs[0] - 403) <= 3

    def test_band_persistence_filter(self):
        # a divider present in only 2 of 10 bands (<50%) is rejected
        img = np.full((2000, 800), 255, np.uint8)
        img[0:400, 400:402] = 0
        assert find_band_dividers(img) == []


class TestGapBoundaries:
    def test_gutter_boundaries_found(self):
        img, truth = render(3, pagegen.GUTTER)
        h, w = img.shape
        xs = find_gap_boundaries(img, 0, w, int(h * 0.4), h,
                                 expected_col_width=730, min_gap_px=15)
        assert len(xs) == 2
        for found, ideal in zip(xs, truth.boundaries[1:-1]):
            assert abs(found - ideal) <= 40

    def test_min_coverage_rejects_textless_gap(self):
        # all-dark segment: no light runs → no boundaries
        img = np.zeros((1000, 1500), np.uint8)
        assert find_gap_boundaries(img, 0, 1500, 0, 1000, 730) == []

    def test_small_segment_skipped(self):
        img = np.full((1000, 40), 255, np.uint8)
        assert find_gap_boundaries(img, 0, 40, 0, 1000, 730) == []

    def test_single_expected_column_skipped(self):
        img = np.full((1000, 800), 255, np.uint8)
        assert find_gap_boundaries(img, 0, 800, 0, 1000, 730) == []


class TestTitleRegion:
    def test_title_detected(self):
        img, truth = render(3, pagegen.INK, has_title=True)
        box, body_top = detect_title_region(img, truth.boundaries)
        assert box is not None
        x0, y0, x1, y1 = box
        t0, t1 = truth.title_cols
        assert x0 == truth.boundaries[t0]
        assert x1 == truth.boundaries[t1]
        assert y0 == 0
        assert y1 == pagegen.TITLE_BODY_TOP
        for c in range(truth.n_cols):
            expected = pagegen.TITLE_BODY_TOP if t0 <= c < t1 else 0
            assert body_top[c] == expected

    def test_no_title(self):
        img, truth = render(3, pagegen.INK, has_title=False)
        box, body_top = detect_title_region(img, truth.boundaries)
        assert box is None
        assert body_top == [0] * truth.n_cols

    def test_single_column_never_titled(self):
        img, _ = render(1, pagegen.INK)
        box, body_top = detect_title_region(img, [0, img.shape[1]])
        assert box is None and body_top == [0]

    def test_open_gap_at_scan_limit_not_counted(self):
        # blank gap still open at 40% height must not register (reference
        # only registers a gap when a non-blank row closes it in-window)
        img = np.full((2000, 1460), 255, np.uint8)
        img[0:30, 20:1440] = 0      # title-ish block in both columns
        # rows 30..800 blank — the 40% scan limit cuts at 800, gap never closes
        img[900:1900, 20:700] = 0
        img[900:1900, 760:1440] = 0
        box, body_top = detect_title_region(img, [0, 730, 1460])
        assert box is None


class TestSplitColumns:
    @pytest.mark.parametrize("n_cols,style", [
        (1, pagegen.INK), (2, pagegen.INK), (3, pagegen.GUTTER),
        (4, pagegen.INK), (6, pagegen.GUTTER),
    ])
    def test_region_count(self, n_cols, style):
        img, truth = render(n_cols, style)
        res = split_columns(img)
        assert res.n_cols == n_cols
        assert len(res.regions) == n_cols  # no title
        kinds = [k for k, _ in res.regions]
        assert kinds == ["column"] * n_cols

    def test_title_region_first(self):
        img, truth = render(4, pagegen.INK, has_title=True)
        res = split_columns(img)
        assert res.regions[0][0] == "header"
        assert len(res.regions) == 1 + truth.n_cols

    def test_tiny_image_fallback(self):
        rng = make_rng()
        img, _ = pagegen.render_tiny_page(rng)
        res = split_columns(img)
        assert len(res.regions) == 1
        _, (x0, y0, x1, y1) = res.regions[0]
        assert (x0, y0, x1, y1) == (0, 0, img.shape[1], img.shape[0])

    def test_overlap_clamped(self):
        img, truth = render(2, pagegen.INK)
        res = split_columns(img, overlap_px=20)
        (_, (x0, _, x1, _)) = res.regions[0]
        assert x0 == 0  # clamped at page edge
        assert x1 == truth.boundaries[1] + 20
