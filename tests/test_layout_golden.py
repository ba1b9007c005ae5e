"""Corpus-wide layout oracle: detected boundaries/title vs generator truth
(the data form of the reference's detection_info.txt debug sink)."""

import numpy as np
import pytest

from norsk_historisk_avis_ocr_ray.sources.codec import decode_image
from norsk_historisk_avis_ocr_ray.stages.layout import split_columns
from norsk_historisk_avis_ocr_ray.synth.corpus import make_corpus

GUTTER_TOL = 40  # px: gap-coverage boundaries land inside the 44px gutter


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(50, seed=21)


def test_layout_matches_truth_corpus_wide(corpus):
    pages = {r["media_ref"]: r for r in corpus["pages"].to_pylist()}
    truths = {r["media_ref"]: r for r in corpus["golden_layout"].to_pylist()}
    n_checked = 0
    for ref, page in pages.items():
        t = truths[ref]
        img = decode_image(page["image"], page["width"], page["height"])
        res = split_columns(img)
        if page["width"] < 30:  # tiny-page fallback
            assert len(res.regions) == 1
            continue
        assert res.n_cols == t["n_cols"], ref
        ideal = t["boundaries"]
        if t["style"] == "ink":
            assert res.boundaries == ideal, ref  # divider centers are exact
        else:
            for got, want in zip(res.boundaries[1:-1], ideal[1:-1]):
                assert abs(got - want) <= GUTTER_TOL, (ref, got, want)
        has_title = res.title_box is not None
        assert has_title == t["has_title"], ref
        if has_title:
            t0, t1 = t["title_cols"]
            tol = 0 if t["style"] == "ink" else GUTTER_TOL
            assert abs(res.title_box[0] - ideal[t0]) <= tol, ref
            assert abs(res.title_box[2] - ideal[t1]) <= tol, ref
        n_checked += 1
    assert n_checked >= 40
