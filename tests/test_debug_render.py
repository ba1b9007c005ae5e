"""S8 debug rendering: annotated-page bundle parity (_columns.py:294-418)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from norsk_historisk_avis_ocr_ray.sources.codec import RAW_ZLIB, encode_image
from norsk_historisk_avis_ocr_ray.sources.png import decode_png
from norsk_historisk_avis_ocr_ray.stages.debug_render import (
    annotate_page,
    detection_info,
    render_debug,
    render_debug_bundle,
)
from norsk_historisk_avis_ocr_ray.stages.layout import split_columns
from norsk_historisk_avis_ocr_ray.synth import pagegen


@pytest.fixture(scope="module")
def titled_page():
    rng = np.random.default_rng(7)
    texts = [f"kolonne {i} tekst her" for i in range(3)]
    img, truth = pagegen.render_page(rng, 3, pagegen.INK, True, texts,
                                     "avis tittel", height=2000)
    return img, truth


def test_annotated_page_draws_boundaries_and_title(titled_page):
    img, _ = titled_page
    layout = split_columns(img)
    assert layout.n_cols == 3 and layout.title_box is not None

    canvas = annotate_page(img, layout)
    assert canvas.shape == (*img.shape, 3) and canvas.dtype == np.uint8

    # Interior boundaries are blue vertical lines; below the title region
    # (the green overlay covers them inside it, like the reference).
    below = max(layout.body_top) + 20
    for bx in layout.boundaries:
        if 0 < bx < img.shape[1]:
            line = canvas[below:, bx].astype(int)
            assert (line[:, 2] > line[:, 0]).all(), f"no blue line at x={bx}"

    # Title region is green-tinted (G channel lifted above R and B inside).
    tl, _, tr, tb = layout.title_box
    inner = canvas[2 : tb - 2, tl + 6 : tr - 6].astype(int)
    assert (inner[:, :, 1].mean() > inner[:, :, 0].mean()
            and inner[:, :, 1].mean() > inner[:, :, 2].mean())

    # Overlap shading: red channel lifted next to a boundary.
    bx = layout.boundaries[1]
    strip = canvas[1500, bx + 4 : bx + 12].astype(int)
    assert strip[:, 0].mean() > strip[:, 2].mean()


def test_bundle_files_and_info(titled_page):
    img, _ = titled_page
    layout = split_columns(img)
    bundle = render_debug_bundle(img, layout)

    assert "page_annotated.png" in bundle and "title_crop.png" in bundle
    for i in range(layout.n_cols):
        assert f"column_{i + 1}_crop.png" in bundle

    # Every PNG round-trips through the pure-numpy codec.
    annotated = decode_png(bundle["page_annotated.png"])
    assert annotated.shape[:2] == img.shape
    tcrop = decode_png(bundle["title_crop.png"])
    x0, y0, x1, y1 = layout.title_box
    assert tcrop.shape == (y1 - y0, x1 - x0)
    np.testing.assert_array_equal(tcrop, img[y0:y1, x0:x1])

    info = bundle["detection_info.txt"].decode()
    assert f"Columns: {layout.n_cols}" in info
    assert "Title detected: columns" in info
    assert f"Boundaries: {layout.boundaries}" in info


def test_untitled_page_info():
    rng = np.random.default_rng(11)
    img, _ = pagegen.render_page(rng, 1, pagegen.INK, False,
                                 ["en kolonne"], "", height=1200)
    layout = split_columns(img)
    assert layout.title_box is None
    info = detection_info(layout, img.shape[1], img.shape[0])
    assert "Title detected: none" in info
    bundle = render_debug_bundle(img, layout)
    assert "title_crop.png" not in bundle


def test_render_debug_stage_resumable(ray_session, tmp_path, titled_page):
    img, truth = titled_page
    pages = pa.Table.from_pylist([{
        "media_ref": "p-0", "image": encode_image(img),
        "width": truth.width, "height": truth.height, "codec": RAW_ZLIB,
    }])
    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pq.write_table(pages, pages_dir / "part-0.parquet")
    out_dir = str(tmp_path / "debug")

    summary = render_debug(str(pages_dir), out_dir, concurrency=1).to_pandas()
    assert len(summary) == 1 and not summary["skipped"].iloc[0]
    assert summary["title_detected"].iloc[0]
    page_dir = os.path.join(out_dir, "p-0")
    assert os.path.exists(os.path.join(page_dir, "page_annotated.png"))
    assert os.path.exists(os.path.join(page_dir, "detection_info.txt"))
    assert os.path.exists(os.path.join(page_dir, "_DONE"))

    # Second run skips the finished page.
    summary2 = render_debug(str(pages_dir), out_dir, concurrency=1).to_pandas()
    assert summary2["skipped"].iloc[0]
