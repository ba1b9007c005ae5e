"""T4/T5 semantics: sharpen+contrast prep and the size-ladder encoder."""

import numpy as np
import pytest

from norsk_historisk_avis_ocr_ray.functions.imageprep import (
    encode_under_limit,
    prepare_image,
)
from norsk_historisk_avis_ocr_ray.sources.codec import decode_image, encode_image
from norsk_historisk_avis_ocr_ray.stages.ocr import get_engine, ENGINES


def test_prepare_image_boosts_contrast():
    img = np.full((60, 60), 128, np.uint8)
    img[20:40, 20:40] = 90
    out = prepare_image(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # contrast boost widens the spread around the mean
    assert out[30, 30] < 90
    assert int(out.max()) - int(out.min()) > int(img.max()) - int(img.min())


def test_prepare_image_deterministic():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(50, 70), dtype=np.uint8)
    assert np.array_equal(prepare_image(img), prepare_image(img))


def test_encode_under_limit_noop_when_small():
    img = np.full((100, 100), 200, np.uint8)
    buf, w, h = encode_under_limit(img, max_bytes=1 << 20)
    assert (w, h) == (100, 100)
    assert np.array_equal(decode_image(buf, w, h), img)


def test_encode_under_limit_rescales():
    # incompressible noise: payload ≈ decoded size, so the ladder must rescale
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(2000, 2000), dtype=np.uint8)
    buf, w, h = encode_under_limit(img, max_bytes=1 << 20)  # 1 MiB limit
    assert len(buf) <= 1 << 20
    assert w < 2000 and h < 2000
    assert decode_image(buf, w, h).shape == (h, w)


def test_encode_under_limit_payload_semantics():
    # a compressible page fits the ENCODED-byte limit without rescaling,
    # matching the reference's check on the raw encoded length
    img = np.full((2000, 2000), 200, np.uint8)
    buf, w, h = encode_under_limit(img, max_bytes=1 << 20)
    assert (w, h) == (2000, 2000)
    assert len(buf) <= 1 << 20


def test_encode_under_limit_png_codec():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(300, 400), dtype=np.uint8)
    buf, w, h = encode_under_limit(img, max_bytes=1 << 20, codec="png")
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    assert np.array_equal(decode_image(buf, w, h, "png"), img)


def test_engine_registry():
    assert get_engine("mock-barcode") is ENGINES["mock-barcode"]
    with pytest.raises(KeyError):
        get_engine("nope")


def test_encode_under_limit_jpeg_quality_ladder():
    """Reference ladder (claude_vision_engine.py:107-127): quality drops
    95→50 before any rescale; rescale resets quality."""
    from norsk_historisk_avis_ocr_ray.sources.jpeg import decode_jpeg

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (256, 256), dtype=np.uint8)  # incompressible

    # Generous limit: q95 fits, no rescale.
    buf, w, h = encode_under_limit(img, max_bytes=1 << 20, codec="jpeg")
    assert (w, h) == (256, 256)

    # Tight limit that a lower quality satisfies at full size.
    q95 = len(encode_image(img, "jpeg:95"))
    q55 = len(encode_image(img, "jpeg:55"))
    buf, w, h = encode_under_limit(img, max_bytes=(q95 + q55) // 2,
                                   codec="jpeg")
    assert (w, h) == (256, 256)  # quality step sufficed — no rescale
    assert len(buf) <= (q95 + q55) // 2
    assert decode_jpeg(buf).shape == (256, 256)

    # Limit below what q50 full-size achieves → must rescale.
    q50 = len(encode_image(img, "jpeg:50"))
    buf, w, h = encode_under_limit(img, max_bytes=q50 // 2, codec="jpeg")
    assert w < 256 and h < 256
    assert len(buf) <= q50 // 2
