"""Image codec for media payloads.

The engine treats page images as opaque ``binary`` columns with typed metadata
(``codec``, ``width``, ``height``) and decodes them only inside the layout /
OCR stages (reference decodes via pdf2image / PIL,
``tesseract_engine.py:133-144``). Native codecs:

- ``raw-zlib`` — zlib-compressed row-major uint8 grayscale (synthetic corpus)
- ``png``      — real PNG via the pure-numpy codec in ``sources.png``
- ``pdf``      — embedded-scan extraction via ``sources.pdf`` (scanned-page
  PDFs carry one image XObject per page; vector rasterization would need
  poppler and is out of scope for this container)
- ``jpeg``     — baseline JPEG via the pure-numpy codec in ``sources.jpeg``
  (encode accepts ``jpeg:<quality>``, e.g. ``jpeg:95``)
- ``tiff``     — grayscale TIFF via ``sources.tiff`` (decode: none / LZW /
  PackBits strips; encode: single-strip uncompressed)
"""

from __future__ import annotations

import zlib

import numpy as np

RAW_ZLIB = "raw-zlib"
PNG = "png"
JPEG = "jpeg"


def encode_image(img: np.ndarray, codec: str = RAW_ZLIB) -> bytes:
    """uint8 HxW grayscale → encoded bytes."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 HxW grayscale, got {img.dtype} ndim={img.ndim}")
    if codec == RAW_ZLIB:
        return zlib.compress(np.ascontiguousarray(img).tobytes(), 1)
    if codec == PNG:
        from .png import encode_png

        return encode_png(np.ascontiguousarray(img))
    if codec == JPEG or codec.startswith("jpeg:"):
        from .jpeg import encode_jpeg

        quality = int(codec.partition(":")[2]) if ":" in codec else 75
        return encode_jpeg(np.ascontiguousarray(img), quality)
    if codec in ("tiff", "tif"):
        from .tiff import encode_tiff

        return encode_tiff(np.ascontiguousarray(img))
    raise ValueError(f"unknown encode codec '{codec}'")


def decode_image(buf: bytes, width: int, height: int, codec: str = RAW_ZLIB) -> np.ndarray:
    """binary payload → uint8 HxW grayscale ndarray.

    ``width``/``height`` are the typed-metadata columns; self-describing
    codecs (png/pdf) validate against them when provided (>0)."""
    if codec == RAW_ZLIB:
        raw = zlib.decompress(buf)
        return np.frombuffer(raw, dtype=np.uint8).reshape(height, width)
    if codec == PNG:
        from .png import decode_png

        img = decode_png(buf)
        _check_dims(img, width, height, codec)
        return img
    if codec == "pdf":
        from .pdf import extract_page_image

        img = extract_page_image(buf)
        _check_dims(img, width, height, codec)
        return img
    if codec in ("jpeg", "jpg") or codec.startswith("jpeg:"):
        from .jpeg import decode_jpeg

        img = decode_jpeg(buf)
        _check_dims(img, width, height, codec)
        return img
    if codec in ("tiff", "tif"):
        from .tiff import decode_tiff

        img = decode_tiff(buf)
        _check_dims(img, width, height, codec)
        return img
    raise ValueError(f"unknown codec '{codec}'")


def _check_dims(img: np.ndarray, width: int, height: int, codec: str) -> None:
    if width and height and img.shape != (height, width):
        raise ValueError(
            f"{codec} payload is {img.shape[1]}x{img.shape[0]} but metadata "
            f"says {width}x{height}")
