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


def band_profiles(img: np.ndarray, threshold: int,
                  band_height: int) -> list[tuple[int, np.ndarray]]:
    """Per-band column dark-count profiles, exactly the bands
    ``layout.find_band_dividers`` iterates: ``height // band_height`` bands
    (min 1), bands shorter than 20 rows skipped, the sub-band tail ignored."""
    height = img.shape[0]
    n_bands = max(1, height // band_height)
    out: list[tuple[int, np.ndarray]] = []
    for b in range(n_bands):
        y0 = b * band_height
        y1 = min((b + 1) * band_height, height)
        if y1 - y0 < 20:
            continue
        out.append((y1 - y0,
                    (img[y0:y1] < threshold).sum(axis=0, dtype=np.int16)))
    return out


def decode_with_band_profiles(
    buf: bytes, width: int, height: int, codec: str = RAW_ZLIB,
    threshold: int = 200, band_height: int = 200,
) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Decode + band profiles in one cache-hot pass.

    The layout stage's first phase (divider detection) is the only full-image
    scan, and at high core counts the pipeline is DRAM-bandwidth-bound (see
    BASELINE.md): re-reading the 6 MB page the decoder just wrote costs a
    full memory round-trip per page. For ``raw-zlib`` this decompresses in
    band-sized output chunks and computes each band's column profile while
    its rows are still in L2 — the full-page *read* disappears from DRAM
    traffic. Other codecs decode normally and profile afterwards (their
    decoders are compute-dominated).
    """
    if codec != RAW_ZLIB:
        img = decode_image(buf, width, height, codec)
        return img, band_profiles(img, threshold, band_height)

    img = np.empty((height, width), dtype=np.uint8)
    flat = img.reshape(-1)
    dco = zlib.decompressobj()
    n_bands = max(1, height // band_height)
    profiles: list[tuple[int, np.ndarray]] = []
    next_band = 0
    data = buf
    pos = 0
    total = flat.size

    def emit_done(row_done: int) -> None:
        nonlocal next_band
        while next_band < n_bands:
            y0 = next_band * band_height
            y1 = min((next_band + 1) * band_height, height)
            if y1 > row_done:
                break
            if y1 - y0 >= 20:
                profiles.append(
                    (y1 - y0,
                     (img[y0:y1] < threshold).sum(axis=0, dtype=np.int16)))
            next_band += 1

    while pos < total:
        chunk = dco.decompress(data, min(band_height * width, total - pos))
        data = dco.unconsumed_tail
        if not chunk:
            chunk = dco.flush()
            if not chunk:
                raise ValueError("raw-zlib payload truncated")
        flat[pos:pos + len(chunk)] = np.frombuffer(chunk, dtype=np.uint8)
        pos += len(chunk)
        emit_done(pos // width)
    emit_done(height)
    return img, profiles
