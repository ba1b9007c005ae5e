"""Image codec for media payloads.

The engine treats page images as opaque ``binary`` columns with typed metadata
(``codec``, ``width``, ``height``) and decodes them only inside the layout /
OCR stages (reference decodes via pdf2image / PIL,
``tesseract_engine.py:133-144``). This container has no imaging libraries, so
the native codec is ``raw-zlib``: zlib-compressed row-major uint8 grayscale.
PNG/JPEG/PDF decoders are stubbed behind the same contract and raise
``NotImplementedError`` with a clear message — the Ray-side plumbing (schema,
batch sizing, actor signature) is identical for a real codec.
"""

from __future__ import annotations

import zlib

import numpy as np

RAW_ZLIB = "raw-zlib"


def encode_image(img: np.ndarray) -> bytes:
    """uint8 HxW grayscale → zlib bytes (level 1: images are held briefly)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError(f"expected uint8 HxW grayscale, got {img.dtype} ndim={img.ndim}")
    return zlib.compress(np.ascontiguousarray(img).tobytes(), 1)


def decode_image(buf: bytes, width: int, height: int, codec: str = RAW_ZLIB) -> np.ndarray:
    """binary payload → uint8 HxW grayscale ndarray."""
    if codec == RAW_ZLIB:
        raw = zlib.decompress(buf)
        return np.frombuffer(raw, dtype=np.uint8).reshape(height, width)
    if codec in ("png", "jpeg", "pdf"):
        raise NotImplementedError(
            f"codec '{codec}' requires an imaging library not present in this "
            "environment; plug a decoder into sources.codec.decode_image — the "
            "pipeline stages only depend on the (bytes → HxW uint8) contract"
        )
    raise ValueError(f"unknown codec '{codec}'")
