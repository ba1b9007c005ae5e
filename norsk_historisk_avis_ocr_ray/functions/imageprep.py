"""Image preparation operators (reference T4/T5 semantics, numpy-native).

- ``prepare_image``: 3×3 sharpen convolution + contrast ×1.3 — the
  vision-engine preprocessing of ``claude_vision_engine.py:98-104`` (PIL
  SHARPEN + ImageEnhance.Contrast(1.3)), reimplemented on uint8 arrays.
- ``encode_under_limit``: the size-ladder of
  ``claude_vision_engine.py:107-127`` — re-encode, and rescale ×0.8 and retry
  until the encoded payload fits the API limit (the reference compares the
  raw encoded byte length against 5 MB, ``claude_vision_engine.py:92-95``).
  The reference's first knob is JPEG quality; PNG (the codec this container
  encodes) is lossless with no quality knob, so the ladder goes straight to
  the rescale loop — same control flow, and a JPEG encoder can plug into the
  ``codec=`` parameter to restore the quality steps.
"""

from __future__ import annotations

import numpy as np

from ..sources.codec import RAW_ZLIB, encode_image

# PIL's ImageFilter.SHARPEN kernel: 3x3, scale 16.
_SHARPEN = np.array([[-2, -2, -2],
                     [-2, 32, -2],
                     [-2, -2, -2]], dtype=np.float64) / 16.0


def prepare_image(img: np.ndarray, contrast: float = 1.3) -> np.ndarray:
    """Sharpen + contrast boost for OCR-hostile scans (uint8 HxW in/out)."""
    f = img.astype(np.float64)
    padded = np.pad(f, 1, mode="edge")
    out = np.zeros_like(f)
    for dy in range(3):
        for dx in range(3):
            out += _SHARPEN[dy, dx] * padded[dy:dy + f.shape[0],
                                             dx:dx + f.shape[1]]
    # contrast around the mean (PIL ImageEnhance.Contrast semantics)
    mean = out.mean()
    out = mean + (out - mean) * contrast
    return np.clip(out, 0, 255).astype(np.uint8)


def encode_under_limit(
    img: np.ndarray,
    max_bytes: int = 5 * 1024 * 1024,
    scale_step: float = 0.8,
    max_rounds: int = 20,
    codec: str = RAW_ZLIB,
) -> tuple[bytes, int, int]:
    """Encode with ``codec``, rescaling ×scale_step until the encoded payload
    is ≤ max_bytes. Returns (payload, width, height) — the reference's ladder
    with PNG/raw in place of the JPEG quality steps."""
    cur = img
    for _ in range(max_rounds):
        h, w = cur.shape
        payload = encode_image(np.ascontiguousarray(cur), codec)
        if len(payload) <= max_bytes:
            return payload, w, h
        nh, nw = max(1, int(h * scale_step)), max(1, int(w * scale_step))
        ys = (np.arange(nh) * (h / nh)).astype(np.int64)
        xs = (np.arange(nw) * (w / nw)).astype(np.int64)
        cur = cur[ys][:, xs]
    raise ValueError("could not fit image under limit")
