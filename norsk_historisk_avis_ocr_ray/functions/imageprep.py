"""Image preparation operators (reference T4/T5 semantics, numpy-native).

- ``prepare_image``: 3×3 sharpen convolution + contrast ×1.3 — the
  vision-engine preprocessing of ``claude_vision_engine.py:98-104`` (PIL
  SHARPEN + ImageEnhance.Contrast(1.3)), reimplemented on uint8 arrays.
- ``encode_under_limit``: the size-ladder of
  ``claude_vision_engine.py:107-127`` — the reference's exact control flow:
  encode at quality 95, drop the quality by 10 down to 50, then rescale ×0.8
  and reset quality, until the encoded payload fits the API limit (the
  reference compares raw encoded byte length against 5 MB,
  ``claude_vision_engine.py:92-95``). Lossy quality steps run when the codec
  is ``jpeg`` (the pure-numpy codec in ``sources.jpeg``); lossless codecs
  (png / raw-zlib) have no quality knob, so their ladder is rescale-only —
  same loop, quality steps skipped.
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
    quality_start: int = 95,
    quality_floor: int = 50,
    quality_step: int = 10,
) -> tuple[bytes, int, int]:
    """Encode with ``codec`` until the encoded payload is ≤ max_bytes:
    lossy codecs walk quality ``95 → 50`` by 10 first, then rescale
    ×scale_step and reset quality (reference ladder,
    ``claude_vision_engine.py:107-127``). Returns (payload, width, height)."""
    lossy = codec == "jpeg" or codec.startswith("jpeg:")
    cur = img
    quality = quality_start
    for _ in range(max_rounds * ((quality_start - quality_floor)
                                 // quality_step + 1)):
        h, w = cur.shape
        enc_codec = f"jpeg:{quality}" if lossy else codec
        payload = encode_image(np.ascontiguousarray(cur), enc_codec)
        if len(payload) <= max_bytes:
            return payload, w, h
        if lossy and quality > quality_floor:
            quality -= quality_step  # lower quality first
            continue
        nh, nw = max(1, int(h * scale_step)), max(1, int(w * scale_step))
        ys = (np.arange(nh) * (h / nh)).astype(np.int64)
        xs = (np.arange(nw) * (w / nw)).astype(np.int64)
        cur = cur[ys][:, xs]
        quality = quality_start  # reset quality after resize
    raise ValueError("could not fit image under limit")
