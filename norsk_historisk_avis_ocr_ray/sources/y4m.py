"""Pure-numpy YUV4MPEG2 (.y4m) video container codec.

De-stubs the video decode slot of ``stages.multimodal`` the way
``sources/wav.py`` de-stubs audio: a real, published container format
parsed without external libraries. Y4M is the uncompressed interchange
format of the mjpegtools/ffmpeg ecosystem: an ASCII stream header
``YUV4MPEG2 W<w> H<h> F<n>:<d> [I<i>] [A<a>:<b>] [C<cs>]`` followed by
frames, each ``FRAME[ params]\\n`` + raw planar YUV.

Supported colorspaces: C420 (+ C420jpeg/C420paldv/C420mpeg2), C422, C444,
Cmono — all planar 8-bit. Frame extraction returns the luma (Y) plane,
which is exactly what the grayscale frame-sampling stage consumes; chroma
planes are sized per colorspace and skipped. Compressed codecs inside
other containers still raise ``NotImplementedError``.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"

# chroma bytes per luma pixel (planar 8-bit)
_CHROMA_FRACTION = {
    "420": 0.5, "420jpeg": 0.5, "420paldv": 0.5, "420mpeg2": 0.5,
    "422": 1.0, "444": 2.0, "mono": 0.0,
}


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1),
               colorspace: str = "mono") -> bytes:
    """(n, h, w) uint8 luma frames → Y4M bytes (Cmono by default; C420
    writes neutral 128-valued chroma planes)."""
    frames = np.asarray(frames, np.uint8)
    n, h, w = frames.shape
    if colorspace not in _CHROMA_FRACTION:
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    header = (f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
              f"C{colorspace}\n").encode("ascii")
    chroma_len = int(w * h * _CHROMA_FRACTION[colorspace])
    chroma = b"\x80" * chroma_len
    out = [header]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
        out.append(chroma)
    return b"".join(out)


def decode_y4m(buf: bytes) -> tuple[np.ndarray, int, int, tuple[int, int]]:
    """Y4M bytes → ((n, h, w) uint8 luma frames, width, height, fps).

    Walks the stream header tags, then slices each frame's Y plane at a
    fixed stride — zero-copy views reshaped once at the end.
    """
    if not buf.startswith(_MAGIC + b" ") and not buf.startswith(_MAGIC + b"\n"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = buf.index(b"\n")
    w = h = None
    fps = (25, 1)
    colorspace = "420"  # the spec's default when no C tag is present
    for tag in buf[len(_MAGIC):nl].decode("ascii", "replace").split():
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("F"):
            num, den = tag[1:].split(":")
            fps = (int(num), int(den))
        elif tag.startswith("C"):
            colorspace = tag[1:]
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H tags")
    if colorspace not in _CHROMA_FRACTION:
        raise NotImplementedError(
            f"Y4M colorspace C{colorspace} requires a decoder not present "
            "in this environment (supported: "
            + ", ".join(sorted(_CHROMA_FRACTION)) + ")")
    luma_len = w * h
    frame_len = luma_len + int(luma_len * _CHROMA_FRACTION[colorspace])

    arr = np.frombuffer(buf, np.uint8)
    pos = nl + 1
    frames = []
    while pos < len(arr):
        # each frame starts with "FRAME" + optional params + "\n"
        head = buf[pos:pos + 5]
        if head != b"FRAME":
            raise ValueError(f"corrupt Y4M frame marker at byte {pos}")
        fnl = buf.index(b"\n", pos)
        data_start = fnl + 1
        if data_start + frame_len > len(arr):
            raise ValueError("truncated Y4M frame payload")
        frames.append(arr[data_start:data_start + luma_len])
        pos = data_start + frame_len
    if not frames:
        return np.empty((0, h, w), np.uint8), w, h, fps
    return np.stack(frames).reshape(-1, h, w), w, h, fps
