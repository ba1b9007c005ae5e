"""Pure-numpy YUV4MPEG2 codec (sources/y4m.py) + its video-stage wiring."""

import numpy as np
import pyarrow as pa
import pytest

from norsk_historisk_avis_ocr_ray.sources.codec import decode_image
from norsk_historisk_avis_ocr_ray.sources.y4m import decode_y4m, encode_y4m
from norsk_historisk_avis_ocr_ray.stages.multimodal import VideoFrameSampleStage


def clip(n=25, h=8, w=16):
    return np.stack([np.full((h, w), i * 3, np.uint8) for i in range(n)])


def test_mono_roundtrip_exact():
    frames = clip()
    out, w, h, fps = decode_y4m(encode_y4m(frames, fps=(30, 1)))
    assert (w, h, fps) == (16, 8, (30, 1))
    assert np.array_equal(out, frames)


def test_c420_roundtrip_luma():
    frames = clip()
    out, w, h, _ = decode_y4m(encode_y4m(frames, colorspace="420"))
    assert np.array_equal(out, frames)  # chroma skipped, luma exact


def test_default_colorspace_is_420():
    # spec: missing C tag = 4:2:0 — build a stream without a C tag
    frames = clip(n=2, h=4, w=4)
    buf = encode_y4m(frames, colorspace="420")
    buf = buf.replace(b" C420\n", b"\n", 1)
    out, _, _, _ = decode_y4m(buf)
    assert np.array_equal(out, frames)


def test_unknown_colorspace_raises():
    buf = encode_y4m(clip(n=1))
    buf = buf.replace(b"Cmono", b"C410 ")
    with pytest.raises(NotImplementedError):
        decode_y4m(buf)


def test_not_y4m_raises():
    with pytest.raises(ValueError):
        decode_y4m(b"RIFF....WAVE")


def test_truncated_frame_raises():
    buf = encode_y4m(clip(n=3))
    with pytest.raises(ValueError):
        decode_y4m(buf[:-5])


def test_video_stage_y4m_matches_rawvideo():
    frames = clip(n=25)
    batch_raw = pa.Table.from_pylist([{
        "media_ref": "v0", "video": frames.tobytes(),
        "width": 16, "height": 8, "codec": "rawvideo-gray"}])
    batch_y4m = pa.Table.from_pylist([{
        "media_ref": "v0", "video": encode_y4m(frames),
        "width": 16, "height": 8, "codec": "y4m"}])
    stage = VideoFrameSampleStage(every_k=10)
    out_raw, out_y4m = stage(batch_raw), stage(batch_y4m)
    assert out_raw["frame_idx"].to_pylist() == out_y4m["frame_idx"].to_pylist()
    for a, b in zip(out_raw["image"].to_pylist(),
                    out_y4m["image"].to_pylist()):
        assert np.array_equal(decode_image(a, 16, 8), decode_image(b, 16, 8))
