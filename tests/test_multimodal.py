"""Multimodal stage tests: real transforms over the native codecs, stubbed
decodes raise cleanly, and the actor-pool plumbing works inside map_batches."""

import numpy as np
import pyarrow as pa
import pytest

import ray
from norsk_historisk_avis_ocr_ray.sources.codec import decode_image, encode_image
from norsk_historisk_avis_ocr_ray.stages.multimodal import (
    AudioFrameSampleStage,
    ImageFeatureStage,
    ImageResizeStage,
    VideoFrameSampleStage,
)


def image_batch(n=3, w=800, h=600):
    rows = []
    for i in range(n):
        img = np.full((h, w), 255, np.uint8)
        img[i::7] = 30
        rows.append({"media_ref": f"m{i}", "image": encode_image(img),
                     "width": w, "height": h, "codec": "raw-zlib"})
    return pa.Table.from_pylist(rows)


def test_resize_caps_max_side():
    out = ImageResizeStage(max_side=200)(image_batch())
    for w, h, buf in zip(out["width"].to_pylist(), out["height"].to_pylist(),
                         out["image"].to_pylist()):
        assert max(w, h) == 200
        assert decode_image(buf, w, h).shape == (h, w)


def test_resize_noop_when_small():
    out = ImageResizeStage(max_side=5000)(image_batch())
    assert out["width"].to_pylist() == [800] * 3


def test_features_shape_and_determinism():
    b = image_batch()
    f1 = ImageFeatureStage()(b)["features"].to_pylist()
    f2 = ImageFeatureStage()(b)["features"].to_pylist()
    assert f1 == f2
    assert all(len(v) == 3 + ImageFeatureStage.N_BINS for v in f1)


def test_audio_frame_sampling():
    pcm = (np.arange(20000) % 997).astype(np.int16)
    batch = pa.Table.from_pylist([
        {"media_ref": "a0", "audio": pcm.tobytes(), "codec": "pcm16"}])
    out = AudioFrameSampleStage(frame_samples=1024, hop=4096)(batch)
    assert out.num_rows == len(range(0, 20000 - 1024 + 1, 4096))
    first = np.frombuffer(out["frame"][0].as_py(), dtype=np.int16)
    assert np.array_equal(first, pcm[:1024])


def test_audio_unsupported_codec_raises():
    batch = pa.Table.from_pylist([
        {"media_ref": "a0", "audio": b"xx", "codec": "mp3"}])
    with pytest.raises(NotImplementedError):
        AudioFrameSampleStage()(batch)


def test_video_frame_sampling():
    w, h, n = 16, 8, 25
    frames = np.stack([np.full((h, w), i, np.uint8) for i in range(n)])
    batch = pa.Table.from_pylist([{
        "media_ref": "v0", "video": frames.tobytes(), "width": w, "height": h,
        "codec": "rawvideo-gray"}])
    out = VideoFrameSampleStage(every_k=10)(batch)
    assert out["frame_idx"].to_pylist() == [0, 10, 20]
    img0 = decode_image(out["image"][0].as_py(), w, h)
    assert (img0 == 0).all()


def test_spectrogram_stage_recovers_tone():
    from norsk_historisk_avis_ocr_ray.stages.multimodal import (
        AudioSpectrogramStage)
    rate, n, freq = 16000, 12000, 1000.0  # 1 kHz = exactly bin 64 @1024
    pcm = (0.5 * np.sin(2 * np.pi * freq / rate * np.arange(n))
           * 32767).astype(np.int16)
    batch = pa.Table.from_pylist([
        {"media_ref": "a0", "audio": pcm.tobytes(), "codec": "pcm16"}])
    frames = AudioFrameSampleStage()(batch)
    out = AudioSpectrogramStage(sample_rate=rate)(frames)
    assert out.num_rows == frames.num_rows
    bin_hz = rate / 1024.0
    for hz in out["dominant_hz"].to_pylist():
        assert abs(hz - freq) <= bin_hz
    # a pure tone's spectral centroid sits near the tone too (noise floor
    # from int16 quantization pulls it only slightly)
    for c in out["centroid_hz"].to_pylist():
        assert abs(c - freq) < 200.0
    # empty batch passes through with the same schema
    empty = AudioSpectrogramStage(sample_rate=rate)(frames.slice(0, 0))
    assert empty.num_rows == 0
    assert empty.schema == out.schema


def test_audio_spectrogram_query_recovers_planted_tones(ray_session):
    import __ray_entry__ as entry

    df = entry.queries()["audio_spectrogram"](
        "/root/testdata/sf0.001").to_pandas()
    assert len(df) > 0
    bin_hz = 16000 / 1024.0
    for ref, hz in zip(df["media_ref"], df["dominant_hz"]):
        doc_id = int(ref.split("//")[1])
        planted = 200.0 + (doc_id % 40) * 10.0
        assert abs(hz - planted) <= bin_hz, (ref, hz, planted)
    assert (df["n_frames"] >= 1).all()
    assert (df["mean_power"] > 0).all()


def test_feature_stage_in_actor_pool():
    ds = ray.data.from_arrow(image_batch(8))
    out = ds.map_batches(ImageFeatureStage, batch_format="pyarrow",
                         batch_size=4, concurrency=2, num_cpus=1)
    assert out.count() == 8


def test_shot_detect_planted_cuts():
    """Stage-level: two abrupt brightness jumps in a rawvideo-gray clip
    are recovered exactly; within-shot noise stays silent."""
    from norsk_historisk_avis_ocr_ray.stages.multimodal import (
        VideoShotDetectStage)

    rng = np.random.default_rng(3)
    w, h, n = 16, 8, 30
    base = rng.integers(0, 32, size=(n, h, w)).astype(np.float64)
    offs = np.zeros(n)
    offs[10:] += 60
    offs[20:] -= 60
    frames = np.minimum(base + offs[:, None, None], 255).astype(np.uint8)
    batch = pa.Table.from_pylist([{
        "media_ref": "v0", "video": frames.tobytes(), "width": w,
        "height": h, "codec": "rawvideo-gray"}])
    out = VideoShotDetectStage()(batch)
    assert out["n_frames"].to_pylist() == [30]
    assert out["n_shots"].to_pylist() == [3]
    assert out["boundaries"].to_pylist() == ["10,20"]


def test_shot_detect_single_frame_and_flat_clip():
    from norsk_historisk_avis_ocr_ray.stages.multimodal import (
        VideoShotDetectStage)

    w, h = 8, 4
    one = np.full((1, h, w), 7, np.uint8)
    flat = np.full((12, h, w), 7, np.uint8)
    batch = pa.Table.from_pylist([
        {"media_ref": "v1", "video": one.tobytes(), "width": w,
         "height": h, "codec": "rawvideo-gray"},
        {"media_ref": "v2", "video": flat.tobytes(), "width": w,
         "height": h, "codec": "rawvideo-gray"}])
    out = VideoShotDetectStage()(batch)
    assert out["n_shots"].to_pylist() == [1, 1]
    assert out["boundaries"].to_pylist() == ["", ""]


def test_video_shot_detect_query_recovers_synth_plan(ray_session):
    """End-to-end over the y4m container path: every clip's detected cut
    list equals the planted scene plan replayed from the doc seed."""
    import __ray_entry__ as entry
    from norsk_historisk_avis_ocr_ray.functions.dedup import _fmix64

    df = (entry.queries()["video_shot_detect"]("/root/testdata/sf0.001")
          .to_pandas().sort_values("media_ref").reset_index(drop=True))
    assert len(df) > 0
    for _, row in df.iterrows():
        d = int(row["media_ref"].split("://")[1])
        seed = int(_fmix64(np.uint64((d + 8765) & 0xFFFFFFFFFFFFFFFF)))
        nf = 24 + seed % 25
        n_scenes = 2 + seed % 3
        cuts = [(s * nf) // n_scenes for s in range(1, n_scenes)]
        assert row["n_frames"] == nf
        assert row["n_shots"] == n_scenes
        assert row["boundaries"] == ",".join(str(c) for c in cuts)
