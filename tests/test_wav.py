"""Pure-numpy RIFF/WAVE codec (sources/wav.py) + its audio-stage wiring."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from norsk_historisk_avis_ocr_ray.sources.wav import (
    decode_wav, decode_wav_mono16, encode_wav)
from norsk_historisk_avis_ocr_ray.stages.multimodal import AudioFrameSampleStage


def tone(n=5000, freq=440.0, rate=16000):
    x = 0.5 * np.sin(2 * np.pi * freq / rate * np.arange(n))
    return (x * 32767).astype(np.int16)


def test_pcm16_roundtrip_exact():
    pcm = tone()
    buf = encode_wav(pcm, 16000)
    out, rate, ch = decode_wav(buf)
    assert (rate, ch) == (16000, 1)
    assert np.array_equal(out[:, 0], pcm)
    mono, rate2 = decode_wav_mono16(buf)
    assert rate2 == 16000
    assert np.array_equal(mono, pcm)


def test_stereo_roundtrip_and_downmix():
    left, right = tone(freq=440.0), tone(freq=880.0)
    inter = np.stack([left, right], axis=1)
    buf = encode_wav(inter, 44100)
    out, rate, ch = decode_wav(buf)
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(out, inter)
    mono, _ = decode_wav_mono16(buf)
    expect = np.clip((left.astype(np.float64) + right) / 2.0,
                     -32768, 32767).astype(np.int16)
    assert np.array_equal(mono, expect)


def _wav_with_fmt(samples_bytes: bytes, tag: int, channels: int, rate: int,
                  bits: int, extra_chunk: bytes = b"") -> bytes:
    block = channels * max(bits // 8, 1)
    fmt = struct.pack("<HHIIHH", tag, channels, rate, rate * block, block,
                      bits)
    body = (b"WAVE" + extra_chunk
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(samples_bytes)) + samples_bytes)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_float32_and_uint8_normalization():
    x = np.linspace(-1.0, 1.0, 100).astype("<f4")
    mono, rate = decode_wav_mono16(_wav_with_fmt(x.tobytes(), 3, 1, 8000, 32))
    assert rate == 8000
    assert np.array_equal(mono, np.clip(x.astype(np.float64) * 32767,
                                        -32768, 32767).astype(np.int16))
    u8 = np.array([0, 128, 255], np.uint8)
    mono, _ = decode_wav_mono16(_wav_with_fmt(u8.tobytes(), 1, 1, 8000, 8))
    assert mono.tolist() == [-32768, 0, 32512]


def test_24bit_sign_extension():
    vals = np.array([-(2 ** 23), -1, 0, 1, 2 ** 23 - 1], np.int32)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    out, _, _ = decode_wav(_wav_with_fmt(raw, 1, 1, 8000, 24))
    assert out[:, 0].tolist() == vals.tolist()


def test_extra_chunks_skipped():
    # LIST chunk before fmt — common in real files; walker must skip it
    pcm = tone(100)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd → pad
    buf = _wav_with_fmt(pcm.tobytes(), 1, 1, 16000, 16, extra_chunk=extra)
    mono, _ = decode_wav_mono16(buf)
    assert np.array_equal(mono, pcm)


def test_compressed_tag_raises():
    with pytest.raises(NotImplementedError):
        decode_wav(_wav_with_fmt(b"\x00" * 8, 0x55, 1, 16000, 16))  # MP3


def test_not_riff_raises():
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_audio_stage_wav_matches_pcm16():
    pcm = tone(20000)
    b_pcm = pa.Table.from_pylist([
        {"media_ref": "a0", "audio": pcm.tobytes(), "codec": "pcm16"}])
    b_wav = pa.Table.from_pylist([
        {"media_ref": "a0", "audio": encode_wav(pcm, 16000), "codec": "wav"}])
    stage = AudioFrameSampleStage(frame_samples=1024, hop=4096)
    out_pcm, out_wav = stage(b_pcm), stage(b_wav)
    assert out_pcm["frame"].to_pylist() == out_wav["frame"].to_pylist()
    assert out_pcm["frame_idx"].to_pylist() == out_wav["frame_idx"].to_pylist()
