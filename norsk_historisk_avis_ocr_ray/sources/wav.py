"""Pure-numpy RIFF/WAVE container codec.

De-stubs the audio decode slot of ``stages.multimodal`` the same way the
pure-numpy image codecs (``sources/png.py``/``jpeg.py``/``tiff.py``) de-stub
image decode — a real container format parsed from the public spec, no
external library. (Reference analogue: the decode discipline of
S2/S3, ``pdf_converter.py`` / image loading in the reference repo; WAV
itself is beyond the reference's scope and belongs to the multimodal
training-data brief.)

Supported: RIFF little-endian WAVE; ``fmt `` tags 1 (integer PCM: 8u / 16 /
24 / 32 bit) and 3 (IEEE float32/float64); any channel count (decode
returns the interleaved channels; ``decode_wav_mono16`` downmixes by mean
and normalizes to int16, the frame-sampling stage's working dtype).
Compressed tags (MP3=0x55, etc.) raise ``NotImplementedError`` — they need
codecs absent from this container.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_PCM = 1
_TAG_FLOAT = 3
_TAG_EXTENSIBLE = 0xFFFE


def encode_wav(pcm: np.ndarray, rate: int) -> bytes:
    """int16 samples (mono ``(n,)`` or interleaved ``(n, channels)``) →
    canonical PCM16 WAVE bytes."""
    pcm = np.asarray(pcm, dtype="<i2")
    channels = 1 if pcm.ndim == 1 else int(pcm.shape[1])
    data = pcm.tobytes()
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", _TAG_PCM, channels, rate,
                      rate * block_align, block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) % 2 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int, int]:
    """WAVE bytes → (samples ``(n, channels)`` native dtype, rate, channels).

    Walks the RIFF chunk list (word-aligned), so extra chunks (LIST, fact,
    cue) are skipped, not errors.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(buf), 8 + struct.unpack("<I", buf[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            tag, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if tag == _TAG_EXTENSIBLE and size >= 40:
                # the real format tag is the first 2 bytes of the SubFormat
                # GUID at offset 24
                tag = struct.unpack("<H", body[24:26])[0]
            fmt = (tag, channels, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE stream missing fmt/data chunk")
    tag, channels, rate, bits = fmt
    if tag == _TAG_PCM:
        if bits == 8:
            samples = np.frombuffer(data, np.uint8)
        elif bits == 16:
            samples = np.frombuffer(data, "<i2")
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8)
            raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3)
            samples = ((raw[:, 0].astype(np.int32))
                       | (raw[:, 1].astype(np.int32) << 8)
                       | (raw[:, 2].astype(np.int32) << 16))
            samples = (samples << 8) >> 8  # sign-extend 24 → 32
        elif bits == 32:
            samples = np.frombuffer(data, "<i4")
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == _TAG_FLOAT:
        if bits == 32:
            samples = np.frombuffer(data, "<f4")
        elif bits == 64:
            samples = np.frombuffer(data, "<f8")
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise NotImplementedError(
            f"WAVE format tag 0x{tag:02x} requires a compressed-audio codec "
            "not present in this environment")
    n = len(samples) - len(samples) % max(channels, 1)
    return samples[:n].reshape(-1, channels), rate, channels


def decode_wav_mono16(buf: bytes) -> tuple[np.ndarray, int]:
    """WAVE bytes → (mono int16 samples, rate): mean-downmix multichannel,
    normalize any supported sample format to the int16 working dtype."""
    samples, rate, channels = decode_wav(buf)
    x = samples.astype(np.float64)
    if samples.dtype == np.uint8:
        x = (x - 128.0) * 256.0
    elif samples.dtype == np.int32:
        # 24-bit came sign-extended to int32 (max 2^23), true int32 is 2^31
        peak = 2.0 ** 23 if np.abs(x).max(initial=0.0) <= 2.0 ** 23 else 2.0 ** 31
        x = x * (32768.0 / peak)
    elif samples.dtype.kind == "f":
        x = x * 32767.0
    if channels > 1:
        x = x.mean(axis=1, keepdims=True)
    return np.clip(x[:, 0], -32768, 32767).astype(np.int16), rate
