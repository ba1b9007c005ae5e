"""Multimodal column stages: images/audio/video as opaque binary + metadata.

Media are carried as ``binary`` columns with typed metadata (codec, dims,
sample rate); every transform below is an actor-pool ``map_batches`` stage
whose Ray-side plumbing (schema in/out, batching, per-actor state) is real
and tested. Image codecs (raw-zlib/png/jpeg/tiff/pdf — ``sources.codec``)
are fully functional pure-numpy implementations; audio decode handles raw
PCM16 plus real RIFF/WAVE containers (``sources.wav``) and video decode
handles raw grayscale frames plus real YUV4MPEG2 containers
(``sources.y4m``) — both pure numpy. Only *compressed* audio/video decode
(mp3/ogg/h264), whose libraries are absent from this container, is stubbed
behind ``NotImplementedError`` with the contract documented. All
numpy-side transforms (resize, features, frame sampling) are fully
functional.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.codec import decode_image, encode_image


class ImageResizeStage:
    """Nearest-neighbour resize of grayscale images to a target max side.
    Real transform over the raw-zlib codec; output is re-encoded binary +
    updated dims."""

    def __init__(self, max_side: int = 512):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_img, out_w, out_h = [], [], []
        for buf, w, h, codec in zip(batch["image"].to_pylist(),
                                    batch["width"].to_pylist(),
                                    batch["height"].to_pylist(),
                                    batch["codec"].to_pylist()):
            img = decode_image(buf, w, h, codec or "raw-zlib")
            scale = self.max_side / max(w, h)
            if scale < 1.0:
                nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
                ys = (np.arange(nh) * (h / nh)).astype(np.int64)
                xs = (np.arange(nw) * (w / nw)).astype(np.int64)
                img = img[ys][:, xs]
            out_img.append(encode_image(np.ascontiguousarray(img)))
            out_h.append(img.shape[0])
            out_w.append(img.shape[1])
        return pa.table({
            "media_ref": batch["media_ref"],
            "image": pa.array(out_img, pa.binary()),
            "width": pa.array(out_w, pa.int32()),
            "height": pa.array(out_h, pa.int32()),
            "codec": pa.array(["raw-zlib"] * len(out_img), pa.string()),
        })


class ImageFeatureStage:
    """Per-image feature vector (list<float>): intensity stats + 16-bin
    histogram + ink ratio — the embedding-extraction slot (a real model would
    load in __init__, per actor)."""

    N_BINS = 16

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for buf, w, h, codec in zip(batch["image"].to_pylist(),
                                    batch["width"].to_pylist(),
                                    batch["height"].to_pylist(),
                                    batch["codec"].to_pylist()):
            img = decode_image(buf, w, h, codec or "raw-zlib")
            # stats on a 4×4-strided subsample (deterministic, zero-copy
            # view): full-resolution stats cost ~150ms/page in float casts
            # for no feature value — 16× fewer pixels, same signal
            sub = img[::4, ::4]
            # 16 equal bins over 0..255 == value >> 4 (np.histogram would
            # round-trip the pixels through float64 — ~10× slower)
            hist = np.bincount((sub.ravel() >> 4), minlength=self.N_BINS)
            hist = hist / max(sub.size, 1)
            vec = np.concatenate([
                [sub.mean() / 255.0, sub.std() / 255.0,
                 float((sub < 200).mean())],
                hist,
            ]).astype(np.float32)
            feats.append(vec.tolist())
        return pa.table({
            "media_ref": batch["media_ref"],
            "features": pa.array(feats, pa.list_(pa.float32())),
        })


class AudioFrameSampleStage:
    """Sample fixed-length frames from an audio binary column.

    Real decode paths: ``codec='pcm16'`` (headerless raw int16) and
    ``codec='wav'`` (RIFF/WAVE container, pure-numpy ``sources.wav`` parser
    — 8/16/24/32-bit PCM and float32/64, any channel count, mean-downmixed
    to the int16 working dtype). Compressed codecs (mp3/ogg) raise
    NotImplementedError — those libraries are not in this container.
    """

    def __init__(self, frame_samples: int = 1024, hop: int = 4096):
        self.frame_samples = frame_samples
        self.hop = hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.wav import decode_wav_mono16

        refs, frame_idx, frames = [], [], []
        for ref, buf, codec in zip(batch["media_ref"].to_pylist(),
                                   batch["audio"].to_pylist(),
                                   batch["codec"].to_pylist()):
            if codec == "wav":
                pcm, _rate = decode_wav_mono16(buf)
            elif codec == "pcm16":
                pcm = np.frombuffer(buf, dtype=np.int16)
            else:
                raise NotImplementedError(
                    f"audio codec {codec!r} requires a decoder not present in "
                    "this environment; provide PCM16/WAV or plug a decoder")
            for i, start in enumerate(range(0, max(len(pcm) - self.frame_samples + 1, 0),
                                            self.hop)):
                refs.append(ref)
                frame_idx.append(i)
                frames.append(pcm[start:start + self.frame_samples].tobytes())
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


class AudioSpectrogramStage:
    """Per-frame magnitude-spectrum features from int16 PCM frames (the
    output of ``AudioFrameSampleStage``): rfft power spectrum → dominant
    bin/frequency, spectral centroid, total power. Pure numpy FFT —
    deterministic, no external DSP library. Stateless task form (state is
    one int — the MinHasher/LangIdStage actor-pool reasoning applies)."""

    def __init__(self, sample_rate: int = 16000):
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames = batch["frame"].to_pylist()
        if not frames:
            return pa.table({
                "media_ref": pa.array([], pa.string()),
                "frame_idx": pa.array([], pa.int32()),
                "dominant_bin": pa.array([], pa.int64()),
                "dominant_hz": pa.array([], pa.float64()),
                "centroid_hz": pa.array([], pa.float64()),
                "power": pa.array([], pa.float64())})
        pcm = np.stack([np.frombuffer(b, np.int16) for b in frames]
                       ).astype(np.float64)
        spec = np.abs(np.fft.rfft(pcm, axis=1)) ** 2
        spec[:, 0] = 0.0                       # drop DC so the tone wins
        dom = spec.argmax(axis=1).astype(np.int64)
        freqs = np.fft.rfftfreq(pcm.shape[1], d=1.0 / self.sample_rate)
        tot = spec.sum(axis=1)
        cent = (spec * freqs[None, :]).sum(axis=1) / np.maximum(tot, 1e-30)
        return pa.table({
            "media_ref": batch["media_ref"],
            "frame_idx": batch["frame_idx"],
            "dominant_bin": pa.array(dom, pa.int64()),
            "dominant_hz": pa.array(freqs[dom], pa.float64()),
            "centroid_hz": pa.array(cent, pa.float64()),
            "power": pa.array(tot, pa.float64())})


class VideoFrameSampleStage:
    """Sample every k-th frame from a video binary column.

    Real decode paths: ``codec='rawvideo-gray'`` (headerless n × h × w
    uint8) and ``codec='y4m'`` (YUV4MPEG2 container, pure-numpy
    ``sources.y4m`` parser — C420/C422/C444/Cmono, luma-plane extraction).
    Compressed codecs (h264/vp9) raise NotImplementedError — those
    libraries are not in this container."""

    def __init__(self, every_k: int = 10):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.y4m import decode_y4m

        refs, idxs, imgs = [], [], []
        for ref, buf, w, h, codec in zip(batch["media_ref"].to_pylist(),
                                         batch["video"].to_pylist(),
                                         batch["width"].to_pylist(),
                                         batch["height"].to_pylist(),
                                         batch["codec"].to_pylist()):
            if codec == "y4m":
                arr, w, h, _fps = decode_y4m(buf)
            elif codec == "rawvideo-gray":
                frame_bytes = w * h
                n = len(buf) // frame_bytes
                arr = np.frombuffer(buf[:n * frame_bytes], dtype=np.uint8)
                arr = arr.reshape(n, h, w)
            else:
                raise NotImplementedError(
                    f"video codec {codec!r} requires a decoder not present in "
                    "this environment; provide rawvideo-gray/y4m or plug a "
                    "decoder")
            for i in range(0, len(arr), self.every_k):
                refs.append(ref)
                idxs.append(i)
                imgs.append(encode_image(np.ascontiguousarray(arr[i])))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "image": pa.array(imgs, pa.binary()),
        })


class VideoShotDetectStage:
    """Shot-boundary detection over a video binary column: mean absolute
    luma difference between consecutive frames, a cut wherever the
    difference exceeds ``threshold`` (the classical intensity-based
    detector; content jumps dwarf within-shot noise). Decode paths match
    ``VideoFrameSampleStage`` (y4m / rawvideo-gray; compressed codecs
    raise). Per-clip outputs only — no shuffle: the clip is the unit of
    work, so boundaries never cross a batch.

    Output: (media_ref, n_frames, n_shots, boundaries) where boundaries is
    the comma-joined list of first-frame indices of each new shot
    (empty string when the clip is a single shot)."""

    def __init__(self, threshold: float = 24.0):
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.y4m import decode_y4m

        refs, nfs, nss, bss = [], [], [], []
        for ref, buf, w, h, codec in zip(batch["media_ref"].to_pylist(),
                                         batch["video"].to_pylist(),
                                         batch["width"].to_pylist(),
                                         batch["height"].to_pylist(),
                                         batch["codec"].to_pylist()):
            if codec == "y4m":
                arr, w, h, _fps = decode_y4m(buf)
            elif codec == "rawvideo-gray":
                frame_bytes = w * h
                n = len(buf) // frame_bytes
                arr = np.frombuffer(buf[:n * frame_bytes], dtype=np.uint8)
                arr = arr.reshape(n, h, w)
            else:
                raise NotImplementedError(
                    f"video codec {codec!r} requires a decoder not present "
                    "in this environment; provide rawvideo-gray/y4m or plug "
                    "a decoder")
            if len(arr) < 2:
                cuts = np.array([], np.int64)
            else:
                d = np.abs(np.diff(arr.astype(np.int16), axis=0))
                score = d.mean(axis=(1, 2))
                cuts = np.flatnonzero(score > self.threshold) + 1
            refs.append(ref)
            nfs.append(len(arr))
            nss.append(len(cuts) + 1)
            bss.append(",".join(str(int(c)) for c in cuts))
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "n_frames": pa.array(nfs, pa.int64()),
            "n_shots": pa.array(nss, pa.int64()),
            "boundaries": pa.array(bss, pa.string()),
        })


class ImagePHashStage:
    """Perceptual hash (pHash) per image — the image-dedup fingerprint a
    multimodal training pipeline runs before cross-modal training: decode →
    mean-pool to 32×32 → 2-D DCT-II → 64-bit sign hash of the 8×8
    low-frequency block against its median. Near-identical images (noise,
    re-encode, small crops) hash within a few bits of each other.

    The DCT basis matrix is built ONCE per actor (__init__ = the per-worker
    state slot); per image the transform is two 32×32 matmuls."""

    SIDE = 32
    LOW = 8

    def __init__(self):
        n = self.SIDE
        k = np.arange(n, dtype=np.float64)
        basis = np.sqrt(2.0 / n) * np.cos(
            np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
        basis[0] = np.sqrt(1.0 / n)
        self.basis = basis
        self._weights = (np.uint64(1) << np.arange(63, dtype=np.uint64))

    def _phash(self, img: np.ndarray) -> np.int64:
        n = self.SIDE
        a = np.asarray(img, dtype=np.float64)
        h, w = a.shape
        if h < n or w < n:                       # tiny images: edge-pad
            a = np.pad(a, ((0, max(n - h, 0)), (0, max(n - w, 0))),
                       mode="edge")
            h, w = a.shape
        bh, bw = h // n, w // n
        pool = (a[:bh * n, :bw * n]
                .reshape(n, bh, n, bw).mean(axis=(1, 3)))
        d = self.basis @ pool @ self.basis.T
        low = d[:self.LOW, :self.LOW].ravel()[1:]   # drop the DC term
        bits = (low > np.median(low))
        return np.uint64(np.dot(bits.astype(np.uint64),
                                self._weights)).view(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for buf, w, h, codec in zip(batch["image"].to_pylist(),
                                    batch["width"].to_pylist(),
                                    batch["height"].to_pylist(),
                                    batch["codec"].to_pylist()):
            img = decode_image(buf, w, h, codec or "raw-zlib")
            hashes.append(self._phash(img))
        return pa.table({
            "media_ref": batch["media_ref"],
            "phash": pa.array(np.array(hashes, np.int64), pa.int64()),
        })


PHASH_BANDS = 4           # 16-bit bands over the 64-bit hash
PHASH_MAX_HAMMING = 6


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.view(np.uint64), b.view(np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                         axis=1).sum(axis=1).astype(np.int64)


def image_phash_pairs(hashes, max_hamming: int = PHASH_MAX_HAMMING):
    """Near-duplicate image pairs from per-image pHashes — the same LSH
    banding shape as dedup_simhash: two images within ``max_hamming`` bits
    agree exactly on ≥ 1 of the 4 16-bit bands whenever their differing
    bits cluster (guaranteed when hamming ≤ 3 by pigeonhole; probabilistic
    above). One band-keyed self-join, vectorized XOR-popcount verify,
    driver dedup of the result-sized pair list.

    ``hashes``: Dataset[(media_ref, phash)] → DataFrame[(a, b, hamming)]."""
    import pandas as pd

    import ray  # noqa: F401  (Dataset ops only)
    from ..functions import scale

    def bands(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy(zero_copy_only=False)
        refs = t["media_ref"].to_pylist()
        n = len(ph)
        u = ph.view(np.uint64)
        out_key, out_ref, out_ph = [], [], []
        for bidx in range(PHASH_BANDS):
            val = ((u >> np.uint64(16 * bidx))
                   & np.uint64(0xFFFF)).astype(np.int64)
            out_key.append(np.int64(bidx * 65536) + val)
            out_ref.extend(refs)
            out_ph.append(ph)
        return pa.table({
            "bk": pa.array(np.concatenate(out_key) if n else
                           np.array([], np.int64)),
            "media_ref": pa.array(out_ref, pa.string()),
            "phash": pa.array(np.concatenate(out_ph) if n else
                              np.array([], np.int64))})

    rows = hashes.map_batches(bands, batch_format="pyarrow").materialize()
    empty = pd.DataFrame({"a": pd.Series([], dtype="object"),
                          "b": pd.Series([], dtype="object"),
                          "hamming": pd.Series([], dtype="int64")})
    if rows.count() == 0:
        return empty
    joined = rows.join(rows, join_type="inner",
                       num_partitions=scale.join_partitions(),
                       on=("bk",), right_suffix="_r")

    def verify(t: pa.Table) -> pa.Table:
        a = np.asarray(t["media_ref"].to_pylist(), dtype=object)
        b = np.asarray(t["media_ref_r"].to_pylist(), dtype=object)
        ph_a = t["phash"].to_numpy(zero_copy_only=False)
        ph_b = t["phash_r"].to_numpy(zero_copy_only=False)
        keep = a < b
        if not keep.any():
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "hamming": pa.array([], pa.int64())})
        ham = _hamming64(ph_a[keep], ph_b[keep])
        ok = ham <= max_hamming
        return (pa.table({"a": pa.array(a[keep][ok].tolist(), pa.string()),
                          "b": pa.array(b[keep][ok].tolist(), pa.string()),
                          "hamming": pa.array(ham[ok], pa.int64())})
                .group_by(["a", "b", "hamming"]).aggregate([]))

    df = (joined.map_batches(verify, batch_format="pyarrow")
          .to_pandas().drop_duplicates())
    if df.empty:
        return empty
    return df.sort_values(["a", "b"]).reset_index(drop=True)
