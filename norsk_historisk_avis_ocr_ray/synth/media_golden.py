"""Golden expected outputs for the six binary-media pipelines — the
``ocr_extract`` oracle pattern (VERDICT r04 item 4) extended to media:
a single-process numpy replay computes what each distributed pipeline
MUST produce, the result is dumped to parquet, and the DuckDB oracle
reads that dump — turning the rows-only media checks into exact
driver-hash gates.

Independence ladder (strongest first):

- ``video_shot_golden`` / ``video_sample_golden`` are GENERATOR ground
  truth proper: frame counts, scene counts and planted cut positions come
  from the synthesis parameters alone (the formulas in
  ``__ray_entry__._video_shot_detect``/``_video_frame_sample``'s synth),
  never from running a detector. The oracle therefore asserts the
  pipeline RECOVERS the planted structure.
- the audio goldens replay the planted tone+noise signal from its
  generation formula (seeded splitmix64 counters — no WAV container
  involved) and compute framing/RMS/spectral features in independently
  written single-process numpy; the oracle asserts the WAV encode→decode
  round trip, the clip-whole batch invariant, the actor plumbing and the
  DSP arithmetic jointly reproduce it bit-for-bit.
- the image goldens decode the corpus pages from their lossless raw-zlib
  payloads and recompute features / pHash pairs in single-process numpy
  (banding candidate rule included — the engine's pair list is
  banded-LSH-approximate BY CONTRACT, so the golden replicates that
  contract, not brute-force all-pairs).

Everything here is pure numpy/pandas/pyarrow — NO Ray; safe to call from
``oracle_sql()`` before any session exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MASK = 0xFFFFFFFFFFFFFFFF
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _fmix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — independent copy of the generation hash
    (kept in sync with functions/dedup._fmix64 by the cross-check test)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _seed(doc_id: int, salt: int) -> int:
    return int(_fmix(np.array([(doc_id + salt) & _MASK], np.uint64))[0])


# --- video: pure generation-parameter ground truth ---------------------------

def video_shot_golden(doc_ids: list[int]) -> pa.Table:
    """Expected (doc_id, media_ref, n_frames, n_shots, boundaries) for
    ``_video_shot_detect``'s synth corpus: every value from the synthesis
    parameters (salt 8765) — the detector must recover the planted cuts."""
    refs, nfs, nss, bss = [], [], [], []
    for d in doc_ids:
        seed = _seed(int(d), 8765)
        nf = 24 + seed % 25
        n_scenes = 2 + seed % 3
        cuts = [(s * nf) // n_scenes for s in range(1, n_scenes)]
        refs.append(f"video://{d}")
        nfs.append(nf)
        nss.append(n_scenes)
        bss.append(",".join(str(c) for c in cuts))
    return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                     "media_ref": pa.array(refs, pa.string()),
                     "n_frames": pa.array(nfs, pa.int64()),
                     "n_shots": pa.array(nss, pa.int64()),
                     "boundaries": pa.array(bss, pa.string())})


def video_sample_golden(doc_ids: list[int], every_k: int = 10) -> pa.Table:
    """Expected (doc_id, media_ref, n_sampled) for ``_video_frame_sample``
    (salt 4321): n_sampled = ceil(n_frames / every_k)."""
    refs, ns = [], []
    for d in doc_ids:
        seed = _seed(int(d), 4321)
        nf = 20 + seed % 31
        refs.append(f"video://{d}")
        ns.append(-(-nf // every_k))
    return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                     "media_ref": pa.array(refs, pa.string()),
                     "n_sampled": pa.array(ns, pa.int64())})


# --- audio: signal replay from the generation formula ------------------------

def _audio_pcm(doc_id: int) -> np.ndarray:
    """The planted int16 signal of ``_synth_audio`` (salt 1234), replayed
    from its generation formula — no WAV container involved."""
    seed = _seed(doc_id, 1234)
    n = 8000 + seed % 8000
    freq = 200.0 + (doc_id % 40) * 10.0
    ctr = np.arange(n, dtype=np.uint64)
    u = _fmix((ctr * _GOLD) ^ np.uint64(seed))
    x = 0.6 * np.sin((2 * np.pi * freq / 16000.0)
                     * np.arange(n, dtype=np.float64))
    x += (u.astype(np.float64) / 2.0 ** 64 - 0.5) * 0.3464
    return np.clip(x * 32767, -32768, 32767).astype(np.int16)


def _frames(pcm: np.ndarray, frame_samples: int = 1024,
            hop: int = 4096) -> np.ndarray:
    starts = range(0, max(len(pcm) - frame_samples + 1, 0), hop)
    return np.stack([pcm[s:s + frame_samples] for s in starts]) \
        if len(list(starts)) else np.empty((0, frame_samples), np.int16)


def audio_energy_golden(doc_ids: list[int]) -> pa.Table:
    """Expected (doc_id, media_ref, n_frames, mean_rms)."""
    out_id, refs, nfs, means = [], [], [], []
    for d in doc_ids:
        fr = _frames(_audio_pcm(int(d))).astype(np.float64)
        rms = np.sqrt((fr ** 2).mean(axis=1))
        # same aggregate op class as the pipeline (pandas groupby mean)
        m = pd.Series(rms).groupby(np.zeros(len(rms), np.int64)).mean()
        out_id.append(int(d))
        refs.append(f"audio://{d}")
        nfs.append(len(rms))
        means.append(float(m.iloc[0]))
    return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                     "media_ref": pa.array(refs, pa.string()),
                     "n_frames": pa.array(nfs, pa.int64()),
                     "mean_rms": pa.array(means, pa.float64())})


def audio_spectrogram_golden(doc_ids: list[int],
                             sample_rate: int = 16000) -> pa.Table:
    """Expected (doc_id, media_ref, n_frames, dominant_bin, dominant_hz,
    mean_centroid_hz, mean_power): per-frame rfft power features followed
    by the per-clip majority-dominant-bin aggregate (ties → smallest)."""
    out = {k: [] for k in ("doc_id", "media_ref", "n_frames",
                           "dominant_bin", "dominant_hz",
                           "mean_centroid_hz", "mean_power")}
    for d in doc_ids:
        fr = _frames(_audio_pcm(int(d))).astype(np.float64)
        spec = np.abs(np.fft.rfft(fr, axis=1)) ** 2
        spec[:, 0] = 0.0
        dom = spec.argmax(axis=1).astype(np.int64)
        freqs = np.fft.rfftfreq(fr.shape[1], d=1.0 / sample_rate)
        tot = spec.sum(axis=1)
        cent = (spec * freqs[None, :]).sum(axis=1) / np.maximum(tot, 1e-30)
        bins, cnts = np.unique(dom, return_counts=True)
        mode_bin = int(bins[np.argmax(cnts)])  # np.unique sorts ascending,
        # argmax takes the FIRST max → smallest bin on ties (the pipeline's
        # count-sort-dedup tiebreak)
        g = pd.DataFrame({"c": cent, "p": tot}).groupby(
            np.zeros(len(cent), np.int64)).mean()
        out["doc_id"].append(int(d))
        out["media_ref"].append(f"audio://{d}")
        out["n_frames"].append(len(dom))
        out["dominant_bin"].append(mode_bin)
        out["dominant_hz"].append(float(freqs[mode_bin]))
        out["mean_centroid_hz"].append(float(g["c"].iloc[0]))
        out["mean_power"].append(float(g["p"].iloc[0]))
    return pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "media_ref": pa.array(out["media_ref"], pa.string()),
        "n_frames": pa.array(out["n_frames"], pa.int64()),
        "dominant_bin": pa.array(out["dominant_bin"], pa.int64()),
        "dominant_hz": pa.array(out["dominant_hz"], pa.float64()),
        "mean_centroid_hz": pa.array(out["mean_centroid_hz"], pa.float64()),
        "mean_power": pa.array(out["mean_power"], pa.float64())})


# --- images: lossless-payload replay -----------------------------------------

def _page_images(n_docs: int):
    """(media_ref, uint8 image) for the synthetic page corpus — decoded
    from the lossless raw-zlib payloads the queries themselves consume."""
    import zlib

    from .corpus import make_corpus

    pages = make_corpus(n_docs, seed=42)["pages"]
    for ref, buf, w, h in zip(pages["media_ref"].to_pylist(),
                              pages["image"].to_pylist(),
                              pages["width"].to_pylist(),
                              pages["height"].to_pylist()):
        img = np.frombuffer(zlib.decompress(buf), np.uint8).reshape(h, w)
        yield ref, img


def image_features_golden(n_docs: int) -> pa.Table:
    """Expected (media_ref, n_features, ink_ratio) of ``_image_features``:
    the 4×4-subsample stats/histogram vector, independently recomputed;
    ink_ratio rounded exactly as the query does (pyarrow round)."""
    import pyarrow.compute as pc

    refs, inks = [], []
    for ref, img in _page_images(n_docs):
        sub = img[::4, ::4]
        ink = np.float32((sub < 200).mean())
        refs.append(ref)
        inks.append(ink)
    rounded = pc.round(pa.array(inks, pa.float32()).cast(pa.float64()),
                       ndigits=6)
    n = len(refs)
    return pa.table({
        "media_ref": pa.array(refs, pa.string()),
        "n_features": pa.array([3 + 16] * n, pa.int32()),
        "ink_ratio": rounded})


def _phash(img: np.ndarray) -> np.uint64:
    """Independent pHash replay: 32×32 mean-pool → DCT-II (explicit basis)
    → sign bits of the 63 low-frequency coefficients vs their median."""
    n, low = 32, 8
    a = img.astype(np.float64)
    h, w = a.shape
    if h < n or w < n:
        a = np.pad(a, ((0, max(n - h, 0)), (0, max(n - w, 0))), mode="edge")
        h, w = a.shape
    bh, bw = h // n, w // n
    pool = a[:bh * n, :bw * n].reshape(n, bh, n, bw).mean(axis=(1, 3))
    k = np.arange(n, dtype=np.float64)
    basis = np.sqrt(2.0 / n) * np.cos(
        np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    basis[0] = np.sqrt(1.0 / n)
    d = basis @ pool @ basis.T
    lowv = d[:low, :low].ravel()[1:]
    bits = (lowv > np.median(lowv)).astype(np.uint64)
    return np.uint64(np.dot(bits, np.uint64(1) << np.arange(63,
                                                            dtype=np.uint64)))


def pca_project_golden(emb_path: str, n_components: int = 8) -> pa.Table:
    """Expected (vec_id, component, proj) of the ``emb_pca_project``
    query: the full integer-grid PCA chain replayed single-process from
    the embeddings parquet — 1e-6 coordinate quantization, exact-integer
    moment fold (associative, so one-process order is the distributed
    fold's value), scatter → covariance → ``eigh``, deterministic sign
    fix, 1e-9-grid eigenvectors, 1e-6-grid mean, one exact int64 matmul
    and ONE float division per row. Every step is a pure function of the
    table, so the distributed pipeline must reproduce it bit-for-bit."""
    import pyarrow.parquet as pq

    from ..functions.rounding import round_half_away

    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    x = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    n, dim = x.shape
    if n < 2:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64()),
                         "proj": pa.array([], pa.float64())})
    q1 = round_half_away(1e6 * x, 0).astype(np.int64)
    s = [int(v) for v in q1.sum(axis=0)]
    ss = (q1.T @ q1)
    scatter = np.array(
        [[n * int(ss[i, j]) - s[i] * s[j] for j in range(dim)]
         for i in range(dim)], dtype=np.float64)
    cov = scatter / (float(n * n) * 1e12)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")
    k = min(n_components, dim)
    v = evecs[:, order[:k]]
    for j in range(k):
        if v[np.argmax(np.abs(v[:, j])), j] < 0:
            v[:, j] = -v[:, j]
    vq = round_half_away(v * 1e9, 0).astype(np.int64)
    mq = round_half_away(np.array(s, np.float64) / n, 0).astype(np.int64)
    grid = (q1 - mq[None, :]) @ vq
    proj = grid.astype(np.float64) / (1e6 * 1e9)
    return pa.table({
        "vec_id": pa.array(np.repeat(ids, k), pa.int64()),
        "component": pa.array(np.tile(np.arange(k, dtype=np.int64), n)),
        "proj": pa.array(proj.reshape(-1), pa.float64())})


def image_phash_golden(n_docs: int, max_hamming: int = 6,
                       bands: int = 4) -> pa.Table:
    """Expected (a, b, hamming) of ``_image_phash_dedup``: pHash per page,
    then the BANDED candidate rule (pairs agreeing on ≥1 16-bit band) with
    XOR-popcount verification ≤ max_hamming — the engine's documented
    approximate contract, replayed all-pairs single-process."""
    refs, hashes = [], []
    for ref, img in _page_images(n_docs):
        refs.append(ref)
        hashes.append(_phash(img))
    hs = np.array(hashes, np.uint64)
    n = len(hs)
    out_a, out_b, out_h = [], [], []
    for i in range(n):
        for j in range(i + 1, n):
            x = int(hs[i] ^ hs[j])
            ham = bin(x).count("1")
            if ham > max_hamming:
                continue
            share = any(((hs[i] >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                        == ((hs[j] >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                        for b in range(bands))
            if not share:
                continue
            a, b = (refs[i], refs[j]) if refs[i] < refs[j] \
                else (refs[j], refs[i])
            out_a.append(a)
            out_b.append(b)
            out_h.append(ham)
    return pa.table({"a": pa.array(out_a, pa.string()),
                     "b": pa.array(out_b, pa.string()),
                     "hamming": pa.array(out_h, pa.int64())})
