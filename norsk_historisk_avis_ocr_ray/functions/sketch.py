"""Mergeable sketches: KMV (k-minimum-values) approximate distinct count.

The pre-aggregation pattern for sketches (SURVEY §2.6 / ray guide): each
batch emits ONE serialized sketch row, a tiny groupby merges them — the
shuffle moves k hashes per batch instead of every value. Deterministic
(crc-seeded hashing), mergeable by construction, ±~1/sqrt(k) relative error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from . import scale
from .dedup import _hash64

K = 256
_MAX = np.float64(2**64)


def kmv_sketch(values) -> np.ndarray:
    """k smallest distinct 64-bit hashes of the values.

    Integer inputs hash through the vectorized splitmix64 mixer (no
    per-value Python); anything else falls back to blake2b of the string
    form. Both are deterministic across processes."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        hs = np.unique(_splitmix64(arr.astype(np.uint64)))
    else:
        hs = np.unique(np.fromiter((_hash64(str(v)) for v in values),
                                   dtype=np.uint64, count=len(values)))
    return hs[:K]


def kmv_merge(sketches: list[np.ndarray]) -> np.ndarray:
    if not sketches:  # zero batches (empty corpus/partition)
        return np.array([], dtype=np.uint64)
    return np.unique(np.concatenate(sketches))[:K]


def kmv_estimate(sketch: np.ndarray) -> float:
    if sketch.size < K:
        return float(sketch.size)  # exact below k distincts
    kth = np.float64(sketch[K - 1])
    return (K - 1) * _MAX / kth


def approx_distinct(ds: Dataset, column: str) -> float:
    def partial(t: pa.Table) -> pa.Table:
        sk = kmv_sketch(t[column].to_pylist())
        return pa.table({"sketch": pa.array([sk.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    sketches = [np.frombuffer(b["sketch"][0].as_py(), dtype=np.uint64)
                for b in parts.iter_batches(batch_format="pyarrow", batch_size=1)]
    return kmv_estimate(kmv_merge(sketches))


def approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct user_id count over events.

    "Approximate" yet EXACTLY oracled: the KMV hash is splitmix64 (a pure
    function of user_id), so the estimate is deterministic under any
    partitioning and the DuckDB oracle replays the k-minimum-values
    estimator with a bit-identical SQL mixer (``__ray_entry__._sm64_proj``).
    The pytest additionally asserts the estimate is within 10% of exact."""
    from .rounding import round_half_away

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", override_num_blocks=scale.read_blocks_for_path(f"{sf_dir}/events.parquet"), columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    return pd.DataFrame({"approx_users": [float(round_half_away(est, 2))]})


# --- HyperLogLog distinct sketch -----------------------------------------------

HLL_P = 8                     # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_WBITS = 64 - HLL_P        # 56-bit rank word per hash


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length of uint64 values (0 → 0). frexp's exponent IS
    the bit length for exactly-representable ints; values above 2^53 can
    round UP across a power of two, so the exponent is re-checked against
    the integer and decremented where the rounding overshot."""
    e = np.frexp(w.astype(np.float64))[1].astype(np.int64)
    pos = e > 0
    over = np.zeros_like(e)
    over[pos] = ((np.uint64(1) << (e[pos] - 1).astype(np.uint64))
                 > w[pos]).astype(np.int64)
    bl = e - over
    bl[w == 0] = 0
    return bl


def hll_registers(keys: np.ndarray) -> np.ndarray:
    """(256,) int64 register maxima for a batch of integer keys: bucket =
    top 8 hash bits, rho = leading zeros of the 56-bit remainder + 1."""
    h = _splitmix64(np.asarray(keys).astype(np.uint64))
    bucket = (h >> np.uint64(HLL_WBITS)).astype(np.int64)
    w = h & np.uint64((1 << HLL_WBITS) - 1)
    rho = HLL_WBITS + 1 - _bit_length_u64(w)
    regs = np.zeros(HLL_M, np.int64)
    np.maximum.at(regs, bucket, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Flajolet et al. 2007 estimator with the small-range correction.

    EXACT under any partitioning AND SQL-replayable: the harmonic sum runs
    in arbitrary-precision INTEGERS (Σ 2^(57−M_j) — each term a power of
    two, so no float summation order exists), and the one float expression
    mirrors the DuckDB oracle operation-for-operation (``ln`` is
    glibc-libm, identical to ``math.log``)."""
    import math

    s = sum(1 << (HLL_WBITS + 1 - int(r)) for r in regs)   # Python int
    v = int((regs == 0).sum())
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = alpha * 65536.0 * 144115188075855872.0 / float(s)
    if raw <= 640.0 and v > 0:                              # 2.5 * m
        return 256.0 * math.log(256.0 / v)
    return raw


def approx_distinct_hll(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog approximate distinct user_id count over events — the
    fixed-memory counterpart of the KMV sketch (256 registers = 256 bytes
    per partial, vs KMV's 2 KiB of minima). Per-batch partial registers
    merge by elementwise max (one 256-int row per batch, no shuffle).
    "Approximate" yet EXACTLY oracled — see ``hll_estimate``."""
    from .rounding import round_half_away

    path = f"{sf_dir}/events.parquet"
    ds = ray.data.read_parquet(
        path, columns=["user_id"],
        override_num_blocks=scale.read_blocks_for_path(path))

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_registers(t["user_id"].to_numpy(zero_copy_only=False))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    merged = np.zeros(HLL_M, np.int64)
    for b in (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
                .iter_batches(batch_format="pyarrow", batch_size=1)):
        merged = np.maximum(
            merged, np.frombuffer(b["regs"][0].as_py(), dtype=np.int64))
    est = hll_estimate(merged)
    return pd.DataFrame(
        {"approx_users_hll": [float(round_half_away(est, 2))]})


# --- Count-Min Sketch heavy hitters -------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 2048          # power of two: index = top bits of the row hash
CMS_CAND_PER_BATCH = 64   # default: carry each batch's top-k candidates
                          # (bounded driver state; see approx_top_users)
HH_K = 10

_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)
_CMS_A = np.uint64(0x9E3779B97F4A7C15) * np.arange(1, CMS_DEPTH + 1,
                                                   dtype=np.uint64)
_CMS_B = np.uint64(0xD1B54A32D192ED03) * np.arange(1, CMS_DEPTH + 1,
                                                   dtype=np.uint64)
_CMS_SHIFT = np.uint64(64 - int(np.log2(CMS_WIDTH)))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 wraparound): full-entropy
    64-bit mix of integer keys, deterministic across processes."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * _SM_C1
    z = (z ^ (z >> np.uint64(27))) * _SM_C2
    return z ^ (z >> np.uint64(31))


def _cms_indices(keys: np.ndarray) -> np.ndarray:
    """(depth, n) CMS column indices for integer keys."""
    h = _splitmix64(keys)
    return ((_CMS_A[:, None] * h[None, :] + _CMS_B[:, None])
            >> _CMS_SHIFT).astype(np.int64)


def cms_count(keys: np.ndarray) -> np.ndarray:
    """(depth, width) count matrix for one batch of integer keys."""
    idx = _cms_indices(keys)
    return np.stack([np.bincount(idx[d], minlength=CMS_WIDTH)
                     for d in range(CMS_DEPTH)]).astype(np.int64)


def cms_estimate(cms: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point estimates (min over rows) for integer keys — never
    underestimates the true count."""
    idx = _cms_indices(keys)
    return np.min(cms[np.arange(CMS_DEPTH)[:, None], idx], axis=0)


def approx_top_users(
        sf_dir: str,
        cand_per_batch: int | None = CMS_CAND_PER_BATCH) -> pd.DataFrame:
    """Approximate top-10 users by event count via a Count-Min Sketch.

    The same mergeable-sketch dataflow as KMV: each batch emits ONE row —
    its (depth × width) count matrix plus its candidate keys — so the data
    crossing the wire per batch is bounded regardless of batch size. The
    driver sums the matrices (CMS merge = elementwise add), estimates each
    candidate's count as the row-minimum, and keeps the top 10.

    By DEFAULT each batch carries only its exact top-``CMS_CAND_PER_BATCH``
    keys as candidates — the classic bounded heavy-hitter sketch, safe at
    10⁹ distinct keys (driver state is k × n_batches, never the key
    universe). Passing ``cand_per_batch=None`` switches to all-distinct
    candidates, which makes the output a pure function of the input
    (candidate union = all distinct users — batch boundaries cannot change
    it) and therefore EXACTLY SQL-oracled: the oracle replays splitmix64 +
    the CMS row hashing + the min-over-depths estimate in DuckDB. The
    driver-gate entry opts into that mode explicitly; at true heavy-hitter
    scale keep the bounded default (then rows-only)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", override_num_blocks=scale.read_blocks_for_path(f"{sf_dir}/events.parquet"), columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        keys = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cms = cms_count(keys)
        uniq, counts = np.unique(keys, return_counts=True)
        if cand_per_batch is not None:
            top = np.argsort(-counts, kind="stable")[:cand_per_batch]
            uniq = uniq[top]
        return pa.table({
            "cms": pa.array([cms.tobytes()], pa.binary()),
            "candidates": pa.array([uniq.tobytes()], pa.binary()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    total = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    cand: set[int] = set()
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=64):
        for raw_cms, raw_cand in zip(b["cms"].to_pylist(),
                                     b["candidates"].to_pylist()):
            total += np.frombuffer(raw_cms, dtype=np.int64).reshape(
                CMS_DEPTH, CMS_WIDTH)
            cand.update(np.frombuffer(raw_cand, dtype=np.int64).tolist())
    if not cand:
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "est_events": pd.Series([], dtype=np.int64)})
    keys = np.array(sorted(cand), dtype=np.int64)
    est = cms_estimate(total, keys)
    order = np.lexsort((keys, -est))[:HH_K]
    return pd.DataFrame({"user_id": keys[order],
                         "est_events": est[order]})


# --- bottom-k-sample quantile sketch -------------------------------------------

QSK_K = 512                     # sample size per group (error ~ 1/sqrt(k))
QSK_PCTS = (0.5, 0.9, 0.99)


def _bottomk_rows(t: pa.Table, k: int) -> pd.DataFrame:
    """Per-(event_type) bottom-k rows by splitmix64(event_id) — a
    DETERMINISTIC uniform sample (the hash is the random tag, so the same
    rows are chosen under any partitioning; mergeable by keep-k-smallest)."""
    df = pd.DataFrame({
        "event_type": t["event_type"].to_numpy(zero_copy_only=False),
        "h": _splitmix64(t["event_id"].to_numpy(
            zero_copy_only=False).astype(np.uint64)).view(np.int64),
        "value": t["value"].to_numpy(),
    })
    return (df.sort_values("h", kind="mergesort")
            .groupby("event_type", as_index=False, sort=False)
            .head(k))


def approx_group_quantiles(sf_dir: str,
                           k: int = QSK_K) -> pd.DataFrame:
    """Approximate per-event-type value quantiles (p50/p90/p99) from a
    mergeable bottom-k hash sample.

    Same sketch shape as KMV: each batch emits ≤ k (event_type, hash, value)
    rows, one ``groupby(event_type)`` merges by keeping the k smallest
    hashes, and the quantiles are read off the surviving sample — the
    shuffle moves k rows per (type, batch), never the corpus. Deterministic
    under any partitioning (the sample membership is a pure function of
    event_id) — so despite being an approximation of the true quantiles
    (rank error ~1/sqrt(k), asserted in pytest), the OUTPUT is exactly
    SQL-oracled: the DuckDB oracle replays the splitmix64 sample selection
    and numpy's 'linear' lerp branch bit-for-bit."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", override_num_blocks=scale.read_blocks_for_path(f"{sf_dir}/events.parquet"),
                               columns=["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_bottomk_rows(t, k),
                                    preserve_index=False)

    def merge_quantiles(g: pd.DataFrame) -> pd.DataFrame:
        from .rounding import round_half_away

        g = g.sort_values("h", kind="mergesort").head(k)
        vals = np.sort(g["value"].to_numpy())
        # round-to-6 so the oracle comparison doesn't hinge on numpy's
        # private _lerp branch staying last-ulp-identical to DuckDB forever
        qs = {f"p{int(p * 100)}": float(round_half_away(
                  np.quantile(vals, p), 6))
              for p in QSK_PCTS}
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "n_sample": np.array([len(vals)], np.int64),
                             **{c: [v] for c, v in qs.items()}})

    df = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
          .groupby("event_type")
          .map_groups(merge_quantiles, batch_format="pandas")
          .to_pandas())  # one row per event type — result-sized pull
    if df.empty:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype="object"),
            "n_sample": pd.Series([], dtype="int64"),
            **{f"p{int(p * 100)}": pd.Series([], dtype="float64")
               for p in QSK_PCTS}})
    return df.sort_values("event_type").reset_index(drop=True)
