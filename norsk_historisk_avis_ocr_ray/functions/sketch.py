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

from .dedup import _hash64

K = 256
_MAX = np.float64(2**64)


def kmv_sketch(values) -> np.ndarray:
    """k smallest distinct 64-bit hashes of the values (padded with 2^64-1)."""
    hs = np.unique(np.fromiter((_hash64(str(v)) for v in values),
                               dtype=np.uint64, count=len(values)))
    return hs[:K]


def kmv_merge(sketches: list[np.ndarray]) -> np.ndarray:
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
    """Approximate distinct user_id count over events (rows-only check; the
    pytest asserts the estimate is within 10% of exact)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    return pd.DataFrame({"approx_users": [round(est, 2)]})
