"""Bucketed high-cardinality group combines.

Ray's sort-based ``groupby().aggregate()`` pays ~0.4 ms of per-group Python
per distinct key (measured on this engine: 3.6k windows → 1.35 s, 21.6k →
8.7 s, 1.17M → 35-95 s), so any combine over more than ~1k keys is
dominated by group iteration, not data. The fix is the same partitioning
contract the windowed operators use (sessionize, user-gaps, as-of): shuffle
on a BOUNDED hash bucket of the key — many keys per Ray group invocation —
and run ONE vectorized pandas combine per bucket. Exactness is unchanged:
``bucket = splitmix64(key)`` is a pure function of the key, so every key's
rows land whole in a single bucket.

Use for *final combines of pre-aggregated partials* (rows per key already
small); for raw corpus-sized groups with per-key windows, write the bucket
explicitly and sort inside the group (see relational._user_bucketizer).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .dedup import _fmix64
from .scale import pow2_buckets


def bucketed_combine(ds: Dataset, key_col: str,
                     combine: Callable[[pd.DataFrame], pd.DataFrame],
                     n_buckets: int | None = None) -> Dataset:
    """``ds.groupby(<high-cardinality key>)``-equivalent combine.

    ``key_col`` must be an integer column (hash string keys to int64 in the
    partial stage first). ``combine`` receives one bucket's rows (bucket
    column already dropped, MANY keys per call) and must itself group by
    ``key_col`` vectorized — a pandas ``groupby().agg`` — and may emit any
    schema. ``n_buckets`` must be a power of two; the default derives from
    the cluster CPU count at call time (``scale.pow2_buckets``, floor 64)
    so the combine shuffle widens with the cluster instead of capping at a
    single-VM constant. Derived ONCE here on the driver and captured by
    the closure — every batch of this combine agrees on the bucket map.
    """
    if n_buckets is None:
        n_buckets = pow2_buckets()
    mask = np.uint64(n_buckets - 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64,
                                                             copy=False)
        b = (_fmix64(k.view(np.uint64)) & mask).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return combine(g.drop(columns=["bucket"]))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("bucket").map_groups(run, batch_format="pandas"))
