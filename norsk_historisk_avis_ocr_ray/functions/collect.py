"""Small-result collection helpers shared by the query operators.

``pa.concat_tables`` raises on zero tables and a ``groupby().aggregate()``
over an empty dataset yields a column-less frame — both bite exactly when a
partition (or a whole test corpus) is empty, which at 10^12-doc scale is a
routine condition, not an error. These helpers give every operator
schema-stable empty semantics.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def collect_table(ds: Dataset, fallback: pa.Schema | None = None) -> pa.Table:
    """Materialize a SMALL dataset (dimension table, filtered side) to one
    Arrow table, preserving the schema even when it has zero rows.

    ``fallback`` covers datasets whose schema Ray cannot know when empty
    (a ``map_batches`` whose fn never ran); pass the pa.Schema the transform
    would have produced."""
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches)
    sch = ds.schema() or fallback
    if sch is None:
        return pa.table({})
    return pa.table({n: pa.array([], type=t)
                     for n, t in zip(sch.names, sch.types)})


def ensure_schema(ds: Dataset, schema: pa.Schema) -> Dataset:
    """Give a lazy Dataset schema-stable empty semantics WITHOUT executing
    it: prepend a typed zero-row seed via ``union``. When the input was
    empty the transform never ran and the pipeline alone would report a
    None/zero-field schema — the seed supplies the operator's column set.

    The seed must be a union (pure plan metadata), NOT a ``ds.schema()``
    check: ``schema()`` on a shuffle-rooted pipeline cannot stream a prefix
    — it runs the whole sort/aggregate once, and the real consumer then
    re-executes it, silently DOUBLING every streaming query (measured:
    q_activity_fulljoin 4.0 s → 2.0 s solo at sf0.1 after this change).
    The declared ``schema`` must match the pipeline's real output schema
    exactly (names, order, types) — the oracle gate enforces this."""
    import ray

    return ray.data.from_arrow(schema.empty_table()).union(ds)


def typed_empty(**cols) -> pd.DataFrame:
    """Schema-stable empty DataFrame: ``typed_empty(a="int64", b="float64",
    c="object")``."""
    return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
