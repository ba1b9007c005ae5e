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
    """Give a lazy Dataset schema-stable empty semantics: when the input was
    empty the transform never ran and Ray reports ``schema() is None`` — the
    driver contract still needs the operator's column set, so substitute a
    typed zero-row dataset. Costs one first-block schema fetch; a no-op on
    nonempty data."""
    import ray

    sch = ds.schema()
    if sch is not None and len(sch.names) > 0:
        return ds
    # None OR a zero-field schema (an empty-input map chain can report
    # either) → substitute the typed zero-row dataset.
    return ray.data.from_arrow(schema.empty_table())


def typed_empty(**cols) -> pd.DataFrame:
    """Schema-stable empty DataFrame: ``typed_empty(a="int64", b="float64",
    c="object")``."""
    return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in cols.items()})
