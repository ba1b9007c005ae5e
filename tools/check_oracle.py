"""Local mirror of the driver's correctness gate: run every queries() entry
at sf0.01 next to its oracle_sql() DuckDB equivalent and compare row count,
schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

import ray

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(result, Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # NO float rounding here: the driver's gate hashes exact values, so the
    # local mirror must too (a .round(6) here masked the round-half-even
    # divergences that failed the round-1 driver gate).
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def dtype_kind(dtype) -> str:
    """Coarse dtype class used for the driver-faithful type check.

    The driver's value hash is typed: an int64 column on one side and a
    float64 column on the other hash differently even when every value is
    byte-equal (this is exactly how q_sessionize stayed red for two rounds
    while the old check_dtype=False mirror reported green — DuckDB
    sum(INTEGER) -> HUGEINT -> pandas float64 vs Ray int64). Width
    differences within a class (int32 vs int64) are fine; class differences
    (int vs float) are a FAIL.
    """
    if np.issubdtype(dtype, np.integer):
        return "int"
    if np.issubdtype(dtype, np.floating):
        return "float"
    if np.issubdtype(dtype, np.bool_):
        return "bool"
    if np.issubdtype(dtype, np.datetime64):
        return "datetime"
    return "object"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    if not ray.is_initialized():
        # NHAO_GATE_CPUS perturbs every cluster-derived width (read blocks,
        # pair blocks, join partitions, batch boundaries): running the full
        # sweep at a second CPU count is the partitioning-invariance fuzz —
        # every oracle hash must be identical under both shapes.
        import os
        ray.init(address="local",
                 num_cpus=int(os.environ.get("NHAO_GATE_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok    {name}: rows-only ({len(got)} rows, "
                  f"cols={list(got.columns)})")
            continue
        exp = canon(con.sql(sql).df())
        if list(got.columns) != list(exp.columns):
            print(f"FAIL  {name}: schema {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL  {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        kind_mismatch = [
            (c, dtype_kind(got[c].dtype), dtype_kind(exp[c].dtype))
            for c in got.columns
            if dtype_kind(got[c].dtype) != dtype_kind(exp[c].dtype)
        ]
        if kind_mismatch:
            print(f"FAIL  {name}: dtype-class mismatch (driver's typed hash "
                  f"would fail even if values match): {kind_mismatch}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            print(f"ok    {name}: {len(got)} rows match oracle")
        except AssertionError as e:
            print(f"FAIL  {name}: values differ\n{str(e)[:500]}")
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
