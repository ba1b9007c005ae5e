"""Every query must be schema-stable on an EMPTY corpus.

At 10^12-doc scale an empty partition/shard (a filter that matched nothing,
a day with no crawl, a resume run where everything is done) is a routine
condition, not an error. Each operator must return a zero-row result with
its normal column set — not KeyError on a column-less aggregate, not
``pa.concat_tables([])``, not a crashed empty-side hash join.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ray.data import Dataset

SF_SRC = "/root/testdata/sf0.001"

# queries over the synthetic page corpus (not the parquet tables) are out of
# scope here — their resume path is covered by test_resume.py
SKIP = {"extract_docs", "ocr_extract", "image_features", "image_phash_dedup"}


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_empty")
    for f in sorted(glob.glob(f"{SF_SRC}/*.parquet")):
        schema = pq.read_schema(f)
        pq.write_table(schema.empty_table(), str(dst / os.path.basename(f)))
    return str(dst)


def test_all_queries_empty_safe(empty_sf):
    import __ray_entry__ as entry

    failures = []
    for name, fn in entry.queries().items():
        if name in SKIP:
            continue
        try:
            r = fn(empty_sf)
        except Exception as ex:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
            continue
        if isinstance(r, Dataset):
            n, cols = r.count(), (r.schema().names if r.schema() else [])
        elif isinstance(r, (pd.DataFrame,)):
            n, cols = len(r), list(r.columns)
        elif isinstance(r, pa.Table):
            n, cols = len(r), r.column_names
        else:
            failures.append(f"{name}: unexpected result type {type(r)}")
            continue
        # approx sketches may emit their single summary row; everything else
        # must be zero rows WITH its normal columns intact
        if n > 1:
            failures.append(f"{name}: {n} rows from an empty corpus")
        if not cols:
            failures.append(f"{name}: lost its columns on empty input")
    assert not failures, "\n".join(failures)
