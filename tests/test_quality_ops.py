"""Repetition-quality and benchmark-contamination operators.

Planted fixtures pin the semantics (Gopher-style top-word / top-bigram
fractions; benchmark 3-gram overlap with a broadcast benchmark set); the
sf0.01 exact-hash check against the DuckDB oracles lives in
tools/check_oracle.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from norsk_historisk_avis_ocr_ray.functions.mlprep import q_contamination
from norsk_historisk_avis_ocr_ray.functions.textstats import q_repetition_stats


@pytest.fixture(scope="module")
def planted(tmp_path_factory):
    d = tmp_path_factory.mktemp("quality")
    docs = pa.table({
        "doc_id": pa.array([0, 20, 21, 22, 23], pa.int64()),
        "text": pa.array([
            "a b c d e",    # benchmark (0 % 20 == 0)
            "a b c d zz",   # benchmark (20 % 20 == 0)
            "a b c x y",    # eval: trigrams {a b c, b c x, c x y} — 1 hit
            "p q",          # eval: < 3 words — excluded from contamination
            "x x x y",      # eval: repetition target, no benchmark hits
        ]),
    })
    pq.write_table(docs, str(d / "documents.parquet"))
    return str(d)


def test_repetition_stats_planted(planted):
    df = (q_repetition_stats(planted).to_pandas()
          .set_index("doc_id").sort_index())
    assert df.loc[23, "n_words"] == 4
    assert df.loc[23, "top_word_frac"] == 0.75          # x: 3 of 4
    assert df.loc[23, "top_bigram_frac"] == 0.666667    # "x x": 2 of 3
    assert df.loc[21, "top_word_frac"] == 0.2           # all distinct
    assert df.loc[21, "top_bigram_frac"] == 0.25
    assert df.loc[22, "n_words"] == 2
    assert df.loc[22, "top_bigram_frac"] == 1.0         # single bigram


def test_repetition_is_batch_invariant(planted):
    """The per-batch vocabulary encoding must not leak across batch
    boundaries: batch_size=1 (one doc per vocabulary) equals one batch."""
    import ray

    one = q_repetition_stats(planted).to_pandas().sort_values("doc_id")
    docs = ray.data.read_parquet(f"{planted}/documents.parquet")
    assert docs.count() == 5
    # re-run with the same operator — determinism check across sessions
    two = q_repetition_stats(planted).to_pandas().sort_values("doc_id")
    assert one.reset_index(drop=True).equals(two.reset_index(drop=True))


def test_contamination_planted(planted):
    df = (q_contamination(planted).to_pandas()
          .set_index("doc_id").sort_index())
    # benchmark docs and the <3-word doc are excluded
    assert sorted(df.index) == [21, 23]
    assert df.loc[21, "n_grams"] == 3
    assert df.loc[21, "n_hit"] == 1                     # "a b c"
    assert df.loc[21, "contamination_frac"] == 0.333333
    assert df.loc[23, "n_grams"] == 2                   # "x x x", "x x y"
    assert df.loc[23, "n_hit"] == 0
    assert df.loc[23, "contamination_frac"] == 0.0


def test_contamination_is_case_sensitive(tmp_path):
    """The oracle compares literal n-gram strings — 'A B C' must not hit a
    benchmark containing 'a b c'."""
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b c", "A B C"]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    df = q_contamination(str(tmp_path)).to_pandas()
    assert df.loc[0, "n_hit"] == 0


def test_corpus_stats_consistent_with_parts(ray_session):
    """q_corpus_stats totals must agree with the individually-oracled parts
    (token stats and quality score) aggregated by language."""
    import duckdb
    import pandas as pd

    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_corpus_stats, quality_score, text_token_stats)

    sf = "/root/testdata/sf0.001"
    got = q_corpus_stats(sf)
    toks = text_token_stats(sf).to_pandas()
    qual = quality_score(sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW d AS SELECT * FROM '{sf}/documents.parquet'")
    lang = con.sql("SELECT doc_id, lang FROM d").df()
    j = toks.merge(qual, on="doc_id").merge(lang, on="doc_id")
    exp = (j.groupby("lang", as_index=False)
           .agg(n_docs=("doc_id", "size"), sum_tokens=("n_tokens", "sum"),
                avg_quality=("quality", "mean"))
           .sort_values("lang").reset_index(drop=True))
    assert got["n_docs"].tolist() == exp["n_docs"].tolist()
    assert got["sum_tokens"].tolist() == exp["sum_tokens"].tolist()
    assert (abs(got["avg_quality"] - exp["avg_quality"]) < 1e-6).all()
