"""Semantic invariants for the round-3 segment-4 analytics ops
(q_char_entropy, q_pmi_topk, q_median_mad, q_first_last). Exact value
equality vs DuckDB is enforced by tools/check_oracle.py; these pin the
operator semantics independently of the oracle SQL."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.01"


def _entropy_of(texts, ray_session):
    import ray

    from norsk_historisk_avis_ocr_ray.functions import textstats

    orig = textstats._docs
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    textstats._docs = lambda sf_dir, columns=("doc_id", "text"): ds
    try:
        return textstats.q_char_entropy("unused").to_pandas()
    finally:
        textstats._docs = orig


def test_char_entropy_planted(ray_session):
    df = _entropy_of(["aaaa", "abab", "abcd", ""], ray_session)
    e = df.sort_values("doc_id")["char_entropy"].to_numpy()
    assert e[0] == 0.0                       # one symbol -> zero entropy
    assert abs(e[1] - math.log(2)) < 1e-5    # two equiprobable symbols
    assert abs(e[2] - math.log(4)) < 1e-5    # four equiprobable symbols
    assert e[3] == 0.0                       # empty doc
    assert (df["n_chars"] == [4, 4, 4, 0]).all()


def test_char_entropy_corpus_bounds(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.textstats import (
        q_char_entropy)

    df = q_char_entropy(SF).to_pandas()
    assert len(df) == 500
    # entropy is bounded by ln(alphabet size) <= ln(n_chars)
    nz = df[df["n_chars"] > 0]
    assert (nz["char_entropy"] >= 0).all()
    assert (nz["char_entropy"] <= np.log(
        np.maximum(nz["n_chars"], 2))).all()


def test_pmi_vs_counts(ray_session):
    import duckdb

    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        PMI_MIN_COUNT, q_pmi_topk)

    df = q_pmi_topk(SF)
    assert len(df) == 50
    assert (df["n"] >= PMI_MIN_COUNT).all()
    assert (np.diff(df["pmi"].to_numpy()) <= 1e-12).all()
    # spot-check one pair against a direct DuckDB count recomputation
    w1, w2, n, pmi = df.iloc[0][["w1", "w2", "n", "pmi"]]
    cnt = duckdb.sql(f"""
        WITH w AS (SELECT string_split_regex(trim(lower(text)), '\\s+')
                          AS ws FROM '{SF}/documents.parquet'),
        u AS (SELECT unnest(ws) AS w FROM w),
        bg AS (SELECT unnest(ws[1:len(ws)-1]) AS a, unnest(ws[2:len(ws)]) AS b
               FROM w WHERE len(ws) >= 2)
        SELECT (SELECT count(*) FROM bg WHERE a = '{w1}' AND b = '{w2}'),
               (SELECT count(*) FROM bg),
               (SELECT count(*) FROM u WHERE w = '{w1}'),
               (SELECT count(*) FROM u WHERE w = '{w2}')""").fetchone()
    assert cnt[0] == n
    expect = (math.log(cnt[0]) + math.log(cnt[1])
              - math.log(cnt[2]) - math.log(cnt[3]))
    assert abs(pmi - expect) < 1e-6


def test_median_mad_matches_numpy(ray_session):
    import duckdb

    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_median_mad)

    df = q_median_mad(SF)
    raw = duckdb.sql(f"SELECT event_type, value FROM "
                     f"'{SF}/events.parquet'").df()
    for _, row in df.iterrows():
        v = raw.loc[raw["event_type"] == row["event_type"],
                    "value"].to_numpy()
        med = np.quantile(v, 0.5)
        assert abs(row["median_value"] - med) < 1e-3
        assert abs(row["mad_value"] - np.quantile(np.abs(v - med),
                                                  0.5)) < 1e-3
        assert row["n_events"] == len(v)
    # MAD is never negative and no larger than the full range
    assert (df["mad_value"] >= 0).all()


def test_first_last_against_pandas(ray_session):
    import duckdb

    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_first_last)

    df = (q_first_last(SF).to_pandas()
          .sort_values("user_id").reset_index(drop=True))
    raw = duckdb.sql(f"SELECT user_id, ts, event_id, event_type FROM "
                     f"'{SF}/events.parquet'").df()
    raw = raw.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    g = raw.groupby("user_id")
    expect = pd.DataFrame({
        "user_id": sorted(raw["user_id"].unique()),
        "n_events": g.size().to_numpy(),
        "first_type": g["event_type"].first().to_numpy(),
        "last_type": g["event_type"].last().to_numpy()})
    pd.testing.assert_frame_equal(
        df[["user_id", "n_events", "first_type", "last_type"]]
        .astype({"user_id": np.int64, "n_events": np.int64}),
        expect.astype({"user_id": np.int64, "n_events": np.int64}))
