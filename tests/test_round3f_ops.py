"""Semantic invariants for the round-3 segment-4 batch-3 ops
(q8_market_share, q9_product_profit, q_retention_cohorts,
q_length_decile). Exact value equality vs DuckDB is enforced by
tools/check_oracle.py."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.01"


def test_q8_share_in_unit_interval(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q8_market_share)

    df = q8_market_share(SF)
    assert set(df["o_year"]) == {1996, 1997}
    assert df["mkt_share"].between(0.0, 1.0).all()
    # the target nation's share must be <= 1/1 and nonzero at this scale
    assert (df["mkt_share"] > 0).any()


def test_q9_profit_vs_duckdb_float(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        Q9_WORD, q9_product_profit)

    df = q9_product_profit(SF)
    assert len(df) > 0
    # year DESC inside nation ASC
    for _, g in df.groupby("nation"):
        assert (np.diff(g["o_year"].to_numpy()) < 0).all()
    # the quantized grid reproduces the float profit to the cent
    ref = duckdb.sql(f"""
        SELECT sum(l.l_extendedprice * (1 - l.l_discount)
                   - p.p_retailprice * l.l_quantity)
        FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%{Q9_WORD}%'""").fetchone()[0]
    assert abs(df["sum_profit"].sum() - ref) < 0.05 * len(df)


def test_retention_cohort_identity(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_retention_cohorts)

    df = q_retention_cohorts(SF)
    assert (df["day_offset"] >= 0).all()
    # offset 0 of each cohort counts exactly the cohort's members, and
    # retention never exceeds the cohort size
    n_users = duckdb.sql(f"SELECT count(DISTINCT user_id) FROM "
                         f"'{SF}/events.parquet'").fetchone()[0]
    day0 = df[df["day_offset"] == 0]
    assert int(day0["n_active"].sum()) == n_users
    sizes = day0.set_index("cohort_day")["n_active"]
    later = df[df["day_offset"] > 0]
    assert (later["n_active"].to_numpy()
            <= sizes.loc[later["cohort_day"]].to_numpy()).all()


def test_length_decile_balance_and_order(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_length_decile)

    df = q_length_decile(SF).to_pandas()
    assert len(df) == 500
    counts = df["tile"].value_counts()
    assert set(counts.index) == set(range(1, 11))
    assert counts.max() - counts.min() <= 1
    # tiles are monotone in the (n_chars, doc_id) order
    df = df.sort_values(["n_chars", "doc_id"], kind="mergesort")
    assert (np.diff(df["tile"].to_numpy()) >= 0).all()
