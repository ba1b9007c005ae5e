"""Semantic invariants for q_user_set_algebra, q_daily_type_fill,
q_measure_unpivot. Exact equality vs DuckDB is enforced by
tools/check_oracle.py."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.01"


def test_set_algebra_cohort(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_user_set_algebra)

    df = q_user_set_algebra(SF)
    assert len(df) > 0
    assert (df["n_error"] > df["n_purchase"]).all()
    ev = duckdb.sql(f"SELECT user_id, event_type FROM "
                    f"'{SF}/events.parquet'").df()
    c = (ev.assign(p=(ev["event_type"] == "purchase").astype(int),
                   e=(ev["event_type"] == "error").astype(int),
                   s=(ev["event_type"] == "signup").astype(int))
         .groupby("user_id")[["p", "e", "s"]].sum())
    expect = c[(c["e"] > c["p"]) & (c["s"] > 0)].index.to_numpy()
    assert (np.sort(df["user_id"].to_numpy()) == np.sort(expect)).all()


def test_daily_fill_is_dense_and_consistent(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_daily_type_fill)

    df = q_daily_type_fill(SF)
    days = df["day"].nunique()
    types = df["event_type"].nunique()
    # the grid is dense: |days| x |types| rows exactly
    assert len(df) == days * types
    n_events = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet'").fetchone()[0]
    assert int(df["n_events"].sum()) == n_events
    # zero-filled rows exist only if some (day, type) cell is empty
    assert (df["n_events"] >= 0).all()


def test_unpivot_profiles_match_direct_agg(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_measure_unpivot)

    df = q_measure_unpivot(SF).set_index("measure")
    ref = duckdb.sql(f"""
        SELECT count(*), round(sum(l_quantity), 2), min(l_quantity),
               max(l_quantity) FROM '{SF}/lineitem.parquet'""").fetchone()
    assert int(df.loc["quantity", "n"]) == ref[0]
    assert abs(df.loc["quantity", "total"] - ref[1]) < 0.02
    assert df.loc["quantity", "vmin"] == ref[2]
    assert df.loc["quantity", "vmax"] == ref[3]
    assert set(df.index) == {"discount", "extendedprice", "quantity",
                             "tax"}
