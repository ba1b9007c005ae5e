"""Semantic invariants for q_event_transitions, q_decayed_value,
q_user_favorite. Exact equality vs DuckDB is enforced by
tools/check_oracle.py."""

import math

import duckdb
import numpy as np

SF = "/root/testdata/sf0.01"


def _events():
    return duckdb.sql(
        f"SELECT event_id, ts, user_id, event_type, value FROM "
        f"'{SF}/events.parquet'").df()


def test_transitions_account_all_adjacencies(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_event_transitions)

    df = q_event_transitions(SF)
    ev = _events()
    n_users = ev["user_id"].nunique()
    # every user with n events contributes exactly n-1 transitions
    assert int(df["n"].sum()) == len(ev) - n_users
    # probabilities normalize per prev_type
    assert np.allclose(df.groupby("prev_type")["p"].sum(), 1.0, atol=1e-4)


def test_decayed_value_replay_one_user(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        DECAY_ALPHA, q_decayed_value)

    df = (q_decayed_value(SF).to_pandas()
          .sort_values("user_id").reset_index(drop=True))
    ev = _events()
    uid = int(df["user_id"].iloc[0])
    g = (ev[ev["user_id"] == uid]
         .sort_values(["ts", "event_id"], ascending=[False, False]))
    s = 0
    for k, v in enumerate(g["value"].to_numpy()):
        qv = math.floor(abs(v) * 1000 + 0.5) * (1 if v >= 0 else -1)
        s += math.floor(qv * math.pow(DECAY_ALPHA, k) * 1e6)
    got = df.loc[df["user_id"] == uid, "decayed_value"].iloc[0]
    assert abs(got - s / 1e9) < 1e-6
    assert int(df.loc[df["user_id"] == uid, "n_events"].iloc[0]) == len(g)
    assert len(df) == ev["user_id"].nunique()


def test_favorite_matches_pandas_mode(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_user_favorite)

    df = (q_user_favorite(SF).to_pandas()
          .sort_values("user_id").reset_index(drop=True))
    ev = _events()
    c = (ev.groupby(["user_id", "event_type"]).size()
         .rename("n").reset_index()
         .sort_values(["user_id", "n", "event_type"],
                      ascending=[True, False, True], kind="mergesort"))
    top = c.groupby("user_id").head(1).reset_index(drop=True)
    assert (df["favorite_type"].to_numpy() ==
            top["event_type"].to_numpy()).all()
    assert (df["n_fav"].to_numpy() == top["n"].to_numpy()).all()
    assert int(df["n_events"].sum()) == len(ev)
