"""As-of join + top-k-per-group vs DuckDB on sf0.001.

These two operators have no single Ray Data primitive: the as-of join is a
co-grouped union merge (one groupby(key) shuffle, np.searchsorted inside the
group) and top-k-per-group is a partial per-batch combiner before the group
shuffle. Both must match the SQL window/ASOF semantics exactly.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "orders", "customer"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df) -> pd.DataFrame:
    if hasattr(df, "to_pandas"):  # streaming Dataset results
        df = df.to_pandas()
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_asof_last_order_matches_duckdb(ray_session, con):
    from norsk_historisk_avis_ocr_ray.functions.relational import q_asof_last_order

    got = _canon(q_asof_last_order(SF_DIR))
    exp = _canon(con.sql("""
        WITH j AS (
            SELECT e.event_id, e.user_id,
                   CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS last_order_s,
                   o.o_totalprice AS last_order_price,
                   row_number() OVER (PARTITION BY e.event_id
                                      ORDER BY o.o_orderdate DESC,
                                               o.o_totalprice DESC) AS rn
            FROM events e
            JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ) SELECT event_id, user_id, last_order_s, last_order_price
          FROM j WHERE rn = 1
    """).df())
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_asof_event_before_all_orders_dropped(ray_session, tmp_path):
    """An event earlier than every order of its key must not match (inner
    as-of semantics), and a key with no orders must not crash the merge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from norsk_historisk_avis_ocr_ray.functions.relational import q_asof_last_order

    ts = pa.array(np.array([1_000_000, 5_000_000, 9_000_000], "datetime64[us]"))
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([7, 7, 99], pa.int64()),
        "ts": ts,
    }), str(tmp_path / "events.parquet"))
    od = pa.array(np.array([4_000_000], "datetime64[us]"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([7], pa.int64()),
        "o_orderdate": od,
        "o_totalprice": pa.array([123.5], pa.float64()),
    }), str(tmp_path / "orders.parquet"))

    out = q_asof_last_order(str(tmp_path)).to_pandas()
    # event 1 precedes the only order; user 99 has no orders at all
    assert out["event_id"].tolist() == [2]
    assert out["last_order_s"].tolist() == [4]
    assert out["last_order_price"].tolist() == [123.5]


def test_topk_per_group_matches_duckdb(ray_session, con):
    from norsk_historisk_avis_ocr_ray.functions.relational import q_topk_per_group

    got = _canon(q_topk_per_group(SF_DIR))
    exp = _canon(con.sql("""
        SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey)
                       AS rnk
            FROM orders) WHERE rnk <= 3
    """).df())
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
    # every customer contributes at most k rows, ranks are 1..n
    per = got.groupby("o_custkey")["rnk"].agg(["count", "min", "max"])
    assert (per["count"] <= 3).all()
    assert (per["min"] == 1).all()
    assert (per["max"] == per["count"]).all()


def test_rolling_avg_matches_duckdb(ray_session, con):
    from norsk_historisk_avis_ocr_ray.functions.relational import q_rolling_avg

    got = _canon(q_rolling_avg(SF_DIR))
    exp = _canon(con.sql("""
        SELECT event_id, user_id,
               round(avg(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
                   AS roll_avg_value
        FROM events
    """).df())
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_group_quantiles_match_duckdb(ray_session, con):
    from norsk_historisk_avis_ocr_ray.functions.relational import q_group_quantiles

    got = _canon(q_group_quantiles(SF_DIR))
    exp = _canon(con.sql("""
        SELECT o_orderpriority, count(*) AS n_orders,
               round(quantile_cont(o_totalprice, 0.5), 2) AS p50_price,
               round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
        FROM orders GROUP BY o_orderpriority
    """).df())
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_range_window_events_matches_duckdb(ray_session, con):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_range_window_events)

    got = _canon(q_range_window_events(SF_DIR))
    want = _canon(con.sql("""
        SELECT e.event_id, e.user_id,
               count(*) AS n_recent,
               round(sum(p.value), 4) AS sum_recent_value
        FROM events e
        JOIN events p ON p.user_id = e.user_id
            AND epoch_us(p.ts) BETWEEN epoch_us(e.ts) - 3600000000
                                   AND epoch_us(e.ts)
        GROUP BY e.event_id, e.user_id
        ORDER BY e.event_id
    """).df())
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_range_window_every_event_matches_itself(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_range_window_events)

    df = q_range_window_events(SF_DIR).to_pandas()
    assert (df["n_recent"] >= 1).all()


def test_user_gaps_matches_duckdb(ray_session, con):
    from norsk_historisk_avis_ocr_ray.functions.relational import q_user_gaps

    got = _canon(q_user_gaps(SF_DIR))
    exp = _canon(con.sql("""
        WITH s AS (SELECT user_id, event_id,
                          CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        d AS (SELECT user_id,
                     sec - lag(sec) OVER (PARTITION BY user_id
                                          ORDER BY sec, event_id) AS gap
              FROM s)
        SELECT user_id, count(*) AS n_events,
               CAST(max(gap) AS BIGINT) AS max_gap_s,
               round(avg(gap), 6) AS avg_gap_s
        FROM d GROUP BY user_id HAVING count(*) >= 2
    """).df())
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_inactive_customers_matches_duckdb(ray_session, con):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_inactive_customers)

    got = _canon(q_inactive_customers(SF_DIR))
    exp = _canon(con.sql("""
        SELECT c_custkey, c_name, c_mktsegment,
               round(c_acctbal, 2) AS c_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1998-09-01')
    """).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_inactive_customers_planted(ray_session, tmp_path):
    """Anti-join semantics pinned: a customer with only pre-cutoff orders is
    inactive; one with any post-cutoff order is not; one with no orders at
    all is inactive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_inactive_customers)

    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["old", "active", "never"]),
        "c_mktsegment": pa.array(["X", "X", "X"]),
        "c_acctbal": pa.array([1.0, 2.0, 3.0]),
    })
    orders = pa.table({
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array(
            [np.datetime64("1997-01-01", "us"),
             np.datetime64("1999-01-01", "us")]),
    })
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = q_inactive_customers(str(tmp_path))
    assert got["c_custkey"].tolist() == [1, 3]


def test_events_hopping_matches_duckdb(ray_session, con):
    from norsk_historisk_avis_ocr_ray.functions.relational import q_events_hopping
    import __ray_entry__ as entry

    got = _canon(q_events_hopping(SF_DIR))
    exp = _canon(con.sql(entry.oracle_sql()["q_events_hopping"]).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_events_hopping_replication_factor(ray_session):
    """Every event lands in exactly window/hop = 3 windows: the sum of n
    over all (type, window) rows is 3x the event count."""
    import pyarrow.parquet as pq
    from norsk_historisk_avis_ocr_ray.functions.relational import q_events_hopping

    n_events = pq.read_metadata(f"{SF_DIR}/events.parquet").num_rows
    got = q_events_hopping(SF_DIR).to_pandas()
    assert int(got["n"].sum()) == 3 * n_events


def test_q5_star_join_matches_duckdb(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q5_local_supplier_volume)
    import __ray_entry__ as entry

    c = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "orders",
              "lineitem"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    got = _canon(q5_local_supplier_volume(SF_DIR))
    exp = _canon(c.sql(entry.oracle_sql()["q5_local_supplier_volume"]).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sessionize_and_rolling_under_hot_key_skew(ray_session, tmp_path):
    """90% of events on ONE user (the hot-key case every shuffle dreads):
    results must still match DuckDB exactly — the bucketed partitioning
    carries whole keys, so skew affects balance, never correctness."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 4000
    rng = np.random.default_rng(7)
    users = np.where(rng.random(n) < 0.9, 1, rng.integers(2, 20, n))
    ts = (np.datetime64("2024-01-01", "us")
          + (np.sort(rng.integers(0, 10**7, n))
             * np.timedelta64(1, "s")).astype("timedelta64[us]"))
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(users.astype(np.int64)),
        "ts": pa.array(ts),
        "value": pa.array(rng.random(n) * 100),
        "event_type": pa.array(["click"] * n),
        "props": pa.array(["{}"] * n),
    }), str(tmp_path / "events.parquet"))

    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_rolling_avg, q_sessionize)
    import __ray_entry__ as entry

    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM "
          f"'{tmp_path}/events.parquet'")
    for fn, name in ((q_sessionize, "q_sessionize"),
                     (q_rolling_avg, "q_rolling_avg")):
        got = _canon(fn(str(tmp_path)))
        exp = _canon(c.sql(entry.oracle_sql()[name]).df())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_salted_hot_keys_exact(ray_session, tmp_path):
    """Hot-key salting: one user owns 90% of events; with a low threshold
    the salted path must (a) actually split that key across salts and (b)
    produce exactly the unsalted result."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_asof_last_order)

    n = 3000
    rng = np.random.default_rng(11)
    users = np.where(rng.random(n) < 0.9, 7, rng.integers(8, 24, n))
    base = np.datetime64("2024-01-01", "us")
    ts = base + (np.sort(rng.integers(0, 10**6, n))
                 * np.timedelta64(1, "s")).astype("timedelta64[us]")
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(users.astype(np.int64)),
        "ts": pa.array(ts),
    }), str(tmp_path / "events.parquet"))
    m = 200
    od_users = rng.integers(7, 24, m).astype(np.int64)
    od_ts = base + (rng.integers(0, 10**6, m)
                    * np.timedelta64(1, "s")).astype("timedelta64[us]")
    pq.write_table(pa.table({
        "o_custkey": pa.array(od_users),
        "o_orderdate": pa.array(od_ts),
        "o_totalprice": pa.array(rng.random(m) * 1000),
    }), str(tmp_path / "orders.parquet"))

    plain = _canon(q_asof_last_order(str(tmp_path)))
    salted = _canon(q_asof_last_order(str(tmp_path), salt_hot_keys=True,
                                      hot_threshold=100, n_salts=4))
    pd.testing.assert_frame_equal(plain, salted)
    assert len(plain) > 0
    # the hot key's events genuinely spread across >1 salt (deterministic
    # splitmix64 of its event ids)
    from norsk_historisk_avis_ocr_ray.functions.dedup import _fmix64
    hot_eids = np.flatnonzero(users == 7).astype(np.uint64)
    assert len(np.unique(_fmix64(hot_eids) % np.uint64(4))) > 1


def test_rollup_levels_are_consistent():
    from norsk_historisk_avis_ocr_ray.functions.relational import q_rollup_acctbal

    out = q_rollup_acctbal("/root/testdata/sf0.01")
    fine = out[out["n_name"].notna()]
    regions = out[out["n_name"].isna() & out["r_name"].notna()]
    grand = out[out["r_name"].isna()]
    assert len(grand) == 1
    assert len(regions) == 5
    assert int(grand["n_custs"].iloc[0]) == int(fine["n_custs"].sum())
    assert int(regions["n_custs"].sum()) == int(fine["n_custs"].sum())
    # region subtotal equals the sum of its nations (counts are exact ints)
    for r, g in fine.groupby("r_name"):
        assert int(regions.loc[regions["r_name"] == r, "n_custs"].iloc[0]) \
            == int(g["n_custs"].sum())


def test_cube_levels_are_consistent():
    from norsk_historisk_avis_ocr_ray.functions.relational import q_cube_acctbal

    out = q_cube_acctbal("/root/testdata/sf0.01")
    fine = out[out["c_mktsegment"].notna() & out["n_name"].notna()]
    by_seg = out[out["c_mktsegment"].notna() & out["n_name"].isna()]
    by_nat = out[out["c_mktsegment"].isna() & out["n_name"].notna()]
    grand = out[out["c_mktsegment"].isna() & out["n_name"].isna()]
    assert len(grand) == 1
    total = int(fine["n_custs"].sum())
    assert int(grand["n_custs"].iloc[0]) == total
    assert int(by_seg["n_custs"].sum()) == total
    assert int(by_nat["n_custs"].sum()) == total
    # each segment subtotal equals the sum of its (segment, nation) cells
    for seg, g in fine.groupby("c_mktsegment"):
        assert int(by_seg.loc[by_seg["c_mktsegment"] == seg,
                              "n_custs"].iloc[0]) == int(g["n_custs"].sum())


def test_range_join_window_boundaries(tmp_path):
    # planted corpus: exact inclusive/exclusive boundary semantics —
    # events at orderdate-7d (IN), orderdate-1s (IN), orderdate (OUT),
    # orderdate-7d-1s (OUT)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from norsk_historisk_avis_ocr_ray.functions.relational import (
        RANGE_JOIN_WINDOW_S, q_events_before_order)

    t0 = 1_000_000_000  # epoch seconds
    W = RANGE_JOIN_WINDOW_S
    ev = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array([(t0 - W) * 1_000_000,        # inclusive lower
                        (t0 - 1) * 1_000_000,        # just inside
                        t0 * 1_000_000,              # exclusive upper
                        (t0 - W - 1) * 1_000_000,    # below window
                        (t0 - 2) * 1_000_000],       # other user
                       pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
    })
    od = pa.table({
        "o_orderkey": pa.array([10, 20], pa.int64()),
        "o_custkey": pa.array([1, 3], pa.int64()),   # user 3: no events
        "o_orderdate": pa.array([t0 * 1_000_000] * 2, pa.timestamp("us")),
    })
    pq.write_table(ev, str(tmp_path / "events.parquet"))
    pq.write_table(od, str(tmp_path / "orders.parquet"))

    out = (q_events_before_order(str(tmp_path)).to_pandas()
           .sort_values("o_orderkey").reset_index(drop=True))
    assert out.loc[0, "o_orderkey"] == 10
    assert out.loc[0, "n_events"] == 2          # boundary in, upper out
    assert out.loc[0, "sum_value"] == 3.0       # 1.0 + 2.0
    assert out.loc[1, "o_orderkey"] == 20       # orphan order kept (left)
    assert out.loc[1, "n_events"] == 0
    assert out.loc[1, "sum_value"] == 0.0
