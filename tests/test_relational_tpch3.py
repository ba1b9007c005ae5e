"""Semantic invariants for the third TPC-H batch (Q7/Q13/Q15/Q17/Q19/Q21
shapes). Exact value equality vs DuckDB is enforced by
tools/check_oracle.py; these tests pin the operator semantics
independently of the oracle SQL."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.01"


def test_q7_nation_pairs_and_years(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        Q7_N1, Q7_N2, q7_nation_volume)

    df = q7_nation_volume(SF)
    assert len(df) > 0
    # only the two cross-nation pairs, never same-nation rows
    pairs = set(zip(df["supp_nation"], df["cust_nation"]))
    assert pairs <= {(Q7_N1, Q7_N2), (Q7_N2, Q7_N1)}
    assert df["l_year"].isin([1996, 1997]).all()
    assert (df["revenue"] > 0).all()


def test_q13_distribution_accounts_every_customer(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q13_order_distribution)

    df = q13_order_distribution(SF)
    n_cust = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/customer.parquet'").fetchone()[0]
    # the c_count histogram partitions the customer table exactly
    assert int(df["custdist"].sum()) == n_cust
    assert df["c_count"].is_unique
    # left-join semantics: the zero-order bucket exists iff some customer
    # has no qualifying order
    zero_cust = duckdb.sql(f"""
        SELECT count(*) FROM '{SF}/customer.parquet' c
        WHERE NOT EXISTS (SELECT 1 FROM '{SF}/orders.parquet' o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority <> '1-URGENT')
        """).fetchone()[0]
    got_zero = df.loc[df["c_count"] == 0, "custdist"]
    assert (int(got_zero.iloc[0]) if len(got_zero) else 0) == zero_cust


def test_q15_winner_is_the_max(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q15_top_supplier)

    df = q15_top_supplier(SF)
    assert len(df) >= 1
    best = duckdb.sql(f"""
        SELECT max(r) FROM (
            SELECT sum(l_extendedprice * (1 - l_discount)) AS r
            FROM '{SF}/lineitem.parquet'
            WHERE l_shipdate >= DATE '1996-01-01'
              AND l_shipdate < DATE '1996-04-01'
            GROUP BY l_suppkey)""").fetchone()[0]
    # quantized argmax lands on the float max (grid exactness)
    assert abs(df["total_revenue"].iloc[0] - best) < 0.01
    assert df["s_name"].notna().all()


def test_q17_gate_matches_float_avg(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        Q17_BRAND, q17_small_qty_revenue)

    df = q17_small_qty_revenue(SF)
    assert len(df) == 1
    n_float_gate = duckdb.sql(f"""
        SELECT count(*) FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = '{Q17_BRAND}'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM '{SF}/lineitem.parquet' l2
              WHERE l2.l_partkey = l.l_partkey)""").fetchone()[0]
    # the integer predicate 5*qty*cnt < sum is the same rational gate
    assert int(df["n_lines"].iloc[0]) == n_float_gate


def test_q19_arms_are_a_union(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        Q19_ARMS, q19_disjunctive_revenue)

    df = q19_disjunctive_revenue(SF)
    assert len(df) == 1
    per_arm = 0
    for brand, smax, qlo, qhi in Q19_ARMS:
        per_arm += duckdb.sql(f"""
            SELECT count(*) FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey
            WHERE p.p_brand = '{brand}' AND p.p_size BETWEEN 1 AND {smax}
              AND l.l_quantity BETWEEN {qlo} AND {qhi}""").fetchone()[0]
    # arms are disjoint (distinct brands) so the union is the sum
    assert int(df["n_lines"].iloc[0]) == per_arm
    assert df["revenue"].iloc[0] > 0


def test_q21_predicate_semantics(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q21_waiting_suppliers)

    df = q21_waiting_suppliers(SF)
    assert 0 < len(df) <= 100
    assert (np.diff(df["numwait"].to_numpy()) <= 0).all()
    total = duckdb.sql(f"""
        WITH ls AS (
            SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                       AS failed
            FROM '{SF}/lineitem.parquet' GROUP BY 1, 2),
        os AS (SELECT l_orderkey, count(*) AS n_supp,
                      sum(failed) AS n_failed
               FROM ls GROUP BY 1)
        SELECT count(*) FROM ls JOIN os USING (l_orderkey)
        JOIN '{SF}/orders.parquet' o ON o.o_orderkey = ls.l_orderkey
        WHERE ls.failed = 1 AND os.n_supp > 1 AND os.n_failed = 1
          AND o.o_orderstatus = 'F'""").fetchone()[0]
    # with ≤100 suppliers total at this scale, no supplier is cut by the
    # LIMIT — the counts partition the qualifying pair set
    assert int(df["numwait"].sum()) == total
