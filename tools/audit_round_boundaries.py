"""One-off audit (VERDICT r03 item 3): for every oracled query that rounds
a FLOAT sum to 2 decimals, compute each group sum's distance to the nearest
half-cent rounding boundary, using DuckDB HUGEINT integer-grid arithmetic as
exact ground truth. A group whose exact sum lands ON (or within float-ulp
reach of) a boundary can flip with summation order — the q10 failure class.

Usage: python tools/audit_round_boundaries.py [sf_dir ...]
Prints, per query per scale, the minimum |frac - 0.5| over all groups where
frac = (exact_sum_on_cent_grid) mod 1 in half-cent units, plus the count of
groups within 1e-6 of the boundary.
"""
import sys

import duckdb

# Each entry: (query, SQL producing one column `g` = exact sum expressed in
# HALF-UNITS of the final rounding grid, as HUGEINT). For round(x, 2) the
# boundary is at odd multiples of 0.005 dollars = odd integers on the
# 0.005-dollar grid. We compute the exact sum on the finest native grid and
# check divisibility: a sum is ON the boundary iff (sum_grid * 2) % (2*step)
# == step where step = grid units per 0.01 dollars / 2 ... simpler: express
# the exact sum in units of 1e-<k> dollars (integer), the round-to-2dp
# boundary is at sum_units % (10^(k-2)) == 5*10^(k-3). Distance in units.
AUDITS = {
    # q1: charge on the 1e-6 grid (cent * pct * pct); round(.,2) boundary
    # every 10^4 units, half at 5*10^3
    "q1_charge": ("""
        SELECT sum(CAST(round(l_extendedprice*100) AS HUGEINT)
                   * (100 - CAST(round(l_discount*100) AS HUGEINT))
                   * (100 + CAST(round(l_tax*100) AS HUGEINT))) AS g
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""", 1_000_000),
    "q1_disc_price": ("""
        SELECT sum(CAST(round(l_extendedprice*100) AS HUGEINT)
                   * (100 - CAST(round(l_discount*100) AS HUGEINT))) AS g
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""", 10_000),
    "q1_base_price": ("""
        SELECT sum(CAST(round(l_extendedprice*100) AS HUGEINT)) AS g
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""", 100),
    "q3_revenue": ("""
        SELECT sum(CAST(round(l_extendedprice*100) AS HUGEINT)
                   * (100 - CAST(round(l_discount*100) AS HUGEINT))) AS g
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON c_custkey = o_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-03-15'
          AND l_shipdate  > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey""", 10_000),
    "rollup_acctbal": ("""
        SELECT sum(CAST(round(c_acctbal*100) AS HUGEINT)) AS g
        FROM customer GROUP BY c_nationkey""", 100),
    "events_value_user": ("""
        SELECT sum(CAST(round(value*100) AS HUGEINT)) AS g
        FROM events GROUP BY user_id""", 100),
    "events_value_tumbling": ("""
        SELECT sum(CAST(round(value*100) AS HUGEINT)) AS g
        FROM events GROUP BY time_bucket(INTERVAL 1 HOUR, ts), event_type
        """, 100),
    "events_pivot": ("""
        SELECT sum(CAST(round(value*100) AS HUGEINT)) AS g
        FROM events GROUP BY user_id % 20, event_type""", 100),
    # running per-user prefix sums: EVERY prefix is a rounded output row
    "events_running": ("""
        SELECT sum(CAST(round(value*100) AS HUGEINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
        FROM events""", 100),
}


def audit(sf_dir: str) -> None:
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    print(f"== {sf_dir}")
    for name, (sql, units_per_cent) in AUDITS.items():
        rows = con.execute(sql).fetchall()
        half = units_per_cent // 2
        # distance (in grid units) from the exact integer sum to the
        # nearest rounding boundary (odd multiple of half-a-cent)
        dists = [abs((int(g) % units_per_cent) - half)
                 for (g,) in rows if g is not None]
        if not dists:
            print(f"  {name:24s} (no groups)")
            continue
        on_boundary = sum(1 for d in dists if d == 0)
        print(f"  {name:24s} groups={len(dists):7d}  "
              f"min_dist_units={min(dists):6d}/{half}  "
              f"ON-boundary={on_boundary}")


if __name__ == "__main__":
    for sf in (sys.argv[1:] or ["/root/testdata/sf0.001",
                                "/root/testdata/sf0.01",
                                "/root/testdata/sf0.1"]):
        audit(sf)
