"""Generic relational operators over the TPC-H-ish test tables.

These exercise the engine's wide-operator repertoire — partial-then-final
aggregation (combiner before the shuffle), hash join, broadcast join,
tumbling-window aggregation, top-k — each with an exact DuckDB SQL oracle
(see __ray_entry__.oracle_sql). Patterns:

- *pre-aggregate inside map_batches*: per-batch partial sums keyed by the
  group columns, so the ``groupby`` shuffle moves one row per (group, batch)
  instead of every input row.
- *broadcast join*: dimension tables (region/nation/customer) are ``ray.put``
  once and probed per batch — no shuffle.
- *hash join*: ``Dataset.join`` only when both sides are large
  (orders ⨝ lineitem).

All float outputs are rounded to fixed decimals in both the Ray and SQL
versions so value-hash comparison is stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from .collect import collect_table, ensure_schema, typed_empty
from .rounding import round_half_away
from .rounding import series_round_half_away as _r
from . import scale

Q1_CUTOFF = np.datetime64("1998-01-01", "us")


def _cents(x) -> np.ndarray:
    """Exact int64 quantization of a cent-grid float column (q9 pattern).

    Round-3's q10 driver failure proved float ``Sum`` + ``round(., 2)``
    flips on half-cent boundaries under summation-order drift (and the
    round-4 boundary audit, tools/audit_round_boundaries.py, found dozens
    of group sums sitting EXACTLY on a boundary at the gate scales), so
    every money/value sum in this module folds on an integer grid and
    converts to float with ONE division at the end."""
    return round_half_away(np.asarray(x, dtype=np.float64) * 100.0,
                           0).astype(np.int64)
Q3_SEGMENT = "BUILDING"
Q3_DATE = np.datetime64("1999-01-01", "us")
WINDOW_S = 3600


def _read(sf_dir: str, table: str, columns: list[str]) -> Dataset:
    # cluster+size-derived block count: Ray's auto-split fragments small
    # tables into ~64 tiny blocks whose per-block sort-shuffle fixed cost
    # dominated the whole bucketed-window family (see scale.read_blocks_for_path)
    path = f"{sf_dir}/{table}.parquet"
    return ray.data.read_parquet(
        path, columns=columns,
        override_num_blocks=scale.read_blocks_for_path(path))


# --- Q1: pricing summary (filter → partial agg → final agg) -----------------

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(Q1_CUTOFF)))
        p = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        d = _cents(t["l_discount"].to_numpy(zero_copy_only=False))
        tax = _cents(t["l_tax"].to_numpy(zero_copy_only=False))
        # all-integer grids: base on cents, disc_price on 1e-4 dollars,
        # charge on 1e-6 dollars — partition-order-independent sums
        df = pd.DataFrame({
            "l_returnflag": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "l_linestatus": t["l_linestatus"].to_numpy(zero_copy_only=False),
            "qty": (t["l_quantity"].to_numpy(zero_copy_only=False)
                    .astype(np.int64)),
            "base": p,
            "disc_price": p * (100 - d),
            "charge": p * (100 - d) * (100 + tax),
            "disc": d,
        })
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base_price=("base", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            sum_disc=("disc", "sum"),
            count_order=("qty", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    final = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("sum_charge", alias_name="sum_charge"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("count_order", alias_name="count_order"),
    )
    df = final.to_pandas()
    if df.empty:  # empty input partition/corpus: keep the schema stable
        return typed_empty(
            l_returnflag="object", l_linestatus="object", sum_qty="float64",
            sum_base_price="float64", sum_disc_price="float64",
            sum_charge="float64", count_order="int64", avg_qty="float64",
            avg_price="float64", avg_disc="float64")
    df["avg_qty"] = _r(df["sum_qty"] / df["count_order"], 6)
    df["avg_price"] = _r(df["sum_base_price"] / 100.0 / df["count_order"], 6)
    df["avg_disc"] = _r(df["sum_disc"] / 100.0 / df["count_order"], 6)
    df["sum_qty"] = _r(df["sum_qty"].astype(np.float64), 2)
    df["sum_base_price"] = _r(df["sum_base_price"] / 100.0, 2)
    df["sum_disc_price"] = _r(df["sum_disc_price"] / 10000.0, 2)
    df["sum_charge"] = _r(df["sum_charge"] / 1000000.0, 2)
    df = df.drop(columns=["sum_disc"])
    return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# --- Q3-ish: top orders by revenue (broadcast semi + hash join + top-k) -----

def q3_top_orders(sf_dir: str) -> pd.DataFrame:
    """Broadcast double semi-join: customer keys prune orders, the surviving
    orderkey set prunes lineitem BEFORE the revenue aggregate — the
    ``groupby(l_orderkey)`` shuffle then carries only qualifying keys, and no
    fact-to-fact hash join is needed (top-10 attrs are merged on the driver
    from the already-collected filtered orders). The broadcast side is
    bounded by the segment+date selectivity; inputs where the filtered
    orderkey set outgrows a broadcast should switch to
    ``Dataset.join(li_agg, orders_f)`` — the shape this replaced."""
    cust_tbl = collect_table(
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]))
    keys = cust_tbl.filter(
        pc.equal(cust_tbl["c_mktsegment"], Q3_SEGMENT))["c_custkey"]
    # store the Arrow array itself: workers use it as an is_in value_set
    # directly, instead of rebuilding a pa.array from a Python list per batch
    seg_keys = ray.put(keys.combine_chunks().sort())

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate",
                                      "o_orderpriority"])

    def filter_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(Q3_DATE)))
        mask = pc.is_in(t["o_custkey"], value_set=ray.get(seg_keys))
        return t.filter(mask).select(["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    orders_f = collect_table(
        orders.map_batches(filter_orders, batch_format="pyarrow"),
        fallback=pa.schema([("o_orderkey", pa.int64()),
                            ("o_orderdate", pa.timestamp("us")),
                            ("o_orderpriority", pa.string())]))
    okeys_ref = ray.put(orders_f["o_orderkey"].combine_chunks())

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(Q3_DATE)))
        t = t.filter(pc.is_in(t["l_orderkey"], value_set=ray.get(okeys_ref)))
        # int64 1e-4 dollar grid (q9/q10 pattern): revenue sums exactly
        p = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        d = _cents(t["l_discount"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"l_orderkey": t["l_orderkey"].to_numpy(),
                           "qrev": p * (100 - d)})
        g = df.groupby("l_orderkey", as_index=False)["qrev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    li_agg = (li.map_batches(li_partial, batch_format="pyarrow", batch_size=65536)
                .groupby("l_orderkey").aggregate(Sum("qrev", alias_name="qrev")))

    def local_top10(t: pa.Table) -> pa.Table:  # per-block top-k combiner
        d = t.to_pandas()
        d["revenue"] = _r(d["qrev"] / 10000.0, 2)
        d = d.sort_values(["revenue", "l_orderkey"],
                          ascending=[False, True]).head(10)
        return pa.Table.from_pandas(d.drop(columns=["qrev"]),
                                    preserve_index=False)

    df = li_agg.map_batches(local_top10, batch_format="pyarrow").to_pandas()
    if df.empty:
        return typed_empty(o_orderkey="int64", revenue="float64",
                           o_orderdate="datetime64[us]",
                           o_orderpriority="object")
    df = df.rename(columns={"l_orderkey": "o_orderkey"})
    df = df.sort_values(["revenue", "o_orderkey"],
                        ascending=[False, True]).head(10)
    attrs = orders_f.select(["o_orderkey", "o_orderdate",
                             "o_orderpriority"]).to_pandas()
    df = df.merge(attrs, on="o_orderkey", how="left")
    return df[["o_orderkey", "revenue", "o_orderdate", "o_orderpriority"]].reset_index(drop=True)


# --- customers per region (two-level broadcast join) -------------------------

def q_customers_per_region(sf_dir: str) -> pd.DataFrame:
    nation = collect_table(
        _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]))
    region = collect_table(
        _read(sf_dir, "region", ["r_regionkey", "r_name"]))
    r_names = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    n2r = {n: r_names[r] for n, r in zip(nation["n_nationkey"].to_pylist(),
                                         nation["n_regionkey"].to_pylist())}
    lookup = ray.put(n2r)

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def add_region(t: pa.Table) -> pa.Table:
        m = ray.get(lookup)
        names = [m[k] for k in t["c_nationkey"].to_pylist()]
        return pa.table({
            "r_name": pa.array(names, pa.string()),
            "qbal": pa.array(_cents(
                t["c_acctbal"].to_numpy(zero_copy_only=False))),
        })

    out = (cust.map_batches(add_region, batch_format="pyarrow")
               .groupby("r_name")
               .aggregate(Count(alias_name="n_customers"),
                          Sum("qbal", alias_name="qbal")))
    df = out.to_pandas()
    if df.empty:
        return typed_empty(r_name="object", n_customers="int64",
                           sum_acctbal="float64")
    df["sum_acctbal"] = _r(df["qbal"] / 100.0, 2)
    return (df.drop(columns=["qbal"])
              .sort_values("r_name").reset_index(drop=True))


def q_rollup_acctbal(sf_dir: str) -> pd.DataFrame:
    """Multi-level aggregate (SQL ``GROUP BY ROLLUP(r_name, n_name)``):
    per-nation, per-region subtotal, and grand total in one result, NULL
    key = subtotal level.

    Scale shape: the dimension chain is broadcast (nation/region are
    bounded), ONE corpus shuffle computes the finest (region, nation)
    level, and every coarser level derives from that 25-row result on the
    driver from the UNROUNDED sums — a rollup never needs a second corpus
    pass per level."""
    nation = collect_table(
        _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]))
    region = collect_table(
        _read(sf_dir, "region", ["r_regionkey", "r_name"]))
    r_names = dict(zip(region["r_regionkey"].to_pylist(),
                       region["r_name"].to_pylist()))
    n2rn = {k: (r_names[r], n)
            for k, n, r in zip(nation["n_nationkey"].to_pylist(),
                               nation["n_name"].to_pylist(),
                               nation["n_regionkey"].to_pylist())}
    lookup = ray.put(n2rn)

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def add_keys(t: pa.Table) -> pa.Table:
        m = ray.get(lookup)
        rn = [m[k] for k in t["c_nationkey"].to_pylist()]
        return pa.table({
            "r_name": pa.array([x[0] for x in rn], pa.string()),
            "n_name": pa.array([x[1] for x in rn], pa.string()),
            "qbal": pa.array(_cents(
                t["c_acctbal"].to_numpy(zero_copy_only=False))),
        })

    fine = (cust.map_batches(add_keys, batch_format="pyarrow")
                .groupby(["r_name", "n_name"])
                .aggregate(Count(alias_name="n_custs"),
                           Sum("qbal", alias_name="s"))
                .to_pandas())
    if fine.empty:
        return typed_empty(r_name="object", n_name="object",
                           n_custs="int64", sum_acctbal="float64",
                           avg_acctbal="float64")

    levels = [fine.assign(r_name=fine["r_name"], n_name=fine["n_name"])]
    by_r = (fine.groupby("r_name", as_index=False)
                .agg(n_custs=("n_custs", "sum"), s=("s", "sum")))
    levels.append(by_r.assign(n_name=None))
    total = pd.DataFrame({"r_name": [None], "n_name": [None],
                          "n_custs": [fine["n_custs"].sum()],
                          "s": [fine["s"].sum()]})
    levels.append(total)
    out = pd.concat(levels, ignore_index=True)[
        ["r_name", "n_name", "n_custs", "s"]]
    out["n_custs"] = out["n_custs"].astype(np.int64)
    out["sum_acctbal"] = _r(out["s"] / 100.0, 2)
    out["avg_acctbal"] = _r(out["s"] / 100.0 / out["n_custs"], 6)
    return (out.drop(columns=["s"])
               .sort_values(["r_name", "n_name"], na_position="first")
               .reset_index(drop=True))


# --- events: tumbling-window aggregation -------------------------------------

def q_events_tumbling(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy()  # datetime64[us]
        win = (ts.astype("datetime64[s]").astype(np.int64) // WINDOW_S).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_numpy(zero_copy_only=False),
                           "win": win,
                           "qv": _cents(t["value"].to_numpy())})
        g = df.groupby(["event_type", "win"], as_index=False).agg(
            n=("qv", "size"), qv=("qv", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
             .groupby(["event_type", "win"])
             .aggregate(Sum("n", alias_name="n"),
                        Sum("qv", alias_name="qv")))
    df = out.to_pandas()
    if df.empty:
        return typed_empty(event_type="object", win="int64", n="int64",
                           sum_value="float64")
    df["sum_value"] = _r(df["qv"] / 100.0, 4)
    df["n"] = df["n"].astype(np.int64)
    return (df.drop(columns=["qv"])
              .sort_values(["event_type", "win"]).reset_index(drop=True))


def q_diurnal_profile(sf_dir: str) -> pd.DataFrame:
    """Hour-of-day arrival profile per event type: events, DISTINCT
    users and total value per (event_type, hour) — the diurnal-load
    table capacity planning and bot-detection read first (a type whose
    traffic ignores the day/night cycle is automation).

    EXACT: the hour is integer epoch arithmetic; value rides the cents
    grid (``_cents``); the distinct-user count resolves inside ONE
    user-hash bucket (a user lives in exactly one bucket, so bucket-
    local distinct (type, hour, user) rows are globally additive) — all
    integers, partitioning-independent.

    Ray shape: per-batch (bucket, type, hour, user) partials → ONE
    hash-bucket shuffle (the windowed-operator contract,
    ``_user_bucketizer``) → vectorized two-level pandas rollup per
    bucket → NB × |types|·24 cell partials fold on the driver.
    Result-sized → DataFrame. (The first cut chained two sort-based Ray
    aggregates over the event-sized triple table — 7.8 s in-suite at
    sf0.1; this form is one shuffle.)"""
    ds = _read(sf_dir, "events", ["ts", "event_type", "user_id", "value"])
    bucketize = _user_bucketizer()

    def partial(t: pa.Table) -> pa.Table:
        t = bucketize(t)
        s = t["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        hour = ((s // 3600) % 24).astype(np.int64)
        df = pd.DataFrame({
            "bucket": t["bucket"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "hour": hour,
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "n": np.ones(len(hour), np.int64),
            "qv": _cents(t["value"].to_numpy())})
        g = df.groupby(["bucket", "event_type", "hour", "user_id"],
                       as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t3 = (g.groupby(["event_type", "hour", "user_id"],
                        as_index=False)
              .agg(n=("n", "sum"), qv=("qv", "sum")))
        cell = (t3.groupby(["event_type", "hour"], as_index=False)
                .agg(n=("n", "sum"), qv=("qv", "sum"),
                     u=("user_id", "size")))
        for c in ("n", "qv", "u"):
            cell[c] = cell[c].astype(np.int64)
        return cell

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas")
             .to_pandas())                  # ≤ NB × |types|·24 rows
    if parts.empty:
        return typed_empty(event_type="object", hour="int64",
                           n_events="int64", n_users="int64",
                           sum_value="float64")
    df = (parts.groupby(["event_type", "hour"], as_index=False)
          .agg(n_events=("n", "sum"), n_users=("u", "sum"),
               qv=("qv", "sum")))
    if df.empty or "n_events" not in df.columns:
        return typed_empty(event_type="object", hour="int64",
                           n_events="int64", n_users="int64",
                           sum_value="float64")
    for c in ("hour", "n_events", "n_users"):
        df[c] = df[c].astype(np.int64)
    df["sum_value"] = _r(df["qv"].astype(np.float64) / 100.0, 4)
    return (df[["event_type", "hour", "n_events", "n_users",
                "sum_value"]]
            .sort_values(["event_type", "hour"]).reset_index(drop=True))


# --- events: top users by total value (agg + top-k) --------------------------

def q_top_users(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(),
                           "qv": _cents(t["value"].to_numpy())})
        g = df.groupby("user_id", as_index=False).agg(
            n_events=("qv", "size"), qv=("qv", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
             .groupby("user_id")
             .aggregate(Sum("n_events", alias_name="n_events"),
                        Sum("qv", alias_name="qv")))
    df = out.to_pandas()
    if df.empty:
        return typed_empty(user_id="int64", n_events="int64",
                           total_value="float64")
    df["total_value"] = _r(df["qv"] / 100.0, 4)
    df["n_events"] = df["n_events"].astype(np.int64)
    df = df.sort_values(["total_value", "user_id"], ascending=[False, True]).head(20)
    return df[["user_id", "n_events", "total_value"]].reset_index(drop=True)


# --- distinct / count-distinct --------------------------------------------

def q_distinct_brands(sf_dir: str) -> pd.DataFrame:
    """Distinct (p_brand, p_type) pairs with part counts + min price —
    exercises the distinct/groupby path with a vectorized aggregate."""
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "part", ["p_brand", "p_type", "p_retailprice"])
    out = (ds.groupby(["p_brand", "p_type"])
             .aggregate(Count(alias_name="n_parts"),
                        Min("p_retailprice", alias_name="min_price")))
    df = out.to_pandas()
    if df.empty:
        return typed_empty(p_brand="object", p_type="object",
                           n_parts="int64", min_price="float64")
    df["min_price"] = _r(df["min_price"], 2)
    df["n_parts"] = df["n_parts"].astype(np.int64)
    return df.sort_values(["p_brand", "p_type"]).reset_index(drop=True)


def q_count_distinct_custs(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT o_custkey) per order priority: two-level aggregation —
    dedup on (priority, custkey) first (partial inside map_batches, then a
    grouped first-per-key), then count per priority. The scalable exact
    distinct-count pattern (no driver-side set)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])

    def local_dedup(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_unique(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": [g["o_orderpriority"].iloc[0]],
            "n_customers": np.array([g["o_custkey"].nunique()], np.int64),
        })

    # ONE shuffle (on the 5-value priority key) instead of the previous
    # two-level groupby chain: the batch-local dedup already shrinks the
    # exchange to near-distinct (priority, custkey) int pairs, and the final
    # nunique is a vectorized factorization per group. With only a handful
    # of hot groups the reduce fan-in is bounded by group count — at larger
    # group cardinality flip back to the two-level (pair-key) shuffle, which
    # parallelizes the reduce at the cost of a second exchange.
    df = (ds.map_batches(local_dedup, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("o_orderpriority")
            .map_groups(count_unique, batch_format="pandas")
            .to_pandas())
    if df.empty:
        return typed_empty(o_orderpriority="object", n_customers="int64")
    df["n_customers"] = df["n_customers"].astype(np.int64)
    return df.sort_values("o_orderpriority").reset_index(drop=True)


def _asof_buckets() -> int:
    """Bucket count for the windowed/as-of co-group family (power of two:
    ``bucket = key & (NB-1)``). Derived from the cluster CPU count at
    QUERY-BUILD time on the driver (``scale.pow2_buckets``, floor 256 —
    the single-VM tuned value) and captured by each query's closures, so
    every stage of one query agrees on the bucket map even if the cluster
    resizes mid-run. Round-3 VERDICT item 5: fixed shuffle-width constants
    cap a big cluster's combine parallelism."""
    return scale.pow2_buckets(floor=256)


def _user_bucketizer(nb: int | None = None):
    """Shared partitioning contract of the windowed operators: hash bucket
    = user_id & (NB-1), many keys per bucket. Factory: the bucket count is
    resolved ONCE here (driver) and closed over."""
    if nb is None:
        nb = _asof_buckets()

    def bucketize(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.bit_wise_and(t["user_id"].cast(pa.int64()),
                                      nb - 1))

    return bucketize


# --- ordered window: running sum per user ------------------------------------

def q_running_user_value(sf_dir: str) -> pd.DataFrame:
    """Per-user running total of event values in (ts, event_id) order — the
    ordered-window operator as a BUCKETED co-grouped window (one hash-bucket
    shuffle, many users per Ray group call, vectorized per-user cumsum
    inside the bucket). Returns the final 100 events by event_id via a
    distributed top-k: each batch emits only its local top-100, so the
    driver merges at most 100 × n_blocks rows (never the full stream)."""
    TOP_N = 100
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        qv = pd.Series(_cents(g["value"].to_numpy()), index=g.index)
        g["running_value"] = _r(
            qv.groupby(g["user_id"].to_numpy(), sort=False).cumsum()
            / 100.0, 4)
        return g[["event_id", "user_id", "running_value"]]

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= TOP_N:
            return t
        ev = t["event_id"].to_numpy()
        idx = np.argpartition(ev, t.num_rows - TOP_N)[-TOP_N:]
        return t.take(np.sort(idx))

    df = (ds.map_batches(_user_bucketizer(), batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(running, batch_format="pandas")
            .map_batches(local_topk, batch_format="pyarrow")
            .to_pandas())
    if df.empty:
        return typed_empty(event_id="int64", user_id="int64",
                           running_value="float64")
    return df.sort_values("event_id").tail(TOP_N).reset_index(drop=True)


# --- sessionization (streaming-shaped: gap-based session windows) -------------

SESSION_GAP_S = 1800


def q_sessionize(sf_dir: str) -> Dataset:
    """Per-user session windows: a new session starts after a >30-min gap.
    Ray Data has no event-time watermarks; the batch-engine form is a
    BUCKETED co-grouped window (SURVEY §2.7): one shuffle on
    ``bucket = user_id & (NB-1)`` — many users per bucket, so one Ray group
    invocation covers ~users/NB keys instead of one call per user — then a
    fully vectorized multi-user session scan inside the bucket (user-change
    OR >gap break → cumsum session ids, normalized per user). Within-key
    order is established locally, never a global sort."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        sec = g["ts"].astype("int64") // 1_000_000
        # floored seconds BEFORE the diff — matches the SQL oracle's
        # max(floor(epoch)) - min(floor(epoch)) duration
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = new_user | (sec.diff() > SESSION_GAP_S)
        gid = brk.cumsum()                       # global session id
        first = gid.groupby(g["user_id"].to_numpy()).transform("min")
        out = (pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64),
            "session_idx": (gid - first).to_numpy(np.int64),
            "qv": _cents(g["value"].to_numpy()),
            "sec": sec.to_numpy()})
            .groupby(["user_id", "session_idx"], as_index=False)
            .agg(n_events=("qv", "size"), qv=("qv", "sum"),
                 s0=("sec", "min"), s1=("sec", "max")))
        out["duration_s"] = (out["s1"] - out["s0"]).astype(np.int64)
        out["sum_value"] = _r(out["qv"] / 100.0, 4)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out[["user_id", "session_idx", "n_events", "sum_value",
                    "duration_s"]]

    # Streaming result: one row per session is corpus-sized — hand the
    # Dataset to the consumer (sink/compare) instead of a driver pull.
    return ensure_schema(
        ds.map_batches(_user_bucketizer(), batch_format="pyarrow")
          .groupby("bucket").map_groups(sessions, batch_format="pandas"),
        pa.schema([("user_id", pa.int64()), ("session_idx", pa.int64()),
                   ("n_events", pa.int64()), ("sum_value", pa.float64()),
                   ("duration_s", pa.int64())]))


def q_first_touch(sf_dir: str) -> pd.DataFrame:
    """First-touch attribution: which event type each user STARTED with
    (earliest ts, ties to the lower event_id), counted per type with the
    users' total downstream value — the acquisition-channel table
    marketing analytics reads against last-touch conversion.

    EXACT: the first-event argmin compares (integer second, event_id)
    pairs inside the user's hash bucket (the windowed contract — a
    user's rows never split); value rides the cents grid; ONE division
    per output row for the mean.

    Ray shape: per-batch (bucket, user) local-argmin + value partials →
    one hash-bucket shuffle → per-bucket vectorized argmin + per-type
    rollup → NB × |types| partials fold on the driver. Result-sized →
    DataFrame."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type", "value"])
    bucketize = _user_bucketizer()

    def partial(t: pa.Table) -> pa.Table:
        t = bucketize(t)
        sec = t["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        df = pd.DataFrame({
            "bucket": t["bucket"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "sec": sec,
            "event_id": t["event_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "qv": _cents(t["value"].to_numpy()),
            "n": np.ones(len(sec), np.int64)})
        # batch-local argmin per user (correct partial: the global argmin
        # survives any subset argmin chain) + batch-local value sums
        first = (df.sort_values(["user_id", "sec", "event_id"],
                                kind="mergesort")
                 .groupby("user_id", as_index=False).first()
                 [["bucket", "user_id", "sec", "event_id", "event_type"]])
        sums = (df.groupby(["bucket", "user_id"], as_index=False)
                .agg(qv=("qv", "sum"), n=("n", "sum")))
        out = first.merge(sums, on=["bucket", "user_id"])
        return pa.Table.from_pandas(out, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        first = (g.sort_values(["user_id", "sec", "event_id"],
                               kind="mergesort")
                 .groupby("user_id", as_index=False)
                 .agg(event_type=("event_type", "first")))
        sums = (g.groupby("user_id", as_index=False)
                .agg(qv=("qv", "sum"), n=("n", "sum")))
        j = first.merge(sums, on="user_id")
        cell = (j.groupby("event_type", as_index=False)
                .agg(u=("user_id", "size"), qv=("qv", "sum"),
                     n=("n", "sum")))
        for c in ("u", "qv", "n"):
            cell[c] = cell[c].astype(np.int64)
        return cell

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas")
             .to_pandas())               # ≤ NB × |types| rows
    if parts.empty:
        return typed_empty(first_type="object", n_users="int64",
                           n_events="int64", mean_user_value="float64")
    df = (parts.groupby("event_type", as_index=False)
          .agg(n_users=("u", "sum"), n_events=("n", "sum"),
               qv=("qv", "sum"))
          .rename(columns={"event_type": "first_type"}))
    for c in ("n_users", "n_events"):
        df[c] = df[c].astype(np.int64)
    # total downstream value per first-touch cohort / its users
    df["mean_user_value"] = _r((df["qv"].astype(np.float64) / 100.0)
                               / df["n_users"].astype(np.float64), 6)
    return (df[["first_type", "n_users", "n_events", "mean_user_value"]]
            .sort_values("first_type").reset_index(drop=True))


def q_outlier_users(sf_dir: str) -> pd.DataFrame:
    """Spend-anomaly users: accounts whose TOTAL event value deviates
    more than 3σ from the mean user total — q_anomaly_days' all-integer
    σ test applied to users instead of days (whale detection / abuse
    triage). With D users, S = Σtᵤ, Q = Σtᵤ² (cents), the decision is
    ``(tᵤ·D − S)² > 9·(D·Q − S²)`` — pure integers; the reported z is
    display math on the same exact integers.

    Ray shape: per-batch (user, cents) partials → one user-bucketed
    combine resolves complete totals (slim rows, pinned once for the
    moment fold and the outlier filter) → driver computes global
    moments → one vectorized filter over the pinned totals. Outlier
    rows are result-sized → DataFrame."""
    import math

    from .combine import bucketed_combine

    empty = typed_empty(user_id="int64", n_events="int64",
                        total_value="float64", z="float64")
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({"user_id": t["user_id"].to_numpy(
                               zero_copy_only=False).astype(np.int64),
                           "n": np.ones(t.num_rows, np.int64),
                           "qv": _cents(t["value"].to_numpy())})
             .groupby("user_id", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    def totals(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False).sum()
        out["n"] = out["n"].astype(np.int64)
        out["qv"] = out["qv"].astype(np.int64)
        return out

    # two consumers (moment fold + outlier filter): pin the slim
    # per-user totals once — never a corpus-sized driver pull
    tot_ds = bucketed_combine(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=65536),
        "user_id", totals).materialize()

    def moments(t: pa.Table) -> pa.Table:
        qv = t["qv"].to_numpy(zero_copy_only=False).astype(np.int64)
        # python-int partials: qv² sums exceed int64 long before 2^63
        # corpus-wide at web scale; per-batch they stay small and the
        # driver folds exact python ints
        return pa.table({"d": pa.array([len(qv)], pa.int64()),
                         "s": pa.array([int(qv.sum())], pa.int64()),
                         "q": pa.array([sum(int(x) * int(x)
                                            for x in qv)], pa.int64())})

    m = tot_ds.map_batches(moments, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    if m.empty or "d" not in m.columns:
        return empty
    dd = int(m["d"].sum())
    sn = int(m["s"].sum())
    qn = sum(int(x) for x in m["q"])
    var_q = dd * qn - sn * sn

    def flag(t: pa.Table) -> pa.Table:
        qv = t["qv"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = []
        for i, tu in enumerate(qv):
            dev = int(tu) * dd - sn           # python-int test
            if dev * dev > 9 * var_q:
                keep.append(i)
        if not keep:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "qv": pa.array([], pa.int64())})
        k = np.array(keep, np.int64)
        return pa.table({
            "user_id": pa.array(t["user_id"].to_numpy(
                zero_copy_only=False).astype(np.int64)[k]),
            "n_events": pa.array(t["n"].to_numpy(
                zero_copy_only=False).astype(np.int64)[k]),
            "qv": pa.array(qv[k])})

    out = (tot_ds.map_batches(flag, batch_format="pyarrow",
                              batch_size=65536)
           .to_pandas())                    # result-sized outliers
    if out.empty:
        return empty
    out["total_value"] = round_half_away(
        out["qv"].to_numpy(np.float64) / 100.0, 4)
    out["z"] = round_half_away(np.array(
        [abs(float(int(tu) * dd - sn)) / math.sqrt(float(var_q))
         for tu in out["qv"]], np.float64), 6)
    for c in ("user_id", "n_events"):
        out[c] = out[c].astype(np.int64)
    return (out[["user_id", "n_events", "total_value", "z"]]
            .sort_values("user_id").reset_index(drop=True))


def q_daily_actives(sf_dir: str) -> pd.DataFrame:
    """Daily active users split into NEW vs RETURNING — the growth
    dashboard's top row (is today's traffic acquisition or retention?):
    per day, distinct active users, users whose FIRST-ever event lands
    that day, and the returning remainder.

    EXACT and all-integer: a user's first day is an argmin over integer
    epoch days resolved whole inside the user's hash bucket; per-day
    distinct actives count bucket-local (user, day) rows (additive — a
    user lives in one bucket); returning = active − new.

    Ray shape: per-batch (bucket, user, day) distinct partials → ONE
    hash-bucket shuffle → per-bucket first-day + per-day rollup →
    NB × days partials fold on the driver. Result-sized → DataFrame."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    bucketize = _user_bucketizer()

    def partial(t: pa.Table) -> pa.Table:
        t = bucketize(t)
        s = t["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        df = (pd.DataFrame({
                "bucket": t["bucket"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "user_id": t["user_id"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "day": (s // 86400).astype(np.int64)})
              .drop_duplicates(["user_id", "day"]))
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        first = g.groupby("user_id")["day"].transform("min")
        cell = (pd.DataFrame({"day": g["day"].to_numpy(np.int64),
                              "a": np.ones(len(g), np.int64),
                              "nw": (g["day"].to_numpy(np.int64)
                                     == first.to_numpy(np.int64))
                              .astype(np.int64)})
                .groupby("day", as_index=False).sum())
        for c in ("a", "nw"):
            cell[c] = cell[c].astype(np.int64)
        return cell

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas")
             .to_pandas())                  # ≤ NB × days rows
    if parts.empty:
        return typed_empty(day="int64", n_active="int64", n_new="int64",
                           n_returning="int64")
    df = (parts.groupby("day", as_index=False)
          .agg(n_active=("a", "sum"), n_new=("nw", "sum")))
    df["n_returning"] = df["n_active"] - df["n_new"]
    for c in df.columns:
        df[c] = df[c].astype(np.int64)
    return (df[["day", "n_active", "n_new", "n_returning"]]
            .sort_values("day").reset_index(drop=True))


def q_transition_entropy(sf_dir: str) -> pd.DataFrame:
    """Markov predictability of the event stream: per previous type, the
    Shannon entropy H(next | prev) of the transition row — near zero
    means the next action is scripted (bots, rigid funnels), near
    ln(|types|) means memoryless browsing. The one-number-per-state
    companion of q_event_transitions.

    EXACT: transition counts ride the proven q_event_transitions chain;
    each term quantizes to ``floor((c/n)·ln(c/n)·1e12)`` int64 on the
    driver over the result-sized |types|² matrix (``math.log`` == DuckDB
    ``ln``); one division per output row."""
    import math

    base = q_event_transitions(sf_dir)
    if base.empty:
        return typed_empty(prev_type="object", n="int64",
                           n_next_types="int64", entropy="float64")
    rows = []
    for pt, g in base.groupby("prev_type", sort=True):
        c = g["n"].to_numpy(np.int64)
        n = int(c.sum())
        q = 0
        for ci in c:
            p = float(int(ci)) * 1.0 / float(n)
            q += math.floor(p * math.log(p) * 1e12)
        rows.append((pt, n, len(c), float(round_half_away(
            np.float64(-q) / 1e12, 6))))
    out = pd.DataFrame(rows, columns=["prev_type", "n", "n_next_types",
                                      "entropy"])
    for c in ("n", "n_next_types"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("prev_type").reset_index(drop=True)


def q_ref_integrity(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity health across the engine's cross-table
    joins: for each linked pair — documents↔embeddings (doc_id=vec_id),
    events↔customer (user_id=c_custkey) — the matched/orphan key counts
    both ways. The pre-flight every cross-modal or cross-table operator
    should read: a nonzero orphan column is silent row loss in every
    inner join downstream.

    EXACT and all-integer: each side reduces to its DISTINCT key set
    per batch; one bucketed combine per pair resolves key presence
    (a key's rows land whole in one bucket, so side-presence counts are
    additive). Output: 2 rows.

    Ray shape: two slim 1-column reads per pair → per-batch distinct
    partials → one bucketed combine each → driver folds four integers
    per pair. Result-sized → DataFrame."""
    from .combine import bucketed_combine

    def side_ids(path: str, col: str, bit: int):
        ds = ray.data.read_parquet(f"{sf_dir}/{path}.parquet",
                                   columns=[col])

        def partial(t: pa.Table) -> pa.Table:
            ids = np.unique(t[col].to_numpy(zero_copy_only=False)
                            .astype(np.int64))
            return pa.table({"key": pa.array(ids, pa.int64()),
                             "b": pa.array(
                                 np.full(len(ids), bit, np.int64))})

        return ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)

    def presence(g: pd.DataFrame) -> pd.DataFrame:
        # distinct (key, bit) rows then a vectorized sum: 1 = left only,
        # 2 = right only, 3 = both (bits are {1, 2})
        m = (g.drop_duplicates(["key", "b"])
             .groupby("key")["b"].sum())
        return pd.DataFrame({"matched": [int((m == 3).sum())],
                             "left_only": [int((m == 1).sum())],
                             "right_only": [int((m == 2).sum())]})

    rows = []
    for pair, (lp, lc), (rp, rc) in (
            ("documents-embeddings", ("documents", "doc_id"),
             ("embeddings", "vec_id")),
            ("events-customer", ("events", "user_id"),
             ("customer", "c_custkey"))):
        u = side_ids(lp, lc, 1).union(side_ids(rp, rc, 2))
        fdf = bucketed_combine(u, "key", presence).to_pandas()
        if fdf.empty or "matched" not in fdf.columns:
            # empty pair (empty corpus): the combine emits no rows and
            # the frame loses its columns — drop the pair entirely (the
            # oracle's keyless-pair filter matches)
            continue
        f = fdf.sum()
        matched, lo, ro = (int(f["matched"]), int(f["left_only"]),
                           int(f["right_only"]))
        rows.append((pair, matched + lo, matched + ro, matched, lo, ro))
    if not rows:
        return typed_empty(pair="object", n_left="int64",
                           n_right="int64", n_matched="int64",
                           n_left_only="int64", n_right_only="int64")
    out = pd.DataFrame(rows, columns=["pair", "n_left", "n_right",
                                      "n_matched", "n_left_only",
                                      "n_right_only"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("pair").reset_index(drop=True)


def q_transition_time(sf_dir: str) -> pd.DataFrame:
    """Timed transition matrix: for every (prev_type → next_type) pair
    of consecutive same-user events, the count and the MEAN gap in
    seconds — q_event_transitions with the timing dimension, the table
    that separates an instant UI flow from an overnight return.

    EXACT: ordering is (microsecond timestamp, event_id) inside the
    user's hash bucket (a user's rows never split); gaps fold as int64
    microsecond sums; the mean divides exact integers twice in a fixed
    order ((Σus / 1e6) / n, the q_ccnet device).

    Ray shape: one hash-bucket shuffle → vectorized multi-user lag scan
    per bucket → (from, to, 2-int) partials fold through a
    ≤ |types|²-group driver rollup. Result-sized → DataFrame."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])
    bucketize = _user_bucketizer()

    def add_us(t: pa.Table) -> pa.Table:
        t = bucketize(t)
        us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "bucket": t["bucket"],
            "user_id": t["user_id"],
            "us": pa.array(us, pa.int64()),
            "event_id": t["event_id"],
            "event_type": t["event_type"]})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us", "event_id"], kind="mergesort")
        same = g["user_id"].eq(g["user_id"].shift()).fillna(False)
        prev = g["event_type"].shift()
        gap = g["us"].diff()
        d = pd.DataFrame({
            "prev_type": prev[same].to_numpy(),
            "next_type": g.loc[same, "event_type"].to_numpy(),
            "n": np.ones(int(same.sum()), np.int64),
            "gap_us": gap[same].to_numpy(np.int64)})
        out = (d.groupby(["prev_type", "next_type"], as_index=False)
               .sum())
        out["n"] = out["n"].astype(np.int64)
        out["gap_us"] = out["gap_us"].astype(np.int64)
        return out

    parts = (ds.map_batches(add_us, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas")
             .to_pandas())                  # ≤ NB × |types|² rows
    if parts.empty:
        return typed_empty(prev_type="object", next_type="object",
                           n="int64", mean_gap_s="float64")
    df = (parts.groupby(["prev_type", "next_type"], as_index=False)
          .agg(n=("n", "sum"), gap_us=("gap_us", "sum")))
    df["n"] = df["n"].astype(np.int64)
    df["mean_gap_s"] = _r((df["gap_us"].astype(np.float64) / 1e6)
                          / df["n"].astype(np.float64), 6)
    return (df[["prev_type", "next_type", "n", "mean_gap_s"]]
            .sort_values(["prev_type", "next_type"])
            .reset_index(drop=True))


RFM_MGRID = 100     # monetary log-grid: mg = floor(100·ln(1+cents))


def q_rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM segmentation — the classic CRM operator: each user scored
    into Recency / Frequency / Monetary terciles (1 = top third), users
    counted per (r, f, m) cell (≤ 27 rows). The cohort table churn
    models and campaign targeting start from.

    EXACT via three bounded per-dimension histograms: recency in WHOLE
    DAYS since the corpus max timestamp (bounded by the time span),
    frequency in raw event counts (bounded by max events/user), and
    monetary on the q_ccnet_buckets log grid ``floor(100·ln(1+cents))``
    (bounded however large the totals — ``math.log`` == DuckDB ``ln``).
    Tercile cuts per dimension are the all-integer cume test
    ``3·cum > U`` / ``3·cum > 2·U`` over users; cell counts are integer
    sums. A user's triple resolves whole inside its hash bucket.

    Ray shape: pass 1 — global max second (one aggregate); pass 2 —
    user-bucketed combine emits bucket-local (dimension, grid value,
    users) histogram rows (additive; bounded); driver folds cuts;
    pass 3 — the same combine re-runs with the three bounded cut maps
    broadcast, emitting (r, f, m, users) cell partials. Result-sized →
    DataFrame."""
    import math

    from ray.data.aggregate import Max, Sum

    from .combine import bucketed_combine

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def secs(t: pa.Table) -> pa.Table:
        s = t["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        return pa.table({"s": pa.array(s, pa.int64())})

    tmax_df = (ds.map_batches(secs, batch_format="pyarrow",
                              batch_size=65536)
               .aggregate(Max("s")))
    if not tmax_df or tmax_df.get("max(s)") is None:
        return typed_empty(r="int64", f="int64", m="int64",
                           n_users="int64")
    tmax = int(tmax_df["max(s)"])

    def per_user_partial(t: pa.Table) -> pa.Table:
        s = t["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "last": s,
            "n": np.ones(len(s), np.int64),
            "qv": _cents(t["value"].to_numpy())})
        g = (df.groupby("user_id", as_index=False)
             .agg(last=("last", "max"), n=("n", "sum"),
                  qv=("qv", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    def user_triples(g: pd.DataFrame) -> pd.DataFrame:
        u = (g.groupby("user_id", as_index=False)
             .agg(last=("last", "max"), n=("n", "sum"), qv=("qv", "sum")))
        u["rg"] = ((tmax - u["last"].to_numpy(np.int64)) // 86400
                   ).astype(np.int64)
        u["fg"] = u["n"].astype(np.int64)
        # math.log per user: libm == DuckDB ln (np.log is not)
        u["mg"] = np.fromiter(
            (math.floor(RFM_MGRID * math.log(1.0 + float(q)))
             for q in u["qv"].to_numpy(np.int64)),
            np.int64, count=len(u))
        return u[["user_id", "rg", "fg", "mg"]]

    # two consumers (histogram pass + cell pass): pin the slim 4-int
    # partial rows once instead of re-reading events per pass
    counts = ds.map_batches(per_user_partial, batch_format="pyarrow",
                            batch_size=65536).materialize()

    def hists(g: pd.DataFrame) -> pd.DataFrame:
        u = user_triples(g)
        frames = []
        for dim, col in (("r", "rg"), ("f", "fg"), ("m", "mg")):
            h = (u.groupby(col).size().rename_axis("v")
                 .reset_index(name="k"))
            h["dim"] = dim
            frames.append(h[["dim", "v", "k"]])
        out = pd.concat(frames, ignore_index=True)
        out["v"] = out["v"].astype(np.int64)
        out["k"] = out["k"].astype(np.int64)
        return out

    hdf = (bucketed_combine(counts, "user_id", hists).to_pandas()
           .groupby(["dim", "v"], as_index=False)["k"].sum())
    if hdf.empty:
        return typed_empty(r="int64", f="int64", m="int64",
                           n_users="int64")

    def tercile_map(h: pd.DataFrame, asc: bool) -> dict:
        # tercile 1 = the "best" third: most recent (ascending recency
        # days), most frequent / highest monetary (descending value).
        # The cut tests the BEFORE-cumulative (3·cum_before ≥ q·n), so a
        # tie group containing a boundary takes the BETTER tercile — a
        # single dominant group (everyone active the same day) reads as
        # tercile 1, not 3.
        h = h.sort_values("v", ascending=asc, kind="mergesort")
        k = h["k"].to_numpy(np.int64)
        cumb = np.cumsum(k) - k
        n = int(k.sum())
        t = 1 + (3 * cumb >= n).astype(np.int64) \
            + (3 * cumb >= 2 * n).astype(np.int64)
        return dict(zip((int(x) for x in h["v"]), (int(x) for x in t)))

    rmap = tercile_map(hdf[hdf["dim"] == "r"], asc=True)
    fmap = tercile_map(hdf[hdf["dim"] == "f"], asc=False)
    mmap = tercile_map(hdf[hdf["dim"] == "m"], asc=False)

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        u = user_triples(g)
        out = pd.DataFrame({
            "r": u["rg"].map(rmap).astype(np.int64),
            "f": u["fg"].map(fmap).astype(np.int64),
            "m": u["mg"].map(mmap).astype(np.int64),
            "n_users": np.ones(len(u), np.int64)})
        return out.groupby(["r", "f", "m"], as_index=False).sum()

    parts = bucketed_combine(counts, "user_id", cells).to_pandas()
    df = (parts.groupby(["r", "f", "m"], as_index=False)["n_users"]
          .sum())
    for c in ("r", "f", "m", "n_users"):
        df[c] = df[c].astype(np.int64)
    return (df.sort_values(["r", "f", "m"]).reset_index(drop=True))


def q_user_concentration(sf_dir: str) -> pd.DataFrame:
    """Event-volume concentration across users: the 80/20 table — what
    share of all events the top-10%-most-active users generate, plus
    the Gini coefficient of per-user activity. The abuse/bot and
    sampling-bias read: a share near 1 means a handful of accounts ARE
    the corpus.

    EXACT via the bounded count HISTOGRAM (the q_token_cover device):
    only (events-per-user → #users) matters, users with equal counts
    are interchangeable, and the top-decile take is the all-integer
    partial tie-group walk ``ceil((need − users_above)·v)``; Gini folds
    tie-run integer rank sums (the q_gini_length formula). Histogram
    rows are bounded by the max per-user count, not the user count.

    Ray shape: per-batch user-count partials → one user-bucketed
    combine emitting bucket-local histograms (a user lives in exactly
    one bucket, so they are additive) → driver walks the bounded
    histogram. One-row output → DataFrame."""
    from .combine import bucketed_combine

    ds = _read(sf_dir, "events", ["user_id"])

    def cnts(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({"user_id": t["user_id"].to_numpy(
                               zero_copy_only=False).astype(np.int64),
                           "n": np.ones(t.num_rows, np.int64)})
             .groupby("user_id", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("user_id")["n"].sum()
        h = s.value_counts().rename_axis("v").reset_index(name="k")
        h["v"] = h["v"].astype(np.int64)
        h["k"] = h["k"].astype(np.int64)
        return h[["v", "k"]]

    parts = bucketed_combine(
        ds.map_batches(cnts, batch_format="pyarrow", batch_size=65536),
        "user_id", hist).to_pandas()
    if parts.empty:
        return typed_empty(n_users="int64", n_events="int64",
                           top10_users="int64", top10_events="int64",
                           top10_share="float64", gini="float64")
    h = (parts.groupby("v", as_index=False)["k"].sum()
         .sort_values("v", kind="mergesort"))
    v = [int(x) for x in h["v"]]              # Python ints: no overflow
    k = [int(x) for x in h["k"]]
    u, e = sum(k), sum(a * b for a, b in zip(v, k))
    need = (u + 9) // 10                      # ceil(U/10)
    # top-decile walk, descending count order
    top_events, users_seen = 0, 0
    for vi, ki in zip(reversed(v), reversed(k)):
        if users_seen + ki >= need:
            top_events += (need - users_seen) * vi
            break
        top_events += ki * vi
        users_seen += ki
    # Gini over users: ascending tie-run rank sums (q_gini_length)
    si, p = 0, 0
    for vi, ki in zip(v, k):
        si += vi * (ki * (p + 1) + ki * (ki - 1) // 2)
        p += ki
    gini = (0.0 if u * e == 0 else float(round_half_away(
        np.float64(2 * si - (u + 1) * e) / np.float64(u * e), 6)))
    out = pd.DataFrame({
        "n_users": pd.Series([u], dtype="int64"),
        "n_events": pd.Series([e], dtype="int64"),
        "top10_users": pd.Series([need], dtype="int64"),
        "top10_events": pd.Series([top_events], dtype="int64"),
        "top10_share": [float(round_half_away(
            np.float64(top_events) / np.float64(e), 6))],
        "gini": [gini]})
    return out


def q_anomaly_days(sf_dir: str) -> pd.DataFrame:
    """Daily-volume anomaly scan: per event type, the days whose event
    count sits more than 3σ from that type's mean daily count — the
    telemetry-pipeline data-quality tripwire (an ingest gap or a bot
    flood both land here before they poison downstream aggregates).

    EXACT via an ALL-INTEGER 3σ test: with D observed days, S = Σn,
    Q = Σn², the condition |n − S/D| > 3·σ rewrites as
    ``(n·D − S)² > 9·(D·Q − S²)`` — pure integer arithmetic, no float
    threshold anywhere in the decision. The reported z-score
    (|n·D − S| / √(D·Q − S²)) is display math on exact integers (libm
    sqrt, one division), rounded to 6.

    Ray shape: per-batch (type, day) count partials → one bounded
    groupby (types × observed days) → driver folds per-type moments and
    flags. Result-sized → DataFrame."""
    import math

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        s = t["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        day = (s // 86400).astype(np.int64)
        g = (pd.DataFrame({
                "event_type": t["event_type"].to_numpy(
                    zero_copy_only=False),
                "day": day, "n": np.ones(len(day), np.int64)})
             .groupby(["event_type", "day"], as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
          .groupby(["event_type", "day"])
          .aggregate(Sum("n", alias_name="n"))
          .to_pandas())                    # bounded: types × days
    if df.empty or "n" not in df.columns:
        return typed_empty(event_type="object", day="int64", n="int64",
                           z="float64")
    rows = []
    for et, g in df.groupby("event_type", sort=True):
        ns = [int(x) for x in g["n"]]          # Python ints: no overflow
        dd, sn, qn = len(ns), sum(ns), sum(x * x for x in ns)
        var_q = dd * qn - sn * sn
        for day, n in zip(g["day"], ns):
            dev = n * dd - sn
            if dev * dev > 9 * var_q:          # all-integer 3σ test
                z = round_half_away(np.float64(
                    abs(float(dev)) / math.sqrt(float(var_q))), 6)
                rows.append((et, int(day), n, float(z)))
    if not rows:
        return typed_empty(event_type="object", day="int64", n="int64",
                           z="float64")
    out = pd.DataFrame(rows, columns=["event_type", "day", "n", "z"])
    for c in ("day", "n"):
        out[c] = out[c].astype(np.int64)
    return (out.sort_values(["event_type", "day"])
            .reset_index(drop=True))


def q_session_hist(sf_dir: str) -> pd.DataFrame:
    """Session-depth histogram: for each session length (events per
    session), how many sessions have it and their mean duration — the
    engagement-shape table (a depth-1 spike is bounce traffic, a long
    tail is power users) product analytics derives from sessionization.

    EXACT: rides the proven ``q_sessionize`` bucketed-window chain
    (sessions resolve whole inside a user bucket); the histogram folds
    integer (n_sessions, duration) partials per depth; ONE double
    division per output row. Histogram rows are bounded by the maximum
    session depth, not the corpus.

    Ray shape: the sessionize stream → per-batch (depth, 2-int)
    partials → one bounded groupby. Result-sized → DataFrame."""
    ds = q_sessionize(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({
                "n_events": t["n_events"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "c": np.ones(t.num_rows, np.int64),
                "dur": t["duration_s"].to_numpy(zero_copy_only=False)
                .astype(np.int64)})
             .groupby("n_events", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
          .groupby("n_events")
          .aggregate(Sum("c", alias_name="n_sessions"),
                     Sum("dur", alias_name="dur"))
          .to_pandas())                     # ≤ max-depth rows
    if df.empty or "n_sessions" not in df.columns:
        return typed_empty(n_events="int64", n_sessions="int64",
                           mean_duration_s="float64")
    for c in ("n_events", "n_sessions", "dur"):
        df[c] = df[c].astype(np.int64)
    df["mean_duration_s"] = _r(df["dur"].astype(np.float64)
                               / df["n_sessions"].astype(np.float64), 6)
    return (df[["n_events", "n_sessions", "mean_duration_s"]]
            .sort_values("n_events").reset_index(drop=True))


# --- rolling distinct: daily active users + 7-day window -----------------------

DAU_WINDOW_DAYS = 7


def q_rolling_dau(sf_dir: str) -> pd.DataFrame:
    """Daily active users and 7-day rolling distinct users per day — the
    retention-report shape: a windowed COUNT DISTINCT, which no single
    Ray Data primitive expresses.

    Scale form: reduce events to distinct ``(day, user)`` pairs per batch
    (the only corpus-sized stage, a per-batch combiner), explode each pair
    to the ≤ 7 window-end days it covers, then ONE ``groupby(day)`` whose
    group count is bounded by the time range (days, not users), so the
    per-group ``np.unique`` distinct count is exact and the group fan-in
    holds at any corpus size. Days beyond the observed range are dropped by
    an O(days) result-class filter. The global cross-batch pair dedup is
    NOT materialized — duplicate (day, user) pairs surviving the per-batch
    combiner are removed by the same per-group ``np.unique``."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def explode_pairs(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.int64()).to_numpy() // 86_400_000_000)
        user = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.unique(np.stack([day, user], axis=1), axis=0)
        d, u = pairs[:, 0], pairs[:, 1]
        k = len(d)
        off = np.tile(np.arange(DAU_WINDOW_DAYS, dtype=np.int64), k)
        return pa.table({
            "day": pa.array(np.repeat(d, DAU_WINDOW_DAYS) + off),
            "user_id": pa.array(np.repeat(u, DAU_WINDOW_DAYS)),
            "is_today": pa.array(off == 0),
        })

    def per_day(g: pd.DataFrame) -> pd.DataFrame:
        users = g["user_id"].to_numpy(np.int64)
        today = g["is_today"].to_numpy(bool)
        return pd.DataFrame({
            "day": [np.int64(g["day"].iloc[0])],
            "dau": [np.int64(len(np.unique(users[today])))],
            "dau_7d": [np.int64(len(np.unique(users)))]})

    df = (ds.map_batches(explode_pairs, batch_format="pyarrow",
                         batch_size=65536)
            .groupby("day").map_groups(per_day, batch_format="pandas")
            .to_pandas())
    if df.empty:
        return typed_empty(day="int64", dau="int64", dau_7d="int64")
    # the explode creates up to 6 trailing days past the last observed day;
    # real days are exactly those with dau > 0 ... except a day can exist in
    # the window of earlier days while having no events itself — the oracle
    # (days dimension = DISTINCT event days) keeps only days WITH events.
    df = df[df["dau"] > 0]
    for c in ("day", "dau", "dau_7d"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values("day").reset_index(drop=True)


# --- range join: events in a bounded window before each order ------------------

RANGE_JOIN_WINDOW_S = 7 * 86400   # [orderdate - 7d, orderdate)
_RJ_SHIFT = np.int64(1) << np.int64(34)   # composite (key, sec) sort key


def q_events_before_order(sf_dir: str) -> Dataset:
    """Bounded-interval RANGE join (orders ⟕range events): per order, the
    count and value sum of the customer's events in the 7 days before the
    order date. Distinct from the as-of join (one nearest row) — every
    order matches a *window* of rows, the shape behind feature windows and
    attribution joins.

    Ray Data has no range join; a naive equi-join on the customer followed
    by a predicate filter would materialize |events per user| × |orders per
    user| rows before dropping most of them. The scale form is the same
    bucketed co-group as the as-of join (one shuffle on
    ``bucket = key & (NB-1)``, both sides union-tagged into a common
    schema), then a fully vectorized window probe per bucket: events sorted
    once by a composite ``key·2³⁴ + sec`` int64, each order's window is two
    ``searchsorted``s, counts are index differences and sums one
    ``np.add.reduceat`` — no per-order Python, no pair blowup."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    nb = _asof_buckets()   # driver-derived, captured by both tag closures

    def tag_events(t: pa.Table) -> pa.Table:
        key = t["user_id"].cast(pa.int64())
        return pa.table({
            "key": key,
            "bucket": pc.bit_wise_and(key, nb - 1),
            "sec": pc.divide(t["ts"].cast(pa.int64()), 1_000_000),
            "oid": pa.nulls(t.num_rows, pa.int64()),
            # integer cents carried in float64 (union schema unchanged):
            # every partial sum is an exact integer below 2^53
            "value": pa.array(_cents(
                t["value"].to_numpy(zero_copy_only=False))
                .astype(np.float64)),
        })

    def tag_orders(t: pa.Table) -> pa.Table:
        key = t["o_custkey"].cast(pa.int64())
        return pa.table({
            "key": key,
            "bucket": pc.bit_wise_and(key, nb - 1),
            "sec": pc.divide(t["o_orderdate"].cast(pa.int64()), 1_000_000),
            "oid": t["o_orderkey"].cast(pa.int64()),
            "value": pa.nulls(t.num_rows, pa.float64()),
        })

    unioned = (ev.map_batches(tag_events, batch_format="pyarrow")
                 .union(od.map_batches(tag_orders, batch_format="pyarrow")))

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        is_order = g["oid"].notna().to_numpy()
        e = g[~is_order].sort_values(["key", "sec"], kind="mergesort")
        comp_e = (e["key"].to_numpy(np.int64) * _RJ_SHIFT
                  + e["sec"].to_numpy(np.int64))
        ve = e["value"].to_numpy(np.float64)
        o = g[is_order]
        comp_o = o["key"].to_numpy(np.int64) * _RJ_SHIFT
        sec_o = o["sec"].to_numpy(np.int64)
        lo = np.searchsorted(comp_e, comp_o + sec_o - RANGE_JOIN_WINDOW_S)
        hi = np.searchsorted(comp_e, comp_o + sec_o)   # strictly before
        n = hi - lo
        if len(ve):
            idx = np.empty(2 * len(n), np.int64)
            idx[0::2], idx[1::2] = lo, hi
            sums = np.add.reduceat(np.append(ve, 0.0), idx)[0::2]
        else:
            sums = np.zeros(len(n), np.float64)
        sums[n == 0] = 0.0   # reduceat yields a[lo] for empty windows
        return pd.DataFrame({
            "o_orderkey": o["oid"].to_numpy(np.int64),
            "n_events": n.astype(np.int64),
            "sum_value": _r(pd.Series(sums / 100.0), 4).to_numpy()})

    # one row per order — corpus-sized: hand back a streaming Dataset
    return ensure_schema(
        unioned.groupby("bucket").map_groups(probe, batch_format="pandas"),
        pa.schema([("o_orderkey", pa.int64()), ("n_events", pa.int64()),
                   ("sum_value", pa.float64())]))


# --- as-of join: latest order per event ---------------------------------------

ASOF_SALTS = 8
ASOF_HOT_THRESHOLD = 50_000  # events per key before its bucket is split


def q_asof_last_order(sf_dir: str, salt_hot_keys: bool = False,
                      hot_threshold: int = ASOF_HOT_THRESHOLD,
                      n_salts: int = ASOF_SALTS) -> Dataset:
    """As-of join (events ⨝asof orders): for each event, the customer's most
    recent order with ``o_orderdate <= ts`` (ties on the date broken by max
    ``o_totalprice``, matching the SQL oracle's deterministic tiebreak).

    Ray Data has no as-of join; the scale form is the *co-grouped merge*:
    tag both sides with a common schema, union, one shuffle on
    ``(bucket = hash(key) % NB, salt)`` (many keys per bucket — a raw
    per-key groupby costs one Ray group invocation per key, which dominated
    wall time), then one vectorized ``pd.merge_asof(by=key)`` per bucket.
    Within-key order is computed locally, never globally (same partitioning
    contract as sessionize).

    ``salt_hot_keys=True`` adds the skew defense: a cheap count pass finds
    keys with more than ``hot_threshold`` events (the sliver is O(hot keys)
    by construction), a hot key's EVENTS spread over ``n_salts`` sub-groups
    by ``splitmix64(event_id)`` while its ORDERS replicate into every salt —
    each (key, salt) group still sees all of the key's orders, so the merge
    is exact, but no single group carries more than ~1/n_salts of a hot
    key's rows. Off by default: the probe pass costs one extra aggregate,
    worth paying only when a key can exceed a worker's group budget.
    """
    from .dedup import _fmix64

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

    nb = _asof_buckets()   # driver-derived, captured by both tag closures
    hot_ref = None
    if salt_hot_keys:
        def key_counts(t: pa.Table) -> pa.Table:
            k = t["user_id"].to_numpy(zero_copy_only=False)
            uniq, cnt = np.unique(k, return_counts=True)
            return pa.table({"key": pa.array(uniq, pa.int64()),
                             "n": pa.array(cnt.astype(np.int64))})

        hot_df = (ev.map_batches(key_counts, batch_format="pyarrow",
                                 batch_size=65536)
                  .groupby("key").aggregate(Sum("n", alias_name="n"))
                  .filter(expr=f"n > {int(hot_threshold)}")
                  .to_pandas())
        hot_ref = ray.put(np.sort(hot_df["key"].to_numpy(np.int64))
                          if len(hot_df) else np.array([], np.int64))

    def _is_hot(keys: np.ndarray) -> np.ndarray:
        hot = ray.get(hot_ref)
        if not len(hot):
            return np.zeros(len(keys), bool)
        pos = np.minimum(np.searchsorted(hot, keys), len(hot) - 1)
        return hot[pos] == keys

    def tag_events(t: pa.Table) -> pa.Table:
        key = t["user_id"].cast(pa.int64())
        if hot_ref is None:
            salt = pa.array(np.zeros(t.num_rows, np.int64))
        else:
            k = key.to_numpy(zero_copy_only=False)
            eid = t["event_id"].to_numpy(zero_copy_only=False)
            salt_v = np.where(
                _is_hot(k),
                (_fmix64(eid.astype(np.uint64))
                 % np.uint64(n_salts)).astype(np.int64),
                0)
            salt = pa.array(salt_v)
        return pa.table({
            "key": key,
            "bucket": pc.bit_wise_and(key, nb - 1),
            "salt": salt,
            "t_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"].cast(pa.int64()),
            "price": pa.nulls(t.num_rows, pa.float64()),
        })

    def tag_orders(t: pa.Table) -> pa.Table:
        key = t["o_custkey"].cast(pa.int64())
        n = t.num_rows
        if hot_ref is None:
            salt_v = np.zeros(n, np.int64)
            tt = t  # no replication needed — skip the take copy
        else:
            # hot keys' orders replicate into every salt so each (key, salt)
            # group holds the key's FULL order history
            k = key.to_numpy(zero_copy_only=False)
            hot = _is_hot(k)
            reps = np.where(hot, n_salts, 1)
            idx = np.repeat(np.arange(n), reps)
            salt_v = np.concatenate([np.arange(r, dtype=np.int64)
                                     for r in reps]) if n else np.array(
                                         [], np.int64)
            tt = t.take(pa.array(idx))
        keyr = tt["o_custkey"].cast(pa.int64())
        return pa.table({
            "key": keyr,
            "bucket": pc.bit_wise_and(keyr, nb - 1),
            "salt": pa.array(salt_v),
            "t_us": tt["o_orderdate"].cast(pa.int64()),
            "event_id": pa.nulls(len(tt), pa.int64()),
            "price": tt["o_totalprice"].cast(pa.float64()),
        })

    both = ev.map_batches(tag_events, batch_format="pyarrow").union(
        od.map_batches(tag_orders, batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        is_event = g["price"].isna()
        # Orders sorted by (t_us, price): merge_asof takes the LAST match in
        # sort order, so equal-date ties resolve to max price — the oracle's
        # (o_orderdate DESC, o_totalprice DESC) row_number()=1 tiebreak.
        orders = (g[~is_event]
                  .sort_values(["t_us", "price"], kind="mergesort")
                  [["key", "t_us", "price", "order_t_us"]])
        events = (g[is_event]
                  .sort_values("t_us", kind="mergesort")
                  [["key", "t_us", "event_id"]])
        empty = pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                              "user_id": pd.Series([], dtype=np.int64),
                              "last_order_s": pd.Series([], dtype=np.int64),
                              "last_order_price": pd.Series([], dtype=np.float64)})
        if orders.empty or events.empty:
            return empty
        m = pd.merge_asof(events, orders, on="t_us", by="key",
                          direction="backward", suffixes=("", "_o"))
        # merge_asof keeps the event's own t_us; recover the matched order's
        # timestamp by joining back positionally is unnecessary — instead
        # carry it as a data column on the order side.
        m = m.dropna(subset=["price"])
        if m.empty:
            return empty
        return pd.DataFrame({
            "event_id": m["event_id"].to_numpy().astype(np.int64),
            "user_id": m["key"].to_numpy().astype(np.int64),
            "last_order_s": (m["order_t_us"].to_numpy().astype(np.int64)
                             // 1_000_000),
            "last_order_price": m["price"].to_numpy(),
        })

    def add_order_ts(t: pa.Table) -> pa.Table:
        # Duplicate the order timestamp as a payload column so merge_asof
        # (which drops the right side's "on" column) still reports it.
        if "order_t_us" in t.column_names:
            return t
        is_order = pc.is_valid(t["price"])
        order_ts = pc.if_else(is_order, t["t_us"], pa.scalar(None, pa.int64()))
        return t.append_column("order_t_us", order_ts)

    # Coalesce the union's many small blocks before the sort-based groupby:
    # the shuffle's sample+exchange task count grows with input block count,
    # and 128 tiny blocks cost ~4x more than 32 right-sized ones. (At real
    # scale blocks are already target_max_block_size-full and this coalesce
    # is a no-op choice, not a semantic one.)
    # Streaming result (one row per event = corpus-sized).
    return ensure_schema(
        both.map_batches(add_order_ts, batch_format="pyarrow")
            .repartition(32)
            .groupby(["bucket", "salt"])
            .map_groups(merge, batch_format="pandas"),
        pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                   ("last_order_s", pa.int64()),
                   ("last_order_price", pa.float64())]))


# --- range join: trailing-window self-join on events --------------------------

RANGE_WINDOW_US = 3_600_000_000  # 1 hour


def q_range_window_events(sf_dir: str) -> Dataset:
    """Range (interval) join: for each event, the count and value-sum of the
    SAME user's events with ``ts ∈ [ts - 1h, ts]`` (inclusive, so every
    event matches at least itself).

    Ray Data has no range join; the scale form reuses the as-of join's
    partitioning contract — one shuffle on ``bucket = user_id & (NB-1)``,
    then everything vectorized per bucket. The windowed aggregate is
    computed as a prefix-sum difference F(hi) − F(lo): give each (user, ts)
    row its per-user rank and running value cumsum, then two
    ``pd.merge_asof`` probes — ``hi`` at ``ts`` (exact matches in) and
    ``lo`` at ``ts − 1h`` (exact matches OUT, i.e. the last row strictly
    before the window) — so each event's window aggregate is two O(log n)
    lookups, never an expanded pair list. Equal-timestamp ties all share
    the last tie's rank, matching SQL's inclusive BETWEEN semantics
    exactly. Hot users could be salted on the probe side only, as
    documented for the as-of join."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    nb = _asof_buckets()

    def tag(t: pa.Table) -> pa.Table:
        key = t["user_id"].cast(pa.int64())
        return pa.table({
            "key": key,
            "bucket": pc.bit_wise_and(key, nb - 1),
            "t_us": t["ts"].cast(pa.int64()),
            "event_id": t["event_id"].cast(pa.int64()),
            "qv": pa.array(_cents(
                t["value"].to_numpy(zero_copy_only=False))),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ranked = g.sort_values(["key", "t_us"], kind="mergesort")
        grp = ranked.groupby("key", sort=False)
        ranked = ranked.assign(rank=grp.cumcount() + 1,
                               csum=grp["qv"].cumsum())
        right = (ranked[["key", "t_us", "rank", "csum"]]
                 .sort_values("t_us", kind="mergesort"))
        probe = g.sort_values("t_us", kind="mergesort")[
            ["key", "t_us", "event_id"]]
        hi = pd.merge_asof(probe, right, on="t_us", by="key",
                           direction="backward", allow_exact_matches=True)
        lo_probe = probe.assign(t_us=probe["t_us"] - RANGE_WINDOW_US)
        lo = pd.merge_asof(lo_probe.sort_values("t_us", kind="mergesort"),
                           right, on="t_us", by="key",
                           direction="backward", allow_exact_matches=False)
        lo = lo.set_index("event_id").reindex(hi["event_id"])
        n = (hi["rank"].to_numpy()
             - lo["rank"].fillna(0).to_numpy()).astype(np.int64)
        # csum is an exact int64 cumsum of cent-grid values; the NaN
        # fill after reindex makes it float64, but the integers stay
        # exact below 2^53, so the difference is exact and ONE division
        # converts to dollars
        s = hi["csum"].to_numpy() - lo["csum"].fillna(0.0).to_numpy()
        return pd.DataFrame({
            "event_id": hi["event_id"].to_numpy().astype(np.int64),
            "user_id": hi["key"].to_numpy().astype(np.int64),
            "n_recent": n,
            "sum_recent_value": round_half_away(s / 100.0, 4),
        })

    # Streaming result (one row per event = corpus-sized).
    return ensure_schema(
        ev.map_batches(tag, batch_format="pyarrow")
          .repartition(32)
          .groupby("bucket")
          .map_groups(merge, batch_format="pandas"),
        pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                   ("n_recent", pa.int64()),
                   ("sum_recent_value", pa.float64())]))


# --- top-k per group (window row_number <= k) ---------------------------------

TOPK_PER_CUST = 3


def q_topk_per_group(sf_dir: str) -> Dataset:
    """Top-3 orders per customer by (o_totalprice desc, o_orderkey asc) with
    dense rank — the windowed top-k operator. Scale pattern: a per-batch
    *partial* top-k combiner keeps ≤k rows per key per batch, so the
    ``groupby(o_custkey)`` shuffle moves O(k · keys-per-batch · n_batches)
    rows instead of the whole orders table; the per-group final pass ranks
    the survivors."""
    k = TOPK_PER_CUST
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def local_topk(t: pa.Table) -> pa.Table:
        # Vectorized per-block combiner: one sort + groupby-head over the
        # whole block (NOT one call per key — a per-group map_groups here
        # costs one pandas invocation per customer and dominated wall time).
        df = t.to_pandas()
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True], kind="mergesort")
        return pa.Table.from_pandas(df.groupby("o_custkey").head(k),
                                    preserve_index=False)

    # Tree-reduce: each combiner round keeps <=k rows per key per block and
    # the repartition merges blocks, so survivors shrink geometrically toward
    # k rows per key = the size of the query's own output; the final exact
    # rank is one bucketed shuffle over those survivors.
    pruned = (ds.map_batches(local_topk, batch_format="pyarrow",
                             batch_size=65536)
                .repartition(32)
                .map_batches(local_topk, batch_format="pyarrow"))

    nb = _asof_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.bit_wise_and(t["o_custkey"].cast(pa.int64()),
                                      nb - 1))

    def final_rank(g: pd.DataFrame) -> pd.DataFrame:
        # many keys per bucket: one Ray group invocation covers ~customers/NB
        # keys, all ranked in one vectorized pandas pass
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="mergesort")
        g = g.groupby("o_custkey").head(k)
        rnk = (g.groupby("o_custkey").cumcount() + 1).to_numpy()
        return pd.DataFrame({
            "o_custkey": g["o_custkey"].to_numpy().astype(np.int64),
            "rnk": rnk.astype(np.int64),
            "o_orderkey": g["o_orderkey"].to_numpy().astype(np.int64),
            "o_totalprice": g["o_totalprice"].to_numpy()})

    # Streaming result: groups x k rows scale with the corpus — the final
    # per-key rank runs as ONE bucketed shuffle over the pruned survivors,
    # never a driver merge.
    return ensure_schema(
        pruned.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(final_rank, batch_format="pandas"),
        pa.schema([("o_custkey", pa.int64()), ("rnk", pa.int64()),
                   ("o_orderkey", pa.int64()),
                   ("o_totalprice", pa.float64())]))


# --- rolling window average (ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW) ------

ROLL_WINDOW = 4


def q_rolling_avg(sf_dir: str) -> Dataset:
    """Per-user rolling mean of ``value`` over the last 4 events (current +
    3 preceding, ordered by ts then event_id) — the ROWS-frame window
    aggregate. Partitioning: one shuffle on ``bucket = user_id & (NB-1)``
    (many users per bucket — per-key map_groups costs one Ray invocation
    per user), then a vectorized pandas ``groupby(user).rolling`` inside
    the bucket; within-key order established locally, never a global sort.
    Rounding is half-away to match the SQL oracle."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = g.assign(qv=_cents(g["value"].to_numpy()))
        grp = g.groupby("user_id", sort=False)["qv"]
        rs = (grp.rolling(ROLL_WINDOW, min_periods=1).sum()
              .reset_index(drop=True))
        rn = (grp.rolling(ROLL_WINDOW, min_periods=1).count()
              .reset_index(drop=True))
        # exact integer window sums (cents in float64), ONE division chain
        avg = rs / 100.0 / rn
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy().astype(np.int64),
            "user_id": g["user_id"].to_numpy().astype(np.int64),
            "roll_avg_value": _r(avg, 6).to_numpy(),
        })

    # Streaming result (one row per event = corpus-sized).
    return ensure_schema(
        ds.map_batches(_user_bucketizer(), batch_format="pyarrow")
          .groupby("bucket")
          .map_groups(roll, batch_format="pandas"),
        pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                   ("roll_avg_value", pa.float64())]))


# --- exact per-group quantiles ------------------------------------------------

def q_group_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact p50/p90 of o_totalprice per o_orderpriority (continuous
    interpolation, matching DuckDB ``quantile_cont``). With ~5 heavy groups
    this is the *few-hot-keys* shape: the scale form keeps only the column
    being ranked in the shuffle (one float per row) and — past ~10^9 rows
    per group — would switch to a fixed-width histogram / t-digest sketch
    merged on the driver; at bench scale the exact per-group sort is both
    cheaper and oracle-exact, so the sketch path is documented, not used."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def quants(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["o_totalprice"].to_numpy(dtype=np.float64))
        p50, p90 = np.quantile(v, [0.5, 0.9], method="linear")
        return pd.DataFrame({
            "o_orderpriority": [g["o_orderpriority"].iloc[0]],
            "n_orders": np.array([len(v)], np.int64),
            "p50_price": _r(pd.Series([p50]), 2).to_numpy(),
            "p90_price": _r(pd.Series([p90]), 2).to_numpy(),
        })

    df = (ds.groupby("o_orderpriority")
            .map_groups(quants, batch_format="pandas")
            .to_pandas())
    if df.empty:
        return typed_empty(o_orderpriority="object", n_orders="int64",
                           p50_price="float64", p90_price="float64")
    return df.sort_values("o_orderpriority").reset_index(drop=True)


# --- anti join: customers inactive since a cutoff -----------------------------

INACTIVE_CUTOFF = np.datetime64("1998-09-01", "us")


def q_inactive_customers(sf_dir: str) -> pd.DataFrame:
    """Customers with NO order on/after the cutoff date — a distributed
    left-anti hash join (``Dataset.join(join_type="left_anti")``).

    Scale shape: the probe side is reduced before the join — per-batch
    distinct ``o_custkey`` so the shuffle moves at most one row per
    (customer, batch) instead of every order. At 100 TB both sides stay
    distributed (hash-partitioned by key); nothing is broadcast or
    materialized on the driver until the (small, filtered) result."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def recent_custkeys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_orderdate"],
                                      pa.scalar(INACTIVE_CUTOFF)))
        keys = pc.unique(t["o_custkey"])
        return pa.table({"o_custkey": keys})

    active = orders.map_batches(recent_custkeys, batch_format="pyarrow",
                                batch_size=65536)
    # Empty-side guards: the hash-join aggregator cannot resolve key fields
    # on a zero-block side (count() on parquet is metadata-only, no scan).
    if cust.count() == 0:
        return typed_empty(c_custkey="int64", c_name="object",
                           c_mktsegment="object", c_acctbal="float64")
    if orders.count() == 0:
        df = cust.to_pandas()
    else:
        df = (cust.join(active, join_type="left_anti",
                        num_partitions=scale.join_partitions(0.25),
                        on=("c_custkey",), right_on=("o_custkey",))
                  .to_pandas())
    if df.empty:
        return typed_empty(c_custkey="int64", c_name="object",
                           c_mktsegment="object", c_acctbal="float64")
    df["c_acctbal"] = _r(df["c_acctbal"], 2)
    return (df[["c_custkey", "c_name", "c_mktsegment", "c_acctbal"]]
            .sort_values("c_custkey").reset_index(drop=True))


# --- lag window: inter-event gap statistics per user ---------------------------

def q_user_gaps(sf_dir: str) -> Dataset:
    """Per-user inter-event gap statistics (the LAG window): events sorted by
    (ts, event_id) within each user, gap = seconds since the previous event,
    reporting count / max gap / mean gap per user with ≥ 2 events.

    Same partitioning shape as q_sessionize: ``groupby(user_id)`` is the only
    shuffle and each group's window runs vectorized (``diff`` over floored
    epoch seconds). Output is one row per user — tiny relative to input."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        # bucketed multi-user window (one Ray group call per bucket, not per
        # user): sort by (user, ts, event_id), diff floored epoch seconds,
        # mask the user boundaries, then one vectorized per-user aggregate
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        # floor to whole epoch seconds BEFORE the diff, matching the SQL
        # oracle's lag over floor(epoch(ts))
        sec = (g["ts"].astype("int64") // 1_000_000).to_numpy()
        uid = g["user_id"].to_numpy(np.int64)
        gap = np.diff(sec).astype(np.float64)
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame({"user_id": uid[1:][same], "gap": gap[same]})
        out = (df.groupby("user_id", as_index=False)
               .agg(n_gaps=("gap", "size"), max_gap_s=("gap", "max"),
                    avg_gap_s=("gap", "mean")))
        out["n_events"] = (out["n_gaps"] + 1).astype(np.int64)
        out["max_gap_s"] = out["max_gap_s"].astype(np.int64)
        out["avg_gap_s"] = _r(out["avg_gap_s"], 6)
        return out[["user_id", "n_events", "max_gap_s", "avg_gap_s"]]

    # Streaming result (one row per user scales with the corpus).
    return ensure_schema(
        ds.map_batches(_user_bucketizer(), batch_format="pyarrow")
          .groupby("bucket").map_groups(gaps, batch_format="pandas"),
        pa.schema([("user_id", pa.int64()), ("n_events", pa.int64()),
                   ("max_gap_s", pa.int64()), ("avg_gap_s", pa.float64())]))


# --- per-user LAG/LEAD (neighbor-row window) -----------------------------------

def q_lead_lag(sf_dir: str) -> Dataset:
    """Per-event previous/next value within the user's (ts, event_id) order —
    the LAG/LEAD window pair as one bucketed co-grouped window: a single
    shuffle on ``bucket = user_id & (NB-1)``, then a vectorized multi-user
    shift inside the bucket (plain ``shift(±1)`` masked where the sorted
    user column changes — no per-user group calls). Boundary rows get NULL,
    matching SQL LAG/LEAD defaults. Output is corpus-sized (one row per
    event) → streaming Dataset."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def shifts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same_prev = g["user_id"].eq(g["user_id"].shift())
        same_next = g["user_id"].eq(g["user_id"].shift(-1))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "prev_value": g["value"].shift().where(same_prev).to_numpy(),
            "next_value": g["value"].shift(-1).where(same_next).to_numpy()})

    return ensure_schema(
        ds.map_batches(_user_bucketizer(), batch_format="pyarrow")
          .groupby("bucket").map_groups(shifts, batch_format="pandas"),
        pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                   ("prev_value", pa.float64()), ("next_value", pa.float64())]))


# --- events: hopping (sliding) window aggregate -------------------------------

HOP_S = 600          # window start every 10 min
HOP_WINDOW_S = 1800  # each window spans 30 min => every event in 3 windows


def q_events_hopping(sf_dir: str) -> Dataset:
    """Hopping-window aggregate (window 30 min, hop 10 min): every event
    contributes to exactly ``HOP_WINDOW_S // HOP_S`` overlapping windows.

    Dataflow: the window replication is a *vectorized in-map explode* (3
    rows per event built with numpy tile/repeat — never a join against a
    window table), partial-aggregated per batch, so the only shuffle is the
    final combine. The read is split (row ranges, no repartition shuffle)
    because the 3× explode makes this the heaviest per-batch stage of the
    events family — a single-file single-block read serializes it (measured
    7.6 s → 4.3 s at sf0.1).

    The final combine is BUCKETED (``groupby(bucket)`` + one vectorized
    pandas combine per bucket), not ``groupby(event_type, win_start)``:
    Ray's sort-based aggregate pays ~0.4 ms of per-group Python per key,
    which at the hopping window's key cardinality (21.6k windows at sf0.1)
    was 7 s of the query's 8.7 s wall — the same many-keys-per-group
    contract as sessionize, applied to an aggregate. Measured 8.7 s →
    ~2 s; exactness unchanged (bucket = splitmix64(win_start), every
    (type, window) pair lands whole in one bucket)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"],
                               override_num_blocks=scale.read_blocks())
    k = HOP_WINDOW_S // HOP_S

    def partial(t: pa.Table) -> pa.Table:
        sec = t["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        base = sec // HOP_S  # hop index containing the event
        # window starts: (base - i) * HOP_S for i in 0..k-1
        starts = ((np.repeat(base, k)
                   - np.tile(np.arange(k, dtype=np.int64), len(base)))
                  * HOP_S)
        df = pd.DataFrame({
            "event_type": np.repeat(
                t["event_type"].to_numpy(zero_copy_only=False), k),
            "win_start": starts,
            "qv": np.repeat(_cents(t["value"].to_numpy()), k)})
        g = df.groupby(["event_type", "win_start"], as_index=False).agg(
            n=("qv", "size"), qv=("qv", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["event_type", "win_start"], as_index=False)
                .agg(n=("n", "sum"), qv=("qv", "sum")))
        out["n"] = out["n"].astype(np.int64)
        return out[["event_type", "win_start", "n", "qv"]]

    from .combine import bucketed_combine

    out = bucketed_combine(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "win_start", combine)

    def finish(t: pa.Table) -> pa.Table:  # row-local round/cast, streamed
        return pa.table({
            "event_type": t["event_type"],
            "win_start": t["win_start"].cast(pa.int64()),
            "n": t["n"].cast(pa.int64()),
            "sum_value": pa.array(round_half_away(
                t["qv"].to_numpy(zero_copy_only=False) / 100.0, 4),
                pa.float64())})

    # Streaming result (window count grows with the time span).
    return ensure_schema(
        out.map_batches(finish, batch_format="pyarrow"),
        pa.schema([("event_type", pa.string()), ("win_start", pa.int64()),
                   ("n", pa.int64()), ("sum_value", pa.float64())]))


# --- TPC-H Q5-style multi-way star join ---------------------------------------

Q5_REGION = "EUROPE"
Q5_D0 = np.datetime64("1996-01-01", "us")
Q5_D1 = np.datetime64("1998-01-01", "us")


def q5_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """Revenue per nation from lineitems where supplier and customer share
    the nation (TPC-H Q5 shape): region → nation → {customer, supplier}
    dimension chain + the orders⋈lineitem fact-to-fact equijoin.

    Scale shape: the dimension chain (region, nation, supplier — bounded
    size classes) is broadcast; the customer-side nation is attached by a
    DISTRIBUTED hash join orders⋈customer (both unbounded at corpus scale —
    never broadcast), then lineitem joins the surviving orders. Revenue is
    partial-aggregated per batch before the final 25-row nation groupby, and
    the same-nation predicate (s_nationkey == c_nationkey) is applied
    row-locally in the map, so the shuffles carry only pruned int/float
    columns."""
    # dimension chain: region -> nation keys/names -> supplier nation map
    nat = collect_table(_read(sf_dir, "nation",
                              ["n_nationkey", "n_name", "n_regionkey"]))
    reg = collect_table(_read(sf_dir, "region", ["r_regionkey", "r_name"]))
    rkeys = reg.filter(pc.equal(reg["r_name"], Q5_REGION))["r_regionkey"]
    nat_f = nat.filter(pc.is_in(nat["n_regionkey"], value_set=rkeys))
    nkeys = nat_f["n_nationkey"].combine_chunks()
    names = dict(zip(nat_f["n_nationkey"].to_pylist(),
                     nat_f["n_name"].to_pylist()))
    sup = collect_table(_read(sf_dir, "supplier",
                              ["s_suppkey", "s_nationkey"]))
    sup = sup.filter(pc.is_in(sup["s_nationkey"], value_set=nkeys))
    sup_keys = sup["s_suppkey"].to_numpy()
    sup_order = np.argsort(sup_keys)
    sup_ref = ray.put((sup_keys[sup_order],
                       sup["s_nationkey"].to_numpy()[sup_order]))
    nkeys_ref = ray.put(nkeys.sort())

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def filter_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"],
                                              pa.scalar(Q5_D0)),
                             pc.less(t["o_orderdate"], pa.scalar(Q5_D1))))
        return t.select(["o_orderkey", "o_custkey"])

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def filter_cust(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["c_nationkey"],
                                 value_set=ray.get(nkeys_ref)))

    # fact-to-dimension-chain joins kept DISTRIBUTED (customer and orders
    # are both corpus-scale); partition count sized to the test scale. The
    # filtered sides are materialized (pruned int columns, spillable) so an
    # empty side can short-circuit — Ray's hash join crashes on schema-less
    # empty inputs, and an empty partition is routine, not an error.
    orders_f = (orders.map_batches(filter_orders, batch_format="pyarrow")
                .materialize())
    cust_f = (cust.map_batches(filter_cust, batch_format="pyarrow")
              .rename_columns({"c_custkey": "o_custkey"}).materialize())
    if orders_f.count() == 0 or cust_f.count() == 0:
        return typed_empty(n_name="object", revenue="float64")
    o_c = orders_f.join(cust_f, join_type="inner", num_partitions=scale.join_partitions(),
                        on=("o_custkey",))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    li_oc = li.rename_columns({"l_orderkey": "o_orderkey"}).join(
        o_c, join_type="inner", num_partitions=scale.join_partitions(), on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        skeys, snat = ray.get(sup_ref)
        lk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(skeys):
            pos = np.minimum(np.searchsorted(skeys, lk), len(skeys) - 1)
            ok = skeys[pos] == lk
            s_nat = np.where(ok, snat[pos], -1)
        else:
            s_nat = np.full(len(lk), -1, np.int64)
        c_nat = t["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = s_nat == c_nat
        p = _cents(t["l_extendedprice"].to_numpy())[keep]
        d = _cents(t["l_discount"].to_numpy())[keep]
        g = (pd.DataFrame({"n_nationkey": c_nat[keep],
                           "qrev": p * (100 - d)})
             .groupby("n_nationkey", as_index=False)["qrev"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (li_oc.map_batches(partial, batch_format="pyarrow")
           .groupby("n_nationkey").aggregate(Sum("qrev", alias_name="qrev")))
    df = out.to_pandas()
    if df.empty:
        return typed_empty(n_name="object", revenue="float64")
    df["n_name"] = df["n_nationkey"].map(names)
    df["revenue"] = _r(df["qrev"] / 10000.0, 2)
    return (df[["n_name", "revenue"]]
            .sort_values(["revenue", "n_name"], ascending=[False, True])
            .reset_index(drop=True))


# --- distributed rank over low-cardinality groups (two-pass range partition) ---

RANK_SAMPLE_K = 1024  # boundary sample per type (affects balance only)


def q_event_rank(sf_dir: str) -> Dataset:
    """row_number / rank / percent_rank per event_type by value DESC — the
    per-group GLOBAL ordering window, computed WITHOUT ever co-locating a
    whole group (event_type is low-cardinality, so one group is
    corpus-sized; the bucketed-window shape used by the per-user windows
    would be a skew wall here).

    Classic two-pass distributed rank (range partition):

    1. *boundaries*: mergeable bottom-k hash sample per type
       (``sketch._bottomk_rows`` — deterministic under any partitioning)
       → value-quantile boundaries. Tie runs can never split across
       buckets because assignment is ``searchsorted(boundaries, value)``:
       equal values map to the same bucket for ANY boundary vector, so
       boundary quality affects load balance only, never correctness.
    2. *pass A* (cheap column scan + tiny agg): exact per-(type, bucket)
       row counts → suffix sums = rows strictly above each bucket.
    3. *pass B* (the single corpus shuffle): groupby (type, bucket) range
       partition; inside each range a vectorized local sort + tie-run scan
       plus the broadcast offset yields globally exact rn / rnk / pct.

    percent_rank = (rank−1)/(n_type−1) with the single-row partition → 0
    convention, matching SQL. Corpus-sized output → streaming Dataset.

    Partitioning assumption: the largest TIE RUN bounds the largest range
    bucket (ties must co-locate for exact ranks). A near-constant value
    column degenerates to one bucket per type — for such columns rank is
    better served by a count-by-distinct-value pre-aggregate.
    """
    from .sketch import _bottomk_rows

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    nb = scale.read_blocks()          # value buckets per type

    def sample_partial(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_bottomk_rows(t, RANK_SAMPLE_K),
                                    preserve_index=False)

    def sample_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(RANK_SAMPLE_K, "h")

    sample = (ds.map_batches(sample_partial, batch_format="pyarrow")
              .groupby("event_type")
              .map_groups(sample_merge, batch_format="pandas")
              .to_pandas())           # ≤ k × n_types rows
    # empty corpus → empty Dataset.to_pandas() loses columns; no boundaries
    bnds = {} if sample.empty else {
        typ: np.unique(np.quantile(g["value"].to_numpy(),
                                   np.arange(1, nb) / nb))
        for typ, g in sample.groupby("event_type")}
    tmap = {typ: i for i, typ in enumerate(sorted(bnds))}
    bnd_ref = ray.put((bnds, tmap))

    def add_bucket(t: pa.Table) -> pa.Table:
        b_map, t_map = ray.get(bnd_ref)
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy()
        gk = np.zeros(len(v), np.int64)
        for typ, b in b_map.items():
            m = ty == typ
            if m.any():
                gk[m] = t_map[typ] * nb + np.searchsorted(b, v[m],
                                                          side="right")
        return t.append_column("gkey", pa.array(gk))

    def count_partial(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({"gkey": t["gkey"].to_numpy(zero_copy_only=False)})
             .groupby("gkey", as_index=False).size()
             .rename(columns={"size": "n"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(add_bucket, batch_format="pyarrow")
              .map_batches(count_partial, batch_format="pyarrow")
              .groupby("gkey").aggregate(Sum("n", alias_name="n"))
              .to_pandas())            # ≤ n_types × nb rows
    offs: dict[int, np.ndarray] = {}
    totals: dict[int, int] = {}
    if len(counts):
        for tid, g in counts.groupby(counts["gkey"] // nb):
            arr = np.zeros(nb, np.int64)
            arr[(g["gkey"] % nb).to_numpy()] = g["n"].to_numpy(np.int64)
            # rows in strictly higher-value buckets of the same type
            offs[int(tid)] = arr[::-1].cumsum()[::-1] - arr
            totals[int(tid)] = int(arr.sum())
    off_ref = ray.put((offs, totals))

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        o_map, tot = ray.get(off_ref)
        gkey = int(g["gkey"].iat[0])
        tid, bk = gkey // nb, gkey % nb
        g = g.sort_values(["value", "event_id"], ascending=[False, True],
                          kind="mergesort")
        v = g["value"].to_numpy()
        n = len(g)
        base = int(o_map[tid][bk])
        rn = base + np.arange(1, n + 1, dtype=np.int64)
        firsts = np.arange(n, dtype=np.int64)   # tie-run start indices
        firsts[np.r_[False, v[1:] == v[:-1]]] = 0
        np.maximum.accumulate(firsts, out=firsts)
        rnk = base + firsts + 1
        pct = _r(pd.Series((rnk - 1) / max(tot[tid] - 1, 1)), 6)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "event_type": g["event_type"].to_numpy(),
            "rn": rn, "rnk": rnk, "pct": pct.to_numpy()})

    return ensure_schema(
        ds.map_batches(add_bucket, batch_format="pyarrow")
          .groupby("gkey").map_groups(rank_group, batch_format="pandas"),
        pa.schema([("event_id", pa.int64()), ("event_type", pa.string()),
                   ("rn", pa.int64()), ("rnk", pa.int64()),
                   ("pct", pa.float64())]))


# --- full outer join: event activity vs order spend ----------------------------

def q_activity_fulljoin(sf_dir: str) -> Dataset:
    """Per-id event activity FULL OUTER JOIN per-customer order spend.

    Implemented as a tagged UNION + one cogroup aggregate rather than
    ``Dataset.join(join_type="full_outer")``: each side pre-reduces
    per batch into the full output row shape (its own measures filled, the
    other side's zeroed), the union is a metadata no-op, and a single
    ``groupby(id)`` Sum merges the sides — the canonical shuffle-hash full
    outer join, with ONE all-to-all instead of two aggregates plus a join.
    (Also load-bearing: Ray 2.49's sort-aggregate emits zero-COLUMN blocks
    for empty partitions and ``map_batches`` never runs on empty blocks, so
    those blocks cannot be re-typed and a downstream ``Dataset.join`` dies
    in its pyarrow key-FieldRef lookup whenever an aggregate feeds a join
    on a sparsely-keyed input.)

    NULL-side semantics ride the counts: a key absent from one side sums
    that side's measures to 0 with a count of 0, and ``side`` is derived
    from the counts — so the output is null-free with stable int64/float64
    dtypes through the driver's typed value hash."""
    from .combine import bucketed_combine

    ev = _read(sf_dir, "events", ["user_id", "value"])
    od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    row_sch = pa.schema([("id", pa.int64()), ("n_events", pa.int64()),
                         ("sum_value", pa.float64()),
                         ("n_orders", pa.int64()),
                         ("total_spent", pa.float64())])

    def _shape(ids, n, s, side_cols):
        zero_i = np.zeros(len(ids), np.int64)
        zero_f = np.zeros(len(ids), np.float64)
        cols = {"id": ids, side_cols[0]: n, side_cols[1]: s}
        other = [c for c in ("n_events", "sum_value", "n_orders",
                             "total_spent") if c not in side_cols]
        cols[other[0]] = zero_i
        cols[other[1]] = zero_f
        return pa.table({name: pa.array(cols[name])
                         for name in row_sch.names}).cast(row_sch)

    def ev_partial(t: pa.Table) -> pa.Table:
        # integer cents in float64 (schema unchanged): exact partial sums
        g = (pd.DataFrame({"id": t["user_id"].to_numpy(zero_copy_only=False),
                           "v": _cents(t["value"].to_numpy())})
             .groupby("id", as_index=False)
             .agg(n=("v", "size"), s=("v", "sum")))
        return _shape(g["id"].to_numpy(np.int64), g["n"].to_numpy(np.int64),
                      g["s"].to_numpy(np.float64),
                      ("n_events", "sum_value"))

    def od_partial(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({"id": t["o_custkey"].to_numpy(zero_copy_only=False),
                           "p": _cents(t["o_totalprice"].to_numpy())})
             .groupby("id", as_index=False)
             .agg(n=("p", "size"), s=("p", "sum")))
        return _shape(g["id"].to_numpy(np.int64), g["n"].to_numpy(np.int64),
                      g["s"].to_numpy(np.float64),
                      ("n_orders", "total_spent"))

    both = (ev.map_batches(ev_partial, batch_format="pyarrow")
            .union(od.map_batches(od_partial, batch_format="pyarrow")))

    # keys are high-cardinality (one per user/customer) → the bucketed
    # combine, not Ray's per-group sort aggregate (measured 6.7 s → the
    # per-key Python floor at 15k keys; see functions/combine.py)
    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("id", as_index=False)
                .agg(n_events=("n_events", "sum"),
                     sum_value=("sum_value", "sum"),
                     n_orders=("n_orders", "sum"),
                     total_spent=("total_spent", "sum")))

    merged = bucketed_combine(both, "id", merge_bucket)

    def finalize(t: pa.Table) -> pa.Table:
        d = t.to_pandas()
        ne = d["n_events"].to_numpy(np.int64)
        no = d["n_orders"].to_numpy(np.int64)
        side = np.where(ne == 0, "orders_only",
                        np.where(no == 0, "events_only", "both"))
        return pa.table({
            "id": pa.array(d["id"].to_numpy(np.int64)),
            "n_events": pa.array(ne),
            "sum_value": pa.array(round_half_away(
                d["sum_value"].to_numpy(np.float64) / 100.0, 4)),
            "n_orders": pa.array(no),
            "total_spent": pa.array(round_half_away(
                d["total_spent"].to_numpy(np.float64) / 100.0, 2)),
            "side": pa.array(side.tolist(), pa.string())})

    return ensure_schema(
        merged.map_batches(finalize, batch_format="pyarrow"),
        pa.schema([("id", pa.int64()), ("n_events", pa.int64()),
                   ("sum_value", pa.float64()), ("n_orders", pa.int64()),
                   ("total_spent", pa.float64()), ("side", pa.string())]))


# --- two-pass global histogram ---------------------------------------------------

HIST_BUCKETS = 32  # semantic histogram resolution (output rows), NOT a parallelism knob


def q_value_histogram(sf_dir: str) -> pd.DataFrame:
    """Fixed-width global histogram of event values — the classic two-pass
    shape: pass 1 is a tiny min/max aggregate, pass 2 buckets every row
    against the broadcast (lo, width) and pre-counts per batch
    (``np.bincount``) so the final groupby moves ≤ HIST_BUCKETS rows per
    batch. Bucket arithmetic is the same double expression on both sides
    (``floor((v - lo) / width)`` clipped to the last bucket) so the oracle
    match is exact."""
    ds = _read(sf_dir, "events", ["value"])
    mm = ds.aggregate(Min("value"), Max("value"))
    if not mm or mm.get("min(value)") is None:   # empty corpus
        return typed_empty(bucket="int64", n="int64")
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    width = (hi - lo) / float(HIST_BUCKETS)

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        if width > 0:
            b = np.minimum(np.floor((v - lo) / width),
                           HIST_BUCKETS - 1).astype(np.int64)
        else:
            b = np.zeros(len(v), np.int64)
        n = np.bincount(b, minlength=HIST_BUCKETS).astype(np.int64)
        return pa.table({"bucket": pa.array(np.arange(HIST_BUCKETS,
                                                      dtype=np.int64)),
                         "n": pa.array(n)})

    df = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby("bucket").aggregate(Sum("n", alias_name="n"))
          .to_pandas())
    if df.empty:
        return typed_empty(bucket="int64", n="int64")
    df = df[df["n"] > 0]
    df["n"] = df["n"].astype(np.int64)
    return df.sort_values("bucket").reset_index(drop=True)[["bucket", "n"]]


# --- per-user event-type PIVOT (conditional aggregation) ----------------------

def q_pivot(sf_dir: str) -> Dataset:
    """Per-user event-type PIVOT: one event-count and one rounded value-sum
    column per event type — SQL ``PIVOT`` / conditional aggregation.

    The column set is DERIVED, never hardcoded: a result-sized distinct-types
    pass (per-batch ``pc.unique`` → driver set union, no shuffle) fixes the
    wide schema, then per-batch LONG-FORM partials (one row per (user, type)
    per batch — a combiner, so the shuffle moves partials, not events) feed
    one bucketed combine that emits the wide rows. Per-user output →
    streaming Dataset. The oracle hardcodes the same type vocabulary as
    static ``CASE WHEN`` columns (SQL strings are static; the test corpora
    share one vocabulary)."""
    from .combine import bucketed_combine

    tds = _read(sf_dir, "events", ["event_type"])
    uniq = tds.map_batches(
        lambda t: pa.table({"event_type": pc.unique(t["event_type"])}),
        batch_format="pyarrow").to_pandas()          # ≤ types × blocks rows
    # empty corpus: map_batches never ran, so the column itself is absent
    types = (sorted(set(uniq["event_type"].tolist()))
             if "event_type" in uniq.columns else [])

    schema = pa.schema(
        [("user_id", pa.int64())]
        + [(f"n_{ty}", pa.int64()) for ty in types]
        + [(f"v_{ty}", pa.float64()) for ty in types])

    if not types:                                     # empty corpus
        return ensure_schema(
            ray.data.from_arrow(schema.empty_table()), schema)

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "qv": _cents(t["value"].to_numpy(zero_copy_only=False))})
        g = (df.groupby(["user_id", "event_type"], sort=False)
             .agg(n=("qv", "size"), v=("qv", "sum")).reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        pn = g.pivot_table(index="user_id", columns="event_type",
                           values="n", aggfunc="sum", fill_value=0)
        pn = pn.reindex(columns=types, fill_value=0)
        pv = g.pivot_table(index="user_id", columns="event_type",
                           values="v", aggfunc="sum", fill_value=0)
        pv = pv.reindex(columns=types, fill_value=0)
        out = pd.DataFrame({"user_id": pn.index.to_numpy(np.int64)})
        for ty in types:
            out[f"n_{ty}"] = pn[ty].to_numpy(np.int64)
        for ty in types:
            out[f"v_{ty}"] = round_half_away(
                pv[ty].to_numpy(np.float64) / 100.0, 2)
        return out

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return ensure_schema(bucketed_combine(parts, "user_id", widen), schema)


# --- Bloom-filter semi-join reduction (anti join at 100-TB shape) ---------------

BLOOM_BITS = 1 << 18      # 256 Kbit = 32 KiB broadcast, any cluster size
BLOOM_K = 3               # three 18-bit slices of one splitmix64


def _bloom_positions(keys: np.ndarray, bits: int = BLOOM_BITS) -> np.ndarray:
    """(k, n) bit positions — three disjoint 18-bit slices of splitmix64,
    so the whole filter derives from ONE vectorized mix per key.
    ``bits`` must be a power of two ≤ 2^18 (slices stay disjoint)."""
    from .sketch import _splitmix64

    h = _splitmix64(keys.astype(np.uint64))
    return np.stack([
        ((h >> np.uint64(18 * i)) & np.uint64(bits - 1))
        .astype(np.int64)
        for i in range(BLOOM_K)])


def q_bloom_inactive(sf_dir: str, bits: int = BLOOM_BITS) -> pd.DataFrame:
    """Customers that never emitted an event — the SAME answer as a plain
    anti join, computed the way a 100-TB pipeline would: a Bloom filter of
    the (huge) event-user side is built in one streaming pass (each batch
    emits its ENTIRE filter as one packed 32 KiB bitmap row; the driver
    ORs them — pull is filter-size × batch count, never key count) and
    broadcast; customers the filter rejects are PROVEN
    inactive (Bloom has no false negatives) and never enter a join; only
    the sliver the filter accepts (true actives + deterministic false
    positives) is verified with a distributed left-anti join against the
    per-batch-deduped user ids. The filter is invisible in the output, so
    the DuckDB oracle is the plain NOT EXISTS — exact."""
    events = _read(sf_dir, "events", ["user_id"])
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"])
    empty = typed_empty(c_custkey="int64", c_name="object",
                        c_mktsegment="object", c_acctbal="float64")
    if cust.count() == 0:
        return empty

    def bitmap(t: pa.Table) -> pa.Table:
        # ONE packed bitmap row per batch (bits/8 bytes — 32 KiB at the
        # default size) instead of a position stream: the driver pull is
        # bounded by the filter size × batch count, and OR-merge is the
        # same mergeable-partial shape as the CMS/KMV sketches.
        keys = np.unique(t["user_id"].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        bm = np.zeros(bits, bool)
        if keys.size:
            bm[_bloom_positions(keys, bits).ravel()] = True
        return pa.table({"bm": pa.array([np.packbits(bm).tobytes()],
                                        pa.binary())})

    packed = np.zeros(bits // 8, np.uint8) if bits >= 8 else np.zeros(1,
                                                                      np.uint8)
    parts = events.map_batches(bitmap, batch_format="pyarrow",
                               batch_size=65536)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=64):
        for raw in b["bm"].to_pylist():
            packed |= np.frombuffer(raw, np.uint8)
    bloom = np.unpackbits(packed)[:bits].astype(bool)
    bloom_ref = ray.put(bloom)

    def probe(t: pa.Table) -> pa.Table:
        bl = ray.get(bloom_ref)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = _bloom_positions(keys, bits)
        member = bl[pos[0]] & bl[pos[1]] & bl[pos[2]]
        return t.append_column("bloom_member",
                               pa.array(member.astype(np.int64)))

    # dimension-sized (the customer table), int flag only — safe to pin
    # for the two consumers below
    probed = cust.map_batches(probe, batch_format="pyarrow").materialize()
    negatives = probed.filter(expr="bloom_member == 0")
    candidates = probed.filter(expr="bloom_member == 1")

    def dedup_users(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": pc.unique(t["user_id"])})

    users = events.map_batches(dedup_users, batch_format="pyarrow",
                               batch_size=65536)
    if candidates.count() == 0 or events.count() == 0:
        verified = candidates  # nothing to verify (or all customers pass)
    else:
        verified = candidates.join(
            users, join_type="left_anti",
            num_partitions=scale.join_partitions(0.25),
            on=("c_custkey",), right_on=("user_id",))
    df = negatives.union(verified).to_pandas()
    if df.empty:
        return empty
    df["c_acctbal"] = _r(df["c_acctbal"], 2)
    return (df[["c_custkey", "c_name", "c_mktsegment", "c_acctbal"]]
            .sort_values("c_custkey").reset_index(drop=True))


# --- Q6: forecast revenue change (filter pushed to the parquet read) -----------

Q6_D0 = np.datetime64("1996-01-01", "us")
Q6_D1 = np.datetime64("1997-01-01", "us")
Q6_DISC_LO, Q6_DISC_HI = 0.03, 0.07
Q6_QTY_CAP = 30.0


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: single-table filter + global aggregate, with the
    predicate pushed INTO the parquet read (``filter=``) so row groups that
    cannot match never leave storage — at 100 TB this is the difference
    between scanning a year of data and scanning all of it. Per-batch
    partial sums; the driver merges one row per batch."""
    path = f"{sf_dir}/lineitem.parquet"
    ds = ray.data.read_parquet(
        path,
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
        filter=((pc.field("l_shipdate") >= Q6_D0)
                & (pc.field("l_shipdate") < Q6_D1)
                & (pc.field("l_discount") >= Q6_DISC_LO)
                & (pc.field("l_discount") <= Q6_DISC_HI)
                & (pc.field("l_quantity") < Q6_QTY_CAP)),
        override_num_blocks=scale.read_blocks_for_path(path))

    def partial(t: pa.Table) -> pa.Table:
        # int64 1e-4 dollar grid: cents × discount-pct sums exactly
        qrev = (_cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
                * _cents(t["l_discount"].to_numpy(zero_copy_only=False)))
        return pa.table({"qrev": pa.array([int(qrev.sum())], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    qrev, n = 0, 0
    parts = ds.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=256):
        qrev += int(pc.sum(b["qrev"]).as_py() or 0)
        n += int(pc.sum(b["n"]).as_py() or 0)
    return pd.DataFrame({
        "revenue": [float(round_half_away(qrev / 10000.0, 2))],
        "n_items": np.array([n], np.int64)})


# --- Q4: late-shipment order counts (pre-agg before the fact join) -------------

Q4_D0 = np.datetime64("1996-01-01", "us")
Q4_D1 = np.datetime64("1997-01-01", "us")
Q4_LATE_US = 60 * 86_400_000_000   # shipped > 60 days after the order


def q4_late_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape (EXISTS → join), adapted to this schema: orders in a
    date window counted per priority when at least one lineitem shipped
    more than 60 days after the order date.

    Scale shape: ``EXISTS(l_shipdate > o_orderdate + 60d)`` distributes
    over batch partials (an order is late iff ANY batch-local max is
    late), so no global per-orderkey aggregate is ever built. Lineitem
    batches reduce to one (orderkey, local-max) row per key per batch,
    PRE-FILTERED by a 32 KiB Bloom filter of the window's orderkeys (the
    ``q_bloom_inactive`` machinery — false positives just ride the exact
    join, and a saturated filter degrades gracefully to the plain join);
    the distributed join then moves only the window sliver, and the final
    count is the batch-dedup → exact per-priority ``nunique`` pattern
    (``q_count_distinct_custs``) — ONE small shuffle on the 5-value
    priority key. This replaced a per-orderkey groupby-Max whose sort
    shuffle dominated the query 8.8 s → ~2 s at sf0.1."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def filter_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"],
                                              pa.scalar(Q4_D0)),
                             pc.less(t["o_orderdate"], pa.scalar(Q4_D1))))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "odate_us": t["o_orderdate"].cast(pa.int64()),
            "o_orderpriority": t["o_orderpriority"]})

    orders_f = (orders.map_batches(filter_orders, batch_format="pyarrow")
                .materialize())   # pruned int/str columns, spillable
    empty = typed_empty(o_orderpriority="object", n_late="int64")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    if orders_f.count() == 0 or li.count() == 0:
        return empty

    def key_bitmap(t: pa.Table) -> pa.Table:
        keys = np.unique(t["o_orderkey"].to_numpy(zero_copy_only=False)
                         .astype(np.int64))
        bm = np.zeros(BLOOM_BITS, bool)
        if keys.size:
            bm[_bloom_positions(keys).ravel()] = True
        return pa.table({"bm": pa.array([np.packbits(bm).tobytes()],
                                        pa.binary())})

    packed = np.zeros(BLOOM_BITS // 8, np.uint8)
    for b in (orders_f.map_batches(key_bitmap, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=64)):
        for raw in b["bm"].to_pylist():
            packed |= np.frombuffer(raw, np.uint8)
    bloom_ref = ray.put(np.unpackbits(packed).astype(bool))

    def li_partial(t: pa.Table) -> pa.Table:
        bl = ray.get(bloom_ref)
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        pos = _bloom_positions(keys)
        member = bl[pos[0]] & bl[pos[1]] & bl[pos[2]]
        df = pd.DataFrame({
            "o_orderkey": keys[member],
            "ship_us": t["l_shipdate"].cast(pa.int64()).to_numpy(
                zero_copy_only=False)[member]})
        g = df.groupby("o_orderkey", as_index=False)["ship_us"].max()
        return pa.Table.from_pandas(g, preserve_index=False)

    li_parts = li.map_batches(li_partial, batch_format="pyarrow",
                              batch_size=65536)
    joined = li_parts.join(orders_f, join_type="inner",
                           num_partitions=scale.join_partitions(),
                           on=("o_orderkey",))

    def late_dedup(t: pa.Table) -> pa.Table:
        late = (t["ship_us"].to_numpy(zero_copy_only=False)
                > t["odate_us"].to_numpy(zero_copy_only=False) + Q4_LATE_US)
        df = pd.DataFrame({
            "o_orderpriority":
                t["o_orderpriority"].to_numpy(zero_copy_only=False)[late],
            "o_orderkey":
                t["o_orderkey"].to_numpy(zero_copy_only=False)[late],
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_unique(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": [g["o_orderpriority"].iloc[0]],
            "n_late": np.array([g["o_orderkey"].nunique()], np.int64)})

    df = (joined.map_batches(late_dedup, batch_format="pyarrow")
          .groupby("o_orderpriority")
          .map_groups(count_unique, batch_format="pandas")
          .to_pandas())
    if df.empty:
        return empty
    df["n_late"] = df["n_late"].astype(np.int64)
    return (df[["o_orderpriority", "n_late"]]
            .sort_values("o_orderpriority").reset_index(drop=True))


# --- Q10: returned-item revenue top-20 (star join + distributed top-k) ---------

Q10_D0 = np.datetime64("1996-01-01", "us")
Q10_D1 = np.datetime64("1996-07-01", "us")
Q10_TOP = 20


def q10_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer, top 20.

    Scale shape: lineitem is filtered to returnflag='R' and pre-aggregated
    to one (orderkey, qrev) row per (orderkey, batch) before joining the
    date-filtered orders DISTRIBUTED (both sides corpus-scale); the
    per-customer revenue groupby then moves one row per (custkey, batch);
    customer attributes attach by a second distributed join; nation (25
    rows) is broadcast, and each block emits only its local top-20
    (driver merges 20 × n_blocks rows).

    Exactness: revenue folds on the int64 1e-4 dollar grid — per row
    ``cent(extendedprice) · (100 − pct(discount))`` exactly as q9 — so
    the per-customer sums are partitioning-independent and ONE float
    division converts at the end (round-3 fix: the float ``Sum('rev')``
    flipped a half-cent boundary at sf0.01, customer 768 = 378060.5150,
    under the driver's summation order)."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"])

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        p = round_half_away(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        d = round_half_away(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "qrev": p * (100 - d)})
        g = df.groupby("o_orderkey", as_index=False)["qrev"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def filter_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"],
                                              pa.scalar(Q10_D0)),
                             pc.less(t["o_orderdate"], pa.scalar(Q10_D1))))
        return t.select(["o_orderkey", "o_custkey"])

    empty = typed_empty(c_custkey="int64", c_name="object",
                        revenue="float64", n_name="object")
    li_r = (li.map_batches(li_partial, batch_format="pyarrow",
                           batch_size=65536).materialize())
    orders_f = (orders.map_batches(filter_orders, batch_format="pyarrow")
                .materialize())
    if li_r.count() == 0 or orders_f.count() == 0:
        return empty
    per_cust = (li_r.join(orders_f, join_type="inner",
                          num_partitions=scale.join_partitions(),
                          on=("o_orderkey",))
                .groupby("o_custkey")
                .aggregate(Sum("qrev", alias_name="qrev"))
                .rename_columns({"o_custkey": "c_custkey"}))

    cust = (_read(sf_dir, "customer",
                  ["c_custkey", "c_name", "c_nationkey"]).materialize())
    nat = collect_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    names = dict(zip(nat["n_nationkey"].to_pylist(),
                     nat["n_name"].to_pylist()))
    names_ref = ray.put(names)
    with_cust = per_cust.join(cust, join_type="inner",
                              num_partitions=scale.join_partitions(),
                              on=("c_custkey",))

    def local_topk(t: pa.Table) -> pa.Table:
        rev = round_half_away(
            t["qrev"].to_numpy(zero_copy_only=False) / 10000.0, 2)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, -rev))[:Q10_TOP]
        nmap = ray.get(names_ref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)[order]
        return pa.table({
            "c_custkey": pa.array(keys[order]),
            "c_name": t["c_name"].take(pa.array(order)),
            "revenue": pa.array(rev[order]),
            "n_name": pa.array([nmap[int(k)] for k in nk])})

    df = (with_cust.map_batches(local_topk, batch_format="pyarrow")
          .to_pandas())   # ≤ 20 rows per block reach the driver
    if df.empty:
        return empty
    df = df.sort_values(["revenue", "c_custkey"],
                        ascending=[False, True]).head(Q10_TOP)
    return df[["c_custkey", "c_name", "revenue", "n_name"]].reset_index(
        drop=True)


# --- feature standardization: two-pass fixed-point z-score ----------------------

ZSCORE_SCALE = 1000.0   # fixed-point grid: q = round(value * 1000)


def q_value_zscore(sf_dir: str) -> Dataset:
    """Z-score standardization of ``events.value`` — the feature-scaling
    pass of an ML-prep pipeline, exact under ANY partitioning.

    The mean/variance pass quantizes each value to the fixed 1e-3 grid
    (int64) and sums integers, so the global moments are EXACT and
    order-independent (float summation order can never change the output —
    the trick the quality classifier uses for its gradients). The z-score
    itself is then a per-row float map from two broadcast scalars; the
    DuckDB oracle replays the identical quantized-moment arithmetic
    (HUGEINT sums → double), making the query hash-exact despite being a
    floating-point normalization over an unordered corpus."""
    ds = _read(sf_dir, "events", ["event_id", "value"])
    schema = pa.schema([("event_id", pa.int64()),
                        ("zscore", pa.float64())])

    def moments(t: pa.Table) -> pa.Table:
        q = round_half_away(
            t["value"].to_numpy(zero_copy_only=False) * ZSCORE_SCALE,
            0).astype(np.int64)
        return pa.table({
            "sq": pa.array([int(q.sum())], pa.int64()),
            "sq2": pa.array([int((q * q).sum())], pa.int64()),
            "n": pa.array([len(q)], pa.int64())})

    sq = sq2 = n = 0   # Python ints: arbitrary precision, exact merge
    parts = ds.map_batches(moments, batch_format="pyarrow",
                           batch_size=65536)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=256):
        sq += sum(b["sq"].to_pylist())
        sq2 += sum(b["sq2"].to_pylist())
        n += sum(b["n"].to_pylist())
    if n == 0:
        return ensure_schema(
            ray.data.from_arrow(schema.empty_table()), schema)
    # identical float expression on both sides: int→double conversions and
    # IEEE ops are deterministic given identical integer inputs
    mu = float(sq) / float(n)
    var = (float(sq2) - mu * float(sq)) / float(n)
    sd = var ** 0.5

    def score(t: pa.Table) -> pa.Table:
        q = round_half_away(
            t["value"].to_numpy(zero_copy_only=False) * ZSCORE_SCALE,
            0)
        z = (q - mu) / sd if sd > 0.0 else np.zeros(len(q))
        return pa.table({"event_id": t["event_id"],
                         "zscore": pa.array(round_half_away(z, 6))})

    return ensure_schema(
        ds.map_batches(score, batch_format="pyarrow", batch_size=65536),
        schema)


# --- behavior-sequence construction: per-user ordered event-type strings -------

def q_user_event_seq(sf_dir: str) -> Dataset:
    """Per-user chronological event-type sequence string — the
    behavior-sequence construction step of a sequential-recommendation /
    user-model training pipeline. Same bucketed-window shape as
    sessionize: ONE hash-bucket shuffle (many users per Ray group call),
    per-user ordering established locally inside the bucket, never a
    global sort. Output is one row per user (corpus-sized) → streaming
    Dataset. Oracle: ``string_agg(event_type, ',' ORDER BY ts, event_id)``."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])
    schema = pa.schema([("user_id", pa.int64()),
                        ("n_events", pa.int64()),
                        ("event_seq", pa.string())])

    def seqs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        out = (g.groupby("user_id", sort=False)["event_type"]
               .agg([("n_events", "size"), ("event_seq", ",".join)])
               .reset_index())
        out["user_id"] = out["user_id"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out[["user_id", "n_events", "event_seq"]]

    return ensure_schema(
        ds.map_batches(_user_bucketizer(), batch_format="pyarrow")
          .groupby("bucket").map_groups(seqs, batch_format="pandas"),
        schema)


# --- CUBE grouping sets (one corpus shuffle, driver-derived levels) -------------

def q_cube_acctbal(sf_dir: str) -> pd.DataFrame:
    """SQL ``GROUP BY CUBE(c_mktsegment, n_name)``: all FOUR grouping sets
    — (segment, nation), (segment), (nation), grand total — in one result,
    NULL key = rolled-up level.

    Scale shape (same as q_rollup_acctbal, plus the cross level): nation is
    a broadcast dimension, ONE corpus shuffle computes the finest
    (segment, nation) aggregate, and every coarser set derives from that
    bounded (|segments| × 25)-row result on the driver from the UNROUNDED
    sums — a cube never needs one corpus pass per grouping set."""
    nation = collect_table(_read(sf_dir, "nation",
                                 ["n_nationkey", "n_name"]))
    n_names = dict(zip(nation["n_nationkey"].to_pylist(),
                       nation["n_name"].to_pylist()))
    lookup = ray.put(n_names)

    cust = _read(sf_dir, "customer",
                 ["c_mktsegment", "c_nationkey", "c_acctbal"])

    def add_keys(t: pa.Table) -> pa.Table:
        m = ray.get(lookup)
        return pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "n_name": pa.array([m[k] for k in
                                t["c_nationkey"].to_pylist()], pa.string()),
            "qbal": pa.array(_cents(
                t["c_acctbal"].to_numpy(zero_copy_only=False)))})

    fine = (cust.map_batches(add_keys, batch_format="pyarrow")
                .groupby(["c_mktsegment", "n_name"])
                .aggregate(Count(alias_name="n_custs"),
                           Sum("qbal", alias_name="s"))
                .to_pandas())
    empty = typed_empty(c_mktsegment="object", n_name="object",
                        n_custs="int64", sum_acctbal="float64",
                        avg_acctbal="float64")
    if fine.empty:
        return empty
    by_seg = (fine.groupby("c_mktsegment", as_index=False)
              .agg(n_custs=("n_custs", "sum"), s=("s", "sum"))
              .assign(n_name=None))
    by_nat = (fine.groupby("n_name", as_index=False)
              .agg(n_custs=("n_custs", "sum"), s=("s", "sum"))
              .assign(c_mktsegment=None))
    total = pd.DataFrame({"c_mktsegment": [None], "n_name": [None],
                          "n_custs": [fine["n_custs"].sum()],
                          "s": [fine["s"].sum()]})
    out = pd.concat([fine, by_seg, by_nat, total], ignore_index=True)[
        ["c_mktsegment", "n_name", "n_custs", "s"]]
    out["n_custs"] = out["n_custs"].astype(np.int64)
    out["sum_acctbal"] = _r(out["s"] / 100.0, 2)
    out["avg_acctbal"] = _r(out["s"] / 100.0 / out["n_custs"], 6)
    return (out.drop(columns=["s"])
               .sort_values(["c_mktsegment", "n_name"], na_position="first")
               .reset_index(drop=True))


# --- Q18: large-volume orders (bucketed per-key aggregate + HAVING + joins) ----

Q18_MIN_QTY = 250.0
Q18_TOP = 100


def q18_large_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold (HAVING over a per-orderkey aggregate), order + customer
    attributes attached, top 100 by ``o_totalprice``.

    Scale shape: per-orderkey totals via batch partials (one row per
    (orderkey, batch)) then ONE hash-bucket shuffle
    (``bucket = orderkey & 255``) with a vectorized pandas groupby-sum
    per bucket — the bucketed-window pattern, not a per-key
    sort-aggregate (q4's 8.8 s lesson). Quantities are integral doubles,
    so the bucket-order-independent sums are exact and the HAVING
    boundary cannot flip. Only qualifying orders (rare) reach the
    distributed orders/customer joins; each block emits its local
    top-100, so the driver merges ≤ 100 × n_blocks rows."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    nb = _asof_buckets()

    def li_partial(t: pa.Table) -> pa.Table:
        df = (t.to_pandas()
              .groupby("l_orderkey", as_index=False)["l_quantity"].sum())
        df["bucket"] = df["l_orderkey"].to_numpy(np.int64) & (nb - 1)
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
        out = out[out["l_quantity"] > Q18_MIN_QTY]
        return out.rename(columns={"l_orderkey": "o_orderkey",
                                   "l_quantity": "sum_qty"})

    empty = typed_empty(c_name="object", c_custkey="int64",
                        o_orderkey="int64", o_orderdate="datetime64[us]",
                        o_totalprice="float64", sum_qty="float64")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    if li.count() == 0 or orders.count() == 0:
        return empty
    big = (li.map_batches(li_partial, batch_format="pyarrow",
                          batch_size=65536)
             .groupby("bucket").map_groups(bucket_sum, batch_format="pandas")
             .materialize())   # HAVING sliver (bucket_sum projects it away)
    if big.count() == 0:
        return empty

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    wo = big.join(orders, join_type="inner",
                  num_partitions=scale.join_partitions(), on=("o_orderkey",))
    wc = (wo.rename_columns({"o_custkey": "c_custkey"})
            .join(cust, join_type="inner",
                  num_partitions=scale.join_partitions(), on=("c_custkey",)))

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= Q18_TOP:
            return t
        tp = t["o_totalprice"].to_numpy(zero_copy_only=False)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ok, -tp))[:Q18_TOP]
        return t.take(pa.array(order))

    df = wc.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if df.empty:
        return empty
    df = (df.sort_values(["o_totalprice", "o_orderkey"],
                         ascending=[False, True]).head(Q18_TOP))
    return df[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
               "o_totalprice", "sum_qty"]].reset_index(drop=True)


# --- Q12: shipping-window priority counts (join + conditional aggregation) -----

Q12_D0 = np.datetime64("1997-01-01", "us")
Q12_D1 = np.datetime64("1998-01-01", "us")
Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority_lines(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape (no shipmode in this schema → grouped by
    ``l_linestatus``): lineitems shipped in 1997, counted per linestatus
    into high- vs low-priority orders (conditional CASE aggregation over
    a fact-fact join).

    Scale shape: the shipdate predicate is pushed into the parquet read
    (row groups outside the window never leave storage; the filter
    column itself is not projected), orders reduce to (key, bool) before
    the distributed join, and the join output collapses to per-batch
    (linestatus, high/low) count partials — the final shuffle moves a
    few rows per batch over a 2-value key."""
    path = f"{sf_dir}/lineitem.parquet"
    li = ray.data.read_parquet(
        path, columns=["l_orderkey", "l_linestatus"],
        filter=((pc.field("l_shipdate") >= Q12_D0)
                & (pc.field("l_shipdate") < Q12_D1)),
        override_num_blocks=scale.read_blocks_for_path(path))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def o_high(t: pa.Table) -> pa.Table:
        hi = pc.is_in(t["o_orderpriority"],
                      value_set=pa.array(Q12_HIGH, pa.string()))
        return pa.table({"o_orderkey": t["o_orderkey"], "high": hi})

    empty = typed_empty(l_linestatus="object", high_line_count="int64",
                        low_line_count="int64")
    if li.count() == 0 or orders.count() == 0:
        return empty
    joined = (li.rename_columns({"l_orderkey": "o_orderkey"})
                .join(orders.map_batches(o_high, batch_format="pyarrow"),
                      join_type="inner",
                      num_partitions=scale.join_partitions(),
                      on=("o_orderkey",)))

    def partial(t: pa.Table) -> pa.Table:
        hi = t["high"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"l_linestatus":
                           t["l_linestatus"].to_numpy(zero_copy_only=False),
                           "hi": hi, "lo": 1 - hi})
        g = df.groupby("l_linestatus", as_index=False).agg(
            high_line_count=("hi", "sum"), low_line_count=("lo", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (joined.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
          .groupby("l_linestatus")
          .aggregate(Sum("high_line_count", alias_name="high_line_count"),
                     Sum("low_line_count", alias_name="low_line_count"))
          .to_pandas())
    if df.empty:
        return empty
    df["high_line_count"] = df["high_line_count"].astype(np.int64)
    df["low_line_count"] = df["low_line_count"].astype(np.int64)
    return (df[["l_linestatus", "high_line_count", "low_line_count"]]
            .sort_values("l_linestatus").reset_index(drop=True))


# --- Q14: promo revenue share (dimension join + two-aggregate ratio) -----------

Q14_D0 = np.datetime64("1997-01-01", "us")
Q14_D1 = np.datetime64("1997-04-01", "us")


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: share of discounted revenue from PROMO-type parts
    in a 3-month ship window — a fact×dimension join feeding a global
    two-aggregate ratio.

    Scale shape: shipdate predicate pushed into the read; part reduces
    to (key, is_promo) before the DISTRIBUTED join (part scales with the
    corpus in TPC-H, so no broadcast); the join output collapses to one
    (promo_rev, rev) partial row per batch and the driver folds a few
    hundred scalars. The ratio is rounded at 6 decimals — float-sum
    order sensitivity is ~1e-9 absolute on this ratio, far below the
    rounding grid (same exactness class as every rounded-revenue
    oracle here)."""
    path = f"{sf_dir}/lineitem.parquet"
    li = ray.data.read_parquet(
        path, columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=((pc.field("l_shipdate") >= Q14_D0)
                & (pc.field("l_shipdate") < Q14_D1)),
        override_num_blocks=scale.read_blocks_for_path(path))
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def p_promo(t: pa.Table) -> pa.Table:
        return pa.table({"p_partkey": t["p_partkey"],
                         "promo": pc.equal(t["p_type"], "PROMO")})

    empty = typed_empty(promo_revenue="float64")
    if li.count() == 0 or part.count() == 0:
        return empty

    def li_rev(t: pa.Table) -> pa.Table:
        p = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        d = _cents(t["l_discount"].to_numpy(zero_copy_only=False))
        return pa.table({"p_partkey": t["l_partkey"],
                         "qrev": pa.array(p * (100 - d))})

    joined = (li.map_batches(li_rev, batch_format="pyarrow")
                .join(part.map_batches(p_promo, batch_format="pyarrow"),
                      join_type="inner",
                      num_partitions=scale.join_partitions(),
                      on=("p_partkey",)))

    def partial(t: pa.Table) -> pa.Table:
        qrev = t["qrev"].to_numpy(zero_copy_only=False)
        promo = t["promo"].to_numpy(zero_copy_only=False)
        return pa.table({"promo_rev": pa.array([int(qrev[promo].sum())],
                                               pa.int64()),
                         "rev": pa.array([int(qrev.sum())], pa.int64())})

    promo_rev = rev = 0
    for b in (joined.map_batches(partial, batch_format="pyarrow",
                                 batch_size=65536)
              .iter_batches(batch_format="pyarrow", batch_size=256)):
        promo_rev += int(pc.sum(b["promo_rev"]).as_py() or 0)
        rev += int(pc.sum(b["rev"]).as_py() or 0)
    if rev == 0:
        return empty
    return pd.DataFrame({"promo_revenue": [float(round_half_away(
        100.0 * float(promo_rev) / float(rev), 6))]})


# --- Q22: idle high-balance customers (scalar subquery + anti-join + agg) ------

Q22_CUTOFF = np.datetime64("2001-01-01", "us")


def q22_idle_balance(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape (no phone column → grouped by market segment):
    customers whose balance exceeds the positive-balance average and who
    placed no order since the cutoff — a broadcast scalar subquery, a
    distributed left-anti join, and a per-segment aggregate.

    Scale shape: pass 1 folds per-batch (sum, count) partials of the
    positive balances into ONE scalar threshold on the driver (the
    scalar subquery — rounded to 2 decimals so float-sum order cannot
    move it); pass 2 filters customers against the scalar, anti-joins
    the per-batch-distinct active custkeys (semi-join reduce), and
    pre-aggregates per segment inside each batch before the 5-key final
    shuffle."""
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    empty = typed_empty(c_mktsegment="object", numcust="int64",
                        totacctbal="float64")
    if cust.count() == 0:
        return empty

    def bal_partial(t: pa.Table) -> pa.Table:
        v = t["c_acctbal"].to_numpy(zero_copy_only=False)
        pos = _cents(v[v > 0.0])
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    s, n = 0, 0
    for b in (cust.map_batches(bal_partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=256)):
        s += int(pc.sum(b["s"]).as_py() or 0)
        n += int(pc.sum(b["n"]).as_py() or 0)
    if n == 0:
        return empty
    thr = float(round_half_away(s / 100.0 / n, 2))

    def rich(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["c_acctbal"], thr))

    def active_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["o_orderdate"],
                                      pa.scalar(Q22_CUTOFF)))
        return pa.table({"o_custkey": pc.unique(t["o_custkey"])})

    rich_ds = cust.map_batches(rich, batch_format="pyarrow")
    if orders.count() == 0:
        idle = rich_ds
    else:
        idle = rich_ds.join(
            orders.map_batches(active_keys, batch_format="pyarrow",
                               batch_size=65536),
            join_type="left_anti",
            num_partitions=scale.join_partitions(0.25),
            on=("c_custkey",), right_on=("o_custkey",))

    def seg_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "c_mktsegment": t["c_mktsegment"].to_numpy(zero_copy_only=False),
            "qbal": _cents(t["c_acctbal"].to_numpy(zero_copy_only=False))})
        g = df.groupby("c_mktsegment", as_index=False).agg(
            numcust=("qbal", "size"), s=("qbal", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (idle.map_batches(seg_partial, batch_format="pyarrow")
          .groupby("c_mktsegment")
          .aggregate(Sum("numcust", alias_name="numcust"),
                     Sum("s", alias_name="s"))
          .to_pandas())
    if df.empty:
        return empty
    df["numcust"] = df["numcust"].astype(np.int64)
    df["totacctbal"] = _r(df["s"] / 100.0, 2)
    return (df[["c_mktsegment", "numcust", "totacctbal"]]
            .sort_values("c_mktsegment").reset_index(drop=True))


# --- NTILE window: per-user value quartiles ------------------------------------

NTILE_N = 4


def q_event_ntile(sf_dir: str) -> Dataset:
    """SQL ``ntile(4) OVER (PARTITION BY user_id ORDER BY value,
    event_id)``: each user's events split into 4 ordered near-equal
    buckets (DuckDB semantics: the first ``n % 4`` buckets get the extra
    row).

    Same partitioning contract as the other windows (q_sessionize): ONE
    shuffle on ``bucket = user_id & 255``, then a fully vectorized
    multi-user tile assignment inside the bucket — per-user boundaries
    by run-length, positions by ``arange - repeat(starts)``, no Python
    loop per user. Corpus-sized output → streaming Dataset."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def tiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        sizes = np.diff(np.r_[starts, n])
        pos = np.arange(n) - np.repeat(starts, sizes)
        cnt = np.repeat(sizes, sizes)
        base, rem = cnt // NTILE_N, cnt % NTILE_N
        cut = rem * (base + 1)
        safe = np.maximum(base, 1)
        tile = np.where(pos < cut, pos // (base + 1) + 1,
                        rem + (pos - cut) // safe + 1)
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(np.int64),
                             "user_id": uid,
                             "tile": tile.astype(np.int64)})

    return ensure_schema(
        ds.map_batches(_user_bucketizer(), batch_format="pyarrow")
          .groupby("bucket").map_groups(tiles, batch_format="pandas"),
        pa.schema([("event_id", pa.int64()), ("user_id", pa.int64()),
                   ("tile", pa.int64())]))


# --- Pearson correlation (exact integer-moment aggregation) --------------------

def q_corr_qty_price(sf_dir: str) -> pd.DataFrame:
    """Global Pearson correlation of (l_quantity, l_extendedprice) on the
    0.01 price grid — the two-column covariance/moment aggregate.

    Exactness shape (same family as q_value_zscore): both columns are
    quantized to int64 (quantity is already integral; price via
    half-away ×100), the five moment sums fold as EXACT integers (batch
    partials in int64 — batch_size 32768 keeps Σp² < 2^62 at the
    observed price ceiling — then arbitrary-precision Python ints on the
    driver), and the final float expression is evaluated in ONE
    identical operation order on both sides, so the result is
    bit-identical to the SQL oracle regardless of partitioning: int →
    double casts and IEEE sqrt/division are correctly rounded on both
    engines."""
    li = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    empty = typed_empty(corr_qty_price="float64")
    if li.count() == 0:
        return empty

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = round_half_away(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "sq": pa.array([int(q.sum())], pa.int64()),
            "sp": pa.array([int(p.sum())], pa.int64()),
            "sqq": pa.array([int((q * q).sum())], pa.int64()),
            "spp": pa.array([int((p * p).sum())], pa.int64()),
            "sqp": pa.array([int((q * p).sum())], pa.int64())})

    # arbitrary-precision fold: pc.sum would wrap int64 once many partial
    # rows (each up to ~2^61) share one iter-batch
    n = sq = sp = sqq = spp = sqp = 0
    for b in (li.map_batches(partial, batch_format="pyarrow",
                             batch_size=32768)
              .iter_batches(batch_format="pyarrow", batch_size=256)):
        n += sum(b["n"].to_pylist())
        sq += sum(b["sq"].to_pylist())
        sp += sum(b["sp"].to_pylist())
        sqq += sum(b["sqq"].to_pylist())
        spp += sum(b["spp"].to_pylist())
        sqp += sum(b["sqp"].to_pylist())
    if n == 0:
        return empty
    da, db = n * sqq - sq * sq, n * spp - sp * sp
    if da == 0 or db == 0:
        return empty
    r = float(n * sqp - sq * sp) / (
        np.sqrt(float(da)) * np.sqrt(float(db)))
    return pd.DataFrame({"corr_qty_price":
                         [float(round_half_away(r, 9))]})


# --- Q7: two-nation shipping volume (broadcast sliver + distributed star) ------

Q7_N1, Q7_N2 = "NATION_3", "NATION_7"
Q7_D0 = np.datetime64("1996-01-01", "us")
Q7_D1 = np.datetime64("1998-01-01", "us")


def q7_nation_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations per year.

    Scale shape (reference has no multi-table joins; this exercises the
    engine's star-join repertoire, cf. q5): the two-nation slivers of
    supplier and customer are 2/25 of their tables — the supplier side is
    broadcast as a sorted (key, nation) lookup probed row-locally, the
    customer side rides a DISTRIBUTED orders⋈customer join (corpus-scale
    both sides, never broadcast). Lineitem is date-pruned AT THE READ, the
    nation-pair predicate is applied in the map, and revenue partials are
    pre-aggregated per batch so the final shuffle carries one row per
    (nation-pair, year, batch)."""
    empty = typed_empty(supp_nation="object", cust_nation="object",
                        l_year="int64", revenue="float64")
    nat = collect_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    names = dict(zip(nat["n_nationkey"].to_pylist(),
                     nat["n_name"].to_pylist()))
    keys = sorted(k for k, v in names.items() if v in (Q7_N1, Q7_N2))
    if len(keys) < 2:
        return empty
    kset = pa.array(keys, pa.int32())

    sup = collect_table(_read(sf_dir, "supplier",
                              ["s_suppkey", "s_nationkey"]))
    sup = sup.filter(pc.is_in(sup["s_nationkey"], value_set=kset))
    sk = sup["s_suppkey"].to_numpy()
    order = np.argsort(sk)
    sup_ref = ray.put((sk[order],
                       sup["s_nationkey"].to_numpy()[order].astype(np.int64)))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def filter_cust(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["c_nationkey"], value_set=kset))

    cust_f = (cust.map_batches(filter_cust, batch_format="pyarrow")
              .rename_columns({"c_custkey": "o_custkey"}).materialize())
    if cust_f.count() == 0:
        return empty
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    o_c = orders.join(cust_f, join_type="inner",
                      num_partitions=scale.join_partitions(),
                      on=("o_custkey",))

    path = f"{sf_dir}/lineitem.parquet"
    li = ray.data.read_parquet(
        path,
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=((pc.field("l_shipdate") >= Q7_D0)
                & (pc.field("l_shipdate") < Q7_D1)),
        override_num_blocks=scale.read_blocks_for_path(path))
    li_oc = li.rename_columns({"l_orderkey": "o_orderkey"}).join(
        o_c, join_type="inner", num_partitions=scale.join_partitions(),
        on=("o_orderkey",))
    k1, k2 = keys

    def partial(t: pa.Table) -> pa.Table:
        skeys, snat = ray.get(sup_ref)
        lk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(skeys):
            pos = np.minimum(np.searchsorted(skeys, lk), len(skeys) - 1)
            s_nat = np.where(skeys[pos] == lk, snat[pos], -1)
        else:
            s_nat = np.full(len(lk), -1, np.int64)
        c_nat = (t["c_nationkey"].to_numpy(zero_copy_only=False)
                 .astype(np.int64))
        keep = ((s_nat == k1) & (c_nat == k2)) | ((s_nat == k2)
                                                  & (c_nat == k1))
        year = (t["l_shipdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[Y]").astype(np.int64) + 1970)[keep]
        p = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        d = _cents(t["l_discount"].to_numpy(zero_copy_only=False))
        qrev = (p * (100 - d))[keep]
        g = (pd.DataFrame({"s_nat": s_nat[keep], "c_nat": c_nat[keep],
                           "l_year": year, "qrev": qrev})
             .groupby(["s_nat", "c_nat", "l_year"], as_index=False)["qrev"]
             .sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (li_oc.map_batches(partial, batch_format="pyarrow")
          .groupby(["s_nat", "c_nat", "l_year"])
          .aggregate(Sum("qrev", alias_name="qrev"))
          .to_pandas())
    if df.empty:
        return empty
    df["supp_nation"] = df["s_nat"].map(names)
    df["cust_nation"] = df["c_nat"].map(names)
    df["l_year"] = df["l_year"].astype(np.int64)
    df["revenue"] = _r(df["qrev"] / 10000.0, 2)
    return (df[["supp_nation", "cust_nation", "l_year", "revenue"]]
            .sort_values(["supp_nation", "cust_nation", "l_year"])
            .reset_index(drop=True))


# --- Q13: customer order-count distribution (zero-join left-join shape) --------

Q13_EXCLUDE = "1-URGENT"


def q13_order_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: distribution of customers by number of qualifying
    orders, INCLUDING the zero-order bucket of the LEFT JOIN.

    Scale shape: the left join is never materialized — qualifying orders
    pre-count per custkey in batch partials, fold in a bucketed combine
    (custkey is corpus-cardinality: functions/combine.py), histogram
    per batch, and one tiny final groupby on the count value. The
    zero-order bucket is computed from two scalars (total customers −
    customers seen in orders), so the customer table contributes a COUNT
    and nothing else crosses the wire."""
    from .combine import bucketed_combine

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    empty = typed_empty(c_count="int64", custdist="int64")
    if n_cust == 0:
        return empty

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["o_orderpriority"],
                                  pa.scalar(Q13_EXCLUDE)))
        g = (pd.DataFrame(
                {"o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False)})
             .groupby("o_custkey", as_index=False).size()
             .rename(columns={"size": "n"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        per_cust = g.groupby("o_custkey", as_index=False)["n"].sum()
        h = (per_cust.groupby("n", as_index=False).size()
             .rename(columns={"n": "c_count", "size": "nc"}))
        return h

    hist = bucketed_combine(
        orders.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
        "o_custkey", fold)
    df = (hist.groupby("c_count")
          .aggregate(Sum("nc", alias_name="custdist")).to_pandas())
    n_with_orders = int(df["custdist"].sum()) if not df.empty else 0
    zero = n_cust - n_with_orders
    if zero > 0:
        df = pd.concat([df, pd.DataFrame({"c_count": [0],
                                          "custdist": [zero]})],
                       ignore_index=True)
    if df.empty:
        return empty
    df["c_count"] = df["c_count"].astype(np.int64)
    df["custdist"] = df["custdist"].astype(np.int64)
    return (df.sort_values(["custdist", "c_count"],
                           ascending=[False, False])
            .reset_index(drop=True))


# --- Q15: top supplier by quarter revenue (quantized-exact argmax) --------------

Q15_D0 = np.datetime64("1996-01-01", "us")
Q15_D1 = np.datetime64("1996-04-01", "us")


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum total revenue in a
    quarter — the revenue-view + argmax-subquery pattern.

    Exactness: the argmax over a FLOAT sum would be partitioning-lottery
    at the tie boundary, so revenue folds as exact int64 'cent×disc'
    units (price and discount both live on the 0.01 grid — verified —
    so round(p*100)·(100−round(d*100)) is an integer), the max and the
    winner filter compare integers, and only the displayed column
    converts to float. The oracle replays the same quantization in
    HUGEINT. Scale: date-pruned read, per-batch partials, one
    supplier-keyed groupby; the winner row set is result-sized."""
    path = f"{sf_dir}/lineitem.parquet"
    li = ray.data.read_parquet(
        path,
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=((pc.field("l_shipdate") >= Q15_D0)
                & (pc.field("l_shipdate") < Q15_D1)),
        override_num_blocks=scale.read_blocks_for_path(path))
    empty = typed_empty(s_suppkey="int64", s_name="object",
                        total_revenue="float64")

    def partial(t: pa.Table) -> pa.Table:
        p = round_half_away(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        d = round_half_away(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        g = (pd.DataFrame({
                "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
                "qrev": p * (100 - d)})
             .groupby("l_suppkey", as_index=False)["qrev"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
          .groupby("l_suppkey").aggregate(Sum("qrev", alias_name="qrev"))
          .to_pandas())
    if df.empty:
        return empty
    winners = df[df["qrev"] == df["qrev"].max()].copy()
    sup = collect_table(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]))
    sup = sup.filter(pc.is_in(
        sup["s_suppkey"],
        value_set=pa.array(winners["l_suppkey"].to_numpy(np.int64))))
    names = dict(zip(sup["s_suppkey"].to_pylist(),
                     sup["s_name"].to_pylist()))
    winners["s_suppkey"] = winners["l_suppkey"].astype(np.int64)
    winners["s_name"] = winners["s_suppkey"].map(names)
    winners["total_revenue"] = _r(winners["qrev"] / 10000.0, 2)
    return (winners[["s_suppkey", "s_name", "total_revenue"]]
            .sort_values("s_suppkey").reset_index(drop=True))


# --- Q17: small-quantity-order revenue (per-part avg gate, integer-exact) -------

Q17_BRAND = "Brand#23"


def q17_small_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of the part's average quantity — the correlated-AVG-subquery
    pattern.

    Exactness: ``qty < 0.2·avg(qty)`` is evaluated as the integer
    predicate ``5·qty·cnt < sum_qty`` (quantity is integral — verified),
    which is the same rational comparison with NO float in the gate, so
    membership cannot flip with partitioning; the oracle replays the
    integer form. Scale shape: the brand sliver of part broadcasts as a
    sorted key array; the lineitem sliver it selects is materialized
    once (pruned int columns, spillable) and re-used for both the
    per-part moment pass and the gated revenue pass; moments ride a
    small per-part groupby and rejoin the sliver DISTRIBUTED on partkey
    (at corpus scale the brand sliver of part is itself unbounded — a
    broadcast would not survive 100 TB)."""
    part = collect_table(_read(sf_dir, "part", ["p_partkey", "p_brand"]))
    part = part.filter(pc.equal(part["p_brand"], pa.scalar(Q17_BRAND)))
    pkeys = np.sort(part["p_partkey"].to_numpy().astype(np.int64))
    empty = pd.DataFrame({"avg_yearly": [0.0],
                          "n_lines": np.array([0], np.int64)})
    if not len(pkeys):
        return empty
    pkeys_ref = ray.put(pkeys)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])

    def filter_brand(t: pa.Table) -> pa.Table:
        pk = ray.get(pkeys_ref)
        lk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(pk, lk), len(pk) - 1)
        keep = pk[pos] == lk
        return pa.table({
            "l_partkey": pa.array(lk[keep]),
            "qty": pa.array(t["l_quantity"].to_numpy(zero_copy_only=False)
                            .astype(np.int64)[keep]),
            "l_extendedprice": t["l_extendedprice"].filter(
                pa.array(keep))})

    sliver = (li.map_batches(filter_brand, batch_format="pyarrow",
                             batch_size=65536).materialize())
    if sliver.count() == 0:
        return empty

    def moment_partial(t: pa.Table) -> pa.Table:
        g = (t.select(["l_partkey", "qty"]).to_pandas()
             .groupby("l_partkey", as_index=False)
             .agg(sq=("qty", "sum"), cnt=("qty", "size")))
        return pa.Table.from_pandas(g, preserve_index=False)

    stats = (sliver.map_batches(moment_partial, batch_format="pyarrow")
             .groupby("l_partkey")
             .aggregate(Sum("sq", alias_name="sq"),
                        Sum("cnt", alias_name="cnt")))
    gated = sliver.join(stats, join_type="inner",
                        num_partitions=scale.join_partitions(),
                        on=("l_partkey",))

    def rev_partial(t: pa.Table) -> pa.Table:
        keep = (5 * t["qty"].to_numpy(zero_copy_only=False)
                * t["cnt"].to_numpy(zero_copy_only=False)
                < t["sq"].to_numpy(zero_copy_only=False))
        price = _cents(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep])
        return pa.table({"rev": pa.array([int(price.sum())], pa.int64()),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    rev, n = 0, 0
    for b in (gated.map_batches(rev_partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=256)):
        rev += int(pc.sum(b["rev"]).as_py() or 0)
        n += int(pc.sum(b["n"]).as_py() or 0)
    return pd.DataFrame({
        "avg_yearly": [float(round_half_away(rev / 100.0 / 7.0, 2))],
        "n_lines": np.array([n], np.int64)})


# --- Q19: disjunctive-predicate revenue (broadcast part attrs, OR arms) ---------

Q19_ARMS = (("Brand#12", 15, 1, 15),   # (brand, max size, qty lo, qty hi)
            ("Brand#23", 25, 10, 25),
            ("Brand#4", 35, 20, 35))


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: revenue under a DISJUNCTION of (brand, size,
    quantity-range) arms — the classic OR-of-conjunctions predicate that
    defeats naive pushdown.

    Scale shape: what CAN be pushed down is (quantity ≤ global max arm),
    applied at the parquet read; the three brand slivers of part
    broadcast once as sorted (key → brand-arm, size) arrays and each arm
    evaluates as a vectorized mask in the map — the join never
    materializes, and the driver folds one partial row per batch."""
    part = collect_table(_read(sf_dir, "part",
                               ["p_partkey", "p_brand", "p_size"]))
    brands = [a[0] for a in Q19_ARMS]
    part = part.filter(pc.is_in(part["p_brand"],
                                value_set=pa.array(brands)))
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(pk)
    arm_of = {b: i for i, b in enumerate(brands)}
    arm = np.array([arm_of[b] for b in part["p_brand"].to_pylist()],
                   np.int64)[order]
    size = part["p_size"].to_numpy().astype(np.int64)[order]
    lookup_ref = ray.put((pk[order], arm, size))
    qty_cap = float(max(a[3] for a in Q19_ARMS))
    qty_floor = float(min(a[2] for a in Q19_ARMS))

    path = f"{sf_dir}/lineitem.parquet"
    li = ray.data.read_parquet(
        path,
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"],
        filter=((pc.field("l_quantity") >= qty_floor)
                & (pc.field("l_quantity") <= qty_cap)),
        override_num_blocks=scale.read_blocks_for_path(path))

    def partial(t: pa.Table) -> pa.Table:
        keys, arms, sizes = ray.get(lookup_ref)
        lk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys):
            pos = np.minimum(np.searchsorted(keys, lk), len(keys) - 1)
            hit = keys[pos] == lk
            p_arm = np.where(hit, arms[pos], -1)
            p_size = np.where(hit, sizes[pos], -1)
        else:
            p_arm = np.full(len(lk), -1, np.int64)
            p_size = np.zeros(len(lk), np.int64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(lk), bool)
        for i, (_, smax, qlo, qhi) in enumerate(Q19_ARMS):
            keep |= ((p_arm == i) & (p_size >= 1) & (p_size <= smax)
                     & (qty >= qlo) & (qty <= qhi))
        pq = _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
        dq = _cents(t["l_discount"].to_numpy(zero_copy_only=False))
        qrev = (pq * (100 - dq))[keep]
        return pa.table({"rev": pa.array([int(qrev.sum())], pa.int64()),
                         "n": pa.array([int(keep.sum())], pa.int64())})

    rev, n = 0, 0
    for b in (li.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
              .iter_batches(batch_format="pyarrow", batch_size=256)):
        rev += int(pc.sum(b["rev"]).as_py() or 0)
        n += int(pc.sum(b["n"]).as_py() or 0)
    return pd.DataFrame({
        "revenue": [float(round_half_away(rev / 10000.0, 2))],
        "n_lines": np.array([n], np.int64)})


# --- Q21: suppliers who kept orders waiting (multi-EXISTS as one combine) -------

def q21_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21 shape adapted to this schema (no commit/receipt dates):
    for completed orders ('F'), count per supplier the orders where that
    supplier had a RETURNED line ('R'), at least one OTHER supplier
    participated, and NO other supplier had a returned line — the
    EXISTS + NOT-EXISTS double correlation.

    Scale shape: both correlations collapse into ONE bucketed combine —
    rows bucket by splitmix64(orderkey), so every order's (supplier,
    failed) partials land whole in a single group, where per-order
    n_supp / n_failed are computed vectorized and the predicate applied
    without a second shuffle. Only surviving (orderkey, suppkey) pairs
    join the 'F'-status sliver of orders DISTRIBUTED; the per-supplier
    count is the final result-sized groupby."""
    from .combine import bucketed_combine

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_returnflag"])
    empty = typed_empty(s_name="object", numwait="int64")

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False),
            "l_suppkey": t["l_suppkey"].to_numpy(zero_copy_only=False),
            "failed": pc.equal(t["l_returnflag"], pa.scalar("R"))
                        .to_numpy(zero_copy_only=False).astype(np.int64)})
        g = (df.groupby(["l_orderkey", "l_suppkey"], as_index=False)
             ["failed"].max())
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        ls = (g.groupby(["l_orderkey", "l_suppkey"], as_index=False)
              ["failed"].max())
        st = (ls.groupby("l_orderkey", as_index=False)
              .agg(n_supp=("l_suppkey", "size"), n_failed=("failed", "sum")))
        m = ls.merge(st, on="l_orderkey")
        m = m[(m["failed"] == 1) & (m["n_supp"] > 1) & (m["n_failed"] == 1)]
        return m[["l_orderkey", "l_suppkey"]]

    pairs = bucketed_combine(
        li.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "l_orderkey", per_order)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    def filter_f(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], pa.scalar("F")))
        return pa.table({"l_orderkey": t["o_orderkey"]})

    orders_f = (orders.map_batches(filter_f, batch_format="pyarrow")
                .materialize())
    pairs = pairs.materialize()
    if orders_f.count() == 0 or pairs.count() == 0:
        return empty
    joined = pairs.join(orders_f, join_type="inner",
                        num_partitions=scale.join_partitions(),
                        on=("l_orderkey",))
    df = (joined.groupby("l_suppkey")
          .aggregate(Count(alias_name="numwait")).to_pandas())
    if df.empty:
        return empty
    sup = collect_table(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]))
    names = dict(zip(sup["s_suppkey"].to_pylist(),
                     sup["s_name"].to_pylist()))
    df["s_name"] = df["l_suppkey"].map(names)
    df["numwait"] = df["numwait"].astype(np.int64)
    return (df[["s_name", "numwait"]]
            .sort_values(["numwait", "s_name"], ascending=[False, True])
            .head(100).reset_index(drop=True))


# --- robust per-group statistics: exact median + MAD ----------------------------

def q_median_mad(sf_dir: str) -> pd.DataFrame:
    """Per-event-type robust center/spread: exact continuous median of
    ``value`` and the median absolute deviation around it — the
    outlier-insensitive counterpart of q_value_zscore's moments.

    Exactness: both medians use numpy's 'linear' interpolation, which
    mirrors DuckDB ``quantile_cont`` bit-for-bit (the q_group_quantiles
    precedent); |v − med| is one IEEE subtraction identical on both
    sides. Scale shape: event_type is the few-hot-keys case — ONE
    groupby shuffle carrying only (type, value); both medians compute
    vectorized inside the group. Past ~10^9 rows per group the exact
    sort gives way to the bottom-k / histogram sketch path
    (approx_group_quantiles) — documented, not needed at bench scale."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def robust(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy(np.float64)
        med = np.quantile(np.sort(v), 0.5, method="linear")
        mad = np.quantile(np.sort(np.abs(v - med)), 0.5, method="linear")
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_events": np.array([len(v)], np.int64),
            "median_value": _r(pd.Series([med]), 4).to_numpy(),
            "mad_value": _r(pd.Series([mad]), 4).to_numpy()})

    df = (ds.groupby("event_type").map_groups(robust, batch_format="pandas")
          .to_pandas())
    if df.empty:
        return typed_empty(event_type="object", n_events="int64",
                           median_value="float64", mad_value="float64")
    return df.sort_values("event_type").reset_index(drop=True)


# --- FIRST_VALUE / LAST_VALUE per user (reducible endpoint aggregate) -----------

def q_first_last(sf_dir: str) -> Dataset:
    """Per-user first and last ``event_type`` in (ts, event_id) order plus
    the event count — SQL FIRST_VALUE/LAST_VALUE, but expressed as a
    REDUCIBLE aggregate instead of a window: endpoints distribute over
    batch partials (the global first is the min of batch-local firsts),
    so no per-user sort or window pass ever runs — each batch reduces to
    one row per (user, batch) and a bucketed combine (splitmix64(user))
    folds them vectorized. Corpus-sized output → streaming Dataset."""
    from .combine import bucketed_combine

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "ts": t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_numpy(zero_copy_only=False)})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", as_index=False)
        out = g.agg(n_events=("event_id", "size"))
        first = g.nth(0).reset_index(drop=True)
        last = g.nth(-1).reset_index(drop=True)
        out["fts"], out["fid"], out["ftype"] = (
            first["ts"], first["event_id"], first["event_type"])
        out["lts"], out["lid"], out["ltype"] = (
            last["ts"], last["event_id"], last["event_type"])
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        fst = (g.sort_values(["user_id", "fts", "fid"], kind="mergesort")
               .groupby("user_id", as_index=False).nth(0))
        lst = (g.sort_values(["user_id", "lts", "lid"], kind="mergesort")
               .groupby("user_id", as_index=False).nth(-1))
        n = g.groupby("user_id", as_index=False)["n_events"].sum()
        out = pd.DataFrame({
            "user_id": n["user_id"].to_numpy(np.int64),
            "n_events": n["n_events"].to_numpy(np.int64),
            "first_type": fst.sort_values("user_id")["ftype"].to_numpy(),
            "last_type": lst.sort_values("user_id")["ltype"].to_numpy()})
        return out

    return ensure_schema(
        bucketed_combine(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
            "user_id", fold),
        pa.schema([("user_id", pa.int64()), ("n_events", pa.int64()),
                   ("first_type", pa.string()), ("last_type", pa.string())]))


# --- Q8: nation market share (quantized-exact ratio of sums) --------------------

Q8_NATION = "NATION_3"
Q8_REGION = "EUROPE"
Q8_D0 = np.datetime64("1996-01-01", "us")
Q8_D1 = np.datetime64("1998-01-01", "us")


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape: one nation's share of supplier revenue among a
    region's customers, per order year.

    Exactness: the share is a RATIO of two sums — float partials would
    make the quotient partitioning-dependent in the last bits, so both
    numerator and denominator fold as exact int64 cent×(100−disc%) units
    and ONE IEEE division runs at the end (the q15 quantization). Scale
    shape = q5's star: region→nation dimension chain and the supplier
    nation map broadcast; customer-region sliver joins orders
    DISTRIBUTED, lineitem joins the surviving orders; per-batch partials
    keyed by (year, is_target_nation)."""
    empty = typed_empty(o_year="int64", mkt_share="float64")
    nat = collect_table(_read(sf_dir, "nation",
                              ["n_nationkey", "n_name", "n_regionkey"]))
    reg = collect_table(_read(sf_dir, "region", ["r_regionkey", "r_name"]))
    rkeys = reg.filter(pc.equal(reg["r_name"], Q8_REGION))["r_regionkey"]
    cust_nkeys = (nat.filter(pc.is_in(nat["n_regionkey"], value_set=rkeys))
                  ["n_nationkey"].combine_chunks())
    target = nat.filter(pc.equal(nat["n_name"], Q8_NATION))["n_nationkey"]
    if not len(target) or not len(cust_nkeys):
        return empty
    target_key = int(target[0].as_py())

    sup = collect_table(_read(sf_dir, "supplier",
                              ["s_suppkey", "s_nationkey"]))
    sk = sup["s_suppkey"].to_numpy()
    order = np.argsort(sk)
    sup_ref = ray.put((sk[order],
                       sup["s_nationkey"].to_numpy()[order].astype(np.int64)))
    ckeys_ref = ray.put(cust_nkeys.sort())

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def filter_cust(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["c_nationkey"],
                              value_set=ray.get(ckeys_ref)))
        return pa.table({"o_custkey": t["c_custkey"]})

    cust_f = (cust.map_batches(filter_cust, batch_format="pyarrow")
              .materialize())
    if cust_f.count() == 0:
        return empty

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def filter_orders(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"],
                                              pa.scalar(Q8_D0)),
                             pc.less(t["o_orderdate"], pa.scalar(Q8_D1))))
        return pa.table({
            "o_orderkey": t["o_orderkey"], "o_custkey": t["o_custkey"],
            "o_year": pa.array(
                t["o_orderdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[Y]").astype(np.int64) + 1970)})

    orders_f = (orders.map_batches(filter_orders, batch_format="pyarrow")
                .materialize())
    if orders_f.count() == 0:
        return empty
    o_c = orders_f.join(cust_f, join_type="inner",
                        num_partitions=scale.join_partitions(),
                        on=("o_custkey",))
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    li_oc = li.rename_columns({"l_orderkey": "o_orderkey"}).join(
        o_c, join_type="inner", num_partitions=scale.join_partitions(),
        on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        skeys, snat = ray.get(sup_ref)
        lk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(skeys):
            pos = np.minimum(np.searchsorted(skeys, lk), len(skeys) - 1)
            s_nat = np.where(skeys[pos] == lk, snat[pos], -1)
        else:
            s_nat = np.full(len(lk), -1, np.int64)
        p = round_half_away(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        d = round_half_away(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        g = (pd.DataFrame({
                "o_year": t["o_year"].to_numpy(zero_copy_only=False),
                "qv": p * (100 - d),
                "qt": np.where(s_nat == target_key, p * (100 - d), 0)})
             .groupby("o_year", as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (li_oc.map_batches(partial, batch_format="pyarrow")
          .groupby("o_year")
          .aggregate(Sum("qv", alias_name="qv"), Sum("qt", alias_name="qt"))
          .to_pandas())
    if df.empty:
        return empty
    df["o_year"] = df["o_year"].astype(np.int64)
    df["mkt_share"] = _r(df["qt"] / df["qv"], 6)
    return (df[["o_year", "mkt_share"]]
            .sort_values("o_year").reset_index(drop=True))


# --- Q9: product-line profit by supplier nation and year ------------------------

Q9_WORD = "red"


def q9_product_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 shape (adapted: cost = p_retailprice·quantity — this
    schema has no partsupp): profit per supplier nation per order year
    over parts whose name contains a word.

    Exactness: profit folds as exact int64 — revenue in cent×(100−d%)
    units and cost in cent·quantity units scaled to the same 10⁻⁴ grid —
    so the per-(nation, year) sums are partitioning-independent and ONE
    float division converts at the end. Scale shape: the name-filtered
    part sliver and the supplier→nation map broadcast (sorted-key
    probes); lineitem joins date-carrying orders DISTRIBUTED; per-batch
    partials keyed by the 25×7 (nation, year) grid."""
    empty = typed_empty(nation="object", o_year="int64",
                        sum_profit="float64")
    nat = collect_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    names = dict(zip(nat["n_nationkey"].to_pylist(),
                     nat["n_name"].to_pylist()))
    part = collect_table(_read(sf_dir, "part",
                               ["p_partkey", "p_name", "p_retailprice"]))
    part = part.filter(pc.match_substring(part["p_name"], Q9_WORD))
    pk = np.sort(part["p_partkey"].to_numpy().astype(np.int64))
    if not len(pk):
        return empty
    pk_ref = ray.put(pk)
    sup = collect_table(_read(sf_dir, "supplier",
                              ["s_suppkey", "s_nationkey"]))
    sk = sup["s_suppkey"].to_numpy()
    order = np.argsort(sk)
    sup_ref = ray.put((sk[order],
                       sup["s_nationkey"].to_numpy()[order].astype(np.int64)))
    # part retail price lookup rides with the key sliver (cent grid)
    pprice = round_half_away(
        part["p_retailprice"].to_numpy() * 100.0, 0).astype(np.int64)
    p_order = np.argsort(part["p_partkey"].to_numpy().astype(np.int64))
    pprice_ref = ray.put(pprice[p_order])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def order_year(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_year": pa.array(
                t["o_orderdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[Y]").astype(np.int64) + 1970)})

    orders_y = (orders.map_batches(order_year, batch_format="pyarrow")
                .materialize())

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                "l_extendedprice", "l_discount"])

    def filter_parts(t: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        lk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(keys, lk), len(keys) - 1)
        keep = keys[pos] == lk
        t = t.filter(pa.array(keep))
        return t.append_column(
            "ppos", pa.array(np.searchsorted(keys,
                                             lk[keep]).astype(np.int64)))

    sliver = (li.map_batches(filter_parts, batch_format="pyarrow",
                             batch_size=65536)
              .rename_columns({"l_orderkey": "o_orderkey"}).materialize())
    if sliver.count() == 0 or orders_y.count() == 0:
        return empty
    j = sliver.join(orders_y, join_type="inner",
                    num_partitions=scale.join_partitions(),
                    on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        skeys, snat = ray.get(sup_ref)
        prices = ray.get(pprice_ref)
        lk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        if len(skeys):
            pos = np.minimum(np.searchsorted(skeys, lk), len(skeys) - 1)
            s_nat = np.where(skeys[pos] == lk, snat[pos], -1)
        else:
            s_nat = np.full(len(lk), -1, np.int64)
        p = round_half_away(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        d = round_half_away(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0,
            0).astype(np.int64)
        qty = (t["l_quantity"].to_numpy(zero_copy_only=False)
               .astype(np.int64))
        cost = prices[t["ppos"].to_numpy(zero_copy_only=False)] * qty
        # both terms on the 1e-4 dollar grid: rev already is; cost is on
        # the cent grid, scaled by 100
        profit = p * (100 - d) - cost * 100
        g = (pd.DataFrame({
                "nkey": s_nat,
                "o_year": t["o_year"].to_numpy(zero_copy_only=False),
                "qp": profit})
             .groupby(["nkey", "o_year"], as_index=False)["qp"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (j.map_batches(partial, batch_format="pyarrow")
          .groupby(["nkey", "o_year"])
          .aggregate(Sum("qp", alias_name="qp")).to_pandas())
    if df.empty:
        return empty
    df["nation"] = df["nkey"].map(names)
    df["o_year"] = df["o_year"].astype(np.int64)
    df["sum_profit"] = _r(df["qp"] / 10000.0, 2)
    return (df[["nation", "o_year", "sum_profit"]]
            .sort_values(["nation", "o_year"], ascending=[True, False])
            .reset_index(drop=True))


# --- cohort retention (first-activity day × day offset) -------------------------

def q_retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Day-grained cohort retention: users cohort by their FIRST event
    day; for every later active day, count distinct cohort users active
    at that day offset — the activation/retention matrix of product
    analytics.

    Scale shape: one bucketed combine on splitmix64(user_id) does
    everything user-local — each batch emits per-(user, day) presence
    partials, the fold computes each user's min-day and day offsets
    vectorized (all-integer day arithmetic), and the only other shuffle
    is the result-sized (cohort_day, offset) count. All values integer →
    hash-exact."""
    from .combine import bucketed_combine

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        days = (t["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[D]").astype(np.int64))
        df = (pd.DataFrame({
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "day": days}).drop_duplicates())
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        first = (g.groupby("user_id")["day"].transform("min")
                 .to_numpy(np.int64))
        day = g["day"].to_numpy(np.int64)
        out = (pd.DataFrame({"cohort_day": first,
                             "day_offset": day - first})
               .groupby(["cohort_day", "day_offset"], as_index=False)
               .size().rename(columns={"size": "n_active"}))
        return out

    df = (bucketed_combine(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
            "user_id", fold)
          .groupby(["cohort_day", "day_offset"])
          .aggregate(Sum("n_active", alias_name="n_active"))
          .to_pandas())
    if df.empty:
        return typed_empty(cohort_day="object", day_offset="int64",
                           n_active="int64")
    df["cohort_day"] = pd.Series(
        df["cohort_day"].to_numpy(np.int64).astype("datetime64[D]")
        .astype("datetime64[us]")).dt.strftime("%Y-%m-%d")
    df["day_offset"] = df["day_offset"].astype(np.int64)
    df["n_active"] = df["n_active"].astype(np.int64)
    return (df.sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True))


# --- corpus-wide NTILE (two-pass range-partitioned global rank) ------------------

DECILE_N = 10
DECILE_SAMPLE_K = 4096


def q_length_decile(sf_dir: str) -> Dataset:
    """NTILE(10) over the WHOLE corpus ordered by (n_chars, doc_id) — the
    curriculum / length-bucketing assignment step, i.e. a global window
    with no partition key.

    Same two-pass range-partition contract as q_event_rank, single
    group: (1) a mergeable bottom-k hash sample fixes n_chars boundary
    values; tie runs can never split because bucket assignment is
    ``searchsorted`` on n_chars alone; (2) exact per-bucket counts give
    each bucket its global offset; (3) one groupby(bucket) shuffle
    sorts locally by (n_chars, doc_id) and applies DuckDB's ntile fill
    (first N%10 tiles get the extra row) from the broadcast offsets.
    Corpus-sized output → streaming Dataset."""
    from .sketch import _bottomk_rows

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    nb = scale.read_blocks()

    def sample_partial(t: pa.Table) -> pa.Table:
        t = pa.table({"event_type": pa.array(["_"] * t.num_rows),
                      "value": t["n_chars"].cast(pa.float64()),
                      "event_id": t["doc_id"]})
        return pa.Table.from_pandas(_bottomk_rows(t, DECILE_SAMPLE_K),
                                    preserve_index=False)

    sample = (docs.map_batches(sample_partial, batch_format="pyarrow")
              .map_batches(
                  lambda t: pa.Table.from_pandas(
                      t.to_pandas().nsmallest(DECILE_SAMPLE_K, "h"),
                      preserve_index=False),
                  batch_format="pyarrow")
              .to_pandas())
    if sample.empty:
        return ensure_schema(
            ray.data.from_arrow(pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_chars": pa.array([], pa.int64()),
                "tile": pa.array([], pa.int64())})),
            pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64()),
                       ("tile", pa.int64())]))
    sample = sample.nsmallest(DECILE_SAMPLE_K, "h")
    bnds = np.unique(np.quantile(sample["value"].to_numpy(),
                                 np.arange(1, nb) / nb))
    bnd_ref = ray.put(bnds)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = ray.get(bnd_ref)
        v = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "bkt", pa.array(np.searchsorted(b, v, side="right")
                            .astype(np.int64)))

    bucketed = docs.map_batches(add_bucket, batch_format="pyarrow")

    def count_partial(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({"bkt": t["bkt"].to_numpy(zero_copy_only=False)})
             .groupby("bkt", as_index=False).size()
             .rename(columns={"size": "n"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (bucketed.map_batches(count_partial, batch_format="pyarrow")
              .groupby("bkt").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    arr = np.zeros(nb + 1, np.int64)
    arr[counts["bkt"].to_numpy()] = counts["n"].to_numpy(np.int64)
    offsets = np.concatenate(([0], np.cumsum(arr)[:-1]))
    total = int(arr.sum())
    off_ref = ray.put(offsets)
    base, rem = total // DECILE_N, total % DECILE_N
    cut = rem * (base + 1)

    def tile_group(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["n_chars", "doc_id"], kind="mergesort")
        pos = offs[int(g["bkt"].iat[0])] + np.arange(len(g),
                                                     dtype=np.int64)
        safe = max(base, 1)
        tile = np.where(pos < cut, pos // (base + 1) + 1,
                        rem + np.maximum(pos - cut, 0) // safe + 1)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_chars": g["n_chars"].to_numpy(np.int64),
            "tile": tile.astype(np.int64)})

    return ensure_schema(
        bucketed.groupby("bkt").map_groups(tile_group,
                                           batch_format="pandas"),
        pa.schema([("doc_id", pa.int64()), ("n_chars", pa.int64()),
                   ("tile", pa.int64())]))


# --- event-type transition matrix (Markov counts + probabilities) ---------------

def q_event_transitions(sf_dir: str) -> pd.DataFrame:
    """(prev_type → next_type) transition counts over each user's
    chronological event sequence, with transition probabilities — the
    behavior-Markov-model estimation step (LAG adjacency at corpus
    scale).

    Scale shape: adjacency needs each user's rows co-located and ordered
    — ONE bucketed shuffle on ``user_id & 255`` (the q_sessionize
    contract), a vectorized multi-user consecutive-pair scan inside the
    bucket, then a result-sized (25-cell) groupby. Probabilities are
    ratios of exact integers → one IEEE division per cell."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        ty = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        out = (pd.DataFrame({"prev_type": ty[:-1][same],
                             "next_type": ty[1:][same]})
               .groupby(["prev_type", "next_type"], as_index=False)
               .size().rename(columns={"size": "n"}))
        return out

    df = (ds.map_batches(_user_bucketizer(), batch_format="pyarrow")
          .groupby("bucket").map_groups(pairs, batch_format="pandas")
          .groupby(["prev_type", "next_type"])
          .aggregate(Sum("n", alias_name="n"))
          .to_pandas())
    if df.empty:
        return typed_empty(prev_type="object", next_type="object",
                           n="int64", p="float64")
    df["n"] = df["n"].astype(np.int64)
    tot = df.groupby("prev_type")["n"].transform("sum")
    df["p"] = _r(df["n"] / tot, 6)
    return (df[["prev_type", "next_type", "n", "p"]]
            .sort_values(["prev_type", "next_type"]).reset_index(drop=True))


# --- exponentially decayed per-user value (libm-pow exact) -----------------------

DECAY_ALPHA = 0.9


def q_decayed_value(sf_dir: str) -> Dataset:
    """Per-user exponentially decayed value score — most recent event at
    weight 1, each step back ×0.9 (the recency-weighted engagement /
    freshness signal).

    Exactness: each term quantizes to ``floor(qv · 0.9^k · 1e6)`` with
    qv = round(value·1000) — the power table comes from ``math.pow``
    (glibc libm, bit-identical to DuckDB ``pow``; np.power is NOT), the
    multiplies are IEEE, and the per-user sum folds as exact integers,
    so the score is partitioning-independent and the oracle replays it
    term-for-term. Scale shape: one bucketed shuffle, vectorized
    multi-user reverse-position scan inside the bucket; corpus-sized
    per-user output → streaming Dataset."""
    import math

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def decay(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ascending=[True, False, False], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        n = len(g)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        sizes = np.diff(np.r_[starts, n])
        k = np.arange(n) - np.repeat(starts, sizes)   # 0 = most recent
        qv = round_half_away(g["value"].to_numpy(np.float64) * 1000.0,
                             0)
        powt = np.array([math.pow(DECAY_ALPHA, int(i))
                         for i in range(int(k.max()) + 1 if n else 1)])
        terms = np.floor(qv * powt[k] * 1e6).astype(np.int64)
        out = (pd.DataFrame({"user_id": uid, "t": terms})
               .groupby("user_id", as_index=False)
               .agg(s=("t", "sum"), n_events=("t", "size")))
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy(np.int64),
            "n_events": out["n_events"].to_numpy(np.int64),
            "decayed_value": round_half_away(
                out["s"].to_numpy(np.float64) / 1e9, 6)})

    return ensure_schema(
        ds.map_batches(_user_bucketizer(), batch_format="pyarrow")
          .groupby("bucket").map_groups(decay, batch_format="pandas"),
        pa.schema([("user_id", pa.int64()), ("n_events", pa.int64()),
                   ("decayed_value", pa.float64())]))


# --- per-user favorite event type (grouped mode with deterministic ties) ---------

def q_user_favorite(sf_dir: str) -> Dataset:
    """Each user's most frequent event type (count DESC, type ASC on
    ties) with its count and the user's total — grouped MODE, the
    categorical profile column of a feature store.

    Scale shape: mode is NOT reducible from raw rows, but per-(user,
    type) counts are — batch partials shrink to one row per (user, type,
    batch), a bucketed combine folds them and takes the per-user argmax
    vectorized in the same pass (sort by count DESC/type ASC + take
    group head). All integers → hash-exact. Corpus-sized output →
    streaming Dataset."""
    from .combine import bucketed_combine

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_numpy(
                    zero_copy_only=False)})
             .groupby(["user_id", "event_type"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.groupby(["user_id", "event_type"], as_index=False)["n"]
             .sum())
        tot = c.groupby("user_id", as_index=False)["n"].sum()
        c = c.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        top = c.groupby("user_id", as_index=False).head(1)
        out = top.merge(tot, on="user_id", suffixes=("_fav", "_tot"))
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy(np.int64),
            "favorite_type": out["event_type"].to_numpy(),
            "n_fav": out["n_fav"].to_numpy(np.int64),
            "n_events": out["n_tot"].to_numpy(np.int64)})

    return ensure_schema(
        bucketed_combine(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
            "user_id", fold),
        pa.schema([("user_id", pa.int64()), ("favorite_type", pa.string()),
                   ("n_fav", pa.int64()), ("n_events", pa.int64())]))


# --- user set algebra (INTERSECT ∩ minus EXCEPT as one reducible pass) -----------

def q_user_set_algebra(sf_dir: str) -> pd.DataFrame:
    """Users who error more often than they purchase AND have signed up —
    (error-heavy ∩ signups), the multi-set-membership cohort query
    usually written as INTERSECT/EXCEPT chains (a plain intersection of
    literal member sets is degenerate on this corpus — every user holds
    every type — so the sets are count-conditional).

    Scale shape: set membership reduces to per-(user, flag) counts, so
    the three set ops collapse into ONE bucketed combine over per-batch
    conditional-count partials — no distinct-materialization per set, no
    repeated scans. All integers → hash-exact."""
    from .combine import bucketed_combine

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "n_purchase": (ty == "purchase").astype(np.int64),
            "n_error": (ty == "error").astype(np.int64),
            "n_signup": (ty == "signup").astype(np.int64)})
        return pa.Table.from_pandas(
            df.groupby("user_id", as_index=False).sum(),
            preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("user_id", as_index=False).sum()
        c = c[(c["n_error"] > c["n_purchase"]) & (c["n_signup"] > 0)]
        return c[["user_id", "n_purchase", "n_error"]].astype(np.int64)

    df = bucketed_combine(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "user_id", fold).to_pandas()
    if df.empty:
        return typed_empty(user_id="int64", n_purchase="int64",
                           n_error="int64")
    return df.sort_values("user_id").reset_index(drop=True)


# --- dense calendar gap fill (dimension densification) ---------------------------

def q_daily_type_fill(sf_dir: str) -> pd.DataFrame:
    """Per-(day, event_type) counts over a DENSE calendar — every day in
    [min, max] × every type appears, zero-filled — the
    generate_series/scaffold join that turns sparse logs into
    regression-ready time series.

    Scale shape: the sparse counts pre-aggregate per batch (day-grain
    ints) into one small groupby; the dense grid is RESULT-sized (days ×
    types), so the scaffold cross join and zero fill run on the driver —
    no distributed row is ever manufactured just to be zero."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        days = (t["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[D]").astype(np.int64))
        g = (pd.DataFrame({
                "day": days,
                "event_type": t["event_type"].to_numpy(
                    zero_copy_only=False)})
             .groupby(["day", "event_type"], as_index=False)
             .size().rename(columns={"size": "n"}))
        return pa.Table.from_pandas(g, preserve_index=False)

    df = (ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
          .groupby(["day", "event_type"])
          .aggregate(Sum("n", alias_name="n")).to_pandas())
    if df.empty:
        return typed_empty(day="object", event_type="object",
                           n_events="int64")
    days = np.arange(df["day"].min(), df["day"].max() + 1, dtype=np.int64)
    types = sorted(df["event_type"].unique())
    grid = pd.MultiIndex.from_product([days, types],
                                      names=["day", "event_type"])
    out = (df.set_index(["day", "event_type"])["n"]
           .reindex(grid, fill_value=0).reset_index()
           .rename(columns={"n": "n_events"}))
    out["day"] = pd.Series(
        out["day"].to_numpy(np.int64).astype("datetime64[D]")
        .astype("datetime64[us]")).dt.strftime("%Y-%m-%d")
    out["n_events"] = out["n_events"].astype(np.int64)
    return (out.sort_values(["day", "event_type"])
            .reset_index(drop=True))


# --- measure UNPIVOT (wide → long multi-measure profile) -------------------------

UNPIVOT_MEASURES = ("discount", "extendedprice", "quantity", "tax")


def q_measure_unpivot(sf_dir: str) -> pd.DataFrame:
    """Lineitem's four numeric measures UNPIVOTed to long form with
    per-measure count/total/min/max — the column-profiling pass of a
    data-quality monitor.

    Scale shape: the unpivot never materializes — each batch folds its
    four columns into FOUR partial rows (not 4× the input rows), and the
    final groupby moves 4 × n_batches rows. The wide read is pruned to
    exactly the measure columns."""
    ds = _read(sf_dir, "lineitem",
               ["l_discount", "l_extendedprice", "l_quantity", "l_tax"])
    cols = {"discount": "l_discount", "extendedprice": "l_extendedprice",
            "quantity": "l_quantity", "tax": "l_tax"}

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for m, c in cols.items():
            v = t[c].to_numpy(zero_copy_only=False)
            rows.append((m, len(v), float(v.sum()), float(v.min()),
                         float(v.max())))
        return pa.table({
            "measure": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "total": pa.array([r[2] for r in rows], pa.float64()),
            "vmin": pa.array([r[3] for r in rows], pa.float64()),
            "vmax": pa.array([r[4] for r in rows], pa.float64())})

    df = (ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=65536)
          .groupby("measure")
          .aggregate(Sum("n", alias_name="n"),
                     Sum("total", alias_name="total"),
                     Min("vmin", alias_name="vmin"),
                     Max("vmax", alias_name="vmax"))
          .to_pandas())
    if df.empty:
        return typed_empty(measure="object", n="int64", total="float64",
                           vmin="float64", vmax="float64")
    df["n"] = df["n"].astype(np.int64)
    for c in ("total", "vmin", "vmax"):
        df[c] = _r(df[c], 2)
    return (df[["measure", "n", "total", "vmin", "vmax"]]
            .sort_values("measure").reset_index(drop=True))


# --- behavioral conversion funnel ----------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered conversion funnel view → click → purchase: a user converts
    at step k iff an event of that type occurs STRICTLY AFTER their step
    k−1 conversion time (min-ts semantics at every step). Output: one row
    per step with the converted-user count and the conversion fraction vs
    the previous step (step 1 vs all active users) — the classic
    product-analytics funnel as a distributed operator.

    Ray shape: the shared ``_user_bucketizer`` hash-bucket shuffle
    co-locates each user's events; inside a bucket the three step times
    are vectorized pandas min-merges (no per-user Python), and each bucket
    emits ONE 4-int partial row — the driver folds ~NB rows. Fractions are
    single divisions of identical int64 counts on both engines, so the
    oracle hash is exact."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        s1 = (g[g["event_type"] == FUNNEL_STEPS[0]]
              .groupby("user_id", as_index=False)["ts"].min()
              .rename(columns={"ts": "t1"}))
        m2 = g[g["event_type"] == FUNNEL_STEPS[1]].merge(s1, on="user_id")
        s2 = (m2[m2["ts"] > m2["t1"]]
              .groupby("user_id", as_index=False)["ts"].min()
              .rename(columns={"ts": "t2"}))
        m3 = g[g["event_type"] == FUNNEL_STEPS[2]].merge(s2, on="user_id")
        s3 = (m3[m3["ts"] > m3["t2"]]
              .groupby("user_id", as_index=False)["ts"].min())
        return pd.DataFrame({"n0": [int(g["user_id"].nunique())],
                             "n1": [len(s1)], "n2": [len(s2)],
                             "n3": [len(s3)]})

    parts = (ds.map_batches(_user_bucketizer(), batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(bucket_counts, batch_format="pandas")
               .to_pandas())
    if parts.empty:
        # empty corpus/partition: zero-row result with the normal columns
        # (the engine-wide empty-safety contract, test_empty_corpus)
        return pd.DataFrame({"step": pd.Series([], dtype="object"),
                             "n_users": pd.Series([], dtype="int64"),
                             "frac_prev": pd.Series([], dtype="float64")})
    n0, n1, n2, n3 = (int(parts[c].sum())
                      for c in ("n0", "n1", "n2", "n3"))
    counts = [n1, n2, n3]
    prev = [n0, n1, n2]
    frac = [float(_r(pd.Series([c / p]), 6).iloc[0]) if p else 0.0
            for c, p in zip(counts, prev)]
    return pd.DataFrame({"step": list(FUNNEL_STEPS),
                         "n_users": pd.Series(counts, dtype="int64"),
                         "frac_prev": pd.Series(frac, dtype="float64")})


# --- global watermark lateness (un-partitioned prefix scan) -------------------

def q_watermark_lateness(sf_dir: str) -> Dataset:
    """Per-event watermark lateness: with arrival order = ``event_id`` and
    watermark = max event-time seen so far, ``lateness_s = watermark - sec``
    (0 for in-order events) — the streaming-ingestion out-of-orderness
    diagnostic that sizes allowed-lateness windows.

    Unlike the per-user windows (hash buckets, keys independent), this is a
    GLOBAL prefix scan — no partition key — so the distributed form is the
    classic two-phase scan: (1) range-bucket arrival order
    (``bucket = event_id * NB // (max_id + 1)``, contiguous arrival
    ranges), per-bucket max partials reduce to NB ints on the driver,
    which takes the EXCLUSIVE prefix max; (2) one bucket shuffle, each
    group sorts its range locally and runs a vectorized
    ``np.maximum.accumulate`` seeded with its bucket's carry-in. No global
    sort; the only all-to-all is the one bucket groupby, and the carry-in
    sliver is NB-sized regardless of corpus size."""
    ds = _read(sf_dir, "events", ["event_id", "ts"])

    agg = ds.aggregate(Max("event_id"))
    max_id = agg["max(event_id)"]
    if max_id is None:
        return ensure_schema(
            ray.data.from_arrow(pa.table({
                "event_id": pa.array([], pa.int64()),
                "lateness_s": pa.array([], pa.int64()),
                "is_late": pa.array([], pa.int64())})),
            pa.schema([("event_id", pa.int64()), ("lateness_s", pa.int64()),
                       ("is_late", pa.int64())]))
    n = int(max_id) + 1
    # arrival-order range buckets for the two-phase scan: cluster-derived
    # (floor 64 = the tuned single-VM width), captured by every closure
    nb = scale.pow2_buckets(floor=64)

    def bucketize(t: pa.Table) -> pa.Table:
        e = t["event_id"].to_numpy(zero_copy_only=False)
        sec = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
               // 1_000_000)
        b = e * nb // n
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "event_id": pa.array(e, pa.int64()),
                         "sec": pa.array(sec, pa.int64())})

    rows = ds.map_batches(bucketize, batch_format="pyarrow").materialize()

    def bucket_max(t: pa.Table) -> pa.Table:
        tb = (t.group_by("bucket").aggregate([("sec", "max")])
              .rename_columns(["bucket", "m"]))
        return tb

    bm = (rows.map_batches(bucket_max, batch_format="pyarrow",
                           batch_size=None)
          .groupby("bucket").aggregate(Max("m", alias_name="bmax"))
          .to_pandas())
    carry = np.full(nb, np.iinfo(np.int64).min, np.int64)
    have = bm["bucket"].to_numpy(np.int64)
    carry[have] = bm["bmax"].to_numpy(np.int64)
    excl = np.full(nb, np.iinfo(np.int64).min, np.int64)
    excl[1:] = np.maximum.accumulate(carry)[:-1]
    carry_ref = ray.put(excl)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        pre = ray.get(carry_ref)
        g = g.sort_values("event_id", kind="mergesort")
        sec = g["sec"].to_numpy(np.int64)
        b = int(g["bucket"].iloc[0])
        wm = np.maximum.accumulate(np.maximum(sec, pre[b]))
        late = wm - sec
        return pd.DataFrame({"event_id": g["event_id"].to_numpy(np.int64),
                             "lateness_s": late,
                             "is_late": (late > 0).astype(np.int64)})

    return ensure_schema(
        rows.groupby("bucket").map_groups(scan, batch_format="pandas"),
        pa.schema([("event_id", pa.int64()), ("lateness_s", pa.int64()),
                   ("is_late", pa.int64())]))


# --- 2-D skyline (Pareto frontier) --------------------------------------------


def _skyline2d_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the maximize-both skyline: point B survives
    iff no A has A >= B on both dims with one strict. Vectorized
    sort-and-scan: x desc / y desc, a point is dominated by (a) the max y
    over STRICTLY larger x (>= test — strictness comes from x) or (b) a
    strictly larger y within its own x-group. ``y`` must be int64."""
    n = len(x)
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    new_x = np.empty(n, bool)
    new_x[0] = True
    np.not_equal(xs[1:], xs[:-1], out=new_x[1:])
    grp = np.cumsum(new_x) - 1
    gy = ys[new_x]                       # per-x-group max y (y desc in group)
    my = np.empty(len(gy), np.int64)     # exclusive prefix max over groups
    my[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(gy[:-1], out=my[1:])
    keep = ~((my[grp] >= ys) | (gy[grp] > ys))
    mask = np.empty(n, bool)
    mask[order] = keep
    return mask


def q_skyline(sf_dir: str) -> pd.DataFrame:
    """Pareto-frontier orders: maximize (o_totalprice, o_orderdate) — no
    other order is >= on both dims with one strict. The canonical
    distributed skyline: skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)),
    so each block reduces to its local frontier inside ``map_batches``
    (corpus never shuffles) and the driver finishes over the union of
    block frontiers — O(blocks × |frontier|) rows, ~H(n) each for
    independent dims. Values pass through untouched from parquet, so the
    driver hash needs no rounding."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_orderdate"])

    def local(t: pa.Table) -> pa.Table:
        x = t["o_totalprice"].to_numpy(zero_copy_only=False)
        y = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_skyline2d_mask(x, y)))

    cand = collect_table(ds.map_batches(local, batch_format="pyarrow"))
    if cand.num_rows == 0:
        return typed_empty(o_orderkey="int64", o_totalprice="float64",
                           o_orderdate="datetime64[us]")
    x = cand["o_totalprice"].to_numpy(zero_copy_only=False)
    y = cand["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    out = cand.filter(pa.array(_skyline2d_mask(x, y))).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


# --- event-type co-occurrence (per-user set intersections) --------------------


def q_type_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """For every pair of event types: how many users did BOTH, and the
    Jaccard overlap of their user sets — the co-activity structure used
    to collapse redundant instrumentation. One user-bucketed combine:
    batch-local (user, type) distinct first, then each bucket emits pair
    counts (types-per-user is bounded by the type vocabulary, so the
    per-user self-merge is tiny) AND per-type distinct-user counts as
    sentinel rows (type_b = ''); one small final groupby over
    |types|²-sized partials; the division happens once on the driver."""
    from .combine import bucketed_combine

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["user_id", "event_type"])
        return pa.Table.from_pandas(df, preserve_index=False)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "event_type"])
        m = g.merge(g, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        p = (m.groupby(["event_type_x", "event_type_y"], as_index=False)
             .agg(n=("user_id", "size")))
        p.columns = ["type_a", "type_b", "n"]
        s = (g.groupby("event_type", as_index=False)
             .agg(n=("user_id", "size")))
        s.columns = ["type_a", "n"]
        s["type_b"] = ""
        out = pd.concat([p, s[["type_a", "type_b", "n"]]], ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    hashed = ds.map_batches(distinct, batch_format="pyarrow",
                            batch_size=8192)
    part = (bucketed_combine(hashed, "user_id", pairs)
            .groupby(["type_a", "type_b"])
            .aggregate(Sum("n", alias_name="n_both")).to_pandas())
    if part.empty:
        return typed_empty(type_a="object", type_b="object",
                           n_both="int64", jaccard="float64")
    singles = (part[part["type_b"] == ""]
               .set_index("type_a")["n_both"].astype(np.int64))
    out = part[part["type_b"] != ""].copy()
    out["n_both"] = out["n_both"].astype(np.int64)
    na = singles.reindex(out["type_a"]).to_numpy(np.float64)
    nb = singles.reindex(out["type_b"]).to_numpy(np.float64)
    both = out["n_both"].to_numpy(np.float64)
    out["jaccard"] = round_half_away(both / (na + nb - both), 6)
    return (out[["type_a", "type_b", "n_both", "jaccard"]]
            .sort_values(["type_a", "type_b"]).reset_index(drop=True))


# --- market-basket pair mining (frequent part pairs per order) ------------------

BASKET_TOP_N = 25


def q_basket_pairs(sf_dir: str) -> pd.DataFrame:
    """Top-25 part pairs by the number of orders containing BOTH parts —
    classic market-basket co-occurrence mining (the A-Priori candidate
    pass), and structurally the "documents sharing both n-grams" probe a
    contamination triage runs.

    All-integer, so exactly oracle-replayable: counts only, total order
    ``(n_orders DESC, part_a, part_b)`` breaks ties deterministically.

    Ray shape — two bucketed combines, no per-group Python:
    1. order-bucketed pair expansion: batch-local distinct
       (order, part) projection, then each order-hash bucket self-merges
       vectorized and emits per-bucket PARTIAL pair counts (an order
       lives whole in one bucket, so partials are disjoint per order;
       pairs-per-order is quadratic in basket size, bounded at 21 for
       TPC-H's ≤7-line orders — a web-corpus run would cap basket size).
    2. pair-bucketed count fold + LOCAL top-25 combiner: a pair lives
       whole in one bucket, so bucket-local top-25 by the final total
       order is a valid combiner — the driver merges 25 × n_buckets
       candidate rows, never the ~N_pairs/60-per-order pair space
       (1.2M distinct pairs at sf0.1)."""
    from .combine import bucketed_combine

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def order_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        p = (m.groupby(["l_partkey_x", "l_partkey_y"], as_index=False)
             .agg(n=("l_orderkey", "size")))
        p.columns = ["part_a", "part_b", "n"]
        p["n"] = p["n"].astype(np.int64)
        p["pkey"] = ((p["part_a"].to_numpy(np.int64) << 32)
                     | p["part_b"].to_numpy(np.int64))
        return p

    partial = bucketed_combine(
        ds.map_batches(distinct, batch_format="pyarrow", batch_size=8192),
        "l_orderkey", order_pairs)

    def pair_topk(g: pd.DataFrame) -> pd.DataFrame:
        s = (g.groupby("pkey", as_index=False)
             .agg(part_a=("part_a", "first"), part_b=("part_b", "first"),
                  n_orders=("n", "sum")))
        s = s.sort_values(["n_orders", "part_a", "part_b"],
                          ascending=[False, True, True], kind="mergesort")
        return s.head(BASKET_TOP_N)[["part_a", "part_b", "n_orders"]]

    cand = bucketed_combine(partial, "pkey", pair_topk).to_pandas()
    if cand.empty:
        return typed_empty(part_a="int64", part_b="int64",
                           n_orders="int64")
    for c in ("part_a", "part_b", "n_orders"):
        cand[c] = cand[c].astype(np.int64)
    return (cand.sort_values(["n_orders", "part_a", "part_b"],
                             ascending=[False, True, True],
                             kind="mergesort")
            .head(BASKET_TOP_N).reset_index(drop=True))


def q_basket_rules(sf_dir: str) -> pd.DataFrame:
    """Association rules for the top-25 co-occurring part pairs
    (the A-Priori rule stage over ``q_basket_pairs``'s candidates):
    confidence(a→b) = n_ab / n_a, confidence(b→a) = n_ab / n_b and
    lift = N·n_ab / (n_a·n_b), with n_x = distinct orders containing x
    and N = distinct orders overall.

    All counts are integers (exactly oracle-replayable); each ratio is a
    single int→double division (lift: one product each side, identical
    association in the SQL).

    Ray shape: the pair top-25 rides ``q_basket_pairs``'s two bucketed
    combines; N folds as per-bucket distinct-order sentinel counts; the
    per-part order counts are computed ONLY for the ≤ 50 parts in the top
    pairs — broadcast the id set, filter the scan, and dedupe
    (order, part) inside one order-bucketed combine (an order lives whole
    in a bucket, so bucket-local distinct is global). The 20k-part count
    vector never materializes."""
    from .combine import bucketed_combine

    top = q_basket_pairs(sf_dir)
    if top.empty:
        return typed_empty(part_a="int64", part_b="int64",
                           n_orders="int64", conf_ab="float64",
                           conf_ba="float64", lift="float64")

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def distinct(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(t.to_pandas().drop_duplicates(),
                                    preserve_index=False)

    dp = ds.map_batches(distinct, batch_format="pyarrow",
                        batch_size=8192)

    # N: distinct orders, folded as per-bucket exact counts
    def bucket_orders(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": np.array([g["l_orderkey"].nunique()],
                                           np.int64)})

    n_total = int(bucketed_combine(dp, "l_orderkey", bucket_orders)
                  .to_pandas()["n"].sum())

    # n_a for the <= 50 involved parts only
    involved = np.unique(np.concatenate(
        [top["part_a"].to_numpy(np.int64),
         top["part_b"].to_numpy(np.int64)]))
    inv_set = pa.array(involved)

    def only_involved(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["l_partkey"], value_set=inv_set))

    def part_counts(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["l_orderkey", "l_partkey"])
        out = (d.groupby("l_partkey", as_index=False)
               .agg(n=("l_orderkey", "size")))
        out["n"] = out["n"].astype(np.int64)
        return out

    pcnt = (bucketed_combine(
        dp.map_batches(only_involved, batch_format="pyarrow"),
        "l_orderkey", part_counts).to_pandas()
        .groupby("l_partkey", as_index=False).agg(n=("n", "sum")))
    n_of = dict(zip(pcnt["l_partkey"].astype(int),
                    pcnt["n"].astype(int)))

    n_ab = top["n_orders"].to_numpy(np.int64)
    n_a = np.array([n_of[int(p)] for p in top["part_a"]], np.int64)
    n_b = np.array([n_of[int(p)] for p in top["part_b"]], np.int64)
    out = top.copy()
    out["conf_ab"] = round_half_away(
        n_ab.astype(np.float64) / n_a.astype(np.float64), 6)
    out["conf_ba"] = round_half_away(
        n_ab.astype(np.float64) / n_b.astype(np.float64), 6)
    out["lift"] = round_half_away(
        (n_total * n_ab).astype(np.float64)
        / (n_a * n_b).astype(np.float64), 6)
    return out[["part_a", "part_b", "n_orders",
                "conf_ab", "conf_ba", "lift"]].reset_index(drop=True)


# --- Q2/Q11/Q16/Q20 shapes (reduced schema: no partsupp table) -------------------
#
# The test star schema carries no partsupp, so the four remaining classic
# TPC-H shapes are expressed over lineitem's observed (part, supplier)
# relationships: a supplier "offers" a part at the minimum extended price
# it ever shipped it for (Q2), "stocks" the value it shipped (Q11),
# "supplies" any part it appears with (Q16), and has "availability"
# proxied by shipped quantity (Q20). The *operator shapes* — correlated
# MIN subquery, group-sum vs global-scalar threshold, multi-key
# count-distinct with NOT-IN exclusions, nested EXISTS over a half-sum
# window predicate — are the TPC-H ones.

Q2_REGION = "EUROPE"
Q2_TYPE = "LARGE"
Q2_MAX_SIZE = 15


def q2_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2 shape: for each part in a type/size sliver, the EUROPE
    supplier(s) offering it at the minimum cost — the correlated-MIN
    subquery + 4-way dimension join pattern, cost := min cent-quantized
    l_extendedprice per (part, supplier).

    Exactness: the per-pair MIN and the per-part argmin both compare
    exact int64 cents (l_extendedprice lives on the 0.01 grid), so the
    winner set cannot flip with partitioning; floats appear only in the
    displayed ``min_cost`` (one division) and the pass-through
    ``s_acctbal``. Scale: region/nation/supplier/part are dimension
    slivers (broadcast as sorted key arrays); lineitem is double-pruned
    per batch BEFORE the pair groupby, so the shuffle moves only the
    sliver's (part, supplier) partial-min rows; the best-per-part join
    runs distributed and only the winner rows (≤ ties × sliver parts,
    LIMIT 100 after a total order) reach the driver."""
    sup = collect_table(_read(sf_dir, "supplier",
                              ["s_suppkey", "s_name", "s_acctbal",
                               "s_nationkey"]))
    nat = collect_table(_read(sf_dir, "nation",
                              ["n_nationkey", "n_name", "n_regionkey"]))
    reg = collect_table(_read(sf_dir, "region", ["r_regionkey", "r_name"]))
    empty = typed_empty(s_acctbal="float64", s_name="object",
                        n_name="object", p_partkey="int64",
                        p_name="object", min_cost="float64")

    rk = set(reg.filter(pc.equal(reg["r_name"], pa.scalar(Q2_REGION)))
             ["r_regionkey"].to_pylist())
    nname = {int(k): v for k, v, g in zip(nat["n_nationkey"].to_pylist(),
                                          nat["n_name"].to_pylist(),
                                          nat["n_regionkey"].to_pylist())
             if g in rk}
    sdf = sup.to_pandas()
    sdf = sdf[sdf["s_nationkey"].isin(nname)]
    if sdf.empty:
        return empty
    s_meta = {int(r.s_suppkey): (r.s_name, float(r.s_acctbal),
                                 nname[int(r.s_nationkey)])
              for r in sdf.itertuples()}

    part = collect_table(_read(sf_dir, "part",
                               ["p_partkey", "p_name", "p_type", "p_size"]))
    part = part.filter(pc.and_(
        pc.equal(part["p_type"], pa.scalar(Q2_TYPE)),
        pc.less_equal(part["p_size"], pa.scalar(Q2_MAX_SIZE))))
    if part.num_rows == 0:
        return empty
    pname = dict(zip(part["p_partkey"].to_pylist(),
                     part["p_name"].to_pylist()))
    pkeys_ref = ray.put(np.sort(part["p_partkey"].to_numpy()
                                .astype(np.int64)))
    skeys_ref = ray.put(np.sort(np.fromiter(s_meta, np.int64,
                                            len(s_meta))))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        pk = ray.get(pkeys_ref)
        sk = ray.get(skeys_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((pk[np.minimum(np.searchsorted(pk, lp), len(pk) - 1)] == lp)
                & (sk[np.minimum(np.searchsorted(sk, ls),
                                 len(sk) - 1)] == ls))
        g = (pd.DataFrame({
                "l_partkey": lp[keep], "l_suppkey": ls[keep],
                "cost_c": _cents(t["l_extendedprice"]
                                 .to_numpy(zero_copy_only=False)[keep])})
             .groupby(["l_partkey", "l_suppkey"], as_index=False)["cost_c"]
             .min())
        return pa.Table.from_pandas(g, preserve_index=False)

    offers = (li.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536)
              .groupby(["l_partkey", "l_suppkey"])
              .aggregate(Min("cost_c", alias_name="cost_c")))
    best = offers.groupby("l_partkey").aggregate(
        Min("cost_c", alias_name="best_c"))
    joined = offers.join(best, join_type="inner",
                         num_partitions=scale.join_partitions(),
                         on=("l_partkey",))
    win = joined.to_pandas()
    if win.empty:
        return empty
    win = win[win["cost_c"] == win["best_c"]].copy()
    win["s_name"] = win["l_suppkey"].map(lambda k: s_meta[int(k)][0])
    win["s_acctbal"] = win["l_suppkey"].map(
        lambda k: s_meta[int(k)][1]).astype(np.float64)
    win["n_name"] = win["l_suppkey"].map(lambda k: s_meta[int(k)][2])
    win["p_partkey"] = win["l_partkey"].astype(np.int64)
    win["p_name"] = win["p_partkey"].map(pname)
    win["min_cost"] = _r(win["cost_c"] / 100.0, 2)
    win = win.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True]).head(100)
    return win[["s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                "min_cost"]].reset_index(drop=True)


Q11_NATION = "NATION_3"


def q11_important_stock(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 shape: per-part shipped value for one nation's
    suppliers, keeping parts whose value exceeds a global threshold —
    the group-sum vs scalar-subquery pattern (threshold := 1.5× the
    mean part value, evaluated as the integer predicate
    ``2·val·n > 3·total``).

    Exactness: value folds as int64 qty×cents per row (both factors on
    exact grids), the threshold is a cross-multiplied integer
    comparison — no float enters the keep decision, and the displayed
    ``part_value`` is one division. int64 headroom: at sf0.1 the
    corpus total is ~1e13 and the comparison peaks near 2·val·n ≈ 1e18
    only beyond ~1000× this scale — at that point the fold widens to
    the HUGEINT-style two-limb pattern the sketch module uses. Scale:
    the nation's supplier sliver broadcasts as a sorted array; the
    part-level Sum groupby moves one partial row per (part, batch);
    the global total is a second tiny aggregate over the part-level
    dataset, never a re-read."""
    sup = collect_table(_read(sf_dir, "supplier",
                              ["s_suppkey", "s_nationkey"]))
    nat = collect_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    empty = typed_empty(p_partkey="int64", part_value="float64")
    nk = set(nat.filter(pc.equal(nat["n_name"], pa.scalar(Q11_NATION)))
             ["n_nationkey"].to_pylist())
    skeys = np.sort(sup.filter(
        pc.is_in(sup["s_nationkey"],
                 value_set=pa.array(list(nk), pa.int64())))
        ["s_suppkey"].to_numpy().astype(np.int64))
    if not len(skeys):
        return empty
    skeys_ref = ray.put(skeys)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        sk = ray.get(skeys_ref)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = sk[np.minimum(np.searchsorted(sk, ls), len(sk) - 1)] == ls
        qty = (t["l_quantity"].to_numpy(zero_copy_only=False)
               .astype(np.int64)[keep])
        val = qty * _cents(t["l_extendedprice"]
                           .to_numpy(zero_copy_only=False)[keep])
        g = (pd.DataFrame({
                "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False)
                             .astype(np.int64)[keep],
                "val_c": val})
             .groupby("l_partkey", as_index=False)["val_c"].sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    v = (li.map_batches(partial, batch_format="pyarrow", batch_size=65536)
         .groupby("l_partkey").aggregate(Sum("val_c", alias_name="val_c"))
         .materialize())
    agg = v.aggregate(Sum("val_c", alias_name="t"),
                      Count(alias_name="n"))
    tot = int(agg["t"] or 0)
    n = int(agg["n"] or 0)
    if n == 0:
        return empty
    df = v.to_pandas()
    df = df[2 * df["val_c"].to_numpy(np.int64) * n > 3 * tot].copy()
    df = df.sort_values(["val_c", "l_partkey"],
                        ascending=[False, True])
    out = pd.DataFrame({
        "p_partkey": df["l_partkey"].to_numpy(np.int64),
        "part_value": _r(df["val_c"] / 100.0, 2).to_numpy()})
    return out.reset_index(drop=True)


Q16_SIZES = (1, 8, 15, 22, 29, 36, 43, 50)
Q16_EXCL_BRAND = "Brand#13"
Q16_EXCL_TYPE = "PROMO"


def q16_supplier_cnt(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    over observed (part, supplier) pairs, excluding one brand, one type,
    a size NOT-IN-list complement, and "complaint" suppliers
    (``s_acctbal < 0`` stands in for the LIKE-complaints NOT IN
    subquery — the schema has no comment column).

    Exactness: pure integer counting — no float anywhere. Scale: the
    filtered part attribute map and the ok-supplier set broadcast once
    (dimension-sized); each batch attaches attributes, dedups its own
    (brand, type, size, supplier) tuples, and the global dedup is ONE
    4-key Count groupby whose input is pre-shrunk sliver pairs; the
    per-group distinct count is a second groupby over the deduped
    tuples (≤ |brands|·|types|·|sizes| × |suppliers| rows), and only
    the ≤1200-group result reaches the driver."""
    part = collect_table(_read(sf_dir, "part",
                               ["p_partkey", "p_brand", "p_type",
                                "p_size"]))
    keep = pc.and_(
        pc.and_(pc.not_equal(part["p_brand"], pa.scalar(Q16_EXCL_BRAND)),
                pc.not_equal(part["p_type"], pa.scalar(Q16_EXCL_TYPE))),
        pc.is_in(part["p_size"],
                 value_set=pa.array(list(Q16_SIZES),
                                    part["p_size"].type)))
    part = part.filter(keep)
    empty = typed_empty(p_brand="object", p_type="object",
                        p_size="int64", supplier_cnt="int64")
    if part.num_rows == 0:
        return empty
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    order = np.argsort(pk)
    attrs_ref = ray.put((
        pk[order],
        np.asarray(part["p_brand"].to_pylist(), object)[order],
        np.asarray(part["p_type"].to_pylist(), object)[order],
        part["p_size"].to_numpy().astype(np.int64)[order]))

    sup = collect_table(_read(sf_dir, "supplier",
                              ["s_suppkey", "s_acctbal"]))
    ok_ref = ray.put(np.sort(sup.filter(
        pc.greater_equal(sup["s_acctbal"], pa.scalar(0.0)))
        ["s_suppkey"].to_numpy().astype(np.int64)))

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def partial(t: pa.Table) -> pa.Table:
        pkeys, brand, ptype, psize = ray.get(attrs_ref)
        ok = ray.get(ok_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ls = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(pkeys, lp), len(pkeys) - 1)
        m = ((pkeys[pos] == lp)
             & (ok[np.minimum(np.searchsorted(ok, ls), len(ok) - 1)] == ls))
        pos = pos[m]
        g = (pd.DataFrame({
                "p_brand": brand[pos], "p_type": ptype[pos],
                "p_size": psize[pos], "l_suppkey": ls[m]})
             .drop_duplicates())
        return pa.Table.from_pandas(g, preserve_index=False)

    deduped = (li.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
               .groupby(["p_brand", "p_type", "p_size", "l_suppkey"])
               .aggregate(Count(alias_name="_c"))
               .groupby(["p_brand", "p_type", "p_size"])
               .aggregate(Count(alias_name="supplier_cnt")))
    df = deduped.to_pandas()
    if df.empty:
        return empty
    df["p_size"] = df["p_size"].astype(np.int64)
    df["supplier_cnt"] = df["supplier_cnt"].astype(np.int64)
    df = df.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                        ascending=[False, True, True, True])
    return df[["p_brand", "p_type", "p_size",
               "supplier_cnt"]].reset_index(drop=True)


Q20_NAME_PREFIX = "small"
Q20_D0 = np.datetime64("1997-01-01", "us")
Q20_D1 = np.datetime64("1998-01-01", "us")
Q20_MIN_QTY = 80


def q20_promotion_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 shape: suppliers with a concentrated recent position in
    a name-sliver of parts — EXISTS over the half-sum window predicate
    ``2·qty_1997 > qty_total ∧ qty_total ≥ 80`` per (part, supplier)
    (shipped quantity proxies availqty; the schema has no partsupp).

    Exactness: quantities are integral (verified at generation), both
    window and total fold as int64 Sums, and the qualify predicate is
    an integer comparison — partitioning cannot flip membership. Scale:
    the part-name sliver broadcasts as a sorted key array; lineitem is
    pruned per batch before the ONE (part, supplier) Sum groupby; the
    qualifying-pair filter projects bare suppkeys, dedups distributed,
    and only the ≤|supplier| winner keys reach the driver for the
    dimension attach."""
    part = collect_table(_read(sf_dir, "part", ["p_partkey", "p_name"]))
    starts = pc.starts_with(part["p_name"], pattern=Q20_NAME_PREFIX)
    pkeys = np.sort(part.filter(starts)["p_partkey"].to_numpy()
                    .astype(np.int64))
    empty = typed_empty(s_suppkey="int64", s_name="object",
                        n_name="object")
    if not len(pkeys):
        return empty
    pkeys_ref = ray.put(pkeys)

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        pk = ray.get(pkeys_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pk[np.minimum(np.searchsorted(pk, lp), len(pk) - 1)] == lp
        qty = (t["l_quantity"].to_numpy(zero_copy_only=False)
               .astype(np.int64)[keep])
        ship = (t["l_shipdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")[keep])
        inwin = (ship >= Q20_D0) & (ship < Q20_D1)
        g = (pd.DataFrame({
                "l_partkey": lp[keep],
                "l_suppkey": t["l_suppkey"]
                             .to_numpy(zero_copy_only=False)
                             .astype(np.int64)[keep],
                "q97": np.where(inwin, qty, 0),
                "qtot": qty})
             .groupby(["l_partkey", "l_suppkey"], as_index=False).sum())
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = (li.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby(["l_partkey", "l_suppkey"])
             .aggregate(Sum("q97", alias_name="q97"),
                        Sum("qtot", alias_name="qtot")))

    def qualify(t: pa.Table) -> pa.Table:
        q97 = t["q97"].to_numpy(zero_copy_only=False).astype(np.int64)
        qtot = t["qtot"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (2 * q97 > qtot) & (qtot >= Q20_MIN_QTY)
        return pa.table({"l_suppkey": t["l_suppkey"].filter(pa.array(m))})

    winners = (pairs.map_batches(qualify, batch_format="pyarrow")
               .groupby("l_suppkey").aggregate(Count(alias_name="_c"))
               .to_pandas())
    if winners.empty:
        return empty
    sup = collect_table(_read(sf_dir, "supplier",
                              ["s_suppkey", "s_name", "s_nationkey"]))
    nat = collect_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    nname = dict(zip(nat["n_nationkey"].to_pylist(),
                     nat["n_name"].to_pylist()))
    sdf = sup.to_pandas()
    sdf = sdf[sdf["s_suppkey"].isin(
        winners["l_suppkey"].to_numpy(np.int64))].copy()
    out = pd.DataFrame({
        "s_suppkey": sdf["s_suppkey"].to_numpy(np.int64),
        "s_name": sdf["s_name"].to_numpy(object),
        "n_name": sdf["s_nationkey"].map(nname).to_numpy(object)})
    return (out.sort_values("s_suppkey").reset_index(drop=True))


# --- changelog compaction (last-write-wins upsert) --------------------------------

def q_cdc_upsert(sf_dir: str) -> Dataset:
    """Last-write-wins changelog compaction: the events stream read as a
    CDC log keyed by (user_id, event_type) — the newest version by
    (ts, event_id) survives with its value, plus the superseded-version
    count. This is Kafka log compaction / Delta-Hudi merge-on-read
    expressed as a dataflow: the standard first step when a mutable
    operational table is snapshotted into a training corpus.

    EXACTLY oracle-able: the winner is an integer argmax — (ts as epoch
    micros, event_id) lexicographic max per key — and ``last_value`` is a
    PASS-THROUGH of the winning row's float (both engines read the same
    parquet bytes; no arithmetic touches it), so no partitioning can flip
    a hash.

    Scale shape: winners are REDUCIBLE (the global max-version row is the
    max of batch-local max rows — the q_first_last endpoint pattern), so
    each batch collapses to one row per (key, batch) and one bucketed
    combine (splitmix64(user_id) — both key columns ride the user bucket)
    folds them vectorized. Output is key-cardinality-sized → streaming
    Dataset."""
    from .collect import ensure_schema
    from .combine import bucketed_combine

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": t["event_type"].to_numpy(zero_copy_only=False),
            "last_ts": t["ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "eid": t["event_id"].to_numpy(zero_copy_only=False),
            "last_value": t["value"].to_numpy(zero_copy_only=False)})
        df = df.sort_values(["user_id", "event_type", "last_ts", "eid"],
                            kind="mergesort")
        g = df.groupby(["user_id", "event_type"], as_index=False)
        out = g.nth(-1).reset_index(drop=True)
        out["n_versions"] = g.size()["size"].to_numpy(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "last_ts", "eid"],
                          kind="mergesort")
        grp = g.groupby(["user_id", "event_type"], as_index=False)
        out = grp.nth(-1).reset_index(drop=True)
        out["n_versions"] = grp["n_versions"].sum()["n_versions"] \
            .to_numpy(np.int64)
        return out[["user_id", "event_type", "last_ts", "last_value",
                    "n_versions"]]

    return ensure_schema(
        bucketed_combine(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536),
            "user_id", fold),
        pa.schema([("user_id", pa.int64()), ("event_type", pa.string()),
                   ("last_ts", pa.int64()), ("last_value", pa.float64()),
                   ("n_versions", pa.int64())]))
