"""Semantic invariants for the second TPC-H batch (Q18/Q12/Q14/Q22,
ntile, exact-moment corr). Exact value equality vs DuckDB is enforced by
tools/check_oracle.py; these tests pin the operator semantics
independently of the oracle SQL."""

import numpy as np

SF = "/root/testdata/sf0.01"


def test_q18_having_and_order(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        Q18_MIN_QTY, q18_large_volume)

    df = q18_large_volume(SF)
    assert 0 < len(df) <= 100
    assert (df["sum_qty"] > Q18_MIN_QTY).all()
    # quantities are integral doubles — sums must be exact integers
    assert (df["sum_qty"] == df["sum_qty"].round()).all()
    tp = df["o_totalprice"].to_numpy()
    assert (np.diff(tp) <= 0).all()
    assert df["o_orderkey"].is_unique


def test_q12_partitions_the_join(ray_session):
    import duckdb

    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q12_priority_lines)

    df = q12_priority_lines(SF)
    total = duckdb.sql(f"""
        SELECT count(*) FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= DATE '1997-01-01'
          AND l.l_shipdate < DATE '1998-01-01'""").fetchone()[0]
    # high/low is a partition of the joined rows
    assert int((df["high_line_count"] + df["low_line_count"]).sum()) == total
    assert set(df["l_linestatus"]) <= {"O", "F"}


def test_q14_ratio_bounds(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q14_promo_revenue)

    df = q14_promo_revenue(SF)
    assert len(df) == 1
    assert 0.0 < df["promo_revenue"].iloc[0] < 100.0


def test_q22_threshold_and_antijoin(ray_session):
    import duckdb

    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q22_idle_balance)

    df = q22_idle_balance(SF)
    assert len(df) == 5 and df["c_mktsegment"].is_unique
    # every counted customer is above the positive-balance average
    thr = duckdb.sql(f"""SELECT round(avg(c_acctbal), 2)
        FROM '{SF}/customer.parquet'
        WHERE c_acctbal > 0.0""").fetchone()[0]
    # totacctbal per segment must exceed numcust * threshold
    assert (df["totacctbal"] > df["numcust"] * thr).all()


def test_ntile_buckets_balanced(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_event_ntile)

    df = q_event_ntile(SF).to_pandas()
    assert df["tile"].between(1, 4).all()
    sizes = (df.groupby(["user_id", "tile"]).size()
             .groupby("user_id").agg(["min", "max"]))
    # DuckDB ntile: bucket sizes within a partition differ by at most 1
    assert (sizes["max"] - sizes["min"] <= 1).all()
    assert len(df) == 10000


def test_corr_in_range_and_partition_invariant(ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_corr_qty_price)

    r1 = q_corr_qty_price(SF)["corr_qty_price"].iloc[0]
    assert -1.0 <= r1 <= 1.0
    # integer-moment aggregation: re-running must be bit-identical
    r2 = q_corr_qty_price(SF)["corr_qty_price"].iloc[0]
    assert r1 == r2


def test_lang_id_planted_texts(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from norsk_historisk_avis_ocr_ray.functions.textstats import lang_id

    texts = [
        "the cat and the dog sat in the house and it was warm",  # en
        "der Hund und die Katze und das Haus ist nicht hier",    # de
        "og det er en avis som er på vei til byen i dag",        # nb
        "zzz qqq xxx yyy www vvv uuu",                           # no hits
        "",                                                      # empty
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["x"] * 5), "source": pa.array(["s"] * 5),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    df = (lang_id(str(tmp_path)).to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert df["lang_pred"].tolist() == ["en", "de", "nb", "und", "und"]
    assert df.loc[3, "lang_score"] == 0.0
    assert df.loc[4, "lang_score"] == 0.0
