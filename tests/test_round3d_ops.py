"""Round-3 additions (segment d): TPC-H q4/q6/q10 shapes, fixed-point
z-score standardization, behavior-sequence construction, unicode text
normalization."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


def _ts(s):
    return np.datetime64(s, "us")


def test_q6_planted_filter_and_sum(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q6_forecast_revenue)

    # rows: (shipdate, discount, quantity, extendedprice) — only the first
    # two pass every predicate
    rows = [
        ("1996-03-01", 0.05, 10.0, 100.0),   # pass: 100*0.05 = 5.0
        ("1996-12-31", 0.03, 29.0, 200.0),   # pass: 200*0.03 = 6.0
        ("1995-12-31", 0.05, 10.0, 100.0),   # fail: before window
        ("1997-01-01", 0.05, 10.0, 100.0),   # fail: at end (exclusive)
        ("1996-06-01", 0.02, 10.0, 100.0),   # fail: discount below band
        ("1996-06-01", 0.08, 10.0, 100.0),   # fail: discount above band
        ("1996-06-01", 0.05, 30.0, 100.0),   # fail: quantity at cap
    ]
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array(range(len(rows)), pa.int64()),
        "l_shipdate": pa.array([_ts(r[0]) for r in rows],
                               pa.timestamp("us")),
        "l_discount": pa.array([r[1] for r in rows], pa.float64()),
        "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[3] for r in rows], pa.float64()),
    }))
    out = q6_forecast_revenue(str(tmp_path))
    assert len(out) == 1
    assert out["revenue"].iloc[0] == 11.0
    assert out["n_items"].iloc[0] == 2


def test_q4_planted_late_orders(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q4_late_orders)

    # order 1: max ship 1996-04-01 vs orderdate 1996-01-01 → 91 days late ✓
    # order 2: max ship 1996-02-15 vs orderdate 1996-01-01 → 45 days, not late
    # order 3: late but OUTSIDE the order-date window → excluded
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([_ts("1996-01-01"), _ts("1996-01-01"),
                                 _ts("1995-06-01")], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH"]),
    }))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_shipdate": pa.array([_ts("1996-01-10"), _ts("1996-04-01"),
                                _ts("1996-02-15"), _ts("1995-12-01")],
                               pa.timestamp("us")),
    }))
    out = q4_late_orders(str(tmp_path))
    assert list(out["o_orderpriority"]) == ["1-URGENT"]
    assert list(out["n_late"]) == [1]
    assert out["n_late"].dtype == np.int64


def test_q10_planted_star_join(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q10_returned_revenue)

    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["NORWAY", "SWEDEN"]),
    }))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_name": pa.array(["alice", "bob"]),
        "c_nationkey": pa.array([0, 1], pa.int32()),
    }))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([100, 200, 300], pa.int64()),
        "o_custkey": pa.array([10, 20, 10], pa.int64()),
        # 300 is outside the date window
        "o_orderdate": pa.array([_ts("1996-02-01"), _ts("1996-03-01"),
                                 _ts("1997-02-01")], pa.timestamp("us")),
    }))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([100, 100, 200, 300], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "R", "R"]),
        "l_extendedprice": pa.array([100.0, 50.0, 80.0, 999.0],
                                    pa.float64()),
        "l_discount": pa.array([0.1, 0.0, 0.25, 0.0], pa.float64()),
    }))
    out = q10_returned_revenue(str(tmp_path))
    # alice: 100*(1-0.1) = 90 (the N row and the out-of-window order drop)
    # bob:   80*(1-0.25) = 60
    assert list(out["c_custkey"]) == [10, 20]
    assert list(out["revenue"]) == [90.0, 60.0]
    assert list(out["n_name"]) == ["NORWAY", "SWEDEN"]


def test_zscore_planted_exact(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_value_zscore)

    vals = [1.0, 2.0, 3.0, 4.0]
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "value": pa.array(vals, pa.float64()),
    }))
    out = (q_value_zscore(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # quantized grid: q = value*1000 exactly here; mean 2500, sd = sqrt(1.25e6)
    q = np.array(vals) * 1000.0
    mu, sd = q.mean(), q.std()
    exp = np.round((q - mu) / sd, 6)
    np.testing.assert_allclose(out["zscore"].to_numpy(), exp, atol=1e-9)


def test_zscore_partitioning_invariance(ray_session):
    """Same corpus, different block counts → bit-identical z-scores (the
    fixed-point moments make float summation order irrelevant)."""
    import ray as _ray
    from norsk_historisk_avis_ocr_ray.functions import scale
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_value_zscore)

    sf = "/root/testdata/sf0.001"
    a = (q_value_zscore(sf).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    orig = scale.read_blocks_for_path
    try:
        scale.read_blocks_for_path = lambda p: 1
        b = (q_value_zscore(sf).to_pandas()
             .sort_values("event_id").reset_index(drop=True))
    finally:
        scale.read_blocks_for_path = orig
    pd.testing.assert_frame_equal(a, b)


def test_user_event_seq_ordering_and_ties(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_user_event_seq)

    # user 1 has two events at the SAME ts → event_id breaks the tie
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([5, 2, 9, 7], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([_ts("1996-01-01T00:00:10"),
                        _ts("1996-01-01T00:00:10"),
                        _ts("1996-01-01T00:00:05"),
                        _ts("1996-01-01T00:00:01")], pa.timestamp("us")),
        "event_type": pa.array(["click", "view", "buy", "click"]),
    }))
    out = (q_user_event_seq(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert list(out["user_id"]) == [1, 2]
    # user 1: ts order buy(9) first, then the tie at :10 → id 2 before id 5
    assert out["event_seq"].iloc[0] == "buy,view,click"
    assert out["event_seq"].iloc[1] == "click"
    assert list(out["n_events"]) == [3, 1]


def test_text_normalize_nfc_and_whitespace(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import (
        q_text_normalize)

    decomposed = "Café  du\tNord\n"      # e + combining acute
    composed = "Café du Nord"                  # NFC + squashed + trimmed
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([decomposed, "  plain   text  "]),
    }))
    out = (q_text_normalize(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["norm_md5"].iloc[0] == hashlib.md5(
        composed.encode("utf-8")).hexdigest()
    assert out["n_chars_norm"].iloc[0] == len(composed)
    assert out["norm_md5"].iloc[1] == hashlib.md5(
        b"plain text").hexdigest()
    assert out["n_chars_norm"].iloc[1] == len("plain text")


def test_bigram_ppl_planted(tmp_path, ray_session):
    """Hand-computed bigram perplexity on a 3-doc corpus (buckets derived
    with the same md5 convention in the test, so collisions are handled
    identically)."""
    import math

    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_bigram_ppl

    texts = ["a b a b", "a b", "solo"]
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts),
    }))
    out = (q_bigram_ppl(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    F = 4096

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:16], 16) % F

    # corpus bigram rows: doc0 [(a,b),(b,a),(a,b)], doc1 [(a,b)]
    ctx_counts = {}
    pair_counts = {}
    rows = [("a", "b"), ("b", "a"), ("a", "b"), ("a", "b")]
    for w1, w2 in rows:
        ctx_counts[bucket(w1)] = ctx_counts.get(bucket(w1), 0) + 1
        pb = bucket(w1 + " " + w2)
        pair_counts[pb] = pair_counts.get(pb, 0) + 1

    def lq(c, add):
        v = math.log(c + add) * 1e6
        return int(np.floor(abs(v) + 0.5) * np.sign(v))

    def ppl(pairs):
        s = sum(lq(pair_counts.get(bucket(a + " " + b), 0), 1)
                - lq(ctx_counts.get(bucket(a), 0), F)
                for a, b in pairs)
        return round(math.exp(-(s / 1e6) / len(pairs)), 6)

    assert list(out["n_bigrams"]) == [3, 1, 0]
    assert out["ppl"].iloc[0] == ppl([("a", "b"), ("b", "a"), ("a", "b")])
    assert out["ppl"].iloc[1] == ppl([("a", "b")])
    assert out["ppl"].iloc[2] == 0.0
    # smoothed-model sanity: the frequent bigram scores lower perplexity
    assert out["ppl"].iloc[1] < out["ppl"].iloc[0]


def _substring_remove_corpus(tmp_path):
    texts = [
        "alpha beta gamma delta unique tail one",   # dup 4-gram at start 0
        "prefix alpha beta gamma delta end",        # same 4-gram at start 1
        "totally different words here now",         # untouched
        "tiny doc",                                  # < k tokens
    ]
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))


def test_substring_remove_planted(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        dedup_substring_remove)

    _substring_remove_corpus(tmp_path)
    out = (dedup_substring_remove(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(out["n_tokens"]) == [7, 6, 5, 2]
    assert list(out["n_removed"]) == [4, 4, 0, 0]
    exp = ["unique tail one", "prefix end",
           "totally different words here now", "tiny doc"]
    assert list(out["clean_md5"]) == [
        hashlib.md5(e.encode()).hexdigest() for e in exp]


def test_substring_remove_distributed_path_matches(tmp_path, ray_session):
    """broadcast_cutover=0 forces the hash-join + starts-collect path; the
    output must be identical to the broadcast path."""
    from norsk_historisk_avis_ocr_ray.functions.dedup import (
        dedup_substring_remove)

    _substring_remove_corpus(tmp_path)
    a = (dedup_substring_remove(str(tmp_path)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dedup_substring_remove(str(tmp_path), broadcast_cutover=0)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
