"""Round-3 additions: LAG/LEAD window, distributed rank, vocabulary top-k,
deterministic global shuffle."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, user_id, ts_us, value, event_type=None):
    n = len(user_id)
    ev = pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "user_id": pa.array(user_id, pa.int64()),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "value": pa.array(value, pa.float64()),
        "event_type": pa.array(event_type or ["t"] * n),
    })
    pq.write_table(ev, str(tmp_path / "events.parquet"))


def test_lead_lag_planted(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import q_lead_lag

    # user 1: three events (out of file order); user 2: one event
    _write_events(tmp_path,
                  user_id=[1, 2, 1, 1],
                  ts_us=[30, 10, 10, 20],
                  value=[3.0, 9.0, 1.0, 2.0])
    out = (q_lead_lag(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    by_id = out.set_index("event_id")
    # user 1 order by ts: e2(v=1) -> e3(v=2) -> e0(v=3)
    assert np.isnan(by_id.loc[2, "prev_value"])
    assert by_id.loc[2, "next_value"] == 2.0
    assert by_id.loc[3, "prev_value"] == 1.0
    assert by_id.loc[3, "next_value"] == 3.0
    assert by_id.loc[0, "prev_value"] == 2.0
    assert np.isnan(by_id.loc[0, "next_value"])
    # singleton user: both NULL (never leaks the neighbor user's value)
    assert np.isnan(by_id.loc[1, "prev_value"])
    assert np.isnan(by_id.loc[1, "next_value"])


def test_event_rank_adversarial_ties(tmp_path, ray_session):
    """A huge tie run (80% of one type sharing one value) must still rank
    exactly: ties snap to a single range bucket by construction, and the
    pass-A offsets absorb whatever the boundary sample picked."""
    from norsk_historisk_avis_ocr_ray.functions.relational import q_event_rank

    rng = np.random.RandomState(7)
    n = 600
    vals = np.where(rng.rand(n) < 0.8, 5.0, rng.rand(n) * 10)
    types = np.where(np.arange(n) % 3 == 0, "a", "b")
    _write_events(tmp_path,
                  user_id=[1] * n,
                  ts_us=list(range(n)),
                  value=vals.tolist(),
                  event_type=types.tolist())
    out = (q_event_rank(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    assert len(out) == n

    exp = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64),
                        "event_type": types, "value": vals})
    g = exp.groupby("event_type")["value"]
    exp["rnk"] = g.rank(method="min", ascending=False).astype(np.int64)
    exp = exp.sort_values(["event_type", "value", "event_id"],
                          ascending=[True, False, True], kind="mergesort")
    exp["rn"] = exp.groupby("event_type").cumcount() + 1
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert (out["rn"].to_numpy() == exp["rn"].to_numpy()).all()
    assert (out["rnk"].to_numpy() == exp["rnk"].to_numpy()).all()
    n_per = exp.groupby("event_type")["value"].transform("size").to_numpy()
    pct = (exp["rnk"].to_numpy() - 1) / np.maximum(n_per - 1, 1)
    assert np.allclose(out["pct"].to_numpy(), np.round(pct, 6), atol=1e-9)


def test_vocab_topk_planted(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_vocab_topk

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        # "red" in all 3 docs (twice in doc 0 -> still df=3), "Blue" cases
        # fold together (df=2), "green" once
        "text": pa.array(["red red Blue", "blue red", "green red"]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q_vocab_topk(str(tmp_path))
    assert list(out["tok"]) == ["red", "blue", "green"]
    assert list(out["df"]) == [3, 2, 1]
    assert out["df"].dtype == np.int64


def test_global_shuffle_is_exact_md5_rank(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_global_shuffle

    ids = list(range(137))
    docs = pa.table({"doc_id": pa.array(ids, pa.int64())})
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (q_global_shuffle(str(tmp_path)).to_pandas()
           .sort_values("pos").reset_index(drop=True))
    # positions are a permutation of 0..n-1
    assert list(out["pos"]) == ids
    # and equal the md5-key sort order computed in-process
    key = {i: hashlib.md5(f"{i}:42".encode()).hexdigest() for i in ids}
    expect = sorted(ids, key=lambda i: (key[i], i))
    assert list(out["doc_id"]) == expect
    # the shuffle actually permutes (not identity) at this size
    assert list(out["doc_id"]) != ids


def test_activity_fulljoin_all_three_sides(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_activity_fulljoin)

    _write_events(tmp_path, user_id=[1, 1, 7], ts_us=[0, 1, 2],
                  value=[2.5, 0.5, 4.0])
    orders = pa.table({
        "o_custkey": pa.array([1, 2, 2], pa.int64()),
        "o_totalprice": pa.array([10.0, 5.0, 7.0], pa.float64()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = (q_activity_fulljoin(str(tmp_path)).to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert list(out["id"]) == [1, 2, 7]
    assert list(out["side"]) == ["both", "orders_only", "events_only"]
    assert list(out["n_events"]) == [2, 0, 1]
    assert list(out["sum_value"]) == [3.0, 0.0, 4.0]
    assert list(out["n_orders"]) == [1, 2, 0]
    assert list(out["total_spent"]) == [10.0, 12.0, 0.0]
    # null-free stable dtypes (the driver hashes typed values)
    assert out["n_events"].dtype == np.int64
    assert out["n_orders"].dtype == np.int64


def test_value_histogram_planted(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.relational import (
        q_value_histogram, HIST_BUCKETS)

    # lo=0, hi=32 → width 1; value 32 clips into the last bucket (31)
    vals = [0.0, 0.5, 1.0, 31.9, 32.0]
    _write_events(tmp_path, user_id=[1] * 5, ts_us=list(range(5)),
                  value=vals)
    out = q_value_histogram(str(tmp_path))
    got = dict(zip(out["bucket"], out["n"]))
    assert got == {0: 2, 1: 1, 31: 2}
    assert out["n"].dtype == np.int64

    # degenerate: all values equal → a single bucket 0
    _write_events(tmp_path, user_id=[1, 2], ts_us=[0, 1], value=[5.0, 5.0])
    out2 = q_value_histogram(str(tmp_path))
    assert dict(zip(out2["bucket"], out2["n"])) == {0: 2}


def test_mixture_sample_deterministic_and_weighted(tmp_path, ray_session):
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_mixture_sample

    n = 2000
    docs = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "source": pa.array(["web" if i % 2 == 0 else "books"
                            for i in range(n)]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (q_mixture_sample(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    out2 = (q_mixture_sample(str(tmp_path)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, out2)  # run-to-run deterministic

    pct = {s: int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % 90 + 10
           for s in ("web", "books")}
    rates = out.groupby("source")["doc_id"].size() / (n / 2)
    for s in ("web", "books"):
        assert (out[out["source"] == s]["sample_pct"] == pct[s]).all()
        # realized rate within 5 points of the md5-derived percentage
        assert abs(rates[s] * 100 - pct[s]) < 5
