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
