"""Training-data-prep operators: planted-ground-truth tests.

The SQL-oracled queries (q_hash_split, pii_scrub, q_json_extract,
tfidf_top_term) are also covered by tools/check_oracle.py; these tests pin
the semantics with hand-computed fixtures so failures localize, and provide
the correctness gate for seq_pack (order-stateful greedy packing, no SQL
form)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from norsk_historisk_avis_ocr_ray.functions import mlprep


@pytest.fixture(scope="module")
def small_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mlprep")
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 300, 301], pa.int64()),
        "text": pa.array([
            "alpha beta alpha",        # tf(alpha)=2
            "beta beta gamma",         # tf(beta)=2
            "gamma delta",             # all tf=1
            " ".join(["tok"] * 400),   # 400 tokens — spans a pack bin
            "x y z",                   # 3 tokens
        ]),
    })
    pq.write_table(docs, str(d / "documents.parquet"))
    cust = pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["Customer#000000001", "NoDigits", "a12345b678"]),
    })
    pq.write_table(cust, str(d / "customer.parquet"))
    events = pa.table({
        "event_type": pa.array(["a", "a", "b"]),
        "props": pa.array(['{"k": 10}', '{"k": 20}', '{"k": 5}']),
    })
    pq.write_table(events, str(d / "events.parquet"))
    return str(d)


def test_hash_split_counts_and_determinism(small_dir):
    out = mlprep.q_hash_split(small_dir)
    assert out["n_docs"].sum() == 5
    assert set(out["split"]).issubset({"train", "val", "test"})
    # the bucket function must equal the oracle's md5-hex-prefix form
    for i in (0, 1, 300):
        h = hashlib.md5(str(i).encode()).hexdigest()
        assert mlprep._md5_bucket(i) == int(h[:8], 16) % 100


def test_hash_split_is_partition_invariant(small_dir):
    """Same docs, different batch composition ⇒ same split assignment."""
    a = mlprep.q_hash_split(small_dir).set_index("split")["n_docs"]
    b = mlprep.q_hash_split(small_dir).set_index("split")["n_docs"]
    assert a.equals(b)


def test_pii_scrub_masks_digit_runs(small_dir):
    out = mlprep.pii_scrub(small_dir).to_pandas().sort_values(
        "c_custkey").reset_index(drop=True)
    assert list(out["clean_name"]) == ["Customer#[ID]", "NoDigits",
                                       "a[ID]b678"]
    assert list(out["n_masked"]) == [1, 0, 1]  # 678 is only 3 digits


def test_json_extract_grouped(small_dir):
    out = mlprep.q_json_extract(small_dir).set_index("event_type")
    assert out.loc["a", "n_events"] == 2
    assert out.loc["a", "sum_k"] == 30
    assert out.loc["a", "avg_k"] == 15.0
    assert out.loc["b", "sum_k"] == 5


def test_tfidf_top_term_planted(small_dir):
    out = mlprep.tfidf_top_term(small_dir).to_pandas().set_index("doc_id")
    n = 5
    # doc 0: alpha tf=2 df=1 → 2*(5-1)=8; beta tf=1 df=2 → 3 ⇒ alpha
    assert out.loc[0, "top_tok"] == "alpha"
    assert out.loc[0, "top_score"] == 8
    # doc 2: gamma tf=1 df=2 → 3; delta tf=1 df=1 → 4 ⇒ delta
    assert out.loc[2, "top_tok"] == "delta"
    assert out.loc[2, "top_score"] == 4
    # doc 301: x/y/z all tf=1 df=1 → tie on score 4, lexically largest wins
    assert out.loc[301, "top_tok"] == "z"


def test_seq_pack_planted(small_dir):
    out = mlprep.seq_pack(small_dir, capacity=8, shard_size=256)
    # shard 0: docs 0(3), 1(3), 2(2) → greedy: 0+1 = 6 ≤ 8, +2 would hit 8
    # exactly (6+2=8 ≤ 8) → one bin of all three docs, 8 tokens
    s0 = out[out["shard"] == 0]
    assert list(s0["n_docs"]) == [3]
    assert list(s0["n_tokens"]) == [8]
    assert list(s0["fill"]) == [1.0]
    # shard 1: doc 300 has 400 tokens (oversize → alone in bin 0),
    # doc 301 has 3 → bin 1
    s1 = out[out["shard"] == 1].reset_index(drop=True)
    assert list(s1["n_docs"]) == [1, 1]
    assert list(s1["n_tokens"]) == [400, 3]


def test_seq_pack_fill_capacity_boundary(small_dir):
    # capacity 5: shard 0 docs (3,3,2): 3 → +3 would exceed? 3+3=6>5 → new
    # bin; 3+2=5 ≤ 5 → bins (3), (3+2)
    out = mlprep.seq_pack(small_dir, capacity=5, shard_size=256)
    s0 = out[out["shard"] == 0]
    assert list(s0["n_tokens"]) == [3, 5]
    assert list(s0["n_docs"]) == [1, 2]


def test_stratified_sample_deterministic(small_dir):
    # no lang column in the fixture docs — use the real sf0.001 table
    out = mlprep.q_stratified_sample("/root/testdata/sf0.001")
    assert (out["n_sampled"] <= out["n_total"]).all()
    # deterministic: repeat run identical
    out2 = mlprep.q_stratified_sample("/root/testdata/sf0.001")
    assert out.equals(out2)
    # sampled fraction is binomially plausible around 10%
    frac = out["n_sampled"].sum() / out["n_total"].sum()
    assert 0.02 < frac < 0.25


def test_line_dedup_planted_boilerplate(tmp_path):
    """Lines repeated ≥3 times corpus-wide are removed; unique and
    twice-occurring lines survive; docs reduced to nothing come back as ''."""
    B = "COOKIE BANNER"          # 4 occurrences -> boilerplate
    T = "twice only"             # 2 occurrences -> kept (min_count=3)
    rows = [
        {"doc_id": 0, "text": f"{B}\nreal content zero\n{T}"},
        {"doc_id": 1, "text": f"{B}\nreal content one"},
        {"doc_id": 2, "text": f"{B}\n{T}"},
        {"doc_id": 3, "text": B},
        {"doc_id": 4, "text": "untouched single line"},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out = (mlprep.line_dedup(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    got = dict(zip(out["doc_id"], out["clean_text"]))
    assert got[0] == f"real content zero\n{T}"
    assert got[1] == "real content one"
    assert got[2] == T
    assert got[3] == ""                       # fully boilerplate
    assert got[4] == "untouched single line"
    rem = dict(zip(out["doc_id"], out["n_removed"]))
    assert rem == {0: 1, 1: 1, 2: 1, 3: 1, 4: 0}
    # parity with the DuckDB oracle on the planted corpus
    import duckdb
    import __ray_entry__ as entry
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    ora = con.execute(entry.oracle_sql()["line_dedup"]).df()
    import pandas as pd
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)


def test_training_corpus_filters_and_dedups(tmp_path):
    """Planted corpus exercises every rejection reason: benchmark overlap
    (contamination), sub-floor token count, low quality (1-char words),
    exact duplicate (min doc_id survives), and a clean keeper."""
    bench_text = " ".join(f"b{i}" for i in range(40))      # doc 0: benchmark
    clean = " ".join(f"word{i:02d}" for i in range(60))    # quality ~ high
    contaminated = bench_text + " tail1 tail2"             # >20% bench grams
    short = "only four tokens here"                        # n_tokens < 5
    lowq = " ".join("a" for _ in range(50))                # wlen 1 -> q 0.25
    rows = [
        {"doc_id": 0, "text": bench_text},                 # benchmark, excluded
        {"doc_id": 1, "text": clean},
        {"doc_id": 2, "text": contaminated},
        {"doc_id": 3, "text": short},
        {"doc_id": 4, "text": lowq},
        {"doc_id": 5, "text": clean},                      # exact dup of 1
        {"doc_id": 6, "text": " ".join(f"zed{i:04d}" for i in range(40))},
    ]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out = (mlprep.q_training_corpus(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 6]   # dup 5 collapsed into 1
    assert (out["contamination_frac"] < 0.2).all()
    assert (out["quality"] >= 0.3).all()
    # DuckDB oracle parity on the planted corpus
    import duckdb
    import pandas as pd
    import __ray_entry__ as entry
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    ora = con.execute(entry.oracle_sql()["q_training_corpus"]).df()
    pd.testing.assert_frame_equal(out, ora, check_dtype=False)


def test_tfidf_join_fallback_identical(small_dir):
    """vocab_cutover=0 forces the distributed df-join path; the per-doc top
    terms must match the vocabulary-broadcast path exactly."""
    import pandas as pd

    def cn(ds):
        return (ds.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))
    fast = cn(mlprep.tfidf_top_term(small_dir))
    slow = cn(mlprep.tfidf_top_term(small_dir, vocab_cutover=0))
    pd.testing.assert_frame_equal(fast, slow)


def test_source_cap_binds_and_is_deterministic(tmp_path):
    # 3 sources with 30/10/1 docs, cap=5: counts bind at min(cap, size),
    # ranks are 1..k, and the selected set is identical across block layouts
    rows = []
    doc = 0
    for src, n in (("a", 30), ("b", 10), ("c", 1)):
        for _ in range(n):
            rows.append({"doc_id": doc, "source": src})
            doc += 1
    t = pa.Table.from_pylist(rows)
    d1, d2 = tmp_path / "one", tmp_path / "many"
    for d in (d1, d2):
        d.mkdir()
    pq.write_table(t, str(d1 / "documents.parquet"))
    # different physical layout: reversed row order
    pq.write_table(t.take(list(range(len(rows) - 1, -1, -1))),
                   str(d2 / "documents.parquet"))

    out1 = mlprep.q_source_cap(str(d1), cap=5)
    out2 = mlprep.q_source_cap(str(d2), cap=5)
    counts = out1.groupby("source")["doc_id"].count().to_dict()
    assert counts == {"a": 5, "b": 5, "c": 1}
    for src, g in out1.groupby("source"):
        assert sorted(g["sample_rank"]) == list(range(1, len(g) + 1))
    assert (out1.sort_values("doc_id").reset_index(drop=True)
            .equals(out2.sort_values("doc_id").reset_index(drop=True)))
