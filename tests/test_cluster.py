"""Connected-components duplicate clustering: planted transitive chains,
DuckDB recursive-CTE parity, the distributed-join fallback path, and
union-find closure over verified MinHash pairs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from norsk_historisk_avis_ocr_ray.functions import cluster


def _write_docs(d, rows):
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def chain_dir(tmp_path_factory):
    """Planted transitive chain: doc 0 and doc 1 share a PREFIX key, doc 1
    and doc 2 share a SUFFIX key — 0↔2 are connected only transitively.
    Plus an isolated doc and a prefix-only pair."""
    p = "p0 p1 p2 p3 p4 p5 p6 p7"     # 8 shared prefix tokens
    s = "s0 s1 s2 s3 s4 s5 s6 s7"     # 8 shared suffix tokens
    rows = [
        {"doc_id": 0, "text": f"{p} alpha beta gamma uniq0"},
        {"doc_id": 1, "text": f"{p} mid middle words {s}"},
        {"doc_id": 2, "text": f"zeta eta theta uniq2 {s}"},
        {"doc_id": 3, "text": "totally unrelated text here and more"},
        {"doc_id": 4, "text": f"{p} other tail four distinct4"},
        # doc 5/6: suffix-only pair
        {"doc_id": 5, "text": f"five unique start {s.replace('s', 'z')}"},
        {"doc_id": 6, "text": f"six other opening {s.replace('s', 'z')}"},
    ]
    return _write_docs(tmp_path_factory.mktemp("chain"), rows)


def _oracle(sf_dir):
    import __ray_entry__ as entry
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con.execute(entry.oracle_sql()["dup_clusters"]).df()


def test_transitive_chain_clusters(chain_dir):
    out = cluster.dup_clusters(chain_dir).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    # 0-1 (prefix), 1-2 (suffix), 0-4 (prefix) ⇒ {0,1,2,4} one cluster
    assert got[0] == got[1] == got[2] == got[4] == 0
    assert got[3] == 3                      # isolated
    assert got[5] == got[6] == 5            # suffix-only pair
    assert list(out.columns) == ["doc_id", "cluster_id"]
    assert sorted(out["doc_id"]) == list(range(7))  # one row per doc


def test_matches_duckdb_recursive_cte(chain_dir):
    out = cluster.dup_clusters(chain_dir).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    ora = _oracle(chain_dir)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), ora.reset_index(drop=True),
        check_dtype=False)


def test_matches_oracle_on_sf0001():
    sf = "/root/testdata/sf0.001"
    out = cluster.dup_clusters(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    ora = _oracle(sf)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), ora.reset_index(drop=True),
        check_dtype=False)


def test_join_fallback_path_identical(chain_dir):
    """Forcing broadcast_cutover=0 exercises the distributed left-outer-join
    relabel path; the converged labels must be identical."""
    def cn(ds):
        return (ds.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))
    fast = cn(cluster.dup_clusters(chain_dir))
    slow = cn(cluster.dup_clusters(chain_dir, broadcast_cutover=0))
    pd.testing.assert_frame_equal(fast, slow)


def test_empty_corpus(tmp_path):
    d = _write_docs(tmp_path, [])
    # zero-row parquet still needs a schema
    pq.write_table(pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())}),
                   str(tmp_path / "documents.parquet"))
    out = cluster.dup_clusters(d)  # Dataset: check via schema/count —
    # Ray's to_pandas() on zero blocks drops columns by design
    assert sorted(out.schema().names) == ["cluster_id", "doc_id"]
    assert out.count() == 0


def test_minhash_clusters_transitive(tmp_path):
    """Three docs where A~B and B~C are near-dups but A~C is farther:
    the cluster must still union all three (transitive closure)."""
    base = [f"w{i}" for i in range(60)]
    a = " ".join(base)
    b_toks = list(base)
    b_toks[10] = "CHANGEDB"
    b = " ".join(b_toks)
    c_toks = list(b_toks)
    c_toks[50] = "CHANGEDC"
    c = " ".join(c_toks)
    rows = [{"doc_id": 1, "text": a}, {"doc_id": 2, "text": b},
            {"doc_id": 3, "text": c},
            {"doc_id": 9, "text": " ".join(f"z{i}" for i in range(60))}]
    d = _write_docs(tmp_path, rows)
    out = cluster.minhash_clusters(d, threshold=0.8)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got[1] == got[2] == got[3] == 1
    assert 9 not in got  # not in any verified pair


def test_union_find_closure_pure():
    """Driver union-find on a synthetic pair frame (no Ray): chain + star."""
    pairs = pd.DataFrame({"a": [1, 2, 5, 5], "b": [2, 3, 6, 7],
                          "jaccard": [1.0] * 4})
    import norsk_historisk_avis_ocr_ray.functions.cluster as cl

    out = cl._union_find_pairs(pairs)
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 5}
