"""Dedup + similarity operators on planted-duplicate corpora (the driver
tables have no near-dups, so the recall behavior is proven here)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray
from norsk_historisk_avis_ocr_ray.functions import dedup


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """95 docs: 80 unique + 10 exact dups of docs 0..9 (ids 1000+i) +
    5 near dups of docs 20..24 (ids 2020..2024, one word changed)."""
    rng = np.random.default_rng(13)
    words = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(80):
        text = " ".join(rng.choice(words, size=60))
        rows.append({"doc_id": i, "text": text})
    for i in range(10):  # exact dups
        rows.append({"doc_id": 1000 + i, "text": rows[i]["text"]})
    for i in range(20, 25):  # near dups: one word substituted
        toks = rows[i]["text"].split()
        toks[30] = "CHANGED"
        rows.append({"doc_id": 2000 + i, "text": " ".join(toks)})
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def test_exact_dedup_drops_dup_pairs(planted_dir):
    out = dedup.dedup_exact(planted_dir)
    ids = set(out["doc_id"])
    assert len(out) == 85  # 95 rows - 10 exact dups (min doc_id survives)
    for i in range(10):
        assert i in ids and (1000 + i) not in ids


def test_minhash_finds_exact_and_near_dups(planted_dir):
    out = dedup.dedup_minhash(planted_dir, threshold=0.8)
    pairs = set(zip(out["a"], out["b"]))
    for i in range(10):  # exact dups: jaccard 1.0, must be found
        assert (i, 1000 + i) in pairs
    near_found = sum((i, 2000 + i) in pairs for i in range(20, 25))
    assert near_found >= 4  # 1-word-in-60 change ⇒ jaccard ≈ 0.95
    jac = dict(zip(zip(out["a"], out["b"]), out["jaccard"]))
    assert jac[(0, 1000)] == 1.0


def test_simhash_finds_dups(planted_dir):
    out = dedup.dedup_simhash(planted_dir, max_hamming=3)
    pairs = set(zip(out["a"], out["b"]))
    for i in range(10):
        assert (i, 1000 + i) in pairs  # identical text ⇒ hamming 0
    assert all(h <= 3 for h in out["hamming"])


def test_ngram_jaccard_scalar():
    assert dedup.ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert dedup.ngram_jaccard("a b c d e", "x y z w v") == 0.0
    j = dedup.ngram_jaccard("a b c d e f", "a b c d e g")
    assert 0.4 < j < 0.8


def test_hash64_deterministic_across_calls():
    # must NOT be Python's salted hash
    assert dedup._hash64("token") == dedup._hash64("token")
    assert dedup._hash64("a") != dedup._hash64("b")


def test_minhash_signature_similarity_tracks_jaccard():
    mh = dedup.MinHasher()
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    true = dedup.ngram_jaccard(a, b)
    assert abs(est - true) < 0.2
