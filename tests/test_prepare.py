"""Resumable training-corpus preparation job (pipelines/prepare.py):
content parity with the oracled q_training_corpus, shard-level resume
(finished shards never rewritten), and crash-idempotence of the commit
protocol."""

import os

import pandas as pd
import pytest

from norsk_historisk_avis_ocr_ray.pipelines.prepare import (
    prepare_training_corpus,
    read_prepared,
)

SF = "/root/testdata/sf0.001"


def test_prepare_matches_query_surface(ray_session, tmp_path):
    out = str(tmp_path / "corpus")
    summary = prepare_training_corpus(SF, out, n_shards=8)
    assert summary["written"] == 8 and summary["skipped"] == 0

    got = (read_prepared(out).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    from norsk_historisk_avis_ocr_ray.functions.mlprep import q_training_corpus
    exp = (q_training_corpus(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_tokens", "quality", "contamination_frac"]],
        exp, check_dtype=False)
    assert (got["text"].str.len() > 0).all()  # the corpus carries the text


def test_prepare_resume_skips_finished_shards(ray_session, tmp_path):
    out = str(tmp_path / "corpus")
    prepare_training_corpus(SF, out, n_shards=8)
    mtimes = {f: os.path.getmtime(os.path.join(out, f))
              for f in os.listdir(out) if f.endswith(".parquet")}

    rerun = prepare_training_corpus(SF, out, n_shards=8)
    assert rerun["written"] == 0 and rerun["skipped"] == 8
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == m  # untouched


def test_prepare_resumes_after_partial_manifest(ray_session, tmp_path):
    """Simulate a crash: drop the last manifest lines (outputs exist but are
    uncommitted) — the rerun must rewrite exactly the uncommitted shards and
    end with a complete, correct corpus."""
    out = str(tmp_path / "corpus")
    prepare_training_corpus(SF, out, n_shards=8)
    full = (read_prepared(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))

    mpath = os.path.join(out, "manifest.jsonl")
    lines = open(mpath).read().strip().splitlines()
    open(mpath, "w").write("\n".join(lines[:5]) + "\n")  # "crash" after 5

    rerun = prepare_training_corpus(SF, out, n_shards=8)
    assert rerun["written"] == 3 and rerun["skipped"] == 5
    again = (read_prepared(out).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(full, again)


def test_prepare_zero_survivors(ray_session, tmp_path):
    """A corpus where every doc is benchmark-excluded (doc_id % 20 == 0)
    yields zero survivors: the job must still commit every shard (as empty)
    and resume as a no-op — regression for a KeyError on the column-less
    lineage frame."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 20, 40], pa.int64()),
        "text": pa.array(["a b c d e f", "g h i j k l", "m n o p q r"]),
    }), str(tmp_path / "documents.parquet"))
    out = str(tmp_path / "corpus")
    first = prepare_training_corpus(str(tmp_path), out, n_shards=4)
    assert first["written"] == 4
    rerun = prepare_training_corpus(str(tmp_path), out, n_shards=4)
    assert rerun["written"] == 0 and rerun["skipped"] == 4
    assert read_prepared(out).count() == 0
