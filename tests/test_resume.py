"""Resume-after-crash: kill after K shard commits, re-run, output identical
to an uninterrupted run (the north rule's checkpoint criterion)."""

import os

import pyarrow.parquet as pq
import pytest

from norsk_historisk_avis_ocr_ray.pipelines.run import run_resumable
from norsk_historisk_avis_ocr_ray.synth.corpus import write_corpus_parallel


@pytest.fixture(scope="module")
def copart_dir(tmp_path_factory):
    import ray
    assert ray.is_initialized()
    d = str(tmp_path_factory.mktemp("copart"))
    write_corpus_parallel(d, 24, seed=5, n_shards=6)
    return d


def read_all(out_dir):
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    tables = {f: pq.read_table(os.path.join(out_dir, f)) for f in files}
    return {doc["doc_id"]: doc for t in tables.values() for doc in t.to_pylist()}


def test_crash_and_resume_is_equivalent(copart_dir, tmp_path):
    clean_out = str(tmp_path / "clean")
    summary = run_resumable(copart_dir, clean_out)
    assert not summary["crashed"] and summary["committed"] == 6

    crash_out = str(tmp_path / "crashy")
    s1 = run_resumable(copart_dir, crash_out, fail_after=2, max_in_flight=2)
    assert s1["crashed"] and s1["committed"] == 2

    s2 = run_resumable(copart_dir, crash_out)
    assert not s2["crashed"]
    assert s2["already_done"] == 2
    assert s2["committed"] == 4

    assert read_all(clean_out) == read_all(crash_out)


def test_rerun_is_noop(copart_dir, tmp_path):
    out = str(tmp_path / "out")
    run_resumable(copart_dir, out)
    s = run_resumable(copart_dir, out)
    assert s["committed"] == 0 and s["already_done"] == 6


def test_lineage_records(copart_dir, tmp_path):
    out = str(tmp_path / "out")
    run_resumable(copart_dir, out)
    from norsk_historisk_avis_ocr_ray.state.manifest import Manifest
    recs = Manifest(os.path.join(out, "manifest.jsonl")).committed()
    assert len(recs) == 6
    for r in recs.values():
        assert 0 < r["docs_out"] <= r["docs_in"]  # dup doc_ids dedupe on ingest
        assert r["spans_out"] >= 0 and r["wall_s"] >= 0
        assert os.path.exists(r["output"])
