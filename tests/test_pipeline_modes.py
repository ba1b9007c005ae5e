"""All media-resolution modes and the shard-local pipeline must produce the
same golden span sequences as the broadcast-mode pipeline."""

import pyarrow as pa
import pytest

import ray
from norsk_historisk_avis_ocr_ray.pipelines.extract import extract
from norsk_historisk_avis_ocr_ray.pipelines.sharded import extract_sharded
from norsk_historisk_avis_ocr_ray.synth.corpus import write_corpus

N_DOCS = 40


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(d, N_DOCS, seed=7, n_doc_files=4)
    return d


def golden_map(corpus_dir):
    import pyarrow.parquet as pq
    g = pq.read_table(f"{corpus_dir}/golden.parquet")
    return {r["doc_id"]: r for r in g.to_pylist()}


def span_key(spans):
    return [(s["kind"], s["text"], s["media_ref"])
            for s in sorted(spans, key=lambda s: s["offset"])]


def check(out_ds, corpus_dir):
    got = {r["doc_id"]: r for r in
           pa.Table.from_pandas(out_ds.to_pandas()).to_pylist()}
    golden = golden_map(corpus_dir)
    assert set(got) == set(golden)
    for doc_id, g in golden.items():
        assert span_key(got[doc_id]["spans"]) == span_key(g["spans"]), doc_id
        assert got[doc_id]["combined"] == g["combined"], doc_id
        assert got[doc_id]["transcribed"] == g["transcribed"], doc_id


def _docs_pages(corpus_dir):
    import pyarrow.parquet as pq
    docs = ray.data.read_parquet(f"{corpus_dir}/documents")
    pages = pq.read_table(f"{corpus_dir}/pages.parquet")
    return docs, pages


def test_store_mode(corpus_dir, tmp_path):
    # store mode wants a pages directory — reuse the single parquet file
    docs, _ = _docs_pages(corpus_dir)
    out = extract(docs, f"{corpus_dir}/pages.parquet", ocr_concurrency=2,
                  media_resolution="store")
    check(out, corpus_dir)


def test_dataflow_mode(corpus_dir):
    docs, pages = _docs_pages(corpus_dir)
    out = extract(docs, pages, ocr_concurrency=2, media_resolution="dataflow")
    check(out, corpus_dir)


def test_dataflow_task_form_ocr(corpus_dir):
    # elastic-task OCR (per-worker-process engine cache, read->OCR fusion)
    # must be span-for-span identical to the actor-pool form
    docs, pages = _docs_pages(corpus_dir)
    out = extract(docs, pages, ocr_concurrency=2, media_resolution="dataflow",
                  ocr_compute="tasks")
    check(out, corpus_dir)


def test_page_ocr_batch_matches_stage(corpus_dir):
    # task-form wrapper == actor stage, for class factories (cached) and
    # non-class factories (uncached fallback path) alike — no Ray involved
    from functools import partial

    import pyarrow.parquet as pq
    from norsk_historisk_avis_ocr_ray.stages.ocr import (
        MockBarcodeOcr, PageOcrStage, page_ocr_batch)

    t = pq.read_table(f"{corpus_dir}/pages.parquet",
                      columns=["media_ref", "image", "width", "height",
                               "codec"])
    want = PageOcrStage()(t)
    assert page_ocr_batch(t).equals(want)
    # partial() is not a type -> constructed per call, same output
    assert page_ocr_batch(t, engine_factory=partial(MockBarcodeOcr)).equals(
        want)


def test_dataflow_span_checkpoint(corpus_dir, tmp_path):
    # checkpointed exploded-span stream (parquet roundtrip + column-pruned
    # re-read) must be span-for-span identical to the recompute default
    docs, pages = _docs_pages(corpus_dir)
    out = extract(docs, pages, ocr_concurrency=2, media_resolution="dataflow",
                  span_checkpoint=str(tmp_path))
    check(out, corpus_dir)
    import os
    assert os.path.isdir(str(tmp_path / "exploded_spans"))  # durable artifact


def test_dataflow_skew_split(corpus_dir):
    docs, pages = _docs_pages(corpus_dir)
    out = extract(docs, pages, ocr_concurrency=2, media_resolution="dataflow",
                  skew_split_width=2400)
    check(out, corpus_dir)


def test_sharded(corpus_dir, tmp_path):
    # shard-local layout: pages must be a co-partitioned directory; the test
    # corpus has one pages file — single-shard equivalent: rewrite as dirs
    import os
    import pyarrow.parquet as pq
    d = str(tmp_path / "copart")
    os.makedirs(f"{d}/pages")
    os.makedirs(f"{d}/documents")
    docs = pq.read_table(f"{corpus_dir}/documents")
    pq.write_table(docs, f"{d}/documents/part-0000.parquet")
    pq.write_table(pq.read_table(f"{corpus_dir}/pages.parquet"),
                   f"{d}/pages/part-0000.parquet")
    out = extract_sharded(d)
    check(out, corpus_dir)


def test_actor_corrector_matches_task_corrector(corpus_dir):
    # actor-pool corrector form: 1 OCR + 2 corrector actors fit in 4 CPUs
    docs, pages = _docs_pages(corpus_dir)
    out = extract(docs, pages, ocr_concurrency=1, corrector_concurrency=2)
    check(out, corpus_dir)


def test_read_documents_jsonl_and_csv(ray_session, tmp_path):
    """Raw-crawl drop formats ingest through the same reader: the span
    pipeline must produce identical output from parquet, JSONL and CSV
    copies of the same documents table."""
    import pandas as pd
    import pyarrow.parquet as pq

    from norsk_historisk_avis_ocr_ray.sources.io import read_documents

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas().head(50)
    pqp = str(tmp_path / "docs.parquet")
    jlp = str(tmp_path / "docs.jsonl")
    csp = str(tmp_path / "docs.csv")
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(src, preserve_index=False), pqp)
    src.to_json(jlp, orient="records", lines=True)
    src.to_csv(csp, index=False)

    def canon(ds):
        return (ds.to_pandas().astype({"doc_id": "int64"})
                .sort_values("doc_id").reset_index(drop=True)
                [["doc_id", "text"]])

    a = canon(read_documents(pqp))
    b = canon(read_documents(jlp))
    c = canon(read_documents(csp))
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)
