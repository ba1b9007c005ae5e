"""Lance-first IO dispatch (sources/io.py).

The container has no `lance` package, so the Lance branch had never
executed. These tests exercise BOTH sides of the gate: the parquet
fallback on a `.lance` path with the library absent, and the actual
read_lance/write_lance dispatch with a stubbed `lance` module (the
dispatch decision and argument passing are ours; the library internals are
Ray's/LanceDB's).
"""

import sys
import types

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray
import ray.data
from norsk_historisk_avis_ocr_ray.sources import io as nio


def test_lance_path_falls_back_to_parquet_without_library(tmp_path):
    assert not nio._have_lance()  # this container has no lance
    d = tmp_path / "docs.lance"   # lance-style path, parquet content
    d.mkdir()
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                             "text": pa.array(["a", "b"])}),
                   str(d / "part0.parquet"))
    ds = nio.read_documents(str(d))
    assert ds.count() == 2


def test_read_documents_dispatches_to_read_lance(monkeypatch, tmp_path):
    calls = {}
    real = ray.data.read_parquet
    src = tmp_path / "real.parquet"
    pq.write_table(pa.table({"doc_id": pa.array([7], pa.int64())}), str(src))

    def fake_read_lance(path, **kwargs):
        calls["path"] = path
        calls["kwargs"] = kwargs
        return real(str(src))

    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance)
    ds = nio.read_documents("/data/corpus.lance", columns=["doc_id"])
    assert calls["path"] == "/data/corpus.lance"
    assert calls["kwargs"] == {"columns": ["doc_id"]}
    assert ds.count() == 1


def test_write_output_dispatches_to_write_lance(monkeypatch, tmp_path):
    calls = {}

    def fake_write_lance(self, path, **kwargs):
        calls["path"] = path

    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    monkeypatch.setattr(ray.data.Dataset, "write_lance", fake_write_lance,
                        raising=False)
    ds = ray.data.from_items([{"x": 1}])
    nio.write_output(ds, "/out/result.lance")
    assert calls["path"] == "/out/result.lance"


def test_write_output_parquet_fallback(tmp_path):
    out = tmp_path / "res.lance"
    ds = ray.data.from_items([{"x": 1}, {"x": 2}])
    nio.write_output(ds, str(out))  # no lance → parquet files under the dir
    assert ray.data.read_parquet(str(out)).count() == 2


@pytest.mark.skipif(not nio._have_lance(),
                    reason="lance not installed in this container")
def test_lance_real_roundtrip(tmp_path):
    """REAL read_lance/write_lance round-trip — runs automatically in any
    environment where `lance` is importable (the tesseract skip-gate
    pattern; VERDICT r03 item 7: the Lance branch had never executed
    against the real library)."""
    out = tmp_path / "docs.lance"
    ds = ray.data.from_items(
        [{"doc_id": i, "text": f"t{i}"} for i in range(5)])
    nio.write_output(ds, str(out))
    back = nio.read_documents(str(out), columns=["doc_id"])
    assert sorted(back.to_pandas()["doc_id"].tolist()) == list(range(5))


def test_jsonl_and_csv_ingest(tmp_path):
    (tmp_path / "a.jsonl").write_text('{"doc_id": 1, "text": "x"}\n'
                                      '{"doc_id": 2, "text": "y"}\n')
    (tmp_path / "b.csv").write_text("doc_id,text\n3,z\n")
    assert nio.read_documents(str(tmp_path / "a.jsonl")).count() == 2
    assert nio.read_documents(str(tmp_path / "b.csv")).count() == 1
