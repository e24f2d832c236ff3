"""Input-source dispatch (sources/readers.py), including the Lance seam.

The ``lance`` package is absent in this container, so the Lance branch is
exercised through a STUBBED module injected into sys.modules plus a
monkeypatched ``ray.data.read_lance`` — the contract under test is the
dispatch decision (suffix / _versions marker), the column projection
pushdown, and the schema the rest of the pipeline assumes. The parquet
branch runs for real end-to-end into extraction.
"""

import sys
import types

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdf_ray.sources.readers import DOC_COLUMNS, load_payload_dict, read_docs


def _docs_table():
    from pdf_ray.fixtures.tables import build_corpus

    docs, pay, *_ = build_corpus(replicas=1)
    return docs, pay


def test_read_docs_parquet_branch(ray_session, tmp_path):
    docs, _ = _docs_table()
    p = str(tmp_path / "docs.parquet")
    pq.write_table(docs, p)
    ds = read_docs(p)
    assert set(ds.schema().names) == set(DOC_COLUMNS)
    assert ds.count() == docs.num_rows


def test_read_docs_lance_requires_package(tmp_path):
    """A .lance path without the package must fail loudly, not fall
    through to the parquet reader."""
    d = tmp_path / "corpus.lance"
    d.mkdir()
    sys.modules.pop("lance", None)
    with pytest.raises(RuntimeError, match="lance"):
        read_docs(str(d))


def test_read_docs_lance_dispatch_with_stub(tmp_path, monkeypatch):
    """Contract test for the gated branch: a stubbed ``lance`` module +
    patched ``ray.data.read_lance`` must receive the path and the doc
    column projection for BOTH triggers (.lance suffix and a _versions
    marker dir), and read_docs must return read_lance's dataset as-is."""
    import ray.data as rd

    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    calls = []
    sentinel = object()

    def fake_read_lance(path, columns=None, **kw):
        calls.append((path, tuple(columns)))
        return sentinel

    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)

    d1 = tmp_path / "corpus.lance"
    d1.mkdir()
    assert read_docs(str(d1)) is sentinel

    d2 = tmp_path / "plain_dir"
    (d2 / "_versions").mkdir(parents=True)
    assert read_docs(str(d2), columns=["doc_id"]) is sentinel

    assert calls == [
        (str(d1), tuple(DOC_COLUMNS)),  # default projection pushed down
        (str(d2), ("doc_id",)),
    ]


def test_load_payload_dict_parquet_and_lance_stub(tmp_path, monkeypatch):
    _, pay = _docs_table()
    p = str(tmp_path / "payloads.parquet")
    pq.write_table(pay, p)
    d = load_payload_dict(p)
    assert d == dict(
        zip(pay.column("media_ref").to_pylist(), pay.column("bytes").to_pylist())
    )

    # lance branch: stub dataset returning the same arrow table
    stub = types.ModuleType("lance")

    class _DS:
        def to_table(self):
            return pay

    stub.dataset = lambda path: _DS()
    monkeypatch.setitem(sys.modules, "lance", stub)
    assert load_payload_dict(str(tmp_path / "pay.lance")) == d


def test_read_docs_jsonl_branch_end_to_end(ray_session, tmp_path):
    """JSONL line-per-doc input must round-trip the nested spans schema
    and feed extraction identically to the parquet branch."""
    import json

    from pdf_ray.pipelines.extract import explode_spans, extract_dataset

    docs, pay = _docs_table()
    pj = str(tmp_path / "docs.jsonl")
    with open(pj, "w") as f:
        for row in docs.to_pylist():
            f.write(json.dumps(row) + "\n")
    pp = str(tmp_path / "payloads.parquet")
    pq.write_table(pay, pp)

    ds = read_docs(pj)
    assert set(ds.schema().names) == set(DOC_COLUMNS)
    assert ds.count() == docs.num_rows

    import ray

    payloads = ray.put(load_payload_dict(pp))
    via_jsonl = (
        explode_spans(extract_dataset(ds, payloads, concurrency=2))
        .to_pandas()
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
    )
    pqp = str(tmp_path / "docs.parquet")
    pq.write_table(docs, pqp)
    via_parquet = (
        explode_spans(extract_dataset(read_docs(pqp), payloads, concurrency=2))
        .to_pandas()
        .sort_values(["doc_id", "order"])
        .reset_index(drop=True)
    )
    assert via_jsonl.equals(via_parquet)
