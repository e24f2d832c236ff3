"""Ray pipeline end-to-end: corpus -> extract -> exact golden equality,
plus lineage/resume and parallelism-invariance."""

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus():
    from pdf_ray.fixtures.tables import build_corpus

    docs, pay, golden, _golden_uni, _golden_main, _golden_ocg = build_corpus(
        replicas=2
    )
    return docs, pay, golden


def _extract_table(docs, payload_tbl, **kw):
    import ray.data as rd

    from pdf_ray.pipelines.extract import extract_dataset

    payloads = dict(
        zip(
            payload_tbl.column("media_ref").to_pylist(),
            payload_tbl.column("bytes").to_pylist(),
        )
    )
    ds = rd.from_arrow(docs)
    out = extract_dataset(ds, payloads, concurrency=2, **kw)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_extract_matches_golden(ray_session, corpus):
    docs, payload_tbl, golden = corpus
    got = _extract_table(docs, payload_tbl)
    want = golden.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["status"]) == list(want["status"])
    assert list(got["n_spans"]) == list(want["n_spans"])
    for i in range(len(got)):
        g = [tuple(sp.values()) for sp in got["spans"][i]]
        w = [tuple(sp.values()) for sp in want["spans"][i]]
        assert g == w, f"span mismatch for {got['doc_id'][i]}"


def test_batch_size_invariance(ray_session, corpus):
    docs, payload_tbl, _ = corpus
    a = _extract_table(docs, payload_tbl, batch_size=4)
    b = _extract_table(docs, payload_tbl, batch_size=64)
    assert list(a["doc_id"]) == list(b["doc_id"])
    for i in range(len(a)):
        assert [tuple(s.values()) for s in a["spans"][i]] == [
            tuple(s.values()) for s in b["spans"][i]
        ]


def test_run_extract_and_resume(ray_session, corpus, tmp_path):
    import ray

    from pdf_ray.pipelines.extract import completed_doc_ids, run_extract

    docs, payload_tbl, golden = corpus
    in_path = str(tmp_path / "docs.parquet")
    out_dir = str(tmp_path / "out")
    pq.write_table(docs, in_path)
    payloads = dict(
        zip(
            payload_tbl.column("media_ref").to_pylist(),
            payload_tbl.column("bytes").to_pylist(),
        )
    )
    pref = ray.put(payloads)
    stats = run_extract(in_path, out_dir, pref, concurrency=2)
    assert stats["n_ok"] + stats["n_err"] == docs.num_rows
    assert stats["n_err"] == 2 * 2  # two poison fixtures x two replicas
    assert stats["skipped"] == 0
    assert len(completed_doc_ids(out_dir)) == docs.num_rows

    # resume: everything already done -> nothing re-extracted
    stats2 = run_extract(in_path, out_dir, pref, concurrency=2)
    assert stats2["skipped"] == docs.num_rows
    assert stats2["n_ok"] == 0 and stats2["n_err"] == 0

    # output rows == input rows, readable as one dataset
    import glob

    parts = glob.glob(f"{out_dir}/part-*.parquet")
    total = sum(pq.read_metadata(p).num_rows for p in parts)
    assert total == docs.num_rows


def test_resume_never_broadcasts_doc_ids(ray_session, corpus, tmp_path, monkeypatch):
    """Round-3 verdict #1 regression guard: the resume path must be the
    shuffle-based anti-join — NO ``ray.put`` of a doc-id collection (the
    done-set is tens of GB at 10^9+ docs) and no per-row Python
    membership filter."""
    import ray

    from pdf_ray.pipelines import extract as ex

    docs, payload_tbl, _ = corpus
    in_path = str(tmp_path / "docs.parquet")
    out_dir = str(tmp_path / "out")
    pq.write_table(docs, in_path)
    payloads = dict(
        zip(
            payload_tbl.column("media_ref").to_pylist(),
            payload_tbl.column("bytes").to_pylist(),
        )
    )
    pref = ray.put(payloads)
    ex.run_extract(in_path, out_dir, pref, concurrency=2)

    all_ids = set(docs.column("doc_id").to_pylist())
    offenders = []
    real_put = ray.put

    def spy_put(obj, **kw):
        # Ray Data internally puts ReadTask lists and read file-path
        # lists; the forbidden shape is a collection containing DOC IDS
        if isinstance(obj, (set, frozenset, list, tuple)) and any(
            isinstance(x, str) and x in all_ids for x in obj
        ):
            offenders.append(obj)
        return real_put(obj, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    stats = ex.run_extract(in_path, out_dir, pref, concurrency=2)
    assert stats["skipped"] == docs.num_rows
    assert stats["n_ok"] == 0 and stats["n_err"] == 0
    assert not offenders, f"resume path broadcast doc-id collections: {offenders}"


def test_resume_refuses_flag_mismatch(ray_session, corpus, tmp_path):
    """Manifests record extraction flags; resuming into an output_dir
    committed under different flags must raise, not silently mix
    stripped and unstripped docs (round-3 ADVICE)."""
    import ray

    import pytest

    from pdf_ray.pipelines.extract import run_extract

    docs, payload_tbl, _ = corpus
    in_path = str(tmp_path / "docs.parquet")
    out_dir = str(tmp_path / "out")
    pq.write_table(docs, in_path)
    payloads = dict(
        zip(
            payload_tbl.column("media_ref").to_pylist(),
            payload_tbl.column("bytes").to_pylist(),
        )
    )
    pref = ray.put(payloads)
    run_extract(in_path, out_dir, pref, concurrency=2)
    with pytest.raises(ValueError, match="resume refused"):
        run_extract(
            in_path, out_dir, pref, concurrency=2, strip_artifacts=True
        )
    # resume=False into a FRESH dir under the other flag is fine
    run_extract(
        in_path,
        str(tmp_path / "out2"),
        pref,
        concurrency=2,
        strip_artifacts=True,
        resume=False,
    )


def test_explode_spans(ray_session, corpus):
    import ray.data as rd

    from pdf_ray.pipelines.extract import explode_spans, extract_dataset

    docs, payload_tbl, golden = corpus
    payloads = dict(
        zip(
            payload_tbl.column("media_ref").to_pylist(),
            payload_tbl.column("bytes").to_pylist(),
        )
    )
    flat = explode_spans(
        extract_dataset(rd.from_arrow(docs), payloads, concurrency=2)
    ).to_pandas()
    n_expected = sum(
        len(sp) for sp in golden.column("spans").to_pylist()
    )
    assert len(flat) == n_expected
    assert set(flat.columns) == {"doc_id", "kind", "text", "media_ref", "order"}


def test_parallelism_level_invariance(ray_session, corpus):
    """SURVEY §5 pyramid item 4: same corpus at two parallelism levels ->
    bit-identical spans."""
    docs, payload_tbl, _ = corpus
    a = _extract_table(docs, payload_tbl)  # concurrency=2 (helper default)
    import ray.data as rd

    from pdf_ray.pipelines.extract import extract_dataset

    payloads = dict(
        zip(
            payload_tbl.column("media_ref").to_pylist(),
            payload_tbl.column("bytes").to_pylist(),
        )
    )
    b = (
        extract_dataset(rd.from_arrow(docs), payloads, concurrency=1, batch_size=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(a["doc_id"]) == list(b["doc_id"])
    for i in range(len(a)):
        assert [tuple(s.values()) for s in a["spans"][i]] == [
            tuple(s.values()) for s in b["spans"][i]
        ]


def test_partial_resume(ray_session, corpus, tmp_path):
    """Resume-after-interruption equivalence: a run over HALF the corpus
    (simulating a killed job's completed partitions), then a resumed full
    run, must extract each doc exactly once and cover everything."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from pdf_ray.pipelines.extract import completed_doc_ids, run_extract

    docs, payload_tbl, golden = corpus
    half = docs.slice(0, docs.num_rows // 2)
    payloads = dict(
        zip(
            payload_tbl.column("media_ref").to_pylist(),
            payload_tbl.column("bytes").to_pylist(),
        )
    )
    pref = ray.put(payloads)
    half_path = str(tmp_path / "half.parquet")
    full_path = str(tmp_path / "full.parquet")
    out_dir = str(tmp_path / "out")
    pq.write_table(half, half_path)
    pq.write_table(docs, full_path)

    s1 = run_extract(half_path, out_dir, pref, concurrency=2)
    assert s1["n_ok"] + s1["n_err"] == half.num_rows
    s2 = run_extract(full_path, out_dir, pref, concurrency=2)
    assert s2["skipped"] == half.num_rows
    assert s1["n_ok"] + s1["n_err"] + s2["n_ok"] + s2["n_err"] == docs.num_rows
    assert completed_doc_ids(out_dir) == set(docs.column("doc_id").to_pylist())
    total = sum(
        pq.read_metadata(p).num_rows
        for p in glob.glob(f"{out_dir}/part-*.parquet")
    )
    assert total == docs.num_rows  # each doc exactly once


def test_orphan_shard_gc_and_committed_read(ray_session, corpus, tmp_path):
    """A shard published WITHOUT its manifest (crash between the two
    writes) is an orphan: committed readers must skip it and resume must
    GC it, then re-extract its docs exactly once."""
    import glob

    import ray

    from pdf_ray.pipelines.extract import (
        committed_part_files,
        completed_doc_ids,
        gc_orphan_shards,
        read_extracted,
        run_extract,
    )

    docs, payload_tbl, golden = corpus
    in_path = str(tmp_path / "docs.parquet")
    out_dir = str(tmp_path / "out")
    pq.write_table(docs, in_path)
    payloads = dict(
        zip(
            payload_tbl.column("media_ref").to_pylist(),
            payload_tbl.column("bytes").to_pylist(),
        )
    )
    pref = ray.put(payloads)
    run_extract(in_path, out_dir, pref, concurrency=2)

    # simulate the crash: drop one manifest, keeping its (now-orphan) shard
    import json
    import os

    mdir = os.path.join(out_dir, "_lineage")
    victim = sorted(os.listdir(mdir))[0]
    with open(os.path.join(mdir, victim)) as f:
        lost = json.load(f)
    os.remove(os.path.join(mdir, victim))

    all_parts = set(glob.glob(f"{out_dir}/part-*.parquet"))
    committed = set(committed_part_files(out_dir))
    assert os.path.join(out_dir, lost["file"]) in all_parts - committed
    assert set(lost["doc_ids"]).isdisjoint(completed_doc_ids(out_dir))

    # resume: orphan GC'd, lost docs re-extracted, output exactly-once
    stats = run_extract(in_path, out_dir, pref, concurrency=2)
    assert stats["skipped"] == docs.num_rows - len(lost["doc_ids"])
    assert stats["n_ok"] + stats["n_err"] == len(lost["doc_ids"])
    out = read_extracted(out_dir).to_pandas()
    assert sorted(out["doc_id"]) == sorted(docs.column("doc_id").to_pylist())
    assert gc_orphan_shards(out_dir) == 0


def test_write_stage_retry_is_idempotent(ray_session, corpus, tmp_path):
    """A Ray task retry re-runs a batch whose shard+manifest already
    committed: content-derived ids make the second attempt overwrite, not
    duplicate."""
    import glob
    import os

    import ray

    from pdf_ray.pipelines.extract import ExtractWriteStage, read_extracted

    docs, payload_tbl, golden = corpus
    payloads = dict(
        zip(
            payload_tbl.column("media_ref").to_pylist(),
            payload_tbl.column("bytes").to_pylist(),
        )
    )
    out_dir = str(tmp_path / "out")
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    stage = ExtractWriteStage(payloads=payloads, output_dir=out_dir)
    batch = docs.slice(0, 8)
    s1 = stage(batch)
    s2 = stage(batch)  # simulated retry of the same batch
    assert s1.to_pylist() == s2.to_pylist()
    assert len(glob.glob(f"{out_dir}/part-*.parquet")) == 1
    assert len(glob.glob(f"{out_dir}/_lineage/*.json")) == 1
    got = read_extracted(out_dir).to_pandas()
    assert sorted(got["doc_id"]) == sorted(
        batch.column("doc_id").to_pylist()
    )


def test_annotation_and_outline_stages_emit_error_rows():
    """A corrupt payload must surface as an explicit error row (not a
    silently-empty doc) — the documented poison-containment model."""
    import pyarrow as pa

    from pdf_ray.stages.extract import AnnotationStage, OutlineStage

    batch = pa.table(
        {
            "doc_id": ["bad1"],
            "spans": [
                [{"kind": "media", "text": None, "media_ref": "m0", "offset": 0}]
            ],
        }
    )
    payloads = {"m0": b"%PDF-1.4 not really a pdf"}
    a = AnnotationStage(payloads=payloads)(batch)
    assert a.num_rows == 1
    assert a.column("subtype").to_pylist() == ["__error__"]
    assert a.column("page_index").to_pylist() == [-1]
    assert a.column("text").to_pylist()[0]

    o = OutlineStage(payloads=payloads)(batch)
    assert o.num_rows == 1
    assert o.column("level").to_pylist() == [-1]
    assert o.column("title").to_pylist()[0].startswith("__error__")


def test_write_curated_resume_and_orphan_gc(ray_session, tmp_path):
    """Curated-corpus writer: exactly-once shards via manifests — a full
    write commits every shard; a rerun skips all of them; deleting one
    manifest (its shard becomes an orphan) re-writes exactly that shard
    with identical content."""
    import json
    import os

    from pdf_ray.pipelines.curate import (
        _manifest_dir,
        gc_orphan_shards,
        read_curated,
        write_curated,
    )

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "curated")
    r1 = write_curated(sf, out, n_shards=8)
    assert r1["skipped"] == 0 and r1["written"] > 0
    total = read_curated(out).count()
    assert total == r1["n_rows"] > 0

    # rerun: everything committed -> nothing re-written
    r2 = write_curated(sf, out, n_shards=8)
    assert r2["written"] == 0 and r2["skipped"] == r1["written"]
    assert read_curated(out).count() == total

    # crash simulation: shard published but manifest lost -> orphan is
    # GC'd and exactly that shard is recomputed, byte-identical rows
    mdir = _manifest_dir(out)
    victim = sorted(os.listdir(mdir))[0]
    with open(os.path.join(mdir, victim)) as fh:
        man = json.load(fh)
    os.remove(os.path.join(mdir, victim))
    assert os.path.exists(os.path.join(out, man["file"]))
    r3 = write_curated(sf, out, n_shards=8)
    assert r3["written"] == 1 and r3["n_rows"] == man["n_rows"]
    assert read_curated(out).count() == total
    assert not gc_orphan_shards(out)  # nothing orphaned after commit
