"""Input sources for the extraction pipeline.

The north-star input is a Lance table of interleaved documents
(BASELINE.json input_hint). The ``lance`` package is not installed in this
container, so ``read_docs`` dispatches on what's available/on-disk:

- ``*.lance`` dataset dir + importable ``lance`` -> ``ray.data.read_lance``
  (column projection pushed down)
- ``*.jsonl`` / ``*.json`` (one doc object per line) -> ``ray.data.read_json``
  (arrow-native JSON reader; columns projected after the scan — JSONL has
  no columnar footer to push into)
- parquet file/dir -> ``ray.data.read_parquet``

Payload stores similarly load from a (media_ref, bytes) parquet/lance
table into a broadcastable dict (small/test scale) or stay behind a
resolver callable (blob-store scale; see stages/extract.py).
"""

from __future__ import annotations

import os

DOC_COLUMNS = ["doc_id", "spans"]


def _have_lance() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_docs(path: str, columns=None):
    """Read the interleaved docs table as a ray Dataset."""
    import ray.data as rd

    columns = columns or DOC_COLUMNS
    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        if not _have_lance():
            raise RuntimeError(
                "input looks like a Lance dataset but the `lance` package "
                "is not installed in this environment"
            )
        return rd.read_lance(path, columns=columns)
    if path.endswith((".jsonl", ".json")):
        return rd.read_json(path).select_columns(columns)
    return rd.read_parquet(path, columns=columns)


def load_payload_dict(path: str) -> dict[str, bytes]:
    """Load a (media_ref, bytes) payload table into a dict for ray.put
    broadcast. Only for payload sets that fit comfortably in the object
    store; larger stores should stay external behind ``payload_resolver``."""
    import pyarrow.parquet as pq

    if path.endswith(".lance"):
        if not _have_lance():
            raise RuntimeError("lance not installed")
        import lance

        tbl = lance.dataset(path).to_table()
    else:
        tbl = pq.read_table(path)
    return dict(
        zip(tbl.column("media_ref").to_pylist(), tbl.column("bytes").to_pylist())
    )
