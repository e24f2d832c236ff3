"""The extraction stage: an actor-pool ``map_batches`` callable.

Design (SURVEY.md §2.8, §4):
- stateful pieces (payload store handle, font cache) live in ``__init__``
  — once per actor, not per batch
- batches are Arrow in / Arrow out (``batch_format="pyarrow"``); the
  per-document parse is necessarily row-wise Python, but batch assembly is
  columnar and payload bytes are read zero-copy from the broadcast object
- a poison PDF fails the ROW (status='error'), never the task: the
  reference crashes by design (244 todo! sites) and a task-retry loop on a
  deterministic panic would hang a 10^12-doc job (SURVEY.md §4 retries row)
- ``payloads`` is a ``ray.ObjectRef`` to a dict ``media_ref -> bytes``
  placed once with ``ray.put`` on the driver (broadcast, not re-shipped per
  batch). For payload stores too large to broadcast, pass
  ``payload_resolver`` — any callable ``media_ref -> bytes`` (e.g. a
  bucketed lookup service); the per-row logic is identical.
"""

from __future__ import annotations

import pyarrow as pa

from ..pdfcore.interp import Interpreter
from ..pdfcore.document import Document
from ..schema import EXTRACTED

_MAX_ERROR_LEN = 512


class ExtractStage:
    """Callable class for ``ds.map_batches(ExtractStage, concurrency=N,
    batch_format="pyarrow", fn_constructor_kwargs=...)``."""

    def __init__(
        self,
        payloads=None,
        payload_resolver=None,
        collect_images=False,
        apply_tounicode=False,
    ):
        if payloads is not None:
            import ray

            store = ray.get(payloads) if not isinstance(payloads, dict) else payloads
            self.resolver = store.get
        elif payload_resolver is not None:
            self.resolver = payload_resolver
        else:
            self.resolver = lambda ref: None
        self.collect_images = collect_images
        self.apply_tounicode = apply_tounicode
        # font-program cache shared across all rows this actor processes
        # (reference reloads fonts per draw_text call — SURVEY §2.5)
        self.font_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        in_spans = batch.column("spans").to_pylist()
        out_rows = []
        for doc_id, spans in zip(doc_ids, in_spans):
            out_rows.append(self._extract_doc(doc_id, spans or []))
        return pa.Table.from_pylist(out_rows, schema=EXTRACTED)

    def _extract_doc(self, doc_id: str, in_spans: list[dict]) -> dict:
        out_spans: list[dict] = []
        try:
            for sp in in_spans:
                kind = sp.get("kind")
                if kind == "text":
                    out_spans.append(
                        {
                            "kind": "text",
                            "text": sp.get("text"),
                            "media_ref": None,
                            "order": 0,
                        }
                    )
                elif kind == "media":
                    ref = sp.get("media_ref")
                    pdf_bytes = self.resolver(ref)
                    if pdf_bytes is None:
                        raise KeyError(f"payload {ref!r} not found")
                    doc = Document(pdf_bytes)
                    interp = Interpreter(
                        doc,
                        collect_images=self.collect_images,
                        font_cache=self.font_cache,
                        apply_tounicode=self.apply_tounicode,
                    )
                    for k, text, mref, _ in interp.run():
                        out_spans.append(
                            {"kind": k, "text": text, "media_ref": mref, "order": 0}
                        )
                else:
                    raise ValueError(f"bad input span kind {kind!r}")
            for i, sp in enumerate(out_spans):
                sp["order"] = i
            return {
                "doc_id": doc_id,
                "spans": out_spans,
                "n_spans": len(out_spans),
                "status": "ok",
                "error": None,
            }
        except Exception as e:  # row-level containment
            return {
                "doc_id": doc_id,
                "spans": [],
                "n_spans": 0,
                "status": "error",
                "error": f"{type(e).__name__}: {e}"[:_MAX_ERROR_LEN],
            }
