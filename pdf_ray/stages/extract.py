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
        apply_actual_text=False,
        recover=False,
        strip_artifacts=False,
        strip_hidden_ocg=False,
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
        self.apply_actual_text = apply_actual_text
        self.recover = recover
        # main-content mode: drop spans painted inside /Artifact
        # marked-content scopes (page headers/footers/pagination — the PDF
        # analogue of the HTML boilerplate strip); span order is
        # re-enumerated over the kept sequence
        self.strip_artifacts = strip_artifacts
        # OCG mode: drop content inside /OC marked scopes and /OC-tagged
        # XObjects whose optional-content group is OFF in the default
        # configuration (pdfcore/ocg.py) — the other half of main-content
        # extraction (the reference parses /OCProperties but never
        # consults it, src/optional_content.rs)
        self.strip_hidden_ocg = strip_hidden_ocg
        # font-program cache shared across all rows this actor processes
        # (reference reloads fonts per draw_text call — SURVEY §2.5);
        # LRU-bounded so adversarial corpora can't grow the actor heap
        from ..state.cache import LruCache

        self.font_cache = LruCache(max_entries=4096)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Columnar batch assembly: per-doc span tuples land in flat
        arrays + list offsets (no per-span dicts) — this path runs for
        every span in the corpus, so it stays allocation-light."""
        doc_ids = batch.column("doc_id").to_pylist()
        in_spans = batch.column("spans").to_pylist()
        kinds: list[str] = []
        texts: list[str | None] = []
        refs: list[str | None] = []
        orders: list[int] = []
        offsets: list[int] = [0]
        statuses: list[str] = []
        errors: list[str | None] = []
        n_spans: list[int] = []
        for doc_id, spans in zip(doc_ids, in_spans):
            start = len(kinds)
            try:
                self._extract_doc(spans or [], kinds, texts, refs, orders, start)
                statuses.append("ok")
                errors.append(None)
            except Exception as e:  # row-level containment
                del kinds[start:], texts[start:], refs[start:], orders[start:]
                statuses.append("error")
                errors.append(f"{type(e).__name__}: {e}"[:_MAX_ERROR_LEN])
            n_spans.append(len(kinds) - start)
            offsets.append(len(kinds))

        span_struct = pa.StructArray.from_arrays(
            [
                pa.array(kinds, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(refs, pa.string()),
                pa.array(orders, pa.int32()),
            ],
            names=["kind", "text", "media_ref", "order"],
        )
        spans_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), span_struct
        )
        return pa.Table.from_arrays(
            [
                batch.column("doc_id").combine_chunks(),
                spans_col,
                pa.array(n_spans, pa.int32()),
                pa.array(statuses, pa.string()),
                pa.array(errors, pa.string()),
            ],
            schema=EXTRACTED,
        )

    def _extract_doc(self, in_spans, kinds, texts, refs, orders, start) -> None:
        for sp in in_spans:
            kind = sp.get("kind")
            if kind == "text":
                kinds.append("text")
                texts.append(sp.get("text"))
                refs.append(None)
            elif kind == "media":
                ref = sp.get("media_ref")
                pdf_bytes = self.resolver(ref)
                if pdf_bytes is None:
                    raise KeyError(f"payload {ref!r} not found")
                if ref.startswith("html://"):
                    # HTML half of the main-content rule: boilerplate
                    # strip + DOM heuristics (htmlcore). Dispatch is by
                    # the corpus's payload-type scheme, never by content
                    # sniff — a malformed PDF must stay a PDF error row.
                    from ..htmlcore import extract_main_content

                    for hsp in extract_main_content(pdf_bytes)["spans"]:
                        kinds.append(hsp["kind"])
                        texts.append(hsp["text"])
                        refs.append(hsp["media_ref"])
                    continue
                doc = Document(pdf_bytes, recover=self.recover)
                hidden = None
                if self.strip_hidden_ocg:
                    from ..pdfcore.ocg import hidden_ocg_refs

                    hidden = hidden_ocg_refs(doc)
                interp = Interpreter(
                    doc,
                    collect_images=self.collect_images,
                    font_cache=self.font_cache,
                    apply_tounicode=self.apply_tounicode,
                    apply_actual_text=self.apply_actual_text,
                    collect_mcids=self.strip_artifacts,
                    hidden_ocgs=hidden,
                )
                for page in doc.pages:
                    interp._run_page(page)
                for i, (k, text, mref) in enumerate(interp.spans):
                    if self.strip_artifacts and interp.span_marks[i][2]:
                        continue
                    kinds.append(k)
                    texts.append(text)
                    refs.append(mref)
                interp.spans.clear()
                interp.span_marks.clear()
            else:
                raise ValueError(f"bad input span kind {kind!r}")
        orders.extend(range(len(kinds) - start))


class AnnotationStage(ExtractStage):
    """Variant that emits ANNOTATION text rows (doc_id, page_index,
    annot_index, subtype, text, field_name) — FreeText/Text /Contents and
    Widget field values, the content a reader misses if only content
    streams are extracted (reference model: src/annotation/mod.rs).
    Same actor-pool shape and poison containment as ExtractStage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pdfcore.annotations import page_annotations

        rows: dict[str, list] = {
            "doc_id": [], "page_index": [], "annot_index": [],
            "subtype": [], "text": [], "field_name": [],
        }
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for sp in spans or []:
                if sp.get("kind") != "media":
                    continue
                blob = self.resolver(sp.get("media_ref"))
                if blob is None:
                    continue
                try:
                    doc = Document(blob)
                    for pi, page in enumerate(doc.pages):
                        for ai, a in enumerate(page_annotations(doc, page)):
                            rows["doc_id"].append(doc_id)
                            rows["page_index"].append(pi)
                            rows["annot_index"].append(ai)
                            rows["subtype"].append(a["subtype"])
                            rows["text"].append(a["text"])
                            rows["field_name"].append(a["field_name"])
                except Exception as e:
                    # row-level poison containment, made VISIBLE: a doc
                    # whose annotation walk fails (e.g. one unknown
                    # subtype) emits an explicit error row instead of
                    # silently dropping all its annotations
                    rows["doc_id"].append(doc_id)
                    rows["page_index"].append(-1)
                    rows["annot_index"].append(-1)
                    rows["subtype"].append("__error__")
                    rows["text"].append(
                        f"{type(e).__name__}: {e}"[:_MAX_ERROR_LEN]
                    )
                    rows["field_name"].append(None)
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "page_index": pa.array(rows["page_index"], pa.int32()),
                "annot_index": pa.array(rows["annot_index"], pa.int32()),
                "subtype": pa.array(rows["subtype"], pa.string()),
                "text": pa.array(rows["text"], pa.string()),
                "field_name": pa.array(rows["field_name"], pa.string()),
            }
        )


class OutlineStage(ExtractStage):
    """Variant that emits document OUTLINE rows (doc_id, order, level,
    title) — the bookmark hierarchy in depth-first display order
    (reference model: src/catalog.rs /Outlines). Same actor-pool shape
    and poison containment as ExtractStage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pdfcore.outlines import document_outlines

        rows: dict[str, list] = {
            "doc_id": [], "order": [], "level": [], "title": [],
        }
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for sp in spans or []:
                if sp.get("kind") != "media":
                    continue
                blob = self.resolver(sp.get("media_ref"))
                if blob is None:
                    continue
                try:
                    doc = Document(blob)
                    for o in document_outlines(doc):
                        rows["doc_id"].append(doc_id)
                        rows["order"].append(o["order"])
                        rows["level"].append(o["level"])
                        rows["title"].append(o["title"])
                except Exception as e:
                    # explicit error marker row (order=level=-1 is
                    # impossible for a real outline): failed docs are
                    # visible downstream, not silently bookmark-less
                    rows["doc_id"].append(doc_id)
                    rows["order"].append(-1)
                    rows["level"].append(-1)
                    rows["title"].append(
                        f"__error__ {type(e).__name__}: {e}"[:_MAX_ERROR_LEN]
                    )
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "order": pa.array(rows["order"], pa.int32()),
                "level": pa.array(rows["level"], pa.int32()),
                "title": pa.array(rows["title"], pa.string()),
            }
        )


class ImageBlobStage(ExtractStage):
    """Variant that emits the extracted image BLOBS instead of spans:
    (media_ref, png). Downstream: dedupe on media_ref (content-addressed,
    identical blobs collapse) and feed the multimodal stages or a blob
    sink. Same actor-pool shape and error containment as ExtractStage."""

    def __init__(self, payloads=None, payload_resolver=None):
        super().__init__(
            payloads=payloads,
            payload_resolver=payload_resolver,
            collect_images=True,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs: list[str] = []
        blobs: list[bytes] = []
        seen: set[str] = set()
        for spans in batch.column("spans").to_pylist():
            for sp in spans or []:
                if sp.get("kind") != "media":
                    continue
                pdf_bytes = self.resolver(sp.get("media_ref"))
                if pdf_bytes is None:
                    continue
                try:
                    doc = Document(pdf_bytes)
                    interp = Interpreter(
                        doc, collect_images=True, font_cache=self.font_cache
                    )
                    interp.run()
                except Exception:
                    continue  # poison rows contribute no blobs
                for ref, png in interp.images.items():
                    if ref not in seen:
                        seen.add(ref)
                        refs.append(ref)
                        blobs.append(png)
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "png": pa.array(blobs, pa.large_binary()),
            }
        )


class HtmlSummaryStage(ExtractStage):
    """Per-document HTML boilerplate-strip summary: (doc_id, title,
    n_kept, n_dropped, status) for docs whose media spans are HTML
    payloads (``html://`` scheme). The classifier itself is total, so the
    only error row is a missing payload. Same actor-pool shape and
    broadcast payload store as ExtractStage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..htmlcore import extract_main_content

        rows: dict[str, list] = {
            "doc_id": [], "title": [], "n_kept": [], "n_dropped": [],
            "status": [],
        }
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for sp in spans or []:
                if sp.get("kind") != "media" or not str(
                    sp.get("media_ref") or ""
                ).startswith("html://"):
                    continue
                blob = self.resolver(sp.get("media_ref"))
                rows["doc_id"].append(doc_id)
                if blob is None:
                    rows["title"].append(None)
                    rows["n_kept"].append(-1)
                    rows["n_dropped"].append(-1)
                    rows["status"].append("error")
                    continue
                r = extract_main_content(blob)
                rows["title"].append(r["title"])
                rows["n_kept"].append(r["n_kept"])
                rows["n_dropped"].append(r["n_dropped"])
                rows["status"].append("ok")
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "title": pa.array(rows["title"], pa.string()),
                "n_kept": pa.array(rows["n_kept"], pa.int32()),
                "n_dropped": pa.array(rows["n_dropped"], pa.int32()),
                "status": pa.array(rows["status"], pa.string()),
            }
        )


class StructureStage(ExtractStage):
    """Variant that emits TAGGED-STRUCTURE rows (doc_id, elem_order, role,
    page_index, text): the /StructTreeRoot depth-first walk with each
    element's text assembled from its marked-content sequences — logical
    reading order, independent of paint order (pdfcore/structure.py; the
    reference captures the StructTreeRoot ref and never walks it,
    src/catalog.rs). Same actor-pool shape and poison containment as
    ExtractStage; untagged docs emit nothing."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pdfcore.structure import structure_text

        rows: dict[str, list] = {
            "doc_id": [], "elem_order": [], "role": [],
            "page_index": [], "text": [],
        }
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for sp in spans or []:
                if sp.get("kind") != "media":
                    continue
                blob = self.resolver(sp.get("media_ref"))
                if blob is None:
                    continue
                try:
                    doc = Document(blob)
                    for el in structure_text(doc):
                        rows["doc_id"].append(doc_id)
                        rows["elem_order"].append(el["order"])
                        rows["role"].append(el["role"])
                        rows["page_index"].append(el["page_index"])
                        rows["text"].append(el["text"])
                except Exception as e:
                    # explicit error marker row, like Annotation/Outline
                    rows["doc_id"].append(doc_id)
                    rows["elem_order"].append(-1)
                    rows["role"].append("__error__")
                    rows["page_index"].append(-1)
                    rows["text"].append(
                        f"{type(e).__name__}: {e}"[:_MAX_ERROR_LEN]
                    )
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "elem_order": pa.array(rows["elem_order"], pa.int32()),
                "role": pa.array(rows["role"], pa.string()),
                "page_index": pa.array(rows["page_index"], pa.int32()),
                "text": pa.array(rows["text"], pa.string()),
            }
        )


class FormFieldStage(ExtractStage):
    """Variant that emits ACROFORM FIELD rows (doc_id, field_order, name,
    ftype, value): the catalog-level /AcroForm field-tree walk with
    dotted fully-qualified names and /FT //V inheritance
    (pdfcore/acroform.py) — catches fields whose widgets span pages or
    are absent, which the per-page annotation pass cannot. Same
    actor-pool shape and poison containment as ExtractStage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pdfcore.acroform import form_fields

        rows: dict[str, list] = {
            "doc_id": [], "field_order": [], "name": [],
            "ftype": [], "value": [],
        }
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for sp in spans or []:
                if sp.get("kind") != "media":
                    continue
                blob = self.resolver(sp.get("media_ref"))
                if blob is None:
                    continue
                try:
                    doc = Document(blob)
                    for f in form_fields(doc):
                        rows["doc_id"].append(doc_id)
                        rows["field_order"].append(f["order"])
                        rows["name"].append(f["name"])
                        rows["ftype"].append(f["ftype"])
                        rows["value"].append(f["value"])
                except Exception as e:
                    rows["doc_id"].append(doc_id)
                    rows["field_order"].append(-1)
                    rows["name"].append("__error__")
                    rows["ftype"].append(None)
                    rows["value"].append(
                        f"{type(e).__name__}: {e}"[:_MAX_ERROR_LEN]
                    )
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "field_order": pa.array(rows["field_order"], pa.int32()),
                "name": pa.array(rows["name"], pa.string()),
                "ftype": pa.array(rows["ftype"], pa.string()),
                "value": pa.array(rows["value"], pa.string()),
            }
        )


class PageLabelStage(ExtractStage):
    """Variant that emits PAGE LABEL rows (doc_id, page_index, label):
    the catalog /PageLabels number-tree walk + §12.4.2 formatting
    (pdfcore/pagelabels.py). Docs without /PageLabels emit nothing.
    Same actor-pool shape and poison containment as ExtractStage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pdfcore.pagelabels import page_labels

        rows: dict[str, list] = {"doc_id": [], "page_index": [], "label": []}
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for sp in spans or []:
                if sp.get("kind") != "media":
                    continue
                blob = self.resolver(sp.get("media_ref"))
                if blob is None:
                    continue
                try:
                    doc = Document(blob)
                    for idx, label in page_labels(doc):
                        rows["doc_id"].append(doc_id)
                        rows["page_index"].append(idx)
                        rows["label"].append(label)
                except Exception as e:
                    rows["doc_id"].append(doc_id)
                    rows["page_index"].append(-1)
                    rows["label"].append(
                        "__error__ " + f"{type(e).__name__}: {e}"[:_MAX_ERROR_LEN]
                    )
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "page_index": pa.array(rows["page_index"], pa.int32()),
                "label": pa.array(rows["label"], pa.string()),
            }
        )


class MetadataStage(ExtractStage):
    """Variant that emits one /Info METADATA row per doc that has one
    (doc_id, title, author, subject, producer, created_y/m/d). Same
    actor-pool shape and poison containment as ExtractStage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pdfcore.attachments import doc_metadata

        rows: dict[str, list] = {
            "doc_id": [], "title": [], "author": [], "subject": [],
            "producer": [], "created_y": [], "created_m": [], "created_d": [],
        }

        def emit(doc_id, m):
            rows["doc_id"].append(doc_id)
            for k in ("title", "author", "subject", "producer"):
                rows[k].append(m.get(k))
            for k in ("created_y", "created_m", "created_d"):
                rows[k].append(m.get(k, -1))

        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for sp in spans or []:
                if sp.get("kind") != "media":
                    continue
                blob = self.resolver(sp.get("media_ref"))
                if blob is None:
                    continue
                try:
                    m = doc_metadata(Document(blob))
                    if m is not None:
                        emit(doc_id, m)
                except Exception as e:
                    emit(
                        doc_id,
                        {
                            "title": "__error__",
                            "producer": f"{type(e).__name__}: {e}"[:_MAX_ERROR_LEN],
                        },
                    )
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "title": pa.array(rows["title"], pa.string()),
                "author": pa.array(rows["author"], pa.string()),
                "subject": pa.array(rows["subject"], pa.string()),
                "producer": pa.array(rows["producer"], pa.string()),
                "created_y": pa.array(rows["created_y"], pa.int32()),
                "created_m": pa.array(rows["created_m"], pa.int32()),
                "created_d": pa.array(rows["created_d"], pa.int32()),
            }
        )


class EmbeddedFileStage(ExtractStage):
    """Variant that emits ATTACHMENT rows (doc_id, name, filename,
    n_bytes, md5) from the /Names -> /EmbeddedFiles name tree. Same
    actor-pool shape and poison containment as ExtractStage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pdfcore.attachments import embedded_files

        rows: dict[str, list] = {
            "doc_id": [], "name": [], "filename": [], "n_bytes": [], "md5": [],
        }
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for sp in spans or []:
                if sp.get("kind") != "media":
                    continue
                blob = self.resolver(sp.get("media_ref"))
                if blob is None:
                    continue
                try:
                    for f in embedded_files(Document(blob)):
                        rows["doc_id"].append(doc_id)
                        rows["name"].append(f["name"])
                        rows["filename"].append(f["filename"])
                        rows["n_bytes"].append(f["n_bytes"])
                        rows["md5"].append(f["md5"])
                except Exception as e:
                    rows["doc_id"].append(doc_id)
                    rows["name"].append("__error__")
                    rows["filename"].append(
                        f"{type(e).__name__}: {e}"[:_MAX_ERROR_LEN]
                    )
                    rows["n_bytes"].append(-1)
                    rows["md5"].append(None)
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "name": pa.array(rows["name"], pa.string()),
                "filename": pa.array(rows["filename"], pa.string()),
                "n_bytes": pa.array(rows["n_bytes"], pa.int64()),
                "md5": pa.array(rows["md5"], pa.string()),
            }
        )


class FontSpanStage(ExtractStage):
    """Variant that emits FONT-ATTRIBUTED text spans (doc_id, order,
    text, font, size_milli): the interpreter's collect_fonts mode —
    /BaseFont + Tf size per show op, the layout signal (heading vs body)
    downstream curation consumes. Same actor-pool shape and poison
    containment as ExtractStage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {
            "doc_id": [], "span_order": [], "text": [],
            "font": [], "size_milli": [],
        }
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for sp in spans or []:
                if sp.get("kind") != "media":
                    continue
                blob = self.resolver(sp.get("media_ref"))
                if blob is None:
                    continue
                try:
                    doc = Document(blob)
                    interp = Interpreter(
                        doc, collect_fonts=True, font_cache=self.font_cache
                    )
                    out = interp.run()
                    for (kind, text, _ref, order), (font, size) in zip(
                        out, interp.span_fonts
                    ):
                        if kind != "text":
                            continue
                        rows["doc_id"].append(doc_id)
                        rows["span_order"].append(order)
                        rows["text"].append(text)
                        rows["font"].append(font)
                        rows["size_milli"].append(int(round(size * 1000)))
                except Exception as e:
                    rows["doc_id"].append(doc_id)
                    rows["span_order"].append(-1)
                    rows["text"].append("__error__")
                    rows["font"].append(f"{type(e).__name__}: {e}"[:_MAX_ERROR_LEN])
                    rows["size_milli"].append(-1)
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "span_order": pa.array(rows["span_order"], pa.int32()),
                "text": pa.array(rows["text"], pa.string()),
                "font": pa.array(rows["font"], pa.string()),
                "size_milli": pa.array(rows["size_milli"], pa.int64()),
            }
        )


class IccProfileStage(ExtractStage):
    """Variant that emits ICC PROFILE header/tag rows — one row per
    /ICCBased colorspace stream found in a page's /ColorSpace resources
    (doc_id, page_index, cs_name, profile_size, version_major,
    version_minor, device_class, colour_space, pcs, rendering_intent,
    n_tags, tag_sigs). Mirrors the reference's introspection surface
    (src/icc_profile/mod.rs IccProfileHeader + IccTagTable); tag
    payloads are not interpreted on either side. Same actor-pool shape
    and poison containment as the other catalog stages."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pdfcore.icc import parse_icc

        cols = (
            "doc_id", "page_index", "cs_name", "profile_size",
            "version_major", "version_minor", "device_class",
            "colour_space", "pcs", "rendering_intent", "n_tags",
            "tag_sigs",
        )
        rows: dict[str, list] = {c: [] for c in cols}

        def emit(doc_id, pi, cs, p):
            rows["doc_id"].append(doc_id)
            rows["page_index"].append(pi)
            rows["cs_name"].append(cs)
            rows["profile_size"].append(p["profile_size"])
            rows["version_major"].append(p["version_major"])
            rows["version_minor"].append(p["version_minor"])
            rows["device_class"].append(p["device_class"])
            rows["colour_space"].append(p["colour_space"])
            rows["pcs"].append(p["pcs"])
            rows["rendering_intent"].append(p["rendering_intent"])
            rows["n_tags"].append(len(p["tags"]))
            rows["tag_sigs"].append(
                ",".join(t["sig"] for t in p["tags"])
            )

        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for sp in spans or []:
                if sp.get("kind") != "media":
                    continue
                blob = self.resolver(sp.get("media_ref"))
                if blob is None:
                    continue
                try:
                    doc = Document(blob)
                    for pi, page in enumerate(doc.pages):
                        res = page.resources
                        if not isinstance(res, dict):
                            continue
                        csd = doc.resolve(res.get("ColorSpace"))
                        if not isinstance(csd, dict):
                            continue
                        for cs_name in sorted(csd):
                            arr = doc.resolve(csd[cs_name])
                            if (
                                not isinstance(arr, list)
                                or len(arr) < 2
                                or arr[0] != "ICCBased"
                            ):
                                continue
                            st = doc.resolve_stream(arr[1])
                            emit(
                                doc_id, pi, str(cs_name),
                                parse_icc(doc.decoded(st)),
                            )
                except Exception as e:
                    rows["doc_id"].append(doc_id)
                    rows["page_index"].append(-1)
                    rows["cs_name"].append("__error__")
                    for c in (
                        "profile_size", "version_major", "version_minor",
                        "rendering_intent", "n_tags",
                    ):
                        rows[c].append(-1)
                    rows["device_class"].append(
                        f"{type(e).__name__}: {e}"[:_MAX_ERROR_LEN]
                    )
                    rows["colour_space"].append(None)
                    rows["pcs"].append(None)
                    rows["tag_sigs"].append(None)
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "page_index": pa.array(rows["page_index"], pa.int32()),
                "cs_name": pa.array(rows["cs_name"], pa.string()),
                "profile_size": pa.array(rows["profile_size"], pa.int64()),
                "version_major": pa.array(rows["version_major"], pa.int32()),
                "version_minor": pa.array(rows["version_minor"], pa.int32()),
                "device_class": pa.array(rows["device_class"], pa.string()),
                "colour_space": pa.array(rows["colour_space"], pa.string()),
                "pcs": pa.array(rows["pcs"], pa.string()),
                "rendering_intent": pa.array(
                    rows["rendering_intent"], pa.int64()
                ),
                "n_tags": pa.array(rows["n_tags"], pa.int64()),
                "tag_sigs": pa.array(rows["tag_sigs"], pa.string()),
            }
        )
