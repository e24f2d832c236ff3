"""Driver-facing HTML main-content queries (boilerplate strip + DOM
heuristics, the HTML half of the north rule's extraction pipeline).

Runs the SAME unified extraction pipeline as the PDF queries
(``extract_dataset`` -> actor-pool ``ExtractStage`` -> ``explode_spans``)
over the committed HTML fixture corpus; the stage dispatches ``html://``
media spans to ``htmlcore.extract_main_content``. Oracles read the
HAND-WRITTEN golden parquet (``fixtures/htmlcorpus.py`` literals), so the
driver compare is a genuine end-to-end span-sequence-equality gate for
the HTML path — including the mixed text+html interleaved docs (hm01).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from .pdf_queries import FIXTURES_DIR


def _load_html(concurrency=4):
    import ray
    import ray.data as rd

    from ..pipelines.extract import extract_dataset

    docs = rd.read_parquet(os.path.join(FIXTURES_DIR, "html_docs.parquet"))
    ptbl = pq.read_table(os.path.join(FIXTURES_DIR, "html_payloads.parquet"))
    payloads = dict(
        zip(ptbl.column("media_ref").to_pylist(), ptbl.column("bytes").to_pylist())
    )
    return docs, ray.put(payloads)


def html_main_content(sf_dir: str | None = None):
    """Interleaved html docs -> main-content spans, one row per span
    (doc_id, kind, text, media_ref, order). kind 'image' rows carry the
    in-content <img> src as media_ref — same invariant as the PDF path."""
    from ..pipelines.extract import explode_spans, extract_dataset

    docs, payloads = _load_html()
    return explode_spans(extract_dataset(docs, payloads))


def html_doc_summary(sf_dir: str | None = None):
    """Per-document boilerplate-strip summary: (doc_id, title, n_kept,
    n_dropped, status) over the single-media html fixture docs."""
    from ..stages.extract import HtmlSummaryStage

    docs, payloads = _load_html()
    return docs.filter(
        lambda row: not row["doc_id"].startswith("hm")
    ).map_batches(
        HtmlSummaryStage,
        fn_constructor_kwargs={"payloads": payloads},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=4,
        num_cpus=1,
    )


HTML_GOLDEN = os.path.join(FIXTURES_DIR, "html_golden.parquet")
HTML_SUMMARY = os.path.join(FIXTURES_DIR, "html_summary.parquet")

HTML_ORACLE_SQL = {
    "html_main_content": f"""
        SELECT doc_id, s.kind AS kind, s.text AS text,
               s.media_ref AS media_ref, s."order" AS "order"
        FROM (SELECT doc_id, unnest(spans) AS s
              FROM read_parquet('{HTML_GOLDEN}'))
    """,
    "html_doc_summary": f"""
        SELECT doc_id, title, n_kept, n_dropped, status
        FROM read_parquet('{HTML_SUMMARY}')
    """,
}
