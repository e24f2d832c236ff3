"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the pdf_ray library) calls ``ray.init()``/``ray.shutdown()``.

- ``entry()``       — flagship PDF-extraction pipeline over the interleaved
                      fixture corpus (the BASELINE.json input shape; the
                      sf* testdata tables don't carry media spans, see
                      FIXTURES.md note), returns the exploded span Dataset.
- ``queries()``     — one entry per implemented pipeline/operator
                      (SURVEY.md §2 + training-data ops).
- ``oracle_sql()``  — DuckDB-equivalent SQL. For PDF extraction the oracle
                      reads the hand-written golden parquet, making the
                      driver compare a true span-sequence-equality gate.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from pdf_ray.ops.pdf_queries import pdf_extract_spans

    return pdf_extract_spans("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_ray.ops import pdf_queries as p
    from pdf_ray.ops import registry

    q: dict[str, Callable[[str], Any]] = {
        "pdf_extract_spans": p.pdf_extract_spans,
        "pdf_extract_spans_split": p.pdf_extract_spans_split,
        "pdf_extract_unicode": p.pdf_extract_unicode,
        "pdf_extract_status": p.pdf_extract_status,
        "pdf_span_kind_counts": p.pdf_span_kind_counts,
        "pdf_extract_metrics": p.pdf_extract_metrics,
        "pdf_image_features": p.pdf_image_features,
        "pdf_annotations": p.pdf_annotations,
        "pdf_outlines": p.pdf_outlines,
        "pdf_actualtext_spans": p.pdf_actualtext_spans,
        "pdf_extract_recovered": p.pdf_extract_recovered,
        "pdf_span_text_dedup": p.pdf_span_text_dedup,
        "pdf_structure_text": p.pdf_structure_text,
        "pdf_main_content": p.pdf_main_content,
        "pdf_main_content_quality": p.pdf_main_content_quality,
        "pdf_form_fields": p.pdf_form_fields,
        "pdf_page_labels": p.pdf_page_labels,
        "pdf_metadata": p.pdf_metadata,
        "pdf_embedded_files": p.pdf_embedded_files,
        "pdf_font_spans": p.pdf_font_spans,
        "pdf_icc_profiles": p.pdf_icc_profiles,
        "image_phash_dedup": p.image_phash_dedup,
        "pdf_ocg_content": p.pdf_ocg_content,
    }
    from pdf_ray.ops import html_queries as h

    q["html_main_content"] = h.html_main_content
    q["html_doc_summary"] = h.html_doc_summary
    q.update(registry.QUERIES)
    return q


def oracle_sql() -> dict[str, str]:
    from pdf_ray.ops import registry
    from pdf_ray.ops.pdf_queries import PDF_ORACLE_SQL

    from pdf_ray.ops.html_queries import HTML_ORACLE_SQL

    sql = dict(PDF_ORACLE_SQL)
    sql.update(HTML_ORACLE_SQL)
    sql.update(registry.ORACLE_SQL)
    return sql
