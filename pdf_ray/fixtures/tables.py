"""Interleaved-document corpus tables (docs / payloads / golden) built from
the fixture PDFs, as pyarrow Tables per pdf_ray.schema.

Replication: ``build_corpus(replicas)`` produces ``replicas`` interleaved
documents per fixture (same payload bytes, distinct doc_ids — payloads are
shared via media_ref, like a real corpus of near-duplicate uploads), plus
mixed documents interleaving text spans with two media spans (f20).

Goldens stay hand-derived: a doc's golden output splices each referenced
fixture's hand-written golden at the media-span position and renumbers
``order`` globally (BASELINE.json per-row invariant).
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import DOCS, EXTRACTED, PAYLOADS
from .corpus import FIXTURES, MAIN_OVERRIDES, OCG_OVERRIDES, UNICODE_OVERRIDES

# replica count of the COMMITTED fixtures_data/ corpus (build.py);
# oracles that enumerate per-replica rows key off this
DEFAULT_REPLICAS = 5


def _fixture_cache():
    out = {}
    for name, fn in FIXTURES.items():
        pdf, golden = fn()
        out[name] = (pdf, golden)
    return out


def build_corpus(replicas: int = 3, include_mixed: bool = True):
    """Returns ``(docs, payloads, golden, golden_unicode, golden_main,
    golden_ocg)`` pyarrow Tables."""
    fixtures = _fixture_cache()
    doc_rows: list[dict] = []
    golden_rows: list[dict] = []
    golden_uni_rows: list[dict] = []
    golden_main_rows: list[dict] = []
    golden_ocg_rows: list[dict] = []
    payloads = {
        f"pdf://{name}": pdf for name, (pdf, _) in fixtures.items()
    }

    def _golden_row(doc_id, in_spans, fixture_golden):
        out_spans: list[dict] = []
        for sp in in_spans:
            if sp["kind"] == "text":
                out_spans.append(
                    {"kind": "text", "text": sp["text"], "media_ref": None}
                )
            else:
                name = sp["media_ref"].split("//", 1)[1]
                golden = fixture_golden(name)
                if golden is None:
                    return {
                        "doc_id": doc_id,
                        "spans": [],
                        "n_spans": 0,
                        "status": "error",
                        "error": None,  # message text is implementation detail
                    }
                for kind, text, mref, _ in golden:
                    out_spans.append(
                        {"kind": kind, "text": text, "media_ref": mref}
                    )
        return {
            "doc_id": doc_id,
            "spans": [{**sp, "order": i} for i, sp in enumerate(out_spans)],
            "n_spans": len(out_spans),
            "status": "ok",
            "error": None,
        }

    def add_doc(doc_id: str, in_spans: list[dict]):
        doc_rows.append({"doc_id": doc_id, "spans": in_spans})
        golden_rows.append(
            _golden_row(doc_id, in_spans, lambda n: fixtures[n][1])
        )
        golden_uni_rows.append(
            _golden_row(
                doc_id,
                in_spans,
                lambda n: UNICODE_OVERRIDES.get(n, fixtures[n][1]),
            )
        )
        golden_main_rows.append(
            _golden_row(
                doc_id,
                in_spans,
                lambda n: MAIN_OVERRIDES.get(n, fixtures[n][1]),
            )
        )
        golden_ocg_rows.append(
            _golden_row(
                doc_id,
                in_spans,
                lambda n: OCG_OVERRIDES.get(n, fixtures[n][1]),
            )
        )

    for name in sorted(fixtures):
        for r in range(replicas):
            add_doc(
                f"{name}-{r:04d}",
                [
                    {
                        "kind": "media",
                        "text": None,
                        "media_ref": f"pdf://{name}",
                        "offset": 0,
                    }
                ],
            )

    if include_mixed:
        for r in range(replicas):
            add_doc(
                f"f20-{r:04d}",
                [
                    {"kind": "text", "text": f"Intro {r}", "media_ref": None, "offset": 0},
                    {"kind": "media", "text": None, "media_ref": "pdf://f01", "offset": 1},
                    {"kind": "text", "text": "Between", "media_ref": None, "offset": 2},
                    {"kind": "media", "text": None, "media_ref": "pdf://f13", "offset": 3},
                    {"kind": "text", "text": "End", "media_ref": None, "offset": 4},
                ],
            )

    docs = pa.Table.from_pylist(doc_rows, schema=DOCS)
    pay = pa.Table.from_pylist(
        [{"media_ref": k, "bytes": v} for k, v in sorted(payloads.items())],
        schema=PAYLOADS,
    )
    golden = pa.Table.from_pylist(golden_rows, schema=EXTRACTED)
    golden_uni = pa.Table.from_pylist(golden_uni_rows, schema=EXTRACTED)
    golden_main = pa.Table.from_pylist(golden_main_rows, schema=EXTRACTED)
    golden_ocg = pa.Table.from_pylist(golden_ocg_rows, schema=EXTRACTED)
    return docs, pay, golden, golden_uni, golden_main, golden_ocg


def build_bench_corpus(n_docs: int = 3000, seed: int = 42):
    """Throughput-benchmark corpus with a page-weighted skew mix
    modelling a real PDF corpus (where multi-page documents dominate
    wall time): 50%% 1-3 page fixture docs, 20%% 20-page, 20%% 60-page,
    10%% 200-page outliers (~2-3 ms of parse per doc on average).
    Returns ``(docs_table, payload_dict)`` — no goldens (bench ≠ oracle)."""
    import random

    from .corpus import FIXTURES, f18_outlier_200pp

    rng = random.Random(seed)
    small_names = [
        n for n in sorted(FIXTURES) if n not in ("f18", "f19a", "f19b")
    ]
    payloads: dict[str, bytes] = {}
    for name in small_names:
        payloads[f"pdf://{name}"] = FIXTURES[name]()[0]
    payloads["pdf://f18x20"] = f18_outlier_200pp(20)[0]
    payloads["pdf://f18x60"] = f18_outlier_200pp(60)[0]
    payloads["pdf://f18x200"] = f18_outlier_200pp(200)[0]

    doc_rows = []
    for i in range(n_docs):
        r = rng.random()
        if r < 0.10:
            ref = "pdf://f18x200"
        elif r < 0.30:
            ref = "pdf://f18x60"
        elif r < 0.50:
            ref = "pdf://f18x20"
        else:
            ref = f"pdf://{rng.choice(small_names)}"
        doc_rows.append(
            {
                "doc_id": f"bench-{i:07d}",
                "spans": [
                    {"kind": "media", "text": None, "media_ref": ref, "offset": 0}
                ],
            }
        )
    return pa.Table.from_pylist(doc_rows, schema=DOCS), payloads


def write_corpus(out_dir: str, replicas: int = 3):
    """Write docs/payloads/golden parquet under ``out_dir``."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    docs, pay, golden, golden_uni, golden_main, golden_ocg = build_corpus(
        replicas
    )
    pq.write_table(docs, f"{out_dir}/docs.parquet")
    pq.write_table(pay, f"{out_dir}/payloads.parquet")
    pq.write_table(golden, f"{out_dir}/golden.parquet")
    pq.write_table(golden_uni, f"{out_dir}/golden_unicode.parquet")
    pq.write_table(golden_main, f"{out_dir}/golden_main.parquet")
    pq.write_table(golden_ocg, f"{out_dir}/golden_ocg.parquet")
    return docs.num_rows
