"""Metadata (/Info), embedded files (name tree), and font-attributed
spans (collect_fonts) — pdfcore/attachments.py + interp collect_fonts."""

import hashlib

from pdf_ray.pdfcore.attachments import doc_metadata, embedded_files
from pdf_ray.pdfcore.document import Document


def test_doc_metadata_golden():
    from pdf_ray.fixtures.corpus import F46_INFO, f46_metadata

    t, a, s, p, (y, m, d) = F46_INFO
    pdf, _ = f46_metadata()
    got = doc_metadata(Document(pdf))
    assert got == {
        "title": t,
        "author": a,
        "subject": s,
        "producer": p,
        "created_y": y,
        "created_m": m,
        "created_d": d,
    }


def test_doc_metadata_absent():
    from pdf_ray.fixtures.corpus import f48_font_spans

    pdf, _ = f48_font_spans()
    assert doc_metadata(Document(pdf)) is None


def test_embedded_files_roundtrip():
    from pdf_ray.fixtures.corpus import ATTACH_A, ATTACH_B, f47_embedded_files

    pdf, _ = f47_embedded_files()
    got = embedded_files(Document(pdf))
    assert [f["name"] for f in got] == ["alpha.bin", "beta.txt"]
    assert got[0]["filename"] == "alpha-unicode.bin"  # /UF wins over /F
    assert got[0]["n_bytes"] == len(ATTACH_A)
    assert got[0]["md5"] == hashlib.md5(ATTACH_A).hexdigest()
    assert got[1]["md5"] == hashlib.md5(ATTACH_B).hexdigest()


def test_embedded_files_absent():
    from pdf_ray.fixtures.corpus import f46_metadata

    pdf, _ = f46_metadata()
    assert embedded_files(Document(pdf)) == []


def test_collect_fonts_tracks_tf_and_form_scope():
    from pdf_ray.fixtures.corpus import F48_FONTS, f48_font_spans
    from pdf_ray.pdfcore.interp import Interpreter

    pdf, _ = f48_font_spans()
    interp = Interpreter(Document(pdf), collect_fonts=True)
    out = interp.run()
    got = [
        (order, text, font, int(round(size * 1000)))
        for (kind, text, _r, order), (font, size) in zip(
            out, interp.span_fonts
        )
        if kind == "text"
    ]
    assert got == F48_FONTS
