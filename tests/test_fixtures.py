"""End-to-end golden test: every fixture PDF -> exact span-sequence equality
(kind, text, media_ref, order) against its hand-written golden
(FIXTURES.md §2-3). Poison fixtures must raise (they become row-level
status='error' in the pipeline)."""

import pytest

from pdf_ray.fixtures.corpus import FIXTURES, IMG_H, IMG_PIXELS, IMG_W
from pdf_ray.pdfcore.interp import extract_spans
from pdf_ray.pdfcore.objects import PdfParseError


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_fixture_golden(name):
    pdf, golden = FIXTURES[name]()
    if golden is None:
        with pytest.raises(Exception):
            extract_spans(pdf)
        return
    spans, _ = extract_spans(pdf)
    assert spans == golden


def test_fixture_determinism():
    for name, fn in FIXTURES.items():
        assert fn()[0] == fn()[0], name


def test_image_collection_and_png_roundtrip():
    import zlib

    pdf, golden = FIXTURES["f13"]()
    spans, images = extract_spans(pdf, collect_images=True)
    ref = next(s[2] for s in spans if s[0] == "image")
    png = images[ref]
    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    # decode the IDAT back and compare raw pixels
    idat_start = png.find(b"IDAT") + 4
    idat_len = int.from_bytes(png[idat_start - 8 : idat_start - 4], "big")
    raw = zlib.decompress(png[idat_start : idat_start + idat_len])
    rows = [
        raw[y * (IMG_W * 3 + 1) + 1 : (y + 1) * (IMG_W * 3 + 1)]
        for y in range(IMG_H)
    ]
    assert b"".join(rows) == IMG_PIXELS


def test_inline_image_span():
    from pdf_ray.fixtures.builder import simple_page_pdf
    from pdf_ray.pdfcore.images import media_ref_for_pixels

    pixels = bytes([255, 0, 0, 0, 255, 0])
    content = (
        b"BT /F1 12 Tf 72 720 Td (before) Tj ET "
        b"BI /W 2 /H 1 /CS /RGB /BPC 8 ID " + pixels + b" EI "
        b"BT /F1 12 Tf 72 700 Td (after) Tj ET"
    )
    pdf = simple_page_pdf(content)
    spans, _ = extract_spans(pdf)
    assert spans == [
        ("text", "before", None, 0),
        ("image", None, media_ref_for_pixels(2, 1, pixels), 1),
        ("text", "after", None, 2),
    ]


def test_empty_tj_emits_empty_span():
    from pdf_ray.fixtures.builder import simple_page_pdf

    pdf = simple_page_pdf(b"BT /F1 9 Tf () Tj [] TJ [5] TJ ET")
    spans, _ = extract_spans(pdf)
    # `() Tj` shows one empty string -> one empty-text span;
    # TJ with no string elements emits nothing
    assert spans == [("text", "", None, 0)]


def test_missing_font_is_an_error():
    from pdf_ray.fixtures.builder import simple_page_pdf

    pdf = simple_page_pdf(b"BT /NoSuchFont 9 Tf (x) Tj ET")
    with pytest.raises(PdfParseError):
        extract_spans(pdf)


def test_image_mask_stencil():
    """ImageMask true => 1-bit stencil, no ColorSpace (PDF §8.9.6.2)."""
    from pdf_ray.fixtures.builder import simple_page_pdf
    from pdf_ray.pdfcore.images import media_ref_for_pixels

    mask_data = bytes([0b10101010, 0b01010101])
    pixels = bytearray()
    for byte in mask_data:
        for bit in range(8):
            v = 255 if (byte >> (7 - bit)) & 1 else 0
            pixels += bytes([v, v, v])
    pdf = simple_page_pdf(
        b"q /Im1 Do Q",
        extra_resources=b"/XObject << /Im1 9 0 R >>",
        extra_objects={
            9: (
                b"<< /Type /XObject /Subtype /Image /Width 8 /Height 2 "
                b"/ImageMask true /Length 2 >>\nstream\n"
                + mask_data
                + b"\nendstream"
            )
        },
    )
    spans, _ = extract_spans(pdf)
    assert spans == [
        ("image", None, media_ref_for_pixels(8, 2, bytes(pixels)), 0)
    ]


def test_all_options_together():
    """Option interplay: tounicode + image collection + position
    computation enabled simultaneously must not disturb kind/order
    structure on any fixture."""
    for name, fn in FIXTURES.items():
        pdf, golden = fn()
        if golden is None:
            continue
        spans, images = extract_spans(
            pdf,
            collect_images=True,
            font_cache={},
            compute_positions=True,
            apply_tounicode=True,
        )
        assert [(s[0], s[3]) for s in spans] == [
            (g[0], g[3]) for g in golden
        ], name
        # image refs unchanged by the extra options
        assert [s[2] for s in spans if s[0] == "image"] == [
            g[2] for g in golden if g[0] == "image"
        ], name


def test_f28_annotations_parse():
    from pdf_ray.fixtures.corpus import F28_ANNOTS, f28_annotations
    from pdf_ray.pdfcore.annotations import page_annotations
    from pdf_ray.pdfcore.document import Document

    pdf, golden = f28_annotations()
    doc = Document(pdf)
    got = page_annotations(doc, doc.pages[0])
    assert [
        (a["subtype"], a["text"], a["field_name"]) for a in got
    ] == [(s, t, f) for _, s, t, f in F28_ANNOTS]
    # content-stream spans are unaffected by annotations
    from pdf_ray.pdfcore.interp import Interpreter

    interp = Interpreter(doc)
    interp.run()
    assert interp.spans == [("text", "Body text", None)]


def test_f31_outlines_parse():
    from pdf_ray.fixtures.corpus import F31_OUTLINES, f31_outlines
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.outlines import document_outlines

    pdf, golden = f31_outlines()
    doc = Document(pdf)
    got = document_outlines(doc)
    assert [(o["order"], o["level"], o["title"]) for o in got] == F31_OUTLINES
    # no /Outlines -> empty
    from pdf_ray.fixtures.builder import simple_page_pdf

    doc2 = Document(simple_page_pdf(b"BT /F1 9 Tf 0 0 Td (x) Tj ET"))
    assert document_outlines(doc2) == []


def test_f32_actualtext():
    from pdf_ray.fixtures.corpus import F32_ACTUALTEXT, f32_actualtext
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.interp import Interpreter

    pdf, golden = f32_actualtext()
    # raw parity: literal shows
    interp = Interpreter(Document(pdf))
    interp.run()
    assert [t for k, t, r in interp.spans] == [
        "Before", "Tele-", "vision", "hy-", "phen", "After"
    ]
    # enrichment: scope text replaced once (inline dict + Properties ref)
    interp2 = Interpreter(Document(pdf), apply_actual_text=True)
    interp2.run()
    assert [t for k, t, r in interp2.spans] == F32_ACTUALTEXT


def test_actualtext_nested_and_point_operators():
    """Nested /ActualText scopes: the OUTERMOST replacement wins; DP/MP
    are point operators and never open a scope."""
    from pdf_ray.fixtures.builder import simple_page_pdf
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.interp import Interpreter

    content = (
        b"/Span << /ActualText (OUTER) >> BDC "
        b"BT /F1 9 Tf 0 0 Td (x) Tj ET "
        b"/Span << /ActualText (INNER) >> BDC "
        b"BT /F1 9 Tf 0 0 Td (y) Tj ET EMC EMC "
        b"/Tag << /ActualText (POINT) >> DP "
        b"BT /F1 9 Tf 0 0 Td (after) Tj ET"
    )
    pdf = simple_page_pdf(content)
    it = Interpreter(Document(pdf), apply_actual_text=True)
    it.run()
    assert [t for k, t, r in it.spans] == ["OUTER", "after"]
    # empty nested scopes: outer replacement emitted exactly once
    pdf2 = simple_page_pdf(
        b"/Span << /ActualText (O2) >> BDC "
        b"/Span << /ActualText (I2) >> BDC EMC EMC"
    )
    it2 = Interpreter(Document(pdf2), apply_actual_text=True)
    it2.run()
    assert [t for k, t, r in it2.spans] == ["O2"]


def test_xref_recovery():
    from pdf_ray.fixtures.corpus import (
        f01_minimal_tj,
        f19a_poison_truncated,
        f19b_poison_bad_xref,
    )
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.interp import Interpreter
    from pdf_ray.pdfcore.objects import PdfParseError

    import pytest

    bad, _ = f19b_poison_bad_xref()
    with pytest.raises(PdfParseError):
        Document(bad)  # raw parity: still a poison row
    doc = Document(bad, recover=True)
    it = Interpreter(doc)
    it.run()
    assert it.spans == [("text", "Bad xref", None)]

    # truncated file: recovery rebuilds the index but the cut content
    # stream still fails the row cleanly
    trunc, _ = f19a_poison_truncated()
    with pytest.raises(PdfParseError):
        d = Document(trunc, recover=True)
        Interpreter(d).run()

    # healthy files take the normal path untouched
    d = Document(f01_minimal_tj()[0], recover=True)
    it2 = Interpreter(d)
    it2.run()
    assert it2.spans == [("text", "Hello World", None)]


def test_xref_recovery_incremental_update_last_wins():
    """Scavenged rebuild of an incrementally-updated file must resolve
    each object to its LAST occurrence (update semantics)."""
    from pdf_ray.fixtures.corpus import f08_incremental_update
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.interp import Interpreter

    pdf, golden = f08_incremental_update()
    idx = pdf.rfind(b"startxref")
    end = pdf.rfind(b"%%EOF")
    broken = pdf[:idx] + b"startxref\n999999999\n" + pdf[end:]
    doc = Document(broken, recover=True)
    it = Interpreter(doc)
    it.run()
    assert it.spans == [("text", "Updated text", None)]


def test_icc_profile_parser_header_and_tags():
    """parse_icc returns the literal hand-built header constants and the
    tag table (sig, offset, len) exactly; truncation / bad magic / a tag
    pointing outside the buffer raise typed errors."""
    import pytest

    from pdf_ray.fixtures.corpus import ICC_HEADER, ICC_TAGS, _build_icc_profile
    from pdf_ray.pdfcore.icc import parse_icc
    from pdf_ray.pdfcore.objects import PdfParseError

    buf = _build_icc_profile()
    p = parse_icc(buf)
    for k, v in ICC_HEADER.items():
        assert p[k] == v, k
    assert p["created_at"] == (2020, 1, 2, 3, 4, 5)
    assert p["manufacturer"] == "ABCD"
    assert p["creator"] == "pdfr"
    assert p["illuminant_q"] == (63190, 65536, 54061)
    assert [(t["sig"], t["offset"], t["len"]) for t in p["tags"]] == ICC_TAGS

    with pytest.raises(PdfParseError):
        parse_icc(buf[:100])
    bad = bytearray(buf)
    bad[36:40] = b"nope"
    with pytest.raises(PdfParseError):
        parse_icc(bytes(bad))
    overrun = bytearray(buf)
    # first tag's len field -> beyond buffer
    overrun[140:144] = (10 ** 6).to_bytes(4, "big")
    with pytest.raises(PdfParseError):
        parse_icc(bytes(overrun))
