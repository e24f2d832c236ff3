"""Tagged-PDF structure-tree extraction (pdfcore/structure.py) and
artifact stripping (ExtractStage strip_artifacts)."""

from pdf_ray.fixtures.corpus import F39_STRUCTURE, f39_tagged_structure
from pdf_ray.pdfcore.document import Document
from pdf_ray.pdfcore.interp import Interpreter
from pdf_ray.pdfcore.structure import structure_text


def test_f39_structure_matches_hand_golden():
    pdf, _ = f39_tagged_structure()
    rows = structure_text(Document(pdf))
    got = [(r["order"], r["role"], r["page_index"], r["text"]) for r in rows]
    assert got == F39_STRUCTURE


def test_f39_raw_parity_and_marks():
    """Raw spans stay paint-ordered (parity); marks identify the artifact
    and the innermost MCIDs."""
    pdf, golden = f39_tagged_structure()
    doc = Document(pdf)
    interp = Interpreter(doc, collect_mcids=True)
    assert interp.run() == golden
    assert interp.span_marks == [
        (0, -1, True),   # artifact header, no MCID
        (0, 2, False),
        (0, 0, False),
        (0, 1, False),
    ]


def test_untagged_doc_has_no_structure():
    from pdf_ray.fixtures.corpus import f01_minimal_tj

    pdf, _ = f01_minimal_tj()
    assert structure_text(Document(pdf)) == []


def test_structure_cycle_guard():
    """A structure element whose /K points back at an ancestor must not
    loop forever."""
    from pdf_ray.fixtures.builder import PdfBuilder

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 6 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(
        4, b"", b"/P << /MCID 0 >> BDC BT /F1 12 Tf (x) Tj ET EMC"
    )
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(6, b"<< /Type /StructTreeRoot /K 7 0 R >>")
    b.add(7, b"<< /S /Sect /K [8 0 R] >>")
    b.add(8, b"<< /S /P /Pg 3 0 R /K [0 7 0 R] >>")  # cycle back to 7
    rows = structure_text(Document(b.build(1)))
    assert [(r["role"], r["text"]) for r in rows] == [("P", "x")]


def test_artifact_strip_nested_scope():
    """Artifact stripping drops nested scopes painted inside an /Artifact
    (any enclosing Artifact wins) while keeping surrounding content."""
    from pdf_ray.fixtures.corpus import simple_page_pdf

    content = (
        b"BT /F1 12 Tf (keep1) Tj ET "
        b"/Artifact BMC "
        b"BT /F1 12 Tf (drop1) Tj ET "
        b"/P << /MCID 0 >> BDC BT /F1 12 Tf (drop2) Tj ET EMC "
        b"EMC "
        b"BT /F1 12 Tf (keep2) Tj ET"
    )
    doc = Document(simple_page_pdf(content))
    interp = Interpreter(doc, collect_mcids=True)
    spans = interp.run()
    kept = [
        s[1] for s, m in zip(spans, interp.span_marks) if not m[2]
    ]
    assert kept == ["keep1", "keep2"]


def _two_page_tagged():
    from pdf_ray.fixtures.builder import PdfBuilder

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 8 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>")
    for num, cnt in ((3, 5), (4, 6)):
        b.add(
            num,
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 7 0 R >> >> /Contents {cnt} 0 R >>".encode(),
        )
    b.add_stream(5, b"", b"/P << /MCID 0 >> BDC BT /F1 12 Tf (first) Tj ET EMC")
    b.add_stream(6, b"", b"/P << /MCID 0 >> BDC BT /F1 12 Tf (second) Tj ET EMC")
    b.add(7, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(8, b"<< /Type /StructTreeRoot /K 9 0 R >>")
    # one element owning content on BOTH pages: int MCID (elem /Pg = page
    # 1) + /MCR pointing at page 2 — both pages' MCID 0 must resolve to
    # the right page's chunks
    b.add(
        9,
        b"<< /S /P /Pg 3 0 R "
        b"/K [0 << /Type /MCR /Pg 4 0 R /MCID 0 >>] >>",
    )
    return b.build(1)


def test_structure_mcr_cross_page():
    rows = structure_text(Document(_two_page_tagged()))
    assert [(r["role"], r["text"]) for r in rows] == [("P", "first second")]


def test_structure_malformed_trees_total():
    """Garbage /K shapes (bools, dangling refs, dicts without /S or /Type,
    missing MCIDs, deep chains) must neither crash nor loop."""
    from pdf_ray.fixtures.builder import PdfBuilder

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 6 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"/P << /MCID 3 >> BDC BT /F1 12 Tf (ok) Tj ET EMC")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(
        6,
        b"<< /Type /StructTreeRoot "
        b"/K [7 0 R true 99 0 R << /NoS /Here >>] >>",
    )
    b.add(
        7,
        b"<< /S /Div /K [true << /Type /MCR >> "
        b"<< /Type /OBJR /Obj 3 0 R >> 3 << /S /Span /K [] >>] >>",
    )
    rows = structure_text(Document(b.build(1)))
    assert [(r["role"], r["text"]) for r in rows] == [("Div", "ok")]


def test_acroform_field_tree_golden():
    from pdf_ray.fixtures.corpus import F40_FORM, f40_acroform_tree
    from pdf_ray.pdfcore.acroform import form_fields

    pdf, _ = f40_acroform_tree()
    rows = form_fields(Document(pdf))
    assert [
        (r["order"], r["name"], r["ftype"], r["value"]) for r in rows
    ] == F40_FORM


def test_acroform_no_form_and_cycle():
    from pdf_ray.fixtures.builder import PdfBuilder
    from pdf_ray.fixtures.corpus import f01_minimal_tj
    from pdf_ray.pdfcore.acroform import form_fields

    pdf, _ = f01_minimal_tj()
    assert form_fields(Document(pdf)) == []

    b = PdfBuilder()
    b.add(
        1,
        b"<< /Type /Catalog /Pages 2 0 R "
        b"/AcroForm << /Fields [10 0 R] >> >>",
    )
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf (x) Tj ET")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    # field whose kid points back at itself: must terminate
    b.add(10, b"<< /T (a) /FT /Tx /Kids [11 0 R] >>")
    b.add(11, b"<< /T (b) /Parent 10 0 R /Kids [10 0 R] >>")
    rows = form_fields(Document(b.build(1)))
    assert [r["name"] for r in rows] == []


def test_ocg_hidden_layer_strip():
    """f43: default extraction keeps hidden-layer content (reference
    parity — it parses /OCProperties but never consults it); with
    hidden_ocgs the /OC scope, the all-off OCMD scope and the /OC-tagged
    image are suppressed. BaseState /OFF inverts the default."""
    from pdf_ray.fixtures.corpus import f43_optional_content
    from pdf_ray.pdfcore.ocg import hidden_ocg_refs, oc_is_hidden
    from pdf_ray.pdfcore.objects import Ref

    pdf, golden = f43_optional_content()
    doc = Document(pdf)

    # raw parity: everything extracted
    assert Interpreter(doc).run() == golden

    hidden = hidden_ocg_refs(doc)
    assert hidden == frozenset({Ref(9, 0)})
    # OCMD with all members hidden is hidden; visible OCG is not
    assert oc_is_hidden(doc, Ref(10, 0), hidden)
    assert not oc_is_hidden(doc, Ref(8, 0), hidden)

    got = Interpreter(doc, hidden_ocgs=hidden).run()
    assert [(k, t) for k, t, _, _ in got] == [
        ("text", "Shown"), ("text", "Layer"), ("text", "Tail")
    ]
    # spans re-enumerate densely over the kept sequence
    assert [o for _, _, _, o in got] == [0, 1, 2]

    # BaseState /OFF: everything not listed /ON is hidden
    pdf_off, _ = f43_optional_content(base_state_off=True)
    assert hidden_ocg_refs(Document(pdf_off)) == frozenset({Ref(9, 0)})

    # no /OCProperties at all -> nothing hidden
    from pdf_ray.fixtures.corpus import f01_minimal_tj

    assert hidden_ocg_refs(Document(f01_minimal_tj()[0])) == frozenset()
