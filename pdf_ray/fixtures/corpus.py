"""Fixture corpus f01-f20 (FIXTURES.md §3) with hand-written golden spans.

Each fixture = (pdf_bytes, golden) where golden is the expected
``[(kind, text, media_ref, order), ...]`` output — written down from the
content streams we author here, NOT derived from the engine. ``None``
golden means the fixture must fail row-level (status='error').

Span-text parity notes (SURVEY.md §7.4.1): literal strings are
codepoint-per-byte; hex strings are 2-hex-digit codepoints (so Type0 2-byte
codes surface as e.g. "\\x00H\\x00i" — the reference lexes strings *before*
font semantics and never applies ToUnicode, src/render/mod.rs:1273,
src/font/cmap.rs:5-10).
"""

from __future__ import annotations

import zlib

from ..pdfcore.images import media_ref_for_pixels
from .builder import PdfBuilder, simple_page_pdf
from .fontprogs import cff_program, truetype_program, type1_program


def _t(*texts: str):
    return [("text", t, None, i) for i, t in enumerate(texts)]


def f01_minimal_tj():
    pdf = simple_page_pdf(b"BT /F1 12 Tf 72 720 Td (Hello World) Tj ET")
    return pdf, _t("Hello World")


def f02_flate_content():
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (Hello World) Tj ET", content_filter="flate"
    )
    return pdf, _t("Hello World")


def f03_tj_array_kerning():
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td [(He) 120 (llo) -30.5 ( World)] TJ ET"
    )
    # kerning numbers adjust Tm but do not break the logical run
    return pdf, _t("Hello World")


def f04_text_positioning():
    content = (
        b"BT /F1 10 Tf 14 TL 72 720 Td (Line one) Tj "
        b"0 -14 TD (Line two) Tj "
        b"T* (Line three) Tj "
        b"110 Tz 2 Tc 1 Tw (Line four) ' "
        b".5 1.5 (Line five) \" "
        b"1 0 0 1 72 600 Tm 50 Ts -50 Ts 1 Tr 0 Tr (Line six) Tj ET"
    )
    pdf = simple_page_pdf(content)
    return pdf, _t(
        "Line one", "Line two", "Line three", "Line four", "Line five", "Line six"
    )


def f05_string_escapes():
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"(\\n\\r\\t escapes\\) \\( \\\\ done) Tj "
        b"(\\101\\102\\1038) Tj "
        b"(foo\\\n    bar) Tj "
        b"(a(b(c))d) Tj "
        b"<48656C6C6F> Tj "
        b"<48454C50F> Tj "
        b"<FEFF0048006900210020263A> Tj "
        b"ET"
    )
    pdf = simple_page_pdf(content)
    return pdf, _t(
        "\n\r\t escapes) ( \\ done",
        "ABC8",
        "foobar",
        "a(b(c))d",
        "Hello",
        "HELPð",
        "Hi! ☺",
    )


def f06_multi_stream_page():
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 7 0 R >> >> "
        b"/Contents [4 0 R 5 0 R 6 0 R] >>",
    )
    # the `Tj` operator straddles the stream-1/stream-2 boundary: the
    # buffers must be concatenated before tokenizing (src/content/stream.rs)
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td (Part one) T")
    b.add_stream(5, b"", b"j (Part two) Tj", filters="flate")
    b.add_stream(6, b"", b" (Part three) Tj ET")
    b.add(7, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    pdf = b.build(1)
    return pdf, _t("Part one", "Part two", "Part three")


def f07_xref_stream_objstm():
    """PDF 1.5: catalog/pages/page/font dicts packed in an ObjStm; xref is
    an Up-predicted Flate xref *stream* with type-2 entries."""
    content = b"BT /F1 12 Tf 72 720 Td (ObjStm text) Tj ET"
    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        ),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    # ObjStm body: header of "num offset" pairs, then the objects
    bodies = b""
    header = b""
    for num in sorted(inner):
        header += f"{num} {len(bodies)} ".encode()
        bodies += inner[num] + b"\n"
    objstm_payload = header + bodies
    first = len(header)
    objstm_data = zlib.compress(objstm_payload, 9)

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    offsets[6] = len(out)  # 6 = ObjStm
    out += (
        f"6 0 obj\n<< /Type /ObjStm /N {len(inner)} /First {first} "
        f"/Filter /FlateDecode /Length {len(objstm_data)} >>\nstream\n"
    ).encode()
    out += objstm_data + b"\nendstream\nendobj\n"
    offsets[4] = len(out)  # 4 = content stream (streams can't live in ObjStm)
    out += (
        f"4 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
        + content
        + b"\nendstream\nendobj\n"
    )
    xref_pos = len(out)
    # xref stream obj 7: entries 0..7; W=[1 4 2]
    rows = bytearray()
    rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
    for num in range(1, 8):
        if num in inner:
            idx = sorted(inner).index(num)
            rows += bytes([2]) + (6).to_bytes(4, "big") + idx.to_bytes(2, "big")
        elif num in offsets:
            rows += bytes([1]) + offsets[num].to_bytes(4, "big") + b"\x00\x00"
        elif num == 7:
            rows += bytes([1]) + xref_pos.to_bytes(4, "big") + b"\x00\x00"
        else:
            rows += bytes([0]) + (0).to_bytes(4, "big") + b"\x00\x01"
    rowlen = 7
    tagged = bytearray()
    prev = bytes(rowlen)
    for r in range(0, len(rows), rowlen):
        row = rows[r : r + rowlen]
        tagged += b"\x02" + bytes((row[i] - prev[i]) & 0xFF for i in range(rowlen))
        prev = row
    xdata = zlib.compress(bytes(tagged), 9)
    out += (
        f"7 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] /Root 1 0 R "
        f"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >> "
        f"/Length {len(xdata)} >>\nstream\n"
    ).encode()
    out += xdata + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out), _t("ObjStm text")


def f08_incremental_update():
    base = simple_page_pdf(b"BT /F1 12 Tf 72 720 Td (Original text) Tj ET")
    new_content = b"BT /F1 12 Tf 72 720 Td (Updated text) Tj ET"
    body = (
        f"<< /Length {len(new_content)} >>\nstream\n".encode()
        + new_content
        + b"\nendstream"
    )
    pdf = PdfBuilder.append_incremental(base, {4: body}, root_num=1)
    return pdf, _t("Updated text")


def _embedded_font_pdf(text: bytes, golden: str, font_obj: bytes, file_objs: dict):
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (" + text + b") Tj ET",
        extra_objects={5: font_obj, **file_objs},
    )
    return pdf, _t(golden)


def f09_type1_embedded():
    prog = type1_program()
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td (Type one text!) Tj ET")
    b.add(
        5,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /FixtureSerif "
        b"/FirstChar 32 /LastChar 126 /Widths 8 0 R /FontDescriptor 6 0 R "
        b"/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
        b"/Differences [65 /alpha 66 /beta] >> >>",
    )
    b.add(
        6,
        b"<< /Type /FontDescriptor /FontName /FixtureSerif /Flags 4 "
        b"/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 700 "
        b"/Descent -200 /CapHeight 660 /StemV 80 /FontFile 7 0 R >>",
    )
    b.add_stream(
        7,
        f"/Length1 {prog.length1} /Length2 {prog.length2} /Length3 0".encode(),
        prog.data,
        filters="flate",
    )
    b.add(8, ("[" + " ".join(["500"] * 95) + "]").encode())
    return b.build(1), _t("Type one text!")


def f10_ttf_embedded():
    prog = truetype_program()
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td (TrueType text) Tj ET")
    b.add(
        5,
        b"<< /Type /Font /Subtype /TrueType /BaseFont /FixtureSans "
        b"/FirstChar 65 /LastChar 90 /Widths 8 0 R /FontDescriptor 6 0 R >>",
    )
    b.add(
        6,
        b"<< /Type /FontDescriptor /FontName /FixtureSans /Flags 32 "
        b"/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 700 "
        b"/Descent -200 /CapHeight 660 /StemV 80 /FontFile2 7 0 R >>",
    )
    b.add_stream(7, f"/Length1 {len(prog)}".encode(), prog, filters="flate")
    b.add(8, ("[" + " ".join(["600"] * 26) + "]").encode())
    return b.build(1), _t("TrueType text")


def f11_cff_fontfile3():
    prog = cff_program()
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td (CFF text here) Tj ET")
    b.add(
        5,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /FixtureCFF "
        b"/FirstChar 32 /LastChar 126 /Widths 8 0 R /FontDescriptor 6 0 R >>",
    )
    b.add(
        6,
        b"<< /Type /FontDescriptor /FontName /FixtureCFF /Flags 4 "
        b"/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 700 "
        b"/Descent -200 /CapHeight 660 /StemV 80 /FontFile3 7 0 R >>",
    )
    b.add_stream(7, b"/Subtype /Type1C", prog, filters="flate")
    b.add(8, ("[" + " ".join(["550"] * 95) + "]").encode())
    return b.build(1), _t("CFF text here")


def f12_type0_identity_h():
    """Type0/Identity-H: 2-byte codes in a hex string. Parity: the lexer
    maps each 2-hex-digit pair to a codepoint BEFORE any font semantics,
    so "\\x00H\\x00i" is the reference-equal span text."""
    to_unicode = (
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfrange\n<0041> <005A> <0041>\n<0061> <007A> <0061>\n"
        b"endbfrange\nendcmap\nCMapName currentdict /CMap defineresource pop\n"
        b"end\nend"
    )
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td <00480069> Tj ET")
    b.add(
        5,
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCID "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 9 0 R >>",
    )
    b.add(
        6,
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FixtureCID "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /FontDescriptor 7 0 R /DW 1000 "
        b"/W [72 [600] 65 90 650 100 [320 330 340]] /CIDToGIDMap /Identity >>",
    )
    b.add(
        7,
        b"<< /Type /FontDescriptor /FontName /FixtureCID /Flags 4 "
        b"/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 700 "
        b"/Descent -200 /CapHeight 660 /StemV 80 >>",
    )
    b.add_stream(9, b"", to_unicode, filters="flate")
    return b.build(1), _t("\x00H\x00i")


IMG_W, IMG_H = 4, 3
IMG_PIXELS = bytes(
    [
        255, 0, 0,   0, 255, 0,   0, 0, 255,   255, 255, 0,
        0, 255, 255, 255, 0, 255, 128, 128, 128, 0, 0, 0,
        255, 255, 255, 64, 0, 0,  0, 64, 0,    0, 0, 64,
    ]
)
IMG_REF = media_ref_for_pixels(IMG_W, IMG_H, IMG_PIXELS)


def f13_image_png_decode():
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (Before image) Tj ET "
        b"q 100 0 0 75 72 600 cm /Im1 Do Q "
        b"BT /F1 12 Tf 72 580 Td (After image) Tj ET",
        extra_resources=b"/XObject << /Im1 9 0 R >>",
        extra_objects={
            9: (
                b"<< /Type /XObject /Subtype /Image /Width 4 /Height 3 "
                b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
                b"/Filter /FlateDecode /Length "
                + str(len(zlib.compress(IMG_PIXELS, 9))).encode()
                + b" >>\nstream\n"
                + zlib.compress(IMG_PIXELS, 9)
                + b"\nendstream"
            )
        },
    )
    golden = [
        ("text", "Before image", None, 0),
        ("image", None, IMG_REF, 1),
        ("text", "After image", None, 2),
    ]
    return pdf, golden


def f14_form_xobject_nested():
    form_content = b"BT /F2 10 Tf 0 0 Td (Inside form) Tj ET"
    form = (
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 200 100] "
        b"/Matrix [1 0 0 1 50 50] "
        b"/Resources << /Font << /F2 10 0 R >> >> /Length "
        + str(len(form_content)).encode()
        + b" >>\nstream\n"
        + form_content
        + b"\nendstream"
    )
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (Page before) Tj ET "
        b"q 1 0 0 1 100 100 cm /Fm1 Do Q "
        b"BT /F1 12 Tf 72 580 Td (Page after) Tj ET",
        extra_resources=b"/XObject << /Fm1 9 0 R >>",
        extra_objects={
            9: form,
            10: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
        },
    )
    return pdf, _t("Page before", "Inside form", "Page after")


def f15_filters_ascii():
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 6 0 R >> >> /Contents [4 0 R 5 0 R] >>",
    )
    b.add_stream(
        4, b"", b"BT /F1 12 Tf 72 720 Td (Hex encoded) Tj ", filters="ahx"
    )
    b.add_stream(5, b"", b"(Base85 encoded) Tj ET", filters="a85")
    b.add(6, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return b.build(1), _t("Hex encoded", "Base85 encoded")


def f16_filter_lzw():
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (LZW compressed content) Tj ET",
        content_filter="lzw",
    )
    return pdf, _t("LZW compressed content")


def f17_marked_content():
    content = (
        b"0.5 0.5 0.5 RG 0.1 0.2 0.3 rg 2 w 10 M 0 J 1 j [3 1] 0 d "
        b"/GS1 gs 1 0 0 1 10 10 cm "
        b"72 100 200 50 re f "
        b"/Artifact BMC BT /F1 12 Tf 72 720 Td (Marked one) Tj ET EMC "
        b"/Span << /ActualText (ignored) >> BDC "
        b"BT /F1 12 Tf 72 700 Td (Marked two) Tj ET EMC "
        b"BX /FakeOp EX "
        b"100 200 m 150 250 l 200 200 220 180 240 200 c h S n "
        b"BT /F1 12 Tf 72 680 Td (After paths) Tj ET"
    )
    pdf = simple_page_pdf(
        content, extra_resources=b"/ExtGState << /GS1 << /Type /ExtGState >> >>"
    )
    return pdf, _t("Marked one", "Marked two", "After paths")


def f18_outlier_200pp(n_pages: int = 200):
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{10 + i} 0 R" for i in range(n_pages))
    b.add(
        2,
        (
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
            "/Resources << /Font << /F1 3 0 R >> >> "
            "/MediaBox [0 0 612 792] >>"
        ).encode(),
    )
    b.add(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    golden = []
    for i in range(n_pages):
        text = f"Page {i + 1} of {n_pages}"
        b.add(10 + i, f"<< /Type /Page /Parent 2 0 R /Contents {10 + n_pages + i} 0 R >>".encode())
        content = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
        b.add(
            10 + n_pages + i,
            f"<< /Length {len(content)} >>\nstream\n".encode()
            + content
            + b"\nendstream",
        )
        golden.append(("text", text, None, i))
    return b.build(1), golden


def f21_type3_font():
    """Type3 font: glyphs are content streams (CharProcs). The reference
    stubs glyph evaluation (src/font/type3.rs:21-62); span text comes from
    the shown codepoints as with any simple font."""
    glyph_a = b"0 0 500 0 0 500 d1 0 0 m 500 500 l S"
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td (abc) Tj ET")
    b.add(
        5,
        b"<< /Type /Font /Subtype /Type3 "
        b"/FontBBox [0 0 750 750] /FontMatrix [0.001 0 0 0.001 0 0] "
        b"/CharProcs << /glyphA 6 0 R >> "
        b"/Encoding << /Type /Encoding /Differences [97 /glyphA] >> "
        b"/FirstChar 97 /LastChar 99 /Widths [500 500 500] >>",
    )
    b.add_stream(6, b"", glyph_a)
    return b.build(1), _t("abc")


# DCT fixture (f24): a real baseline JPEG whose decode is EXACT by
# construction, so the pixel golden is hand-derivable without running the
# engine's decoder. Two uniform 8x8 gray blocks, values 160 and 96:
# R=G=B=v gives Y=v, Cb=Cr=128 exactly (the JFIF weights sum to 1 / 0);
# a uniform block's only DCT coefficient is DC = 8*(v-128) = ±256, which
# the flat quant table q=16 divides exactly (256/16 = 16), so the decoded
# pixels are exactly (v,v,v) again. DC differential coding across blocks
# and the chroma planes' all-zero blocks are also exercised.
DCT_W, DCT_H = 16, 8
DCT_PIXELS = bytes(
    ([160, 160, 160] * 8 + [96, 96, 96] * 8) * DCT_H
)


def _dct_ref() -> str:
    import hashlib

    return (
        "img:"
        + hashlib.sha256(
            f"{DCT_W}x{DCT_H}:rgb8:".encode() + DCT_PIXELS
        ).hexdigest()[:40]
    )


DCT_REF = _dct_ref()


def f24_dct_image():
    """DCT (JPEG) Image XObject, decoded to REAL pixels (the reference
    uses the jpeg-decoder crate, src/filter/dct.rs:10-20; our decoder is
    pdfcore/jpeg.py). The media_ref is the pixel content hash — the
    golden above is derived by hand from JPEG arithmetic, not from the
    engine."""
    import numpy as np

    from .jpegenc import encode_jpeg

    img = np.empty((DCT_H, DCT_W, 3), dtype=np.uint8)
    img[:, :8, :] = 160
    img[:, 8:, :] = 96
    jpeg = encode_jpeg(img, qtable=16)
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (Before jpeg) Tj ET q /Im1 Do Q",
        extra_resources=b"/XObject << /Im1 9 0 R >>",
        extra_objects={
            9: (
                b"<< /Type /XObject /Subtype /Image /Width 16 /Height 8 "
                b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
                b"/Filter /DCTDecode /Length "
                + str(len(jpeg)).encode()
                + b" >>\nstream\n"
                + jpeg
                + b"\nendstream"
            )
        },
    )
    return pdf, [
        ("text", "Before jpeg", None, 0),
        ("image", None, DCT_REF, 1),
    ]


def f26_hybrid_xrefstm():
    """Hybrid-reference file (PDF §7.5.8.4): the classic xref table marks
    the font object FREE; only the /XRefStm stream maps it (into an
    ObjStm). Readers must prefer the stream's entries within the section —
    legacy readers would fail on this file."""
    content = b"BT /F1 12 Tf 72 720 Td (Hybrid xref) Tj ET"
    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    # ObjStm 6 holds object 5 (the font)
    header = b"5 0 "
    payload = header + font + b"\n"
    first = len(header)
    objstm_data = zlib.compress(payload, 9)

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num, body in (
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        ),
    ):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    offsets[4] = len(out)
    out += (
        f"4 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
        + content
        + b"\nendstream\nendobj\n"
    )
    offsets[6] = len(out)
    out += (
        f"6 0 obj\n<< /Type /ObjStm /N 1 /First {first} /Filter /FlateDecode "
        f"/Length {len(objstm_data)} >>\nstream\n".encode()
        + objstm_data
        + b"\nendstream\nendobj\n"
    )
    # xref STREAM obj 7: maps 5 -> (ObjStm 6, idx 0); 6 and 7 type-1
    stm_pos = len(out)
    rows = bytearray()
    rows += bytes([2]) + (6).to_bytes(4, "big") + (0).to_bytes(2, "big")  # obj 5
    rows += bytes([1]) + offsets[6].to_bytes(4, "big") + b"\x00\x00"      # obj 6
    rows += bytes([1]) + stm_pos.to_bytes(4, "big") + b"\x00\x00"         # obj 7
    xdata = zlib.compress(bytes(rows), 9)
    out += (
        f"7 0 obj\n<< /Type /XRef /Size 8 /Index [5 3] /W [1 4 2] "
        f"/Root 1 0 R /Filter /FlateDecode /Length {len(xdata)} >>\nstream\n"
    ).encode()
    out += xdata + b"\nendstream\nendobj\n"
    # classic table: object 5 FREE (the hybrid hole)
    xref_pos = len(out)
    out += b"xref\n0 8\n"
    out += b"0000000000 65535 f \n"
    for num in range(1, 8):
        if num == 5:
            out += b"0000000000 00001 f \n"
        elif num == 7:
            out += f"{stm_pos:010d} 00000 n \n".encode()
        else:
            out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size 8 /Root 1 0 R /XRefStm {stm_pos} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out), _t("Hybrid xref")


PALETTE = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 0])  # 4 colors
IDX_W, IDX_H = 4, 2
IDX_INDICES = bytes([0, 1, 2, 3, 3, 2, 1, 0])
IDX_PIXELS = b"".join(
    PALETTE[3 * i : 3 * i + 3] for i in IDX_INDICES
)
IDX_REF = media_ref_for_pixels(IDX_W, IDX_H, IDX_PIXELS)


def f25_indexed_image():
    """Indexed color space image (palette lookup) — reference canvas
    todo!()s on non-device spaces (src/render/canvas.rs:420-480)."""
    pdf = simple_page_pdf(
        b"q /Im1 Do Q BT /F1 12 Tf 72 700 Td (After palette) Tj ET",
        extra_resources=b"/XObject << /Im1 9 0 R >>",
        extra_objects={
            9: (
                b"<< /Type /XObject /Subtype /Image /Width 4 /Height 2 "
                b"/ColorSpace [/Indexed /DeviceRGB 3 <"
                + PALETTE.hex().encode()
                + b">] /BitsPerComponent 8 /Length "
                + str(len(IDX_INDICES)).encode()
                + b" >>\nstream\n"
                + IDX_INDICES
                + b"\nendstream"
            )
        },
    )
    return pdf, [
        ("image", None, IDX_REF, 0),
        ("text", "After palette", None, 1),
    ]


def _encrypted_fixture(aes: bool):
    """Standard-security-handler fixture, empty user password. RC4 variant:
    V=1/R=2/40-bit; AES variant: V=4/R=4/AESV2. The /O entry is computed
    properly from an owner password; spec Algorithms 2/4/5 are exercised
    end-to-end (reference: src/encryption.rs)."""
    import hashlib

    from ..pdfcore.encryption import (
        PAD,
        aes128_cbc_encrypt,
        compute_encryption_key,
        compute_u_entry,
        object_key,
        rc4,
    )

    text = "AES secret" if aes else "RC4 secret"
    content = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
    file_id = bytes(range(0xA0, 0xB0))
    owner_pw = b"owner-secret"
    revision = 4 if aes else 2
    key_bytes = 16 if aes else 5

    # O entry (Algorithm 3, encrypt-side): RC4(md5(padded owner pw), padded
    # user pw); R>=3 iterates the md5 50x and the RC4 19x with xored keys
    okey = hashlib.md5((owner_pw + PAD)[:32]).digest()
    if revision >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey[:key_bytes]).digest()
    okey = okey[:key_bytes]
    o_entry = rc4(okey, PAD)  # padded empty user password == PAD
    if revision >= 3:
        for i in range(1, 20):
            o_entry = rc4(bytes(b ^ i for b in okey), o_entry)

    p = -4  # all permission high bits set, print bit clear (arbitrary)
    key = compute_encryption_key(b"", o_entry, p, file_id, key_bytes, revision)
    u_entry = compute_u_entry(key, revision, file_id)

    ckey = object_key(key, 4, 0, aes)
    if aes:
        enc_content = aes128_cbc_encrypt(ckey, bytes(range(0x10, 0x20)), content)
    else:
        enc_content = rc4(ckey, content)

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add(
        4,
        f"<< /Length {len(enc_content)} >>\nstream\n".encode()
        + enc_content
        + b"\nendstream",
    )
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    if aes:
        enc_dict = (
            b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
            b"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
            b"/StmF /StdCF /StrF /StdCF "
            b"/O <" + o_entry.hex().encode() + b"> "
            b"/U <" + u_entry.hex().encode() + b"> "
            b"/P " + str(p).encode() + b" >>"
        )
    else:
        enc_dict = (
            b"<< /Filter /Standard /V 1 /R 2 /Length 40 "
            b"/O <" + o_entry.hex().encode() + b"> "
            b"/U <" + u_entry.hex().encode() + b"> "
            b"/P " + str(p).encode() + b" >>"
        )
    b.add(6, enc_dict)
    trailer_extra = (
        b"/Encrypt 6 0 R /ID [<" + file_id.hex().encode() + b"> <"
        + file_id.hex().encode() + b">] "
    )
    return b.build(1, extra_trailer=trailer_extra), _t(text)


def f22_encrypted_rc4():
    return _encrypted_fixture(aes=False)


def f23_encrypted_aes():
    return _encrypted_fixture(aes=True)


def f30_encrypted_aes256():
    """V=5 / R=6 (PDF 2.0) AES-256 encryption — beyond the reference,
    which stops at AES-128 (src/encryption.rs). Built per ISO 32000-2:
    U = hash2B(pwd, vsalt) || vsalt || ksalt, UE = AES-256-CBC(ik,
    iv=0, file_key) with ik = hash2B(pwd, ksalt); streams/strings use
    the file key directly with a random IV prefix. Empty user password."""
    import hashlib as _hl

    from ..pdfcore.encryption import (
        aes128_cbc_encrypt,
        aes_cbc_encrypt_nopad,
        hash_2b,
    )

    text = "AES-256 text"
    content = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
    file_key = _hl.sha256(b"fixture-aes256-file-key").digest()
    vsalt = b"VSALT#30"
    ksalt = b"KSALT#30"
    u_entry = hash_2b(b"", vsalt) + vsalt + ksalt
    ik = hash_2b(b"", ksalt)
    ue_entry = aes_cbc_encrypt_nopad(ik, b"\x00" * 16, file_key)
    # owner entries: spec-shaped but unused by the empty-user-pwd path
    o_entry = _hl.sha256(b"owner").digest() + b"OSALT#30" + b"OKSLT#30"
    oe_entry = b"\x00" * 32
    p = -4
    # /Perms: AES-256-ECB(file_key, P || 0xFFFFFFFF || 'T' || 'adb' || pad)
    perms_plain = (
        (p & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\xff\xff\xff\xff" + b"T" + b"adb" + b"0123"
    )
    perms = aes_cbc_encrypt_nopad(file_key, b"\x00" * 16, perms_plain)
    iv = _hl.md5(b"fixture-aes256-iv").digest()
    enc_content = aes128_cbc_encrypt(file_key, iv, content)

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add(
        4,
        f"<< /Length {len(enc_content)} >>\nstream\n".encode()
        + enc_content
        + b"\nendstream",
    )
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(
        6,
        b"<< /Filter /Standard /V 5 /R 6 /Length 256 "
        b"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
        b"/StmF /StdCF /StrF /StdCF "
        b"/O <" + o_entry.hex().encode() + b"> "
        b"/U <" + u_entry.hex().encode() + b"> "
        b"/OE <" + oe_entry.hex().encode() + b"> "
        b"/UE <" + ue_entry.hex().encode() + b"> "
        b"/Perms <" + perms.hex().encode() + b"> "
        b"/P " + str(p).encode() + b" >>",
    )
    file_id = _hl.md5(b"fixture-aes256-id").digest()
    trailer_extra = (
        b"/Encrypt 6 0 R /ID [<" + file_id.hex().encode() + b"> <"
        + file_id.hex().encode() + b">] "
    )
    return b.build(1, extra_trailer=trailer_extra), _t(text)


def f19a_poison_truncated():
    pdf = simple_page_pdf(b"BT /F1 12 Tf 72 720 Td (Will be cut) Tj ET")
    return pdf[: len(pdf) // 2], None


def f19b_poison_bad_xref():
    pdf = simple_page_pdf(b"BT /F1 12 Tf 72 720 Td (Bad xref) Tj ET")
    idx = pdf.rfind(b"startxref")
    end = pdf.rfind(b"%%EOF")
    return pdf[:idx] + b"startxref\n999999999\n" + pdf[end:], None


def f27_type0_predefined_ucs2():
    """Type0 with a PREDEFINED CJK CMap name (/UniJIS-UCS2-H — names
    enumerated by the reference at src/font/cjk.rs:1-190, data never
    shipped). Raw span parity is lexer-level as always: hex string bytes
    00 48 00 69 4E 2D -> "\\x00H\\x00iN-". The unicode enrichment uses the
    UCS2 code space directly (codes 0048 0069 4E2D -> "Hi\\u4e2d") with NO
    ToUnicode stream present — the capability the predefined registry
    adds."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td <004800694E2D> Tj ET")
    b.add(
        5,
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCJK "
        b"/Encoding /UniJIS-UCS2-H /DescendantFonts [6 0 R] >>",
    )
    b.add(
        6,
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FixtureCJK "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
        b"/Supplement 6 >> /FontDescriptor 7 0 R /DW 1000 "
        b"/CIDToGIDMap /Identity >>",
    )
    b.add(
        7,
        b"<< /Type /FontDescriptor /FontName /FixtureCJK /Flags 4 "
        b"/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 700 "
        b"/Descent -200 /CapHeight 660 /StemV 80 >>",
    )
    return b.build(1), _t("\x00H\x00iN-")


# CCITT fixture (f29): Group 4 fax image, LOSSLESS — the pixel golden is
# the bitmap itself, written down here (left 8 columns black, right 8
# white, 4 rows). Default CCITT coding: white = 1 bits = DeviceGray white.
CCITT_W, CCITT_H = 16, 4
CCITT_PIXELS = bytes(([0, 0, 0] * 8 + [255, 255, 255] * 8) * CCITT_H)


def _ccitt_ref() -> str:
    import hashlib

    return (
        "img:"
        + hashlib.sha256(
            f"{CCITT_W}x{CCITT_H}:rgb8:".encode() + CCITT_PIXELS
        ).hexdigest()[:40]
    )


CCITT_REF = _ccitt_ref()


def f29_ccitt_image():
    """CCITTFaxDecode (Group 4) Image XObject — the filter the reference
    todo!()s (src/filter/mod.rs:51). Lossless bitonal decode, so the
    media_ref golden is derived by hand from the authored bitmap."""
    import numpy as np

    from .ccittenc import encode_g4

    img = np.zeros((CCITT_H, CCITT_W), dtype=bool)
    img[:, :8] = True  # True = black
    data = encode_g4(img)
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (Before fax) Tj ET q /Im1 Do Q",
        extra_resources=b"/XObject << /Im1 9 0 R >>",
        extra_objects={
            9: (
                b"<< /Type /XObject /Subtype /Image /Width 16 /Height 4 "
                b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                b"/Filter /CCITTFaxDecode "
                b"/DecodeParms << /K -1 /Columns 16 /Rows 4 >> /Length "
                + str(len(data)).encode()
                + b" >>\nstream\n"
                + data
                + b"\nendstream"
            )
        },
    )
    return pdf, [
        ("text", "Before fax", None, 0),
        ("image", None, CCITT_REF, 1),
    ]


# f28 annotation golden, written down from the annotation dicts authored
# below (array order; Widget text = field /V, Parent-chain inherited)
F28_ANNOTS = [
    # (annot_index, subtype, text, field_name)
    (0, "FreeText", "Approved by QA", None),
    (1, "Text", "Sticky note", None),
    (2, "Widget", "typed value", "name1"),
    (3, "Link", None, None),
    (4, "Widget", "parent value", "parentfield"),
]


def f28_annotations():
    """Page with /Annots: FreeText + Text (sticky) + merged-field Widget
    + Link (no text) + Widget inheriting /T and /V from its field
    /Parent (reference model: src/annotation/mod.rs:251-300,
    src/acro_form.rs). Content-stream golden is the usual lexer-level
    span; annotation text is surfaced by the separate pdf_annotations
    query."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R "
        b"/Annots [8 0 R 9 0 R 10 0 R 11 0 R 12 0 R] >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td (Body text) Tj ET")
    b.add(
        5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    b.add(
        8,
        b"<< /Type /Annot /Subtype /FreeText /Rect [10 600 200 650] "
        b"/Contents (Approved by QA) /DA (/Helv 12 Tf 0 g) >>",
    )
    b.add(
        9,
        b"<< /Type /Annot /Subtype /Text /Rect [0 0 20 20] "
        b"/Contents (Sticky note) >>",
    )
    b.add(
        10,
        b"<< /Type /Annot /Subtype /Widget /Rect [50 50 150 70] "
        b"/FT /Tx /T (name1) /V (typed value) >>",
    )
    b.add(11, b"<< /Type /Annot /Subtype /Link /Rect [0 0 10 10] >>")
    b.add(
        12,
        b"<< /Type /Annot /Subtype /Widget /Rect [50 100 150 120] "
        b"/Parent 13 0 R >>",
    )
    b.add(
        13,
        b"<< /FT /Tx /T (parentfield) /V (parent value) /Kids [12 0 R] >>",
    )
    return b.build(1), _t("Body text")


# f31 outline golden, written down from the tree authored below
# (depth-first display order)
F31_OUTLINES = [
    # (order, level, title)
    (0, 0, "Chapter One"),
    (1, 1, "Section 1.1"),
    (2, 1, "Section 1.2"),
    (3, 0, "Chapter Two"),
]


def f31_outlines():
    """Document outline tree (catalog /Outlines, First/Next/Count sibling
    chains — reference model src/catalog.rs): two chapters, the first
    with two child sections. Content-stream golden is the usual span;
    titles surface via the separate pdf_outlines query."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R /Outlines 8 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td (Outlined doc) Tj ET")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(
        8,
        b"<< /Type /Outlines /First 9 0 R /Last 12 0 R /Count 4 >>",
    )
    b.add(
        9,
        b"<< /Title (Chapter One) /Parent 8 0 R /Next 12 0 R "
        b"/First 10 0 R /Last 11 0 R /Count 2 >>",
    )
    b.add(10, b"<< /Title (Section 1.1) /Parent 9 0 R /Next 11 0 R >>")
    b.add(11, b"<< /Title (Section 1.2) /Parent 9 0 R /Prev 10 0 R >>")
    b.add(12, b"<< /Title (Chapter Two) /Parent 8 0 R /Prev 9 0 R >>")
    return b.build(1), _t("Outlined doc")


# f32 ActualText goldens (hand-written): raw parity keeps the literal
# shows; the enrichment replaces each marked scope's text once
F32_ACTUALTEXT = ["Before", "Tele-vision", "hyphen", "After"]


# Progressive-DCT fixture (f33): same hand-derivable exact-decode scheme
# as f24 (uniform 8x8 gray blocks, R=G=B=v -> Y=v, Cb=Cr=128, DC=8*(v-128)
# divisible by the flat q=16) but encoded as PROGRESSIVE (SOF2): DC-first
# + DC-refine + spectral-split AC scans with successive approximation
# (Al=1 -> 0). The golden pixels are hand-written; exactness does not
# depend on which scan script delivered the coefficients.
PROG_W, PROG_H = 24, 8
PROG_PIXELS = bytes(
    ([160, 160, 160] * 8 + [96, 96, 96] * 8 + [208, 208, 208] * 8) * PROG_H
)


def _prog_ref() -> str:
    import hashlib

    return (
        "img:"
        + hashlib.sha256(
            f"{PROG_W}x{PROG_H}:rgb8:".encode() + PROG_PIXELS
        ).hexdigest()[:40]
    )


PROG_REF = _prog_ref()


def f33_progressive_jpeg():
    """Progressive (SOF2) DCT Image XObject — spectral selection +
    successive approximation per T.81 G.1.2 (the reference's crate
    handles progressive; our decoder is pdfcore/jpeg.py _decode_scan).
    Golden derived by hand exactly like f24."""
    import numpy as np

    from .jpegenc import encode_jpeg_progressive

    img = np.empty((PROG_H, PROG_W, 3), dtype=np.uint8)
    img[:, :8, :] = 160
    img[:, 8:16, :] = 96
    img[:, 16:, :] = 208
    jpeg = encode_jpeg_progressive(img, qtable=16, al=1)
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (Before progressive) Tj ET q /Im1 Do Q",
        extra_resources=b"/XObject << /Im1 9 0 R >>",
        extra_objects={
            9: (
                b"<< /Type /XObject /Subtype /Image /Width 24 /Height 8 "
                b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
                b"/Filter /DCTDecode /Length "
                + str(len(jpeg)).encode()
                + b" >>\nstream\n"
                + jpeg
                + b"\nendstream"
            )
        },
    )
    return pdf, [
        ("text", "Before progressive", None, 0),
        ("image", None, PROG_REF, 1),
    ]


# JBIG2 fixture (f34): lossless 1-bit generic-region coding, so the
# pixel golden is the hand-drawn bitmap itself ('#' = black). The region
# is MQ-arithmetic-coded (template 0, TPGDON on — the common scanned-PDF
# shape); the reference todo!()s JBIG2Decode entirely
# (src/filter/mod.rs:52).
JB2_ROWS = [
    "################",
    "#..............#",
    "#.#.........#..#",
    "#..#.......#...#",
    "#...#.....#....#",
    "#....#...#.....#",
    "#..............#",
    "################",
]
JB2_W, JB2_H = 16, 8
JB2_PIXELS = bytes(
    b
    for row in JB2_ROWS
    for ch in row
    for b in ((0, 0, 0) if ch == "#" else (255, 255, 255))
)


def _jb2_ref() -> str:
    import hashlib

    return (
        "img:"
        + hashlib.sha256(
            f"{JB2_W}x{JB2_H}:rgb8:".encode() + JB2_PIXELS
        ).hexdigest()[:40]
    )


JB2_REF = _jb2_ref()


def f34_jbig2_image():
    """JBIG2-filtered Image XObject (generic region, MQ arithmetic,
    TPGDON). Decoded by pdfcore/jbig2.py; golden = the literal bitmap
    drawing above."""
    import numpy as np

    from .jbig2enc import encode_jbig2_embedded

    bm = np.array(
        [[1 if ch == "#" else 0 for ch in row] for row in JB2_ROWS],
        np.uint8,
    )
    jb2 = encode_jbig2_embedded(
        [{"bitmap": bm, "tpgdon": True}], JB2_W, JB2_H
    )
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (Before jbig2) Tj ET q /Im1 Do Q",
        extra_resources=b"/XObject << /Im1 9 0 R >>",
        extra_objects={
            9: (
                b"<< /Type /XObject /Subtype /Image /Width 16 /Height 8 "
                b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                b"/Filter /JBIG2Decode /Length "
                + str(len(jb2)).encode()
                + b" >>\nstream\n"
                + jb2
                + b"\nendstream"
            )
        },
    )
    return pdf, [
        ("text", "Before jbig2", None, 0),
        ("image", None, JB2_REF, 1),
    ]


def f35_type0_legacy_rksj():
    """Type0 with a LEGACY predefined CJK CMap (/90ms-RKSJ-H — Shift-JIS
    code space). Raw span parity is lexer-level (one codepoint per byte
    of the hex string); the unicode enrichment decodes the code bytes
    with the cp932 codec (cmap.predefined_cmap_info) — no ToUnicode
    stream, no Adobe table. Bytes: 41 42 = "AB", 93FA 967B 8CEA =
    Shift-JIS "Nihongo" (three kanji)."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td <414293FA967B8CEA> Tj ET")
    b.add(
        5,
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureRKSJ "
        b"/Encoding /90ms-RKSJ-H /DescendantFonts [6 0 R] >>",
    )
    b.add(
        6,
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FixtureRKSJ "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Japan1) "
        b"/Supplement 6 >> /FontDescriptor 7 0 R /DW 1000 "
        b"/CIDToGIDMap /Identity >>",
    )
    b.add(
        7,
        b"<< /Type /FontDescriptor /FontName /FixtureRKSJ /Flags 4 "
        b"/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 700 "
        b"/Descent -200 /CapHeight 660 /StemV 80 >>",
    )
    return b.build(1), _t("AB\x93\xfa\x96\x7b\x8c\xea")


def _type0_legacy_fixture(cmap_name: bytes, ordering: bytes, hexcodes: bytes,
                          raw_text: str):
    """Shared builder for legacy predefined-CMap Type0 fixtures (f35
    shape): raw span parity is lexer-level (one codepoint per byte), the
    unicode golden comes from UNICODE_OVERRIDES."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td <" + hexcodes + b"> Tj ET")
    b.add(
        5,
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureLegacy "
        b"/Encoding /" + cmap_name + b" /DescendantFonts [6 0 R] >>",
    )
    b.add(
        6,
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FixtureLegacy "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (" + ordering
        + b") /Supplement 1 >> /FontDescriptor 7 0 R /DW 1000 "
        b"/CIDToGIDMap /Identity >>",
    )
    b.add(
        7,
        b"<< /Type /FontDescriptor /FontName /FixtureLegacy /Flags 4 "
        b"/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 700 "
        b"/Descent -200 /CapHeight 660 /StemV 80 >>",
    )
    return b.build(1), _t(raw_text)


def f41_type0_cns_euc():
    """Type0 with the /CNS-EUC-H predefined CMap (EUC-TW code space,
    traditional Chinese). Bytes: 41 42 = "AB", C4E3 C5C6 C7F3 = EUC-TW
    plane-1 codes for U+4E2D U+6587 U+5B57 ("Zhong Wen Zi" — derived
    independently by round-tripping through glibc iconv's public CNS
    11643 table; the engine decodes via ctypes iconv,
    fonts/cmap.py:_decode_euc_tw). The reference ships this CMap as a
    name only (src/font/cjk.rs)."""
    return _type0_legacy_fixture(
        b"CNS-EUC-H", b"CNS1", b"4142C4E3C5C6C7F3",
        "AB\xc4\xe3\xc5\xc6\xc7\xf3",
    )


OCG_IMG_W, OCG_IMG_H = 2, 1
OCG_IMG_PIXELS = [10, 20, 30, 200, 210, 220]  # flat RGB
OCG_IMG_REF = media_ref_for_pixels(
    OCG_IMG_W, OCG_IMG_H, bytes(OCG_IMG_PIXELS)
)


def f43_optional_content(base_state_off: bool = False):
    """Optional-content groups (PDF 32000-1 §8.11): /OCProperties declares
    OCG 8 (ON by default) and OCG 9 (listed /OFF in the default config);
    OCMD 10 wraps the hidden group. Content paints visible text, text in
    the hidden /OC scope, text in the visible /OC scope, text under the
    OCMD, an /OC-tagged image XObject in the hidden group, and trailing
    text. Raw golden keeps EVERYTHING (default extraction ignores OCG
    state, matching the reference, src/optional_content.rs); the
    strip_hidden_ocg golden (OCG_OVERRIDES) drops Secret/AllOff/image."""
    b = PdfBuilder()
    d = (
        b"<< /BaseState /OFF /ON [8 0 R] >>"
        if base_state_off
        else b"<< /OFF [9 0 R] >>"
    )
    b.add(
        1,
        b"<< /Type /Catalog /Pages 2 0 R /OCProperties "
        b"<< /OCGs [8 0 R 9 0 R] /D " + d + b" >> >>",
    )
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> "
        b"/Properties << /L1 8 0 R /L2 9 0 R /M1 10 0 R >> "
        b"/XObject << /Im1 11 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(
        4,
        b"",
        b"BT /F1 12 Tf 72 720 Td (Shown) Tj ET "
        b"/OC /L2 BDC BT /F1 12 Tf 72 700 Td (Secret) Tj ET EMC "
        b"/OC /L1 BDC BT /F1 12 Tf 72 680 Td (Layer) Tj ET EMC "
        b"/OC /M1 BDC BT /F1 12 Tf 72 660 Td (AllOff) Tj ET EMC "
        b"/Im1 Do "
        b"BT /F1 12 Tf 72 640 Td (Tail) Tj ET",
    )
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(8, b"<< /Type /OCG /Name (LayerA) >>")
    b.add(9, b"<< /Type /OCG /Name (LayerB) >>")
    b.add(10, b"<< /Type /OCMD /OCGs [9 0 R] >>")
    b.add(
        11,
        b"<< /Type /XObject /Subtype /Image /Width 2 /Height 1 "
        b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /OC 9 0 R /Length 6 "
        b">>\nstream\n" + bytes(OCG_IMG_PIXELS) + b"\nendstream",
    )
    return b.build(1), [
        ("text", "Shown", None, 0),
        ("text", "Secret", None, 1),
        ("text", "Layer", None, 2),
        ("text", "AllOff", None, 3),
        ("image", None, OCG_IMG_REF, 4),
        ("text", "Tail", None, 5),
    ]


def f42_type0_kscpc_euc():
    """Type0 with the /KSCpc-EUC-H predefined CMap (Mac OS Korean). Its
    A1A1-FEFE double-byte range is KS X 1001 in EUC form, byte-identical
    to euc_kr: C7D1 B1B9 = U+D55C U+AD6D ("Han Guk"). Engine decode:
    fonts/cmap.py:_decode_kscpc_euc (Mac extension codes -> U+FFFD)."""
    return _type0_legacy_fixture(
        b"KSCpc-EUC-H", b"Korea1", b"4142C7D1B1B9", "AB\xc7\xd1\xb1\xb9"
    )


# Tint-transform fixtures (f44): Separation / DeviceN images driven by
# PDF functions of all four types (§7.10; reference models them in
# src/function/mod.rs:19-37 but its canvas todo!()s non-device spaces).
# Expected pixels are hand-derived below by mirroring the SPEC formulas
# (interpolation / exponent / stitching / calculator arithmetic written
# out explicitly), independent of the engine.


def _q255(c: float) -> int:
    v = int(c * 255 + 0.5)
    return 0 if v < 0 else 255 if v > 255 else v


TINT_W, TINT_H = 4, 2
# image A — Separation, type-2 exponential fn: t -> (1, 1-t, 1-t)
TINT_A_SAMPLES = bytes([0, 85, 170, 255, 255, 170, 85, 0])
TINT_A_PIXELS = b"".join(
    bytes((255, 255 - s, 255 - s)) for s in TINT_A_SAMPLES
)
TINT_A_REF = media_ref_for_pixels(TINT_W, TINT_H, TINT_A_PIXELS)

# image B — Separation, type-3 stitching (Bounds [0.5]) of two type-2
# subfunctions: t<0.5 -> (0, 0, 2t); t>=0.5 -> (e^2, 1, 0), e=(t-.5)/.5
TINT_B_SAMPLES = bytes([0, 64, 127, 128, 191, 255, 0, 255])


def _tint_b_rgb(s: int) -> bytes:
    t = s / 255.0
    if t < 0.5:
        e = 0.0 + (t - 0.0) * (1.0 - 0.0) / (0.5 - 0.0)
        return bytes((0, 0, _q255(0.0 + e * (1.0 - 0.0))))
    e = 0.0 + (t - 0.5) * (1.0 - 0.0) / (1.0 - 0.5)
    return bytes((_q255(0.0 + e**2.0 * (1.0 - 0.0)), 255, 0))


TINT_B_PIXELS = b"".join(_tint_b_rgb(s) for s in TINT_B_SAMPLES)
TINT_B_REF = media_ref_for_pixels(TINT_W, TINT_H, TINT_B_PIXELS)

# image C — DeviceN 2-ink over DeviceCMYK, type-4 calculator
# { 2 copy add 2 div 0 }: (a, b) -> cmyk (a, b, (a+b)/2, 0); 2x2 px
TINT_C_W, TINT_C_H = 2, 2
TINT_C_SAMPLES = bytes([0, 255, 255, 0, 128, 64, 255, 255])


def _tint_c_rgb(sa: int, sb: int) -> bytes:
    a, b = sa / 255.0, sb / 255.0
    c, m, y, k = _q255(a), _q255(b), _q255((a + b) / 2), 0
    return bytes(
        (
            (255 - c) * (255 - k) // 255,
            (255 - m) * (255 - k) // 255,
            (255 - y) * (255 - k) // 255,
        )
    )


TINT_C_PIXELS = b"".join(
    _tint_c_rgb(TINT_C_SAMPLES[2 * i], TINT_C_SAMPLES[2 * i + 1])
    for i in range(TINT_C_W * TINT_C_H)
)
TINT_C_REF = media_ref_for_pixels(TINT_C_W, TINT_C_H, TINT_C_PIXELS)

# image D — Separation over DeviceGray, type-0 sampled fn: Size [4],
# BitsPerSample 8, samples [255,128,64,0], default Encode [0 3]: linear
# interpolation between grid points (spec §7.10.2 formulas mirrored)
TINT_D_FN_SAMPLES = bytes([255, 128, 64, 0])
TINT_D_SAMPLES = bytes([0, 85, 170, 255, 128, 192, 32, 255])


def _tint_d_rgb(s: int) -> bytes:
    t = s / 255.0
    e = 0.0 + (t - 0.0) * (3.0 - 0.0) / (1.0 - 0.0)
    e = 0.0 if e < 0.0 else 3.0 if e > 3.0 else e
    import math as _m

    lo = min(int(_m.floor(e)), 3)
    frac = e - lo
    hi = min(lo + 1, 3)
    v_lo = 0.0 + (TINT_D_FN_SAMPLES[lo] - 0.0) * (1.0 - 0.0) / (255.0 - 0.0)
    v_hi = 0.0 + (TINT_D_FN_SAMPLES[hi] - 0.0) * (1.0 - 0.0) / (255.0 - 0.0)
    out = 0.0
    out += (1.0 - frac) * v_lo
    if frac != 0.0:
        out += frac * v_hi
    g = _q255(out)
    return bytes((g, g, g))


TINT_D_PIXELS = b"".join(_tint_d_rgb(s) for s in TINT_D_SAMPLES)
TINT_D_REF = media_ref_for_pixels(TINT_W, TINT_H, TINT_D_PIXELS)


def f44_tint_transforms():
    """Separation/DeviceN images exercising every PDF function type:
    2 (exponential, inline dict), 3 (stitching of type-2s), 4
    (PostScript calculator stream), 0 (sampled stream)."""

    def img(num, w, h, cs, data):
        return (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace ".encode()
            + cs
            + f" /BitsPerComponent 8 /Length {len(data)} >>\nstream\n".encode()
            + data
            + b"\nendstream"
        )

    fn2 = b"<< /FunctionType 2 /Domain [0 1] /C0 [1 1 1] /C1 [1 0 0] /N 1 >>"
    fn3 = (
        b"<< /FunctionType 3 /Domain [0 1] /Bounds [0.5] /Encode [0 1 0 1] "
        b"/Functions ["
        b"<< /FunctionType 2 /Domain [0 1] /C0 [0 0 0] /C1 [0 0 1] /N 1 >> "
        b"<< /FunctionType 2 /Domain [0 1] /C0 [0 1 0] /C1 [1 1 0] /N 2 >>"
        b"] >>"
    )
    ps_prog = b"{ 2 copy add 2 div 0 }"
    fn0_data = TINT_D_FN_SAMPLES
    pdf = simple_page_pdf(
        b"q /ImA Do Q q /ImB Do Q q /ImC Do Q q /ImD Do Q "
        b"BT /F1 12 Tf 72 700 Td (Tints done) Tj ET",
        extra_resources=(
            b"/XObject << /ImA 9 0 R /ImB 10 0 R /ImC 11 0 R /ImD 12 0 R >>"
        ),
        extra_objects={
            9: img(
                9,
                TINT_W,
                TINT_H,
                b"[/Separation /SpotRed /DeviceRGB " + fn2 + b"]",
                TINT_A_SAMPLES,
            ),
            10: img(
                10,
                TINT_W,
                TINT_H,
                b"[/Separation /Stitch /DeviceRGB " + fn3 + b"]",
                TINT_B_SAMPLES,
            ),
            11: img(
                11,
                TINT_C_W,
                TINT_C_H,
                b"[/DeviceN [/Ink1 /Ink2] /DeviceCMYK 13 0 R]",
                TINT_C_SAMPLES,
            ),
            12: img(
                12,
                TINT_W,
                TINT_H,
                b"[/Separation /Sampled /DeviceGray 14 0 R]",
                TINT_D_SAMPLES,
            ),
            13: (
                b"<< /FunctionType 4 /Domain [0 1 0 1] "
                b"/Range [0 1 0 1 0 1 0 1] /Length "
                + str(len(ps_prog)).encode()
                + b" >>\nstream\n"
                + ps_prog
                + b"\nendstream"
            ),
            14: (
                b"<< /FunctionType 0 /Domain [0 1] /Range [0 1] /Size [4] "
                b"/BitsPerSample 8 /Length "
                + str(len(fn0_data)).encode()
                + b" >>\nstream\n"
                + fn0_data
                + b"\nendstream"
            ),
        },
    )
    return pdf, [
        ("image", None, TINT_A_REF, 0),
        ("image", None, TINT_B_REF, 1),
        ("image", None, TINT_C_REF, 2),
        ("image", None, TINT_D_REF, 3),
        ("text", "Tints done", None, 4),
    ]


# JBIG2 symbol/text fixture (f36): the dominant scanned-PDF coding mode
# — glyphs decoded once into a symbol dictionary, then PLACED as text
# instances. Golden = the literal glyph drawings composed at the literal
# placements below ('#' = black), written down independently of the
# engine.
JB2T_GLYPH_T = ["#####", "..#..", "..#..", "..#..", "..#.."]
JB2T_GLYPH_L = ["#....", "#....", "#....", "#....", "#####"]
JB2T_PLACE = [(0, 1, 1), (1, 8, 1), (0, 15, 1), (1, 2, 8), (0, 9, 8)]
JB2T_W, JB2T_H = 22, 15


def _jb2t_page():
    page = [[0] * JB2T_W for _ in range(JB2T_H)]
    for sid, s, t in JB2T_PLACE:
        g = (JB2T_GLYPH_T, JB2T_GLYPH_L)[sid]
        for gy, row in enumerate(g):
            for gx, ch in enumerate(row):
                if ch == "#":
                    page[t + gy][s + gx] = 1
    return page


JB2T_PIXELS = bytes(
    b
    for row in _jb2t_page()
    for v in row
    for b in ((0, 0, 0) if v else (255, 255, 255))
)


def _jb2t_ref() -> str:
    import hashlib

    return (
        "img:"
        + hashlib.sha256(
            f"{JB2T_W}x{JB2T_H}:rgb8:".encode() + JB2T_PIXELS
        ).hexdigest()[:40]
    )


JB2T_REF = _jb2t_ref()


def f36_jbig2_text_region():
    """JBIG2 symbol-dictionary + text-region image (T.88 6.4/6.5, MQ
    arithmetic + Annex A integer decoding) — beyond the generic-region
    f34; the reference todo!()s the whole filter (src/filter/mod.rs:52)."""
    import numpy as np

    from .jbig2enc import encode_symbol_dict_and_text

    T = np.array(
        [[1 if c == "#" else 0 for c in r] for r in JB2T_GLYPH_T], np.uint8
    )
    L = np.array(
        [[1 if c == "#" else 0 for c in r] for r in JB2T_GLYPH_L], np.uint8
    )
    jb2 = encode_symbol_dict_and_text(
        [T, L], JB2T_PLACE, JB2T_W, JB2T_H
    )
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (Before jbig2 text) Tj ET q /Im1 Do Q",
        extra_resources=b"/XObject << /Im1 9 0 R >>",
        extra_objects={
            9: (
                b"<< /Type /XObject /Subtype /Image /Width 22 /Height 15 "
                b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                b"/Filter /JBIG2Decode /Length "
                + str(len(jb2)).encode()
                + b" >>\nstream\n"
                + jb2
                + b"\nendstream"
            )
        },
    )
    return pdf, [
        ("text", "Before jbig2 text", None, 0),
        ("image", None, JB2T_REF, 1),
    ]


def f37_jbig2_huffman_text():
    """JBIG2 HUFFMAN-coded symbol dictionary + text region (T.88
    SDHUFF/SBHUFF with Annex B standard tables, per-height-class
    collective bitmaps) — same glyph layout and hand-written pixel
    golden as f36, different coding mode; the reference todo!()s the
    whole filter (src/filter/mod.rs:52)."""
    import numpy as np

    from .jbig2enc import encode_symbol_dict_and_text_huffman

    T = np.array(
        [[1 if c == "#" else 0 for c in r] for r in JB2T_GLYPH_T], np.uint8
    )
    L = np.array(
        [[1 if c == "#" else 0 for c in r] for r in JB2T_GLYPH_L], np.uint8
    )
    jb2 = encode_symbol_dict_and_text_huffman(
        [T, L], JB2T_PLACE, JB2T_W, JB2T_H
    )
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (Before jbig2 huffman) Tj ET q /Im1 Do Q",
        extra_resources=b"/XObject << /Im1 9 0 R >>",
        extra_objects={
            9: (
                b"<< /Type /XObject /Subtype /Image /Width 22 /Height 15 "
                b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
                b"/Filter /JBIG2Decode /Length "
                + str(len(jb2)).encode()
                + b" >>\nstream\n"
                + jb2
                + b"\nendstream"
            )
        },
    )
    return pdf, [
        ("text", "Before jbig2 huffman", None, 0),
        ("image", None, JB2T_REF, 1),
    ]


# JPX fixture (f38): JPEG 2000 5/3-reversible coding is LOSSLESS, so the
# pixel goldens are the literal formula arrays below — decode must match
# bit-for-bit. Two images: a gray raw codestream (2 decomposition
# levels) and an RGB JP2 container with the reversible color transform
# (RCT), exercising the box parser and MCT paths. The reference
# todo!()s JPXDecode entirely (src/filter/mod.rs:54).
JPX_W, JPX_H = 13, 9
JPX_GRAY = [[(x * 19 + y * 31) % 256 for x in range(JPX_W)] for y in range(JPX_H)]
JPX_PIXELS = bytes(v for row in JPX_GRAY for v in row for _ in range(3))
JPXC_W, JPXC_H = 10, 8
JPXC_RGB = [
    [((x * 23 + y * 7) % 256, (x * 5 + y * 41) % 256, (x * 13 + y * 17) % 256)
     for x in range(JPXC_W)]
    for y in range(JPXC_H)
]
JPXC_PIXELS = bytes(c for row in JPXC_RGB for px in row for c in px)
# 20-bit gray (>16-bit precision, round-4 verdict #7): lossless 5/3 at
# depth 20, rescaled to 8-bit by the decoder's (255 / (2^d - 1)) rule —
# the golden below applies that rule to the literal formula values
# (round() and np.rint share round-half-even semantics on float64).
JPX20_W, JPX20_H = 8, 6
JPX20_GRAY = [
    [(x * 77003 + y * 131071 + 12345) % (1 << 20) for x in range(JPX20_W)]
    for y in range(JPX20_H)
]
JPX20_PIXELS = bytes(
    int(round(v * 255.0 / ((1 << 20) - 1)))
    for row in JPX20_GRAY
    for v in row
    for _ in range(3)
)


def _jpx_refs() -> tuple[str, str, str]:
    import hashlib

    g = hashlib.sha256(
        f"{JPX_W}x{JPX_H}:rgb8:".encode() + JPX_PIXELS
    ).hexdigest()[:40]
    c = hashlib.sha256(
        f"{JPXC_W}x{JPXC_H}:rgb8:".encode() + JPXC_PIXELS
    ).hexdigest()[:40]
    d = hashlib.sha256(
        f"{JPX20_W}x{JPX20_H}:rgb8:".encode() + JPX20_PIXELS
    ).hexdigest()[:40]
    return f"img:{g}", f"img:{c}", f"img:{d}"


JPX_REF, JPXC_REF, JPX20_REF = _jpx_refs()


def f38_jpx_image():
    """JPXDecode Image XObjects (gray codestream + RGB JP2/RCT), decoded
    by pdfcore/jpx.py; goldens = the literal formula bitmaps above.
    Per PDF 32000-1 §7.4.9 the codestream supplies geometry/depth/color,
    so the dicts carry only Width/Height."""
    import numpy as np

    from .jpxenc import encode_jpx

    gray = np.array(JPX_GRAY, np.uint8)
    rgb = np.array(
        [[list(px) for px in row] for row in JPXC_RGB], np.uint8
    )
    gray20 = np.array(JPX20_GRAY, np.int64)
    cs_g = encode_jpx(gray, levels=2)
    cs_c = encode_jpx(rgb, jp2=True)
    cs_20 = encode_jpx(gray20, depth=20)
    pdf = simple_page_pdf(
        b"BT /F1 12 Tf 72 720 Td (Before jpx) Tj ET "
        b"q /Im1 Do Q q /Im2 Do Q q /Im3 Do Q",
        extra_resources=b"/XObject << /Im1 9 0 R /Im2 10 0 R /Im3 11 0 R >>",
        extra_objects={
            9: (
                b"<< /Type /XObject /Subtype /Image /Width 13 /Height 9 "
                b"/Filter /JPXDecode /Length "
                + str(len(cs_g)).encode()
                + b" >>\nstream\n"
                + cs_g
                + b"\nendstream"
            ),
            10: (
                b"<< /Type /XObject /Subtype /Image /Width 10 /Height 8 "
                b"/Filter /JPXDecode /Length "
                + str(len(cs_c)).encode()
                + b" >>\nstream\n"
                + cs_c
                + b"\nendstream"
            ),
            11: (
                b"<< /Type /XObject /Subtype /Image /Width 8 /Height 6 "
                b"/Filter /JPXDecode /Length "
                + str(len(cs_20)).encode()
                + b" >>\nstream\n"
                + cs_20
                + b"\nendstream"
            ),
        },
    )
    return pdf, [
        ("text", "Before jpx", None, 0),
        ("image", None, JPX_REF, 1),
        ("image", None, JPXC_REF, 2),
        ("image", None, JPX20_REF, 3),
    ]


def f32_actualtext():
    """Marked-content /ActualText (PDF 32000-1 §14.9.4): one inline
    property dict and one /Properties-resource reference. RAW span parity
    = the literal Tj strings (the reference only tracks the tag stack,
    src/render/mod.rs:1486-1520); the apply_actual_text enrichment
    replaces each scope's shows with the declared replacement text."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> "
        b"/Properties << /P1 8 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(
        4,
        b"",
        b"BT /F1 12 Tf 72 720 Td (Before) Tj ET "
        b"/Span << /ActualText (Tele-vision) >> BDC "
        b"BT /F1 12 Tf 72 700 Td (Tele-) Tj ET "
        b"BT /F1 12 Tf 72 680 Td (vision) Tj ET "
        b"EMC "
        b"/Span /P1 BDC "
        b"BT /F1 12 Tf 72 660 Td (hy-) Tj ET "
        b"BT /F1 12 Tf 72 640 Td (phen) Tj ET "
        b"EMC "
        b"BT /F1 12 Tf 72 620 Td (After) Tj ET",
    )
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(8, b"<< /ActualText (hyphen) >>")
    return b.build(1), _t("Before", "Tele-", "vision", "hy-", "phen", "After")


# hand-written logical-structure golden for f39 (DFS element order over
# the tree: Document=0 owns no MCIDs, Chap->H1 via RoleMap=1, P=2):
# (elem_order, role, page_index, text)
F39_STRUCTURE = [
    (1, "H1", 0, "Title"),
    (2, "P", 0, "Hello world."),
]


def f39_tagged_structure():
    """Tagged PDF (PDF 32000-1 §14.7-14.8): a pagination /Artifact header,
    an /H1 (via single-hop /RoleMap from /Chap) and a /P whose two
    marked-content sequences are PAINTED out of logical order — the
    structure tree, not the content stream, carries reading order. The
    /P references MCID 1 directly and MCID 2 through an /MCR dict. RAW
    span parity = paint order including the artifact (the reference
    never walks StructTreeRoot, src/catalog.rs)."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 6 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(
        4,
        b"",
        b"/Artifact << /Type /Pagination >> BDC "
        b"BT /F1 9 Tf 72 770 Td (Page 1 of 1) Tj ET "
        b"EMC "
        b"/P << /MCID 2 >> BDC "
        b"BT /F1 12 Tf 72 660 Td (world.) Tj ET "
        b"EMC "
        b"/H1 << /MCID 0 >> BDC "
        b"BT /F1 18 Tf 72 720 Td (Title) Tj ET "
        b"EMC "
        b"/P << /MCID 1 >> BDC "
        b"BT /F1 12 Tf 72 680 Td (Hello) Tj ET "
        b"EMC",
    )
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(
        6,
        b"<< /Type /StructTreeRoot /K 7 0 R "
        b"/RoleMap << /Chap /H1 >> >>",
    )
    b.add(7, b"<< /S /Document /P 6 0 R /Pg 3 0 R /K [8 0 R 9 0 R] >>")
    b.add(8, b"<< /S /Chap /P 7 0 R /Pg 3 0 R /K 0 >>")
    b.add(
        9,
        b"<< /S /P /P 7 0 R /Pg 3 0 R "
        b"/K [1 << /Type /MCR /Pg 3 0 R /MCID 2 >>] >>",
    )
    return b.build(1), _t("Page 1 of 1", "world.", "Title", "Hello")


# hand-written AcroForm field-tree golden for f40 (terminal fields in
# DFS order): (order, fq_name, ftype, value)
F40_FORM = [
    (0, "person.first", "Tx", "Ada"),
    (1, "person.last", "Tx", "Lovelace"),
    (2, "choice", "Btn", "Yes"),
]


def f40_acroform_tree():
    """Catalog-level AcroForm field tree (PDF 32000-1 §12.7): a
    non-terminal /T (person) node carrying an inheritable /V, two child
    fields (one overriding /V, one inheriting it), and a /Btn field
    whose only kid is a widget WITHOUT /T (widget kids don't split a
    field — it stays terminal). RAW span parity = the page's one text
    show. The reference declares the field dict (src/acro_form.rs) but
    never assembles qualified names."""
    b = PdfBuilder()
    b.add(
        1,
        b"<< /Type /Catalog /Pages 2 0 R "
        b"/AcroForm << /Fields [10 0 R 13 0 R] >> >>",
    )
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td (Form page) Tj ET")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(
        10,
        b"<< /T (person) /FT /Tx /V (Lovelace) /Kids [11 0 R 12 0 R] >>",
    )
    b.add(11, b"<< /T (first) /Parent 10 0 R /V (Ada) >>")
    b.add(12, b"<< /T (last) /Parent 10 0 R >>")
    b.add(13, b"<< /T (choice) /FT /Btn /V /Yes /Kids [14 0 R] >>")
    b.add(
        14,
        b"<< /Type /Annot /Subtype /Widget /Rect [0 0 10 10] "
        b"/Parent 13 0 R >>",
    )
    return b.build(1), _t("Form page")


# hand-written ARTIFACT-STRIPPED span expectations (pdf_main_content):
# fixtures not listed are identical to their raw golden; only f17 and f39
# paint /Artifact-scoped text (headers the main-content rule drops).
MAIN_OVERRIDES: dict[str, list] = {
    "f17": _t("Marked two", "After paths"),
    "f39": _t("world.", "Title", "Hello"),
}


# hand-written HIDDEN-OCG-STRIPPED expectations (pdf_ocg_content):
# fixtures not listed are identical to their raw golden; only f43
# declares /OCProperties with a default-OFF group.
OCG_OVERRIDES: dict[str, list] = {
    "f43": _t("Shown", "Layer", "Tail"),
}


# hand-derived expected spans for the ToUnicode-enrichment variant
# (pdf_extract_unicode); fixtures not listed are identical to their raw
# golden. f12: 2-byte codes 0048/0069 -> "Hi" via its bfranges.
# f27: UCS2 codes 0048/0069/4E2D -> "Hi中" via the predefined CMap's
# UCS-2 code space (no ToUnicode stream in the fixture).
UNICODE_OVERRIDES: dict[str, list] = {
    "f12": [("text", "Hi", None, 0)],
    "f27": [("text", "Hi中", None, 0)],
    "f35": [("text", "AB日本語", None, 0)],
    "f41": [("text", "AB中文字", None, 0)],
    "f42": [("text", "AB한국", None, 0)],
}

# Page-label fixture (f45): catalog /PageLabels NUMBER TREE (Kids +
# Limits + Nums — the reference's generic structure,
# src/data_structures/number_tree.rs) with all three common styles:
# roman front matter, decimal body with a prefix and a start offset,
# letter appendix. Golden labels are hand-written below.

F45_LABELS = [
    (0, "i"),
    (1, "ii"),
    (2, "iii"),
    (3, "A-5"),
    (4, "A-6"),
    (5, "A-7"),
    (6, "a"),
    (7, "b"),
]


def f45_page_labels(n_pages: int = 8):
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R /PageLabels 4 0 R >>")
    kids = " ".join(f"{10 + i} 0 R" for i in range(n_pages))
    b.add(
        2,
        (
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} "
            "/Resources << /Font << /F1 3 0 R >> >> "
            "/MediaBox [0 0 612 792] >>"
        ).encode(),
    )
    b.add(3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    # number tree: root -> two kids with Limits
    b.add(4, b"<< /Kids [5 0 R 6 0 R] >>")
    b.add(
        5,
        b"<< /Limits [0 3] /Nums [0 << /S /r >> "
        b"3 << /S /D /P (A-) /St 5 >>] >>",
    )
    b.add(6, b"<< /Limits [6 6] /Nums [6 << /S /a >>] >>")
    golden = []
    for i in range(n_pages):
        text = f"PL page {i + 1}"
        b.add(
            10 + i,
            f"<< /Type /Page /Parent 2 0 R /Contents {10 + n_pages + i} 0 R >>".encode(),
        )
        content = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
        b.add(
            10 + n_pages + i,
            f"<< /Length {len(content)} >>\nstream\n".encode()
            + content
            + b"\nendstream",
        )
        golden.append(("text", text, None, i))
    return b.build(1), golden


# Metadata + embedded-file fixtures (f46/f47): trailer /Info dict with
# a full PDF date string, and a /Names -> /EmbeddedFiles NAME tree
# (Kids + Limits) with two flate-compressed attachments. Goldens are the
# literal values below.

F46_INFO = (
    "Fixture Report",           # Title
    "Jordan Example",           # Author
    "pdf-ray fixtures",         # Subject
    "PdfBuilder 1.0",           # Producer
    (2024, 1, 15),              # CreationDate Y/M/D
)

ATTACH_A = b"attachment payload A: " + bytes(range(32))
ATTACH_B = b"second payload, longer " * 7


def f46_metadata():
    t, a, s, p, (y, m, d) = F46_INFO
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
             b"/Resources << /Font << /F1 5 0 R >> >> "
             b"/MediaBox [0 0 612 792] >>")
    content = b"BT /F1 12 Tf 72 720 Td (Metadata doc) Tj ET"
    b.add(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    b.add(4, b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
             + content + b"\nendstream")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(
        9,
        (
            f"<< /Title ({t}) /Author ({a}) /Subject ({s}) "
            f"/Producer ({p}) "
            f"/CreationDate (D:{y:04d}{m:02d}{d:02d}093000+05'30') >>"
        ).encode(),
    )
    pdf = b.build(1, extra_trailer=b"/Info 9 0 R ")
    return pdf, [("text", "Metadata doc", None, 0)]


def f47_embedded_files():
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R /Names << /EmbeddedFiles 6 0 R >> >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
             b"/Resources << /Font << /F1 5 0 R >> >> "
             b"/MediaBox [0 0 612 792] >>")
    content = b"BT /F1 12 Tf 72 720 Td (Has attachments) Tj ET"
    b.add(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    b.add(4, b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
             + content + b"\nendstream")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    # name tree with two leaf kids (exercises Kids recursion)
    b.add(6, b"<< /Kids [7 0 R 8 0 R] >>")
    b.add(7, b"<< /Limits [(alpha.bin) (alpha.bin)] "
             b"/Names [(alpha.bin) 10 0 R] >>")
    b.add(8, b"<< /Limits [(beta.txt) (beta.txt)] "
             b"/Names [(beta.txt) 11 0 R] >>")
    b.add(10, b"<< /Type /Filespec /F (alpha.bin) /UF (alpha-unicode.bin) "
              b"/EF << /F 12 0 R >> >>")
    b.add(11, b"<< /Type /Filespec /F (beta.txt) /EF << /F 13 0 R >> >>")
    b.add_stream(12, b"/Type /EmbeddedFile", ATTACH_A, filters="flate")
    b.add_stream(13, b"/Type /EmbeddedFile", ATTACH_B, filters="flate")
    pdf = b.build(1)
    return pdf, [("text", "Has attachments", None, 0)]


# Font-attributed span fixture (f48): three base fonts at distinct
# sizes plus a form XObject carrying its own font resources — the
# layout-signal extraction (heading vs body detection) golden.

F48_FONTS = [
    (0, "Title line", "Helvetica", 24000),
    (1, "Body line", "Helvetica", 10000),
    (2, "Times body", "Times-Roman", 10000),
    (3, "Form footnote", "Courier", 8000),
]


def f48_font_spans():
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(
        2,
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
        b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> "
        b"/XObject << /Fm 7 0 R >> >> /MediaBox [0 0 612 792] >>",
    )
    content = (
        b"BT /F1 24 Tf 72 720 Td (Title line) Tj ET "
        b"BT /F1 10 Tf 72 700 Td (Body line) Tj ET "
        b"BT /F2 10 Tf 72 680 Td (Times body) Tj ET "
        b"/Fm Do"
    )
    b.add(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    b.add(4, b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
             + content + b"\nendstream")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(6, b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman >>")
    form = b"BT /F3 8 Tf 72 660 Td (Form footnote) Tj ET"
    b.add(
        7,
        b"<< /Type /XObject /Subtype /Form /BBox [0 0 612 792] "
        b"/Resources << /Font << /F3 8 0 R >> >> /Length "
        + str(len(form)).encode()
        + b" >>\nstream\n" + form + b"\nendstream",
    )
    b.add(8, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    pdf = b.build(1)
    return pdf, [
        ("text", "Title line", None, 0),
        ("text", "Body line", None, 1),
        ("text", "Times body", None, 2),
        ("text", "Form footnote", None, 3),
    ]


# ICC profile fixture (f49): a hand-built minimal ICC.1:2004 profile —
# 128-byte header + 3-entry tag table (wtpt/desc/cprt) — attached to an
# /ICCBased colorspace that the content stream selects state-only (C16).
# The header field values below are the literal oracle constants for
# pdf_icc_profiles; the reference parses exactly this surface
# (src/icc_profile/parse.rs) and never interprets tag payloads.
ICC_TAGS = [("wtpt", 168, 20), ("desc", 188, 12), ("cprt", 200, 11)]
ICC_HEADER = {
    "profile_size": 212,  # 128 + 4 + 36 tag table + 43 data + 1 pad
    "preferred_cmm": "ADBE",
    "version_major": 4,
    "version_minor": 2,
    "device_class": "mntr",
    "colour_space": "RGB ",
    "pcs": "XYZ ",
    "platform": "APPL",
    "rendering_intent": 1,
}


def _build_icc_profile() -> bytes:
    import struct

    h = ICC_HEADER
    buf = b"".join(
        [
            struct.pack(">I", h["profile_size"]),
            h["preferred_cmm"].encode(),
            bytes([h["version_major"], h["version_minor"] << 4, 0, 0]),
            h["device_class"].encode(),
            h["colour_space"].encode(),
            h["pcs"].encode(),
            struct.pack(">6H", 2020, 1, 2, 3, 4, 5),  # dateTimeNumber
            b"acsp",
            h["platform"].encode(),
            struct.pack(">I", 0),  # flags
            b"ABCD",  # manufacturer
            b"EFGH",  # model
            struct.pack(">Q", 0),  # attributes
            struct.pack(">I", h["rendering_intent"]),
            # D50 PCS illuminant as s15Fixed16 (1/65536 units)
            struct.pack(">3i", 63190, 65536, 54061),
            b"pdfr",  # creator
            bytes(16),  # profile ID
            bytes(28),  # reserved
        ]
    )
    assert len(buf) == 128
    buf += struct.pack(">I", len(ICC_TAGS))
    for sig, off, ln in ICC_TAGS:
        buf += struct.pack(">4sII", sig.encode(), off, ln)
    buf += b"XYZ " + bytes(4) + struct.pack(">3i", 63190, 65536, 54061)
    buf += b"desc" + bytes(8)
    buf += b"text" + bytes(4) + b"(c)"
    buf += bytes(ICC_HEADER["profile_size"] - len(buf))  # pad
    assert len(buf) == ICC_HEADER["profile_size"]
    return buf


def f49_icc_profile():
    """/ICCBased colorspace whose profile stream gets header/tag-table
    introspection (pdf_icc_profiles). The colorspace select + fill color
    are consumed state-only, so the span golden is just the text."""
    icc = _build_icc_profile()
    pdf = simple_page_pdf(
        b"/CS0 cs 0.2 0.3 0.4 sc "
        b"BT /F1 12 Tf 72 720 Td (icc profile doc) Tj ET",
        extra_resources=b"/ColorSpace << /CS0 [/ICCBased 9 0 R] >>",
        extra_objects={
            9: (
                b"<< /N 3 /Length "
                + str(len(icc)).encode()
                + b" >>\nstream\n"
                + icc
                + b"\nendstream"
            ),
        },
    )
    return pdf, [("text", "icc profile doc", None, 0)]


FIXTURES = {
    "f01": f01_minimal_tj,
    "f02": f02_flate_content,
    "f03": f03_tj_array_kerning,
    "f04": f04_text_positioning,
    "f05": f05_string_escapes,
    "f06": f06_multi_stream_page,
    "f07": f07_xref_stream_objstm,
    "f08": f08_incremental_update,
    "f09": f09_type1_embedded,
    "f10": f10_ttf_embedded,
    "f11": f11_cff_fontfile3,
    "f12": f12_type0_identity_h,
    "f13": f13_image_png_decode,
    "f14": f14_form_xobject_nested,
    "f15": f15_filters_ascii,
    "f16": f16_filter_lzw,
    "f17": f17_marked_content,
    "f18": f18_outlier_200pp,
    "f19a": f19a_poison_truncated,
    "f19b": f19b_poison_bad_xref,
    "f21": f21_type3_font,
    "f22": f22_encrypted_rc4,
    "f23": f23_encrypted_aes,
    "f24": f24_dct_image,
    "f25": f25_indexed_image,
    "f26": f26_hybrid_xrefstm,
    "f27": f27_type0_predefined_ucs2,
    "f28": f28_annotations,
    "f29": f29_ccitt_image,
    "f30": f30_encrypted_aes256,
    "f31": f31_outlines,
    "f32": f32_actualtext,
    "f33": f33_progressive_jpeg,
    "f34": f34_jbig2_image,
    "f35": f35_type0_legacy_rksj,
    "f36": f36_jbig2_text_region,
    "f37": f37_jbig2_huffman_text,
    "f38": f38_jpx_image,
    "f39": f39_tagged_structure,
    "f40": f40_acroform_tree,
    "f41": f41_type0_cns_euc,
    "f42": f42_type0_kscpc_euc,
    "f43": f43_optional_content,
    "f44": f44_tint_transforms,
    "f45": f45_page_labels,
    "f46": f46_metadata,
    "f47": f47_embedded_files,
    "f48": f48_font_spans,
    "f49": f49_icc_profile,
}
