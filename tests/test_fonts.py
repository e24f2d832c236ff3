"""Font-layer round trip: the synthetic Type1/TrueType/CFF programs from
the fixture builder are parsed back for widths + encodings; ToUnicode
CMaps are interpreted (a reference gap we exceed — src/font/cmap.rs:5-10)."""

from pdf_ray.fixtures.fontprogs import (
    GLYPH_WIDTHS,
    cff_program,
    t1_decrypt,
    t1_encrypt,
    truetype_program,
    type1_program,
)
from pdf_ray.pdfcore.fonts.cff import parse_cff
from pdf_ray.pdfcore.fonts.cmap import parse_tounicode
from pdf_ray.pdfcore.fonts.encodings import apply_differences
from pdf_ray.pdfcore.fonts.truetype import parse_truetype
from pdf_ray.pdfcore.fonts.type1 import parse_type1


def test_t1_crypt_roundtrip():
    for r in (55665, 4330):
        data = b"some charstring payload \x00\xff\x80"
        assert t1_decrypt(t1_encrypt(data, r), r) == data


def test_type1_program_widths_and_encoding():
    prog = type1_program()
    font = parse_type1(prog.data)
    assert font.widths == {k: float(v) for k, v in GLYPH_WIDTHS.items()}
    assert font.encoding[32] == "space"
    assert font.encoding[65] == "alpha"
    assert font.encoding[66] == "beta"
    assert font.width(65) == 540.0


def test_truetype_program_cmap_and_widths():
    font = parse_truetype(truetype_program())
    assert font.units_per_em == 1000
    # format-4 idDelta: A-Z map to consecutive glyph ids 1..26
    assert font.cmap[ord("A")] == 1
    assert font.cmap[ord("Z")] == 26
    assert ord("a") not in font.cmap
    assert font.advance(0) == 500
    assert font.advance(1) == 600
    assert font.width(ord("A")) == 600.0
    assert font.width(ord("Z")) == 600.0  # past hmtx -> last advance repeats


def test_cff_program_widths():
    font = parse_cff(cff_program())
    assert font.widths_by_gid == [500.0, 550.0]  # default / explicit


def test_differences():
    enc = apply_differences({65: "A"}, [65, "alpha", "beta", 97, "gamma"])
    assert enc[65] == "alpha"
    assert enc[66] == "beta"
    assert enc[97] == "gamma"


def test_tounicode_parse_and_map():
    data = (
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0001> <0041>\n<0002> <00480069>\nendbfchar\n"
        b"2 beginbfrange\n<0041> <005A> <0061>\n"
        b"<0100> <0102> [<0058> <0059> <005A>]\nendbfrange\n"
    )
    cm = parse_tounicode(data)
    assert cm.code_bytes == 2
    assert cm.map_code(1) == "A"
    assert cm.map_code(2) == "Hi"  # multi-codepoint bfchar
    assert cm.map_code(0x41) == "a"  # range offset maps A->a
    assert cm.map_code(0x5A) == "z"
    assert cm.map_code(0x101) == "Y"  # array-form bfrange
    assert cm.map_code(0x999) is None


def test_unicode_extraction_of_type0_fixture():
    from pdf_ray.fixtures.corpus import FIXTURES
    from pdf_ray.pdfcore.interp import extract_spans

    pdf, golden = FIXTURES["f12"]()
    raw, _ = extract_spans(pdf)
    assert raw == golden  # parity text stays "\x00H\x00i"
    uni, _ = extract_spans(pdf, apply_tounicode=True)
    assert uni == [("text", "Hi", None, 0)]


def test_unicode_extraction_is_identity_for_simple_latin():
    from pdf_ray.fixtures.corpus import FIXTURES
    from pdf_ray.pdfcore.interp import extract_spans

    for name in ("f01", "f04", "f09", "f10", "f11"):
        pdf, golden = FIXTURES[name]()
        uni, _ = extract_spans(pdf, apply_tounicode=True)
        assert uni == golden, name


def test_compute_positions_advances_tm():
    from pdf_ray.fixtures.builder import simple_page_pdf
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.interp import Interpreter

    pdf = simple_page_pdf(b"BT /F1 10 Tf 0 0 Td (AAA) Tj ET")
    doc = Document(pdf)
    interp = Interpreter(doc, compute_positions=True, font_cache={})
    interp.run()
    # F1 is unembedded Helvetica -> AFM advance for 'A' is 0.667 em:
    # 10pt x 3 chars x 0.667 = 20.01 units of x-advance,
    # measured via ET having reset... use a fresh run capturing before ET
    pdf2 = simple_page_pdf(b"BT /F1 10 Tf 0 0 Td (AAA) Tj")
    doc2 = Document(pdf2)
    i2 = Interpreter(doc2, compute_positions=True, font_cache={})
    i2.run()
    assert abs(i2.ts.tm[4] - 20.01) < 1e-9


def test_font_cache_is_reused():
    from pdf_ray.fixtures.corpus import FIXTURES
    from pdf_ray.pdfcore.interp import extract_spans

    cache = {}
    # f12's ToUnicode stream is parsed through the cache
    pdf, _ = FIXTURES["f12"]()
    extract_spans(pdf, font_cache=cache, apply_tounicode=True)
    n1 = len(cache)
    assert n1 >= 1
    extract_spans(pdf, font_cache=cache, apply_tounicode=True)
    assert len(cache) == n1  # same stream -> cache hit, no new entries


def test_cid_cmap_parse_and_widths():
    from pdf_ray.pdfcore.fonts.cmap import parse_cid_cmap

    data = (
        b"/CIDInit /ProcSet findresource begin\nbegincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 begincidchar\n<0020> 1\n<0041> 34\nendcidchar\n"
        b"1 begincidrange\n<0061> <007A> 100\nendcidrange\n"
        b"endcmap\nend"
    )
    cm = parse_cid_cmap(data)
    assert cm.code_bytes == 2
    assert cm.map_code(0x20) == 1
    assert cm.map_code(0x41) == 34
    assert cm.map_code(0x61) == 100
    assert cm.map_code(0x7A) == 125
    assert cm.map_code(0x7B) is None


def test_predefined_cmap_registry():
    import pytest

    from pdf_ray.pdfcore.fonts.cmap import predefined_cid_cmap
    from pdf_ray.pdfcore.objects import PdfParseError

    assert predefined_cid_cmap("Identity-H") == 2
    assert predefined_cid_cmap("UniJIS-UCS2-H") == 2
    assert predefined_cid_cmap("UniGB-UTF16-V") == 2
    assert predefined_cid_cmap("UniKS-UCS2-V") == 2
    # table-backed legacy encodings are row-level errors
    with pytest.raises(PdfParseError):
        predefined_cid_cmap("90ms-RKSJ-H")
    with pytest.raises(PdfParseError):
        predefined_cid_cmap("GBK-EUC-H")
    with pytest.raises(PdfParseError):
        predefined_cid_cmap("NoSuchCMap")


def test_f27_predefined_ucs2_unicode_enrichment():
    from pdf_ray.fixtures.corpus import f27_type0_predefined_ucs2
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.interp import Interpreter

    pdf, golden = f27_type0_predefined_ucs2()
    doc = Document(pdf)
    interp = Interpreter(doc)
    interp.run()
    assert [(k, t, r) for k, t, r in interp.spans] == [
        (k, t, r) for k, t, r, _ in golden
    ]
    # unicode variant: predefined UCS2 code space, no ToUnicode stream
    doc2 = Document(pdf)
    interp2 = Interpreter(doc2, apply_tounicode=True)
    interp2.run()
    assert interp2.spans[0][1] == "Hi中"


def test_cmap_format12():
    import struct

    from pdf_ray.pdfcore.fonts.truetype import _parse_cmap_subtable

    groups = [(0x41, 0x43, 100), (0x1F600, 0x1F602, 500)]
    sub = struct.pack(">HHIII", 12, 0, 16 + 12 * len(groups), 0, len(groups))
    for s, e, g in groups:
        sub += struct.pack(">III", s, e, g)
    t = _parse_cmap_subtable(sub, 0)
    assert t[0x41] == 100 and t[0x43] == 102
    assert t[0x1F600] == 500 and t[0x1F602] == 502  # supplementary plane


def test_cmap_format2():
    import struct

    from pdf_ray.pdfcore.fonts.truetype import _parse_cmap_subtable

    # layout: header(6) + keys(512) + subHeader0(8) + subHeader1(8) + glyphs
    keys = [0] * 256
    keys[0x81] = 8  # high byte 0x81 -> subHeader 1
    sh_base = 6 + 512
    glyphs_off = sh_base + 16
    # subHeader0: single-byte codes 'A'..'B' -> glyphs[0..1]
    sh0_range = glyphs_off - (sh_base + 6)
    sh0 = struct.pack(">HHhH", 0x41, 2, 0, sh0_range)
    # subHeader1: codes 0x8140..0x8142 -> glyphs[2..4] with idDelta 5
    sh1_range = (glyphs_off + 4) - (sh_base + 8 + 6)
    sh1 = struct.pack(">HHhH", 0x40, 3, 5, sh1_range)
    glyphs = struct.pack(">5H", 10, 11, 20, 21, 22)
    sub = (
        struct.pack(">HHH", 2, 6 + 512 + 16 + len(glyphs), 0)
        + struct.pack(">256H", *keys)
        + sh0
        + sh1
        + glyphs
    )
    t = _parse_cmap_subtable(sub, 0)
    assert t[0x41] == 10 and t[0x42] == 11
    assert t[0x8140] == 25 and t[0x8142] == 27  # (gid + idDelta) & 0xFFFF


def test_base14_family_and_widths():
    from pdf_ray.pdfcore.fonts.base14 import base14_family, base14_width_fn

    assert base14_family("Courier-BoldOblique") == "Courier"
    assert base14_family("ABCDEF+Helvetica") == "Helvetica"
    assert base14_family("ArialMT") == "Helvetica"
    assert base14_family("TimesNewRomanPS-BoldItalicMT") == "Times"
    assert base14_family("NotAFont") is None
    w = base14_width_fn("Courier")
    assert w(ord("W")) == 600.0 and w(ord(" ")) == 600.0  # monospaced exact
    hw = base14_width_fn("Helvetica")
    assert hw(ord(" ")) == 278.0
    assert base14_width_fn("SomeCustomFont") is None


def test_base14_used_for_unembedded_font(ray_session):
    from pdf_ray.fixtures.builder import simple_page_pdf
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.fonts import width_function

    pdf = simple_page_pdf(b"BT /F1 12 Tf 72 720 Td (mono) Tj ET")
    doc = Document(pdf)
    fonts = doc.resolve(doc.resolve(doc.pages[0].resources)["Font"])
    wf = width_function(doc, doc.resolve_dict(fonts["F1"]))
    # simple_page_pdf's F1 is Helvetica -> space = 0.278 text units
    assert wf(0x20) == 0.278


def test_base14_afm_widths():
    """Spot-check the embedded Core-14 ASCII advances against widely
    published AFM values (pinned independently of the table literals)."""
    from pdf_ray.pdfcore.fonts.base14 import base14_width_fn

    helv = base14_width_fn("Helvetica")
    assert helv(ord(" ")) == 278
    assert helv(ord("a")) == 556
    assert helv(ord("i")) == 222
    assert helv(ord("A")) == 667
    assert helv(ord("W")) == 944
    assert helv(ord("@")) == 1015
    assert helv(ord("0")) == 556

    hb = base14_width_fn("Helvetica-Bold")
    assert hb(ord("a")) == 556
    assert hb(ord("b")) == 611
    assert hb(ord("i")) == 278

    tr = base14_width_fn("Times-Roman")
    assert tr(ord(" ")) == 250
    assert tr(ord("a")) == 444
    assert tr(ord("m")) == 778
    assert tr(ord("A")) == 722
    assert tr(ord("M")) == 889
    assert tr(ord("0")) == 500

    tb = base14_width_fn("Times-Bold")
    assert tb(ord("M")) == 944
    assert tb(ord("W")) == 1000

    ti = base14_width_fn("Times-Italic")
    assert ti(ord("A")) == 611
    assert ti(ord("f")) == 278

    # aliases resolve to face tables; subset prefixes strip
    assert base14_width_fn("ArialMT")(ord("a")) == 556
    assert base14_width_fn("ABCDEF+Helvetica-Bold")(ord("b")) == 611
    # oblique shares the upright metrics (true of the real AFMs)
    assert base14_width_fn("Helvetica-Oblique")(ord("a")) == 556
    # Courier stays exact-monospace; Symbol stays family-default
    assert base14_width_fn("Courier-Bold")(ord("W")) == 600
    assert base14_width_fn("Symbol")(0x61) == 500
    # outside ASCII falls back to the family default
    assert helv(0xE9) == 556


def test_predefined_legacy_cmap_codecs():
    """Legacy CJK CMap names resolve to the matching national-encoding
    codec; decode is exact for each family's canonical sample."""
    import pytest

    from pdf_ray.pdfcore.fonts.cmap import (
        decode_legacy_bytes,
        predefined_cmap_info,
    )
    from pdf_ray.pdfcore.objects import PdfParseError

    assert predefined_cmap_info("Identity-H") == ("identity", None)
    assert predefined_cmap_info("UniJIS-UCS2-H") == ("ucs2", None)

    cases = [
        # (cmap name, bytes, expected unicode)
        ("90ms-RKSJ-H", "日本語".encode("cp932"), "日本語"),
        ("EUC-V", "漢字".encode("euc_jp"), "漢字"),
        ("ETen-B5-H", "中文".encode("big5"), "中文"),
        ("HKscs-B5-H", "中文".encode("big5hkscs"), "中文"),
        ("GBK-EUC-H", "中文".encode("gbk"), "中文"),
        ("GBK2K-H", "中文".encode("gb18030"), "中文"),
        ("KSCms-UHC-H", "한국어".encode("cp949"), "한국어"),
        ("KSC-EUC-H", "한국".encode("euc_kr"), "한국"),
        # H = raw JIS X 0208 codes (framed as ISO-2022-JP internally)
        ("H", "漢字".encode("iso2022_jp")[3:-3], "漢字"),
    ]
    for name, raw, want in cases:
        kind, codec = predefined_cmap_info(name)
        assert kind == "legacy", name
        assert decode_legacy_bytes(codec, raw) == want, name

    # mixed ASCII + multibyte segments correctly
    _, codec = predefined_cmap_info("90ms-RKSJ-H")
    assert decode_legacy_bytes(codec, b"AB" + "語".encode("cp932")) == "AB語"
    # undecodable bytes degrade to U+FFFD, never raise
    assert "�" in decode_legacy_bytes("cp932", b"\x85\x40\xff\xff")

    # CNS-EUC decodes through glibc iconv's CNS 11643 table (gated on
    # libc support — present on this platform); KSCpc-EUC via its
    # KS X 1001 / euc_kr double-byte subset
    from pdf_ray.pdfcore.fonts.cmap import _euc_tw_available

    assert _euc_tw_available()
    kind, codec = predefined_cmap_info("CNS-EUC-H")
    assert (kind, codec) == ("legacy", "euc_tw")
    assert decode_legacy_bytes(codec, b"AB\xc4\xe3\xc5\xc6") == "AB中文"
    # plane 2 via SS2 (4-byte 8E A2 xx xx sequences) decodes too
    import subprocess

    p2 = subprocess.run(
        ["iconv", "-t", "EUC-TW", "-f", "UTF-8"],
        input="乂".encode(),
        capture_output=True,
    ).stdout
    if p2.startswith(b"\x8e"):  # only assert when iconv picked plane 2+
        assert decode_legacy_bytes("euc_tw", p2) == "乂"
    # invalid sequences degrade to U+FFFD, never raise
    assert "�" in decode_legacy_bytes("euc_tw", b"A\xc4\xffB")

    kind, codec = predefined_cmap_info("KSCpc-EUC-V")
    assert (kind, codec) == ("legacy", "kscpc_euc")
    assert decode_legacy_bytes(codec, b"AB\xc7\xd1\xb1\xb9") == "AB한국"
    # Mac-extension lead bytes (0x81-0xA0) consume their trail byte and
    # degrade to one U+FFFD per 2-byte code
    assert decode_legacy_bytes("kscpc_euc", b"\x85\x41A") == "�A"

    with pytest.raises(PdfParseError):
        predefined_cmap_info("NotACMap-H")


def test_cff_charset_and_encoding_mapping():
    """code -> GID resolution through the CFF's own charset + Encoding
    tables (formats 0/1, supplements, Standard default)."""
    from pdf_ray.pdfcore.fonts.cff import (
        CffFont,
        _parse_charset,
        _parse_encoding,
    )

    pad = b"\x00\x00\x00"  # real offsets are > 2 (0-2 are predefined)

    # charset format 0: GIDs 1..3 -> SIDs 5, 9, 100
    cs = bytes([0]) + (5).to_bytes(2, "big") + (9).to_bytes(2, "big") + (
        100
    ).to_bytes(2, "big")
    assert _parse_charset(cs, 0, 4) == [0, 1, 2, 3]  # predefined: identity
    assert _parse_charset(pad + cs, 3, 4) == [0, 5, 9, 100]

    # charset format 1: range first=20 nLeft=2 -> SIDs 20,21,22
    cs1 = bytes([1, 0, 20, 2])
    assert _parse_charset(pad + cs1, 3, 4) == [0, 20, 21, 22]

    # encoding format 0: codes 65, 66 -> GIDs 1, 2
    enc0 = bytes([0, 2, 65, 66])
    sid_by_gid = [0, 1, 2]
    m = _parse_encoding(pad + enc0, 3, sid_by_gid)
    assert m == {65: 1, 66: 2}

    # encoding format 1 with supplement (0x80 flag): range 48..50 ->
    # GIDs 1..3; supplement maps code 200 to the glyph with SID 2
    enc1 = bytes([0x81, 1, 48, 2, 1, 200]) + (2).to_bytes(2, "big")
    m = _parse_encoding(pad + enc1, 3, [0, 7, 2, 9])
    assert m[48] == 1 and m[49] == 2 and m[50] == 3 and m[200] == 2

    # Standard encoding default: code 'A' (65) -> SID 34 -> that GID
    sid_by_gid = [0] + list(range(1, 96))  # identity-ish charset
    m = _parse_encoding(b"", 0, sid_by_gid)
    assert m[32] == 1      # space = SID 1
    assert m[65] == 34     # A = SID 34

    f = CffFont([100.0, 200.0, 300.0], {65: 2})
    assert f.width_for_code(65) == 300.0
    assert f.gid_for_code(99) == 0  # unmapped -> .notdef
