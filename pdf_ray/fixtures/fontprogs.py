"""Deterministic synthetic font programs for fixtures f09-f11.

These are real (if tiny) font binaries:
- Type1: cleartext header + eexec-encrypted (r=55665) private portion with
  r=4330-encrypted charstrings (the format the reference's PostScript
  interpreter executes, src/postscript/decode.rs:1-22)
- TrueType: minimal sfnt with head/maxp/hhea/hmtx/cmap(format 4)/loca/glyf
  (tables the reference parses, src/font/true_type/parse.rs)
- CFF: header + Name/TopDict/String/GSubr INDEXes + CharStrings INDEX +
  Private DICT (src/font/cff/parse.rs)

The pdf_ray font layer parses all three back (widths + encodings), so the
fixtures double as font-parser round-trip tests.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

EEXEC_R = 55665
CHARSTRING_R = 4330
C1, C2 = 52845, 22719


def t1_encrypt(plain: bytes, r: int, lead: int = 4) -> bytes:
    """Type 1 font encryption (Type 1 Font Format spec §7.2).
    ``lead`` garbage bytes are prepended before encryption."""
    data = bytes(range(0x55, 0x55 + lead)) + plain
    out = bytearray()
    for p in data:
        c = p ^ (r >> 8)
        out.append(c & 0xFF)
        r = ((c + r) * C1 + C2) & 0xFFFF
    return bytes(out)


def t1_decrypt(cipher: bytes, r: int, lead: int = 4) -> bytes:
    out = bytearray()
    for c in cipher:
        out.append((c ^ (r >> 8)) & 0xFF)
        r = ((c + r) * C1 + C2) & 0xFFFF
    return bytes(out[lead:])


def _t1_number(v: int) -> bytes:
    """Type1 charstring number encoding."""
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([247 + (v >> 8), v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([251 + (v >> 8), v & 0xFF])
    return b"\xff" + struct.pack(">i", v)


def _t1_charstring(width: int) -> bytes:
    """``0 <width> hsbw endchar`` encrypted with r=4330, lenIV=4."""
    plain = _t1_number(0) + _t1_number(width) + bytes([13]) + bytes([14])
    return t1_encrypt(plain, CHARSTRING_R)


@dataclass
class Type1Program:
    data: bytes
    length1: int
    length2: int


GLYPH_WIDTHS = {".notdef": 250, "space": 278, "alpha": 540, "beta": 560, "A": 640}


def type1_program() -> Type1Program:
    clear = (
        b"%!FontType1-1.0: FixtureSerif 001.001\n"
        b"/FontName /FixtureSerif def\n"
        b"/PaintType 0 def\n"
        b"/FontType 1 def\n"
        b"/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n"
        b"/FontBBox {0 -200 1000 900} readonly def\n"
        b"/Encoding 256 array\n"
        b"0 1 255 {1 index exch /.notdef put} for\n"
        b"dup 32 /space put\n"
        b"dup 65 /alpha put\n"
        b"dup 66 /beta put\n"
        b"readonly def\n"
        b"currentdict end\n"
        b"currentfile eexec\n"
    )
    private = bytearray()
    private += (
        b"dup /Private 8 dict dup begin\n"
        b"/RD {string currentfile exch readstring pop} executeonly def\n"
        b"/ND {noaccess def} executeonly def\n"
        b"/lenIV 4 def\n"
        b"end\n"
    )
    private += f"/CharStrings {len(GLYPH_WIDTHS)} dict dup begin\n".encode()
    for name, width in GLYPH_WIDTHS.items():
        cs = _t1_charstring(width)
        private += f"/{name} {len(cs)} RD ".encode() + cs + b" ND\n"
    private += b"end\nmark currentfile closefile\n"
    encrypted = t1_encrypt(bytes(private), EEXEC_R)
    return Type1Program(
        data=clear + encrypted, length1=len(clear), length2=len(encrypted)
    )


def truetype_program() -> bytes:
    """Two glyphs (.notdef, box); cmap format 4 maps A-Z -> glyph 1;
    unitsPerEm=1000; advance widths 500 / 600."""
    units_per_em = 1000

    # glyf: empty .notdef + a square contour for glyph 1
    glyph1 = struct.pack(">hhhhh", 1, 0, 0, 600, 700)  # 1 contour, bbox
    glyph1 += struct.pack(">H", 3)  # endPtsOfContours[0] = 3 (4 points)
    glyph1 += struct.pack(">H", 0)  # instructionLength
    glyph1 += bytes([0x01, 0x01, 0x01, 0x01])  # flags: on-curve, int16 coords
    glyph1 += struct.pack(">hhhh", 0, 600, 0, -600)  # x deltas
    glyph1 += struct.pack(">hhhh", 0, 0, 700, -700)  # y deltas
    glyf = glyph1  # .notdef is empty (loca[0] == loca[1])
    loca = struct.pack(">HHH", 0, 0, len(glyph1) // 2)  # short format

    head = struct.pack(
        ">IIIIHHQQhhhhHHhhh",
        0x00010000,  # version
        0x00010000,  # fontRevision
        0,  # checkSumAdjustment
        0x5F0F3CF5,  # magicNumber
        0,  # flags
        units_per_em,
        0,  # created
        0,  # modified
        0, -200, 1000, 900,  # bbox
        0,  # macStyle
        8,  # lowestRecPPEM
        2,  # fontDirectionHint
        0,  # indexToLocFormat (short)
        0,  # glyphDataFormat
    )
    maxp = struct.pack(">IH", 0x00010000, 2) + bytes(26)
    hhea = struct.pack(
        ">IhhhHhhhhhhhhhhhH",
        0x00010000, 700, -200, 0, 1000, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 2
    )
    hmtx = struct.pack(">HhHh", 500, 0, 600, 0)

    # cmap: format 4, one segment A-Z -> glyphs starting at 1, + terminator
    end_codes = struct.pack(">HH", 0x005A, 0xFFFF)
    start_codes = struct.pack(">HH", 0x0041, 0xFFFF)
    id_deltas = struct.pack(">hh", 1 - 0x41, 1)
    id_ranges = struct.pack(">HH", 0, 0)
    fmt4_body = end_codes + b"\0\0" + start_codes + id_deltas + id_ranges
    fmt4_full = (
        struct.pack(">HHHHHHH", 4, 14 + len(fmt4_body), 0, 4, 4, 1, 0)
        + fmt4_body
    )
    cmap = struct.pack(">HHHHI", 0, 1, 3, 1, 12) + fmt4_full

    tables = {
        b"cmap": cmap,
        b"glyf": glyf,
        b"head": head,
        b"hhea": hhea,
        b"hmtx": hmtx,
        b"loca": loca,
        b"maxp": maxp,
    }
    n = len(tables)
    search_range = 16 * (2 ** (n.bit_length() - 1))
    header = struct.pack(
        ">IHHHH", 0x00010000, n, search_range, n.bit_length() - 1,
        16 * n - search_range,
    )
    offset = 12 + 16 * n
    records = b""
    body = b""
    for tag in sorted(tables):
        data = tables[tag]
        records += tag + struct.pack(">III", 0, offset, len(data))
        pad = (-len(data)) % 4
        body += data + b"\0" * pad
        offset += len(data) + pad
    return header + records + body


def _cff_index(items: list[bytes]) -> bytes:
    if not items:
        return struct.pack(">H", 0)
    offsets = [1]
    for it in items:
        offsets.append(offsets[-1] + len(it))
    off_size = 1 if offsets[-1] < 256 else (2 if offsets[-1] < 65536 else 3)
    out = struct.pack(">HB", len(items), off_size)
    for o in offsets:
        out += o.to_bytes(off_size, "big")
    return out + b"".join(items)


def _cff_dict_int(v: int) -> bytes:
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([247 + (v >> 8), v & 0xFF])
    return b"\x1d" + struct.pack(">i", v)


def _t2_charstring(width_delta: int) -> bytes:
    """Type2: leading width (delta from nominalWidthX) then endchar."""
    return _t1_number(width_delta) + bytes([14])


def cff_program() -> bytes:
    """CFF with 2 glyphs; defaultWidthX=500, nominalWidthX=0; glyph 1 has
    explicit width 550."""
    header = bytes([1, 0, 4, 1])
    name_index = _cff_index([b"FixtureCFF"])
    charstrings = [
        bytes([14]),  # .notdef: no width -> defaultWidthX
        _t2_charstring(550),  # glyph 1: width 550
    ]
    cs_index = _cff_index(charstrings)
    private_dict = (
        _cff_dict_int(500) + bytes([20])  # defaultWidthX
        + _cff_dict_int(0) + bytes([21])  # nominalWidthX
    )
    # iterate: top dict references offsets of charstrings/private
    string_index = _cff_index([])
    gsubr_index = _cff_index([])
    top = b""
    for _ in range(3):  # fixed point for offset widths
        prefix_len = (
            len(header) + len(name_index) + len(_cff_index([top]))
            + len(string_index) + len(gsubr_index)
        )
        cs_off = prefix_len
        priv_off = cs_off + len(cs_index)
        top = (
            _cff_dict_int(cs_off) + bytes([17])  # CharStrings
            + _cff_dict_int(len(private_dict)) + _cff_dict_int(priv_off)
            + bytes([18])  # Private [size offset]
        )
    top_index = _cff_index([top])
    return (
        header + name_index + top_index + string_index + gsubr_index
        + cs_index + private_dict
    )
