"""JBIG2 huffman-coded support (ITU-T T.88 Annex B + 7.4.3.1.7).

The reference todo!()s JBIG2Decode entirely (src/filter/mod.rs:52); this
extends the from-scratch decoder in jbig2.py with the huffman-coded
symbol dictionary / text region variants (SDHUFF/SBHUFF) some fax-era
encoders emit instead of arithmetic coding:

- MSB-first bit reader with byte alignment (B.4 reads are bit-packed
  between byte-aligned collective bitmaps),
- Annex B huffman "table line" machinery: canonical prefix-code
  assignment (B.3) over (PREFLEN, RANGELEN, RANGELOW) lines with
  lower/upper 32-bit range lines and the out-of-band symbol,
- the fifteen STANDARD tables B.1-B.15. Transcribed from the public
  spec; every table is machine-validated at import: value ranges chain
  contiguously (line[i].low + 2^rangelen == line[i+1].low) and the
  prefix lengths satisfy Kraft (sum 2^-len <= 1; all except B.10 are
  exactly complete). Code assignment order is [regular lines by
  ascending RANGELOW, lower, upper, OOB], matching the spec's listed
  code columns (e.g. B.3: -256..-1 -> 0xFE, lower -> 0xFF).
- custom table segments (segment type 53, B.2), and
- the run-code symbol ID code table of huffman text regions
  (7.4.3.1.7): 35 4-bit run-code lengths, run-codes 0-31 literal /
  32-34 repeat coding over per-symbol code lengths, then a canonical
  code over the symbol indices.
"""

from __future__ import annotations

from .objects import PdfParseError

OOB = object()  # distinct sentinel; jbig2.py has its own for the IAx path


class BitReader:
    """MSB-first bit reader with byte alignment over a bytes payload."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def bit(self) -> int:
        i = self.bitpos
        byte = i >> 3
        if byte >= len(self.data):
            raise PdfParseError("JBIG2 huffman: bit stream exhausted")
        self.bitpos = i + 1
        return (self.data[byte] >> (7 - (i & 7))) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def byte_pos(self) -> int:
        """Current byte offset; only meaningful when byte-aligned."""
        return (self.bitpos + 7) >> 3

    def seek_byte(self, pos: int) -> None:
        self.bitpos = pos * 8


# line kinds
_NORM, _LOWER, _UPPER, _OOB = 0, 1, 2, 3


class HuffTable:
    """One Annex B huffman table. ``lines`` is a list of
    (preflen, rangelen, rangelow, kind) in assignment order; PREFLEN=0
    lines carry no code (B.3)."""

    __slots__ = ("lookup",)

    def __init__(self, lines: list[tuple[int, int, int, int]]):
        # canonical assignment (B.3): shorter codes first; among equal
        # lengths, table order
        kraft = 0
        self.lookup: dict[tuple[int, int], tuple[int, int, int]] = {}
        code = 0
        for length in range(1, 33):
            code <<= 1
            for preflen, rangelen, rangelow, kind in lines:
                if preflen != length:
                    continue
                self.lookup[(length, code)] = (rangelen, rangelow, kind)
                code += 1
                kraft += 1 << (32 - length)
        if kraft > 1 << 32:
            raise PdfParseError("JBIG2 huffman table overfull (Kraft > 1)")

    def decode(self, r: BitReader):
        """Decode one value; returns an int or the OOB sentinel."""
        length, code = 0, 0
        lookup = self.lookup
        for _ in range(32):
            code = (code << 1) | r.bit()
            length += 1
            hit = lookup.get((length, code))
            if hit is None:
                continue
            rangelen, rangelow, kind = hit
            if kind == _OOB:
                return OOB
            if kind == _LOWER:
                return rangelow - r.bits(32)
            if kind == _UPPER:
                return rangelow + r.bits(32)
            return rangelow + r.bits(rangelen)
        raise PdfParseError("JBIG2 huffman: no code matched in 32 bits")


def _table(regular, lower=None, upper=None, oob=None) -> list[tuple]:
    lines = [(p, r, lo, _NORM) for p, r, lo in regular]
    if lower is not None:
        lines.append((lower[0], 32, lower[1], _LOWER))
    if upper is not None:
        lines.append((upper[0], 32, upper[1], _UPPER))
    if oob is not None:
        lines.append((oob, 0, 0, _OOB))
    # structural validation: regular ranges must chain contiguously
    for (p1, r1, lo1), (p2, r2, lo2) in zip(regular, regular[1:]):
        if lo1 + (1 << r1) != lo2:
            raise AssertionError(f"JBIG2 std table discontinuity at {lo2}")
    if lower is not None and lower[1] != regular[0][2] - 1:
        raise AssertionError("JBIG2 std table lower-range mismatch")
    if upper is not None:
        last = regular[-1]
        if upper[1] != last[2] + (1 << last[1]):
            raise AssertionError("JBIG2 std table upper-range mismatch")
    return lines


# T.88 Annex B standard tables, lines as (PREFLEN, RANGELEN, RANGELOW).
_STANDARD_LINES: dict[int, list[tuple]] = {
    1: _table([(1, 4, 0), (2, 8, 16), (3, 16, 272)], upper=(3, 65808)),
    2: _table(
        [(1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3), (5, 6, 11)],
        upper=(6, 75), oob=6,
    ),
    3: _table(
        [(8, 8, -256), (1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3),
         (5, 6, 11)],
        lower=(8, -257), upper=(7, 75), oob=6,
    ),
    4: _table(
        [(1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4), (5, 6, 12)],
        upper=(5, 76),
    ),
    5: _table(
        [(7, 8, -255), (1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4),
         (5, 6, 12)],
        lower=(7, -256), upper=(6, 76),
    ),
    6: _table(
        [(5, 10, -2048), (4, 9, -1024), (4, 8, -512), (4, 7, -256),
         (5, 6, -128), (5, 5, -64), (4, 5, -32), (2, 7, 0), (3, 7, 128),
         (3, 8, 256), (4, 9, 512), (4, 10, 1024)],
        lower=(6, -2049), upper=(6, 2048),
    ),
    7: _table(
        [(4, 9, -1024), (3, 8, -512), (4, 7, -256), (5, 6, -128),
         (5, 5, -64), (4, 5, -32), (4, 5, 0), (5, 5, 32), (5, 6, 64),
         (4, 7, 128), (3, 8, 256), (3, 9, 512), (3, 10, 1024)],
        lower=(5, -1025), upper=(5, 2048),
    ),
    8: _table(
        [(8, 3, -15), (9, 1, -7), (8, 1, -5), (9, 0, -3), (7, 0, -2),
         (4, 0, -1), (2, 1, 0), (5, 0, 2), (6, 0, 3), (3, 4, 4),
         (6, 1, 20), (4, 4, 22), (4, 5, 38), (5, 6, 70), (5, 7, 134),
         (6, 7, 262), (7, 8, 390), (6, 10, 646)],
        lower=(9, -16), upper=(9, 1670), oob=2,
    ),
    9: _table(
        [(8, 4, -31), (9, 2, -15), (8, 2, -11), (9, 1, -7), (7, 1, -5),
         (4, 1, -3), (3, 1, -1), (3, 1, 1), (5, 1, 3), (6, 1, 5),
         (3, 5, 7), (6, 2, 39), (4, 5, 43), (4, 6, 75), (5, 7, 139),
         (5, 8, 267), (6, 8, 523), (7, 9, 779), (6, 11, 1291)],
        lower=(9, -32), upper=(9, 3339), oob=2,
    ),
    10: _table(
        [(7, 4, -21), (8, 0, -5), (7, 0, -4), (5, 0, -3), (2, 2, -2),
         (5, 0, 2), (6, 0, 3), (7, 0, 4), (8, 0, 5), (2, 6, 6),
         (5, 5, 70), (6, 5, 102), (7, 6, 134), (8, 7, 198),
         (6, 10, 326)],
        lower=(7, -22), upper=(7, 1350), oob=2,
    ),
    11: _table(
        [(1, 0, 1), (2, 1, 2), (4, 0, 4), (4, 1, 5), (5, 1, 7),
         (5, 2, 9), (6, 2, 13), (7, 2, 17), (7, 3, 21), (7, 4, 29),
         (7, 5, 45), (7, 6, 77)],
        upper=(7, 141),
    ),
    12: _table(
        [(1, 0, 1), (2, 0, 2), (3, 1, 3), (5, 0, 5), (5, 1, 6),
         (6, 1, 8), (7, 0, 10), (7, 1, 11), (7, 2, 13), (7, 3, 17),
         (7, 4, 25), (8, 5, 41)],
        upper=(8, 73),
    ),
    13: _table(
        [(1, 0, 1), (3, 0, 2), (4, 0, 3), (5, 0, 4), (4, 1, 5),
         (3, 3, 7), (6, 1, 15), (6, 2, 17), (6, 3, 21), (6, 4, 29),
         (6, 5, 45), (7, 6, 77)],
        upper=(7, 141),
    ),
    14: _table(
        [(3, 0, -2), (3, 0, -1), (1, 0, 0), (3, 0, 1), (3, 0, 2)],
    ),
    15: _table(
        [(7, 4, -24), (6, 2, -8), (5, 1, -4), (4, 0, -2), (3, 0, -1),
         (1, 0, 0), (3, 0, 1), (4, 0, 2), (5, 1, 3), (6, 2, 5),
         (7, 4, 9)],
        lower=(7, -25), upper=(7, 25),
    ),
}

_STANDARD_CACHE: dict[int, HuffTable] = {}


def standard_table(n: int) -> HuffTable:
    t = _STANDARD_CACHE.get(n)
    if t is None:
        lines = _STANDARD_LINES.get(n)
        if lines is None:
            raise PdfParseError(f"JBIG2 unknown standard huffman table {n}")
        t = _STANDARD_CACHE[n] = HuffTable(lines)
    return t


def parse_table_segment(payload: bytes) -> HuffTable:
    return HuffTable(parse_table_lines(payload))


def parse_table_lines(payload: bytes) -> list[tuple[int, int, int, int]]:
    """Custom table segment (type 53), T.88 B.2: flags byte (HTOOB,
    HTPS, HTRS), HTLOW/HTHIGH, then bit-packed (preflen, rangelen)
    pairs covering [HTLOW, HTHIGH) plus lower/upper/OOB prefix
    lengths."""
    if len(payload) < 9:
        raise PdfParseError("JBIG2 short table segment")
    flags = payload[0]
    htoob = flags & 1
    htps = ((flags >> 1) & 7) + 1
    htrs = ((flags >> 4) & 7) + 1
    htlow = int.from_bytes(payload[1:5], "big", signed=True)
    hthigh = int.from_bytes(payload[5:9], "big", signed=True)
    if hthigh <= htlow:
        raise PdfParseError("JBIG2 table segment: empty value range")
    r = BitReader(payload, 9)
    regular: list[tuple[int, int, int, int]] = []
    cur = htlow
    while cur < hthigh:
        preflen = r.bits(htps)
        rangelen = r.bits(htrs)
        if rangelen > 32 or len(regular) > 4096:
            raise PdfParseError("JBIG2 table segment: implausible line")
        regular.append((preflen, rangelen, cur, _NORM))
        cur += 1 << rangelen
    lines = list(regular)
    lines.append((r.bits(htps), 32, htlow - 1, _LOWER))
    lines.append((r.bits(htps), 32, hthigh, _UPPER))
    if htoob:
        lines.append((r.bits(htps), 0, 0, _OOB))
    return lines


def assign_tables(selections: list[int], custom: list[HuffTable],
                  standard_for: list[tuple[int, ...]]) -> list[HuffTable]:
    """Resolve per-parameter table selections: selection k indexes the
    parameter's standard-table tuple, the final selector value means
    'next referred custom table in order' (7.4.3.1.6 / 7.4.4.1.6)."""
    out: list[HuffTable] = []
    it = iter(custom)
    for sel, stds in zip(selections, standard_for):
        if sel < len(stds):
            out.append(standard_table(stds[sel]))
        else:
            try:
                out.append(next(it))
            except StopIteration:
                raise PdfParseError(
                    "JBIG2 huffman: custom table selected but not referred"
                ) from None
    return out


def read_symbol_id_table(r: BitReader, nsyms: int) -> HuffTable:
    """7.4.3.1.7 symbol ID code table: 35 4-bit run-code lengths, then
    run-coded per-symbol code lengths, then canonical assembly over
    symbol indices. Leaves the reader byte-aligned per the spec."""
    runlines = []
    for i in range(35):
        preflen = r.bits(4)
        runlines.append((preflen, 0, i, _NORM))
    runtab = HuffTable(runlines)
    lengths: list[int] = []
    prev = 0
    while len(lengths) < nsyms:
        code = runtab.decode(r)
        if code is OOB:
            raise PdfParseError("JBIG2 symbol ID run-code OOB")
        if code < 32:
            lengths.append(code)
            prev = code
        elif code == 32:
            if not lengths:
                raise PdfParseError("JBIG2 run-code 32 with no previous")
            lengths.extend([prev] * (3 + r.bits(2)))
        elif code == 33:
            lengths.extend([0] * (3 + r.bits(3)))
        else:  # 34
            lengths.extend([0] * (11 + r.bits(7)))
    if len(lengths) != nsyms:
        raise PdfParseError("JBIG2 symbol ID length overrun")
    r.align()
    lines = [
        (ln, 0, i, _NORM) for i, ln in enumerate(lengths) if ln > 0
    ]
    if not lines:
        if nsyms != 1:
            raise PdfParseError("JBIG2 symbol ID table empty")
        # single symbol, zero-length code: decode reads no bits
        class _Only:
            def decode(self, _r):
                return 0
        return _Only()  # type: ignore[return-value]
    return HuffTable(lines)
