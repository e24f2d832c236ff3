"""JBIG2 (ITU-T T.88) embedded-stream decoder — GENERIC REGIONS.

The reference todo!()s JBIG2Decode entirely (src/filter/mod.rs:52); this
module implements the common scanned-PDF subset from scratch, the same
way ccitt.py did for CCITTFaxDecode:

- the PDF "embedded organization" segment stream (T.88 Annex D.3 /
  PDF 32000-1 §7.4.7), including a JBIG2Globals prefix,
- page information segments,
- immediate generic region segments with either
    * MMR=1 coding (T.6/G4 — delegated to the proven ccitt.py decoder), or
    * MQ arithmetic coding (T.88 Annex E) with GB templates 0-3, AT
      pixels, and TPGDON typical-prediction rows,
- SYMBOL DICTIONARIES (6.5) and TEXT REGIONS (6.4) with arithmetic
  integer decoding (Annex A IAx procedures + IAID) — the dominant mode
  real scanned PDFs use: glyph bitmaps decoded once into a dictionary,
  then placed at decoded (S, T) instance coordinates with reference-
  corner / transposed / strip semantics, per-instance composition and
  SBREFINE instance refinement (6.4.11 — a placed instance may be a
  refined, even resized, variant of its symbol),
- REFINEMENT REGION segments (6.3, GR templates 0/1, TPGRON typical
  prediction) decoded against the page as composed so far,
- PATTERN DICTIONARIES (6.7) and HALFTONE REGIONS (6.6): Gray-coded
  bitplanes (shared-MQ or bit-continuous MMR stacks, C.5; ENABLESKIP
  cell masking) select per-cell patterns stamped on the (skewable
  8.8 fixed-point) halftone grid,
- region composition onto the page bitmap (OR/AND/XOR/XNOR/REPLACE).

HUFFMAN-coded variants (SDHUFF symbol dictionaries with collective
bitmaps — uncompressed or MMR — and SBHUFF text regions incl. the
run-code symbol ID table, standard tables B.1-B.15 and custom table
segments) are implemented in jbig2_huffman.py and dispatched from the
same segment walker. Refinement-AGGREGATE symbol coding covers both the
single-instance case (6.5.8.2 — new symbols as refinements of
dictionary symbols, shared GR stats) and REFAGGNINST > 1 (a nested
text region over the dictionary pool, 6.5.8.2.2, contexts retained
across aggregates); only SDHUFF+SDREFAGG raises PdfParseError
(row-level error downstream, the documented containment model).

The MQ-coder state table is transcribed from T.88 Table E.1 (the same
public table reproduced in every JBIG2/JPEG2000 implementation); it is
validated by the encoder/decoder roundtrip suite in tests/test_jbig2.py
plus structural checks, and the MMR=1 path is pixel-golden against the
independently-tested CCITT decoder.

Output convention: JBIG2's 1 = black is mapped to packed 1-bit
DeviceGray rows with 0 = black (bit-inverted), matching what the other
PDF 1-bit image paths produce (see images.py).
"""

from __future__ import annotations

import numpy as np

from .objects import PdfParseError

# T.88 Table E.1: (Qe, NMPS, NLPS, SWITCH)
QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """T.88 Annex E arithmetic decoder (software conventions, E.3)."""

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        d, bp = self.data, self.bp
        b = d[bp] if bp < len(d) else 0xFF
        if b == 0xFF:
            b1 = d[bp + 1] if bp + 1 < len(d) else 0xFF
            if b1 > 0x8F:  # marker: feed 1-bits forever
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = d[self.bp] if self.bp < len(d) else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, cx: int, idx, mps) -> int:
        """Decode one bit in context ``cx`` (state arrays idx/mps —
        any int-indexable mutable sequence; bytearray is fastest)."""
        i = idx[cx]
        qe, nmps, nlps, switch = QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS decoding path (with conditional exchange)
            if self.a < qe:
                d = mps[cx]
                idx[cx] = nmps
            else:
                d = 1 - mps[cx]
                if switch:
                    mps[cx] = 1 - mps[cx]
                idx[cx] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return int(mps[cx])
            if self.a < qe:
                d = 1 - mps[cx]
                if switch:
                    mps[cx] = 1 - mps[cx]
                idx[cx] = nlps
            else:
                d = mps[cx]
                idx[cx] = nmps
        # renormalize
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return int(d)


# GB templates (T.88 6.2.5.3, figures 4-7): fixed pixels; AT pixels are
# appended then the full list is sorted by (y, x) and the context is
# assembled MSB-first in that order. The TPGDON pseudo-pixel contexts
# (6.2.5.7) below are defined for exactly this assembly.
GB_TEMPLATES = {
    0: [(-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1), (1, -1),
        (2, -1), (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
    1: [(-1, -2), (0, -2), (1, -2), (2, -2), (-2, -1), (-1, -1), (0, -1),
        (1, -1), (2, -1), (-3, 0), (-2, 0), (-1, 0)],
    2: [(-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1), (1, -1),
        (-2, 0), (-1, 0)],
    3: [(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (-4, 0), (-3, 0),
        (-2, 0), (-1, 0)],
}
GB_AT_COUNT = {0: 4, 1: 1, 2: 1, 3: 1}
GB_AT_NOMINAL = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}
TPGD_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _check_at(at: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """AT pixels must reference positions strictly before the current
    pixel in raster order (dy < 0, or dy == 0 with dx < 0) — corrupted
    values pointing at undecoded rows must fail the row, not crash."""
    for dx, dy in at:
        if dy > 0 or (dy == 0 and dx >= 0):
            raise PdfParseError(f"JBIG2 invalid AT pixel ({dx}, {dy})")
    return at

# Decode budget: the arithmetic decoders are serial Python loops, so a
# corrupt stream that parses into a huge "plausible" region must not burn
# minutes of worker CPU before failing. 16M pixels covers an A4 scan at
# 300 dpi; anything larger fails the row.
MAX_REGION_PIXELS = 16_000_000


def decode_generic_region(
    data: bytes,
    w: int,
    h: int,
    template: int,
    at: list[tuple[int, int]],
    tpgdon: bool,
) -> np.ndarray:
    """MQ-coded generic region decoding procedure (T.88 6.2.5.7) ->
    (h, w) uint8 bitmap, 1 = black. Correctness-first scalar loop: the
    arithmetic coder is inherently serial per pixel; at pipeline level
    the parallelism axis is images-per-actor, not pixels."""
    if template not in GB_TEMPLATES:
        raise PdfParseError(f"JBIG2 bad GB template {template}")
    nbits = len(GB_TEMPLATES[template]) + len(at)
    # bytearrays, not numpy: per-element numpy indexing returns numpy
    # scalars with real overhead in this serial per-pixel loop
    idx = bytearray(1 << nbits)
    mps = bytearray(1 << nbits)
    mq = MQDecoder(data)
    return _decode_bitmap(mq, idx, mps, w, h, template, at, tpgdon)


def _decode_bitmap(
    mq: MQDecoder,
    idx: bytearray,
    mps: bytearray,
    w: int,
    h: int,
    template: int,
    at: list[tuple[int, int]],
    tpgdon: bool,
    skip=None,
) -> np.ndarray:
    """Core generic-region bitmap decode over a CALLER-owned MQ decoder
    and GB context state — the symbol dictionary decodes every symbol
    bitmap through one shared decoder/stats set (T.88 6.5.8.2.1).
    ``skip`` (USESKIP, 6.2.5.7): pixels flagged in the skip bitmap are
    not coded and decode as 0 (they still feed neighbour contexts)."""
    tmpl = sorted(GB_TEMPLATES[template] + list(at), key=lambda p: (p[1], p[0]))
    skip_rows = (
        None if skip is None else [[int(v) for v in r] for r in skip]
    )
    # rows as plain Python int lists: per-pixel numpy scalar indexing is
    # ~10x slower than list indexing in this inherently-serial loop
    zero_row = [0] * w
    rows: list[list[int]] = []
    ltp = 0
    for y in range(h):
        if tpgdon:
            if mq.decode(TPGD_CTX[template], idx, mps):
                ltp ^= 1
            if ltp:
                rows.append(list(rows[y - 1]) if y > 0 else [0] * w)
                continue
        r2 = rows[y - 2] if y >= 2 else zero_row
        r1 = rows[y - 1] if y >= 1 else zero_row
        row = [0] * w
        rows.append(row)
        srow = skip_rows[y] if skip_rows is not None else None
        for x in range(w):
            if srow is not None and srow[x]:
                continue  # skipped pixel stays 0, nothing coded
            ctx = 0
            for dx, dy in tmpl:
                xx = x + dx
                if 0 <= xx < w:
                    if dy == 0:
                        ctx = (ctx << 1) | row[xx]
                    elif dy == -1:
                        ctx = (ctx << 1) | r1[xx]
                    elif dy == -2:
                        ctx = (ctx << 1) | r2[xx]
                    else:  # exotic AT row (dy < -2)
                        yy = y + dy
                        ctx = (ctx << 1) | (rows[yy][xx] if yy >= 0 else 0)
                else:
                    ctx <<= 1
            row[x] = mq.decode(ctx, idx, mps)
    return np.array(rows, np.uint8).reshape(h, w)


OOB = object()  # out-of-band marker from the IAx integer decoder


class IntDecoder:
    """T.88 Annex A integer arithmetic decoding procedure: one instance
    per IAx statistic set (IADH, IADW, IADT, ...), 512 contexts keyed by
    the PREV bit-history tree."""

    __slots__ = ("idx", "mps")

    def __init__(self):
        self.idx = bytearray(512)
        self.mps = bytearray(512)

    def decode(self, mq: MQDecoder):
        prev = 1

        def bit() -> int:
            nonlocal prev
            b = mq.decode(prev, self.idx, self.mps)
            prev = (
                (prev << 1) | b
                if prev < 256
                else ((((prev << 1) | b) & 511) | 256)
            )
            return b

        def bits(n: int) -> int:
            v = 0
            for _ in range(n):
                v = (v << 1) | bit()
            return v

        s = bit()
        if not bit():
            v = bits(2)
        elif not bit():
            v = bits(4) + 4
        elif not bit():
            v = bits(6) + 20
        elif not bit():
            v = bits(8) + 84
        elif not bit():
            v = bits(12) + 340
        else:
            v = bits(32) + 4436
        if s and v == 0:
            return OOB
        return -v if s else v


class IaidDecoder:
    """T.88 A.3: symbol-ID decoding over SYMCODELEN bits."""

    __slots__ = ("idx", "mps", "symcodelen")

    def __init__(self, symcodelen: int):
        self.symcodelen = symcodelen
        self.idx = bytearray(1 << (symcodelen + 1))
        self.mps = bytearray(1 << (symcodelen + 1))

    def decode(self, mq: MQDecoder) -> int:
        prev = 1
        for _ in range(self.symcodelen):
            prev = (prev << 1) | mq.decode(prev, self.idx, self.mps)
        return prev - (1 << self.symcodelen)


def _symcodelen(nsyms: int) -> int:
    return max(1, (max(1, nsyms) - 1).bit_length())


def _sd_aggregate_text(
    mq, w, h, n_inst, pool, agg_ctx, iardx, iardy, iaid, rtemplate,
    r_at, gr_stats,
):
    """6.5.8.2.2: a REFAGGNINST > 1 aggregate symbol is a nested text
    region over the dictionary's symbol pool with fixed parameters
    (SBSTRIPS=1, TOPLEFT corner, OR composition, SBDEFPIXEL=0,
    SBDSOFFSET=0, SBREFINE=1, no transpose), sharing the dictionary's
    MQ stream, refinement stats and IARDX/IARDY/IAID contexts; the
    remaining integer contexts (``agg_ctx``) are retained across every
    aggregate symbol in the dictionary (6.5.8.2.1)."""
    iadt, iafs, iads, iari, iardw, iardh = agg_ctx
    region = np.zeros((h, w), np.uint8)
    stript = iadt.decode(mq)
    if stript is OOB:
        raise PdfParseError("JBIG2 aggregate: OOB strip T")
    stript = -stript
    firsts = 0
    ninst = 0
    while ninst < n_inst:
        dt = iadt.decode(mq)
        if dt is OOB:
            raise PdfParseError("JBIG2 aggregate: OOB strip delta")
        stript += dt
        dfs = iafs.decode(mq)
        if dfs is OOB:
            raise PdfParseError("JBIG2 aggregate: OOB first S")
        firsts += dfs
        curs = firsts
        first = True
        while True:
            if not first:
                ids = iads.decode(mq)
                if ids is OOB:
                    break  # end of strip
                curs += ids
            first = False
            sym_id = iaid.decode(mq)
            if sym_id >= len(pool):
                raise PdfParseError("JBIG2 aggregate: symbol id range")
            sym = pool[sym_id]
            ri = iari.decode(mq)
            if ri is OOB:
                raise PdfParseError("JBIG2 aggregate: OOB RI")
            if ri:
                rdw = iardw.decode(mq)
                rdh = iardh.decode(mq)
                rdx = iardx.decode(mq)
                rdy = iardy.decode(mq)
                if OOB in (rdw, rdh, rdx, rdy):
                    raise PdfParseError(
                        "JBIG2 aggregate: OOB refinement delta"
                    )
                nw, nh = sym.shape[1] + rdw, sym.shape[0] + rdh
                if nw <= 0 or nh <= 0 or nw * nh > MAX_REGION_PIXELS:
                    raise PdfParseError("JBIG2 aggregate: bad refined size")
                sym = decode_refinement_region(
                    b"", nw, nh, rtemplate, r_at, sym, False,
                    (rdw >> 1) + rdx, (rdh >> 1) + rdy, mq=mq,
                    stats=gr_stats,
                )
            sh, sw = sym.shape
            x0, y0 = curs, stript  # TOPLEFT: T pins the top edge
            sx0, sy0 = max(0, -x0), max(0, -y0)
            x0c, y0c = max(0, x0), max(0, y0)
            x1c, y1c = min(w, x0 + sw), min(h, y0 + sh)
            if x1c > x0c and y1c > y0c:
                region[y0c:y1c, x0c:x1c] |= sym[
                    sy0 : sy0 + (y1c - y0c), sx0 : sx0 + (x1c - x0c)
                ]
            curs += sw - 1
            ninst += 1
            if ninst > n_inst:
                raise PdfParseError("JBIG2 aggregate: instance overflow")
    return region


def _sd_aggregate_text_huffman(
    br, payload, w, h, n_inst, pool, symcodelen, rtemplate, r_at,
):
    """6.5.8.2.2 with SDHUFF=1: a REFAGGNINST > 1 aggregate symbol is a
    nested HUFFMAN text region with the Table-17 fixed standard tables
    (FS=B.6, DS=B.8, DT=B.11, RDW/RDH/RDX/RDY=B.15, RSIZE=B.1),
    SBSTRIPS=1, TOPLEFT corner, OR composition, SBDSOFFSET=0. Symbol IDs
    are fixed SBSYMCODELEN-bit fields (6.5.8.2.3 — the run-coded symbol
    ID table is only read at real text region segments); each refined
    instance carries a byte-aligned BMSIZE-byte MQ refinement stream
    (6.4.11). B.11 has no OOB line: the loop terminates on the instance
    count, with a per-strip DS OOB like the arithmetic variant."""
    from . import jbig2_huffman as JH

    tab_fs = JH.standard_table(6)
    tab_ds = JH.standard_table(8)
    tab_dt = JH.standard_table(11)
    tab_rd = JH.standard_table(15)
    tab_rsize = JH.standard_table(1)
    region = np.zeros((h, w), np.uint8)
    stript = tab_dt.decode(br)
    if stript is JH.OOB:
        raise PdfParseError("JBIG2 huffman aggregate: bad strip T")
    stript = -stript
    firsts = 0
    ninst = 0
    while ninst < n_inst:
        dt = tab_dt.decode(br)
        if dt is JH.OOB:
            raise PdfParseError("JBIG2 huffman aggregate: bad strip delta")
        stript += dt
        dfs = tab_fs.decode(br)
        if dfs is JH.OOB:
            raise PdfParseError("JBIG2 huffman aggregate: OOB first S")
        firsts += dfs
        curs = firsts
        first = True
        while True:
            if not first:
                ids = tab_ds.decode(br)
                if ids is JH.OOB:
                    break  # end of strip
                curs += ids
            first = False
            sym_id = br.bits(symcodelen)
            if sym_id >= len(pool):
                raise PdfParseError("JBIG2 huffman aggregate: symbol id range")
            sym = pool[sym_id]
            if br.bit():
                rdw = tab_rd.decode(br)
                rdh = tab_rd.decode(br)
                rdx = tab_rd.decode(br)
                rdy = tab_rd.decode(br)
                if JH.OOB in (rdw, rdh, rdx, rdy):
                    raise PdfParseError(
                        "JBIG2 huffman aggregate: OOB refinement delta"
                    )
                nw, nh = sym.shape[1] + rdw, sym.shape[0] + rdh
                if nw <= 0 or nh <= 0 or nw * nh > MAX_REGION_PIXELS:
                    raise PdfParseError(
                        "JBIG2 huffman aggregate: bad refined size"
                    )
                bmsize = tab_rsize.decode(br)
                if bmsize is JH.OOB or bmsize <= 0:
                    raise PdfParseError(
                        "JBIG2 huffman aggregate: bad refinement size"
                    )
                br.align()
                start = br.byte_pos()
                data = payload[start : start + bmsize]
                if len(data) < bmsize:
                    raise PdfParseError(
                        "JBIG2 huffman aggregate: refinement truncated"
                    )
                sym = decode_refinement_region(
                    data, nw, nh, rtemplate, r_at or GR_AT_NOMINAL, sym,
                    False, (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                )
                br.seek_byte(start + bmsize)
            sh, sw = sym.shape
            x0, y0 = curs, stript  # TOPLEFT
            sx0, sy0 = max(0, -x0), max(0, -y0)
            x0c, y0c = max(0, x0), max(0, y0)
            x1c, y1c = min(w, x0 + sw), min(h, y0 + sh)
            if x1c > x0c and y1c > y0c:
                region[y0c:y1c, x0c:x1c] |= sym[
                    sy0 : sy0 + (y1c - y0c), sx0 : sx0 + (x1c - x0c)
                ]
            curs += sw - 1
            ninst += 1
            if ninst > n_inst:
                raise PdfParseError("JBIG2 huffman aggregate: overflow")
    return region


def decode_symbol_dictionary(
    payload: bytes, input_symbols: list[np.ndarray],
    tables: list | None = None,
) -> list[np.ndarray]:
    """Symbol dictionary segment (T.88 6.5) -> the EXPORTED symbol
    bitmaps (input symbols from referred dictionaries participate in
    the export run-length flagging per 6.5.10). Both arithmetic and
    huffman (SDHUFF) coding; ``tables`` holds referred custom huffman
    tables in segment order."""
    if len(payload) < 2:
        raise PdfParseError("JBIG2 short symbol dictionary")
    flags = int.from_bytes(payload[0:2], "big")
    sdhuff = flags & 1
    sdrefagg = (flags >> 1) & 1
    template = (flags >> 10) & 3
    rtemplate = (flags >> 12) & 1
    if sdhuff:
        return _decode_symbol_dictionary_huffman(
            payload, input_symbols, flags, tables or []
        )
    pos = 2
    at: list[tuple[int, int]] = []
    for _ in range(GB_AT_COUNT[template]):
        dx = int.from_bytes(payload[pos : pos + 1], "big", signed=True)
        dy = int.from_bytes(payload[pos + 1 : pos + 2], "big", signed=True)
        at.append((dx, dy))
        pos += 2
    _check_at(at)
    r_at: list[tuple[int, int]] = []
    if sdrefagg:
        for _ in range(2):
            dx = int.from_bytes(payload[pos : pos + 1], "big", signed=True)
            dy = int.from_bytes(payload[pos + 1 : pos + 2], "big", signed=True)
            r_at.append((dx, dy))
            pos += 2
    n_ex = _u32(payload, pos)
    n_new = _u32(payload, pos + 4)
    pos += 8
    if n_new > 10_000 or n_ex > 10_000:
        raise PdfParseError("JBIG2 symbol dictionary: implausible counts")

    mq = MQDecoder(payload[pos:])
    iadh, iadw, iaex = IntDecoder(), IntDecoder(), IntDecoder()
    iaai, iardx, iardy = IntDecoder(), IntDecoder(), IntDecoder()
    nbits = len(GB_TEMPLATES[template]) + len(at)
    gb_idx = bytearray(1 << nbits)
    gb_mps = bytearray(1 << nbits)
    iaid = None
    gr_stats = None
    agg_ctx = None
    if sdrefagg:
        # SBSYMCODELEN over input + new symbols (6.5.8.2.3); one shared
        # GR stats set for every refined symbol
        iaid = IaidDecoder(
            _symcodelen(len(input_symbols) + n_new)
        )
        coding, ref_tmpl = GR_TEMPLATES[rtemplate]
        gr_nbits = len(coding) + len(ref_tmpl) + (2 if rtemplate == 0 else 0)
        gr_stats = (bytearray(1 << gr_nbits), bytearray(1 << gr_nbits))
        # integer contexts for nested aggregate text regions, retained
        # across every aggregate symbol in the dictionary (6.5.8.2.1)
        agg_ctx = tuple(IntDecoder() for _ in range(6))

    new_syms: list[np.ndarray] = []
    area_budget = [MAX_REGION_PIXELS]  # shared cap across all symbols
    hcheight = 0
    classes = 0
    while len(new_syms) < n_new:
        classes += 1
        if classes > n_new + 64:  # DH=0 garbage loops make no progress
            raise PdfParseError("JBIG2 symbol dictionary: class overflow")
        dh = iadh.decode(mq)
        if dh is OOB:
            raise PdfParseError("JBIG2 symbol dictionary: OOB height delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 2048:
            raise PdfParseError("JBIG2 symbol dictionary: bad height class")
        symwidth = 0
        while True:
            dw = iadw.decode(mq)
            if dw is OOB:
                break  # end of this height class
            symwidth += dw
            if symwidth <= 0 or symwidth > 2048:
                raise PdfParseError("JBIG2 symbol dictionary: bad width")
            area_budget[0] -= symwidth * hcheight
            if area_budget[0] < 0:
                raise PdfParseError(
                    "JBIG2 symbol dictionary: pixel budget exceeded"
                )
            if len(new_syms) >= n_new:
                raise PdfParseError("JBIG2 symbol dictionary: count overflow")
            if sdrefagg:
                # 6.5.8.2: aggregate instance count. REFAGGNINST == 1 is
                # the direct refinement form; > 1 nests a text region
                # over the dictionary's symbol pool (6.5.8.2.2)
                n_inst = iaai.decode(mq)
                if n_inst is OOB or n_inst <= 0 or n_inst > 10_000:
                    raise PdfParseError(
                        "JBIG2 symbol dictionary: bad aggregate count"
                    )
                eff_rat = (
                    GR_AT_NOMINAL if rtemplate else r_at or GR_AT_NOMINAL
                )
                pool = list(input_symbols) + new_syms
                if n_inst == 1:
                    sym_id = iaid.decode(mq)
                    rdx = iardx.decode(mq)
                    rdy = iardy.decode(mq)
                    if rdx is OOB or rdy is OOB:
                        raise PdfParseError(
                            "JBIG2 symbol dictionary: OOB refinement offset"
                        )
                    if sym_id >= len(pool):
                        raise PdfParseError(
                            "JBIG2 symbol dictionary: refinement id range"
                        )
                    new_syms.append(
                        decode_refinement_region(
                            b"", symwidth, hcheight, rtemplate,
                            eff_rat,
                            pool[sym_id], False, rdx, rdy, mq=mq,
                            stats=gr_stats,
                        )
                    )
                else:
                    new_syms.append(
                        _sd_aggregate_text(
                            mq, symwidth, hcheight, n_inst, pool,
                            agg_ctx, iardx, iardy, iaid, rtemplate,
                            eff_rat, gr_stats,
                        )
                    )
            else:
                new_syms.append(
                    _decode_bitmap(
                        mq, gb_idx, gb_mps, symwidth, hcheight, template,
                        at, False,
                    )
                )

    # export flags (6.5.10): alternating non-export/export run lengths
    # over input symbols + new symbols
    all_syms = list(input_symbols) + new_syms
    exported: list[np.ndarray] = []
    i = 0
    exflag = False
    while i < len(all_syms) and len(exported) < n_ex:
        run = iaex.decode(mq)
        if run is OOB or run < 0:
            raise PdfParseError("JBIG2 symbol dictionary: bad export run")
        if exflag:
            exported.extend(all_syms[i : i + run])
        i += run
        exflag = not exflag
    if len(exported) != n_ex:
        raise PdfParseError("JBIG2 symbol dictionary: export count mismatch")
    return exported


def _unpack_collective(raw: bytes, totwidth: int, hcheight: int) -> np.ndarray:
    stride = (totwidth + 7) // 8
    arr = np.frombuffer(raw, np.uint8).reshape(hcheight, stride)
    return np.unpackbits(arr, axis=1)[:, :totwidth]


def _decode_symbol_dictionary_huffman(
    payload: bytes, input_symbols: list[np.ndarray], flags: int,
    tables: list,
) -> list[np.ndarray]:
    """SDHUFF=1 symbol dictionary (6.5.5 huffman variant): per height
    class, run of width deltas then one byte-aligned COLLECTIVE bitmap
    (BMSIZE=0 -> uncompressed rows, else MMR/T.6) split by widths.
    With SDREFAGG=1 there is no collective bitmap: each symbol is a
    single-instance refinement (6.5.8.2 — ID as an SBSYMCODELEN-bit
    field, RDX/RDY via B.15, BMSIZE via B.1, byte-aligned MQ refinement
    data); REFAGGNINST > 1 in huffman mode stays unsupported."""
    from . import jbig2_huffman as JH

    sdrefagg = (flags >> 1) & 1
    rtemplate = (flags >> 12) & 1
    sel_dh = (flags >> 2) & 3
    sel_dw = (flags >> 4) & 3
    sel_bm = (flags >> 6) & 1
    sel_agg = (flags >> 7) & 1  # SDHUFFAGGINST — unused with SDREFAGG=0
    pos = 2
    r_at: list[tuple[int, int]] = []
    if sdrefagg and rtemplate == 0:
        for _ in range(2):
            dx = int.from_bytes(payload[pos : pos + 1], "big", signed=True)
            dy = int.from_bytes(payload[pos + 1 : pos + 2], "big",
                                signed=True)
            r_at.append((dx, dy))
            pos += 2
    sels = [sel_dh, sel_dw, sel_bm]
    stds = [(4, 5), (2, 3), (1,)]
    if sdrefagg:  # AGGINST selector only consumes tables when in use
        sels.append(sel_agg)
        stds.append((1,))
    assigned = JH.assign_tables(sels, tables, stds)
    tab_dh, tab_dw, tab_bm = assigned[:3]
    tab_agg = assigned[3] if sdrefagg else None
    n_ex = _u32(payload, pos)
    n_new = _u32(payload, pos + 4)
    if n_new > 10_000 or n_ex > 10_000:
        raise PdfParseError("JBIG2 symbol dictionary: implausible counts")
    br = JH.BitReader(payload, pos + 8)
    symcodelen = _symcodelen(len(input_symbols) + n_new)
    tab_rdxy = JH.standard_table(15)
    tab_rsize = JH.standard_table(1)

    new_syms: list[np.ndarray] = []
    area_budget = MAX_REGION_PIXELS
    hcheight = 0
    classes = 0
    while len(new_syms) < n_new:
        classes += 1
        if classes > n_new + 64:
            raise PdfParseError("JBIG2 symbol dictionary: class overflow")
        dh = tab_dh.decode(br)
        if dh is JH.OOB:
            raise PdfParseError("JBIG2 symbol dictionary: OOB height delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 2048:
            raise PdfParseError("JBIG2 symbol dictionary: bad height class")
        symwidth = 0
        totwidth = 0
        class_widths: list[int] = []
        while True:
            dw = tab_dw.decode(br)
            if dw is JH.OOB:
                break
            symwidth += dw
            if symwidth <= 0 or symwidth > 2048:
                raise PdfParseError("JBIG2 symbol dictionary: bad width")
            if len(new_syms) + len(class_widths) >= n_new:
                raise PdfParseError("JBIG2 symbol dictionary: count overflow")
            area_budget -= symwidth * hcheight
            if area_budget < 0:
                raise PdfParseError(
                    "JBIG2 symbol dictionary: pixel budget exceeded"
                )
            if sdrefagg:
                # 6.5.8.2 huffman: one refinement per symbol, no
                # collective bitmap for this height class
                n_inst = tab_agg.decode(br)
                if n_inst is JH.OOB or n_inst < 1 or n_inst > 10_000:
                    raise PdfParseError(
                        "JBIG2 symbol dictionary: bad huffman REFAGGNINST"
                    )
                if n_inst > 1:
                    # 6.5.8.2.2: nested huffman text region (Table 17)
                    new_syms.append(
                        _sd_aggregate_text_huffman(
                            br, payload, symwidth, hcheight, n_inst,
                            list(input_symbols) + new_syms, symcodelen,
                            rtemplate, r_at,
                        )
                    )
                    continue
                sym_id = br.bits(symcodelen)
                rdx = tab_rdxy.decode(br)
                rdy = tab_rdxy.decode(br)
                bmsize = tab_rsize.decode(br)
                if JH.OOB in (rdx, rdy, bmsize) or bmsize <= 0:
                    raise PdfParseError(
                        "JBIG2 symbol dictionary: bad refinement fields"
                    )
                br.align()
                start = br.byte_pos()
                data = payload[start : start + bmsize]
                if len(data) < bmsize:
                    raise PdfParseError(
                        "JBIG2 symbol dictionary: refinement truncated"
                    )
                pool = list(input_symbols) + new_syms
                if sym_id >= len(pool):
                    raise PdfParseError(
                        "JBIG2 symbol dictionary: refinement id range"
                    )
                new_syms.append(
                    decode_refinement_region(
                        data, symwidth, hcheight, rtemplate,
                        r_at or GR_AT_NOMINAL, pool[sym_id], False,
                        rdx, rdy,
                    )
                )
                br.seek_byte(start + bmsize)
                continue
            class_widths.append(symwidth)
            totwidth += symwidth
        if sdrefagg:
            continue  # no collective bitmap in refinement mode
        bmsize = tab_bm.decode(br)
        if bmsize is JH.OOB or bmsize < 0:
            raise PdfParseError("JBIG2 symbol dictionary: bad BMSIZE")
        br.align()
        start = br.byte_pos()
        if bmsize == 0:  # uncompressed, rows padded to byte boundary
            need = hcheight * ((totwidth + 7) // 8)
            raw = payload[start : start + need]
            if len(raw) < need:
                raise PdfParseError(
                    "JBIG2 symbol dictionary: collective bitmap truncated"
                )
            coll = _unpack_collective(raw, totwidth, hcheight)
            br.seek_byte(start + need)
        else:  # MMR (T.6) coded collective bitmap
            from .ccitt import ccitt_fax_decode

            data = payload[start : start + bmsize]
            if len(data) < bmsize:
                raise PdfParseError(
                    "JBIG2 symbol dictionary: MMR collective truncated"
                )
            packed = ccitt_fax_decode(
                data,
                {"K": -1, "Columns": totwidth, "Rows": hcheight,
                 "BlackIs1": True},
            )
            coll = _unpack_collective(packed, totwidth, hcheight)
            br.seek_byte(start + bmsize)
        x0 = 0
        for wd in class_widths:
            new_syms.append(coll[:, x0 : x0 + wd].copy())
            x0 += wd

    # export flags (6.5.10): EXRUNLENGTH via standard table B.1
    tab_ex = JH.standard_table(1)
    all_syms = list(input_symbols) + new_syms
    exported: list[np.ndarray] = []
    i = 0
    exflag = False
    while i < len(all_syms) and len(exported) < n_ex:
        run = tab_ex.decode(br)
        if run is JH.OOB or run < 0:
            raise PdfParseError("JBIG2 symbol dictionary: bad export run")
        if exflag:
            exported.extend(all_syms[i : i + run])
        i += run
        exflag = not exflag
    if len(exported) != n_ex:
        raise PdfParseError("JBIG2 symbol dictionary: export count mismatch")
    return exported


def decode_text_region(
    payload: bytes, symbols: list[np.ndarray],
    tables: list | None = None,
) -> tuple[np.ndarray, int, int, int]:
    """Text region segment (T.88 6.4) -> (bitmap, x, y, comb_op).
    Symbol instances are drawn onto the region bitmap at decoded (S, T)
    coordinates; both arithmetic and huffman (SBHUFF) coding, with
    per-instance SBREFINE refinement in either mode. ``tables`` holds
    referred custom huffman tables in segment order."""
    if len(payload) < 17 + 2 + 4:
        raise PdfParseError("JBIG2 short text region")
    w = _u32(payload, 0)
    h = _u32(payload, 4)
    x = _u32(payload, 8)
    y = _u32(payload, 12)
    region_comb_op = payload[16] & 7
    flags = int.from_bytes(payload[17:19], "big")
    sbhuff = flags & 1
    sbrefine = (flags >> 1) & 1
    log_strips = (flags >> 2) & 3
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    sb_comb_op = (flags >> 7) & 3
    sb_def_pixel = (flags >> 9) & 1
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32  # signed 5-bit
    rtemplate = (flags >> 15) & 1
    pos = 19
    hflags = 0
    if sbhuff:
        hflags = int.from_bytes(payload[19:21], "big")
        pos = 21
    r_at: list[tuple[int, int]] = []
    if sbrefine and rtemplate == 0:
        for _ in range(2):
            dx = int.from_bytes(payload[pos : pos + 1], "big", signed=True)
            dy = int.from_bytes(payload[pos + 1 : pos + 2], "big", signed=True)
            r_at.append((dx, dy))
            pos += 2
    n_instances = _u32(payload, pos)
    pos += 4
    if w == 0 or h == 0 or w * h > MAX_REGION_PIXELS or (
        n_instances > 1_000_000
    ):
        raise PdfParseError("JBIG2 text region: implausible geometry")
    if not symbols:
        raise PdfParseError("JBIG2 text region: no referred symbols")
    strips = 1 << log_strips

    # decode callbacks: the instance-placement loop below is coding-
    # agnostic; OOB is normalized to this module's sentinel
    if sbhuff:
        from . import jbig2_huffman as JH

        sels = [hflags & 3, (hflags >> 2) & 3, (hflags >> 4) & 3,
                (hflags >> 6) & 3, (hflags >> 8) & 3, (hflags >> 10) & 3,
                (hflags >> 12) & 3, (hflags >> 14) & 1]
        (tab_fs, tab_ds, tab_dt, tab_rdw, tab_rdh, tab_rdx, tab_rdy,
         tab_rsize) = JH.assign_tables(
            sels, tables or [],
            [(6, 7), (8, 9, 10), (11, 12, 13), (14, 15), (14, 15),
             (14, 15), (14, 15), (1,)],
        )
        br = JH.BitReader(payload, pos)
        symtab = JH.read_symbol_id_table(br, len(symbols))

        def _norm(v):
            return OOB if v is JH.OOB else v

        dec_dt = lambda: _norm(tab_dt.decode(br))  # noqa: E731
        dec_fs = lambda: _norm(tab_fs.decode(br))  # noqa: E731
        dec_ds = lambda: _norm(tab_ds.decode(br))  # noqa: E731
        dec_t = (  # 6.4.5: TI is a FIXED-length field in huffman mode
            (lambda: 0) if strips == 1 else (lambda: br.bits(log_strips))
        )
        dec_id = lambda: symtab.decode(br)  # noqa: E731
        dec_ri = lambda: br.bit()  # noqa: E731
        dec_rdeltas = lambda: (  # noqa: E731
            _norm(tab_rdw.decode(br)), _norm(tab_rdh.decode(br)),
            _norm(tab_rdx.decode(br)), _norm(tab_rdy.decode(br)),
        )

        def dec_refine(sym, nw, nh, rdx_off, rdy_off):
            # 6.4.11 huffman: BMSIZE-byte, byte-aligned arithmetic
            # refinement data per instance
            bmsize = tab_rsize.decode(br)
            if bmsize is JH.OOB or bmsize <= 0:
                raise PdfParseError("JBIG2 text region: bad refinement size")
            br.align()
            start = br.byte_pos()
            data = payload[start : start + bmsize]
            if len(data) < bmsize:
                raise PdfParseError(
                    "JBIG2 text region: refinement data truncated"
                )
            out = decode_refinement_region(
                data, nw, nh, rtemplate, r_at or GR_AT_NOMINAL, sym,
                False, rdx_off, rdy_off,
            )
            br.seek_byte(start + bmsize)
            return out
    else:
        mq = MQDecoder(payload[pos:])
        iadt, iafs, iads, iait = (
            IntDecoder(), IntDecoder(), IntDecoder(), IntDecoder(),
        )
        iaid = IaidDecoder(_symcodelen(len(symbols)))
        iari, iardw, iardh, iardx, iardy = (
            IntDecoder(), IntDecoder(), IntDecoder(), IntDecoder(),
            IntDecoder(),
        )
        gr_stats = None
        if sbrefine:
            coding_t, ref_t = GR_TEMPLATES[rtemplate]
            gr_nbits = len(coding_t) + len(ref_t) + (
                2 if rtemplate == 0 else 0
            )
            gr_stats = (bytearray(1 << gr_nbits), bytearray(1 << gr_nbits))

        dec_dt = lambda: iadt.decode(mq)  # noqa: E731
        dec_fs = lambda: iafs.decode(mq)  # noqa: E731
        dec_ds = lambda: iads.decode(mq)  # noqa: E731
        dec_t = (  # noqa: E731
            (lambda: 0) if strips == 1 else (lambda: iait.decode(mq))
        )
        dec_id = lambda: iaid.decode(mq)  # noqa: E731
        dec_ri = lambda: iari.decode(mq)  # noqa: E731
        dec_rdeltas = lambda: (  # noqa: E731
            iardw.decode(mq), iardh.decode(mq), iardx.decode(mq),
            iardy.decode(mq),
        )

        def dec_refine(sym, nw, nh, rdx_off, rdy_off):
            return decode_refinement_region(
                b"", nw, nh, rtemplate, r_at or GR_AT_NOMINAL, sym,
                False, rdx_off, rdy_off, mq=mq, stats=gr_stats,
            )

    region = np.full((h, w), sb_def_pixel, np.uint8)

    def draw(sym: np.ndarray, s: int, t: int) -> int:
        """Place one instance; returns the S advance (W-1 or H-1).
        Reference-corner semantics per 6.4.5(3)(c): the S axis always
        holds the LEFT (top if transposed) edge span; the corner selects
        which edge T pins."""
        sh, sw = sym.shape
        if transposed:
            # S runs vertically; T horizontally
            y0 = s
            x0 = t if refcorner in (0, 1) else t - sw + 1  # *LEFT vs *RIGHT
            adv = sh - 1
        else:
            x0 = s
            y0 = t if refcorner in (1, 3) else t - sh + 1  # TOP* vs BOTTOM*
            adv = sw - 1
        x1, y1 = x0 + sw, y0 + sh
        # clip (T.88 allows instances to stick out; draw the overlap)
        sx0, sy0 = max(0, -x0), max(0, -y0)
        x0c, y0c = max(0, x0), max(0, y0)
        x1c, y1c = min(w, x1), min(h, y1)
        if x1c > x0c and y1c > y0c:
            src = sym[sy0 : sy0 + (y1c - y0c), sx0 : sx0 + (x1c - x0c)]
            dst = region[y0c:y1c, x0c:x1c]
            if sb_comb_op == 0:
                dst |= src
            elif sb_comb_op == 1:
                dst &= src
            elif sb_comb_op == 2:
                dst ^= src
            else:
                dst[:] = 1 - (dst ^ src)
        return adv

    stript = dec_dt()
    if stript is OOB:
        raise PdfParseError("JBIG2 text region: OOB strip T")
    stript = -stript * strips
    firsts = 0
    ninst = 0
    while ninst < n_instances:
        dt = dec_dt()
        if dt is OOB:
            raise PdfParseError("JBIG2 text region: OOB strip delta")
        stript += dt * strips
        dfs = dec_fs()
        if dfs is OOB:
            raise PdfParseError("JBIG2 text region: OOB first S")
        firsts += dfs
        curs = firsts
        first = True
        while True:
            if not first:
                ids = dec_ds()
                if ids is OOB:
                    break  # end of strip
                curs += ids + ds_offset
            first = False
            curt = dec_t()
            if curt is OOB:
                raise PdfParseError("JBIG2 text region: OOB T offset")
            sym_id = dec_id()
            if sym_id >= len(symbols):
                raise PdfParseError("JBIG2 text region: symbol id out of range")
            sym = symbols[sym_id]
            if sbrefine:
                ri = dec_ri()
                if ri is OOB:
                    raise PdfParseError("JBIG2 text region: OOB RI")
                if ri:
                    # 6.4.11: instance = refinement of the symbol with
                    # size delta (RDW, RDH) and centered+offset reference
                    rdw, rdh, rdx, rdy = dec_rdeltas()
                    if OOB in (rdw, rdh, rdx, rdy):
                        raise PdfParseError(
                            "JBIG2 text region: OOB refinement delta"
                        )
                    nw, nh = sym.shape[1] + rdw, sym.shape[0] + rdh
                    if nw <= 0 or nh <= 0 or nw * nh > MAX_REGION_PIXELS:
                        raise PdfParseError(
                            "JBIG2 text region: bad refined size"
                        )
                    sym = dec_refine(
                        sym, nw, nh, (rdw >> 1) + rdx, (rdh >> 1) + rdy
                    )
            curs += draw(sym, curs, stript + curt)
            ninst += 1
            if ninst > n_instances:
                raise PdfParseError("JBIG2 text region: instance overflow")
    return region, x, y, region_comb_op


def _u32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 4], "big")


def _segments(buf: bytes):
    """Iterate (num, type, referred_segment_numbers, payload) over a
    T.88 embedded-organization segment stream (segment headers per
    7.2)."""
    pos = 0
    n = len(buf)
    while pos + 11 <= n:
        num = _u32(buf, pos)
        flags = buf[pos + 4]
        seg_type = flags & 0x3F
        page4 = bool(flags & 0x40)
        pos += 5
        rts = buf[pos] >> 5
        if rts == 7:
            count = _u32(buf, pos) & 0x1FFFFFFF
            pos += 4 + (count + 8) // 8  # long form + retain bits
        else:
            count = rts
            pos += 1
        ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
        if pos + count * ref_size > n:  # garbage count: fail, don't build
            raise PdfParseError("JBIG2 segment header overruns stream")
        referred = [
            int.from_bytes(buf[pos + i * ref_size : pos + (i + 1) * ref_size],
                           "big")
            for i in range(count)
        ]
        pos += count * ref_size
        pos += 4 if page4 else 1
        length = _u32(buf, pos)
        pos += 4
        if length == 0xFFFFFFFF:
            raise PdfParseError("JBIG2 unknown-length segment unsupported")
        if pos + length > n:
            raise PdfParseError("JBIG2 segment data overruns stream")
        yield num, seg_type, referred, buf[pos : pos + length]
        pos += length


def _compose(page: np.ndarray, region: np.ndarray, x: int, y: int, op: int):
    h, w = region.shape
    target = page[y : y + h, x : x + w]
    if target.shape != region.shape:
        raise PdfParseError("JBIG2 region outside page bounds")
    if op == 0:  # OR
        target |= region
    elif op == 1:  # AND
        target &= region
    elif op == 2:  # XOR
        target ^= region
    elif op == 3:  # XNOR
        target[:] = 1 - (target ^ region)
    elif op == 4:  # REPLACE
        target[:] = region
    else:
        raise PdfParseError(f"JBIG2 bad combination operator {op}")


def _decode_region_segment(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Immediate generic region segment -> (bitmap, x, y, comb_op)."""
    if len(payload) < 18:
        raise PdfParseError("JBIG2 short region segment")
    w = _u32(payload, 0)
    h = _u32(payload, 4)
    x = _u32(payload, 8)
    y = _u32(payload, 12)
    comb_op = payload[16] & 7
    flags = payload[17]
    mmr = flags & 1
    template = (flags >> 1) & 3
    tpgdon = bool(flags & 8)
    pos = 18
    at: list[tuple[int, int]] = []
    if not mmr:
        for _ in range(GB_AT_COUNT[template]):
            dx = int.from_bytes(payload[pos : pos + 1], "big", signed=True)
            dy = int.from_bytes(payload[pos + 1 : pos + 2], "big", signed=True)
            at.append((dx, dy))
            pos += 2
        _check_at(at)
    data = payload[pos:]
    if w == 0 or h == 0 or w * h > MAX_REGION_PIXELS:
        raise PdfParseError(f"JBIG2 bad region geometry {w}x{h}")
    if mmr:
        # MMR is T.6 (G4) coding — reuse the independently-golden CCITT
        # decoder; BlackIs1 keeps the JBIG2 1=black convention
        from .ccitt import ccitt_fax_decode

        packed = ccitt_fax_decode(
            data, {"K": -1, "Columns": w, "Rows": h, "BlackIs1": True}
        )
        rowlen = (w + 7) // 8
        arr = np.frombuffer(packed, np.uint8).reshape(h, rowlen)
        bitmap = np.unpackbits(arr, axis=1)[:, :w]
    else:
        bitmap = decode_generic_region(data, w, h, template, at, tpgdon)
    return bitmap, x, y, comb_op



# Refinement templates (T.88 6.3.5.3): context = coding pixels over the
# TARGET bitmap (already-decoded neighbors) then reference pixels over
# the REFERENCE bitmap, each list sorted by (y, x), assembled MSB-first.
# Template 0 appends one AT pixel to each list (nominal (-1,-1) both).
GR_TEMPLATES = {
    0: ([(0, -1), (1, -1), (-1, 0)],
        [(0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1),
         (1, 1)]),
    1: ([(-1, -1), (0, -1), (1, -1), (-1, 0)],
        [(0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)]),
}
GR_AT_NOMINAL = [(-1, -1), (-1, -1)]
# TPGRON pseudo-pixel contexts (6.3.5.6) for the sorted assembly below
TPGR_CTX = {0: 0x0100, 1: 0x0080}


def _ref_typical(ref_rows, rw, rh, x, y):
    """True when the 3x3 reference neighborhood of (x, y) is uniform —
    the 'typical' pixel condition; returns (is_typical, value)."""
    v = ref_rows[y][x] if 0 <= x < rw and 0 <= y < rh else 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            xx, yy = x + dx, y + dy
            n = ref_rows[yy][xx] if 0 <= xx < rw and 0 <= yy < rh else 0
            if n != v:
                return False, v
    return True, v


def decode_refinement_region(
    data: bytes,
    w: int,
    h: int,
    template: int,
    at: list[tuple[int, int]],
    reference: np.ndarray,
    tpgron: bool = False,
    ref_dx: int = 0,
    ref_dy: int = 0,
    mq: "MQDecoder | None" = None,
    stats: tuple | None = None,
) -> np.ndarray:
    """Refinement region decoding procedure (T.88 6.3.5.6): each target
    pixel's context combines already-decoded target neighbors with a
    window of the reference bitmap (the page content under the region
    for refinement region segments). With TPGRON, rows flagged typical
    copy reference pixels wherever the 3x3 reference neighborhood is
    uniform and only decode the rest."""
    if template not in GR_TEMPLATES:
        raise PdfParseError(f"JBIG2 bad GR template {template}")
    coding, ref_tmpl = GR_TEMPLATES[template]
    if template == 0:
        coding = sorted(coding + [tuple(at[0])], key=lambda p: (p[1], p[0]))
        ref_tmpl = sorted(
            ref_tmpl + [tuple(at[1])], key=lambda p: (p[1], p[0])
        )
    nbits = len(coding) + len(ref_tmpl)
    if stats is not None:
        idx, mps = stats  # caller-owned (symbol-dictionary sharing)
    else:
        idx = bytearray(1 << nbits)
        mps = bytearray(1 << nbits)
    if mq is None:
        mq = MQDecoder(data)
    rh, rw = reference.shape
    ref_rows = [[int(v) for v in r] for r in reference]
    rows: list[list[int]] = []
    ltp = 0
    for y in range(h):
        row = [0] * w
        rows.append(row)
        if tpgron:
            if mq.decode(TPGR_CTX[template], idx, mps):
                ltp ^= 1
        for x in range(w):
            # reference coordinates shifted by (ref_dx, ref_dy)
            if tpgron and ltp:
                typical, v = _ref_typical(
                    ref_rows, rw, rh, x - ref_dx, y - ref_dy
                )
                if typical:
                    row[x] = v
                    continue
            ctx = 0
            for dx, dy in coding:
                xx, yy = x + dx, y + dy
                if 0 <= xx < w and 0 <= yy < h and (
                    yy < y or (yy == y and xx < x)
                ):
                    ctx = (ctx << 1) | rows[yy][xx]
                else:
                    ctx <<= 1
            for dx, dy in ref_tmpl:
                xx, yy = x + dx - ref_dx, y + dy - ref_dy
                if 0 <= xx < rw and 0 <= yy < rh:
                    ctx = (ctx << 1) | ref_rows[yy][xx]
                else:
                    ctx <<= 1
            row[x] = mq.decode(ctx, idx, mps)
    return np.array(rows, np.uint8).reshape(h, w)


def _decode_refinement_segment(
    payload: bytes, page: np.ndarray
) -> tuple[np.ndarray, int, int, int]:
    """Refinement region segment (type 40/42/43) -> (bitmap, x, y, op).
    The reference is the page content under the region rectangle
    (T.88 6.3: region segments refine the page)."""
    if len(payload) < 18:
        raise PdfParseError("JBIG2 short refinement region")
    w = _u32(payload, 0)
    h = _u32(payload, 4)
    x = _u32(payload, 8)
    y = _u32(payload, 12)
    comb_op = payload[16] & 7
    flags = payload[17]
    template = flags & 1
    tpgron = bool((flags >> 1) & 1)
    pos = 18
    at: list[tuple[int, int]] = []
    if template == 0:
        for _ in range(2):
            dx = int.from_bytes(payload[pos : pos + 1], "big", signed=True)
            dy = int.from_bytes(payload[pos + 1 : pos + 2], "big", signed=True)
            at.append((dx, dy))
            pos += 2
    if w == 0 or h == 0 or w * h > MAX_REGION_PIXELS:
        raise PdfParseError("JBIG2 refinement region: bad geometry")
    if y + h > page.shape[0] or x + w > page.shape[1]:
        raise PdfParseError("JBIG2 refinement region outside page")
    reference = page[y : y + h, x : x + w]
    bitmap = decode_refinement_region(
        payload[pos:], w, h, template, at or GR_AT_NOMINAL, reference,
        tpgron,
    )
    return bitmap, x, y, comb_op



# -- pattern dictionary + halftone region (T.88 6.7 / 6.6) -------------------


def decode_pattern_dictionary(payload: bytes) -> list[np.ndarray]:
    """Pattern dictionary segment (type 16): one collective generic
    bitmap of (GRAYMAX+1) patterns side by side, decoded with the
    special nominal AT1 = (-HDPW, 0), then split."""
    if len(payload) < 7:
        raise PdfParseError("JBIG2 short pattern dictionary")
    flags = payload[0]
    hdmmr = flags & 1
    template = (flags >> 1) & 3
    hdpw = payload[1]
    hdph = payload[2]
    graymax = _u32(payload, 3)
    if hdpw == 0 or hdph == 0 or graymax > 255:
        raise PdfParseError("JBIG2 pattern dictionary: bad geometry")
    total_w = (graymax + 1) * hdpw
    if total_w * hdph > MAX_REGION_PIXELS:
        raise PdfParseError("JBIG2 pattern dictionary: too large")
    data = payload[7:]
    if hdmmr:
        from .ccitt import ccitt_fax_decode

        packed = ccitt_fax_decode(
            data, {"K": -1, "Columns": total_w, "Rows": hdph,
                   "BlackIs1": True}
        )
        rowlen = (total_w + 7) // 8
        arr = np.frombuffer(packed, np.uint8).reshape(hdph, rowlen)
        collective = np.unpackbits(arr, axis=1)[:, :total_w]
    else:
        at = [(-hdpw, 0)] + GB_AT_NOMINAL[0][1:] if template == 0 else [
            (-hdpw, 0)
        ]
        collective = decode_generic_region(
            data, total_w, hdph, template, at, False
        )
    return [
        collective[:, i * hdpw : (i + 1) * hdpw]
        for i in range(graymax + 1)
    ]


def _mmr_planes(data: bytes, w: int, h: int, n: int) -> list[np.ndarray]:
    """HMMR=1 gray-scale bitplane stack (C.5): ``n`` MMR (T.6) coded
    w x h bitplanes in ONE bit-continuous stream, each terminated by an
    EOFB and each restarting from the imaginary all-white reference
    row. Returned MSB-first, 1 = black (JBIG2 sense)."""
    from .ccitt import EOL, _Bits, _decode_2d_row, _row_bytes

    bits = _Bits(data)
    planes = []
    for _ in range(n):
        ref = [w, w]
        rows = []
        for _ in range(h):
            if bits.eof():
                raise PdfParseError("JBIG2 halftone: MMR stream truncated")
            transitions = _decode_2d_row(bits, ref, w)
            rows.append(
                np.unpackbits(
                    np.frombuffer(
                        _row_bytes(transitions, w, True), np.uint8
                    )
                )[:w]
            )
            ref = transitions
        if not (bits.try_eat(EOL) and bits.try_eat(EOL)):
            raise PdfParseError("JBIG2 halftone: missing EOFB after plane")
        planes.append(np.array(rows, np.uint8).reshape(h, w))
    return planes


def decode_halftone_region(
    payload: bytes, patterns: list[np.ndarray]
) -> tuple[np.ndarray, int, int, int]:
    """Halftone region segment (types 20/22/23): a grayscale cell image
    decoded as Gray-coded bitplanes — one shared MQ decoder + stats
    (C.5), or one bit-continuous MMR stream when HMMR=1 — optionally
    with ENABLESKIP (cells stamping outside the region are not coded),
    then each cell's pattern stamped on the (possibly skewed 8.8
    fixed-point) halftone grid."""
    if len(payload) < 18 + 16:
        raise PdfParseError("JBIG2 short halftone region")
    w = _u32(payload, 0)
    h = _u32(payload, 4)
    x = _u32(payload, 8)
    y = _u32(payload, 12)
    comb_op = payload[16] & 7
    flags = payload[17]
    hmmr = flags & 1
    template = (flags >> 1) & 3
    enable_skip = (flags >> 3) & 1
    h_comb_op = (flags >> 4) & 7
    def_pixel = (flags >> 7) & 1
    if hmmr and enable_skip:
        raise PdfParseError("JBIG2 halftone: HSKIP is MQ-only (6.6.5.1)")
    pos = 18
    hgw = _u32(payload, pos)
    hgh = _u32(payload, pos + 4)
    hgx = int.from_bytes(payload[pos + 8 : pos + 12], "big", signed=True)
    hgy = int.from_bytes(payload[pos + 12 : pos + 16], "big", signed=True)
    hrx = int.from_bytes(payload[pos + 16 : pos + 18], "big")
    hry = int.from_bytes(payload[pos + 18 : pos + 20], "big")
    pos += 20
    if not patterns:
        raise PdfParseError("JBIG2 halftone: no referred patterns")
    if w == 0 or h == 0 or w * h > MAX_REGION_PIXELS or (
        hgw * hgh > MAX_REGION_PIXELS
    ):
        raise PdfParseError("JBIG2 halftone: bad geometry")
    graymax = len(patterns) - 1
    bpp = max(1, graymax.bit_length())
    ph, pw = patterns[0].shape
    skip = None
    if enable_skip:
        # HSKIP (6.6.5.1): cells whose pattern stamp lands entirely
        # outside the region are never coded — same placement formula
        # as the stamping loop below
        mg = np.arange(hgh).reshape(-1, 1)
        ng = np.arange(hgw).reshape(1, -1)
        px = hgx + ((mg * hry + ng * hrx) >> 8)
        py = hgy + ((mg * hrx - ng * hry) >> 8)
        skip = (
            (px + pw <= 0) | (px >= w) | (py + ph <= 0) | (py >= h)
        ).astype(np.uint8)
    if hmmr:
        planes = _mmr_planes(payload[pos:], hgw, hgh, bpp)
    else:
        # C.5: bitplanes MSB->LSB through ONE decoder/stats set
        at = GB_AT_NOMINAL[template]
        nbits = len(GB_TEMPLATES[template]) + len(at)
        idx = bytearray(1 << nbits)
        mps = bytearray(1 << nbits)
        mq = MQDecoder(payload[pos:])
        planes = [
            _decode_bitmap(
                mq, idx, mps, hgw, hgh, template, at, False, skip=skip
            )
            for _ in range(bpp)
        ]
    value = np.zeros((hgh, hgw), np.int32)
    prev = None
    for j, plane in zip(range(bpp - 1, -1, -1), planes):
        bit = plane if prev is None else (plane ^ prev)
        value |= bit.astype(np.int32) << j
        prev = bit
    np.minimum(value, graymax, out=value)

    region = np.full((h, w), def_pixel, np.uint8)
    for mg in range(hgh):
        for ng in range(hgw):
            px = hgx + ((mg * hry + ng * hrx) >> 8)
            py = hgy + ((mg * hrx - ng * hry) >> 8)
            pat = patterns[int(value[mg, ng])]
            x0, y0 = max(0, px), max(0, py)
            x1, y1 = min(w, px + pw), min(h, py + ph)
            if x1 <= x0 or y1 <= y0:
                continue
            src = pat[y0 - py : y1 - py, x0 - px : x1 - px]
            dst = region[y0:y1, x0:x1]
            if h_comb_op == 0:
                dst |= src
            elif h_comb_op == 1:
                dst &= src
            elif h_comb_op == 2:
                dst ^= src
            elif h_comb_op == 3:
                dst[:] = 1 - (dst ^ src)
            else:
                dst[:] = src
    return region, x, y, comb_op


_GENERIC_REGION_TYPES = (36, 38, 39)
_REFINEMENT_REGION_TYPES = (40, 42, 43)
_HALFTONE_REGION_TYPES = (20, 22, 23)
_TEXT_REGION_TYPES = (4, 6, 7)
_IGNORED_TYPES = (49, 50, 51, 62)  # end-of-page/stripe/file, extension


def decode_jbig2_embedded(data: bytes, globals_data: bytes = b"") -> bytes:
    """Decode a PDF-embedded JBIG2 stream (optionally prefixed by a
    JBIG2Globals stream) to packed 1-bit rows, 0 = black (inverted from
    JBIG2's 1 = black to the DeviceGray sense, see module docstring)."""
    page_w = page_h = 0
    default_pixel = 0
    # entries: ("bm", bitmap, x, y, op) decoded eagerly, or
    # ("refine", payload) — refinement decodes against the page as
    # composed SO FAR, so it must run during the compose pass below
    entries: list[tuple] = []
    sym_dicts: dict[int, list[np.ndarray]] = {}  # segment num -> exports
    pat_dicts: dict[int, list[np.ndarray]] = {}  # segment num -> patterns
    huff_tables: dict[int, object] = {}  # segment num -> custom HuffTable
    for num, seg_type, referred, payload in _segments(
        bytes(globals_data) + bytes(data)
    ):
        if seg_type == 48:  # page information
            page_w = _u32(payload, 0)
            page_h = _u32(payload, 4)
            if len(payload) > 16:
                default_pixel = (payload[16] >> 2) & 1
        elif seg_type == 53:  # custom huffman table
            from .jbig2_huffman import parse_table_segment

            huff_tables[num] = parse_table_segment(payload)
        elif seg_type == 0:  # symbol dictionary
            inputs: list[np.ndarray] = []
            tabs: list = []
            for r in referred:
                inputs.extend(sym_dicts.get(r, []))
                if r in huff_tables:
                    tabs.append(huff_tables[r])
            sym_dicts[num] = decode_symbol_dictionary(payload, inputs, tabs)
        elif seg_type in _TEXT_REGION_TYPES:
            syms: list[np.ndarray] = []
            tabs = []
            for r in referred:
                syms.extend(sym_dicts.get(r, []))
                if r in huff_tables:
                    tabs.append(huff_tables[r])
            entries.append(("bm",) + decode_text_region(payload, syms, tabs))
        elif seg_type in _GENERIC_REGION_TYPES:
            entries.append(("bm",) + _decode_region_segment(payload))
        elif seg_type == 16:  # pattern dictionary
            pat_dicts[num] = decode_pattern_dictionary(payload)
        elif seg_type in _HALFTONE_REGION_TYPES:
            pats: list[np.ndarray] = []
            for r in referred:
                pats.extend(pat_dicts.get(r, []))
            entries.append(("bm",) + decode_halftone_region(payload, pats))
        elif seg_type in _REFINEMENT_REGION_TYPES:
            entries.append(("refine", payload))
        elif seg_type in _IGNORED_TYPES:
            continue
        else:
            raise PdfParseError(
                f"JBIG2 segment type {seg_type} unsupported (table)"
            )
    bms = [e for e in entries if e[0] == "bm"]
    if not entries:
        raise PdfParseError("JBIG2 stream has no region segments")
    if page_h in (0, 0xFFFFFFFF):  # striped/unknown: size from regions
        if not bms:
            raise PdfParseError("JBIG2 page height unknown")
        page_h = max(y + r.shape[0] for _, r, _, y, _ in bms)
    if page_w == 0:
        if not bms:
            raise PdfParseError("JBIG2 page width unknown")
        page_w = max(x + r.shape[1] for _, r, x, _, _ in bms)
    page = np.full((page_h, page_w), default_pixel, np.uint8)
    for e in entries:
        if e[0] == "bm":
            _, region, x, y, op = e
        else:
            region, x, y, op = _decode_refinement_segment(e[1], page)
        _compose(page, region, x, y, op)
    packed = np.packbits(page, axis=1)
    return (~packed).tobytes()  # 1=black -> 0=black
