"""TrueType (sfnt) parser: table directory + head/maxp/hhea/hmtx and cmap
formats 0/2/4/6/12 — the width path only (the reference's ~1,600-LoC table
parser, src/font/true_type/parse.rs, and the 1,835-LoC hinting VM have no
effect on span text, SURVEY.md §2.5 T11/T12). Format 12 covers
supplementary-plane fonts; format 2 the high-byte CJK legacy layout."""

from __future__ import annotations

import struct


class TrueTypeFont:
    def __init__(self, units_per_em: int, cmap: dict[int, int], hmtx: list[int]):
        self.units_per_em = units_per_em
        self.cmap = cmap  # unicode/code -> glyph id
        self.hmtx = hmtx  # advance width per glyph (last repeats)

    def advance(self, gid: int) -> int:
        if not self.hmtx:
            return 0
        return self.hmtx[gid] if gid < len(self.hmtx) else self.hmtx[-1]

    def width(self, code: int) -> float | None:
        """Advance for a character code, scaled to 1000/em PDF text units."""
        gid = self.cmap.get(code)
        if gid is None:
            return None
        return self.advance(gid) * 1000.0 / self.units_per_em


def _parse_cmap_subtable(data: bytes, off: int) -> dict[int, int]:
    fmt = struct.unpack_from(">H", data, off)[0]
    table: dict[int, int] = {}
    if fmt == 0:
        for code in range(256):
            gid = data[off + 6 + code]
            if gid:
                table[code] = gid
    elif fmt == 4:
        seg_x2 = struct.unpack_from(">H", data, off + 6)[0]
        segs = seg_x2 // 2
        ends = struct.unpack_from(f">{segs}H", data, off + 14)
        starts = struct.unpack_from(f">{segs}H", data, off + 16 + seg_x2)
        deltas = struct.unpack_from(f">{segs}h", data, off + 16 + 2 * seg_x2)
        range_off_base = off + 16 + 3 * seg_x2
        range_offs = struct.unpack_from(f">{segs}H", data, range_off_base)
        for s in range(segs):
            if starts[s] == 0xFFFF:
                continue
            for code in range(starts[s], ends[s] + 1):
                if range_offs[s] == 0:
                    gid = (code + deltas[s]) & 0xFFFF
                else:
                    addr = (
                        range_off_base
                        + 2 * s
                        + range_offs[s]
                        + 2 * (code - starts[s])
                    )
                    gid = struct.unpack_from(">H", data, addr)[0]
                    if gid:
                        gid = (gid + deltas[s]) & 0xFFFF
                if gid:
                    table[code] = gid
    elif fmt == 6:
        first, count = struct.unpack_from(">HH", data, off + 6)
        gids = struct.unpack_from(f">{count}H", data, off + 10)
        for i, gid in enumerate(gids):
            if gid:
                table[first + i] = gid
    elif fmt == 2:
        # high-byte mapping: 256 subHeaderKeys (x8) pick a subHeader of
        # (firstCode, entryCount, idDelta, idRangeOffset); key 0 maps
        # single bytes, others 2-byte codes (OpenType spec 'cmap' fmt 2)
        sub_keys = struct.unpack_from(">256H", data, off + 6)
        sh_base = off + 6 + 512
        for high in range(256):
            if sub_keys[high] == 0 and high != 0:
                # subHeader 0 only maps single-byte codes; re-walking its
                # entry list for every key-0 high byte is wasted work
                continue
            sh_off = sh_base + sub_keys[high]  # key is subHeader index *8
            first, count, delta, range_off = struct.unpack_from(
                ">HHhH", data, sh_off
            )
            # idRangeOffset is relative to its own field position
            glyph_base = sh_off + 6 + range_off
            for i in range(count):
                gid = struct.unpack_from(">H", data, glyph_base + 2 * i)[0]
                if gid:
                    gid = (gid + delta) & 0xFFFF
                if not gid:
                    continue
                if sub_keys[high] == 0:
                    if high == 0:  # single-byte codes via subHeader 0
                        table[first + i] = gid
                else:
                    table[(high << 8) | (first + i)] = gid
    elif fmt == 12:
        # segmented coverage: sequential 32-bit groups (startChar, endChar,
        # startGlyph) — supplementary-plane capable
        n_groups = struct.unpack_from(">I", data, off + 12)[0]
        for g in range(n_groups):
            start, end, start_gid = struct.unpack_from(
                ">III", data, off + 16 + 12 * g
            )
            for code in range(start, end + 1):
                gid = start_gid + (code - start)
                if gid:
                    table[code] = gid
                if len(table) > 262144:  # adversarial-range guard
                    return table
    # other formats: unsupported -> empty (caller falls back to defaults)
    return table


def parse_truetype(data: bytes) -> TrueTypeFont:
    num_tables = struct.unpack_from(">H", data, 4)[0]
    tables: dict[bytes, tuple[int, int]] = {}
    for i in range(num_tables):
        tag, _cs, off, length = struct.unpack_from(">4sIII", data, 12 + 16 * i)
        tables[tag] = (off, length)

    if b"head" not in tables:
        raise ValueError("no head table")
    head_off = tables[b"head"][0]
    units_per_em = struct.unpack_from(">H", data, head_off + 18)[0]

    num_glyphs = 0
    if b"maxp" in tables:
        num_glyphs = struct.unpack_from(">H", data, tables[b"maxp"][0] + 4)[0]

    hmtx: list[int] = []
    if b"hhea" in tables and b"hmtx" in tables:
        n_hmetrics = struct.unpack_from(">H", data, tables[b"hhea"][0] + 34)[0]
        hm_off = tables[b"hmtx"][0]
        for g in range(n_hmetrics):
            hmtx.append(struct.unpack_from(">H", data, hm_off + 4 * g)[0])
        # remaining glyphs repeat the last advance
        if hmtx and num_glyphs > n_hmetrics:
            hmtx.extend([hmtx[-1]] * (num_glyphs - n_hmetrics))

    cmap: dict[int, int] = {}
    if b"cmap" in tables:
        cm_off = tables[b"cmap"][0]
        n_sub = struct.unpack_from(">H", data, cm_off + 2)[0]
        best = None
        for i in range(n_sub):
            plat, enc, sub_off = struct.unpack_from(
                ">HHI", data, cm_off + 4 + 8 * i
            )
            # prefer full-Unicode (fmt 12) subtables, then BMP, then legacy
            score = {
                (3, 10): 4, (0, 4): 4, (0, 6): 4,
                (3, 1): 3, (0, 3): 3, (3, 0): 2, (1, 0): 1,
            }.get((plat, enc), 0)
            if best is None or score > best[0]:
                best = (score, cm_off + sub_off)
        if best is not None:
            cmap = _parse_cmap_subtable(data, best[1])

    return TrueTypeFont(units_per_em or 1000, cmap, hmtx)
