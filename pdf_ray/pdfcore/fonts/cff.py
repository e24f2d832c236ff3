"""CFF (Compact Font Format) parser: INDEX structures, Top/Private DICTs,
Type 2 charstring width extraction (reference: src/font/cff/*, ~2,400 LoC —
widths-only here per SURVEY.md §2.5 T13)."""

from __future__ import annotations

import struct


def _read_index(data: bytes, pos: int):
    """Returns (items, end_pos). CFF spec §5."""
    (count,) = struct.unpack_from(">H", data, pos)
    pos += 2
    if count == 0:
        return [], pos
    off_size = data[pos]
    pos += 1
    offsets = []
    for i in range(count + 1):
        offsets.append(int.from_bytes(data[pos : pos + off_size], "big"))
        pos += off_size
    base = pos - 1
    items = [data[base + offsets[i] : base + offsets[i + 1]] for i in range(count)]
    return items, base + offsets[-1]


def _parse_dict(data: bytes) -> dict[int, list[float]]:
    """CFF DICT: operands then a 1- or 2-byte operator. Keys: op (two-byte
    ops stored as 1200+op2)."""
    out: dict[int, list[float]] = {}
    operands: list[float] = []
    i = 0
    while i < len(data):
        b = data[i]
        if b <= 21:  # operator
            if b == 12:
                out[1200 + data[i + 1]] = operands
                i += 2
            else:
                out[b] = operands
                i += 1
            operands = []
        elif 32 <= b <= 246:
            operands.append(b - 139)
            i += 1
        elif 247 <= b <= 250:
            operands.append((b - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b <= 254:
            operands.append(-(b - 251) * 256 - data[i + 1] - 108)
            i += 2
        elif b == 28:
            operands.append(int.from_bytes(data[i + 1 : i + 3], "big", signed=True))
            i += 3
        elif b == 29:
            operands.append(int.from_bytes(data[i + 1 : i + 5], "big", signed=True))
            i += 5
        elif b == 30:  # real number (BCD)
            s = ""
            i += 1
            done = False
            while i < len(data) and not done:
                for nib in (data[i] >> 4, data[i] & 0xF):
                    if nib <= 9:
                        s += str(nib)
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib == 0xF:
                        done = True
                        break
                i += 1
            operands.append(float(s) if s else 0.0)
        else:
            raise ValueError(f"bad CFF dict byte {b}")
    return out


_T2_STEM_OPS = {1, 3, 18, 23}
_T2_MOVETO = {21, 22, 4}


def _t2_width(cs: bytes, default_w: float, nominal_w: float) -> float:
    """Type 2 charstrings carry the width as an optional extra leading
    operand (delta from nominalWidthX) before the first stem/moveto/
    endchar. CFF spec / Type 2 charstring format §3.1."""
    operands: list[float] = []
    i = 0
    while i < len(cs):
        b = cs[i]
        if 32 <= b <= 246:
            operands.append(b - 139)
            i += 1
        elif 247 <= b <= 250:
            operands.append((b - 247) * 256 + cs[i + 1] + 108)
            i += 2
        elif 251 <= b <= 254:
            operands.append(-(b - 251) * 256 - cs[i + 1] - 108)
            i += 2
        elif b == 28:
            operands.append(int.from_bytes(cs[i + 1 : i + 3], "big", signed=True))
            i += 3
        elif b == 255:
            operands.append(
                int.from_bytes(cs[i + 1 : i + 5], "big", signed=True) / 65536.0
            )
            i += 5
        elif b in _T2_STEM_OPS or b in (19, 20):  # stems / hintmask
            return nominal_w + operands[0] if len(operands) % 2 == 1 else default_w
        elif b == 14:  # endchar
            return nominal_w + operands[0] if len(operands) in (1, 5) else default_w
        elif b in _T2_MOVETO:
            expected = {22: 1, 4: 1, 21: 2}[b]
            return (
                nominal_w + operands[0]
                if len(operands) == expected + 1
                else default_w
            )
        else:
            return default_w
    return default_w


class CffFont:
    def __init__(
        self,
        widths_by_gid: list[float],
        code_to_gid: dict[int, int] | None = None,
    ):
        self.widths_by_gid = widths_by_gid
        # byte code -> GID from the CFF's own Encoding + charset; None
        # means identity (no encoding data in the font)
        self.code_to_gid = code_to_gid

    def gid_for_code(self, code: int) -> int:
        if self.code_to_gid is not None:
            return self.code_to_gid.get(code, 0)
        return code

    def width(self, gid: int) -> float | None:
        if 0 <= gid < len(self.widths_by_gid):
            return self.widths_by_gid[gid]
        return None

    def width_for_code(self, code: int) -> float | None:
        return self.width(self.gid_for_code(code))


def _parse_charset(data: bytes, off: int, n_glyphs: int) -> list[int]:
    """charset -> sid_by_gid (CFF spec §13). Offsets 0-2 are the
    predefined charsets (ISOAdobe/Expert/ExpertSubset) — ISOAdobe is
    SID == GID and the Expert ones are treated the same way (widths-only
    approximation); formats 0/1/2 cover embedded charsets."""
    if off in (0, 1, 2):
        return list(range(n_glyphs))
    sids = [0]
    fmt = data[off]
    pos = off + 1
    if fmt == 0:
        for _ in range(n_glyphs - 1):
            sids.append(int.from_bytes(data[pos : pos + 2], "big"))
            pos += 2
    elif fmt in (1, 2):
        nleft_size = 1 if fmt == 1 else 2
        while len(sids) < n_glyphs:
            first = int.from_bytes(data[pos : pos + 2], "big")
            nleft = int.from_bytes(data[pos + 2 : pos + 2 + nleft_size], "big")
            pos += 2 + nleft_size
            for k in range(nleft + 1):
                if len(sids) < n_glyphs:
                    sids.append(first + k)
    else:  # predefined Expert charsets etc.: fall back to identity
        return list(range(n_glyphs))
    return sids


def _parse_encoding(
    data: bytes, off: int, sid_by_gid: list[int]
) -> dict[int, int] | None:
    """Encoding -> code_to_gid (CFF spec §12). Offset 0 = Standard
    (codes 32..126 are SIDs 1..95 in order, resolved through the
    charset); formats 0/1 assign codes to glyphs in GID order;
    supplements map extra codes by SID."""
    sid2gid = {s: g for g, s in enumerate(sid_by_gid)}
    if off == 0:  # Standard encoding
        out = {}
        for code in range(32, 127):
            gid = sid2gid.get(code - 31)
            if gid is not None:
                out[code] = gid
        return out
    if off == 1:  # Expert encoding: not carried; identity fallback
        return None
    fmt = data[off]
    pos = off + 1
    out = {}
    if fmt & 0x7F == 0:
        n_codes = data[pos]
        pos += 1
        for gid in range(1, n_codes + 1):
            out[data[pos]] = gid
            pos += 1
    elif fmt & 0x7F == 1:
        n_ranges = data[pos]
        pos += 1
        gid = 1
        for _ in range(n_ranges):
            first, nleft = data[pos], data[pos + 1]
            pos += 2
            for k in range(nleft + 1):
                out[first + k] = gid
                gid += 1
    else:
        return None
    if fmt & 0x80:  # supplements
        n_sups = data[pos]
        pos += 1
        for _ in range(n_sups):
            code = data[pos]
            sid = int.from_bytes(data[pos + 1 : pos + 3], "big")
            pos += 3
            if sid in sid2gid:
                out[code] = sid2gid[sid]
    return out


def parse_cff(data: bytes) -> CffFont:
    hdr_size = data[2]
    pos = hdr_size
    _names, pos = _read_index(data, pos)
    tops, pos = _read_index(data, pos)
    _strings, pos = _read_index(data, pos)
    _gsubrs, pos = _read_index(data, pos)
    top = _parse_dict(tops[0])
    cs_off = int(top[17][0])
    charstrings, _ = _read_index(data, cs_off)
    default_w, nominal_w = 0.0, 0.0
    if 18 in top:
        priv_size, priv_off = int(top[18][0]), int(top[18][1])
        priv = _parse_dict(data[priv_off : priv_off + priv_size])
        default_w = float(priv.get(20, [0.0])[0])
        nominal_w = float(priv.get(21, [0.0])[0])
    widths = [_t2_width(cs, default_w, nominal_w) for cs in charstrings]
    code_to_gid = None
    try:
        sid_by_gid = _parse_charset(
            data, int(top.get(15, [0])[0]), len(charstrings)
        )
        code_to_gid = _parse_encoding(
            data, int(top.get(16, [0])[0]), sid_by_gid
        )
    except Exception:
        code_to_gid = None  # malformed tables: identity fallback
    return CffFont(widths, code_to_gid)
