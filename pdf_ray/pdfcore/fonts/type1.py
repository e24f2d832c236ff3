"""Type 1 font program parser: eexec decryption, charstring decryption,
width + encoding extraction.

The reference runs a full PostScript interpreter to load these
(src/postscript/interpreter.rs:22-126, ~2,600 LoC); for extraction we need
only the /Encoding array and per-glyph widths (hsbw/sbw operands,
src/postscript/charstring.rs) — outline evaluation is deliberately skipped
(SURVEY.md §2.5 T9/T10). Decryption r-values and the algorithm follow the
Type 1 Font Format spec §7.2 (same as src/postscript/decode.rs:1-22).
"""

from __future__ import annotations

import re

EEXEC_R = 55665
CHARSTRING_R = 4330
_C1, _C2 = 52845, 22719


def decrypt(cipher: bytes, r: int, lead: int) -> bytes:
    out = bytearray()
    for c in cipher:
        out.append((c ^ (r >> 8)) & 0xFF)
        r = ((c + r) * _C1 + _C2) & 0xFFFF
    return bytes(out[lead:])


_ENC_RE = re.compile(rb"dup\s+(\d+)\s*/([^\s/]+)\s+put")
_CS_RE = re.compile(rb"/([^\s/{}()\[\]<>]+)\s+(\d+)\s+(RD|-\|)[ ]")
_LENIV_RE = re.compile(rb"/lenIV\s+(\d+)")


def _charstring_width(cs: bytes) -> float | None:
    """Execute just enough Type1 charstring to get the advance width:
    ``sbx wx hsbw`` (op 13) or ``sbx sby wx wy sbw`` (esc 7)."""
    stack: list[float] = []
    i = 0
    while i < len(cs):
        b = cs[i]
        if b >= 32:
            if b <= 246:
                stack.append(b - 139)
                i += 1
            elif b <= 250:
                if i + 1 >= len(cs):
                    return None
                stack.append((b - 247) * 256 + cs[i + 1] + 108)
                i += 2
            elif b <= 254:
                if i + 1 >= len(cs):
                    return None
                stack.append(-(b - 251) * 256 - cs[i + 1] - 108)
                i += 2
            else:  # 255: 32-bit int
                if i + 4 >= len(cs):
                    return None
                stack.append(
                    int.from_bytes(cs[i + 1 : i + 5], "big", signed=True)
                )
                i += 5
        elif b == 13:  # hsbw: sbx wx
            return stack[1] if len(stack) >= 2 else None
        elif b == 12:  # escape
            if i + 1 < len(cs) and cs[i + 1] == 7:  # sbw: sbx sby wx wy
                return stack[2] if len(stack) >= 4 else None
            i += 2
            stack.clear()
        else:
            return None  # any other op before hsbw -> malformed for widths
    return None


class Type1Font:
    """encoding: code -> glyph name; widths: glyph name -> advance
    (font units, FontMatrix usually /1000)."""

    def __init__(self, encoding: dict[int, str], widths: dict[str, float]):
        self.encoding = encoding
        self.widths = widths

    def width(self, code: int) -> float | None:
        name = self.encoding.get(code)
        return self.widths.get(name) if name else None


def parse_type1(data: bytes) -> Type1Font:
    idx = data.find(b"currentfile eexec")
    if idx == -1:
        raise ValueError("no eexec section")
    clear = data[:idx]
    enc_start = idx + len(b"currentfile eexec")
    while enc_start < len(data) and data[enc_start] in b"\r\n\t ":
        enc_start += 1
    cipher = data[enc_start:]
    # PFB/hex detection: if the first 4 bytes are all hex chars the eexec
    # portion is ASCII-hex encoded (Type 1 spec) — decode first
    head = cipher[:4]
    if all(c in b"0123456789abcdefABCDEF" for c in head):
        hex_bytes = re.sub(rb"[^0-9a-fA-F]", b"", cipher)
        cipher = bytes.fromhex(hex_bytes.decode("ascii"))
    private = decrypt(cipher, EEXEC_R, 4)

    encoding: dict[int, str] = {}
    for m in _ENC_RE.finditer(clear):
        encoding[int(m.group(1))] = m.group(2).decode("latin-1")
    if not encoding and b"StandardEncoding" in clear:
        from .encodings import STANDARD_ENCODING

        encoding = dict(STANDARD_ENCODING)

    m = _LENIV_RE.search(private)
    len_iv = int(m.group(1)) if m else 4

    widths: dict[str, float] = {}
    cs_idx = private.find(b"/CharStrings")
    pos = cs_idx if cs_idx != -1 else 0
    while True:
        m = _CS_RE.search(private, pos)
        if m is None:
            break
        name = m.group(1).decode("latin-1")
        length = int(m.group(2))
        start = m.end()
        cs = decrypt(private[start : start + length], CHARSTRING_R, len_iv)
        w = _charstring_width(cs)
        if w is not None and name != "CharStrings":
            widths[name] = w
        pos = start + length
    return Type1Font(encoding, widths)
