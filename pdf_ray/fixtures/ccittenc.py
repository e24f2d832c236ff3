"""CCITT Group 3/4 fax ENCODER (fixture/test side).

Shares the ITU T.4 code tables with pdfcore.ccitt so round-trip property
tests exercise the decoder on arbitrary bitmaps, and fixtures can carry
real CCITTFaxDecode streams. Standard coder: vertical mode when
|a1-b1| <= 3, else pass/horizontal (T.6 §2.2.3).
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

from ..pdfcore.ccitt import BLACK_CODES, EOL, WHITE_CODES, _find_b1


class _BitWriter:
    def __init__(self):
        self.bits: list[str] = []

    def write(self, code: str) -> None:
        self.bits.append(code)

    def align(self) -> None:
        n = len("".join(self.bits)) % 8
        if n:
            self.bits.append("0" * (8 - n))

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _run_code(run: int, white: bool) -> str:
    codes = WHITE_CODES if white else BLACK_CODES
    out = []
    makeups = sorted(k for k in codes if k >= 64)
    while run >= 64:
        mk = max(m for m in makeups if m <= run)
        out.append(codes[mk])
        run -= mk
    out.append(codes[run])
    return "".join(out)


def _transitions(row: np.ndarray) -> list[int]:
    """Run-start positions (first black start, alternating) for a bool row
    where True = black."""
    change = np.nonzero(np.diff(row.astype(np.int8)))[0] + 1
    ts = list(change)
    if row[0]:  # line starts black: transition at 0
        ts = [0] + ts
    return [int(t) for t in ts]


# b1/b2 search shared with the decoder (pdfcore.ccitt._find_b1): encoder
# and decoder must agree on the changing-element parity rule

_V_CODES = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
            3: "0000011", -3: "0000010"}


def _encode_2d_row(bw: _BitWriter, cur: list[int], ref: list[int],
                   columns: int) -> None:
    a0 = -1
    white = True
    while a0 < columns:
        b1, b2 = _find_b1(ref, a0, white, columns)
        i = bisect_right(cur, a0 if a0 >= 0 else -1)
        a1 = cur[i] if i < len(cur) else columns
        a2 = cur[i + 1] if i + 1 < len(cur) else columns
        if b2 < a1:
            bw.write("0001")  # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            bw.write(_V_CODES[a1 - b1])
            a0 = a1
            white = not white
        else:
            bw.write("001")  # horizontal
            start = max(a0, 0)
            bw.write(_run_code(a1 - start, white))
            bw.write(_run_code(a2 - a1, not white))
            a0 = a2


def encode_g4(
    img: np.ndarray, eofb: bool = True, byte_align: bool = False
) -> bytes:
    """img: 2-D bool/0-1 array, True/1 = BLACK. Returns T.6 (K<0) data.
    ``byte_align``: pad each row start to a byte boundary
    (EncodedByteAlign)."""
    img = np.asarray(img).astype(bool)
    h, w = img.shape
    bw = _BitWriter()
    ref = [w, w]
    for y in range(h):
        if byte_align:
            bw.align()
        cur = _transitions(img[y])
        _encode_2d_row(bw, cur, ref, w)
        ref = cur
    if eofb:
        if byte_align:
            bw.align()
        bw.write(EOL + EOL)
    return bw.tobytes()


def encode_g3_mixed_1d(img: np.ndarray) -> bytes:
    """K>0 mixed-mode stream that happens to code every row 1-D:
    per row EOL + tag bit 1 + MH data (the decoder's K>0 path)."""
    img = np.asarray(img).astype(bool)
    h, w = img.shape
    bw = _BitWriter()
    for y in range(h):
        bw.write(EOL)
        bw.write("1")  # tag: this row is 1-D coded
        _write_1d_row(bw, img[y], w)
    return bw.tobytes()


def _write_1d_row(bw: _BitWriter, row: np.ndarray, w: int) -> None:
    ts = _transitions(row) + [w]
    run_starts = [0] + ts
    white = True
    for i in range(len(run_starts) - 1):
        run = run_starts[i + 1] - run_starts[i]
        bw.write(_run_code(run, white))
        white = not white


def encode_g3_1d(
    img: np.ndarray, eol: bool = True, byte_align: bool = False
) -> bytes:
    """K=0 modified-Huffman rows (optional leading EOL per row;
    ``byte_align`` pads fill bits before each row)."""
    img = np.asarray(img).astype(bool)
    h, w = img.shape
    bw = _BitWriter()
    for y in range(h):
        if byte_align:
            bw.align()
        if eol:
            bw.write(EOL)
        row = img[y]
        ts = _transitions(row) + [w]
        run_starts = [0] + ts
        white = True
        for i in range(len(run_starts) - 1):
            run = run_starts[i + 1] - run_starts[i]
            bw.write(_run_code(run, white))
            white = not white
        # rows whose last run ended exactly at w: nothing more to emit
    return bw.tobytes()
