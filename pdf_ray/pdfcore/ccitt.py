"""CCITTFaxDecode — ITU-T T.4 (Group 3) / T.6 (Group 4) bitonal decode.

The reference leaves this filter as todo!() (src/filter/mod.rs:51); we
implement the spec subset PDFs actually use (PDF 32000-1 §7.4.6):

- K < 0: pure 2-D (Group 4 / MMR) — the common case in scanned PDFs
- K = 0: 1-D modified Huffman (Group 3)
- K > 0: mixed 2-D Group 3 (EOL+tag-bit per row)
- Columns / Rows / BlackIs1 / EncodedByteAlign / EndOfLine honored;
  EndOfBlock (EOFB/RTC) terminates when Rows is absent

Output is packed 1-bit rows, MSB-first, each row padded to a byte
boundary — by default (BlackIs1 false) black pixels are 0 bits, which is
exactly DeviceGray 1-bit's black, so the image stage consumes it as-is.

Code tables are the public ITU T.4 modified-Huffman white/black
run-length codes (terminating 0-63, makeup 64-1728, extended 1792-2560);
the fixture encoder (fixtures/ccittenc.py) shares these tables and the
unit tests pin well-known codewords to guard against transcription
errors.
"""

from __future__ import annotations

from bisect import bisect_right

from .objects import PdfParseError

# -- ITU T.4 modified Huffman run-length code tables ------------------------

WHITE_CODES: dict[int, str] = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    # makeup
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

BLACK_CODES: dict[int, str] = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
    # makeup
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup codes, shared by both colors (T.4 §2 table 3)
EXT_CODES: dict[int, str] = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

EOL = "000000000001"


def _decode_table(codes: dict[int, str]) -> dict[tuple[int, int], int]:
    t = {(len(c), int(c, 2)): run for run, c in codes.items()}
    t.update({(len(c), int(c, 2)): run for run, c in EXT_CODES.items()})
    return t

_WHITE_LOOKUP = _decode_table(WHITE_CODES)
_BLACK_LOOKUP = _decode_table(BLACK_CODES)


class _Bits:
    __slots__ = ("data", "pos")  # pos in bits

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= 8 * len(self.data)

    def bit(self) -> int:
        if self.eof():
            raise PdfParseError("CCITT: out of data")
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def peek(self, n: int) -> int:
        save = self.pos
        v = 0
        try:
            for _ in range(n):
                v = (v << 1) | self.bit()
        except PdfParseError:
            self.pos = save
            raise
        self.pos = save
        return v

    def try_eat(self, code: str) -> bool:
        n = len(code)
        if self.pos + n > 8 * len(self.data):
            return False
        if self.peek(n) == int(code, 2):
            self.pos += n
            return True
        return False

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_run(bits: _Bits, white: bool) -> int:
    """One complete run length: zero or more makeup codes + a
    terminating code (< 64)."""
    lookup = _WHITE_LOOKUP if white else _BLACK_LOOKUP
    total = 0
    while True:
        acc = 0
        length = 0
        run = None
        while length < 14:
            acc = (acc << 1) | bits.bit()
            length += 1
            run = lookup.get((length, acc))
            if run is not None:
                break
        if run is None:
            raise PdfParseError("CCITT: bad run code")
        total += run
        if run < 64:
            return total


def _row_bytes(transitions: list[int], columns: int, black_is_1: bool) -> bytes:
    """Pack a row from its run-start transition list (runs alternate
    starting white at 0). Default coding: white=1 bits, black=0."""
    out = bytearray((columns + 7) // 8)
    white_val = 0 if black_is_1 else 1
    run_starts = [0] + transitions + [columns]
    for i in range(len(run_starts) - 1):
        start, end = run_starts[i], run_starts[i + 1]
        start, end = max(0, min(start, columns)), max(0, min(end, columns))
        is_white = i % 2 == 0
        val = white_val if is_white else 1 - white_val
        if val:
            for p in range(start, end):
                out[p >> 3] |= 0x80 >> (p & 7)
    return bytes(out)


def _decode_1d_row(bits: _Bits, columns: int) -> list[int]:
    """One MH-coded row -> transition list."""
    transitions: list[int] = []
    pos = 0
    white = True
    while pos < columns:
        run = _read_run(bits, white)
        pos += run
        transitions.append(min(pos, columns))
        white = not white
    return transitions


def _find_b1(ref: list[int], a0: int, color_white: bool, columns: int) -> tuple[int, int]:
    """b1: first changing element on the reference line right of a0 with
    color opposite to a0's color; b2: the next one after b1. ``ref`` holds
    run-start transitions (even index = black run start)."""
    i = bisect_right(ref, a0 if a0 >= 0 else -1)
    # transition ref[i] starts a black run if i is even; we need the pixel
    # at b1 to be black when current color is white and vice versa
    want_even = color_white
    if i < len(ref) and (i % 2 == 0) != want_even:
        i += 1
    b1 = ref[i] if i < len(ref) else columns
    b2 = ref[i + 1] if i + 1 < len(ref) else columns
    return b1, b2


def _decode_2d_row(bits: _Bits, ref: list[int], columns: int) -> list[int]:
    """One 2-D-coded row (T.6 / T.4 2-D data portion) -> transitions."""
    transitions: list[int] = []
    a0 = -1
    white = True
    while a0 < columns:
        b1, b2 = _find_b1(ref, a0, white, columns)
        if bits.try_eat("1"):  # V0
            a1 = b1
        elif bits.try_eat("011"):  # VR1
            a1 = b1 + 1
        elif bits.try_eat("010"):  # VL1
            a1 = b1 - 1
        elif bits.try_eat("001"):  # horizontal
            start = max(a0, 0)
            r1 = _read_run(bits, white)
            r2 = _read_run(bits, not white)
            a1 = start + r1
            a2 = a1 + r2
            transitions.append(min(a1, columns))
            transitions.append(min(a2, columns))
            a0 = a2
            continue
        elif bits.try_eat("0001"):  # pass
            a0 = b2
            continue
        elif bits.try_eat("000011"):  # VR2
            a1 = b1 + 2
        elif bits.try_eat("000010"):  # VL2
            a1 = b1 - 2
        elif bits.try_eat("0000011"):  # VR3
            a1 = b1 + 3
        elif bits.try_eat("0000010"):  # VL3
            a1 = b1 - 3
        else:
            raise PdfParseError("CCITT: bad 2-D mode code")
        transitions.append(min(max(a1, 0), columns))
        white = not white
        a0 = a1
    return transitions


def ccitt_fax_decode(data: bytes, parms: dict | None) -> bytes:
    p = parms or {}
    k = int(p.get("K", 0))
    columns = int(p.get("Columns", 1728))
    rows = int(p.get("Rows", 0))
    black_is_1 = bool(p.get("BlackIs1", False))
    byte_align = bool(p.get("EncodedByteAlign", False))

    bits = _Bits(data)
    out = bytearray()
    ref = [columns, columns]  # imaginary all-white reference line
    n_rows = 0
    while rows == 0 or n_rows < rows:
        # EncodedByteAlign: fill bits pad each row (and each EOL, which
        # the next row's tag bit follows immediately) to a byte boundary —
        # so alignment happens BEFORE the EOL scan for every K (T.4 §4.2.2)
        if byte_align:
            bits.align()
        # EOL / EOFB handling (optional in G4; per-row in G3)
        eols = 0
        while bits.try_eat(EOL):
            eols += 1
            if k > 0:  # mixed mode: tag bit selects 1-D/2-D for this row
                break
        if eols >= 2:
            break  # EOFB / RTC
        if bits.eof():
            break
        try:
            if k < 0:
                transitions = _decode_2d_row(bits, ref, columns)
            elif k == 0:
                transitions = _decode_1d_row(bits, columns)
            else:
                use_1d = bits.bit() == 1 if eols else True
                transitions = (
                    _decode_1d_row(bits, columns)
                    if use_1d
                    else _decode_2d_row(bits, ref, columns)
                )
        except PdfParseError:
            if rows == 0 and n_rows:  # trailing padding after last row
                break
            raise
        out += _row_bytes(transitions, columns, black_is_1)
        ref = transitions
        n_rows += 1
        if rows == 0 and bits.eof():
            break
    if rows and n_rows < rows:
        raise PdfParseError(f"CCITT: got {n_rows} rows, expected {rows}")
    return bytes(out)
