"""Byte-level PDF object lexer.

Re-implements the reference lexer semantics exactly (these define span-text
parity, see SURVEY.md §7.4.1):

- reference: src/lex.rs (LexBase / LexObject traits)
- literal strings map each byte to the codepoint of equal value
  (Latin-1 style), with ``\\n \\r \\t \\b \\f \\( \\) \\\\`` escapes, 1-3 digit
  octal escapes (mod 256), and backslash-newline line continuations that
  swallow all following whitespace/comments (src/lex.rs:222-287)
- hex strings: two hex digits per codepoint, or four (UTF-16 code units)
  when the string starts with ``FEFF``; missing trailing digits are treated
  as zero via the same left-shift loop (src/lex.rs:394-443)
- names support ``#XX`` hex escapes (src/lex.rs:183-220)
- ``12 0 R`` vs ``12 0`` disambiguation backtracks, and requires the ``R``
  to be followed by a delimiter or whitespace (src/lex.rs:447-497)
- whitespace skipping also consumes ``%`` comments (src/lex.rs:17-28)
"""

from __future__ import annotations

import re

from .objects import NULL, Name, PdfParseError, Ref, Stream

WHITESPACE = frozenset((0x00, 0x09, 0x0A, 0x0C, 0x0D, 0x20))
DELIMITERS = frozenset(b"()<>[]{}/%")

# regular (name) chars: not whitespace, not delimiter
_NAME_RUN = re.compile(rb"[^\x00\x09\x0a\x0c\x0d\x20()<>\[\]{}/%]*")
_DIGIT_RUN = re.compile(rb"[0-9]*")
_WS_OR_COMMENT = re.compile(rb"(?:[\x00\x09\x0a\x0c\x0d\x20]+|%[^\r\n]*)+")
_WS_RUN = re.compile(rb"[\x00\x09\x0a\x0c\x0d\x20]+")
_STRING_SPECIALS = re.compile(rb"[()\\]")
_HEX = {
    **{ord("0") + i: i for i in range(10)},
    **{ord("a") + i: 10 + i for i in range(6)},
    **{ord("A") + i: 10 + i for i in range(6)},
}
_DIGITS = frozenset(range(ord("0"), ord("9") + 1))


def is_regular(b: int) -> bool:
    return b not in WHITESPACE and b not in DELIMITERS


class Lexer:
    """Cursor-based lexer over a PDF byte buffer.

    ``resolve`` is an optional callback used to chase indirect ``/Length``
    values when lexing streams (src/stream.rs:126-152); the top-level
    ``Document`` provides it. When ``resolve`` is None, dictionaries
    followed by ``stream`` raise unless ``Length`` is a direct integer.
    """

    __slots__ = ("buf", "pos", "resolve")

    def __init__(self, buf: bytes, resolve=None):
        self.buf = buf
        self.pos = 0
        self.resolve = resolve

    # -- byte-level primitives (src/lex.rs:12-180) --------------------------

    def peek(self, off: int = 0) -> int | None:
        i = self.pos + off
        return self.buf[i] if i < len(self.buf) else None

    def next_byte(self) -> int | None:
        b = self.peek()
        if b is not None:
            self.pos += 1
        return b

    def expect(self, token: bytes) -> None:
        if self.buf[self.pos : self.pos + len(token)] != token:
            raise PdfParseError(
                f"expected {token!r} at offset {self.pos}, "
                f"found {self.buf[self.pos : self.pos + len(token)]!r}"
            )
        self.pos += len(token)

    def next_matches(self, token: bytes) -> bool:
        return self.buf[self.pos : self.pos + len(token)] == token

    def skip_whitespace(self) -> None:
        # hot path (called before every lexed token): cheap first-byte
        # test, then one regex pass over whitespace runs and %-comments
        # (most calls find NO whitespace — a failed regex costs more than
        # the byte check; a long run costs less than the old byte loop)
        buf, pos = self.buf, self.pos
        if pos < len(buf) and (buf[pos] in WHITESPACE or buf[pos] == 0x25):
            self.pos = _WS_OR_COMMENT.match(buf, pos).end()

    def expect_eol(self) -> None:
        b = self.next_byte()
        if b == 0x0A:
            return
        if b == 0x0D:
            if self.peek() == 0x0A:
                self.pos += 1
            return
        raise PdfParseError(f"expected EOL, found {b!r}")

    def lex_whole_number(self) -> str:
        m = _DIGIT_RUN.match(self.buf, self.pos)
        self.pos = m.end()
        return m.group().decode("ascii")

    # -- object lexing (src/lex.rs:307-533) ---------------------------------

    def lex_object(self):
        self.skip_whitespace()
        b = self.peek()
        if b is None:
            raise PdfParseError("unexpected EOF while lexing object")
        if b == ord("t"):
            self.expect(b"true")
            obj = True
        elif b == ord("f"):
            self.expect(b"false")
            obj = False
        elif b == ord("n"):
            self.expect(b"null")
            obj = NULL
        elif b == ord("<"):
            obj = self._lex_gt()
        elif b in _DIGITS or b in (ord("+"), ord("-"), ord(".")):
            obj = self._lex_number()
        elif b == ord("("):
            obj = self.lex_string()
        elif b == ord("/"):
            obj = self.lex_name()
        elif b == ord("["):
            obj = self._lex_array()
        else:
            raise PdfParseError(f"unexpected object start {bytes([b])!r} at {self.pos}")
        self.skip_whitespace()
        return obj

    def lex_name(self) -> Name:
        self.expect(b"/")
        m = _NAME_RUN.match(self.buf, self.pos)
        run = m.group()
        self.pos = m.end()
        if b"#" not in run:
            return Name(run.decode("latin-1"))
        out: list[str] = []
        i = 0
        while i < len(run):
            b = run[i]
            if b == 0x23:  # '#XX' hex escape
                if i + 2 >= len(run) or run[i + 1] not in _HEX or run[i + 2] not in _HEX:
                    raise PdfParseError("bad #-escape in name")
                out.append(chr(_HEX[run[i + 1]] * 16 + _HEX[run[i + 2]]))
                i += 3
            else:
                out.append(chr(b))
                i += 1
        return Name("".join(out))

    def lex_string(self) -> str:
        """Literal string ``(...)`` -> codepoint-per-byte str
        (src/lex.rs:222-287; this output IS the span text at parity).
        Plain byte runs are bulk-decoded; the per-byte loop only handles
        the special bytes ``( ) \\``."""
        self.expect(b"(")
        out: list[str] = []
        depth = 0
        buf = self.buf
        specials = _STRING_SPECIALS
        while True:
            m = specials.search(buf, self.pos)
            if m is not None and m.start() > self.pos:
                out.append(buf[self.pos : m.start()].decode("latin-1"))
                self.pos = m.start()
            b = self.peek()
            if b is None:
                break
            if b == ord(")"):
                if depth == 0:
                    self.pos += 1
                    break
                depth -= 1
                out.append(")")
            elif b == ord("("):
                depth += 1
                out.append("(")
            elif b == ord("\\"):
                self.pos += 1
                e = self.next_byte()
                if e is None:
                    raise PdfParseError("EOF in string escape")
                if e == ord("n"):
                    out.append("\n")
                elif e == ord("r"):
                    out.append("\r")
                elif e == ord("t"):
                    out.append("\t")
                elif e == ord("b"):
                    out.append("\x08")
                elif e == ord("f"):
                    out.append("\x0c")
                elif e in (ord("("), ord(")"), ord("\\")):
                    out.append(chr(e))
                elif e in (0x0A, 0x0D):
                    # line continuation swallows following whitespace+comments
                    self.skip_whitespace()
                else:
                    # octal escape \d, \dd, \ddd (u8 arithmetic -> mod 256)
                    v = (e - ord("0")) & 0xFF
                    for _ in range(2):
                        d = self.peek()
                        if d is None or d not in _DIGITS:
                            break
                        self.pos += 1
                        v = (v * 8 + (d - ord("0"))) & 0xFF
                    out.append(chr(v))
                continue
            else:
                out.append(chr(b))
            self.pos += 1
        return "".join(out)

    def _read_hex_char(self, is_utf16: bool) -> str:
        """One output codepoint from 2 (or 4 for UTF-16) hex digits; missing
        trailing digits shift in zeroes (src/lex.rs:394-419)."""
        val = 0
        want = 4 if is_utf16 else 2
        count = 0
        while True:
            b = self.peek()
            if b is None:
                break
            val *= 16
            if b == ord(">"):
                break
            self.pos += 1
            if b not in _HEX:
                raise PdfParseError(f"bad hex digit {bytes([b])!r}")
            val += _HEX[b]
            count += 1
            if count == want:
                break
        return chr(val)

    def lex_hex_string(self) -> str:
        self.expect(b"<")
        is_utf16 = self.next_matches(b"feff") or self.next_matches(b"FEFF")
        if is_utf16:
            self.pos += 4
        out: list[str] = []
        while True:
            b = self.peek()
            if b is None:
                break
            if b == ord(">"):
                self.pos += 1
                break
            out.append(self._read_hex_char(is_utf16))
        return "".join(out)

    def _lex_gt(self):
        nxt = self.peek(1)
        if nxt == ord("<"):
            return self.lex_dict()
        if nxt == ord(">"):  # special-cased empty byte string `<>`
            self.pos += 2
            return ""
        if nxt is not None and nxt in _HEX:
            return self.lex_hex_string()
        raise PdfParseError(f"unexpected byte after '<': {nxt!r}")

    def _lex_number(self):
        neg = 1
        b = self.peek()
        if b == ord("+"):
            self.pos += 1
        elif b == ord("-"):
            self.pos += 1
            neg = -1
        whole = self.lex_whole_number()
        whole_end = self.pos
        if self.peek() == ord("."):
            self.pos += 1
            frac = self.lex_whole_number()
            return float(f"{whole}.{frac}" if whole or frac else "0") * neg
        # possible indirect reference `<num> <gen> R` (src/lex.rs:473-494)
        self.skip_whitespace()
        b = self.peek()
        if b is not None and b in _DIGITS:
            gen = self.lex_whole_number()
            self.skip_whitespace()
            r = self.next_byte()
            nxt = self.peek()
            if r == ord("R") and nxt is not None and (
                nxt in WHITESPACE or nxt in DELIMITERS
            ):
                return Ref(int(whole), int(gen))
            self.pos = whole_end
        if not whole:
            raise PdfParseError("empty number")
        return int(whole) * neg

    def _lex_array(self) -> list:
        self.expect(b"[")
        self.skip_whitespace()
        arr = []
        while True:
            b = self.peek()
            if b is None:
                raise PdfParseError("unterminated array")
            if b == ord("]"):
                self.pos += 1
                break
            arr.append(self.lex_object())
        return arr

    def lex_dict_only(self) -> dict:
        """``<< ... >>`` without stream detection (src/lex.rs:366-389)."""
        self.expect(b"<<")
        self.skip_whitespace()
        d: dict = {}
        while True:
            b = self.peek()
            if b is None:
                raise PdfParseError("unterminated dictionary")
            if b == ord(">"):
                self.pos += 1
                self.expect(b">")
                break
            key = self.lex_name()
            val = self.lex_object()
            self.skip_whitespace()
            d[str(key)] = val
        self.skip_whitespace()
        return d

    def lex_dict(self):
        """Dict, or Stream when followed by the ``stream`` keyword
        (src/lib.rs Lexer::lex_dict + src/lex.rs:516-533)."""
        d = self.lex_dict_only()
        if not self.next_matches(b"stream"):
            return d
        self.expect(b"stream")
        self.expect_eol()
        length = d.get("Length")
        if isinstance(length, Ref):
            if self.resolve is None:
                raise PdfParseError("indirect /Length with no resolver")
            length = self.resolve(length)
        if not isinstance(length, int):
            raise PdfParseError(f"bad stream /Length: {length!r}")
        raw = self.buf[self.pos : self.pos + length]
        if len(raw) != length:
            raise PdfParseError("stream shorter than /Length")
        self.pos += length
        self.skip_whitespace()
        self.expect(b"endstream")
        self.skip_whitespace()
        return Stream(d, raw)

    # -- indirect object framing (src/lex.rs:544-561) -----------------------

    def read_obj_prelude(self) -> None:
        self.skip_whitespace()
        self.lex_whole_number()
        self.skip_whitespace()
        self.lex_whole_number()
        self.skip_whitespace()
        self.expect(b"obj")
        self.skip_whitespace()
