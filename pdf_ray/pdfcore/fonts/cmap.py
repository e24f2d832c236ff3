"""ToUnicode / embedded CMap interpreter.

The reference captures ToUnicode streams but never interprets them
(src/font/cmap.rs:5-10 — "todo"); we implement the spec subset that
matters for text enrichment: codespacerange (code byte-width),
bfchar and bfrange mappings (PDF 32000-1 §9.10.3)."""

from __future__ import annotations

import re

_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


class ToUnicodeCMap:
    def __init__(self):
        self.code_widths: set[int] = set()  # byte widths from codespacerange
        self.single: dict[int, str] = {}
        self.ranges: list[tuple[int, int, object]] = []  # (lo, hi, dst)

    @property
    def code_bytes(self) -> int:
        return max(self.code_widths) if self.code_widths else 1

    def map_code(self, code: int) -> str | None:
        got = self.single.get(code)
        if got is not None:
            return got
        for lo, hi, dst in self.ranges:
            if lo <= code <= hi:
                if isinstance(dst, list):
                    return dst[code - lo] if code - lo < len(dst) else None
                return "".join(
                    chr(c)
                    for c in _add_to_codepoints(dst, code - lo)
                )
        return None


def _utf16be_to_str(raw: bytes) -> str:
    try:
        return raw.decode("utf-16-be")
    except UnicodeDecodeError:
        return "".join(
            chr(int.from_bytes(raw[i : i + 2], "big"))
            for i in range(0, len(raw) - 1, 2)
        )


def _add_to_codepoints(base: str, delta: int):
    """bfrange dst increment applies to the LAST code unit (spec)."""
    if not base:
        return []
    cps = [ord(c) for c in base]
    cps[-1] += delta
    return cps


class CidCMap:
    """code -> CID mapping from an embedded CMap stream (begincidchar /
    begincidrange). The reference captures these streams without decoding
    them (src/font/type0.rs:34-81); we interpret the spec subset."""

    def __init__(self):
        self.code_widths: set[int] = set()
        self.single: dict[int, int] = {}
        self.ranges: list[tuple[int, int, int]] = []  # (lo, hi, first_cid)

    @property
    def code_bytes(self) -> int:
        return max(self.code_widths) if self.code_widths else 2

    def map_code(self, code: int) -> int | None:
        got = self.single.get(code)
        if got is not None:
            return got
        for lo, hi, first in self.ranges:
            if lo <= code <= hi:
                return first + (code - lo)
        return None


_CIDCHAR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s+(\d+)")
_CIDRANGE_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s+(\d+)")


def parse_cid_cmap(data: bytes) -> CidCMap:
    cmap = CidCMap()
    for m in re.finditer(
        rb"begincodespacerange(.*?)endcodespacerange", data, re.S
    ):
        for t in _HEX_RE.findall(m.group(1)):
            cmap.code_widths.add(len(t) // 2)
    for m in re.finditer(rb"begincidchar(.*?)endcidchar", data, re.S):
        for src, cid in _CIDCHAR_RE.findall(m.group(1)):
            cmap.single[int(src, 16)] = int(cid)
    for m in re.finditer(rb"begincidrange(.*?)endcidrange", data, re.S):
        for lo, hi, cid in _CIDRANGE_RE.findall(m.group(1)):
            cmap.ranges.append((int(lo, 16), int(hi, 16), int(cid)))
    return cmap


def parse_tounicode(data: bytes) -> ToUnicodeCMap:
    cmap = ToUnicodeCMap()
    i = 0
    n = len(data)

    def hex_tokens(upto: bytes, start: int):
        """Collect <...> tokens (and [ ... ] arrays of them) until keyword."""
        end = data.find(upto, start)
        if end == -1:
            return [], n
        return data[start:end], end + len(upto)

    while i < n:
        j = data.find(b"begincodespacerange", i)
        k = data.find(b"beginbfchar", i)
        m = data.find(b"beginbfrange", i)
        nxt = min(x for x in (j, k, m, n) if x != -1)
        if nxt == n:
            break
        if nxt == j:
            body, i = hex_tokens(b"endcodespacerange", j + 19)
            toks = _HEX_RE.findall(body)
            for t in toks:
                cmap.code_widths.add(len(t) // 2)
        elif nxt == k:
            body, i = hex_tokens(b"endbfchar", k + 11)
            toks = _HEX_RE.findall(body)
            for a in range(0, len(toks) - 1, 2):
                src = int(toks[a], 16)
                dst = _utf16be_to_str(bytes.fromhex(toks[a + 1].decode()))
                cmap.single[src] = dst
        else:
            body, i = hex_tokens(b"endbfrange", m + 12)
            # entries: <lo> <hi> <dst>   |   <lo> <hi> [<d1> <d2> ...]
            lexer_like = re.findall(
                rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)",
                body,
            )
            for lo_h, hi_h, dst_tok in lexer_like:
                lo, hi = int(lo_h, 16), int(hi_h, 16)
                if dst_tok.startswith(b"["):
                    arr = [
                        _utf16be_to_str(bytes.fromhex(t.decode()))
                        for t in _HEX_RE.findall(dst_tok)
                    ]
                    cmap.ranges.append((lo, hi, arr))
                else:
                    dst = _utf16be_to_str(
                        bytes.fromhex(dst_tok.strip(b"<>").decode())
                    )
                    cmap.ranges.append((lo, hi, dst))
    return cmap
