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


# -- predefined CMaps (names from the reference's enum,
#    /root/reference/src/font/cjk.rs:1-190; the reference ships names only,
#    no mapping data) -----------------------------------------------------
#
# The UCS2/UTF16 families have a UCS-2 / UTF-16BE *code space* (public
# spec, PDF 32000-1 §9.7.5.2 + Adobe CMap resources docs): the 2-byte code
# IS the Unicode BMP code point. We treat CID = code for them — an
# explicit approximation (Adobe's real Uni* CMaps map Unicode to
# ROS-specific CIDs via licensed tables), which affects only WIDTH lookup:
# span text comes from the string lexer (parity anchor, SURVEY §2.4 C12)
# and unicode enrichment chr(code) is exactly right for the BMP.
# Legacy multi-byte encodings (RKSJ/EUC/B5/GBK/UHC/...) cannot be decoded
# without Adobe's tables -> row-level error, same containment as
# CCITT/JBIG2.

_PREDEFINED_UCS2_UTF16 = frozenset(
    base + suffix
    for base in (
        "UniGB-UCS2", "UniGB-UTF16",
        "UniCNS-UCS2", "UniCNS-UTF16",
        "UniJIS-UCS2", "UniJIS-UTF16", "UniJIS-UCS2-HW",
        "UniKS-UCS2", "UniKS-UTF16",
    )
    for suffix in ("-H", "-V")
)

_PREDEFINED_LEGACY = frozenset(
    {
        "GB-EUC-H", "GB-EUC-V", "GBpc-EUC-H", "GBpc-EUC-V",
        "GBK-EUC-H", "GBK-EUC-V", "GBKp-EUC-H", "GBKp-EUC-V",
        "GBK2K-H", "GBK2K-V",
        "B5pc-H", "B5pc-V", "HKscs-B5-H", "HKscs-B5-V",
        "ETen-B5-H", "ETen-B5-V", "ETenms-B5-H", "ETenms-B5-V",
        "CNS-EUC-H", "CNS-EUC-V",
        "83pv-RKSJ-H", "90ms-RKSJ-H", "90ms-RKSJ-V", "90msp-RKSJ-H",
        "90msp-RKSJ-V", "90pv-RKSJ-H", "Add-RKSJ-H", "Add-RKSJ-V",
        "EUC-H", "EUC-V", "Ext-RKSJ-H", "Ext-RKSJ-V", "H", "V",
        "KSC-EUC-H", "KSC-EUC-V", "KSCms-UHC-H", "KSCms-UHC-V",
        "KSCms-UHC-HW-H", "KSCms-UHC-HW-V", "KSCpc-EUC-H",
    }
)


def predefined_cid_cmap(name: str) -> int:
    """Resolve a predefined CMap NAME to its code byte-width with
    CID = code semantics (Identity + UCS2/UTF16 families). Raises for
    names that require Adobe's mapping tables."""
    from ..objects import PdfParseError

    if name in ("Identity-H", "Identity-V"):
        return 2
    if name in _PREDEFINED_UCS2_UTF16:
        return 2
    if name in _PREDEFINED_LEGACY:
        raise PdfParseError(
            f"predefined CMap {name!r} requires external mapping data"
        )
    raise PdfParseError(f"unknown predefined CMap {name!r}")


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
