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
#
# Legacy multi-byte encodings (RKSJ/EUC/B5/GBK/UHC/...): for text
# EXTRACTION what matters is bytes -> unicode, and each of these CMaps'
# code space is a standard national encoding that Python's codec registry
# implements — Shift-JIS (cp932), EUC-JP, Big5(-HKSCS), GB2312/GBK/
# GB18030, EUC-KR/UHC. So instead of Adobe's code->CID tables (which we
# don't ship) the enrichment decodes the code bytes with the matching
# codec: exact unicode text, while WIDTHS fall back to the CIDFont's /DW
# (the CID is the only thing the Adobe table adds, and it only feeds
# width lookup — position features, never span text; the same trade as
# the Uni* families above, stated per SURVEY §2.4). CNS-EUC (EUC-TW)
# decodes through glibc iconv's public CNS 11643 table (ctypes, gated —
# row error on a libc without EUC-TW); KSCpc-EUC decodes its KS X 1001
# double-byte range via euc_kr, Mac-extension codes -> U+FFFD.

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

# legacy CMap base name (writing-mode suffix stripped) -> Python codec.
# "jisx0208" is a marker: the H/V CMaps carry raw JIS X 0208 2-byte
# codes, decoded by framing them as ISO-2022-JP.
_LEGACY_CODECS = {
    "83pv-RKSJ": "cp932", "90ms-RKSJ": "cp932", "90msp-RKSJ": "cp932",
    "90pv-RKSJ": "cp932", "Add-RKSJ": "cp932", "Ext-RKSJ": "cp932",
    "EUC": "euc_jp",
    "GB-EUC": "gb2312", "GBpc-EUC": "gb2312",
    "GBK-EUC": "gbk", "GBKp-EUC": "gbk", "GBK2K": "gb18030",
    "B5pc": "big5", "ETen-B5": "big5", "ETenms-B5": "big5",
    "HKscs-B5": "big5hkscs",
    "KSC-EUC": "euc_kr", "KSCms-UHC": "cp949", "KSCms-UHC-HW": "cp949",
}

# CNS-EUC (EUC-TW / CNS 11643) has no Python codec, but glibc's iconv
# ships the full public table — decode through it via ctypes (stdlib
# only). Gated: on a libc without EUC-TW the name stays a row error.
_EUC_TW_STATE: list | None = None  # [libc, argtypes-configured] or [] if absent


def _euc_tw_available() -> bool:
    global _EUC_TW_STATE
    if _EUC_TW_STATE is None:
        import ctypes

        try:
            libc = ctypes.CDLL(None, use_errno=True)
            libc.iconv_open.restype = ctypes.c_void_p
            libc.iconv_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            libc.iconv.restype = ctypes.c_size_t
            libc.iconv.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t),
            ]
            libc.iconv_close.restype = ctypes.c_int
            libc.iconv_close.argtypes = [ctypes.c_void_p]
            cd = libc.iconv_open(b"UTF-8", b"EUC-TW")
            if cd in (None, ctypes.c_void_p(-1).value):
                _EUC_TW_STATE = []
            else:
                libc.iconv_close(cd)
                _EUC_TW_STATE = [libc]
        except Exception:
            _EUC_TW_STATE = []
    return bool(_EUC_TW_STATE)


def _decode_euc_tw(raw: bytes) -> str:
    """EUC-TW (CNS 11643 planes via SS2) -> unicode through glibc iconv;
    invalid/truncated sequences emit U+FFFD and resync one byte later,
    matching decode_legacy_bytes' errors='replace' semantics."""
    import ctypes

    libc = _EUC_TW_STATE[0]
    cd = libc.iconv_open(b"UTF-8", b"EUC-TW")
    try:
        out_parts: list[bytes] = []
        buf = raw
        while buf:
            inbuf = ctypes.c_char_p(buf)
            inleft = ctypes.c_size_t(len(buf))
            outsize = 4 * len(buf) + 16
            outarr = ctypes.create_string_buffer(outsize)
            outptr = ctypes.cast(outarr, ctypes.c_char_p)
            outleft = ctypes.c_size_t(outsize)
            r = libc.iconv(
                cd,
                ctypes.byref(inbuf),
                ctypes.byref(inleft),
                ctypes.byref(outptr),
                ctypes.byref(outleft),
            )
            out_parts.append(outarr.raw[: outsize - outleft.value])
            if r != ctypes.c_size_t(-1).value or inleft.value == 0:
                break
            # EILSEQ/EINVAL: replace the offending byte, resync
            out_parts.append("�".encode())
            buf = buf[len(buf) - inleft.value + 1 :]
        return b"".join(out_parts).decode("utf-8", errors="replace")
    finally:
        libc.iconv_close(cd)


def _decode_kscpc_euc(raw: bytes) -> str:
    """KSCpc-EUC (Mac OS Korean): the double-byte A1A1-FEFE range IS
    KS X 1001 in EUC form, i.e. byte-identical to euc_kr; singles < 0x80
    are ASCII. Mac-specific extension codes (lead 0x81-0xA0 and the Mac
    symbol singles) have no Python codec -> U+FFFD, the same honest
    degradation as errors='replace' elsewhere."""
    out: list[str] = []
    i, n = 0, len(raw)
    while i < n:
        b0 = raw[i]
        if b0 < 0x80:
            out.append(chr(b0))
            i += 1
        elif 0x81 <= b0 <= 0xFE and i + 1 < n:
            # two-byte code (KS X 1001 for A1+ leads; Mac additions for
            # 81-A0 leads — the trail byte is consumed either way)
            if b0 >= 0xA1:
                try:
                    out.append(raw[i : i + 2].decode("euc_kr"))
                except UnicodeDecodeError:
                    out.append("�")
            else:
                out.append("�")
            i += 2
        else:
            out.append("�")
            i += 1
    return "".join(out)


def predefined_cmap_info(name: str) -> tuple[str, str | None]:
    """Resolve a predefined CMap NAME to ``(kind, codec)``:
    kind 'identity' / 'ucs2' (CID = 2-byte code) or 'legacy' (codec
    decodes the code bytes to unicode; CID unavailable). Raises for the
    two names with no Python codec and for unknown names."""
    from ..objects import PdfParseError

    if name in ("Identity-H", "Identity-V"):
        return "identity", None
    if name in _PREDEFINED_UCS2_UTF16:
        return "ucs2", None
    if name in ("H", "V"):
        return "legacy", "jisx0208"
    base = name
    for suffix in ("-H", "-V"):
        if base.endswith(suffix):
            base = base[: -len(suffix)]
            break
    codec = _LEGACY_CODECS.get(base)
    if codec is not None:
        return "legacy", codec
    if base == "CNS-EUC":
        if _euc_tw_available():
            return "legacy", "euc_tw"
        raise PdfParseError(
            f"predefined CMap {name!r} requires an EUC-TW-capable libc"
        )
    if base == "KSCpc-EUC":
        return "legacy", "kscpc_euc"
    raise PdfParseError(f"unknown predefined CMap {name!r}")


def predefined_cid_cmap(name: str) -> int:
    """Back-compat shim: code byte-width for CID = code names; raises on
    legacy names (callers wanting codec support use
    ``predefined_cmap_info``)."""
    from ..objects import PdfParseError

    kind, codec = predefined_cmap_info(name)
    if kind in ("identity", "ucs2"):
        return 2
    raise PdfParseError(
        f"predefined CMap {name!r} requires external mapping data"
    )


def decode_legacy_bytes(codec: str, raw: bytes) -> str:
    """Decode legacy-CMap code bytes to unicode via the Python codec;
    undecodable sequences surface as U+FFFD rather than failing the row
    (sloppy real-world CJK strings must still extract)."""
    if codec == "jisx0208":
        return (b"\x1b$B" + raw + b"\x1b(B").decode(
            "iso2022_jp", errors="replace"
        )
    if codec == "euc_tw":
        return _decode_euc_tw(raw)
    if codec == "kscpc_euc":
        return _decode_kscpc_euc(raw)
    return raw.decode(codec, errors="replace")


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
