"""Deterministic synthetic PDF builder.

The reference ships no test PDFs (SURVEY.md §5), so the fixture corpus is
synthesized here, byte-deterministic, with *hand-specified* golden span
sequences — the goldens are written down alongside the bytes and never
derived from the engine under test.

``PdfBuilder`` assembles numbered indirect objects, computes real byte
offsets, and emits either a classic xref table (src/xref/parser.rs:169-233)
or a PDF-1.5 xref stream + ObjStm layout (src/xref/stream/parser.rs:52-145,
src/object_stream.rs:71-109). ``append_incremental`` produces an update
section chained via ``Prev`` (src/lib.rs:441-467).
"""

from __future__ import annotations

import zlib


class PdfBuilder:
    def __init__(self):
        self.objects: dict[int, bytes] = {}
        self.root_num: int | None = None

    def add(self, num: int, body: bytes) -> int:
        """Register object ``num``; body excludes the obj/endobj frame."""
        self.objects[num] = body
        return num

    def add_stream(
        self, num: int, dict_body: bytes, data: bytes, filters: str | None = None
    ) -> int:
        """dict_body is the inside of the dict sans Length/Filter, e.g.
        b"/Type /XObject". ``filters``: None | "flate" | "ahx" | "a85" |
        "lzw" | "rl" (single) applied to data here."""
        extra = b""
        if filters == "flate":
            data = zlib.compress(data, 9)
            extra = b"/Filter /FlateDecode"
        elif filters == "ahx":
            data = data.hex().encode("ascii") + b">"
            extra = b"/Filter /ASCIIHexDecode"
        elif filters == "a85":
            data = _a85_encode(data)
            extra = b"/Filter /ASCII85Decode"
        elif filters == "lzw":
            data = _lzw_encode(data)
            extra = b"/Filter /LZWDecode"
        elif filters is not None:
            raise ValueError(filters)
        d = b"<< " + dict_body
        if extra:
            d += b" " + extra
        d += b" /Length " + str(len(data)).encode() + b" >>"
        body = d + b"\nstream\n" + data + b"\nendstream"
        return self.add(num, body)

    def build(
        self,
        root_num: int,
        use_xref_stream: bool = False,
        extra_trailer: bytes = b"",
    ) -> bytes:
        self.root_num = root_num
        self.extra_trailer = extra_trailer
        if use_xref_stream:
            return self._build_xref_stream()
        return self._build_classic()

    def _serialize_objects(self, header: bytes):
        out = bytearray(header)
        offsets: dict[int, int] = {}
        for num in sorted(self.objects):
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + self.objects[num] + b"\nendobj\n"
        return out, offsets

    def _build_classic(self) -> bytes:
        out, offsets = self._serialize_objects(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        xref_pos = len(out)
        maxnum = max(self.objects)
        out += f"xref\n0 {maxnum + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, maxnum + 1):
            if num in offsets:
                out += f"{offsets[num]:010d} 00000 n \n".encode()
            else:
                out += b"0000000000 00001 f \n"
        out += (
            f"trailer\n<< /Size {maxnum + 1} /Root {self.root_num} 0 R ".encode()
            + getattr(self, "extra_trailer", b"")
            + f">>\nstartxref\n{xref_pos}\n%%EOF\n".encode()
        )
        return bytes(out)

    def _build_xref_stream(self) -> bytes:
        out, offsets = self._serialize_objects(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
        maxnum = max(self.objects)
        xref_num = maxnum + 1
        xref_pos = len(out)
        # W = [1 4 2]; entries for 0..=xref_num
        rows = bytearray()
        rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        for num in range(1, xref_num):
            if num in offsets:
                rows += bytes([1]) + offsets[num].to_bytes(4, "big") + b"\x00\x00"
            else:
                rows += bytes([0]) + (0).to_bytes(4, "big") + b"\x00\x01"
        rows += bytes([1]) + xref_pos.to_bytes(4, "big") + b"\x00\x00"
        # PNG Up predictor (type-2 row tags) to exercise the predictor path
        rowlen = 7
        tagged = bytearray()
        prev = bytes(rowlen)
        for r in range(0, len(rows), rowlen):
            row = rows[r : r + rowlen]
            tagged += b"\x02" + bytes(
                (row[i] - prev[i]) & 0xFF for i in range(rowlen)
            )
            prev = row
        data = zlib.compress(bytes(tagged), 9)
        xref_dict = (
            f"<< /Type /XRef /Size {xref_num + 1} /W [1 4 2] /Root "
            f"{self.root_num} 0 R /Filter /FlateDecode /DecodeParms "
            f"<< /Predictor 12 /Columns 7 >> /Length {len(data)} >>"
        ).encode()
        out += f"{xref_num} 0 obj\n".encode() + xref_dict
        out += b"\nstream\n" + data + b"\nendstream\nendobj\n"
        out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
        return bytes(out)

    @staticmethod
    def append_incremental(
        base: bytes, new_objects: dict[int, bytes], root_num: int
    ) -> bytes:
        """Append an update section overriding ``new_objects``; its xref
        chains to the base via /Prev (first writer wins on merge)."""
        prev_xref = _find_startxref_offset(base)
        out = bytearray(base)
        offsets: dict[int, int] = {}
        for num in sorted(new_objects):
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + new_objects[num] + b"\nendobj\n"
        xref_pos = len(out)
        maxnum = max(new_objects)
        out += b"xref\n"
        for num in sorted(offsets):
            out += f"{num} 1\n{offsets[num]:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {maxnum + 1} /Root {root_num} 0 R "
            f"/Prev {prev_xref} >>\nstartxref\n{xref_pos}\n%%EOF\n"
        ).encode()
        return bytes(out)


def _find_startxref_offset(buf: bytes) -> int:
    idx = buf.rfind(b"startxref")
    return int(buf[idx + 9 :].split(b"%%EOF")[0].strip())


def _a85_encode(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 4):
        chunk = data[i : i + 4]
        pad = 4 - len(chunk)
        v = int.from_bytes(chunk + b"\0" * pad, "big")
        if v == 0 and pad == 0:
            out += b"z"
            continue
        digits = bytearray(5)
        for j in range(4, -1, -1):
            digits[j] = v % 85 + ord("!")
            v //= 85
        out += digits[: 5 - pad]
    return bytes(out) + b"~>"


def _lzw_encode(data: bytes) -> bytes:
    """TIFF/PDF LZW encoder (EarlyChange=1) matching filters.lzw_decode."""
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    data_emitted = 0

    def emit_data(code: int):
        """Emit a data code, then advance width on the *decoder's* schedule:
        the decoder appends one table entry per data code after the first,
        and widens when its table length + EarlyChange reaches 2^width."""
        nonlocal width, data_emitted
        put(code, width)
        data_emitted += 1
        dec_len = 258 + max(0, data_emitted - 1)
        if dec_len + 1 >= (1 << width) and width < 12:
            width += 1

    put(256, width)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
        else:
            emit_data(table[w])
            table[wc] = next_code
            next_code += 1
            w = bytes([byte])
            if next_code >= 4095:
                # table full at 12 bits: emit Clear and restart (w is a
                # single byte, valid in the fresh table)
                put(256, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
                data_emitted = 0
    if w:
        emit_data(table[w])
    put(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def simple_page_pdf(
    content: bytes,
    use_xref_stream: bool = False,
    content_filter: str | None = None,
    extra_resources: bytes = b"",
    extra_objects: dict[int, bytes] | None = None,
) -> bytes:
    """One-page skeleton: catalog(1) -> pages(2) -> page(3) -> content(4),
    font /F1 (5). Extra objects may be referenced from extra_resources."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> " + extra_resources + b" >> "
        b"/Contents 4 0 R >>",
    )
    b.add_stream(4, b"", content, filters=content_filter)
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for num, body in (extra_objects or {}).items():
        b.add(num, body)
    return b.build(1, use_xref_stream=use_xref_stream)
