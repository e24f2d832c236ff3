"""Embedded files (PDF 32000-1 §7.11.4) and document metadata (§14.3.3).

The catalog's /Names -> /EmbeddedFiles NAME TREE (the string-keyed twin
of the page-label number tree; reference structure:
src/data_structures/name_tree.rs) maps attachment names to file
specification dicts (reference model: file specifications, §7.11) whose
/EF /F streams hold the payload bytes. The trailer's /Info dict carries
title/author/producer and PDF date strings (parsed by pdfcore/date.py,
mirroring src/date.rs).
"""

from __future__ import annotations

import hashlib

from .objects import PdfParseError, Stream


def _walk_name_tree(node, resolve, out: list, depth: int = 0):
    if depth > 32:
        raise PdfParseError("name tree too deep")
    node = resolve(node)
    if not isinstance(node, dict):
        raise PdfParseError("name-tree node is not a dict")
    names = resolve(node.get("Names"))
    if isinstance(names, list):
        for i in range(0, len(names) - 1, 2):
            k = resolve(names[i])
            if isinstance(k, bytes):
                k = k.decode("latin-1")
            out.append((str(k), names[i + 1]))
    kids = resolve(node.get("Kids"))
    if isinstance(kids, list):
        for k in kids:
            _walk_name_tree(k, resolve, out, depth + 1)


def embedded_files(doc) -> list[dict]:
    """One entry per attachment: name (tree key), filename (/UF else
    /F), n_bytes and md5 of the DECODED payload."""
    from .filters import decode_stream

    resolve = doc.resolve
    cat = resolve(doc.catalog)
    names = resolve(cat.get("Names"))
    if not isinstance(names, dict):
        return []
    ef_root = resolve(names.get("EmbeddedFiles"))
    if ef_root is None:
        return []
    entries: list[tuple[str, object]] = []
    _walk_name_tree(ef_root, resolve, entries)
    out = []
    for name, fs in sorted(entries, key=lambda kv: kv[0]):
        fsd = resolve(fs)
        if not isinstance(fsd, dict):
            raise PdfParseError("file spec is not a dict")
        fname = resolve(fsd.get("UF", fsd.get("F", "")))
        if isinstance(fname, bytes):
            fname = fname.decode("latin-1")
        ef = resolve(fsd.get("EF"))
        if not isinstance(ef, dict):
            raise PdfParseError("file spec has no /EF")
        stream = resolve(ef.get("F", ef.get("UF")))
        if not isinstance(stream, Stream):
            raise PdfParseError("/EF entry is not a stream")
        data = decode_stream(stream, resolve=resolve)
        out.append(
            {
                "name": name,
                "filename": str(fname),
                "n_bytes": len(data),
                "md5": hashlib.md5(data).hexdigest(),
            }
        )
    return out


_INFO_STR_KEYS = ("Title", "Author", "Subject", "Producer")


def doc_metadata(doc) -> dict | None:
    """Trailer /Info as a flat row: the four common string fields plus
    the parsed CreationDate (year/month/day ints, -1 when absent).
    None when the document has no /Info."""
    from .date import parse_pdf_date

    resolve = doc.resolve
    info = resolve(doc.trailer.get("Info"))
    if not isinstance(info, dict):
        return None
    row: dict = {}
    for k in _INFO_STR_KEYS:
        v = resolve(info.get(k))
        if isinstance(v, bytes):
            v = v.decode("latin-1")
        row[k.lower()] = None if v is None else str(v)
    cd = resolve(info.get("CreationDate"))
    if isinstance(cd, bytes):
        cd = cd.decode("latin-1")
    if cd:
        d = parse_pdf_date(str(cd))
        row["created_y"] = d.year if d.year is not None else -1
        row["created_m"] = d.month if d.month is not None else -1
        row["created_d"] = d.day if d.day is not None else -1
    else:
        row["created_y"] = row["created_m"] = row["created_d"] = -1
    return row
