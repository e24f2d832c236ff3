"""Annotation parsing — the extraction-relevant subset.

The reference parses annotations declaratively (~700 LoC,
/root/reference/src/annotation/mod.rs:251-300: Subtype + Rect + Contents
+ markup fields; subtype vocabulary src/annotation/subtype.rs:35-62). For
an extraction engine the text a user would miss lives in /Contents
(FreeText, Text/sticky notes, markup comments) and in Widget field
values (/V, inherited through the AcroForm field /Parent chain like the
reference's field tree, src/acro_form.rs).
"""

from __future__ import annotations

from .objects import NULL, Name, PdfParseError

# src/annotation/subtype.rs:35-62 (26 names; "3D" is the spec spelling)
ANNOTATION_SUBTYPES = frozenset(
    {
        "Text", "Link", "FreeText", "Line", "Square", "Circle", "Polygon",
        "PolyLine", "Highlight", "Underline", "Squiggly", "StrikeOut",
        "Stamp", "Caret", "Ink", "Popup", "FileAttachment", "Sound",
        "Movie", "Widget", "Screen", "PrinterMark", "TrapNet", "Watermark",
        "3D", "Redact",
    }
)

_MAX_PARENT_DEPTH = 32


def _inherited(doc, annot_dict: dict, key: str):
    """Walk the field /Parent chain for an inheritable field-dict entry
    (T is NOT inheritable per spec but V is; we surface the nearest T up
    the chain as the qualified-name stem, which is what a reader wants)."""
    node = annot_dict
    for _ in range(_MAX_PARENT_DEPTH):
        v = doc.resolve(node.get(key, NULL))
        if v is not NULL and v is not None:
            return v
        parent = node.get("Parent")
        if parent is None:
            return None
        node = doc.resolve_dict(parent)
    raise PdfParseError("annotation /Parent chain too deep")


def page_annotations(doc, page) -> list[dict]:
    """Parse a page's /Annots array into
    ``[{subtype, text, field_name}, ...]`` in array order. ``text`` is
    /Contents for markup/note annotations, the field value /V for
    Widgets (Parent-chain inherited). Unknown subtypes fail the row
    (reference crashes on them too, subtype.rs from_str)."""
    annots = doc.resolve(page.dict.get("Annots", NULL))
    out: list[dict] = []
    if not isinstance(annots, list):
        return out
    for a in annots:
        d = doc.resolve_dict(a)
        subtype = str(doc.resolve(d.get("Subtype", NULL)))
        if subtype not in ANNOTATION_SUBTYPES:
            raise PdfParseError(f"unknown annotation subtype {subtype!r}")
        contents = doc.resolve(d.get("Contents", NULL))
        text = contents if isinstance(contents, str) else None
        field_name = None
        if subtype == "Widget":
            v = _inherited(doc, d, "V")
            if isinstance(v, str):
                text = v
            elif isinstance(v, Name):
                text = str(v)
            t = _inherited(doc, d, "T")
            if isinstance(t, str):
                field_name = t
        out.append(
            {"subtype": subtype, "text": text, "field_name": field_name}
        )
    return out
