"""AcroForm field-tree extraction (PDF 32000-1 §12.7).

Walks the catalog's /AcroForm /Fields tree directly — unlike the
per-page Widget pass in annotations.py, this surfaces EVERY terminal
field (including ones whose widgets are split across pages or missing),
with fully-qualified dotted names and §12.7.3.1 attribute inheritance
(/FT and /V flow down the tree). Reference model: src/acro_form.rs
declares the field dict but never assembles qualified names or walks
kids; this implements the semantics.

Terminal-field rule per spec: a kid WITH /T is a child field (splits the
name); kids without /T are widget annotations of the same field, so the
node stays terminal.
"""

from __future__ import annotations

from .objects import NULL, Name

_MAX_DEPTH = 64


def form_fields(doc) -> list[dict]:
    """DFS rows for every terminal field:
    ``{"order", "name", "ftype", "value"}`` — ``name`` is the dotted
    fully-qualified name, ``ftype``/``value`` are inherited (/FT, /V);
    values render as text (strings as-is, name objects without the
    slash, string arrays joined with '; ')."""
    acro = doc.resolve(doc.catalog.get("AcroForm", NULL))
    if not isinstance(acro, dict):
        return []
    fields = doc.resolve(acro.get("Fields", NULL))
    if not isinstance(fields, list):
        return []

    rows: list[dict] = []

    def render_value(v):
        if isinstance(v, Name):
            return str(v)
        if isinstance(v, str):
            return v
        if isinstance(v, list):
            parts = [x for x in (doc.resolve(i) for i in v) if isinstance(x, str)]
            return "; ".join(parts) if parts else None
        return None

    def walk(node: dict, prefix: str, ftype, value, seen: set, depth: int):
        if id(node) in seen or depth > _MAX_DEPTH:
            return
        seen.add(id(node))
        t = doc.resolve(node.get("T", NULL))
        name = (
            (prefix + "." + t if prefix else t)
            if isinstance(t, str)
            else prefix
        )
        ft = doc.resolve(node.get("FT", NULL))
        if isinstance(ft, Name):
            ftype = str(ft)
        v = doc.resolve(node.get("V", NULL))
        if v is not NULL and v is not None:
            value = v
        kids = doc.resolve(node.get("Kids", NULL))
        child_fields = []
        if isinstance(kids, list):
            for k in kids:
                kd = doc.resolve(k)
                if isinstance(kd, dict) and isinstance(
                    doc.resolve(kd.get("T", NULL)), str
                ):
                    child_fields.append(kd)
        if child_fields:
            for c in child_fields:
                walk(c, name, ftype, value, seen, depth + 1)
        elif name:  # terminal field (widget-only kids don't split it)
            rows.append(
                {
                    "order": len(rows),
                    "name": name,
                    "ftype": ftype,
                    "value": render_value(value),
                }
            )

    for f in fields:
        fd = doc.resolve(f)
        if isinstance(fd, dict):
            walk(fd, "", None, None, set(), 0)
    return rows
