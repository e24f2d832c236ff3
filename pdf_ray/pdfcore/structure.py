"""Tagged-PDF logical structure extraction (PDF 32000-1 §14.7-14.8).

Walks /StructTreeRoot depth-first and assembles each structure element's
text from the marked-content sequences (/MCID) it references — the PDF
analogue of the HTML DOM walk: logical reading order as the author tagged
it, independent of paint order in the content stream. The reference
stores the catalog's StructTreeRoot reference as an opaque object and
never walks it (src/catalog.rs — `struct_tree_root` captured, unused);
this module implements the semantics.

Content association implemented: /K as integer MCID, as /MCR
(marked-content reference with optional /Pg), and as nested structure
elements (arrays of any of these). /OBJR object references and /RoleMap
multi-hop chains are out of scope (single-hop RoleMap applied).
"""

from __future__ import annotations

from .document import Document
from .interp import Interpreter
from .objects import NULL, Name


def _as_list(k):
    if k is None or k is NULL:
        return []
    if isinstance(k, list):
        return k
    return [k]


def structure_text(doc: Document) -> list[dict]:
    """DFS rows for every content-bearing structure element:
    ``{"order", "role", "page_index", "text"}`` — ``order`` is the
    element's depth-first visit index over the whole tree (stable even
    for elements skipped for having no direct content), ``text`` is the
    space-joined show-order text of the element's own marked-content
    sequences."""
    root = doc.resolve(doc.catalog.get("StructTreeRoot", NULL))
    if not isinstance(root, dict):
        return []

    # paint pass: collect (page, mcid) -> text chunks in show order
    interp = Interpreter(doc, collect_mcids=True)
    for page in doc.pages:
        interp._run_page(page)
    chunks: dict[tuple[int, int], list[str]] = {}
    for (kind, text, _ref), (pg, mcid, _art) in zip(
        interp.spans, interp.span_marks
    ):
        if mcid >= 0 and kind == "text" and text:
            chunks.setdefault((pg, mcid), []).append(text)

    page_idx = {id(p.dict): i for i, p in enumerate(doc.pages)}
    rolemap = doc.resolve(root.get("RoleMap", NULL))

    rows: list[dict] = []
    counter = [0]

    def page_of(ref, default: int) -> int:
        pg = doc.resolve(ref)
        return page_idx.get(id(pg), default) if isinstance(pg, dict) else default

    def walk(elem: dict, seen: set, inherited_pg: int) -> None:
        if id(elem) in seen:
            return
        seen.add(id(elem))
        order = counter[0]
        counter[0] += 1
        role = elem.get("S")
        role = str(role) if isinstance(role, Name) else None
        if isinstance(rolemap, dict) and role is not None:
            mapped = rolemap.get(role)
            if isinstance(mapped, Name):  # single hop
                role = str(mapped)
        pg = page_of(elem.get("Pg"), inherited_pg)

        own: list[tuple[int, int]] = []
        children: list[dict] = []
        for k in _as_list(doc.resolve(elem.get("K", NULL))):
            kr = doc.resolve(k)
            if isinstance(kr, bool):
                continue
            if isinstance(kr, int):
                own.append((pg, kr))
            elif isinstance(kr, dict):
                t = kr.get("Type")
                if t == Name("MCR"):
                    m = doc.resolve(kr.get("MCID"))
                    if isinstance(m, int) and not isinstance(m, bool):
                        own.append((page_of(kr.get("Pg"), pg), m))
                elif t == Name("OBJR"):
                    continue  # object references: out of scope
                else:
                    children.append(kr)
        if own:
            text = " ".join(
                " ".join(chunks.get(key, [])) for key in own
            ).strip()
            rows.append(
                {
                    "order": order,
                    "role": role,
                    "page_index": own[0][0],
                    "text": text,
                }
            )
        for c in children:
            walk(c, seen, pg)

    for k in _as_list(doc.resolve(root.get("K", NULL))):
        kr = doc.resolve(k)
        if isinstance(kr, dict):
            walk(kr, set(), 0)
    return rows
