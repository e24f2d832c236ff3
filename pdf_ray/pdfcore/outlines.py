"""Document outline (bookmark) parsing.

The reference models outlines declaratively (catalog /Outlines with
First/Last/Next/Prev/Count sibling chains, /root/reference/src/catalog.rs
+ src/destination.rs); for extraction the user-visible content is the
TITLE hierarchy, which we walk depth-first in display order.
"""

from __future__ import annotations

from .objects import NULL, PdfParseError

_MAX_OUTLINE_NODES = 100_000  # cycle / bomb guard


def document_outlines(doc) -> list[dict]:
    """Flatten the outline tree to ``[{order, level, title}, ...]`` in
    depth-first display order. Missing /Outlines -> []."""
    outlines = doc.catalog.get("Outlines")
    if outlines is None:
        return []
    root = doc.resolve(outlines)
    if not isinstance(root, dict):
        return []
    out: list[dict] = []

    def walk(node_ref, level: int) -> None:
        node = doc.resolve(node_ref)
        while isinstance(node, dict):
            if len(out) >= _MAX_OUTLINE_NODES:
                raise PdfParseError("outline tree too large (cycle?)")
            title = doc.resolve(node.get("Title", NULL))
            out.append(
                {
                    "order": len(out),
                    "level": level,
                    "title": title if isinstance(title, str) else None,
                }
            )
            first = node.get("First")
            if first is not None:
                walk(first, level + 1)
            nxt = node.get("Next")
            node = doc.resolve(nxt) if nxt is not None else None

    first = root.get("First")
    if first is not None:
        walk(first, 0)
    return out
