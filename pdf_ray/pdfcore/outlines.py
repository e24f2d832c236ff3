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
    # iterative DFS with an explicit stack: a /First self-cycle would blow
    # Python's recursion limit (~1000) long before the node-count guard
    # could fire if this walked recursively
    first = root.get("First")
    stack: list[tuple[object, int]] = []
    if first is not None:
        stack.append((first, 0))
    while stack:
        node_ref, level = stack.pop()
        node = doc.resolve(node_ref)
        if not isinstance(node, dict):
            continue
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
        # push Next first so First (the children) pops before the sibling
        nxt = node.get("Next")
        if nxt is not None:
            stack.append((nxt, level))
        child = node.get("First")
        if child is not None:
            stack.append((child, level + 1))
    return out
