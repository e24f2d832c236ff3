"""Page labels (PDF 32000-1 §12.4.2): the catalog's /PageLabels number
tree maps page indices to labelling ranges (style /S: D, R, r, A, a;
prefix /P; start /St). The reference ships the generic number-tree
structure (src/data_structures/number_tree.rs) but never surfaces
labels; here the tree is walked and each page gets its display label —
the mapping citation tooling needs ("page 'iv' is PDF page 3").
"""

from __future__ import annotations

from .objects import PdfParseError

_ROMAN = (
    (1000, "m"), (900, "cm"), (500, "d"), (400, "cd"),
    (100, "c"), (90, "xc"), (50, "l"), (40, "xl"),
    (10, "x"), (9, "ix"), (5, "v"), (4, "iv"), (1, "i"),
)


def _roman(n: int, upper: bool) -> str:
    if n <= 0:
        raise PdfParseError(f"roman label for non-positive {n}")
    out = []
    for v, s in _ROMAN:
        while n >= v:
            out.append(s)
            n -= v
    r = "".join(out)
    return r.upper() if upper else r


def _letters(n: int, upper: bool) -> str:
    # A..Z for 1..26, then doubled AA..ZZ, tripled... (§12.4.2 Table 159)
    if n <= 0:
        raise PdfParseError(f"letter label for non-positive {n}")
    ch = chr(ord("a") + (n - 1) % 26) * ((n - 1) // 26 + 1)
    return ch.upper() if upper else ch


def _format_label(style: str | None, prefix: str, n: int) -> str:
    if style is None:
        return prefix
    if style == "D":
        return prefix + str(n)
    if style == "R":
        return prefix + _roman(n, True)
    if style == "r":
        return prefix + _roman(n, False)
    if style == "A":
        return prefix + _letters(n, True)
    if style == "a":
        return prefix + _letters(n, False)
    raise PdfParseError(f"unknown page-label style {style!r}")


def _walk_number_tree(node, resolve, out: list, depth: int = 0):
    if depth > 32:
        raise PdfParseError("number tree too deep")
    node = resolve(node)
    if not isinstance(node, dict):
        raise PdfParseError("number-tree node is not a dict")
    nums = resolve(node.get("Nums"))
    if isinstance(nums, list):
        for i in range(0, len(nums) - 1, 2):
            out.append((int(resolve(nums[i])), resolve(nums[i + 1])))
    kids = resolve(node.get("Kids"))
    if isinstance(kids, list):
        for k in kids:
            _walk_number_tree(k, resolve, out, depth + 1)


def page_labels(doc) -> list[tuple[int, str]]:
    """(page_index, label) for every page; empty when the catalog has no
    /PageLabels."""
    resolve = doc.resolve
    cat = resolve(doc.catalog)
    pl = resolve(cat.get("PageLabels"))
    if pl is None:
        return []
    entries: list[tuple[int, dict]] = []
    _walk_number_tree(pl, resolve, entries)
    entries.sort(key=lambda kv: kv[0])
    if not entries or entries[0][0] != 0:
        raise PdfParseError("/PageLabels must define an entry for page 0")
    n_pages = len(doc.pages)
    out = []
    for idx in range(n_pages):
        # last entry with start <= idx
        ent_start, ent = entries[0]
        for s, d in entries:
            if s > idx:
                break
            ent_start, ent = s, d
        d = resolve(ent) or {}
        style = d.get("S")
        style = str(resolve(style)) if style is not None else None
        prefix = resolve(d.get("P", "")) or ""
        if isinstance(prefix, bytes):
            prefix = prefix.decode("latin-1")
        start = int(resolve(d.get("St", 1)))
        out.append((idx, _format_label(style, prefix, start + idx - ent_start)))
    return out
