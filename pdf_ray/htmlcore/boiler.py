"""Boilerplate stripping: DOM-heuristic main-content block classification.

A deterministic boilerpipe/readability-style pass over the token stream
(no ML, no floats — integer rules only, so the DuckDB-checked goldens are
stable across platforms). Three layers:

1. **Subtree drops** (the DOM heuristic): a stack walk over the token
   stream drops whole subtrees rooted at chrome elements
   (``DROP_TAGS``: script/style/nav/aside/form/...; ``header``/``footer``
   are dropped only outside author content — an article's own header
   holds its headline) or at
   any element whose ``class``/``id`` tokens contain a boilerplate marker
   (``NEG_MARKERS``: sidebar/comment/ad/banner/share/...). Conversely an
   ancestor in ``POS_TAGS`` (``article``/``main``) or with a
   ``POS_MARKERS`` class/id token marks its subtree as author content.

2. **Block segmentation**: text is accumulated between block-level tag
   boundaries (``BLOCK_TAGS``, plus ``br``/``hr``); each flush yields a
   block with integer features: word count, link word count (words inside
   ``<a>``), heading flag (inside ``h1``-``h6``), positive flag (inside an
   author-content subtree). ``<img>`` outside links yields an image block
   carrying ``src``/``alt``. All text is whitespace-normalized (runs
   collapsed to one space) — including ``pre``, documented.

3. **Classification**:
   - a block is *link-dense* iff ``3 * link_words > words`` (density >
     1/3) — always boilerplate;
   - **article mode** (the document has at least one positive text
     block): keep exactly the positive, non-link-dense blocks; image
     blocks are kept iff positive;
   - **density mode** (no semantic markers anywhere): keep non-link-dense
     text blocks with >= 10 words; keep a heading iff the next text block
     is kept and is not itself a heading; image blocks are dropped (no
     evidence of content scope).

The kept blocks become the interleaved output spans (kind ``text`` /
``image``), satisfying the same per-row (kind, text, media_ref, order)
invariant as the PDF extraction path.
"""

from __future__ import annotations

from .tokenizer import tokenize

DROP_TAGS = frozenset(
    """script style noscript template head svg math iframe object embed
    applet form button select option datalist input textarea label nav
    aside""".split()
)
# page-level chrome, but legitimate inside author content (an article's
# <header> holds its headline) — dropped only OUTSIDE a positive subtree
SCOPED_DROP_TAGS = frozenset({"header", "footer"})
NEG_MARKERS = frozenset(
    """nav navbar menu sidebar side-bar footer foot comment comments
    comment-list ad ads advert advertisement banner share sharing social
    breadcrumb breadcrumbs promo related related-posts widget cookie
    cookie-banner popup modal masthead pagination pager byline""".split()
)
POS_TAGS = frozenset({"article", "main"})
POS_MARKERS = frozenset(
    "article main content main-content post post-body entry entry-content "
    "story story-body text".split()
)
BLOCK_TAGS = frozenset(
    """address article aside blockquote body caption dd details dialog div
    dl dt fieldset figcaption figure footer h1 h2 h3 h4 h5 h6 header hr
    html li main nav ol p pre section summary table tbody td tfoot th
    thead tr ul""".split()
)
VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track "
    "wbr".split()
)
HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

MIN_CONTENT_WORDS = 10  # density-mode threshold (boilerpipe's short-text cut)


def _marker_tokens(attrs: dict[str, str]) -> set[str]:
    toks: set[str] = set()
    for key in ("class", "id"):
        v = attrs.get(key)
        if v:
            toks.update(t.lower() for t in v.replace("_", "-").split())
    return toks


class _Block:
    __slots__ = ("fragments", "link_fragments", "positive", "heading",
                 "img_src", "img_alt")

    def __init__(self, positive: bool, heading: bool):
        self.fragments: list[str] = []
        self.link_fragments: list[str] = []
        self.positive = positive
        self.heading = heading
        self.img_src = None
        self.img_alt = None

    @property
    def text(self) -> str:
        return " ".join("".join(self.fragments).split())

    @property
    def words(self) -> int:
        return len(self.text.split())

    @property
    def link_words(self) -> int:
        # link_fragments mirrors fragments 1:1 (non-link text blanked to a
        # space), so joining with "" preserves word adjacency exactly
        lw = len("".join(self.link_fragments).split())
        return min(lw, self.words)

    @property
    def link_dense(self) -> bool:
        return 3 * self.link_words > self.words


def _segment(data: bytes | str):
    """Token stream -> (blocks, title). Stack walk with subtree drops."""
    # stack frames: (tag, dropped, positive)
    stack: list[tuple[str, bool, bool]] = []
    dropped = False
    positive = False
    a_depth = 0
    heading_depth = 0
    title: str | None = None
    in_title = False
    blocks: list[_Block] = []
    cur: _Block | None = None

    def flush():
        nonlocal cur
        if cur is not None and cur.text:
            blocks.append(cur)
        cur = None

    def state_from_stack():
        nonlocal dropped, positive
        dropped = any(f[1] for f in stack)
        positive = any(f[2] for f in stack)

    for tok in tokenize(data):
        kind = tok[0]
        if kind == "start":
            _, name, attrs, self_closing = tok
            if name == "title" and title is None:
                in_title = True
                continue
            if name == "img":
                if not dropped and a_depth == 0:
                    flush()
                    b = _Block(positive, False)
                    b.img_src = attrs.get("src") or None
                    b.img_alt = attrs.get("alt") or None
                    if b.img_src:
                        blocks.append(b)
                continue
            if name in ("br", "hr"):
                flush()
                continue
            if name in VOID_TAGS or self_closing:
                continue
            marker = _marker_tokens(attrs)
            drop_here = (
                name in DROP_TAGS
                or (name in SCOPED_DROP_TAGS and not positive)
                or bool(marker & NEG_MARKERS)
            )
            pos_here = name in POS_TAGS or bool(marker & POS_MARKERS)
            if name in BLOCK_TAGS:
                flush()
            if name == "a":
                a_depth += 1
            if name in HEADINGS:
                heading_depth += 1
            stack.append((name, drop_here, pos_here))
            if drop_here or pos_here:
                state_from_stack()
        elif kind == "end":
            name = tok[1]
            if name == "title":
                in_title = False
                continue
            if name in BLOCK_TAGS:
                flush()
            # pop to the nearest matching open tag (error tolerance)
            for idx in range(len(stack) - 1, -1, -1):
                if stack[idx][0] == name:
                    for f in stack[idx:]:
                        if f[0] == "a":
                            a_depth -= 1
                        if f[0] in HEADINGS:
                            heading_depth -= 1
                    del stack[idx:]
                    state_from_stack()
                    break
        else:  # text
            data_ = tok[1]
            if in_title:
                if data_.strip():
                    title = " ".join(data_.split()) if title is None else title
                continue
            if dropped:
                continue
            if not data_.strip():
                # whitespace-only runs don't OPEN a block, but inside one
                # they separate words split by inline tags ('</a> <a>')
                if cur is not None:
                    cur.fragments.append(" ")
                    cur.link_fragments.append(" ")
                continue
            if cur is None:
                cur = _Block(positive, heading_depth > 0)
            else:
                # positivity is sticky per block from its first fragment;
                # a block opened outside and continued inside a positive
                # wrapper keeps its first classification
                pass
            cur.fragments.append(data_)
            cur.link_fragments.append(data_ if a_depth > 0 else " ")
    flush()
    return blocks, title


def extract_main_content(data: bytes | str) -> dict:
    """HTML bytes -> ``{"spans": [...], "title": str|None,
    "n_kept": int, "n_dropped": int}``.

    Spans carry the interleaved invariant fields: ``kind`` (``text`` |
    ``image``), ``text``, ``media_ref`` (the image ``src``), ``order``.
    Total: any input yields a result (possibly zero spans).
    """
    blocks, title = _segment(data)
    article_mode = any(
        b.positive and b.img_src is None and b.words > 0 for b in blocks
    )
    kept: list[bool] = [False] * len(blocks)
    if article_mode:
        for i, b in enumerate(blocks):
            if b.img_src is not None:
                kept[i] = b.positive
            else:
                kept[i] = b.positive and not b.link_dense
    else:
        for i, b in enumerate(blocks):
            if b.img_src is not None:
                continue
            if b.link_dense or b.heading:
                continue
            kept[i] = b.words >= MIN_CONTENT_WORDS
        # headings: kept iff the next TEXT block is kept and not a heading
        for i, b in enumerate(blocks):
            if b.img_src is not None or not b.heading or b.link_dense:
                continue
            for j in range(i + 1, len(blocks)):
                if blocks[j].img_src is None:
                    kept[i] = kept[j] and not blocks[j].heading
                    break
    spans: list[dict] = []
    for i, b in enumerate(blocks):
        if not kept[i]:
            continue
        if b.img_src is not None:
            spans.append(
                {"kind": "image", "text": b.img_alt,
                 "media_ref": b.img_src, "order": len(spans)}
            )
        else:
            spans.append(
                {"kind": "text", "text": b.text,
                 "media_ref": None, "order": len(spans)}
            )
    return {
        "spans": spans,
        "title": title,
        "n_kept": sum(kept),
        "n_dropped": len(blocks) - sum(kept),
    }
