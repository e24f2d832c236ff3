"""From-scratch HTML tokenizer (WHATWG-shaped, error-tolerant, total).

Produces a flat token stream — no tree building here; the block walker in
``boiler.py`` maintains its own open-element stack. Design constraints:

- TOTAL: never raises on any byte string. Malformed markup degrades to
  text or is skipped; an unterminated construct consumes to EOF.
- Deterministic: no locale, no randomness, no library parser.
- RAWTEXT elements (``script``/``style``/``xmp``) swallow everything up to
  their case-insensitive close tag with no entity decoding; RCDATA
  elements (``title``/``textarea``) do the same but entity-decode.

Tokens (plain tuples, hot path):
    ("start", name, attrs, self_closing)   attrs: dict[str, str], first wins
    ("end", name)
    ("text", data)                         entity-decoded, may span lines
Comments, doctypes, CDATA and processing instructions are consumed and
emit nothing.
"""

from __future__ import annotations

import re
from html import unescape

RAWTEXT = {"script", "style", "xmp"}
RCDATA = {"title", "textarea"}

_TAG_NAME = re.compile(r"[a-zA-Z][^\s/>]*")
_ATTR = re.compile(
    r"""\s*([^\s/>=]+)            # attribute name
        (?:\s*=\s*
            ("[^"]*"|'[^']*'|[^\s>]*)   # quoted or unquoted value
        )?""",
    re.VERBOSE,
)


def _decode(data: bytes | str) -> str:
    if isinstance(data, str):
        return data
    return data.decode("utf-8", errors="replace")


def tokenize(data: bytes | str):
    """Yield tokens for ``data``. Total: consumes any input to EOF."""
    s = _decode(data)
    n = len(s)
    i = 0
    text_start = 0

    def flush_text(end: int):
        if end > text_start:
            chunk = s[text_start:end]
            if chunk:
                yield_ = ("text", unescape(chunk))
                return yield_
        return None

    out_pending: list[tuple] = []
    while i < n:
        lt = s.find("<", i)
        if lt < 0:
            break
        nxt = s[lt + 1] if lt + 1 < n else ""
        if not nxt or not (nxt.isalpha() or nxt in "/!?"):
            i = lt + 1  # stray '<' stays literal text
            continue
        tok = flush_text(lt)
        if tok:
            out_pending.append(tok)
        if nxt == "!":
            if s.startswith("<!--", lt):
                close = s.find("-->", lt + 4)
                i = n if close < 0 else close + 3
            elif s.startswith("<![CDATA[", lt):
                close = s.find("]]>", lt + 9)
                i = n if close < 0 else close + 3
            else:  # doctype / bogus declaration
                close = s.find(">", lt + 2)
                i = n if close < 0 else close + 1
            text_start = i
            yield from out_pending
            out_pending.clear()
            continue
        if nxt == "?":  # processing instruction — bogus-comment rule
            close = s.find(">", lt + 2)
            i = n if close < 0 else close + 1
            text_start = i
            yield from out_pending
            out_pending.clear()
            continue
        if nxt == "/":
            m = _TAG_NAME.match(s, lt + 2)
            close = s.find(">", lt + 2)
            if m is None:  # '</>' or '</ >' — bogus, skip to '>'
                i = n if close < 0 else close + 1
            elif close < 0:
                i = n  # unterminated end tag: drop the tail
            else:
                out_pending.append(("end", m.group(0).lower()))
                i = close + 1
            text_start = i
            yield from out_pending
            out_pending.clear()
            continue
        # start tag ('nxt.isalpha()' is Unicode-wide; the tag-name grammar
        # is ASCII — a non-ASCII letter after '<' stays literal text)
        m = _TAG_NAME.match(s, lt + 1)
        if m is None:
            i = lt + 1
            continue
        name = m.group(0).lower()
        j = m.end()
        attrs: dict[str, str] = {}
        self_closing = False
        while j < n:
            if s[j] == ">":
                j += 1
                break
            if s[j] == "/" and j + 1 < n and s[j + 1] == ">":
                self_closing = True
                j += 2
                break
            am = _ATTR.match(s, j)
            if am is None or am.end() == j:
                j += 1
                continue
            aname = am.group(1).lower()
            aval = am.group(2)
            if aval is None:
                aval = ""
            elif aval[:1] in "\"'" and aval[-1:] == aval[:1]:
                aval = aval[1:-1]
            if aname not in attrs:
                attrs[aname] = unescape(aval)
            j = am.end()
        else:
            # unterminated start tag: consume to EOF, emit nothing more
            i = n
            text_start = i
            yield from out_pending
            out_pending.clear()
            continue
        out_pending.append(("start", name, attrs, self_closing))
        i = j
        if name in RAWTEXT or name in RCDATA:
            close_pat = re.compile(r"</" + name + r"(?=[\s/>])|</" + name + r"$",
                                   re.IGNORECASE)
            cm = close_pat.search(s, i)
            if cm is None:
                raw = s[i:]
                i = n
            else:
                raw = s[i:cm.start()]
                gt = s.find(">", cm.start())
                i = n if gt < 0 else gt + 1
            if raw:
                out_pending.append(
                    ("text", unescape(raw) if name in RCDATA else raw)
                )
            out_pending.append(("end", name))
        text_start = i
        yield from out_pending
        out_pending.clear()

    if text_start < n:
        yield ("text", unescape(s[text_start:]))
