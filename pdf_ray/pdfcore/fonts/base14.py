"""Base-14 standard font recognition + metrics.

The reference keeps a 30-alias name table pointing at URW .pfb files that
are NOT shipped (its pdf_fonts/ directory is empty — base-14 fallback
would panic at runtime, /root/reference/src/font/mod.rs:53-97). We ship
the same alias table plus real metrics:

- the Courier family is monospaced at exactly 600/1000 units per glyph
  (public, definitional: it is THE fixed-pitch standard font);
- the Helvetica and Times faces carry the printable-ASCII (32-126) glyph
  advances transcribed from Adobe's published Core-14 AFM files (the AFM
  metrics are freely redistributable per Adobe's AFM license note);
  codes outside that range fall back to the family default;
- Symbol and ZapfDingbats keep the family-default approximation (their
  glyph sets are non-ASCII; per-glyph AFM data is deliberately not
  embedded — positions only ever feed position features, never span
  text/order, so an approximate advance degrades layout features, not
  extraction parity).
"""

from __future__ import annotations

# alias -> (family, face), same names as the reference's BASE_14_FONTS
# table; face picks the width table, family the fallback metrics
_BASE14 = {}
for _alias, _family, _face in [
    ("Courier", "Courier", "Courier"),
    ("CourierNewPSMT", "Courier", "Courier"),
    ("Courier-Bold", "Courier", "Courier"),
    ("Courier-Oblique", "Courier", "Courier"),
    ("Courier-BoldOblique", "Courier", "Courier"),
    ("Times-Roman", "Times", "Times-Roman"),
    ("Times New Roman", "Times", "Times-Roman"),
    ("TimesNewRomanPSMT", "Times", "Times-Roman"),
    ("TimesNewRoman", "Times", "Times-Roman"),
    ("Times-Bold", "Times", "Times-Bold"),
    ("Times New Roman,Bold", "Times", "Times-Bold"),
    ("TimesNewRomanPS-BoldMT", "Times", "Times-Bold"),
    ("TimesNewRoman,Bold", "Times", "Times-Bold"),
    ("Times-Italic", "Times", "Times-Italic"),
    ("TimesNewRoman,Italic", "Times", "Times-Italic"),
    ("TimesNewRomanPS-ItalicMT", "Times", "Times-Italic"),
    ("Times-BoldItalic", "Times", "Times-BoldItalic"),
    ("TimesNewRomanPS-BoldItalicMT", "Times", "Times-BoldItalic"),
    ("TimesNewRoman,BoldItalic", "Times", "Times-BoldItalic"),
    ("Helvetica", "Helvetica", "Helvetica"),
    ("Helvetica-Bold", "Helvetica", "Helvetica-Bold"),
    ("Helvetica-Oblique", "Helvetica", "Helvetica"),
    ("Helvetica-BoldOblique", "Helvetica", "Helvetica-Bold"),
    ("Symbol", "Symbol", None),
    ("ZapfDingbats", "ZapfDingbats", None),
    ("Arial-BoldMT", "Helvetica", "Helvetica-Bold"),
    ("ArialMT", "Helvetica", "Helvetica"),
    ("Arial", "Helvetica", "Helvetica"),
    ("Arial-Italic", "Helvetica", "Helvetica"),
    ("Arial-ItalicMT", "Helvetica", "Helvetica"),
]:
    _BASE14[_alias] = (_family, _face)

# (default advance, space advance) per family, 1/1000 text units
_FAMILY_METRICS = {
    "Courier": (600.0, 600.0),  # exact: monospaced by definition
    "Helvetica": (556.0, 278.0),
    "Times": (500.0, 250.0),
    "Symbol": (500.0, 250.0),
    "ZapfDingbats": (500.0, 278.0),
}

# Printable-ASCII advances (codes 32..126 in order) from the published
# Adobe Core-14 AFMs. The oblique/italic Helvetica faces share the
# upright faces' metrics (true of the real AFMs). Values are 1/1000 em.
_ASCII_WIDTHS: dict[str, tuple[int, ...]] = {
    "Helvetica": (
        278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278,
        333, 278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556,
        278, 278, 584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611,
        778, 722, 278, 500, 667, 556, 833, 722, 778, 667, 778, 722, 667,
        611, 722, 667, 944, 667, 667, 611, 278, 278, 278, 469, 556, 333,
        556, 556, 500, 556, 556, 278, 556, 556, 222, 222, 500, 222, 833,
        556, 556, 556, 556, 333, 500, 278, 556, 500, 722, 500, 500, 500,
        334, 260, 334, 584,
    ),
    "Helvetica-Bold": (
        278, 333, 474, 556, 556, 889, 722, 238, 333, 333, 389, 584, 278,
        333, 278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556,
        333, 333, 584, 584, 584, 611, 975, 722, 722, 722, 722, 667, 611,
        778, 722, 278, 556, 722, 611, 833, 722, 778, 667, 778, 722, 667,
        611, 722, 667, 944, 667, 667, 611, 333, 278, 333, 584, 556, 333,
        556, 611, 556, 611, 556, 333, 611, 611, 278, 278, 556, 278, 889,
        611, 611, 611, 611, 389, 556, 333, 611, 556, 778, 556, 556, 500,
        389, 280, 389, 584,
    ),
    "Times-Roman": (
        250, 333, 408, 500, 500, 833, 778, 180, 333, 333, 500, 564, 250,
        333, 250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500,
        278, 278, 564, 564, 564, 444, 921, 722, 667, 667, 722, 611, 556,
        722, 722, 333, 389, 722, 611, 889, 722, 722, 556, 722, 667, 556,
        611, 722, 722, 944, 722, 722, 611, 333, 278, 333, 469, 500, 333,
        444, 500, 444, 500, 444, 333, 500, 500, 278, 278, 500, 278, 778,
        500, 500, 500, 500, 333, 389, 278, 500, 500, 722, 500, 500, 444,
        480, 200, 480, 541,
    ),
    "Times-Bold": (
        250, 333, 555, 500, 500, 1000, 833, 278, 333, 333, 500, 570, 250,
        333, 250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500,
        333, 333, 570, 570, 570, 500, 930, 722, 667, 722, 722, 667, 611,
        778, 778, 389, 500, 778, 667, 944, 722, 778, 611, 778, 722, 556,
        667, 722, 722, 1000, 722, 722, 667, 333, 278, 333, 581, 500, 333,
        500, 556, 444, 556, 444, 333, 500, 556, 278, 333, 556, 278, 833,
        556, 500, 556, 556, 444, 389, 333, 556, 500, 722, 500, 500, 444,
        394, 220, 394, 520,
    ),
    "Times-Italic": (
        250, 333, 420, 500, 500, 833, 778, 214, 333, 333, 500, 675, 250,
        333, 250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500,
        333, 333, 675, 675, 675, 500, 920, 611, 611, 667, 722, 611, 611,
        722, 722, 333, 444, 667, 556, 833, 667, 722, 611, 722, 611, 500,
        556, 722, 611, 833, 611, 556, 556, 389, 278, 389, 422, 500, 333,
        500, 500, 444, 500, 444, 278, 500, 500, 278, 278, 444, 278, 722,
        500, 500, 500, 500, 389, 389, 278, 500, 444, 667, 444, 444, 389,
        400, 275, 400, 541,
    ),
    "Times-BoldItalic": (
        250, 389, 555, 500, 500, 833, 778, 278, 333, 333, 500, 570, 250,
        333, 250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500,
        333, 333, 570, 570, 570, 500, 832, 667, 667, 667, 722, 667, 667,
        722, 778, 389, 500, 667, 611, 889, 722, 722, 611, 722, 667, 556,
        611, 722, 667, 889, 667, 611, 611, 333, 278, 333, 570, 500, 333,
        500, 500, 444, 500, 444, 333, 500, 556, 278, 278, 500, 278, 778,
        556, 500, 500, 500, 389, 389, 278, 556, 444, 667, 500, 444, 389,
        348, 220, 348, 570,
    ),
}


def base14_family(base_font: str) -> str | None:
    """Normalize a /BaseFont name (subset prefixes like ABCDEF+Helvetica
    are stripped) to its base-14 family, or None."""
    name = base_font.split("+", 1)[-1]
    entry = _BASE14.get(name)
    return entry[0] if entry else None


def base14_width_fn(base_font: str):
    """Width function for an unembedded base-14 font, or None if the name
    isn't a base-14 alias. Courier is exact (600 monospace); Helvetica /
    Times faces are AFM-exact for printable ASCII with family-default
    fallback; Symbol/ZapfDingbats approximate."""
    name = base_font.split("+", 1)[-1]
    entry = _BASE14.get(name)
    if entry is None:
        return None
    family, face = entry
    default, space = _FAMILY_METRICS[family]
    table = _ASCII_WIDTHS.get(face) if face else None
    if table is None:

        def width(code: int) -> float:
            return space if code == 0x20 else default

        return width

    def width(code: int) -> float:
        if 32 <= code <= 126:
            return float(table[code - 32])
        return default

    return width
