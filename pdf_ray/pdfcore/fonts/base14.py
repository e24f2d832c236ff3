"""Base-14 standard font recognition + metrics.

The reference keeps a 30-alias name table pointing at URW .pfb files that
are NOT shipped (its pdf_fonts/ directory is empty — base-14 fallback
would panic at runtime, /root/reference/src/font/mod.rs:53-97). We ship
the same alias table plus the metrics that are derivable without
embedding Adobe's licensed AFM data:

- the Courier family is monospaced at exactly 600/1000 units per glyph
  (public, definitional: it is THE fixed-pitch standard font), so Courier
  widths are exact;
- for the proportional families we return a per-family default advance
  and the well-known space width (Helvetica/Arial 278, Times 250) —
  positions only ever feed position features, never span text/order, so
  an approximate advance degrades layout features, not extraction parity.
"""

from __future__ import annotations

# alias -> family, same names as the reference's BASE_14_FONTS table
_FAMILY_OF = {}
for _alias, _family in [
    ("Courier", "Courier"), ("CourierNewPSMT", "Courier"),
    ("Courier-Bold", "Courier"), ("Courier-Oblique", "Courier"),
    ("Courier-BoldOblique", "Courier"),
    ("Times-Roman", "Times"), ("Times New Roman", "Times"),
    ("TimesNewRomanPSMT", "Times"), ("TimesNewRoman", "Times"),
    ("Times-Bold", "Times"), ("Times New Roman,Bold", "Times"),
    ("TimesNewRomanPS-BoldMT", "Times"), ("TimesNewRoman,Bold", "Times"),
    ("Times-Italic", "Times"), ("TimesNewRoman,Italic", "Times"),
    ("TimesNewRomanPS-ItalicMT", "Times"),
    ("Times-BoldItalic", "Times"),
    ("TimesNewRomanPS-BoldItalicMT", "Times"),
    ("TimesNewRoman,BoldItalic", "Times"),
    ("Helvetica", "Helvetica"), ("Helvetica-Bold", "Helvetica"),
    ("Helvetica-Oblique", "Helvetica"),
    ("Helvetica-BoldOblique", "Helvetica"),
    ("Symbol", "Symbol"), ("ZapfDingbats", "ZapfDingbats"),
    ("Arial-BoldMT", "Helvetica"), ("ArialMT", "Helvetica"),
    ("Arial", "Helvetica"), ("Arial-Italic", "Helvetica"),
    ("Arial-ItalicMT", "Helvetica"),
]:
    _FAMILY_OF[_alias] = _family

# (default advance, space advance) per family, 1/1000 text units
_FAMILY_METRICS = {
    "Courier": (600.0, 600.0),  # exact: monospaced by definition
    "Helvetica": (556.0, 278.0),  # approximate advance; exact space
    "Times": (500.0, 250.0),  # approximate advance; exact space
    "Symbol": (500.0, 250.0),
    "ZapfDingbats": (500.0, 278.0),
}


def base14_family(base_font: str) -> str | None:
    """Normalize a /BaseFont name (subset prefixes like ABCDEF+Helvetica
    are stripped) to its base-14 family, or None."""
    name = base_font.split("+", 1)[-1]
    return _FAMILY_OF.get(name)


def base14_width_fn(base_font: str):
    """Width function for an unembedded base-14 font, or None if the name
    isn't a base-14 alias. Courier is exact; others approximate."""
    family = base14_family(base_font)
    if family is None:
        return None
    default, space = _FAMILY_METRICS[family]

    def width(code: int) -> float:
        return space if code == 0x20 else default

    return width
