"""Simple-font encodings: Standard/WinAnsi/MacRoman name tables (Latin
core), /Differences overlay, and glyph-name -> unicode (AGL subset).
Reference: src/font/encoding.rs:9-120."""

from __future__ import annotations

_LATIN_NAMES = {
    32: "space", 33: "exclam", 34: "quotedbl", 35: "numbersign",
    36: "dollar", 37: "percent", 38: "ampersand", 39: "quotesingle",
    40: "parenleft", 41: "parenright", 42: "asterisk", 43: "plus",
    44: "comma", 45: "hyphen", 46: "period", 47: "slash",
    48: "zero", 49: "one", 50: "two", 51: "three", 52: "four",
    53: "five", 54: "six", 55: "seven", 56: "eight", 57: "nine",
    58: "colon", 59: "semicolon", 60: "less", 61: "equal", 62: "greater",
    63: "question", 64: "at",
    91: "bracketleft", 92: "backslash", 93: "bracketright",
    94: "asciicircum", 95: "underscore", 96: "grave",
    123: "braceleft", 124: "bar", 125: "braceright", 126: "asciitilde",
}
for _c in range(65, 91):
    _LATIN_NAMES[_c] = chr(_c)
for _c in range(97, 123):
    _LATIN_NAMES[_c] = chr(_c)

STANDARD_ENCODING = dict(_LATIN_NAMES)
# Standard uses /quoteright at 39 and /quoteleft at 96 (Type 1 spec App. E)
STANDARD_ENCODING[39] = "quoteright"
STANDARD_ENCODING[96] = "quoteleft"

WIN_ANSI_ENCODING = dict(_LATIN_NAMES)
MAC_ROMAN_ENCODING = dict(_LATIN_NAMES)

BASE_ENCODINGS = {
    "StandardEncoding": STANDARD_ENCODING,
    "WinAnsiEncoding": WIN_ANSI_ENCODING,
    "MacRomanEncoding": MAC_ROMAN_ENCODING,
}

# glyph name -> unicode (Adobe Glyph List subset covering the tables above)
GLYPH_TO_UNICODE = {name: chr(code) for code, name in _LATIN_NAMES.items()}
GLYPH_TO_UNICODE.update(
    {
        "quoteright": "’",
        "quoteleft": "‘",
        "quotesingle": "'",
        "grave": "`",
        ".notdef": "",
        # Greek (AGL)
        "alpha": "α",
        "beta": "β",
        "gamma": "γ",
        "delta": "δ",
    }
)


def apply_differences(base: dict[int, str], differences: list) -> dict[int, str]:
    """/Differences array: ``code name name ... code name ...``
    (src/font/encoding.rs:78-120)."""
    enc = dict(base)
    code = 0
    for item in differences:
        if isinstance(item, (int, float)):
            code = int(item)
        else:
            enc[code] = str(item)
            code += 1
    return enc


def encoding_from_dict(enc_obj, resolve) -> dict[int, str]:
    """Resolve a font's /Encoding entry (name or dict with BaseEncoding +
    Differences) to a code->glyphname map."""
    enc_obj = resolve(enc_obj)
    if enc_obj is None:
        return dict(STANDARD_ENCODING)
    if isinstance(enc_obj, str) and not isinstance(enc_obj, dict):
        return dict(BASE_ENCODINGS.get(str(enc_obj), STANDARD_ENCODING))
    if isinstance(enc_obj, dict):
        base_name = resolve(enc_obj.get("BaseEncoding"))
        base = BASE_ENCODINGS.get(
            str(base_name) if base_name else "StandardEncoding",
            STANDARD_ENCODING,
        )
        diffs = resolve(enc_obj.get("Differences"))
        if isinstance(diffs, list):
            return apply_differences(base, diffs)
        return dict(base)
    return dict(STANDARD_ENCODING)
