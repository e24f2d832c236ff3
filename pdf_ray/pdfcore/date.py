"""PDF date strings: ``D:YYYYMMDDHHmmSSOHH'mm'`` (PDF 32000-1 §7.9.4;
reference: src/date.rs — all fields after ``D:`` optional, offset
relationship one of ``+ - Z``)."""

from __future__ import annotations

from dataclasses import dataclass

from .objects import PdfParseError


@dataclass
class PdfDate:
    year: int | None = None
    month: int | None = None
    day: int | None = None
    hour: int | None = None
    minute: int | None = None
    second: int | None = None
    ut_relationship: str | None = None  # "+", "-", "Z"
    ut_hour_offset: int | None = None
    ut_minute_offset: int | None = None


def parse_pdf_date(s: str) -> PdfDate:
    if not s.startswith("D:"):
        raise PdfParseError(f"bad date prefix in {s!r}")
    i = 2
    n = len(s)
    d = PdfDate()

    def unit(width: int) -> int | None:
        nonlocal i
        if i >= n or not s[i].isdigit():
            return None
        v = 0
        for _ in range(width):
            if i >= n or not s[i].isdigit():
                raise PdfParseError(f"truncated date field in {s!r}")
            v = v * 10 + int(s[i])
            i += 1
        return v

    d.year = unit(4)
    d.month = unit(2)
    d.day = unit(2)
    d.hour = unit(2)
    d.minute = unit(2)
    d.second = unit(2)
    if i < n and s[i] in "+-Z":
        d.ut_relationship = s[i]
        i += 1
    if i < n and s[i] == "'":
        i += 1  # Z' form (seen in LibreOffice output)
    d.ut_hour_offset = unit(2)
    if i < n and s[i] == "'":
        i += 1
    d.ut_minute_offset = unit(2)
    if i < n and s[i] == "'":
        i += 1
    return d
