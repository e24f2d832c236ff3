"""Date vectors ported from src/date.rs:141-199."""

import pytest

from pdf_ray.pdfcore.date import PdfDate, parse_pdf_date


def test_ends_with_single_quote_no_ut_hour():
    # from a LibreOffice PDF
    d = parse_pdf_date("D:20201125021108Z'")
    assert d == PdfDate(2020, 11, 25, 2, 11, 8, "Z", None, None)


def test_ut_min_and_ut_hour_set():
    d = parse_pdf_date("D:20201203184827-08'00'")
    assert d == PdfDate(2020, 12, 3, 18, 48, 27, "-", 8, 0)


def test_no_ut_set():
    d = parse_pdf_date("D:20080611165603")
    assert d == PdfDate(2008, 6, 11, 16, 56, 3, None, None, None)


def test_partial_dates():
    assert parse_pdf_date("D:2020") == PdfDate(2020)
    assert parse_pdf_date("D:202011") == PdfDate(2020, 11)


def test_bad_prefix():
    from pdf_ray.pdfcore.objects import PdfParseError

    with pytest.raises(PdfParseError):
        parse_pdf_date("20201125")
