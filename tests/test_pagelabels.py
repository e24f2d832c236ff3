"""Page-label formatting + number-tree walk (pdfcore/pagelabels.py)."""

import pytest

from pdf_ray.pdfcore.objects import PdfParseError
from pdf_ray.pdfcore.pagelabels import _letters, _roman, page_labels


def test_roman_numerals():
    cases = {
        1: "i", 2: "ii", 4: "iv", 9: "ix", 14: "xiv", 40: "xl",
        90: "xc", 400: "cd", 1990: "mcmxc", 2024: "mmxxiv",
    }
    for n, s in cases.items():
        assert _roman(n, False) == s
        assert _roman(n, True) == s.upper()
    with pytest.raises(PdfParseError):
        _roman(0, False)


def test_letter_labels():
    assert _letters(1, True) == "A"
    assert _letters(26, True) == "Z"
    assert _letters(27, True) == "AA"  # doubled, not AB (Table 159)
    assert _letters(53, False) == "aaa"
    with pytest.raises(PdfParseError):
        _letters(0, True)


def test_page_labels_fixture_tree():
    """The f45 Kids/Limits/Nums tree resolves to the hand-written
    golden (roman front matter, prefixed decimal with /St, letters)."""
    from pdf_ray.fixtures.corpus import F45_LABELS, f45_page_labels
    from pdf_ray.pdfcore.document import Document

    pdf, _ = f45_page_labels()
    assert page_labels(Document(pdf)) == F45_LABELS


def test_page_labels_absent_is_empty():
    from pdf_ray.fixtures.corpus import f18_outlier_200pp
    from pdf_ray.pdfcore.document import Document

    pdf, _ = f18_outlier_200pp(n_pages=3)
    assert page_labels(Document(pdf)) == []
