"""Object-lexer vectors ported verbatim from the reference's inline tests
(src/lex.rs:564-672) plus parity edge cases from SURVEY.md §7.4.1."""

import pytest

from pdf_ray.pdfcore.lexer import Lexer
from pdf_ray.pdfcore.objects import NULL, Name, Ref


def lex(b: bytes):
    return Lexer(b).lex_object()


def test_empty_array():
    assert lex(b"[]") == []
    assert lex(b"[   ]") == []


def test_array_single_element_whitespace():
    assert lex(b"[1.0]") == [1.0]
    assert lex(b"[   1.0   ]") == [1.0]
    assert lex(b"[1.0   ]") == [1.0]
    assert lex(b"[   1.0]") == [1.0]


def test_string_with_escapes():
    assert lex(b"(\\n\\ra\\t\\)3\\\\)") == "\n\ra\t)3\\"


def test_string_with_octal_escapes():
    assert lex(b"(\\0\\0053\\053\\53)") == "\x00\x053++"


def test_hex_strings():
    assert lex(b"<>") == ""
    assert lex(b"<005B>") == "\x00\x5b"
    assert lex(b"<901FA>") == "\x90\x1f\xa0"  # odd length pads low nibble


def test_utf16_hex_string():
    assert lex(b"<FEFF00480069>") == "Hi"
    assert lex(b"<feff263A>") == "☺"


def test_keywords():
    assert lex(b"true") is True
    assert lex(b"false") is False
    assert lex(b"null") is NULL


def test_floats():
    assert lex(b"1.0") == 1.0
    assert lex(b"+1.0") == 1.0
    assert lex(b".5") == 0.5
    assert lex(b"+.5") == 0.5
    assert lex(b"-1.0") == -1.0
    assert lex(b"-.5") == -0.5
    assert lex(b"05.05") == 5.05


def test_names():
    assert lex(b"/a") == Name("a")
    assert lex(b"/abcde") == Name("abcde")
    assert lex(b"/1.4") == Name("1.4")
    assert lex(b"/$1.4") == Name("$1.4")
    assert lex(b"/abc[") == Name("abc")
    assert lex(b"/abc<") == Name("abc")
    assert lex(b"/A#42C ") == Name("ABC")  # '#'-escape


def test_comments():
    assert lex(b"%\n(abc)") == "abc"
    assert lex(b"%%\n(abc)") == "abc"
    assert lex(b"%%%%%\n(abc)") == "abc"
    assert lex(b"%(effg)\n(abc)") == "abc"
    assert lex(b"%(z)\n%(y)\n%(x)\n(abc)%(z)\n%(y)\n%(x)\n") == "abc"


def test_references():
    assert lex(b"12 0 R ") == Ref(12, 0)
    assert lex(b"12 0 R/") == Ref(12, 0)
    assert lex(b"12 0 ") == 12  # no R -> integer, cursor backtracks
    assert lex(b"12 0 RG") == 12  # RG is not a reference terminator


def test_nested_parens_and_continuation():
    assert lex(b"(a(b(c))d)") == "a(b(c))d"
    assert lex(b"(foo\\\n   bar)") == "foobar"


def test_dict_simple():
    d = lex(b"<< /A 1 /B (two) /C [3] /D << /E /F >> >>")
    assert d == {"A": 1, "B": "two", "C": [3], "D": {"E": Name("F")}}


def test_stream_with_direct_length():
    lx = Lexer(b"<< /Length 5 >>\nstream\nhello\nendstream")
    s = lx.lex_object()
    assert s.raw == b"hello"
    assert s.dict == {"Length": 5}


def test_bad_object_start():
    from pdf_ray.pdfcore.objects import PdfParseError

    with pytest.raises(PdfParseError):
        lex(b"}")
