"""Content-tokenizer vectors ported from src/content/mod.rs:162-230."""

from pdf_ray.pdfcore.content import OBJ, OP, tokenize


def toks(b: bytes):
    return list(tokenize(b))


def test_rg_operator_not_parsed_as_reference():
    assert toks(b"1 1 1 RG") == [(OBJ, 1), (OBJ, 1), (OBJ, 1), (OP, "RG")]


def test_empty_line():
    assert toks(b"\n\n  \n\n") == []


def test_quote_operators():
    assert toks(b"( )'\"") == [(OBJ, " "), (OP, "'"), (OP, '"')]


def test_no_space_after_star_operator():
    assert toks(b"b*RG") == [(OP, "b*"), (OP, "RG")]


def test_true_false_null_are_objects():
    from pdf_ray.pdfcore.objects import NULL

    assert toks(b"true false null") == [(OBJ, True), (OBJ, False), (OBJ, NULL)]


def test_compat_section():
    got = toks(b"BX FakeOp EX q")
    assert got == [(OP, "BX"), (OP, "EX"), (OP, "q")]


def test_unknown_op_outside_compat_raises():
    import pytest

    from pdf_ray.pdfcore.objects import PdfParseError

    with pytest.raises(PdfParseError):
        toks(b"FakeOp")


def test_inline_image_tokens():
    from pdf_ray.pdfcore.content import INLINE

    got = toks(b"BI /W 2 /H 1 /CS /RGB /BPC 8 ID \x01\x02\x03\x04\x05\x06 EI q")
    assert (OP, "BI") in got
    assert (INLINE, b"\x01\x02\x03\x04\x05\x06") in got
    assert got[-1] == (OP, "q")


def test_numeric_operator_suffixes():
    assert toks(b"1 2 d0") == [(OBJ, 1), (OBJ, 2), (OP, "d0")]
    assert toks(b"0 Tr") == [(OBJ, 0), (OP, "Tr")]


def test_number_fast_path_reference_quirk():
    """`12 0 R` in a content stream lexes as an indirect-reference object
    (reference lex_number semantics); `1 1 1 RG` must NOT."""
    from pdf_ray.pdfcore.objects import Ref

    assert toks(b"12 0 R ") == [(OBJ, Ref(12, 0))]
    assert toks(b"1 1 1 RG") == [(OBJ, 1), (OBJ, 1), (OBJ, 1), (OP, "RG")]
    assert toks(b"3.14 -0.5 .25 +7 Tc") == [
        (OBJ, 3.14), (OBJ, -0.5), (OBJ, 0.25), (OBJ, 7), (OP, "Tc")
    ]
