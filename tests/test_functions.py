"""PDF function evaluator unit vectors (PDF 32000-1 §7.10; reference
models the same four types in src/function/mod.rs:19-37). End-to-end
image coverage lives in the f44 fixture golden."""

import pytest

from pdf_ray.pdfcore.functions import PdfFunction, _ps_exec, _ps_parse
from pdf_ray.pdfcore.objects import PdfParseError, Stream


def run_ps(src, stack):
    prog = _ps_parse(src)
    _ps_exec(prog, stack)
    return stack


@pytest.mark.parametrize(
    "src,inp,out",
    [
        ("{ add }", [3, 4], [7]),
        ("{ sub }", [10, 4], [6]),
        ("{ 2 copy add 2 div 0 }", [0.5, 0.25], [0.5, 0.25, 0.375, 0]),
        ("{ dup mul }", [3.0], [9.0]),
        ("{ neg abs }", [-5], [5]),
        ("{ 3 1 roll }", [1, 2, 3], [3, 1, 2]),
        ("{ 1 index }", [7, 8], [7, 8, 7]),
        ("{ 2 copy }", [1, 2], [1, 2, 1, 2]),
        ("{ exch }", [1, 2], [2, 1]),
        ("{ gt { 10 } { 20 } ifelse }", [3, 2], [10]),
        ("{ le { 10 } { 20 } ifelse }", [3, 2], [20]),
        ("{ true { 1 } if }", [], [1]),
        ("{ false { 1 } if 2 }", [], [2]),
        ("{ 7 3 idiv }", [], [2]),
        ("{ 7 3 mod }", [], [1.0]),
        ("{ floor }", [2.7], [2.0]),
        ("{ ceiling }", [2.1], [3.0]),
        ("{ truncate }", [-2.7], [-2.0]),
        ("{ round }", [2.5], [3.0]),
        ("{ round }", [-2.5], [-3.0]),
        ("{ 1 3 bitshift }", [], [8]),
        ("{ 5 3 and }", [], [1]),
        ("{ 5 3 or }", [], [7]),
        ("{ 5 3 xor }", [], [6]),
        ("{ cvi }", [2.9], [2]),
        ("{ sqrt }", [9.0], [3.0]),
    ],
)
def test_ps_ops(src, inp, out):
    assert run_ps(src, list(inp)) == out


def test_ps_unknown_op():
    with pytest.raises(PdfParseError):
        run_ps("{ frobnicate }", [])


def _ident(x):
    return x


def test_exponential():
    fn = PdfFunction(
        {
            "FunctionType": 2,
            "Domain": [0, 1],
            "C0": [0.0, 1.0],
            "C1": [1.0, 0.0],
            "N": 2,
        },
        _ident,
    )
    assert fn([0.0]) == [0.0, 1.0]
    assert fn([1.0]) == [1.0, 0.0]
    assert fn([0.5]) == [0.25, 0.75]
    # input clipped to Domain
    assert fn([2.0]) == [1.0, 0.0]


def test_stitching():
    fn = PdfFunction(
        {
            "FunctionType": 3,
            "Domain": [0, 1],
            "Bounds": [0.5],
            "Encode": [0, 1, 1, 0],  # second half REVERSED
            "Functions": [
                {"FunctionType": 2, "Domain": [0, 1], "C0": [0.0], "C1": [1.0], "N": 1},
                {"FunctionType": 2, "Domain": [0, 1], "C0": [0.0], "C1": [1.0], "N": 1},
            ],
        },
        _ident,
    )
    assert fn([0.25]) == [0.5]
    assert fn([0.75]) == [0.5]  # encoded reversed: (0.75-0.5)/0.5 -> 0.5 -> 1-0.5
    assert fn([1.0]) == [0.0]


def _mk_stream(dict_, data):
    return Stream(dict_, data)


def test_sampled_1d():
    st = _mk_stream(
        {
            "FunctionType": 0,
            "Domain": [0, 1],
            "Range": [0, 1],
            "Size": [4],
            "BitsPerSample": 8,
        },
        bytes([0, 85, 170, 255]),
    )
    fn = PdfFunction(st, _ident)
    assert fn([0.0]) == [0.0]
    assert fn([1.0]) == [1.0]
    v = fn([0.5])[0]  # e=1.5: halfway between 85 and 170 -> 127.5/255
    assert abs(v - 0.5) < 1e-9


def test_sampled_2d_bilinear():
    # 2x2 grid, identity-ish: f(x, y) = x with corners 0,255 / 0,255
    st = _mk_stream(
        {
            "FunctionType": 0,
            "Domain": [0, 1, 0, 1],
            "Range": [0, 1],
            "Size": [2, 2],
            "BitsPerSample": 8,
        },
        bytes([0, 255, 0, 255]),  # first input varies fastest
    )
    fn = PdfFunction(st, _ident)
    assert fn([0.0, 0.0]) == [0.0]
    assert fn([1.0, 1.0]) == [1.0]
    assert abs(fn([0.5, 0.25])[0] - 0.5) < 1e-9


def test_sampled_16bit_and_subbyte():
    st = _mk_stream(
        {
            "FunctionType": 0,
            "Domain": [0, 1],
            "Range": [0, 1],
            "Size": [2],
            "BitsPerSample": 16,
        },
        (0).to_bytes(2, "big") + (65535).to_bytes(2, "big"),
    )
    fn = PdfFunction(st, _ident)
    assert fn([1.0]) == [1.0]
    st4 = _mk_stream(
        {
            "FunctionType": 0,
            "Domain": [0, 1],
            "Range": [0, 1],
            "Size": [4],
            "BitsPerSample": 4,
        },
        bytes([0x0F, 0x5A]),  # samples 0, 15, 5, 10
    )
    fn4 = PdfFunction(st4, _ident)
    assert fn4([0.0]) == [0.0]
    assert abs(fn4([1.0 / 3.0])[0] - 1.0) < 1e-9


def test_ps_function_stream():
    st = _mk_stream(
        {
            "FunctionType": 4,
            "Domain": [0, 1],
            "Range": [0, 1, 0, 1],
        },
        b"{ dup 1 exch sub }",
    )
    fn = PdfFunction(st, _ident)
    assert fn([0.25]) == [0.25, 0.75]


def test_range_clip():
    fn = PdfFunction(
        {
            "FunctionType": 2,
            "Domain": [0, 1],
            "Range": [0, 0.5],
            "C0": [0.0],
            "C1": [1.0],
            "N": 1,
        },
        _ident,
    )
    assert fn([1.0]) == [0.5]
