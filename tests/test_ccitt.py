"""CCITT Group 3/4 decoder tests (pdfcore/ccitt.py) against the fixture
encoder (fixtures/ccittenc.py), plus spot checks of well-known ITU T.4
codewords to guard the shared tables against transcription errors."""

import numpy as np
import pytest

from pdf_ray.fixtures.ccittenc import encode_g3_1d, encode_g4
from pdf_ray.pdfcore.ccitt import (
    BLACK_CODES,
    EOL,
    WHITE_CODES,
    ccitt_fax_decode,
)
from pdf_ray.pdfcore.objects import PdfParseError


def _unpack(data, w, h):
    rb = (w + 7) // 8
    return np.stack(
        [
            np.unpackbits(np.frombuffer(data[y * rb : (y + 1) * rb], np.uint8))[:w]
            for y in range(h)
        ]
    )


def test_known_codewords():
    # ITU T.4 table 2/3 anchors
    assert WHITE_CODES[0] == "00110101"
    assert WHITE_CODES[1] == "000111"
    assert WHITE_CODES[2] == "0111"
    assert WHITE_CODES[63] == "00110100"
    assert WHITE_CODES[64] == "11011"
    assert WHITE_CODES[1728] == "010011011"
    assert BLACK_CODES[0] == "0000110111"
    assert BLACK_CODES[1] == "010"
    assert BLACK_CODES[2] == "11"
    assert BLACK_CODES[3] == "10"
    assert BLACK_CODES[64] == "0000001111"
    assert EOL == "000000000001"
    # prefix-freeness of each table (incl. extended makeups)
    from pdf_ray.pdfcore.ccitt import EXT_CODES

    for codes in ({**WHITE_CODES, **EXT_CODES}, {**BLACK_CODES, **EXT_CODES}):
        vals = sorted(codes.values(), key=len)
        for i, a in enumerate(vals):
            for b in vals[i + 1 :]:
                assert not b.startswith(a) or a == b


@pytest.mark.parametrize("shape,seed,density", [
    ((4, 16), 0, 0.5), ((16, 64), 1, 0.5), ((8, 23), 2, 0.8),
    ((40, 100), 3, 0.2), ((1, 8), 4, 0.5),
])
def test_g4_g3_roundtrip(shape, seed, density):
    rng = np.random.RandomState(seed)
    img = rng.rand(*shape) > density
    h, w = img.shape
    want = (~img).astype(np.uint8)  # default: white = 1 bits
    g4 = ccitt_fax_decode(encode_g4(img), {"K": -1, "Columns": w, "Rows": h})
    assert np.array_equal(_unpack(g4, w, h), want)
    g3 = ccitt_fax_decode(encode_g3_1d(img), {"K": 0, "Columns": w, "Rows": h})
    assert np.array_equal(_unpack(g3, w, h), want)


def test_black_is_1():
    img = np.zeros((4, 16), bool)
    img[:, :8] = True
    out = ccitt_fax_decode(
        encode_g4(img), {"K": -1, "Columns": 16, "Rows": 4, "BlackIs1": True}
    )
    assert np.array_equal(_unpack(out, 16, 4), img.astype(np.uint8))


def test_all_white_all_black():
    for img in (np.zeros((3, 24), bool), np.ones((3, 24), bool)):
        out = ccitt_fax_decode(
            encode_g4(img), {"K": -1, "Columns": 24, "Rows": 3}
        )
        assert np.array_equal(_unpack(out, 24, 3), (~img).astype(np.uint8))


def test_rows_mismatch_raises():
    img = np.zeros((2, 16), bool)
    with pytest.raises(PdfParseError):
        ccitt_fax_decode(encode_g4(img), {"K": -1, "Columns": 16, "Rows": 5})


def test_eofb_terminates_without_rows():
    img = np.eye(8, 16, dtype=bool)
    out = ccitt_fax_decode(encode_g4(img, eofb=True), {"K": -1, "Columns": 16})
    assert np.array_equal(_unpack(out, 16, 8), (~img).astype(np.uint8))


def test_f29_fixture_pixels():
    from pdf_ray.fixtures.corpus import (
        CCITT_H,
        CCITT_PIXELS,
        CCITT_W,
        f29_ccitt_image,
    )
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.images import decode_image_pixels

    pdf, golden = f29_ccitt_image()
    doc = Document(pdf)
    xobjs = doc.resolve(doc.resolve(doc.pages[0].resources)["XObject"])
    stream = doc.resolve_stream(xobjs["Im1"])
    w, h, rgb = decode_image_pixels(stream, doc.resolve)
    assert (w, h) == (CCITT_W, CCITT_H)
    assert rgb == CCITT_PIXELS


def test_byte_aligned_rows():
    rng = np.random.RandomState(9)
    img = rng.rand(12, 30) > 0.5
    h, w = img.shape
    want = (~img).astype(np.uint8)
    from pdf_ray.fixtures.ccittenc import encode_g3_1d, encode_g4

    g4 = ccitt_fax_decode(
        encode_g4(img, byte_align=True),
        {"K": -1, "Columns": w, "Rows": h, "EncodedByteAlign": True},
    )
    assert np.array_equal(_unpack(g4, w, h), want)
    g3 = ccitt_fax_decode(
        encode_g3_1d(img, byte_align=True),
        {"K": 0, "Columns": w, "Rows": h, "EncodedByteAlign": True},
    )
    assert np.array_equal(_unpack(g3, w, h), want)


def test_k_positive_mixed_mode_1d_rows():
    rng = np.random.RandomState(11)
    img = rng.rand(9, 40) > 0.6
    h, w = img.shape
    from pdf_ray.fixtures.ccittenc import encode_g3_mixed_1d

    out = ccitt_fax_decode(
        encode_g3_mixed_1d(img), {"K": 4, "Columns": w, "Rows": h}
    )
    assert np.array_equal(_unpack(out, w, h), (~img).astype(np.uint8))


def test_g4_adversarial_patterns():
    """Patterns that force specific 2-D modes: a diagonal edge moving 3px
    per row (max vertical offsets), isolated pixels (horizontal mode with
    0-length white runs), and alternating columns (dense short runs)."""
    w = 64
    # diagonal: black run [r*3, r*3+5) per row -> VR3/VL3 territory
    diag = np.zeros((16, w), bool)
    for r in range(16):
        diag[r, min(r * 3, w - 5) : min(r * 3 + 5, w)] = True
    # isolated pixels at varying offsets
    dots = np.zeros((8, w), bool)
    for r in range(8):
        dots[r, (r * 11) % w] = True
    # alternating columns (worst-case run count)
    alt = np.tile(np.arange(w) % 2 == 0, (6, 1))
    for img in (diag, dots, alt):
        h = img.shape[0]
        out = ccitt_fax_decode(
            encode_g4(img), {"K": -1, "Columns": w, "Rows": h}
        )
        assert np.array_equal(_unpack(out, w, h), (~img).astype(np.uint8))
