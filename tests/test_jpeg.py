"""Baseline JPEG decoder tests (pdfcore/jpeg.py) against the fixture
encoder (fixtures/jpegenc.py). The uniform-block cases are EXACT by
construction (flat q=16 divides the only nonzero DCT coefficient), which
is also what makes f24's hand-written pixel golden valid."""

import numpy as np
import pytest

from pdf_ray.fixtures.jpegenc import encode_jpeg
from pdf_ray.pdfcore.jpeg import decode_jpeg
from pdf_ray.pdfcore.objects import PdfParseError


def _roundtrip(img, **kw):
    w, h, nc, px = decode_jpeg(encode_jpeg(img, **kw))
    shape = (h, w) if nc == 1 else (h, w, 3)
    return np.frombuffer(px, np.uint8).reshape(shape)


def test_uniform_gray_exact():
    img = np.full((16, 8), 160, np.uint8)
    assert np.array_equal(_roundtrip(img, qtable=16), img)


def test_two_block_gray_exact_dc_diff():
    img = np.empty((8, 16), np.uint8)
    img[:, :8], img[:, 8:] = 160, 96
    assert np.array_equal(_roundtrip(img, qtable=16), img)


def test_uniform_rgb_exact():
    # R=G=B=160 -> Y=160, Cb=Cr=128 exactly; decode is exact
    img = np.full((16, 8, 3), 160, np.uint8)
    assert np.array_equal(_roundtrip(img, qtable=16), img)


def test_gradient_gray_tolerance():
    img = (np.arange(64 * 48).reshape(48, 64) % 251).astype(np.uint8)
    got = _roundtrip(img, qtable=8).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 16


def test_rgb_444_tolerance():
    xx, yy = np.meshgrid(np.arange(32), np.arange(24))
    img = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    got = _roundtrip(img, qtable=4).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 8


def test_rgb_420_subsampled_and_restart():
    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    img = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    got = _roundtrip(img, qtable=4, subsample=True).astype(int)
    assert np.abs(got - img.astype(int)).max() <= 16
    # restart markers must not change the decode
    got_dri = _roundtrip(
        img, qtable=4, subsample=True, restart_interval=2
    ).astype(int)
    assert np.array_equal(got, got_dri)


def test_non_multiple_of_8_dims():
    img = np.full((5, 11), 96, np.uint8)
    got = _roundtrip(img, qtable=16)
    assert got.shape == (5, 11)
    assert np.array_equal(got, img)


def test_progressive_matches_sequential_gray():
    """Progressive (SOF2) decode of identical coefficients must be
    bit-exact with the sequential decode — same stores, same IDCT."""
    from pdf_ray.fixtures.jpegenc import encode_jpeg_progressive

    img = (np.arange(24 * 17).reshape(24, 17) % 251).astype(np.uint8)
    for q in (16, 7):
        for al in (0, 1, 2):
            assert decode_jpeg(encode_jpeg_progressive(img, qtable=q, al=al)) == (
                decode_jpeg(encode_jpeg(img, qtable=q))
            )


def test_progressive_matches_sequential_rgb():
    from pdf_ray.fixtures.jpegenc import encode_jpeg_progressive

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (19, 27, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg_progressive(img, qtable=7, al=1)) == (
        decode_jpeg(encode_jpeg(img, qtable=7))
    )


def test_progressive_eob_runs_across_blocks():
    """A mostly-flat multi-block image produces multi-block EOB runs
    (EOBn, n > 1) in both first and refinement AC scans; decode must
    stay in sync through them."""
    from pdf_ray.fixtures.jpegenc import encode_jpeg_progressive

    img = np.full((40, 48), 130, np.uint8)
    img[3, 5] = 180  # one busy block among many empty ones
    img[25, 40] = 90
    assert decode_jpeg(encode_jpeg_progressive(img, qtable=16, al=1)) == (
        decode_jpeg(encode_jpeg(img, qtable=16))
    )


def test_arithmetic_sof_rejected():
    d = encode_jpeg(np.full((8, 8), 128, np.uint8))
    d = d.replace(b"\xff\xc0", b"\xff\xc9", 1)  # SOF9 arithmetic
    with pytest.raises(PdfParseError):
        decode_jpeg(d)


def test_not_a_jpeg_rejected():
    with pytest.raises(PdfParseError):
        decode_jpeg(b"not a jpeg at all")


def test_f24_golden_pixels_match_hand_derivation():
    """The committed f24 golden (DCT_PIXELS/DCT_REF) equals what the
    decoder actually produces for the fixture JPEG."""
    from pdf_ray.fixtures.corpus import DCT_H, DCT_PIXELS, DCT_W, f24_dct_image
    from pdf_ray.pdfcore.document import Document
    from pdf_ray.pdfcore.images import decode_image_pixels
    from pdf_ray.pdfcore.objects import Stream

    pdf, golden = f24_dct_image()
    doc = Document(pdf)
    xobjs = doc.resolve(doc.resolve(doc.pages[0].resources)["XObject"])
    stream = doc.resolve_stream(xobjs["Im1"])
    w, h, rgb = decode_image_pixels(stream, doc.resolve)
    assert (w, h) == (DCT_W, DCT_H)
    assert rgb == DCT_PIXELS


def test_12bit_grayscale():
    """12-bit samples (level shift 2048, pq=1 DQT) scale to 8-bit output:
    uniform blocks chosen so quantization round-trips exactly."""
    from pdf_ray.fixtures.jpegenc import encode_jpeg_components

    img = np.empty((8, 16), np.float64)
    img[:, :8] = 2560  # -> 2560 // 16 = 160
    img[:, 8:] = 1024  # -> 64
    w, h, nc, px = decode_jpeg(encode_jpeg_components([img], qtable=8, precision=12))
    assert (w, h, nc) == (16, 8, 1)
    arr = np.frombuffer(px, np.uint8).reshape(8, 16)
    assert (arr[:, :8] == 160).all() and (arr[:, 8:] == 64).all()


def test_cmyk_adobe_inverted():
    """4-component CMYK with APP14 transform 0: stored values are
    inverted ink (255 = no ink); pure-cyan and no-ink blocks decode to
    the hand-computed RGB."""
    from pdf_ray.fixtures.jpegenc import encode_jpeg_components

    C = np.empty((8, 16), np.float64)
    C[:, :8] = 0    # full cyan (stored 0 = ink 255)
    C[:, 8:] = 255  # no cyan
    M = np.full((8, 16), 255.0)
    Y = np.full((8, 16), 255.0)
    K = np.full((8, 16), 255.0)  # no black
    w, h, nc, px = decode_jpeg(
        encode_jpeg_components([C, M, Y, K], qtable=8, adobe_transform=0)
    )
    assert (w, h, nc) == (16, 8, 3)
    arr = np.frombuffer(px, np.uint8).reshape(8, 16, 3)
    assert (arr[:, :8] == [0, 255, 255]).all()   # cyan
    assert (arr[:, 8:] == [255, 255, 255]).all()  # white


def test_ycck_adobe_transform2():
    """YCCK (transform 2): gray R'=G'=B'=v encodes as Y=v, Cb=Cr=128;
    with no black ink the decode returns (v, v, v)."""
    from pdf_ray.fixtures.jpegenc import encode_jpeg_components

    Yp = np.full((8, 8), 160.0)
    Cb = np.full((8, 8), 128.0)
    Cr = np.full((8, 8), 128.0)
    K = np.full((8, 8), 255.0)
    w, h, nc, px = decode_jpeg(
        encode_jpeg_components([Yp, Cb, Cr, K], qtable=8, adobe_transform=2)
    )
    arr = np.frombuffer(px, np.uint8).reshape(8, 8, 3)
    assert (arr == 160).all()


def test_cmyk_no_adobe_marker_direct_ink():
    """Without APP14 the samples ARE ink values (0 = no ink)."""
    from pdf_ray.fixtures.jpegenc import encode_jpeg_components

    zero = np.zeros((8, 8), np.float64)
    k = np.full((8, 8), 255.0)  # full black ink
    w, h, nc, px = decode_jpeg(encode_jpeg_components([zero, zero, zero, k], qtable=8))
    arr = np.frombuffer(px, np.uint8).reshape(8, 8, 3)
    assert (arr == 0).all()


def test_rgb_adobe_transform0_no_color_transform():
    """APP14 transform 0 on a 3-component frame means the samples are
    stored RGB — no YCbCr inverse must be applied."""
    from pdf_ray.fixtures.jpegenc import encode_jpeg_components

    r = np.full((8, 8), 200.0)
    g = np.full((8, 8), 100.0)
    b = np.full((8, 8), 50.0)
    w, h, nc, px = decode_jpeg(
        encode_jpeg_components([r, g, b], qtable=8, adobe_transform=0)
    )
    arr = np.frombuffer(px, np.uint8).reshape(8, 8, 3)
    assert (arr == [200, 100, 50]).all()


def test_fuzz_truncation_and_bitflips_raise_typed():
    """Truncated or bit-flipped streams must raise PdfParseError (the
    row-containment type), never bare Index/Key errors."""
    from pdf_ray.fixtures.jpegenc import encode_jpeg_progressive

    img = (np.arange(16 * 24).reshape(16, 24) % 251).astype(np.uint8)
    for good in (encode_jpeg(img, qtable=7),
                 encode_jpeg_progressive(img, qtable=7, al=1)):
        for k in range(0, len(good), 17):
            try:
                decode_jpeg(good[:k])
            except PdfParseError:
                pass
        for seed in range(20):
            rng = np.random.RandomState(seed)
            blob = bytearray(good)
            for _ in range(3):
                blob[rng.randint(0, len(blob))] ^= 1 << rng.randint(0, 8)
            try:
                decode_jpeg(bytes(blob))
            except PdfParseError:
                pass


def _strip_dht(blob: bytes) -> bytes:
    """Remove every DHT segment from a JPEG byte stream (the DHT-less
    MJPEG convention: tables implied = T.81 Annex K defaults)."""
    out = bytearray(blob[:2])
    pos = 2
    while pos + 4 <= len(blob):
        assert blob[pos] == 0xFF
        marker = blob[pos + 1]
        if marker == 0xDA:  # SOS: copy the rest verbatim
            out += blob[pos:]
            break
        seglen = int.from_bytes(blob[pos + 2 : pos + 4], "big")
        if marker != 0xC4:
            out += blob[pos : pos + 2 + seglen]
        pos += 2 + seglen
    return bytes(out)


def test_dhtless_mjpeg_uses_annex_k_defaults():
    """The fixture encoder emits the Annex K luminance tables, so a
    DHT-stripped stream must decode bit-identically via the injected
    defaults."""
    img = (np.arange(24 * 16).reshape(24, 16) % 251).astype(np.uint8)
    full = encode_jpeg(img, qtable=8)
    bare = _strip_dht(full)
    assert b"\xff\xc4" not in bare[:bare.index(b"\xff\xda")]
    assert len(bare) < len(full)
    assert decode_jpeg(bare) == decode_jpeg(full)


def test_dhtless_rgb_restart_annex_k():
    img = np.full((16, 16, 3), 77, np.uint8)
    img[8:, :, 0] = 200
    full = encode_jpeg(img, qtable=4, restart_interval=2)
    assert decode_jpeg(_strip_dht(full)) == decode_jpeg(full)
