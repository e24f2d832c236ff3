"""JPEG 2000 (JPXDecode) codec tests: lossless 5/3 roundtrips across the
codestream-feature matrix (levels, tiles, grid/tile origins, precincts,
code-block sizes, SOP/EPH, segmentation symbols, progression orders, JP2
container, bit depths), 9/7 irreversible error bounds, the image-layer
filter path, and malformed-stream/fuzz behavior (typed PdfParseError,
bounded time). The fixture-side encoder (fixtures/jpxenc.py) and the
decoder (pdfcore/jpx.py) are independent transcriptions of T.800's
forward/inverse flows sharing only table constants."""

import numpy as np
import pytest

from pdf_ray.fixtures.jpxenc import encode_jpx
from pdf_ray.pdfcore.jpx import decode_codestream, decode_jpx
from pdf_ray.pdfcore.objects import PdfParseError, Stream

RNG = np.random.RandomState(1234)


def _rt_gray(img, **kw):
    cs = encode_jpx(img, **kw)
    w, h, n, s = decode_jpx(cs)
    assert (w, h, n) == (img.shape[1], img.shape[0], 1)
    return np.frombuffer(s, np.uint8).reshape(h, w)


def _rt_rgb(img, **kw):
    cs = encode_jpx(img, **kw)
    w, h, n, s = decode_jpx(cs)
    assert (w, h, n) == (img.shape[1], img.shape[0], 3)
    return np.frombuffer(s, np.uint8).reshape(h, w, 3)


@pytest.mark.parametrize("levels", [0, 1, 3])
def test_lossless_gray_levels(levels):
    img = RNG.randint(0, 256, (21, 27), np.uint8)
    assert np.array_equal(_rt_gray(img, levels=levels), img)


def test_lossless_rgb_rct_and_no_mct():
    img = RNG.randint(0, 256, (16, 19, 3), np.uint8)
    assert np.array_equal(_rt_rgb(img), img)  # MCT (RCT) default for RGB
    assert np.array_equal(_rt_rgb(img, mct=False), img)


@pytest.mark.parametrize(
    "kw",
    [
        dict(tile_size=(16, 16)),
        dict(tile_size=(16, 16), origin=(3, 5), tile_origin=(1, 2)),
        dict(origin=(7, 9)),  # odd grid origin: ceil/floor parity paths
        dict(cb_exp=(4, 4)),
        dict(precincts=[(7, 7)] * 4, levels=3),
        dict(sop=True, eph=True),
        dict(segsym=True),
        dict(prog=1),  # RLCP
        dict(prog=2),  # RPCL
        dict(prog=3),  # PCRL
        dict(prog=4),  # CPRL
        dict(prog=2, precincts=[(7, 7)] * 4, levels=3),
        dict(prog=3, precincts=[(6, 7), (7, 6), (7, 7), (8, 8)], levels=3),
        dict(prog=4, precincts=[(7, 7)] * 4, levels=3, origin=(3, 5)),
        dict(prog=2, tile_size=(16, 16), precincts=[(6, 6)] * 3, levels=2),
        dict(jp2=True),
    ],
)
def test_lossless_feature_matrix(kw):
    img = RNG.randint(0, 256, (29, 31), np.uint8)
    assert np.array_equal(_rt_gray(img, **kw), img)


@pytest.mark.parametrize(
    "kw",
    [
        dict(layers=2),
        dict(layers=5),  # > code-blocks per precinct: empty packets
        dict(layers=2, prog=1),
        dict(layers=3, prog=2, precincts=[(7, 7)] * 4, levels=3),
        dict(layers=2, prog=3),
        dict(layers=2, prog=4, tile_size=(16, 16)),
        dict(layers=3, reversible=False),
        dict(layers=2, precincts=[(7, 7)] * 4, levels=3),
        dict(layers=4, cb_exp=(4, 4), sop=True, eph=True),
    ],
)
def test_quality_layers(kw):
    # multi-layer streams: late first-inclusion (tag-tree thresholds),
    # continued-block contributions, zero-contribution bits, empty
    # packets — the decoder accumulates segments across layers
    img = RNG.randint(0, 256, (29, 31), np.uint8)
    if kw.get("reversible", True):
        assert np.array_equal(_rt_gray(img, **kw), img)
    else:
        out = _rt_gray(img, **kw)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_quality_layers_rgb_rct():
    img = RNG.randint(0, 256, (20, 24, 3), np.uint8)
    assert np.array_equal(_rt_rgb(img, layers=2), img)


@pytest.mark.parametrize("prog", [2, 3, 4])
def test_position_orders_rgb(prog):
    # multi-component streams interleave packets per position in the
    # RPCL/PCRL/CPRL walks — the part LRCP-only decoders get wrong
    img = RNG.randint(0, 256, (21, 18, 3), np.uint8)
    kw = dict(prog=prog, precincts=[(6, 6), (6, 6), (7, 7)], levels=2)
    assert np.array_equal(_rt_rgb(img, **kw), img)
    assert np.array_equal(_rt_rgb(img, prog=prog, tile_size=(12, 16)), img)


@pytest.mark.parametrize(
    "cbstyle",
    [0x01, 0x02, 0x04, 0x08, 0x10, 0x05, 0x0F, 0x3F],
    ids=lambda v: f"0x{v:02x}",
)
def test_codeblock_styles_lossless(cbstyle):
    # 0x01 selective bypass (raw SPP/MRP segments), 0x02 context reset,
    # 0x04 TERMALL, 0x08 vertically causal, 0x10 predictable
    # termination, plus combinations up to all-flags-on
    img = RNG.randint(0, 256, (29, 31), np.uint8)
    assert np.array_equal(_rt_gray(img, cbstyle=cbstyle, levels=3), img)


def test_codeblock_styles_exercise_raw_segments():
    # sanity: bypass streams really do contain multiple codeword
    # segments (raw SPP/MRP + MQ cleanups), not a degenerate single one
    from pdf_ray.fixtures.jpxenc import _encode_cblk

    img = RNG.randint(-2000, 2000, (24, 24)).astype(np.int64)
    segs, npasses = _encode_cblk(img, int(np.abs(img).max()).bit_length(), "LL", 0x01)
    assert len(segs) > 3 and npasses > 10
    segs_t, npasses_t = _encode_cblk(
        img, int(np.abs(img).max()).bit_length(), "LL", 0x04
    )
    assert len(segs_t) == npasses_t  # TERMALL: one segment per pass


@pytest.mark.parametrize("cbstyle", [0x01, 0x04, 0x09, 0x3F])
def test_codeblock_styles_layers_tiles_rgb(cbstyle):
    img = RNG.randint(0, 256, (21, 26, 3), np.uint8)
    assert np.array_equal(
        _rt_rgb(img, cbstyle=cbstyle, layers=3, levels=3), img
    )
    assert np.array_equal(
        _rt_rgb(img, cbstyle=cbstyle, tile_size=(12, 16), sop=True, eph=True),
        img,
    )


def test_codeblock_styles_irreversible():
    y, x = np.mgrid[0:24, 0:20]
    img = ((np.sin(x / 3.0) + np.cos(y / 4.0) + 2) * 60).astype(np.uint8)
    out = _rt_gray(img, cbstyle=0x01, reversible=False)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


@pytest.mark.parametrize(
    "kw",
    [
        dict(ppt=True),
        dict(ppm=True),
        dict(ppt=True, tile_size=(16, 16)),  # per-tile PPT streams
        dict(ppm=True, tile_size=(12, 16)),  # one Nppm group per tile-part
        dict(ppt=True, layers=3),
        dict(ppm=True, layers=2, sop=True, eph=True),  # EPH in hdr stream
        dict(ppt=True, cbstyle=0x01),  # packed headers + bypass segments
        dict(ppm=True, prog=2, precincts=[(7, 7)] * 3, levels=2),
    ],
)
def test_packed_packet_headers(kw):
    # PPM/PPT move packet headers out of the bitstream into marker
    # segments (the encoder splits them into <200-byte Z-ordered chunks,
    # so reassembly across segments is exercised); bodies stay inline
    img = RNG.randint(0, 256, (29, 31), np.uint8)
    assert np.array_equal(_rt_gray(img, **kw), img)


def test_packed_headers_rgb():
    img = RNG.randint(0, 256, (20, 24, 3), np.uint8)
    assert np.array_equal(_rt_rgb(img, ppt=True, layers=2), img)
    assert np.array_equal(_rt_rgb(img, ppm=True, tile_size=(12, 12)), img)


@pytest.mark.parametrize(
    "kw,poc",
    [
        # resolution split: res 0-1 LRCP then res 2-3 RLCP
        (dict(levels=3, layers=2),
         [(0, 0, 2, 2, 1, 0), (2, 0, 2, 4, 1, 1)]),
        # layer-incremental: 2nd entry re-covers layer 0 (dedupe path)
        (dict(levels=2, layers=3),
         [(0, 0, 1, 3, 1, 0), (0, 0, 3, 3, 1, 0)]),
        # position-based progression inside a POC entry, with precincts
        (dict(levels=2, layers=2, precincts=[(6, 6)] * 3),
         [(0, 0, 2, 1, 1, 0), (1, 0, 2, 3, 1, 2)]),
        # tiles: POC order applies per tile
        (dict(levels=2, layers=2, tile_size=(16, 16)),
         [(0, 0, 2, 1, 1, 1), (1, 0, 2, 3, 1, 0)]),
    ],
)
def test_poc_gray(kw, poc):
    # POC progression-order changes (A.6.6/B.12): the codestream is the
    # concatenation of the named progression segments; decoder must
    # follow the POC order, not the COD progression
    img = RNG.randint(0, 256, (29, 31), np.uint8)
    assert np.array_equal(_rt_gray(img, poc=poc, **kw), img)


def test_poc_rgb_component_split():
    # component ranges: luma-ish comp 0 first across all res, then
    # comps 1-2 — exercises CSpoc/CEpoc bounds with RCT
    img = RNG.randint(0, 256, (20, 24, 3), np.uint8)
    poc = [(0, 0, 2, 3, 1, 1), (0, 1, 2, 3, 3, 4)]
    assert np.array_equal(
        _rt_rgb(img, levels=2, layers=2, poc=poc), img
    )


def test_poc_in_tile_part_header():
    # A POC in a tile-part header overrides the main-header COD
    # progression for that tile. The encoder only writes main-header
    # POCs, so relocate the segment by byte surgery: strip it from the
    # main header and splice it after SOT, fixing Psot (A.4.2).
    import struct

    img = RNG.randint(0, 256, (21, 19), np.uint8)
    poc = [(0, 0, 2, 2, 1, 1), (2, 0, 2, 4, 1, 0)]
    cs = bytearray(encode_jpx(img, levels=3, layers=2, poc=poc))
    i = cs.find(b"\xff\x5f")
    assert i > 0
    seglen = struct.unpack(">H", cs[i + 2 : i + 4])[0]
    poc_seg = bytes(cs[i : i + 2 + seglen])
    del cs[i : i + 2 + seglen]
    sot = cs.find(b"\xff\x90")
    assert sot > 0
    psot = struct.unpack(">I", cs[sot + 6 : sot + 10])[0]
    cs[sot + 6 : sot + 10] = struct.pack(">I", psot + len(poc_seg))
    # tile-part header runs SOT(12 bytes incl. marker) ... SOD; insert
    # the POC right after the SOT segment
    cs[sot + 12 : sot + 12] = poc_seg
    w, h, n, s = decode_jpx(bytes(cs))
    out = np.frombuffer(s, np.uint8).reshape(h, w)
    assert np.array_equal(out, img)


def _upsampled(comp_full, a, b, xo, yo, xsiz, ysiz):
    """Reference model of subsample-then-replicate: the encoder keeps
    samples at grid multiples of (a, b); the decoder replicates each
    back over its reference-grid footprint (clamped at the edges)."""
    cx0, cx1 = -(-xo // a), -(-xsiz // a)
    cy0, cy1 = -(-yo // b), -(-ysiz // b)
    sub = comp_full[np.arange(cy0, cy1) * b - yo][
        :, np.arange(cx0, cx1) * a - xo
    ]
    xs = np.clip(np.arange(xo, xsiz) // a - cx0, 0, cx1 - cx0 - 1)
    ys = np.clip(np.arange(yo, ysiz) // b - cy0, 0, cy1 - cy0 - 1)
    return sub[ys][:, xs]


@pytest.mark.parametrize(
    "kw,sub",
    [
        (dict(), (2, 2)),
        (dict(levels=3), (2, 1)),
        (dict(origin=(3, 5)), (2, 3)),  # origin not a factor multiple
        (dict(tile_size=(16, 16)), (2, 2)),  # per-tile component rects
        (dict(layers=2, origin=(1, 0), tile_size=(12, 16)), (3, 2)),
    ],
)
def test_subsampled_gray(kw, sub):
    img = RNG.randint(0, 256, (29, 31), np.uint8)
    xo, yo = kw.get("origin", (0, 0))
    exp = _upsampled(
        img.astype(np.int64), sub[0], sub[1], xo, yo, xo + 31, yo + 29
    ).astype(np.uint8)
    out = _rt_gray(img, subsampling=[sub], **kw)
    assert np.array_equal(out, exp)


@pytest.mark.parametrize("prog", [0, 2, 3, 4])
def test_subsampled_chroma_420(prog):
    # classic 4:2:0: full-res luma, half-res chroma. Position-based
    # walks must step each component by XRsiz*2^(PPx+nb).
    img = RNG.randint(0, 256, (21, 26, 3), np.uint8)
    subs = [(1, 1), (2, 2), (2, 2)]
    kw = dict(mct=False, subsampling=subs, prog=prog, levels=2)
    if prog:
        kw["precincts"] = [(6, 6)] * 3
    out = _rt_rgb(img, **kw)
    exp = np.stack(
        [
            _upsampled(
                img[:, :, c].astype(np.int64), *subs[c], 0, 0, 26, 21
            )
            for c in range(3)
        ],
        axis=-1,
    ).astype(np.uint8)
    assert np.array_equal(out, exp)


def test_subsampled_tiles_rgb():
    img = RNG.randint(0, 256, (24, 20, 3), np.uint8)
    subs = [(1, 1), (2, 2), (2, 2)]
    out = _rt_rgb(
        img, mct=False, subsampling=subs, tile_size=(12, 12), layers=2
    )
    exp = np.stack(
        [
            _upsampled(
                img[:, :, c].astype(np.int64), *subs[c], 0, 0, 20, 24
            )
            for c in range(3)
        ],
        axis=-1,
    ).astype(np.uint8)
    assert np.array_equal(out, exp)


def test_subsampled_mct_mismatch_rejected():
    img = RNG.randint(0, 256, (12, 12, 3), np.uint8)
    subs = [(1, 1), (2, 2), (2, 2)]
    with pytest.raises(ValueError):
        encode_jpx(img, mct=True, subsampling=subs)
    # decoder side: flip the COD MCT byte on an encoded mct=False stream
    cs = bytearray(encode_jpx(img, mct=False, subsampling=subs))
    i = cs.find(b"\xff\x52")
    cs[i + 4 + 4] = 1  # marker(2) + len(2) + Scod,prog,L{2} -> SGcod MCT
    with pytest.raises(PdfParseError):
        decode_jpx(bytes(cs))


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(levels=3, layers=2),
        dict(tile_size=(16, 16)),
        dict(prog=2, precincts=[(6, 6)] * 3, levels=2),
    ],
)
def test_roi_maxshift_gray(kw):
    # maxshift ROI (RGN): encoder scales a deterministic coefficient
    # mask up by SPrgn; decoder separates ROI purely by magnitude and
    # scales back — reversible paths stay bit-exact
    img = RNG.randint(0, 256, (29, 31), np.uint8)
    assert np.array_equal(_rt_gray(img, roi=12, **kw), img)


def test_roi_maxshift_rgb_and_irreversible():
    img = RNG.randint(0, 256, (20, 24, 3), np.uint8)
    assert np.array_equal(_rt_rgb(img, roi=12), img)  # RCT path
    out = _rt_gray(img[:, :, 0], roi=14, reversible=False)
    assert np.abs(out.astype(int) - img[:, :, 0].astype(int)).max() <= 4


def test_roi_with_subsampling():
    img = RNG.randint(0, 256, (21, 26, 3), np.uint8)
    subs = [(1, 1), (2, 2), (2, 2)]
    out = _rt_rgb(img, mct=False, subsampling=subs, roi=12)
    exp = np.stack(
        [
            _upsampled(
                img[:, :, c].astype(np.int64), *subs[c], 0, 0, 26, 21
            )
            for c in range(3)
        ],
        axis=-1,
    ).astype(np.uint8)
    assert np.array_equal(out, exp)


def test_roi_in_tile_part_header():
    # relocate the (single-component) RGN from the main header into the
    # tile-part header — the override path — fixing Psot like the POC
    # relocation test
    import struct

    img = RNG.randint(0, 256, (17, 15), np.uint8)
    cs = bytearray(encode_jpx(img, roi=12))
    i = cs.find(b"\xff\x5e")
    seglen = struct.unpack(">H", cs[i + 2 : i + 4])[0]
    rgn_seg = bytes(cs[i : i + 2 + seglen])
    del cs[i : i + 2 + seglen]
    sot = cs.find(b"\xff\x90")
    psot = struct.unpack(">I", cs[sot + 6 : sot + 10])[0]
    cs[sot + 6 : sot + 10] = struct.pack(">I", psot + len(rgn_seg))
    cs[sot + 12 : sot + 12] = rgn_seg
    w, h, n, s = decode_jpx(bytes(cs))
    assert np.array_equal(
        np.frombuffer(s, np.uint8).reshape(h, w), img
    )


def test_roi_malformed_rejected():
    img = RNG.randint(0, 256, (8, 8), np.uint8)
    good = encode_jpx(img, roi=10)
    i = good.find(b"\xff\x5e")
    bad = bytearray(good)
    bad[i + 5] = 1  # Srgn != 0: reserved style
    with pytest.raises(PdfParseError):
        decode_jpx(bytes(bad))
    bad2 = bytearray(good)
    bad2[i + 6] = 60  # SPrgn absurdly large
    with pytest.raises(PdfParseError):
        decode_jpx(bytes(bad2))


def test_poc_malformed_rejected():
    img = RNG.randint(0, 256, (8, 8), np.uint8)
    good = encode_jpx(img, levels=1, layers=1, poc=[(0, 0, 1, 2, 1, 0)])
    i = good.find(b"\xff\x5f")
    # empty resolution range: REpoc <= RSpoc
    bad = bytearray(good)
    bad[i + 4] = 2  # RSpoc = 2 while REpoc stays 2
    with pytest.raises(PdfParseError):
        decode_jpx(bytes(bad))
    # out-of-range progression id
    bad2 = bytearray(good)
    bad2[i + 2 + 2 + 6] = 7  # Ppoc byte of the first (only) entry
    with pytest.raises(PdfParseError):
        decode_jpx(bytes(bad2))
    # truncated body (not a multiple of the entry size)
    bad3 = good[: i + 4] + good[i + 5 :]
    with pytest.raises(PdfParseError):
        decode_jpx(bytes(bad3))


@pytest.mark.parametrize("w,h", [(1, 1), (70, 1), (1, 70)])
def test_degenerate_geometry(w, h):
    img = RNG.randint(0, 256, (h, w), np.uint8)
    assert np.array_equal(_rt_gray(img), img)


def test_depth12_rescales_to_8bit():
    img12 = RNG.randint(0, 4096, (14, 18)).astype(np.int64)
    cs = encode_jpx(img12, depth=12)
    w, h, n, s = decode_jpx(cs)
    out = np.frombuffer(s, np.uint8).reshape(h, w)
    exp = np.rint(img12 * (255.0 / 4095)).astype(np.uint8)
    assert np.array_equal(out, exp)


def test_depth20_rescales_to_8bit():
    """>16-bit precision (round-4 verdict #7): the int64 sample path
    carries 17-38 bit exactly; 20-bit lossless content rescales to 8-bit
    by the same maxv formula as the other depths."""
    img20 = RNG.randint(0, 1 << 20, (14, 18)).astype(np.int64)
    cs = encode_jpx(img20, depth=20)
    w, h, n, s = decode_jpx(cs)
    out = np.frombuffer(s, np.uint8).reshape(h, w)
    exp = np.rint(img20 * (255.0 / ((1 << 20) - 1))).astype(np.uint8)
    assert np.array_equal(out, exp)


def test_depth29_lossless_codestream_exact():
    """Depth 29 is the encoder's reversible ceiling (HH eps = depth + 2
    must fit the 5-bit QCD exponent); decode_codestream must return the
    level-shifted samples BIT-EXACT at that depth."""
    img = RNG.randint(0, 1 << 29, (9, 11)).astype(np.int64)
    cs = encode_jpx(img, depth=29)
    w, h, planes, depths, signed = decode_codestream(cs)
    assert (w, h, depths[0], signed[0]) == (11, 9, 29, False)
    assert np.array_equal(planes[0] + (1 << 28), img)


def test_irreversible_97_error_bound():
    # Smooth-ish content: 9/7 with no quantization floor loss beyond the
    # lifting arithmetic should land within a few codes of the source.
    y, x = np.mgrid[0:24, 0:20]
    img = ((np.sin(x / 3.0) + np.cos(y / 4.0) + 2) * 60).astype(np.uint8)
    out = _rt_gray(img, reversible=False)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
    rgb = np.stack([img, img[::-1], img[:, ::-1]], axis=-1)
    outc = _rt_rgb(rgb, reversible=False)  # ICT path
    assert np.abs(outc.astype(int) - rgb.astype(int)).max() <= 4


def test_tiled_97():
    img = RNG.randint(0, 256, (24, 20, 3), np.uint8)
    out = _rt_rgb(img, reversible=False, tile_size=(12, 12))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_decode_codestream_reports_geometry():
    img = RNG.randint(0, 256, (10, 12), np.uint8)
    w, h, planes, depths, signed = decode_codestream(encode_jpx(img))
    assert (w, h, len(planes), depths[0], signed[0]) == (12, 10, 1, 8, False)


def test_image_layer_decodes_jpx():
    from pdf_ray.pdfcore.images import decode_image_pixels

    img = RNG.randint(0, 256, (8, 9), np.uint8)
    data = encode_jpx(img)
    # Dict geometry deliberately wrong: the codestream must win (§7.4.9)
    s = Stream(
        {
            "Filter": "JPXDecode",
            "Width": 1,
            "Height": 1,
            "Length": len(data),
        },
        data,
    )
    w, h, rgb = decode_image_pixels(s, lambda v: v)
    assert (w, h) == (9, 8)
    got = np.frombuffer(rgb, np.uint8).reshape(8, 9, 3)
    assert np.array_equal(got[:, :, 0], img)
    assert np.array_equal(got[:, :, 1], img)


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"\xff\x4f",
        b"\xff\x4f\xff\x51" + b"\x00" * 8,
        b"\x00\x00\x00\x0cjP  \r\n\x87\n",  # JP2 signature, no boxes
        b"not a codestream at all",
    ],
)
def test_malformed_raises_typed(data):
    with pytest.raises(PdfParseError):
        decode_jpx(data)


def test_oversize_siz_rejected_fast():
    # A corrupt SIZ claiming a huge canvas must fail the budget check
    # before allocating, not burn minutes (MAX_JPX_PIXELS guard).
    img = RNG.randint(0, 256, (8, 8), np.uint8)
    cs = bytearray(encode_jpx(img))
    siz = cs.find(b"\xff\x51")
    # Xsiz / Ysiz are at +6 and +10 after the marker+Lsiz+Rsiz
    cs[siz + 6 : siz + 10] = (1 << 30).to_bytes(4, "big")
    cs[siz + 10 : siz + 14] = (1 << 30).to_bytes(4, "big")
    with pytest.raises(PdfParseError):
        decode_jpx(bytes(cs))


@pytest.mark.parametrize("cbstyle", [0, 0x05])
def test_fuzz_truncation_and_bitflips_bounded(cbstyle):
    img = RNG.randint(0, 256, (16, 16), np.uint8)
    base = encode_jpx(img, levels=2, cbstyle=cbstyle)
    rng = np.random.RandomState(99)
    for cut in range(1, len(base), max(1, len(base) // 23)):
        try:
            decode_jpx(base[:cut])
        except PdfParseError:
            pass
    for _ in range(40):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randint(len(buf))] ^= 1 << rng.randint(8)
        try:
            decode_jpx(bytes(buf))
        except PdfParseError:
            pass
