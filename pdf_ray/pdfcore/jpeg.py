"""JPEG (DCT) decoder — pure numpy, no codec dependency.

The reference delegates DCTDecode to the ``jpeg-decoder`` crate
(/root/reference/src/filter/dct.rs:10-20) and consumes real pixels; this
module provides the same capability from scratch so DCT images get
pixel-content-addressed media_refs and flow through the image feature
stages.

Scope: sequential DCT (SOF0/SOF1) AND progressive DCT (SOF2 — spectral
selection + successive approximation, DC/AC first and refinement scans
per ITU-T T.81 G.1.2), 8-bit and 12-bit precision (12-bit samples scale
to 8-bit output), grayscale / 3-channel YCbCr / 4-channel CMYK-YCCK
(APP14 Adobe transform + inverted-ink convention, converted to RGB),
any integer chroma subsampling, interleaved and single-component scans,
restart markers, multiple DQT/DHT segments. Arithmetic coding raises
PdfParseError (row-level error downstream, same containment as other
unsupported filters).

Architecture: every scan decodes into per-component COEFFICIENT stores
(zigzag order); dequantization + the separable orthonormal 8x8 DCT-III
(two matmuls, vectorized over all blocks) happen once at EOI. Sequential
is simply the Ss=0..Se=63, Ah=Al=0 single pass of the same machinery.
The YCbCr->RGB transform is the JFIF one with round-half-up and
clamping. This decoder defines the oracle for our fixtures (the fixture
JPEGs are built so quantization round-trips exactly — see
fixtures/jpegenc.py; the progressive fixture is bit-exact against the
sequential decode of the same coefficients)."""

from __future__ import annotations

import struct

import numpy as np

from .objects import PdfParseError

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal DCT-II matrix: A[i,j] = c(i)/2 * cos((2j+1) i pi / 16)
_I = np.arange(8).reshape(8, 1)
_J = np.arange(8).reshape(1, 8)
_A = np.cos((2 * _J + 1) * _I * np.pi / 16) / 2.0
_A[0, :] *= 1.0 / np.sqrt(2.0)


def _idct2(coef: np.ndarray) -> np.ndarray:
    """8x8 inverse DCT (DCT-III): spatial = A.T @ coef @ A."""
    return _A.T @ coef @ _A


class _HuffTable:
    __slots__ = ("lookup",)

    def __init__(self, counts: list[int], symbols: bytes):
        # canonical codes: map (length, code) -> symbol
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


def _annex_k_tables() -> dict[tuple[int, int], "_HuffTable"]:
    """T.81 Annex K.3 'typical' huffman tables, used when a stream
    defines NO DHT before its first scan — the DHT-less MJPEG
    convention (frames imply the defaults to save per-frame bytes).
    Slots: (0,0)/(1,0) luminance DC/AC, (0,1)/(1,1) chrominance."""
    dc_lum = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              bytes(range(12)))
    dc_chr = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              bytes(range(12)))
    ac_lum = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]))
    ac_chr = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]))
    return {
        (0, 0): _HuffTable(*dc_lum), (1, 0): _HuffTable(*ac_lum),
        (0, 1): _HuffTable(*dc_chr), (1, 1): _HuffTable(*ac_chr),
    }


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing; stops at any real marker (leaves position on the 0xFF)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):  # truncated stream: pad with 1-bits (F.2.2.5)
            self.acc = (self.acc << 8) | 0xFF
            self.nbits += 8
            return
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker: pad with 1-bits per spec (F.2.2.5)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        length, code = 0, 0
        lookup = table.lookup
        for _ in range(16):
            code = (code << 1) | self.bit()
            length += 1
            sym = lookup.get((length, code))
            if sym is not None:
                return sym
        raise PdfParseError("bad JPEG huffman code")

    def align(self) -> None:
        self.nbits = 0


def _extend(v: int, t: int) -> int:
    """F.2.2.1 receive/extend: t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "coefs", "dc_pred",
                 "bw", "bh")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.td = self.ta = 0
        # (bh_total, bw_total, 64) int32 zigzag-order coefficient store,
        # padded to whole MCUs; filled across one (sequential) or many
        # (progressive) scans, IDCTed once at EOI
        self.coefs: np.ndarray | None = None
        self.dc_pred = 0
        self.bw = self.bh = 0  # this component's real data-unit grid


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a sequential or progressive JPEG. Returns ``(width, height,
    ncomp, pixels)`` with pixels gray8 (ncomp=1) or rgb8 (ncomp=3),
    row-major. Malformed streams raise PdfParseError (the row-level
    containment type), never bare Index/Key/ValueError."""
    try:
        return _decode_jpeg(data)
    except PdfParseError:
        raise
    except (IndexError, KeyError, ValueError, struct.error) as e:
        raise PdfParseError(
            f"malformed JPEG: {type(e).__name__}: {e}"
        ) from e


def _decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise PdfParseError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    comps: list[_Component] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    mcux = mcuy = 0
    precision = 8
    adobe_transform = None  # APP14: None = no Adobe marker

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise PdfParseError("bad JPEG marker sync")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    q = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    i += 64
                else:
                    q = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(
                        np.int32
                    )
                    i += 128
                qtables[tq] = q  # zigzag order
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            progressive = marker == 0xC2
            precision = seg[0]
            if precision not in (8, 12):
                raise PdfParseError(
                    f"unsupported JPEG precision {precision}"
                )
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc not in (1, 3, 4):
                raise PdfParseError(f"unsupported JPEG component count {nc}")
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 15, seg[8 + 3 * c]))
            # frame-level geometry; every scan fills these stores
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c.coefs = np.zeros((mcuy * c.v, mcux * c.h, 64), np.int32)
                # the component's REAL data-unit grid (T.81 A.1.1), used
                # by single-component scans which are not MCU-padded
                c.bw = (-(-w * c.h // hmax) + 7) // 8
                c.bh = (-(-h * c.v // vmax) + 7) // 8
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise PdfParseError(
                f"unsupported JPEG SOF marker 0xFF{marker:02X} "
                "(arithmetic/lossless/hierarchical)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                symbols = seg[i + 17 : i + 17 + n]
                htables[(tc, th)] = _HuffTable(counts, symbols)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            adobe_transform = seg[11] if len(seg) > 11 else 0
        elif marker == 0xDA:  # SOS
            if not htables:
                # DHT-less stream (MJPEG convention): Annex K defaults
                htables.update(_annex_k_tables())
            ns = seg[0]
            by_id = {c.cid: c for c in comps}
            scan: list[_Component] = []
            for c in range(ns):
                comp = by_id[seg[1 + 2 * c]]
                tda = seg[2 + 2 * c]
                comp.td, comp.ta = tda >> 4, tda & 15
                scan.append(comp)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            pos += seglen
            pos = _decode_scan(
                data, pos, mcux, mcuy, scan, len(comps), htables,
                restart_interval, ss, se, ah, al,
            )
            continue
        # APPn / COM / others: skip
        pos += seglen

    if not comps or w == 0:
        raise PdfParseError("JPEG missing SOF")
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        if c.coefs is None:
            raise PdfParseError("JPEG scan missing component")
        q = qtables.get(c.tq)
        if q is None:
            raise PdfParseError("JPEG missing quant table")
        plane = _idct_plane(c.coefs, q, precision)
        p = plane[: (h * c.v + vmax - 1) // vmax,
                  : (w * c.h + hmax - 1) // hmax]
        # upsample to full resolution by replication
        if c.v != vmax:
            p = np.repeat(p, vmax // c.v, axis=0)
        if c.h != hmax:
            p = np.repeat(p, hmax // c.h, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return w, h, 1, planes[0].astype(np.uint8).tobytes()
    if len(planes) == 4:
        return w, h, 3, _cmyk_to_rgb(planes, adobe_transform)
    if adobe_transform == 0:
        # APP14 transform 0 on a 3-component frame: the samples ARE RGB
        # (Adobe writers; no YCbCr inverse to apply)
        rgb = np.stack([p.astype(np.uint8) for p in planes], axis=-1)
        return w, h, 3, rgb.tobytes()
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


def _ycc_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return (np.clip(np.floor(c + 0.5), 0, 255) for c in (r, g, b))


def _cmyk_to_rgb(planes, adobe_transform) -> bytes:
    """4-component JPEG -> RGB. APP14 transform 2 = YCCK (YCbCr-coded
    CMY); Adobe writers store INVERTED ink values (0 = full ink), the
    libjpeg-compatible convention, so ink = 255 - sample when the Adobe
    marker is present. Final conversion is the naive additive one
    (R = 255 - min(255, C + K)) — the same un-color-managed composite
    the rest of the image stage uses for DeviceCMYK."""
    a, b_, c_, d = (p.astype(np.float64) for p in planes)
    if adobe_transform == 2:  # YCCK: YCbCr -> R'G'B' holding CMY
        a, b_, c_ = _ycc_to_rgb(a, b_, c_)
    if adobe_transform is not None:
        # stored inverted: sample 255 means zero ink
        cyan, mag, yel, k = 255.0 - a, 255.0 - b_, 255.0 - c_, 255.0 - d
    else:
        cyan, mag, yel, k = a, b_, c_, d
    r = 255.0 - np.minimum(255.0, cyan + k)
    g = 255.0 - np.minimum(255.0, mag + k)
    b = 255.0 - np.minimum(255.0, yel + k)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8).tobytes()


def _idct_plane(
    coefs: np.ndarray, q: np.ndarray, precision: int = 8
) -> np.ndarray:
    """Dequantize + IDCT every 8x8 block of a component at once:
    (bh, bw, 64) zigzag int32 -> (bh*8, bw*8) uint8 plane. The matmuls
    broadcast over the block grid — no per-block Python. 12-bit samples
    (level shift 2048, range 0..4095) scale to 8-bit output (>> 4)."""
    bh, bw = coefs.shape[:2]
    deq = (coefs * q[None, None, :]).astype(np.float64)
    spat = np.zeros((bh, bw, 64), np.float64)
    spat[..., ZIGZAG] = deq
    center = float(1 << (precision - 1))
    maxval = float((1 << precision) - 1)
    blocks = _A.T @ spat.reshape(bh, bw, 8, 8) @ _A
    blocks = np.clip(np.floor(blocks + center + 0.5), 0, maxval)
    plane = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    if precision == 12:
        plane = np.floor(plane / 16.0)
    return plane.astype(np.uint8)


def _decode_scan(
    data: bytes,
    pos: int,
    mcux: int,
    mcuy: int,
    scan: list[_Component],
    n_frame_comps: int,
    htables: dict[tuple[int, int], _HuffTable],
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """Decode one entropy-coded scan into the components' coefficient
    stores. Sequential = (ss=0, se=63, ah=al=0). Progressive scans are
    one of four modes per T.81 G.1.2: DC first / DC refine (ss=0), AC
    first / AC refine (ss>0, single component)."""
    r = _BitReader(data, pos)
    for c in scan:
        c.dc_pred = 0
    eobrun = 0

    def check_restart(unit_count: int) -> int:
        nonlocal eobrun
        if (
            restart_interval
            and unit_count
            and unit_count % restart_interval == 0
        ):
            r.align()
            if r.pos + 1 < len(r.data) and r.data[r.pos] == 0xFF and (
                0xD0 <= r.data[r.pos + 1] <= 0xD7
            ):
                r.pos += 2
            for c_ in scan:
                c_.dc_pred = 0
            eobrun = 0
        return unit_count + 1

    def decode_dc(c: _Component, zz: list) -> None:
        dc_t = htables.get((0, c.td))
        if dc_t is None:
            raise PdfParseError("JPEG missing DC huffman table")
        t = r.decode(dc_t)
        c.dc_pred += _extend(r.bits(t), t)
        zz[0] = c.dc_pred << al

    def decode_ac_first(c: _Component, zz: list) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        ac_t = htables.get((1, c.ta))
        if ac_t is None:
            raise PdfParseError("JPEG missing AC huffman table")
        k = ss or 1  # ss=0 only in the sequential DC+AC composite pass
        while k <= se:
            rs = r.decode(ac_t)
            rr, s = rs >> 4, rs & 15
            if s == 0:
                if rr == 15:
                    k += 16
                    continue
                eobrun = (1 << rr) - 1
                if rr:
                    eobrun += r.bits(rr)
                break
            k += rr
            if k > se:
                raise PdfParseError("JPEG AC index overflow")
            zz[k] = _extend(r.bits(s), s) << al
            k += 1

    def decode_ac_refine(c: _Component, zz: list) -> None:
        # T.81 G.1.2.3: correction bits for already-nonzero coefficients
        # interleave with newly-significant +-1 coefficients
        nonlocal eobrun
        ac_t = htables.get((1, c.ta))
        if ac_t is None:
            raise PdfParseError("JPEG missing AC huffman table")
        p1, m1 = 1 << al, -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = r.decode(ac_t)
                rr, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if rr != 15:
                        # refine EOBRUN counts blocks INCLUDING this one:
                        # the tail loop below must still read this
                        # block's remaining correction bits (even EOB0)
                        eobrun = 1 << rr
                        if rr:
                            eobrun += r.bits(rr)
                        break
                    # ZRL: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise PdfParseError("bad JPEG refinement symbol")
                    newval = p1 if r.bit() else m1
                while k <= se:
                    if zz[k] != 0:
                        if r.bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] > 0 else m1
                    else:
                        if rr == 0:
                            if newval:
                                zz[k] = newval
                            k += 1
                            break
                        rr -= 1
                    k += 1
        if eobrun > 0:
            # finish the band applying only correction bits
            while k <= se:
                if zz[k] != 0:
                    if r.bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                k += 1
            eobrun -= 1

    unit = 0
    if len(scan) > 1:
        # MCU-interleaved: iterate the frame MCU grid
        for my in range(mcuy):
            for mx in range(mcux):
                unit = check_restart(unit)
                for c in scan:
                    for by in range(c.v):
                        for bx in range(c.h):
                            zz = c.coefs[my * c.v + by, mx * c.h + bx]
                            if ss == 0:
                                if ah == 0:
                                    # plain-list block: per-element numpy
                                    # scalar access dominates otherwise
                                    zzl = zz.tolist()
                                    decode_dc(c, zzl)
                                    if se > 0:  # sequential full block
                                        decode_ac_first(c, zzl)
                                    zz[:] = zzl
                                else:
                                    if r.bit():
                                        zz[0] |= 1 << al
                            else:
                                raise PdfParseError(
                                    "progressive AC scan must be "
                                    "single-component"
                                )
    else:
        # single-component scan (T.81 A.2.2): non-interleaved, iterates
        # the component's OWN bw x bh data-unit grid (not MCU-padded)
        c = scan[0]
        for by in range(c.bh):
            for bx in range(c.bw):
                unit = check_restart(unit)
                zz = c.coefs[by, bx]
                if ss == 0:
                    if ah == 0:
                        zzl = zz.tolist()
                        decode_dc(c, zzl)
                        if se > 0:
                            decode_ac_first(c, zzl)
                        zz[:] = zzl
                    else:
                        if r.bit():
                            zz[0] |= 1 << al
                else:
                    zzl = zz.tolist()
                    if ah == 0:
                        decode_ac_first(c, zzl)
                    else:
                        decode_ac_refine(c, zzl)
                    zz[:] = zzl
    # leave pos after the entropy data (on the next marker if any)
    r.align()
    return r.pos
