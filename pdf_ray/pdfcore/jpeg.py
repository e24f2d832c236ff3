"""Baseline JPEG (DCT) decoder — pure numpy, no codec dependency.

The reference delegates DCTDecode to the ``jpeg-decoder`` crate
(/root/reference/src/filter/dct.rs:10-20) and consumes real pixels; this
module provides the same capability from scratch so DCT images get
pixel-content-addressed media_refs and flow through the image feature
stages.

Scope: baseline sequential DCT (SOF0/SOF1), 8-bit, grayscale or 3-channel
YCbCr (any integer chroma subsampling), restart markers, multiple
DQT/DHT segments. Progressive (SOF2), arithmetic coding, 12-bit and
4-channel CMYK raise PdfParseError (row-level error downstream, same
containment as other unsupported filters).

IDCT is the separable orthonormal 8x8 DCT-III via two matmuls; the
YCbCr->RGB transform is the JFIF one with round-half-up and clamping.
This decoder defines the oracle for our fixtures (the fixture JPEGs are
built so quantization round-trips exactly — see fixtures/jpegenc.py).
"""

from __future__ import annotations

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
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "plane", "dc_pred")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.td = self.ta = 0
        self.plane: np.ndarray | None = None
        self.dc_pred = 0


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG. Returns ``(width, height, ncomp, pixels)``
    with pixels gray8 (ncomp=1) or rgb8 (ncomp=3), row-major."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise PdfParseError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    comps: list[_Component] = []
    w = h = 0
    restart_interval = 0

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
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext sequential
            if seg[0] != 8:
                raise PdfParseError("only 8-bit JPEG supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc not in (1, 3):
                raise PdfParseError(f"unsupported JPEG component count {nc}")
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 15, seg[8 + 3 * c]))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise PdfParseError(
                f"unsupported JPEG SOF marker 0xFF{marker:02X} "
                "(progressive/arithmetic/lossless)"
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
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            by_id = {c.cid: c for c in comps}
            scan: list[_Component] = []
            for c in range(ns):
                comp = by_id[seg[1 + 2 * c]]
                tda = seg[2 + 2 * c]
                comp.td, comp.ta = tda >> 4, tda & 15
                scan.append(comp)
            pos += seglen
            pos = _decode_scan(
                data, pos, w, h, scan, qtables, htables, restart_interval
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
        if c.plane is None:
            raise PdfParseError("JPEG scan missing component")
        p = c.plane[: (h * c.v + vmax - 1) // vmax, : (w * c.h + hmax - 1) // hmax]
        # upsample to full resolution by replication
        if c.v != vmax:
            p = np.repeat(p, vmax // c.v, axis=0)
        if c.h != hmax:
            p = np.repeat(p, hmax // c.h, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return w, h, 1, planes[0].astype(np.uint8).tobytes()
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    rgb = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()


def _decode_scan(
    data: bytes,
    pos: int,
    w: int,
    h: int,
    scan: list[_Component],
    qtables: dict[int, np.ndarray],
    htables: dict[tuple[int, int], _HuffTable],
    restart_interval: int,
) -> int:
    hmax = max(c.h for c in scan)
    vmax = max(c.v for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in scan:
        c.plane = np.zeros((mcuy * 8 * c.v, mcux * 8 * c.h), dtype=np.uint8)
        c.dc_pred = 0

    r = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align()
                if r.data[r.pos] == 0xFF and 0xD0 <= r.data[r.pos + 1] <= 0xD7:
                    r.pos += 2
                for c in scan:
                    c.dc_pred = 0
            for c in scan:
                dc_t = htables.get((0, c.td))
                ac_t = htables.get((1, c.ta))
                q = qtables.get(c.tq)
                if dc_t is None or ac_t is None or q is None:
                    raise PdfParseError("JPEG missing huffman/quant table")
                for by in range(c.v):
                    for bx in range(c.h):
                        zz = np.zeros(64, dtype=np.int32)
                        t = r.decode(dc_t)
                        diff = _extend(r.bits(t), t)
                        c.dc_pred += diff
                        zz[0] = c.dc_pred
                        k = 1
                        while k < 64:
                            rs = r.decode(ac_t)
                            rr, s = rs >> 4, rs & 15
                            if s == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise PdfParseError("JPEG AC index overflow")
                            zz[k] = _extend(r.bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = (zz * q).astype(np.float64)
                        block = _idct2(coef.reshape(8, 8)) + 128.0
                        block = np.clip(np.floor(block + 0.5), 0, 255)
                        y0 = (my * c.v + by) * 8
                        x0 = (mx * c.h + bx) * 8
                        c.plane[y0 : y0 + 8, x0 : x0 + 8] = block.astype(
                            np.uint8
                        )
            mcu_count += 1
    # leave pos after the entropy data (on the next marker if any)
    r.align()
    return r.pos
