"""Minimal deterministic baseline JPEG encoder (fixture-side only).

Produces spec-conformant baseline sequential JPEGs (SOF0, 4:4:4, one
quant table, the Annex-K luminance huffman tables for every component) so
fixtures can exercise the DCTDecode pixel path without any codec
dependency. With a flat quant table whose value divides the block's DCT
coefficients exactly (e.g. uniform 8x8 blocks and q=16), decode is an
EXACT round-trip, which is what makes hand-written pixel goldens possible
(see tests and fixtures/corpus.py f24).
"""

from __future__ import annotations

import numpy as np

from ..pdfcore.jpeg import ZIGZAG, _A

# Annex K.3.1 luminance DC: categories 0..11
DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_SYMBOLS = bytes(range(12))

# Annex K.3.2 luminance AC (162 symbols)
AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_SYMBOLS = bytes(
    [
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
    ]
)


def _codes(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _codes(DC_COUNTS, DC_SYMBOLS)
_AC_CODES = _codes(AC_COUNTS, AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(bw: _BitWriter, zz: np.ndarray, dc_pred: int) -> int:
    dc = int(zz[0])
    diff = dc - dc_pred
    t = _category(diff)
    code, length = _DC_CODES[t]
    bw.write(code, length)
    if t:
        bw.write(_mag_bits(diff, t), t)
    run = 0
    last_nonzero = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nonzero = k
            break
    for k in range(1, last_nonzero + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_CODES[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = _AC_CODES[(run << 4) | s]
        bw.write(code, length)
        bw.write(_mag_bits(v, s), s)
        run = 0
    if last_nonzero < 63:
        code, length = _AC_CODES[0x00]  # EOB
        bw.write(code, length)
    return dc


def _pad(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pp = np.empty((ph, pw), dtype=np.float64)
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1 : h, :]
    pp[:, w:] = pp[:, w - 1 : w]
    return pp


def encode_jpeg(
    img: np.ndarray, qtable=16, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode gray (h,w) or RGB (h,w,3) uint8 to baseline JPEG.
    ``qtable``: int (flat table) or 64-entry natural-order array.
    ``subsample``: 4:2:0 chroma (2x2 box average) instead of 4:4:4.
    ``restart_interval``: emit DRI + RSTn markers every N MCUs."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if np.isscalar(qtable):
        q = np.full(64, int(qtable), dtype=np.int32)
    else:
        q = np.asarray(qtable, dtype=np.int32).reshape(64)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(np.floor(p + 0.5), 0, 255) for p in (y, cb, cr)]
        if subsample:
            samp = [(2, 2), (1, 1), (1, 1)]
            ph2 = (h + 1) // 2 * 2
            pw2 = (w + 1) // 2 * 2
            for i in (1, 2):
                p = _pad(planes[i], ph2, pw2)
                planes[i] = np.floor(
                    (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
                     + p[1::2, 1::2]) / 4.0 + 0.5
                )
        else:
            samp = [(1, 1)] * 3

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        padded.append(_pad(p, mcuy * 8 * sv, mcux * 8 * sh))

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (zigzag order, pq=0, tq=0)
    zzq = q[ZIGZAG]
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + bytes([0])
    out += bytes(int(v) for v in zzq)
    # SOF0
    nc = len(planes)
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([nc])
    for cid in range(1, nc + 1):
        sh, sv = samp[cid - 1]
        sof += bytes([cid, (sh << 4) | sv, 0])  # qtable 0
    out += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    # DHT: DC table 0 + AC table 0
    dht = bytearray([0x00]) + bytes(DC_COUNTS) + DC_SYMBOLS
    dht += bytes([0x10]) + bytes(AC_COUNTS) + AC_SYMBOLS
    out += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
    if restart_interval:
        out += b"\xff\xdd" + (4).to_bytes(2, "big")
        out += restart_interval.to_bytes(2, "big")
    # SOS
    sos = bytearray([nc])
    for cid in range(1, nc + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    bw = _BitWriter()
    dc_pred = [0] * len(padded)
    qf = q.astype(np.float64)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                dc_pred = [0] * len(padded)
            for ci, p in enumerate(padded):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = (_A @ block @ _A.T).reshape(64)
                        zz_nat = np.floor(coef / qf + 0.5).astype(np.int32)
                        zz = zz_nat[ZIGZAG]
                        dc_pred[ci] = _encode_block(bw, zz, dc_pred[ci])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- progressive (SOF2) encoder ---------------------------------------------

# Flat AC huffman table for progressive scans: 255 symbols at length 9 +
# symbol 0xFF at length 10 (kraft 255/512 + 1/1024 < 1; no all-ones
# code). The Annex-K AC table lacks the EOBn symbols (0x10..0xE0) that
# multi-block EOB runs need; a flat table keeps the encoder trivial while
# producing a fully spec-conformant bitstream.
AC_FLAT_COUNTS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
AC_FLAT_SYMBOLS = bytes(range(256))
_AC_FLAT_CODES = _codes(AC_FLAT_COUNTS, AC_FLAT_SYMBOLS)


def _pt_ac(v: int, al: int) -> int:
    """AC point transform (T.81 G.1.2.1): sign-preserving magnitude
    shift — divide toward zero by 2^al."""
    return -((-v) >> al) if v < 0 else v >> al


class _ProgressiveEncoder:
    """Encodes one component-band scan at a time over precomputed zigzag
    coefficient blocks; mirrors libjpeg's jcphuff strategy (EOB-run
    accumulation, buffered correction bits)."""

    def __init__(self, bw: _BitWriter):
        self.bw = bw
        self.eobrun = 0
        self.bebuf: list[int] = []

    def _emit_ac(self, sym: int) -> None:
        code, length = _AC_FLAT_CODES[sym]
        self.bw.write(code, length)

    def flush_eob(self) -> None:
        if self.eobrun:
            nb = self.eobrun.bit_length() - 1
            self._emit_ac(nb << 4)
            if nb:
                self.bw.write(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
            for b in self.bebuf:
                self.bw.write(b, 1)
            self.bebuf = []

    def ac_first_block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        r = 0
        for k in range(ss, se + 1):
            t = _pt_ac(int(zz[k]), al)
            if t == 0:
                r += 1
                continue
            while r > 15:
                self.flush_eob()
                self._emit_ac(0xF0)  # ZRL
                r -= 16
            self.flush_eob()
            s = _category(t)
            self._emit_ac((r << 4) | s)
            self.bw.write(_mag_bits(t, s), s)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eob()

    def ac_refine_block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        # libjpeg jcphuff strategy: ZRLs are emitted when ANY nonzero
        # coefficient is reached with r > 15 (not only newly-significant
        # ones — a correction bit must ride with the ZRL window it falls
        # in), but never past the last newly-significant index (eob_k),
        # where trailing runs fold into the EOB run instead.
        eob_k = ss - 1
        for k in range(ss, se + 1):
            if abs(int(zz[k])) >> al == 1:
                eob_k = k
        r = 0
        brbuf: list[int] = []
        for k in range(ss, se + 1):
            t = abs(int(zz[k])) >> al
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob_k:
                self.flush_eob()
                self._emit_ac(0xF0)
                r -= 16
                for b in brbuf:
                    self.bw.write(b, 1)
                brbuf = []
            if t > 1:
                brbuf.append(t & 1)  # correction bit, rides along
                continue
            # newly significant (+-1 at this precision)
            self.flush_eob()
            self._emit_ac((r << 4) | 1)
            self.bw.write(1 if zz[k] > 0 else 0, 1)
            for b in brbuf:
                self.bw.write(b, 1)
            brbuf = []
            r = 0
        if r > 0 or brbuf:
            self.eobrun += 1
            self.bebuf.extend(brbuf)
            if self.eobrun == 0x7FFF:
                self.flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray, qtable=16, al: int = 1, split_k: int = 6
) -> bytes:
    """Encode gray (h,w) or RGB (h,w,3) uint8 as a PROGRESSIVE (SOF2)
    JPEG, 4:4:4, exercising all four scan modes of T.81 G.1.2:

      1. DC first     (interleaved, Al=al)
      2. AC first     k in [1, split_k-1], Al=al   (per component)
      3. AC first     k in [split_k, 63], Al=al    (per component)
      4. DC refine    (interleaved, Ah=al .. Al=al-1 ... down to 0)
      5. AC refine    both bands, per level, per component

    Coefficients are identical to ``encode_jpeg``'s for the same image
    and qtable, so the decoded pixels must match the sequential decode
    bit-for-bit — that equality is the fixture oracle."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if np.isscalar(qtable):
        q = np.full(64, int(qtable), dtype=np.int32)
    else:
        q = np.asarray(qtable, dtype=np.int32).reshape(64)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        r_ = img[:, :, 0].astype(np.float64)
        g_ = img[:, :, 1].astype(np.float64)
        b_ = img[:, :, 2].astype(np.float64)
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = -0.168736 * r_ - 0.331264 * g_ + 0.5 * b_ + 128.0
        cr = 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_ + 128.0
        planes = [np.clip(np.floor(p + 0.5), 0, 255) for p in (y, cb, cr)]
    nc = len(planes)
    mcux = (w + 7) // 8
    mcuy = (h + 7) // 8
    qf = q.astype(np.float64)

    # precompute all zigzag coefficient blocks: coefs[ci][my][mx] -> (64,)
    coefs: list[np.ndarray] = []
    for p in planes:
        pp = _pad(p, mcuy * 8, mcux * 8)
        cc = np.empty((mcuy, mcux, 64), np.int32)
        for my in range(mcuy):
            for mx in range(mcux):
                block = pp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0
                coef = (_A @ block @ _A.T).reshape(64)
                cc[my, mx] = np.floor(coef / qf + 0.5).astype(np.int32)[ZIGZAG]
        coefs.append(cc)

    out = bytearray(b"\xff\xd8")
    zzq = q[ZIGZAG]
    out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + bytes([0])
    out += bytes(int(v) for v in zzq)
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([nc])
    for cid in range(1, nc + 1):
        sof += bytes([cid, 0x11, 0])
    out += b"\xff\xc2" + (2 + len(sof)).to_bytes(2, "big") + sof  # SOF2
    dht = bytearray([0x00]) + bytes(DC_COUNTS) + DC_SYMBOLS
    dht += bytes([0x10]) + bytes(AC_FLAT_COUNTS) + AC_FLAT_SYMBOLS
    out += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al_: int):
        sos = bytearray([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([ss, se, (ah << 4) | al_])
        return b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + bytes(sos)

    # scan 1: DC first, interleaved, point transform al
    out += sos_header(list(range(1, nc + 1)), 0, 0, 0, al)
    bw = _BitWriter()
    dc_pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                dc = int(coefs[ci][my, mx, 0]) >> al  # arithmetic shift
                diff = dc - dc_pred[ci]
                dc_pred[ci] = dc
                t = _category(diff)
                code, length = _DC_CODES[t]
                bw.write(code, length)
                if t:
                    bw.write(_mag_bits(diff, t), t)
    bw.flush()
    out += bw.out

    # scans 2-3: AC first per component, two spectral bands
    for ss, se in ((1, split_k - 1), (split_k, 63)):
        for ci in range(nc):
            out += sos_header([ci + 1], ss, se, 0, al)
            bw = _BitWriter()
            enc = _ProgressiveEncoder(bw)
            for my in range(mcuy):
                for mx in range(mcux):
                    enc.ac_first_block(coefs[ci][my, mx], ss, se, al)
            enc.flush_eob()
            bw.flush()
            out += bw.out

    # successive-approximation refinement down to full precision
    for lvl in range(al, 0, -1):
        ah, al_ = lvl, lvl - 1
        # DC refine (interleaved, raw bits)
        out += sos_header(list(range(1, nc + 1)), 0, 0, ah, al_)
        bw = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    bw.write((int(coefs[ci][my, mx, 0]) >> al_) & 1, 1)
        bw.flush()
        out += bw.out
        # AC refine per band per component
        for ss, se in ((1, split_k - 1), (split_k, 63)):
            for ci in range(nc):
                out += sos_header([ci + 1], ss, se, ah, al_)
                bw = _BitWriter()
                enc = _ProgressiveEncoder(bw)
                for my in range(mcuy):
                    for mx in range(mcux):
                        enc.ac_refine_block(coefs[ci][my, mx], ss, se, al_)
                enc.flush_eob()
                bw.flush()
                out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_components(
    planes: list[np.ndarray],
    qtable=16,
    precision: int = 8,
    adobe_transform: int | None = None,
) -> bytes:
    """Encode raw STORED component planes (no color transform applied —
    the caller supplies exactly the sample values the file should carry),
    4:4:4, sequential. Supports 1/3/4 components, 8- or 12-bit precision,
    and an optional APP14 Adobe marker carrying ``adobe_transform`` —
    the knobs the CMYK / 12-bit decoder tests need."""
    h, w = planes[0].shape
    nc = len(planes)
    if np.isscalar(qtable):
        q = np.full(64, int(qtable), dtype=np.int32)
    else:
        q = np.asarray(qtable, dtype=np.int32).reshape(64)
    center = float(1 << (precision - 1))

    out = bytearray(b"\xff\xd8")
    if adobe_transform is not None:
        app14 = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, adobe_transform])
        out += b"\xff\xee" + (2 + len(app14)).to_bytes(2, "big") + app14
    zzq = q[ZIGZAG]
    if precision == 12:  # 12-bit needs pq=1 (16-bit) DQT entries
        out += b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big") + bytes([0x10])
        for v in zzq:
            out += int(v).to_bytes(2, "big")
    else:
        out += b"\xff\xdb" + (2 + 1 + 64).to_bytes(2, "big") + bytes([0])
        out += bytes(int(v) for v in zzq)
    sof = bytearray([precision]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([nc])
    for cid in range(1, nc + 1):
        sof += bytes([cid, 0x11, 0])
    out += b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
    dht = bytearray([0x00]) + bytes(DC_COUNTS) + DC_SYMBOLS
    dht += bytes([0x10]) + bytes(AC_COUNTS) + AC_SYMBOLS
    out += b"\xff\xc4" + (2 + len(dht)).to_bytes(2, "big") + dht
    sos = bytearray([nc])
    for cid in range(1, nc + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos

    mcux = (w + 7) // 8
    mcuy = (h + 7) // 8
    padded = [_pad(p.astype(np.float64), mcuy * 8, mcux * 8) for p in planes]
    qf = q.astype(np.float64)
    bw = _BitWriter()
    dc_pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, p in enumerate(padded):
                block = p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - center
                coef = (_A @ block @ _A.T).reshape(64)
                zz = np.floor(coef / qf + 0.5).astype(np.int32)[ZIGZAG]
                dc_pred[ci] = _encode_block(bw, zz, dc_pred[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
