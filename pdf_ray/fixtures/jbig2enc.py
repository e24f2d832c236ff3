"""Minimal deterministic JBIG2 encoder (fixture-side only).

Produces spec-conformant PDF-embedded JBIG2 streams — page-information
segment + immediate generic region segments — with either MQ arithmetic
coding (T.88 Annex E encoder, templates 0-3, optional TPGDON) or MMR=1
(T.6/G4 via ccittenc). Exists so fixtures and tests can exercise the
decode path (pdfcore/jbig2.py) with pixel-exact goldens: JBIG2 generic
coding is lossless, so the decoded bitmap must equal the encoder's input
bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from ..pdfcore.jbig2 import GB_AT_NOMINAL, GB_TEMPLATES, QE, TPGD_CTX


class MQEncoder:
    """T.88 Annex E.2 arithmetic encoder (software conventions)."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        # dummy first byte per E.2.8 (BP starts at BPST-1); stripped in
        # finish() — carries into it are absorbed there
        self.out = bytearray([0])

    def _byteout(self) -> None:
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.out[-1] += 1
            if self.out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = self.c << 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, d: int, cx: int, idx: np.ndarray, mps: np.ndarray):
        qe, nmps, nlps, switch = QE[idx[cx]]
        if d == mps[cx]:  # CODEMPS (E.6)
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            idx[cx] = nmps
            self._renorm()
        else:  # CODELPS (E.7)
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                mps[cx] = 1 - mps[cx]
            idx[cx] = nlps
            self._renorm()

    def finish(self) -> bytes:
        # FLUSH (E.11): SETBITS picks the code value with the most
        # trailing 1-bits still inside the final interval [C, C+A)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        out = self.out[1:]  # strip the dummy byte
        while out and out[-1] == 0xFF:  # T.88 E.2.9: trailing FFs optional
            out = out[:-1]
        return bytes(out)


def encode_generic_region_data(
    bitmap: np.ndarray,
    template: int = 0,
    at: list[tuple[int, int]] | None = None,
    tpgdon: bool = False,
) -> bytes:
    """MQ-coded generic-region bit data (no segment headers) — the exact
    inverse of pdfcore.jbig2.decode_generic_region."""
    h, w = bitmap.shape
    if at is None:
        at = GB_AT_NOMINAL[template]
    tmpl = sorted(GB_TEMPLATES[template] + list(at), key=lambda p: (p[1], p[0]))
    nbits = len(tmpl)
    idx = np.zeros(1 << nbits, np.uint8)
    mps = np.zeros(1 << nbits, np.uint8)
    enc = MQEncoder()
    ltp = 0
    for y in range(h):
        if tpgdon:
            typical = (y > 0 and bool((bitmap[y] == bitmap[y - 1]).all())) or (
                y == 0 and not bitmap[y].any()
            )
            enc.encode(1 if typical != bool(ltp) else 0, TPGD_CTX[template],
                       idx, mps)
            ltp = 1 if typical else 0
            if ltp:
                continue
        for x in range(w):
            ctx = 0
            for dx, dy in tmpl:
                xx, yy = x + dx, y + dy
                if 0 <= xx < w and yy >= 0:
                    ctx = (ctx << 1) | int(bitmap[yy, xx])
                else:
                    ctx <<= 1
            enc.encode(int(bitmap[y, x]), ctx, idx, mps)
    return enc.finish()


def _segment(num: int, seg_type: int, payload: bytes, page: int = 1) -> bytes:
    head = num.to_bytes(4, "big")
    head += bytes([seg_type & 0x3F])  # page-assoc 1 byte, no deferred
    head += bytes([0])  # 0 referred-to segments
    head += bytes([page])
    head += len(payload).to_bytes(4, "big")
    return head + payload


def _page_info(w: int, h: int, default_pixel: int = 0) -> bytes:
    return (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + (0).to_bytes(4, "big")  # x resolution
        + (0).to_bytes(4, "big")  # y resolution
        + bytes([(default_pixel & 1) << 2])
        + (0).to_bytes(2, "big")  # striping
    )


def _region_segment_payload(
    bitmap: np.ndarray,
    x: int,
    y: int,
    comb_op: int,
    mmr: bool,
    template: int,
    at: list[tuple[int, int]] | None,
    tpgdon: bool,
) -> bytes:
    h, w = bitmap.shape
    out = bytearray()
    out += w.to_bytes(4, "big") + h.to_bytes(4, "big")
    out += x.to_bytes(4, "big") + y.to_bytes(4, "big")
    out += bytes([comb_op & 7])
    flags = (1 if mmr else 0) | ((template & 3) << 1) | ((1 if tpgdon else 0) << 3)
    out += bytes([flags])
    if mmr:
        from .ccittenc import encode_g4

        # encode_g4 takes 1=black input — already JBIG2's convention
        out += encode_g4(bitmap.astype(np.uint8))
    else:
        if at is None:
            at = GB_AT_NOMINAL[template]
        for dx, dy in at:
            out += dx.to_bytes(1, "big", signed=True)
            out += dy.to_bytes(1, "big", signed=True)
        out += encode_generic_region_data(bitmap, template, at, tpgdon)
    return bytes(out)


def encode_jbig2_embedded(
    regions: list[dict],
    page_w: int,
    page_h: int,
    default_pixel: int = 0,
) -> bytes:
    """PDF-embedded JBIG2 stream: page info + one immediate generic
    region segment per entry. Each region dict: ``bitmap`` (h,w uint8,
    1=black) plus optional ``x``/``y``/``comb_op``/``mmr``/``template``/
    ``at``/``tpgdon``."""
    out = bytearray()
    out += _segment(0, 48, _page_info(page_w, page_h, default_pixel))
    for i, r in enumerate(regions):
        payload = _region_segment_payload(
            np.asarray(r["bitmap"], np.uint8),
            r.get("x", 0),
            r.get("y", 0),
            r.get("comb_op", 0),
            r.get("mmr", False),
            r.get("template", 0),
            r.get("at"),
            r.get("tpgdon", False),
        )
        out += _segment(i + 1, 38, payload)  # immediate generic region
    out += _segment(len(regions) + 1, 49, b"")  # end of page
    return bytes(out)
