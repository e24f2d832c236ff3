"""Minimal deterministic AVI/MJPEG encoder (fixture-side only): wraps
pre-encoded JPEG frames in a spec-conformant RIFF AVI container so tests
can exercise the real video decode path (pdfcore/avi.py + jpeg.py)."""

from __future__ import annotations


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + len(body).to_bytes(4, "little") + body + pad


def _list(subtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", subtype + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Assemble JPEG frame blobs into an AVI (one MJPG video stream)."""
    n = len(frames)
    rate_us = 1_000_000 // max(1, fps)

    avih = b"".join(
        x.to_bytes(4, "little")
        for x in (
            rate_us,  # dwMicroSecPerFrame
            0, 0,     # dwMaxBytesPerSec, dwPaddingGranularity
            0x10,     # dwFlags: AVIF_HASINDEX off, WRITECOPYRIGHT-ish: use 0x10
            n,        # dwTotalFrames
            0, 1,     # dwInitialFrames, dwStreams
            0,        # dwSuggestedBufferSize
            width, height,
            0, 0, 0, 0,  # reserved
        )
    )

    strh = (
        b"vids"
        + b"MJPG"
        + b"".join(
            x.to_bytes(4, "little")
            for x in (
                0, 0,        # dwFlags, wPriority/wLanguage
                0,           # dwInitialFrames
                1, fps,      # dwScale, dwRate
                0, n,        # dwStart, dwLength
                0,           # dwSuggestedBufferSize
                0xFFFFFFFF,  # dwQuality
                0,           # dwSampleSize
            )
        )
        + b"\x00" * 8  # rcFrame
    )
    strf = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")   # biPlanes
        + (24).to_bytes(2, "little")  # biBitCount
        + b"MJPG"                     # biCompression
        + (width * height * 3).to_bytes(4, "little")
        + b"\x00" * 16
    )

    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body
