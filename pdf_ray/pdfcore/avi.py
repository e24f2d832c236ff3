"""Minimal AVI (RIFF) container parser for MJPEG video.

Turns the video stage from a stub into a real decode path using only
engine-native pieces: the RIFF chunk walk (same container family as
wav.py) finds the first ``vids`` stream, verifies it is Motion-JPEG
(``MJPG`` handler or biCompression), and returns the raw per-frame JPEG
chunks — which decode with the from-scratch JPEG codec (jpeg.py).
Other codecs (H.264, VP9, ...) have no decoder in this container and
raise PdfParseError; the stage surfaces them as ``codec='unknown'``
rows, same convention as compressed audio.

MJPEG frames that omit their huffman tables (the DHT-less MJPEG
convention) decode via the T.81 Annex K default tables, which jpeg.py
installs automatically when a stream reaches its first SOS with no DHT
defined.
"""

from __future__ import annotations

from .objects import PdfParseError


def _u32(b: bytes, i: int) -> int:
    return int.from_bytes(b[i : i + 4], "little")


def parse_avi(data: bytes) -> tuple[int, int, list[bytes]]:
    """Parse an AVI byte blob -> (width, height, [jpeg_frame_bytes...])
    for the first MJPEG video stream."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise PdfParseError("not an AVI (RIFF/AVI header missing)")

    width = height = 0
    video_stream = -1
    stream_count = 0
    is_mjpeg = False
    frames: list[bytes] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        nonlocal width, height, video_stream, stream_count, is_mjpeg
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            size = _u32(data, pos + 4)
            body0 = pos + 8
            body1 = min(end, body0 + size)
            if fourcc == b"LIST":
                subtype = data[body0 : body0 + 4]
                if subtype == b"strl":
                    _parse_strl(body0 + 4, body1)
                    stream_count += 1
                else:
                    # 'rec ' LISTs group frames INSIDE movi: stay in-movi
                    walk(body0 + 4, body1, in_movi or subtype == b"movi")
            elif in_movi and len(fourcc) == 4 and fourcc[2:4] in (
                b"dc", b"db"
            ):
                try:
                    stream_no = int(fourcc[:2])
                except ValueError:
                    stream_no = -2
                if stream_no == video_stream:
                    frames.append(bytes(data[body0:body1]))
            pos = body1 + (size & 1)  # chunks are word-aligned

    def _parse_strl(pos: int, end: int) -> None:
        nonlocal width, height, video_stream, is_mjpeg
        fcc_type = b""
        handler = b""
        compression = b""
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            size = _u32(data, pos + 4)
            body = data[pos + 8 : pos + 8 + size]
            if fourcc == b"strh" and len(body) >= 8:
                fcc_type = bytes(body[0:4])
                handler = bytes(body[4:8])
            elif fourcc == b"strf" and fcc_type == b"vids" and len(body) >= 20:
                # BITMAPINFOHEADER: biWidth @4, biHeight @8, biCompression @16
                width = int.from_bytes(body[4:8], "little", signed=True)
                height = abs(int.from_bytes(body[8:12], "little", signed=True))
                compression = bytes(body[16:20])
            pos += 8 + size + (size & 1)
        if fcc_type == b"vids" and video_stream < 0:
            video_stream = stream_count
            is_mjpeg = handler.upper() in (b"MJPG", b"MJPA") or (
                compression.upper() == b"MJPG"
            )

    walk(12, len(data), False)
    if video_stream < 0:
        raise PdfParseError("AVI has no video stream")
    if not is_mjpeg:
        raise PdfParseError("AVI video stream is not MJPEG")
    if not frames:
        raise PdfParseError("AVI has no video frames")
    # DHT-less frames are fine: jpeg.py injects the Annex K defaults
    return width, height, frames
