"""Image XObject pixel decode + content-addressed media refs + PNG encode.

- model keys follow the reference ImageXObject (src/xobject/image.rs:15-173)
- pixel decode to RGB8 covers DeviceGray (1/8-bit) and DeviceRGB 8-bit like
  the reference canvas (src/render/canvas.rs:420-480), plus DeviceCMYK 8-bit
- ``media_ref`` is a content hash over the *decoded raw pixels* (not the
  encoded container) so it is reproducible from any lossless encoding:
  ``img:sha256("{w}x{h}:rgb8:" + pixels)[:40]``
- PNG encoding (the sink format, src/render/canvas.rs:504-506) is a minimal
  spec-conformant writer: IHDR/IDAT(zlib, filter 0 rows)/IEND
"""

from __future__ import annotations

import hashlib
import struct
import zlib

from .filters import decode_stream
from .objects import NULL, PdfParseError, Stream


def _abbrev(name: str) -> str:
    return {
        "G": "DeviceGray",
        "RGB": "DeviceRGB",
        "CMYK": "DeviceCMYK",
        "I": "Indexed",
    }.get(name, name)


def _filter_names(stream: Stream, resolve) -> list[str]:
    filt = resolve(stream.dict.get("Filter", stream.dict.get("F", NULL)))
    names = filt if isinstance(filt, list) else [filt]
    return [str(resolve(n)) for n in names]


def decode_image_pixels(stream: Stream, resolve) -> tuple[int, int, bytes]:
    """Decode an Image XObject to ``(width, height, rgb8_bytes)``."""
    d = stream.dict
    w = resolve(d.get("Width", d.get("W")))
    h = resolve(d.get("Height", d.get("H")))
    if not isinstance(w, int) or not isinstance(h, int):
        raise PdfParseError("image missing Width/Height")
    bpc = resolve(d.get("BitsPerComponent", d.get("BPC", 8)))
    cs = resolve(d.get("ColorSpace", d.get("CS", NULL)))
    data = decode_stream(stream, resolve=resolve)

    # DCT (JPEG): decode_stream passes the container through; decode it
    # to real pixels (the reference consumes jpeg-decoder output the same
    # way, src/filter/dct.rs:10-20). The JPEG's own geometry/components
    # win over the dict (matching the reference's use of the codec info).
    if any(n in ("DCTDecode", "DCT") for n in _filter_names(stream, resolve)):
        import numpy as np

        from .jpeg import decode_jpeg

        jw, jh, ncomp, px = decode_jpeg(data)
        if ncomp == 3:
            return jw, jh, px
        gray = np.frombuffer(px, dtype=np.uint8)
        return jw, jh, np.repeat(gray, 3).tobytes()

    # JPX (JPEG 2000): same passthrough-then-decode shape as DCT. Per
    # PDF 32000-1 §7.4.9 the codestream's own geometry, depth and color
    # model override the image dict (which may omit ColorSpace/BPC
    # entirely for JPXDecode); the reference todo!()s this filter
    # (src/filter/mod.rs:54).
    if any(n == "JPXDecode" for n in _filter_names(stream, resolve)):
        import numpy as np

        from .jpx import decode_jpx

        jw, jh, ncomp, px = decode_jpx(data)
        if ncomp == 3:
            return jw, jh, px
        gray = np.frombuffer(px, dtype=np.uint8)
        return jw, jh, np.repeat(gray, 3).tobytes()

    # Indexed color space: [/Indexed base hival lookup] -> palette expand
    # (PDF 32000-1 §8.6.6.3; the reference canvas todo!()s on it)
    if isinstance(cs, list) and cs and _abbrev(str(resolve(cs[0]))) == "Indexed":
        base = _abbrev(str(resolve(cs[1])))
        lookup = resolve(cs[3])
        if isinstance(lookup, Stream):
            palette = decode_stream(lookup, resolve=resolve)
        elif isinstance(lookup, str):
            palette = bytes(ord(c) & 0xFF for c in lookup)
        else:
            raise PdfParseError("bad Indexed lookup")
        ncomp = {"DeviceRGB": 3, "DeviceGray": 1}.get(base)
        if ncomp is None:
            raise PdfParseError(f"unsupported Indexed base {base}")
        if bpc == 8:
            indices = data[: w * h]
        elif bpc in (1, 2, 4):
            per_byte = 8 // bpc
            mask = (1 << bpc) - 1
            row_bytes = (w * bpc + 7) // 8
            indices = bytearray()
            for y in range(h):
                row = data[y * row_bytes : (y + 1) * row_bytes]
                for x in range(w):
                    byte = row[x // per_byte]
                    shift = 8 - bpc * (x % per_byte + 1)
                    indices.append((byte >> shift) & mask)
        else:
            raise PdfParseError(f"unsupported Indexed bpc {bpc}")
        hival = resolve(cs[2])
        # PDF 32000-1 §8.6.6.3: index values outside [0, hival] shall be
        # CLAMPED, not rejected — sloppy real-world indexed data renders
        # elsewhere and must decode here too. The hard error remains for
        # a palette too short for hival itself (structurally broken CS:
        # clamping can't produce well-defined pixels, and a short slice
        # on the RHS would silently misalign every later pixel).
        max_idx = hival if isinstance(hival, int) else len(palette) // ncomp - 1
        if (max_idx + 1) * ncomp > len(palette):
            raise PdfParseError(
                f"Indexed palette too short: hival={hival} needs "
                f"{(max_idx + 1) * ncomp}B, palette={len(palette)}B"
            )
        out = bytearray(w * h * 3)
        for i, idx in enumerate(indices[: w * h]):
            if idx > max_idx:
                idx = max_idx
            off = idx * ncomp
            if ncomp == 3:
                out[3 * i : 3 * i + 3] = palette[off : off + 3]
            else:
                v = palette[off]
                out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = v
        return w, h, bytes(out)

    # Separation / DeviceN color spaces (PDF 32000-1 §8.6.6.4-5): per-pixel
    # tint components run through the tint-transform FUNCTION (§7.10, all 4
    # types — the reference models these in src/function/mod.rs:19-37) into
    # the alternate device space. The function is evaluated once per
    # DISTINCT tuple (<= 256^n, tiny in practice), never per pixel.
    if isinstance(cs, list) and cs and str(resolve(cs[0])) in (
        "Separation",
        "DeviceN",
    ):
        from .functions import PdfFunction

        n_in = 1 if str(resolve(cs[0])) == "Separation" else len(resolve(cs[1]))
        alt = _abbrev(str(resolve(cs[2])))
        fn = PdfFunction(resolve(cs[3]), resolve)
        if bpc != 8:
            raise PdfParseError(f"unsupported Separation/DeviceN bpc {bpc}")
        n_alt = {"DeviceGray": 1, "DeviceRGB": 3, "DeviceCMYK": 4}.get(alt)
        if n_alt is None:
            raise PdfParseError(f"unsupported alternate space {alt}")
        need = w * h * n_in
        if len(data) < need:
            raise PdfParseError("short image data")

        def _q(c: float) -> int:
            v = int(c * 255 + 0.5)
            return 0 if v < 0 else 255 if v > 255 else v

        def _alt_rgb(comps: list[float]) -> bytes:
            if n_alt == 1:
                v = _q(comps[0])
                return bytes((v, v, v))
            if n_alt == 3:
                return bytes((_q(comps[0]), _q(comps[1]), _q(comps[2])))
            c, m, y_, k = (_q(x) for x in comps)
            return bytes(
                (
                    (255 - c) * (255 - k) // 255,
                    (255 - m) * (255 - k) // 255,
                    (255 - y_) * (255 - k) // 255,
                )
            )

        out = bytearray(w * h * 3)
        cache: dict[bytes, bytes] = {}
        for i in range(w * h):
            key = bytes(data[n_in * i : n_in * i + n_in])
            rgb = cache.get(key)
            if rgb is None:
                rgb = _alt_rgb(fn([b / 255.0 for b in key]))
                cache[key] = rgb
            out[3 * i : 3 * i + 3] = rgb
        return w, h, bytes(out)

    # stencil masks: /ImageMask true implies 1-bit, no color space
    # (painted with the current fill color; we emit it as 1-bit gray)
    if resolve(d.get("ImageMask", d.get("IM", False))) is True:
        cs, bpc = NULL, 1

    cs_name = _abbrev(str(cs)) if cs is not NULL else "DeviceGray"

    if cs_name == "DeviceRGB" and bpc == 8:
        need = w * h * 3
        if len(data) < need:
            raise PdfParseError("short image data")
        return w, h, bytes(data[:need])
    if cs_name == "DeviceGray" and bpc == 8:
        need = w * h
        if len(data) < need:
            raise PdfParseError("short image data")
        out = bytearray(need * 3)
        for i in range(need):
            out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = data[i]
        return w, h, bytes(out)
    if cs_name == "DeviceGray" and bpc == 1:
        row_bytes = (w + 7) // 8
        out = bytearray(w * h * 3)
        for y in range(h):
            for x in range(w):
                bit = (data[y * row_bytes + x // 8] >> (7 - x % 8)) & 1
                v = 255 if bit else 0
                i = 3 * (y * w + x)
                out[i] = out[i + 1] = out[i + 2] = v
        return w, h, bytes(out)
    if cs_name == "DeviceCMYK" and bpc == 8:
        need = w * h * 4
        if len(data) < need:
            raise PdfParseError("short image data")
        out = bytearray(w * h * 3)
        for i in range(w * h):
            c, m, y_, k = data[4 * i : 4 * i + 4]
            out[3 * i] = (255 - c) * (255 - k) // 255
            out[3 * i + 1] = (255 - m) * (255 - k) // 255
            out[3 * i + 2] = (255 - y_) * (255 - k) // 255
        return w, h, bytes(out)
    raise PdfParseError(f"unsupported image: cs={cs_name} bpc={bpc}")


def media_ref_for_pixels(w: int, h: int, rgb8: bytes) -> str:
    digest = hashlib.sha256(f"{w}x{h}:rgb8:".encode() + rgb8).hexdigest()
    return f"img:{digest[:40]}"


def decode_png(png: bytes) -> tuple[int, int, bytes]:
    """Decode an RGB8 PNG produced by ``encode_png`` (or any 8-bit
    truecolor PNG with the standard row filters) back to raw pixels."""
    from .filters import _png_predict

    if not png.startswith(b"\x89PNG\r\n\x1a\n"):
        raise PdfParseError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(png):
        length = int.from_bytes(png[pos : pos + 4], "big")
        tag = png[pos + 4 : pos + 8]
        payload = png[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w = int.from_bytes(payload[0:4], "big")
            h = int.from_bytes(payload[4:8], "big")
            bit_depth, color_type = payload[8], payload[9]
            if bit_depth != 8 or color_type != 2:
                raise PdfParseError("only 8-bit truecolor PNGs supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise PdfParseError("no IHDR")
    raw = zlib.decompress(bytes(idat))
    return w, h, _png_predict(raw, colors=3, bpc=8, columns=w)


def encode_png(w: int, h: int, rgb8: bytes) -> bytes:
    """Minimal RGB8 PNG writer (no dependencies)."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    raw = b"".join(
        b"\x00" + rgb8[y * w * 3 : (y + 1) * w * 3] for y in range(h)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
