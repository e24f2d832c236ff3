"""ICC profile introspection (ICC.1:2004-10 / ISO 15076): the 128-byte
profile header and the tag table — the same surface the reference parses
(`src/icc_profile/mod.rs:37-88` IccProfileHeader + IccTagTable,
`src/icc_profile/parse.rs:130-318`). Color conversion via the tagged
element data is out of scope on both sides (the reference stores the
table entries without interpreting tag payloads).

Header layout (spec §7.2, all big-endian):
  0  u32  profile size
  4  4cc  preferred CMM type
  8  u32  version (BCD major, minor<<4 | bugfix, 2 reserved bytes)
 12  4cc  device class
 16  4cc  colour space of data
 20  4cc  profile connection space (PCS)
 24  dateTimeNumber (6 x u16: y, mo, d, h, mi, s)
 36  4cc  'acsp' magic
 40  4cc  primary platform
 44  u32  flags
 48  4cc  device manufacturer
 52  4cc  device model
 56  u64  device attributes
 64  u32  rendering intent
 68  3 x s15Fixed16 PCS illuminant XYZ
 80  4cc  creator
 84  16B  profile ID (MD5, may be zero)
100  28B  reserved
Tag table: u32 count, then per tag (4cc signature, u32 offset, u32 len);
offset/len must land inside the buffer (spec §7.3).
"""

from __future__ import annotations

import struct

from .objects import PdfParseError

_MAGIC = b"acsp"


def _fourcc(b: bytes) -> str:
    # signatures are printable ASCII per spec; fall back to hex so a
    # malformed profile still yields a deterministic string
    try:
        s = b.decode("ascii")
        if all(0x20 <= c < 0x7F for c in b):
            return s
    except UnicodeDecodeError:
        pass
    return b.hex()


def parse_icc(buf: bytes) -> dict:
    """Parse header + tag table -> plain dict (typed lowering per
    SURVEY §1.3). Raises PdfParseError on truncation, a bad magic, or a
    tag pointing outside the buffer."""
    if len(buf) < 132:
        raise PdfParseError("ICC: buffer shorter than header + tag count")
    if buf[36:40] != _MAGIC:
        raise PdfParseError("ICC: bad profile signature (want 'acsp')")
    (size,) = struct.unpack(">I", buf[0:4])
    ver_major = buf[8]
    ver_minor = buf[9] >> 4
    y, mo, d, h, mi, s = struct.unpack(">6H", buf[24:36])
    (flags,) = struct.unpack(">I", buf[44:48])
    (attributes,) = struct.unpack(">Q", buf[56:64])
    (intent,) = struct.unpack(">I", buf[64:68])
    ix, iy, iz = struct.unpack(">3i", buf[68:80])
    (tag_count,) = struct.unpack(">I", buf[128:132])
    if tag_count > 4096 or 132 + 12 * tag_count > len(buf):
        raise PdfParseError("ICC: tag table exceeds buffer")
    tags = []
    for i in range(tag_count):
        sig, off, ln = struct.unpack(
            ">4sII", buf[132 + 12 * i : 144 + 12 * i]
        )
        if off + ln > len(buf):
            raise PdfParseError("ICC: tag data outside buffer")
        tags.append({"sig": _fourcc(sig), "offset": off, "len": ln})
    return {
        "profile_size": size,
        "preferred_cmm": _fourcc(buf[4:8]),
        "version_major": ver_major,
        "version_minor": ver_minor,
        "device_class": _fourcc(buf[12:16]),
        "colour_space": _fourcc(buf[16:20]),
        "pcs": _fourcc(buf[20:24]),
        "created_at": (y, mo, d, h, mi, s),
        "platform": _fourcc(buf[40:44]),
        "flags": flags,
        "manufacturer": _fourcc(buf[48:52]),
        "model": _fourcc(buf[52:56]),
        "attributes": attributes,
        "rendering_intent": intent,
        # s15Fixed16 illuminant in 1/65536 units (kept integral so
        # downstream comparisons stay exact)
        "illuminant_q": (ix, iy, iz),
        "creator": _fourcc(buf[80:84]),
        "profile_id": buf[84:100].hex(),
        "tags": tags,
    }
