"""WAV (RIFF/WAVE) PCM decoder — pure numpy, no codec dependency.

Covers the containers a training-data pipeline actually sees uncompressed:
PCM 8/16/24/32-bit integer and IEEE float32/float64, any channel count.
Compressed codecs (MP3/AAC/Opus...) need libraries this container lacks —
those payloads surface as explicit ``codec='unknown'`` rows downstream,
never fake features.
"""

from __future__ import annotations

import struct

import numpy as np

from .objects import PdfParseError


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Returns ``(sample_rate, n_channels, samples)`` with samples float64
    in [-1, 1], shape (n_frames, n_channels). Malformed containers raise
    PdfParseError, never bare struct/ValueError."""
    try:
        return _decode_wav(data)
    except PdfParseError:
        raise
    except (IndexError, ValueError, struct.error) as e:
        raise PdfParseError(f"malformed WAV: {type(e).__name__}: {e}") from e


def _decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise PdfParseError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = b""
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif tag == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise PdfParseError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if channels < 1:
        raise PdfParseError("bad WAV channel count")
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        # real format tag = first 2 bytes of the SubFormat GUID (fmt
        # extension: cbSize@16, validBits@18, channelMask@20, GUID@24)
        if len(fmt_body) < 26:
            raise PdfParseError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        audio_format = struct.unpack_from("<H", fmt_body, 24)[0]
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
            v = (
                raw[:, 0].astype(np.int64)
                | (raw[:, 1].astype(np.int64) << 8)
                | (raw[:, 2].astype(np.int64) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise PdfParseError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(payload, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(payload, dtype="<f8").astype(np.float64)
        else:
            raise PdfParseError(f"unsupported float bit depth {bits}")
    else:
        raise PdfParseError(f"unsupported WAV audio format {audio_format}")
    n = len(x) - len(x) % channels
    return rate, channels, x[:n].reshape(-1, channels)


def encode_wav_pcm16(rate: int, samples: np.ndarray) -> bytes:
    """Test/fixture-side writer: float [-1,1] (n, ch) -> 16-bit PCM WAV."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(np.rint(samples * 32768.0), -32768, 32767).astype("<i2")
    payload = pcm.tobytes()
    ch = samples.shape[1]
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
