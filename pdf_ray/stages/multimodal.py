"""Multimodal actor-pool stages over opaque ``binary`` payload columns.

Pattern (system brief): media payloads are ``large_binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample run as
actor-pool ``map_batches`` stages. In this container:

- **images**: fully real — the engine's own PNG codec decodes blobs and
  the stage computes vectorized features (no external image lib needed)
- **audio / video**: the codec itself is STUBBED — no decoder library
  exists here. The stage tries an import and otherwise derives a
  deterministic fake signal from the payload bytes (clearly marked), so
  the Ray-side plumbing (schema, batch size, actor lifecycle, output
  layout) is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..pdfcore.images import decode_png


class ImageFeatureStage:
    """(media_ref, png: binary) -> (media_ref, width, height, mean_r/g/b).

    Use: ``blobs.map_batches(ImageFeatureStage, batch_format="pyarrow",
    concurrency=N, batch_size=B)`` — small batches for large blobs
    (batch bytes x concurrency must fit the worker heap)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        widths, heights, mr, mg, mb = [], [], [], [], []
        for blob in batch.column("png").to_pylist():
            w, h, pixels = decode_png(blob)
            arr = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, 3)
            mean = arr.mean(axis=0)
            widths.append(w)
            heights.append(h)
            mr.append(int(mean[0]))
            mg.append(int(mean[1]))
            mb.append(int(mean[2]))
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "mean_r": pa.array(mr, pa.int32()),
                "mean_g": pa.array(mg, pa.int32()),
                "mean_b": pa.array(mb, pa.int32()),
            }
        )


class ImageResizeStage:
    """Nearest-neighbor resize to (target_w, target_h) -> re-encoded PNG.
    Pure-numpy (real); shows the decode-transform-encode actor shape."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw = target_w
        self.th = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pdfcore.images import encode_png

        refs = batch.column("media_ref").to_pylist()
        out = []
        for blob in batch.column("png").to_pylist():
            w, h, pixels = decode_png(blob)
            arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)
            yi = (np.arange(self.th) * h // self.th).clip(0, h - 1)
            xi = (np.arange(self.tw) * w // self.tw).clip(0, w - 1)
            small = arr[yi][:, xi]
            out.append(encode_png(self.tw, self.th, small.tobytes()))
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "png": pa.array(out, pa.large_binary()),
            }
        )


class AudioFeatureStage:
    """(media_ref, audio: binary) -> fixed-size feature vector.

    STUB: no audio codec is available in this container. If ``soundfile``
    or ``librosa`` ever become importable the real decode path activates;
    until then features are a deterministic hash-derived fake so the
    pipeline shape stays testable. Do NOT interpret the fake features."""

    N_FEATURES = 16

    def __init__(self):
        try:  # pragma: no cover - not present in this container
            import soundfile  # noqa: F401

            self._real = True
        except ImportError:
            self._real = False

    def _fake_features(self, blob: bytes) -> list[float]:
        digest = hashlib.sha256(blob).digest()
        return [b / 255.0 for b in digest[: self.N_FEATURES]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        feats = []
        for blob in batch.column("audio").to_pylist():
            if self._real:  # pragma: no cover
                raise NotImplementedError("real audio decode not wired yet")
            feats.append(self._fake_features(blob))
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "features": pa.array(
                    feats, pa.list_(pa.float64(), self.N_FEATURES)
                ),
            }
        )


class VideoFrameSampleStage:
    """(media_ref, video: binary) -> k frame refs.

    STUB decode (no video codec here): emits deterministic pseudo-frame
    content hashes at evenly spaced offsets of the payload, standing in
    for ffmpeg-style keyframe sampling. Schema and actor shape are real."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs_out, frame_idx, frame_refs = [], [], []
        for ref, blob in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("video").to_pylist(),
        ):
            n = max(1, len(blob))
            for i in range(self.n_frames):
                off = i * n // self.n_frames
                chunk = blob[off : off + 4096]
                refs_out.append(ref)
                frame_idx.append(i)
                frame_refs.append(
                    "frame:" + hashlib.sha256(chunk).hexdigest()[:32]
                )
        return pa.table(
            {
                "media_ref": pa.array(refs_out, pa.string()),
                "frame_index": pa.array(frame_idx, pa.int32()),
                "frame_ref": pa.array(frame_refs, pa.string()),
            }
        )
