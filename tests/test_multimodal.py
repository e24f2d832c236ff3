"""Multimodal stages: real PNG decode/feature/resize; real WAV/PCM audio
features; stubbed video
with real Ray plumbing (schema, batch shape, determinism)."""

import numpy as np
import pyarrow as pa

from pdf_ray.pdfcore.images import decode_png, encode_png
from pdf_ray.stages.multimodal import (
    AudioFeatureStage,
    ImageFeatureStage,
    ImageResizeStage,
    VideoFrameSampleStage,
)


def _png(w, h, seed=3):
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    return pixels, encode_png(w, h, pixels)


def test_png_roundtrip():
    pixels, png = _png(7, 5)
    w, h, out = decode_png(png)
    assert (w, h) == (7, 5)
    assert out == pixels


def test_image_feature_stage():
    pixels, png = _png(4, 4)
    batch = pa.table(
        {"media_ref": ["img:x"], "png": pa.array([png], pa.large_binary())}
    )
    out = ImageFeatureStage()(batch)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, 3)
    assert out.column("width").to_pylist() == [4]
    assert out.column("height").to_pylist() == [4]
    assert out.column("mean_r").to_pylist() == [int(arr[:, 0].mean())]


def test_image_resize_stage():
    _, png = _png(16, 8)
    batch = pa.table(
        {"media_ref": ["img:x"], "png": pa.array([png], pa.large_binary())}
    )
    out = ImageResizeStage(target_w=4, target_h=4)(batch)
    w, h, pixels = decode_png(out.column("png").to_pylist()[0])
    assert (w, h) == (4, 4)
    assert len(pixels) == 4 * 4 * 3


def test_image_phash_stage():
    """dHash invariants: stage matches dhash63 on the decoded pixels;
    resize-invariant for a smooth gradient; a hand-checkable 2x1 image
    (left brighter) sets no gradient bits, the reverse sets all of them."""
    from pdf_ray.stages.multimodal import ImagePHashStage, dhash63

    pixels, png = _png(16, 8)
    batch = pa.table(
        {"media_ref": ["img:x"], "png": pa.array([png], pa.large_binary())}
    )
    out = ImagePHashStage()(batch)
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(8, 16, 3)
    assert out.column("phash").to_pylist() == [dhash63(16, 8, arr)]

    grad = np.tile(
        np.linspace(0, 255, 36, dtype=np.uint8)[None, :, None], (18, 1, 3)
    )
    yi = (np.arange(32) * 18 // 32).clip(0, 17)
    xi = (np.arange(32) * 36 // 32).clip(0, 35)
    h_orig = dhash63(36, 18, grad)
    h_small = dhash63(32, 32, grad[yi][:, xi])
    assert bin(h_orig ^ h_small).count("1") <= 6

    # 2x1 image: the 9 grid columns sample [L,L,L,L,R,R,R,R,R], so the
    # only increasing adjacency is i=3 -> bit j*8+3 per row
    dark_right = np.zeros((1, 2, 3), np.uint8)
    dark_right[0, 0] = 200
    assert dhash63(2, 1, dark_right) == 0  # decreasing: no bits
    assert dhash63(2, 1, dark_right[:, ::-1]) == sum(
        1 << (j * 8 + 3) for j in range(8)
    )


def test_audio_stage_real_wav_features():
    import numpy as np

    from pdf_ray.pdfcore.wav import encode_wav_pcm16

    # 1-second 440 Hz sine, amplitude 0.5, 8 kHz mono: rms = 0.5/sqrt(2)
    t = np.arange(8000) / 8000.0
    mono = 0.5 * np.sin(2 * np.pi * 440 * t)
    stereo = np.stack([mono, -mono], axis=1)
    batch = pa.table(
        {
            "media_ref": ["a1", "a2", "a3"],
            "audio": pa.array(
                [
                    encode_wav_pcm16(8000, mono),
                    encode_wav_pcm16(8000, stereo),
                    b"not-a-wav-payload",
                ],
                pa.large_binary(),
            ),
        }
    )
    out = AudioFeatureStage()(batch).to_pylist()
    a1, a2, a3 = out
    assert a1["codec"] == "pcm_wav"
    assert a1["duration_us"] == 1_000_000
    assert a1["sample_rate"] == 8000 and a1["channels"] == 1
    assert abs(a1["rms_milli"] - 354) <= 1  # 0.5/sqrt(2) = 0.35355
    assert abs(a1["peak_milli"] - 500) <= 1
    assert a1["zero_crossings"] == 879  # 440 Hz x 1 s x 2 crossings - 1
    # stereo: L and R cancel in the mono mix
    assert a2["channels"] == 2 and a2["rms_milli"] == 0
    # unknown codec: explicit, never fake features
    assert a3["codec"] == "unknown" and a3["rms_milli"] == -1


def test_wav_decoder_formats():
    import numpy as np

    from pdf_ray.pdfcore.wav import decode_wav, encode_wav_pcm16

    mono = np.linspace(-0.9, 0.9, 64)
    rate, ch, got = decode_wav(encode_wav_pcm16(44100, mono))
    assert (rate, ch) == (44100, 1)
    assert np.abs(got[:, 0] - mono).max() < 1e-4  # 16-bit quantization
    import pytest

    from pdf_ray.pdfcore.objects import PdfParseError

    with pytest.raises(PdfParseError):
        decode_wav(b"RIFFxxxxNOPE")


def test_video_frame_sample_stage_mjpeg():
    """REAL video path: MJPEG frames in an AVI container decode through
    the engine's own JPEG codec; frame refs are exact decoded-pixel
    hashes (uniform-block frames make the pixels hand-derivable)."""
    import numpy as np

    from pdf_ray.fixtures.avienc import encode_avi_mjpeg
    from pdf_ray.fixtures.jpegenc import encode_jpeg
    from pdf_ray.pdfcore.images import media_ref_for_pixels

    # 6 frames, uniform gray values that round-trip exactly at q=16
    values = [96, 128, 160, 192, 96, 128]
    frames = [
        encode_jpeg(np.full((8, 16), v, np.uint8), qtable=16) for v in values
    ]
    avi = encode_avi_mjpeg(frames, 16, 8, fps=5)
    batch = pa.table(
        {"media_ref": ["v1"], "video": pa.array([avi], pa.large_binary())}
    )
    out = VideoFrameSampleStage(n_frames=3)(batch)
    assert out.num_rows == 3
    assert out.column("codec").to_pylist() == ["mjpeg_avi"] * 3
    assert out.column("frame_index").to_pylist() == [0, 2, 4]
    assert out.column("n_frames_total").to_pylist() == [6, 6, 6]
    want = [
        media_ref_for_pixels(16, 8, bytes([v, v, v]) * (16 * 8))
        for v in (96, 160, 96)
    ]
    assert out.column("frame_ref").to_pylist() == want
    # identical frames collapse to identical refs
    assert want[0] == want[2]


def test_video_unknown_codec_sentinel():
    batch = pa.table(
        {
            "media_ref": ["v1"],
            "video": pa.array([bytes(range(256)) * 64], pa.large_binary()),
        }
    )
    out = VideoFrameSampleStage(n_frames=4)(batch)
    assert out.num_rows == 1
    assert out.column("codec").to_pylist() == ["unknown"]
    assert out.column("frame_index").to_pylist() == [-1]
    assert out.column("frame_ref").to_pylist() == [None]


def test_image_blob_pipeline(ray_session):
    import ray
    import ray.data as rd

    from pdf_ray.fixtures.tables import build_corpus
    from pdf_ray.pipelines.extract import extract_image_blobs

    docs, ptbl, golden, _, _, _ = build_corpus(replicas=2)
    payloads = dict(
        zip(ptbl.column("media_ref").to_pylist(), ptbl.column("bytes").to_pylist())
    )
    blobs = (
        extract_image_blobs(rd.from_arrow(docs), ray.put(payloads), concurrency=2)
        .to_pandas()
        .sort_values("media_ref")
        .reset_index(drop=True)
    )
    # distinct decodable images: f13 RGB, f25 indexed, f24 DCT,
    # f29 CCITT, f33 progressive DCT, f34 JBIG2 generic, f36 JBIG2 text
    # (f37 shares its pixels/ref), f38 JPX gray + RGB + 20-bit gray
    from pdf_ray.fixtures.corpus import (
        CCITT_REF,
        DCT_REF,
        IDX_REF,
        IMG_REF,
        JB2_REF,
        JB2T_REF,
        JPX20_REF,
        JPX_REF,
        JPXC_REF,
        OCG_IMG_REF,
        PROG_REF,
        TINT_A_REF,
        TINT_B_REF,
        TINT_C_REF,
        TINT_D_REF,
    )

    assert sorted(blobs["media_ref"]) == sorted(
        [
            IMG_REF,
            IDX_REF,
            DCT_REF,
            CCITT_REF,
            PROG_REF,
            JB2_REF,
            JB2T_REF,
            JPX_REF,
            JPXC_REF,
            JPX20_REF,
            OCG_IMG_REF,
            TINT_A_REF,
            TINT_B_REF,
            TINT_C_REF,
            TINT_D_REF,
        ]
    )
    sizes = {
        ref: decode_png(png)[:2]
        for ref, png in zip(blobs["media_ref"], blobs["png"])
    }
    assert sizes[IMG_REF] == (4, 3)
    assert sizes[IDX_REF] == (4, 2)


def test_avi_rec_list_grouped_frames():
    """Frames wrapped in 'rec ' LISTs inside movi (the interleaved-AVI
    convention) must still be found."""
    import numpy as np

    from pdf_ray.fixtures.avienc import _chunk, _list, encode_avi_mjpeg
    from pdf_ray.fixtures.jpegenc import encode_jpeg
    from pdf_ray.pdfcore.avi import parse_avi

    frames = [
        encode_jpeg(np.full((8, 8), v, np.uint8), qtable=16)
        for v in (96, 160)
    ]
    # rebuild the container with each 00dc chunk wrapped in a 'rec ' list
    plain = encode_avi_mjpeg(frames, 8, 8)
    movi = _list(
        b"movi",
        b"".join(_list(b"rec ", _chunk(b"00dc", f)) for f in frames),
    )
    head = plain[12 : plain.rfind(b"LIST", 0, plain.rfind(b"movi"))]
    body = b"AVI " + head + movi
    rebuilt = b"RIFF" + len(body).to_bytes(4, "little") + body
    w, h, got = parse_avi(rebuilt)
    assert (w, h) == (8, 8)
    assert got == frames


def test_video_mjpeg_dhtless_frames_decode_with_annex_k():
    """MJPEG AVIs commonly strip DHT from every frame (tables implied =
    T.81 Annex K defaults); the stage must decode them identically to
    table-carrying frames."""
    import numpy as np

    from pdf_ray.fixtures.avienc import encode_avi_mjpeg
    from pdf_ray.fixtures.jpegenc import encode_jpeg
    from tests.test_jpeg import _strip_dht

    values = [96, 160, 192]
    frames = [
        encode_jpeg(np.full((8, 16), v, np.uint8), qtable=16) for v in values
    ]
    full = encode_avi_mjpeg(frames, 16, 8, fps=5)
    bare = encode_avi_mjpeg([_strip_dht(f) for f in frames], 16, 8, fps=5)
    stage = VideoFrameSampleStage(n_frames=3)
    mk = lambda avi: pa.table(
        {"media_ref": ["v1"], "video": pa.array([avi], pa.large_binary())}
    )
    a, b = stage(mk(full)), stage(mk(bare))
    assert a.column("frame_ref").to_pylist() == b.column("frame_ref").to_pylist()
    assert b.column("codec").to_pylist() == ["mjpeg_avi"] * 3
