"""Real uncompressed-media decode (operators/multimodal.py, r5): pure-Python
24-bit BMP and 16-bit PCM WAV decoders verified against hand-built byte
payloads with known pixel/sample content, plus the real feature extractors,
nearest-neighbor resize, and the Spark feature stage mixing real and fake
payloads.  Compressed mimes keep the deterministic fake pass-through — the
existing multimodal oracles pin that path unchanged."""

import struct

import numpy as np
import pytest

from open_parse_spark.operators.multimodal import (
    DecodedAudio,
    DecodedImage,
    audio_feature,
    decode_bmp,
    decode_media,
    decode_wav,
    extract_media_features,
    image_feature,
    resize_image,
)


def make_bmp(pixels_rgb, top_down=False):
    """Hand-assemble an uncompressed 24-bit BMP from an (H, W, 3) RGB list,
    honoring the 4-byte row padding and bottom-up default storage."""
    arr = np.asarray(pixels_rgb, dtype=np.uint8)
    h, w = arr.shape[:2]
    row_size = ((24 * w + 31) // 32) * 4
    pad = row_size - w * 3
    body = b""
    row_iter = arr if top_down else arr[::-1]
    for row in row_iter:
        body += bytes(int(v) for px in row for v in px[::-1])  # RGB -> BGR
        body += b"\x00" * pad
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + dib + body


def make_wav(samples, rate=8000):
    """Hand-assemble a RIFF/WAVE with one fmt + one data chunk from an
    (n, channels) int16 array."""
    arr = np.asarray(samples, dtype="<i2")
    n, ch = arr.shape
    pcm = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


RGB_2x2 = [
    [[255, 0, 0], [0, 255, 0]],
    [[0, 0, 255], [255, 255, 255]],
]


def test_bmp_roundtrip_bottom_up_and_top_down():
    for top_down in (False, True):
        img = decode_bmp(make_bmp(RGB_2x2, top_down=top_down))
        assert isinstance(img, DecodedImage)
        np.testing.assert_array_equal(img.pixels, np.array(RGB_2x2, np.uint8))


def test_bmp_row_padding_odd_width():
    # width 3 -> 9 pixel bytes padded to 12 per row: padding must be skipped
    rgb = [[[10, 20, 30], [40, 50, 60], [70, 80, 90]]]
    img = decode_bmp(make_bmp(rgb))
    np.testing.assert_array_equal(img.pixels, np.array(rgb, np.uint8))


def test_bmp_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_bmp(b"not a bitmap at all, just text bytes padded out" * 3)
    blob = bytearray(make_bmp(RGB_2x2))
    struct.pack_into("<H", blob, 28, 8)  # bpp=8 (palette) unsupported
    with pytest.raises(ValueError):
        decode_bmp(bytes(blob))
    with pytest.raises(ValueError):
        decode_bmp(make_bmp(RGB_2x2)[:-3])  # truncated pixel data


def test_wav_roundtrip_stereo():
    samples = np.stack(
        [np.arange(-8, 8, dtype=np.int16), np.arange(8, -8, -1, dtype=np.int16)],
        axis=1,
    )
    aud = decode_wav(make_wav(samples, rate=16000))
    assert isinstance(aud, DecodedAudio)
    assert aud.sample_rate == 16000 and aud.samples.shape == (16, 2)
    np.testing.assert_array_equal(aud.samples, samples)


def test_wav_rejects_non_pcm_and_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    blob = bytearray(make_wav(np.zeros((4, 1), np.int16)))
    struct.pack_into("<H", blob, 20, 3)  # IEEE float format
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(blob))


def test_decode_media_routing_keeps_fake_path_pinned():
    bmp = make_bmp(RGB_2x2)
    assert isinstance(decode_media(bmp, "image/bmp"), DecodedImage)
    wav = make_wav(np.ones((4, 1), np.int16))
    assert isinstance(decode_media(wav, "audio/wav"), DecodedAudio)
    # non-RIFF audio/wav payloads keep the legacy fake pass-through (this is
    # what every existing multimodal oracle pins on the synthetic corpus)
    assert decode_media(b"text bytes", "audio/wav") == b"text bytes"
    assert decode_media(b"\x89PNG...", "image/png") == b"\x89PNG..."
    with pytest.raises(NotImplementedError):
        decode_media(b"anything", "application/unknown")


def test_image_feature_grid_and_resize():
    # 4x4 image with known grayscale per quadrant-of-cells
    px = np.zeros((4, 4, 3), np.uint8)
    px[0, 0] = (255, 255, 255)  # cell (0,0) -> 1.0
    img = DecodedImage(pixels=px)
    feat = image_feature(img)
    assert len(feat) == 16
    assert feat[0] == pytest.approx(255 / 255.0)
    assert feat[1:] == [0.0] * 15
    big = resize_image(img, 8, 8)  # nearest-neighbor doubles each pixel
    assert big.pixels.shape == (8, 8, 3)
    np.testing.assert_array_equal(big.pixels[:2, :2], np.full((2, 2, 3), 255))
    assert big.pixels[2:, 2:].sum() == 0
    tiny = resize_image(img, 1, 1)
    assert tiny.pixels.shape == (1, 1, 3)
    with pytest.raises(ValueError):
        resize_image(img, 0, 4)


def test_audio_feature_envelope():
    # 16 frames, mono: frame i has amplitude 2048*i -> strictly rising RMS
    samples = (np.arange(16) * 2048).clip(0, 32767).astype(np.int16)[:, None]
    feat = audio_feature(DecodedAudio(8000, samples))
    assert len(feat) == 16
    assert feat[0] == 0.0
    assert all(b >= a for a, b in zip(feat, feat[1:]))
    assert 0.0 <= max(feat) <= 1.0


def test_spark_stage_mixes_real_and_fake_payloads(spark):
    """The mapInPandas stage: real BMP/WAV rows get REAL features, text-byte
    stand-ins keep the fake sha-lattice features, malformed rows are
    counted-and-carried decode_ok=false — all in one map-only plan."""
    rows = [
        (1, "image", "image/bmp", bytearray(make_bmp(RGB_2x2))),
        (2, "audio", "audio/wav", bytearray(make_wav(np.ones((16, 2), np.int16) * 16384))),
        (3, "audio", "audio/wav", bytearray(b"not riff text bytes")),
        (4, "image", "image/bmp", bytearray(b"garbage that is not a bmp")),
        (5, "video", "video/mp4", bytearray(b"fake mp4 payload")),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, data binary"
    )
    got = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert got[1]["decode_ok"] and len(got[1]["feature"]) == 16
    # the 2x2 test image: white+red+green+blue -> mean grid is real pixels
    assert got[1]["feature"][0] == pytest.approx(85 / 255.0, abs=1e-6)
    assert got[2]["decode_ok"]
    assert got[2]["feature"][0] == pytest.approx(16384 / 32768.0, abs=1e-6)
    assert got[3]["decode_ok"] and got[3]["feature"]  # legacy fake path
    assert not got[4]["decode_ok"] and got[4]["feature"] == []
    assert got[5]["decode_ok"]  # stubbed pass-through
    plan = extract_media_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_truncated_riff_is_carried_not_crashed(spark):
    """A payload that starts like a RIFF/WAV but ends mid-'fmt ' chunk makes
    struct.unpack_from raise struct.error — the lineage contract says such
    rows are counted-and-carried decode_ok=false, never a job failure."""
    truncated = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"  # ends early
    )
    df = spark.createDataFrame(
        [(1, "audio", "audio/wav", bytearray(truncated))],
        "media_id long, kind string, mime string, data binary",
    )
    got = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert not got[1]["decode_ok"] and got[1]["feature"] == []
