"""Native uncompressed-format decode (WAV/BMP/PPM) through the Spark
mapInPandas stages — real byte parsing, not the fake-dims plumbing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from finmlkit_spark.operators import multimodal as M


def make_wav(n_samples: int, channels: int, sr: int = 16000) -> bytes:
    rng = np.random.default_rng(n_samples + channels)
    pcm = (rng.integers(-3000, 3000, size=(n_samples, channels))).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sr, sr * channels * 2, channels * 2, 16
    )
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def make_bmp(width: int, height: int) -> bytes:
    row = ((width * 3 + 3) // 4) * 4
    pixels = bytes(row * height)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def make_ppm(width: int, height: int) -> bytes:
    return (f"P6\n# test\n{width} {height}\n255\n").encode() + bytes(width * height * 3)


def test_decode_meta_real_formats(spark):
    payloads = [
        (1, make_wav(480, 2)),
        (2, make_bmp(17, 9)),
        (3, make_ppm(5, 7)),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in M.decode_meta(df, mode="real").collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["channels"]) == (480, 1, 2)
    assert (out[2]["width"], out[2]["height"], out[2]["channels"]) == (17, 9, 3)
    assert (out[3]["width"], out[3]["height"], out[3]["channels"]) == (5, 7, 3)
    assert all(out[k]["byte_len"] == len(p) for k, p in payloads)


def test_audio_features(spark):
    wav = make_wav(1000, 1)
    ref = M.wav_samples(wav).astype(np.float64)
    df = spark.createDataFrame([(7, wav)], "doc_id long, payload binary")
    row = M.audio_features(df).collect()[0]
    assert row["n_samples"] == 1000 and row["channels"] == 1
    assert row["rms"] == pytest.approx(float(np.sqrt(np.mean(ref**2))))
    assert row["peak"] == int(np.max(np.abs(ref)))


def test_compressed_codec_seam():
    with pytest.raises(NotImplementedError):
        M.decode_payload(b"\x89PNG\r\n\x1a\n....")
