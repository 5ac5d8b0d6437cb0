"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each executor touches only its partition's
bytes (no driver collect, no shuffle of blobs).

Decode tiers:

- ``decode='fake'``: deterministic dims from the payload (plumbing
  tests — schema, partitioning, batch shapes).
- ``decode='real'``: REAL pure-numpy decoders for the uncompressed
  container formats — WAV (RIFF PCM), BMP (BITMAPINFOHEADER), PPM
  (P6) — parsed with ``struct``/numpy only; no external image/audio
  libs needed. Compressed codecs (JPEG/PNG/MP4/...) raise
  NotImplementedError at the exact seam where PIL/ffmpeg would plug
  in (not available in this container).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, byte_len long, content_md5 string, width int, height int, channels int"


def _parse_wav(b: bytes) -> tuple[int, int, int]:
    """RIFF/WAVE PCM header walk -> (n_samples, 1, n_channels)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, channels, bits, data_size = 12, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if cid == b"fmt ":
            (channels,) = struct.unpack_from("<H", b, pos + 10)
            (bits,) = struct.unpack_from("<H", b, pos + 22)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or bits is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    n_samples = data_size // (channels * (bits // 8))
    return int(n_samples), 1, int(channels)


def _parse_bmp(b: bytes) -> tuple[int, int, int]:
    """BMP BITMAPINFOHEADER -> (width, height, channels)."""
    if len(b) < 30 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", b, 18)
    (bpp,) = struct.unpack_from("<H", b, 28)
    return int(width), abs(int(height)), max(1, bpp // 8)


def _parse_ppm(b: bytes) -> tuple[int, int, int]:
    """PPM P6 ASCII header -> (width, height, 3)."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3 and pos < len(b):
        # skip whitespace and comment lines
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    if len(fields) < 3:
        raise ValueError("truncated PPM header")
    return fields[0], fields[1], 3


def decode_payload(b: bytes) -> tuple[int, int, int]:
    """Sniff + decode an uncompressed payload's dims; the PIL/ffmpeg seam
    for everything else."""
    if b[:4] == b"RIFF":
        return _parse_wav(b)
    if b[:2] == b"BM":
        return _parse_bmp(b)
    if b[:2] == b"P6":
        return _parse_ppm(b)
    raise NotImplementedError(
        "compressed codec decode (JPEG/PNG/MP4/...) requires PIL/ffmpeg "
        "(not in this container); uncompressed WAV/BMP/PPM decode natively"
    )


def wav_samples(b: bytes) -> np.ndarray:
    """PCM16 sample matrix (n_samples, channels) from a WAV payload."""
    n, _, ch = _parse_wav(b)
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if cid == b"data":
            raw = np.frombuffer(b, dtype="<i2", count=n * ch, offset=pos + 8)
            return raw.reshape(n, ch)
        pos += 8 + size + (size & 1)
    raise ValueError("missing data chunk")


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload: utf-8 bytes of the text as the opaque binary column
    (stands in for image/audio bytes; everything downstream is
    payload-agnostic)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_meta(df: DataFrame, mode: str = "fake", id_col: str = "doc_id") -> DataFrame:
    """Decode stage: binary payload -> typed metadata via mapInPandas.

    mode='fake': deterministic dims from byte length (plumbing test);
    mode='real': native WAV/BMP/PPM decode (``decode_payload``); a
    compressed codec in the batch raises at the PIL/ffmpeg seam.
    """

    def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            n = pdf["payload"].map(len)
            if mode == "real":
                dims = [decode_payload(bytes(b)) for b in pdf["payload"]]
                width = pd.Series([d[0] for d in dims], dtype="int32")
                height = pd.Series([d[1] for d in dims], dtype="int32")
                channels = pd.Series([d[2] for d in dims], dtype="int32")
            else:
                width = (n % 64 + 1).astype("int32")
                height = (n % 48 + 1).astype("int32")
                channels = pd.Series([3] * len(pdf), dtype="int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "byte_len": n.astype("int64").to_numpy(),
                    "content_md5": [hashlib.md5(b).hexdigest() for b in pdf["payload"]],
                    "width": width.to_numpy(),
                    "height": height.to_numpy(),
                    "channels": channels.to_numpy(),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_decode_batch, schema=META_SCHEMA)


AUDIO_FEAT_SCHEMA = "doc_id long, n_samples long, channels int, rms double, peak int"


def audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature-extract stage over WAV payloads: RMS + peak amplitude per
    payload, Arrow-batched (numpy over the PCM16 matrix)."""

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                s = wav_samples(bytes(b))
                rms = float(np.sqrt(np.mean(s.astype(np.float64) ** 2))) if s.size else 0.0
                peak = int(np.max(np.abs(s))) if s.size else 0
                rows.append((int(i), s.shape[0], s.shape[1], rms, peak))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "channels", "rms", "peak"]
            )

    return df.select(id_col, "payload").mapInPandas(_batch, schema=AUDIO_FEAT_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled offset (video frame
    analog) — explode of a computed offset sequence, no UDF."""
    n = F.length("payload")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return df.select("doc_id", F.explode(offsets).alias("frame_offset"))
