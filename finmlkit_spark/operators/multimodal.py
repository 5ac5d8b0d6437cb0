"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each executor touches only its partition's
bytes (no driver collect, no shuffle of blobs). The decode itself is
STUBBED (no image/audio libs in this container): ``decode='fake'``
derives deterministic dims from the payload so the whole pipeline —
schema, partitioning, batch shapes — is real and tested;
``decode='real'`` raises NotImplementedError at the exact seam where
PIL/ffmpeg would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id long, byte_len long, content_md5 string, width int, height int, channels int"


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload: utf-8 bytes of the text as the opaque binary column
    (stands in for image/audio bytes; everything downstream is
    payload-agnostic)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_meta(df: DataFrame, mode: str = "fake", id_col: str = "doc_id") -> DataFrame:
    """Decode stage: binary payload -> typed metadata via mapInPandas.

    mode='fake': deterministic dims from byte length (plumbing test);
    mode='real': the PIL/ffmpeg seam — NotImplementedError here.
    """
    if mode == "real":
        raise NotImplementedError(
            "image/audio decode requires PIL/ffmpeg (not in this container); "
            "plug the real decoder into _decode_batch"
        )

    def _decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": n.astype("int64"),
                    "content_md5": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
                    "width": (n % 64 + 1).astype("int32"),
                    "height": (n % 48 + 1).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_decode_batch, schema=META_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled offset (video frame
    analog) — explode of a computed offset sequence, no UDF."""
    n = F.length("payload")
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return df.select("doc_id", F.explode(offsets).alias("frame_offset"))
