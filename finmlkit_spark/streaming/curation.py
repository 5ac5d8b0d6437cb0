"""Streaming LLM-data curation (beyond-reference; SURVEY.md §2.10 tier).

The batch curation operators (``operators/text.py``, ``operators/
dedup.py``) are pure column projections plus a digest groupBy, so the
streaming forms reuse the SAME column expressions — one definition,
two execution modes. The only genuinely stateful piece is dedup:

- ``streaming_exact_dedup`` uses ``dropDuplicatesWithinWatermark`` on
  the content digest, so dedup state is bounded by the event-time
  watermark instead of growing forever — the only formulation that
  survives an unbounded 100 TB/day ingest. Docs whose duplicate
  arrives after the watermark expires are re-admitted (bounded-state
  tradeoff, same contract as any watermarked streaming dedup).

At scale the digest state lives in the state store partitioned by
``content_md5`` hash — no global structure, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators import text as TX


def curation_columns(text_col: str = "text") -> dict[str, Column]:
    """The shared projection set: identical expressions serve the batch
    table and the stream (Catalyst doesn't care which)."""
    return {
        "content_md5": F.md5(F.col(text_col)),
        "n_chars": TX.char_count(text_col),
        "n_tokens": TX.token_count(text_col),
        "quality": TX.quality_score(text_col),
        "lang": TX.lang_guess(text_col),
    }


def with_curation_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    out = df
    for name, col in curation_columns(text_col).items():
        out = out.withColumn(name, col)
    return out


def streaming_quality_filter(
    stream: DataFrame,
    text_col: str = "text",
    min_chars: int = 20,
    min_quality: float = 0.3,
) -> DataFrame:
    """Stateless curation stage: annotate + filter. Pure projections —
    runs per-microbatch with zero state."""
    ann = with_curation_columns(stream, text_col)
    return ann.filter(
        (F.col("n_chars") >= min_chars) & (F.col("quality") >= min_quality)
    )


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Watermark-bounded exact dedup on the content digest: first
    arrival within the watermark horizon wins; subsequent copies drop.
    State per key is evicted once the watermark passes its event time.
    """
    ann = stream.withColumn("content_md5", F.md5(F.col(text_col)))
    return ann.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_md5"]
    )


def streaming_curation_pipeline(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
    min_chars: int = 20,
    min_quality: float = 0.3,
) -> DataFrame:
    """ingest -> quality filter -> watermarked exact dedup: the
    streaming form of the batch curation pipeline (filter first so the
    dedup state store only ever holds keep-worthy docs)."""
    kept = streaming_quality_filter(stream, text_col, min_chars, min_quality)
    return streaming_exact_dedup(kept, ts_col, watermark, text_col)


def streaming_normalized_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Watermark-bounded dedup on the NORMALIZED content digest
    (``text.normalize_text`` — lowercase, punct→space, collapsed
    whitespace): the streaming form of ``dedup.normalized_dedup``,
    catching case/punct/whitespace variants the raw digest misses.
    Same bounded-state contract as ``streaming_exact_dedup``; the
    digest state lives in the state store hashed by ``norm_md5``."""
    from ..operators.text import normalize_text

    ann = stream.withColumn("norm_md5", F.md5(normalize_text(text_col)))
    return ann.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["norm_md5"]
    )
