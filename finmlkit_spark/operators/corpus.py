"""Corpus-level text statistics for training-data pipelines
(BASELINE.json north star; no reference counterpart): vocabulary
building and TF-IDF keyword extraction over the documents table.

Both are one-explode + hash-aggregate shapes: token frequency tables
are map-side combined on the token key, so at 100 TB the shuffle
carries only (token, partial count) pairs — never document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def vocab_topk(
    docs: DataFrame,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` corpus vocabulary by token frequency with document
    frequency — the tokenizer-training prep table (BPE/unigram trainers
    consume exactly this word-count list).

    Plan: explode tokens once, two-level hash aggregate (token count +
    doc-distinct count via per-(doc, token) pre-aggregation), then a
    TakeOrdered top-k — no global sort materializes. Ties break on the
    token string for determinism.
    """
    e = docs.select(F.col("doc_id"), F.explode(tokens(text_col)).alias("token"))
    per_doc = e.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    counts = per_doc.groupBy("token").agg(
        F.sum("tf").cast("long").alias("n_occurrences"),
        F.count("*").cast("long").alias("n_docs"),
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def tfidf_keywords(
    docs: DataFrame,
    top_per_doc: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-``top_per_doc`` keywords by TF·IDF with a
    rational idf = N/df (instead of log(N/df)) so every score is an
    exact integer ratio — bit-identical across engines, which makes the
    per-doc ranking deterministic (the log variant differs in the last
    ulp between libm builds and can flip near-tie ranks). Monotone in
    df for fixed tf, so the top-k set matches the log variant whenever
    scores aren't exactly tied; residual ties break on the token.

    Plan: one explode, per-(doc, token) tf aggregate, token df
    aggregate joined back on the token key, scalar N broadcast, then a
    bounded per-doc window for the top-k. All keys are narrow; document
    text never shuffles.
    """
    e = docs.select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("token"))
    tf = e.groupBy("doc", "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").cast("double").alias("n_total"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score", F.col("tf").cast("double") * F.col("n_total") / F.col("df")
        )
    )
    w = Window.partitionBy("doc").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= top_per_doc)
        .select(
            F.col("doc").alias(id_col),
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
            "rank",
        )
    )
