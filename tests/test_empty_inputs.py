"""Empty-input robustness: every major operator must plan and execute
on zero-row frames (the kmeans dim-probe ParseException from the
round-4 advisory was exactly this class of bug)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _empty(spark, schema: str):
    return spark.createDataFrame([], schema)


TRADES = "symbol string, ts_ns long, trade_id long, price double, qty double"
DOCS = "doc_id long, text string"
EMBS = "vec_id long, embedding array<double>"


def test_preprocess_ops_empty(spark):
    from finmlkit_spark.operators import preprocess as P

    tr = _empty(spark, TRADES)
    assert P.with_trade_side(tr).count() == 0
    assert P.with_trade_side_chunked(tr).count() == 0
    assert P.merge_split_trades(tr).count() == 0
    assert P.integrity_report(tr).count() == 0
    assert P.infer_tick_size(tr) == 0.01  # documented fallback


def test_bars_ops_empty(spark):
    from finmlkit_spark.operators import bars as B

    tr = _empty(spark, TRADES + ", side int")
    bars = B.bar_ohlcv(B.with_time_bar(tr, 60_000_000_000))
    assert bars.count() == 0
    assert B.bar_ohlcv_salted(B.with_time_bar(tr, 60_000_000_000)).count() == 0


def test_labels_ops_empty(spark):
    from finmlkit_spark.operators import labels as L

    ev = _empty(spark, "event_id long, event_ts_ns long, entry_price double, target double")
    tr = _empty(spark, "ts_ns long, price double")
    assert L.triple_barrier(ev, tr, horizon_ns=10**12).count() == 0
    spans = _empty(spark, "event_id long, event_ts_ns long, touch_ts_ns long")
    trv = _empty(spark, "ts_ns long")
    assert L.average_uniqueness_sweep(spans, trv).count() == 0


def test_dedup_ops_empty(spark):
    from finmlkit_spark.operators import corpus as CP
    from finmlkit_spark.operators import dedup as D

    docs = _empty(spark, DOCS)
    assert D.exact_dedup(docs).count() == 0
    assert D.minhash_lsh_pairs(docs).count() == 0
    assert D.ngram_jaccard_pairs(docs).count() == 0
    assert D.simhash_near_pairs(docs).count() == 0
    assert CP.segment_dedup(docs).count() == 0
    pairs = _empty(spark, "doc_a long, doc_b long")
    assert D.dedup_clusters(pairs).count() == 0
    assert D.dedup_clusters_star(pairs).count() == 0


def test_similarity_ops_empty(spark):
    from finmlkit_spark.operators import similarity as S

    embs = _empty(spark, EMBS)
    assert S.kmeans_assign(embs).count() == 0
    assert S.semantic_dup_pairs(embs).count() == 0
    # explicit dim skips the probe and must behave identically on empty
    assert S.kmeans_assign(embs, dim=8).count() == 0


def test_multimodal_ops_empty(spark):
    from finmlkit_spark.operators import multimodal as MM

    df = _empty(spark, "doc_id long, payload binary")
    assert MM.decode_meta(df).count() == 0
    assert MM.image_features(df).count() == 0
    assert MM.audio_spectral(df).count() == 0
    assert MM.image_resize(df, 4, 4).count() == 0
