"""fast_feature_stage (prefix-sum sliding aggregates) must agree with the
exact bounded-frame helpers to float tolerance, per symbol, including
warmup NULLs."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from finmlkit_spark.functions import rolling as R


def test_fast_stage_matches_exact_helpers(spark):
    rng = np.random.default_rng(11)
    n = 6000
    rows = []
    for s in range(3):
        close = 20000.0 * np.exp(np.cumsum(rng.normal(0, 0.002, n)))
        high = close * (1 + np.abs(rng.normal(0, 0.001, n)))
        low = close * (1 - np.abs(rng.normal(0, 0.001, n)))
        vol = np.abs(rng.normal(5, 2, n)) + 0.1
        for i in range(n):
            rows.append(
                (str(s), int(i) * 1_000_000_000, float(close[i]), float(high[i]),
                 float(low[i]), float(vol[i]))
            )
    df = spark.createDataFrame(
        rows, "symbol string, bar_close_ns long, close double, high double, low double, volume double"
    )
    w = Window.partitionBy("symbol").orderBy("bar_close_ns")
    exact = df.select(
        "symbol",
        "bar_close_ns",
        R.sma("close", 20, w).alias("sma"),
        R.zscore("close", 20, w).alias("z"),
        R.stoch_k("close", "high", "low", 14, w).alias("k"),
        R.roc("close", 5, w).alias("roc"),
        R.vwap_distance("close", "volume", 20, w).alias("vd"),
        R.bollinger_percent_b("close", 20, w).alias("bb"),
    ).toPandas().sort_values(["symbol", "bar_close_ns"]).reset_index(drop=True)
    fast = (
        R.fast_feature_stage(df, by="symbol")
        .toPandas()
        .sort_values(["symbol", "bar_close_ns"])
        .reset_index(drop=True)
    )
    assert len(exact) == len(fast) == 3 * n
    for c in ["sma", "z", "k", "roc", "vd", "bb"]:
        a = exact[c].to_numpy(dtype=float)
        b = fast[c].to_numpy(dtype=float)
        assert np.array_equal(np.isnan(a), np.isnan(b)), c
        m = ~np.isnan(a)
        scale = np.maximum(np.abs(a[m]), 1.0)
        err = np.max(np.abs(a[m] - b[m]) / scale)
        assert err < 1e-6, (c, err)


def test_fast_stage_single_shuffle(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("symbol"),
        F.col("id").alias("bar_close_ns"),
        (100.0 + F.col("id") % 13).alias("close"),
        (101.0 + F.col("id") % 13).alias("high"),
        (99.0 + F.col("id") % 13).alias("low"),
        F.lit(1.0).alias("volume"),
    )
    plan = R.fast_feature_stage(df, by="symbol")._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on symbol; no single-partition exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert math.isfinite(1.0)  # keep math import honest
