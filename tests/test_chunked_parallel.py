"""The chunked-parallel EWMA must agree with the exact single-pass
kernel to within the quantified warmup-truncation error — the scale-out
answer for sequential recurrences on one huge symbol."""

from __future__ import annotations

import numpy as np
import pandas as pd

from finmlkit_spark.functions import sequential as S

SEC = 1_000_000_000


def test_ewma_chunked_matches_exact(spark):
    rng = np.random.default_rng(42)
    n = 5000
    ts = np.cumsum(rng.integers(1, 60, n)) * SEC  # irregular arrivals
    x = 100 + np.cumsum(rng.standard_normal(n))
    df = spark.createDataFrame(
        pd.DataFrame({"ts_ns": ts.astype("int64"), "x": x})
    )
    # chunks of ~1000 rows worth of time
    chunk_ns = int((ts[-1] - ts[0]) / 5)
    out = (
        S.ewma_chunked(df, "x", span=20, chunk_ns=chunk_ns, warmup_mult=10.0, out="e")
        .orderBy("ts_ns")
        .toPandas()
    )
    exact = S.ewma(x, 20)
    assert len(out) == n
    assert np.allclose(out["e"].to_numpy(), exact, rtol=1e-8, atol=1e-8)


def test_ewma_chunked_parallelism(spark):
    # the plan must contain one task group per chunk (no single-partition
    # funnel): verify the group count equals the chunk count
    n = 2000
    ts = (np.arange(n) * SEC).astype("int64")
    df = spark.createDataFrame(pd.DataFrame({"ts_ns": ts, "x": np.ones(n)}))
    chunk_ns = 500 * SEC
    out = S.ewma_chunked(df, "x", span=10, chunk_ns=chunk_ns, out="e")
    assert out.count() == n  # warmup duplicates dropped exactly


def test_rolling_median_chunked_matches_expression_form(spark):
    """The trade-scale skip-list median (rolling_median_chunked) must
    equal the bar-scale expression form (per-row frame sort) on every
    row, including warmup NULLs — small chunks force several chunk
    boundaries through the data."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from finmlkit_spark.functions import rolling as R

    random.seed(11)
    n, N = 17, 900
    rows = [(i * 1_000_000 + random.randint(0, 500), i, 100.0 + random.random() * 10) for i in range(N)]
    df = spark.createDataFrame(rows, "ts_ns long, trade_id long, price double")

    w = Window.orderBy("ts_ns", "trade_id")
    med_expr = R._full(w, n, R.rolling_median("price", n, w))
    expected = {
        r["trade_id"]: r["m"]
        for r in df.select("trade_id", med_expr.alias("m")).collect()
    }
    got_df = R.rolling_median_chunked(
        df, "price", n, order_col="ts_ns", tiebreak_cols=("trade_id",),
        out_col="m", chunk_rows=64, coarse_span=50_000_000,
    )
    got = {r["trade_id"]: r["m"] for r in got_df.collect()}
    assert len(got) == N
    for k, v in expected.items():
        g = got[k]
        if v is None:
            assert g is None or g != g, (k, g)
        else:
            assert g is not None and abs(g - v) < 1e-12, (k, g, v)
