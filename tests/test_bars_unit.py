"""Hand-computed golden tests for bar aggregation (mirrors the
reference's ``tests/bars/test_comp_ohlcv.py`` strategy)."""

from __future__ import annotations

import pytest

from finmlkit_spark.operators import bars as B
from finmlkit_spark.operators import preprocess as P

SEC = 1_000_000_000


def _trades(spark, rows):
    return spark.createDataFrame(
        [{"ts_ns": t * SEC, "trade_id": i, "price": p, "qty": q, "symbol": "S"} for i, (t, p, q) in enumerate(rows)]
    )


def test_ohlcv_golden(spark):
    # two 60s bars: trades at 10,30,50 then 70,90
    df = _trades(spark, [(10, 100.0, 1.0), (30, 110.0, 2.0), (50, 90.0, 1.0), (70, 95.0, 4.0), (90, 105.0, 1.0)])
    df = B.with_time_bar(df, 60 * SEC)
    out = {r["bar_close_ns"]: r.asDict() for r in B.bar_ohlcv(df).collect()}
    b1 = out[60 * SEC]
    assert (b1["open"], b1["high"], b1["low"], b1["close"]) == (100.0, 110.0, 90.0, 90.0)
    assert b1["volume"] == 4.0
    assert b1["vwap"] == pytest.approx((100 + 220 + 90) / 4.0)
    assert b1["trades"] == 3
    assert b1["median_trade_size"] == 1.0
    b2 = out[120 * SEC]
    assert (b2["open"], b2["close"], b2["volume"], b2["trades"]) == (95.0, 105.0, 5.0, 2)


def test_single_trade_bar(spark):
    df = B.with_time_bar(_trades(spark, [(5, 42.0, 3.0)]), 60 * SEC)
    r = B.bar_ohlcv(df).collect()[0]
    assert r["open"] == r["high"] == r["low"] == r["close"] == 42.0
    assert r["vwap"] == 42.0 and r["volume"] == 3.0


def test_fill_empty_bars(spark):
    # trades only in minute 1 and minute 4 -> minutes 2,3 filled with prev close
    df = _trades(spark, [(10, 100.0, 1.0), (200, 120.0, 1.0)])
    bars = B.bar_ohlcv(B.with_time_bar(df, 60 * SEC))
    filled = {r["bar_close_ns"] // (60 * SEC): r.asDict() for r in B.fill_empty_bars(bars, 60 * SEC).collect()}
    assert sorted(filled) == [1, 2, 3, 4]
    assert filled[2]["close"] == 100.0 and filled[2]["volume"] == 0.0
    assert filled[3]["open"] == 100.0
    assert filled[4]["close"] == 120.0


def test_tick_rule_side(spark):
    df = _trades(spark, [(1, 100.0, 1.0), (2, 101.0, 1.0), (3, 101.0, 1.0), (4, 99.0, 1.0), (5, 99.0, 1.0)])
    sides = [r["side"] for r in P.with_trade_side(df, by="symbol").orderBy("ts_ns").collect()]
    # first defaults +1; up=+1; flat carries +1; down=-1; flat carries -1
    assert sides == [1, 1, 1, -1, -1]


def test_tick_bar_ids(spark):
    df = _trades(spark, [(i, 100.0, 1.0) for i in range(7)])
    ids = [r["bar_id"] for r in B.with_tick_bar(df, 3, by="symbol").orderBy("ts_ns").collect()]
    assert ids == [0, 0, 0, 1, 1, 1, 2]


def test_dollar_bar_carryover(spark):
    # thr=100: cum dollars 50,150,250 -> floor(0.5)=0, floor(1.5)=1, floor(2.5)=2
    df = _trades(spark, [(1, 50.0, 1.0), (2, 50.0, 2.0), (3, 50.0, 2.0)])
    ids = [r["bar_id"] for r in B.with_dollar_bar(df, 100.0, by="symbol").orderBy("ts_ns").collect()]
    assert ids == [0, 1, 2]


def test_merge_split_trades(spark):
    df = _trades(spark, [(1, 100.0, 1.0), (1, 100.0, 2.0), (2, 100.0, 1.0)])
    out = P.merge_split_trades(df).orderBy("ts_ns").collect()
    assert len(out) == 2
    assert out[0]["qty"] == 3.0 and out[0]["trade_id"] == 0


def test_salted_ohlcv_matches_unsalted(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n = 5000
    pdf = pd.DataFrame(
        {
            "ts_ns": np.sort(rng.integers(0, 600 * SEC, n)).astype("int64"),
            "trade_id": np.arange(n, dtype="int64"),
            "price": 100 + rng.standard_normal(n).cumsum(),
            "qty": rng.integers(1, 6, n).astype("float64"),
            "symbol": "S",
        }
    )
    df = B.with_time_bar(spark.createDataFrame(pdf), 60 * SEC)
    plain = {
        r["bar_close_ns"]: r.asDict()
        for r in B.bar_ohlcv(df).drop("median_trade_size").collect()
    }
    salted = {r["bar_close_ns"]: r.asDict() for r in B.bar_ohlcv_salted(df).collect()}
    assert set(plain) == set(salted)
    for k in plain:
        for c in ["open", "high", "low", "close", "volume", "trades"]:
            assert plain[k][c] == salted[k][c], (k, c)
        assert abs(plain[k]["vwap"] - salted[k]["vwap"]) < 1e-9


def test_fill_empty_bars_cross_chunk_carry(spark):
    """Gap spanning several fill chunks (chunk_bars=2): every empty chunk
    in between must inherit the close through the triangular carry."""
    df = _trades(spark, [(10, 100.0, 1.0), (700, 130.0, 1.0)])
    bars = B.bar_ohlcv(B.with_time_bar(df, 60 * SEC))
    filled = {
        r["bar_close_ns"] // (60 * SEC): r.asDict()
        for r in B.fill_empty_bars(bars, 60 * SEC, chunk_bars=2).collect()
    }
    assert sorted(filled) == list(range(1, 12 + 1))
    for m in range(2, 12):
        assert filled[m]["close"] == 100.0 and filled[m]["volume"] == 0.0
    assert filled[12]["close"] == 130.0 and filled[12]["open"] == 130.0


def test_bar_directional_by_symbol_matches_chunked_single_stream(spark):
    """The by-symbol directional aggregation (multi-symbol API form)
    must agree with the chunked single-stream form on one symbol."""
    import pandas as pd

    from finmlkit_spark.operators import bars as B
    from finmlkit_spark.operators import preprocess as P

    rows = []
    price = 100.0
    for i in range(400):
        price += [-0.5, 0.0, 0.25, 0.5][i % 4]
        rows.append(("S", 1_700_000_000_000_000_000 + i * 7_000_000_000, i, price, 1.0 + i % 3))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["symbol", "ts_ns", "trade_id", "price", "qty"])
    )
    sided = P.with_trade_side(df, by="symbol")
    a = B.bar_directional_features(
        B.with_time_bar(sided, 60_000_000_000), by=None
    )
    b = B.bar_directional_features_chunked(B.with_time_bar(df, 60_000_000_000))
    da = {r["bar_close_ns"]: r.asDict() for r in a.collect()}
    db = {r["bar_close_ns"]: r.asDict() for r in b.collect()}
    assert set(da) == set(db) and len(da) > 3
    for k in da:
        for c in da[k]:
            va, vb = da[k][c], db[k][c]
            if isinstance(va, float):
                assert abs(va - vb) < 1e-9, (k, c, va, vb)
            else:
                assert va == vb, (k, c, va, vb)


def test_salted_median_close_to_exact(spark):
    """The mergeable-sketch median in the salted form must land within a
    few percent of the exact interpolated median, and the other columns
    must match the plain form exactly."""
    import pandas as pd

    from finmlkit_spark.operators import bars as B

    rows = []
    for i in range(4000):
        rows.append(
            (
                1_700_000_000_000_000_000 + (i % 2) * 60_000_000_000 + (i // 2),
                i,
                100.0 + (i % 17) * 0.25,
                float(1 + (i * 7919) % 100),
            )
        )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts_ns", "trade_id", "price", "qty"])
    )
    exact = {
        r["bar_close_ns"]: r.asDict()
        for r in B.bar_ohlcv(B.with_time_bar(df, 60_000_000_000)).collect()
    }
    approx = {
        r["bar_close_ns"]: r.asDict()
        for r in B.bar_ohlcv_salted_with_median(
            B.with_time_bar(df, 60_000_000_000)
        ).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        med, ame = exact[k]["median_trade_size"], approx[k]["median_trade_size_approx"]
        assert abs(ame - med) / med < 0.1, (k, med, ame)
        for c in ("open", "high", "low", "close", "volume", "trades"):
            assert exact[k][c] == approx[k][c], (k, c)
