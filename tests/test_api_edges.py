"""Edge-surface tests: sort/dedup/time-slice helpers, as-of forward
direction, range_join bucketing equivalence, salted vs plain parity on
ties, packed footprint shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from finmlkit_spark.operators import footprint as FP
from finmlkit_spark.operators import joins as J
from finmlkit_spark.operators import preprocess as P

SEC = 1_000_000_000


def _tr(spark, rows):
    return spark.createDataFrame(
        [
            {"ts_ns": t * SEC, "trade_id": i, "price": p, "qty": q, "symbol": "S"}
            for i, (t, p, q) in enumerate(rows)
        ]
    )


def test_sort_dedup_slice(spark):
    df = _tr(spark, [(5, 1.0, 1.0), (1, 2.0, 1.0), (3, 3.0, 1.0)])
    assert [r["ts_ns"] // SEC for r in P.sort_trades(df).collect()] == [1, 3, 5]
    dup = df.unionByName(df)
    assert P.dedup_trades(dup).count() == 3
    assert P.time_slice(df, 2 * SEC, 4 * SEC).count() == 1


def test_asof_forward(spark):
    left = spark.createDataFrame([(10,), (20,)], "ts_ns long")
    right = spark.createDataFrame([(12, 1.0), (25, 2.0)], "ts_ns long, v double")
    out = {
        r["ts_ns"]: r["v"]
        for r in J.asof_join(left, right, on="ts_ns", direction="forward").collect()
    }
    assert out == {10: 1.0, 20: 2.0}  # earliest right row at-or-after


def test_asof_backward_no_match_null(spark):
    left = spark.createDataFrame([(5,), (30,)], "ts_ns long")
    right = spark.createDataFrame([(12, 1.0)], "ts_ns long, v double")
    out = {
        r["ts_ns"]: r["v"] for r in J.asof_join(left, right, on="ts_ns").collect()
    }
    assert out[5] is None and out[30] == 1.0


def test_range_join_bucketed_equals_plain(spark):
    left = spark.createDataFrame(
        [(0, 100), (1, 250)], "id long, start long"
    ).withColumn("end", F.col("start") + 100)
    right = spark.createDataFrame([(i * 10,) for i in range(40)], "ts_ns long")
    plain = J.range_join(left, right, "start", "end", "ts_ns").count()
    bucketed = J.range_join(left, right, "start", "end", "ts_ns", bucket_ns=64).count()
    assert plain == bucketed > 0


def test_pack_footprint_sorted(spark):
    fp = spark.createDataFrame(
        [(1, 5, 1.0, 0.0, 1, 0), (1, 3, 0.0, 2.0, 0, 1)],
        "bar_close_ns long, level long, buy_vol double, sell_vol double, buy_ticks long, sell_ticks long",
    )
    row = FP.pack_footprint(fp).collect()[0]
    levels = [e["level"] for e in row["footprint"]]
    assert levels == [3, 5]  # sorted ascending


def test_asof_join_tolerance(spark):
    from finmlkit_spark.operators import joins as J

    left = spark.createDataFrame(
        [(10,), (20,), (30,)], "ts_ns long"
    )
    right = spark.createDataFrame(
        [(9, 1.0), (12, 2.0)], "ts_ns long, x double"
    )
    out = {r["ts_ns"]: r["x"] for r in J.asof_join(left, right, tolerance_ns=5).collect()}
    assert out == {10: 1.0, 20: None, 30: None}  # 20: gap 8 > 5; 30: gap 18
    fwd = {
        r["ts_ns"]: r["x"]
        for r in J.asof_join(left, right, direction="forward", tolerance_ns=2).collect()
    }
    assert fwd == {10: 2.0, 20: None, 30: None}
