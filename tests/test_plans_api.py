"""Feature API tests: op overloading, compose, JSON round-trip, mixed
native+sequential build (mirrors the reference's serialization tests,
SURVEY.md §5.4)."""

from __future__ import annotations

import math

import pytest

from finmlkit_spark.plans.api import (
    BuildContext,
    Compose,
    ConstOp,
    Ewma,
    FeatureKit,
    Input,
    Rolling,
    from_config,
)


def _bars(spark):
    rows = [(i, 100.0 + i, 10.0 + (i % 3)) for i in range(1, 31)]
    return spark.createDataFrame(rows, "bar_close_ns long, close double, volume double")


def test_rolling_and_ops(spark):
    df = _bars(spark)
    sma5 = Rolling("sma", "close", 5)
    z = Rolling("zscore", "close", 5)
    combo = (sma5 / Input("close")).abs()
    kit = FeatureKit([sma5, z, combo], retain=["bar_close_ns"])
    out = kit.build(df, BuildContext("bar_close_ns"))
    rows = {r["bar_close_ns"]: r for r in out.collect()}
    assert rows[10]["close_sma5"] == pytest.approx(sum(100.0 + i for i in range(6, 11)) / 5)
    assert rows[3]["close_sma5"] is None  # warmup
    assert rows[10][combo.name] == pytest.approx(rows[10]["close_sma5"] / 110.0)


def test_compose_and_const(spark):
    df = _bars(spark)
    t = Compose(Rolling("sma", "close", 3), Input("x").log())  # log(sma3)
    # Compose rewires: second step's expr applied over first's output
    out = FeatureKit([t], ["bar_close_ns"]).build(df, BuildContext("bar_close_ns"))
    r = {x["bar_close_ns"]: x for x in out.collect()}
    assert r[5][t.name] == pytest.approx(math.log((103 + 104 + 105) / 3))

    c = ConstOp("*", Rolling("sma", "close", 3), 2.0)
    out2 = FeatureKit([c], ["bar_close_ns"]).build(df, BuildContext("bar_close_ns"))
    r2 = {x["bar_close_ns"]: x for x in out2.collect()}
    assert r2[5][c.name] == pytest.approx(2 * (103 + 104 + 105) / 3)


def test_json_roundtrip(spark):
    df = _bars(spark)
    feat = ConstOp("*", (Rolling("sma", "close", 4) / Input("close")), 10.0)
    cfg = feat.to_config()
    rebuilt = from_config(cfg)
    ctx = BuildContext("bar_close_ns")
    a = FeatureKit([feat], ["bar_close_ns"]).build(df, ctx).collect()
    b = FeatureKit([rebuilt], ["bar_close_ns"]).build(df, ctx).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_kit_roundtrip_and_graph(spark, tmp_path):
    kit = FeatureKit([Rolling("sma", "close", 5), Rolling("zscore", "close", 5)], ["bar_close_ns"])
    p = str(tmp_path / "kit.json")
    kit.save_config(p)
    kit2 = FeatureKit.load_config(p)
    assert kit2.graph() == kit.graph()
    assert kit2.topological_order() == ["close_sma5", "close_zscore5"]


def test_sequential_stage(spark):
    import pandas as pd

    df = _bars(spark)
    e = Ewma("close", 5)
    kit = FeatureKit([Rolling("sma", "close", 3), e], ["bar_close_ns", "close"])
    out = kit.build(df, BuildContext("bar_close_ns")).orderBy("bar_close_ns").toPandas()
    expected = (
        pd.Series([100.0 + i for i in range(1, 31)]).ewm(span=5, adjust=True).mean()
    )
    assert abs(out["close_ewma5"].iloc[-1] - expected.iloc[-1]) < 1e-12
    assert "close_sma3" in out.columns


def test_requires_validation(spark):
    df = _bars(spark)
    bad = Rolling("sma", "nope", 3)
    with pytest.raises(ValueError, match="missing required"):
        FeatureKit([bad], ["bar_close_ns"]).build(df, BuildContext("bar_close_ns"))


def test_lambda_apply(spark):
    import numpy as np

    df = _bars(spark)
    t = Rolling("sma", "close", 3).apply(lambda x: np.sqrt(x), name="sqrt_sma")
    out = FeatureKit([t], ["bar_close_ns"]).build(df, BuildContext("bar_close_ns"))
    r = {x["bar_close_ns"]: x for x in out.collect()}
    assert r[5]["sqrt_sma"] == pytest.approx(math.sqrt((103 + 104 + 105) / 3))
    with pytest.raises(TypeError, match="not serializable"):
        t.to_config()


def test_external_function(spark):
    df = _bars(spark)
    from finmlkit_spark.plans.api import ExternalFunction, from_config

    t = ExternalFunction("numpy.log1p", ["close"], name="log1p_close")
    out = FeatureKit([t], ["bar_close_ns"]).build(df, BuildContext("bar_close_ns"))
    r = {x["bar_close_ns"]: x for x in out.collect()}
    assert r[5]["log1p_close"] == pytest.approx(math.log1p(105.0))
    rebuilt = from_config(t.to_config())
    assert rebuilt.import_path == "numpy.log1p"


def test_profile_report(spark):
    df = _bars(spark)
    kit = FeatureKit([Rolling("sma", "close", 3), Rolling("zscore", "close", 3)], ["bar_close_ns"])
    times = kit.profile(df, BuildContext("bar_close_ns"))
    assert set(times) == {"close_sma3", "close_zscore3"}
    assert all(t >= 0 for t in times.values())


def test_featurekit_visualize(spark):
    from finmlkit_spark.plans.api import FeatureKit, Rolling

    kit = FeatureKit([Rolling("sma", "close", 5, name="sma5")], retain=["ts_ns"])
    viz = kit.visualize()
    assert viz.splitlines()[0] == "ComputationGraph:"
    assert "input:close -> [sma5]" in viz


def test_unary_conveniences_and_roundtrip(spark):
    """square/clip (the reference Feature's convenience surface,
    kit.py:324-427): values and JSON round-trip."""
    import json

    from finmlkit_spark.plans.api import from_config

    df = _bars(spark)
    sq = Input("close").square()
    cl = Input("close").clip(103.0, 107.0)
    kit = FeatureKit([sq, cl], retain=["bar_close_ns"])
    out = kit.build(df, BuildContext("bar_close_ns"))
    rows = {r["bar_close_ns"]: r for r in out.collect()}
    assert rows[10][sq.name] == pytest.approx(110.0**2)
    assert rows[1][cl.name] == pytest.approx(103.0)   # clipped low
    assert rows[10][cl.name] == pytest.approx(107.0)  # clipped high
    assert rows[5][cl.name] == pytest.approx(105.0)   # inside

    rebuilt = from_config(json.loads(json.dumps(cl.to_config())))
    out2 = FeatureKit([rebuilt], retain=["bar_close_ns"]).build(
        df, BuildContext("bar_close_ns")
    )
    rows2 = {r["bar_close_ns"]: r for r in out2.collect()}
    assert rows2[10][rebuilt.name] == rows[10][cl.name]
