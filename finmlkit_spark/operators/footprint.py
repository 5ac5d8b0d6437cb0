"""Footprint operators (SURVEY.md §2.4; reference ``base.py:615-850``).

The reference stores per-bar ragged arrays (price levels × buy/sell
volume/ticks). Spark-first design: a **long-form footprint table**
``(bar_close_ns, level, buy_vol, sell_vol, buy_ticks, sell_ticks)`` —
one groupBy away from trades, join/agg friendly, explodes ~levels× rows
instead of nesting. ``collect_list(struct(...))`` packing is offered
only at the API edge (``pack_footprint``) for pandas interop parity
with ``FootprintData.get_df`` (``bar/utils.py:129-209``).

Price levels are integer ticks (float-error avoidance, reference
``base.py:688-708``): level = round(price / tick) computed as
round(price · 1/tick) identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def footprint_long(trades_sided: DataFrame, tick: float, key: str = "bar_close_ns") -> DataFrame:
    """Trades (with side + bar key) -> long footprint table
    (``comp_bar_footprints`` ``base.py:615-752``): per (bar, level)
    buy/sell volume and tick counts. One hash aggregation, no state."""
    inv = 1.0 / tick
    lvl = F.round(F.col("price") * inv).cast("long")
    df = trades_sided.withColumn("level", lvl)
    return df.groupBy(key, "level").agg(
        F.sum(F.when(F.col("side") == 1, F.col("qty")).otherwise(0.0)).alias("buy_vol"),
        F.sum(F.when(F.col("side") == -1, F.col("qty")).otherwise(0.0)).alias("sell_vol"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast("long").alias("buy_ticks"),
        F.sum(F.when(F.col("side") == -1, 1).otherwise(0)).cast("long").alias("sell_ticks"),
    )


def footprint_features(
    fp: DataFrame,
    imb_mult: float = 3.0,
    key: str = "bar_close_ns",
    tick: float = 0.01,
    bar_vwap: DataFrame | None = None,
) -> DataFrame:
    """Per-bar footprint features (``comp_footprint_features``
    ``base.py:755-850``):

    - diagonal imbalance flags: sell[l] > m·buy[l+1] (sell imbalance),
      buy[l] > m·sell[l−1] (buy imbalance) — lag/lead over the level
      window within the bar (``base.py:795-798``);
    - buy/sell imbalance counts; SIGNED longest imbalance run — buy
      priority on dual-imbalance levels, first maximal run wins ties
      (gaps-and-islands over levels, ``base.py:800-822``);
    - COT level = argmax total volume, lowest level on ties
      (``base.py:828-830``);
    - vp_skew: the reference computes Σ(level−level_vwap)·vol/Σvol, which
      is IDENTICALLY ZERO (deviation around its own weighted mean,
      ``base.py:838-843``); we fix the semantics by skewing around the
      bar's TRADE vwap (pass ``bar_vwap``); vp_gini = 1−Σ(vol/Σvol)²
      (``base.py:845-848``).
    """
    wl = Window.partitionBy(key).orderBy("level")
    vol = F.col("buy_vol") + F.col("sell_vol")
    df = fp.withColumn("vol", vol)
    df = df.withColumn(
        "sell_imb",
        (F.col("sell_vol") > imb_mult * F.lead("buy_vol").over(wl)).cast("int"),
    ).withColumn(
        "buy_imb",
        (F.col("buy_vol") > imb_mult * F.lag("sell_vol").over(wl)).cast("int"),
    )
    # signed imbalance state per level: buy checked FIRST (a level with
    # both imbalances counts as buy, reference base.py:800-805)
    sgn = (
        F.when(F.col("buy_imb") == 1, 1)
        .when(F.col("sell_imb") == 1, -1)
        .otherwise(0)
    )
    df = df.withColumn("imb_sgn", sgn)
    # gaps-and-islands run length WITHOUT a second (key, grp)
    # partitioning: every row whose imb_sgn differs from its
    # predecessor (lag default 0) starts a run, so the run-internal
    # position is rn − rn(last start) + 1 — a running last-ignoreNulls
    # over the SAME window partitioning/order as the lead/lag pass (one
    # exchange+sort total; the row_number-over-(key, grp) form planned
    # a second exchange+sort on the derived group key). Integer-exact,
    # so identical to the grouped row_number.
    chg = F.when(F.col("imb_sgn") != F.lag("imb_sgn", 1, 0).over(wl), 1).otherwise(0)
    run = wl.rowsBetween(Window.unboundedPreceding, 0)
    df = df.withColumn("_rn", F.row_number().over(wl))
    df = df.withColumn(
        "_start_rn",
        F.last(F.when(chg == 1, F.col("_rn")), ignorenulls=True).over(run),
    )
    df = df.withColumn(
        "run_len",
        F.when(
            F.col("imb_sgn") != 0, F.col("_rn") - F.col("_start_rn") + 1
        ).otherwise(0),
    )

    if bar_vwap is not None:
        df = df.join(bar_vwap.select(key, "bar_vwap"), key)
    else:
        df = df.withColumn("bar_vwap", F.lit(None).cast("double"))

    price = F.col("level") * F.lit(tick)
    return df.groupBy(key).agg(
        F.count("*").cast("long").alias("n_levels"),
        F.sum(F.coalesce("buy_imb", F.lit(0))).cast("long").alias("buy_imb_sum"),
        F.sum(F.coalesce("sell_imb", F.lit(0))).cast("long").alias("sell_imb_sum"),
        # SIGNED longest run (reference base.py:806-822): first run (in
        # level order) reaching the max length wins ties -> min_by on
        # (-run_len, level), signed by the run direction
        F.min_by(
            F.col("run_len") * F.col("imb_sgn"),
            F.struct((-F.col("run_len")).alias("nr"), F.col("level")),
        ).cast("long").alias("max_imb_run"),
        F.min_by("level", F.struct((-F.col("vol")).alias("nv"), F.col("level"))).alias("cot_level"),
        F.sum(F.col("vol") * F.col("vol")).alias("_v2"),
        F.sum("vol").alias("_v1"),
        F.sum(price * F.col("vol")).alias("_pv"),
        F.sum(price * price * F.col("vol")).alias("_ppv"),
        F.sum((price - F.col("bar_vwap")) * F.col("vol")).alias("_skew_num"),
    ).select(
        key,
        "n_levels",
        "buy_imb_sum",
        "sell_imb_sum",
        "max_imb_run",
        "cot_level",
        # vp_skew = Σ(p−bar_vwap)·v/Σv around the bar's TRADE vwap
        # (base.py:838-843); NULL when no bar_vwap table was supplied
        # (around the level-vwap it would degenerate to 0)
        (F.col("_skew_num") / F.col("_v1")).alias("vp_skew"),
        ((F.col("_ppv") / F.col("_v1")) - F.pow(F.col("_pv") / F.col("_v1"), 2)).alias("vp_var"),
        (F.lit(1.0) - F.col("_v2") / (F.col("_v1") * F.col("_v1"))).alias("vp_gini"),
    )


def pack_footprint(fp: DataFrame, key: str = "bar_close_ns") -> DataFrame:
    """API-edge packing to one nested row per bar (pandas interop parity
    with ``FootprintData.get_df``)."""
    return fp.groupBy(key).agg(
        F.sort_array(
            F.collect_list(
                F.struct("level", "buy_vol", "sell_vol", "buy_ticks", "sell_ticks")
            )
        ).alias("footprint")
    )
