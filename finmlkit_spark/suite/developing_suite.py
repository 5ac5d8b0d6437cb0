"""Expanding ("developing") volume profile + FeatureKit-built query.

- vp_developing: the reference's incremental profile formulation
  (``volume.py:492-569``): per hourly anchor, the cumulative profile
  since the UTC day start — POC + coverage so far. Expanding windows per
  (day, level) keep it native SQL.
- featurekit_build: the §2.8 declarative API driving a gated query —
  proves the fluent layer emits the same Catalyst plan the hand-written
  queries use.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..plans.api import BuildContext, FeatureKit, Input, Rolling
from ._registry import query
from .features_suite import _B, DAY_NS, bars_1m
from .footprint_suite import HOUR_NS, _FPH, _fp_spark


@query(
    "vp_developing",
    _FPH
    + f""",
dd AS (
  SELECT bar_close_ns, CAST(floor(level / 100) AS BIGINT) AS level,
         CAST(floor((bar_close_ns - 1) / {DAY_NS}) AS BIGINT) AS day_id,
         sum(buy_vol + sell_vol) AS vol
  FROM fp GROUP BY 1, 2, 3
),
cv AS (
  SELECT day_id, bar_close_ns AS anchor_ts, level,
         sum(vol) OVER (PARTITION BY day_id, level ORDER BY bar_close_ns
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vol
  FROM dd
),
-- a level appears at an anchor only if it has traded by then; carry every
-- seen (anchor, level) forward via the anchor x level grid within the day
grid AS (
  SELECT a.day_id, a.anchor_ts, l.level
  FROM (SELECT DISTINCT day_id, bar_close_ns AS anchor_ts FROM dd) a
  JOIN (SELECT DISTINCT day_id, level FROM dd) l USING (day_id)
),
filled AS (
  SELECT g.day_id, g.anchor_ts, g.level,
         last_value(cv.cum_vol IGNORE NULLS) OVER (
           PARTITION BY g.day_id, g.level ORDER BY g.anchor_ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vol
  FROM grid g LEFT JOIN cv
    ON cv.day_id = g.day_id AND cv.anchor_ts = g.anchor_ts AND cv.level = g.level
),
nz AS (SELECT * FROM filled WHERE cum_vol IS NOT NULL),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY day_id, anchor_ts
            ORDER BY cum_vol DESC, level ASC) AS r
  FROM nz
)
SELECT n.day_id, n.anchor_ts,
       any_value(p.level) AS poc_level,
       sum(n.cum_vol) AS total_vol,
       count(*) AS n_levels
FROM nz n JOIN (SELECT day_id, anchor_ts, level FROM rk WHERE r = 1) p
  USING (day_id, anchor_ts)
GROUP BY n.day_id, n.anchor_ts""",
)
def vp_developing(spark, sf_dir):
    """Developing (expanding) intraday profile per hourly anchor
    (volume.py:492-569): cumulative per-level volume since day start,
    POC-so-far, totals. Expanding windows + as-of level fill."""
    fp = _fp_spark(spark, sf_dir, HOUR_NS)
    d = (
        fp.withColumn("day_id", F.floor((F.col("bar_close_ns") - 1) / F.lit(DAY_NS)))
        .withColumn("level", F.floor(F.col("level") / 100).cast("long"))
        .groupBy("bar_close_ns", "level", "day_id")
        .agg(F.sum(F.col("buy_vol") + F.col("sell_vol")).alias("vol"))
    )
    wl = Window.partitionBy("day_id", "level").orderBy("bar_close_ns").rowsBetween(
        Window.unboundedPreceding, 0
    )
    lv = d.select(
        "day_id", F.col("bar_close_ns").alias("anchor_ts"), "level", F.sum("vol").over(wl).alias("cum_vol")
    )
    anchors = d.select("day_id", F.col("bar_close_ns").alias("anchor_ts")).distinct()
    levels = d.select("day_id", "level").distinct()
    grid = anchors.join(levels, "day_id")
    j = grid.join(lv, ["day_id", "anchor_ts", "level"], "left")
    wff = (
        Window.partitionBy("day_id", "level")
        .orderBy("anchor_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = j.withColumn("cum_vol", F.last("cum_vol", ignorenulls=True).over(wff))
    nz = filled.where(F.col("cum_vol").isNotNull())
    wr = Window.partitionBy("day_id", "anchor_ts").orderBy(
        F.col("cum_vol").desc(), F.col("level").asc()
    )
    poc = nz.withColumn("r", F.row_number().over(wr)).where(F.col("r") == 1).select(
        "day_id", "anchor_ts", F.col("level").alias("poc_level")
    )
    return nz.join(poc, ["day_id", "anchor_ts"]).groupBy("day_id", "anchor_ts").agg(
        F.any_value("poc_level").alias("poc_level"),
        F.sum("cum_vol").alias("total_vol"),
        F.count("*").alias("n_levels"),
    )


@query(
    "featurekit_build",
    # oracle: same expressions the hand-written feat_sma/feat_zscore use
    _B
    + """SELECT bar_close_ns,
       CASE WHEN count(*) OVER w20 = 20 THEN avg(close) OVER w20 END AS close_sma20,
       CASE WHEN count(*) OVER w20 = 20 THEN
         CASE WHEN stddev_samp(close) OVER w20 <> 0
              THEN (close - avg(close) OVER w20) / stddev_samp(close) OVER w20 END END AS close_zscore20,
       close AS close_id
FROM b
WINDOW w20 AS (ORDER BY bar_close_ns ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)""",
)
def featurekit_build(spark, sf_dir):
    """FeatureKit (§2.8) building a gated query: declarative transforms →
    one select → identical values to the hand-written expressions."""
    bars = bars_1m(spark, sf_dir)
    kit = FeatureKit(
        [
            Rolling("sma", "close", 20, name="close_sma20"),
            Rolling("zscore", "close", 20, name="close_zscore20"),
            Input("close"),
        ],
        retain=["bar_close_ns"],
    )
    out = kit.build(bars, BuildContext("bar_close_ns"))
    return out.withColumnRenamed("close", "close_id")
