"""Flagship end-to-end pipeline query: raw events -> canonical trades ->
1-minute bars -> 12 inter-bar features, all in ONE Catalyst plan
(single select over the bar aggregation; the reference runs this as
EP1+EP2, SURVEY.md §3). This is the headline bench workload: one scan,
one shuffle for the bar groupBy, and — since round 3 — ZERO
``Exchange SinglePartition`` nodes: the feature windows run per row-
chunk with warmup-row duplication (``functions.chunked_window``), so
every stage of the flagship parallelizes across executors while staying
bit-identical to the global-window oracle (bounded frames + warmup
overlap => identical frame contents per row)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import chunked_window as CW
from ..functions import rolling as R
from ._registry import query
from .features_suite import _B, _guard, _wf, bars_1m, _w


#: deepest lookback chain in the flagship feature block: lag(close) ->
#: tr (1) feeding the 14-row ATR frame (13 preceding), and the 20-row
#: frames (19 preceding) whose oldest row's own r/tr needs one more lag
FLAGSHIP_WARMUP = 24


def flagship_feature_stage(bars, chunk_rows: int = 8192, persist: bool = True):
    """The flagship's 12-feature window block over OHLCV bars, evaluated
    partition-parallel via chunked windows (zero SinglePartition; results
    row-identical to the global-window form — see chunked_window docs).
    Reused by the registry query and the bench's synthetic scale probe."""
    ch = CW.with_row_chunks(
        bars, "bar_close_ns", warmup=FLAGSHIP_WARMUP, chunk_rows=chunk_rows, persist=persist
    )
    w = CW.chunk_window("bar_close_ns")
    df = ch.withColumn("r", F.log(F.col("close") / F.lag("close").over(w)))
    df = df.withColumn("tr", R.true_range("high", "low", "close", w))
    shape = R.candle_shape("open", "high", "low", "close", "vwap")
    return CW.finish(df.select(
        CW.CHUNK,
        CW.WARM,
        CW.GLOBAL_RN,
        "bar_close_ns",
        "open",
        "high",
        "low",
        "close",
        "volume",
        "vwap",
        "trades",
        F.col("r").alias("ret_1"),
        R.sma("close", 20, w).alias("sma_20"),
        R.zscore("close", 20, w).alias("zscore_20"),
        R.stoch_k("close", "high", "low", 14, w).alias("stoch_k_14"),
        R.bollinger_percent_b("close", 20, w, 2.0).alias("boll_b_20"),
        R.parkinson_range("high", "low").alias("parkinson"),
        R.atr_sma("tr", 14, w).alias("atr_14"),
        R.vwap_distance("close", "volume", 20, w).alias("vwap_dist_20"),
        R.realized_vol("r", 20, w).alias("rv_20"),
        R.roc("close", 5, w).alias("roc_5"),
        R.flow_acceleration("volume", 20, 5, w).alias("flow_accel"),
        shape["wick_up"].alias("wick_up"),
        shape["vwap_drift"].alias("vwap_drift"),
    ))



@query(
    "pipeline_1m_features",
    _B
    + f""",
trq AS (
  SELECT *, greatest(high - low,
                     abs(high - lag(close) OVER (ORDER BY bar_close_ns)),
                     abs(low - lag(close) OVER (ORDER BY bar_close_ns))) AS tr
  FROM b
)
SELECT bar_close_ns, open, high, low, close, volume, vwap, trades,
       r AS ret_1,
       {_guard(20, f'avg(close) OVER {_wf(20)}')} AS sma_20,
       {_guard(20, f'CASE WHEN stddev_samp(close) OVER {_wf(20)} <> 0 THEN (close - avg(close) OVER {_wf(20)}) / stddev_samp(close) OVER {_wf(20)} END')} AS zscore_20,
       {_guard(14, f'CASE WHEN max(high) OVER {_wf(14)} <> min(low) OVER {_wf(14)} THEN 100.0 * (close - min(low) OVER {_wf(14)}) / (max(high) OVER {_wf(14)} - min(low) OVER {_wf(14)}) END')} AS stoch_k_14,
       {_guard(20, f'CASE WHEN stddev_samp(close) OVER {_wf(20)} <> 0 THEN (close - (avg(close) OVER {_wf(20)} - 2.0 * stddev_samp(close) OVER {_wf(20)})) / (4.0 * stddev_samp(close) OVER {_wf(20)}) END')} AS boll_b_20,
       pow(ln(high / low), 2) / (4.0 * ln(2.0)) AS parkinson,
       CASE WHEN count(*) OVER {_wf(15)} = 15 THEN avg(tr) OVER {_wf(14)} END AS atr_14,
       {_guard(20, f'close / (sum(close * volume) OVER {_wf(20)} / sum(volume) OVER {_wf(20)}) - 1')} AS vwap_dist_20,
       {_guard(20, f'CASE WHEN count(r) OVER {_wf(20)} > 0 THEN sqrt(sum(r * r) OVER {_wf(20)} / count(r) OVER {_wf(20)}) END')} AS rv_20,
       (close - lag(close, 5) OVER (ORDER BY bar_close_ns)) / lag(close, 5) OVER (ORDER BY bar_close_ns) * 100.0 AS roc_5,
       {_guard(20, f'''CASE WHEN sum(volume) OVER (ORDER BY bar_close_ns ROWS BETWEEN 19 PRECEDING AND 5 PRECEDING) > 0
            THEN ln(sum(volume) OVER (ORDER BY bar_close_ns ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                    / (sum(volume) OVER (ORDER BY bar_close_ns ROWS BETWEEN 19 PRECEDING AND 5 PRECEDING) * 5.0 / 15.0)) END''')} AS flow_accel,
       (high - greatest(open, close)) / nullif(high - low, 0) AS wick_up,
       (close - vwap) / nullif(high - low, 0) AS vwap_drift
FROM trq""",
)
def pipeline_1m_features(spark, sf_dir):
    """Events -> trades -> 1m bars -> 12 features, one logical plan."""
    return flagship_feature_stage(bars_1m(spark, sf_dir, seq=False))
