"""Bar-family queries over the driver's ``events`` table (SURVEY.md §2.2-2.4).

The events stream is adapted to canonical trades (price=value,
qty = 1 + event_id % 5, one global 'EVT' stream) — see
``sources.trades.events_to_trades`` and the matching DuckDB CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import bars as B
from ..operators import preprocess as P
from ..sources.trades import EVENTS_TRADES_CTE, events_to_trades
from ._registry import query

MIN_NS = 60_000_000_000
DOLLAR_THR = 20_000.0
VOLUME_THR = 500.0
TICK_N = 50

_TRADES = "WITH " + EVENTS_TRADES_CTE.strip()

# sided trades (tick-rule side) as a reusable oracle prefix
_SIDED = (
    _TRADES
    + """,
r AS (
  SELECT *, sign(price - lag(price) OVER (ORDER BY ts_ns, trade_id)) AS raw
  FROM trades
),
sided AS (
  SELECT ts_ns, trade_id, price, qty,
         CAST(coalesce(
           last_value(CASE WHEN raw <> 0 THEN raw END IGNORE NULLS)
             OVER (ORDER BY ts_ns, trade_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           1) AS INT) AS side
  FROM r
)
"""
)

_OHLCV_SELECT = """
SELECT {key},
       arg_min(price, trade_id) AS open,
       max(price) AS high,
       min(price) AS low,
       arg_max(price, trade_id) AS close,
       sum(qty) AS volume,
       sum(price * qty) / sum(qty) AS vwap,
       count(*) AS trades,
       median(qty) AS median_trade_size,
       min(ts_ns) AS first_ts_ns,
       max(ts_ns) AS last_ts_ns
FROM t GROUP BY {key}
"""


def _trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_to_trades(spark, sf_dir)


def _ohlcv_cols(df: DataFrame, key: str) -> DataFrame:
    return df.select(
        key,
        "open",
        "high",
        "low",
        "close",
        "volume",
        "vwap",
        "trades",
        "median_trade_size",
        "first_ts_ns",
        "last_ts_ns",
    )


# --- preprocessing ----------------------------------------------------------

@query("trades_side", _SIDED + "SELECT * FROM sided")
def trades_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-rule side inference (reference ``bar/utils.py:10-46``) —
    chunk-parallel carry form, no single-partition window."""
    return P.with_trade_side_chunked(_trades(spark, sf_dir)).select(
        "ts_ns", "trade_id", "price", "qty", "side"
    )


@query(
    "integrity_report",
    _TRADES
    + f""",
d AS (
  SELECT trade_id - lag(trade_id) OVER (ORDER BY ts_ns, trade_id) AS id_diff,
         ts_ns - lag(ts_ns) OVER (ORDER BY ts_ns, trade_id) AS ts_diff
  FROM trades
)
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN id_diff > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_id_gaps,
       CAST(sum(CASE WHEN id_diff > 1 THEN id_diff - 1 ELSE 0 END) AS BIGINT) AS missing_ids,
       CAST(sum(CASE WHEN ts_diff > {MIN_NS} THEN 1 ELSE 0 END) AS BIGINT) AS n_time_gaps,
       max(ts_diff) AS max_time_gap_ns
FROM d
""",
)
def integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Id/time gap integrity pass (reference ``data_model.py:254-292``)."""
    return P.integrity_report(_trades(spark, sf_dir), by=None, max_gap_ns=MIN_NS)


@query(
    "merge_split_trades",
    _TRADES
    + """
SELECT symbol, ts_ns, price,
       min(trade_id) AS trade_id,
       sum(qty) AS qty
FROM trades GROUP BY symbol, ts_ns, price
""",
)
def merge_split_trades_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-trade collapse (reference ``bar/utils.py:263-329``)."""
    return P.merge_split_trades(_trades(spark, sf_dir))


# --- bar samplers + OHLCV ---------------------------------------------------

@query(
    "time_bars_1m",
    _TRADES
    + f""",
t AS (
  SELECT *, (CAST(floor(ts_ns / {MIN_NS}) AS BIGINT) + 1) * {MIN_NS} AS bar_close_ns
  FROM trades
)
"""
    + _OHLCV_SELECT.format(key="bar_close_ns"),
)
def time_bars_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-minute OHLCV time bars (reference ``logic.py:12-51`` +
    ``base.py:306-407``); non-empty bars only, close-time keyed."""
    df = B.with_time_bar(_trades(spark, sf_dir), MIN_NS)
    return _ohlcv_cols(B.bar_ohlcv(df, key="bar_close_ns"), "bar_close_ns")


@query(
    "tick_bars",
    _TRADES
    + f""",
t AS (
  SELECT *, CAST(floor((row_number() OVER (ORDER BY ts_ns, trade_id) - 1) / {TICK_N}) AS BIGINT) AS bar_id
  FROM trades
)
"""
    + _OHLCV_SELECT.format(key="bar_id"),
)
def tick_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-trade tick bars (reference ``logic.py:54-84``)."""
    df = B.with_tick_bar(_trades(spark, sf_dir), TICK_N, by=None)
    return _ohlcv_cols(B.bar_ohlcv(df, key="bar_id"), "bar_id")


@query(
    "dollar_bars",
    _TRADES
    + f""",
t AS (
  SELECT *, CAST(floor(sum(price * qty) OVER (ORDER BY ts_ns, trade_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / {DOLLAR_THR}) AS BIGINT) AS bar_id
  FROM trades
)
"""
    + _OHLCV_SELECT.format(key="bar_id"),
)
def dollar_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dollar-value bars, carry-over semantics (reference ``logic.py:118-149``)."""
    df = B.with_dollar_bar(_trades(spark, sf_dir), DOLLAR_THR, by=None)
    return _ohlcv_cols(B.bar_ohlcv(df, key="bar_id"), "bar_id")


@query(
    "volume_bars_approx",
    _TRADES
    + f""",
t AS (
  SELECT *, CAST(floor(sum(qty) OVER (ORDER BY ts_ns, trade_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / {VOLUME_THR}) AS BIGINT) AS bar_id
  FROM trades
)
"""
    + _OHLCV_SELECT.format(key="bar_id"),
)
def volume_bars_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume bars, cumsum-floor approximation (reference ``logic.py:87-115``;
    exact reset variant lives in ``functions.sequential``)."""
    df = B.with_volume_bar_approx(_trades(spark, sf_dir), VOLUME_THR, by=None)
    return _ohlcv_cols(B.bar_ohlcv(df, key="bar_id"), "bar_id")


# --- bar feature aggregations ----------------------------------------------

@query(
    "bar_directional_1m",
    _SIDED
    + f""",
t AS (
  SELECT *,
         (CAST(floor(ts_ns / {MIN_NS}) AS BIGINT) + 1) * {MIN_NS} AS bar_close_ns,
         CASE WHEN side <> lag(side) OVER (ORDER BY ts_ns, trade_id)
              THEN abs(price - lag(price) OVER (ORDER BY ts_ns, trade_id)) END AS flip_spread
  FROM sided
),
c AS (
  SELECT *,
         sum(CAST(side AS DOUBLE)) OVER wb AS cum_ticks,
         sum(side * qty) OVER wb AS cum_vol,
         sum(side * qty * price) OVER wb AS cum_dollar
  FROM t
  WINDOW wb AS (PARTITION BY bar_close_ns ORDER BY ts_ns, trade_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT bar_close_ns,
       CAST(sum(CASE WHEN side = 1 THEN 1.0 ELSE 0.0 END) AS BIGINT) AS ticks_buy,
       CAST(sum(CASE WHEN side = -1 THEN 1.0 ELSE 0.0 END) AS BIGINT) AS ticks_sell,
       sum(CASE WHEN side = 1 THEN qty ELSE 0.0 END) AS volume_buy,
       sum(CASE WHEN side = -1 THEN qty ELSE 0.0 END) AS volume_sell,
       sum(CASE WHEN side = 1 THEN qty * price ELSE 0.0 END) AS dollars_buy,
       sum(CASE WHEN side = -1 THEN qty * price ELSE 0.0 END) AS dollars_sell,
       coalesce(sum(flip_spread), 0.0) / count(*) AS mean_spread,
       coalesce(max(flip_spread), 0.0) AS max_spread,
       min(cum_ticks) AS cum_ticks_min,
       max(cum_ticks) AS cum_ticks_max,
       min(cum_vol) AS cum_volume_min,
       max(cum_vol) AS cum_volume_max,
       min(cum_dollar) AS cum_dollars_min,
       max(cum_dollar) AS cum_dollars_max
FROM c GROUP BY bar_close_ns
""",
)
def bar_directional_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional-flow bar features (reference ``base.py:409-546``).

    Deviation from the reference noted: spread pairs may straddle a bar
    boundary (attributed to the latter trade's bar)."""
    df = B.with_time_bar(_trades(spark, sf_dir), MIN_NS)
    return B.bar_directional_features_chunked(df, key="bar_close_ns")


@query(
    "bar_trade_size_1m",
    _TRADES
    + f""",
t AS (
  SELECT *, (CAST(floor(ts_ns / {MIN_NS}) AS BIGINT) + 1) * {MIN_NS} AS bar_close_ns
  FROM trades
)
SELECT bar_close_ns,
       ln(1 + avg(qty) / 3.0) AS mean_size_rel,
       ln(1 + quantile_cont(qty, 0.95) / 3.0) AS size_95_rel,
       sum(CASE WHEN qty > 3.0 THEN qty ELSE 0.0 END) / sum(qty) AS pct_block,
       1.0 - sum(qty * qty) / (sum(qty) * sum(qty)) AS size_gini
FROM t GROUP BY bar_close_ns
""",
)
def bar_trade_size_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade-size distribution features (reference ``base.py:549-612``),
    typical size θ=3 (mean of the synthetic qty), block threshold 1·θ."""
    df = B.with_time_bar(_trades(spark, sf_dir), MIN_NS)
    return B.bar_trade_size_features(df, typical_size=3.0, block_mult=1.0, key="bar_close_ns", by=None)
