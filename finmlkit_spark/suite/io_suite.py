"""Storage-layer queries (SURVEY.md §2.1): bar re-aggregation (the
materialized-table read path) + the store inspector, plus the weak-check
CUSUM bar sampler (§2.3 parity)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..functions import sequential as S
from ..sources import bars_io as IO
from ..sources.trades import EVENTS_TRADES_CTE, events_to_trades
from ._registry import query
from .features_suite import _B, MIN_NS, bars_1m

Q15_NS = 900_000_000_000


@query(
    "bars_resample_15m",
    _B
    + f""",
bm AS (
  SELECT b.*, t2.med FROM b JOIN (
    SELECT bar_close_ns, median(qty) AS med FROM t GROUP BY bar_close_ns
  ) t2 USING (bar_close_ns)
),
ck AS (
  SELECT *, (CAST(floor((bar_close_ns - 1) / {Q15_NS}) AS BIGINT) + 1) * {Q15_NS} AS c
  FROM bm
),
cw AS (
  SELECT *,
         sum(trades) OVER (PARTITION BY c ORDER BY med, bar_close_ns
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         sum(trades) OVER (PARTITION BY c) AS totw
  FROM ck
)
SELECT c AS bar_close_ns,
       arg_min(open, cw.bar_close_ns) AS open,
       max(high) AS high,
       min(low) AS low,
       arg_max(close, cw.bar_close_ns) AS close,
       sum(volume) AS volume,
       CAST(sum(trades) AS BIGINT) AS trades,
       sum(vwap * volume) / (CASE WHEN sum(volume) > 0 THEN sum(volume) END) AS vwap,
       min(CASE WHEN cumw * 2 >= totw THEN med END) AS med_wm
FROM cw GROUP BY c""",
)
def bars_resample_15m(spark, sf_dir):
    """Re-aggregate the materialized 1m bars to 15m (TimeBarReader
    ``_resample`` ``io.py:890-950``): volume-weighted vwap recombination
    + the reference's exact trade-count-weighted median (sort+cumsum)."""
    fine = bars_1m(spark, sf_dir).drop("brn", "r", "first_ts_ns")
    # attach the per-fine-bar median trade size (as the reference stores)
    from ..operators import bars as B
    from ..sources.trades import events_to_trades

    tr = events_to_trades(spark, sf_dir)
    med = (
        B.with_time_bar(tr, MIN_NS)
        .groupBy("bar_close_ns")
        .agg(F.median("qty").alias("med"))
    )
    fine = fine.join(med, "bar_close_ns")
    out = IO.resample_bars(fine, Q15_NS, median_col="med")
    return out.withColumnRenamed("med_wm", "med_wm")


@query(
    "store_inspector",
    "WITH "
    + EVENTS_TRADES_CTE.strip()
    + """,
m AS (
  SELECT *, strftime(DATE '1970-01-01'
           + CAST(floor(ts_ns / 86400000000000) AS BIGINT) * INTERVAL 1 DAY, '%Y-%m') AS year_month
  FROM trades
),
g AS (
  SELECT *, ts_ns - lag(ts_ns) OVER (PARTITION BY year_month ORDER BY ts_ns) AS gap
  FROM m
)
SELECT year_month,
       count(*) AS n_rows,
       min(ts_ns) AS first_ts_ns,
       max(ts_ns) AS last_ts_ns,
       max(gap) AS max_gap_ns,
       CAST(sum(CASE WHEN gap > 3600000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps
FROM g GROUP BY year_month""",
)
def store_inspector_q(spark, sf_dir):
    """Partition metadata report (H5Inspector analog ``io.py:35-308``)."""
    tr = events_to_trades(spark, sf_dir)
    return IO.store_inspector(tr, "ts_ns")


@query("seq_cusum_bars")  # adaptive-threshold state machine -> rows-only check
def seq_cusum_bars(spark, sf_dir):
    """CUSUM bar sampler with adaptive threshold max(mult·σ, floor)
    (reference ``logic.py:152-221``); σ = time-decay EW std of 1m log
    returns. Golden-tested in tests/test_sequential_kernels.py."""
    bars = bars_1m(spark, sf_dir)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        r = pdf["r"].to_numpy()
        sigma = S.ewmst(pdf["bar_close_ns"].to_numpy(), r, 30 * 60_000_000_000)
        ids = S.cusum_bar_ids(r, sigma, mult=5.0, floor_thr=0.5)
        return pd.DataFrame({"bar_close_ns": pdf["bar_close_ns"], "bar_id": ids})

    return S.apply_sequential(
        bars, kernel, "bar_close_ns long, bar_id long", order=("bar_close_ns",)
    )
