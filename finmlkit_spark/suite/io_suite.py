"""Storage-layer queries (SURVEY.md §2.1): bar re-aggregation (the
materialized-table read path) + the store inspector, plus the CUSUM bar
sampler (§2.3 parity; exact recursive-CTE oracle on hourly bars)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ..functions import sequential as S
from ..sources import bars_io as IO
from ..sources.trades import EVENTS_TRADES_CTE, events_to_trades
from ._registry import query
from .features_suite import _B, MIN_NS, bars_1m
from .sequential_suite import _BH

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


_CB_HL_NS = 30 * 60_000_000_000
_CB_LAM = __import__("math").log(2.0) / _CB_HL_NS
_CB_MULT = 5.0
_CB_FLOOR = 0.5


@query(
    "seq_cusum_bars",
    _BH.replace("WITH ", "WITH RECURSIVE ", 1)
    + f"""
, bm AS MATERIALIZED (SELECT brn, bar_close_ns, r FROM b),
rec AS (
  SELECT brn, bar_close_ns,
         CAST(0 AS BIGINT) AS bar_id,
         CAST(0.0 AS DOUBLE) AS v, CAST(0.0 AS DOUBLE) AS v2,
         CAST(0.0 AS DOUBLE) AS sy, CAST(0.0 AS DOUBLE) AS syy,
         CAST(NULL AS BIGINT) AS prev_t,
         CAST({_CB_FLOOR!r} AS DOUBLE) AS last_sig,
         CAST(0.0 AS DOUBLE) AS sp, CAST(0.0 AS DOUBLE) AS sn,
         CAST(0 AS BIGINT) AS nxt_bar
  FROM bm WHERE brn = 1
  UNION ALL
  SELECT nb.brn, nb.bar_close_ns,
         nb.out_bar AS bar_id,
         nv, nv2, nsy, nsyy, nprev_t, nlast_sig, nsp2, nsn2, nbar
  FROM (
    SELECT nb.*,
           CASE WHEN nb.r IS NULL THEN NULL
                WHEN rec.prev_t IS NULL THEN 1.0
                ELSE exp(-{_CB_LAM!r} * (nb.bar_close_ns - rec.prev_t)) END AS d,
           CASE WHEN nb.r IS NULL THEN rec.v ELSE 1.0 + d * rec.v END AS nv,
           CASE WHEN nb.r IS NULL THEN rec.v2 ELSE 1.0 + d * d * rec.v2 END AS nv2,
           CASE WHEN nb.r IS NULL THEN rec.sy ELSE nb.r + d * rec.sy END AS nsy,
           CASE WHEN nb.r IS NULL THEN rec.syy ELSE nb.r * nb.r + d * rec.syy END AS nsyy,
           CASE WHEN nb.r IS NULL THEN rec.prev_t ELSE nb.bar_close_ns END AS nprev_t,
           CASE WHEN nb.r IS NULL THEN NULL
                WHEN nv * nv > nv2
                THEN sqrt(greatest(nsyy / nv - (nsy / nv) * (nsy / nv), 0.0)
                          * (nv * nv) / (nv * nv - nv2))
                ELSE NULL END AS sigma,
           coalesce(sigma, rec.last_sig) AS nlast_sig,
           greatest({_CB_MULT!r} * nlast_sig, {_CB_FLOOR!r}) AS thr,
           coalesce(nb.r, 0.0) AS x,
           greatest(0.0, rec.sp + x) AS nsp,
           least(0.0, rec.sn + x) AS nsn,
           (nsp >= thr OR nsn <= -thr) AS trig,
           CASE WHEN trig THEN 0.0 ELSE nsp END AS nsp2,
           CASE WHEN trig THEN 0.0 ELSE nsn END AS nsn2,
           CASE WHEN trig THEN rec.nxt_bar + 1 ELSE rec.nxt_bar END AS nbar,
           rec.nxt_bar AS out_bar
    FROM rec JOIN bm nb ON nb.brn = rec.brn + 1
  ) nb
)
SELECT bar_close_ns, bar_id FROM rec""",
)
def seq_cusum_bars(spark, sf_dir):
    """CUSUM bar sampler with adaptive threshold max(mult·σ, floor)
    (reference ``logic.py:152-221``) on hourly bars; σ = time-decay EW
    std of log returns (halflife 30 min).

    The oracle is an exact WITH RECURSIVE replay carrying the full EWMST
    state (V, V2, Sy, Syy, prev_t) plus the CUSUM machine (sp, sn,
    last_sig, bar): exp/sqrt are bit-identical between glibc (Python
    kernel) and DuckDB, and every arithmetic step is written in the same
    order on both sides, so bar ids match exactly."""
    from .sequential_suite import bars_1h

    bars = bars_1h(spark, sf_dir)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        r = pdf["r"].to_numpy()
        sigma = S.ewmst(pdf["bar_close_ns"].to_numpy(), r, _CB_HL_NS)
        ids = S.cusum_bar_ids(r, sigma, mult=_CB_MULT, floor_thr=_CB_FLOOR)
        return pd.DataFrame({"bar_close_ns": pdf["bar_close_ns"], "bar_id": ids})

    return S.apply_sequential(
        bars, kernel, "bar_close_ns long, bar_id long", order=("bar_close_ns",)
    )
