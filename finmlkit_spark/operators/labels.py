"""Event sampling, Triple Barrier labeling, sample weights (SURVEY.md §2.7).

Behavior parity with the reference's ``finmlkit/label`` package
(``tbm.py:11-158``, ``kit.py:12-477``, ``weights.py:7-188``), expressed
Spark-first:

- triple barrier = bucketed range join (events × trades within the
  vertical-barrier horizon) + one conditional aggregation per event —
  no per-event Python loop, scales with the shuffle;
- concurrency/uniqueness = sweep-line: +1/−1 markers unioned into the
  trade stream, running-sum window, then an interval join back to the
  event spans;
- time decay / class balance = window cumsum + broadcast joins.

All operators take a ``by`` symbol column implicitly via the caller's
partitioning of events/trades (events for one symbol join that symbol's
trades); the range join is bucketed to bound fan-out at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .joins import range_join


def triple_barrier(
    events: DataFrame,
    trades: DataFrame,
    horizon_ns: int,
    pt_mult: float = 1.0,
    sl_mult: float = 1.0,
    bucket_ns: int | None = None,
) -> DataFrame:
    """Triple Barrier Method (reference ``tbm.py:11-158``).

    ``events``: (event_ts_ns, entry_price, target) — target is the
    log-return barrier half-width (e.g. a volatility estimate).
    Walks the price path in (event_ts, event_ts + horizon]: label +1 if
    the +pt_mult·target log-return barrier is touched first, −1 for the
    −sl_mult·target barrier, 0 if neither before the vertical barrier.

    Returns per event: label, touch_ts_ns (first crossing or last trade
    before the vertical barrier), touch_ret (log return at that point),
    and barrier_ratio = max |ret|/barrier reached (the reference's
    vertical-touch closeness weight, ``tbm.py:146-156``).
    """
    ev = events.select(
        F.col("event_id"),
        F.col("event_ts_ns"),
        F.col("entry_price"),
        F.col("target"),
        (F.col("event_ts_ns") + F.lit(horizon_ns)).alias("vert_ts_ns"),
    )
    j = range_join(
        ev, trades.select("ts_ns", "price"), "event_ts_ns", "vert_ts_ns", "ts_ns",
        bucket_ns=bucket_ns,
    )
    r = F.log(F.col("price") / F.col("entry_price"))
    up = F.col("target") * pt_mult
    dn = -F.col("target") * sl_mult
    agg = j.groupBy("event_id", "event_ts_ns", "entry_price", "target", "vert_ts_ns").agg(
        F.min(F.when(r >= up, F.col("ts_ns"))).alias("up_ts"),
        F.min(F.when(r <= dn, F.col("ts_ns"))).alias("dn_ts"),
        F.max("ts_ns").alias("last_ts"),
        F.max_by(r, "ts_ns").alias("last_ret"),
        F.min_by(r, F.when(r >= up, F.col("ts_ns"))).alias("up_ret"),
        F.min_by(r, F.when(r <= dn, F.col("ts_ns"))).alias("dn_ret"),
        F.max(F.abs(r)).alias("max_abs_ret"),
    )
    up_first = F.col("up_ts").isNotNull() & (
        F.col("dn_ts").isNull() | (F.col("up_ts") <= F.col("dn_ts"))
    )
    dn_first = F.col("dn_ts").isNotNull() & (
        F.col("up_ts").isNull() | (F.col("dn_ts") < F.col("up_ts"))
    )
    touch_ret_expr = (
        F.when(up_first, F.col("up_ret"))
        .when(dn_first, F.col("dn_ret"))
        .otherwise(F.col("last_ret"))
    )
    return agg.select(
        "event_id",
        "event_ts_ns",
        F.when(up_first, 1).when(dn_first, -1).otherwise(0).alias("label"),
        # reference labeling (tbm.py:118-121): sign of the terminal return
        # (vertical touches get the sign of the return at t1; 0 -> +1)
        F.when(F.signum(touch_ret_expr) != 0, F.signum(touch_ret_expr))
        .otherwise(F.lit(1.0))
        .cast("int")
        .alias("label_sign"),
        F.when(up_first, F.col("up_ts"))
        .when(dn_first, F.col("dn_ts"))
        .otherwise(F.col("last_ts"))
        .alias("touch_ts_ns"),
        F.when(up_first, F.col("up_ret"))
        .when(dn_first, F.col("dn_ret"))
        .otherwise(F.col("last_ret"))
        .alias("touch_ret"),
        (F.col("max_abs_ret") / (F.col("target") * F.lit(max(pt_mult, sl_mult)))).alias(
            "barrier_ratio"
        ),
    )


def concurrency(spans: DataFrame, trades: DataFrame) -> DataFrame:
    """c(t): number of open event spans at each trade ts (sweep line,
    reference ``weights.py:7-49``). ``spans``: (event_ts_ns, touch_ts_ns).

    Markers sort before trades at equal ts, so a span [s, e] is active for
    trades with s <= t <= e.
    """
    markers = spans.select(
        F.col("event_ts_ns").alias("ts_ns"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select((F.col("touch_ts_ns") + 1).alias("ts_ns"), F.lit(-1).alias("delta"))
    ).withColumn("prio", F.lit(0))
    tr = trades.select("ts_ns").withColumn("delta", F.lit(0)).withColumn("prio", F.lit(1))
    u = markers.unionByName(tr)
    w = Window.orderBy("ts_ns", "prio").rowsBetween(Window.unboundedPreceding, 0)
    c = u.withColumn("c", F.sum("delta").over(w))
    return c.where(F.col("prio") == 1).select("ts_ns", "c")


def average_uniqueness(spans: DataFrame, trades_c: DataFrame, bucket_ns: int | None = None) -> DataFrame:
    """Per-event mean(1/c) over its span (reference ``weights.py:7-49``)."""
    j = range_join(
        spans.withColumn("start_excl", F.col("event_ts_ns") - 1),
        trades_c,
        "start_excl",
        "touch_ts_ns",
        "ts_ns",
        bucket_ns=bucket_ns,
    )
    return j.groupBy("event_id", "event_ts_ns").agg(
        F.avg(F.lit(1.0) / F.col("c")).alias("uniqueness")
    )


def return_attribution(
    spans: DataFrame, trades_rc: DataFrame, normalize: bool = False, bucket_ns: int | None = None
) -> DataFrame:
    """|Σ r_t / c_t| over the span (reference ``weights.py:52-103``).
    ``trades_rc``: (ts_ns, r, c) — per-trade log return and concurrency.
    """
    j = range_join(
        spans.withColumn("start_excl", F.col("event_ts_ns") - 1),
        trades_rc,
        "start_excl",
        "touch_ts_ns",
        "ts_ns",
        bucket_ns=bucket_ns,
    )
    out = j.groupBy("event_id", "event_ts_ns").agg(
        F.abs(F.sum(F.col("r") / F.col("c"))).alias("attribution")
    )
    if normalize:
        n = out.count()
        tot = out.agg(F.sum("attribution")).collect()[0][0]
        out = out.withColumn("attribution", F.col("attribution") * F.lit(n / tot))
    return out


def time_decay(events_u: DataFrame, last_weight: float = 0.5) -> DataFrame:
    """Linear decay on cumulative uniqueness, newest weight 1.0, oldest
    ``last_weight`` (∈ [−1,1]), clipped at 0 (reference ``weights.py:106-142``)."""
    w = Window.orderBy("event_ts_ns", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    df = events_u.withColumn("cum_u", F.sum("uniqueness").over(w))
    tot = df.agg(F.sum("uniqueness").alias("tot_u"))
    df = df.crossJoin(F.broadcast(tot))
    decay = F.lit(last_weight) + (1.0 - last_weight) * F.col("cum_u") / F.col("tot_u")
    return df.select(
        "event_id", "event_ts_ns", F.greatest(decay, F.lit(0.0)).alias("decay_weight")
    )


def class_balance_weights(labeled: DataFrame, weight_col: str = "w") -> DataFrame:
    """Per-class weight = total/(n_classes·Σw_class), applied to each event
    (reference ``weights.py:146-188``). Class table is tiny -> broadcast.
    """
    per_class = labeled.groupBy("label").agg(F.sum(weight_col).alias("w_class"))
    tot = labeled.agg(
        F.sum(weight_col).alias("w_total"), F.countDistinct("label").alias("n_classes")
    )
    scaled = per_class.crossJoin(F.broadcast(tot)).select(
        "label",
        (F.col("w_total") / (F.col("n_classes") * F.col("w_class"))).alias("class_weight"),
    )
    return labeled.join(F.broadcast(scaled), "label").withColumn(
        "balanced_w", F.col(weight_col) * F.col("class_weight")
    )
