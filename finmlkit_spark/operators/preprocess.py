"""Trades preprocessing operators (SURVEY.md §2.2).

Parity targets (reference, behavior only — implementation is Spark-native):
- timestamp normalize/unit-inference/resolution: ``data_model.py:346-418,370-388``
- sort + dedup + integrity/gap checks: ``data_model.py:254-324``
- split-trade merge: ``bar/utils.py:263-329``
- tick-rule trade side: ``bar/utils.py:10-46``
- tick-size (GCD) inference: ``bar/utils.py:49-81``

All operators are narrow projections or single-shuffle window/agg ops and
take an optional ``by`` (symbol) column so they parallelize across
symbols at scale; the global-stream form (by=None) uses a single ordered
window, which is fine for per-symbol slices but should not be used on an
unpartitioned 100 TB stream.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NS_PER = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}


def _w(by: str | None):
    w = Window.partitionBy(by) if by else Window.partitionBy(F.lit(1))
    return w.orderBy("ts_ns", "trade_id")


def infer_time_unit(df: DataFrame, col: str = "ts_ns") -> str:
    """Magnitude heuristic over max(ts) (reference ``data_model.py:399-418``).

    One scalar agg to the driver — the only collect in the pipeline.
    """
    mx = df.agg(F.max(col).alias("m")).collect()[0]["m"]
    if mx is None:
        return "ns"
    if mx > 1e17:
        return "ns"
    if mx > 1e14:
        return "us"
    if mx > 1e11:
        return "ms"
    return "s"


def normalize_timestamps(df: DataFrame, col: str = "ts_ns", unit: str | None = None) -> DataFrame:
    """Any epoch unit -> int64 nanoseconds (``data_model.py:346-368``)."""
    unit = unit or infer_time_unit(df, col)
    return df.withColumn(col, (F.col(col) * F.lit(NS_PER[unit])).cast("long"))


def round_resolution(df: DataFrame, col: str = "ts_ns", resolution: str = "ms") -> DataFrame:
    """Floor ts to ms/us resolution (``data_model.py:370-388``)."""
    k = NS_PER[resolution]
    return df.withColumn(col, (F.col(col) - (F.col(col) % F.lit(k))).cast("long"))


def sort_trades(df: DataFrame, by: str | None = "symbol") -> DataFrame:
    """Chronological order, trade_id tiebreak (``bar/utils.py:239-260``).

    At scale: range-partition by time within symbol so downstream
    per-partition ops see locally sorted data.
    """
    cols = ([by] if by else []) + ["ts_ns", "trade_id"]
    return df.orderBy(*cols)


def dedup_trades(df: DataFrame, key: str = "trade_id") -> DataFrame:
    """Drop duplicate trade ids, keep first (``data_model.py:308-313``)."""
    return df.dropDuplicates([key])


def integrity_report(df: DataFrame, by: str | None = "symbol", max_gap_ns: int = 60_000_000_000) -> DataFrame:
    """Id-gap + time-gap report per symbol (``data_model.py:254-292``).

    Returns one row per symbol: n_rows, n_id_gaps, missing_ids,
    missing_pct, n_time_gaps (> max_gap_ns), max_time_gap_ns.
    """
    w = _w(by)
    g = df.select(
        *( [by] if by else [] ),
        "ts_ns",
        "trade_id",
        (F.col("trade_id") - F.lag("trade_id").over(w)).alias("id_diff"),
        (F.col("ts_ns") - F.lag("ts_ns").over(w)).alias("ts_diff"),
    )
    keys = [by] if by else []
    return g.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("id_diff") > 1, 1).otherwise(0)).cast("long").alias("n_id_gaps"),
        F.sum(F.when(F.col("id_diff") > 1, F.col("id_diff") - 1).otherwise(0)).cast("long").alias("missing_ids"),
        F.sum(F.when(F.col("ts_diff") > max_gap_ns, 1).otherwise(0)).cast("long").alias("n_time_gaps"),
        F.max("ts_diff").alias("max_time_gap_ns"),
    )


def merge_split_trades(df: DataFrame, use_side: bool = False) -> DataFrame:
    """Collapse rows with equal (ts, price[, side]) summing qty
    (``bar/utils.py:263-329``).

    The reference only merges *adjacent* rows, but its input is ts-sorted
    so equal keys are always adjacent — a plain groupBy is equivalent and
    shuffle-parallel. trade_id keeps the min (first) id.
    """
    keys = ["symbol", "ts_ns", "price"] + (["side"] if use_side else [])
    return df.groupBy(*keys).agg(
        F.min("trade_id").alias("trade_id"),
        F.sum("qty").alias("qty"),
    )


def with_trade_side(df: DataFrame, by: str | None = "symbol") -> DataFrame:
    """Tick rule: sign(Δprice), carry previous side when Δ=0
    (``bar/utils.py:10-46``); first trade defaults to +1.
    """
    w = _w(by)
    raw = F.signum(F.col("price") - F.lag("price").over(w))
    carried = F.last(F.when(raw != 0, raw), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("side", F.coalesce(carried, F.lit(1.0)).cast("int"))


def with_trade_side_chunked(df: DataFrame, chunk_rows: int = 1 << 18) -> DataFrame:
    """Tick-rule side for a SINGLE un-partitioned stream without the
    global window that ``with_trade_side(by=None)`` plans as an
    ``Exchange SinglePartition``.

    Chunk-partitioned evaluation (``functions.chunked_window``): the
    sign(Δprice) lag is exact via 1-row warmup duplication; the carry of
    the last nonzero sign crosses chunks through a per-chunk summary
    (last nonzero sign per chunk — k rows for k chunks) prefix-joined
    back, so every row's side equals the global form bit-for-bit
    (signs are exact −1/0/+1 integers; no float accumulation).
    Multi-symbol data should keep using ``with_trade_side(by='symbol')``
    — hash partitioning is cheaper than chunk machinery.
    """
    from ..functions import chunked_window as CW

    d, _ = chunked_side_frame(df, chunk_rows=chunk_rows)
    return CW.finish(d).drop("_raw", "_cin", "_carry")


def chunked_side_frame(df: DataFrame, chunk_rows: int = 1 << 18):
    """Internal: chunked frame with ``side`` plus the chunk helper
    columns still attached, and the per-chunk WindowSpec — for callers
    that stack more warmup-1 window expressions (e.g.
    ``bars.bar_directional_features_chunked``'s flip spreads) before
    dropping the warm duplicates. Warm rows carry their exact side (a
    nonzero boundary sign is in the prior chunk's carry summary), so a
    lag over them is exact on every real row."""
    from ..functions import chunked_window as CW

    d = CW.with_row_chunks(
        df, "ts_ns", warmup=1, chunk_rows=chunk_rows, tiebreak_cols=("trade_id",)
    )
    w = CW.chunk_window("ts_ns", "trade_id")
    d = d.withColumn("_raw", F.signum(F.col("price") - F.lag("price").over(w)))
    d = d.withColumn(
        "_cin",
        F.last(F.when(F.col("_raw") != 0, F.col("_raw")), ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # last nonzero sign per chunk (warm duplicates excluded: their _raw is
    # null in the target chunk and they already count in their own chunk)
    summ = (
        d.where(~F.col(CW.WARM) & (F.col("_raw") != 0))
        .groupBy(CW.CHUNK)
        .agg(F.max_by("_raw", CW.GLOBAL_RN).alias("_lastnz"))
    )
    # carry into chunk k = last nonzero sign of the latest prior chunk
    # that has one (triangular join over the tiny chunk table)
    chunks = d.select(F.col(CW.CHUNK)).distinct()
    carry = (
        chunks.join(
            summ.select(F.col(CW.CHUNK).alias("_ckb"), "_lastnz"),
            F.col("_ckb") < F.col(CW.CHUNK),
            "left",
        )
        .groupBy(CW.CHUNK)
        .agg(F.max_by("_lastnz", "_ckb").alias("_carry"))
    )
    d = d.join(F.broadcast(carry), CW.CHUNK)
    side = F.coalesce(F.col("_cin"), F.col("_carry"), F.lit(1.0)).cast("int")
    return d.withColumn("side", side), w


def infer_tick_size(df: DataFrame, sample: int = 10_000) -> float:
    """Tick = GCD of unique price diffs over a head sample
    (``bar/utils.py:49-81``). Scalar config value -> driver side.
    """
    rows = df.select("price").limit(sample).collect()
    prices = sorted({r["price"] for r in rows})
    if len(prices) < 2:
        return 0.01
    # quantize to 1e-9 to GCD in integer space
    diffs = [round((b - a) * 1e9) for a, b in zip(prices, prices[1:]) if b > a]
    g = 0
    for d in diffs:
        g = math.gcd(g, d)
    return g / 1e9 if g else 0.01


def time_slice(df: DataFrame, start_ns: int | None, end_ns: int | None) -> DataFrame:
    """View-range filter (``data_model.py:212-243``) — pushed-down predicate."""
    if start_ns is not None:
        df = df.where(F.col("ts_ns") >= start_ns)
    if end_ns is not None:
        df = df.where(F.col("ts_ns") <= end_ns)
    return df
