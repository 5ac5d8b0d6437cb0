"""Structured Streaming surface (SURVEY.md §2.10).

The reference is batch-only; its "developing"/incremental kernels are
the state formulations we reuse here:

- time bars = event-time tumbling windows + watermark (late data beyond
  the watermark is dropped — the streaming analog of the reference's
  sorted-input assumption);
- information-driven sampling (CUSUM filter) = arbitrary stateful op via
  ``applyInPandasWithState`` with the same reset state machine as the
  batch kernel (``functions.sequential.cusum_filter_np`` semantics),
  state = (s_pos, s_neg, last_price) per symbol.

Batch/stream parity is tested by running the same input through both
paths (tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _ordered_batch(pdfs) -> pd.DataFrame:
    """Concatenate a group's Arrow chunks and sort ONCE by event time.

    A micro-batch larger than the Arrow batch size (default 10k rows)
    reaches the state function as SEVERAL chunks; sorting each chunk
    independently would feed the sequential state machines out-of-order
    rows at chunk boundaries (diverging from the batch kernels). Memory:
    buffers the group's micro-batch — the bound sequential semantics
    already imply. Returns an empty frame when the group has no rows."""
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return pd.DataFrame()
    out = pd.concat(chunks, ignore_index=True)
    # stable mergesort + id tiebreak: equal-timestamp rows must keep the
    # same deterministic order the batch kernels use (they disambiguate
    # by trade_id/event_id), or parity diverges under chunked arrival
    keys = ["ts_ns"] + [c for c in ("trade_id", "event_id") if c in out.columns]
    return out.sort_values(keys, kind="stable")


def streaming_time_bars(
    stream: DataFrame,
    interval: str = "1 minute",
    watermark: str = "5 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time tumbling OHLCV bars over a trades stream with columns
    (ts timestamp, price, qty[, symbol]). Emits one row per closed window
    in append mode once the watermark passes.

    open/close are min_by/max_by on the ns timestamp — deterministic
    under out-of-order arrival within the watermark."""
    by = ["symbol"] if "symbol" in stream.columns else []
    w = stream.withWatermark(ts_col, watermark)
    return w.groupBy(*by, F.window(ts_col, interval).alias("win")).agg(
        F.min_by("price", ts_col).alias("open"),
        F.max("price").alias("high"),
        F.min("price").alias("low"),
        F.max_by("price", ts_col).alias("close"),
        F.sum("qty").alias("volume"),
        (F.sum(F.col("price") * F.col("qty")) / F.sum("qty")).alias("vwap"),
        F.count("*").alias("trades"),
    )


def streaming_sessions(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Event-time session windows per symbol (native ``session_window``):
    the streaming form of the batch gaps-and-islands sessionization
    (``suite.multiuser_suite.user_sessions``). A session closes when no
    event arrives within ``gap``; late data beyond the watermark drops.
    """
    w = stream.withWatermark(ts_col, watermark)
    return w.groupBy("symbol", F.session_window(ts_col, gap).alias("win")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("price") * F.col("qty")).alias("session_value"),
    )


VB_STATE_SCHEMA = "cum double, bar_id long"
VB_OUT_SCHEMA = "symbol string, ts long, bar_id long"


def streaming_volume_bars(stream: DataFrame, threshold: float) -> DataFrame:
    """Stateful exact-reset volume bar assignment per symbol — the
    streaming form of ``sequential.volume_bar_ids_exact`` (information-
    driven sampling as an arbitrary stateful op, SURVEY §2.10). State =
    (running volume, bar counter), carried across micro-batches."""

    def fn(key, pdfs, state: GroupState):
        cum, bar = state.get if state.exists else (0.0, 0)
        rows = []
        pdf = _ordered_batch(pdfs)
        if len(pdf):
            for ts, qty in zip(pdf["ts_ns"], pdf["qty"]):
                cum += qty
                rows.append((key[0], int(ts), int(bar)))
                if cum >= threshold:
                    bar += 1
                    cum = 0.0
        state.update((cum, bar))
        yield pd.DataFrame(rows, columns=["symbol", "ts", "bar_id"])

    return stream.groupBy("symbol").applyInPandasWithState(
        fn,
        outputStructType=VB_OUT_SCHEMA,
        stateStructType=VB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


IB_STATE_SCHEMA = "theta double, expected double, bar_id long"
IB_OUT_SCHEMA = "symbol string, ts long, bar_id long"


def streaming_imbalance_bars(
    stream: DataFrame, ewma_span: float = 100.0, init_expected: float = 100.0
) -> DataFrame:
    """Stateful volume-imbalance bar assignment per symbol — the
    streaming form of ``sequential.imbalance_bar_ids`` (AFML §2.3.2.1,
    beyond-reference): close a bar when |Σ signed volume| exceeds the
    EWMA-adaptive expected imbalance. State = (theta, expected, bar),
    carried across micro-batches; identical recurrence to the batch
    kernel, so batch/stream parity is exact on ordered input."""
    alpha = 2.0 / (ewma_span + 1.0)

    def fn(key, pdfs, state: GroupState):
        theta, expected, bar = (
            state.get if state.exists else (0.0, float(init_expected), 0)
        )
        rows = []
        pdf = _ordered_batch(pdfs)
        if len(pdf):
            for ts, side, qty in zip(pdf["ts_ns"], pdf["side"], pdf["qty"]):
                theta += side * qty
                rows.append((key[0], int(ts), int(bar)))
                if abs(theta) >= expected:
                    expected = (1 - alpha) * expected + alpha * abs(theta)
                    theta = 0.0
                    bar += 1
        state.update((theta, expected, bar))
        yield pd.DataFrame(rows, columns=["symbol", "ts", "bar_id"])

    return stream.groupBy("symbol").applyInPandasWithState(
        fn,
        outputStructType=IB_OUT_SCHEMA,
        stateStructType=IB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RB_STATE_SCHEMA = "buy double, sell double, expected double, bar_id long"


def streaming_run_bars(
    stream: DataFrame, ewma_span: float = 100.0, init_expected: float = 100.0
) -> DataFrame:
    """Stateful volume-run bar assignment per symbol — the streaming form
    of ``sequential.run_bar_ids`` (AFML §2.3.2.2): close when the max
    one-sided cumulative volume exceeds the EWMA-adaptive expected run."""
    alpha = 2.0 / (ewma_span + 1.0)

    def fn(key, pdfs, state: GroupState):
        buy, sell, expected, bar = (
            state.get if state.exists else (0.0, 0.0, float(init_expected), 0)
        )
        rows = []
        pdf = _ordered_batch(pdfs)
        if len(pdf):
            for ts, side, qty in zip(pdf["ts_ns"], pdf["side"], pdf["qty"]):
                if side > 0:
                    buy += qty
                else:
                    sell += qty
                rows.append((key[0], int(ts), int(bar)))
                run = max(buy, sell)
                if run >= expected:
                    expected = (1 - alpha) * expected + alpha * run
                    buy = sell = 0.0
                    bar += 1
        state.update((buy, sell, expected, bar))
        yield pd.DataFrame(rows, columns=["symbol", "ts", "bar_id"])

    return stream.groupBy("symbol").applyInPandasWithState(
        fn,
        outputStructType=IB_OUT_SCHEMA,
        stateStructType=RB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LATE_STATE_SCHEMA = "max_ts long, n_total long, n_late_total long"
LATE_OUT_SCHEMA = (
    "symbol string, batch_max_ts_ns long, n_rows long, n_out_of_order long, "
    "n_late long, n_late_total long, max_lag_ns long"
)


def streaming_late_data_metrics(
    stream: DataFrame, lateness_ns: int, ts_col: str = "ts_ns"
) -> DataFrame:
    """Dropped-late / watermark-lag metrics stream (SURVEY §2.10) — the
    streaming analog of the reference's timestamp-order and gap integrity
    report (``data_model.py:294-324``).

    Emits one row per (symbol, micro-batch):

    - ``n_out_of_order``: rows behind the running per-symbol max event
      time (any regression — the reference's out-of-order count);
    - ``n_late`` / ``n_late_total``: rows more than ``lateness_ns``
      behind it — exactly the rows a downstream watermarked aggregation
      with the matching delay would silently drop, surfaced instead of
      lost;
    - ``max_lag_ns``: worst observed event-time regression, for sizing
      the watermark.

    Run it as a second sink next to ``streaming_time_bars`` (same source,
    two queries): the bar query keeps its exactly-once append output, and
    this one makes the drop behavior observable. State per symbol is three
    scalars, so the operator adds no meaningful state pressure."""
    import numpy as np

    def fn(key, pdfs, state: GroupState):
        max_ts, n_total, n_late_total = state.get if state.exists else (-(2**62), 0, 0)
        n_rows = n_ooo = n_late = 0
        batch_max = max_ts
        max_lag = 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = pdf[ts_col].to_numpy(dtype=np.int64)
            # running max INCLUDING earlier rows of this batch: prefix
            # cummax seeded with the carried state
            run_max = np.maximum.accumulate(np.concatenate(([max_ts], ts)))[:-1]
            lag = run_max - ts
            n_rows += len(ts)
            n_ooo += int((lag > 0).sum())
            n_late += int((lag > lateness_ns).sum())
            max_lag = max(max_lag, int(lag.max()) if len(lag) else 0)
            max_ts = max(max_ts, int(ts.max()))
            batch_max = max_ts
        n_total += n_rows
        n_late_total += n_late
        state.update((max_ts, n_total, n_late_total))
        yield pd.DataFrame(
            [
                (
                    key[0],
                    int(batch_max),
                    int(n_rows),
                    int(n_ooo),
                    int(n_late),
                    int(n_late_total),
                    int(max_lag),
                )
            ],
            columns=[
                "symbol",
                "batch_max_ts_ns",
                "n_rows",
                "n_out_of_order",
                "n_late",
                "n_late_total",
                "max_lag_ns",
            ],
        )

    return stream.groupBy("symbol").applyInPandasWithState(
        fn,
        outputStructType=LATE_OUT_SCHEMA,
        stateStructType=LATE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_STATE_SCHEMA = "sp double, sn double, last_price double"
CUSUM_OUT_SCHEMA = "symbol string, ts long, flag int"


def streaming_cusum_filter(stream: DataFrame, threshold: float) -> DataFrame:
    """Stateful symmetric CUSUM event filter per symbol
    (``applyInPandasWithState``): exactly the batch reset recurrence,
    carried across micro-batches in GroupState."""

    def fn(
        key: tuple, pdfs: Any, state: GroupState
    ):
        sp, sn, last = state.get if state.exists else (0.0, 0.0, float("nan"))
        rows = []
        pdf = _ordered_batch(pdfs)
        if len(pdf):
            for ts, price in zip(pdf["ts_ns"], pdf["price"]):
                if last == last and last > 0:  # not NaN
                    import math

                    r = math.log(price / last)
                    sp = max(0.0, sp + r)
                    sn = min(0.0, sn + r)
                    # reference order/strictness (filters.py:48-55)
                    if sn < -threshold:
                        rows.append((key[0], int(ts), 1))
                        sn = 0.0
                    elif sp > threshold:
                        rows.append((key[0], int(ts), 1))
                        sp = 0.0
                last = price
        state.update((sp, sn, last))
        yield pd.DataFrame(rows, columns=["symbol", "ts", "flag"])

    return stream.groupBy("symbol").applyInPandasWithState(
        fn,
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CB_STATE_SCHEMA = (
    "V double, V2 double, Sy double, Syy double, prev_t long, "
    "last_price double, sp double, sn double, last_sig double, bar_id long"
)
CB_OUT_SCHEMA = "symbol string, ts long, bar_id long"


def streaming_cusum_bars(
    stream: DataFrame,
    mult: float = 3.0,
    floor_thr: float = 1e-4,
    halflife_ns: float = 1_800_000_000_000.0,
) -> DataFrame:
    """Stateful CUSUM *bar* assignment with the EWMST-adaptive threshold
    — the streaming form of ``sequential.cusum_bar_ids`` fed by
    ``sequential.ewmst`` (reference ``bar/logic.py:152-221``: threshold
    = max(mult·σ_t, floor), σ_t a time-decay EW std of log returns,
    NaN σ carries the last valid value; the triggering row closes its
    own bar). This was the last §2.10 asymmetry: batch covered the
    adaptive-threshold indexer but streaming only had the constant-
    threshold CUSUM *filter*.

    State per symbol = the full EWMST recurrence (V, V2, Sy, Syy,
    prev_t — O(1) per row, irregular Δt handled by the closed-form
    decay) + the CUSUM machine (sp, sn, carried σ, bar counter) + the
    previous price for the log return — all scalars, so the state row
    is bounded regardless of stream length. Bit-identical to running
    the batch kernels over the concatenated micro-batches in arrival
    order (parity-tested in tests/test_streaming.py)."""
    import math

    lam = math.log(2.0) / halflife_ns

    def fn(key: tuple, pdfs: Any, state: GroupState):
        if state.exists:
            V, V2, Sy, Syy, prev_t, last_price, sp, sn, last_sig, bar = state.get
        else:
            V = V2 = Sy = Syy = 0.0
            prev_t = -1
            last_price = float("nan")
            sp = sn = 0.0
            last_sig = floor_thr
            bar = 0
        rows = []
        pdf = _ordered_batch(pdfs)
        if len(pdf):
            for ts, price in zip(pdf["ts_ns"], pdf["price"]):
                r = (
                    math.log(price / last_price)
                    if last_price == last_price and last_price > 0
                    else float("nan")
                )
                last_price = price
                # EWMST update (sequential.ewmst): NaN return leaves the
                # state untouched and re-emits the previous sigma
                sig_val = float("nan")
                if r == r:
                    d = 1.0 if prev_t < 0 else math.exp(-lam * (ts - prev_t))
                    V = 1.0 + d * V
                    V2 = 1.0 + d * d * V2
                    Sy = r + d * Sy
                    Syy = r * r + d * Syy
                    prev_t = int(ts)
                    if V * V > V2:
                        m = Sy / V
                        var = max(Syy / V - m * m, 0.0) * (V * V) / (V * V - V2)
                        sig_val = math.sqrt(var)
                # CUSUM machine (sequential.cusum_bar_ids): NaN sigma
                # carries the last valid one
                if sig_val == sig_val:
                    sig = sig_val
                    last_sig = sig_val
                else:
                    sig = last_sig
                thr = max(mult * sig, floor_thr)
                x = 0.0 if r != r else r
                sp = max(0.0, sp + x)
                sn = min(0.0, sn + x)
                rows.append((key[0], int(ts), int(bar)))
                if sp >= thr or sn <= -thr:
                    sp = sn = 0.0
                    bar += 1
        state.update((V, V2, Sy, Syy, prev_t, last_price, sp, sn, last_sig, bar))
        yield pd.DataFrame(rows, columns=["symbol", "ts", "bar_id"])

    return stream.groupBy("symbol").applyInPandasWithState(
        fn,
        outputStructType=CB_OUT_SCHEMA,
        stateStructType=CB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_STATE_SCHEMA = "t1 long, t2 long, t3 long"
FUNNEL_OUT_SCHEMA = "user_id long, t1 long, t2 long, t3 long"


def streaming_funnel(
    stream: DataFrame, steps: tuple = ("view", "click", "purchase")
) -> DataFrame:
    """Stateful first-touch funnel per user — the streaming form of the
    batch ``event_funnel`` (suite.multiuser_suite): the state machine
    advances a stage when the NEXT step's event arrives strictly after
    the previous stage's first-touch time, exactly the batch
    min-after-min semantics under in-order delivery (the same ordered
    contract as the sequential bar state machines; `_ordered_batch`
    restores order within a micro-batch, cross-batch late data is the
    documented watermark tradeoff). State per user = 3 int64 epoch-ns
    times (-1 = stage not reached), emitted each micro-batch the user
    appears in (update mode) — the stages only ever advance, so a
    max-per-user read of the sink gives the final funnel."""

    def fn(key, pdfs, state: GroupState):
        t1, t2, t3 = state.get if state.exists else (-1, -1, -1)
        pdf = _ordered_batch(pdfs)
        if len(pdf):
            for ts, et in zip(pdf["ts_ns"], pdf["event_type"]):
                ts = int(ts)
                if et == steps[0]:
                    if t1 < 0:
                        t1 = ts
                elif et == steps[1]:
                    if t1 >= 0 and ts > t1 and t2 < 0:
                        t2 = ts
                elif et == steps[2]:
                    if t2 >= 0 and ts > t2 and t3 < 0:
                        t3 = ts
        state.update((t1, t2, t3))
        yield pd.DataFrame(
            [(key[0], t1, t2, t3)], columns=["user_id", "t1", "t2", "t3"]
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def bars_store_sink(
    bars: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "win",
):
    """Wire a streaming bar frame (``streaming_time_bars`` output) into
    the incremental bar store: every micro-batch upserts into the
    monthly-partitioned parquet via ``bars_io.upsert_time_bars``.

    Run the stream in UPDATE output mode: each micro-batch emits the
    windows it changed, and the upsert's batch-wins-per-bar-key merge
    means the store always converges to the final aggregate — a window
    updated across five micro-batches is rewritten five times in its
    monthly partition and ends bit-equal to the batch build. Because
    the upsert is idempotent, a replayed micro-batch after a restart
    (or a re-run with a fresh checkpoint over the same source) cannot
    duplicate or corrupt bars — end-to-end effectively-once without a
    transactional table format. Work per micro-batch scales with the
    months the batch touches (for live ingest: one).

    Returns the started ``StreamingQuery``; callers await it. The
    ``win`` struct column is flattened to the store's canonical
    ``bar_close_ns`` long key."""
    from ..sources.bars_io import upsert_time_bars

    flat = bars.withColumn(
        "bar_close_ns", F.unix_micros(F.col(ts_col)["end"]) * F.lit(1000)
    ).drop(ts_col)

    def _sink(df: DataFrame, epoch_id: int) -> None:
        upsert_time_bars(df, path)

    return (
        flat.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
