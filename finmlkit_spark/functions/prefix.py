"""Exclusive prefix aggregates over a small keyed table, scalably.

Several operators reduce cross-chunk state to a per-chunk summary table
(one row per time chunk / bucket) and then need, for every chunk, an
aggregate over all STRICTLY EARLIER chunks: running row-count offsets
(``chunked_window``), carried last-price / last-sign state
(``preprocess.chunked_side_frame``), running concurrency and sum offsets
(``labels.span_sweep``). Two naive forms each have a cliff:

- a global ``Window.orderBy(key)`` plans ``Exchange SinglePartition`` —
  the node the plan-regression guard bans;
- a triangular ``b.key < a.key`` self-join is O(k²) pairs — fine for
  k = days (~1e3), real work at an hourly grid over years (k ~ 1e5 →
  1e10 pairs, per the round-4 advisory).

Two modes, chosen by the caller's knowledge of k:

``group=None`` (flat): the single triangular broadcast join — THREE
plan ops, no sort, the cheapest shape. Callers whose chunk axis is
coarse by construction (daily buckets: k ≤ ~1e4 even over decades →
≤ 1e8 broadcast-filter evaluations, distributed) use this; measured at
sf0.1 the two-level form's extra exchange+sort stages cost ~0.2 s of
fixed scheduling per call, which dominates headline queries.

``group=g`` (two-level): rows get a coarse group ``floor(key / g)``; a
BOUNDED window partitioned by group (parallel, no SinglePartition)
produces the in-group prefix; per-group totals (k/g rows) go through
the triangular join — now O((k/g)²), ≤ 600 pairs at k = 1e5 with
g = 4096 — and broadcast back. Exact for any key distribution (gaps,
negatives); cost O(k·log g) + O((k/g)²). Callers with a FINE chunk axis
(hourly sweeps: ``labels.span_sweep``) use this.

In both modes the input table is referenced twice in the plan (totals +
probe side). All call sites feed either an already-persisted summary
table or a cheap aggregate, so no storage boundary is added here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _last_nonnull(val: Column, ordc: Column) -> Column:
    # max_by ignores rows whose ordering expression is null, so this is
    # "value at the largest key where value is non-null"
    return F.max_by(val, F.when(val.isNotNull(), ordc))


def _flat(
    df: DataFrame, key: str, sums: dict[str, str], lasts: dict[str, str]
) -> DataFrame:
    """Single triangular broadcast join: b.key < a.key pairs, one agg.
    Returns the (key, *outs) prefix table."""
    cols = sorted({*sums.values(), *lasts.values()})
    a = df.select(F.col(key))
    b = df.select(
        F.col(key).alias("_kb"), *[F.col(c).alias(f"_b_{c}") for c in cols]
    )
    aggs = [
        F.coalesce(F.sum(f"_b_{c}"), F.lit(0)).alias(out)
        for out, c in sums.items()
    ]
    aggs += [
        _last_nonnull(F.col(f"_b_{c}"), F.col("_kb")).alias(out)
        for out, c in lasts.items()
    ]
    return (
        a.join(F.broadcast(b), F.col("_kb") < F.col(key), "left")
        .groupBy(key)
        .agg(*aggs)
    )


def exclusive_prefix(
    df: DataFrame,
    key: str,
    sums: dict[str, str] | None = None,
    lasts: dict[str, str] | None = None,
    group: int | None = None,
) -> DataFrame:
    """Attach strictly-exclusive prefix aggregates to a keyed table.

    ``df`` must have ONE row per ``key`` (an integer chunk/bucket id).
    ``sums`` maps output column → input column: output = SUM of the
    input over all rows with a strictly smaller key (0 when none).
    ``lasts`` maps output column → input column: output = the input
    value on the largest strictly-smaller key where it is non-null
    (NULL when none) — the "carry state from the latest earlier chunk"
    pattern. Returns the PREFIX TABLE ``(key, *outputs)`` — callers
    join it back (broadcast) wherever they need it, which keeps the
    input referenced exactly twice in the plan (the a/b probe sides).

    ``group=None`` → flat triangular join (cheapest; callers guarantee
    k is coarse). ``group=g`` → two-level window + group-total
    triangular (O(k log g); for fine chunk axes).
    """
    sums = sums or {}
    lasts = lasts or {}
    if group is None:
        return _flat(df, key, sums, lasts)
    pg = F.floor(F.col(key) / F.lit(int(group)))
    d = df.withColumn("_pg", pg)
    w = (
        Window.partitionBy("_pg")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumns(
        {f"_in_{out}": F.sum(c).over(w) for out, c in sums.items()}
        | {f"_in_{out}": F.last(c, ignorenulls=True).over(w) for out, c in lasts.items()}
    )

    # per-group totals from the RAW input (no dependency on the window
    # columns above — keeps the group-total subtree window-free)
    aggs = [F.sum(c).alias(f"_gt_{out}") for out, c in sums.items()]
    aggs += [
        _last_nonnull(F.col(c), F.col(key)).alias(f"_gt_{out}")
        for out, c in lasts.items()
    ]
    base = df.select(pg.alias("_pg"), F.col(key), *{*sums.values(), *lasts.values()})
    gt = base.groupBy("_pg").agg(*aggs)
    outs = [*sums, *lasts]
    a = gt.select("_pg")
    b = gt.select(
        F.col("_pg").alias("_pgb"),
        *[F.col(f"_gt_{o}").alias(f"_gtb_{o}") for o in outs],
    )
    goff_aggs = [F.sum(f"_gtb_{o}").alias(f"_go_{o}") for o in sums]
    goff_aggs += [
        _last_nonnull(F.col(f"_gtb_{o}"), F.col("_pgb")).alias(f"_go_{o}")
        for o in lasts
    ]
    goff = (
        a.join(b, F.col("_pgb") < F.col("_pg"), "left")
        .groupBy("_pg")
        .agg(*goff_aggs)
    )
    d = d.join(F.broadcast(goff), "_pg", "left")
    d = d.withColumns(
        {
            out: F.coalesce(F.col(f"_go_{out}"), F.lit(0))
            + F.coalesce(F.col(f"_in_{out}"), F.lit(0))
            for out in sums
        }
        | {
            out: F.coalesce(F.col(f"_in_{out}"), F.col(f"_go_{out}"))
            for out in lasts
        }
    )
    return d.select(key, *outs)
