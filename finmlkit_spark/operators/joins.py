"""Reusable as-of and range join utilities (SURVEY.md §2.9, §4c).

The reference does as-of alignment via ``np.searchsorted`` /
``pd.merge_asof`` and interval scans via per-event loops; Spark-native
equivalents built once and reused by labels, volume profile, ReturnT:

- ``asof_join``: union + last-ignoreNulls window — no shuffle beyond the
  single sort-shuffle on (by, ts); no custom strategy needed.
- ``range_join``: equi-join on coarse time buckets + residual predicate —
  turns the O(|L|·|R|) theta join into a bounded bucket join, the same
  trick range-join binning optimizers apply. Bucket width should be on
  the order of the interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts_ns",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_ns: int | None = None,
) -> DataFrame:
    """Attach to each left row the latest right row with right.on <= left.on
    (direction='backward'; 'forward' = earliest right row >= left.on).
    ``tolerance_ns`` (pandas merge_asof semantics) rejects matches farther
    than the tolerance from the left timestamp — attached columns become
    NULL, the left row survives.

    Implementation: tag + unionByName + last(ignoreNulls) over an ordered
    window partitioned by ``by`` — one sort-shuffle, no cross product,
    skew-free (the window is per symbol). The tolerance check rides the
    same window (the matched right timestamp is carried as one more
    filled column), so it adds no extra shuffle.
    """
    by = by or []
    right_cols = right_cols or [c for c in right.columns if c != on and c not in by]
    if tolerance_ns is not None:
        right = right.withColumn("_match_ts", F.col(on))
        right_cols = list(right_cols) + ["_match_ts"]

    lt = left.withColumn("_src", F.lit(1))
    for c in right_cols:
        lt = lt.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        *by, on, *[F.col(c).alias(f"_r_{c}") for c in right_cols]
    ).withColumn("_src", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    u = lt.unionByName(rt.select(lt.columns))
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_src").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = {c: F.last(f"_r_{c}", ignorenulls=True).over(w) for c in right_cols}
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).desc(), F.col("_src").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        fill = {c: F.last(f"_r_{c}", ignorenulls=True).over(w) for c in right_cols}
    out = u.select(
        *[c for c in left.columns], *[fill[c].alias(c) for c in right_cols], "_src"
    )
    out = out.where(F.col("_src") == 1).drop("_src")
    if tolerance_ns is not None:
        gap = (
            (F.col(on) - F.col("_match_ts"))
            if direction == "backward"
            else (F.col("_match_ts") - F.col(on))
        )
        ok = F.col("_match_ts").isNotNull() & (gap <= F.lit(tolerance_ns))
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(ok, F.col(c)).otherwise(F.lit(None)).alias(c)
                for c in right_cols
                if c != "_match_ts"
            ],
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_ts: str = "ts_ns",
    by: list[str] | None = None,
    bucket_ns: int | None = None,
) -> DataFrame:
    """Join each left interval [left_start, left_end] with right rows whose
    ``right_ts`` falls inside it (start-exclusive, end-inclusive — the
    reference's bar/barrier convention ``base.py:363-377``).

    With ``bucket_ns`` set, both sides explode/assign coarse time buckets
    and equi-join on (by..., bucket) before the residual range predicate —
    bounding the join fan-out at scale. Without it, a plain theta join
    (fine for small left sides; Spark broadcasts when possible).
    """
    by = by or []
    cond = (F.col(right_ts) > F.col(left_start)) & (F.col(right_ts) <= F.col(left_end))
    for b in by:
        cond = cond & (left[b] == right[b])

    if bucket_ns is None:
        return left.join(right, cond)

    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(left_start) / bucket_ns), F.floor(F.col(left_end) / bucket_ns)
            )
        ),
    )
    rb = right.withColumn("_bucket", F.floor(F.col(right_ts) / bucket_ns))
    keys = by + ["_bucket"]
    joined = lb.join(rb, keys)
    return joined.where(
        (F.col(right_ts) > F.col(left_start)) & (F.col(right_ts) <= F.col(left_end))
    ).drop("_bucket")
