"""Materialized bar tables + re-aggregation reader + store inspector
(SURVEY.md §2.1; reference ``finmlkit/bar/io.py``).

- ``materialize_time_bars`` ≙ ``AddTimeBarH5`` (``io.py:311-565``): build
  fine-grained (e.g. 1-minute) bars once, persist partitioned by
  year_month — the derived-table cache every coarser timeframe reads.
- ``resample_bars`` ≙ ``TimeBarReader.read/_resample`` (``io.py:761-950``):
  re-aggregate fine bars to any multiple timeframe: first/max/min/last/
  sum, volume-weighted vwap (``io.py:926-928``).
- ``store_inspector`` ≙ ``H5Inspector`` (``io.py:35-308``): per-partition
  row counts, ts ranges, gap stats — a metadata query, not a scan, when
  the table is partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def materialize_time_bars(
    bars: DataFrame, path: str, key: str = "bar_close_ns", write_meta: bool = True
) -> None:
    """Persist fine bars partitioned by year_month (monthly partitions ≙
    the reference's /klines/YYYY-MM keys; pruning comes free).

    ``write_meta`` also persists the per-partition metadata/integrity
    sidecar (record counts, first/last ts, gap stats) next to the data —
    the write-time analog of the reference's ``/meta/YYYY-MM`` +
    ``/integrity/YYYY-MM`` datasets (``data_model.py:449-574``), so
    ``H5Inspector``-style reports read k rows instead of rescanning."""
    out = bars.withColumn(
        "year_month",
        F.date_format((F.col(key) / 1e9).cast("timestamp"), "yyyy-MM"),
    )
    out.write.mode("overwrite").partitionBy("year_month").parquet(path)
    if write_meta:
        # the sidecar is computed from the JUST-WRITTEN files, not the
        # input plan: the report then provably describes the stored data
        # (an upstream nondeterminism cannot make meta and data diverge)
        # and the upstream pipeline is not executed a second time.
        stored = bars.sparkSession.read.parquet(path).drop("year_month")
        write_store_meta(stored, path, ts_col=key)


def upsert_time_bars(
    bars: DataFrame,
    path: str,
    key: str = "bar_close_ns",
    write_meta: bool = True,
    max_gap_ns: int = 3_600_000_000_000,
) -> None:
    """Idempotent incremental ingest into a :func:`materialize_time_bars`
    store: merge a new batch of bars into ONLY the monthly partitions it
    touches, leaving every other partition's files untouched.

    The production form of daily ingest at 100 TB: a day's bars touch
    1–2 monthly partitions, so the work scales with the touched months,
    never the store. Per touched month the existing rows are read back
    (partition-pruned scan), rows whose ``key`` also appears in the
    batch are dropped (batch wins — replays and corrections are safe),
    and the union is rewritten via dynamic partition overwrite (only
    the batch's ``year_month`` values are replaced; Spark's static
    overwrite would truncate the whole table). The ``_meta`` sidecar is
    spliced the same way: inspector rows recomputed from the
    just-written touched months, rows for untouched months carried over
    unchanged.

    Replaying the same batch twice leaves the store row-identical
    (pinned by test). Assumes the session timezone is UTC (as
    ``session.get_spark`` sets) so the write-side month key and the
    inspector's epoch-day month agree."""
    spark = bars.sparkSession
    month = F.date_format((F.col(key) / 1e9).cast("timestamp"), "yyyy-MM")
    batch = bars.withColumn("year_month", month)
    months = [
        r["year_month"] for r in batch.select("year_month").distinct().collect()
    ]  # k touched months — bounded by the batch's time span, not the store
    store_path = path.rstrip("/")
    try:
        existing = (
            spark.read.parquet(store_path)
            .where(F.col("year_month").isin(months))
            .drop("year_month")
            .withColumn("year_month", month)
        )
        keep = existing.join(
            batch.select(F.col(key).alias("_bk")).distinct(),
            on=existing[key] == F.col("_bk"),
            how="left_anti",
        )
        merged = keep.unionByName(batch)
    except Exception:  # first write — no store yet
        merged = batch
    # the merged plan reads the very files the overwrite replaces:
    # materialize it first (localCheckpoint — lineage cut, no re-read)
    merged = merged.localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("year_month").parquet(store_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    if write_meta:
        stored = (
            spark.read.parquet(store_path)
            .where(F.col("year_month").isin(months))
            .drop("year_month")
        )
        fresh = store_inspector(stored, ts_col=key, max_gap_ns=max_gap_ns)
        meta_path = store_path + "/_meta"
        try:
            carry = spark.read.parquet(meta_path).where(
                ~F.col("year_month").isin(months)
            )
            fresh = carry.unionByName(fresh)
        except Exception:  # no sidecar yet
            pass
        fresh.localCheckpoint().write.mode("overwrite").parquet(meta_path)


def write_store_meta(
    df: DataFrame,
    path: str,
    ts_col: str = "ts_ns",
    max_gap_ns: int = 3_600_000_000_000,
) -> None:
    """Persist the :func:`store_inspector` report as the table's
    ``_meta`` sidecar. The underscore prefix keeps it INVISIBLE to data
    scans (Spark/parquet discovery skips ``_*`` paths), so the sidecar
    can live inside the table directory like the reference keeps
    ``/meta`` + ``/integrity`` groups inside the H5 store. One k-row
    parquet write per materialization — at 100 TB the inspector then
    answers from k rows instead of a full rescan."""
    store_inspector(df, ts_col=ts_col, max_gap_ns=max_gap_ns).write.mode(
        "overwrite"
    ).parquet(path.rstrip("/") + "/_meta")


def read_store_meta(spark: SparkSession, path: str) -> DataFrame:
    """Read a table's ``_meta`` integrity sidecar (columns: year_month,
    n_rows, first_ts_ns, last_ts_ns, max_gap_ns, n_gaps)."""
    return spark.read.parquet(path.rstrip("/") + "/_meta")


def read_time_bars(
    spark: SparkSession, path: str, start_ns: int | None = None, end_ns: int | None = None
) -> DataFrame:
    """Pruned read of the materialized bar table (partition pruning +
    row-group min/max on bar_close_ns — ``_find_relevant_keys`` for free)."""
    df = spark.read.parquet(path)
    if start_ns is not None:
        df = df.where(F.col("bar_close_ns") >= start_ns)
    if end_ns is not None:
        df = df.where(F.col("bar_close_ns") <= end_ns)
    return df


def resample_bars(
    fine: DataFrame, out_interval_ns: int, key: str = "bar_close_ns", median_col: str | None = None
) -> DataFrame:
    """Re-aggregate fine bars to a coarser timeframe (``_resample``
    ``io.py:890-950``): open=first, high=max, low=min, close=last,
    volume/trades=sum, vwap = Σ(vwap·volume)/Σvolume. Close-time keyed:
    a fine bar closing at t belongs to the coarse bar covering (t', t'']
    with t'' = ceil(t / out)·out — computed on the close-1 so a bar
    closing exactly on the boundary stays in the earlier coarse bar.

    ``median_col``: optionally re-aggregate a per-fine-bar median column
    (e.g. median_trade_size) as the reference's *exact weighted median*
    (trade-count weighted, sort + cumsum, ``io.py:931-943``): the first
    value, in median order, whose cumulative weight reaches half the
    total. Monotone cumsum makes it min-of-eligible — window + one agg.
    """
    coarse_key = (
        (F.floor((F.col(key) - 1) / out_interval_ns) + 1) * out_interval_ns
    ).cast("long")
    df = fine.withColumn("_ck", coarse_key)
    aggs = [
        F.min_by("open", key).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", key).alias("close"),
        F.sum("volume").alias("volume"),
        F.sum("trades").cast("long").alias("trades"),
        (
            F.sum(F.col("vwap") * F.col("volume"))
            / F.when(F.sum("volume") > 0, F.sum("volume"))
        ).alias("vwap"),
    ]
    if median_col is not None:
        wm = Window.partitionBy("_ck").orderBy(median_col, key)
        wp = Window.partitionBy("_ck")
        df = df.withColumn("_cumw", F.sum("trades").over(wm.rowsBetween(Window.unboundedPreceding, 0)))
        df = df.withColumn("_totw", F.sum("trades").over(wp))
        eligible = F.col("_cumw") * 2 >= F.col("_totw")
        aggs.append(
            F.min(F.when(eligible, F.col(median_col))).alias(f"{median_col}_wm")
        )
    return df.groupBy(F.col("_ck").alias(key)).agg(*aggs)


def write_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int = 32,
    key: str = "bar_close_ns",
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (+ sorted) on ``key``.

    The 100 TB join story: two tables bucketed on the same key with the
    same bucket count join with ZERO Exchange — each task reads bucket i
    of both sides (SortMergeJoin straight off the sorted files). Worth
    it for any table joined repeatedly on the same key (bars × features,
    bars × labels, events × bars): one shuffle at write time, none at
    read time, forever. Bucket pruning also kicks in for equality
    predicates on ``key``.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table preserving its output partitioning (plain
    ``spark.table`` — the catalog carries the bucket spec)."""
    return spark.table(table)


def store_inspector(
    df: DataFrame, ts_col: str = "ts_ns", max_gap_ns: int = 3_600_000_000_000
) -> DataFrame:
    """Partition-level metadata report (``H5Inspector``): per year_month —
    rows, first/last ts, max intra-partition gap, gap count."""
    # month via epoch-day arithmetic on DateType — timezone-free in every
    # engine/session (timestamp formatting would follow the session tz)
    days = F.floor(F.col(ts_col) / F.lit(86_400_000_000_000)).cast("int")
    mon = F.date_format(F.date_add(F.lit("1970-01-01").cast("date"), days), "yyyy-MM")
    d = df.withColumn("year_month", mon)
    w = Window.partitionBy("year_month").orderBy(ts_col)
    d = d.withColumn("_gap", F.col(ts_col) - F.lag(ts_col).over(w))
    return d.groupBy("year_month").agg(
        F.count("*").alias("n_rows"),
        F.min(ts_col).alias("first_ts_ns"),
        F.max(ts_col).alias("last_ts_ns"),
        F.max("_gap").alias("max_gap_ns"),
        F.sum(F.when(F.col("_gap") > max_gap_ns, 1).otherwise(0)).cast("long").alias("n_gaps"),
    )
