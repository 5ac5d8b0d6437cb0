"""Corpus sources/sinks for the LLM-curation tier.

Documents arrive as JSONL (the lingua franca of web-scale text dumps)
or parquet; curated output writes back partitioned by the columns a
training run prunes on (split, lang) so downstream readers get
partition pruning for free — the corpus analog of the trades store's
(symbol, month) layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: canonical documents schema (matches the testdata documents table)
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_SCHEMA,
    id_col: str = "doc_id",
) -> DataFrame:
    """JSONL corpus scan with an EXPLICIT schema — schema inference on
    100 TB of JSON is a full extra pass over the data and types drift
    per shard; a declared schema makes the scan single-pass and the
    contract loud. Rows whose JSON does not parse land in
    ``_corrupt_record`` mode PERMISSIVE as all-null rows and are
    dropped by the id filter (count them upstream if loss matters).
    Synthesizes nothing: missing ``doc_id`` is an error row, not a
    generated id (generated ids are not stable across re-reads)."""
    df = spark.read.schema(schema).json(path)
    return df.where(F.col(id_col).isNotNull())


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("split",),
    max_records_per_file: int = 1_000_000,
    write_meta: bool = True,
) -> None:
    """Partitioned parquet sink for curated documents.

    Partition columns = the prune axes of a training run (split, lang);
    ``maxRecordsPerFile`` bounds file sizes so a skewed partition (one
    dominant language) still yields parallel-readable files. Overwrite
    is DYNAMIC-partition only: re-curating one split does not clobber
    the others.

    ``write_meta`` also persists a per-partition ``_meta`` sidecar
    (record count, id range) — the corpus analog of the bar store's
    write-time integrity datasets (reference ``data_model.py:449-574``),
    invisible to data scans (``_``-prefixed path). Inspection then reads
    k rows instead of rescanning the corpus."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )
    if write_meta:
        id_cols = [c for c in ("doc_id",) if c in df.columns]
        stats = [F.count(F.lit(1)).alias("n_rows")] + [
            a for c in id_cols for a in (
                F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")
            )
        ]
        # the sidecar is partitioned + dynamically overwritten like the
        # data, so re-curating one split refreshes exactly that split's
        # meta row and the others stay consistent
        (
            df.groupBy(*partition_by).agg(*stats)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(path.rstrip("/") + "/_meta")
        )


def read_corpus_meta(spark: SparkSession, path: str) -> DataFrame:
    """Read a curated corpus's ``_meta`` sidecar (one row per partition
    value: partition cols, n_rows, min/max doc_id)."""
    return spark.read.parquet(path.rstrip("/") + "/_meta")


def read_corpus(spark: SparkSession, path: str, **filters) -> DataFrame:
    """Pruned corpus read: equality filters on partition columns become
    partition pruning (no data files of other partitions are opened)."""
    df = spark.read.parquet(path)
    for col, val in filters.items():
        df = df.where(F.col(col) == val)
    return df


def upsert_corpus(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("split",),
    id_col: str = "doc_id",
    max_records_per_file: int = 1_000_000,
    write_meta: bool = True,
) -> None:
    """Idempotent incremental corpus ingest — the ``bars_io.
    upsert_time_bars`` pattern for documents: merge a batch into ONLY
    the partitions it touches, batch-wins on ``id_col`` (re-crawled /
    re-scored docs replace their prior rows; replays are no-ops), and
    leave every other partition's files untouched.

    Per touched partition the existing rows are read back (pruned
    scan), rows whose ``id_col`` also appears in the batch are dropped,
    and the union is rewritten through :func:`write_corpus`'s dynamic
    partition overwrite — which also refreshes exactly the touched
    partitions' ``_meta`` rows, because the sidecar is partitioned and
    dynamically overwritten the same way. Work scales with the touched
    partitions: with an ingest axis in ``partition_by`` (e.g.
    ``("split", "ingest_date")``) a daily batch rewrites one day, never
    the corpus."""
    import functools

    spark = df.sparkSession
    parts = df.select(*partition_by).distinct().collect()  # k touched partitions
    cond = functools.reduce(
        lambda a, b: a | b,
        [
            functools.reduce(
                lambda x, y: x & y,
                [F.col(c) == r[c] for c in partition_by],
            )
            for r in parts
        ],
    )
    try:
        existing = spark.read.parquet(path).where(cond)
        keep = existing.join(
            df.select(F.col(id_col).alias("_bk")).distinct(),
            on=existing[id_col] == F.col("_bk"),
            how="left_anti",
        )
        merged = keep.unionByName(df)
    except Exception:  # first write — no corpus yet
        merged = df
    # the merged plan reads the files the overwrite replaces: cut the
    # lineage first (localCheckpoint — no second read of the store)
    merged = merged.localCheckpoint()
    write_corpus(merged, path, partition_by, max_records_per_file, write_meta)
