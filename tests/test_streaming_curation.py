"""Batch/stream parity for the streaming LLM-curation pipeline:
quality filter (stateless projections) + watermark-bounded exact dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finmlkit_spark.streaming import curation as C

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_stream_dir(spark, tmp_path_factory):
    """documents + injected duplicates (same text, new ids, later ts)."""
    d = str(tmp_path_factory.mktemp("docs_stream"))
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    base = docs.withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
    )
    dups = (
        docs.filter(F.col("doc_id") % 10 == 0)  # 50 duplicate texts
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn(
            "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id") % 900)
        )
    )
    base.unionByName(dups).coalesce(1).write.parquet(d, mode="overwrite")
    return d


def _run_stream(spark, df_stream, name):
    q = (
        df_stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_quality_filter_parity(spark, docs_stream_dir):
    batch = spark.read.parquet(docs_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(docs_stream_dir)
    got = _run_stream(
        spark, C.streaming_quality_filter(stream, min_chars=20, min_quality=0.3), "q_filter"
    )
    exp = C.with_curation_columns(batch).filter(
        (F.col("n_chars") >= 20) & (F.col("quality") >= 0.3)
    )
    g = {r["doc_id"]: r for r in got.collect()}
    e = {r["doc_id"]: r for r in exp.collect()}
    assert set(g) == set(e) and len(e) > 0
    for k in e:
        assert g[k]["quality"] == pytest.approx(e[k]["quality"])
        assert g[k]["n_tokens"] == e[k]["n_tokens"]
        assert g[k]["lang"] == e[k]["lang"]


def test_streaming_exact_dedup_parity(spark, docs_stream_dir):
    batch = spark.read.parquet(docs_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(docs_stream_dir)
    got = _run_stream(
        spark, C.streaming_exact_dedup(stream, watermark="1 hour"), "dedup_stream"
    )
    rows = got.collect()
    # one survivor per distinct text, all texts represented
    md5s = [r["content_md5"] for r in rows]
    assert len(md5s) == len(set(md5s))
    exp_md5s = {
        r["h"] for r in batch.select(F.md5("text").alias("h")).distinct().collect()
    }
    assert set(md5s) == exp_md5s
    assert len(rows) == 500  # 550 arrivals -> 500 distinct texts


def test_streaming_curation_pipeline(spark, docs_stream_dir):
    batch = spark.read.parquet(docs_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(docs_stream_dir)
    got = _run_stream(
        spark,
        C.streaming_curation_pipeline(stream, min_chars=20, min_quality=0.3),
        "cur_pipe",
    )
    rows = got.collect()
    md5s = [r["content_md5"] for r in rows]
    assert len(md5s) == len(set(md5s))
    exp = (
        C.with_curation_columns(batch)
        .filter((F.col("n_chars") >= 20) & (F.col("quality") >= 0.3))
        .select("content_md5")
        .distinct()
        .count()
    )
    assert len(rows) == exp


def test_streaming_gopher_filters_parity(spark, docs_stream_dir):
    """The Gopher quality AND repetition filters are stateless per-row
    projections, so they compose onto a stream unchanged: streaming
    output must equal the batch run row-for-row (incl. the round-11
    sort_array + adjacent-run repetition fold — no window, no state)."""
    from finmlkit_spark.operators import corpus as CP

    schema = spark.read.parquet(docs_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_stream_dir)
    batch_df = spark.read.parquet(docs_stream_dir)
    out_rep = _run_stream(spark, CP.gopher_repetition(stream), "gopher_rep_stream")
    out_sig = _run_stream(spark, CP.gopher_signals(stream), "gopher_sig_stream")
    exp_rep = CP.gopher_repetition(batch_df)
    exp_sig = CP.gopher_signals(batch_df)
    got_rep = sorted(map(tuple, out_rep.collect()))
    assert got_rep == sorted(map(tuple, exp_rep.collect())) and got_rep
    got_sig = sorted(map(tuple, out_sig.collect()))
    assert got_sig == sorted(map(tuple, exp_sig.collect())) and got_sig


def test_streaming_normalized_dedup_parity(spark, docs_stream_dir):
    """The normalized-digest stream dedup must keep exactly one
    survivor per distinct NORMAL FORM — including case/punct variants
    the raw digest keeps apart."""
    from finmlkit_spark.operators.text import normalize_text

    batch = spark.read.parquet(docs_stream_dir)
    # inject a case variant of an existing text: raw dedup would keep
    # it, normalized dedup must fold it
    extra = batch.limit(1).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.upper("text").alias("text"),
        F.col("ts"),
    )
    import tempfile

    d2 = tempfile.mkdtemp(prefix="docs_norm_stream")
    batch.unionByName(extra).coalesce(1).write.parquet(d2, mode="overwrite")
    b2 = spark.read.parquet(d2)
    stream = spark.readStream.schema(b2.schema).parquet(d2)
    got = _run_stream(
        spark, C.streaming_normalized_dedup(stream, watermark="1 hour"), "ndedup_stream"
    )
    rows = got.collect()
    md5s = [r["norm_md5"] for r in rows]
    assert len(md5s) == len(set(md5s))
    exp = {
        r["h"]
        for r in b2.select(F.md5(normalize_text("text")).alias("h")).distinct().collect()
    }
    assert set(md5s) == exp
    # the upper-cased injection normalizes onto an existing digest:
    # survivors = the 500 distinct normal forms, not 501
    assert len(rows) == 500


def test_streaming_simhash_pairs_parity(spark, tmp_path):
    """Multi-batch streaming near-dup detection == the batch
    simhash_near_pairs set exactly: every (doc_a, doc_b, hamming) the
    batch banded join derives must be emitted by the bucket state
    machine — including pairs whose members arrive in DIFFERENT
    micro-batches (a 3-file split under maxFilesPerTrigger=1 forces
    the band-bucket state to carry across batches)."""
    import os

    import pyarrow.parquet as pq

    from finmlkit_spark.operators import dedup as D

    src = str(tmp_path / "nd_split")
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    os.makedirs(src)
    n = tbl.num_rows
    for i in range(3):
        pq.write_table(
            tbl.slice(i * n // 3, (n // 3) if i < 2 else n), f"{src}/p{i}.parquet"
        )

    batch = spark.read.parquet(src)
    want = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in D.simhash_near_pairs(batch).collect()
    }
    assert len(want) > 0  # sf0.001 documents do contain near-dup chains

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got_df = _run_stream(spark, C.streaming_simhash_pairs(stream), "nd_stream")
    rows = got_df.collect()
    got = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in rows}
    assert got == want
    # multi-band emissions are exact duplicates (collapse is lossless)
    assert len(rows) >= len(got)


def test_streaming_simhash_pairs_bucket_cap_bounds_state(spark, tmp_path):
    """With bucket_cap=1 state stays one entry per bucket; the stream
    still runs and every emitted pair is a true near-dup (subset of the
    batch set) — the documented bounded-recall contract."""
    import os

    import pyarrow.parquet as pq

    from finmlkit_spark.operators import dedup as D

    src = str(tmp_path / "nd_cap")
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    os.makedirs(src)
    pq.write_table(tbl, f"{src}/p0.parquet")

    batch = spark.read.parquet(src)
    want = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in D.simhash_near_pairs(batch).collect()
    }
    stream = spark.readStream.schema(batch.schema).parquet(src)
    got_df = _run_stream(
        spark, C.streaming_simhash_pairs(stream, bucket_cap=1), "nd_cap_stream"
    )
    got = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in got_df.collect()}
    assert got <= want
