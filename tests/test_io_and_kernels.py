"""IO round-trip (materialized bar table, pruned read) + golden tests
for the reset-state kernels (reference test strategy §5.1/§5.6)."""

from __future__ import annotations

import numpy as np

from finmlkit_spark.functions import sequential as S
from finmlkit_spark.sources import bars_io as IO


def test_materialize_roundtrip_and_prune(spark, tmp_path):
    day_ns = 86_400_000_000_000
    rows = [
        # two months of daily bars
        *[(i * day_ns, 1.0 + i, 2.0 + i, 0.5, 1.5 + i, 10.0, 5, 1.2) for i in range(1, 58)]
    ]
    bars = spark.createDataFrame(
        rows,
        "bar_close_ns long, open double, high double, low double, close double, volume double, trades long, vwap double",
    )
    path = str(tmp_path / "bars")
    IO.materialize_time_bars(bars, path)
    back = IO.read_time_bars(spark, path)
    assert back.count() == 57
    assert sorted(r["year_month"] for r in back.select("year_month").distinct().collect()) == [
        "1970-01",
        "1970-02",
    ]
    pruned = IO.read_time_bars(spark, path, start_ns=40 * day_ns)
    assert pruned.count() == 18


def test_resample_semantics(spark):
    # two fine bars per coarse bar; boundary bar (close == coarse close)
    # stays in the earlier coarse bar
    m = 60_000_000_000
    rows = [
        (1 * m, 10.0, 12.0, 9.0, 11.0, 2.0, 3, 10.5),
        (2 * m, 11.0, 15.0, 10.0, 14.0, 4.0, 2, 13.0),
        (3 * m, 14.0, 16.0, 13.0, 15.0, 1.0, 1, 15.0),
    ]
    fine = spark.createDataFrame(
        rows,
        "bar_close_ns long, open double, high double, low double, close double, volume double, trades long, vwap double",
    )
    out = {r["bar_close_ns"] // m: r for r in IO.resample_bars(fine, 2 * m).collect()}
    b2 = out[2]  # covers fine closes 1m and 2m
    assert (b2["open"], b2["high"], b2["low"], b2["close"]) == (10.0, 15.0, 9.0, 14.0)
    assert b2["volume"] == 6.0 and b2["trades"] == 5
    assert abs(b2["vwap"] - (10.5 * 2 + 13.0 * 4) / 6.0) < 1e-12
    assert out[4]["close"] == 15.0


def test_volume_bar_exact_vs_approx_divergence():
    # reset semantics differ from cumsum-floor exactly at boundaries:
    # qty 60,60,60 thr=100 — exact: the crossing trade closes ITS bar
    # (end-inclusive, logic.py:87-115) -> [0,0,1] and the residual resets;
    # floor-cumsum carries over -> [0,1,1]
    q = np.array([60.0, 60.0, 60.0])
    assert list(S.volume_bar_ids_exact(q, 100.0)) == [0, 0, 1]
    assert [int(x) for x in np.floor(np.cumsum(q) / 100.0)] == [0, 1, 1]


def test_cusum_bar_ids_adaptive():
    r = np.array([0.3, 0.3, -0.2, -0.9, 0.05, 0.05])
    sigma = np.array([np.nan, 0.1, 0.1, 0.1, 0.1, 0.1])
    # floor 0.5 dominates until sigma*mult exceeds: mult=2 -> thr=max(0.2,0.5)=0.5
    ids = S.cusum_bar_ids(r, sigma, mult=2.0, floor_thr=0.5)
    # cum+ = .3, .6 -> close bar0 at i=1; then -.2,-1.1 -> close bar1 at i=3
    assert list(ids) == [0, 0, 1, 1, 2, 2]


def test_cusum_filter_resets():
    r = np.array([0.6, 0.6, -0.4, -0.4, -0.4])
    flags = S.cusum_filter_np(r, 1.0)
    # sp: .6, 1.2 -> event; sn: -.4 -.8 -1.2 -> event at last
    assert list(flags) == [0, 1, 0, 0, 1]


def test_imbalance_bar_ids():
    # side +1/-1 alternating with qty 10 -> theta oscillates in [-10, 0,
    # +10]; expected=15 never reached until a run of same-side prints
    side = np.array([1, 1, -1, 1, 1])
    qty = np.array([10.0, 10.0, 10.0, 10.0, 10.0])
    ids = S.imbalance_bar_ids(side, qty, ewma_span=10, init_expected=15.0)
    # theta: 10, 20 -> close (|20|>=15) at i=1; reset; -10, 0, 10 -> open
    assert list(ids) == [0, 0, 1, 1, 1]


def test_run_bar_ids():
    side = np.array([1, -1, -1, 1, -1])
    qty = np.array([5.0, 5.0, 5.0, 5.0, 5.0])
    ids = S.run_bar_ids(side, qty, ewma_span=10, init_expected=10.0)
    # runs: buy5/sell0 ->5; buy5/sell5 ->5; sell10 -> close at i=2; reset
    assert list(ids) == [0, 0, 0, 1, 1]


def test_bucketed_write_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key join with zero Exchange —
    the write-once/join-forever co-location contract."""
    day_ns = 86_400_000_000_000
    bars = spark.createDataFrame(
        [(i * day_ns, 1.0 + i) for i in range(200)], "bar_close_ns long, close double"
    )
    feats = spark.createDataFrame(
        [(i * day_ns, 0.1 * i) for i in range(200)], "bar_close_ns long, f double"
    )
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # tiny test tables would auto-broadcast; force the shuffle-join
        # planner path the bucket layout is designed to eliminate
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        IO.write_bucketed(bars, "b_bars", 8, path=str(tmp_path / "b_bars"))
        IO.write_bucketed(feats, "b_feats", 8, path=str(tmp_path / "b_feats"))
        j = IO.read_bucketed(spark, "b_bars").join(
            IO.read_bucketed(spark, "b_feats"), "bar_close_ns"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert j.count() == 200
        got = {r["bar_close_ns"]: r for r in j.collect()}
        assert got[day_ns]["close"] == 2.0 and got[day_ns]["f"] == 0.1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS b_bars")
        spark.sql("DROP TABLE IF EXISTS b_feats")


def test_corpus_jsonl_roundtrip_and_pruned_read(spark, tmp_path):
    """JSONL ingest (explicit schema, corrupt rows dropped) -> curated
    partitioned write (dynamic overwrite) -> pruned read."""
    import json

    from pyspark.sql import functions as F

    from finmlkit_spark.sources.corpus_io import (
        read_corpus,
        read_documents_jsonl,
        write_corpus,
    )

    src = tmp_path / "in.jsonl"
    lines = [json.dumps({"doc_id": i, "text": f"doc number {i}"}) for i in range(20)]
    lines.insert(5, "{not valid json")
    src.write_text("\n".join(lines))

    docs = read_documents_jsonl(spark, str(src))
    assert docs.count() == 20  # corrupt row dropped

    out = docs.withColumn(
        "split", F.when(F.col("doc_id") % 10 == 0, "test").otherwise("train")
    )
    dst = str(tmp_path / "corpus")
    write_corpus(out, dst, partition_by=("split",))

    train = read_corpus(spark, dst, split="train")
    assert train.count() == 18
    plan = train._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split" in plan.split("PartitionFilters")[1][:120]

    # dynamic overwrite: rewriting only the test split leaves train intact
    write_corpus(out.where(F.col("split") == "test"), dst, partition_by=("split",))
    assert read_corpus(spark, dst, split="train").count() == 18
    assert read_corpus(spark, dst, split="test").count() == 2


def test_store_meta_sidecar_roundtrip(spark, tmp_path):
    """materialize_time_bars writes a _meta integrity sidecar whose
    read-back equals the on-demand store_inspector report, and the
    sidecar stays invisible to data scans."""
    day_ns = 86_400_000_000_000
    rows = [(i * day_ns, 1.0, 2.0, 0.5, 1.5, 10.0, 5, 1.2) for i in range(1, 40)]
    bars = spark.createDataFrame(
        rows,
        "bar_close_ns long, open double, high double, low double, close double, volume double, trades long, vwap double",
    )
    path = str(tmp_path / "bars")
    IO.materialize_time_bars(bars, path)
    # data scan must not see the sidecar rows/columns
    assert IO.read_time_bars(spark, path).count() == 39
    meta = {r["year_month"]: r for r in IO.read_store_meta(spark, path).collect()}
    live = {
        r["year_month"]: r
        for r in IO.store_inspector(bars, "bar_close_ns").collect()
    }
    assert set(meta) == set(live) == {"1970-01", "1970-02"}
    for ym, r in live.items():
        for c in ("n_rows", "first_ts_ns", "last_ts_ns", "max_gap_ns", "n_gaps"):
            assert meta[ym][c] == r[c], (ym, c)


def test_corpus_meta_sidecar_dynamic_overwrite(spark, tmp_path):
    """write_corpus's _meta sidecar tracks per-split counts/id ranges and
    refreshes ONLY rewritten partitions under dynamic overwrite."""
    from pyspark.sql import functions as F

    from finmlkit_spark.sources.corpus_io import read_corpus_meta, write_corpus

    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id")).alias("text"),
        F.when(F.col("id") % 10 == 0, "test").otherwise("train").alias("split"),
    )
    dst = str(tmp_path / "corpus")
    write_corpus(docs, dst, partition_by=("split",))
    meta = {r["split"]: r for r in read_corpus_meta(spark, dst).collect()}
    assert meta["train"]["n_rows"] == 18 and meta["test"]["n_rows"] == 2
    assert meta["train"]["min_doc_id"] == 1 and meta["test"]["max_doc_id"] == 10

    # rewrite only the test split with fewer rows: train meta row intact
    write_corpus(
        docs.where((F.col("split") == "test") & (F.col("doc_id") == 0)),
        dst,
        partition_by=("split",),
    )
    meta = {r["split"]: r for r in read_corpus_meta(spark, dst).collect()}
    assert meta["train"]["n_rows"] == 18
    assert meta["test"]["n_rows"] == 1 and meta["test"]["max_doc_id"] == 0


def test_upsert_time_bars_incremental_equals_full_rebuild(spark, tmp_path):
    """Incremental monthly upsert == one-shot materialize of the union:
    (a) a second batch overlapping month 2 and adding month 3 merges
    with batch-wins semantics and leaves month-1 files untouched;
    (b) the spliced _meta sidecar equals the full-store inspector;
    (c) replaying the same batch is a no-op (idempotent ingest)."""
    day_ns = 86_400_000_000_000
    schema = (
        "bar_close_ns long, open double, high double, low double, "
        "close double, volume double, trades long, vwap double"
    )

    def mk(days, vol):
        return spark.createDataFrame(
            [(d * day_ns, 1.0, 2.0, 0.5, 1.5, vol, 5, 1.2) for d in days], schema
        )

    path = str(tmp_path / "bars")
    # months 1-2 (days 1..57), volume 10
    IO.materialize_time_bars(mk(range(1, 58), 10.0), path)
    import os

    m1_files = sorted(os.listdir(f"{path}/year_month=1970-01"))
    m1_mtimes = [
        os.path.getmtime(f"{path}/year_month=1970-01/{f}") for f in m1_files
    ]

    # batch: corrects days 50..57 (volume 99) and adds month 3 (days 60..80)
    batch = mk(list(range(50, 58)) + list(range(60, 81)), 99.0)
    IO.upsert_time_bars(batch, path)

    back = IO.read_time_bars(spark, path)
    assert back.count() == 57 + 21  # 57 original, 8 corrected in place, 21 new
    got_vol = {
        r["bar_close_ns"]: r["volume"]
        for r in back.select("bar_close_ns", "volume").collect()
    }
    for d in range(1, 50):
        assert got_vol[d * day_ns] == 10.0
    for d in list(range(50, 58)) + list(range(60, 81)):
        assert got_vol[d * day_ns] == 99.0
    # month-1 partition untouched: same files, same mtimes
    assert sorted(os.listdir(f"{path}/year_month=1970-01")) == m1_files
    assert [
        os.path.getmtime(f"{path}/year_month=1970-01/{f}") for f in m1_files
    ] == m1_mtimes

    # spliced sidecar == full-store inspector, bit-for-bit
    full = back.drop("year_month")
    meta = {r["year_month"]: r for r in IO.read_store_meta(spark, path).collect()}
    live = {
        r["year_month"]: r for r in IO.store_inspector(full, "bar_close_ns").collect()
    }
    assert set(meta) == set(live) == {"1970-01", "1970-02", "1970-03"}
    for ym, r in live.items():
        for c in ("n_rows", "first_ts_ns", "last_ts_ns", "max_gap_ns", "n_gaps"):
            assert meta[ym][c] == r[c], (ym, c)

    # replay: row-identical store
    before = sorted(tuple(r) for r in back.collect())
    IO.upsert_time_bars(batch, path)
    after = sorted(tuple(r) for r in IO.read_time_bars(spark, path).collect())
    assert after == before


def test_upsert_corpus_incremental_and_idempotent(spark, tmp_path):
    """Corpus upsert: a batch touching only split=train replaces its
    re-ingested doc_ids and appends new ones, leaves split=test files
    untouched on disk, refreshes exactly the touched _meta rows, and a
    replay is a no-op."""
    import os

    from finmlkit_spark.sources import corpus_io as CIO

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string, split string")

    path = str(tmp_path / "corpus")
    CIO.write_corpus(
        mk([(i, f"doc {i}", "train") for i in range(10)]
           + [(i, f"doc {i}", "test") for i in range(100, 105)]),
        path,
    )
    test_dir = f"{path}/split=test"
    t_files = sorted(os.listdir(test_dir))
    t_mtimes = [os.path.getmtime(f"{test_dir}/{f}") for f in t_files]

    # batch: re-crawl docs 7-9 (new text) + new docs 10-14, train only
    batch = mk(
        [(i, f"docv2 {i}", "train") for i in range(7, 10)]
        + [(i, f"doc {i}", "train") for i in range(10, 15)]
    )
    CIO.upsert_corpus(batch, path)

    back = spark.read.parquet(path)
    assert back.count() == 15 + 5
    texts = {r["doc_id"]: r["text"] for r in back.where("split = 'train'").collect()}
    assert texts[7] == "docv2 7" and texts[3] == "doc 3" and texts[14] == "doc 14"
    assert sorted(os.listdir(test_dir)) == t_files
    assert [os.path.getmtime(f"{test_dir}/{f}") for f in t_files] == t_mtimes

    meta = {r["split"]: r for r in CIO.read_corpus_meta(spark, path).collect()}
    assert meta["train"]["n_rows"] == 15 and meta["test"]["n_rows"] == 5
    assert meta["train"]["max_doc_id"] == 14

    before = sorted(tuple(r) for r in back.collect())
    CIO.upsert_corpus(batch, path)
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
