"""Whole-corpus schema smoke: every driver table reads through the
schema-tolerant adapter with its canonical logical schema, across every
real sf dir — the class of upstream physical-type drift that cost
round 2 should always fail here first (sub-second), never in the
driver's correctness window.
"""

from __future__ import annotations

import glob
import os

import pytest

from finmlkit_spark.sources.tables import TS_COLS, normalize_ts, read_table

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

#: canonical logical schemas after normalization (what queries rely on)
EXPECT = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp_ntz",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    # embedding element type may drift float<->double; similarity code
    # normalizes via as_double, so only assert the structural shape
    "embeddings": {"vec_id": "bigint", "label": "int"},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
@pytest.mark.parametrize("table", sorted(EXPECT))
def test_table_reads_with_canonical_schema(spark, sf_dir, table):
    df = read_table(spark, sf_dir, table)
    got = dict(df.dtypes)
    for col, want in EXPECT[table].items():
        assert got.get(col) == want, (table, col, got.get(col))
    if table == "embeddings":
        assert got["embedding"].startswith("array<"), got["embedding"]


def test_normalize_ts_from_nanos_long(spark):
    ns = 1_700_000_000_123_456_789
    df = spark.createDataFrame([(ns,)], "ts bigint")
    out = normalize_ts(df, "ts")
    assert dict(out.dtypes)["ts"] == "timestamp_ntz"
    got = out.collect()[0]["ts"]
    assert got.isoformat().startswith("2023-11-14T22:13:20.123456")


def test_normalize_ts_from_date(spark):
    import datetime

    df = spark.createDataFrame([(datetime.date(2024, 3, 1),)], "d date")
    out = normalize_ts(df, "d")
    assert dict(out.dtypes)["d"] == "timestamp_ntz"


def test_ts_cols_cover_all_timestamp_columns():
    """If the driver adds a timestamp column to a table, TS_COLS must
    learn about it — this asserts the inventory matches reality."""
    import duckdb

    con = duckdb.connect()
    for t in EXPECT:
        desc = con.execute(
            f"describe select * from read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        ).fetchall()
        ts_like = {c for c, typ, *_ in desc if "TIMESTAMP" in typ.upper() or typ.upper() == "DATE"}
        assert ts_like == set(TS_COLS.get(t, ())), (t, ts_like)


def test_relation_memo_invalidates_on_rewrite(spark, tmp_path):
    """Round-8 ADVICE: the memo key folds in the table's mtime, so a
    mid-session rewrite of the source files is picked up by the next
    read_table without an explicit refresh/memo_clear."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "sfx")
    os.makedirs(d)
    p = f"{d}/region.parquet"
    pq.write_table(
        pa.table({"r_regionkey": [0], "r_name": ["AFRICA"], "r_comment": ["x"]}), p
    )
    assert read_table(spark, d, "region").count() == 1
    # rewrite with more rows, nudging mtime past filesystem granularity
    pq.write_table(
        pa.table(
            {
                "r_regionkey": [0, 1, 2],
                "r_name": ["AFRICA", "ASIA", "EUROPE"],
                "r_comment": ["x", "y", "z"],
            }
        ),
        p,
    )
    os.utime(p, (os.path.getmtime(p) + 2, os.path.getmtime(p) + 2))
    assert read_table(spark, d, "region").count() == 3
    shutil.rmtree(d)


def test_spans_memo_registered_and_mtime_keyed(spark):
    """Round-8 review fix: the labels-suite spans memo keys on the
    events table's mtime (rewrites invalidate in lockstep with the
    source memo) and registers with tables.memo_clear (one switch
    flushes all session memos)."""
    import os

    from finmlkit_spark.sources import tables
    from finmlkit_spark.suite import labels_suite as LS

    assert LS._SPANS_MEMO is not None
    assert any(m is LS._SPANS_MEMO for m in tables._EXTRA_MEMOS)
    sf = "/root/testdata/sf0.001"
    _, _, n = LS._trades_spans(spark, sf)
    assert n > 0 and len(LS._SPANS_MEMO) >= 1
    key = next(iter(LS._SPANS_MEMO))
    # key carries the events table's mtime
    assert key[-1] == os.path.getmtime(f"{sf}/events.parquet")
    tables.memo_clear()
    assert len(LS._SPANS_MEMO) == 0
