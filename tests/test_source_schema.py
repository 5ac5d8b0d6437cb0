"""Source-schema smoke tests against the REAL driver testdata.

Round 2 lost 29 driver queries, the whole bench, and 88 tests to one
upstream schema drift (events.ts regenerated as timestamp[us] instead
of TIMESTAMP(NANOS)).  This file is the sub-second guard the verdict
asked for: read every real sf dir, assert the adapter normalizes to
ts_ns:bigint, and assert the values match DuckDB's epoch_us(ts)*1000
oracle exactly — whatever physical type the driver writes next.
"""

from __future__ import annotations

import glob
import os

import pytest

from tests.conftest import SF_SMALL

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_events_adapter_schema(spark, sf_dir):
    from finmlkit_spark.sources.trades import events_to_trades

    tr = events_to_trades(spark, sf_dir)
    assert dict(tr.dtypes) == {
        "ts_ns": "bigint",
        "trade_id": "bigint",
        "price": "double",
        "qty": "double",
        "symbol": "string",
    }
    # analysis must succeed and the plan must execute (1-row action)
    assert tr.limit(1).count() >= 0


def test_events_adapter_values_match_oracle(spark):
    """Adapter output is bit-identical to the DuckDB oracle CTE at sf0.001."""
    import duckdb

    from finmlkit_spark.sources.trades import events_to_trades

    tr = events_to_trades(spark, SF_SMALL)
    got = sorted((r.ts_ns, r.trade_id, r.price, r.qty) for r in tr.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            "SELECT epoch_us(ts)*1000, event_id, value,"
            " CAST(1 + (event_id % 5) AS DOUBLE)"
            " FROM events WHERE value > 0"
        ).fetchall()
    )
    assert got == want


def test_events_adapter_nanos_long_path(spark, tmp_path):
    """The bigint (TIMESTAMP NANOS -> nanosAsLong) branch still works."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ns = [1_700_000_000_000_000_123, 1_700_000_000_001_000_456]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ns, pa.timestamp("ns")),
            "user_id": pa.array([7, 8], pa.int64()),
            "event_type": pa.array(["a", "b"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    )
    d = tmp_path / "nanos"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"), store_schema=False)

    from finmlkit_spark.sources.trades import events_to_trades

    tr = events_to_trades(spark, str(d))
    got = sorted(r.ts_ns for r in tr.collect())
    assert got == sorted(t - t % 1000 for t in ns)


def test_read_trades_parquet_pruned(spark, tmp_path):
    """The pruned trades read: time filters reach the scan as pushed
    predicates and the slice matches a manual filter."""
    import pandas as pd

    from finmlkit_spark.sources.trades import read_trades_parquet

    pdf = pd.DataFrame(
        {
            "symbol": ["S"] * 100,
            "ts_ns": [1_700_000_000_000_000_000 + i * 10**9 for i in range(100)],
            "trade_id": range(100),
            "price": [100.0 + i for i in range(100)],
            "qty": [1.0] * 100,
        }
    )
    p = str(tmp_path / "trades.parquet")
    pdf.to_parquet(p)
    lo = 1_700_000_000_000_000_000 + 20 * 10**9
    hi = 1_700_000_000_000_000_000 + 80 * 10**9
    df = read_trades_parquet(spark, p, start_ns=lo, end_ns=hi)
    assert df.count() == len(pdf[(pdf.ts_ns >= lo) & (pdf.ts_ns <= hi)])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "ts_ns" in plan.split("PushedFilters")[1][:200]


def test_simhash_dup_pairs_identical_docs(spark):
    import pandas as pd

    from finmlkit_spark.operators.dedup import simhash_dup_pairs

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["alpha beta gamma delta"] * 2 + ["something entirely different here"],
            }
        )
    )
    got = [(r["doc_a"], r["doc_b"]) for r in simhash_dup_pairs(docs).collect()]
    assert got == [(1, 2)]
