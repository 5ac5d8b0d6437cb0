"""CSV-in-ZIP ingest: zipped Binance monthly dumps -> canonical trades
(reference scripts/binance2h5.py reads the monthly archives directly)."""

from __future__ import annotations

import zipfile

from finmlkit_spark.sources.trades import read_binance_csv, read_binance_zip

CSV = """id,price,qty,quote_qty,time,is_buyer_maker
1,100.5,0.25,25.125,1700000000000,True
2,100.6,0.50,50.30,1700000000100,False
3,100.4,1.00,100.4,1700000000200,True
"""


def _write_month(d, name, body=CSV):
    with zipfile.ZipFile(str(d / f"{name}.zip"), "w") as zf:
        zf.writestr(f"{name}.csv", body)


def test_zip_roundtrip_matches_plain_csv(spark, tmp_path):
    zd = tmp_path / "zips"
    cd = tmp_path / "csvs"
    zd.mkdir()
    cd.mkdir()
    _write_month(zd, "BTCUSDT-trades-2023-11")
    (cd / "BTCUSDT-trades-2023-11.csv").write_text(CSV)

    from_zip = read_binance_zip(spark, str(zd), symbol="BTCUSDT")
    from_csv = read_binance_csv(spark, str(cd), symbol="BTCUSDT")
    key = lambda r: r["trade_id"]
    a = sorted(from_zip.collect(), key=key)
    b = sorted(from_csv.collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert dict(from_zip.dtypes) == dict(from_csv.dtypes)


def test_zip_multiple_archives_parallel_tasks(spark, tmp_path):
    zd = tmp_path / "zips"
    zd.mkdir()
    for m in ("2023-11", "2023-12", "2024-01"):
        _write_month(zd, f"BTCUSDT-trades-{m}")
    df = read_binance_zip(spark, str(zd), symbol="BTCUSDT")
    assert df.count() == 9
    # side convention: buyer-maker => aggressor sold => side = -1
    sides = {r["trade_id"]: r["side"] for r in df.collect()}
    assert sides[1] == -1 and sides[2] == 1 and sides[3] == -1
