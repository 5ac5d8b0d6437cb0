"""Configuration-robustness sweep: run registry queries under session
configs the engine does NOT control, catching dependencies the tuned
session factory would mask.

Modes (one fresh SparkSession per mode, run sequentially):

- vanilla:    no configs at all — the external driver's environment
              (e.g. catches parquet-type handling that must live in the
              source adapters, not session.py);
- aqe_off:    adaptive execution disabled — plans must be correct
              without runtime re-planning;
- parts7:     7 shuffle partitions — partition-count/order sensitivity
              (order-dependent aggregations surface here).

Usage: python tools/robustness.py [sf_dir] [query ...]
       (default: sf0.001, the first 50 registered queries)

Smoke-level check (plan + execute + count); value-level correctness is
tools/check.py's job — run that per-config too when a failure here
needs diagnosis.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODES = {
    "vanilla": {},
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "parts7": {"spark.sql.shuffle.partitions": "7"},
}


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as e

    qs = e.queries()
    names = sys.argv[2:] or list(qs)[:50]
    any_bad = False
    for mode, confs in MODES.items():
        b = SparkSession.builder.master("local[16]").config("spark.ui.enabled", "false")
        for k, v in confs.items():
            b = b.config(k, v)
        spark = b.getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        from finmlkit_spark import cache

        bad = []
        for n in names:
            try:
                qs[n](spark, sf_dir).count()
            except Exception as ex:  # noqa: BLE001
                bad.append((n, f"{type(ex).__name__}: {str(ex)[:150]}"))
            finally:
                cache.release_all()
        print(f"{mode}: {len(names) - len(bad)} ok, {len(bad)} fail")
        for n, m in bad:
            print(f"  FAIL {n}: {m}")
        any_bad = any_bad or bool(bad)
        cache.release_all()
        spark.stop()
    return 1 if any_bad else 0


if __name__ == "__main__":
    sys.exit(main())
