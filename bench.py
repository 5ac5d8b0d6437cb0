"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Queries are materialized with the noop sink so we measure engine time,
not driver-side collection.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pipeline_1m_features",  # flagship: events->trades->bars->12 features
    "time_bars_1m",
    "bar_directional_1m",
    "dollar_bars",
    "footprint_features",
    "tbm_labels",
    "avg_uniqueness",
    "seq_ewma",
    "seq_cusum_test",
    "minhash_lsh",
    "ann_topk",
    "bars_resample_15m",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from finmlkit_spark import suite
    from finmlkit_spark.session import get_spark

    spark = get_spark("bench")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])

    # warm the JVM/session (plan + codegen warmup, analogous to JIT warmup)
    suite.QUERIES["time_bars_1m"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in HEADLINE:
        if name not in suite.QUERIES:
            continue
        t0 = time.time()
        suite.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
