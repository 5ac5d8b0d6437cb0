"""One-off profiling: driver-side plan-build time vs exec time per query.

Usage: python tools/profile_build.py sf_dir q1 q2 ...
Prints build_sec (DataFrame construction) and exec_sec (warm best-of-3
noop write on the ALREADY-BUILT frame) — isolates py4j/eager-analysis
cost from cluster work.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from finmlkit_spark import cache, suite  # noqa: E402
from finmlkit_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("profile")
    for name in names:
        q = suite.QUERIES[name]
        # cold build+exec warms codegen/caches
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cache.release_all()
        bb, eb = float("inf"), float("inf")
        for _ in range(3):
            t0 = time.time()
            df = q(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            bb, eb = min(bb, t1 - t0), min(eb, t2 - t1)
            cache.release_all()
        print(f"{name}: build={bb:.3f}s exec={eb:.3f}s total~{bb+eb:.3f}s", flush=True)


if __name__ == "__main__":
    main()
