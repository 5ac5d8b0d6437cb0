"""Dump .explain('formatted') for named registry queries to files.

Usage: python tools/dump_plans.py <sf_dir> <out_dir> <suffix> <query> [...]
Writes <out_dir>/<query>_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir, out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    from finmlkit_spark import cache, suite
    from finmlkit_spark.session import get_spark

    spark = get_spark("dump-plans")
    for name in names:
        df = suite.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)", flush=True)
        cache.release_all()


if __name__ == "__main__":
    main()
